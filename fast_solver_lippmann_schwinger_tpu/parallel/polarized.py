"""Multi-chip polarized-traces preconditioner via ``shard_map``.

Distributed counterpart of ``ddm.polarized.PolarizedTracesPreconditioner``
(reference trace-space formulation, ``src/integral_preconditioner.jl`` +
``\\(::PolarizedTracesPreconditioner)`` at ``src/preconditioner.jl:207-225``)
over the same 1-D slab mesh as ``parallel/sharded.py``:

* every slab's factorization lives on its owner device; the batched local
  solves (RHS-trace extraction, the 2-RHS-per-slab MM applies, the final
  reconstruction) are embarrassingly slab-parallel — each device solves its
  ``k = S/D`` local slabs and the interface traces (n-vectors) are
  assembled with one tiled ``all_gather`` over ICI;
* the block-GS inner preconditioner's sequential D-inverse recursions run
  as a masked stage loop (the owning device's solve is selected with a
  ``psum``-broadcast — the same correctness-first pattern as
  ``sharded_gs_sweep``);
* the trace vectors themselves (2(S-1)n per polarized half) are tiny and
  stay REPLICATED, so the inner batched GMRES runs redundantly-identically
  on every device with no additional communication.

The R incident directions ride every local solve as a trailing batch axis
(one pivot stream per slab per stage for the whole batch — the same HBM
amortization as ``PolarizedTracesPreconditioner.apply_batch``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from fast_solver_lippmann_schwinger_tpu.ddm.polarized import (
    _devectorize,
    _interface_vector,
    pallas_only,
    permute_to_pairs,
)
from fast_solver_lippmann_schwinger_tpu.ddm.subdomain import SlabSystem
from fast_solver_lippmann_schwinger_tpu.parallel.sharded import (
    _local_slab,
    slab_sharding_specs,
)
from fast_solver_lippmann_schwinger_tpu.solver.gmres import gmres_batched
from fast_solver_lippmann_schwinger_tpu.sparse.direct import (
    band_matvec,
    block_thomas_solve_support,
)


def _local_solve_all(slab_shard, rhs_local, start: int = 0, tail: int = 0):
    """Solve this device's k slab systems, rhs (k, m1_max, n[, r])."""
    return jax.vmap(
        lambda f, r: block_thomas_solve_support(f, r, start=start, tail=tail)
    )(slab_shard.fac, rhs_local)


def _gather_traces(x_local, axis):
    """(k, n[, r]) per-device -> (S, n[, r]) replicated (slab-ordered)."""
    return jax.lax.all_gather(x_local, axis, tiled=True)


def _block_apply_sharded(slabs, slab_shard, axis, v0, v1, vN, vNp):
    """Sharded ``applyBlockOperator``: each device fills + solves its own k
    slabs (traces v* are replicated (S, n[, ...])), then the four trace
    families are all_gathered back to replicated form."""
    dtype = slabs.cpl_01.dtype
    k = slab_shard.l0.shape[0]
    extra = v0.shape[2:]
    rhs = jnp.zeros((k, slabs.m1_max, slabs.n) + extra, dtype=dtype)
    me = jax.lax.axis_index(axis)
    gsl = me * k + jnp.arange(k)          # my global slab indices

    def fill(rhs_s, xs):
        zero = jnp.zeros_like(xs["v0"])
        top1 = jnp.where(xs["has_top"], -band_matvec(xs["cpl_10"], xs["v0"]), zero)
        top0 = jnp.where(xs["has_top"], band_matvec(xs["cpl_01"], xs["v1"]), zero)
        botp = jnp.where(xs["has_bot"], band_matvec(xs["cpl_np_n"], xs["vN"]), zero)
        botn = jnp.where(xs["has_bot"], -band_matvec(xs["cpl_n_np"], xs["vNp"]), zero)
        rhs_s = rhs_s.at[xs["l1"]].set(top1)
        rhs_s = rhs_s.at[xs["l0"]].set(top0)
        rhs_s = rhs_s.at[xs["lnp"]].set(botp)
        rhs_s = rhs_s.at[xs["ln"]].set(botn)
        return rhs_s

    xs = dict(
        v0=v0[gsl].astype(dtype), v1=v1[gsl].astype(dtype),
        vN=vN[gsl].astype(dtype), vNp=vNp[gsl].astype(dtype),
        has_top=slab_shard.has_top, has_bot=slab_shard.has_bot,
        l0=slab_shard.l0, l1=slab_shard.l1,
        ln=slab_shard.ln, lnp=slab_shard.lnp,
        cpl_01=slab_shard.cpl_01, cpl_10=slab_shard.cpl_10,
        cpl_n_np=slab_shard.cpl_n_np, cpl_np_n=slab_shard.cpl_np_n,
    )
    rhs = jax.vmap(fill)(rhs, xs)
    if len(extra) > 1:
        rhs = rhs.reshape(rhs.shape[:3] + (-1,))
    u = _local_solve_all(slab_shard, rhs, start=slabs.trace_head)
    if len(extra) > 1:
        u = u.reshape(u.shape[:3] + extra)
    idx = jnp.arange(k)
    return tuple(
        _gather_traces(u[idx, lines], axis)
        for lines in (slab_shard.l0, slab_shard.l1,
                      slab_shard.ln, slab_shard.lnp)
    )


def _apply_mm_sharded(slabs, slab_shard, axis, u_pol):
    """Sharded ``applyMMOptUmf``: one batched 2-RHS solve per local slab."""
    S, n = slabs.n_subs, slabs.n
    half = 2 * (S - 1) * n
    u_down, u_up = u_pol[:half], u_pol[half:]
    d0, d1, dN, dNp = _devectorize(slabs, u_down)
    p0, p1, pN, pNp = _devectorize(slabs, u_up)

    v0 = jnp.stack([d0, d0 + p0], axis=-1)
    v1 = jnp.stack([d1, d1 + p1], axis=-1)
    vN = jnp.stack([pN + dN, pN], axis=-1)
    vNp = jnp.stack([pNp + dNp, pNp], axis=-1)
    u0_t, u1_t, uN_t, uNp_t = _block_apply_sharded(
        slabs, slab_shard, axis, v0, v1, vN, vNp
    )
    u0_a, u1_a = u0_t[..., 0], u1_t[..., 0]
    uN_b, uNp_b = uN_t[..., 1], uNp_t[..., 1]
    mu1 = _interface_vector(slabs, -pN - dN + uN_b, -p1 - d1 + u1_a)
    mu0 = _interface_vector(slabs, -dNp + uNp_b, -p0 + u0_a)
    return jnp.concatenate([mu1, mu0])


def _coupling_sharded(slabs, slab_shard, axis, u_gamma, which: str):
    """Sharded ``applyU`` / ``applyL`` (parallel block applies)."""
    v0, v1, vN, vNp = _devectorize(slabs, u_gamma)
    u0_t, u1_t, uN_t, uNp_t = _block_apply_sharded(
        slabs, slab_shard, axis, v0, v1, vN, vNp
    )
    if which == "U":
        out = jnp.stack([(uN_t - vN)[:-1], uNp_t[:-1]], axis=1)
    else:
        out = jnp.stack([u0_t[1:], (u1_t - v1)[1:]], axis=1)
    return out.reshape((-1,) + u_gamma.shape[1:])


def _dinv_sharded(slabs, slab_shard, axis, u_gamma, down: bool):
    """Sequential D-inverse recursion, masked over the slab mesh: at stage
    ``s`` the owner of slab s solves (with head-start/tail truncation, both
    exact) and the two carried trace vectors are psum-broadcast."""
    S, n = slabs.n_subs, slabs.n
    k = slab_shard.l0.shape[0]
    extra = u_gamma.shape[1:]
    g = u_gamma.reshape((S - 1, 2, n) + extra)
    dtype = slabs.cpl_01.dtype
    me = jax.lax.axis_index(axis)
    zero = jnp.zeros((n,) + extra, dtype=dtype)

    def bcast(val, owner):
        sel = jnp.where(me == owner, 1.0, 0.0).astype(val.dtype)
        return jax.lax.psum(val * sel, axis)

    def slab_solve(s, va, vb):
        """Owner-of-slab-s local block apply driven by (va, vb) traces."""
        li = s % k
        sl = _local_slab(slab_shard, li)
        rhs = jnp.zeros((slabs.m1_max, n) + extra, dtype=dtype)
        if down:
            rhs = rhs.at[sl.l1].set(
                jnp.where(sl.has_top, -band_matvec(sl.cpl_10, va), zero)
            )
            rhs = rhs.at[sl.l0].set(
                jnp.where(sl.has_top, band_matvec(sl.cpl_01, vb), zero)
            )
            u = block_thomas_solve_support(
                sl.fac, rhs, start=slabs.trace_head, tail=slabs.trace_tail
            )
            return u[sl.ln], u[sl.lnp]
        rhs = rhs.at[sl.lnp].set(
            jnp.where(sl.has_bot, band_matvec(sl.cpl_np_n, va), zero)
        )
        rhs = rhs.at[sl.ln].set(
            jnp.where(sl.has_bot, -band_matvec(sl.cpl_n_np, vb), zero)
        )
        u = block_thomas_solve_support(
            sl.fac, rhs, start=max(slabs.m1_max - slabs.trace_tail, 0)
        )
        return u[sl.l0], u[sl.l1]

    outs = [None] * (S - 1)
    if down:
        va, vb = -g[0, 0], -g[0, 1]
        outs[0] = jnp.stack([va, vb])
        for q in range(1, S - 1):       # interface q through slab q
            ta, tb = slab_solve(q, va, vb)
            va = bcast(ta, q // k) - g[q, 0]
            vb = bcast(tb, q // k) - g[q, 1]
            outs[q] = jnp.stack([va, vb])
    else:
        va, vb = -g[S - 2, 0], -g[S - 2, 1]
        outs[S - 2] = jnp.stack([va, vb])
        for q in range(S - 3, -1, -1):  # interface q through slab q+1
            ta, tb = slab_solve(q + 1, va, vb)
            va = bcast(ta, (q + 1) // k) - g[q, 0]
            vb = bcast(tb, (q + 1) // k) - g[q, 1]
            outs[q] = jnp.stack([va, vb])
    return jnp.stack(outs).reshape((-1,) + extra)


def _precond_gs_sharded(slabs, slab_shard, axis, v, n_it: int):
    half = v.shape[0] // 2
    vdown_rhs, vup_rhs = v[:half], v[half:]
    u_down = _dinv_sharded(slabs, slab_shard, axis, vdown_rhs, down=True)
    u_up = _dinv_sharded(
        slabs, slab_shard, axis,
        vup_rhs - _coupling_sharded(slabs, slab_shard, axis, u_down, "L"),
        down=False,
    )
    for _ in range(n_it - 1):
        u_down = _dinv_sharded(
            slabs, slab_shard, axis,
            vdown_rhs - _coupling_sharded(slabs, slab_shard, axis, u_up, "U"),
            down=True,
        )
        u_up = _dinv_sharded(
            slabs, slab_shard, axis,
            vup_rhs - _coupling_sharded(slabs, slab_shard, axis, u_down, "L"),
            down=False,
        )
    return jnp.concatenate([u_down, u_up])


def make_sharded_polarized_preconditioner(
    slabs: SlabSystem, a_s, mesh: Mesh, axis: str = "slab",
    n_it: int = 2, inner_tol: float = 1e-2, inner_maxiter: int = 40,
):
    """Batched ``(R, m*n) -> (R, m*n)`` polarized-traces preconditioner over
    a slab mesh — feed to ``gmres_batched`` for the multi-chip trace-path
    solve (2D analog of the sweep path's
    ``make_sharded_double_sweep_pipelined``).

    Requires XLA-format slab pivots (full/bf16/banded); the fused-Pallas
    layout is a single-chip path.
    """
    S = slabs.n_subs
    D = mesh.shape[axis]
    assert S % D == 0, f"{S} slabs must divide over {D} devices"
    assert not pallas_only(slabs), (
        "sharded polarized traces needs XLA-format pivots "
        "(pivot_dtype full/bf16/banded/banded_tail), not the Pallas-only "
        "placeholder layout"
    )
    # disjoint-trace-region requirement (see parallel/polarized3d.py):
    # slabs shorter than ~2 npml collide l1 with ln and the block applies
    # silently overwrite sources
    import numpy as _np

    _l1 = _np.asarray(slabs.l1)
    _ln = _np.asarray(slabs.ln)
    _both = _np.asarray(slabs.has_top) & _np.asarray(slabs.has_bot)
    assert (~_both | (_ln > _l1)).all(), (
        "degenerate slab geometry for polarized traces: top/bottom trace "
        "lines overlap (slabs shorter than ~2*npml) — use fewer slabs or "
        "a taller grid"
    )
    k = S // D
    n = slabs.n
    specs = slab_sharding_specs(slabs, axis)

    def fn(slab_shard, b_batch):
        R = b_batch.shape[0]
        asb = a_s.matvec(b_batch.T)                     # (N, R) replicated
        # ---- RHS traces: solve my k slabs of the partitioned source ----
        bg = asb.reshape(slabs.m, n, R)
        rhs_local = jnp.where(
            slab_shard.src_valid[..., None, None],
            bg[slab_shard.src_line], 0.0,
        ).astype(slabs.cpl_01.dtype)                     # (k, m1, n, R)
        u = _local_solve_all(slab_shard, rhs_local)
        idx = jnp.arange(k)
        tr = {}
        for name, lines, mask in (
            ("u0", slab_shard.l0, slab_shard.has_top),
            ("u1", slab_shard.l1, slab_shard.has_top),
            ("un", slab_shard.ln, slab_shard.has_bot),
            ("unp", slab_shard.lnp, slab_shard.has_bot),
        ):
            val = jnp.where(mask[:, None, None], u[idx, lines], 0.0)
            tr[name] = _gather_traces(val, axis)         # (S, n, R)
        f1 = _interface_vector(slabs, tr["un"], tr["u1"])
        f0 = _interface_vector(slabs, tr["unp"], tr["u0"])
        f_pol = -jnp.concatenate([f1, f0])               # (M, R)

        # ---- inner batched GMRES on the replicated trace system ----
        matvec_b = lambda V: _apply_mm_sharded(
            slabs, slab_shard, axis, V.T
        ).T
        precond_b = lambda V: _precond_gs_sharded(
            slabs, slab_shard, axis, permute_to_pairs(slabs, V.T), n_it
        ).T
        u_pol, _ = gmres_batched(
            matvec_b, f_pol.T, preconditioner=precond_b,
            rtol=inner_tol, restart=min(20, f_pol.shape[0]),
            maxiter=inner_maxiter,
        )
        u_pol = u_pol.T
        half = 2 * (S - 1) * n
        ug = u_pol[:half] + u_pol[half:]
        v0, v1, vn, vnp = _devectorize(slabs, ug)

        # ---- reconstruction: local solves + psum of interior lines ----
        me = jax.lax.axis_index(axis)
        gsl = me * k + jnp.arange(k)

        def add_sources(rhs_s, xs):
            zero = jnp.zeros_like(xs["v0"])
            rhs_s = rhs_s.at[xs["l1"]].add(
                jnp.where(xs["has_top"], -band_matvec(xs["cpl_10"], xs["v0"]), zero)
            )
            rhs_s = rhs_s.at[xs["l0"]].add(
                jnp.where(xs["has_top"], band_matvec(xs["cpl_01"], xs["v1"]), zero)
            )
            rhs_s = rhs_s.at[xs["lnp"]].add(
                jnp.where(xs["has_bot"], band_matvec(xs["cpl_np_n"], xs["vn"]), zero)
            )
            rhs_s = rhs_s.at[xs["ln"]].add(
                jnp.where(xs["has_bot"], -band_matvec(xs["cpl_n_np"], xs["vnp"]), zero)
            )
            return rhs_s

        dtype = slabs.cpl_01.dtype
        xs = dict(
            v0=v0[gsl].astype(dtype), v1=v1[gsl].astype(dtype),
            vn=vn[gsl].astype(dtype), vnp=vnp[gsl].astype(dtype),
            has_top=slab_shard.has_top, has_bot=slab_shard.has_bot,
            l0=slab_shard.l0, l1=slab_shard.l1,
            ln=slab_shard.ln, lnp=slab_shard.lnp,
            cpl_01=slab_shard.cpl_01, cpl_10=slab_shard.cpl_10,
            cpl_n_np=slab_shard.cpl_n_np, cpl_np_n=slab_shard.cpl_np_n,
        )
        rhs_fin = jax.vmap(add_sources)(rhs_local, xs)
        u_fin = _local_solve_all(slab_shard, rhs_fin)    # (k, m1, n, R)

        base = me * k
        own = slab_shard.owner                            # replicated (m,)
        mine_lines = (own >= base) & (own < base + k)
        vals = u_fin[jnp.clip(own - base, 0, k - 1), slab_shard.owner_line]
        contrib = jnp.where(mine_lines[:, None, None], vals, 0.0)
        total = jax.lax.psum(contrib, axis)               # (m, n, R)
        return total.reshape(slabs.m * n, R).T

    shard_fn = jax.shard_map(
        fn,
        mesh=mesh,
        in_specs=(specs, P()),
        out_specs=P(),
        check_vma=False,
    )

    def apply_(b_batch):
        return shard_fn(slabs, b_batch)

    return apply_
