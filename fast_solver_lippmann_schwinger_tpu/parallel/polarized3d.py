"""Multi-chip 3D polarized-traces preconditioner via ``shard_map``.

Distributed counterpart of ``ddm.polarized3d.PolarizedTracesPreconditioner3D``
over the same z-slab mesh as ``parallel/sharded3d.py`` — the capability the
reference only advertises (its ``examples/example3D_Polarized_traces.jl`` is
an empty duplicate; BASELINE.json's north-star config is "3D polarized
traces ... multi-host block-partitioned subdomains").  Structure mirrors the
2D ``parallel/polarized.py``:

* every z-slab's plane factorization lives on its owner device; the batched
  local solves (RHS-trace extraction, the 2-RHS MM applies, reconstruction)
  are embarrassingly slab-parallel, with the four interface trace PLANES
  ((m, n) each) assembled by a tiled ``all_gather`` over ICI;
* the block-GS inner preconditioner's sequential D-inverse recursions run
  as a masked stage loop with ``psum``-broadcast trace handoff;
* the polarized trace vectors (2(S-1)mn per half) stay REPLICATED so the
  inner batched GMRES runs redundantly-identically on every device.

The R incident directions ride every plane solve as a trailing batch axis
(one pivot-plane stream per slab per stage for the whole batch).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from fast_solver_lippmann_schwinger_tpu.ddm.polarized import pallas_only
from fast_solver_lippmann_schwinger_tpu.ddm.polarized3d import (
    _cpl_multi,
    _devectorize,
    _interface_vector,
    permute_to_pairs,
)
from fast_solver_lippmann_schwinger_tpu.ddm.subdomain3d import (
    SlabSystem3D,
    slab_solve_3d,
)
from fast_solver_lippmann_schwinger_tpu.parallel.sharded import (
    _local_slab,
    slab_sharding_specs,
)
from fast_solver_lippmann_schwinger_tpu.solver.gmres import gmres_batched


def _local_solve_all_3d(slabs, slab_shard, rhs_local, start: int = 0,
                        tail: int = 0):
    """Solve this device's k slab systems; rhs (k, l1_max, mn[, r])."""
    return jax.vmap(
        lambda f, r: slab_solve_3d(slabs, f, r, start=start, tail=tail)
    )(slab_shard.fac, rhs_local)


def _gather_traces(x_local, axis):
    """(k, mn[, r]) per-device -> (S, mn[, r]) replicated (slab-ordered)."""
    return jax.lax.all_gather(x_local, axis, tiled=True)


def _block_apply_sharded_3d(slabs, slab_shard, axis, v0, v1, vN, vNp):
    """Sharded plane ``applyBlockOperator``: each device fills + solves its
    own k slabs (traces replicated (S, mn[, ...])), then all_gathers the
    four trace-plane families."""
    dtype = slabs.cpl_01.dtype
    m, n = slabs.m, slabs.n
    k = slab_shard.l0.shape[0]
    extra = v0.shape[2:]
    rhs = jnp.zeros((k, slabs.l1_max, m * n) + extra, dtype=dtype)
    me = jax.lax.axis_index(axis)
    gsl = me * k + jnp.arange(k)

    def fill(rhs_s, xs):
        zero = jnp.zeros_like(xs["v0"])
        top1 = jnp.where(
            xs["has_top"], -_cpl_multi(xs["cpl_10"], xs["v0"], m, n), zero
        )
        top0 = jnp.where(
            xs["has_top"], _cpl_multi(xs["cpl_01"], xs["v1"], m, n), zero
        )
        botp = jnp.where(
            xs["has_bot"], _cpl_multi(xs["cpl_np_n"], xs["vN"], m, n), zero
        )
        botn = jnp.where(
            xs["has_bot"], -_cpl_multi(xs["cpl_n_np"], xs["vNp"], m, n), zero
        )
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
    u = _local_solve_all_3d(slabs, slab_shard, rhs, start=slabs.trace_head)
    if len(extra) > 1:
        u = u.reshape(u.shape[:3] + extra)
    idx = jnp.arange(k)
    return tuple(
        _gather_traces(u[idx, planes], axis)
        for planes in (slab_shard.l0, slab_shard.l1,
                       slab_shard.ln, slab_shard.lnp)
    )


def _apply_mm_sharded_3d(slabs, slab_shard, axis, u_pol):
    """Sharded 3D ``applyMMOptUmf``: one batched 2-RHS plane solve per
    local slab."""
    S, mn = slabs.n_subs, slabs.m * slabs.n
    half = 2 * (S - 1) * mn
    u_down, u_up = u_pol[:half], u_pol[half:]
    d0, d1, dN, dNp = _devectorize(slabs, u_down)
    p0, p1, pN, pNp = _devectorize(slabs, u_up)

    v0 = jnp.stack([d0, d0 + p0], axis=-1)
    v1 = jnp.stack([d1, d1 + p1], axis=-1)
    vN = jnp.stack([pN + dN, pN], axis=-1)
    vNp = jnp.stack([pNp + dNp, pNp], axis=-1)
    u0_t, u1_t, uN_t, uNp_t = _block_apply_sharded_3d(
        slabs, slab_shard, axis, v0, v1, vN, vNp
    )
    u0_a, u1_a = u0_t[..., 0], u1_t[..., 0]
    uN_b, uNp_b = uN_t[..., 1], uNp_t[..., 1]
    mu1 = _interface_vector(slabs, -pN - dN + uN_b, -p1 - d1 + u1_a)
    mu0 = _interface_vector(slabs, -dNp + uNp_b, -p0 + u0_a)
    return jnp.concatenate([mu1, mu0])


def _coupling_sharded_3d(slabs, slab_shard, axis, u_gamma, which: str):
    """Sharded 3D ``applyU`` / ``applyL``."""
    v0, v1, vN, vNp = _devectorize(slabs, u_gamma)
    u0_t, u1_t, uN_t, uNp_t = _block_apply_sharded_3d(
        slabs, slab_shard, axis, v0, v1, vN, vNp
    )
    if which == "U":
        out = jnp.stack([(uN_t - vN)[:-1], uNp_t[:-1]], axis=1)
    else:
        out = jnp.stack([u0_t[1:], (u1_t - v1)[1:]], axis=1)
    return out.reshape((-1,) + u_gamma.shape[1:])


def _dinv_sharded_3d(slabs, slab_shard, axis, u_gamma, down: bool):
    """Sequential plane D-inverse recursion, masked over the slab mesh:
    the owner of stage slab s solves and the two carried trace planes move
    by psum-broadcast."""
    S, mn = slabs.n_subs, slabs.m * slabs.n
    m, n = slabs.m, slabs.n
    k = slab_shard.l0.shape[0]
    extra = u_gamma.shape[1:]
    g = u_gamma.reshape((S - 1, 2, mn) + extra)
    dtype = slabs.cpl_01.dtype
    me = jax.lax.axis_index(axis)
    zero = jnp.zeros((mn,) + extra, dtype=dtype)
    z_layout = slabs.pivot_layout == "z"

    def bcast(val, owner):
        sel = jnp.where(me == owner, 1.0, 0.0).astype(val.dtype)
        return jax.lax.psum(val * sel, axis)

    def slab_solve(s, va, vb):
        li = s % k
        sl = _local_slab(slab_shard, li)
        rhs = jnp.zeros((slabs.l1_max, mn) + extra, dtype=dtype)
        if down:
            rhs = rhs.at[sl.l1].set(
                jnp.where(sl.has_top, -_cpl_multi(sl.cpl_10, va, m, n), zero)
            )
            rhs = rhs.at[sl.l0].set(
                jnp.where(sl.has_top, _cpl_multi(sl.cpl_01, vb, m, n), zero)
            )
            u = slab_solve_3d(
                slabs, sl.fac, rhs, start=slabs.trace_head,
                tail=(slabs.trace_tail if z_layout else 0),
            )
            return u[sl.ln], u[sl.lnp]
        rhs = rhs.at[sl.lnp].set(
            jnp.where(sl.has_bot, _cpl_multi(sl.cpl_np_n, va, m, n), zero)
        )
        rhs = rhs.at[sl.ln].set(
            jnp.where(sl.has_bot, -_cpl_multi(sl.cpl_n_np, vb, m, n), zero)
        )
        u = slab_solve_3d(
            slabs, sl.fac, rhs,
            start=(max(slabs.l1_max - slabs.trace_tail, 0)
                   if z_layout else 0),
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


def _precond_gs_sharded_3d(slabs, slab_shard, axis, v, n_it: int):
    half = v.shape[0] // 2
    vdown_rhs, vup_rhs = v[:half], v[half:]
    u_down = _dinv_sharded_3d(slabs, slab_shard, axis, vdown_rhs, down=True)
    u_up = _dinv_sharded_3d(
        slabs, slab_shard, axis,
        vup_rhs - _coupling_sharded_3d(slabs, slab_shard, axis, u_down, "L"),
        down=False,
    )
    for _ in range(n_it - 1):
        u_down = _dinv_sharded_3d(
            slabs, slab_shard, axis,
            vdown_rhs - _coupling_sharded_3d(
                slabs, slab_shard, axis, u_up, "U"
            ),
            down=True,
        )
        u_up = _dinv_sharded_3d(
            slabs, slab_shard, axis,
            vup_rhs - _coupling_sharded_3d(
                slabs, slab_shard, axis, u_down, "L"
            ),
            down=False,
        )
    return jnp.concatenate([u_down, u_up])


def make_sharded_polarized_preconditioner_3d(
    slabs: SlabSystem3D, a_s, mesh: Mesh, axis: str = "slab",
    n_it: int = 2, inner_tol: float = 1e-2, inner_maxiter: int = 40,
):
    """Batched ``(R, l*m*n) -> (R, l*m*n)`` 3D polarized-traces
    preconditioner over a z-slab mesh — feed to ``gmres_batched`` for the
    multi-chip 3D trace-path solve.

    Requires XLA-format plane pivots (full/bf16/yblock*); the Pallas plane
    stack is a single-chip path.
    """
    S = slabs.n_subs
    D = mesh.shape[axis]
    assert S % D == 0, f"{S} slabs must divide over {D} devices"
    assert not pallas_only(slabs), (
        "sharded 3D polarized traces needs XLA-format plane pivots, not "
        "the Pallas-only placeholder layout"
    )
    # the trace system assumes DISJOINT top/bottom trace planes per slab;
    # slabs shorter than ~2 npml collide them (l1 >= ln) and the block
    # applies silently overwrite sources — refuse rather than diverge
    import numpy as _np

    _l1 = _np.asarray(slabs.l1)
    _ln = _np.asarray(slabs.ln)
    _both = _np.asarray(slabs.has_top) & _np.asarray(slabs.has_bot)
    assert (~_both | (_ln > _l1)).all(), (
        "degenerate slab geometry for polarized traces: top/bottom trace "
        "planes overlap (slabs shorter than ~2*npml) — use fewer slabs or "
        "a taller grid"
    )
    k = S // D
    m, n = slabs.m, slabs.n
    mn = m * n
    specs = slab_sharding_specs(slabs, axis)

    def fn(slab_shard, b_batch):
        R = b_batch.shape[0]
        asb = a_s.matvec(b_batch.T)                      # (N, R) replicated
        # ---- RHS traces: solve my k slabs of the partitioned source ----
        bg = asb.reshape(slabs.l, mn, R)
        rhs_local = jnp.where(
            slab_shard.src_valid[..., None, None],
            bg[slab_shard.src_plane], 0.0,
        ).astype(slabs.cpl_01.dtype)                     # (k, l1, mn, R)
        u = _local_solve_all_3d(slabs, slab_shard, rhs_local)
        idx = jnp.arange(k)
        tr = {}
        for name, planes, mask in (
            ("u0", slab_shard.l0, slab_shard.has_top),
            ("u1", slab_shard.l1, slab_shard.has_top),
            ("un", slab_shard.ln, slab_shard.has_bot),
            ("unp", slab_shard.lnp, slab_shard.has_bot),
        ):
            val = jnp.where(mask[:, None, None], u[idx, planes], 0.0)
            tr[name] = _gather_traces(val, axis)         # (S, mn, R)
        f1 = _interface_vector(slabs, tr["un"], tr["u1"])
        f0 = _interface_vector(slabs, tr["unp"], tr["u0"])
        f_pol = -jnp.concatenate([f1, f0])               # (M, R)

        # ---- inner batched GMRES on the replicated trace system ----
        matvec_b = lambda V: _apply_mm_sharded_3d(
            slabs, slab_shard, axis, V.T
        ).T
        precond_b = lambda V: _precond_gs_sharded_3d(
            slabs, slab_shard, axis, permute_to_pairs(slabs, V.T), n_it
        ).T
        u_pol, _ = gmres_batched(
            matvec_b, f_pol.T, preconditioner=precond_b,
            rtol=inner_tol, restart=min(20, f_pol.shape[0]),
            maxiter=inner_maxiter,
        )
        u_pol = u_pol.T
        half = 2 * (S - 1) * mn
        ug = u_pol[:half] + u_pol[half:]
        v0, v1, vn, vnp = _devectorize(slabs, ug)

        # ---- reconstruction: local solves + psum of interior planes ----
        me = jax.lax.axis_index(axis)
        gsl = me * k + jnp.arange(k)

        def add_sources(rhs_s, xs):
            zero = jnp.zeros_like(xs["v0"])
            rhs_s = rhs_s.at[xs["l1"]].add(jnp.where(
                xs["has_top"], -_cpl_multi(xs["cpl_10"], xs["v0"], m, n),
                zero,
            ))
            rhs_s = rhs_s.at[xs["l0"]].add(jnp.where(
                xs["has_top"], _cpl_multi(xs["cpl_01"], xs["v1"], m, n),
                zero,
            ))
            rhs_s = rhs_s.at[xs["lnp"]].add(jnp.where(
                xs["has_bot"], _cpl_multi(xs["cpl_np_n"], xs["vn"], m, n),
                zero,
            ))
            rhs_s = rhs_s.at[xs["ln"]].add(jnp.where(
                xs["has_bot"], -_cpl_multi(xs["cpl_n_np"], xs["vnp"], m, n),
                zero,
            ))
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
        u_fin = _local_solve_all_3d(slabs, slab_shard, rhs_fin)

        base = me * k
        own = slab_shard.owner                           # replicated (l,)
        mine_planes = (own >= base) & (own < base + k)
        vals = u_fin[
            jnp.clip(own - base, 0, k - 1), slab_shard.owner_plane
        ]
        contrib = jnp.where(mine_planes[:, None, None], vals, 0.0)
        total = jax.lax.psum(contrib, axis)              # (l, mn, R)
        return total.reshape(slabs.l * mn, R).T

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
