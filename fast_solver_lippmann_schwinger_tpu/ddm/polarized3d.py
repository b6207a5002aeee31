"""3D polarized-traces integral system on interface PLANES.

The reference only advertises this capability — its
``examples/example3D_Polarized_traces.jl`` is a comment-only duplicate of
``examples/example3D.jl`` and no 3D trace machinery exists (SURVEY.md
section 2 dead-code notes); BASELINE.json's final config ("3D polarized
traces at high frequency") names it as the north star.  This module
supplies it TPU-natively: the algebra is the 2D trace system of
``ddm/polarized.py`` (itself matching ``src/subdomains.jl:193-549,697-1072``
and ``src/integral_preconditioner.jl``) with line -> plane substitution on
:class:`ddm.subdomain3d.SlabSystem3D` — interface unknowns are (m, n)
planes, inter-plane couplings are 9-point in-plane stencils, and the local
solves dispatch through ``slab_solve_3d`` (so both the z-plane and the
y-blocked pivot layouts work).

Trace vector layouts mirror 2D: ``(S-1, 2, mn)`` blocks per polarized half;
the permuted layout pairs (u_n, u_np) / (u_0, u_1) for the D-inverse
recursions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from fast_solver_lippmann_schwinger_tpu.ddm.subdomain3d import (
    SlabSystem3D,
    _plane_stencil_matvec,
    _slab_fac,
    gather_interior_3d,
    partition_source_3d,
    slab_solve_3d,
)
from fast_solver_lippmann_schwinger_tpu.solver.gmres import gmres
from fast_solver_lippmann_schwinger_tpu.sparse.stencil_matrix import StencilMatrix3D


def _cpl_multi(sten: jnp.ndarray, plane: jnp.ndarray, m: int, n: int):
    """Apply an (m, n, 3, 3) coupling stencil to a flat plane (mn[, r])."""
    extra = plane.shape[1:]
    p = plane.reshape((m, n) + extra)
    return _plane_stencil_matvec(sten, p).reshape((m * n,) + extra)


def _devectorize(slabs: SlabSystem3D, u_gamma: jnp.ndarray):
    """(2(S-1)mn[, r]) trace vector -> per-slab (v0, v1, vN, vNp), each
    (S, mn[, r]) (``devectorizeBdyData`` semantics, line -> plane)."""
    S, mn = slabs.n_subs, slabs.m * slabs.n
    extra = u_gamma.shape[1:]
    g = u_gamma.reshape((S - 1, 2, mn) + extra)
    zero = jnp.zeros((1, mn) + extra, dtype=u_gamma.dtype)
    v0 = jnp.concatenate([zero, g[:, 0]], axis=0)
    v1 = jnp.concatenate([zero, g[:, 1]], axis=0)
    vN = jnp.concatenate([g[:, 0], zero], axis=0)
    vNp = jnp.concatenate([g[:, 1], zero], axis=0)
    return v0, v1, vN, vNp


def _interface_vector(slabs: SlabSystem3D, upper_slot, lower_slot):
    """Assemble (2(S-1)mn[, r],) from per-slab (S, mn[, r]) arrays."""
    out = jnp.stack([upper_slot[:-1], lower_slot[1:]], axis=1)
    return out.reshape((-1,) + out.shape[3:])


def _solve_batched_3d(slabs: SlabSystem3D, rhs, start: int = 0,
                      tail: int = 0):
    """One solve per slab, all slabs at once; rhs (S, l1_max, mn[, r]).

    With a Pallas plane stack attached, the slabs solve sequentially
    through per-slab :class:`PlaneSlabView`s (the fused whole-slab
    kernels; the placeholder XLA fac holds empty pivots) — these solves
    are serialized on the pivot HBM stream anyway, so the lost vmap
    parallelism is free."""
    if slabs.pfac is not None:
        def step(_, i):
            u_i = slab_solve_3d(
                slabs, _slab_fac(slabs, i), rhs[i], start=start, tail=tail
            )
            return None, u_i

        _, u = jax.lax.scan(step, None, jnp.arange(slabs.n_subs))
        return u
    return jax.vmap(
        lambda f, r: slab_solve_3d(slabs, f, r, start=start, tail=tail)
    )(slabs.fac, rhs)


def block_apply(slabs: SlabSystem3D, v0, v1, vN, vNp):
    """Batched ``applyBlockOperator`` on plane traces: one local solve per
    slab driven by interface sources; returns (u0, u1, uN, uNp), each
    (S, mn[, r]) (2D: ``ddm/polarized.py:block_apply``; reference
    ``src/subdomains.jl:212-271``)."""
    dtype = slabs.cpl_01.dtype
    m, n = slabs.m, slabs.n
    extra = v0.shape[2:]
    rhs = jnp.zeros(
        (slabs.n_subs, slabs.l1_max, m * n) + extra, dtype=dtype
    )

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
        v0=v0.astype(dtype), v1=v1.astype(dtype),
        vN=vN.astype(dtype), vNp=vNp.astype(dtype),
        has_top=slabs.has_top, has_bot=slabs.has_bot,
        l0=slabs.l0, l1=slabs.l1, ln=slabs.ln, lnp=slabs.lnp,
        cpl_01=slabs.cpl_01, cpl_10=slabs.cpl_10,
        cpl_n_np=slabs.cpl_n_np, cpl_np_n=slabs.cpl_np_n,
    )
    rhs = jax.vmap(fill)(rhs, xs)
    # the solver layer batches ONE trailing RHS axis — fold extra batch
    # axes (e.g. (R, 2) from the batched MM apply) into it
    if len(extra) > 1:
        rhs = rhs.reshape(rhs.shape[:3] + (-1,))
    u = _solve_batched_3d(slabs, rhs, start=slabs.trace_head)
    if len(extra) > 1:
        u = u.reshape(u.shape[:3] + extra)
    idx = jnp.arange(slabs.n_subs)
    return (u[idx, slabs.l0], u[idx, slabs.l1],
            u[idx, slabs.ln], u[idx, slabs.lnp])


def apply_mm(slabs: SlabSystem3D, u_pol: jnp.ndarray) -> jnp.ndarray:
    """The 3D polarized integral operator ``MM`` via one batched 2-RHS
    solve per slab (2D: ``apply_mm``; reference ``applyMMOptUmf``,
    ``src/subdomains.jl:1015-1072``)."""
    S, mn = slabs.n_subs, slabs.m * slabs.n
    half = 2 * (S - 1) * mn
    u_down, u_up = u_pol[:half], u_pol[half:]
    d0, d1, dN, dNp = _devectorize(slabs, u_down)
    p0, p1, pN, pNp = _devectorize(slabs, u_up)

    v0 = jnp.stack([d0, d0 + p0], axis=-1)
    v1 = jnp.stack([d1, d1 + p1], axis=-1)
    vN = jnp.stack([pN + dN, pN], axis=-1)
    vNp = jnp.stack([pNp + dNp, pNp], axis=-1)
    u0_t, u1_t, uN_t, uNp_t = block_apply(slabs, v0, v1, vN, vNp)
    u0_a, u1_a = u0_t[..., 0], u1_t[..., 0]
    uN_b, uNp_b = uN_t[..., 1], uNp_t[..., 1]

    mu1 = _interface_vector(slabs, -pN - dN + uN_b, -p1 - d1 + u1_a)
    mu0 = _interface_vector(slabs, -dNp + uNp_b, -p0 + u0_a)
    return jnp.concatenate([mu1, mu0])


def apply_u_coupling(slabs: SlabSystem3D, u_gamma: jnp.ndarray) -> jnp.ndarray:
    """``applyU`` on plane traces (``src/subdomains.jl:817-845``)."""
    v0, v1, vN, vNp = _devectorize(slabs, u_gamma)
    _, _, uN_t, uNp_t = block_apply(slabs, v0, v1, vN, vNp)
    out = jnp.stack([(uN_t - vN)[:-1], uNp_t[:-1]], axis=1)
    return out.reshape((-1,) + u_gamma.shape[1:])


def apply_l_coupling(slabs: SlabSystem3D, u_gamma: jnp.ndarray) -> jnp.ndarray:
    """``applyL`` on plane traces (``src/subdomains.jl:848-876``)."""
    v0, v1, vN, vNp = _devectorize(slabs, u_gamma)
    u0_t, u1_t, _, _ = block_apply(slabs, v0, v1, vN, vNp)
    out = jnp.stack([u0_t[1:], (u1_t - v1)[1:]], axis=1)
    return out.reshape((-1,) + u_gamma.shape[1:])


def _slab_xs_range(slabs: SlabSystem3D, lo: int, hi: int):
    sl = lambda a: a[lo:hi]
    return dict(
        idx=jnp.arange(lo, hi),
        l0=sl(slabs.l0), l1=sl(slabs.l1), ln=sl(slabs.ln), lnp=sl(slabs.lnp),
        has_top=sl(slabs.has_top), has_bot=sl(slabs.has_bot),
        cpl_01=sl(slabs.cpl_01), cpl_10=sl(slabs.cpl_10),
        cpl_n_np=sl(slabs.cpl_n_np), cpl_np_n=sl(slabs.cpl_np_n),
    )


def _block_apply_single(slabs, xs, v0, v1, vN, vNp, start=0, tail=0):
    """Single-slab plane block apply inside the Dinv recursions; trailing
    axes of the traces (direction batches) ride the multi-RHS solve."""
    dtype = slabs.cpl_01.dtype
    m, n = slabs.m, slabs.n
    extra = v0.shape[1:]
    rhs = jnp.zeros((slabs.l1_max, m * n) + extra, dtype=dtype)
    zero = jnp.zeros((m * n,) + extra, dtype=dtype)
    rhs = rhs.at[xs["l1"]].set(
        jnp.where(xs["has_top"], -_cpl_multi(xs["cpl_10"], v0, m, n), zero)
    )
    rhs = rhs.at[xs["l0"]].set(
        jnp.where(xs["has_top"], _cpl_multi(xs["cpl_01"], v1, m, n), zero)
    )
    rhs = rhs.at[xs["lnp"]].set(
        jnp.where(xs["has_bot"], _cpl_multi(xs["cpl_np_n"], vN, m, n), zero)
    )
    rhs = rhs.at[xs["ln"]].set(
        jnp.where(xs["has_bot"], -_cpl_multi(xs["cpl_n_np"], vNp, m, n), zero)
    )
    u = slab_solve_3d(
        slabs, _slab_fac(slabs, xs["idx"]), rhs, start=start, tail=tail
    )
    return u[xs["l0"]], u[xs["l1"]], u[xs["ln"]], u[xs["lnp"]]


def apply_dinv_down(slabs: SlabSystem3D, u_gamma: jnp.ndarray) -> jnp.ndarray:
    """Sequential downward D^{-1} recursion on plane traces
    (``applyDinvDown``, ``src/subdomains.jl:725-753``)."""
    S, mn = slabs.n_subs, slabs.m * slabs.n
    extra = u_gamma.shape[1:]
    g = u_gamma.reshape((S - 1, 2, mn) + extra)
    first = -g[0]
    zero = jnp.zeros((mn,) + extra, dtype=u_gamma.dtype)

    def step(carry, xs):
        vN, vNp = carry
        _, _, tN, tNp = _block_apply_single(
            slabs, xs, vN, vNp, zero, zero,
            start=slabs.trace_head,
            tail=(slabs.trace_tail if slabs.pivot_layout == "z" else 0),
        )
        out0 = tN - xs["g0"]
        out1 = tNp - xs["g1"]
        return (out0, out1), jnp.stack([out0, out1])

    xs = dict(_slab_xs_range(slabs, 1, S - 1), g0=g[1:, 0], g1=g[1:, 1])
    _, rest = jax.lax.scan(step, (first[0], first[1]), xs)
    out = jnp.concatenate([first[None], rest], axis=0)
    return out.reshape((-1,) + extra)


def apply_dinv_up(slabs: SlabSystem3D, u_gamma: jnp.ndarray) -> jnp.ndarray:
    """Sequential upward D^{-1} recursion on plane traces
    (``applyDinvUp``, ``src/subdomains.jl:785-814``)."""
    S, mn = slabs.n_subs, slabs.m * slabs.n
    extra = u_gamma.shape[1:]
    g = u_gamma.reshape((S - 1, 2, mn) + extra)
    last = -g[S - 2]
    zero = jnp.zeros((mn,) + extra, dtype=u_gamma.dtype)

    def step(carry, xs):
        v0, v1 = carry
        t0, t1, _, _ = _block_apply_single(
            slabs, xs, zero, zero, v0, v1,
            start=(max(slabs.l1_max - slabs.trace_tail, 0)
                   if slabs.pivot_layout == "z" else 0),
        )
        out0 = t0 - xs["g0"]
        out1 = t1 - xs["g1"]
        return (out0, out1), jnp.stack([out0, out1])

    xs = dict(_slab_xs_range(slabs, 1, S - 1), g0=g[:-1, 0], g1=g[:-1, 1])
    _, rest = jax.lax.scan(step, (last[0], last[1]), xs, reverse=True)
    out = jnp.concatenate([rest, last[None]], axis=0)
    return out.reshape((-1,) + extra)


def permute_to_pairs(slabs: SlabSystem3D, b_pol: jnp.ndarray) -> jnp.ndarray:
    """``generatePermutationMatrix`` shuffle on plane traces
    (``src/subdomains.jl:881-890``)."""
    S, mn = slabs.n_subs, slabs.m * slabs.n
    half = 2 * (S - 1) * mn
    extra = b_pol.shape[1:]
    f1 = b_pol[:half].reshape((S - 1, 2, mn) + extra)
    f0 = b_pol[half:].reshape((S - 1, 2, mn) + extra)
    down = jnp.stack([f1[:, 0], f0[:, 0]], axis=1)
    up = jnp.stack([f0[:, 1], f1[:, 1]], axis=1)
    flat = (-1,) + extra
    return jnp.concatenate([down.reshape(flat), up.reshape(flat)])


def precond_gauss_seidel(slabs: SlabSystem3D, v: jnp.ndarray,
                         n_it: int) -> jnp.ndarray:
    """Block Gauss-Seidel on the 3D polarized system (``PrecondGaussSeidel``,
    ``src/integral_preconditioner.jl:57-94``)."""
    half = v.shape[0] // 2
    vdown_rhs, vup_rhs = v[:half], v[half:]

    u_down = apply_dinv_down(slabs, vdown_rhs)
    u_up = apply_dinv_up(slabs, vup_rhs - apply_l_coupling(slabs, u_down))
    for _ in range(n_it - 1):
        u_down = apply_dinv_down(
            slabs, vdown_rhs - apply_u_coupling(slabs, u_up)
        )
        u_up = apply_dinv_up(
            slabs, vup_rhs - apply_l_coupling(slabs, u_down)
        )
    return jnp.concatenate([u_down, u_up])


def extract_rhs_traces(slabs: SlabSystem3D, b: jnp.ndarray):
    """Local solves of the partitioned source + plane-trace extraction
    (``extractRHS``, ``src/subdomains.jl:309-359``)."""
    rhs = partition_source_3d(slabs, b)
    u = _solve_batched_3d(slabs, rhs)
    idx = jnp.arange(slabs.n_subs)
    bshape = (slabs.n_subs,) + (1,) * (u.ndim - 2)
    mask_top = slabs.has_top.reshape(bshape)
    mask_bot = slabs.has_bot.reshape(bshape)
    u_0 = jnp.where(mask_top, u[idx, slabs.l0], 0.0)
    u_1 = jnp.where(mask_top, u[idx, slabs.l1], 0.0)
    u_n = jnp.where(mask_bot, u[idx, slabs.ln], 0.0)
    u_np = jnp.where(mask_bot, u[idx, slabs.lnp], 0.0)
    return u_0, u_1, u_n, u_np


def reconstruction(slabs: SlabSystem3D, b: jnp.ndarray, v0, v1, vn, vnp):
    """Volume reconstruction from plane traces (``reconstruction``,
    ``src/subdomains.jl:893-943``)."""
    rhs = partition_source_3d(slabs, b)
    dtype = rhs.dtype
    m, n = slabs.m, slabs.n

    def add_sources(rhs_s, xs):
        zero = jnp.zeros_like(xs["v0"])
        rhs_s = rhs_s.at[xs["l1"]].add(jnp.where(
            xs["has_top"], -_cpl_multi(xs["cpl_10"], xs["v0"], m, n), zero
        ))
        rhs_s = rhs_s.at[xs["l0"]].add(jnp.where(
            xs["has_top"], _cpl_multi(xs["cpl_01"], xs["v1"], m, n), zero
        ))
        rhs_s = rhs_s.at[xs["lnp"]].add(jnp.where(
            xs["has_bot"], _cpl_multi(xs["cpl_np_n"], xs["vn"], m, n), zero
        ))
        rhs_s = rhs_s.at[xs["ln"]].add(jnp.where(
            xs["has_bot"], -_cpl_multi(xs["cpl_n_np"], xs["vnp"], m, n), zero
        ))
        return rhs_s

    xs = dict(
        v0=v0.astype(dtype), v1=v1.astype(dtype),
        vn=vn.astype(dtype), vnp=vnp.astype(dtype),
        has_top=slabs.has_top, has_bot=slabs.has_bot,
        l0=slabs.l0, l1=slabs.l1, ln=slabs.ln, lnp=slabs.lnp,
        cpl_01=slabs.cpl_01, cpl_10=slabs.cpl_10,
        cpl_n_np=slabs.cpl_n_np, cpl_np_n=slabs.cpl_np_n,
    )
    rhs = jax.vmap(add_sources)(rhs, xs)
    u = _solve_batched_3d(slabs, rhs)
    return gather_interior_3d(slabs, u)


@struct.dataclass
class PolarizedTracesPreconditioner3D:
    """Full-system 3D preconditioner through the plane-trace inner solve
    (2D counterpart: ``PolarizedTracesPreconditioner``; reference
    ``src/preconditioner.jl:62-75,207-225`` — 2D-only there)."""

    slabs: SlabSystem3D
    a_s: StencilMatrix3D
    n_it: int = struct.field(pytree_node=False, default=2)
    inner_tol: float = struct.field(pytree_node=False, default=1e-2)
    inner_maxiter: int = struct.field(pytree_node=False, default=40)

    def apply(self, b: jnp.ndarray) -> jnp.ndarray:
        slabs = self.slabs
        S, mn = slabs.n_subs, slabs.m * slabs.n
        asb = self.a_s.matvec(b)
        u_0, u_1, u_n, u_np = extract_rhs_traces(slabs, asb)
        f1 = _interface_vector(slabs, u_n, u_1)
        f0 = _interface_vector(slabs, u_np, u_0)
        f_pol = -jnp.concatenate([f1, f0])

        precond = lambda v: precond_gauss_seidel(
            slabs, permute_to_pairs(slabs, v), self.n_it
        )
        u_pol, _info = gmres(
            lambda v: apply_mm(slabs, v),
            f_pol,
            preconditioner=precond,
            rtol=self.inner_tol,
            restart=min(20, f_pol.shape[0]),
            maxiter=self.inner_maxiter,
        )
        half = 2 * (S - 1) * mn
        u = u_pol[:half] + u_pol[half:]
        v0, v1, vn, vnp = _devectorize(slabs, u)
        return reconstruction(slabs, asb, v0, v1, vn, vnp)

    def apply_batch(self, b_batch: jnp.ndarray) -> jnp.ndarray:
        """(R, l*m*n) joint batch apply (``gmres_batched`` convention):
        the R directions ride every plane solve of the trace pipeline as a
        trailing axis and the inner trace solve runs as one
        ``gmres_batched`` (2D counterpart:
        ``PolarizedTracesPreconditioner.apply_batch``)."""
        from fast_solver_lippmann_schwinger_tpu.solver.gmres import (
            gmres_batched,
        )

        slabs = self.slabs
        S, mn = slabs.n_subs, slabs.m * slabs.n
        b = b_batch.T
        asb = self.a_s.matvec(b)
        u_0, u_1, u_n, u_np = extract_rhs_traces(slabs, asb)
        f1 = _interface_vector(slabs, u_n, u_1)
        f0 = _interface_vector(slabs, u_np, u_0)
        f_pol = -jnp.concatenate([f1, f0])

        matvec_b = lambda V: apply_mm(slabs, V.T).T
        precond_b = lambda V: precond_gauss_seidel(
            slabs, permute_to_pairs(slabs, V.T), self.n_it
        ).T
        u_pol, _info = gmres_batched(
            matvec_b, f_pol.T, preconditioner=precond_b,
            rtol=self.inner_tol, restart=min(20, f_pol.shape[0]),
            maxiter=self.inner_maxiter,
        )
        u_pol = u_pol.T
        half = 2 * (S - 1) * mn
        u = u_pol[:half] + u_pol[half:]
        v0, v1, vn, vnp = _devectorize(slabs, u)
        return reconstruction(slabs, asb, v0, v1, vn, vnp).T

    def __call__(self, b):
        return self.apply(b)
