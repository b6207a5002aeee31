"""Bi-directional Gauss-Seidel sweeping preconditioners on volume unknowns.

TPU-native counterpart of the reference's optimized polarized-traces sweep
``precondGSOptimized`` (``src/preconditioner.jl:557-630``) and the
alternating x/y double sweep ``doubleGSPreconditioner`` /
``doublePreconditioner`` (``src/preconditioner.jl:4-24,92-130,228-249``).

Each sweep is two ``lax.scan``s over the slab axis (down, then up); the only
inter-slab data are four n-vectors of interface traces — exactly the
distribution boundary exploited by the sharded version in
``parallel/sharded.py``.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import struct

from fast_solver_lippmann_schwinger_tpu.ddm.subdomain import (
    SlabSystem,
    gather_interior,
    partition_source,
)
from fast_solver_lippmann_schwinger_tpu.sparse import pallas_thomas as pt
from fast_solver_lippmann_schwinger_tpu.sparse.direct import (
    band_matvec,
    block_thomas_solve,
    block_thomas_solve_cached,
    block_thomas_solve_resume,
    block_thomas_solve_tail,
)
from fast_solver_lippmann_schwinger_tpu.sparse.stencil_matrix import StencilMatrix2D


def _slab_xs(slabs: SlabSystem):
    # NOTE: the batched factorization is NOT threaded through scan xs —
    # scans may materialize copies of their inputs, and the pivot stacks are
    # multi-GB at production sizes.  Bodies gather the per-slab slice from
    # the loop-invariant ``slabs.fac`` by index instead.
    return dict(
        idx=jnp.arange(slabs.n_subs),
        l0=slabs.l0, l1=slabs.l1, ln=slabs.ln, lnp=slabs.lnp,
        has_top=slabs.has_top, has_bot=slabs.has_bot,
        cpl_01=slabs.cpl_01, cpl_10=slabs.cpl_10,
        cpl_n_np=slabs.cpl_n_np, cpl_np_n=slabs.cpl_np_n,
    )


def _fac_at(fac, i):
    return jax.tree_util.tree_map(lambda a: a[i], fac)


def gs_sweep(slabs: SlabSystem, b: jnp.ndarray) -> jnp.ndarray:
    """One optimized Gauss-Seidel down/up sweep: ``u ~ Msp^{-1} b``.

    Semantics of ``precondGSOptimized`` (``src/preconditioner.jl:557-630``):

    * DOWN: local solves in slab order; slab s receives equivalent sources
      built from slab s-1's outgoing traces (one-sided Green's
      representation); record outgoing traces (u_n, u_np).
    * UP: revisit slabs in reverse; add equivalent sources from slab s+1's
      (u_0, u_1); record incoming traces with the reflection correction
      ``u_1 <- u[ind_1] - u_np``; reconstruct interiors on the fly.

    ``b`` may carry trailing RHS columns (m*n, r): the local solves then
    contract each streamed pivot plane against all r columns at once —
    the sweeps are HBM-bound on exactly that traffic, so r right-hand
    sides cost barely more than one (see ``DoubleSweepPreconditioner
    .apply_batch`` and the dual-incident-direction benchmark).
    """
    if (slabs.pfac is not None and hasattr(slabs.pfac, "head_re")
            and 0 < slabs.trace_tail < slabs.m1_max):
        # banded+tail hybrid layout: the whole sweep runs as TWO fused
        # kernels (down, up) with in-kernel trace handoff — no per-slab
        # launches or XLA glue (sparse/pallas_sweep.py)
        from fast_solver_lippmann_schwinger_tpu.sparse.pallas_sweep import (
            gs_sweep_fused,
        )

        return gs_sweep_fused(slabs, b)
    rhs0 = partition_source(slabs, b)      # (S, m1_max, n[, r])
    if slabs.n_subs == 1:
        # no interfaces: the sweep IS the exact Msp solve — one plain
        # fwd+bwd substitution (2.0 pivot passes) instead of the cached
        # down + resumed up structure (~2.2 passes + trace glue).  This is
        # the single-chip-optimal 2D configuration (73.2 ms at the 801^2
        # headline vs 113.7 ms for the 2-slab double sweep, RESULTS.md).
        if slabs.pfac is not None:
            u = pt.solve_all(slabs.pfac, jnp.arange(1), rhs0)
        else:
            u = block_thomas_solve(_fac_at(slabs.fac, 0), rhs0[0])[None]
        return gather_interior(slabs, u)
    dtype = rhs0.dtype

    def down_step(carry, xs):
        u_n_prev, u_np_prev = carry
        rhs = xs["rhs"]
        add0 = band_matvec(xs["cpl_01"], u_np_prev)
        add1 = -band_matvec(xs["cpl_10"], u_n_prev)
        zero = jnp.zeros_like(add0)
        rhs = rhs.at[xs["l0"]].add(jnp.where(xs["has_top"], add0, zero))
        rhs = rhs.at[xs["l1"]].add(jnp.where(xs["has_top"], add1, zero))
        # down solves only consume bottom traces: truncated backward pass;
        # the forward-pass stacks are cached so the up solve (whose rhs
        # differs only at the bottom trace lines) can resume instead of
        # redoing the full forward substitution
        if slabs.pfac is not None:
            v, y_c, t_c = pt.solve_cached(
                slabs.pfac, xs["idx"], rhs, slabs.trace_tail
            )
        else:
            v, y_c, t_c = block_thomas_solve_cached(
                _fac_at(slabs.fac, xs["idx"]), rhs, slabs.trace_tail
            )
        u_n = v[xs["ln"]]
        u_np = v[xs["lnp"]]
        return (u_n, u_np), (rhs, u_np, y_c, t_c)

    zeros_n = jnp.zeros(rhs0.shape[2:], dtype)      # (n[, r])
    xs = dict(_slab_xs(slabs), rhs=rhs0)
    (_, _), (rhs_down, u_np_all, y_all, t_all) = jax.lax.scan(
        down_step, (zeros_n, zeros_n), xs
    )

    # u_np of the slab ABOVE (s-1), used for the reflection correction
    u_np_above = jnp.concatenate([zeros_n[None], u_np_all[:-1]], axis=0)

    def up_step(carry, xs):
        u_0_next, u_1_next = carry
        rhs = xs["rhs"]
        addnp = band_matvec(xs["cpl_np_n"], u_0_next)
        addn = -band_matvec(xs["cpl_n_np"], u_1_next)
        zero = jnp.zeros_like(addnp)
        rhs = rhs.at[xs["lnp"]].add(jnp.where(xs["has_bot"], addnp, zero))
        rhs = rhs.at[xs["ln"]].add(jnp.where(xs["has_bot"], addn, zero))
        # rhs differs from the down solve's only at lines >= ln: resume the
        # cached forward pass there (bit-identical, ~m1/trace_tail x fewer
        # forward pivot applications)
        if slabs.pfac is not None:
            u = pt.solve_resume(
                slabs.pfac, xs["idx"], rhs, xs["y_c"], xs["t_c"],
                slabs.trace_tail,
            )
        else:
            u = block_thomas_solve_resume(
                _fac_at(slabs.fac, xs["idx"]), rhs, xs["y_c"], xs["t_c"],
                slabs.trace_tail,
            )
        u_0 = u[xs["l0"]]
        u_1 = u[xs["l1"]] - xs["u_np_above"]
        return (u_0, u_1), u

    xs_up = dict(_slab_xs(slabs), rhs=rhs_down, u_np_above=u_np_above,
                 y_c=y_all, t_c=t_all)
    # reverse=True avoids materializing reversed copies of the batched
    # factorizations (multi-GB at production sizes)
    (_, _), u = jax.lax.scan(up_step, (zeros_n, zeros_n), xs_up, reverse=True)
    return gather_interior(slabs, u)


def jacobi_sweep(slabs: SlabSystem, b: jnp.ndarray) -> jnp.ndarray:
    """Block-Jacobi sweep: the down and up trace recursions both build on
    the *initial* local solves, independently of each other; a final local
    solve per slab combines source + both trace families.  Semantics of
    ``precondJacobi`` (``src/preconditioner.jl:421-550``, whose reference
    version is dead code due to the unbound-variable typo at ``:547``).

    ``b`` may carry trailing RHS columns (m*n, r): every slab solve then
    streams its pivots once for all r columns (same amortization as
    :func:`gs_sweep`).
    """
    rhs0 = partition_source(slabs, b)      # (S, m1_max, n[, r])
    dtype = rhs0.dtype
    n = slabs.n
    extra = rhs0.shape[3:]
    zeros_n = jnp.zeros((n,) + extra, dtype)
    idx = jnp.arange(slabs.n_subs)

    if slabs.pfac is not None:
        def _solve_all(rhs_all):
            # one batched kernel launch over all slabs (each pivot plane
            # streamed once), not a lax.map of per-slab solves
            return pt.solve_all(slabs.pfac, idx, rhs_all)

        def _solve_one(i, rhs, tail=0):
            return pt.solve(slabs.pfac, i, rhs, tail=tail)
    else:

        def _solve_all(rhs_all):
            return jax.vmap(block_thomas_solve)(slabs.fac, rhs_all)

        def _solve_one(i, rhs, tail=0):
            f = _fac_at(slabs.fac, i)
            if tail:
                return block_thomas_solve_tail(f, rhs, tail)
            return block_thomas_solve(f, rhs)

    # initial local solves and their traces
    v_init = _solve_all(rhs0)
    tn_init = v_init[idx, slabs.ln]
    tnp_init = v_init[idx, slabs.lnp]
    t0_init = v_init[idx, slabs.l0]
    t1_init = v_init[idx, slabs.l1]

    def trace_rhs_down(xs, u_n_prev, u_np_prev):
        rhs = jnp.zeros((slabs.m1_max, n) + extra, dtype)
        add0 = band_matvec(xs["cpl_01"], u_np_prev)
        add1 = -band_matvec(xs["cpl_10"], u_n_prev)
        zero = jnp.zeros_like(add0)
        rhs = rhs.at[xs["l0"]].add(jnp.where(xs["has_top"], add0, zero))
        rhs = rhs.at[xs["l1"]].add(jnp.where(xs["has_top"], add1, zero))
        return rhs

    def down_step(carry, xs):
        u_n_prev, u_np_prev = carry
        t = _solve_one(
            xs["idx"], trace_rhs_down(xs, u_n_prev, u_np_prev),
            tail=slabs.trace_tail,
        )
        u_n = xs["tn_init"] + t[xs["ln"]]
        u_np = xs["tnp_init"] + t[xs["lnp"]]
        return (u_n, u_np), (u_n, u_np)

    xs = dict(_slab_xs(slabs), tn_init=tn_init, tnp_init=tnp_init)
    (_, _), (u_n_all, u_np_all) = jax.lax.scan(down_step, (zeros_n, zeros_n), xs)

    def trace_rhs_up(xs, u_0_next, u_1_next):
        rhs = jnp.zeros((slabs.m1_max, n) + extra, dtype)
        addnp = band_matvec(xs["cpl_np_n"], u_0_next)
        addn = -band_matvec(xs["cpl_n_np"], u_1_next)
        zero = jnp.zeros_like(addnp)
        rhs = rhs.at[xs["lnp"]].add(jnp.where(xs["has_bot"], addnp, zero))
        rhs = rhs.at[xs["ln"]].add(jnp.where(xs["has_bot"], addn, zero))
        return rhs

    def up_step(carry, xs):
        u_0_next, u_1_next = carry
        t = _solve_one(xs["idx"], trace_rhs_up(xs, u_0_next, u_1_next))
        u_0 = xs["t0_init"] + t[xs["l0"]]
        u_1 = xs["t1_init"] + t[xs["l1"]]
        return (u_0, u_1), (u_0, u_1)

    xs_up = dict(_slab_xs(slabs), t0_init=t0_init, t1_init=t1_init)
    (_, _), (u_0_all, u_1_all) = jax.lax.scan(
        up_step, (zeros_n, zeros_n), xs_up, reverse=True
    )

    # final reconstruction: source + down traces from above + up traces from
    # below, one batched solve over all slabs
    u_n_above = jnp.concatenate([zeros_n[None], u_n_all[:-1]], axis=0)
    u_np_above = jnp.concatenate([zeros_n[None], u_np_all[:-1]], axis=0)
    u_0_below = jnp.concatenate([u_0_all[1:], zeros_n[None]], axis=0)
    u_1_below = jnp.concatenate([u_1_all[1:], zeros_n[None]], axis=0)

    def final_rhs(rhs, xs):
        rhs = rhs + trace_rhs_down(xs, xs["u_n_above"], xs["u_np_above"])
        rhs = rhs + trace_rhs_up(xs, xs["u_0_below"], xs["u_1_below"])
        return rhs

    xs_fin = dict(
        _slab_xs(slabs),
        u_n_above=u_n_above, u_np_above=u_np_above,
        u_0_below=u_0_below, u_1_below=u_1_below,
    )
    rhs_fin = jax.vmap(final_rhs)(rhs0, xs_fin)
    u = _solve_all(rhs_fin)
    return gather_interior(slabs, u)


@struct.dataclass
class GSPreconditioner:
    """Single-direction sweep preconditioner for the sparsified system
    (reference ``GSPreconditioner``, ``src/preconditioner.jl:78-89,178-184``)."""

    slabs: SlabSystem

    def apply(self, b: jnp.ndarray) -> jnp.ndarray:
        return gs_sweep(self.slabs, b)

    def __call__(self, b):
        return self.apply(b)


@struct.dataclass
class SingleSweepPreconditioner:
    """``b -> GS_sweep(As b)`` — one-directional sweep applied to the full
    LS system (the reference's ``Preconditioner`` with zero inner
    iterations; half the memory of the double sweep)."""

    slabs: SlabSystem
    a_s: StencilMatrix2D

    def apply(self, b: jnp.ndarray) -> jnp.ndarray:
        return gs_sweep(self.slabs, self.a_s.matvec(b))

    def apply_batch(self, b_batch: jnp.ndarray) -> jnp.ndarray:
        """(R, m*n) joint batch apply (``gmres_batched`` convention)."""
        return self.apply(b_batch.T).T

    def __call__(self, b):
        return self.apply(b)


@struct.dataclass
class InnerGMRESPreconditioner:
    """Composite preconditioner: inner GMRES on the sparsified system,
    itself preconditioned by a sweep.

    Covers the reference's ``Preconditioner`` (GS sweep inner,
    ``src/preconditioner.jl:107-116,186-204``) and the ``maxIter != 0``
    branch of ``doublePreconditioner`` (``:228-244``): one restart cycle of
    length ``max_iter`` at tolerance ``tol`` on ``Msp y = As b``.
    """

    msp: StencilMatrix2D
    a_s: StencilMatrix2D
    sweep: Any
    max_iter: int = struct.field(pytree_node=False, default=20)
    tol: float = struct.field(pytree_node=False, default=1e-4)

    def apply(self, b: jnp.ndarray) -> jnp.ndarray:
        from fast_solver_lippmann_schwinger_tpu.solver.gmres import gmres

        x0 = self.a_s.matvec(b)
        inner = (
            self.sweep.apply_sparsified
            if hasattr(self.sweep, "apply_sparsified")
            else self.sweep.apply
        )
        y, _ = gmres(
            self.msp.matvec, x0, preconditioner=inner,
            rtol=self.tol, restart=self.max_iter, maxiter=self.max_iter,
        )
        return y

    def __call__(self, b):
        return self.apply(b)


@struct.dataclass
class DoubleSweepPreconditioner:
    """Alternating bi-directional (y then x) sweep for the full LS system.

    ``b -> u - T' GS_x(T (Msp u - As b))`` with ``u = GS_y(As b)`` — the
    ``doublePreconditioner`` ``maxIter = 0`` path
    (``src/preconditioner.jl:121-130,228-249``).  ``slabs_t`` must be built
    from the transposed stencil fields and medium
    (``tests/plasma_example.jl:103-114``).
    """

    slabs: SlabSystem
    slabs_t: SlabSystem
    msp: StencilMatrix2D
    a_s: StencilMatrix2D

    def _transpose_flat(self, v: jnp.ndarray) -> jnp.ndarray:
        """Grid transpose of a flat (m*n[, r]) vector (trailing RHS columns
        ride along)."""
        vg = v.reshape((self.msp.m, self.msp.n) + v.shape[1:])
        return jnp.swapaxes(vg, 0, 1).reshape(
            (self.msp.m * self.msp.n,) + v.shape[1:]
        )

    def apply_sparsified(self, b: jnp.ndarray) -> jnp.ndarray:
        """The double sweep on the sparsified system
        (``doubleGSPreconditioner``); ``b`` (m*n,) or (m*n, r) — the sweeps'
        local solves amortize their pivot streaming over the r columns."""
        u = gs_sweep(self.slabs, b)
        err = self.msp.matvec(u) - b
        u2 = self._transpose_flat(gs_sweep(self.slabs_t, self._transpose_flat(err)))
        return u - u2

    def apply(self, b: jnp.ndarray) -> jnp.ndarray:
        return self.apply_sparsified(self.a_s.matvec(b))

    def apply_batch(self, b_batch: jnp.ndarray) -> jnp.ndarray:
        """(R, m*n) batch apply in the ``gmres_batched`` convention: one
        joint double sweep whose pivot planes stream from HBM once per R
        right-hand sides (the reference solves its two incident directions
        serially, ``tests/plasma_example.jl:160,172``)."""
        return self.apply(b_batch.T).T

    def __call__(self, b):
        return self.apply(b)
