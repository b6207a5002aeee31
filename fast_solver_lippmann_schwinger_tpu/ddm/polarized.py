"""Polarized-traces integral system on interface unknowns.

Counterpart of the reference's trace-space formulation: the preconditioner
solves a block system ``MM [u_down; u_up] = f_pol`` on interface traces,
preconditioned by block Gauss-Seidel whose diagonal inverses are sequential
down/up recursions, then reconstructs the volume field with one local solve
per slab (``src/subdomains.jl:193-549,697-1072``,
``src/integral_preconditioner.jl``, ``\\(::PolarizedTracesPreconditioner)``
at ``src/preconditioner.jl:207-225``).

Trace vector layouts (all 0-based; S slabs, S-1 interfaces, n points per
trace):

* plain / polarized halves (``vectorizeBdyData``): ``(S-1, 2, n)`` blocks;
  interface q holds ``(u_n-slot of slab q, u_1-slot of slab q+1)`` — for the
  "down" half — and the ``(u_np, u_0)`` pair for the "up" half.
* permuted (``generatePermutationMatrix``): down pairs ``(u_n, u_np)`` per
  interface, up pairs ``(u_0, u_1)`` — the layout the D-inverse recursions
  consume.

The per-slab "block operator" (local solve driven by interface sources,
``applyBlockOperator``, ``src/subdomains.jl:212-271``) is batched over slabs
and RHS columns; the MM apply needs only 2 distinct RHS per slab (the
reference's 4-column variant ``applyMMOptUmf`` duplicates two of them).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from fast_solver_lippmann_schwinger_tpu.ddm.subdomain import (
    SlabSystem,
    gather_interior,
    partition_source,
)
from fast_solver_lippmann_schwinger_tpu.solver.gmres import gmres
from fast_solver_lippmann_schwinger_tpu.sparse import pallas_thomas as pt
from fast_solver_lippmann_schwinger_tpu.sparse.direct import (
    band_matvec,
    block_thomas_solve,
    block_thomas_solve_support,
)
from fast_solver_lippmann_schwinger_tpu.sparse.stencil_matrix import StencilMatrix2D


def pallas_only(slabs) -> bool:
    """True when the fused-Pallas layout is the SOLE pivot storage
    (``pivot_dtype="pallas*"``: the XLA-side ``fac`` carries an empty
    placeholder pivot stack).  ``attach_pallas`` applied to a system built
    with full-precision pivots accelerates the volume sweeps only — this
    layer keeps the full-precision local solves rather than silently
    downgrading to bf16 Pallas pivots.  Compressed XLA formats
    (bf16/banded/banded_tail/banded_lr) store ``cinv_re``/``band_re``
    instead of ``cinv`` and are NOT pallas-only."""
    cinv = getattr(slabs.fac, "cinv", None)
    return slabs.pfac is not None and cinv is not None and cinv.shape[-1] == 0


_pallas_only = pallas_only


def _solve_batched(slabs, rhs, start: int = 0):
    """One solve per slab, all slabs at once; rhs (S, m1_max, n[, r]).
    ``start`` asserts the rhs is zero on lines < start (exact head-start)."""
    if _pallas_only(slabs):
        return pt.solve_all(slabs.pfac, jnp.arange(slabs.n_subs), rhs, start=start)
    if start > 0:
        return jax.vmap(
            lambda f, r: block_thomas_solve_support(f, r, start=start)
        )(slabs.fac, rhs)
    return jax.vmap(block_thomas_solve)(slabs.fac, rhs)


def _devectorize(slabs: SlabSystem, u_gamma: jnp.ndarray):
    """(2(S-1)n[, ...]) trace vector -> per-slab (v0, v1, vN, vNp) each
    (S, n[, ...]); trailing axes are RHS/direction batches that ride along.

    ``devectorizeBdyData`` semantics (``src/subdomains.jl:362-434``): slab s
    reads its upper traces from interface s-1 and lower from interface s.
    """
    S, n = slabs.n_subs, slabs.n
    extra = u_gamma.shape[1:]
    g = u_gamma.reshape((S - 1, 2, n) + extra)
    zero = jnp.zeros((1, n) + extra, dtype=u_gamma.dtype)
    v0 = jnp.concatenate([zero, g[:, 0]], axis=0)
    v1 = jnp.concatenate([zero, g[:, 1]], axis=0)
    vN = jnp.concatenate([g[:, 0], zero], axis=0)
    vNp = jnp.concatenate([g[:, 1], zero], axis=0)
    return v0, v1, vN, vNp


def _interface_vector(slabs: SlabSystem, upper_slot, lower_slot):
    """Assemble (2(S-1)n[, ...]) from per-slab (S, n[, ...]) arrays:
    interface q gets (upper_slot[q], lower_slot[q+1])."""
    out = jnp.stack([upper_slot[:-1], lower_slot[1:]], axis=1)
    return out.reshape((-1,) + upper_slot.shape[2:])


def block_apply(slabs: SlabSystem, v0, v1, vN, vNp):
    """Batched ``applyBlockOperator``: one local solve per slab driven by
    interface sources; returns traces (u0, u1, uN, uNp) each (S, n[, ...])."""
    dtype = slabs.cpl_01.dtype
    extra = v0.shape[2:]
    rhs = jnp.zeros((slabs.n_subs, slabs.m1_max, slabs.n) + extra, dtype=dtype)

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
        v0=v0.astype(dtype), v1=v1.astype(dtype),
        vN=vN.astype(dtype), vNp=vNp.astype(dtype),
        has_top=slabs.has_top, has_bot=slabs.has_bot,
        l0=slabs.l0, l1=slabs.l1, ln=slabs.ln, lnp=slabs.lnp,
        cpl_01=slabs.cpl_01, cpl_10=slabs.cpl_10,
        cpl_n_np=slabs.cpl_n_np, cpl_np_n=slabs.cpl_np_n,
    )
    rhs = jax.vmap(fill)(rhs, xs)
    # the solver layer batches ONE trailing RHS axis — fold any extra
    # leading batch axes (e.g. (R, 2) from the batched MM apply) into it
    if len(extra) > 1:
        rhs = rhs.reshape(rhs.shape[:3] + (-1,))
    # trace-driven rhs: zero above the first trace line, so the forward
    # substitution head-starts there (exact)
    u = _solve_batched(slabs, rhs, start=slabs.trace_head)
    if len(extra) > 1:
        u = u.reshape(u.shape[:3] + extra)
    idx = jnp.arange(slabs.n_subs)
    return (u[idx, slabs.l0], u[idx, slabs.l1], u[idx, slabs.ln], u[idx, slabs.lnp])


def _block_apply_single(slabs, idx, v0, v1, vN, vNp, l0, l1, ln, lnp,
                        cpl_01, cpl_10, cpl_n_np, cpl_np_n,
                        has_top, has_bot, start=0, tail=0):
    """Single-slab block apply used inside the sequential Dinv recursions.

    ``start``/``tail`` exploit the rhs/consumption structure of the caller
    (both exact): the down recursion drives only top-trace sources and reads
    only bottom traces; the up recursion is the mirror image.  Trailing
    axes of the traces (direction batches) ride through the multi-RHS
    slab solves — one pivot stream for the whole batch.
    """
    dtype = cpl_01.dtype
    extra = v0.shape[1:]
    rhs = jnp.zeros((slabs.m1_max, slabs.n) + extra, dtype=dtype)
    zero = jnp.zeros((slabs.n,) + extra, dtype=dtype)
    rhs = rhs.at[l1].set(jnp.where(has_top, -band_matvec(cpl_10, v0), zero))
    rhs = rhs.at[l0].set(jnp.where(has_top, band_matvec(cpl_01, v1), zero))
    rhs = rhs.at[lnp].set(jnp.where(has_bot, band_matvec(cpl_np_n, vN), zero))
    rhs = rhs.at[ln].set(jnp.where(has_bot, -band_matvec(cpl_n_np, vNp), zero))
    if _pallas_only(slabs):
        u = pt.solve_support(slabs.pfac, idx, rhs, start=start, tail=tail)
    else:
        u = block_thomas_solve_support(
            _fac_at(slabs.fac, idx), rhs, start=start, tail=tail
        )
    return u[l0], u[l1], u[ln], u[lnp]


def apply_mm(slabs: SlabSystem, u_pol: jnp.ndarray) -> jnp.ndarray:
    """The polarized integral operator ``MM`` (``applyMMOptUmf`` semantics,
    ``src/subdomains.jl:1015-1072``) via one batched 2-RHS solve per slab."""
    S, n = slabs.n_subs, slabs.n
    half = 2 * (S - 1) * n
    u_down, u_up = u_pol[:half], u_pol[half:]
    d0, d1, dN, dNp = _devectorize(slabs, u_down)
    p0, p1, pN, pNp = _devectorize(slabs, u_up)

    # RHS a: (u0D, u1D, uNU+uND, uNpU+uNpD); RHS b: (u0D+u0U, u1D+u1U, uNU, uNpU)
    v0 = jnp.stack([d0, d0 + p0], axis=-1)
    v1 = jnp.stack([d1, d1 + p1], axis=-1)
    vN = jnp.stack([pN + dN, pN], axis=-1)
    vNp = jnp.stack([pNp + dNp, pNp], axis=-1)
    u0_t, u1_t, uN_t, uNp_t = block_apply(slabs, v0, v1, vN, vNp)
    u0_a, u1_a = u0_t[..., 0], u1_t[..., 0]
    uN_b, uNp_b = uN_t[..., 1], uNp_t[..., 1]

    # Mu1 (down rows): interface q gets (-uNU-uND+uN_b of slab q,
    #                                    -u1U-u1D+u1_a of slab q+1)
    mu1 = _interface_vector(
        slabs,
        -pN - dN + uN_b,
        -p1 - d1 + u1_a,
    )
    # Mu (up rows): interface q gets (-uNpD+uNp_b of slab q,
    #                                 -u0U+u0_a of slab q+1)
    mu0 = _interface_vector(
        slabs,
        -dNp + uNp_b,
        -p0 + u0_a,
    )
    return jnp.concatenate([mu1, mu0])


def apply_m_down(slabs: SlabSystem, u_gamma: jnp.ndarray) -> jnp.ndarray:
    """Down-polarized block (``applyMdown``, ``src/subdomains.jl:587-616``)."""
    v0, v1, vN, vNp = _devectorize(slabs, u_gamma)
    zero = jnp.zeros_like(v0)
    _, u1_full, _, _ = block_apply(slabs, v0, v1, vN, vNp)
    _, _, uN_zero, _ = block_apply(slabs, v0, v1, zero, zero)
    first = (jnp.arange(slabs.n_subs) == 0).reshape(
        (slabs.n_subs,) + (1,) * (vN.ndim - 1)
    )
    upper = jnp.where(first, -vN, uN_zero - vN)
    return _interface_vector(slabs, upper, u1_full - v1)


def apply_m_up(slabs: SlabSystem, u_gamma: jnp.ndarray) -> jnp.ndarray:
    """Up-polarized block (``applyMup``, ``src/subdomains.jl:555-585``)."""
    v0, v1, vN, vNp = _devectorize(slabs, u_gamma)
    zero = jnp.zeros_like(v0)
    _, u1_zero, _, _ = block_apply(slabs, zero, zero, vN, vNp)
    _, _, uN_full, _ = block_apply(slabs, v0, v1, vN, vNp)
    last = (jnp.arange(slabs.n_subs) == slabs.n_subs - 1).reshape(
        (slabs.n_subs,) + (1,) * (v1.ndim - 1)
    )
    lower = jnp.where(last, -v1, u1_zero - v1)
    return _interface_vector(slabs, uN_full - vN, lower)


def apply_m0_down(slabs: SlabSystem, u_gamma: jnp.ndarray) -> jnp.ndarray:
    """Down block of the second polarized row (``applyM0down``,
    ``src/subdomains.jl:652-681``)."""
    v0, v1, vN, vNp = _devectorize(slabs, u_gamma)
    zero = jnp.zeros_like(v0)
    u0_full, _, _, _ = block_apply(slabs, v0, v1, vN, vNp)
    _, _, _, uNp_zero = block_apply(slabs, v0, v1, zero, zero)
    return _interface_vector(slabs, uNp_zero - vNp, u0_full)


def apply_m0_up(slabs: SlabSystem, u_gamma: jnp.ndarray) -> jnp.ndarray:
    """Up block of the second polarized row (``applyM0up``,
    ``src/subdomains.jl:618-650``)."""
    v0, v1, vN, vNp = _devectorize(slabs, u_gamma)
    zero = jnp.zeros_like(v0)
    u0_zero, _, _, _ = block_apply(slabs, zero, zero, vN, vNp)
    _, _, _, uNp_full = block_apply(slabs, v0, v1, vN, vNp)
    last = (jnp.arange(slabs.n_subs) == slabs.n_subs - 1).reshape(
        (slabs.n_subs,) + (1,) * (v0.ndim - 1)
    )
    lower = jnp.where(last, -v0, u0_zero - v0)
    return _interface_vector(slabs, uNp_full, lower)


def apply_mm_plain(slabs: SlabSystem, u_pol: jnp.ndarray) -> jnp.ndarray:
    """The polarized system from its four quadrants (``applyMM``,
    ``src/subdomains.jl:683-693``); agrees with :func:`apply_mm`."""
    half = u_pol.shape[0] // 2
    u_down, u_up = u_pol[:half], u_pol[half:]
    return jnp.concatenate(
        [
            apply_m_down(slabs, u_down) + apply_m_up(slabs, u_up),
            apply_m0_down(slabs, u_down) + apply_m0_up(slabs, u_up),
        ]
    )


def apply_u_coupling(slabs: SlabSystem, u_gamma: jnp.ndarray) -> jnp.ndarray:
    """``applyU`` (``src/subdomains.jl:817-845``)."""
    v0, v1, vN, vNp = _devectorize(slabs, u_gamma)
    _, _, uN_t, uNp_t = block_apply(slabs, v0, v1, vN, vNp)
    out = jnp.stack([(uN_t - vN)[:-1], uNp_t[:-1]], axis=1)
    return out.reshape((-1,) + u_gamma.shape[1:])


def apply_l_coupling(slabs: SlabSystem, u_gamma: jnp.ndarray) -> jnp.ndarray:
    """``applyL`` (``src/subdomains.jl:848-876``)."""
    v0, v1, vN, vNp = _devectorize(slabs, u_gamma)
    u0_t, u1_t, _, _ = block_apply(slabs, v0, v1, vN, vNp)
    out = jnp.stack([u0_t[1:], (u1_t - v1)[1:]], axis=1)
    return out.reshape((-1,) + u_gamma.shape[1:])


def _slab_xs_range(slabs: SlabSystem, lo: int, hi: int):
    # the factorization is indexed from the loop-invariant ``slabs.fac`` by
    # the ``idx`` field instead of riding scan xs (avoids multi-GB copies)
    sl = lambda a: a[lo:hi]
    return dict(
        idx=jnp.arange(lo, hi),
        l0=sl(slabs.l0), l1=sl(slabs.l1), ln=sl(slabs.ln), lnp=sl(slabs.lnp),
        has_top=sl(slabs.has_top), has_bot=sl(slabs.has_bot),
        cpl_01=sl(slabs.cpl_01), cpl_10=sl(slabs.cpl_10),
        cpl_n_np=sl(slabs.cpl_n_np), cpl_np_n=sl(slabs.cpl_np_n),
    )


def _fac_at(fac, i):
    return jax.tree_util.tree_map(lambda a: a[i], fac)


def apply_dinv_down(slabs: SlabSystem, u_gamma: jnp.ndarray) -> jnp.ndarray:
    """Sequential downward D^{-1} recursion (``applyDinvDown``,
    ``src/subdomains.jl:725-753``): interface 0 is negated; each next
    interface's value is the transmitted trace through the slab in between
    minus the input."""
    S, n = slabs.n_subs, slabs.n
    extra = u_gamma.shape[1:]
    g = u_gamma.reshape((S - 1, 2, n) + extra)
    first = -g[0]
    zero = jnp.zeros((n,) + extra, dtype=u_gamma.dtype)

    def step(carry, xs):
        vN, vNp = carry
        # top-trace sources only, bottom traces consumed: head-start the
        # forward pass and truncate the backward pass (both exact)
        _, _, tN, tNp = _block_apply_single(
            slabs, xs["idx"], vN, vNp, zero, zero,
            xs["l0"], xs["l1"], xs["ln"], xs["lnp"],
            xs["cpl_01"], xs["cpl_10"], xs["cpl_n_np"], xs["cpl_np_n"],
            xs["has_top"], xs["has_bot"],
            start=slabs.trace_head, tail=slabs.trace_tail,
        )
        out0 = tN - xs["g0"]
        out1 = tNp - xs["g1"]
        return (out0, out1), jnp.stack([out0, out1])

    xs = dict(_slab_xs_range(slabs, 1, S - 1), g0=g[1:, 0], g1=g[1:, 1])
    _, rest = jax.lax.scan(step, (first[0], first[1]), xs)
    out = jnp.concatenate([first[None], rest], axis=0)
    return out.reshape((-1,) + extra)


def apply_dinv_up(slabs: SlabSystem, u_gamma: jnp.ndarray) -> jnp.ndarray:
    """Sequential upward D^{-1} recursion (``applyDinvUp``,
    ``src/subdomains.jl:785-814``)."""
    S, n = slabs.n_subs, slabs.n
    extra = u_gamma.shape[1:]
    g = u_gamma.reshape((S - 1, 2, n) + extra)
    last = -g[S - 2]
    zero = jnp.zeros((n,) + extra, dtype=u_gamma.dtype)

    def step(carry, xs):
        v0, v1 = carry
        # bottom-trace sources only, top traces consumed: the forward pass
        # head-starts at the first bottom-trace line (exact)
        t0, t1, _, _ = _block_apply_single(
            slabs, xs["idx"], zero, zero, v0, v1,
            xs["l0"], xs["l1"], xs["ln"], xs["lnp"],
            xs["cpl_01"], xs["cpl_10"], xs["cpl_n_np"], xs["cpl_np_n"],
            xs["has_top"], xs["has_bot"],
            start=max(slabs.m1_max - slabs.trace_tail, 0),
        )
        out0 = t0 - xs["g0"]
        out1 = t1 - xs["g1"]
        return (out0, out1), jnp.stack([out0, out1])

    # interfaces S-3 .. 0 use slabs S-2 .. 1
    xs = dict(_slab_xs_range(slabs, 1, S - 1), g0=g[:-1, 0], g1=g[:-1, 1])
    _, rest = jax.lax.scan(step, (last[0], last[1]), xs, reverse=True)
    out = jnp.concatenate([rest, last[None]], axis=0)
    return out.reshape((-1,) + extra)


def apply_d_down(slabs: SlabSystem, u_gamma: jnp.ndarray) -> jnp.ndarray:
    """Downward block-diagonal operator (``applyDdown``,
    ``src/subdomains.jl:697-723``); exact inverse of ``apply_dinv_down``."""
    S, n = slabs.n_subs, slabs.n
    extra = u_gamma.shape[1:]
    g = u_gamma.reshape((S - 1, 2, n) + extra)
    v0, v1, _, _ = _devectorize(slabs, u_gamma)
    zero = jnp.zeros_like(v0)
    _, _, tN, tNp = block_apply(slabs, v0, v1, zero, zero)
    first = -g[0]
    rest = jnp.stack([tN[1 : S - 1], tNp[1 : S - 1]], axis=1) - g[1:]
    return jnp.concatenate([first[None], rest], axis=0).reshape((-1,) + extra)


def apply_d_up(slabs: SlabSystem, u_gamma: jnp.ndarray) -> jnp.ndarray:
    """Upward block-diagonal operator (``applyDup``,
    ``src/subdomains.jl:756-783``); exact inverse of ``apply_dinv_up``."""
    S, n = slabs.n_subs, slabs.n
    extra = u_gamma.shape[1:]
    g = u_gamma.reshape((S - 1, 2, n) + extra)
    _, _, vN, vNp = _devectorize(slabs, u_gamma)
    zero = jnp.zeros_like(vN)
    t0, t1, _, _ = block_apply(slabs, zero, zero, vN, vNp)
    last = -g[S - 2]
    rest = jnp.stack([t0[1 : S - 1], t1[1 : S - 1]], axis=1) - g[: S - 2]
    return jnp.concatenate([rest, last[None]], axis=0).reshape((-1,) + extra)


def permute_to_pairs(slabs: SlabSystem, b_pol: jnp.ndarray) -> jnp.ndarray:
    """The ``generatePermutationMatrix`` shuffle (``src/subdomains.jl:881-890``):
    ``[f1; f0]`` (down: (u_n, u_1) pairs / up: (u_np, u_0) pairs) into the
    recursion layout (down: (u_n, u_np), up: (u_0, u_1))."""
    S, n = slabs.n_subs, slabs.n
    half = 2 * (S - 1) * n
    extra = b_pol.shape[1:]
    f1 = b_pol[:half].reshape((S - 1, 2, n) + extra)
    f0 = b_pol[half:].reshape((S - 1, 2, n) + extra)
    down = jnp.stack([f1[:, 0], f0[:, 0]], axis=1)
    up = jnp.stack([f0[:, 1], f1[:, 1]], axis=1)
    flat = (-1,) + extra
    return jnp.concatenate([down.reshape(flat), up.reshape(flat)])


def precond_gauss_seidel(slabs: SlabSystem, v: jnp.ndarray, n_it: int) -> jnp.ndarray:
    """Block Gauss-Seidel on the polarized system (``PrecondGaussSeidel``,
    ``src/integral_preconditioner.jl:57-94``)."""
    half = v.shape[0] // 2
    vdown_rhs, vup_rhs = v[:half], v[half:]

    u_down = apply_dinv_down(slabs, vdown_rhs)
    u_up = apply_dinv_up(slabs, vup_rhs - apply_l_coupling(slabs, u_down))
    for _ in range(n_it - 1):
        u_down = apply_dinv_down(slabs, vdown_rhs - apply_u_coupling(slabs, u_up))
        u_up = apply_dinv_up(slabs, vup_rhs - apply_l_coupling(slabs, u_down))
    return jnp.concatenate([u_down, u_up])


def precond_jacobi(slabs: SlabSystem, v: jnp.ndarray, n_it: int) -> jnp.ndarray:
    """Block-Jacobi on the polarized system (``PrecondJacobi``,
    ``src/integral_preconditioner.jl:32-55``): both halves are relaxed
    against the PREVIOUS iterate instead of chaining down->up."""
    half = v.shape[0] // 2
    vdown_rhs, vup_rhs = v[:half], v[half:]

    u_down = apply_dinv_down(slabs, vdown_rhs)
    u_up = apply_dinv_up(slabs, vup_rhs)
    for _ in range(n_it - 1):
        new_down = apply_dinv_down(slabs, vdown_rhs - apply_u_coupling(slabs, u_up))
        new_up = apply_dinv_up(slabs, vup_rhs - apply_l_coupling(slabs, u_down))
        u_down, u_up = new_down, new_up
    return jnp.concatenate([u_down, u_up])


def extract_rhs_traces(slabs: SlabSystem, b: jnp.ndarray):
    """Local solves of the partitioned source + boundary-trace extraction
    (``extractRHS``/``extractFullBoundaryData``, ``src/subdomains.jl:309-359``).
    Returns (u_0, u_1, u_n, u_np) each (S, n), zeroed where absent."""
    rhs = partition_source(slabs, b)
    u = _solve_batched(slabs, rhs)
    idx = jnp.arange(slabs.n_subs)
    bshape = (slabs.n_subs,) + (1,) * (u.ndim - 2)
    mask_top = slabs.has_top.reshape(bshape)
    mask_bot = slabs.has_bot.reshape(bshape)
    u_0 = jnp.where(mask_top, u[idx, slabs.l0], 0.0)
    u_1 = jnp.where(mask_top, u[idx, slabs.l1], 0.0)
    u_n = jnp.where(mask_bot, u[idx, slabs.ln], 0.0)
    u_np = jnp.where(mask_bot, u[idx, slabs.lnp], 0.0)
    return u_0, u_1, u_n, u_np


def reconstruction(slabs: SlabSystem, b: jnp.ndarray, v0, v1, vn, vnp):
    """Volume reconstruction from interface traces: one local solve per slab
    with the trace-driven equivalent sources added to the partitioned source
    (``reconstruction``, ``src/subdomains.jl:893-943``)."""
    rhs = partition_source(slabs, b)
    dtype = rhs.dtype

    def add_sources(rhs_s, xs):
        zero = jnp.zeros_like(xs["v0"])
        top1 = jnp.where(xs["has_top"], -band_matvec(xs["cpl_10"], xs["v0"]), zero)
        top0 = jnp.where(xs["has_top"], band_matvec(xs["cpl_01"], xs["v1"]), zero)
        botp = jnp.where(xs["has_bot"], band_matvec(xs["cpl_np_n"], xs["vn"]), zero)
        botn = jnp.where(xs["has_bot"], -band_matvec(xs["cpl_n_np"], xs["vnp"]), zero)
        rhs_s = rhs_s.at[xs["l1"]].add(top1)
        rhs_s = rhs_s.at[xs["l0"]].add(top0)
        rhs_s = rhs_s.at[xs["lnp"]].add(botp)
        rhs_s = rhs_s.at[xs["ln"]].add(botn)
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
    u = _solve_batched(slabs, rhs)
    return gather_interior(slabs, u)


@struct.dataclass
class PolarizedTracesPreconditioner:
    """Full-system preconditioner through the trace-space inner solve
    (reference ``PolarizedTracesPreconditioner``,
    ``src/preconditioner.jl:62-75,207-225``)."""

    slabs: SlabSystem
    a_s: StencilMatrix2D
    n_it: int = struct.field(pytree_node=False, default=2)
    inner_tol: float = struct.field(pytree_node=False, default=1e-2)
    inner_maxiter: int = struct.field(pytree_node=False, default=40)
    precond_type: str = struct.field(pytree_node=False, default="GS")

    def apply(self, b: jnp.ndarray) -> jnp.ndarray:
        slabs = self.slabs
        S, n = slabs.n_subs, slabs.n
        asb = self.a_s.matvec(b)
        u_0, u_1, u_n, u_np = extract_rhs_traces(slabs, asb)
        f1 = _interface_vector(slabs, u_n, u_1)
        f0 = _interface_vector(slabs, u_np, u_0)
        f_pol = -jnp.concatenate([f1, f0])

        inner_precond = (
            precond_gauss_seidel if self.precond_type == "GS" else precond_jacobi
        )
        precond = lambda v: inner_precond(
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
        half = 2 * (S - 1) * n
        u = u_pol[:half] + u_pol[half:]
        v0, v1, vn, vnp = _devectorize(slabs, u)
        return reconstruction(slabs, asb, v0, v1, vn, vnp)

    def apply_batch(self, b_batch: jnp.ndarray) -> jnp.ndarray:
        """(R, m*n) joint batch apply (``gmres_batched`` convention).

        The R directions ride the whole trace pipeline as a trailing axis:
        ONE batched local-solve pass for the partitioned sources, ONE
        ``gmres_batched`` inner solve on the trace system whose MM applies
        and D-inverse recursions stream each slab's pivots once per step
        for all R columns, and ONE batched reconstruction — the same
        amortization that makes the sweep path's multi-direction solves
        ~flat in R (the reference solves directions serially,
        ``tests/plasma_integral_system_example.jl:115-134``)."""
        from fast_solver_lippmann_schwinger_tpu.solver.gmres import (
            gmres_batched,
        )

        slabs = self.slabs
        S, n = slabs.n_subs, slabs.n
        b = b_batch.T                              # (N, R)
        asb = self.a_s.matvec(b)
        u_0, u_1, u_n, u_np = extract_rhs_traces(slabs, asb)   # (S, n, R)
        f1 = _interface_vector(slabs, u_n, u_1)
        f0 = _interface_vector(slabs, u_np, u_0)
        f_pol = -jnp.concatenate([f1, f0])         # (M, R)

        inner_precond = (
            precond_gauss_seidel if self.precond_type == "GS" else precond_jacobi
        )
        matvec_b = lambda V: apply_mm(slabs, V.T).T
        precond_b = lambda V: inner_precond(
            slabs, permute_to_pairs(slabs, V.T), self.n_it
        ).T
        u_pol, _info = gmres_batched(
            matvec_b,
            f_pol.T,
            preconditioner=precond_b,
            rtol=self.inner_tol,
            restart=min(20, f_pol.shape[0]),
            maxiter=self.inner_maxiter,
        )
        u_pol = u_pol.T                            # (M, R)
        half = 2 * (S - 1) * n
        u = u_pol[:half] + u_pol[half:]
        v0, v1, vn, vnp = _devectorize(slabs, u)
        return reconstruction(slabs, asb, v0, v1, vn, vnp).T

    def __call__(self, b):
        return self.apply(b)
