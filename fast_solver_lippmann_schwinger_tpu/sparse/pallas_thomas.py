"""Fused Pallas substitution kernels for the block-Thomas solver.

The XLA path (``sparse/direct.py``) pays ~3x the HBM bound per line: the
scan body's dynamic-slice gather of the pivot plane materializes an HBM
copy (read + write) before the matmul reads it back.  Here each grid step
streams its pivot plane HBM->VMEM through the Pallas pipeline (double
buffered, overlapping the previous step's compute) and the substitution
carry lives in a VMEM scratch — the plane is read from HBM exactly once.

Storage: pivot inverses are kept TRANSPOSED in bfloat16 real/imag planes
padded to lane multiples, so the per-line apply is two row-vector matmuls
``[yr; yi] @ Cinv^T`` on the MXU.  Bands and the rhs ride as f32 re/im
rows.  The slab index enters as a scalar-prefetch argument feeding the
BlockSpec index maps — the DDM sweeps select a slab without gathering its
multi-GB pivot stack (the very copy this kernel exists to remove).

Numerics match the XLA bf16 path: bf16 pivots, f32 carries/accumulation.
Replaces the same native surface as ``direct.py`` (UMFPACK/PARDISO solves,
``src/preconditioner.jl:35``, ``src/subdomains.jl:110-190``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _resolve_interpret(interpret) -> bool:
    """``None`` -> interpret on the CPU backend (tests run the kernels in
    interpret mode; compiled Pallas needs TPU, incl. the axon tunnel)."""
    if interpret is None:
        return jax.default_backend() == "cpu"
    return bool(interpret)


@struct.dataclass
class PallasFactorization:
    """Slab-stacked block-Thomas factors in Pallas-friendly layout.

    Built from :class:`sparse.direct.BlockTridiagFactorization` (batched
    over slabs or with a singleton slab axis).  ``np_`` is the lane-padded
    line length; padding rows/columns are zero so carries stay zero there.
    """

    cinv_t_re: jnp.ndarray   # (S, m, np, np) bf16 or int8, TRANSPOSED
    cinv_t_im: jnp.ndarray   # (S, m, np, np)   pivot inverses
    lband: jnp.ndarray       # (S, m, 2, 3, np) f32 [re, im]
    uband: jnp.ndarray       # (S, m, 2, 3, np) f32
    # per-(input-block, output-lane) dequantization scales [re, im] —
    # all-ones (nb=1) for bf16 storage; block-absmax/127 for int8 (HALF the
    # HBM per solve, the sweep's entire byte budget).  Blocks of 128 input
    # lanes: one scale per whole row loses the rows' diagonal decay and was
    # measured to inflate 801-scale GMRES from 6 to 38 iterations; per-block
    # scales track the decay.
    scale: jnp.ndarray       # (S, m, 2, nb, np) f32
    n: int = struct.field(pytree_node=False)      # true line length

    @property
    def n_slabs(self) -> int:
        return self.cinv_t_re.shape[0]

    @property
    def m(self) -> int:
        return self.cinv_t_re.shape[1]

    @property
    def np_(self) -> int:
        return self.cinv_t_re.shape[2]


def build_pallas_factorization(fac, batched: bool = True,
                               storage: str = "bf16") -> PallasFactorization:
    """Convert a (batched) ``BlockTridiagFactorization`` (full-precision
    pivots) or ``BlockTridiagFactorizationBF16`` to the padded, transposed
    Pallas layout.

    ``storage``: "bf16" (unit scales) or "int8" (per-output-lane absmax
    quantization — half the pivot bytes; ~7 effective mantissa bits with
    the f32 lane scale vs bf16's 8, preconditioner-quality-neutral, see
    tests).
    """
    if hasattr(fac, "cinv_re"):
        cre_raw, cim_raw = fac.cinv_re, fac.cinv_im
    else:
        cre_raw = cim_raw = None
    lband, uband = fac.lband, fac.uband
    if not batched:
        lband, uband = lband[None], uband[None]
    if cre_raw is None:
        cinv = fac.cinv if batched else fac.cinv[None]
        S, m, n = cinv.shape[0], cinv.shape[1], cinv.shape[2]
        npad = _round_up(n, 128)
        cinv_t = jnp.swapaxes(cinv, -1, -2)
        pad_nn = [(0, 0), (0, 0), (0, npad - n), (0, npad - n)]
        cre = jnp.pad(jnp.real(cinv_t).astype(jnp.float32), pad_nn)
        cim = jnp.pad(jnp.imag(cinv_t).astype(jnp.float32), pad_nn)
    else:
        if not batched:
            cre_raw, cim_raw = cre_raw[None], cim_raw[None]
        S, m, n = cre_raw.shape[0], cre_raw.shape[1], cre_raw.shape[2]
        npad = _round_up(n, 128)
        pad_nn = [(0, 0), (0, 0), (0, npad - n), (0, npad - n)]
        cre = jnp.pad(
            jnp.swapaxes(cre_raw, -1, -2).astype(jnp.float32), pad_nn
        )
        cim = jnp.pad(
            jnp.swapaxes(cim_raw, -1, -2).astype(jnp.float32), pad_nn
        )

    if storage == "int8":
        # scales per (128-wide input block, output lane): axis 2 of the
        # transposed planes is the input (contraction) axis
        nb = npad // 128

        def quant(c):
            cb = c.reshape(S, m, nb, 128, npad)
            absmax = jnp.max(jnp.abs(cb), axis=3)             # (S, m, nb, np)
            s = jnp.where(absmax > 0, absmax / 127.0, 1.0)
            q = jnp.clip(
                jnp.round(cb / s[:, :, :, None, :]), -127, 127
            ).astype(jnp.int8).reshape(S, m, npad, npad)
            return q, s.astype(jnp.float32)

        cre, sre = quant(cre)
        cim, sim = quant(cim)
        scale = jnp.stack([sre, sim], axis=2)             # (S, m, 2, nb, np)
    else:
        cre = cre.astype(jnp.bfloat16)
        cim = cim.astype(jnp.bfloat16)
        scale = jnp.ones((S, m, 2, 1, npad), jnp.float32)

    def band_pack(band):
        # (S, m, n, 3) complex -> (S, m, 2, 3, np) f32
        b = jnp.moveaxis(band, -1, -2)                       # (S, m, 3, n)
        b = jnp.pad(b, [(0, 0), (0, 0), (0, 0), (0, npad - n)])
        return jnp.stack(
            [jnp.real(b).astype(jnp.float32), jnp.imag(b).astype(jnp.float32)],
            axis=2,
        )

    return PallasFactorization(
        cinv_t_re=cre, cinv_t_im=cim,
        lband=band_pack(lband), uband=band_pack(uband), scale=scale, n=n,
    )


def _shift_prev(t):
    """(2, np) -> value at lane i becomes t[i-1] (zero at i = 0)."""
    r = pltpu.roll(t, shift=1, axis=1)
    mask = jax.lax.broadcasted_iota(jnp.int32, t.shape, 1) > 0
    return jnp.where(mask, r, 0.0)


def _shift_next(t):
    """(2, np) -> value at lane i becomes t[i+1] (zero at the last lane)."""
    r = pltpu.roll(t, shift=t.shape[1] - 1, axis=1)
    mask = (
        jax.lax.broadcasted_iota(jnp.int32, t.shape, 1) < t.shape[1] - 1
    )
    return jnp.where(mask, r, 0.0)


def _band_apply(band, t):
    """Tridiagonal complex band times carry: band (2, 3, np), t (2, np)."""
    taps = (_shift_prev(t), t, _shift_next(t))
    accr = jnp.zeros_like(t[0])
    acci = jnp.zeros_like(t[0])
    for d, tv in enumerate(taps):
        br, bi = band[0, d], band[1, d]
        accr = accr + br * tv[0] - bi * tv[1]
        acci = acci + br * tv[1] + bi * tv[0]
    return accr, acci


def _scaled_dots(y, cre_ref, cim_ref, sc_ref):
    """``(y @ Cre) , (y @ Cim)`` with per-(input-block, output-lane)
    dequantization scales; y is (r2, np).  nb == 1 (bf16, unit scales) does
    one full-width dot; int8 does one partial dot per 128-lane input block,
    scaled before accumulation (error tracks each block's own magnitude)."""
    nb = sc_ref.shape[3]
    if nb == 1:
        cre = cre_ref[0, 0].astype(jnp.float32)
        cim = cim_ref[0, 0].astype(jnp.float32)
        zr = jnp.dot(y, cre, preferred_element_type=jnp.float32)
        zi = jnp.dot(y, cim, preferred_element_type=jnp.float32)
        return zr * sc_ref[0, 0, 0, 0][None, :], zi * sc_ref[0, 0, 1, 0][None, :]
    zr = jnp.zeros((y.shape[0], cre_ref.shape[3]), jnp.float32)
    zi = jnp.zeros_like(zr)
    for b in range(nb):
        sl = slice(b * 128, (b + 1) * 128)
        yb = y[:, sl]
        zr += jnp.dot(
            yb, cre_ref[0, 0, sl, :].astype(jnp.float32),
            preferred_element_type=jnp.float32,
        ) * sc_ref[0, 0, 0, b][None, :]
        zi += jnp.dot(
            yb, cim_ref[0, 0, sl, :].astype(jnp.float32),
            preferred_element_type=jnp.float32,
        ) * sc_ref[0, 0, 1, b][None, :]
    return zr, zi


def _pivot_dot(y2, cre_ref, cim_ref, sc_ref):
    """[yr; yi] @ Cinv^T for bf16/int8 transposed planes; f32 accumulation."""
    zr, zi = _scaled_dots(y2, cre_ref, cim_ref, sc_ref)
    tr = zr[0] - zi[1]
    ti = zr[1] + zi[0]
    return tr, ti


def _fwd_kernel(s_ref, b_ref, lb_ref, cre_ref, cim_ref, sc_ref, tinit_ref,
                y_ref, t_ref, tprev):
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _():
        tprev[...] = tinit_ref[...]

    accr, acci = _band_apply(lb_ref[0, 0], tprev[...])
    yr = b_ref[0, 0] - accr
    yi = b_ref[0, 1] - acci
    y_ref[0, 0] = yr
    y_ref[0, 1] = yi
    tr, ti = _pivot_dot(jnp.stack([yr, yi]), cre_ref, cim_ref, sc_ref)
    tprev[0] = tr
    tprev[1] = ti
    t_ref[0, 0] = tr
    t_ref[0, 1] = ti


def _bwd_kernel(s_ref, y_ref, ub_ref, cre_ref, cim_ref, sc_ref, x_ref, xnext):
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _():
        xnext[...] = jnp.zeros_like(xnext)

    accr, acci = _band_apply(ub_ref[0, 0], xnext[...])
    wr = y_ref[0, 0] - accr
    wi = y_ref[0, 1] - acci
    xr, xi = _pivot_dot(jnp.stack([wr, wi]), cre_ref, cim_ref, sc_ref)
    xnext[0] = xr
    xnext[1] = xi
    x_ref[0, 0] = xr
    x_ref[0, 1] = xi


@functools.partial(jax.jit, static_argnames=("start", "interpret"))
def _fwd(fac: PallasFactorization, s_idx, b2, t_init, start: int = 0,
         interpret: bool | None = None):
    """Forward substitution over lines ``start..m-1``; b2/t_init in the
    (m, 2, np) / (2, np) f32 layout.  Returns (y2, t2) stacks (m_eff, 2, np)."""
    interpret = _resolve_interpret(interpret)
    m, npad = fac.m, fac.np_
    nb = fac.scale.shape[3]
    m_eff = m - start
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(m_eff,),
        in_specs=[
            pl.BlockSpec((1, 2, npad), lambda j, s: (start + j, 0, 0)),
            pl.BlockSpec((1, 1, 2, 3, npad),
                         lambda j, s: (s[0], start + j, 0, 0, 0)),
            pl.BlockSpec((1, 1, npad, npad),
                         lambda j, s: (s[0], start + j, 0, 0)),
            pl.BlockSpec((1, 1, npad, npad),
                         lambda j, s: (s[0], start + j, 0, 0)),
            pl.BlockSpec((1, 1, 2, nb, npad),
                         lambda j, s: (s[0], start + j, 0, 0, 0)),
            pl.BlockSpec((2, npad), lambda j, s: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 2, npad), lambda j, s: (j, 0, 0)),
            pl.BlockSpec((1, 2, npad), lambda j, s: (j, 0, 0)),
        ],
        scratch_shapes=[pltpu.VMEM((2, npad), jnp.float32)],
    )
    return pl.pallas_call(
        _fwd_kernel,
        out_shape=[
            jax.ShapeDtypeStruct((m_eff, 2, npad), jnp.float32),
            jax.ShapeDtypeStruct((m_eff, 2, npad), jnp.float32),
        ],
        grid_spec=grid_spec,
        interpret=interpret,
    )(s_idx, b2, fac.lband, fac.cinv_t_re, fac.cinv_t_im, fac.scale, t_init)


@functools.partial(jax.jit, static_argnames=("tail", "interpret"))
def _bwd(fac: PallasFactorization, s_idx, y2, tail: int = 0,
         interpret: bool | None = None):
    """Backward substitution; ``tail > 0`` computes only the last ``tail``
    lines.  ``y2`` is the FULL (m, 2, np) stack; returns (m_eff, 2, np)
    ordered bottom-up-reversed back to top-down."""
    interpret = _resolve_interpret(interpret)
    m, npad = fac.m, fac.np_
    nb = fac.scale.shape[3]
    m_eff = m if tail <= 0 or tail >= m else tail
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(m_eff,),
        in_specs=[
            pl.BlockSpec((1, 2, npad), lambda j, s: (m - 1 - j, 0, 0)),
            pl.BlockSpec((1, 1, 2, 3, npad),
                         lambda j, s: (s[0], m - 1 - j, 0, 0, 0)),
            pl.BlockSpec((1, 1, npad, npad),
                         lambda j, s: (s[0], m - 1 - j, 0, 0)),
            pl.BlockSpec((1, 1, npad, npad),
                         lambda j, s: (s[0], m - 1 - j, 0, 0)),
            pl.BlockSpec((1, 1, 2, nb, npad),
                         lambda j, s: (s[0], m - 1 - j, 0, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 2, npad), lambda j, s: (m_eff - 1 - j, 0, 0)),
        ],
        scratch_shapes=[pltpu.VMEM((2, npad), jnp.float32)],
    )
    (x2,) = pl.pallas_call(
        _bwd_kernel,
        out_shape=[jax.ShapeDtypeStruct((m_eff, 2, npad), jnp.float32)],
        grid_spec=grid_spec,
        interpret=interpret,
    )(s_idx, y2, fac.uband, fac.cinv_t_re, fac.cinv_t_im, fac.scale)
    return x2


def _to_rows(fac: PallasFactorization, b: jnp.ndarray) -> jnp.ndarray:
    """Complex (m, n)-shaped rhs -> (m, 2, np) f32 rows."""
    m, n, npad = fac.m, fac.n, fac.np_
    bg = b.reshape(m, n)
    rows = jnp.stack(
        [jnp.real(bg).astype(jnp.float32), jnp.imag(bg).astype(jnp.float32)],
        axis=1,
    )
    return jnp.pad(rows, [(0, 0), (0, 0), (0, npad - n)])


def _from_rows(rows: jnp.ndarray, n: int, dtype, m: int,
               offset: int = 0) -> jnp.ndarray:
    """(m_eff, 2, np) f32 rows -> complex (m, n), zero outside the computed
    window ``[offset, offset + m_eff)``."""
    x = jax.lax.complex(rows[:, 0, :n], rows[:, 1, :n]).astype(dtype)
    if x.shape[0] == m:
        return x
    out = jnp.zeros((m, n), dtype)
    return jax.lax.dynamic_update_slice(out, x, (offset, 0))


def solve(fac, s_idx, b: jnp.ndarray, tail: int = 0,
          interpret: bool | None = None) -> jnp.ndarray:
    """``S x = b`` for slab ``s_idx`` (traced scalar ok); semantics of
    ``direct.block_thomas_solve(_tail)``.  Multi-RHS (m, n, r) dispatches
    to the batched kernels (one pivot stream for all r columns).  Accepts
    either the dense :class:`PallasFactorization` or the hybrid
    :class:`PallasFactorizationBandedTail` layout."""
    if hasattr(fac, "head_re"):
        return _ht_solve_all(
            fac, jnp.asarray(s_idx, jnp.int32).reshape(1), b[None],
            tail=tail, interpret=interpret,
        )[0]
    if b.ndim == 3:
        return solve_all(
            fac, jnp.asarray(s_idx, jnp.int32).reshape(1), b[None],
            tail=tail, interpret=interpret,
        )[0]
    s = jnp.asarray(s_idx, jnp.int32).reshape(1)
    dtype = b.dtype
    b2 = _to_rows(fac, b)
    zeros = jnp.zeros((2, fac.np_), jnp.float32)
    y2, _ = _fwd(fac, s, b2, zeros, interpret=interpret)
    x2 = _bwd(fac, s, y2, tail=tail, interpret=interpret)
    off = 0 if (tail <= 0 or tail >= fac.m) else fac.m - tail
    return _from_rows(x2, fac.n, dtype, fac.m, off).reshape(b.shape)


def solve_cached(fac: PallasFactorization, s_idx, b: jnp.ndarray,
                 tail: int = 0, interpret: bool | None = None):
    """Tail solve + forward-pass caches (``block_thomas_solve_cached``).

    ``b`` may be (m, n) single-RHS or (m, n, r) multi-RHS; multi-RHS
    streams each pivot plane from HBM once for ALL r columns (the sweeps'
    dominant byte traffic — this is the per-solve amortization the batched
    outer GMRES buys)."""
    if hasattr(fac, "head_re"):
        return _ht_solve_cached(fac, s_idx, b, tail=tail, interpret=interpret)
    if b.ndim == 3:
        return _solve_cached_multi(fac, s_idx, b, tail=tail,
                                   interpret=interpret)
    s = jnp.asarray(s_idx, jnp.int32).reshape(1)
    dtype = b.dtype
    b2 = _to_rows(fac, b)
    zeros = jnp.zeros((2, fac.np_), jnp.float32)
    y2, t2 = _fwd(fac, s, b2, zeros, interpret=interpret)
    x2 = _bwd(fac, s, y2, tail=tail, interpret=interpret)
    off = 0 if (tail <= 0 or tail >= fac.m) else fac.m - tail
    return _from_rows(x2, fac.n, dtype, fac.m, off).reshape(b.shape), y2, t2


def _solve_cached_multi(fac: PallasFactorization, s_idx, b: jnp.ndarray,
                        tail: int = 0, interpret: bool | None = None):
    """Multi-RHS ``solve_cached``: b (m, n, r) complex for ONE slab."""
    s = jnp.asarray(s_idx, jnp.int32).reshape(1)
    dtype = b.dtype
    b4 = _to_rows_b(fac, b[None])                    # (1, m, 2r, np)
    r2 = b4.shape[2]
    zeros = jnp.zeros((1, r2, fac.np_), jnp.float32)
    y4, t4 = _fwd_bt(fac, s, b4, zeros, interpret=interpret)
    x4 = _bwd_b(fac, s, y4, tail=tail, interpret=interpret)
    off = 0 if (tail <= 0 or tail >= fac.m) else fac.m - tail
    x = _from_rows_b(x4, fac.n, dtype, fac.m, off)[0].reshape(b.shape)
    return x, y4[0], t4[0]


def solve_resume(fac: PallasFactorization, s_idx, b: jnp.ndarray,
                 y_cached: jnp.ndarray, t_cached: jnp.ndarray, resume: int,
                 interpret: bool | None = None) -> jnp.ndarray:
    """Solve where b differs from the cached rhs only on the last ``resume``
    lines (``block_thomas_solve_resume``); single- or multi-RHS matching
    the caches produced by :func:`solve_cached`."""
    if hasattr(fac, "head_re"):
        return _ht_solve_resume(fac, s_idx, b, y_cached, t_cached, resume,
                                interpret=interpret)
    if b.ndim == 3:
        return _solve_resume_multi(fac, s_idx, b, y_cached, t_cached,
                                   resume, interpret=interpret)
    m = fac.m
    if resume <= 0 or resume >= m:
        return solve(fac, s_idx, b, interpret=interpret)
    s = jnp.asarray(s_idx, jnp.int32).reshape(1)
    dtype = b.dtype
    b2 = _to_rows(fac, b)
    j0 = m - resume
    y_new, _ = _fwd(fac, s, b2, t_cached[j0 - 1], start=j0,
                    interpret=interpret)
    y2 = jnp.concatenate([y_cached[:j0], y_new], axis=0)
    x2 = _bwd(fac, s, y2, interpret=interpret)
    return _from_rows(x2, fac.n, dtype, m).reshape(b.shape)


def _solve_resume_multi(fac: PallasFactorization, s_idx, b: jnp.ndarray,
                        y_cached: jnp.ndarray, t_cached: jnp.ndarray,
                        resume: int,
                        interpret: bool | None = None) -> jnp.ndarray:
    """Multi-RHS ``solve_resume``: b (m, n, r); caches (m, 2r, np)."""
    m = fac.m
    s = jnp.asarray(s_idx, jnp.int32).reshape(1)
    dtype = b.dtype
    b4 = _to_rows_b(fac, b[None])
    if resume <= 0 or resume >= m:
        r2 = b4.shape[2]
        zeros = jnp.zeros((1, r2, fac.np_), jnp.float32)
        y4, _ = _fwd_bt(fac, s, b4, zeros, interpret=interpret)
    else:
        j0 = m - resume
        y_new, _ = _fwd_bt(fac, s, b4, t_cached[None, j0 - 1], start=j0,
                           interpret=interpret)
        y4 = jnp.concatenate([y_cached[None, :j0], y_new], axis=1)
    x4 = _bwd_b(fac, s, y4, interpret=interpret)
    return _from_rows_b(x4, fac.n, dtype, m)[0].reshape(b.shape)


def solve_support(fac: PallasFactorization, s_idx, b: jnp.ndarray,
                  start: int = 0, tail: int = 0,
                  interpret: bool | None = None) -> jnp.ndarray:
    """Solve with b zero on lines < ``start``
    (``block_thomas_solve_support``); multi-RHS (m, n, r) dispatches to
    the batched kernels."""
    if hasattr(fac, "head_re"):
        return _ht_solve_all(
            fac, jnp.asarray(s_idx, jnp.int32).reshape(1), b[None],
            start=start, tail=tail, interpret=interpret,
        )[0]
    if b.ndim == 3:
        return solve_all(
            fac, jnp.asarray(s_idx, jnp.int32).reshape(1), b[None],
            start=start, tail=tail, interpret=interpret,
        )[0]
    m = fac.m
    if start <= 0 or start >= m:
        return solve(fac, s_idx, b, tail=tail, interpret=interpret)
    s = jnp.asarray(s_idx, jnp.int32).reshape(1)
    dtype = b.dtype
    b2 = _to_rows(fac, b)
    zeros = jnp.zeros((2, fac.np_), jnp.float32)
    y_new, _ = _fwd(fac, s, b2, zeros, start=start, interpret=interpret)
    y2 = jnp.concatenate(
        [jnp.zeros((start, 2, fac.np_), jnp.float32), y_new], axis=0
    )
    x2 = _bwd(fac, s, y2, tail=tail, interpret=interpret)
    off = 0 if (tail <= 0 or tail >= m) else m - tail
    return _from_rows(x2, fac.n, dtype, m, off).reshape(b.shape)


# ---------------------------------------------------------------------------
# Batched multi-RHS solves (all slabs at once, r right-hand sides each).
#
# The polarized-traces layer (ddm/polarized.py) drives ONE local solve per
# slab with up to r = 2 stacked right-hand sides (``applyBlockOperator``,
# ``src/subdomains.jl:212-271``).  Rows are stacked [re_0..re_{r-1},
# im_0..im_{r-1}] so the per-line pivot apply is a single (2r, np) @ (np, np)
# MXU matmul pair; the grid is (slab, line) with the line axis innermost, so
# each slab's substitution carry resets at line 0 and every pivot plane is
# still read from HBM exactly once.
# ---------------------------------------------------------------------------


def _band_apply_multi(band, t):
    """Tridiagonal complex band times multi-RHS carry: band (2, 3, np),
    t (2r, np) stacked [re rows; im rows]."""
    r = t.shape[0] // 2
    tr, ti = t[:r], t[r:]
    taps = (
        (_shift_prev(tr), _shift_prev(ti)),
        (tr, ti),
        (_shift_next(tr), _shift_next(ti)),
    )
    accr = jnp.zeros_like(tr)
    acci = jnp.zeros_like(ti)
    for d, (sr, si) in enumerate(taps):
        br, bi = band[0, d], band[1, d]
        accr = accr + br * sr - bi * si
        acci = acci + br * si + bi * sr
    return accr, acci


def _pivot_dot_multi(y, cre_ref, cim_ref, sc_ref):
    """[Yr; Yi] @ Cinv^T for (2r, np) stacked rows; f32 accumulation, with
    per-(input-block, output-lane) dequantization scales (ones for bf16)."""
    z1, z2 = _scaled_dots(y, cre_ref, cim_ref, sc_ref)
    r = y.shape[0] // 2
    tr = z1[:r] - z2[r:]
    ti = z1[r:] + z2[:r]
    return jnp.concatenate([tr, ti], axis=0)


def _fwd_kernel_bt(s_ref, b_ref, lb_ref, cre_ref, cim_ref, sc_ref, tinit_ref,
                   y_ref, t_ref, tprev):
    """Multi-RHS forward substitution that ALSO emits the pivot-applied
    carry stack ``t`` (the cache consumed by ``solve_resume``) and accepts a
    per-slab initial carry (the resume entry point)."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        tprev[...] = tinit_ref[0]

    r = tprev.shape[0] // 2
    accr, acci = _band_apply_multi(lb_ref[0, 0], tprev[...])
    b = b_ref[0, 0]
    y = jnp.concatenate([b[:r] - accr, b[r:] - acci], axis=0)
    y_ref[0, 0] = y
    tn = _pivot_dot_multi(y, cre_ref, cim_ref, sc_ref)
    tprev[...] = tn
    t_ref[0, 0] = tn


@functools.partial(jax.jit, static_argnames=("start", "interpret"))
def _fwd_bt(fac: PallasFactorization, s_idx, b4, t_init, start: int = 0,
            interpret: bool | None = None):
    """Batched multi-RHS forward substitution with carry cache: b4 is
    (S, m, 2r, np) f32, ``t_init`` (S, 2r, np).  Returns (y4, t4) stacks
    (S, m_eff, 2r, np) over lines ``start..m-1``."""
    interpret = _resolve_interpret(interpret)
    S, r2 = b4.shape[0], b4.shape[2]
    m, npad = fac.m, fac.np_
    nb = fac.scale.shape[3]
    m_eff = m - start
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(S, m_eff),
        in_specs=[
            pl.BlockSpec((1, 1, r2, npad), lambda i, j, s: (i, start + j, 0, 0)),
            pl.BlockSpec((1, 1, 2, 3, npad),
                         lambda i, j, s: (s[i], start + j, 0, 0, 0)),
            pl.BlockSpec((1, 1, npad, npad),
                         lambda i, j, s: (s[i], start + j, 0, 0)),
            pl.BlockSpec((1, 1, npad, npad),
                         lambda i, j, s: (s[i], start + j, 0, 0)),
            pl.BlockSpec((1, 1, 2, nb, npad),
                         lambda i, j, s: (s[i], start + j, 0, 0, 0)),
            pl.BlockSpec((1, r2, npad), lambda i, j, s: (i, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, r2, npad), lambda i, j, s: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, r2, npad), lambda i, j, s: (i, j, 0, 0)),
        ],
        scratch_shapes=[pltpu.VMEM((r2, npad), jnp.float32)],
    )
    return pl.pallas_call(
        _fwd_kernel_bt,
        out_shape=[
            jax.ShapeDtypeStruct((S, m_eff, r2, npad), jnp.float32),
            jax.ShapeDtypeStruct((S, m_eff, r2, npad), jnp.float32),
        ],
        grid_spec=grid_spec,
        interpret=interpret,
    )(s_idx, b4, fac.lband, fac.cinv_t_re, fac.cinv_t_im, fac.scale, t_init)


def _fwd_kernel_b(s_ref, b_ref, lb_ref, cre_ref, cim_ref, sc_ref, y_ref,
                  tprev):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        tprev[...] = jnp.zeros_like(tprev)

    r = tprev.shape[0] // 2
    accr, acci = _band_apply_multi(lb_ref[0, 0], tprev[...])
    b = b_ref[0, 0]
    y = jnp.concatenate([b[:r] - accr, b[r:] - acci], axis=0)
    y_ref[0, 0] = y
    tprev[...] = _pivot_dot_multi(y, cre_ref, cim_ref, sc_ref)


def _bwd_kernel_b(s_ref, y_ref, ub_ref, cre_ref, cim_ref, sc_ref, x_ref,
                  xnext):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        xnext[...] = jnp.zeros_like(xnext)

    r = xnext.shape[0] // 2
    accr, acci = _band_apply_multi(ub_ref[0, 0], xnext[...])
    y = y_ref[0, 0]
    w = jnp.concatenate([y[:r] - accr, y[r:] - acci], axis=0)
    xn = _pivot_dot_multi(w, cre_ref, cim_ref, sc_ref)
    xnext[...] = xn
    x_ref[0, 0] = xn


@functools.partial(jax.jit, static_argnames=("start", "interpret"))
def _fwd_b(fac: PallasFactorization, s_idx, b4, start: int = 0,
           interpret: bool | None = None):
    """Batched forward substitution; b4 is (S, m, 2r, np) f32.  Returns the
    y stack (S, m_eff, 2r, np) over lines ``start..m-1``."""
    interpret = _resolve_interpret(interpret)
    S, r2 = b4.shape[0], b4.shape[2]
    m, npad = fac.m, fac.np_
    nb = fac.scale.shape[3]
    m_eff = m - start
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(S, m_eff),
        in_specs=[
            pl.BlockSpec((1, 1, r2, npad), lambda i, j, s: (i, start + j, 0, 0)),
            pl.BlockSpec((1, 1, 2, 3, npad),
                         lambda i, j, s: (s[i], start + j, 0, 0, 0)),
            pl.BlockSpec((1, 1, npad, npad),
                         lambda i, j, s: (s[i], start + j, 0, 0)),
            pl.BlockSpec((1, 1, npad, npad),
                         lambda i, j, s: (s[i], start + j, 0, 0)),
            pl.BlockSpec((1, 1, 2, nb, npad),
                         lambda i, j, s: (s[i], start + j, 0, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, r2, npad), lambda i, j, s: (i, j, 0, 0)),
        ],
        scratch_shapes=[pltpu.VMEM((r2, npad), jnp.float32)],
    )
    (y4,) = pl.pallas_call(
        _fwd_kernel_b,
        out_shape=[jax.ShapeDtypeStruct((S, m_eff, r2, npad), jnp.float32)],
        grid_spec=grid_spec,
        interpret=interpret,
    )(s_idx, b4, fac.lband, fac.cinv_t_re, fac.cinv_t_im, fac.scale)
    return y4


@functools.partial(jax.jit, static_argnames=("tail", "interpret"))
def _bwd_b(fac: PallasFactorization, s_idx, y4, tail: int = 0,
           interpret: bool | None = None):
    """Batched backward substitution over the FULL (S, m, 2r, np) y stack;
    ``tail > 0`` materializes only the last ``tail`` lines."""
    interpret = _resolve_interpret(interpret)
    S, r2 = y4.shape[0], y4.shape[2]
    m, npad = fac.m, fac.np_
    nb = fac.scale.shape[3]
    m_eff = m if tail <= 0 or tail >= m else tail
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(S, m_eff),
        in_specs=[
            pl.BlockSpec((1, 1, r2, npad), lambda i, j, s: (i, m - 1 - j, 0, 0)),
            pl.BlockSpec((1, 1, 2, 3, npad),
                         lambda i, j, s: (s[i], m - 1 - j, 0, 0, 0)),
            pl.BlockSpec((1, 1, npad, npad),
                         lambda i, j, s: (s[i], m - 1 - j, 0, 0)),
            pl.BlockSpec((1, 1, npad, npad),
                         lambda i, j, s: (s[i], m - 1 - j, 0, 0)),
            pl.BlockSpec((1, 1, 2, nb, npad),
                         lambda i, j, s: (s[i], m - 1 - j, 0, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, r2, npad),
                         lambda i, j, s: (i, m_eff - 1 - j, 0, 0)),
        ],
        scratch_shapes=[pltpu.VMEM((r2, npad), jnp.float32)],
    )
    (x4,) = pl.pallas_call(
        _bwd_kernel_b,
        out_shape=[jax.ShapeDtypeStruct((S, m_eff, r2, npad), jnp.float32)],
        grid_spec=grid_spec,
        interpret=interpret,
    )(s_idx, y4, fac.uband, fac.cinv_t_re, fac.cinv_t_im, fac.scale)
    return x4


def _to_rows_b(fac: PallasFactorization, b: jnp.ndarray) -> jnp.ndarray:
    """Complex (S, m, n[, r]) rhs -> (S, m, 2r, np) f32 stacked rows."""
    S, m, n, npad = b.shape[0], fac.m, fac.n, fac.np_
    bg = b.reshape(S, m, n, -1)
    rows = jnp.concatenate(
        [jnp.real(bg), jnp.imag(bg)], axis=-1
    ).astype(jnp.float32)
    rows = jnp.moveaxis(rows, -1, 2)                      # (S, m, 2r, n)
    return jnp.pad(rows, [(0, 0), (0, 0), (0, 0), (0, npad - n)])


def _from_rows_b(rows: jnp.ndarray, n: int, dtype, m: int,
                 offset: int = 0) -> jnp.ndarray:
    """(S, m_eff, 2r, np) f32 rows -> complex (S, m, n, r), zero outside the
    computed window ``[offset, offset + m_eff)`` along lines."""
    r = rows.shape[2] // 2
    x = jax.lax.complex(rows[:, :, :r, :n], rows[:, :, r:, :n]).astype(dtype)
    x = jnp.moveaxis(x, 2, -1)                            # (S, m_eff, n, r)
    if x.shape[1] == m:
        return x
    out = jnp.zeros((x.shape[0], m, n, r), dtype)
    return jax.lax.dynamic_update_slice(out, x, (0, offset, 0, 0))


def solve_all(fac: PallasFactorization, s_idx, b: jnp.ndarray,
              start: int = 0, tail: int = 0,
              interpret: bool | None = None) -> jnp.ndarray:
    """Solve every slab's system at once: ``b`` is (S, m, n) or (S, m, n, r)
    complex with slab ``s_idx[i]``'s factors applied to batch row i.  ``start``
    asserts the rhs is zero on lines < start (exact head-start); ``tail``
    truncates the backward pass.  Batched counterpart of
    ``vmap(block_thomas_solve_support)``."""
    if hasattr(fac, "head_re"):
        return _ht_solve_all(fac, s_idx, b, start=start, tail=tail,
                             interpret=interpret)
    s = jnp.asarray(s_idx, jnp.int32).reshape(-1)
    dtype = b.dtype
    m = fac.m
    b4 = _to_rows_b(fac, b)
    if start >= m:
        start = 0
    y4 = _fwd_b(fac, s, b4, start=max(start, 0), interpret=interpret)
    if 0 < start < m:
        y4 = jnp.concatenate(
            [jnp.zeros((b4.shape[0], start) + y4.shape[2:], jnp.float32), y4],
            axis=1,
        )
    x4 = _bwd_b(fac, s, y4, tail=tail, interpret=interpret)
    off = 0 if (tail <= 0 or tail >= m) else m - tail
    return _from_rows_b(x4, fac.n, dtype, m, off).reshape(b.shape)


# ---------------------------------------------------------------------------
# Fused banded+tail hybrid kernels.
#
# The XLA ``banded_tail`` pivot format (``direct.py``) saves 37% of the bf16
# pivot bytes at iteration near-parity, but its w shifted multiply-adds per
# line are op-overhead-bound on XLA (916.6 ms/solve at the 801 headline vs
# the 269.5 ms dense-bf16 Pallas path — RESULTS.md round 4).  Here the byte
# win becomes wall-clock: one kernel walks the lines, streaming BLOCK-BANDED
# head pivots (each 128-lane output block only couples to a (128 + 2*halo)-
# lane input window — the banded apply is nb windowed MXU matmuls, not w
# shifted VPU MACs) and dense bf16 planes on the near-interface tail lines,
# with the substitution carry staying in VMEM across the head/tail boundary.
#
# Both storage tensors ride the same grid: each BlockSpec index map CLAMPS
# into its own segment, and the Pallas pipeline skips the HBM fetch whenever
# consecutive steps map to the same block — during head steps the tail ref
# sits pinned (and vice versa), so per line exactly ONE pivot representation
# streams from HBM.  Replaces the UMFPACK/PARDISO solve role
# (``src/preconditioner.jl:557-630``) at ~0.45x the dense-bf16 bytes.
# ---------------------------------------------------------------------------


@struct.dataclass
class PallasFactorizationBandedTail:
    """Hybrid slab pivot storage for the fused Pallas sweeps.

    Head lines (``< tail_start``) keep a BLOCK-BANDED windowed layout:
    ``head_*[s, j, p, w, o]`` is the (input-window, output-lane) tile of the
    TRANSPOSED banded pivot inverse for output block ``p`` — window width
    ``W = 128 + 2*halo`` covers all couplings ``|out - in| <= width//2``.
    Tail lines keep full transposed bf16 planes (near-interface pivot
    inverses are effectively dense interface Green's functions; banding them
    destabilizes the substitution recursions — RESULTS.md round 4).
    """

    head_re: jnp.ndarray   # (S, ts, nb, W, 128) bf16
    head_im: jnp.ndarray
    tail_re: jnp.ndarray   # (S, m - ts, np, np) bf16, transposed
    tail_im: jnp.ndarray
    lband: jnp.ndarray     # (S, m, 2, 3, np) f32
    uband: jnp.ndarray     # (S, m, 2, 3, np) f32
    n: int = struct.field(pytree_node=False)
    tail_start: int = struct.field(pytree_node=False)
    halo: int = struct.field(pytree_node=False)   # input-window half-overhang
    width: int = struct.field(pytree_node=False)  # kept band diagonals

    @property
    def n_slabs(self) -> int:
        return self.lband.shape[0]

    @property
    def m(self) -> int:
        return self.lband.shape[1]

    @property
    def np_(self) -> int:
        return self.tail_re.shape[2]


def build_pallas_banded_tail(
    fac, width: int | None = None, tail_lines: int = 8, batched: bool = True,
) -> PallasFactorizationBandedTail:
    """Convert a (batched) full-precision ``BlockTridiagFactorization`` to
    the fused banded+tail Pallas layout.

    ``width=None`` applies the measured w(n) rule
    (``direct.default_band_width``); ``tail_lines`` counts the trailing
    lines stored as full bf16 planes (callers pass ``trace_tail + margin``).
    """
    from fast_solver_lippmann_schwinger_tpu.sparse.direct import (
        default_band_width,
    )

    cinv = fac.cinv if batched else fac.cinv[None]
    lband = fac.lband if batched else fac.lband[None]
    uband = fac.uband if batched else fac.uband[None]
    S, m, n = cinv.shape[0], cinv.shape[1], cinv.shape[2]
    if width is None:
        width = default_band_width(n)
    width = min(width | 1, 2 * n - 1)
    half = width // 2
    tail_lines = int(min(max(tail_lines, 1), m - 1))
    ts = m - tail_lines
    npad = _round_up(n, 128)
    nb = npad // 128
    halo = _round_up(half, 8)
    W = 128 + 2 * halo

    ct = jnp.swapaxes(cinv, -1, -2)                  # (S, m, in, out)

    head = ct[:, :ts]
    ii = jnp.arange(n)[:, None]
    oo = jnp.arange(n)[None, :]
    head = jnp.where((jnp.abs(ii - oo) <= half)[None, None], head, 0.0)
    head = jnp.pad(
        head, [(0, 0), (0, 0), (halo, npad - n + halo), (0, npad - n)]
    )
    packs = jnp.stack(
        [head[:, :, 128 * p : 128 * p + W, 128 * p : 128 * p + 128]
         for p in range(nb)],
        axis=2,
    )                                                # (S, ts, nb, W, 128)
    head_re = jnp.real(packs).astype(jnp.bfloat16)
    head_im = jnp.imag(packs).astype(jnp.bfloat16)

    tail = jnp.pad(
        ct[:, ts:], [(0, 0), (0, 0), (0, npad - n), (0, npad - n)]
    )
    tail_re = jnp.real(tail).astype(jnp.bfloat16)
    tail_im = jnp.imag(tail).astype(jnp.bfloat16)

    def band_pack(band):
        b = jnp.moveaxis(band, -1, -2)               # (S, m, 3, n)
        b = jnp.pad(b, [(0, 0), (0, 0), (0, 0), (0, npad - n)])
        return jnp.stack(
            [jnp.real(b).astype(jnp.float32), jnp.imag(b).astype(jnp.float32)],
            axis=2,
        )

    return PallasFactorizationBandedTail(
        head_re=head_re, head_im=head_im,
        tail_re=tail_re, tail_im=tail_im,
        lband=band_pack(lband), uband=band_pack(uband),
        n=n, tail_start=ts, halo=halo, width=width,
    )


def _ht_head_pivot(y, ypad, hr_ref, hi_ref, halo):
    """Block-banded pivot apply: per output block p, one (r2, W) x (W, 128)
    MXU matmul pair against the windowed transposed band tiles."""
    r = y.shape[0] // 2
    npad = y.shape[1]
    nb, W = hr_ref.shape[2], hr_ref.shape[3]
    ypad[:, halo : halo + npad] = y
    yp = ypad[...]
    z1s, z2s = [], []
    for p in range(nb):
        yw = yp[:, 128 * p : 128 * p + W]
        z1s.append(jnp.dot(yw, hr_ref[0, 0, p].astype(jnp.float32),
                           preferred_element_type=jnp.float32))
        z2s.append(jnp.dot(yw, hi_ref[0, 0, p].astype(jnp.float32),
                           preferred_element_type=jnp.float32))
    z1 = jnp.concatenate(z1s, axis=1)
    z2 = jnp.concatenate(z2s, axis=1)
    return jnp.concatenate([z1[:r] - z2[r:], z1[r:] + z2[:r]], axis=0)


def _ht_tail_pivot(y, tr_ref, ti_ref):
    r = y.shape[0] // 2
    z1 = jnp.dot(y, tr_ref[0, 0].astype(jnp.float32),
                 preferred_element_type=jnp.float32)
    z2 = jnp.dot(y, ti_ref[0, 0].astype(jnp.float32),
                 preferred_element_type=jnp.float32)
    return jnp.concatenate([z1[:r] - z2[r:], z1[r:] + z2[:r]], axis=0)


def _fwd_kernel_ht(s_ref, b_ref, lb_ref, hr_ref, hi_ref, tr_ref, ti_ref,
                   tinit_ref, y_ref, t_ref, tprev, ypad, *, ts, start, halo):
    j = pl.program_id(1)
    line = start + j

    @pl.when(j == 0)
    def _():
        tprev[...] = tinit_ref[0]
        ypad[...] = jnp.zeros_like(ypad)

    r = tprev.shape[0] // 2
    accr, acci = _band_apply_multi(lb_ref[0, 0], tprev[...])
    b = b_ref[0, 0]
    y = jnp.concatenate([b[:r] - accr, b[r:] - acci], axis=0)
    y_ref[0, 0] = y

    @pl.when(line < ts)
    def _():
        tn = _ht_head_pivot(y, ypad, hr_ref, hi_ref, halo)
        tprev[...] = tn
        t_ref[0, 0] = tn

    @pl.when(line >= ts)
    def _():
        tn = _ht_tail_pivot(y, tr_ref, ti_ref)
        tprev[...] = tn
        t_ref[0, 0] = tn


def _bwd_kernel_ht(s_ref, y_ref, ub_ref, hr_ref, hi_ref, tr_ref, ti_ref,
                   x_ref, xnext, ypad, *, ts, m, halo):
    j = pl.program_id(1)
    line = m - 1 - j

    @pl.when(j == 0)
    def _():
        xnext[...] = jnp.zeros_like(xnext)
        ypad[...] = jnp.zeros_like(ypad)

    r = xnext.shape[0] // 2
    accr, acci = _band_apply_multi(ub_ref[0, 0], xnext[...])
    y = y_ref[0, 0]
    w = jnp.concatenate([y[:r] - accr, y[r:] - acci], axis=0)

    @pl.when(line < ts)
    def _():
        xn = _ht_head_pivot(w, ypad, hr_ref, hi_ref, halo)
        xnext[...] = xn
        x_ref[0, 0] = xn

    @pl.when(line >= ts)
    def _():
        xn = _ht_tail_pivot(w, tr_ref, ti_ref)
        xnext[...] = xn
        x_ref[0, 0] = xn


@functools.partial(jax.jit, static_argnames=("start", "interpret"))
def _fwd_ht(fac: PallasFactorizationBandedTail, s_idx, b4, t_init,
            start: int = 0, interpret: bool | None = None):
    """Hybrid batched multi-RHS forward substitution with carry cache:
    b4 (S, m, 2r, np) f32, ``t_init`` (S, 2r, np).  Returns (y4, t4) over
    lines ``start..m-1``."""
    interpret = _resolve_interpret(interpret)
    S, r2 = b4.shape[0], b4.shape[2]
    m, npad = fac.m, fac.np_
    ts, halo = fac.tail_start, fac.halo
    nb, W = fac.head_re.shape[2], fac.head_re.shape[3]
    tl = m - ts
    m_eff = m - start
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(S, m_eff),
        in_specs=[
            pl.BlockSpec((1, 1, r2, npad), lambda i, j, s: (i, start + j, 0, 0)),
            pl.BlockSpec((1, 1, 2, 3, npad),
                         lambda i, j, s: (s[i], start + j, 0, 0, 0)),
            # clamped into each segment: the pipeline elides the HBM fetch
            # whenever the mapped block is unchanged from the previous step,
            # so only the active representation streams
            pl.BlockSpec((1, 1, nb, W, 128),
                         lambda i, j, s: (s[i], jnp.minimum(start + j, ts - 1),
                                          0, 0, 0)),
            pl.BlockSpec((1, 1, nb, W, 128),
                         lambda i, j, s: (s[i], jnp.minimum(start + j, ts - 1),
                                          0, 0, 0)),
            pl.BlockSpec((1, 1, npad, npad),
                         lambda i, j, s: (s[i],
                                          jnp.clip(start + j - ts, 0, tl - 1),
                                          0, 0)),
            pl.BlockSpec((1, 1, npad, npad),
                         lambda i, j, s: (s[i],
                                          jnp.clip(start + j - ts, 0, tl - 1),
                                          0, 0)),
            pl.BlockSpec((1, r2, npad), lambda i, j, s: (i, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, r2, npad), lambda i, j, s: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, r2, npad), lambda i, j, s: (i, j, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((r2, npad), jnp.float32),
            pltpu.VMEM((r2, npad + 2 * halo), jnp.float32),
        ],
    )
    kernel = functools.partial(_fwd_kernel_ht, ts=ts, start=start, halo=halo)
    return pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((S, m_eff, r2, npad), jnp.float32),
            jax.ShapeDtypeStruct((S, m_eff, r2, npad), jnp.float32),
        ],
        grid_spec=grid_spec,
        interpret=interpret,
    )(s_idx, b4, fac.lband, fac.head_re, fac.head_im, fac.tail_re,
      fac.tail_im, t_init)


@functools.partial(jax.jit, static_argnames=("tail", "interpret"))
def _bwd_ht(fac: PallasFactorizationBandedTail, s_idx, y4, tail: int = 0,
            interpret: bool | None = None):
    """Hybrid batched backward substitution over the FULL (S, m, 2r, np)
    y stack; ``tail > 0`` materializes only the last ``tail`` lines."""
    interpret = _resolve_interpret(interpret)
    S, r2 = y4.shape[0], y4.shape[2]
    m, npad = fac.m, fac.np_
    ts, halo = fac.tail_start, fac.halo
    nb, W = fac.head_re.shape[2], fac.head_re.shape[3]
    tl = m - ts
    m_eff = m if tail <= 0 or tail >= m else tail
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(S, m_eff),
        in_specs=[
            pl.BlockSpec((1, 1, r2, npad), lambda i, j, s: (i, m - 1 - j, 0, 0)),
            pl.BlockSpec((1, 1, 2, 3, npad),
                         lambda i, j, s: (s[i], m - 1 - j, 0, 0, 0)),
            pl.BlockSpec((1, 1, nb, W, 128),
                         lambda i, j, s: (s[i], jnp.minimum(m - 1 - j, ts - 1),
                                          0, 0, 0)),
            pl.BlockSpec((1, 1, nb, W, 128),
                         lambda i, j, s: (s[i], jnp.minimum(m - 1 - j, ts - 1),
                                          0, 0, 0)),
            pl.BlockSpec((1, 1, npad, npad),
                         lambda i, j, s: (s[i],
                                          jnp.clip(m - 1 - j - ts, 0, tl - 1),
                                          0, 0)),
            pl.BlockSpec((1, 1, npad, npad),
                         lambda i, j, s: (s[i],
                                          jnp.clip(m - 1 - j - ts, 0, tl - 1),
                                          0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, r2, npad),
                         lambda i, j, s: (i, m_eff - 1 - j, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((r2, npad), jnp.float32),
            pltpu.VMEM((r2, npad + 2 * halo), jnp.float32),
        ],
    )
    kernel = functools.partial(_bwd_kernel_ht, ts=ts, m=m, halo=halo)
    (x4,) = pl.pallas_call(
        kernel,
        out_shape=[jax.ShapeDtypeStruct((S, m_eff, r2, npad), jnp.float32)],
        grid_spec=grid_spec,
        interpret=interpret,
    )(s_idx, y4, fac.uband, fac.head_re, fac.head_im, fac.tail_re,
      fac.tail_im)
    return x4


def _ht_fwd_full(fac, s, b4, t_init, start, interpret):
    """Forward pass with zero-padding of skipped head lines."""
    y4, t4 = _fwd_ht(fac, s, b4, t_init, start=start, interpret=interpret)
    if start > 0:
        pad = jnp.zeros((b4.shape[0], start) + y4.shape[2:], jnp.float32)
        y4 = jnp.concatenate([pad, y4], axis=1)
    return y4, t4


def _ht_solve_all(fac: PallasFactorizationBandedTail, s_idx, b, start=0,
                  tail=0, interpret=None):
    s = jnp.asarray(s_idx, jnp.int32).reshape(-1)
    dtype = b.dtype
    m = fac.m
    b4 = _to_rows_b(fac, b)
    S, r2 = b4.shape[0], b4.shape[2]
    if start >= m or start < 0:
        start = 0
    t0 = jnp.zeros((S, r2, fac.np_), jnp.float32)
    y4, _ = _ht_fwd_full(fac, s, b4, t0, start, interpret)
    x4 = _bwd_ht(fac, s, y4, tail=tail, interpret=interpret)
    off = 0 if (tail <= 0 or tail >= m) else m - tail
    return _from_rows_b(x4, fac.n, dtype, m, off).reshape(b.shape)


def _ht_solve_cached(fac: PallasFactorizationBandedTail, s_idx, b, tail=0,
                     interpret=None):
    s = jnp.asarray(s_idx, jnp.int32).reshape(1)
    dtype = b.dtype
    b4 = _to_rows_b(fac, b[None])
    r2 = b4.shape[2]
    t0 = jnp.zeros((1, r2, fac.np_), jnp.float32)
    y4, t4 = _fwd_ht(fac, s, b4, t0, interpret=interpret)
    x4 = _bwd_ht(fac, s, y4, tail=tail, interpret=interpret)
    off = 0 if (tail <= 0 or tail >= fac.m) else fac.m - tail
    x = _from_rows_b(x4, fac.n, dtype, fac.m, off)[0].reshape(b.shape)
    return x, y4[0], t4[0]


def _ht_solve_resume(fac: PallasFactorizationBandedTail, s_idx, b, y_cached,
                     t_cached, resume, interpret=None):
    m = fac.m
    s = jnp.asarray(s_idx, jnp.int32).reshape(1)
    dtype = b.dtype
    b4 = _to_rows_b(fac, b[None])
    if resume <= 0 or resume >= m:
        r2 = b4.shape[2]
        t0 = jnp.zeros((1, r2, fac.np_), jnp.float32)
        y4, _ = _fwd_ht(fac, s, b4, t0, interpret=interpret)
    else:
        j0 = m - resume
        y_new, _ = _fwd_ht(fac, s, b4, t_cached[None, j0 - 1], start=j0,
                           interpret=interpret)
        y4 = jnp.concatenate([y_cached[None, :j0], y_new], axis=1)
    x4 = _bwd_ht(fac, s, y4, interpret=interpret)
    return _from_rows_b(x4, fac.n, dtype, m)[0].reshape(b.shape)
