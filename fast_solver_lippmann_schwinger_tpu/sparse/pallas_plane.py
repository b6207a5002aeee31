"""Pallas plane-pivot apply for the 3D block-Thomas solves.

The 3D substitution scans (``sparse/direct.py:_fwd_scan_3d/_bwd_scan_3d``)
pay the same toll the 2D sweeps paid before the fused kernels landed: each
step's pivot plane is gathered out of the (slabs, planes, mn, mn) stack by
dynamic-slice — and for the DDM sweeps the per-SLAB ``tree_map(a[i], fac)``
gather sits on top — materializing HBM copies of multi-GB stacks before the
matmul reads them back (measured ~2-3x the byte bound in 2D; RESULTS.md).

Here the pivot apply is a Pallas call whose (slab, plane) index arrives as a
scalar-prefetch argument feeding the BlockSpec index maps: the plane streams
HBM->VMEM tile-by-tile exactly once, no gather copies at either level.  The
in-plane stencil couplings (cheap: 9 taps on mn values vs the mn^2 matmul)
stay in XLA — only the traffic-dominant pivot matmul moves into the kernel.

Storage is the TRANSPOSED (input, output) orientation with both axes padded
to lane multiples: bf16, or int8 with the per-(128-input-block, output-lane)
dequantization scales validated in 2D (``pallas_thomas.py``) and 3D
(``direct.BlockTridiagFactorization3DInt8``).  Replaces the CPU PARDISO
solve role of the reference's 3D examples (``examples/example3D.jl:68-78``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from flax import struct
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fast_solver_lippmann_schwinger_tpu.sparse.pallas_thomas import (
    _resolve_interpret,
    _round_up,
)


@struct.dataclass
class PallasPlaneStack:
    """Flat (slab*plane) stack of transposed plane-pivot inverses.

    ``p_*[f, i, o]`` approximates ``Cinv[f // l1][f % l1][o, i]``; both axes
    padded to 128 multiples (padding is zero).  ``scale`` carries the
    per-(input-block, output-lane) dequantization factors — all-ones with
    ``nb = 1`` for bf16 storage.
    """

    p_re: jnp.ndarray    # (SL, np_in, np_out) bf16 or int8
    p_im: jnp.ndarray
    scale: jnp.ndarray   # (SL, 2, nb, np_out) f32
    mn: int = struct.field(pytree_node=False)    # true plane size
    l1: int = struct.field(pytree_node=False)    # planes per slab

    @property
    def np_in(self) -> int:
        return self.p_re.shape[1]

    @property
    def np_out(self) -> int:
        return self.p_re.shape[2]


@struct.dataclass
class PlaneSlabView:
    """One slab's factorization view: the shared plane stack plus this
    slab's inter-plane couplings and flat base offset.  Drop-in for the
    ``direct.py`` 3D scans (which read ``lsten``/``usten`` and call
    ``_pivot_apply_3d`` per plane)."""

    stack: PallasPlaneStack
    lsten: jnp.ndarray     # (l1, m, n, 3, 3)
    usten: jnp.ndarray
    base: jnp.ndarray      # scalar int32: slab * l1


def build_plane_stack(fac, batched: bool = True) -> PallasPlaneStack:
    """Convert a 3D plane factorization (full / bf16 / int8 storage,
    optionally with a leading slab axis) to the Pallas stack layout."""
    if hasattr(fac, "q_re"):
        q_re, q_im = fac.q_re, fac.q_im
        s_re, s_im = fac.s_re, fac.s_im
        if not batched:
            q_re, q_im, s_re, s_im = (
                q_re[None], q_im[None], s_re[None], s_im[None]
            )
        S, l1 = q_re.shape[0], q_re.shape[1]
        in_pad, mn = q_re.shape[2], q_re.shape[3]
        np_in = _round_up(in_pad, 128)
        np_out = _round_up(mn, 128)
        assert in_pad == np_in, "int8 input axis is pre-padded to 128"

        def pack_q(q):
            q = q.reshape(S * l1, np_in, mn)
            return jnp.pad(q, [(0, 0), (0, 0), (0, np_out - mn)])

        def pack_s(s):
            s = s.reshape(S * l1, s.shape[2], mn)
            return jnp.pad(s, [(0, 0), (0, 0), (0, np_out - mn)])

        scale = jnp.stack([pack_s(s_re), pack_s(s_im)], axis=1)
        return PallasPlaneStack(
            p_re=pack_q(q_re), p_im=pack_q(q_im), scale=scale, mn=mn, l1=l1,
        )

    if hasattr(fac, "cinv_re"):
        c_re, c_im = fac.cinv_re, fac.cinv_im
        if not batched:
            c_re, c_im = c_re[None], c_im[None]
    else:
        cinv = fac.cinv if batched else fac.cinv[None]
        c_re = jnp.real(cinv).astype(jnp.bfloat16)
        c_im = jnp.imag(cinv).astype(jnp.bfloat16)
    S, l1, mn = c_re.shape[0], c_re.shape[1], c_re.shape[2]
    np_in = _round_up(mn, 128)
    np_out = np_in

    def pack(c):
        ct = jnp.swapaxes(c, -1, -2).reshape(S * l1, mn, mn)
        return jnp.pad(
            ct, [(0, 0), (0, np_in - mn), (0, np_out - mn)]
        )

    scale = jnp.ones((S * l1, 2, 1, np_out), jnp.float32)
    return PallasPlaneStack(
        p_re=pack(c_re), p_im=pack(c_im), scale=scale, mn=mn, l1=l1,
    )


def _pick_tile(np_out: int, cap: int = 512) -> int:
    """Largest 128-multiple divisor of ``np_out`` not exceeding ``cap`` —
    bounds the per-step VMEM tile while keeping the grid uniform."""
    best = 128
    for t in range(128, cap + 1, 128):
        if np_out % t == 0:
            best = t
    return best


def _plane_kernel(s_ref, y_ref, pre_ref, pim_ref, sc_ref, out_ref):
    y = y_ref[...]
    nb = sc_ref.shape[2]
    r = y.shape[0] // 2
    if nb == 1:
        z1 = jnp.dot(y, pre_ref[0].astype(jnp.float32),
                     preferred_element_type=jnp.float32)
        z1 = z1 * sc_ref[0, 0, 0][None, :]
        z2 = jnp.dot(y, pim_ref[0].astype(jnp.float32),
                     preferred_element_type=jnp.float32)
        z2 = z2 * sc_ref[0, 1, 0][None, :]
    else:
        z1 = jnp.zeros((y.shape[0], out_ref.shape[1]), jnp.float32)
        z2 = jnp.zeros_like(z1)
        for b in range(nb):
            sl = slice(b * 128, (b + 1) * 128)
            yb = y[:, sl]
            z1 = z1 + jnp.dot(
                yb, pre_ref[0, sl, :].astype(jnp.float32),
                preferred_element_type=jnp.float32,
            ) * sc_ref[0, 0, b][None, :]
            z2 = z2 + jnp.dot(
                yb, pim_ref[0, sl, :].astype(jnp.float32),
                preferred_element_type=jnp.float32,
            ) * sc_ref[0, 1, b][None, :]
    out_ref[...] = jnp.concatenate([z1[:r] - z2[r:], z1[r:] + z2[:r]], axis=0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _plane_apply_rows(stack: PallasPlaneStack, idx, rows,
                      interpret: bool | None = None):
    """``[Yr; Yi] @ P[idx]`` with complex recombination; rows (2r, np_in)
    f32 -> (2r, np_out) f32."""
    interpret = _resolve_interpret(interpret)
    r2 = rows.shape[0]
    np_in, np_out = stack.np_in, stack.np_out
    nb = stack.scale.shape[2]
    tile = _pick_tile(np_out)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(np_out // tile,),
        in_specs=[
            # rows map to the same block every step: fetched once, held
            pl.BlockSpec((r2, np_in), lambda t, s: (0, 0)),
            pl.BlockSpec((1, np_in, tile), lambda t, s: (s[0], 0, t)),
            pl.BlockSpec((1, np_in, tile), lambda t, s: (s[0], 0, t)),
            pl.BlockSpec((1, 2, nb, tile), lambda t, s: (s[0], 0, 0, t)),
        ],
        out_specs=[pl.BlockSpec((r2, tile), lambda t, s: (0, t))],
    )
    (z,) = pl.pallas_call(
        _plane_kernel,
        out_shape=[jax.ShapeDtypeStruct((r2, np_out), jnp.float32)],
        grid_spec=grid_spec,
        interpret=interpret,
    )(idx, rows, stack.p_re, stack.p_im, stack.scale)
    return z


def plane_apply(view, k, y: jnp.ndarray) -> jnp.ndarray:
    """``C_k^{-1} y`` through the Pallas stack; ``view`` is a
    :class:`PlaneSlabView` (or bare stack with base 0), ``k`` the plane
    index within the slab (traced ok), ``y`` (mn[, r]) complex."""
    if hasattr(view, "stack"):
        stack, base = view.stack, view.base
    else:
        stack, base = view, 0
    mn = stack.mn
    y2 = y.reshape(mn, -1)
    r = y2.shape[1]
    rows = jnp.concatenate(
        [jnp.real(y2).T, jnp.imag(y2).T], axis=0
    ).astype(jnp.float32)
    rows = jnp.pad(rows, [(0, 0), (0, stack.np_in - mn)])
    idx = (jnp.asarray(base, jnp.int32) + jnp.asarray(k, jnp.int32)).reshape(1)
    z = _plane_apply_rows(stack, idx, rows)
    out = jax.lax.complex(z[:r, :mn].T, z[r:, :mn].T).astype(y.dtype)
    return out.reshape(y.shape)


# ---------------------------------------------------------------------------
# Fused whole-slab substitution kernels.
#
# The per-plane ``plane_apply`` above removes the gather copies but still
# launches one ``pallas_call`` per plane-STEP inside the ``lax.scan``
# substitution loops — measured ~37 us/step of dispatch overhead at the 96^3
# headline (1152 steps/sweep-apply: 69.5 ms against a 26 ms pivot-byte
# bound, RESULTS.md round 5).  Here ONE kernel walks a whole slab's forward
# (or backward) substitution: grid = (planes,), carry plane held in VMEM
# scratch, pivot planes streamed by scalar-prefetch flat index, and the
# 9-point in-plane coupling stencil applied IN-KERNEL as 9 lane-rolled
# multiply-adds against flat weight rows.
#
# The flat-shift trick: tap (dj, di) of an (a, b) plane is a flat offset
# ``(dj-1)*b + (di-1)``; a lane roll wraps across plane-row boundaries, but
# the weight rows are zeroed at PACK time wherever the target index is
# invalid (row/plane edge or padding), so every wrapped read is multiplied
# by an exact zero — no in-kernel masking.  This is the 2D fused-sweep
# recipe (``pallas_sweep.py``) applied to the 3D plane solves; replaces the
# per-plane dispatch the same way the 2D kernel replaced the per-line one.
# ---------------------------------------------------------------------------


def _pack_sten_rows(sten: jnp.ndarray, npad: int) -> jnp.ndarray:
    """(P, a, b, 3, 3) complex in-plane coupling stencils -> (P, 2, 9, npad)
    f32 flat weight rows, zeroed where tap targets fall outside the plane
    (the correctness contract of the in-kernel flat-shift apply)."""
    import numpy as np

    P, a, b = sten.shape[0], sten.shape[1], sten.shape[2]
    w = jnp.moveaxis(sten, (3, 4), (1, 2))          # (P, 3, 3, a, b)
    jj = np.arange(a)[:, None]
    ii = np.arange(b)[None, :]
    masks = np.zeros((3, 3, a, b), bool)
    for dj in range(3):
        for di in range(3):
            tj, ti = jj + dj - 1, ii + di - 1
            masks[dj, di] = (tj >= 0) & (tj < a) & (ti >= 0) & (ti < b)
    w = jnp.where(jnp.asarray(masks)[None], w, 0.0)
    w = w.reshape(P, 9, a * b)
    w = jnp.pad(w, [(0, 0), (0, 0), (0, npad - a * b)])
    return jnp.stack(
        [jnp.real(w), jnp.imag(w)], axis=1
    ).astype(jnp.float32)                            # (P, 2, 9, npad)


def _shift_flat(t, off: int):
    """Lane f of the result holds ``t[f + off]`` (wrapped — callers zero the
    invalid positions through the packed weight rows)."""
    if off == 0:
        return t
    npad = t.shape[1]
    return pltpu.roll(t, shift=(-off) % npad, axis=1)


def _sten_apply_rows(w, t, n: int):
    """9-tap in-plane stencil on stacked [re; im] rows: w (2, 9, np) f32
    packed by :func:`_pack_sten_rows`, t (2r, np); returns (accr, acci)."""
    r = t.shape[0] // 2
    tr, ti = t[:r], t[r:]
    accr = jnp.zeros_like(tr)
    acci = jnp.zeros_like(ti)
    d = 0
    for dj in (-1, 0, 1):
        for di in (-1, 0, 1):
            off = dj * n + di
            sr = _shift_flat(tr, off)
            si = _shift_flat(ti, off)
            wr = w[0, d][None, :]
            wi = w[1, d][None, :]
            accr = accr + wr * sr - wi * si
            acci = acci + wr * si + wi * sr
            d += 1
    return accr, acci


def _dot_plane(y, pre, pim, sc):
    """[Yr; Yi] @ P with complex recombination and per-(input-block,
    output-lane) dequant scales; y (2r, np) f32, pre/pim (np, np) storage
    dtype, sc (2, nb, np) f32.

    nb > 1 (int8) dequantizes the whole tile ONCE in the VPU and issues a
    single full-width MXU dot instead of nb partial (2r, 128) dots.
    Measured EQUAL to the partial-dot form at the 96^3 production size
    (64.2 ms/sweep-apply both ways — the kernel sits at ~1.2x the pivot
    byte bound, so neither dot structure is the bottleneck); kept for the
    shorter unrolled kernel body."""
    nb = sc.shape[1]
    r = y.shape[0] // 2
    if nb == 1:
        z1 = jnp.dot(y, pre.astype(jnp.float32),
                     preferred_element_type=jnp.float32) * sc[0, 0][None, :]
        z2 = jnp.dot(y, pim.astype(jnp.float32),
                     preferred_element_type=jnp.float32) * sc[1, 0][None, :]
    else:
        tile = pre.shape[1]
        # srow[i, o] = sc[:, i // 128, o] broadcast to full rows
        sr = jnp.broadcast_to(
            sc[0][:, None, :], (nb, 128, tile)
        ).reshape(nb * 128, tile)
        si = jnp.broadcast_to(
            sc[1][:, None, :], (nb, 128, tile)
        ).reshape(nb * 128, tile)
        z1 = jnp.dot(y, pre.astype(jnp.float32) * sr,
                     preferred_element_type=jnp.float32)
        z2 = jnp.dot(y, pim.astype(jnp.float32) * si,
                     preferred_element_type=jnp.float32)
    return jnp.concatenate([z1[:r] - z2[r:], z1[r:] + z2[:r]], axis=0)


def _carry_read(cref):
    """(T, r2, tile) carry scratch -> (r2, T*tile) flat rows via static
    leading-axis slices (no in-kernel transpose)."""
    T = cref.shape[0]
    if T == 1:
        return cref[0]
    return jnp.concatenate([cref[tk] for tk in range(T)], axis=1)


def _fwd_slab_kernel(idx_ref, b_ref, w_ref, pre_ref, pim_ref, sc_ref, t0_ref,
                     y_ref, t_ref, tprev, ysc, *, n, tile):
    p = pl.program_id(0)
    tix = pl.program_id(1)
    T = tprev.shape[0]

    @pl.when((p == 0) & (tix == 0))
    def _():
        t0 = t0_ref[...]
        for tk in range(T):
            tprev[tk] = t0[:, tk * tile : (tk + 1) * tile]

    r = tprev.shape[1] // 2

    @pl.when(tix == 0)
    def _():
        accr, acci = _sten_apply_rows(w_ref[0], _carry_read(tprev), n)
        brow = b_ref[0]
        y = jnp.concatenate([brow[:r] - accr, brow[r:] - acci], axis=0)
        ysc[...] = y
        y_ref[0] = y

    tt = _dot_plane(ysc[...], pre_ref[0], pim_ref[0], sc_ref[0])
    t_ref[0] = tt
    tprev[pl.ds(tix, 1)] = tt[None]


def _bwd_slab_kernel(idx_ref, y_ref, w_ref, pre_ref, pim_ref, sc_ref,
                     x_ref, xnext, wsc, *, n, tile):
    g = pl.program_id(0)
    tix = pl.program_id(1)

    @pl.when((g == 0) & (tix == 0))
    def _():
        xnext[...] = jnp.zeros_like(xnext)

    r = xnext.shape[1] // 2

    @pl.when(tix == 0)
    def _():
        accr, acci = _sten_apply_rows(w_ref[0], _carry_read(xnext), n)
        yrow = y_ref[0]
        wsc[...] = jnp.concatenate(
            [yrow[:r] - accr, yrow[r:] - acci], axis=0
        )

    x = _dot_plane(wsc[...], pre_ref[0], pim_ref[0], sc_ref[0])
    x_ref[0] = x
    xnext[pl.ds(tix, 1)] = x[None]


@functools.partial(jax.jit, static_argnames=("n", "interpret"))
def _fwd_slab_call(stack: PallasPlaneStack, idx, rows, wrows, t0,
                   n: int, interpret: bool | None = None):
    interpret = _resolve_interpret(interpret)
    Pe, r2, npad = rows.shape
    nb = stack.scale.shape[2]
    tile = _budget_tile(npad, stack.p_re.dtype.itemsize)
    T = npad // tile
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(Pe, T),
        in_specs=[
            pl.BlockSpec((1, r2, npad), lambda p, t, s: (p, 0, 0)),
            pl.BlockSpec((1, 2, 9, npad), lambda p, t, s: (p, 0, 0, 0)),
            pl.BlockSpec((1, npad, tile), lambda p, t, s: (s[p], 0, t)),
            pl.BlockSpec((1, npad, tile), lambda p, t, s: (s[p], 0, t)),
            pl.BlockSpec((1, 2, nb, tile), lambda p, t, s: (s[p], 0, 0, t)),
            pl.BlockSpec((r2, npad), lambda p, t, s: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, r2, npad), lambda p, t, s: (p, 0, 0)),
            pl.BlockSpec((1, r2, tile), lambda p, t, s: (p, 0, t)),
        ],
        scratch_shapes=[
            pltpu.VMEM((T, r2, tile), jnp.float32),
            pltpu.VMEM((r2, npad), jnp.float32),
        ],
    )
    y4, t4 = pl.pallas_call(
        functools.partial(_fwd_slab_kernel, n=n, tile=tile),
        out_shape=[
            jax.ShapeDtypeStruct((Pe, r2, npad), jnp.float32),
            jax.ShapeDtypeStruct((Pe, r2, npad), jnp.float32),
        ],
        grid_spec=grid_spec,
        interpret=interpret,
    )(idx, rows, wrows, stack.p_re, stack.p_im, stack.scale, t0)
    return y4, t4


@functools.partial(jax.jit, static_argnames=("n", "interpret"))
def _bwd_slab_call(stack: PallasPlaneStack, idx, yrows, wrows,
                   n: int, interpret: bool | None = None):
    interpret = _resolve_interpret(interpret)
    Pe, r2, npad = yrows.shape
    nb = stack.scale.shape[2]
    tile = _budget_tile(npad, stack.p_re.dtype.itemsize)
    T = npad // tile
    rev = Pe - 1
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(Pe, T),
        in_specs=[
            pl.BlockSpec((1, r2, npad), lambda g, t, s: (rev - g, 0, 0)),
            pl.BlockSpec((1, 2, 9, npad), lambda g, t, s: (rev - g, 0, 0, 0)),
            pl.BlockSpec((1, npad, tile), lambda g, t, s: (s[g], 0, t)),
            pl.BlockSpec((1, npad, tile), lambda g, t, s: (s[g], 0, t)),
            pl.BlockSpec((1, 2, nb, tile), lambda g, t, s: (s[g], 0, 0, t)),
        ],
        out_specs=[
            pl.BlockSpec((1, r2, tile), lambda g, t, s: (rev - g, 0, t)),
        ],
        scratch_shapes=[
            pltpu.VMEM((T, r2, tile), jnp.float32),
            pltpu.VMEM((r2, npad), jnp.float32),
        ],
    )
    (x4,) = pl.pallas_call(
        functools.partial(_bwd_slab_kernel, n=n, tile=tile),
        out_shape=[jax.ShapeDtypeStruct((Pe, r2, npad), jnp.float32)],
        grid_spec=grid_spec,
        interpret=interpret,
    )(idx, yrows, wrows, stack.p_re, stack.p_im, stack.scale)
    return x4


def _rows_of(bg: jnp.ndarray, npad: int) -> jnp.ndarray:
    """(P, mn[, r]) complex -> (P, 2r, npad) f32 stacked [re rows; im rows]."""
    P, mn = bg.shape[0], bg.shape[1]
    b2 = bg.reshape(P, mn, -1)
    rows = jnp.concatenate([jnp.real(b2), jnp.imag(b2)], axis=-1)
    rows = jnp.moveaxis(rows, -1, 1).astype(jnp.float32)     # (P, 2r, mn)
    return jnp.pad(rows, [(0, 0), (0, 0), (0, npad - mn)])


def _unrows(rows: jnp.ndarray, mn: int, dtype, shape) -> jnp.ndarray:
    r = rows.shape[1] // 2
    x = jax.lax.complex(rows[:, :r, :mn], rows[:, r:, :mn]).astype(dtype)
    return jnp.moveaxis(x, 1, -1).reshape(shape)


_SCOPED_VMEM_BUDGET = 8_000_000   # double-buffered pivot tiles; the TPU
                                  # scoped-vmem stack limit is 16 MB


def _budget_tile(npad: int, itemsize: int) -> int:
    """Output-tile width: largest 128-multiple divisor of ``npad`` whose
    double-buffered (npad, tile) re+im pivot blocks fit the scoped-VMEM
    budget (full planes blew the 16 MB stack limit on the real TPU)."""
    cap = max(128, _SCOPED_VMEM_BUDGET // (4 * npad * itemsize))
    return _pick_tile(npad, min(512, cap))


def fused_vmem_ok(stack: PallasPlaneStack, budget_bytes: int | None = None
                  ) -> bool:
    """Whether even the minimum (npad, 128) pivot tiles fit the fused
    kernels' VMEM working set.  Oversized planes fall back to the per-plane
    tiled path, which still streams correctly."""
    budget = _SCOPED_VMEM_BUDGET if budget_bytes is None else budget_bytes
    per_tile = stack.np_in * 128 * stack.p_re.dtype.itemsize
    return 4 * per_tile < budget


def fwd_scan_fused(view, bg, start: int = 0, t_start=None,
                   collect_t: bool = False):
    """Fused forward substitution over planes ``start..l-1`` of one slab —
    drop-in for ``direct._fwd_scan_3d`` on a :class:`PlaneSlabView`;
    returns ``(y stack, t stack or None)`` in plane order."""
    stack = view.stack
    lsten = view.lsten
    l, b_ = lsten.shape[0], lsten.shape[2]
    mn, npad = stack.mn, stack.np_out
    assert stack.np_in == npad, "fused path expects square padded pivots"
    dtype = lsten.dtype
    extra = bg.shape[2:]
    rows = _rows_of(bg[start:], npad)
    wrows = _pack_sten_rows(lsten[start:], npad)
    base = view.base if hasattr(view, "base") else jnp.int32(0)
    idx = jnp.asarray(base, jnp.int32) + jnp.arange(
        start, l, dtype=jnp.int32
    )
    r2 = rows.shape[1]
    if t_start is None:
        t0 = jnp.zeros((r2, npad), jnp.float32)
    else:
        t0 = _rows_of(t_start[None], npad)[0]
    y4, t4 = _fwd_slab_call(stack, idx, rows, wrows, t0, n=b_)
    shape = (l - start, mn) + extra
    y = _unrows(y4, mn, dtype, shape)
    if collect_t:
        return y, _unrows(t4, mn, dtype, shape)
    return y, None


def bwd_scan_fused(view, y, tail: int = 0):
    """Fused backward substitution — drop-in for ``direct._bwd_scan_3d`` on
    a :class:`PlaneSlabView`; ``tail > 0`` computes only the last planes
    (zeros elsewhere, exact — the recursion starts at the true last plane)."""
    stack = view.stack
    usten = view.usten
    l, b_ = usten.shape[0], usten.shape[2]
    mn, npad = stack.mn, stack.np_out
    assert stack.np_in == npad, "fused path expects square padded pivots"
    dtype = usten.dtype
    extra = y.shape[2:]
    full = tail <= 0 or tail >= l
    start = 0 if full else l - tail
    rows = _rows_of(y[start:], npad)
    wrows = _pack_sten_rows(usten[start:], npad)
    base = view.base if hasattr(view, "base") else jnp.int32(0)
    # descending flat plane indices: grid position g solves plane l-1-g
    idx = jnp.asarray(base, jnp.int32) + jnp.arange(
        l - 1, start - 1, -1, dtype=jnp.int32
    )
    x4 = _bwd_slab_call(stack, idx, rows, wrows, n=b_)
    x = _unrows(x4, mn, dtype, (l - start, mn) + extra)
    if full:
        return x
    out = jnp.zeros((l,) + x.shape[1:], dtype)
    return out.at[start:].set(x)
