"""TPU-native sparse direct solver for stencil matrices.

Replaces the reference's native factorization backends — UMFPACK ``lu`` at
``src/preconditioner.jl:35`` / ``src/subdomains.jl:114`` and MKL PARDISO at
``src/preconditioner.jl:38-55`` / ``src/subdomains.jl:117-136`` — with a
structure-exploiting block-Thomas factorization: under lexicographic order a
3x3-stencil matrix on an (m, n) grid is block tridiagonal with tridiagonal
n x n blocks.  The factorization is a ``lax.scan`` over grid lines whose per
step work is one dense n x n inversion (MXU-bound); solves are scans of
n x n matvecs plus banded updates.  Everything batches over leading axes
with ``vmap`` (used to factor all DDM slabs at once).

The reference's two backends collapse into this single device-native solver;
the ``solvertype`` knob is kept at the API surface for parity but maps here.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from fast_solver_lippmann_schwinger_tpu.sparse.stencil_matrix import (
    StencilMatrix2D,
    StencilMatrix3D,
)

# Substitution scans are per-step latency-bound on TPU (~10 us/step vs the
# ~3 us HBM bound for streaming one pivot line); unrolling amortizes the
# loop overhead across several lines per hardware loop iteration.
_SOLVE_UNROLL = 4


@struct.dataclass
class BlockTridiagFactorization:
    """Per-line inverted pivot blocks + off-diagonal bands.

    ``cinv[j]`` is the inverse of the j-th Schur-complement pivot block;
    ``lband``/``uband`` are the tridiagonal couplings to lines j-1 / j+1,
    stored as (m, n, 3) bands.
    """

    cinv: jnp.ndarray    # (m, n, n)
    lband: jnp.ndarray   # (m, n, 3)
    uband: jnp.ndarray   # (m, n, 3)


@struct.dataclass
class BlockTridiagFactorizationBF16:
    """Memory-compressed variant: pivot inverses stored as bfloat16
    real/imag planes (half the HBM of complex64).

    Preconditioner applies tolerate the ~3-digit pivots — the outer Krylov
    iteration absorbs the perturbation (a couple extra iterations at most).
    Used for production DDM sizes where the full-precision stacks exceed
    HBM (e.g. the 801x801 double sweep).
    """

    cinv_re: jnp.ndarray  # (m, n, n) bfloat16
    cinv_im: jnp.ndarray  # (m, n, n) bfloat16
    lband: jnp.ndarray    # (m, n, 3) complex
    uband: jnp.ndarray    # (m, n, 3) complex


def compress_factorization(
    fac: BlockTridiagFactorization,
) -> BlockTridiagFactorizationBF16:
    return BlockTridiagFactorizationBF16(
        cinv_re=jnp.real(fac.cinv).astype(jnp.bfloat16),
        cinv_im=jnp.imag(fac.cinv).astype(jnp.bfloat16),
        lband=fac.lband,
        uband=fac.uband,
    )


@struct.dataclass
class BlockTridiagFactorizationBanded:
    """Band-compressed pivot inverses: only the ``w`` central diagonals of
    each ``C_j^{-1}`` are kept (``band[j, i, d] = Cinv_j[i, i + d - w//2]``),
    stored as bfloat16 real/imag planes.

    The pivot inverses are discrete line Green's functions; with the slabs'
    absorbing layers their entries decay away from the diagonal, so a banded
    pivot apply preserves preconditioner quality at a fraction of the HBM
    traffic (n*w instead of n^2 per line) — and the apply lowers to fused
    shifted multiply-adds instead of a gather-fed matmul.  The approximation
    only perturbs the PRECONDITIONER; outer GMRES convergence is the quality
    metric (pinned in ``tests/test_stencils.py::test_banded_pivot_quality``;
    measured across widths in ``benchmarks/banded_quality.py``).
    """

    band_re: jnp.ndarray   # (m, n, w) bfloat16
    band_im: jnp.ndarray   # (m, n, w) bfloat16
    lband: jnp.ndarray     # (m, n, 3) complex
    uband: jnp.ndarray     # (m, n, 3) complex


def default_band_width(n: int) -> int:
    """Measured w(n) selection rule for banded pivot storage.

    The required band width SCALES with the line length: w = 101 holds
    iteration parity at n = 201 but blows iterations up at n = 801, where
    w = 201 is needed (9/9 vs bf16's 6/6; RESULTS.md round 4).  w ~ n/4
    (odd, floor 33) tracks both measured points; callers picking a fixed
    yesterday's width at a larger n silently lose preconditioner quality,
    so ``width=None`` everywhere routes here.

    Measured caveat (round 5): the residual iteration gap vs full-bf16
    pivots is set by SLAB HEIGHT, not width, beyond this rule — at 401^2
    with ~116-line slabs the gap is +7 at any w in [101, 201] (recursion-
    depth error amplification), while at production slab heights (~60-70
    lines: 801/16 slabs, 401/8 slabs) banded_tail is within +3 or better.
    Keep DDM slabs short rather than widening the band further.
    """
    return min(max(n // 4, 33) | 1, 2 * n - 1)


def compress_factorization_banded(
    fac: BlockTridiagFactorization, width: int | None = None
) -> BlockTridiagFactorizationBanded:
    """Extract the central ``width`` diagonals of each pivot inverse
    (``width=None`` applies the measured :func:`default_band_width` rule)."""
    m, n = fac.cinv.shape[0], fac.cinv.shape[1]
    if width is None:
        width = default_band_width(n)
    width = min(width | 1, 2 * n - 1)    # odd, capped
    half = width // 2
    i = jnp.arange(n)[:, None]
    d = jnp.arange(width)[None, :]
    col = i + d - half                           # (n, w)
    valid = (col >= 0) & (col < n)
    colc = jnp.clip(col, 0, n - 1)
    band = jnp.take_along_axis(
        fac.cinv, jnp.broadcast_to(colc[None], (m, n, width)), axis=2
    )
    band = jnp.where(valid[None], band, 0.0)
    return BlockTridiagFactorizationBanded(
        band_re=jnp.real(band).astype(jnp.bfloat16),
        band_im=jnp.imag(band).astype(jnp.bfloat16),
        lband=fac.lband,
        uband=fac.uband,
    )


@struct.dataclass
class BlockTridiagFactorizationBandedLR:
    """Band + low-rank pivot inverses: ``Cinv_j ~ band_w(Cinv_j) + U V^H``.

    Pure banding fails when the pivot rows carry a non-decaying propagating
    component (measured: the off-band residual's singular values decay
    SLOWLY, but its total mass is small); a rank-r correction captures that
    smooth global part.  At (w=101, r=16, n=801) the streamed bytes per
    pivot apply drop ~6x vs full bf16 planes while the total approximation
    error sits at or below bf16 rounding.  Replaces the UMFPACK/PARDISO
    solve role (``src/preconditioner.jl:35``) at a fraction of the HBM
    traffic; quality pinned in ``tests/test_banded_pivots.py``.
    """

    band_re: jnp.ndarray   # (m, n, w) bfloat16
    band_im: jnp.ndarray   # (m, n, w) bfloat16
    u_re: jnp.ndarray      # (m, n, r) bfloat16
    u_im: jnp.ndarray      # (m, n, r) bfloat16
    v_re: jnp.ndarray      # (m, n, r) bfloat16
    v_im: jnp.ndarray      # (m, n, r) bfloat16
    lband: jnp.ndarray     # (m, n, 3) complex
    uband: jnp.ndarray     # (m, n, 3) complex


def compress_factorization_banded_lr(
    fac: BlockTridiagFactorization, width: int, rank: int,
    oversample: int = 8,
) -> BlockTridiagFactorizationBandedLR:
    """Band + randomized-range low-rank split of each pivot inverse.

    The off-band residual ``R = Cinv - band`` is compressed per line by a
    randomized range finder (R @ Omega -> QR -> small SVD), batched over
    lines on device.  The probe matrix is a deterministic golden-ratio
    phase grid built from iota (no host constants captured — the tunnel
    backend rejects large closure constants)."""
    del oversample  # QR-only range finder: all probed directions are kept
    banded = compress_factorization_banded(fac, width)
    m, n = fac.cinv.shape[0], fac.cinv.shape[1]
    width = min(width | 1, 2 * n - 1)
    half = width // 2
    ii = jnp.arange(n)[:, None]
    jj = jnp.arange(n)[None, :]
    R = jnp.where((jnp.abs(ii - jj) > half)[None], fac.cinv, 0.0)

    rank = min(rank, n)
    p = jnp.arange(n, dtype=jnp.float32)[:, None]
    q = jnp.arange(rank, dtype=jnp.float32)[None, :]
    phase = 2.0 * jnp.pi * jnp.mod(
        (p + 1.0) * (q + 1.0) * 0.6180339887498949, 1.0
    )
    omega = (
        jax.lax.complex(jnp.cos(phase), jnp.sin(phase))
        / jnp.sqrt(jnp.float32(rank))
    ).astype(fac.cinv.dtype)

    # QR-only range finder (no small SVD: batched complex64 SVD on the TPU
    # is numerically fragile — NaNs observed at the 801 scale): the
    # rank-r approximation is R ~ Q (Q^H R) with Q = qr(R @ Omega).
    Y = jnp.einsum("mij,jr->mir", R, omega)
    Q, _ = jnp.linalg.qr(Y)
    U = Q                                                   # (m, n, r)
    V = jnp.conj(
        jnp.swapaxes(jnp.einsum("mir,mij->mrj", jnp.conj(Q), R), 1, 2)
    )                                                       # (m, n, r)
    return BlockTridiagFactorizationBandedLR(
        band_re=banded.band_re, band_im=banded.band_im,
        u_re=jnp.real(U).astype(jnp.bfloat16),
        u_im=jnp.imag(U).astype(jnp.bfloat16),
        v_re=jnp.real(V).astype(jnp.bfloat16),
        v_im=jnp.imag(V).astype(jnp.bfloat16),
        lband=fac.lband, uband=fac.uband,
    )


@struct.dataclass
class BlockTridiagFactorizationBandedTail:
    """Tail-dense hybrid pivot storage: lines ``< tail_start`` keep only the
    ``w`` central diagonals (bf16), lines ``>= tail_start`` keep the FULL
    bf16 pivot plane.

    Root cause this fixes (measured, RESULTS.md round 4): the near-interface
    lines' pivot inverses are effectively dense interface Green's functions
    — banding (or band+low-rank) them to ~30% error makes the ~90-step
    substitution recursions amplify exponentially.  Interior lines' off-band
    mass at w ~ n/8 is bf16-class, so banding THEM is stable.  The hybrid
    stores exact-class planes only on the ~trace_tail interface lines:
    ~27% of the full-bf16 bytes at the 801 headline geometry
    (~1.1 bytes/entry amortized)."""

    band_re: jnp.ndarray   # (m, n, w) bfloat16 (rows >= tail_start unused)
    band_im: jnp.ndarray
    tail_re: jnp.ndarray   # (m - tail_start, n, n) bfloat16
    tail_im: jnp.ndarray
    lband: jnp.ndarray     # (m, n, 3) complex
    uband: jnp.ndarray     # (m, n, 3) complex
    tail_start: int = struct.field(pytree_node=False)


def compress_factorization_banded_tail(
    fac: BlockTridiagFactorization, width: int | None, tail_lines: int
) -> BlockTridiagFactorizationBandedTail:
    """Band the head lines, keep full bf16 planes for the last
    ``tail_lines`` lines (``width=None`` -> :func:`default_band_width`).
    ``tail_lines`` caps at m - 1 so the banded head segment is never empty
    (an all-dense request should use ``compress_factorization`` instead)."""
    m = fac.cinv.shape[0]
    tail_lines = int(min(max(tail_lines, 1), m - 1))
    ts = m - tail_lines
    banded = compress_factorization_banded(fac, width)
    tail = fac.cinv[ts:]
    return BlockTridiagFactorizationBandedTail(
        band_re=banded.band_re, band_im=banded.band_im,
        tail_re=jnp.real(tail).astype(jnp.bfloat16),
        tail_im=jnp.imag(tail).astype(jnp.bfloat16),
        lband=fac.lband, uband=fac.uband, tail_start=ts,
    )


def _hybrid_views(fac: BlockTridiagFactorizationBandedTail):
    """(head banded view, tail dense-bf16 view) with locally-indexed
    arrays, so the segment scans reuse the generic per-line machinery."""
    ts = fac.tail_start
    head = BlockTridiagFactorizationBanded(
        band_re=fac.band_re[:ts], band_im=fac.band_im[:ts],
        lband=fac.lband[:ts], uband=fac.uband[:ts],
    )
    tail = BlockTridiagFactorizationBF16(
        cinv_re=fac.tail_re, cinv_im=fac.tail_im,
        lband=fac.lband[ts:], uband=fac.uband[ts:],
    )
    return head, tail


def _lowrank_pivot_correction(fac_slice, y):
    """``U (V^H y)`` rank-r correction on top of the banded pivot apply."""
    u = jax.lax.complex(
        fac_slice.u_re.astype(jnp.float32), fac_slice.u_im.astype(jnp.float32)
    )
    v = jax.lax.complex(
        fac_slice.v_re.astype(jnp.float32), fac_slice.v_im.astype(jnp.float32)
    )
    yc = y.astype(u.dtype)
    t = jnp.einsum("nr,n...->r...", jnp.conj(v), yc)
    return jnp.einsum("nr,r...->n...", u, t).astype(y.dtype)


def _banded_pivot_apply(fac_slice, y):
    """``C_j^{-1} y`` with the band-compressed pivot: w fused shifted
    multiply-adds (y stays VMEM-resident; only the band streams from HBM)."""
    n, w = fac_slice.band_re.shape
    half = w // 2
    pad = [(half, half)] + [(0, 0)] * (y.ndim - 1)
    yr = jnp.pad(jnp.real(y).astype(jnp.float32), pad)
    yi = jnp.pad(jnp.imag(y).astype(jnp.float32), pad)
    trail = (1,) * (y.ndim - 1)
    out_r = jnp.zeros(y.shape, jnp.float32)
    out_i = jnp.zeros(y.shape, jnp.float32)
    for d in range(w):
        br = fac_slice.band_re[:, d].astype(jnp.float32).reshape((n,) + trail)
        bi = fac_slice.band_im[:, d].astype(jnp.float32).reshape((n,) + trail)
        out_r = out_r + br * yr[d : d + n] - bi * yi[d : d + n]
        out_i = out_i + br * yi[d : d + n] + bi * yr[d : d + n]
    return jax.lax.complex(out_r, out_i).astype(y.dtype)


def _pivot_apply(fac_slice, y):
    """``C_j^{-1} @ y`` for any storage format; y (n, ...) complex."""
    if hasattr(fac_slice, "band_re"):
        out = _banded_pivot_apply(fac_slice, y)
        if hasattr(fac_slice, "u_re"):
            out = out + _lowrank_pivot_correction(fac_slice, y)
        return out
    if hasattr(fac_slice, "q_re"):
        # transposed int8 x f32 with per-(input-block, output) scales: the
        # contraction runs over the leading (input) axis of the transposed
        # planes, one 128-row block at a time, each partial product scaled
        # AFTER its matmul — no dequantized matrix ever materializes (an
        # einsum formulation was observed to hoist dequantized f32 planes
        # for the WHOLE pivot stack out of the sweep scan: +8 GB at 96^3)
        n = y.shape[0]
        nb = fac_slice.s_re.shape[0]
        pad = nb * _INT8_BLOCK - n
        ys = jnp.stack(
            [jnp.real(y).astype(jnp.float32), jnp.imag(y).astype(jnp.float32)],
            axis=-1,
        )
        flat_t = jnp.pad(ys.reshape(n, -1), [(0, pad), (0, 0)]).T  # (r, in_pad)
        r_cols = flat_t.shape[0]
        zre_t = jnp.zeros((r_cols, n), jnp.float32)
        zim_t = jnp.zeros((r_cols, n), jnp.float32)
        for b in range(nb):
            sl = slice(b * _INT8_BLOCK, (b + 1) * _INT8_BLOCK)
            fb = flat_t[:, sl]                                # (r, B)
            zre_t = zre_t + (
                fb @ fac_slice.q_re[sl].astype(jnp.float32)
            ) * fac_slice.s_re[b][None, :]
            zim_t = zim_t + (
                fb @ fac_slice.q_im[sl].astype(jnp.float32)
            ) * fac_slice.s_im[b][None, :]
        zre = zre_t.T.reshape(ys.shape)
        zim = zim_t.T.reshape(ys.shape)
        out_r = zre[..., 0] - zim[..., 1]
        out_i = zre[..., 1] + zim[..., 0]
        return jax.lax.complex(out_r, out_i).astype(y.dtype)
    if hasattr(fac_slice, "cinv_re"):
        # one width-2 matmul per plane: [re|im] @ [yr yi] streams each
        # bf16 pivot plane from HBM ONCE (4 width-1 matvecs would read
        # them twice) — the sweeps are bound on exactly this traffic
        re = fac_slice.cinv_re.astype(jnp.float32)
        im = fac_slice.cinv_im.astype(jnp.float32)
        n = y.shape[0]
        ys = jnp.stack(
            [jnp.real(y).astype(jnp.float32), jnp.imag(y).astype(jnp.float32)],
            axis=-1,
        )                                   # (n, ..., 2)
        flat = ys.reshape(n, -1)            # (n, 2 * prod(rest))
        zre = (re @ flat).reshape(ys.shape)
        zim = (im @ flat).reshape(ys.shape)
        out_r = zre[..., 0] - zim[..., 1]
        out_i = zre[..., 1] + zim[..., 0]
        return jax.lax.complex(out_r, out_i).astype(y.dtype)
    return fac_slice.cinv @ y


def band_matvec(band: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Tridiagonal band times vector/matrix: out[i] = sum_d band[i,d] v[i+d-1].

    ``band`` (n, 3); ``v`` (n, ...) — extra trailing dims are RHS columns.
    """
    pad = [(1, 1)] + [(0, 0)] * (v.ndim - 1)
    vp = jnp.pad(v, pad)
    n = v.shape[0]
    out = jnp.zeros_like(v)
    for d in range(3):
        out = out + band[:, d].reshape((n,) + (1,) * (v.ndim - 1)) * vp[d : d + n]
    return out


def _band_mul_right(mat: jnp.ndarray, band: jnp.ndarray) -> jnp.ndarray:
    """(M @ U) for tridiagonal U given by ``band``: result[:, c] =
    sum_d M[:, c-d+1] band[c-d+1, d]."""
    n = mat.shape[1]
    out = jnp.zeros_like(mat)
    for d in range(3):
        scaled = mat * band[None, :, d]
        # shift columns right by (d - 1)
        shifted = jnp.roll(scaled, d - 1, axis=1)
        if d == 0:
            shifted = shifted.at[:, -1].set(0.0)
        elif d == 2:
            shifted = shifted.at[:, 0].set(0.0)
        out = out + shifted
    return out


def _band_to_dense(band: jnp.ndarray) -> jnp.ndarray:
    n = band.shape[0]
    i = jnp.arange(n)
    out = jnp.zeros((n, n), dtype=band.dtype)
    out = out.at[i, i].set(band[:, 1])
    out = out.at[i[1:], i[1:] - 1].set(band[1:, 0])
    out = out.at[i[:-1], i[:-1] + 1].set(band[:-1, 2])
    return out


def factor_stencil_2d(s: StencilMatrix2D) -> BlockTridiagFactorization:
    """Block-Thomas factorization of a 2D stencil matrix.

    Schur recursion ``C_j = D_j - L_j C_{j-1}^{-1} U_{j-1}`` over grid lines,
    storing explicit pivot inverses so that the solve is matmul-only.
    """
    vals = s.values
    dband = vals[:, :, 1, :]   # (m, n, 3) in-line couplings
    lband = vals[:, :, 0, :]
    uband = vals[:, :, 2, :]
    m, n = vals.shape[0], vals.shape[1]

    # thread uband with a one-line delay (U_{j-1} enters step j)
    uband_shift = jnp.concatenate(
        [jnp.zeros_like(uband[:1]), uband[:-1]], axis=0
    )

    def step_full(carry, inp):
        cinv_prev = carry
        dband_j, lband_j, uband_prev = inp
        lcinv = band_matvec(lband_j, cinv_prev)
        c = _band_to_dense(dband_j) - _band_mul_right(lcinv, uband_prev)
        cinv = jnp.linalg.inv(c)
        return cinv, cinv

    cinv0 = jnp.zeros((n, n), dtype=vals.dtype)
    _, cinv = jax.lax.scan(step_full, cinv0, (dband, lband, uband_shift))
    return BlockTridiagFactorization(cinv=cinv, lband=lband, uband=uband)


def _as_line_stack(fac, b):
    """Reshape ``b`` — flat (m*n,), gridded (m, n), or multi-RHS
    (m, n, r) / (m*n, r) — to a (m, n, ...) line stack."""
    m, n = fac.lband.shape[0], fac.lband.shape[1]
    if b.ndim == 1:
        return b.reshape(m, n)
    if b.ndim == 2 and b.shape == (m, n):
        return b
    if b.ndim == 2:             # (m*n, r)
        return b.reshape(m, n, b.shape[1])
    return b


def _fwd_scan(fac, bg, start: int = 0, t_start=None, collect_t: bool = False):
    """Forward substitution ``y_j = b_j - L_j t_{j-1}``, ``t_j = C_j^{-1} y_j``
    over lines ``start..m-1``; returns ``(y stack, t stack or None, final
    carry t_{m-1})``.

    The pivot stack is indexed per line inside the loop body rather than
    threaded through scan xs: threading the (m1, n, n) stacks through xs
    measured ~1.7x SLOWER (XLA materializes relayout copies of the xs
    inputs), see RESULTS.md.

    Tail-dense hybrid factorizations run as TWO chained segment scans
    (banded head, dense-bf16 tail) with the forward carry (NOT a collected
    head stack — that would keep an (ts, n, r) stack alive just to read its
    last line) handed across.
    """
    if hasattr(fac, "tail_start"):
        ts = fac.tail_start
        head, tailv = _hybrid_views(fac)
        if start >= ts:
            return _fwd_scan(tailv, bg[ts:], start=start - ts,
                             t_start=t_start, collect_t=collect_t)
        yh, th, t_mid = _fwd_scan(head, bg[:ts], start=start, t_start=t_start,
                                  collect_t=collect_t)
        yt, tt, t_fin = _fwd_scan(tailv, bg[ts:], t_start=t_mid,
                                  collect_t=collect_t)
        y = jnp.concatenate([yh, yt], axis=0)
        if collect_t:
            return y, jnp.concatenate([th, tt], axis=0), t_fin
        return y, None, t_fin

    m = fac.lband.shape[0]
    dtype = fac.lband.dtype
    lines = jnp.arange(start, m)

    def fwd(t_prev, inp):
        b_j, lband_j, j = inp
        y_j = b_j - band_matvec(lband_j, t_prev)
        t_j = _pivot_apply(jax.tree_util.tree_map(lambda a: a[j], fac), y_j)
        out = (y_j, t_j) if collect_t else y_j
        return t_j, out

    t0 = jnp.zeros(bg.shape[1:], dtype=dtype) if t_start is None else t_start
    t_fin, out = jax.lax.scan(
        fwd, t0, (bg[start:].astype(dtype), fac.lband[start:], lines),
        unroll=_SOLVE_UNROLL,
    )
    if collect_t:
        return out[0], out[1], t_fin
    return out, None, t_fin


def _bwd_scan(fac, y, tail: int = 0, x_start=None):
    """Backward substitution ``x_j = C_j^{-1}(y_j - U_j x_{j+1})``.

    With ``tail > 0`` only the last ``tail`` lines are materialized (the
    recursion starts at the true last line, so they are EXACT; lines above
    are returned as zeros).  ``x_start`` supplies the incoming carry when
    this call solves an upper SEGMENT of a larger system (hybrid path).
    """
    if hasattr(fac, "tail_start"):
        ts = fac.tail_start
        m = fac.lband.shape[0]
        head, tailv = _hybrid_views(fac)
        if 0 < tail <= m - ts:
            xt = _bwd_scan(tailv, y[ts:], tail=tail, x_start=x_start)
            out = jnp.zeros((m,) + y.shape[1:], dtype=fac.lband.dtype)
            return out.at[ts:].set(xt)
        xt = _bwd_scan(tailv, y[ts:], x_start=x_start)
        head_tail = 0 if (tail <= 0 or tail >= m) else tail - (m - ts)
        xh = _bwd_scan(head, y[:ts], tail=head_tail, x_start=xt[0])
        return jnp.concatenate([xh, xt], axis=0)

    m = fac.lband.shape[0]
    dtype = fac.lband.dtype
    full = tail <= 0 or tail >= m
    start = 0 if full else m - tail
    lines = jnp.arange(start, m)

    def bwd(x_next, inp):
        y_j, uband_j, j = inp
        x_j = _pivot_apply(
            jax.tree_util.tree_map(lambda a: a[j], fac),
            y_j - band_matvec(uband_j, x_next),
        )
        return x_j, x_j

    x0 = (jnp.zeros(y.shape[1:], dtype=dtype)
          if x_start is None else x_start.astype(dtype))
    # reverse=True iterates back-to-front without materializing reversed
    # copies of the pivot arrays
    _, x = jax.lax.scan(
        bwd, x0, (y[start:], fac.uband[start:], lines),
        reverse=True, unroll=_SOLVE_UNROLL,
    )
    if full:
        return x
    out = jnp.zeros((m,) + y.shape[1:], dtype=dtype)
    return out.at[start:].set(x)


def block_thomas_solve(fac: BlockTridiagFactorization, b: jnp.ndarray) -> jnp.ndarray:
    """Solve ``S x = b`` given the factorization.

    ``b`` may be flat (m*n,), gridded (m, n), or multi-RHS (m, n, r) /
    (m*n, r); the result matches the input shape.
    """
    bg = _as_line_stack(fac, b)
    y, _, _ = _fwd_scan(fac, bg)
    return _bwd_scan(fac, y).reshape(b.shape)


def block_thomas_solve_tail(fac: BlockTridiagFactorization, b: jnp.ndarray,
                            tail: int) -> jnp.ndarray:
    """Solve ``S x = b`` materializing x only on the LAST ``tail`` lines.

    Used by the downward sweeps, which consume only the bottom-interface
    traces of each local solve — the backward pass shrinks from m to
    ~2*npml steps (the forward pass still runs over all lines).
    """
    bg = _as_line_stack(fac, b)
    y, _, _ = _fwd_scan(fac, bg)
    return _bwd_scan(fac, y, tail).reshape(b.shape)


def block_thomas_solve_support(fac: BlockTridiagFactorization, b: jnp.ndarray,
                               start: int = 0, tail: int = 0) -> jnp.ndarray:
    """Solve ``S x = b`` for a rhs KNOWN to be zero on lines ``< start``.

    The forward substitution then has ``y_j = t_j = 0`` for ``j < start``
    and can begin at ``start`` with a zero carry (exact, no approximation);
    ``tail`` truncates the backward pass as in
    :func:`block_thomas_solve_tail`.  Used by the polarized-traces layer,
    whose local solves are driven by interface sources supported on at most
    four trace lines (``applyBlockOperator``, ``src/subdomains.jl:212-271``).
    """
    m = fac.lband.shape[0]
    bg = _as_line_stack(fac, b)
    if start <= 0 or start >= m:
        y, _, _ = _fwd_scan(fac, bg)
    else:
        y_new, _, _ = _fwd_scan(fac, bg, start=start)
        y = jnp.concatenate(
            [jnp.zeros((start,) + y_new.shape[1:], y_new.dtype), y_new], axis=0
        )
    return _bwd_scan(fac, y, tail).reshape(b.shape)


def block_thomas_solve_cached(fac: BlockTridiagFactorization, b: jnp.ndarray,
                              tail: int = 0):
    """Tail-truncated solve that also returns the forward-pass stacks
    ``(y, t)`` so a later solve whose rhs differs only on the last lines can
    resume the forward substitution (``block_thomas_solve_resume``)."""
    bg = _as_line_stack(fac, b)
    y, t, _ = _fwd_scan(fac, bg, collect_t=True)
    return _bwd_scan(fac, y, tail).reshape(b.shape), y, t


def block_thomas_solve_resume(fac: BlockTridiagFactorization, b: jnp.ndarray,
                              y_cached: jnp.ndarray, t_cached: jnp.ndarray,
                              resume: int) -> jnp.ndarray:
    """Solve ``S x = b`` where ``b`` differs from a previously cached solve's
    rhs only on the last ``resume`` lines.

    The forward substitution restarts at line ``m - resume`` from the cached
    carry, skipping ~(m - resume) pivot applications; the result is
    bit-identical to a full solve.  This is the up-sweep fast path: the
    upward Gauss-Seidel rhs is the downward rhs plus interface traces
    injected at the two bottom trace lines (``src/preconditioner.jl:608-616``
    modifies only ``ind_n``/``ind_np`` rows).
    """
    m = fac.lband.shape[0]
    if resume <= 0 or resume >= m:
        return block_thomas_solve(fac, b)
    bg = _as_line_stack(fac, b)
    j0 = m - resume
    y_new, _, _ = _fwd_scan(fac, bg, start=j0, t_start=t_cached[j0 - 1])
    y = jnp.concatenate([y_cached[:j0].astype(y_new.dtype), y_new], axis=0)
    return _bwd_scan(fac, y).reshape(b.shape)


# Batched variants (leading slab axis) — used by the DDM layer to factor and
# solve all subdomains concurrently (the reference factorizes slabs in a
# sequential Julia loop, ``tests/plasma_example.jl:123-128``).
factor_stencil_2d_batched = jax.vmap(
    lambda v: factor_stencil_2d(StencilMatrix2D(values=v))
)
block_thomas_solve_batched = jax.vmap(block_thomas_solve)


# -----------------------------------------------------------------------------
# 3D: planes as blocks
# -----------------------------------------------------------------------------

@struct.dataclass
class BlockTridiagFactorization3D:
    """z-plane block factorization of a 3D stencil matrix.

    Pivot blocks are dense (m n) x (m n); inter-plane couplings stay in
    9-point stencil form ((l, m, n, 3, 3) fields).
    """

    cinv: jnp.ndarray      # (l, m*n, m*n)
    lsten: jnp.ndarray     # (l, m, n, 3, 3) couplings to plane k-1
    usten: jnp.ndarray     # (l, m, n, 3, 3) couplings to plane k+1


@struct.dataclass
class BlockTridiagFactorization3DBF16:
    """bf16-compressed 3D plane pivots: half the HBM of complex64 — the
    (mn, mn) dense plane inverses are THE 3D memory wall (a 48^3 slab stack
    is ~2 GB in c64; the reference leans on CPU PARDISO here,
    ``examples/example3D.jl:68``).  Same trade as the 2D
    :class:`BlockTridiagFactorizationBF16`: preconditioner-only use, the
    outer Krylov absorbs the ~3-digit pivots."""

    cinv_re: jnp.ndarray   # (l, mn, mn) bfloat16
    cinv_im: jnp.ndarray   # (l, mn, mn) bfloat16
    lsten: jnp.ndarray     # (l, m, n, 3, 3)
    usten: jnp.ndarray     # (l, m, n, 3, 3)


def _compress_pivot_bf16(cinv):
    return (jnp.real(cinv).astype(jnp.bfloat16),
            jnp.imag(cinv).astype(jnp.bfloat16))


@struct.dataclass
class BlockTridiagFactorization3DInt8:
    """int8 plane pivots with per-row absmax scales: HALF the HBM of bf16
    at comparable effective precision (7 quantization bits + a shared f32
    row exponent vs bf16's 8 mantissa bits), and the sweep solves stream
    half the bytes.  Rows of ``C_k^{-1}`` map to output grid points, whose
    in-row dynamic range is modest — the per-row scale absorbs the large
    row-to-row decay.  This is what fits the 96^3 single-chip yblock
    factorization in 16 GB (bf16 was measured 12.7 GB pivots -> OOM).
    Preconditioner-only use, as with bf16."""

    # TRANSPOSED quantized pivot inverses: ``q_*[i, j] ~ Cinv[j, i]`` — the
    # apply contracts the LEADING axis (input i), which is the orientation
    # XLA:TPU wants for the int8 operand; storing row-major (out, in)
    # makes layout assignment keep a transposed COPY of the whole stack
    # (measured +10 GB at 96^3: the stack appears twice in the HBM dump
    # with swapped minor dims).  Input axis padded to a 128 multiple.
    q_re: jnp.ndarray      # (l, mn_pad, mn) int8, transposed
    q_im: jnp.ndarray      # (l, mn_pad, mn) int8
    s_re: jnp.ndarray      # (l, nb, mn) f32 per-(input-block, output) scales
    s_im: jnp.ndarray      # (l, nb, mn) f32
    lsten: jnp.ndarray     # (l, m, n, 3, 3)
    usten: jnp.ndarray     # (l, m, n, 3, 3)


_INT8_BLOCK = 128


def _quantize_t_int8(a):
    """f32 (out, in) -> (int8 (in_pad, out) transposed, f32 (nb, out)
    per-(input-block, output) scales).

    One scale per whole output row loses the rows' decay structure
    (measured to wreck preconditioner quality at scale); 128-wide input
    blocks track it.
    """
    out_n, in_n = a.shape
    nb = -(-in_n // _INT8_BLOCK)
    pad = nb * _INT8_BLOCK - in_n
    at = jnp.pad(a.T, [(0, pad), (0, 0)])                 # (in_pad, out)
    ab = at.reshape(nb, _INT8_BLOCK, out_n)
    absmax = jnp.max(jnp.abs(ab), axis=1)                 # (nb, out)
    scale = jnp.where(absmax > 0, absmax / 127.0, 1.0).astype(jnp.float32)
    q = jnp.clip(
        jnp.round(ab / scale[:, None, :]), -127, 127
    ).astype(jnp.int8).reshape(nb * _INT8_BLOCK, out_n)
    return q, scale


def _compress_pivot_int8(cinv):
    q_re, s_re = _quantize_t_int8(jnp.real(cinv).astype(jnp.float32))
    q_im, s_im = _quantize_t_int8(jnp.imag(cinv).astype(jnp.float32))
    return q_re, q_im, s_re, s_im


# NOTE on banded 3D pivots: flat- and block-banded truncation of the
# (mn, mn) plane inverses was measured and REJECTED — the in-plane discrete
# Green's function has no in-plane absorption to give it decay, so even
# keeping 50% of the columns costs 4-5x the GMRES iterations (experiment
# recorded in RESULTS.md).  The structural fix is the y-blocked slab layout
# (``ddm/subdomain3d.py``): pivot blocks (l1 n)^2 instead of (m n)^2 —
# exact solves at l1/m the memory.


def _plane_stencil_matvec(sten: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Apply a (m, n, 3, 3) in-plane stencil to (m, n, ...) data."""
    m, n = sten.shape[0], sten.shape[1]
    pad = [(1, 1), (1, 1)] + [(0, 0)] * (v.ndim - 2)
    vp = jnp.pad(v, pad)
    out = jnp.zeros_like(v)
    for dj in range(3):
        for di in range(3):
            w = sten[:, :, dj, di].reshape((m, n) + (1,) * (v.ndim - 2))
            out = out + w * vp[dj : dj + m, di : di + n]
    return out


def _plane_stencil_to_dense(sten: jnp.ndarray) -> jnp.ndarray:
    """Dense (mn, mn) matrix of a 9-point in-plane stencil."""
    m, n = sten.shape[0], sten.shape[1]
    eye = jnp.eye(m * n, dtype=sten.dtype).reshape(m * n, m, n)
    cols = jax.vmap(lambda e: _plane_stencil_matvec(sten, e))(eye)
    # cols[c] = S e_c  -> dense[r, c] = cols[c].flat[r]
    return cols.reshape(m * n, m * n).T


def factor_stencil_3d(s: StencilMatrix3D, pivot_dtype: str = "full",
                      pivot_band: int | None = None):
    """Leading-axis plane block-Thomas factorization of a 3D stencil matrix
    (blocks = planes orthogonal to ``values`` axis 0 — transpose the stencil
    field first to block over a different axis).

    ``pivot_dtype`` selects the pivot-inverse storage: ``full`` (complex) or
    ``bf16``.  The compression is FUSED into the factorization scan — the
    recursion carries one full (mn, mn) plane but only the compressed stack
    is materialized, so peak memory is O(mn^2 + l * compressed) instead of
    O(l * mn^2).
    """
    del pivot_band  # banded 3D pivots rejected by measurement; see above
    vals = s.values                       # (l, m, n, 3, 3, 3)
    l, m, n = vals.shape[:3]
    mn = m * n
    dsten = vals[:, :, :, 1]              # (l, m, n, 3, 3)
    lsten = vals[:, :, :, 0]
    usten = vals[:, :, :, 2]

    usten_shift = jnp.concatenate([jnp.zeros_like(usten[:1]), usten[:-1]], axis=0)

    if pivot_dtype == "bf16":
        compress = _compress_pivot_bf16
    elif pivot_dtype == "int8":
        compress = _compress_pivot_int8
    else:
        compress = lambda cinv: cinv

    def step(cinv_prev, inp):
        dsten_k, lsten_k, usten_prev = inp
        # L_k C^{-1}: apply the L stencil to each column of C^{-1}
        lcinv = jax.vmap(
            lambda col: _plane_stencil_matvec(lsten_k, col.reshape(m, n)).ravel(),
            in_axes=1,
            out_axes=1,
        )(cinv_prev)
        # (L C^{-1}) U: apply U^T stencil to the rows — compute via dense U
        u_dense = _plane_stencil_to_dense(usten_prev)
        c = _plane_stencil_to_dense(dsten_k) - lcinv @ u_dense
        cinv = jnp.linalg.inv(c)
        return cinv, compress(cinv)

    cinv0 = jnp.zeros((mn, mn), dtype=vals.dtype)
    _, out = jax.lax.scan(step, cinv0, (dsten, lsten, usten_shift))
    if pivot_dtype == "bf16":
        return BlockTridiagFactorization3DBF16(
            cinv_re=out[0], cinv_im=out[1], lsten=lsten, usten=usten
        )
    if pivot_dtype == "int8":
        return BlockTridiagFactorization3DInt8(
            q_re=out[0], q_im=out[1], s_re=out[2], s_im=out[3],
            lsten=lsten, usten=usten,
        )
    return BlockTridiagFactorization3D(cinv=out, lsten=lsten, usten=usten)


def _pivot_apply_3d(fac, k, y):
    """Apply plane pivot inverse ``C_k^{-1}`` to ``y`` (mn[, r]) for any of
    the three XLA 3D storage formats (reuses the 2D dispatch, which keys on
    the storage field names) or the Pallas plane stack (streamed via
    scalar-prefetch indexing — no gather copy of the plane)."""
    if hasattr(fac, "stack"):
        from fast_solver_lippmann_schwinger_tpu.sparse.pallas_plane import (
            plane_apply,
        )

        return plane_apply(fac, k, y)
    return _pivot_apply(jax.tree_util.tree_map(lambda a: a[k], fac), y)


def _as_plane_stack_3d(fac, b):
    """Reshape ``b`` — flat (l*m*n,), (l, mn), (l*m*n, r), or (l, mn, r) —
    to an (l, mn, ...) plane stack."""
    l = fac.lsten.shape[0]
    mn = fac.lsten.shape[1] * fac.lsten.shape[2]
    if b.ndim == 1:
        return b.reshape(l, mn)
    if b.ndim == 2 and b.shape[0] == l * mn:
        return b.reshape(l, mn, b.shape[1])
    return b.reshape((l, mn) + b.shape[2:])


def _fwd_scan_3d(fac, bg, start: int = 0, t_start=None, collect_t: bool = False):
    """3D forward substitution over z-planes ``start..l-1`` (see
    :func:`_fwd_scan`); ``bg`` (l, mn[, r]).

    Pallas plane views run the whole slab in ONE fused kernel (carry in
    VMEM, in-kernel stencil taps) instead of one ``pallas_call`` per plane
    — the per-step dispatch overhead was ~2.7x the pivot byte bound at the
    96^3 headline (RESULTS.md round 5)."""
    if hasattr(fac, "stack"):
        from fast_solver_lippmann_schwinger_tpu.sparse.pallas_plane import (
            bwd_scan_fused,  # noqa: F401  (paired import for readability)
            fused_vmem_ok,
            fwd_scan_fused,
        )

        if fused_vmem_ok(fac.stack):
            y, t = fwd_scan_fused(fac, bg, start=start, t_start=t_start,
                                  collect_t=collect_t)
            return (y, t) if collect_t else (y, None)
    l = fac.lsten.shape[0]
    m, n = fac.lsten.shape[1], fac.lsten.shape[2]
    dtype = fac.lsten.dtype
    planes = jnp.arange(start, l)

    def fwd(t_prev, inp):
        b_k, lsten_k, k = inp
        tp = t_prev.reshape((m, n) + t_prev.shape[1:])
        y_k = b_k - _plane_stencil_matvec(lsten_k, tp).reshape(t_prev.shape)
        t_k = _pivot_apply_3d(fac, k, y_k)
        out = (y_k, t_k) if collect_t else y_k
        return t_k, out

    t0 = (jnp.zeros(bg.shape[1:], dtype=dtype) if t_start is None else t_start)
    _, out = jax.lax.scan(
        fwd, t0,
        (bg[start:].astype(dtype), fac.lsten[start:], planes),
        unroll=min(_SOLVE_UNROLL, l - start),
    )
    return out if collect_t else (out, None)


def _bwd_scan_3d(fac, y, tail: int = 0):
    """3D backward substitution; ``tail > 0`` materializes only the last
    planes (see :func:`_bwd_scan`)."""
    if hasattr(fac, "stack"):
        from fast_solver_lippmann_schwinger_tpu.sparse.pallas_plane import (
            bwd_scan_fused,
            fused_vmem_ok,
        )

        if fused_vmem_ok(fac.stack):
            return bwd_scan_fused(fac, y, tail=tail)
    l = fac.lsten.shape[0]
    m, n = fac.lsten.shape[1], fac.lsten.shape[2]
    dtype = fac.lsten.dtype
    full = tail <= 0 or tail >= l
    start = 0 if full else l - tail
    planes = jnp.arange(start, l)

    def bwd(x_next, inp):
        y_k, usten_k, k = inp
        xn = x_next.reshape((m, n) + x_next.shape[1:])
        x_k = _pivot_apply_3d(
            fac, k,
            y_k - _plane_stencil_matvec(usten_k, xn).reshape(x_next.shape),
        )
        return x_k, x_k

    x0 = jnp.zeros(y.shape[1:], dtype=dtype)
    _, x = jax.lax.scan(
        bwd, x0, (y[start:], fac.usten[start:], planes),
        reverse=True, unroll=min(_SOLVE_UNROLL, l - start),
    )
    if full:
        return x
    out = jnp.zeros((l,) + y.shape[1:], dtype=dtype)
    return out.at[start:].set(x)


def block_thomas_solve_3d(fac, b: jnp.ndarray) -> jnp.ndarray:
    """Solve via the 3D plane factorization; ``b`` may be flat, (l, mn),
    or multi-RHS with a trailing column axis."""
    bg = _as_plane_stack_3d(fac, b)
    y, _ = _fwd_scan_3d(fac, bg)
    return _bwd_scan_3d(fac, y).reshape(b.shape)


def block_thomas_solve_support_3d(fac, b: jnp.ndarray, start: int = 0,
                                  tail: int = 0) -> jnp.ndarray:
    """3D solve for a rhs KNOWN to be zero on planes ``< start``; ``tail``
    truncates the backward pass (see :func:`block_thomas_solve_support`)."""
    l = fac.lsten.shape[0]
    bg = _as_plane_stack_3d(fac, b)
    if start <= 0 or start >= l:
        y, _ = _fwd_scan_3d(fac, bg)
    else:
        y_new, _ = _fwd_scan_3d(fac, bg, start=start)
        y = jnp.concatenate(
            [jnp.zeros((start,) + y_new.shape[1:], y_new.dtype), y_new],
            axis=0,
        )
    return _bwd_scan_3d(fac, y, tail).reshape(b.shape)


def block_thomas_solve_cached_3d(fac, b: jnp.ndarray, tail: int = 0):
    """3D tail-truncated solve returning the forward-pass stacks
    (see :func:`block_thomas_solve_cached`)."""
    bg = _as_plane_stack_3d(fac, b)
    y, t = _fwd_scan_3d(fac, bg, collect_t=True)
    return _bwd_scan_3d(fac, y, tail).reshape(b.shape), y, t


def block_thomas_solve_resume_3d(fac, b: jnp.ndarray, y_cached: jnp.ndarray,
                                 t_cached: jnp.ndarray, resume: int
                                 ) -> jnp.ndarray:
    """3D solve resuming a cached forward pass (see
    :func:`block_thomas_solve_resume`)."""
    l = fac.lsten.shape[0]
    if resume <= 0 or resume >= l:
        return block_thomas_solve_3d(fac, b)
    bg = _as_plane_stack_3d(fac, b)
    k0 = l - resume
    y_new, _ = _fwd_scan_3d(fac, bg, start=k0, t_start=t_cached[k0 - 1])
    y = jnp.concatenate([y_cached[:k0].astype(y_new.dtype), y_new], axis=0)
    return _bwd_scan_3d(fac, y).reshape(b.shape)
