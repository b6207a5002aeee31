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
