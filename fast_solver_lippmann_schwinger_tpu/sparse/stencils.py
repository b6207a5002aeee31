"""Sparsifying annihilator stencils (Ying 2014) for the LS preconditioner.

For each boundary class (interior / edges / corners in 2D: 9 classes; plus
faces in 3D: 27 classes) the reference samples rows of the dense quadrature
matrix ``G`` on a local stencil, takes the last left singular vector of the
far-field block as the annihilating row ``a`` (so that ``a G ~ 0`` away from
the stencil), and assembles sparse ``A`` and ``A G``
(``entriesSparseA``/``entriesSparseG``/``buildSparseA(G)``,
``src/SparsifyingMatrix2D.jl`` whole file; 3D analog in
``src/SparsifyingMatrix3D.jl``).

TPU-native re-design: classes are enumerated generically as products of
per-axis categories (lo/mid/hi), each class's stencil row is computed once
from Green's rows obtained either analytically (host, Duan-Rokhlin) or via
batched unit-impulse FFT convolutions on device (``sampleGConv`` semantics),
and the result is scattered into a dense stencil field
(``StencilMatrix2D/3D``) by per-class masks — no COO/CSC assembly.

The annihilator row's overall phase/scale is arbitrary (an SVD gauge); it is
consistent between ``A`` and ``A G`` rows, which is all the preconditioner
``Msp^{-1} (A b)`` depends on.
"""

from __future__ import annotations

import itertools
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from fast_solver_lippmann_schwinger_tpu.ops import greens
from fast_solver_lippmann_schwinger_tpu.utils.host import to_device_complex
from fast_solver_lippmann_schwinger_tpu.sparse.stencil_matrix import (
    StencilMatrix2D,
    StencilMatrix3D,
)

# per-axis categories: (name, allowed offsets, representative index fn,
# node indicator fn)
_LO, _MID, _HI = 0, 1, 2


def _axis_offsets(cat: int):
    return {(_LO): (0, 1), (_MID): (-1, 0, 1), (_HI): (-1, 0)}[cat]


def _axis_rep(cat: int, size: int) -> int:
    return {(_LO): 0, (_MID): (size - 1) // 2, (_HI): size - 1}[cat]


def _axis_mask(cat: int, size: int) -> np.ndarray:
    idx = np.arange(size)
    if cat == _LO:
        return idx == 0
    if cat == _HI:
        return idx == size - 1
    return (idx > 0) & (idx < size - 1)


def _class_defs(shape):
    """Enumerate boundary classes: per-class category tuple, stencil
    offsets, and flat grid indices of the representative stencil."""
    shape = tuple(shape)
    ndim = len(shape)
    strides = np.array(
        [int(np.prod(shape[d + 1 :])) for d in range(ndim)], dtype=np.int64
    )
    class_defs = []
    for cats in itertools.product((_LO, _MID, _HI), repeat=ndim):
        offsets = list(
            itertools.product(*[_axis_offsets(c) for c in cats])
        )  # ordered tuples, slowest axis first
        rep = np.array([_axis_rep(c, s) for c, s in zip(cats, shape)], dtype=np.int64)
        flat = np.array(
            [int(np.dot(rep + np.array(off), strides)) for off in offsets],
            dtype=np.int64,
        )
        class_defs.append((cats, offsets, flat))
    return class_defs


def _uniq_indices(class_defs):
    # ONE sampler call for every class: deduplicated union of all stencil
    # indices.  Per-class sampling would cost one dispatch per class (27 in
    # 3D) with 4 distinct impulse-count shapes — each a separate multi-minute
    # remote compile on the tunnel backend.
    all_flat = np.concatenate([flat for _, _, flat in class_defs])
    return np.unique(all_flat, return_inverse=True)


def _annihilator_from_gram(c_far: np.ndarray, g_near: np.ndarray):
    """(a_row, ag_row) from the far-field Gram matrix and the near block.

    The smallest-eigenvalue eigenvector of ``C = W W^H`` equals the last
    left singular vector of ``W`` (up to phase — an SVD gauge the
    preconditioner is invariant to, see module docstring)."""
    c = np.asarray(c_far, dtype=np.complex128)
    c = 0.5 * (c + np.conj(c.T))          # exact Hermitian for eigh
    _, vecs = np.linalg.eigh(c)
    a_row = np.conj(vecs[:, 0])
    ag_row = a_row @ np.asarray(g_near, dtype=np.complex128)
    return a_row, ag_row


def build_annihilator_classes(
    sampler: Callable[[np.ndarray], np.ndarray],
    shape: Sequence[int],
):
    """Compute per-class annihilator rows and local Green's blocks from a
    HOST sampler (analytic Duan-Rokhlin rows).

    ``sampler(flat_indices) -> (len(indices), N)`` returns rows of the dense
    quadrature matrix G.  ``shape`` is the grid shape, slowest axis first
    (e.g. ``(m, n)`` in 2D).

    Returns a list of dicts with keys ``cats``, ``offsets`` (tuples, per grid
    axis, slowest first), ``a_row`` (s,), ``ag_row`` (s,).
    """
    shape = tuple(shape)
    N = int(np.prod(shape))
    class_defs = _class_defs(shape)
    uniq, inverse = _uniq_indices(class_defs)
    g_uniq = np.asarray(sampler(uniq))  # (len(uniq), N) complex

    classes = []
    pos = 0
    for cats, offsets, flat in class_defs:
        s = len(flat)
        g_rows = g_uniq[inverse[pos : pos + s]]
        pos += s
        far = np.ones(N, dtype=bool)
        far[flat] = False
        w = g_rows[:, far]
        # last left singular vector = best annihilator of the far field
        u, _, _ = np.linalg.svd(w, full_matrices=False)
        a_row = np.conj(u[:, -1])
        ag_row = a_row @ g_rows[:, flat]
        classes.append(
            dict(cats=cats, offsets=offsets, a_row=a_row, ag_row=ag_row)
        )
    return classes


def _class_grams_device(rows, row_idx, col_idx, col_valid):
    """One jitted pass over classes: per class, the s_max x s_max far-field
    Gram ``C = G G^H - G_near G_near^H`` and the near block ``G_near``.

    ``rows`` (U, N) stays ON DEVICE — this is the whole point: the host
    never sees an N-wide array (SURVEY.md section 2.3 "LAPACK -> batched
    device SVD"; the old path fetched multi-GB row blocks through the
    tunnel and was the dominant 3D setup cost, 259-284 s at 96^3)."""

    def one_class(_, idx):
        ri, ci, valid = idx
        g = rows[ri]                      # (s_max, N)
        near = g[:, ci]                   # (s_max, s_max)
        c_full = jnp.einsum(
            "in,jn->ij", g, jnp.conj(g),
            precision=jax.lax.Precision.HIGHEST,
        )
        # padded column slots repeat column 0 — mask them so the near-field
        # subtraction counts each true stencil column exactly once
        near_m = jnp.where(valid[None, :], near, 0.0)
        c_near = jnp.einsum(
            "ik,jk->ij", near_m, jnp.conj(near_m),
            precision=jax.lax.Precision.HIGHEST,
        )
        return None, (c_full - c_near, near)

    _, (c_far, g_near) = jax.lax.scan(
        one_class, None, (row_idx, col_idx, col_valid)
    )
    return c_far, g_near


_class_grams_jit = jax.jit(_class_grams_device)


def build_annihilator_classes_conv(conv_op, shape: Sequence[int]):
    """Device-side annihilator construction through a fast operator.

    Replaces the host-SVD path for impulse-sampled Green's rows
    (``entriesSparseAConv``/``entriesSparseA3D`` semantics,
    ``src/SparsifyingMatrix2D.jl:104-201``,
    ``src/SparsifyingMatrix3D.jl:1136-1408``): rows are sampled on device
    (``sample_g_columns``), each class's s x s far-field Gram accumulates
    on device in one jitted program, and only the tiny Gram/near blocks
    (27 x 27 x 27 at most) cross to the host for a complex128 ``eigh``.
    """
    from fast_solver_lippmann_schwinger_tpu.ops.fastconv import sample_g_columns
    from fast_solver_lippmann_schwinger_tpu.utils.host import fetch

    shape = tuple(shape)
    class_defs = _class_defs(shape)
    uniq, inverse = _uniq_indices(class_defs)
    rows = sample_g_columns(conv_op, uniq)          # (U, N) device

    s_max = max(len(flat) for _, _, flat in class_defs)
    ncls = len(class_defs)
    row_idx = np.zeros((ncls, s_max), dtype=np.int32)
    col_idx = np.zeros((ncls, s_max), dtype=np.int32)
    col_valid = np.zeros((ncls, s_max), dtype=bool)
    pos = 0
    for c, (_, _, flat) in enumerate(class_defs):
        s = len(flat)
        row_idx[c, :s] = inverse[pos : pos + s]
        col_idx[c, :s] = flat
        col_valid[c, :s] = True
        pos += s
    # padding rows repeat entry 0; they only touch C/near entries at
    # indices >= s, which the per-class [:s, :s] slice below never reads
    # (padded COLUMNS would corrupt the near-field subtraction inside the
    # [:s, :s] block, hence the explicit col_valid mask)

    c_far, g_near = _class_grams_jit(
        rows, jnp.asarray(row_idx), jnp.asarray(col_idx),
        jnp.asarray(col_valid),
    )
    c_far_h = fetch(c_far)
    g_near_h = fetch(g_near)
    try:
        rows.delete()   # multi-GB at 3D scale; the slab factorizations
    except Exception:   # noqa: BLE001 — backend without delete support
        pass            # that follow need the whole chip

    classes = []
    for c, (cats, offsets, flat) in enumerate(class_defs):
        s = len(flat)
        a_row, ag_row = _annihilator_from_gram(
            c_far_h[c, :s, :s], g_near_h[c, :s, :s]
        )
        classes.append(
            dict(cats=cats, offsets=offsets, a_row=a_row, ag_row=ag_row)
        )
    return classes


def _assemble_fields(classes, shape, stencil_extent=3):
    """Scatter per-class rows into dense stencil fields (numpy, setup time)."""
    ndim = len(shape)
    a_field = np.zeros(tuple(shape) + (stencil_extent,) * ndim, dtype=np.complex128)
    ag_field = np.zeros_like(a_field)
    for cls in classes:
        mask = np.ones(shape, dtype=bool)
        for d, cat in enumerate(cls["cats"]):
            shp = [1] * ndim
            shp[d] = shape[d]
            mask = mask & _axis_mask(cat, shape[d]).reshape(shp)
        a_st = np.zeros((stencil_extent,) * ndim, dtype=np.complex128)
        ag_st = np.zeros_like(a_st)
        for off, av, agv in zip(cls["offsets"], cls["a_row"], cls["ag_row"]):
            pos = tuple(o + 1 for o in off)
            a_st[pos] = av
            ag_st[pos] = agv
        sel = (...,) + (None,) * ndim
        a_field = np.where(mask[sel], a_st, a_field)
        ag_field = np.where(mask[sel], ag_st, ag_field)
    return a_field, ag_field


# -----------------------------------------------------------------------------
# 2D builders
# -----------------------------------------------------------------------------

def _sampler_2d_trapezoidal(k, X, Y, d0, h):
    return lambda idx: greens.sample_g_rows_2d(k, X.ravel(), Y.ravel(), idx, d0, h)


def build_sparse_a_ag_2d(
    k: float,
    x: np.ndarray,
    y: np.ndarray,
    h: float,
    d0: complex | None = None,
    conv_op=None,
    dtype=jnp.complex64,
    cache_dir: str | None = None,
    return_host: bool = False,
):
    """Build the annihilator ``A`` and product ``A G`` as stencil fields.

    With ``return_host=True`` also returns the host numpy fields
    ``(A, AG, a_np, ag_np)`` — used by the DDM layer to avoid a device
    round-trip when building slab systems.

    With ``conv_op=None`` uses direct Duan-Rokhlin Hankel sampling
    (``entriesSparseA``/``entriesSparseG`` semantics,
    ``src/SparsifyingMatrix2D.jl:5-102,205-275``); otherwise samples G by
    unit impulses through the given fast operator (``entriesSparseAConv``,
    ``:104-201,278-348``).

    Returns (A, AG) as ``StencilMatrix2D``.
    """
    n, m = len(x), len(y)
    if conv_op is None and d0 is None:
        d0 = greens.duan_rokhlin_d0(k * h)
    cache_path = None
    if cache_dir is not None:
        from fast_solver_lippmann_schwinger_tpu.utils import checkpoint
        import os

        key = checkpoint.config_key(
            kind="a_ag_2d", k=k, h=h, n=n, m=m,
            sampling=(
                f"conv_{conv_op.quad_rule}_{conv_op.symbol.shape}"
                if conv_op is not None
                else "d0"
            ),
            d0=str(d0),
        )
        cache_path = os.path.join(cache_dir, f"stencils_{key}.npz")
        cached = checkpoint.load_arrays(cache_path)
        if cached is not None and len(cached) == 2:
            out = (
                StencilMatrix2D(values=to_device_complex(cached[0], dtype)),
                StencilMatrix2D(values=to_device_complex(cached[1], dtype)),
            )
            return out + (cached[0], cached[1]) if return_host else out

    X, Y = np.meshgrid(np.asarray(x), np.asarray(y), indexing="xy")
    if conv_op is None:
        sampler = _sampler_2d_trapezoidal(k, X, Y, d0, h)
        classes = build_annihilator_classes(sampler, (m, n))
    else:
        classes = build_annihilator_classes_conv(conv_op, (m, n))
    a_field, ag_field = _assemble_fields(classes, (m, n))
    if cache_path is not None:
        from fast_solver_lippmann_schwinger_tpu.utils import checkpoint

        checkpoint.save_arrays(cache_path, [a_field, ag_field])
    out = (
        StencilMatrix2D(values=to_device_complex(a_field, dtype)),
        StencilMatrix2D(values=to_device_complex(ag_field, dtype)),
    )
    return out + (a_field, ag_field) if return_host else out


def build_sparse_a_2d(k, x, y, h, d0=None, conv_op=None, dtype=jnp.complex64):
    """``A`` only (reference ``buildSparseA``,
    ``src/SparsifyingMatrix2D.jl:806-884``)."""
    return build_sparse_a_ag_2d(k, x, y, h, d0=d0, conv_op=conv_op, dtype=dtype)[0]


def build_msp_2d(a: StencilMatrix2D, ag: StencilMatrix2D, nu, k: float):
    """``Msp = A + k^2 (A G) diag(nu)`` (``examples/example.jl:67``)."""
    nu_arr = to_device_complex(np.asarray(nu), a.values.dtype)
    return jax.jit(lambda a_, ag_, d: a_ + (k ** 2) * ag_.scale_columns(d))(
        a, ag, nu_arr
    )


# -----------------------------------------------------------------------------
# 3D builders
# -----------------------------------------------------------------------------

def build_sparse_a_ag_3d(
    k: float,
    conv_op,
    dtype=jnp.complex64,
    cache_dir: str | None = None,
):
    """3D annihilator fields via impulse sampling through the 3D fast
    operator (reference ``entriesSparseA3D``/``buildSparseA3DConv``/
    ``buildSparseAG3DConv``, ``src/SparsifyingMatrix3D.jl:963-1659``).

    ``cache_dir`` persists the host stencil fields to disk (keyed on the
    configuration) so repeat setups skip the impulse sampling."""
    shape = (conv_op.l, conv_op.m, conv_op.n)
    cache_path = None
    if cache_dir is not None:
        import os

        from fast_solver_lippmann_schwinger_tpu.utils import checkpoint

        key = checkpoint.config_key(
            kind="a_ag_3d", k=k, shape=shape,
            sampling=f"conv_{conv_op.quad_rule}_{conv_op.symbol.shape}",
        )
        cache_path = os.path.join(cache_dir, f"stencils_{key}.npz")
        cached = checkpoint.load_arrays(cache_path)
        if cached is not None and len(cached) == 2:
            return (
                StencilMatrix3D(values=to_device_complex(cached[0], dtype)),
                StencilMatrix3D(values=to_device_complex(cached[1], dtype)),
            )
    classes = build_annihilator_classes_conv(conv_op, shape)
    a_field, ag_field = _assemble_fields(classes, shape)
    if cache_path is not None:
        from fast_solver_lippmann_schwinger_tpu.utils import checkpoint

        checkpoint.save_arrays(cache_path, [a_field, ag_field])
    return (
        StencilMatrix3D(values=to_device_complex(a_field, dtype)),
        StencilMatrix3D(values=to_device_complex(ag_field, dtype)),
    )


def build_msp_3d(a: StencilMatrix3D, ag: StencilMatrix3D, nu, k: float):
    nu_arr = to_device_complex(np.asarray(nu), a.values.dtype)
    return jax.jit(lambda a_, ag_, d: a_ + (k ** 2) * ag_.scale_columns(d))(
        a, ag, nu_arr
    )
