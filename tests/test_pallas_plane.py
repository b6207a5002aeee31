"""Pallas plane-pivot streaming for the 3D solves (interpret mode on CPU)
vs the XLA storage formats — same pivot precisions, so agreement is at f32
accumulation level."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fast_solver_lippmann_schwinger_tpu.sparse import pallas_plane as pp
from fast_solver_lippmann_schwinger_tpu.sparse.direct import (
    _pivot_apply_3d,
    block_thomas_solve_3d,
    factor_stencil_3d,
)
from fast_solver_lippmann_schwinger_tpu.sparse.stencil_matrix import StencilMatrix3D

L, M, N = 6, 5, 7


def _relerr(a, b):
    return float(jnp.max(jnp.abs(a - b)) / jnp.max(jnp.abs(b)))


@pytest.fixture(scope="module")
def fac3():
    rng = np.random.default_rng(9)
    vals = rng.standard_normal((L, M, N, 3, 3, 3)) + 1j * rng.standard_normal(
        (L, M, N, 3, 3, 3)
    )
    vals = vals.astype(np.complex64)
    vals[:, :, :, 1, 1, 1] += 30.0
    st = StencilMatrix3D(values=jnp.asarray(vals))
    return (
        factor_stencil_3d(st, pivot_dtype="bf16"),
        factor_stencil_3d(st, pivot_dtype="int8"),
    )


def test_plane_apply_matches_xla(fac3):
    fac_bf, fac_i8 = fac3
    mn = M * N
    rng = np.random.default_rng(2)
    y = jnp.asarray(
        (rng.standard_normal((mn, 2)) + 1j * rng.standard_normal((mn, 2)))
        .astype(np.complex64)
    )
    for fac in (fac_bf, fac_i8):
        stack = pp.build_plane_stack(fac, batched=False)
        view = pp.PlaneSlabView(
            stack=stack, lsten=fac.lsten, usten=fac.usten,
            base=jnp.zeros((), jnp.int32),
        )
        for k in (0, L - 1):
            ref = _pivot_apply_3d(fac, k, y)
            got = pp.plane_apply(view, k, y)
            assert _relerr(got, ref) < 5e-5
        # 1-d single-RHS path
        ref1 = _pivot_apply_3d(fac, 2, y[:, 0])
        got1 = pp.plane_apply(view, 2, y[:, 0])
        assert _relerr(got1, ref1) < 5e-5


def test_plane_solve_matches_xla(fac3):
    """Full 3D block-Thomas solve through the Pallas view == the XLA
    storage path (identical stored pivots, f32 accumulation both sides)."""
    fac_bf, fac_i8 = fac3
    mn = M * N
    rng = np.random.default_rng(5)
    b = jnp.asarray(
        (rng.standard_normal(L * mn) + 1j * rng.standard_normal(L * mn))
        .astype(np.complex64)
    )
    for fac in (fac_bf, fac_i8):
        stack = pp.build_plane_stack(fac, batched=False)
        view = pp.PlaneSlabView(
            stack=stack, lsten=fac.lsten, usten=fac.usten,
            base=jnp.zeros((), jnp.int32),
        )
        ref = block_thomas_solve_3d(fac, b)
        got = block_thomas_solve_3d(view, b)
        assert _relerr(got, ref) < 1e-4


def test_gs_sweep_3d_pallas_matches_xla():
    """build_slab_system_3d with a ``_pallas`` pivot mode sweeps identically
    to the matching XLA storage (yblock_int8 here: the 96^3 layout)."""
    from fast_solver_lippmann_schwinger_tpu.ddm.subdomain3d import (
        build_slab_system_3d,
        gs_sweep_3d,
    )
    from fast_solver_lippmann_schwinger_tpu.models import media
    from fast_solver_lippmann_schwinger_tpu.ops.fastconv import (
        build_fast_convolution_3d,
    )
    from fast_solver_lippmann_schwinger_tpu.sparse import stencils

    NN, K = 17, 8.0
    h = 1.0 / (NN - 1)
    x = np.linspace(0.0, 1.0, NN)
    Z, Y, X = np.meshgrid(x, x, x, indexing="ij")
    nu = media.gaussian_bump_3d(X, Y, Z)
    op = build_fast_convolution_3d(x, x, x, h, K, nu, dtype=jnp.complex64)
    a_st, ag_st = stencils.build_sparse_a_ag_3d(K, op, dtype=jnp.complex64)
    kw = dict(n_subs=2, npml=5)
    slabs_x = build_slab_system_3d(
        a_st, ag_st, nu, x, h, K, pivot_dtype="yblock_int8", **kw
    )
    slabs_p = build_slab_system_3d(
        a_st, ag_st, nu, x, h, K, pivot_dtype="yblock_int8_pallas", **kw
    )
    assert slabs_p.pfac is not None
    assert slabs_p.pfac.p_re.dtype == jnp.int8

    rng = np.random.default_rng(1)
    b = jnp.asarray(
        (rng.standard_normal(NN ** 3) + 1j * rng.standard_normal(NN ** 3))
        .astype(np.complex64)
    )
    u_ref = gs_sweep_3d(slabs_x, b)
    u_pl = gs_sweep_3d(slabs_p, b)
    assert _relerr(u_pl, u_ref) < 1e-3

    # z-layout bf16 pallas vs bf16 (cached/resume sweep path)
    slabs_xz = build_slab_system_3d(
        a_st, ag_st, nu, x, h, K, pivot_dtype="bf16", **kw
    )
    slabs_pz = build_slab_system_3d(
        a_st, ag_st, nu, x, h, K, pivot_dtype="bf16_pallas", **kw
    )
    u_ref_z = gs_sweep_3d(slabs_xz, b)
    u_pl_z = gs_sweep_3d(slabs_pz, b)
    assert _relerr(u_pl_z, u_ref_z) < 1e-3


def test_sparsifying_3d_pallas():
    """SparsifyingPreconditioner3D(use_pallas) matches the full-precision
    apply at bf16 tolerance (its stored precision)."""
    from fast_solver_lippmann_schwinger_tpu.models import media
    from fast_solver_lippmann_schwinger_tpu.ops.fastconv import (
        build_fast_convolution_3d,
    )
    from fast_solver_lippmann_schwinger_tpu.precond.sparsifying import (
        SparsifyingPreconditioner3D,
    )
    from fast_solver_lippmann_schwinger_tpu.sparse import stencils

    NN, K = 13, 6.0
    h = 1.0 / (NN - 1)
    x = np.linspace(0.0, 1.0, NN)
    Z, Y, X = np.meshgrid(x, x, x, indexing="ij")
    nu = media.gaussian_bump_3d(X, Y, Z)
    op = build_fast_convolution_3d(x, x, x, h, K, nu, dtype=jnp.complex64)
    a_st, ag_st = stencils.build_sparse_a_ag_3d(K, op, dtype=jnp.complex64)
    msp = stencils.build_msp_3d(a_st, ag_st, nu, K)
    pc_full = SparsifyingPreconditioner3D.build(msp, a_st)
    pc_pl = SparsifyingPreconditioner3D.build(msp, a_st, use_pallas=True)
    rng = np.random.default_rng(4)
    b = jnp.asarray(
        (rng.standard_normal(NN ** 3) + 1j * rng.standard_normal(NN ** 3))
        .astype(np.complex64)
    )
    got = pc_pl.apply(b)
    ref = pc_full.apply(b)
    assert _relerr(got, ref) < 2e-2   # bf16 pivots vs complex64


def test_fused_scan_variants_match_xla(fac3):
    """The fused whole-slab kernels (one ``pallas_call`` per substitution
    direction) must reproduce every per-plane-scan entry point the sweeps
    use: support (start/tail), cached + resume, and multi-RHS."""
    from fast_solver_lippmann_schwinger_tpu.sparse.direct import (
        block_thomas_solve_cached_3d,
        block_thomas_solve_resume_3d,
        block_thomas_solve_support_3d,
    )

    fac_bf, fac_i8 = fac3
    mn = M * N
    rng = np.random.default_rng(11)
    for fac, rr in ((fac_bf, 1), (fac_bf, 3), (fac_i8, 2)):
        stack = pp.build_plane_stack(fac, batched=False)
        assert pp.fused_vmem_ok(stack)
        view = pp.PlaneSlabView(
            stack=stack, lsten=fac.lsten, usten=fac.usten,
            base=jnp.zeros((), jnp.int32),
        )
        shape = (L * mn,) if rr == 1 else (L * mn, rr)
        b = jnp.asarray(
            (rng.standard_normal(shape) + 1j * rng.standard_normal(shape))
            .astype(np.complex64)
        )
        bz = jnp.asarray(np.where(
            (np.arange(L)[:, None] >= 2).repeat(mn, 1).reshape(L * mn, 1)
            if rr > 1 else
            (np.arange(L) >= 2).repeat(mn), np.asarray(b), 0.0))
        ref = block_thomas_solve_support_3d(fac, bz, start=2, tail=3)
        got = block_thomas_solve_support_3d(view, bz, start=2, tail=3)
        assert _relerr(got, ref) < 2e-4

        refx, refy, reft = block_thomas_solve_cached_3d(fac, b, 3)
        gotx, goty, gott = block_thomas_solve_cached_3d(view, b, 3)
        assert _relerr(gotx, refx) < 2e-4
        assert _relerr(goty, refy) < 2e-4
        assert _relerr(gott, reft) < 2e-4

        ref_r = block_thomas_solve_resume_3d(fac, b, refy, reft, 3)
        got_r = block_thomas_solve_resume_3d(view, b, goty, gott, 3)
        assert _relerr(got_r, ref_r) < 2e-4
