"""Fused Pallas block-Thomas kernels (interpret mode on CPU) vs the XLA
bf16 substitution path — same storage precisions, so agreement is at f32
rounding level, not bf16 level."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fast_solver_lippmann_schwinger_tpu.sparse import pallas_thomas as pt
from fast_solver_lippmann_schwinger_tpu.sparse.direct import (
    block_thomas_solve,
    block_thomas_solve_cached,
    block_thomas_solve_resume,
    block_thomas_solve_support,
    block_thomas_solve_tail,
    compress_factorization,
    factor_stencil_2d,
)
from fast_solver_lippmann_schwinger_tpu.sparse.stencil_matrix import StencilMatrix2D

M, N = 12, 40
TOL = 5e-5


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(3)
    vals = rng.standard_normal((2, M, N, 3, 3)) + 1j * rng.standard_normal(
        (2, M, N, 3, 3)
    )
    vals = vals.astype(np.complex64)
    vals[:, :, :, 1, 1] += 12.0
    facs = jax.vmap(lambda v: factor_stencil_2d(StencilMatrix2D(values=v)))(
        jnp.asarray(vals)
    )
    fac_bf = jax.vmap(compress_factorization)(facs)
    pfac = pt.build_pallas_factorization(facs)
    b = (rng.standard_normal((M, N)) + 1j * rng.standard_normal((M, N))).astype(
        np.complex64
    )
    return fac_bf, pfac, jnp.asarray(b)


def _fac_at(fac, i):
    return jax.tree_util.tree_map(lambda a: a[i], fac)


def _relerr(a, b):
    return float(jnp.max(jnp.abs(a - b)) / jnp.max(jnp.abs(b)))


def test_solve_and_slab_select(setup):
    fac_bf, pfac, b = setup
    for s in (0, 1):
        ref = block_thomas_solve(_fac_at(fac_bf, s), b)
        got = pt.solve(pfac, s, b)
        assert _relerr(got, ref) < TOL


def test_int8_storage_solve(setup):
    """int8 per-lane-scaled pivots solve to bf16-comparable accuracy and
    halve the pivot bytes."""
    fac_bf, pfac, b = setup
    pfac8 = pt.build_pallas_factorization(fac_bf, storage="int8")
    assert pfac8.cinv_t_re.dtype == jnp.int8
    assert pfac8.cinv_t_re.nbytes == pfac.cinv_t_re.nbytes // 2
    # int8 absolute error is ~0.6% of each output row's max (vs bf16's
    # ~0.04% per entry): fine for a PRECONDITIONER (quality gated by the
    # sweep-convergence test below), loose for a raw solve
    for s in (0, 1):
        ref = block_thomas_solve(_fac_at(fac_bf, s), b)
        got = pt.solve(pfac8, s, b)
        assert _relerr(got, ref) < 2e-2
    # batched multi-RHS path
    b2 = jnp.stack([b, 1j * b])                        # (S=2, M, N)
    ref2 = jnp.stack([
        block_thomas_solve(_fac_at(fac_bf, s), b2[s]) for s in (0, 1)
    ])
    got2 = pt.solve_all(pfac8, jnp.arange(2), b2)
    assert _relerr(got2, ref2) < 2e-2


def test_int8_sweep_preconditions():
    """pivot_dtype="pallas_int8" slab systems precondition GMRES with the
    same budget as bf16 (the quality gate for the int8 storage)."""
    from fast_solver_lippmann_schwinger_tpu.core.grids import Grid2D
    from fast_solver_lippmann_schwinger_tpu.ddm.subdomain import (
        build_slab_system,
    )
    from fast_solver_lippmann_schwinger_tpu.ddm.sweeps import gs_sweep
    from fast_solver_lippmann_schwinger_tpu.models import media
    from fast_solver_lippmann_schwinger_tpu.solver.gmres import gmres
    from fast_solver_lippmann_schwinger_tpu.sparse import stencils

    grid = Grid2D(a=1.0, h=1.0 / 36.0)
    k = 1.0 / grid.h
    X, Y = grid.mesh()
    nu = media.gaussian_bump_2d(X, Y)
    a_st, ag_st = stencils.build_sparse_a_ag_2d(
        k, grid.x, grid.y, grid.h, dtype=jnp.complex64
    )
    msp = stencils.build_msp_2d(a_st, ag_st, nu, k)
    slabs = build_slab_system(
        a_st, ag_st, nu, grid.x, grid.y, grid.h, k, 3, npml=6,
        pivot_dtype="pallas_int8",
    )
    assert slabs.pfac.cinv_t_re.dtype == jnp.int8
    rng = np.random.default_rng(1)
    b = jnp.asarray(
        (rng.standard_normal(grid.size) + 1j * rng.standard_normal(grid.size))
        .astype(np.complex64)
    )
    x, info = gmres(msp.matvec, b, preconditioner=lambda v: gs_sweep(slabs, v),
                    rtol=1e-5, restart=20, maxiter=120)
    assert bool(info.converged)
    res = np.linalg.norm(np.asarray(msp.matvec(x) - b)) / np.linalg.norm(
        np.asarray(b)
    )
    assert res < 1e-3


def test_tail(setup):
    fac_bf, pfac, b = setup
    ref = block_thomas_solve_tail(_fac_at(fac_bf, 0), b, 4)
    got = pt.solve(pfac, 0, b, tail=4)
    assert _relerr(got, ref) < TOL


def test_cached_and_resume(setup):
    fac_bf, pfac, b = setup
    x_ref, y_ref, t_ref = block_thomas_solve_cached(_fac_at(fac_bf, 0), b, 4)
    x_pl, y_pl, t_pl = pt.solve_cached(pfac, 0, b, tail=4)
    assert _relerr(x_pl, x_ref) < TOL
    b2 = b.at[M - 3 :].add(1.0 + 0.5j)
    r_ref = block_thomas_solve_resume(_fac_at(fac_bf, 0), b2, y_ref, t_ref, 4)
    r_pl = pt.solve_resume(pfac, 0, b2, y_pl, t_pl, 4)
    assert _relerr(r_pl, r_ref) < TOL


def test_support(setup):
    fac_bf, pfac, b = setup
    bs = jnp.zeros_like(b).at[5:].set(b[5:])
    ref = block_thomas_solve_support(_fac_at(fac_bf, 0), bs, start=5, tail=4)
    got = pt.solve_support(pfac, 0, bs, start=5, tail=4)
    assert _relerr(got, ref) < TOL


def test_solve_all_multirhs(setup):
    """Batched multi-RHS solve_all vs the vmapped XLA bf16 path."""
    fac_bf, pfac, b = setup
    rng = np.random.default_rng(7)
    bb = (
        rng.standard_normal((2, M, N, 3)) + 1j * rng.standard_normal((2, M, N, 3))
    ).astype(np.complex64)
    bb = jnp.asarray(bb)
    got = pt.solve_all(pfac, jnp.arange(2), bb)
    ref = jax.vmap(block_thomas_solve)(fac_bf, bb)
    assert _relerr(got, ref) < TOL
    # head-start + tail truncation, and slab permutation
    bs = bb[..., 0].at[:, :5].set(0.0)
    perm = jnp.asarray([1, 0])
    got2 = pt.solve_all(pfac, perm, bs[perm], start=5, tail=4)
    ref2 = jax.vmap(
        lambda f, r: block_thomas_solve_support(f, r, start=5, tail=4)
    )(fac_bf, bs)[perm]
    assert _relerr(got2, ref2) < TOL


def test_polarized_pallas_dispatch():
    """Polarized-traces block operators with pivot_dtype='pallas' match the
    XLA bf16 pivot storage."""
    from fast_solver_lippmann_schwinger_tpu.core.grids import Grid2D
    from fast_solver_lippmann_schwinger_tpu.ddm import polarized
    from fast_solver_lippmann_schwinger_tpu.ddm.subdomain import build_slab_system
    from fast_solver_lippmann_schwinger_tpu.models import media
    from fast_solver_lippmann_schwinger_tpu.sparse import stencils

    h = 1.0 / 40.0
    grid = Grid2D(a=1.0, h=h)
    k = 1.0 / h
    X, Y = grid.mesh()
    a_st, ag_st, a_np, ag_np = stencils.build_sparse_a_ag_2d(
        k, grid.x, grid.y, h, dtype=jnp.complex64, return_host=True
    )
    nu = media.gaussian_bump_2d(X, Y)
    kw = dict(a_host=a_np, ag_host=ag_np, npml=5)
    slabs_bf = build_slab_system(
        a_st, ag_st, nu, grid.x, grid.y, h, k, 3, pivot_dtype="bf16", **kw
    )
    slabs_pl = build_slab_system(
        a_st, ag_st, nu, grid.x, grid.y, h, k, 3, pivot_dtype="pallas", **kw
    )
    rng = np.random.default_rng(11)
    size = 4 * (slabs_bf.n_subs - 1) * slabs_bf.n
    u = jnp.asarray(
        rng.standard_normal(size) + 1j * rng.standard_normal(size)
    ).astype(jnp.complex64)
    assert _relerr(
        polarized.apply_mm(slabs_pl, u), polarized.apply_mm(slabs_bf, u)
    ) < 1e-4
    half = u[: size // 2]
    assert _relerr(
        polarized.apply_dinv_down(slabs_pl, half),
        polarized.apply_dinv_down(slabs_bf, half),
    ) < 1e-4
    assert _relerr(
        polarized.apply_dinv_up(slabs_pl, half),
        polarized.apply_dinv_up(slabs_bf, half),
    ) < 1e-4
    b = jnp.asarray(
        rng.standard_normal(slabs_bf.m * slabs_bf.n)
        + 1j * rng.standard_normal(slabs_bf.m * slabs_bf.n)
    ).astype(jnp.complex64)
    v0, v1, vn, vnp = polarized._devectorize(slabs_bf, half)
    assert _relerr(
        polarized.reconstruction(slabs_pl, b, v0, v1, vn, vnp),
        polarized.reconstruction(slabs_bf, b, v0, v1, vn, vnp),
    ) < 1e-4


def test_gs_sweep_pallas_dispatch():
    """gs_sweep with the Pallas layout attached matches the XLA bf16 sweep."""
    from fast_solver_lippmann_schwinger_tpu.core.grids import Grid2D
    from fast_solver_lippmann_schwinger_tpu.ddm.subdomain import (
        attach_pallas,
        build_slab_system,
    )
    from fast_solver_lippmann_schwinger_tpu.ddm.sweeps import gs_sweep
    from fast_solver_lippmann_schwinger_tpu.models import media
    from fast_solver_lippmann_schwinger_tpu.sparse import stencils

    h = 1.0 / 40.0
    grid = Grid2D(a=1.0, h=h)
    k = 1.0 / h
    X, Y = grid.mesh()
    nu = media.gaussian_bump_2d(X, Y)
    a_st, ag_st, a_np, ag_np = stencils.build_sparse_a_ag_2d(
        k, grid.x, grid.y, h, dtype=jnp.complex64, return_host=True
    )
    slabs = build_slab_system(
        a_st, ag_st, nu, grid.x, grid.y, h, k, 3, npml=5,
        a_host=a_np, ag_host=ag_np, pivot_dtype="bf16",
    )
    slabs_pl = attach_pallas(slabs)
    rng = np.random.default_rng(5)
    b = (
        rng.standard_normal(grid.shape[0] * grid.shape[1])
        + 1j * rng.standard_normal(grid.shape[0] * grid.shape[1])
    ).astype(np.complex64)
    b = jnp.asarray(b)
    u_ref = gs_sweep(slabs, b)
    u_pl = gs_sweep(slabs_pl, b)
    assert _relerr(u_pl, u_ref) < 1e-3


# ---------------------------------------------------------------------------
# Fused banded+tail hybrid kernels
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def setup_ht(setup):
    """Hybrid layouts built from the same factorizations as ``setup``:
    a full-width one (agrees with dense bf16 up to rounding) and a banded
    one paired with its XLA ``banded_tail`` oracle."""
    from fast_solver_lippmann_schwinger_tpu.sparse.direct import (
        compress_factorization_banded_tail,
    )

    rng = np.random.default_rng(3)
    vals = rng.standard_normal((2, M, N, 3, 3)) + 1j * rng.standard_normal(
        (2, M, N, 3, 3)
    )
    vals = vals.astype(np.complex64)
    vals[:, :, :, 1, 1] += 12.0
    facs = jax.vmap(lambda v: factor_stencil_2d(StencilMatrix2D(values=v)))(
        jnp.asarray(vals)
    )
    tail_lines = 4
    pfac_full = pt.build_pallas_banded_tail(
        facs, width=2 * N - 1, tail_lines=tail_lines
    )
    width = 15
    pfac_band = pt.build_pallas_banded_tail(
        facs, width=width, tail_lines=tail_lines
    )
    fac_ht = jax.vmap(
        lambda f: compress_factorization_banded_tail(f, width, tail_lines)
    )(facs)
    return pfac_full, pfac_band, fac_ht


def test_ht_layout_geometry(setup_ht):
    pfac_full, pfac_band, fac_ht = setup_ht
    assert pfac_band.tail_start == M - 4
    assert pfac_band.head_re.dtype == jnp.bfloat16
    # pack shape: (S, ts, nb, 128 + 2*halo, 128)
    nb = pfac_band.np_ // 128
    W = 128 + 2 * pfac_band.halo
    assert pfac_band.head_re.shape == (2, M - 4, nb, W, 128)


def test_ht_byte_savings_at_scale():
    """At production-like line lengths the windowed head pack streams well
    under the dense-plane bytes (at toy N the fixed 128-lane window floor
    dominates and there is no saving — this is the shape claim the 801
    headline relies on)."""
    n, w = 801, 201
    npad = 896
    half = w // 2
    halo = -(-half // 8) * 8
    W = 128 + 2 * halo
    head_bytes = (npad // 128) * W * 128
    dense_bytes = npad * npad
    assert W < npad
    assert head_bytes / dense_bytes < 0.45


def test_ht_full_width_matches_bf16(setup, setup_ht):
    """Full-width hybrid == dense bf16 solve (same storage precision)."""
    fac_bf, pfac, b = setup
    pfac_full, _, _ = setup_ht
    for s in (0, 1):
        ref = pt.solve(pfac, s, b)
        got = pt.solve(pfac_full, s, b)
        assert _relerr(got, ref) < 5e-4


def test_ht_banded_matches_xla_banded_tail(setup, setup_ht):
    """Narrow-band hybrid kernel == the XLA ``banded_tail`` substitution
    path at the same (width, tail): identical bf16-stored operators."""
    _, _, b = setup
    _, pfac_band, fac_ht = setup_ht
    for s in (0, 1):
        ref = block_thomas_solve(_fac_at(fac_ht, s), b)
        got = pt.solve(pfac_band, s, b)
        assert _relerr(got, ref) < 5e-4


def test_ht_tail_cached_resume(setup, setup_ht):
    _, _, b = setup
    _, pfac_band, fac_ht = setup_ht
    ref = block_thomas_solve_tail(_fac_at(fac_ht, 0), b, 3)
    got = pt.solve(pfac_band, 0, b, tail=3)
    assert _relerr(got, ref) < 5e-4

    x_ref, y_ref, t_ref = block_thomas_solve_cached(_fac_at(fac_ht, 0), b, 3)
    x_pl, y_pl, t_pl = pt.solve_cached(pfac_band, 0, b, tail=3)
    assert _relerr(x_pl, x_ref) < 5e-4
    b2 = b.at[M - 3 :].add(1.0 + 0.5j)
    r_ref = block_thomas_solve_resume(_fac_at(fac_ht, 0), b2, y_ref, t_ref, 4)
    r_pl = pt.solve_resume(pfac_band, 0, b2, y_pl, t_pl, 4)
    assert _relerr(r_pl, r_ref) < 5e-4


def test_ht_support_and_solve_all(setup, setup_ht):
    _, _, b = setup
    _, pfac_band, fac_ht = setup_ht
    bs = jnp.zeros_like(b).at[5:].set(b[5:])
    ref = block_thomas_solve_support(_fac_at(fac_ht, 0), bs, start=5, tail=4)
    got = pt.solve_support(pfac_band, 0, bs, start=5, tail=4)
    assert _relerr(got, ref) < 5e-4

    rng = np.random.default_rng(7)
    bb = (
        rng.standard_normal((2, M, N, 3)) + 1j * rng.standard_normal((2, M, N, 3))
    ).astype(np.complex64)
    bb = jnp.asarray(bb)
    got2 = pt.solve_all(pfac_band, jnp.arange(2), bb)
    ref2 = jax.vmap(block_thomas_solve)(fac_ht, bb)
    assert _relerr(got2, ref2) < 5e-4
    # slab permutation through the scalar-prefetch indirection
    perm = jnp.asarray([1, 0])
    got3 = pt.solve_all(pfac_band, perm, bb[perm, ..., 0])
    ref3 = jax.vmap(block_thomas_solve)(fac_ht, bb[..., 0])[perm]
    assert _relerr(got3, ref3) < 5e-4


def test_gs_sweep_pallas_banded_tail_dispatch():
    """pivot_dtype='pallas_banded_tail' slab systems sweep-match the XLA
    banded_tail storage at the same width, and hold GMRES quality."""
    from fast_solver_lippmann_schwinger_tpu.core.grids import Grid2D
    from fast_solver_lippmann_schwinger_tpu.ddm.subdomain import (
        build_slab_system,
    )
    from fast_solver_lippmann_schwinger_tpu.ddm.sweeps import gs_sweep
    from fast_solver_lippmann_schwinger_tpu.models import media
    from fast_solver_lippmann_schwinger_tpu.solver.gmres import gmres
    from fast_solver_lippmann_schwinger_tpu.sparse import stencils

    h = 1.0 / 40.0
    grid = Grid2D(a=1.0, h=h)
    k = 1.0 / h
    X, Y = grid.mesh()
    nu = media.gaussian_bump_2d(X, Y)
    a_st, ag_st, a_np, ag_np = stencils.build_sparse_a_ag_2d(
        k, grid.x, grid.y, h, dtype=jnp.complex64, return_host=True
    )
    msp = stencils.build_msp_2d(a_st, ag_st, nu, k)
    kw = dict(a_host=a_np, ag_host=ag_np, npml=5)
    slabs_x = build_slab_system(
        a_st, ag_st, nu, grid.x, grid.y, h, k, 3,
        pivot_dtype="banded_tail", pivot_band=21, **kw
    )
    slabs_p = build_slab_system(
        a_st, ag_st, nu, grid.x, grid.y, h, k, 3,
        pivot_dtype="pallas_banded_tail", pivot_band=21, **kw
    )
    assert hasattr(slabs_p.pfac, "head_re")
    rng = np.random.default_rng(5)
    b = jnp.asarray(
        (rng.standard_normal(grid.size) + 1j * rng.standard_normal(grid.size))
        .astype(np.complex64)
    )
    u_ref = gs_sweep(slabs_x, b)
    u_pl = gs_sweep(slabs_p, b)
    assert _relerr(u_pl, u_ref) < 1e-3

    x, info = gmres(
        msp.matvec, b, preconditioner=lambda v: gs_sweep(slabs_p, v),
        rtol=1e-5, restart=20, maxiter=120,
    )
    assert bool(info.converged)
