"""Sparsifying stencil construction, stencil matvec, and the block-Thomas
direct solver, cross-checked against dense oracles."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fast_solver_lippmann_schwinger_tpu.core.grids import Grid2D
from fast_solver_lippmann_schwinger_tpu.models import media
from fast_solver_lippmann_schwinger_tpu.ops import greens
from fast_solver_lippmann_schwinger_tpu.ops.fastconv import build_fast_convolution_2d
from fast_solver_lippmann_schwinger_tpu.sparse.direct import (
    block_thomas_solve,
    factor_stencil_2d,
)
from fast_solver_lippmann_schwinger_tpu.sparse.stencil_matrix import StencilMatrix2D
from fast_solver_lippmann_schwinger_tpu.sparse import stencils


@pytest.fixture(scope="module")
def problem():
    grid = Grid2D(a=1.0, h=1.0 / 24.0)
    k = 1.0 / grid.h
    X, Y = grid.mesh()
    nu = media.gaussian_bump_2d(X, Y)
    a_st, ag_st = stencils.build_sparse_a_ag_2d(
        k, grid.x, grid.y, grid.h, dtype=jnp.complex128
    )
    return grid, k, X, Y, nu, a_st, ag_st


def test_stencil_matvec_matches_dense(problem):
    grid, k, X, Y, nu, a_st, ag_st = problem
    dense = a_st.to_dense()
    rng = np.random.default_rng(0)
    u = rng.standard_normal(grid.size) + 1j * rng.standard_normal(grid.size)
    np.testing.assert_allclose(
        np.asarray(a_st.matvec(jnp.asarray(u))), dense @ u, rtol=1e-12, atol=1e-14
    )


def test_annihilator_quality(problem):
    """Rows of A applied to G vanish away from the stencil: || A G - AG ||
    restricted off-stencil must be small relative to ||G|| rows."""
    grid, k, X, Y, nu, a_st, ag_st = problem
    d0 = greens.duan_rokhlin_d0(k * grid.h)
    G = greens.dense_conv_matrix_2d(k, X.ravel(), Y.ravel(), d0, grid.h)
    A = a_st.to_dense()
    AG_true = A @ G
    AG_sparse = ag_st.to_dense()
    # off-pattern residual: AG_true minus its sparse approximation
    resid = AG_true - AG_sparse
    rel = np.linalg.norm(resid) / np.linalg.norm(AG_true)
    assert rel < 0.15  # annihilation quality of the 3x3 stencil (coarse grid)


def test_ag_matches_a_times_g_on_pattern(problem):
    """On the stencil pattern, AG entries must equal (A G) exactly."""
    grid, k, X, Y, nu, a_st, ag_st = problem
    d0 = greens.duan_rokhlin_d0(k * grid.h)
    G = greens.dense_conv_matrix_2d(k, X.ravel(), Y.ravel(), d0, grid.h)
    A = a_st.to_dense()
    AG_true = A @ G
    AG_sparse = ag_st.to_dense()
    pattern = np.abs(AG_sparse) > 0
    np.testing.assert_allclose(
        AG_sparse[pattern], AG_true[pattern], rtol=1e-8, atol=1e-12
    )


def test_scale_columns_matches_dense(problem):
    grid, k, X, Y, nu, a_st, ag_st = problem
    dense = ag_st.to_dense()
    scaled = ag_st.scale_columns(jnp.asarray(nu))
    np.testing.assert_allclose(
        scaled.to_dense(), dense @ np.diag(nu.ravel()), rtol=1e-12, atol=1e-14
    )


def test_transpose_matches_permuted_dense(problem):
    grid, k, X, Y, nu, a_st, ag_st = problem
    m, n = grid.m, grid.n
    N = m * n
    dense = a_st.to_dense()
    # permutation flat[j*n+i] -> flat[i*m+j]
    perm = np.arange(N).reshape(m, n).T.ravel()
    P = np.eye(N)[perm]
    np.testing.assert_allclose(
        a_st.transpose().to_dense(), P @ dense @ P.T, rtol=1e-12, atol=1e-14
    )


def test_block_thomas_matches_dense_solve(problem):
    grid, k, X, Y, nu, a_st, ag_st = problem
    msp = stencils.build_msp_2d(a_st, ag_st, nu, k)
    dense = msp.to_dense()
    rng = np.random.default_rng(1)
    b = rng.standard_normal(grid.size) + 1j * rng.standard_normal(grid.size)
    x_dense = np.linalg.solve(dense, b)
    fac = factor_stencil_2d(msp)
    x = np.asarray(block_thomas_solve(fac, jnp.asarray(b)))
    np.testing.assert_allclose(x, x_dense, rtol=1e-7, atol=1e-9)


def test_block_thomas_multi_rhs(problem):
    grid, k, X, Y, nu, a_st, ag_st = problem
    msp = stencils.build_msp_2d(a_st, ag_st, nu, k)
    fac = factor_stencil_2d(msp)
    rng = np.random.default_rng(2)
    B = rng.standard_normal((grid.size, 3)) + 1j * rng.standard_normal((grid.size, 3))
    X_multi = np.asarray(block_thomas_solve(fac, jnp.asarray(B)))
    for r in range(3):
        x_single = np.asarray(block_thomas_solve(fac, jnp.asarray(B[:, r])))
        np.testing.assert_allclose(X_multi[:, r], x_single, rtol=1e-9, atol=1e-11)
