"""Fast operator vs dense quadrature oracle.

The dense oracle is ``buildConvMatrix`` (``src/FastConvolution.jl:497-513``):
for the trapezoidal rule, ``M u == u + omega^2 * Gdense @ (nu * u)`` must
hold to near machine precision; the Greengard-Vico apply must agree with the
trapezoidal one to quadrature accuracy.
"""

import jax.numpy as jnp
import numpy as np
import pytest

import fast_solver_lippmann_schwinger_tpu as fls
from fast_solver_lippmann_schwinger_tpu.core.grids import Grid2D
from fast_solver_lippmann_schwinger_tpu.models import media
from fast_solver_lippmann_schwinger_tpu.ops import greens
from fast_solver_lippmann_schwinger_tpu.ops.fastconv import (
    build_fast_convolution_2d,
    sample_g_columns,
)


@pytest.fixture(scope="module")
def small_problem():
    grid = Grid2D(a=1.0, h=1.0 / 40.0)
    k = 1.0 / grid.h
    X, Y = grid.mesh()
    nu = media.gaussian_bump_2d(X, Y)
    return grid, k, X, Y, nu


def test_trapezoidal_matches_dense_oracle(small_problem):
    grid, k, X, Y, nu = small_problem
    op = build_fast_convolution_2d(
        grid.x, grid.y, grid.h, k, lambda X, Y: media.gaussian_bump_2d(X, Y),
        quad_rule="trapezoidal", dtype=jnp.complex128,
    )
    d0 = greens.duan_rokhlin_d0(k * grid.h)
    G = greens.dense_conv_matrix_2d(k, X.ravel(), Y.ravel(), d0, grid.h)

    rng = np.random.default_rng(0)
    u = rng.standard_normal(grid.size) + 1j * rng.standard_normal(grid.size)
    expected = u + k ** 2 * (G @ (nu.ravel() * u))
    got = np.asarray(op.apply(jnp.asarray(u)))
    np.testing.assert_allclose(got, expected, rtol=1e-11, atol=1e-11)


def test_trapezoidal_padding_invariance(small_problem):
    """Padding the circulant beyond 2n-1 must not change the result."""
    grid, k, X, Y, nu = small_problem
    kwargs = dict(quad_rule="trapezoidal", dtype=jnp.complex128)
    op_exact = build_fast_convolution_2d(
        grid.x, grid.y, grid.h, k, nu, pad_to_friendly=False, **kwargs
    )
    op_padded = build_fast_convolution_2d(
        grid.x, grid.y, grid.h, k, nu, pad_to_friendly=True, **kwargs
    )
    rng = np.random.default_rng(1)
    u = jnp.asarray(rng.standard_normal(grid.size) + 1j * rng.standard_normal(grid.size))
    np.testing.assert_allclose(
        np.asarray(op_exact.apply(u)), np.asarray(op_padded.apply(u)),
        rtol=1e-11, atol=1e-11,
    )


def test_gv_close_to_trapezoidal(small_problem):
    """Both quadratures discretize the same operator: applies agree to
    quadrature (not machine) accuracy on a smooth field."""
    grid, k, X, Y, nu = small_problem
    op_t = build_fast_convolution_2d(
        grid.x, grid.y, grid.h, k, nu, quad_rule="trapezoidal",
        dtype=jnp.complex128,
    )
    op_gv = build_fast_convolution_2d(
        grid.x, grid.y, grid.h, k, nu, quad_rule="greengard_vico",
        dtype=jnp.complex128,
    )
    u = jnp.asarray(np.exp(1j * k * X.ravel()))
    a = np.asarray(op_t.apply(u))
    b = np.asarray(op_gv.apply(u))
    rel = np.linalg.norm(a - b) / np.linalg.norm(a)
    assert rel < 5e-2


def test_gv_compact_embedding_is_exact(small_problem):
    """The compact ~2n re-embedding of the GV quadrature must reproduce the
    reference 4n-grid spectral apply to roundoff (same discrete operator)."""
    grid, k, X, Y, nu = small_problem
    kwargs = dict(quad_rule="greengard_vico", dtype=jnp.complex128)
    op_exact = build_fast_convolution_2d(
        grid.x, grid.y, grid.h, k, nu, pad_to_friendly=False, **kwargs
    )
    op_compact = build_fast_convolution_2d(
        grid.x, grid.y, grid.h, k, nu, pad_to_friendly=True, **kwargs
    )
    assert op_compact.symbol.shape[0] < op_exact.symbol.shape[0]
    rng = np.random.default_rng(2)
    u = jnp.asarray(rng.standard_normal(grid.size) + 1j * rng.standard_normal(grid.size))
    a = np.asarray(op_exact.apply(u))
    b = np.asarray(op_compact.apply(u))
    np.testing.assert_allclose(b, a, rtol=1e-11, atol=1e-11)


def test_sample_g_columns_matches_dense(small_problem):
    grid, k, X, Y, nu = small_problem
    op = build_fast_convolution_2d(
        grid.x, grid.y, grid.h, k, nu, quad_rule="trapezoidal",
        dtype=jnp.complex128,
    )
    d0 = greens.duan_rokhlin_d0(k * grid.h)
    G = greens.dense_conv_matrix_2d(k, X.ravel(), Y.ravel(), d0, grid.h)
    idx = np.array([0, 17, grid.size // 2, grid.size - 1])
    rows = np.asarray(sample_g_columns(op, idx))
    np.testing.assert_allclose(rows, G[idx], rtol=1e-10, atol=1e-12)
