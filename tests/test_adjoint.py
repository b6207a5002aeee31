"""Differentiable solves: matrix transpose, transposed operator apply,
custom_linear_solve round trip, and gradient checks vs finite differences."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fast_solver_lippmann_schwinger_tpu.core.grids import Grid2D
from fast_solver_lippmann_schwinger_tpu.models import media
from fast_solver_lippmann_schwinger_tpu.ops import greens
from fast_solver_lippmann_schwinger_tpu.ops.fastconv import build_fast_convolution_2d
from fast_solver_lippmann_schwinger_tpu.precond.sparsifying import (
    SparsifyingPreconditioner,
    SparsifyingPreconditionerT,
)
from fast_solver_lippmann_schwinger_tpu.solver.adjoint import (
    apply_transpose,
    differentiable_solve,
)
from fast_solver_lippmann_schwinger_tpu.solver.gmres import gmres
from fast_solver_lippmann_schwinger_tpu.sparse import stencils


@pytest.fixture(scope="module")
def small_problem():
    grid = Grid2D(a=1.0, h=1.0 / 16.0)
    k = 8.0
    X, Y = grid.mesh()
    nu = media.gaussian_bump_2d(X, Y)
    op = build_fast_convolution_2d(
        grid.x, grid.y, grid.h, k, nu, quad_rule="trapezoidal",
        dtype=jnp.complex128, pad_to_friendly=False,
    )
    return grid, k, X, Y, nu, op


def test_matrix_transpose_matches_dense(small_problem):
    grid, k, X, Y, nu, op = small_problem
    a_st, ag_st = stencils.build_sparse_a_ag_2d(
        k, grid.x, grid.y, grid.h, dtype=jnp.complex128
    )
    msp = stencils.build_msp_2d(a_st, ag_st, nu, k)
    np.testing.assert_allclose(
        msp.matrix_transpose().to_dense(), msp.to_dense().T,
        rtol=1e-13, atol=1e-15,
    )


def test_apply_transpose_matches_dense(small_problem):
    grid, k, X, Y, nu, op = small_problem
    d0 = greens.duan_rokhlin_d0(k * grid.h)
    G = greens.dense_conv_matrix_2d(k, X.ravel(), Y.ravel(), d0, grid.h)
    M = np.eye(grid.size) + (k ** 2) * G @ np.diag(nu.ravel())
    rng = np.random.default_rng(0)
    x = rng.standard_normal(grid.size) + 1j * rng.standard_normal(grid.size)
    got = np.asarray(apply_transpose(op, jnp.asarray(x)))
    np.testing.assert_allclose(got, M.T @ x, rtol=1e-10, atol=1e-12)


def test_differentiable_solve_matches_gmres(small_problem):
    grid, k, X, Y, nu, op = small_problem
    rng = np.random.default_rng(1)
    b = jnp.asarray(rng.standard_normal(grid.size)
                    + 1j * rng.standard_normal(grid.size))
    u = differentiable_solve(op, b, rtol=1e-12, restart=40, maxiter=400)
    want, info = gmres(op.apply, b, rtol=1e-12, restart=40, maxiter=400)
    assert bool(info.converged)
    np.testing.assert_allclose(np.asarray(u), np.asarray(want), rtol=1e-8)


def test_gradient_wrt_medium_matches_finite_differences(small_problem):
    """d/d(nu) of a scalar loss of the solution, adjoint vs central FD."""
    grid, k, X, Y, nu, op = small_problem
    rng = np.random.default_rng(2)
    b = jnp.asarray(rng.standard_normal(grid.size)
                    + 1j * rng.standard_normal(grid.size))
    wvec = jnp.asarray(rng.standard_normal(grid.size))

    def loss(nu_arr):
        op2 = op.replace(nu=nu_arr)
        u = differentiable_solve(op2, b, rtol=1e-13, restart=40, maxiter=400)
        return jnp.sum(wvec * jnp.abs(u) ** 2)

    nu0 = jnp.asarray(np.asarray(op.nu))
    g = jax.grad(loss)(nu0)

    eps = 1e-6
    for (j, i) in [(5, 7), (8, 8), (12, 3)]:
        e = jnp.zeros_like(nu0).at[j, i].set(1.0)
        fd = (loss(nu0 + eps * e) - loss(nu0 - eps * e)) / (2 * eps)
        np.testing.assert_allclose(np.asarray(g[j, i]), np.asarray(fd),
                                   rtol=2e-4)


def test_gradient_with_sparsifying_preconditioners(small_problem):
    """The preconditioned forward/transpose solves give the same gradient."""
    grid, k, X, Y, nu, op = small_problem
    a_st, ag_st = stencils.build_sparse_a_ag_2d(
        k, grid.x, grid.y, grid.h, dtype=jnp.complex128
    )
    msp = stencils.build_msp_2d(a_st, ag_st, nu, k)
    pc = SparsifyingPreconditioner.build(msp, a_st)
    pc_t = SparsifyingPreconditionerT.build(msp, a_st)

    rng = np.random.default_rng(3)
    b = jnp.asarray(rng.standard_normal(grid.size)
                    + 1j * rng.standard_normal(grid.size))
    wvec = jnp.asarray(rng.standard_normal(grid.size))

    def loss(nu_arr, precond, precond_t):
        op2 = op.replace(nu=nu_arr)
        u = differentiable_solve(
            op2, b, preconditioner=precond, preconditioner_t=precond_t,
            rtol=1e-12, restart=40, maxiter=400,
        )
        return jnp.sum(wvec * jnp.abs(u) ** 2)

    nu0 = jnp.asarray(np.asarray(op.nu))
    g_plain = jax.grad(loss)(nu0, None, None)
    g_pc = jax.grad(loss)(nu0, pc.apply, pc_t.apply)
    np.testing.assert_allclose(np.asarray(g_pc), np.asarray(g_plain),
                               rtol=1e-5, atol=1e-10)
