"""Solver-path comparisons mirroring the reference's backend test scripts.

``tests/Quadratures_test.jl`` exercises the GV-quadrature pipeline with both
direct solver backends; ``tests/PARDISO_test.jl`` does the same with the
trapezoidal operator.  Our single device backend collapses the UMFPACK vs
PARDISO axis, so the meaningful parity checks are across quadrature rules
and stencil sampling modes: all four combinations must converge to the same
physics."""

import jax.numpy as jnp
import numpy as np
import pytest

from fast_solver_lippmann_schwinger_tpu.core.grids import Grid2D
from fast_solver_lippmann_schwinger_tpu.models import media
from fast_solver_lippmann_schwinger_tpu.ops.fastconv import build_fast_convolution_2d
from fast_solver_lippmann_schwinger_tpu.precond.sparsifying import (
    SparsifyingPreconditioner,
)
from fast_solver_lippmann_schwinger_tpu.solver.gmres import gmres
from fast_solver_lippmann_schwinger_tpu.sparse import stencils


@pytest.fixture(scope="module")
def setup():
    grid = Grid2D(a=1.0, h=1.0 / 50.0)   # scaled-down h=0.01, k=100 config
    k = 1.0 / grid.h
    X, Y = grid.mesh()
    nu = media.gaussian_bump_2d(X, Y)
    return grid, k, X, Y, nu


def _solve(grid, k, X, nu, quad_rule, conv_sampled):
    op = build_fast_convolution_2d(
        grid.x, grid.y, grid.h, k, nu, quad_rule=quad_rule,
        dtype=jnp.complex128,
    )
    conv_op = op if conv_sampled else None
    a_st, ag_st = stencils.build_sparse_a_ag_2d(
        k, grid.x, grid.y, grid.h, conv_op=conv_op, dtype=jnp.complex128
    )
    msp = stencils.build_msp_2d(a_st, ag_st, nu, k)
    precond = SparsifyingPreconditioner.build(msp, a_st)
    u_inc = jnp.asarray(np.exp(1j * k * X.ravel()))
    rhs = -(op.apply(u_inc) - u_inc)
    u, info = gmres(op.apply, rhs, preconditioner=precond.apply,
                    rtol=1e-9, restart=20, maxiter=100)
    return np.asarray(u), info


def test_quadrature_and_sampling_paths_agree(setup):
    grid, k, X, Y, nu = setup
    u_trap, info_trap = _solve(grid, k, X, nu, "trapezoidal", False)
    u_gv_d0, info_gv_d0 = _solve(grid, k, X, nu, "greengard_vico", False)
    u_gv_conv, info_gv_conv = _solve(grid, k, X, nu, "greengard_vico", True)

    for info in (info_trap, info_gv_d0, info_gv_conv):
        assert bool(info.converged)
        assert int(info.n_iterations) <= 30

    # same scattering physics across quadratures (to quadrature accuracy)
    rel = np.linalg.norm(u_trap - u_gv_d0) / np.linalg.norm(u_trap)
    assert rel < 5e-2
    # same quadrature, different stencil sampling: nearly identical
    rel2 = np.linalg.norm(u_gv_d0 - u_gv_conv) / np.linalg.norm(u_gv_d0)
    assert rel2 < 5e-2
