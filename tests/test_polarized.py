"""Polarized-traces integral system tests (reference
``tests/plasma_integral_system_example.jl`` scaled down)."""

import jax.numpy as jnp
import numpy as np
import pytest

from fast_solver_lippmann_schwinger_tpu.core.grids import Grid2D
from fast_solver_lippmann_schwinger_tpu.ddm import polarized
from fast_solver_lippmann_schwinger_tpu.ddm.subdomain import build_slab_system
from fast_solver_lippmann_schwinger_tpu.models import media
from fast_solver_lippmann_schwinger_tpu.ops.fastconv import build_fast_convolution_2d
from fast_solver_lippmann_schwinger_tpu.solver.gmres import gmres
from fast_solver_lippmann_schwinger_tpu.sparse import stencils

N_SUBS = 4
NPML = 6


@pytest.fixture(scope="module")
def setup():
    grid = Grid2D(a=1.0, h=1.0 / 60.0)
    k = 1.0 / grid.h
    X, Y = grid.mesh()
    nu = media.plasma_2d(X, Y)
    op = build_fast_convolution_2d(
        grid.x, grid.y, grid.h, k, nu, quad_rule="greengard_vico",
        dtype=jnp.complex128,
    )
    a_st, ag_st = stencils.build_sparse_a_ag_2d(
        k, grid.x, grid.y, grid.h, dtype=jnp.complex128
    )
    slabs = build_slab_system(
        a_st, ag_st, nu, grid.x, grid.y, grid.h, k, N_SUBS, npml=NPML
    )
    return grid, k, X, nu, op, a_st, slabs


def _random_trace(slabs, seed, factor=2):
    rng = np.random.default_rng(seed)
    size = factor * (slabs.n_subs - 1) * slabs.n
    return jnp.asarray(
        rng.standard_normal(size) + 1j * rng.standard_normal(size)
    )


def test_ddown_dinvdown_identity(setup):
    grid, k, X, nu, op, a_st, slabs = setup
    u = _random_trace(slabs, 0)
    v = polarized.apply_dinv_down(slabs, u)
    uu = polarized.apply_d_down(slabs, v)
    np.testing.assert_allclose(np.asarray(uu), np.asarray(u), rtol=1e-9, atol=1e-9)


def test_dup_dinvup_identity(setup):
    grid, k, X, nu, op, a_st, slabs = setup
    u = _random_trace(slabs, 1)
    v = polarized.apply_dinv_up(slabs, u)
    uu = polarized.apply_d_up(slabs, v)
    np.testing.assert_allclose(np.asarray(uu), np.asarray(u), rtol=1e-9, atol=1e-9)


def test_devectorize_interface_roundtrip(setup):
    grid, k, X, nu, op, a_st, slabs = setup
    u = _random_trace(slabs, 2)
    v0, v1, vN, vNp = polarized._devectorize(slabs, u)
    back = polarized._interface_vector(slabs, vN, v1)
    np.testing.assert_allclose(np.asarray(back), np.asarray(u))


def test_mm_quadrants_match_optimized(setup):
    """The composite 2-RHS ``apply_mm`` must equal the four-quadrant plain
    assembly (reference ``applyMM`` vs ``applyMMOptUmf``)."""
    grid, k, X, nu, op, a_st, slabs = setup
    u = _random_trace(slabs, 11, factor=4)
    a = np.asarray(polarized.apply_mm(slabs, u))
    b = np.asarray(polarized.apply_mm_plain(slabs, u))
    np.testing.assert_allclose(b, a, rtol=1e-9, atol=1e-10)


def test_inner_trace_system_converges(setup):
    """GMRES on MM with the GS trace preconditioner converges quickly
    (the reference records the inner iteration count as its oracle)."""
    grid, k, X, nu, op, a_st, slabs = setup
    b = _random_trace(slabs, 3, factor=4)
    precond = lambda v: polarized.precond_gauss_seidel(
        slabs, polarized.permute_to_pairs(slabs, v), 2
    )
    x, info = gmres(
        lambda v: polarized.apply_mm(slabs, v), b, preconditioner=precond,
        rtol=1e-8, restart=20, maxiter=120,
    )
    assert bool(info.converged)
    # regression pin: measured 4 iterations (complex128 CPU)
    assert int(info.n_iterations) <= 4


def test_polarized_preconditioner_full_system(setup):
    grid, k, X, nu, op, a_st, slabs = setup
    precond = polarized.PolarizedTracesPreconditioner(
        slabs=slabs, a_s=a_st, n_it=2, inner_tol=1e-2
    )
    u_inc = jnp.asarray(np.exp(1j * k * X.ravel()))
    rhs = -(op.apply(u_inc) - u_inc)
    u, info = gmres(op.apply, rhs, preconditioner=precond.apply,
                    rtol=1e-8, restart=20, maxiter=100)
    assert bool(info.converged)
    iters = int(info.n_iterations)
    # convergence is monitored in the left-preconditioned norm (same as the
    # reference's IterativeSolvers setup); the true residual trails it
    res = np.linalg.norm(np.asarray(op.apply(u) - rhs)) / np.linalg.norm(
        np.asarray(rhs)
    )
    assert res < 1e-3
    # note: the preconditioner contains an inner GMRES, so it is (slightly)
    # nonlinear — re-applying it to the final residual is noisy; the
    # converged flag + true-residual + iteration-count checks above are the
    # stable oracles (matching how the reference drivers judge convergence)
    # regression pin: measured 6 iterations (complex128 CPU) — matches the 6
    # outer iterations recorded at the reference's 401x401 config (RESULTS.md)
    assert iters <= 6, f"polarized-traces regressed: {iters} iters (pinned at 6)"
