"""End-to-end 2D bump solve: the minimum slice of the reference's
``examples/example.jl`` (scaled down to test size).

Oracles:
* preconditioned GMRES converges in few iterations (the sparsifying
  preconditioner's whole point — the reference observes ~O(10) iterations),
* unpreconditioned takes more iterations,
* the solution satisfies the discretized integral equation,
* the preconditioned and unpreconditioned solutions agree.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from fast_solver_lippmann_schwinger_tpu.models import bump2d


@pytest.fixture(scope="module")
def problem():
    # h = 1/40 so k = 40: ~6 wavelengths across the box, N = 1681
    return bump2d.build_problem(h=1.0 / 40.0, dtype=jnp.complex128)


def test_preconditioned_solve_converges_fast(problem):
    u, info = bump2d.solve(problem, rtol=1e-8)
    assert bool(info.converged)
    iters = int(info.n_iterations)
    # regression pin: measured 4 iterations (complex128 CPU)
    assert iters <= 4, f"sparsifying precond regressed: {iters} iters (pinned at 4)"
    # verify the residual directly
    res = np.linalg.norm(
        np.asarray(problem.op.apply(u) - problem.rhs)
    ) / np.linalg.norm(np.asarray(problem.rhs))
    assert res < 1e-6


def test_unpreconditioned_needs_more_iterations(problem):
    u_p, info_p = bump2d.solve(problem, rtol=1e-8)
    u_u, info_u = bump2d.solve(problem, rtol=1e-8, preconditioned=False,
                               maxiter=400)
    assert int(info_u.n_iterations) > int(info_p.n_iterations)
    # both converge to the same field
    rel = np.linalg.norm(np.asarray(u_p - u_u)) / np.linalg.norm(np.asarray(u_p))
    assert rel < 1e-5


def test_total_field_physical(problem):
    """Total field magnitude stays O(1) — a cheap physical sanity check."""
    u, info = bump2d.solve(problem, rtol=1e-8)
    total = np.asarray(u + problem.u_inc)
    assert np.isfinite(total).all()
    assert np.abs(total).max() < 10.0
