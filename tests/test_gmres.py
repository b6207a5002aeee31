"""Device-resident GMRES unit tests."""

import jax.numpy as jnp
import numpy as np

from fast_solver_lippmann_schwinger_tpu.solver.gmres import gmres


def _random_system(n, seed=0, diag_boost=4.0):
    rng = np.random.default_rng(seed)
    a = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
    a = a / np.sqrt(n) + diag_boost * np.eye(n)
    b = rng.standard_normal(n) + 1j * rng.standard_normal(n)
    return jnp.asarray(a), jnp.asarray(b)


def test_gmres_solves_dense_system():
    a, b = _random_system(50)
    x, info = gmres(lambda v: a @ v, b, rtol=1e-10, restart=20, maxiter=200)
    assert bool(info.converged)
    res = np.linalg.norm(np.asarray(a @ x - b)) / np.linalg.norm(np.asarray(b))
    assert res < 1e-9


def test_gmres_restarts_needed():
    a, b = _random_system(80, seed=3, diag_boost=2.0)
    x, info = gmres(lambda v: a @ v, b, rtol=1e-8, restart=10, maxiter=300)
    assert bool(info.converged)
    res = np.linalg.norm(np.asarray(a @ x - b)) / np.linalg.norm(np.asarray(b))
    assert res < 1e-6


def test_gmres_left_preconditioner_reduces_iterations():
    a, b = _random_system(60, seed=5, diag_boost=0.8)
    a_np = np.asarray(a)
    m_inv = jnp.asarray(np.linalg.inv(a_np + 0.05 * np.eye(60)))
    x0, info0 = gmres(lambda v: a @ v, b, rtol=1e-8, restart=20, maxiter=400)
    x1, info1 = gmres(
        lambda v: a @ v, b, preconditioner=lambda v: m_inv @ v,
        rtol=1e-8, restart=20, maxiter=400,
    )
    assert bool(info1.converged)
    assert int(info1.n_iterations) < int(info0.n_iterations)
    res = np.linalg.norm(np.asarray(a @ x1 - b)) / np.linalg.norm(np.asarray(b))
    assert res < 1e-6


def test_gmres_residual_history_monotone_tail():
    a, b = _random_system(40, seed=7)
    _, info = gmres(lambda v: a @ v, b, rtol=1e-10, restart=20, maxiter=100)
    r = np.asarray(info.residuals)
    r = r[r > 0]
    assert r[-1] <= 1e-10 * r[0] * 10  # converged to tolerance (with slack)
