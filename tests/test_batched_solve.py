"""Batched multi-direction GMRES must match per-direction solves."""

import jax.numpy as jnp
import numpy as np

from fast_solver_lippmann_schwinger_tpu.models import plasma2d
from fast_solver_lippmann_schwinger_tpu.utils.host import fetch


def test_solve_batched_matches_sequential():
    problem = plasma2d.build_problem(
        h=1.0 / 50.0, n_subdomains=2, npml=6, dtype=jnp.complex128
    )
    dirs = [(1.0, 0.0), (0.0, 1.0)]
    xb, infob = plasma2d.solve_batched(
        problem, incident_directions=dirs, rtol=1e-8, maxiter=30
    )
    for i, d in enumerate(dirs):
        x, info = plasma2d.solve(problem, incident_direction=d,
                                 rtol=1e-8, maxiter=30)
        assert np.allclose(fetch(xb[i]), fetch(x), rtol=1e-7, atol=1e-9)
        # same iteration counts (the batched loop runs until ALL converge,
        # so per-RHS residual histories agree up to each one's convergence)
        ni_b = int(fetch(infob.n_iterations)[i])
        ni = int(fetch(info.n_iterations)[()])
        assert ni_b >= ni
        rb = fetch(infob.residuals)[i][: ni + 1]
        r = fetch(info.residuals)[: ni + 1]
        assert np.allclose(rb, r, rtol=1e-6)
