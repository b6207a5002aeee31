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


def test_sparsifying_apply_batch_matches_single_2d():
    """SparsifyingPreconditioner.apply_batch == per-row apply (joint
    multi-source amortization on the non-DDM path)."""
    import jax.numpy as jnp
    import numpy as np

    from fast_solver_lippmann_schwinger_tpu.core.grids import Grid2D
    from fast_solver_lippmann_schwinger_tpu.models import media
    from fast_solver_lippmann_schwinger_tpu.precond.sparsifying import (
        SparsifyingPreconditioner,
    )
    from fast_solver_lippmann_schwinger_tpu.sparse import stencils

    grid = Grid2D(a=1.0, h=1.0 / 30.0)
    k = 1.0 / grid.h
    X, Y = grid.mesh()
    nu = media.gaussian_bump_2d(X, Y)
    a_st, ag_st = stencils.build_sparse_a_ag_2d(
        k, grid.x, grid.y, grid.h, dtype=jnp.complex128
    )
    msp = stencils.build_msp_2d(a_st, ag_st, nu, k)
    pc = SparsifyingPreconditioner.build(msp, a_st)
    rng = np.random.default_rng(3)
    B = jnp.asarray(
        rng.standard_normal((3, grid.size))
        + 1j * rng.standard_normal((3, grid.size))
    )
    got = np.asarray(pc.apply_batch(B))
    want = np.stack([np.asarray(pc.apply(B[r])) for r in range(3)])
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-11)


def test_sparsifying_apply_batch_matches_single_3d():
    """3D sparsifying apply_batch parity (incl. through the Pallas plane
    stack in interpret mode)."""
    import jax.numpy as jnp
    import numpy as np

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
    rng = np.random.default_rng(5)
    B = jnp.asarray(
        (rng.standard_normal((2, NN ** 3))
         + 1j * rng.standard_normal((2, NN ** 3))).astype(np.complex64)
    )
    for use_pallas in (False, True):
        pc = SparsifyingPreconditioner3D.build(
            msp, a_st, use_pallas=use_pallas
        )
        got = np.asarray(pc.apply_batch(B))
        want = np.stack([np.asarray(pc.apply(B[r])) for r in range(2)])
        np.testing.assert_allclose(got, want, rtol=0, atol=2e-5)
