"""Sharded polarized-traces preconditioner == single-device apply_batch,
on the forced-host-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from fast_solver_lippmann_schwinger_tpu.core.grids import Grid2D
from fast_solver_lippmann_schwinger_tpu.ddm.polarized import (
    PolarizedTracesPreconditioner,
)
from fast_solver_lippmann_schwinger_tpu.ddm.subdomain import build_slab_system
from fast_solver_lippmann_schwinger_tpu.models import media
from fast_solver_lippmann_schwinger_tpu.ops.fastconv import (
    build_fast_convolution_2d,
)
from fast_solver_lippmann_schwinger_tpu.parallel.polarized import (
    make_sharded_polarized_preconditioner,
)
from fast_solver_lippmann_schwinger_tpu.parallel.sharded import (
    shard_slab_system,
)
from fast_solver_lippmann_schwinger_tpu.solver.gmres import gmres_batched


@pytest.fixture(scope="module")
def setup():
    grid = Grid2D(a=1.0, h=1.0 / 48.0)
    k = 1.0 / grid.h
    X, Y = grid.mesh()
    nu = media.gaussian_bump_2d(X, Y)
    from fast_solver_lippmann_schwinger_tpu.sparse import stencils

    a_st, ag_st = stencils.build_sparse_a_ag_2d(
        k, grid.x, grid.y, grid.h, dtype=jnp.complex128
    )
    slabs = build_slab_system(
        a_st, ag_st, nu, grid.x, grid.y, grid.h, k, 4, npml=6
    )
    return grid, k, nu, a_st, slabs


@pytest.mark.parametrize("n_dev", [2, 4])
def test_sharded_polarized_matches_single(setup, n_dev):
    if len(jax.devices()) < n_dev:
        pytest.skip(f"needs >= {n_dev} devices")
    grid, k, nu, a_st, slabs = setup
    mesh = Mesh(np.array(jax.devices()[:n_dev]), ("slab",))
    rng = np.random.default_rng(0)
    B = jnp.asarray(
        rng.standard_normal((2, grid.size))
        + 1j * rng.standard_normal((2, grid.size))
    )
    pc = PolarizedTracesPreconditioner(slabs=slabs, a_s=a_st, n_it=2)
    want = np.asarray(pc.apply_batch(B))
    pc_sh = make_sharded_polarized_preconditioner(
        shard_slab_system(slabs, mesh), a_st, mesh, n_it=2
    )
    with mesh:
        got = np.asarray(jax.jit(pc_sh)(B))
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-10)


def test_sharded_polarized_full_solve(setup):
    """Composed multi-chip trace-path solve: batched GMRES + sharded
    polarized preconditioner converges and matches the single-device
    solve."""
    n_dev = 4
    if len(jax.devices()) < n_dev:
        pytest.skip(f"needs >= {n_dev} devices")
    grid, k, nu, a_st, slabs = setup
    mesh = Mesh(np.array(jax.devices()[:n_dev]), ("slab",))
    op = build_fast_convolution_2d(
        grid.x, grid.y, grid.h, k, nu, quad_rule="greengard_vico",
        dtype=jnp.complex128,
    )
    X, Y = grid.mesh()
    dirs = np.array([(1.0, 0.0), (0.0, 1.0)])
    phases = dirs[:, 0:1] * X.ravel()[None] + dirs[:, 1:2] * Y.ravel()[None]
    u_inc = jnp.asarray(np.exp(1j * k * phases))

    pc = PolarizedTracesPreconditioner(slabs=slabs, a_s=a_st, n_it=2)

    def ref_solve(b):
        apply_b = jax.vmap(op.apply)
        return gmres_batched(
            apply_b, -(apply_b(b) - b), preconditioner=pc.apply_batch,
            rtol=1e-8, restart=20, maxiter=30,
        )

    x_ref, info_ref = jax.jit(ref_solve)(u_inc)

    pc_sh = make_sharded_polarized_preconditioner(
        shard_slab_system(slabs, mesh), a_st, mesh, n_it=2
    )

    def dist_solve(b):
        apply_b = jax.vmap(op.apply)
        return gmres_batched(
            apply_b, -(apply_b(b) - b), preconditioner=pc_sh,
            rtol=1e-8, restart=20, maxiter=30,
        )

    with mesh:
        x_dist, info_dist = jax.jit(dist_solve)(u_inc)
    assert bool(np.asarray(info_dist.converged).all())
    np.testing.assert_allclose(
        np.asarray(x_dist), np.asarray(x_ref), rtol=0, atol=1e-8
    )
    assert (
        np.asarray(info_dist.n_iterations).tolist()
        == np.asarray(info_ref.n_iterations).tolist()
    )
