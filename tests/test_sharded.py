"""Sharded slab sweep on a virtual 8-device CPU mesh must agree with the
single-device sweep bit-for-tolerance (SURVEY.md section 4 distributed test
requirement — a multi-device story the reference never had)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from fast_solver_lippmann_schwinger_tpu.core.grids import Grid2D
from fast_solver_lippmann_schwinger_tpu.ddm.subdomain import build_slab_system
from fast_solver_lippmann_schwinger_tpu.ddm.sweeps import gs_sweep
from fast_solver_lippmann_schwinger_tpu.models import media
from fast_solver_lippmann_schwinger_tpu.parallel.sharded import (
    shard_slab_system,
    sharded_gs_sweep,
)
from fast_solver_lippmann_schwinger_tpu.sparse import stencils


@pytest.fixture(scope="module")
def slab_setup():
    grid = Grid2D(a=1.0, h=1.0 / 36.0)
    k = 1.0 / grid.h
    X, Y = grid.mesh()
    nu = media.gaussian_bump_2d(X, Y)
    a_st, ag_st = stencils.build_sparse_a_ag_2d(
        k, grid.x, grid.y, grid.h, dtype=jnp.complex128
    )
    n_subs = 4
    slabs = build_slab_system(
        a_st, ag_st, nu, grid.x, grid.y, grid.h, k, n_subs, npml=6
    )
    return grid, slabs


def test_sharded_sweep_matches_single_device(slab_setup):
    grid, slabs = slab_setup
    n_dev = min(4, len(jax.devices()))
    mesh = Mesh(np.array(jax.devices()[:n_dev]), ("slab",))

    rng = np.random.default_rng(0)
    b = jnp.asarray(
        rng.standard_normal(grid.size) + 1j * rng.standard_normal(grid.size)
    )
    ref = np.asarray(gs_sweep(slabs, b))
    slabs_sharded = shard_slab_system(slabs, mesh)
    got = np.asarray(sharded_gs_sweep(slabs_sharded, b, mesh))
    np.testing.assert_allclose(got, ref, rtol=1e-10, atol=1e-12)


def test_sharded_sweep_multiple_slabs_per_device(slab_setup):
    grid, slabs = slab_setup
    if len(jax.devices()) < 2:
        pytest.skip("needs >= 2 devices")
    mesh = Mesh(np.array(jax.devices()[:2]), ("slab",))

    rng = np.random.default_rng(1)
    b = jnp.asarray(
        rng.standard_normal(grid.size) + 1j * rng.standard_normal(grid.size)
    )
    ref = np.asarray(gs_sweep(slabs, b))
    slabs_sharded = shard_slab_system(slabs, mesh)
    got = np.asarray(sharded_gs_sweep(slabs_sharded, b, mesh))
    np.testing.assert_allclose(got, ref, rtol=1e-10, atol=1e-12)
