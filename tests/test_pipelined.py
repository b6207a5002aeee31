"""Wavefront-pipelined multi-RHS sharded sweep must reproduce the
single-device sweep per RHS."""

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
    sharded_gs_sweep_pipelined,
)
from fast_solver_lippmann_schwinger_tpu.sparse import stencils


def test_pipelined_sweep_matches_single_device():
    n_dev = min(4, len(jax.devices()))
    if n_dev < 2:
        pytest.skip("needs >= 2 devices")
    grid = Grid2D(a=1.0, h=1.0 / 36.0)
    k = 1.0 / grid.h
    X, Y = grid.mesh()
    nu = media.gaussian_bump_2d(X, Y)
    a_st, ag_st = stencils.build_sparse_a_ag_2d(
        k, grid.x, grid.y, grid.h, dtype=jnp.complex128
    )
    slabs = build_slab_system(
        a_st, ag_st, nu, grid.x, grid.y, grid.h, k, n_dev, npml=6
    )
    mesh = Mesh(np.array(jax.devices()[:n_dev]), ("slab",))
    slabs_sharded = shard_slab_system(slabs, mesh)

    rng = np.random.default_rng(0)
    R = 3
    B = jnp.asarray(
        rng.standard_normal((R, grid.size))
        + 1j * rng.standard_normal((R, grid.size))
    )
    got = np.asarray(sharded_gs_sweep_pipelined(slabs_sharded, B, mesh))
    for r in range(R):
        ref = np.asarray(gs_sweep(slabs, B[r]))
        np.testing.assert_allclose(got[r], ref, rtol=1e-10, atol=1e-12)
