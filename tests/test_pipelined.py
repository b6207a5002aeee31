"""Wavefront-pipelined multi-RHS sharded sweep must reproduce the
single-device sweep per RHS — including k > 1 slabs per device and
R < n_devices (the general layouts, not just one-slab-per-device)."""

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


@pytest.fixture(scope="module")
def slabs4():
    grid = Grid2D(a=1.0, h=1.0 / 36.0)
    k = 1.0 / grid.h
    X, Y = grid.mesh()
    nu = media.gaussian_bump_2d(X, Y)
    a_st, ag_st = stencils.build_sparse_a_ag_2d(
        k, grid.x, grid.y, grid.h, dtype=jnp.complex128
    )
    slabs = build_slab_system(
        a_st, ag_st, nu, grid.x, grid.y, grid.h, k, 4, npml=6
    )
    return grid, slabs


@pytest.mark.parametrize(
    "n_dev,n_rhs",
    [
        (4, 3),   # one slab per device, R < D
        (2, 3),   # k = 2 slabs per device
        (2, 1),   # k = 2, single RHS (degenerate pipeline)
        (4, 6),   # R > D (pipeline fills)
    ],
)
def test_pipelined_sweep_matches_single_device(slabs4, n_dev, n_rhs):
    if len(jax.devices()) < n_dev:
        pytest.skip(f"needs >= {n_dev} devices")
    grid, slabs = slabs4
    mesh = Mesh(np.array(jax.devices()[:n_dev]), ("slab",))
    slabs_sharded = shard_slab_system(slabs, mesh)

    rng = np.random.default_rng(n_dev * 10 + n_rhs)
    B = jnp.asarray(
        rng.standard_normal((n_rhs, grid.size))
        + 1j * rng.standard_normal((n_rhs, grid.size))
    )
    got = np.asarray(sharded_gs_sweep_pipelined(slabs_sharded, B, mesh))
    for r in range(n_rhs):
        ref = np.asarray(gs_sweep(slabs, B[r]))
        np.testing.assert_allclose(got[r], ref, rtol=1e-10, atol=1e-12)


@pytest.mark.parametrize(
    "n_dev,n_rhs,block",
    [
        (2, 4, 2),   # whole blocks
        (2, 5, 2),   # ragged: pads to 3 blocks of 2
        (4, 6, 3),   # k = 1, blocks of 3
        (2, 4, 8),   # block > R clamps to R (one block)
    ],
)
def test_pipelined_sweep_rhs_blocks(slabs4, n_dev, n_rhs, block):
    """B-wide RHS blocks per pipeline round == per-RHS single-device sweeps
    (the block form streams each pivot plane once per B columns)."""
    if len(jax.devices()) < n_dev:
        pytest.skip(f"needs >= {n_dev} devices")
    grid, slabs = slabs4
    mesh = Mesh(np.array(jax.devices()[:n_dev]), ("slab",))
    slabs_sharded = shard_slab_system(slabs, mesh)

    rng = np.random.default_rng(n_dev * 100 + n_rhs + block)
    B = jnp.asarray(
        rng.standard_normal((n_rhs, grid.size))
        + 1j * rng.standard_normal((n_rhs, grid.size))
    )
    got = np.asarray(
        sharded_gs_sweep_pipelined(slabs_sharded, B, mesh, rhs_block=block)
    )
    assert got.shape == B.shape
    for r in range(n_rhs):
        ref = np.asarray(gs_sweep(slabs, B[r]))
        np.testing.assert_allclose(got[r], ref, rtol=1e-10, atol=1e-12)
