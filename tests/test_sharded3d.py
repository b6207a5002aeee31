"""Sharded 3D z-slab sweep must equal the single-device sweep, for both
pivot layouts, on the forced-host-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from fast_solver_lippmann_schwinger_tpu.ddm.subdomain3d import (
    build_slab_system_3d,
    gs_sweep_3d,
)
from fast_solver_lippmann_schwinger_tpu.models import media
from fast_solver_lippmann_schwinger_tpu.ops.fastconv import (
    build_fast_convolution_3d,
)
from fast_solver_lippmann_schwinger_tpu.parallel.sharded import (
    shard_slab_system,
)
from fast_solver_lippmann_schwinger_tpu.parallel.sharded3d import (
    sharded_gs_sweep_3d,
)
from fast_solver_lippmann_schwinger_tpu.sparse import stencils

NN = 17
K = 8.0


@pytest.fixture(scope="module")
def stencil_3d():
    h = 1.0 / (NN - 1)
    x = np.linspace(0.0, 1.0, NN)
    Z, Y, X = np.meshgrid(x, x, x, indexing="ij")
    nu = media.gaussian_bump_3d(X, Y, Z)
    op = build_fast_convolution_3d(x, x, x, h, K, nu, dtype=jnp.complex128)
    a_st, ag_st = stencils.build_sparse_a_ag_3d(K, op, dtype=jnp.complex128)
    return x, h, nu, a_st, ag_st


@pytest.mark.parametrize("pivot_dtype,n_dev", [("full", 2), ("yblock", 2)])
def test_sharded_3d_sweep_matches_single_device(stencil_3d, pivot_dtype, n_dev):
    if len(jax.devices()) < n_dev:
        pytest.skip(f"needs >= {n_dev} devices")
    x, h, nu, a_st, ag_st = stencil_3d
    slabs = build_slab_system_3d(
        a_st, ag_st, nu, x, h, K, n_subs=2, npml=5, pivot_dtype=pivot_dtype
    )
    rng = np.random.default_rng(0)
    b = jnp.asarray(
        rng.standard_normal(NN ** 3) + 1j * rng.standard_normal(NN ** 3)
    )
    ref = np.asarray(gs_sweep_3d(slabs, b))
    mesh = Mesh(np.array(jax.devices()[:n_dev]), ("slab",))
    slabs_sh = shard_slab_system(slabs, mesh)
    with mesh:
        got = np.asarray(sharded_gs_sweep_3d(slabs_sh, b, mesh))
    np.testing.assert_allclose(got, ref, rtol=1e-10, atol=1e-12)


@pytest.mark.parametrize(
    "n_dev,n_rhs,block,n_subs",
    [
        (2, 3, 1, 2),    # unblocked pipeline, R > D
        (2, 4, 2, 2),    # whole 2-wide blocks
        (2, 5, 2, 4),    # ragged blocks, k = 2 slabs/device
    ],
)
def test_sharded_3d_pipelined_matches_single_device(stencil_3d, n_dev, n_rhs,
                                                    block, n_subs):
    from fast_solver_lippmann_schwinger_tpu.parallel.sharded3d import (
        sharded_gs_sweep_3d_pipelined,
    )

    if len(jax.devices()) < n_dev:
        pytest.skip(f"needs >= {n_dev} devices")
    x, h, nu, a_st, ag_st = stencil_3d
    slabs = build_slab_system_3d(
        a_st, ag_st, nu, x, h, K, n_subs=n_subs, npml=5, pivot_dtype="full"
    )
    rng = np.random.default_rng(n_rhs * 10 + block)
    B = jnp.asarray(
        rng.standard_normal((n_rhs, NN ** 3))
        + 1j * rng.standard_normal((n_rhs, NN ** 3))
    )
    mesh = Mesh(np.array(jax.devices()[:n_dev]), ("slab",))
    slabs_sh = shard_slab_system(slabs, mesh)
    with mesh:
        got = np.asarray(
            sharded_gs_sweep_3d_pipelined(slabs_sh, B, mesh, rhs_block=block)
        )
    assert got.shape == B.shape
    for r in range(n_rhs):
        ref = np.asarray(gs_sweep_3d(slabs, B[r]))
        np.testing.assert_allclose(got[r], ref, rtol=1e-10, atol=1e-12)
