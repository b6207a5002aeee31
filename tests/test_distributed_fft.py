"""Distributed (all-to-all-transposed) FFT convolution must agree with the
single-device operator bit-for-tolerance on a virtual 8-device CPU mesh —
the multi-chip answer to SURVEY.md section 7 hard part 4 (padded 3D grids
exceeding one chip's HBM)."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from fast_solver_lippmann_schwinger_tpu.core.grids import Grid2D
from fast_solver_lippmann_schwinger_tpu.models import media
from fast_solver_lippmann_schwinger_tpu.ops.fastconv import (
    build_fast_convolution_2d,
    build_fast_convolution_3d,
)
from fast_solver_lippmann_schwinger_tpu.parallel.fft import (
    build_distributed_fast_convolution_2d,
    build_distributed_fast_convolution_3d,
)


def _mesh(n_dev):
    return Mesh(np.array(jax.devices()[:n_dev]), ("slab",))


def test_distributed_2d_matches_single_device():
    grid = Grid2D(a=1.0, h=1.0 / 40.0)
    k = 1.0 / grid.h
    X, Y = grid.mesh()
    nu = media.gaussian_bump_2d(X, Y)
    mesh = _mesh(8)

    op_ref = build_fast_convolution_2d(
        grid.x, grid.y, grid.h, k, nu,
        quad_rule="greengard_vico", dtype=jnp.complex128,
        pad_to_friendly=False,
    )
    op_dist = build_distributed_fast_convolution_2d(
        grid.x, grid.y, grid.h, k, nu, mesh, dtype=jnp.complex128
    )

    rng = np.random.default_rng(0)
    u_host = rng.standard_normal(grid.shape) + 1j * rng.standard_normal(grid.shape)
    u = jnp.asarray(u_host, jnp.complex128)
    want = np.asarray(op_ref.apply(u.reshape(-1))).reshape(grid.shape)
    with mesh:
        got = np.asarray(jax.jit(op_dist.apply)(u))
    assert np.allclose(got, want, rtol=1e-11, atol=1e-11)


def test_distributed_2d_trapezoidal():
    grid = Grid2D(a=1.0, h=1.0 / 32.0)
    k = 1.0 / grid.h
    X, Y = grid.mesh()
    nu = media.gaussian_bump_2d(X, Y)
    mesh = _mesh(4)

    op_ref = build_fast_convolution_2d(
        grid.x, grid.y, grid.h, k, nu,
        quad_rule="trapezoidal", dtype=jnp.complex128,
    )
    op_dist = build_distributed_fast_convolution_2d(
        grid.x, grid.y, grid.h, k, nu, mesh,
        quad_rule="trapezoidal", dtype=jnp.complex128,
    )
    rng = np.random.default_rng(1)
    u = jnp.asarray(
        rng.standard_normal(grid.shape) + 1j * rng.standard_normal(grid.shape),
        jnp.complex128,
    )
    want = np.asarray(op_ref.apply(u.reshape(-1))).reshape(grid.shape)
    with mesh:
        got = np.asarray(jax.jit(op_dist.apply)(u))
    assert np.allclose(got, want, rtol=1e-11, atol=1e-11)


def test_distributed_3d_matches_single_device():
    n = 14
    h = 1.0 / (n - 1)
    x = np.linspace(0.0, 1.0, n)
    k = 10.0
    mesh = _mesh(8)

    def nu3(X, Y, Z):
        return media.gaussian_bump_3d(X, Y, Z)

    op_ref = build_fast_convolution_3d(
        x, x, x, h, k, nu3, dtype=jnp.complex128
    )
    op_dist = build_distributed_fast_convolution_3d(
        x, x, x, h, k, nu3, mesh, dtype=jnp.complex128
    )
    rng = np.random.default_rng(2)
    shape = (n, n, n)
    u = jnp.asarray(
        rng.standard_normal(shape) + 1j * rng.standard_normal(shape),
        jnp.complex128,
    )
    want = np.asarray(op_ref.apply(u.reshape(-1))).reshape(shape)
    with mesh:
        got = np.asarray(jax.jit(op_dist.apply)(u))
    assert np.allclose(got, want, rtol=1e-10, atol=1e-10)
