"""The COMPOSED multi-chip solve: distributed-FFT operator + pipelined
sharded double-sweep preconditioner + batched GMRES in ONE program over the
same device mesh (the "grid exceeds one chip" story end to end — both the
spectral extended grid and the slab factorizations live sharded).
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from fast_solver_lippmann_schwinger_tpu.core.grids import Grid2D
from fast_solver_lippmann_schwinger_tpu.ddm.subdomain import build_slab_system
from fast_solver_lippmann_schwinger_tpu.ddm.sweeps import (
    DoubleSweepPreconditioner,
)
from fast_solver_lippmann_schwinger_tpu.models import media
from fast_solver_lippmann_schwinger_tpu.ops.fastconv import (
    build_fast_convolution_2d,
)
from fast_solver_lippmann_schwinger_tpu.parallel.fft import (
    build_distributed_fast_convolution_2d,
)
from fast_solver_lippmann_schwinger_tpu.parallel.sharded import (
    make_sharded_double_sweep_pipelined,
    shard_slab_system,
)
from fast_solver_lippmann_schwinger_tpu.solver.gmres import gmres_batched
from fast_solver_lippmann_schwinger_tpu.sparse import stencils


def _setup(n_dev=4, n_slabs=8, h=1.0 / 36.0):
    mesh = Mesh(np.array(jax.devices()[:n_dev]), ("slab",))
    grid = Grid2D(a=1.0, h=h)
    k = 1.0 / grid.h
    X, Y = grid.mesh()
    nu = media.gaussian_bump_2d(X, Y)
    dtype = jnp.complex128

    a_st, ag_st = stencils.build_sparse_a_ag_2d(
        k, grid.x, grid.y, grid.h, dtype=dtype
    )
    msp = stencils.build_msp_2d(a_st, ag_st, nu, k)
    npml = 5
    slabs = build_slab_system(
        a_st, ag_st, nu, grid.x, grid.y, grid.h, k, n_slabs, npml=npml
    )
    slabs_t = build_slab_system(
        a_st.transpose(), ag_st.transpose(), nu.T,
        grid.y, grid.x, grid.h, k, n_slabs, npml=npml,
    )
    return mesh, grid, k, nu, dtype, a_st, msp, slabs, slabs_t


def test_composed_solve_matches_single_device():
    mesh, grid, k, nu, dtype, a_st, msp, slabs, slabs_t = _setup()
    X, Y = grid.mesh()
    dirs = np.array([(1.0, 0.0), (0.0, 1.0), (0.6, 0.8)])
    phases = dirs[:, 0:1] * X.ravel()[None] + dirs[:, 1:2] * Y.ravel()[None]
    u_inc = jnp.asarray(np.exp(1j * k * phases), dtype)      # (R, N)

    # ---- single-device reference: replicated op, vmapped preconditioner
    op_ref = build_fast_convolution_2d(
        grid.x, grid.y, grid.h, k, nu,
        quad_rule="greengard_vico", dtype=dtype, pad_to_friendly=False,
    )
    pc_ref = DoubleSweepPreconditioner(
        slabs=slabs, slabs_t=slabs_t, msp=msp, a_s=a_st
    )

    def ref_solve(b):
        rhs = -(jax.vmap(op_ref.apply)(b) - b)
        x, info = gmres_batched(
            lambda W: jax.vmap(op_ref.apply)(W), rhs,
            preconditioner=lambda W: jax.vmap(pc_ref.apply)(W),
            rtol=1e-10, restart=8, maxiter=8,
        )
        return x, info.residuals

    x_ref, res_ref = jax.jit(ref_solve)(u_inc)

    # ---- composed distributed: sharded-FFT op + pipelined sharded sweep
    op_dist = build_distributed_fast_convolution_2d(
        grid.x, grid.y, grid.h, k, nu, mesh, dtype=dtype
    )
    pc_dist = make_sharded_double_sweep_pipelined(
        shard_slab_system(slabs, mesh), shard_slab_system(slabs_t, mesh),
        msp, a_st, mesh,
    )

    def dist_solve(b):
        rhs = -(op_dist.apply_batch(b) - b)
        x, info = gmres_batched(
            op_dist.apply_batch, rhs, preconditioner=pc_dist,
            rtol=1e-10, restart=8, maxiter=8,
        )
        return x, info.residuals

    with mesh:
        x_dist, res_dist = jax.jit(dist_solve)(u_inc)

    np.testing.assert_allclose(
        np.asarray(x_dist), np.asarray(x_ref), rtol=0, atol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(res_dist), np.asarray(res_ref), rtol=1e-6, atol=1e-12
    )


def test_composed_3d_solve_matches_single_device():
    """3D analog of the composed test: distributed-FFT 3D operator
    (``DistributedLS3D.apply_batch``) + pipelined sharded z-slab sweep +
    batched GMRES in one program == replicated single-device solve."""
    from fast_solver_lippmann_schwinger_tpu.ddm.subdomain3d import (
        build_slab_system_3d,
        gs_sweep_3d,
    )
    from fast_solver_lippmann_schwinger_tpu.ops.fastconv import (
        build_fast_convolution_3d,
    )
    from fast_solver_lippmann_schwinger_tpu.parallel.fft import (
        build_distributed_fast_convolution_3d,
    )
    from fast_solver_lippmann_schwinger_tpu.parallel.sharded3d import (
        make_sharded_sweep_preconditioner_3d_pipelined,
    )

    NN, K, n_dev, n_subs = 17, 8.0, 2, 2
    h = 1.0 / (NN - 1)
    x = np.linspace(0.0, 1.0, NN)
    Z, Y, X = np.meshgrid(x, x, x, indexing="ij")
    nu = media.gaussian_bump_3d(X, Y, Z)
    dtype = jnp.complex128
    mesh = Mesh(np.array(jax.devices()[:n_dev]), ("slab",))

    op_ref = build_fast_convolution_3d(x, x, x, h, K, nu, dtype=dtype)
    a_st, ag_st = stencils.build_sparse_a_ag_3d(K, op_ref, dtype=dtype)
    slabs = build_slab_system_3d(
        a_st, ag_st, nu, x, h, K, n_subs=n_subs, npml=5, pivot_dtype="full"
    )

    dirs = np.array([(1.0, 0.0, 0.0), (0.0, 0.6, 0.8)])
    phases = sum(
        dirs[:, i : i + 1] * ax.ravel()[None] for i, ax in enumerate((X, Y, Z))
    )
    u_inc = jnp.asarray(np.exp(1j * K * phases), dtype)       # (R, N)

    def ref_solve(b):
        rhs = -(jax.vmap(op_ref.apply)(b) - b)
        xs, info = gmres_batched(
            lambda W: jax.vmap(op_ref.apply)(W), rhs,
            preconditioner=lambda W: jax.vmap(
                lambda v: gs_sweep_3d(slabs, a_st.matvec(v))
            )(W),
            rtol=1e-10, restart=8, maxiter=8,
        )
        return xs, info.residuals

    x_ref, res_ref = jax.jit(ref_solve)(u_inc)

    op_dist = build_distributed_fast_convolution_3d(
        x, x, x, h, K, nu, mesh, dtype=dtype
    )
    pc_dist = make_sharded_sweep_preconditioner_3d_pipelined(
        shard_slab_system(slabs, mesh), a_st, mesh, rhs_block=2
    )

    def dist_solve(b):
        rhs = -(op_dist.apply_batch(b) - b)
        xs, info = gmres_batched(
            op_dist.apply_batch, rhs, preconditioner=pc_dist,
            rtol=1e-10, restart=8, maxiter=8,
        )
        return xs, info.residuals

    with mesh:
        x_dist, res_dist = jax.jit(dist_solve)(u_inc)

    np.testing.assert_allclose(
        np.asarray(x_dist), np.asarray(x_ref), rtol=0, atol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(res_dist), np.asarray(res_ref), rtol=1e-6, atol=1e-12
    )


def test_distributed_apply_batch_matches_apply():
    mesh, grid, k, nu, dtype, *_ = _setup(n_dev=8, n_slabs=8)
    op_dist = build_distributed_fast_convolution_2d(
        grid.x, grid.y, grid.h, k, nu, mesh, dtype=dtype
    )
    rng = np.random.default_rng(3)
    b = jnp.asarray(
        rng.standard_normal((3, grid.size))
        + 1j * rng.standard_normal((3, grid.size)),
        dtype,
    )
    with mesh:
        got = np.asarray(jax.jit(op_dist.apply_batch)(b))
        want = np.stack(
            [np.asarray(jax.jit(op_dist.apply)(b[i])) for i in range(3)]
        )
    np.testing.assert_allclose(got, want, rtol=1e-11, atol=1e-11)
