"""Batched GMRES (joint multi-RHS Krylov) must reproduce the single-RHS
solver per row, and the distributed pipelined double-sweep solve must match
the single-device batched solve.

The reference loops incident directions serially
(``tests/plasma_example.jl:160,172``); ``gmres_batched`` +
``make_sharded_double_sweep_pipelined`` is the TPU-idiomatic multi-direction
production path (pipeline-filled sweeps, one Krylov loop)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from fast_solver_lippmann_schwinger_tpu.core.grids import Grid2D
from fast_solver_lippmann_schwinger_tpu.ddm.subdomain import build_slab_system
from fast_solver_lippmann_schwinger_tpu.ddm.sweeps import DoubleSweepPreconditioner
from fast_solver_lippmann_schwinger_tpu.models import media
from fast_solver_lippmann_schwinger_tpu.ops.fastconv import (
    build_fast_convolution_2d,
)
from fast_solver_lippmann_schwinger_tpu.parallel.sharded import (
    make_sharded_double_sweep_pipelined,
    shard_slab_system,
)
from fast_solver_lippmann_schwinger_tpu.solver.gmres import gmres, gmres_batched
from fast_solver_lippmann_schwinger_tpu.sparse import stencils


@pytest.fixture(scope="module")
def setup():
    grid = Grid2D(a=1.0, h=1.0 / 36.0)
    k = 1.0 / grid.h
    X, Y = grid.mesh()
    nu = media.gaussian_bump_2d(X, Y)
    op = build_fast_convolution_2d(
        grid.x, grid.y, grid.h, k, nu, quad_rule="greengard_vico",
        dtype=jnp.complex128,
    )
    a_st, ag_st = stencils.build_sparse_a_ag_2d(
        k, grid.x, grid.y, grid.h, dtype=jnp.complex128
    )
    msp = stencils.build_msp_2d(a_st, ag_st, nu, k)
    slabs = build_slab_system(
        a_st, ag_st, nu, grid.x, grid.y, grid.h, k, 4, npml=5
    )
    slabs_t = build_slab_system(
        a_st.transpose(), ag_st.transpose(), np.asarray(nu).T,
        grid.y, grid.x, grid.h, k, 4, npml=5,
    )
    dirs = [(1.0, 0.0), (0.0, 1.0)]
    uis = jnp.stack([
        jnp.asarray(np.exp(1j * k * (dx * X.ravel() + dy * Y.ravel())))
        for dx, dy in dirs
    ])
    rhs = jnp.stack([-(op.apply(u) - u) for u in uis])
    return grid, k, op, a_st, msp, slabs, slabs_t, rhs


def test_batched_matches_single_rhs(setup):
    grid, k, op, a_st, msp, slabs, slabs_t, rhs = setup
    pre = DoubleSweepPreconditioner(
        slabs=slabs, slabs_t=slabs_t, msp=msp, a_s=a_st
    )
    Xb, infob = gmres_batched(
        lambda W: jax.vmap(op.apply)(W), rhs,
        preconditioner=lambda W: jax.vmap(pre.apply)(W),
        rtol=1e-8, restart=20, maxiter=40,
    )
    assert bool(infob.converged.all())
    for r in range(rhs.shape[0]):
        xr, ir = gmres(op.apply, rhs[r], preconditioner=pre.apply,
                       rtol=1e-8, restart=20, maxiter=40)
        assert int(infob.n_iterations[r]) == int(ir.n_iterations)
        np.testing.assert_allclose(
            np.asarray(Xb[r]), np.asarray(xr), rtol=1e-9, atol=1e-11
        )


def test_distributed_pipelined_solve_matches(setup):
    if len(jax.devices()) < 2:
        pytest.skip("needs >= 2 devices")
    grid, k, op, a_st, msp, slabs, slabs_t, rhs = setup
    pre = DoubleSweepPreconditioner(
        slabs=slabs, slabs_t=slabs_t, msp=msp, a_s=a_st
    )
    Xb, _ = gmres_batched(
        lambda W: jax.vmap(op.apply)(W), rhs,
        preconditioner=lambda W: jax.vmap(pre.apply)(W),
        rtol=1e-8, restart=20, maxiter=40,
    )
    mesh = Mesh(np.array(jax.devices()[:2]), ("slab",))
    sl_sh = shard_slab_system(slabs, mesh)
    slt_sh = shard_slab_system(slabs_t, mesh)
    pc = make_sharded_double_sweep_pipelined(sl_sh, slt_sh, msp, a_st, mesh)
    with mesh:
        Xp, infop = jax.jit(lambda b: gmres_batched(
            lambda W: jax.vmap(op.apply)(W), b, preconditioner=pc,
            rtol=1e-8, restart=20, maxiter=40,
        ))(rhs)
    assert bool(infop.converged.all())
    for r in range(rhs.shape[0]):
        np.testing.assert_allclose(
            np.asarray(Xp[r]), np.asarray(Xb[r]), rtol=1e-9, atol=1e-11
        )
