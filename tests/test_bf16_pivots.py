"""bf16-compressed pivot storage: same preconditioner quality class."""

import jax.numpy as jnp
import numpy as np

from fast_solver_lippmann_schwinger_tpu.core.grids import Grid2D
from fast_solver_lippmann_schwinger_tpu.ddm.subdomain import build_slab_system
from fast_solver_lippmann_schwinger_tpu.ddm.sweeps import gs_sweep
from fast_solver_lippmann_schwinger_tpu.models import media
from fast_solver_lippmann_schwinger_tpu.solver.gmres import gmres
from fast_solver_lippmann_schwinger_tpu.sparse import stencils
from fast_solver_lippmann_schwinger_tpu.sparse.direct import (
    block_thomas_solve,
    compress_factorization,
    factor_stencil_2d,
)


def test_bf16_solve_approximates_full():
    grid = Grid2D(a=1.0, h=1.0 / 30.0)
    k = 1.0 / grid.h
    X, Y = grid.mesh()
    nu = media.gaussian_bump_2d(X, Y)
    a_st, ag_st = stencils.build_sparse_a_ag_2d(
        k, grid.x, grid.y, grid.h, dtype=jnp.complex64
    )
    msp = stencils.build_msp_2d(a_st, ag_st, nu, k)
    fac = factor_stencil_2d(msp)
    fac16 = compress_factorization(fac)
    rng = np.random.default_rng(0)
    b = jnp.asarray(
        (rng.standard_normal(grid.size) + 1j * rng.standard_normal(grid.size))
        .astype(np.complex64)
    )
    x_full = np.asarray(block_thomas_solve(fac, b))
    x_16 = np.asarray(block_thomas_solve(fac16, b))
    rel = np.linalg.norm(x_16 - x_full) / np.linalg.norm(x_full)
    assert rel < 0.05, f"bf16 pivot solve too inaccurate: {rel}"


def test_bf16_slab_sweep_preconditions():
    grid = Grid2D(a=1.0, h=1.0 / 36.0)
    k = 1.0 / grid.h
    X, Y = grid.mesh()
    nu = media.gaussian_bump_2d(X, Y)
    a_st, ag_st = stencils.build_sparse_a_ag_2d(
        k, grid.x, grid.y, grid.h, dtype=jnp.complex64
    )
    msp = stencils.build_msp_2d(a_st, ag_st, nu, k)
    slabs = build_slab_system(
        a_st, ag_st, nu, grid.x, grid.y, grid.h, k, 3, npml=6,
        pivot_dtype="bf16",
    )
    rng = np.random.default_rng(1)
    b = jnp.asarray(
        (rng.standard_normal(grid.size) + 1j * rng.standard_normal(grid.size))
        .astype(np.complex64)
    )
    x, info = gmres(msp.matvec, b, preconditioner=lambda v: gs_sweep(slabs, v),
                    rtol=1e-5, restart=20, maxiter=120)
    assert bool(info.converged)
    res = np.linalg.norm(np.asarray(msp.matvec(x) - b)) / np.linalg.norm(
        np.asarray(b)
    )
    assert res < 1e-3
