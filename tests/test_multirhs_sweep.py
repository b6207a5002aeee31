"""Multi-RHS sweeps: trailing-RHS-column sweeps must match per-column
single-RHS sweeps exactly (XLA path) / to kernel rounding (Pallas path).

The point of the batch form is performance — the sweep local solves are
HBM-bound on streaming the pivot planes, and the multi-RHS contraction
streams each plane once for all columns (see ``DoubleSweepPreconditioner
.apply_batch``, the TPU-idiomatic replacement for the reference's serial
two-incident-direction loop, ``tests/plasma_example.jl:160,172``).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fast_solver_lippmann_schwinger_tpu.core.grids import Grid2D
from fast_solver_lippmann_schwinger_tpu.ddm.subdomain import (
    attach_pallas,
    build_slab_system,
)
from fast_solver_lippmann_schwinger_tpu.ddm.sweeps import (
    DoubleSweepPreconditioner,
    gs_sweep,
)
from fast_solver_lippmann_schwinger_tpu.models import media
from fast_solver_lippmann_schwinger_tpu.solver.gmres import gmres, gmres_batched
from fast_solver_lippmann_schwinger_tpu.sparse import pallas_thomas as pt
from fast_solver_lippmann_schwinger_tpu.sparse import stencils
from fast_solver_lippmann_schwinger_tpu.sparse.direct import (
    block_thomas_solve_cached,
    block_thomas_solve_resume,
    compress_factorization,
    factor_stencil_2d,
)
from fast_solver_lippmann_schwinger_tpu.sparse.stencil_matrix import StencilMatrix2D

N_SUBS = 3
NPML = 6
R = 3


def _relerr(a, b):
    return float(jnp.max(jnp.abs(a - b)) / jnp.max(jnp.abs(b)))


@pytest.fixture(scope="module")
def small_plasma():
    grid = Grid2D(a=1.0, h=1.0 / 60.0)
    k = 1.0 / grid.h
    X, Y = grid.mesh()
    nu = media.plasma_2d(X, Y)
    a_st, ag_st = stencils.build_sparse_a_ag_2d(
        k, grid.x, grid.y, grid.h, dtype=jnp.complex128
    )
    msp = stencils.build_msp_2d(a_st, ag_st, nu, k)
    slabs = build_slab_system(
        a_st, ag_st, nu, grid.x, grid.y, grid.h, k, N_SUBS, npml=NPML
    )
    slabs_t = build_slab_system(
        a_st.transpose(), ag_st.transpose(), np.asarray(nu).T,
        grid.y, grid.x, grid.h, k, N_SUBS, npml=NPML,
    )
    rng = np.random.default_rng(7)
    B = jnp.asarray(
        rng.standard_normal((grid.size, R))
        + 1j * rng.standard_normal((grid.size, R))
    )
    return grid, k, nu, a_st, msp, slabs, slabs_t, B


def test_gs_sweep_multirhs_matches_columns(small_plasma):
    _, _, _, _, _, slabs, _, B = small_plasma
    got = gs_sweep(slabs, B)
    assert got.shape == B.shape
    for r in range(R):
        ref = gs_sweep(slabs, B[:, r])
        assert _relerr(got[:, r], ref) < 1e-12


def test_jacobi_sweep_multirhs_matches_columns(small_plasma):
    from fast_solver_lippmann_schwinger_tpu.ddm.sweeps import jacobi_sweep

    _, _, _, _, _, slabs, _, B = small_plasma
    got = jacobi_sweep(slabs, B)
    assert got.shape == B.shape
    for r in range(R):
        ref = jacobi_sweep(slabs, B[:, r])
        assert _relerr(got[:, r], ref) < 1e-12


def test_polarized_apply_batch_matches_rows(small_plasma):
    """PolarizedTracesPreconditioner.apply_batch (trailing direction axis
    through the whole trace pipeline + one gmres_batched inner solve) ==
    per-row apply."""
    from fast_solver_lippmann_schwinger_tpu.ddm.polarized import (
        PolarizedTracesPreconditioner,
    )

    _, _, _, a_st, msp, slabs, _, B = small_plasma
    pc = PolarizedTracesPreconditioner(slabs=slabs, a_s=a_st, n_it=2)
    got = pc.apply_batch(B.T)                       # (R, N) convention
    for r in range(R):
        ref = pc.apply(B[:, r])
        assert _relerr(got[r], ref) < 1e-10


def test_double_sweep_apply_batch_matches_rows(small_plasma):
    _, _, _, a_st, msp, slabs, slabs_t, B = small_plasma
    pc = DoubleSweepPreconditioner(slabs=slabs, slabs_t=slabs_t, msp=msp,
                                   a_s=a_st)
    got = pc.apply_batch(B.T)                       # (R, N) convention
    for r in range(R):
        ref = pc.apply(B[:, r])
        assert _relerr(got[r], ref) < 1e-12


def test_gmres_batched_double_sweep_converges(small_plasma):
    grid, k, nu, a_st, msp, slabs, slabs_t, _ = small_plasma
    from fast_solver_lippmann_schwinger_tpu.ops.fastconv import (
        build_fast_convolution_2d,
    )

    op = build_fast_convolution_2d(
        grid.x, grid.y, grid.h, k, nu, quad_rule="greengard_vico",
        dtype=jnp.complex128,
    )
    pc = DoubleSweepPreconditioner(slabs=slabs, slabs_t=slabs_t, msp=msp,
                                   a_s=a_st)
    X, Y = grid.mesh()
    dirs = np.array([(1.0, 0.0), (0.0, 1.0)])
    phases = dirs[:, 0:1] * X.ravel()[None] + dirs[:, 1:2] * Y.ravel()[None]
    u_inc = jnp.asarray(np.exp(1j * k * phases))          # (2, N)
    rhs = -(jax.vmap(op.apply)(u_inc) - u_inc)
    Xs, info = gmres_batched(
        lambda V: jax.vmap(op.apply)(V), rhs,
        preconditioner=pc.apply_batch, rtol=1e-8, restart=20, maxiter=40,
    )
    assert bool(info.converged.all())
    for r in range(2):
        res = np.linalg.norm(np.asarray(op.apply(Xs[r]) - rhs[r]))
        res /= np.linalg.norm(np.asarray(rhs[r]))
        assert res < 1e-6
        # batched-joint solve must match the sequential solve's quality
        _, info_1 = gmres(op.apply, rhs[r], preconditioner=pc.apply,
                          rtol=1e-8, restart=20, maxiter=40)
        assert int(info.n_iterations[r]) <= int(info_1.n_iterations) + 1


def test_pallas_cached_resume_multirhs():
    """Multi-RHS solve_cached/solve_resume (interpret mode) match the XLA
    bf16 path column-by-column."""
    M, N = 12, 40
    rng = np.random.default_rng(3)
    vals = rng.standard_normal((2, M, N, 3, 3)) + 1j * rng.standard_normal(
        (2, M, N, 3, 3)
    )
    vals = vals.astype(np.complex64)
    vals[:, :, :, 1, 1] += 12.0
    facs = jax.vmap(lambda v: factor_stencil_2d(StencilMatrix2D(values=v)))(
        jnp.asarray(vals)
    )
    fac_bf = jax.vmap(compress_factorization)(facs)
    pfac = pt.build_pallas_factorization(facs)
    b = (
        rng.standard_normal((M, N, R)) + 1j * rng.standard_normal((M, N, R))
    ).astype(np.complex64)
    b = jnp.asarray(b)
    tail = 4

    def fac_at(fac, i):
        return jax.tree_util.tree_map(lambda a: a[i], fac)

    for s in (0, 1):
        x, y_c, t_c = pt.solve_cached(pfac, s, b, tail=tail)
        ref, _, _ = block_thomas_solve_cached(fac_at(fac_bf, s), b, tail)
        assert _relerr(x[-tail:], ref[-tail:]) < 5e-5

        # perturb the last `tail` lines and resume
        b2 = b.at[M - 2 :].add(1.0 + 0.5j)
        got = pt.solve_resume(pfac, s, b2, y_c, t_c, tail)
        _, y_r, t_r = block_thomas_solve_cached(fac_at(fac_bf, s), b, tail)
        ref2 = block_thomas_solve_resume(fac_at(fac_bf, s), b2, y_r, t_r, tail)
        assert _relerr(got, ref2) < 5e-5


def test_gs_sweep_pallas_multirhs():
    """Pallas-dispatch multi-RHS sweep == XLA bf16 multi-RHS sweep."""
    h = 1.0 / 40.0
    grid = Grid2D(a=1.0, h=h)
    k = 1.0 / h
    X, Y = grid.mesh()
    nu = media.gaussian_bump_2d(X, Y)
    a_st, ag_st, a_np, ag_np = stencils.build_sparse_a_ag_2d(
        k, grid.x, grid.y, h, dtype=jnp.complex64, return_host=True
    )
    slabs = build_slab_system(
        a_st, ag_st, nu, grid.x, grid.y, h, k, 3, npml=5,
        a_host=a_np, ag_host=ag_np, pivot_dtype="bf16",
    )
    slabs_pl = attach_pallas(slabs)
    rng = np.random.default_rng(5)
    B = jnp.asarray(
        (
            rng.standard_normal((grid.size, 2))
            + 1j * rng.standard_normal((grid.size, 2))
        ).astype(np.complex64)
    )
    u_ref = gs_sweep(slabs, B)
    u_pl = gs_sweep(slabs_pl, B)
    assert u_pl.shape == B.shape
    assert _relerr(u_pl, u_ref) < 1e-3
