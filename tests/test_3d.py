"""3D pipeline tests on tiny grids (scaled-down ``examples/example3D.jl``)."""

import jax.numpy as jnp
import numpy as np
import pytest

from fast_solver_lippmann_schwinger_tpu.core.grids import Grid3D
from fast_solver_lippmann_schwinger_tpu.models import bump3d, media
from fast_solver_lippmann_schwinger_tpu.ops.fastconv import (
    build_fast_convolution_3d,
    sample_g_columns,
)
from fast_solver_lippmann_schwinger_tpu.sparse import stencils
from fast_solver_lippmann_schwinger_tpu.sparse.direct import (
    block_thomas_solve_3d,
    factor_stencil_3d,
)


def test_3d_convolution_against_free_space_solution():
    """G conv (gaussian) must approximate the analytic outgoing Helmholtz
    solution for a Gaussian source (the reference ships this oracle as
    ``solRefHelmholtz``, ``src/Functions.jl:32-36``, but never calls it)."""
    from scipy.special import erf

    grid = Grid3D(a=1.0, h=1.0 / 16.0)
    k = 1.0 / grid.h
    X, Y, Z = grid.mesh()
    sigma = 0.05
    src = np.exp(-(X ** 2 + Y ** 2 + Z ** 2) / (2 * sigma ** 2))

    op = build_fast_convolution_3d(
        grid.x, grid.x, grid.x, grid.h, k, lambda x, y, z: 0.0 * x,
        dtype=jnp.complex128,
    )
    u = np.asarray(op.convolve(jnp.asarray(src.ravel(), jnp.complex128)))

    r = np.sqrt(X ** 2 + Y ** 2 + Z ** 2).ravel()
    mask = (r > 0.25) & (np.abs(X.ravel()) < 0.4) & (np.abs(Y.ravel()) < 0.4) \
        & (np.abs(Z.ravel()) < 0.4)
    # closed form: (2 pi sigma^2)^{3/2} * standard Gaussian-source solution
    amp = (2 * np.pi * sigma ** 2) ** 1.5
    rr = r[mask]
    uref = amp * (np.exp(-sigma ** 2 * k ** 2 / 2) / (4 * np.pi * rr)) * (
        np.real(
            np.exp(-1j * k * rr)
            * erf((2 * sigma ** 2 * 1j * k - 2 * rr) / (2 * np.sqrt(2 * sigma ** 2)))
        )
        - 1j * np.sin(k * rr)
    )
    got = u[mask]
    # the discrete kernel uses the opposite Green's-function sign convention
    # from the (never-invoked) reference formula: compare against -uref
    rel = np.linalg.norm(got + uref) / np.linalg.norm(uref)
    assert rel < 5e-3, f"free-space 3D solution mismatch: rel={rel}"


@pytest.fixture(scope="module")
def small3d():
    grid = Grid3D(a=1.0, h=1.0 / 10.0)
    k = 1.0 / grid.h
    X, Y, Z = grid.mesh()
    nu = media.gaussian_bump_3d(X, Y, Z)
    op = build_fast_convolution_3d(
        grid.x, grid.x, grid.x, grid.h, k, nu, dtype=jnp.complex128
    )
    return grid, k, nu, op


def test_3d_stencil_ag_consistency(small3d):
    grid, k, nu, op = small3d
    a_st, ag_st = stencils.build_sparse_a_ag_3d(k, op, dtype=jnp.complex128)
    # AG rows on-pattern must equal A G computed densely via impulses
    N = grid.size
    G = np.asarray(sample_g_columns(op, np.arange(N)))
    A = a_st.to_dense()
    AG_true = A @ G
    AG_sp = ag_st.to_dense()
    pattern = np.abs(AG_sp) > 0
    np.testing.assert_allclose(
        AG_sp[pattern], AG_true[pattern], rtol=1e-7, atol=1e-11
    )


def test_3d_block_thomas_matches_dense(small3d):
    grid, k, nu, op = small3d
    a_st, ag_st = stencils.build_sparse_a_ag_3d(k, op, dtype=jnp.complex128)
    msp = stencils.build_msp_3d(a_st, ag_st, nu, k)
    dense = msp.to_dense()
    rng = np.random.default_rng(0)
    b = rng.standard_normal(grid.size) + 1j * rng.standard_normal(grid.size)
    x_ref = np.linalg.solve(dense, b)
    fac = factor_stencil_3d(msp)
    x = np.asarray(block_thomas_solve_3d(fac, jnp.asarray(b)))
    np.testing.assert_allclose(x, x_ref, rtol=1e-7, atol=1e-9)


def test_3d_end_to_end_preconditioned(small3d):
    problem = bump3d.build_problem(h=1.0 / 10.0, dtype=jnp.complex128)
    u, info = bump3d.solve(problem, rtol=1e-8)
    assert bool(info.converged)
    assert int(info.n_iterations) <= 25
    res = np.linalg.norm(
        np.asarray(problem.op.apply(u) - problem.rhs)
    ) / np.linalg.norm(np.asarray(problem.rhs))
    assert res < 1e-6
