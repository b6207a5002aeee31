"""Sparsifying stencil construction, stencil matvec, and the block-Thomas
direct solver, cross-checked against dense oracles."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fast_solver_lippmann_schwinger_tpu.core.grids import Grid2D
from fast_solver_lippmann_schwinger_tpu.models import media
from fast_solver_lippmann_schwinger_tpu.ops import greens
from fast_solver_lippmann_schwinger_tpu.ops.fastconv import build_fast_convolution_2d
from fast_solver_lippmann_schwinger_tpu.sparse.direct import (
    block_thomas_solve,
    factor_stencil_2d,
)
from fast_solver_lippmann_schwinger_tpu.sparse.stencil_matrix import StencilMatrix2D
from fast_solver_lippmann_schwinger_tpu.sparse import stencils


@pytest.fixture(scope="module")
def problem():
    grid = Grid2D(a=1.0, h=1.0 / 24.0)
    k = 1.0 / grid.h
    X, Y = grid.mesh()
    nu = media.gaussian_bump_2d(X, Y)
    a_st, ag_st = stencils.build_sparse_a_ag_2d(
        k, grid.x, grid.y, grid.h, dtype=jnp.complex128
    )
    return grid, k, X, Y, nu, a_st, ag_st


def test_stencil_matvec_matches_dense(problem):
    grid, k, X, Y, nu, a_st, ag_st = problem
    dense = a_st.to_dense()
    rng = np.random.default_rng(0)
    u = rng.standard_normal(grid.size) + 1j * rng.standard_normal(grid.size)
    np.testing.assert_allclose(
        np.asarray(a_st.matvec(jnp.asarray(u))), dense @ u, rtol=1e-12, atol=1e-14
    )


def test_annihilator_quality(problem):
    """Rows of A applied to G vanish away from the stencil: || A G - AG ||
    restricted off-stencil must be small relative to ||G|| rows."""
    grid, k, X, Y, nu, a_st, ag_st = problem
    d0 = greens.duan_rokhlin_d0(k * grid.h)
    G = greens.dense_conv_matrix_2d(k, X.ravel(), Y.ravel(), d0, grid.h)
    A = a_st.to_dense()
    AG_true = A @ G
    AG_sparse = ag_st.to_dense()
    # off-pattern residual: AG_true minus its sparse approximation
    resid = AG_true - AG_sparse
    rel = np.linalg.norm(resid) / np.linalg.norm(AG_true)
    assert rel < 0.15  # annihilation quality of the 3x3 stencil (coarse grid)


def test_device_gram_matches_host_svd():
    """The device-Gram annihilator path (``build_annihilator_classes_conv``)
    must agree with the explicit host SVD of the sampled far-field rows up
    to the per-class SVD phase gauge."""
    from fast_solver_lippmann_schwinger_tpu.ops.fastconv import (
        sample_g_columns,
    )

    grid = Grid2D(a=1.0, h=1.0 / 20.0)
    k = 1.0 / grid.h
    X, Y = grid.mesh()
    nu = media.gaussian_bump_2d(X, Y)
    op = build_fast_convolution_2d(
        grid.x, grid.y, grid.h, k, nu, quad_rule="greengard_vico",
        dtype=jnp.complex128,
    )
    got = stencils.build_annihilator_classes_conv(op, grid.shape)

    def host_sampler(idx):
        return np.asarray(sample_g_columns(op, idx)).astype(np.complex128)

    want = stencils.build_annihilator_classes(host_sampler, grid.shape)
    assert len(got) == len(want) == 9
    for g, w in zip(got, want):
        assert g["cats"] == w["cats"]
        # align the arbitrary phase on the largest-magnitude entry
        i = int(np.argmax(np.abs(w["a_row"])))
        phase = w["a_row"][i] / g["a_row"][i]
        assert abs(abs(phase) - 1.0) < 1e-8
        np.testing.assert_allclose(
            g["a_row"] * phase, w["a_row"], rtol=0, atol=1e-8
        )
        np.testing.assert_allclose(
            g["ag_row"] * phase, w["ag_row"], rtol=0,
            atol=1e-8 * np.max(np.abs(w["ag_row"])),
        )


def test_device_gram_complex64_annihilator_quality():
    """The device path forms the far-field Gram ``G G^H - G_n G_n^H`` in the
    OPERATOR dtype (complex64 on TPU), squaring the conditioning before the
    host ``eigh`` (advisor finding, round 4).  Pin the consequence that
    matters: the c64-Gram annihilator's far-field annihilation residual
    must stay within a small factor of the complex128 host-SVD
    annihilator's at a mid-size grid."""
    from fast_solver_lippmann_schwinger_tpu.ops.fastconv import (
        sample_g_columns,
    )

    grid = Grid2D(a=1.0, h=1.0 / 40.0)
    k = 1.0 / grid.h
    X, Y = grid.mesh()
    nu = media.gaussian_bump_2d(X, Y)

    op64 = build_fast_convolution_2d(
        grid.x, grid.y, grid.h, k, nu, quad_rule="greengard_vico",
        dtype=jnp.complex64,
    )
    got64 = stencils.build_annihilator_classes_conv(op64, grid.shape)

    op128 = build_fast_convolution_2d(
        grid.x, grid.y, grid.h, k, nu, quad_rule="greengard_vico",
        dtype=jnp.complex128,
    )

    def host_sampler(idx):
        return np.asarray(sample_g_columns(op128, idx)).astype(np.complex128)

    want128 = stencils.build_annihilator_classes(host_sampler, grid.shape)

    # exact far-field rows per class in complex128 for the quality metric
    class_defs = stencils._class_defs(grid.shape)
    N = grid.size
    for (cats, offsets, flat), g64, w128 in zip(class_defs, got64, want128):
        assert g64["cats"] == tuple(cats) or g64["cats"] == cats
        g_rows = host_sampler(np.asarray(flat))
        far = np.ones(N, dtype=bool)
        far[flat] = False
        W = g_rows[:, far]

        def resid(a_row):
            a = np.asarray(a_row, np.complex128)
            a = a / np.linalg.norm(a)
            return np.linalg.norm(np.conj(a) @ W) / np.linalg.norm(W)

        r64, r128 = resid(g64["a_row"]), resid(w128["a_row"])
        # c64 Gram squaring costs at most a modest constant in achieved
        # annihilation at this scale — this is the measured quality record
        assert r64 <= max(5.0 * r128, 5e-5), (
            f"class {cats}: c64-Gram annihilator residual {r64:.3e} "
            f"vs c128 host-SVD {r128:.3e}"
        )


def test_ag_matches_a_times_g_on_pattern(problem):
    """On the stencil pattern, AG entries must equal (A G) exactly."""
    grid, k, X, Y, nu, a_st, ag_st = problem
    d0 = greens.duan_rokhlin_d0(k * grid.h)
    G = greens.dense_conv_matrix_2d(k, X.ravel(), Y.ravel(), d0, grid.h)
    A = a_st.to_dense()
    AG_true = A @ G
    AG_sparse = ag_st.to_dense()
    pattern = np.abs(AG_sparse) > 0
    np.testing.assert_allclose(
        AG_sparse[pattern], AG_true[pattern], rtol=1e-8, atol=1e-12
    )


def test_scale_columns_matches_dense(problem):
    grid, k, X, Y, nu, a_st, ag_st = problem
    dense = ag_st.to_dense()
    scaled = ag_st.scale_columns(jnp.asarray(nu))
    np.testing.assert_allclose(
        scaled.to_dense(), dense @ np.diag(nu.ravel()), rtol=1e-12, atol=1e-14
    )


def test_transpose_matches_permuted_dense(problem):
    grid, k, X, Y, nu, a_st, ag_st = problem
    m, n = grid.m, grid.n
    N = m * n
    dense = a_st.to_dense()
    # permutation flat[j*n+i] -> flat[i*m+j]
    perm = np.arange(N).reshape(m, n).T.ravel()
    P = np.eye(N)[perm]
    np.testing.assert_allclose(
        a_st.transpose().to_dense(), P @ dense @ P.T, rtol=1e-12, atol=1e-14
    )


def test_block_thomas_matches_dense_solve(problem):
    grid, k, X, Y, nu, a_st, ag_st = problem
    msp = stencils.build_msp_2d(a_st, ag_st, nu, k)
    dense = msp.to_dense()
    rng = np.random.default_rng(1)
    b = rng.standard_normal(grid.size) + 1j * rng.standard_normal(grid.size)
    x_dense = np.linalg.solve(dense, b)
    fac = factor_stencil_2d(msp)
    x = np.asarray(block_thomas_solve(fac, jnp.asarray(b)))
    np.testing.assert_allclose(x, x_dense, rtol=1e-7, atol=1e-9)


def test_block_thomas_multi_rhs(problem):
    grid, k, X, Y, nu, a_st, ag_st = problem
    msp = stencils.build_msp_2d(a_st, ag_st, nu, k)
    fac = factor_stencil_2d(msp)
    rng = np.random.default_rng(2)
    B = rng.standard_normal((grid.size, 3)) + 1j * rng.standard_normal((grid.size, 3))
    X_multi = np.asarray(block_thomas_solve(fac, jnp.asarray(B)))
    for r in range(3):
        x_single = np.asarray(block_thomas_solve(fac, jnp.asarray(B[:, r])))
        np.testing.assert_allclose(X_multi[:, r], x_single, rtol=1e-9, atol=1e-11)


def test_block_thomas_resume_matches_full(problem):
    """Resuming the forward pass from cached (y, t) stacks is bit-identical
    to a fresh solve when the rhs only changes on the last lines."""
    from fast_solver_lippmann_schwinger_tpu.sparse.direct import (
        block_thomas_solve_cached,
        block_thomas_solve_resume,
    )

    grid, k, X, Y, nu, a_st, ag_st = problem
    msp = stencils.build_msp_2d(a_st, ag_st, nu, k)
    fac = factor_stencil_2d(msp)
    m, n = grid.shape
    rng = np.random.default_rng(3)
    b = jnp.asarray(rng.standard_normal((m, n)) + 1j * rng.standard_normal((m, n)))
    _, y_c, t_c = block_thomas_solve_cached(fac, b, tail=4)
    b2 = b.at[m - 3].add(1.0 + 0.5j)
    got = block_thomas_solve_resume(fac, b2, y_c, t_c, resume=5)
    want = block_thomas_solve(fac, b2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-12)


def test_banded_pivot_full_width_matches(problem):
    """Band compression at full width w = 2n-1 only loses bf16 rounding."""
    from fast_solver_lippmann_schwinger_tpu.sparse.direct import (
        compress_factorization_banded,
    )

    grid, k, X, Y, nu, a_st, ag_st = problem
    msp = stencils.build_msp_2d(a_st, ag_st, nu, k)
    fac = factor_stencil_2d(msp)
    n = grid.shape[1]
    fac_b = compress_factorization_banded(fac, 2 * n - 1)
    rng = np.random.default_rng(4)
    b = jnp.asarray(rng.standard_normal(grid.size)
                    + 1j * rng.standard_normal(grid.size))
    got = np.asarray(block_thomas_solve(fac_b, b))
    want = np.asarray(block_thomas_solve(fac, b))
    err = np.linalg.norm(got - want) / np.linalg.norm(want)
    assert err < 5e-2  # bf16 pivots


def test_stencil_multi_rhs_and_coo(problem):
    """Multi-RHS stencil apply (MKL cscmm counterpart) and COO export
    (createIndices counterpart) against the dense oracle."""
    import scipy.sparse as sp

    grid, k, X, Y, nu, a_st, ag_st = problem
    dense = a_st.to_dense()
    rng = np.random.default_rng(7)
    U = rng.standard_normal((grid.size, 3)) + 1j * rng.standard_normal(
        (grid.size, 3)
    )
    got = np.asarray(a_st.matvec(jnp.asarray(U)))
    np.testing.assert_allclose(got, dense @ U, rtol=1e-12, atol=1e-14)

    rows, cols, vals = a_st.to_coo()
    coo = sp.coo_matrix((vals, (rows, cols)), shape=dense.shape).toarray()
    np.testing.assert_allclose(coo, dense, rtol=1e-13, atol=1e-15)
