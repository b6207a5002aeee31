"""Pallas stencil-matvec kernel vs the XLA reference path (interpret mode
on CPU; the same kernel compiles on TPU)."""

import jax.numpy as jnp
import numpy as np

from fast_solver_lippmann_schwinger_tpu.core.grids import Grid2D
from fast_solver_lippmann_schwinger_tpu.models import media
from fast_solver_lippmann_schwinger_tpu.ops.pallas_stencil import stencil_matvec_2d
from fast_solver_lippmann_schwinger_tpu.sparse import stencils


def test_pallas_stencil_matches_xla():
    grid = Grid2D(a=1.0, h=1.0 / 40.0)
    k = 1.0 / grid.h
    a_st, ag_st = stencils.build_sparse_a_ag_2d(
        k, grid.x, grid.y, grid.h, dtype=jnp.complex64
    )
    rng = np.random.default_rng(0)
    u = jnp.asarray(
        (rng.standard_normal(grid.size) + 1j * rng.standard_normal(grid.size))
        .astype(np.complex64)
    )
    ref = np.asarray(a_st.matvec(u))
    got = np.asarray(
        stencil_matvec_2d(a_st.values, u, block_rows=16, interpret=True)
    )
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-6)


def test_use_pallas_flag_dispatch():
    """``StencilMatrix2D(use_pallas=True)`` routes single-RHS matvecs through
    the kernel (interpret mode on CPU) and multi-RHS through the XLA path."""
    grid = Grid2D(a=1.0, h=1.0 / 40.0)
    k = 1.0 / grid.h
    a_st, _ = stencils.build_sparse_a_ag_2d(
        k, grid.x, grid.y, grid.h, dtype=jnp.complex64
    )
    a_pl = a_st.replace(use_pallas=True)
    rng = np.random.default_rng(2)
    u = jnp.asarray(
        (rng.standard_normal(grid.size) + 1j * rng.standard_normal(grid.size))
        .astype(np.complex64)
    )
    np.testing.assert_allclose(
        np.asarray(a_pl.matvec(u)), np.asarray(a_st.matvec(u)),
        rtol=2e-5, atol=2e-6,
    )
    u2 = jnp.stack([u, 2.0 * u], axis=-1)           # multi-RHS: XLA path
    np.testing.assert_allclose(
        np.asarray(a_pl.matvec(u2)), np.asarray(a_st.matvec(u2)),
        rtol=2e-5, atol=2e-6,
    )


def test_pallas_stencil_uneven_blocks():
    grid = Grid2D(a=1.0, h=1.0 / 30.0)   # 31 rows, not divisible by 8
    k = 1.0 / grid.h
    a_st, _ = stencils.build_sparse_a_ag_2d(
        k, grid.x, grid.y, grid.h, dtype=jnp.complex64
    )
    rng = np.random.default_rng(1)
    u = jnp.asarray(
        (rng.standard_normal(grid.size) + 1j * rng.standard_normal(grid.size))
        .astype(np.complex64)
    )
    ref = np.asarray(a_st.matvec(u))
    got = np.asarray(
        stencil_matvec_2d(a_st.values, u, block_rows=8, interpret=True)
    )
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-6)
