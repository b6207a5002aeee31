"""Checkpoint/resume of expensive setup artifacts (SURVEY.md section 5).

The reference rebuilds everything each run; here the GFFT symbol, the
annihilator stencil fields, and the slab factorizations are all config-keyed
npz checkpoints, and a second build with the same configuration must load
bit-identical artifacts without recomputing.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from fast_solver_lippmann_schwinger_tpu.core.grids import Grid2D
from fast_solver_lippmann_schwinger_tpu.models import media, plasma2d
from fast_solver_lippmann_schwinger_tpu.ops.fastconv import (
    build_fast_convolution_2d,
)
from fast_solver_lippmann_schwinger_tpu.utils.host import fetch


def _build(pivot, cache_dir):
    return plasma2d.build_problem(
        h=1.0 / 40.0, n_subdomains=3, npml=5, dtype=jnp.complex128,
        double_sweep=False, pivot_dtype=pivot, cache_dir=cache_dir,
    )


@pytest.mark.parametrize("pivot", ["full", "bf16", "pallas"])
def test_slab_factorization_roundtrip(tmp_path, pivot):
    cache = str(tmp_path / "cache")
    p1 = _build(pivot, cache)
    p2 = _build(pivot, cache)  # second build loads the checkpoint

    f1, f2 = p1.precond.slabs.fac, p2.precond.slabs.fac
    assert f1.lband.dtype == f2.lband.dtype
    np.testing.assert_array_equal(fetch(f1.lband), fetch(f2.lband))
    if pivot == "full":
        np.testing.assert_array_equal(fetch(f1.cinv), fetch(f2.cinv))
    elif pivot == "bf16":
        np.testing.assert_array_equal(
            np.asarray(f1.cinv_re.astype(jnp.float32)),
            np.asarray(f2.cinv_re.astype(jnp.float32)),
        )
    else:
        q1, q2 = p1.precond.slabs.pfac, p2.precond.slabs.pfac
        assert q1.n == q2.n
        np.testing.assert_array_equal(
            np.asarray(q1.cinv_t_re.astype(jnp.float32)),
            np.asarray(q2.cinv_t_re.astype(jnp.float32)),
        )
        np.testing.assert_array_equal(
            np.asarray(q1.lband), np.asarray(q2.lband)
        )

    # loaded system solves identically
    rhs = np.exp(1j * np.linspace(0, 5, p1.grid.size))
    x1, _ = plasma2d.solve(p1, rtol=1e-6, maxiter=30)
    x2, _ = plasma2d.solve(p2, rtol=1e-6, maxiter=30)
    np.testing.assert_allclose(fetch(x1), fetch(x2), rtol=0, atol=0)


def test_pivot_mode_cache_isolation(tmp_path):
    """full and bf16 caches must not collide on the same config."""
    cache = str(tmp_path / "cache")
    p_full = _build("full", cache)
    p_bf16 = _build("bf16", cache)
    assert hasattr(p_full.precond.slabs.fac, "cinv")
    assert hasattr(p_bf16.precond.slabs.fac, "cinv_re")


def test_symbol_roundtrip(tmp_path):
    cache = str(tmp_path / "cache")
    grid = Grid2D(a=1.0, h=1.0 / 24.0)
    k = 24.0
    X, Y = grid.mesh()
    nu = media.gaussian_bump_2d(X, Y)
    kwargs = dict(quad_rule="greengard_vico", dtype=jnp.complex128,
                  cache_dir=cache)
    op1 = build_fast_convolution_2d(grid.x, grid.y, grid.h, k, nu, **kwargs)
    op2 = build_fast_convolution_2d(grid.x, grid.y, grid.h, k, nu, **kwargs)
    np.testing.assert_array_equal(fetch(op1.symbol), fetch(op2.symbol))
    # trapezoidal rule keys differently
    op3 = build_fast_convolution_2d(
        grid.x, grid.y, grid.h, k, nu, quad_rule="trapezoidal",
        dtype=jnp.complex128, cache_dir=cache,
    )
    assert not np.array_equal(fetch(op3.symbol), fetch(op1.symbol))
