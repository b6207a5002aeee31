"""Banded pivot storage: the accuracy/iteration trade pinned in CI.

``pivot_dtype="banded"`` keeps only the central ``w`` diagonals of each
pivot inverse (``sparse/direct.py:compress_factorization_banded``).  The
truncation perturbs only the preconditioner, so the quality metric is the
OUTER GMRES iteration count on a real scattering solve — pinned here at a
mid-size plasma config against the full-precision path (the sweep-through
of widths lives in ``benchmarks/banded_quality.py``).
"""

import jax.numpy as jnp
import numpy as np

from fast_solver_lippmann_schwinger_tpu.models import plasma2d
from fast_solver_lippmann_schwinger_tpu.utils.host import fetch


def _iters(pivot_dtype, pivot_band=None):
    problem = plasma2d.build_problem(
        h=1.0 / 100.0, n_subdomains=4, npml=8, dtype=jnp.complex64,
        pivot_dtype=pivot_dtype, pivot_band=pivot_band,
    )
    u, info = plasma2d.solve(problem, rtol=1e-6, restart=20, maxiter=40)
    assert np.isfinite(fetch(u)).all()
    return int(fetch(info.n_iterations)[()]), bool(fetch(info.converged)[()])


def test_banded_pivot_quality():
    """A generous band (w ~ n/2) must stay within a couple of outer
    iterations of full pivots; pivot inverses of interior slabs decay
    away from the diagonal thanks to the absorbing extensions."""
    it_full, conv_full = _iters("full")
    assert conv_full
    it_band, conv_band = _iters("banded", pivot_band=51)
    assert conv_band, "banded(51) failed to converge where full converged"
    assert it_band <= it_full + 3, (
        f"banded(51) quality regressed: {it_band} vs full {it_full} iters"
    )


def test_banded_tail_pivot_quality():
    """The tail-dense hybrid (full bf16 planes on the near-interface lines,
    band elsewhere) must match the full-pivot iteration class — the dense
    tail removes the exponential error amplification that kills uniform
    banding/band+low-rank at scale (RESULTS.md round 4)."""
    it_full, conv_full = _iters("full")
    it_ht, conv_ht = _iters("banded_tail", pivot_band=51)
    assert conv_ht, "banded_tail(51) failed to converge"
    assert it_ht <= it_full + 2, (
        f"banded_tail(51) quality: {it_ht} vs full {it_full} iters"
    )


def test_banded_tail_solve_matches_bf16_class():
    """Full-width tail-dense hybrid == bf16-class solve error, and the
    cached/resume fast path stays bit-identical to its own full solve."""
    import jax.numpy as jnp
    import numpy as np

    from fast_solver_lippmann_schwinger_tpu.core.grids import Grid2D
    from fast_solver_lippmann_schwinger_tpu.models import media
    from fast_solver_lippmann_schwinger_tpu.sparse import stencils
    from fast_solver_lippmann_schwinger_tpu.sparse.direct import (
        block_thomas_solve,
        block_thomas_solve_cached,
        block_thomas_solve_resume,
        compress_factorization_banded_tail,
        factor_stencil_2d,
    )

    grid = Grid2D(a=1.0, h=1.0 / 30.0)
    k = 1.0 / grid.h
    X, Y = grid.mesh()
    nu = media.gaussian_bump_2d(X, Y)
    a_st, ag_st = stencils.build_sparse_a_ag_2d(
        k, grid.x, grid.y, grid.h, dtype=jnp.complex64
    )
    msp = stencils.build_msp_2d(a_st, ag_st, nu, k)
    fac = factor_stencil_2d(msp)
    m, n = grid.shape
    hyb = compress_factorization_banded_tail(fac, 2 * n - 1, 8)
    rng = np.random.default_rng(0)
    b = jnp.asarray(
        (rng.standard_normal((m, n)) + 1j * rng.standard_normal((m, n)))
        .astype(np.complex64)
    )
    x_full = np.asarray(block_thomas_solve(fac, b))
    x_h = np.asarray(block_thomas_solve(hyb, b))
    rel = np.linalg.norm(x_h - x_full) / np.linalg.norm(x_full)
    assert rel < 0.05, f"hybrid full-width solve error {rel}"

    _, y_c, t_c = block_thomas_solve_cached(hyb, b, tail=6)
    b2 = b.at[m - 3].add(1.0 + 0.5j)
    got = np.asarray(block_thomas_solve_resume(hyb, b2, y_c, t_c, 5))
    want = np.asarray(block_thomas_solve(hyb, b2))
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-6)


def test_banded_tail_width_rule_at_scale():
    """``pivot_band=None`` must pick the measured w(n) rule
    (``default_band_width``: ~n/4, odd, floor 33) and hold iteration
    quality at a production-like n — the failure mode this guards is a
    user carrying a small-n width to a larger grid, where iterations blow
    up silently (w=101 fine at n=201, need ~201 at n=801; RESULTS.md)."""
    from fast_solver_lippmann_schwinger_tpu.sparse.direct import (
        default_band_width,
    )

    assert default_band_width(801) >= 201 - 2
    assert default_band_width(201) <= 101
    assert default_band_width(16) == 33 or default_band_width(16) == 31

    # production-like slab height (~60 lines, matching the 801/16-slab
    # bench geometry).  Measured 2026-08: bf16 = 22 iterations here,
    # banded_tail(rule) = 16 — the hybrid actually converges FASTER (full
    # bf16 stalls on complex64 GMRES plateaus at this config).  NOTE the
    # measured caveat: at TALL slabs (4 subdomains at 401^2, ~116 lines)
    # banded_tail pays +7 iterations over bf16 regardless of width — the
    # loss is recursion-depth amplification, not band truncation.
    problem = plasma2d.build_problem(
        h=1.0 / 400.0, n_subdomains=8, npml=8, dtype=jnp.complex64,
        pivot_dtype="banded_tail", pivot_band=None,
    )
    u, info = plasma2d.solve(problem, rtol=1e-5, restart=20, maxiter=40)
    assert np.isfinite(fetch(u)).all()
    its = int(fetch(info.n_iterations)[()])
    assert bool(fetch(info.converged)[()]), (
        f"banded_tail(width=None) at 401^2 failed to converge in {its}"
    )
    assert its <= 26, f"banded_tail width-rule quality at 401^2: {its} iters"


def test_banded_lr_pivot_quality():
    """Band + low-rank correction must not regress beyond pure banding at
    a NARROWER band (that's its purpose: the rank term picks up the
    non-decaying off-band component)."""
    it_full, conv_full = _iters("full")
    it_lr, conv_lr = _iters("banded_lr", pivot_band=31)
    assert conv_lr, "banded_lr(31, r=16) failed to converge"
    assert it_lr <= it_full + 6, (
        f"banded_lr(31) quality: {it_lr} vs full {it_full} iters"
    )


def test_banded_lr_wide_band_matches_bf16_class():
    """At generous width/rank the banded_lr solve error sits in the bf16
    class (its storage precision)."""
    import jax.numpy as jnp
    import numpy as np

    from fast_solver_lippmann_schwinger_tpu.core.grids import Grid2D
    from fast_solver_lippmann_schwinger_tpu.models import media
    from fast_solver_lippmann_schwinger_tpu.sparse import stencils
    from fast_solver_lippmann_schwinger_tpu.sparse.direct import (
        block_thomas_solve,
        compress_factorization_banded_lr,
        factor_stencil_2d,
    )

    grid = Grid2D(a=1.0, h=1.0 / 30.0)
    k = 1.0 / grid.h
    X, Y = grid.mesh()
    nu = media.gaussian_bump_2d(X, Y)
    a_st, ag_st = stencils.build_sparse_a_ag_2d(
        k, grid.x, grid.y, grid.h, dtype=jnp.complex64
    )
    msp = stencils.build_msp_2d(a_st, ag_st, nu, k)
    fac = factor_stencil_2d(msp)
    n = grid.shape[1]
    fac_lr = compress_factorization_banded_lr(fac, 2 * n - 1, 8)
    rng = np.random.default_rng(0)
    b = jnp.asarray(
        (rng.standard_normal(grid.size) + 1j * rng.standard_normal(grid.size))
        .astype(np.complex64)
    )
    x_full = np.asarray(block_thomas_solve(fac, b))
    x_lr = np.asarray(block_thomas_solve(fac_lr, b))
    rel = np.linalg.norm(x_lr - x_full) / np.linalg.norm(x_full)
    assert rel < 0.05, f"banded_lr full-width solve error {rel}"
