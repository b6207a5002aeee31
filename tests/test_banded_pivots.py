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
