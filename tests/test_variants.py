"""Preconditioner variants (Jacobi sweep, inner-GMRES composites),
quadrature toolbox, and checkpoint utilities."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from fast_solver_lippmann_schwinger_tpu.core.grids import Grid2D
from fast_solver_lippmann_schwinger_tpu.ddm.subdomain import build_slab_system
from fast_solver_lippmann_schwinger_tpu.ddm.sweeps import (
    DoubleSweepPreconditioner,
    GSPreconditioner,
    InnerGMRESPreconditioner,
    jacobi_sweep,
)
from fast_solver_lippmann_schwinger_tpu.models import media
from fast_solver_lippmann_schwinger_tpu.solver import quadratures as quad
from fast_solver_lippmann_schwinger_tpu.solver.gmres import gmres
from fast_solver_lippmann_schwinger_tpu.sparse import stencils


@pytest.fixture(scope="module")
def small_ddm():
    grid = Grid2D(a=1.0, h=1.0 / 48.0)
    k = 1.0 / grid.h
    X, Y = grid.mesh()
    nu = media.gaussian_bump_2d(X, Y)
    a_st, ag_st = stencils.build_sparse_a_ag_2d(
        k, grid.x, grid.y, grid.h, dtype=jnp.complex128
    )
    msp = stencils.build_msp_2d(a_st, ag_st, nu, k)
    slabs = build_slab_system(
        a_st, ag_st, nu, grid.x, grid.y, grid.h, k, 3, npml=6
    )
    return grid, k, nu, a_st, ag_st, msp, slabs


def test_jacobi_sweep_preconditions(small_ddm):
    grid, k, nu, a_st, ag_st, msp, slabs = small_ddm
    rng = np.random.default_rng(0)
    b = jnp.asarray(
        rng.standard_normal(grid.size) + 1j * rng.standard_normal(grid.size)
    )
    x, info = gmres(
        msp.matvec, b, preconditioner=lambda v: jacobi_sweep(slabs, v),
        rtol=1e-8, restart=20, maxiter=120,
    )
    assert bool(info.converged)
    res = np.linalg.norm(np.asarray(msp.matvec(x) - b)) / np.linalg.norm(
        np.asarray(b)
    )
    assert res < 1e-6


def test_inner_gmres_preconditioner(small_ddm):
    grid, k, nu, a_st, ag_st, msp, slabs = small_ddm
    precond = InnerGMRESPreconditioner(
        msp=msp, a_s=a_st, sweep=GSPreconditioner(slabs), max_iter=10, tol=1e-4
    )
    from fast_solver_lippmann_schwinger_tpu.ops.fastconv import (
        build_fast_convolution_2d,
    )

    X, Y = grid.mesh()
    op = build_fast_convolution_2d(
        grid.x, grid.y, grid.h, k, nu, quad_rule="greengard_vico",
        dtype=jnp.complex128,
    )
    u_inc = jnp.asarray(np.exp(1j * k * X.ravel()))
    rhs = -(op.apply(u_inc) - u_inc)
    u, info = gmres(op.apply, rhs, preconditioner=precond.apply,
                    rtol=1e-8, restart=20, maxiter=60)
    assert bool(info.converged)
    res = np.linalg.norm(np.asarray(op.apply(u) - rhs)) / np.linalg.norm(
        np.asarray(rhs)
    )
    assert res < 1e-3


def test_gauss_legendre_integrates_polynomials():
    x, w = quad.gauss_legendre(8)
    # exact for polynomials up to degree 15
    for p in range(16):
        got = np.sum(w * x ** p)
        exact = 0.0 if p % 2 else 2.0 / (p + 1)
        np.testing.assert_allclose(got, exact, atol=1e-13)
    # interval mapping
    x2, w2 = quad.gauss_legendre(8, 0.0, 2.0)
    np.testing.assert_allclose(np.sum(w2 * x2 ** 3), 4.0, atol=1e-12)


def test_legendre_q_values():
    # Q_0(2) = 0.5 ln 3; Q_1(2) = ln(3) - 1
    q = quad.legendre_q(3, 2.0)
    np.testing.assert_allclose(q[0], 0.5 * np.log(3.0))
    np.testing.assert_allclose(q[1], np.log(3.0) - 1.0)


def test_modified_log_weights():
    """Modified weights integrate f(x) * 0.5*log((y-x)^2) exactly for smooth
    f — check against adaptive quadrature."""
    from scipy.integrate import quad as sciquad

    y = 1.5
    x, w = quad.gauss_legendre(24)
    wlog = quad.modified_weights_log(w, x, y)
    f = lambda t: np.exp(t)
    got = np.sum(wlog * f(x))
    exact, _ = sciquad(lambda t: f(t) * 0.5 * np.log((y - t) ** 2), -1, 1)
    np.testing.assert_allclose(got, exact, rtol=1e-8)


def test_modified_pv_weights():
    from scipy.integrate import quad as sciquad

    y = 1.5  # outside the interval: plain integral, no PV needed
    x, w = quad.gauss_legendre(24)
    wpv = quad.modified_weights_pv(w, x, y)
    f = lambda t: np.cos(t)
    got = np.sum(wpv * f(x))
    exact, _ = sciquad(lambda t: f(t) / (y - t), -1, 1)
    np.testing.assert_allclose(got, exact, rtol=1e-8)


def test_legendre_interp_matrix():
    x, w = quad.gauss_legendre(16)
    s = np.linspace(-0.9, 0.9, 11)
    mat = quad.legendre_interp_matrix(s, x, w)
    f = lambda t: np.sin(3 * t) + t ** 2
    np.testing.assert_allclose(mat @ f(x), f(s), atol=1e-9)


def test_checkpoint_roundtrip(tmp_path, small_ddm):
    from fast_solver_lippmann_schwinger_tpu.utils import checkpoint

    grid, k, nu, a_st, ag_st, msp, slabs = small_ddm
    path = os.path.join(tmp_path, "a_st.npz")
    checkpoint.save_arrays(path, a_st, kind="a_st")
    loaded = checkpoint.load_arrays(path, like=a_st)
    np.testing.assert_allclose(
        np.asarray(loaded.values), np.asarray(a_st.values)
    )
    assert checkpoint.load_arrays(os.path.join(tmp_path, "nope.npz")) is None


def test_compute_weights_integrates_singular_families():
    """Generalized weights from compute_weights integrate smooth-times-
    singular integrands (reference ``computeweights``, quadratures.jl:135)."""
    from scipy.integrate import quad as sciquad

    y = 1.3
    m = 12
    x, w = quad.gauss_legendre(m)
    wmod = quad.compute_weights(m, x, w, y)
    f = lambda t: np.exp(t)
    kernels = (lambda t: 1.0 + 0 * t,
               lambda t: np.log(np.abs(y - t)),
               lambda t: 1.0 / (y - t))
    for kern in kernels:
        exact, _ = sciquad(lambda t: f(t) * kern(t), -1, 1)
        got = np.sum(wmod * f(x) * kern(x))
        np.testing.assert_allclose(got, exact, rtol=1e-6)


def test_eval_generalized_moments_matches_plain_rule():
    m = 8
    x, w = quad.gauss_legendre(m)
    y = 2.0
    mom = quad.eval_generalized_moments(m, y, x, w)
    phi = quad.eval_phi(m, y, x)
    np.testing.assert_allclose(mom, phi @ w, atol=1e-14)
    # plain block: Legendre orthogonality -> first moment 2, rest ~0
    np.testing.assert_allclose(mom[0], 2.0, atol=1e-12)
    np.testing.assert_allclose(mom[1:m], 0.0, atol=1e-12)


def test_npml_below_five_rejected(small_ddm):
    """The absorbing-profile knots need >= 5 layers; below that the slab
    builder must fail loudly instead of producing a silently broken cutoff."""
    grid, k, nu, a_st, ag_st, msp, slabs = small_ddm
    with pytest.raises(ValueError, match="npml"):
        build_slab_system(
            a_st, ag_st, nu, grid.x, grid.y, grid.h, k, 3, npml=4
        )


def test_prefer_pow2_is_an_explicit_knob():
    """FFT size class must be pinnable independently of the current backend
    (artifacts built on CPU for a TPU run must be able to pick pow2)."""
    from fast_solver_lippmann_schwinger_tpu.ops import greens

    assert greens.good_fft_size(1601, prefer_pow2=True) == 2048
    s5 = greens.good_fft_size(1601, prefer_pow2=False)
    assert s5 >= 1601
    x = s5
    for p in (2, 3, 5):
        while x % p == 0:
            x //= p
    assert x == 1, f"{s5} is not 5-smooth"


def test_double_sweep_mixed_pivot_t():
    """pivot_dtype_t: a lower-precision transposed (x) sweep still
    preconditions to convergence (measured 801-scale trade in RESULTS.md)."""
    import jax.numpy as jnp
    import numpy as np

    from fast_solver_lippmann_schwinger_tpu.models import plasma2d
    from fast_solver_lippmann_schwinger_tpu.utils.host import fetch

    problem = plasma2d.build_problem(
        h=1.0 / 100.0, n_subdomains=2, npml=8, dtype=jnp.complex64,
        pivot_dtype="bf16", pivot_dtype_t="banded_tail",
    )
    u, info = plasma2d.solve(problem, rtol=1e-6, restart=20, maxiter=40)
    assert np.isfinite(fetch(u)).all()
    assert bool(fetch(info.converged)[()])
