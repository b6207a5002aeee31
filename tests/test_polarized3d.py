"""3D polarized-traces (plane-trace integral system) tests — the capability
the reference only advertises (``examples/example3D_Polarized_traces.jl`` is
an empty duplicate; SURVEY.md section 2)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fast_solver_lippmann_schwinger_tpu.ddm import polarized3d
from fast_solver_lippmann_schwinger_tpu.ddm.subdomain3d import (
    build_slab_system_3d,
)
from fast_solver_lippmann_schwinger_tpu.models import media
from fast_solver_lippmann_schwinger_tpu.ops.fastconv import (
    build_fast_convolution_3d,
)
from fast_solver_lippmann_schwinger_tpu.solver.gmres import gmres
from fast_solver_lippmann_schwinger_tpu.sparse import stencils

NN = 17
K = 8.0
S = 3


@pytest.fixture(scope="module")
def setup():
    h = 1.0 / (NN - 1)
    x = np.linspace(0.0, 1.0, NN)
    Z, Y, X = np.meshgrid(x, x, x, indexing="ij")
    nu = media.gaussian_bump_3d(X, Y, Z)
    op = build_fast_convolution_3d(x, x, x, h, K, nu, dtype=jnp.complex128)
    a_st, ag_st = stencils.build_sparse_a_ag_3d(K, op, dtype=jnp.complex128)
    slabs = build_slab_system_3d(a_st, ag_st, nu, x, h, K, n_subs=S, npml=5)
    return x, h, nu, op, a_st, slabs, X


def _random_trace(slabs, seed, factor=1):
    rng = np.random.default_rng(seed)
    size = factor * (slabs.n_subs - 1) * slabs.m * slabs.n
    return jnp.asarray(
        rng.standard_normal(size) + 1j * rng.standard_normal(size)
    )


def test_dinv_is_inverse_of_recursion(setup):
    """D_down^{-1} then the forward operator reproduces the input: verify
    via the MM identity on a down-polarized-only vector is complex; instead
    check the recursion is consistent — applying dinv twice via the GS
    preconditioner and the MM operator converges GMRES quickly below."""
    x, h, nu, op, a_st, slabs, X = setup
    # direct consistency: dinv_down o d_down == identity is covered in 2D;
    # here check dinv recursions produce finite, correctly-shaped output
    g = _random_trace(slabs, 0, factor=2)
    out = polarized3d.apply_dinv_down(slabs, g)
    assert out.shape == g.shape
    assert np.isfinite(np.asarray(out)).all()
    out_up = polarized3d.apply_dinv_up(slabs, g)
    assert out_up.shape == g.shape
    assert np.isfinite(np.asarray(out_up)).all()


def test_inner_trace_system_converges(setup):
    """GMRES on the 3D MM with the GS plane-trace preconditioner converges
    quickly (the 2D analog converges in ~4; plane traces behave alike)."""
    x, h, nu, op, a_st, slabs, X = setup
    b = _random_trace(slabs, 3, factor=4)
    precond = lambda v: polarized3d.precond_gauss_seidel(
        slabs, polarized3d.permute_to_pairs(slabs, v), 2
    )
    sol, info = gmres(
        lambda v: polarized3d.apply_mm(slabs, v), b, preconditioner=precond,
        rtol=1e-8, restart=20, maxiter=60,
    )
    assert bool(info.converged)
    assert int(info.n_iterations) <= 10
    # verify the solution satisfies the system
    res = np.linalg.norm(
        np.asarray(polarized3d.apply_mm(slabs, sol) - b)
    ) / np.linalg.norm(np.asarray(b))
    assert res < 1e-7


def test_polarized3d_preconditioner_full_system(setup):
    """Full 3D LS solve with the plane-trace polarized preconditioner."""
    x, h, nu, op, a_st, slabs, X = setup
    precond = polarized3d.PolarizedTracesPreconditioner3D(
        slabs=slabs, a_s=a_st, n_it=2, inner_tol=1e-2
    )
    u_inc = jnp.asarray(np.exp(1j * K * X.ravel()))
    rhs = -(op.apply(u_inc) - u_inc)
    u, info = gmres(op.apply, rhs, preconditioner=precond.apply,
                    rtol=1e-8, restart=20, maxiter=60)
    assert bool(info.converged)
    res = np.linalg.norm(np.asarray(op.apply(u) - rhs)) / np.linalg.norm(
        np.asarray(rhs)
    )
    assert res < 1e-3
    assert int(info.n_iterations) <= 12


def test_polarized3d_yblock_layout(setup):
    """The plane-trace system also runs on the y-blocked pivot layout."""
    x, h, nu, op, a_st, slabs, X = setup
    ag_st = stencils.build_sparse_a_ag_3d(K, op, dtype=jnp.complex128)[1]
    slabs_y = build_slab_system_3d(
        a_st, ag_st, nu, x, h, K, n_subs=S, npml=5, pivot_dtype="yblock"
    )
    g = _random_trace(slabs, 1, factor=2)
    ref = np.asarray(polarized3d.apply_dinv_down(slabs, g))
    got = np.asarray(polarized3d.apply_dinv_down(slabs_y, g))
    np.testing.assert_allclose(got, ref, rtol=1e-8, atol=1e-10)


def test_polarized3d_apply_batch_matches_rows(setup):
    """3D apply_batch (trailing direction axis through the plane-trace
    pipeline + one gmres_batched inner solve) == per-row apply."""
    x, h, nu, op, a_st, slabs, X = setup
    pc = polarized3d.PolarizedTracesPreconditioner3D(
        slabs=slabs, a_s=a_st, n_it=2
    )
    rng = np.random.default_rng(11)
    B = jnp.asarray(
        rng.standard_normal((2, NN ** 3))
        + 1j * rng.standard_normal((2, NN ** 3))
    )
    got = np.asarray(pc.apply_batch(B))
    for r in range(2):
        ref = np.asarray(pc.apply(B[r]))
        err = np.max(np.abs(got[r] - ref)) / np.max(np.abs(ref))
        assert err < 1e-10, err


def test_polarized3d_pallas_layout(setup):
    """The plane-trace block apply also runs on the Pallas plane-stack
    layout (fused whole-slab solves through per-slab PlaneSlabViews; the
    raw placeholder fac holds empty pivots and must never be vmapped)."""
    x, h, nu, op, a_st, slabs, X = setup
    ag_st = stencils.build_sparse_a_ag_3d(K, op, dtype=jnp.complex128)[1]
    slabs_p = build_slab_system_3d(
        a_st, ag_st, nu, x, h, K, n_subs=S, npml=5,
        pivot_dtype="bf16_pallas",
    )
    assert slabs_p.pfac is not None
    mn = slabs.m * slabs.n
    g = _random_trace(slabs, 7, factor=2)
    v = g.reshape(-1, 2, mn)
    v0 = jnp.concatenate([jnp.zeros((1, mn), g.dtype), v[:, 0]], axis=0)
    v1 = jnp.concatenate([jnp.zeros((1, mn), g.dtype), v[:, 1]], axis=0)
    vN = jnp.concatenate([v[:, 0], jnp.zeros((1, mn), g.dtype)], axis=0)
    vNp = jnp.concatenate([v[:, 1], jnp.zeros((1, mn), g.dtype)], axis=0)
    ref = polarized3d.block_apply(slabs, v0, v1, vN, vNp)
    got = polarized3d.block_apply(slabs_p, v0, v1, vN, vNp)
    for r, gq in zip(ref, got):
        err = float(jnp.max(jnp.abs(gq - r)) / jnp.max(jnp.abs(r) + 1e-30))
        assert err < 2e-2   # bf16 pivots vs full-precision reference
