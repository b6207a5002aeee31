"""Sharded 3D polarized-traces preconditioner == single-device apply_batch,
on the forced-host-device CPU mesh (capability the reference only advertises
via its empty example3D_Polarized_traces.jl)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from fast_solver_lippmann_schwinger_tpu.ddm.polarized3d import (
    PolarizedTracesPreconditioner3D,
)
from fast_solver_lippmann_schwinger_tpu.ddm.subdomain3d import (
    build_slab_system_3d,
)
from fast_solver_lippmann_schwinger_tpu.models import media
from fast_solver_lippmann_schwinger_tpu.ops.fastconv import (
    build_fast_convolution_3d,
)
from fast_solver_lippmann_schwinger_tpu.parallel.polarized3d import (
    make_sharded_polarized_preconditioner_3d,
)
from fast_solver_lippmann_schwinger_tpu.parallel.sharded import (
    shard_slab_system,
)
from fast_solver_lippmann_schwinger_tpu.solver.gmres import gmres_batched
from fast_solver_lippmann_schwinger_tpu.sparse import stencils

NN = 17
K = 8.0


@pytest.fixture(scope="module")
def setup_3d():
    h = 1.0 / (NN - 1)
    x = np.linspace(0.0, 1.0, NN)
    Z, Y, X = np.meshgrid(x, x, x, indexing="ij")
    nu = media.gaussian_bump_3d(X, Y, Z)
    op = build_fast_convolution_3d(x, x, x, h, K, nu, dtype=jnp.complex128)
    a_st, ag_st = stencils.build_sparse_a_ag_3d(K, op, dtype=jnp.complex128)
    slabs = build_slab_system_3d(a_st, ag_st, nu, x, h, K, n_subs=4, npml=5)
    return op, a_st, slabs, X


@pytest.mark.parametrize("n_dev", [2, 4])
def test_sharded_polarized3d_matches_single(setup_3d, n_dev):
    if len(jax.devices()) < n_dev:
        pytest.skip(f"needs >= {n_dev} devices")
    op, a_st, slabs, X = setup_3d
    mesh = Mesh(np.array(jax.devices()[:n_dev]), ("slab",))
    N = NN ** 3
    rng = np.random.default_rng(0)
    B = jnp.asarray(
        rng.standard_normal((2, N)) + 1j * rng.standard_normal((2, N))
    )
    pc = PolarizedTracesPreconditioner3D(slabs=slabs, a_s=a_st, n_it=2)
    want = np.asarray(pc.apply_batch(B))
    pc_sh = make_sharded_polarized_preconditioner_3d(
        shard_slab_system(slabs, mesh), a_st, mesh, n_it=2
    )
    with mesh:
        got = np.asarray(jax.jit(pc_sh)(B))
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-10)


def test_sharded_polarized3d_full_solve(setup_3d):
    """Composed multi-chip 3D trace-path solve: batched GMRES + sharded
    polarized preconditioner matches the single-device solve with
    iteration parity.  Uses 2 fat slabs (the converging quality class at
    this tiny grid — 4 slabs of a 17-grid leave ~4 interior planes each
    and the trace preconditioner degrades; parity at S=4 is covered by the
    apply_batch test above)."""
    n_dev = 2
    if len(jax.devices()) < n_dev:
        pytest.skip(f"needs >= {n_dev} devices")
    op, a_st, _slabs4, X = setup_3d
    h = 1.0 / (NN - 1)
    x = np.linspace(0.0, 1.0, NN)
    Zg, Yg, Xg = np.meshgrid(x, x, x, indexing="ij")
    nu = media.gaussian_bump_3d(Xg, Yg, Zg)
    from fast_solver_lippmann_schwinger_tpu.sparse import stencils as _st

    a2, ag2 = _st.build_sparse_a_ag_3d(K, op, dtype=jnp.complex128)
    slabs = build_slab_system_3d(a2, ag2, nu, x, h, K, n_subs=2, npml=5)
    a_st = a2
    mesh = Mesh(np.array(jax.devices()[:n_dev]), ("slab",))
    u_inc = jnp.asarray(np.stack([
        np.exp(1j * K * X.ravel()),
        np.exp(1j * K * (0.6 * X + 0.8 * X.transpose(2, 1, 0)).ravel()),
    ]))

    pc = PolarizedTracesPreconditioner3D(slabs=slabs, a_s=a_st, n_it=2)

    def ref_solve(b):
        apply_b = jax.vmap(op.apply)
        return gmres_batched(
            apply_b, -(apply_b(b) - b), preconditioner=pc.apply_batch,
            rtol=1e-8, restart=20, maxiter=60,
        )

    x_ref, info_ref = jax.jit(ref_solve)(u_inc)

    pc_sh = make_sharded_polarized_preconditioner_3d(
        shard_slab_system(slabs, mesh), a_st, mesh, n_it=2
    )

    def dist_solve(b):
        apply_b = jax.vmap(op.apply)
        return gmres_batched(
            apply_b, -(apply_b(b) - b), preconditioner=pc_sh,
            rtol=1e-8, restart=20, maxiter=60,
        )

    with mesh:
        x_dist, info_dist = jax.jit(dist_solve)(u_inc)
    assert bool(np.asarray(info_dist.converged).all())
    np.testing.assert_allclose(
        np.asarray(x_dist), np.asarray(x_ref), rtol=0, atol=1e-8
    )
    assert (
        np.asarray(info_dist.n_iterations).tolist()
        == np.asarray(info_ref.n_iterations).tolist()
    )
