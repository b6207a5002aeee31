"""Inverse medium reconstruction by gradient descent through the solver.

Beyond-reference capability: the reference solver
(``tanderson92/Fast_solver_Lippmann_Schwinger``) is forward-only; here the
whole scattering solve is differentiable (``solver/adjoint.py``), so an
unknown medium can be recovered from scattered-field data by minimizing

    L(nu) = sum_s || u_s(nu) - u_s(nu_true) ||^2

over incident directions s with ``jax.grad`` + Adam — each gradient costs
one forward and one transposed (adjoint) GMRES solve per source.

Run: python examples/example_inverse2d.py [--h 0.04] [--steps 60] [--cpu]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--h", type=float, default=0.04)
    ap.add_argument("--k", type=float, default=10.0)
    ap.add_argument("--steps", type=int, default=60)
    ap.add_argument("--lr", type=float, default=3e-2)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--x64", action="store_true")
    ap.add_argument("--save-field", metavar="BASE", default="inverse2d_field",
                    help="write BASE.npz/.png of recovered vs true medium; "
                         "'' disables")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    if args.x64:
        jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    import optax

    from fast_solver_lippmann_schwinger_tpu.core.grids import Grid2D
    from fast_solver_lippmann_schwinger_tpu.models import media
    from fast_solver_lippmann_schwinger_tpu.ops.fastconv import (
        build_fast_convolution_2d,
    )
    from fast_solver_lippmann_schwinger_tpu.solver.adjoint import (
        differentiable_solve,
    )
    from fast_solver_lippmann_schwinger_tpu.utils.host import fetch

    dtype = jnp.complex128 if args.x64 else jnp.complex64
    grid = Grid2D(a=1.0, h=args.h)
    k = args.k
    X, Y = grid.mesh()
    nu_true = media.gaussian_bump_2d(X, Y)

    op = build_fast_convolution_2d(
        grid.x, grid.y, grid.h, k, nu_true, quad_rule="trapezoidal",
        dtype=dtype,
    )

    # synthetic data: scattered fields for a few incident plane waves
    dirs = np.array([[1.0, 0.0], [0.0, 1.0], [-1.0, 0.0], [0.0, -1.0]])
    phases = dirs[:, 0:1] * X.ravel()[None] + dirs[:, 1:2] * Y.ravel()[None]
    u_inc = jnp.asarray(np.exp(1j * k * phases), dtype=dtype)     # (S, N)

    def forward(nu_arr, ui):
        op2 = op.replace(nu=nu_arr)
        rhs = -(op2.apply(ui) - ui)
        return differentiable_solve(op2, rhs, rtol=1e-8, restart=30,
                                    maxiter=120)

    data = jax.jit(jax.vmap(lambda ui: forward(op.nu, ui)))(u_inc)

    def loss(nu_arr):
        u = jax.vmap(lambda ui: forward(nu_arr, ui))(u_inc)
        return jnp.sum(jnp.abs(u - data) ** 2) / jnp.sum(jnp.abs(data) ** 2)

    value_and_grad = jax.jit(jax.value_and_grad(loss))
    opt = optax.adam(args.lr)
    nu = jnp.zeros_like(op.nu)                 # start from free space
    state = opt.init(nu)

    for step in range(args.steps):
        val, g = value_and_grad(nu)
        updates, state = opt.update(g, state)
        nu = optax.apply_updates(nu, updates)
        if step % 10 == 0 or step == args.steps - 1:
            err = float(np.linalg.norm(fetch(nu) - np.asarray(nu_true))
                        / np.linalg.norm(np.asarray(nu_true)))
            print(f"step {step:4d}  loss {float(fetch(val)[()]):.3e}  "
                  f"medium rel err {err:.3f}", flush=True)

    print("final relative medium error:",
          float(np.linalg.norm(fetch(nu) - np.asarray(nu_true))
                / np.linalg.norm(np.asarray(nu_true))))
    if args.save_field:
        from fast_solver_lippmann_schwinger_tpu.utils.fields import save_field

        files = save_field(args.save_field, fetch(nu), grid.shape,
                           title="inverse2d: recovered medium nu")
        print("field artifacts:", " ".join(files))


if __name__ == "__main__":
    main()
