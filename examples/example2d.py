"""2D Gaussian bump with the sparsifying preconditioner.

TPU-native equivalent of the reference driver ``examples/example.jl``
(h = 0.005, k = 200, Greengard-Vico quadrature, preconditioned vs
unpreconditioned GMRES residual histories).

Run: python examples/example2d.py [--h 0.005] [--cpu]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--h", type=float, default=0.005)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--x64", action="store_true")
    ap.add_argument("--save-field", metavar="BASE", default="bump2d_field",
                    help="write BASE.npz/.png of the solution "
                         "(the reference driver's imshow, example.jl:96-98); "
                         "'' disables")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    if args.x64:
        jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from fast_solver_lippmann_schwinger_tpu.models import bump2d
    from fast_solver_lippmann_schwinger_tpu.utils.timing import PhaseTimer
    from fast_solver_lippmann_schwinger_tpu.utils.host import fetch

    dtype = jnp.complex128 if args.x64 else jnp.complex64
    timer = PhaseTimer()

    with timer.phase("setup"):
        problem = bump2d.build_problem(h=args.h, dtype=dtype)

    with timer.phase("solve_preconditioned"):
        u, info = bump2d.solve(problem)
        # host fetch inside the timer: on the tunnel backend
        # block_until_ready() gates only on dispatch, not execution
        res = fetch(info.residuals)
    print(f"preconditioned: {int(fetch(info.n_iterations)[()])} iterations")
    print("residuals:", res[res > 0])

    with timer.phase("solve_unpreconditioned"):
        u2, info2 = bump2d.solve(problem, preconditioned=False, maxiter=400)
        res2 = fetch(info2.residuals)
    print(f"unpreconditioned: {int(fetch(info2.n_iterations)[()])} iterations")
    print("residuals (first 20):", res2[res2 > 0][:20])
    if args.save_field:
        from fast_solver_lippmann_schwinger_tpu.utils.fields import save_field

        files = save_field(args.save_field, fetch(u), problem.grid.shape,
                           residuals=res,
                           title=f"bump2d {problem.grid.shape} k={problem.k:g}")
        print("field artifacts:", " ".join(files))
    timer.log(grid=problem.grid.shape, k=problem.k)


if __name__ == "__main__":
    main()
