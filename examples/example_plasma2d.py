"""2D plasma with the alternating bi-directional sweep preconditioner.

TPU-native equivalent of ``tests/plasma_example.jl`` (h = 1/800, k = 800,
16 slabs, npml = 10, two incident directions).

Run: python examples/example_plasma2d.py [--h 0.00125] [--subs 16]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--h", type=float, default=1.0 / 800.0)
    ap.add_argument("--subs", type=int, default=16)
    ap.add_argument("--npml", type=int, default=10)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--x64", action="store_true")
    ap.add_argument("--save-field", metavar="BASE", default="plasma2d_field",
                    help="write BASE_<dir>.npz/.png per incident direction "
                         "(the reference driver's plots); '' disables")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    if args.x64:
        jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from fast_solver_lippmann_schwinger_tpu.models import plasma2d
    from fast_solver_lippmann_schwinger_tpu.utils.timing import PhaseTimer
    from fast_solver_lippmann_schwinger_tpu.utils.host import fetch

    dtype = jnp.complex128 if args.x64 else jnp.complex64
    timer = PhaseTimer()
    with timer.phase("setup+factorization"):
        problem = plasma2d.build_problem(
            h=args.h, n_subdomains=args.subs, npml=args.npml, dtype=dtype
        )
        jax.block_until_ready(problem.precond.slabs.fac.cinv)

    for direction in [(1.0, 0.0), (0.0, 1.0)]:
        with timer.phase(f"solve_{direction}"):
            u, info = plasma2d.solve(problem, incident_direction=direction)
            # host fetch inside the timer: on the tunnel backend
            # block_until_ready() gates only on dispatch, not execution
            res = fetch(info.residuals)
        print(
            f"direction {direction}: iterations to convergence = "
            f"{int(fetch(info.n_iterations)[()])}"
        )
        print("residual history:", res[res > 0])
        if args.save_field:
            from fast_solver_lippmann_schwinger_tpu.utils.fields import (
                save_field,
            )

            tag = f"{direction[0]:g}_{direction[1]:g}".replace("-", "m")
            files = save_field(
                f"{args.save_field}_{tag}", fetch(u), problem.grid.shape,
                residuals=res,
                title=f"plasma {problem.grid.shape} k={problem.k:g} "
                      f"dir={direction}",
            )
            print("field artifacts:", " ".join(files))
    timer.log(grid=problem.grid.shape, k=problem.k, n_subs=args.subs)


if __name__ == "__main__":
    main()
