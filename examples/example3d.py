"""3D Gaussian bump with the sparsifying preconditioner.

TPU-native equivalent of ``examples/example3D.jl`` (h = 1/48, k = 48).

Run: python examples/example3d.py [--n 48]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=48)
    ap.add_argument("--precond", default="sparsifying",
                    choices=["sparsifying", "gs", "polarized_traces"],
                    help="'gs' = 3D z-slab sweep; 'polarized_traces' = "
                         "plane-trace integral system (both beyond the "
                         "reference)")
    ap.add_argument("--subs", type=int, default=4)
    ap.add_argument("--npml", type=int, default=5)
    ap.add_argument("--pivot-dtype", default="full",
                    choices=["full", "bf16", "yblock", "yblock_bf16", "yblock_int8"],
                    help="3D plane-pivot storage (yblock_bf16 = the "
                    "96^3-on-one-chip memory layout)")
    ap.add_argument("--cache-dir", default=None,
                    help="persist/reuse stencil fields (skips sampling)")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--x64", action="store_true")
    ap.add_argument("--rtol", type=float, default=1e-8)
    ap.add_argument("--maxiter", type=int, default=100)
    ap.add_argument("--save-field", metavar="BASE", default="bump3d_field",
                    help="write BASE.npz/.png (middle z-slice); '' disables")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    if args.x64:
        jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from fast_solver_lippmann_schwinger_tpu.models import bump3d
    from fast_solver_lippmann_schwinger_tpu.utils.timing import PhaseTimer
    from fast_solver_lippmann_schwinger_tpu.utils.host import fetch

    dtype = jnp.complex128 if args.x64 else jnp.complex64
    timer = PhaseTimer()
    with timer.phase("setup"):
        problem = bump3d.build_problem(
            h=1.0 / args.n, dtype=dtype, precond=args.precond,
            n_subdomains=args.subs, npml=args.npml,
            pivot_dtype=args.pivot_dtype, cache_dir=args.cache_dir,
        )
        pc = problem.precond
        fac = pc.factorization if hasattr(pc, "factorization") else pc.slabs.fac
        jax.block_until_ready(jax.tree_util.tree_leaves(fac)[0])
    with timer.phase("solve"):
        u, info = bump3d.solve(problem, rtol=args.rtol, maxiter=args.maxiter)
        # host fetch inside the timer: on the tunnel backend
        # block_until_ready() gates only on dispatch, not execution
        res = fetch(info.residuals)
    print(f"iterations: {int(fetch(info.n_iterations)[()])}")
    print("residuals:", res[res > 0])
    if args.save_field:
        from fast_solver_lippmann_schwinger_tpu.utils.fields import save_field

        files = save_field(args.save_field, fetch(u), problem.grid.shape,
                           residuals=res,
                           title=f"bump3d {problem.grid.shape} k={problem.k:g}")
        print("field artifacts:", " ".join(files))
    timer.log(grid=problem.grid.shape, k=problem.k)


if __name__ == "__main__":
    main()
