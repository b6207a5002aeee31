"""Iteration-count quality experiment for band-compressed slab pivots.

Runs the plasma configuration at a reduced size on CPU and compares outer
GMRES convergence for full-precision vs bf16 vs banded pivot storage across
band widths.  Usage: python benchmarks/banded_quality.py [--h 0.005]
[--subs 4] [--widths 25,51,101]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--h", type=float, default=1.0 / 200.0)
    ap.add_argument("--subs", type=int, default=4)
    ap.add_argument("--widths", type=str, default="25,51,101")
    ap.add_argument("--ranks", type=str, default="",
                    help="also run banded_lr at each (width, rank) pair "
                         "from --widths x --ranks")
    ap.add_argument("--rtol", type=float, default=1e-6)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from fast_solver_lippmann_schwinger_tpu.models import plasma2d

    def run(pivot_dtype, pivot_band=None, pivot_rank=None):
        problem = plasma2d.build_problem(
            h=args.h, n_subdomains=args.subs, npml=10, dtype=jnp.complex64,
            pivot_dtype=pivot_dtype, pivot_band=pivot_band,
            pivot_rank=pivot_rank,
        )
        _, info = plasma2d.solve(problem, rtol=args.rtol, maxiter=40)
        res = np.asarray(info.residuals)
        iters = int(info.n_iterations)
        tag = pivot_dtype + (f"(w={pivot_band}" if pivot_band else "") + (
            f",r={pivot_rank})" if pivot_rank else (")" if pivot_band else "")
        )
        print(f"{tag:20s}: iters={iters:3d}  "
              f"residuals={np.array2string(res[:iters+1], precision=2)}",
              flush=True)

    run("full")
    run("bf16")
    widths = [int(w) for w in args.widths.split(",") if w]
    for w in widths:
        run("banded", w)
    for w in widths:
        run("banded_tail", w)
    for w in widths:
        for r in [int(r) for r in args.ranks.split(",") if r]:
            run("banded_lr", w, r)


if __name__ == "__main__":
    main()
