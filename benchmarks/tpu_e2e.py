"""End-to-end plasma solve on the TPU (mid-size config), with tunnel-safe
fetches and the persistent compile cache.

Usage: python benchmarks/tpu_e2e.py [--h 0.005] [--subs 4]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--h", type=float, default=1.0 / 200.0)
    ap.add_argument("--subs", type=int, default=4)
    ap.add_argument("--npml", type=int, default=10)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--single", action="store_true")
    ap.add_argument("--bf16", action="store_true")
    args = ap.parse_args()

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from fast_solver_lippmann_schwinger_tpu.models import plasma2d
    from fast_solver_lippmann_schwinger_tpu.utils.host import fetch

    t0 = time.time()
    problem = plasma2d.build_problem(
        h=args.h, n_subdomains=args.subs, npml=args.npml, dtype=jnp.complex64,
        double_sweep=not args.single,
        pivot_dtype="bf16" if args.bf16 else "full",
    )
    print(f"setup dispatched in {time.time()-t0:.1f}s "
          f"(grid {problem.grid.shape}, k={problem.k})", flush=True)

    for direction in [(1.0, 0.0), (0.0, 1.0)]:
        t0 = time.time()
        u, info = plasma2d.solve(problem, incident_direction=direction,
                                 rtol=1e-6, maxiter=60)
        res = fetch(info.residuals)
        dt = time.time() - t0
        iters = int((res[1:] > 0).sum())
        print(f"direction {direction}: {iters} iterations in {dt:.1f}s "
              f"(incl. compile); residuals {res[res > 0][:8]}", flush=True)


if __name__ == "__main__":
    main()
