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
    ap.add_argument("--pallas", action="store_true",
                    help="fused-Pallas sweep solves (bf16 pivots in the "
                    "padded Pallas layout; TPU only)")
    ap.add_argument("--chain", action="store_true",
                    help="chain-timed on-device solve time (excludes the "
                    "tunnel's per-call dispatch/fetch overhead, which "
                    "dominates the naive wall-clock)")
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
        pivot_dtype=("pallas" if args.pallas
                     else "bf16" if args.bf16 else "full"),
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
              f"(incl. compile + tunnel fetches); residuals "
              f"{res[res > 0][:8]}", flush=True)

    if args.chain:
        # true on-device solve time: scan a data-dependent chain of FULL
        # GMRES solves (each rhs perturbed by the previous solution), two
        # chain lengths, single (8,) float32 fetch-synced output
        import jax.numpy as jnp
        from fast_solver_lippmann_schwinger_tpu.solver.gmres import gmres
        from fast_solver_lippmann_schwinger_tpu.utils.host import (
            to_device_complex,
        )

        X, _ = problem.grid.mesh()
        dtype = problem.op.symbol.dtype
        ui0 = to_device_complex(
            np.exp(1j * problem.k * X.ravel()), dtype
        )

        def one_solve(op, pc, ui):
            x, _ = gmres(op.apply, -(op.apply(ui) - ui),
                         preconditioner=pc.apply, rtol=1e-6, restart=20,
                         maxiter=12)
            return x

        def chain(op, pc, ui, n_steps):
            def body(c, _):
                x = one_solve(op, pc, c)
                # re-inject: perturb the incident field with the solution
                return c + 1e-6 * x / jnp.maximum(
                    jnp.max(jnp.abs(x)), 1e-30), None
            out, _ = jax.lax.scan(body, ui, None, length=n_steps)
            return jnp.broadcast_to(
                jnp.abs(out).sum(), (8,)).astype(jnp.float32)

        c1 = jax.jit(lambda op, pc, v: chain(op, pc, v, 1))
        c2 = jax.jit(lambda op, pc, v: chain(op, pc, v, 3))
        uis = [to_device_complex(
            np.exp(1j * (problem.k * X.ravel() + 1e-4 * i)), dtype)
            for i in range(4)]
        float(np.asarray(c1(problem.op, problem.precond, uis[0]))[0])
        float(np.asarray(c2(problem.op, problem.precond, uis[1]))[0])
        t0 = time.perf_counter()
        float(np.asarray(c1(problem.op, problem.precond, uis[2]))[0])
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(np.asarray(c2(problem.op, problem.precond, uis[3]))[0])
        t2 = time.perf_counter() - t0
        dt = max(t2 - t1, 1e-9) / 2
        print(f"on-device full solve (chained, 12-iter budget): "
              f"{dt*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
