"""Chain-timed polarized-traces solve on the TPU (the reference's
``tests/plasma_integral_system_example.jl`` configuration scaled by --h).

The naive wall-clock of this solve is tunnel-latency-dominated (RESULTS.md
recorded 103 s at 401^2); this script times the ON-DEVICE solve with the
same data-dependent-chain methodology as the bench.py headline, on either
the XLA or the fused-Pallas local-solve path.

Usage: python benchmarks/polarized_e2e.py [--h 0.0025] [--subs 8]
       [--pivot full|bf16|pallas] [--cpu]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--h", type=float, default=1.0 / 400.0)
    ap.add_argument("--subs", type=int, default=8)
    ap.add_argument("--npml", type=int, default=10)
    ap.add_argument("--pivot", default="pallas")
    ap.add_argument("--nit", type=int, default=2)
    ap.add_argument("--dual", action="store_true",
                    help="also chain-time the JOINT 2-direction batched "
                         "solve (PolarizedTracesPreconditioner.apply_batch)")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from fast_solver_lippmann_schwinger_tpu.api import build_problem
    from fast_solver_lippmann_schwinger_tpu.config import (
        DDMConfig,
        ProblemConfig,
        SolverConfig,
    )
    from fast_solver_lippmann_schwinger_tpu.solver.gmres import gmres
    from fast_solver_lippmann_schwinger_tpu.utils.host import (
        fetch,
        to_device_complex,
    )

    cfg = ProblemConfig(
        dim=2, medium="plasma", h=args.h, precond="polarized_traces",
        pivot_dtype=args.pivot,
        solver=SolverConfig(rtol=1e-6, restart=20, maxiter=20,
                            dtype=jnp.complex64),
        ddm=DDMConfig(n_subdomains=args.subs, npml=args.npml,
                      n_inner_iters=args.nit),
    )
    t0 = time.time()
    problem = build_problem(cfg)
    print(f"setup dispatched in {time.time()-t0:.0f}s "
          f"(grid {problem.grid.shape}, pivot {args.pivot})", flush=True)

    X, Y = problem.grid.mesh()
    dtype = problem.op.symbol.dtype

    def one_solve(op, pc, ui):
        x, info = gmres(op.apply, -(op.apply(ui) - ui),
                        preconditioner=pc.apply, rtol=1e-6, restart=20,
                        maxiter=20)
        return x, info

    # one real solve for the iteration count (the reference's oracle)
    t0 = time.time()
    ui0 = to_device_complex(np.exp(1j * problem.k * X.ravel()), dtype)
    x, info = jax.jit(one_solve)(problem.op, problem.precond, ui0)
    res = fetch(info.residuals)
    print(f"outer iterations: {int((res[1:] > 0).sum())} "
          f"(wall {time.time()-t0:.0f}s incl. compile+fetch); "
          f"residuals {res[res > 0][:8]}", flush=True)

    def chain(op, pc, ui, n_steps):
        def body(c, _):
            xx, _ = one_solve(op, pc, c)
            return c + 1e-6 * xx / jnp.maximum(
                jnp.max(jnp.abs(xx)), 1e-30), None
        out, _ = jax.lax.scan(body, ui, None, length=n_steps)
        return jnp.broadcast_to(jnp.abs(out).sum(), (8,)).astype(jnp.float32)

    c1 = jax.jit(lambda op, pc, v: chain(op, pc, v, 1))
    c3 = jax.jit(lambda op, pc, v: chain(op, pc, v, 3))
    uis = [to_device_complex(
        np.exp(1j * (problem.k * X.ravel() + 1e-4 * i)), dtype)
        for i in range(4)]

    def run(fn, ui):
        return float(np.asarray(fn(problem.op, problem.precond, ui))[0])

    run(c1, uis[0])
    run(c3, uis[1])
    t0 = time.perf_counter()
    run(c1, uis[2])
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    run(c3, uis[3])
    t3 = time.perf_counter() - t0
    dt = max(t3 - t1, 1e-9) / 2
    print(f"on-device polarized-traces solve (chained): {dt*1e3:.1f} ms",
          flush=True)

    if args.dual:
        from fast_solver_lippmann_schwinger_tpu.solver.gmres import (
            gmres_batched,
        )

        def one_solve_b(op, pc, uis_):
            apply_b = jax.vmap(op.apply)
            xx, _ = gmres_batched(
                apply_b, -(apply_b(uis_) - uis_),
                preconditioner=pc.apply_batch, rtol=1e-6, restart=20,
                maxiter=20,
            )
            return xx

        def chain_b(op, pc, uis_, n_steps):
            def body(c, _):
                xx = one_solve_b(op, pc, c)
                return c + 1e-6 * xx / jnp.maximum(
                    jnp.max(jnp.abs(xx)), 1e-30), None
            out, _ = jax.lax.scan(body, uis_, None, length=n_steps)
            return jnp.broadcast_to(
                jnp.abs(out).sum(), (8,)
            ).astype(jnp.float32)

        cb1 = jax.jit(lambda op, pc, v: chain_b(op, pc, v, 1))
        cb3 = jax.jit(lambda op, pc, v: chain_b(op, pc, v, 3))
        dirs = np.array([(1.0, 0.0), (0.0, 1.0)])
        phases = (dirs[:, 0:1] * X.ravel()[None]
                  + dirs[:, 1:2] * Y.ravel()[None])
        buis = [to_device_complex(
            np.exp(1j * (problem.k * phases + 1e-4 * i)), dtype)
            for i in range(4)]
        run(cb1, buis[0])
        run(cb3, buis[1])
        t0 = time.perf_counter()
        run(cb1, buis[2])
        tb1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        run(cb3, buis[3])
        tb3 = time.perf_counter() - t0
        dtb = max(tb3 - tb1, 1e-9) / 2
        print(f"joint dual-direction polarized solve (chained): "
              f"{dtb*1e3:.1f} ms for 2 directions "
              f"({dtb*1e3/2:.1f} ms/dir, {dt/(dtb/2):.2f}x amortization)",
              flush=True)


if __name__ == "__main__":
    main()
