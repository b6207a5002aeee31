"""Chain-timed preconditioner-apply comparison: single-RHS vs joint
multi-RHS double sweep at the 801 headline config (diagnoses where the
dual-direction batched solve's time goes).

Usage: python benchmarks/dual_micro.py [--h 0.00125] [--subs 16]
       [--pivot pallas] [--r 2] [--cpu]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--h", type=float, default=1.0 / 800.0)
    ap.add_argument("--subs", type=int, default=16)
    ap.add_argument("--pivot", default="pallas")
    ap.add_argument("--r", type=int, default=2)
    ap.add_argument("--iters", type=int, default=8)
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

    from fast_solver_lippmann_schwinger_tpu.models import plasma2d
    from fast_solver_lippmann_schwinger_tpu.utils.host import to_device_complex

    t0 = time.time()
    problem = plasma2d.build_problem(
        h=args.h, n_subdomains=args.subs, npml=10, dtype=jnp.complex64,
        double_sweep=True, pivot_dtype=args.pivot,
    )
    print(f"setup in {time.time()-t0:.0f}s", file=sys.stderr)
    N = problem.grid.size
    dtype = problem.op.symbol.dtype

    def chain_single(pc, v, n_steps):
        def body(u, _):
            u2 = pc.apply(u)
            return u2 / jnp.maximum(jnp.max(jnp.abs(u2)), 1e-30), None
        out, _ = jax.lax.scan(body, v, None, length=n_steps)
        return jnp.broadcast_to(jnp.abs(out).sum(), (8,)).astype(jnp.float32)

    def chain_batch(pc, V, n_steps):
        def body(U, _):
            U2 = pc.apply_batch(U)
            return U2 / jnp.maximum(jnp.max(jnp.abs(U2)), 1e-30), None
        out, _ = jax.lax.scan(body, V, None, length=n_steps)
        return jnp.broadcast_to(jnp.abs(out).sum(), (8,)).astype(jnp.float32)

    rng = np.random.default_rng(0)
    n1, n2 = args.iters, 3 * args.iters

    def run(fn, v):
        return float(np.asarray(fn(problem.precond, v))[0])

    def time_pair(c1, c2, make_input):
        run(c1, make_input(0))
        run(c2, make_input(1))
        t1s, t2s = [], []
        for i in range(3):
            t0 = time.perf_counter(); run(c1, make_input(2 + i))
            t1s.append(time.perf_counter() - t0)
            t0 = time.perf_counter(); run(c2, make_input(5 + i))
            t2s.append(time.perf_counter() - t0)
        t1, t2 = sorted(t1s)[1], sorted(t2s)[1]
        return (t2 - t1) / (n2 - n1)

    # single-RHS
    c1 = jax.jit(lambda pc, v: chain_single(pc, v, n1))
    c2 = jax.jit(lambda pc, v: chain_single(pc, v, n2))
    mk = lambda i: to_device_complex(
        rng.standard_normal(N) + 1j * rng.standard_normal(N), dtype)
    dt1 = time_pair(c1, c2, mk)
    print(f"single-RHS double-sweep apply: {dt1*1e3:.2f} ms")

    # multi-RHS
    R = args.r
    cb1 = jax.jit(lambda pc, v: chain_batch(pc, v, n1))
    cb2 = jax.jit(lambda pc, v: chain_batch(pc, v, n2))
    mkb = lambda i: to_device_complex(
        rng.standard_normal((R, N)) + 1j * rng.standard_normal((R, N)), dtype)
    dtR = time_pair(cb1, cb2, mkb)
    print(f"joint {R}-RHS double-sweep apply: {dtR*1e3:.2f} ms "
          f"({dtR/R*1e3:.2f} ms/RHS, amortization {dt1*R/dtR:.2f}x)")


if __name__ == "__main__":
    main()
