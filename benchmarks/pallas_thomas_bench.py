"""Chain-timed benchmark: Pallas fused block-Thomas solve vs the XLA
gather-based path, at the production slab size (16 slabs of the 801x801
double sweep: m1 ~ 70 lines of n = 801).

Factors are synthetic and generated ON DEVICE (timing only cares about
shapes; uploading multi-GB pivot stacks through the tunnel would dominate).
Each mode is built separately so both fit in HBM — run twice:

    python benchmarks/pallas_thomas_bench.py --mode xla
    python benchmarks/pallas_thomas_bench.py --mode pallas

Methodology per CLAUDE.md: data-dependent solve chains of two lengths,
fetch-synced via a single (8,)-float32 output; per-solve time = slope.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=801)
    ap.add_argument("--m", type=int, default=70)
    ap.add_argument("--subs", type=int, default=16)
    ap.add_argument("--mode", choices=["xla", "pallas"], default="pallas")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--n1", type=int, default=4)
    ap.add_argument("--n2", type=int, default=20)
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

    from fast_solver_lippmann_schwinger_tpu.sparse import pallas_thomas as pt
    from fast_solver_lippmann_schwinger_tpu.sparse.direct import (
        BlockTridiagFactorizationBF16,
        block_thomas_solve,
    )
    from fast_solver_lippmann_schwinger_tpu.utils.host import to_device_complex

    S, m, n = args.subs, args.m, args.n
    npad = ((n + 127) // 128) * 128
    interpret = args.cpu

    if args.mode == "xla":

        @jax.jit
        def build(key):
            ks = jax.random.split(key, 4)
            sh = (S, m, n, n)
            eye = jnp.eye(n, dtype=jnp.float32)
            cre = (0.05 * jax.random.normal(ks[0], sh, jnp.float32) + eye
                   ).astype(jnp.bfloat16)
            cim = (0.05 * jax.random.normal(ks[1], sh, jnp.float32)
                   ).astype(jnp.bfloat16)
            bsh = (S, m, n, 3)
            lb = (0.05 * jax.random.normal(ks[2], bsh, jnp.float32)
                  ).astype(jnp.complex64)
            ub = (0.05 * jax.random.normal(ks[3], bsh, jnp.float32)
                  ).astype(jnp.complex64)
            return BlockTridiagFactorizationBF16(
                cinv_re=cre, cinv_im=cim, lband=lb, uband=ub
            )

        fac = build(jax.random.PRNGKey(0))

        def step(fac, s, v):
            f = jax.tree_util.tree_map(lambda a: a[s], fac)
            return block_thomas_solve(f, v)

        label = "XLA bf16 (gather per slab)"
    else:

        @jax.jit
        def build(key):
            ks = jax.random.split(key, 4)
            sh = (S, m, npad, npad)
            eye = jnp.eye(npad, dtype=jnp.float32)
            cre = (0.05 * jax.random.normal(ks[0], sh, jnp.float32) + eye
                   ).astype(jnp.bfloat16)
            cim = (0.05 * jax.random.normal(ks[1], sh, jnp.float32)
                   ).astype(jnp.bfloat16)
            bsh = (S, m, 2, 3, npad)
            lb = 0.05 * jax.random.normal(ks[2], bsh, jnp.float32)
            ub = 0.05 * jax.random.normal(ks[3], bsh, jnp.float32)
            return pt.PallasFactorization(
                cinv_t_re=cre, cinv_t_im=cim, lband=lb, uband=ub, n=n
            )

        fac = build(jax.random.PRNGKey(0))

        def step(fac, s, v):
            return pt.solve(fac, s, v, interpret=interpret)

        label = "Pallas fused (scalar prefetch)"

    print(f"backend={jax.default_backend()}  mode={args.mode}  "
          f"S={S} m={m} n={n} np={npad}", file=sys.stderr, flush=True)

    def norm1(v):
        return v / jnp.maximum(jnp.max(jnp.abs(v)), 1e-30)

    rng = np.random.default_rng(0)

    def chain_time(label, step, pytree, n1, n2):
        def chain(p, v, n_steps):
            def body(c, s):
                return norm1(step(p, s % S, c)), None
            out, _ = jax.lax.scan(body, v, jnp.arange(n_steps))
            return jnp.broadcast_to(jnp.abs(out).sum(), (8,)).astype(jnp.float32)

        c1 = jax.jit(lambda p, v: chain(p, v, n1))
        c2 = jax.jit(lambda p, v: chain(p, v, n2))
        vs = [
            to_device_complex(
                (np.exp(1j * (rng.standard_normal(m * n) * 0.1 + 1e-4 * i))
                 ).astype(np.complex64), jnp.complex64
            ).reshape(m, n)
            for i in range(4)
        ]
        float(np.asarray(c1(pytree, vs[0]))[0])
        float(np.asarray(c2(pytree, vs[1]))[0])
        t0 = time.perf_counter()
        float(np.asarray(c1(pytree, vs[2]))[0])
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(np.asarray(c2(pytree, vs[3]))[0])
        t2 = time.perf_counter() - t0
        dt = max(t2 - t1, 1e-9) / (n2 - n1)
        print(f"{label:32s}: {dt*1e3:9.3f} ms/solve", flush=True)
        return dt

    chain_time(label, step, fac, args.n1, args.n2)


if __name__ == "__main__":
    main()
