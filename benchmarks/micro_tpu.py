"""Chain-timed component benchmarks for the tunnel TPU backend.

``block_until_ready`` does not gate execution on the tunnel backend, so each
component is timed as a data-dependent ``lax.scan`` chain of two lengths with
a fetch-synced (8,)-float32 output; per-iteration time is the slope
(see CLAUDE.md benchmark methodology).

Usage: python benchmarks/micro_tpu.py [--h 0.0025] [--subs 8] [--cpu]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--h", type=float, default=1.0 / 400.0)
    ap.add_argument("--subs", type=int, default=8)
    ap.add_argument("--npml", type=int, default=10)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--bf16", action="store_true",
                    help="bf16-compressed slab pivots (the production "
                    "setting at 801x801 — full precision x2 sweep systems "
                    "exceed HBM)")
    ap.add_argument("--skip-full", action="store_true",
                    help="skip the full-grid factorization benchmarks")
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

    from fast_solver_lippmann_schwinger_tpu.core.grids import Grid2D
    from fast_solver_lippmann_schwinger_tpu.ddm.subdomain import build_slab_system
    from fast_solver_lippmann_schwinger_tpu.ddm.sweeps import (
        DoubleSweepPreconditioner,
        gs_sweep,
    )
    from fast_solver_lippmann_schwinger_tpu.models import media
    from fast_solver_lippmann_schwinger_tpu.ops.fastconv import (
        build_fast_convolution_2d,
    )
    from fast_solver_lippmann_schwinger_tpu.sparse import stencils
    from fast_solver_lippmann_schwinger_tpu.sparse.direct import (
        block_thomas_solve,
        factor_stencil_2d,
    )
    from fast_solver_lippmann_schwinger_tpu.utils.host import to_device_complex

    dtype = jnp.complex64
    grid = Grid2D(a=1.0, h=args.h)
    k = 1.0 / args.h
    X, Y = grid.mesh()
    nu = media.plasma_2d(X, Y)
    print(f"grid {grid.shape}, k={k}, backend={jax.default_backend()}",
          file=sys.stderr, flush=True)

    op = build_fast_convolution_2d(
        grid.x, grid.y, args.h, k, nu, quad_rule="greengard_vico", dtype=dtype
    )
    a_st, ag_st, a_np, ag_np = stencils.build_sparse_a_ag_2d(
        k, grid.x, grid.y, args.h, dtype=dtype, return_host=True
    )
    msp = stencils.build_msp_2d(a_st, ag_st, nu, k)
    pivot_dtype = "bf16" if args.bf16 else "full"
    slabs = build_slab_system(
        a_st, ag_st, nu, grid.x, grid.y, args.h, k, args.subs,
        npml=args.npml, a_host=a_np, ag_host=ag_np, pivot_dtype=pivot_dtype,
    )
    slabs_t = build_slab_system(
        a_st.transpose(), ag_st.transpose(), nu.T, grid.y, grid.x,
        args.h, k, args.subs, npml=args.npml,
        a_host=a_np.transpose(1, 0, 3, 2), ag_host=ag_np.transpose(1, 0, 3, 2),
        pivot_dtype=pivot_dtype,
    )
    precond = DoubleSweepPreconditioner(
        slabs=slabs, slabs_t=slabs_t, msp=msp, a_s=a_st
    )
    fac_full = None if args.skip_full else jax.jit(factor_stencil_2d)(msp)

    u = to_device_complex(np.exp(1j * k * X.ravel()), dtype)

    def norm1(v):
        return v / jnp.maximum(jnp.max(jnp.abs(v)), 1e-30)

    def chain_time(label, step, state_args, pytree_args, n1=None, n2=None):
        """step(pytrees, v) -> v; chain of two lengths, fetch-synced."""
        n1 = args.iters if n1 is None else n1
        n2 = 5 * (args.iters if n1 is None else n1) if n2 is None else n2

        def chain(p, v, n_steps):
            def body(c, _):
                return norm1(step(p, c)), None
            out, _ = jax.lax.scan(body, v, None, length=n_steps)
            return jnp.broadcast_to(jnp.abs(out).sum(), (8,)).astype(jnp.float32)

        c1 = jax.jit(lambda p, v: chain(p, v, n1))
        c2 = jax.jit(lambda p, v: chain(p, v, n2))
        us = [
            to_device_complex(
                np.exp(1j * (k * X.ravel() + 1e-4 * i)), dtype
            ).reshape(state_args.shape)
            for i in range(4)
        ]
        float(np.asarray(c1(pytree_args, us[0]))[0])
        float(np.asarray(c2(pytree_args, us[1]))[0])
        t0 = time.perf_counter()
        float(np.asarray(c1(pytree_args, us[2]))[0])
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(np.asarray(c2(pytree_args, us[3]))[0])
        t2 = time.perf_counter() - t0
        dt = max(t2 - t1, 1e-9) / (n2 - n1)
        print(f"{label:28s}: {dt*1e3:9.3f} ms", flush=True)
        return dt

    chain_time("operator apply", lambda p, v: p.apply(v), u, op)
    chain_time("stencil matvec (Msp)", lambda p, v: p.matvec(v), u, msp)
    if fac_full is not None:
        chain_time("block-Thomas full grid",
                   lambda p, v: block_thomas_solve(p, v), u, fac_full)
    chain_time("gs_sweep (one direction)",
               lambda p, v: gs_sweep(p, v), u, slabs, n1=2, n2=10)
    chain_time("DoubleSweep precond apply",
               lambda p, v: p.apply(v), u, precond, n1=2, n2=10)


if __name__ == "__main__":
    main()
