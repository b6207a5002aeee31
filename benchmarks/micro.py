"""Microbenchmarks of the solver's hot components on the current backend.

Usage: python benchmarks/micro.py [--h 0.00125] [--cpu]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timeit(fn, *args, iters=10):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--h", type=float, default=1.0 / 800.0)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from fast_solver_lippmann_schwinger_tpu.core.grids import Grid2D
    from fast_solver_lippmann_schwinger_tpu.models import media
    from fast_solver_lippmann_schwinger_tpu.ops.fastconv import (
        build_fast_convolution_2d,
    )
    from fast_solver_lippmann_schwinger_tpu.sparse import stencils
    from fast_solver_lippmann_schwinger_tpu.sparse.direct import (
        block_thomas_solve,
        factor_stencil_2d,
    )

    dtype = jnp.complex64
    grid = Grid2D(a=1.0, h=args.h)
    k = 1.0 / args.h
    X, Y = grid.mesh()
    nu = media.plasma_2d(X, Y)
    print(f"grid {grid.shape}, k={k}", file=sys.stderr)

    t0 = time.perf_counter()
    op = build_fast_convolution_2d(
        grid.x, grid.y, args.h, k, nu, quad_rule="greengard_vico", dtype=dtype
    )
    print(f"symbol build: {time.perf_counter()-t0:.2f}s", file=sys.stderr)

    t0 = time.perf_counter()
    a_st, ag_st = stencils.build_sparse_a_ag_2d(
        k, grid.x, grid.y, args.h, dtype=dtype
    )
    msp = stencils.build_msp_2d(a_st, ag_st, nu, k)
    print(f"stencil build: {time.perf_counter()-t0:.2f}s", file=sys.stderr)

    u = jnp.asarray(np.exp(1j * k * X.ravel()), dtype=dtype)

    apply_fn = jax.jit(lambda o, v: o.apply(v))
    dt = timeit(apply_fn, op, u)
    print(f"operator apply     : {dt*1e3:8.3f} ms")

    mv = jax.jit(lambda s, v: s.matvec(v))
    dt = timeit(mv, msp, u)
    print(f"stencil matvec     : {dt*1e3:8.3f} ms")

    t0 = time.perf_counter()
    fac = jax.jit(factor_stencil_2d)(msp)
    jax.block_until_ready(fac.cinv)
    print(f"factorization (cold): {time.perf_counter()-t0:8.2f} s")
    dt = timeit(jax.jit(factor_stencil_2d), msp, iters=2)
    print(f"factorization      : {dt*1e3:8.1f} ms")

    solve = jax.jit(block_thomas_solve)
    dt = timeit(solve, fac, u)
    print(f"block-Thomas solve : {dt*1e3:8.3f} ms")

    # multi-RHS solve throughput
    B = jnp.stack([u] * 8, axis=-1).reshape(grid.m, grid.n, 8)
    dt = timeit(solve, fac, B)
    print(f"solve x8 RHS       : {dt*1e3:8.3f} ms")


if __name__ == "__main__":
    main()
