"""As·b stencil SpMV on the TPU: fused Pallas kernel vs the XLA 9-tap path.

Decides the fate of ``ops/pallas_stencil.py`` (wired behind
``StencilMatrix2D.use_pallas``): the SpMV runs on every preconditioner
application (reference MKL ``cscmv``, ``src/sparseblas.jl`` call sites
``src/preconditioner.jl:191-198``).

Usage: python benchmarks/stencil_spmv_bench.py [--n 800] [--iters 50]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=800)
    ap.add_argument("--iters", type=int, default=50)
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

    from fast_solver_lippmann_schwinger_tpu.core.grids import Grid2D
    from fast_solver_lippmann_schwinger_tpu.sparse import stencils
    from fast_solver_lippmann_schwinger_tpu.utils.host import to_device_complex

    grid = Grid2D(a=1.0, h=1.0 / args.n)
    k = 1.0 / grid.h
    a_st, _ = stencils.build_sparse_a_ag_2d(
        k, grid.x, grid.y, grid.h, dtype=jnp.complex64,
        cache_dir=os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".artifact_cache"),
    )
    a_pl = a_st.replace(use_pallas=True)

    def chain(a, v, n_steps):
        def body(u, _):
            u2 = a.matvec(u)
            return u2 / jnp.maximum(jnp.max(jnp.abs(u2)), 1e-30), None
        out, _ = jax.lax.scan(body, v, None, length=n_steps)
        return jnp.broadcast_to(jnp.abs(out).sum(), (8,)).astype(jnp.float32)

    n1, n2 = args.iters, 5 * args.iters
    base = np.exp(1j * k * np.linspace(0, 1, grid.size))
    us = [to_device_complex(base * np.exp(1j * 1e-4 * i), jnp.complex64)
          for i in range(4)]

    for label, a in [("xla-9tap", a_st), ("pallas", a_pl)]:
        c1 = jax.jit(lambda a, v: chain(a, v, n1))
        c2 = jax.jit(lambda a, v: chain(a, v, n2))
        float(np.asarray(c1(a, us[0]))[0])
        float(np.asarray(c2(a, us[1]))[0])
        t0 = time.perf_counter()
        float(np.asarray(c1(a, us[2]))[0])
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(np.asarray(c2(a, us[3]))[0])
        t2 = time.perf_counter() - t0
        dt = max(t2 - t1, 1e-9) / (n2 - n1)
        gbps = grid.size * (9 * 8 + 2 * 8) / dt / 1e9   # stencil + in/out c64
        print(f"{label}: {dt*1e6:.1f} us/apply "
              f"({grid.size/dt/1e9:.2f} Ggridpoints/s, ~{gbps:.0f} GB/s)",
              flush=True)


if __name__ == "__main__":
    main()
