"""Benchmark driver: prints ONE JSON line for the round harness.

Headline metric: operator-apply throughput (grid-points/s) of the 2D plasma
configuration's hot loop — the FFT fast convolution
``u + k^2 G conv (nu u)`` at 801x801 (the reference's
``tests/plasma_example.jl`` grid, its per-GMRES-iteration kernel).

``vs_baseline``: ratio against the same algorithm executed on the host CPU
(the reference targets a 16-thread CPU with FFTW; running our own CPU path
in a subprocess is the closest apples-to-apples baseline available since the
reference publishes no numbers — see BASELINE.md).
"""

import json
import os
import subprocess
import sys
import time


def measure_apply(h=1.0 / 800.0, dtype_name="complex64", iters=20,
                  platform=None):
    import jax

    if platform is not None:
        # env vars alone don't survive the container's sitecustomize, which
        # force-registers the TPU plugin; the config update out-ranks it
        jax.config.update("jax_platforms", platform)
    import jax.numpy as jnp
    import numpy as np

    from fast_solver_lippmann_schwinger_tpu.core.grids import Grid2D
    from fast_solver_lippmann_schwinger_tpu.models import media
    from fast_solver_lippmann_schwinger_tpu.ops.fastconv import (
        build_fast_convolution_2d,
    )

    dtype = jnp.complex64 if dtype_name == "complex64" else jnp.complex128
    grid = Grid2D(a=1.0, h=h)
    k = 1.0 / h
    X, Y = grid.mesh()
    nu = media.plasma_2d(X, Y)
    op = build_fast_convolution_2d(
        grid.x, grid.y, h, k, nu, quad_rule="greengard_vico", dtype=dtype
    )
    # the operator pytree is an explicit argument (closure-captured device
    # arrays would be lowered as giant constants, which some backends reject)
    apply_fn = jax.jit(lambda o, v: o.apply(v))
    u = jnp.asarray(np.exp(1j * k * X.ravel()), dtype=dtype)
    # warmup / compile
    out = apply_fn(op, u)
    out.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(iters):
        out = apply_fn(op, out)
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / iters
    return grid.size / dt, dt, grid.size


def main():
    if "--cpu-probe" in sys.argv:
        gpps, dt, npts = measure_apply(iters=5, platform="cpu")
        print(json.dumps({"gpps": gpps}))
        return

    gpps, dt, npts = measure_apply()
    print(
        f"[bench] apply: {dt*1e3:.2f} ms on {npts} pts "
        f"({gpps/1e9:.3f} G gridpoints/s)",
        file=sys.stderr,
    )

    vs_baseline = 1.0
    try:
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--cpu-probe"],
            capture_output=True, text=True, timeout=900, env=env,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        line = out.stdout.strip().splitlines()[-1]
        cpu_gpps = json.loads(line)["gpps"]
        print(f"[bench] cpu baseline: {cpu_gpps/1e9:.3f} G gp/s", file=sys.stderr)
        vs_baseline = gpps / cpu_gpps
    except Exception as exc:  # noqa: BLE001
        print(f"[bench] cpu probe failed: {exc}", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "ls2d_plasma_801_operator_apply",
                "value": round(gpps / 1e6, 3),
                "unit": "Mgridpoints/s",
                "vs_baseline": round(vs_baseline, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
