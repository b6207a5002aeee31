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
                  platform=None, ne=None, compact_ne=None):
    import jax

    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # noqa: BLE001
        pass
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
    if ne is not None or compact_ne is not None:
        from fast_solver_lippmann_schwinger_tpu.ops import greens
        from fast_solver_lippmann_schwinger_tpu.ops.fastconv import (
            LippmannSchwinger2D,
        )
        from fast_solver_lippmann_schwinger_tpu.utils.host import (
            to_device_complex,
        )

        if compact_ne is not None:
            sym, _, _ = greens.gv_compact_kernel_2d(
                grid.n, grid.m, h, k, ne=compact_ne, me=compact_ne
            )
        else:
            sym, _, _ = greens.gv_symbol_2d(grid.n, grid.m, h, k, ne=ne, me=ne)
        op = LippmannSchwinger2D(
            symbol=to_device_complex(sym, dtype),
            nu=jnp.asarray(nu, jnp.float32),
            omega=k, n=grid.n, m=grid.m, quad_rule="greengard_vico",
        )
    else:
        op = build_fast_convolution_2d(
            grid.x, grid.y, h, k, nu, quad_rule="greengard_vico", dtype=dtype
        )

    # The operator pytree is an explicit argument (closure-captured device
    # arrays would be lowered as giant constants, which some backends
    # reject).  The whole N-iteration chain runs inside ONE jitted scan with
    # a data dependence between iterations, and timing is synced by fetching
    # a scalar to host — `block_until_ready` alone does not gate actual
    # execution on the remote-tunnel TPU backend.  Two chain lengths cancel
    # the constant fetch/dispatch overhead.
    def chain(o, v, n_steps):
        def body(u, _):
            u2 = o.apply(u)
            return u2 / jnp.maximum(jnp.max(jnp.abs(u2)), 1e-30), None
        out, _ = jax.lax.scan(body, v, None, length=n_steps)
        # single (8,) float32 output: the tunnel backend hangs on 0-d and
        # multi-output fetches, but 1-d single-output fetches work
        return jnp.broadcast_to(jnp.abs(out).sum(), (8,)).astype(jnp.float32)

    def run_synced(fn, *args):
        return float(np.asarray(fn(*args))[0])

    n1, n2 = iters, 5 * iters
    chain1 = jax.jit(lambda o, v: chain(o, v, n1))
    chain2 = jax.jit(lambda o, v: chain(o, v, n2))
    from fast_solver_lippmann_schwinger_tpu.utils.host import to_device_complex
    # Vary inputs between timed runs (the backend may serve identical
    # (executable, inputs) re-executions from a cache), but prepare every
    # input on the HOST up front: an eager device multiply inside the timed
    # region would drag its own remote compile into the measurement.
    base = np.exp(1j * k * X.ravel())
    us = [
        to_device_complex(base * np.exp(1j * 1e-4 * i), dtype)
        for i in range(5)
    ]
    run_synced(chain1, op, us[0])  # warmup/compile + first-fetch latency
    run_synced(chain2, op, us[1])
    # median-of-3 per chain length for robustness against fetch jitter
    t1s, t2s = [], []
    for i in range(3):
        t0 = time.perf_counter()
        run_synced(chain1, op, us[2 + i])
        t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        run_synced(chain2, op, us[4 - i])
        t2s.append(time.perf_counter() - t0)
    t1 = sorted(t1s)[1]
    t2 = sorted(t2s)[1]
    dt = max(t2 - t1, 1e-9) / (n2 - n1)
    return grid.size / dt, dt, grid.size


def main():
    ne = None
    compact_ne = None
    for arg in sys.argv[1:]:
        if arg.startswith("--ne="):
            ne = int(arg.split("=")[1])
        if arg.startswith("--compact-ne="):
            compact_ne = int(arg.split("=")[1])
    if "--cpu-probe" in sys.argv:
        gpps, dt, npts = measure_apply(iters=5, platform="cpu")
        print(json.dumps({"gpps": gpps}))
        return

    gpps, dt, npts = measure_apply(ne=ne, compact_ne=compact_ne)
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
