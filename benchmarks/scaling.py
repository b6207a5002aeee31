"""Strong-scaling measurement + TPU roofline model for the distributed
double-sweep preconditioner (BASELINE.md north star: >= 70% strong-scaling
efficiency on the sweep).

Two parts:

1. **Virtual-mesh wall-clock shape** — times one application of the
   pipelined double sweep (``parallel/sharded.py``) on a forced-host-device
   CPU mesh for D in {1, 2, 4, 8}.  The host is CPU-oversubscribed, so the
   absolute numbers are meaningless; what the curve shows is the SCHEDULE
   (total work executed and pipeline fill), which is what transfers to real
   chips.  The masked ``sharded_gs_sweep`` executes S stages on every device
   (D-fold redundant compute, flat wall-clock); the wavefront executes
   2(D + R - 1) rounds of k local solves with R solves' useful work.

2. **Single-chip roofline model** (``roofline()``) — the sweeps are
   HBM-bound on streaming the pivot inverses; traces are n-vectors over
   ICI.  The model counts bytes exactly from the slab-system shapes and
   reports the predicted strong-scaling efficiency on TPU-like
   bandwidth numbers.

Usage: python benchmarks/scaling.py [--h 0.01] [--subs 8] [--rhs 8]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# 8 virtual CPU devices — must be set before jax import
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()


def measure_virtual_mesh(h, subs, n_rhs, repeats=3):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh

    jax.config.update("jax_platforms", "cpu")

    from fast_solver_lippmann_schwinger_tpu.models import plasma2d
    from fast_solver_lippmann_schwinger_tpu.parallel.sharded import (
        make_sharded_double_sweep_pipelined,
        shard_slab_system,
    )

    problem = plasma2d.build_problem(
        h=h, n_subdomains=subs, npml=10, dtype=jnp.complex64,
        double_sweep=True, pivot_dtype="bf16",
    )
    m = problem.grid.m
    rng = np.random.default_rng(0)
    b_host = (
        rng.standard_normal((n_rhs, problem.grid.size))
        + 1j * rng.standard_normal((n_rhs, problem.grid.size))
    ).astype(np.complex64)

    rows = []
    for D in (1, 2, 4, 8):
        if subs % D:
            continue
        mesh = Mesh(np.array(jax.devices()[:D]), ("slab",))
        slabs = shard_slab_system(problem.precond.slabs, mesh)
        slabs_t = shard_slab_system(problem.precond.slabs_t, mesh)
        pc = make_sharded_double_sweep_pipelined(
            slabs, slabs_t, problem.precond.msp, problem.precond.a_s, mesh
        )
        fn = jax.jit(pc)
        b = jnp.asarray(b_host)
        out = fn(b)
        out.block_until_ready()        # CPU backend: this really syncs
        ts = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            fn(b).block_until_ready()
            ts.append(time.perf_counter() - t0)
        dt = sorted(ts)[len(ts) // 2]
        rows.append((D, dt, float(np.abs(np.asarray(out)).sum())))
    base = rows[0][1]
    print(f"\nvirtual CPU mesh (oversubscribed host — shape only), "
          f"grid {m}x{problem.grid.n}, S={subs}, R={n_rhs}:")
    print("  D   ms/apply   speedup   checksum")
    for D, dt, chk in rows:
        print(f"  {D}   {dt*1e3:8.1f}   {base/dt:7.2f}   {chk:.6g}")
    return rows


def roofline(n=801, m1=70, S=16, n_rhs=8, pivot_bytes=2 * 2,
             hbm_bw=8.5e11, ici_bw=9e10, mxu_flops=2e14,
             latency_per_round=2e-6):
    """Analytic strong-scaling model of the pipelined double sweep.

    Per local solve (one slab, one RHS): the block-Thomas substitutions
    stream the pivot stack — ``m1 * n * n * pivot_bytes`` bytes (bf16
    real+imag = 4 bytes/entry) — twice per sweep application (down solve +
    up resume reads the cached stacks; the resume path re-reads only the
    trace tail, counted as a second half pass).  Interface traces are 2
    n-vectors of complex64 per hop over ICI.  The double sweep runs the
    x- and y-direction sweeps back to back (2x everything).

    Pipeline: 2 (D + R - 1) rounds of k = S/D local solves per direction.
    Useful work = R solves of S slabs; efficiency(D) =
    T(1) / (D * T(D)).  Returns {D: (t_seconds, efficiency)}.

    ``hbm_bw`` defaults to the MEASURED effective sweep-stream rate on the
    v5e-class chip, re-validated round 5 after the fused kernels landed:
    dense-bf16 double-sweep apply 27.6 ms at 17.7 GB streamed (2.46
    full-stack passes x 2 directions at S=16, m1~70, npad=896) minus the
    ~7 ms dispatch/glue floor -> 851 GB/s.  The hybrid banded+tail layout
    streams 0.56x those bytes (fused apply 18.6 ms) at the same rate.
    """
    bytes_per_solve = m1 * n * n * pivot_bytes      # one substitution pass
    t_solve = 1.5 * bytes_per_solve / hbm_bw        # down + tail-resume up
    # MXU time for the same solve (bf16 matmul n x n times n-vector per
    # line): memory-bound by a wide margin, kept for reference
    t_flops = 2 * m1 * 8 * n * n / mxu_flops
    t_local = max(t_solve, t_flops)
    t_trace = 2 * 8 * n / ici_bw + latency_per_round

    out = {}
    R = n_rhs
    for D in (1, 2, 4, 8, 16):
        if S % D:
            continue
        k = S // D
        rounds = 2 * (D + R - 1)                    # down + up wavefronts
        # per direction; x and y sweeps double it
        t = 2 * rounds * (k * t_local + (t_trace if D > 1 else 0.0))
        t_ideal = 2 * 2 * S * R * t_local / D       # R solves spread over D
        out[D] = (t, t_ideal / t)
    base = out[1][0]
    print(f"\nroofline (n={n}, m1={m1}, S={S}, R={n_rhs}, "
          f"bf16 pivots, HBM {hbm_bw/1e12:.1f} TB/s, "
          f"ICI {ici_bw/1e9:.0f} GB/s):")
    print(f"  per-slab solve {t_solve*1e6:.0f} us (HBM) vs "
          f"{t_flops*1e6:.0f} us (MXU) -> memory-bound")
    print("  D   t_sweep_ms   strong-scaling eff (vs D=1, R solves)")
    for D, (t, eff) in out.items():
        print(f"  {D}   {t*1e3:9.2f}   {base/(D*t):.2%} "
              f"(pipeline-fill bound {n_rhs/(D+n_rhs-1):.2%})")
    return out


def roofline_blocked(n=801, m1=70, S=16, n_rhs=64, blocks=(1, 2, 4, 8, 16),
                     pivot_bytes=2 * 2, hbm_bw=8.5e11, ici_bw=9e10,
                     mxu_flops=2e14, latency_per_round=2e-6):
    """Blocked-schedule model (``rhs_block=B``): a B-wide local solve
    streams the pivot stack ONCE (measured: 2-RHS apply == 1-RHS apply at
    801, RESULTS.md), so R sources ride as RB = ceil(R/B) blocks in
    2 (D + RB - 1) rounds.  The honest single-chip baseline also blocks
    (RB block-sweeps), so efficiency = RB / (D + RB - 1) in blocks; the
    compute ridge caps useful B at ~mxu_flops/hbm_bw/8 per f32 column
    pair.  Prints wall-clock and efficiency vs the BLOCKED single chip.
    """
    bytes_per_solve = m1 * n * n * pivot_bytes
    t_stream = 1.5 * bytes_per_solve / hbm_bw
    t_trace = 2 * 8 * n / ici_bw + latency_per_round
    ridge_b = int(mxu_flops / hbm_bw / 8)       # B where matmul ~ stream
    print(f"\nblocked roofline (R={n_rhs} sources; compute ridge at "
          f"B~{ridge_b}):")
    print("  D    B   RB   rounds   t_sweep_ms   eff vs blocked 1-chip")
    for D in (2, 4, 8, 16):
        if S % D:
            continue
        k = S // D
        for B in blocks:
            t_local = max(t_stream, 2 * m1 * 8 * n * n * B / mxu_flops)
            RB = -(-n_rhs // B)
            rounds = 2 * (D + RB - 1)
            t = 2 * rounds * (k * t_local + t_trace)
            t1 = 2 * 2 * RB * S * t_local        # blocked single chip
            print(f"  {D:2d}  {B:3d}  {RB:3d}   {rounds:4d}   "
                  f"{t*1e3:9.2f}   {t1/(D*t):.2%}")
    return None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--h", type=float, default=1.0 / 100.0)
    ap.add_argument("--subs", type=int, default=8)
    ap.add_argument("--rhs", type=int, default=8)
    ap.add_argument("--sources", type=int, default=64,
                    help="source count for the blocked-schedule model")
    ap.add_argument("--skip-mesh", action="store_true")
    args = ap.parse_args()
    if not args.skip_mesh:
        measure_virtual_mesh(args.h, args.subs, args.rhs)
    # the reference's 16-slab layout (multi-chip distribution geometry) and
    # the round-5 single-chip headline layout (4 fat slabs)
    roofline(n=801, m1=70, S=16, n_rhs=args.rhs)
    roofline(n=801, m1=220, S=4, n_rhs=args.rhs)
    roofline_blocked(n=801, m1=70, S=16, n_rhs=args.sources)


if __name__ == "__main__":
    main()
