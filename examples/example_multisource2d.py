"""Multi-source 2D plasma solve: many incident directions in ONE batched
GMRES.

The reference's headline driver loops its two plane-wave directions
serially (``/root/reference/tests/plasma_example.jl:160,172``).  On TPU
the sweep preconditioner is HBM-bound streaming its pivot planes, so a
joint batch of directions rides each sweep for ~the price of one
(measured 1.95x dual-direction throughput at 801x801 — RESULTS.md); this
is the production pattern for full-aperture workloads (many sources).

Single chip:   python examples/example_multisource2d.py --cpu --h 0.02
Multi chip:    add --mesh 4 --rhs-block 2 (virtual CPU devices via
               XLA_FLAGS=--xla_force_host_platform_device_count=4) to run
               the wavefront-pipelined sharded double sweep with 2-wide
               RHS blocks per pipeline round.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--h", type=float, default=1.0 / 100.0)
    ap.add_argument("--subs", type=int, default=4)
    ap.add_argument("--npml", type=int, default=8)
    ap.add_argument("--n-dirs", type=int, default=6)
    ap.add_argument("--rtol", type=float, default=1e-6)
    ap.add_argument("--mesh", type=int, default=0,
                    help="devices for the sharded pipelined sweep (0 = single chip)")
    ap.add_argument("--rhs-block", type=int, default=1)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--x64", action="store_true")
    ap.add_argument("--save-field", metavar="BASE",
                    default="multisource2d_field",
                    help="write BASE.npz/.png of the first direction's "
                         "field; '' disables")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    if args.x64:
        jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    import numpy as np

    dtype = jnp.complex128 if args.x64 else jnp.complex64
    dirs = np.stack(
        [np.cos(2 * np.pi * np.arange(args.n_dirs) / args.n_dirs),
         np.sin(2 * np.pi * np.arange(args.n_dirs) / args.n_dirs)], axis=1
    )

    from fast_solver_lippmann_schwinger_tpu.models import plasma2d
    from fast_solver_lippmann_schwinger_tpu.utils.host import fetch

    t0 = time.time()
    problem = plasma2d.build_problem(
        h=args.h, n_subdomains=args.subs, npml=args.npml, dtype=dtype,
        double_sweep=True,
    )
    print(f"setup: {time.time()-t0:.1f}s  grid {problem.grid.shape}  "
          f"k={problem.k:.0f}  {args.n_dirs} directions")

    if args.mesh:
        from jax.sharding import Mesh

        from fast_solver_lippmann_schwinger_tpu.parallel.sharded import (
            make_sharded_double_sweep_pipelined,
            shard_slab_system,
        )
        from fast_solver_lippmann_schwinger_tpu.solver.gmres import (
            gmres_batched,
        )
        from fast_solver_lippmann_schwinger_tpu.utils.host import (
            to_device_complex,
        )

        mesh = Mesh(np.array(jax.devices()[: args.mesh]), ("slab",))
        pc = problem.precond
        slabs = shard_slab_system(pc.slabs, mesh)
        slabs_t = shard_slab_system(pc.slabs_t, mesh)
        precond = make_sharded_double_sweep_pipelined(
            slabs, slabs_t, pc.msp, pc.a_s, mesh, rhs_block=args.rhs_block
        )
        X, Y = problem.grid.mesh()
        phases = dirs[:, 0:1] * X.ravel()[None] + dirs[:, 1:2] * Y.ravel()[None]
        u_inc = to_device_complex(np.exp(1j * problem.k * phases), dtype)

        def run(op, uis):
            apply_b = jax.vmap(op.apply)
            return gmres_batched(
                apply_b, -(apply_b(uis) - uis), preconditioner=precond,
                rtol=args.rtol, restart=20, maxiter=60,
            )

        t0 = time.time()
        with mesh:
            x, info = jax.jit(run)(problem.op, u_inc)
            jax.block_until_ready(x)
        mode = (f"{args.mesh}-device pipelined sweep, "
                f"rhs_block={args.rhs_block}")
    else:
        t0 = time.time()
        x, info = plasma2d.solve_batched(
            problem, incident_directions=dirs, rtol=args.rtol, maxiter=60,
        )
        mode = "single-chip joint batch"
    iters = fetch(info.n_iterations).astype(int)
    print(f"{mode}: solve+compile {time.time()-t0:.1f}s; "
          f"iterations per direction: {list(iters)}")
    res = fetch(info.residuals)
    for r in range(args.n_dirs):
        print(f"  dir ({dirs[r,0]:+.2f},{dirs[r,1]:+.2f}): "
              f"{res[r][res[r] > 0][-1]:.2e} preconditioned residual after "
              f"{iters[r]} iters")
    if args.save_field:
        from fast_solver_lippmann_schwinger_tpu.utils.fields import save_field

        files = save_field(args.save_field, fetch(x[0]), problem.grid.shape,
                           residuals=res[0],
                           title=f"multisource plasma {problem.grid.shape} "
                                 f"k={problem.k:g} dir 0")
        print("field artifacts:", " ".join(files))


if __name__ == "__main__":
    main()
