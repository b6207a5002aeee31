"""Beyond-HBM capacity demonstration (VERDICT r4 item 4).

One 3D configuration whose DDM pivot stacks PROVABLY exceed a single
chip's 16 GB HBM, solved end-to-end on an 8-device mesh with per-device
memory accounting: 96^3, 8 z-slabs, y-blocked bf16 plane pivots —
8 slabs x 96 y-planes x (l1 n)^2 x 2 x bf16 = ~22 GB of pivot inverses,
~2.8 GB per device.  This is the multi-chip sweep's few-source value
claim: CAPACITY, not speed (RESULTS.md).

Because a >16 GB factorization cannot fit one chip either, slabs factor
ONE AT A TIME on the real TPU (each slab's stack is ~2.8 GB), stream back
to the host through the tunnel in plane-sized chunks, and assemble on the
8-virtual-device CPU mesh where the sharded sweep runs
(``parallel/sharded3d.py``).  On a real v5e pod the same program maps each
slab to its owner chip with no host hop — the point here is to RUN the
beyond-one-chip configuration, not to time it.

Usage:  python benchmarks/capacity3d.py  [--nn 96 --subs 8]
Writes one JSON line to stdout and a log to stderr.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

os.environ.setdefault("JAX_ENABLE_X64", "false")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# CPU is the default (first) platform; the axon TPU stays available for the
# per-slab factoring
jax.config.update("jax_platforms", "cpu,axon")
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from fast_solver_lippmann_schwinger_tpu.models import media  # noqa: E402
from fast_solver_lippmann_schwinger_tpu.ops.fastconv import (  # noqa: E402
    build_fast_convolution_3d,
)
from fast_solver_lippmann_schwinger_tpu.solver.gmres import gmres  # noqa: E402
from fast_solver_lippmann_schwinger_tpu.sparse import stencils  # noqa: E402


def log(msg):
    print(f"[capacity3d] {msg}", file=sys.stderr, flush=True)


def tpu_fac_provider(S, tpu):
    """Factor slab s on the TPU, fetch each compressed leaf back in
    plane-sized 1-d float32 chunks (the tunnel fetches only 1-d
    single-output buffers), assemble host-side CPU arrays."""
    from fast_solver_lippmann_schwinger_tpu.utils.host import fetch

    def provider(h_sten, dtype, factor_one):
        import ml_dtypes

        cache_dir = os.path.join(_REPO, ".artifact_cache")
        os.makedirs(cache_dir, exist_ok=True)

        def cpath(s):
            return os.path.join(cache_dir, f"capacity_slab{s}.npz")

        def save_tree(s, leaves):
            payload = {}
            for i, leaf in enumerate(leaves):
                if leaf.dtype == ml_dtypes.bfloat16:
                    payload[f"a{i}"] = leaf.view(np.uint16)
                    payload[f"t{i}"] = np.array("bf16")
                else:
                    payload[f"a{i}"] = leaf
                    payload[f"t{i}"] = np.array("raw")
            np.savez(cpath(s), **payload)

        def load_tree(s, treedef, n_leaves):
            if not os.path.exists(cpath(s)):
                return None
            z = np.load(cpath(s), allow_pickle=False)
            leaves = []
            for i in range(n_leaves):
                a = z[f"a{i}"]
                if str(z[f"t{i}"]) == "bf16":
                    a = a.view(ml_dtypes.bfloat16)
                leaves.append(a)
            return jax.tree_util.tree_unflatten(treedef, leaves)

        template = jax.eval_shape(
            lambda r, i: factor_one(jax.lax.complex(r, i).astype(dtype)),
            jax.ShapeDtypeStruct(h_sten.shape[1:], jnp.float32),
            jax.ShapeDtypeStruct(h_sten.shape[1:], jnp.float32),
        )
        _tl, treedef0 = jax.tree_util.tree_flatten(template)

        slab_trees = []
        for s in range(S):
            cached = load_tree(s, treedef0, len(_tl))
            if cached is not None:
                log(f"slab {s}: loaded from disk cache")
                slab_trees.append(cached)
                continue
            t0 = time.time()
            re = jax.device_put(
                np.ascontiguousarray(h_sten[s].real).astype(np.float32), tpu
            )
            im = jax.device_put(
                np.ascontiguousarray(h_sten[s].imag).astype(np.float32), tpu
            )
            with jax.default_device(tpu):
                fac_s = jax.jit(
                    lambda r, i: factor_one(
                        jax.lax.complex(r, i).astype(dtype)
                    )
                )(re, im)
            jax.block_until_ready(fac_s)
            t_fac = time.time() - t0

            t0 = time.time()
            host_leaves = []
            leaves, treedef = jax.tree_util.tree_flatten(fac_s)
            with jax.default_device(tpu):
                slice_f32 = jax.jit(
                    lambda a, p: jax.lax.dynamic_index_in_dim(
                        a, p, 0, keepdims=False
                    ).ravel().astype(jnp.float32)
                )
                for leaf in leaves:
                    if leaf.ndim >= 2 and leaf.size * leaf.dtype.itemsize > 2e8:
                        # chunked per leading-axis plane
                        planes = []
                        for p in range(leaf.shape[0]):
                            flat = np.asarray(slice_f32(leaf, p))
                            planes.append(
                                flat.reshape(leaf.shape[1:]).astype(
                                    ml_dtypes.bfloat16
                                    if leaf.dtype == jnp.bfloat16
                                    else leaf.dtype
                                )
                            )
                        host_leaves.append(np.stack(planes))
                    else:
                        host_leaves.append(fetch(leaf))
            for leaf in leaves:
                try:
                    leaf.delete()
                except Exception:  # noqa: BLE001
                    pass
            save_tree(s, host_leaves)
            slab_trees.append(
                jax.tree_util.tree_unflatten(treedef, host_leaves)
            )
            log(f"slab {s}: factored on TPU in {t_fac:.0f}s, "
                f"fetched in {time.time()-t0:.0f}s")
        fac = jax.tree_util.tree_map(
            lambda *xs: jnp.asarray(np.stack(xs)), *slab_trees
        )
        return fac, None

    return provider


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nn", type=int, default=96)
    ap.add_argument("--subs", type=int, default=8)
    ap.add_argument("--npml", type=int, default=8)
    ap.add_argument("--maxiter", type=int, default=10)
    ap.add_argument("--rtol", type=float, default=1e-4)
    args = ap.parse_args()

    from fast_solver_lippmann_schwinger_tpu.ddm.subdomain3d import (
        build_slab_system_3d,
    )
    from fast_solver_lippmann_schwinger_tpu.parallel.sharded3d import (
        sharded_gs_sweep_3d,
    )
    from fast_solver_lippmann_schwinger_tpu.parallel.sharded import (
        shard_slab_system,
    )
    from jax.sharding import Mesh

    cpus = jax.devices("cpu")
    assert len(cpus) >= 8, f"need 8 virtual CPU devices, have {len(cpus)}"
    tpu = jax.devices("axon")[0]
    log(f"devices: {len(cpus)} cpu + TPU {tpu}")

    nn = args.nn
    h = 1.0 / nn
    k = 1.0 / h
    x = np.arange(nn) * h
    Z, Y, X = np.meshgrid(x, x, x, indexing="ij")
    nu = media.gaussian_bump_3d(X, Y, Z)
    dtype = jnp.complex64

    t0 = time.time()
    op = build_fast_convolution_3d(x, x, x, h, k, nu, dtype=dtype)
    a_st, ag_st = stencils.build_sparse_a_ag_3d(
        k, op, dtype=dtype,
        cache_dir=os.path.join(_REPO, ".artifact_cache"),
    )
    log(f"operator + stencils in {time.time()-t0:.0f}s")

    t0 = time.time()
    slabs = build_slab_system_3d(
        a_st, ag_st, nu, x, h, k, args.subs, npml=args.npml,
        pivot_dtype="yblock_bf16",
        fac_provider=tpu_fac_provider(args.subs, tpu),
    )
    log(f"slab system (TPU-factored, host-assembled) in {time.time()-t0:.0f}s")

    # ---- memory accounting ----
    pivot_bytes = sum(
        leaf.size * leaf.dtype.itemsize
        for leaf in jax.tree_util.tree_leaves(slabs.fac)
    )
    per_dev = pivot_bytes / 8
    log(f"pivot stacks: {pivot_bytes/1e9:.1f} GB total, "
        f"{per_dev/1e9:.2f} GB per device (single-chip HBM = 16 GB)")
    assert pivot_bytes > 16e9, "config does not exceed single-chip HBM"
    assert per_dev < 16e9

    mesh = Mesh(np.array(cpus[:8]), ("slab",))
    slabs_sh = shard_slab_system(slabs, mesh)
    # free the unsharded copy of the >16 GB stacks before compiling
    for leaf in jax.tree_util.tree_leaves(slabs.fac):
        try:
            leaf.delete()
        except Exception:  # noqa: BLE001
            pass
    slabs = None

    u_inc = jnp.asarray(np.exp(1j * k * X.ravel()).astype(np.complex64))
    rhs = jax.jit(lambda o, ui: -(o.apply(ui) - ui))(op, u_inc)

    def solve(slabs_arg, a_arg, b):
        # slab system and stencils ride as ARGUMENTS: closure capture would
        # inline the >16 GB pivot stacks as lowered constants
        return gmres(
            op.apply, b,
            preconditioner=lambda v: sharded_gs_sweep_3d(
                slabs_arg, a_arg.matvec(v), mesh
            ),
            rtol=args.rtol, restart=10, maxiter=args.maxiter,
        )

    t0 = time.time()
    with mesh:
        u, info = jax.jit(solve)(slabs_sh, a_st, rhs)
        u.block_until_ready()
    t_solve = time.time() - t0
    res = float(np.linalg.norm(np.asarray(op.apply(u) - rhs))
                / np.linalg.norm(np.asarray(rhs)))
    iters = int(np.asarray(info.n_iterations))
    log(f"sharded solve: {iters} iterations, true residual {res:.2e}, "
        f"wall {t_solve:.0f}s (virtual mesh: correctness/capacity, not speed)")

    print(json.dumps({
        "config": f"{nn}^3, {args.subs} z-slabs, yblock_bf16 pivots",
        "pivot_bytes_total_GB": round(pivot_bytes / 1e9, 2),
        "pivot_bytes_per_device_GB": round(per_dev / 1e9, 3),
        "exceeds_single_chip_16GB": pivot_bytes > 16e9,
        "n_devices": 8,
        "outer_iterations": iters,
        "true_residual": res,
        "converged": bool(np.asarray(info.converged)),
    }))


if __name__ == "__main__":
    main()
