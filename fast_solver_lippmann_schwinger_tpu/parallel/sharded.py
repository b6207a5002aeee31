"""Multi-chip slab-parallel sweeps via ``shard_map`` over a device mesh.

The reference's distribution machinery is Julia ``Distributed`` object
shipping (``src/Parallel.jl``) and was never actually run multi-node; the
slab sweeps themselves are sequential loops on one process
(``src/preconditioner.jl:576-627``).  Here the slab axis becomes a real
device-mesh axis:

* every slab's factorization and storage lives on its owner device,
* the down/up Gauss-Seidel recursions run as an unrolled stage loop where
  the owning device does its local block-Thomas solve and the four interface
  trace n-vectors move with a ``psum``-broadcast (trace vectors are tiny;
  the collective rides ICI),
* local per-slab solves (the batched factorization, trace extraction, MM
  applies) are embarrassingly slab-parallel.

This file provides a correctness-first sharded sweep (every device executes
every stage masked — wall-clock equals the inherent sequential chain) plus a
wavefront-pipelined multi-RHS sweep where device d processes RHS r at stage
r + d, filling the pipeline when n_rhs >= n_devices.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from fast_solver_lippmann_schwinger_tpu.ddm.subdomain import SlabSystem
from fast_solver_lippmann_schwinger_tpu.sparse.direct import (
    band_matvec,
    block_thomas_solve_cached,
    block_thomas_solve_resume,
)


def slab_sharding_specs(slabs: SlabSystem, axis: str = "slab"):
    """PartitionSpec pytree for a SlabSystem: slab-leading arrays are sharded
    over the mesh axis, global index maps are replicated."""
    S = slabs.n_subs

    def spec(leaf):
        if hasattr(leaf, "shape") and leaf.ndim >= 1 and leaf.shape[0] == S:
            return P(axis)
        return P()

    return jax.tree_util.tree_map(spec, slabs)


def shard_slab_system(slabs: SlabSystem, mesh: Mesh, axis: str = "slab"):
    """Place the slab system on the mesh (slabs split over ``axis``)."""
    specs = slab_sharding_specs(slabs, axis)
    return jax.tree_util.tree_map(
        lambda leaf, sp: jax.device_put(leaf, NamedSharding(mesh, sp)),
        slabs,
        specs,
    )


def _local_slab(tree, li):
    """Static-index into the local slab shard (k slabs per device)."""
    return jax.tree_util.tree_map(lambda a: a[li], tree)


def sharded_gs_sweep(slabs: SlabSystem, b: jnp.ndarray, mesh: Mesh,
                     axis: str = "slab") -> jnp.ndarray:
    """Distributed Gauss-Seidel sweep, numerically identical to
    ``ddm.sweeps.gs_sweep`` (tested on a forced-host-device CPU mesh)."""
    S = slabs.n_subs
    D = mesh.shape[axis]
    assert S % D == 0, f"{S} slabs must divide over {D} devices"
    k = S // D
    n = slabs.n
    dtype = slabs.h_stencils.dtype
    specs = slab_sharding_specs(slabs, axis)

    def fn(slab_shard, b_rep):
        me = jax.lax.axis_index(axis)
        bg = b_rep.reshape(slabs.m, slabs.n)
        # local source partition: shard arrays have leading dim k
        rhs_local = jnp.where(
            slab_shard.src_valid[..., None], bg[slab_shard.src_line], 0.0
        ).astype(dtype)

        zeros_n = jnp.zeros((n,), dtype)

        def bcast(val, owner):
            sel = jnp.where(me == owner, 1.0, 0.0).astype(dtype)
            return jax.lax.psum(val * sel, axis)

        # ---- down sweep ----
        u_n, u_np = zeros_n, zeros_n
        u_np_all = jnp.zeros((k, n), dtype)
        y_all = jnp.zeros((k, slabs.m1_max, n), dtype)
        t_all = jnp.zeros((k, slabs.m1_max, n), dtype)
        for s in range(S):
            owner, li = s // k, s % k
            sl = _local_slab(slab_shard, li)
            rhs = rhs_local[li]
            add0 = band_matvec(sl.cpl_01, u_np)
            add1 = -band_matvec(sl.cpl_10, u_n)
            rhs = rhs.at[sl.l0].add(jnp.where(sl.has_top, add0, zeros_n))
            rhs = rhs.at[sl.l1].add(jnp.where(sl.has_top, add1, zeros_n))
            v, y_c, t_c = block_thomas_solve_cached(
                sl.fac, rhs, slabs.trace_tail
            )
            mine = me == owner
            rhs_local = rhs_local.at[li].set(
                jnp.where(mine, rhs, rhs_local[li])
            )
            u_np_all = u_np_all.at[li].set(
                jnp.where(mine, v[sl.lnp], u_np_all[li])
            )
            # cache the forward-pass stacks for the up sweep's resume path
            y_all = y_all.at[li].set(jnp.where(mine, y_c, y_all[li]))
            t_all = t_all.at[li].set(jnp.where(mine, t_c, t_all[li]))
            u_n = bcast(v[sl.ln], owner)
            u_np = bcast(v[sl.lnp], owner)

        # ---- up sweep ----
        u_0, u_1 = zeros_n, zeros_n
        out_local = jnp.zeros((k, slabs.m1_max, n), dtype)
        for s in range(S - 1, -1, -1):
            owner, li = s // k, s % k
            sl = _local_slab(slab_shard, li)
            rhs = rhs_local[li]
            addnp = band_matvec(sl.cpl_np_n, u_0)
            addn = -band_matvec(sl.cpl_n_np, u_1)
            rhs = rhs.at[sl.lnp].add(jnp.where(sl.has_bot, addnp, zeros_n))
            rhs = rhs.at[sl.ln].add(jnp.where(sl.has_bot, addn, zeros_n))
            u = block_thomas_solve_resume(
                sl.fac, rhs, y_all[li], t_all[li], slabs.trace_tail
            )
            mine = me == owner
            out_local = out_local.at[li].set(jnp.where(mine, u, out_local[li]))
            # reflection: u_np of the slab above, broadcast from its owner
            if s > 0:
                above_owner = (s - 1) // k
                u_np_above = bcast(u_np_all[(s - 1) % k], above_owner)
            else:
                u_np_above = zeros_n
            u_0 = bcast(u[sl.l0], owner)
            u_1 = bcast(u[sl.l1], owner) - u_np_above

        # ---- reconstruction: each device contributes its interior lines ----
        base = me * k
        own = slab_shard.owner  # replicated (m,)
        mine_lines = (own >= base) & (own < base + k)
        vals = out_local[jnp.clip(own - base, 0, k - 1), slab_shard.owner_line]
        contrib = jnp.where(mine_lines[:, None], vals, 0.0)
        return jax.lax.psum(contrib, axis).reshape(-1)

    shard_fn = jax.shard_map(
        fn,
        mesh=mesh,
        in_specs=(specs, P()),
        out_specs=P(),
        check_vma=False,
    )
    return shard_fn(slabs, b)


def sharded_gs_sweep_pipelined(slabs: SlabSystem, b_batch: jnp.ndarray,
                               mesh: Mesh, axis: str = "slab") -> jnp.ndarray:
    """Wavefront-pipelined multi-RHS sweep: device d processes RHS r at
    stage r + d, so with n_rhs >= n_devices the sequential slab chain runs
    at full machine utilization (the scaling answer to the inherently
    serial sweep — SURVEY.md section 2.4 "pipeline them").

    One slab per device.  ``b_batch`` is (R, m*n) replicated; returns the
    (R, m*n) batch of sweep results, numerically identical to vmapping
    ``gs_sweep`` over the batch.  Interface traces move to the neighbor via
    ``ppermute`` each stage, overlapping with the next stage's local solve.
    """
    S = slabs.n_subs
    D = mesh.shape[axis]
    assert S == D, "pipelined sweep runs one slab per device"
    R = b_batch.shape[0]
    n = slabs.n
    dtype = slabs.h_stencils.dtype
    specs = slab_sharding_specs(slabs, axis)

    def fn(slab_shard, b_rep):
        me = jax.lax.axis_index(axis)
        sl = _local_slab(slab_shard, 0)
        bg = b_rep.reshape(R, slabs.m, slabs.n)
        # (R, m1_max, n) local sources for my slab
        rhs_all = jnp.where(
            sl.src_valid[None, :, None], bg[:, sl.src_line], 0.0
        ).astype(dtype)

        zeros_n = jnp.zeros((n,), dtype)
        zeros2 = jnp.zeros((2, n), dtype)
        fwd = [(i, (i + 1) % D) for i in range(D)]
        bwd = [(i, (i - 1) % D) for i in range(D)]

        # ---- down wavefront ----
        recv = zeros2          # traces from the left neighbor, for my r = t - me
        u_np_all = jnp.zeros((R, n), dtype)
        y_all = jnp.zeros((R, slabs.m1_max, n), dtype)
        t_all = jnp.zeros((R, slabs.m1_max, n), dtype)
        for t in range(S + R - 1):
            r = t - me
            valid = (r >= 0) & (r < R)
            rc = jnp.clip(r, 0, R - 1)
            rhs = rhs_all[rc]
            add0 = band_matvec(sl.cpl_01, recv[1])
            add1 = -band_matvec(sl.cpl_10, recv[0])
            rhs = rhs.at[sl.l0].add(jnp.where(sl.has_top, add0, zeros_n))
            rhs = rhs.at[sl.l1].add(jnp.where(sl.has_top, add1, zeros_n))
            v, y_c, t_c = block_thomas_solve_cached(
                sl.fac, rhs, slabs.trace_tail
            )
            rhs_all = rhs_all.at[rc].set(jnp.where(valid, rhs, rhs_all[rc]))
            u_np_all = u_np_all.at[rc].set(
                jnp.where(valid, v[sl.lnp], u_np_all[rc])
            )
            y_all = y_all.at[rc].set(jnp.where(valid, y_c, y_all[rc]))
            t_all = t_all.at[rc].set(jnp.where(valid, t_c, t_all[rc]))
            out = jnp.where(valid, jnp.stack([v[sl.ln], v[sl.lnp]]), zeros2)
            recv = jax.lax.ppermute(out, axis, fwd)

        # ---- up wavefront ----
        recv = zeros2          # raw (u_0, u_1) traces from the slab below
        out_local = jnp.zeros((R, slabs.m1_max, n), dtype)
        for t in range(S + R - 1):
            r = t - (S - 1 - me)
            valid = (r >= 0) & (r < R)
            rc = jnp.clip(r, 0, R - 1)
            rhs = rhs_all[rc]
            # reflection: the sender's raw u_1 is corrected with MY
            # down-sweep u_np for this rhs (the ``u_1 - u_np_above`` of the
            # single-device sweep, src/preconditioner.jl:622)
            u1_corr = recv[1] - u_np_all[rc]
            addnp = band_matvec(sl.cpl_np_n, recv[0])
            addn = -band_matvec(sl.cpl_n_np, u1_corr)
            rhs = rhs.at[sl.lnp].add(jnp.where(sl.has_bot, addnp, zeros_n))
            rhs = rhs.at[sl.ln].add(jnp.where(sl.has_bot, addn, zeros_n))
            u = block_thomas_solve_resume(
                sl.fac, rhs, y_all[rc], t_all[rc], slabs.trace_tail
            )
            out_local = out_local.at[rc].set(
                jnp.where(valid, u, out_local[rc])
            )
            out = jnp.where(valid, jnp.stack([u[sl.l0], u[sl.l1]]), zeros2)
            recv = jax.lax.ppermute(out, axis, bwd)

        own = slab_shard.owner
        mine_lines = own == me
        vals = out_local[:, slab_shard.owner_line]    # (R, m, n) via gather
        contrib = jnp.where(mine_lines[None, :, None], vals, 0.0)
        return jax.lax.psum(contrib, axis).reshape(R, -1)

    shard_fn = jax.shard_map(
        fn,
        mesh=mesh,
        in_specs=(specs, P()),
        out_specs=P(),
        check_vma=False,
    )
    return shard_fn(slabs, b_batch)


def make_sharded_double_sweep(slabs, slabs_t, msp, a_s, mesh, axis="slab"):
    """Sharded version of the alternating bi-directional preconditioner."""

    def transpose_flat(v):
        return v.reshape(msp.m, msp.n).T.reshape(-1)

    def apply_(b):
        asb = a_s.matvec(b)
        u = sharded_gs_sweep(slabs, asb, mesh, axis)
        err = msp.matvec(u) - asb
        u2 = transpose_flat(
            sharded_gs_sweep(slabs_t, transpose_flat(err), mesh, axis)
        )
        return u - u2

    return apply_
