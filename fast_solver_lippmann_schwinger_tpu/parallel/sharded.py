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
                               mesh: Mesh, axis: str = "slab",
                               rhs_block: int = 1) -> jnp.ndarray:
    """Wavefront-pipelined multi-RHS sweep over a general slab layout: k
    slabs per device (S = k * D), any RHS batch size R (including R < D).

    Schedule (GPipe-style block pipeline over the sequential slab chain,
    ``src/preconditioner.jl:576-627``): in round t, device d sweeps its k
    local slabs SEQUENTIALLY for RHS block ``q = t - d`` (masked outside
    [0, RB)), then hands the outgoing interface traces to device d+1 via
    ``ppermute``.  With ``rhs_block = B`` the R right-hand sides are
    processed as RB = ceil(R/B) blocks of B columns each: every local solve
    contracts its streamed pivot planes against the whole block (the HBM
    amortization of the single-chip multi-RHS sweeps), so a sweep costs
    2 (D + RB - 1) rounds of B-wide solves instead of 2 (D + R - 1) rounds
    of single solves — B-fold fewer pivot streams at full fill.
    Pipeline-fill efficiency is RB / (D + RB - 1).

    ``b_batch`` is (R, m*n) replicated; returns the (R, m*n) batch of sweep
    results, numerically identical to vmapping ``gs_sweep`` over the batch
    (tested on the forced-host-device CPU mesh).
    """
    S = slabs.n_subs
    D = mesh.shape[axis]
    assert S % D == 0, f"{S} slabs must divide over {D} devices"
    k = S // D
    R = b_batch.shape[0]
    B = max(1, min(rhs_block, R))
    RB = -(-R // B)
    if RB * B != R:                       # pad to whole blocks
        pad = jnp.zeros((RB * B - R, b_batch.shape[1]), b_batch.dtype)
        b_batch = jnp.concatenate([b_batch, pad], axis=0)
    n = slabs.n
    dtype = slabs.h_stencils.dtype
    specs = slab_sharding_specs(slabs, axis)

    def fn(slab_shard, b_rep):
        me = jax.lax.axis_index(axis)
        bg = b_rep.reshape(RB, B, slabs.m, slabs.n)
        # (RB, k, m1_max, n, B) local sources for my k slabs
        rhs_all = jnp.moveaxis(
            jnp.where(
                slab_shard.src_valid[None, None, :, :, None],
                bg[:, :, slab_shard.src_line], 0.0,
            ),
            1, -1,
        ).astype(dtype)

        zeros_n = jnp.zeros((n, B), dtype)
        zeros2 = jnp.zeros((2, n, B), dtype)
        fwd = [(i, (i + 1) % D) for i in range(D)]
        bwd = [(i, (i - 1) % D) for i in range(D)]

        # per-local-slab scan inputs (the factorization stacks are indexed
        # inside the bodies by ``li`` instead of riding scan xs — scans may
        # materialize copies of their inputs and the pivot stacks are
        # multi-GB at production sizes)
        slab_xs = dict(
            li=jnp.arange(k),
            l0=slab_shard.l0, l1=slab_shard.l1,
            ln=slab_shard.ln, lnp=slab_shard.lnp,
            has_top=slab_shard.has_top, has_bot=slab_shard.has_bot,
            cpl_01=slab_shard.cpl_01, cpl_10=slab_shard.cpl_10,
            cpl_n_np=slab_shard.cpl_n_np, cpl_np_n=slab_shard.cpl_np_n,
        )

        # ---- down wavefront ----
        u_np_all = jnp.zeros((RB, k, n, B), dtype)
        y_all = jnp.zeros((RB, k, slabs.m1_max, n, B), dtype)
        t_all = jnp.zeros((RB, k, slabs.m1_max, n, B), dtype)

        def down_li(carry2, xs):
            u_n_prev, u_np_prev = carry2
            rhs = xs["rhs"]
            add0 = band_matvec(xs["cpl_01"], u_np_prev)
            add1 = -band_matvec(xs["cpl_10"], u_n_prev)
            rhs = rhs.at[xs["l0"]].add(jnp.where(xs["has_top"], add0, zeros_n))
            rhs = rhs.at[xs["l1"]].add(jnp.where(xs["has_top"], add1, zeros_n))
            v, y_c, t_c = block_thomas_solve_cached(
                _local_slab(slab_shard.fac, xs["li"]), rhs, slabs.trace_tail
            )
            return (v[xs["ln"]], v[xs["lnp"]]), (rhs, v[xs["lnp"]], y_c, t_c)

        def down_round(carry, t):
            recv, rhs_all, u_np_all, y_all, t_all = carry
            r = t - me
            valid = (r >= 0) & (r < RB)
            rc = jnp.clip(r, 0, RB - 1)
            (u_n, u_np), (rhs_k, unp_k, y_k, t_k) = jax.lax.scan(
                down_li, (recv[0], recv[1]), dict(slab_xs, rhs=rhs_all[rc])
            )
            upd = lambda buf, new: buf.at[rc].set(
                jnp.where(valid, new, buf[rc])
            )
            rhs_all = upd(rhs_all, rhs_k)
            u_np_all = upd(u_np_all, unp_k)
            y_all = upd(y_all, y_k)
            t_all = upd(t_all, t_k)
            out = jnp.where(valid, jnp.stack([u_n, u_np]), zeros2)
            recv = jax.lax.ppermute(out, axis, fwd)
            return (recv, rhs_all, u_np_all, y_all, t_all), None

        (_, rhs_all, u_np_all, y_all, t_all), _ = jax.lax.scan(
            down_round, (zeros2, rhs_all, u_np_all, y_all, t_all),
            jnp.arange(D + RB - 1),
        )

        # ---- up wavefront ----
        def up_li(carry2, xs):
            u_0_next, u_1_next = carry2
            rhs = xs["rhs"]
            # reflection: the incoming raw u_1 is corrected with the
            # RECEIVING slab's down-sweep u_np (``u_1 - u_np_above``,
            # src/preconditioner.jl:622)
            u1_corr = u_1_next - xs["u_np"]
            addnp = band_matvec(xs["cpl_np_n"], u_0_next)
            addn = -band_matvec(xs["cpl_n_np"], u1_corr)
            rhs = rhs.at[xs["lnp"]].add(jnp.where(xs["has_bot"], addnp, zeros_n))
            rhs = rhs.at[xs["ln"]].add(jnp.where(xs["has_bot"], addn, zeros_n))
            u = block_thomas_solve_resume(
                _local_slab(slab_shard.fac, xs["li"]), rhs,
                xs["y_c"], xs["t_c"], slabs.trace_tail,
            )
            return (u[xs["l0"]], u[xs["l1"]]), u

        def up_round(carry, t):
            recv, out_local = carry
            r = t - (D - 1 - me)
            valid = (r >= 0) & (r < RB)
            rc = jnp.clip(r, 0, RB - 1)
            (u_0, u_1), u_k = jax.lax.scan(
                up_li, (recv[0], recv[1]),
                dict(slab_xs, rhs=rhs_all[rc], u_np=u_np_all[rc],
                     y_c=y_all[rc], t_c=t_all[rc]),
                reverse=True,
            )
            out_local = out_local.at[rc].set(
                jnp.where(valid, u_k, out_local[rc])
            )
            out = jnp.where(valid, jnp.stack([u_0, u_1]), zeros2)
            recv = jax.lax.ppermute(out, axis, bwd)
            return (recv, out_local), None

        out_local0 = jnp.zeros((RB, k, slabs.m1_max, n, B), dtype)
        (_, out_local), _ = jax.lax.scan(
            up_round, (zeros2, out_local0), jnp.arange(D + RB - 1)
        )

        # ---- reconstruction: each device contributes its interior lines ----
        base = me * k
        own = slab_shard.owner             # replicated (m,)
        mine_lines = (own >= base) & (own < base + k)
        vals = out_local[:, jnp.clip(own - base, 0, k - 1),
                         slab_shard.owner_line]          # (RB, m, n, B)
        contrib = jnp.where(mine_lines[None, :, None, None], vals, 0.0)
        total = jax.lax.psum(contrib, axis)              # (RB, m, n, B)
        return jnp.moveaxis(total, -1, 1).reshape(RB * B, -1)

    shard_fn = jax.shard_map(
        fn,
        mesh=mesh,
        in_specs=(specs, P()),
        out_specs=P(),
        check_vma=False,
    )
    return shard_fn(slabs, b_batch)[:R]


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


def make_sharded_double_sweep_pipelined(slabs, slabs_t, msp, a_s, mesh,
                                        axis="slab", rhs_block: int = 1):
    """Batched alternating bi-directional preconditioner on the pipelined
    wavefront sweeps: maps an (R, m*n) batch of right-hand sides through
    ``u - T' GS_x(T (Msp u - As b))`` with both sweeps pipeline-filled by
    the batch (``doublePreconditioner`` semantics,
    ``src/preconditioner.jl:121-130,228-249``, distributed).

    ``rhs_block`` processes the batch in B-wide blocks per pipeline round
    (B-fold fewer pivot streams, see :func:`sharded_gs_sweep_pipelined`).

    Feed to :func:`solver.gmres.gmres_batched` as the preconditioner for a
    multi-direction outer solve — the production multi-chip path (the masked
    ``sharded_gs_sweep`` executes every stage on every device and is kept
    for the single-RHS case only).
    """
    def transpose_flat(v):
        return (
            v.reshape(-1, msp.m, msp.n).transpose(0, 2, 1).reshape(v.shape[0], -1)
        )

    def apply_(b_batch):
        asb = a_s.matvec(b_batch.T).T        # stencil matvec: trailing RHS cols
        u = sharded_gs_sweep_pipelined(slabs, asb, mesh, axis, rhs_block)
        err = msp.matvec(u.T).T - asb
        u2 = transpose_flat(
            sharded_gs_sweep_pipelined(
                slabs_t, transpose_flat(err), mesh, axis, rhs_block
            )
        )
        return u - u2

    return apply_
