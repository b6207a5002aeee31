"""Multi-chip z-slab-parallel 3D sweeps via ``shard_map`` over a device mesh.

3D analog of ``parallel/sharded.py``: each z-slab's factorization lives on
its owner device, the down/up Gauss-Seidel recursions run as a masked stage
loop with the two interface trace PLANES ((m, n) each) moved by a
``psum``-broadcast, and the interiors are gathered with a final ``psum``.
The reference has no 3D DDM at all (SURVEY.md section 2 dead-code notes);
BASELINE.json's final config ("3D ... multi-host block-partitioned
subdomains") is exactly this layer.

The local solves dispatch through ``slab_solve_3d``, so both the z-plane
and the y-blocked (>=96^3) pivot layouts shard identically.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from fast_solver_lippmann_schwinger_tpu.ddm.subdomain3d import (
    SlabSystem3D,
    _cpl_apply,
    slab_solve_3d,
)
from fast_solver_lippmann_schwinger_tpu.parallel.sharded import (
    _local_slab,
    slab_sharding_specs,
)


def sharded_gs_sweep_3d(slabs: SlabSystem3D, b: jnp.ndarray, mesh: Mesh,
                        axis: str = "slab") -> jnp.ndarray:
    """Distributed 3D Gauss-Seidel sweep, numerically identical to
    ``ddm.subdomain3d.gs_sweep_3d`` (tested on a forced-host-device CPU
    mesh)."""
    S = slabs.n_subs
    D = mesh.shape[axis]
    assert S % D == 0, f"{S} slabs must divide over {D} devices"
    k = S // D
    m, n = slabs.m, slabs.n
    mn = m * n
    dtype = slabs.cpl_01.dtype
    specs = slab_sharding_specs(slabs, axis)

    def fn(slab_shard, b_rep):
        me = jax.lax.axis_index(axis)
        bg = b_rep.reshape(slabs.l, mn)
        rhs_local = jnp.where(
            slab_shard.src_valid[..., None], bg[slab_shard.src_plane], 0.0
        ).astype(dtype)                                  # (k, l1_max, mn)

        zeros_p = jnp.zeros((mn,), dtype)

        def bcast(val, owner):
            sel = jnp.where(me == owner, 1.0, 0.0).astype(dtype)
            return jax.lax.psum(val * sel, axis)

        # ---- down sweep ----
        u_n, u_np = zeros_p, zeros_p
        u_np_all = jnp.zeros((k, mn), dtype)
        for s in range(S):
            owner, li = s // k, s % k
            sl = _local_slab(slab_shard, li)
            rhs = rhs_local[li]
            add0 = _cpl_apply(sl.cpl_01, u_np, m, n)
            add1 = -_cpl_apply(sl.cpl_10, u_n, m, n)
            rhs = rhs.at[sl.l0].add(jnp.where(sl.has_top, add0, zeros_p))
            rhs = rhs.at[sl.l1].add(jnp.where(sl.has_top, add1, zeros_p))
            v = slab_solve_3d(slabs, sl.fac, rhs)
            mine = me == owner
            rhs_local = rhs_local.at[li].set(
                jnp.where(mine, rhs, rhs_local[li])
            )
            u_np_all = u_np_all.at[li].set(
                jnp.where(mine, v[sl.lnp], u_np_all[li])
            )
            u_n = bcast(v[sl.ln], owner)
            u_np = bcast(v[sl.lnp], owner)

        # ---- up sweep ----
        u_0, u_1 = zeros_p, zeros_p
        out_local = jnp.zeros((k, slabs.l1_max, mn), dtype)
        for s in range(S - 1, -1, -1):
            owner, li = s // k, s % k
            sl = _local_slab(slab_shard, li)
            rhs = rhs_local[li]
            addnp = _cpl_apply(sl.cpl_np_n, u_0, m, n)
            addn = -_cpl_apply(sl.cpl_n_np, u_1, m, n)
            rhs = rhs.at[sl.lnp].add(jnp.where(sl.has_bot, addnp, zeros_p))
            rhs = rhs.at[sl.ln].add(jnp.where(sl.has_bot, addn, zeros_p))
            u = slab_solve_3d(slabs, sl.fac, rhs)
            mine = me == owner
            out_local = out_local.at[li].set(jnp.where(mine, u, out_local[li]))
            # reflection: u_np of the slab above, broadcast from its owner
            if s > 0:
                u_np_above = bcast(u_np_all[(s - 1) % k], (s - 1) // k)
            else:
                u_np_above = zeros_p
            u_0 = bcast(u[sl.l0], owner)
            u_1 = bcast(u[sl.l1], owner) - u_np_above

        # ---- reconstruction ----
        base = me * k
        own = slab_shard.owner                           # replicated (l,)
        mine_planes = (own >= base) & (own < base + k)
        vals = out_local[
            jnp.clip(own - base, 0, k - 1), slab_shard.owner_plane
        ]
        contrib = jnp.where(mine_planes[:, None], vals, 0.0)
        return jax.lax.psum(contrib, axis).reshape(-1)

    shard_fn = jax.shard_map(
        fn,
        mesh=mesh,
        in_specs=(specs, P()),
        out_specs=P(),
        check_vma=False,
    )
    return shard_fn(slabs, b)


def sharded_gs_sweep_3d_pipelined(slabs: SlabSystem3D, b_batch: jnp.ndarray,
                                  mesh: Mesh, axis: str = "slab",
                                  rhs_block: int = 1) -> jnp.ndarray:
    """Wavefront-pipelined multi-source 3D sweep (3D analog of
    ``parallel.sharded.sharded_gs_sweep_pipelined``): k z-slabs per device,
    R sources as ceil(R/B) blocks of ``rhs_block`` columns, 2 (D + RB - 1)
    rounds with the two interface trace planes moved by ``ppermute``.
    Each B-wide local solve streams its pivot planes once for the whole
    block.  Requires the z-plane pivot layout (cached/resumed
    substitutions); the y-blocked layout is a single-chip memory-wall mode
    — multi-chip shards the plane stacks, so z layout is the right one
    here.

    ``b_batch`` (R, l*m*n) replicated -> (R, l*m*n), == vmapped
    ``gs_sweep_3d`` per source (tested on the forced-host-device mesh).
    """
    from fast_solver_lippmann_schwinger_tpu.sparse.direct import (
        block_thomas_solve_cached_3d,
        block_thomas_solve_resume_3d,
    )

    assert slabs.pivot_layout != "y", (
        "pipelined 3D sweep needs the z-plane pivot layout; use "
        "sharded_gs_sweep_3d for the y-blocked layout"
    )
    S = slabs.n_subs
    D = mesh.shape[axis]
    assert S % D == 0, f"{S} slabs must divide over {D} devices"
    k = S // D
    R = b_batch.shape[0]
    B = max(1, min(rhs_block, R))
    RB = -(-R // B)
    if RB * B != R:
        pad = jnp.zeros((RB * B - R, b_batch.shape[1]), b_batch.dtype)
        b_batch = jnp.concatenate([b_batch, pad], axis=0)
    m, n = slabs.m, slabs.n
    mn = m * n
    l1 = slabs.l1_max
    dtype = slabs.cpl_01.dtype
    specs = slab_sharding_specs(slabs, axis)

    def fn(slab_shard, b_rep):
        me = jax.lax.axis_index(axis)
        bg = b_rep.reshape(RB, B, slabs.l, mn)
        rhs_all = jnp.moveaxis(
            jnp.where(
                slab_shard.src_valid[None, None, :, :, None],
                bg[:, :, slab_shard.src_plane], 0.0,
            ),
            1, -1,
        ).astype(dtype)                       # (RB, k, l1, mn, B)

        zeros_p = jnp.zeros((mn, B), dtype)
        zeros2 = jnp.zeros((2, mn, B), dtype)
        fwd = [(i, (i + 1) % D) for i in range(D)]
        bwd = [(i, (i - 1) % D) for i in range(D)]

        slab_xs = dict(
            li=jnp.arange(k),
            l0=slab_shard.l0, l1=slab_shard.l1,
            ln=slab_shard.ln, lnp=slab_shard.lnp,
            has_top=slab_shard.has_top, has_bot=slab_shard.has_bot,
            cpl_01=slab_shard.cpl_01, cpl_10=slab_shard.cpl_10,
            cpl_n_np=slab_shard.cpl_n_np, cpl_np_n=slab_shard.cpl_np_n,
        )

        # ---- down wavefront ----
        u_np_all = jnp.zeros((RB, k, mn, B), dtype)
        y_all = jnp.zeros((RB, k, l1, mn, B), dtype)
        t_all = jnp.zeros((RB, k, l1, mn, B), dtype)

        def down_li(carry2, xs):
            u_n_prev, u_np_prev = carry2
            rhs = xs["rhs"]
            add0 = _cpl_apply(xs["cpl_01"], u_np_prev, m, n)
            add1 = -_cpl_apply(xs["cpl_10"], u_n_prev, m, n)
            rhs = rhs.at[xs["l0"]].add(jnp.where(xs["has_top"], add0, zeros_p))
            rhs = rhs.at[xs["l1"]].add(jnp.where(xs["has_top"], add1, zeros_p))
            v, y_c, t_c = block_thomas_solve_cached_3d(
                _local_slab(slab_shard.fac, xs["li"]), rhs, slabs.trace_tail
            )
            v = v.reshape((l1, mn, B))
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
            y_all = upd(y_all, y_k.reshape(k, l1, mn, B))
            t_all = upd(t_all, t_k.reshape(k, l1, mn, B))
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
            u1_corr = u_1_next - xs["u_np"]   # reflection correction
            addnp = _cpl_apply(xs["cpl_np_n"], u_0_next, m, n)
            addn = -_cpl_apply(xs["cpl_n_np"], u1_corr, m, n)
            rhs = rhs.at[xs["lnp"]].add(jnp.where(xs["has_bot"], addnp, zeros_p))
            rhs = rhs.at[xs["ln"]].add(jnp.where(xs["has_bot"], addn, zeros_p))
            u = block_thomas_solve_resume_3d(
                _local_slab(slab_shard.fac, xs["li"]), rhs,
                xs["y_c"], xs["t_c"], slabs.trace_tail,
            )
            u = u.reshape((l1, mn, B))
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

        out_local0 = jnp.zeros((RB, k, l1, mn, B), dtype)
        (_, out_local), _ = jax.lax.scan(
            up_round, (zeros2, out_local0), jnp.arange(D + RB - 1)
        )

        # ---- reconstruction ----
        base = me * k
        own = slab_shard.owner                # replicated (l,)
        mine_planes = (own >= base) & (own < base + k)
        vals = out_local[:, jnp.clip(own - base, 0, k - 1),
                         slab_shard.owner_plane]          # (RB, l, mn, B)
        contrib = jnp.where(mine_planes[None, :, None, None], vals, 0.0)
        total = jax.lax.psum(contrib, axis)
        return jnp.moveaxis(total, -1, 1).reshape(RB * B, -1)

    shard_fn = jax.shard_map(
        fn,
        mesh=mesh,
        in_specs=(specs, P()),
        out_specs=P(),
        check_vma=False,
    )
    return shard_fn(slabs, b_batch)[:R]


def make_sharded_sweep_preconditioner_3d(slabs, a_s, mesh, axis="slab"):
    """``b -> GS_sweep_3d(As b)`` distributed — the 3D
    ``SingleSweepPreconditioner`` over a z-slab mesh."""

    def apply_(b):
        return sharded_gs_sweep_3d(slabs, a_s.matvec(b), mesh, axis)

    return apply_


def make_sharded_sweep_preconditioner_3d_pipelined(slabs, a_s, mesh,
                                                   axis="slab",
                                                   rhs_block: int = 1):
    """Batched ``(R, N) -> (R, N)`` 3D sweep preconditioner on the
    pipelined wavefront — feed to ``gmres_batched`` for a multi-source
    multi-chip 3D solve."""

    def apply_(b_batch):
        asb = a_s.matvec(b_batch.T).T
        return sharded_gs_sweep_3d_pipelined(
            slabs, asb, mesh, axis, rhs_block
        )

    return apply_
