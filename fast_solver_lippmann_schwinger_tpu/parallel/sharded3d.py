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


def make_sharded_sweep_preconditioner_3d(slabs, a_s, mesh, axis="slab"):
    """``b -> GS_sweep_3d(As b)`` distributed — the 3D
    ``SingleSweepPreconditioner`` over a z-slab mesh."""

    def apply_(b):
        return sharded_gs_sweep_3d(slabs, a_s.matvec(b), mesh, axis)

    return apply_
