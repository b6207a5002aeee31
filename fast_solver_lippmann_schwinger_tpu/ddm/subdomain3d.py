"""3D slab subdomains + Gauss-Seidel sweeping preconditioner.

The reference ships NO 3D domain decomposition: its
``examples/example3D_Polarized_traces.jl`` is a comment-only duplicate of
``examples/example3D.jl`` and no 3D ``Subdomain`` exists (see SURVEY.md
section 2 dead-code notes).  This module supplies the missing capability
TPU-natively, extending the 2D construction (``src/subdomains.jl:2-107``
semantics) by one dimension:

* the domain is cut into z-slabs, each extended by ``npml`` absorbing
  planes where the medium is tapered by the same cubic-spline cutoff and
  quadratic complex shift as 2D (``src/subdomains.jl:46-68``);
* the local matrix is the sparsified global operator restricted to the
  slab with its first/last two PLANES replaced by the global boundary
  (annihilator) rows (2D: lines, ``src/subdomains.jl:76-86``);
* interface traces are (m, n) planes; inter-plane couplings are 9-point
  in-plane stencils instead of tridiagonal bands;
* local solves are plane block-Thomas factorizations
  (``sparse/direct.py:factor_stencil_3d``), batched over slabs.

The sweep recursion is structurally identical to the 2D
``precondGSOptimized`` (``src/preconditioner.jl:557-630``) with
line -> plane substitutions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from fast_solver_lippmann_schwinger_tpu.ddm.subdomain import (
    _filter_profile,
    _shift_profile,
    subdomain_limits,
)
from fast_solver_lippmann_schwinger_tpu.sparse.direct import (
    BlockTridiagFactorization3D,
    _plane_stencil_matvec,
    block_thomas_solve_3d,
    block_thomas_solve_cached_3d,
    block_thomas_solve_resume_3d,
    factor_stencil_3d,
)
from fast_solver_lippmann_schwinger_tpu.sparse.stencil_matrix import StencilMatrix3D
from fast_solver_lippmann_schwinger_tpu.utils.host import to_device_complex


def absorbing_nu_3d(nu_slab: np.ndarray, z1: np.ndarray, h: float, k: float,
                    ndelta: int, is_bottom: bool, is_top: bool,
                    shift_factor: float = 2.0) -> np.ndarray:
    """Cutoff + complex-shifted medium on the extended z-slab.

    The 1D profiles along z are exactly the 2D ones
    (``src/subdomains.jl:46-68``), broadcast over the (m, n) plane.
    """
    l1 = len(z1)
    if is_bottom:
        a1, b1 = z1[0] - h, z1[0]
        s1 = z1[0] - h
    else:
        a1, b1 = z1[2], z1[ndelta - 3]
        s1 = z1[ndelta - 3]
    if is_top:
        b2, a2 = z1[l1 - 1], z1[l1 - 1] + h
        s2 = z1[l1 - 1] + h
    else:
        b2, a2 = z1[l1 - ndelta + 1], z1[l1 - 3]
        s2 = z1[l1 - ndelta + 1]
    filt = _filter_profile(a1, b1, b2, a2, z1)
    shift = _shift_profile(s1, s2, z1)
    return filt[:, None, None] * (
        nu_slab - (shift_factor * k) * 1j * shift[:, None, None]
    )


@struct.dataclass
class SlabSystem3D:
    """All z-slabs, batched and end-padded (3D analog of ``SlabSystem``)."""

    fac: BlockTridiagFactorization3D  # batched: cinv (S, l1_max, mn, mn), ...
    # trace-plane indices (0-based local planes); clamped to 0 where absent
    l0: jnp.ndarray                # (S,)
    l1: jnp.ndarray
    ln: jnp.ndarray
    lnp: jnp.ndarray
    has_top: jnp.ndarray           # (S,) bool: slab has an upper neighbor -1
    has_bot: jnp.ndarray           # (S,) bool: slab has a lower neighbor +1
    src_plane: jnp.ndarray         # (S, l1_max) int32 global plane owned
    src_valid: jnp.ndarray         # (S, l1_max) bool
    owner: jnp.ndarray             # (l,) int32
    owner_plane: jnp.ndarray       # (l,) int32
    # coupling stencils at the trace planes (S, m, n, 3, 3)
    cpl_01: jnp.ndarray            # H[ind_0, ind_1]
    cpl_10: jnp.ndarray            # H[ind_1, ind_0]
    cpl_n_np: jnp.ndarray          # H[ind_n, ind_np]
    cpl_np_n: jnp.ndarray          # H[ind_np, ind_n]
    n: int = struct.field(pytree_node=False)
    m: int = struct.field(pytree_node=False)
    l: int = struct.field(pytree_node=False)
    n_subs: int = struct.field(pytree_node=False)
    l1_max: int = struct.field(pytree_node=False)
    # backward-pass planes reaching the deepest bottom trace (0 = full)
    trace_tail: int = struct.field(pytree_node=False, default=0)
    # pivot block axis: "z" (z-planes, (mn)^2 pivots, tail/resume
    # optimizations) or "y" (y-planes, (l1 n)^2 pivots — l1/m the memory,
    # exact; THE >=96^3-on-one-chip layout)
    pivot_layout: str = struct.field(pytree_node=False, default="z")
    # first plane carrying a top trace (static; 0 = no head skip)
    trace_head: int = struct.field(pytree_node=False, default=0)
    # optional Pallas plane stack (sparse/pallas_plane.py): plane pivots
    # stream HBM->VMEM via scalar-prefetch (slab, plane) indexing instead of
    # per-step gather copies of the multi-GB stacks
    pfac: object = None


def build_slab_system_3d(
    a_st: StencilMatrix3D,
    ag_st: StencilMatrix3D,
    nu: np.ndarray,
    z: np.ndarray,
    h: float,
    k: float,
    n_subs: int,
    npml: int = 5,
    shift_factor: float = 2.0,
    a_host: np.ndarray | None = None,
    ag_host: np.ndarray | None = None,
    pivot_dtype: str = "full",
    pivot_band: int | None = None,
    cache_dir: str | None = None,
    fac_provider=None,
) -> SlabSystem3D:
    """Construct and factor all z-slabs (3D analog of ``build_slab_system``).

    ``pivot_dtype`` in {"full", "bf16", "yblock", "yblock_bf16",
    "yblock_int8"} selects
    plane-pivot storage and block axis (``sparse/direct.py``): the dense
    (mn, mn) z-plane pivot inverses are the 3D memory wall; ``bf16`` halves
    them, and the ``yblock`` layouts factor each slab over y-planes instead
    — (l1 n)^2 pivot blocks, i.e. l1/m of the memory, EXACT solves — which
    is what makes >=96^3 feasible on one chip (banded in-plane truncation
    was measured and rejected: no in-plane absorption, no decay).

    A ``_pallas`` suffix (``bf16_pallas``, ``yblock_bf16_pallas``,
    ``yblock_int8_pallas``) stores the same pivots in the Pallas plane-stack
    layout (``sparse/pallas_plane.py``): the sweeps' plane solves then
    stream each pivot plane HBM->VMEM via scalar-prefetch (slab, plane)
    indexing instead of paying per-step gather copies of the multi-GB
    stacks (the overhead that cost 2D ~2.1x before its fused kernels).

    ``fac_provider(h_sten, dtype, factor_one)``, when given, supplies the
    batched ``(fac, pfac)`` instead of the in-process factorization —
    ``factor_one`` is the per-slab factoring function for the requested
    pivot mode.  Used by the beyond-HBM capacity path, which factors slabs
    one at a time on an accelerator and assembles the (larger-than-one-
    device) stacks on the host/CPU mesh."""
    if npml < 5:
        # see build_slab_system: the cutoff knots need >= 5 absorbing planes
        raise ValueError(f"npml must be >= 5 for ordered cutoff knots, got {npml}")
    l, m, n = a_st.l, a_st.m, a_st.n
    dtype = a_st.values.dtype
    nu = np.asarray(nu).reshape(l, m, n)
    z = np.asarray(z)
    if a_host is not None and ag_host is not None:
        a_vals, ag_vals = np.asarray(a_host), np.asarray(ag_host)
    else:
        from fast_solver_lippmann_schwinger_tpu.utils.host import fetch

        a_vals = fetch(a_st.values)
        ag_vals = fetch(ag_st.values)

    ind1, indn = subdomain_limits(l, n_subs)
    kstart = np.maximum(ind1 - npml, 0)
    kend = np.minimum(indn + npml, l - 1)
    l1 = kend - kstart + 1
    l1_max = int(l1.max())

    S = n_subs
    h_sten = np.zeros((S, l1_max, m, n, 3, 3, 3), dtype=np.complex128)
    pl0 = np.full(S, -1, np.int32)
    pl1 = np.full(S, -1, np.int32)
    pln = np.full(S, -1, np.int32)
    plnp = np.full(S, -1, np.int32)
    src_plane = np.zeros((S, l1_max), np.int32)
    src_valid = np.zeros((S, l1_max), bool)
    owner = np.zeros(l, np.int32)
    owner_plane = np.zeros(l, np.int32)

    for s in range(S):
        ks, ke = int(kstart[s]), int(kend[s])
        lsl = int(l1[s])
        z1 = z[ks : ke + 1]
        is_bottom = ind1[s] == 0
        is_top = indn[s] == l - 1

        # slab stencil classes by plane: plane 0 -> global z-LO classes,
        # plane lsl-1 -> z-HI classes, interior planes -> z-MID classes
        # (the global fields are class-constant in z away from the two
        # boundary planes, so slicing them realizes exactly this)
        mid = (l - 1) // 2
        a_slab = np.empty((lsl, m, n, 3, 3, 3), np.complex128)
        ag_slab = np.empty_like(a_slab)
        a_slab[:] = a_vals[mid][None]
        ag_slab[:] = ag_vals[mid][None]
        a_slab[0] = a_vals[0]
        ag_slab[0] = ag_vals[0]
        a_slab[lsl - 1] = a_vals[l - 1]
        ag_slab[lsl - 1] = ag_vals[l - 1]

        nu_loc = absorbing_nu_3d(
            nu[ks : ke + 1], z1, h, k, npml, is_bottom, is_top, shift_factor
        )
        nu_bc = nu_loc.copy()
        if not is_bottom:
            nu_bc[0] = nu[0]
            nu_bc[1] = nu[1]
        if not is_top:
            nu_bc[lsl - 2] = nu[l - 2]
            nu_bc[lsl - 1] = nu[l - 1]

        bc_rows = np.zeros(lsl, bool)
        if not is_bottom:
            bc_rows[[0, 1]] = True
        if not is_top:
            bc_rows[[lsl - 2, lsl - 1]] = True

        def col_field(nu_field):
            nup = np.pad(nu_field, ((1, 1), (1, 1), (1, 1)))
            cols = np.empty((lsl, m, n, 3, 3, 3), np.complex128)
            for dk in range(3):
                for dj in range(3):
                    for di in range(3):
                        cols[:, :, :, dk, dj, di] = nup[
                            dk : dk + lsl, dj : dj + m, di : di + n
                        ]
            return cols

        cols = np.where(
            bc_rows[:, None, None, None, None, None],
            col_field(nu_bc),
            col_field(nu_loc),
        )
        h_sten[s, :lsl] = a_slab + (k ** 2) * ag_slab * cols
        # identity padding planes
        h_sten[s, lsl:, :, :, 1, 1, 1] = 1.0

        if not is_bottom:
            pl0[s] = npml - 1
            pl1[s] = npml
        if not is_top:
            pln[s] = lsl - npml - 1
            plnp[s] = lsl - npml

        int_lo = int(ind1[s] - ks)
        int_hi = int(indn[s] - ks)
        for ell in range(int_lo, int_hi + 1):
            src_plane[s, ell] = ks + ell
            src_valid[s, ell] = True
            owner[ks + ell] = s
            owner_plane[ks + ell] = ell

    def plane_coupling(planes, dk):
        out = np.zeros((S, m, n, 3, 3), np.complex128)
        for s in range(S):
            if planes[s] >= 0:
                out[s] = h_sten[s, planes[s], :, :, dk, :, :]
        return out

    cpl_01 = plane_coupling(pl0, 2)
    cpl_10 = plane_coupling(pl1, 0)
    cpl_n_np = plane_coupling(pln, 2)
    cpl_np_n = plane_coupling(plnp, 0)

    h_dev = to_device_complex(h_sten, dtype)
    use_pallas = pivot_dtype.endswith("_pallas")
    base_pd = pivot_dtype[: -len("_pallas")] if use_pallas else pivot_dtype
    layout = "y" if base_pd.startswith("yblock") else "z"
    storage = (
        "bf16" if base_pd in ("bf16", "yblock_bf16")
        else "int8" if base_pd in ("int8", "yblock_int8") else "full"
    )
    if use_pallas and storage == "full":
        storage = "bf16"   # the Pallas stack stores compressed pivots

    def _factor(v):
        if layout == "y":
            # block over y: transpose grid axes (l, m, n) -> (m, l, n) and
            # stencil offset axes to match — the factorization machinery is
            # axis-agnostic, so the y-blocked slab factorization is the
            # z-plane code on the transposed stencil field
            v = jnp.transpose(v, (1, 0, 2, 4, 3, 5))
        return factor_stencil_3d(
            StencilMatrix3D(values=v), pivot_dtype=storage,
            pivot_band=pivot_band,
        )

    def _factor_all(v):
        fac_x = jax.lax.map(_factor, v)
        if not use_pallas:
            return fac_x, None
        # convert to the plane-stack layout INSIDE the same program: the
        # pads are no-ops at lane-multiple plane sizes, so XLA aliases the
        # compressed stack rather than doubling the 3D memory wall
        from fast_solver_lippmann_schwinger_tpu.sparse import pallas_plane

        pfac = pallas_plane.build_plane_stack(fac_x)
        fac_ph = BlockTridiagFactorization3D(
            cinv=jnp.zeros(fac_x.lsten.shape[:2] + (0, 0), dtype=v.dtype),
            lsten=fac_x.lsten, usten=fac_x.usten,
        )
        return fac_ph, pfac

    # checkpoint/resume: same scheme as the 2D builder (eval_shape template,
    # save only where host fetches are cheap)
    fac = pfac = None
    loaded = None
    cache_path = None
    if cache_dir is not None:
        import hashlib
        import os

        from fast_solver_lippmann_schwinger_tpu.utils import checkpoint

        key = checkpoint.config_key(
            h_digest=hashlib.sha256(
                np.ascontiguousarray(h_sten).tobytes()
            ).hexdigest(),
            shape=list(h_sten.shape),
            pivot_dtype=pivot_dtype,
            pivot_band=pivot_band,
            dtype=str(dtype),
        )
        cache_path = os.path.join(cache_dir, f"slabfac3d_{key}.npz")
        template = jax.eval_shape(_factor_all, h_dev)
        loaded = checkpoint.load_arrays(cache_path, like=template)
        if loaded is not None:
            fac, pfac = loaded
    if loaded is None and fac_provider is not None:
        fac, pfac = fac_provider(h_sten, dtype, _factor)
        loaded = (fac, pfac)
    if loaded is None:
        # slabs factor SEQUENTIALLY (lax.map, not vmap): each plane
        # inversion already fills the MXU, and vmap would multiply the
        # full-precision (l1 n)^2 factorization temporaries by S — at 96^3
        # that is the difference between fitting and OOM
        fac, pfac = jax.jit(_factor_all)(h_dev)
        if cache_path is not None and jax.default_backend() == "cpu":
            from fast_solver_lippmann_schwinger_tpu.utils import checkpoint

            checkpoint.save_arrays(cache_path, (fac, pfac))

    return SlabSystem3D(
        fac=fac,
        l0=jnp.asarray(np.maximum(pl0, 0)),
        l1=jnp.asarray(np.maximum(pl1, 0)),
        ln=jnp.asarray(np.maximum(pln, 0)),
        lnp=jnp.asarray(np.maximum(plnp, 0)),
        has_top=jnp.asarray(pl0 >= 0),
        has_bot=jnp.asarray(pln >= 0),
        src_plane=jnp.asarray(src_plane),
        src_valid=jnp.asarray(src_valid),
        owner=jnp.asarray(owner),
        owner_plane=jnp.asarray(owner_plane),
        cpl_01=to_device_complex(cpl_01, dtype),
        cpl_10=to_device_complex(cpl_10, dtype),
        cpl_n_np=to_device_complex(cpl_n_np, dtype),
        cpl_np_n=to_device_complex(cpl_np_n, dtype),
        n=n,
        m=m,
        l=l,
        n_subs=S,
        l1_max=l1_max,
        trace_tail=(int(l1_max - pln[pln >= 0].min()) + 1
                    if (pln >= 0).any() else 0),
        pivot_layout=layout,
        trace_head=(int(pl0[pl0 >= 0].min()) if (pl0 >= 0).any() else 0),
        pfac=pfac,
    )


def slab_solve_3d(slabs: SlabSystem3D, fac_slice, rhs: jnp.ndarray,
                  start: int = 0, tail: int = 0) -> jnp.ndarray:
    """One slab's local solve for rhs (l1_max, mn[, r]), dispatching on the
    pivot block axis.  The y layout transposes rhs to y-major, solves the
    y-blocked factorization, and transposes back (``start``/``tail`` are
    z-axis optimizations and do not apply there)."""
    if slabs.pivot_layout == "y":
        l1, m, n = slabs.l1_max, slabs.m, slabs.n
        extra = rhs.shape[2:]
        r = rhs.reshape((l1, m, n) + extra)
        r = jnp.moveaxis(r, 1, 0).reshape((m, l1 * n) + extra)
        u = block_thomas_solve_3d(fac_slice, r)
        u = jnp.moveaxis(u.reshape((m, l1, n) + extra), 0, 1)
        return u.reshape((l1, m * n) + extra)
    if start or tail:
        from fast_solver_lippmann_schwinger_tpu.sparse.direct import (
            block_thomas_solve_support_3d,
        )

        return block_thomas_solve_support_3d(
            fac_slice, rhs, start=start, tail=tail
        )
    return block_thomas_solve_3d(fac_slice, rhs)


def partition_source_3d(slabs: SlabSystem3D, b: jnp.ndarray) -> jnp.ndarray:
    """Scatter a global (l*m*n[, r]) source into per-slab interior planes
    (trailing RHS columns ride along)."""
    bg = b.reshape((slabs.l, slabs.m * slabs.n) + b.shape[1:])
    gathered = bg[slabs.src_plane]                 # (S, l1_max, mn) + extra
    mask = slabs.src_valid.reshape(
        slabs.src_valid.shape + (1,) * (gathered.ndim - 2)
    )
    return jnp.where(mask, gathered, 0.0)


def gather_interior_3d(slabs: SlabSystem3D, fields: jnp.ndarray) -> jnp.ndarray:
    """Collect per-slab (S, l1_max, mn[, r]) fields back to a flat global
    (l*m*n[, r]) vector."""
    out = fields[slabs.owner, slabs.owner_plane]   # (l, mn) + extra
    return out.reshape((slabs.l * slabs.m * slabs.n,) + fields.shape[3:])


def _fac_at(fac, i):
    return jax.tree_util.tree_map(lambda a: a[i], fac)


def _slab_fac(slabs: SlabSystem3D, i):
    """Slab ``i``'s factorization for the local solves: a Pallas plane view
    (pivots stay in the shared stack, indexed by base offset — no per-slab
    gather of the pivot stack) or a plain tree_map slice of the XLA fac."""
    if slabs.pfac is not None:
        from fast_solver_lippmann_schwinger_tpu.sparse.pallas_plane import (
            PlaneSlabView,
        )

        return PlaneSlabView(
            stack=slabs.pfac,
            lsten=slabs.fac.lsten[i],
            usten=slabs.fac.usten[i],
            base=jnp.asarray(i, jnp.int32) * slabs.pfac.l1,
        )
    return _fac_at(slabs.fac, i)


def _slab_xs(slabs: SlabSystem3D):
    # loop-invariant factorization stacks are indexed inside the bodies,
    # not threaded through scan xs (multi-GB at production sizes)
    return dict(
        idx=jnp.arange(slabs.n_subs),
        l0=slabs.l0, l1=slabs.l1, ln=slabs.ln, lnp=slabs.lnp,
        has_top=slabs.has_top, has_bot=slabs.has_bot,
        cpl_01=slabs.cpl_01, cpl_10=slabs.cpl_10,
        cpl_n_np=slabs.cpl_n_np, cpl_np_n=slabs.cpl_np_n,
    )


def _cpl_apply(sten, plane, m, n):
    """Apply an (m, n, 3, 3) inter-plane coupling stencil to a flat
    (mn[, r]) plane; trailing RHS columns ride along."""
    extra = plane.shape[1:]
    out = _plane_stencil_matvec(sten, plane.reshape((m, n) + extra))
    return out.reshape((m * n,) + extra)


def gs_sweep_3d(slabs: SlabSystem3D, b: jnp.ndarray) -> jnp.ndarray:
    """One optimized Gauss-Seidel down/up sweep over z-slabs:
    ``u ~ Msp^{-1} b`` (plane-trace analog of ``precondGSOptimized``,
    ``src/preconditioner.jl:557-630``).

    ``b`` may carry trailing RHS columns (l*m*n, r): like the 2D sweep,
    the plane solves then stream each pivot plane from HBM once for all r
    columns (multi-source amortization)."""
    if slabs.pivot_layout == "y":
        return _gs_sweep_3d_plain(slabs, b)
    rhs0 = partition_source_3d(slabs, b)   # (S, l1_max, mn[, r])
    if slabs.n_subs == 1:
        # no interfaces: exact Msp solve in one plain substitution pair
        # (see the 2D fast path in ddm/sweeps.py:gs_sweep)
        u = slab_solve_3d(slabs, _slab_fac(slabs, 0), rhs0[0])[None]
        return gather_interior_3d(slabs, u)
    dtype = rhs0.dtype
    m, n = slabs.m, slabs.n
    mn = m * n
    extra = rhs0.shape[3:]

    def down_step(carry, xs):
        u_n_prev, u_np_prev = carry
        rhs = xs["rhs"]
        add0 = _cpl_apply(xs["cpl_01"], u_np_prev, m, n)
        add1 = -_cpl_apply(xs["cpl_10"], u_n_prev, m, n)
        zero = jnp.zeros_like(add0)
        rhs = rhs.at[xs["l0"]].add(jnp.where(xs["has_top"], add0, zero))
        rhs = rhs.at[xs["l1"]].add(jnp.where(xs["has_top"], add1, zero))
        # down solves only consume bottom traces (truncated backward pass);
        # cache the forward stacks for the up solve's resume path
        v, y_c, t_c = block_thomas_solve_cached_3d(
            _slab_fac(slabs, xs["idx"]), rhs, slabs.trace_tail
        )
        v = v.reshape((slabs.l1_max, mn) + extra)
        return (v[xs["ln"]], v[xs["lnp"]]), (rhs, v[xs["lnp"]], y_c, t_c)

    zeros_p = jnp.zeros((mn,) + extra, dtype)
    xs = dict(_slab_xs(slabs), rhs=rhs0)
    (_, _), (rhs_down, u_np_all, y_all, t_all) = jax.lax.scan(
        down_step, (zeros_p, zeros_p), xs
    )

    u_np_above = jnp.concatenate([zeros_p[None], u_np_all[:-1]], axis=0)

    def up_step(carry, xs):
        u_0_next, u_1_next = carry
        rhs = xs["rhs"]
        addnp = _cpl_apply(xs["cpl_np_n"], u_0_next, m, n)
        addn = -_cpl_apply(xs["cpl_n_np"], u_1_next, m, n)
        zero = jnp.zeros_like(addnp)
        rhs = rhs.at[xs["lnp"]].add(jnp.where(xs["has_bot"], addnp, zero))
        rhs = rhs.at[xs["ln"]].add(jnp.where(xs["has_bot"], addn, zero))
        u = block_thomas_solve_resume_3d(
            _slab_fac(slabs, xs["idx"]), rhs, xs["y_c"], xs["t_c"],
            slabs.trace_tail,
        )
        u = u.reshape((slabs.l1_max, mn) + extra)
        u_0 = u[xs["l0"]]
        u_1 = u[xs["l1"]] - xs["u_np_above"]   # reflection correction
        return (u_0, u_1), u

    xs_up = dict(_slab_xs(slabs), rhs=rhs_down, u_np_above=u_np_above,
                 y_c=y_all, t_c=t_all)
    (_, _), u = jax.lax.scan(up_step, (zeros_p, zeros_p), xs_up, reverse=True)
    return gather_interior_3d(slabs, u)


def _gs_sweep_3d_plain(slabs: SlabSystem3D, b: jnp.ndarray) -> jnp.ndarray:
    """Sweep variant with plain (uncached) local solves — used by the
    y-blocked pivot layout, whose solves have no z-tail/resume structure."""
    rhs0 = partition_source_3d(slabs, b)   # (S, l1_max, mn[, r])
    if slabs.n_subs == 1:
        u = slab_solve_3d(slabs, _slab_fac(slabs, 0), rhs0[0])[None]
        return gather_interior_3d(slabs, u)
    dtype = rhs0.dtype
    m, n = slabs.m, slabs.n

    def down_step(carry, xs):
        u_n_prev, u_np_prev = carry
        rhs = xs["rhs"]
        add0 = _cpl_apply(xs["cpl_01"], u_np_prev, m, n)
        add1 = -_cpl_apply(xs["cpl_10"], u_n_prev, m, n)
        zero = jnp.zeros_like(add0)
        rhs = rhs.at[xs["l0"]].add(jnp.where(xs["has_top"], add0, zero))
        rhs = rhs.at[xs["l1"]].add(jnp.where(xs["has_top"], add1, zero))
        v = slab_solve_3d(slabs, _slab_fac(slabs, xs["idx"]), rhs)
        return (v[xs["ln"]], v[xs["lnp"]]), (rhs, v[xs["lnp"]])

    zeros_p = jnp.zeros(rhs0.shape[2:], dtype)
    xs = dict(_slab_xs(slabs), rhs=rhs0)
    (_, _), (rhs_down, u_np_all) = jax.lax.scan(
        down_step, (zeros_p, zeros_p), xs
    )
    u_np_above = jnp.concatenate([zeros_p[None], u_np_all[:-1]], axis=0)

    def up_step(carry, xs):
        u_0_next, u_1_next = carry
        rhs = xs["rhs"]
        addnp = _cpl_apply(xs["cpl_np_n"], u_0_next, m, n)
        addn = -_cpl_apply(xs["cpl_n_np"], u_1_next, m, n)
        zero = jnp.zeros_like(addnp)
        rhs = rhs.at[xs["lnp"]].add(jnp.where(xs["has_bot"], addnp, zero))
        rhs = rhs.at[xs["ln"]].add(jnp.where(xs["has_bot"], addn, zero))
        u = slab_solve_3d(slabs, _slab_fac(slabs, xs["idx"]), rhs)
        u_0 = u[xs["l0"]]
        u_1 = u[xs["l1"]] - xs["u_np_above"]   # reflection correction
        return (u_0, u_1), u

    xs_up = dict(_slab_xs(slabs), rhs=rhs_down, u_np_above=u_np_above)
    (_, _), u = jax.lax.scan(up_step, (zeros_p, zeros_p), xs_up, reverse=True)
    return gather_interior_3d(slabs, u)


@struct.dataclass
class GSPreconditioner3D:
    """Single-direction z-sweep preconditioner for the sparsified 3D system."""

    slabs: SlabSystem3D

    def apply(self, b: jnp.ndarray) -> jnp.ndarray:
        return gs_sweep_3d(self.slabs, b)

    def apply_batch(self, b_batch: jnp.ndarray) -> jnp.ndarray:
        """(R, l*m*n) joint batch apply (``gmres_batched`` convention)."""
        return self.apply(b_batch.T).T

    def __call__(self, b):
        return self.apply(b)


@struct.dataclass
class SingleSweepPreconditioner3D:
    """``b -> GS_sweep_3d(As b)`` — the z-sweep applied to the full 3D LS
    system (3D analog of the 2D ``SingleSweepPreconditioner``; capability
    the reference advertises but never implements)."""

    slabs: SlabSystem3D
    a_s: StencilMatrix3D

    def apply(self, b: jnp.ndarray) -> jnp.ndarray:
        return gs_sweep_3d(self.slabs, self.a_s.matvec(b))

    def apply_batch(self, b_batch: jnp.ndarray) -> jnp.ndarray:
        """(R, l*m*n) joint batch apply: the z-sweep's plane solves stream
        each pivot plane once for the whole multi-source batch."""
        return self.apply(b_batch.T).T

    def __call__(self, b):
        return self.apply(b)
