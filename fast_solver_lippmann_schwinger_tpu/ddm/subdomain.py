"""Slab subdomains for the method of polarized traces.

TPU-native re-design of the reference's ``Subdomain`` struct
(``src/subdomains.jl:2-107``): the domain is cut into y-slabs, each extended
by ``npml`` absorbing layers where the medium is tapered by a cubic-spline
cutoff and given a quadratic complex shift
(``src/subdomains.jl:46-68``).  The local matrix is the sparsified global
operator restricted to the slab with its first/last two lines replaced by the
global boundary (annihilator) rows (``src/subdomains.jl:76-86``).

Instead of per-slab Julia objects + PARDISO handles, all slabs live in one
batched, end-padded pytree (``SlabSystem``): stencil fields
``(n_subs, m1_max, n, 3, 3)``, batched block-Thomas factorizations, and
per-slab trace/interface index vectors.  Slab factorization is a single
``vmap`` (the reference loops + factorizes sequentially,
``tests/plasma_example.jl:123-128``), and the sweeps are ``lax.scan``s.
"""

from __future__ import annotations

import hashlib
import os

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from fast_solver_lippmann_schwinger_tpu.sparse.direct import (
    BlockTridiagFactorization,
    factor_stencil_2d,
)
from fast_solver_lippmann_schwinger_tpu.sparse.stencil_matrix import StencilMatrix2D
from fast_solver_lippmann_schwinger_tpu.utils.host import to_device_complex


def subdomain_limits(m: int, n_subs: int):
    """Interior line range of each slab (0-based, inclusive).

    Mirrors ``SubDomLimits = round(floor(linspace(1, m+1, nSubs+1)))``
    (``tests/plasma_example.jl:95-99``).
    """
    lim = np.floor(np.linspace(1, m + 1, n_subs + 1)).astype(np.int64)
    ind1 = lim[:-1] - 1
    indn = lim[1:] - 2
    return ind1, indn


def _spline_cutoff(t: np.ndarray) -> np.ndarray:
    """C^1 cubic cutoff: 1 for t<0, 2t^3-3t^2+1 on [0,1), 0 beyond
    (``src/subdomains.jl:46``)."""
    t = np.clip(t, -1.0, 2.0)   # the cubic only matters on [0, 1); clipping
    inside = (t >= 0) & (t < 1)  # avoids overflow when knots coincide (inf/1e-300)
    return np.where(t < 0, 1.0, np.where(inside, 2 * t ** 3 - 3 * t ** 2 + 1, 0.0))


def _filter_profile(a1, b1, b2, a2, y):
    """Rise from 0 at a1 to 1 at b1, plateau, fall to 0 at a2
    (``src/subdomains.jl:47``)."""
    eps = 1e-300
    rise = _spline_cutoff((b1 - y) / max(abs(b1 - a1), eps))
    fall = _spline_cutoff((y - b2) / max(abs(a2 - b2), eps))
    out = np.where(y < b1, rise, np.where(y < b2, 1.0, fall))
    return np.where(y >= a1, out, 0.0)


def _shift_profile(a1, a2, y):
    """Quadratic ramp outside [a1, a2] (``src/subdomains.jl:52``)."""
    return np.where(y <= a1, (y - a1) ** 2, 0.0) + np.where(
        y >= a2, (y - a2) ** 2, 0.0
    )


def absorbing_nu(nu_slab: np.ndarray, y1: np.ndarray, h: float, k: float,
                 ndelta: int, is_bottom: bool, is_top: bool,
                 shift_factor: float = 2.0) -> np.ndarray:
    """Cutoff + complex-shifted medium ``nu1`` on the extended slab.

    ``nu1 = filter(y) * (nu - shift * i * filtershift(y))`` with the
    boundary-dependent knot choices of ``src/subdomains.jl:59-68``.
    """
    m1 = len(y1)
    if is_bottom:
        a1, b1 = y1[0] - h, y1[0]
        s1 = y1[0] - h
    else:
        a1, b1 = y1[2], y1[ndelta - 3]
        s1 = y1[ndelta - 3]
    if is_top:
        b2, a2 = y1[m1 - 1], y1[m1 - 1] + h
        s2 = y1[m1 - 1] + h
    else:
        b2, a2 = y1[m1 - ndelta + 1], y1[m1 - 3]
        s2 = y1[m1 - ndelta + 1]
    filt = _filter_profile(a1, b1, b2, a2, y1)
    shift = _shift_profile(s1, s2, y1)
    return filt[:, None] * (nu_slab - (shift_factor * k) * 1j * shift[:, None])


@struct.dataclass
class SlabSystem:
    """All slabs of one sweep direction, batched and end-padded."""

    h_stencils: jnp.ndarray        # (S, m1_max, n, 3, 3) local matrices
    fac: BlockTridiagFactorization  # batched: cinv (S, m1_max, n, n), ...
    # trace-line indices (0-based local lines); -1 where absent
    l0: jnp.ndarray                # (S,)
    l1: jnp.ndarray
    ln: jnp.ndarray
    lnp: jnp.ndarray
    has_top: jnp.ndarray           # (S,) bool: slab has an upper neighbor -1
    has_bot: jnp.ndarray           # (S,) bool: slab has a lower neighbor +1
    # source partitioning: for each (slab, local line) the global line it
    # owns as interior, or an arbitrary clipped index where invalid
    src_line: jnp.ndarray          # (S, m1_max) int32
    src_valid: jnp.ndarray         # (S, m1_max) bool
    # reconstruction gather: owner slab and local line per global line
    owner: jnp.ndarray             # (m,) int32
    owner_line: jnp.ndarray        # (m,) int32
    n: int = struct.field(pytree_node=False)
    m: int = struct.field(pytree_node=False)
    n_subs: int = struct.field(pytree_node=False)
    m1_max: int = struct.field(pytree_node=False)

    # coupling bands extracted at trace lines (S, n, 3)
    cpl_01: jnp.ndarray            # H[ind_0, ind_1]
    cpl_10: jnp.ndarray            # H[ind_1, ind_0]
    cpl_n_np: jnp.ndarray          # H[ind_n, ind_np]
    cpl_np_n: jnp.ndarray          # H[ind_np, ind_n]
    # backward-pass lines needed to reach the deepest bottom trace (static;
    # 0 = full backward pass) — down sweeps only consume bottom traces
    trace_tail: int = struct.field(pytree_node=False, default=0)
    # first line carrying a top trace (static; 0 = no head skip) — trace-
    # driven local solves have zero rhs above it, so forward substitution
    # can start there with a zero carry
    trace_head: int = struct.field(pytree_node=False, default=0)
    # optional fused-Pallas layout of ``fac`` (sparse/pallas_thomas.py);
    # when present the sweeps stream pivot planes HBM->VMEM via scalar-
    # prefetch indexing instead of gathering per-slab slices
    pfac: object = None


def attach_pallas(slabs: SlabSystem, storage: str = "bf16") -> SlabSystem:
    """Return a copy of ``slabs`` with the fused-Pallas solve layout attached
    (sweeps then dispatch to ``sparse/pallas_thomas.py`` kernels).
    ``storage``: "bf16" or "int8" (half the pivot bytes; see pallas_thomas)."""
    from fast_solver_lippmann_schwinger_tpu.sparse import pallas_thomas as pt

    return slabs.replace(
        pfac=pt.build_pallas_factorization(slabs.fac, storage=storage)
    )


def build_slab_system(
    a_st: StencilMatrix2D,
    ag_st: StencilMatrix2D,
    nu: np.ndarray,
    x: np.ndarray,
    y: np.ndarray,
    h: float,
    k: float,
    n_subs: int,
    npml: int = 10,
    shift_factor: float = 2.0,
    a_host: np.ndarray | None = None,
    ag_host: np.ndarray | None = None,
    pivot_dtype: str = "full",
    pivot_band: int | None = None,
    pivot_rank: int | None = None,
    cache_dir: str | None = None,
) -> SlabSystem:
    """Construct and factor all slabs of one sweep direction.

    ``a_st``/``ag_st`` are the global annihilator fields (their boundary-class
    rows supply the slab's artificial-boundary rows exactly as the
    ``Msp[1:2n,1:2n]`` overwrite at ``src/subdomains.jl:79-86``), ``nu`` is
    the (m, n) medium.
    """
    if npml < 5:
        # absorbing_nu indexes y1[ndelta - 3] / y1[m1 - ndelta + 1]; below 5
        # the cutoff knots mis-order and the spline clamp silently produces a
        # useless (blowing-up) absorbing profile
        raise ValueError(f"npml must be >= 5 for ordered cutoff knots, got {npml}")
    m, n = a_st.m, a_st.n
    dtype = a_st.values.dtype
    nu = np.asarray(nu).reshape(m, n)
    y = np.asarray(y)
    if a_host is not None and ag_host is not None:
        a_vals, ag_vals = np.asarray(a_host), np.asarray(ag_host)
    else:
        from fast_solver_lippmann_schwinger_tpu.utils.host import fetch

        a_vals = fetch(a_st.values)
        ag_vals = fetch(ag_st.values)

    ind1, indn = subdomain_limits(m, n_subs)
    jstart = np.maximum(ind1 - npml, 0)
    jend = np.minimum(indn + npml, m - 1)
    m1 = jend - jstart + 1
    m1_max = int(m1.max())

    S = n_subs
    h_sten = np.zeros((S, m1_max, n, 3, 3), dtype=np.complex128)
    l0 = np.full(S, -1, np.int32)
    l1 = np.full(S, -1, np.int32)
    ln = np.full(S, -1, np.int32)
    lnp = np.full(S, -1, np.int32)
    src_line = np.zeros((S, m1_max), np.int32)
    src_valid = np.zeros((S, m1_max), bool)
    owner = np.zeros(m, np.int32)
    owner_line = np.zeros(m, np.int32)

    for s in range(S):
        js, je = int(jstart[s]), int(jend[s])
        msl = int(m1[s])
        y1 = y[js : je + 1]
        is_bottom = ind1[s] == 0
        is_top = indn[s] == m - 1

        # slab stencil classes: line 0 -> global-bottom (y-LO) classes,
        # line msl-1 -> y-HI classes, interior lines -> MID classes.  Slicing
        # the global fields achieves exactly that because the global fields
        # are class-constant away from the two boundary lines.
        a_slab = np.empty((msl, n, 3, 3), np.complex128)
        ag_slab = np.empty((msl, n, 3, 3), np.complex128)
        mid = (m - 1) // 2  # any global-interior line
        a_slab[:] = a_vals[mid][None]
        ag_slab[:] = ag_vals[mid][None]
        a_slab[0] = a_vals[0]
        ag_slab[0] = ag_vals[0]
        a_slab[msl - 1] = a_vals[m - 1]
        ag_slab[msl - 1] = ag_vals[m - 1]

        # medium fields: nu1 (cutoff + shift) everywhere; boundary-condition
        # rows read the global-domain-edge medium instead
        # (the Msp row overwrite, src/subdomains.jl:79-86)
        nu_loc = absorbing_nu(
            nu[js : je + 1], y1, h, k, npml, is_bottom, is_top, shift_factor
        )
        nu_bc = nu_loc.copy()
        if not is_bottom:
            nu_bc[0] = nu[0]
            nu_bc[1] = nu[1]
        if not is_top:
            nu_bc[msl - 2] = nu[m - 2]
            nu_bc[msl - 1] = nu[m - 1]

        bc_rows = np.zeros(msl, bool)
        if not is_bottom:
            bc_rows[[0, 1]] = True
        if not is_top:
            bc_rows[[msl - 2, msl - 1]] = True

        def col_field(nu_field):
            nup = np.pad(nu_field, ((1, 1), (1, 1)))
            cols = np.empty((msl, n, 3, 3), np.complex128)
            for dj in range(3):
                for di in range(3):
                    cols[:, :, dj, di] = nup[dj : dj + msl, di : di + n]
            return cols

        cols_loc = col_field(nu_loc)
        cols_bc = col_field(nu_bc)
        cols = np.where(bc_rows[:, None, None, None], cols_bc, cols_loc)
        h_slab = a_slab + (k ** 2) * ag_slab * cols

        h_sten[s, :msl] = h_slab
        # identity padding lines
        h_sten[s, msl:, :, 1, 1] = 1.0

        if not is_bottom:
            l0[s] = npml - 1
            l1[s] = npml
        if not is_top:
            ln[s] = msl - npml - 1
            lnp[s] = msl - npml

        int_lo = int(ind1[s] - js)
        int_hi = int(indn[s] - js)
        for ell in range(int_lo, int_hi + 1):
            src_line[s, ell] = js + ell
            src_valid[s, ell] = True
            owner[js + ell] = s
            owner_line[js + ell] = ell

    # coupling bands at the trace lines (rows l0 coupling to line l0+1 is the
    # dj=+1 band, etc.); zero where the trace is absent
    def band_at(lines, dj):
        out = np.zeros((S, n, 3), np.complex128)
        for s in range(S):
            if lines[s] >= 0:
                out[s] = h_sten[s, lines[s], :, dj, :]
        return out

    cpl_01 = band_at(l0, 2)
    cpl_10 = band_at(l1, 0)
    cpl_n_np = band_at(ln, 2)
    cpl_np_n = band_at(lnp, 0)

    # deepest bottom-trace line over slabs that have one (pre-clamp values)
    valid_ln = ln[ln >= 0]
    trace_tail = int(m1_max - valid_ln.min()) + 1 if valid_ln.size else 0
    valid_l0 = l0[l0 >= 0]
    trace_head = int(valid_l0.min()) if valid_l0.size else 0

    h_dev = to_device_complex(h_sten, dtype)

    def _factor(v):
        """(fac, pfac) for the requested pivot mode — the expensive step."""
        if pivot_dtype == "pallas_banded_tail":
            # fused hybrid sweep path: block-banded head pivots + dense bf16
            # tail planes in one Pallas kernel (~0.45x the dense-bf16 pivot
            # bytes at iteration near-parity; sparse/pallas_thomas.py)
            from fast_solver_lippmann_schwinger_tpu.sparse import (
                pallas_thomas as pt,
            )

            tail_keep = min(m1_max, max(trace_tail + 4, 8))

            @jax.jit
            def _factor_pallas_ht(vv):
                fac_full = jax.vmap(
                    lambda w: factor_stencil_2d(StencilMatrix2D(values=w))
                )(vv)
                return (
                    pt.build_pallas_banded_tail(
                        fac_full, width=pivot_band, tail_lines=tail_keep,
                    ),
                    fac_full.lband,
                    fac_full.uband,
                )

            pfac, lb, ub = _factor_pallas_ht(v)
            fac = BlockTridiagFactorization(
                cinv=to_device_complex(
                    np.zeros((S, m1_max, 0, 0)), dtype
                ),
                lband=lb, uband=ub,
            )
            return fac, pfac
        if pivot_dtype in ("pallas", "pallas_int8"):
            # fused-Pallas sweep path: store ONLY the padded/transposed
            # bf16/int8 layout (sparse/pallas_thomas.py); the XLA-side fac
            # keeps the bands (cheap) with a placeholder pivot stack so
            # shape metadata and non-sweep consumers of the bands still work
            from fast_solver_lippmann_schwinger_tpu.sparse import (
                pallas_thomas as pt,
            )

            storage = "int8" if pivot_dtype == "pallas_int8" else "bf16"

            @jax.jit
            def _factor_pallas(vv):
                fac_full = jax.vmap(
                    lambda w: factor_stencil_2d(StencilMatrix2D(values=w))
                )(vv)
                return (
                    pt.build_pallas_factorization(fac_full, storage=storage),
                    fac_full.lband,
                    fac_full.uband,
                )

            pfac, lb, ub = _factor_pallas(v)
            # eager complex creation can raise UNIMPLEMENTED on the tunnel
            # backend — ship the empty placeholder through the jitted
            # real/imag combine instead
            fac = BlockTridiagFactorization(
                cinv=to_device_complex(
                    np.zeros((S, m1_max, 0, 0)), dtype
                ),
                lband=lb, uband=ub,
            )
            return fac, pfac
        if pivot_dtype == "bf16":
            from fast_solver_lippmann_schwinger_tpu.sparse.direct import (
                compress_factorization,
            )

            return jax.jit(
                jax.vmap(
                    lambda vv: compress_factorization(
                        factor_stencil_2d(StencilMatrix2D(values=vv))
                    )
                )
            )(v), None
        if pivot_dtype == "banded":
            from fast_solver_lippmann_schwinger_tpu.sparse.direct import (
                compress_factorization_banded,
            )

            from fast_solver_lippmann_schwinger_tpu.sparse.direct import (
                default_band_width,
            )

            width = (pivot_band if pivot_band is not None
                     else default_band_width(n))
            return jax.jit(
                jax.vmap(
                    lambda vv: compress_factorization_banded(
                        factor_stencil_2d(StencilMatrix2D(values=vv)), width
                    )
                )
            )(v), None
        if pivot_dtype == "banded_tail":
            from fast_solver_lippmann_schwinger_tpu.sparse.direct import (
                compress_factorization_banded_tail,
            )

            from fast_solver_lippmann_schwinger_tpu.sparse.direct import (
                default_band_width,
            )

            width = (pivot_band if pivot_band is not None
                     else default_band_width(n))
            # the near-interface lines (deepest bottom-trace line and below)
            # carry effectively dense pivot inverses — keep them in full
            # bf16 planes so the substitution recursions stay stable
            # (RESULTS.md round 4), with a small safety margin
            tail_keep = min(m1_max, max(trace_tail + 4, 8))
            return jax.jit(
                jax.vmap(
                    lambda vv: compress_factorization_banded_tail(
                        factor_stencil_2d(StencilMatrix2D(values=vv)),
                        width, tail_keep,
                    )
                )
            )(v), None
        if pivot_dtype == "banded_lr":
            from fast_solver_lippmann_schwinger_tpu.sparse.direct import (
                compress_factorization_banded_lr,
            )

            from fast_solver_lippmann_schwinger_tpu.sparse.direct import (
                default_band_width,
            )

            width = (pivot_band if pivot_band is not None
                     else default_band_width(n))
            rank = pivot_rank if pivot_rank is not None else 24
            return jax.jit(
                jax.vmap(
                    lambda vv: compress_factorization_banded_lr(
                        factor_stencil_2d(StencilMatrix2D(values=vv)),
                        width, rank,
                    )
                )
            )(v), None
        return jax.jit(
            jax.vmap(lambda vv: factor_stencil_2d(StencilMatrix2D(values=vv)))
        )(v), None

    # checkpoint/resume (SURVEY.md section 5): the batched factorization is
    # the dominant setup cost (minutes at the 801 headline scale on CPU);
    # cache it keyed on the exact local systems + pivot mode.  The load
    # template comes from jax.eval_shape (no compute); saving fetches to
    # host, so it only runs where fetching is cheap (CPU backend).
    fac = pfac = None
    cache_path = None
    if cache_dir is not None:
        from fast_solver_lippmann_schwinger_tpu.utils import checkpoint

        key = checkpoint.config_key(
            h_digest=hashlib.sha256(
                np.ascontiguousarray(h_sten).tobytes()
            ).hexdigest(),
            shape=list(h_sten.shape),
            pivot_dtype=pivot_dtype,
            pivot_band=pivot_band,
            pivot_rank=pivot_rank,
            dtype=str(dtype),
        )
        cache_path = os.path.join(cache_dir, f"slabfac_{key}.npz")
        template = jax.eval_shape(_factor, h_dev)
        loaded = checkpoint.load_arrays(cache_path, like=template)
        if loaded is not None:
            fac, pfac = loaded
    if fac is None:
        fac, pfac = _factor(h_dev)
        if cache_path is not None and jax.default_backend() == "cpu":
            from fast_solver_lippmann_schwinger_tpu.utils import checkpoint

            checkpoint.save_arrays(cache_path, (fac, pfac))

    return SlabSystem(
        h_stencils=h_dev,
        fac=fac,
        l0=jnp.asarray(np.maximum(l0, 0)),
        l1=jnp.asarray(np.maximum(l1, 0)),
        ln=jnp.asarray(np.maximum(ln, 0)),
        lnp=jnp.asarray(np.maximum(lnp, 0)),
        has_top=jnp.asarray(l0 >= 0),
        has_bot=jnp.asarray(ln >= 0),
        src_line=jnp.asarray(src_line),
        src_valid=jnp.asarray(src_valid),
        owner=jnp.asarray(owner),
        owner_line=jnp.asarray(owner_line),
        n=n,
        m=m,
        n_subs=S,
        m1_max=m1_max,
        cpl_01=to_device_complex(cpl_01, dtype),
        cpl_10=to_device_complex(cpl_10, dtype),
        cpl_n_np=to_device_complex(cpl_n_np, dtype),
        cpl_np_n=to_device_complex(cpl_np_n, dtype),
        trace_tail=trace_tail,
        trace_head=trace_head,
        pfac=pfac,
    )


def partition_source(slabs: SlabSystem, b: jnp.ndarray) -> jnp.ndarray:
    """Scatter a global (m*n,) source into per-slab interior lines
    (``sourcePartition``, ``src/subdomains.jl:291-306``).

    ``b`` may carry trailing RHS columns: (m*n, r) -> (S, m1_max, n, r)."""
    bg = b.reshape((slabs.m, slabs.n) + b.shape[1:])
    gathered = bg[slabs.src_line]                  # (S, m1_max, n) + extra
    mask = slabs.src_valid.reshape(
        slabs.src_valid.shape + (1,) * (gathered.ndim - 2)
    )
    return jnp.where(mask, gathered, 0.0)


def gather_interior(slabs: SlabSystem, fields: jnp.ndarray) -> jnp.ndarray:
    """Collect per-slab (S, m1_max, n[, r]) fields back to a flat global
    (m*n[, r]) vector."""
    out = fields[slabs.owner, slabs.owner_line]    # (m, n) + extra
    return out.reshape((slabs.m * slabs.n,) + fields.shape[3:])
