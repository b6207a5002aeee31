"""Fully-fused Gauss-Seidel sweep kernels.

The per-solve Pallas path (``pallas_thomas.py``) still launches 4 kernels
per slab per sweep (cached fwd/bwd + resume fwd/bwd) inside a ``lax.scan``
— 64 launches per 16-slab sweep — and the inter-slab trace algebra (band
matvecs, rhs line injections, trace gathers) runs as XLA glue between
them.  At the 801 headline the dispatch+glue overhead is ~7-10 ms per
double-sweep apply on the tunnel backend, comparable to the entire pivot
byte bound.

Here ONE kernel walks a whole sweep direction: grid (slab, line-phase)
where each slab runs its forward substitution followed immediately by the
(tail-truncated) backward pass, with the interface traces carried across
slabs in VMEM scratch and the equivalent-source injections
(``precondGSOptimized``'s rhs updates, ``src/preconditioner.jl:575-616``)
applied in-kernel at the trace lines.  The up sweep resumes each slab's
forward pass from the down kernel's carry caches (bit-identical resume, as
in the unfused path) and emits the reconstructed volume.  Two launches per
sweep, zero XLA glue between slabs.

Pivot storage is the banded+tail hybrid layout
(:class:`pallas_thomas.PallasFactorizationBandedTail`) — block-banded head
lines, dense bf16 tail lines — so this kernel is also the byte-minimal
sweep (~0.5x dense-bf16 pivot traffic).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fast_solver_lippmann_schwinger_tpu.sparse.pallas_thomas import (
    PallasFactorizationBandedTail,
    _band_apply_multi,
    _from_rows_b,
    _ht_head_pivot,
    _ht_tail_pivot,
    _resolve_interpret,
    _to_rows_b,
)


def _pack_cpl_rows(cpl, npad):
    """(S, n, 3) complex coupling bands -> (S, 2, 3, np) f32 rows."""
    b = jnp.moveaxis(cpl, -1, -2)                    # (S, 3, n)
    b = jnp.pad(b, [(0, 0), (0, 0), (0, npad - cpl.shape[1])])
    return jnp.stack(
        [jnp.real(b).astype(jnp.float32), jnp.imag(b).astype(jnp.float32)],
        axis=1,
    )


def _inject(row, band_block, trace, pred):
    """``row + pred * (band @ trace)`` for stacked [re; im] rows."""
    r = row.shape[0] // 2
    accr, acci = _band_apply_multi(band_block, trace)
    add = jnp.concatenate([accr, acci], axis=0)
    return jnp.where(pred, row + add, row)


def _pivot_select(w, line, ts, ypad, hr_ref, hi_ref, tr_ref, ti_ref, halo):
    """Head (block-banded) or tail (dense bf16) pivot apply by line index.

    Both branches write the result into ``ypad``'s center as a scratch
    handoff so the caller reads ONE value regardless of branch taken
    (``pl.when`` bodies cannot return values)."""
    npad = w.shape[1]

    @pl.when(line < ts)
    def _():
        tn = _ht_head_pivot(w, ypad, hr_ref, hi_ref, halo)
        ypad[:, halo : halo + npad] = tn

    @pl.when(line >= ts)
    def _():
        tn = _ht_tail_pivot(w, tr_ref, ti_ref)
        ypad[:, halo : halo + npad] = tn

    return ypad[:, halo : halo + npad]


def _down_kernel(meta_ref, b_ref, lb_ref, ub_ref, hr_ref, hi_ref, tr_ref,
                 ti_ref, c01_ref, c10_ref, y_ref, t_ref, unp_ref,
                 tprev, xnext, ypad, ytail, un_s, unp_s,
                 *, m, ts, tt, halo):
    i = pl.program_id(0)
    g = pl.program_id(1)
    l0 = meta_ref[0, i]
    l1 = meta_ref[1, i]
    ln = meta_ref[2, i]
    lnp = meta_ref[3, i]
    has_top = meta_ref[4, i] != 0
    has_bot = meta_ref[5, i] != 0

    @pl.when(g == 0)
    def _():
        tprev[...] = jnp.zeros_like(tprev)
        ypad[...] = jnp.zeros_like(ypad)

    @pl.when((g == 0) & (i == 0))
    def _():
        un_s[...] = jnp.zeros_like(un_s)
        unp_s[...] = jnp.zeros_like(unp_s)

    @pl.when(g < m)
    def _():
        # ---- forward substitution with in-kernel trace injection ----
        r = tprev.shape[0] // 2
        row = b_ref[0, 0]
        row = _inject(row, c01_ref[0], unp_s[...], (g == l0) & has_top)
        row = _inject(row, -c10_ref[0], un_s[...], (g == l1) & has_top)
        accr, acci = _band_apply_multi(lb_ref[0, 0], tprev[...])
        y = jnp.concatenate([row[:r] - accr, row[r:] - acci], axis=0)
        y_ref[0, 0] = y

        @pl.when(g >= m - tt)
        def _():
            ytail[pl.ds(g - (m - tt), 1)] = y[None]

        tn = _pivot_select(y, g, ts, ypad, hr_ref, hi_ref, tr_ref, ti_ref,
                           halo)
        tprev[...] = tn
        t_ref[0, 0] = tn

    @pl.when(g >= m)
    def _():
        # ---- tail-truncated backward pass + trace extraction ----
        line = 2 * m - 1 - g
        r = xnext.shape[0] // 2

        @pl.when(g == m)
        def _():
            xnext[...] = jnp.zeros_like(xnext)
            unp_ref[0] = jnp.zeros_like(unp_ref[0])

        yrow = ytail[pl.ds(line - (m - tt), 1)][0]
        accr, acci = _band_apply_multi(ub_ref[0, 0], xnext[...])
        w = jnp.concatenate([yrow[:r] - accr, yrow[r:] - acci], axis=0)
        xn = _pivot_select(w, line, ts, ypad, hr_ref, hi_ref, tr_ref, ti_ref,
                           halo)
        xnext[...] = xn

        @pl.when((line == ln) & has_bot)
        def _():
            un_s[...] = xn

        @pl.when((line == lnp) & has_bot)
        def _():
            unp_s[...] = xn
            unp_ref[0] = xn


def _up_kernel(meta_ref, b_ref, lb_ref, ub_ref, hr_ref, hi_ref, tr_ref,
               ti_ref, cnpn_ref, cnnp_ref, ycache_ref, tc_ref, unpab_ref,
               u_ref, tprev, xnext, ypad, ytail, u0_s, u1_s,
               *, m, ts, tt, halo):
    i = pl.program_id(0)
    g = pl.program_id(1)
    # the up sweep walks slabs in REVERSE: grid position i processes slab
    # S-1-i (the index maps use the same reversal)
    si = pl.num_programs(0) - 1 - i
    l0 = meta_ref[0, si]
    l1 = meta_ref[1, si]
    ln = meta_ref[2, si]
    lnp = meta_ref[3, si]
    has_top = meta_ref[4, si] != 0
    has_bot = meta_ref[5, si] != 0
    j0 = m - tt

    @pl.when(g == 0)
    def _():
        # resume the forward pass from the down sweep's cached carry
        tprev[...] = tc_ref[0, 0]
        ypad[...] = jnp.zeros_like(ypad)

    @pl.when((g == 0) & (i == 0))
    def _():
        u0_s[...] = jnp.zeros_like(u0_s)
        u1_s[...] = jnp.zeros_like(u1_s)

    @pl.when(g < tt)
    def _():
        # ---- forward resume over the last tt lines with up injections ----
        line = j0 + g
        r = tprev.shape[0] // 2
        row = b_ref[0, 0]
        row = _inject(row, cnpn_ref[0], u0_s[...], (line == lnp) & has_bot)
        row = _inject(row, -cnnp_ref[0], u1_s[...], (line == ln) & has_bot)
        accr, acci = _band_apply_multi(lb_ref[0, 0], tprev[...])
        y = jnp.concatenate([row[:r] - accr, row[r:] - acci], axis=0)
        ytail[pl.ds(g, 1)] = y[None]
        tn = _pivot_select(y, line, ts, ypad, hr_ref, hi_ref, tr_ref, ti_ref,
                           halo)
        tprev[...] = tn

    @pl.when(g >= tt)
    def _():
        # ---- full backward pass, reconstruction + up-trace extraction ----
        line = m - 1 - (g - tt)
        r = xnext.shape[0] // 2

        @pl.when(g == tt)
        def _():
            xnext[...] = jnp.zeros_like(xnext)

        y_res = ytail[pl.ds(jnp.maximum(line - j0, 0), 1)][0]
        yrow = jnp.where(line >= j0, y_res, ycache_ref[0, 0])
        accr, acci = _band_apply_multi(ub_ref[0, 0], xnext[...])
        w = jnp.concatenate([yrow[:r] - accr, yrow[r:] - acci], axis=0)
        xn = _pivot_select(w, line, ts, ypad, hr_ref, hi_ref, tr_ref, ti_ref,
                           halo)
        xnext[...] = xn
        u_ref[0, 0] = xn

        @pl.when((line == l0) & has_top)
        def _():
            u0_s[...] = xn

        @pl.when((line == l1) & has_top)
        def _():
            # reflection correction: subtract the slab-above's down u_np
            u1_s[...] = xn - unpab_ref[0]


def _down_specs(S, m, r2, npad, ts, tl, nb, W, tt, halo):
    line = lambda g: jnp.where(g < m, g, 2 * m - 1 - g)
    in_specs = [
        pl.BlockSpec((1, 1, r2, npad),
                     lambda i, g, s: (i, jnp.minimum(g, m - 1), 0, 0)),
        pl.BlockSpec((1, 1, 2, 3, npad),
                     lambda i, g, s: (i, jnp.minimum(g, m - 1), 0, 0, 0)),
        pl.BlockSpec((1, 1, 2, 3, npad),
                     lambda i, g, s: (i, line(g), 0, 0, 0)),
        pl.BlockSpec((1, 1, nb, W, 128),
                     lambda i, g, s: (i, jnp.clip(line(g), 0, ts - 1),
                                      0, 0, 0)),
        pl.BlockSpec((1, 1, nb, W, 128),
                     lambda i, g, s: (i, jnp.clip(line(g), 0, ts - 1),
                                      0, 0, 0)),
        pl.BlockSpec((1, 1, npad, npad),
                     lambda i, g, s: (i, jnp.clip(line(g) - ts, 0, tl - 1),
                                      0, 0)),
        pl.BlockSpec((1, 1, npad, npad),
                     lambda i, g, s: (i, jnp.clip(line(g) - ts, 0, tl - 1),
                                      0, 0)),
        pl.BlockSpec((1, 2, 3, npad), lambda i, g, s: (i, 0, 0, 0)),
        pl.BlockSpec((1, 2, 3, npad), lambda i, g, s: (i, 0, 0, 0)),
    ]
    out_specs = [
        pl.BlockSpec((1, 1, r2, npad),
                     lambda i, g, s: (i, jnp.minimum(g, m - 1), 0, 0)),
        pl.BlockSpec((1, 1, r2, npad),
                     lambda i, g, s: (i, jnp.minimum(g, m - 1), 0, 0)),
        pl.BlockSpec((1, r2, npad), lambda i, g, s: (i, 0, 0)),
    ]
    scratch = [
        pltpu.VMEM((r2, npad), jnp.float32),
        pltpu.VMEM((r2, npad), jnp.float32),
        pltpu.VMEM((r2, npad + 2 * halo), jnp.float32),
        pltpu.VMEM((tt, r2, npad), jnp.float32),
        pltpu.VMEM((r2, npad), jnp.float32),
        pltpu.VMEM((r2, npad), jnp.float32),
    ]
    return in_specs, out_specs, scratch


def _up_specs(S, m, r2, npad, ts, tl, nb, W, tt, halo):
    j0 = m - tt
    rev = lambda i: S - 1 - i
    line = lambda g: jnp.where(g < tt, j0 + g, m - 1 - (g - tt))
    in_specs = [
        pl.BlockSpec((1, 1, r2, npad),
                     lambda i, g, s: (rev(i), line(g), 0, 0)),
        pl.BlockSpec((1, 1, 2, 3, npad),
                     lambda i, g, s: (rev(i), line(g), 0, 0, 0)),
        pl.BlockSpec((1, 1, 2, 3, npad),
                     lambda i, g, s: (rev(i), line(g), 0, 0, 0)),
        pl.BlockSpec((1, 1, nb, W, 128),
                     lambda i, g, s: (rev(i), jnp.clip(line(g), 0, ts - 1),
                                      0, 0, 0)),
        pl.BlockSpec((1, 1, nb, W, 128),
                     lambda i, g, s: (rev(i), jnp.clip(line(g), 0, ts - 1),
                                      0, 0, 0)),
        pl.BlockSpec((1, 1, npad, npad),
                     lambda i, g, s: (rev(i),
                                      jnp.clip(line(g) - ts, 0, tl - 1),
                                      0, 0)),
        pl.BlockSpec((1, 1, npad, npad),
                     lambda i, g, s: (rev(i),
                                      jnp.clip(line(g) - ts, 0, tl - 1),
                                      0, 0)),
        pl.BlockSpec((1, 2, 3, npad), lambda i, g, s: (rev(i), 0, 0, 0)),
        pl.BlockSpec((1, 2, 3, npad), lambda i, g, s: (rev(i), 0, 0, 0)),
        pl.BlockSpec((1, 1, r2, npad),
                     lambda i, g, s: (rev(i),
                                      jnp.minimum(line(g), j0 - 1), 0, 0)),
        pl.BlockSpec((1, 1, r2, npad),
                     lambda i, g, s: (rev(i), j0 - 1, 0, 0)),
        pl.BlockSpec((1, r2, npad),
                     lambda i, g, s: (jnp.maximum(rev(i) - 1, 0), 0, 0)),
    ]
    out_specs = [
        pl.BlockSpec((1, 1, r2, npad),
                     lambda i, g, s: (rev(i),
                                      jnp.where(g < tt, m - 1,
                                                m - 1 - (g - tt)), 0, 0)),
    ]
    scratch = [
        pltpu.VMEM((r2, npad), jnp.float32),
        pltpu.VMEM((r2, npad), jnp.float32),
        pltpu.VMEM((r2, npad + 2 * halo), jnp.float32),
        pltpu.VMEM((tt, r2, npad), jnp.float32),
        pltpu.VMEM((r2, npad), jnp.float32),
        pltpu.VMEM((r2, npad), jnp.float32),
    ]
    return in_specs, out_specs, scratch


@functools.partial(jax.jit, static_argnames=("tt", "interpret"))
def _sweep_fused(pfac: PallasFactorizationBandedTail, meta, b4, c01, c10,
                 cnpn, cnnp, tt: int, interpret: bool | None = None):
    interpret = _resolve_interpret(interpret)
    S, m, r2, npad = b4.shape
    ts = pfac.tail_start
    tl = m - ts
    nb, W = pfac.head_re.shape[2], pfac.head_re.shape[3]
    halo = pfac.halo

    in_specs, out_specs, scratch = _down_specs(
        S, m, r2, npad, ts, tl, nb, W, tt, halo
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(S, m + tt),
        in_specs=in_specs, out_specs=out_specs, scratch_shapes=scratch,
    )
    kernel = functools.partial(_down_kernel, m=m, ts=ts, tt=tt, halo=halo)
    y4, t4, unp = pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((S, m, r2, npad), jnp.float32),
            jax.ShapeDtypeStruct((S, m, r2, npad), jnp.float32),
            jax.ShapeDtypeStruct((S, r2, npad), jnp.float32),
        ],
        grid_spec=grid_spec,
        interpret=interpret,
    )(meta, b4, pfac.lband, pfac.uband, pfac.head_re, pfac.head_im,
      pfac.tail_re, pfac.tail_im, c01, c10)

    in_specs, out_specs, scratch = _up_specs(
        S, m, r2, npad, ts, tl, nb, W, tt, halo
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(S, tt + m),
        in_specs=in_specs, out_specs=out_specs, scratch_shapes=scratch,
    )
    kernel = functools.partial(_up_kernel, m=m, ts=ts, tt=tt, halo=halo)
    (u4,) = pl.pallas_call(
        kernel,
        out_shape=[jax.ShapeDtypeStruct((S, m, r2, npad), jnp.float32)],
        grid_spec=grid_spec,
        interpret=interpret,
    )(meta, b4, pfac.lband, pfac.uband, pfac.head_re, pfac.head_im,
      pfac.tail_re, pfac.tail_im, cnpn, cnnp, y4, t4, unp)
    return u4


def gs_sweep_fused(slabs, b: jnp.ndarray) -> jnp.ndarray:
    """Whole-sweep fused ``gs_sweep``; requires the banded+tail Pallas
    layout (``pivot_dtype="pallas_banded_tail"``) and a tail-truncated
    sweep structure (0 < trace_tail < m).  Semantics identical to
    ``ddm.sweeps.gs_sweep`` (``precondGSOptimized``,
    ``src/preconditioner.jl:557-630``)."""
    from fast_solver_lippmann_schwinger_tpu.ddm.subdomain import (
        gather_interior,
        partition_source,
    )

    pfac = slabs.pfac
    rhs0 = partition_source(slabs, b)                # (S, m, n[, r])
    dtype = rhs0.dtype
    b4 = _to_rows_b(pfac, rhs0)                      # (S, m, r2, np)
    npad = pfac.np_
    meta = jnp.stack([
        slabs.l0, slabs.l1, slabs.ln, slabs.lnp,
        slabs.has_top.astype(jnp.int32), slabs.has_bot.astype(jnp.int32),
    ]).astype(jnp.int32)                             # (6, S)
    c01 = _pack_cpl_rows(slabs.cpl_01, npad)
    c10 = _pack_cpl_rows(slabs.cpl_10, npad)
    cnpn = _pack_cpl_rows(slabs.cpl_np_n, npad)
    cnnp = _pack_cpl_rows(slabs.cpl_n_np, npad)
    u4 = _sweep_fused(pfac, meta, b4, c01, c10, cnpn, cnnp,
                      tt=slabs.trace_tail)
    u = _from_rows_b(u4, pfac.n, dtype, pfac.m).reshape(rhs0.shape)
    return gather_interior(slabs, u)
