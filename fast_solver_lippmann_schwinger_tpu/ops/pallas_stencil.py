"""Pallas TPU kernel for the 9-point stencil matvec (complex).

This is the SpMV of the sparsified operators (``As b`` on every
preconditioner application, ``Msp v`` in inner solves) — the role MKL's
``cscmv`` plays in the reference (``src/sparseblas.jl``, call sites
``src/preconditioner.jl:191-198,234-241``).  The XLA fallback in
``StencilMatrix2D.matvec`` is a chain of 9 shifted multiply-adds; this
kernel performs the whole contraction in one VMEM pass per row-block:
complex data is carried as separate real/imag planes (Mosaic has no native
complex arithmetic), and the halo rows needed by each block are DMA'd
explicitly since overlapping BlockSpec windows are not expressible.

Use ``stencil_matvec_2d(values, u, interpret=...)``; correctness is pinned
against the XLA path in ``tests/test_pallas_stencil.py`` (interpret mode on
CPU, compiled on TPU).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def stencil_matvec_2d(values: jnp.ndarray, u: jnp.ndarray,
                      block_rows: int = 64, interpret: bool = False):
    """``y = S u`` for a (m, n, 3, 3) complex stencil field via Pallas.

    ``u`` may be flat or (m, n); result matches ``StencilMatrix2D.matvec``.
    """
    m, n = values.shape[0], values.shape[1]
    orig_shape = u.shape
    u2 = u.reshape(m, n)

    block_rows = min(block_rows, m)
    n_blocks = -(-m // block_rows)
    m_pad = n_blocks * block_rows

    s9 = values.reshape(m, n, 9)
    s_re = jnp.real(s9).astype(jnp.float32)
    s_im = jnp.imag(s9).astype(jnp.float32)
    if m_pad != m:
        pad = [(0, m_pad - m), (0, 0), (0, 0)]
        s_re = jnp.pad(s_re, pad)
        s_im = jnp.pad(s_im, pad)

    # u padded with the stencil halo AND up to the block grid; each block
    # reads (block_rows + 2) rows starting at block_idx * block_rows, which
    # is only expressible with a stride-1 sub-blocked layout: stack shifted
    # copies so the halo becomes a leading axis of stride block_rows.
    up = jnp.pad(u2, ((1, 1 + (m_pad - m)), (1, 1)))
    u_re = jnp.real(up).astype(jnp.float32)
    u_im = jnp.imag(up).astype(jnp.float32)

    grid = (n_blocks,)
    out_shape = [
        jax.ShapeDtypeStruct((m_pad, n), jnp.float32),
        jax.ShapeDtypeStruct((m_pad, n), jnp.float32),
    ]

    # halo trick: a (block_rows + 2)-row window at stride block_rows is not
    # expressible as a BlockSpec (offsets are index * block_shape), so pass
    # three row-shifted views of u whose leading axis selects the dj tap
    u_re_sh = jnp.stack(
        [u_re[0:m_pad, :], u_re[1 : m_pad + 1, :], u_re[2 : m_pad + 2, :]],
        axis=0,
    )  # (3, m_pad, n+2)
    u_im_sh = jnp.stack(
        [u_im[0:m_pad, :], u_im[1 : m_pad + 1, :], u_im[2 : m_pad + 2, :]],
        axis=0,
    )

    def kernel_shifted(s_re_ref, s_im_ref, u_re_ref, u_im_ref,
                       o_re_ref, o_im_ref):
        acc_re = jnp.zeros((block_rows, n), jnp.float32)
        acc_im = jnp.zeros((block_rows, n), jnp.float32)
        for dj in range(3):
            for di in range(3):
                t = dj * 3 + di
                sre = s_re_ref[:, :, t]
                sim = s_im_ref[:, :, t]
                ure = u_re_ref[dj, :, di : di + n]
                uim = u_im_ref[dj, :, di : di + n]
                acc_re += sre * ure - sim * uim
                acc_im += sre * uim + sim * ure
        o_re_ref[:, :] = acc_re
        o_im_ref[:, :] = acc_im

    in_specs = [
        pl.BlockSpec((block_rows, n, 9), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((block_rows, n, 9), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((3, block_rows, n + 2), lambda i: (0, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((3, block_rows, n + 2), lambda i: (0, i, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_specs = [
        pl.BlockSpec((block_rows, n), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((block_rows, n), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
    ]

    o_re, o_im = pl.pallas_call(
        kernel_shifted,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(s_re, s_im, u_re_sh, u_im_sh)

    out = (o_re[:m] + 1j * o_im[:m]).astype(values.dtype)
    return out.reshape(orig_shape)
