"""Dense stencil-field representation of the sparsified operators.

The reference assembles its sparsifying matrices ``A`` and ``A*G`` as general
CSC matrices (``buildSparseA``/``buildSparseAG``,
``src/SparsifyingMatrix2D.jl:351-529,806-966``) and multiplies them with
UMFPACK/MKL sparse kernels.  But every row of those matrices is a 3x3 (2D) or
3x3x3 (3D) stencil around its diagonal — there are only 9 (27) distinct
sparsity classes.  The TPU-native representation is therefore a dense
*stencil field*: a ``(m, n, 3, 3)`` array of per-node coefficients.  A matvec
is 9 shifted multiply-adds over the grid (pure VPU work that XLA fuses into a
single pass), replacing MKL's ``cscmv`` (``src/sparseblas.jl``); and the
block-tridiagonal structure needed by the direct solver can be read off
directly (``sparse/direct.py``).

Offsets convention: ``values[j, i, dj, di]`` is the coefficient coupling node
(row) ``(j, i)`` to node (column) ``(j + dj - 1, i + di - 1)``; j is the slab
axis (y in 2D), i is x.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from flax import struct


@struct.dataclass
class StencilMatrix2D:
    """A sparse matrix whose rows are 3x3 stencils on an (m, n) grid.

    ``use_pallas=True`` routes single-RHS matvecs through the fused Pallas
    kernel (``ops/pallas_stencil.py``) — one VMEM pass instead of the XLA
    9-tap chain; multi-RHS and transposed applies keep the XLA path.
    """

    values: jnp.ndarray   # (m, n, 3, 3) complex
    use_pallas: bool = struct.field(pytree_node=False, default=False)

    @property
    def m(self) -> int:
        return self.values.shape[0]

    @property
    def n(self) -> int:
        return self.values.shape[1]

    @property
    def shape(self):
        return (self.m * self.n, self.m * self.n)

    def matvec(self, u: jnp.ndarray) -> jnp.ndarray:
        """``y = S u`` via 9 shifted multiply-adds; u flat, (m, n), or with
        trailing RHS columns (m*n, r) / (m, n, r) — the multi-RHS form
        covers MKL's ``cscmm`` (``src/sparseblas.jl:46-58``) as well as
        ``cscmv``."""
        m, n = self.m, self.n
        extra = u.shape[1:] if u.ndim > 1 and u.shape[0] == m * n else u.shape[2:]
        if self.use_pallas and not extra:
            from fast_solver_lippmann_schwinger_tpu.ops.pallas_stencil import (
                stencil_matvec_2d,
            )
            from fast_solver_lippmann_schwinger_tpu.sparse.pallas_thomas import (
                _resolve_interpret,
            )

            return stencil_matvec_2d(
                self.values, u, interpret=_resolve_interpret(None)
            )
        u2 = u.reshape((m, n) + extra)
        pad = [(1, 1), (1, 1)] + [(0, 0)] * len(extra)
        up = jnp.pad(u2, pad)
        vals = self.values.reshape((m, n, 3, 3) + (1,) * len(extra))
        out = jnp.zeros(u2.shape, dtype=jnp.result_type(self.values, u))
        for dj in range(3):
            for di in range(3):
                out = out + vals[:, :, dj, di] * up[dj : dj + m, di : di + n]
        return out.reshape(u.shape)

    def __matmul__(self, u):
        return self.matvec(u)

    def to_coo(self):
        """COO triplets (rows, cols, vals) of the assembled sparse matrix —
        the interop/export counterpart of the reference's ``createIndices``
        kron-expansion (``src/Functions.jl:7-29``); feed to
        ``scipy.sparse.coo_matrix`` for external tooling.  Host numpy."""
        m, n = self.m, self.n
        vals = np.asarray(self.values)
        j, i, dj, di = np.meshgrid(
            np.arange(m), np.arange(n), np.arange(3), np.arange(3),
            indexing="ij",
        )
        jj, ii = j + dj - 1, i + di - 1
        keep = (jj >= 0) & (jj < m) & (ii >= 0) & (ii < n)
        rows = (j * n + i)[keep]
        cols = (jj * n + ii)[keep]
        return rows, cols, vals[keep]

    def transpose(self) -> "StencilMatrix2D":
        """``T S T'`` under the grid transposition permutation.

        The x/y swap used by the alternating bi-directional sweep
        (``tests/plasma_example.jl:103-112``): swapping grid axes and stencil
        offset axes yields exactly the permuted matrix.
        """
        return StencilMatrix2D(values=jnp.transpose(self.values, (1, 0, 3, 2)))

    def matrix_transpose(self) -> "StencilMatrix2D":
        """The true matrix transpose ``S^T`` (NOT the grid x/y swap of
        :meth:`transpose`): row (j, i) of ``S^T`` collects, from each
        neighbor, the coefficient of that neighbor's stencil pointing back
        at (j, i).  Used for adjoint solves (``solver/adjoint.py``)."""
        m, n = self.m, self.n
        vp = jnp.pad(self.values, ((1, 1), (1, 1), (0, 0), (0, 0)))
        out = jnp.zeros_like(self.values)
        for dj in range(3):
            for di in range(3):
                out = out.at[:, :, dj, di].set(
                    vp[dj : dj + m, di : di + n, 2 - dj, 2 - di]
                )
        return StencilMatrix2D(values=out)

    def scale_columns(self, d: jnp.ndarray) -> "StencilMatrix2D":
        """``S @ diag(d)`` for a grid field d (m, n): column scaling.

        Used to form ``Msp = As + k^2 (AG) diag(nu)``
        (``examples/example.jl:67``).
        """
        m, n = self.m, self.n
        dp = jnp.pad(d.reshape(m, n).astype(self.values.dtype), ((1, 1), (1, 1)))
        cols = jnp.stack(
            [
                jnp.stack([dp[dj : dj + m, di : di + n] for di in range(3)], axis=-1)
                for dj in range(3)
            ],
            axis=-2,
        )  # (m, n, 3, 3) value of d at each column node
        return StencilMatrix2D(values=self.values * cols)

    def __add__(self, other: "StencilMatrix2D") -> "StencilMatrix2D":
        return StencilMatrix2D(values=self.values + other.values)

    def __mul__(self, scalar) -> "StencilMatrix2D":
        return StencilMatrix2D(values=self.values * scalar)

    __rmul__ = __mul__

    def to_dense(self) -> np.ndarray:
        """Dense (N, N) matrix — test oracle only."""
        m, n = self.m, self.n
        N = m * n
        vals = np.asarray(self.values)
        out = np.zeros((N, N), dtype=vals.dtype)
        for j in range(m):
            for i in range(n):
                row = j * n + i
                for dj in range(3):
                    for di in range(3):
                        jj, ii = j + dj - 1, i + di - 1
                        if 0 <= jj < m and 0 <= ii < n:
                            out[row, jj * n + ii] = vals[j, i, dj, di]
        return out


@struct.dataclass
class StencilMatrix3D:
    """3x3x3 stencil rows on an (l, m, n) grid (27 classes in the reference,
    ``src/SparsifyingMatrix3D.jl``)."""

    values: jnp.ndarray   # (l, m, n, 3, 3, 3) complex

    @property
    def l(self) -> int:
        return self.values.shape[0]

    @property
    def m(self) -> int:
        return self.values.shape[1]

    @property
    def n(self) -> int:
        return self.values.shape[2]

    def matvec(self, u: jnp.ndarray) -> jnp.ndarray:
        """``y = S u``; u flat, (l, m, n), or with trailing RHS columns
        (l*m*n, r) (multi-RHS, MKL ``cscmm`` counterpart)."""
        l, m, n = self.l, self.m, self.n
        extra = (
            u.shape[1:] if u.ndim > 1 and u.shape[0] == l * m * n else u.shape[3:]
        )
        u3 = u.reshape((l, m, n) + extra)
        pad = [(1, 1), (1, 1), (1, 1)] + [(0, 0)] * len(extra)
        up = jnp.pad(u3, pad)
        vals = self.values.reshape((l, m, n, 3, 3, 3) + (1,) * len(extra))
        out = jnp.zeros(u3.shape, dtype=jnp.result_type(self.values, u))
        for dk in range(3):
            for dj in range(3):
                for di in range(3):
                    out = out + vals[:, :, :, dk, dj, di] * up[
                        dk : dk + l, dj : dj + m, di : di + n
                    ]
        return out.reshape(u.shape)

    def __matmul__(self, u):
        return self.matvec(u)

    def to_coo(self):
        """COO triplets (rows, cols, vals) — see the 2D version."""
        l, m, n = self.l, self.m, self.n
        vals = np.asarray(self.values)
        p, j, i, dk, dj, di = np.meshgrid(
            np.arange(l), np.arange(m), np.arange(n),
            np.arange(3), np.arange(3), np.arange(3), indexing="ij",
        )
        pp, jj, ii = p + dk - 1, j + dj - 1, i + di - 1
        keep = ((pp >= 0) & (pp < l) & (jj >= 0) & (jj < m)
                & (ii >= 0) & (ii < n))
        rows = ((p * m + j) * n + i)[keep]
        cols = ((pp * m + jj) * n + ii)[keep]
        return rows, cols, vals[keep]

    def matrix_transpose(self) -> "StencilMatrix3D":
        """True matrix transpose (see the 2D version)."""
        l, m, n = self.l, self.m, self.n
        vp = jnp.pad(
            self.values, ((1, 1), (1, 1), (1, 1), (0, 0), (0, 0), (0, 0))
        )
        out = jnp.zeros_like(self.values)
        for dk in range(3):
            for dj in range(3):
                for di in range(3):
                    out = out.at[:, :, :, dk, dj, di].set(
                        vp[dk : dk + l, dj : dj + m, di : di + n,
                           2 - dk, 2 - dj, 2 - di]
                    )
        return StencilMatrix3D(values=out)

    def scale_columns(self, d: jnp.ndarray) -> "StencilMatrix3D":
        l, m, n = self.l, self.m, self.n
        dp = jnp.pad(
            d.reshape(l, m, n).astype(self.values.dtype), ((1, 1), (1, 1), (1, 1))
        )
        cols = jnp.stack(
            [
                jnp.stack(
                    [
                        jnp.stack(
                            [dp[dk : dk + l, dj : dj + m, di : di + n] for di in range(3)],
                            axis=-1,
                        )
                        for dj in range(3)
                    ],
                    axis=-2,
                )
                for dk in range(3)
            ],
            axis=-3,
        )
        return StencilMatrix3D(values=self.values * cols)

    def __add__(self, other: "StencilMatrix3D") -> "StencilMatrix3D":
        return StencilMatrix3D(values=self.values + other.values)

    def __mul__(self, scalar) -> "StencilMatrix3D":
        return StencilMatrix3D(values=self.values * scalar)

    __rmul__ = __mul__

    def to_dense(self) -> np.ndarray:
        l, m, n = self.l, self.m, self.n
        N = l * m * n
        vals = np.asarray(self.values)
        out = np.zeros((N, N), dtype=vals.dtype)
        for p in range(l):
            for j in range(m):
                for i in range(n):
                    row = (p * m + j) * n + i
                    for dk in range(3):
                        for dj in range(3):
                            for di in range(3):
                                pp, jj, ii = p + dk - 1, j + dj - 1, i + di - 1
                                if 0 <= pp < l and 0 <= jj < m and 0 <= ii < n:
                                    out[row, (pp * m + jj) * n + ii] = vals[
                                        p, j, i, dk, dj, di
                                    ]
        return out
