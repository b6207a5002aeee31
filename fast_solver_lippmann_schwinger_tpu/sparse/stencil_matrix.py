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
    """A sparse matrix whose rows are 3x3 stencils on an (m, n) grid."""

    values: jnp.ndarray   # (m, n, 3, 3) complex

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
        """``y = S u`` via 9 shifted multiply-adds; u flat or (m, n)."""
        m, n = self.m, self.n
        u2 = u.reshape(m, n)
        up = jnp.pad(u2, ((1, 1), (1, 1)))
        out = jnp.zeros((m, n), dtype=jnp.result_type(self.values, u))
        for dj in range(3):
            for di in range(3):
                out = out + self.values[:, :, dj, di] * up[dj : dj + m, di : di + n]
        return out.reshape(u.shape)

    def __matmul__(self, u):
        return self.matvec(u)

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
        l, m, n = self.l, self.m, self.n
        u3 = u.reshape(l, m, n)
        up = jnp.pad(u3, ((1, 1), (1, 1), (1, 1)))
        out = jnp.zeros((l, m, n), dtype=jnp.result_type(self.values, u))
        for dk in range(3):
            for dj in range(3):
                for di in range(3):
                    out = out + self.values[:, :, :, dk, dj, di] * up[
                        dk : dk + l, dj : dj + m, di : di + n
                    ]
        return out.reshape(u.shape)

    def __matmul__(self, u):
        return self.matvec(u)

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
