"""The sparsifying preconditioner: ``u <- Msp^{-1} (As b)``.

Counterpart of the reference's ``SparsifyingPreconditioner`` struct and its
``\\`` / ``ldiv!`` overloads (``src/preconditioner.jl:27-58,132-170``).  The
UMFPACK / MKL-PARDISO factorization held in that struct becomes a device
block-Thomas factorization; ``As * b`` becomes a stencil matvec.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from fast_solver_lippmann_schwinger_tpu.sparse.direct import (
    BlockTridiagFactorization,
    BlockTridiagFactorization3D,
    block_thomas_solve,
    block_thomas_solve_3d,
    factor_stencil_2d,
    factor_stencil_3d,
)
from fast_solver_lippmann_schwinger_tpu.sparse.stencil_matrix import (
    StencilMatrix2D,
    StencilMatrix3D,
)


@struct.dataclass
class SparsifyingPreconditioner:
    """Left preconditioner ``b -> Msp^{-1} (As b)`` for the LS system."""

    factorization: BlockTridiagFactorization
    a_s: StencilMatrix2D

    @classmethod
    def build(cls, msp: StencilMatrix2D, a_s: StencilMatrix2D):
        # jit so the factorization is ONE compiled program (eager dispatch
        # costs a remote compile per op on the tunnel backend)
        return cls(factorization=jax.jit(factor_stencil_2d)(msp), a_s=a_s)

    def apply(self, b: jnp.ndarray) -> jnp.ndarray:
        return block_thomas_solve(self.factorization, self.a_s.matvec(b))

    def apply_batch(self, b_batch: jnp.ndarray) -> jnp.ndarray:
        """(R, m*n) joint batch apply (``gmres_batched`` convention): the
        substitution scans stream each pivot plane once for all R sources
        (the same HBM amortization as the sweep preconditioners)."""
        return self.apply(b_batch.T).T

    def __call__(self, b: jnp.ndarray) -> jnp.ndarray:
        return self.apply(b)


@struct.dataclass
class SparsifyingPreconditionerT:
    """Transposed sparsifying preconditioner ``b -> As^T (Msp^{-T} b)``.

    ``(Msp^{-1} As)^T = As^T Msp^{-T}``: the right preconditioner for the
    TRANSPOSED system solved by the adjoint pass of
    ``solver.adjoint.differentiable_solve`` — the order of the annihilator
    matvec and the direct solve flips relative to the forward
    ``SparsifyingPreconditioner``.
    """

    factorization: BlockTridiagFactorization   # of Msp^T
    a_s_t: StencilMatrix2D

    @classmethod
    def build(cls, msp: StencilMatrix2D, a_s: StencilMatrix2D):
        return cls(
            factorization=jax.jit(
                lambda s: factor_stencil_2d(s.matrix_transpose())
            )(msp),
            a_s_t=a_s.matrix_transpose(),
        )

    def apply(self, b: jnp.ndarray) -> jnp.ndarray:
        return self.a_s_t.matvec(block_thomas_solve(self.factorization, b))

    def __call__(self, b: jnp.ndarray) -> jnp.ndarray:
        return self.apply(b)


@struct.dataclass
class SparsifyingPreconditioner3D:
    factorization: object   # BlockTridiagFactorization3D | PlaneSlabView
    a_s: StencilMatrix3D

    @classmethod
    def build(cls, msp: StencilMatrix3D, a_s: StencilMatrix3D,
              use_pallas: bool = False):
        """``use_pallas`` stores bf16 plane pivots in the Pallas stack
        layout (``sparse/pallas_plane.py``): the substitution scans then
        stream each (mn, mn) pivot plane from HBM exactly once instead of
        gathering a per-step copy — same trade as the 2D fused kernels
        (bf16 pivots perturb only the preconditioner)."""
        if use_pallas:
            from fast_solver_lippmann_schwinger_tpu.sparse import pallas_plane

            @jax.jit
            def _build(s):
                fac = factor_stencil_3d(s, pivot_dtype="bf16")
                stack = pallas_plane.build_plane_stack(fac, batched=False)
                return pallas_plane.PlaneSlabView(
                    stack=stack, lsten=fac.lsten, usten=fac.usten,
                    base=jnp.zeros((), jnp.int32),
                )

            return cls(factorization=_build(msp), a_s=a_s)
        return cls(factorization=jax.jit(factor_stencil_3d)(msp), a_s=a_s)

    def apply(self, b: jnp.ndarray) -> jnp.ndarray:
        return block_thomas_solve_3d(self.factorization, self.a_s.matvec(b))

    def apply_batch(self, b_batch: jnp.ndarray) -> jnp.ndarray:
        """(R, l*m*n) joint batch apply: one plane-pivot stream for the
        whole multi-source batch (works on both the XLA and the Pallas
        plane-stack storage)."""
        return self.apply(b_batch.T).T

    def __call__(self, b: jnp.ndarray) -> jnp.ndarray:
        return self.apply(b)
