"""Differentiable Lippmann-Schwinger solves (adjoint method).

Beyond the reference's capability surface (nothing in
``tanderson92/Fast_solver_Lippmann_Schwinger`` is differentiable): because
every layer here is JAX, the scattering solve can be differentiated with
respect to the medium ``nu`` and the right-hand side for inverse problems
(e.g. medium reconstruction from scattered-field data).

``jax.lax.custom_linear_solve`` wires the adjoint: the VJP of
``u = M(nu)^{-1} b`` costs ONE transposed solve instead of back-propagating
through every GMRES iteration (which would be both slow and memory-unbounded
across ``lax.while_loop`` iterations).  The transpose system reuses the same
device GMRES; its natural preconditioner is the transposed sparsifying
preconditioner ``P^T = As^T Msp^{-T}`` (``precond/sparsifying.py``).

``M^T = I + omega^2 diag(nu) G`` because the discrete Green's convolution is
symmetric (even kernel): the transpose just moves the medium factor to the
other side of the convolution.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp


def apply_transpose(op, x: jnp.ndarray) -> jnp.ndarray:
    """``M^T x = x + omega^2 nu .* (G conv x)`` for a 2D/3D fast operator.

    (``G^T = G``: the circulant kernel is even, cf. the symbol construction
    in ``ops/greens.py``; the reference exploits the same symmetry when
    sampling rows as columns, ``src/FastConvolution.jl:278-306``.)
    """
    conv = op.convolve(x.astype(op.symbol.dtype))
    return x + (op.omega ** 2) * op.nu.reshape(x.shape) * conv


def differentiable_solve(
    op,
    rhs: jnp.ndarray,
    preconditioner: Optional[Callable] = None,
    preconditioner_t: Optional[Callable] = None,
    rtol: float = 1e-8,
    restart: int = 20,
    maxiter: int = 200,
) -> jnp.ndarray:
    """Solve ``M(nu) u = rhs`` such that ``jax.grad`` flows through.

    Gradients with respect to ``op.nu`` (a pytree leaf of the operator) and
    ``rhs`` are exact up to the GMRES tolerance: forward- and reverse-mode
    differentiation each trigger one extra (transposed) linear solve via the
    implicit function theorem, never differentiating through the Krylov
    iteration itself.

    ``preconditioner``/``preconditioner_t`` precondition the forward and
    transposed solves (e.g. ``SparsifyingPreconditioner`` and
    ``SparsifyingPreconditionerT``).  Returns ``u`` only (the residual
    history is not differentiable state; run :func:`solver.gmres.gmres`
    directly when diagnostics are wanted).
    """
    from fast_solver_lippmann_schwinger_tpu.solver.gmres import gmres

    def solve(mv, b):
        x, _ = gmres(mv, b, preconditioner=preconditioner, rtol=rtol,
                     restart=restart, maxiter=maxiter)
        return x

    def transpose_solve(vecmat, b):
        # vecmat is the JAX-derived transpose of matvec (== apply_transpose)
        x, _ = gmres(vecmat, b, preconditioner=preconditioner_t, rtol=rtol,
                     restart=restart, maxiter=maxiter)
        return x

    return jax.lax.custom_linear_solve(
        lambda x: op.apply(x), rhs, solve, transpose_solve=transpose_solve
    )
