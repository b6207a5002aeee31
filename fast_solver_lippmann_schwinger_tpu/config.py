"""Typed configuration for the TPU-native Lippmann-Schwinger framework.

The reference exposes configuration only as constants edited inside driver
scripts and scattered keyword arguments (``quadRule`` at
``src/FastConvolution.jl:171``, ``solvertype`` at ``src/subdomains.jl:22``,
``precondtype``/``nIt``/``tol``/``maxIter`` at ``src/preconditioner.jl:70-112``).
Here those knobs become real dataclasses.
"""

from __future__ import annotations

import dataclasses
import enum

import jax.numpy as jnp


class QuadRule(str, enum.Enum):
    """Quadrature rule for the singular Green's-function kernel.

    Mirrors the two regimes of the reference (``quadRule`` keyword,
    ``src/FastConvolution.jl:170-236``).
    """

    TRAPEZOIDAL = "trapezoidal"       # Duan-Rokhlin corrected trapezoidal rule
    GREENGARD_VICO = "greengard_vico"  # Fourier-truncated kernel


@dataclasses.dataclass(frozen=True)
class SolverConfig:
    """Outer Krylov solver configuration (replaces IterativeSolvers.gmres!)."""

    rtol: float = 1e-8           # relative tolerance on preconditioned residual
    restart: int = 20            # GMRES restart length
    maxiter: int = 200           # max total iterations
    dtype: jnp.dtype = jnp.complex64


@dataclasses.dataclass(frozen=True)
class DDMConfig:
    """Domain-decomposition (polarized traces) configuration.

    Mirrors ``nSubdomains``/``npml`` from ``tests/plasma_example.jl:41,102``
    and the sweep knobs of ``src/preconditioner.jl``.
    """

    n_subdomains: int = 8
    npml: int = 10               # absorbing-extension layers (``ndelta``)
    shift_factor: float = 2.0    # complex-shift scale: shift = shift_factor * k
                                 # (``src/subdomains.jl:53``)
    n_inner_iters: int = 1       # ``nIt`` for the trace-space preconditioner
    inner_tol: float = 1e-2      # inner GMRES tolerance (polarized traces)
    inner_maxiter: int = 40
    # inner-GMRES composite knobs (``precond="gs_inner"`` /
    # ``"double_sweep_inner"``): one restart cycle of length
    # ``inner_gmres_maxiter`` on ``Msp y = As b`` preconditioned by the
    # sweep — the reference's ``Preconditioner``
    # (``src/preconditioner.jl:92-116,186-204``) and the ``maxIter != 0``
    # branch of ``doublePreconditioner`` (``:228-244``, defaults
    # ``maxIter=20, tol=1e-2``).
    inner_gmres_maxiter: int = 20
    inner_gmres_tol: float = 1e-2


@dataclasses.dataclass(frozen=True)
class ProblemConfig:
    """Full problem description — the typed replacement for the reference's
    edit-the-driver-constants workflow (``tests/plasma_example.jl:20-41``).

    ``precond`` mirrors the reference's preconditioner families:
    ``sparsifying`` (``SparsifyingPreconditioner``), ``gs`` (one
    single-direction sweep, ``GSPreconditioner``), ``gs_inner`` (inner
    GMRES on the sparsified system preconditioned by the GS sweep — the
    reference's ``Preconditioner``), ``double_sweep``
    (``doublePreconditioner`` with maxIter=0), ``double_sweep_inner``
    (its ``maxIter != 0`` branch), ``polarized_traces`` (trace-space
    inner GMRES), or ``none``.
    """

    dim: int = 2                       # 2 or 3
    medium: str = "gaussian_bump"      # gaussian_bump | plasma
    h: float = 1.0 / 100.0
    a: float = 1.0                     # domain half-extent/size
    k: float | None = None             # defaults to 1/h (reference convention)
    quad_rule: QuadRule = QuadRule.GREENGARD_VICO
    prefer_pow2: bool | None = None    # extended-FFT size class: True = pow2
                                       # (TPU fast path), False = 5-smooth,
                                       # None = sniff the current backend
    precond: str = "sparsifying"
    pivot_dtype: str = "full"          # full | bf16 | banded | banded_lr |
                                       # banded_tail | pallas | pallas_int8 |
                                       # pallas_banded_tail (DDM pivot
                                       # storage)
    pivot_band: int | None = None      # band width for banded/banded_lr
    pivot_rank: int | None = None      # low-rank correction rank (banded_lr)
    cache_dir: str | None = None       # checkpoint dir for expensive setup
                                       # artifacts (GFFT symbol, stencil
                                       # fields, slab factorizations) —
                                       # SURVEY.md section 5
    incident_direction: tuple = (1.0, 0.0)
    solver: SolverConfig = dataclasses.field(default_factory=SolverConfig)
    ddm: DDMConfig = dataclasses.field(default_factory=DDMConfig)


def default_complex_dtype() -> jnp.dtype:
    """complex128 when x64 is enabled (CPU parity tests), else complex64 (TPU)."""
    return jnp.complex128 if jnp.zeros(0, jnp.float64).dtype == jnp.float64 else jnp.complex64


def real_dtype_of(cdtype) -> jnp.dtype:
    return jnp.float64 if jnp.dtype(cdtype) == jnp.complex128 else jnp.float32
