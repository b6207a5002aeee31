"""Config-driven top-level API.

The reference's only "API" is editing constants inside driver scripts
(``examples/example.jl:30-45``, ``tests/plasma_example.jl:20-41``); here a
single :func:`solve_problem` call builds and solves any of its
configurations from a typed :class:`ProblemConfig` (see ``config.py``).
Also the engine behind ``python -m fast_solver_lippmann_schwinger_tpu``.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from fast_solver_lippmann_schwinger_tpu.config import ProblemConfig
from fast_solver_lippmann_schwinger_tpu.core.grids import Grid2D, Grid3D
from fast_solver_lippmann_schwinger_tpu.ddm.polarized import (
    PolarizedTracesPreconditioner,
)
from fast_solver_lippmann_schwinger_tpu.ddm.subdomain import build_slab_system
from fast_solver_lippmann_schwinger_tpu.ddm.subdomain3d import (
    SingleSweepPreconditioner3D,
    build_slab_system_3d,
)
from fast_solver_lippmann_schwinger_tpu.ddm.sweeps import (
    DoubleSweepPreconditioner,
    SingleSweepPreconditioner,
)
from fast_solver_lippmann_schwinger_tpu.models import media
from fast_solver_lippmann_schwinger_tpu.ops.fastconv import (
    build_fast_convolution_2d,
    build_fast_convolution_3d,
)
from fast_solver_lippmann_schwinger_tpu.precond.sparsifying import (
    SparsifyingPreconditioner,
    SparsifyingPreconditioner3D,
)
from fast_solver_lippmann_schwinger_tpu.solver.gmres import gmres
from fast_solver_lippmann_schwinger_tpu.sparse import stencils
from fast_solver_lippmann_schwinger_tpu.utils.host import to_device_complex


_MEDIA_2D = {
    "gaussian_bump": media.gaussian_bump_2d,
    "plasma": media.plasma_2d,
}
_MEDIA_3D = {
    "gaussian_bump": media.gaussian_bump_3d,
}


@dataclasses.dataclass
class Problem:
    """Everything needed to run solves for one configuration."""

    config: ProblemConfig
    grid: object
    k: float
    op: object
    precond: Optional[object]      # object with .apply, or None


def build_problem(cfg: ProblemConfig) -> Problem:
    k = cfg.k if cfg.k is not None else 1.0 / cfg.h
    dtype = cfg.solver.dtype

    if cfg.dim == 2:
        grid = Grid2D(a=cfg.a, h=cfg.h)
        X, Y = grid.mesh()
        nu = _MEDIA_2D[cfg.medium](X, Y)
        op = build_fast_convolution_2d(
            grid.x, grid.y, cfg.h, k, nu, quad_rule=cfg.quad_rule, dtype=dtype,
            prefer_pow2=cfg.prefer_pow2, cache_dir=cfg.cache_dir,
        )
    elif cfg.dim == 3:
        grid = Grid3D(a=cfg.a, h=cfg.h)
        X, Y, Z = grid.mesh()
        nu = _MEDIA_3D[cfg.medium](X, Y, Z)
        op = build_fast_convolution_3d(
            grid.x, grid.x, grid.x, cfg.h, k, nu, dtype=dtype,
            prefer_pow2=cfg.prefer_pow2, cache_dir=cfg.cache_dir,
        )
    else:
        raise ValueError(f"dim must be 2 or 3, got {cfg.dim}")

    precond = None
    if cfg.precond == "none":
        pass
    elif cfg.dim == 3:
        if cfg.precond not in ("sparsifying", "gs", "polarized_traces"):
            raise ValueError(
                "3D supports precond='sparsifying', 'gs' (z-slab sweep), "
                "'polarized_traces' (plane-trace integral system) or 'none' "
                "(the 'gs' and 'polarized_traces' DDM layers are "
                "capabilities this framework adds beyond the reference, "
                "whose 3D polarized traces is advertised but absent — "
                "SURVEY.md section 2)"
            )
        a_st, ag_st = stencils.build_sparse_a_ag_3d(
            k, op, dtype=dtype, cache_dir=cfg.cache_dir
        )
        if cfg.precond in ("gs", "polarized_traces"):
            slabs3 = build_slab_system_3d(
                a_st, ag_st, nu, grid.x, cfg.h, k,
                cfg.ddm.n_subdomains, npml=cfg.ddm.npml,
                shift_factor=cfg.ddm.shift_factor,
                pivot_dtype=(cfg.pivot_dtype
                             if not cfg.pivot_dtype.startswith("pallas")
                             else "full"),
                cache_dir=cfg.cache_dir,
            )
            if cfg.precond == "gs":
                precond = SingleSweepPreconditioner3D(slabs=slabs3, a_s=a_st)
            else:
                from fast_solver_lippmann_schwinger_tpu.ddm.polarized3d import (
                    PolarizedTracesPreconditioner3D,
                )

                precond = PolarizedTracesPreconditioner3D(
                    slabs=slabs3, a_s=a_st, n_it=cfg.ddm.n_inner_iters,
                    inner_tol=cfg.ddm.inner_tol,
                    inner_maxiter=cfg.ddm.inner_maxiter,
                )
        else:
            msp = stencils.build_msp_3d(a_st, ag_st, nu, k)
            precond = SparsifyingPreconditioner3D.build(msp, a_st)
    elif cfg.precond == "sparsifying":
        a_st, ag_st = stencils.build_sparse_a_ag_2d(
            k, grid.x, grid.y, cfg.h, dtype=dtype, cache_dir=cfg.cache_dir
        )
        msp = stencils.build_msp_2d(a_st, ag_st, nu, k)
        precond = SparsifyingPreconditioner.build(msp, a_st)
    elif cfg.precond in ("gs", "gs_inner", "double_sweep",
                         "double_sweep_inner", "polarized_traces"):
        a_st, ag_st, a_np, ag_np = stencils.build_sparse_a_ag_2d(
            k, grid.x, grid.y, cfg.h, dtype=dtype, return_host=True,
            cache_dir=cfg.cache_dir,
        )
        msp = stencils.build_msp_2d(a_st, ag_st, nu, k)
        slabs = build_slab_system(
            a_st, ag_st, nu, grid.x, grid.y, cfg.h, k,
            cfg.ddm.n_subdomains, npml=cfg.ddm.npml,
            shift_factor=cfg.ddm.shift_factor,
            a_host=a_np, ag_host=ag_np, pivot_dtype=cfg.pivot_dtype,
            pivot_band=cfg.pivot_band, pivot_rank=cfg.pivot_rank,
            cache_dir=cfg.cache_dir,
        )
        if cfg.precond == "gs":
            precond = SingleSweepPreconditioner(slabs=slabs, a_s=a_st)
        elif cfg.precond == "gs_inner":
            from fast_solver_lippmann_schwinger_tpu.ddm.sweeps import (
                GSPreconditioner,
                InnerGMRESPreconditioner,
            )

            precond = InnerGMRESPreconditioner(
                msp=msp, a_s=a_st, sweep=GSPreconditioner(slabs=slabs),
                max_iter=cfg.ddm.inner_gmres_maxiter,
                tol=cfg.ddm.inner_gmres_tol,
            )
        elif cfg.precond == "polarized_traces":
            precond = PolarizedTracesPreconditioner(
                slabs=slabs, a_s=a_st, n_it=cfg.ddm.n_inner_iters,
                inner_tol=cfg.ddm.inner_tol,
                inner_maxiter=cfg.ddm.inner_maxiter,
            )
        else:
            slabs_t = build_slab_system(
                a_st.transpose(), ag_st.transpose(), np.asarray(nu).T,
                grid.y, grid.x, cfg.h, k,
                cfg.ddm.n_subdomains, npml=cfg.ddm.npml,
                shift_factor=cfg.ddm.shift_factor,
                a_host=a_np.transpose(1, 0, 3, 2),
                ag_host=ag_np.transpose(1, 0, 3, 2),
                pivot_dtype=cfg.pivot_dtype,
                pivot_band=cfg.pivot_band, pivot_rank=cfg.pivot_rank,
                cache_dir=cfg.cache_dir,
            )
            double = DoubleSweepPreconditioner(
                slabs=slabs, slabs_t=slabs_t, msp=msp, a_s=a_st
            )
            if cfg.precond == "double_sweep_inner":
                from fast_solver_lippmann_schwinger_tpu.ddm.sweeps import (
                    InnerGMRESPreconditioner,
                )

                precond = InnerGMRESPreconditioner(
                    msp=msp, a_s=a_st, sweep=double,
                    max_iter=cfg.ddm.inner_gmres_maxiter,
                    tol=cfg.ddm.inner_gmres_tol,
                )
            else:
                precond = double
    else:
        raise ValueError(
            f"unknown precond {cfg.precond!r}; expected one of "
            "sparsifying | gs | gs_inner | double_sweep | "
            "double_sweep_inner | polarized_traces | none"
        )
    return Problem(config=cfg, grid=grid, k=k, op=op, precond=precond)


def incident_field(problem: Problem) -> jnp.ndarray:
    cfg = problem.config
    dtype = problem.op.symbol.dtype
    d = np.asarray(cfg.incident_direction, dtype=np.float64)
    if cfg.dim == 2:
        X, Y = problem.grid.mesh()
        phase = d[0] * X.ravel() + d[1] * Y.ravel()
    else:
        X, Y, Z = problem.grid.mesh()
        d = np.pad(d, (0, 3 - d.shape[0]))
        phase = d[0] * X.ravel() + d[1] * Y.ravel() + d[2] * Z.ravel()
    return to_device_complex(np.exp(1j * problem.k * phase), dtype)


@functools.lru_cache(maxsize=None)
def _solve_jit(rtol: float, restart: int, maxiter: int):
    """One jitted solve per solver budget: the operator/preconditioner
    pytrees are ARGUMENTS, so repeated :func:`solve_problem` calls in one
    process reuse the compiled executable instead of re-tracing a fresh
    closure each time."""

    def run(op, precond, ui):
        rhs = -(op.apply(ui) - ui)
        pre = precond.apply if precond is not None else None
        return gmres(op.apply, rhs, preconditioner=pre,
                     rtol=rtol, restart=restart, maxiter=maxiter)

    return jax.jit(run)


@functools.lru_cache(maxsize=None)
def _solve_batched_jit(rtol: float, restart: int, maxiter: int):
    from fast_solver_lippmann_schwinger_tpu.solver.gmres import gmres_batched

    def run(op, precond, uis):
        apply_b = jax.vmap(op.apply)
        rhs = -(apply_b(uis) - uis)
        if precond is None:
            pre = None
        elif hasattr(precond, "apply_batch"):
            pre = precond.apply_batch
        else:
            pre = jax.vmap(precond.apply)
        return gmres_batched(apply_b, rhs, preconditioner=pre,
                             rtol=rtol, restart=restart, maxiter=maxiter)

    return jax.jit(run)


def solve_problem(problem: Problem, u_inc: Optional[jnp.ndarray] = None):
    """Scattering solve ``M u = -k^2 G conv (nu u_inc)`` == ``-(M-I) u_inc``.

    Returns ``(u, GMRESInfo)``.
    """
    cfg = problem.config.solver
    if u_inc is None:
        u_inc = incident_field(problem)
    run = _solve_jit(cfg.rtol, cfg.restart, cfg.maxiter)
    return run(problem.op, problem.precond, u_inc)


def solve_problem_batched(problem: Problem, directions):
    """Joint multi-direction scattering solve: one batched GMRES over all
    plane-wave ``directions`` ((R, dim) array-like).

    Sweep-family preconditioners expose ``apply_batch`` — their local
    solves stream each pivot plane from HBM once for the whole batch
    (measured 1.95x dual-direction throughput at the 801 headline,
    RESULTS.md); other preconditioners fall back to a vmapped apply.
    Returns ``(u, GMRESInfo)`` with leading batch axes.
    """
    cfg = problem.config.solver
    dtype = problem.op.symbol.dtype
    d = np.asarray(directions, dtype=np.float64)
    mesh = problem.grid.mesh()
    d = np.pad(d, ((0, 0), (0, len(mesh) - d.shape[1])))
    phase = sum(
        d[:, i : i + 1] * ax.ravel()[None] for i, ax in enumerate(mesh)
    )
    u_inc = to_device_complex(np.exp(1j * problem.k * phase), dtype)
    run = _solve_batched_jit(cfg.rtol, cfg.restart, cfg.maxiter)
    return run(problem.op, problem.precond, u_inc)
