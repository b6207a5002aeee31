"""2D plasma with the polarized-traces (trace-space) preconditioner.

Equivalent of ``tests/plasma_integral_system_example.jl`` (h = 1/400,
k = 400, 8 slabs, npml = 10, trapezoidal operator, inner GMRES on the
polarized trace system with nIt = 2 block-GS).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from fast_solver_lippmann_schwinger_tpu.core.grids import Grid2D
from fast_solver_lippmann_schwinger_tpu.ddm.polarized import (
    PolarizedTracesPreconditioner,
)
from fast_solver_lippmann_schwinger_tpu.ddm.subdomain import build_slab_system
from fast_solver_lippmann_schwinger_tpu.models import media
from fast_solver_lippmann_schwinger_tpu.ops.fastconv import (
    LippmannSchwinger2D,
    build_fast_convolution_2d,
)
from fast_solver_lippmann_schwinger_tpu.solver.gmres import gmres
from fast_solver_lippmann_schwinger_tpu.sparse import stencils
from fast_solver_lippmann_schwinger_tpu.utils.host import to_device_complex


@dataclasses.dataclass
class PlasmaIntegral2DProblem:
    grid: Grid2D
    k: float
    op: LippmannSchwinger2D
    precond: PolarizedTracesPreconditioner


def build_problem(
    h: float = 1.0 / 400.0,
    n_subdomains: int = 8,
    npml: int = 10,
    n_it: int = 2,
    quad_rule: str = "trapezoidal",
    dtype=jnp.complex64,
    pivot_dtype: str = "full",
    pivot_band=None,
) -> PlasmaIntegral2DProblem:
    grid = Grid2D(a=1.0, h=h)
    k = 1.0 / h
    X, Y = grid.mesh()
    nu = media.plasma_2d(X, Y)

    op = build_fast_convolution_2d(
        grid.x, grid.y, h, k, nu, quad_rule=quad_rule, dtype=dtype
    )
    a_st, ag_st, a_np, ag_np = stencils.build_sparse_a_ag_2d(
        k, grid.x, grid.y, h, dtype=dtype, return_host=True
    )
    slabs = build_slab_system(
        a_st, ag_st, nu, grid.x, grid.y, h, k, n_subdomains, npml=npml,
        a_host=a_np, ag_host=ag_np, pivot_dtype=pivot_dtype,
        pivot_band=pivot_band,
    )
    precond = PolarizedTracesPreconditioner(slabs=slabs, a_s=a_st, n_it=n_it)
    return PlasmaIntegral2DProblem(grid=grid, k=k, op=op, precond=precond)


def solve(problem: PlasmaIntegral2DProblem, incident_direction=(1.0, 0.0),
          rtol: float = 1e-8, restart: int = 20, maxiter: int = 100):
    X, Y = problem.grid.mesh()
    dx, dy = incident_direction
    dtype = problem.op.symbol.dtype
    u_inc = to_device_complex(
        np.exp(1j * problem.k * (dx * X.ravel() + dy * Y.ravel())), dtype
    )
    fn = jax.jit(lambda op, pc, ui: gmres(
        op.apply, -(op.apply(ui) - ui), preconditioner=pc.apply,
        rtol=rtol, restart=restart, maxiter=maxiter,
    ))
    return fn(problem.op, problem.precond, u_inc)


def solve_batched(problem: PlasmaIntegral2DProblem, incident_directions,
                  rtol: float = 1e-8, restart: int = 20, maxiter: int = 100):
    """Joint multi-direction solve: one ``gmres_batched`` whose trace-space
    preconditioner (``PolarizedTracesPreconditioner.apply_batch``) carries
    all R directions through each slab solve at once (the reference driver
    loops directions serially,
    ``tests/plasma_integral_system_example.jl:115-134``)."""
    from fast_solver_lippmann_schwinger_tpu.solver.gmres import gmres_batched

    X, Y = problem.grid.mesh()
    dirs = np.asarray(incident_directions, dtype=np.float64)
    dtype = problem.op.symbol.dtype
    phases = dirs[:, 0:1] * X.ravel()[None] + dirs[:, 1:2] * Y.ravel()[None]
    u_inc = to_device_complex(np.exp(1j * problem.k * phases), dtype)

    def run(op, pc, uis):
        apply_b = jax.vmap(op.apply)
        return gmres_batched(
            apply_b, -(apply_b(uis) - uis), preconditioner=pc.apply_batch,
            rtol=rtol, restart=restart, maxiter=maxiter,
        )

    return jax.jit(run)(problem.op, problem.precond, u_inc)
