"""2D Gaussian-bump scattering problem with sparsifying preconditioner.

End-to-end equivalent of the reference's canonical driver
``examples/example.jl`` (h = 0.005, k = 1/h, Gaussian bump nu, Greengard-Vico
quadrature, sparsifying preconditioner, GMRES on the scattered field):

1. build the fast operator,
2. build the annihilator stencils A and AG (Duan-Rokhlin direct sampling,
   as ``buildSparseA``/``buildSparseAG`` at ``examples/example.jl:64-67``),
3. Msp = A + k^2 AG diag(nu), factor it on device,
4. rhs = -k^2 G conv (nu u_inc)  (``examples/example.jl:76-77``),
5. GMRES with/without the preconditioner.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from fast_solver_lippmann_schwinger_tpu.core.grids import Grid2D
from fast_solver_lippmann_schwinger_tpu.models import media
from fast_solver_lippmann_schwinger_tpu.ops.fastconv import (
    LippmannSchwinger2D,
    build_fast_convolution_2d,
)
from fast_solver_lippmann_schwinger_tpu.precond.sparsifying import (
    SparsifyingPreconditioner,
)
from fast_solver_lippmann_schwinger_tpu.solver.gmres import gmres
from fast_solver_lippmann_schwinger_tpu.sparse import stencils
from fast_solver_lippmann_schwinger_tpu.utils.host import to_device_complex


@dataclasses.dataclass
class Bump2DProblem:
    grid: Grid2D
    k: float
    op: LippmannSchwinger2D
    precond: Optional[SparsifyingPreconditioner]
    rhs: jnp.ndarray
    u_inc: jnp.ndarray


def build_problem(
    h: float = 0.005,
    quad_rule: str = "greengard_vico",
    dtype=jnp.complex64,
    with_preconditioner: bool = True,
    incident_direction=(1.0, 0.0),
) -> Bump2DProblem:
    grid = Grid2D(a=1.0, h=h)
    k = 1.0 / h
    X, Y = grid.mesh()
    nu = media.gaussian_bump_2d(X, Y)

    op = build_fast_convolution_2d(
        grid.x, grid.y, h, k, nu, quad_rule=quad_rule, dtype=dtype
    )

    precond = None
    if with_preconditioner:
        a_st, ag_st = stencils.build_sparse_a_ag_2d(
            k, grid.x, grid.y, h, dtype=dtype
        )
        msp = stencils.build_msp_2d(a_st, ag_st, nu, k)
        precond = SparsifyingPreconditioner.build(msp, a_st)

    dx, dy = incident_direction
    u_inc = to_device_complex(
        np.exp(1j * k * (dx * X.ravel() + dy * Y.ravel())), dtype
    )
    rhs = jax.jit(lambda o, s: -(k ** 2) * o.convolve(s))(
        op, to_device_complex(nu.ravel(), dtype) * u_inc
    )
    return Bump2DProblem(grid=grid, k=k, op=op, precond=precond, rhs=rhs, u_inc=u_inc)


def solve(problem: Bump2DProblem, rtol: float = 1e-8, restart: int = 20,
          maxiter: int = 200, preconditioned: bool = True):
    """Run GMRES; returns (scattered field u, GMRESInfo)."""
    if preconditioned and problem.precond is not None:
        fn = jax.jit(lambda op, pc, rhs: gmres(
            op.apply, rhs, preconditioner=pc.apply,
            rtol=rtol, restart=restart, maxiter=maxiter,
        ))
        return fn(problem.op, problem.precond, problem.rhs)
    fn = jax.jit(lambda op, rhs: gmres(
        op.apply, rhs, rtol=rtol, restart=restart, maxiter=maxiter,
    ))
    return fn(problem.op, problem.rhs)
