"""3D Gaussian-bump scattering with the sparsifying preconditioner.

Equivalent of ``examples/example3D.jl`` (h = 1/48, k = 48, half-open grid,
Greengard-Vico quadrature, Conv-sampled sparsifying preconditioner with
PARDISO — here the z-plane block-Thomas factorization).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from fast_solver_lippmann_schwinger_tpu.core.grids import Grid3D
from fast_solver_lippmann_schwinger_tpu.models import media
from fast_solver_lippmann_schwinger_tpu.ops.fastconv import (
    LippmannSchwinger3D,
    build_fast_convolution_3d,
)
from fast_solver_lippmann_schwinger_tpu.precond.sparsifying import (
    SparsifyingPreconditioner3D,
)
from fast_solver_lippmann_schwinger_tpu.solver.gmres import gmres
from fast_solver_lippmann_schwinger_tpu.sparse import stencils
from fast_solver_lippmann_schwinger_tpu.utils.host import to_device_complex


@dataclasses.dataclass
class Bump3DProblem:
    grid: Grid3D
    k: float
    op: LippmannSchwinger3D
    precond: Optional[object]   # SparsifyingPreconditioner3D | SingleSweepPreconditioner3D
    rhs: jnp.ndarray
    u_inc: jnp.ndarray


def build_problem(
    h: float = 1.0 / 48.0,
    dtype=jnp.complex64,
    with_preconditioner: bool = True,
    precond: str = "sparsifying",
    n_subdomains: int = 4,
    npml: int = 5,
    pivot_dtype: str = "full",
    cache_dir: str | None = None,
) -> Bump3DProblem:
    """``precond``: 'sparsifying' (full-grid factorization, reference
    ``examples/example3D.jl`` semantics), 'gs' (z-slab sweep), or
    'polarized_traces' (plane-trace integral system) — the latter two are
    3D DDM capabilities beyond the reference."""
    grid = Grid3D(a=1.0, h=h)
    k = 1.0 / h
    X, Y, Z = grid.mesh()
    nu = media.gaussian_bump_3d(X, Y, Z)

    op = build_fast_convolution_3d(
        grid.x, grid.x, grid.x, h, k, nu, dtype=dtype
    )

    pc = None
    if with_preconditioner:
        a_st, ag_st = stencils.build_sparse_a_ag_3d(
            k, op, dtype=dtype, cache_dir=cache_dir
        )
        if precond in ("gs", "polarized_traces"):
            from fast_solver_lippmann_schwinger_tpu.ddm.subdomain3d import (
                SingleSweepPreconditioner3D,
                build_slab_system_3d,
            )

            slabs = build_slab_system_3d(
                a_st, ag_st, nu, grid.x, h, k, n_subdomains, npml=npml,
                pivot_dtype=pivot_dtype, cache_dir=cache_dir,
            )
            if precond == "polarized_traces":
                from fast_solver_lippmann_schwinger_tpu.ddm.polarized3d import (
                    PolarizedTracesPreconditioner3D,
                )

                pc = PolarizedTracesPreconditioner3D(slabs=slabs, a_s=a_st)
            else:
                pc = SingleSweepPreconditioner3D(slabs=slabs, a_s=a_st)
        else:
            msp = stencils.build_msp_3d(a_st, ag_st, nu, k)
            pc = SparsifyingPreconditioner3D.build(
                msp, a_st, use_pallas=pivot_dtype.endswith("_pallas"),
            )
    precond = pc

    u_inc = to_device_complex(np.exp(1j * k * X.ravel()), dtype)
    rhs = jax.jit(lambda o, ui: -(o.apply(ui) - ui))(op, u_inc)
    return Bump3DProblem(
        grid=grid, k=k, op=op, precond=precond, rhs=rhs, u_inc=u_inc
    )


def solve(problem: Bump3DProblem, rtol: float = 1e-8, restart: int = 20,
          maxiter: int = 100, preconditioned: bool = True):
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
