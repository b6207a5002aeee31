"""2D plasma scattering with the alternating bi-directional sweep.

Equivalent of the reference's headline benchmark driver
``tests/plasma_example.jl`` (h = 1/800, k = 800, 16 slabs, npml = 10,
Greengard-Vico operator, ``doublePreconditioner`` with ``maxIter = 0``) —
parameterized so tests run it scaled down.
"""

from __future__ import annotations

import dataclasses
import jax
import jax.numpy as jnp
import numpy as np

from fast_solver_lippmann_schwinger_tpu.core.grids import Grid2D
from fast_solver_lippmann_schwinger_tpu.ddm.subdomain import build_slab_system
from fast_solver_lippmann_schwinger_tpu.ddm.sweeps import DoubleSweepPreconditioner
from fast_solver_lippmann_schwinger_tpu.models import media
from fast_solver_lippmann_schwinger_tpu.ops.fastconv import (
    LippmannSchwinger2D,
    build_fast_convolution_2d,
)
from fast_solver_lippmann_schwinger_tpu.solver.gmres import gmres
from fast_solver_lippmann_schwinger_tpu.sparse import stencils
from fast_solver_lippmann_schwinger_tpu.utils.host import to_device_complex


@dataclasses.dataclass
class Plasma2DProblem:
    grid: Grid2D
    k: float
    op: LippmannSchwinger2D
    precond: DoubleSweepPreconditioner
    nu: np.ndarray


def build_problem(
    h: float = 1.0 / 800.0,
    n_subdomains: int = 16,
    npml: int = 10,
    dtype=jnp.complex64,
    double_sweep: bool = True,
    pivot_dtype: str = "full",
    pivot_dtype_t: str | None = None,
    pivot_band: int | None = None,
    pivot_rank: int | None = None,
    use_pallas: bool = False,
    cache_dir: str | None = None,
) -> Plasma2DProblem:
    """``double_sweep=False`` uses the single-direction GS sweep composite
    (reference ``Preconditioner``/``GSPreconditioner`` family) — half the
    factorization memory, a few more GMRES iterations.

    ``pivot_dtype_t`` sets a DIFFERENT pivot storage for the transposed
    (x-direction) sweep, which only smooths the y-sweep's error term and
    tolerates lower precision: y=pallas(bf16)/x=pallas_int8 measured 108.0
    ms vs 113.7 ms at the 801/2-slab headline, at 6 vs 5 outer iterations
    (RESULTS.md round 5) — a 25% x-sweep byte cut mostly eaten by the
    extra iteration, kept opt-in for robustness.

    ``use_pallas=True`` attaches the fused-Pallas substitution layout
    (``sparse/pallas_thomas.py``) so the sweeps stream pivot planes
    HBM->VMEM instead of gathering per-slab slices (~1.9x per local solve
    on TPU); pivots are then bf16 regardless of ``pivot_dtype``."""
    grid = Grid2D(a=1.0, h=h)
    k = 1.0 / h
    X, Y = grid.mesh()
    nu = media.plasma_2d(X, Y)

    op = build_fast_convolution_2d(
        grid.x, grid.y, h, k, nu, quad_rule="greengard_vico", dtype=dtype,
        cache_dir=cache_dir,
    )
    a_st, ag_st, a_np, ag_np = stencils.build_sparse_a_ag_2d(
        k, grid.x, grid.y, h, dtype=dtype, return_host=True,
        cache_dir=cache_dir,
    )
    msp = stencils.build_msp_2d(a_st, ag_st, nu, k)

    slabs = build_slab_system(
        a_st, ag_st, nu, grid.x, grid.y, h, k, n_subdomains, npml=npml,
        a_host=a_np, ag_host=ag_np, pivot_dtype=pivot_dtype,
        pivot_band=pivot_band, pivot_rank=pivot_rank, cache_dir=cache_dir,
    )
    if use_pallas:
        from fast_solver_lippmann_schwinger_tpu.ddm.subdomain import (
            attach_pallas,
        )

        slabs = attach_pallas(slabs)
        # the As.b sparsification step of every preconditioner application
        # also runs the fused Pallas stencil SpMV (ops/pallas_stencil.py)
        a_st = a_st.replace(use_pallas=True)
    if double_sweep:
        slabs_t = build_slab_system(
            a_st.transpose(), ag_st.transpose(), nu.T,
            grid.y, grid.x, h, k, n_subdomains, npml=npml,
            a_host=a_np.transpose(1, 0, 3, 2),
            ag_host=ag_np.transpose(1, 0, 3, 2),
            pivot_dtype=(pivot_dtype_t if pivot_dtype_t is not None
                         else pivot_dtype),
            pivot_band=pivot_band, pivot_rank=pivot_rank, cache_dir=cache_dir,
        )
        if use_pallas:
            slabs_t = attach_pallas(slabs_t)
        precond = DoubleSweepPreconditioner(
            slabs=slabs, slabs_t=slabs_t, msp=msp, a_s=a_st
        )
    else:
        from fast_solver_lippmann_schwinger_tpu.ddm.sweeps import (
            SingleSweepPreconditioner,
        )

        precond = SingleSweepPreconditioner(slabs=slabs, a_s=a_st)
    return Plasma2DProblem(grid=grid, k=k, op=op, precond=precond, nu=nu)


def solve(problem: Plasma2DProblem, incident_direction=(1.0, 0.0),
          rtol: float = 1e-8, restart: int = 20, maxiter: int = 100):
    """Scattering solve for a plane-wave incident field
    (``tests/plasma_example.jl:160-170``)."""
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


def solve_batched(problem: Plasma2DProblem,
                  incident_directions=((1.0, 0.0), (0.0, 1.0)),
                  rtol: float = 1e-8, restart: int = 20, maxiter: int = 100):
    """All incident directions in ONE joint batched GMRES solve.

    The reference loops directions serially (``tests/plasma_example.jl:160,172``).
    The joint form is the TPU-idiomatic replacement: the sweep local solves
    are HBM-bound on streaming the per-line pivot inverses, and the batched
    preconditioner (``DoubleSweepPreconditioner.apply_batch``) carries all R
    right-hand sides through each sweep at once — every pivot plane is read
    from HBM once per sweep for the WHOLE batch instead of once per
    direction (R solves for ~the price of one; measured ~1.8x dual-direction
    throughput at the 801 headline, RESULTS.md).

    Returns ``(x, info)`` with a leading batch axis on every field.
    """
    from fast_solver_lippmann_schwinger_tpu.solver.gmres import gmres_batched

    X, Y = problem.grid.mesh()
    dirs = np.asarray(incident_directions, dtype=np.float64)
    dtype = problem.op.symbol.dtype
    phases = dirs[:, 0:1] * X.ravel()[None, :] + dirs[:, 1:2] * Y.ravel()[None, :]
    u_inc = to_device_complex(np.exp(1j * problem.k * phases), dtype)  # (R, N)

    def fn(op, pc, uis):
        apply_b = jax.vmap(op.apply)
        return gmres_batched(
            apply_b, -(apply_b(uis) - uis), preconditioner=pc.apply_batch,
            rtol=rtol, restart=restart, maxiter=maxiter,
        )

    return jax.jit(fn)(problem.op, problem.precond, u_inc)
