"""TPU-native fast solver for the Lippmann-Schwinger equation.

A from-scratch JAX/XLA/Pallas re-design of the capability surface of
``tanderson92/Fast_solver_Lippmann_Schwinger`` (Julia + FFTW/UMFPACK/PARDISO/MKL):

* O(N log N) application of ``M = I + omega^2 G diag(nu)`` for the 2D/3D
  Helmholtz Lippmann-Schwinger volume integral equation via FFT Toeplitz
  embedding (reference: ``src/FastConvolution.jl``, ``src/FastConvolution3D.jl``).
* Duan-Rokhlin corrected trapezoidal and Greengard-Vico truncated-kernel
  quadratures (reference: ``FastConvolution.jl:170-236``, ``Functions.jl:40-51``).
* Sparsifying preconditioner (Ying 2014) built from SVD annihilator stencils
  (reference: ``src/SparsifyingMatrix2D.jl``, ``src/SparsifyingMatrix3D.jl``),
  represented TPU-natively as dense stencil fields instead of CSC matrices.
* Device-native block-tridiagonal direct solver replacing UMFPACK/PARDISO.
* Method of polarized traces / bi-directional Gauss-Seidel sweeping domain
  decomposition (reference: ``src/subdomains.jl``, ``src/preconditioner.jl``,
  ``src/integral_preconditioner.jl``), with multi-chip sharding over a slab
  mesh using ``shard_map`` + ``ppermute``.
* Device-resident restarted GMRES (replacing IterativeSolvers.jl).
"""

from fast_solver_lippmann_schwinger_tpu.config import (
    QuadRule,
    SolverConfig,
    DDMConfig,
)
from fast_solver_lippmann_schwinger_tpu.core.grids import Grid2D, Grid3D
from fast_solver_lippmann_schwinger_tpu.ops.fastconv import (
    LippmannSchwinger2D,
    LippmannSchwinger3D,
    build_fast_convolution_2d,
    build_fast_convolution_3d,
)
from fast_solver_lippmann_schwinger_tpu.solver.gmres import gmres
from fast_solver_lippmann_schwinger_tpu.solver.adjoint import (
    apply_transpose,
    differentiable_solve,
)
from fast_solver_lippmann_schwinger_tpu.sparse.stencil_matrix import StencilMatrix2D
from fast_solver_lippmann_schwinger_tpu.sparse.stencils import (
    build_sparse_a_2d,
    build_sparse_a_ag_2d,
)
from fast_solver_lippmann_schwinger_tpu.sparse.direct import (
    BlockTridiagFactorization,
    factor_stencil_2d,
    block_thomas_solve,
)
from fast_solver_lippmann_schwinger_tpu.precond.sparsifying import (
    SparsifyingPreconditioner,
    SparsifyingPreconditioner3D,
    SparsifyingPreconditionerT,
)
from fast_solver_lippmann_schwinger_tpu.ddm.subdomain import (
    SlabSystem,
    build_slab_system,
)
from fast_solver_lippmann_schwinger_tpu.ddm.sweeps import (
    DoubleSweepPreconditioner,
    GSPreconditioner,
    InnerGMRESPreconditioner,
    gs_sweep,
    jacobi_sweep,
)
from fast_solver_lippmann_schwinger_tpu.ddm.polarized import (
    PolarizedTracesPreconditioner,
)
from fast_solver_lippmann_schwinger_tpu.parallel.fft import (
    DistributedLS2D,
    DistributedLS3D,
    build_distributed_fast_convolution_2d,
    build_distributed_fast_convolution_3d,
)
from fast_solver_lippmann_schwinger_tpu.parallel.polarized import (
    make_sharded_polarized_preconditioner,
)
from fast_solver_lippmann_schwinger_tpu.parallel.sharded import (
    make_sharded_double_sweep,
    make_sharded_double_sweep_pipelined,
    shard_slab_system,
    sharded_gs_sweep,
    sharded_gs_sweep_pipelined,
)
from fast_solver_lippmann_schwinger_tpu.utils.fields import save_field

__version__ = "0.1.0"

__all__ = [
    "QuadRule",
    "SolverConfig",
    "DDMConfig",
    "Grid2D",
    "Grid3D",
    "LippmannSchwinger2D",
    "LippmannSchwinger3D",
    "build_fast_convolution_2d",
    "build_fast_convolution_3d",
    "gmres",
    "apply_transpose",
    "differentiable_solve",
    "StencilMatrix2D",
    "build_sparse_a_2d",
    "build_sparse_a_ag_2d",
    "BlockTridiagFactorization",
    "factor_stencil_2d",
    "block_thomas_solve",
    "SparsifyingPreconditioner",
    "SparsifyingPreconditioner3D",
    "SparsifyingPreconditionerT",
    "SlabSystem",
    "build_slab_system",
    "DoubleSweepPreconditioner",
    "GSPreconditioner",
    "InnerGMRESPreconditioner",
    "gs_sweep",
    "jacobi_sweep",
    "PolarizedTracesPreconditioner",
    "DistributedLS2D",
    "DistributedLS3D",
    "build_distributed_fast_convolution_2d",
    "build_distributed_fast_convolution_3d",
    "make_sharded_double_sweep",
    "make_sharded_double_sweep_pipelined",
    "make_sharded_polarized_preconditioner",
    "shard_slab_system",
    "sharded_gs_sweep",
    "sharded_gs_sweep_pipelined",
    "save_field",
]
