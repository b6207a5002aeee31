"""Fast O(N log N) application of the Lippmann-Schwinger operator.

``M u = u + omega^2 * (G conv (nu .* u))`` applied via zero-padding, FFT,
spectral multiply, inverse FFT, crop — the TPU-native counterpart of the
reference's ``FastM``/``FastM3D`` structs and their ``fastconvolution`` /
``FFTconvolution`` applies (``src/FastConvolution.jl:11-154``,
``src/FastConvolution3D.jl:7-63``).

Design notes (TPU-first):

* The spectral symbol is stored in standard (unshifted) FFT order for both
  quadrature rules — the reference's ``fftshift``/``ifftshift`` pair around
  the Greengard-Vico multiply (``src/FastConvolution.jl:94-98``) is folded
  into the symbol at build time, saving two full passes over the extended
  grid per apply.
* The trapezoidal kernel is embedded in wrap-around (circulant) order so the
  output lands at slice ``[0:m, 0:n]`` for both rules and the extended size
  can be rounded up to an FFT-friendly composite (the reference's exact
  ``2n-1`` is frequently prime).
* Operators are pytrees; ``apply`` jits and batches (the trailing FFTs are
  the only O(N log N) work; everything else fuses into elementwise ops).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from fast_solver_lippmann_schwinger_tpu.config import QuadRule
from fast_solver_lippmann_schwinger_tpu.ops import greens
from fast_solver_lippmann_schwinger_tpu.utils.host import to_device_complex


@struct.dataclass
class LippmannSchwinger2D:
    """Pytree encapsulating ``M = I + omega^2 G diag(nu)`` on a 2D grid.

    Fields mirror the reference ``FastM`` struct (``src/FastConvolution.jl:11-27``)
    with the symbol pre-folded as described in the module docstring.
    """

    symbol: jnp.ndarray        # (me, ne) complex — spectral multiplier
    nu: jnp.ndarray            # (m, n) real — medium perturbation
    omega: float = struct.field(pytree_node=False)
    n: int = struct.field(pytree_node=False)
    m: int = struct.field(pytree_node=False)
    quad_rule: str = struct.field(pytree_node=False)

    @property
    def shape(self):
        return (self.m, self.n)

    @property
    def size(self):
        return self.m * self.n

    def convolve(self, b: jnp.ndarray) -> jnp.ndarray:
        """Pure discrete convolution ``G conv b`` (no identity, no nu).

        Counterpart of ``FFTconvolution`` (``src/FastConvolution.jl:110-154``);
        used for RHS construction and for sampling Green's columns by unit
        impulses (``sampleGConv``, ``src/FastConvolution.jl:278-306``).
        """
        b2 = b.reshape(self.m, self.n)
        me, ne = self.symbol.shape
        # pruned padding: rows m..me of the extended grid are zero, so the
        # forward row-FFT runs on the m live rows only and the inverse
        # row-FFT on the m output rows only (exact; ~30% fewer FFT points)
        rows = jnp.zeros((self.m, ne), dtype=self.symbol.dtype)
        rows = rows.at[:, : self.n].set(b2.astype(self.symbol.dtype))
        rows = jnp.fft.fft(rows, axis=1)
        ext = jnp.zeros((me, ne), dtype=self.symbol.dtype)
        ext = ext.at[: self.m].set(rows)
        spec = self.symbol * jnp.fft.fft(ext, axis=0)
        out = jnp.fft.ifft(spec, axis=0)[: self.m]
        out = jnp.fft.ifft(out, axis=1)[:, : self.n]
        return out.reshape(b.shape)

    def apply(self, u: jnp.ndarray) -> jnp.ndarray:
        """``M u = u + omega^2 (G conv (nu u))`` — the GMRES hot loop.

        Counterpart of ``fastconvolution`` (``src/FastConvolution.jl:58-107``).
        """
        scaled = (self.nu.reshape(u.shape) * u).astype(self.symbol.dtype)
        return u + (self.omega ** 2) * self.convolve(scaled)

    def __call__(self, u: jnp.ndarray) -> jnp.ndarray:
        return self.apply(u)


@struct.dataclass
class LippmannSchwinger3D:
    """3D analog (reference ``FastM3D``, ``src/FastConvolution3D.jl:7-63``)."""

    symbol: jnp.ndarray        # (le, me, ne) complex
    nu: jnp.ndarray            # (l, m, n) real
    omega: float = struct.field(pytree_node=False)
    n: int = struct.field(pytree_node=False)
    m: int = struct.field(pytree_node=False)
    l: int = struct.field(pytree_node=False)
    quad_rule: str = struct.field(pytree_node=False)

    @property
    def shape(self):
        return (self.l, self.m, self.n)

    @property
    def size(self):
        return self.l * self.m * self.n

    def convolve(self, b: jnp.ndarray) -> jnp.ndarray:
        b3 = b.reshape(self.l, self.m, self.n)
        le, me, ne = self.symbol.shape
        # pruned padding (see the 2D convolve), staged per axis: each FFT
        # pass runs only over the slices that are live on its batch axes
        x = jnp.zeros((self.l, self.m, ne), dtype=self.symbol.dtype)
        x = x.at[:, :, : self.n].set(b3.astype(self.symbol.dtype))
        x = jnp.fft.fft(x, axis=2)
        y = jnp.zeros((self.l, me, ne), dtype=self.symbol.dtype)
        y = y.at[:, : self.m].set(x)
        y = jnp.fft.fft(y, axis=1)
        ext = jnp.zeros((le, me, ne), dtype=self.symbol.dtype)
        ext = ext.at[: self.l].set(y)
        spec = self.symbol * jnp.fft.fft(ext, axis=0)
        out = jnp.fft.ifft(spec, axis=0)[: self.l]
        out = jnp.fft.ifft(out, axis=1)[:, : self.m]
        out = jnp.fft.ifft(out, axis=2)[:, :, : self.n]
        return out.reshape(b.shape)

    def apply(self, u: jnp.ndarray) -> jnp.ndarray:
        scaled = (self.nu.reshape(u.shape) * u).astype(self.symbol.dtype)
        return u + (self.omega ** 2) * self.convolve(scaled)

    def __call__(self, u: jnp.ndarray) -> jnp.ndarray:
        return self.apply(u)


def _cached_symbol(compute, cache_dir, **key_fields):
    """Host-side checkpoint of a spectral symbol (``GFFT``).

    ``compute()`` returns ``(sym, *extents)``; the npz stores the symbol
    array and the integer extents, keyed on the quadrature configuration.
    """
    if cache_dir is None:
        return compute()
    import os

    from fast_solver_lippmann_schwinger_tpu.utils import checkpoint

    path = os.path.join(
        cache_dir, f"symbol_{checkpoint.config_key(**key_fields)}.npz"
    )
    if os.path.exists(path):
        data = np.load(path, allow_pickle=False)
        return (data["sym"], *(int(v) for v in data["extents"]))
    out = compute()
    os.makedirs(cache_dir, exist_ok=True)
    tmp = path + ".tmp.npz"
    with open(tmp, "wb") as fh:
        np.savez_compressed(
            fh, sym=np.asarray(out[0]),
            extents=np.asarray(out[1:], np.int64),
        )
    os.replace(tmp, path)
    return out


def build_fast_convolution_2d(
    x: np.ndarray,
    y: np.ndarray,
    h: float,
    k: float,
    nu,
    quad_rule: QuadRule | str = QuadRule.TRAPEZOIDAL,
    dtype=jnp.complex64,
    pad_to_friendly: bool = True,
    prefer_pow2: bool | None = None,
    cache_dir: str | None = None,
) -> LippmannSchwinger2D:
    """Build the 2D fast operator (reference ``buildFastConvolution``,
    ``src/FastConvolution.jl:170-236``).

    ``nu`` is either a callable ``nu(X, Y)`` over coordinate meshes or an
    ``(m, n)`` array.  ``prefer_pow2`` pins the extended-grid size class
    (power-of-two vs 5-smooth); the default ``None`` sniffs the CURRENT
    backend — pass it explicitly when building artifacts on one backend for
    use on another (pow2 measured ~6x faster per point on TPU).
    ``cache_dir`` checkpoints the spectral symbol (the reference's ``GFFT``)
    keyed on the quadrature configuration (SURVEY.md section 5).
    """
    quad_rule = QuadRule(quad_rule)
    n, m = len(x), len(y)
    X, Y = np.meshgrid(np.asarray(x), np.asarray(y), indexing="xy")
    nu_arr = nu(X, Y) if callable(nu) else np.asarray(nu).reshape(m, n)

    def _symbol():
        if quad_rule == QuadRule.TRAPEZOIDAL:
            return greens.trapezoidal_kernel_2d(
                n, m, h, k,
                ne=None if pad_to_friendly else 2 * n - 1,
                me=None if pad_to_friendly else 2 * m - 1,
                prefer_pow2=prefer_pow2,
            )
        if pad_to_friendly:
            # exact compact re-embedding of the GV quadrature: ~2n extended
            # grid instead of 4n (see greens.gv_compact_kernel_2d)
            return greens.gv_compact_kernel_2d(
                n, m, h, k, prefer_pow2=prefer_pow2
            )
        return greens.gv_symbol_2d(n, m, h, k, ne=4 * n, me=4 * m)

    sym, ne, me = _cached_symbol(
        _symbol, cache_dir, dim=2, quad=quad_rule.value, n=n, m=m, h=h, k=k,
        pad=pad_to_friendly,
        pow2=greens.resolve_prefer_pow2(prefer_pow2) if pad_to_friendly
        else None,
    )

    real_dtype = jnp.float64 if dtype == jnp.complex128 else jnp.float32
    return LippmannSchwinger2D(
        symbol=to_device_complex(sym, dtype),
        nu=jnp.asarray(nu_arr, dtype=real_dtype),
        omega=float(k),
        n=n,
        m=m,
        quad_rule=quad_rule.value,
    )


def build_fast_convolution_3d(
    x: np.ndarray,
    y: np.ndarray,
    z: np.ndarray,
    h: float,
    k: float,
    nu,
    quad_rule: QuadRule | str = QuadRule.GREENGARD_VICO,
    dtype=jnp.complex64,
    pad_to_friendly: bool = True,
    prefer_pow2: bool | None = None,
    cache_dir: str | None = None,
) -> LippmannSchwinger3D:
    """3D fast operator (reference ``buildFastConvolution3D``,
    ``src/FastConvolution3D.jl:68-132``; Greengard-Vico only, as in the
    reference's working path)."""
    quad_rule = QuadRule(quad_rule)
    if quad_rule != QuadRule.GREENGARD_VICO:
        raise NotImplementedError("3D supports the Greengard-Vico rule")
    n, m, l = len(x), len(y), len(z)
    Z, Y, X = np.meshgrid(np.asarray(z), np.asarray(y), np.asarray(x), indexing="ij")
    nu_arr = nu(X, Y, Z) if callable(nu) else np.asarray(nu).reshape(l, m, n)

    def _symbol():
        if pad_to_friendly:
            return greens.gv_compact_kernel_3d(
                n, m, l, h, k, prefer_pow2=prefer_pow2
            )
        return greens.gv_symbol_3d(
            n, m, l, h, k, ne=4 * n, me=4 * m, le=4 * l
        )

    sym, ne, me, le = _cached_symbol(
        _symbol, cache_dir, dim=3, quad=quad_rule.value, n=n, m=m, l=l, h=h,
        k=k, pad=pad_to_friendly,
        pow2=greens.resolve_prefer_pow2(prefer_pow2) if pad_to_friendly
        else None,
    )
    real_dtype = jnp.float64 if dtype == jnp.complex128 else jnp.float32
    return LippmannSchwinger3D(
        symbol=to_device_complex(sym, dtype),
        nu=jnp.asarray(nu_arr, dtype=real_dtype),
        omega=float(k),
        n=n,
        m=m,
        l=l,
        quad_rule=quad_rule.value,
    )


def sample_g_columns(op, indices: np.ndarray, chunk: int = 64) -> jnp.ndarray:
    """Green's-matrix rows via unit-impulse convolutions, batched.

    ``G`` is symmetric, so row j == column j == ``G conv e_j``.  Counterpart
    of ``sampleGConv`` / ``sampleG3D`` (``src/FastConvolution.jl:278-306``,
    ``src/FastConvolution3D.jl:136-160``), with the impulses batched through
    a single vmapped FFT convolution.

    Large batches run as ONE device program: impulses are processed in
    ``chunk``-sized groups under ``lax.map`` so the extended-grid
    intermediates stay bounded (chunk * extended-grid complex words)
    while the whole sweep still costs a single dispatch/compile — on the
    tunnel backend every distinct-shape dispatch is a multi-minute
    remote compile, so this is the difference between one compile and
    one per stencil class.

    Returns (len(indices), op.size).
    """
    indices = np.asarray(indices, dtype=np.int64)
    # bound the in-flight extended-grid intermediates (~3 live copies per
    # impulse under the vmapped convolve) to ~8 GB: at 3D scale a fixed
    # chunk of 64 puts 64 x |ext|^3 complex buffers in HBM at once
    # (measured OOM at 96^3 / ext 256^3 on a 16 GB chip)
    ext_bytes = int(np.prod(op.symbol.shape)) * op.symbol.dtype.itemsize
    chunk = max(1, min(chunk, int(8e9 // max(3 * ext_bytes, 1))))
    if indices.shape[0] <= chunk:
        return _sample_g_columns_jit(op, jnp.asarray(indices))
    n_chunks = -(-indices.shape[0] // chunk)
    padded = np.zeros(n_chunks * chunk, dtype=np.int64)  # pad with index 0
    padded[: indices.shape[0]] = indices
    rows = _sample_g_columns_chunked_jit(
        op, jnp.asarray(padded.reshape(n_chunks, chunk))
    )
    return rows.reshape(n_chunks * chunk, -1)[: indices.shape[0]]


def _impulse_rows(o, idx):
    eye_rows = jnp.zeros((idx.shape[0], o.size), dtype=o.symbol.dtype)
    eye_rows = eye_rows.at[jnp.arange(idx.shape[0]), idx].set(1.0)
    return jax.vmap(o.convolve)(eye_rows)


# op rides as a jit ARGUMENT and the impulses are built inside the
# program: closure-captured device arrays become giant embedded
# constants, which the tunnel backend rejects (UNIMPLEMENTED in
# ir_constant), and eager complex array creation is unreliable there.
# Module-level so the trace/compile cache survives across calls.
@jax.jit
def _sample_g_columns_jit(o, idx):
    return _impulse_rows(o, idx)


@jax.jit
def _sample_g_columns_chunked_jit(o, idx2):
    return jax.lax.map(lambda idx: _impulse_rows(o, idx), idx2)
