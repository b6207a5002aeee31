"""Robust device-to-host fetching for restricted backends.

The remote-tunnel TPU backend used in development cannot fetch 0-d arrays
(hangs) or buffers produced by multi-output executables (raises
``UNIMPLEMENTED``); routing the value through a fresh single-output identity
jit produces a fetchable buffer.  On normal backends this is a no-op wrapper
around ``np.asarray``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def _reissue(x):
    return jnp.ravel(x) * 1


@jax.jit
def _reissue_complex(x):
    # 1-D single output: the tunnel backend can only fetch 1-d arrays from
    # single-output executables (2-d outputs raise UNIMPLEMENTED)
    f = jnp.ravel(x)
    return jnp.concatenate([jnp.real(f), jnp.imag(f)])


def fetch(x) -> np.ndarray:
    """Fetch a jax array to host, working around tunnel-backend limits
    (0-d fetches hang; complex buffers cannot cross host<->device)."""
    x = jnp.asarray(x)
    shape = x.shape
    if x.ndim == 0:
        x = x.reshape(1)
    if jnp.iscomplexobj(x):
        flat = np.asarray(_reissue_complex(x))
        half = flat.shape[0] // 2
        return (flat[:half] + 1j * flat[half:]).reshape(shape)
    try:
        return np.asarray(x).reshape(shape)
    except Exception:  # noqa: BLE001 — backend-specific runtime errors
        return np.asarray(_reissue(x)).reshape(shape)


def to_device_complex(arr, dtype=jnp.complex64) -> jnp.ndarray:
    """Create a complex device array from host data WITHOUT a complex
    host-to-device transfer: real and imaginary parts ship separately and
    combine on device.  Use this instead of ``jnp.asarray`` for every
    complex setup artifact (symbols, stencil fields, incident fields)."""
    arr = np.asarray(arr)
    rdtype = jnp.float64 if jnp.dtype(dtype) == jnp.complex128 else jnp.float32
    re = jnp.asarray(np.ascontiguousarray(arr.real), dtype=rdtype)
    if not np.iscomplexobj(arr):
        return _combine_real(re).astype(dtype)
    im = jnp.asarray(np.ascontiguousarray(arr.imag), dtype=rdtype)
    return _combine(re, im).astype(dtype)


@jax.jit
def _combine(re, im):
    return jax.lax.complex(re, im)


@jax.jit
def _combine_real(re):
    return jax.lax.complex(re, jnp.zeros_like(re))
