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


def fetch(x) -> np.ndarray:
    """Fetch a jax array to host, working around tunnel-backend limits."""
    x = jnp.asarray(x)
    shape = x.shape
    if x.ndim == 0:
        x = x.reshape(1)
    try:
        return np.asarray(x).reshape(shape)
    except Exception:  # noqa: BLE001 — backend-specific runtime errors
        return np.asarray(_reissue(x)).reshape(shape)
