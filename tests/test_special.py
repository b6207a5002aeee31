"""Device special functions vs SciPy/AMOS."""

import jax.numpy as jnp
import numpy as np
from scipy.special import hankel1, j0 as sj0, y0 as sy0

from fast_solver_lippmann_schwinger_tpu.ops import special


def test_j0y0_accuracy():
    x = np.concatenate([
        np.linspace(0.05, 11.9, 3000),
        np.linspace(12.0, 1200.0, 3000),
    ])
    j, y = special.j0y0(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(j), sj0(x), rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(np.asarray(y), sy0(x), rtol=1e-9, atol=1e-11)


def test_greens_kernel_matches_native_sampler():
    from fast_solver_lippmann_schwinger_tpu.native.sampler import (
        hankel_kernel_table,
    )

    rng = np.random.default_rng(0)
    r = rng.uniform(1.0 / 800.0, 1.4, 20000)
    k, h = 800.0, 1.0 / 800.0
    dev = np.asarray(special.greens_kernel_2d(k, jnp.asarray(r), h))
    host = hankel_kernel_table(k, r, h)
    np.testing.assert_allclose(dev, host, rtol=1e-8, atol=1e-16)
