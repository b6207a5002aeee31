"""Checkpoint / resume for expensive setup artifacts.

The reference has no checkpointing — every driver rebuilds the kernel
tables, annihilator stencils, and factorizations from scratch (SURVEY.md
section 5).  The expensive artifacts here are exactly those: the spectral
symbol (``GFFT``), the stencil fields (``As``/``AG``), and the block-Thomas
pivot inverses.  They are all plain arrays, so checkpoints are a single
compressed ``.npz`` per problem keyed by its configuration hash.
"""

from __future__ import annotations

import hashlib
import json
import os
import jax
import jax.numpy as jnp
import numpy as np


def config_key(**kwargs) -> str:
    """Stable short hash of a configuration dict."""
    blob = json.dumps(kwargs, sort_keys=True, default=str).encode()
    return hashlib.sha256(blob).hexdigest()[:16]


def _host_leaf(leaf) -> np.ndarray:
    """Fetch one leaf to host in an npz-portable dtype.

    bfloat16 (no portable numpy serialization) round-trips exactly through
    float32; complex leaves go through :func:`utils.host.fetch`, which works
    on restricted backends that cannot fetch complex buffers directly.
    """
    from fast_solver_lippmann_schwinger_tpu.utils.host import fetch

    if isinstance(leaf, np.ndarray):    # already host-side: no device trip
        return leaf
    leaf = jnp.asarray(leaf)
    if leaf.dtype == jnp.bfloat16:
        leaf = leaf.astype(jnp.float32)
    if leaf.size == 0:
        return np.zeros(leaf.shape, np.dtype(leaf.dtype))
    return fetch(leaf)


def save_arrays(path: str, tree, **meta) -> None:
    """Save a pytree of arrays (+ JSON metadata) to ``path`` (.npz)."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    payload = {f"leaf_{i}": _host_leaf(leaf) for i, leaf in enumerate(leaves)}
    payload["__meta__"] = np.frombuffer(
        json.dumps({"treedef": str(treedef), **meta}).encode(), dtype=np.uint8
    )
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    tmp = path + ".tmp.npz"
    with open(tmp, "wb") as fh:
        np.savez_compressed(fh, **payload)
    os.replace(tmp, path)


def load_arrays(path: str, like=None):
    """Load arrays saved by :func:`save_arrays`.

    With ``like`` (a pytree template of the same structure — e.g. the
    output of ``jax.eval_shape`` on the builder, which costs no compute),
    the flat leaves are re-assembled into that structure and placed on
    device with the template's dtypes.  Complex leaves ship real/imag
    separately (restricted backends reject complex host->device transfers).
    """
    if not os.path.exists(path):
        return None
    data = np.load(path, allow_pickle=False)
    n = len([k for k in data.files if k.startswith("leaf_")])
    leaves = [data[f"leaf_{i}"] for i in range(n)]
    if like is None:
        return leaves
    like_leaves, treedef = jax.tree_util.tree_flatten(like)
    if len(like_leaves) != len(leaves):
        return None  # stale checkpoint from an older layout
    from fast_solver_lippmann_schwinger_tpu.utils.host import to_device_complex

    dev_leaves = []
    for leaf, tmpl in zip(leaves, like_leaves):
        if leaf.shape != tuple(tmpl.shape):
            return None
        if jnp.issubdtype(tmpl.dtype, jnp.complexfloating):
            dev_leaves.append(to_device_complex(leaf, tmpl.dtype))
        else:
            dev_leaves.append(jnp.asarray(leaf, dtype=tmpl.dtype))
    return jax.tree_util.tree_unflatten(treedef, dev_leaves)
