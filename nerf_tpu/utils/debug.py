"""NaN/Inf detection for debugging (-b parity).

The reference registers `nan_hook` forward hooks on every submodule and turns
on autograd anomaly mode under `-b` (/root/reference/train.py:86-89,
nerf/nerf_helper.py:26-36). The JAX-native equivalents:
  * `nan_debug()` — context manager flipping `jax_debug_nans`, which makes XLA
    re-run any op producing NaN eagerly and raise with a traceback;
  * `check_finite(tree)` — explicit pytree scan (usable on metrics each log
    interval, or inside host callbacks).
"""

from __future__ import annotations

from contextlib import contextmanager

import jax
import jax.numpy as jnp
import numpy as np


@contextmanager
def nan_debug(enable: bool = True):
    old = jax.config.jax_debug_nans
    try:
        jax.config.update("jax_debug_nans", bool(enable))
        yield
    finally:
        jax.config.update("jax_debug_nans", old)


def check_finite(tree, name: str = "pytree") -> None:
    """Raise FloatingPointError naming the first non-finite leaf."""
    leaves_with_paths = jax.tree_util.tree_flatten_with_path(tree)[0]
    for path, leaf in leaves_with_paths:
        arr = np.asarray(leaf) if not isinstance(leaf, jnp.ndarray) else leaf
        if not bool(jnp.all(jnp.isfinite(arr))):
            raise FloatingPointError(
                f"non-finite values in {name}{jax.tree_util.keystr(path)}"
            )
