"""NaN/Inf detection for debugging (-b parity).

The reference registers `nan_hook` forward hooks on every submodule and turns
on autograd anomaly mode under `-b` (/root/reference/train.py:86-89,
nerf/nerf_helper.py:26-36). The JAX-native equivalents:
  * `nan_debug()` — context manager flipping `jax_debug_nans`, which makes XLA
    re-run any op producing NaN eagerly and raise with a traceback;
  * `nan_attribution()` — the module-ATTRIBUTED half of the hook: a flax
    method interceptor (the linen analogue of a torch forward hook) that
    tags every submodule `__call__` output with a host callback naming the
    module path, so the failure reads "In RefNeRF/spatial_mlp/Dense_3" like
    the reference's `print("In", self.__class__.__name__)` + RuntimeError;
  * `check_finite(tree)` — explicit pytree scan (usable on metrics each log
    interval, or inside host callbacks).
"""

from __future__ import annotations

import functools
import sys
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


def host_callbacks_supported() -> bool:
    """False on the axon PJRT tunnel, which reports platform 'tpu' but
    rejects host send/recv callbacks (only its platform_version string
    identifies it)."""
    try:
        version = jax.devices()[0].client.platform_version
    except Exception:
        return True
    return "axon" not in version


def _report_nan(label: str, idx: int, out: np.ndarray) -> None:
    """Host-side check mirroring the reference's nan_hook body
    (nerf_helper.py:26-36): print the offending module, raise with indices."""
    mask = np.isnan(out)
    if mask.any():
        where = np.argwhere(mask)
        print(f"In {label}", file=sys.stderr)
        raise FloatingPointError(
            f"Found NaN in output {idx} of {label}: {int(mask.sum())} "
            f"position(s), first at indices {where[:5].tolist()}"
        )


def _nan_interceptor(next_fun, args, kwargs, context):
    out = next_fun(*args, **kwargs)
    if context.method_name != "__call__":
        return out
    mod = context.module
    path = "/".join(p for p in mod.path if p) if mod.path else ""
    label = f"{path or mod.__class__.__name__} ({mod.__class__.__name__})"
    for i, leaf in enumerate(jax.tree_util.tree_leaves(out)):
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.floating):
            jax.debug.callback(functools.partial(_report_nan, label, i), leaf)
    return out


@contextmanager
def nan_attribution(enable: bool = True):
    """Module-attributed NaN detection: while active, every flax submodule
    `__call__` traced under this context gets a host callback that names the
    module that produced a NaN (reference `nan_hook` on every submodule,
    train.py:86-89). Works under jit — the callbacks run each step with the
    concrete outputs. Debug-only: each callback is a host sync, like the
    reference's per-module torch hooks."""
    if not enable:
        yield
        return
    if not host_callbacks_supported():
        # the axon PJRT tunnel rejects host send/recv callbacks
        # (jax.debug.callback raises UNIMPLEMENTED); keep jax_debug_nans'
        # XLA-level detection and skip the per-module attribution there
        import warnings

        warnings.warn(
            "nan_attribution: this backend does not support host callbacks; "
            "-b keeps eager NaN detection (jax_debug_nans) but without "
            "per-module attribution"
        )
        yield
        return
    import flax.linen as nn

    with nn.intercept_methods(_nan_interceptor):
        yield


def check_finite(tree, name: str = "pytree") -> None:
    """Raise FloatingPointError naming the first non-finite leaf."""
    leaves_with_paths = jax.tree_util.tree_flatten_with_path(tree)[0]
    for path, leaf in leaves_with_paths:
        arr = np.asarray(leaf) if not isinstance(leaf, jnp.ndarray) else leaf
        if not bool(jnp.all(jnp.isfinite(arr))):
            raise FloatingPointError(
                f"non-finite values in {name}{jax.tree_util.keystr(path)}"
            )
