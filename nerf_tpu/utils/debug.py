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


def _module_label(context) -> str:
    mod = context.module
    path = "/".join(p for p in mod.path if p) if mod.path else ""
    return f"{path or mod.__class__.__name__} ({mod.__class__.__name__})"


def _nan_interceptor(next_fun, args, kwargs, context):
    out = next_fun(*args, **kwargs)
    if context.method_name != "__call__":
        return out
    label = _module_label(context)
    for i, leaf in enumerate(jax.tree_util.tree_leaves(out)):
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.floating):
            jax.debug.callback(functools.partial(_report_nan, label, i), leaf)
    return out


# --- callback-free attribution (compiled-in finite flags) -------------------
# Backends like the axon PJRT tunnel reject host send/recv callbacks, so the
# interceptor cannot print from inside the program.  Instead, while the flag
# sink is armed, every flax submodule __call__ contributes a SCALAR
# "output was non-finite" flag to the traced program; compute_loss drains the
# sink into its aux metrics dict (inside the grad trace, so no tracer leaks),
# and the trainer checks the tiny bool columns per epoch on the host —
# ordinary device->host transfers, no callbacks.

_FLAG_SINK: list | None = None


def _finite_flag(out):
    bads = [
        jnp.any(~jnp.isfinite(leaf))
        for leaf in jax.tree_util.tree_leaves(out)
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.floating)
    ]
    if not bads:
        return None
    return functools.reduce(jnp.logical_or, bads)


def _flag_interceptor(next_fun, args, kwargs, context):
    out = next_fun(*args, **kwargs)
    if context.method_name != "__call__" or _FLAG_SINK is None:
        return out
    bad = _finite_flag(out)
    if bad is not None:
        _FLAG_SINK.append((_module_label(context), bad))
    return out


def reset_nan_flags() -> None:
    """Discard any undrained sink entries from FOREIGN traces.

    While flag mode is armed for the process lifetime, EVERY jitted trace
    that runs flax modules appends flag tracers to the sink — including
    traces nobody drains (the jitted eval render chunks, a retrace of the
    epoch fn after center-crop ends).  Stale tracers from such a trace must
    not be merged into the next compute_loss trace (jnp.logical_or on a
    tracer from another trace raises UnexpectedTracerError).  compute_loss
    calls this FIRST, so the sink only ever holds entries from the trace
    that will drain them."""
    if _FLAG_SINK:
        _FLAG_SINK.clear()


def attach_nan_flags(metrics: dict) -> dict:
    """Drain the armed flag sink into ``metrics`` as
    ``nan_flag:<order>|<module>`` scalars (OR-merged when a module runs more
    than once per step).  The numeric order prefix preserves EXECUTION order
    through jit (pytree dicts come back key-sorted), so the host check can
    name the first module that went bad, like the reference's hooks.  No-op
    when attribution is not in flag mode.  Called at the end of compute_loss
    so the flags ride out of jit/scan as ordinary (stacked) aux outputs."""
    if not _FLAG_SINK:
        return metrics
    merged: dict = {}
    order: dict = {}
    for label, bad in _FLAG_SINK:
        if label in order:
            key = order[label]
            merged[key] = jnp.logical_or(merged[key], bad)
        else:
            key = f"nan_flag:{len(order):03d}|{label}"
            order[label] = key
            merged[key] = bad
    _FLAG_SINK.clear()  # emptied per trace; the sink stays armed
    return {**metrics, **merged}


def split_nan_flags(metrics: dict):
    """Split a metrics dict into (plain_metrics, flags) where flags maps
    ``<order>|<module_label>`` -> flag array, sorted by execution order."""
    plain, flags = {}, {}
    for k, v in metrics.items():
        if k.startswith("nan_flag:"):
            flags[k[len("nan_flag:"):]] = v
        else:
            plain[k] = v
    return plain, dict(sorted(flags.items()))


def raise_on_nan_flags(flags: dict) -> None:
    """Host-side check of compiled-in flags: print + raise naming the first
    flagged module in EXECUTION order (inner modules return before outer
    ones, so NaN propagation fingers the leaf that produced it, not the
    containers it flowed through) — mirroring the reference nan_hook's
    console contract (nerf_helper.py:26-36)."""
    for key, val in sorted(flags.items()):
        arr = np.asarray(val)
        if arr.any():
            off = int(np.argmax(arr.reshape(-1))) if arr.ndim else 0
            label = key.split("|", 1)[-1]
            print(f"In {label}", file=sys.stderr)
            raise FloatingPointError(
                f"Found non-finite output of {label} "
                f"(first at step offset {off} within the checked window)"
            )


@contextmanager
def nan_attribution(enable: bool = True, mode: str = "auto"):
    """Module-attributed NaN detection (reference `nan_hook` on every
    submodule, train.py:86-89).

    mode="callback" (default where supported): every flax submodule
    `__call__` traced under this context gets a host callback that names the
    module producing a NaN — immediate, with element indices.  Works under
    jit; each callback is a host sync, like the reference's torch hooks.

    mode="flags" (auto-selected on backends rejecting host callbacks, e.g.
    the axon tunnel): per-module finite checks are compiled INTO the step
    and drained through the metrics dict (see attach_nan_flags); the caller
    checks them per epoch with raise_on_nan_flags — attribution to the
    module, at epoch granularity, with no host callbacks."""
    if not enable:
        yield
        return
    if mode == "auto":
        mode = "callback" if host_callbacks_supported() else "flags"
    import flax.linen as nn

    if mode == "callback":
        with nn.intercept_methods(_nan_interceptor):
            yield
        return
    global _FLAG_SINK
    _FLAG_SINK = []
    try:
        with nn.intercept_methods(_flag_interceptor):
            yield
    finally:
        _FLAG_SINK = None


def check_finite(tree, name: str = "pytree") -> None:
    """Raise FloatingPointError naming the first non-finite leaf."""
    leaves_with_paths = jax.tree_util.tree_flatten_with_path(tree)[0]
    for path, leaf in leaves_with_paths:
        arr = np.asarray(leaf) if not isinstance(leaf, jnp.ndarray) else leaf
        if not bool(jnp.all(jnp.isfinite(arr))):
            raise FloatingPointError(
                f"non-finite values in {name}{jax.tree_util.keystr(path)}"
            )
