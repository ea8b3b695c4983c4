"""Checkpoint save/load for model parameters (serving weight-load path).

The reference has no checkpointing (SURVEY.md §5); the serving north star
needs a weights load path. Format: a single ``.npz`` holding the flattened
pytree with '/'-joined key paths; ``QuantizedTensor`` leaves round-trip via a
``__qt{bits}__`` marker on the values/scales entries, so quantized
checkpoints (int8/int4 weight-only) load back as QuantizedTensor without a
side table.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from flash_attention_tpu.ops.quant import QuantizedTensor

_QT = "__qt{bits}__"


def _flatten(tree, prefix=""):
    out = {}
    if isinstance(tree, QuantizedTensor):
        tag = _QT.format(bits=tree.bits)
        out[prefix + tag + "values"] = np.asarray(tree.values)
        out[prefix + tag + "scales"] = np.asarray(tree.scales)
        return out
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}/"))
        return out
    out[prefix.rstrip("/")] = np.asarray(tree)
    return out


def save_checkpoint(path: str, params) -> None:
    np.savez(path, **_flatten(params))


def load_checkpoint(path: str, dtype=None):
    """Load a checkpoint; non-quantized float leaves optionally cast to
    ``dtype``."""
    data = np.load(path)
    tree: dict = {}
    qt_parts: dict = {}
    for key in data.files:
        arr = data[key]
        if "__qt" in key:
            base, rest = key.split("__qt", 1)
            bits, part = rest.split("__", 1)
            qt_parts.setdefault(base, {"bits": int(bits)})[part] = arr
            continue
        _insert(tree, key.split("/"), _cast(arr, dtype))
    for base, parts in qt_parts.items():
        qt = QuantizedTensor(jnp.asarray(parts["values"]),
                             jnp.asarray(parts["scales"]), parts["bits"])
        _insert(tree, base.rstrip("/").split("/"), qt)
    return tree


def _cast(arr, dtype):
    x = jnp.asarray(arr)
    if dtype is not None and jnp.issubdtype(x.dtype, jnp.floating):
        x = x.astype(dtype)
    return x


def _insert(tree, keys, value):
    for k in keys[:-1]:
        tree = tree.setdefault(k, {})
    tree[keys[-1]] = value
