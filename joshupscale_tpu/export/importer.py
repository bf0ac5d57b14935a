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

from typing import Dict

import jax
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


def load_params_npz(path: str, template, prefix: str = ""):
    """Load a flat npz into ``template``.

    ``prefix`` selects a dotted subtree of the file -- e.g.
    ``prefix="params.flow"`` pulls the flow net straight out of a saved
    FRVSR TrainState checkpoint (config:
    ``weights: {path: ..., prefix: params.flow}``), the GAN-stage
    bootstrap (reference models.py:1166-1186 copy_weights semantics).
    """
    with np.load(path) as data:
        flat = {k: data[k] for k in data.files}
    if prefix:
        dot = prefix + "."
        sub = {k[len(dot):]: v for k, v in flat.items()
               if k.startswith(dot)}
        if not sub:
            raise KeyError(
                f"no keys under prefix {prefix!r} in {path}")
        flat = sub
    return unflatten_into(template, flat)


def detect_checkpoint_prefix(path: str) -> str:
    """Prefix that maps a checkpoint onto an INFERENCE param tree.

    ``fit()`` saves train STATES flattened whole: a GANTrainState's
    generator subtree lives under ``gen_params.`` ({flow, generator}),
    a TrainState's under ``params.``.  A raw ``save_params_npz`` export
    needs no prefix.  Lets deployment tools accept any of the three
    checkpoint layouts without the caller spelling the prefix.
    """
    with np.load(path) as data:
        keys = list(data.files)
    for prefix in ("gen_params.", "params."):
        if any(k.startswith(prefix + "generator.")
               or k.startswith(prefix + "flow.") for k in keys):
            return prefix[:-1]
    return ""


def load_trained_params(path: str, template):
    """Template params from ANY checkpoint layout, auto-detected.

    Accepts a raw ``save_params_npz`` export, a ``fit()`` FRVSR
    TrainState checkpoint (``params.`` prefix), or a GANTrainState
    checkpoint (``gen_params.``) -- the shared loader behind every
    deployment/eval tool, so the prefix rules live in one place.
    """
    return load_params_npz(path, template,
                           prefix=detect_checkpoint_prefix(path))


# ---------------------------------------------------------------------------
# Keras h5


# Keras save order of a layer's weights, per layer kind.
_KERAS_WEIGHT_ORDER = {
    "conv": ("kernel", "bias"),
    "bn": ("gamma", "beta", "moving_mean", "moving_variance"),
    "dense": ("kernel", "bias"),
    # Fade-in layer state (reference FadeInLayer save_own_variables
    # persists the counter; the period is layer CONFIG, kept by the
    # load-side template).
    "fade": ("counter",),
}


def _layer_kind(subtree: dict):
    keys = set(subtree) - {"_meta"}
    if "gamma" in keys:
        return "bn"
    if "kernel" in keys:
        return "conv"
    if "counter" in keys:
        return "fade"
    return None


def save_keras_h5(path: str, params, scope: str = "") -> None:
    """Write a param tree as a legacy Keras ``.h5`` weights file.

    The exit door back into the reference ecosystem (the reference
    trains Keras models and exchanges ``.h5`` weight checkpoints,
    reference scripts/training/train_local.py:184-209): layers are
    written in the named legacy layout (``<layer>/<layer>/<var>:0`` +
    ``layer_names``/``weight_names`` attrs) that both Keras 2
    ``load_weights(by_name=True)`` and :func:`load_keras_h5` read.
    Round-trips bit-identically (tests/test_h5_import.py).

    ``scope`` prefixes layer names (e.g. ``generator_``) to match how a
    composed reference model namespaces its sublayers.
    """
    import h5py

    layers: Dict[str, Dict[str, np.ndarray]] = {}

    def walk(subtree, prefix):
        if not isinstance(subtree, dict):
            return
        kind = _layer_kind(subtree)
        if kind is None:
            for k, v in subtree.items():
                if k == "_meta":
                    continue
                walk(v, f"{prefix}.{k}" if prefix else str(k))
            return
        layer_name = scope + prefix.replace(".", "_")
        order = [k for k in _KERAS_WEIGHT_ORDER[kind] if k in subtree]
        layers[layer_name] = {
            key: np.asarray(subtree[key]) for key in order
        }

    walk(params, "")
    with h5py.File(path, "w") as f:
        f.attrs["layer_names"] = [name.encode() for name in layers]
        f.attrs["backend"] = b"tensorflow"
        for name, weights in layers.items():
            g = f.create_group(name)
            g.attrs["weight_names"] = [
                f"{name}/{var}:0".encode() for var in weights
            ]
            inner = g.create_group(name)
            for var, arr in weights.items():
                inner.create_dataset(f"{var}:0", data=arr)


def load_keras_h5(path: str, template, scope: str = ""):
    """Load a Keras ``.h5`` weights file into a param tree.

    Supports both formats the reference ecosystem produces:

    - Keras 3: ``layers/<auto>/vars/<i>`` datasets; the TRUE layer name
      lives in the ``vars`` group's ``name`` attribute, and weights are
      positional in the layer's canonical order (conv: kernel[, bias];
      BN: gamma, beta, moving_mean, moving_variance).
    - Legacy Keras 2 (what the reference's train_local.py wrote):
      ``model_weights/<layer>/<layer>/<var>:0`` with named variables.

    Layer names map to tree paths: ``block_3_bn_2`` -> ``block_3.bn_2``.
    Composed models (e.g. the reference INFERENCE model, which nests the
    flow and generator submodels whose layer names collide -- both have
    a ``conv_1``) are handled by qualifying each layer with its
    enclosing submodel names: ``flow_conv_1`` / ``generator_conv_1``,
    matching the nested param-tree prefixes.
    ``scope`` strips a leading prefix (e.g. ``generator_``) from h5
    layer names first.
    """
    import h5py

    # layer name -> either {varname: array} (legacy) or [arrays] (Keras3)
    named: Dict[str, Dict[str, np.ndarray]] = {}
    positional: Dict[str, list] = {}

    def _dec(x):
        return x.decode() if isinstance(x, bytes) else str(x)

    with h5py.File(path, "r") as f:
        def visit(name, obj):
            if (isinstance(obj, h5py.Group)
                    and name.split("/")[-1] == "vars"):
                lname = obj.attrs.get("name")
                if lname is None:
                    return
                arrs = [
                    np.asarray(obj[k])
                    for k in sorted(obj.keys(), key=lambda s: int(s))
                ]
                if not arrs:
                    return
                # Keras 3 nests submodels: the path is
                # layers/<g>(/layers/<g>)*/vars and each enclosing <g>
                # group's own "vars" carries the TRUE submodel name.
                comps = name.split("/")
                scopes = []
                for depth in range(1, (len(comps) - 1) // 2):
                    vg = f.get("/".join(comps[:2 * depth]) + "/vars")
                    nm = (vg.attrs.get("name")
                          if vg is not None else None)
                    scopes.append(_dec(nm) if nm is not None
                                  else comps[2 * depth - 1])
                positional["_".join(scopes + [_dec(lname)])] = arrs
            elif hasattr(obj, "shape") and ":" in name.rsplit(
                "/", 1
            )[-1]:
                parts = name.replace(":0", "").split("/")
                var = parts[-1]
                comps = parts[:-1]
                if comps and comps[0] == "model_weights":
                    comps = comps[1:]
                # Legacy layout repeats the layer group name
                # (<layer>/<layer>/<var>:0); nested submodels prepend
                # their group.  Collapse adjacent duplicates so flat
                # files key as before and nested ones qualify.
                qual = [p for i, p in enumerate(comps)
                        if i == 0 or p != comps[i - 1]]
                named.setdefault("_".join(qual), {})[var] = (
                    np.asarray(obj))

        f.visititems(visit)

    def lookup(layer_name: str):
        candidates = [layer_name]
        if scope:
            candidates.insert(0, f"{scope}{layer_name}")
        for cand in candidates:
            if cand in positional:
                return ("pos", positional[cand])
            if cand in named:
                return ("named", named[cand])
        return None

    unmatched = []

    def fill(subtree, prefix):
        if not isinstance(subtree, dict):
            return subtree
        kind = _layer_kind(subtree)
        if kind is None:
            return {
                k: (v if k == "_meta" else fill(
                    v, f"{prefix}.{k}" if prefix else str(k)))
                for k, v in subtree.items()
            }
        layer_name = prefix.replace(".", "_")
        found = lookup(layer_name)
        if found is None:
            unmatched.append(layer_name)
            return subtree
        how, data = found
        out = dict(subtree)
        persisted = _KERAS_WEIGHT_ORDER[kind]
        if how == "named":
            for key in subtree:
                if key == "_meta" or key not in persisted:
                    # e.g. fade "period": layer CONFIG, not a weight --
                    # the template's value stands.
                    continue
                if key not in data:
                    unmatched.append(f"{layer_name}/{key}")
                    continue
                out[key] = data[key]
        else:
            order = [k for k in _KERAS_WEIGHT_ORDER[kind]
                     if k in subtree]
            if len(order) != len(data):
                raise KeyError(
                    f"Layer {layer_name}: checkpoint has {len(data)} "
                    f"weights, model expects {len(order)} ({order})"
                )
            for key, arr in zip(order, data):
                out[key] = arr
        for key in subtree:
            if key == "_meta":
                continue
            if tuple(np.shape(out[key])) != tuple(
                np.shape(subtree[key])
            ):
                raise ValueError(
                    f"Shape mismatch at {layer_name}/{key}: checkpoint "
                    f"{np.shape(out[key])} vs model "
                    f"{np.shape(subtree[key])}"
                )
        return out

    result = fill(template, "")
    if unmatched:
        raise KeyError(
            f"Keras h5 import left {len(unmatched)} layers unmatched "
            f"(first: {', '.join(sorted(unmatched)[:8])})"
        )
    import jax.numpy as jnp

    return jax.tree_util.tree_map(
        lambda x: jnp.asarray(x) if isinstance(x, np.ndarray) else x,
        result,
    )


def load_onnx(path: str, template):
    raise NotImplementedError(
        "ONNX import requires the 'onnx' package, which is not available "
        "in this environment. Convert the model to npz with "
        "tools/onnx_to_npz.py on a machine with onnx installed, then load "
        "with load_params_npz()."
    )
