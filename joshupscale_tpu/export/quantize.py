"""Int8 quantization for serving.

Capability parity with the reference's int8 deployment pipeline
(``scripts/inference/onnx/quantize_int8.py`` + ``generate_calibration.py``:
QDQ per-channel symmetric weights, calibrated activation ranges, conv-
family ops only), redesigned for the TPU's int8 MXU path:

- Weights: per-output-channel symmetric int8 with float scales
  (same scheme as the reference's QDQ per-channel quantization).
- Activations: dynamic per-tensor symmetric quantization at runtime
  (absmax of each conv input).  TPUs compute the absmax on-device in the
  same fused program, so no offline calibration sweep is required --
  this replaces the reference's onnxruntime calibrator + static-range
  injection while staying drop-in for any clip.  Static calibrated
  ranges are also supported (``calibrate`` + ``ranges=`` below) for
  fully static graphs.
- Convs run int8 x int8 -> int32 on the MXU (``preferred_element_type``),
  then dequantize by act_scale * per-channel weight_scale.

Usage:
    qparams = quantize_params_int8(params)      # transform a param tree
    # apply functions pick up the quantized path automatically: conv2d
    # detects {"kernel_q", "kernel_scale"} entries.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np


def quantize_kernel_int8(kernel: np.ndarray):
    """Per-output-channel symmetric int8 quantization of an HWIO kernel.

    Returns (int8 kernel, float32 per-channel scale of shape (O,)).
    """
    k = np.asarray(kernel, np.float32)
    absmax = np.abs(k).max(axis=tuple(range(k.ndim - 1)))
    scale = np.where(absmax > 0, absmax / 127.0, 1.0).astype(np.float32)
    q = np.clip(np.round(k / scale), -127, 127).astype(np.int8)
    return q, scale


def quantize_params_int8(
    params,
    min_elements: int = 4096,
    ranges: Optional[Dict[str, float]] = None,
    _path: str = "",
):
    """Quantize every conv kernel in a param tree to int8.

    Layers with fewer than ``min_elements`` kernel weights stay float
    (tiny layers gain nothing and lose accuracy -- mirrors the
    reference's op-type restriction).  ``ranges`` optionally maps dotted
    layer paths to calibrated activation absmax values; layers present
    use a static activation scale instead of dynamic absmax.
    """
    if isinstance(params, dict):
        if "kernel" in params and np.ndim(params["kernel"]) == 4:
            kernel = np.asarray(params["kernel"])
            if kernel.size >= min_elements:
                q, scale = quantize_kernel_int8(kernel)
                out = {
                    k: v for k, v in params.items() if k != "kernel"
                }
                out["kernel_q"] = jnp.asarray(q)
                out["kernel_scale"] = jnp.asarray(scale)
                if ranges and _path in ranges:
                    out["act_scale"] = jnp.float32(
                        ranges[_path] / 127.0
                    )
                return out
            return dict(params)
        return {
            k: (v if k == "_meta" else quantize_params_int8(
                v, min_elements, ranges,
                f"{_path}.{k}" if _path else str(k)))
            for k, v in params.items()
        }
    if isinstance(params, list):
        return [
            quantize_params_int8(v, min_elements, ranges,
                                 f"{_path}.{i}" if _path else str(i))
            for i, v in enumerate(params)
        ]
    return params


def calibrate(model, params, frames, percentile: float = 100.0):
    """Record per-conv-INPUT activation absmax over calibration frames.

    The functional analog of the reference's calibration sweep
    (generate_calibration.py:93-233): streams ``frames`` (T, N, H, W, 3)
    through the recurrent model with correct state alignment, recording
    each conv layer's input absmax.  Convs are identified by
    intercepting ``nn.layers.conv2d`` and mapping the kernel array's
    identity back to its dotted path in ``params``, so the returned keys
    are exactly the paths ``quantize_params_int8(ranges=...)`` consults.

    Returns {dotted_conv_path: absmax}.  Percentile < 100 clips outliers
    (reference Percentile calibrator).
    """
    import jax.numpy as jnp_mod

    from joshupscale_tpu.models import common as model_common
    from joshupscale_tpu.nn import layers as nn_layers

    # kernel array id -> dotted layer path
    id_to_path: Dict[int, str] = {}

    def index(tree, prefix=""):
        if isinstance(tree, dict):
            if "kernel" in tree and np.ndim(tree["kernel"]) == 4:
                id_to_path[id(tree["kernel"])] = prefix
                return
            for k, v in tree.items():
                if k != "_meta":
                    index(v, f"{prefix}.{k}" if prefix else str(k))
        elif isinstance(tree, list):
            for i, v in enumerate(tree):
                index(v, f"{prefix}.{i}" if prefix else str(i))

    index(params)

    stats: Dict[str, list] = {}
    original = nn_layers.conv2d

    def recording_conv2d(p, x, *args, **kwargs):
        path = id_to_path.get(id(p.get("kernel")))
        if path is not None:
            stats.setdefault(path, []).append(
                float(jnp_mod.max(jnp_mod.abs(
                    x.astype(jnp_mod.float32))))
            )
        return original(p, x, *args, **kwargs)

    nn_layers.conv2d = recording_conv2d
    # Model modules import conv2d by name; patch their references too.
    import joshupscale_tpu.models.common as common_mod
    import joshupscale_tpu.models.fnet as fnet_mod
    import joshupscale_tpu.models.generator as gen_mod

    patched = [common_mod, fnet_mod, gen_mod]
    saved = [m.conv2d for m in patched]
    for m in patched:
        m.conv2d = recording_conv2d
    # Disable inference BN-folding for the sweep: the fold builds NEW
    # kernel arrays (kernel * inv), which would hide every conv-with-BN
    # from the identity-based path map above.
    fold_before = model_common.FOLD_BN
    model_common.FOLD_BN = False
    try:
        state = model.init_state(frames.shape[1])
        for t in range(frames.shape[0]):
            _, state = model.apply(params, frames[t], state)
    finally:
        model_common.FOLD_BN = fold_before
        nn_layers.conv2d = original
        for m, fn in zip(patched, saved):
            m.conv2d = fn
    return {
        path: float(np.percentile(np.asarray(vals), percentile))
        for path, vals in stats.items()
    }
