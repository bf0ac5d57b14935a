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
    """Record per-conv-input activation absmax over calibration frames.

    The functional analog of the reference's calibration sweep
    (generate_calibration.py:93-233): streams ``frames`` (T, N, H, W, 3)
    through the recurrent model with correct state alignment and
    collects ranges from the BN observation points.

    Returns {dotted_path: absmax}.  Percentile < 100 clips outliers
    (reference Percentile calibrator).
    """
    from joshupscale_tpu.models.common import Mutables

    import jax.numpy as jnp_mod

    class Recorder(Mutables):
        def __init__(self):
            super().__init__(False)
            self.stats: Dict[str, list] = {}

        def bn(self, p, path, x):
            self.stats.setdefault(self.prefix + path, []).append(
                float(jnp_mod.max(jnp_mod.abs(x)))
            )
            return super().bn(p, path, x)

        def scoped(self, prefix):
            view = Recorder.__new__(Recorder)
            view.training = self.training
            view.prefix = f"{self.prefix}{prefix}."
            view.updates = self.updates
            view.stats = self.stats
            return view

    rec = Recorder()
    state = model.init_state(frames.shape[1])
    for t in range(frames.shape[0]):
        _, state = model.apply(params, frames[t], state, mut=rec)
    return {
        path: float(np.percentile(np.asarray(vals), percentile))
        for path, vals in rec.stats.items()
    }
