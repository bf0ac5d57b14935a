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


def _sweep(model, params, frames, record) -> None:
    """Stream ``frames`` (T, N, H, W, 3) through the recurrent model
    with correct state alignment, calling ``record(path, x)`` with each
    conv layer's INPUT.  Convs are identified by intercepting
    ``nn.layers.conv2d`` and mapping the kernel array's identity back
    to its dotted path in ``params``, so recorded keys are exactly the
    paths ``quantize_params_int8(ranges=...)`` consults."""
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

    original = nn_layers.conv2d
    original_trans = nn_layers.conv2d_transpose_2x

    def recording_conv2d(p, x, *args, **kwargs):
        path = id_to_path.get(id(p.get("kernel")))
        if path is not None:
            record(path, x)
        return original(p, x, *args, **kwargs)

    def recording_conv_trans(p, x, *args, **kwargs):
        # The generator's deconv tail quantizes too (onnx_export's
        # ConvTranspose QDQ branch, w_channel_axis=1): its input range
        # must be calibrated through the same sweep or the exporter
        # silently leaves the deconvs un-QDQ'd.
        path = id_to_path.get(id(p.get("kernel")))
        if path is not None:
            record(path, x)
        return original_trans(p, x, *args, **kwargs)

    nn_layers.conv2d = recording_conv2d
    nn_layers.conv2d_transpose_2x = recording_conv_trans
    # Model modules import the layer fns by name; patch their
    # references too.
    import joshupscale_tpu.models.common as common_mod
    import joshupscale_tpu.models.fnet as fnet_mod
    import joshupscale_tpu.models.generator as gen_mod

    patched = [common_mod, fnet_mod, gen_mod]
    saved = [m.conv2d for m in patched]
    for m in patched:
        m.conv2d = recording_conv2d
    trans_patched = [m for m in patched
                     if hasattr(m, "conv2d_transpose_2x")]
    trans_saved = [m.conv2d_transpose_2x for m in trans_patched]
    for m in trans_patched:
        m.conv2d_transpose_2x = recording_conv_trans
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
        nn_layers.conv2d_transpose_2x = original_trans
        for m, fn in zip(patched, saved):
            m.conv2d = fn
        for m, fn in zip(trans_patched, trans_saved):
            m.conv2d_transpose_2x = fn


def kl_threshold(hist: np.ndarray, num_quantized_bins: int = 128) -> int:
    """Optimal clip bin index by KL divergence (TensorRT Entropy rule).

    ``hist`` is a histogram of |activation| over uniform bins spanning
    [0, absmax].  For each candidate clip point ``i`` the reference
    distribution P is ``hist[:i]`` with the outlier tail folded into
    its last bin, and the candidate Q is P collapsed to
    ``num_quantized_bins`` int8 levels and re-expanded over P's nonzero
    support.  Returns the ``i`` minimizing KL(P||Q) — the standard
    entropy-calibration search (the reference exposes onnxruntime's
    Entropy calibrator, generate_calibration.py:22-26, which implements
    the same TensorRT rule).
    """
    hist = np.asarray(hist, np.float64)
    n = len(hist)
    if n <= num_quantized_bins or hist.sum() == 0:
        return n
    eps = 1e-4
    best_i, best_kl = n, np.inf
    for i in range(num_quantized_bins, n + 1):
        p = hist[:i].copy()
        p[i - 1] += hist[i:].sum()
        nonzero = hist[:i] > 0
        # Collapse the first i bins onto the int8 levels, then expand
        # each level's mass uniformly over its nonzero source bins.
        idx = np.arange(i) * num_quantized_bins // i
        level_mass = np.bincount(idx, weights=hist[:i],
                                 minlength=num_quantized_bins)
        level_nnz = np.bincount(idx, weights=nonzero.astype(np.float64),
                                minlength=num_quantized_bins)
        with np.errstate(divide="ignore", invalid="ignore"):
            per_bin = np.where(level_nnz > 0, level_mass / level_nnz, 0.0)
        q = np.where(nonzero, per_bin[idx], 0.0)
        # Smooth (the MXNet/TensorRT recipe): move eps mass onto empty
        # bins so KL stays finite, normalize, accumulate divergence.
        p_is_zero = p == 0
        q_is_zero = q == 0
        if (~q_is_zero).sum() == 0:
            continue
        p_s = p + eps * p_is_zero - (eps * p_is_zero.sum()
                                     / max((~p_is_zero).sum(), 1)
                                     ) * (~p_is_zero)
        q_s = q + eps * q_is_zero - (eps * q_is_zero.sum()
                                     / max((~q_is_zero).sum(), 1)
                                     ) * (~q_is_zero)
        p_s = np.clip(p_s, 1e-12, None)
        q_s = np.clip(q_s, 1e-12, None)
        p_s /= p_s.sum()
        q_s /= q_s.sum()
        kl = float(np.sum(p_s * np.log(p_s / q_s)))
        if kl < best_kl:
            best_kl, best_i = kl, i
    return best_i


def calibrate(model, params, frames, percentile: float = 100.0,
              method: Optional[str] = None, bins: int = 2048):
    """Calibrate per-conv-INPUT activation ranges over ``frames``.

    The functional analog of the reference's calibration sweep
    (generate_calibration.py:93-233) with all three of its calibrator
    choices (:22-26):

    - ``minmax`` (default): absmax over every conv call.
    - ``percentile``: per-call absmax percentile (``percentile < 100``
      implies this method for backward compatibility).
    - ``entropy``: TensorRT-style KL-divergence clipping — a second
      sweep accumulates an |x| histogram per layer (computed on device,
      only the ``bins`` counts come to host) and ``kl_threshold`` picks
      the clip minimizing KL(P||Q) against the 128-level int8 grid.

    Returns {dotted_conv_path: range} for
    ``quantize_params_int8(ranges=...)`` / ``export_onnx(int8_ranges=)``.
    """
    import jax.numpy as jnp_mod

    if method is None:
        method = "percentile" if percentile < 100.0 else "minmax"
    if method not in ("minmax", "percentile", "entropy"):
        raise ValueError(f"Unknown calibration method: {method}")

    stats: Dict[str, list] = {}

    def record_absmax(path, x):
        stats.setdefault(path, []).append(
            float(jnp_mod.max(jnp_mod.abs(x.astype(jnp_mod.float32))))
        )

    _sweep(model, params, frames, record_absmax)
    absmax = {p: float(np.max(v)) for p, v in stats.items()}
    if method == "minmax":
        return absmax
    if method == "percentile":
        return {
            path: float(np.percentile(np.asarray(vals), percentile))
            for path, vals in stats.items()
        }

    # entropy: second sweep accumulating fixed-range histograms
    hists: Dict[str, np.ndarray] = {}

    def record_hist(path, x):
        top = absmax[path]
        if top <= 0:
            return
        h, _ = jnp_mod.histogram(
            jnp_mod.abs(x.astype(jnp_mod.float32)).reshape(-1),
            bins=bins, range=(0.0, top),
        )
        prev = hists.get(path)
        hists[path] = (np.asarray(h, np.float64) if prev is None
                       else prev + np.asarray(h, np.float64))

    _sweep(model, params, frames, record_hist)
    out = {}
    for path, top in absmax.items():
        hist = hists.get(path)
        if hist is None:
            out[path] = top
            continue
        i = kl_threshold(hist)
        out[path] = (i + 0.5) * (top / bins)
    return out
