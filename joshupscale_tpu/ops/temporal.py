"""Temporal output stabilization (frame moving average) with scene-change
detection.

Behavioral parity with reference
``scripts/inference/onnx/frame_moving_avg.py`` (:99-307), which bakes the
filter into the exported graph.  Here it is a pure op applied between the
generator output and the recurrent state:

    diff   = norm(gen - pre_warp)            (L1 abs or L2 square)
    mean   = global mean | strided box-conv window means
    cond   = sign(mean - threshold)          (gain=0)
             tanh(gain * (mean - threshold)) (gain>0, soft)
    mask   = strength * (1 - cond) / 2       (in [0, strength])
    output = pre_warp * mask + gen * (1 - mask)

No scene change (small diff, cond=-1): output blends ``strength`` of the
warped previous frame in.  Scene cut (large diff, cond=+1): the average
is disabled and the generator output passes through.  With window > 0
the decision is local: per-window means, upscaled back bilinearly
(asymmetric grid, matching ONNX Resize coordinate_transformation_mode=
"asymmetric" == the TF1 legacy grid).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from joshupscale_tpu.ops.image import BGR_LUMA
from joshupscale_tpu.ops.resize import resize_bilinear


@dataclasses.dataclass(frozen=True)
class FrameMovingAvgConfig:
    strength: float = 0.7
    window: int = 0          # 0 = global scene detection
    threshold: float = 0.1
    gain: float = 0.0        # 0 = hard sign gate, >0 = tanh soft gate
    norm: str = "l1"         # "l1" | "l2"
    limit: bool = False      # clamp pre_warp to [-0.5, 0.5] first
    luma_normalize: bool = False


def frame_moving_avg(
    gen: jnp.ndarray,
    pre_warp: jnp.ndarray,
    config: FrameMovingAvgConfig,
) -> jnp.ndarray:
    """Blend ``gen`` (N,H,W,3) with ``pre_warp`` unless a scene cut."""
    cfg = config
    dtype = gen.dtype
    n, h, w, _ = gen.shape

    warp = pre_warp.astype(dtype)
    if cfg.limit:
        warp = jnp.clip(warp, -0.5, 0.5)

    diff = (gen - warp).astype(jnp.float32)
    if cfg.norm == "l1":
        diff = jnp.abs(diff)
    elif cfg.norm == "l2":
        diff = diff * diff
    else:
        raise ValueError(f"Unknown norm type {cfg.norm}")

    gain_coef = 1.0 if cfg.gain == 0 else float(cfg.gain)
    luma = np.asarray(BGR_LUMA, np.float32) * 3.0
    if cfg.luma_normalize:
        weights = luma * gain_coef
        if cfg.norm == "l2":
            weights = weights * luma
    else:
        weights = np.full((3,), gain_coef, np.float32)

    if cfg.window == 0:
        # Global mean; reference multiplies the (possibly luma) kernel in
        # before ReduceMean, i.e. mean over all elements of w_c * diff.
        mean = jnp.mean(diff * jnp.asarray(weights), axis=(1, 2, 3),
                        keepdims=True)
        cond = _gate(mean, cfg, gain_coef)            # (N,1,1,1)
        mask = (cfg.strength * (1.0 - cond) / 2.0).astype(dtype)
    else:
        win = int(cfg.window)
        ph = (h + win - 1) // win * win
        pw = (w + win - 1) // win * win
        pad_t = (ph - h) // 2
        pad_l = (pw - w) // 2
        diff = jnp.pad(
            diff,
            ((0, 0), (pad_t, ph - h - pad_t), (pad_l, pw - w - pad_l),
             (0, 0)),
        )
        # Box conv: per-window mean of w_c * diff over window*window*3.
        kernel = jnp.asarray(
            (weights / (3.0 * win * win))[None, None, :, None]
            * np.ones((win, win, 3, 1), np.float32)
        )
        mean = jax.lax.conv_general_dilated(
            diff, kernel, window_strides=(win, win), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )  # (N, ph/win, pw/win, 1)
        cond = _gate(mean, cfg, gain_coef)
        # Upscale back on the asymmetric (TF1 legacy) grid, then crop the
        # padding off.
        cond = resize_bilinear(cond, ph, pw)
        cond = cond[:, pad_t:pad_t + h, pad_l:pad_l + w, :]
        mask = (cfg.strength * (1.0 - cond) / 2.0).astype(dtype)

    return warp * mask + gen * (1.0 - mask)


def _gate(mean: jnp.ndarray, cfg: FrameMovingAvgConfig,
          gain_coef: float) -> jnp.ndarray:
    shifted = mean - jnp.float32(cfg.threshold * gain_coef)
    if cfg.gain == 0:
        return jnp.sign(shifted)
    return jnp.tanh(shifted)
