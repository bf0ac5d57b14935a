"""VGG19 feature extractor for perceptual losses.

Parity with reference ``scripts/training/models.py`` get_vgg (:938-989):
input is a BGR frame in [-0.5, 0.5]; the graph rescales with
``x * 255 + 0.5``, applies the caffe-style preprocessing (channel reversal
+ imagenet mean subtraction), then runs VGG19 features, emitting the
activations of the configured layers (default block2_conv2, block3_conv4,
block4_conv4, block5_conv4).

ImageNet weights cannot be downloaded in this environment; pass
``weights_path`` (npz with keys like ``block1_conv1.kernel``) to load
pretrained weights, otherwise the net is glorot-initialized (still a valid
fixed random-feature perceptual metric for smoke training).
"""

from __future__ import annotations

import warnings
from typing import List, Optional

import jax
import jax.numpy as jnp

from joshupscale_tpu.nn.layers import conv2d, conv2d_init

# VGG19 topology: (block, n_convs, channels)
_VGG19_CFG = [
    (1, 2, 64),
    (2, 2, 128),
    (3, 4, 256),
    (4, 4, 512),
    (5, 4, 512),
]

DEFAULT_OUT_LAYERS = [
    "block2_conv2",
    "block3_conv4",
    "block4_conv4",
    "block5_conv4",
]

_CAFFE_MEAN = (103.939, 116.779, 123.68)


def vgg19_init(key, dtype=jnp.float32):
    params = {}
    in_ch = 3
    keys = jax.random.split(key, sum(n for _, n, _ in _VGG19_CFG))
    ki = 0
    for block, n_convs, ch in _VGG19_CFG:
        for i in range(1, n_convs + 1):
            params[f"block{block}_conv{i}"] = conv2d_init(
                keys[ki], 3, in_ch, ch, use_bias=True, dtype=dtype
            )
            in_ch = ch
            ki += 1
    return params


def vgg19_apply(params, x: jnp.ndarray,
                out_layers: Optional[List[str]] = None):
    """x: (N, H, W, 3) BGR in [-0.5, 0.5]. Returns list of feature maps."""
    if out_layers is None:
        out_layers = DEFAULT_OUT_LAYERS
    out = x * 255.0 + 0.5
    # Caffe preprocess: reverse channels, subtract imagenet BGR means.
    out = out[..., ::-1] - jnp.asarray(_CAFFE_MEAN, dtype=x.dtype)
    outputs = {}
    for block, n_convs, _ in _VGG19_CFG:
        for i in range(1, n_convs + 1):
            name = f"block{block}_conv{i}"
            out = jax.nn.relu(conv2d(params[name], out))
            if name in out_layers:
                outputs[name] = out
        if block < 5:
            out = jax.lax.reduce_window(
                out, -jnp.inf, jax.lax.max,
                window_dimensions=(1, 2, 2, 1),
                window_strides=(1, 2, 2, 1),
                padding="VALID",
            )
    return [outputs[name] for name in out_layers]


def build_vgg(key, out_layers=None, weights_path=None, dtype=jnp.float32):
    params = vgg19_init(key, dtype=dtype)
    if weights_path is not None:
        from joshupscale_tpu.export.importer import load_params_npz

        params = load_params_npz(weights_path, params)
    else:
        warnings.warn(
            "VGG19 built with random weights (no imagenet weights "
            "available); perceptual loss uses fixed random features."
        )
    layers = list(out_layers) if out_layers else list(DEFAULT_OUT_LAYERS)

    def apply(p, x, **_):
        return vgg19_apply(p, x, out_layers=layers)

    return params, apply
