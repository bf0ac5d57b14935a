"""Spatio-temporal discriminator.

Capability parity with reference ``scripts/training/models.py``
get_discriminator (:598-677): input is a 27-channel stack of warped frame
triplets (before-warp 9ch, warped 9ch, upscaled-input 9ch); outputs are the
four intermediate block activations (feature-matching losses) plus the
final per-patch logits.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from joshupscale_tpu.models.common import Mutables
from joshupscale_tpu.nn.layers import (
    batch_norm_init,
    conv2d,
    conv2d_init,
    dense,
    dense_init,
    get_activation,
)


def discriminator_init(key, alpha: float = 1.0, dtype=jnp.float32):
    keys = jax.random.split(key, 6)
    c64 = int(64 * alpha)
    c128 = int(128 * alpha)
    c256 = int(256 * alpha)
    params = {
        "conv_1": conv2d_init(keys[0], 3, 27, c64, use_bias=True,
                              dtype=dtype),
        "block_1": {
            "conv": conv2d_init(keys[1], 4, c64, c64, use_bias=False,
                                dtype=dtype),
            "bn": batch_norm_init(c64, dtype),
        },
        "block_2": {
            "conv": conv2d_init(keys[2], 4, c64, c64, use_bias=False,
                                dtype=dtype),
            "bn": batch_norm_init(c64, dtype),
        },
        "block_3": {
            "conv": conv2d_init(keys[3], 4, c64, c128, use_bias=False,
                                dtype=dtype),
            "bn": batch_norm_init(c128, dtype),
        },
        "block_4": {
            "conv": conv2d_init(keys[4], 4, c128, c256, use_bias=False,
                                dtype=dtype),
            "bn": batch_norm_init(c256, dtype),
        },
        "dense": dense_init(keys[5], c256, 1, dtype),
        "_meta": {},
    }
    return params


def discriminator_apply(
    params,
    x: jnp.ndarray,
    activation="lrelu",
    mut: Optional[Mutables] = None,
):
    """Apply discriminator; returns [layer1..layer4 features, logits]."""
    mut = mut or Mutables(False)
    act = get_activation(activation)
    outputs = []
    net = conv2d(params["conv_1"], x)
    net = act(net)
    for i in range(1, 5):
        name = f"block_{i}"
        net = conv2d(params[name]["conv"], net, stride=2)
        net = mut.bn(params[name]["bn"], f"{name}.bn", net)
        net = act(net)
        outputs.append(net)
    logits = dense(params["dense"], net)
    outputs.append(logits)
    return outputs
