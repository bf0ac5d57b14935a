"""Image value-range conversion and colour helpers.

Mirrors the reference pre/post-processing (reference
``scripts/training/keras_layers.py`` PreprocessLayer/PostprocessLayer):
frames enter the network as BGR floats in ``[-0.5, 0.5]`` and leave as
uint8 via truncating cast of ``(x + 0.5) * 255``.
"""

from __future__ import annotations

import jax.numpy as jnp

# Match the reference BGR luma weights (reference scripts/training/utils.py:151
# BGR_LUMA): ITU-R BT.601 luma in BGR channel order.
BGR_LUMA = (0.1140, 0.5870, 0.2989)


def preprocess(x: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """uint8 [0,255] -> float [-0.5, 0.5]."""
    return x.astype(dtype) / 255.0 - 0.5


def postprocess(x: jnp.ndarray) -> jnp.ndarray:
    """float [-0.5, 0.5] -> uint8 [0,255] (truncating cast, TF semantics)."""
    out = (x.astype(jnp.float32) + 0.5) * 255.0
    # TF's cast to uint8 truncates toward zero; values are already clipped
    # to [-0.5, 0.5] upstream so the range is [0, 255].
    return out.astype(jnp.uint8)


def brightness(x: jnp.ndarray, keepdims: bool = True) -> jnp.ndarray:
    """Mean BGR luma over an NHWC frame: ``mean(x * BGR_LUMA * 3)``.

    Matches the reference brightness-normalization term (reference
    ``scripts/training/models.py`` get_inference_model 'brightness' Lambda).
    """
    luma = jnp.asarray(BGR_LUMA, dtype=x.dtype) * 3.0
    b = jnp.mean(x * luma, axis=(1, 2, 3))
    if keepdims:
        return b[:, None, None, None]
    return b
