"""Functional NN layers over explicit parameter pytrees."""

from joshupscale_tpu.nn.layers import (
    batch_norm,
    batch_norm_init,
    conv2d,
    conv2d_init,
    conv2d_transpose_2x,
    conv2d_transpose_2x_init,
    dense,
    dense_init,
    leaky_relu,
    relu,
)

__all__ = [
    "conv2d",
    "conv2d_init",
    "conv2d_transpose_2x",
    "conv2d_transpose_2x_init",
    "batch_norm",
    "batch_norm_init",
    "dense",
    "dense_init",
    "relu",
    "leaky_relu",
]
