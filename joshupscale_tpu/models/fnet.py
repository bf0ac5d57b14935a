"""FNet optical-flow estimators (resnet and autoencoder variants).

Capability parity with reference ``scripts/training/models.py``
get_flow_resnet (:257-331) and get_flow_autoencoder (:334-481):

- inputs: ``num_inputs`` NHWC frames (current frame first, then previous
  frames, newest to oldest), each (N, H, W, 3)
- output: (N, 4H, 4W, 2) upscaled flow field, produced by a 32-channel
  1x1/3x3 head + depth_to_space(4).

TPU-first notes: channel-concat of the input frames happens once; all convs
are NHWC/HWIO MXU ops; the max-pool/bilinear-resize ladder of the
autoencoder uses reduce_window and the exact TF1 upscale from the ops layer.
"""

from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp

from joshupscale_tpu.models.common import (
    Mutables,
    conv_bn,
    res_block_apply,
    res_blocks_apply,
    res_block_init,
)
from joshupscale_tpu.nn.layers import (
    batch_norm_init,
    conv2d,
    conv2d_init,
    get_activation,
)
from joshupscale_tpu.ops import depth_to_space, upscale_bilinear


def flow_resnet_init(
    key,
    num_inputs: int = 4,
    num_filters: int = 64,
    num_res_blocks: int = 10,
    dtype=jnp.float32,
    zero_init_tail: bool = False,
):
    keys = jax.random.split(key, num_res_blocks + 2)
    params = {
        "conv_1": conv2d_init(keys[0], 3, num_inputs * 3, num_filters,
                              use_bias=False, dtype=dtype),
        "bn_1": batch_norm_init(num_filters, dtype),
        "conv_2": conv2d_init(keys[1], 1, num_filters, 32, use_bias=True,
                              dtype=dtype),
    }
    if zero_init_tail:
        # Zero flow head => identity warp at step 0 (see the generator's
        # zero_init_tail note); the warp loss then trains the flow net
        # from "no motion" instead of from a random vector field.
        params["conv_2"] = {
            k: jnp.zeros_like(v) for k, v in params["conv_2"].items()
        }
    for i in range(num_res_blocks):
        params[f"block_{i + 1}"] = res_block_init(
            keys[2 + i], num_filters, dtype=dtype
        )
    params["_meta"] = {}
    return params


def flow_resnet_apply(
    params,
    frames: List[jnp.ndarray],
    activation="relu",
    num_res_blocks: Optional[int] = None,
    mut: Optional[Mutables] = None,
    s2d_output: bool = False,
):
    """Apply resnet FNet to a list of frames -> (N, 4H, 4W, 2) flow.

    ``s2d_output=True`` skips the final depth_to_space and returns the
    raw 32-channel head (N, H, W, 32) -- the s2d form of the flow
    (channel ``(ry*4+rx)*2 + {y,x}``), consumed directly by
    ``dense_image_warp_s2d`` on the serving fast path (no HR-layout
    reshape on TPU).
    """
    mut = mut or Mutables(False)
    act = get_activation(activation)
    if num_res_blocks is None:
        num_res_blocks = sum(1 for k in params if k.startswith("block_"))
    out = jnp.concatenate(frames, axis=-1)
    out = conv_bn(params["conv_1"], params["bn_1"], out, mut, "bn_1")
    out = act(out)
    out = res_blocks_apply(
        params, [f"block_{i + 1}" for i in range(num_res_blocks)],
        out, activation, mut)
    out = conv2d(params["conv_2"], out)
    if s2d_output:
        return out
    return depth_to_space(out, 4)


# ---------------------------------------------------------------------------
# Autoencoder variant


def _double_conv_init(key, in_ch, out_ch, dtype):
    k1, k2 = jax.random.split(key)
    return {
        "conv_1": conv2d_init(k1, 3, in_ch, out_ch, use_bias=False,
                              dtype=dtype),
        "bn_1": batch_norm_init(out_ch, dtype),
        "conv_2": conv2d_init(k2, 3, out_ch, out_ch, use_bias=False,
                              dtype=dtype),
        "bn_2": batch_norm_init(out_ch, dtype),
    }


def _double_conv_apply(params, x, activation, mut, path):
    act = get_activation(activation)
    out = conv2d(params["conv_1"], x)
    out = mut.bn(params["bn_1"], f"{path}.bn_1", out)
    out = act(out)
    out = conv2d(params["conv_2"], out)
    out = mut.bn(params["bn_2"], f"{path}.bn_2", out)
    return act(out)


def _max_pool_2x(x):
    return jax.lax.reduce_window(
        x,
        -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else x.dtype.type(0),
        jax.lax.max,
        window_dimensions=(1, 2, 2, 1),
        window_strides=(1, 2, 2, 1),
        padding="VALID",
    )


DEFAULT_AE_FILTERS = [32, 64, 128, 256, 128, 64, 32]


def flow_autoencoder_init(
    key,
    num_inputs: int = 4,
    filters: Optional[List[int]] = None,
    dtype=jnp.float32,
):
    filters = list(filters) if filters else list(DEFAULT_AE_FILTERS)
    n_blocks = (len(filters) // 2) * 2
    keys = jax.random.split(key, len(filters) + 2)
    params = {}
    in_ch = num_inputs * 3
    for i in range(n_blocks):
        params[f"block_{i + 1}"] = _double_conv_init(
            keys[i], in_ch, filters[i], dtype
        )
        in_ch = filters[i]
    if len(filters) % 2:
        params["conv_1"] = conv2d_init(
            keys[n_blocks], 3, in_ch, filters[-1], use_bias=False, dtype=dtype
        )
        params["bn_1"] = batch_norm_init(filters[-1], dtype)
        in_ch = filters[-1]
    params["conv_2"] = conv2d_init(
        keys[-1], 3, in_ch, 32, use_bias=True, dtype=dtype
    )
    # NOTE: keep _meta leaf-free -- the param tree goes through
    # jax.value_and_grad in the trainers, and integer leaves (e.g. a
    # filters tuple) are not differentiable.  The ladder structure is
    # fully recoverable from the param names (see
    # flow_autoencoder_apply).
    params["_meta"] = {}
    return params


def flow_autoencoder_apply(
    params,
    frames: List[jnp.ndarray],
    activation="relu",
    filters: Optional[List[int]] = None,
    mut: Optional[Mutables] = None,
    s2d_output: bool = False,
):
    """Apply autoencoder FNet: down (conv-conv-pool) x K, up
    (conv-conv-bilinear2x) x K, optional mid conv, 32ch head, d2s(4).

    The ladder structure is derived from the param tree itself (half
    the ``block_i`` entries are down blocks, half up; a top-level
    ``conv_1`` is the mid conv of an odd filter list), so ``filters``
    is only needed to override that (it never is in practice)."""
    mut = mut or Mutables(False)
    act = get_activation(activation)
    if filters is not None:
        block_count = len(filters) // 2
    else:
        block_count = sum(1 for k in params
                          if k.startswith("block_")) // 2
    out = jnp.concatenate(frames, axis=-1)
    for i in range(block_count):
        name = f"block_{i + 1}"
        out = _double_conv_apply(params[name], out, activation, mut, name)
        out = _max_pool_2x(out)
    for i in range(block_count, block_count * 2):
        name = f"block_{i + 1}"
        out = _double_conv_apply(params[name], out, activation, mut, name)
        out = upscale_bilinear(out.astype(jnp.float32), 2).astype(out.dtype)
    if "conv_1" in params:  # odd filter list: mid conv after the ladder
        out = conv2d(params["conv_1"], out)
        out = mut.bn(params["bn_1"], "bn_1", out)
        out = act(out)
    out = conv2d(params["conv_2"], out)
    if s2d_output:
        return out
    return depth_to_space(out, 4)
