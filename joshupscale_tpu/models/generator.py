"""Generator (resnet architecture).

Capability parity with reference ``scripts/training/models.py``
get_generator_resnet (:484-595):

- inputs: LR frame (N,H,W,3) + warped previous HR output (N,4H,4W,3)
- pipeline: concat(frame, space_to_depth4(pre_warp)) -> conv64 ->
  N res blocks (+ optional fade-in blocks) -> deconv2x 32 -> deconv2x 3 ->
  tanh -> + TF1-bilinear4(frame) -> clip [-0.5, 0.5]
- output: (N, 4H, 4W, 3) residual-refined upscale.

TPU-first: both deconvs are 1x1-conv + depth_to_space (exact for kernel 2 /
stride 2 -- see nn.layers.conv2d_transpose_2x), keeping the whole tail on
the MXU; the bilinear skip uses the phase-weight upscale (no gathers).
"""

from __future__ import annotations

from typing import Optional

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
    conv2d_transpose_2x,
    conv2d_transpose_2x_init,
    get_activation,
)
from joshupscale_tpu.ops import space_to_depth, upscale_bilinear


def generator_resnet_init(
    key,
    num_filters: int = 64,
    num_res_blocks: int = 24,
    num_fade_in_res_blocks: int = 0,
    fade_in_period: int = 0,
    dtype=jnp.float32,
    zero_init_tail: bool = False,
):
    total_blocks = num_res_blocks + num_fade_in_res_blocks
    keys = jax.random.split(key, total_blocks + 3)
    # Input channels: 3 (frame) + 48 (space_to_depth4 of 3ch pre_warp).
    params = {
        "conv_1": conv2d_init(keys[0], 3, 51, num_filters, use_bias=False,
                              dtype=dtype),
        "bn_1": batch_norm_init(num_filters, dtype),
        "conv_trans_1": conv2d_transpose_2x_init(
            keys[1], num_filters, 32, use_bias=False, dtype=dtype
        ),
        "bn_2": batch_norm_init(32, dtype),
        "conv_trans_2": conv2d_transpose_2x_init(
            keys[2], 32, 3, use_bias=True, dtype=dtype
        ),
    }
    for i in range(num_res_blocks):
        params[f"block_{i + 1}"] = res_block_init(
            keys[3 + i], num_filters, dtype=dtype
        )
    for i in range(num_res_blocks, total_blocks):
        params[f"block_{i + 1}"] = res_block_init(
            keys[3 + i], num_filters, fade_in_period=fade_in_period,
            dtype=dtype,
        )
    if zero_init_tail:
        # Training-from-scratch accelerator (config `zero_init_tail`):
        # zero the final deconv so the tanh residual starts at 0 and the
        # model opens AT the bilinear-skip baseline instead of burying
        # it under a random residual (which costs thousands of steps to
        # unlearn -- measured: content loss 0.27 after 2.8K steps from
        # the default init).  Weight imports overwrite this, so serving
        # parity is unaffected; the reference keeps Keras glorot
        # (models.py:484-595).
        ct2 = params["conv_trans_2"]
        params["conv_trans_2"] = {
            k: jnp.zeros_like(v) for k, v in ct2.items()
        }
    params["_meta"] = {}
    return params


def generator_resnet_apply(
    params,
    frame: jnp.ndarray,
    pre_warp: Optional[jnp.ndarray],
    activation="relu",
    mut: Optional[Mutables] = None,
    s2d_output: bool = False,
):
    """Apply the generator: (frame, warped prev HR) -> refined HR frame.

    ``s2d_output=True``: ``pre_warp`` is taken in s2d form (N, H, W, 48)
    and the output is returned in s2d form too (serving fast path, see
    ``_tail_s2d``).

    ``pre_warp=None`` is the non-temporal single-frame variant (reference
    ``scripts/inference/onnx/remove_flow.py:64-77``): the first conv's
    kernel is sliced to the 3 frame channels -- exactly equivalent to the
    reference's weight surgery.
    """
    mut = mut or Mutables(False)
    act = get_activation(activation)
    num_blocks = sum(1 for k in params if k.startswith("block_"))

    if pre_warp is None:
        inp = frame
        conv_1 = dict(params["conv_1"])
        if "kernel_q" in conv_1:
            conv_1["kernel_q"] = conv_1["kernel_q"][:, :, :3, :]
        else:
            conv_1["kernel"] = conv_1["kernel"][:, :, :3, :]
    else:
        warp_s2d = pre_warp if s2d_output else space_to_depth(pre_warp, 4)
        inp = jnp.concatenate([frame, warp_s2d], axis=-1)
        conv_1 = params["conv_1"]
    out = conv_bn(conv_1, params["bn_1"], inp, mut, "bn_1")
    out = act(out)
    out = res_blocks_apply(
        params, [f"block_{i + 1}" for i in range(num_blocks)],
        out, activation, mut)
    if s2d_output:
        return _tail_s2d(params, frame, out, act, mut)
    out = conv2d_transpose_2x(params["conv_trans_1"], out)
    out = mut.bn(params["bn_2"], "bn_2", out)
    out = act(out)
    out = conv2d_transpose_2x(params["conv_trans_2"], out)
    out = jnp.tanh(out)
    upscaled = upscale_bilinear(frame, 4)
    out = upscaled + out
    return jnp.clip(out, -0.5, 0.5)


def _tail_s2d(params, frame, out, act, mut):
    """Generator tail computed entirely in space-to-depth form.

    Numerically equivalent to deconv2x -> BN -> act -> deconv2x -> tanh
    -> + bilinear4(frame) -> clip followed by space_to_depth(4), but no
    HR-layout tensor is ever materialized (the d2s/transpose chain costs
    ~13 ms/frame at 1080p on v5e):

    - deconv1 stays a 1x1 conv to (dy1, dx1, 32) channels, d2s skipped;
    - BN/act apply with stats tiled over the 4 (dy1, dx1) groups;
    - deconv2 becomes a block-diagonal 1x1 conv whose output channels
      are permuted to depth-to-space-4 order
      ((ry, rx, c) with ry = 2*dy1 + dy2, rx = 2*dx1 + dx2);
    - the bilinear skip uses the phase-channel conv form directly
      (already (ry, rx, c)-ordered, see ops.resize).
    """
    def _deconv_kernel(layer):
        if "kernel_q" in layer:
            return (layer["kernel_q"].astype(jnp.float32)
                    * layer["kernel_scale"].astype(jnp.float32))
        return layer["kernel"]

    k1 = _deconv_kernel(params["conv_trans_1"])  # (2, 2, 32, C_in)
    _, _, mid_ch, in_ch = k1.shape
    w1 = k1.transpose(3, 0, 1, 2).reshape(in_ch, 4 * mid_ch)
    x = jnp.einsum("nhwi,io->nhwo", out, w1.astype(out.dtype),
                   preferred_element_type=out.dtype)
    if "bias" in params["conv_trans_1"]:
        x = x + jnp.tile(params["conv_trans_1"]["bias"], 4).astype(x.dtype)

    bn = params["bn_2"]
    bn_tiled = {k: jnp.tile(v, 4) for k, v in bn.items()
                if k != "_meta"}
    x = mut.bn(bn_tiled, "bn_2", x)
    x = act(x)

    # Block-diagonal second deconv with d2s4-ordered output channels.
    k2 = _deconv_kernel(params["conv_trans_2"])  # (2, 2, 3, 32)
    _, _, out_ch, _ = k2.shape
    w2 = jnp.zeros((4 * mid_ch, 16 * out_ch), k2.dtype)
    for dy1 in range(2):
        for dx1 in range(2):
            g = dy1 * 2 + dx1
            for dy2 in range(2):
                for dx2 in range(2):
                    ry, rx = 2 * dy1 + dy2, 2 * dx1 + dx2
                    col = (ry * 4 + rx) * out_ch
                    w2 = w2.at[
                        g * mid_ch:(g + 1) * mid_ch,
                        col:col + out_ch,
                    ].set(k2[dy2, dx2].transpose(1, 0))
    x = jnp.einsum("nhwi,io->nhwo", x, w2.astype(x.dtype),
                   preferred_element_type=x.dtype)
    if "bias" in params["conv_trans_2"]:
        x = x + jnp.tile(
            params["conv_trans_2"]["bias"], 16).astype(x.dtype)
    x = jnp.tanh(x)

    from joshupscale_tpu.ops.resize import _upscale_bilinear_conv

    upscaled = _upscale_bilinear_conv(frame, 4, skip_d2s=True)
    return jnp.clip(upscaled + x, -0.5, 0.5)
