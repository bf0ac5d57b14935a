"""Functional conv / batch-norm / dense layers over explicit param pytrees.

Design notes (TPU-first):

- Activations are NHWC, kernels HWIO -- the layouts XLA's TPU conv emitter
  prefers; convolutions lower straight onto the MXU.
- Parameters are plain nested dicts keyed by layer name.  Model param trees
  mirror the reference's Keras layer names (``conv_1``, ``block_3/bn_2``...),
  which makes the Keras-h5 weight importer a mechanical walk.
- ``conv2d_transpose_2x`` (kernel 2, stride 2 -- the generator's only
  deconvs) is implemented as a 1x1 conv to ``4*C`` channels followed by
  depth-to-space.  A kxk stride-k deconv has non-overlapping taps, so this
  is numerically identical while turning a strided transposed conv (slow on
  TPU) into a plain MXU matmul + layout shuffle.
- Batch norm keeps Keras semantics: eps 1e-3, momentum 0.99, running stats.
  At inference the scale/offset are folded into a single multiply-add that
  XLA fuses into the preceding conv.

Initializers match Keras defaults (glorot_uniform kernels, zero bias) so a
from-scratch training run starts from the same distribution family as the
reference.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp

from joshupscale_tpu.ops.space_depth import depth_to_space

BN_EPS = 1e-3
BN_MOMENTUM = 0.99


def _glorot_uniform(key, shape, fan_in, fan_out, dtype=jnp.float32):
    limit = (6.0 / (fan_in + fan_out)) ** 0.5
    return jax.random.uniform(key, shape, dtype, -limit, limit)


# ---------------------------------------------------------------------------
# Conv2D


def conv2d_init(
    key,
    kernel_size: int,
    in_ch: int,
    out_ch: int,
    use_bias: bool = True,
    dtype=jnp.float32,
):
    """Init a conv layer param dict: kernel HWIO (+ optional bias)."""
    k = kernel_size
    fan_in = k * k * in_ch
    fan_out = k * k * out_ch
    params = {
        "kernel": _glorot_uniform(
            key, (k, k, in_ch, out_ch), fan_in, fan_out, dtype
        )
    }
    if use_bias:
        params["bias"] = jnp.zeros((out_ch,), dtype)
    return params


def conv2d(
    params,
    x: jnp.ndarray,
    stride: int = 1,
    padding: str = "SAME",
) -> jnp.ndarray:
    """NHWC conv with HWIO kernel. Output dtype follows input dtype.

    Quantized path: a param dict carrying ``kernel_q`` (int8, per-output-
    channel symmetric) + ``kernel_scale`` runs the conv on the int8 MXU
    (int8 x int8 -> int32) with dynamically (or statically, via
    ``act_scale``) quantized activations -- the TPU-native analog of the
    reference's TensorRT int8 engines (see export/quantize.py).
    """
    if "kernel_q" in params:
        return _conv2d_int8(params, x, stride, padding)
    kernel = params["kernel"].astype(x.dtype)
    out = jax.lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(stride, stride),
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if "bias" in params:
        out = out + params["bias"].astype(x.dtype)
    return out


def _conv2d_int8(params, x, stride, padding):
    if "act_scale" in params:
        act_scale = params["act_scale"].astype(jnp.float32)
    else:
        # Dynamic per-tensor symmetric activation scale (computed
        # on-device in the same program; replaces offline calibration).
        act_scale = jnp.maximum(
            jnp.max(jnp.abs(x.astype(jnp.float32))), 1e-6) / 127.0
    xq = jnp.clip(
        jnp.round(x.astype(jnp.float32) / act_scale), -127, 127
    ).astype(jnp.int8)
    out = jax.lax.conv_general_dilated(
        xq,
        params["kernel_q"],
        window_strides=(stride, stride),
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    scale = (act_scale * params["kernel_scale"].astype(jnp.float32))
    out = out.astype(jnp.float32) * scale
    if "bias" in params:
        out = out + params["bias"].astype(jnp.float32)
    return out.astype(x.dtype)


# ---------------------------------------------------------------------------
# Conv2DTranspose kernel=2 stride=2 (exact, via 1x1 conv + depth_to_space)


def conv2d_transpose_2x_init(
    key, in_ch: int, out_ch: int, use_bias: bool = True, dtype=jnp.float32
):
    """Init params for a 2x2-stride-2 transposed conv.

    Canonical storage is the *deconv* kernel ``(2, 2, out_ch, in_ch)``
    (Keras Conv2DTranspose layout) so weight import is direct; the apply
    path reshapes it to the equivalent 1x1-conv weight on the fly (traced
    once under jit, free at runtime).
    """
    fan_in = 2 * 2 * in_ch
    fan_out = 2 * 2 * out_ch
    params = {
        "kernel": _glorot_uniform(
            key, (2, 2, out_ch, in_ch), fan_in, fan_out, dtype
        )
    }
    if use_bias:
        params["bias"] = jnp.zeros((out_ch,), dtype)
    return params


def conv2d_transpose_2x(params, x: jnp.ndarray) -> jnp.ndarray:
    """Transposed conv, kernel 2, stride 2, padding SAME.

    out[2i+dy, 2j+dx, o] = sum_ci K[dy, dx, o, ci] * x[i, j, ci]
    (taps don't overlap at kernel==stride), computed as a 1x1 conv to
    ``(dy*2+dx)*out_ch + o`` channels + depth_to_space(2) -- matching
    tf.nn.depth_to_space channel order.
    """
    if "kernel_q" in params:
        # Weight-only dequant for deconvs (tiny FLOP share; the int8 MXU
        # win is in the 3x3 conv stack).  Scale broadcasts over the
        # quantization axis (the kernel's last dim).
        kernel = (
            params["kernel_q"].astype(jnp.float32)
            * params["kernel_scale"].astype(jnp.float32)
        )
    else:
        kernel = params["kernel"]  # (2, 2, O, I)
    _, _, out_ch, in_ch = kernel.shape
    # (2, 2, O, I) -> (I, 2*2*O) with channel index (dy*2+dx)*O + o.
    w = kernel.transpose(3, 0, 1, 2).reshape(in_ch, 4 * out_ch)
    out = jnp.einsum(
        "nhwi,io->nhwo",
        x,
        w.astype(x.dtype),
        preferred_element_type=x.dtype,
    )
    out = depth_to_space(out, 2)
    if "bias" in params:
        out = out + params["bias"].astype(x.dtype)
    return out


# ---------------------------------------------------------------------------
# BatchNorm


def batch_norm_init(num_ch: int, dtype=jnp.float32):
    return {
        "gamma": jnp.ones((num_ch,), dtype),
        "beta": jnp.zeros((num_ch,), dtype),
        "moving_mean": jnp.zeros((num_ch,), dtype),
        "moving_variance": jnp.ones((num_ch,), dtype),
    }


def batch_norm(
    params,
    x: jnp.ndarray,
    training: bool = False,
    eps: float = BN_EPS,
):
    """Batch norm (Keras semantics).

    Returns ``y`` at inference; ``(y, new_stats)`` when ``training`` where
    ``new_stats`` holds updated moving mean/variance.
    """
    gamma = params["gamma"]
    beta = params["beta"]
    if not training:
        # Fold into one scale/offset; XLA fuses this into the conv epilogue.
        inv = gamma * jax.lax.rsqrt(params["moving_variance"] + eps)
        scale = inv.astype(x.dtype)
        offset = (beta - params["moving_mean"] * inv).astype(x.dtype)
        return x * scale + offset

    axes = tuple(range(x.ndim - 1))
    mean = jnp.mean(x.astype(jnp.float32), axis=axes)
    var = jnp.var(x.astype(jnp.float32), axis=axes)
    inv = (gamma * jax.lax.rsqrt(var + eps)).astype(x.dtype)
    y = (x - mean.astype(x.dtype)) * inv + beta.astype(x.dtype)
    m = BN_MOMENTUM
    new_stats = {
        "moving_mean": params["moving_mean"] * m + mean * (1 - m),
        "moving_variance": params["moving_variance"] * m + var * (1 - m),
    }
    return y, new_stats


# ---------------------------------------------------------------------------
# Dense


def dense_init(key, in_dim: int, out_dim: int, dtype=jnp.float32):
    return {
        "kernel": _glorot_uniform(
            key, (in_dim, out_dim), in_dim, out_dim, dtype
        ),
        "bias": jnp.zeros((out_dim,), dtype),
    }


def dense(params, x: jnp.ndarray) -> jnp.ndarray:
    return (
        jnp.einsum(
            "...i,io->...o",
            x,
            params["kernel"].astype(x.dtype),
            preferred_element_type=x.dtype,
        )
        + params["bias"].astype(x.dtype)
    )


# ---------------------------------------------------------------------------
# Activations


def relu(x):
    return jax.nn.relu(x)


def leaky_relu(x, alpha: float = 0.3):
    """LeakyReLU with the Keras default slope 0.3 (reference 'lrelu')."""
    return jax.nn.leaky_relu(x, negative_slope=alpha)


ACTIVATIONS = {
    "relu": lambda **kw: relu,
    "lrelu": lambda negative_slope=0.3, alpha=None, **kw: (
        lambda x: leaky_relu(x, alpha if alpha is not None else negative_slope)
    ),
}


def get_activation(activation):
    """Resolve an activation config (str or {'name': ..., ...})."""
    if isinstance(activation, str):
        name, args = activation, {}
    elif isinstance(activation, dict):
        name = activation["name"]
        args = {k: v for k, v in activation.items() if k != "name"}
    else:
        raise TypeError(f"Unknown activation type: {activation!r}")
    if name not in ACTIVATIONS:
        raise ValueError(f"Unknown activation: {name}")
    return ACTIVATIONS[name](**args)
