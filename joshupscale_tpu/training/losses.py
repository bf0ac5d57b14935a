"""Loss terms for FRVSR / TecoGAN training.

Behavioral parity with reference ``scripts/training/keras_models.py``
compute_loss implementations (FRVSRModel :255-285, GANModel :483-624):

- content / warp losses: squared difference, summed over the channel axis,
  then mean over batch/time/space.
- ping-pong loss: L1 between the forward pass and the reversed tail of the
  ping-pong sequence.
- adversarial / discriminator losses: numerically-stable sigmoid
  crossentropy built from logits (reference crossentropy_loss :541-548).
- discriminator feature-matching: per-layer L1 (channel-sum, mean), each
  normalized by a fixed constant.
- VGG loss: cosine distance between l2-normalized feature vectors.

All functions are pure; they run inside jit on TPU in whatever dtype the
caller traces (losses are accumulated in float32).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp

EPSILON = 1e-7  # keras.config.epsilon()


def _f32(x):
    return x.astype(jnp.float32)


def channel_sum_mse(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Squared diff summed over channels, mean over everything else."""
    d = jnp.square(_f32(pred) - _f32(target))
    return jnp.mean(jnp.sum(d, axis=-1))


def ping_pong_loss(gen_outputs: jnp.ndarray) -> jnp.ndarray:
    """L1 between forward frames and mirrored tail of a ping-pong run.

    gen_outputs: (B, 2T-1, H, W, C); compares frames [0:T-1] with
    [2T-2:T-1:-1].  Computed via ``flip`` over the full sequence
    instead of two slices: |x - flip(x)| is symmetric around the pivot
    frame (whose term is 0), so the slice mean equals the full sum over
    2*(T-1) frame slots.  Mathematically identical, but the backward
    pass of flip is another flip, whereas the sliced form's gradient is
    a pad(low=T) on the time axis -- which XLA:TPU folds into a conv
    window and the fusion emitter crashes on ("Check failed:
    window.pad_low[i] == 0") at the full 19-frame unroll.
    """
    n = gen_outputs.shape[1]  # 2T - 1
    diff = jnp.abs(_f32(gen_outputs) - jnp.flip(_f32(gen_outputs), 1))
    return jnp.sum(diff) / (diff.size // n * (n - 1))


def sigmoid_crossentropy(logits: jnp.ndarray) -> jnp.ndarray:
    """max(x, 0) + log1p(exp(-|x|)): -log(sigmoid(-x)) elementwise."""
    x = _f32(logits)
    return jnp.maximum(x, 0.0) + jnp.log1p(jnp.exp(-jnp.abs(x)))


def adversarial_loss(fake_logits: jnp.ndarray) -> jnp.ndarray:
    """Generator adversarial term: -log(sigmoid(fake))."""
    x = _f32(fake_logits)
    return jnp.mean(sigmoid_crossentropy(x) - x)


def discr_fake_loss(fake_logits: jnp.ndarray) -> jnp.ndarray:
    """Discriminator fake term: -log(1 - sigmoid(fake))."""
    return jnp.mean(sigmoid_crossentropy(fake_logits))


def discr_real_loss(real_logits: jnp.ndarray) -> jnp.ndarray:
    """Discriminator real term: -log(sigmoid(real))."""
    x = _f32(real_logits)
    return jnp.mean(sigmoid_crossentropy(x) - x)


def feature_matching_loss(
    real_layers: Sequence[jnp.ndarray],
    fake_layers: Sequence[jnp.ndarray],
    norms: Sequence[float],
) -> jnp.ndarray:
    """Per-layer L1 (channel sum, global mean) / norm, summed."""
    total = 0.0
    for real, fake, norm in zip(real_layers, fake_layers, norms):
        layer = jnp.mean(jnp.sum(jnp.abs(_f32(real) - _f32(fake)), axis=-1))
        total = total + layer / norm
    return total


def vgg_cosine_loss(
    real_feats: Sequence[jnp.ndarray],
    fake_feats: Sequence[jnp.ndarray],
) -> jnp.ndarray:
    """Sum over layers of (1 - mean cosine similarity).

    Normalization is exactly ``tf.math.l2_normalize(x, epsilon=1e-7)``
    (reference keras_models.py:586-592): ``x * rsqrt(max(sum(x^2),
    eps))`` -- the epsilon clamps the SQUARED norm inside the rsqrt,
    not the norm itself (the two differ by ~3x on near-zero feature
    rows, where the gradient direction matters most)."""
    total = 0.0
    for real, fake in zip(real_feats, fake_feats):
        r = _f32(real)
        f = _f32(fake)
        r = r * jax.lax.rsqrt(jnp.maximum(
            jnp.sum(jnp.square(r), axis=-1, keepdims=True), EPSILON))
        f = f * jax.lax.rsqrt(jnp.maximum(
            jnp.sum(jnp.square(f), axis=-1, keepdims=True), EPSILON))
        cos = jnp.sum(r * f, axis=-1)
        total = total + (1.0 - jnp.mean(cos))
    return total


_L2_EXCLUDED_KEYS = frozenset(
    # Non-trainable state: reference add_regularization (models.py:
    # 165-190) regularizes model.trainable_variables only -- BN moving
    # statistics and the fade-in schedule are non-trainable variables
    # there (with fade on, period**2 alone would add a huge constant).
    ("moving_mean", "moving_variance", "counter", "period")
)


def l2_regularization(params, scale: float) -> jnp.ndarray:
    """Keras-style l2 penalty: scale * sum of squares over the
    TRAINABLE leaves (kernels/biases/gamma/beta), parity with reference
    add_regularization (models.py:165-190) over trainable_variables.
    """
    import jax

    leaves = [
        x
        for path, x in jax.tree_util.tree_leaves_with_path(params)
        if hasattr(x, "dtype")
        and jnp.issubdtype(x.dtype, jnp.floating)
        and not any(
            getattr(k, "key", None) in _L2_EXCLUDED_KEYS for k in path
        )
    ]
    return scale * sum(jnp.sum(jnp.square(_f32(x))) for x in leaves)


DEFAULT_GAN_LOSS_CONFIG: Dict[str, object] = {
    # Reference GANModel._get_loss_config (keras_models.py:736-756).
    "content_loss": 1.0,
    "pp_loss": 0.5,
    "warp_loss": 1.0,
    "adv_loss": 0.1,
    "discr_layer_norms": [12.0, 14.0, 48.0, 250.0],
    "discr_layer_loss": 0.2,
    "vgg_loss": 0.2,
    "discr_real_loss": 1.0,
    "discr_fake_loss": 1.0,
    "t_balance1_threshold": 0.2,
    "t_balance2_threshold": 0.0,
}


def get_gan_loss_config(
    loss_config: Optional[Dict[str, object]] = None,
) -> Dict[str, object]:
    cfg = dict(DEFAULT_GAN_LOSS_CONFIG)
    if isinstance(loss_config, dict):
        cfg.update(loss_config)
    return cfg
