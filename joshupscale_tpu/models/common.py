"""Shared model building blocks (res blocks, BN state threading).

Parameter trees mirror the reference's Keras layer naming
(``conv_1``, ``bn_1``, ``block_3_conv_2``; reference
``scripts/training/models.py`` res_block / get_flow_resnet) so checkpoints
and the weight importer line up name-for-name.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from joshupscale_tpu.nn.layers import (
    BN_EPS,
    batch_norm,
    batch_norm_init,
    conv2d,
    conv2d_init,
    get_activation,
)


class Mutables:
    """Collects batch-norm moving-stat updates / counters during a traced
    training forward pass.

    Apply functions call ``mut.bn(params, path, x)``; the trainer merges
    ``mut.updates`` (dotted-path -> new stats) back into the param tree
    after the step.  At inference (``training=False``) this is a zero-cost
    pass-through to the folded-BN path.
    """

    def __init__(self, training: bool = False, prefix: str = "",
                 updates: Dict[str, dict] = None, fade_offset=0):
        self.training = training
        self.prefix = prefix
        self.updates: Dict[str, dict] = {} if updates is None else updates
        # How many generator CALLS preceded this one within the current
        # train step (reference FadeInLayer assign_add(1)s per call --
        # 19x per GAN step -- so the fade scale must advance per call,
        # not per step).  Recurrent trainers pass the scan iteration
        # index (a tracer) here; see merge_scan_bn_updates.
        self.fade_offset = fade_offset

    def scoped(self, prefix: str) -> "Mutables":
        """View over the same updates dict with a path prefix (so e.g.
        flow and generator 'bn_1' entries don't collide)."""
        return Mutables(
            self.training, f"{self.prefix}{prefix}.", self.updates,
            self.fade_offset,
        )

    def bn(self, params, path: str, x):
        if not self.training:
            return batch_norm(params, x, training=False)
        y, upd = batch_norm(params, x, training=True)
        self.updates[self.prefix + path] = upd
        return y

    def fade_in(self, params, path: str, x):
        """Counter-ramped fade-in (reference keras_layers.py FadeInLayer:
        reads the counter, scales, assign_add(1)s -- PER CALL, so the
        i-th generator call in a step sees counter+i and a step advances
        the counter by the number of calls)."""
        counter = params["counter"] + self.fade_offset
        period = params["period"]
        # The schedule is state, not a trained quantity (the reference
        # counter is a non-trainable int variable): stop_gradient keeps
        # value_and_grad from pushing Adam/l2 updates into counter or
        # period.  The counter leaf itself is float32 -- integer leaves
        # in the param tree are rejected by jax.value_and_grad (same
        # class as the round-4 _meta.filters bug).
        scale = jax.lax.stop_gradient(jnp.minimum(
            counter.astype(jnp.float32) / jnp.maximum(period, 1.0), 1.0
        ))
        y = x * scale.astype(x.dtype)
        if self.training:
            self.updates[self.prefix + path] = {"counter": counter + 1}
        return y


def merge_scan_bn_updates(mut: Mutables, prefix: str, scan_updates):
    """Fold BN moving-stat updates collected INSIDE a ``lax.scan`` body
    into ``mut.updates``.

    Recurrent trainers run the generator once outside the scan (frame 0,
    whose pre-warp input is RANDOM noise / zero state) and T-1 times
    inside it (pre-warp = a real warped previous output).  Collecting
    moving statistics only from the outside call calibrates
    inference-mode batch norm to the noise-warp activation distribution,
    not the steady state the serving recurrence actually visits --
    measured as a uniform ~1.7 dB held-out penalty at training parity
    on the synthetic learning proof (round 3).

    ``scan_updates`` is a ``{path: {stat: (T, C)}}`` tree stacked by the
    scan.  Each step computed ``running * m + batch * (1 - m)`` from the
    SAME pre-step running stats, so the mean over the scan axis equals
    one momentum update with the scan-average batch statistic -- the
    steady-state estimate.  Entries overwrite the outside call's (frame
    0 is one frame of hundreds at serving).  Fade-in counters ("counter"
    leaves) take the LAST scan iteration's value: scan calls run with
    ``fade_offset = 1..T-1`` so the final entry is ``counter + T`` --
    one increment per generator call, matching the reference
    FadeInLayer's per-call assign_add (19x per GAN step).
    """
    for path, upd in scan_updates.items():
        if "counter" in upd:
            mut.updates[prefix + path] = {"counter": upd["counter"][-1]}
            continue
        mut.updates[prefix + path] = jax.tree.map(
            lambda x: jnp.mean(x, axis=0), upd
        )


def res_block_init(key, num_filters: int, fade_in_period=None,
                   dtype=jnp.float32):
    k1, k2 = jax.random.split(key)
    params = {
        "conv_1": conv2d_init(k1, 3, num_filters, num_filters,
                              use_bias=False, dtype=dtype),
        "bn_1": batch_norm_init(num_filters, dtype),
        "conv_2": conv2d_init(k2, 3, num_filters, num_filters,
                              use_bias=False, dtype=dtype),
        "bn_2": batch_norm_init(num_filters, dtype),
    }
    if fade_in_period is not None:
        # counter is float32 (exact integers up to 2^24 steps): int
        # leaves in the param tree break jax.value_and_grad in the
        # train steps; h5/npz import casts to this template dtype.
        params["fade"] = {
            "counter": jnp.zeros((), jnp.float32),
            "period": jnp.asarray(float(fade_in_period), jnp.float32),
        }
    return params


def res_blocks_apply(params, names, x, activation, mut: Mutables):
    """Run consecutive res blocks; the XLA loop by default.

    The Pallas fused chain (nn/resblock_pallas.py) is complete and
    bit-correct but MEASURED SLOWER than XLA's conv emitter (264-310
    us/conv vs XLA's 142+12 -- the in-kernel VPU patch work runs at
    half VREG width; see the CLAUDE.md dead-end log), so it ships with
    ``ENABLED = False`` and ``supported()`` returns False.  The dispatch
    hook below is kept so the kernel can be re-evaluated if Mosaic
    gains a W-in-lanes conv emitter; do not re-enable without new
    measurements."""
    if not mut.training and isinstance(activation, str):
        from joshupscale_tpu.nn import resblock_pallas

        if (jax.default_backend() == "tpu"
                and resblock_pallas.supported(x, activation, params, names)):
            return resblock_pallas.res_block_chain(
                params, names, x, activation)
    out = x
    for name in names:
        out = res_block_apply(params[name], out, activation, mut, name)
    return out


# Inference BN folding switch: export.quantize.calibrate() turns it off
# during the calibration sweep, which identifies conv layers by KERNEL
# ARRAY IDENTITY (the fold would create new kernel arrays and hide the
# generator convs from the range map).
FOLD_BN = True


def conv_bn(conv_params, bn_params, x, mut: Mutables, path: str):
    """conv2d followed by batch norm, BN-FOLDED at inference.

    At inference the BN affine is folded into the conv weights
    (``kernel * inv`` per output channel + an ``offset`` bias) instead
    of applying it to the conv output.  Mathematically identical
    (conv is linear in the kernel; same inv/offset formula as
    nn.layers.batch_norm), and the fold is a param-only computation
    XLA hoists out of the frame scan -- this removes the 43 standalone
    ~12 us scale+shift(+act) passes/frame the conv fusions could not
    absorb at 1080p on v5e.  Training and int8 (pre-quantized kernel)
    paths keep the explicit BN op.
    """
    if mut.training or not FOLD_BN or "kernel_q" in conv_params:
        out = conv2d(conv_params, x)
        return mut.bn(bn_params, path, out)
    inv = bn_params["gamma"] * jax.lax.rsqrt(
        bn_params["moving_variance"] + BN_EPS)
    offset = bn_params["beta"] - bn_params["moving_mean"] * inv
    folded = {"kernel": conv_params["kernel"] * inv, "bias": offset}
    if "bias" in conv_params:
        folded["bias"] = offset + conv_params["bias"] * inv
    return conv2d(folded, x)


def res_block_apply(params, x, activation, mut: Mutables, path: str):
    """conv-bn-act-conv-bn(-fade)-add-act residual block."""
    act = get_activation(activation)
    shortcut = x
    out = conv_bn(params["conv_1"], params["bn_1"], x, mut,
                  f"{path}.bn_1")
    out = act(out)
    out = conv_bn(params["conv_2"], params["bn_2"], out, mut,
                  f"{path}.bn_2")
    if "fade" in params:
        out = mut.fade_in(params["fade"], f"{path}.fade", out)
    out = out + shortcut
    return act(out)
