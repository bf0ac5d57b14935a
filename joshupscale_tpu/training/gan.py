"""TecoGAN adversarial training: ping-pong unroll, temporal discriminator,
VGG perceptual loss, t_balance EMA gating.

Behavioral parity with reference ``scripts/training/keras_models.py``
GANModel (:376-950), redesigned TPU-first:

- The 19-frame ping-pong sequence (10 forward + 9 mirrored) is generated
  with a rematerialized ``lax.scan``; the flow net runs once batched over
  all 18 adjacent pairs.
- The two losses (generator, discriminator) share one forward pass: the
  backward uses ``jax.vjp`` with two cotangent pulls, the JAX analog of
  the reference's single GradientTape over two losses (:658-666).
- Discriminator gating (reference tf.cond :682-691): a ``lax.cond``
  selects whether the discriminator's params/optimizer-state update is
  applied, driven by the EMA of (adv_loss - discr_real_loss).  Note: the
  reference shares one Adam iteration counter across both variable sets;
  here each group keeps its own optax count (the discriminator's bias
  correction sees only steps where it actually trained).
- t_balance2 gating of the generator's adversarial term uses the EMA
  values from the *previous* step (the reference reads the metric inside
  the tape before updating it).
- Mixed precision: on TPU we use bfloat16 compute with float32 params and
  no loss scaling (bf16 keeps fp32's exponent range, so the reference's
  dynamic loss scaling for float16 is unnecessary).

Temporal discriminator input construction (reference :872-933): frames are
grouped in consecutive triples; the previous/next frames of each triple
are warped toward the centre using (stop-gradient) flow, warped borders
are masked by a crop-to-3/4 + zero-pad, and the triple stack, its warped
version, and the bilinearly upscaled LR triple are concatenated to a
27-channel input.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from joshupscale_tpu.ops import dense_image_warp, upscale_bilinear
from joshupscale_tpu.training import losses
from joshupscale_tpu.training.frvsr import (
    _merge_bt,
    _split_bt,
    flow_history_frames,
    sequence_brightness,
)


def pingpong(x: jnp.ndarray) -> jnp.ndarray:
    """(B, T, ...) -> (B, 2T-1, ...): forward then reversed (skip last).

    Implemented as ONE constant-index take instead of
    ``concat([x, x[:, -2::-1]])``: XLA lowers that concat to
    ``pad(reversed, low=T)`` and folds the pad into the batch-merged
    discriminator/VGG conv windows downstream, which crashes the
    XLA:TPU fusion emitter ("Check failed: window.pad_low[i] == 0
    (10 vs. 0)") at the full 19-frame unroll.  A gather with a constant
    index vector carries no pad for the emitter to fold (and this is
    only applied to no-grad operands -- inputs/targets/brightness/VGG
    features of targets -- so its scatter transpose never appears).
    """
    t = x.shape[1]
    idx = jnp.asarray(
        np.concatenate([np.arange(t), np.arange(t - 2, -1, -1)]))
    return jnp.take(x, idx, axis=1)


def _group_channels(x: jnp.ndarray, group: int = 3) -> jnp.ndarray:
    """(B*T, H, W, C) with T = G*group -> (B*G, H, W, C*group).

    Stacks each consecutive triple of frames along channels, matching the
    reference reshape/transpose pattern (keras_models.py:884-918).
    """
    _, h, w, c = x.shape
    x = x.reshape(-1, group, h, w, c)
    x = jnp.transpose(x, (0, 2, 3, 4, 1))
    return x.reshape(-1, h, w, c * group)


def _mask_border(x: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """Zero everything outside the centre 3/4 region (warp-border mask).

    h, w are the LR dims; x is (N, 4h, 4w, C).  Reference
    keras_models.py:905-913 (slice + zero-pad).  Implemented as a
    multiply by a constant 0/1 mask -- numerically identical for finite
    inputs, but it keeps a large ``pad`` op out of the graph: XLA:TPU
    folds slice+pad into the downstream discriminator conv's window,
    and windows with pad >= ~10 crash the TPU fusion emitter
    ("Check failed: window.pad_low[i] == 0") at full-size crops.
    """
    work_h, work_w = h * 3, w * 3
    pad_h = h * 2 - work_h // 2
    pad_w = w * 2 - work_w // 2
    n4h, n4w = h * 4, w * 4
    row = (jnp.arange(n4h) >= pad_h) & (jnp.arange(n4h) < pad_h + work_h)
    col = (jnp.arange(n4w) >= pad_w) & (jnp.arange(n4w) < pad_w + work_w)
    mask = (row[:, None] & col[None, :]).astype(x.dtype)
    return x * mask[None, :, :, None]


@dataclasses.dataclass(frozen=True)
class GANTrainer:
    """Functional TecoGAN training graph.

    Param groups: gen_params = {"flow": ..., "generator": ...};
    discr_params = discriminator tree; vgg_params passed separately
    (never differentiated).
    """

    flow_apply: Callable[..., jnp.ndarray]
    generator_apply: Callable[..., jnp.ndarray]
    discriminator_apply: Callable[..., List[jnp.ndarray]]
    vgg_apply: Callable[..., List[jnp.ndarray]]
    num_flow_frames: int = 4
    normalize_brightness: bool = False
    loss_config: Tuple[Tuple[str, Any], ...] = ()
    remat: bool = True
    # Activations dtype for all four networks (see FRVSRTrainer): the
    # real AND fake branches of the discriminator/VGG run in the same
    # dtype (an f32-real/bf16-fake split would hand the discriminator
    # a precision tell).  Losses, EMAs, the supervision warp, params
    # and optimizer state stay float32.
    compute_dtype: Any = jnp.float32
    # s2d-table routing for the big batched training warps (see
    # FRVSRTrainer.s2d_train_warp): the GAN's supervision and two
    # discriminator warps run at B*18 frames, deep in the gather rate
    # law's slow regime in pixel space.  Measured on v5e at full arch
    # (batch 4, crop 32, K=10), with the MXU segment-sum warp backward
    # (ops.warp._segsum_gather): 265.5 -> 197.8 ms/step f32 (1.34x),
    # 213.7 -> 162.7 bf16 (1.31x), losses tracking -- default ON.
    s2d_train_warp: bool = True
    # Separate routing for the recurrent scan warp (None = follow
    # s2d_train_warp); see FRVSRTrainer.s2d_scan_warp.  For the GAN
    # both default to the s2d route.
    s2d_scan_warp: Optional[bool] = None

    def _warp(self, image: jnp.ndarray, flow: jnp.ndarray) -> jnp.ndarray:
        from joshupscale_tpu.training.frvsr import FRVSRTrainer

        return FRVSRTrainer._route_warp(self.s2d_train_warp, image, flow)

    def _scan_warp(self, image: jnp.ndarray,
                   flow: jnp.ndarray) -> jnp.ndarray:
        from joshupscale_tpu.training.frvsr import FRVSRTrainer

        use_s2d = (self.s2d_train_warp if self.s2d_scan_warp is None
                   else self.s2d_scan_warp)
        return FRVSRTrainer._route_warp(use_s2d, image, flow)

    def config(self) -> Dict[str, Any]:
        return losses.get_gan_loss_config(dict(self.loss_config))

    # -- forward -----------------------------------------------------------

    def forward(
        self,
        gen_params: Dict[str, Any],
        discr_params: Any,
        vgg_params: Any,
        inputs: jnp.ndarray,
        targets: jnp.ndarray,
        rng: jax.Array,
        training: bool = True,
    ) -> Dict[str, Any]:
        """Ping-pong forward producing everything the losses need.

        inputs: (B, 10, H, W, 3); targets: (B, 10, 4H, 4W, 3).
        Returns the loss inputs plus "bn_updates" (moving-stat updates
        from the batched flow, first generator, and discriminator calls;
        scan-internal generator BN uses batch stats with scan-local
        updates, see FRVSRTrainer.forward).
        """
        from joshupscale_tpu.models.common import Mutables
        from joshupscale_tpu.training.frvsr import preprocess_batch

        # u8 batches normalize on device (see FRVSRTrainer.forward).
        # Mixed precision: network inputs cast to compute_dtype; targets
        # stay float32 for the supervision warp + losses, and are cast
        # to compute_dtype only where they feed a network (VGG real
        # branch, discriminator real triples).
        inputs = preprocess_batch(inputs).astype(self.compute_dtype)
        targets = preprocess_batch(targets)

        b, t, h, w, _ = inputs.shape
        td = 2 * t - 1  # 19
        rng_hist, rng_first = jax.random.split(rng)
        mut = Mutables(training)

        inputs_d = pingpong(inputs)
        targets_d = pingpong(targets)

        if self.normalize_brightness:
            bright_d = pingpong(sequence_brightness(inputs))
            bright_diff = bright_d[:, 1:] - bright_d[:, :-1]
            inputs_flow_d = inputs_d - bright_d
        else:
            bright_d = None
            bright_diff = None
            inputs_flow_d = inputs_d

        # Flow over all 18 adjacent ping-pong pairs, one batched call.
        cur = _merge_bt(inputs_flow_d[:, 1:])
        prev = _merge_bt(inputs_flow_d[:, :-1])
        history = flow_history_frames(
            inputs_flow_d, self.num_flow_frames - 2, rng_hist
        )
        flow = self.flow_apply(gen_params["flow"], [cur, prev] + history,
                               mut=mut.scoped("gen.flow"))
        flow_t = _split_bt(flow, td - 1)

        # Supervision warp runs homogeneously in compute_dtype and the
        # result is cast back to f32 for the loss (both no-ops at f32):
        # an f32-image/bf16-flow warp inside the fused training graph
        # NaNs on XLA:TPU (see FRVSRTrainer.forward / CLAUDE.md).
        target_prev = _merge_bt(targets_d[:, :-1]).astype(
            self.compute_dtype
        )
        target_warp = _split_bt(
            self._warp(target_prev, flow).astype(jnp.float32),
            td - 1
        )
        if bright_diff is not None:
            target_warp = target_warp + bright_diff

        # Recurrent generation (19 frames), first frame random pre_warp.
        # Drawn in f32 and cast (see frvsr.flow_history_frames).
        first_warp = jax.random.uniform(
            rng_first, (b, h * 4, w * 4, 3), jnp.float32, -0.5, 0.5
        ).astype(inputs.dtype)
        first_out = self.generator_apply(
            gen_params["generator"], inputs_d[:, 0], first_warp,
            mut=mut.scoped("gen.generator"),
        )

        def step(last_output, xs):
            frame, cur_flow, bd, call_idx = xs
            if bd is not None:
                last_output = last_output + bd
            warped = self._scan_warp(last_output, cur_flow)
            # Moving-stat updates exported through ys; averaged
            # post-scan (merge_scan_bn_updates).  fade_offset: the
            # i-th of the 19 generator calls sees fade counter+i
            # (reference FadeInLayer increments per CALL).
            step_mut = Mutables(
                training, fade_offset=call_idx if training else 0)
            out = self.generator_apply(
                gen_params["generator"], frame, warped, mut=step_mut
            )
            return out, (out, warped, step_mut.updates)

        if self.remat:
            step = jax.checkpoint(step)
        xs = (
            jnp.swapaxes(inputs_d[:, 1:], 0, 1),
            jnp.swapaxes(flow_t, 0, 1),
            jnp.swapaxes(bright_diff, 0, 1)
            if bright_diff is not None
            else None,
            jnp.arange(1, td),
        )
        _, (outs, warps, scan_updates) = jax.lax.scan(step, first_out, xs)
        if training:
            from joshupscale_tpu.models.common import (
                merge_scan_bn_updates,
            )

            merge_scan_bn_updates(mut, "gen.generator.", scan_updates)
        gen_outputs = jnp.concatenate(
            [first_out[:, None], jnp.swapaxes(outs, 0, 1)], axis=1
        )
        gen_warp = jnp.swapaxes(warps, 0, 1)

        # VGG features: real on the 10 base frames (mirrored to 19),
        # fake on all 19 generated frames.
        vgg_real = self.vgg_apply(
            vgg_params, _merge_bt(targets).astype(self.compute_dtype)
        )
        vgg_real = [pingpong(_split_bt(f, t)) for f in vgg_real]
        vgg_fake = self.vgg_apply(vgg_params, _merge_bt(gen_outputs))
        vgg_fake = [_split_bt(f, td) for f in vgg_fake]

        # Temporal discriminator on 6 triples of the first 18 frames.
        # The real triples cast to compute_dtype so both discriminator
        # branches see the same numerics.
        t_gen = _merge_bt(gen_outputs[:, :18])
        t_targets = _merge_bt(targets_d[:, :18]).astype(
            self.compute_dtype
        )
        t_inputs = _merge_bt(inputs_d[:, :18])
        if bright_d is not None:
            t_bright = _merge_bt(bright_d[:, :18])
            t_gen = t_gen - t_bright
            t_targets = t_targets - t_bright
            t_inputs = t_inputs - t_bright

        inputs_hi = _group_channels(
            upscale_bilinear(t_inputs.astype(jnp.float32), 4).astype(
                t_inputs.dtype
            )
        )
        # Triple velocities: [flow into centre from prev, 0, from next].
        v_pre = flow_t[:, :18:3]
        v_nxt = flow_t[:, -2:-19:-3]
        t_vel = jnp.stack(
            [v_pre, jnp.zeros_like(v_pre), v_nxt], axis=2
        ).reshape(-1, h * 4, w * 4, 2)
        t_vel = jax.lax.stop_gradient(t_vel)

        debug_taps = {}

        def discr_input(frames, tag):
            raw = self._warp(frames, t_vel)
            warped = _mask_border(_group_channels(raw), h, w)
            before = _group_channels(frames)
            debug_taps[f"warp_raw_{tag}"] = raw
            debug_taps[f"warp_masked_{tag}"] = warped
            return jnp.concatenate([before, warped, inputs_hi], axis=-1)

        discr_in_real = discr_input(t_targets, "real")
        discr_in_fake = discr_input(t_gen, "fake")
        real_output = self.discriminator_apply(
            discr_params, discr_in_real,
            mut=mut.scoped("discr.real"),
        )
        fake_output = self.discriminator_apply(
            discr_params, discr_in_fake,
            mut=mut.scoped("discr.fake"),
        )

        return {
            "gen_outputs": gen_outputs,
            "gen_warp": gen_warp,
            "target_warp": target_warp,
            "real_output": list(real_output),
            "fake_output": list(fake_output),
            "vgg_real_output": vgg_real,
            "vgg_fake_output": vgg_fake,
            "targets_d": targets_d,
            # Debug taps (free unless consumed -- XLA dead-code
            # eliminates unfetched outputs): the flow field and the
            # assembled discriminator inputs.
            "flow_t": flow_t,
            "t_vel": t_vel,
            "discr_in_real": discr_in_real,
            "discr_in_fake": discr_in_fake,
            **debug_taps,
            "bn_updates": mut.updates,
        }

    # -- loss --------------------------------------------------------------

    def compute_losses(
        self,
        y: Dict[str, Any],
        ema: Dict[str, jnp.ndarray],
        gen_params: Optional[Dict[str, Any]] = None,
        discr_params: Any = None,
        l2_reg: float = 0.0,
    ) -> Dict[str, jnp.ndarray]:
        """All loss terms + gen/discr totals (reference :483-624)."""
        cfg = self.config()
        targets_d = y["targets_d"]
        gen_outputs = y["gen_outputs"]
        fake_output = y["fake_output"]
        real_output = y["real_output"]

        content_loss = losses.channel_sum_mse(gen_outputs, targets_d)
        warp_loss = losses.channel_sum_mse(
            y["target_warp"], targets_d[:, 1:]
        )
        pp_loss = losses.ping_pong_loss(gen_outputs)
        adv_loss = losses.adversarial_loss(fake_output[-1])
        d_fake = losses.discr_fake_loss(fake_output[-1])
        d_real = losses.discr_real_loss(real_output[-1])
        layer_loss = losses.feature_matching_loss(
            real_output[:-1], fake_output[:-1], cfg["discr_layer_norms"]
        )
        vgg_loss = losses.vgg_cosine_loss(
            y["vgg_real_output"], y["vgg_fake_output"]
        )

        # Generator adversarial gating from the *previous* step's EMAs.
        if cfg["t_balance2_threshold"] is not None:
            cond2 = jnp.sign(
                ema["t_balance2"] - cfg["t_balance2_threshold"]
            ) / 2.0 + 0.5
            if cfg["t_balance1_threshold"] is not None:
                cond2 = jnp.maximum(
                    cond2,
                    jnp.sign(
                        ema["t_balance1"] - cfg["t_balance1_threshold"]
                    ) / 2.0 + 0.5,
                )
        else:
            cond2 = jnp.asarray(1.0)

        gen_terms = []
        if cfg["content_loss"] > 0:
            gen_terms.append(cfg["content_loss"] * content_loss)
        if cfg["warp_loss"] > 0:
            gen_terms.append(cfg["warp_loss"] * warp_loss)
        if cfg["pp_loss"] > 0:
            gen_terms.append(cfg["pp_loss"] * pp_loss)
        if cfg["adv_loss"] > 0:
            gen_terms.append(cfg["adv_loss"] * cond2 * adv_loss)
        if cfg["discr_layer_loss"] > 0:
            gen_terms.append(cfg["discr_layer_loss"] * layer_loss)
        if cfg["vgg_loss"] > 0:
            gen_terms.append(cfg["vgg_loss"] * vgg_loss)
        gen_loss = sum(gen_terms)

        discr_terms = []
        if cfg["discr_fake_loss"] > 0:
            discr_terms.append(cfg["discr_fake_loss"] * d_fake)
        if cfg["discr_real_loss"] > 0:
            discr_terms.append(cfg["discr_real_loss"] * d_real)
        discr_loss = sum(discr_terms)

        if l2_reg and gen_params is not None:
            reg = losses.l2_regularization(gen_params, l2_reg)
            if discr_params is not None:
                reg = reg + losses.l2_regularization(discr_params, l2_reg)
            gen_loss = gen_loss + reg
            discr_loss = discr_loss + reg

        return {
            "gen_loss": gen_loss,
            "discr_loss": discr_loss,
            "content_loss": content_loss,
            "warp_loss": warp_loss,
            "pp_loss": pp_loss,
            "adv_loss": adv_loss,
            "discr_fake_loss": d_fake,
            "discr_real_loss": d_real,
            "discr_layer_loss": layer_loss,
            "vgg_loss": vgg_loss,
            "t_balance1": adv_loss - d_real,
            "t_balance2": adv_loss - d_fake,
        }

    def init_ema(self) -> Dict[str, jnp.ndarray]:
        return {
            "t_balance1": jnp.zeros(()),
            "t_balance2": jnp.zeros(()),
            "discr_steps": jnp.zeros((), jnp.int32),
        }

    @staticmethod
    def update_ema(
        ema: Dict[str, jnp.ndarray],
        t1: jnp.ndarray,
        t2: jnp.ndarray,
        decay: float = 0.99,
    ) -> Dict[str, jnp.ndarray]:
        """value += (1-decay)(x - value) (reference keras_metrics.py:45)."""
        return {
            **ema,
            "t_balance1": ema["t_balance1"]
            + (1 - decay) * (t1 - ema["t_balance1"]),
            "t_balance2": ema["t_balance2"]
            + (1 - decay) * (t2 - ema["t_balance2"]),
        }
