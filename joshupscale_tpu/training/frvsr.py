"""FRVSR pretraining: recurrent content+warp L2 over a 10-frame unroll.

Behavioral parity with reference ``scripts/training/keras_models.py``
FRVSRModel (:186-373) and FRVSRModelSingle (:95-183), redesigned TPU-first:

- The flow net runs ONCE, batched over all (T-1) adjacent frame pairs
  (reshape (B, T-1, ...) -> (B*(T-1), ...)), exactly like the reference --
  this keeps the conv workload large for the MXU.
- The per-frame generator recurrence is a ``lax.scan`` over time with the
  previous HR output as carry (the reference unrolls a Python loop into
  the graph; scan compiles the body once and keeps the step compact).
- The scan body is rematerialized (``jax.checkpoint``) so the 10/19-frame
  unroll's activations don't have to live in HBM for the backward pass.
- Extra flow-history inputs beyond (cur, prev) are uniform random frames
  spliced before the clip (reference :311-334).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from joshupscale_tpu.ops import dense_image_warp
from joshupscale_tpu.ops.image import BGR_LUMA
from joshupscale_tpu.training import losses


def preprocess_batch(x: jnp.ndarray) -> jnp.ndarray:
    """uint8 training batches -> [-0.5, 0.5] floats, on device.

    Lets the data pipeline ship u8 (4x smaller host->device transfer;
    the tfrecords-TPU input layout) while float batches pass through
    unchanged (the reference's NormalizeOp-on-host layout).

    TPU GUARD: converting u8 INSIDE a jitted train-step graph hangs the
    XLA:TPU worker and wedges the shared tunnel (CLAUDE.md round-3
    gotcha), so on non-CPU backends this raises at trace time instead
    of silently building the hazardous graph -- normalize first with
    ``training.trainer.device_normalize`` (fit() and the tools already
    do).  On CPU the in-graph convert is safe and stays available so
    the u8==f32 equivalence tests can pin the semantics device_normalize
    must match.  EAGER u8 input (a concrete array, e.g. the play
    callback normalizing its fixed batch once at startup) is safe on
    every backend -- the convert runs as its own tiny program, exactly
    like device_normalize -- so the guard only fires on tracers.
    """
    if x.dtype == jnp.uint8:
        if (isinstance(x, jax.core.Tracer)
                and jax.default_backend() != "cpu"):
            raise TypeError(
                "uint8 batch reached a jitted train-step graph on a "
                f"'{jax.default_backend()}' backend; in-graph u8 "
                "conversion hangs the XLA:TPU worker. Normalize on "
                "device first via "
                "joshupscale_tpu.training.trainer.device_normalize "
                "(fit() does this automatically)."
            )
        return x.astype(jnp.float32) / 255.0 - 0.5
    return x


def _merge_bt(x: jnp.ndarray) -> jnp.ndarray:
    """(B, T, ...) -> (B*T, ...)."""
    return x.reshape((-1,) + x.shape[2:])


def _split_bt(x: jnp.ndarray, t: int) -> jnp.ndarray:
    """(B*T, ...) -> (B, T, ...)."""
    return x.reshape((-1, t) + x.shape[1:])


def sequence_brightness(inputs: jnp.ndarray) -> jnp.ndarray:
    """(B, T, H, W, 3) -> (B, T, 1, 1, 1) mean BGR luma per frame."""
    luma = jnp.asarray(BGR_LUMA, dtype=inputs.dtype) * 3.0
    return jnp.mean(inputs * luma, axis=(2, 3, 4))[:, :, None, None, None]


def flow_history_frames(
    inputs_flow: jnp.ndarray,
    num_rand_frames: int,
    rng: jax.Array,
) -> List[jnp.ndarray]:
    """Extra flow-net history inputs for every adjacent pair.

    For pair t (cur=frame t+1, prev=frame t), history input i is frame
    ``t-1-i`` when it exists, else a uniform random frame in [-0.5, 0.5]
    (reference keras_models.py:311-334): history i over all pairs =
    concat(rand[:, -(i+1):], inputs[:, :-(i+2)]) along time.
    """
    if num_rand_frames <= 0:
        return []
    b, t = inputs_flow.shape[:2]
    frame_shape = (b, num_rand_frames) + inputs_flow.shape[2:]
    # Draw in float32 and cast: random DATA must not change with the
    # compute dtype (uniform sampled directly in bf16 yields different
    # values, which would make mixed-precision runs incomparable to
    # f32 runs under the same seed).
    rand = jax.random.uniform(
        rng, frame_shape, jnp.float32, -0.5, 0.5
    ).astype(inputs_flow.dtype)
    return [
        _merge_bt(
            jnp.concatenate(
                [rand[:, -(i + 1):], inputs_flow[:, : t - (i + 2)]], axis=1
            )
        )
        for i in range(num_rand_frames)
    ]


@dataclasses.dataclass(frozen=True)
class FRVSRTrainer:
    """Functional FRVSR training graph.

    Attributes
    ----------
    flow_apply : callable(flow_params, [frames...]) -> (N, 4H, 4W, 2)
    generator_apply : callable(gen_params, frame, pre_warp) -> (N,4H,4W,3)
    num_flow_frames : flow-net input count (current + history).
    normalize_brightness : subtract per-frame mean luma before flow and
        re-add the per-step brightness delta to warped frames.
    remat : rematerialize the generator scan body (memory vs FLOPs).
    compute_dtype : activations dtype for the network forward/backward
        (the reference trains mixed_float16 on GPU,
        scripts/training/train_local.py:72-77; the TPU analog is
        bfloat16, which keeps fp32's exponent range so no loss scaling
        is needed).  Params, optimizer state, BN statistics, the
        supervision warp (target_warp) and every loss term stay
        float32; warp index math is float32 regardless (ops/warp.py).
    """

    flow_apply: Callable[..., jnp.ndarray]
    generator_apply: Callable[..., jnp.ndarray]
    num_flow_frames: int = 4
    normalize_brightness: bool = False
    remat: bool = True
    compute_dtype: Any = jnp.float32
    # Route the big batched training warps through the s2d
    # corner-subposition gather table (ops.warp.dense_image_warp_via_
    # s2d): numerically identical + fully differentiable, with a 16x
    # smaller gather table (dodges the TPU gather rate law's >500K-row
    # slow regime) but 6.25x wider gather rows (75 vs 12 lanes).
    # Measured on v5e at full arch (batch 4, crop 32, K=10), with the
    # MXU segment-sum backward (ops.warp._segsum_gather): FRVSR
    # 64.2 -> 73.8 ms/step at f32 (the wider rows' bandwidth outweighs
    # the row-count win on FRVSR's single supervision warp) and only
    # 63.9 -> 62.5 at bf16 -- so the PIXEL warp stays the FRVSR
    # default.  The GAN trainer (3 big warps/step) wins big in both
    # dtypes and defaults to s2d.
    s2d_train_warp: bool = False
    # The RECURRENT scan warp routes separately (None = follow
    # s2d_train_warp): unlike the supervision warp it needs gradients
    # w.r.t. the warped IMAGE (the generator's previous output), whose
    # pixel-space autodiff backward is a TPU scatter-add -- in s2d
    # form that backward is the MXU segment sum (ops.warp.
    # _segsum_gather).  Measured on v5e at full arch (batch 4,
    # crop 32, K=10): scan-s2d + pixel supervision = 64.8 ms/step f32
    # (vs 65.2 all-pixel, noise-level) and 62.2 bf16 (vs 64.5, the
    # per-frame scatter + narrow 12-lane gather both go away) --
    # default ON for FRVSR; the big supervision warp stays pixel.
    s2d_scan_warp: Optional[bool] = True

    def _warp(self, image: jnp.ndarray, flow: jnp.ndarray) -> jnp.ndarray:
        return self._route_warp(self.s2d_train_warp, image, flow)

    def _scan_warp(self, image: jnp.ndarray,
                   flow: jnp.ndarray) -> jnp.ndarray:
        use_s2d = (self.s2d_train_warp if self.s2d_scan_warp is None
                   else self.s2d_scan_warp)
        return self._route_warp(use_s2d, image, flow)

    @staticmethod
    def _route_warp(use_s2d: bool, image: jnp.ndarray,
                    flow: jnp.ndarray) -> jnp.ndarray:
        if use_s2d:
            from joshupscale_tpu.ops.warp import dense_image_warp_via_s2d

            return dense_image_warp_via_s2d(image, flow)
        return dense_image_warp(image, flow)

    # -- forward -----------------------------------------------------------

    def forward(
        self,
        params: Dict[str, Any],
        inputs: jnp.ndarray,
        targets: jnp.ndarray,
        rng: jax.Array,
        training: bool = True,
    ) -> Dict[str, jnp.ndarray]:
        """Unrolled recurrent forward.

        inputs: (B, T, H, W, 3) floats in [-0.5, 0.5];
        targets: (B, T, 4H, 4W, 3).  Returns gen_outputs (B, T, ...),
        target_warp (B, T-1, ...), and "bn_updates" -- batch-norm
        moving-stat updates collected from the batched flow call and the
        generator scan steps (exported through the scan ys and averaged
        over the scan axis; see merge_scan_bn_updates for why the first
        call's noise-warp statistics alone miscalibrate inference-mode
        BN).
        """
        from joshupscale_tpu.models.common import Mutables

        # uint8 batches: normalize ON DEVICE.  Shipping u8 instead of
        # f32 quarters the host->HBM transfer per step -- on the
        # tunneled dev chip the f32 batch upload (~8 MB/step at crop
        # 32 batch 4) dominates wall time; on production TPU pods this
        # is the tfrecords-input-pipeline layout (u8 PNG bytes decoded
        # on host, normalized on device).
        #
        # Mixed precision: the network inputs are cast to compute_dtype
        # here and every layer follows its input dtype; targets stay
        # float32 so the supervision warp and the losses are computed
        # at full precision.
        inputs = preprocess_batch(inputs).astype(self.compute_dtype)
        targets = preprocess_batch(targets)

        b, t, h, w, _ = inputs.shape
        rng_hist, rng_first = jax.random.split(rng)
        mut = Mutables(training)

        if self.normalize_brightness:
            bright = sequence_brightness(inputs)
            bright_diff = bright[:, 1:] - bright[:, :-1]
            inputs_flow = inputs - bright
        else:
            bright_diff = None
            inputs_flow = inputs

        # Flow for all adjacent pairs in one batched call.
        cur = _merge_bt(inputs_flow[:, 1:])
        prev = _merge_bt(inputs_flow[:, :-1])
        history = flow_history_frames(
            inputs_flow, self.num_flow_frames - 2, rng_hist
        )
        flow = self.flow_apply(params["flow"], [cur, prev] + history,
                               mut=mut.scoped("flow"))
        flow_t = _split_bt(flow, t - 1)

        # Supervision warp: previous HR target warped by the flow.
        # Runs HOMOGENEOUSLY in compute_dtype (result cast back to f32
        # for the loss; both casts are no-ops at f32): warping an f32
        # image by a bf16 flow inside the large fused training graph
        # NaNs the warp output on XLA:TPU (round-4 miscompile, same
        # family as the round-2 promise-mode gather bug -- the minimal
        # mixed-dtype warp is fine, only the fused-graph context
        # breaks; see CLAUDE.md).  Pixel data is u8-quantized so the
        # bf16 image cast costs < 1/2 u8 step of supervision precision.
        cdt = self.compute_dtype
        target_prev = _merge_bt(targets[:, :-1]).astype(cdt)
        target_warp = _split_bt(
            self._warp(target_prev, flow).astype(jnp.float32),
            t - 1)
        if bright_diff is not None:
            target_warp = target_warp + bright_diff

        # First frame: random pre_warp (no history yet).  Drawn in f32
        # and cast (see flow_history_frames).
        first_warp = jax.random.uniform(
            rng_first, (b, h * 4, w * 4, 3), jnp.float32, -0.5, 0.5
        ).astype(inputs.dtype)
        first_out = self.generator_apply(
            params["generator"], inputs[:, 0], first_warp,
            mut=mut.scoped("generator"),
        )

        def step(last_output, xs):
            frame, cur_flow, bd, call_idx = xs
            if bd is not None:
                last_output = last_output + bd
            warped = self._scan_warp(last_output, cur_flow)
            # Batch-stat BN inside the scan; moving-stat updates are
            # exported through ys and averaged post-scan (see
            # merge_scan_bn_updates -- the first call's noise-warp
            # statistics must not be the only calibration source).
            # fade_offset: the i-th generator call of the step sees
            # fade counter+i (reference FadeInLayer increments per
            # CALL, T times per step, not once).
            step_mut = Mutables(
                training, fade_offset=call_idx if training else 0)
            out = self.generator_apply(
                params["generator"], frame, warped, mut=step_mut
            )
            return out, (out, warped, step_mut.updates)

        if self.remat:
            step = jax.checkpoint(step)

        xs = (
            jnp.swapaxes(inputs[:, 1:], 0, 1),
            jnp.swapaxes(flow_t, 0, 1),
            jnp.swapaxes(bright_diff, 0, 1)
            if bright_diff is not None
            else None,
            jnp.arange(1, t),
        )
        _, (outs, warps, scan_updates) = jax.lax.scan(step, first_out, xs)
        if training:
            from joshupscale_tpu.models.common import merge_scan_bn_updates

            merge_scan_bn_updates(mut, "generator.", scan_updates)
        gen_outputs = jnp.concatenate(
            [first_out[:, None], jnp.swapaxes(outs, 0, 1)], axis=1
        )
        return {
            "gen_outputs": gen_outputs,
            "target_warp": target_warp,
            "gen_warp": jnp.swapaxes(warps, 0, 1),
            "flow": flow_t,
            "bn_updates": mut.updates,
        }

    # -- loss --------------------------------------------------------------

    def loss(
        self,
        params: Dict[str, Any],
        batch: Dict[str, jnp.ndarray],
        rng: jax.Array,
        l2_reg: float = 0.0,
        training: bool = True,
    ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        """Content L2 + warp L2 (reference FRVSRModel.compute_loss).

        ``training=False`` evaluates with inference-mode batch norm
        (moving statistics) -- use for validation, matching the
        reference's Keras test_step(training=False).
        """
        inputs = preprocess_batch(batch["input"])
        targets = preprocess_batch(batch["target"])
        y = self.forward(params, inputs, targets, rng, training=training)
        gen_outputs_loss = losses.channel_sum_mse(y["gen_outputs"], targets)
        target_warp_loss = losses.channel_sum_mse(
            y["target_warp"], targets[:, 1:]
        )
        loss = gen_outputs_loss + target_warp_loss
        if l2_reg:
            loss = loss + losses.l2_regularization(params, l2_reg)
        aux = {
            "metrics": {
                "loss": loss,
                "gen_outputs_loss": gen_outputs_loss,
                "target_warp_loss": target_warp_loss,
            },
            "bn_updates": y["bn_updates"],
        }
        return loss, aux


@dataclasses.dataclass(frozen=True)
class FRVSRSingleTrainer:
    """One-step FRVSR training (reference FRVSRModelSingle :95-183).

    Batch: {"input": (B, num_flow_frames, H, W, 3) window (oldest..newest
    is input[..., :-1]; input[:, -1] is the current frame),
    "target": (B, 4H, 4W, 3), "last": (B, 4H, 4W, 3) previous HR frame}.
    """

    model: Any  # InferenceModel (skip_processing=True)

    def loss(
        self,
        params: Dict[str, Any],
        batch: Dict[str, jnp.ndarray],
        rng: Optional[jax.Array] = None,
        l2_reg: float = 0.0,
        training: bool = True,
    ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        del rng
        from joshupscale_tpu.models.common import Mutables

        window = preprocess_batch(batch["input"])
        num_frames = window.shape[1]
        state = {
            "pre_gen": preprocess_batch(batch["last"]),
            "last_frames": [window[:, i] for i in range(num_frames - 1)],
        }
        batch = dict(batch, target=preprocess_batch(batch["target"]))
        mut = Mutables(training)
        outputs, _ = self.model.apply(params, window[:, -1], state, mut=mut)
        gen_outputs_loss = losses.channel_sum_mse(
            outputs["output_raw"], batch["target"]
        )
        target_warp_loss = losses.channel_sum_mse(
            outputs["pre_warp"], batch["target"]
        )
        loss = gen_outputs_loss + target_warp_loss
        if l2_reg:
            loss = loss + losses.l2_regularization(params, l2_reg)
        return loss, {
            "metrics": {
                "loss": loss,
                "gen_outputs_loss": gen_outputs_loss,
                "target_warp_loss": target_warp_loss,
            },
            "bn_updates": mut.updates,
        }
