"""Recurrent single-frame inference model.

Capability parity with reference ``scripts/training/models.py``
get_inference_model (:680-829).  Per frame:

    1. pre  = cur/255 - 0.5                       (unless skip_processing)
    2. optional brightness normalization, optional zero-pad to a
       flow_pad_factor multiple
    3. flow = FNet(pre_pad, last_frames...)       -> (N, 4H, 4W, 2)
    4. unpad flow; pre_warp = dense_warp(pre_gen, flow)
    5. out_raw = Generator(pre, pre_warp)
    6. output = u8((out_raw + 0.5) * 255)
    state' : pre_gen' = out_raw (denormalized),
             last_frames' = [pre_pad] + last_frames[:-1]   (shift register)

TPU-first: the whole step is one jittable pure function of
``(params, frame, state)`` -> ``(outputs, state')``.  The runtime jits it
with the state donated, so XLA aliases state buffers in place of the
reference's ping-pong TensorRT contexts (reference
``core/src/tensorrt_backend.cc:247-278``).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Tuple

import jax.numpy as jnp

from joshupscale_tpu.models.common import Mutables
from joshupscale_tpu.ops import (
    dense_image_warp,
    depth_to_space,
    postprocess,
    preprocess,
    space_to_depth,
)
from joshupscale_tpu.ops.image import brightness as brightness_op
from joshupscale_tpu.ops.warp import dense_image_warp_s2d

State = Dict[str, Any]


@dataclasses.dataclass(frozen=True, eq=False)
class InferenceModel:
    """Functional recurrent VSR step.

    ``eq=False``: identity hash/equality.  The engine's step cache
    (runtime/engine.py _STEP_CACHE) is keyed by the model instance and
    its jitted closures weakref exactly that instance -- by-value
    equality would let two equal-but-distinct models (e.g. two
    ``dataclasses.replace`` copies) share one cache entry whose
    weakref dies with the FIRST model, crashing later retraces.

    Attributes
    ----------
    flow_apply : callable(params, frames, mut) -> flow
    generator_apply : callable(params, frame, pre_warp, mut) -> out_raw
    num_flow_frames : total frames the flow net sees (current + previous).
    frame_height / frame_width : LR frame dims.
    flow_pad_factor : pad LR dims to a multiple before the flow net
        (autoencoder flow nets need pooling-friendly sizes).
    normalize_brightness : subtract mean luma before flow, re-add after.
    skip_processing : inputs/outputs stay float (training mode).
    compute_dtype : activations dtype for the networks (e.g. bfloat16).
    """

    flow_apply: Callable[..., jnp.ndarray]
    generator_apply: Callable[..., jnp.ndarray]
    num_flow_frames: int = 4
    frame_height: int = 270
    frame_width: int = 480
    flow_pad_factor: Optional[int] = None
    normalize_brightness: bool = False
    skip_processing: bool = False
    compute_dtype: Any = jnp.float32
    # Deployment variants (the reference bakes these in with ONNX graph
    # surgery; here they are model options):
    # - frame_moving_avg: temporal stabilization w/ scene detection
    #   (reference onnx/frame_moving_avg.py)
    # - output_flow: emit the warped frame instead of the generated one
    #   (debug; reference onnx/output_flow.py:64-70)
    # - remove_flow: non-temporal single-frame model, FNet stripped
    #   (reference onnx/remove_flow.py:64-77)
    frame_moving_avg: Any = None
    output_flow: bool = False
    remove_flow: bool = False
    # Serving fast path: keep the recurrence in space-to-depth form
    # (state pre_gen is (N, H, W, 48); one depth_to_space per frame for
    # the display output).  Ignored under training-mode Mutables.
    s2d_mode: bool = False
    # Deferred display (s2d path only): emit the display frame as the
    # raw s2d tensor ("output_s2d") and leave the depth_to_space + u8
    # conversion to a SECOND compiled program (ops/display.d2s_display_u8,
    # run by the Engine).  In-graph, the d2s+u8 tail costs ~1.3 ms/frame
    # of u8 layout shuffles at 1080p on v5e and the fast Pallas kernel
    # cannot be inlined without re-laying-out the conv chain (see
    # ops/display.py); at a program boundary the layouts are fixed and
    # the kernel runs at full speed (~0.1 ms).
    deferred_display: bool = False
    # u8 recurrent state (s2d mode only): the fed-back previous frame
    # is stored quantized to uint8 -- the TPU analog of the reference's
    # int8 TensorRT engines quantizing the recurrence (reference
    # quantize_int8.py keeps state tensors quantized in-engine).  The
    # warp gather then moves half the bytes (measured: the gather-
    # buffer relayout halves).  Numerics: <= 1/255 quantization of the
    # feedback per frame vs the float path (the display output is u8
    # anyway); opt-in, OFF by default -- the parity-exact tier keeps
    # float state.
    u8_state: bool = False

    # -- geometry ----------------------------------------------------------

    @property
    def padded_height(self) -> int:
        if self.flow_pad_factor is None:
            return self.frame_height
        f = self.flow_pad_factor
        return ((self.frame_height + f - 1) // f) * f

    @property
    def padded_width(self) -> int:
        if self.flow_pad_factor is None:
            return self.frame_width
        f = self.flow_pad_factor
        return ((self.frame_width + f - 1) // f) * f

    @property
    def num_last_frames(self) -> int:
        return self.num_flow_frames - 1

    def out_height(self) -> int:
        return self.frame_height * 4

    def out_width(self) -> int:
        return self.frame_width * 4

    # -- state -------------------------------------------------------------

    def init_state(self, batch_size: int = 1, dtype=jnp.float32) -> State:
        """Zero recurrent state (matches the reference's zero-filled
        state buffers, reference onnx/inference.py:67-70)."""
        if self.remove_flow:
            return {}
        h, w = self.frame_height, self.frame_width
        ph, pw = self.padded_height, self.padded_width
        if self.s2d_mode and self.u8_state:
            # u8 127 ~= float 0.0 after dequantization (-0.002); the
            # reference warm-up discards the first frames anyway.
            pre_gen = jnp.full((batch_size, h, w, 48), 127, jnp.uint8)
        elif self.s2d_mode:
            pre_gen = jnp.zeros((batch_size, h, w, 48), dtype)
        else:
            pre_gen = jnp.zeros((batch_size, h * 4, w * 4, 3), dtype)
        return {
            "pre_gen": pre_gen,
            "last_frames": [
                jnp.zeros((batch_size, ph, pw, 3), dtype)
                for _ in range(self.num_last_frames)
            ],
        }

    # -- forward -----------------------------------------------------------

    def _pad(self, x: jnp.ndarray) -> jnp.ndarray:
        ph, pw = self.padded_height, self.padded_width
        h, w = self.frame_height, self.frame_width
        if ph == h and pw == w:
            return x
        dh, dw = ph - h, pw - w
        return jnp.pad(
            x,
            ((0, 0), (dh // 2, dh - dh // 2), (dw // 2, dw - dw // 2),
             (0, 0)),
        )

    def _unpad_flow(self, flow: jnp.ndarray) -> jnp.ndarray:
        ph, pw = self.padded_height, self.padded_width
        h, w = self.frame_height, self.frame_width
        if ph == h and pw == w:
            return flow
        oy = ((ph - h) // 2) * 4
        ox = ((pw - w) // 2) * 4
        return flow[:, oy:oy + h * 4, ox:ox + w * 4, :]

    def apply(
        self,
        params: Dict[str, Any],
        cur_frame: jnp.ndarray,
        state: State,
        mut: Optional[Mutables] = None,
    ) -> Tuple[Dict[str, Any], State]:
        """One recurrent step.

        Parameters
        ----------
        params : {"flow": ..., "generator": ...}
        cur_frame : (N, H, W, 3) uint8 (or float if skip_processing)
        state : {"pre_gen": (N,4H,4W,3) float, "last_frames": [...]}

        Returns
        -------
        (outputs, new_state); outputs holds "output" (uint8, unless
        skip_processing), "output_denorm", "output_raw", "pre_warp".
        """
        mut = mut or Mutables(False)

        if self.remove_flow:
            cdt = self.compute_dtype
            if self.skip_processing:
                pre = cur_frame
            else:
                pre = preprocess(cur_frame)
            pre = pre.astype(cdt)
            # Non-temporal variant: generator on the frame alone.
            output_raw = self.generator_apply(
                params["generator"], pre, None,
                mut=mut.scoped("generator"),
            )
            outputs = {
                "output_denorm": output_raw.astype(jnp.float32),
                "output_raw": output_raw.astype(jnp.float32),
            }
            if not self.skip_processing:
                outputs["output"] = postprocess(output_raw)
            return outputs, state

        inter, flow_state = self.apply_flow_stage(
            params, cur_frame, {"last_frames": state["last_frames"]}, mut
        )
        outputs, gen_state = self.apply_gen_stage(
            params, inter, {"pre_gen": state["pre_gen"]}, mut
        )
        return outputs, {**gen_state, **flow_state}

    def apply_flow_stage(
        self,
        params: Dict[str, Any],
        cur_frame: jnp.ndarray,
        state: State,
        mut: Optional[Mutables] = None,
    ) -> Tuple[Dict[str, Any], State]:
        """Stage F of the recurrence: preprocess + flow net.

        Depends ONLY on input frames (the ``last_frames`` shift
        register), never on generator output -- this is the pipeline
        seam `parallel.PipelinedEngine` exploits: F(t+1) overlaps with
        stage G(t) on another chip.  Returns the inter-stage payload
        ``{"pre", "flow"[, "bright"]}`` and the new flow-side state
        ``{"last_frames"}``.
        """
        mut = mut or Mutables(False)
        cdt = self.compute_dtype

        if self.skip_processing:
            pre = cur_frame
        else:
            pre = preprocess(cur_frame)
        pre = pre.astype(cdt)

        cur_pad = pre
        bright = None
        if self.normalize_brightness:
            bright = brightness_op(pre)
            cur_pad = cur_pad - bright
        cur_pad = self._pad(cur_pad)

        # s2d serving fast path: the whole recurrence stays in
        # space-to-depth form -- flow comes out of the FNet head un-d2s'd,
        # the warp gathers from a block-widened s2d table, the generator
        # tail emits s2d phase channels, and only the display output does
        # ONE depth_to_space per frame.  Saves ~13 ms/frame of layout
        # shuffles + ~7 ms of gather at 1080p on v5e vs the pixel path.
        s2d = self.s2d_mode and not mut.training

        last_frames = [f.astype(cdt) for f in state["last_frames"]]
        flow = self.flow_apply(params["flow"], [cur_pad] + last_frames,
                               mut=mut.scoped("flow"), s2d_output=s2d)
        flow = self._unpad_flow_s2d(flow) if s2d else (
            self._unpad_flow(flow))

        inter = {"pre": pre, "flow": flow}
        if bright is not None:
            inter["bright"] = bright
        new_state = {
            "last_frames": [cur_pad.astype(state["last_frames"][0].dtype)]
            + state["last_frames"][:-1],
        }
        return inter, new_state

    def apply_gen_stage(
        self,
        params: Dict[str, Any],
        inter: Dict[str, Any],
        state: State,
        mut: Optional[Mutables] = None,
    ) -> Tuple[Dict[str, Any], State]:
        """Stage G of the recurrence: warp + generator + display.

        Consumes stage F's payload and the ``pre_gen`` feedback state;
        this is the serial warp->generator chain that bounds the
        pipelined frame interval.
        """
        mut = mut or Mutables(False)
        cdt = self.compute_dtype
        pre = inter["pre"]
        flow = inter["flow"]
        bright = inter.get("bright")
        s2d = self.s2d_mode and not mut.training

        u8_state = self.u8_state and s2d
        if u8_state:
            # Quantized recurrence tier: the warp gathers the u8 table
            # directly and dequantizes in the bilinear blend.
            pre_warp = dense_image_warp_s2d(
                state["pre_gen"], flow).astype(cdt)
        elif s2d:
            pre_gen = state["pre_gen"].astype(cdt)
            pre_warp = dense_image_warp_s2d(pre_gen, flow)
        else:
            pre_gen = state["pre_gen"].astype(cdt)
            pre_warp = dense_image_warp(pre_gen, flow)
        if self.normalize_brightness:
            pre_warp = pre_warp + bright

        output_raw = self.generator_apply(
            params["generator"], pre, pre_warp,
            mut=mut.scoped("generator"), s2d_output=s2d,
        )
        if self.frame_moving_avg is not None:
            # Temporal stabilization baked into the recurrence at the
            # same point as the reference's graph surgery (the generator
            # clip output feeds both display and state).
            from joshupscale_tpu.ops.temporal import frame_moving_avg

            if s2d:
                output_raw = self._moving_avg_s2d(output_raw, pre_warp)
            else:
                output_raw = frame_moving_avg(
                    output_raw, pre_warp, self.frame_moving_avg
                )
        if self.output_flow:
            # Debug variant: the reference surgery rewires the clip node
            # onto the warped frame (onnx/output_flow.py:64-77), so the
            # clipped warp feeds BOTH the display output and the
            # recurrent state and the generator body goes dead (XLA
            # DCEs it here exactly like the reference's simplify pass).
            output_raw = jnp.clip(pre_warp, -0.5, 0.5)
        output_denorm = output_raw
        if self.normalize_brightness:
            output_raw = output_raw - bright

        if s2d:
            # HR views (dead-code-eliminated when unused, e.g. in the
            # serving engine which only consumes "output").
            display = depth_to_space(output_denorm, 4)
            outputs = {
                "output_denorm": display.astype(jnp.float32),
                "output_raw": depth_to_space(
                    output_raw, 4).astype(jnp.float32),
                "pre_warp": depth_to_space(
                    pre_warp, 4).astype(jnp.float32),
                "flow": depth_to_space(flow, 4).astype(jnp.float32),
            }
            if not self.skip_processing:
                outputs["output"] = postprocess(display)
                if self.deferred_display:
                    # The serving engine consumes this instead of
                    # "output" and runs d2s+u8 as a SECOND program
                    # (ops/display.d2s_display_u8); whichever key a
                    # program does not consume is dead-code-eliminated,
                    # so direct apply() users are unaffected.
                    outputs["output_s2d"] = output_denorm
        else:
            outputs = {
                "output_denorm": output_denorm.astype(jnp.float32),
                "output_raw": output_raw.astype(jnp.float32),
                "pre_warp": pre_warp.astype(jnp.float32),
                "flow": flow.astype(jnp.float32),
            }
            if not self.skip_processing:
                outputs["output"] = postprocess(output_denorm)

        new_state = {
            # u8 tier: clip before quantizing (brightness denorm can
            # push output_raw slightly outside [-0.5, 0.5]).
            "pre_gen": (postprocess(jnp.clip(output_raw, -0.5, 0.5))
                        if u8_state
                        else output_raw.astype(state["pre_gen"].dtype)),
        }
        return outputs, new_state

    def _unpad_flow_s2d(self, flow: jnp.ndarray) -> jnp.ndarray:
        ph, pw = self.padded_height, self.padded_width
        h, w = self.frame_height, self.frame_width
        if ph == h and pw == w:
            return flow
        oy = (ph - h) // 2
        ox = (pw - w) // 2
        return flow[:, oy:oy + h, ox:ox + w, :]

    def _moving_avg_s2d(self, gen: jnp.ndarray,
                        pre_warp: jnp.ndarray) -> jnp.ndarray:
        """frame_moving_avg on s2d tensors.

        window == 0 is layout-independent (global mean + elementwise):
        run it on a (N, Hb, Wb*16, 3) reshape view.  Windowed mode needs
        the HR pixel grid: round-trip through depth_to_space.
        """
        from joshupscale_tpu.ops.temporal import frame_moving_avg

        cfg = self.frame_moving_avg
        if cfg.window == 0:
            n, hb, wb, cs = gen.shape
            view = (n, hb, wb * (cs // 3), 3)
            out = frame_moving_avg(
                gen.reshape(view), pre_warp.reshape(view), cfg
            )
            return out.reshape(gen.shape)
        gen_hr = depth_to_space(gen, 4)
        warp_hr = depth_to_space(pre_warp, 4)
        return space_to_depth(frame_moving_avg(gen_hr, warp_hr, cfg), 4)
