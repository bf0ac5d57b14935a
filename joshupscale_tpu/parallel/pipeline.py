"""Two-chip pipelined serving: flow stage | generator stage.

The quality tier's 60 fps scaling path recorded in BASELINE.md: one
chip's frame interval is bounded by the serial warp->generator chain
(~12 ms at 1080p on v5e) *plus* the flow net (~3 ms) -- but the flow
net depends only on INPUT frames (`InferenceModel.apply_flow_stage`:
the `last_frames` shift register never sees generator output), so
flow(t+1) can run on chip A while warp+generator(t) runs on chip B.

Topology-native design: the engine keeps the flow params + shift
register on the flow device and the generator params + `pre_gen`
feedback on the generator device (also halving per-chip weight/state
memory), and ships only the inter-stage payload -- the s2d flow head
(~8 MB bf16 at 1080p) and the preprocessed frame -- across ICI per
frame.  Pipelining emerges from async dispatch: each device owns an
independent execution queue, so as long as the caller stays >= 1 frame
ahead (``process_async`` / ``process_clip``), F(t+1) executes during
G(t).  Output latency per frame is still F+G+transfer (one pipeline
stage deeper than the single-chip engine); *throughput* is
max(F, G) + transfer.

Numerics are exactly the single-chip engine's: the stages are the same
`apply` split at the flow/generator seam (`models/inference.py`), so
stream and clip outputs are bit-identical (tests/test_pipeline.py).

Reference analog: none -- the reference serves one GPU per stream
(obs_plugin/src/filter.cc); this is the TPU mesh's way to buy latency
headroom for the quality model.
"""

from __future__ import annotations

import collections
import functools
import weakref
from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from joshupscale_tpu.models.inference import InferenceModel
from joshupscale_tpu.runtime.engine import _select_output


_PIPE_CACHE: "weakref.WeakKeyDictionary[InferenceModel, Any]" = (
    weakref.WeakKeyDictionary())


def _stage_fns(model: InferenceModel):
    """Jitted (flow_step, gen_step, display) triple per model."""
    if model not in _PIPE_CACHE:
        model_ref = weakref.ref(model)

        @functools.partial(jax.jit, donate_argnums=(2,))
        def _flow_step(flow_params, frame, flow_state):
            m = model_ref()
            inter, new_state = m.apply_flow_stage(
                {"flow": flow_params}, frame, flow_state)
            return inter, new_state

        @functools.partial(jax.jit, donate_argnums=(2,))
        def _gen_step(gen_params, inter, gen_state):
            m = model_ref()
            outputs, new_state = m.apply_gen_stage(
                {"generator": gen_params}, inter, gen_state)
            return _select_output(m, outputs), new_state

        @jax.jit
        def _display(x_s2d):
            from joshupscale_tpu.ops.display import d2s_display_u8

            return d2s_display_u8(x_s2d)

        _PIPE_CACHE[model] = (_flow_step, _gen_step, _display)
    return _PIPE_CACHE[model]


class PipelinedEngine:
    """One recurrent stream software-pipelined over two devices.

    Drop-in for `runtime.engine.Engine` (process / process_async /
    process_clip / reset).  ``devices[0]`` runs the flow stage,
    ``devices[1]`` the generator stage; with one physical device both
    stages share it (correct, no overlap).
    """

    def __init__(
        self,
        model: InferenceModel,
        params: Dict[str, Any],
        batch_size: int = 1,
        devices: Optional[Sequence[Any]] = None,
        max_inflight: int = 2,
    ) -> None:
        if model.remove_flow:
            raise ValueError(
                "remove_flow models have no flow stage to pipeline; "
                "use runtime.engine.Engine")
        if devices is None:
            devs = jax.devices()
            devices = (devs[0], devs[1 % len(devs)])
        if len(devices) != 2:
            raise ValueError(f"need exactly 2 devices, got {len(devices)}")
        self.model = model
        self.batch_size = batch_size
        self.flow_device, self.gen_device = devices
        self.flow_params = jax.device_put(params["flow"], self.flow_device)
        self.gen_params = jax.device_put(
            params["generator"], self.gen_device)
        self._max_inflight = max_inflight
        self._pending = collections.deque()

        self._flow_step, self._gen_step, self._display = _stage_fns(model)
        self._deferred = (
            getattr(model, "deferred_display", False)
            and getattr(model, "s2d_mode", False)
            and not model.skip_processing
        )
        self.reset()

    # -- geometry ----------------------------------------------------------

    @property
    def input_shape(self):
        return (self.batch_size, self.model.frame_height,
                self.model.frame_width, 3)

    @property
    def output_shape(self):
        return (self.batch_size, self.model.frame_height * 4,
                self.model.frame_width * 4, 3)

    # -- streaming ---------------------------------------------------------

    def reset(self) -> None:
        """Zero both stage states (new stream / seek)."""
        self._drain()
        full = self.model.init_state(self.batch_size)
        self.flow_state = jax.device_put(
            {"last_frames": full["last_frames"]}, self.flow_device)
        self.gen_state = jax.device_put(
            {"pre_gen": full["pre_gen"]}, self.gen_device)

    def process_async(self, frame: np.ndarray):
        """Dispatch one frame through both stages; returns the on-device
        output.  Non-blocking: while the generator device executes this
        frame, the next call's flow stage dispatches to the flow device
        immediately -- that asynchrony IS the pipeline overlap."""
        frame = self._as_input(frame)
        inter, self.flow_state = self._flow_step(
            self.flow_params, frame, self.flow_state)
        inter = jax.device_put(inter, self.gen_device)  # ICI hop
        out, self.gen_state = self._gen_step(
            self.gen_params, inter, self.gen_state)
        if self._deferred:
            out = self._display(out)
        self._pending.append(out)
        while len(self._pending) > self._max_inflight:
            self._pending.popleft().block_until_ready()
        return out

    def process(self, frame: np.ndarray) -> np.ndarray:
        """Blocking single-frame upscale: (H, W, 3) or (N, H, W, 3) u8."""
        squeeze = frame.ndim == 3
        result = np.asarray(self.process_async(frame))
        return result[0] if squeeze else result

    def process_clip(self, frames: np.ndarray) -> np.ndarray:
        """Offline mode: (T, N, H, W, 3) or (T, H, W, 3) over the pipe.

        Dispatches every frame asynchronously (flow scans ahead of the
        generator by the inflight window) and materializes outputs in
        order.
        """
        squeeze = frames.ndim == 4
        outs = [self.process_async(f if not squeeze else f[None])
                for f in frames]
        result = np.stack([np.asarray(o) for o in outs])
        self._pending.clear()
        return result[:, 0] if squeeze else result

    def _as_input(self, frame: np.ndarray):
        frame = np.asarray(frame)
        if frame.ndim == 3:
            frame = frame[None]
        if frame.shape != self.input_shape:
            raise ValueError(
                f"Invalid frame shape {frame.shape}; expected "
                f"{self.input_shape}"
            )
        return jax.device_put(frame, self.flow_device)

    def _drain(self) -> None:
        while getattr(self, "_pending", None):
            self._pending.popleft().block_until_ready()
