"""Compiled inference engine with donated on-device recurrent state.

TPU-native analog of the reference C++ runtime
(``core/src/tensorrt_backend.cc``): where the reference deserializes a
TensorRT engine, double-buffers two execution contexts and ping-pongs
state bindings between CUDA-graph launches (:222-278), we jit ONE XLA
program whose recurrent state arguments are *donated* -- XLA aliases the
state outputs onto the state inputs, so the recurrence never copies and
never leaves HBM.  CUDA-graph capture is replaced by XLA's AOT compile;
the uint8<->float conversion kernels (``cuda_convert.cc.cu``) are fused
into the program head/tail by XLA.

The engine also provides:

- ``process`` / ``process_async``: one-frame-in/one-frame-out with an
  in-flight async dispatch queue, so host->HBM transfer of frame t+1
  overlaps compute of frame t (the reference instead blocks on
  ``streamSynchronize`` per frame, tensorrt_backend.cc:276).
- ``process_clip``: offline whole-clip mode, ``lax.scan`` over frames with
  the state as carry.
- ``reset``: zero-fills the recurrent state (stream restart).
"""

from __future__ import annotations

import collections
import dataclasses
import functools
import time
import weakref
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from joshupscale_tpu.models.inference import InferenceModel


def enable_compilation_cache(cache_dir: str = "~/.cache/joshupscale_tpu"
                             ) -> None:
    """Persist compiled XLA executables across processes.

    The deployable-artifact analog of the reference's prebuilt .trt
    engines (+ its TensorRT timing cache): first engine construction
    compiles (~20-40 s on TPU), subsequent processes load the cached
    executable in well under a second.
    """
    import os

    path = os.path.expanduser(cache_dir)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


# Weak-keyed: the cached step closes over the model, so keying by
# id(model) could silently serve a dead model's step to a new model
# allocated at the same address (and would leak entries).  The weak key
# drops the entry with the model.
_STEP_CACHE: "weakref.WeakKeyDictionary[InferenceModel, Any]" = (
    weakref.WeakKeyDictionary())


def _select_output(model, outputs):
    """The tensor the serving step returns for one frame.

    With ``deferred_display`` the step emits the raw s2d display tensor
    and the engine finishes it with the Pallas d2s+u8 program (a
    separate dispatch: in-graph the u8 tail costs ~1.3 ms/frame of
    layout shuffles, and inlining the fast kernel re-lays-out the conv
    chain -- see ops/display.py).  Whichever output key the step does
    not consume is dead-code-eliminated from the compiled program.
    """
    if getattr(model, "deferred_display", False) and "output_s2d" in outputs:
        return outputs["output_s2d"]
    return outputs.get("output", outputs["output_denorm"])


def _shared_step_fns(model):
    """Jitted (step, scan_clip, display) triple per InferenceModel."""
    key = model
    if key not in _STEP_CACHE:
        # The closures hold only a weakref to the model (a strong ref
        # in the cached VALUE would pin the weak KEY forever); they are
        # only invoked while an Engine keeps the model alive.
        model_ref = weakref.ref(model)

        # State buffers are donated: XLA aliases output state onto input
        # state, keeping the recurrence zero-copy in HBM.
        @functools.partial(jax.jit, donate_argnums=(2,))
        def _step(params, frame, state):
            m = model_ref()
            outputs, new_state = m.apply(params, frame, state)
            return _select_output(m, outputs), new_state

        def _scan_clip(params, frames, state):
            m = model_ref()

            def body(state, frame):
                outputs, new_state = m.apply(params, frame, state)
                return new_state, _select_output(m, outputs)

            state, outs = jax.lax.scan(body, state, frames)
            return outs, state

        @jax.jit
        def _display(x_s2d):
            from joshupscale_tpu.ops.display import d2s_display_u8

            # Works on (N, Hb, Wb, cs) and stacked (T, N, Hb, Wb, cs).
            if x_s2d.ndim == 5:
                t, n = x_s2d.shape[:2]
                out = d2s_display_u8(
                    x_s2d.reshape((t * n,) + x_s2d.shape[2:]))
                return out.reshape((t, n) + out.shape[1:])
            return d2s_display_u8(x_s2d)

        _STEP_CACHE[key] = (
            _step, jax.jit(_scan_clip, donate_argnums=(2,)), _display
        )
    return _STEP_CACHE[key]


class Engine:
    """One compiled recurrent-upscale stream (or batch of streams)."""

    def __init__(
        self,
        model: InferenceModel,
        params: Dict[str, Any],
        batch_size: int = 1,
        device=None,
        max_inflight: int = 2,
    ) -> None:
        self.model = model
        self.batch_size = batch_size
        self.device = device or jax.devices()[0]
        self.params = jax.device_put(params, self.device)
        self._max_inflight = max_inflight
        self._pending = collections.deque()

        # Engines over the same model share ONE jitted step (jax's jit
        # cache is per function object): N concurrent streams = N Engine
        # instances = one compile, not N (the reference likewise shares
        # one TensorRT engine across filter instances).
        self._step, self._scan_clip, self._display = _shared_step_fns(model)
        self._deferred = (
            getattr(model, "deferred_display", False)
            and getattr(model, "s2d_mode", False)
            and not model.skip_processing
            # remove_flow apply() is non-temporal and never emits
            # output_s2d -- running the d2s+u8 display program on its
            # already-u8 HR output would crash (3 // 16 channels).
            and not getattr(model, "remove_flow", False)
        )

        self.state = jax.device_put(
            model.init_state(batch_size), self.device
        )

        # Frame-feed latency counters (reference TRT runner prints the
        # average seconds/frame, tensorrt/inference.py:245-251).
        self.frames_processed = 0
        self.total_process_seconds = 0.0

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
        """Zero the recurrent state (new stream / seek)."""
        self._drain()
        self.state = jax.device_put(
            self.model.init_state(self.batch_size), self.device
        )

    def process_async(self, frame: np.ndarray):
        """Dispatch one frame; returns the on-device output array.

        Does not block: the returned jax.Array materializes when the step
        finishes.  At most ``max_inflight`` dispatches are buffered so the
        host stays ~1 frame ahead (double buffering) without unbounded
        queueing.
        """
        frame = self._as_input(frame)
        out, self.state = self._step(self.params, frame, self.state)
        if self._deferred:
            out = self._display(out)
        self._pending.append(out)
        while len(self._pending) > self._max_inflight:
            self._pending.popleft().block_until_ready()
        return out

    def process(self, frame: np.ndarray) -> np.ndarray:
        """Blocking single-frame upscale: (H, W, 3) or (N, H, W, 3) u8."""
        start = time.perf_counter()
        squeeze = frame.ndim == 3
        out = self.process_async(frame)
        result = np.asarray(out)
        if squeeze:
            result = result[0]
        self.frames_processed += 1
        self.total_process_seconds += time.perf_counter() - start
        return result

    @property
    def avg_frame_seconds(self) -> float:
        """Mean blocking latency of process() calls so far."""
        if self.frames_processed == 0:
            return 0.0
        return self.total_process_seconds / self.frames_processed

    def process_clip(self, frames: np.ndarray,
                     chunk_frames: Optional[int] = None) -> np.ndarray:
        """Offline mode: (T, N, H, W, 3) or (T, H, W, 3) -> scan over T.

        Device-memory note: the scan stacks the whole clip's outputs in
        HBM before they transfer out -- O(T) device memory (~12 MB/frame
        bf16 s2d at 1080p on the deferred-display path, ~6 MB u8
        otherwise).  For long clips pass ``chunk_frames`` to bound HBM
        use: the clip runs as ceil(T/chunk) scans with the recurrent
        state carried across chunks (bit-identical to one scan; each
        distinct chunk length compiles once, so chunked tails of a
        different length cost one extra compile).
        """
        self._drain()
        squeeze = frames.ndim == 4
        if squeeze:
            frames = frames[:, None]
        if frames.shape[1:] != self.input_shape:
            raise ValueError(
                f"Invalid clip shape {frames.shape}; expected "
                f"(T,) + {self.input_shape}.  A packaged model is "
                f"built for fixed frame dims; load it with "
                f"create_runtime(..., frame_size=(H, W)) to serve a "
                f"different size (the networks are fully "
                f"convolutional)."
            )
        if chunk_frames is not None and frames.shape[0] > chunk_frames:
            parts = [
                self.process_clip(frames[i:i + chunk_frames])
                for i in range(0, frames.shape[0], chunk_frames)
            ]
            result = np.concatenate(parts, axis=0)
            return result[:, 0] if squeeze else result
        frames = jnp.asarray(frames)
        outs, self.state = self._scan_clip(self.params, frames, self.state)
        if self._deferred:
            outs = self._display(outs)
        result = np.asarray(outs)
        if squeeze:
            result = result[:, 0]
        return result

    def _as_input(self, frame: np.ndarray):
        frame = np.asarray(frame)
        if frame.ndim == 3:
            frame = frame[None]
        if frame.shape != self.input_shape:
            raise ValueError(
                f"Invalid frame shape {frame.shape}; expected "
                f"{self.input_shape}"
            )
        return jax.device_put(frame, self.device)

    def _drain(self) -> None:
        while self._pending:
            self._pending.popleft().block_until_ready()

    # -- profiling ---------------------------------------------------------

    def debug_report(self) -> Dict[str, Any]:
        """Compiled-program report (the analog of the reference's
        TensorRT engine-inspector JSON, build_engine.py:244-255):
        instruction counts by opcode, input/output shapes, and the
        compiler's cost analysis when available."""
        import collections
        import re

        frame = jnp.zeros(self.input_shape, jnp.uint8
                          if not self.model.skip_processing
                          else jnp.float32)
        state = jax.tree_util.tree_map(jnp.array, self.state)
        compiled = self._step.lower(self.params, frame, state).compile()
        text = compiled.as_text()
        ops = collections.Counter(
            m.group(1)
            for m in re.finditer(r"= \S+? (\w+)\(", text)
        )
        report: Dict[str, Any] = {
            "instruction_counts": dict(ops.most_common()),
            "num_instructions": sum(ops.values()),
            "input_shape": list(self.input_shape),
            "output_shape": list(self.output_shape),
        }
        try:
            report["cost_analysis"] = {
                k: float(v)
                for k, v in compiled.cost_analysis().items()
                if isinstance(v, (int, float))
            }
        except Exception:
            pass
        return report

    def benchmark(self, num_frames: int = 96, warmup: int = 16,
                  method: str = "scan_diff"):
        """Measure per-frame throughput/latency; returns a dict.

        ``method="scan_diff"`` (default): the frame loop runs as ONE
        jitted ``lax.scan`` on-device and per-frame time is the
        difference quotient between a ``num_frames`` clip and a short
        clip.  This measures pure on-chip time -- the only valid
        methodology on remote/tunneled devices, where per-dispatch
        host timing includes a multi-ms RTT and ``block_until_ready``
        may not synchronize (this repo's bench.py uses the same
        scheme).  Returns {"mean", "frame_ms", "fps", "method"}.

        ``method="per_dispatch"``: wall-clocks each ``process`` round
        trip and reports p50/p99 -- the end-to-end latency a host
        application observes, INCLUDING host<->device transfer and any
        dispatch overhead.  On a tunneled device these numbers are
        dominated by the tunnel RTT and do NOT reflect chip speed.
        """
        rng = np.random.default_rng(0)
        dt = np.float32 if self.model.skip_processing else np.uint8
        if method == "scan_diff":
            dtype = (jnp.float32 if self.model.skip_processing
                     else jnp.uint8)

            deferred = self._deferred

            @jax.jit
            def _consume(x):
                # One element/frame leaves the chip; nothing is DCE'd.
                return x.reshape(x.shape[0], -1)[:, 0].astype(
                    jnp.int32).sum()

            def timed_clip(T, reps=3):
                frames = jnp.asarray(rng.integers(
                    0, 256, (T,) + self.input_shape, np.uint8
                ).astype(dt))

                @jax.jit
                def clip(params, frames, state):
                    def body(state, frame):
                        out, new_state = self.model.apply(
                            params, frame, state)
                        out = _select_output(self.model, out)
                        if deferred:
                            # Stack the s2d tensors: the display
                            # program (a separate dispatch, see
                            # _shared_step_fns) converts them after.
                            return new_state, out
                        return new_state, out[(0,) * out.ndim]
                    state, outs = jax.lax.scan(body, state, frames)
                    if deferred:
                        return outs
                    return outs.astype(jnp.float32).sum()

                def run(state):
                    r = clip(self.params, frames, state)
                    if deferred:
                        r = _consume(self._display(r))
                    return np.asarray(r)

                state = jax.device_put(
                    self.model.init_state(self.batch_size), self.device)
                run(state)  # compile + warm
                t0 = time.perf_counter()
                for _ in range(reps):
                    run(state)
                return (time.perf_counter() - t0) / reps

            short = max(4, num_frames // 6)
            if num_frames <= short:
                # Differencing needs two distinct clip lengths.
                raise ValueError(
                    f"scan_diff needs num_frames > {short} "
                    f"(got {num_frames}); use method='per_dispatch' "
                    f"for short runs")
            t_short = timed_clip(short)
            t_long = timed_clip(num_frames)
            per = (t_long - t_short) / (num_frames - short)
            return {
                "mean": float(per),
                "frame_ms": float(per * 1e3),
                "fps": float(1.0 / per) * self.batch_size,
                "method": "scan_diff",
            }
        if method != "per_dispatch":
            raise ValueError(f"unknown benchmark method {method!r}")
        frame = rng.integers(0, 256, self.input_shape,
                             dtype=np.uint8).astype(dt)
        for _ in range(warmup):
            self.process(frame)
        times = []
        for _ in range(num_frames):
            t0 = time.perf_counter()
            out, self.state = self._step(
                self.params, jax.device_put(frame, self.device), self.state
            )
            if self._deferred:
                # Same program set as process(): step + display.
                out = self._display(out)
            out.block_until_ready()
            times.append(time.perf_counter() - t0)
        times = np.asarray(times)
        return {
            "p50": float(np.percentile(times, 50)),
            "p99": float(np.percentile(times, 99)),
            "mean": float(times.mean()),
            "fps": float(1.0 / np.percentile(times, 50)) * self.batch_size,
            "method": "per_dispatch",
        }


def create_runtime(
    model_path: str,
    device: Optional[int] = None,
    batch_size: int = 1,
    frame_size: Optional[Tuple[int, int]] = None,
) -> Engine:
    """Load a serialized model package and build an engine.

    The runtime ABI analog of reference ``core/public/JoshUpscale/core.h``
    createRuntime(deviceId, modelPath): model packages are directories (or
    .npz files) produced by ``joshupscale_tpu.export.package``.

    ``frame_size=(height, width)`` overrides the packaged LR frame dims
    (the networks are fully convolutional; the packaged dims only size
    the recurrent state).  A training-time package (e.g. built at crop
    size) can thus serve any resolution.
    """
    from joshupscale_tpu.export.package import load_package

    model, params = load_package(model_path)
    if frame_size is not None:
        model = dataclasses.replace(
            model, frame_height=frame_size[0], frame_width=frame_size[1])
    dev = jax.devices()[device] if device is not None else None
    return Engine(model, params, batch_size=batch_size, device=dev)
