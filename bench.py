"""Headline benchmark: real-time 480x270 -> 1920x1080 recurrent upscale.

Runs the flagship quality model (flow 64f/10rb + generator 64f/24rb, the
reference's default architecture) as a recurrent stream on one chip,
bfloat16 compute (the TPU analog of the reference's fp16 TensorRT
engines), and reports per-frame on-chip latency against the 60 fps
real-time target (BASELINE.md: >= 1 real-time 1080p60 stream per chip,
p50 < 16.6 ms).

Measurement: the dev tunnel to the TPU adds a fixed multi-ms host RTT
per dispatch and `block_until_ready` does not synchronize through it, so
per-frame host-loop timing is meaningless here.  Instead the frame loop
runs as ONE jitted `lax.scan` over T frames (exactly the runtime's
offline clip path) and per-frame time is the difference quotient between
a long and a short clip -- pure on-chip time, no tunnel artifacts.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""

import json
import sys
import time

import numpy as np


def _clip_time(model, params, T, reps=3):
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    frames = jnp.asarray(
        rng.integers(0, 256, (T, 1, model.frame_height, model.frame_width,
                              3), np.uint8)
    )

    # Mirror Engine._deferred (runtime/engine.py keeps the same
    # two-program scheme in Engine.benchmark -- update BOTH if the
    # dispatch structure changes): output_s2d only exists on the s2d
    # inference path with u8 I/O.
    deferred = (getattr(model, "deferred_display", False)
                and getattr(model, "s2d_mode", False)
                and not model.skip_processing
                and not getattr(model, "remove_flow", False))

    @jax.jit
    def clip(params, frames, state):
        def body(state, frame):
            outputs, new_state = model.apply(params, frame, state)
            if deferred:
                # Stack the raw s2d display tensors; the u8 conversion
                # runs as a SECOND program below (the serving engine's
                # dispatch structure -- in-graph the u8 tail costs
                # ~1.3 ms/frame of layout shuffles, see ops/display.py).
                # HBM note: the stack is O(T) (~12 MB/frame bf16 at
                # 1080p; T=96 here = ~1.2 GB of 16 GB) -- raise T only
                # with Engine.process_clip-style chunking.
                return new_state, outputs["output_s2d"]
            # Consume one output element per frame so nothing is DCE'd
            # but no frame leaves the chip.
            return new_state, outputs["output"][0, 0, 0, 0]
        state, outs = jax.lax.scan(body, state, frames)
        if deferred:
            return outs
        return outs.astype(jnp.int32).sum()

    @jax.jit
    def display_consume(s2d_stack):
        from joshupscale_tpu.ops.display import d2s_display_u8

        t, n = s2d_stack.shape[:2]
        out = d2s_display_u8(
            s2d_stack.reshape((t * n,) + s2d_stack.shape[2:]))
        # One element/frame leaves the chip.
        return out[:, 0, 0, 0].astype(jnp.int32).sum()

    def run(state):
        r = clip(params, frames, state)
        if deferred:
            r = display_consume(r)
        return np.asarray(r)

    state = model.init_state(1, dtype=jnp.bfloat16)
    run(state)  # compile + warm
    t0 = time.perf_counter()
    for _ in range(reps):
        run(state)
    return (time.perf_counter() - t0) / reps


def _probe_backend(timeout_s=90):
    """Verify the TPU backend answers, in a SUBPROCESS with a timeout.

    A wedged tunnel makes jax.devices() hang forever in-process (no
    Python-level way to interrupt the C call), which would leave the
    driver with rc=124 and no artifact.  Probing in a child process
    bounds that: on failure we can still emit a structured JSON line.
    Returns None if healthy, else a short error string.
    """
    import subprocess

    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax; d = jax.devices(); print(d[0].platform)"],
            capture_output=True, text=True, timeout=timeout_s,
        )
    except subprocess.TimeoutExpired:
        return f"backend probe hung >{timeout_s}s (tunnel wedged?)"
    if r.returncode != 0:
        tail = (r.stderr or r.stdout).strip().splitlines()
        return "backend init failed: " + (tail[-1] if tail else "?")
    return None


def _error_line(err: str) -> None:
    print(json.dumps({
        "metric": "fps_480x270_to_1080p_quality_stream",
        "value": None, "unit": "fps", "vs_baseline": None,
        "error": err,
    }))


def main():
    if "--child" not in sys.argv:
        return _watchdog()
    return _measure()


def _watchdog(timeout_s: int = 2400) -> int:
    """Run the measurement in a CHILD process under a hard timeout.

    The probe catches a tunnel that is already down, but a remote
    compile/execute can also wedge MID-RUN with no Python-level way to
    interrupt the blocked C call -- process isolation is the only
    reliable bound.  Whatever happens, the driver gets ONE JSON line.
    """
    import subprocess

    err = _probe_backend()
    if err is not None:
        _error_line(err)
        return 1
    try:
        r = subprocess.run(
            [sys.executable, __file__, "--child"],
            capture_output=True, text=True, timeout=timeout_s,
        )
    except subprocess.TimeoutExpired:
        _error_line(f"measurement hung >{timeout_s}s "
                    "(remote compile/execute wedged?)")
        return 1
    line = next((ln for ln in r.stdout.strip().splitlines()[::-1]
                 if ln.startswith("{")), None)
    if line is not None:
        print(line)
        return r.returncode
    tail = (r.stderr or r.stdout).strip().splitlines()
    _error_line("measurement child produced no JSON: "
                + (tail[-1][:400] if tail else "?"))
    return 1


def _measure():
    import jax

    from joshupscale_tpu.models import create_models
    from joshupscale_tpu.runtime.engine import enable_compilation_cache

    enable_compilation_cache()

    config = {
        "flow": {"name": "flow-resnet", "num_inputs": 4,
                 "num_filters": 64, "num_res_blocks": 10},
        "generator": {"name": "generator-resnet", "num_filters": 64,
                      "num_res_blocks": 24},
        "inference": {
            "name": "inference",
            "generator": {"model": "generator"},
            "flow": {"model": "flow"},
            "skip_processing": False,
            "frame_height": 270,
            "frame_width": 480,
            "compute_dtype": "bfloat16",
        },
    }
    models = create_models(config, seed=0)
    built = models["inference"]
    params = jax.device_put(built.params)

    t_short = _clip_time(built.obj, params, 16)
    t_long = _clip_time(built.obj, params, 96)
    per_frame = (t_long - t_short) / 80.0

    fps = 1.0 / per_frame
    result = {
        "metric": "fps_480x270_to_1080p_quality_stream",
        "value": round(fps, 2),
        "unit": "fps",
        "vs_baseline": round(fps / 60.0, 4),
        "frame_ms": round(per_frame * 1e3, 3),
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    try:
        sys.exit(main())
    except Exception as exc:  # red bench must still be a structured artifact
        print(json.dumps({
            "metric": "fps_480x270_to_1080p_quality_stream",
            "value": None, "unit": "fps", "vs_baseline": None,
            "error": f"{type(exc).__name__}: {exc}"[:500],
        }))
        sys.exit(1)
