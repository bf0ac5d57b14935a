"""Per-op TPU profile of the flagship serving step.

Runs the quality-tier recurrent step as a jitted lax.scan over T frames
under jax.profiler.start_trace, then parses the .trace.json.gz for
per-op device times (sum of ph=="X" event durations on the TPU pid,
divided by scan length).  See CLAUDE.md "TPU measurement rules".

Usage: python tools/profile_step.py [--frames 32] [--top 25]
"""

import argparse
import collections
import glob
import gzip
import json
import os
import re
import sys
import tempfile

import numpy as np


def build_step(height=270, width=480, dtype="bfloat16",
               config_path=None):
    import jax
    import jax.numpy as jnp

    from joshupscale_tpu.models import create_models

    if config_path:
        # Profile any serving tier (e.g. configs/inference_ps2_style
        # .yaml); frame dims come from --height/--width.
        import yaml

        with open(config_path) as f:
            doc = yaml.safe_load(f)
        config = doc["models"] if "models" in doc else doc
        config["inference"] = dict(
            config["inference"], frame_height=height,
            frame_width=width)
    else:
        config = {
            "flow": {"name": "flow-resnet", "num_inputs": 4,
                     "num_filters": 64, "num_res_blocks": 10},
            "generator": {"name": "generator-resnet",
                          "num_filters": 64, "num_res_blocks": 24},
            "inference": {
                "name": "inference",
                "generator": {"model": "generator"},
                "flow": {"model": "flow"},
                "skip_processing": False,
                "frame_height": height,
                "frame_width": width,
                "compute_dtype": dtype,
            },
        }
    models = create_models(config, seed=0)
    built = models["inference"]
    model = built.obj

    @jax.jit
    def clip(params, frames, state):
        def body(state, frame):
            outputs, new_state = model.apply(params, frame, state)
            # Profile the SERVING graph: with deferred display the
            # step emits the raw s2d tensor and the d2s+u8 runs as a
            # separate program (not traced here; it is ~0.15 ms, see
            # ops/display.py).  Fall back to the inline display path.
            out = outputs.get("output_s2d", outputs.get("output"))
            return new_state, out[0, 0, 0, 0]

        state, outs = jax.lax.scan(body, state, frames)
        return outs.astype(jnp.int32).sum()

    state = model.init_state(1, dtype=jnp.bfloat16)
    params = jax.device_put(built.params)
    return clip, params, state, model


def parse_trace(trace_dir, scan_len):
    """Sum per-op device time from the profiler trace."""
    files = glob.glob(
        os.path.join(trace_dir, "**", "*.trace.json.gz"), recursive=True)
    if not files:
        raise SystemExit(f"no trace files under {trace_dir}")
    with gzip.open(sorted(files)[-1], "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    # Find TPU device pids.
    tpu_pids = set()
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            name = e.get("args", {}).get("name", "")
            if "TPU" in name and "XLA" not in name.upper() or re.search(
                    r"/device:TPU", name):
                tpu_pids.add(e["pid"])
    per_op = collections.Counter()
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in tpu_pids:
            continue
        dur = e.get("dur", 0)
        name = e.get("name", "?")
        per_op[name] += dur
        total += dur
    return per_op, total


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=32)
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--height", type=int, default=270)
    ap.add_argument("--width", type=int, default=480)
    ap.add_argument("--config", default=None,
                    help="serving-tier YAML (default: quality arch)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from joshupscale_tpu.runtime.engine import enable_compilation_cache

    enable_compilation_cache()
    clip, params, state, model = build_step(
        args.height, args.width, config_path=args.config)
    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.integers(
        0, 256, (args.frames, 1, args.height, args.width, 3), np.uint8))

    print("compiling + warming...", flush=True)
    np.asarray(clip(params, frames, state))

    trace_dir = tempfile.mkdtemp(prefix="jub_trace_")
    jax.profiler.start_trace(trace_dir)
    np.asarray(clip(params, frames, state))
    jax.profiler.stop_trace()

    per_op, total = parse_trace(trace_dir, args.frames)
    per_frame_us = total / args.frames
    print(f"\ntotal device time: {total/1e3:.2f} ms "
          f"({per_frame_us/1e3:.3f} ms/frame over {args.frames} frames)")
    print(f"\n{'us/frame':>10}  {'%':>5}  op")
    for name, dur in per_op.most_common(args.top):
        print(f"{dur/args.frames:>10.1f}  {100*dur/total:>5.1f}  "
              f"{name[:110]}")


if __name__ == "__main__":
    sys.exit(main())
