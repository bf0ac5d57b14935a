#!/usr/bin/env python3
"""Per-frame p50/p99 serving latency, measured device-side.

BASELINE.json's target reads "p50 frame latency < 16.6 ms" -- a LATENCY
claim, while bench.py's scan-differencing yields mean THROUGHPUT only
(the right call through the dev tunnel, where host-side per-dispatch
timing is meaningless: ~28 ms RTT per round-trip and
``block_until_ready`` does not synchronize).  This probe measures the
latency DISTRIBUTION honestly: T production dispatches
(``Engine.process``, the same per-frame two-program structure the
serving paths use) run under ``jax.profiler.start_trace``, and
per-frame latency is read from the trace's "XLA Modules" track, which
carries exactly one module-level event per executed program
(``jit__step`` + ``jit__display`` on the deferred-display s2d path).

Per-frame device latency = step span + display span: what a TPU-VM
host observes per frame apart from its dispatch overhead (µs-scale
PCIe ops locally; the tunnel RTT *between* the two programs here is
excluded because it does not exist in production -- the native
PJRT backend enqueues both without a host round-trip).

Reference analog: scripts/inference/tensorrt/inference.py:245-251
prints per-frame latency stats; BASELINE.json encodes the p50 target.

Usage:
    python tools/latency_probe.py --tier quality --frames 200
    python tools/latency_probe.py --tier fast
    python tools/latency_probe.py --tier ps2
    python tools/latency_probe.py --tier ps2_fast
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

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

QUALITY_CONFIG = {
    # The flagship architecture bench.py measures (reference default).
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

TIER_CONFIGS = {
    "fast": "configs/inference_fast.yaml",
    "ps2": "configs/inference_ps2_style.yaml",
    "ps2_fast": "configs/inference_ps2_fast.yaml",
}


def load_tier(tier):
    if tier == "quality":
        return QUALITY_CONFIG
    import yaml

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), TIER_CONFIGS[tier])
    with open(path) as f:
        doc = yaml.safe_load(f)
    return doc["models"] if "models" in doc else doc


def module_spans(trace_dir):
    """Per-execution spans from the trace's "XLA Modules" track.

    Returns {module_base_name: [(ts_us, dur_us), ...]} in time order.
    """
    files = glob.glob(
        os.path.join(trace_dir, "**", "*.trace.json.gz"), recursive=True)
    if not files:
        raise SystemExit(f"no trace files under {trace_dir}")
    with gzip.open(sorted(files)[-1], "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    tpu_pids = set()
    module_tracks = set()
    for e in events:
        if e.get("ph") != "M":
            continue
        if e.get("name") == "process_name":
            name = e.get("args", {}).get("name", "")
            if re.search(r"/device:TPU", name) or "TPU" in name:
                tpu_pids.add(e["pid"])
        elif e.get("name") == "thread_name":
            if e.get("args", {}).get("name") == "XLA Modules":
                module_tracks.add((e["pid"], e.get("tid")))
    spans = collections.defaultdict(list)
    for e in events:
        if e.get("ph") != "X":
            continue
        key = (e.get("pid"), e.get("tid"))
        if key not in module_tracks or e.get("pid") not in tpu_pids:
            continue
        base = re.sub(r"\(\d+\)$", "", e.get("name", "?"))
        spans[base].append((e.get("ts", 0), e.get("dur", 0)))
    for base in spans:
        spans[base].sort()
    return dict(spans)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tier",
                    choices=["quality", "fast", "ps2", "ps2_fast"],
                    default="quality")
    ap.add_argument("--frames", type=int, default=200)
    ap.add_argument("--warmup", type=int, default=8)
    ap.add_argument("--height", type=int, default=None,
                    help="override LR frame height")
    ap.add_argument("--width", type=int, default=None)
    args = ap.parse_args()

    import jax

    from joshupscale_tpu.models import create_models
    from joshupscale_tpu.runtime.engine import (
        Engine, enable_compilation_cache)

    enable_compilation_cache()
    config = load_tier(args.tier)
    if args.height is not None:
        config["inference"]["frame_height"] = args.height
    if args.width is not None:
        config["inference"]["frame_width"] = args.width
    models = create_models(config, seed=0)
    model = models["inference"].obj
    eng = Engine(model, models["inference"].params)
    H, W = model.frame_height, model.frame_width

    rng = np.random.default_rng(0)
    frames = rng.integers(
        0, 256, (args.warmup + args.frames, H, W, 3), np.uint8)
    print(f"tier={args.tier} {W}x{H} -> {4 * W}x{4 * H}; "
          "compiling + warming...", flush=True)
    for t in range(args.warmup):
        eng.process(frames[t])

    trace_dir = tempfile.mkdtemp(prefix="jub_lat_")
    jax.profiler.start_trace(trace_dir)
    for t in range(args.warmup, args.warmup + args.frames):
        eng.process(frames[t])
    jax.profiler.stop_trace()

    spans = module_spans(trace_dir)
    # Keep only the serving programs: every module that executed once
    # per frame (filters out stray one-off programs in the trace).
    per_frame = {name: s for name, s in spans.items()
                 if len(s) == args.frames}
    skipped = {name: len(s) for name, s in spans.items()
               if len(s) != args.frames}
    if skipped:
        print(f"ignoring non-per-frame modules: {skipped}")
    if not per_frame:
        raise SystemExit(f"no per-frame modules found; saw {list(spans)}")

    lat_us = np.zeros(args.frames)
    for name, s in sorted(per_frame.items()):
        durs = np.array([d for _, d in s], float)
        lat_us += durs
        print(f"  {name}: mean {durs.mean() / 1e3:.3f} ms  "
              f"p50 {np.percentile(durs, 50) / 1e3:.3f}  "
              f"p99 {np.percentile(durs, 99) / 1e3:.3f}")

    ms = lat_us / 1e3
    stats = {
        "tier": args.tier,
        "frames": args.frames,
        "programs": sorted(per_frame),
        "mean_ms": round(float(ms.mean()), 3),
        "p50_ms": round(float(np.percentile(ms, 50)), 3),
        "p90_ms": round(float(np.percentile(ms, 90)), 3),
        "p99_ms": round(float(np.percentile(ms, 99)), 3),
        "max_ms": round(float(ms.max()), 3),
        "p50_meets_16.6ms": bool(np.percentile(ms, 50) < 16.6),
    }
    print(json.dumps(stats))
    return 0


if __name__ == "__main__":
    sys.exit(main())
