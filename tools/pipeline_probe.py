#!/usr/bin/env python3
"""Measure the two-chip pipeline's stage latencies on ONE real chip.

Only one physical TPU is reachable in this environment, so the
two-chip `parallel.PipelinedEngine` interval cannot be measured
directly; what CAN be measured is each stage's on-device latency at
production shapes (scan-differencing, same methodology as bench.py).
The predicted pipelined frame interval is

    max(F, G) + t_transfer(inter payload over ICI)

where the inter payload is the s2d flow head (N, H, W, 32) bf16 + the
preprocessed frame (N, H, W, 3): ~8.6 MB at 1080p -> ~0.2 ms at
45 GB/s ICI (v5e per-link).

Usage:  python tools/pipeline_probe.py [--tier quality|fast]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _flagship_config(tier: str):
    gen_rb = 24 if tier == "quality" else 10
    flow_rb = 10 if tier == "quality" else 4
    return {
        "flow": {"name": "flow-resnet", "num_inputs": 4,
                 "num_filters": 64, "num_res_blocks": flow_rb},
        "generator": {"name": "generator-resnet", "num_filters": 64,
                      "num_res_blocks": gen_rb},
        "inference": {"name": "inference", "flow": {"model": "flow"},
                      "generator": {"model": "generator"},
                      "frame_height": 270, "frame_width": 480,
                      "skip_processing": False, "s2d_mode": True,
                      "deferred_display": True,
                      "compute_dtype": "bfloat16"},
    }


def timed_scan(fn, state, T_short=20, T_long=60):
    """Per-iteration seconds via clip-length differencing (the tunnel
    does not synchronize, so never time a single dispatch).

    The stage payload is reduced into the carry -- without that, XLA
    dead-code-eliminates the stage body (stage F's shift-register state
    does not depend on the flow net at all)."""

    def body(carry, _):
        st, acc = carry
        payload, new_state = fn(st)
        leaf = jax.tree_util.tree_leaves(payload)[0]
        return (new_state, acc + jnp.sum(leaf.astype(jnp.float32))), ()

    def run(T):
        jitted = jax.jit(
            lambda s: jax.lax.scan(
                body, (s, jnp.float32(0)), None, length=T)[0][1])
        # Warm-up + compile.
        float(jitted(jax.tree_util.tree_map(jnp.array, state)))
        t0 = time.perf_counter()
        float(jitted(jax.tree_util.tree_map(jnp.array, state)))
        return time.perf_counter() - t0

    t_short = run(T_short)
    t_long = run(T_long)
    return (t_long - t_short) / (T_long - T_short)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tier", default="quality",
                    choices=("quality", "fast"))
    args = ap.parse_args()

    from joshupscale_tpu.models import create_models
    from joshupscale_tpu.runtime.engine import enable_compilation_cache

    enable_compilation_cache()
    built = create_models(_flagship_config(args.tier), seed=0)["inference"]
    model = built.obj
    params = jax.device_put(built.params)
    print("device:", jax.devices()[0].device_kind)

    frame = jnp.asarray(
        np.random.default_rng(0).integers(
            0, 256, (1, 270, 480, 3), dtype=np.uint8))
    full = model.init_state(1)

    # Stage F: preprocess + flow net (recurrent in last_frames).
    def f_step(flow_state):
        inter, new_state = model.apply_flow_stage(
            {"flow": params["flow"]}, frame, flow_state)
        return inter, new_state

    tF = timed_scan(f_step, {"last_frames": full["last_frames"]})

    # Stage G: warp + generator (recurrent in pre_gen); inter fixed.
    inter0, _ = jax.jit(
        lambda s: model.apply_flow_stage({"flow": params["flow"]},
                                         frame, s))(
        {"last_frames": full["last_frames"]})

    def g_step(gen_state):
        outputs, new_state = model.apply_gen_stage(
            {"generator": params["generator"]}, inter0, gen_state)
        return outputs, new_state

    tG = timed_scan(g_step, {"pre_gen": full["pre_gen"]})

    inter_bytes = sum(
        np.prod(v.shape) * v.dtype.itemsize
        for v in jax.tree_util.tree_leaves(inter0))
    t_ici = inter_bytes / 45e9  # v5e per-link ICI

    interval = max(tF, tG) + t_ici
    print(f"stage F (flow)      : {tF * 1e3:7.2f} ms")
    print(f"stage G (warp+gen)  : {tG * 1e3:7.2f} ms")
    print(f"inter payload       : {inter_bytes / 1e6:7.2f} MB "
          f"(~{t_ici * 1e3:.2f} ms ICI)")
    print(f"predicted 2-chip interval: {interval * 1e3:.2f} ms "
          f"({1.0 / interval:.1f} fps)")
    print(f"single-chip serial bound : {(tF + tG) * 1e3:.2f} ms "
          f"({1.0 / (tF + tG):.1f} fps)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
