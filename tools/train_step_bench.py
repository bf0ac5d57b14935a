#!/usr/bin/env python3
"""Full-architecture training-step latency: float32 vs bfloat16 compute.

Measures the FRVSR and GAN (TecoGAN) train steps at the reference
architecture (flow 64f/10rb, generator 64f/24rb) on the default
device, comparing the f32 baseline against the mixed-precision
bfloat16 policy (trainer ``compute_dtype``; the analog of the
reference's mixed_float16 training, train_local.py:72-77).

Method: each configuration compiles ONE executable with
``steps_per_execution=K`` (a ``lax.scan`` over K optimizer steps) and
times whole-executable calls synchronized by fetching one metric
scalar -- the per-call dispatch/tunnel overhead is amortized over K
steps (~3 ms/step at K=10 vs a 28 ms tunnel RTT; the f32-vs-bf16
RATIO is overhead-free to first order since both pay it equally).

Usage: python tools/train_step_bench.py [--crop 32] [--batch 4]
       [--k 10] [--reps 3] [--trainers frvsr,gan]
       [--dtypes float32,bfloat16] [--warps pixel,s2d]

``--warps pixel,s2d`` additionally compares the pixel-space training
warp against the s2d corner-subposition routing
(trainer ``s2d_train_warp``; see ops.warp.dense_image_warp_via_s2d).
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def _build(trainer_name, compute_dtype, crop, batch, s2d_warp=False):
    import jax
    import jax.numpy as jnp

    from joshupscale_tpu.models import create_models
    from joshupscale_tpu.training import (
        TrainState,
        build_frvsr_step,
        build_gan_step,
        init_gan_state,
        make_optimizer,
    )

    config = {
        "flow": {"name": "flow-resnet", "num_inputs": 4,
                 "num_filters": 64, "num_res_blocks": 10},
        "generator": {"name": "generator-resnet", "num_filters": 64,
                      "num_res_blocks": 24},
    }
    if trainer_name == "frvsr":
        config["frvsr"] = {
            "name": "frvsr", "flow": {"model": "flow"},
            "generator": {"model": "generator"},
            "compute_dtype": compute_dtype,
            "s2d_train_warp": s2d_warp,
        }
    else:
        config["discriminator"] = {"name": "discriminator",
                                   "alpha": 0.25}
        config["vgg"] = {"name": "vgg"}
        config["gan"] = {
            "name": "gan", "flow": {"model": "flow"},
            "generator": {"model": "generator"},
            "discriminator": {"model": "discriminator"},
            "vgg": {"model": "vgg"},
            "compute_dtype": compute_dtype,
            "s2d_train_warp": s2d_warp,
        }
    built = create_models(config, seed=0)[trainer_name]
    if trainer_name == "frvsr":
        opt = make_optimizer(1e-4)
        return built, opt, None
    gopt = make_optimizer(1e-4)
    dopt = make_optimizer(1e-4)
    return built, gopt, dopt


def measure(trainer_name, compute_dtype, crop, batch, k, reps,
            s2d_warp=False):
    import jax
    import jax.numpy as jnp

    from joshupscale_tpu.training import (
        TrainState,
        build_frvsr_step,
        build_gan_step,
        init_gan_state,
    )

    built, opt_a, opt_b = _build(trainer_name, compute_dtype, crop,
                                 batch, s2d_warp)
    trainer = built.obj
    t_frames = 10
    rng = np.random.default_rng(0)
    batches = {
        "input": jnp.asarray(rng.random(
            (k, batch, t_frames, crop, crop, 3), np.float32) - 0.5),
        "target": jnp.asarray(rng.random(
            (k, batch, t_frames, crop * 4, crop * 4, 3),
            np.float32) - 0.5),
    }
    key = jax.random.PRNGKey(0)

    if trainer_name == "frvsr":
        step = build_frvsr_step(trainer, opt_a,
                                steps_per_execution=k)
        state = TrainState(built.params, opt_a.init(built.params),
                           jnp.zeros((), jnp.int32))
        metric = "loss"
    else:
        step = build_gan_step(trainer, opt_a, opt_b,
                              built.params["vgg"],
                              steps_per_execution=k)
        state = init_gan_state(trainer, built.params["gen"],
                               built.params["discr"], opt_a, opt_b)
        metric = "gen_loss"

    # Warm-up compiles + first execution.
    state, metrics = step(state, batches, key)
    last = float(metrics[metric])
    assert np.isfinite(last), (trainer_name, compute_dtype, last)

    t0 = time.perf_counter()
    for _ in range(reps):
        state, metrics = step(state, batches, key)
        last = float(metrics[metric])  # sync: forces the exec to finish
    dt = (time.perf_counter() - t0) / reps
    return {
        "trainer": trainer_name,
        "compute_dtype": compute_dtype,
        "train_warp": "s2d" if s2d_warp else "pixel",
        "ms_per_step": round(dt * 1e3 / k, 2),
        "steps_per_execution": k,
        "final_" + metric: round(last, 4),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--crop", type=int, default=32)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--trainers", default="frvsr,gan")
    ap.add_argument("--dtypes", default="float32,bfloat16")
    ap.add_argument("--warps", default="pixel",
                    help="comma list of pixel,s2d")
    args = ap.parse_args()

    from joshupscale_tpu.runtime.engine import enable_compilation_cache

    enable_compilation_cache()
    results = []
    for trainer_name in args.trainers.split(","):
        base_ms = None
        for dtype in args.dtypes.split(","):
            for warp in args.warps.split(","):
                r = measure(trainer_name, dtype, args.crop, args.batch,
                            args.k, args.reps, s2d_warp=(warp == "s2d"))
                if base_ms is None:
                    base_ms = r["ms_per_step"]
                else:
                    r["speedup_vs_first"] = round(
                        base_ms / r["ms_per_step"], 3)
                results.append(r)
                print(json.dumps(r), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
