"""Measure fit()'s host/device overlap win from deferred metric fetch.

The fit() loop historically fetched every execution's metrics to host
(float(np.asarray(v)) per metric), blocking the host until the step
finished before preparing the next batch -- through the remote tunnel
that is a full round-trip per metric.  ``metric_lag`` holds the metric
trees on device for a bounded window so host input prep overlaps
device compute.  This tool times wall ms/step at the full GAN
architecture (the reference's training workload) for lag 0 (the old
synchronous loop) vs lag 1, with the synthetic-video host generator
from tools/gan_soak.py providing a realistic per-step host cost.

Usage: python tools/fit_overlap_bench.py [--steps 16] [--crop 32]
       [--batch 4] [--dtype float32]
"""

import argparse
import os
import sys
import time

import numpy as np

_TOOLS = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_TOOLS))
sys.path.insert(0, _TOOLS)  # for the shared gan_soak generator


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=16)
    ap.add_argument("--crop", type=int, default=32)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--dtype", type=str, default="float32")
    ap.add_argument("--u8", action="store_true",
                    help="ship u8 batches (the tfrecords TPU input "
                         "layout): 4x smaller H2D, normalized on "
                         "device by fit()'s stager")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from joshupscale_tpu.models import create_models
    from joshupscale_tpu.runtime.engine import enable_compilation_cache
    from joshupscale_tpu.training import (
        build_gan_step,
        fit,
        init_gan_state,
        make_optimizer,
    )

    enable_compilation_cache()
    config = {
        "flow": {"name": "flow-resnet", "num_inputs": 4,
                 "num_filters": 64, "num_res_blocks": 10},
        "generator": {"name": "generator-resnet", "num_filters": 64,
                      "num_res_blocks": 24},
        "discriminator": {"name": "discriminator", "alpha": 0.25},
        "vgg": {"name": "vgg"},
        "gan": {
            "name": "gan",
            "flow": {"model": "flow"},
            "generator": {"model": "generator"},
            "discriminator": {"model": "discriminator"},
            "vgg": {"model": "vgg"},
            "compute_dtype": args.dtype,
        },
    }
    models = create_models(config, seed=0)
    built = models["gan"]
    gopt = make_optimizer(5e-5)
    dopt = make_optimizer(5e-5)
    step = build_gan_step(built.obj, gopt, dopt, built.params["vgg"])

    from gan_soak import synth_video_batch

    crop = args.crop

    def batches():
        # The soak workload's own generator -- the host cost being
        # overlapped is this per-step work.  Fresh rng per run so all
        # timed runs consume IDENTICAL batches.
        rng = np.random.default_rng(0)
        while True:
            b = synth_video_batch(rng, args.batch, crop)
            if args.u8:
                b = {k: ((v + 0.5) * 255.0).astype(np.uint8)
                     for k, v in b.items()}
            yield b

    def run(metric_lag, stage_inputs, label):
        state = init_gan_state(
            built.obj, built.params["gen"], built.params["discr"],
            gopt, dopt)
        # Warm-up epoch compiles (persistent cache) + pages everything.
        state, _ = fit(step, state, batches(), epochs=1,
                       steps_per_epoch=2, rng=jax.random.PRNGKey(0),
                       log_fn=lambda _m: None, metric_lag=metric_lag,
                       stage_inputs=stage_inputs)
        t0 = time.perf_counter()
        state, hist = fit(step, state, batches(), epochs=1,
                          steps_per_epoch=args.steps,
                          rng=jax.random.PRNGKey(1),
                          log_fn=lambda _m: None, metric_lag=metric_lag,
                          stage_inputs=stage_inputs)
        dt = (time.perf_counter() - t0) / args.steps * 1e3
        print(f"{label}: {dt:.1f} ms/step wall "
              f"(loss {hist[0]['train_gen_loss']:.4f})", flush=True)
        return dt

    # A/B ladder (identical batch streams; printed losses are the
    # control).  Note the round-4 per-METRIC fetch path (775.8 ms/step)
    # no longer exists: every mode now fetches whole trees via
    # device_get, so even lag=0 is faster than the round-4 loop.
    run(0, False, "sync        (lag=0, stage=False)")
    run(1, False, "treefetch   (lag=1, stage=False)")
    run(None, True, "round-5 dflt (lag=epoch, stage=True)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
