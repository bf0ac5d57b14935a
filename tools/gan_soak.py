"""GAN training soak at the full reference architecture (on-device).

Runs the TecoGAN step (flow 64f/10rb + generator 64f/24rb +
discriminator + VGG, 19-frame ping-pong) for N steps on random video
batches and reports the loss trajectory -- the convergence-behaviour
evidence for README.md (real-data quality needs the reference's
tfrecords + ImageNet VGG weights, which are not in this environment;
see tools/keras_vgg_to_npz.py for the weights recipe).

Usage: python tools/gan_soak.py [--steps 400] [--crop 32] [--batch 4]
"""

import argparse
import json
import sys
import time

import numpy as np


def synth_video_batch(rng, batch_size, crop):
    """Synthetic "video" batch: smooth random fields with temporal
    drift so the flow/warp terms see coherent motion.  Shared with
    tools/fit_overlap_bench.py so the overlap benchmark's host cost is
    exactly this soak workload's."""
    base = rng.random(
        (batch_size, 1, crop * 4, crop * 4, 3), np.float32)
    drift = rng.random((batch_size, 10, 1, 1, 3), np.float32) * 0.1
    hr = np.clip(base + drift, 0.0, 1.0) - 0.5
    lr = hr.reshape(batch_size, 10, crop, 4, crop, 4, 3).mean((3, 5))
    return {"input": lr, "target": hr}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--crop", type=int, default=32)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--log-every", type=int, default=25)
    ap.add_argument("--ablate", type=str, default="",
                    help="comma-separated loss keys to zero (debug)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from joshupscale_tpu.models import create_models
    from joshupscale_tpu.runtime.engine import enable_compilation_cache
    from joshupscale_tpu.training import (
        build_gan_step,
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
        },
    }
    models = create_models(config, seed=0)
    built = models["gan"]
    trainer = built.obj
    if args.ablate:
        import dataclasses as dc
        overrides = tuple((k, 0.0) for k in args.ablate.split(","))
        trainer = dc.replace(
            trainer, loss_config=trainer.loss_config + overrides)
    gopt = make_optimizer(5e-5)
    dopt = make_optimizer(5e-5)
    step = build_gan_step(trainer, gopt, dopt, built.params["vgg"])
    state = init_gan_state(
        trainer, built.params["gen"], built.params["discr"], gopt, dopt)

    rng = np.random.default_rng(0)
    crop = args.crop

    def batch(i):
        b = synth_video_batch(rng, args.batch, crop)
        return {k: jnp.asarray(v) for k, v in b.items()}

    key = jax.random.PRNGKey(0)
    t0 = time.perf_counter()
    history = []
    for i in range(args.steps):
        state, metrics = step(state, batch(i), jax.random.fold_in(key, i))
        if i % args.log_every == 0 or i == args.steps - 1:
            m = {k: float(v) for k, v in metrics.items()}
            if not all(np.isfinite(v) for v in m.values()):
                print(f"step {i}: NON-FINITE metric: {m}",
                      file=sys.stderr)
                return 1
            m["step"] = i
            history.append(m)
            print(json.dumps({k: round(v, 5) for k, v in m.items()}),
                  flush=True)
    dt = time.perf_counter() - t0
    first, last = history[0], history[-1]
    print(f"\n{args.steps} steps in {dt:.1f}s "
          f"({dt/args.steps*1e3:.1f} ms/step incl. host)")
    print(f"gen_loss {first['gen_loss']:.4f} -> {last['gen_loss']:.4f}; "
          f"content {first['content_loss']:.4f} -> "
          f"{last['content_loss']:.4f}; "
          f"discr_steps {int(last['discr_steps'])}")
    ok = last["content_loss"] < first["content_loss"]
    print("content loss decreased:", ok)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
