"""Decompose the GAN fit() wall-clock gap (on-chip 162.7 vs wall 776).

The round-4 A/B (tools/fit_overlap_bench.py) measured 775.8 ms/step
wall for the full-arch GAN step whose on-chip time is 162.7 ms.  The
judge prescribed a multiprocess input pipeline — but this host has ONE
CPU core (`nproc` = 1), so CPU-bound datagen cannot be parallelized
away; the gap must be decomposed before it can be closed.  Candidate
costs, each a tunnel round-trip (~28 ms) or a synchronous transfer:

- per-metric host fetch: MeanAccumulator calls float(np.asarray(v))
  per metric (~13 metrics = ~13 RTTs/step even with metric_lag=1)
- jax.random.split per step (a tiny remote program + dispatch)
- host->device batch staging (8.4 MB/step synchronous transfer)
- the datagen numpy work itself (bounded by the single core)

Variants (K steps each, scan-diff differencing against a shorter run
to cancel fixed costs):

  A  pre-staged device batches, numpy keys, fetch ONE scalar at end
     -> dispatch + on-chip floor
  B  A + per-step per-metric float fetch (lag 1)     -> old fit loop's metric cost
  C  A + per-step single jax.device_get(metrics)     -> batched-fetch cost
  D  A + per-step jax.random.split(rng)              -> device-RNG cost
  E  host datagen + jnp.asarray per step (one end fetch) -> +gen +H2D
  F  E + per-step device_get (the proposed fit loop)
  G  E with u8 batch staging + device normalize      -> 4x smaller H2D

Usage: python tools/fit_cost_probe.py [--steps 12] [--base 4]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

_TOOLS = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_TOOLS))
sys.path.insert(0, _TOOLS)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=12)
    ap.add_argument("--base", type=int, default=4)
    ap.add_argument("--crop", type=int, default=32)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--reps", type=int, default=1,
                    help="repetitions; reports the median scan-diff "
                         "(tunnel RTT jitter is tens of ms)")
    ap.add_argument("--only", type=str, default="",
                    help="comma-separated variant prefixes to run")
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
    from joshupscale_tpu.training.trainer import device_normalize

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
            "compute_dtype": "bfloat16",
        },
    }
    models = create_models(config, seed=0)
    built = models["gan"]
    gopt = make_optimizer(5e-5)
    dopt = make_optimizer(5e-5)
    step = build_gan_step(built.obj, gopt, dopt, built.params["vgg"])

    from gan_soak import synth_video_batch

    crop, batch_size = args.crop, args.batch
    nbytes = (batch_size * 10 * crop * crop * 3 * (1 + 16)) * 4

    def fresh_state():
        return init_gan_state(
            built.obj, built.params["gen"], built.params["discr"],
            gopt, dopt)

    def host_keys(n):
        return np.asarray(jax.random.split(jax.random.PRNGKey(0), n))

    def staged_batches(n):
        rng = np.random.default_rng(0)
        return [
            {k: jax.device_put(v) for k, v in
             synth_video_batch(rng, batch_size, crop).items()}
            for _ in range(n)
        ]

    def timed(fn, n):
        """Run fn over n steps from a fresh state; force at end."""
        state = fresh_state()
        t0 = time.perf_counter()
        state, last = fn(state, n)
        # One scalar fetch forces the donated-state chain.
        float(np.asarray(last["gen_loss"]))
        return (time.perf_counter() - t0) * 1e3, state

    def run_variant(name, fn):
        # warmup (compile + page) then scan-diff two lengths
        timed(fn, 2)
        diffs = []
        for _ in range(args.reps):
            t_long, _ = timed(fn, args.steps)
            t_short, _ = timed(fn, args.base)
            diffs.append((t_long - t_short) / (args.steps - args.base))
        ms = float(np.median(diffs))
        print(json.dumps({"variant": name, "ms_per_step": round(ms, 1),
                          "reps": [round(d, 1) for d in diffs]}),
              flush=True)
        return ms

    keys = host_keys(max(args.steps, 64) + 8)

    # ---- A: device batches, host keys, end fetch only
    dev = staged_batches(6)

    def var_a(state, n):
        last = None
        for i in range(n):
            state, last = step(state, dev[i % len(dev)], keys[i])
        return state, last

    # ---- B: + per-step per-metric float fetch (lag 1)
    def var_b(state, n):
        import collections
        pend = collections.deque()
        last = None
        for i in range(n):
            state, last = step(state, dev[i % len(dev)], keys[i])
            pend.append(last)
            if len(pend) > 1:
                m = pend.popleft()
                for v in m.values():
                    float(np.asarray(v))
        return state, last

    # ---- C: + per-step single device_get (lag 1)
    def var_c(state, n):
        import collections
        pend = collections.deque()
        last = None
        for i in range(n):
            state, last = step(state, dev[i % len(dev)], keys[i])
            pend.append(last)
            if len(pend) > 1:
                jax.device_get(pend.popleft())
        return state, last

    # ---- D: + per-step jax.random.split on device
    def var_d(state, n):
        rng = jax.random.PRNGKey(0)
        last = None
        for i in range(n):
            rng, k = jax.random.split(rng)
            state, last = step(state, dev[i % len(dev)], k)
        return state, last

    # ---- E: host datagen + asarray per step, end fetch
    def var_e(state, n):
        rng = np.random.default_rng(0)
        last = None
        for i in range(n):
            b = synth_video_batch(rng, batch_size, crop)
            b = {k: jnp.asarray(v) for k, v in b.items()}
            state, last = step(state, b, keys[i])
        return state, last

    # ---- F: E + per-step single device_get (proposed fit loop)
    def var_f(state, n):
        import collections
        rng = np.random.default_rng(0)
        pend = collections.deque()
        last = None
        for i in range(n):
            b = synth_video_batch(rng, batch_size, crop)
            b = {k: jnp.asarray(v) for k, v in b.items()}
            state, last = step(state, b, keys[i])
            pend.append(last)
            if len(pend) > 1:
                jax.device_get(pend.popleft())
        return state, last

    # ---- G: E but u8 batches + device_normalize (4x smaller H2D)
    def var_g(state, n):
        rng = np.random.default_rng(0)
        last = None
        for i in range(n):
            b = synth_video_batch(rng, batch_size, crop)
            b = {k: ((v + 0.5) * 255.0).astype(np.uint8)
                 for k, v in b.items()}
            b = device_normalize({k: jnp.asarray(v)
                                  for k, v in b.items()})
            state, last = step(state, b, keys[i])
        return state, last

    # host datagen cost alone (single core, numpy)
    rng = np.random.default_rng(0)
    t0 = time.perf_counter()
    for _ in range(20):
        synth_video_batch(rng, batch_size, crop)
    gen_ms = (time.perf_counter() - t0) / 20 * 1e3
    print(json.dumps({"variant": "datagen_only",
                      "ms_per_step": round(gen_ms, 1),
                      "bytes_per_batch": nbytes}), flush=True)

    only = [s for s in args.only.split(",") if s]
    for name, fn in [("A_floor", var_a), ("B_permetric_fetch", var_b),
                     ("C_treefetch", var_c), ("D_device_split", var_d),
                     ("E_hostgen_h2d", var_e), ("F_proposed_loop", var_f),
                     ("G_u8_h2d", var_g)]:
        if only and not any(name.startswith(p) for p in only):
            continue
        run_variant(name, fn)
    return 0


if __name__ == "__main__":
    sys.exit(main())
