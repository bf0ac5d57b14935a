#!/usr/bin/env python3
"""Recalibrate BN moving statistics of a trained checkpoint.

Checkpoints trained before the scan-BN fix (models/common.py
merge_scan_bn_updates) carry generator moving statistics calibrated to
the FIRST generator call's random-noise pre_warp input instead of the
steady-state recurrence -- measured as a uniform ~1.7 dB held-out
penalty in inference-mode BN at training parity.  This tool replays the
FRVSR training forward (flow batched + generator recurrence, exactly
the serving activation distribution) over N train-pipeline batches,
extracts the IMPLIED batch statistics from each bn_update
(upd = old * m + batch * (1 - m)), and sets the moving stats to their
mean -- equivalent to running the momentum EMA to convergence, in one
pass.

Works on FRVSR TrainState checkpoints ("params.*") and GAN states
("gen_params.*"); only moving_mean / moving_variance leaves change.

Usage:
    python tools/bn_recalibrate.py checkpoints/frvsr_learn10/best.npz \
        -c configs/frvsr_synth_learn.yaml -o best_bncal.npz [--cpu]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("checkpoint")
    ap.add_argument("-c", "--config", required=True)
    ap.add_argument("-o", "--out", default=None,
                    help="output npz (default: <input>_bncal.npz)")
    ap.add_argument("--batches", type=int, default=32)
    ap.add_argument("--batch-size", type=int, default=4)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import yaml

    import jax.numpy as jnp

    from joshupscale_tpu.data.pipeline import create_train_dataset
    from joshupscale_tpu.export.importer import unflatten_into
    from joshupscale_tpu.models import create_models
    from joshupscale_tpu.nn.layers import BN_MOMENTUM
    from joshupscale_tpu.training.trainer import device_normalize

    cfg = yaml.safe_load(open(args.config))
    mcfg = cfg["models"]
    if "frvsr" not in mcfg:
        mcfg = dict(mcfg)
        mcfg["frvsr"] = {"name": "frvsr", "flow": {"model": "flow"},
                         "generator": {"model": "generator"}}
    # Weight bootstraps in the config would double-load; strip them.
    for v in mcfg.values():
        if isinstance(v, dict):
            v.pop("weights", None)
    models = create_models(mcfg, seed=0)
    trainer = models["frvsr"].obj
    init_params = models["frvsr"].params

    flat = dict(np.load(args.checkpoint))
    prefix = "gen_params." if any(
        k.startswith("gen_params.") for k in flat) else "params."
    sub = {k[len(prefix):]: v for k, v in flat.items()
           if k.startswith(prefix)}
    params = unflatten_into(init_params, sub)

    ds = create_train_dataset(cfg["train_dataset"], args.batch_size)
    it = iter(ds)

    def bn_updates(params, batch, rng):
        y = trainer.forward(params, batch["input"], batch["target"],
                            rng, training=True)
        return y["bn_updates"]

    fwd = jax.jit(bn_updates)
    key = jax.random.PRNGKey(0)
    acc = {}
    for i in range(args.batches):
        batch = device_normalize(next(it))
        upd = jax.device_get(fwd(params, batch, jax.random.fold_in(key, i)))
        for path, stats in upd.items():
            if "moving_mean" not in stats:
                continue  # fade-in counters etc.
            # Implied batch stat: upd = old * m + batch * (1 - m).
            node = params
            for part in path.split("."):
                node = node[part]
            for stat in ("moving_mean", "moving_variance"):
                old = np.asarray(node[stat], np.float64)
                batch_stat = (np.asarray(stats[stat], np.float64)
                              - old * BN_MOMENTUM) / (1.0 - BN_MOMENTUM)
                acc.setdefault(path, {}).setdefault(stat, []).append(
                    batch_stat)
        print(f"\rbatch {i + 1}/{args.batches}", end="", flush=True)
    print()

    n_set = 0
    for path, stats in acc.items():
        for stat, vals in stats.items():
            key_full = f"{prefix}{path}.{stat}"
            if key_full not in flat:
                raise SystemExit(f"checkpoint missing {key_full}")
            flat[key_full] = np.mean(vals, axis=0).astype(
                flat[key_full].dtype)
            n_set += 1
    out = args.out or args.checkpoint.replace(".npz", "_bncal.npz")
    np.savez(out, **flat)
    print(f"recalibrated {n_set} moving-stat arrays "
          f"({len(acc)} BN layers) -> {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
