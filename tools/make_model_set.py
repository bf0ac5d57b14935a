#!/usr/bin/env python3
"""Lay out the 4-model OBS data directory from tier configs.

The reference ships its OBS plugin with four prebuilt engines in the
module data dir -- model_{psp,ps2}[_fast].trt (reference
obs_plugin/src/filter.cc:133-152) plus the PS2 HUD mask
(obs_plugin/data/mask.png).  Our shim loads the same four names as
serving-package DIRECTORIES (native/plugins/obs/filter.cc kModels)
produced by joshupscale_tpu.export.package.  This tool builds that
layout end to end:

    <out>/
      model_psp/        <- configs/inference_quality.yaml
      model_psp_fast/   <- configs/inference_fast.yaml
      model_ps2/        <- configs/inference_ps2_style.yaml
      model_ps2_fast/   <- configs/inference_ps2_fast.yaml
      mask.png          <- native/plugins/obs/data/mask.png

Each package carries model.yaml + params.npz (the Python backend's
inputs) and, with --stablehlo (default), the Python-free PJRT serving
artifacts (step.mlir / step_spec.txt / state_init.bin /
compile_options.pb) so the native runtime serves it without Python.

Usage:
    python tools/make_model_set.py --out dist/joshupscale-data
    python tools/make_model_set.py --out d --weights \
        model_psp=checkpoints/gan/best.npz
    python tools/make_model_set.py --out d --config model_psp=tiny.yaml \
        --models model_psp --no-stablehlo   # subset / tests
"""

import argparse
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

MODEL_CONFIGS = {
    "model_psp": "configs/inference_quality.yaml",
    "model_psp_fast": "configs/inference_fast.yaml",
    "model_ps2": "configs/inference_ps2_style.yaml",
    "model_ps2_fast": "configs/inference_ps2_fast.yaml",
}

MASK = os.path.join(REPO, "native", "plugins", "obs", "data",
                    "mask.png")


def _parse_overrides(pairs, what):
    out = {}
    for pair in pairs or []:
        if "=" not in pair:
            raise SystemExit(f"--{what} wants model=path, got: {pair}")
        name, path = pair.split("=", 1)
        if name not in MODEL_CONFIGS:
            raise SystemExit(
                f"unknown model {name!r}; one of {sorted(MODEL_CONFIGS)}")
        out[name] = path
    return out


def build_model_set(out, models=None, configs=None, weights=None,
                    stablehlo=True, seed=0):
    """Export the requested packages + mask into ``out``.

    Returns the list of package directories written.
    """
    import yaml

    from joshupscale_tpu.export.package import save_package
    from joshupscale_tpu.models import create_models

    configs = configs or {}
    weights = weights or {}
    os.makedirs(out, exist_ok=True)
    written = []
    for name in models or sorted(MODEL_CONFIGS):
        cfg_path = configs.get(
            name, os.path.join(REPO, MODEL_CONFIGS[name]))
        with open(cfg_path) as f:
            doc = yaml.safe_load(f)
        config = doc["models"] if "models" in doc else doc
        if name in weights:
            from joshupscale_tpu.export.importer import (
                detect_checkpoint_prefix,
            )

            # fit() checkpoints are flattened train STATES (TrainState
            # under 'params.', GANTrainState under 'gen_params.'); a
            # bare path would miss every key.  Auto-detect so
            # `--weights model_psp=checkpoints/gan/best.npz` works on
            # all three checkpoint layouts.
            prefix = detect_checkpoint_prefix(weights[name])
            entry = dict(config["inference"])
            entry["weights"] = (
                {"path": weights[name], "prefix": prefix}
                if prefix else weights[name])
            config = dict(config, inference=entry)
        print(f"[{name}] building from {cfg_path}"
              + (f" + weights {weights[name]}" if name in weights
                 else " (random init)"), flush=True)
        built = create_models(config, seed=seed)["inference"]
        path = os.path.join(out, name)
        save_package(path, config, built, export_stablehlo=stablehlo)
        written.append(path)
    if os.path.exists(MASK):
        shutil.copyfile(MASK, os.path.join(out, "mask.png"))
    else:  # pragma: no cover - repo always ships the mask
        print("warning: HUD mask missing, layout is PS2-incomplete",
              file=sys.stderr)
    return written


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True,
                    help="module data dir to create")
    ap.add_argument("--models", nargs="*", choices=sorted(MODEL_CONFIGS),
                    help="subset to build (default: all four)")
    ap.add_argument("--config", action="append", metavar="MODEL=YAML",
                    help="override a tier's config file")
    ap.add_argument("--weights", action="append", metavar="MODEL=NPZ",
                    help="checkpoint for a tier (default random init)")
    ap.add_argument("--no-stablehlo", action="store_true",
                    help="skip the Python-free PJRT artifacts")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--cpu", action="store_true",
                    help="pin the CPU backend (export only traces; no "
                         "TPU needed)")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    written = build_model_set(
        args.out,
        models=args.models,
        configs=_parse_overrides(args.config, "config"),
        weights=_parse_overrides(args.weights, "weights"),
        stablehlo=not args.no_stablehlo,
        seed=args.seed,
    )
    print(f"wrote {len(written)} package(s) under {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
