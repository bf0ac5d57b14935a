#!/usr/bin/env python3
"""Generate int8 activation-calibration ranges from real frames.

The analog of reference ``onnx/generate_calibration.py`` (:93-233):
streams LR frame sequences through the recurrent model with correct
state alignment, records each conv input's absmax (optionally a
percentile, the reference's Percentile calibrator), and writes the
ranges JSON that both int8 deployment doors consume:

- the engine tier: ``quantize_params_int8(params, ranges=...)``
- the ONNX QDQ door: ``export_onnx(..., int8_ranges=...)``

Usage:
    python tools/generate_calibration.py checkpoints/x/latest.npz \
        --out ranges.json [--data data] [--percentile 99.9] [--cpu]
    python tools/generate_calibration.py export/pkg --package ...
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("weights", help="train-state .npz, package dir, or "
                    "'random'")
    ap.add_argument("--out", required=True, help="ranges JSON path")
    ap.add_argument("--data", default="data")
    ap.add_argument("--sequences", type=int, default=4,
                    help="number of val sequences to stream")
    ap.add_argument("--percentile", type=float, default=100.0)
    ap.add_argument("--method", choices=("minmax", "percentile",
                                         "entropy"), default=None,
                    help="calibrator (reference generate_calibration"
                         ".py:22-26 offers the same three); default: "
                         "minmax, or percentile when --percentile<100")
    ap.add_argument("--gan", action="store_true")
    ap.add_argument("--package", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--arch", choices=("quality", "fast"),
                    default="quality")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from joshupscale_tpu.export.quantize import calibrate
    from tools.eval_synth import load_sequences

    lr, _ = load_sequences(args.data)
    lr = lr[: args.sequences]
    n_seq, t, h, w, _ = lr.shape

    if args.package:
        from joshupscale_tpu.export.package import load_package

        model, params = load_package(args.weights)
        import dataclasses

        model = dataclasses.replace(model, frame_height=h,
                                    frame_width=w)
    else:
        from joshupscale_tpu.models import create_models

        arch = {"quality": ((64, 10), (64, 24)),
                "fast": ((32, 6), (48, 12))}[args.arch]
        config = {
            "flow": {"name": "flow-resnet", "num_inputs": 4,
                     "num_filters": arch[0][0],
                     "num_res_blocks": arch[0][1]},
            "generator": {"name": "generator-resnet",
                          "num_filters": arch[1][0],
                          "num_res_blocks": arch[1][1]},
            "inference": {"name": "inference",
                          "generator": {"model": "generator"},
                          "flow": {"model": "flow"},
                          "skip_processing": False,
                          "frame_height": h, "frame_width": w},
        }
        built = create_models(config, seed=0)["inference"]
        model, params = built.obj, built.params
        if args.weights != "random":
            from joshupscale_tpu.export.importer import (
                load_trained_params,
            )

            params = load_trained_params(args.weights, params)

    clip = jnp.asarray(np.transpose(lr, (1, 0, 2, 3, 4)))
    ranges = calibrate(model, params, clip,
                       percentile=args.percentile, method=args.method)
    with open(args.out, "w") as f:
        json.dump({k: float(v) for k, v in ranges.items()}, f,
                  indent=1, sort_keys=True)
    print(f"wrote {len(ranges)} activation ranges to {args.out} "
          f"(streamed {n_seq}x{t} frames at {w}x{h}, "
          f"method {args.method or 'auto'}, "
          f"percentile {args.percentile})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
