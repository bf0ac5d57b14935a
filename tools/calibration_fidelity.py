#!/usr/bin/env python3
"""Compare int8 calibration methods: minmax vs percentile vs entropy.

The reference offers three activation-range calibrators
(onnx/generate_calibration.py:22-26) but never records which one its
int8 engines should use.  This tool closes that loop for the TPU int8
tier: calibrate the same learned weights with each method on held-out
calibration sequences, serve a recurrent clip through each int8 engine,
and report per-frame u8-step error vs the bf16 engine (the deployment
fidelity axis) plus held-out PSNR vs ground truth (the quality axis).

Calibration uses the FIRST ``--cal-sequences`` val sequences; fidelity
and PSNR are measured on the REMAINING sequences, so the table reflects
generalizing ranges, not ranges fit to the eval clip.

Usage:
    python tools/calibration_fidelity.py \
        checkpoints/frvsr_learn10/latest.npz [--cpu] [--gan]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def u8_stats(a: np.ndarray, b: np.ndarray):
    d = np.abs(a.astype(np.int32) - b.astype(np.int32))
    return float(d.mean()), int(np.percentile(d, 99)), int(d.max())


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("weights", help="train-state .npz checkpoint")
    ap.add_argument("--data", default="data")
    ap.add_argument("--cal-sequences", type=int, default=4)
    ap.add_argument("--percentile", type=float, default=99.9)
    ap.add_argument("--gan", action="store_true",
                    help="checkpoint is a GAN state (gen_params)")
    ap.add_argument("--arch", choices=("quality", "fast"),
                    default="quality")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from joshupscale_tpu.export.quantize import (
        calibrate,
        quantize_params_int8,
    )
    from joshupscale_tpu.models import create_models
    from joshupscale_tpu.runtime.engine import Engine
    from tools.eval_synth import load_sequences, psnr

    lr, hr = load_sequences(args.data)
    n_seq, t, h, w, _ = lr.shape
    n_cal = args.cal_sequences
    assert 0 < n_cal < n_seq
    cal_clip = jnp.asarray(np.transpose(lr[:n_cal], (1, 0, 2, 3, 4)))
    eval_lr, eval_hr = lr[n_cal:], hr[n_cal:]
    n_eval = eval_lr.shape[0]
    eval_clip = np.transpose(eval_lr, (1, 0, 2, 3, 4))
    print(f"calibrate on {n_cal} sequences, evaluate on {n_eval} "
          f"({t} frames, {w}x{h} -> {w * 4}x{h * 4})")

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
                      "frame_height": h, "frame_width": w,
                      "compute_dtype": "bfloat16"},
    }
    built = create_models(config, seed=0)["inference"]
    model, params = built.obj, built.params
    from joshupscale_tpu.export.importer import load_trained_params

    params = load_trained_params(args.weights, params)

    # The fidelity reference: the bf16 engine on the same clip.
    ref_outs = Engine(model, params,
                      batch_size=n_eval).process_clip(eval_clip)
    sl = slice(2, None)  # skip zero-state warm-up frames
    p_ref = psnr(np.transpose(ref_outs, (1, 0, 2, 3, 4))[:, sl],
                 eval_hr[:, sl])
    print(f"bf16 engine held-out PSNR: {p_ref:.2f} dB")

    methods = [("minmax", 100.0), ("percentile", args.percentile),
               ("entropy", 100.0)]
    rows = []
    for method, pct in methods:
        ranges = calibrate(model, params, cal_clip,
                           percentile=pct, method=method)
        qparams = quantize_params_int8(params, ranges=ranges)
        outs = Engine(model, qparams,
                      batch_size=n_eval).process_clip(eval_clip)
        mean, p99, mx = u8_stats(outs[2:], ref_outs[2:])
        p_q = psnr(np.transpose(outs, (1, 0, 2, 3, 4))[:, sl],
                   eval_hr[:, sl])
        rows.append((method, pct, mean, p99, mx, p_q))
        print(f"{method:<10} (pct {pct:5.1f}): vs bf16 mean "
              f"{mean:.3f} / p99 {p99} / max {mx} u8 steps; "
              f"PSNR {p_q:.2f} dB ({p_q - p_ref:+.2f})")

    print()
    print("| Calibrator | u8 error vs bf16 engine (mean/p99/max) | "
          "held-out PSNR |")
    print("|---|---|---|")
    for method, pct, mean, p99, mx, p_q in rows:
        name = (f"{method} ({pct:g}%)" if method == "percentile"
                else method)
        print(f"| {name} | {mean:.3f} / {p99} / {mx} | "
              f"{p_q:.2f} dB ({p_q - p_ref:+.2f} vs bf16) |")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
