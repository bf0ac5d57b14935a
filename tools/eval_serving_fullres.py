#!/usr/bin/env python3
"""Serve learned weights at the production shape and measure quality.

The learning proof (tools/eval_synth.py) runs at training crops; this
tool closes the remaining gap to production: the SAME trained quality
weights (fully-convolutional, so they transfer to any frame size)
serving a structured synthetic clip at the reference's real workload
shape -- 480x270 -> 1920x1080 (reference README.md:3,
core/src/tensorrt_backend.cc:27) -- through the real engine path
(uint8 frames, bf16 compute, s2d fast path), reporting PSNR vs the
bilinear-x4 no-model baseline.

Usage:
    python tools/eval_serving_fullres.py checkpoints/gan/latest.npz --gan
    python tools/eval_serving_fullres.py export/gan/package --package
"""

import argparse
import os
import sys

import cv2
import numpy as np

# Repo root for the package import AND tools/ for the sibling script:
# module-mode execution (python -m tools....) has no implicit
# script-dir sys.path entry.
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from make_synth_dataset import DEF_SOURCE, render_sequence  # noqa: E402


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) / 255.0
                   - b.astype(np.float64) / 255.0) ** 2)
    return float(-10.0 * np.log10(mse))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("weights", help="train-state .npz checkpoint or "
                    "model package dir")
    ap.add_argument("--gan", action="store_true",
                    help="checkpoint is a GAN state (gen_params)")
    ap.add_argument("--package", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--source", default=DEF_SOURCE)
    ap.add_argument("--frames", type=int, default=30)
    ap.add_argument("--height", type=int, default=270)
    ap.add_argument("--width", type=int, default=480)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--save-png", metavar="PATH",
                    help="write bilinear | model | ground-truth strip "
                    "of the last frame's center 480x480 window")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from joshupscale_tpu.ops import upscale_bilinear
    from joshupscale_tpu.runtime.engine import Engine

    src = cv2.imread(args.source, cv2.IMREAD_COLOR)
    if src is None:
        raise SystemExit(f"cannot read source image {args.source}")
    rng = np.random.default_rng(args.seed)
    hr = np.stack(render_sequence(
        src, rng, (args.height * 4, args.width * 4), frames=args.frames))
    lr = hr[:, ::4, ::4]  # nearest x1/4, the training-data convention
    print(f"clip: {args.frames} frames {args.width}x{args.height} -> "
          f"{args.width * 4}x{args.height * 4}")

    if args.package:
        from joshupscale_tpu.runtime.engine import create_runtime

        eng = create_runtime(args.weights,
                             frame_size=(args.height, args.width))
    else:
        from joshupscale_tpu.models import create_models

        config = {
            "flow": {"name": "flow-resnet", "num_inputs": 4,
                     "num_filters": 64, "num_res_blocks": 10},
            "generator": {"name": "generator-resnet", "num_filters": 64,
                          "num_res_blocks": 24},
            "inference": {"name": "inference",
                          "generator": {"model": "generator"},
                          "flow": {"model": "flow"},
                          "skip_processing": False,
                          "frame_height": args.height,
                          "frame_width": args.width,
                          "compute_dtype": "bfloat16"},
        }
        built = create_models(config, seed=0)["inference"]
        from joshupscale_tpu.export.importer import load_trained_params

        params = load_trained_params(args.weights, built.params)
        eng = Engine(built.obj, params)

    outs = eng.process_clip(lr[:, None])[:, 0]  # (T, 4H, 4W, 3) u8

    lr_norm = lr.astype(np.float32) / 255.0 - 0.5
    up = np.asarray(upscale_bilinear(jnp.asarray(lr_norm), 4))
    up_u8 = np.clip((up + 0.5) * 255.0, 0, 255).astype(np.uint8)

    sl = slice(2, None)  # zero-state warm-up
    p_model = psnr(outs[sl], hr[sl])
    p_bilinear = psnr(up_u8[sl], hr[sl])
    print(f"model    PSNR: {p_model:.2f} dB")
    print(f"bilinear PSNR: {p_bilinear:.2f} dB")
    print(f"margin: {p_model - p_bilinear:+.2f} dB")

    if args.save_png:
        ch, cw = args.height * 2, args.width * 2
        y0, x0 = ch - 240, cw - 240
        win = (slice(y0, y0 + 480), slice(x0, x0 + 480))
        strip = np.concatenate(
            [up_u8[-1][win], outs[-1][win], hr[-1][win]], axis=1)
        cv2.imwrite(args.save_png, strip)
        print(f"wrote {args.save_png}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
