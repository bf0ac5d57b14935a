#!/usr/bin/env python3
"""Held-out PSNR evaluation: trained model vs bilinear x4 baseline.

The "does the trainer actually learn" metric (round-2 VERDICT): run the
inference model over held-out synthetic val sequences
(tools/make_synth_dataset.py) and report mean PSNR of

- the model's recurrent output vs ground-truth HR, and
- TF1-bilinear x4 upscaling of the LR input (the no-learning baseline),

both over the last 8 frames of each 10-frame sequence (the first two
frames warm the recurrent state).  A trained FRVSR must clear the
bilinear baseline by a wide margin; random weights land well below it.

Usage:
    python tools/eval_synth.py checkpoints/frvsr/best.npz [--gan]
    python tools/eval_synth.py export/frvsr/package --package
"""

import argparse
import glob
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def load_sequences(data_dir: str):
    lr_files = sorted(glob.glob(os.path.join(data_dir, "val/lr/*.png")))
    hr_files = sorted(glob.glob(os.path.join(data_dir, "val/hr/*.png")))
    assert lr_files and len(lr_files) == len(hr_files)
    import cv2

    lr = np.stack([cv2.imread(p, cv2.IMREAD_COLOR) for p in lr_files])
    hr = np.stack([cv2.imread(p, cv2.IMREAD_COLOR) for p in hr_files])
    # 10-frame groups.
    lr = lr.reshape(-1, 10, *lr.shape[1:])
    hr = hr.reshape(-1, 10, *hr.shape[1:])
    return lr, hr


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) / 255.0
                   - b.astype(np.float64) / 255.0) ** 2)
    return float(-10.0 * np.log10(mse))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("weights", help="train-state .npz checkpoint or "
                    "model package dir")
    ap.add_argument("--data", default="data")
    ap.add_argument("--gan", action="store_true",
                    help="checkpoint is a GAN state (gen_params)")
    ap.add_argument("--package", action="store_true")
    ap.add_argument("--cpu", action="store_true",
                    help="run on CPU (leave the TPU to a training job)")
    ap.add_argument("--f32", action="store_true",
                    help="evaluate with float32 compute (isolates "
                    "learning quality from bf16 serving noise in the "
                    "recurrent feedback)")
    ap.add_argument("--zero-init", action="store_true",
                    help="build with zero_init_tail (untrained model "
                    "== bilinear/identity-warp baseline; eval-contract "
                    "sanity check, expect margin ~0)")
    ap.add_argument("--arch", choices=("quality", "fast"),
                    default="quality",
                    help="architecture the checkpoint was trained with "
                    "(quality: 64f/10rb + 64f/24rb; fast: 32f/6rb + "
                    "48f/12rb, configs/inference_fast.yaml)")
    ap.add_argument("--int8", action="store_true",
                    help="serve the weights through the int8 engine "
                    "(per-channel symmetric weight quantization, "
                    "export/quantize.py) -- measures the quality cost "
                    "of the int8 tier on learned weights")
    ap.add_argument("--calibrate", action="store_true",
                    help="with --int8: calibrate static activation "
                    "scales on the first val sequence first")
    ap.add_argument("--u8-state", action="store_true",
                    help="serve with the uint8 recurrent-state tier")
    ap.add_argument("--save-png", metavar="PATH",
                    help="write a side-by-side strip (bilinear x4 | "
                    "model | ground truth, last frame of the first 3 "
                    "val sequences) to PATH")
    ap.add_argument("--perceptual", action="store_true",
                    help="also report VGG feature cosine distance vs "
                    "ground truth (same net + layers as the GAN's "
                    "perceptual loss, seed 0) -- the quality axis "
                    "PSNR under-credits the adversarial stage on")
    ap.add_argument("--pingpong", action="store_true",
                    help="also report ping-pong temporal inconsistency "
                    "(forward vs backward pass L1 over the ping-pong "
                    "clip, the reference's own temporal criterion, "
                    "keras_models.py:518-523)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        # sitecustomize pre-imports jax pinned to the TPU platform; the
        # config update after import is the only working override.
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from joshupscale_tpu.models import create_models
    from joshupscale_tpu.ops import upscale_bilinear
    from joshupscale_tpu.runtime.engine import Engine

    lr, hr = load_sequences(args.data)
    n_seq, t, h, w, _ = lr.shape
    print(f"val: {n_seq} sequences of {t} frames, {w}x{h} -> "
          f"{w * 4}x{h * 4}")

    if args.package:
        # The package branch serves the package exactly as exported;
        # tier flags would be SILENTLY ignored and the printed numbers
        # misattributed to the requested tier.
        ignored = [flag for flag, on in (
            ("--int8", args.int8), ("--calibrate", bool(args.calibrate)),
            ("--u8-state", args.u8_state), ("--f32", args.f32),
            ("--zero-init", args.zero_init),
        ) if on]
        if ignored:
            raise SystemExit(
                f"--package serves the package as exported; "
                f"{' '.join(ignored)} would be ignored -- bake the "
                f"tier into the package instead")
        from joshupscale_tpu.runtime.engine import create_runtime

        eng = create_runtime(args.weights, batch_size=n_seq,
                             frame_size=(h, w))
        model = eng.model
    else:
        arch = {
            "quality": ((64, 10), (64, 24)),
            "fast": ((32, 6), (48, 12)),
        }[args.arch]
        config = {
            "flow": {"name": "flow-resnet", "num_inputs": 4,
                     "num_filters": arch[0][0],
                     "num_res_blocks": arch[0][1],
                     "zero_init_tail": args.zero_init},
            "generator": {"name": "generator-resnet",
                          "num_filters": arch[1][0],
                          "num_res_blocks": arch[1][1],
                          "zero_init_tail": args.zero_init},
            "inference": {"name": "inference",
                          "generator": {"model": "generator"},
                          "flow": {"model": "flow"},
                          "skip_processing": False,
                          "frame_height": h, "frame_width": w,
                          "u8_state": args.u8_state,
                          "compute_dtype":
                              "float32" if args.f32 else "bfloat16"},
        }
        models = create_models(config, seed=0)
        built = models["inference"]
        params = built.params
        if args.weights != "random":
            from joshupscale_tpu.export.importer import (
                load_trained_params,
            )

            # Auto-detects raw / TrainState / GANTrainState layouts
            # (--gan kept for CLI compatibility; no longer needed).
            params = load_trained_params(args.weights, params)
        if args.int8:
            from joshupscale_tpu.export.quantize import (
                calibrate,
                quantize_params_int8,
            )

            ranges = None
            if args.calibrate:
                cal = np.transpose(lr[:1], (1, 0, 2, 3, 4))
                ranges = calibrate(built.obj, params, cal)
                print(f"calibrated {len(ranges)} conv activation scales")
            params = quantize_params_int8(params, ranges=ranges)
        model = built.obj
        eng = Engine(model, params, batch_size=n_seq)

    # Stream each sequence through the recurrent engine (frames are BGR
    # uint8, the serving contract).
    clip = np.transpose(lr, (1, 0, 2, 3, 4))  # (T, N, H, W, 3)
    outs = eng.process_clip(clip)  # (T, N, 4H, 4W, 3) u8
    outs = np.transpose(outs, (1, 0, 2, 3, 4))

    # Bilinear x4 baseline (TF1 semantics, same as the generator skip).
    lr_norm = lr.reshape(-1, h, w, 3).astype(np.float32) / 255.0 - 0.5
    up = np.asarray(upscale_bilinear(jnp.asarray(lr_norm), 4))
    up_u8 = np.clip((up + 0.5) * 255.0, 0, 255).astype(np.uint8)
    up_u8 = up_u8.reshape(n_seq, t, h * 4, w * 4, 3)

    # Skip 2 warm-up frames (zero-state start).
    sl = slice(2, None)
    p_model = psnr(outs[:, sl], hr[:, sl])
    p_bilinear = psnr(up_u8[:, sl], hr[:, sl])
    print(f"model    PSNR: {p_model:.2f} dB")
    print(f"bilinear PSNR: {p_bilinear:.2f} dB")
    print(f"margin: {p_model - p_bilinear:+.2f} dB")

    if args.perceptual:
        # Same fixed net the GAN perceptual loss trains against (the
        # "vgg" registry model at seed 0 = fixed random features until
        # ImageNet weights appear in the image; the comparison BETWEEN
        # checkpoints is what matters).  Lower = closer to GT.
        from joshupscale_tpu.training.losses import vgg_cosine_loss

        vgg = create_models({"vgg": {"name": "vgg"}}, seed=0)["vgg"]

        # Jitted ONCE at this scope: defining it inside vgg_dist would
        # miss jax.jit's cache on the second call (fresh function
        # object) and re-trace/compile the whole VGG forward.
        @jax.jit
        def one(a, b):
            fa = vgg.apply(vgg.params, a)
            fb = vgg.apply(vgg.params, b)
            return vgg_cosine_loss(fb, fa)

        def vgg_dist(pred_u8, ref_u8):
            total = 0.0
            frames_nt = pred_u8.reshape(-1, *pred_u8.shape[2:])
            refs_nt = ref_u8.reshape(-1, *ref_u8.shape[2:])
            chunk = 8
            n = frames_nt.shape[0]
            for i in range(0, n, chunk):
                a = frames_nt[i:i + chunk].astype(np.float32) / 255 - .5
                b = refs_nt[i:i + chunk].astype(np.float32) / 255 - .5
                total += float(one(jnp.asarray(a), jnp.asarray(b))) \
                    * a.shape[0]
            return total / n

        v_model = vgg_dist(outs[:, sl], hr[:, sl])
        v_bilinear = vgg_dist(up_u8[:, sl], hr[:, sl])
        print(f"model    VGG cosine distance: {v_model:.4f}")
        print(f"bilinear VGG cosine distance: {v_bilinear:.4f}")
        print(f"perceptual margin: {(v_bilinear - v_model) / v_bilinear:+.1%}"
              " (lower distance is better)")

    if args.pingpong:
        # Reference temporal criterion: append the reversed clip and
        # compare the forward pass at frame t with the backward pass at
        # the same content frame (positions 2T-2-t).  A temporally
        # consistent model produces the same frame either way; drift
        # and flicker show up as L1 that PSNR cannot see.
        eng.reset()
        pp_clip = np.concatenate([clip, clip[-2::-1]], axis=0)
        pp_outs = eng.process_clip(pp_clip)  # (2T-1, N, 4H, 4W, 3)
        fwd = pp_outs[:t]
        inconsist = []
        for ti in range(2, t - 1):  # skip warm-up; t-1 is shared apex
            back = pp_outs[2 * t - 2 - ti]
            inconsist.append(np.mean(np.abs(
                fwd[ti].astype(np.float32) - back.astype(np.float32))))
        pp_l1 = float(np.mean(inconsist))
        print(f"ping-pong inconsistency: {pp_l1:.3f} u8 steps "
              f"(mean L1, frames 2..{t - 2} vs backward pass)")

    if args.save_png:
        import cv2

        rows = []
        for i in range(min(3, n_seq)):
            rows.append(np.concatenate(
                [up_u8[i, -1], outs[i, -1], hr[i, -1]], axis=1))
        strip = np.concatenate(rows, axis=0)
        cv2.imwrite(args.save_png, strip)
        print(f"wrote {args.save_png} "
              f"({strip.shape[1]}x{strip.shape[0]})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
