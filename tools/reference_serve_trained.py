#!/usr/bin/env python3
"""Serve OUR trained weights through the REFERENCE'S own Keras code.

The interchangeability claim, executed: weights trained by this
framework (a serving package) are exported with ``save_keras_h5``,
loaded by the reference's own model-construction code
(/root/reference/scripts/training/models.py create_models +
Keras ``load_weights(by_name=True)``), and run through the reference's
recurrent predict loop (onnx/inference.py:63-94 semantics) over
held-out sequences.  Reports:

- frame-by-frame diff: reference-run outputs vs our XLA engine serving
  the same package (must be within 1 u8 step), and
- PSNR of the reference-run outputs vs ground truth (the learned
  quality must survive the round trip into the reference stack).

CPU + TF; ~2 min at full architecture on 48x48 held-out data.

Usage:  python tools/reference_serve_trained.py export/gan_learn10/package
"""

import argparse
import glob
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
REF_TRAINING = "/root/reference/scripts/training"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("package")
    ap.add_argument("--data", default="data")
    ap.add_argument("--seqs", type=int, default=2,
                    help="how many 10-frame held-out sequences")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    import cv2
    import tensorflow as tf

    tf.config.set_visible_devices([], "GPU")

    from joshupscale_tpu.export.importer import save_keras_h5
    from joshupscale_tpu.runtime.engine import create_runtime

    lr_files = sorted(glob.glob(os.path.join(args.data, "val/lr/*.png")))
    hr_files = sorted(glob.glob(os.path.join(args.data, "val/hr/*.png")))
    n = args.seqs * 10
    assert len(lr_files) >= n
    # Frame dims come from the files (datasets are size-generic:
    # make_synth_dataset --hr-size); only the 10-frame grouping is
    # fixed by the dataset layout.
    lr_all = np.stack([cv2.imread(p, cv2.IMREAD_COLOR)
                       for p in lr_files[:n]])
    hr_all = np.stack([cv2.imread(p, cv2.IMREAD_COLOR)
                       for p in hr_files[:n]])
    lr = lr_all.reshape(args.seqs, 10, *lr_all.shape[1:])
    hr = hr_all.reshape(args.seqs, 10, *hr_all.shape[1:])
    h, w = lr.shape[2:4]

    eng = create_runtime(args.package, frame_size=(h, w))

    # Export our trained params as per-submodel .h5 (the reference's own
    # per-model `weights:` checkpoint granularity).
    flow_h5 = os.path.join(args.package, "flow_legacy.h5")
    gen_h5 = os.path.join(args.package, "generator_legacy.h5")
    save_keras_h5(flow_h5, eng.params["flow"])
    save_keras_h5(gen_h5, eng.params["generator"])

    # Build the reference's inference model with its OWN code and load
    # our weights through its OWN loader.
    sys.path.insert(0, REF_TRAINING)
    try:
        import models as ref_models
    finally:
        sys.path.remove(REF_TRAINING)

    # Infer architecture hyperparams from the param tree.
    n_flow = len([k for k in eng.params["flow"] if k.startswith("block_")])
    n_gen = len([k for k in eng.params["generator"]
                 if k.startswith("block_")])
    filters = eng.params["generator"]["conv_1"]["kernel"].shape[-1]
    print(f"arch: flow {filters}f/{n_flow}rb + generator "
          f"{filters}f/{n_gen}rb")

    m = ref_models.create_models({
        "flow": {"name": "flow-resnet", "num_inputs": 4,
                 "num_filters": int(filters), "num_res_blocks": n_flow},
        "generator": {"name": "generator-resnet",
                      "num_filters": int(filters),
                      "num_res_blocks": n_gen},
        "inference": {"name": "inference",
                      "generator_model": {"model": "generator"},
                      "flow_model": {"model": "flow"},
                      "skip_processing": False,
                      "frame_height": h, "frame_width": w},
    })
    m["flow"].load_weights(flow_h5, by_name=True)
    m["generator"].load_weights(gen_h5, by_name=True)
    inf = m["inference"]

    def psnr(a, b):
        mse = np.mean((a.astype(np.float64) / 255.0
                       - b.astype(np.float64) / 255.0) ** 2)
        return float(-10.0 * np.log10(mse))

    worst = 0
    ref_all = []
    for s in range(args.seqs):
        pre_gen = np.zeros((1, h * 4, w * 4, 3), np.float32)
        last = [np.zeros((1, h, w, 3), np.float32) for _ in range(3)]
        eng.reset()
        for t in range(10):
            o = inf(
                [tf.constant(lr[s, t][None])] + [tf.constant(pre_gen)]
                + [tf.constant(x) for x in last],
                training=False,
            )
            pre_gen = o["output_raw"].numpy()
            last = [x.numpy() for x in o["last_frames"]]
            theirs = o["output"].numpy()[0]
            ours = eng.process(lr[s, t])
            d = int(np.abs(ours.astype(int) - theirs.astype(int)).max())
            worst = max(worst, d)
            ref_all.append(theirs)
    ref_all = np.stack(ref_all).reshape(args.seqs, 10, h * 4, w * 4, 3)

    print(f"reference-run vs our engine, {args.seqs * 10} frames: "
          f"worst diff {worst} u8 step(s)")
    p = psnr(ref_all[:, 2:], hr[:, 2:])
    print(f"reference-run output PSNR vs ground truth: {p:.2f} dB")
    return 0 if worst <= 1 else 1


if __name__ == "__main__":
    raise SystemExit(main())
