#!/usr/bin/env python3
"""Generate a structured synthetic video dataset for training proofs.

The reference trains on real PSP/PS2 footage that is not in the
checkout, so learning-dynamics evidence needs structured video with
real spatial content and temporal coherence.  This tool renders
10-frame sequences by smoothly panning/zooming subpixel windows over a
source image (default: the reference's own sample output frame,
/root/reference/docs/img_output.png -- game footage with HUD text,
edges, and textures), in the exact LR/HR layout the data pipeline's
``LocalDatasetOp`` consumes (reference dataset.py:71-114 semantics):

- HR frames: ``hr/seq_SSSS_f_F.png`` crops of size ``--hr-size``
- LR frames: ``lr/...`` nearest x4 downscales of the HR frames
  (the reference's ParseSingleExampleOp builds LR the same way,
  dataset.py:206-226 -- nearest, not area, so the model learns real
  aliasing)

Motion model per sequence: constant subpixel velocity in [-3, 3] px/f
(HR scale) plus a mild zoom drift, sampled per sequence; bilinear
resampling keeps motion subpixel-smooth so the flow net has real
temporal structure to learn.

Usage:
    python tools/make_synth_dataset.py data/ --train 200 --val 20
"""

import argparse
import os

import cv2
import numpy as np

DEF_SOURCE = "/root/reference/docs/img_output.png"


def render_sequence(src: np.ndarray, rng: np.random.Generator,
                    hr_size, frames: int = 10):
    """List of `frames` HR crops following a smooth pan/zoom path.

    ``hr_size``: int (square) or (height, width) -- windows larger than
    the source sample reflected borders, which keeps real structure for
    full-serving-resolution clips (tools/eval_serving_fullres.py).
    """
    hr_h, hr_w = ((hr_size, hr_size) if isinstance(hr_size, int)
                  else hr_size)
    h, w = src.shape[:2]
    margin_x = min(hr_w + 64, w // 2 - 8)
    margin_y = min(hr_h + 64, h // 2 - 8)
    cx = rng.uniform(margin_x, w - margin_x)
    cy = rng.uniform(margin_y, h - margin_y)
    vx = rng.uniform(-3.0, 3.0)
    vy = rng.uniform(-3.0, 3.0)
    zoom0 = rng.uniform(0.8, 1.2)
    dzoom = rng.uniform(-0.01, 0.01)
    out = []
    for t in range(frames):
        zoom = zoom0 + dzoom * t
        # Affine: sample an (hr_w, hr_h) window centered at
        # (cx+vx*t, cy+vy*t) scaled by zoom (subpixel -- bilinear).
        tx = cx + vx * t
        ty = cy + vy * t
        m = np.array(
            [[zoom, 0, tx - zoom * hr_w / 2],
             [0, zoom, ty - zoom * hr_h / 2]], np.float32)
        frame = cv2.warpAffine(
            src, m, (hr_w, hr_h),
            flags=cv2.INTER_LINEAR | cv2.WARP_INVERSE_MAP,
            borderMode=cv2.BORDER_REFLECT)
        out.append(frame)
    return out


def write_split(src, out_dir, split, count, hr_size, seed):
    rng = np.random.default_rng(seed)
    hr_dir = os.path.join(out_dir, split, "hr")
    lr_dir = os.path.join(out_dir, split, "lr")
    os.makedirs(hr_dir, exist_ok=True)
    os.makedirs(lr_dir, exist_ok=True)
    lr_size = hr_size // 4
    for s in range(count):
        for f, hr in enumerate(render_sequence(src, rng, hr_size)):
            # Nearest x4 downscale (reference ParseSingleExampleOp).
            lr = hr[::4, ::4]
            assert lr.shape[:2] == (lr_size, lr_size)
            name = f"seq_{s:04d}_f_{f}.png"
            cv2.imwrite(os.path.join(hr_dir, name), hr)
            cv2.imwrite(os.path.join(lr_dir, name), lr)
    print(f"{split}: {count} sequences ({count * 10} frames) at "
          f"{lr_size}->{hr_size}")


def write_tfrecords(src, out_dir, split, count, hr_size, seed):
    """Pair-example TFRecord split (reference dataset.py:194-204 layout:
    tf.train.Example with 10 'input' + 10 'target' encoded PNGs).

    PNGs decode to RGB via decode_image, so configs consuming these
    should include RgbToBgrOp to match LocalDatasetOp's cv2 BGR order
    (the reference's own tfrecord configs do the same).
    """
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from joshupscale_tpu.data.tfrecord import encode_example, write_records

    rng = np.random.default_rng(seed)
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, f"{split}.tfrecords")

    def png(img):
        ok, buf = cv2.imencode(".png", img)
        assert ok
        return buf.tobytes()

    def examples():
        for _ in range(count):
            hrs = render_sequence(src, rng, hr_size)
            yield encode_example({
                "input": [png(h[::4, ::4]) for h in hrs],
                "target": [png(h) for h in hrs],
            })

    n = write_records(path, examples())
    print(f"{split}: {n} pair examples -> {path}")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("out_dir")
    ap.add_argument("--source", default=DEF_SOURCE)
    ap.add_argument("--train", type=int, default=200)
    ap.add_argument("--val", type=int, default=20)
    ap.add_argument("--hr-size", type=int, default=192)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--format", choices=("png", "tfrecords"),
                    default="png",
                    help="png: LocalDatasetOp file layout; tfrecords: "
                         "pair-example TFRecords (the reference's real "
                         "training input format)")
    args = ap.parse_args()

    src = cv2.imread(args.source, cv2.IMREAD_COLOR)
    if src is None:
        raise SystemExit(f"cannot read source image {args.source}")
    print(f"source {args.source}: {src.shape}")
    writer = write_split if args.format == "png" else write_tfrecords
    writer(src, args.out_dir, "train", args.train, args.hr_size,
           args.seed)
    writer(src, args.out_dir, "val", args.val, args.hr_size,
           args.seed + 1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
