#!/usr/bin/env python3
"""Upscale a sorted image sequence through a model package.

The analog of the reference's user-facing runner
(``scripts/inference/tensorrt/inference.py``: sorted image globs ->
recurrent engine -> PNG per frame -> average seconds/frame log;
``scripts/inference/onnx/inference.py`` is the same loop over
onnxruntime).  The recurrent state carries ACROSS images -- the
workflow is video-as-frames, so frame order matters and ``--reset``
only happens at startup.

Usage:
  python tools/upscale_images.py -p <package_dir> -o <out_dir> \
      [--cpu] [--onnx model.onnx] <glob|dir|file>...

``--onnx`` runs the exported ONNX artifact through the in-repo
interpreter instead of the XLA engine (the reference's onnx runner
analog; slow, verification-oriented).

Images are read/written BGR (cv2 convention, matching the reference's
BGR pipeline end to end).
"""

import argparse
import os
import sys
import time
from glob import glob

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def list_images(image_paths):
    """Recursive glob expansion (reference inference.py:196-204)."""
    for path in image_paths:
        for filename in glob(path, recursive=True):
            if os.path.isdir(filename):
                yield from list_images([os.path.join(filename, "*")])
            else:
                yield filename


def main() -> int:
    ap = argparse.ArgumentParser(
        description="Upscale an image sequence (recurrent)")
    ap.add_argument("-p", "--package", required=True,
                    help="model package directory (export.package)")
    ap.add_argument("-o", "--output-dir", required=True)
    ap.add_argument("--onnx", default=None,
                    help="run this exported .onnx via the interpreter "
                         "instead of the XLA engine")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (default: the "
                         "platform default, TPU where available)")
    ap.add_argument("image_paths", nargs="+")
    args = ap.parse_args()

    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
        os.environ.pop("PALLAS_AXON_POOL_IPS", None)
        import jax

        jax.config.update("jax_platforms", "cpu")

    import cv2
    import numpy as np

    os.makedirs(args.output_dir, exist_ok=True)
    files = sorted(list_images(args.image_paths))
    if not files:
        print("no input images matched", file=sys.stderr)
        return 1

    if args.onnx:
        from joshupscale_tpu.export.onnx_interp import OnnxClipRunner

        probe = cv2.imread(files[0], cv2.IMREAD_COLOR)
        assert probe is not None, files[0]
        runner = OnnxClipRunner(args.onnx, probe.shape[0],
                                probe.shape[1])
        process = runner.process
    else:
        from joshupscale_tpu.runtime.engine import create_runtime

        eng = create_runtime(args.package)
        process = eng.process

    num, total = 0, 0.0
    for path in files:
        img = cv2.imread(path, cv2.IMREAD_COLOR)
        assert img is not None, f"Could not open image: {path}"
        start = time.time()
        out = np.asarray(process(img))
        total += time.time() - start
        num += 1
        name = os.path.splitext(os.path.basename(path))[0]
        out_path = os.path.join(args.output_dir, f"{name}.png")
        assert cv2.imwrite(out_path, out), out_path
    # Reference inference.py:245-251 prints the same average; on a
    # tunneled device this is end-to-end latency including host RTT
    # (use Engine.benchmark for on-chip numbers).
    print(f"processed {num} images, average time: {total / num:f}s")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
