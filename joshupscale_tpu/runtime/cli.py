"""Offline upscale CLI: PNG/image sequence -> upscaled sequence.

The Python analog of the reference runners
(``scripts/inference/onnx/inference.py`` /
``scripts/inference/tensorrt/inference.py``): streams frames through the
recurrent engine in order and reports average per-frame latency.

Usage:
    python -m joshupscale_tpu.runtime.cli <package> <in_dir> <out_dir>
        [--device N] [--limit K] [--compilation-cache]
"""

from __future__ import annotations

import argparse
import glob
import os
import sys
import time


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(
        description="Upscale an image sequence with a model package")
    parser.add_argument("package", help="model package directory")
    parser.add_argument("in_dir", help="directory of input frames "
                                       "(sorted by filename)")
    parser.add_argument("out_dir", help="output directory")
    parser.add_argument("--device", type=int, default=0)
    parser.add_argument("--limit", type=int, default=None)
    parser.add_argument("--compilation-cache", action="store_true",
                        help="persist compiled executables")
    args = parser.parse_args(argv)

    import cv2
    import numpy as np

    from joshupscale_tpu.runtime.engine import (
        create_runtime,
        enable_compilation_cache,
    )

    if args.compilation_cache:
        enable_compilation_cache()

    files = sorted(
        f for f in glob.glob(os.path.join(args.in_dir, "*"))
        if f.lower().endswith((".png", ".jpg", ".jpeg", ".bmp"))
    )
    if args.limit:
        files = files[:args.limit]
    if not files:
        print(f"no frames found in {args.in_dir}", file=sys.stderr)
        return 1

    engine = create_runtime(args.package, device=args.device)
    os.makedirs(args.out_dir, exist_ok=True)

    start = time.perf_counter()
    for i, path in enumerate(files):
        frame = cv2.imread(path, cv2.IMREAD_COLOR)  # BGR, like training
        if frame is None:
            print(f"cannot read {path}", file=sys.stderr)
            return 1
        out = engine.process(frame)
        cv2.imwrite(
            os.path.join(args.out_dir, os.path.basename(path)), out
        )
    total = time.perf_counter() - start

    n = len(files)
    print(f"processed {n} frames in {total:.2f}s "
          f"({total / n * 1e3:.2f} ms/frame incl. IO; "
          f"engine avg {engine.avg_frame_seconds * 1e3:.2f} ms)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
