#!/usr/bin/env python3
"""Export a trained package to ONNX and verify the artifact end to end.

The full exit door back into the reference's toolchain, on real
learned weights: load a serving package (export/package.py), emit the
reference-shaped ONNX graph from its params (export/onnx_export.py,
no donor graph, no onnx package), then execute the .onnx with the
shipped interpreter runner (export/onnx_interp.OnnxClipRunner — the
reference onnx/inference.py:63-94 loop) over a recurrent clip and diff
every frame against the XLA engine serving the same package.

Usage:
    python tools/onnx_verify.py export/gan_learn10/package \
        [--frames 10] [--data data] [--out model.onnx]

Runs on CPU (leaves the TPU to training jobs).
"""

import argparse
import glob
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("package")
    ap.add_argument("--data", default="data")
    ap.add_argument("--frames", type=int, default=10)
    ap.add_argument("--out", default=None,
                    help="where to write the .onnx (default: inside "
                    "the package dir)")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    import cv2

    from joshupscale_tpu.export.onnx_export import export_onnx
    from joshupscale_tpu.export.onnx_interp import OnnxClipRunner
    from joshupscale_tpu.runtime.engine import create_runtime

    lr_files = sorted(glob.glob(os.path.join(args.data, "val/lr/*.png")))
    assert len(lr_files) >= args.frames, "need a rendered val set"
    frames = np.stack([cv2.imread(p, cv2.IMREAD_COLOR)
                       for p in lr_files[:args.frames]])
    t, h, w, _ = frames.shape
    print(f"{t} frames, {w}x{h} -> {w * 4}x{h * 4}")

    eng = create_runtime(args.package, frame_size=(h, w))
    onnx_path = args.out or os.path.join(args.package, "model.onnx")
    m = eng.model
    export_onnx(onnx_path, eng.params, h, w,
                num_flow_frames=m.num_flow_frames,
                frame_moving_avg=m.frame_moving_avg,
                output_flow=m.output_flow,
                remove_flow=m.remove_flow,
                flow_pad_factor=m.flow_pad_factor,
                normalize_brightness=m.normalize_brightness)
    print(f"exported {onnx_path} "
          f"({os.path.getsize(onnx_path) / 1e6:.1f} MB)")

    runner = OnnxClipRunner(onnx_path, h, w,
                            num_flow_frames=m.num_flow_frames,
                            stateless=m.remove_flow)
    worst = 0
    for i in range(t):
        ours = eng.process(frames[i])
        theirs = runner.process(frames[i])
        d = int(np.abs(ours.astype(int) - theirs.astype(int)).max())
        frac = float(np.mean(ours != theirs))
        worst = max(worst, d)
        print(f"frame {i}: max u8 diff {d}  (pixels differing: "
              f"{frac:.2%})")
    print(f"worst frame diff: {worst} u8 step(s)")
    return 0 if worst <= 1 else 1


if __name__ == "__main__":
    raise SystemExit(main())
