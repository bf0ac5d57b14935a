#!/usr/bin/env python3
"""Patch a reference JoshUpscale ONNX model's weights from an npz.

The inverse direction of tools/onnx_to_npz.py: take weights trained
with joshupscale_tpu (a params npz saved by
``export.importer.save_params_npz``) and write them back into a DONOR
.onnx graph produced by the reference's export pipeline
(reference scripts/training/train_local.py:184-209 -> tf2onnx), so the
result runs in the reference's TensorRT toolchain unchanged.

Like onnx_to_npz.py this requires the ``onnx`` package (not part of
the TPU serving image) -- run it in the reference's export environment.

Usage:
    python tools/npz_to_onnx.py donor.onnx weights.npz out.onnx

Each donor initializer is renamed through the same normalization as
onnx_to_npz.py and looked up in the npz (conv kernels transposed back
HWIO -> OIHW, matching the reference's NCHW cleanup pass); shapes are
validated, unmatched initializers are left untouched and reported.
Round-trip property: onnx_to_npz(npz_to_onnx(donor, npz)) == npz.
"""

import sys

import numpy as np

# Reuse the exact name mapping of the forward tool.
from onnx_to_npz import _normalize  # noqa: E402


def main(donor_path: str, npz_path: str, out_path: str) -> int:
    try:
        import onnx
        from onnx import numpy_helper
    except ImportError:
        print(
            "error: the 'onnx' package is required. Run this tool in "
            "the reference's export environment.",
            file=sys.stderr,
        )
        return 1

    weights = dict(np.load(npz_path))
    model = onnx.load(donor_path)

    conv_like = {}
    for node in model.graph.node:
        if node.op_type in ("Conv", "ConvTranspose"):
            for inp in node.input[1:]:
                conv_like[inp] = node.op_type

    patched, missing = 0, []
    for init in model.graph.initializer:
        key = _normalize(init.name)
        if key not in weights:
            missing.append(key)
            continue
        arr = np.asarray(weights[key])
        if init.name in conv_like and arr.ndim == 4:
            arr = arr.transpose(3, 2, 0, 1)  # HWIO -> OIHW (and back
            # for ConvTranspose's (kh, kw, O, I) storage, see
            # onnx_to_npz.py mapping notes)
        donor = numpy_helper.to_array(init)
        if tuple(arr.shape) != tuple(donor.shape):
            print(
                f"error: {init.name} ({key}): npz shape {arr.shape} "
                f"!= donor shape {donor.shape}",
                file=sys.stderr,
            )
            return 1
        init.CopyFrom(
            numpy_helper.from_array(
                arr.astype(donor.dtype), name=init.name))
        patched += 1

    onnx.save(model, out_path)
    print(f"patched {patched}/{len(model.graph.initializer)} "
          f"initializers -> {out_path}")
    if missing:
        print("left untouched (no npz match): "
              + ", ".join(sorted(missing)[:10]))
    return 0


if __name__ == "__main__":
    if len(sys.argv) != 4:
        print(__doc__)
        sys.exit(2)
    sys.exit(main(sys.argv[1], sys.argv[2], sys.argv[3]))
