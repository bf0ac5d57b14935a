#!/usr/bin/env python3
"""Convert a reference JoshUpscale ONNX model's weights to npz.

The reference exports ONNX models (train_local.py -> tf2onnx ->
onnx-surgery pipeline).  This tool extracts the initializers and maps
them onto joshupscale_tpu's param-tree naming so real PSP/PS2 weights
run on TPU.  It requires the ``onnx`` package, which is NOT part of the
TPU serving environment -- run it wherever the reference's export
tooling already works, then ship the npz.

Usage:
    python tools/onnx_to_npz.py model.onnx weights.npz

Mapping notes (verify against your export):
- tf2onnx names initializers after the Keras variables, e.g.
  ``.../generator/conv_1/Conv2D/ReadVariableOp:0`` -- the layer path is
  recovered from the name segments.
- Conv kernels in ONNX are OIHW after the NCHW cleanup pass
  (reference onnx/cleanup.py); they are transposed back to HWIO here.
- ConvTranspose kernels are IOHW -> stored as (kh, kw, O, I).
"""

import re
import sys

import numpy as np


def main(onnx_path: str, npz_path: str) -> int:
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

    model = onnx.load(onnx_path)
    conv_like = {}
    for node in model.graph.node:
        if node.op_type in ("Conv", "ConvTranspose"):
            for inp in node.input[1:]:
                conv_like[inp] = node.op_type

    out = {}
    for init in model.graph.initializer:
        arr = numpy_helper.to_array(init)
        name = init.name
        key = _normalize(name)
        if name in conv_like and arr.ndim == 4:
            if conv_like[name] == "Conv":
                arr = arr.transpose(2, 3, 1, 0)  # OIHW -> HWIO
            else:
                arr = arr.transpose(2, 3, 1, 0)  # IOHW -> HW O I
        out[key] = arr
    np.savez(npz_path, **out)
    print(f"wrote {len(out)} arrays to {npz_path}")
    print("Load with joshupscale_tpu.export.importer.load_params_npz "
          "(rename keys to your param tree paths as needed).")
    return 0


def _normalize(name: str) -> str:
    """tf2onnx initializer name -> dotted layer path (best effort)."""
    name = re.sub(r":\d+$", "", name)
    parts = [p for p in name.split("/") if p]
    drop = {"ReadVariableOp", "Conv2D", "BiasAdd", "FusedBatchNormV3",
            "conv2d_transpose", "MatMul", "model", "functional"}
    parts = [p for p in parts if p not in drop]
    return ".".join(parts) if parts else name


if __name__ == "__main__":
    if len(sys.argv) != 3:
        print(__doc__)
        sys.exit(2)
    sys.exit(main(sys.argv[1], sys.argv[2]))
