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


def _load_graph(onnx_path: str):
    """(initializers {name: array}, conv_like {init_name: op_type}).

    Uses the real ``onnx`` package when present, otherwise falls back
    to the repo's self-contained protobuf decoder
    (joshupscale_tpu.export.onnx_minimal) so the tool also runs on the
    TPU serving image.
    """
    try:
        import onnx
        from onnx import numpy_helper
    except ImportError:
        sys.path.insert(
            0, __import__("os").path.dirname(
                __import__("os").path.dirname(
                    __import__("os").path.abspath(__file__))))
        from joshupscale_tpu.export import onnx_minimal as om

        with open(onnx_path, "rb") as f:
            model = om.decode_model(f.read())
        conv_like = {}
        for node in model["nodes"]:
            if node["op_type"] in ("Conv", "ConvTranspose"):
                for inp in node["inputs"][1:]:
                    conv_like[inp] = node["op_type"]
        return model["initializers"], conv_like

    model = onnx.load(onnx_path)
    conv_like = {}
    for node in model.graph.node:
        if node.op_type in ("Conv", "ConvTranspose"):
            for inp in node.input[1:]:
                conv_like[inp] = node.op_type
    inits = {init.name: numpy_helper.to_array(init)
             for init in model.graph.initializer}
    return inits, conv_like


def main(onnx_path: str, npz_path: str) -> int:
    inits, conv_like = _load_graph(onnx_path)
    out = {}
    for name, arr in inits.items():
        key = _normalize(name)
        if name in conv_like and arr.ndim == 4:
            # ONE permutation covers both: Conv OIHW -> HWIO and
            # ConvTranspose IOHW -> HWOI swap the same axes (the last
            # two ONNX dims go first, the first two reverse into the
            # tail) -- npz_to_onnx.py inverts both with its single
            # transpose(3, 2, 0, 1).
            arr = arr.transpose(2, 3, 1, 0)
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
