"""Minimal executor for the exported ONNX deployment graph.

The reference runs its exported ``.onnx`` engines with onnxruntime
(``scripts/inference/onnx/inference.py:63-94``: feed ``cur_frame``,
carry ``pre_gen``/``last_frame_i`` state outputs back into the next
call).  Neither ``onnx`` nor ``onnxruntime`` is available in this
image, so this module interprets the graph emitted by
:mod:`joshupscale_tpu.export.onnx_export` directly: NCHW float body
with the reference op vocabulary (Conv / ConvTranspose / GridSample /
Resize / DepthToSpace / SpaceToDepth / elementwise), batch 1.

It is a *verification runtime*, not a serving path (serving is the
XLA engine): it executes op by op in numpy (convolutions via
``jax.lax`` on CPU) so the exported artifact's semantics can be
checked end to end — the analog of running the reference's runner on
the exported engine before shipping it to TensorRT.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import numpy as np

from joshupscale_tpu.export import onnx_minimal as om

# Cast "to" attribute (TensorProto dtype code) -> numpy dtype.
_CAST_DT = {om.FLOAT: np.float32, om.FLOAT16: np.float16,
            om.UINT8: np.uint8, om.INT32: np.int32, om.INT64: np.int64}


def _conv(x, w, b, strides, pads):
    import jax
    import jax.numpy as jnp

    out = jax.lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(w), tuple(strides),
        [(pads[0], pads[2]), (pads[1], pads[3])],
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    if b is not None:
        out = out + jnp.asarray(b)[None, :, None, None]
    return np.asarray(out)


def _conv_transpose_2x(x, w, b):
    # w: (I, O, 2, 2); output[2i+di, 2j+dj, o] = sum_c x[c,i,j] w[c,o,di,dj]
    n, c, h, wd = x.shape
    o = w.shape[1]
    t = np.einsum("nchw,codk->ndkohw", x, w)  # d=di, k=dj
    out = t.reshape(n, 4 * o, h, wd)  # channel order (di, dj, o) = DCR
    out = _d2s(out, 2)
    if b is not None:
        out = out + b[None, :, None, None]
    return out


def _d2s(x, bs):
    n, c, h, w = x.shape
    co = c // (bs * bs)
    return (x.reshape(n, bs, bs, co, h, w)
            .transpose(0, 3, 4, 1, 5, 2)
            .reshape(n, co, h * bs, w * bs))


def _s2d(x, bs):
    n, c, h, w = x.shape
    return (x.reshape(n, c, h // bs, bs, w // bs, bs)
            .transpose(0, 3, 5, 1, 2, 4)
            .reshape(n, c * bs * bs, h // bs, w // bs))


def _grid_sample(img, grid):
    # bilinear, padding border, align_corners=0: NCHW img, grid (N,H,W,2)
    # with (x, y) in [-1, 1].  Batch 1 (the runner's streaming contract).
    n, c, ih, iw = img.shape
    assert n == 1, "interpreter GridSample is batch-1"
    gx = (grid[..., 0] + 1.0) * iw / 2.0 - 0.5
    gy = (grid[..., 1] + 1.0) * ih / 2.0 - 0.5
    x0 = np.floor(gx)
    y0 = np.floor(gy)
    wx = gx - x0
    wy = gy - y0

    def pick(yi, xi):
        yi = np.clip(yi, 0, ih - 1).astype(np.int64)
        xi = np.clip(xi, 0, iw - 1).astype(np.int64)
        return img[0, :, yi[0], xi[0]]  # (H, W, C)

    p00 = pick(y0, x0)
    p01 = pick(y0, x0 + 1)
    p10 = pick(y0 + 1, x0)
    p11 = pick(y0 + 1, x0 + 1)
    wx = wx[0, ..., None]
    wy = wy[0, ..., None]
    out = (p00 * (1 - wx) * (1 - wy) + p01 * wx * (1 - wy)
           + p10 * (1 - wx) * wy + p11 * wx * wy)
    return out.transpose(2, 0, 1)[None].astype(np.float32)


def _resize(x, scale_h, scale_w):
    # linear, asymmetric (TF1 align_corners=F half_pixel=F): src=dst/scale
    n, c, h, w = x.shape
    oh, ow = int(h * scale_h), int(w * scale_w)
    sy = np.arange(oh, dtype=np.float32) / scale_h
    sx = np.arange(ow, dtype=np.float32) / scale_w
    y0 = np.floor(sy).astype(np.int64)
    x0 = np.floor(sx).astype(np.int64)
    wy = (sy - y0)[None, None, :, None]
    wx = (sx - x0)[None, None, None, :]
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    a = x[:, :, y0][:, :, :, x0]
    b = x[:, :, y0][:, :, :, x1]
    cc = x[:, :, y1][:, :, :, x0]
    d = x[:, :, y1][:, :, :, x1]
    return (a * (1 - wy) * (1 - wx) + b * (1 - wy) * wx
            + cc * wy * (1 - wx) + d * wy * wx).astype(np.float32)


def model_float_dtype(model: Dict[str, Any]) -> np.dtype:
    """f16 for an fp16-quantized export (quantize_fp16 tier), else f32.
    Detected from the initializers (weights carry the compute dtype)."""
    for v in model["initializers"].values():
        if v.dtype == np.float16:
            return np.dtype(np.float16)
    return np.dtype(np.float32)


def run_graph(model: Dict[str, Any],
              feeds: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Execute a decoded model (see ``onnx_minimal.decode_model``) on a
    dict of input arrays; returns the graph outputs by name.

    fp16 graphs execute with float16 node results (emulating the
    deployment runtime's half-precision storage between ops)."""
    fdt = model_float_dtype(model)
    env = dict(model["initializers"])
    env.update(feeds)
    for node in model["nodes"]:
        op = node["op_type"]
        i = [env[x] if x else None for x in node["inputs"]]
        a = node["attrs"]
        if op == "Transpose":
            r = np.transpose(i[0], a["perm"])
        elif op == "Mul":
            r = i[0] * i[1]
        elif op == "Add":
            r = i[0] + i[1]
        elif op == "Sub":
            r = i[0] - i[1]
        elif op == "Div":
            r = i[0] / i[1]
        elif op == "Concat":
            r = np.concatenate(i, axis=a["axis"])
        elif op == "Relu":
            r = np.maximum(i[0], 0)
        elif op == "Tanh":
            r = np.tanh(i[0]).astype(np.float32)
        elif op == "Conv":
            r = _conv(i[0], i[1], i[2] if len(i) > 2 else None,
                      a["strides"], a["pads"])
        elif op == "ConvTranspose":
            r = _conv_transpose_2x(i[0], i[1],
                                   i[2] if len(i) > 2 else None)
        elif op == "DepthToSpace":
            assert a["mode"] == "DCR"
            r = _d2s(i[0], a["blocksize"])
        elif op == "SpaceToDepth":
            r = _s2d(i[0], a["blocksize"])
        elif op == "Slice":
            starts, ends, axes, steps = (int(i[1][0]), int(i[2][0]),
                                         int(i[3][0]), int(i[4][0]))
            sl = [slice(None)] * i[0].ndim
            sl[axes] = slice(starts, None if ends == -i[0].shape[axes]
                             - 1 else ends, steps)
            r = i[0][tuple(sl)]
        elif op == "GridSample":
            r = _grid_sample(i[0], i[1])
        elif op == "Resize":
            scales = np.asarray(i[2], np.float32)
            r = _resize(i[0], float(scales[2]), float(scales[3]))
        elif op == "Clip":
            r = np.clip(i[0], i[1], i[2])
        elif op == "Identity":
            r = i[0]
        elif op == "Abs":
            r = np.abs(i[0])
        elif op == "Sign":
            r = np.sign(i[0])
        elif op == "Min":
            r = np.minimum(i[0], i[1])
        elif op == "Max":
            r = np.maximum(i[0], i[1])
        elif op == "ReduceMean":
            # Opset-16 form: axes as an attribute (absent = all axes),
            # keepdims defaulting to 1.
            axes = a.get("axes")
            r = np.mean(i[0], axis=tuple(axes) if axes else None,
                        keepdims=bool(a.get("keepdims", 1)))
        elif op == "Pad":
            pads = np.asarray(i[1], np.int64)
            nd = i[0].ndim
            width = [(int(pads[d]), int(pads[d + nd])) for d in range(nd)]
            cval = 0.0 if len(i) < 3 or i[2] is None \
                else float(np.asarray(i[2]))
            assert a.get("mode", "constant") == "constant"
            r = np.pad(i[0], width, constant_values=cval)
        elif op == "MaxPool":
            kh, kw = a["kernel_shape"]
            sh, sw = a["strides"]
            assert (kh, kw) == (sh, sw) and not any(a.get("pads", []))
            n, c, hh, ww = i[0].shape
            r = (i[0][:, :, :hh - hh % kh, :ww - ww % kw]
                 .reshape(n, c, hh // kh, kh, ww // kw, kw)
                 .max(axis=(3, 5)))
        elif op == "QuantizeLinear":
            scale = _qdq_scale(i[1], i[0].ndim, a.get("axis"))
            # ONNX rounds half to even (np.round semantics).
            r = np.clip(np.round(i[0].astype(np.float32) / scale),
                        -128, 127).astype(np.int8)
        elif op == "DequantizeLinear":
            scale = _qdq_scale(i[1], i[0].ndim, a.get("axis"))
            r = i[0].astype(np.float32) * scale
        elif op == "Cast":
            r = np.asarray(i[0]).astype(_CAST_DT[a["to"]])
        else:
            raise NotImplementedError(op)
        if op == "Cast":
            env[node["outputs"][0]] = np.asarray(r)  # exact target dtype
        elif np.asarray(r).dtype == np.int8:
            env[node["outputs"][0]] = np.asarray(r)  # quantized edge
        else:
            # Storage dtype between nodes: the model float dtype --
            # EXCEPT inside an explicit f32 island (every float input
            # f32 in an fp16 graph: the exporter's Cast-fenced
            # coordinate math, which must not be squashed to f16).
            floats = [np.asarray(x).dtype for x in i
                      if x is not None
                      and np.issubdtype(np.asarray(x).dtype,
                                        np.floating)]
            store = (np.float32 if floats
                     and all(d == np.float32 for d in floats) else fdt)
            env[node["outputs"][0]] = np.asarray(r, store)
    return {o["name"]: env[o["name"]] for o in model["outputs"]}


def _qdq_scale(scale, ndim, axis):
    """Broadcast a Quantize/DequantizeLinear scale: scalar per-tensor,
    or 1-D per-channel along ``axis``."""
    scale = np.asarray(scale, np.float32)
    if scale.ndim == 0 or scale.size == 1:
        return scale.reshape(())
    shape = [1] * ndim
    shape[axis] = scale.size
    return scale.reshape(shape)


class OnnxClipRunner:
    """The reference ONNX runner loop (onnx/inference.py:63-94) over an
    exported graph: u8 BGR frames in, u8 BGR 4x frames out, with the
    recurrent state (``pre_gen`` + ``last_frame_i``) fed back between
    frames and zero-initialized at construction/reset."""

    def __init__(self, path_or_model, height: int, width: int,
                 num_flow_frames: int = 4, stateless: bool = False,
                 executor=None) -> None:
        """``stateless=True`` drives a remove_flow graph (single frame
        in, single frame out, no recurrent feeds).  ``executor``
        defaults to the numpy interpreter (``run_graph``); pass
        ``onnx_torch.run_graph_torch`` to drive the same loop through
        torch's op implementations (an independent oracle)."""
        if isinstance(path_or_model, (str, bytes)):
            from joshupscale_tpu.export import onnx_minimal as om

            with open(path_or_model, "rb") as f:
                path_or_model = om.decode_model(f.read())
        self.model = path_or_model
        self._run = executor if executor is not None else run_graph
        self.h, self.w = height, width
        self.num_last = 0 if stateless else num_flow_frames - 1
        self.stateless = stateless
        self.dtype = model_float_dtype(self.model)
        self.reset()

    def reset(self) -> None:
        if self.stateless:
            self.feeds: Dict[str, np.ndarray] = {}
            return
        # State shapes come from the graph's own input value infos --
        # flow_pad_factor graphs carry last_frame_i at the PADDED size.
        shapes = {vi["name"]: vi["shape"] for vi in self.model["inputs"]}
        self.feeds = {
            "pre_gen": np.zeros(shapes.get(
                "pre_gen", (1, 3, 4 * self.h, 4 * self.w)), self.dtype),
            **{f"last_frame_{i}": np.zeros(shapes.get(
                f"last_frame_{i}", (1, 3, self.h, self.w)), self.dtype)
               for i in range(self.num_last)},
        }

    def process(self, frame: np.ndarray) -> np.ndarray:
        """One recurrent step: (H, W, 3) u8 -> (4H, 4W, 3) u8."""
        self.feeds["cur_frame"] = frame[None].astype(self.dtype)
        outs = self._run(self.model, self.feeds)
        if not self.stateless:
            self.feeds["pre_gen"] = outs["output_raw"]
            for i in range(self.num_last):
                self.feeds[f"last_frame_{i}"] = outs[f"out_frame_{i}"]
        return np.clip(outs["output"], 0, 255).astype(np.uint8)[0]
