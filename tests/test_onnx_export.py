"""From-scratch ONNX export: structure, weight round-trip, and a
numerical oracle.

The exporter (export/onnx_export.py) emits the reference-shaped
deployment graph (NCHW body, Conv/ConvTranspose/GridSample/Resize,
reference I/O names -- see its module docstring) using the
self-contained protobuf codec (export/onnx_minimal.py).  Because the
``onnx``/onnxruntime packages are not in this image, verification is
threefold:

1. decode_model round-trips every initializer bit-exactly and the graph
   carries the expected op vocabulary and I/O contract;
2. a minimal numpy interpreter executes the exported graph and must
   match ``InferenceModel.apply`` over a short recurrent clip (proves
   the emitted semantics, not just the bytes);
3. the file is well-formed protobuf (decoded fields are sane), so the
   real ``onnx`` package will load it in the reference's environment.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from joshupscale_tpu.export import onnx_minimal as om
from joshupscale_tpu.export.onnx_export import export_onnx

H, W = 16, 24
FILTERS, FLOW_BLOCKS, GEN_BLOCKS = 8, 2, 2


@pytest.fixture(scope="module")
def built_model():
    from joshupscale_tpu.models import create_models

    config = {
        "flow": {"name": "flow-resnet", "num_inputs": 4,
                 "num_filters": FILTERS, "num_res_blocks": FLOW_BLOCKS},
        "generator": {"name": "generator-resnet",
                      "num_filters": FILTERS,
                      "num_res_blocks": GEN_BLOCKS},
        "inference": {"name": "inference",
                      "generator": {"model": "generator"},
                      "flow": {"model": "flow"},
                      "skip_processing": False,
                      "s2d_mode": False,
                      "frame_height": H, "frame_width": W},
    }
    models = create_models(config, seed=3)
    return models["inference"]


@pytest.fixture(scope="module")
def exported(built_model, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("onnx") / "model.onnx")
    export_onnx(path, built_model.params, H, W, num_flow_frames=4)
    with open(path, "rb") as f:
        return om.decode_model(f.read())


def test_structure_matches_reference_graph_shape(exported):
    m = exported
    assert m["opset"] == 16
    assert [i["name"] for i in m["inputs"]] == [
        "cur_frame", "pre_gen", "last_frame_0", "last_frame_1",
        "last_frame_2"]
    assert m["inputs"][0]["shape"] == [1, H, W, 3]      # NHWC frame
    assert m["inputs"][1]["shape"] == [1, 3, 4 * H, 4 * W]  # NCHW state
    assert [o["name"] for o in m["outputs"]] == [
        "output", "output_raw", "out_frame_0", "out_frame_1",
        "out_frame_2"]
    ops = {n["op_type"] for n in m["nodes"]}
    # The post-surgery reference vocabulary (SURVEY.md section 3.5).
    assert {"Conv", "ConvTranspose", "GridSample", "Resize",
            "DepthToSpace", "SpaceToDepth", "Concat", "Relu", "Tanh",
            "Clip", "Transpose", "Slice"} <= ops
    # All-NCHW body: exactly two data transposes (frame in, output out)
    # plus the flow NCHW->NHWC feeding the GridSample grid chain.
    assert sum(n["op_type"] == "Transpose" for n in m["nodes"]) == 3
    gs = [n for n in m["nodes"] if n["op_type"] == "GridSample"]
    assert len(gs) == 1
    assert gs[0]["inputs"][0] == "pre_gen"
    assert gs[0]["attrs"]["mode"] == "bilinear"
    assert gs[0]["attrs"]["padding_mode"] == "border"
    assert gs[0]["attrs"]["align_corners"] == 0


def test_initializer_weight_roundtrip(built_model, exported):
    """Decoded initializers must be bit-identical to the (BN-folded)
    param tree -- the onnx_to_npz(npz_to_onnx(...)) property without
    needing the onnx package."""
    from joshupscale_tpu.export.onnx_export import _fold_conv_bn

    inits = exported["initializers"]
    fp = built_model.params["flow"]
    k, b = _fold_conv_bn(fp["conv_1"], fp["bn_1"])
    np.testing.assert_array_equal(
        inits["flow.conv_1.kernel"],
        np.transpose(k, (3, 2, 0, 1)))
    np.testing.assert_array_equal(inits["flow.conv_1.bias"], b)
    gp = built_model.params["generator"]
    blk = gp["block_2"]
    k, b = _fold_conv_bn(blk["conv_2"], blk["bn_2"])
    np.testing.assert_array_equal(
        inits["generator.block_2.conv_2.kernel"],
        np.transpose(k, (3, 2, 0, 1)))
    # ConvTranspose: storage (2,2,O,I) -> ONNX (I,O,2,2).
    np.testing.assert_array_equal(
        inits["generator.conv_trans_2.kernel"],
        np.transpose(np.asarray(gp["conv_trans_2"]["kernel"],
                                np.float32), (3, 2, 0, 1)))


# ---------------------------------------------------------------------
# Minimal interpreter for the exported op vocabulary (numpy/lax; test
# oracle only -- onnxruntime does this in the reference's environment).


def _conv(x, w, b, strides, pads):
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
    # with (x, y) in [-1, 1].
    n, c, ih, iw = img.shape
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


def _resize4(x):
    # linear, asymmetric (TF1 align_corners=F half_pixel=F): src = dst/4
    n, c, h, w = x.shape
    oh, ow = h * 4, w * 4
    sy = np.arange(oh, dtype=np.float32) / 4.0
    sx = np.arange(ow, dtype=np.float32) / 4.0
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


def run_graph(model, feeds):
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
            r = _resize4(i[0])
        elif op == "Clip":
            r = np.clip(i[0], i[1], i[2])
        elif op == "Identity":
            r = i[0]
        else:
            raise NotImplementedError(op)
        env[node["outputs"][0]] = np.asarray(r, np.float32)
    return {o["name"]: env[o["name"]] for o in model["outputs"]}


def test_exported_graph_matches_model_recurrence(built_model, exported):
    """Interpret the exported ONNX graph over a 4-frame recurrent clip
    (the reference runner's state-feedback loop, onnx/inference.py:
    63-94) and compare against InferenceModel.apply frame by frame."""
    model = built_model.obj
    params = built_model.params
    rng = np.random.default_rng(5)
    frames = rng.integers(0, 256, (4, 1, H, W, 3), np.uint8)

    state = model.init_state(1)
    feeds = {
        "pre_gen": np.zeros((1, 3, 4 * H, 4 * W), np.float32),
        **{f"last_frame_{i}": np.zeros((1, 3, H, W), np.float32)
           for i in range(3)},
    }
    for t in range(4):
        outs, state = model.apply(params, jnp.asarray(frames[t]), state)
        feeds["cur_frame"] = frames[t].astype(np.float32)
        onnx_outs = run_graph(exported, feeds)

        ours_u8 = np.asarray(outs["output"])
        theirs_u8 = np.clip(onnx_outs["output"], 0, 255).astype(np.uint8)
        diff = np.abs(ours_u8.astype(int) - theirs_u8.astype(int))
        assert diff.max() <= 1, f"frame {t}: max u8 diff {diff.max()}"

        raw = np.transpose(onnx_outs["output_raw"], (0, 2, 3, 1))
        np.testing.assert_allclose(
            raw, np.asarray(outs["output_raw"]), atol=2e-4, rtol=1e-4)

        # Reference runner state feedback: outputs[1:] -> states.
        feeds["pre_gen"] = onnx_outs["output_raw"]
        for i in range(3):
            feeds[f"last_frame_{i}"] = onnx_outs[f"out_frame_{i}"]


def test_file_is_wellformed_protobuf(built_model, tmp_path):
    path = str(tmp_path / "m.onnx")
    export_onnx(path, built_model.params, H, W)
    with open(path, "rb") as f:
        data = f.read()
    m = om.decode_model(data)
    assert m["producer"] == "joshupscale_tpu"
    assert m["ir_version"] == 8
    assert len(m["initializers"]) > 10
    for name, arr in m["initializers"].items():
        assert arr.dtype in (np.float32, np.int64), (name, arr.dtype)


def test_onnx_to_npz_tool_roundtrip(built_model, tmp_path):
    """tools/onnx_to_npz.py (minimal-decoder fallback, no onnx package)
    recovers the exported weights bit-exactly in HWIO -- the
    onnx_to_npz(npz_to_onnx(...)) round-trip property without a donor
    graph."""
    import os
    import subprocess
    import sys

    from joshupscale_tpu.export.onnx_export import _fold_conv_bn

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    onnx_path = str(tmp_path / "m.onnx")
    npz_path = str(tmp_path / "m.npz")
    export_onnx(onnx_path, built_model.params, H, W)
    r = subprocess.run(
        [sys.executable, os.path.join(repo, "tools", "onnx_to_npz.py"),
         onnx_path, npz_path],
        capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 0, r.stderr
    z = np.load(npz_path)
    k, b = _fold_conv_bn(built_model.params["flow"]["conv_1"],
                         built_model.params["flow"]["bn_1"])
    np.testing.assert_array_equal(z["flow.conv_1.kernel"], k)
    np.testing.assert_array_equal(z["flow.conv_1.bias"], b)
    kt = np.asarray(
        built_model.params["generator"]["conv_trans_2"]["kernel"],
        np.float32)
    # tool transposes IOHW back to (kh, kw, O, I)
    np.testing.assert_array_equal(
        z["generator.conv_trans_2.kernel"], kt)
