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
# The interpreter is a shipped component (export/onnx_interp.py --
# the reference ONNX-runner analog); the tests drive it as oracle.
from joshupscale_tpu.export.onnx_interp import run_graph  # noqa: E402


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


def test_onnx_clip_runner_matches_engine(built_model, exported):
    """The shipped runner loop (OnnxClipRunner, the reference
    onnx/inference.py:63-94 analog incl. reset) against the XLA engine
    over two streams separated by a reset."""
    from joshupscale_tpu.export.onnx_interp import OnnxClipRunner
    from joshupscale_tpu.runtime.engine import Engine

    runner = OnnxClipRunner(exported, H, W)
    eng = Engine(built_model.obj, built_model.params)
    rng = np.random.default_rng(9)
    for stream in range(2):
        runner.reset()
        eng.reset()
        for t in range(3):
            frame = rng.integers(0, 256, (H, W, 3), np.uint8)
            ours = eng.process(frame)
            theirs = runner.process(frame)
            d = np.abs(ours.astype(int) - theirs.astype(int)).max()
            assert d <= 1, f"stream {stream} frame {t}: {d}"


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


# ---------------------------------------------------------------------
# Deployment-variant exit doors (reference onnx/frame_moving_avg.py,
# output_flow.py, remove_flow.py): each exported graph is interpreted
# over a recurrent clip and compared against the ENGINE built with the
# same model option.

def _variant_config(_flow=None, _h=H, _w=W, **inference_opts):
    config = {
        "flow": _flow or {"name": "flow-resnet", "num_inputs": 4,
                          "num_filters": FILTERS,
                          "num_res_blocks": FLOW_BLOCKS},
        "generator": {"name": "generator-resnet",
                      "num_filters": FILTERS,
                      "num_res_blocks": GEN_BLOCKS},
        "inference": {"name": "inference",
                      "generator": {"model": "generator"},
                      "flow": {"model": "flow"},
                      "skip_processing": False,
                      "s2d_mode": False,
                      "frame_height": _h, "frame_width": _w,
                      **inference_opts},
    }
    if inference_opts.get("remove_flow"):
        del config["flow"]
        del config["inference"]["flow"]
    return config


def _export_variant(path, built):
    """export_onnx with every model-derived deployment option."""
    m = built.obj
    export_onnx(path, built.params, m.frame_height, m.frame_width,
                num_flow_frames=m.num_flow_frames,
                frame_moving_avg=m.frame_moving_avg,
                output_flow=m.output_flow,
                remove_flow=m.remove_flow,
                flow_pad_factor=m.flow_pad_factor,
                normalize_brightness=m.normalize_brightness)


@pytest.mark.parametrize("opts", [
    # Global scene detection, hard sign gate (the reference defaults).
    {"frame_moving_avg": {"strength": 0.25, "threshold": 0.1}},
    # Windowed detection + soft tanh gate + L2 + luma + pre_warp limit:
    # the full option surface of frame_moving_avg.py in one graph
    # (window 16 does not divide 64/96, exercising pad+resize+crop).
    {"frame_moving_avg": {"strength": 0.7, "window": 24,
                          "threshold": 0.02, "gain": 8.0, "norm": "l2",
                          "luma_normalize": True, "limit": True}},
    {"output_flow": True},
    {"remove_flow": True},
    # Brightness normalization alone (resnet flow): ReduceMean-luma
    # sub/re-add/re-sub chain around the flow net and the state output
    # (reference get_inference_model :773-810).
    {"normalize_brightness": True},
    # ...and spliced together with the moving-avg surgery: the blend
    # runs at true brightness, the recurrence re-subtracts after.
    {"frame_moving_avg": {"strength": 0.25, "threshold": 0.1},
     "normalize_brightness": True},
], ids=["moving_avg_global", "moving_avg_windowed", "output_flow",
        "remove_flow", "brightness", "moving_avg_brightness"])
def test_variant_export_matches_engine(opts, tmp_path):
    from joshupscale_tpu.export.onnx_interp import OnnxClipRunner
    from joshupscale_tpu.models import create_models
    from joshupscale_tpu.runtime.engine import Engine

    built = create_models(_variant_config(**opts), seed=11)["inference"]
    path = str(tmp_path / "variant.onnx")
    m = built.obj
    _export_variant(path, built)

    runner = OnnxClipRunner(path, H, W, stateless=m.remove_flow)
    eng = Engine(m, built.params)
    rng = np.random.default_rng(17)
    base = rng.integers(0, 256, (H, W, 3), np.uint8)
    # Clip shape: repeated frame (small diff -> moving-avg blend ON),
    # then a scene cut (pass-through), then repeats again.
    clip = [base, base, base,
            rng.integers(0, 256, (H, W, 3), np.uint8)]
    clip.append(clip[-1])
    for t, frame in enumerate(clip):
        ours = eng.process(frame)
        theirs = runner.process(frame)
        d = np.abs(ours.astype(int) - theirs.astype(int)).max()
        assert d <= 1, f"{opts}: frame {t} max u8 diff {d}"


def test_autoencoder_pad_brightness_export_matches_engine(tmp_path):
    """The PS2-style serving config in one graph: AUTOENCODER flow
    (MaxPool/Resize ladder), flow_pad_factor (36x44 padded to 40x48,
    flow sliced back) and normalize_brightness -- the options the
    reference bakes into its exported inference model
    (models.py get_inference_model :680-830).  Structure checks +
    engine parity + the independent torch oracle over a recurrent
    clip."""
    from joshupscale_tpu.export.onnx_interp import OnnxClipRunner
    from joshupscale_tpu.export.onnx_torch import run_graph_torch
    from joshupscale_tpu.models import create_models
    from joshupscale_tpu.runtime.engine import Engine

    h2, w2 = 36, 44
    built = create_models(_variant_config(
        _flow={"name": "flow-autoencoder", "num_inputs": 4,
               "filters": [FILTERS, 2 * FILTERS, FILTERS]},
        _h=h2, _w=w2,
        flow_pad_factor=8, normalize_brightness=True,
    ), seed=13)["inference"]
    path = str(tmp_path / "ae.onnx")
    _export_variant(path, built)

    m = om.decode_model(open(path, "rb").read())
    ops = [n["op_type"] for n in m["nodes"]]
    assert ops.count("MaxPool") == 1      # one down block
    assert ops.count("Pad") == 1          # 36x44 -> 40x48
    # One up-block 2x Resize + the bilinear x4 skip.
    assert ops.count("Resize") == 2
    assert ops.count("ReduceMean") == 1   # the brightness term
    # Padded state tensors ride the graph I/O (40x48, not 36x44).
    shapes = {vi["name"]: vi["shape"] for vi in m["inputs"]}
    assert shapes["last_frame_0"] == [1, 3, 40, 48]
    outs = {vi["name"]: vi["shape"] for vi in m["outputs"]}
    assert outs["out_frame_0"] == [1, 3, 40, 48]
    assert outs["output"] == [1, 4 * h2, 4 * w2, 3]

    eng = Engine(built.obj, built.params)
    runners = [OnnxClipRunner(m, h2, w2),
               OnnxClipRunner(m, h2, w2, executor=run_graph_torch)]
    rng = np.random.default_rng(31)
    # A drifting-brightness clip so the normalization term is live.
    base = rng.integers(0, 200, (h2, w2, 3), np.uint8)
    for t in range(4):
        frame = np.clip(base.astype(int) + 12 * t, 0, 255).astype(
            np.uint8)
        ours = eng.process(frame)
        for name, runner in zip(("numpy", "torch"), runners):
            theirs = runner.process(frame)
            d = np.abs(ours.astype(int) - theirs.astype(int)).max()
            assert d <= 1, f"{name}: frame {t} max u8 diff {d}"


def test_int8_ranges_cover_autoencoder_graph(tmp_path):
    """calibrate()'s dotted conv paths must match the autoencoder
    emitter's initializer names, or the int8 tier silently leaves the
    ladder unquantized (the ranges dict lookup just misses)."""
    from joshupscale_tpu.export.quantize import calibrate
    from joshupscale_tpu.models import create_models

    built = create_models(_variant_config(
        _flow={"name": "flow-autoencoder", "num_inputs": 4,
               "filters": [FILTERS, 2 * FILTERS, FILTERS]},
    ), seed=13)["inference"]
    rng = np.random.default_rng(41)
    cal = jnp.asarray(rng.integers(0, 256, (3, 1, H, W, 3), np.uint8))
    ranges = calibrate(built.obj, built.params, cal)
    assert "flow.block_1.conv_1" in ranges  # the ladder is calibrated

    p = str(tmp_path / "ae8.onnx")
    export_onnx(p, built.params, H, W, int8_ranges=ranges)
    m = om.decode_model(open(p, "rb").read())
    ops = [n["op_type"] for n in m["nodes"]]
    # One activation pair + one weight pair per calibrated conv: every
    # range key found its conv (none silently missed).
    assert ops.count("QuantizeLinear") == 2 * len(ranges)
    assert m["initializers"]["flow.block_1.conv_1.w.zero_point"].dtype \
        == np.int8


def test_variant_export_rejects_contradictory_options(built_model,
                                                      tmp_path):
    with pytest.raises(ValueError):
        export_onnx(str(tmp_path / "x.onnx"), built_model.params, H, W,
                    output_flow=True, remove_flow=True)
    with pytest.raises(ValueError):
        export_onnx(str(tmp_path / "x.onnx"), built_model.params, H, W,
                    output_flow=True,
                    frame_moving_avg={"strength": 0.5})
    # remove_flow IGNORES the flow-side options (the model's
    # remove_flow branch does, models/inference.py), so callers may
    # pass their model's fields verbatim.
    p = str(tmp_path / "rf.onnx")
    export_onnx(p, built_model.params, H, W, remove_flow=True,
                flow_pad_factor=8, normalize_brightness=True)
    m = om.decode_model(open(p, "rb").read())
    ops = {n["op_type"] for n in m["nodes"]}
    assert "Pad" not in ops and "ReduceMean" not in ops


def test_fp16_f32_island_preserves_subpixel_coords():
    """Both executors must honor the Cast-fenced f32 island.

    The mechanism under test is the 1080p fp16 warp bug: f16 cannot
    represent a sub-pixel offset at HR coordinates >= 1024
    (f16(1919.0 - 0.372) == 1919.0), so the exporter keeps the grid
    chain f32 via Cast fences -- and an executor that squashes every
    edge to the model float dtype would erase exactly that offset.
    """
    from joshupscale_tpu.export.onnx_interp import run_graph
    from joshupscale_tpu.export.onnx_torch import run_graph_torch

    def n(op, inputs, out, **attrs):
        return {"op_type": op, "inputs": inputs, "outputs": [out],
                "attrs": attrs}

    model = {
        "opset": 16,
        "initializers": {
            # f16 weight => model_float_dtype detects an fp16 graph
            "w16": np.asarray([1.0], np.float16),
            "base": np.asarray([1919.0], np.float32),
            "base2": np.asarray([1918.0], np.float32),
        },
        "inputs": [{"name": "flow", "shape": [1]}],
        "nodes": [
            n("Cast", ["flow"], "flow32", to=om.FLOAT),
            n("Sub", ["base", "flow32"], "q"),      # f32 island
            n("Sub", ["q", "base2"], "frac"),       # still f32
            n("Cast", ["frac"], "out", to=om.FLOAT16),
            n("Mul", ["flow", "w16"], "out_f16"),   # plain f16 edge
        ],
        "outputs": [{"name": "q"}, {"name": "out"},
                    {"name": "out_f16"}],
    }
    feeds = {"flow": np.asarray([0.372], np.float16)}
    flow_f32 = float(np.float16(0.372))

    r = run_graph(model, feeds)
    # Squashed-to-f16 q would be 1919.0 and frac 1.0.
    np.testing.assert_allclose(r["q"], 1919.0 - flow_f32, rtol=0,
                               atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(r["out"], np.float32),
        np.float16(1919.0 - flow_f32 - 1918.0), rtol=1e-3)
    assert np.asarray(r["out_f16"]).dtype == np.float16

    t = run_graph_torch(model, feeds)
    np.testing.assert_allclose(np.asarray(t["out"], np.float32),
                               np.asarray(r["out"], np.float32),
                               rtol=1e-3)


def test_fade_in_block_exports_scale(tmp_path):
    """A mid-fade generator block must export its counter/period scale
    (reference keras_layers.py FadeInLayer); silently dropping it made
    the exported graph diverge from the model for every fade block."""
    from joshupscale_tpu.export.onnx_interp import OnnxClipRunner
    from joshupscale_tpu.models import create_models
    from joshupscale_tpu.runtime.engine import Engine

    config = {
        "flow": {"name": "flow-resnet", "num_inputs": 4,
                 "num_filters": FILTERS, "num_res_blocks": FLOW_BLOCKS},
        "generator": {"name": "generator-resnet",
                      "num_filters": FILTERS, "num_res_blocks": 1,
                      "num_fade_in_res_blocks": 1, "fade_in_period": 8},
        "inference": {"name": "inference",
                      "generator": {"model": "generator"},
                      "flow": {"model": "flow"},
                      "skip_processing": False, "s2d_mode": False,
                      "frame_height": H, "frame_width": W},
    }
    built = create_models(config, seed=3)["inference"]
    # Mid-fade: counter 2 of period 8 => scale 0.25.
    fade = built.params["generator"]["block_2"]["fade"]
    fade["counter"] = jnp.asarray(2, fade["counter"].dtype)

    path = str(tmp_path / "fade.onnx")
    export_onnx(path, built.params, H, W)
    m = om.decode_model(open(path, "rb").read())
    scales = {k: v for k, v in m["initializers"].items()
              if k.endswith("fade_scale")}
    assert list(scales.values()) and float(
        next(iter(scales.values()))) == 0.25

    runner = OnnxClipRunner(m, H, W)
    eng = Engine(built.obj, built.params)
    rng = np.random.default_rng(31)
    for t in range(3):
        frame = rng.integers(0, 256, (H, W, 3), np.uint8)
        d = np.abs(eng.process(frame).astype(int)
                   - runner.process(frame).astype(int)).max()
        assert d <= 1, f"frame {t}: max u8 diff {d}"


def test_fp16_export_quality_and_structure(built_model, tmp_path):
    """fp16 deployment tier (reference onnx/quantize_fp16.py:62-75):
    every float initializer/value becomes f16 except Resize scales
    (which the reference fixes back to f32); the interpreted fp16 graph
    must track the f32 graph within a small u8 tolerance over a
    recurrent clip (the deployable artifact's quality cost, bounded)."""
    from joshupscale_tpu.export.onnx_interp import OnnxClipRunner

    p32 = str(tmp_path / "m32.onnx")
    p16 = str(tmp_path / "m16.onnx")
    export_onnx(p32, built_model.params, H, W)
    export_onnx(p16, built_model.params, H, W, fp16=True)

    m16 = om.decode_model(open(p16, "rb").read())
    dtypes = {k: v.dtype for k, v in m16["initializers"].items()}
    assert dtypes["flow.conv_1.kernel"] == np.float16
    assert dtypes["up.scales"] == np.float32  # Resize scales stay f32
    # Coordinate math stays f32 too: f16 cannot hold sub-pixel offsets
    # at HR coordinates >= 1024, so the warp grid chain is Cast-fenced.
    f32_ok = {"up.scales", "warp.base_grid", "warp.norm", "warp.shift"}
    assert dtypes["warp.base_grid"] == np.float32
    assert all(dt != np.float32 or k in f32_ok
               for k, dt in dtypes.items() if dt in
               (np.float32, np.float16) and "sl_" not in k), dtypes
    cast_tos = [n["attrs"]["to"] for n in m16["nodes"]
                if n["op_type"] == "Cast"]
    assert om.FLOAT in cast_tos and om.FLOAT16 in cast_tos

    r32 = OnnxClipRunner(p32, H, W)
    r16 = OnnxClipRunner(p16, H, W)
    rng = np.random.default_rng(23)
    worst = 0
    for t in range(4):
        frame = rng.integers(0, 256, (H, W, 3), np.uint8)
        a = r32.process(frame)
        b = r16.process(frame)
        worst = max(worst, int(np.abs(a.astype(int)
                                      - b.astype(int)).max()))
    # Half precision on a [0,255] signal: a few u8 steps of drift over
    # a recurrent clip is the expected deployment cost; more means a
    # conversion bug.
    assert worst <= 4, worst


def test_int8_qdq_export_quality_and_structure(built_model, tmp_path):
    """int8 QDQ deployment tier (reference onnx/quantize_int8.py:
    176-206): per-tensor symmetric activation Q/DQ at each calibrated
    conv input, per-channel symmetric weight Q/DQ with the f32 weight
    kept in-file (AddQDQPairToWeight semantics); non-conv nodes (the
    bilinear-skip Resize) stay float like the reference's
    nodes_to_exclude.  Fidelity: the interpreted QDQ graph tracks the
    f32 graph within 2 u8 steps over a recurrent clip."""
    from joshupscale_tpu.export.onnx_interp import OnnxClipRunner
    from joshupscale_tpu.export.quantize import calibrate

    rng = np.random.default_rng(29)
    cal = jnp.asarray(rng.integers(0, 256, (4, 1, H, W, 3), np.uint8))
    ranges = calibrate(built_model.obj, built_model.params, cal)
    assert "flow.conv_1" in ranges and len(ranges) > 8
    # The deconv tail calibrates too (regression: the sweep once
    # intercepted only conv2d, leaving the exporter's ConvTranspose
    # QDQ branch unreachable through the documented pipeline).
    assert "generator.conv_trans_1" in ranges
    assert "generator.conv_trans_2" in ranges

    p32 = str(tmp_path / "m32.onnx")
    p8 = str(tmp_path / "m8.onnx")
    export_onnx(p32, built_model.params, H, W)
    export_onnx(p8, built_model.params, H, W, int8_ranges=ranges)

    m8 = om.decode_model(open(p8, "rb").read())
    ops = [n["op_type"] for n in m8["nodes"]]
    # One activation pair + one weight pair per calibrated conv.
    assert ops.count("QuantizeLinear") == 2 * len(ranges)
    assert ops.count("DequantizeLinear") == 2 * len(ranges)
    inits = m8["initializers"]
    assert inits["flow.conv_1.kernel"].dtype == np.float32  # kept f32
    assert inits["flow.conv_1.w.zero_point"].dtype == np.int8
    # Per-channel weight scale: one per output channel.
    assert inits["flow.conv_1.w.scale"].shape == (FILTERS,)
    assert inits["flow.conv_1.act.scale"].size == 1
    # ConvTranspose weight QDQ is per-channel along the O axis (axis 1
    # of the IOHW ONNX weight).
    assert inits["generator.conv_trans_1.w.scale"].shape == (32,)

    r32 = OnnxClipRunner(p32, H, W)
    r8 = OnnxClipRunner(p8, H, W)
    worst = 0
    for t in range(4):
        frame = rng.integers(0, 256, (H, W, 3), np.uint8)
        a = r32.process(frame)
        b = r8.process(frame)
        worst = max(worst, int(np.abs(a.astype(int)
                                      - b.astype(int)).max()))
    assert worst <= 2, worst

    with pytest.raises(ValueError):
        export_onnx(str(tmp_path / "x.onnx"), built_model.params, H, W,
                    fp16=True, int8_ranges=ranges)


def test_cast_integer_targets_agree_across_executors():
    """Cast to integer dtypes must truncate in BOTH executors: the
    torch oracle used to keep every Cast result f32, silently diverging
    from the numpy interpreter on any int-producing graph."""
    from joshupscale_tpu.export.onnx_interp import run_graph
    from joshupscale_tpu.export.onnx_torch import run_graph_torch

    def n(op, inputs, out, **attrs):
        return {"op_type": op, "inputs": inputs, "outputs": [out],
                "attrs": attrs}

    model = {
        "opset": 16,
        "initializers": {},
        "inputs": [{"name": "x", "shape": [4]}],
        "nodes": [
            n("Cast", ["x"], "xi", to=om.INT64),
            n("Cast", ["xi"], "xf", to=om.FLOAT),
            n("Cast", ["x"], "xu", to=om.UINT8),
        ],
        "outputs": [{"name": "xi"}, {"name": "xf"}, {"name": "xu"}],
    }
    feeds = {"x": np.asarray([0.9, 1.1, 2.999, 7.0], np.float32)}
    r = run_graph(model, feeds)
    t = run_graph_torch(model, feeds)
    for key, want_dtype in (("xi", np.int64), ("xu", np.uint8)):
        np.testing.assert_array_equal(np.asarray(r[key]),
                                      np.asarray(t[key]))
        assert np.asarray(t[key]).dtype == want_dtype, key
    np.testing.assert_array_equal(np.asarray(r["xf"]),
                                  np.asarray(t["xf"]))
    np.testing.assert_array_equal(np.asarray(t["xi"]), [0, 1, 2, 7])
