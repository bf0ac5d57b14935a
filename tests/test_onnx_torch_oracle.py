"""Torch as an independent oracle for the exported ONNX graphs.

The in-repo verification loop (exporter -> numpy interpreter) is
self-referential: a shared misunderstanding of an ONNX op's semantics
would pass it.  These tests run the same decoded graphs through
*torch's* op implementations (export/onnx_torch.py) — notably
``grid_sample`` (the op ONNX GridSample was specified from),
``conv2d``/``conv_transpose2d`` — and require they match the XLA engine
over the reference runner's recurrent state-feedback loop
(``scripts/inference/onnx/inference.py:63-94``).

Also cross-checks ``ops.warp.dense_image_warp`` directly against
``torch.nn.functional.grid_sample`` through the replace_dense_warp
normalization (reference ``replace_dense_warp.py:70-112``), which is
an oracle for the warp itself independent of both numpy oracles in
``test_ops_warp.py`` and the exporter.
"""

import numpy as np
import pytest

import jax.numpy as jnp

pytest.importorskip("torch")

from joshupscale_tpu.export.onnx_export import export_onnx  # noqa: E402
from joshupscale_tpu.export.onnx_interp import (  # noqa: E402
    OnnxClipRunner, run_graph)
from joshupscale_tpu.export.onnx_torch import run_graph_torch  # noqa: E402

H, W = 16, 24
FILTERS, FLOW_BLOCKS, GEN_BLOCKS = 8, 2, 2


def _config(**inference_opts):
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
                      "frame_height": H, "frame_width": W,
                      **inference_opts},
    }
    if inference_opts.get("remove_flow"):
        del config["flow"]
        del config["inference"]["flow"]
    return config


@pytest.fixture(scope="module")
def built_model():
    from joshupscale_tpu.models import create_models

    return create_models(_config(), seed=3)["inference"]


@pytest.fixture(scope="module")
def exported(built_model, tmp_path_factory):
    from joshupscale_tpu.export import onnx_minimal as om

    path = str(tmp_path_factory.mktemp("onnx") / "model.onnx")
    export_onnx(path, built_model.params, H, W, num_flow_frames=4)
    with open(path, "rb") as f:
        return om.decode_model(f.read())


def test_torch_oracle_matches_engine_recurrence(built_model, exported):
    """Torch-run exported graph vs the XLA engine over a recurrent
    clip, and vs the numpy interpreter tightly (two independent
    executors bounding one artifact)."""
    from joshupscale_tpu.runtime.engine import Engine

    runner = OnnxClipRunner(exported, H, W, executor=run_graph_torch)
    eng = Engine(built_model.obj, built_model.params)
    rng = np.random.default_rng(5)

    feeds_np = {
        "pre_gen": np.zeros((1, 3, 4 * H, 4 * W), np.float32),
        **{f"last_frame_{i}": np.zeros((1, 3, H, W), np.float32)
           for i in range(3)},
    }
    for t in range(4):
        frame = rng.integers(0, 256, (H, W, 3), np.uint8)
        ours = eng.process(frame)
        theirs = runner.process(frame)
        d = np.abs(ours.astype(int) - theirs.astype(int)).max()
        assert d <= 1, f"frame {t}: torch-vs-engine max u8 diff {d}"

        # numpy interpreter on the same feeds: the raw (pre-u8) outputs
        # of the two executors must agree to float round-off.
        feeds_np["cur_frame"] = frame[None].astype(np.float32)
        np_outs = run_graph(exported, feeds_np)
        t_outs = run_graph_torch(exported, feeds_np)
        np.testing.assert_allclose(
            t_outs["output_raw"], np_outs["output_raw"],
            atol=2e-5, rtol=1e-5)
        feeds_np["pre_gen"] = np_outs["output_raw"]
        for i in range(3):
            feeds_np[f"last_frame_{i}"] = np_outs[f"out_frame_{i}"]


@pytest.mark.parametrize("opts", [
    {"frame_moving_avg": {"strength": 0.25, "threshold": 0.1}},
    {"frame_moving_avg": {"strength": 0.7, "window": 24,
                          "threshold": 0.02, "gain": 8.0, "norm": "l2",
                          "luma_normalize": True, "limit": True}},
    {"output_flow": True},
    {"remove_flow": True},
], ids=["moving_avg_global", "moving_avg_windowed", "output_flow",
        "remove_flow"])
def test_torch_oracle_matches_engine_variants(opts, tmp_path):
    from joshupscale_tpu.models import create_models
    from joshupscale_tpu.runtime.engine import Engine

    built = create_models(_config(**opts), seed=11)["inference"]
    path = str(tmp_path / "variant.onnx")
    m = built.obj
    export_onnx(path, built.params, H, W, num_flow_frames=4,
                frame_moving_avg=m.frame_moving_avg,
                output_flow=m.output_flow, remove_flow=m.remove_flow)

    runner = OnnxClipRunner(path, H, W, stateless=m.remove_flow,
                            executor=run_graph_torch)
    eng = Engine(m, built.params)
    rng = np.random.default_rng(17)
    base = rng.integers(0, 256, (H, W, 3), np.uint8)
    clip = [base, base, base,
            rng.integers(0, 256, (H, W, 3), np.uint8)]
    clip.append(clip[-1])
    for t, frame in enumerate(clip):
        ours = eng.process(frame)
        theirs = runner.process(frame)
        d = np.abs(ours.astype(int) - theirs.astype(int)).max()
        assert d <= 1, f"{opts}: frame {t} max u8 diff {d}"


@pytest.mark.parametrize("tier", ["fp16", "int8"])
def test_torch_oracle_matches_numpy_on_quantized_tiers(
        built_model, tmp_path, tier):
    """The two executors must agree on the quantized artifacts too:
    same f16 storage emulation, same QDQ rounding rule (half-to-even).
    A 1-u8-step tolerance absorbs conv-sum associativity differences
    between numpy/jax and torch landing on a rounding boundary."""
    path = str(tmp_path / "m.onnx")
    if tier == "fp16":
        export_onnx(path, built_model.params, H, W, fp16=True)
    else:
        from joshupscale_tpu.export.quantize import calibrate

        rng = np.random.default_rng(29)
        cal = jnp.asarray(
            rng.integers(0, 256, (4, 1, H, W, 3), np.uint8))
        ranges = calibrate(built_model.obj, built_model.params, cal)
        export_onnx(path, built_model.params, H, W, int8_ranges=ranges)

    r_np = OnnxClipRunner(path, H, W)
    r_t = OnnxClipRunner(path, H, W, executor=run_graph_torch)
    rng = np.random.default_rng(23)
    worst = 0
    for t in range(3):
        frame = rng.integers(0, 256, (H, W, 3), np.uint8)
        a = r_np.process(frame)
        b = r_t.process(frame)
        worst = max(worst, int(np.abs(a.astype(int)
                                      - b.astype(int)).max()))
    assert worst <= 1, worst


def test_dense_image_warp_matches_torch_grid_sample():
    """ops.warp.dense_image_warp vs torch grid_sample through the
    replace_dense_warp normalization: query = grid - flow in (y, x),
    reversed to (x, y), scaled by (W/2, H/2), shifted by
    (-1 + 1/W, -1 + 1/H) (reference replace_dense_warp.py:70-112).
    Flows large enough to push queries past every border exercise the
    tfa edge-clamp == border-padding equivalence the exporter relies
    on."""
    import torch

    from joshupscale_tpu.ops import dense_image_warp

    rng = np.random.default_rng(41)
    h, w = 20, 28
    image = rng.standard_normal((1, h, w, 3)).astype(np.float32)
    flow = (rng.standard_normal((1, h, w, 2)) * 9).astype(np.float32)

    ours = np.asarray(
        dense_image_warp(jnp.asarray(image), jnp.asarray(flow)))

    gy, gx = np.meshgrid(np.arange(h, dtype=np.float32),
                         np.arange(w, dtype=np.float32), indexing="ij")
    qy = gy[None] - flow[..., 0]
    qx = gx[None] - flow[..., 1]
    grid = np.stack(
        [qx / (w * 0.5) + (-1 + 1 / w), qy / (h * 0.5) + (-1 + 1 / h)],
        axis=-1)
    theirs = torch.nn.functional.grid_sample(
        torch.from_numpy(image.transpose(0, 3, 1, 2)),
        torch.from_numpy(grid), mode="bilinear",
        padding_mode="border", align_corners=False)
    theirs = theirs.numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(ours, theirs, atol=1e-5, rtol=1e-5)
