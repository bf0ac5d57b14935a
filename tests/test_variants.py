"""Deployment-variant tests: frame moving average, output_flow,
remove_flow (the reference's ONNX graph-surgery stages as model options).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from joshupscale_tpu.models import create_models
from joshupscale_tpu.ops.temporal import (
    FrameMovingAvgConfig,
    frame_moving_avg,
)


def _config(**inference_extra):
    return {
        "flow": {"name": "flow-resnet", "num_inputs": 4,
                 "num_filters": 8, "num_res_blocks": 1},
        "generator": {"name": "generator-resnet", "num_filters": 8,
                      "num_res_blocks": 1},
        "inference": {
            "name": "inference",
            "generator": {"model": "generator"},
            "flow": {"model": "flow"},
            "skip_processing": False,
            "frame_height": 8,
            "frame_width": 12,
            "s2d_mode": False,
            **inference_extra,
        },
    }


def test_moving_avg_blends_when_static(rng):
    """Identical gen/warp (no scene change) => full-strength blend."""
    gen = jnp.asarray(rng.random((1, 16, 16, 3), np.float32) - 0.5)
    cfg = FrameMovingAvgConfig(strength=0.6, threshold=0.1)
    # warp == gen -> diff 0 < threshold -> cond -1 -> mask = strength
    out = frame_moving_avg(gen, gen, cfg)
    np.testing.assert_allclose(np.asarray(out), np.asarray(gen), atol=1e-6)

    # warp differs slightly (below threshold): blend at strength.
    warp = gen + 0.01
    out = np.asarray(frame_moving_avg(gen, warp, cfg))
    expected = np.asarray(warp) * 0.6 + np.asarray(gen) * 0.4
    np.testing.assert_allclose(out, expected, atol=1e-5)


def test_moving_avg_disabled_on_scene_cut(rng):
    gen = jnp.asarray(rng.random((1, 16, 16, 3), np.float32) - 0.5)
    warp = jnp.asarray(rng.random((1, 16, 16, 3), np.float32) * 2 - 1)
    cfg = FrameMovingAvgConfig(strength=0.6, threshold=0.05)
    out = np.asarray(frame_moving_avg(gen, warp, cfg))
    # Mean L1 diff of independent uniforms >> 0.05 -> cond=+1 -> passthrough
    np.testing.assert_allclose(out, np.asarray(gen), atol=1e-6)


def test_moving_avg_windowed_local_decision(rng):
    """Windowed mode: a scene cut in one region disables blending only
    there."""
    gen = jnp.zeros((1, 16, 16, 3), jnp.float32)
    warp = jnp.zeros((1, 16, 16, 3), jnp.float32)
    # Large difference only in the top-left 8x8 window.
    warp = warp.at[:, :8, :8, :].set(1.0)
    cfg = FrameMovingAvgConfig(strength=0.5, threshold=0.1, window=8)
    out = np.asarray(frame_moving_avg(gen, warp, cfg))
    # Window-origin of the cut window: cond=+1 exactly -> passthrough.
    assert out[0, 0, 0, 0] == 0.0
    # The cond map is linearly upscaled (asymmetric grid, like the
    # reference's ONNX Resize), so the blend ramps up toward the
    # neighbouring no-cut windows: exact expected value at (2,2) is
    # strength*(1 - 0.125)/2 * warp = 0.21875.
    np.testing.assert_allclose(out[0, 2, 2, 0], 0.21875, atol=1e-5)
    assert out[0, 0, 0, 0] < out[0, 2, 2, 0] < out[0, 4, 4, 0]
    # Unaffected region stays exactly gen.
    np.testing.assert_allclose(out[0, 12:, 12:, :], 0.0, atol=1e-6)


def test_moving_avg_soft_gain(rng):
    gen = jnp.asarray(rng.random((1, 8, 8, 3), np.float32) - 0.5)
    cfg = FrameMovingAvgConfig(strength=0.5, threshold=0.1, gain=10.0,
                               norm="l2", luma_normalize=True)
    out = frame_moving_avg(gen, gen + 0.01, cfg)
    assert np.isfinite(np.asarray(out)).all()


def test_output_flow_variant(rng):
    models = create_models(_config(output_flow=True), seed=1)
    model = models["inference"].obj
    params = models["inference"].params
    frame = rng.integers(0, 256, (1, 8, 12, 3)).astype(np.uint8)
    state = model.init_state(1)
    state["pre_gen"] = jnp.asarray(
        rng.random((1, 32, 48, 3), np.float32) - 0.5)
    outputs, _ = model.apply(params, jnp.asarray(frame), state)
    # Displayed output is the warped frame, not the generated one.
    np.testing.assert_allclose(
        np.asarray(outputs["output_denorm"]),
        np.asarray(outputs["pre_warp"]), atol=1e-6)


def test_remove_flow_variant(rng):
    config = _config(remove_flow=True)
    del config["inference"]["flow"]
    del config["flow"]
    models = create_models(config, seed=1)
    model = models["inference"].obj
    params = models["inference"].params
    assert model.init_state(1) == {}
    frame = rng.integers(0, 256, (1, 8, 12, 3)).astype(np.uint8)
    outputs, state = model.apply(params, jnp.asarray(frame), {})
    assert outputs["output"].shape == (1, 32, 48, 3)
    assert state == {}

    # Exactness vs full generator with zero warp is NOT expected (the
    # sliced conv drops the warp branch entirely); check the slice math:
    # generator(frame, zeros) == remove_flow generator when the warp-
    # branch kernel slice is zeroed out.
    from joshupscale_tpu.models.generator import generator_resnet_apply
    from joshupscale_tpu.ops import preprocess

    gp = jax.tree_util.tree_map(jnp.array, models["generator"].params)
    gp["conv_1"]["kernel"] = gp["conv_1"]["kernel"].at[:, :, 3:, :].set(0)
    pre = preprocess(jnp.asarray(frame))
    with_zeroed = generator_resnet_apply(
        gp, pre, jnp.zeros((1, 32, 48, 3), jnp.float32))
    np.testing.assert_allclose(
        np.asarray(outputs["output_raw"]), np.asarray(with_zeroed),
        atol=1e-6)


def test_moving_avg_in_recurrence(rng):
    models = create_models(
        _config(frame_moving_avg={"strength": 0.5, "threshold": 10.0}),
        seed=1,
    )
    model = models["inference"].obj
    params = models["inference"].params
    # threshold=10 means never a scene cut: always blends.
    frame = rng.integers(0, 256, (1, 8, 12, 3)).astype(np.uint8)
    state = model.init_state(1)
    out1, state = model.apply(params, jnp.asarray(frame), state)
    out2, state = model.apply(params, jnp.asarray(frame), state)
    assert np.isfinite(np.asarray(out2["output_raw"])).all()
    # The recurrent state carries the blended output.
    np.testing.assert_allclose(
        np.asarray(state["pre_gen"]), np.asarray(out2["output_raw"]),
        atol=1e-6)


def test_remove_flow_serves_with_default_engine_options(rng):
    """A remove_flow model built with the registry DEFAULTS (s2d_mode +
    deferred_display on) must serve through the Engine: its apply()
    never emits output_s2d, so the engine must not run the deferred
    d2s+u8 display program on the already-u8 HR output (it used to,
    crashing every process() call on such a package)."""
    from joshupscale_tpu.runtime.engine import Engine

    config = _config(remove_flow=True)
    del config["inference"]["flow"]
    del config["flow"]
    del config["inference"]["s2d_mode"]  # registry default (True)
    models = create_models(config, seed=1)
    eng = Engine(models["inference"].obj, models["inference"].params)
    assert not eng._deferred
    frame = rng.integers(0, 256, (8, 12, 3)).astype(np.uint8)
    out = eng.process(frame)
    assert out.shape == (32, 48, 3) and out.dtype == np.uint8
    clip = eng.process_clip(np.stack([frame, frame]))
    np.testing.assert_array_equal(clip[0], out)


def test_flow_num_inputs_below_two_rejected():
    """num_inputs counts the current frame plus the last-frame shift
    register; 1 leaves the register empty and used to IndexError at
    trace time -- must fail at build with a clear message."""
    import pytest

    config = _config()
    config["flow"]["num_inputs"] = 1
    with pytest.raises(ValueError, match="num_inputs must be >= 2"):
        create_models(config, seed=0)
