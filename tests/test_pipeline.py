"""Two-chip pipelined serving (parallel.PipelinedEngine): the flow |
generator split across two devices must reproduce the single-chip
engine exactly, streamed and as a clip, across the serving variants."""

import numpy as np
import pytest
import jax

from joshupscale_tpu.models import create_models
from joshupscale_tpu.parallel import PipelinedEngine
from joshupscale_tpu.runtime.engine import Engine


def _build(**inference_overrides):
    config = {
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
            **inference_overrides,
        },
    }
    return create_models(config, seed=5)["inference"]


@pytest.mark.parametrize("variant", [
    {},
    {"s2d_mode": True},
    {"s2d_mode": True, "deferred_display": True},
    {"normalize_brightness": True},
])
def test_pipelined_matches_single_engine(rng, variant):
    built = _build(**variant)
    devices = jax.devices()[:2]
    single = Engine(built.obj, built.params)
    piped = PipelinedEngine(built.obj, built.params, devices=devices)
    assert piped.flow_device != piped.gen_device

    frames = rng.integers(0, 256, (5, 8, 12, 3)).astype(np.uint8)

    want = [single.process(f) for f in frames]
    got = [piped.process(f) for f in frames]
    for t, (a, b) in enumerate(zip(want, got)):
        np.testing.assert_array_equal(a, b, err_msg=f"frame {t}")

    # Clip mode after reset matches the stream.
    piped.reset()
    clip = piped.process_clip(frames)
    np.testing.assert_array_equal(clip, np.stack(want))


def test_pipelined_reset_and_shape_validation(rng):
    built = _build()
    piped = PipelinedEngine(built.obj, built.params,
                            devices=jax.devices()[:2])
    frames = rng.integers(0, 256, (3, 8, 12, 3)).astype(np.uint8)
    first = piped.process(frames[0])
    for f in frames[1:]:
        piped.process(f)
    piped.reset()
    again = piped.process(frames[0])
    np.testing.assert_array_equal(first, again)

    with pytest.raises(ValueError):
        piped.process(np.zeros((4, 4, 3), np.uint8))


def test_pipelined_rejects_remove_flow(rng):
    built = _build(remove_flow=True)
    with pytest.raises(ValueError):
        PipelinedEngine(built.obj, built.params,
                        devices=jax.devices()[:2])


def test_pipelined_state_lives_per_device():
    built = _build()
    devices = jax.devices()[:2]
    piped = PipelinedEngine(built.obj, built.params, devices=devices)
    flow_devs = {a.devices().pop()
                 for a in jax.tree_util.tree_leaves(piped.flow_state)}
    gen_devs = {a.devices().pop()
                for a in jax.tree_util.tree_leaves(piped.gen_state)}
    assert flow_devs == {devices[0]}
    assert gen_devs == {devices[1]}
