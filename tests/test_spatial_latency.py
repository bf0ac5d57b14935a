"""Spatial (latency-mode) sharding: ONE stream's frame split across
chips along H; GSPMD inserts the conv halo exchanges and the warp-table
all-gathers automatically.  Correctness vs the single-device engine."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from joshupscale_tpu.models import create_models
from joshupscale_tpu.runtime.engine import Engine


def _build():
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
            "frame_height": 16,
            "frame_width": 12,
        },
    }
    return create_models(config, seed=9)["inference"]


def test_spatially_sharded_stream_matches_single_device(rng):
    built = _build()
    model = built.obj
    mesh = Mesh(np.asarray(jax.devices()[:4]), ("sp",))
    repl = NamedSharding(mesh, P())
    row = NamedSharding(mesh, P(None, "sp"))  # shard H of NHWC

    def shard_state(state):
        return {
            "pre_gen": jax.device_put(state["pre_gen"], row),
            "last_frames": [
                jax.device_put(f, row) for f in state["last_frames"]
            ],
        }

    @jax.jit
    def step(params, frame, state):
        outputs, new_state = model.apply(params, frame, state)
        return outputs["output"], new_state

    params = jax.device_put(built.params, repl)
    state = shard_state(model.init_state(1))

    eng = Engine(built.obj,
                 jax.tree_util.tree_map(jnp.array, built.params))

    frames = rng.integers(0, 256, (3, 1, 16, 12, 3)).astype(np.uint8)
    for t in range(3):
        frame = jax.device_put(jnp.asarray(frames[t]), row)
        out, state = step(params, frame, state)
        ref = eng.process(frames[t])
        np.testing.assert_array_equal(np.asarray(out), ref)


def test_spatial_engine_api(rng):
    from joshupscale_tpu.parallel.serving import SpatialEngine

    built = _build()
    mesh = Mesh(np.asarray(jax.devices()[:4]), ("sp",))
    eng = SpatialEngine(built.obj, built.params, mesh=mesh)
    ref = Engine(built.obj,
                 jax.tree_util.tree_map(jnp.array, built.params))
    frames = rng.integers(0, 256, (3, 16, 12, 3)).astype(np.uint8)
    for f in frames:
        np.testing.assert_array_equal(eng.process(f), ref.process(f))
    eng.reset()
    out = eng.process(frames[0])
    assert out.shape == (64, 48, 3)
