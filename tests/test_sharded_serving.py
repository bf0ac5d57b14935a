"""Multi-stream sharded serving: 8 streams over an 8-device mesh must
reproduce 8 independent single-stream engines exactly."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from joshupscale_tpu.models import create_models
from joshupscale_tpu.parallel.serving import ShardedEngine
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
            "frame_height": 8,
            "frame_width": 12,
        },
    }
    return create_models(config, seed=5)["inference"]


def test_sharded_streams_match_independent_engines(rng):
    built = _build()
    mesh = Mesh(np.asarray(jax.devices()[:8]), ("stream",))
    sharded = ShardedEngine(built.obj, built.params, mesh=mesh)
    assert sharded.batch_size == 8

    frames = rng.integers(0, 256, (3, 8, 8, 12, 3)).astype(np.uint8)

    outs = [sharded.process(frames[t]) for t in range(3)]

    # Oracle: one single-stream engine per stream, run sequentially.
    for s in range(8):
        eng = Engine(built.obj,
                     jax.tree_util.tree_map(jnp.array, built.params))
        for t in range(3):
            ref = eng.process(frames[t, s])
            np.testing.assert_array_equal(outs[t][s], ref)


def test_sharded_reset(rng):
    built = _build()
    mesh = Mesh(np.asarray(jax.devices()[:4]), ("stream",))
    sharded = ShardedEngine(built.obj, built.params, mesh=mesh)
    frames = rng.integers(0, 256, (4, 8, 12, 3)).astype(np.uint8)
    a = sharded.process(frames)
    sharded.process(frames)
    sharded.reset()
    b = sharded.process(frames)
    np.testing.assert_array_equal(a, b)
