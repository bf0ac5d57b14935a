"""Multi-stream serving: independent streams sharded across chips.

Measured on v5e, batching streams on ONE chip scales badly (the warp
gather table spills VMEM at batch >= 2: batch-2 costs 2x per stream).
The TPU-native multi-stream design instead shards the stream (batch)
dimension across a 1-D device mesh with ``shard_map``, so every chip
runs exactly the single-stream program -- VMEM-resident gather table,
per-chip recurrent state, zero cross-chip communication (streams are
independent; nothing rides ICI).

This is the serving analog of the reference running one OBS filter
instance per GPU; here N chips serve N real-time streams from one
process with one compiled program.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


class SpatialEngine:
    """ONE stream's frame split across chips (latency mode).

    Activations and recurrent state are sharded along H over a 1-D mesh;
    GSPMD partitions the convolutions with halo exchanges over ICI and
    all-gathers the warp's (VMEM-sized) block table per frame.  Use when
    a single stream must hit a latency target one chip can't; throughput
    mode (independent streams) should use ShardedEngine instead.
    Numerically exact vs the single-chip engine
    (tests/test_spatial_latency.py).
    """

    def __init__(self, model, params, mesh: Optional[Mesh] = None):
        if mesh is None:
            mesh = Mesh(np.asarray(jax.devices()), ("sp",))
        self.model = model
        self.mesh = mesh
        repl = NamedSharding(mesh, P())
        self._row = NamedSharding(mesh, P(None, "sp"))
        self.params = jax.device_put(params, repl)

        def step(p, frame, state):
            outputs, new_state = model.apply(p, frame, state)
            out = outputs.get("output", outputs["output_denorm"])
            return out, new_state

        self._step = jax.jit(step, donate_argnums=(2,))
        self.state = self._shard_state(model.init_state(1))

    def _shard_state(self, state):
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, self._row), state
        )

    def reset(self) -> None:
        self.state = self._shard_state(self.model.init_state(1))

    def process(self, frame: np.ndarray) -> np.ndarray:
        if frame.ndim == 3:
            frame = frame[None]
        x = jax.device_put(jnp.asarray(frame), self._row)
        out, self.state = self._step(self.params, x, self.state)
        return np.asarray(out)[0]


class ShardedEngine:
    """N independent recurrent streams, one per mesh device."""

    def __init__(
        self,
        model,
        params: Dict[str, Any],
        mesh: Optional[Mesh] = None,
        streams_per_device: int = 1,
    ) -> None:
        if mesh is None:
            mesh = Mesh(np.asarray(jax.devices()), ("stream",))
        self.model = model
        self.mesh = mesh
        self.num_devices = mesh.devices.size
        self.batch_size = self.num_devices * streams_per_device

        repl = NamedSharding(mesh, P())
        shard = NamedSharding(mesh, P("stream"))
        self.params = jax.device_put(params, repl)

        state_specs = jax.tree_util.tree_map(
            lambda _: P("stream"), model.init_state(self.batch_size)
        )

        def local_step(p, frame, state):
            outputs, new_state = model.apply(p, frame, state)
            out = outputs.get("output", outputs["output_denorm"])
            return out, new_state

        sharded = shard_map(
            local_step,
            mesh=mesh,
            in_specs=(
                jax.tree_util.tree_map(lambda _: P(), params),
                P("stream"),
                state_specs,
            ),
            out_specs=(P("stream"), state_specs),
        )
        self._step = jax.jit(sharded, donate_argnums=(2,))

        self.state = jax.device_put(
            model.init_state(self.batch_size), shard
        )
        self._shard = shard

    @property
    def input_shape(self):
        return (self.batch_size, self.model.frame_height,
                self.model.frame_width, 3)

    def reset(self) -> None:
        self.state = jax.device_put(
            self.model.init_state(self.batch_size), self._shard
        )

    def process(self, frames: np.ndarray) -> np.ndarray:
        """One step for ALL streams: (B, H, W, 3) -> (B, 4H, 4W, 3)."""
        frames = np.asarray(frames)
        if frames.shape != self.input_shape:
            raise ValueError(
                f"Invalid frames shape {frames.shape}; expected "
                f"{self.input_shape}"
            )
        x = jax.device_put(jnp.asarray(frames), self._shard)
        out, self.state = self._step(self.params, x, self.state)
        return np.asarray(out)
