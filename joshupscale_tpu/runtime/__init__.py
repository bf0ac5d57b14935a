"""Serving runtime: compiled engines with on-device recurrent state,
sequential video streams, and multi-stream batching."""

from joshupscale_tpu.runtime.engine import Engine, create_runtime
from joshupscale_tpu.runtime.stream import VideoStream

__all__ = ["Engine", "create_runtime", "VideoStream"]
