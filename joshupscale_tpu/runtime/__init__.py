"""Serving runtime: compiled engines with on-device recurrent state,
sequential video streams, and the persistent compilation cache."""

from joshupscale_tpu.runtime.engine import (
    Engine,
    create_runtime,
    enable_compilation_cache,
)
from joshupscale_tpu.runtime.stream import VideoStream

__all__ = [
    "Engine",
    "create_runtime",
    "enable_compilation_cache",
    "VideoStream",
]
