"""Glue for the embedded-Python native runtime (native/).

The C++ host library (native/src/python_backend.cc) embeds CPython and
talks to the engine exclusively through this module with a bytes-based
ABI, so the C++ side needs no NumPy/JAX C API:

    eng = NativeEngine(model_path, device_id)
    out: bytes = eng.process_bytes(frame_bytes)   # HWC uint8 BGR

The TPU-native analog of reference ``core/src/tensorrt_backend.cc``'s
process(): one frame in, one frame out, recurrent state held on-device
inside the engine.
"""

from __future__ import annotations

import numpy as np


class NativeEngine:
    """Bytes-ABI wrapper over the JAX Engine for the C++ host runtime."""

    def __init__(self, model_path: str, device_id: int = 0,
                 batch_size: int = 1):
        import jax

        from joshupscale_tpu.runtime.engine import create_runtime

        n = len(jax.devices())
        if not 0 <= device_id < n:
            raise ValueError(f"Invalid device {device_id}; {n} available")
        self.engine = create_runtime(
            model_path, device=device_id, batch_size=batch_size
        )
        model = self.engine.model
        self.input_width = model.frame_width
        self.input_height = model.frame_height
        self.output_width = model.frame_width * 4
        self.output_height = model.frame_height * 4
        self._in_nbytes = (
            batch_size * self.input_height * self.input_width * 3
        )

    def process_bytes(self, data: bytes) -> bytes:
        if len(data) != self._in_nbytes:
            raise ValueError(
                f"Expected {self._in_nbytes} bytes, got {len(data)}"
            )
        frame = np.frombuffer(data, np.uint8).reshape(
            self.engine.input_shape
        )
        return np.ascontiguousarray(
            self.engine.process(frame)
        ).tobytes()

    def reset(self) -> None:
        self.engine.reset()
