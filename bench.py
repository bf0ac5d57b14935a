"""Headline benchmark: real-time 480x270 -> 1920x1080 recurrent upscale.

Runs the flagship quality model (flow 64f/10rb + generator 64f/24rb, the
reference's default architecture) as a single recurrent stream on one
chip, bfloat16 compute (the TPU analog of the reference's fp16 TensorRT
engines), and reports p50-derived FPS against the 60 fps real-time
target (BASELINE.md: >= 1 real-time 1080p60 stream per chip, p50
< 16.6 ms).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys

import numpy as np


def main():
    import jax

    from joshupscale_tpu.models import create_models
    from joshupscale_tpu.runtime.engine import Engine

    config = {
        "flow": {"name": "flow-resnet", "num_inputs": 4,
                 "num_filters": 64, "num_res_blocks": 10},
        "generator": {"name": "generator-resnet", "num_filters": 64,
                      "num_res_blocks": 24},
        "inference": {
            "name": "inference",
            "generator": {"model": "generator"},
            "flow": {"model": "flow"},
            "skip_processing": False,
            "frame_height": 270,
            "frame_width": 480,
            "compute_dtype": "bfloat16",
        },
    }
    models = create_models(config, seed=0)
    built = models["inference"]

    engine = Engine(built.obj, built.params, batch_size=1)
    stats = engine.benchmark(num_frames=120, warmup=20)

    fps = 1.0 / stats["p50"]
    result = {
        "metric": "fps_480x270_to_1080p_quality_stream",
        "value": round(fps, 2),
        "unit": "fps",
        "vs_baseline": round(fps / 60.0, 4),
        "p50_ms": round(stats["p50"] * 1e3, 3),
        "p99_ms": round(stats["p99"] * 1e3, 3),
        "mean_ms": round(stats["mean"] * 1e3, 3),
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
