"""Int8 quantization tests: weight quant round-trip, quantized conv
accuracy, full-model int8 inference, calibration sweep."""

import numpy as np
import jax
import jax.numpy as jnp

from joshupscale_tpu.export.quantize import (
    calibrate,
    quantize_kernel_int8,
    quantize_params_int8,
)
from joshupscale_tpu.models import create_models
from joshupscale_tpu.nn.layers import conv2d


def test_kernel_quant_roundtrip(rng):
    k = rng.standard_normal((3, 3, 16, 32)).astype(np.float32)
    q, scale = quantize_kernel_int8(k)
    assert q.dtype == np.int8 and scale.shape == (32,)
    deq = q.astype(np.float32) * scale
    # Max error bounded by half a quantization step per channel.
    err = np.abs(deq - k).max(axis=(0, 1, 2))
    assert (err <= scale * 0.5 + 1e-7).all()


def test_quantized_conv_close_to_float(rng):
    x = jnp.asarray(rng.random((1, 16, 16, 16), np.float32) - 0.5)
    k = rng.standard_normal((3, 3, 16, 32)).astype(np.float32) * 0.1
    params = {"kernel": jnp.asarray(k),
              "bias": jnp.asarray(rng.standard_normal(32, ) * 0.01,
                                  dtype=jnp.float32)}
    ref = np.asarray(conv2d(params, x))
    qparams = quantize_params_int8(params, min_elements=0)
    assert "kernel_q" in qparams and "kernel" not in qparams
    out = np.asarray(conv2d(qparams, x))
    # int8 conv: relative error ~1% of dynamic range.
    scale = np.abs(ref).max()
    assert np.abs(out - ref).max() < 0.02 * scale + 1e-3


def test_small_kernels_stay_float(rng):
    params = {"kernel": jnp.asarray(
        rng.standard_normal((1, 1, 4, 4)).astype(np.float32))}
    q = quantize_params_int8(params, min_elements=4096)
    assert "kernel" in q and "kernel_q" not in q


def _tiny_inference():
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
            "s2d_mode": False,
        },
    }
    return create_models(config, seed=2)["inference"]


def test_full_model_int8_inference(rng):
    built = _tiny_inference()
    model = built.obj
    qparams = quantize_params_int8(built.params, min_elements=0)
    frame = jnp.asarray(
        rng.integers(0, 256, (1, 8, 12, 3)).astype(np.uint8))
    state = model.init_state(1)
    ref, _ = model.apply(built.params, frame, state)
    out, new_state = model.apply(qparams, frame, model.init_state(1))
    assert out["output"].shape == (1, 32, 48, 3)
    # Quantized output should track the float output loosely (clip and
    # bilinear-skip dominate a random-weight model).
    diff = np.abs(
        np.asarray(out["output_raw"]) - np.asarray(ref["output_raw"]))
    assert diff.mean() < 0.05
    assert np.isfinite(np.asarray(out["output_raw"])).all()


def test_calibration_records_ranges(rng):
    built = _tiny_inference()
    model = built.obj
    frames = jnp.asarray(
        rng.integers(0, 256, (3, 1, 8, 12, 3)).astype(np.uint8))
    ranges = calibrate(model, built.params, frames)
    assert ranges  # at least the BN observation points
    assert all(v >= 0 for v in ranges.values())
    assert any(k.startswith("flow.") for k in ranges)
    assert any(k.startswith("generator.") for k in ranges)
