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


def test_kl_threshold_gaussian_clips_outliers():
    """Entropy calibration must clip a long-tailed distribution well
    below its absmax (the point of the TensorRT Entropy rule) and keep
    a uniform distribution at (near) full range."""
    from joshupscale_tpu.export.quantize import kl_threshold

    rng = np.random.default_rng(0)
    # |N(0,1)| samples plus a tiny far-outlier tail at 20 sigma.
    x = np.abs(rng.standard_normal(200_000))
    x = np.concatenate([x, np.full(5, 20.0)])
    hist, _ = np.histogram(x, bins=2048, range=(0.0, 20.0))
    i = kl_threshold(hist)
    clip = (i + 0.5) * 20.0 / 2048
    assert clip < 8.0  # clipped far below the 20.0 absmax
    assert clip > 2.0  # but keeps the distribution body

    u = rng.uniform(0.0, 1.0, 100_000)
    hist_u, _ = np.histogram(u, bins=2048, range=(0.0, 1.0))
    i_u = kl_threshold(hist_u)
    assert (i_u + 0.5) / 2048 > 0.9  # uniform: no clipping win


def test_kl_threshold_degenerate():
    from joshupscale_tpu.export.quantize import kl_threshold

    assert kl_threshold(np.zeros(2048)) == 2048
    assert kl_threshold(np.ones(64)) == 64  # fewer bins than levels


def test_calibrate_entropy_method(rng):
    """Entropy ranges exist for every minmax path and never exceed the
    absmax range."""
    built = _tiny_inference()
    model = built.obj
    frames = jnp.asarray(
        rng.integers(0, 256, (3, 1, 8, 12, 3)).astype(np.uint8))
    minmax = calibrate(model, built.params, frames)
    entropy = calibrate(model, built.params, frames, method="entropy",
                        bins=512)
    assert set(entropy) == set(minmax)
    for k in minmax:
        assert 0.0 <= entropy[k] <= minmax[k] * 1.001 + 1e-6
    # the quantizer consumes them unchanged
    q = quantize_params_int8(built.params, min_elements=0,
                             ranges=entropy)
    out, _ = model.apply(q, jnp.asarray(
        rng.integers(0, 256, (1, 8, 12, 3)).astype(np.uint8)),
        model.init_state(1))
    assert np.isfinite(np.asarray(out["output_raw"])).all()
