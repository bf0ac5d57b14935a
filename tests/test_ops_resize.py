"""Resize ops vs the TF1 legacy-grid oracle.

The oracle is TensorFlow's own ``tf.compat.v1.image.resize_*`` with
align_corners=False, half_pixel_centers=False -- exactly what the reference
models were trained with.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from joshupscale_tpu.ops import (
    resize_bilinear,
    resize_nearest,
    upscale_bilinear,
    upscale_nearest,
)

tf = pytest.importorskip("tensorflow")


def tf_bilinear(x, h, w):
    return tf.compat.v1.image.resize_bilinear(
        images=tf.constant(x), size=[h, w],
        align_corners=False, half_pixel_centers=False,
    ).numpy()


def tf_nearest(x, h, w):
    return tf.compat.v1.image.resize_nearest_neighbor(
        images=tf.constant(x), size=[h, w],
        align_corners=False, half_pixel_centers=False,
    ).numpy()


@pytest.mark.parametrize("scale", [2, 4])
@pytest.mark.parametrize("shape", [(1, 7, 9, 3), (2, 16, 12, 3)])
def test_upscale_bilinear_matches_tf1(rng, scale, shape):
    x = rng.standard_normal(shape).astype(np.float32)
    ours = np.asarray(upscale_bilinear(jnp.asarray(x), scale))
    ref = tf_bilinear(x, shape[1] * scale, shape[2] * scale)
    np.testing.assert_allclose(ours, ref, atol=1e-6, rtol=1e-6)


@pytest.mark.parametrize("scale", [2, 4])
def test_upscale_nearest_matches_tf1(rng, scale):
    x = rng.standard_normal((2, 5, 6, 3)).astype(np.float32)
    ours = np.asarray(upscale_nearest(jnp.asarray(x), scale))
    ref = tf_nearest(x, 5 * scale, 6 * scale)
    np.testing.assert_array_equal(ours, ref)


@pytest.mark.parametrize("out_hw", [(10, 14), (3, 5), (17, 23)])
def test_general_resize_bilinear(rng, out_hw):
    x = rng.standard_normal((1, 8, 11, 3)).astype(np.float32)
    ours = np.asarray(resize_bilinear(jnp.asarray(x), *out_hw))
    ref = tf_bilinear(x, *out_hw)
    np.testing.assert_allclose(ours, ref, atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("out_hw", [(2, 3), (13, 7)])
def test_general_resize_nearest(rng, out_hw):
    x = rng.standard_normal((1, 8, 11, 3)).astype(np.float32)
    ours = np.asarray(resize_nearest(jnp.asarray(x), *out_hw))
    ref = tf_nearest(x, *out_hw)
    np.testing.assert_array_equal(ours, ref)


def test_downscale_nearest_quarter(rng):
    """The dataset pipeline derives LR frames via nearest x1/4 downscale."""
    x = rng.standard_normal((1, 32, 48, 3)).astype(np.float32)
    ours = np.asarray(resize_nearest(jnp.asarray(x), 8, 12))
    ref = tf_nearest(x, 8, 12)
    np.testing.assert_array_equal(ours, ref)
