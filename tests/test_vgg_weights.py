"""VGG19 pretrained-weights path: keras_vgg_to_npz tool + loading.

The reference's perceptual loss runs on ImageNet VGG19 features
(reference scripts/training/models.py:938-989).  Real weights cannot be
downloaded here, so these tests synthesize h5 files in both Keras layouts
with the exact VGG19 topology, convert with tools/keras_vgg_to_npz.py,
and require that build_vgg(weights_path=...) loads them verbatim and
changes the perceptual features.
"""

import os
import sys

import numpy as np
import pytest

h5py = pytest.importorskip("h5py")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
from keras_vgg_to_npz import _CHANNELS, convert  # noqa: E402

from joshupscale_tpu.models.vgg import build_vgg, vgg19_apply  # noqa: E402


def _random_vgg_weights(rng):
    return {
        layer: (
            rng.standard_normal((3, 3, cin, cout)).astype(np.float32)
            * 0.05,
            rng.standard_normal((cout,)).astype(np.float32) * 0.1,
        )
        for layer, (cin, cout) in _CHANNELS.items()
    }


def _write_legacy_h5(path, weights):
    """Keras-applications topology layout: <layer>/<layer>/kernel:0."""
    with h5py.File(path, "w") as f:
        f.attrs["layer_names"] = [
            name.encode() for name in weights
        ]
        for name, (k, b) in weights.items():
            g = f.create_group(name)
            g.attrs["weight_names"] = [
                f"{name}/kernel:0".encode(),
                f"{name}/bias:0".encode(),
            ]
            inner = g.create_group(name)
            inner.create_dataset("kernel:0", data=k)
            inner.create_dataset("bias:0", data=b)


def _write_keras3_h5(path, weights):
    """Keras 3 .weights.h5 layout: layers/<layer>/vars/{0,1}."""
    with h5py.File(path, "w") as f:
        layers = f.create_group("layers")
        for name, (k, b) in weights.items():
            var = layers.create_group(name).create_group("vars")
            var.create_dataset("0", data=k)
            var.create_dataset("1", data=b)


@pytest.mark.parametrize("layout", ["legacy", "keras3"])
def test_convert_and_load(tmp_path, rng, layout):
    weights = _random_vgg_weights(rng)
    h5_path = str(tmp_path / f"vgg19_{layout}.h5")
    npz_path = str(tmp_path / "vgg19.npz")
    writer = _write_legacy_h5 if layout == "legacy" else _write_keras3_h5
    writer(h5_path, weights)

    convert(h5_path, npz_path)

    params, apply = build_vgg(
        jax.random.PRNGKey(0), weights_path=npz_path)
    for layer, (k, b) in weights.items():
        np.testing.assert_array_equal(
            np.asarray(params[layer]["kernel"]), k)
        np.testing.assert_array_equal(np.asarray(params[layer]["bias"]), b)


def test_weights_change_perceptual_features(tmp_path, rng):
    weights = _random_vgg_weights(rng)
    h5_path = str(tmp_path / "vgg19.h5")
    npz_path = str(tmp_path / "vgg19.npz")
    _write_keras3_h5(h5_path, weights)
    convert(h5_path, npz_path)

    x = jnp.asarray(rng.random((1, 48, 48, 3), np.float32) - 0.5)
    random_params, _ = build_vgg(jax.random.PRNGKey(0))
    loaded_params, _ = build_vgg(
        jax.random.PRNGKey(0), weights_path=npz_path)
    feats_random = vgg19_apply(random_params, x)
    feats_loaded = vgg19_apply(loaded_params, x)
    # Same topology, different weights: features must differ materially.
    for fr, fl in zip(feats_random, feats_loaded):
        assert fr.shape == fl.shape
        assert not np.allclose(np.asarray(fr), np.asarray(fl))


def test_registry_vgg_weights_key(tmp_path, rng):
    """configs wire models.vgg.weights -> build_vgg(weights_path=...)."""
    from joshupscale_tpu.models.registry import create_models

    weights = _random_vgg_weights(rng)
    h5_path = str(tmp_path / "vgg19.h5")
    npz_path = str(tmp_path / "vgg19.npz")
    _write_keras3_h5(h5_path, weights)
    convert(h5_path, npz_path)

    models = create_models(
        {"vgg": {"name": "vgg", "weights": npz_path}}, seed=0)
    params = models["vgg"].params
    np.testing.assert_array_equal(
        np.asarray(params["block5_conv4"]["kernel"]),
        weights["block5_conv4"][0],
    )


def test_bad_h5_rejected(tmp_path):
    path = str(tmp_path / "not_vgg.h5")
    with h5py.File(path, "w") as f:
        f.create_dataset("conv/kernel:0", data=np.zeros((3, 3, 3, 8)))
    with pytest.raises(SystemExit, match="missing VGG19"):
        convert(path, str(tmp_path / "out.npz"))
