"""Keras .h5 weight import: build the reference topology in Keras, save
weights, import into our param tree, and require identical outputs.

This is the real-weights path: reference users bring Keras h5
checkpoints (reference train_local.py saves weights .h5 + arch .json).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

tf = pytest.importorskip("tensorflow")
keras = tf.keras
layers = keras.layers

from joshupscale_tpu.export.importer import load_keras_h5  # noqa: E402
from joshupscale_tpu.models.fnet import (  # noqa: E402
    flow_resnet_apply,
    flow_resnet_init,
)


def _keras_flow(n_blocks, filters):
    inputs = [keras.Input(shape=(None, None, 3)) for _ in range(4)]
    x = layers.Concatenate()(inputs)
    x = layers.Conv2D(filters, 3, padding="same", use_bias=False,
                      name="conv_1")(x)
    x = layers.BatchNormalization(name="bn_1")(x)
    x = layers.ReLU()(x)
    for i in range(n_blocks):
        name = f"block_{i + 1}"
        shortcut = x
        x = layers.Conv2D(filters, 3, padding="same", use_bias=False,
                          name=f"{name}_conv_1")(x)
        x = layers.BatchNormalization(name=f"{name}_bn_1")(x)
        x = layers.ReLU()(x)
        x = layers.Conv2D(filters, 3, padding="same", use_bias=False,
                          name=f"{name}_conv_2")(x)
        x = layers.BatchNormalization(name=f"{name}_bn_2")(x)
        x = layers.Add()([x, shortcut])
        x = layers.ReLU()(x)
    x = layers.Conv2D(32, 1, padding="same", name="conv_2")(x)
    x = layers.Lambda(lambda t: tf.nn.depth_to_space(t, 4))(x)
    return keras.Model(inputs, x)


def test_h5_flow_import_roundtrip(rng, tmp_path):
    n_blocks, filters = 2, 8
    km = _keras_flow(n_blocks, filters)
    # Randomize all weights (including BN stats) so import is exercised.
    for w in km.weights:
        w.assign(rng.standard_normal(w.shape).astype(np.float32) * 0.1
                 + (1.0 if "variance" in w.name or "gamma" in w.name
                    else 0.0))
    path = str(tmp_path / "flow.weights.h5")
    km.save_weights(path)

    template = flow_resnet_init(
        jax.random.PRNGKey(0), num_inputs=4, num_filters=filters,
        num_res_blocks=n_blocks,
    )
    params = load_keras_h5(path, template)

    frames_np = [rng.standard_normal((1, 8, 12, 3)).astype(np.float32)
                 for _ in range(4)]
    ours = np.asarray(flow_resnet_apply(
        params, [jnp.asarray(f) for f in frames_np],
        num_res_blocks=n_blocks,
    ))
    ref = km([tf.constant(f) for f in frames_np], training=False).numpy()
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-4)


def test_h5_import_rejects_mismatched_model(rng, tmp_path):
    km = _keras_flow(1, 8)
    path = str(tmp_path / "flow.weights.h5")
    km.save_weights(path)
    # Template with MORE blocks than the checkpoint: must fail loudly.
    template = flow_resnet_init(
        jax.random.PRNGKey(0), num_inputs=4, num_filters=8,
        num_res_blocks=3,
    )
    with pytest.raises(KeyError):
        load_keras_h5(path, template)


def test_h5_export_roundtrip_bit_identical(rng, tmp_path):
    """save_keras_h5 (legacy by-name layout) -> load_keras_h5 must
    reproduce every array bit-identically: the exit door back into the
    reference's Keras checkpoint ecosystem."""
    from joshupscale_tpu.export.importer import save_keras_h5

    n_blocks, filters = 2, 8
    template = flow_resnet_init(
        jax.random.PRNGKey(3), num_inputs=4, num_filters=filters,
        num_res_blocks=n_blocks,
    )
    path = str(tmp_path / "export.h5")
    save_keras_h5(path, template)
    loaded = load_keras_h5(path, template)

    flat_t = jax.tree_util.tree_leaves_with_path(template)
    flat_l = jax.tree_util.tree_leaves_with_path(loaded)
    assert len(flat_t) == len(flat_l) and len(flat_t) > 0
    for (kp_t, a), (kp_l, b) in zip(flat_t, flat_l):
        assert kp_t == kp_l
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_h5_export_layer_names_match_keras(rng, tmp_path):
    """Exported layer names must equal the reference Keras topology's
    layer names (so by-name interchange is possible)."""
    import h5py

    from joshupscale_tpu.export.importer import save_keras_h5

    km = _keras_flow(2, 8)
    keras_layers = {
        layer.name for layer in km.layers if layer.weights
    }
    template = flow_resnet_init(
        jax.random.PRNGKey(0), num_inputs=4, num_filters=8,
        num_res_blocks=2,
    )
    path = str(tmp_path / "export.h5")
    save_keras_h5(path, template)
    with h5py.File(path, "r") as f:
        exported = {n.decode() if isinstance(n, bytes) else str(n)
                    for n in f.attrs["layer_names"]}
    assert exported == keras_layers


def test_h5_roundtrip_preserves_fade_counter(tmp_path):
    """Fade-in layer state (counter) survives the legacy-h5 round trip
    (reference FadeInLayer persists it via save_own_variables); the
    period is layer config and keeps the template's value."""
    import jax.numpy as jnp

    from joshupscale_tpu.export.importer import (
        load_keras_h5, save_keras_h5)
    from joshupscale_tpu.models.common import res_block_init

    key = jax.random.PRNGKey(0)
    params = {"block_1": res_block_init(key, 8, fade_in_period=100)}
    params["block_1"]["fade"]["counter"] = jnp.asarray(42, jnp.int64)
    path = str(tmp_path / "w.h5")
    save_keras_h5(path, params)

    template = {"block_1": res_block_init(key, 8, fade_in_period=100)}
    loaded = load_keras_h5(path, template)
    assert int(loaded["block_1"]["fade"]["counter"]) == 42
    assert float(loaded["block_1"]["fade"]["period"]) == 100.0
