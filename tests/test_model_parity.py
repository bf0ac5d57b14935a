"""Numerical parity vs Keras-built equivalents of the reference topology.

These tests construct the same architectures with stock Keras layers
(Conv2D / BatchNormalization / Conv2DTranspose / tf.nn.depth_to_space /
TF1 resize), copy OUR parameters into them, and require the outputs to
match to float32 tolerance.  This pins down conv padding, BN folding, the
deconv-as-matmul trick, channel orders, and the full recurrent step.
"""

import numpy as np
import pytest
import jax.numpy as jnp

import jax

tf = pytest.importorskip("tensorflow")
keras = tf.keras
layers = keras.layers

from joshupscale_tpu.models import (  # noqa: E402
    create_models,
    flow_resnet_apply,
    flow_resnet_init,
    generator_resnet_apply,
    generator_resnet_init,
)
from joshupscale_tpu.models.discriminator import (  # noqa: E402
    discriminator_apply,
    discriminator_init,
)

ATOL = 2e-4


def _keras_res_block(inp, num_filters, name):
    shortcut = inp
    x = layers.Conv2D(num_filters, 3, padding="same", use_bias=False,
                      name=f"{name}_conv_1")(inp)
    x = layers.BatchNormalization(name=f"{name}_bn_1")(x)
    x = layers.ReLU()(x)
    x = layers.Conv2D(num_filters, 3, padding="same", use_bias=False,
                      name=f"{name}_conv_2")(x)
    x = layers.BatchNormalization(name=f"{name}_bn_2")(x)
    x = layers.Add()([x, shortcut])
    return layers.ReLU()(x)


def _set_conv(model, lname, p):
    w = [np.asarray(p["kernel"])]
    if "bias" in p:
        w.append(np.asarray(p["bias"]))
    model.get_layer(lname).set_weights(w)


def _set_bn(model, lname, p):
    model.get_layer(lname).set_weights([
        np.asarray(p["gamma"]), np.asarray(p["beta"]),
        np.asarray(p["moving_mean"]), np.asarray(p["moving_variance"]),
    ])


def _randomize_bn(params, rng):
    """Give BN non-trivial stats so folding is actually exercised."""
    import jax.numpy as jnp

    def walk(t):
        if isinstance(t, dict):
            if "moving_mean" in t:
                n = t["moving_mean"].shape[0]
                t = dict(t)
                t["moving_mean"] = jnp.asarray(
                    rng.standard_normal(n).astype(np.float32) * 0.1)
                t["moving_variance"] = jnp.asarray(
                    (0.5 + rng.random(n) * 2).astype(np.float32))
                t["gamma"] = jnp.asarray(
                    (0.8 + rng.random(n) * 0.4).astype(np.float32))
                t["beta"] = jnp.asarray(
                    rng.standard_normal(n).astype(np.float32) * 0.1)
                return t
            return {k: walk(v) for k, v in t.items()}
        return t

    return walk(params)


def test_flow_resnet_parity(rng):
    n_blocks, filters = 2, 8
    params = flow_resnet_init(
        jax.random.PRNGKey(3), num_inputs=4, num_filters=filters,
        num_res_blocks=n_blocks,
    )
    params = _randomize_bn(params, rng)

    inputs = [keras.Input(shape=(None, None, 3)) for _ in range(4)]
    x = layers.Concatenate()(inputs)
    x = layers.Conv2D(filters, 3, padding="same", use_bias=False,
                      name="conv_1")(x)
    x = layers.BatchNormalization(name="bn_1")(x)
    x = layers.ReLU()(x)
    for i in range(n_blocks):
        x = _keras_res_block(x, filters, f"block_{i + 1}")
    x = layers.Conv2D(32, 1, padding="same", name="conv_2")(x)
    x = layers.Lambda(lambda t: tf.nn.depth_to_space(t, 4))(x)
    km = keras.Model(inputs, x)

    _set_conv(km, "conv_1", params["conv_1"])
    _set_bn(km, "bn_1", params["bn_1"])
    _set_conv(km, "conv_2", params["conv_2"])
    for i in range(n_blocks):
        b = params[f"block_{i + 1}"]
        _set_conv(km, f"block_{i + 1}_conv_1", b["conv_1"])
        _set_bn(km, f"block_{i + 1}_bn_1", b["bn_1"])
        _set_conv(km, f"block_{i + 1}_conv_2", b["conv_2"])
        _set_bn(km, f"block_{i + 1}_bn_2", b["bn_2"])

    frames_np = [rng.standard_normal((2, 8, 12, 3)).astype(np.float32)
                 for _ in range(4)]
    ours = np.asarray(flow_resnet_apply(
        params, [jnp.asarray(f) for f in frames_np],
        num_res_blocks=n_blocks,
    ))
    ref = km([tf.constant(f) for f in frames_np], training=False).numpy()
    np.testing.assert_allclose(ours, ref, atol=ATOL, rtol=1e-4)


def test_generator_parity(rng):
    n_blocks, filters = 2, 8
    params = generator_resnet_init(
        jax.random.PRNGKey(4), num_filters=filters, num_res_blocks=n_blocks
    )
    params = _randomize_bn(params, rng)

    frame_in = keras.Input(shape=(None, None, 3))
    warp_in = keras.Input(shape=(None, None, 3))
    x = layers.Concatenate()([
        frame_in,
        layers.Lambda(lambda t: tf.nn.space_to_depth(t, 4))(warp_in),
    ])
    x = layers.Conv2D(filters, 3, padding="same", use_bias=False,
                      name="conv_1")(x)
    x = layers.BatchNormalization(name="bn_1")(x)
    x = layers.ReLU()(x)
    for i in range(n_blocks):
        x = _keras_res_block(x, filters, f"block_{i + 1}")
    x = layers.Conv2DTranspose(32, 2, strides=2, padding="same",
                               use_bias=False, name="conv_trans_1")(x)
    x = layers.BatchNormalization(name="bn_2")(x)
    x = layers.ReLU()(x)
    x = layers.Conv2DTranspose(3, 2, strides=2, padding="same",
                               name="conv_trans_2")(x)
    x = layers.Activation("tanh")(x)
    up = layers.Lambda(lambda t: tf.compat.v1.image.resize_bilinear(
        t, tf.shape(t)[1:3] * 4, align_corners=False,
        half_pixel_centers=False))(frame_in)
    x = layers.Add()([up, x])
    x = layers.Lambda(lambda t: tf.clip_by_value(t, -0.5, 0.5))(x)
    km = keras.Model([frame_in, warp_in], x)

    _set_conv(km, "conv_1", params["conv_1"])
    _set_bn(km, "bn_1", params["bn_1"])
    _set_bn(km, "bn_2", params["bn_2"])
    _set_conv(km, "conv_trans_1", params["conv_trans_1"])
    _set_conv(km, "conv_trans_2", params["conv_trans_2"])
    for i in range(n_blocks):
        b = params[f"block_{i + 1}"]
        _set_conv(km, f"block_{i + 1}_conv_1", b["conv_1"])
        _set_bn(km, f"block_{i + 1}_bn_1", b["bn_1"])
        _set_conv(km, f"block_{i + 1}_conv_2", b["conv_2"])
        _set_bn(km, f"block_{i + 1}_bn_2", b["bn_2"])

    frame = rng.standard_normal((1, 8, 12, 3)).astype(np.float32) * 0.3
    warp = rng.standard_normal((1, 32, 48, 3)).astype(np.float32) * 0.3
    ours = np.asarray(generator_resnet_apply(
        params, jnp.asarray(frame), jnp.asarray(warp)
    ))
    ref = km([tf.constant(frame), tf.constant(warp)],
             training=False).numpy()
    np.testing.assert_allclose(ours, ref, atol=ATOL, rtol=1e-4)


def test_discriminator_parity(rng):
    params = discriminator_init(jax.random.PRNGKey(5), alpha=0.25)
    params = _randomize_bn(params, rng)

    inp = keras.Input(shape=(32, 32, 27))
    x = layers.Conv2D(16, 3, padding="same", name="conv_1")(inp)
    x = layers.LeakyReLU()(x)
    outs = []
    for i, f in enumerate([16, 16, 32, 64], start=1):
        x = layers.Conv2D(f, 4, strides=2, padding="same", use_bias=False,
                          name=f"block_{i}_conv")(x)
        x = layers.BatchNormalization(name=f"block_{i}_bn")(x)
        x = layers.LeakyReLU()(x)
        outs.append(x)
    x = layers.Dense(1, name="dense")(x)
    outs.append(x)
    km = keras.Model(inp, outs)

    _set_conv(km, "conv_1", params["conv_1"])
    for i in range(1, 5):
        _set_conv(km, f"block_{i}_conv", params[f"block_{i}"]["conv"])
        _set_bn(km, f"block_{i}_bn", params[f"block_{i}"]["bn"])
    km.get_layer("dense").set_weights([
        np.asarray(params["dense"]["kernel"]),
        np.asarray(params["dense"]["bias"]),
    ])

    x_np = rng.standard_normal((2, 32, 32, 27)).astype(np.float32)
    ours = discriminator_apply(params, jnp.asarray(x_np))
    refs = km(tf.constant(x_np), training=False)
    for o, r in zip(ours, refs):
        np.testing.assert_allclose(np.asarray(o), r.numpy(), atol=ATOL,
                                   rtol=1e-4)


def test_inference_step_parity(rng):
    """Full recurrent step vs a TF/numpy composition of the same graph."""
    from tests.test_ops_warp import numpy_dense_image_warp

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
    models = create_models(config, seed=7)
    built = models["inference"]
    model = built.obj

    frame = rng.integers(0, 256, (1, 8, 12, 3)).astype(np.uint8)
    state = model.init_state(1)
    # Seed non-zero state to exercise the warp path.
    pre_gen = (rng.random((1, 32, 48, 3)).astype(np.float32) - 0.5)
    last_frames = [
        (rng.random((1, 8, 12, 3)).astype(np.float32) - 0.5)
        for _ in range(3)
    ]
    state = {"pre_gen": jnp.asarray(pre_gen),
             "last_frames": [jnp.asarray(f) for f in last_frames]}

    outputs, new_state = model.apply(built.params, jnp.asarray(frame), state)

    # Oracle composition.
    pre = frame.astype(np.float32) / 255.0 - 0.5
    flow = np.asarray(flow_resnet_apply(
        built.params["flow"],
        [jnp.asarray(pre)] + [jnp.asarray(f) for f in last_frames],
        num_res_blocks=1,
    ))
    pre_warp = numpy_dense_image_warp(pre_gen, flow)
    out_raw = np.asarray(generator_resnet_apply(
        built.params["generator"], jnp.asarray(pre), jnp.asarray(pre_warp)
    ))
    expected_u8 = ((out_raw + 0.5) * 255.0).astype(np.uint8)

    np.testing.assert_allclose(
        np.asarray(outputs["pre_warp"]), pre_warp, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(outputs["output_raw"]), out_raw, atol=1e-5)
    # uint8 truncation boundaries can flip on 1-ulp differences; allow 1.
    diff = np.abs(np.asarray(outputs["output"]).astype(np.int32)
                  - expected_u8.astype(np.int32))
    assert diff.max() <= 1
    np.testing.assert_allclose(
        np.asarray(new_state["last_frames"][0]), pre, atol=1e-6)


def test_flow_autoencoder_parity(rng):
    """Autoencoder FNet vs Keras: conv-conv-pool down, conv-conv-up
    ladder with TF1 bilinear 2x upsampling (reference models.py
    get_flow_autoencoder :334-481)."""
    from joshupscale_tpu.models.fnet import (
        flow_autoencoder_apply,
        flow_autoencoder_init,
    )

    filters = [4, 8, 4]
    params = flow_autoencoder_init(
        jax.random.PRNGKey(11), num_inputs=4, filters=filters)
    params = _randomize_bn(params, rng)

    inputs = [keras.Input(shape=(None, None, 3)) for _ in range(4)]
    x = layers.Concatenate()(inputs)

    def double_conv(x, f, name):
        x = layers.Conv2D(f, 3, padding="same", use_bias=False,
                          name=f"{name}_conv_1")(x)
        x = layers.BatchNormalization(name=f"{name}_bn_1")(x)
        x = layers.ReLU()(x)
        x = layers.Conv2D(f, 3, padding="same", use_bias=False,
                          name=f"{name}_conv_2")(x)
        x = layers.BatchNormalization(name=f"{name}_bn_2")(x)
        return layers.ReLU()(x)

    x = double_conv(x, filters[0], "block_1")
    x = layers.MaxPool2D(2)(x)
    x = double_conv(x, filters[1], "block_2")
    x = layers.Lambda(lambda t: tf.compat.v1.image.resize_bilinear(
        t, tf.shape(t)[1:3] * 2, align_corners=False,
        half_pixel_centers=False))(x)
    x = layers.Conv2D(filters[2], 3, padding="same", use_bias=False,
                      name="conv_1")(x)
    x = layers.BatchNormalization(name="bn_1")(x)
    x = layers.ReLU()(x)
    x = layers.Conv2D(32, 3, padding="same", name="conv_2")(x)
    x = layers.Lambda(lambda t: tf.nn.depth_to_space(t, 4))(x)
    km = keras.Model(inputs, x)

    for i in (1, 2):
        b = params[f"block_{i}"]
        _set_conv(km, f"block_{i}_conv_1", b["conv_1"])
        _set_bn(km, f"block_{i}_bn_1", b["bn_1"])
        _set_conv(km, f"block_{i}_conv_2", b["conv_2"])
        _set_bn(km, f"block_{i}_bn_2", b["bn_2"])
    _set_conv(km, "conv_1", params["conv_1"])
    _set_bn(km, "bn_1", params["bn_1"])
    _set_conv(km, "conv_2", params["conv_2"])

    frames_np = [rng.standard_normal((1, 8, 12, 3)).astype(np.float32)
                 for _ in range(4)]
    ours = np.asarray(flow_autoencoder_apply(
        params, [jnp.asarray(f) for f in frames_np], filters=filters))
    ref = km([tf.constant(f) for f in frames_np], training=False).numpy()
    np.testing.assert_allclose(ours, ref, atol=ATOL, rtol=1e-4)


def test_full_recurrence_vs_keras_oracle(rng):
    """Golden-loop test: 6 recurrent frames through our InferenceModel
    (both s2d and pixel paths) vs an oracle loop composed of the Keras
    twin networks + the numpy tfa-warp -- the closest available analog
    of the reference's golden-frame fidelity check (real PSP/PS2 weights
    are not distributed with the reference)."""
    from tests.test_ops_warp import numpy_dense_image_warp

    n_blocks, filters = 1, 8
    h, w = 8, 12

    # --- our models (shared weights) ---------------------------------
    config = {
        "flow": {"name": "flow-resnet", "num_inputs": 4,
                 "num_filters": filters, "num_res_blocks": n_blocks},
        "generator": {"name": "generator-resnet",
                      "num_filters": filters,
                      "num_res_blocks": n_blocks},
        "inference": {
            "name": "inference",
            "generator": {"model": "generator"},
            "flow": {"model": "flow"},
            "skip_processing": False,
            "frame_height": h, "frame_width": w,
            "s2d_mode": False,
        },
    }
    built = create_models(config, seed=21)["inference"]
    params = built.params
    config_s2d = dict(config)
    config_s2d["inference"] = {**config["inference"], "s2d_mode": True}
    built_s2d = create_models(config_s2d, seed=21)["inference"]

    # --- Keras twins with the same weights ----------------------------
    kf_inputs = [keras.Input(shape=(None, None, 3)) for _ in range(4)]
    x = layers.Concatenate()(kf_inputs)
    x = layers.Conv2D(filters, 3, padding="same", use_bias=False,
                      name="conv_1")(x)
    x = layers.BatchNormalization(name="bn_1")(x)
    x = layers.ReLU()(x)
    for i in range(n_blocks):
        x = _keras_res_block(x, filters, f"block_{i + 1}")
    x = layers.Conv2D(32, 1, padding="same", name="conv_2")(x)
    x = layers.Lambda(lambda t: tf.nn.depth_to_space(t, 4))(x)
    kflow = keras.Model(kf_inputs, x)
    _set_conv(kflow, "conv_1", params["flow"]["conv_1"])
    _set_bn(kflow, "bn_1", params["flow"]["bn_1"])
    _set_conv(kflow, "conv_2", params["flow"]["conv_2"])
    for i in range(n_blocks):
        b = params["flow"][f"block_{i + 1}"]
        _set_conv(kflow, f"block_{i + 1}_conv_1", b["conv_1"])
        _set_bn(kflow, f"block_{i + 1}_bn_1", b["bn_1"])
        _set_conv(kflow, f"block_{i + 1}_conv_2", b["conv_2"])
        _set_bn(kflow, f"block_{i + 1}_bn_2", b["bn_2"])

    frame_in = keras.Input(shape=(None, None, 3))
    warp_in = keras.Input(shape=(None, None, 3))
    x = layers.Concatenate()([
        frame_in,
        layers.Lambda(lambda t: tf.nn.space_to_depth(t, 4))(warp_in),
    ])
    x = layers.Conv2D(filters, 3, padding="same", use_bias=False,
                      name="conv_1")(x)
    x = layers.BatchNormalization(name="bn_1")(x)
    x = layers.ReLU()(x)
    for i in range(n_blocks):
        x = _keras_res_block(x, filters, f"block_{i + 1}")
    x = layers.Conv2DTranspose(32, 2, strides=2, padding="same",
                               use_bias=False, name="conv_trans_1")(x)
    x = layers.BatchNormalization(name="bn_2")(x)
    x = layers.ReLU()(x)
    x = layers.Conv2DTranspose(3, 2, strides=2, padding="same",
                               name="conv_trans_2")(x)
    x = layers.Activation("tanh")(x)
    up = layers.Lambda(lambda t: tf.compat.v1.image.resize_bilinear(
        t, tf.shape(t)[1:3] * 4, align_corners=False,
        half_pixel_centers=False))(frame_in)
    x = layers.Add()([up, x])
    x = layers.Lambda(lambda t: tf.clip_by_value(t, -0.5, 0.5))(x)
    kgen = keras.Model([frame_in, warp_in], x)
    _set_conv(kgen, "conv_1", params["generator"]["conv_1"])
    _set_bn(kgen, "bn_1", params["generator"]["bn_1"])
    _set_bn(kgen, "bn_2", params["generator"]["bn_2"])
    _set_conv(kgen, "conv_trans_1", params["generator"]["conv_trans_1"])
    _set_conv(kgen, "conv_trans_2", params["generator"]["conv_trans_2"])
    for i in range(n_blocks):
        b = params["generator"][f"block_{i + 1}"]
        _set_conv(kgen, f"block_{i + 1}_conv_1", b["conv_1"])
        _set_bn(kgen, f"block_{i + 1}_bn_1", b["bn_1"])
        _set_conv(kgen, f"block_{i + 1}_conv_2", b["conv_2"])
        _set_bn(kgen, f"block_{i + 1}_bn_2", b["bn_2"])

    # --- run 6 recurrent frames through all three ----------------------
    frames = rng.integers(0, 256, (6, 1, h, w, 3)).astype(np.uint8)

    state_p = built.obj.init_state(1)
    state_s = built_s2d.obj.init_state(1)
    pre_gen = np.zeros((1, h * 4, w * 4, 3), np.float32)
    last_frames = [np.zeros((1, h, w, 3), np.float32) for _ in range(3)]

    for t in range(6):
        frame = jnp.asarray(frames[t])
        out_p, state_p = built.obj.apply(params, frame, state_p)
        out_s, state_s = built_s2d.obj.apply(
            built_s2d.params, frame, state_s)

        # Oracle step (reference inference graph semantics).
        pre = frames[t].astype(np.float32) / 255.0 - 0.5
        flow = kflow(
            [tf.constant(pre)] + [tf.constant(f) for f in last_frames],
            training=False).numpy()
        pre_warp = numpy_dense_image_warp(pre_gen, flow)
        out_raw = kgen([tf.constant(pre), tf.constant(pre_warp)],
                       training=False).numpy()
        expected_u8 = ((out_raw + 0.5) * 255.0).astype(np.uint8)
        pre_gen = out_raw
        last_frames = [pre] + last_frames[:-1]

        for out in (out_p, out_s):
            diff = np.abs(np.asarray(out["output"]).astype(int)
                          - expected_u8.astype(int))
            # Truncation boundaries can flip by 1 on fp32 round-off;
            # the recurrence must not drift beyond that.
            assert diff.max() <= 1, (t, diff.max())
