"""Shape/dtype smoke tests for the model zoo and recurrent inference step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from joshupscale_tpu.models import create_models

TINY_CONFIG = {
    "flow": {
        "name": "flow-resnet",
        "num_inputs": 4,
        "num_filters": 8,
        "num_res_blocks": 2,
    },
    "generator": {
        "name": "generator-resnet",
        "num_filters": 8,
        "num_res_blocks": 2,
    },
    "inference": {
        "name": "inference",
        "generator": {"model": "generator"},
        "flow": {"model": "flow"},
        "skip_processing": False,
        "frame_height": 16,
        "frame_width": 20,
    },
}


@pytest.fixture(scope="module")
def models():
    return create_models(TINY_CONFIG, seed=0)


def test_flow_shapes(models):
    flow = models["flow"]
    frames = [jnp.zeros((2, 16, 20, 3)) for _ in range(4)]
    out = flow.apply(flow.params, frames)
    assert out.shape == (2, 64, 80, 2)


def test_generator_shapes(models):
    gen = models["generator"]
    frame = jnp.zeros((2, 16, 20, 3))
    pre_warp = jnp.zeros((2, 64, 80, 3))
    out = gen.apply(gen.params, frame, pre_warp)
    assert out.shape == (2, 64, 80, 3)
    assert float(jnp.max(out)) <= 0.5 and float(jnp.min(out)) >= -0.5


def test_inference_step(models):
    built = models["inference"]
    model = built.obj
    state = model.init_state(batch_size=1)
    frame = jnp.asarray(
        np.random.default_rng(0).integers(0, 256, (1, 16, 20, 3)),
        dtype=jnp.uint8,
    )
    outputs, new_state = model.apply(built.params, frame, state)
    assert outputs["output"].shape == (1, 64, 80, 3)
    assert outputs["output"].dtype == jnp.uint8
    assert outputs["output_raw"].shape == (1, 64, 80, 3)
    # Default inference runs the s2d fast path: state is s2d-form.
    assert new_state["pre_gen"].shape == (1, 16, 20, 48)
    assert len(new_state["last_frames"]) == 3

    # Shift register: new last_frames[0] must equal the preprocessed frame,
    # and the older entries shift down.
    pre = np.asarray(frame, dtype=np.float32) / 255.0 - 0.5
    np.testing.assert_allclose(
        np.asarray(new_state["last_frames"][0]), pre, atol=1e-6
    )
    np.testing.assert_array_equal(
        np.asarray(new_state["last_frames"][1]),
        np.asarray(state["last_frames"][0]),
    )


def test_inference_step_jits_and_state_threads(models):
    built = models["inference"]
    model = built.obj

    @jax.jit
    def step(params, frame, state):
        return model.apply(params, frame, state)

    state = model.init_state(batch_size=1)
    rng = np.random.default_rng(1)
    prev_pre_gen = None
    for _ in range(3):
        frame = jnp.asarray(
            rng.integers(0, 256, (1, 16, 20, 3)), dtype=jnp.uint8
        )
        outputs, state = step(built.params, frame, state)
        # pre_gen state must be the raw output fed forward (state is the
        # s2d form of the HR output view).
        from joshupscale_tpu.ops import depth_to_space

        np.testing.assert_allclose(
            np.asarray(depth_to_space(state["pre_gen"], 4)),
            np.asarray(outputs["output_raw"]), atol=1e-6,
        )
        if prev_pre_gen is not None:
            assert not np.array_equal(
                np.asarray(state["pre_gen"]), prev_pre_gen
            )
        prev_pre_gen = np.asarray(state["pre_gen"])


def test_discriminator_shapes():
    from joshupscale_tpu.models import discriminator_apply, discriminator_init

    params = discriminator_init(jax.random.PRNGKey(0), alpha=0.5)
    x = jnp.zeros((2, 32, 32, 27))
    outs = discriminator_apply(params, x)
    assert len(outs) == 5
    assert outs[0].shape == (2, 16, 16, 32)
    assert outs[3].shape == (2, 2, 2, 128)
    assert outs[4].shape == (2, 2, 2, 1)


def test_flow_autoencoder_shapes():
    from joshupscale_tpu.models import (
        flow_autoencoder_apply,
        flow_autoencoder_init,
    )

    params = flow_autoencoder_init(
        jax.random.PRNGKey(0), num_inputs=4, filters=[8, 16, 8]
    )
    frames = [jnp.zeros((1, 16, 24, 3)) for _ in range(4)]
    out = flow_autoencoder_apply(params, frames, filters=[8, 16, 8])
    assert out.shape == (1, 64, 96, 2)


def test_fade_in_blocks_progressive_growing():
    """Fade-in res blocks (reference FadeInLayer + progressive growing):
    at counter 0 the new block's residual is fully attenuated; the
    counter ramps it in linearly over fade_in_period training steps."""
    from joshupscale_tpu.models.common import Mutables
    from joshupscale_tpu.models.generator import (
        generator_resnet_apply,
        generator_resnet_init,
    )

    params = generator_resnet_init(
        jax.random.PRNGKey(2), num_filters=8, num_res_blocks=1,
        num_fade_in_res_blocks=1, fade_in_period=4,
    )
    assert "fade" in params["block_2"]
    frame = jnp.asarray(
        np.random.default_rng(0).random((1, 8, 8, 3), np.float32) - 0.5)
    warp = jnp.zeros((1, 32, 32, 3), jnp.float32)

    # counter=0: faded block contributes scale 0.
    out0 = generator_resnet_apply(params, frame, warp)

    # Zeroing the faded block's convs must not change the output at
    # counter=0 (its residual path is multiplied by 0).
    import jax as _jax

    zeroed = _jax.tree_util.tree_map(jnp.array, params)
    zeroed["block_2"]["conv_2"]["kernel"] = (
        zeroed["block_2"]["conv_2"]["kernel"] * 0)
    out0z = generator_resnet_apply(zeroed, frame, warp)
    np.testing.assert_allclose(np.asarray(out0), np.asarray(out0z),
                               atol=1e-6)

    # Training steps increment the counter via Mutables.
    mut = Mutables(True)
    generator_resnet_apply(params, frame, warp, mut=mut)
    assert any(k.endswith("fade") for k in mut.updates)
    upd = next(v for k, v in mut.updates.items() if k.endswith("fade"))
    assert int(upd["counter"]) == 1

    # At counter >= period the block is fully active: differs from the
    # zeroed model.
    active = _jax.tree_util.tree_map(jnp.array, params)
    active["block_2"]["fade"]["counter"] = jnp.asarray(4, jnp.int64)
    zeroed["block_2"]["fade"]["counter"] = jnp.asarray(4, jnp.int64)
    out_full = generator_resnet_apply(active, frame, warp)
    out_fullz = generator_resnet_apply(zeroed, frame, warp)
    assert np.abs(np.asarray(out_full) - np.asarray(out_fullz)).max() > 0


def test_weights_prefix_loads_trainstate_subtree(tmp_path):
    """`weights: {path, prefix}` pulls a dotted subtree out of a saved
    TrainState checkpoint -- the GAN-stage bootstrap from an FRVSR
    checkpoint (reference models.py copy_weights semantics)."""
    from joshupscale_tpu.export.importer import save_params_npz

    cfg = {
        "flow": {"name": "flow-resnet", "num_inputs": 4,
                 "num_filters": 8, "num_res_blocks": 1},
        "generator": {"name": "generator-resnet", "num_filters": 8,
                      "num_res_blocks": 1},
        "frvsr": {"name": "frvsr", "flow": {"model": "flow"},
                  "generator": {"model": "generator"}},
    }
    src = create_models(cfg, seed=3)
    ckpt = str(tmp_path / "state.npz")
    # A TrainState-shaped flat file: params.flow.*, params.generator.*.
    save_params_npz(ckpt, {"params": src["frvsr"].params})

    cfg2 = {
        "flow": {"name": "flow-resnet", "num_inputs": 4,
                 "num_filters": 8, "num_res_blocks": 1,
                 "weights": {"path": ckpt, "prefix": "params.flow"}},
        "generator": {"name": "generator-resnet", "num_filters": 8,
                      "num_res_blocks": 1,
                      "weights": {"path": ckpt,
                                  "prefix": "params.generator"}},
    }
    dst = create_models(cfg2, seed=9)
    for name in ("flow", "generator"):
        want = src["frvsr"].params[name]
        got = dst[name].params
        flat_w = jax.tree_util.tree_leaves(want)
        flat_g = jax.tree_util.tree_leaves(got)
        assert len(flat_w) == len(flat_g)
        for a, b in zip(flat_w, flat_g):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    with pytest.raises(KeyError):
        create_models(
            {"flow": {"name": "flow-resnet", "num_inputs": 4,
                      "num_filters": 8, "num_res_blocks": 1,
                      "weights": {"path": ckpt, "prefix": "nope"}}},
            seed=0)
