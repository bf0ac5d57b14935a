"""Cross-implementation golden tests driving the REFERENCE'S OWN CODE.

Every other parity test in this suite re-builds Keras oracles by hand.
These tests instead execute the reference checkout itself (read-only,
CPU TF):

- the reference's own model factory builds the inference model
  (reference scripts/training/models.py:680-829 get_inference_model via
  create_models :1138-1194),
- weights are saved through the reference's own Keras save path
  (train_local.py:184-188 ``save_weights``),
- our ``export.importer.load_keras_h5`` imports that .h5 unchanged,
- and a 120-frame recurrent clip is diffed against the reference
  model's own predict loop (the state-feedback semantics of
  scripts/inference/onnx/inference.py:63-94: zero-init state, outputs
  [1:] feed back as next state).

Acceptance: pixel MAE < 1e-3 (BASELINE.json north star) -- measured
3.2e-8 in [0,1] with max 1 u8 step (rounding ties) at commit time.

The reverse door is exercised too: our ``save_keras_h5`` checkpoints
load into the reference's own models via Keras ``load_weights
(by_name=True)`` and reproduce our outputs.

Real PSP/PS2 weights do not exist in the checkout; random weights
through the reference's own construction + save path are the strongest
available substitute and de-risk the day real weights appear.
"""

import sys

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

REF_TRAINING = "/root/reference/scripts/training"

# Small-but-structurally-complete architecture: resnet flow (4 input
# frames), resnet generator, full pre/postprocessing, s2d serving path.
N_FLOW_BLOCKS, N_GEN_BLOCKS, FILTERS = 2, 3, 8
H, W = 36, 44


@pytest.fixture(scope="module")
def ref_models_mod():
    """Import the reference's models.py (its modules import each other
    by plain name, so the path must be on sys.path during import)."""
    sys.path.insert(0, REF_TRAINING)
    try:
        import models as ref_models  # noqa: F401
    finally:
        sys.path.remove(REF_TRAINING)
    return ref_models


def _randomize(keras_model, rng):
    """Random-but-sane weights: unit-ish BN variance/gamma, small convs
    (keeps the random recurrence well-conditioned over 120 frames)."""
    for w in keras_model.weights:
        base = 1.0 if ("variance" in w.path or "gamma" in w.path) else 0.0
        w.assign(rng.standard_normal(w.shape).astype(np.float32) * 0.1
                 + base)


@pytest.fixture(scope="module")
def ref_inference(ref_models_mod, tmp_path_factory):
    """Reference-built inference model + its own-saved .h5 path."""
    m = ref_models_mod.create_models({
        "flow": {"name": "flow-resnet", "num_inputs": 4,
                 "num_filters": FILTERS, "num_res_blocks": N_FLOW_BLOCKS},
        "generator": {"name": "generator-resnet", "num_filters": FILTERS,
                      "num_res_blocks": N_GEN_BLOCKS},
        "inference": {"name": "inference",
                      "generator_model": {"model": "generator"},
                      "flow_model": {"model": "flow"},
                      "skip_processing": False,
                      "frame_height": H, "frame_width": W},
    })
    inf = m["inference"]
    _randomize(inf, np.random.default_rng(42))
    path = str(tmp_path_factory.mktemp("ref") / "ref_inf.weights.h5")
    # The reference's own export path (train_local.py:184-188).
    inf.save_weights(path)
    return inf, path


def _our_inference():
    from joshupscale_tpu.models import create_models

    models = create_models({
        "flow": {"name": "flow-resnet", "num_inputs": 4,
                 "num_filters": FILTERS, "num_res_blocks": N_FLOW_BLOCKS},
        "generator": {"name": "generator-resnet", "num_filters": FILTERS,
                      "num_res_blocks": N_GEN_BLOCKS},
        "inference": {"name": "inference",
                      "generator": {"model": "generator"},
                      "flow": {"model": "flow"},
                      "skip_processing": False,
                      "frame_height": H, "frame_width": W},
    }, seed=0)
    return models["inference"]


def _ref_predict_loop(inf, frames):
    """The reference's recurrent runner semantics
    (onnx/inference.py:63-94): zero-init state; output_raw -> next
    pre_gen, last_frames shift register feeds back."""
    pre_gen = np.zeros((1, H * 4, W * 4, 3), np.float32)
    last = [np.zeros((1, H, W, 3), np.float32) for _ in range(3)]
    outs = []
    for t in range(frames.shape[0]):
        o = inf(
            [tf.constant(frames[t])] + [tf.constant(pre_gen)]
            + [tf.constant(x) for x in last],
            training=False,
        )
        pre_gen = o["output_raw"].numpy()
        last = [x.numpy() for x in o["last_frames"]]
        outs.append(o["output"].numpy()[0])
    return np.stack(outs)


def test_reference_h5_import_120frame_recurrent_clip(ref_inference):
    """reference build -> reference save_weights -> our import -> our
    serving engine, diffed over a 120-frame recurrent clip."""
    from joshupscale_tpu.export.importer import load_keras_h5
    from joshupscale_tpu.runtime.engine import Engine

    inf, h5_path = ref_inference
    built = _our_inference()
    params = load_keras_h5(h5_path, built.params)

    rng = np.random.default_rng(42)
    T = 120
    frames = rng.integers(0, 256, (T, 1, H, W, 3), np.uint8)

    ref_outs = _ref_predict_loop(inf, frames)
    eng = Engine(built.obj, params, batch_size=1)
    ours = eng.process_clip(frames[:, 0])

    diff = np.abs(ours.astype(np.int32) - ref_outs.astype(np.int32))
    mae = diff.mean() / 255.0  # pixel MAE in [0, 1]
    assert mae < 1e-3, f"MAE {mae} vs reference's own model"
    # fp32 round-off only: at most a u8 rounding tie, on EVERY frame of
    # the 120-frame recurrence (no compounding drift).
    assert diff.max() <= 1, f"max u8 step {diff.max()}"
    per_frame_max = diff.reshape(T, -1).max(axis=1)
    assert per_frame_max[-1] <= 1


def test_reverse_door_reference_loads_our_h5(ref_models_mod, tmp_path):
    """our save_keras_h5 -> reference Keras load_weights(by_name=True)
    reproduces our outputs (the exit door back into the reference's
    training/export ecosystem, per-submodel checkpoints exactly like
    the reference's own per-model `weights:` config keys)."""
    from joshupscale_tpu.export.importer import save_keras_h5
    from joshupscale_tpu.models import create_models
    from joshupscale_tpu.models.common import Mutables
    from joshupscale_tpu.models.fnet import flow_resnet_apply

    models = create_models({
        "flow": {"name": "flow-resnet", "num_inputs": 4,
                 "num_filters": FILTERS,
                 "num_res_blocks": N_FLOW_BLOCKS},
    }, seed=7)
    flow_params = models["flow"].params
    path = str(tmp_path / "our_flow.h5")
    save_keras_h5(path, flow_params)

    ref_flow = ref_models_mod.create_models({
        "flow": {"name": "flow-resnet", "num_inputs": 4,
                 "num_filters": FILTERS,
                 "num_res_blocks": N_FLOW_BLOCKS},
    })["flow"]
    ref_flow.load_weights(path, by_name=True)

    rng = np.random.default_rng(1)
    frames_np = [rng.standard_normal((1, H, W, 3)).astype(np.float32)
                 for _ in range(4)]
    ours = np.asarray(flow_resnet_apply(
        flow_params, [jnp.asarray(f) for f in frames_np],
        num_res_blocks=N_FLOW_BLOCKS,
    ))
    theirs = ref_flow(
        [tf.constant(f) for f in frames_np], training=False).numpy()
    np.testing.assert_allclose(ours, theirs, atol=2e-4, rtol=1e-4)


def test_reference_golden_autoencoder_brightness_pad(
        ref_models_mod, tmp_path):
    """The gnarlier inference variant against the reference's own code:
    AUTOENCODER flow (pool/upsample ladder), normalize_brightness, and
    flow_pad_factor (frame padded 36x44 -> 40x48 for the pooling
    ladder, flow unpadded after).  60-frame recurrent clip, same
    acceptance as the resnet golden test."""
    from joshupscale_tpu.export.importer import load_keras_h5
    from joshupscale_tpu.models import create_models
    from joshupscale_tpu.runtime.engine import Engine

    ae_filters = [8, 16, 32, 16, 8]
    ref = ref_models_mod.create_models({
        "flow": {"name": "flow-autoencoder", "num_inputs": 4,
                 "filters": ae_filters},
        "generator": {"name": "generator-resnet", "num_filters": 8,
                      "num_res_blocks": 2},
        "inference": {"name": "inference",
                      "generator_model": {"model": "generator"},
                      "flow_model": {"model": "flow"},
                      "skip_processing": False,
                      "frame_height": H, "frame_width": W,
                      "flow_pad_factor": 8,
                      "normalize_brightness": True},
    })["inference"]
    _randomize(ref, np.random.default_rng(11))
    h5 = str(tmp_path / "ref_ae.weights.h5")
    ref.save_weights(h5)

    models = create_models({
        "flow": {"name": "flow-autoencoder", "num_inputs": 4,
                 "filters": ae_filters},
        "generator": {"name": "generator-resnet", "num_filters": 8,
                      "num_res_blocks": 2},
        "inference": {"name": "inference",
                      "generator": {"model": "generator"},
                      "flow": {"model": "flow"},
                      "skip_processing": False,
                      "frame_height": H, "frame_width": W,
                      "flow_pad_factor": 8,
                      "normalize_brightness": True},
    }, seed=0)
    built = models["inference"]
    params = load_keras_h5(h5, built.params)

    rng = np.random.default_rng(12)
    T = 60
    frames = rng.integers(0, 256, (T, 1, H, W, 3), np.uint8)

    # Reference predict loop; padded last_frames are 40x48 here.
    ph = ((H + 7) // 8) * 8
    pw = ((W + 7) // 8) * 8
    pre_gen = np.zeros((1, H * 4, W * 4, 3), np.float32)
    last = [np.zeros((1, ph, pw, 3), np.float32) for _ in range(3)]
    ref_outs = []
    for t in range(T):
        o = ref(
            [tf.constant(frames[t])] + [tf.constant(pre_gen)]
            + [tf.constant(x) for x in last],
            training=False,
        )
        pre_gen = o["output_raw"].numpy()
        last = [x.numpy() for x in o["last_frames"]]
        ref_outs.append(o["output"].numpy()[0])
    ref_outs = np.stack(ref_outs)

    eng = Engine(built.obj, params, batch_size=1)
    ours = eng.process_clip(frames[:, 0])
    diff = np.abs(ours.astype(np.int32) - ref_outs.astype(np.int32))
    assert diff.mean() / 255.0 < 1e-3
    assert diff.max() <= 1, f"max u8 step {diff.max()}"


def test_discriminator_golden_vs_reference_factory(ref_models_mod):
    """The spatio-temporal discriminator vs the reference's OWN
    ``get_discriminator`` (models.py:598-677): weights copied straight
    out of the reference-built Keras layers into our param tree, all
    five outputs (four feature-matching taps + patch logits) compared.
    Stronger than the hand-rebuilt oracle in test_model_parity: the
    network here is the reference's own construction (its activation
    resolution, its SAME-padding strides, its tap placement)."""
    from joshupscale_tpu.models.discriminator import (
        discriminator_apply,
        discriminator_init,
    )

    crop, alpha = 8, 0.25
    ref = ref_models_mod.get_discriminator(crop_size=crop, alpha=alpha)
    _randomize(ref, np.random.default_rng(77))

    params = discriminator_init(jax.random.PRNGKey(0), alpha=alpha)
    k, b = ref.get_layer("conv_1").get_weights()
    params["conv_1"] = {"kernel": jnp.asarray(k), "bias": jnp.asarray(b)}
    for i in range(1, 5):
        (ck,) = ref.get_layer(f"block_{i}_conv").get_weights()
        gamma, beta, mean, var = ref.get_layer(
            f"block_{i}_bn").get_weights()
        params[f"block_{i}"] = {
            "conv": {"kernel": jnp.asarray(ck)},
            "bn": {"gamma": jnp.asarray(gamma),
                   "beta": jnp.asarray(beta),
                   "moving_mean": jnp.asarray(mean),
                   "moving_variance": jnp.asarray(var)},
        }
    dk, db = ref.get_layer("dense").get_weights()
    params["dense"] = {"kernel": jnp.asarray(dk), "bias": jnp.asarray(db)}

    rng = np.random.default_rng(78)
    x = (rng.standard_normal((2, crop * 4, crop * 4, 27)) * 0.3
         ).astype(np.float32)
    ours = discriminator_apply(params, jnp.asarray(x))
    refs = ref(tf.constant(x), training=False)
    assert len(ours) == len(refs) == 5
    for j, (o, r) in enumerate(zip(ours, refs)):
        np.testing.assert_allclose(
            np.asarray(o), r.numpy(), atol=1e-5, rtol=1e-4,
            err_msg=f"output {j}")
