"""Mixed-precision (bfloat16) training tests.

The reference trains mixed_float16 on GPU (reference
scripts/training/train_local.py:72-77 sets the Keras global policy when
compute capability >= 7.0); the TPU analog is bfloat16 compute with
float32 parameters, optimizer state, BN statistics, and losses -- and
no loss scaling (bf16 keeps fp32's exponent range).  These tests pin
the policy's invariants:

- every loss/metric and every updated parameter stays float32;
- the bf16 step's losses track the f32 step's within bf16 tolerance;
- the bf16 gradients point the same way as the f32 gradients;
- BN moving statistics remain float32 and still move;
- the default remains float32 (golden-loss fidelity is unaffected).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from joshupscale_tpu.models import create_models
from joshupscale_tpu.training import (
    GANTrainState,
    TrainState,
    build_frvsr_step,
    build_gan_step,
    init_gan_state,
    make_optimizer,
)

CROP = 8


def _config(with_gan=False, compute_dtype=None):
    cfg = {
        "flow": {"name": "flow-resnet", "num_inputs": 4,
                 "num_filters": 8, "num_res_blocks": 1},
        "generator": {"name": "generator-resnet", "num_filters": 8,
                      "num_res_blocks": 1},
        "frvsr": {"name": "frvsr", "flow": {"model": "flow"},
                  "generator": {"model": "generator"}},
    }
    if compute_dtype is not None:
        cfg["frvsr"]["compute_dtype"] = compute_dtype
    if with_gan:
        cfg["discriminator"] = {"name": "discriminator", "alpha": 0.25}
        cfg["vgg"] = {"name": "vgg"}
        cfg["gan"] = {
            "name": "gan",
            "flow": {"model": "flow"},
            "generator": {"model": "generator"},
            "discriminator": {"model": "discriminator"},
            "vgg": {"model": "vgg"},
        }
        if compute_dtype is not None:
            cfg["gan"]["compute_dtype"] = compute_dtype
    return cfg


def _batch(rng, b=2, t=10, crop=CROP):
    return {
        "input": jnp.asarray(
            rng.random((b, t, crop, crop, 3), np.float32) - 0.5),
        "target": jnp.asarray(
            rng.random((b, t, crop * 4, crop * 4, 3), np.float32) - 0.5),
    }


def _flat_concat(tree):
    return np.concatenate([
        np.asarray(x, np.float32).ravel()
        for x in jax.tree_util.tree_leaves(tree)
    ])


def _cos(a, b):
    return float(
        np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))


def test_frvsr_bf16_matches_f32_within_tolerance(rng):
    batch = _batch(rng)
    key = jax.random.PRNGKey(3)
    results = {}
    for name, cdt in (("f32", None), ("bf16", "bfloat16")):
        models = create_models(_config(compute_dtype=cdt), seed=0)
        trainer = models["frvsr"].obj
        params = models["frvsr"].params
        loss, aux = trainer.loss(params, batch, key)
        grads = jax.grad(
            lambda p: trainer.loss(p, batch, key)[0])(params)

        # Smooth-path gradient: the FIRST frame's content term touches
        # no dense_image_warp (its pre_warp is the random image
        # directly), so there are no floor() bin discontinuities and
        # the bf16 gradient must track f32 tightly.  The full-unroll
        # gradient below is chaotic by construction -- warp corner
        # bins flip under bf16-scale activation rounding and the
        # recurrence amplifies them (measured control: f32 gradients
        # under 4e-3 input noise decorrelate to cosine ~0.54) -- so
        # only weak direction/magnitude bounds are falsifiable there.
        from joshupscale_tpu.training import losses as loss_mod

        def first_frame_loss(p):
            y = trainer.forward(
                p, batch["input"], batch["target"], key)
            return loss_mod.channel_sum_mse(
                y["gen_outputs"][:, 0], batch["target"][:, 0])

        g_first = jax.grad(first_frame_loss)(params)["generator"]
        results[name] = (float(loss), aux, grads, g_first)

    loss32, aux32, g32, f32first = results["f32"]
    loss16, aux16, g16, f16first = results["bf16"]
    # Same batch, same params: the bf16 loss tracks f32 within bf16
    # rounding accumulated over the unroll.
    assert loss16 == pytest.approx(loss32, rel=0.05)
    for k in ("gen_outputs_loss", "target_warp_loss"):
        assert float(aux16["metrics"][k]) == pytest.approx(
            float(aux32["metrics"][k]), rel=0.05)
    # Losses and gradients come out float32 either way.
    assert all(
        x.dtype == jnp.float32
        for x in jax.tree_util.tree_leaves(aux16["metrics"]))
    assert all(
        x.dtype == jnp.float32 for x in jax.tree_util.tree_leaves(g16))
    # Smooth path: tight directional agreement (policy correctness).
    cos_first = _cos(_flat_concat(f32first), _flat_concat(f16first))
    assert cos_first > 0.98, f"smooth-path gradient cosine {cos_first}"
    # Full unroll: descent-direction correlation + sane magnitude
    # (chaos-aware bounds, see comment above; measured ~0.73 / ~1.25).
    v32, v16 = _flat_concat(g32), _flat_concat(g16)
    cos_full = _cos(v32, v16)
    assert cos_full > 0.3, f"full-unroll gradient cosine {cos_full}"
    ratio = float(np.linalg.norm(v16) / np.linalg.norm(v32))
    assert 0.5 < ratio < 2.0, f"gradient norm ratio {ratio}"


def test_frvsr_bf16_step_trains_and_keeps_f32_state(rng):
    models = create_models(
        _config(compute_dtype="bfloat16"), seed=0)
    trainer = models["frvsr"].obj
    assert trainer.compute_dtype == jnp.bfloat16
    params = models["frvsr"].params
    opt = make_optimizer(1e-3)
    step = build_frvsr_step(trainer, opt)
    state = TrainState(params, opt.init(params), jnp.zeros((), jnp.int32))

    batch = _batch(rng)
    key = jax.random.PRNGKey(0)
    losses = []
    for _ in range(4):
        state, metrics = step(state, batch, key)
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]
    # Params (incl. BN moving stats) stay float32 after bf16 steps.
    assert all(
        x.dtype == jnp.float32
        for x in jax.tree_util.tree_leaves(state.params))
    # BN moving statistics moved (training-mode stats were collected).
    mv = state.params["generator"]["bn_1"]["moving_mean"]
    assert float(jnp.abs(mv).max()) > 0


def test_gan_bf16_step_runs_and_tracks_f32(rng):
    batch = _batch(rng)
    key = jax.random.PRNGKey(1)
    metrics_by = {}
    for name, cdt in (("f32", None), ("bf16", "bfloat16")):
        models = create_models(
            _config(with_gan=True, compute_dtype=cdt), seed=0)
        built = models["gan"]
        trainer = built.obj
        gopt = make_optimizer(1e-4)
        dopt = make_optimizer(1e-4)
        step = build_gan_step(trainer, gopt, dopt, built.params["vgg"])
        state = init_gan_state(
            trainer, built.params["gen"], built.params["discr"],
            gopt, dopt)
        state, metrics = step(state, batch, key)
        metrics_by[name] = {k: float(v) for k, v in metrics.items()}
        assert all(
            x.dtype == jnp.float32
            for x in jax.tree_util.tree_leaves(
                (state.gen_params, state.discr_params)))
    m32, m16 = metrics_by["f32"], metrics_by["bf16"]
    assert np.isfinite(m16["gen_loss"]) and np.isfinite(m16["discr_loss"])
    # One step from identical init: every loss term tracks f32.  The
    # adversarial terms sit near ln(2) so abs tolerance is meaningful.
    for k in ("gen_loss", "discr_loss", "content_loss", "pp_loss",
              "adv_loss", "vgg_loss"):
        assert m16[k] == pytest.approx(m32[k], rel=0.1, abs=0.05), (
            k, m16[k], m32[k])


def test_compute_dtype_default_is_f32():
    models = create_models(_config(with_gan=True), seed=0)
    assert models["frvsr"].obj.compute_dtype == jnp.float32
    assert models["gan"].obj.compute_dtype == jnp.float32
