"""Training-loss golden: our GAN loss math vs the REFERENCE'S OWN
``GANModel.compute_loss`` (scripts/training/keras_models.py:483-624),
executed directly.

test_reference_golden.py pins the INFERENCE semantics by running the
reference's model code; these tests pin the TRAINING semantics the same
way: instantiate the reference's GANModel (with inert submodels --
compute_loss never calls them), feed it a crafted y_pred dict, and
require GANTrainer.compute_losses to reproduce every term, the
gen/discr totals, the t_balance diagnostics, the ExponentialMovingAvg
update rule (keras_metrics.py:32-47), and the two-threshold adversarial
gating (keras_models.py:525-538) -- including the sign() behavior at
the thresholds.

The crafted tensors include a zero feature row in one VGG layer, which
distinguishes tf.math.l2_normalize's epsilon placement (clamp the
SQUARED norm inside rsqrt) from the clamp-the-norm variant -- the two
differ by ~3x there.
"""

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

import sys  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

REF_TRAINING = "/root/reference/scripts/training"

B, T = 2, 10  # -> ping-pong length 2T-1 = 19
H, W = 6, 8
HR_H, HR_W = 4 * H, 4 * W


@pytest.fixture(scope="module")
def ref_keras_models():
    sys.path.insert(0, REF_TRAINING)
    try:
        import keras_models as ref_km  # noqa: F401
        import keras_metrics as ref_kme  # noqa: F401
    finally:
        sys.path.remove(REF_TRAINING)
    return ref_km, ref_kme


def _inert_model():
    import keras

    return keras.Sequential([keras.layers.Identity()])


@pytest.fixture(scope="module")
def ref_gan(ref_keras_models):
    ref_km, _ = ref_keras_models
    return ref_km.GANModel(
        inference_model=_inert_model(),
        generator_model=_inert_model(), flow_model=_inert_model(),
        discriminator_model=_inert_model(), vgg_model=_inert_model())


def _crafted(seed=0):
    """x + y_pred with every shape the loss consumes (get_gan output
    contract, reference models.py:1007-1024), values ~N(0, 0.3)."""
    rng = np.random.default_rng(seed)

    def r(*shape, scale=0.3):
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    x = {"input": r(B, T, H, W, 3), "target": r(B, T, HR_H, HR_W, 3)}
    # 4 discriminator feature layers (matching the 4 default
    # discr_layer_norms) + final logits; 6 = warped-triple batch dim.
    discr_shapes = [(B, 6, 4, 4, 8), (B, 6, 2, 2, 16),
                    (B, 6, 2, 2, 32), (B, 6, 1, 1, 64)]
    y_pred = {
        "gen_outputs": r(B, 2 * T - 1, HR_H, HR_W, 3),
        "target_warp": r(B, 2 * T - 2, HR_H, HR_W, 3),
        "fake_output": [r(*s) for s in discr_shapes] + [r(B, 6, 1, 1, 1)],
        "real_output": [r(*s) for s in discr_shapes] + [r(B, 6, 1, 1, 1)],
        "vgg_real_output": [r(B, 19, 4, 4, 16), r(B, 19, 2, 2, 32)],
        "vgg_fake_output": [r(B, 19, 4, 4, 16), r(B, 19, 2, 2, 32)],
    }
    # Degenerate rows: zero features on both sides of one VGG layer
    # position pins the l2_normalize epsilon semantics.
    y_pred["vgg_real_output"][0][0, 0, 0, 0, :] = 0.0
    y_pred["vgg_fake_output"][0][0, 0, 0, 0, :] = 0.0
    return x, y_pred


def _ref_loss(ref_gan, x, y_pred):
    out = ref_gan.compute_loss(
        {k: tf.constant(v) for k, v in x.items()}, None,
        {k: [tf.constant(t) for t in v] if isinstance(v, list)
         else tf.constant(v) for k, v in y_pred.items()},
        None)
    terms = {
        "content_loss": ref_gan.content_loss_tr.result(),
        "warp_loss": ref_gan.warp_loss_tr.result(),
        "pp_loss": ref_gan.pp_loss_tr.result(),
        "adv_loss": ref_gan.adv_loss_tr.result(),
        "vgg_loss": ref_gan.vgg_loss_tr.result(),
        "discr_layer_loss": ref_gan.discr_layer_loss_tr.result(),
        "discr_real_loss": ref_gan.discr_real_loss_tr.result(),
        "discr_fake_loss": ref_gan.discr_fake_loss_tr.result(),
    }
    for tr in (ref_gan.content_loss_tr, ref_gan.warp_loss_tr,
               ref_gan.pp_loss_tr, ref_gan.adv_loss_tr,
               ref_gan.vgg_loss_tr, ref_gan.discr_layer_loss_tr,
               ref_gan.discr_real_loss_tr, ref_gan.discr_fake_loss_tr):
        tr.reset_state()
    return ({k: float(v) for k, v in out.items()},
            {k: float(v) for k, v in terms.items()})


def _our_trainer(**loss_config):
    from joshupscale_tpu.training.gan import GANTrainer

    inert = lambda *a, **k: None  # noqa: E731  (compute_losses-only)
    return GANTrainer(flow_apply=inert, generator_apply=inert,
                      discriminator_apply=inert, vgg_apply=inert,
                      loss_config=tuple(loss_config.items()))


def _our_loss(trainer, x, y_pred, ema=None):
    targets = jnp.asarray(x["target"])
    y = {
        "targets_d": jnp.concatenate(
            [targets, targets[:, -2::-1]], axis=1),
        "gen_outputs": jnp.asarray(y_pred["gen_outputs"]),
        "target_warp": jnp.asarray(y_pred["target_warp"]),
        "fake_output": [jnp.asarray(v) for v in y_pred["fake_output"]],
        "real_output": [jnp.asarray(v) for v in y_pred["real_output"]],
        "vgg_real_output": [jnp.asarray(v)
                            for v in y_pred["vgg_real_output"]],
        "vgg_fake_output": [jnp.asarray(v)
                            for v in y_pred["vgg_fake_output"]],
    }
    if ema is None:
        ema = trainer.init_ema()
    return {k: float(v)
            for k, v in trainer.compute_losses(y, ema).items()}


def test_gan_losses_match_reference_compute_loss(ref_gan):
    x, y_pred = _crafted(seed=1)
    # Reference gating reads the live EMA trackers; zero state (fresh
    # model) == our init_ema().
    ref_out, ref_terms = _ref_loss(ref_gan, x, y_pred)
    ours = _our_loss(_our_trainer(), x, y_pred)

    for key, ref_v in ref_terms.items():
        np.testing.assert_allclose(
            ours[key], ref_v, rtol=2e-5, atol=1e-6, err_msg=key)
    for key in ("gen_loss", "discr_loss", "t_balance1", "t_balance2"):
        np.testing.assert_allclose(
            ours[key], ref_out[key], rtol=2e-5, atol=1e-6, err_msg=key)


def test_gan_loss_weight_overrides_match(ref_gan, ref_keras_models):
    """Non-default weights and a DISABLED term (weight 0 must drop the
    term entirely, not multiply by zero -- the reference's `if > 0`)."""
    ref_km, _ = ref_keras_models
    overrides = {"content_loss": 2.5, "vgg_loss": 0.0, "adv_loss": 0.3,
                 "discr_layer_norms": [1.0, 2.0, 3.0, 4.0]}
    ref_model = ref_km.GANModel(
        inference_model=_inert_model(),
        generator_model=_inert_model(), flow_model=_inert_model(),
        discriminator_model=_inert_model(), vgg_model=_inert_model(),
        loss_config=overrides)
    x, y_pred = _crafted(seed=2)
    ref_out, _ = _ref_loss(ref_model, x, y_pred)
    ours = _our_loss(_our_trainer(**overrides), x, y_pred)
    for key in ("gen_loss", "discr_loss"):
        np.testing.assert_allclose(
            ours[key], ref_out[key], rtol=2e-5, atol=1e-6, err_msg=key)


def test_frvsr_losses_match_reference_compute_loss(ref_keras_models):
    """FRVSRModel (scan, keras_models.py:255-285) and FRVSRModelSingle
    (:141-172) compute_loss vs our channel-sum-MSE terms (the exact
    forms the FRVSR trainers optimize, training/frvsr.py)."""
    from joshupscale_tpu.training import losses

    ref_km, _ = ref_keras_models
    rng = np.random.default_rng(6)

    def r(*shape):
        return (rng.standard_normal(shape) * 0.3).astype(np.float32)

    # Scan variant: 10-frame unroll, warp terms for frames 1..9.
    model = ref_km.FRVSRModel(
        inference_model=_inert_model(),
        generator_model=_inert_model(), flow_model=_inert_model())
    x = {"input": r(B, T, H, W, 3), "target": r(B, T, HR_H, HR_W, 3)}
    y_pred = {"gen_outputs": r(B, T, HR_H, HR_W, 3),
              "target_warp": r(B, T - 1, HR_H, HR_W, 3)}
    ref_total = float(model.compute_loss(
        {k: tf.constant(v) for k, v in x.items()}, None,
        {k: tf.constant(v) for k, v in y_pred.items()}, None))
    gen_l = losses.channel_sum_mse(
        jnp.asarray(y_pred["gen_outputs"]), jnp.asarray(x["target"]))
    warp_l = losses.channel_sum_mse(
        jnp.asarray(y_pred["target_warp"]),
        jnp.asarray(x["target"][:, 1:]))
    np.testing.assert_allclose(
        float(gen_l), float(model.gen_outputs_loss_tr.result()),
        rtol=2e-5)
    np.testing.assert_allclose(
        float(warp_l), float(model.target_warp_loss_tr.result()),
        rtol=2e-5)
    np.testing.assert_allclose(float(gen_l + warp_l), ref_total,
                               rtol=2e-5)

    # Single variant: one frame, same two terms.
    single = ref_km.FRVSRModelSingle(inference_model=_inert_model())
    xs = {"input": r(B, 4, H, W, 3), "target": r(B, HR_H, HR_W, 3)}
    ys = {"gen_output": r(B, HR_H, HR_W, 3),
          "pre_warp": r(B, HR_H, HR_W, 3)}
    ref_total = float(single.compute_loss(
        {k: tf.constant(v) for k, v in xs.items()}, None,
        {k: tf.constant(v) for k, v in ys.items()}, None))
    ours = (losses.channel_sum_mse(jnp.asarray(ys["gen_output"]),
                                   jnp.asarray(xs["target"]))
            + losses.channel_sum_mse(jnp.asarray(ys["pre_warp"]),
                                     jnp.asarray(xs["target"])))
    np.testing.assert_allclose(float(ours), ref_total, rtol=2e-5)


def test_ema_update_rule_matches_reference(ref_keras_models):
    _, ref_kme = ref_keras_models
    ref_ema = ref_kme.ExponentialMovingAvg(decay=0.99)

    from joshupscale_tpu.training.gan import GANTrainer

    ours = {"t_balance1": jnp.zeros(()), "t_balance2": jnp.zeros(())}
    rng = np.random.default_rng(3)
    for _ in range(20):
        v = float(rng.standard_normal() * 2)
        ref_ema.update_state(tf.constant(v))
        ours = GANTrainer.update_ema(ours, jnp.float32(v),
                                     jnp.float32(v))
        np.testing.assert_allclose(
            float(ours["t_balance1"]), float(ref_ema.result()),
            rtol=1e-6, atol=1e-7)


def test_adversarial_gating_matches_reference(ref_gan):
    """The two-threshold generator gate (keras_models.py:525-538):
    drive the reference's live EMA trackers and our ema dict to the
    same values, and require identical gen_loss under (on, off,
    rescued-by-t1) EMA regimes."""
    x, y_pred = _crafted(seed=4)

    # (t_balance2, t_balance1) -> expected gate regime with the default
    # thresholds (t2 >= 0.0 opens; else t1 >= 0.2 rescues).
    for t2, t1 in [(0.5, -1.0), (-0.5, -1.0), (-0.5, 0.5)]:
        ref_gan.t_balance2_avg.reset_state()
        ref_gan.t_balance1_avg.reset_state()
        # One EMA step from zero: value = 0.01 * x, so feed 100x.
        ref_gan.t_balance2_avg.update_state(tf.constant(t2 * 100.0))
        ref_gan.t_balance1_avg.update_state(tf.constant(t1 * 100.0))
        ref_out, _ = _ref_loss(ref_gan, x, y_pred)

        ema = {"t_balance1": jnp.float32(0.0),
               "t_balance2": jnp.float32(0.0)}
        from joshupscale_tpu.training.gan import GANTrainer
        ema = GANTrainer.update_ema(ema, jnp.float32(t1 * 100.0),
                                    jnp.float32(t2 * 100.0))
        ours = _our_loss(_our_trainer(), x, y_pred, ema=ema)
        np.testing.assert_allclose(
            ours["gen_loss"], ref_out["gen_loss"], rtol=2e-5,
            atol=1e-6, err_msg=f"t2={t2} t1={t1}")
    ref_gan.t_balance2_avg.reset_state()
    ref_gan.t_balance1_avg.reset_state()


def test_lr_schedules_match_keras_golden():
    """Our optax-based LR schedules reproduce Keras's OWN schedule
    classes (the reference builds them via LR_SCHEDULES,
    models.py:29-33) step for step -- including the piecewise
    boundary inclusivity (values[0] holds through step ==
    boundaries[0]) and exponential staircase flooring."""
    import keras

    from joshupscale_tpu.training.schedules import get_learning_rate

    piecewise_cfg = {"boundaries": [10, 25], "values": [1.0, 0.5, 0.25]}
    ref_pw = keras.optimizers.schedules.PiecewiseConstantDecay(
        **piecewise_cfg)
    ours_pw = get_learning_rate({"name": "piecewise", **piecewise_cfg})
    for step in range(0, 40):
        np.testing.assert_allclose(
            float(ours_pw(step)), float(ref_pw(step)), rtol=0,
            err_msg=f"piecewise step {step}")

    for staircase in (False, True):
        exp_cfg = {"initial_learning_rate": 5e-4, "decay_steps": 7,
                   "decay_rate": 0.5, "staircase": staircase}
        ref_exp = keras.optimizers.schedules.ExponentialDecay(**exp_cfg)
        ours_exp = get_learning_rate({"name": "exponential", **exp_cfg})
        for step in range(0, 30):
            np.testing.assert_allclose(
                float(ours_exp(step)), float(ref_exp(step)), rtol=1e-6,
                err_msg=f"exponential step {step} "
                        f"staircase={staircase}")


def test_early_stopping_epoch_matches_keras_golden():
    """fit()'s patience rule stops at the same epoch as Keras's OWN
    EarlyStopping callback (the reference wires it in
    train_local.py:130-136) for improving-then-flat, worsening, and
    noisy monitor traces."""
    import keras

    from joshupscale_tpu.training.trainer import TrainState, fit

    traces = [
        [5.0, 4.0, 3.0, 3.0, 3.0, 3.0, 3.0, 3.0],      # flat tail
        [5.0, 6.0, 7.0, 8.0, 9.0, 10.0, 11.0, 12.0],   # worsening
        [5.0, 4.5, 4.6, 4.4, 4.7, 4.8, 4.9, 5.0],      # noisy
        [5.0, 4.0, 3.5, 3.0, 2.5, 2.0, 1.5, 1.0],      # always improves
    ]
    for patience in (1, 2, 3):
        for trace in traces:
            cb = keras.callbacks.EarlyStopping(
                monitor="loss", mode="min", patience=patience)
            cb.set_model(keras.Sequential([keras.layers.Identity()]))
            cb.model.stop_training = False  # set by fit() normally
            cb.on_train_begin()
            keras_epochs = len(trace)
            for epoch, v in enumerate(trace):
                cb.on_epoch_end(epoch, {"loss": v})
                if cb.model.stop_training:
                    keras_epochs = epoch + 1
                    break

            vals = iter(trace)

            def step(state, batch, rng, _it=vals):
                return state, {"loss": jnp.asarray(next(_it))}

            def data():
                while True:
                    yield {"input": np.zeros((1,), np.float32)}

            state = TrainState(None, None, jnp.zeros((), jnp.int32))
            _, hist = fit(
                step, state, data(), epochs=len(trace),
                steps_per_epoch=1, rng=jax.random.PRNGKey(0),
                early_stopping_patience=patience,
                log_fn=lambda _m: None)
            assert len(hist) == keras_epochs, (
                f"patience={patience} trace={trace}: ours "
                f"{len(hist)} vs keras {keras_epochs}")
