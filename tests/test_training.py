"""Training-stack tests: FRVSR / GAN steps, gating, freezing, DP mesh.

Follows the survey's test strategy (SURVEY.md §4): no reference tests
exist, so behavior is pinned with self-consistency oracles -- losses
decrease on a fixed batch, BN stats move, the t_balance gate provably
opens/closes, and the 8-virtual-device data-parallel step matches the
single-device step numerically.
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
    fit,
    freeze_mask,
    make_optimizer,
    load_checkpoint,
    save_checkpoint,
)
from joshupscale_tpu.training.trainer import merge_bn_updates


CROP = 8  # LR crop; HR = 32


def _config(with_gan=False):
    cfg = {
        "flow": {"name": "flow-resnet", "num_inputs": 4,
                 "num_filters": 8, "num_res_blocks": 1},
        "generator": {"name": "generator-resnet", "num_filters": 8,
                      "num_res_blocks": 1},
        "frvsr": {"name": "frvsr", "flow": {"model": "flow"},
                  "generator": {"model": "generator"}},
    }
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
    return cfg


def _batch(rng, b=2, t=10, crop=CROP):
    return {
        "input": jnp.asarray(
            rng.random((b, t, crop, crop, 3), np.float32) - 0.5),
        "target": jnp.asarray(
            rng.random((b, t, crop * 4, crop * 4, 3), np.float32) - 0.5),
    }


def test_frvsr_step_decreases_loss(rng):
    models = create_models(_config(), seed=0)
    trainer = models["frvsr"].obj
    params = models["frvsr"].params
    opt = make_optimizer(1e-3)
    step = build_frvsr_step(trainer, opt)
    state = TrainState(params, opt.init(params), jnp.zeros((), jnp.int32))

    batch = _batch(rng)
    key = jax.random.PRNGKey(0)
    losses = []
    for i in range(4):
        state, metrics = step(state, batch, jax.random.fold_in(key, 0))
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]
    assert int(state.step) == 4

    # BN moving stats must move off their init (zeros / ones).
    mm = np.asarray(state.params["flow"]["bn_1"]["moving_mean"])
    assert np.abs(mm).max() > 0


def test_frvsr_freeze_mask(rng):
    models = create_models(_config(), seed=0)
    trainer = models["frvsr"].obj
    params = models["frvsr"].params
    opt = make_optimizer(1e-3)
    mask = freeze_mask(params, ("flow",))
    step = build_frvsr_step(trainer, opt, mask=mask)
    state = TrainState(params, opt.init(params), jnp.zeros((), jnp.int32))
    before = np.asarray(params["flow"]["conv_1"]["kernel"])
    gen_before = np.asarray(params["generator"]["conv_1"]["kernel"])
    state, _ = step(state, _batch(rng), jax.random.PRNGKey(1))
    after = np.asarray(state.params["flow"]["conv_1"]["kernel"])
    gen_after = np.asarray(state.params["generator"]["conv_1"]["kernel"])
    np.testing.assert_array_equal(before, after)
    assert np.abs(gen_before - gen_after).max() > 0


def test_frvsr_checkpoint_roundtrip(rng, tmp_path):
    models = create_models(_config(), seed=0)
    trainer = models["frvsr"].obj
    params = models["frvsr"].params
    opt = make_optimizer(1e-3)
    step = build_frvsr_step(trainer, opt)
    state = TrainState(params, opt.init(params), jnp.zeros((), jnp.int32))
    state, _ = step(state, _batch(rng), jax.random.PRNGKey(2))

    path = str(tmp_path / "ckpt.npz")
    save_checkpoint(path, state.tree())
    restored = load_checkpoint(path, state.tree())
    for a, b in zip(
        jax.tree_util.tree_leaves(state.tree()),
        jax.tree_util.tree_leaves(restored),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_frvsr_data_parallel_matches_single(rng):
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    import optax

    models = create_models(_config(), seed=0)
    trainer = models["frvsr"].obj
    params = models["frvsr"].params
    # SGD: updates stay proportional to gradients, so reduction-order
    # noise isn't amplified (Adam's g/sqrt(v) flips sign on ~0 grads).
    opt = optax.sgd(1e-3)
    batch = _batch(rng, b=8)
    key = jax.random.PRNGKey(3)

    # Copy params: the jitted step donates them and the DP run below
    # needs the originals intact.
    copy = jax.tree_util.tree_map(jnp.array, params)
    ref_step = build_frvsr_step(trainer, opt)
    ref_state = TrainState(
        copy, opt.init(copy), jnp.zeros((), jnp.int32))
    ref_state, ref_metrics = ref_step(ref_state, batch, key)

    mesh = Mesh(np.asarray(jax.devices()[:8]), ("data",))
    dp_step = build_frvsr_step(trainer, opt, mesh=mesh)
    repl = NamedSharding(mesh, P())
    sharded_params = jax.device_put(params, repl)
    dp_state = TrainState(
        sharded_params,
        jax.device_put(opt.init(params), repl),
        jax.device_put(jnp.zeros((), jnp.int32), repl),
    )
    dp_batch = jax.device_put(batch, NamedSharding(mesh, P("data")))
    dp_state, dp_metrics = dp_step(dp_state, dp_batch, key)

    # Cross-replica reductions change summation order: fp32 noise only.
    np.testing.assert_allclose(
        float(ref_metrics["loss"]), float(dp_metrics["loss"]),
        rtol=5e-4,
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(ref_state.params),
        jax.tree_util.tree_leaves(dp_state.params),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-4)


@pytest.fixture(scope="module")
def gan_setup():
    models = create_models(_config(with_gan=True), seed=0)
    built = models["gan"]
    trainer = built.obj
    gen_params = built.params["gen"]
    discr_params = built.params["discr"]
    vgg_params = built.params["vgg"]
    return trainer, gen_params, discr_params, vgg_params


def _gan_state(trainer, gen_params, discr_params, gopt, dopt):
    # Copy: the jitted step donates its state and the fixture params are
    # shared across tests.
    gen_params = jax.tree_util.tree_map(jnp.array, gen_params)
    discr_params = jax.tree_util.tree_map(jnp.array, discr_params)
    return GANTrainState(
        gen_params=gen_params,
        discr_params=discr_params,
        gen_opt_state=gopt.init(gen_params),
        discr_opt_state=dopt.init(discr_params),
        ema=trainer.init_ema(),
        step=jnp.zeros((), jnp.int32),
    )


def test_gan_step_trains_both(gan_setup, rng):
    trainer, gen_params, discr_params, vgg_params = gan_setup
    gopt = make_optimizer(1e-4)
    dopt = make_optimizer(1e-4)
    step = build_gan_step(trainer, gopt, dopt, vgg_params)
    state = _gan_state(trainer, gen_params, discr_params, gopt, dopt)

    batch = _batch(rng, b=1)
    d_before = np.asarray(discr_params["conv_1"]["kernel"])
    g_before = np.asarray(gen_params["generator"]["conv_1"]["kernel"])
    state, metrics = step(state, batch, jax.random.PRNGKey(4))
    for k in ("gen_loss", "discr_loss", "content_loss", "warp_loss",
              "pp_loss", "adv_loss", "vgg_loss", "discr_layer_loss"):
        assert np.isfinite(float(metrics[k])), k
    # EMA starts at 0 < 0.2 threshold => discriminator trains.
    assert int(metrics["discr_steps"]) == 1
    assert np.abs(
        np.asarray(state.discr_params["conv_1"]["kernel"]) - d_before
    ).max() > 0
    assert np.abs(
        np.asarray(state.gen_params["generator"]["conv_1"]["kernel"])
        - g_before
    ).max() > 0


def test_gan_gating_skips_discriminator(gan_setup, rng):
    import dataclasses as dc

    trainer, gen_params, discr_params, vgg_params = gan_setup
    # Threshold below any possible EMA value => gate always closed.
    trainer = dc.replace(
        trainer, loss_config=(("t_balance1_threshold", -1e9),)
    )
    gopt = make_optimizer(1e-4)
    dopt = make_optimizer(1e-4)
    step = build_gan_step(trainer, gopt, dopt, vgg_params)
    state = _gan_state(trainer, gen_params, discr_params, gopt, dopt)

    d_before = np.asarray(discr_params["conv_1"]["kernel"])
    state, metrics = step(state, _batch(rng, b=1), jax.random.PRNGKey(5))
    assert int(metrics["discr_steps"]) == 0
    np.testing.assert_array_equal(
        np.asarray(state.discr_params["conv_1"]["kernel"]), d_before
    )


def test_merge_bn_updates_paths():
    params = {"flow": {"bn_1": {"moving_mean": jnp.zeros(3)}},
              "generator": {"bn_1": {"moving_mean": jnp.zeros(3)}}}
    upd = {"flow.bn_1": {"moving_mean": jnp.ones(3)}}
    out = merge_bn_updates(params, upd)
    np.testing.assert_array_equal(
        np.asarray(out["flow"]["bn_1"]["moving_mean"]), np.ones(3))
    np.testing.assert_array_equal(
        np.asarray(out["generator"]["bn_1"]["moving_mean"]), np.zeros(3))


def test_fit_loop_runs(rng, tmp_path):
    models = create_models(_config(), seed=0)
    trainer = models["frvsr"].obj
    params = models["frvsr"].params
    opt = make_optimizer(1e-3)
    step = build_frvsr_step(trainer, opt)
    state = TrainState(params, opt.init(params), jnp.zeros((), jnp.int32))

    batch = _batch(rng)

    def data():
        while True:
            yield batch

    logs = []
    state, history = fit(
        step, state, data(), epochs=2, steps_per_epoch=2,
        rng=jax.random.PRNGKey(6),
        checkpoint_dir=str(tmp_path), log_fn=logs.append,
    )
    assert len(history) == 2
    assert (tmp_path / "latest.npz").exists()
    assert (tmp_path / "best.npz").exists()
    assert history[1]["train_loss"] < history[0]["train_loss"]


def test_fit_raise_stops_stager_thread(rng):
    """A raise out of the epoch loop must not leak the _InputStager.

    Regression: fit() only closed the stager after a NORMAL loop exit;
    a failing step/callback left the daemon thread retrying q.put at
    10 Hz forever while pinning staged device batches.
    """
    import threading
    import time as time_mod

    models = create_models(_config(), seed=0)
    params = models["frvsr"].params
    opt = make_optimizer(1e-3)
    state = TrainState(params, opt.init(params), jnp.zeros((), jnp.int32))
    batch = _batch(rng)

    def data():
        while True:
            yield batch

    def exploding_step(state, batch, rng):
        raise RuntimeError("boom")

    before = set(threading.enumerate())
    with pytest.raises(RuntimeError, match="boom"):
        fit(exploding_step, state, data(), epochs=1, steps_per_epoch=4,
            rng=jax.random.PRNGKey(6), log_fn=lambda _m: None)
    deadline = time_mod.time() + 5.0
    while time_mod.time() < deadline:
        leaked = [t for t in set(threading.enumerate()) - before
                  if t.is_alive()]
        if not leaked:
            break
        time_mod.sleep(0.05)
    assert not leaked, f"stager thread(s) leaked: {leaked}"


def test_frvsr_steps_per_execution(rng):
    """K-steps-per-execution (scan over optimizer steps) must advance
    the state K steps per call and stay numerically sane."""
    models = create_models(_config(), seed=0)
    trainer = models["frvsr"].obj
    params = models["frvsr"].params
    opt = make_optimizer(1e-3)
    from joshupscale_tpu.training import init_train_state

    step = build_frvsr_step(trainer, opt, steps_per_execution=3)
    state = init_train_state(params, opt)
    b = _batch(rng)
    batch3 = jax.tree_util.tree_map(
        lambda x: jnp.stack([x, x, x]), b)
    state, metrics = step(state, batch3, jax.random.PRNGKey(0))
    assert int(state.step) == 3
    assert np.isfinite(float(metrics["loss"]))

    # Loss after 2 executions (6 steps) must be below the first mean.
    state, metrics2 = step(state, batch3, jax.random.PRNGKey(1))
    assert float(metrics2["loss"]) < float(metrics["loss"])


def test_frvsr_single_step(rng):
    """frvsr-single trainer: one-step FRVSR through InferenceModel."""
    config = {
        "flow": {"name": "flow-resnet", "num_inputs": 4,
                 "num_filters": 8, "num_res_blocks": 1},
        "generator": {"name": "generator-resnet", "num_filters": 8,
                      "num_res_blocks": 1},
        "inference": {"name": "inference", "flow": {"model": "flow"},
                      "generator": {"model": "generator"},
                      "skip_processing": True,
                      "frame_height": 8, "frame_width": 8,
                      "s2d_mode": False},
        "single": {"name": "frvsr-single",
                   "inference": {"model": "inference"}},
    }
    models = create_models(config, seed=0)
    built = models["single"]
    opt = make_optimizer(1e-3)
    from joshupscale_tpu.training import init_train_state

    step = build_frvsr_step(built.obj, opt)
    state = init_train_state(built.params, opt)
    batch = {
        "input": jnp.asarray(
            rng.random((2, 4, 8, 8, 3), np.float32) - 0.5),
        "target": jnp.asarray(
            rng.random((2, 32, 32, 3), np.float32) - 0.5),
        "last": jnp.asarray(
            rng.random((2, 32, 32, 3), np.float32) - 0.5),
    }
    losses = []
    for i in range(3):
        state, metrics = step(state, batch, jax.random.PRNGKey(i))
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]


def test_gan_steps_per_execution(gan_setup, rng):
    trainer, gen_params, discr_params, vgg_params = gan_setup
    gopt = make_optimizer(1e-4)
    dopt = make_optimizer(1e-4)
    step = build_gan_step(trainer, gopt, dopt, vgg_params,
                          steps_per_execution=2)
    state = _gan_state(trainer, gen_params, discr_params, gopt, dopt)
    b = _batch(rng, b=1)
    batch2 = jax.tree_util.tree_map(lambda x: jnp.stack([x, x]), b)
    state, metrics = step(state, batch2, jax.random.PRNGKey(0))
    assert int(state.step) == 2
    assert int(metrics["discr_steps"]) == 2
    assert np.isfinite(float(metrics["gen_loss"]))


def test_orbax_checkpoint_roundtrip(rng, tmp_path):
    """Non-.npz checkpoint paths use the Orbax backend."""
    pytest.importorskip("orbax.checkpoint")
    models = create_models(_config(), seed=0)
    trainer = models["frvsr"].obj
    opt = make_optimizer(1e-3)
    from joshupscale_tpu.training import init_train_state

    step = build_frvsr_step(trainer, opt)
    state = init_train_state(models["frvsr"].params, opt)
    state, _ = step(state, _batch(rng), jax.random.PRNGKey(0))

    path = str(tmp_path / "orbax_ckpt")
    save_checkpoint(path, state.tree())
    restored = load_checkpoint(path, state.tree())
    for a, b in zip(jax.tree_util.tree_leaves(state.tree()),
                    jax.tree_util.tree_leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_ping_pong_loss_equals_sliced_form(rng):
    """The flip-based ping-pong loss == the reference's sliced form
    (mean L1 of frames [0:T-1] vs [2T-2:T-1:-1], keras_models.py
    :518-523); the flip form avoids the pad(low=T) gradient that
    crashes the TPU fusion emitter."""
    from joshupscale_tpu.training.losses import ping_pong_loss

    x = jnp.asarray(rng.standard_normal((2, 19, 4, 4, 3)).astype(
        np.float32))
    got = float(ping_pong_loss(x))
    want = float(jnp.mean(jnp.abs(x[:, :9] - x[:, -1:-10:-1])))
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_pingpong_take_matches_concat_form(rng):
    """gan.pingpong (constant-index take -- the XLA:TPU pad-fold-safe
    form) is bit-identical to the reference concat construction."""
    from joshupscale_tpu.training.gan import pingpong

    x = jnp.asarray(rng.standard_normal((2, 10, 4, 5, 3)).astype(np.float32))
    got = np.asarray(pingpong(x))
    want = np.concatenate(
        [np.asarray(x), np.asarray(x)[:, -2::-1]], axis=1)
    np.testing.assert_array_equal(got, want)
    assert got.shape[1] == 19


def _u8_batch(rng, b=2, t=10, crop=CROP):
    """uint8 batch and its exactly-normalized float twin."""
    u8 = {
        "input": rng.integers(0, 256, (b, t, crop, crop, 3), dtype=np.uint8),
        "target": rng.integers(
            0, 256, (b, t, crop * 4, crop * 4, 3), dtype=np.uint8),
    }
    f32 = {k: jnp.asarray(v.astype(np.float32) / 255.0 - 0.5)
           for k, v in u8.items()}
    return {k: jnp.asarray(v) for k, v in u8.items()}, f32


def test_frvsr_u8_batch_matches_float(rng):
    """uint8 training batches (device-side normalize, the tfrecords-TPU
    input layout: 4x smaller host->HBM transfer) produce bit-identical
    metrics to host-normalized float batches."""
    u8_batch, f32_batch = _u8_batch(rng)
    key = jax.random.PRNGKey(7)
    mets = []
    for batch in (u8_batch, f32_batch):
        models = create_models(_config(), seed=0)
        trainer = models["frvsr"].obj
        params = models["frvsr"].params
        opt = make_optimizer(1e-3)
        step = build_frvsr_step(trainer, opt)
        state = TrainState(params, opt.init(params),
                           jnp.zeros((), jnp.int32))
        state, m = step(state, batch, key)
        mets.append({k: float(v) for k, v in m.items()})
    _assert_metrics_close(*mets)


def _assert_metrics_close(a, b):
    # Loss *components* are bit-identical; summed totals may differ in
    # the last ulps because the u8 graph's extra convert ops change how
    # XLA fuses (and so reassociates) the final adds.
    assert a.keys() == b.keys()
    for k in a:
        np.testing.assert_allclose(a[k], b[k], rtol=1e-5, atol=1e-6,
                                   err_msg=k)


def test_gan_u8_batch_matches_float(gan_setup, rng):
    """Same device-normalize equivalence for the GAN step."""
    trainer, gen_params, discr_params, vgg_params = gan_setup
    u8_batch, f32_batch = _u8_batch(rng, b=1)
    key = jax.random.PRNGKey(8)
    mets = []
    for batch in (u8_batch, f32_batch):
        gopt = make_optimizer(1e-4)
        dopt = make_optimizer(1e-4)
        step = build_gan_step(trainer, gopt, dopt, vgg_params)
        state = _gan_state(trainer, gen_params, discr_params, gopt, dopt)
        state, m = step(state, batch, key)
        mets.append({k: float(v) for k, v in m.items()})
    _assert_metrics_close(*mets)


def test_fit_normalizes_u8_outside_step(rng):
    """fit() must convert u8 batches in a separate program and hand the
    step f32 -- u8 entering the jitted train step hangs the XLA:TPU
    worker (CLAUDE.md round-3 gotcha)."""
    from joshupscale_tpu.training.trainer import fit

    seen = []

    def fake_step(state, batch, step_rng):
        seen.append(jax.tree_util.tree_map(lambda x: x.dtype, batch))
        return state, {"loss": np.float32(1.0)}

    def batches():
        while True:
            yield {"input": np.zeros((1, 2, 4, 4, 3), np.uint8),
                   "target": np.zeros((1, 2, 16, 16, 3), np.uint8)}

    fit(fake_step, state={}, train_data=batches(), epochs=1,
        steps_per_epoch=2, rng=jax.random.PRNGKey(0))
    assert seen
    for tree in seen:
        for dt in jax.tree_util.tree_leaves(tree):
            assert dt == jnp.float32, dt


def test_u8_guard_fires_only_on_traced_batches(rng, monkeypatch):
    """The TPU u8 hazard guard (preprocess_batch) must reject a uint8
    TRACER on a non-CPU backend (the graph that hangs the XLA:TPU
    worker) but pass EAGER u8 arrays -- an eager convert runs as its
    own tiny program, exactly like device_normalize (the play callback
    normalizes its fixed batch this way at startup)."""
    from joshupscale_tpu.training import frvsr

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    u8 = jnp.asarray(rng.integers(0, 256, (2, 3), dtype=np.uint8))

    out = frvsr.preprocess_batch(u8)  # eager: allowed on any backend
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(u8).astype(np.float32) / 255 - 0.5,
        rtol=0, atol=1e-7)

    with pytest.raises(TypeError, match="uint8 batch"):
        jax.jit(frvsr.preprocess_batch)(u8)  # traced: the hazard


def test_device_normalize_values_and_passthrough(rng):
    from joshupscale_tpu.training.trainer import device_normalize

    u8 = {"input": jnp.asarray(
        rng.integers(0, 256, (2, 3), dtype=np.uint8))}
    out = device_normalize(u8)
    # XLA lowers /255 to a reciprocal multiply: last-ulp vs numpy.
    np.testing.assert_allclose(
        np.asarray(out["input"]),
        np.asarray(u8["input"]).astype(np.float32) / 255.0 - 0.5,
        rtol=0, atol=1e-7)
    f32 = {"input": jnp.zeros((2, 3), jnp.float32)}
    assert device_normalize(f32) is f32


def test_frvsr_bn_updates_use_scan_steady_state(rng):
    """Generator BN moving stats must calibrate to the scan steps'
    activation distribution, not (only) the first call's.

    The first generator call's pre_warp input is RANDOM NOISE; scan
    steps see real warped outputs.  Collecting moving stats only from
    the first call miscalibrates inference-mode BN (measured ~ -1.7 dB
    held-out at training parity on the round-3 learning proof).  The
    oracle is a hand-rolled Python loop of the same recurrence: the
    trainer's "generator.*" updates must equal the loop's per-step
    updates averaged over the scan axis, and must differ from the
    first-call-only values.
    """
    from joshupscale_tpu.models.common import Mutables
    from joshupscale_tpu.ops import dense_image_warp
    from joshupscale_tpu.training.frvsr import (
        _merge_bt,
        _split_bt,
        flow_history_frames,
    )

    models = create_models(_config(), seed=0)
    trainer = models["frvsr"].obj
    params = models["frvsr"].params
    batch = _batch(rng, b=2, t=5)
    key = jax.random.PRNGKey(7)

    y = trainer.forward(
        params, batch["input"], batch["target"], key, training=True)
    got = {k: v for k, v in y["bn_updates"].items()
           if k.startswith("generator.")}
    assert got, "no generator BN updates collected"

    # Manual loop with the same RNG splits.
    inputs = batch["input"]
    b, t, h, w, _ = inputs.shape
    rng_hist, rng_first = jax.random.split(key)
    cur = _merge_bt(inputs[:, 1:])
    prev = _merge_bt(inputs[:, :-1])
    history = flow_history_frames(
        inputs, trainer.num_flow_frames - 2, rng_hist)
    flow = trainer.flow_apply(
        params["flow"], [cur, prev] + history, mut=Mutables(True))
    flow_t = _split_bt(flow, t - 1)
    first_warp = jax.random.uniform(
        rng_first, (b, h * 4, w * 4, 3), inputs.dtype, -0.5, 0.5)
    first_mut = Mutables(True)
    out = trainer.generator_apply(
        params["generator"], inputs[:, 0], first_warp, mut=first_mut)
    per_step = []
    for i in range(t - 1):
        warped = dense_image_warp(out, flow_t[:, i])
        sm = Mutables(True)
        out = trainer.generator_apply(
            params["generator"], inputs[:, i + 1], warped, mut=sm)
        per_step.append(sm.updates)

    for path in per_step[0]:
        want = {
            stat: np.mean(
                [np.asarray(u[path][stat]) for u in per_step], axis=0)
            for stat in per_step[0][path]
        }
        key_full = "generator." + path
        assert key_full in got, key_full
        for stat, expect in want.items():
            np.testing.assert_allclose(
                np.asarray(got[key_full][stat]), expect,
                rtol=1e-4, atol=1e-5,
                err_msg=f"{key_full}.{stat} != scan-step mean")
        # And it must NOT be the first-call-only value (noise-warp
        # statistics).  One momentum update at m=0.99 compresses the
        # difference 100x, so compare the IMPLIED batch statistic
        # (upd = old * m + batch * (1 - m)).
        from joshupscale_tpu.nn.layers import BN_MOMENTUM

        def implied_batch(upd_var, node=params["generator"]):
            sub = node
            for part in path.split("."):
                sub = sub[part]
            old = np.asarray(sub["moving_variance"])
            return (np.asarray(upd_var) - old * BN_MOMENTUM) / (
                1.0 - BN_MOMENTUM)

        got_batch = implied_batch(got[key_full]["moving_variance"])
        first_batch = implied_batch(
            first_mut.updates[path]["moving_variance"])
        assert not np.allclose(got_batch, first_batch, rtol=1e-3), (
            f"{key_full} still first-call-calibrated")


def test_gan_s2d_train_warp_matches_pixel(gan_setup, rng):
    """s2d_train_warp routes every training warp through the s2d
    corner-subposition table (the gather-rate-law training fast path);
    one full GAN step must produce the same metrics as the pixel-space
    warp up to float reassociation in the combine."""
    import dataclasses as dc

    trainer, gen_params, discr_params, vgg_params = gan_setup
    batch = _batch(rng, b=1)
    key = jax.random.PRNGKey(11)
    mets = []
    for s2d in (False, True):
        tr = dc.replace(trainer, s2d_train_warp=s2d)
        gopt = make_optimizer(1e-4)
        dopt = make_optimizer(1e-4)
        step = build_gan_step(tr, gopt, dopt, vgg_params)
        state = _gan_state(tr, gen_params, discr_params, gopt, dopt)
        state, m = step(state, batch, key)
        mets.append({k: float(v) for k, v in m.items()})
    assert mets[0].keys() == mets[1].keys()
    for k in mets[0]:
        np.testing.assert_allclose(mets[0][k], mets[1][k],
                                   rtol=5e-4, atol=1e-5, err_msg=k)


def test_frvsr_s2d_train_warp_matches_pixel(rng):
    """Same equivalence for the FRVSR step."""
    import dataclasses as dc

    models = create_models(_config(), seed=0)
    built = models["frvsr"]
    batch = _batch(rng, b=2)
    key = jax.random.PRNGKey(12)
    losses = []
    for s2d in (False, True):
        tr = dc.replace(built.obj, s2d_train_warp=s2d)
        opt = make_optimizer(1e-4)
        params = jax.tree_util.tree_map(jnp.array, built.params)
        step = build_frvsr_step(tr, opt)
        state = TrainState(params, opt.init(params),
                           jnp.zeros((), jnp.int32))
        state, metrics = step(state, batch, key)
        losses.append(float(metrics["loss"]))
    np.testing.assert_allclose(losses[0], losses[1], rtol=5e-4)


def test_fit_metric_lag_defers_fetch_without_changing_results(rng):
    """fit(metric_lag=N) must hold metric trees on device for N
    executions (so host batch prep overlaps device compute) and drain
    them at epoch end -- per-epoch history identical to the
    synchronous loop (metric_lag=0)."""
    from joshupscale_tpu.training.trainer import fit

    class Probe:
        """Scalar whose host fetch is observable."""

        def __init__(self, value, log):
            self.value = value
            self.log = log

        def __array__(self, dtype=None):
            self.log.append(self.value)
            return np.asarray(self.value, dtype or np.float32)

    def run(metric_lag):
        fetched = []
        calls = []

        def fake_step(state, batch, step_rng):
            i = len(calls)
            calls.append(i)
            # At dispatch time, the PREVIOUS step's metric must not
            # have been fetched yet when metric_lag >= 1 and the
            # previous step was in the SAME epoch (the deferral window
            # drains at every epoch end for the NaN check).
            if metric_lag >= 1 and i % 3 != 0:
                assert float(i - 1) not in fetched, (i, fetched)
            return state, {"loss": Probe(float(i), fetched)}

        def batches():
            while True:
                yield {"input": np.zeros((1, 2, 2, 3), np.float32)}

        _, history = fit(fake_step, state={}, train_data=batches(),
                         epochs=2, steps_per_epoch=3,
                         rng=jax.random.PRNGKey(0),
                         log_fn=lambda _m: None, metric_lag=metric_lag)
        return history, fetched

    h_sync, f_sync = run(0)
    h_lag, f_lag = run(1)
    assert [e["train_loss"] for e in h_sync] == \
        [e["train_loss"] for e in h_lag]
    # Everything drained by the end of each epoch in both modes.
    assert sorted(f_sync) == sorted(f_lag) == [0.0, 1.0, 2.0, 3.0, 4.0, 5.0]


def test_frvsr_step_trains_autoencoder_flow(rng):
    """Regression: the autoencoder flow must be trainable.  Its param
    tree used to carry an int ``_meta.filters`` tuple, which
    jax.value_and_grad rejects (non-inexact leaves); the ladder
    structure now derives from the param names instead."""
    cfg = {
        "flow": {"name": "flow-autoencoder", "num_inputs": 4,
                 "filters": [8, 16, 8]},
        "generator": {"name": "generator-resnet", "num_filters": 8,
                      "num_res_blocks": 1},
        "frvsr": {"name": "frvsr", "flow": {"model": "flow"},
                  "generator": {"model": "generator"}},
    }
    models = create_models(cfg, seed=0)
    trainer = models["frvsr"].obj
    params = models["frvsr"].params
    opt = make_optimizer(1e-3)
    step = build_frvsr_step(trainer, opt)
    state = TrainState(params, opt.init(params), jnp.zeros((), jnp.int32))
    batch = _batch(rng)
    losses = []
    for i in range(3):
        state, metrics = step(state, batch, jax.random.PRNGKey(i))
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]


def test_play_callback_resizes_model_to_clip(rng, tmp_path):
    """Regression: the play clip is a TRAINING crop while the inference
    model arrives configured at the SERVING frame size (and possibly
    flow_pad_factor); PlayCallback must re-dimension the model to the
    clip or init_state builds mismatched recurrent state."""
    from joshupscale_tpu.training.play import PlayCallback

    cfg = {
        "flow": {"name": "flow-resnet", "num_inputs": 4,
                 "num_filters": 8, "num_res_blocks": 1},
        "generator": {"name": "generator-resnet", "num_filters": 8,
                      "num_res_blocks": 1},
        "inference": {"name": "inference",
                      "flow": {"model": "flow"},
                      "generator": {"model": "generator"},
                      "skip_processing": True, "s2d_mode": False,
                      "frame_height": 36, "frame_width": 44,
                      "flow_pad_factor": 8,
                      "normalize_brightness": True},
    }
    models = create_models(cfg, seed=0)
    built = models["inference"]
    play_batch = {
        "input": rng.random((1, 10, CROP, CROP, 3), np.float32) - 0.5,
        "target": rng.random(
            (1, 10, CROP * 4, CROP * 4, 3), np.float32) - 0.5,
    }
    cb = PlayCallback(built.obj, play_batch, str(tmp_path))
    assert (cb.model.frame_height, cb.model.frame_width) == (CROP, CROP)
    state = TrainState(built.params, None, jnp.zeros((), jnp.int32))
    cb(0, state, {})
    import os
    assert os.path.exists(os.path.join(str(tmp_path),
                                       "play_e0000_0.gif"))


def test_fade_counter_advances_per_generator_call(rng):
    """The fade-in counter advances once per generator CALL within a
    train step -- T for FRVSR's T-frame unroll, 19 for the GAN's
    ping-pong unroll -- matching the reference FadeInLayer's per-call
    assign_add(1) (reference keras_layers.py FadeInLayer), NOT once per
    step: a fade_in_period tuned on the reference must produce the same
    fade schedule here."""
    from joshupscale_tpu.models.common import Mutables

    # Unit: the i-th call of a step sees counter+i and records +1 more.
    fade = {"counter": jnp.asarray(0, jnp.int64),
            "period": jnp.asarray(10.0, jnp.float32)}
    m = Mutables(training=True, fade_offset=3)
    y = m.fade_in(fade, "f", jnp.ones((2,)))
    np.testing.assert_allclose(np.asarray(y), 0.3)
    assert int(m.updates["f"]["counter"]) == 4

    cfg = _config(with_gan=True)
    cfg["generator"]["num_fade_in_res_blocks"] = 1
    cfg["generator"]["fade_in_period"] = 1000
    models = create_models(cfg, seed=0)

    # FRVSR: 10 frames => 10 generator calls per step.
    built = models["frvsr"]
    opt = make_optimizer(1e-4)
    step = build_frvsr_step(built.obj, opt)
    params = jax.tree_util.tree_map(jnp.array, built.params)
    state = TrainState(params, opt.init(params), jnp.zeros((), jnp.int32))
    batch = _batch(rng, b=1)
    state, _ = step(state, batch, jax.random.PRNGKey(0))
    fade_path = state.params["generator"]["block_2"]["fade"]
    assert int(fade_path["counter"]) == 10
    state, _ = step(state, batch, jax.random.PRNGKey(1))
    assert int(
        state.params["generator"]["block_2"]["fade"]["counter"]) == 20

    # GAN: 19-frame ping-pong => 19 calls per step.
    gbuilt = models["gan"]
    gopt = make_optimizer(1e-4)
    dopt = make_optimizer(1e-4)
    gstep = build_gan_step(gbuilt.obj, gopt, dopt, gbuilt.params["vgg"])
    gstate = _gan_state(gbuilt.obj, gbuilt.params["gen"],
                        gbuilt.params["discr"], gopt, dopt)
    gstate, _ = gstep(gstate, batch, jax.random.PRNGKey(2))
    assert int(
        gstate.gen_params["generator"]["block_2"]["fade"]["counter"]) == 19


def test_sub_model_freeze_composes_into_frozen_paths():
    """``freeze: true`` on a SUB-model entry must reach the trainer's
    gradient mask (reference create_models drops frozen variables from
    trainable_variables) -- previously the factories never consulted
    sub-model trainable/frozen_paths, so frozen networks trained anyway.
    """
    cfg = _config()
    cfg["flow"]["freeze"] = True
    models = create_models(cfg, seed=0)
    assert "flow" in models["frvsr"].frozen_paths

    # List-form freeze on a sub-model re-roots under the sub-model name,
    # and an entry-level list MERGES with (not overwrites) it.
    cfg = _config()
    cfg["generator"]["freeze"] = ["conv_1"]
    cfg["frvsr"]["freeze"] = ["flow.conv_1"]
    models = create_models(cfg, seed=0)
    fp = set(models["frvsr"].frozen_paths)
    assert {"generator.conv_1", "flow.conv_1"} <= fp

    # The mask built from the composed paths actually zeroes the
    # frozen subtree.
    mask = freeze_mask(models["frvsr"].params,
                       tuple(models["frvsr"].frozen_paths))
    assert mask["generator"]["conv_1"]["kernel"] == 0.0
    assert mask["generator"]["block_1"]["conv_1"]["kernel"] == 1.0


def test_freeze_mask_trainable_false_zeroes_everything():
    """Whole-model ``freeze: true`` (BuiltModel.trainable=False) makes
    every leaf multiplier 0."""
    params = {"a": {"kernel": jnp.ones(2)}, "b": jnp.ones(3)}
    mask = freeze_mask(params, (), trainable=False)
    assert mask["a"]["kernel"] == 0.0 and mask["b"] == 0.0


def test_fit_early_stopping_without_checkpoint_dir():
    """Early stopping must work with checkpoint_dir=None -- best/stale
    tracking was previously coupled to checkpoint writing, making the
    patience check dead code for library callers without checkpoints."""
    calls = {"n": 0}

    def worsening_step(state, batch, rng):
        calls["n"] += 1
        return state, {"loss": jnp.asarray(float(calls["n"]))}

    def data():
        while True:
            yield {"input": np.zeros((1,), np.float32)}

    state = TrainState(None, None, jnp.zeros((), jnp.int32))
    _, history = fit(
        worsening_step, state, data(), epochs=20, steps_per_epoch=1,
        rng=jax.random.PRNGKey(0), checkpoint_dir=None,
        early_stopping_patience=2, log_fn=lambda _m: None,
    )
    # Loss worsens every epoch: epoch 0 sets best, then 2 stale epochs
    # hit wait >= patience (Keras EarlyStopping semantics) -> stop at
    # epoch 2, far short of 20.
    assert len(history) == 3


def test_frvsr_single_validates_with_default_s2d_inference(rng):
    """frvsr-single built from a DEFAULT inference entry (registry
    s2d_mode=True) must still run training=False validation: the
    trainer feeds pixel-form recurrent state, so the registry pins a
    pixel-state twin for training -- previously the val path routed
    through the s2d warp and shape-crashed mid-run."""
    config = {
        "flow": {"name": "flow-resnet", "num_inputs": 4,
                 "num_filters": 8, "num_res_blocks": 1},
        "generator": {"name": "generator-resnet", "num_filters": 8,
                      "num_res_blocks": 1},
        "inference": {"name": "inference", "flow": {"model": "flow"},
                      "generator": {"model": "generator"},
                      "skip_processing": True,
                      "frame_height": 8, "frame_width": 8},
        "single": {"name": "frvsr-single",
                   "inference": {"model": "inference"}},
    }
    models = create_models(config, seed=0)
    built = models["single"]
    # The inference entry keeps its serving configuration...
    assert models["inference"].obj.s2d_mode is True
    # ...but the trainer's twin is pixel-state.
    assert built.obj.model.s2d_mode is False
    batch = {
        "input": jnp.asarray(
            rng.random((2, 4, 8, 8, 3), np.float32) - 0.5),
        "target": jnp.asarray(
            rng.random((2, 32, 32, 3), np.float32) - 0.5),
        "last": jnp.asarray(
            rng.random((2, 32, 32, 3), np.float32) - 0.5),
    }
    _, aux = built.obj.loss(built.params, batch, jax.random.PRNGKey(0),
                            training=False)
    assert np.isfinite(float(aux["metrics"]["loss"]))


def test_fit_finite_train_data_raises_clear_error():
    """A finite training stream must fail with a message naming the
    cause (missing RepeatOp / undersized iterable), not a PEP-479
    RuntimeError('generator raised StopIteration') from the stager."""
    from joshupscale_tpu.training.trainer import TrainState, fit

    def step(state, batch, rng):
        return state, {"loss": jnp.asarray(1.0)}

    batches = iter([{"input": np.zeros((1,), np.float32)}] * 3)
    state = TrainState(None, None, jnp.zeros((), jnp.int32))
    with pytest.raises(ValueError, match="RepeatOp"):
        fit(step, state, batches, epochs=2, steps_per_epoch=3,
            rng=jax.random.PRNGKey(0), log_fn=lambda _m: None)


def test_piecewise_schedule_matches_keras_boundaries():
    """Keras PiecewiseConstantDecay keeps values[0] for step <=
    boundaries[0] (INCLUSIVE); optax.join_schedules switches AT the
    boundary, so the config translation must shift by one."""
    from joshupscale_tpu.training.schedules import get_learning_rate

    sched = get_learning_rate(
        {"name": "piecewise", "boundaries": [10, 20],
         "values": [1.0, 0.5, 0.25]})
    assert float(sched(10)) == 1.0   # inclusive boundary
    assert float(sched(11)) == 0.5
    assert float(sched(20)) == 0.5
    assert float(sched(21)) == 0.25


def test_fit_cache_val_on_device_single_pass():
    """cache_val_on_device stages the val set once: epochs 2+ must not
    re-iterate the host val iterable, and metrics must match the
    uncached run exactly."""
    from joshupscale_tpu.training.trainer import TrainState, fit

    def step(state, batch, rng):
        return state, {"loss": jnp.asarray(0.0)}

    def val_fn(state, batch, rng):
        return {"val_metric": jnp.asarray(float(batch["x"].sum()))}

    class CountingVal:
        def __init__(self):
            self.iterations = 0

        def __iter__(self):
            self.iterations += 1
            return iter([{"x": np.full((2,), 3.0, np.float32)},
                         {"x": np.full((2,), 5.0, np.float32)}])

    def data():
        while True:
            yield {"input": np.zeros((1,), np.float32)}

    def run(cache):
        counting = CountingVal()
        state = TrainState(None, None, jnp.zeros((), jnp.int32))
        _, hist = fit(
            step, state, data(), epochs=3, steps_per_epoch=1,
            rng=jax.random.PRNGKey(0), val_fn=val_fn,
            val_data=counting, cache_val_on_device=cache,
            log_fn=lambda _m: None)
        return counting.iterations, hist

    it_cached, hist_cached = run(True)
    it_plain, hist_plain = run(False)
    assert it_cached == 1 and it_plain == 3
    # Mean over the two val batches: (2*3 + 2*5) / 2 = 8.
    for a, b in zip(hist_cached, hist_plain):
        assert a["val_val_metric"] == b["val_val_metric"] == 8.0


def test_checkpoint_prefix_autodetect_and_load(rng, tmp_path):
    """Deployment tools load trained weights from ANY checkpoint layout
    (raw export / TrainState / GANTrainState) via the shared
    auto-detecting loader -- make_model_set --weights used to crash on
    its own documented example (fit() checkpoints are flattened train
    STATES, not raw params)."""
    from joshupscale_tpu.export.importer import (
        detect_checkpoint_prefix,
        load_trained_params,
        save_params_npz,
    )

    models = create_models(_config(with_gan=True), seed=0)
    gbuilt = models["gan"]
    gopt = make_optimizer(1e-4)
    dopt = make_optimizer(1e-4)
    gstate = _gan_state(gbuilt.obj, gbuilt.params["gen"],
                        gbuilt.params["discr"], gopt, dopt)
    gan_ckpt = str(tmp_path / "gan.npz")
    save_checkpoint(gan_ckpt, gstate.tree())
    assert detect_checkpoint_prefix(gan_ckpt) == "gen_params"

    fr = models["frvsr"]
    fopt = make_optimizer(1e-4)
    fstate = TrainState(
        jax.tree_util.tree_map(jnp.array, fr.params),
        fopt.init(fr.params), jnp.zeros((), jnp.int32))
    frvsr_ckpt = str(tmp_path / "frvsr.npz")
    save_checkpoint(frvsr_ckpt, fstate.tree())
    assert detect_checkpoint_prefix(frvsr_ckpt) == "params"

    raw_ckpt = str(tmp_path / "raw.npz")
    save_params_npz(raw_ckpt, gbuilt.params["gen"])
    assert detect_checkpoint_prefix(raw_ckpt) == ""

    # The loader maps each layout onto an inference template.
    template = {"flow": gbuilt.params["gen"]["flow"],
                "generator": gbuilt.params["gen"]["generator"]}
    for ckpt in (gan_ckpt, raw_ckpt):
        loaded = load_trained_params(ckpt, template)
        np.testing.assert_array_equal(
            np.asarray(loaded["generator"]["conv_1"]["kernel"]),
            np.asarray(
                gbuilt.params["gen"]["generator"]["conv_1"]["kernel"]))
