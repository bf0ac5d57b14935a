"""Training CLI: YAML config -> models -> datasets -> fit -> export.

Parity with reference ``scripts/training/train_local.py``: the config has
``models:`` (registry entries), ``train_dataset:`` / ``val_dataset:``
(op-chain lists), ``train:`` (loop settings), ``export:`` (package
output).  Differences by design:

- YAML is parsed with ``safe_load`` (the reference uses ``unsafe_load``).
- Device setup is JAX-native: data parallelism comes from a 1-D mesh over
  all local devices (the reference's MirroredStrategy analog); bfloat16
  replaces mixed_float16 (no loss scaling needed).
- Checkpoints are flat-npz train states with best/latest retention.

Usage: ``python -m joshupscale_tpu.training.cli -c config.yaml``
"""

from __future__ import annotations

import argparse
import os
from typing import Any, Dict



def parse_args(argv=None):
    parser = argparse.ArgumentParser(description="Train JoshUpscale-TPU")
    parser.add_argument("-c", "--config", required=True,
                        help="YAML config path")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--cpu", action="store_true",
                        help="force CPU backend")
    parser.add_argument("--num-devices", type=int, default=None,
                        help="limit data-parallel devices")
    return parser.parse_args(argv)


def main(argv=None) -> int:
    args = parse_args(argv)
    if args.cpu:
        os.environ.setdefault("JAX_PLATFORMS", "cpu")

    import yaml

    with open(args.config) as f:
        config = yaml.safe_load(f)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    return train(config, seed=args.seed, num_devices=args.num_devices)


def train(config: Dict[str, Any], seed: int = 0,
          num_devices=None) -> int:
    import jax
    import jax.numpy as jnp

    from joshupscale_tpu.data import (
        create_train_dataset,
        create_val_dataset,
    )
    from joshupscale_tpu.models import create_models
    from joshupscale_tpu.parallel.mesh import create_mesh
    from joshupscale_tpu.training import (
        build_frvsr_step,
        build_gan_step,
        fit,
        freeze_mask,
        init_gan_state,
        init_train_state,
        load_checkpoint,
        make_optimizer,
    )
    from joshupscale_tpu.training.play import PlayCallback

    # Persistent XLA compile cache: the full-architecture train step
    # costs ~20 min of remote compile on the tunneled TPU; cached
    # executables make restarts/resumes near-instant (the same
    # .trt-timing-cache analog the serving engine uses).
    from joshupscale_tpu.runtime.engine import enable_compilation_cache

    enable_compilation_cache()

    train_cfg = dict(config.get("train", {}))
    models = create_models(config["models"], seed=seed)

    trainer_name = train_cfg.get("model")
    if trainer_name is None:
        candidates = [n for n, m in models.items()
                      if m.kind in ("frvsr", "frvsr-single", "gan")]
        if len(candidates) != 1:
            raise ValueError(
                "Set train.model; trainer candidates: " + str(candidates)
            )
        trainer_name = candidates[0]
    built = models[trainer_name]
    trainer = built.obj
    lr = built.config.get("learning_rate", 0.0005)
    reg = built.config.get("regularization")
    l2_reg = 0.0
    if isinstance(reg, dict) and reg.get("name") == "l2":
        l2_reg = float(reg.get("l2", 0.0))

    n_dev = num_devices or len(jax.devices())
    mesh = create_mesh(n_dev) if n_dev > 1 else None
    if mesh is not None:
        print(f"data-parallel mesh over {n_dev} devices")

    batch_size = int(train_cfg.get("batch_size", 4))
    epochs = int(train_cfg.get("epochs", 1))
    steps_per_epoch = int(train_cfg.get("steps_per_epoch", 100))
    ckpt_dir = train_cfg.get("checkpoint_dir", "checkpoints")
    log_dir = train_cfg.get("log_dir", ckpt_dir)

    # Seeded end to end (reference train_local.py:78-79 seeds keras/np/
    # random globally): the data pipeline's shuffle order and
    # augmentation draws reproduce from (config, seed, data_workers).
    train_ds = create_train_dataset(
        config["train_dataset"], batch_size, seed=seed,
        num_workers=int(train_cfg.get("data_workers", 0)),
    )

    tb_dir = (os.path.join(log_dir, "tb")
              if train_cfg.get("tensorboard", True) else None)
    tb_logger = None
    if tb_dir:
        from joshupscale_tpu.training.trainer import TensorBoardLogger

        tb_logger = TensorBoardLogger(tb_dir)

    val_iterable = None
    play_cb = None
    if "val_dataset" in config:
        val_ds, play_ds = create_val_dataset(
            config["val_dataset"], batch_size,
            play_size=int(train_cfg.get("play_size", 4)),
            val_size=int(train_cfg.get("val_size", 16)),
            seed=seed,
        )
        val_iterable = val_ds
        if next(iter(val_ds), None) is None:
            # BatchOp drops the remainder: fewer than batch_size val
            # sequences leaves val_ds EMPTY, and monitoring would
            # silently fall back to the train metric.
            log("WARNING: val dataset yielded no full batches "
                "(val_size/batch_size exceed the available "
                "sequences?); validation metrics will be absent")
        inference = built.config.get("inference")
        if inference is not None and inference.obj is not None:
            try:
                play_batch = next(iter(play_ds))
            except StopIteration:
                raise ValueError(
                    "play dataset is empty: the val dataset must yield "
                    "at least play_size sequences (BatchOp drops "
                    "incomplete batches)") from None
            play_cb = PlayCallback(
                inference.obj, play_batch,
                os.path.join(log_dir, "play"),
                interval=int(train_cfg.get("play_interval", 1)),
                tb_logger=tb_logger,
            )

    rng = jax.random.PRNGKey(seed)

    if built.kind == "gan":
        gopt = make_optimizer(lr)
        dopt = make_optimizer(lr)
        # Masks honor BOTH freeze forms: dotted frozen_paths (sub-model
        # freeze composes into them via the registry) and whole-model
        # trainable=False (``freeze: true`` on the trainer entry).
        gen_mask = freeze_mask(
            built.params["gen"], tuple(built.frozen_paths),
            trainable=built.trainable,
        ) if (built.frozen_paths or not built.trainable) else None
        discr_frozen = tuple(built.config.get("discr_frozen_paths", ()))
        discr_trainable = (built.trainable
                           and built.config.get("discr_trainable", True))
        discr_mask = freeze_mask(
            built.params["discr"], discr_frozen,
            trainable=discr_trainable,
        ) if (discr_frozen or not discr_trainable) else None
        step = build_gan_step(
            trainer, gopt, dopt, built.params["vgg"],
            gen_mask=gen_mask, discr_mask=discr_mask,
            l2_reg=l2_reg, mesh=mesh,
            steps_per_execution=int(
                train_cfg.get("steps_per_execution", 1)),
        )
        state = init_gan_state(
            trainer, built.params["gen"], built.params["discr"],
            gopt, dopt,
        )

        # Jitted: the un-jitted recurrent forward dispatches hundreds
        # of ops per val batch (~28 ms tunnel RTT each on the real
        # chip); one compile per batch shape, identical numbers.
        vgg_params = built.params["vgg"]

        @jax.jit
        def _val_gan(gen_params, discr_params, ema, inp, tgt, key):
            y = trainer.forward(
                gen_params, discr_params, vgg_params, inp, tgt,
                key, training=False,
            )
            terms = trainer.compute_losses(y, ema)
            return {k: v for k, v in terms.items()
                    if k not in ("gen_loss", "discr_loss")}

        def val_fn(st, batch, key):
            return _val_gan(
                st.gen_params, st.discr_params, st.ema,
                jnp.asarray(batch["input"]),
                jnp.asarray(batch["target"]), key,
            )

        monitor = train_cfg.get("monitor", "content_loss")
    else:
        opt = make_optimizer(lr)
        mask = freeze_mask(
            built.params, tuple(built.frozen_paths),
            trainable=built.trainable,
        ) if (built.frozen_paths or not built.trainable) else None
        step = build_frvsr_step(
            trainer, opt, mask=mask, l2_reg=l2_reg, mesh=mesh,
            steps_per_execution=int(
                train_cfg.get("steps_per_execution", 1)),
        )
        state = init_train_state(built.params, opt)

        @jax.jit
        def _val_frvsr(params, batch, key):
            # Inference-mode BN for validation (reference Keras
            # test_step(training=False)).
            _, aux = trainer.loss(params, batch, key, training=False)
            return aux["metrics"]

        def val_fn(st, batch, key):
            return _val_frvsr(
                st.params,
                {k: jnp.asarray(v) for k, v in batch.items()}, key,
            )

        monitor = train_cfg.get("monitor", "loss")

    resume = train_cfg.get("resume")
    if resume:
        state = type(state)(**load_checkpoint(resume, state.tree()))
        print(f"resumed from {resume}")

    state, history = fit(
        step,
        state,
        iter(train_ds),
        epochs=epochs,
        steps_per_epoch=steps_per_epoch,
        rng=rng,
        val_fn=val_fn if val_iterable is not None else None,
        val_data=val_iterable,
        # The CLI's val set is CacheOp'd and immutable: stage it to
        # device once instead of re-uploading every epoch.
        cache_val_on_device=True,
        checkpoint_dir=ckpt_dir,
        monitor=monitor,
        early_stopping_patience=train_cfg.get("early_stopping_patience"),
        epoch_callback=play_cb,
        tensorboard_dir=tb_dir,
        # Reference profiles batches 5-10 via TensorBoard unless
        # --disable-profile (train_local.py:106-110); `profile: false`
        # in the train section disables it here.
        profile_dir=(os.path.join(log_dir, "profile")
                     if tb_dir and train_cfg.get("profile", True)
                     else None),
        # Deferred metric-fetch window: None (default) holds metric
        # trees on device until epoch end and fetches them in one
        # batched device_get; 0 = fully synchronous loop.
        metric_lag=train_cfg.get("metric_lag"),
        stage_inputs=bool(train_cfg.get("stage_inputs", True)),
    )

    export_cfg = config.get("export")
    if export_cfg:
        _export(export_cfg, config, models, built, state)
    return 0


def _export(export_cfg, config, models, built, state) -> None:
    """Write trained weights + a deployable inference package."""
    from joshupscale_tpu.export.importer import save_params_npz
    from joshupscale_tpu.export.package import save_package
    from joshupscale_tpu.models import create_models

    out_dir = export_cfg.get("dir", "export")
    os.makedirs(out_dir, exist_ok=True)

    if built.kind == "gan":
        trained = state.gen_params
    else:
        trained = state.params
    save_params_npz(os.path.join(out_dir, "weights.npz"), trained)

    inference = built.config.get("inference")
    inf_name = export_cfg.get("model")
    if inf_name and inf_name in models:
        inference = models[inf_name]
    if inference is not None and inference.obj is not None:
        if built.kind in ("frvsr", "gan"):
            inference.params = {
                "flow": trained["flow"],
                "generator": trained["generator"],
            }
        else:
            inference.params = trained
        # Prune the model config to entries reachable from the inference
        # model (the package must not rebuild trainers/VGG on load).
        inf_key = next(
            (n for n, m in models.items() if m is inference), "inference"
        )

        def reachable(name, seen):
            if name in seen:
                return
            seen.add(name)
            for v in config["models"][name].values():
                if isinstance(v, dict) and "model" in v:
                    reachable(v["model"], seen)

        keep = set()
        reachable(inf_key, keep)
        model_cfg = {
            name: entry for name, entry in config["models"].items()
            if name in keep
        }
        # The package is a SERVING artifact: the runtime ABI (Engine /
        # native createRuntime) feeds uint8 frames, so the training-time
        # ``skip_processing: true`` (float I/O for the trainer's loss
        # plumbing) must not leak into it.  ``export: {overrides: {...}}``
        # merges further serving-config keys into the packaged inference
        # entry (e.g. compute_dtype: bfloat16, frame_height/width).
        inf_entry = dict(model_cfg[inf_key])
        inf_entry["skip_processing"] = False
        inf_entry.update(export_cfg.get("overrides") or {})
        model_cfg[inf_key] = inf_entry
        rebuilt = create_models(model_cfg, seed=0)[inf_key]
        rebuilt.params = inference.params
        inference = rebuilt
        save_package(
            os.path.join(out_dir, "package"), model_cfg, inference,
            inference_name=inf_key,
        )
        print(f"exported package to {out_dir}/package")

        # ONNX exit door back into the reference's TensorRT toolchain
        # (reference train_local.py:194-207 exports via tf2onnx; here
        # the post-surgery graph is emitted directly, no donor needed).
        if export_cfg.get("onnx"):
            from joshupscale_tpu.export.onnx_export import export_onnx

            m = inference.obj
            onnx_opts = dict(
                num_flow_frames=m.num_flow_frames,
                frame_moving_avg=m.frame_moving_avg,
                output_flow=m.output_flow,
                remove_flow=m.remove_flow,
                flow_pad_factor=m.flow_pad_factor,
                normalize_brightness=m.normalize_brightness,
            )
            onnx_path = os.path.join(out_dir, "model.onnx")
            try:
                export_onnx(onnx_path, inference.params,
                            m.frame_height, m.frame_width, **onnx_opts)
                print(f"exported ONNX graph to {onnx_path}")
                if export_cfg.get("onnx_fp16"):
                    fp16_path = os.path.join(out_dir, "model_fp16.onnx")
                    export_onnx(fp16_path, inference.params,
                                m.frame_height, m.frame_width,
                                fp16=True, **onnx_opts)
                    print(f"exported fp16 ONNX graph to {fp16_path}")
            except (KeyError, NotImplementedError) as exc:
                print(f"ONNX export skipped (unsupported arch): {exc}")


if __name__ == "__main__":
    raise SystemExit(main())
