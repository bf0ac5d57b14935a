"""Config-driven model registry.

Parity with reference ``scripts/training/models.py`` MODELS /
create_models (:1124-1194): YAML configs name models and factories;
``{model: <name>}`` values cross-reference other entries; ``weights`` loads
a checkpoint; ``freeze`` marks parameters non-trainable; ``copy_weights``
copies parameters layer-by-layer from another model where names/shapes
match.

Each built model is a :class:`BuiltModel` holding the param pytree, a bound
apply callable, and trainability metadata -- the functional analog of a
Keras model object.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from joshupscale_tpu.models import discriminator as disc_mod
from joshupscale_tpu.models import fnet, generator
from joshupscale_tpu.models import vgg as vgg_mod
from joshupscale_tpu.models.inference import InferenceModel


@dataclasses.dataclass
class BuiltModel:
    """A constructed model: params + bound apply + metadata."""

    kind: str
    params: Any
    apply: Optional[Callable[..., Any]] = None
    obj: Any = None  # e.g. InferenceModel
    trainable: bool = True
    frozen_paths: tuple = ()
    config: Dict[str, Any] = dataclasses.field(default_factory=dict)

    def num_params(self) -> int:
        leaves = jax.tree_util.tree_leaves(self.strip_meta())
        return int(sum(np.prod(x.shape) for x in leaves))

    def strip_meta(self):
        return strip_meta(self.params)


def strip_meta(tree):
    """Drop '_meta' entries (static config riding in the param dict)."""
    if isinstance(tree, dict):
        return {
            k: strip_meta(v) for k, v in tree.items() if k != "_meta"
        }
    if isinstance(tree, list):
        return [strip_meta(v) for v in tree]
    return tree


# ---------------------------------------------------------------------------
# Factories


def _sub_frozen(prefix: str, sub: Optional[BuiltModel]) -> tuple:
    """A sub-model's freeze markers, re-rooted under ``prefix``.

    Trainer factories compose these into their own ``frozen_paths`` so
    ``freeze: true`` on a SUB-model entry (reference ``create_models``
    drops frozen variables from ``trainable_variables``) reaches the
    step builders' gradient masks -- otherwise sub-model freezing is
    silently ignored.
    """
    if sub is None:
        return ()
    if not sub.trainable:
        return (prefix,)
    return tuple(f"{prefix}.{p}" for p in sub.frozen_paths)


def _build_flow_resnet(key, *, num_inputs=4, num_filters=64,
                       num_res_blocks=10, activation="relu",
                       dtype=jnp.float32, zero_init_tail=False, **_):
    params = fnet.flow_resnet_init(
        key, num_inputs=num_inputs, num_filters=num_filters,
        num_res_blocks=num_res_blocks, dtype=dtype,
        zero_init_tail=zero_init_tail,
    )
    apply = functools.partial(
        fnet.flow_resnet_apply,
        activation=activation,
        num_res_blocks=num_res_blocks,
    )
    return BuiltModel(
        kind="flow-resnet", params=params, apply=apply,
        config={"num_inputs": num_inputs},
    )


def _build_flow_autoencoder(key, *, num_inputs=4, filters=None,
                            activation="relu", dtype=jnp.float32, **_):
    params = fnet.flow_autoencoder_init(
        key, num_inputs=num_inputs, filters=filters, dtype=dtype
    )
    # No filters kwarg: the apply derives the ladder structure from the
    # param tree, so weights loaded with a different ladder still run.
    apply = functools.partial(
        fnet.flow_autoencoder_apply, activation=activation
    )
    return BuiltModel(
        kind="flow-autoencoder", params=params, apply=apply,
        config={"num_inputs": num_inputs},
    )


def _build_generator_resnet(key, *, num_filters=64, num_res_blocks=24,
                            num_fade_in_res_blocks=0, fade_in_period=0,
                            activation="relu", dtype=jnp.float32,
                            zero_init_tail=False, **_):
    params = generator.generator_resnet_init(
        key, num_filters=num_filters, num_res_blocks=num_res_blocks,
        num_fade_in_res_blocks=num_fade_in_res_blocks,
        fade_in_period=fade_in_period, dtype=dtype,
        zero_init_tail=zero_init_tail,
    )
    apply = functools.partial(
        generator.generator_resnet_apply, activation=activation
    )
    return BuiltModel(kind="generator-resnet", params=params, apply=apply)


def _build_discriminator(key, *, crop_size=None, activation="lrelu",
                         alpha=1.0, dtype=jnp.float32, **_):
    params = disc_mod.discriminator_init(key, alpha=alpha, dtype=dtype)
    apply = functools.partial(
        disc_mod.discriminator_apply, activation=activation
    )
    return BuiltModel(
        kind="discriminator", params=params, apply=apply,
        config={"crop_size": crop_size},
    )


def _build_vgg(key, *, crop_size=None, out_layers=None, weights=None, **_):
    params, apply = vgg_mod.build_vgg(key, out_layers=out_layers,
                                      weights_path=weights)
    return BuiltModel(kind="vgg", params=params, apply=apply,
                      trainable=False)


def _build_inference(key, *, generator_model: BuiltModel,
                     flow_model: Optional[BuiltModel] = None,
                     skip_processing=True,
                     frame_height=None, frame_width=None,
                     flow_pad_factor=None, normalize_brightness=False,
                     compute_dtype=jnp.float32, frame_moving_avg=None,
                     output_flow=False, remove_flow=False, s2d_mode=True,
                     deferred_display=True, u8_state=False, **_):
    if frame_moving_avg is not None and not hasattr(
        frame_moving_avg, "strength"
    ):
        from joshupscale_tpu.ops.temporal import FrameMovingAvgConfig

        frame_moving_avg = FrameMovingAvgConfig(**frame_moving_avg)
    if flow_model is None and not remove_flow:
        raise ValueError("inference needs a flow model unless remove_flow")
    if flow_model is not None and flow_model.config.get(
            "num_inputs", 4) < 2:
        # num_inputs counts the current frame PLUS the last-frame shift
        # register; 1 leaves the register empty and the recurrence
        # (apply_flow_stage's state threading) has no motion reference
        # -- fail at build time instead of an IndexError at trace time.
        raise ValueError(
            "flow num_inputs must be >= 2 (current frame + at least "
            "one last frame)")
    model = InferenceModel(
        flow_apply=flow_model.apply if flow_model else None,
        generator_apply=generator_model.apply,
        num_flow_frames=(
            flow_model.config.get("num_inputs", 4) if flow_model else 0
        ),
        frame_height=frame_height or 270,
        frame_width=frame_width or 480,
        flow_pad_factor=flow_pad_factor,
        normalize_brightness=normalize_brightness,
        skip_processing=skip_processing,
        compute_dtype=compute_dtype,
        frame_moving_avg=frame_moving_avg,
        output_flow=output_flow,
        remove_flow=remove_flow,
        s2d_mode=s2d_mode,
        deferred_display=deferred_display,
        u8_state=u8_state,
    )
    params = {"generator": generator_model.params}
    if flow_model is not None:
        params["flow"] = flow_model.params
    return BuiltModel(kind="inference", params=params, obj=model,
                      apply=model.apply,
                      frozen_paths=(_sub_frozen("flow", flow_model)
                                    + _sub_frozen("generator",
                                                  generator_model)))


def _build_frvsr(key, *, flow_model: BuiltModel,
                 generator_model: BuiltModel,
                 inference_model: Optional[BuiltModel] = None,
                 learning_rate=0.0005, normalize_brightness=False,
                 regularization=None, compute_dtype=jnp.float32,
                 s2d_train_warp=False, s2d_scan_warp=True, **_):
    """FRVSR trainer (reference models.py get_frvsr :879-935)."""
    from joshupscale_tpu.training.frvsr import FRVSRTrainer

    trainer = FRVSRTrainer(
        flow_apply=flow_model.apply,
        generator_apply=generator_model.apply,
        num_flow_frames=flow_model.config.get("num_inputs", 4),
        normalize_brightness=normalize_brightness,
        compute_dtype=compute_dtype,
        s2d_train_warp=s2d_train_warp,
        s2d_scan_warp=s2d_scan_warp,
    )
    params = {
        "flow": flow_model.params,
        "generator": generator_model.params,
    }
    return BuiltModel(
        kind="frvsr", params=params, obj=trainer,
        frozen_paths=(_sub_frozen("flow", flow_model)
                      + _sub_frozen("generator", generator_model)),
        config={
            "learning_rate": learning_rate,
            "regularization": regularization,
            "inference": inference_model,
        },
    )


def _build_frvsr_single(key, *, inference_model: BuiltModel,
                        learning_rate=0.0005, regularization=None, **_):
    """Single-step FRVSR trainer (reference get_frvsr_single :832-876)."""
    from joshupscale_tpu.training.frvsr import FRVSRSingleTrainer

    model_obj = inference_model.obj
    if getattr(model_obj, "s2d_mode", False):
        # The trainer feeds PIXEL-form recurrent state by hand; the
        # registry's serving default (s2d_mode=True) would route the
        # training=False (validation) path through the s2d warp, which
        # expects (B, H, W, 48) state -- shape crash mid-run.  Train on
        # a pixel-state twin; the inference entry itself keeps its
        # serving configuration.
        model_obj = dataclasses.replace(model_obj, s2d_mode=False)
    trainer = FRVSRSingleTrainer(model=model_obj)
    return BuiltModel(
        kind="frvsr-single", params=inference_model.params, obj=trainer,
        trainable=inference_model.trainable,
        frozen_paths=inference_model.frozen_paths,
        config={
            "learning_rate": learning_rate,
            "regularization": regularization,
            "inference": inference_model,
        },
    )


def _build_gan(key, *, flow_model: BuiltModel,
               generator_model: BuiltModel,
               discriminator_model: BuiltModel,
               vgg_model: BuiltModel,
               inference_model: Optional[BuiltModel] = None,
               learning_rate=0.0005, normalize_brightness=False,
               loss_config=None, regularization=None,
               compute_dtype=jnp.float32, s2d_train_warp=True,
               s2d_scan_warp=None, **_):
    """GAN trainer (reference models.py get_gan :992-1070)."""
    from joshupscale_tpu.training.gan import GANTrainer

    cfg_items = tuple(sorted((loss_config or {}).items()))
    trainer = GANTrainer(
        flow_apply=flow_model.apply,
        generator_apply=generator_model.apply,
        discriminator_apply=discriminator_model.apply,
        vgg_apply=vgg_model.apply,
        num_flow_frames=flow_model.config.get("num_inputs", 4),
        normalize_brightness=normalize_brightness,
        loss_config=cfg_items,
        compute_dtype=compute_dtype,
        s2d_train_warp=s2d_train_warp,
        s2d_scan_warp=s2d_scan_warp,
    )
    params = {
        "gen": {
            "flow": flow_model.params,
            "generator": generator_model.params,
        },
        "discr": discriminator_model.params,
        "vgg": vgg_model.params,
    }
    return BuiltModel(
        kind="gan", params=params, obj=trainer,
        # GAN frozen_paths are relative to the GEN subtree (the CLI
        # builds its gen_mask from params["gen"]); the discriminator's
        # freeze markers ride in config for the separate discr_mask.
        frozen_paths=(_sub_frozen("flow", flow_model)
                      + _sub_frozen("generator", generator_model)),
        config={
            "learning_rate": learning_rate,
            "regularization": regularization,
            "inference": inference_model,
            "discr_trainable": discriminator_model.trainable,
            "discr_frozen_paths": tuple(
                discriminator_model.frozen_paths),
        },
    )


MODELS: Dict[str, Callable[..., BuiltModel]] = {
    "flow-resnet": _build_flow_resnet,
    "flow-autoencoder": _build_flow_autoencoder,
    "generator-resnet": _build_generator_resnet,
    "discriminator": _build_discriminator,
    "vgg": _build_vgg,
    "inference": _build_inference,
    "frvsr": _build_frvsr,
    "frvsr-single": _build_frvsr_single,
    "gan": _build_gan,
}


def register_model(name: str, factory: Callable[..., BuiltModel]) -> None:
    MODELS[name] = factory


# ---------------------------------------------------------------------------
# Config resolution


DTYPES = {
    "float32": jnp.float32,
    "bfloat16": jnp.bfloat16,
    "float16": jnp.float16,
}


def _copy_matching(dst_tree, src_tree):
    """Copy leaves from src into dst where paths and shapes match."""
    if isinstance(dst_tree, dict) and isinstance(src_tree, dict):
        return {
            k: (
                _copy_matching(v, src_tree[k]) if k in src_tree else v
            )
            for k, v in dst_tree.items()
        }
    if hasattr(dst_tree, "shape") and hasattr(src_tree, "shape"):
        if dst_tree.shape == src_tree.shape:
            return src_tree
    return dst_tree


def create_models(config: Dict[str, Any],
                  seed: int = 0) -> Dict[str, BuiltModel]:
    """Build all models in a config dict, resolving cross-references.

    Each entry: ``{name: {"name": <factory>, ...kwargs}}``; kwargs of the
    form ``{"model": other}`` resolve to the other built model.  Supported
    meta-keys per entry: ``weights`` (npz checkpoint path), ``freeze``
    (bool or list of dotted paths), ``copy_weights`` (name of the model to
    copy matching params from).
    """
    from joshupscale_tpu.export.importer import load_params_npz

    models: Dict[str, BuiltModel] = {}
    key = jax.random.PRNGKey(seed)
    keys = {name: k for name, k in
            zip(config, jax.random.split(key, max(len(config), 2)))}

    def build(name: str) -> BuiltModel:
        if name in models:
            return models[name]
        args = dict(config[name])
        model_type = args.pop("name")
        weights = args.pop("weights", None)
        freeze = args.pop("freeze", None)
        copy_weights = args.pop("copy_weights", None)
        copy_variables = args.pop("copy_variables", None)
        if "dtype" in args and isinstance(args["dtype"], str):
            args["dtype"] = DTYPES[args["dtype"]]
        if "compute_dtype" in args and isinstance(args["compute_dtype"], str):
            args["compute_dtype"] = DTYPES[args["compute_dtype"]]
        for arg, val in list(args.items()):
            if isinstance(val, dict) and "model" in val:
                args[arg + "_model"] = build(val["model"])
                del args[arg]
        if model_type not in MODELS:
            raise ValueError(f"Unknown model type {model_type}")
        model = MODELS[model_type](keys[name], **args)
        if freeze is not None:
            if isinstance(freeze, list):
                # MERGE with factory-composed sub-model freezes --
                # overwriting would un-freeze frozen sub-models.
                model.frozen_paths = tuple(model.frozen_paths) + tuple(
                    freeze)
            else:
                model.trainable = not freeze
        if weights is not None:
            if isinstance(weights, dict):
                model.params = load_params_npz(
                    weights["path"], model.params,
                    prefix=weights.get("prefix", ""))
            else:
                model.params = load_params_npz(weights, model.params)
        if copy_weights is not None:
            src = build(copy_weights)
            model.params = _copy_matching(model.params, src.params)
        if copy_variables is not None:
            # Structural migration across architecture changes
            # (reference models.py:1166-1186 + utils.py:178-348).
            from joshupscale_tpu.utils.migrate import copy_model_variables

            src = build(copy_variables)
            model.params = copy_model_variables(model.params, src.params)
        models[name] = model
        return model

    for name in config:
        build(name)
    return models
