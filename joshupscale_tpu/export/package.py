"""Model packaging: the deployable artifact (the ``.trt``-file analog).

A package is a directory:

    model.yaml    -- model architecture + geometry config
    params.npz    -- flat dotted-path parameter archive

``load_package`` rebuilds the InferenceModel + params; the runtime engine
then jit-compiles it (XLA compilation cache makes reloads fast; see
``joshupscale_tpu.runtime.engine``).  Parity with the reference's engine
builder + loader pipeline (reference
``scripts/inference/tensorrt/build_engine.py`` -> ``tensorrt_backend.cc``)
without the byte-level reindex hacks: output identity is preserved by
construction.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Tuple

import yaml

from joshupscale_tpu.models.inference import InferenceModel
from joshupscale_tpu.models.registry import BuiltModel, create_models
from joshupscale_tpu.export.importer import (
    load_params_npz,
    save_params_npz,
)


def save_package(
    path: str,
    model_config: Dict[str, Any],
    built: BuiltModel,
    inference_name: str = "inference",
    export_stablehlo: bool = False,
    batch_size: int = 1,
) -> None:
    """Write a deployable package for a built inference model.

    ``export_stablehlo=True`` additionally serializes the jitted
    single-frame step as a portable StableHLO artifact
    (``step.stablehlo``) -- the true analog of the reference's prebuilt
    .trt engine: a frozen, weight-embedded program that runs without the
    Python model code (see :func:`load_stablehlo_step`).
    """
    import jax
    import jax.numpy as jnp

    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "model.yaml"), "w") as f:
        yaml.safe_dump(
            {"models": model_config, "inference": inference_name}, f
        )
    save_params_npz(os.path.join(path, "params.npz"), built.params)

    if export_stablehlo:
        from jax import export as jax_export

        model = built.obj
        params = built.params

        def step(frame, state):
            outputs, new_state = model.apply(params, frame, state)
            out = outputs.get("output", outputs["output_denorm"])
            return out, new_state

        frame_dtype = (jnp.float32 if model.skip_processing
                       else jnp.uint8)
        frame = jnp.zeros(
            (batch_size, model.frame_height, model.frame_width, 3),
            frame_dtype,
        )
        state = model.init_state(batch_size)
        exported = jax_export.export(jax.jit(step))(frame, state)
        with open(os.path.join(path, "step.stablehlo"), "wb") as f:
            f.write(exported.serialize())


def load_stablehlo_step(path: str):
    """Load a frozen StableHLO step: callable(frame, state) ->
    (output, new_state).  Weights are baked into the artifact; no model
    code or params are needed (deploy-only runtime)."""
    from jax import export as jax_export

    with open(os.path.join(path, "step.stablehlo"), "rb") as f:
        exported = jax_export.deserialize(f.read())
    return exported.call


def load_package(path: str) -> Tuple[InferenceModel, Dict[str, Any]]:
    """Load a package: returns (InferenceModel, params)."""
    with open(os.path.join(path, "model.yaml")) as f:
        meta = yaml.safe_load(f)
    models = create_models(meta["models"], seed=0)
    built = models[meta.get("inference", "inference")]
    params = load_params_npz(
        os.path.join(path, "params.npz"), built.params
    )
    return built.obj, params
