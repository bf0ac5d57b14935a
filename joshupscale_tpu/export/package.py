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
) -> None:
    """Write a deployable package for a built inference model."""
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "model.yaml"), "w") as f:
        yaml.safe_dump(
            {"models": model_config, "inference": inference_name}, f
        )
    save_params_npz(os.path.join(path, "params.npz"), built.params)


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
