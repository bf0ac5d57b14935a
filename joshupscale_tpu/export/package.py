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

``export_stablehlo=True`` additionally writes the *Python-free* serving
artifact set consumed by the native PJRT runtime
(``native/src/pjrt_backend.cc`` -- the analog of the reference's
self-contained C++ TensorRT deserialization,
``core/src/tensorrt_backend.cc:117-278``):

    step.stablehlo      -- jax.export artifact (Python re-load door)
    step.mlir           -- raw weight-embedded StableHLO module bytecode
                           (what PJRT_Client_Compile consumes)
    step_spec.txt       -- flat I/O signature: dtype/shape per argument,
                           state<->output donation alias map
    state_init.bin      -- concatenated initial state bytes (zero state,
                           or the 127-fill u8 state for u8_state models)
    compile_options.pb  -- serialized xla.CompileOptionsProto
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
        # donate_argnums=(1,): the recurrent state ping-pongs in device
        # memory -- the exported module carries tf.aliasing_output
        # attributes that XLA turns into input/output buffer aliases,
        # so the native PJRT frame loop never copies state.
        exported = jax_export.export(
            jax.jit(step, donate_argnums=(1,)))(frame, state)
        with open(os.path.join(path, "step.stablehlo"), "wb") as f:
            f.write(exported.serialize())
        _write_native_serving_artifacts(path, exported, state, model)


def _write_native_serving_artifacts(path, exported, state, model) -> None:
    """Write the Python-free PJRT serving artifact set (see module
    docstring).  ``exported`` is the jax.export result of the donated
    single-frame step."""
    import jax
    import numpy as np

    with open(os.path.join(path, "step.mlir"), "wb") as f:
        f.write(exported.mlir_module_serialized)

    # Compile options: the standard serialized xla.CompileOptionsProto
    # jax itself hands to PJRT_Client_Compile (1 replica, 1 partition).
    from jax._src.lib import xla_client

    with open(os.path.join(path, "compile_options.pb"), "wb") as f:
        f.write(xla_client.CompileOptions().SerializeAsString())

    # Flat I/O signature.  Inputs flatten as (frame, *state_leaves) and
    # outputs as (display, *new_state_leaves) with identical state
    # treedefs, so output 1+k donation-aliases argument 1+k.
    state_leaves = jax.tree_util.tree_leaves(state)
    n_state = len(state_leaves)
    assert len(exported.in_avals) == 1 + n_state
    assert len(exported.out_avals) == 1 + n_state
    for k, leaf in enumerate(state_leaves):
        a_in = exported.in_avals[1 + k]
        a_out = exported.out_avals[1 + k]
        assert a_in.shape == a_out.shape and a_in.dtype == a_out.dtype, (
            f"state leaf {k} not self-aliasing: {a_in} vs {a_out}"
        )

    def _dt(dtype) -> str:
        name = np.dtype(dtype).name  # ml_dtypes names bfloat16 directly
        return {
            "uint8": "u8", "float32": "f32", "bfloat16": "bf16",
            "float16": "f16", "int32": "i32", "float64": "f64",
        }[name]

    lines = ["joshupscale-step-spec 1",
             f"frame_height {model.frame_height}",
             f"frame_width {model.frame_width}",
             "scale 4"]
    for aval in exported.in_avals:
        dims = ",".join(str(d) for d in aval.shape)
        lines.append(f"input {_dt(aval.dtype)} {dims}")
    for aval in exported.out_avals:
        dims = ",".join(str(d) for d in aval.shape)
        lines.append(f"output {_dt(aval.dtype)} {dims}")
    for k in range(n_state):
        lines.append(f"alias {1 + k} {1 + k}")
    with open(os.path.join(path, "step_spec.txt"), "w") as f:
        f.write("\n".join(lines) + "\n")

    # Initial state bytes, concatenated in flat-leaf order (zeros for
    # float state; 127-fill for u8_state models -- the C++ runtime must
    # not hardcode either).
    with open(os.path.join(path, "state_init.bin"), "wb") as f:
        for leaf in state_leaves:
            f.write(np.ascontiguousarray(np.asarray(leaf)).tobytes())


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
