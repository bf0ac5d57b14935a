"""Play prediction + GIF summaries.

Parity with reference ``keras_models.py`` JoshUpscaleModel.predict_step
(:32-92) and ``keras_callbacks.py`` PlayCallback (:12-74): run the
inference model over a 10-frame clip forward then 8 frames reversed
(ping-pong playback), build side-by-side comparison strips
(nearest-upscaled input | generated | target), and encode epoch GIFs.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from joshupscale_tpu.models.common import Mutables
from joshupscale_tpu.ops import upscale_nearest


def predict_sequence(
    model,
    params: Dict[str, Any],
    inputs: jnp.ndarray,
    targets: Optional[jnp.ndarray] = None,
) -> Dict[str, jnp.ndarray]:
    """Ping-pong playback: frames 0..9 then 8..1 (18 outputs).

    inputs: (N, 10, H, W, 3) floats in [-0.5, 0.5] (skip_processing
    semantics).  Returns gen_outputs (N, 18, 4H, 4W, 3) comparison strips
    and pre_warp strips when targets given (reference predict_step).
    """
    n, _, h, w, _ = inputs.shape
    # init_state handles both the pixel and s2d state layouts.
    state = jax.tree_util.tree_map(
        lambda x: x.astype(inputs.dtype), model.init_state(n)
    )
    order = list(range(10)) + list(range(8, 0, -1))
    gen_outputs = []
    pre_warps = []
    mut = Mutables(False)
    for i in order:
        outputs, state = model.apply(params, inputs[:, i], state, mut=mut)
        gen_outputs.append(outputs["output_denorm"])
        if i > 0:
            pre_warps.append(outputs["pre_warp"])
    gen = jnp.stack(gen_outputs, axis=1)  # (N, 18, 4H, 4W, 3)

    result = {"gen_outputs": gen}
    if targets is not None:
        ups = upscale_nearest(
            inputs.reshape(-1, h, w, 3).astype(jnp.float32), 4
        ).reshape(n, 10, h * 4, w * 4, 3)
        result["upscaled"] = ups
        result["pre_warp_frames"] = jnp.stack(pre_warps[1:], axis=1)
    return result


def build_strips(result, targets) -> Dict[str, np.ndarray]:
    """Assemble the side-by-side GIF strips (input | generated | target)
    ON THE HOST.  These width-axis concatenations of 18-frame HR stacks
    are display-only; keeping them out of the jitted graph avoids the
    XLA:TPU fusion-emitter concat/pad-fold hazard (a pad_low CHECK crash
    at full size -- same emitter-bug class as the round-2 ping-pong
    concat crash) and wastes no device time on GIF pixels."""
    gen = np.asarray(result["gen_outputs"])
    ups = np.asarray(result["upscaled"])
    tgt = np.asarray(targets)
    ups_pp = np.concatenate([ups, ups[:, 8:0:-1]], axis=1)
    tgt_pp = np.concatenate([tgt, tgt[:, 8:0:-1]], axis=1)
    warps = np.asarray(result["pre_warp_frames"])
    return {
        "gen_outputs": gen,
        "comparison": np.concatenate([ups_pp, gen, tgt_pp], axis=3),
        "pre_warp": np.concatenate(
            [ups_pp[:, 2:], warps, tgt_pp[:, 2:]], axis=3),
    }


def to_uint8(frames: np.ndarray) -> np.ndarray:
    """[-0.5, 0.5] float frames -> uint8 (clipped)."""
    x = np.clip(np.asarray(frames, np.float32) + 0.5, 0.0, 1.0)
    return (x * 255.0 + 0.5).astype(np.uint8)


def save_gif(path: str, frames: np.ndarray, fps: int = 10) -> None:
    """Encode (T, H, W, 3) BGR uint8 frames as an animated GIF."""
    from PIL import Image

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    imgs = [Image.fromarray(f[:, :, ::-1]) for f in frames]  # BGR -> RGB
    imgs[0].save(
        path,
        save_all=True,
        append_images=imgs[1:],
        duration=int(1000 / fps),
        loop=0,
    )


class PlayCallback:
    """Epoch callback: predict the play batch, write comparison GIFs."""

    def __init__(self, model, play_batch: Dict[str, np.ndarray],
                 out_dir: str, interval: int = 1, tb_logger=None):
        import dataclasses

        from joshupscale_tpu.training.frvsr import preprocess_batch

        # u8 play batches (device-normalize pipelines) -> floats once.
        self.inputs = preprocess_batch(jnp.asarray(play_batch["input"]))
        self.targets = preprocess_batch(
            jnp.asarray(play_batch["target"]))
        # The play clip is a TRAINING crop; the serving config's frame
        # dims (e.g. 480x270) are unrelated, and init_state sizes the
        # recurrent state from the model's dims -- so re-dimension the
        # model to the clip (pad geometry follows automatically).
        h, w = self.inputs.shape[2], self.inputs.shape[3]
        if (model.frame_height, model.frame_width) != (h, w):
            model = dataclasses.replace(
                model, frame_height=h, frame_width=w)
        self.model = model
        self.out_dir = out_dir
        self.interval = max(int(interval), 1)
        self.tb_logger = tb_logger
        self._predict = jax.jit(
            lambda p, x, t: predict_sequence(model, p, x, t)
        )

    def __call__(self, epoch: int, state, entry: Dict[str, Any]) -> None:
        if epoch % self.interval:
            return
        params = getattr(state, "params", None)
        if params is None:  # GAN state: rebuild the inference param tree
            params = {
                "flow": state.gen_params["flow"],
                "generator": state.gen_params["generator"],
            }
        result = build_strips(
            self._predict(params, self.inputs, self.targets),
            self.targets)
        comp = to_uint8(result["comparison"])
        for i in range(min(comp.shape[0], 4)):
            save_gif(
                os.path.join(self.out_dir, f"play_e{epoch:04d}_{i}.gif"),
                comp[i],
            )
        if self.tb_logger is not None:
            # First frame of each sequence, BGR -> RGB.
            self.tb_logger.images(
                "play/comparison", comp[:4, 0, :, :, ::-1], epoch
            )
