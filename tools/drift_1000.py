#!/usr/bin/env python3
"""1000-frame recurrence drift measurement (BASELINE config 3).

Streams a 1000-frame structured 480x270 clip (smooth pan over the
reference's sample frame -- real edges/texture, so recurrent error has
something to compound on) through the flagship quality engine and
measures, over the FULL horizon:

1. stream-vs-clip exactness: frame-by-frame ``process()`` must equal
   the chunked ``process_clip`` scan bit-for-bit at checkpoints
   (states are identical programs; this guards dispatch-path drift);
2. u8-state-tier divergence: the ``u8_state: true`` engine (recurrent
   state quantized to u8 every frame, the int8-TRT-engine analog) vs
   the float-state engine -- per-frame mean/p99/max u8 output steps,
   reported at checkpoints and overall.  The recurrence COMPOUNDS
   quantization, so a bounded curve here is the evidence a few-frame
   test cannot give.

Run ON TPU.  Writes a JSON summary to stdout (one line at the end).
"""

import json
import sys
import time

import numpy as np

H, W = 270, 480
T = 1000
CHUNK = 50
CHECKPOINTS = (10, 100, 250, 500, 750, 999)


def make_clip():
    import cv2

    src = cv2.imread("/root/reference/docs/img_output.png",
                     cv2.IMREAD_COLOR)
    assert src is not None
    rng = np.random.default_rng(0)
    frames = np.empty((T, H, W, 3), np.uint8)
    cx, cy = 600.0, 400.0
    vx, vy = 1.3, 0.7
    for t in range(T):
        # Bounce the pan inside the source so 1000 frames stay varied.
        cx += vx
        cy += vy
        if not 0 <= cx <= src.shape[1] - W * 2:
            vx = -vx
            cx += 2 * vx
        if not 0 <= cy <= src.shape[0] - H * 2:
            vy = -vy
            cy += 2 * vy
        m = np.array([[2.0, 0, cx], [0, 2.0, cy]], np.float32)
        frames[t] = cv2.warpAffine(
            src, m, (W, H),
            flags=cv2.INTER_LINEAR | cv2.WARP_INVERSE_MAP,
            borderMode=cv2.BORDER_REFLECT)
        if t % 97 == 0:
            frames[t] = np.clip(
                frames[t].astype(np.int16)
                + rng.integers(-8, 8, (H, W, 3)), 0, 255).astype(np.uint8)
    return frames


def build_engine(u8_state: bool):
    from joshupscale_tpu.models import create_models
    from joshupscale_tpu.runtime.engine import Engine

    config = {
        "flow": {"name": "flow-resnet", "num_inputs": 4,
                 "num_filters": 64, "num_res_blocks": 10},
        "generator": {"name": "generator-resnet", "num_filters": 64,
                      "num_res_blocks": 24},
        "inference": {
            "name": "inference",
            "generator": {"model": "generator"},
            "flow": {"model": "flow"},
            "skip_processing": False,
            "frame_height": H, "frame_width": W,
            "compute_dtype": "bfloat16",
            "u8_state": u8_state,
        },
    }
    models = create_models(config, seed=0)
    built = models["inference"]
    return Engine(built.obj, built.params)


def main() -> int:
    from joshupscale_tpu.runtime.engine import enable_compilation_cache

    enable_compilation_cache()
    clip = make_clip()
    print(f"clip: {clip.shape}", flush=True)

    eng_f = build_engine(u8_state=False)
    eng_u8 = build_engine(u8_state=True)

    # --- pass 1: chunked clip scans on both engines, diff per frame --
    t0 = time.time()
    stats = []
    hist = np.zeros(256, np.int64)  # pooled per-pixel |diff| histogram
    clip5 = clip[:, None]
    for start in range(0, T, CHUNK):
        part = clip5[start:start + CHUNK]
        out_f = eng_f.process_clip(part)
        out_u8 = eng_u8.process_clip(part)
        d = np.abs(out_f.astype(np.int16) - out_u8.astype(np.int16))
        hist += np.bincount(d.ravel(), minlength=256)
        for i in range(d.shape[0]):
            df = d[i]
            stats.append((float(df.mean()), float(np.percentile(df, 99)),
                          int(df.max())))
        if start % 200 == 0:
            last = start + d.shape[0] - 1
            print(f"  frame {last}: u8-vs-float mean "
                  f"{stats[-1][0]:.3f} max {stats[-1][2]}", flush=True)
    stats = np.asarray(stats)
    print(f"clip passes done in {time.time() - t0:.0f}s", flush=True)

    # --- pass 2: stream-vs-clip exactness at checkpoints -------------
    eng_f2 = build_engine(u8_state=False)
    mismatch = {}
    eng_f.reset()
    outs_ref = {}
    for start in range(0, T, CHUNK):
        out = eng_f.process_clip(clip5[start:start + CHUNK])
        for c in CHECKPOINTS:
            if start <= c < start + CHUNK:
                outs_ref[c] = out[c - start, 0].copy()
    for t in range(T):
        out = eng_f2.process(clip[t])
        if t in CHECKPOINTS:
            diff = int(np.abs(out.astype(np.int16)
                              - outs_ref[t].astype(np.int16)).max())
            mismatch[t] = diff
            print(f"  stream-vs-clip @{t}: max {diff}", flush=True)

    summary = {
        "frames": T,
        "u8_state_vs_float": {
            "mean_u8_steps_overall": float(stats[:, 0].mean()),
            # True pooled per-pixel p99 (from the histogram); the
            # per-frame form is kept for comparability with the
            # round-3 BASELINE row, which recorded p99-of-frame-p99s
            # (biased high vs the pooled value).
            "p99_u8_steps_overall": int(np.searchsorted(
                np.cumsum(hist), 0.99 * hist.sum())),
            "p99_of_frame_p99s": float(np.percentile(stats[:, 1], 99)),
            "max_u8_steps_overall": int(stats[:, 2].max()),
            "mean_by_checkpoint": {
                str(c): float(stats[c, 0]) for c in CHECKPOINTS},
            "max_by_checkpoint": {
                str(c): int(stats[c, 2]) for c in CHECKPOINTS},
        },
        "stream_vs_clip_max_u8": mismatch,
    }
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    sys.exit(main())
