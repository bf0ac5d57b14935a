"""TPU serving spot check: full frames off the chip on the flagship model.

Run on the real TPU (default env).  Complements the CPU oracle tests:
after the round-2 discovery that promise-mode gathers can leave the
output-buffer TAIL unwritten in large fused graphs (ops/warp.py), this
drives the real serving path end to end and checks full 1080p frames --
shapes/dtype, sane stats INCLUDING the last rows, and streamed-vs-clip
exactness.  ~2 min incl. compile (cached after)."""
import numpy as np, jax, dataclasses
import sys; sys.path.insert(0, "/root/repo"); sys.argv = ["x"]
from tools.profile_step import build_step
from joshupscale_tpu.runtime.engine import Engine

clip, params, state, model = build_step()
eng = Engine(model, params)
rng = np.random.default_rng(7)
frames = rng.integers(0, 256, (4, 270, 480, 3)).astype(np.uint8)
outs = [eng.process(f) for f in frames]
for t, o in enumerate(outs):
    assert o.shape == (1080, 1920, 3) and o.dtype == np.uint8
    # the training bug hit the buffer tail: check last rows explicitly
    print(f"frame {t}: mean {o.mean():.2f} last-row mean {o[-1].mean():.2f} "
          f"corner {o[-1, -1]}", flush=True)
eng.reset()
clip_out = eng.process_clip(frames)
diff = np.abs(clip_out.astype(int) - np.stack(outs).astype(int)).max()
print("stream==clip max diff:", diff, flush=True)
assert diff <= 1
print("SERVING TPU CHECK OK", flush=True)
