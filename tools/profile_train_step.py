"""Per-op TPU profile of a full-architecture training step.

Same methodology as tools/profile_step.py (serving): jit the train
step with steps_per_execution=K (a lax.scan over K optimizer steps),
run it once under jax.profiler.start_trace, and sum per-op device
times from the .trace.json.gz, divided by K.

Used to find the next training-perf lever after mixed precision
(BASELINE.md row) and the s2d training warp (trainer
``s2d_train_warp``) — the reference's training loop has no per-op
story at all (keras Model.fit), so this is rebuild-side tooling.

Usage: python tools/profile_train_step.py [--trainer gan]
       [--dtype bfloat16] [--warp s2d] [--crop 32] [--batch 4]
       [--k 10] [--top 40]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from tools.train_step_bench import _build  # noqa: E402


def parse_trace_self(trace_dir):
    """Per-op SELF device time (dur minus nested children) from the trace.

    Training steps wrap everything in while loops (the K-step scan, the
    19-frame generator scan), so the naive sum of ph=="X" durations
    (tools/profile_step.parse_trace) counts the loop wrappers AND their
    bodies.  Here events are nested per (pid, tid) by interval
    containment and each event is charged only its self time; ops are
    aggregated by name with the event's run_id-ish suffix kept (XLA op
    names are stable within one compilation).
    """
    import collections
    import glob
    import gzip
    import json
    import re

    files = glob.glob(
        os.path.join(trace_dir, "**", "*.trace.json.gz"), recursive=True)
    if not files:
        raise SystemExit(f"no trace files under {trace_dir}")
    with gzip.open(sorted(files)[-1], "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    n_x = sum(1 for e in events if e.get("ph") == "X")
    if n_x >= 1_000_000:
        print(f"WARNING: trace hit the ~1M-event cap ({n_x} X events) -- "
              "later loop iterations are unrecorded and leaf op times "
              "are UNDERCOUNTED.  Re-run with a smaller --k.")
    tpu_pids = set()
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            name = e.get("args", {}).get("name", "")
            if ("TPU" in name and "XLA" not in name.upper()
                    or re.search(r"/device:TPU", name)):
                tpu_pids.add(e["pid"])
    by_track = collections.defaultdict(list)
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in tpu_pids:
            continue
        # The whole-program wrappers ("0", "jit_step(...)") sit on their
        # own tracks, so self-time subtraction can't see their children;
        # drop them instead of double counting the program.
        name = e.get("name", "")
        if name == "0" or name.startswith("jit_"):
            continue
        by_track[(e["pid"], e.get("tid"))].append(e)
    per_op = collections.Counter()
    per_cat = collections.Counter()
    per_src = collections.Counter()
    total = 0.0
    for track in by_track.values():
        # Sort by start asc, then duration desc so parents precede
        # children that start at the same timestamp.
        track.sort(key=lambda e: (e["ts"], -e.get("dur", 0)))
        stack = []  # (end_ts, child_dur_accum index into selfs)
        selfs = []
        for e in track:
            ts, dur = e["ts"], e.get("dur", 0)
            while stack and ts >= stack[-1][0] - 1e-9:
                stack.pop()
            if stack:
                selfs[stack[-1][1]][1] -= dur
            selfs.append([e, dur])
            stack.append((ts + dur, len(selfs) - 1))
        for e, self_dur in selfs:
            if self_dur <= 0:
                continue
            args = e.get("args", {})
            per_op[e.get("name", "?")] += self_dur
            per_cat[args.get("hlo_category", "?")] += self_dur
            per_src[(args.get("hlo_category", "?"),
                     args.get("source", "?"))] += self_dur
            total += self_dur
    return per_op, per_cat, per_src, total


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trainer", default="gan",
                    choices=["frvsr", "gan"])
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--warp", default="s2d", choices=["pixel", "s2d"])
    ap.add_argument("--crop", type=int, default=32)
    ap.add_argument("--batch", type=int, default=4)
    # k=3 keeps the trace under the profiler's ~1M-event cap at the
    # full GAN step (~350K op events per optimizer step).
    ap.add_argument("--k", type=int, default=3)
    ap.add_argument("--top", type=int, default=40)
    args = ap.parse_args()

    import tempfile

    import jax
    import jax.numpy as jnp

    from joshupscale_tpu.runtime.engine import enable_compilation_cache
    from joshupscale_tpu.training import (
        TrainState,
        build_frvsr_step,
        build_gan_step,
        init_gan_state,
        make_optimizer,
    )

    enable_compilation_cache()
    built, opt_a, opt_b = _build(args.trainer, args.dtype, args.crop,
                                 args.batch, args.warp == "s2d")
    trainer = built.obj
    t_frames = 10
    rng = np.random.default_rng(0)
    batches = {
        "input": jnp.asarray(rng.random(
            (args.k, args.batch, t_frames, args.crop, args.crop, 3),
            np.float32) - 0.5),
        "target": jnp.asarray(rng.random(
            (args.k, args.batch, t_frames, args.crop * 4,
             args.crop * 4, 3), np.float32) - 0.5),
    }
    key = jax.random.PRNGKey(0)

    if args.trainer == "frvsr":
        step = build_frvsr_step(trainer, opt_a,
                                steps_per_execution=args.k)
        state = TrainState(built.params, opt_a.init(built.params),
                           jnp.zeros((), jnp.int32))
        metric = "loss"
    else:
        step = build_gan_step(trainer, opt_a, opt_b,
                              built.params["vgg"],
                              steps_per_execution=args.k)
        state = init_gan_state(trainer, built.params["gen"],
                               built.params["discr"], opt_a, opt_b)
        metric = "gen_loss"

    print("compiling + warming...", flush=True)
    state, metrics = step(state, batches, key)
    assert np.isfinite(float(metrics[metric]))

    trace_dir = tempfile.mkdtemp(prefix="jub_train_trace_")
    jax.profiler.start_trace(trace_dir)
    state, metrics = step(state, batches, key)
    float(metrics[metric])  # sync
    jax.profiler.stop_trace()

    per_op, per_cat, per_src, total = parse_trace_self(trace_dir)
    print(f"\ntrace dir: {trace_dir}")
    print(f"{args.trainer} {args.dtype} warp={args.warp} "
          f"batch={args.batch} crop={args.crop}")
    print(f"total device self time: {total/1e3:.2f} ms "
          f"({total/args.k/1e3:.3f} ms/step over {args.k} steps)")
    print(f"\n-- by hlo_category --\n{'ms/step':>9}  {'%':>5}  category")
    for c, dur in per_cat.most_common():
        print(f"{dur/args.k/1e3:>9.2f}  {100*dur/total:>5.1f}  {c}")
    print(f"\n-- by (category, source) --\n{'ms/step':>9}  "
          f"{'%':>5}  where")
    for (c, s), dur in per_src.most_common(args.top):
        print(f"{dur/args.k/1e3:>9.2f}  {100*dur/total:>5.1f}  "
              f"{c:<22} {s}")
    print(f"\n-- by op --\n{'us/step':>10}  {'%':>5}  op")
    for name, dur in per_op.most_common(args.top):
        print(f"{dur/args.k:>10.1f}  {100*dur/total:>5.1f}  "
              f"{name[:110]}")


if __name__ == "__main__":
    sys.exit(main())
