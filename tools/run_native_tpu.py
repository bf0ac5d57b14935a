#!/usr/bin/env python3
"""Full-resolution native-path benchmark on the real TPU chip.

Drives the Python-free PJRT serving path (native/src/pjrt_backend.cc
through upscale_cli) at the flagship geometry (480x270 -> 1080p) via
the axon tunnel plugin, cross-checks the output against the Python
engine on the same chip, and prints the BASELINE.md row quantifying
the native path vs the in-process Python engine (VERDICT round-3
item 5; reference TRT runner prints the same avg ms/frame,
scripts/inference/tensorrt/inference.py:245-251).

Steps:
  1. build the quality model, save a package WITH the PJRT artifacts
     (step.mlir is weight-embedded StableHLO);
  2. build native/ (cmake+ninja) if needed;
  3. write the axon client options (tools/make_axon_pjrt_options.py);
  4. run upscale_cli with JOSHUPSCALE_PJRT_PLUGIN=libaxon_pjrt.so on N
     frames, parse avg ms/frame;
  5. run the same frames through the Python Engine and report the max
     u8 diff + both timings.

Usage: python tools/run_native_tpu.py [--frames 96] [--tiny]
       (--tiny: 32x48 geometry for a quick smoke / wedged-tunnel test;
        --pipeline: serve through the async 1-deep in-flight queue --
        the sync-vs-pipeline delta on the tiny model measures how much
        per-frame fixed cost the overlap hides)
"""

import argparse
import os
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BUILD = os.path.join(REPO, "native", "build")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=96)
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--plugin", default="/opt/axon/libaxon_pjrt.so")
    ap.add_argument("--package", default=None,
                    help="existing package dir (skips model build)")
    ap.add_argument("--pipeline", action="store_true",
                    help="run upscale_cli --pipeline (async double-"
                         "buffered serving, joshupscale_process_async)")
    args = ap.parse_args()

    import numpy as np

    h, w = (32, 48) if args.tiny else (270, 480)
    filters = (8, 1, 8, 1) if args.tiny else (64, 10, 64, 24)

    work = tempfile.mkdtemp(prefix="native_tpu_")
    pkg = args.package or os.path.join(work, "pkg")
    config = {
        "flow": {"name": "flow-resnet", "num_inputs": 4,
                 "num_filters": filters[0], "num_res_blocks": filters[1]},
        "generator": {"name": "generator-resnet",
                      "num_filters": filters[2],
                      "num_res_blocks": filters[3]},
        "inference": {"name": "inference",
                      "generator": {"model": "generator"},
                      "flow": {"model": "flow"},
                      "skip_processing": False,
                      "frame_height": h, "frame_width": w,
                      "compute_dtype": "bfloat16"},
    }
    if args.package is None:
        # Export on CPU in a SUBPROCESS: the StableHLO artifact is
        # platform-neutral and a CPU export cannot wedge on the tunnel.
        code = (
            "import os; os.environ['JAX_PLATFORMS']='cpu'\n"
            "os.environ.pop('PALLAS_AXON_POOL_IPS', None)\n"
            "import jax; jax.config.update('jax_platforms','cpu')\n"
            "import sys; sys.path.insert(0, %r)\n"
            "from joshupscale_tpu.models import create_models\n"
            "from joshupscale_tpu.export.package import save_package\n"
            "config = %r\n"
            "built = create_models(config, seed=0)['inference']\n"
            "save_package(%r, config, built, export_stablehlo=True)\n"
            "print('package written')\n" % (REPO, config, pkg)
        )
        env = dict(os.environ)
        env.pop("PALLAS_AXON_POOL_IPS", None)
        r = subprocess.run([sys.executable, "-c", code], env=env,
                           timeout=1800)
        if r.returncode != 0:
            return 1

    if not os.path.exists(os.path.join(BUILD, "upscale_cli")):
        subprocess.run(["cmake", "-S", os.path.join(REPO, "native"),
                        "-B", BUILD, "-G", "Ninja"], check=True)
        subprocess.run(["cmake", "--build", BUILD], check=True)

    from tools.make_axon_pjrt_options import write_options

    opts_path = os.path.join(work, "axon_opts.txt")
    extra_env = write_options(opts_path)

    rng = np.random.default_rng(0)
    n = args.frames
    frames = rng.integers(0, 256, (n, h, w, 3), np.uint8)
    in_raw = os.path.join(work, "in.raw")
    out_raw = os.path.join(work, "out.raw")
    frames.tofile(in_raw)

    env = dict(os.environ, **extra_env)
    env["JOSHUPSCALE_PJRT_PLUGIN"] = args.plugin
    env["JOSHUPSCALE_PJRT_OPTIONS"] = opts_path
    print(f"running upscale_cli ({n} frames {w}x{h} -> {4*w}x{4*h}) "
          f"via {args.plugin} ...", flush=True)
    cli_args = [os.path.join(BUILD, "upscale_cli")]
    if args.pipeline:
        cli_args.append("--pipeline")
    r = subprocess.run(
        [*cli_args, pkg, in_raw, out_raw],
        env=env, capture_output=True, text=True, timeout=3600)
    sys.stderr.write(r.stderr[-2000:])
    if r.returncode != 0:
        print("native run FAILED")
        return 1
    # "processed N frames, avg X ms/frame" -- anchored parse: a loose
    # rsplit("avg") would crash (or grab a plugin log line) after an
    # hours-long real-chip run.
    import re

    m = re.search(r"avg ([0-9.]+) ms/frame", r.stderr)
    if m is None:
        print("native run produced no latency summary; stderr tail "
              "above")
        return 1
    avg_ms = float(m.group(1))
    print(f"native PJRT path: {avg_ms:.2f} ms/frame "
          f"(includes per-frame host<->device transfer + tunnel RTT)")

    out = np.fromfile(out_raw, np.uint8).reshape(n, 4 * h, 4 * w, 3)

    # Python engine on the same chip (default platform = axon TPU).
    import jax  # noqa: F401  (axon platform via sitecustomize)

    from joshupscale_tpu.runtime.engine import create_runtime

    eng = create_runtime(pkg)
    max_diff = 0
    check = min(n, 8)
    for t in range(check):
        ref = eng.process(frames[t])
        max_diff = max(max_diff, int(np.abs(
            ref.astype(int) - out[t].astype(int)).max()))
    # Timing comparison via scan-differencing -- per-dispatch host
    # timing through the tunnel is dominated by the fixed RTT and
    # block_until_ready does not synchronize (CLAUDE.md measurement
    # rule); Engine.benchmark runs the same jitted-lax.scan scheme as
    # bench.py, so this figure is on-chip time, directly comparable to
    # the native number minus its host-copy overhead.
    eng.reset()
    py = eng.benchmark(num_frames=min(n, 96))
    py_ms = py["frame_ms"]
    print(f"python engine (same package, scan-diff on-chip): "
          f"{py_ms:.2f} ms/frame")
    print(f"max u8 diff native-vs-python over {check} frames: {max_diff}")
    print()
    print("BASELINE.md row:")
    print(f"| native PJRT path (upscale_cli, {w}x{h}) | "
          f"{avg_ms:.1f} ms/frame end-to-end vs {py_ms:.1f} ms on-chip "
          f"(Python engine, scan-diff) | max u8 diff vs Python engine: "
          f"{max_diff} |")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
