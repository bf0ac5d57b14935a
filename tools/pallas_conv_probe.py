"""GO/NO-GO probe: can a Mosaic dot at the res-block conv shape beat XLA?

The flagship's conv stack is 68 conv fusions at 142 us each (34% MXU,
C=64 -- see CLAUDE.md perf state).  A fused Pallas res-block chain can
only win if Mosaic's `jnp.dot` at the im2col shape
``(M, 576) @ (576, 64)`` runs near the 50% MXU structural ceiling for
N=64 (~97 us per conv-equivalent).  This probe measures that rate with
the A-block VMEM-resident (no HBM streaming of the patch matrix), which
is the regime an in-kernel patch build would produce.

Variants:
  xla_conv        XLA res-block conv baseline (should be ~142 us)
  dot64_resident  Pallas (TILE,576)@(576,64), A reused  -> MXU rate
  dot128_resident same at N=128 (full-lane comparison)
  dot64_stream    A streamed from HBM (the round-2 dead end regime)

Timing: jitted lax.scan, scan-differencing (CLAUDE.md measurement
rules) -- the carry perturbs B only, so A stays resident.
"""

import argparse
import functools
import sys
import time

import numpy as np

M = 129600            # 270 x 480 spatial positions
K = 576               # 3x3 x 64 in-channels


def scan_time(fn, carry0, T, reps=3):
    """Mean seconds for a jitted scan of T dependent iterations."""
    import jax

    @jax.jit
    def run(c):
        def body(c, _):
            return fn(c), None
        c, _ = jax.lax.scan(body, c, None, length=T)
        return c

    np.asarray(run(carry0))  # compile + warm
    t0 = time.perf_counter()
    for _ in range(reps):
        np.asarray(run(carry0))
    return (time.perf_counter() - t0) / reps


def per_iter_us(fn, carry0, t_short=8, t_long=40):
    a = scan_time(fn, carry0, t_short)
    b = scan_time(fn, carry0, t_long)
    return (b - a) / (t_long - t_short) * 1e6


def probe_dot(n_out, tile_m, resident=True):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    def kernel(a_ref, b_ref, o_ref):
        o_ref[:] = jnp.dot(
            a_ref[:], b_ref[:],
            preferred_element_type=jnp.float32).astype(jnp.bfloat16)

    grid = (M // tile_m,)
    a_index = (lambda i: (0, 0)) if resident else (lambda i: (i, 0))
    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_m, K), a_index),
            pl.BlockSpec((K, n_out), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((tile_m, n_out), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((M, n_out), jnp.bfloat16),
    )

    rng = np.random.default_rng(0)
    a_rows = tile_m if resident else M
    a = jnp.asarray(
        rng.standard_normal((a_rows, K)).astype(np.float32),
        jnp.bfloat16)
    if resident:
        a = jnp.tile(a, (M // tile_m, 1))
    b0 = jnp.asarray(
        rng.standard_normal((K, n_out)).astype(np.float32), jnp.bfloat16)

    def step(b):
        out = call(a, b)
        # Dependency chain through B only: A stays put.
        return b0 + out[:K].astype(jnp.bfloat16) * jnp.bfloat16(1e-6)

    return per_iter_us(step, b0)


def probe_patch_dot(tile_rows=2416, pair=False):
    """In-kernel im2col + dot at the flat-padded conv shape.

    The candidate fused res-block kernel works on a zero-padded
    (272, 482, 64) activation viewed flat as (131104, 64): a 3x3 tap
    (dy, dx) of output flat-row r is input flat-row r + (dy-1)*482 +
    (dx-1), so the 9 taps are 9 overlapping row-windows of one VMEM
    buffer and the (M, 576) patch is a lane-concat of 9 row-shifted
    views.  This probe measures that concat + dot (and, with
    ``pair=True``, the full fused conv-relu-conv-add res block) with
    the input buffer resident in VMEM -- the per-conv-equivalent cost
    that decides GO/NO-GO vs XLA's 142 us conv fusions.
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    pw = 482
    halo = 2 * pw + 2
    steps = M // tile_rows
    buf_rows = -(-(tile_rows + 2 * halo) // 8) * 8

    def kernel(x_ref, w1_ref, w2_ref, o_ref, p_ref):
        # A 9-way vector concat of 64-lane views trips a Mosaic
        # internal error (mixed half-VREG lane offsets); assembling
        # the patch through a VMEM scratch with lane-slice stores
        # lowers cleanly and the VMEM round-trip is ~us-scale.
        for t, (dy, dx) in enumerate(
                (dy, dx) for dy in range(3) for dx in range(3)):
            p_ref[:, 64 * t:64 * (t + 1)] = (
                x_ref[pl.ds(dy * pw + dx, tile_rows), :])
        y1 = jnp.dot(p_ref[:], w1_ref[:],
                     preferred_element_type=jnp.float32)
        y1 = jnp.maximum(y1, 0.0).astype(jnp.bfloat16)
        if not pair:
            o_ref[:] = y1
            return
        # Second conv consumes y1; the probe reuses y1 for all 9 taps
        # (cost-identical to the real row-shifted reads: same stores,
        # same dot shape).
        for t in range(9):
            p_ref[:, 64 * t:64 * (t + 1)] = y1
        y2 = jnp.dot(p_ref[:], w2_ref[:],
                     preferred_element_type=jnp.float32)
        o_ref[:] = (y2.astype(jnp.bfloat16)
                    + x_ref[pl.ds(halo + pw + 1, tile_rows), :])

    call = pl.pallas_call(
        kernel,
        grid=(steps,),
        in_specs=[
            pl.BlockSpec((buf_rows, 64), lambda i: (0, 0)),
            pl.BlockSpec((K, 64), lambda i: (0, 0)),
            pl.BlockSpec((K, 64), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((tile_rows, 64), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((steps * tile_rows, 64),
                                       jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((tile_rows, K), jnp.bfloat16)],
    )

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((buf_rows, 64)).astype(
        np.float32), jnp.bfloat16)
    w0 = jnp.asarray(rng.standard_normal((K, 64)).astype(
        np.float32) * 0.05, jnp.bfloat16)

    def step(w):
        out = call(x, w, w0)
        return w0 + out[:K].astype(jnp.bfloat16) * jnp.bfloat16(1e-6)

    return per_iter_us(step, w0)


def probe_xla_conv():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    x0 = jnp.asarray(
        rng.standard_normal((1, 270, 480, 64)).astype(np.float32),
        jnp.bfloat16)
    w = jnp.asarray(
        rng.standard_normal((3, 3, 64, 64)).astype(np.float32) * 0.05,
        jnp.bfloat16)

    def step(x):
        y = jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        return jnp.maximum(y, 0)

    return per_iter_us(step, x0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tile", type=int, default=1296)
    ap.add_argument("--variants", default="patch,pair")
    args = ap.parse_args()
    variants = args.variants.split(",")

    ideal_us = M * K * 64 * 2 / 197e12 * 1e6
    print(f"conv-equivalent ideal (100% MXU): {ideal_us:.1f} us; "
          f"N=64 structural ceiling (50%): {2 * ideal_us:.1f} us",
          flush=True)

    if "xla" in variants:
        r = probe_xla_conv()
        print(f"xla_conv3x3+relu      : {r:8.1f} us  "
              f"({ideal_us / r:5.1%} MXU)", flush=True)
    for n_out, resident, name in [
        (64, True, "dot64_resident "),
        (128, True, "dot128_resident"),
        (64, False, "dot64_stream   "),
    ]:
        if name.strip() not in variants:
            continue
        scale = n_out / 64
        r = probe_dot(n_out, args.tile, resident)
        print(f"pallas_{name}(tile={args.tile}): {r:8.1f} us  "
              f"({scale * ideal_us / r:5.1%} MXU)", flush=True)
    if "patch" in variants:
        r = probe_patch_dot(pair=False)
        print(f"pallas_patch9_dot64   : {r:8.1f} us  "
              f"({ideal_us / r:5.1%} MXU)", flush=True)
    if "pair" in variants:
        r = probe_patch_dot(pair=True)
        print(f"pallas_fused_pair     : {r:8.1f} us/pair  "
              f"({2 * ideal_us / r:5.1%} MXU; xla pair ~300 us)",
              flush=True)


if __name__ == "__main__":
    sys.exit(main())
