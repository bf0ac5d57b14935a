"""Probe: can the 1.33 ms gather-output relayout copy be eliminated?

Round-2 budget at 1080p (CLAUDE.md): warp gather 3.83 ms + a 1.33 ms
"relayout" copy of the (2.07M, 75) gather output (468 GB/s ~ bw floor)
before the 0.50 ms combine.  VERDICT round-2 asks: the copy exists
because the gather's chosen output layout mismatches the combine's
input layout -- can the table be lane-padded/reordered (or the combine
re-shaped) so they agree?

Variants, each timed as a jitted lax.scan over T iterations with
scan-differencing (the only valid methodology through the tunnel):

  A: current production form -- gather (130K, 75) table, reshape rows
     to (1, hb, wb, 16, 75), 5x5 separable combine.
  B: 2-D combine -- no 5-D reshape; weights flattened to (2.07M, 1),
     combine in (2.07M, 75) form, final reshape of the (2.07M, 3) acc.
  C: A with the table zero-padded to 128 lanes.
  D: B with the table zero-padded to 128 lanes.
  E: gather only (consume one lane) -- the irreducible gather floor.

Run ON TPU (default platform).  Prints ms per iteration per variant.
"""

import time

import numpy as np

import jax
import jax.numpy as jnp

B = 4
P2 = 16
C = 3
HB, WB = 270, 480
LANES = (B + 1) * (B + 1) * C  # 75
ROWS = HB * WB  # 129_600
IDX = ROWS * P2  # 2.07M


def corner_lane(sy, sx):
    if sy < B and sx < B:
        return (sy * B + sx) * C
    if sy < B:
        return P2 * C + sy * C
    if sx < B:
        return P2 * C + B * C + sx * C
    return P2 * C + 2 * B * C


def make_inputs(key):
    k1, k2, k3 = jax.random.split(key, 3)
    table = jax.random.normal(k1, (ROWS, LANES), jnp.bfloat16)
    # Warp-local indices (locality doesn't matter -- measured).
    base = jnp.tile(jnp.arange(ROWS, dtype=jnp.int32)[:, None],
                    (1, P2)).reshape(-1)
    jitter = jax.random.randint(k2, (IDX,), -2, 3)
    idx = jnp.clip(base + jitter, 0, ROWS - 1)
    ay = jax.random.uniform(k3, (1, HB, WB, P2, 1), jnp.bfloat16)
    ax = jax.random.uniform(k3, (1, HB, WB, P2, 1), jnp.bfloat16)
    py = jax.random.randint(k2, (1, HB, WB, P2, 1), 0, B)
    px = jax.random.randint(k3, (1, HB, WB, P2, 1), 0, B)
    return table, idx, ay, ax, py, px


def combine_5d(rows, ay, ax, py, px):
    rows = rows.reshape(1, HB, WB, P2, rows.shape[-1])
    acc = jnp.zeros((1, HB, WB, P2, C), jnp.bfloat16)
    for sy in range(B + 1):
        wy = ((1.0 - ay) * (py == sy) + ay * (py == sy - 1)).astype(
            jnp.bfloat16)
        for sx in range(B + 1):
            wx = ((1.0 - ax) * (px == sx) + ax * (px == sx - 1)).astype(
                jnp.bfloat16)
            lane = corner_lane(sy, sx)
            acc = acc + rows[..., lane:lane + C] * (wy * wx)
    return acc.reshape(1, HB, WB, P2 * C)


def combine_2d(rows, ay, ax, py, px):
    ayf = ay.reshape(-1, 1)
    axf = ax.reshape(-1, 1)
    pyf = py.reshape(-1, 1)
    pxf = px.reshape(-1, 1)
    acc = jnp.zeros((IDX, C), jnp.bfloat16)
    for sy in range(B + 1):
        wy = ((1.0 - ayf) * (pyf == sy) + ayf * (pyf == sy - 1)).astype(
            jnp.bfloat16)
        for sx in range(B + 1):
            wx = ((1.0 - axf) * (pxf == sx)
                  + axf * (pxf == sx - 1)).astype(jnp.bfloat16)
            lane = corner_lane(sy, sx)
            acc = acc + rows[..., lane:lane + C] * (wy * wx)
    return acc.reshape(1, HB, WB, P2 * C)


def build(variant, table, ay, ax, py, px):
    pad = variant in ("C", "D")
    tbl = (jnp.pad(table, ((0, 0), (0, 128 - LANES)))
           if pad else table)

    def body(carry, idx_slice):
        rows = tbl.at[idx_slice].get(mode="promise_in_bounds")
        if variant == "E":
            out = rows[:, 0].astype(jnp.float32).sum()
            return carry + out, ()
        if variant in ("A", "C"):
            acc = combine_5d(rows, ay, ax, py, px)
        else:
            acc = combine_2d(rows, ay, ax, py, px)
        return carry + acc[0, 0, 0, 0].astype(jnp.float32), ()

    import functools

    @functools.partial(jax.jit, static_argnums=(1,))
    def run(idx, T):
        idxs = jnp.broadcast_to(idx, (T,) + idx.shape)
        total, _ = jax.lax.scan(body, jnp.float32(0), idxs)
        return total

    return run


def timeit(run, idx, T, reps=3):
    np.asarray(run(idx, T))  # compile+warm
    t0 = time.perf_counter()
    for _ in range(reps):
        np.asarray(run(idx, T))
    return (time.perf_counter() - t0) / reps


def main():
    print("device:", jax.devices()[0])
    table, idx, ay, ax, py, px = make_inputs(jax.random.PRNGKey(0))
    for variant in ["E", "A", "B", "C", "D"]:
        try:
            run = build(variant, table, ay, ax, py, px)
            t8 = timeit(run, idx, 8)
            t40 = timeit(run, idx, 40)
            per = (t40 - t8) / 32.0
            print(f"variant {variant}: {per * 1e3:.3f} ms/iter")
        except Exception as exc:  # noqa: BLE001
            print(f"variant {variant}: FAILED {type(exc).__name__}: "
                  f"{str(exc)[:200]}")


if __name__ == "__main__":
    main()
