"""Pallas TPU res-block chain (MEASURED DEAD END -- kept as the record).

The hypothesis: the flagship spends ~10 ms/frame in 68 XLA conv
fusions at 142 us (34% MXU at C=64) + 43 unfused 12-us relus, and a
Mosaic kernel building the im2col patch in VMEM and feeding one
(M, 576) @ (576, 64) dot should run a conv in ~110 us (the resident
probe's number, tools/pallas_conv_probe.py).  The chain below is a
complete, correct implementation (bit-exact vs the XLA loop in
interpret mode, ~2% bf16 drift over 24 random blocks on TPU) -- and it
measured SLOWER in practice: 264-310 us/conv.  See the note on
``ENABLED`` for the full post-mortem; the short version is that every
patch store moves (rows, 64) slices at half VREG width and that VPU
tax, not the dot or the DMA, dominates.  XLA's conv emitter avoids it
by keeping W in lanes (dx taps become lane shifts), which is exactly
why it re-lays-out conv-chain inputs -- the two facts are one fact.

Layout strategy (what the design got right, reusable): the chain works
on a zero-padded activation in FLAT form ``(N*(H+2)*(W+2), 64)`` kept
in HBM between kernels.  In that form a 3x3 tap (dy, dx) of output row
r is input row ``r + (dy-1)*(W+2) + (dx-1)``, so the patch is 9
row-shifted windows of one contiguous VMEM buffer -- no im2col
materialization in HBM (streaming patches costs 322 us/conv) and no
XLA layout copies between blocks.  The top halo rides a PERSISTENT
ring scratch across sequential grid steps instead of a third streamed
neighbour block.

Padding semantics: the conv's SAME zero-padding is represented by the
explicit pad ring (1 row/col per side).  Every kernel re-zeroes the pad
positions of its OUTPUT (column mask input + first/last-step row
zeroing), so the ring stays zero through the chain and the flat-window
trick reads true zeros at the borders.

Numerics match the XLA path op-for-op: f32 dot accumulation cast to
bf16 (XLA conv emits bf16), then BN scale/offset and activation in
bf16 (nn.layers.batch_norm inference folds to bf16 scale/offset).

Reference parity: this executes the same res blocks as reference
``scripts/training/models.py`` res_block (:193-246); it is an
inference-only fast path -- training uses the XLA convs (autodiff).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from joshupscale_tpu.nn.layers import BN_EPS

# DISABLED by default: measured SLOWER than XLA's conv fusions in the
# full model (264-310 us/conv vs XLA's 142+12).  The cost is a fixed
# ~2.15 us per 1000 flat rows regardless of block size or DMA strategy
# (ring-scratch halo vs streamed neighbours, RB 1928 vs 3856 -- all
# measured within noise), i.e. it is the in-kernel VPU work: every
# patch store/load moves (rows, 64) slices at HALF VREG width (64 of
# 128 lanes), and ~14 such passes/conv cost ~200 us.  The resident
# probe's 110 us/conv (tools/pallas_conv_probe.py) has ~10 passes and
# matches the same rate law.  XLA's EmitAllBatchInSublanes avoids the
# tax by keeping W in lanes so dx taps are lane shifts; replicating
# that in Mosaic would need a non-GEMM conv emitter.  Zero-copy
# alternatives all fail: 9 accumulating K=64 dots = 25% MXU (194 us),
# strided (RB, 192) reshape views are not free under Mosaic's (16,128)
# VREG tiling, and lane-packed 2-row forms misalign half the taps.
# Kept (with tests) as the measured record; see CLAUDE.md dead-ends.
ENABLED = False

# Per-kernel VMEM budget (bytes); v5e has 16 MB and the accounting
# below must cover the patch scratch, the working window, and the
# DOUBLE-BUFFERED streamed operand/output blocks Mosaic allocates.
_VMEM_BUDGET = 8 * 1024 * 1024


def _act(x, mode: str, alpha: float):
    if mode == "relu":
        return jnp.maximum(x, 0)
    if mode == "lrelu":
        return jnp.where(x >= 0, x, x * jnp.asarray(alpha, x.dtype))
    return x


def _conv_kernel(RB, XB, HX, PW, sps, act_mode, alpha, residual,
                 x_cur_ref, x_dn_ref, *refs):
    """One conv3x3 (+BN scale/offset, +optional residual, +activation).

    Works on flat-padded rows; output block is rows [i*RB, (i+1)*RB).
    The top halo comes from a PERSISTENT ring scratch carrying the
    previous block's tail across (sequential) grid steps -- streaming
    a third neighbour block instead costs ~17 MB/conv of extra HBM
    reads and, worse, enough VMEM that Mosaic stops double-buffering
    the DMAs (measured: 270 us/conv vs 110 in the resident probe).
    """
    from jax.experimental import pallas as pl

    if residual:
        res_ref, colmask_ref, w_ref, s_ref, t_ref, o_ref = refs[:6]
        ring, xbuf, patch = refs[6:]
    else:
        colmask_ref, w_ref, s_ref, t_ref, o_ref = refs[:5]
        ring, xbuf, patch = refs[5:]
    i = pl.program_id(0)

    # Assemble the contiguous working window [o0 - HX, o0 + RB + HX).
    @pl.when(i == 0)
    def _zero_top():
        # Rows [-HX, 0) don't exist; they feed only masked outputs,
        # zeros keep the arithmetic finite and deterministic.
        ring[...] = jnp.zeros_like(ring)

    xbuf[0:HX, :] = ring[...]
    xbuf[HX:HX + RB, :] = x_cur_ref[:, :]
    xbuf[HX + RB:HX + RB + HX, :] = x_dn_ref[0:HX, :]
    ring[...] = x_cur_ref[RB - HX:RB, :]

    # im2col patch: 9 row-shifted windows, one 64-lane slice each.
    # (A 9-way vector concat of 64-lane views trips a Mosaic internal
    # error on mixed half-VREG offsets; lane-slice stores to a VMEM
    # scratch lower cleanly and cost ~us.)
    for t, (dy, dx) in enumerate(
            (dy, dx) for dy in range(3) for dx in range(3)):
        delta = (dy - 1) * PW + (dx - 1)
        patch[:, 64 * t:64 * (t + 1)] = xbuf[
            pl.ds(HX + delta, RB), :]

    y = jnp.dot(patch[:, :], w_ref[:, :],
                preferred_element_type=jnp.float32)
    y = y.astype(jnp.bfloat16) * s_ref[0, :] + t_ref[0, :]
    if residual:
        y = y + res_ref[:, :]
    y = _act(y, act_mode, alpha)
    # Re-zero the pad ring: columns via the (RB, 1) mask (the column
    # pattern repeats every PW rows and RB is a multiple of PW), rows
    # via first/last-step-in-sample zeroing.
    y = y * colmask_ref[:, :]
    local = jax.lax.rem(i, sps)
    rows = jax.lax.broadcasted_iota(jnp.int32, (RB, 1), 0)
    y = jnp.where(
        jnp.logical_or(
            jnp.logical_and(local == 0, rows < PW),
            jnp.logical_and(local == sps - 1, rows >= RB - PW)),
        jnp.bfloat16(0), y)
    o_ref[:, :] = y


@functools.lru_cache(maxsize=32)
def _build_conv_call(rows_total, RB, XB, HX, PW, sps, act_mode, alpha,
                     residual, interpret):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    steps = rows_total // RB

    def clamp_dn(i):
        return (jnp.minimum(i + 1, steps - 1), 0)

    in_specs = [
        pl.BlockSpec((RB, 64), lambda i: (i, 0)),
        pl.BlockSpec((RB, 64), clamp_dn),
    ]
    if residual:
        in_specs.append(pl.BlockSpec((RB, 64), lambda i: (i, 0)))
    in_specs += [
        pl.BlockSpec((RB, 1), lambda i: (0, 0)),      # column mask
        pl.BlockSpec((576, 64), lambda i: (0, 0)),    # weights
        pl.BlockSpec((1, 64), lambda i: (0, 0)),      # bn scale
        pl.BlockSpec((1, 64), lambda i: (0, 0)),      # bn offset
    ]
    kernel = functools.partial(
        _conv_kernel, RB, XB, HX, PW, sps, act_mode, alpha, residual)
    return pl.pallas_call(
        kernel,
        grid=(steps,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((RB, 64), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((rows_total, 64), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((HX, 64), jnp.bfloat16),   # persistent prev tail
            pltpu.VMEM((XB, 64), jnp.bfloat16),
            pltpu.VMEM((RB, 576), jnp.bfloat16),
        ],
        interpret=bool(interpret),
    )


def _geometry(n, h, w):
    """(rows_total, RB, XB, HX, PW, steps_per_sample) or None."""
    PW = w + 2
    hp = h + 2
    rows_sample = hp * PW
    HX = -(-(PW + 1) // 8) * 8
    # Largest row block (multiple of PW for the repeating column mask,
    # multiple of 8 for tiling, divisor of the per-sample rows) whose
    # patch + window scratch fits the VMEM budget.
    best = None
    for r in range(hp, 0, -1):
        RB = r * PW
        if RB % 8 or hp % r or RB < HX:
            continue
        XB = RB + 2 * HX
        # patch + window + ring scratches, 4 streamed (RB, 64) blocks
        # (x_cur/x_next/residual/out) double-buffered, constants.
        vmem = ((XB + HX) * 64 + RB * 576) * 2 + 4 * RB * 64 * 4 + 300_000
        if vmem <= _VMEM_BUDGET:
            best = (n * rows_sample, RB, XB, HX, PW, hp // r)
            break
    return best


def fold_bn(bn_params, eps: float = BN_EPS):
    """Inference BN as (scale, offset) f32 pairs (layers.batch_norm)."""
    inv = bn_params["gamma"] * jax.lax.rsqrt(
        bn_params["moving_variance"] + eps)
    offset = bn_params["beta"] - bn_params["moving_mean"] * inv
    return inv, offset


def supported(x: jnp.ndarray, activation: str,
              params=None, names=None) -> bool:
    """Can the Pallas chain run this activation tensor?

    When ``params``/``names`` are given, also verifies the res-block
    convs are BIAS-FREE: the chain kernel has no bias add, so enabling
    it on imported weights that carry biases would be silently wrong.
    """
    if not ENABLED or x.dtype != jnp.bfloat16:
        return False
    if x.ndim != 4 or x.shape[-1] != 64:
        return False
    if activation not in ("relu", "lrelu"):
        return False
    if params is not None and names is not None:
        for name in names:
            block = params.get(name, {})
            for sub in block.values():
                if isinstance(sub, dict) and "bias" in sub:
                    return False
    n, h, w, _ = x.shape
    return _geometry(n, h, w) is not None


def res_block_chain(params: Dict[str, Any], names: List[str],
                    x: jnp.ndarray, activation: str,
                    alpha: float = 0.3,
                    interpret: Optional[bool] = None) -> jnp.ndarray:
    """Run consecutive res blocks (conv-bn-act-conv-bn[-fade]-add-act)
    as 2 Pallas kernels per block on a flat-padded activation."""
    n, h, w, c = x.shape
    rows_total, RB, XB, HX, PW, sps = _geometry(n, h, w)
    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    # Entry: zero-pad ring, flatten.  One XLA copy for the whole chain.
    flat = jnp.pad(
        x, ((0, 0), (1, 1), (1, 1), (0, 0))).reshape(rows_total, 64)

    # Column mask (pad cols 0 and PW-1), repeating pattern of RB rows.
    col = np.arange(RB) % PW
    colmask = jnp.asarray(
        ((col >= 1) & (col <= PW - 2)).astype(np.float32)[:, None],
        jnp.bfloat16)

    conv = _build_conv_call(rows_total, RB, XB, HX, PW, sps,
                            activation, alpha, False, interpret)
    conv_res = _build_conv_call(rows_total, RB, XB, HX, PW, sps,
                                activation, alpha, True, interpret)

    for name in names:
        p = params[name]
        w1 = p["conv_1"]["kernel"].astype(jnp.bfloat16).reshape(576, 64)
        w2 = p["conv_2"]["kernel"].astype(jnp.bfloat16).reshape(576, 64)
        s1, t1 = fold_bn(p["bn_1"])
        s2, t2 = fold_bn(p["bn_2"])
        if "fade" in p:
            # Inference fade-in is a constant scale on the bn_2 output
            # (models.common.Mutables.fade_in): fold it into s2/t2.
            fade = jnp.minimum(
                p["fade"]["counter"].astype(jnp.float32)
                / jnp.maximum(p["fade"]["period"], 1.0), 1.0)
            s2 = s2 * fade
            t2 = t2 * fade
        s1 = s1.astype(jnp.bfloat16)[None, :]
        t1 = t1.astype(jnp.bfloat16)[None, :]
        s2 = s2.astype(jnp.bfloat16)[None, :]
        t2 = t2.astype(jnp.bfloat16)[None, :]
        y1 = conv(flat, flat, colmask, w1, s1, t1)
        flat = conv_res(y1, y1, flat, colmask, w2, s2, t2)

    out = flat.reshape(n, h + 2, w + 2, 64)[:, 1:-1, 1:-1, :]
    return out
