"""Dense image warp with tfa edge-clamp semantics, TPU-tuned.

Reproduces the behaviour of the vendored tensorflow_addons
``dense_image_warp`` the reference trains with (reference
``scripts/training/tfa/dense_image_warp.py``):

    output[b, y, x, c] = bilinear_sample(image, (y - flow_y, x - flow_x))

where the bilinear sample clamps the *floor* corner to ``[0, size - 2]``
(so the +1 corner stays in bounds) and clamps the interpolation weight to
``[0, 1]``: queries outside the image reproduce the nearest edge pixel.

TPU implementation notes (measured on v5e at 1080p):

- Index math ALWAYS runs in float32.  bfloat16 cannot represent pixel
  coordinates above 256 exactly (8 mantissa bits), which would quantize
  the sampling grid in 16-pixel steps.
- The four corners are fetched with ONE row gather: the image is first
  widened to ``(H*W, 4*C)`` rows ``[p, p+x1, p+y1, p+x1y1]`` built from
  edge-clamped shifts (cheap contiguous copies), so the gather moves
  4C-lane rows instead of issuing four separate C-lane gathers.  A
  batched ``take_along_axis`` formulation of the same op is ~8x slower
  (XLA batch-gather path); four separate 2-D gathers are ~2x slower.
- Everything is flattened to 2-D ``(H*W, lanes)`` shapes: XLA:TPU lowers
  ``jnp.take`` on 2-D operands to its fast dynamic-gather path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from joshupscale_tpu.ops.space_depth import depth_to_space, space_to_depth

# The TPU gather's per-index rate has a measured WINDOW of collapse in
# table row count (v5e: 130K rows = 1.84 ns/idx, 260K = 1.92, 518K =
# 10.7 (!), 1.04M = 5.2; CLAUDE.md gather rate law).  Batched warps
# flatten all streams into one gather except inside that window, where
# a per-stream lax.map keeps each gather at the fast rate (batch 4:
# 183 -> 105 ms/step measured; batch 8 flat at 1M rows beats the map).
# Module-level so tests can exercise both branches at small sizes.
FLAT_GATHER_MAX_ROWS = 300_000
FLAT_GATHER_RESUME_ROWS = 800_000

# Transient budget for the one-hot in _segsum_gather's matmul backward
# (bounds peak memory in case XLA materializes the dot operand).
SEGSUM_ONEHOT_BUDGET_BYTES = 256 * 1024 * 1024


def dense_image_warp(image: jnp.ndarray, flow: jnp.ndarray) -> jnp.ndarray:
    """Warp ``image`` by per-pixel ``flow`` (tfa convention).

    Parameters
    ----------
    image : (N, H, W, C) float array
    flow : (N, H, W, 2) float array; channel 0 is the y offset, channel 1
        the x offset, and the query point is ``grid - flow``.

    Returns
    -------
    (N, H, W, C) array: ``image`` sampled at ``(y - flow_y, x - flow_x)``
    with bilinear interpolation and edge clamping.
    """
    n, h, w, c = image.shape
    out_dtype = image.dtype

    # ---- query coordinates (float32 exact) -------------------------------
    flow32 = flow.astype(jnp.float32)
    grid_y = jax.lax.broadcasted_iota(jnp.float32, (n, h, w), 1)
    grid_x = jax.lax.broadcasted_iota(jnp.float32, (n, h, w), 2)
    qy = grid_y - flow32[..., 0]
    qx = grid_x - flow32[..., 1]

    # Floor corner clamped so corner+1 stays a valid index (tfa semantics).
    fy = jnp.clip(jnp.floor(qy), 0.0, float(h - 2))
    fx = jnp.clip(jnp.floor(qx), 0.0, float(w - 2))
    iy = fy.astype(jnp.int32)
    ix = fx.astype(jnp.int32)
    # Interpolation weights vs the *clamped* floor, clamped to [0, 1].
    ay = jnp.clip(qy - fy, 0.0, 1.0)
    ax = jnp.clip(qx - fx, 0.0, 1.0)

    # ---- one gather of all four corners ----------------------------------
    # Edge-clamped +1 shifts; for the in-range indices actually used
    # (iy <= h-2, ix <= w-2) these equal the true neighbours.
    img_x1 = jnp.concatenate([image[:, :, 1:], image[:, :, -1:]], axis=2)
    img_y1 = jnp.concatenate([image[:, 1:], image[:, -1:]], axis=1)
    img_xy = jnp.concatenate([img_y1[:, :, 1:], img_y1[:, :, -1:]], axis=2)
    corners = jnp.concatenate([image, img_x1, img_y1, img_xy], axis=-1)

    # One FLAT gather across the batch (a vmapped/batched gather lowers
    # to XLA's slow batch-gather path -- ~8x worse at batch 8).
    lin = iy * w + ix
    if n > 1:
        offs = jax.lax.broadcasted_iota(
            jnp.int32, (n, h, w), 0) * (h * w)
        lin = lin + offs
    flat = corners.reshape(n * h * w, 4 * c)
    # mode="fill" (NOT promise_in_bounds): on v5e the promise-mode
    # gather's custom fusion MISCOMPILES inside large fused training
    # graphs -- the final 8x128-grain tail of the output buffer is left
    # unwritten (deterministic -inf garbage in the last row/channel of
    # a (72, 128, 128, 3) warp), which the discriminator's batch norm
    # then amplifies into an all-NaN branch.  Indices are in bounds by
    # construction (clip keeps the edge-clamp semantics exact even for
    # the fill path), so fill's extra select pass is the only cost --
    # negligible against a training step, and this pixel-space warp is
    # the training path.  The s2d serving warp keeps promise-mode: its
    # smaller single-frame graphs compile correctly (pinned by golden
    # tests) and the select pass would cost real frame time there.
    idx = jnp.clip(lin.reshape(-1), 0, n * h * w - 1)
    rows = flat.at[idx].get(mode="fill", fill_value=0)
    rows = rows.reshape(n, h, w, 4, c)

    # ---- bilinear blend ---------------------------------------------------
    ay = ay[..., None].astype(out_dtype)
    ax = ax[..., None].astype(out_dtype)
    tl = rows[..., 0, :]
    tr = rows[..., 1, :]
    bl = rows[..., 2, :]
    br = rows[..., 3, :]
    top = tl + (tr - tl) * ax
    bot = bl + (br - bl) * ax
    return top + (bot - top) * ay


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _segsum_gather(flat_table: jnp.ndarray, idx: jnp.ndarray,
                   frames: int, spec: tuple) -> jnp.ndarray:
    """Fill-mode row gather whose table-backward is a one-hot MATMUL.

    Forward is exactly the fill-mode gather (clip + ``mode="fill"``,
    the training-graph-safe path).  The autodiff backward of a row
    gather w.r.t. the table is XLA's scatter-add, which on TPU runs as
    a serialized read-modify-write: measured ~14.6 ns/update at the
    GAN training shapes -- 17.2 ms/step for the big-warp backward plus
    8.1 ms for the in-scan warp, 14% of the whole train step (see
    tools/profile_train_step.py).  The segment sum here is instead
    computed on the MXU: per frame, ``cot_table = one_hot(idx)^T @
    cot_rows`` -- the one-hot is exact in any float dtype and the
    contraction accumulates in float32 (at least as accurate as the
    bf16 scatter-add it replaces).

    Requires the flat layout the s2d warp produces: ``flat_table`` is
    ``frames`` per-frame tables stacked on axis 0, ``idx`` is
    per-frame contiguous, and frame f's indices point only into frame
    f's rows (true by construction: ``lin < hb*wb`` before the frame
    offset is added).  Frames are processed in chunks sized to keep
    the materialized one-hot under ~256 MB in case XLA does not fuse
    the compare+convert into the dot operand.
    """
    return flat_table.at[jnp.clip(idx, 0, flat_table.shape[0] - 1)].get(
        mode="fill", fill_value=0)


def _segsum_gather_fwd(flat_table, idx, frames, spec):
    return _segsum_gather(flat_table, idx, frames, spec), idx


def _segsum_gather_bwd(frames, spec, res, cot):
    idx = res
    r_total, table_dtype = spec
    r_f = r_total // frames
    m_f = idx.shape[0] // frames
    lanes = cot.shape[-1]
    idx_l = idx.reshape(frames, m_f)
    if frames > 1:
        idx_l = idx_l - (
            jnp.arange(frames, dtype=idx.dtype) * r_f)[:, None]
    cot_f = cot.reshape(frames, m_f, lanes)
    iota_r = jnp.arange(r_f, dtype=idx.dtype)

    # Chunk the frame axis so the (chunk, m_f, r_f) one-hot transient
    # stays bounded even if XLA materializes it.
    budget = SEGSUM_ONEHOT_BUDGET_BYTES // max(
        1, m_f * r_f * jnp.dtype(cot.dtype).itemsize)
    chunk = max(1, min(frames, budget))
    while frames % chunk:
        chunk -= 1

    def one_chunk(args):
        il, cf = args  # (chunk, m_f), (chunk, m_f, lanes)
        onehot = (il[..., None] == iota_r).astype(cf.dtype)
        # (chunk, r_f, lanes) <- contract m_f on the MXU, f32 accum.
        return jax.lax.dot_general(
            onehot, cf, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)

    if chunk == frames:
        cot_table = one_chunk((idx_l, cot_f))
    else:
        cot_table = jax.lax.map(
            one_chunk,
            (idx_l.reshape(frames // chunk, chunk, m_f),
             cot_f.reshape(frames // chunk, chunk, m_f, lanes)),
        ).reshape(frames, r_f, lanes)
    return (
        cot_table.reshape(r_total, lanes).astype(table_dtype),
        None,
    )


_segsum_gather.defvjp(_segsum_gather_fwd, _segsum_gather_bwd)


def dense_image_warp_s2d(
    image_s2d: jnp.ndarray,
    flow_s2d: jnp.ndarray,
    block: int = 4,
    gather_mode: str = "promise",
) -> jnp.ndarray:
    """Dense warp computed entirely in space-to-depth form.

    Numerically identical to ``depth_to_space -> dense_image_warp ->
    space_to_depth`` but with no HR-layout tensors: the serving fast
    path.  Measured on v5e at 1080p the naive pixel-space version costs
    ~15 ms/frame inside a scan (the XLA row gather dominates at ~8 ns
    per index on a >VMEM table); this formulation gathers ONE row per
    output pixel from a corner-subposition table whose rows stay under
    one 128-lane tile (the gather fast path, 1.84 ns/index), cutting
    warp+layout to ~5 ms/frame and every surrounding op to s2d-layout
    elementwise work.

    Parameters
    ----------
    image_s2d : (N, Hb, Wb, B*B*C) s2d-form image (channel order
        ``(ry, rx, c)`` like ``tf.nn.space_to_depth``).
    flow_s2d : (N, Hb, Wb, B*B*2) s2d-form flow (the flow net's head
        output BEFORE its depth_to_space; channel ``(ry, rx, {y,x})``).
    gather_mode : ``"promise"`` (serving default) gathers with
        ``promise_in_bounds`` -- fastest, but that gather's custom
        fusion MISCOMPILES inside large fused TRAINING graphs on
        XLA:TPU (the round-2 bug family: the final 8x128-grain tail of
        the output buffer is left unwritten).  ``"fill"`` clips the
        indices and gathers with ``mode="fill"`` like the pixel-space
        training warp -- one extra select pass, safe in training
        graphs.  Values are identical either way (indices are in
        bounds by construction).

    Returns
    -------
    (N, Hb, Wb, B*B*C) warped image in s2d form.
    """
    n, hb, wb, cs = image_s2d.shape
    b = block
    p2 = b * b
    c = cs // p2
    h, w = hb * b, wb * b
    # uint8 images (the u8-state serving tier, the TPU analog of the
    # reference's quantized TensorRT engines): the gather moves HALF
    # the bytes (u8 table rows), the bilinear blend runs on the raw
    # 0..255 values, and ONE final affine maps back to [-0.5, 0.5]
    # floats -- exact because the 4 bilinear weights sum to 1:
    #   sum_s w_s * (r_s/255 - 0.5) = (sum_s w_s * r_s)/255 - 0.5.
    u8 = image_s2d.dtype == jnp.uint8
    out_dtype = jnp.bfloat16 if u8 else image_s2d.dtype
    # Table row = the (b+1)^2 corner subpositions one output pixel can
    # touch: base block (b*b*c lanes) + the x-neighbour's first column
    # (b*c) + the y-neighbour's first row (b*c) + the xy corner (c) --
    # (b+1)^2*c = 75 lanes at b=4,c=3.  Keeping rows <= 128 lanes is the
    # TPU gather fast path: measured on v5e, row gathers from a
    # 130K-row table run 1.84 ns/index at <=128 lanes but 3.27 ns/index
    # at 192 lanes, and the gather output (and the layout pass XLA
    # inserts after it) shrinks 2.56x vs the naive 4-corner-widened
    # table.  Frame-level: 11.3 ms -> ~5.5 ms at 1080p.

    def corner_lane(sy: int, sx: int) -> int:
        if sy < b and sx < b:
            return (sy * b + sx) * c
        if sy < b:  # sx == b: x-neighbour column
            return p2 * c + sy * c
        if sx < b:  # sy == b: y-neighbour row
            return p2 * c + b * c + sx * c
        return p2 * c + 2 * b * c

    # ---- query coordinates per (block, phase), float32 ------------------
    flow32 = flow_s2d.astype(jnp.float32)
    fy_flow = flow32[..., 0::2]  # (N, Hb, Wb, 16), phase-major
    fx_flow = flow32[..., 1::2]
    phase = np.arange(p2)
    py_off = jnp.asarray((phase // b).astype(np.float32))
    px_off = jnp.asarray((phase % b).astype(np.float32))
    by = jax.lax.broadcasted_iota(jnp.float32, (n, hb, wb, p2), 1)
    bx = jax.lax.broadcasted_iota(jnp.float32, (n, hb, wb, p2), 2)
    qy = by * b + py_off - fy_flow
    qx = bx * b + px_off - fx_flow

    fy = jnp.clip(jnp.floor(qy), 0.0, float(h - 2))
    fx = jnp.clip(jnp.floor(qx), 0.0, float(w - 2))
    iy = fy.astype(jnp.int32)
    ix = fx.astype(jnp.int32)
    ay = jnp.clip(qy - fy, 0.0, 1.0).astype(out_dtype)[..., None]
    ax = jnp.clip(qx - fx, 0.0, 1.0).astype(out_dtype)[..., None]

    # ---- corner-subposition table: [S | S>x col0 | S>y row0 | S>xy c] ---
    sx_img = jnp.concatenate(
        [image_s2d[:, :, 1:], image_s2d[:, :, -1:]], axis=2)
    sy_img = jnp.concatenate(
        [image_s2d[:, 1:], image_s2d[:, -1:]], axis=1)
    sxy_img = jnp.concatenate([sy_img[:, :, 1:], sy_img[:, :, -1:]],
                              axis=2)
    # x-neighbour first column: lanes (ry, rx=0, c) for ry in 0..b-1.
    xcol = sx_img.reshape(n, hb, wb, b, b, c)[:, :, :, :, 0, :].reshape(
        n, hb, wb, b * c)
    # y-neighbour first row: lanes (ry=0, rx, c) -- contiguous.
    yrow = sy_img[..., : b * c]
    # xy corner (ry=0, rx=0).
    xy = sxy_img[..., :c]
    table = jnp.concatenate([image_s2d, xcol, yrow, xy], axis=-1)
    lanes = (b + 1) * (b + 1) * c

    # ---- one gather: corner-subposition row per output pixel ------------
    # The gather's per-index cost collapses ~5x once the table crosses
    # ~500K rows (measured on v5e; see CLAUDE.md gather rate law), so
    # the batch is flattened into ONE gather only while the combined
    # table stays below that cliff; larger batches gather per-stream
    # under lax.map (serialized on-chip, each at the 130K-row fast
    # rate) while everything around the warp stays batched.  A vmapped
    # gather (XLA batch-gather path) is ~8x slower than either.
    lin = (iy // b) * wb + ix // b
    rows_count = n * hb * wb

    # Fill mode is the training path: when the table is a float type
    # (i.e. gradients can flow), route through the custom-vjp gather
    # whose table-backward is the MXU segment sum instead of XLA's
    # serialized scatter-add (~3x the whole warp's forward cost at GAN
    # training shapes; see _segsum_gather).  The u8 serving table and
    # promise mode keep the plain gather (no gradients there).
    segsum = (gather_mode == "fill"
              and jnp.issubdtype(table.dtype, jnp.inexact))

    if gather_mode == "promise":
        def _gather(tbl2d, idx1d, limit, frames):
            # Pre-clamped indices: skip the OOB fill/select pass (it
            # costs a full extra pass + layout copy over the gather
            # output).
            return tbl2d.at[idx1d].get(mode="promise_in_bounds")
    elif gather_mode == "fill":
        def _gather(tbl2d, idx1d, limit, frames):
            if segsum:
                # spec carries the static (row count, dtype name) the
                # backward needs (custom_vjp residuals must be arrays).
                return _segsum_gather(
                    tbl2d, idx1d, frames,
                    (tbl2d.shape[0], jnp.dtype(tbl2d.dtype).name))
            return tbl2d.at[jnp.clip(idx1d, 0, limit - 1)].get(
                mode="fill", fill_value=0)
    else:
        raise ValueError(f"unknown gather_mode: {gather_mode!r}")

    if (rows_count <= FLAT_GATHER_MAX_ROWS
            or rows_count >= FLAT_GATHER_RESUME_ROWS):
        if n > 1:
            offs = jax.lax.broadcasted_iota(
                jnp.int32, (n, hb, wb, p2), 0) * (hb * wb)
            lin = lin + offs
        flat = table.reshape(n * hb * wb, lanes)
        rows = _gather(flat, lin.reshape(-1), n * hb * wb, n)
        rows = rows.reshape(n, hb, wb, p2, lanes)
    else:
        def one_stream(args):
            tbl, idx = args
            return _gather(
                tbl.reshape(hb * wb, lanes), idx.reshape(-1),
                hb * wb, 1)

        rows = jax.lax.map(one_stream, (table, lin))
        rows = rows.reshape(n, hb, wb, p2, lanes)

    # ---- separable combine over the 5x5 possible corner offsets ---------
    # Corner (dy, dx) sits at sub-position s = (iy % b + dy, ix % b + dx)
    # in [0, b]^2; its lane is a STATIC function of s (corner_lane), and
    # its weight wy(sy)*wx(sx) is a sparse separable function of the
    # phase/alpha: wy[sy] = (1-ay)*[py == sy] + ay*[py == sy - 1].
    py = (iy % b)[..., None]
    px = (ix % b)[..., None]
    if u8:
        rows = rows.astype(out_dtype)
    acc = jnp.zeros((n, hb, wb, p2, c), out_dtype)
    for sy in range(b + 1):
        wy = ((1.0 - ay) * (py == sy) + ay * (py == sy - 1)).astype(
            out_dtype)
        for sx in range(b + 1):
            wx = ((1.0 - ax) * (px == sx) + ax * (px == sx - 1)).astype(
                out_dtype)
            lane = corner_lane(sy, sx)
            acc = acc + rows[..., lane:lane + c] * (wy * wx)
    if u8:
        # Affine in f32 (1/255 is inexact in bf16), one fused pass.
        acc = (acc.astype(jnp.float32) * (1.0 / 255.0) - 0.5).astype(
            out_dtype)
    return acc.reshape(n, hb, wb, p2 * c)


def dense_image_warp_via_s2d(
    image: jnp.ndarray,
    flow: jnp.ndarray,
    block: int = 4,
) -> jnp.ndarray:
    """Pixel-layout dense warp routed through the s2d gather table.

    Numerically identical to :func:`dense_image_warp` (same tfa
    edge-clamp semantics, same f32 index math) and fully
    differentiable w.r.t. both ``image`` and ``flow`` -- the TRAINING
    fast path.  The pixel-space warp's gather table has ``N*H*W`` rows
    of ``4*C`` lanes, and large training batches (e.g. the GAN's
    ``B*18`` supervision/discriminator warps, ~590K-1.2M rows) sit in
    the measured slow regime of the TPU gather rate law (518K-row
    tables run ~5x slower PER INDEX than 130K-row tables; CLAUDE.md).
    Routing through the corner-subposition table shrinks the row count
    ``block**2``-fold (same index count, 130K-row-class table) at
    ``(block+1)**2 * C`` lanes, still under the 128-lane fast-path
    limit.

    Uses ``gather_mode="fill"`` -- the training-graph-safe gather (the
    promise-mode gather fusion miscompiles inside large fused training
    graphs on XLA:TPU; round-2 bug family).  The backward pass w.r.t.
    ``image`` is XLA's scatter-add over the same table; w.r.t. ``flow``
    it is elementwise over the saved gather rows.

    Falls back to the pixel-space warp when H or W is not divisible by
    ``block`` (training crops are 4-aligned in practice).
    """
    n, h, w, c = image.shape
    if h % block or w % block:
        return dense_image_warp(image, flow)
    img_s = space_to_depth(image, block)
    flow_s = space_to_depth(flow, block)
    out = dense_image_warp_s2d(img_s, flow_s, block, gather_mode="fill")
    return depth_to_space(out, block)
