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

import jax
import jax.numpy as jnp


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

    lin = (iy * w + ix).reshape(n, h * w)
    flat = corners.reshape(n, h * w, 4 * c)

    def gather_one(fl, li):
        return jnp.take(fl, li, axis=0)

    rows = jax.vmap(gather_one)(flat, lin) if n > 1 else (
        gather_one(flat[0], lin[0])[None]
    )
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
