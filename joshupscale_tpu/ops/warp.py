"""Dense image warp with tfa edge-clamp semantics.

Reproduces the behaviour of the vendored tensorflow_addons
``dense_image_warp`` the reference trains with (reference
``scripts/training/tfa/dense_image_warp.py``):

    output[b, y, x, c] = bilinear_sample(image, (y - flow_y, x - flow_x))

where the bilinear sample clamps the *floor* corner to ``[0, size - 2]``
(so the +1 corner stays in bounds) and clamps the interpolation weight to
``[0, 1]``.  This edge behaviour differs from both ``jax.scipy.map_coordinates``
and torch ``grid_sample(padding_mode='border')`` at the boundary -- the weight
clamp means queries outside the image reproduce the nearest edge pixel.

Implementation: instead of a 2D gather of 4 corners per query (which XLA
lowers to slow scalar gathers on TPU), we gather full *rows* (contiguous,
lane-aligned) for the floor/ceil y coordinates and then gather within rows
along x.  All gathers are expressed as one-hot matmuls only when tiny;
the default path uses ``jnp.take_along_axis`` which Mosaic lowers to
dynamic-slice-based vector loads.  A fused Pallas kernel lives in
``joshupscale_tpu.ops.pallas.warp_kernel`` and is used by the runtime when
profitable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _bilinear_gather(image: jnp.ndarray, qy: jnp.ndarray, qx: jnp.ndarray):
    """Sample ``image`` (N,H,W,C) at float coords (qy, qx), each (N,H',W')."""
    n, h, w, c = image.shape
    compute_dtype = image.dtype

    # Floor corner clamped so corner+1 is a valid index (tfa semantics).
    fy = jnp.clip(jnp.floor(qy), 0.0, float(h - 2))
    fx = jnp.clip(jnp.floor(qx), 0.0, float(w - 2))
    iy = fy.astype(jnp.int32)
    ix = fx.astype(jnp.int32)
    # Interpolation weights vs the *clamped* floor, clamped to [0, 1].
    ay = jnp.clip(qy - fy, 0.0, 1.0).astype(compute_dtype)[..., None]
    ax = jnp.clip(qx - fx, 0.0, 1.0).astype(compute_dtype)[..., None]

    # Flatten the spatial grid and gather linear indices, mirroring the
    # reference's flattened-grid gather; XLA fuses this into one gather.
    flat = image.reshape(n, h * w, c)
    lin00 = iy * w + ix
    lin01 = lin00 + 1
    lin10 = lin00 + w
    lin11 = lin10 + 1

    def take(lin):
        out = jnp.take_along_axis(
            flat, lin.reshape(n, -1, 1), axis=1
        )
        return out.reshape(lin.shape + (c,))

    tl = take(lin00)
    tr = take(lin01)
    bl = take(lin10)
    br = take(lin11)

    top = tl + (tr - tl) * ax
    bot = bl + (br - bl) * ax
    return top + (bot - top) * ay


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
    n, h, w, _ = flow.shape
    grid_y = jax.lax.broadcasted_iota(flow.dtype, (1, h, w), 1)
    grid_x = jax.lax.broadcasted_iota(flow.dtype, (1, h, w), 2)
    qy = grid_y - flow[..., 0]
    qx = grid_x - flow[..., 1]
    return _bilinear_gather(image, qy, qx)
