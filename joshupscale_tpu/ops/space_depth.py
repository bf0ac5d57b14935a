"""Space/depth block rearrangement matching ``tf.nn.space_to_depth`` order.

Channel ordering matters for weight compatibility: ``tf.nn.space_to_depth``
stacks the block rows-major *outside* the channel dim, i.e.
``out[..., (dy*bs + dx)*C + c] = in[b, y*bs+dy, x*bs+dx, c]``.
"""

from __future__ import annotations

import jax.numpy as jnp


def space_to_depth(x: jnp.ndarray, block_size: int) -> jnp.ndarray:
    """NHWC space-to-depth: (N,H,W,C) -> (N,H/bs,W/bs,bs*bs*C)."""
    n, h, w, c = x.shape
    bs = int(block_size)
    x = x.reshape(n, h // bs, bs, w // bs, bs, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, h // bs, w // bs, bs * bs * c)


def depth_to_space(x: jnp.ndarray, block_size: int) -> jnp.ndarray:
    """NHWC depth-to-space: (N,H,W,bs*bs*C) -> (N,H*bs,W*bs,C).

    Written as ONE 5-D transpose moving a single dim (the block row
    bs past W): ``(bs, bs*C)`` stays fused as the minor dim, which
    XLA:TPU lowers ~1.5x faster than the 6-D two-dim-move form
    (measured 1.48 -> 1.01 ms on the 1080p u8 display path, v5e).
    """
    n, h, w, c = x.shape
    bs = int(block_size)
    c_out = c // (bs * bs)
    x = x.reshape(n, h, w, bs, bs * c_out)
    x = x.transpose(0, 1, 3, 2, 4)
    return x.reshape(n, h * bs, w * bs, c_out)
