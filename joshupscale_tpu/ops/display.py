"""Fused depth-to-space + uint8 display conversion (Pallas TPU kernel).

As separate XLA ops the d2s transpose + u8 convert cost ~1.45 ms at
1080p on v5e (the transpose moves tiny (b, b*c) minor dims); this
kernel emits the display frame in ~0.2 ms standalone, bit-exact with
``postprocess(depth_to_space(x, b))`` (truncating cast, verified on
TPU against the flagship model).

**NOT wired into InferenceModel -- measured net-negative inside the
full program.**  A Pallas call constrains its operand/result to
default layouts, and XLA layout-assignment reacts by re-laying-out the
whole generator conv chain (one ~163 us copy per res block, ~4 ms at
1080p: 19.0 -> 27.8 ms/frame).  Neither an optimization_barrier nor
handing the kernel the tail's natural W-in-lanes physical layout (as a
logical (N, Hb, C, Wb) transpose whose default layout matches, with
in-register (12, Wb) -> (Wb, 12) transposes -- the v2 variant below)
stops the propagation.  Kept as a standalone op (useful where the
producer is already default-layout, e.g. host-fed tensors) and as the
measured record of the layout-poisoning pitfall; see CLAUDE.md
dead-end log.

Used on TPU only; on CPU the XLA composition runs instead -- Mosaic
kernels do not lower on the CPU backend.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from joshupscale_tpu.ops.image import postprocess
from joshupscale_tpu.ops.space_depth import depth_to_space


def _kernel(block, c_out, x_ref, o_ref):
    x = x_ref[0, 0]  # (block*block*c, Wb): phases in sublanes, W in lanes
    v = (x.astype(jnp.float32) + 0.5) * 255.0
    # Truncating cast like XLA's f32->u8 (Mosaic needs the int32 hop).
    u = v.astype(jnp.int32).astype(jnp.uint8)
    bc = block * c_out
    for ry in range(block):
        o_ref[0, ry, :, :] = u[ry * bc:(ry + 1) * bc, :].T


def d2s_display_u8(x_s2d: jnp.ndarray, block: int = 4) -> jnp.ndarray:
    """(N, Hb, Wb, b*b*c) float s2d -> (N, Hb*b, Wb*b, c) uint8."""
    n, hb, wb, cs = x_s2d.shape
    b = int(block)
    c = cs // (b * b)
    if jax.default_backend() == "cpu":
        return postprocess(depth_to_space(x_s2d, b))

    from functools import partial

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    x2 = x_s2d.transpose(0, 1, 3, 2)  # (N, Hb, cs, Wb): free bitcast
    out = pl.pallas_call(
        partial(_kernel, b, c),
        out_shape=jax.ShapeDtypeStruct((n, hb * b, wb, b * c),
                                       jnp.uint8),
        grid_spec=pl.GridSpec(
            grid=(n, hb),
            in_specs=[pl.BlockSpec((1, 1, cs, wb),
                                   lambda i, j: (i, j, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, b, wb, b * c),
                                   lambda i, j: (i, j, 0, 0),
                                   memory_space=pltpu.VMEM),
        ),
    )(x2)
    return out.reshape(n, hb * b, wb * b, c)
