"""Exact-semantics image ops for the JoshUpscale-TPU compute path.

All ops reproduce the numeric semantics the reference model family was
trained with (TF1 resize with ``align_corners=False`` /
``half_pixel_centers=False``, tfa ``dense_image_warp`` edge clamping,
``tf.nn.space_to_depth`` channel ordering) -- any deviation compounds
frame-over-frame through the recurrence.
"""

from joshupscale_tpu.ops.resize import (
    resize_bilinear,
    resize_nearest,
    upscale_bilinear,
    upscale_nearest,
)
from joshupscale_tpu.ops.warp import dense_image_warp
from joshupscale_tpu.ops.space_depth import depth_to_space, space_to_depth
from joshupscale_tpu.ops.image import (
    BGR_LUMA,
    postprocess,
    preprocess,
)

__all__ = [
    "resize_bilinear",
    "resize_nearest",
    "upscale_bilinear",
    "upscale_nearest",
    "dense_image_warp",
    "space_to_depth",
    "depth_to_space",
    "preprocess",
    "postprocess",
    "BGR_LUMA",
]
