"""JoshUpscale-TPU: TPU-native real-time recurrent video super-resolution.

A ground-up TPU (JAX/XLA/Pallas) re-design of the capabilities of
itmo153277/JoshUpscale: a FRVSR/TecoGAN-family recurrent GAN that upscales
480x270 game footage to 1920x1080 in real time, with a full model lifecycle
(training, export, quantization, serving).

Layer map (TPU-native):

- ``joshupscale_tpu.ops``      -- exact-semantics image ops (TF1 resize,
  dense warp, space/depth) + Pallas kernels for the hot paths.
- ``joshupscale_tpu.nn``       -- functional conv/bn layers over param pytrees.
- ``joshupscale_tpu.models``   -- FNet / generator / discriminator / VGG and
  the recurrent single-frame inference model; config-driven registry.
- ``joshupscale_tpu.runtime``  -- compiled serving engine with donated
  on-device recurrent state, sequential video streams, multi-stream batching.
- ``joshupscale_tpu.training`` -- FRVSR and TecoGAN trainers (scan unroll,
  t_balance gating), data-parallel over a jax.sharding.Mesh.
- ``joshupscale_tpu.data``     -- config-driven dataset op-chain.
- ``joshupscale_tpu.export``   -- weight import (Keras h5 / npz), AOT
  serialization, quantization.
"""

__version__ = "0.1.0"

from joshupscale_tpu import ops  # noqa: F401
