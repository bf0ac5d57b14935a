"""Model zoo: FNet flow estimators, generator, discriminator, VGG,
recurrent inference model, and the config-driven registry."""

from joshupscale_tpu.models.fnet import (
    flow_autoencoder_apply,
    flow_autoencoder_init,
    flow_resnet_apply,
    flow_resnet_init,
)
from joshupscale_tpu.models.generator import (
    generator_resnet_apply,
    generator_resnet_init,
)
from joshupscale_tpu.models.discriminator import (
    discriminator_apply,
    discriminator_init,
)
from joshupscale_tpu.models.inference import InferenceModel
from joshupscale_tpu.models.registry import MODELS, create_models

__all__ = [
    "flow_resnet_init",
    "flow_resnet_apply",
    "flow_autoencoder_init",
    "flow_autoencoder_apply",
    "generator_resnet_init",
    "generator_resnet_apply",
    "discriminator_init",
    "discriminator_apply",
    "InferenceModel",
    "MODELS",
    "create_models",
]
