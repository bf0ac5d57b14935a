"""Training stack: FRVSR / TecoGAN trainers, losses, harness."""

from joshupscale_tpu.training.frvsr import FRVSRSingleTrainer, FRVSRTrainer
from joshupscale_tpu.training.gan import GANTrainer
from joshupscale_tpu.training.losses import (
    DEFAULT_GAN_LOSS_CONFIG,
    get_gan_loss_config,
)
from joshupscale_tpu.training.trainer import (
    GANTrainState,
    TrainState,
    build_frvsr_step,
    build_gan_step,
    fit,
    freeze_mask,
    init_gan_state,
    init_train_state,
    load_checkpoint,
    make_optimizer,
    save_checkpoint,
)

__all__ = [
    "FRVSRTrainer",
    "FRVSRSingleTrainer",
    "GANTrainer",
    "DEFAULT_GAN_LOSS_CONFIG",
    "get_gan_loss_config",
    "TrainState",
    "GANTrainState",
    "build_frvsr_step",
    "build_gan_step",
    "fit",
    "freeze_mask",
    "init_train_state",
    "init_gan_state",
    "make_optimizer",
    "save_checkpoint",
    "load_checkpoint",
]
