from .diffusion_train import DiffusionTrainConfig, make_train_step, train_diffusion
from .sd_diffusion_train import SDStoreData, SDTrainConfig, train_sd_diffusion
from .train_decoder import reconstruct_image_from_bitstream, train_direct_decoder

__all__ = [
    "DiffusionTrainConfig",
    "make_train_step",
    "train_diffusion",
    "SDStoreData",
    "SDTrainConfig",
    "train_sd_diffusion",
    "reconstruct_image_from_bitstream",
    "train_direct_decoder",
]
