from .blocks import AttnBlock, DWConvBlock, FiLM, ResBlock
from .decoders import CLIPCondDecoder, FeatureToImageDecoderLite
from .unet import CLIPCondUNet, timestep_embedding

__all__ = [
    "AttnBlock", "DWConvBlock", "FiLM", "ResBlock",
    "CLIPCondDecoder", "FeatureToImageDecoderLite",
    "CLIPCondUNet", "timestep_embedding",
]
