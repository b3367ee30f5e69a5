from .quantizer import PerChannelAffineQuantizer, fit_affine, quantize, dequantize

__all__ = ["PerChannelAffineQuantizer", "fit_affine", "quantize", "dequantize"]
