"""TPU op library: fusion points with optional Pallas kernels.

The reference has no custom kernels (100% torch ops, SURVEY.md §2.4); here the
hot elementwise chains get explicit fusion points so a Pallas implementation
can be swapped in where profiling shows it beats XLA's automatic fusion.
"""

from .groupnorm import (
    flash_enabled,
    fused_mlp_enabled,
    group_norm,
    group_norm_silu,
    set_flash_attention,
    set_fused_mlp,
    set_pallas,
)
from .int8 import calibrate_int8, int8_enabled, set_int8_conv
from .spatial_fold import fold_chunks, set_fold_spatial


def enable_pallas(enabled: bool = True) -> None:
    """Process-wide switch for Pallas kernels on the hot ops (TPU only)."""
    set_pallas(enabled)


__all__ = [
    "group_norm", "group_norm_silu", "enable_pallas", "set_pallas",
    "set_flash_attention", "flash_enabled", "set_fused_mlp", "fused_mlp_enabled",
    "set_int8_conv", "int8_enabled",
    "fold_chunks", "set_fold_spatial",
    "calibrate_int8",
]
