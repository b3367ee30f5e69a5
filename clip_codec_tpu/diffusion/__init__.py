from .schedule import NoiseSchedule
from .ddim import DDIMSampler, ddim_sample, ddim_timestep_grid
from .ddpm import ddpm_sample

__all__ = ["NoiseSchedule", "DDIMSampler", "ddim_sample", "ddim_timestep_grid", "ddpm_sample"]
