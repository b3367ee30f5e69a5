from .schedule import NoiseSchedule
from .ddim import DDIMSampler, ddim_sample, ddim_timestep_grid

__all__ = ["NoiseSchedule", "DDIMSampler", "ddim_sample", "ddim_timestep_grid"]
