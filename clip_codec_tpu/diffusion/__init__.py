from .schedule import NoiseSchedule
from .ddim import DDIMSampler, ddim_sample, ddim_timestep_grid
from .ddpm import ddpm_sample
from .dpm import DPMSolverPP, dpmpp_coefficients, dpmpp_sample

__all__ = [
    "NoiseSchedule",
    "DDIMSampler",
    "ddim_sample",
    "ddim_timestep_grid",
    "ddpm_sample",
    "DPMSolverPP",
    "dpmpp_coefficients",
    "dpmpp_sample",
]
