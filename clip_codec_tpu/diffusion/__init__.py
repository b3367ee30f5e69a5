from .schedule import NoiseSchedule
from .ddim import DDIMSampler, ddim_sample, ddim_timestep_grid
from .ddpm import ddpm_sample
from .dpm import DPMSolverPP, dpmpp_coefficients, dpmpp_sample

SAMPLERS = ("ddim", "ddim_std", "dpmpp")


def make_sampler(name: str, sched: NoiseSchedule, eta: float = 0.0):
    """Sampler factory for the product surfaces (codec / CLIs / server).

    ``ddim`` is the reference-parity sampler (any eta); ``ddim_std`` is
    textbook strided DDIM (the reference form's nonstandard update caps
    trained-model reconstruction ~4 dB — ddim.py module docstring); ``dpmpp``
    is the beyond-reference DPM-Solver++(2M) — deterministic, so ``eta`` must
    be 0 (for stochastic sampling use ddim/ddim_std with eta>0, or
    ``ddpm_sample``). All return objects with the same ``.sample(model_fn, z,
    shape, steps, ...)`` signature.
    """
    if name == "ddim":
        return DDIMSampler(sched, eta=eta)
    if name == "ddim_std":
        return DDIMSampler(sched, eta=eta, standard=True)
    if name == "dpmpp":
        if eta != 0.0:
            raise ValueError(
                "DPM-Solver++ is deterministic: eta must be 0.0 "
                "(use sampler='ddim' for eta > 0)"
            )
        return DPMSolverPP(sched)
    raise ValueError(f"unknown sampler {name!r}; choose from {SAMPLERS}")


__all__ = [
    "NoiseSchedule",
    "DDIMSampler",
    "ddim_sample",
    "ddim_timestep_grid",
    "ddpm_sample",
    "DPMSolverPP",
    "dpmpp_coefficients",
    "dpmpp_sample",
    "SAMPLERS",
    "make_sampler",
]
