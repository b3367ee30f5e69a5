"""Schedule-table and q_sample parity tests.

Oracle 1: an independent numpy transcription of the published DDPM formulas.
Oracle 2 (skipped if unavailable): the actual reference implementation at
/root/reference, imported read-only and driven through torch on CPU.
"""

import math
import sys
from pathlib import Path

import numpy as np
import pytest

from clip_codec_tpu.diffusion.schedule import NoiseSchedule

REF_SRC = Path("/root/reference/src")


def _np_cosine_betas(T):
    s = 0.008
    t = np.linspace(0, T, T + 1) / T
    ac = np.cos((t + s) / (1 + s) * math.pi / 2) ** 2
    ac = ac / ac[0]
    betas = 1 - ac[1:] / ac[:-1]
    return np.clip(betas, 1e-4, 0.9999)


@pytest.mark.parametrize("schedule", ["linear", "cosine"])
def test_tables_vs_numpy(schedule):
    T = 1000
    sch = NoiseSchedule.create(T, schedule)
    betas = _np_cosine_betas(T) if schedule == "cosine" else np.linspace(1e-4, 0.02, T)
    alphas = 1 - betas
    ac = np.cumprod(alphas)
    np.testing.assert_allclose(np.asarray(sch.betas), betas, rtol=5e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(sch.alphas_cumprod), ac, rtol=5e-4, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(sch.alphas_cumprod_prev), np.concatenate([[1.0], ac[:-1]]), rtol=5e-4, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(sch.posterior_variance), betas * (1 - np.concatenate([[1.0], ac[:-1]])) / (1 - ac),
        rtol=5e-4, atol=1e-6,
    )
    assert sch.timesteps == T


def test_q_sample_and_x0_inverse(rng):
    sch = NoiseSchedule.create(1000, "cosine")
    # t=999 is excluded: the clamped cosine schedule drives alpha_bar there to
    # ~1e-20, so inverting q_sample amplifies fp32 rounding beyond any useful
    # tolerance (true of the reference's torch math too).
    x0 = rng.standard_normal((4, 8, 8, 3)).astype(np.float32)
    noise = rng.standard_normal((4, 8, 8, 3)).astype(np.float32)
    t = np.array([0, 250, 500, 900], dtype=np.int32)
    x_t = np.asarray(sch.q_sample(x0, t, noise))
    # manual
    a = np.asarray(sch.sqrt_alphas_cumprod)[t][:, None, None, None]
    b = np.asarray(sch.sqrt_one_minus_alphas_cumprod)[t][:, None, None, None]
    np.testing.assert_allclose(x_t, a * x0 + b * noise, rtol=1e-6)
    # predict_x0_from_eps inverts q_sample exactly when eps == noise
    x0_rec = np.asarray(sch.predict_x0_from_eps(x_t, t, noise))
    np.testing.assert_allclose(x0_rec, x0, rtol=1e-3, atol=1e-4)


@pytest.mark.skipif(not REF_SRC.exists(), reason="reference checkout not available")
@pytest.mark.parametrize("schedule", ["linear", "cosine"])
def test_tables_vs_reference_torch(schedule):
    torch = pytest.importorskip("torch")
    if str(REF_SRC) not in sys.path:
        sys.path.insert(0, str(REF_SRC))
    from clip_feature_codec.diffusion.scheduler import NoiseScheduler as RefSched

    ref = RefSched(timesteps=1000, schedule=schedule, device="cpu")
    ours = NoiseSchedule.create(1000, schedule)
    for name in [
        "betas", "alphas", "alphas_cumprod", "alphas_cumprod_prev",
        "sqrt_alphas_cumprod", "sqrt_one_minus_alphas_cumprod", "posterior_variance",
    ]:
        # atol=1e-5: torch and numpy linspace differ by ~1 ulp in fp32, which
        # near t=0 is amplified through 1-alphas_cumprod (~1e-4) into ~2.5e-6
        # absolute differences in the sqrt tables. End-to-end DDIM parity is
        # separately asserted at rtol=1e-4 in test_ddim.py.
        np.testing.assert_allclose(
            np.asarray(getattr(ours, name)),
            getattr(ref, name).numpy(),
            rtol=5e-4, atol=1e-5, err_msg=name,
        )

    # q_sample parity on random data
    g = np.random.default_rng(1)
    x0 = g.standard_normal((2, 3, 16, 16)).astype(np.float32)  # ref is NCHW
    noise = g.standard_normal((2, 3, 16, 16)).astype(np.float32)
    t = np.array([17, 893])
    ref_xt = ref.q_sample(torch.from_numpy(x0), torch.from_numpy(t), torch.from_numpy(noise)).numpy()
    ours_xt = np.asarray(ours.q_sample(x0.transpose(0, 2, 3, 1), t.astype(np.int32), noise.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(ours_xt.transpose(0, 3, 1, 2), ref_xt, rtol=5e-4, atol=1e-5)
