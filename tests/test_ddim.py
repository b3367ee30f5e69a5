"""DDIM sampler parity tests.

The scan-based sampler must reproduce the reference's per-step update exactly
(including its nonstandard deviations, SURVEY.md §2.1). Oracle 1 is a numpy
per-step loop; Oracle 2 is the reference DDIMSampler itself (torch CPU),
driven with an identical dummy model and identical starting noise.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

from clip_codec_tpu.diffusion.ddim import DDIMSampler, ddim_sample, ddim_timestep_grid
from clip_codec_tpu.diffusion.schedule import NoiseSchedule

REF_SRC = Path("/root/reference/src")


def test_timestep_grid_matches_torch_linspace():
    torch = pytest.importorskip("torch")
    for T, steps in [(1000, 50), (1000, 100), (1000, 250), (500, 7), (1000, 1)]:
        ref = torch.linspace(T - 1, 0, steps).long().numpy()
        np.testing.assert_array_equal(ddim_timestep_grid(T, steps), ref)


def _dummy_model_np(x, z, t):
    # Deterministic pseudo-model: mixes x, a z-derived bias, and t scaling.
    zb = np.tanh(z.mean(axis=-1))[:, None, None, None]
    tt = (t.astype(np.float32) / 1000.0)[:, None, None, None]
    return 0.1 * x + zb * 0.05 + 0.3 * tt


def _np_ddim(sched, z, shape, steps, x_init):
    ac = np.asarray(sched.alphas_cumprod)
    ac_prev = np.asarray(sched.alphas_cumprod_prev)
    ts = ddim_timestep_grid(sched.timesteps, steps)
    x = x_init.copy()
    for i in range(steps):
        t = ts[i]
        t_b = np.full((shape[0],), t)
        eps = _dummy_model_np(x, z, t_b)
        abt = ac[t]
        ab_s = ac_prev[t] if i < steps - 1 else 1.0
        x0 = np.clip((x - np.sqrt(1 - abt) * eps) / np.sqrt(abt), -1, 1)
        sigma = 0.0
        x = np.sqrt(ab_s) * x0 + np.sqrt(ab_s - sigma**2) * eps
    return x


def test_scan_matches_numpy_loop(rng):
    import jax.numpy as jnp

    sched = NoiseSchedule.create(1000, "cosine")
    B, H, W, C = 2, 8, 8, 3
    z = rng.standard_normal((B, 512)).astype(np.float32)
    x_init = rng.standard_normal((B, H, W, C)).astype(np.float32)

    def model_fn(x, zz, t):
        zb = jnp.tanh(zz.mean(axis=-1))[:, None, None, None]
        tt = (t.astype(jnp.float32) / 1000.0)[:, None, None, None]
        return 0.1 * x + zb * 0.05 + 0.3 * tt

    out = np.asarray(ddim_sample(model_fn, sched, z, (B, H, W, C), steps=50, x_T=x_init))
    expect = _np_ddim(sched, z, (B, H, W, C), 50, x_init)
    np.testing.assert_allclose(out, expect, rtol=1e-4, atol=1e-5)


def test_eta_zero_is_deterministic(rng):
    import jax

    sched = NoiseSchedule.create(100, "linear")
    z = rng.standard_normal((1, 16)).astype(np.float32)

    def model_fn(x, zz, t):
        return 0.05 * x

    a = ddim_sample(model_fn, sched, z, (1, 4, 4, 3), steps=10, rng=jax.random.PRNGKey(1))
    b = ddim_sample(model_fn, sched, z, (1, 4, 4, 3), steps=10, rng=jax.random.PRNGKey(1))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_eta_positive_changes_output(rng):
    import jax

    sched = NoiseSchedule.create(100, "linear")
    z = rng.standard_normal((1, 16)).astype(np.float32)

    def model_fn(x, zz, t):
        return 0.05 * x

    det = ddim_sample(model_fn, sched, z, (1, 4, 4, 3), steps=10, eta=0.0, rng=jax.random.PRNGKey(2))
    sto = ddim_sample(model_fn, sched, z, (1, 4, 4, 3), steps=10, eta=1.0, rng=jax.random.PRNGKey(2))
    assert not np.allclose(np.asarray(det), np.asarray(sto))


@pytest.mark.skipif(not REF_SRC.exists(), reason="reference checkout not available")
def test_parity_vs_reference_sampler(rng):
    torch = pytest.importorskip("torch")
    import jax.numpy as jnp

    if str(REF_SRC) not in sys.path:
        sys.path.insert(0, str(REF_SRC))
    from clip_feature_codec.diffusion.ddim import DDIMSampler as RefDDIM
    from clip_feature_codec.diffusion.scheduler import NoiseScheduler as RefSched

    B, C, H, W = 2, 3, 8, 8
    z = rng.standard_normal((B, 32)).astype(np.float32)
    x_init = rng.standard_normal((B, C, H, W)).astype(np.float32)

    class TorchDummy(torch.nn.Module):
        def forward(self, x, zz, t):
            zb = torch.tanh(zz.mean(dim=-1))[:, None, None, None]
            tt = (t.float() / 1000.0)[:, None, None, None]
            return 0.1 * x + zb * 0.05 + 0.3 * tt

    ref_sched = RefSched(timesteps=1000, schedule="cosine", device="cpu")
    ref_out = RefDDIM(ref_sched, eta=0.0).sample(
        TorchDummy(), torch.from_numpy(z), (B, C, H, W), steps=50,
        x_T=torch.from_numpy(x_init),
    ).numpy()

    def model_fn(x, zz, t):  # NHWC
        zb = jnp.tanh(zz.mean(axis=-1))[:, None, None, None]
        tt = (t.astype(jnp.float32) / 1000.0)[:, None, None, None]
        return 0.1 * x + zb * 0.05 + 0.3 * tt

    sched = NoiseSchedule.create(1000, "cosine")
    ours = DDIMSampler(sched, eta=0.0).sample(
        model_fn, z, (B, H, W, C), steps=50, x_T=x_init.transpose(0, 2, 3, 1)
    )
    np.testing.assert_allclose(np.asarray(ours).transpose(0, 3, 1, 2), ref_out, rtol=1e-4, atol=1e-5)


def test_ddpm_ancestral_sampler(rng):
    """Beyond-reference ancestral sampler built on p_mean_variance."""
    import jax

    from clip_codec_tpu.diffusion import ddpm_sample

    sched = NoiseSchedule.create(20, "linear")
    z = rng.standard_normal((2, 8)).astype(np.float32)

    def model_fn(x, zz, t):
        return 0.05 * x

    out = ddpm_sample(model_fn, sched, z, (2, 8, 8, 3), rng=jax.random.PRNGKey(0))
    assert np.asarray(out).shape == (2, 8, 8, 3)
    assert np.all(np.isfinite(np.asarray(out)))
    # deterministic given the key
    out2 = ddpm_sample(model_fn, sched, z, (2, 8, 8, 3), rng=jax.random.PRNGKey(0))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))


def test_committed_golden_trajectory():
    """Regression pin: a fixed tiny model + fixed keys must reproduce the
    committed DDIM trajectory bit-close across refactors/versions."""
    import jax
    import jax.numpy as jnp
    from pathlib import Path

    from clip_codec_tpu.models import CLIPCondUNet

    net = CLIPCondUNet(z_dim=8, base=8, ch_mult=(1, 2), img_ch=3)
    params = net.init(jax.random.PRNGKey(123), jnp.zeros((1, 8, 8, 3)),
                      jnp.zeros((1, 8)), jnp.zeros((1,), jnp.int32))
    z = jax.random.normal(jax.random.PRNGKey(7), (2, 8), jnp.float32)
    # linear schedule: the cosine tail's ~1e-10 alpha-bar amplifies fp noise
    # from environment differences (device counts, fusion choices) beyond any
    # useful tolerance.
    sched = NoiseSchedule.create(100, "linear")
    out = np.asarray(ddim_sample(lambda x, zz, t: net.apply(params, x, zz, t),
                                 sched, z, (2, 8, 8, 3), steps=6, rng=jax.random.PRNGKey(42)))
    golden = np.load(Path(__file__).parent / "fixtures" / "golden_ddim.npz")["out"]
    np.testing.assert_allclose(out, golden, rtol=1e-4, atol=1e-5)


def test_eta_sweep_does_not_recompile(rng):
    """eta is traced: an eta sweep must reuse ONE stochastic program (plus
    one deterministic for eta=0) instead of recompiling the 50-step
    trajectory per float (round-1 VERDICT weak #7)."""
    import jax
    import jax.numpy as jnp

    from clip_codec_tpu.diffusion.ddim import _ddim_sample
    from clip_codec_tpu.models import CLIPCondUNet

    net = CLIPCondUNet(z_dim=8, base=8, ch_mult=(1, 2), img_ch=3)
    z = rng.standard_normal((2, 8)).astype(np.float32)
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)), z[:1],
                      jnp.zeros((1,), jnp.int32))
    sched = NoiseSchedule.create(50, "linear")
    fn = lambda x, zz, t: net.apply(params, x, zz, t)

    before = _ddim_sample._cache_size()
    outs = {}
    for eta in (0.0, 0.1, 0.2, 0.3):
        outs[eta] = np.asarray(ddim_sample(fn, sched, z, (2, 8, 8, 3), 4, eta,
                                           jax.random.PRNGKey(1)))
    added = _ddim_sample._cache_size() - before
    assert added <= 2, f"eta sweep added {added} compiled programs"
    # distinct eta still changes the trajectory (the value is really traced)
    assert not np.allclose(outs[0.1], outs[0.2])


def _np_ddim_std(sched, z, shape, steps, x_init, model=_dummy_model_np):
    """Numpy oracle for the TEXTBOOK strided update (Song et al. 2021 eq. 12,
    eta=0): target alpha-bar from the NEXT grid point, terminal target 1,
    direction sqrt(1 - ab_s) * eps."""
    ac = np.asarray(sched.alphas_cumprod)
    ts = ddim_timestep_grid(sched.timesteps, steps)
    x = x_init.copy()
    for i in range(steps):
        t = ts[i]
        eps = model(x, z, np.full((shape[0],), t))
        abt = ac[t]
        ab_s = ac[ts[i + 1]] if i < steps - 1 else 1.0
        x0 = np.clip((x - np.sqrt(1 - abt) * eps) / np.sqrt(abt), -1, 1)
        x = np.sqrt(ab_s) * x0 + np.sqrt(1 - ab_s) * eps
    return x


def test_standard_ddim_matches_numpy_loop(rng):
    import jax.numpy as jnp

    sched = NoiseSchedule.create(1000, "cosine")
    B, H, W, C = 2, 8, 8, 3
    z = rng.standard_normal((B, 512)).astype(np.float32)
    x_init = rng.standard_normal((B, H, W, C)).astype(np.float32)

    def model_fn(x, zz, t):
        zb = jnp.tanh(zz.mean(axis=-1))[:, None, None, None]
        tt = (t.astype(jnp.float32) / 1000.0)[:, None, None, None]
        return 0.1 * x + zb * 0.05 + 0.3 * tt

    for steps in (1, 7, 50):
        ours = np.asarray(ddim_sample(model_fn, sched, z, (B, H, W, C), steps,
                                      0.0, None, x_T=jnp.asarray(x_init), standard=True))
        oracle = _np_ddim_std(sched, z, (B, H, W, C), steps, x_init)
        np.testing.assert_allclose(ours, oracle, rtol=1e-5, atol=1e-5)


def test_standard_ddim_recovers_delta_data_reference_form_diverges():
    """The quantified reference-sampler flaw (docs/performance.md "sampler
    quality knee"): on the delta-data oracle (model emits the eps exactly
    consistent with a fixed x0) textbook DDIM recovers x0 to fp32 roundoff at
    ANY step count, while the reference's nonstandard update (deviations
    (a)+(c), final step emits x0_pred + eps) diverges with step count."""
    import jax
    import jax.numpy as jnp

    sched = NoiseSchedule.create(100)
    target = jnp.asarray(
        np.random.default_rng(0).uniform(-0.9, 0.9, (2, 8, 8, 3)).astype(np.float32))

    def model_fn(x, z, t):
        ab = sched.alphas_cumprod[t][:, None, None, None]
        return (x - jnp.sqrt(ab) * target) / jnp.sqrt(1 - ab)

    z = jnp.zeros((2, 4))
    prev_ref_err = 0.0
    for steps in (5, 20, 50):
        out_std = ddim_sample(model_fn, sched, z, target.shape, steps, 0.0,
                              jax.random.PRNGKey(0), standard=True)
        assert float(jnp.abs(out_std - target).max()) < 1e-5
        out_ref = ddim_sample(model_fn, sched, z, target.shape, steps, 0.0,
                              jax.random.PRNGKey(0), standard=False)
        ref_err = float(jnp.abs(out_ref - target).max())
        assert ref_err > 1.0  # the parity form cannot reconstruct
        assert ref_err > prev_ref_err  # and it worsens with more steps
        prev_ref_err = ref_err


def test_make_sampler_ddim_std(rng):
    import jax
    import jax.numpy as jnp

    from clip_codec_tpu.diffusion import make_sampler

    sched = NoiseSchedule.create(100, "linear")
    target = jnp.asarray(rng.uniform(-0.9, 0.9, (2, 8, 8, 3)).astype(np.float32))

    def model_fn(x, z, t):
        ab = sched.alphas_cumprod[t][:, None, None, None]
        return (x - jnp.sqrt(ab) * target) / jnp.sqrt(1 - ab)

    s = make_sampler("ddim_std", sched)
    out = s.sample(model_fn, jnp.zeros((2, 4)), (2, 8, 8, 3), steps=10,
                   rng=jax.random.PRNGKey(0))
    assert float(jnp.abs(out - target).max()) < 1e-5
    # eta plumbs through: with an imperfect model, stochastic standard
    # sampling is finite (no reference NaN flaw: 1 - ab_s - sigma^2 >= 0 at
    # eta=1) and differs from the deterministic run. (On the delta-data
    # oracle above eta is invisible — later steps correct injected noise and
    # the final step's sigma is 0 — so probe with the pseudo-model.)
    def rough_fn(x, z, t):
        return 0.1 * x + 0.3 * (t.astype(jnp.float32) / 100.0)[:, None, None, None]

    det = np.asarray(make_sampler("ddim_std", sched).sample(
        rough_fn, jnp.zeros((2, 4)), (2, 8, 8, 3), steps=10, rng=jax.random.PRNGKey(0)))
    sto = np.asarray(make_sampler("ddim_std", sched, eta=1.0).sample(
        rough_fn, jnp.zeros((2, 4)), (2, 8, 8, 3), steps=10, rng=jax.random.PRNGKey(0)))
    assert np.isfinite(sto).all()  # the parity form NaNs at eta=1
    assert float(np.abs(sto - det).max()) > 1e-4
