"""Regression pin for the measured sampler quality knee (VERDICT r3 item 3).

Same protocol as ``scripts/dpm_knee.py`` at CI scale: overfit the tiny pixel
model on a fixed synthetic set, reconstruct from embeddings, score PSNR
against the sources. Pins the ORDERING found at full knee scale
(docs/performance.md "Sampler quality knee"):

    dpmpp-15  >  ddim_std-50 - margin  >>  ddim-50 (reference parity)

The absolute levels are model-capacity-bound; the ordering is sampler math
and is what must not regress.
"""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def trained(rng_module):
    import jax
    import jax.numpy as jnp
    import optax

    from clip_codec_tpu.diffusion import NoiseSchedule
    from clip_codec_tpu.models import CLIPCondUNet
    from clip_codec_tpu.train import DiffusionTrainConfig, make_train_step

    Z_DIM, BASE, T, SIZE, N = 16, 8, 100, 16, 6
    rng = np.random.default_rng(42)
    yy, xx = np.mgrid[0:SIZE, 0:SIZE] / SIZE
    imgs = []
    for _ in range(N):
        f = rng.uniform(1.0, 3.0, size=(3, 2))
        ph = rng.uniform(0, 2 * np.pi, size=(3, 2))
        imgs.append(np.stack(
            [np.sin(2 * np.pi * (f[c, 0] * xx + f[c, 1] * yy) + ph[c, 0]) for c in range(3)],
            axis=-1).astype(np.float32))
    x0 = np.stack(imgs)
    z = rng.standard_normal((N, Z_DIM)).astype(np.float32)
    z /= np.linalg.norm(z, axis=1, keepdims=True)

    net = CLIPCondUNet(z_dim=Z_DIM, base=BASE, ch_mult=(1, 2), img_ch=3)
    sched = NoiseSchedule.create(T, "cosine")
    tx = optax.adamw(2e-3)
    cfg = DiffusionTrainConfig(bf16=False, timesteps=T, recon_w=0.05, tv_w=1e-4)
    step = make_train_step(net, sched, tx, cfg)
    params = net.init(jax.random.PRNGKey(0), x0[:1], z[:1], jnp.zeros((1,), jnp.int32))["params"]
    opt_state = tx.init(params)
    w = np.ones(N, np.float32)
    key = jax.random.PRNGKey(1)
    for _ in range(600):
        key, sub = jax.random.split(key)
        params, opt_state, _ = step(params, opt_state, x0, z, w, sub, False)
    return net, sched, params, x0, z


@pytest.fixture(scope="module")
def rng_module():
    return np.random.default_rng(0)


def _psnr(trained, sampler, steps, standard=False):
    import jax
    import jax.numpy as jnp

    from clip_codec_tpu.diffusion import ddim_sample, dpmpp_sample
    from clip_codec_tpu.eval import metrics

    net, sched, params, x0, z = trained
    model_fn = lambda p, x, zz, t: net.apply({"params": p}, x, zz, t)
    if sampler == "ddim":
        out = ddim_sample(model_fn, sched, jnp.asarray(z), x0.shape, steps, 0.0,
                          jax.random.PRNGKey(0), model_params=params, standard=standard)
    else:
        out = dpmpp_sample(model_fn, sched, jnp.asarray(z), x0.shape, steps,
                           jax.random.PRNGKey(0), model_params=params)
    out = np.clip(np.asarray(out), -1, 1)
    return float(np.mean([metrics.psnr(x0[i], out[i]) for i in range(len(x0))]))


def test_knee_ordering(trained):
    """Pins the CROSS-REGIME facts (both knee tables, docs/performance.md):
    parity ddim loses >=1.5 dB to both alternatives and degrades with steps;
    textbook ddim_std converges up with steps. (ddim_std-vs-dpmpp ordering is
    regime-dependent — dpmpp wins on converged models, ddim_std on
    undertrained ones like this CI config — so it is NOT pinned here.)"""
    ddim10 = _psnr(trained, "ddim", 10)
    ddim50 = _psnr(trained, "ddim", 50)
    std10 = _psnr(trained, "ddim", 10, standard=True)
    std50 = _psnr(trained, "ddim", 50, standard=True)
    dpm15 = _psnr(trained, "dpmpp", 15)
    # Measured gaps: std50-ddim50 = +5.2 dB (CI) / +7.0 dB (knee scale).
    assert std50 > ddim50 + 1.5, (ddim50, std50)
    # dpmpp-15: +2.6 dB (CI) / +7.9 dB (knee scale) over ddim-50.
    assert dpm15 > ddim50 + 1.5, (ddim50, dpm15)
    # Step-axis shape: the parity flaw compounds per step; textbook converges.
    assert ddim50 < ddim10, (ddim10, ddim50)
    assert std50 > std10, (std10, std50)
