"""Pin the SD-path sampler knee ordering (VERDICT r4 item 4).

Same protocol as ``scripts/sd_knee.py`` (whose full sweep is recorded in
docs/performance.md "SD-path sampler knee"), fewer points and fewer train
steps so it fits the CPU suite budget: train the tiny-SD adapter fixture
(frozen-random tiny UNet/VAE + trainable adapter — the SD path trains only
the adapter by design, reference ``train/sd_diffusion_train.py:152``),
reconstruct the training images from their embeddings via CFG sampling, and
assert the robust measured facts:

- dpmpp-5 reaches ddim-30-class quality (PSNR within 0.3 dB) at 1/6 the
  UNet evaluations — the claim in ``cli/reconstruct_sd_diffusion.py``;
- dpmpp-10's SSIM is not worse than ddim-30's by more than 0.01 (the full
  sweep measures it strictly better);
- every sampler's output is finite and usefully reconstructive (>5 dB).
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from clip_codec_tpu.eval import metrics
from clip_codec_tpu.models.sd import AutoencoderKL, SDUNet, StableDiffusionDecoder
from clip_codec_tpu.train.sd_diffusion_train import SDTrainConfig, make_sd_train_step
from tests.test_sd import TINY_UNET, TINY_VAE

N, D, SIZE = 4, 32, 16
TRAIN_STEPS = 300


@pytest.fixture(scope="module")
def trained():
    vae = AutoencoderKL(TINY_VAE)
    unet = SDUNet(TINY_UNET)
    x0s = jnp.zeros((1, SIZE, SIZE, 3))
    vae_params = vae.init(jax.random.PRNGKey(0), x0s, jax.random.PRNGKey(1))["params"]
    lat0 = jnp.zeros((1, SIZE // 2, SIZE // 2, 4))
    ctx0 = jnp.zeros((1, 8, 16))
    unet_params = unet.init(jax.random.PRNGKey(2), lat0, jnp.zeros((1,), jnp.int32), ctx0)["params"]
    dec = StableDiffusionDecoder(
        vae_params, unet_params, clip_dim=D, n_tokens=8,
        unet_cfg=TINY_UNET, vae_cfg=TINY_VAE, dtype=jnp.float32,
    )

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
    z = rng.standard_normal((N, D)).astype(np.float32)
    z /= np.linalg.norm(z, axis=1, keepdims=True)
    lat = np.asarray(dec.encode(jnp.asarray(x0), jax.random.PRNGKey(3)))

    cfg = SDTrainConfig(timesteps=1000, out_size=SIZE)
    tx = optax.adamw(2e-3)
    step = make_sd_train_step(dec, tx, cfg)
    a_params = dec.adapter_params
    opt = tx.init(a_params)
    frozen = {"unet": unet_params, "vae": vae_params}
    w = np.ones(N, np.float32)
    key = jax.random.PRNGKey(1)
    for _ in range(TRAIN_STEPS):
        key, sub = jax.random.split(key)
        a_params, opt, loss = step(a_params, opt, frozen, jnp.asarray(z),
                                   jnp.asarray(lat), jnp.asarray(x0), w, sub, False)
    assert np.isfinite(float(loss))
    dec.adapter_params = a_params
    return dec, x0, z


def _score(dec, x0, z, sampler, steps):
    shape = (N, SIZE // 2, SIZE // 2, 4)
    out = dec.sample(jnp.asarray(z), shape, steps=steps, guidance_scale=5.0,
                     sampler=sampler, rng=jax.random.PRNGKey(0))
    out = np.asarray(out)
    assert np.isfinite(out).all(), (sampler, steps)
    out = np.clip(out, -1, 1)
    ps = float(np.mean([metrics.psnr(x0[i], out[i]) for i in range(N)]))
    ss = float(np.mean([metrics.ssim(x0[i], out[i]) for i in range(N)]))
    return ps, ss


def test_sd_knee_dpmpp_matches_ddim30_at_sixth_evals(trained):
    dec, x0, z = trained
    ddim30 = _score(dec, x0, z, "ddim", 30)
    dpm5 = _score(dec, x0, z, "dpmpp", 5)
    dpm10 = _score(dec, x0, z, "dpmpp", 10)
    for name, (ps, _) in (("ddim30", ddim30), ("dpm5", dpm5), ("dpm10", dpm10)):
        assert ps > 5.0, (name, ps)
    # the CLI's "DDIM-30-class quality at ~half the evals" claim, measured
    # on the SD path itself (full sweep: dpmpp-5 strictly better on both)
    assert dpm5[0] > ddim30[0] - 0.3, (dpm5, ddim30)
    assert dpm10[1] > ddim30[1] - 0.01, (dpm10, ddim30)
