"""Dev benchmark (real TPU): full-scale SD-1.5 denoise step and VAE decode.

Random weights (throughput is weight-independent), params materialized
straight from eval_shape shapes (initializing 860M params through module.init
on a 1-core host takes minutes). Params are jit ARGUMENTS - the program body
stays small for remote-compile transports. Flash attention is auto-on for
TPU backends.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from clip_codec_tpu.models.sd import SD15_UNET, SD15_VAE, AutoencoderKL, SDUNet


def random_params_like(shapes_tree, seed=0):
    rng = np.random.default_rng(seed)
    return jax.tree_util.tree_map(
        lambda s: (rng.standard_normal(s.shape) * 0.02).astype(np.float32), shapes_tree
    )


def bench_unet(B=2, latent=64):
    unet = SDUNet(SD15_UNET, dtype=jnp.bfloat16)
    lat = jnp.zeros((B, latent, latent, 4), jnp.float32)
    t = jnp.zeros((B,), jnp.int32)
    ctx = jnp.zeros((B, 8, 768), jnp.float32)
    shapes = jax.eval_shape(unet.init, jax.random.PRNGKey(0), lat, t, ctx)["params"]
    params = jax.device_put(random_params_like(shapes))  # resident once; host
    # numpy params would re-upload 3.4GB over the transport on every call
    n_params = sum(np.prod(s.shape) for s in jax.tree_util.tree_leaves(shapes))
    print(f"[sd-unet] {n_params/1e6:.0f}M params, latents {latent}x{latent}, B={B}", flush=True)

    @jax.jit
    def fwd(p, lat, t, ctx):
        return unet.apply({"params": p}, lat, t, ctx)

    t0 = time.time()
    np.asarray(fwd(params, lat, t, ctx))
    print(f"[sd-unet] compile+first {time.time()-t0:.1f}s", flush=True)
    n = 10
    t0 = time.time()
    for _ in range(n):
        o = fwd(params, lat, t, ctx)
    np.asarray(o)
    dt = (time.time() - t0) / n
    # 30-step CFG sampling = 60 UNet forwards per image batch
    print(f"[sd-unet] {dt*1e3:.1f}ms/forward -> DDIM-30+CFG ~ {B/(dt*60):.2f} img/s", flush=True)


def bench_vae_decode(B=1, latent=64):
    vae = AutoencoderKL(SD15_VAE, dtype=jnp.bfloat16)
    z = jnp.zeros((B, latent, latent, 4), jnp.float32)
    shapes = jax.eval_shape(vae.init, jax.random.PRNGKey(0), jnp.zeros((B, latent * 8, latent * 8, 3)), jax.random.PRNGKey(1))["params"]
    params = jax.device_put(random_params_like(shapes))

    @jax.jit
    def dec(p, z):
        return vae.apply({"params": p}, z, method=AutoencoderKL.decode)

    t0 = time.time()
    np.asarray(dec(params, z))
    print(f"[sd-vae] decode compile+first {time.time()-t0:.1f}s", flush=True)
    n = 10
    t0 = time.time()
    for _ in range(n):
        o = dec(params, z)
    np.asarray(o)
    print(f"[sd-vae] decode {((time.time()-t0)/n)*1e3:.1f}ms/image-batch (B={B}, 512px out)", flush=True)


if __name__ == "__main__":
    bench_unet()
    bench_vae_decode()
