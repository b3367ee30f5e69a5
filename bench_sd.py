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


PEAK_BF16 = 197e12  # v5e datasheet; MFU is vs this when on a v5e
K1, K2 = 2, 12  # scan lengths; per-forward = (T(K2)-T(K1))/(K2-K1)


def _flops(lowered_compiled) -> float | None:
    try:
        ca = lowered_compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca["flops"])
    except Exception:
        return None


def bench_unet(B=2, latent=64, params=None, shapes=None, quiet_load=False):
    """Per-forward device time via two on-device scan lengths (one dispatch
    per measurement, scalar output) — standalone per-call timing over the
    axon tunnel is dispatch-bound (~35-90ms/call) and meaningless."""
    unet = SDUNet(SD15_UNET, dtype=jnp.bfloat16)
    lat = jnp.zeros((B, latent, latent, 4), jnp.float32)
    t = jnp.zeros((B,), jnp.int32)
    ctx = jnp.zeros((B, 8, 768), jnp.float32)
    if params is None:
        shapes = jax.eval_shape(unet.init, jax.random.PRNGKey(0), lat, t, ctx)["params"]
        params = jax.device_put(random_params_like(shapes))  # resident once; host
        # numpy params would re-upload 3.4GB over the transport on every call
    if not quiet_load:
        n_params = sum(np.prod(s.shape) for s in jax.tree_util.tree_leaves(shapes))
        print(f"[sd-unet] {n_params/1e6:.0f}M params, latents {latent}x{latent}", flush=True)

    from functools import partial

    @partial(jax.jit, static_argnames=("k",))
    def run(p, lat, t, ctx, k):
        def step(c, _):
            # eps feeds back as the next latent: keeps the loop un-hoistable
            return unet.apply({"params": p}, c, t, ctx).astype(c.dtype), None

        out, _ = jax.lax.scan(step, lat, None, length=k)
        return jnp.mean(out.astype(jnp.float32))

    ts, fl = {}, {}
    for k in (K1, K2):
        lc = run.lower(params, lat, t, ctx, k=k).compile()
        fl[k] = _flops(lc)
        t0 = time.time()
        assert np.isfinite(float(run(params, lat, t, ctx, k=k)))
        first = time.time() - t0
        t0 = time.time()
        float(run(params, lat, t, ctx, k=k))
        ts[k] = time.time() - t0
    dt = (ts[K2] - ts[K1]) / (K2 - K1)
    # XLA's cost analysis counts a while-loop body ONCE regardless of trip
    # count (measured: identical flops at k=2 and k=12), so fl[k] IS the
    # per-forward count; the difference quotient is kept as a fallback for
    # backends that do multiply it out.
    if fl[K1] and fl[K2]:
        flops = fl[K2] if fl[K2] == fl[K1] else (fl[K2] - fl[K1]) / (K2 - K1)
    else:
        flops = None
    mfu = flops / dt / PEAK_BF16 if flops else float("nan")
    # 30-step CFG sampling = 60 UNet forwards per image batch
    print(
        f"[sd-unet] B={B}: {dt*1e3:.1f}ms/forward on device ({dt/B*1e3:.1f}ms/img,"
        f" MFU {mfu:.3f}) -> DDIM-30+CFG ~ {B/(dt*60):.2f} img/s",
        flush=True,
    )
    return params, shapes


def bench_vae_decode(B=1, latent=64):
    vae = AutoencoderKL(SD15_VAE, dtype=jnp.bfloat16)
    z = jnp.zeros((B, latent, latent, 4), jnp.float32)
    shapes = jax.eval_shape(vae.init, jax.random.PRNGKey(0), jnp.zeros((B, latent * 8, latent * 8, 3)), jax.random.PRNGKey(1))["params"]
    params = jax.device_put(random_params_like(shapes))

    from functools import partial

    @partial(jax.jit, static_argnames=("k",))
    def run(p, z, k):
        def step(c, _):
            out = vae.apply({"params": p}, c, method=AutoencoderKL.decode)
            # perturb the carry so the loop body can't be hoisted/CSE'd
            return c + jnp.mean(out).astype(c.dtype) * 1e-6, jnp.mean(out)

        _, outs = jax.lax.scan(step, z, None, length=k)
        return jnp.mean(outs.astype(jnp.float32))

    ts = {}
    for k in (K1, K2):
        t0 = time.time()
        assert np.isfinite(float(run(params, z, k=k)))
        print(f"[sd-vae] k={k} compile+first {time.time()-t0:.1f}s", flush=True)
        t0 = time.time()
        float(run(params, z, k=k))
        ts[k] = time.time() - t0
    dt = (ts[K2] - ts[K1]) / (K2 - K1)
    print(f"[sd-vae] decode {dt*1e3:.1f}ms/image-batch on device (B={B}, 512px out)", flush=True)


if __name__ == "__main__":
    import sys

    batches = [int(b) for b in sys.argv[1:]] or [1, 2, 4, 8]
    params = shapes = None
    for B in batches:
        params, shapes = bench_unet(B, params=params, shapes=shapes, quiet_load=params is not None)
    bench_vae_decode()
