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


def bench_unet(B=2, latent=64, params=None, shapes=None, quiet_load=False, int8=False,
               static_quant=False):
    """Per-forward device time via two on-device scan lengths (one dispatch
    per measurement, scalar output) — standalone per-call timing over the
    axon tunnel is dispatch-bound (~35-90ms/call) and meaningless.

    ``int8=True`` serves the FLOP-dominant interior (transformer Dense
    projections + GEGLU + resnet/up/down convs) on the int8 MXU — same
    checkpoint, dynamic per-tensor activation scales."""
    unet = SDUNet(SD15_UNET, dtype=jnp.bfloat16, int8=int8)
    lat = jnp.zeros((B, latent, latent, 4), jnp.float32)
    t = jnp.zeros((B,), jnp.int32)
    ctx = jnp.zeros((B, 8, 768), jnp.float32)
    if params is None:
        shapes = jax.eval_shape(unet.init, jax.random.PRNGKey(0), lat, t, ctx)["params"]
        params = jax.device_put(random_params_like(shapes))  # resident once; host
        # numpy params would re-upload 3.4GB over the transport on every call
    if not quiet_load:
        n_params = sum(np.prod(s.shape) for s in jax.tree_util.tree_leaves(shapes))
        mode = " int8" if int8 else ""
        print(f"[sd-unet{mode}] {n_params/1e6:.0f}M params, latents {latent}x{latent}", flush=True)

    quant = None
    if int8 and static_quant:
        # one fp pass with mutable=['quant'] records per-layer activation
        # absmax; the static path then skips every dynamic absmax reduction
        t0 = time.time()
        _, upd = unet.apply(
            {"params": params}, lat, t, ctx, mutable=["quant"]
        )
        quant = jax.device_put(jax.tree_util.tree_map(np.asarray, upd["quant"]))
        print(f"[sd-unet int8] static calibration pass {time.time()-t0:.1f}s", flush=True)

    from functools import partial

    @partial(jax.jit, static_argnames=("k",))
    def run(p, q, lat, t, ctx, k):
        v = {"params": p} if q is None else {"params": p, "quant": q}
        def step(c, _):
            # eps feeds back as the next latent: keeps the loop un-hoistable
            return unet.apply(v, c, t, ctx).astype(c.dtype), None

        out, _ = jax.lax.scan(step, lat, None, length=k)
        return jnp.mean(out.astype(jnp.float32))

    ts, fl = {}, {}
    for k in (K1, K2):
        lc = run.lower(params, quant, lat, t, ctx, k=k).compile()
        fl[k] = _flops(lc)
        t0 = time.time()
        assert np.isfinite(float(run(params, quant, lat, t, ctx, k=k)))
        first = time.time() - t0
        t0 = time.time()
        float(run(params, quant, lat, t, ctx, k=k))
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
    mode = (" int8-static" if static_quant else " int8") if int8 else ""
    print(
        f"[sd-unet{mode}] B={B}: {dt*1e3:.1f}ms/forward on device ({dt/B*1e3:.1f}ms/img,"
        f" MFU {mfu:.3f}) -> DDIM-30+CFG ~ {B/(dt*60):.2f} img/s",
        flush=True,
    )
    return params, shapes


def bench_unet_int8_error(B=2, latent=64, params=None):
    """Per-forward eps relative error of the int8 SD UNet vs bf16 on
    noise-scale inputs (the serving-mode quality number for this path)."""
    rng = np.random.default_rng(0)
    lat = jnp.asarray(rng.standard_normal((B, latent, latent, 4)), jnp.float32)
    t = jnp.full((B,), 500, jnp.int32)
    ctx = jnp.asarray(rng.standard_normal((B, 8, 768)) * 0.1, jnp.float32)
    if params is None:
        shapes = jax.eval_shape(
            SDUNet(SD15_UNET).init, jax.random.PRNGKey(0), lat, t, ctx
        )["params"]
        params = jax.device_put(random_params_like(shapes))

    @jax.jit
    def err(p, lat, t, ctx):
        y_fp = SDUNet(SD15_UNET, dtype=jnp.bfloat16, int8=False).apply(
            {"params": p}, lat, t, ctx
        ).astype(jnp.float32)
        y_q = SDUNet(SD15_UNET, dtype=jnp.bfloat16, int8=True).apply(
            {"params": p}, lat, t, ctx
        ).astype(jnp.float32)
        return jnp.linalg.norm(y_q - y_fp) / jnp.linalg.norm(y_fp)

    rel = float(err(params, lat, t, ctx))
    print(f"[sd-unet int8] per-forward eps relative error vs bf16: {rel*100:.2f}%", flush=True)
    return rel


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


def bench_e2e_sample(B=8, latent=64, steps=30, int8=False, static_quant=False,
                     sampler="ddim"):
    """PRODUCT end-to-end SD serving: StableDiffusionDecoder.sample (CFG
    DDIM + VAE decode as one jitted program, params as arguments) at full
    SD-1.5 scale. Timing via repeat-dispatch + one-scalar fetch (the honest
    device barrier over the axon tunnel)."""
    from clip_codec_tpu.models.sd import SD15_VAE, StableDiffusionDecoder
    from clip_codec_tpu.models.sd.vae import AutoencoderKL

    unet = SDUNet(SD15_UNET, dtype=jnp.bfloat16)
    vae = AutoencoderKL(SD15_VAE, dtype=jnp.bfloat16)
    u_shapes = jax.eval_shape(
        unet.init, jax.random.PRNGKey(0), jnp.zeros((1, latent, latent, 4)),
        jnp.zeros((1,), jnp.int32), jnp.zeros((1, 8, 768)),
    )["params"]
    v_shapes = jax.eval_shape(
        vae.init, jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), jax.random.PRNGKey(1)
    )["params"]
    dec = StableDiffusionDecoder(
        jax.device_put(random_params_like(v_shapes, seed=1)),
        jax.device_put(random_params_like(u_shapes)),
        clip_dim=512, n_tokens=8, int8=True if int8 else None,
    )
    z = jnp.zeros((B, 512), jnp.float32)
    shape = (B, latent, latent, 4)
    mode = (" int8-static" if static_quant else " int8") if int8 else ""
    if int8 and static_quant:
        t0 = time.time()
        dec.calibrate_int8_scales(z, shape)
        print(f"[sd-e2e{mode}] calibration {time.time()-t0:.1f}s", flush=True)

    t0 = time.time()
    out = dec.sample(z, shape, steps=steps, guidance_scale=5.0,
                     rng=jax.random.PRNGKey(0), sampler=sampler)
    assert np.isfinite(float(out[0, 0, 0, 0]))
    print(f"[sd-e2e{mode}] compile+first {time.time()-t0:.1f}s", flush=True)
    n = 3
    t0 = time.time()
    for i in range(n):
        out = dec.sample(z, shape, steps=steps, guidance_scale=5.0,
                         rng=jax.random.PRNGKey(i + 1), sampler=sampler)
    float(out[0, 0, 0, 0])  # one-scalar completion barrier
    dt = (time.time() - t0) / n
    print(
        f"[sd-e2e{mode}] {sampler.upper()}-{steps}+CFG 512px B={B}: {dt:.2f}s/batch = "
        f"{B/dt:.2f} img/s (incl. VAE decode)",
        flush=True,
    )


def bench_adapter_train_product(B=4, latent=64, steps=20):
    """The PRODUCT SD adapter train step (train.sd_diffusion_train.
    make_sd_train_step) at full SD-1.5 scale: frozen 860M UNet + VAE as jit
    ARGUMENTS, eps-MSE-only config (recon/tv/dino/lpips off) so the number
    is comparable to the scan-based bench below. Per-step time from N
    back-to-back dispatches with a single end barrier (the tunnel pipelines
    async dispatches against the ~130ms device step)."""
    import optax

    from clip_codec_tpu.models.sd import SD15_VAE, StableDiffusionDecoder
    from clip_codec_tpu.models.sd.vae import AutoencoderKL
    from clip_codec_tpu.train.sd_diffusion_train import SDTrainConfig, make_sd_train_step

    unet = SDUNet(SD15_UNET, dtype=jnp.bfloat16)
    z = jnp.zeros((B, 512), jnp.float32)
    lat0 = jnp.zeros((B, latent, latent, 4), jnp.float32)
    gt = jnp.zeros((B, 8, 8, 3), jnp.float32)  # unused with recon/tv/dino/lpips off
    w = jnp.ones((B,), jnp.float32)
    t = jnp.zeros((B,), jnp.int32)

    u_shapes = None
    from clip_codec_tpu.models.sd import SDClipAdapter

    adapter = SDClipAdapter(n_tokens=8)
    a_shapes = jax.eval_shape(adapter.init, jax.random.PRNGKey(0), z)["params"]
    ctx_shape = jax.eval_shape(lambda p, z: adapter.apply({"params": p}, z), a_shapes, z)
    u_shapes = jax.eval_shape(
        unet.init, jax.random.PRNGKey(0), lat0, t, jnp.zeros(ctx_shape.shape, jnp.float32)
    )["params"]
    vae = AutoencoderKL(SD15_VAE, dtype=jnp.bfloat16)
    v_shapes = jax.eval_shape(
        vae.init, jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), jax.random.PRNGKey(1)
    )["params"]
    a_params = jax.device_put(random_params_like(a_shapes))
    frozen = {
        "unet": jax.device_put(random_params_like(u_shapes)),
        "vae": jax.device_put(random_params_like(v_shapes, seed=1)),
    }
    dec = StableDiffusionDecoder(
        frozen["vae"], frozen["unet"], adapter_params=a_params, clip_dim=512, n_tokens=8,
    )
    cfg = SDTrainConfig(recon_w=0.0, tv_w=0.0, clip_w=0.0, perc_w=0.0)
    tx = optax.adamw(1e-4)
    opt_state = jax.device_put(tx.init(jax.tree_util.tree_map(np.asarray, a_params)))
    step = make_sd_train_step(dec, tx, cfg)

    rngs = jax.random.split(jax.random.PRNGKey(0), steps + 2)
    t0 = time.time()
    a_params, opt_state, loss = step(a_params, opt_state, frozen, z, lat0, gt, w, rngs[0], perc_on=False)
    assert np.isfinite(float(loss))
    print(f"[sd-train product] compile+first {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    for i in range(steps):
        a_params, opt_state, loss = step(a_params, opt_state, frozen, z, lat0, gt, w, rngs[i + 1], perc_on=False)
    assert np.isfinite(float(loss))  # end barrier
    dt = (time.time() - t0) / steps
    print(
        f"[sd-train product] make_sd_train_step (eps-MSE, frozen 860M UNet as jit arg, "
        f"B={B}): {dt*1e3:.1f} ms/step incl. dispatch = {B/dt:.1f} img/s",
        flush=True,
    )


def bench_adapter_train(B=4, latent=64):
    """One SD adapter train step (eps-MSE, the dominant term): adapter fwd +
    frozen-UNet fwd + backprop through the UNet to the adapter + AdamW.
    Reference recipe batch is 4 (train/sd_diffusion_train.py:344-357)."""
    import optax

    from clip_codec_tpu.models.sd import SDClipAdapter

    unet = SDUNet(SD15_UNET, dtype=jnp.bfloat16)
    adapter = SDClipAdapter(n_tokens=8)
    z = jnp.zeros((B, 512), jnp.float32)
    lat0 = jnp.zeros((B, latent, latent, 4), jnp.float32)
    t = jnp.zeros((B,), jnp.int32)

    a_shapes = jax.eval_shape(adapter.init, jax.random.PRNGKey(0), z)["params"]
    a_params = jax.device_put(random_params_like(a_shapes))
    ctx_shape = jax.eval_shape(lambda p, z: adapter.apply({"params": p}, z), a_shapes, z)
    u_shapes = jax.eval_shape(
        unet.init, jax.random.PRNGKey(0), lat0, t, jnp.zeros(ctx_shape.shape, jnp.float32)
    )["params"]
    u_params = jax.device_put(random_params_like(u_shapes))
    tx = optax.adamw(1e-4)
    opt_state = jax.device_put(tx.init(jax.tree_util.tree_map(np.asarray, a_params)))

    def loss_fn(ap, up, noise):
        cond = adapter.apply({"params": ap}, z)
        eps_hat = unet.apply({"params": up}, lat0 + noise, t, cond).astype(jnp.float32)
        return jnp.mean((eps_hat - noise) ** 2)

    from functools import partial

    # UNet params are a jit ARGUMENT, never a closure constant: 3.4GB of
    # captured constants would exceed the remote-compile body limit.
    @partial(jax.jit, static_argnames=("k",))
    def run(ap, up, opt_state, k):
        def step(carry, i):
            ap, opt_state = carry
            noise = jax.random.normal(jax.random.PRNGKey(0), lat0.shape) * (i + 1.0)
            loss, grads = jax.value_and_grad(loss_fn)(ap, up, noise)
            updates, opt_state = tx.update(grads, opt_state, ap)
            return (optax.apply_updates(ap, updates), opt_state), loss

        (ap, opt_state), losses = jax.lax.scan(step, (ap, opt_state), jnp.arange(k, dtype=jnp.float32))
        return jnp.mean(losses)

    ts = {}
    for k in (K1, K2):
        assert np.isfinite(float(run(a_params, u_params, opt_state, k=k)))
        t0 = time.time()
        float(run(a_params, u_params, opt_state, k=k))
        ts[k] = time.time() - t0
    dt = (ts[K2] - ts[K1]) / (K2 - K1)
    print(
        f"[sd-train] adapter step (eps-MSE, frozen 860M UNet, B={B}): "
        f"{dt*1e3:.1f} ms/step on device = {B/dt:.1f} img/s",
        flush=True,
    )


if __name__ == "__main__":
    import sys

    if "train" in sys.argv[1:]:
        bench_adapter_train()
        bench_adapter_train_product()
        sys.exit(0)
    if "e2e" in sys.argv[1:]:
        sampler = "dpmpp" if "dpmpp" in sys.argv[1:] else "ddim"
        steps = next((int(a[6:]) for a in sys.argv[1:] if a.startswith("steps=")),
                     15 if sampler == "dpmpp" else 30)
        batches = [int(b) for b in sys.argv[1:] if b.isdigit()] or [8]
        for B in batches:
            if "int8static" in sys.argv[1:]:
                bench_e2e_sample(B=B, int8=True, static_quant=True,
                                 sampler=sampler, steps=steps)
            else:
                bench_e2e_sample(B=B, int8=False, sampler=sampler, steps=steps)
                if "bf16" not in sys.argv[1:]:
                    bench_e2e_sample(B=B, int8=True, sampler=sampler, steps=steps)
        sys.exit(0)
    if "int8" in sys.argv[1:] or "int8static" in sys.argv[1:]:
        static = "int8static" in sys.argv[1:]
        batches = [int(b) for b in sys.argv[1:] if b.isdigit()] or [1, 8]
        params = shapes = None
        for B in batches:
            params, shapes = bench_unet(B, params=params, shapes=shapes,
                                        quiet_load=params is not None, int8=True,
                                        static_quant=static)
        bench_unet_int8_error(params=params)
        sys.exit(0)
    batches = [int(b) for b in sys.argv[1:]] or [1, 2, 4, 8]
    params = shapes = None
    for B in batches:
        params, shapes = bench_unet(B, params=params, shapes=shapes, quiet_load=params is not None)
    bench_vae_decode()
