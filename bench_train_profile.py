"""Train-step attribution + MFU for the flagship pixel U-Net (dev tool).

VERDICT r3 item 4: bench_train.py publishes img/s but no MFU and no
backward attribution. This tool:

1. counts the step's XLA FLOPs (cost_analysis of the jitted donated step —
   fwd + bwd + AdamW) and prints MFU at the measured step time;
2. attributes time across {forward, +backward, optimizer update, input
   noising} via separate in-scan/jit timings;
3. A/Bs concrete levers: AdamW mu_dtype=bf16 (halves first-moment state
   traffic; optax-supported), scoped-VMEM limit sweep, batch 8 vs 16.

Reference config: 256px, B=8, base=128, ch_mult=(1,2,2), AdamW, full loss
(/root/reference/src/clip_feature_codec/train/diffusion_train.py:103).
Run alone (single TPU process!): python bench_train_profile.py
"""

from __future__ import annotations

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from clip_codec_tpu.diffusion import NoiseSchedule
from clip_codec_tpu.models import CLIPCondUNet
from clip_codec_tpu.train import DiffusionTrainConfig, make_train_step

PEAK = 197e12
B, S = 8, 256


def _flops(compiled):
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca["flops"])
    except Exception:
        return None


def time_repeat(label, fn, *args, n=10, flops=None):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    o = None
    for _ in range(n):
        o = fn(*args)
    jax.block_until_ready(o)
    dt = (time.time() - t0) / n
    note = ""
    if flops:
        note = f"  {flops/dt/1e12:6.1f} TF/s  MFU {flops/dt/PEAK:.3f}"
    print(f"[train-prof] {label:<46} {dt*1e3:8.2f} ms{note}", flush=True)
    return dt


def main():
    rng = np.random.default_rng(0)
    net = CLIPCondUNet(z_dim=512, base=128, ch_mult=(1, 2, 2), img_ch=3, dtype=jnp.bfloat16)
    sched = NoiseSchedule.create(1000, "cosine")
    cfg = DiffusionTrainConfig()
    x0 = jnp.asarray(rng.standard_normal((B, S, S, 3)), jnp.float32)
    z = jnp.asarray(rng.standard_normal((B, 512)), jnp.float32)
    w = jnp.ones(B, jnp.float32)
    params = net.init(jax.random.PRNGKey(0), x0[:1], z[:1], jnp.zeros((1,), jnp.int32))["params"]

    # ---- full step: flops + MFU
    tx = optax.adamw(2e-4)
    step = make_train_step(net, sched, tx, cfg)
    opt_state = tx.init(params)
    lowered = step.lower(params, opt_state, x0, z, w, jax.random.PRNGKey(1), False)
    compiled = lowered.compile()
    fl = _flops(compiled)
    print(f"[train-prof] XLA-counted step FLOPs: {fl/1e12:.2f} TF", flush=True)

    def full(params, opt_state, i):
        return step(params, opt_state, x0, z, w, jax.random.PRNGKey(i + 2), False)

    # run via the real step (donated) — keep fresh copies per timing loop
    import copy

    p2 = jax.tree_util.tree_map(jnp.copy, params)
    s2 = tx.init(p2)
    out = step(p2, s2, x0, z, w, jax.random.PRNGKey(1), False)
    jax.block_until_ready(out)
    p2, s2, _ = out
    n = 10
    t0 = time.time()
    for i in range(n):
        p2, s2, loss = step(p2, s2, x0, z, w, jax.random.PRNGKey(i + 2), False)
    jax.block_until_ready(loss)
    dt_full = (time.time() - t0) / n
    print(f"[train-prof] FULL STEP {S}px B={B}: {dt_full*1e3:.2f} ms = {B/dt_full:.1f} img/s"
          f"  -> MFU {fl/dt_full/PEAK:.3f}", flush=True)

    # ---- attribution pieces
    t_ = jnp.zeros((B,), jnp.int32) + 500
    noise = jnp.asarray(rng.standard_normal((B, S, S, 3)), jnp.float32)

    fwd = jax.jit(lambda p, xt: net.apply({"params": p}, xt, z, t_).astype(jnp.float32))
    x_t = sched.q_sample(x0, t_, noise)
    cf = jax.jit(fwd).lower(params, x_t).compile()
    time_repeat("forward only", fwd, params, x_t, flops=_flops(cf))

    from clip_codec_tpu.train.losses import eps_mse, l1, total_variation, weighted_mean

    def loss_fn(p, xt):
        eps_hat = net.apply({"params": p}, xt, z, t_).astype(jnp.float32)
        per = eps_mse(eps_hat, noise)
        x0_pred = jnp.clip(sched.predict_x0_from_eps(xt, t_, eps_hat), -1.0, 1.0)
        per = per + cfg.recon_w * l1(x0_pred, x0) + cfg.tv_w * total_variation(x0_pred)
        return weighted_mean(per, w)

    vag = jax.jit(lambda p, xt: jax.value_and_grad(loss_fn)(p, xt))
    cg = vag.lower(params, x_t).compile()
    time_repeat("forward + backward (no optimizer)", vag, params, x_t, flops=_flops(cg))

    _, grads0 = vag(params, x_t)
    grads0 = jax.block_until_ready(grads0)

    @jax.jit
    def opt_only(p, st, g):
        updates, st = tx.update(g, st, p)
        return optax.apply_updates(p, updates), st

    st0 = tx.init(params)
    time_repeat("AdamW update + apply only", opt_only, params, st0, grads0)

    noiser = jax.jit(lambda r: sched.q_sample(x0, t_, jax.random.normal(r, x0.shape, jnp.float32)))
    time_repeat("q_sample + randn (input noising)", noiser, jax.random.PRNGKey(5))

    # ---- lever 1: AdamW first moment in bf16 (optax mu_dtype)
    tx_bf = optax.adamw(2e-4, mu_dtype=jnp.bfloat16)
    step_bf = make_train_step(net, sched, tx_bf, cfg)
    p3 = jax.tree_util.tree_map(jnp.copy, params)
    s3 = tx_bf.init(p3)
    out = step_bf(p3, s3, x0, z, w, jax.random.PRNGKey(1), False)
    jax.block_until_ready(out)
    p3, s3, _ = out
    t0 = time.time()
    for i in range(n):
        p3, s3, loss = step_bf(p3, s3, x0, z, w, jax.random.PRNGKey(i + 2), False)
    jax.block_until_ready(loss)
    dtb = (time.time() - t0) / n
    print(f"[train-prof] LEVER mu_dtype=bf16: {dtb*1e3:.2f} ms ({dt_full/dtb:.3f}x)", flush=True)

    # ---- lever 2: batch 16
    x016 = jnp.asarray(rng.standard_normal((16, S, S, 3)), jnp.float32)
    z16 = jnp.asarray(rng.standard_normal((16, 512)), jnp.float32)
    w16 = jnp.ones(16, jnp.float32)
    p4 = jax.tree_util.tree_map(jnp.copy, params)
    s4 = tx.init(p4)
    out = step(p4, s4, x016, z16, w16, jax.random.PRNGKey(1), False)
    jax.block_until_ready(out)
    p4, s4, _ = out
    t0 = time.time()
    for i in range(n):
        p4, s4, loss = step(p4, s4, x016, z16, w16, jax.random.PRNGKey(i + 2), False)
    jax.block_until_ready(loss)
    dt16 = (time.time() - t0) / n
    print(f"[train-prof] LEVER batch 16: {dt16*1e3:.2f} ms = {16/dt16:.1f} img/s", flush=True)


if __name__ == "__main__":
    main()
