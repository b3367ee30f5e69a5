"""Dev benchmark (real TPU): flagship train-step and CLIP-encode throughput.

Not run by the driver (bench.py owns the headline metric); numbers recorded
in PARITY.md. Train config = the reference's max trainable config on a 24GB
A100 (256px, batch 8, base=128 — README.md:75); encode = ViT-B/32 bf16 at
batch 64 (cli/encode_images.py defaults), random weights (throughput is
weight-independent).
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from clip_codec_tpu.diffusion import NoiseSchedule
from clip_codec_tpu.encoders.clip import CLIPModel, VIT_B_32
from clip_codec_tpu.models import CLIPCondUNet
from clip_codec_tpu.train import DiffusionTrainConfig, make_train_step


def bench_train(B=8, S=256):
    rng = np.random.default_rng(0)
    net = CLIPCondUNet(z_dim=512, base=128, ch_mult=(1, 2, 2), img_ch=3, dtype=jnp.bfloat16)
    sched = NoiseSchedule.create(1000, "cosine")
    tx = optax.adamw(2e-4)
    cfg = DiffusionTrainConfig()
    step_fn = make_train_step(net, sched, tx, cfg)

    x0 = jnp.asarray(rng.standard_normal((B, S, S, 3)), jnp.float32)
    z = jnp.asarray(rng.standard_normal((B, 512)), jnp.float32)
    w = jnp.ones(B, jnp.float32)
    params = net.init(jax.random.PRNGKey(0), x0[:1], z[:1], jnp.zeros((1,), jnp.int32))["params"]
    opt_state = tx.init(params)

    t0 = time.time()
    params, opt_state, loss = step_fn(params, opt_state, x0, z, w, jax.random.PRNGKey(1), False)
    jax.block_until_ready(loss)
    print(f"[train {S}px B={B}] compile+first {time.time()-t0:.1f}s", flush=True)
    n = 10
    t0 = time.time()
    for i in range(n):
        params, opt_state, loss = step_fn(params, opt_state, x0, z, w, jax.random.PRNGKey(i + 2), False)
    jax.block_until_ready(loss)
    dt = (time.time() - t0) / n
    print(f"[train {S}px B={B}] {dt*1e3:.1f}ms/step -> {B/dt:.1f} imgs/s, loss={float(loss):.3f}", flush=True)


def bench_encode(B=64):
    rng = np.random.default_rng(0)
    model = CLIPModel(VIT_B_32, dtype=jnp.bfloat16)
    x = jnp.asarray(rng.standard_normal((B, 224, 224, 3)), jnp.float32)
    # eager init (jitted init would ship all params as program constants and
    # overflow remote-compile body limits); params passed as a jit ARGUMENT.
    params = model.init(jax.random.PRNGKey(0), x[:1], jnp.zeros((1, 77), jnp.int32))

    @jax.jit
    def embed_p(params, x):
        zz = model.apply(params, x, method=CLIPModel.encode_image).astype(jnp.float32)
        return zz / jnp.linalg.norm(zz, axis=-1, keepdims=True)

    embed = lambda x: embed_p(params, x)

    t0 = time.time()
    embed(x).block_until_ready()
    print(f"[encode B={B}] compile+first {time.time()-t0:.1f}s", flush=True)
    n = 20
    t0 = time.time()
    for _ in range(n):
        out = embed(x)
    out.block_until_ready()
    dt = (time.time() - t0) / n
    print(f"[encode B={B}] {dt*1e3:.1f}ms/batch -> {B/dt:.0f} imgs/s", flush=True)


if __name__ == "__main__":
    bench_train()
    bench_encode()
