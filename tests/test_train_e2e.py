"""Minimum end-to-end slice (SURVEY.md §7 stage 4): synthetic store ->
train tiny CLIPCondUNet -> DDIM reconstruct -> sanity metrics. All CPU, tiny.
"""

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from clip_codec_tpu.codecs.quantizer import fit_affine, quantize
from clip_codec_tpu.diffusion import DDIMSampler, NoiseSchedule
from clip_codec_tpu.io.store import write_store
from clip_codec_tpu.models import CLIPCondUNet
from clip_codec_tpu.train import DiffusionTrainConfig, train_diffusion
from clip_codec_tpu.train.train_decoder import decode_embedding
from clip_codec_tpu.utils.checkpoint import load_params


@pytest.fixture
def tiny_store(tmp_path, rng):
    """8 synthetic 16x16 images + random 'CLIP' vectors, as a real store."""
    n, d, size = 8, 32, 16
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    paths = []
    for i in range(n):
        arr = rng.integers(0, 256, size=(size, size, 3), dtype=np.uint8)
        p = img_dir / f"im{i}.png"
        Image.fromarray(arr).save(p)
        paths.append(str(p))
    feats = rng.standard_normal((n, d)).astype(np.float32)
    feats /= np.linalg.norm(feats, axis=1, keepdims=True)
    scale, zero = fit_affine(feats)
    q = np.asarray(quantize(feats, scale, zero))
    store = tmp_path / "store"
    write_store(store, feats, paths, np.asarray(scale), np.asarray(zero), q)
    return store


def test_train_reconstruct_roundtrip(tiny_store, tmp_path):
    cfg = DiffusionTrainConfig(
        out_size=16, epochs=2, batch_size=4, lr=1e-3, timesteps=100,
        base=8, ch_mult=(1, 2), bf16=False, seed=0,
    )
    ckpt = train_diffusion(tiny_store, config=cfg, save_dir=tmp_path / "ckpt")
    assert ckpt.exists()
    assert (tmp_path / "ckpt" / "diffusion_unet_ep1.msgpack").exists()
    assert (tmp_path / "ckpt" / "diffusion_unet_ep2.msgpack").exists()

    # Reconstruct from an actual .clp bitstream with the trained weights.
    params = load_params(ckpt)
    z = jnp.asarray(decode_embedding(tiny_store / "im0.clp", tiny_store))
    net = CLIPCondUNet(z_dim=32, base=8, ch_mult=(1, 2), img_ch=3)
    sched = NoiseSchedule.create(100, "cosine")
    img = DDIMSampler(sched).sample(
        lambda x, zz, t: net.apply({"params": params}, x, zz, t),
        z, (1, 16, 16, 3), steps=10, rng=jax.random.PRNGKey(0),
    )
    assert img.shape == (1, 16, 16, 3)
    assert bool(jnp.isfinite(img).all())


def test_u8_pipeline_bit_identical_to_fp32(rng):
    """The uint8 transfer pipeline (raw uint8 over the link, scale_m11_u8 on
    device) is bit-identical to the host-scaled fp32 path: the on-device
    scale reproduces numpy's fp32 math exactly (true divide, not XLA's
    1-ulp-off reciprocal rewrite), and the train step then runs the SAME
    program on bit-equal inputs — loss and params bit-equal."""
    import optax

    from clip_codec_tpu.train.data import scale_m11_u8
    from clip_codec_tpu.train.diffusion_train import make_train_step

    u8 = rng.integers(0, 256, (4, 16, 16, 3), dtype=np.uint8)
    f32 = u8.astype(np.float32) / 127.5 - 1.0
    scaled = scale_m11_u8(jnp.asarray(u8))
    np.testing.assert_array_equal(f32, np.asarray(scaled))  # bit-exact scale
    assert scale_m11_u8(jnp.asarray(f32)) is not None  # float passthrough

    net = CLIPCondUNet(z_dim=8, base=8, ch_mult=(1, 2), img_ch=3, dtype=jnp.float32)
    sched = NoiseSchedule.create(timesteps=50)
    tx = optax.adamw(1e-3)
    step = make_train_step(net, sched, tx, DiffusionTrainConfig(bf16=False))
    z = rng.standard_normal((4, 8)).astype(np.float32)
    w = np.ones((4,), np.float32)
    key = jax.random.PRNGKey(0)
    params = net.init(jax.random.PRNGKey(1), jnp.zeros((1, 16, 16, 3)),
                      jnp.zeros((1, 8)), jnp.zeros((1,), jnp.int32))["params"]

    def run(x0):
        p = jax.tree_util.tree_map(lambda a: jnp.array(a, copy=True), params)
        opt = tx.init(p)
        p2, _, loss = step(p, opt, x0, jnp.asarray(z), jnp.asarray(w),
                           key, False, None)
        return float(loss), jax.tree_util.tree_map(np.asarray, p2)

    loss_a, pa = run(jnp.asarray(f32))
    loss_b, pb = run(scaled)
    assert loss_a == loss_b
    jax.tree_util.tree_map(np.testing.assert_array_equal, pa, pb)


def test_training_reduces_loss(tiny_store, tmp_path, capsys):
    # 6 epochs on 8 images: the eps-MSE should clearly drop from epoch 1 to 6.
    cfg = DiffusionTrainConfig(
        out_size=16, epochs=6, batch_size=8, lr=2e-3, timesteps=100,
        base=8, ch_mult=(1, 2), bf16=False, recon_w=0.0, tv_w=0.0, clip_w=0.0, seed=1,
    )
    train_diffusion(tiny_store, config=cfg, save_dir=tmp_path / "ck2")
    out = capsys.readouterr().out
    losses = [float(line.split("loss=")[1].split()[0]) for line in out.splitlines() if "loss=" in line]
    assert len(losses) == 6
    assert losses[-1] < losses[0] * 0.9, f"no learning signal: {losses}"


def test_padded_tail_batch_weighting(tiny_store, tmp_path):
    # batch_size=5 over 8 samples -> tail batch of 3 padded to 5; must not crash
    # and must produce exactly one compile (fixed shapes).
    cfg = DiffusionTrainConfig(
        out_size=16, epochs=1, batch_size=5, lr=1e-3, timesteps=50,
        base=8, ch_mult=(1, 2), bf16=False, seed=2,
    )
    ckpt = train_diffusion(tiny_store, config=cfg, save_dir=tmp_path / "ck3")
    assert ckpt.exists()


def test_resume_from_orbax(tiny_store, tmp_path):
    """Interrupt after 2 epochs, resume=True continues from epoch 2 with
    optimizer state intact (the restart path the reference lacks)."""
    save = tmp_path / "ckr"
    cfg2 = DiffusionTrainConfig(out_size=16, epochs=2, batch_size=8, lr=1e-3,
                                timesteps=50, base=8, ch_mult=(1, 2), bf16=False, seed=3)
    train_diffusion(tiny_store, config=cfg2, save_dir=save)
    assert (save / "orbax").exists()

    cfg4 = DiffusionTrainConfig(out_size=16, epochs=4, batch_size=8, lr=1e-3,
                                timesteps=50, base=8, ch_mult=(1, 2), bf16=False, seed=3)
    ckpt = train_diffusion(tiny_store, config=cfg4, save_dir=save, resume=True)
    assert ckpt.exists()
    # epochs 3 and 4 were trained in the resumed run; 1-2 only in the first
    assert (save / "diffusion_unet_ep4.msgpack").exists()
    from clip_codec_tpu.utils.checkpoint import TrainCheckpointer

    assert TrainCheckpointer(save / "orbax").latest_step() == 4


def test_train_diffusion_with_mesh(tiny_store, tmp_path):
    """Product-surface DP: train_diffusion(mesh=...) shards batches over the
    8 virtual devices, replicates state, trains, and writes checkpoints."""
    from clip_codec_tpu.parallel import make_mesh
    from clip_codec_tpu.train import train_diffusion

    cfg = DiffusionTrainConfig(out_size=8, epochs=2, batch_size=8, timesteps=20,
                               base=8, ch_mult=(1, 2), bf16=False)
    ckpt = train_diffusion(tiny_store, config=cfg, save_dir=tmp_path / "dp",
                           mesh=make_mesh(8))
    assert ckpt.exists()

    with pytest.raises(ValueError, match="not divisible"):
        train_diffusion(tiny_store, config=DiffusionTrainConfig(
            out_size=8, epochs=1, batch_size=3, timesteps=20, base=8,
            ch_mult=(1, 2), bf16=False), save_dir=tmp_path / "bad", mesh=make_mesh(8))


def test_train_with_ema(tiny_store, tmp_path):
    """Opt-in EMA (beyond-reference): tracks params, checkpoints, resumes."""
    save = tmp_path / "ema"
    cfg = DiffusionTrainConfig(
        out_size=16, epochs=2, batch_size=8, lr=2e-3, timesteps=50,
        base=8, ch_mult=(1, 2), bf16=False, seed=5, ema_decay=0.5,
    )
    ckpt = train_diffusion(tiny_store, config=cfg, save_dir=save)
    ema_path = save / "diffusion_unet_ema_final.msgpack"
    assert ema_path.exists()
    params = load_params(ckpt)
    ema = load_params(ema_path)

    flat_p = jax.tree_util.tree_leaves(params)
    flat_e = jax.tree_util.tree_leaves(ema)
    assert all(np.isfinite(e).all() for e in flat_e)
    # EMA lags params but has clearly moved off the init: for each leaf,
    # |ema - params| should be smaller than the distance params moved.
    diffs = [float(np.abs(e - p).max()) for e, p in zip(flat_e, flat_p)]
    assert any(d > 0 for d in diffs), "EMA identical to raw params"
    # and it must be usable by the sampler
    net = CLIPCondUNet(z_dim=32, base=8, ch_mult=(1, 2), img_ch=3)
    sched = NoiseSchedule.create(50, "cosine")
    z = jnp.zeros((1, 32), jnp.float32)
    img = DDIMSampler(sched).sample(
        lambda x, zz, t: net.apply({"params": ema}, x, zz, t),
        z, (1, 16, 16, 3), steps=4, rng=jax.random.PRNGKey(0),
    )
    assert bool(jnp.isfinite(img).all())

    # resume restores the EMA state alongside params/opt_state
    cfg2 = DiffusionTrainConfig(
        out_size=16, epochs=3, batch_size=8, lr=2e-3, timesteps=50,
        base=8, ch_mult=(1, 2), bf16=False, seed=5, ema_decay=0.5,
    )
    ckpt2 = train_diffusion(tiny_store, config=cfg2, save_dir=save, resume=True)
    assert ckpt2.exists()
    ema2 = load_params(ema_path)
    assert any(
        float(np.abs(a - b).max()) > 0
        for a, b in zip(jax.tree_util.tree_leaves(ema2), flat_e)
    ), "EMA did not advance on resume"


def test_resume_across_ema_setting_change(tiny_store, tmp_path):
    """A checkpoint written with one ema_decay on/off state must stay
    resumable when the flag flips (review finding: template mismatch)."""
    save = tmp_path / "flip"
    base = dict(out_size=16, batch_size=8, lr=2e-3, timesteps=50,
                base=8, ch_mult=(1, 2), bf16=False, seed=7)
    # EMA run -> resume WITHOUT ema
    train_diffusion(tiny_store, config=DiffusionTrainConfig(epochs=1, ema_decay=0.5, **base), save_dir=save)
    ckpt = train_diffusion(tiny_store, config=DiffusionTrainConfig(epochs=2, **base), save_dir=save, resume=True)
    assert ckpt.exists()

    # plain run -> resume WITH ema (EMA restarts from restored params)
    save2 = tmp_path / "flip2"
    train_diffusion(tiny_store, config=DiffusionTrainConfig(epochs=1, **base), save_dir=save2)
    ckpt2 = train_diffusion(tiny_store, config=DiffusionTrainConfig(epochs=2, ema_decay=0.5, **base), save_dir=save2, resume=True)
    assert ckpt2.exists()
    assert (save2 / "diffusion_unet_ema_final.msgpack").exists()


def test_train_diffusion_spatial(tiny_store, tmp_path):
    """spatial=True: batch over data, height over model, full product path."""
    from clip_codec_tpu.parallel import make_mesh

    cfg = DiffusionTrainConfig(out_size=16, epochs=1, batch_size=4, timesteps=20,
                               base=8, ch_mult=(1, 2), bf16=False)
    ckpt = train_diffusion(tiny_store, config=cfg, save_dir=tmp_path / "sp",
                           mesh=make_mesh(8, model_parallel=2), spatial=True)
    assert ckpt.exists()

    with pytest.raises(ValueError, match="spatial=True requires a mesh"):
        train_diffusion(tiny_store, config=cfg, save_dir=tmp_path / "sp2", spatial=True)
    with pytest.raises(ValueError, match="model axis"):
        train_diffusion(tiny_store, config=DiffusionTrainConfig(
            out_size=20, epochs=1, batch_size=4, timesteps=20, base=8,
            ch_mult=(1, 2), bf16=False), save_dir=tmp_path / "sp3",
            mesh=make_mesh(8, model_parallel=8), spatial=True)
