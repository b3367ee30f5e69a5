"""Mid-scale cross-framework trained parity (VERDICT r3 item 2).

Same bidirectional protocol as tests/test_e2e_cross_framework.py, scaled up
from the CI config (base=8, 16px, 120 steps) to a point where real conv/GN
accumulation differences could surface: base=32, 48px, 300 optimizer steps
per direction, 12-step DDIM reconstruction — the largest run the single CPU
core finishes in tens of minutes (the reference's own operating point is
base=128/256px, train/diffusion_train.py:103; the parity mechanism between
these scales is identical code on both sides).

Direction A: train HERE (jitted step, fp32) -> weights/export.py -> the
actual torch reference's DDIMSampler + eval.metrics.
Direction B: train with the REFERENCE's modules (its UNet/scheduler/loss,
AdamW) -> weights/convert.py -> our sampler + metrics.

Pass bar (BASELINE.md): per-image |dPSNR| <= 0.1 dB, |dSSIM| <= 0.005.
Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/midscale_parity.py
(CPU-only; do NOT run while timing anything on the TPU — one core.)
Results are recorded in PARITY.md ("Mid-scale cross-framework e2e").
"""

from __future__ import annotations

import argparse
import json
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

REF_SRC = Path("/root/reference/src")
if str(REF_SRC) not in sys.path:
    sys.path.insert(0, str(REF_SRC))


def _l2n(x, axis=-1, eps=1e-9):
    n = np.linalg.norm(x, axis=axis, keepdims=True)
    return x / np.maximum(n, eps)


def make_store(root: Path, n_img, size, z_dim, seed=42):
    from PIL import Image

    from clip_codec_tpu.codecs import PerChannelAffineQuantizer
    from clip_codec_tpu.io import write_bitstream

    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:size, 0:size] / size
    images = []
    for _ in range(n_img):
        f = rng.uniform(1.0, 5.0, size=(3, 2))
        ph = rng.uniform(0, 2 * np.pi, size=(3, 2))
        img = np.stack(
            [np.sin(2 * np.pi * (f[c, 0] * xx + f[c, 1] * yy) + ph[c, 0]) for c in range(3)],
            axis=-1,
        )
        images.append(img.astype(np.float32))
    Z = _l2n(rng.standard_normal((n_img, z_dim)).astype(np.float32))
    quant = PerChannelAffineQuantizer().fit(Z)
    np.savez(root / "codec_meta.npz", scale=quant.scale, zero=quant.zero)
    manifest = []
    for i, img in enumerate(images):
        u8 = ((img + 1.0) * 127.5).clip(0, 255).astype(np.uint8)
        Image.fromarray(u8).save(root / f"img_{i}.png")
        write_bitstream(quant.encode(Z[i]).tobytes(), z_dim, root / f"img_{i}.clp")
        manifest.append({"image": str(root / f"img_{i}.png"), "bitstream": str(root / f"img_{i}.clp")})
    (root / "manifest.json").write_text(json.dumps(manifest), encoding="utf-8")


def load_store(root: Path):
    from PIL import Image

    from clip_codec_tpu.io import read_bitstream

    manifest = json.loads((root / "manifest.json").read_text(encoding="utf-8"))
    meta = np.load(root / "codec_meta.npz")
    scale, zero = meta["scale"].astype(np.float32), meta["zero"].astype(np.float32)
    imgs, zs = [], []
    for rec in manifest:
        imgs.append(np.asarray(Image.open(rec["image"]).convert("RGB"), np.float32) / 127.5 - 1.0)
        q = read_bitstream(rec["bitstream"])
        zs.append(_l2n((q.astype(np.float32) * scale + zero)[None])[0])
    return np.stack(imgs), np.stack(zs).astype(np.float32)


def train_ours(x0, z, cfgd, steps, lr, seed=0):
    import jax
    import jax.numpy as jnp
    import optax

    from clip_codec_tpu.diffusion import NoiseSchedule
    from clip_codec_tpu.models import CLIPCondUNet
    from clip_codec_tpu.train import DiffusionTrainConfig, make_train_step

    net = CLIPCondUNet(z_dim=cfgd["z_dim"], base=cfgd["base"], ch_mult=cfgd["ch_mult"], img_ch=3)
    sched = NoiseSchedule.create(cfgd["timesteps"], "cosine")
    tx = optax.adamw(lr)
    cfg = DiffusionTrainConfig(bf16=False, timesteps=cfgd["timesteps"], recon_w=0.05, tv_w=1e-4)
    step = make_train_step(net, sched, tx, cfg)
    params = net.init(jax.random.PRNGKey(seed), x0[:1], z[:1], jnp.zeros((1,), jnp.int32))["params"]
    opt_state = tx.init(params)
    w = np.ones(x0.shape[0], np.float32)
    rng = jax.random.PRNGKey(seed + 1)
    t0 = time.time()
    for i in range(steps):
        rng, sub = jax.random.split(rng)
        params, opt_state, loss = step(params, opt_state, x0, z, w, sub, False)
        if (i + 1) % 50 == 0:
            print(f"[ours] step {i+1}/{steps} loss={float(loss):.4f} ({time.time()-t0:.0f}s)", flush=True)
    assert np.isfinite(float(loss))
    import jax as _j

    return net, _j.device_get(params)


def train_reference(x0_hwc, z, cfgd, steps, lr, seed=3):
    import torch
    import torch.nn.functional as F
    from clip_feature_codec.diffusion.scheduler import NoiseScheduler
    from clip_feature_codec.models.unet import CLIPCondUNet as TorchUNet

    x0_t = torch.from_numpy(x0_hwc.transpose(0, 3, 1, 2).copy())
    z_t = torch.from_numpy(z)
    torch.manual_seed(seed)
    tnet = TorchUNet(z_dim=cfgd["z_dim"], base=cfgd["base"], ch_mult=cfgd["ch_mult"], img_ch=3)
    sch = NoiseScheduler(timesteps=cfgd["timesteps"], schedule="cosine", device="cpu")
    opt = torch.optim.AdamW(tnet.parameters(), lr=lr)
    tnet.train()
    t0 = time.time()
    for i in range(steps):
        t = torch.randint(0, cfgd["timesteps"], (x0_t.shape[0],), dtype=torch.long)
        noise = torch.randn_like(x0_t)
        x_t = sch.q_sample(x0_t, t, noise)
        eps_hat = tnet(x_t, z_t, t)
        loss = F.mse_loss(eps_hat, noise)
        x0_pred = sch.predict_x0_from_eps(x_t, t, eps_hat).clamp(-1, 1)
        loss = loss + 0.05 * F.l1_loss(x0_pred, x0_t)
        loss.backward()
        opt.step()
        opt.zero_grad(set_to_none=True)
        if (i + 1) % 50 == 0:
            print(f"[ref ] step {i+1}/{steps} loss={float(loss.detach()):.4f} ({time.time()-t0:.0f}s)", flush=True)
    tnet.eval()
    assert np.isfinite(float(loss.detach()))
    return tnet


def sample_ours(net, params, z, x_T_nhwc, cfgd, steps):
    import jax
    import jax.numpy as jnp

    from clip_codec_tpu.diffusion import NoiseSchedule, ddim_sample

    sched = NoiseSchedule.create(cfgd["timesteps"], "cosine")
    out = ddim_sample(
        lambda p, x, zz, t: net.apply({"params": p}, x, zz, t),
        sched, jnp.asarray(z), x_T_nhwc.shape, steps, 0.0,
        jax.random.PRNGKey(0), x_T=jnp.asarray(x_T_nhwc), model_params=params,
    )
    return np.clip(np.asarray(out), -1.0, 1.0)


def sample_reference(tnet, z, x_T_nchw, cfgd, steps):
    import torch
    from clip_feature_codec.diffusion.ddim import DDIMSampler
    from clip_feature_codec.diffusion.scheduler import NoiseScheduler

    sch = NoiseScheduler(timesteps=cfgd["timesteps"], schedule="cosine", device="cpu")
    sampler = DDIMSampler(sch, eta=0.0)
    with torch.no_grad():
        x = sampler.sample(tnet, torch.from_numpy(np.asarray(z)),
                           shape=x_T_nchw.shape, steps=steps,
                           x_T=torch.from_numpy(x_T_nchw))
    return x.clamp(-1, 1).numpy()


def metric_deltas(originals_hwc, ours_nhwc, ref_nchw):
    from clip_feature_codec.eval import metrics as ref_metrics

    from clip_codec_tpu.eval import metrics as our_metrics

    rows = []
    for i in range(originals_hwc.shape[0]):
        orig_chw = originals_hwc[i].transpose(2, 0, 1)
        p_ours = our_metrics.psnr(originals_hwc[i], ours_nhwc[i])
        p_ref = ref_metrics.psnr(orig_chw, ref_nchw[i])
        s_ours = our_metrics.ssim(originals_hwc[i], ours_nhwc[i])
        s_ref = ref_metrics.ssim(orig_chw, ref_nchw[i])
        if not np.isfinite(s_ref):  # reference ssim needs skimage (absent)
            s_ref = our_metrics.ssim(orig_chw, ref_nchw[i])
        rows.append((p_ours, p_ref, s_ours, s_ref))
    return rows


def report(rows, label, psnr_tol, ssim_tol):
    ok = True
    dps, dss = [], []
    for i, (p_o, p_r, s_o, s_r) in enumerate(rows):
        dp, ds = p_o - p_r, s_o - s_r
        dps.append(dp)
        dss.append(ds)
        flag = "" if (abs(dp) <= psnr_tol and abs(ds) <= ssim_tol) else "  <-- OVER TOL"
        print(f"[{label}] img{i}: psnr ours={p_o:.4f} ref={p_r:.4f} (d={dp:+.4f})"
              f" ssim ours={s_o:.5f} ref={s_r:.5f} (d={ds:+.5f}){flag}", flush=True)
        ok &= abs(dp) <= psnr_tol and abs(ds) <= ssim_tol
    print(f"[{label}] max|dPSNR|={max(abs(d) for d in dps):.4f} dB, "
          f"max|dSSIM|={max(abs(d) for d in dss):.5f} -> {'PASS' if ok else 'FAIL'}", flush=True)
    return ok


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", type=int, default=32)
    ap.add_argument("--size", type=int, default=48)
    ap.add_argument("--ch_mult", default="1,2")
    ap.add_argument("--z_dim", type=int, default=32)
    ap.add_argument("--timesteps", type=int, default=100)
    ap.add_argument("--train_steps", type=int, default=300)
    ap.add_argument("--sample_steps", type=int, default=12)
    ap.add_argument("--n_img", type=int, default=6)
    ap.add_argument("--lr", type=float, default=2e-3)
    ap.add_argument("--psnr_tol", type=float, default=0.1)
    ap.add_argument("--ssim_tol", type=float, default=0.005)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")  # single-core CPU run by design

    import torch

    from clip_codec_tpu.models import CLIPCondUNet
    from clip_codec_tpu.weights.convert import convert_unet
    from clip_codec_tpu.weights.export import export_unet
    from clip_feature_codec.models.unet import CLIPCondUNet as TorchUNet

    cfgd = dict(base=args.base, z_dim=args.z_dim,
                ch_mult=tuple(int(c) for c in args.ch_mult.split(",")),
                timesteps=args.timesteps)
    print(f"[midscale] config: {cfgd}, size={args.size}, train_steps={args.train_steps}, "
          f"n_img={args.n_img}, ddim={args.sample_steps}", flush=True)

    root = Path(tempfile.mkdtemp(prefix="midscale_store_"))
    make_store(root, args.n_img, args.size, args.z_dim)
    originals, z = load_store(root)

    # Direction A: ours -> reference
    net, params = train_ours(originals, z, cfgd, args.train_steps, args.lr)
    tnet = TorchUNet(z_dim=args.z_dim, base=args.base, ch_mult=cfgd["ch_mult"], img_ch=3)
    sd = {k: torch.from_numpy(np.ascontiguousarray(v))
          for k, v in export_unet(params, cfgd["ch_mult"]).items()}
    tnet.load_state_dict(sd, strict=True)
    tnet.eval()
    x_T = np.random.default_rng(7).standard_normal(
        (args.n_img, 3, args.size, args.size)).astype(np.float32)
    recon_ref = sample_reference(tnet, z, x_T, cfgd, args.sample_steps)
    recon_ours = sample_ours(net, params, z, x_T.transpose(0, 2, 3, 1), cfgd, args.sample_steps)
    d = np.abs(recon_ours.transpose(0, 3, 1, 2) - recon_ref)
    print(f"[ours->ref] raw agreement: {100*(d <= 1/255).mean():.2f}% within 1/255, "
          f"max |d|={d.max():.5f}", flush=True)
    ok_a = report(metric_deltas(originals, recon_ours, recon_ref), "ours->ref",
                  args.psnr_tol, args.ssim_tol)

    # Direction B: reference -> ours
    tnet_b = train_reference(originals, z, cfgd, args.train_steps, args.lr)
    params_b = convert_unet({k: v for k, v in tnet_b.state_dict().items()}, cfgd["ch_mult"])
    x_T2 = np.random.default_rng(11).standard_normal(
        (args.n_img, 3, args.size, args.size)).astype(np.float32)
    recon_ref_b = sample_reference(tnet_b, z, x_T2, cfgd, args.sample_steps)
    net_b = CLIPCondUNet(z_dim=args.z_dim, base=args.base, ch_mult=cfgd["ch_mult"], img_ch=3)
    recon_ours_b = sample_ours(net_b, params_b, z, x_T2.transpose(0, 2, 3, 1), cfgd, args.sample_steps)
    d = np.abs(recon_ours_b.transpose(0, 3, 1, 2) - recon_ref_b)
    print(f"[ref->ours] raw agreement: {100*(d <= 1/255).mean():.2f}% within 1/255, "
          f"max |d|={d.max():.5f}", flush=True)
    ok_b = report(metric_deltas(originals, recon_ours_b, recon_ref_b), "ref->ours",
                  args.psnr_tol, args.ssim_tol)

    print(f"[midscale] overall: {'PASS' if (ok_a and ok_b) else 'FAIL'}", flush=True)
    sys.exit(0 if (ok_a and ok_b) else 1)


if __name__ == "__main__":
    main()
