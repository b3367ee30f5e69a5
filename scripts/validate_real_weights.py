#!/usr/bin/env python
"""One-command validation checklist for the first weight-bearing environment.

This build is zero-egress: no pretrained checkpoint has ever flowed through it
end-to-end (the converters are full-scale parity-tested against locally built
HF architectures instead — see PARITY.md). The moment real weights exist, run

    python scripts/validate_real_weights.py --img_dir <32+ images> [--work /tmp/rwv]

with the documented env vars set; each step runs iff its weights are present
and SKIPs cleanly otherwise:

  CLIP_CODEC_CLIP_WEIGHTS   open_clip/HF ViT-B/32 checkpoint (.pt/.safetensors)
  CLIP_BPE_PATH             CLIP BPE vocab (bpe_simple_vocab_16e6.txt.gz)
  CLIP_CODEC_LPIPS_WEIGHTS  lpips VGG checkpoint
  CLIP_CODEC_DINO_WEIGHTS   HF DINOv2-base checkpoint
  CLIP_CODEC_SD_UNET_WEIGHTS / CLIP_CODEC_SD_VAE_WEIGHTS
                            diffusers SD-1.5 UNet/VAE (.bin/.safetensors/.msgpack)

Steps (the standing zero-egress caveats, each converted into a check):

  1. ENCODE    real-CLIP encode of the image set -> store; if the torch
               reference + open_clip are importable, assert INTEGER agreement
               of the quantized vectors and BYTE-identical .clp frames
               (BASELINE bar: bitwise-identical bitstreams).
  2. EVAL      train a quick tiny decoder on the real store, run the full
               4-metric eval sweep -- finally exercising real-weight LPIPS and
               CLIP-sim; if the reference's metrics are importable with the
               same weights, assert |dLPIPS| <= 0.005 and |dPSNR| <= 0.1 dB
               per image (BASELINE quality bars).
  3. SD        real SD-1.5 reconstruct: precompute_latents on 4 images, one
               adapter train step, CFG DDIM reconstruct at 512px -> PNG.

Exit code 0 = every step that could run passed; nonzero on any failure.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax  # noqa: E402

RESULTS = []


def report(step: str, status: str, detail: str = "") -> None:
    RESULTS.append((step, status, detail))
    print(f"[{status:>4}] {step}" + (f" — {detail}" if detail else ""), flush=True)


def have(*envs: str) -> bool:
    return all(os.environ.get(e) and Path(os.environ[e]).exists() for e in envs)


def step_encode(img_dir: Path, work: Path) -> Path | None:
    if not have("CLIP_CODEC_CLIP_WEIGHTS"):
        report("encode", "SKIP", "CLIP_CODEC_CLIP_WEIGHTS not set")
        return None
    from clip_codec_tpu.cli.encode_images import main as encode_main

    store = work / "store"
    argv = sys.argv
    sys.argv = ["prog", "--img_dir", str(img_dir), "--out_dir", str(store)]
    try:
        encode_main()
    finally:
        sys.argv = argv
    n = len(json.loads((store / "manifest.json").read_text()))
    report("encode", "PASS", f"{n} images -> {store}")

    # Bitwise cross-check vs the torch reference, when importable.
    try:
        sys.path.insert(0, "/root/reference/src")
        import numpy as np
        import open_clip  # noqa: F401  (the reference encode path needs it)
        import torch  # noqa: F401
        from clip_feature_codec.cli.encode_images import encode_images_to_clip
        from clip_feature_codec.codecs.quantizer import PerChannelAffineQuantizer
        from clip_feature_codec.io.bitstream import write_bitstream

        import open_clip as oc

        model, _, preprocess = oc.create_model_and_transforms("ViT-B-32", pretrained="openai")
        paths = sorted(json.loads((store / "manifest.json").read_text()), key=lambda r: r["image"])
        feats_ref = encode_images_to_clip(
            model, preprocess, [Path(r["image"]) for r in paths], device="cpu"
        ).numpy()
        qzr = PerChannelAffineQuantizer(8)
        qzr.fit(torch.from_numpy(feats_ref))
        with tempfile.TemporaryDirectory() as td:
            n_int_match = frames_equal = 0
            for i, rec in enumerate(paths):
                q_ref = qzr.encode(torch.from_numpy(feats_ref[i])).numpy()
                ours = np.frombuffer(
                    __import__("clip_codec_tpu.io.bitstream", fromlist=["decompress_frame"])
                    .decompress_frame(Path(rec["bitstream"]).read_bytes()),
                    dtype=np.uint8,
                )
                n_int_match += int((q_ref == ours).all())
                ref_clp = Path(td) / "ref.clp"
                write_bitstream(q_ref.tobytes(), q_ref.shape[0], ref_clp)
                frames_equal += int(ref_clp.read_bytes() == Path(rec["bitstream"]).read_bytes())
        ok = n_int_match == len(paths) and frames_equal == len(paths)
        report(
            "encode/bitwise-vs-reference", "PASS" if ok else "FAIL",
            f"{n_int_match}/{len(paths)} integer-equal, {frames_equal}/{len(paths)} byte-identical frames",
        )
    except ImportError as e:
        report("encode/bitwise-vs-reference", "SKIP", f"reference/torch stack unavailable ({e})")
    return store


def step_eval(store: Path, work: Path) -> None:
    if store is None:
        report("eval", "SKIP", "no store from the encode step")
        return
    from clip_codec_tpu.train import DiffusionTrainConfig, train_diffusion

    ck = work / "ckpt"
    cfg = DiffusionTrainConfig(out_size=64, epochs=2, batch_size=4, timesteps=100,
                               base=32, ch_mult=(1, 2), bf16=False)
    ckpt = train_diffusion(store, config=cfg, save_dir=ck)

    from clip_codec_tpu.cli.eval import main as eval_main

    out_json = work / "eval.json"
    argv = sys.argv
    sys.argv = ["prog", "--store_dir", str(store), "--weights", str(ckpt),
                "--size", "64", "--steps", "10", "--out_json", str(out_json)]
    try:
        eval_main()
    finally:
        sys.argv = argv
    rows = json.loads(out_json.read_text())
    import numpy as np

    lp = [r["lpips"] for r in rows]
    cs = [r["clip_sim"] for r in rows]
    lp_ok = have("CLIP_CODEC_LPIPS_WEIGHTS") == (not np.isnan(lp).all())
    cs_ok = have("CLIP_CODEC_CLIP_WEIGHTS") == (not np.isnan(cs).all())
    report("eval/4-metric-sweep", "PASS" if (lp_ok and cs_ok) else "FAIL",
           f"LPIPS mean {np.nanmean(lp):.4f}, CLIP-sim mean {np.nanmean(cs):.4f}")

    # Per-image metric agreement vs the reference implementations.
    try:
        sys.path.insert(0, "/root/reference/src")
        from clip_feature_codec.eval.metrics import lpips_distance as ref_lpips
        from clip_feature_codec.eval.metrics import psnr as ref_psnr
        from clip_codec_tpu.train.data import load_image_m11
        from clip_codec_tpu.eval.metrics import lpips_distance, psnr

        worst_p = worst_l = 0.0
        for r in rows[:8]:
            a = load_image_m11(r["image"], 64).transpose(2, 0, 1)
            b = -a  # any deterministic pair exercises both stacks identically
            worst_p = max(worst_p, abs(psnr(a, b) - ref_psnr(a, b)))
            ours_l = lpips_distance(a, b)
            refs_l = ref_lpips(a, b, device="cpu")
            import math

            if not (math.isnan(ours_l) or math.isnan(refs_l)):
                worst_l = max(worst_l, abs(ours_l - refs_l))
        ok = worst_p <= 0.1 and worst_l <= 0.005
        report("eval/vs-reference-bars", "PASS" if ok else "FAIL",
               f"|dPSNR| {worst_p:.4f} dB (bar 0.1), |dLPIPS| {worst_l:.5f} (bar 0.005)")
    except ImportError as e:
        report("eval/vs-reference-bars", "SKIP", f"reference metrics unavailable ({e})")


def step_sd(store: Path, work: Path) -> None:
    if store is None or not have("CLIP_CODEC_SD_UNET_WEIGHTS", "CLIP_CODEC_SD_VAE_WEIGHTS"):
        report("sd", "SKIP", "store or SD weights missing")
        return
    from clip_codec_tpu.cli.precompute_latents import main as pre_main

    argv = sys.argv
    sys.argv = ["prog", "--store_dir", str(store)]
    try:
        pre_main()
    finally:
        sys.argv = argv

    from clip_codec_tpu.cli.train_sd import main as train_main

    sys.argv = ["prog", "--store_dir", str(store), "--epochs", "1",
                "--batch_size", "2", "--save_dir", str(work / "sd_ck")]
    try:
        train_main()
    finally:
        sys.argv = argv

    from clip_codec_tpu.cli.reconstruct_sd_diffusion import main as rec_main

    bit = sorted(store.glob("*.clp"))[0]
    out = work / "sd_recon.png"
    sys.argv = ["prog", "--store_dir", str(store), "--bitstream", str(bit),
                "--adapter", str(work / "sd_ck" / "sd_adapter_final.msgpack"),
                "--steps", "30", "--size", "512", "--inv_weight", "0",
                "--out", str(out)]
    try:
        rec_main()
    finally:
        sys.argv = argv
    report("sd/reconstruct-512px", "PASS" if out.exists() else "FAIL", str(out))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--img_dir", type=str, required=True, help="directory with >=32 real images")
    ap.add_argument("--work", type=str, default=None, help="work dir (default: temp)")
    ap.add_argument("--device", type=str, default=None, help="cpu forces the CPU backend")
    args = ap.parse_args()
    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")
    work = Path(args.work) if args.work else Path(tempfile.mkdtemp(prefix="rwv_"))
    work.mkdir(parents=True, exist_ok=True)
    print(f"[validate_real_weights] work dir: {work}", flush=True)

    store = step_encode(Path(args.img_dir), work)
    step_eval(store, work)
    step_sd(store, work)

    fails = [r for r in RESULTS if r[1] == "FAIL"]
    skips = [r for r in RESULTS if r[1] == "SKIP"]
    print(f"\n{len(RESULTS) - len(fails) - len(skips)} passed, "
          f"{len(skips)} skipped, {len(fails)} FAILED")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
