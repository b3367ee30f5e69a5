"""Headline benchmark: DDIM-50 256px reconstruction throughput (images/sec/chip).

This is BASELINE.json's north-star metric — the reference's hot loop #3
(``cli/reconstruct_diffusion.py`` -> ``DDIMSampler.sample``: a Python loop
with two host syncs per step at batch 1). Here the whole 50-step trajectory is
one compiled ``lax.scan`` over the bf16 U-Net, batched.

``vs_baseline`` compares against an ESTIMATED reference throughput on A100 of
2.0 img/s: the reference samples at batch=1 (its CLI hard-codes shape
(1,3,S,S)) through a ~270 GFLOP/forward U-Net with per-step Python/host
round-trips; 50 steps at ~100 forwards/s gives ~2 img/s. The reference
publishes no measured numbers (BASELINE.md), so this anchor is documented
rather than measured. Raising the anchor lowers vs_baseline proportionally.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import os
import sys
import time

_T_START = time.time()
# Wall-clock budget for the whole process (seconds). The optional int8 extra
# stage is SKIPPED (not risked) once this much time has elapsed, so a driver
# timeout or an axon-tunnel wedge in the extra stage can never erase the
# already-measured bf16 headline. The headline JSON line itself is printed
# (and flushed) the moment it is measured — see main().
BENCH_DEADLINE_S = float(os.environ.get("CLIP_CODEC_BENCH_DEADLINE_S", "420"))

import jax
import jax.numpy as jnp
import numpy as np

# Persistent compilation cache: repeat bench runs skip the slow first compile.
jax.config.update("jax_compilation_cache_dir", str(__import__("pathlib").Path(__file__).parent / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

A100_REFERENCE_IMGS_PER_SEC = 2.0  # documented estimate, see module docstring

STEPS = 50
SIZE = int(os.environ.get("CLIP_CODEC_BENCH_SIZE", "256"))  # 512 = stretch config
BATCH = int(os.environ.get("CLIP_CODEC_BENCH_BATCH", "16"))

# Dense bf16 peak per chip, by device_kind prefix. The MFU field makes the
# headline defensible independently of the estimated A100 anchor above:
# mfu = (XLA-counted FLOPs for the full 50-step trajectory) / time / peak.
PEAK_BF16_FLOPS = {
    "TPU v5 lite": 197e12,  # v5e datasheet: 197 TFLOP/s bf16
    "TPU v5e": 197e12,
    "TPU v5p": 459e12,
    "TPU v4": 275e12,
    "TPU v6": 918e12,  # v6e (Trillium)
}


def _peak_flops() -> float | None:
    kind = jax.devices()[0].device_kind
    for prefix, peak in PEAK_BF16_FLOPS.items():
        if kind.startswith(prefix):
            return peak
    return None



def _static_calibrated(net, params, rng, z):
    """ONE calibration recipe for every int8 bench path: activation absmax
    over noise-scale inputs at (0.95, 0.5, 0.05) of the 1000-step schedule."""
    from clip_codec_tpu.ops import calibrate_int8

    nb = min(4, z.shape[0])  # BATCH < 4 (e.g. the 1024px config) calibrates at BATCH
    cal_x = jnp.asarray(rng.standard_normal((nb, SIZE, SIZE, 3)), jnp.float32)
    batches = [(cal_x, z[:nb], jnp.full((nb,), tt, jnp.int32)) for tt in (950, 500, 50)]
    return {**params, "quant": calibrate_int8(net.apply, params, *batches)}


def main() -> None:
    from clip_codec_tpu.diffusion import NoiseSchedule, ddim_sample
    from clip_codec_tpu.models import CLIPCondUNet

    # Opt-in int8 serving mode (quantization error changes outputs, so the
    # default headline stays the exact bf16 parity path — docs/performance.md
    # carries both numbers + the measured quality delta). "static" uses
    # calibrated activation scales (skips the per-conv absmax pass).
    int8_env = os.environ.get("CLIP_CODEC_BENCH_INT8", "")
    if int8_env == "quality":
        return int8_quality()
    int8_mode = int8_env not in ("", "0")
    int8_static = int8_env == "static"

    # Space-to-batch folding A/B handle (math-identical; default on).
    if os.environ.get("CLIP_CODEC_BENCH_FOLD", "1") in ("0", "false"):
        from clip_codec_tpu.ops import set_fold_spatial

        set_fold_spatial(False)
        print("[bench] spatial fold disabled", file=sys.stderr)

    rng = np.random.default_rng(0)
    net = CLIPCondUNet(z_dim=512, base=128, ch_mult=(1, 2, 2), img_ch=3,
                       dtype=jnp.bfloat16, int8=True if int8_mode else None)
    z = jnp.asarray(rng.standard_normal((BATCH, 512)), jnp.float32)
    x = jnp.zeros((1, SIZE, SIZE, 3), jnp.float32)
    params = jax.jit(net.init)(jax.random.PRNGKey(0), x, z[:1], jnp.zeros((1,), jnp.int32))

    if int8_static:
        # Calibrate activation scales on noise-scale inputs across the
        # timestep range (DDIM trajectories start at N(0,1) and stay
        # near unit scale through the clamp/x0-pred dynamics).
        params = _static_calibrated(net, params, rng, z)
        print("[bench] int8 static calibration done", file=sys.stderr)

    def model_fn(p, x, zz, t):
        return net.apply(p, x, zz, t)

    shape = (BATCH, SIZE, SIZE, 3)
    sched = NoiseSchedule.create(1000, "cosine")

    def run(key):
        return ddim_sample(model_fn, sched, z, shape, steps=STEPS, rng=key, model_params=params)

    # Warm-up compile. NOTE: block_until_ready is not trustworthy over the
    # axon remote tunnel (returns early); np.asarray forces real completion.
    # Remote transports occasionally throw transient errors (HTTP 500,
    # FAILED_PRECONDITION, closed response bodies) — retry the warm-up once
    # before giving up so a blip doesn't void the whole benchmark run.
    t0 = time.time()
    try:
        np.asarray(run(jax.random.PRNGKey(0)))
    except Exception as e:  # pragma: no cover - transport-dependent
        print(f"[bench] warm-up failed ({e}); retrying once", file=sys.stderr)
        time.sleep(5)
        np.asarray(run(jax.random.PRNGKey(0)))
    compile_s = time.time() - t0
    print(f"[bench] compile+first-run {compile_s:.1f}s (batch={BATCH})", file=sys.stderr)

    # Timed runs. Completion barrier: fetch ONE scalar of the final batch —
    # the slice op consumes the full DDIM output, so the scalar only exists
    # after every step of every image has completed on device. This is an
    # honest device barrier (block_until_ready returns early over the axon
    # tunnel) that does NOT charge the tunnel's ~0.37s host download of the
    # 12.6MB pixel batch to chip throughput; a colocated host reads the same
    # buffer in ~1ms. The full-download figure is printed alongside.
    n_rep = 3
    t0 = time.time()
    for i in range(n_rep):
        out = run(jax.random.PRNGKey(i + 1))
    float(out[0, 0, 0, 0])
    dt = (time.time() - t0) / n_rep
    t0 = time.time()
    np.asarray(out)
    dl = time.time() - t0
    imgs_per_sec = BATCH / dt
    print(f"[bench] {dt:.2f}s per DDIM-{STEPS} batch of {BATCH} @ {SIZE}px "
          f"(+{dl:.2f}s tunnel download; incl-download {BATCH / (dt + dl / n_rep):.2f} img/s)",
          file=sys.stderr)

    # MFU from XLA's own FLOP count (derivation in docs/performance.md).
    # XLA's cost analysis counts a lax.scan body ONCE regardless of trip
    # count, so the trajectory FLOPs are (one U-Net forward) x STEPS — the
    # per-step elementwise sampler math is <0.1% and ignored. The forward is
    # counted from the pre-optimization lowering (no compile, no device).
    record = {
        "metric": f"DDIM-{STEPS} {SIZE}px images/sec/chip (CLIPCondUNet base=128)"
        + (" [int8 serving mode]" if int8_mode else ""),
        "value": round(imgs_per_sec, 3),
        "unit": "images/sec",
        "vs_baseline": round(imgs_per_sec / A100_REFERENCE_IMGS_PER_SEC, 2),
    }
    try:
        abstract = jax.tree_util.tree_map(
            lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype),
            (params, jnp.zeros(shape, jnp.float32), z, jnp.zeros((BATCH,), jnp.int32)),
        )
        # Lower for the CPU backend: the FLOP count is platform-independent
        # and some remote-TPU transports return None from cost_analysis.
        # fused_pallas=False: Pallas calls cannot lower for CPU cost
        # analysis, and the FLOP count is identical by construction.
        net_cost = net.clone(fused_pallas=False)
        cost_fn = lambda p, xx, zz, tt: net_cost.apply(p, xx, zz, tt)
        with jax.default_device(jax.devices("cpu")[0]):
            ca = jax.jit(cost_fn).lower(*abstract).cost_analysis()
        if isinstance(ca, (list, tuple)):  # older jax returns [dict]
            ca = ca[0]
        flops_per_batch = float(ca["flops"]) * STEPS
        peak = _peak_flops()
        record["flops_per_image"] = round(flops_per_batch / BATCH, 1)
        if peak is not None:
            record["mfu"] = round(flops_per_batch / dt / peak, 4)
    except Exception as e:  # pragma: no cover - transport-dependent
        print(f"[bench] cost_analysis unavailable: {e}", file=sys.stderr)

    # Emit the parseable headline IMMEDIATELY (flushed) — before the optional
    # int8 extra stage. A wedge/kill during that stage then still leaves a
    # valid JSON line on stdout; if the stage succeeds, the ENRICHED record is
    # printed as the final line and a last-valid-JSON-line parser picks it up.
    print(json.dumps(record), flush=True)

    # Also measure the opt-in static-int8 serving mode in the same process
    # and attach it as extra fields — the PRIMARY value stays the exact bf16
    # parity path (int8 changes outputs; quality delta via
    # CLIP_CODEC_BENCH_INT8=quality). Guarded: a failure here never voids
    # the headline record. Deadline-gated: if the bf16 stage already consumed
    # the budget (slow cold compile, tunnel retries), skip rather than risk.
    elapsed = time.time() - _T_START
    if elapsed > BENCH_DEADLINE_S:
        print(f"[bench] int8 extra stage skipped: {elapsed:.0f}s elapsed "
              f"> deadline {BENCH_DEADLINE_S:.0f}s", file=sys.stderr)
        return
    if not int8_mode and os.environ.get("CLIP_CODEC_BENCH_SKIP_INT8", "") in ("", "0"):
        try:
            net_q = CLIPCondUNet(z_dim=512, base=128, ch_mult=(1, 2, 2),
                                 img_ch=3, dtype=jnp.bfloat16, int8=True)
            params_q = _static_calibrated(net_q, params, rng, z)

            def model_fn_q(p, xx, zz, tt):
                # ONE function object across calls: a fresh lambda per call
                # would re-enter the jit cache every rep (measured: 12.4 ->
                # 4.6 img/s from per-rep program reloads)
                return net_q.apply(p, xx, zz, tt)

            def run_q(key):
                return ddim_sample(model_fn_q, sched, z, shape, steps=STEPS,
                                   rng=key, model_params=params_q)

            np.asarray(run_q(jax.random.PRNGKey(0)))  # warm/compile
            t0 = time.time()
            for i in range(n_rep):
                out_q = run_q(jax.random.PRNGKey(i + 1))
            float(out_q[0, 0, 0, 0])
            dt_q = (time.time() - t0) / n_rep
            record["int8_static_value"] = round(BATCH / dt_q, 3)
            record["int8_static_vs_baseline"] = round(
                BATCH / dt_q / A100_REFERENCE_IMGS_PER_SEC, 2)
            print(f"[bench] int8-static serving mode: {BATCH / dt_q:.2f} img/s",
                  file=sys.stderr)
            # Final line: the enriched record (headline fields unchanged).
            print(json.dumps(record), flush=True)
        except Exception as e:  # pragma: no cover - transport-dependent
            print(f"[bench] int8 extra measurement skipped: {e}", file=sys.stderr)


def int8_quality() -> None:
    """Flagship-scale int8 quality artifact (CLIP_CODEC_BENCH_INT8=quality):
    SAME-SEED DDIM-50 256px trajectories through the bf16 parity model and
    the static-calibrated int8 model (explicit per-model int8 fields — both
    in one process), final-image PSNR/SSIM between them computed on device.
    This is the serving-mode quality number AT THE SCALE THE +27% throughput
    claim is made (random weights suffice: divergence is a property of the
    quantization, not the checkpoint)."""
    from clip_codec_tpu.diffusion import NoiseSchedule, ddim_sample
    from clip_codec_tpu.eval.metrics import psnr_batch, ssim_batch
    from clip_codec_tpu.models import CLIPCondUNet

    rng = np.random.default_rng(0)
    net_fp = CLIPCondUNet(z_dim=512, base=128, ch_mult=(1, 2, 2), img_ch=3,
                          dtype=jnp.bfloat16, int8=False)
    net_q = CLIPCondUNet(z_dim=512, base=128, ch_mult=(1, 2, 2), img_ch=3,
                         dtype=jnp.bfloat16, int8=True)
    z = jnp.asarray(rng.standard_normal((BATCH, 512)), jnp.float32)
    x = jnp.zeros((1, SIZE, SIZE, 3), jnp.float32)
    params = jax.jit(net_fp.init)(jax.random.PRNGKey(0), x, z[:1], jnp.zeros((1,), jnp.int32))

    params_q = _static_calibrated(net_q, params, rng, z)

    sched = NoiseSchedule.create(1000, "cosine")
    shape = (BATCH, SIZE, SIZE, 3)
    key = jax.random.PRNGKey(7)

    def sample(net, p):
        fn = lambda pp, xx, zz, tt: net.apply(pp, xx, zz, tt)
        return jnp.clip(ddim_sample(fn, sched, z, shape, steps=STEPS, rng=key,
                                    model_params=p), -1.0, 1.0)

    t0 = time.time()
    out_fp = sample(net_fp, params)
    out_q = sample(net_q, params_q)
    ps = np.asarray(psnr_batch(out_fp, out_q))
    ss = np.asarray(ssim_batch(out_fp, out_q))
    print(f"[bench] int8 quality run {time.time()-t0:.1f}s (batch={BATCH})", file=sys.stderr)
    record = {
        "metric": f"int8-static vs bf16, same-seed DDIM-{STEPS} {SIZE}px final images",
        "psnr_db_mean": round(float(np.mean(ps)), 2),
        "psnr_db_min": round(float(np.min(ps)), 2),
        "ssim_mean": round(float(np.mean(ss)), 4),
        "ssim_min": round(float(np.min(ss)), 4),
        "batch": BATCH,
    }
    print(json.dumps(record))


if __name__ == "__main__":
    main()
