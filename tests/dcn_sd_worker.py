"""Worker for the 2-process SD-adapter DP test (multi-host latent path).

Launched by tests/test_parallel.py::test_two_process_sd_adapter_dp as:
``python dcn_sd_worker.py <process_id> <num_processes> <port>``

Mirrors dcn_worker.py for the round-3 SD adapter step: every process builds
the same tiny frozen decoder from fixed seeds, contributes HALF the
deterministic global batch, and runs ``make_sd_train_step`` over the
8-device global mesh (frozen UNet/VAE replicated, batch sharded over
``data``); the loss and an adapter-parameter checksum are printed for the
parent's single-process oracle comparison.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np


def build_decoder():
    import jax.numpy as jnp

    from clip_codec_tpu.models.sd import AutoencoderKL, SDUNet, StableDiffusionDecoder
    from clip_codec_tpu.models.sd.unet import SDUNetConfig
    from clip_codec_tpu.models.sd.vae import VAEConfig

    ucfg = SDUNetConfig(block_out=(8, 16), layers_per_block=1, cross_dim=16, heads=2, freq_dim=8)
    vcfg = VAEConfig(block_out=(8, 16), layers_per_block=1)
    vae_params = AutoencoderKL(vcfg).init(
        jax.random.PRNGKey(3), jnp.zeros((1, 16, 16, 3)), jax.random.PRNGKey(4)
    )["params"]
    unet_params = SDUNet(ucfg).init(
        jax.random.PRNGKey(5), jnp.zeros((1, 8, 8, 4)), jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, 8, 16)),
    )["params"]
    return StableDiffusionDecoder(
        vae_params, unet_params, clip_dim=32, n_tokens=2,
        unet_cfg=ucfg, vae_cfg=vcfg, dtype=jnp.float32,
    )


def global_batch(B=8):
    rng = np.random.default_rng(0)  # same stream on every process
    z = rng.standard_normal((B, 32)).astype(np.float32)
    lat = rng.standard_normal((B, 8, 8, 4)).astype(np.float32)
    img = rng.standard_normal((B, 16, 16, 3)).astype(np.float32)
    w = np.ones(B, np.float32)
    return z, lat, img, w


def main() -> None:
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
    mode = sys.argv[4] if len(sys.argv) > 4 else "step"
    shared_dir = Path(sys.argv[5]) if len(sys.argv) > 5 else None

    from clip_codec_tpu.parallel import initialize_distributed

    multi = initialize_distributed(
        coordinator_address=f"localhost:{port}", num_processes=nproc, process_id=pid
    )
    assert multi and jax.process_count() == nproc

    import jax.numpy as jnp
    import optax

    from clip_codec_tpu.parallel import (
        make_mesh,
        replicate_global,
        shard_host_batch_global,
    )
    from clip_codec_tpu.train.sd_diffusion_train import (
        SDTrainConfig,
        make_sd_train_step,
        train_sd_diffusion,
    )

    dec = build_decoder()

    if mode == "loop":
        # The FULL epoch loop on the cluster: exercises the orbax
        # full-state save as a cross-process collective (a process-0-only
        # save deadlocks here — review r3 #3) plus the per-epoch msgpack
        # writes and the prefetched data pipeline. The store is rebuilt
        # deterministically per process; save_dir is SHARED.
        from tests.sd_fixtures import build_tiny_sd_store

        store = build_tiny_sd_store(shared_dir / f"local_{pid}", dec)
        cfg = SDTrainConfig(epochs=2, batch_size=8, lr=1e-3, timesteps=50, out_size=16)
        final = train_sd_diffusion(
            store, dec, config=cfg, save_dir=shared_dir / "ck", mesh=make_mesh()
        )
        # Only process 0 writes the msgpack artifacts, and the last CROSS-
        # process barrier is the epoch-2 orbax save — a non-0 process
        # checking final.exists() races the writer. p0 asserts the files;
        # other processes prove participation by completing the loop at all
        # (the orbax saves are collectives).
        ok = (
            final.exists() and (shared_dir / "ck" / "sd_adapter_ep2.msgpack").exists()
            if pid == 0
            else True
        )
        print(f"RESULT pid={pid} loop_ok={ok}", flush=True)
        return
    cfg = SDTrainConfig(timesteps=50, out_size=16)
    tx = optax.adamw(1e-3)
    step = make_sd_train_step(dec, tx, cfg)

    z, lat, img, w = global_batch()
    B = z.shape[0]
    mesh = make_mesh()
    a_params = replicate_global(mesh, dec.adapter_params)
    opt = replicate_global(mesh, tx.init(dec.adapter_params))
    frozen = replicate_global(mesh, {"unet": dec.unet_params, "vae": dec.vae_params})
    lo = pid * (B // nproc)
    hi = lo + B // nproc
    zs, lats, imgs, ws = shard_host_batch_global(
        mesh, z[lo:hi], lat[lo:hi], img[lo:hi], w[lo:hi]
    )

    a_params, opt, loss = step(a_params, opt, frozen, zs, lats, imgs, ws,
                               jax.random.PRNGKey(1), False)

    checksum = sum(
        float(jnp.sum(jnp.abs(l.astype(jnp.float64))))
        for l in jax.tree_util.tree_leaves(a_params)
    )
    print(f"RESULT pid={pid} loss={float(loss):.10f} checksum={checksum:.8f}", flush=True)


if __name__ == "__main__":
    main()
