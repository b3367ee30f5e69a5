"""Worker for the 2-process CPU cluster test (multi-host DP train step).

Launched by tests/test_parallel.py::test_two_process_dp_matches_single_process
as: python dcn_worker.py <process_id> <num_processes> <port>

Each process holds HALF the deterministic global batch; the train step runs
over the 8-device global mesh (4 local CPU devices per process); the final
loss and a parameter checksum are printed for the parent to compare against
its single-process oracle.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np


def main() -> None:
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])

    from clip_codec_tpu.parallel import initialize_distributed

    multi = initialize_distributed(
        coordinator_address=f"localhost:{port}", num_processes=nproc, process_id=pid
    )
    assert multi, "expected a multi-process cluster"
    assert jax.process_count() == nproc
    assert jax.device_count() == nproc * jax.local_device_count()

    import jax.numpy as jnp
    import optax

    from clip_codec_tpu.diffusion import NoiseSchedule
    from clip_codec_tpu.models import CLIPCondUNet
    from clip_codec_tpu.parallel import (
        make_mesh,
        replicate_global,
        shard_host_batch_global,
    )
    from clip_codec_tpu.train import DiffusionTrainConfig, make_train_step

    B_GLOBAL, S, D = 8, 16, 32
    net = CLIPCondUNet(z_dim=D, base=8, ch_mult=(1, 2), img_ch=3)
    sched = NoiseSchedule.create(50, "cosine")
    tx = optax.adamw(1e-3)
    step = make_train_step(net, sched, tx, DiffusionTrainConfig(bf16=False))

    rng = np.random.default_rng(0)  # same stream on every process
    x0 = rng.standard_normal((B_GLOBAL, S, S, 3)).astype(np.float32)
    z = rng.standard_normal((B_GLOBAL, D)).astype(np.float32)
    w = np.ones(B_GLOBAL, np.float32)

    params = net.init(
        jax.random.PRNGKey(0), x0[:1], z[:1], jnp.zeros((1,), jnp.int32)
    )["params"]

    mesh = make_mesh()  # all 8 global devices
    gparams = replicate_global(mesh, params)
    gopt = replicate_global(mesh, tx.init(params))

    # this process's half of the global batch
    lo = pid * (B_GLOBAL // nproc)
    hi = lo + B_GLOBAL // nproc
    x0s, zs, ws = shard_host_batch_global(mesh, x0[lo:hi], z[lo:hi], w[lo:hi])

    gparams, gopt, loss = step(gparams, gopt, x0s, zs, ws, jax.random.PRNGKey(1), True)

    checksum = 0.0
    for leaf in jax.tree_util.tree_leaves(gparams):
        checksum += float(jnp.sum(jnp.abs(leaf.astype(jnp.float64))))
    print(f"RESULT pid={pid} loss={float(loss):.10f} checksum={checksum:.8f}", flush=True)


if __name__ == "__main__":
    main()
