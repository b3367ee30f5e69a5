"""Mesh / data-parallel tests on the 8-virtual-device CPU backend."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from clip_codec_tpu.diffusion import NoiseSchedule, ddim_sample
from clip_codec_tpu.models import CLIPCondUNet
from clip_codec_tpu.parallel import make_mesh, replicate, shard_batch
from clip_codec_tpu.train import DiffusionTrainConfig, make_train_step


def test_mesh_shapes():
    mesh = make_mesh(8)
    assert mesh.devices.shape == (8, 1)
    mesh2 = make_mesh(8, model_parallel=2)
    assert mesh2.devices.shape == (4, 2)
    with pytest.raises(ValueError):
        make_mesh(6, model_parallel=4)


def test_dp_train_step_matches_single_device(rng):
    """One DP step over 8 devices must equal the single-device step bitwise-ish."""
    B, S, D = 8, 8, 16
    net = CLIPCondUNet(z_dim=D, base=8, ch_mult=(1, 2), img_ch=3)
    sched = NoiseSchedule.create(50, "cosine")
    # SGD, not Adam: Adam's step-1 update is ~sign(grad), so a reduction-order
    # sign flip on a near-zero grad produces an O(lr) param difference that
    # says nothing about DP correctness. SGD updates are proportional to grads.
    tx = optax.sgd(0.1)
    cfg = DiffusionTrainConfig(bf16=False, recon_w=0.05, tv_w=1e-4, clip_w=0.0)
    step_fn = make_train_step(net, sched, tx, cfg)

    x0 = rng.standard_normal((B, S, S, 3)).astype(np.float32)
    z = rng.standard_normal((B, D)).astype(np.float32)
    w = np.ones(B, np.float32)
    params = net.init(jax.random.PRNGKey(0), x0[:1], z[:1], jnp.zeros((1,), jnp.int32))["params"]
    opt_state = tx.init(params)
    key = jax.random.PRNGKey(3)

    # Single device
    p1, o1, l1 = step_fn(jax.tree_util.tree_map(jnp.copy, params), tx.init(params),
                         jnp.asarray(x0), jnp.asarray(z), jnp.asarray(w), key, False)

    # 8-device data parallel: shard batch, replicate state
    mesh = make_mesh(8)
    params_r = replicate(mesh, params)
    opt_r = replicate(mesh, tx.init(params))
    x0s, zs, ws = shard_batch(mesh, x0, z, w)
    p8, o8, l8 = step_fn(params_r, opt_r, x0s, zs, ws, key, False)

    assert np.allclose(float(l1), float(l8), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p8)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)


def test_sharded_ddim_sampling(rng):
    """Batched DDIM with the batch sharded over the data axis."""
    mesh = make_mesh(8)
    D = 16
    net = CLIPCondUNet(z_dim=D, base=8, ch_mult=(1, 2), img_ch=3)
    z_host = rng.standard_normal((8, D)).astype(np.float32)
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)), z_host[:1], jnp.zeros((1,), jnp.int32))
    sched = NoiseSchedule.create(50, "cosine")
    z = shard_batch(mesh, z_host)
    imgs = ddim_sample(
        lambda x, zz, t: net.apply(params, x, zz, t), sched, z, (8, 8, 8, 3), steps=5,
    )
    assert imgs.shape == (8, 8, 8, 3)
    assert bool(jnp.isfinite(jnp.asarray(imgs)).all())


def test_sample_sharded_convenience(rng):
    from clip_codec_tpu.parallel import make_mesh, sample_sharded

    mesh = make_mesh(8)
    D = 16
    net = CLIPCondUNet(z_dim=D, base=8, ch_mult=(1, 2), img_ch=3)
    z = rng.standard_normal((8, D)).astype(np.float32)
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)), z[:1], jnp.zeros((1,), jnp.int32))
    sched = NoiseSchedule.create(20, "cosine")
    imgs = sample_sharded(mesh, lambda x, zz, t: net.apply(params, x, zz, t), sched, z, 8, steps=3)
    assert imgs.shape == (8, 8, 8, 3)
    with pytest.raises(ValueError, match="divisible"):
        sample_sharded(mesh, lambda x, zz, t: x, sched, z[:5], 8, steps=2)


def test_spatial_sharded_sampling(rng):
    """Batch over data x height over model: GSPMD halo exchange through the
    convs; result must match the unsharded computation."""
    from clip_codec_tpu.parallel import make_mesh, sample_spatial_sharded

    mesh = make_mesh(8, model_parallel=2)  # 4 data x 2 model
    D = 16
    net = CLIPCondUNet(z_dim=D, base=8, ch_mult=(1, 2), img_ch=3)
    z = rng.standard_normal((4, D)).astype(np.float32)
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)), z[:1], jnp.zeros((1,), jnp.int32))
    # linear schedule: alpha_bar stays O(1), so the x0 inversion does not
    # amplify fp reduction-order differences between sharded and unsharded
    # reductions (the cosine tail divides by ~1e-10 and saturates the clip).
    sched = NoiseSchedule.create(20, "linear")
    model_fn = lambda x, zz, t: net.apply(params, x, zz, t)

    sharded = sample_spatial_sharded(mesh, model_fn, sched, z, 16, steps=3,
                                     rng=jax.random.PRNGKey(7))
    assert sharded.shape == (4, 16, 16, 3)

    # unsharded oracle with the same rng: identical trajectory
    import jax as _jax

    r = _jax.random.PRNGKey(7)
    r, init = _jax.random.split(r)
    x_T = _jax.random.normal(init, (4, 16, 16, 3), jnp.float32)
    from clip_codec_tpu.diffusion import ddim_sample

    plain = np.asarray(ddim_sample(model_fn, sched, jnp.asarray(z), (4, 16, 16, 3), 3, 0.0, r, x_T=x_T))
    np.testing.assert_allclose(sharded, plain, rtol=1e-4, atol=1e-5)

    with pytest.raises(ValueError, match="not divisible"):
        sample_spatial_sharded(mesh, model_fn, sched, z, 15, steps=2)


# --- driver entry points ------------------------------------------------


def _repo_root():
    import pathlib

    return str(pathlib.Path(__file__).resolve().parent.parent)


def test_dryrun_multichip_in_process():
    """Backends are already initialized here (conftest forced CPU); the dry
    run must work without needing to update jax_platforms."""
    import sys

    sys.path.insert(0, _repo_root())
    try:
        import __graft_entry__ as g

        g.dryrun_multichip(8)
    finally:
        sys.path.pop(0)


@pytest.mark.parametrize("preinit", [False, True], ids=["bare", "after-backend-init"])
def test_dryrun_multichip_subprocess(preinit):
    """The exact driver scenario: a fresh process where a sitecustomize may
    have overridden JAX_PLATFORMS (so the env var alone is NOT enough — see
    CLAUDE.md), optionally with a backend already initialized (as after
    ``entry()``). The dry run must force/pin CPU itself and never touch a
    TPU client."""
    import os
    import subprocess
    import sys

    # CPU-only backend init: exercises the same "backends already
    # initialized" branch of __graft_entry__._cpu_devices WITHOUT platform
    # discovery touching the remote axon TPU client (observed futex-waiting
    # ~10 min inside the suite when jax.devices('cpu') initialized every
    # backend — VERDICT r2 weak #3).
    pre = (
        "import jax; jax.config.update('jax_platforms', 'cpu'); jax.devices()\n"
        if preinit
        else ""
    )
    code = pre + "import __graft_entry__ as g\ng.dryrun_multichip(8)\n"
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # rely on in-process forcing only
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    out = subprocess.run(
        [sys.executable, "-c", code],
        cwd=_repo_root(),
        env=env,
        capture_output=True,
        text=True,
        # the dry run compiles a sharded train step + a TP forward from
        # scratch on the 1-core CPU host (~150-250s uncontended; the
        # persistent cache does not reliably serve these CPU programs);
        # give in-suite runs real headroom
        timeout=1500,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "8 devices OK" in out.stdout


def test_two_process_dp_matches_single_process():
    """Multi-host (DCN) bring-up, SURVEY §2.5: a REAL 2-process CPU cluster
    (gloo collectives, 4 virtual devices per process = 8 global) runs the DP
    train step on an 8-way global mesh; loss and updated-parameter checksum
    must match both across processes and vs the single-process oracle."""
    import os
    import re
    import socket
    import subprocess
    import sys

    import optax

    from clip_codec_tpu.train import DiffusionTrainConfig, make_train_step

    # --- single-process oracle (full batch on one device) ---
    B, S, D = 8, 16, 32
    net = CLIPCondUNet(z_dim=D, base=8, ch_mult=(1, 2), img_ch=3)
    sched = NoiseSchedule.create(50, "cosine")
    tx = optax.adamw(1e-3)
    step = make_train_step(net, sched, tx, DiffusionTrainConfig(bf16=False))
    host = np.random.default_rng(0)
    x0 = host.standard_normal((B, S, S, 3)).astype(np.float32)
    z = host.standard_normal((B, D)).astype(np.float32)
    w = np.ones(B, np.float32)
    params = net.init(jax.random.PRNGKey(0), x0[:1], z[:1], jnp.zeros((1,), jnp.int32))["params"]
    params, _, loss = step(params, tx.init(params), x0, z, w, jax.random.PRNGKey(1), True)
    oracle_loss = float(loss)
    oracle_sum = sum(float(jnp.sum(jnp.abs(l))) for l in jax.tree_util.tree_leaves(params))

    # --- 2-process cluster ---
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    worker = str(__import__("pathlib").Path(__file__).parent / "dcn_worker.py")
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(i), "2", str(port)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for i in range(2)
    ]
    results = {}
    for i, p in enumerate(procs):
        out, err = p.communicate(timeout=600)
        assert p.returncode == 0, f"worker {i} failed:\n{err[-2000:]}"
        m = re.search(r"RESULT pid=(\d) loss=([\d.eE+-]+) checksum=([\d.eE+-]+)", out)
        assert m, out
        results[int(m.group(1))] = (float(m.group(2)), float(m.group(3)))

    (l0, c0), (l1, c1) = results[0], results[1]
    assert l0 == l1 and c0 == c1  # both processes observe the same globals
    np.testing.assert_allclose(l0, oracle_loss, rtol=2e-5)
    np.testing.assert_allclose(c0, oracle_sum, rtol=2e-5)


def test_spatial_sharded_train_step_matches_single_device(rng):
    """The memory lever for 512px+ training (BASELINE config #5): batch over
    `data` AND image height over `model`. GSPMD propagates the H-sharding
    through every conv (halo exchanges) and the TV loss's spatial diffs with
    no train-step code changes; the step must match the single-device step."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    B, S, D = 4, 16, 16
    net = CLIPCondUNet(z_dim=D, base=8, ch_mult=(1, 2), img_ch=3)
    sched = NoiseSchedule.create(50, "cosine")
    tx = optax.sgd(0.1)  # see DP test: SGD so deltas reflect grad deltas
    cfg = DiffusionTrainConfig(bf16=False, recon_w=0.05, tv_w=1e-4, clip_w=0.0)
    step_fn = make_train_step(net, sched, tx, cfg)

    x0 = rng.standard_normal((B, S, S, 3)).astype(np.float32)
    z = rng.standard_normal((B, D)).astype(np.float32)
    w = np.ones(B, np.float32)
    params = net.init(jax.random.PRNGKey(0), x0[:1], z[:1], jnp.zeros((1,), jnp.int32))["params"]
    key = jax.random.PRNGKey(5)

    p1, o1, l1 = step_fn(jax.tree_util.tree_map(jnp.copy, params), tx.init(params),
                         jnp.asarray(x0), jnp.asarray(z), jnp.asarray(w), key, False)

    mesh = make_mesh(8, model_parallel=2)  # (data=4, model=2)
    params_r = replicate(mesh, params)
    opt_r = replicate(mesh, tx.init(params))
    x0s = jax.device_put(x0, NamedSharding(mesh, P("data", "model", None, None)))
    zs = jax.device_put(z, NamedSharding(mesh, P("data")))
    ws = jax.device_put(w, NamedSharding(mesh, P("data")))
    p8, o8, l8 = step_fn(params_r, opt_r, x0s, zs, ws, key, False)

    assert np.allclose(float(l1), float(l8), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p8)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)


def test_two_process_sd_adapter_dp_matches_single_process():
    """Round-3 SD adapter trainer on a REAL 2-process CPU cluster (gloo, 4
    virtual devices per process): loss and updated-adapter checksum must
    match across processes and vs the single-process oracle — the multi-host
    path of train_sd_diffusion(mesh=...)."""
    import os
    import re
    import socket
    import subprocess
    import sys

    import optax

    from clip_codec_tpu.train.sd_diffusion_train import SDTrainConfig, make_sd_train_step

    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent))
    try:
        from dcn_sd_worker import build_decoder, global_batch
    finally:
        sys.path.pop(0)

    # --- single-process oracle (full batch, one device) ---
    dec = build_decoder()
    cfg = SDTrainConfig(timesteps=50, out_size=16)
    tx = optax.adamw(1e-3)
    step = make_sd_train_step(dec, tx, cfg)
    z, lat, img, w = global_batch()
    frozen = {"unet": dec.unet_params, "vae": dec.vae_params}
    a_params, _, loss = step(
        jax.tree_util.tree_map(jnp.copy, dec.adapter_params), tx.init(dec.adapter_params),
        frozen, jnp.asarray(z), jnp.asarray(lat), jnp.asarray(img), jnp.asarray(w),
        jax.random.PRNGKey(1), False,
    )
    oracle_loss = float(loss)
    oracle_sum = sum(
        float(jnp.sum(jnp.abs(l.astype(jnp.float64))))
        for l in jax.tree_util.tree_leaves(a_params)
    )

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    worker = str(__import__("pathlib").Path(__file__).parent / "dcn_sd_worker.py")
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(i), "2", str(port)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for i in range(2)
    ]
    results = {}
    for i, p in enumerate(procs):
        out, err = p.communicate(timeout=600)
        assert p.returncode == 0, f"worker {i} failed:\n{err[-2000:]}"
        m = re.search(r"RESULT pid=(\d) loss=([\d.eE+-]+) checksum=([\d.eE+-]+)", out)
        assert m, out
        results[int(m.group(1))] = (float(m.group(2)), float(m.group(3)))

    (l0, c0), (l1, c1) = results[0], results[1]
    assert l0 == l1 and c0 == c1
    np.testing.assert_allclose(l0, oracle_loss, rtol=2e-5)
    np.testing.assert_allclose(c0, oracle_sum, rtol=2e-5)


def test_two_process_sd_trainer_full_loop_with_orbax():
    """The FULL train_sd_diffusion epoch loop on a real 2-process cluster:
    per-epoch orbax saves are cross-process collectives — this deadlocks
    within the 600s timeout if any process skips the save barrier
    (review r3 #3 regression)."""
    import os
    import socket
    import subprocess
    import sys
    import tempfile

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    shared = tempfile.mkdtemp(prefix="sd_dcn_")
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    worker = str(__import__("pathlib").Path(__file__).parent / "dcn_sd_worker.py")
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(i), "2", str(port), "loop", shared],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for i in range(2)
    ]
    for i, p in enumerate(procs):
        out, err = p.communicate(timeout=600)
        assert p.returncode == 0, f"worker {i} failed:\n{err[-2000:]}"
        assert f"loop_ok=True" in out, out
