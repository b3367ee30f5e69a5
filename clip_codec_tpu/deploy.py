"""AOT deployment artifacts via ``jax.export`` — beyond-reference runtime layer.

The reference deploys by shipping Python + torch and re-building the model in
every process (``cli/reconstruct_diffusion.py:47-52``). On TPU the natural
deployment unit is the *compiled program*: trace + lower ONCE on a build box,
serialize the StableHLO artifact, and serve it from processes that need only
``jax`` and the checkpoint — no flax model code, no tracing, no Python-side
architecture drift between build and serve.

    # build box (has the model code):
    from clip_codec_tpu.deploy import export_decompressor
    export_decompressor(params, mc, "decoder.jaxprog", size=256, steps=50)

    # serving box (jax + params only):
    from clip_codec_tpu.deploy import load_decompressor
    dec = load_decompressor("decoder.jaxprog")
    images = dec(params, z, seed=7)          # (B, size, size, 3) in [-1, 1]

Design rules carried over from the rest of the framework:

* parameter trees are call-time ARGUMENTS, never baked into the artifact —
  the program stays KB-sized, one artifact serves every checkpoint of the
  same architecture, and nothing hits the remote-compile body limit;
* the whole trajectory (DDIM or DPM-Solver++(2M) scan + final clip) is one
  program — zero host syncs at serve time;
* shapes are static per artifact (batch_size, size, steps are export-time
  choices) — XLA's requirement made explicit in the API.

``jax.export`` validates platform and input shapes/dtypes/tree structure at
call time and raises with the exact mismatch. Artifacts lowered for several
platforms (``platforms=("tpu", "cpu")``) run on any of them.

Also here: the SD latent path (``export_sd_decompressor`` — CFG guidance
rides as a traced scalar, so one artifact serves every guidance value),
static-int8 variants of both (``quant=`` at export, calibration collection
as a call-time argument), and a JSON metadata header
(``read_artifact_meta``) recording the baked statics for serving layers.
See docs/deployment.md.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional, Sequence, Union

import jax
import jax.numpy as jnp
from jax import export as jax_export

from .diffusion import NoiseSchedule, make_sampler
from .models import CLIPCondUNet
from .utils.config import ModelConfig

PathLike = Union[str, Path]

# Artifact header: magic prefix (lets the loader fail with a clear message on
# a file that is not ours — the jax.export blob itself has no recognizable
# header) followed by one JSON metadata line recording the kind ("pixel" /
# "sd") and the static choices baked into the program (size, steps, sampler,
# batch_size, ...) so serving layers can validate requests against them.
_MAGIC = b"CLPJAXPROG1\n"
_KINDS = ("pixel", "sd")


def _write_artifact(path: PathLike, kind: str, meta: dict, exp) -> Path:
    import json

    path = Path(path)
    header = json.dumps({"kind": kind, **meta}, sort_keys=True).encode()
    path.write_bytes(_MAGIC + header + b"\n" + exp.serialize())
    return path


def read_artifact_meta(path: PathLike) -> dict:
    """The metadata header of an exported artifact (no program deserialization)."""
    import json

    with open(path, "rb") as f:
        magic = f.read(len(_MAGIC))
        if magic != _MAGIC:
            raise ValueError(f"{path}: not a clip_codec_tpu exported program")
        header = f.readline()
    try:
        meta = json.loads(header)
    except ValueError as e:
        raise ValueError(f"{path}: corrupt artifact header: {e}") from None
    if meta.get("kind") not in _KINDS:
        raise ValueError(f"{path}: unknown artifact kind {meta.get('kind')!r}")
    return meta


def _spec_tree(tree):
    """ShapeDtypeStructs for a pytree WITHOUT touching the data — export uses
    shapes only, and ``jnp.asarray`` would device-transfer multi-GB trees
    through the tunnel just to read dtypes."""
    return jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(jnp.shape(a), jnp.result_type(a)), tree
    )


def _read_artifact(path: PathLike, expect_kind: str):
    import json

    blob = Path(path).read_bytes()
    if not blob.startswith(_MAGIC):
        raise ValueError(f"{path}: not a clip_codec_tpu exported program")
    header, _, body = blob[len(_MAGIC):].partition(b"\n")
    try:
        meta = json.loads(header)
    except ValueError as e:
        raise ValueError(f"{path}: corrupt artifact header: {e}") from None
    if meta.get("kind") not in _KINDS:
        raise ValueError(f"{path}: unknown artifact kind {meta.get('kind')!r}")
    if meta["kind"] != expect_kind:
        raise ValueError(
            f"{path}: this is a {meta['kind']!r} artifact — load it with "
            f"load_{'sd_' if meta['kind'] == 'sd' else ''}decompressor"
        )
    return jax_export.deserialize(bytearray(body)), meta


def make_decompress_fn(
    mc: ModelConfig,
    size: int = 256,
    steps: int = 50,
    sampler: str = "ddim",
    eta: float = 0.0,
    int8: bool = False,
    x_sharding=None,
    output: str = "float32",
):
    """Build the pure serving function ``(params, z, seed) -> images``
    (int8 mode: ``(params, quant, z, seed) -> images``).

    ``params`` is the UNet parameter tree (a traced argument), ``z`` is
    (B, z_dim) L2-normalized embeddings, ``seed`` a () int32 scalar seeding
    the initial noise. Returns (B, size, size, 3) float32 in [-1, 1]. The
    batch size is whatever ``z`` carries — it becomes static at export.

    ``int8``: build the UNet in static-calibration int8 serving mode (the
    measured-best mode, +27% on the DDIM-50 headline); the calibrated
    ``'quant'`` collection rides as an extra argument.

    ``output="uint8"``: fold the host's PNG-prep conversion
    ``((clip(x)+1)*127.5).astype(uint8)`` into the program — pixel-identical
    to converting on host (XLA's f32->u8 convert truncates like numpy), and
    the device->host transfer shrinks 4x (measured 0.52 s/16-image batch of
    256px fp32 over the remote tunnel).
    """
    if output not in ("float32", "uint8"):
        raise ValueError(f"output must be 'float32' or 'uint8', got {output!r}")
    net = CLIPCondUNet(
        z_dim=mc.z_dim, base=mc.base, ch_mult=mc.ch_mult, img_ch=mc.img_ch,
        dtype=jnp.bfloat16, int8=True if int8 else None,
    )
    sched = NoiseSchedule.create(mc.timesteps, mc.schedule)
    smp = make_sampler(sampler, sched, eta=eta)

    def model_fn(p, x, zz, t):
        return net.apply(p, x, zz, t)

    def sample(model_params, z, seed):
        rng = jax.random.PRNGKey(seed)
        shape = (z.shape[0], size, size, mc.img_ch)
        x_T = None
        if x_sharding is not None:
            # Materialize x_T with the target sharding so GSPMD propagates it
            # through the whole scan (parallel/sample.py does the same with a
            # device_put; inside a traced/exported program the constraint is
            # the mechanism). x_T comes from split(rng)[1] — exactly the
            # init_rng both samplers would derive internally — and rng itself
            # is passed UNTOUCHED, so sharded and unsharded programs sample
            # the identical trajectory from the same seed.
            x_T = jax.lax.with_sharding_constraint(
                jax.random.normal(jax.random.split(rng)[1], shape, jnp.float32),
                x_sharding,
            )
        x = smp.sample(
            model_fn, z, shape, steps=steps,
            rng=rng, x_T=x_T, model_params=model_params,
        )
        x = jnp.clip(x, -1.0, 1.0)
        if output == "uint8":
            x = ((x + 1.0) * 127.5).astype(jnp.uint8)
        return x

    if int8:
        def run(params, quant, z, seed):
            return sample({"params": params, "quant": quant}, z, seed)
    else:
        def run(params, z, seed):
            return sample({"params": params}, z, seed)

    return run


def export_decompressor(
    params,
    mc: ModelConfig,
    path: PathLike,
    *,
    size: int = 256,
    steps: int = 50,
    sampler: str = "ddim",
    eta: float = 0.0,
    batch_size: int = 16,
    quant=None,
    output: str = "float32",
    platforms: Optional[Sequence[str]] = None,
) -> Path:
    """Trace + lower the full decompress program and serialize it to ``path``.

    ``platforms``: lowering targets, e.g. ``("tpu", "cpu")``; default is the
    current default backend only. ``params`` is used for its SHAPES — the
    artifact carries no weights.

    ``quant``: a calibrated ``'quant'`` collection (``ops.int8.calibrate_unet``)
    switches the program to static-int8 serving mode; serve boxes must then
    pass the same collection at call time (``cli.export_decoder --int8``
    writes it to a ``<path>.quant.msgpack`` sidecar).
    """
    run = jax.jit(make_decompress_fn(
        mc, size=size, steps=steps, sampler=sampler, eta=eta,
        int8=quant is not None, output=output,
    ))
    z_spec = jax.ShapeDtypeStruct((batch_size, mc.z_dim), jnp.float32)
    seed_spec = jax.ShapeDtypeStruct((), jnp.int32)
    kwargs = {} if platforms is None else {"platforms": list(platforms)}
    args = ((_spec_tree(params),) + ((_spec_tree(quant),) if quant is not None else ())
            + (z_spec, seed_spec))
    exp = jax_export.export(run, **kwargs)(*args)
    meta = dict(size=size, steps=steps, sampler=sampler, eta=eta,
                batch_size=batch_size, z_dim=mc.z_dim, img_ch=mc.img_ch,
                int8=quant is not None, output=output)
    return _write_artifact(path, "pixel", meta, exp)


def load_decompressor(path: PathLike):
    """Load an artifact written by :func:`export_decompressor`.

    Returns ``call(params, z, seed=0) -> images`` — for an int8 artifact
    (``call.meta["int8"]``), ``call(params, z, seed=0, quant=...)`` with the
    calibration collection exported alongside. Shape/dtype/tree-structure
    and platform mismatches raise from ``jax.export`` with the exact
    discrepancy; no model code is imported or traced. The export-time static
    choices ride on ``call.meta``.
    """
    exp, meta = _read_artifact(path, "pixel")
    if meta.get("sharded"):
        raise ValueError(
            f"{path}: sharded artifact (mesh {meta['mesh']}) — use "
            f"load_sharded_decompressor(path, mesh)")

    if meta.get("int8"):
        def call(params, z, seed=0, quant=None):
            if quant is None:
                raise ValueError(
                    "int8 artifact: pass quant= (the calibration collection "
                    "exported next to it, <artifact>.quant.msgpack)")
            return exp.call(params, quant, jnp.asarray(z, jnp.float32),
                            jnp.asarray(seed, jnp.int32))
    else:
        def call(params, z, seed=0):
            return exp.call(params, jnp.asarray(z, jnp.float32), jnp.asarray(seed, jnp.int32))

    call.platforms = exp.platforms  # type: ignore[attr-defined]
    call.in_avals = exp.in_avals  # type: ignore[attr-defined]
    call.meta = meta  # type: ignore[attr-defined]
    return call


# ---------------------------------------------------------------------------
# Multi-chip serving: the DP (and optionally spatially) sharded decompress
# program exported over a device mesh. The artifact bakes the mesh SHAPE
# (data, model) and device count; the serving pod reconstructs an equivalent
# mesh and calls through it — GSPMD collectives (halo exchanges for spatial
# conv sharding, GroupNorm stats) ride inside the program.
# ---------------------------------------------------------------------------


def export_sharded_decompressor(
    params,
    mc: ModelConfig,
    path: PathLike,
    mesh,
    *,
    spatial: bool = False,
    size: int = 256,
    steps: int = 50,
    sampler: str = "ddim",
    eta: float = 0.0,
    batch_size: int = 16,
    platforms: Optional[Sequence[str]] = None,
) -> Path:
    """Export the decompress program sharded over ``mesh``.

    Batch shards over the ``data`` axis (embarrassingly parallel — weights
    replicated, no collectives); ``spatial=True`` additionally shards image
    HEIGHT over the ``model`` axis (the high-res lever: activations scale as
    B*H*W*C and GSPMD inserts conv halo exchanges automatically —
    parallel/sample.py:52). Same seed ⇒ same images as the single-device
    artifact.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    from .parallel.mesh import DATA_AXIS, MODEL_AXIS

    n_data = mesh.shape[DATA_AXIS]
    n_model = mesh.shape.get(MODEL_AXIS, 1)
    if batch_size % n_data:
        raise ValueError(f"batch_size {batch_size} not divisible by data axis {n_data}")
    if spatial and size % n_model:
        raise ValueError(f"size {size} not divisible by model axis {n_model}")
    x_sh = NamedSharding(
        mesh, P(DATA_AXIS, MODEL_AXIS, None, None) if spatial else P(DATA_AXIS)
    )
    run = jax.jit(
        make_decompress_fn(mc, size=size, steps=steps, sampler=sampler,
                           eta=eta, x_sharding=x_sh),
        in_shardings=(NamedSharding(mesh, P()), NamedSharding(mesh, P(DATA_AXIS)),
                      NamedSharding(mesh, P())),
        out_shardings=x_sh,
    )
    z_spec = jax.ShapeDtypeStruct((batch_size, mc.z_dim), jnp.float32)
    seed_spec = jax.ShapeDtypeStruct((), jnp.int32)
    kwargs = {} if platforms is None else {"platforms": list(platforms)}
    exp = jax_export.export(run, **kwargs)(_spec_tree(params), z_spec, seed_spec)
    meta = dict(size=size, steps=steps, sampler=sampler, eta=eta,
                batch_size=batch_size, z_dim=mc.z_dim, img_ch=mc.img_ch,
                sharded=True, spatial=spatial,
                mesh={"data": int(n_data), "model": int(n_model)})
    return _write_artifact(path, "pixel", meta, exp)


def load_sharded_decompressor(path: PathLike, mesh):
    """Load a sharded artifact and bind it to an equivalent serving ``mesh``.

    The mesh SHAPE must match the export-time one (``meta["mesh"]``); the
    devices themselves are the serving pod's. Returns
    ``call(params, z, seed=0) -> images`` with inputs placed per the baked
    shardings (params replicated, z batch-sharded)."""
    from .parallel.mesh import DATA_AXIS, MODEL_AXIS

    exp, meta = _read_artifact(path, "pixel")
    if not meta.get("sharded"):
        raise ValueError(f"{path}: not a sharded artifact — use load_decompressor")
    want = meta["mesh"]
    have = {"data": mesh.shape.get(DATA_AXIS, 1), "model": mesh.shape.get(MODEL_AXIS, 1)}
    if {k: int(v) for k, v in have.items()} != want:
        raise ValueError(f"{path}: exported for mesh {want}, got {have}")
    from jax.sharding import NamedSharding, PartitionSpec as P

    repl = NamedSharding(mesh, P())
    z_sh = NamedSharding(mesh, P(DATA_AXIS))

    def call(params, z, seed=0):
        params = jax.device_put(params, jax.tree.map(lambda _: repl, params))
        z = jax.device_put(jnp.asarray(z, jnp.float32), z_sh)
        return exp.call(params, z, jnp.asarray(seed, jnp.int32))

    call.platforms = exp.platforms  # type: ignore[attr-defined]
    call.meta = meta  # type: ignore[attr-defined]
    return call


# ---------------------------------------------------------------------------
# SD latent path: the CFG DDIM / DPM-Solver++ trajectory + VAE decode as one
# exported program. Parameter trees (frozen 860M UNet, VAE, trained adapter)
# are call-time arguments — the artifact stays KB-sized at SD-1.5 scale —
# and guidance_scale rides as a traced scalar, so ONE artifact serves every
# checkpoint of the architecture at every CFG value.
# ---------------------------------------------------------------------------


def make_sd_decompress_fn(
    unet_cfg=None,
    vae_cfg=None,
    *,
    clip_dim: int = 512,
    n_tokens: int = 8,
    adapter_hidden: int = 1024,
    size: int = 512,
    steps: int = 30,
    sampler: str = "ddim",
    eta: float = 0.0,
    cfg_batched: Optional[bool] = None,
    batch_size: int = 1,
    int8: bool = False,
):
    """Build ``(unet_params, vae_params, adapter_params, z, seed,
    guidance_scale) -> images`` for the SD latent path (int8 mode: a
    ``quant`` calibration collection precedes ``z``).

    Mirrors :meth:`StableDiffusionDecoder.sample` (reference
    ``models/sd_decoder.py:76-90`` semantics) as a pure function of the three
    parameter trees. ``cfg_batched=None`` auto-picks the measured-best CFG
    mode for ``batch_size`` (batched pair below the B=4 MXU knee).
    """
    from .models.sd import SD15_UNET, SD15_VAE, SDClipAdapter, SDUNet, AutoencoderKL
    from .models.sd.decoder import SD_SCALING_FACTOR, _cfg_ddim_sample

    if sampler not in ("ddim", "dpmpp"):
        raise ValueError(f"unknown sampler {sampler!r}; choose 'ddim' or 'dpmpp'")
    if sampler == "dpmpp" and eta != 0.0:
        raise ValueError("DPM-Solver++ is deterministic: eta must be 0.0")
    unet_cfg = unet_cfg if unet_cfg is not None else SD15_UNET
    vae_cfg = vae_cfg if vae_cfg is not None else SD15_VAE
    # int8 pins the UNet interior to the int8 MXU; the VAE stays fp (decode
    # quality, small share of sampling time — models/sd/decoder.py:102-104)
    unet = SDUNet(unet_cfg, dtype=jnp.bfloat16, int8=True if int8 else None)
    vae = AutoencoderKL(vae_cfg, dtype=jnp.bfloat16)
    adapter = SDClipAdapter(
        in_dim=clip_dim, ctx_dim=unet_cfg.cross_dim, n_tokens=n_tokens,
        hidden=adapter_hidden, dtype=jnp.float32,
    )
    down = 2 ** (len(vae_cfg.block_out) - 1)
    if size % down:
        raise ValueError(f"size {size} not divisible by the VAE factor {down}")
    shape = (batch_size, size // down, size // down, vae_cfg.latent_ch)
    batched = batch_size <= 4 if cfg_batched is None else bool(cfg_batched)

    def sample(unet_vars, vae_params, adapter_params, z, seed, guidance_scale):
        rng = jax.random.PRNGKey(seed)
        x = _cfg_ddim_sample(
            unet, vae, adapter,
            unet_vars, vae_params, adapter_params,
            z, z, rng, jnp.asarray(guidance_scale, jnp.float32),
            embed_fn=None, shape=shape, steps=int(steps), eta=float(eta),
            inv_weight=0.0, inv_every=1, decode_pixels=True,
            scaling=SD_SCALING_FACTOR, cfg_batched=batched,
            sampler=str(sampler),
        )
        return jnp.clip(x, -1.0, 1.0)

    if int8:
        def run(unet_params, vae_params, adapter_params, quant, z, seed, guidance_scale):
            return sample({"params": unet_params, "quant": quant},
                          vae_params, adapter_params, z, seed, guidance_scale)
    else:
        def run(unet_params, vae_params, adapter_params, z, seed, guidance_scale):
            return sample({"params": unet_params},
                          vae_params, adapter_params, z, seed, guidance_scale)

    return run


def export_sd_decompressor(
    unet_params,
    vae_params,
    adapter_params,
    path: PathLike,
    *,
    unet_cfg=None,
    vae_cfg=None,
    clip_dim: Optional[int] = None,
    n_tokens: Optional[int] = None,
    size: int = 512,
    steps: int = 30,
    sampler: str = "ddim",
    eta: float = 0.0,
    cfg_batched: Optional[bool] = None,
    batch_size: int = 1,
    quant=None,
    platforms: Optional[Sequence[str]] = None,
) -> Path:
    """Trace + lower the full SD decompress program and serialize it.

    All three parameter trees are used for their SHAPES only — the artifact
    carries no weights (at SD-1.5 scale that is the difference between a
    ~100 KiB program and a ~3.4 GB one). The adapter geometry (clip_dim,
    hidden, n_tokens) is inferred from ``adapter_params`` unless overridden.

    ``quant``: a calibrated UNet ``'quant'`` collection
    (:meth:`StableDiffusionDecoder.calibrate_int8_scales` /
    ``decoder.unet_quant``) switches the program to static-int8 serving mode
    (+9.4% at B=8); callers then pass the collection at call time.
    """
    from .models.sd import SD15_UNET

    ucfg = unet_cfg if unet_cfg is not None else SD15_UNET
    fc1 = jnp.shape(adapter_params["fc1"]["kernel"])
    fc2_out = jnp.shape(adapter_params["fc2"]["kernel"])[1]
    clip_dim = int(fc1[0]) if clip_dim is None else clip_dim
    hidden = int(fc1[1])
    n_tokens = fc2_out // ucfg.cross_dim if n_tokens is None else n_tokens
    run = jax.jit(make_sd_decompress_fn(
        unet_cfg, vae_cfg, clip_dim=clip_dim, n_tokens=n_tokens,
        adapter_hidden=hidden, size=size, steps=steps, sampler=sampler,
        eta=eta, cfg_batched=cfg_batched, batch_size=batch_size,
        int8=quant is not None,
    ))
    z_spec = jax.ShapeDtypeStruct((batch_size, clip_dim), jnp.float32)
    seed_spec = jax.ShapeDtypeStruct((), jnp.int32)
    g_spec = jax.ShapeDtypeStruct((), jnp.float32)
    kwargs = {} if platforms is None else {"platforms": list(platforms)}
    args = (_spec_tree(unet_params), _spec_tree(vae_params), _spec_tree(adapter_params))
    args += ((_spec_tree(quant),) if quant is not None else ())
    exp = jax_export.export(run, **kwargs)(*args, z_spec, seed_spec, g_spec)
    meta = dict(size=size, steps=steps, sampler=sampler, eta=eta,
                batch_size=batch_size, z_dim=clip_dim, n_tokens=n_tokens,
                int8=quant is not None)
    return _write_artifact(path, "sd", meta, exp)


def load_sd_decompressor(path: PathLike):
    """Load an artifact written by :func:`export_sd_decompressor`.

    Returns ``call(unet_params, vae_params, adapter_params, z, seed=0,
    guidance_scale=5.0) -> images`` ([-1, 1], NHWC) — int8 artifacts
    (``call.meta["int8"]``) additionally require ``quant=``; export-time
    statics on ``call.meta``."""
    exp, meta = _read_artifact(path, "sd")
    if meta.get("sharded"):
        raise ValueError(
            f"{path}: sharded artifact (mesh {meta['mesh']}) — use "
            f"load_sharded_sd_decompressor(path, mesh)")

    if meta.get("int8"):
        def call(unet_params, vae_params, adapter_params, z, seed=0,
                 guidance_scale=5.0, quant=None):
            if quant is None:
                raise ValueError(
                    "int8 artifact: pass quant= (the calibration collection "
                    "exported next to it, <artifact>.quant.msgpack)")
            return exp.call(
                unet_params, vae_params, adapter_params, quant,
                jnp.asarray(z, jnp.float32), jnp.asarray(seed, jnp.int32),
                jnp.asarray(guidance_scale, jnp.float32),
            )
    else:
        def call(unet_params, vae_params, adapter_params, z, seed=0, guidance_scale=5.0):
            return exp.call(
                unet_params, vae_params, adapter_params,
                jnp.asarray(z, jnp.float32), jnp.asarray(seed, jnp.int32),
                jnp.asarray(guidance_scale, jnp.float32),
            )

    call.platforms = exp.platforms  # type: ignore[attr-defined]
    call.in_avals = exp.in_avals  # type: ignore[attr-defined]
    call.meta = meta  # type: ignore[attr-defined]
    return call


def export_sharded_sd_decompressor(
    unet_params,
    vae_params,
    adapter_params,
    path: PathLike,
    mesh,
    *,
    unet_cfg=None,
    vae_cfg=None,
    size: int = 512,
    steps: int = 30,
    sampler: str = "ddim",
    eta: float = 0.0,
    cfg_batched: Optional[bool] = None,
    batch_size: int = 1,
    platforms: Optional[Sequence[str]] = None,
) -> Path:
    """Export the SD decompress program tensor-parallel over ``mesh``.

    The frozen UNet shards Megatron-style over the ``model`` axis
    (``parallel.tp.sd_unet_tp_specs`` — column/row split attention + GEGLU,
    psum-only collectives), the batch over ``data``; VAE and adapter stay
    replicated. This is the low-latency multi-chip SD serving shape: TP cuts
    per-step latency where batching cannot (B=1 CFG serving).
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    from .models.sd import SD15_UNET
    from .parallel.mesh import DATA_AXIS, MODEL_AXIS
    from .parallel.tp import sd_unet_tp_specs, validate_tp

    ucfg = unet_cfg if unet_cfg is not None else SD15_UNET
    n_data = mesh.shape[DATA_AXIS]
    n_model = mesh.shape.get(MODEL_AXIS, 1)
    validate_tp(ucfg, n_model)
    if batch_size % n_data:
        raise ValueError(f"batch_size {batch_size} not divisible by data axis {n_data}")
    fc1 = jnp.shape(adapter_params["fc1"]["kernel"])
    clip_dim = int(fc1[0])
    n_tokens = jnp.shape(adapter_params["fc2"]["kernel"])[1] // ucfg.cross_dim
    run = make_sd_decompress_fn(
        unet_cfg, vae_cfg, clip_dim=clip_dim, n_tokens=n_tokens,
        adapter_hidden=int(fc1[1]), size=size, steps=steps, sampler=sampler,
        eta=eta, cfg_batched=cfg_batched, batch_size=batch_size,
    )
    repl = NamedSharding(mesh, P())
    unet_sh = jax.tree.map(lambda s: NamedSharding(mesh, s),
                           sd_unet_tp_specs(unet_params))
    jitted = jax.jit(
        run,
        in_shardings=(unet_sh, repl, repl, NamedSharding(mesh, P(DATA_AXIS)),
                      repl, repl),
        out_shardings=NamedSharding(mesh, P(DATA_AXIS)),
    )
    z_spec = jax.ShapeDtypeStruct((batch_size, clip_dim), jnp.float32)
    kwargs = {} if platforms is None else {"platforms": list(platforms)}
    exp = jax_export.export(jitted, **kwargs)(
        _spec_tree(unet_params), _spec_tree(vae_params), _spec_tree(adapter_params),
        z_spec, jax.ShapeDtypeStruct((), jnp.int32), jax.ShapeDtypeStruct((), jnp.float32),
    )
    meta = dict(size=size, steps=steps, sampler=sampler, eta=eta,
                batch_size=batch_size, z_dim=clip_dim, n_tokens=int(n_tokens),
                sharded=True, mesh={"data": int(n_data), "model": int(n_model)})
    return _write_artifact(path, "sd", meta, exp)


def load_sharded_sd_decompressor(path: PathLike, mesh):
    """Load a TP-sharded SD artifact and bind it to an equivalent ``mesh``.

    Inputs are placed per the baked layout (UNet TP-sharded via
    ``sd_unet_tp_specs``, VAE/adapter replicated, z over ``data``)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from .parallel.mesh import DATA_AXIS, MODEL_AXIS
    from .parallel.tp import shard_params_tp

    exp, meta = _read_artifact(path, "sd")
    if not meta.get("sharded"):
        raise ValueError(f"{path}: not a sharded artifact — use load_sd_decompressor")
    want = meta["mesh"]
    have = {"data": int(mesh.shape.get(DATA_AXIS, 1)),
            "model": int(mesh.shape.get(MODEL_AXIS, 1))}
    if have != want:
        raise ValueError(f"{path}: exported for mesh {want}, got {have}")
    repl = NamedSharding(mesh, P())
    z_sh = NamedSharding(mesh, P(DATA_AXIS))

    def call(unet_params, vae_params, adapter_params, z, seed=0, guidance_scale=5.0):
        up = shard_params_tp(mesh, unet_params)
        vp = jax.device_put(vae_params, jax.tree.map(lambda _: repl, vae_params))
        ap = jax.device_put(adapter_params, jax.tree.map(lambda _: repl, adapter_params))
        return exp.call(up, vp, ap, jax.device_put(jnp.asarray(z, jnp.float32), z_sh),
                        jnp.asarray(seed, jnp.int32),
                        jnp.asarray(guidance_scale, jnp.float32))

    call.platforms = exp.platforms  # type: ignore[attr-defined]
    call.meta = meta  # type: ignore[attr-defined]
    return call


__all__ = [
    "make_decompress_fn", "export_decompressor", "load_decompressor",
    "export_sharded_decompressor", "load_sharded_decompressor",
    "make_sd_decompress_fn", "export_sd_decompressor", "load_sd_decompressor",
    "export_sharded_sd_decompressor", "load_sharded_sd_decompressor",
    "read_artifact_meta",
]
