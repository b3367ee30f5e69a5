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

# Artifact magic prefix: lets the loader fail with a clear message on a file
# that is not ours (the jax.export blob itself has no recognizable header).
_MAGIC = b"CLPJAXPROG1\n"


def make_decompress_fn(
    mc: ModelConfig,
    size: int = 256,
    steps: int = 50,
    sampler: str = "ddim",
    eta: float = 0.0,
):
    """Build the pure serving function ``(params, z, seed) -> images``.

    ``params`` is the UNet parameter tree (a traced argument), ``z`` is
    (B, z_dim) L2-normalized embeddings, ``seed`` a () int32 scalar seeding
    the initial noise. Returns (B, size, size, 3) float32 in [-1, 1]. The
    batch size is whatever ``z`` carries — it becomes static at export.
    """
    net = CLIPCondUNet(
        z_dim=mc.z_dim, base=mc.base, ch_mult=mc.ch_mult, img_ch=mc.img_ch,
        dtype=jnp.bfloat16,
    )
    sched = NoiseSchedule.create(mc.timesteps, mc.schedule)
    smp = make_sampler(sampler, sched, eta=eta)

    def model_fn(p, x, zz, t):
        return net.apply(p, x, zz, t)

    def run(params, z, seed):
        rng = jax.random.PRNGKey(seed)
        x = smp.sample(
            model_fn, z, (z.shape[0], size, size, mc.img_ch), steps=steps,
            rng=rng, model_params={"params": params},
        )
        return jnp.clip(x, -1.0, 1.0)

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
    platforms: Optional[Sequence[str]] = None,
) -> Path:
    """Trace + lower the full decompress program and serialize it to ``path``.

    ``platforms``: lowering targets, e.g. ``("tpu", "cpu")``; default is the
    current default backend only. ``params`` is used for its SHAPES — the
    artifact carries no weights.
    """
    run = jax.jit(make_decompress_fn(mc, size=size, steps=steps, sampler=sampler, eta=eta))
    p_spec = jax.tree.map(lambda a: jax.ShapeDtypeStruct(jnp.shape(a), jnp.asarray(a).dtype), params)
    z_spec = jax.ShapeDtypeStruct((batch_size, mc.z_dim), jnp.float32)
    seed_spec = jax.ShapeDtypeStruct((), jnp.int32)
    kwargs = {} if platforms is None else {"platforms": list(platforms)}
    exp = jax_export.export(run, **kwargs)(p_spec, z_spec, seed_spec)
    path = Path(path)
    path.write_bytes(_MAGIC + exp.serialize())
    return path


def load_decompressor(path: PathLike):
    """Load an artifact written by :func:`export_decompressor`.

    Returns ``call(params, z, seed=0) -> images``. Shape/dtype/tree-structure
    and platform mismatches raise from ``jax.export`` with the exact
    discrepancy; no model code is imported or traced.
    """
    blob = Path(path).read_bytes()
    if not blob.startswith(_MAGIC):
        raise ValueError(f"{path}: not a clip_codec_tpu exported program")
    exp = jax_export.deserialize(bytearray(blob[len(_MAGIC):]))

    def call(params, z, seed=0):
        return exp.call(params, jnp.asarray(z, jnp.float32), jnp.asarray(seed, jnp.int32))

    call.platforms = exp.platforms  # type: ignore[attr-defined]
    call.in_avals = exp.in_avals  # type: ignore[attr-defined]
    return call


__all__ = ["make_decompress_fn", "export_decompressor", "load_decompressor"]
