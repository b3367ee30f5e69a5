"""Opt-in int8 inference convolutions (v5e MXU int8 runs ~1.8x bf16).

Measured at the pixel U-Net's hot shape ((16,256,256,128), 3x3): bf16
133 TF/s vs int8 240 TOP/s on one v5e. This module makes that available as
an **inference-only, opt-in** mode for the big U-Net convolutions:

- weights: per-output-channel symmetric int8 (absmax/127), quantized
  on the fly inside the jit (the kernel is ~300 KB — negligible);
- activations: dynamic per-tensor symmetric int8, or STATIC pre-calibrated
  scales via :func:`calibrate_int8` (pass the returned ``'quant'``
  collection alongside ``'params'``) — the static path skips the per-conv
  absmax read and measured 15.8 vs 13.0 img/s on the DDIM-50 headline
  (+28% over bf16 parity vs +5.4% dynamic);
- conv accumulates int32 on the MXU, dequantizes to fp32, adds bias.

The reference has no quantized inference (it autocasts bf16,
``train/diffusion_train.py:107``); this is a beyond-parity serving mode.
Select per model via ``CLIPCondUNet(int8=True)`` (the parameter tree is
IDENTICAL to ``nn.Conv``'s, so any trained checkpoint serves in int8
without conversion); :func:`set_int8_conv` flips the process default that
``int8=None`` models read at trace time, so an int8 server and a bf16
parity model can coexist in one process by constructing each explicitly.
Quantization error changes outputs — measure the PSNR delta on your store
before shipping (see docs/performance.md for the measured delta at
flagship scale). round() kills gradients, so this is for sampling/serving
only, never training.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

_USE_INT8 = False


def set_int8_conv(enabled: bool) -> None:
    """Set the process default for models built with ``int8=None``
    (read at trace time). Models with an explicit ``int8=`` ignore this."""
    global _USE_INT8
    _USE_INT8 = bool(enabled)


def int8_enabled() -> bool:
    return _USE_INT8


def dynamic_int8_conv(
    x: jax.Array,
    kernel: jax.Array,
    bias: Optional[jax.Array],
    strides: Tuple[int, int] = (1, 1),
    padding: Union[str, Sequence[Tuple[int, int]]] = "SAME",
) -> jax.Array:
    """NHWC x HWIO int8 convolution with dynamic symmetric quantization.

    Returns fp32 (caller casts); exact shapes/padding semantics of
    ``lax.conv_general_dilated``.
    """
    w_scale = jnp.max(jnp.abs(kernel), axis=(0, 1, 2)) / 127.0  # (O,)
    w_scale = jnp.maximum(w_scale, 1e-12)
    wq = jnp.clip(jnp.round(kernel / w_scale), -127, 127).astype(jnp.int8)
    x32 = x.astype(jnp.float32)
    x_scale = jnp.maximum(jnp.max(jnp.abs(x32)), 1e-12) / 127.0  # scalar
    xq = jnp.clip(jnp.round(x32 / x_scale), -127, 127).astype(jnp.int8)
    dn = jax.lax.conv_dimension_numbers(x.shape, kernel.shape, ("NHWC", "HWIO", "NHWC"))
    y = jax.lax.conv_general_dilated(
        xq, wq, strides, padding, dimension_numbers=dn,
        preferred_element_type=jnp.int32,
    )
    y = y.astype(jnp.float32) * (w_scale * x_scale)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y


def static_int8_conv(
    x: jax.Array,
    kernel: jax.Array,
    bias: Optional[jax.Array],
    x_scale: jax.Array,
    strides: Tuple[int, int] = (1, 1),
    padding: Union[str, Sequence[Tuple[int, int]]] = "SAME",
) -> jax.Array:
    """Like :func:`dynamic_int8_conv` but with a pre-calibrated activation
    absmax (``x_scale`` = absmax/127 NOT yet divided — pass the absmax) —
    skips the on-the-fly absmax reduction, which costs a full read of ``x``
    per conv in the dynamic path."""
    w_scale = jnp.max(jnp.abs(kernel), axis=(0, 1, 2)) / 127.0
    w_scale = jnp.maximum(w_scale, 1e-12)
    wq = jnp.clip(jnp.round(kernel / w_scale), -127, 127).astype(jnp.int8)
    s = jnp.maximum(x_scale, 1e-12) / 127.0
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / s), -127, 127).astype(jnp.int8)
    dn = jax.lax.conv_dimension_numbers(x.shape, kernel.shape, ("NHWC", "HWIO", "NHWC"))
    y = jax.lax.conv_general_dilated(
        xq, wq, strides, padding, dimension_numbers=dn,
        preferred_element_type=jnp.int32,
    )
    y = y.astype(jnp.float32) * (w_scale * s)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y


class Int8Conv(nn.Module):
    """Drop-in for the ``nn.Conv`` configurations the U-Net uses, with the
    SAME parameter tree (kernel (H,W,I,O) lecun_normal + bias zeros) — any
    checkpoint trained with ``nn.Conv`` loads unchanged.

    Activation scales: dynamic per-tensor absmax by default. When the caller
    passes a ``'quant'`` variable collection (produced by
    :func:`calibrate_int8`), the stored per-layer absmax is used instead —
    the static path skips one full read of the activation per conv."""

    features: int
    kernel_size: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    padding: Union[str, Sequence[Tuple[int, int]]] = "SAME"
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        kh, kw = self.kernel_size
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (kh, kw, x.shape[-1], self.features), jnp.float32,
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            if self.use_bias
            else None
        )
        if self.is_mutable_collection("quant") and not self.is_initializing():
            # Calibration pass (apply with mutable=['quant'], as
            # :func:`calibrate_int8` does): exact fp conv; record the
            # running absmax into the mutable 'quant' collection. No global
            # flag — the apply itself declares the mode. The
            # is_initializing() guard keeps Module.init (where every
            # collection is mutable) from seeding bogus zero-input scales
            # into the returned variables (review r3 #1).
            qv = self.variable("quant", "x_absmax", lambda: jnp.zeros((), jnp.float32))
            qv.value = jnp.maximum(qv.value, jnp.max(jnp.abs(x.astype(jnp.float32))))
            dn = jax.lax.conv_dimension_numbers(x.shape, kernel.shape, ("NHWC", "HWIO", "NHWC"))
            y = jax.lax.conv_general_dilated(
                x.astype(self.dtype), kernel.astype(self.dtype),
                tuple(self.strides), self.padding, dimension_numbers=dn,
            ).astype(jnp.float32)
            if bias is not None:
                y = y + bias
        elif self.has_variable("quant", "x_absmax"):
            y = static_int8_conv(
                x, kernel, bias, self.get_variable("quant", "x_absmax"),
                tuple(self.strides), self.padding,
            )
        else:
            y = dynamic_int8_conv(x, kernel, bias, tuple(self.strides), self.padding)
        return y.astype(self.dtype)


class Int8Dense(nn.Module):
    """Drop-in for ``nn.Dense`` with the SAME parameter tree (kernel
    (in, out) lecun_normal + bias zeros) — any trained checkpoint serves in
    int8 unchanged. Per-column symmetric int8 weights, per-tensor dynamic
    (or 'quant'-calibrated static) activation scales, int32 MXU
    accumulation. Built for the SD UNet's spatial-transformer projections
    (to_q/k/v/out, GEGLU, ff_out) — its FLOP-bound serving path."""

    features: int
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (x.shape[-1], self.features), jnp.float32
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            if self.use_bias
            else None
        )
        if self.is_mutable_collection("quant") and not self.is_initializing():
            # see Int8Conv: init() must not seed calibration scales
            qv = self.variable("quant", "x_absmax", lambda: jnp.zeros((), jnp.float32))
            qv.value = jnp.maximum(qv.value, jnp.max(jnp.abs(x.astype(jnp.float32))))
            y = jnp.dot(x.astype(self.dtype), kernel.astype(self.dtype)).astype(jnp.float32)
        else:
            w_scale = jnp.maximum(jnp.max(jnp.abs(kernel), axis=0) / 127.0, 1e-12)  # (out,)
            wq = jnp.clip(jnp.round(kernel / w_scale), -127, 127).astype(jnp.int8)
            x32 = x.astype(jnp.float32)
            if self.has_variable("quant", "x_absmax"):
                absmax = self.get_variable("quant", "x_absmax")
            else:
                absmax = jnp.max(jnp.abs(x32))
            s = jnp.maximum(absmax, 1e-12) / 127.0
            xq = jnp.clip(jnp.round(x32 / s), -127, 127).astype(jnp.int8)
            y = jax.lax.dot_general(
                xq, wq, (((xq.ndim - 1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32) * (w_scale * s)
        if bias is not None:
            y = y + bias
        return y.astype(self.dtype)


def calibrate_unet(net_apply, variables, size: int, z_dim: int,
                   timesteps=1000, batch: int = 4, seed: int = 0):
    """Convenience calibration for a ``CLIPCondUNet``-shaped apply
    (``net_apply(vars, x, z, t)``): noise-scale images and L2-normalized
    random embeddings across the timestep range — the distribution a DDIM
    trajectory feeds the net. Returns the ``'quant'`` collection.

    ``timesteps``: the model's SCHEDULE LENGTH (int) — calibration t values
    are taken at the 95%/50%/5% points of it, so short-schedule models are
    calibrated inside their real sampling range — or an explicit sequence
    of t values."""
    import numpy as np

    if isinstance(timesteps, int):
        t_values = [max(0, min(timesteps - 1, int(round(f * timesteps))))
                    for f in (0.95, 0.5, 0.05)]
    else:
        t_values = [int(t) for t in timesteps]
    r = np.random.default_rng(seed)
    x = jnp.asarray(r.standard_normal((batch, size, size, 3)), jnp.float32)
    z = r.standard_normal((batch, z_dim)).astype("float32")
    z = jnp.asarray(z / (np.linalg.norm(z, axis=1, keepdims=True) + 1e-9))
    batches = [(x, z, jnp.full((batch,), int(t), jnp.int32)) for t in t_values]
    return calibrate_int8(net_apply, variables, *batches)


def calibrate_int8(apply_fn, variables, *batches):
    """Record per-conv activation absmax for the static int8 path.

    ``apply_fn(variables, *one_batch, mutable=['quant'])`` must be the
    apply of a model whose trace contains :class:`Int8Conv` modules
    (``int8=True`` or the process default on); runs every batch in fp and
    returns the 'quant' collection to merge into inference variables:

        net = CLIPCondUNet(..., int8=True)
        quant = calibrate_int8(net.apply, {'params': params}, (x1, z1, t1), ...)
        y = net.apply({'params': params, 'quant': quant}, x, z, t)
    """
    if not batches:
        raise RuntimeError("calibration needs at least one batch")
    quant = {}
    for batch in batches:
        _, upd = apply_fn({**variables, "quant": quant} if quant else variables,
                          *batch, mutable=["quant"])
        quant = upd.get("quant", {})
        if not quant:
            raise RuntimeError(
                "calibration recorded nothing — the model has no Int8Conv in "
                "its trace; build it with int8=True (or set_int8_conv(True) "
                "first)"
            )
    return quant


def conv_module(int8: Optional[bool] = None):
    """``Int8Conv`` or ``nn.Conv``. ``int8=None`` (the default) reads the
    process switch at trace time; an explicit True/False pins the model."""
    use = _USE_INT8 if int8 is None else int8
    return Int8Conv if use else nn.Conv


def dense_module(int8: Optional[bool] = None):
    """``Int8Dense`` or ``nn.Dense``, same selection rule as
    :func:`conv_module`."""
    use = _USE_INT8 if int8 is None else int8
    return Int8Dense if use else nn.Dense
