"""SD weight-converter structural tests at the REAL SD-1.5 config.

``jax.eval_shape`` gives the exact param tree (names + shapes) of our SDUNet/
AutoencoderKL without materializing 860M parameters; we synthesize a
diffusers-layout state dict with torch-convention shapes and assert the
converter produces precisely that tree. Catches missing/mis-named keys,
wrong block counts, and transposed shapes. (Transpose *direction* correctness
is covered functionally by the CLIP/UNet converter parity tests, which share
the same linear/conv rules.)
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clip_codec_tpu.models.sd import SD15_UNET, SD15_VAE, AutoencoderKL, SDUNet
from clip_codec_tpu.weights.convert_sd import convert_sd_unet, convert_sd_vae


def _tree_shapes(tree):
    return {jax.tree_util.keystr(p): tuple(v.shape) for p, v in jax.tree_util.tree_flatten_with_path(tree)[0]}


def _synthesize_torch_sd(expected: dict) -> dict:
    """Build a diffusers-layout state dict whose converted shapes must equal
    ``expected`` — by inverting the converter's layout rules per param kind."""
    sd = {}

    def put(torch_key, our_shape, kind):
        if kind == "linear_w":
            shape = (our_shape[1], our_shape[0])
        elif kind == "conv_w":
            kh, kw, ci, co = our_shape
            shape = (co, ci, kh, kw)
        elif kind == "geglu_w":  # diffusers fuses hidden|gate: out = 2x ours
            shape = (our_shape[1] * 2, our_shape[0])
        elif kind == "geglu_b":
            shape = (our_shape[0] * 2,)
        else:  # vectors
            shape = our_shape
        sd[torch_key] = np.zeros(shape, np.float32)

    return sd, put


def _fill_from_expected(expected, mapping):
    sd, put = _synthesize_torch_sd(expected)
    for our_key, (torch_key, kind) in mapping.items():
        assert our_key in expected, f"mapping names unknown param {our_key}"
        put(torch_key, expected[our_key], kind)
    return sd


def _resnet_map(our_prefix, torch_prefix, expected):
    m = {
        f"{our_prefix}['norm1_scale']": (f"{torch_prefix}.norm1.weight", "vec"),
        f"{our_prefix}['norm1_bias']": (f"{torch_prefix}.norm1.bias", "vec"),
        f"{our_prefix}['norm2_scale']": (f"{torch_prefix}.norm2.weight", "vec"),
        f"{our_prefix}['norm2_bias']": (f"{torch_prefix}.norm2.bias", "vec"),
        f"{our_prefix}['conv1']['kernel']": (f"{torch_prefix}.conv1.weight", "conv_w"),
        f"{our_prefix}['conv1']['bias']": (f"{torch_prefix}.conv1.bias", "vec"),
        f"{our_prefix}['conv2']['kernel']": (f"{torch_prefix}.conv2.weight", "conv_w"),
        f"{our_prefix}['conv2']['bias']": (f"{torch_prefix}.conv2.bias", "vec"),
    }
    if f"{our_prefix}['time_emb_proj']['kernel']" in expected:
        m[f"{our_prefix}['time_emb_proj']['kernel']"] = (f"{torch_prefix}.time_emb_proj.weight", "linear_w")
        m[f"{our_prefix}['time_emb_proj']['bias']"] = (f"{torch_prefix}.time_emb_proj.bias", "vec")
    if f"{our_prefix}['conv_shortcut']['kernel']" in expected:
        m[f"{our_prefix}['conv_shortcut']['kernel']"] = (f"{torch_prefix}.conv_shortcut.weight", "conv_w")
        m[f"{our_prefix}['conv_shortcut']['bias']"] = (f"{torch_prefix}.conv_shortcut.bias", "vec")
    return m


def _xattn_map(our_prefix, torch_prefix):
    return {
        f"{our_prefix}['to_q']['kernel']": (f"{torch_prefix}.to_q.weight", "linear_w"),
        f"{our_prefix}['to_k']['kernel']": (f"{torch_prefix}.to_k.weight", "linear_w"),
        f"{our_prefix}['to_v']['kernel']": (f"{torch_prefix}.to_v.weight", "linear_w"),
        f"{our_prefix}['to_out']['kernel']": (f"{torch_prefix}.to_out.0.weight", "linear_w"),
        f"{our_prefix}['to_out']['bias']": (f"{torch_prefix}.to_out.0.bias", "vec"),
    }


def _transformer_map(our_prefix, torch_prefix):
    blk = f"{torch_prefix}.transformer_blocks.0"
    m = {
        f"{our_prefix}['norm_scale']": (f"{torch_prefix}.norm.weight", "vec"),
        f"{our_prefix}['norm_bias']": (f"{torch_prefix}.norm.bias", "vec"),
        f"{our_prefix}['proj_in']['kernel']": (f"{torch_prefix}.proj_in.weight", "conv_w"),
        f"{our_prefix}['proj_in']['bias']": (f"{torch_prefix}.proj_in.bias", "vec"),
        f"{our_prefix}['proj_out']['kernel']": (f"{torch_prefix}.proj_out.weight", "conv_w"),
        f"{our_prefix}['proj_out']['bias']": (f"{torch_prefix}.proj_out.bias", "vec"),
        f"{our_prefix}['block_0']['ff_geglu']['proj_h']['kernel']": (f"{blk}.ff.net.0.proj.weight", "geglu_w"),
        f"{our_prefix}['block_0']['ff_geglu']['proj_h']['bias']": (f"{blk}.ff.net.0.proj.bias", "geglu_b"),
        f"{our_prefix}['block_0']['ff_geglu']['proj_g']['kernel']": (f"{blk}.ff.net.0.proj.weight", "geglu_w"),
        f"{our_prefix}['block_0']['ff_geglu']['proj_g']['bias']": (f"{blk}.ff.net.0.proj.bias", "geglu_b"),
        f"{our_prefix}['block_0']['ff_out']['kernel']": (f"{blk}.ff.net.2.weight", "linear_w"),
        f"{our_prefix}['block_0']['ff_out']['bias']": (f"{blk}.ff.net.2.bias", "vec"),
    }
    for n in (1, 2, 3):
        m[f"{our_prefix}['block_0']['norm{n}']['scale']"] = (f"{blk}.norm{n}.weight", "vec")
        m[f"{our_prefix}['block_0']['norm{n}']['bias']"] = (f"{blk}.norm{n}.bias", "vec")
    m.update(_xattn_map(f"{our_prefix}['block_0']['attn1']", f"{blk}.attn1"))
    m.update(_xattn_map(f"{our_prefix}['block_0']['attn2']", f"{blk}.attn2"))
    return m


@pytest.mark.slow
def test_sd15_unet_converter_structure():
    unet = SDUNet(SD15_UNET)
    shapes = jax.eval_shape(
        unet.init, jax.random.PRNGKey(0),
        jnp.zeros((1, 64, 64, 4)), jnp.zeros((1,), jnp.int32), jnp.zeros((1, 77, 768)),
    )["params"]
    expected = _tree_shapes(shapes)

    mapping = {
        "['conv_in']['kernel']": ("conv_in.weight", "conv_w"),
        "['conv_in']['bias']": ("conv_in.bias", "vec"),
        "['conv_out']['kernel']": ("conv_out.weight", "conv_w"),
        "['conv_out']['bias']": ("conv_out.bias", "vec"),
        "['out_norm_scale']": ("conv_norm_out.weight", "vec"),
        "['out_norm_bias']": ("conv_norm_out.bias", "vec"),
        "['time_linear_1']['kernel']": ("time_embedding.linear_1.weight", "linear_w"),
        "['time_linear_1']['bias']": ("time_embedding.linear_1.bias", "vec"),
        "['time_linear_2']['kernel']": ("time_embedding.linear_2.weight", "linear_w"),
        "['time_linear_2']['bias']": ("time_embedding.linear_2.bias", "vec"),
    }
    mapping.update(_resnet_map("['mid_res_0']", "mid_block.resnets.0", expected))
    mapping.update(_resnet_map("['mid_res_1']", "mid_block.resnets.1", expected))
    mapping.update(_transformer_map("['mid_attn']", "mid_block.attentions.0"))
    n_blocks, lpb = 4, 2
    has_attn = [i < n_blocks - 1 for i in range(n_blocks)]
    for i in range(n_blocks):
        for j in range(lpb):
            mapping.update(_resnet_map(f"['down_{i}_res_{j}']", f"down_blocks.{i}.resnets.{j}", expected))
            if has_attn[i]:
                mapping.update(_transformer_map(f"['down_{i}_attn_{j}']", f"down_blocks.{i}.attentions.{j}"))
        if i < n_blocks - 1:
            mapping[f"['down_{i}_ds']['conv']['kernel']"] = (f"down_blocks.{i}.downsamplers.0.conv.weight", "conv_w")
            mapping[f"['down_{i}_ds']['conv']['bias']"] = (f"down_blocks.{i}.downsamplers.0.conv.bias", "vec")
    for k in range(n_blocks):
        i = n_blocks - 1 - k
        for j in range(lpb + 1):
            mapping.update(_resnet_map(f"['up_{k}_res_{j}']", f"up_blocks.{k}.resnets.{j}", expected))
            if has_attn[i]:
                mapping.update(_transformer_map(f"['up_{k}_attn_{j}']", f"up_blocks.{k}.attentions.{j}"))
        if i > 0:
            mapping[f"['up_{k}_us']['conv']['kernel']"] = (f"up_blocks.{k}.upsamplers.0.conv.weight", "conv_w")
            mapping[f"['up_{k}_us']['conv']['bias']"] = (f"up_blocks.{k}.upsamplers.0.conv.bias", "vec")

    assert set(mapping.keys()) == set(expected.keys()), (
        f"missing: {sorted(set(expected) - set(mapping))[:5]} "
        f"extra: {sorted(set(mapping) - set(expected))[:5]}"
    )
    sd = _fill_from_expected(expected, mapping)
    converted = convert_sd_unet(sd)
    got = _tree_shapes(converted)
    assert got == expected


@pytest.mark.slow
def test_sd15_vae_converter_structure():
    vae = AutoencoderKL(SD15_VAE)
    shapes = jax.eval_shape(
        vae.init, jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), jax.random.PRNGKey(1)
    )["params"]
    expected = _tree_shapes(shapes)

    mapping = {}
    for half, t_half in (("encoder", "encoder"), ("decoder", "decoder")):
        pre = f"['{half}']"
        mapping[f"{pre}['conv_in']['kernel']"] = (f"{t_half}.conv_in.weight", "conv_w")
        mapping[f"{pre}['conv_in']['bias']"] = (f"{t_half}.conv_in.bias", "vec")
        mapping[f"{pre}['conv_out']['kernel']"] = (f"{t_half}.conv_out.weight", "conv_w")
        mapping[f"{pre}['conv_out']['bias']"] = (f"{t_half}.conv_out.bias", "vec")
        mapping[f"{pre}['out_norm_scale']"] = (f"{t_half}.conv_norm_out.weight", "vec")
        mapping[f"{pre}['out_norm_bias']"] = (f"{t_half}.conv_norm_out.bias", "vec")
        mapping.update(_resnet_map(f"{pre}['mid_res_0']", f"{t_half}.mid_block.resnets.0", expected))
        mapping.update(_resnet_map(f"{pre}['mid_res_1']", f"{t_half}.mid_block.resnets.1", expected))
        ap = f"{pre}['mid_attn']"
        tp = f"{t_half}.mid_block.attentions.0"
        mapping[f"{ap}['norm_scale']"] = (f"{tp}.group_norm.weight", "vec")
        mapping[f"{ap}['norm_bias']"] = (f"{tp}.group_norm.bias", "vec")
        for q in ("to_q", "to_k", "to_v"):
            mapping[f"{ap}['{q}']['kernel']"] = (f"{tp}.{q}.weight", "linear_w")
            mapping[f"{ap}['{q}']['bias']"] = (f"{tp}.{q}.bias", "vec")
        mapping[f"{ap}['to_out']['kernel']"] = (f"{tp}.to_out.0.weight", "linear_w")
        mapping[f"{ap}['to_out']['bias']"] = (f"{tp}.to_out.0.bias", "vec")
    mapping["['encoder']['quant_conv']['kernel']"] = ("quant_conv.weight", "conv_w")
    mapping["['encoder']['quant_conv']['bias']"] = ("quant_conv.bias", "vec")
    mapping["['decoder']['post_quant_conv']['kernel']"] = ("post_quant_conv.weight", "conv_w")
    mapping["['decoder']['post_quant_conv']['bias']"] = ("post_quant_conv.bias", "vec")
    for i in range(4):
        for j in range(2):
            mapping.update(_resnet_map(f"['encoder']['down_{i}_res_{j}']", f"encoder.down_blocks.{i}.resnets.{j}", expected))
        if i < 3:
            mapping[f"['encoder']['down_{i}_ds']['conv']['kernel']"] = (f"encoder.down_blocks.{i}.downsamplers.0.conv.weight", "conv_w")
            mapping[f"['encoder']['down_{i}_ds']['conv']['bias']"] = (f"encoder.down_blocks.{i}.downsamplers.0.conv.bias", "vec")
    for k in range(4):
        for j in range(3):
            mapping.update(_resnet_map(f"['decoder']['up_{k}_res_{j}']", f"decoder.up_blocks.{k}.resnets.{j}", expected))
        if k < 3:
            mapping[f"['decoder']['up_{k}_us']['conv']['kernel']"] = (f"decoder.up_blocks.{k}.upsamplers.0.conv.weight", "conv_w")
            mapping[f"['decoder']['up_{k}_us']['conv']['bias']"] = (f"decoder.up_blocks.{k}.upsamplers.0.conv.bias", "vec")

    assert set(mapping.keys()) == set(expected.keys()), (
        f"missing: {sorted(set(expected) - set(mapping))[:5]} "
        f"extra: {sorted(set(mapping) - set(expected))[:5]}"
    )
    sd = _fill_from_expected(expected, mapping)
    converted = convert_sd_vae(sd)
    got = _tree_shapes(converted)
    assert got == expected


def test_geglu_half_order_values():
    """Order-sensitive: diffusers' fused proj is [hidden | gate] and the FF
    computes hidden * gelu(gate). A swapped split passes every structural
    test (shapes match), so pin the VALUES through the converter and module."""
    import jax
    import jax.numpy as jnp

    from clip_codec_tpu.models.sd.layers import GEGLU
    from clip_codec_tpu.weights.convert_sd import _geglu

    rng = np.random.default_rng(3)
    dim_in, dim_out = 6, 10
    w = rng.standard_normal((2 * dim_out, dim_in)).astype(np.float32)  # torch (out, in)
    b = rng.standard_normal((2 * dim_out,)).astype(np.float32)
    params = _geglu({"p.weight": w, "p.bias": b}, "p")
    np.testing.assert_array_equal(params["proj_h"]["kernel"], w.T[:, :dim_out])
    np.testing.assert_array_equal(params["proj_g"]["kernel"], w.T[:, dim_out:])
    np.testing.assert_array_equal(params["proj_h"]["bias"], b[:dim_out])

    x = rng.standard_normal((2, 4, dim_in)).astype(np.float32)
    got = GEGLU(dim_out).apply({"params": params}, jnp.asarray(x))
    # torch semantics: hidden, gate = chunk(proj(x), 2); hidden * gelu(gate)
    h = x @ w.T + b
    hidden, gate = h[..., :dim_out], h[..., dim_out:]
    want = hidden * np.asarray(jax.nn.gelu(jnp.asarray(gate), approximate=False))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6, atol=1e-6)
