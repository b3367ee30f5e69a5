"""Encoder parity: Flax CLIP towers vs a tiny random-init HuggingFace CLIPModel
(no downloads — transformers builds the architecture locally)."""

import numpy as np
import pytest

from clip_codec_tpu.encoders.clip import CLIPConfig, CLIPModel, preprocess_pil


def _tiny_cfgs():
    cfg = CLIPConfig(
        image_size=32, patch_size=16,
        vision_dim=32, vision_depth=2, vision_heads=2, vision_mlp=64,
        text_dim=32, text_depth=2, text_heads=2, text_mlp=64,
        vocab_size=100, context_length=12, embed_dim=16, eos_token_id=99,
    )
    return cfg


@pytest.fixture(scope="module")
def tiny_hf():
    transformers = pytest.importorskip("transformers")
    import torch

    torch.manual_seed(0)
    hf_cfg = transformers.CLIPConfig(
        vision_config=dict(hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
                           intermediate_size=64, image_size=32, patch_size=16, hidden_act="quick_gelu"),
        text_config=dict(hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
                         intermediate_size=64, vocab_size=100, max_position_embeddings=12,
                         hidden_act="quick_gelu", eos_token_id=99),
        projection_dim=16,
    )
    return transformers.CLIPModel(hf_cfg).eval()


def test_vision_tower_parity(tiny_hf, rng):
    import torch

    from clip_codec_tpu.weights.convert_clip import convert_clip_hf

    cfg = _tiny_cfgs()
    params = {"params": convert_clip_hf(tiny_hf.state_dict(), vision_depth=2, text_depth=2)}
    model = CLIPModel(cfg)

    x = rng.standard_normal((2, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        ref = tiny_hf.get_image_features(pixel_values=torch.from_numpy(x)).numpy()
    ours = np.asarray(model.apply(params, x.transpose(0, 2, 3, 1), method=CLIPModel.encode_image))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_text_tower_parity(tiny_hf, rng):
    import torch

    from clip_codec_tpu.weights.convert_clip import convert_clip_hf

    cfg = _tiny_cfgs()
    params = {"params": convert_clip_hf(tiny_hf.state_dict(), vision_depth=2, text_depth=2)}
    model = CLIPModel(cfg)

    # tokens end with the EOS id (99 = max id, so argmax finds it like open_clip)
    tokens = np.array([[5, 17, 42, 99, 0, 0, 0, 0, 0, 0, 0, 0],
                       [8, 99, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]], dtype=np.int64)
    attn = (tokens != 0).astype(np.int64)
    with torch.no_grad():
        ref = tiny_hf.get_text_features(
            input_ids=torch.from_numpy(tokens), attention_mask=torch.from_numpy(attn)
        ).numpy()
    ours = np.asarray(model.apply(params, tokens.astype(np.int32), method=CLIPModel.encode_text))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_openai_format_conversion(tiny_hf, rng):
    """Build an OpenAI-style state dict from the HF one and check both
    converters produce identical params."""
    import torch

    from clip_codec_tpu.weights.convert_clip import convert_clip_hf, convert_clip_openai

    sd = tiny_hf.state_dict()
    oa = {}
    oa["visual.conv1.weight"] = sd["vision_model.embeddings.patch_embedding.weight"]
    oa["visual.class_embedding"] = sd["vision_model.embeddings.class_embedding"]
    oa["visual.positional_embedding"] = sd["vision_model.embeddings.position_embedding.weight"]
    oa["visual.ln_pre.weight"] = sd["vision_model.pre_layrnorm.weight"]
    oa["visual.ln_pre.bias"] = sd["vision_model.pre_layrnorm.bias"]
    oa["visual.ln_post.weight"] = sd["vision_model.post_layernorm.weight"]
    oa["visual.ln_post.bias"] = sd["vision_model.post_layernorm.bias"]
    oa["visual.proj"] = sd["visual_projection.weight"].T
    oa["token_embedding.weight"] = sd["text_model.embeddings.token_embedding.weight"]
    oa["positional_embedding"] = sd["text_model.embeddings.position_embedding.weight"]
    oa["ln_final.weight"] = sd["text_model.final_layer_norm.weight"]
    oa["ln_final.bias"] = sd["text_model.final_layer_norm.bias"]
    oa["text_projection"] = sd["text_projection.weight"].T
    for tower, pref in [("vision_model", "visual.transformer"), ("text_model", "transformer")]:
        for i in range(2):
            src = f"{tower}.encoder.layers.{i}"
            dst = f"{pref}.resblocks.{i}"
            oa[f"{dst}.attn.in_proj_weight"] = torch.cat(
                [sd[f"{src}.self_attn.q_proj.weight"], sd[f"{src}.self_attn.k_proj.weight"],
                 sd[f"{src}.self_attn.v_proj.weight"]], dim=0)
            oa[f"{dst}.attn.in_proj_bias"] = torch.cat(
                [sd[f"{src}.self_attn.q_proj.bias"], sd[f"{src}.self_attn.k_proj.bias"],
                 sd[f"{src}.self_attn.v_proj.bias"]], dim=0)
            oa[f"{dst}.attn.out_proj.weight"] = sd[f"{src}.self_attn.out_proj.weight"]
            oa[f"{dst}.attn.out_proj.bias"] = sd[f"{src}.self_attn.out_proj.bias"]
            oa[f"{dst}.ln_1.weight"] = sd[f"{src}.layer_norm1.weight"]
            oa[f"{dst}.ln_1.bias"] = sd[f"{src}.layer_norm1.bias"]
            oa[f"{dst}.ln_2.weight"] = sd[f"{src}.layer_norm2.weight"]
            oa[f"{dst}.ln_2.bias"] = sd[f"{src}.layer_norm2.bias"]
            oa[f"{dst}.mlp.c_fc.weight"] = sd[f"{src}.mlp.fc1.weight"]
            oa[f"{dst}.mlp.c_fc.bias"] = sd[f"{src}.mlp.fc1.bias"]
            oa[f"{dst}.mlp.c_proj.weight"] = sd[f"{src}.mlp.fc2.weight"]
            oa[f"{dst}.mlp.c_proj.bias"] = sd[f"{src}.mlp.fc2.bias"]

    a = convert_clip_hf(sd, 2, 2)
    b = convert_clip_openai(oa, 2, 2, vision_dim=32, text_dim=32)
    import jax

    for la, lb in zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)):
        np.testing.assert_allclose(la, lb, rtol=1e-6)


def test_preprocess_shapes():
    from PIL import Image

    img = Image.new("RGB", (100, 60), (128, 64, 32))
    out = preprocess_pil(img, image_size=32)
    assert out.shape == (32, 32, 3)
    assert out.dtype == np.float32
    # Constant image -> constant normalized values
    expect = ((np.array([128, 64, 32]) / 255.0) - np.array([0.48145466, 0.4578275, 0.40821073])) / np.array(
        [0.26862954, 0.26130258, 0.27577711]
    )
    np.testing.assert_allclose(out[0, 0], expect, rtol=1e-5)


def test_dino_parity(rng):
    transformers = pytest.importorskip("transformers")
    import torch

    from clip_codec_tpu.encoders.dino import DinoConfig, DinoV2, convert_dino_hf

    torch.manual_seed(0)
    hf = transformers.Dinov2Model(
        transformers.Dinov2Config(hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
                                  image_size=28, patch_size=14)
    ).eval()
    params = {"params": convert_dino_hf(hf.state_dict(), depth=2)}
    model = DinoV2(DinoConfig(image_size=28, patch_size=14, dim=32, depth=2, heads=2))

    x = rng.standard_normal((2, 3, 28, 28)).astype(np.float32)
    with torch.no_grad():
        out = hf(pixel_values=torch.from_numpy(x))
        # num_classes=0 timm pooling == CLS token after final layernorm
        ref = out.last_hidden_state[:, 0].numpy()
    ours = np.asarray(model.apply(params, x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_dino_preprocess():
    from clip_codec_tpu.encoders.dino import preprocess_dino

    img = np.full((20, 30, 3), 0.5, dtype=np.float32)
    out = preprocess_dino(img, image_size=28)
    assert out.shape == (28, 28, 3)
    expect = (0.5 - np.array([0.485, 0.456, 0.406])) / np.array([0.229, 0.224, 0.225])
    np.testing.assert_allclose(out[0, 0], expect, rtol=1e-5)


def test_resize_matches_torch_interpolate(rng):
    """jax.image.resize(antialias=False, 'bilinear') must equal torch
    F.interpolate(mode='bilinear', align_corners=False) — the op behind every
    reference resize. Guards the antialias=False convention."""
    torch = pytest.importorskip("torch")
    import jax
    import jax.numpy as jnp

    x = rng.standard_normal((2, 3, 37, 53)).astype(np.float32)
    ref = torch.nn.functional.interpolate(
        torch.from_numpy(x), size=(16, 16), mode="bilinear", align_corners=False
    ).numpy()
    ours = np.asarray(jax.image.resize(
        jnp.asarray(x.transpose(0, 2, 3, 1)), (2, 16, 16, 3), method="bilinear", antialias=False
    )).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)
    # upsampling too
    ref_up = torch.nn.functional.interpolate(
        torch.from_numpy(x), size=(64, 64), mode="bilinear", align_corners=False
    ).numpy()
    ours_up = np.asarray(jax.image.resize(
        jnp.asarray(x.transpose(0, 2, 3, 1)), (2, 64, 64, 3), method="bilinear", antialias=False
    )).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(ours_up, ref_up, rtol=1e-5, atol=1e-5)


def test_load_clip_params_autodetect(tiny_hf, tmp_path):
    """load_clip_params handles torch .bin, safetensors, and OpenAI naming."""
    torch = pytest.importorskip("torch")
    import jax

    from clip_codec_tpu.weights.convert_clip import convert_clip_hf, load_clip_params

    want = convert_clip_hf(tiny_hf.state_dict(), 2, 2)

    p_bin = tmp_path / "clip.bin"
    torch.save(tiny_hf.state_dict(), p_bin)
    got = load_clip_params(str(p_bin), 2, 2)
    for a, b in zip(jax.tree_util.tree_leaves(want), jax.tree_util.tree_leaves(got)):
        np.testing.assert_array_equal(a, b)

    try:
        from safetensors.numpy import save_file
    except ImportError:
        pytest.skip("safetensors unavailable")
    sd_np = {k: v.detach().numpy() for k, v in tiny_hf.state_dict().items()}
    p_st = tmp_path / "clip.safetensors"
    save_file(sd_np, str(p_st))
    got2 = load_clip_params(str(p_st), 2, 2)
    for a, b in zip(jax.tree_util.tree_leaves(want), jax.tree_util.tree_leaves(got2)):
        np.testing.assert_array_equal(a, b)
