"""CLIP BPE tokenizer mechanics with a synthetic merges file (the real
49152-merge vocab is not bundled — zero-egress build)."""

import gzip

import numpy as np
import pytest

from clip_codec_tpu.encoders.tokenizer import CLIPTokenizer, bytes_to_unicode


@pytest.fixture
def tiny_bpe(tmp_path):
    """Minimal merges file: version line + a few merges."""
    merges = ["t h", "th e</w>", "h e", "l o", "lo w</w>"]
    p = tmp_path / "bpe.txt.gz"
    with gzip.open(p, "wt", encoding="utf-8") as f:
        f.write("#version: 0.2\n")
        f.write("\n".join(merges) + "\n")
    return str(p)


def test_bytes_to_unicode_reversible():
    m = bytes_to_unicode()
    assert len(m) == 256
    assert len(set(m.values())) == 256


def test_missing_vocab_raises(monkeypatch):
    monkeypatch.delenv("CLIP_BPE_PATH", raising=False)
    with pytest.raises(FileNotFoundError, match="CLIP_BPE_PATH"):
        CLIPTokenizer()


def test_merges_apply(tiny_bpe):
    tok = CLIPTokenizer(tiny_bpe, context_length=16)
    # "the" -> th + e</w> -> the</w> via the two merges
    ids = tok.encode("the")
    assert len(ids) == 1
    assert ids[0] == tok.encoder["the</w>"]
    # "low" -> lo + w</w> -> low</w>
    ids = tok.encode("low")
    assert len(ids) == 1


def test_call_format(tiny_bpe):
    tok = CLIPTokenizer(tiny_bpe, context_length=8)
    out = tok(["the low", "the"])
    assert out.shape == (2, 8)
    assert out.dtype == np.int32
    assert out[0, 0] == tok.sot
    # EOT after the encoded tokens, zero padding after
    row = list(out[0])
    assert tok.eot in row
    assert row[row.index(tok.eot) + 1 :] == [0] * (8 - row.index(tok.eot) - 1)


def test_lowercase_and_whitespace(tiny_bpe):
    tok = CLIPTokenizer(tiny_bpe, context_length=16)
    assert tok.encode("THE") == tok.encode("the")
    assert tok.encode("  the   low  ") == tok.encode("the low")


def test_truncation_keeps_eot(tiny_bpe):
    tok = CLIPTokenizer(tiny_bpe, context_length=4)
    out = tok("the low the low the low")
    assert out.shape == (1, 4)
    assert out[0, 0] == tok.sot
    assert out[0, -1] == tok.eot


def test_real_vocab_goldens():
    """Token-id goldens vs open_clip's ViT-B-32 tokenizer, runnable whenever
    a real ``bpe_simple_vocab_16e6.txt.gz`` is provided via CLIP_BPE_PATH
    (the zero-egress build cannot bundle it). The expected ids are the
    canonical openai/CLIP values: SOT=49406, EOT=49407, and the README
    example "a photo of a cat" -> [320, 1125, 539, 320, 2368]."""
    import os

    path = os.environ.get("CLIP_BPE_PATH")
    if not path or not __import__("pathlib").Path(path).exists():
        pytest.skip("real CLIP BPE vocab not available (zero-egress build)")
    tok = CLIPTokenizer(path)
    assert tok.sot == 49406 and tok.eot == 49407
    out = tok(["a photo of a cat"])
    np.testing.assert_array_equal(
        out[0, :7], [49406, 320, 1125, 539, 320, 2368, 49407]
    )
    # cleaning-stage integration: mojibake and entities repair before BPE
    np.testing.assert_array_equal(
        tok(["a photo of a cafÃ©"]), tok(["a photo of a café"])
    )
    np.testing.assert_array_equal(
        tok(["fish &amp; chips"]), tok(["fish & chips"])
    )
