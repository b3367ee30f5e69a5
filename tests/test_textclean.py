"""Goldens for the ftfy-equivalent ``textclean`` pipeline.

Expected strings are ftfy's own documented outputs for its canonical
examples (ftfy README/docs + the mojibake test corpus), so this pins our
native implementation to the library the reference depends on through
open_clip's ``basic_clean`` (``cli/search_text.py:60``) without needing
ftfy installed. Token-level goldens against
``open_clip.get_tokenizer('ViT-B-32')`` additionally require the 49152-merge
BPE table, which a zero-egress build cannot fetch —
``tests/test_tokenizer.py::test_real_vocab_goldens`` runs them whenever
``CLIP_BPE_PATH`` is provided.
"""

import numpy as np
import pytest

from clip_codec_tpu.encoders.textclean import basic_clean, fix_encoding, fix_text

# (input, expected) — ftfy.fix_text canonical behavior
GOLDENS = [
    # single-pass UTF-8-as-windows-1252 mojibake
    ("CafÃ©", "Café"),
    ("franÃ§ais", "français"),
    ("Ã¼ber cool", "über cool"),
    ("ubuntuÃ¢â‚¬Â¢", "ubuntu•"),
    ("IKEAâ€™s", "IKEA's"),  # ’ uncurls to '
    ("â€œquotedâ€\x9d", '"quoted"'),
    ("This â€” that", 'This — that'),
    # double-encoded mojibake needs two repair passes
    ("doesnÃ¢â‚¬â„¢t", "doesn't"),
    ("The Mona Lisa doesnÃ¢â‚¬â„¢t have eyebrows.",
     "The Mona Lisa doesn't have eyebrows."),
    # sloppy-1252: 0x9D is unmapped in real cp1252 but must round-trip
    ("hereâ€\x9dproblem", 'here"problem'),
    # NOT mojibake — must be left alone
    ("déjà vu", "déjà vu"),
    ("naïve café résumé", "naïve café résumé"),
    ("Schrödinger", "Schrödinger"),
    ("日本語のテキスト", "日本語のテキスト"),
    ("emoji 😀 stays", "emoji 😀 stays"),
    # ligatures
    ("ﬁnal ﬂow oﬃce", "final flow office"),
    # fullwidth forms
    ("ＨＥＬＬＯ ｗｏｒｌｄ １２３", "HELLO world 123"),
    # curly quotes / dashes
    ("‘single’ and “double”", "'single' and \"double\""),
    # terminal escapes + control chars
    ("\x1b[31mred\x1b[0m text", "red text"),
    ("null\x00byte\x07bell", "nullbytebell"),
    # NFC normalization (combining accent composed)
    ("café", "café"),
    # line-break normalization
    ("a\r\nb\rc d", "a\nb\nc\nd"),
]


@pytest.mark.parametrize("raw,expected", GOLDENS, ids=[repr(g[0])[:30] for g in GOLDENS])
def test_fix_text_goldens(raw, expected):
    assert fix_text(raw) == expected


def test_surrogate_repair():
    s = "bad \ud83d\ude00 pair"  # surrogate pair, not a real char
    out = fix_text(s)
    assert out == "bad \U0001F600 pair"


def test_fix_encoding_is_idempotent_on_clean_text():
    for s in ["plain ascii", "Café déjà vu", "“quotes”", "русский текст", "中文"]:
        assert fix_encoding(s) == s


def test_basic_clean_html_double_unescape():
    # open_clip double-unescapes: &amp;amp; -> &amp; -> &
    assert basic_clean("black &amp;amp; white") == "black & white"
    assert basic_clean("fish &amp; chips") == "fish & chips"
    # mojibake + entities together
    assert basic_clean("CafÃ© &amp; bar") == "Café & bar"


def test_tokenizer_uses_fix_text(tmp_path):
    """The tokenizer's clean stage must route through fix_text: mojibake and
    its repaired form tokenize identically."""
    import gzip

    from clip_codec_tpu.encoders.tokenizer import CLIPTokenizer

    p = tmp_path / "bpe.txt.gz"
    with gzip.open(p, "wt", encoding="utf-8") as f:
        f.write("#version: 0.2\nc a\nca f\ncaf Ã©</w>\n")
    tok = CLIPTokenizer(str(p), context_length=16)
    assert tok.encode("CafÃ©") == tok.encode("Café")
    assert np.array_equal(tok(["doesnÃ¢â‚¬â„¢t"]), tok(["doesn't"]))
