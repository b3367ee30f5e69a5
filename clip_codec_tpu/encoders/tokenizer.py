"""CLIP BPE tokenizer — native implementation of the standard algorithm.

The reference uses ``open_clip.get_tokenizer('ViT-B-32')``
(``cli/search_text.py:60``). This is the same byte-level BPE scheme
(lowercase, whitespace-collapse, byte-to-unicode mapping, ``</w>`` word
suffix, ``<|startoftext|>``/``<|endoftext|>`` specials, 77-token context with
truncation-and-EOT). The merges table is NOT bundled (zero-egress build);
point ``CLIP_BPE_PATH`` or the ``bpe_path`` argument at the standard
``bpe_simple_vocab_16e6.txt.gz`` file to use text encoding.
"""

from __future__ import annotations

import gzip
import html
import os
import re

import regex  # unicode-property regex, same engine family open_clip uses
from functools import lru_cache
from pathlib import Path
from typing import Dict, List, Optional, Tuple

import numpy as np

from .textclean import fix_text


@lru_cache()
def bytes_to_unicode() -> Dict[int, str]:
    """Reversible byte -> printable-unicode map (standard GPT-2/CLIP table)."""
    bs = list(range(ord("!"), ord("~") + 1)) + list(range(ord("¡"), ord("¬") + 1)) + list(range(ord("®"), ord("ÿ") + 1))
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, (chr(c) for c in cs)))


def _get_pairs(word: Tuple[str, ...]) -> set:
    return {(word[i], word[i + 1]) for i in range(len(word) - 1)}


# The exact open_clip/openai word-split pattern (unicode letter/number
# properties — "café" stays one word, CJK splits per open_clip semantics).
_WORD_RE = regex.compile(
    r"""<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d|[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+""",
    regex.IGNORECASE,
)


class CLIPTokenizer:
    def __init__(self, bpe_path: Optional[str] = None, context_length: int = 77) -> None:
        bpe_path = bpe_path or os.environ.get("CLIP_BPE_PATH")
        if not bpe_path or not Path(bpe_path).exists():
            raise FileNotFoundError(
                "CLIP BPE merges file not found. Download bpe_simple_vocab_16e6.txt.gz "
                "(ships with openai/CLIP and open_clip) and set CLIP_BPE_PATH or pass bpe_path."
            )
        self.context_length = context_length
        self.byte_encoder = bytes_to_unicode()
        raw = gzip.open(bpe_path, "rt", encoding="utf-8").read().split("\n")
        merges = [tuple(m.split()) for m in raw[1 : 49152 - 256 - 2 + 1]]
        vocab: List[str] = list(self.byte_encoder.values())
        vocab = vocab + [v + "</w>" for v in vocab]
        vocab.extend("".join(m) for m in merges)
        vocab.extend(["<|startoftext|>", "<|endoftext|>"])
        self.encoder = {tok: i for i, tok in enumerate(vocab)}
        self.bpe_ranks = {m: i for i, m in enumerate(merges)}
        self.sot = self.encoder["<|startoftext|>"]
        self.eot = self.encoder["<|endoftext|>"]
        self._cache: Dict[str, str] = {"<|startoftext|>": "<|startoftext|>", "<|endoftext|>": "<|endoftext|>"}

    def _bpe(self, token: str) -> str:
        if token in self._cache:
            return self._cache[token]
        word = tuple(token[:-1]) + (token[-1] + "</w>",)
        pairs = _get_pairs(word)
        if not pairs:
            return token + "</w>"
        while True:
            bigram = min(pairs, key=lambda p: self.bpe_ranks.get(p, float("inf")))
            if bigram not in self.bpe_ranks:
                break
            first, second = bigram
            new_word: List[str] = []
            i = 0
            while i < len(word):
                try:
                    j = word.index(first, i)
                except ValueError:
                    new_word.extend(word[i:])
                    break
                new_word.extend(word[i:j])
                i = j
                if i < len(word) - 1 and word[i] == first and word[i + 1] == second:
                    new_word.append(first + second)
                    i += 2
                else:
                    new_word.append(word[i])
                    i += 1
            word = tuple(new_word)
            if len(word) == 1:
                break
            pairs = _get_pairs(word)
        out = " ".join(word)
        self._cache[token] = out
        return out

    def encode(self, text: str) -> List[int]:
        # open_clip's basic_clean: ftfy.fix_text + double html.unescape.
        # ftfy is not an available dependency; textclean.fix_text natively
        # implements its default pipeline (mojibake repair, width/ligature/
        # quote normalization, NFC — goldens in tests/test_textclean.py).
        text = html.unescape(html.unescape(fix_text(text)))
        text = re.sub(r"\s+", " ", text.strip()).lower()
        ids: List[int] = []
        for tok in _WORD_RE.findall(text):
            tok = "".join(self.byte_encoder[b] for b in tok.encode("utf-8"))
            ids.extend(self.encoder[t] for t in self._bpe(tok).split(" "))
        return ids

    def __call__(self, texts) -> np.ndarray:
        """List of strings -> (N, context_length) int32, SOT ... EOT padded
        with zeros; over-long sequences truncate and keep EOT last (open_clip
        behavior)."""
        if isinstance(texts, str):
            texts = [texts]
        out = np.zeros((len(texts), self.context_length), dtype=np.int32)
        for i, text in enumerate(texts):
            ids = [self.sot] + self.encode(text) + [self.eot]
            if len(ids) > self.context_length:
                ids = ids[: self.context_length]
                ids[-1] = self.eot
            out[i, : len(ids)] = ids
        return out
