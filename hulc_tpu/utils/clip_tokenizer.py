"""CLIP byte-BPE tokenizer (reference: hulc/utils/clip_tokenizer.py, the
vendored OpenAI tokenizer). Written fresh against the public BPE algorithm;
the merge loop is an index-based leftmost-min-rank scan (tiktoken/HF style)
rather than the pair-set formulation.

The merge vocabulary (``bpe_simple_vocab_16e6.txt.gz``, a public OpenAI CLIP
data asset) is vendored under ``hulc_tpu/assets/``; override with an explicit
``bpe_path`` or HULC_TPU_BPE_VOCAB. ftfy text fixing is applied when the
library is available (it is optional in this environment); raw play-data
annotations are plain ASCII so results are identical.
"""

from __future__ import annotations

import functools
import gzip
import html
import os
import pathlib
from typing import List, Optional, Union

import numpy as np
import regex as re

CONTEXT_LENGTH = 77

_VENDORED_VOCAB = pathlib.Path(__file__).resolve().parent.parent / "assets" / "bpe_simple_vocab_16e6.txt.gz"


def _default_vocab_paths():
    # read the env var at construction time, not import time
    return [
        os.environ.get("HULC_TPU_BPE_VOCAB", ""),
        str(_VENDORED_VOCAB),
    ]


@functools.lru_cache()
def bytes_to_unicode():
    """Reversible byte <-> printable-unicode map (standard GPT-2/CLIP table)."""
    bs = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("\xa1"), ord("\xac") + 1))
        + list(range(ord("\xae"), ord("\xff") + 1))
    )
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


def _clean(text: str) -> str:
    try:
        import ftfy

        text = ftfy.fix_text(text)
    except ImportError:
        pass
    text = html.unescape(html.unescape(text))
    return re.sub(r"\s+", " ", text.strip()).lower()


class SimpleTokenizer:
    def __init__(self, bpe_path: Optional[str] = None):
        path = bpe_path or next((p for p in _default_vocab_paths() if p and pathlib.Path(p).exists()), None)
        if path is None:
            raise FileNotFoundError(
                "CLIP BPE vocab not found; download bpe_simple_vocab_16e6.txt.gz "
                "(OpenAI CLIP) and pass bpe_path or set HULC_TPU_BPE_VOCAB"
            )
        self.byte_encoder = bytes_to_unicode()
        self.byte_decoder = {v: k for k, v in self.byte_encoder.items()}
        merges = gzip.open(path).read().decode("utf-8").split("\n")
        merges = [tuple(m.split()) for m in merges[1 : 49152 - 256 - 2 + 1]]
        vocab = list(self.byte_encoder.values())
        vocab = vocab + [v + "</w>" for v in vocab]
        vocab.extend("".join(m) for m in merges)
        vocab.extend(["<|startoftext|>", "<|endoftext|>"])
        self.encoder = {v: i for i, v in enumerate(vocab)}
        self.decoder = {i: v for v, i in self.encoder.items()}
        self.bpe_ranks = {m: i for i, m in enumerate(merges)}
        self.cache = {
            "<|startoftext|>": "<|startoftext|>",
            "<|endoftext|>": "<|endoftext|>",
        }
        self.pat = re.compile(
            r"<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d|[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+",
            re.IGNORECASE,
        )

    def bpe(self, token: str) -> str:
        """Greedy BPE via leftmost-lowest-rank single merges.

        Merging one leftmost occurrence of the globally lowest-rank adjacent
        pair per iteration is token-for-token equivalent to the classic
        whole-word merge pass (the merged pair stays minimal until all its
        occurrences are gone, and both scans proceed left to right).
        """
        cached = self.cache.get(token)
        if cached is not None:
            return cached
        parts = list(token[:-1]) + [token[-1] + "</w>"]
        inf = float("inf")
        while len(parts) > 1:
            ranks = [self.bpe_ranks.get(pair, inf) for pair in zip(parts, parts[1:])]
            i = min(range(len(ranks)), key=ranks.__getitem__)
            if ranks[i] is inf:
                break
            parts[i : i + 2] = [parts[i] + parts[i + 1]]
        out = " ".join(parts)
        self.cache[token] = out
        return out

    def encode(self, text: str) -> List[int]:
        bpe_tokens: List[int] = []
        for token in re.findall(self.pat, _clean(text)):
            token = "".join(self.byte_encoder[b] for b in token.encode("utf-8"))
            bpe_tokens.extend(self.encoder[t] for t in self.bpe(token).split(" "))
        return bpe_tokens

    def decode(self, tokens) -> str:
        text = "".join(self.decoder[int(t)] for t in tokens)
        return (
            bytearray(self.byte_decoder[c] for c in text)
            .decode("utf-8", errors="replace")
            .replace("</w>", " ")
        )


def tokenize(
    texts: Union[str, List[str]],
    tokenizer: Optional[SimpleTokenizer] = None,
    context_length: int = CONTEXT_LENGTH,
) -> np.ndarray:
    """Texts -> (N, context_length) int32 token array (CLIP format)."""
    if isinstance(texts, str):
        texts = [texts]
    tokenizer = tokenizer or SimpleTokenizer()
    sot = tokenizer.encoder["<|startoftext|>"]
    eot = tokenizer.encoder["<|endoftext|>"]
    out = np.zeros((len(texts), context_length), np.int32)
    for i, text in enumerate(texts):
        tokens = [sot] + tokenizer.encode(text) + [eot]
        if len(tokens) > context_length:
            raise RuntimeError(f"input too long for context {context_length}: {text!r}")
        out[i, : len(tokens)] = tokens
    return out
