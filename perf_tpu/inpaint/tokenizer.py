"""CLIP byte-pair-encoding tokenizer for arbitrary SD2 prompts.

The reference carries open_clip's SimpleTokenizer
(``ldm/modules/encoders/modules.py:134-197`` tokenizes via
``open_clip.tokenize``), but PeRF only ever conditions on the EMPTY prompt,
so ``diffusion.py`` hardcodes that token pair for parity. This module closes
the capability gap for non-empty prompts: a from-scratch implementation of
the same BPE scheme (GPT-2-style byte-to-unicode base alphabet, merge ranks
from the published ``bpe_simple_vocab_16e6.txt.gz``, ``</w>`` word-end
markers, 49408-symbol vocab with start/end specials at 49406/49407).

The merge table itself ships with open_clip, not this repo; pass its path
(e.g. ``pre_checkpoints/bpe_simple_vocab_16e6.txt.gz``). Without it the
empty prompt still works via the hardcoded tokens — exactly the surface the
reference pipeline exercises.
"""

from __future__ import annotations

import gzip
import html
import os

import numpy as np

SOT = 49406          # <|startoftext|>
EOT = 49407          # <|endoftext|>
CONTEXT_LEN = 77
N_MERGES = 48894     # 49408 - 256*2 - 2 special


def _bytes_to_unicode():
    """GPT-2's reversible byte -> printable-unicode map: the 188 visibly
    printable latin-1 bytes map to themselves, the rest shift to 256+i."""
    bs = (list(range(ord("!"), ord("~") + 1))
          + list(range(ord("\xa1"), ord("\xac") + 1))
          + list(range(ord("\xae"), ord("\xff") + 1)))
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))


def _clean(text: str) -> str:
    text = html.unescape(html.unescape(text))
    return " ".join(text.split()).strip().lower()


class ClipBPETokenizer:
    """Tokenize prompts for the OpenCLIP-H text encoder (SD2)."""

    def __init__(self, bpe_path: str, n_merges: int = N_MERGES):
        """``n_merges`` < N_MERGES builds a reduced vocab (algorithm tests
        only — the SD2 text encoder needs the full 49408-symbol table)."""
        if not os.path.exists(bpe_path):
            raise FileNotFoundError(
                f"{bpe_path} not found — place open_clip's "
                "bpe_simple_vocab_16e6.txt.gz next to the checkpoints")
        import regex
        self._pat = regex.compile(
            r"<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d"
            r"|[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+", regex.IGNORECASE)
        self.byte_enc = _bytes_to_unicode()

        with gzip.open(bpe_path, "rt", encoding="utf-8") as f:
            lines = f.read().split("\n")
        # line 0 is a version header; the published vocab carries more
        # merges than CLIP uses — keep exactly the first n_merges
        merges = [tuple(m.split()) for m in lines[1:n_merges + 1]]
        self.bpe_ranks = {m: i for i, m in enumerate(merges)}

        base = list(self.byte_enc.values())
        vocab = base + [c + "</w>" for c in base]
        vocab += ["".join(m) for m in merges]
        vocab += ["<|startoftext|>", "<|endoftext|>"]
        self.sot, self.eot = len(vocab) - 2, len(vocab) - 1
        if n_merges == N_MERGES:
            assert (len(vocab), self.sot, self.eot) == (EOT + 1, SOT, EOT), \
                len(vocab)
        self.encoder = {tok: i for i, tok in enumerate(vocab)}
        self._cache: dict = {}

    def _bpe(self, token: str) -> list[str]:
        if token in self._cache:
            return self._cache[token]
        parts = list(token[:-1]) + [token[-1] + "</w>"]
        while len(parts) > 1:
            pairs = [(parts[i], parts[i + 1]) for i in range(len(parts) - 1)]
            best = min(pairs, key=lambda p: self.bpe_ranks.get(p, 1 << 30))
            if best not in self.bpe_ranks:
                break
            merged, i = [], 0
            while i < len(parts):
                if (i < len(parts) - 1
                        and (parts[i], parts[i + 1]) == best):
                    merged.append(parts[i] + parts[i + 1])
                    i += 2
                else:
                    merged.append(parts[i])
                    i += 1
            parts = merged
        self._cache[token] = parts
        return parts

    def encode(self, text: str) -> list[int]:
        ids = []
        for tok in self._pat.findall(_clean(text)):
            mapped = "".join(self.byte_enc[b] for b in tok.encode("utf-8"))
            ids.extend(self.encoder[p] for p in self._bpe(mapped))
        return ids

    def __call__(self, texts, context_length: int = CONTEXT_LEN) -> np.ndarray:
        """[B, context_length] int32, SOT ... EOT zero-padded; overlong
        prompts truncate with EOT in the last slot (open_clip behavior)."""
        if isinstance(texts, str):
            texts = [texts]
        out = np.zeros((len(texts), context_length), np.int32)
        for r, text in enumerate(texts):
            ids = [self.sot] + self.encode(text) + [self.eot]
            if len(ids) > context_length:
                ids = ids[:context_length]
                ids[-1] = self.eot
            out[r, :len(ids)] = ids
        return out
