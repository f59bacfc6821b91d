"""CLIP BPE tokenizer: algorithm tests on a synthetic merge table, plus the
empty-prompt parity contract with the hardcoded production path. The real
49408-symbol vocab ships with open_clip, not this repo — when
``pre_checkpoints/bpe_simple_vocab_16e6.txt.gz`` exists, the full-vocab
checks run too (see tools/validate_real_weights.py)."""

import gzip
import os

import numpy as np
import pytest

from perf_tpu.inpaint.tokenizer import ClipBPETokenizer, SOT, EOT

REAL_VOCAB = "./pre_checkpoints/bpe_simple_vocab_16e6.txt.gz"


@pytest.fixture()
def tiny_vocab(tmp_path):
    """Merge table in the published format (word-end tokens carry </w>
    INSIDE the merge entries): l+o, lo+w</w>, e+r</w>."""
    path = tmp_path / "tiny_bpe.txt.gz"
    lines = ["#version: tiny", "l o", "lo w</w>", "e r</w>"]
    with gzip.open(path, "wt", encoding="utf-8") as f:
        f.write("\n".join(lines))
    return str(path)


def test_bpe_merging_order(tiny_vocab):
    tok = ClipBPETokenizer(tiny_vocab, n_merges=3)
    # "low" -> l+o (rank 0), then lo+w</w> (rank 1) -> one token
    assert tok._bpe("low") == ["low</w>"]
    # "lower": l+o merges, e+r</w> merges, but ('lo','w') is NOT a merge
    # (only 'lo w</w>' is) — stays three tokens
    assert tok._bpe("lower") == ["lo", "w", "er</w>"]
    # unknown word falls back to chars + last</w>
    assert tok._bpe("xyz") == ["x", "y", "z</w>"]


def test_encode_and_padding(tiny_vocab):
    tok = ClipBPETokenizer(tiny_vocab, n_merges=3)
    ids = tok(["low low", ""], context_length=8)
    assert ids.shape == (2, 8)
    # row 0: sot, low</w>, low</w>, eot, pad...
    assert ids[0, 0] == tok.sot
    n = int((ids[0] != 0).sum())
    assert ids[0, n - 1] == tok.eot and n == 4
    # empty prompt: [sot, eot, 0, ...] — same structure the hardcoded
    # production path (diffusion.empty_prompt_tokens) relies on
    assert ids[1, 0] == tok.sot and ids[1, 1] == tok.eot
    assert (ids[1, 2:] == 0).all()


def test_cleaning_and_case(tiny_vocab):
    tok = ClipBPETokenizer(tiny_vocab, n_merges=3)
    a = tok.encode("LOW   low\n LOW")
    b = tok.encode("low low low")
    assert a == b


@pytest.mark.skipif(not os.path.exists(REAL_VOCAB),
                    reason="real BPE vocab not in image (zero egress)")
def test_real_vocab_matches_hardcoded_empty_prompt():
    from perf_tpu.inpaint.diffusion import empty_prompt_tokens
    tok = ClipBPETokenizer(REAL_VOCAB)
    np.testing.assert_array_equal(np.asarray(tok([""])),
                                  np.asarray(empty_prompt_tokens(1)))
    assert (tok.sot, tok.eot) == (SOT, EOT)
