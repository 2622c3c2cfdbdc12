"""Word-n-gram Jaccard dedup — a token-level alternative to the character
k-shingle path (driver mandate: "n-gram Jaccard" as a first-class dedup
variant).

Reuses the whole LSH machinery: only the shingle definition changes (word
n-grams hashed to uint64 instead of character k-grams). Exposed as a
separate sketcher so the two families can be compared on the same corpus.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from miekki_ray.config import DedupConfig
from miekki_ray.functions.hashing import (
    hash_params,
    minhash_from_concat,
    splitmix64,
)

_WORD_DTYPE = np.uint64


def _stable_word_hashes(text: str | None, n: int) -> np.ndarray:
    """Unique uint64 hashes of word n-grams, deterministic across processes
    (python's builtin hash() is salted per process — never use it here).
    Per-word hashing via pandas' C siphash with its fixed default key,
    combined over the n-gram window with a golden-ratio polynomial.
    Tokenizer pinned to TOKEN_SPLIT_RE (the oracle's RE2 split class) —
    Python str.split() is Unicode-aware and would diverge on VT/NBSP.
    A null doc folds into the empty-doc sentinel (the char-shingle family
    treats nulls as empty the same way) instead of crashing re.findall."""
    from miekki_ray.functions.textstats import TOKEN_SPLIT_RE
    words = re.findall(TOKEN_SPLIT_RE, text) if text else []
    if not words:
        return np.array([0], dtype=_WORD_DTYPE)
    wh = pd.util.hash_array(np.asarray(words, dtype=object))
    with np.errstate(over="ignore"):
        if len(words) < n:
            return np.unique(splitmix64(wh))
        out = np.zeros(len(words) - n + 1, dtype=_WORD_DTYPE)
        for j in range(n):
            out = out * np.uint64(0x9E3779B97F4A7C15) + wh[j:j + len(out)]
    return np.unique(splitmix64(out))


def _jaccard_sets(ha: np.ndarray, hb: np.ndarray) -> float:
    inter = np.intersect1d(ha, hb, assume_unique=True).size
    union = ha.size + hb.size - inter
    return inter / union if union else 1.0


def ngram_jaccard(a: str, b: str, n: int = 3) -> float:
    """Exact word-n-gram Jaccard of two texts."""
    return _jaccard_sets(_stable_word_hashes(a, n),
                         _stable_word_hashes(b, n))


class NgramSketcher:
    """MinHash over word n-grams — same sig layout as the character
    sketcher, so band_explode/candidates work unchanged. Emits sig ONLY:
    a word-n-gram family has no prefix sketch (ST3 containment is a
    char-shingle concept), so its bands must all be ordinary pband=False
    bands (band_explode is called with include_prefix=False)."""

    def __init__(self, cfg: DedupConfig, n: int = 3):
        self.cfg = cfg
        self.n = n
        self.a, self.b = hash_params(cfg.num_perm, cfg.seed + 17)

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        docs = batch["doc"].to_pylist()
        sets = [_stable_word_hashes(d, self.n) for d in docs]
        sizes = np.array([s.size for s in sets], dtype=np.int64)
        if docs:
            concat = np.concatenate(sets)
            offsets = np.concatenate(([0], np.cumsum(sizes)[:-1]))
            sig = minhash_from_concat(concat, offsets, self.a, self.b)
        else:
            sig = np.empty((0, cfg.num_perm), dtype=np.uint64)
        sig_col = pa.FixedSizeListArray.from_arrays(
            pa.array(sig.ravel(), type=pa.uint64()), cfg.num_perm)
        return batch.append_column("sig", sig_col)


def ngram_near_dup_pairs(docs: ray.data.Dataset, cfg: DedupConfig,
                         n: int = 3) -> ray.data.Dataset:
    """Full n-gram near-dup candidate+verify pipeline over a docs table
    (conv_id, doc, doc_hash). Output: a, b, jaccard (exact word-n-gram
    Jaccard), verified."""
    from miekki_ray.stages.candidates import candidate_pairs
    from miekki_ray.stages.sketch import band_explode
    from miekki_ray.stages.verify import attach_docs

    # text-free materialization (the flagship's discipline, dedup.py):
    # band_explode only reads conv_id/doc_hash/sig — materializing the
    # doc column too would pin a second full-text copy in plasma for the
    # whole candidate phase
    sk = (docs.map_batches(NgramSketcher(cfg, n), batch_format="pyarrow",
                           zero_copy_batch=True,
                           batch_size=cfg.sketch_batch_size)
          .select_columns(["conv_id", "doc_hash", "sig"]).materialize())
    # sig bands only: the ngram family has no true prefix sketch (its
    # psig slot is a second full-doc minhash) — labeling those bands
    # pband=True would cap their hot buckets at prefix_pair_cap
    bands = band_explode(sk, cfg, include_prefix=False)
    pairs = candidate_pairs(bands, cfg).materialize()
    if pairs.count() == 0:
        return ray.data.from_arrow(pa.table({
            "a": pa.array([], type=pa.string()),
            "b": pa.array([], type=pa.string()),
            "jaccard": pa.array([], type=pa.float64()),
            "verified": pa.array([], type=pa.bool_())}))
    wd = attach_docs(pairs, docs, cfg, n_pairs=pairs.count())

    thr = cfg.jaccard_threshold

    def verify(batch: pa.Table) -> pa.Table:
        a = batch["doc_a"].to_pylist()
        b = batch["doc_b"].to_pylist()
        # docs repeat across pairs (a hot doc appears in every one of its
        # capped pairs): tokenize+hash each distinct doc ONCE per batch —
        # the same unique-doc cache discipline as verify.Verifier
        cache: dict[str | None, np.ndarray] = {}

        def hs(t):
            h = cache.get(t)
            if h is None:
                h = _stable_word_hashes(t, n)
                cache[t] = h
            return h

        jac = np.array([_jaccard_sets(hs(x), hs(y)) for x, y in zip(a, b)])
        return pa.table({
            "a": batch["a"], "b": batch["b"],
            "jaccard": pa.array(jac, type=pa.float64()),
            "verified": pa.array(jac >= thr, type=pa.bool_()),
        })

    return wd.map_batches(verify, batch_format="pyarrow",
                          zero_copy_batch=True)
