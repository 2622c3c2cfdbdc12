"""PII scrubbing and benchmark decontamination — curation stages every
large-scale training-data pipeline runs alongside near-dedup
[SURVEY.md §2.11; spec BASELINE.json:15 text-corpus envelope].

- ``redact_pii``: stateless vectorized Arrow map (RE2 kernels via
  pyarrow.compute, ASCII classes so the DuckDB oracle agrees byte-for-
  byte), no shuffle — redaction is embarrassingly parallel.
- ``decontaminate``: the benchmark/eval set is TINY next to the corpus
  (the 100-TB side is the candidates), so its word-n-gram set is
  collected once and broadcast via ``ray.put`` — the canonical
  small-side pattern — and deserialized once per worker process via a
  module-level cache, not once per batch. The corpus-side membership
  scan is per-batch vectorized with NO shuffle at all. Grams are
  compared as exact strings (no hashing), so the result is
  deterministic and oracle-exact.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

# RE2-compatible ASCII patterns (same class discipline as
# functions/textstats.py: DuckDB's regexp_* is RE2 too, so the kernels and
# oracles share semantics exactly)
EMAIL_RE = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+?[0-9]{1,3}-[0-9]{3}-[0-9]{4}"


def redact_pii(ds: ray.data.Dataset, text_col: str = "text"
               ) -> ray.data.Dataset:
    """Replace emails then phone numbers in ``text_col`` with
    ``<EMAIL>`` / ``<PHONE>`` placeholders; append int64 match counts
    (counted on the RAW text, before redaction) as ``n_emails`` /
    ``n_phones``. Oracle: nested DuckDB ``regexp_replace(..., 'g')`` +
    ``len(regexp_extract_all(...))`` with identical patterns."""
    def f(batch: pa.Table) -> pa.Table:
        t = batch[text_col]
        n_e = pc.cast(pc.count_substring_regex(t, EMAIL_RE), pa.int64())
        n_p = pc.cast(pc.count_substring_regex(t, PHONE_RE), pa.int64())
        clean = pc.replace_substring_regex(t, EMAIL_RE, "<EMAIL>")
        clean = pc.replace_substring_regex(clean, PHONE_RE, "<PHONE>")
        cols = {c: (clean if c == text_col else batch[c])
                for c in batch.column_names}
        cols["n_emails"] = n_e
        cols["n_phones"] = n_p
        return pa.table(cols)

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def _batch_grams(texts: pd.Series, n: int
                 ) -> tuple[np.ndarray, np.ndarray]:
    """(row_position, gram_string) for every word n-gram in the batch.
    Rows with fewer than n words contribute none. Tokenizer pinned to
    ``TOKEN_SPLIT_RE`` — the complement of the oracle's RE2 split class
    ``[\\s\\x1c-\\x1f]+`` (RE2 ``\\s`` is ASCII-only; Python
    ``str.split()`` would diverge on VT/NBSP/Unicode spaces)."""
    from miekki_ray.functions.textstats import TOKEN_SPLIT_RE

    words = (texts.fillna("").reset_index(drop=True)
             .str.findall(TOKEN_SPLIT_RE))
    ex = words.explode().dropna()
    if len(ex) < n:
        return (np.empty(0, dtype=np.int64), np.empty(0, dtype=object))
    idx = ex.index.to_numpy(dtype=np.int64)
    w = ex.to_numpy(dtype=object)
    m = len(w) - n + 1
    # an n-gram is valid iff its first and last word are in the same row
    valid = idx[:m] == idx[n - 1:]
    gram = w[:m].copy()
    for j in range(1, n):
        gram = gram + " "
        gram = gram + w[j:j + m]
    return idx[:m][valid], gram[valid]


# warm-worker cache: the broadcast gram set is deserialized once per
# worker PROCESS (same pattern as the Sketcher's task cache), not once
# per batch
_GRAM_CACHE: dict[str, frozenset] = {}


def _cached_grams(ref) -> frozenset:
    key = ref.hex()
    v = _GRAM_CACHE.get(key)
    if v is None:
        v = _GRAM_CACHE[key] = ray.get(ref)
        if len(_GRAM_CACHE) > 4:          # bound worker memory
            _GRAM_CACHE.pop(next(iter(_GRAM_CACHE)))
    return v


def decontaminate(candidates: ray.data.Dataset, bench: ray.data.Dataset,
                  *, n_words: int = 8, text_col: str = "text",
                  id_col: str = "doc_id") -> ray.data.Dataset:
    """Flag every candidate document sharing at least one word
    ``n_words``-gram with ANY benchmark document (test-set
    decontamination). Returns (id_col, contaminated:bool).

    The bench gram set is driver-collected by design: an eval benchmark
    is bounded (thousands of docs) regardless of corpus scale — the
    asymmetric small side of this operator's contract."""
    def bench_grams(batch: pd.DataFrame) -> pd.DataFrame:
        _, grams = _batch_grams(batch[text_col], n_words)
        return pd.DataFrame({"gram": pd.unique(grams)})

    gset: set[str] = set()
    for b in (bench.map_batches(bench_grams, batch_format="pandas")
              .iter_batches(batch_format="pandas")):
        gset.update(b["gram"])
    ref = ray.put(frozenset(gset))

    def flag(batch: pd.DataFrame) -> pd.DataFrame:
        grams_set = _cached_grams(ref)
        idx, grams = _batch_grams(batch[text_col], n_words)
        contaminated = np.zeros(len(batch), dtype=bool)
        if len(grams):
            hit = pd.Series(grams).isin(grams_set).to_numpy()
            contaminated[np.unique(idx[hit])] = True
        return pd.DataFrame({
            id_col: batch[id_col].to_numpy(),
            "contaminated": contaminated,
        })

    return candidates.map_batches(flag, batch_format="pandas")
