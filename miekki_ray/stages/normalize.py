"""M1 normalize_turns — canonicalize text for hashing WITHOUT touching `text`.

[spec BASELINE.json:15] binding invariant: "per-turn text equality under
stable turn ordering" — the raw `text` column must pass through
byte-identical. Normalization (NFC + \\r\\n → \\n) therefore lands in a
SEPARATE `text_norm` column (SURVEY.md §2.2 M1). Vectorized pyarrow.compute,
zero-copy Arrow batches.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data


def _normalize_batch(batch: pa.Table) -> pa.Table:
    t = pc.replace_substring(batch["text"], pattern="\r\n", replacement="\n")
    t = pc.utf8_normalize(t, form="NFC")
    return batch.append_column("text_norm", t)


def normalize_turns(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Append `text_norm`; `text` passes through untouched."""
    return ds.map_batches(_normalize_batch, batch_format="pyarrow",
                          zero_copy_batch=True)


def filter_turns(ds: ray.data.Dataset, *, roles: list[str] | None = None,
                 min_len: int | None = None) -> ray.data.Dataset:
    """M2 — optional predicates; OFF by default (the per-turn invariant
    forbids silently dropping turns in the flagship path)."""
    def _f(batch: pa.Table) -> pa.Table:
        mask = pa.array([True] * batch.num_rows)
        if roles is not None:
            mask = pc.and_(mask, pc.is_in(batch["role"],
                                          value_set=pa.array(roles)))
        if min_len is not None:
            mask = pc.and_(mask, pc.greater_equal(
                pc.utf8_length(batch["text"]), min_len))
        return batch.filter(mask)

    return ds.map_batches(_f, batch_format="pyarrow", zero_copy_batch=True)
