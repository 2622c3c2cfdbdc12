"""Adapter: driver `documents` table → spec transcripts shape.

FIXTURES.md §A: "map documents → transcripts shape ... single-turn
conversations — lets the flagship run on driver data". For a multi-turn
variant (exercises the (conv_id, turn_idx) sort-merge against a DuckDB
oracle) docs are grouped 100-way: conv_id = doc_id % 100,
turn_idx = doc_id // 100 — deterministic, no wall clock."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data


def _padded_id(ids: pa.ChunkedArray | pa.Array, width: int,
               prefix: str = "") -> pa.Array | pa.ChunkedArray:
    """Vectorized <prefix><zero-padded decimal> conv_id off the Arrow
    int column — the per-row f-string comprehension this replaces was a
    Python loop in a batch map (r4 review)."""
    s = pc.utf8_lpad(pc.cast(ids, pa.string()), width, "0")
    if prefix:
        s = pc.binary_join_element_wise(pa.scalar(prefix), s,
                                        pa.scalar(""))
    return s


def _read_tbl(sf_dir: str, table: str, columns: list[str] | None = None):
    from miekki_ray.relational import _read   # single clean-read impl

    return _read(sf_dir, table, columns)


# (kept as a one-line deferred-import shim so this module stays importable
# without triggering relational's pyarrow.compute import at module load)


def documents_as_turns(sf_dir: str) -> ray.data.Dataset:
    """Single-turn conversations: conv_id = str(doc_id)."""
    ds = _read_tbl(sf_dir, "documents", ["doc_id", "text"])

    def f(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table({
            "conv_id": _padded_id(batch["doc_id"], 12),
            "turn_idx": pa.array(np.zeros(n, dtype=np.int32),
                                 type=pa.int32()),
            "role": pa.array(["user"] * n, type=pa.string()),
            "text": batch["text"],
            "tool": pa.array([None] * n, type=pa.string()),
            "ts": pa.array(np.full(n, 1_700_000_000_000_000, dtype=np.int64),
                           type=pa.timestamp("us")),
        })

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def documents_as_multiturn_roled(sf_dir: str) -> ray.data.Dataset:
    """Same 100-conversation grouping, but with a deterministic
    user/assistant role alternation on the TURN index (doc_id // 100) —
    turns within a conversation alternate roles, the realistic
    transcript shape (doc_id parity would be constant per conv since
    turn members differ by multiples of 100). Separate from
    ``documents_as_multiturn`` because the reconstruction oracle pins
    that adapter's all-'user' doc prefix."""
    ds = _read_tbl(sf_dir, "documents", ["doc_id", "text"])

    def f(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        roles = np.where((ids // 100) % 2 == 0, "user", "assistant")
        return pa.table({
            "conv_id": _padded_id(pa.array(ids % 100), 3, "g"),
            "turn_idx": pa.array((ids // 100).astype(np.int32),
                                 type=pa.int32()),
            "role": pa.array(roles, type=pa.string()),
            "text": batch["text"],
        })

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def documents_as_multiturn(sf_dir: str) -> ray.data.Dataset:
    """100-conversation grouping for the reconstruction oracle check."""
    ds = _read_tbl(sf_dir, "documents", ["doc_id", "text"])

    def f(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        n = batch.num_rows
        return pa.table({
            "conv_id": _padded_id(pa.array(ids % 100), 3, "g"),
            "turn_idx": pa.array((ids // 100).astype(np.int32),
                                 type=pa.int32()),
            "role": pa.array(["user"] * n, type=pa.string()),
            "text": batch["text"],
            "tool": pa.array([None] * n, type=pa.string()),
            "ts": pa.array(np.full(n, 1_700_000_000_000_000, dtype=np.int64),
                           type=pa.timestamp("us")),
        })

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)
