"""O1 reconstruction: the binding per-turn text equality invariant.

[spec BASELINE.json:15]: "per-turn text equality under stable turn ordering"
— shuffle the input turn rows, reconstruct, every turn must come back
byte-equal in turn_idx order (SURVEY.md §5.1)."""

import numpy as np
import pyarrow as pa
import ray.data

from miekki_ray.stages.docs import reconstruct_docs
from miekki_ray.stages.normalize import filter_turns, normalize_turns


def test_per_turn_text_equality(small_corpus, cfg):
    turns, _ = small_corpus  # rows already deterministically shuffled
    docs = reconstruct_docs(ray.data.from_arrow(turns), cfg).to_pandas()
    # independent expectation: pandas stable sort + join
    df = turns.select(["conv_id", "turn_idx", "role", "text"]).to_pandas()
    df = df.sort_values(["conv_id", "turn_idx"], kind="mergesort")
    df["piece"] = df["role"].str[:1] + cfg.role_sep + df["text"]
    want = df.groupby("conv_id")["piece"].agg(cfg.turn_sep.join)
    got = docs.set_index("conv_id")["doc"]
    assert len(got) == len(want)
    for cid in want.index:
        assert got[cid] == want[cid], cid  # byte-exact doc ⇒ byte-exact turns


def test_reconstruction_row_order_invariance(small_corpus, cfg):
    """Keyed outputs must not depend on input row order (SURVEY.md §5.2)."""
    turns, _ = small_corpus
    perm = np.random.default_rng(1).permutation(turns.num_rows)
    shuffled = turns.take(pa.array(perm))
    d1 = reconstruct_docs(ray.data.from_arrow(turns), cfg).to_pandas()
    d2 = reconstruct_docs(ray.data.from_arrow(shuffled), cfg).to_pandas()
    d1 = d1.sort_values("conv_id").reset_index(drop=True)
    d2 = d2.sort_values("conv_id").reset_index(drop=True)
    assert d1[["conv_id", "doc", "doc_hash"]].equals(
        d2[["conv_id", "doc", "doc_hash"]])


def test_doc_hash_distinguishes(small_corpus, cfg):
    turns, planted = small_corpus
    docs = reconstruct_docs(ray.data.from_arrow(turns), cfg).to_pandas()
    by_id = docs.set_index("conv_id")["doc_hash"]
    pl = planted.to_pandas()
    for _, r in pl.iterrows():
        if r["kind"] == "exact":
            assert by_id[r["a"]] == by_id[r["b"]]
        elif r["kind"] in ("near_high", "near_border"):
            assert by_id[r["a"]] != by_id[r["b"]]


def test_normalize_preserves_text(small_corpus):
    turns, _ = small_corpus
    out = normalize_turns(ray.data.from_arrow(turns)).to_pandas()
    src = turns.to_pandas()
    # raw text byte-identical, text_norm appended
    assert "text_norm" in out.columns
    assert list(out["text"]) == list(src["text"])


def test_filter_turns_roles(small_corpus):
    turns, _ = small_corpus
    out = filter_turns(ray.data.from_arrow(turns), roles=["tool"]).to_pandas()
    assert (out["role"] == "tool").all()
    assert len(out) == (turns.to_pandas()["role"] == "tool").sum()


def test_clean_read_schema_surfaces_part_drift(tmp_path):
    """Regression (ADVICE r2, sources/transcripts.py): a directory whose
    part files disagree on a projected column's type (e.g. int32 vs int64
    turn_idx from a drifted writer) must raise a ValueError naming the
    drifted file — not silently coerce to the first footer's schema."""
    import pyarrow.parquet as pq
    import pytest

    from miekki_ray.sources.transcripts import (TURN_COLUMNS,
                                                clean_read_schema)

    def table(idx_type):
        return pa.table({
            "conv_id": pa.array(["c0"], type=pa.string()),
            "turn_idx": pa.array([0], type=idx_type),
            "role": pa.array(["user"], type=pa.string()),
            "text": pa.array(["hello"], type=pa.string()),
            "tool": pa.array([None], type=pa.string()),
            "ts": pa.array([1_700_000_000_000_000],
                           type=pa.timestamp("us")),
        })

    d = tmp_path / "parts"
    d.mkdir()
    pq.write_table(table(pa.int32()), d / "part-000.parquet")
    pq.write_table(table(pa.int64()), d / "part-001.parquet")
    with pytest.raises(ValueError, match="part-001"):
        clean_read_schema(str(d), TURN_COLUMNS)
    # agreeing parts are fine and return the projected schema
    pq.write_table(table(pa.int32()), d / "part-001.parquet")
    schema = clean_read_schema(str(d), TURN_COLUMNS)
    assert schema.names == TURN_COLUMNS


def test_fnv1a_arrow_kernel_parity():
    # the r3 buffer-native partition tag (runs once per TURN) must be
    # bit-identical to the list-of-str reference
    import numpy as np
    import pyarrow as pa

    from miekki_ray.stages.docs import _fnv1a_batch, _fnv1a_from_arrow

    ids = [f"{i:012d}" for i in range(5000)] + ["", "héllo", "x" * 40]
    for typ in (pa.string(), pa.large_string()):
        col = pa.array(ids, type=typ)
        assert np.array_equal(_fnv1a_batch(ids, 64),
                              _fnv1a_from_arrow(col, 64))
        assert np.array_equal(_fnv1a_batch(ids[5:90], 64),
                              _fnv1a_from_arrow(col.slice(5, 85), 64))
    assert _fnv1a_from_arrow(pa.array([], type=pa.string()), 64).size == 0


def test_clean_read_schema_checks_list_inputs(tmp_path):
    """r4 review: the drift check must cover EVERY file of a list input,
    not just path[0]."""
    import pyarrow.parquet as pq
    import pytest

    from miekki_ray.sources.transcripts import (TURN_COLUMNS,
                                                clean_read_schema)

    def table(idx_type):
        return pa.table({
            "conv_id": pa.array(["c0"], type=pa.string()),
            "turn_idx": pa.array([0], type=idx_type),
            "role": pa.array(["user"], type=pa.string()),
            "text": pa.array(["hello"], type=pa.string()),
            "tool": pa.array([None], type=pa.string()),
            "ts": pa.array([1_700_000_000_000_000],
                           type=pa.timestamp("us")),
        })

    a = str(tmp_path / "a.parquet")
    b = str(tmp_path / "b.parquet")
    pq.write_table(table(pa.int32()), a)
    pq.write_table(table(pa.int64()), b)
    with pytest.raises(ValueError, match="b.parquet"):
        clean_read_schema([a, b], TURN_COLUMNS)
