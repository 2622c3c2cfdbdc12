"""Adversarial-corpus end-to-end tests: inputs the golden corpus never
produces — all-identical corpora (one giant LSH bucket), empty input,
single conversation, multibyte text across the byte-denominated doc cap.
The sf0.01 harness can't see these either (driver data is well-behaved),
so they live here."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from miekki_ray.config import DedupConfig
from miekki_ray.pipelines.dedup import dedup_datasets, keep_list


def _turns(rows: list[tuple[str, int, str]]) -> pa.Table:
    """rows = [(conv_id, turn_idx, text)] -> spec-schema turns table."""
    return pa.table({
        "conv_id": pa.array([r[0] for r in rows], type=pa.string()),
        "turn_idx": pa.array([r[1] for r in rows], type=pa.int32()),
        "role": pa.array(["user" if r[1] % 2 == 0 else "assistant"
                          for r in rows], type=pa.string()),
        "text": pa.array([r[2] for r in rows], type=pa.string()),
        "tool": pa.array([None] * len(rows), type=pa.string()),
        "ts": pa.array(np.full(len(rows), 1_700_000_000_000_000,
                               dtype=np.int64), type=pa.timestamp("us")),
    })


@pytest.fixture(scope="module")
def tiny_cfg():
    return DedupConfig(num_partitions=4, sketch_concurrency=2)


def test_all_identical_corpus_one_cluster(tiny_cfg):
    # 60 byte-identical multi-turn convs: exact dedup collapses them before
    # LSH, and the survivors' bucket is a worst-case mega-bucket — the
    # salting/cap path must still produce ONE component with one rep
    rows = [(f"c{i:03d}", t, f"turn text {t} lorem ipsum dolor sit amet")
            for i in range(60) for t in range(4)]
    res = dedup_datasets(ray.data.from_arrow(_turns(rows)), tiny_cfg)
    cl = res.clusters.to_pandas()
    assert len(cl) == 60
    assert cl["cluster_id"].nunique() == 1
    assert cl["cluster_id"].iloc[0] == "c000"
    keep = keep_list(res).to_pandas()
    assert list(keep["conv_id"]) == ["c000"]


def test_empty_turns_table(tiny_cfg):
    res = dedup_datasets(ray.data.from_arrow(_turns([])), tiny_cfg)
    assert res.clusters.count() == 0
    assert res.edges.count() == 0


def test_single_conversation_is_singleton_rep(tiny_cfg):
    rows = [("only", 0, "a single conversation, nothing to dedup"),
            ("only", 1, "second turn of it")]
    res = dedup_datasets(ray.data.from_arrow(_turns(rows)), tiny_cfg)
    cl = res.clusters.to_pandas()
    assert len(cl) == 1
    assert cl.iloc[0]["cluster_id"] == "only"
    assert bool(cl.iloc[0]["is_rep"])


def test_multibyte_text_and_byte_cap(tiny_cfg):
    # docs over doc_len_cap BYTES of 3-byte CJK chars: the cap must cut on
    # a codepoint boundary (valid UTF-8 all the way through) and two convs
    # identical up to the cap must still dedup as exact twins even though
    # they differ past it
    import dataclasses
    cfg = dataclasses.replace(tiny_cfg, doc_len_cap=600)
    base = "世界" * 200     # 400 chars / 1200 bytes of CJK
    rows = [("cjk_a", 0, base + "TAIL-A"),
            ("cjk_b", 0, base + "completely different tail B"),
            ("other", 0, "an unrelated ascii conversation \U0001f600")]
    res = dedup_datasets(ray.data.from_arrow(_turns(rows)), cfg)
    cl = res.clusters.to_pandas().set_index("conv_id")["cluster_id"]
    assert cl["cjk_a"] == cl["cjk_b"] == "cjk_a"
    assert cl["other"] == "other"
    # the stored doc column stays valid utf-8 and within the byte budget
    docs = res.docs.to_pandas().set_index("conv_id")["doc"]
    for d in docs:
        assert len(d.encode("utf-8")) <= 600
        d.encode("utf-8").decode("utf-8")   # round-trips


def test_near_dup_multibyte_pair_found(tiny_cfg):
    # a planted near-dup pair in emoji/CJK-heavy text must verify: the
    # shingler hashes BYTES, so multibyte text must not break k-gram windows
    body = ("こんにちは世界 \U0001f600 " * 30)
    rows = [("jp_a", 0, body + "suffix one"),
            ("jp_b", 0, body + "suffix two"),
            ("far", 0, "totally unrelated english text about parquet files")]
    res = dedup_datasets(ray.data.from_arrow(_turns(rows)), tiny_cfg)
    cl = res.clusters.to_pandas().set_index("conv_id")["cluster_id"]
    assert cl["jp_a"] == cl["jp_b"] == "jp_a"
    assert cl["far"] == "far"


def test_near_identical_mega_cluster_one_component(tiny_cfg):
    """Per-band salting regression: 300 near-identical (NOT byte-identical,
    so exact dedup removes nothing) docs make every band's bucket hot and
    salted. A band-INdependent salt would give each doc the same salt in
    all bands and split this true cluster into up to salt_factor
    components; the per-band draw must keep it ONE."""
    base = ("alpha bravo charlie delta echo foxtrot golf hotel india "
            "juliett kilo lima mike november oscar papa quebec romeo "
            "sierra tango uniform victor whiskey xray yankee zulu " * 8
            ).split()
    rows = []
    for i in range(300):
        words = list(base)
        words[i % len(words)] = f"zzz{i}"
        rows.append((f"m{i:04d}", 0, " ".join(words)))
    res = dedup_datasets(ray.data.from_arrow(_turns(rows)), tiny_cfg)
    cl = res.clusters.to_pandas()
    assert len(cl) == 300
    assert cl["cluster_id"].nunique() == 1
    assert keep_list(res).count() == 1


def test_salt_draw_varies_per_band(tiny_cfg):
    """Pins the per-band salting property directly: two docs with
    different doc_hash % salt_factor, sharing the SAME hot bucket in all
    32 bands, must land in the same salted sub-bucket in at least one
    band. Under the old band-independent salt (doc_hash % s) this was
    IMPOSSIBLE — the pair was separated in every band, permanently
    splitting mega near-dup clusters."""
    from miekki_ray.stages.candidates import salt_hot_buckets

    b = 32
    keys = np.arange(b, dtype=np.int64) + 1000   # one hot bucket per band
    band_rows = pa.table({
        "conv_id": pa.array(["a"] * b + ["b"] * b, type=pa.string()),
        "doc_hash": pa.array(
            np.concatenate([np.full(b, 5), np.full(b, 11)]).astype(
                np.uint64), type=pa.uint64()),           # 5 % 16 != 11 % 16
        "bucket_key": pa.array(np.tile(keys, 2), type=pa.int64()),
        "band": pa.array(np.tile(np.arange(b, dtype=np.int32), 2),
                         type=pa.int32()),
    })
    out = salt_hot_buckets(ray.data.from_arrow(band_rows), keys,
                           tiny_cfg).to_pandas()
    pivot = out.pivot(index="band", columns="conv_id",
                      values="bucket_key")
    n_meet = int((pivot["a"] == pivot["b"]).sum())
    assert n_meet >= 1, "pair separated in every band"
    # and the split is real: they do NOT share every sub-bucket
    assert n_meet < b


def test_spread_thin_hot_bucket_second_chance(tiny_cfg):
    """VERDICT r3 Next #6: a hot bucket (size > bucket_cap) whose rows
    land at most ONE per map batch never repeats locally, so the old
    local-repeat heuristic could not see it. The exact keys-only count
    must detect it, attribute it to the second-chance counter (not the
    local one), and the salting stage must then actually re-key it."""
    from miekki_ray.stages.candidates import (hot_bucket_keys,
                                              salt_hot_buckets)
    from miekki_ray.state.metrics import MetricsSink

    cap = tiny_cfg.bucket_cap
    m = cap + 6
    stride = 1024          # one hot row per 1024-row BLOCK: one batch
    n = m * stride         # whether batches are whole blocks or sliced
    keys = np.arange(n, dtype=np.int64) + 10_000_000   # distinct fillers
    hot_key = np.int64(777)
    keys[::stride] = hot_key
    band_rows = pa.table({
        "conv_id": pa.array([f"c{i}" for i in range(n)], type=pa.string()),
        "doc_hash": pa.array(
            np.arange(n, dtype=np.uint64) * np.uint64(2654435761),
            type=pa.uint64()),
        "bucket_key": pa.array(keys, type=pa.int64()),
    })
    ds = ray.data.from_arrow(
        [band_rows.slice(i * stride, stride) for i in range(m)])
    sink = MetricsSink()
    hot = hot_bucket_keys(ds, tiny_cfg, sink.name)
    counters = sink.collect()
    sink.close()
    assert hot_key in hot
    assert counters["hot_buckets_second_chance"] >= 1
    assert counters.get("hot_buckets_local", 0) == 0
    salted = salt_hot_buckets(ds, hot, tiny_cfg).to_pandas()
    hot_rows = salted[salted["conv_id"].isin(
        {f"c{i}" for i in range(0, n, stride)})]
    assert len(hot_rows) == m
    # every hot row re-keyed, into at most salt_factor sub-buckets
    assert (hot_rows["bucket_key"] != int(hot_key)).all()
    assert hot_rows["bucket_key"].nunique() <= tiny_cfg.salt_factor
    # fillers untouched
    assert (salted["bucket_key"] == 10_000_001).sum() == 1


def test_oracle_256_shingle_mega_duplicate_not_dropped():
    """Regression (ADVICE r2, oracle.py uint8 matmul): 200 identical docs
    whose doc has EXACTLY 256 distinct k=12 shingles. Every shingle group
    has 200 > big_group members, so the oracle takes the dense heavy-doc
    path; a uint8 incidence matmul wraps 256 shared hashes to 0 and
    silently drops ALL 19,900 pairs. The fixed int32 product must return
    every pair at J=1.0."""
    from miekki_ray.functions.hashing import shingle_hashes
    from miekki_ray.oracle import exact_pairs, oracle_truth

    # strictly-increasing 4-digit counters: no 12-byte substring repeats,
    # so an N-byte doc has exactly N-11 distinct shingles
    body = "".join(f"{i:04d}" for i in range(100))
    text = body[:265]                     # doc = 'u' + \x1f + text = 267 B
    doc = "u\x1f" + text
    assert shingle_hashes(doc.encode("utf-8"), 12).size == 256

    n = 200
    rows = [(f"c{i:03d}", 0, text) for i in range(n)]
    turns = _turns(rows)
    pairs = exact_pairs(turns, k=12)
    assert len(pairs) == n * (n - 1) // 2
    assert (pairs["jaccard"] == 1.0).all()
    _, clusters = oracle_truth(turns, k=12, jaccard_threshold=0.8)
    assert clusters["cluster_id"].nunique() == 1


def test_oracle_empty_and_null_text():
    """r4 review: the oracle must handle an empty corpus (np.concatenate
    of zero sets) and null turn text (null doc, mirroring the engine's
    binary_join emit_null) without crashing."""
    from miekki_ray.oracle import exact_pairs, reconstruct_docs_pandas

    empty = _turns([])
    out = exact_pairs(empty, k=12)
    assert len(out) == 0
    assert list(out.columns) == ["a", "b", "jaccard", "containment"]

    rows = _turns([("c1", 0, "hello world of text"),
                   ("c2", 0, "hello world of text")])
    nulled = rows.set_column(
        rows.schema.get_field_index("text"), "text",
        pa.array(["hello world of text", None], type=pa.string()))
    docs = reconstruct_docs_pandas(nulled)
    assert docs.set_index("conv_id")["doc"]["c2"] is None
    pairs = exact_pairs(nulled, k=4)   # must not crash on the null doc
    # a null doc has an empty-bytes shingle set: zero intersection with
    # any real doc, so it never pairs
    assert ("c1", "c2") not in set(zip(pairs["a"], pairs["b"]))


def test_pair_cap_metrics_count_every_group():
    """ADVICE r4 (metrics.py token): emit() fires once per _part GROUP and
    Ray runs many groups per task — the retry-dedup token must include a
    per-group discriminator or every emission after the first in a task
    is silently dropped as a presumed retry. 8 capped buckets spread over
    8 parts must count 8 capped buckets, not 1."""
    from miekki_ray.stages.candidates import candidate_pairs
    from miekki_ray.state.metrics import MetricsSink

    cfg = DedupConfig(num_partitions=8, pair_cap=4)
    G, m = 8, 5                # 10 pairs per bucket > pair_cap=4
    ids, keys, dh = [], [], []
    for g in range(G):
        for i in range(m):
            ids.append(f"g{g}_c{i}")
            keys.append(g)     # key % 8 == g: exactly one bucket per part
            dh.append(g * m + i)
    band_rows = pa.table({
        "conv_id": pa.array(ids, type=pa.string()),
        "doc_hash": pa.array(np.array(dh, dtype=np.uint64),
                             type=pa.uint64()),
        "bucket_key": pa.array(np.array(keys, dtype=np.int64),
                               type=pa.int64()),
    })
    sink = MetricsSink()
    pairs = candidate_pairs(ray.data.from_arrow(band_rows), cfg, sink.name)
    assert pairs.count() > 0   # force execution before collect
    counters = sink.collect()
    sink.close()
    assert counters.get("pairs_capped_buckets", 0) == G
    assert counters.get("pairs_dropped_by_cap", 0) == G * (10 - 4)
