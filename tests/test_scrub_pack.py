"""Unit tests for the PII-redaction, decontamination and sequence-packing
stages (stages/scrub.py, stages/packing.py)."""

import numpy as np
import pandas as pd
import ray.data


def test_redact_pii():
    from miekki_ray.stages.scrub import redact_pii

    df = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": [
            "mail me at a.b-c_d@foo-bar.org today",
            "call +1-555-0100 or 44-555-0199 now",
            "clean text no pii",
        ],
    })
    out = (redact_pii(ray.data.from_pandas(df))
           .to_pandas().sort_values("doc_id"))
    assert out["text"].tolist() == [
        "mail me at <EMAIL> today",
        "call <PHONE> or <PHONE> now",
        "clean text no pii",
    ]
    assert out["n_emails"].tolist() == [1, 0, 0]
    assert out["n_phones"].tolist() == [0, 2, 0]


def test_decontaminate_planted():
    from miekki_ray.stages.scrub import decontaminate

    bench_text = ("alpha beta gamma delta epsilon zeta eta theta iota "
                  "kappa")
    cand = pd.DataFrame({
        "doc_id": [10, 11, 12, 13],
        "text": [
            # shares the beta..iota 8-gram with the bench doc
            "xx " + " ".join(bench_text.split()[1:9]) + " yy",
            "one two three four five six seven eight nine",
            # only 7 words: a bench prefix, but below the gram length
            "alpha beta gamma delta epsilon zeta eta",
            "",
        ],
    })
    bench = pd.DataFrame({"doc_id": [1], "text": [bench_text]})
    out = (decontaminate(ray.data.from_pandas(cand),
                         ray.data.from_pandas(bench))
           .to_pandas().sort_values("doc_id"))
    assert out["doc_id"].tolist() == [10, 11, 12, 13]
    assert out["contaminated"].tolist() == [True, False, False, False]


def test_batch_grams_pinned_tokenizer():
    """VT (\\x0b) is whitespace to Python str.split() but NOT to the
    pinned TOKEN_SPLIT_RE class (RE2 \\s is ASCII [\\t\\n\\f\\r ]) —
    the gram kernel must follow the pinned class or the DuckDB oracle
    diverges."""
    from miekki_ray.stages.scrub import _batch_grams

    idx, grams = _batch_grams(pd.Series(["a\x0bb c d e f g h i"]), 8)
    assert list(grams) == ["a\x0bb c d e f g h i"]
    assert idx.tolist() == [0]


def test_ngram_tokenizer_pinned():
    """Same pin for the word-n-gram dedup kernel: 'a\\x0bb' is ONE word."""
    from miekki_ray.stages.ngram import ngram_jaccard

    assert ngram_jaccard("a\x0bb", "a\x0bb") == 1.0
    # str.split() would tokenize both sides to ['a', 'b'] and call them
    # identical; the pinned class keeps them distinct
    assert ngram_jaccard("a\x0bb", "a b") < 1.0


def test_pack_bins_wide_id_space():
    """Range tags must stay monotone on id spaces where integer
    (ids - lo) * P overflows int64."""
    from miekki_ray.stages.packing import pack_bins

    ids = np.array([0, 2 ** 62, 2 ** 63 - 1], dtype=np.int64)
    toks = np.array([5, 7, 11])
    df = pd.DataFrame({
        "doc_id": ids,
        "text": [" ".join(["w"] * int(t)) for t in toks],
    })
    out = (pack_bins(ray.data.from_pandas(df), budget=10,
                     num_partitions=16)
           .to_pandas().sort_values("doc_id"))
    excl = np.cumsum(toks) - toks
    assert out["doc_id"].tolist() == ids.tolist()
    assert out["bin"].tolist() == (excl // 10).tolist()


def test_pack_bins_matches_serial_scan():
    from miekki_ray.stages.packing import pack_bins

    rng = np.random.default_rng(7)
    n = 500
    ids = np.arange(100, 100 + n)        # nonzero lo exercises the offset
    toks = rng.integers(1, 60, n)
    df = pd.DataFrame({
        "doc_id": ids,
        "text": [" ".join(["w"] * int(t)) for t in toks],
    })
    ds = ray.data.from_pandas(df).repartition(7)
    out = (pack_bins(ds, budget=100, num_partitions=5)
           .to_pandas().sort_values("doc_id"))
    excl = np.cumsum(toks) - toks        # serial exclusive prefix sum
    assert out["n_tokens"].tolist() == toks.tolist()
    assert out["bin"].tolist() == (excl // 100).tolist()


def test_pack_bins_clustered_ids_balanced_partitions():
    """VERDICT r3 Next #5: a 99%-clustered doc_id space (most ids packed
    into a narrow band, a few far outliers) must still (a) produce the
    exact serial-scan bins and (b) spread rows ~evenly across the range
    partitions — quantile boundaries, not value-proportional tags."""
    from miekki_ray.functions.tdigest import approx_quantiles
    from miekki_ray.stages.packing import pack_bins

    rng = np.random.default_rng(11)
    n, P = 1000, 8
    # 99% of ids in [0, 1000); 1% out at ~1e15
    ids = np.sort(np.concatenate([
        rng.choice(np.arange(990, dtype=np.int64), size=990, replace=False),
        np.int64(10 ** 15) + np.arange(10, dtype=np.int64),
    ]))
    toks = rng.integers(1, 40, n)
    df = pd.DataFrame({
        "doc_id": ids,
        "text": [" ".join(["w"] * int(t)) for t in toks],
    })
    ds = ray.data.from_pandas(df).repartition(6)
    out = (pack_bins(ds, budget=64, num_partitions=P)
           .to_pandas().sort_values("doc_id"))
    excl = np.cumsum(toks) - toks
    assert out["bin"].tolist() == (excl // 64).tolist()
    # re-derive the tags the stage used; under the old linear map ALL
    # 990 clustered rows landed in partition 0 (max share 99%)
    slim = ray.data.from_pandas(df[["doc_id"]])
    bounds = approx_quantiles(slim, "doc_id",
                              qs=tuple(i / P for i in range(1, P)))
    parts = np.searchsorted(bounds, ids.astype(np.float64), side="left")
    share = np.bincount(parts, minlength=P) / n
    assert share.max() <= 2.5 / P, share


def test_pack_bins_empty():
    from miekki_ray.stages.packing import pack_bins

    df = pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                       "text": pd.Series([], dtype=str)})
    assert pack_bins(ray.data.from_pandas(df), budget=10).count() == 0


def test_dup_ngram_stats_planted():
    # n_words=3 to keep the fixture readable. Docs:
    #  d1: 5 words -> 3 distinct grams; shares "a b c" and "b c d" with d2
    #  d2: identical first 4 words -> grams "a b c","b c d" shared; "c d x"
    #      unique
    #  d3: fully unique grams
    #  d4: repeated gram WITHIN the doc only -> distinct-per-doc, df=1
    #  d5: 2 words -> below gram length, no row
    from miekki_ray.stages.scrub import dup_ngram_stats

    df = pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 5],
        "text": [
            "a b c d e",
            "a b c d x",
            "p q r s",
            "m n o m n o",
            "a b",
        ],
    })
    out = (dup_ngram_stats(ray.data.from_pandas(df), n_words=3,
                           flag_threshold=0.5)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert out["doc_id"].tolist() == [1, 2, 3, 4]
    # d4 has 4 gram positions but "m n o" twice -> 3 DISTINCT grams,
    # none shared with another doc (within-doc repeats don't count)
    assert out["n_grams"].tolist() == [3, 3, 2, 3]
    assert out["n_shared"].tolist() == [2, 2, 0, 0]
    assert out.loc[0, "shared_ratio"] == round(2 / 3, 6)
    assert out["dup_flag"].tolist() == [True, True, False, False]


def test_decontaminate_emit_clean():
    # emit='clean' returns surviving rows with their ORIGINAL columns —
    # same flag kernel as emit='flags' (pinned against it here)
    from miekki_ray.stages.scrub import decontaminate

    bench_text = ("alpha beta gamma delta epsilon zeta eta theta iota "
                  "kappa")
    cand = pd.DataFrame({
        "doc_id": [10, 11, 12],
        "text": [
            "xx " + " ".join(bench_text.split()[1:9]) + " yy",
            "one two three four five six seven eight nine",
            "alpha beta gamma delta epsilon zeta eta",
        ],
        "extra": ["a", "b", "c"],
    })
    bench = pd.DataFrame({"doc_id": [1], "text": [bench_text]})
    clean = (decontaminate(ray.data.from_pandas(cand),
                           ray.data.from_pandas(bench), emit="clean")
             .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert clean["doc_id"].tolist() == [11, 12]
    assert clean.columns.tolist() == ["doc_id", "text", "extra"]
    assert clean["extra"].tolist() == ["b", "c"]


def test_chunk_docs_windows_and_overlap():
    """E58: exact window layout — chunks start every C-O tokens, cover
    C tokens, last chunk short; empty text yields one empty-token
    chunk; byte-identical token split semantics (repeated spaces make
    empty tokens)."""
    import numpy as np
    import pyarrow as pa
    import pytest
    import ray.data

    from miekki_ray.stages.packing import chunk_docs

    docs = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], type=pa.int64()),
        "text": pa.array(["t0 t1 t2 t3 t4 t5 t6 t7 t8 t9", "a b", "",
                          "x  y"]),   # double space -> empty token
    })
    ds = ray.data.from_arrow(docs).repartition(2)
    out = chunk_docs(ds, chunk_tokens=4, overlap=2, num_partitions=4) \
        .to_pandas().sort_values(["doc_id", "chunk_idx"]) \
        .reset_index(drop=True)
    d1 = out[out["doc_id"] == 1]
    assert d1["chunk_text"].tolist() == [
        "t0 t1 t2 t3", "t2 t3 t4 t5", "t4 t5 t6 t7", "t6 t7 t8 t9",
        "t8 t9"]
    assert d1["n_tokens"].tolist() == [4, 4, 4, 4, 2]
    assert out[out["doc_id"] == 2]["chunk_text"].tolist() == ["a b"]
    assert out[out["doc_id"] == 3]["chunk_text"].tolist() == [""]
    # 3 tokens [x, '', y] at step 2: windows start at 0 AND 2 (the
    # second covers the tail token) — same as the SQL twin's
    # generate_series(0, floor((n-1)/step))
    assert out[out["doc_id"] == 4]["chunk_text"].tolist() == ["x  y", "y"]
    assert out[out["doc_id"] == 4]["n_tokens"].tolist() == [3, 1]
    # overlap=0 degenerates to disjoint windows
    dz = chunk_docs(ds, chunk_tokens=4, overlap=0, num_partitions=4) \
        .to_pandas()
    d1z = dz[dz["doc_id"] == 1].sort_values("chunk_idx")
    assert d1z["chunk_text"].tolist() == ["t0 t1 t2 t3", "t4 t5 t6 t7",
                                          "t8 t9"]
    with pytest.raises(ValueError, match="overlap"):
        chunk_docs(ds, chunk_tokens=4, overlap=4)


def test_chunk_docs_null_text_drops_like_oracle():
    """r5 review: a null-text doc must DROP (the SQL twin's unnest of
    NULL yields no rows), not crash the explode."""
    import pyarrow as pa
    import ray.data

    from miekki_ray.stages.packing import chunk_docs

    docs = pa.table({
        "doc_id": pa.array([1, 2], type=pa.int64()),
        "text": pa.array(["a b c", None], type=pa.string()),
    })
    out = chunk_docs(ray.data.from_arrow(docs), chunk_tokens=2,
                     overlap=0, num_partitions=2).to_pandas()
    assert set(out["doc_id"]) == {1}
    assert sorted(out["chunk_text"]) == ["a b", "c"]
