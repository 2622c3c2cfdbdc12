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


def test_pack_bins_empty():
    from miekki_ray.stages.packing import pack_bins

    df = pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                       "text": pd.Series([], dtype=str)})
    assert pack_bins(ray.data.from_pandas(df), budget=10).count() == 0
