"""Scale-shaped containment pairs (stages/containment.py, r3): winnowing
candidate completeness (Schleimer floor + short-doc sweep), suffix-array
confirmation, and driver-narrow vs distributed path equality."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from miekki_ray.stages.containment import containment_pairs_ds


def _docs(rows):
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
        "text": pa.array([r[1] for r in rows], type=pa.string()),
    }))


@pytest.fixture(scope="module")
def corpus():
    filler = ("the quick brown fox jumps over the lazy dog while the "
              "band plays on and the crowd cheers loudly for more ")
    inner = ("a distinctive middle passage that appears verbatim inside "
             "a much longer host document with plenty of context")
    host = filler + inner + filler[::-1]
    rows = [
        (1, inner),                      # contained mid-host (>= floor)
        (2, host),                       # the host
        (3, host[:120]),                 # prefix of host (>= floor)
        (4, "tiny needle text"),         # 16 bytes < floor (short sweep)
        (5, filler + "tiny needle text" + filler),   # contains doc 4
        (6, "completely unrelated content about gardening and weather "
            "patterns across the southern hemisphere in early autumn"),
        (7, inner),                      # EQUAL to doc 1 -> excluded
    ]
    return rows


def _expected(rows):
    want = set()
    for i, (ai, at) in enumerate(rows):
        for bi, bt in rows[i + 1:]:
            if at != bt and (at in bt or bt in at):
                want.add((min(ai, bi), max(ai, bi)))
    return want


def test_containment_driver_path(corpus):
    out = containment_pairs_ds(_docs(corpus)).to_pandas()
    got = set(zip(out["a"], out["b"]))
    assert got == _expected(corpus)
    assert out["contained"].all()


def test_containment_distributed_path_identical(corpus):
    a = containment_pairs_ds(_docs(corpus)).to_pandas()
    b = containment_pairs_ds(_docs(corpus),
                             driver_confirm_pairs=0).to_pandas()
    key = lambda df: df.sort_values(["a", "b"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(key(a), key(b))


def test_containment_no_pairs():
    rows = [(1, "alpha unrelated content first document"),
            (2, "totally different second text about nothing shared")]
    out = containment_pairs_ds(_docs(rows)).to_pandas()
    assert len(out) == 0


def test_containment_short_doc_both_sides():
    # both docs below the Schleimer floor: covered by the short sweep
    rows = [(1, "needle"), (2, "the needle here"), (3, "zzz")]
    out = containment_pairs_ds(_docs(rows)).to_pandas()
    assert set(zip(out["a"], out["b"])) == {(1, 2)}


def test_winnow_batch_kernel_parity():
    # the r3 Arrow batch winnowing must be bit-identical to the per-doc
    # reference (same guarantee proof applies transitively)
    import numpy as np
    import pyarrow as pa

    from miekki_ray.functions.textstats import (winnow_fingerprints,
                                                winnow_sets_from_arrow)

    texts = ["", "hi", "a" * 11, "b" * 12, "hello world " * 50,
             "héllo wörld 🎉 " * 40, None, "x" * 10000,
             "the quick brown fox " * 300, "short"]
    for typ in (pa.string(), pa.large_string()):
        col = pa.array(texts, type=typ)
        for view, ref_texts in ((col, texts), (col.slice(2, 6), texts[2:8])):
            got = winnow_sets_from_arrow(view, k=12, window=32)
            assert len(got) == len(ref_texts)
            for t, b in zip(ref_texts, got):
                assert np.array_equal(
                    winnow_fingerprints(t or "", k=12, window=32), b)


def test_containment_near_mode_sa_kernel(corpus):
    # min_ratio < 1.0: the suffix-array LCS kernel is the decision (exact
    # containments pass through its fast path; near-misses are ratio'd).
    # doc 8 shares a long verbatim run with the host but diverges at the
    # tail -> not an exact substring, LCS ratio just under 1.0.
    filler, host = corpus[0][1], corpus[1][1]
    near = corpus[1][1][:200] + " divergent tail that breaks containment"
    rows = corpus + [(8, near)]
    exact = containment_pairs_ds(_docs(rows)).to_pandas()
    nearo = containment_pairs_ds(_docs(rows), min_ratio=0.8).to_pandas()
    ep = set(zip(exact["a"], exact["b"]))
    np_ = set(zip(nearo["a"], nearo["b"]))
    # near mode is a superset: every exact containment has ratio 1.0
    assert ep <= np_
    # the planted near-miss (2, 8) is found ONLY by the SA kernel:
    # 200/239 of doc 8 is a verbatim run of the host -> ratio ~0.837
    assert (2, 8) in np_ and (2, 8) not in ep
    # both paths agree in near mode too
    nearo_d = containment_pairs_ds(_docs(rows), min_ratio=0.8,
                                   driver_confirm_pairs=0).to_pandas()
    key = lambda df: df.sort_values(["a", "b"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(key(nearo), key(nearo_d))


def test_containment_distributed_multipartition():
    # >20k candidate pairs forces join_width >= 2: the chained hash
    # joins must survive partitions receiving zero left blocks (the
    # ensure_schema guard); P=1 paths never exercise that [env ray
    # 2.49.2].
    base = ("shared common core passage that every document embeds "
            "verbatim and that is comfortably longer than the winnowing "
            "floor of window plus k minus one bytes ")
    rows = [(i, f"doc {i} prefix " + base + f"suffix {i}")
            for i in range(250)]
    rows.append((9999, base))          # contained in every other doc
    out = containment_pairs_ds(_docs(rows),
                               driver_confirm_pairs=0).to_pandas()
    got = set(zip(out["a"], out["b"]))
    # exactly the (i, 9999) containments: the 250 hosts pairwise share
    # the base but none contains another (distinct prefix/suffix)
    assert got == {(i, 9999) for i in range(250)}


def test_containment_null_text_sql_semantics():
    # r4 review: a NULL text must emit NO pairs (DuckDB contains() is
    # NULL-propagating) instead of crashing _confirm on len(None) via the
    # degenerate empty-buffer fingerprint; non-null pairs are unaffected.
    # Exercise BOTH confirm paths.
    rows = [(1, "needle"), (2, "the needle here"), (3, None), (4, None)]
    for kw in ({}, {"driver_confirm_pairs": 0}):
        out = containment_pairs_ds(_docs(rows), **kw).to_pandas()
        assert set(zip(out["a"], out["b"])) == {(1, 2)}
