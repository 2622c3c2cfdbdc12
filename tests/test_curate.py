"""Curation pipeline: planted low-quality docs filtered, exact dups
keep-first'd."""
import pandas as pd
import ray.data

from miekki_ray.pipelines.curate import curate_documents

GOOD = ("the quick brown fox jumps over the lazy dog and then runs back "
        "to the barn where it sleeps all day long with the other animals "
        "that live there in peace and quiet every single afternoon while "
        "the farmer watches from the porch and sips his coffee slowly")


def test_curate_filters_and_keeps_first():
    docs = pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 5],
        "text": [
            GOOD,                       # passes
            "short text",               # too few words
            "1234 5678 !!! ??? 0000 " * 20,   # low alpha ratio
            GOOD,                       # exact dup of 1 -> dropped
            GOOD + " extra tail words here to make it distinct",  # passes
        ],
    })
    out = curate_documents(ray.data.from_pandas(docs)) \
        .to_pandas().sort_values("doc_id")
    assert list(out["doc_id"]) == [1, 5]
    assert (out["n_words"] >= 40).all()
    assert (out["alpha_ratio"] >= 0.8).all()


def test_quality_filter_narrow_kernel_matches_full_scores():
    """r4 review: quality_filter computes a NARROW 3-column kernel on the
    hot path — it must stay pinned to quality_scores' definitions."""
    import numpy as np
    import pyarrow as pa

    from miekki_ray.functions.textstats import quality_scores
    from miekki_ray.pipelines.curate import quality_filter

    texts = ["hello world " * 30, "short", "ALL CAPS TEXT! " * 20,
             "naïve café über " * 25, "a" * 100, "", "word " * 45,
             "mixed 123 !@# text with punctuation, marks. " * 10]
    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
        "text": pa.array(texts, type=pa.string()),
    }))
    got = quality_filter(docs, min_words=0, min_alpha_ratio=0.0) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    full = quality_scores(pd.Series(texts))
    np.testing.assert_array_equal(got["n_chars"], full["n_chars"])
    np.testing.assert_array_equal(got["n_words"], full["n_words"])
    np.testing.assert_array_equal(got["alpha_ratio"], full["alpha_ratio"])
