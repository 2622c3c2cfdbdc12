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
