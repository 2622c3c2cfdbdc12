"""Property-based tests (SURVEY.md §5.2, hypothesis):
row-order invariance of keyed outputs · duplicate injection always found at
J=1.0 · normalization idempotence · sketch determinism under permutation.

Kernel-level properties run WITHOUT Ray (pure numpy paths) so hypothesis
can explore many examples cheaply; the Ray-level invariances are covered by
deterministic tests in test_docs/test_pipeline."""

import numpy as np
import pyarrow.compute as pc
import pyarrow as pa
from hypothesis import given, settings, strategies as st

from miekki_ray.functions.hashing import (
    band_hashes,
    exact_jaccard,
    hash_params,
    minhash_from_concat,
    shingle_hashes,
)

_text = st.text(
    alphabet=st.characters(codec="utf-8",
                           blacklist_categories=("Cs",)),
    min_size=0, max_size=200)


@given(_text, st.integers(min_value=2, max_value=16))
@settings(max_examples=80, deadline=None)
def test_shingles_deterministic_and_unique(t, k):
    a = shingle_hashes(t.encode("utf-8"), k)
    b = shingle_hashes(t.encode("utf-8"), k)
    assert np.array_equal(a, b)
    assert a.size >= 1
    assert np.unique(a).size == a.size   # sorted unique by contract


@given(_text)
@settings(max_examples=60, deadline=None)
def test_identical_docs_jaccard_one(t):
    h = shingle_hashes(t.encode("utf-8"), 8)
    assert exact_jaccard(h, h) == 1.0
    # identical docs always share every band => always LSH candidates
    a_p, b_p = hash_params(32, 5)
    sig = minhash_from_concat(np.concatenate([h, h]),
                              np.array([0, h.size]), a_p, b_p)
    bh = band_hashes(sig, 8, 4, seed=3)
    assert np.array_equal(bh[0], bh[1])


@given(st.lists(st.integers(min_value=0, max_value=2**64 - 1),
                min_size=1, max_size=200))
@settings(max_examples=60, deadline=None)
def test_minhash_permutation_invariant(xs):
    """Signatures depend on the shingle SET, not its order."""
    x = np.unique(np.array(xs, dtype=np.uint64))
    a_p, b_p = hash_params(16, 9)
    s1 = minhash_from_concat(x, np.array([0]), a_p, b_p)
    rng = np.random.default_rng(0)
    perm = rng.permutation(x.size)
    s2 = minhash_from_concat(x[perm], np.array([0]), a_p, b_p)
    assert np.array_equal(s1, s2)


@given(_text)
@settings(max_examples=60, deadline=None)
def test_normalization_idempotent(t):
    arr = pa.array([t], type=pa.string())
    once = pc.utf8_normalize(
        pc.replace_substring(arr, pattern="\r\n", replacement="\n"),
        form="NFC")
    twice = pc.utf8_normalize(
        pc.replace_substring(once, pattern="\r\n", replacement="\n"),
        form="NFC")
    assert once.equals(twice)


@given(st.lists(st.tuples(st.sampled_from(["a", "b", "c", "d", "e"]),
                          st.sampled_from(["a", "b", "c", "d", "e"])),
                min_size=0, max_size=20))
@settings(max_examples=60, deadline=None)
def test_unionfind_edge_order_invariant(edges):
    """Components must not depend on edge order (SURVEY §5.2)."""
    from miekki_ray.oracle import UnionFind

    def comp(es):
        uf = UnionFind()
        for x, y in es:
            uf.union(x, y)
        return {n: uf.find(n) for e in es for n in e}

    c1 = comp(edges)
    c2 = comp(list(reversed(edges)))
    assert c1 == c2


def test_r5_keyed_ops_row_order_invariant():
    """SURVEY §5.2 (row-order invariance of every keyed output) extended
    to the r5 ops: permuting input rows must not change snm_pairs or
    chunk_docs results — their outputs are keyed, never positional."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from miekki_ray.stages.packing import chunk_docs
    from miekki_ray.stages.snm import snm_pairs

    rng = np.random.default_rng(9)
    n = 80
    df = pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "key": [f"k{rng.integers(0, 30):03d}" for _ in range(n)],
        "text": [" ".join(f"w{rng.integers(0, 50)}"
                          for _ in range(int(rng.integers(1, 40))))
                 for _ in range(n)],
    })
    perm = df.sample(frac=1.0, random_state=7).reset_index(drop=True)

    def ds(frame, cols):
        return ray.data.from_arrow(
            pa.Table.from_pandas(frame[cols], preserve_index=False)
            .replace_schema_metadata(None)).repartition(3)

    for frame_a, frame_b in ((df, perm),):
        s1 = snm_pairs(ds(frame_a, ["doc_id", "key"]), window=5,
                       num_partitions=4).to_pandas()
        s2 = snm_pairs(ds(frame_b, ["doc_id", "key"]), window=5,
                       num_partitions=4).to_pandas()
        key = ["a", "b", "gap"]
        pd.testing.assert_frame_equal(
            s1.sort_values(key).reset_index(drop=True),
            s2.sort_values(key).reset_index(drop=True))
        c1 = chunk_docs(ds(frame_a, ["doc_id", "text"]), chunk_tokens=8,
                        overlap=2, num_partitions=4).to_pandas()
        c2 = chunk_docs(ds(frame_b, ["doc_id", "text"]), chunk_tokens=8,
                        overlap=2, num_partitions=4).to_pandas()
        key = ["doc_id", "chunk_idx"]
        pd.testing.assert_frame_equal(
            c1.sort_values(key).reset_index(drop=True),
            c2.sort_values(key).reset_index(drop=True))
