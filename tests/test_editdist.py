"""Edit-distance near-dup kernel tests (pure numpy — no Ray needed)."""
import numpy as np
import pandas as pd

from miekki_ray.stages.editdist import (_char_matrix, _pairwise_levenshtein,
                                        levenshtein_block_pairs)


def _ref_lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(cur[j - 1] + 1, prev[j] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_pairwise_levenshtein_matches_reference():
    rng = np.random.default_rng(3)
    words = ["".join(rng.choice(list("abcde"), size=rng.integers(0, 9)))
             for _ in range(40)]
    left = [words[i] for i in rng.integers(0, 40, 100)]
    right = [words[i] for i in rng.integers(0, 40, 100)]
    w = max(max((len(s) for s in left), default=1),
            max((len(s) for s in right), default=1), 1)
    A = _char_matrix(left, w)
    B = _char_matrix(right, w)
    la = np.array([len(s) for s in left], dtype=np.int32)
    lb = np.array([len(s) for s in right], dtype=np.int32)
    got = _pairwise_levenshtein(A, la, B, lb)
    want = [_ref_lev(a, b) for a, b in zip(left, right)]
    assert list(got) == want


def test_block_pairs_threshold_and_ordering():
    names = ["red widget", "red widget!", "red gadget", "blue bolt",
             "red widget"]          # [4] identical to [0] -> excluded
    keys = np.array([10, 3, 7, 1, 20])
    out = levenshtein_block_pairs(names, keys, max_dist=2)
    got = set(zip(out["a"], out["b"], out["dist"]))
    # lev(widget, widget!)=1; lev(widget, gadget)=2 ("wi"->"ga");
    # identical-name pair (10,20) excluded; "blue bolt" matches nothing
    assert got == {(3, 10, 1), (3, 20, 1), (7, 10, 2), (7, 20, 2)}
    assert (out["a"] < out["b"]).all()


def test_block_pairs_empty_and_singleton():
    empty = levenshtein_block_pairs([], np.array([], dtype=np.int64), 2)
    assert len(empty) == 0 and list(empty.columns) == ["a", "b", "dist"]
    one = levenshtein_block_pairs(["x"], np.array([1]), 2)
    assert len(one) == 0


def test_pairwise_levenshtein_unicode():
    left = ["café", "naïve", "日本語です", "a\x00b"]
    right = ["cafe", "naive", "日本語だよ", "ab"]
    w = max(len(s) for s in left + right)
    A, B = _char_matrix(left, w), _char_matrix(right, w)
    la = np.array([len(s) for s in left], dtype=np.int32)
    lb = np.array([len(s) for s in right], dtype=np.int32)
    got = list(_pairwise_levenshtein(A, la, B, lb))
    want = [_ref_lev(a, b) for a, b in zip(left, right)]
    assert got == want        # é/ï are single codepoints; NUL is a real char
