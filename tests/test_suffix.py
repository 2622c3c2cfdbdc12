"""Unit tests for the suffix-array / LCS kernel (ST3, SURVEY.md §2.3)."""

import numpy as np

from miekki_ray.functions.suffix import (
    containment_ratio,
    lcs_len,
    suffix_array,
)


def _brute_sa(s: bytes) -> np.ndarray:
    return np.array(sorted(range(len(s)), key=lambda i: s[i:]),
                    dtype=np.int64)


def test_suffix_array_matches_bruteforce():
    for s in (b"banana", b"mississippi", b"aaaa", b"abcabcabc",
              b"the quick brown fox the quick"):
        got = suffix_array(np.frombuffer(s, dtype=np.uint8).astype(np.int16))
        assert np.array_equal(got, _brute_sa(s)), s


def _brute_lcs(a: bytes, b: bytes) -> int:
    best = 0
    for i in range(len(a)):
        for j in range(len(b)):
            k = 0
            while i + k < len(a) and j + k < len(b) and a[i + k] == b[j + k]:
                k += 1
            best = max(best, k)
    return best


def test_lcs_matches_bruteforce():
    cases = [
        (b"banana", b"ananas"),
        (b"hello world", b"yellow word"),
        (b"abc", b"xyz"),
        (b"same", b"same"),
        (b"", b"x"),
    ]
    for a, b in cases:
        assert lcs_len(a, b) == _brute_lcs(a, b), (a, b)


def test_lcs_random_fuzz():
    rng = np.random.default_rng(5)
    for _ in range(25):
        a = bytes(rng.integers(97, 101, size=rng.integers(1, 40)).tolist())
        b = bytes(rng.integers(97, 101, size=rng.integers(1, 40)).tolist())
        assert lcs_len(a, b) == _brute_lcs(a, b), (a, b)


def test_containment_ratio():
    doc = b"conversation turn one \x1e conversation turn two \x1e tail"
    prefix = doc[:30]
    assert containment_ratio(prefix, doc) == 1.0
    assert containment_ratio(b"zzzzz", doc) == 0.0
    # near-containment: one edit inside the contained part
    edited = bytearray(prefix)
    edited[10] = ord("X")
    r = containment_ratio(bytes(edited), doc)
    assert 0.5 < r < 1.0
