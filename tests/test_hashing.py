"""Unit tests for the numeric sketch kernels (SURVEY.md §5.1)."""

import numpy as np
import pytest

from miekki_ray.config import DedupConfig
from miekki_ray.functions.hashing import (
    band_hashes,
    exact_jaccard,
    hash_params,
    minhash_from_concat,
    shingle_hashes,
    splitmix64,
)


def _brute_shingles(data: bytes, k: int) -> np.ndarray:
    buf = np.frombuffer(data, dtype=np.uint8)
    M = 1 << 64
    p = 0x9E3779B97F4A7C15
    out = []
    for i in range(buf.size - k + 1):
        h = 0
        for j in range(k):
            h = (h + (int(buf[i + j]) + 1) * pow(p, k - 1 - j, M)) % M
        out.append(h)
    return np.unique(splitmix64(np.array(out, dtype=np.uint64)))


@pytest.mark.parametrize("k", [2, 5, 10, 13])
def test_rolling_hash_matches_bruteforce(k):
    data = "the quick brown fox jumps over the lazy dog — πλθ unicode".encode()
    assert np.array_equal(shingle_hashes(data, k), _brute_shingles(data, k))


def test_shingle_degenerate_docs():
    assert shingle_hashes(b"", 10).size == 1
    assert shingle_hashes(b"ab", 10).size == 1
    # identical short docs hash identically; different ones differ
    assert np.array_equal(shingle_hashes(b"ab", 10), shingle_hashes(b"ab", 10))
    assert not np.array_equal(shingle_hashes(b"ab", 10),
                              shingle_hashes(b"ac", 10))


def test_uint64_wraparound_pinned():
    """§7 hard part 4: uint64 multiply must wrap mod 2^64 deterministically."""
    x = np.array([0xFFFFFFFFFFFFFFFF], dtype=np.uint64)
    with np.errstate(over="ignore"):
        y = x * np.uint64(3)
    assert y[0] == (0xFFFFFFFFFFFFFFFF * 3) % (1 << 64)
    # published splitmix64 test vector: seed 0 → first output = finalizer of
    # the golden-ratio gamma 0x9E3779B97F4A7C15 → 0xE220A8397B1DCDAF
    assert splitmix64(np.array([0x9E3779B97F4A7C15], dtype=np.uint64))[0] \
        == np.uint64(0xE220A8397B1DCDAF)


def test_minhash_estimates_jaccard():
    """Pairwise sig agreement ≈ exact Jaccard within CLT bounds at S=128."""
    rng = np.random.default_rng(3)
    S = 128
    a_p, b_p = hash_params(S, 42)
    for target in (0.3, 0.6, 0.9):
        n = 4000
        shared = int(n * 2 * target / (1 + target))
        base = rng.integers(0, 2**64, size=3 * n, dtype=np.uint64)
        A = np.unique(base[:n])
        B = np.unique(np.concatenate([A[: shared], base[n: 2 * n - shared]]))
        J = exact_jaccard(A, B)
        concat = np.concatenate([A, B])
        offs = np.array([0, A.size])
        sig = minhash_from_concat(concat, offs, a_p, b_p)
        est = float((sig[0] == sig[1]).mean())
        # 4 sigma of binomial(S, J)
        tol = 4 * np.sqrt(J * (1 - J) / S) + 1e-9
        assert abs(J - est) <= tol, (target, J, est, tol)


def test_minhash_deterministic_across_calls():
    a_p, b_p = hash_params(128, 42)
    x = np.unique(np.random.default_rng(0).integers(
        0, 2**64, 100, dtype=np.uint64))
    s1 = minhash_from_concat(x, np.array([0]), a_p, b_p)
    s2 = minhash_from_concat(x, np.array([0]), a_p, b_p)
    assert np.array_equal(s1, s2)


def test_band_math():
    cfg = DedupConfig()
    assert cfg.bands * cfg.rows_per_band == cfg.num_perm
    with pytest.raises(ValueError):
        DedupConfig(bands=5, rows_per_band=4, num_perm=128)
    # identical signatures collide in every band; different ones mostly don't
    sig = np.random.default_rng(1).integers(
        0, 2**64, size=(3, 128), dtype=np.uint64)
    sig[1] = sig[0]
    bh = band_hashes(sig, 32, 4, seed=9)
    assert np.array_equal(bh[0], bh[1])
    assert not np.array_equal(bh[0], bh[2])
    # planted partial agreement: doc 2 copies band 5's slots from doc 0
    sig2 = sig.copy()
    sig2[2, 5 * 4: 6 * 4] = sig[0, 5 * 4: 6 * 4]
    bh2 = band_hashes(sig2, 32, 4, seed=9)
    assert bh2[2, 5] == bh2[0, 5]
    assert (bh2[2] == bh2[0]).sum() == 1


def test_band_constants_separate_bands():
    """Same slot values in different bands must not collide by construction."""
    sig = np.zeros((1, 128), dtype=np.uint64)
    bh = band_hashes(sig, 32, 4, seed=9)
    assert np.unique(bh).size == 32


def test_arrow_str_hash64_buffer_handling():
    """r5 kernel (VERDICT r4 Next #6): the buffer-level string hash must
    agree across chunked / sliced / large_string representations of the
    same values, distinguish prefixes, hash empty == null(len 0), vary
    by seed, and spread partitions evenly."""
    import pyarrow as pa

    from miekki_ray.functions.hashing import arrow_str_hash64

    col = pa.array(["abc", "", "abcd", "abc", "x", None, "日本語テキスト"],
                   type=pa.string())
    h = arrow_str_hash64(col)
    assert h[0] == h[3]                      # same value, same hash
    assert h[0] != h[2]                      # prefix extension differs
    assert h[1] == h[5]                      # empty == null (len 0)
    ch = pa.chunked_array([col[:3], col[3:]])
    assert (arrow_str_hash64(ch) == h).all()
    sl = col.slice(2, 3)                     # non-zero array offset
    assert (arrow_str_hash64(sl) == h[2:5]).all()
    assert (arrow_str_hash64(col.cast(pa.large_string())) == h).all()
    assert (arrow_str_hash64(col, seed=1) != h).any()
    big = pa.array([f"conv{i:08d}" for i in range(50_000)])
    hb = arrow_str_hash64(big)
    assert np.unique(hb).size == 50_000      # injective on this id space
    cnt = np.bincount((hb % np.uint64(64)).astype(int), minlength=64)
    assert cnt.min() > 50_000 / 64 * 0.8     # balanced partitions
