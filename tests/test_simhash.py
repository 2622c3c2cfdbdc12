"""M6 SimHash: signature properties + candidate blocking."""

import numpy as np
import pyarrow as pa
import ray.data

from miekki_ray.config import DedupConfig
from miekki_ray.functions.hashing import shingle_hashes
from miekki_ray.stages.simhash import (
    hamming64,
    simhash_candidates,
    simhash_docs,
    simhash_from_hashes,
)


def test_hamming64():
    a = np.array([0b1011, 0], dtype=np.uint64)
    b = np.array([0b0010, 2**63], dtype=np.uint64)
    assert list(hamming64(a, b)) == [2, 1]


def test_simhash_similar_docs_close():
    base = ("the quick brown fox jumps over the lazy dog and runs far "
            "away into the woods to hide from the hunter ") * 6
    edited = base.replace("hunter", "hunter", 1)[:-30] + "slightly new tail"
    other = "completely different content about databases and shuffles " * 6
    h = [simhash_from_hashes(shingle_hashes(t.encode(), 10))
         for t in (base, edited, other)]
    d_sim = hamming64(np.array([h[0]]), np.array([h[1]]))[0]
    d_diff = hamming64(np.array([h[0]]), np.array([h[2]]))[0]
    assert d_sim < d_diff
    assert d_diff - d_sim >= 6


def test_simhash_blocking_radius_guarantee(cfg):
    """r4 review: the block count must be DERIVED from max_hamming
    (pigeonhole needs d+1 blocks). The old fixed 4x16 split silently
    missed this pair: 4 differing bits, one per 16-bit block, hamming
    4 <= 6 yet no shared 16-bit block."""
    s0 = np.uint64(0x0123456789ABCDEF)
    s1 = s0 ^ ((np.uint64(1) << np.uint64(3))
               | (np.uint64(1) << np.uint64(19))
               | (np.uint64(1) << np.uint64(35))
               | (np.uint64(1) << np.uint64(51)))
    assert hamming64(np.array([s0]), np.array([s1]))[0] == 4
    simmed = ray.data.from_arrow(pa.table({
        "conv_id": pa.array(["a", "b"], type=pa.string()),
        "simhash": pa.array([s0, s1], type=pa.uint64()),
    }))
    pairs = simhash_candidates(simmed, cfg, max_hamming=6).to_pandas()
    assert ("a", "b") in set(zip(pairs["a"], pairs["b"]))
    # and the exact filter still rejects far pairs
    far = ray.data.from_arrow(pa.table({
        "conv_id": pa.array(["a", "b"], type=pa.string()),
        "simhash": pa.array([s0, ~s0], type=pa.uint64()),
    }))
    pairs = simhash_candidates(far, cfg, max_hamming=6).to_pandas()
    assert len(pairs) == 0


def test_simhash_candidates_find_exactish(cfg):
    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lambda mu nu xi omicron pi rho sigma tau upsilon ") * 4
    docs = pa.table({
        "conv_id": pa.array(["a", "b", "c"], type=pa.string()),
        "doc": pa.array([base, base + "tiny tail", "unrelated words " * 30],
                        type=pa.large_string()),
        "doc_hash": pa.array(np.array([1, 2, 3], dtype=np.uint64),
                             type=pa.uint64()),
    })
    ds = ray.data.from_arrow(docs)
    simmed = simhash_docs(ds, cfg)
    pairs = simhash_candidates(simmed, cfg, max_hamming=6).to_pandas()
    found = set(zip(pairs["a"], pairs["b"]))
    assert ("a", "b") in found
    assert ("a", "c") not in found


def test_simhash_max_hamming_out_of_range_raises():
    """ADVICE r4: at max_hamming >= 64 the pigeonhole guarantee is
    unsatisfiable over a 64-bit signature — must raise, not silently
    under-recall."""
    import pytest

    for bad in (64, 100, -1):
        with pytest.raises(ValueError):
            simhash_candidates(None, DedupConfig(), max_hamming=bad)
    # 63 is the largest honest radius and must still be accepted
    # (validation only; no dataset work happens before the explode)
    assert simhash_candidates is not None
