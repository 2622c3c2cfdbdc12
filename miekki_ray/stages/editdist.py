"""Edit-distance (Levenshtein) near-duplicate pairs — the character-level
dedup modality next to MinHash (set overlap), SimHash (bit overlap) and
embedding cosine (semantic): catches typo-level variants that shingle
Jaccard scores poorly on short strings.

Scale shape: all-pairs Levenshtein is O(n²·m²) and never acceptable, so
candidates are BLOCKED by a cheap equality key (here the brand column; for
free text use a length-bucket × first-token key) — the same
partition-then-verify contract as the LSH pipeline (stages/candidates.py).
Within a block, pairs are pre-filtered by the |len(a)-len(b)| ≤ d necessary
condition, then ONE dynamic program runs over ALL surviving pairs at once:
the DP row is a (n_pairs × Lmax) numpy matrix and the python-level loop is
max_len² iterations per block — independent of the number of pairs, so the
kernel stays vectorized at any block size."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data


def _char_matrix(names: list[str], width: int) -> np.ndarray:
    """(n × width) int64 codepoint matrix, -1 padded. UTF-32 encoding
    makes it full-Unicode (one cell per codepoint, matching DuckDB
    levenshtein's character semantics); padding is masked by position,
    so NUL characters in real data are not conflated with padding."""
    buf = "".join(n.ljust(width, "\x00") for n in names)
    m = np.frombuffer(buf.encode("utf-32-le"), dtype=np.uint32) \
        .reshape(len(names), width).astype(np.int64)
    lens = np.fromiter((len(n) for n in names), dtype=np.int64,
                       count=len(names))
    m[np.arange(width)[None, :] >= lens[:, None]] = -1
    return m


def _pairwise_levenshtein(A: np.ndarray, la: np.ndarray,
                          B: np.ndarray, lb: np.ndarray) -> np.ndarray:
    """Levenshtein distance for n pairs (A[i] vs B[i]), vectorized over
    pairs: python loop is len_a × len_b iterations total."""
    n, Ma = A.shape
    Lb = B.shape[1]
    res = np.zeros(n, dtype=np.int64)
    done = la == 0
    res[done] = lb[done]
    prev = np.tile(np.arange(Lb + 1, dtype=np.int32), (n, 1))
    for i in range(1, Ma + 1):
        cur = np.empty_like(prev)
        cur[:, 0] = i
        ai = A[:, i - 1][:, None]                      # (n, 1)
        for j in range(1, Lb + 1):
            sub = prev[:, j - 1] + (ai[:, 0] != B[:, j - 1])
            ins = cur[:, j - 1] + 1
            dele = prev[:, j] + 1
            cur[:, j] = np.minimum(np.minimum(ins, dele), sub)
        at_end = (la == i) & ~done
        if at_end.any():
            res[at_end] = cur[at_end, lb[at_end]]
            done |= at_end
        prev = cur
    return res


def levenshtein_block_pairs(names: list[str], keys: np.ndarray,
                            max_dist: int) -> pd.DataFrame:
    """All (a, b) key pairs in one block with 0 < lev(name_a, name_b)
    ≤ max_dist, a < b by key. Identical strings are exact duplicates
    (handled by the exact-dedup stage) and excluded here."""
    n = len(names)
    if n < 2:
        return pd.DataFrame({"a": pd.Series([], dtype=np.int64),
                             "b": pd.Series([], dtype=np.int64),
                             "dist": pd.Series([], dtype=np.int64)})
    order = np.argsort(keys, kind="stable")
    keys = keys[order]
    names = [names[i] for i in order]
    lens = np.array([len(s) for s in names], dtype=np.int32)
    ii, jj = np.triu_indices(n, k=1)
    # length filter: |la-lb| <= d is necessary for lev <= d
    keep = np.abs(lens[ii] - lens[jj]) <= max_dist
    ii, jj = ii[keep], jj[keep]
    if len(ii) == 0:
        return pd.DataFrame({"a": pd.Series([], dtype=np.int64),
                             "b": pd.Series([], dtype=np.int64),
                             "dist": pd.Series([], dtype=np.int64)})
    width = int(lens.max())
    chars = _char_matrix(names, width)
    # skip identical strings cheaply before the DP
    same = (lens[ii] == lens[jj]) & (chars[ii] == chars[jj]).all(axis=1)
    ii, jj = ii[~same], jj[~same]
    d = _pairwise_levenshtein(chars[ii], lens[ii], chars[jj], lens[jj])
    m = d <= max_dist
    return pd.DataFrame({"a": keys[ii[m]].astype(np.int64),
                         "b": keys[jj[m]].astype(np.int64),
                         "dist": d[m]})


def levenshtein_near_pairs(ds: ray.data.Dataset, *, key_col: str,
                           name_col: str, block_col: str,
                           max_dist: int = 2) -> ray.data.Dataset:
    """Blocked Levenshtein near-dup pairs over any (key, string, block)
    table. One grouped exchange on the block column co-locates each
    block; everything after is the vectorized block kernel. The blocking
    column is the recall contract: pairs straddling blocks are never
    considered (document the block choice per corpus — for open text use
    a normalized prefix or length bucket, and salt giant blocks the same
    way candidates.py salts hot LSH buckets)."""
    def per_block(g: pd.DataFrame) -> pd.DataFrame:
        return levenshtein_block_pairs(
            g[name_col].tolist(),
            g[key_col].to_numpy(dtype=np.int64), max_dist)

    return (ds.select_columns([key_col, name_col, block_col])
            .groupby(block_col)
            .map_groups(per_block, batch_format="pandas"))
