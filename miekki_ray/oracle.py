"""Brute-force exact-Jaccard oracle — the executable ground truth.

SURVEY.md §0 "oracle substitution": the reference's bundled test sequences
are unavailable, so the recall>=0.99 gate [spec BASELINE.json:14] is measured
against brute-force exact Jaccard over the SAME shingle sets at the same
(k, S, b, r) config — which is precisely what the reference's sketch
estimates. This module is intentionally trivial and shares no engine code
beyond the shingle definition (the contract under test's fixed point,
FIXTURES.md §B).

Scales to a few thousand conversations (test corpora); NOT a pipeline stage.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from miekki_ray.functions.hashing import shingle_hashes


def reconstruct_docs_pandas(turns: pa.Table, role_sep: str = "\x1f",
                            turn_sep: str = "\x1e") -> pd.DataFrame:
    """Independent doc reconstruction: stable (conv_id, turn_idx) sort, then
    role<sep>text pieces joined with turn_sep. Columns: conv_id, doc."""
    df = turns.select(["conv_id", "turn_idx", "role", "text"]).to_pandas()
    df = df.sort_values(["conv_id", "turn_idx"], kind="mergesort")
    df["piece"] = df["role"].str[:1] + role_sep + df["text"]
    # null turn text -> null piece -> null DOC, mirroring the engine's
    # Arrow kernels (binary_join emit_null propagation in stages/docs.py);
    # a per-group lambda is fine at oracle scope
    docs = df.groupby("conv_id", sort=True)["piece"].agg(
        lambda s: None if s.isna().any() else turn_sep.join(s))
    return docs.reset_index().rename(columns={"piece": "doc"})


def exact_pairs(turns: pa.Table, k: int, role_sep: str = "\x1f",
                turn_sep: str = "\x1e",
                big_group: int = 128) -> pd.DataFrame:
    """Pairs with shingle intersection > 0 and their EXACT Jaccard and
    containment. Columns: a, b, jaccard, containment (a < b).

    Ubiquitous shingles (shared by > big_group docs — e.g. boilerplate
    openings, or EVERY shingle of a mega-duplicate cluster) are handled
    densely: pairs sharing at least one such shingle are enumerated from
    the doc×big-hash incidence matrix (O(n_heavy²), fine at oracle scope)
    and their counts ADDED exactly — so a corpus of 10k identical docs
    yields all its pairs at J=1.0, not zero. The returned J values are
    exact for every pair with nonzero intersection."""
    docs = reconstruct_docs_pandas(turns, role_sep, turn_sep)
    if len(docs) == 0:   # empty corpus: np.concatenate([]) would raise
        return pd.DataFrame(columns=["a", "b", "jaccard", "containment"])
    ids = docs["conv_id"].to_numpy()
    # null docs shingle as empty bytes — the engine's shingle kernel
    # treats a null doc the same way
    sets = [shingle_hashes((d or "").encode("utf-8"), k)
            for d in docs["doc"]]
    sizes = np.array([s.size for s in sets], dtype=np.int64)

    # inverted index: shingle hash -> sorted doc indices sharing it
    all_h = np.concatenate(sets)
    all_d = np.repeat(np.arange(len(sets)), sizes)
    order = np.argsort(all_h, kind="stable")
    all_h, all_d = all_h[order], all_d[order]
    # group boundaries of equal hashes
    bounds = np.flatnonzero(np.concatenate(([True], all_h[1:] != all_h[:-1])))
    bounds = np.append(bounds, all_h.size)

    pair_keys: list[np.ndarray] = []
    n = len(sets)
    group_sizes = np.diff(bounds)
    # size-2 hash groups are the overwhelming majority: vectorize them
    two = np.flatnonzero(group_sizes == 2)
    if two.size:
        s0 = bounds[two]
        x, y = all_d[s0], all_d[s0 + 1]
        lo, hi = np.minimum(x, y), np.maximum(x, y)
        pair_keys.append(lo.astype(np.int64) * n + hi)
    big_members: list[np.ndarray] = []
    for gi in np.flatnonzero(group_sizes > 2):
        s, e = bounds[gi], bounds[gi] + group_sizes[gi]
        m = e - s
        if m > big_group:
            big_members.append(all_d[s:e])
            continue
        d = np.sort(all_d[s:e])
        ii, jj = np.triu_indices(m, k=1)
        pair_keys.append(d[ii].astype(np.int64) * n + d[jj])
    small = (np.concatenate(pair_keys) if pair_keys
             else np.empty(0, dtype=np.int64))
    keys, counts = np.unique(small, return_counts=True)
    B = None
    if big_members:
        # dense incidence over the ubiquitous hashes
        B = np.zeros((n, len(big_members)), dtype=bool)
        for col, mem in enumerate(big_members):
            B[mem, col] = True
        # pairs sharing ONLY big hashes must still be emitted (a
        # mega-duplicate cluster has EVERY shingle in a big group):
        # enumerate pairs of heavy docs with >= 1 shared big hash
        heavy = np.flatnonzero(B.any(axis=1))
        if heavy.size >= 2:
            # int32, NOT uint8: a uint8 matmul wraps at 256, so heavy-doc
            # pairs sharing an exact multiple of 256 ubiquitous shingles
            # would read 0 shared and be silently dropped (ADVICE r2).
            Bh = B[heavy].astype(np.int32)
            share = (Bh @ Bh.T) > 0
            ii, jj = np.nonzero(np.triu(share, k=1))
            hkeys = heavy[ii].astype(np.int64) * n + heavy[jj]
            extra = np.setdiff1d(hkeys, keys)   # both sides unique
            keys = np.concatenate([keys, extra])
            counts = np.concatenate(
                [counts, np.zeros(extra.size, dtype=counts.dtype)])
    if keys.size == 0:
        return pd.DataFrame(columns=["a", "b", "jaccard", "containment"])
    ai, bi = keys // n, keys % n
    inter = counts.astype(np.float64)
    if B is not None:
        # exact +1 per big hash both pair members carry
        inter += (B[ai] & B[bi]).sum(axis=1)
    union = sizes[ai] + sizes[bi] - inter
    jac = inter / union
    cont = inter / np.minimum(sizes[ai], sizes[bi])
    return pd.DataFrame({
        "a": ids[ai], "b": ids[bi], "jaccard": jac, "containment": cont,
    })


class UnionFind:
    """Trivial oracle union-find (path halving + size)."""

    def __init__(self) -> None:
        self.parent: dict[str, str] = {}

    def find(self, x: str) -> str:
        p = self.parent.setdefault(x, x)
        while p != self.parent[p]:
            self.parent[p] = self.parent[self.parent[p]]
            p = self.parent[p]
        self.parent[x] = p
        return p

    def union(self, a: str, b: str) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            # deterministic: smaller id wins as root
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            self.parent[hi] = lo


def cluster_pairs(pairs: pd.DataFrame, all_ids: list[str]) -> pd.DataFrame:
    """Connected components; cluster_id = min conv_id in component.
    Columns: conv_id, cluster_id (every id gets a row; singletons map to
    themselves)."""
    uf = UnionFind()
    for a, b in zip(pairs["a"], pairs["b"]):
        uf.union(a, b)
    # min-id root: find() roots are already min under the union rule above
    # but do a second pass to be safe under arbitrary edge order
    comp: dict[str, str] = {}
    for cid in all_ids:
        comp[cid] = uf.find(cid) if cid in uf.parent else cid
    mins: dict[str, str] = {}
    for cid, root in comp.items():
        if root not in mins or cid < mins[root]:
            mins[root] = cid
    return pd.DataFrame({
        "conv_id": list(comp.keys()),
        "cluster_id": [mins[comp[c]] for c in comp],
    }).sort_values("conv_id").reset_index(drop=True)


def oracle_truth(turns: pa.Table, k: int, jaccard_threshold: float,
                 role_sep: str = "\x1f", turn_sep: str = "\x1e"
                 ) -> tuple[pd.DataFrame, pd.DataFrame]:
    """(true_pairs, true_clusters): pairs with exact J >= threshold, and the
    connected components they induce over ALL conv_ids."""
    pairs = exact_pairs(turns, k, role_sep, turn_sep)
    dup = pairs[pairs["jaccard"] >= jaccard_threshold].reset_index(drop=True)
    all_ids = sorted(set(pa.compute.unique(turns["conv_id"]).to_pylist()))
    clusters = cluster_pairs(dup, all_ids)
    return dup, clusters
