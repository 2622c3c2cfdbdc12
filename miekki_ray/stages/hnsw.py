"""HNSW graph ANN — the high-recall third option of the ANN menu
(brute-force baseline / IVF / hyperplane-LSH live in stages/similarity).

VERDICT r4 "What's missing" #3: at high recall targets an IVF-only menu
forces large nprobe (cost ~ nprobe/n_centroids of the corpus per query);
a navigable-small-world graph reaches the same recall in ~ef·M distance
evaluations per query, independent of corpus size. The algorithm is the
public Malkov & Yashunin 2016 construction (multi-layer greedy descent +
level-0 beam search), implemented from scratch in NumPy.

Scale design — shard-per-block graphs, exact k-merge:
    a single HNSW graph is a pointer-chasing structure no shuffle can
    express, so the cluster rendering is the standard sharded one (the
    same shape FAISS uses): each BLOCK of the embeddings Dataset builds
    its own graph inside one map_batches task (batch_size=None = one
    graph per block), searches every query against it, and emits its
    per-shard top-k; the driver k-merges shard results exactly. Recall
    loss happens only inside each shard's graph search — the merge is
    lossless — so per-query cost is n_shards · ef · M evaluations while
    brute force pays n. Graph build is the one-off cost per shard; on a
    real deployment the per-shard graphs would persist alongside the
    parquet (build-once, query-many), which composes with the stage
    checkpoint layer but is out of scope for the sandbox corpus sizes.

Determinism: the level draw is seeded per build call and the build order
is the block's row order, so identical blocks produce identical graphs;
ties in the beam break by id. Results can vary at the recall margin if
the READ splits blocks differently — the contract is the recall gate
(tests/test_hnsw.py), not bit-stability across block layouts.
"""

from __future__ import annotations

import heapq

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from miekki_ray.stages.similarity import (
    _det_topk_idx,
    _mat,
    _normalize,
    _rank_topk,
)


class HNSWIndex:
    """In-memory navigable-small-world graph over NORMALIZED vectors
    (similarity = dot product; higher is closer). Public algorithm
    [Malkov & Yashunin 2016]: node levels ~ floor(-ln(U)·mL) with
    mL = 1/ln(M); insert = greedy 1-NN descent through upper layers,
    then an ef_construction beam per layer from the node's level down
    to 0, connecting the top-M candidates and pruning every touched
    adjacency back to its cap (M above level 0, 2M at level 0)."""

    def __init__(self, M: int = 16, ef_construction: int = 64,
                 seed: int = 0):
        if M < 2:
            raise ValueError(f"M={M} too small: the graph needs >= 2 "
                             "links per node to stay navigable")
        self.M = M
        self.M0 = 2 * M
        self.efc = max(ef_construction, M + 1)
        self.seed = seed
        self.mL = 1.0 / np.log(M)
        self.vecs: np.ndarray | None = None
        # adjacency[level][node] -> int64 array of neighbor ids; a node
        # appears in adjacency[lev] only if its level >= lev
        self.adjacency: list[dict[int, np.ndarray]] = []
        self.entry = 0
        self.top = 0

    # ---------------------------------------------------------- build
    def build(self, vecs: np.ndarray) -> "HNSWIndex":
        n = vecs.shape[0]
        if n == 0:
            self.vecs = vecs
            return self
        self.vecs = vecs
        rng = np.random.default_rng(self.seed)
        u = rng.random(n)
        levels = np.floor(-np.log1p(-u) * self.mL).astype(np.int64)
        self.top = int(levels[0])
        self.entry = 0
        self.adjacency = [
            {0: np.empty(0, dtype=np.int64)}
            for _ in range(self.top + 1)]
        for i in range(1, n):
            self._insert(i, int(levels[i]))
        return self

    def _sims(self, ids: np.ndarray, q: np.ndarray) -> np.ndarray:
        return self.vecs[ids] @ q

    def _search_layer(self, q: np.ndarray, eps: list[int], ef: int,
                      lev: int) -> list[tuple[float, int]]:
        """Beam search at one layer: returns up to ef (sim, id) pairs,
        best-first order. Candidate heap keyed (-sim, id) so ties break
        deterministically by id."""
        adj = self.adjacency[lev]
        visited = set(eps)
        svals = self._sims(np.array(eps, dtype=np.int64), q)
        cand = [(-float(s), e) for s, e in zip(svals, eps)]
        heapq.heapify(cand)
        # result = min-heap of (sim, id), capped at ef
        result = [(float(s), e) for s, e in zip(svals, eps)]
        heapq.heapify(result)
        while len(result) > ef:
            heapq.heappop(result)
        while cand:
            negs, c = heapq.heappop(cand)
            if result and -negs < result[0][0] and len(result) >= ef:
                break                     # best candidate can't improve
            neigh = adj.get(c)
            if neigh is None or neigh.size == 0:
                continue
            new = np.array([x for x in neigh.tolist()
                            if x not in visited], dtype=np.int64)
            if new.size == 0:
                continue
            visited.update(new.tolist())
            sims = self._sims(new, q)
            for s, x in zip(sims, new.tolist()):
                s = float(s)
                if len(result) < ef or s > result[0][0]:
                    heapq.heappush(cand, (-s, x))
                    heapq.heappush(result, (s, x))
                    if len(result) > ef:
                        heapq.heappop(result)
        return sorted(result, key=lambda t: (-t[0], t[1]))

    def _insert(self, i: int, level: int) -> None:
        q = self.vecs[i]
        ep = [self.entry]
        # greedy 1-NN descent through layers above the node's level
        for lev in range(self.top, level, -1):
            best = self._search_layer(q, ep, 1, lev)
            if best:
                ep = [best[0][1]]
        # beam + connect from min(level, top) down to 0
        for lev in range(min(level, self.top), -1, -1):
            cap = self.M0 if lev == 0 else self.M
            found = self._search_layer(q, ep, self.efc, lev)
            chosen = [x for _, x in found[:self.M]]
            adj = self.adjacency[lev]
            adj[i] = np.array(chosen, dtype=np.int64)
            for c in chosen:
                cur = adj.get(c, np.empty(0, dtype=np.int64))
                merged = np.append(cur, i)
                if merged.size > cap:
                    # prune to the cap closest neighbors of c
                    sims = self._sims(merged, self.vecs[c])
                    keep = np.lexsort((merged, -sims))[:cap]
                    merged = merged[keep]
                adj[c] = merged
            ep = [x for _, x in found] or ep
        if level > self.top:
            # the new node is the sole occupant of layers top+1..level
            # and becomes the global entry point (canonical HNSW)
            for lev in range(self.top + 1, level + 1):
                self.adjacency.append({i: np.empty(0, dtype=np.int64)})
            self.top = level
            self.entry = i

    # ---------------------------------------------------------- query
    def search(self, q: np.ndarray, k: int,
               ef_search: int = 64) -> tuple[np.ndarray, np.ndarray]:
        """(ids, sims) of the top-k graph neighbors of q, best first."""
        if self.vecs is None or self.vecs.shape[0] == 0:
            return (np.empty(0, dtype=np.int64),
                    np.empty(0, dtype=np.float64))
        ep = [self.entry]
        for lev in range(self.top, 0, -1):
            best = self._search_layer(q, ep, 1, lev)
            if best:
                ep = [best[0][1]]
        found = self._search_layer(q, ep, max(ef_search, k), 0)
        ids = np.array([x for _, x in found[:k]], dtype=np.int64)
        sims = np.array([s for s, _ in found[:k]], dtype=np.float64)
        return ids, sims


def hnsw_topk(embeddings: ray.data.Dataset, queries: np.ndarray,
              k: int = 10, M: int = 16, ef_construction: int = 64,
              ef_search: int = 96, seed: int = 7,
              id_col: str = "vec_id", vec_col: str = "embedding"
              ) -> pd.DataFrame:
    """Shard-per-block HNSW top-k (module docstring has the scale
    rationale). Output contract identical to brute_force_topk /
    ivf_topk_partitioned: columns query_idx, vec_id, score, rank;
    scores rounded to 6dp, ties by id — so shard merge and the recall
    gates compare like with like."""
    qn = _normalize(np.asarray(queries, dtype=np.float64))
    qref = ray.put(qn)
    EMPTY = pa.table({"query_idx": pa.array([], type=pa.int32()),
                      id_col: pa.array([], type=pa.int64()),
                      "score": pa.array([], type=pa.float64())})

    def per_block(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return EMPTY
        q = ray.get(qref)
        m = _normalize(_mat(batch, vec_col, np.float64))
        ids = batch[id_col].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        index = HNSWIndex(M=M, ef_construction=ef_construction,
                          seed=seed).build(m)
        out_q, out_id, out_s = [], [], []
        for qi in range(q.shape[0]):
            ridx, sims = index.search(q[qi], k, ef_search)
            if ridx.size == 0:
                continue
            # re-rank the shard's candidates with the SHARED deterministic
            # (rounded score desc, id asc) order before emitting
            sel = _det_topk_idx(sims, ids[ridx], min(k, ridx.size))
            out_q.append(np.full(sel.size, qi, dtype=np.int32))
            out_id.append(ids[ridx][sel])
            out_s.append(sims[sel])
        if not out_q:
            return EMPTY
        return pa.table({
            "query_idx": pa.array(np.concatenate(out_q), type=pa.int32()),
            id_col: pa.array(np.concatenate(out_id)),
            "score": pa.array(np.concatenate(out_s), type=pa.float64()),
        })

    # batch_size=None: one graph per BLOCK — the shard unit (the default
    # 1024-row batching would build many tiny graphs per block and pay
    # the build cost without the search saving)
    parts = embeddings.map_batches(per_block, batch_format="pyarrow",
                                   zero_copy_batch=True,
                                   batch_size=None).to_pandas()
    return _rank_topk(parts, k, id_col)
