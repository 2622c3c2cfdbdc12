"""D4 — incremental dedup: a NEW batch of conversations against an
already-deduped corpus (SURVEY.md §2.7).

Semantics: the existing corpus's keep-list is authoritative — existing
cluster representatives never change. New convs are matched query-vs-index
against the kept representatives (plus deduped among themselves); a new
conv that matches an existing representative joins that cluster; otherwise
it clusters among the new batch only.

Output: cluster assignment for the NEW convs (conv_id, cluster_id) where
cluster_id is an existing representative when matched, else a new-batch
minimum conv_id.
"""

from __future__ import annotations

import ray.data

from miekki_ray.config import DedupConfig
from miekki_ray.pipelines.dedup import dedup_datasets
from miekki_ray.pipelines.index_query import match_query_vs_index
from miekki_ray.stages.cluster import UnionFindDict


def dedup_incremental(new_turns: ray.data.Dataset,
                      kept_turns: ray.data.Dataset,
                      cfg: DedupConfig | None = None) -> ray.data.Dataset:
    """new_turns: turns of the incoming batch. kept_turns: turns of the
    existing corpus's representatives (the keep-list join of the previous
    run). Returns clusters for the new batch."""
    import pandas as pd
    import pyarrow as pa

    cfg = cfg or DedupConfig()
    # 1. dedup the new batch among itself
    res_new = dedup_datasets(new_turns, cfg)
    new_clusters = res_new.clusters.to_pandas()

    # 2. match new batch against existing representatives
    matches = match_query_vs_index(new_turns, kept_turns, cfg).to_pandas()
    dup = matches[matches["verified"] | matches["contained"]]

    # 3. merge: map each new-batch cluster onto the smallest matched
    #    existing representative of any of its members
    uf = UnionFindDict()
    for cid, cl in zip(new_clusters["conv_id"], new_clusters["cluster_id"]):
        uf.union(cid, cl)
    attach: dict[str, str] = {}
    for q, i in zip(dup["query_id"], dup["index_id"]):
        root = uf.find(q)
        if root not in attach or i < attach[root]:
            attach[root] = i
    out = new_clusters.copy()
    roots = out["conv_id"].map(uf.find)
    out["cluster_id"] = [
        attach.get(r, c) for r, c in zip(roots, out["cluster_id"])]
    out["is_new_cluster"] = ~out["cluster_id"].isin(set(attach.values()))
    return ray.data.from_pandas(out)
