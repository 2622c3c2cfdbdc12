"""ST4 — union-find connected-component clustering.

[spec BASELINE.json:6]: "union-find connected-component clustering ...
matching the reference's cluster assignments". Cluster id = MIN conv_id in
the component, making output deterministic and keyed (SURVEY.md §4.2).

Two interchangeable implementations behind one interface (SURVEY.md §4.3):

- ``cluster_edges_driver``: edges collected to the driver, array union-find
  with path compression. Correct up to ~10^7 edges — edge volume is tiny
  relative to the corpus (only verified duplicates).
- ``cluster_edges_distributed``: iterative hash-min label propagation as
  repeated groupby-min shuffles (Kiveris et al. 2014 [public]) — the
  10^12-turn scale path; O(log diameter) rounds, and dup-cluster diameters
  are small in practice. Tests assert both yield identical assignments.

The final assignment maps EVERY doc: docs not in any edge are their own
singleton cluster. The component map (only docs that appear in edges) is
broadcast via ray.put — it is orders of magnitude smaller than the corpus —
and applied in a map_batches (broadcast join idiom J3, SURVEY.md §2.4).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from miekki_ray.config import DedupConfig


def _unionfind_pandas(edges: pd.DataFrame) -> dict[str, str]:
    """conv_id -> cluster_id (= component-min conv_id) for ids in edges."""
    ids = pd.unique(pd.concat([edges["a"], edges["b"]], ignore_index=True))
    ids = np.sort(ids.astype(str))
    index = {c: i for i, c in enumerate(ids)}
    parent = np.arange(ids.size, dtype=np.int64)

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    ai = edges["a"].map(index).to_numpy()
    bi = edges["b"].map(index).to_numpy()
    for x, y in zip(ai, bi):
        rx, ry = find(x), find(y)
        if rx != ry:
            # ids sorted => smaller index == smaller conv_id: keep min as root
            lo, hi = (rx, ry) if rx < ry else (ry, rx)
            parent[hi] = lo
    roots = np.array([find(i) for i in range(ids.size)])
    return {ids[i]: ids[roots[i]] for i in range(ids.size)}


def cluster_edges_driver(edges: ray.data.Dataset) -> dict[str, str]:
    df = edges.select_columns(["a", "b"]).to_pandas()
    if len(df) == 0:
        return {}
    return _unionfind_pandas(df)


def _label_fingerprint(labels: ray.data.Dataset) -> int:
    """Order-invariant content fingerprint: sum mod 2^64 of per-row hashes
    of (node, label). One tiny aggregate, no shuffle."""
    def partial(batch: pa.Table) -> pa.Table:
        s = pd.util.hash_pandas_object(
            pd.Series(batch["node"].to_pylist()).astype(str) + "\x00"
            + pd.Series(batch["label"].to_pylist()).astype(str),
            index=False).to_numpy(dtype=np.uint64)
        with np.errstate(over="ignore"):
            acc = np.uint64(s.sum())
        return pa.table({"fp": pa.array([int(acc)], type=pa.uint64())})

    parts = labels.map_batches(partial, batch_format="pyarrow").take_all()
    return sum(int(r["fp"]) for r in parts) % (1 << 64)


def _pointer_jump(labels: ray.data.Dataset, P: int) -> ray.data.Dataset:
    """One pointer-jumping pass: label(v) <- label(label(v)).

    Labels are monotone non-increasing node ids within v's component, and
    every label value is itself a node with a label row, so the composed
    label is still in-component and <= the current one. Combined with the
    one-hop edge propagation this halves remaining path lengths each round
    (O(log diameter) rounds instead of O(diameter)).

    Rendered as ONE hash-partition shuffle over the (node, label) table:
    entry rows keyed by node meet request rows keyed by label value."""
    from miekki_ray.functions.util import add_str_part

    def tag(batch: pa.Table) -> pa.Table:
        node = batch["node"].to_pandas().astype(str)
        lab = batch["label"].to_pandas().astype(str)
        key = pd.concat([node, lab], ignore_index=True)
        val = pd.concat([lab, node], ignore_index=True)
        is_req = np.concatenate([np.zeros(len(node), dtype=bool),
                                 np.ones(len(node), dtype=bool)])
        return pa.table({
            "key": pa.array(key.to_numpy(), type=pa.string()),
            "val": pa.array(val.to_numpy(), type=pa.string()),
            "is_req": pa.array(is_req),
        })

    def resolve(group: pd.DataFrame) -> pa.Table:
        ent = group[~group["is_req"]]
        m = pd.Series(ent["val"].to_numpy(), index=ent["key"].to_numpy())
        m = m[~m.index.duplicated()]
        req = group[group["is_req"]]
        newlab = req["key"].map(m).fillna(req["key"])
        return pa.table({
            "node": pa.array(req["val"].to_numpy().astype(str),
                             type=pa.string()),
            "label": pa.array(newlab.to_numpy().astype(str),
                              type=pa.string()),
        })

    return (labels.map_batches(tag, batch_format="pyarrow")
            .map_batches(add_str_part("key", P), batch_format="pandas")
            .groupby("_part").map_groups(resolve, batch_format="pandas"))


def cluster_labels_distributed(edges: ray.data.Dataset, cfg: DedupConfig,
                               max_rounds: int = 64
                               ) -> ray.data.Dataset | None:
    """Hash-min label propagation entirely in Ray Data groupby-min shuffles.

    labels(v) starts as min(v, neighbors); each round (a) propagates the
    min label across edges and (b) pointer-jumps label(v) <- label(label(v)),
    so convergence takes O(log diameter) rounds. Returns a (node, label)
    Dataset for the ids appearing in edges (None when there are no edges) —
    the 100-TB-scale path: labels never land on the driver; downstream
    assignment is ``assign_clusters_ds``.

    The per-round state is a (node, label) Dataset — never the corpus — so
    this scales with the number of DUPLICATE docs, not corpus size. The
    fixpoint check is a streaming fingerprint of the label table (no extra
    shuffle). Raises RuntimeError instead of silently returning split
    components if max_rounds is ever hit (would need diameter > 2^rounds).
    """

    from miekki_ray.functions.util import add_str_part

    P = cfg.num_partitions
    e = edges.select_columns(["a", "b"]).materialize()
    if e.count() == 0:
        return None

    # symmetric edge list (node, other, is_label=False) — static per run
    def seed(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({
                "node": pa.array([], type=pa.string()),
                "other": pa.array([], type=pa.string()),
                "is_label": pa.array([], type=pa.bool_()),
            })

        def _chunks(c):
            return list(c.chunks) if isinstance(c, pa.ChunkedArray) else [c]

        ca, cb = _chunks(batch["a"]), _chunks(batch["b"])
        node = pa.chunked_array(ca + cb).combine_chunks()
        other = pa.chunked_array(cb + ca).combine_chunks()
        return pa.table({
            "node": node,
            "other": other,
            "is_label": pa.array(np.zeros(len(node), dtype=bool)),
        })

    edges_sym = e.map_batches(seed, batch_format="pyarrow").materialize()

    def init_labels(batch: pa.Table) -> pa.Table:
        return pa.table({
            "node": batch["node"],
            "label": batch["node"],     # label := self
        })

    # exactly one row per node after the first aggregate below
    labels = edges_sym.map_batches(init_labels, batch_format="pyarrow")

    def as_label_rows(batch: pa.Table) -> pa.Table:
        return pa.table({
            "node": batch["node"],
            "other": batch["label"],
            "is_label": pa.array(np.ones(batch.num_rows, dtype=bool)),
        })

    def propagate(group: pd.DataFrame) -> pa.Table:
        """One hash-min step over a partition: per node, current label =
        min over its label rows; re-emit (node,label) + (peer,label)."""
        lab = (group[group["is_label"]].groupby("node")["other"].min())
        ed = group[~group["is_label"]]
        peer_lab = ed["node"].map(lab)
        out_node = pd.concat(
            [lab.index.to_series(), ed["other"]], ignore_index=True)
        out_label = pd.concat(
            [lab.reset_index(drop=True), peer_lab.reset_index(drop=True)],
            ignore_index=True)
        return pa.table({
            "node": pa.array(out_node.astype(str).to_numpy(),
                             type=pa.string()),
            "other": pa.array(out_label.astype(str).to_numpy(),
                              type=pa.string()),
        })

    def part_min(group: pd.DataFrame) -> pa.Table:
        # per-node min inside a coarse partition: every row for a node
        # lands in ONE _part (deterministic str_part), so the pandas
        # C-speed groupby IS the global reduce — never a fine-grained
        # Ray groupby("node").aggregate(Min) at node cardinality, the
        # per-GROUP-overhead shape measured 177x slower in
        # candidates.bucket_sizes (390 s -> 2.2 s on 8.5M rows)
        m = group.groupby("node", sort=False)["other"].min()
        return pa.table({
            "node": pa.array(m.index.to_numpy().astype(str),
                             type=pa.string()),
            "label": pa.array(m.to_numpy().astype(str),
                              type=pa.string()),
        })

    fp_prev = None
    for _ in range(max_rounds):
        mixed = edges_sym.union(
            labels.map_batches(as_label_rows, batch_format="pyarrow"))
        cand = (mixed.map_batches(add_str_part("node", P),
                                  batch_format="pandas")
                .groupby("_part")
                .map_groups(propagate, batch_format="pandas"))
        # the per-node min IS the next round's label set (one shuffle,
        # reused — not computed once for a fingerprint and thrown away)
        labels = (cand.map_batches(add_str_part("node", P),
                                   batch_format="pandas")
                  .groupby("_part")
                  .map_groups(part_min, batch_format="pandas"))
        labels = _pointer_jump(labels, P).materialize()
        fp = _label_fingerprint(labels)
        if fp == fp_prev:
            return labels
        fp_prev = fp
    raise RuntimeError(
        f"cluster_labels_distributed did not converge in {max_rounds} "
        "rounds — component diameter would have to exceed 2^rounds; "
        "raise max_rounds (silent non-convergence would split clusters)")


def cluster_edges_distributed(edges: ray.data.Dataset, cfg: DedupConfig,
                              max_rounds: int = 50) -> dict[str, str]:
    """Driver-dict rendering of ``cluster_labels_distributed`` (same
    assignments as ``cluster_edges_driver`` — tests assert agreement)."""
    labels = cluster_labels_distributed(edges, cfg, max_rounds)
    if labels is None:
        return {}
    out = labels.to_pandas()
    return dict(zip(out["node"].astype(str), out["label"].astype(str)))


def assign_clusters(docs: ray.data.Dataset, comp_map: dict[str, str]
                    ) -> ray.data.Dataset:
    """Broadcast the (small) component map; every doc gets cluster_id =
    map.get(conv_id, conv_id). Output: conv_id, cluster_id, is_rep."""
    ref = ray.put(comp_map)

    def f(batch: pa.Table) -> pa.Table:
        m = ray.get(ref)
        ids = pd.Series(batch["conv_id"].to_pandas(), copy=False).astype(str)
        # vectorized dict lookup: Series.map hits the hash table at C speed;
        # unmapped ids (singletons) fall back to themselves
        cl = ids.map(m)
        cl = cl.fillna(ids)
        return pa.table({
            "conv_id": pa.array(ids.to_numpy(), type=pa.string()),
            "cluster_id": pa.array(cl.to_numpy(), type=pa.string()),
            "is_rep": pa.array((ids == cl).to_numpy(), type=pa.bool_()),
        })

    return docs.select_columns(["conv_id"]).map_batches(
        f, batch_format="pyarrow", zero_copy_batch=True)


def assign_clusters_ds(docs: ray.data.Dataset,
                       labels: ray.data.Dataset | None,
                       cfg: DedupConfig) -> ray.data.Dataset:
    """Broadcast-free cluster assignment for when the component map is too
    big to ray.put (dup-heavy corpora at 10^12-turn scale): corpus conv_ids
    and the (node, label) table are co-partitioned by hash(id) and merged
    per partition with one vectorized Series.map — id-width rows only, no
    joins (Dataset.join is fragile on this Ray version), no driver state.

    Output is identical to ``assign_clusters`` (tests assert it)."""
    ids = docs.select_columns(["conv_id"])
    if labels is None:
        return ids.map_batches(
            lambda b: pa.table({
                "conv_id": b["conv_id"],
                "cluster_id": b["conv_id"],
                "is_rep": pa.array(np.ones(b.num_rows, dtype=bool)),
            }), batch_format="pyarrow", zero_copy_batch=True)
    P = cfg.num_partitions

    # both sides tag with THE shared string-partition convention
    # (util.str_part) — a drift between these two would land docs and
    # labels in different partitions and silently mis-assign clusters
    from miekki_ray.functions.util import str_part

    def tag_docs(batch: pa.Table) -> pa.Table:
        s = pd.Series(batch["conv_id"].to_pandas(), copy=False).astype(str)
        return pa.table({
            "node": pa.array(s.to_numpy(), type=pa.string()),
            "label": pa.array([None] * batch.num_rows, type=pa.string()),
            "is_doc": pa.array(np.ones(batch.num_rows, dtype=bool)),
            "_part": pa.array(str_part(s, P), type=pa.int32()),
        })

    def tag_labels(batch: pa.Table) -> pa.Table:
        s = pd.Series(batch["node"].to_pandas(), copy=False).astype(str)
        return pa.table({
            "node": pa.array(s.to_numpy(), type=pa.string()),
            "label": pa.array(
                pd.Series(batch["label"].to_pandas()).astype(str).to_numpy(),
                type=pa.string()),
            "is_doc": pa.array(np.zeros(batch.num_rows, dtype=bool)),
            "_part": pa.array(str_part(s, P), type=pa.int32()),
        })

    mixed = ids.map_batches(tag_docs, batch_format="pyarrow",
                            zero_copy_batch=True).union(
        labels.map_batches(tag_labels, batch_format="pyarrow"))

    def merge(group: pd.DataFrame) -> pa.Table:
        lab = group[~group["is_doc"]]
        m = pd.Series(lab["label"].to_numpy(),
                      index=lab["node"].to_numpy())
        d = group[group["is_doc"]]["node"].astype(str)
        cl = d.map(m).fillna(d)
        return pa.table({
            "conv_id": pa.array(d.to_numpy().astype(str),
                                type=pa.string()),
            "cluster_id": pa.array(cl.to_numpy().astype(str),
                                   type=pa.string()),
            "is_rep": pa.array(d.to_numpy() == cl.to_numpy()),
        })

    return mixed.groupby("_part").map_groups(merge, batch_format="pandas")
