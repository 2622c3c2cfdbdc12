"""§3.1 — the reference's own shape: query-vs-index matching.

[spec BASELINE.json:2] the reference's metric is defined over
"query-vs-index test sequences": an INDEX corpus is sketched, a QUERY
corpus is sketched with the SAME config, and each query is matched against
the index via sketch intersection. The idiomatic Ray Data rendering
(SURVEY.md §3.1): both sides' band rows are unioned with a side tag, the
bucket groupby emits only CROSS-side pairs, and exact Jaccard verifies.

Output: matches (query_id, index_id, n_bands, jaccard, containment,
verified) — the graft analog of Miekki's match list.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from miekki_ray.config import DedupConfig
from miekki_ray.sources.transcripts import read_transcripts
from miekki_ray.stages.candidates import (
    hot_bucket_keys,
    salt_hot_buckets,
)
from miekki_ray.stages.docs import reconstruct_docs
from miekki_ray.stages.exact import exact_dedup
from miekki_ray.stages.sketch import band_explode, sketch_docs
from miekki_ray.stages.verify import verify_pairs

U64 = np.uint64


def _tag_side(ds: ray.data.Dataset, side: str) -> ray.data.Dataset:
    def f(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "side", pa.array([side] * batch.num_rows, type=pa.string()))

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def _emit_cross_pairs(cfg: DedupConfig):
    pair_cap = cfg.pair_cap
    prefix_cap = cfg.prefix_pair_cap

    def emit(group: pd.DataFrame) -> pd.DataFrame:
        t = group.sort_values("bucket_key", kind="mergesort")
        keys = t["bucket_key"].to_numpy(dtype=np.int64)
        ids = t["conv_id"].to_numpy(dtype=object)
        sides = t["side"].to_numpy(dtype=object)
        pband = (t["pband"].to_numpy(dtype=bool)
                 if "pband" in t.columns else np.zeros(len(t), dtype=bool))
        change = np.flatnonzero(
            np.concatenate(([True], keys[1:] != keys[:-1])))
        bounds = np.append(change, keys.size)
        out_q, out_i = [], []
        for s, e in zip(bounds[:-1], bounds[1:]):
            if e - s < 2:
                continue
            g_ids, g_sides = ids[s:e], sides[s:e]
            q_ids = np.unique(g_ids[g_sides == "q"].astype(str))
            i_ids = np.unique(g_ids[g_sides == "i"].astype(str))
            if not q_ids.size or not i_ids.size:
                continue
            # prefix-sketch mega-buckets (shared boilerplate openings) get
            # the tight prefix cap, mirroring candidates._emit_pairs_partition
            cap = prefix_cap if pband[s] else pair_cap
            n_cross = q_ids.size * i_ids.size
            if n_cross > cap:
                # sample flat indices FIRST, then divmod — materializing
                # the full cross product before capping would allocate
                # O(n_cross) arrays (GBs for a salted mega-bucket) to keep
                # only `cap` rows
                rng = np.random.default_rng(int(keys[s]) & 0x7FFFFFFF)
                pick = rng.choice(n_cross, size=cap, replace=False)
                qi, ii = np.divmod(pick, i_ids.size)
            else:
                qi = np.repeat(np.arange(q_ids.size), i_ids.size)
                ii = np.tile(np.arange(i_ids.size), q_ids.size)
            out_q.append(q_ids[qi])
            out_i.append(i_ids[ii])
        if not out_q:
            return pd.DataFrame({"a": pd.Series([], dtype=str),
                                 "b": pd.Series([], dtype=str)})
        return pd.DataFrame({"a": np.concatenate(out_q),
                             "b": np.concatenate(out_i)})

    return emit


def _expand_exact_dups(out: ray.data.Dataset,
                       dup_map: ray.data.Dataset | None, col: str,
                       cfg: DedupConfig) -> ray.data.Dataset:
    """Fan verified matches back out to exact-dup members on one side.

    ``dup_map`` rows are exact_dedup's (a=rep, b=member) edges. A match
    row whose ``col`` id is a rep is duplicated once per member with
    ``col`` rewritten — same text means the same shingle set, so every
    payload column (n_bands, jaccard, containment, verdicts) carries over
    verbatim. One coarse co-partition exchange on the rep id (the
    side-tagged union + groupby("_p") idiom); only id-width rows move.
    No-op when the side has no exact dups (the common case — one cheap
    count over the already-materialized tagged table decides)."""
    from miekki_ray.functions.util import pandas_nullable_ints, str_part
    from miekki_ray.stages.verify import VERIFIED_SCHEMA

    if dup_map is None:
        return out
    dup_map = dup_map.materialize()
    if dup_map.count() == 0:
        return out
    P = cfg.num_partitions

    def tag_match(batch: pa.Table) -> pa.Table:
        t = batch.append_column(
            "_member", pa.nulls(batch.num_rows, pa.string()))
        s = pd.Series(t[col].to_pandas(), copy=False)
        return t.append_column(
            "_p", pa.array(str_part(s, P), type=pa.int32()))

    def tag_map(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        cols = {f.name: pa.nulls(n, f.type) for f in VERIFIED_SCHEMA}
        cols[col] = batch["a"].cast(pa.string())        # rep
        cols["_member"] = batch["b"].cast(pa.string())  # member
        t = pa.table(cols)
        s = pd.Series(t[col].to_pandas(), copy=False)
        return t.append_column(
            "_p", pa.array(str_part(s, P), type=pa.int32()))

    def expand(g: pa.Table) -> pa.Table:
        # nullable-int conversion: map rows carry typed nulls in n_bands,
        # and the default pandas path would float64 the whole column
        df = pandas_nullable_ints(g)
        is_map = df["_member"].notna()
        mm = df.loc[is_map, [col, "_member"]]
        d = df.loc[~is_map].drop(columns=["_member", "_p"])
        extra = d.merge(mm, on=col, how="inner")
        extra[col] = extra["_member"]
        extra = extra.drop(columns=["_member"])
        res = pd.concat([d, extra], ignore_index=True)
        return pa.Table.from_pandas(
            res[list(VERIFIED_SCHEMA.names)], preserve_index=False) \
            .cast(VERIFIED_SCHEMA).replace_schema_metadata(None)

    mixed = (out.map_batches(tag_match, batch_format="pyarrow",
                             zero_copy_batch=True)
             .union(dup_map.map_batches(tag_map, batch_format="pyarrow",
                                        zero_copy_batch=True)))
    return mixed.groupby("_p").map_groups(expand, batch_format="pyarrow")


def match_query_vs_index(query_turns: ray.data.Dataset | None,
                         index_turns: ray.data.Dataset | None,
                         cfg: DedupConfig | None = None, *,
                         query_side: tuple | None = None,
                         index_side: tuple | None = None
                         ) -> ray.data.Dataset:
    """Sketch both corpora at the same config; return verified matches
    (a=query conv_id, b=index conv_id, n_bands, jaccard, containment,
    verified, contained).

    ``query_side`` / ``index_side``: optional prebuilt
    (unique_docs, bands) for a corpus that has ALREADY been
    reconstructed, exact-deduped and sketched — the incremental
    pipeline passes its self-dedup artifacts here instead of paying the
    dominant per-batch stages a second time (the corresponding turns
    arg is then ignored and may be None)."""
    from miekki_ray.stages.candidates import distinct_pairs
    from miekki_ray.functions.util import rename

    cfg = cfg or DedupConfig()

    def side_chain(turns, side: str, pre: tuple | None):
        if pre is not None:
            # prebuilt side: the caller owns its dup semantics (the
            # incremental pipeline resolves exact-dup members through its
            # own cluster table), so no member map to expand through
            uniq, bands = pre
            dup_map = None
        else:
            # docs stays lazy: exact_dedup materializes its own tagged
            # table internally, so a docs barrier here would only pin a
            # second full-text copy in plasma
            docs = reconstruct_docs(turns, cfg)
            uniq, ex_edges = exact_dedup(docs, cfg)
            uniq = uniq.materialize()
            bands = band_explode(sketch_docs(uniq, cfg), cfg)
            # (rep, member) exact-dup map: matches are computed over the
            # deduped reps only, so they must be fanned back out to the
            # byte-identical members afterwards (_expand_exact_dups)
            dup_map = ex_edges.select_columns(["a", "b"])
        return uniq, _tag_side(bands, side), dup_map

    q_docs, q_bands, q_map = side_chain(query_turns, "q", query_side)
    i_docs, i_bands, i_map = side_chain(index_turns, "i", index_side)
    bands = q_bands.union(i_bands).materialize()

    hot = hot_bucket_keys(bands.drop_columns(["side"]), cfg)
    salted = salt_hot_buckets(bands, hot, cfg)
    P = cfg.num_partitions
    from miekki_ray.functions.util import add_uint_part

    raw = (salted.map_batches(add_uint_part("bucket_key", P),
                              batch_format="pyarrow", zero_copy_batch=True)
           .groupby("_part")
           .map_groups(_emit_cross_pairs(cfg), batch_format="pandas"))
    pairs = distinct_pairs(raw, cfg).materialize()
    if pairs.count() == 0:
        from miekki_ray.stages.verify import empty_verified
        out = empty_verified()
    else:
        # a joins against query docs, b against index docs — THE shared
        # attach_docs plumbing (schema pin, empty-block guard, measured
        # join-width policy), not a second hand-rolled copy of it
        from miekki_ray.stages.verify import attach_docs
        j = attach_docs(pairs, q_docs, cfg, n_pairs=pairs.count(),
                        docs_b=i_docs)
        out = verify_pairs(j, cfg)
        # matches were computed over exact-dedup REPS only; fan each one
        # back out to the byte-identical members on both sides (identical
        # text ⇒ identical shingle set ⇒ the rep's jaccard/containment
        # verdict holds verbatim) — without this, a corpus with two
        # identical queries would report a match for only one of them,
        # silently diverging from the match-every-doc contract
        out = _expand_exact_dups(out, q_map, "a", cfg)
        out = _expand_exact_dups(out, i_map, "b", cfg)
    return rename(out, {"a": "query_id", "b": "index_id"})


def run_index_query(query_path: str, index_path: str,
                    cfg: DedupConfig | None = None) -> ray.data.Dataset:
    return match_query_vs_index(read_transcripts(query_path),
                                read_transcripts(index_path), cfg)
