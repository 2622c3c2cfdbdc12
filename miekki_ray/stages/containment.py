"""ST3 at scale — full-containment pair detection without driver
materialization (VERDICT r2 "What's wrong" #1 / Next #3).

Semantics (matches the DuckDB ``contains()`` oracle): all (a, b) id pairs
with a < b, distinct texts, where one text is a contiguous substring of
the other. At the default ``min_ratio=1.0`` the confirm kernel IS the
C-speed exact substring search (``containment_ratio``'s own fast path —
running the suffix-array LCS after a positive ``in`` would be dead code);
at ``min_ratio < 1.0`` the suffix-array LCS kernel
(functions/suffix.containment_ratio) adjudicates NEAR-containment, which
no substring search can answer. The flagship verify stage exercises the
same SA kernel on its containment-gated pairs (stages/verify.Verifier).

Candidate generation is COMPLETE by construction, split by the length of
the contained (shorter) side:

1. short side >= window + k - 1 bytes: Schleimer winnowing guarantees the
   pair shares at least one fingerprint VALUE (the contained text IS the
   shared substring), so a fingerprint-keyed groupby co-locates every
   such pair (functions/textstats.winnow_fingerprints carries the
   guarantee proof and its pytest).
2. short side < window + k - 1: below the winnowing floor. These docs are
   tiny by definition (< ~43 bytes at defaults); they are collected in
   one streaming filter pass and broadcast once (ray.put — the same
   asymmetric-small-side idiom as decontaminate), and every batch scans
   for them vectorized. The broadcast is bounded by n_short × window
   bytes; a corpus pathologically dominated by sub-window docs would need
   a dedicated short-doc index — documented assumption, metrics-visible.

At ``min_ratio < 1.0`` completeness narrows to pairs whose shared
contiguous run is itself >= the winnowing floor (the fingerprint
guarantee is about shared substrings, not about LCS fractions) — the
candidate set is unchanged, only the confirm threshold relaxes.

Skew note: a substring shared by m docs puts all m in one fingerprint
bucket (pair emission O(m²) there). Identical docs are the worst case —
they share EVERY fingerprint. This operator assumes fingerprint-bucket
sizes bounded by data (exact dedup upstream removes the identical-doc
case in the flagship); the salted/capped machinery in stages/candidates
is the answer where that assumption breaks.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data
from ray.data.aggregate import Count

from miekki_ray.functions.suffix import containment_ratio
from miekki_ray.functions.textstats import winnow_sets_from_arrow


def containment_pairs_ds(docs: ray.data.Dataset, *, id_col: str = "doc_id",
                         text_col: str = "text", k: int = 12,
                         window: int = 32, num_partitions: int = 16,
                         driver_confirm_pairs: int = 200_000,
                         min_ratio: float = 1.0
                         ) -> ray.data.Dataset:
    """docs(id, text) -> (a:int64, b:int64, contained:bool), a < b.

    Pipeline: fingerprint explode (map) -> fp groupby (shuffle #1) ->
    pair distinct (shuffle #2, keys only) -> texts joined back (hash
    join, adaptive width) -> suffix-array confirm (map). The only
    text-bearing exchange is the final confirm join; candidates cross
    the shuffles as (int64, int64) rows."""
    floor = window + k - 1

    # NULL texts carry the SQL contains() semantics (NULL -> no pair,
    # DuckDB oracle): drop them up front so both completeness legs agree.
    # Without this, the short-doc sweep silently excluded nulls (pc.less
    # over a null length filters the row) while the fingerprint leg fed
    # them to the winnow kernel as empty bytes — and a null reaching
    # _confirm crashed on len(None).
    def drop_null_text(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return batch.filter(pc.is_valid(batch[text_col]))

    proj = docs.select_columns([id_col, text_col])
    slim = proj.map_batches(drop_null_text, batch_format="pyarrow",
                            zero_copy_batch=True)

    # --- short-doc sweep (completeness leg 2): one streaming pass that
    # materializes ONLY the sub-floor rows (tiny by definition)
    def only_short(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        keep = pc.less(pc.binary_length(
            pc.cast(batch[text_col], pa.large_binary())), floor)
        return batch.filter(keep)

    short = (slim.map_batches(only_short, batch_format="pyarrow",
                              zero_copy_batch=True).to_pandas())

    # --- fingerprint explode (completeness leg 1): batch-wide winnowing
    # off the Arrow buffer (r3: the per-doc winnow_fingerprints loop paid
    # an encode + rolling-hash launch per row over the FULL corpus; the
    # batch kernel is bit-identical, pinned by tests/test_containment.py),
    # partition tag computed in the same pass
    def fp_rows(batch: pa.Table) -> pa.Table:
        empty = pa.table({id_col: pa.array([], type=pa.int64()),
                          "fp": pa.array([], type=pa.int64()),
                          "_p": pa.array([], type=pa.int32())})
        if batch.num_rows == 0:
            return empty
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        sets = winnow_sets_from_arrow(batch[text_col], k=k, window=window)
        sizes = np.array([s.size for s in sets], dtype=np.int64)
        if sizes.sum() == 0:
            return empty
        # int64 view: Ray groupby keys must not be uint64 (env note)
        fps = np.concatenate(sets).view(np.int64)
        return pa.table({
            id_col: pa.array(np.repeat(ids, sizes), type=pa.int64()),
            "fp": pa.array(fps, type=pa.int64()),
            "_p": pa.array((fps % num_partitions).astype(np.int32),
                           type=pa.int32()),
        })

    PAIRS_EMPTY = pa.table({"a": pa.array([], type=pa.int64()),
                            "b": pa.array([], type=pa.int64())})

    def emit_pairs(group: pa.Table) -> pa.Table:
        # Arrow in AND out: the downstream multi-key (a, b) groupby is a
        # sort-aggregate that runs ~15x slower over pandas-derived blocks
        # and defeats the shuffle schema-dedup fast path (measured in
        # scrub.dup_ngram_stats [env ray 2.49.2])
        if group.num_rows == 0:
            return PAIRS_EMPTY
        fps = group["fp"].to_numpy(zero_copy_only=False)
        ids = group[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((ids, fps))
        f, i = fps[order], ids[order]
        keep = np.ones(f.size, dtype=bool)          # distinct (fp, id)
        keep[1:] = (f[1:] != f[:-1]) | (i[1:] != i[:-1])
        f, i = f[keep], i[keep]
        starts = np.flatnonzero(np.r_[True, f[1:] != f[:-1]])
        ends = np.r_[starts[1:], f.size]
        out_a, out_b = [], []
        for s, e in zip(starts, ends):
            if e - s < 2:
                continue
            d = i[s:e]                              # sorted unique ids
            ii, jj = np.triu_indices(e - s, k=1)
            out_a.append(d[ii])
            out_b.append(d[jj])
        if not out_a:
            return PAIRS_EMPTY
        return pa.table({"a": pa.array(np.concatenate(out_a)),
                         "b": pa.array(np.concatenate(out_b))})

    fp_pairs = (slim.map_batches(fp_rows, batch_format="pyarrow",
                                 zero_copy_batch=True)
                .groupby("_p").map_groups(emit_pairs,
                                          batch_format="pyarrow"))

    # --- short-side candidates: broadcast the short set, scan per batch
    if len(short):
        # no fillna: drop_null_text guarantees slim (and thus short) is
        # null-free — nulls carry the SQL contains() no-pair semantics
        sref = ray.put((short[id_col].to_numpy(dtype=np.int64),
                        short[text_col].tolist()))

        def short_pairs(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc
            if batch.num_rows == 0:
                return PAIRS_EMPTY
            sids, stexts = ray.get(sref)
            ids = batch[id_col].to_numpy(
                zero_copy_only=False).astype(np.int64)
            col = batch[text_col]          # null-free by drop_null_text
            out_a, out_b = [], []
            for sid, st in zip(sids, stexts):
                hit = pc.match_substring(col, st).to_numpy(
                    zero_copy_only=False)
                hit &= ids != sid
                hi = ids[hit]
                out_a.append(np.minimum(hi, sid))
                out_b.append(np.maximum(hi, sid))
            if not out_a:
                return PAIRS_EMPTY
            return pa.table({"a": pa.array(np.concatenate(out_a)),
                             "b": pa.array(np.concatenate(out_b))})

        cand = fp_pairs.union(
            slim.map_batches(short_pairs, batch_format="pyarrow",
                             zero_copy_batch=True))
    else:
        cand = fp_pairs

    # --- distinct + text lookup + confirm, auto-switched on volume (the
    # same driver-narrow pattern as verify.verify_local: under the
    # threshold, a global (a,b) groupby plus two hash joins is pure
    # aggregator-actor startup)
    cand = cand.materialize()
    n_cand = cand.count()
    empty = pa.table({"a": pa.array([], type=pa.int64()),
                      "b": pa.array([], type=pa.int64()),
                      "contained": pa.array([], type=pa.bool_())})
    if n_cand == 0:
        return ray.data.from_arrow(empty)

    from functools import partial

    confirm = partial(_confirm, min_ratio=min_ratio)
    if n_cand <= driver_confirm_pairs:
        pdf = cand.to_pandas().drop_duplicates(["a", "b"])
        ids = pd.unique(pd.concat([pdf["a"], pdf["b"]],
                                  ignore_index=True)).astype(np.int64)
        iref = ray.put(set(ids.tolist()))

        def pick(batch: pa.Table) -> pa.Table:
            want = ray.get(iref)
            mask = np.fromiter(
                (int(x) in want for x in
                 batch[id_col].to_numpy(zero_copy_only=False)),
                dtype=bool, count=batch.num_rows)
            return batch.filter(pa.array(mask))

        need = (slim.map_batches(pick, batch_format="pyarrow",
                                 zero_copy_batch=True).to_pandas())
        tmap = dict(zip(need[id_col].to_numpy(dtype=np.int64),
                        need[text_col]))
        pdf = pdf.assign(
            _ta=[tmap[x] for x in pdf["a"].to_numpy(dtype=np.int64)],
            _tb=[tmap[x] for x in pdf["b"].to_numpy(dtype=np.int64)])
        return ray.data.from_pandas(confirm(pdf)) \
            if len(pdf) else ray.data.from_arrow(empty)

    from miekki_ray.functions.util import ensure_schema, rename
    from miekki_ray.stages.verify import join_width

    distinct = (cand.groupby(["a", "b"])
                .aggregate(Count(alias_name="_n")).drop_columns(["_n"])
                .materialize())
    n_pairs = distinct.count()
    # THE shared pairs⨝docs width policy (verify.join_width): cpu-count
    # floor cap + MIEKKI_ATTACH_WIDTH override — a hand-rolled copy here
    # is exactly the drift that policy was centralized to prevent
    P = join_width(num_partitions, n_pairs)
    # chained joins need the schema-less-empty-block guard every other
    # chained-join site applies (attach_docs, index_query): a join
    # partition that receives zero left blocks emits a block WITHOUT the
    # next join's key column [env ray 2.49.2]
    # schema off the bare projection, fetched only on THIS branch (on a
    # statically-known source it is free; on a UDF-derived `docs` lineage
    # it forces execution, which the driver-narrow path above never
    # needs) — slim's map_batches would force the same fetch anyway for
    # the join schemas below
    sch = proj.schema()   # ray Schema wrapper: .names/.types (arrow)
    ttype = dict(zip(sch.names, sch.types))[text_col]
    j1_schema = pa.schema([("a", pa.int64()), ("b", pa.int64()),
                           ("_ta", ttype)])
    j1 = ensure_schema(
        rename(distinct.join(slim, join_type="inner", num_partitions=P,
                             on=("a",), right_on=(id_col,)),
               {text_col: "_ta"}), j1_schema)
    j2 = ensure_schema(
        rename(j1.join(slim, join_type="inner", num_partitions=P,
                       on=("b",), right_on=(id_col,)),
               {text_col: "_tb"}),
        j1_schema.append(pa.field("_tb", ttype)))
    return j2.map_batches(confirm, batch_format="pandas")


def _confirm(batch: pd.DataFrame, min_ratio: float = 1.0) -> pd.DataFrame:
    """Containment confirmation — THE shared kernel of both the
    driver-narrow and distributed paths (identical output by
    construction: per-pair decisions depend only on the two texts).

    min_ratio >= 1.0 (exact containment, the ``contains()`` oracle
    semantics): the C-speed two-way substring search decides — identical
    to ``containment_ratio``'s own exact fast path, so running the LCS
    after it would be dead code. min_ratio < 1.0 (near-containment): the
    suffix-array LCS kernel (functions/suffix) is the decision."""
    keep_a, keep_b = [], []
    for a, b, ta, tb in zip(batch["a"].to_numpy(dtype=np.int64),
                            batch["b"].to_numpy(dtype=np.int64),
                            batch["_ta"], batch["_tb"]):
        if ta == tb:
            continue
        s, l = (ta, tb) if len(ta) <= len(tb) else (tb, ta)
        if min_ratio >= 1.0:
            hit = s in l
        else:
            hit = containment_ratio(s.encode(), l.encode()) >= min_ratio
        if hit:
            keep_a.append(a)
            keep_b.append(b)
    return pd.DataFrame({
        "a": pd.Series(keep_a, dtype=np.int64),
        "b": pd.Series(keep_b, dtype=np.int64),
        "contained": pd.Series([True] * len(keep_a), dtype=bool)})
