"""Corpus curation pipeline: quality-filter → exact-dedup keep-first.

The end-to-end shape a training-data pipeline runs in front of the
near-dedup flagship (SURVEY.md §2.11): score every document with the
vectorized quality kernels (functions/textstats.py), drop documents below
declared thresholds, then keep the smallest doc_id per exact text. All
three stages are streaming map_batches / grouped exchanges:

- scoring is stateless and shuffle-free;
- the filter is applied per batch BEFORE any exchange, so low-quality
  documents never cross the wire (at 100 TB the filter typically drops
  30-60% of bytes — pruning before the shuffle is the whole point);
- keep-first makes ONE grouped exchange on hash(text) and resolves
  winners against the exact text inside each group (collision-safe).

The thresholds are part of the operator contract (stated in the paired
DuckDB oracle verbatim), and the filter compares the 6-dp ROUNDED ratio so
both engines cut on exactly the same value — an unrounded float predicate
could flip a knife-edge document between engines."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data


def quality_filter(docs: ray.data.Dataset, *, min_words: int = 40,
                   min_alpha_ratio: float = 0.8) -> ray.data.Dataset:
    """Score + threshold in one stateless pass. Emits (doc_id, text,
    n_chars, n_words, alpha_ratio) for survivors.

    NARROW kernel, not the full quality_scores: this filter runs over
    100% of input bytes BEFORE any pruning (its whole point), and it
    reads only 3 of quality_scores' 7 outputs — the stopword explode +
    groupby passes and the punct/upper regex scans it would pay for are
    pure waste on the hot path (r4 review). The three columns are
    computed with the IDENTICAL definitions (pinned equal to
    quality_scores by pytest), so the DuckDB oracle is unchanged."""
    from miekki_ray.functions.textstats import (_WORD_RE,
                                                round_half_away)
    from miekki_ray.functions.util import pa_from_pandas

    def score(batch: pd.DataFrame) -> pa.Table:
        t = batch["text"].fillna("")
        n_chars = t.str.len().to_numpy(dtype=np.int64)
        n_words = t.str.count(_WORD_RE).to_numpy(dtype=np.int64)
        n_alpha = t.str.count(r"[A-Za-z]").to_numpy(dtype=np.int64)
        alpha_ratio = round_half_away(n_alpha / np.maximum(n_chars, 1))
        out = pd.DataFrame({
            "doc_id": batch["doc_id"].to_numpy(dtype=np.int64),
            "text": batch["text"],
            "n_chars": n_chars,
            "n_words": n_words,
            "alpha_ratio": alpha_ratio,
        })
        keep = (n_words >= min_words) & (alpha_ratio >= min_alpha_ratio)
        # clean Arrow out: pandas-backed blocks defeat the downstream
        # shuffle's schema-dedup (see util.pa_from_pandas). An ALL-
        # filtered batch must keep its types: from_pandas infers
        # Arrow `null` for an empty object column, the schema-drift
        # hazard guarded elsewhere with typed empty tables.
        if not keep.any():
            return pa.schema([("doc_id", pa.int64()),
                              ("text", pa.string()),
                              ("n_chars", pa.int64()),
                              ("n_words", pa.int64()),
                              ("alpha_ratio", pa.float64())]).empty_table()
        return pa_from_pandas(out[keep])

    return docs.map_batches(score, batch_format="pandas")


def keep_first_exact(scored: ray.data.Dataset,
                     num_partitions: int = 16) -> ray.data.Dataset:
    """Exact dedup keep-first over the filtered set: one grouped exchange
    on a 64-bit text hash co-locates every copy of a text (plus any hash
    collisions), then a vectorized per-partition pass keeps the smallest
    doc_id per EXACT text — the full text is compared inside the group,
    so a hash collision can never delete a distinct document (at 10^12
    docs the birthday bound makes 64-bit collisions certain; the hash is
    a partitioner here, not an identity). Text crosses the exchange once
    — the same cost contract as the flagship's doc shuffle."""
    from miekki_ray.functions.util import pa_from_pandas, str_part

    def add_part(batch: pd.DataFrame) -> pa.Table:
        return pa_from_pandas(
            batch.assign(_p=str_part(batch["text"], num_partitions)))

    def keep_first(group: pd.DataFrame) -> pa.Table:
        g = group.sort_values("doc_id", kind="mergesort")
        return pa_from_pandas(
            g.drop_duplicates("text").drop(columns=["_p"]))

    return (scored.map_batches(add_part, batch_format="pandas")
            .groupby("_p").map_groups(keep_first, batch_format="pandas"))


def curate_documents(docs: ray.data.Dataset, *, min_words: int = 40,
                     min_alpha_ratio: float = 0.8,
                     lm_threshold: float | None = None,
                     lm_digest: str = "splitmix",
                     num_partitions: int = 16) -> ray.data.Dataset:
    """quality_filter → [LM perplexity filter] → keep_first_exact; see
    module docstring. ``lm_threshold`` (r5): when set, documents whose
    avg trigram log-prob under the corpus-sample model falls below it
    are dropped AFTER the cheap heuristics and BEFORE the keep-first
    exchange (stages/lm.lm_filter — the CCNet-style cut), so junk never
    crosses the wire. ``num_partitions`` sizes the pipeline's ONE
    grouped exchange — size it like any shuffle width (~4x the executor
    count)."""
    scored = quality_filter(docs, min_words=min_words,
                            min_alpha_ratio=min_alpha_ratio)
    if lm_threshold is not None:
        from miekki_ray.stages.lm import lm_filter
        scored = lm_filter(scored, threshold=lm_threshold,
                           digest=lm_digest,
                           num_partitions=num_partitions)
    return keep_first_exact(scored, num_partitions=num_partitions)


def _turns_to_docs(turns: ray.data.Dataset, cfg) -> ray.data.Dataset:
    """Transcript turns → the (doc_id:int64, text) shape the curation
    kernels contract on: reconstruct docs (the flagship's shuffle #1,
    stable (conv_id, turn_idx) order), then doc_id = the conv_id's
    decimal suffix. Both transcript corpora shapes are <constant
    prefix><zero-padded decimal> (synth 'c%06d', adapter '%012d'), so
    the suffix is unique and ORDER-PRESERVING — keep-first's
    smallest-doc_id winner is the smallest conv_id, matching the dedup
    flagship's min-conv_id representative, and pack_bins' range
    partitioning stays monotone in conv_id. A conv_id without a decimal
    suffix raises at the Arrow cast rather than silently mis-keying
    either tiebreak."""
    import pyarrow.compute as pc

    from miekki_ray.stages.docs import reconstruct_docs

    def as_docs(batch: pa.Table) -> pa.Table:
        digits = pc.replace_substring_regex(
            batch["conv_id"], pattern=r"^\D*", replacement="")
        return pa.table({
            "doc_id": pc.cast(digits, pa.int64()),
            "text": pc.cast(batch["doc"], pa.string()),
        })

    return reconstruct_docs(turns, cfg).map_batches(
        as_docs, batch_format="pyarrow", zero_copy_batch=True)


def run_curate(turns_path, cfg=None, out_dir: str | None = None, *,
               min_words: int = 40, min_alpha_ratio: float = 0.8,
               lm_threshold: float | None = None,
               lm_digest: str = "splitmix",
               budget: int = 512, tokenizer: str = "whitespace",
               bench_docs: str | None = None):
    """Curation as a JOB (the run_dedup twin for the pre-training data
    path): turns → docs → [decontaminate vs a benchmark corpus] →
    quality filter → exact keep-first → pack_bins. With ``out_dir`` set,
    every stage checkpoints under out_dir/<stage>/ with a lineage
    manifest (state/manifest.py) and a re-submitted job resumes past
    valid checkpoints — the 100-TB contract, where any multi-hour run
    WILL see worker loss. Returns (packed, metrics) where packed is the
    (doc_id, n_tokens, bin) dataset and metrics records ran/skipped
    stages.

    ``bench_docs``: optional parquet path of (doc_id, text) benchmark
    documents; when given, candidates sharing an 8-word-gram with any
    benchmark doc are dropped before scoring (stages/scrub.decontaminate,
    emit='clean' — the bench gram set is the bounded broadcast side)."""
    import hashlib
    import json as _json

    import ray.data as _rd

    from miekki_ray.config import DedupConfig
    from miekki_ray.sources.transcripts import read_transcripts
    from miekki_ray.stages.packing import pack_bins
    from miekki_ray.stages.scrub import decontaminate

    cfg = cfg or DedupConfig()
    turns = (turns_path if isinstance(turns_path, _rd.Dataset)
             else read_transcripts(turns_path))
    P = cfg.num_partitions

    def curated_of(docs):
        return curate_documents(docs, min_words=min_words,
                                min_alpha_ratio=min_alpha_ratio,
                                lm_threshold=lm_threshold,
                                lm_digest=lm_digest,
                                num_partitions=P)

    def packed_of(cur):
        return pack_bins(cur.select_columns(["doc_id", "text"]),
                         budget=budget, tokenizer=tokenizer,
                         num_partitions=P)

    if out_dir is None:
        docs = _turns_to_docs(turns, cfg)
        if bench_docs is not None:
            docs = decontaminate(docs, _rd.read_parquet(bench_docs),
                                 emit="clean")
        return packed_of(curated_of(docs)), {"ran": [
            "docs", *(["clean"] if bench_docs else []),
            "curated", "packed"], "skipped": []}

    from miekki_ray.state.manifest import (StageRunner, input_fingerprint,
                                           root_input_fp)

    # PER-STAGE config hashes: each stage's hash covers only the knobs
    # its OWN output depends on, so a knob sweep re-runs only the stages
    # it actually changes — at the 100-TB design point a pack-budget
    # change must not recompute the docs shuffle / decontamination /
    # quality filter whose outputs are byte-identical. Upstream knob
    # changes still invalidate downstream transitively (the upstream
    # manifest embeds its config_hash and downstream validates against
    # the upstream MANIFEST hash). Flipping decontamination on/off needs
    # no knob anywhere: it changes which DIR is "curated"'s upstream, so
    # curated's stored up_hash mismatches and it re-runs — while the
    # docs root (output identical either way) keeps its checkpoint.
    def _h(**knobs) -> str:
        blob = _json.dumps(knobs, sort_keys=True).encode()
        return hashlib.blake2b(blob, digest_size=16).hexdigest()

    dedup_h = cfg.config_hash()
    r = StageRunner(out_dir, _h(dedup_cfg=dedup_h))
    in_fp = root_input_fp(turns_path)
    docs, d_up = r.run("docs", lambda: _turns_to_docs(turns, cfg),
                       input_fp=in_fp)
    if bench_docs is not None:
        # the bench corpus is a second ROOT input: fingerprint it so a
        # swapped benchmark set invalidates the clean stage (and
        # transitively everything downstream)
        docs, d_up = r.run(
            "clean", lambda: decontaminate(
                docs, _rd.read_parquet(bench_docs), emit="clean"),
            upstream_dir=d_up, input_fp=input_fingerprint(bench_docs))
    cur, d_cur = r.run("curated", lambda: curated_of(docs),
                       upstream_dir=d_up,
                       config_hash=_h(dedup_cfg=dedup_h,
                                      min_words=min_words,
                                      min_alpha_ratio=min_alpha_ratio,
                                      lm_threshold=lm_threshold,
                                      lm_digest=lm_digest))
    packed, _ = r.run("packed", lambda: packed_of(cur),
                      upstream_dir=d_cur,
                      config_hash=_h(dedup_cfg=dedup_h, budget=budget,
                                     tokenizer=tokenizer))
    return packed, {"ran": r.ran, "skipped": r.skipped}
