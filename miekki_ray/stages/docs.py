"""O1 — conversation reconstruction: turns → documents.

The spec's "stable (conv_id, turn_idx) sort-merge so per-turn text equality
holds" [spec BASELINE.json:6,15]. Idiomatic Ray Data rendering (SURVEY.md
§2.6 O1): we do NOT run a global sort. Turns are hash-partitioned by conv_id
(shuffle #1), and each partition is sorted and assembled in ONE vectorized
pass over ALL its conversations — no per-conversation Python task.

Why groupby("_part") instead of groupby("conv_id").map_groups: Ray calls the
map_groups fn once per group; at 10^9 conversations that is 10^9 Python
calls. Grouping by a coarse partition key (hash(conv_id) % P) gives P calls,
each assembling its whole partition vectorized. Same shuffle semantics
(all rows of a conv meet in one partition), ~1000x less call overhead.

Output schema: conv_id, doc (large_string), n_turns, doc_hash (uint64).
doc = role<role_sep>text joined with turn_sep in turn_idx order — raw
`text`, byte-exact (the invariant).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from miekki_ray.config import DedupConfig
from miekki_ray.functions.hashing import doc_hash


def _fnv1a_batch(ids: list[str], num_partitions: int) -> np.ndarray:
    """Deterministic FNV-1a over utf-8 bytes, vectorized over the batch by
    padding to a fixed-width uint8 matrix (conv ids are short)."""
    n = len(ids)
    enc = [s.encode("utf-8") for s in ids]
    maxw = max((len(b) for b in enc), default=1)
    mat = np.zeros((n, maxw), dtype=np.uint64)
    lens = np.empty(n, dtype=np.int64)
    for i, b in enumerate(enc):
        lens[i] = len(b)
        mat[i, :len(b)] = np.frombuffer(b, dtype=np.uint8)
    return _fnv1a_mat(mat, lens, maxw, num_partitions)


def _fnv1a_mat(mat: np.ndarray, lens: np.ndarray, maxw: int,
               num_partitions: int) -> np.ndarray:
    acc = np.full(mat.shape[0], 0xCBF29CE484222325, dtype=np.uint64)
    prime = np.uint64(0x100000001B3)
    with np.errstate(over="ignore"):
        for j in range(maxw):
            live = lens > j
            acc[live] = (acc[live] ^ mat[live, j]) * prime
    return (acc % np.uint64(num_partitions)).astype(np.int32)


def _fnv1a_from_arrow(col, num_partitions: int) -> np.ndarray:
    """Same FNV-1a partition tag computed straight off the Arrow string
    buffers (r3: this runs once per TURN — the engine's highest-volume
    kernel — and the list-of-str path boxed every conv_id). The padded
    uint8 gather is one fancy-index over the shared data buffer;
    bit-identical to _fnv1a_batch (pinned by tests/test_docs.py)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return np.empty(0, dtype=np.int32)
    off_dtype = (np.int64 if pa.types.is_large_string(col.type)
                 else np.int32)
    bufs = col.buffers()
    offs = np.frombuffer(bufs[1], dtype=off_dtype)[
        col.offset:col.offset + n + 1].astype(np.int64)
    data = (np.frombuffer(bufs[2], dtype=np.uint8)
            if bufs[2] is not None else np.empty(0, dtype=np.uint8))
    lens = np.diff(offs)
    maxw = int(lens.max()) if lens.size else 0
    starts = offs[:-1]
    # column-at-a-time: byte j of every still-live id in one gather off
    # the flat buffer (a padded 2D gather measured 7x SLOWER — it streams
    # (n × maxw) int64 temporaries through DRAM; this touches n bytes +
    # one mask per iteration, and conv ids are short so maxw is small)
    acc = np.full(n, 0xCBF29CE484222325, dtype=np.uint64)
    prime = np.uint64(0x100000001B3)
    with np.errstate(over="ignore"):
        for j in range(maxw):
            live = lens > j
            if not live.any():
                break
            acc[live] = ((acc[live] ^ data[starts[live] + j].astype(
                np.uint64)) * prime)
    return (acc % np.uint64(num_partitions)).astype(np.int32)


def _assemble(cfg: DedupConfig):
    role_sep, turn_sep, cap = cfg.role_sep, cfg.turn_sep, cfg.doc_len_cap

    normalize = cfg.normalize_docs

    empty = pa.table({
        "conv_id": pa.array([], type=pa.string()),
        "doc": pa.array([], type=pa.large_string()),
        "n_turns": pa.array([], type=pa.int32()),
        "doc_hash": pa.array([], type=pa.uint64()),
    })

    def assemble(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return empty
        t = group.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
        text_col = t["text"]
        if normalize:
            # M1 (config-gated): canonicalize ONLY the internal doc
            # representation — \r\n -> \n + NFC — so trivially-reformatted
            # conversation variants get identical doc_hash/sketch. The
            # turns table's `text` column is untouched (spec invariant).
            text_col = pc.utf8_normalize(
                pc.replace_substring(text_col, pattern="\r\n",
                                     replacement="\n"), form="NFC")
        # role is tagged by its FIRST character only (u/a/t/s...): a full
        # role word like "assistant" injects ~20 near-universal k-gram
        # windows per turn boundary, polluting every doc's shingle set with
        # shared boilerplate and inflating baseline Jaccard between
        # unrelated docs. text itself passes through byte-exact (the spec
        # invariant) — only the internal sketch representation is tagged.
        pieces = pc.binary_join_element_wise(
            pc.cast(pc.utf8_slice_codeunits(t["role"], 0, 1),
                    pa.large_string()),
            pc.cast(text_col, pa.large_string()),
            pa.scalar(role_sep, type=pa.large_string()),
        )
        if isinstance(pieces, pa.ChunkedArray):
            pieces = pieces.combine_chunks()
        ids = t["conv_id"].to_numpy(zero_copy_only=False)
        # conversation boundaries in the sorted table
        change = np.flatnonzero(
            np.concatenate(([True], ids[1:] != ids[:-1])))
        bounds = np.append(change, len(ids)).astype(np.int64)
        # per-conversation join as ONE Arrow list-join kernel (r3: the old
        # per-conv Python join + piece to_pylist measured 3.2x slower on a
        # 300k-turn partition and boxed every piece as a Python string)
        la = pa.LargeListArray.from_arrays(
            pa.array(bounds, type=pa.int64()), pieces)
        docs = pc.binary_join(la, pa.scalar(turn_sep, type=pa.large_string()))
        if isinstance(docs, pa.ChunkedArray):
            docs = docs.combine_chunks()
        out_ids = pa.array(ids[change], type=pa.string())
        n_turns = pa.array(np.diff(bounds).astype(np.int32), type=pa.int32())
        # hash straight off the Arrow data buffer — per-doc memoryviews,
        # no Python-string round trip
        offs = np.frombuffer(docs.buffers()[1], dtype=np.int64)[
            docs.offset:docs.offset + len(docs) + 1]
        mv = memoryview(docs.buffers()[2])
        lens = np.diff(offs)
        viol = np.flatnonzero(lens > cap)
        if viol.size == 0:
            dh = doc_hash([mv[offs[i]:offs[i + 1]]
                           for i in range(len(docs))])
            return pa.table({"conv_id": out_ids, "doc": docs,
                             "n_turns": n_turns,
                             "doc_hash": pa.array(dh, type=pa.uint64())})
        # §7 hard part 5 (rare path): cap very wide docs — the cap is
        # denominated in BYTES (config.py doc_len_cap: the sketcher/verify
        # memory envelope is utf-8 bytes, and a char-cap would admit ~4x
        # the budget on CJK/emoji text); back off to a codepoint boundary
        # so the doc stays valid. errors="ignore" drops only a trailing
        # partial sequence (input is re-encoded str, so nothing else can
        # be invalid). Violators are fixed individually and concatenated
        # after the vectorized majority — row order within a partition is
        # irrelevant downstream (every consumer is keyed).
        ok = np.flatnonzero(lens <= cap)
        fixed_docs: list[str] = []
        fixed_bytes: list[bytes] = []
        for i in viol:
            d = bytes(mv[offs[i]:offs[i + 1]])[:cap].decode(
                "utf-8", errors="ignore")
            fixed_docs.append(d)
            fixed_bytes.append(d.encode("utf-8"))
        ok_idx = pa.array(ok, type=pa.int64())
        viol_idx = pa.array(viol, type=pa.int64())
        tbl_ok = pa.table({
            "conv_id": out_ids.take(ok_idx),
            "doc": docs.take(ok_idx),
            "n_turns": n_turns.take(ok_idx),
            "doc_hash": pa.array(
                doc_hash([mv[offs[i]:offs[i + 1]] for i in ok]),
                type=pa.uint64()),
        })
        tbl_viol = pa.table({
            "conv_id": out_ids.take(viol_idx),
            "doc": pa.array(fixed_docs, type=pa.large_string()),
            "n_turns": n_turns.take(viol_idx),
            "doc_hash": pa.array(doc_hash(fixed_bytes), type=pa.uint64()),
        })
        return pa.concat_tables([tbl_ok, tbl_viol]).combine_chunks()

    return assemble


def reconstruct_docs(ds: ray.data.Dataset, cfg: DedupConfig) -> ray.data.Dataset:
    """turns → docs. Shuffle #1 (key: conv_id via coarse hash partition)."""
    P = cfg.num_partitions

    def add_part(batch: pa.Table) -> pa.Table:
        part = _fnv1a_from_arrow(batch["conv_id"], P)
        return batch.append_column("_part", pa.array(part, type=pa.int32()))

    parted = ds.select_columns(["conv_id", "turn_idx", "role", "text"]) \
               .map_batches(add_part, batch_format="pyarrow",
                            zero_copy_batch=True)
    return parted.groupby("_part").map_groups(
        _assemble(cfg), batch_format="pyarrow")


# NOTE (resolved r2): a fused reconstruct+sketch variant (sketching inside
# the P shuffle-reduce tasks) was measured head-to-head against the
# separate stages on the 250k-conv corpus at 32 cpus: fused 149-181 s vs
# separate 36-46 s — ~4x SLOWER. The P monolithic group tasks serialize the
# sketch compute (one single-threaded task per partition, skew-bound),
# while the separate sketch stage splits into ~250 batch tasks that
# saturate every core. The fused variant was deleted; the separate
# pipeline in pipelines/dedup.py is the measured winner.
