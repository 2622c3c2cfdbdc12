"""§3.1 query-vs-index and D4 incremental-dedup pipelines."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from miekki_ray.pipelines.dedup import dedup_datasets, keep_list
from miekki_ray.pipelines.incremental import dedup_incremental
from miekki_ray.pipelines.index_query import match_query_vs_index
from miekki_ray.synth import synth_transcripts


def _subset_turns(turns: pa.Table, conv_ids: set[str]) -> pa.Table:
    mask = pa.array([c in conv_ids for c in turns["conv_id"].to_pylist()])
    return turns.filter(mask)


@pytest.fixture(scope="module")
def qvi(cfg):
    """Index = full 150-conv corpus; query = 30 of its convs (renamed) —
    every query must match its source conv."""
    turns, _ = synth_transcripts(150, 31)
    all_ids = sorted(set(turns["conv_id"].to_pylist()))
    q_ids = set(all_ids[::5])
    q_tbl = _subset_turns(turns, q_ids)
    # rename query convs so ids don't collide with the index
    import pyarrow.compute as pc
    renamed = q_tbl.set_column(
        q_tbl.schema.get_field_index("conv_id"), "conv_id",
        pc.binary_join_element_wise(
            pa.array(["Q"] * q_tbl.num_rows), q_tbl["conv_id"], ""))
    matches = match_query_vs_index(
        ray.data.from_arrow(renamed), ray.data.from_arrow(turns), cfg)
    # exact-dup representative per conv (min conv_id sharing its doc)
    from miekki_ray.oracle import reconstruct_docs_pandas
    docs = reconstruct_docs_pandas(turns)
    rep_of_doc = docs.groupby("doc")["conv_id"].min()
    rep = dict(zip(docs["conv_id"], docs["doc"].map(rep_of_doc)))
    return matches.to_pandas(), q_ids, rep


def test_query_hits_its_source(qvi):
    """Each query must match its source conv's exact-dup REPRESENTATIVE
    (the index side exact-dedups before sketching), at J = 1.0."""
    m, q_ids, rep = qvi
    verified = m[m["verified"]]
    got = {(q, i): j for q, i, j in zip(
        verified["query_id"], verified["index_id"], verified["jaccard"])}
    for qid in q_ids:
        key = (f"Q{qid}", rep[qid])
        assert key in got, (qid, rep[qid])
        assert got[key] == 1.0


def test_matches_are_cross_side_only(qvi):
    m, _, _ = qvi
    assert m["query_id"].str.startswith("Q").all()
    assert not m["index_id"].str.startswith("Q").any()


def test_index_exact_dup_members_also_matched(qvi):
    """r4 review: matches are computed over exact-dedup reps, then fanned
    back out — each query must match EVERY index doc byte-identical to
    its source, not just the representative (the all-docs oracle)."""
    m, q_ids, rep = qvi
    verified = m[m["verified"]]
    got = set(zip(verified["query_id"], verified["index_id"]))
    members_of: dict[str, list[str]] = {}
    for cid, r in rep.items():
        members_of.setdefault(r, []).append(cid)
    for qid in q_ids:
        for member in members_of[rep[qid]]:
            assert (f"Q{qid}", member) in got, (qid, member)


def test_exact_dup_expansion_both_sides(cfg):
    """Synthetic 2x2: two identical queries vs two identical index docs —
    all four member pairs must be reported (r4 review fix)."""
    text = " ".join(f"tok{i:03d}" for i in range(200))

    def turns(ids):
        return pa.table({
            "conv_id": pa.array([i for i in ids for _ in range(2)],
                                type=pa.string()),
            "turn_idx": pa.array([0, 1] * len(ids), type=pa.int32()),
            "role": pa.array(["user", "assistant"] * len(ids),
                             type=pa.string()),
            "text": pa.array([text, text + " tail"] * len(ids),
                             type=pa.string()),
            "tool": pa.array([None] * (2 * len(ids)), type=pa.string()),
            "ts": pa.array(np.full(2 * len(ids), 1_700_000_000_000_000,
                                   dtype=np.int64),
                           type=pa.timestamp("us")),
        })

    m = match_query_vs_index(
        ray.data.from_arrow(turns(["q1", "q2"])),
        ray.data.from_arrow(turns(["i1", "i2"])), cfg).to_pandas()
    got = set(zip(m[m["verified"]]["query_id"],
                  m[m["verified"]]["index_id"]))
    assert {("q1", "i1"), ("q1", "i2"),
            ("q2", "i1"), ("q2", "i2")} <= got, got


def test_incremental_attaches_to_existing(cfg):
    turns, _ = synth_transcripts(100, 77)
    base = ray.data.from_arrow(turns)
    res = dedup_datasets(base, cfg)
    kept_ids = set(keep_list(res).to_pandas()["conv_id"])
    kept_turns = ray.data.from_arrow(_subset_turns(turns, kept_ids))

    # new batch: copies of 5 kept convs (renamed) + 3 fresh convs
    import pyarrow.compute as pc
    some = sorted(kept_ids)[:5]
    new_tbl = _subset_turns(turns, set(some))
    new_tbl = new_tbl.set_column(
        new_tbl.schema.get_field_index("conv_id"), "conv_id",
        pc.binary_join_element_wise(
            pa.array(["N"] * new_tbl.num_rows), new_tbl["conv_id"], ""))
    fresh, _ = synth_transcripts(3, 123456)
    fresh_tbl = fresh.set_column(
        fresh.schema.get_field_index("conv_id"), "conv_id",
        pc.binary_join_element_wise(
            pa.array(["F"] * fresh.num_rows), fresh["conv_id"], ""))
    new_turns = ray.data.from_arrow(
        pa.concat_tables([new_tbl, fresh_tbl]))

    out = dedup_incremental(new_turns, kept_turns, cfg).to_pandas()
    by_id = out.set_index("conv_id")["cluster_id"]
    for cid in some:
        assert by_id[f"N{cid}"] == cid, (cid, by_id[f"N{cid}"])
    for f in ("Fc000000", "Fc000001", "Fc000002"):
        assert by_id[f].startswith("F"), (f, by_id[f])
