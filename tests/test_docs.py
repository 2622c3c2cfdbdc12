"""O1 reconstruction: the binding per-turn text equality invariant.

[spec BASELINE.json:15]: "per-turn text equality under stable turn ordering"
— shuffle the input turn rows, reconstruct, every turn must come back
byte-equal in turn_idx order (SURVEY.md §5.1)."""

import numpy as np
import pyarrow as pa
import ray.data

from miekki_ray.stages.docs import reconstruct_docs
from miekki_ray.stages.normalize import filter_turns, normalize_turns


def test_per_turn_text_equality(small_corpus, cfg):
    turns, _ = small_corpus  # rows already deterministically shuffled
    docs = reconstruct_docs(ray.data.from_arrow(turns), cfg).to_pandas()
    # independent expectation: pandas stable sort + join
    df = turns.select(["conv_id", "turn_idx", "role", "text"]).to_pandas()
    df = df.sort_values(["conv_id", "turn_idx"], kind="mergesort")
    df["piece"] = df["role"].str[:1] + cfg.role_sep + df["text"]
    want = df.groupby("conv_id")["piece"].agg(cfg.turn_sep.join)
    got = docs.set_index("conv_id")["doc"]
    assert len(got) == len(want)
    for cid in want.index:
        assert got[cid] == want[cid], cid  # byte-exact doc ⇒ byte-exact turns


def test_reconstruction_row_order_invariance(small_corpus, cfg):
    """Keyed outputs must not depend on input row order (SURVEY.md §5.2)."""
    turns, _ = small_corpus
    perm = np.random.default_rng(1).permutation(turns.num_rows)
    shuffled = turns.take(pa.array(perm))
    d1 = reconstruct_docs(ray.data.from_arrow(turns), cfg).to_pandas()
    d2 = reconstruct_docs(ray.data.from_arrow(shuffled), cfg).to_pandas()
    d1 = d1.sort_values("conv_id").reset_index(drop=True)
    d2 = d2.sort_values("conv_id").reset_index(drop=True)
    assert d1[["conv_id", "doc", "doc_hash"]].equals(
        d2[["conv_id", "doc", "doc_hash"]])


def test_doc_hash_distinguishes(small_corpus, cfg):
    turns, planted = small_corpus
    docs = reconstruct_docs(ray.data.from_arrow(turns), cfg).to_pandas()
    by_id = docs.set_index("conv_id")["doc_hash"]
    pl = planted.to_pandas()
    for _, r in pl.iterrows():
        if r["kind"] == "exact":
            assert by_id[r["a"]] == by_id[r["b"]]
        elif r["kind"] in ("near_high", "near_border"):
            assert by_id[r["a"]] != by_id[r["b"]]


def test_normalize_preserves_text(small_corpus):
    turns, _ = small_corpus
    out = normalize_turns(ray.data.from_arrow(turns)).to_pandas()
    src = turns.to_pandas()
    # raw text byte-identical, text_norm appended
    assert "text_norm" in out.columns
    assert list(out["text"]) == list(src["text"])


def test_filter_turns_roles(small_corpus):
    turns, _ = small_corpus
    out = filter_turns(ray.data.from_arrow(turns), roles=["tool"]).to_pandas()
    assert (out["role"] == "tool").all()
    assert len(out) == (turns.to_pandas()["role"] == "tool").sum()
