"""JSONL / CSV source round-trips preserve values and schema."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from miekki_ray.sources.text_formats import (read_csv, read_ipc,
                                             read_jsonl, write_csv,
                                             write_ipc, write_jsonl)


def _tricky_df():
    return pd.DataFrame({
        "id": np.arange(6, dtype=np.int64),
        "text": ['plain', 'comma, inside', 'quote " inside',
                 'newline\ninside', 'unicode — ünïcødé',
                 'tab\tand\x1cfs'],
    })


def test_jsonl_roundtrip_exact(tmp_path):
    df = _tricky_df()
    out = str(tmp_path / "jsonl")
    write_jsonl(ray.data.from_pandas(df).repartition(2), out)
    back = read_jsonl(out).to_pandas().sort_values("id") \
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(back[["id", "text"]], df)


def test_csv_roundtrip_with_pinned_types(tmp_path):
    df = _tricky_df()
    out = str(tmp_path / "csv")
    write_csv(ray.data.from_pandas(df).repartition(2), out)
    back = read_csv(out, column_types={"id": pa.int64(),
                                       "text": pa.string()})
    tbl = back.to_pandas().sort_values("id").reset_index(drop=True)
    assert tbl["id"].dtype == np.int64
    pd.testing.assert_frame_equal(tbl[["id", "text"]], df)


def test_csv_type_pinning_prevents_drift(tmp_path):
    # a column whose first file looks integral but second file is float:
    # unpinned per-file inference would produce int64 vs double blocks
    a = pd.DataFrame({"k": [1, 2], "v": [1.0, 2.0]})
    b = pd.DataFrame({"k": [3, 4], "v": [2.5, 3.5]})
    out = tmp_path / "csv2"
    out.mkdir()
    a.to_csv(out / "a.csv", index=False)
    b.to_csv(out / "b.csv", index=False)
    ds = read_csv(str(out), column_types={"k": pa.int64(),
                                          "v": pa.float64()})
    got = ds.to_pandas().sort_values("k").reset_index(drop=True)
    assert got["v"].dtype == np.float64
    assert got["v"].tolist() == [1.0, 2.0, 2.5, 3.5]


def test_ipc_round_trip_manifest_last(tmp_path):
    # manifest-last sink: a re-run publishes a fresh manifest; read_ipc
    # reads ONLY manifested files, so earlier runs' parts are ignored
    # (exactly-once resume) and the read side is byte-lossless
    import pandas as pd
    import ray.data

    from miekki_ray.sources.text_formats import read_ipc, write_ipc

    df = pd.DataFrame({
        "doc_id": pd.array([1, 2, 3, 4], dtype="int64"),
        "text": ["alpha", "béta 🎉", "", "tab\tand\nnewline"],
        "score": pd.array([0.5, None, 2.25, -1.0], dtype="float64"),
    })
    out = str(tmp_path / "ipc")
    m1 = write_ipc(ray.data.from_pandas(df), out)
    m2 = write_ipc(ray.data.from_pandas(df), out)   # re-run: new manifest
    assert m1["rows"].sum() == m2["rows"].sum() == 4
    got = (read_ipc(out).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, df)          # ONE copy, not two


def test_ipc_identical_blocks_not_collapsed(tmp_path):
    # two byte-identical BLOCKS (dedup corpora contain these) must both
    # survive the round-trip — a content-addressed name would silently
    # collapse them
    import pandas as pd
    import ray.data

    from miekki_ray.sources.text_formats import read_ipc, write_ipc

    df = pd.DataFrame({"doc_id": pd.array([7, 8], dtype="int64"),
                       "text": ["same", "rows"]})
    ds = ray.data.from_pandas([df.copy(), df.copy()])   # 2 equal blocks
    out = str(tmp_path / "ipc_dup")
    m = write_ipc(ds, out)
    assert m["rows"].sum() == 4 and len(m) == 2
    assert read_ipc(out).count() == 4


def test_ipc_empty_block_round_trips_schema(tmp_path):
    # a 0-row Arrow input block keeps its columns through the sink: the
    # part file's IPC footer carries the schema, and read_ipc hands back
    # a schema-ful empty dataset (via the driver-side footer probe —
    # Ray itself reports schema()=None for all-empty executor output)
    import pyarrow as pa
    import ray.data

    from miekki_ray.sources.text_formats import read_ipc, write_ipc

    t = pa.table({"doc_id": pa.array([], type=pa.int64()),
                  "text": pa.array([], type=pa.string())})
    ds = ray.data.from_arrow(t)
    out = str(tmp_path / "ipc_empty")
    m = write_ipc(ds, out)
    assert list(m.columns) == ["path", "rows"]
    assert int(m["rows"].sum()) == 0 and len(m) == 1
    got = read_ipc(out)
    assert got.count() == 0
    sch = got.schema()
    assert set(sch.names) == {"doc_id", "text"}


def test_ipc_fully_filtered_input_no_crash(tmp_path):
    # ADVICE r3: a fully-filtered corpus is a legitimate sink input —
    # write_ipc must publish a valid manifest (no KeyError) and read_ipc
    # must return an empty dataset. Ray drops fn-filtered empty blocks
    # AND erases the pipeline schema (ds.schema(fetch_if_missing=True)
    # is None — verified on 2.49.2), so schema preservation is
    # impossible here by construction; no-crash + 0 rows is the contract.
    import pandas as pd
    import ray.data

    from miekki_ray.sources.text_formats import read_ipc, write_ipc

    df = pd.DataFrame({"doc_id": pd.array([1, 2], dtype="int64"),
                       "text": ["a", "b"]})
    ds = ray.data.from_pandas(df).filter(lambda r: False)
    out = str(tmp_path / "ipc_filtered")
    m = write_ipc(ds, out)
    assert list(m.columns) == ["path", "rows"]
    assert int(m["rows"].sum()) == 0
    assert read_ipc(out).count() == 0


def test_ipc_zero_block_input(tmp_path):
    # the degenerate zero-BLOCK input (schema genuinely unknowable):
    # manifest publishes with zero files; read_ipc returns an empty
    # zero-column dataset instead of crashing read_binary_files
    import pyarrow as pa
    import ray.data

    from miekki_ray.sources.text_formats import read_ipc, write_ipc

    ds = ray.data.from_arrow(pa.table({}))
    out = str(tmp_path / "ipc_zero")
    m = write_ipc(ds, out)
    assert len(m) == 0
    assert read_ipc(out).count() == 0


def test_jsonl_csv_rerun_idempotent(tmp_path):
    """r4 review: Ray's write_* APPENDS uuid files to an existing dir —
    a crashed-then-retried sink write must not duplicate rows on read."""
    df = pd.DataFrame({"id": np.arange(10, dtype=np.int64),
                       "text": [f"t{i}" for i in range(10)]})
    out = str(tmp_path / "jsonl")
    write_jsonl(ray.data.from_pandas(df).repartition(2), out)
    write_jsonl(ray.data.from_pandas(df).repartition(2), out)  # retry
    assert len(read_jsonl(out).to_pandas()) == 10
    outc = str(tmp_path / "csv")
    write_csv(ray.data.from_pandas(df).repartition(2), outc)
    write_csv(ray.data.from_pandas(df).repartition(2), outc)
    assert len(read_csv(outc, {"id": pa.int64(),
                               "text": pa.string()}).to_pandas()) == 10


def test_ipc_one_file_per_block(tmp_path):
    """r4 review: the documented layout is one .arrow file per BLOCK —
    the default 1024-row map_batches batching would shard a 3-block
    dataset into dozens of tiny files."""
    df = pd.DataFrame({"id": np.arange(9000, dtype=np.int64)})
    out = str(tmp_path / "ipc")
    manifest = write_ipc(ray.data.from_pandas(df).repartition(3), out)
    assert len(manifest) == 3, manifest
    assert read_ipc(out).count() == 9000


def test_sink_refuses_unrelated_dir(tmp_path):
    """ADVICE r4: a mistyped out_dir pointing at data this sink did not
    write must raise, not be wiped."""
    import os

    import pytest

    d = tmp_path / "precious"
    d.mkdir()
    (d / "data.txt").write_text("keep me")
    with pytest.raises(ValueError):
        write_jsonl(ray.data.from_pandas(_tricky_df()), str(d))
    assert (d / "data.txt").read_text() == "keep me"
    # no temp siblings left behind by the refused attempt
    assert not [p for p in os.listdir(tmp_path)
                if ".tmp-" in p or ".old-" in p]


def test_sink_replace_is_swap_not_delete_first(tmp_path):
    """ADVICE r4: replace must go through a temp sibling + rename so the
    previous output is never destroyed before the new one exists; marker
    makes the rewrite legal and no tmp/old residue survives."""
    import os

    out = str(tmp_path / "j")
    ds = ray.data.from_pandas(_tricky_df())
    write_jsonl(ds, out)
    write_jsonl(ds, out)                 # marker present -> replace allowed
    assert len(read_jsonl(out).to_pandas()) == 6   # replaced, not appended
    assert not [p for p in os.listdir(tmp_path)
                if ".tmp-" in p or ".old-" in p]


def test_sink_residue_from_prior_crash_is_cleared(tmp_path):
    """r5 review: a crash between write and swap leaves <out>.tmp-* /
    <out>.old-* siblings; the next run must clear them, not leak
    full-size output copies indefinitely."""
    import os

    out = str(tmp_path / "j")
    ds = ray.data.from_pandas(_tricky_df())
    write_jsonl(ds, out)
    # simulate prior-crash residue
    os.makedirs(out + ".tmp-deadbeef")
    (tmp_path / "j.tmp-deadbeef" / "x.json").write_text("{}")
    os.makedirs(out + ".old-cafe")
    write_jsonl(ds, out)
    assert not [p for p in os.listdir(tmp_path)
                if ".tmp-" in p or ".old-" in p]
    assert len(read_jsonl(out).to_pandas()) == 6


def test_reader_accepts_extensionless_external_csv(tmp_path):
    """r5 review: read_csv must not regress to an extension allowlist —
    external extensionless (Spark-style) part files read in full (Ray's
    read_csv default accepts any name), while a marker-bearing SINK dir
    skips exactly the marker, by name."""
    import pyarrow as pa

    d = tmp_path / "external"
    d.mkdir()
    (d / "part-00000").write_text("id,v\n1,a\n2,b\n")
    (d / "part-00001").write_text("id,v\n3,c\n")
    got = read_csv(str(d), column_types={"id": pa.int64(),
                                         "v": pa.string()})
    assert len(got.to_pandas()) == 3


def test_sink_file_uri_roundtrip(tmp_path):
    """r5 review: URI out_dirs go through the pyarrow.fs delete-then-
    write branch (r4 behavior restored) — pinned with file:// which
    resolves to the local filesystem."""
    out = tmp_path / "uri_out"
    uri = out.as_uri()
    ds = ray.data.from_pandas(_tricky_df())
    write_jsonl(ds, uri)
    write_jsonl(ds, uri)                   # re-run replaces, not appends
    assert len(read_jsonl(str(out)).to_pandas()) == 6


def test_sink_parked_copy_survives_failed_rewrite(tmp_path):
    """r5 review: prior-crash residue (possibly the ONLY complete copy)
    must survive until the NEW output is published — a failing write
    must not sweep it first."""
    import os

    import pytest

    from miekki_ray.sources.text_formats import replace_dir_write

    parked = tmp_path / "j.old-deadbeef"
    parked.mkdir()
    (parked / "only_copy.json").write_text('{"id": 1}\n')

    def failing_write(p):
        os.makedirs(p)
        raise RuntimeError("simulated mid-write crash")

    with pytest.raises(RuntimeError):
        replace_dir_write(str(tmp_path / "j"), failing_write)
    assert (parked / "only_copy.json").exists()   # still recoverable
