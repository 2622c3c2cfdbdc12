"""JSONL / CSV source round-trips preserve values and schema."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from miekki_ray.sources.text_formats import (read_csv, read_jsonl,
                                             write_csv, write_jsonl)


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
