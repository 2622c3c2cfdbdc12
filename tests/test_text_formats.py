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
