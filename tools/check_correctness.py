#!/usr/bin/env python
"""Local stand-in for the driver's correctness gate: runs every queries()
entry at the given sf and, where an oracle_sql() twin exists, compares
row-count + column names + order-insensitive value hash against DuckDB.

Usage: python tools/check_correctness.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def _to_pandas(obj):
    import pandas as pd
    import pyarrow as pa
    import ray.data

    if isinstance(obj, ray.data.Dataset):
        return obj.to_pandas()
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    assert isinstance(obj, pd.DataFrame), type(obj)
    return obj


def value_hash(df) -> str:
    import numpy as np
    import pandas as pd

    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if s.dtype == object:
            df[c] = s.astype(str)
        elif str(s.dtype).startswith("float"):
            df[c] = s.round(6)
    order = df.apply(lambda r: tuple(r), axis=1).sort_values().index \
        if len(df) else df.index
    df = df.loc[order].reset_index(drop=True)
    return hashlib.blake2b(
        pd.util.hash_pandas_object(df, index=False).values.tobytes(),
        digest_size=12).hexdigest()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import duckdb
    import ray

    ray.init(address="local",
             num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "8")),
             include_dashboard=False, logging_level="ERROR")
    import logging

    import ray.data
    ray.data.DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    import __ray_entry__ as E

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')")

    qs = E.queries()
    oracles = E.oracle_sql()
    if only:
        unknown = set(only) - set(qs)
        if unknown:
            # a typo'd name must not yield a green '0 failures' gate in
            # which nothing actually ran
            print(f"ERROR: unknown query name(s): {sorted(unknown)}")
            return 2
    fails = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.perf_counter()
        try:
            mine = _to_pandas(fn(sf_dir))
        except Exception as ex:
            print(f"FAIL  {name}: query raised {type(ex).__name__}: {ex}")
            fails.append(name)
            continue
        el = round(time.perf_counter() - t0, 2)
        if name not in oracles:
            print(f"ok    {name}: rows-only ({len(mine)} rows, {el}s)")
            continue
        want = con.execute(oracles[name]).fetchdf()
        status = []
        if len(mine) != len(want):
            status.append(f"rows {len(mine)} != {len(want)}")
        if sorted(mine.columns) != sorted(want.columns):
            status.append(f"cols {sorted(mine.columns)} != "
                          f"{sorted(want.columns)}")
        elif value_hash(mine) != value_hash(want):
            status.append("value-hash mismatch")
        if status:
            print(f"FAIL  {name}: {'; '.join(status)} ({el}s)")
            fails.append(name)
        else:
            print(f"OK    {name}: {len(mine)} rows match oracle ({el}s)")
    ray.shutdown()
    print(f"\n{len(fails)} failures" + (f": {fails}" if fails else ""))
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
