"""Distributed k-means (Lloyd's) over an embedding column — the
iterative-algorithm shape: per iteration, centroids are broadcast ONCE
(`ray.put`), every batch computes assignments + per-centroid partial
sums/counts vectorized (one matmul + np.add.at), and a tree AggregateFn
merge returns a (k, d+1) array to the driver, which closes the update.
Per-iteration traffic is k·(d+1) floats per block — independent of row
count; the corpus itself never moves (contrast similarity._kmeans_fit,
which trains the IVF quantizer on a driver-side SAMPLE — this operator
is the full-corpus refinement of the same seeding).

Cosine geometry (unit-normalized vectors + spherical centroid update),
matching the repo's similarity stack.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data
from ray.data.aggregate import AggregateFn

from miekki_ray.stages.similarity import _kmeans_fit, _mat, _normalize


def kmeans_fit_predict(embeddings: ray.data.Dataset, *, k: int = 16,
                       iters: int = 8, seed: int = 7,
                       init_sample: int = 4096,
                       id_col: str = "vec_id", vec_col: str = "embedding",
                       extra_cols: tuple[str, ...] = ()
                       ) -> tuple[ray.data.Dataset, np.ndarray]:
    """Returns (assignments Dataset [id_col, cluster, *extra_cols],
    centroids (k, d)). Deterministic for a fixed seed."""
    sample = embeddings.limit(init_sample).to_pandas()
    if len(sample) == 0:   # empty corpus: schema-correct empty result
        # real column types from the input schema (object-typed columns
        # would fail a later union/join against typed data); centroids are
        # (0, 0) — the embedding dim is unknowable from an empty corpus
        sch = embeddings.schema().base_schema
        empty = pa.schema(
            [(id_col, sch.field(id_col).type), ("cluster", pa.int32())]
            + [(c, sch.field(c).type) for c in extra_cols]).empty_table()
        return ray.data.from_arrow(empty), np.zeros((0, 0))
    sm = _normalize(np.stack(
        sample[vec_col].map(np.asarray).to_list()).astype(np.float64))
    cent = _kmeans_fit(sm, k, seed)  # sample-seeded start

    for _ in range(iters):
        cent_ref = ray.put(cent)

        def acc(block) -> np.ndarray:
            tbl = block if isinstance(block, pa.Table) \
                else pa.Table.from_pandas(block)
            if tbl.num_rows == 0:     # empty blocks occur after filters
                return 0.0
            m = _normalize(_mat(tbl, vec_col, dtype=np.float64))
            c = ray.get(cent_ref)
            assign = np.argmax(m @ c.T, axis=1)
            out = np.zeros((c.shape[0], c.shape[1] + 1))
            np.add.at(out[:, :-1], assign, m)
            np.add.at(out[:, -1], assign, 1.0)
            return out

        agg = AggregateFn(
            init=lambda _: 0.0,  # scalar zero broadcasts in np.add
            accumulate_block=lambda a, b: a + acc(b),
            merge=lambda a, b: a + b,
            name="kmeans_partials")
        partials = embeddings.aggregate(agg)["kmeans_partials"]
        counts = partials[:, -1]
        nz = counts > 0
        new = cent.copy()
        new[nz] = partials[nz, :-1] / counts[nz, None]
        cent = _normalize(new)

    cent_ref = ray.put(cent)

    def assign_batch(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            cols = {id_col: batch[id_col],
                    "cluster": pa.array([], type=pa.int32())}
            for e in extra_cols:
                cols[e] = batch[e]
            return pa.table(cols)
        m = _normalize(_mat(batch, vec_col, dtype=np.float64))
        c = ray.get(cent_ref)
        a = np.argmax(m @ c.T, axis=1).astype(np.int32)
        cols = {id_col: batch[id_col],
                "cluster": pa.array(a, type=pa.int32())}
        for e in extra_cols:
            cols[e] = batch[e]
        return pa.table(cols)

    out = embeddings.map_batches(assign_batch, batch_format="pyarrow")
    return out, cent
