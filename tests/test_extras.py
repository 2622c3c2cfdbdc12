"""Stats, windows, multimodal plumbing, and n-gram Jaccard dedup."""

import json

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from miekki_ray.stages.multimodal import (
    FEATURE_DIM,
    decode_media,
    media_meta_stats,
    synth_media,
)
from miekki_ray.stages.ngram import ngram_jaccard, ngram_near_dup_pairs
from miekki_ray.stages.stats import (
    cluster_size_histogram,
    dedup_summary,
    top_clusters,
)
from miekki_ray.stages.windows import session_windows, tumbling_window_counts


def _clusters_ds():
    df = pd.DataFrame({
        "conv_id": [f"c{i}" for i in range(10)],
        "cluster_id": ["c0", "c0", "c0", "c3", "c3", "c5", "c6", "c7",
                       "c8", "c9"],
        "is_rep": [True, False, False, True, False, True, True, True,
                   True, True],
    })
    return ray.data.from_pandas(df)


def test_top_clusters_and_histogram():
    top = top_clusters(_clusters_ds(), k=2).to_pandas()
    assert list(top["cluster_id"]) == ["c0", "c3"]
    assert list(top["size"]) == [3, 2]
    hist = cluster_size_histogram(_clusters_ds())
    assert dict(zip(hist["size"], hist["n_clusters"])) == {1: 5, 2: 1, 3: 1}


def test_dedup_summary():
    s = dedup_summary(_clusters_ds())
    assert s.loc[0, "n_docs"] == 10
    assert s.loc[0, "n_clusters"] == 7
    assert s.loc[0, "n_removed"] == 3


def _events_ds():
    rows = []
    for uid, base in ((1, 0), (2, 10_000)):
        for i in range(5):
            rows.append({"event_id": len(rows), "user_id": uid,
                         "ts": (base + i * 10) * 1_000_000,
                         "event_type": "click", "value": 1.0})
        # second session after a large gap
        rows.append({"event_id": len(rows), "user_id": uid,
                     "ts": (base + 10_000_000) * 1_000_000,
                     "event_type": "click", "value": 2.0})
    df = pd.DataFrame(rows)
    df["ts"] = pd.to_datetime(df["ts"], unit="us")
    return ray.data.from_arrow(pa.Table.from_pandas(df, preserve_index=False))


def test_tumbling_windows():
    out = tumbling_window_counts(_events_ds(), window_s=100).to_pandas()
    assert out["n"].sum() == 12
    # the 5 dense events of user 1 land in the same 100s window
    assert out["n"].max() >= 5


def test_session_windows():
    out = session_windows(_events_ds(), gap_s=60).to_pandas()
    per_user = out.groupby("user_id").size()
    assert per_user[1] == 2 and per_user[2] == 2
    first = out[(out["user_id"] == 1)].sort_values("session_start")
    assert list(first["n_events"]) == [5, 1]
    assert list(first["sum_value"]) == [5.0, 2.0]


def test_media_decode_plumbing():
    media = ray.data.from_arrow(synth_media(40, seed=3))
    out = decode_media(media, seed=1, batch_size=8, concurrency=2)
    df = out.to_pandas()
    assert len(df) == 40
    assert df["decoded_ok"].all()
    v = np.asarray(df["feature"].iloc[0])
    assert v.shape == (FEATURE_DIM,)
    # deterministic: same payload + seed -> same feature
    df2 = decode_media(ray.data.from_arrow(synth_media(40, seed=3)),
                       seed=1, batch_size=8, concurrency=2).to_pandas()
    assert np.allclose(np.stack(df["feature"].map(np.asarray)),
                       np.stack(df2["feature"].map(np.asarray)))


def test_media_meta_stats():
    media = ray.data.from_arrow(synth_media(60, seed=4))
    stats = media_meta_stats(media).to_pandas()
    assert set(stats["kind"]) <= {"image", "audio", "video"}
    assert stats["n"].sum() == 60
    assert (stats["max_bytes"] >= stats["avg_bytes"]).all()


def test_ngram_jaccard_exact():
    a = "the quick brown fox jumps over the lazy dog"
    b = "the quick brown fox leaps over the lazy dog"
    j = ngram_jaccard(a, b, n=3)
    assert 0.0 < j < 1.0
    assert ngram_jaccard(a, a, n=3) == 1.0
    assert ngram_jaccard(a, "totally different words entirely", 3) == 0.0


def test_ngram_near_dup_pipeline(cfg):
    base = " ".join(f"word{i:03d}" for i in range(300))
    edited = base.replace("word150", "EDITED").replace("word222", "CHANGED")
    texts = {
        "d1": base,
        "d2": edited,
        "d3": " ".join(f"other{i:03d}" for i in range(300)),
    }
    from miekki_ray.functions.hashing import doc_hash
    docs = pa.table({
        "conv_id": pa.array(list(texts), type=pa.string()),
        "doc": pa.array(list(texts.values()), type=pa.large_string()),
        "doc_hash": pa.array(
            doc_hash([t.encode() for t in texts.values()]),
            type=pa.uint64()),
    })
    out = ngram_near_dup_pairs(ray.data.from_arrow(docs), cfg).to_pandas()
    found = {(a, b): v for a, b, v in zip(out["a"], out["b"],
                                          out["verified"])}
    assert found.get(("d1", "d2")) is True
    assert ("d1", "d3") not in found or not found[("d1", "d3")]


def test_ngram_null_doc_no_crash(cfg):
    """r4 review: a NULL doc (a null turn text propagates through
    pc.binary_join) must fold into the empty-doc sentinel like the
    char-shingle family — not crash re.findall."""
    base = " ".join(f"word{i:03d}" for i in range(300))
    from miekki_ray.functions.hashing import doc_hash
    docs = pa.table({
        "conv_id": pa.array(["d1", "d2", "dnull"], type=pa.string()),
        "doc": pa.array([base, base.replace("word150", "EDITED"), None],
                        type=pa.large_string()),
        "doc_hash": pa.array(
            doc_hash([base.encode(), b"edited-variant", b"null-doc"]),
            type=pa.uint64()),
    })
    out = ngram_near_dup_pairs(ray.data.from_arrow(docs), cfg).to_pandas()
    found = {(a, b): v for a, b, v in zip(out["a"], out["b"],
                                          out["verified"])}
    assert found.get(("d1", "d2")) is True
    # the null doc never pairs with real text
    assert not any("dnull" in p and found[p] for p in found
                   if p != ("d1", "d2"))


def test_hopping_windows_fanout(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from miekki_ray.stages.windows import hopping_window_counts

    ts = pa.array(np.array([0, 86_400, 200_000], dtype="int64")
                  * 1_000_000).cast(pa.timestamp("us"))
    ev = ray.data.from_arrow(pa.table({
        "event_type": pa.array(["a", "a", "a"]),
        "ts": ts,
        "value": pa.array([1.0, 2.0, 4.0]),
    }))
    out = hopping_window_counts(ev, size_s=2 * 86400, hop_s=86400) \
        .to_pandas().set_index("w").sort_index()
    # event@0 -> windows -1,0 ; event@1d -> 0,1 ; event@200ks -> 1,2
    assert out.loc[0, "n"] == 2 and out.loc[0, "sum_value"] == 3.0
    assert out.loc[1, "n"] == 2 and out.loc[1, "sum_value"] == 6.0
    assert out.loc[-1, "n"] == 1 and out.loc[2, "n"] == 1


def test_copartition_anti_join_keeps_orderless(ray_session, tmp_path):
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from miekki_ray.relational import customers_without_orders

    sf = str(tmp_path)
    pq.write_table(pa.table({
        "c_custkey": pa.array(np.arange(10, dtype=np.int64)),
        "c_name": pa.array([f"c{i}" for i in range(10)]),
    }), f"{sf}/customer.parquet")
    # customers 3, 7, 9 have no orders
    keys = [i for i in range(10) if i not in (3, 7, 9)] * 2
    pq.write_table(pa.table({
        "o_custkey": pa.array(np.array(keys, dtype=np.int64)),
    }), f"{sf}/orders.parquet")
    out = customers_without_orders(sf)
    assert list(out["c_custkey"]) == [3, 7, 9]
    assert list(out["c_name"]) == ["c3", "c7", "c9"]


def test_resize_and_frame_sample_plumbing(ray_session):
    import json

    import ray.data

    from miekki_ray.stages.multimodal import (
        resize_images,
        sample_frames,
        synth_media,
    )

    media = ray.data.from_arrow(synth_media(60, seed=3))
    resized = resize_images(media, 128, 128).to_pandas()
    assert len(resized) == 60                      # pass-through rows kept
    imgs = resized[resized["kind"] == "image"]
    assert len(imgs) > 0
    for m in imgs["meta"]:
        d = json.loads(m)
        assert (d["width"], d["height"]) == (128, 128)
    # pass-through rows keep their ORIGINAL meta string byte-exact
    # (r4 review: a json round-trip rewrote separators and nulled-in "{}")
    orig = media.to_pandas().set_index("media_id")["meta"]
    others = resized[resized["kind"] != "image"]
    for mid, m in zip(others["media_id"], others["meta"]):
        assert m == orig[mid], (mid, m, orig[mid])

    frames = sample_frames(media).to_pandas()
    vids = media.to_pandas()
    n_vid = (vids["kind"] == "video").sum()
    assert n_vid > 0
    assert set(frames["media_id"]) <= set(
        vids[vids["kind"] == "video"]["media_id"])
    assert (frames.groupby("media_id")["frame_idx"].min() == 0).all()
    # deterministic
    frames2 = sample_frames(media).to_pandas()
    assert len(frames) == len(frames2)


def _install_fake_pil(monkeypatch):
    """Minimal PIL.Image lookalike so the REAL code path executes in a
    container without Pillow (VERDICT r4 Next #4 branch-selection pin).
    open() raises on payloads starting with b'BAD' (undecodable bytes)."""
    import sys
    import types

    class FakeImg:
        format = "PNG"

        def __init__(self, data: bytes):
            self._data = data

        def convert(self, mode):
            return self

        def resize(self, wh):
            self._wh = wh
            return self

        def tobytes(self) -> bytes:
            return (self._data + b"\0" * 64)[:64]

        def save(self, buf, format=None):
            buf.write(b"ENC:" + format.encode() + b":"
                      + str(self._wh).encode() + b":" + self._data[:8])

    def fake_open(fp):
        data = fp.read()
        if data.startswith(b"BAD"):
            raise OSError("cannot identify image file")
        return FakeImg(data)

    mod_pil = types.ModuleType("PIL")
    mod_img = types.ModuleType("PIL.Image")
    mod_img.open = fake_open
    mod_pil.Image = mod_img
    monkeypatch.setitem(sys.modules, "PIL", mod_pil)
    monkeypatch.setitem(sys.modules, "PIL.Image", mod_img)


def test_media_decoder_branch_selection(monkeypatch):
    """Kernel-level (no Ray): without PIL every row takes the stub; with
    (fake) PIL importable, image rows take the real decode path, bad
    image bytes mark decoded_ok=False, and non-image rows still stub."""
    import numpy as np
    import pyarrow as pa

    from miekki_ray.stages.multimodal import FEATURE_DIM, MediaDecoder

    batch = pa.table({
        "media_id": pa.array([0, 1, 2], type=pa.int64()),
        "kind": pa.array(["image", "audio", "image"]),
        "payload": pa.array([b"goodimagebytes", b"audiobytes",
                             b"BADimagebytes"], type=pa.binary()),
        "meta": pa.array(["{}"] * 3),
    })
    # container truth: Pillow absent -> stub branch for everything
    dec_stub = MediaDecoder(seed=5)
    assert dec_stub.has_pillow is False
    out_stub = dec_stub(batch)
    assert out_stub["decoded_ok"].to_pylist() == [True, True, True]

    _install_fake_pil(monkeypatch)
    dec_real = MediaDecoder(seed=5)
    assert dec_real.has_pillow is True
    out_real = dec_real(batch)
    # image row 0: real path = normalized pixels of the fake 8x8 decode
    f0 = np.array(out_real["feature"].to_pylist()[0], dtype=np.float32)
    expect = np.zeros(FEATURE_DIM, dtype=np.float32)
    raw = (b"goodimagebytes" + b"\0" * 64)[:64]
    expect[:64] = np.frombuffer(raw, dtype=np.uint8).astype(np.float32) / 255
    assert np.allclose(f0, expect)
    # audio row 1: stub branch -> identical to the no-PIL output
    assert (out_real["feature"].to_pylist()[1]
            == out_stub["feature"].to_pylist()[1])
    # image row 2: undecodable bytes -> ok False, zero feature
    assert out_real["decoded_ok"].to_pylist() == [True, True, False]
    assert all(v == 0.0 for v in out_real["feature"].to_pylist()[2])


def test_image_resizer_branch_selection(monkeypatch):
    import json

    import pyarrow as pa

    from miekki_ray.stages.multimodal import ImageResizer

    batch = pa.table({
        "media_id": pa.array([0, 1], type=pa.int64()),
        "kind": pa.array(["image", "image"]),
        "payload": pa.array([b"goodimagebytes", b"BADbytes"],
                            type=pa.binary()),
        "meta": pa.array([json.dumps({"width": 640, "height": 480})] * 2),
    })
    rz_stub = ImageResizer(64, 64)
    assert rz_stub.has_pillow is False
    stub_out = rz_stub(batch)

    _install_fake_pil(monkeypatch)
    rz_real = ImageResizer(64, 64)
    assert rz_real.has_pillow is True
    real_out = rz_real(batch)
    # row 0: real re-encode (fake encoder prefix), meta updated
    p0 = real_out["payload"].to_pylist()[0]
    assert p0.startswith(b"ENC:PNG:(64, 64):")
    m0 = json.loads(real_out["meta"].to_pylist()[0])
    assert (m0["width"], m0["height"]) == (64, 64)
    # row 1: decode fails -> stub fallback, byte-identical to no-PIL run
    assert (real_out["payload"].to_pylist()[1]
            == stub_out["payload"].to_pylist()[1])


def test_union_by_name_schema_drift():
    """r5: union across drifted schemas — missing columns become TYPED
    nulls, column order normalizes to first-seen, and a cross-input type
    conflict raises instead of silently casting."""
    import numpy as np
    import pyarrow as pa
    import pytest
    import ray.data

    from miekki_ray.functions.util import union_by_name

    a = ray.data.from_arrow(pa.table({
        "id": pa.array([1, 2], type=pa.int64()),
        "lang": pa.array(["en", "de"]),
    }))
    b = ray.data.from_arrow(pa.table({
        "source": pa.array(["web"]),
        "id": pa.array([3], type=pa.int64()),
    }))
    u = union_by_name([a, b]).to_pandas().sort_values("id") \
        .reset_index(drop=True)
    assert list(u.columns) == ["id", "lang", "source"]   # first-seen
    assert u["id"].tolist() == [1, 2, 3]
    assert u["lang"].tolist()[:2] == ["en", "de"]
    assert u["lang"].isna().tolist() == [False, False, True]
    assert u["source"].isna().tolist() == [True, True, False]
    # single input passes through
    assert union_by_name([a]).count() == 2
    # type conflict raises loudly
    c = ray.data.from_arrow(pa.table({
        "id": pa.array(["x"], type=pa.string())}))
    with pytest.raises(ValueError, match="conflict"):
        union_by_name([a, c])
