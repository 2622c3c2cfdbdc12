"""Multimodal column plumbing — image/audio/video as opaque binary columns.

Driver mandate: "treat image/audio/video as opaque `binary` columns with
typed metadata; implement decode / feature-extract / resize / frame-sample
as actor-pool map_batches stages ... the image/audio libs aren't in this
container, so STUB the decode step ... and make the Ray-side plumbing —
schema, batch size, actor signature, output layout — real and tested."

Schema contract:
    media_id: int64, kind: string ('image'|'audio'|'video'),
    payload: binary, meta: string (JSON: {width,height}|{sample_rate,...})

The Decoder actor holds "model"/codec state per actor (here: a
deterministic fake decoder keyed by the config seed). Batches are small
because payloads are large — the batch_size knob is the memory control
(ray_guide 'Memory-aware').
"""

from __future__ import annotations

import hashlib
import json

import numpy as np
import pyarrow as pa
import ray.data

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("kind", pa.string()),
    ("payload", pa.binary()),
    ("meta", pa.string()),
])

FEATURE_DIM = 64


def _try_import_pillow():
    try:
        import PIL.Image  # noqa: F401
        return True
    except ImportError:
        return False


class MediaDecoder:
    """Actor-pool UDF: binary payload -> fixed-dim feature vector.

    Branch selection (r5, VERDICT r4 Next #4): when Pillow imports, IMAGE
    payloads take the REAL decode path — PIL open → grayscale → 8×8
    thumbnail → normalized 64-dim pixel feature — and undecodable bytes
    mark decoded_ok=False. When the import fails (this container) or for
    non-image kinds (librosa/ffmpeg stay unavailable), the decode is the
    clearly-marked deterministic fake (blake2b of payload seeds a feature
    vector). Same actor signature, schema and output layout either way —
    the branch is per-row, pinned by tests/test_extras.py with a fake PIL
    module."""

    def __init__(self, seed: int = 0):
        self.seed = seed
        self.has_pillow = _try_import_pillow()

    def _decode_stub(self, payload: bytes) -> np.ndarray:
        # signed=True: a negative seed would raise OverflowError on the
        # unsigned conversion (identical bytes for the non-negative range)
        digest = hashlib.blake2b(payload + self.seed.to_bytes(
            8, "little", signed=True), digest_size=8).digest()
        rng = np.random.default_rng(int.from_bytes(digest, "little"))
        return rng.standard_normal(FEATURE_DIM).astype(np.float32)

    def _decode_image_real(self, payload: bytes) -> np.ndarray:
        """PIL decode → L-mode 8×8 thumbnail → 64 normalized pixels.
        8·8 == FEATURE_DIM so real and stub features share one schema."""
        import io

        import PIL.Image

        img = PIL.Image.open(io.BytesIO(payload)).convert("L") \
            .resize((8, 8))
        px = np.frombuffer(img.tobytes()[:FEATURE_DIM], dtype=np.uint8)
        feat = np.zeros(FEATURE_DIM, dtype=np.float32)
        feat[:px.size] = px.astype(np.float32) / 255.0
        return feat

    def __call__(self, batch: pa.Table) -> pa.Table:
        kinds = batch["kind"].to_pylist()
        feats = np.empty((batch.num_rows, FEATURE_DIM), dtype=np.float32)
        ok = np.ones(batch.num_rows, dtype=bool)
        for i, payload in enumerate(batch["payload"].to_pylist()):
            if payload is None:
                feats[i] = 0.0
                ok[i] = False
                continue
            if self.has_pillow and kinds[i] == "image":
                try:
                    feats[i] = self._decode_image_real(payload)
                except Exception:
                    feats[i] = 0.0      # real decoder, undecodable bytes
                    ok[i] = False
                continue
            feats[i] = self._decode_stub(payload)
        feat_col = pa.FixedSizeListArray.from_arrays(
            pa.array(feats.ravel(), type=pa.float32()), FEATURE_DIM)
        return pa.table({
            "media_id": batch["media_id"],
            "kind": batch["kind"],
            "feature": feat_col,
            "decoded_ok": pa.array(ok, type=pa.bool_()),
        })


def decode_media(media: ray.data.Dataset, seed: int = 0,
                 batch_size: int = 32, concurrency: int = 4
                 ) -> ray.data.Dataset:
    """Actor-pool decode stage. batch_size is deliberately SMALL: payload
    bytes x batch_size x concurrency must fit worker heaps."""
    return media.map_batches(
        MediaDecoder,
        fn_constructor_args=(seed,),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
    )


class ImageResizer:
    """Actor-pool UDF: image rows -> resized payload + updated meta.

    Branch selection (r5, VERDICT r4 Next #4): with Pillow importable the
    image payload takes the REAL path — PIL decode → resize((w, h)) →
    re-encode in the source format — falling back to the clearly-marked
    deterministic stub (truncate/pad proportional to the target area)
    when the bytes don't decode. Without Pillow (this container) the stub
    is the whole transform. Meta rewrite, row filtering, schema and actor
    shape are identical on every branch."""

    def __init__(self, width: int, height: int):
        self.w = width
        self.h = height
        self.has_pillow = _try_import_pillow()

    def _resize_real(self, payload: bytes) -> bytes:
        import io

        import PIL.Image

        img = PIL.Image.open(io.BytesIO(payload))
        fmt = img.format or "PNG"
        buf = io.BytesIO()
        img.resize((self.w, self.h)).save(buf, format=fmt)
        return buf.getvalue()

    def _resize_stub(self, p: bytes, meta: dict) -> bytes:
        # stub transform: scale payload length by target/source area
        src_area = max(1, meta.get("width", 1) * meta.get("height", 1))
        ratio = (self.w * self.h) / src_area
        target = max(16, int(len(p) * min(ratio, 1.0)))
        return p[:target].ljust(16, b"\0")

    def __call__(self, batch: pa.Table) -> pa.Table:
        kinds = batch["kind"].to_pylist()
        raw_metas = batch["meta"].to_pylist()
        payloads = batch["payload"].to_pylist()
        out_payload, out_meta = [], []
        for kind, raw_meta, p in zip(kinds, raw_metas, payloads):
            if kind != "image" or p is None:
                # true pass-through: the ORIGINAL meta string, unchanged —
                # a json round-trip here rewrote separator bytes and
                # turned null meta into "{}" (r4 review)
                out_payload.append(p)
                out_meta.append(raw_meta)
                continue
            meta = json.loads(raw_meta) if raw_meta else {}
            if self.has_pillow:
                try:
                    out_payload.append(self._resize_real(p))
                except Exception:
                    out_payload.append(self._resize_stub(p, meta))
            else:
                out_payload.append(self._resize_stub(p, meta))
            out_meta.append(json.dumps(
                {**meta, "width": self.w, "height": self.h}))
        return pa.table({
            "media_id": batch["media_id"],
            "kind": batch["kind"],
            "payload": pa.array(out_payload, type=pa.binary()),
            "meta": pa.array(out_meta, type=pa.string()),
        })


def resize_images(media: ray.data.Dataset, width: int = 256,
                  height: int = 256, batch_size: int = 32,
                  concurrency: int = 4) -> ray.data.Dataset:
    """Actor-pool resize stage over image rows (others pass through)."""
    return media.map_batches(
        ImageResizer,
        fn_constructor_args=(width, height),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
    )


def sample_frames(media: ray.data.Dataset, every_n: int = 4,
                  max_frames: int = 8, batch_size: int = 16,
                  concurrency: int = 4) -> ray.data.Dataset:
    """Video rows fan OUT into frame rows (media_id, frame_idx, payload) —
    the flat-map shape a real ffmpeg frame sampler drops into. Stub
    'frames' are deterministic payload slices; non-video rows are dropped.
    Small batches: the fan-out multiplies payload bytes held per task."""
    def f(batch: pa.Table) -> pa.Table:
        ids = batch["media_id"].to_pylist()
        kinds = batch["kind"].to_pylist()
        payloads = batch["payload"].to_pylist()
        out_id, out_idx, out_frame = [], [], []
        for mid, kind, p in zip(ids, kinds, payloads):
            if kind != "video" or p is None:
                continue
            n_frames = min(max_frames, max(1, len(p) // (every_n * 64)))
            step = max(1, len(p) // max(n_frames, 1))
            for fi in range(n_frames):
                out_id.append(mid)
                out_idx.append(fi)
                out_frame.append(p[fi * step:(fi + 1) * step])
        return pa.table({
            "media_id": pa.array(out_id, type=pa.int64()),
            "frame_idx": pa.array(out_idx, type=pa.int32()),
            "frame": pa.array(out_frame, type=pa.binary()),
        })

    return media.map_batches(f, batch_format="pyarrow",
                             zero_copy_batch=True, batch_size=batch_size,
                             concurrency=concurrency)


def media_meta_stats(media: ray.data.Dataset) -> ray.data.Dataset:
    """Typed-metadata aggregation: parse the JSON meta column and aggregate
    payload sizes per kind."""
    from ray.data.aggregate import Count, Max, Mean

    def parse(batch: pa.Table) -> pa.Table:
        metas = [json.loads(m) if m else {} for m in
                 batch["meta"].to_pylist()]
        sizes = [len(p) if p is not None else 0
                 for p in batch["payload"].to_pylist()]
        return pa.table({
            "kind": batch["kind"],
            "payload_bytes": pa.array(sizes, type=pa.int64()),
            "width": pa.array([m.get("width") for m in metas],
                              type=pa.int64()),
        })

    return (media.map_batches(parse, batch_format="pyarrow",
                              zero_copy_batch=True)
            .groupby("kind")
            .aggregate(Count(alias_name="n"),
                       Mean("payload_bytes", alias_name="avg_bytes"),
                       Max("payload_bytes", alias_name="max_bytes")))


def synth_media(n: int, seed: int) -> pa.Table:
    """Deterministic fake media table for tests/demo (no external data)."""
    rng = np.random.default_rng(seed)
    kinds = np.array(["image", "audio", "video"])[rng.integers(0, 3, n)]
    payloads = [rng.integers(0, 256, size=int(rng.integers(256, 4096)),
                             dtype=np.uint8).tobytes() for _ in range(n)]
    metas = [json.dumps({"width": int(rng.integers(64, 1024)),
                         "height": int(rng.integers(64, 1024))})
             for _ in range(n)]
    return pa.table({
        "media_id": pa.array(np.arange(n, dtype=np.int64)),
        "kind": pa.array(kinds, type=pa.string()),
        "payload": pa.array(payloads, type=pa.binary()),
        "meta": pa.array(metas, type=pa.string()),
    })
