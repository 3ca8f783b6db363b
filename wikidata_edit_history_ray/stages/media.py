"""Multimodal column stages: opaque binary payloads + typed metadata.

Image/audio/video payloads are opaque `binary` columns. Decode / resize /
feature-extract run as actor-pool map_batches stages with SMALL batch sizes
(large payloads x batch x concurrency must fit worker heaps). The actual codec
libraries are not in this container, so the decode kernel is stubbed: real Ray
plumbing (schema, batch sizing, actor signature, output layout), deterministic
fake decode — swap `_decode_image_real` in when PIL/libav are present.
"""
from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema([
    ("media_ref", pa.string()),
    ("media_type", pa.string()),     # image | audio | video
    ("payload", pa.binary()),
    ("width", pa.int32()),
    ("height", pa.int32()),
    ("duration_ms", pa.int32()),
])


def _decode_image_real(payload: bytes) -> np.ndarray:
    """Real decode seam: PIL when present (tests/test_media.py proves the
    stub->real swap wherever PIL exists, skip-marked here), a clear
    NotImplementedError when the container lacks codecs."""
    try:
        import io

        from PIL import Image
    except ImportError as e:
        raise NotImplementedError(
            "image decode requires PIL (not in this container); "
            "deterministic fake used instead — pass fake=True") from e
    img = Image.open(io.BytesIO(payload)).convert("RGB")
    return np.asarray(img, dtype=np.uint8)


def _decode_image_fake(payload: bytes, h: int = 32, w: int = 32) -> np.ndarray:
    """Deterministic pixels from the payload hash — stable across runs, so the
    downstream plumbing (shapes, dtypes, feature vectors) is real and testable."""
    seed = int.from_bytes(hashlib.sha1(payload or b"").digest()[:4], "little")
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)


class MediaFeatureStage:
    """Actor stage: decode each payload, emit a small feature vector + shape
    metadata. Keep batch_size small (payloads are large)."""

    def __init__(self, fake: bool = True, feature_dim: int = 16):
        self.decode = _decode_image_fake if fake else _decode_image_real
        self.feature_dim = feature_dim

    def _features(self, img: np.ndarray) -> np.ndarray:
        # channel means/stds + a coarse luminance histogram
        means = img.mean(axis=(0, 1)) / 255.0
        stds = img.std(axis=(0, 1)) / 255.0
        lum = img.mean(axis=2)
        hist, _ = np.histogram(lum, bins=self.feature_dim - 6, range=(0, 255))
        hist = hist / max(hist.sum(), 1)
        return np.concatenate([means, stds, hist]).astype(np.float32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        feats, widths, heights = [], [], []
        for p in payloads:
            img = self.decode(p)
            feats.append(self._features(img))
            heights.append(img.shape[0])
            widths.append(img.shape[1])
        out = batch.drop_columns(["payload"])  # decoded: payload no longer rides along
        out = out.append_column("decoded_width", pa.array(widths, type=pa.int32()))
        out = out.append_column("decoded_height", pa.array(heights, type=pa.int32()))
        return out.append_column(
            "media_features", pa.array([f.tolist() for f in feats],
                                       type=pa.list_(pa.float32())))


def extract_media_features(ds, concurrency=None, batch_size: int = 16, fake: bool = True):
    """media table -> features; small batches by design (binary payloads).

    concurrency=N runs an actor pool (appropriate when the real decoder holds
    heavy codec state); default runs task-based with the lightweight stub."""
    if concurrency:
        return ds.map_batches(
            MediaFeatureStage, fn_constructor_kwargs=dict(fake=fake),
            batch_format="pyarrow", batch_size=batch_size, concurrency=concurrency)
    return ds.map_batches(MediaFeatureStage(fake=fake), batch_format="pyarrow",
                          batch_size=batch_size)


class MediaRefResolver:
    """Stand-in for the media payload store: resolves media_ref -> payload
    bytes. Deterministic fake (payload derived from the ref hash); swap for a
    real object-store/Lance-blob fetch in production — the stage signature,
    batch sizing and output layout are unchanged."""

    def __init__(self, seed: int = 3):
        self.seed = seed

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = []
        for ref in batch.column("media_ref").to_pylist():
            n = 256 + int(hashlib.sha1((ref or "").encode()).digest()[0])
            rng = np.random.RandomState(
                int.from_bytes(hashlib.sha1((ref or "").encode()).digest()[:4],
                               "little") ^ self.seed)
            payloads.append(bytes(rng.randint(0, 256, size=n, dtype=np.uint8)))
        return batch.append_column("payload", pa.array(payloads, type=pa.binary()))


def extract_media_from_docs(docs_ds, concurrency=None, batch_size: int = 64):
    """Interleaved-media pipeline: documents (doc_id, spans) -> one feature
    row per kind='media' span, keyed by (doc_id, span offset, media_ref).

    Stages: flat-map media spans out of the span lists (tiny rows) ->
    resolve payloads (small batches; payloads are the heavy part) ->
    MediaFeatureStage decode+featurize.
    """
    def explode_media(batch: pa.Table) -> pa.Table:
        doc_ids, offsets, refs = [], [], []
        for doc_id, spans in zip(batch.column("doc_id").to_pylist(),
                                 batch.column("spans").to_pylist()):
            for span in spans or []:
                if (span.get("kind") or "") == "media":
                    doc_ids.append(doc_id)
                    offsets.append(span.get("offset"))
                    refs.append(span.get("media_ref") or "")
        return pa.table({
            "doc_id": pa.array(doc_ids, type=pa.string()),
            "offset": pa.array(offsets, type=pa.int32()),
            "media_ref": pa.array(refs, type=pa.string()),
            "media_type": pa.array([infer_media_type(r) for r in refs],
                                   type=pa.string()),
        })

    media = docs_ds.map_batches(explode_media, batch_format="pyarrow")
    with_payloads = media.map_batches(MediaRefResolver(), batch_format="pyarrow",
                                      batch_size=batch_size)
    return extract_media_features(with_payloads, concurrency=concurrency,
                                  batch_size=batch_size)


# ---------------------------------------------------------------------------
# resize + frame-sample stages (the rest of the multimodal stage set).
# Decode remains stubbed (no PIL/libav in this container) but the resize math
# (vectorized nearest-neighbor on ndarrays) and the frame-sampling layout
# (row-per-frame explode, timestamps, per-frame features) are real and tested.
# ---------------------------------------------------------------------------

_MEDIA_EXT_TYPES = {
    "png": "image", "jpg": "image", "jpeg": "image", "gif": "image",
    "webp": "image", "svg": "image",
    "mp3": "audio", "wav": "audio", "ogg": "audio", "flac": "audio",
    "mp4": "video", "webm": "video", "mkv": "video", "mov": "video",
}


def infer_media_type(ref: str) -> str:
    ext = (ref or "").rsplit(".", 1)[-1].lower()
    return _MEDIA_EXT_TYPES.get(ext, "binary")


def fake_duration_ms(ref: str) -> int:
    """Deterministic fake media duration derived from md5 so a SQL oracle can
    reproduce it (DuckDB has md5(); sha1 it does not)."""
    import hashlib as _h

    return 1000 + 100 * int(_h.md5((ref or "").encode()).hexdigest()[:2], 16)


def resize_nearest(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Vectorized nearest-neighbor resize (the real kernel; works on any
    decoded HxWxC array)."""
    h, w = img.shape[:2]
    rows = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    cols = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return img[rows[:, None], cols[None, :]]


class MediaResizeStage:
    """Actor stage: decode payload -> nearest-neighbor resize -> emit raw RGB
    bytes + output dims. Small batches by design (payloads are the heavy
    part); swap the decode for a real codec to use unchanged."""

    def __init__(self, out_h: int = 16, out_w: int = 16, fake: bool = True):
        self.decode = _decode_image_fake if fake else _decode_image_real
        self.out_h = out_h
        self.out_w = out_w

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        resized = [resize_nearest(self.decode(p), self.out_h, self.out_w)
                   for p in payloads]
        out = batch.drop_columns(["payload"])
        out = out.append_column(
            "resized_rgb", pa.array([r.tobytes() for r in resized],
                                    type=pa.binary()))
        out = out.append_column(
            "resized_height", pa.array([self.out_h] * len(resized),
                                       type=pa.int32()))
        return out.append_column(
            "resized_width", pa.array([self.out_w] * len(resized),
                                      type=pa.int32()))


def resize_media(ds, out_h: int = 16, out_w: int = 16, batch_size: int = 16,
                 concurrency=None, fake: bool = True):
    if concurrency:
        return ds.map_batches(
            MediaResizeStage,
            fn_constructor_kwargs=dict(out_h=out_h, out_w=out_w, fake=fake),
            batch_format="pyarrow", batch_size=batch_size,
            concurrency=concurrency)
    return ds.map_batches(MediaResizeStage(out_h=out_h, out_w=out_w, fake=fake),
                          batch_format="pyarrow", batch_size=batch_size)


class FrameSampleStage:
    """Actor stage for video refs: explode each video into one row per
    sampled frame (every `interval_ms` of its duration), with a per-frame
    feature vector. The frame DECODE is a deterministic fake (seeded by
    ref+frame index); the sampling schedule, row explosion and feature
    layout are the real pipeline shape."""

    def __init__(self, interval_ms: int = 500, feature_dim: int = 16,
                 fake: bool = True):
        self.interval_ms = interval_ms
        self.featurizer = MediaFeatureStage(fake=fake, feature_dim=feature_dim)
        self.fake = fake

    def _frame(self, ref: str, idx: int) -> np.ndarray:
        if not self.fake:
            raise NotImplementedError(
                "real video decode requires libav/cv2 (not in this container)")
        return _decode_image_fake(f"{ref}#{idx}".encode())

    def __call__(self, batch: pa.Table) -> pa.Table:
        refs_out, idx_out, ts_out, feats = [], [], [], []
        for ref in batch.column("media_ref").to_pylist():
            dur = fake_duration_ms(ref)
            n_frames = dur // self.interval_ms + 1
            for i in range(n_frames):
                refs_out.append(ref)
                idx_out.append(i)
                ts_out.append(i * self.interval_ms)
                feats.append(self.featurizer._features(self._frame(ref, i)))
        return pa.table({
            "media_ref": pa.array(refs_out, type=pa.string()),
            "frame_index": pa.array(idx_out, type=pa.int32()),
            "ts_ms": pa.array(ts_out, type=pa.int32()),
            "frame_features": pa.array([f.tolist() for f in feats],
                                       type=pa.list_(pa.float32())),
        })


def sample_video_frames(ds, interval_ms: int = 500, batch_size: int = 32,
                        concurrency=None):
    """Dataset of video media_refs -> one row per sampled frame."""
    if concurrency:
        return ds.map_batches(
            FrameSampleStage,
            fn_constructor_kwargs=dict(interval_ms=interval_ms),
            batch_format="pyarrow", batch_size=batch_size,
            concurrency=concurrency)
    return ds.map_batches(FrameSampleStage(interval_ms=interval_ms),
                          batch_format="pyarrow", batch_size=batch_size)


def make_media_table(refs, seed: int = 3) -> pa.Table:
    """Deterministic fake media table for the given media_refs."""
    rng = np.random.RandomState(seed)
    payloads = []
    for r in refs:
        n = 256 + int(hashlib.sha1(r.encode()).digest()[0])
        payloads.append(bytes(rng.randint(0, 256, size=n, dtype=np.uint8)))
    return pa.table({
        "media_ref": pa.array(list(refs), type=pa.string()),
        "media_type": pa.array(["image"] * len(refs), type=pa.string()),
        "payload": pa.array(payloads, type=pa.binary()),
        "width": pa.array([32] * len(refs), type=pa.int32()),
        "height": pa.array([32] * len(refs), type=pa.int32()),
        "duration_ms": pa.array([0] * len(refs), type=pa.int32()),
    })
