"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Codec libraries are FEATURE-DETECTED once per actor (__init__): when
PIL / soundfile are importable, PNG/JPEG and WAV payloads are really
decoded (pixels -> pooled grayscale features; samples -> pooled
amplitude features). In containers without those libraries — this one —
the detection comes back empty and the deterministic stub path runs
instead (explicit NotImplementedError in strict mode), so the Ray-side
plumbing is identical either way: binary columns flow zero-copy through
Arrow, the stage is an actor pool sized for large rows (small
batch_size), and the output layout (fixed schema with list<float>
features) does not depend on which decoder ran.
"""

from __future__ import annotations

import hashlib
import zlib

import numpy as np
import pyarrow as pa

MAGIC = b"IMG0"


def attach_payload_batch(batch: pa.Table, col: str = "text") -> pa.Table:
    """Build a deterministic binary payload column from a text column
    (stand-in for real image/audio bytes): MAGIC header + utf-8 body."""
    payloads = [MAGIC + t.encode("utf-8") for t in batch[col].to_pylist()]
    return batch.append_column("payload", pa.array(payloads, type=pa.binary()))


def _decode_stub(payload: bytes, dim: int = 8) -> np.ndarray:
    """Deterministic fake 'decoded features': digest -> dim floats.
    A real implementation would decode pixels/samples here."""
    d = hashlib.blake2b(payload, digest_size=dim * 2).digest()
    v = np.frombuffer(d, dtype=np.uint16).astype(np.float32)
    return v / 65535.0


_PNG_MAGIC = b"\x89PNG"
_JPEG_MAGIC = b"\xff\xd8\xff"
_WAV_MAGIC = b"RIFF"


class MultimodalExtract:
    """Actor-pool stage over binary payloads: validates magic, extracts
    metadata (size, crc32, format), emits features. Real codecs are
    feature-detected ONCE per actor; payloads whose magic matches an
    available codec are really decoded, everything else takes the
    deterministic stub (or NotImplementedError in strict mode). Use a
    SMALL batch_size when payloads are large (brief: batch x
    concurrency must fit the worker heap)."""

    def __init__(self, feature_dim: int = 8, strict: bool = False):
        self.dim = feature_dim
        self.strict = strict
        # codec detection happens here — once per actor, never per batch
        try:
            from PIL import Image as _Image  # noqa: N813

            self._pil = _Image
        except ImportError:
            self._pil = None
        try:
            import soundfile as _sf

            self._sf = _sf
        except ImportError:
            self._sf = None

    def _decode_image(self, payload: bytes) -> np.ndarray:
        """PIL path: grayscale, resize to (dim, 1), normalized pixels —
        deterministic for a given image and dim."""
        import io

        img = self._pil.open(io.BytesIO(payload)).convert("L")
        img = img.resize((self.dim, 1))
        return np.asarray(img, dtype=np.float32).reshape(-1) / 255.0

    def _decode_audio(self, payload: bytes) -> np.ndarray:
        """soundfile path: mean |amplitude| over dim equal slices."""
        import io

        data, _sr = self._sf.read(io.BytesIO(payload), dtype="float32")
        if data.ndim > 1:
            data = data.mean(axis=1)
        if len(data) == 0:
            return np.zeros(self.dim, dtype=np.float32)
        chunks = np.array_split(np.abs(data), self.dim)
        return np.array([c.mean() if len(c) else 0.0 for c in chunks],
                        dtype=np.float32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        fmt, size, crc, feats = [], [], [], []
        for p in payloads:
            size.append(len(p))
            crc.append(zlib.crc32(p))
            if p[:4] == MAGIC:
                fmt.append("img0")
                feats.append(_decode_stub(p, self.dim))
            elif (p[:4] == _PNG_MAGIC or p[:3] == _JPEG_MAGIC) \
                    and self._pil is not None:
                fmt.append("png" if p[:4] == _PNG_MAGIC else "jpeg")
                feats.append(self._decode_image(p))
            elif p[:4] == _WAV_MAGIC and self._sf is not None:
                fmt.append("wav")
                feats.append(self._decode_audio(p))
            else:
                if self.strict:
                    raise NotImplementedError(
                        "no decoder available for this payload "
                        "(codec libraries absent from this container)")
                fmt.append("unknown")
                feats.append(np.zeros(self.dim, dtype=np.float32))
        out = batch.drop_columns(["payload"])
        out = out.append_column("format", pa.array(fmt, type=pa.string()))
        out = out.append_column("payload_len",
                                pa.array(size, type=pa.int64()))
        out = out.append_column("crc32", pa.array(crc, type=pa.int64()))
        out = out.append_column(
            "features",
            pa.array([f.tolist() for f in feats],
                     type=pa.list_(pa.float32())))
        return out


class ResizeStub:
    """Actor-pool 'resize' over binary payloads: a real implementation
    would decode -> scale -> re-encode; the stub deterministically
    truncates the body to ``max_bytes`` and re-stamps the header, so
    output sizes/schema behave like a real thumbnailer. Use a small
    batch_size — output rows stay large binaries."""

    def __init__(self, max_bytes: int = 64):
        self.max_bytes = max_bytes

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = [MAGIC + p[len(MAGIC):len(MAGIC) + self.max_bytes]
               if p[:4] == MAGIC else p[: self.max_bytes + 4]
               for p in batch["payload"].to_pylist()]
        i = batch.column_names.index("payload")
        return batch.set_column(i, "payload",
                                pa.array(out, type=pa.binary()))


def frame_sample_batch(batch: pa.Table, frame_bytes: int = 16,
                       every: int = 4) -> pa.Table:
    """Video-style frame sampling plumbing: treat each payload body as
    fixed-size frames, emit one output ROW per sampled frame (row
    fan-out inside map_batches — flat_map semantics without per-row
    Python calls at the Dataset level)."""
    ids, frame_idx, frames = [], [], []
    for doc_id, p in zip(batch["doc_id"].to_pylist(),
                         batch["payload"].to_pylist()):
        body = p[len(MAGIC):] if p[:4] == MAGIC else p
        n_frames = max(1, len(body) // frame_bytes)
        for f in range(0, n_frames, every):
            ids.append(doc_id)
            frame_idx.append(f)
            frames.append(body[f * frame_bytes:(f + 1) * frame_bytes])
    return pa.table({
        "doc_id": pa.array(ids, type=pa.int64()),
        "frame_idx": pa.array(frame_idx, type=pa.int32()),
        "frame": pa.array(frames, type=pa.binary()),
    })


def multimodal_meta(ds):
    """documents -> payload -> metadata/features (drop the list column
    for the scalar-only oracle comparison; md5 of payload matches the
    SQL md5('IMG0' || text))."""
    import pyarrow.compute as pc

    ds = ds.map_batches(attach_payload_batch, batch_format="pyarrow",
                        zero_copy_batch=True)

    def add_md5(batch: pa.Table) -> pa.Table:
        h = [hashlib.md5(p).hexdigest() for p in batch["payload"].to_pylist()]
        return batch.append_column("payload_md5",
                                   pa.array(h, type=pa.string()))

    ds = ds.map_batches(add_md5, batch_format="pyarrow")
    ds = ds.map_batches(MultimodalExtract, batch_format="pyarrow",
                        concurrency=2, batch_size=256)
    return ds.select_columns(["doc_id", "format", "payload_len",
                              "payload_md5"])


MULTIMODAL_META_SQL = """
SELECT doc_id, 'img0' AS format,
       (4 + octet_length(encode(text)))::BIGINT AS payload_len,
       md5('IMG0' || text) AS payload_md5
FROM documents
"""
