"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Decoders are FEATURE-DETECTED once per actor (__init__), in tiers:
(1) PIL / soundfile when importable (PNG/JPEG pixels, any libsndfile
audio); (2) a pure-stdlib fallback — zlib+struct PNG inflater and the
``wave`` module for PCM WAV — so PNG and WAV payloads are REALLY
decoded even in containers without codec libraries, like this one;
(3) the deterministic stub for the synthetic IMG0 format. JPEG has no
pure-stdlib decoder, so without PIL it falls through to "unknown"
(NotImplementedError in strict mode). Corrupt payloads never kill a
run outside strict mode: a failed decode degrades to "unknown" + zero
features. The Ray-side plumbing is identical in every tier: binary
columns flow zero-copy through Arrow, the stage is an actor pool sized
for large rows (small batch_size), and the output layout (fixed schema
with list<float> features) does not depend on which decoder ran.
"""

from __future__ import annotations

import hashlib
import struct
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

# number of samples per pixel for each PNG color type (3 = palette,
# unsupported in the pure tier)
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def png_to_gray(payload: bytes) -> np.ndarray:
    """Pure-stdlib PNG decode -> 2-D float32 grayscale in [0, 1].

    Fallback tier for containers without PIL: chunk walk + zlib
    inflate + per-scanline filter reconstruction (PNG spec filters
    0-4), then ITU-R 601-2 luma for color images. Supports 8-bit
    non-interlaced gray/RGB/gray+alpha/RGBA — what encoders emit by
    default. The per-scanline loop is O(height) Python, fine for the
    thumbnail-scale payloads this tier exists for; installs with real
    image volume should ship PIL (tier 1) instead.
    """
    if payload[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG signature")
    pos, idat, hdr = 8, [], None
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos:pos + 4])
        ctype = payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + length]
        pos += 12 + length
        if ctype == b"IHDR":
            hdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
    if hdr is None or not idat:
        raise ValueError("truncated PNG")
    w, h, depth, color, _comp, _filt, interlace = hdr
    if depth != 8 or interlace != 0 or color not in _PNG_CHANNELS:
        raise NotImplementedError(
            "pure PNG tier handles 8-bit non-interlaced "
            "gray/RGB/RGBA only")
    ch = _PNG_CHANNELS[color]
    stride = w * ch
    raw = zlib.decompress(b"".join(idat))
    if len(raw) < h * (stride + 1):
        raise ValueError("short PNG pixel data")
    out = np.empty((h, stride), dtype=np.int32)
    prev = np.zeros(stride, dtype=np.int32)
    p = 0
    for y in range(h):
        ftype = raw[p]
        rec = np.frombuffer(raw[p + 1:p + 1 + stride],
                            dtype=np.uint8).astype(np.int32)
        p += 1 + stride
        if ftype == 1:          # Sub: left-neighbour prefix dependency
            for i in range(ch, stride):
                rec[i] = (rec[i] + rec[i - ch]) & 0xFF
        elif ftype == 2:        # Up: vectorizable
            rec = (rec + prev) & 0xFF
        elif ftype == 3:        # Average
            for i in range(stride):
                left = rec[i - ch] if i >= ch else 0
                rec[i] = (rec[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:        # Paeth
            for i in range(stride):
                a = rec[i - ch] if i >= ch else 0
                b = prev[i]
                c = prev[i - ch] if i >= ch else 0
                pr = a + b - c
                pa_, pb, pc_ = abs(pr - a), abs(pr - b), abs(pr - c)
                rec[i] = (rec[i] + (a if pa_ <= pb and pa_ <= pc_
                                    else b if pb <= pc_ else c)) & 0xFF
        elif ftype != 0:
            raise ValueError(f"bad PNG filter type {ftype}")
        out[y] = rec
        prev = rec
    px = out.reshape(h, w, ch).astype(np.float32)
    if ch >= 3:
        gray = (px[..., 0] * 0.299 + px[..., 1] * 0.587
                + px[..., 2] * 0.114)
    else:                       # gray / gray+alpha: luma is channel 0
        gray = px[..., 0]
    return gray / 255.0


def wav_to_samples(payload: bytes) -> np.ndarray:
    """Pure-stdlib PCM WAV decode -> mono float32 samples in [-1, 1]
    via the ``wave`` module (fallback tier when soundfile is absent)."""
    import io
    import wave

    with wave.open(io.BytesIO(payload)) as wf:
        width, n_ch = wf.getsampwidth(), wf.getnchannels()
        raw = wf.readframes(wf.getnframes())
    if width == 2:
        data = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    elif width == 1:            # 8-bit WAV is unsigned
        data = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32)
                - 128.0) / 128.0
    elif width == 4:
        data = (np.frombuffer(raw, dtype="<i4").astype(np.float32)
                / 2147483648.0)
    else:
        raise NotImplementedError(f"unsupported PCM width {width}")
    if n_ch > 1:
        data = data.reshape(-1, n_ch).mean(axis=1)
    return data


class MultimodalExtract:
    """Actor-pool stage over binary payloads: validates magic, extracts
    metadata (size, crc32, format), emits features. Decoders are
    feature-detected ONCE per actor, in tiers: PIL/soundfile when
    present, pure-stdlib PNG/WAV otherwise, stub for IMG0. Payloads
    with no decoder (JPEG sans PIL) or that fail to decode degrade to
    "unknown" + zero features — or raise in strict mode. Use a SMALL
    batch_size when payloads are large (brief: batch x concurrency
    must fit the worker heap)."""

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

    def _pool_gray(self, gray: np.ndarray) -> np.ndarray:
        """2-D grayscale -> dim features: column means pooled into dim
        equal slices (the pure-tier analogue of PIL's resize-to-(dim,1))."""
        cols = gray.mean(axis=0)
        chunks = np.array_split(cols, self.dim)
        return np.array([c.mean() if len(c) else 0.0 for c in chunks],
                        dtype=np.float32)

    def _decode_image(self, payload: bytes) -> np.ndarray:
        """PIL when present (grayscale, resize to (dim, 1)); otherwise
        the pure-stdlib PNG tier with mean pooling. Deterministic for a
        given image, dim, and tier."""
        if self._pil is not None:
            import io

            img = self._pil.open(io.BytesIO(payload)).convert("L")
            img = img.resize((self.dim, 1))
            return np.asarray(img, dtype=np.float32).reshape(-1) / 255.0
        return self._pool_gray(png_to_gray(payload))

    def _pool_audio(self, data: np.ndarray) -> np.ndarray:
        """Mono samples -> mean |amplitude| over dim equal slices."""
        if len(data) == 0:
            return np.zeros(self.dim, dtype=np.float32)
        chunks = np.array_split(np.abs(data), self.dim)
        return np.array([c.mean() if len(c) else 0.0 for c in chunks],
                        dtype=np.float32)

    def _decode_audio(self, payload: bytes) -> np.ndarray:
        """soundfile when present (any libsndfile format); otherwise the
        stdlib ``wave`` PCM tier. Same pooling either way."""
        if self._sf is not None:
            import io

            data, _sr = self._sf.read(io.BytesIO(payload),
                                      dtype="float32")
            if data.ndim > 1:
                data = data.mean(axis=1)
            return self._pool_audio(data)
        return self._pool_audio(wav_to_samples(payload))

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        fmt, size, crc, feats = [], [], [], []
        for p in payloads:
            size.append(len(p))
            crc.append(zlib.crc32(p))
            kind, decode = None, None
            if p[:4] == MAGIC:
                kind, decode = "img0", lambda q: _decode_stub(q, self.dim)
            elif p[:4] == _PNG_MAGIC:
                kind, decode = "png", self._decode_image
            elif p[:3] == _JPEG_MAGIC and self._pil is not None:
                kind, decode = "jpeg", self._decode_image
            elif p[:4] == _WAV_MAGIC:
                kind, decode = "wav", self._decode_audio
            try:
                if decode is None:
                    raise NotImplementedError(
                        "no decoder available for this payload "
                        "(unrecognized magic, or JPEG without PIL)")
                feats.append(decode(p))
                fmt.append(kind)
            except Exception:
                if self.strict:
                    raise
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

    from .similarity import scan_pool

    ds = ds.map_batches(add_md5, batch_format="pyarrow")
    # decode is the CPU-bound stage at scale; autoscale the pool (a
    # fixed 2-actor pool capped it regardless of cluster size) but keep
    # small batches — payload rows are fat
    ds = ds.map_batches(MultimodalExtract, batch_format="pyarrow",
                        concurrency=scan_pool(), batch_size=256)
    return ds.select_columns(["doc_id", "format", "payload_len",
                              "payload_md5"])


MULTIMODAL_META_SQL = """
SELECT doc_id, 'img0' AS format,
       (4 + octet_length(encode(text)))::BIGINT AS payload_len,
       md5('IMG0' || text) AS payload_md5
FROM documents
"""
