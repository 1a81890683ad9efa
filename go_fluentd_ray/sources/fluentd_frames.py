"""Batch-mode FluentdRecv: decode fluentd-forward msgpack frame files.

The reference's TCP receiver (recvs/fluentd.go:209-342) accepts three
frame shapes per connection; a frame file here is the byte stream such
a connection would carry, and `read_binary_files` + a decoding
map_batches replaces the socket loop:

1. Forward:       ["tag", [[time, record], ...]]
2. PackedForward: ["tag", <bytes: concatenated msgpack [time, record]>]
3. Message:       ["tag", time, record]

Malformed frames/entries are DISCARDED with a counter, mirroring the
reference's warn-and-continue paths (fluentd.go:247-342): frame not an
array / too short, tag not str/bytes, record not a map.

Record maps become: ``message`` (the record's "log" key, reference
settings' msg_key analogue), ``time`` (epoch seconds when present) and
ALL keys flattened into the ``extra`` map column (FlattenMap,
library/utils.go:75-85) — the same fixed-schema strategy as the parse
stage.

Scale shape: one frame FILE is one task (read_binary_files streams
files as blocks); decode is C msgpack per frame; no driver-side work.
"""

from __future__ import annotations

import io

import pyarrow as pa

from ..functions.jsonutil import EXTRA_TYPE, flatten_obj

try:
    import msgpack
except ImportError:  # pragma: no cover - baked into this container
    msgpack = None

FRAME_SCHEMA = pa.schema([
    ("tag", pa.string()),
    ("time", pa.int64()),
    ("message", pa.string()),
    ("extra", EXTRA_TYPE),
])


def _as_tag(v) -> str | None:
    if isinstance(v, bytes):
        return v.decode("utf-8", "replace")
    if isinstance(v, str):
        return v
    return None


def _as_time(v) -> int | None:
    # fluentd event time is an int or an EventTime ext type; ext falls
    # back to None (the reference ignores v[0]/time entirely)
    if isinstance(v, int):
        return v
    return None


def decode_stream(buf: bytes) -> tuple[list[tuple], int]:
    """Decode one connection-stream's bytes into (rows, n_discarded);
    rows are (tag, time, record-dict) tuples."""
    if msgpack is None:
        raise NotImplementedError(
            "msgpack is unavailable; the fluentd frame source is disabled")
    rows: list[tuple] = []
    discarded = 0
    unpacker = msgpack.Unpacker(io.BytesIO(buf), raw=False,
                                strict_map_key=False)
    for frame in unpacker:
        if not isinstance(frame, (list, tuple)) or len(frame) < 2:
            discarded += 1
            continue
        tag = _as_tag(frame[0])
        if tag is None:
            discarded += 1
            continue
        body = frame[1]
        if isinstance(body, (list, tuple)):           # Forward
            for entry in body:
                if (isinstance(entry, (list, tuple)) and len(entry) >= 2
                        and isinstance(entry[1], dict)):
                    rows.append((tag, _as_time(entry[0]), entry[1]))
                else:
                    discarded += 1
        elif isinstance(body, bytes):                 # PackedForward
            inner = msgpack.Unpacker(io.BytesIO(body), raw=False,
                                     strict_map_key=False)
            for entry in inner:
                if (isinstance(entry, (list, tuple)) and len(entry) >= 2
                        and isinstance(entry[1], dict)):
                    rows.append((tag, _as_time(entry[0]), entry[1]))
                else:
                    discarded += 1
        else:                                         # Message
            if len(frame) >= 3 and isinstance(frame[2], dict):
                rows.append((tag, _as_time(body), frame[2]))
            else:
                discarded += 1
    return rows, discarded


def frames_to_table(buf: bytes, msg_key: str = "log") -> pa.Table:
    rows, _ = decode_stream(buf)
    tags, times, msgs, extras = [], [], [], []
    for tag, t, rec in rows:
        tags.append(tag)
        times.append(t)
        m = rec.get(msg_key)
        msgs.append(m.decode("utf-8", "replace") if isinstance(m, bytes)
                    else (str(m) if m is not None else None))
        extras.append(list(flatten_obj(
            {k: (v.decode("utf-8", "replace") if isinstance(v, bytes) else v)
             for k, v in rec.items()}).items()))
    return pa.table({
        "tag": pa.array(tags, type=pa.string()),
        "time": pa.array(times, type=pa.int64()),
        "message": pa.array(msgs, type=pa.string()),
        "extra": pa.array(extras, type=EXTRA_TYPE),
    }, schema=FRAME_SCHEMA)


def read_fluentd_frames(path: str):
    """Ray pipeline: one decode task per frame file."""
    import ray.data as rd

    ds = rd.read_binary_files(path)

    def decode_batch(batch: pa.Table) -> pa.Table:
        parts = [frames_to_table(b.as_py() if hasattr(b, "as_py") else b)
                 for b in batch["bytes"]]
        return (pa.concat_tables(parts) if parts
                else FRAME_SCHEMA.empty_table())

    return ds.map_batches(decode_batch, batch_format="pyarrow",
                          zero_copy_batch=True)


# ---------------------------------------------------------------------------
# frames carrying transcript rows (the composed pipeline's ingest edge:
# the reference's recv hands records straight to its in-connection
# concatenator + tag pipeline, recvs/fluentd.go:399-544)
# ---------------------------------------------------------------------------

TRANSCRIPT_SCHEMA = pa.schema([
    ("conv_id", pa.string()),
    ("turn_idx", pa.int32()),
    ("role", pa.string()),
    ("text", pa.string()),
    ("tool", pa.string()),
    ("ts", pa.timestamp("us")),
])


def transcripts_from_stream(buf: bytes) -> pa.Table:
    """Decode one connection-stream into the flagship transcript
    schema: the record's 'log' key is the text (msg_key analogue), the
    remaining keys are the typed turn columns (ts as epoch micros —
    exact round-trip, no string formatting). Records missing conv_id /
    turn_idx are discarded (warn-and-continue parity)."""
    rows, _ = decode_stream(buf)
    conv, turn, role, text, tool, ts_us = [], [], [], [], [], []

    def _s(v):
        if isinstance(v, bytes):
            return v.decode("utf-8", "replace")
        return v if isinstance(v, str) else None

    for _tag, _t, rec in rows:
        c, ti = _s(rec.get("conv_id")), rec.get("turn_idx")
        if c is None or not isinstance(ti, int):
            continue
        conv.append(c)
        turn.append(ti)
        role.append(_s(rec.get("role")))
        text.append(_s(rec.get("log")))
        tool.append(_s(rec.get("tool")))
        t = rec.get("ts_us")
        ts_us.append(t if isinstance(t, int) else None)
    return pa.table({
        "conv_id": pa.array(conv, type=pa.string()),
        "turn_idx": pa.array(turn, type=pa.int32()),
        "role": pa.array(role, type=pa.string()),
        "text": pa.array(text, type=pa.string()),
        "tool": pa.array(tool, type=pa.string()),
        "ts": pa.array(ts_us, type=pa.int64()).cast(pa.timestamp("us")),
    }, schema=TRANSCRIPT_SCHEMA)


def read_fluentd_transcripts(path: str):
    """Ray reader for transcript-bearing frame files: one decode task
    per connection file, output in the flagship input schema — feed the
    result straight into pipelines.flagship.build_pipeline."""
    import ray.data as rd

    ds = rd.read_binary_files(path)

    def decode_batch(batch: pa.Table) -> pa.Table:
        parts = [transcripts_from_stream(
            b.as_py() if hasattr(b, "as_py") else b)
            for b in batch["bytes"]]
        return (pa.concat_tables(parts) if parts
                else TRANSCRIPT_SCHEMA.empty_table())

    return ds.map_batches(decode_batch, batch_format="pyarrow",
                          zero_copy_batch=True)
