"""Batch-mode re-expressions of the reference's receivers (SURVEY.md
§2.1). The wire protocols (TCP msgpack, UDP syslog, HTTP server, Kafka
consumer) become file reads; what remains — and what these stages
implement — is each receiver's per-message VALIDATION and NORMALIZATION
semantics:

- HTTPRecv  (recvs/http.go:87-153): md5(ts+salt) signature check,
  ts-regexp check, allowed lateness window, orig-tag stamping.
- RsyslogRecv (recvs/rsyslog.go:65-156): timestamp + time_shift_sec ->
  formatted ``@timestamp``, msg_key -> ``message`` rename, rewrite_tags
  key renames, fixed tag.
- KafkaRecv (recvs/kafka.go:209-252): per record either JSON-parse into
  columns (optional tag from a JSON key) or keep raw bytes under
  msg_key.
"""

from __future__ import annotations

import hashlib
import json

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


# ---------------------------------------------------------------------------
# HTTP JSON ingest
# ---------------------------------------------------------------------------

HTTP_TS_REGEX = r"^\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}$"
# single source of truth for the signature salt and allowed window —
# synth and the SQL oracle builders import these (review finding)
DEFAULT_SALT = "spark-graft-salt"
DEFAULT_WINDOW = ("2024-01-01T00:00:00", "2024-02-01T00:00:00")


def http_validate_batch(batch: pa.Table, salt: str = DEFAULT_SALT,
                        window_min: str = DEFAULT_WINDOW[0],
                        window_max: str = DEFAULT_WINDOW[1],
                        orig_tag_key: str = "orig_tag",
                        tag: str = "http.sit") -> pa.Table:
    """Drop rows failing: ts-format regex, md5(ts+salt) signature, or the
    allowed time window (max_allowed_delay/ahead, http.go:133-150).
    Stamps the fixed recv tag and keeps the original under orig_tag."""
    ts = batch["timestamp"]
    ok_fmt = pc.fill_null(pc.match_substring_regex(ts, HTTP_TS_REGEX), False)
    want_sig = pa.array(
        [hashlib.md5((t + salt).encode()).hexdigest() if t else ""
         for t in ts.to_pylist()], type=pa.string())
    ok_sig = pc.fill_null(pc.equal(batch["sig"], want_sig), False)
    parsed = pa.Array.from_pandas(pd.to_datetime(
        ts.to_pandas(), format="%Y-%m-%dT%H:%M:%S", errors="coerce"))
    ok_win = pc.and_(
        pc.greater_equal(parsed, pa.scalar(window_min).cast(parsed.type)),
        pc.less_equal(parsed, pa.scalar(window_max).cast(parsed.type)))
    ok_win = pc.fill_null(ok_win, False)
    keep = pc.and_(pc.and_(ok_fmt, ok_sig), ok_win)
    out = batch.filter(keep)
    n = out.num_rows
    if orig_tag_key not in out.column_names:
        out = out.append_column(
            orig_tag_key,
            out["tag"] if "tag" in out.column_names
            else pa.nulls(n, pa.string()))
    tag_arr = pa.array([tag] * n, type=pa.string())
    if "tag" in out.column_names:
        out = out.set_column(out.column_names.index("tag"), "tag", tag_arr)
    else:
        out = out.append_column("tag", tag_arr)
    return out


# ---------------------------------------------------------------------------
# rsyslog
# ---------------------------------------------------------------------------

def rsyslog_transform_batch(batch: pa.Table,
                            msg_key: str = "msg",
                            time_shift_sec: int = 0,
                            new_time_format: str = "%Y-%m-%dT%H:%M:%S.%fZ",
                            rewrite: dict[str, str] | None = None,
                            tag: str = "emqtt.sit") -> pa.Table:
    """timestamp (+shift) -> formatted @timestamp; msg_key -> message;
    key renames; fixed tag (rsyslog.go:65-156)."""
    import numpy as np

    out = batch
    ts = out["timestamp"]
    if not pa.types.is_timestamp(ts.type):
        ts = pc.cast(ts, pa.timestamp("us"))
    shifted = pc.add(ts, pa.scalar(time_shift_sec * 1_000_000, pa.duration("us")))
    vals = shifted.combine_chunks().to_numpy(zero_copy_only=False) \
        if isinstance(shifted, pa.ChunkedArray) else \
        shifted.to_numpy(zero_copy_only=False)
    iso = np.char.add(
        np.datetime_as_string(vals.astype("datetime64[us]"), unit="us"), "Z")
    out = out.append_column("@timestamp", pa.array(iso, type=pa.string()))
    out = out.remove_column(out.column_names.index("timestamp"))
    if msg_key in out.column_names:
        out = out.rename_columns(
            ["message" if c == msg_key else c for c in out.column_names])
    for old, new in (rewrite or {}).items():
        if old in out.column_names:
            out = out.rename_columns(
                [new if c == old else c for c in out.column_names])
    return out.append_column(
        "tag", pa.array([tag] * out.num_rows, type=pa.string()))


# ---------------------------------------------------------------------------
# kafka
# ---------------------------------------------------------------------------

def kafka_parse_batch(batch: pa.Table, raw_col: str = "value",
                      is_json_format: bool = True,
                      msg_key: str = "log",
                      tag_key: str | None = "tag",
                      default_tag: str = "kafka.sit",
                      json_fields: tuple[str, ...] = ("app", "level")
                      ) -> pa.Table:
    """Two parse paths in one stage (kafka.go:209-252): JSON records ->
    lifted columns (+ optional tag from a JSON key); non-JSON (or
    is_json_format=False) -> raw string under msg_key."""
    raws = batch[raw_col].to_pylist()
    n = len(raws)
    tags = [default_tag] * n
    msgs: list[str | None] = [None] * n
    lifted = {f: [None] * n for f in json_fields}
    for i, r in enumerate(raws):
        obj = None
        if is_json_format:
            try:
                obj = json.loads(r)
                if not isinstance(obj, dict):
                    obj = None
            except (ValueError, TypeError):
                obj = None
        if obj is None:
            msgs[i] = r
            continue
        msgs[i] = obj.get(msg_key)
        if tag_key and isinstance(obj.get(tag_key), str):
            tags[i] = obj[tag_key]
        for f in json_fields:
            v = obj.get(f)
            if v is not None:
                lifted[f][i] = str(v)
    out = batch.drop_columns([raw_col])
    out = out.append_column(msg_key, pa.array(msgs, type=pa.string()))
    out = out.append_column("tag", pa.array(tags, type=pa.string()))
    for f in json_fields:
        out = out.append_column(f, pa.array(lifted[f], type=pa.string()))
    return out
