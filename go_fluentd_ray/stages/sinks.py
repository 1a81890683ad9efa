"""Resumable per-partition sink layout — the batch-mode answer to the
reference's WAL/journal + committed-id machinery (journal.go, SURVEY.md
§3.3). Stronger guarantee than the reference's at-least-once: output is
exactly-once-observable.

Layout under ``out_root`` (which MUST be shared storage on a multi-node
cluster — every write task and the driver-side rollup read it):

    _PARTITIONING.json           pins num_buckets for the lifetime of
                                 this output dir; resume ADOPTS it, so
                                 resuming on a different-size cluster
                                 cannot silently re-key the data
    bucket=<b>/data.parquet      one file per partition (atomic rename)
    bucket=<b>/_MANIFEST.json    lineage + metrics: row count, per-sink
                                 counts, content md5
    _METRICS.json                run-level rollup

The partition key is the deterministic concat bucket
(hash(conv_id) % B), so a re-run computes exactly the same partition
contents. Resume = skip buckets whose manifest exists; a partition dir
without a manifest (crash mid-write) is recomputed; writes go to a tmp
name then os.rename, so readers never see partial data.

Completeness guarantee: each partition is finished AND written inside a
single ``groupby(bucket).map_groups`` call — map_groups hands the fn
the WHOLE group, so a bucket can never be split across write calls
(a plain map_batches sink stage would re-write the same bucket file
once per block and lose all but the last fragment).
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import tempfile

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

MANIFEST = "_MANIFEST.json"
METRICS = "_METRICS.json"
PARTITIONING = "_PARTITIONING.json"


def completed_buckets(out_root: str) -> set[int]:
    done = set()
    if not os.path.isdir(out_root):
        return done
    for name in os.listdir(out_root):
        if name.startswith("bucket=") and os.path.exists(
                os.path.join(out_root, name, MANIFEST)):
            done.add(int(name.split("=", 1)[1]))
    return done


def _pin_partitioning(out_root: str, requested: int) -> int:
    """Record num_buckets on first run; later runs ADOPT the pinned
    value (a different B would re-key rows and corrupt resume)."""
    p = os.path.join(out_root, PARTITIONING)
    if os.path.exists(p):
        with open(p) as f:
            return int(json.load(f)["num_buckets"])
    fd, tmp = tempfile.mkstemp(dir=out_root, suffix=".ptmp")
    os.close(fd)
    with open(tmp, "w") as f:
        json.dump({"num_buckets": requested}, f)
    os.rename(tmp, p)
    return requested


def _write_one_bucket(part: pa.Table, b: int, out_root: str) -> dict:
    """Atomic data + manifest write for one COMPLETE partition."""
    part = part.take(pc.sort_indices(
        part, sort_keys=[("conv_id", "ascending"), ("turn_idx", "ascending")]))
    d = os.path.join(out_root, f"bucket={b}")
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
    os.close(fd)
    pq.write_table(part, tmp, compression="snappy")
    with open(tmp, "rb") as f:
        md5 = hashlib.md5(f.read()).hexdigest()
    os.rename(tmp, os.path.join(d, "data.parquet"))
    sink_counts = {}
    for s in pc.unique(part["sink"]).to_pylist():
        sink_counts[s] = pc.sum(
            pc.cast(pc.equal(part["sink"], s), pa.int64())).as_py()
    manifest = {
        "bucket": int(b),
        "rows": part.num_rows,
        "inputs_merged": pc.sum(part["n_merged"]).as_py() or 0,
        "per_sink": sink_counts,
        "md5": md5,
    }
    mfd, mtmp = tempfile.mkstemp(dir=d, suffix=".mtmp")
    os.close(mfd)
    with open(mtmp, "w") as f:
        json.dump(manifest, f)
    os.rename(mtmp, os.path.join(d, MANIFEST))
    return manifest


def fanout_sinks(ds, out_root: str) -> None:
    """Per-sink directory fan-out — the producer's 'every matching
    sender gets the msg' (producer.go:309-325) in batch form: ONE pass
    over the dataset, hive-partitioned by the sink column, so each
    sink's consumer (the ES-index/Kafka-topic analogue) reads only its
    own directory."""
    ds.write_parquet(out_root, partition_cols=["sink"])


def run_resumable(corpus_path: str, out_root: str, cfg=None,
                  num_buckets: int | None = None) -> dict:
    """Run the flagship pipeline with per-partition checkpointing.

    Returns the run-level metrics dict (also written to _METRICS.json).
    Call again after a crash: completed buckets are skipped entirely —
    their rows are filtered out right after the (cheap) bucket-id stage,
    before any parse/shuffle work. Each partition is concat+parsed+
    enriched+routed+written inside ONE map_groups call, so partial
    buckets can never be marked complete."""
    import ray.data  # noqa: F401

    from ..config import DEFAULT_CONFIG
    from ..pipelines import flagship
    from .acceptor import acceptor_transform
    from .concat import add_bucket, concat_bucket

    cfg = cfg or DEFAULT_CONFIG
    os.makedirs(out_root, exist_ok=True)
    B = _pin_partitioning(out_root, num_buckets
                          or flagship.default_num_buckets())
    done = completed_buckets(out_root)
    # clean partial (manifest-less) partition dirs from a crashed run
    for name in os.listdir(out_root):
        p = os.path.join(out_root, name)
        if (name.startswith("bucket=") and os.path.isdir(p)
                and not os.path.exists(os.path.join(p, MANIFEST))):
            shutil.rmtree(p)

    ds = flagship.read_transcripts(corpus_path)
    # bucket id first (needs only conv_id) so the resume filter drops
    # completed partitions BEFORE any acceptor/parse work
    ds = ds.map_batches(lambda t: add_bucket(t, B),
                        batch_format="pyarrow", zero_copy_batch=True)
    if done:
        done_arr = pa.array(sorted(done), type=pa.int32())
        ds = ds.map_batches(
            lambda t: t.filter(pc.invert(pc.is_in(t["bucket"],
                                                  value_set=done_arr))),
            batch_format="pyarrow", zero_copy_batch=True)
    ds = ds.map_batches(lambda t: acceptor_transform(t, cfg),
                        batch_format="pyarrow", zero_copy_batch=True)

    def process_and_write(df: pd.DataFrame) -> pd.DataFrame:
        b = int(df["bucket"].iloc[0])
        t = concat_bucket(df, cfg, keep_bucket=True)
        t = flagship.Finisher(cfg)(t)
        # 0-row buckets still get a manifest so resume skips them
        m = _write_one_bucket(t, b, out_root)
        return pd.DataFrame({"bucket": [m["bucket"]],
                             "rows": [m["rows"]],
                             "md5": [m["md5"]]})

    dsum = ds.groupby("bucket").map_groups(
        process_and_write, batch_format="pandas")
    summary = dsum.to_pandas()

    # run-level metrics rollup from the per-partition manifests
    manifests = []
    for b in completed_buckets(out_root):
        with open(os.path.join(out_root, f"bucket={b}", MANIFEST)) as f:
            manifests.append(json.load(f))
    per_sink: dict[str, int] = {}
    for m in manifests:
        for s, n in m["per_sink"].items():
            per_sink[s] = per_sink.get(s, 0) + n
    from ..pipelines.monitoring import stage_stats
    metrics = {
        "num_buckets": B,
        "partitions": len(manifests),
        "partitions_written_this_run": int(len(summary)),
        "rows": int(sum(m["rows"] for m in manifests)),
        "inputs_merged": int(sum(m["inputs_merged"] for m in manifests)),
        "per_sink": dict(sorted(per_sink.items())),
        # per-operator wall/rows/bytes — the /monitor analogue
        "stages": stage_stats(dsum),
    }
    with open(os.path.join(out_root, METRICS), "w") as f:
        json.dump(metrics, f, indent=1)
    return metrics


# ---------------------------------------------------------------------------
# ElasticSearch _bulk NDJSON sink (wire-format parity)
# ---------------------------------------------------------------------------

def es_bulk_payload(batch: pa.Table, type_name: str = "logs",
                    drop: tuple[str, ...] = ("merged_turns", "extra",
                                             "bucket")) -> str:
    """Format one batch as an ES ``_bulk`` body
    (senders/elasticsearch.go:125-159): per routed row, an action line
    ``{"index": {"_index": <sink>, "_type": "logs"}}`` followed by the
    message JSON; null fields and non-JSON columns are omitted, rows
    with no sink are skipped (getMsgStarting error path)."""
    lines: list[str] = []
    for r in batch.to_pylist():
        sink = r.get("sink")
        if sink is None:
            continue
        doc = {k: v for k, v in r.items()
               if v is not None and k not in drop}
        lines.append(json.dumps(
            {"index": {"_index": sink, "_type": type_name}},
            separators=(",", ":")))
        lines.append(json.dumps(doc, separators=(",", ":"), default=str))
    return "\n".join(lines) + ("\n" if lines else "")


def write_es_bulk(ds, out_root: str, type_name: str = "logs"):
    """Write the dataset as gzipped ES ``_bulk`` NDJSON files (the
    reference gzips each bulk POST body, elasticsearch.go:165-170) —
    one file per executing batch, atomic rename, written inside the map
    task so nothing funnels through the driver. Returns the lazy
    per-file summary dataset; count() it to execute."""
    os.makedirs(out_root, exist_ok=True)

    def write_batch(batch: pa.Table) -> pa.Table:
        import gzip
        import uuid

        payload = es_bulk_payload(batch, type_name)
        name = f"bulk-{uuid.uuid4().hex}.ndjson.gz"
        fd, tmp = tempfile.mkstemp(dir=out_root, suffix=".btmp")
        os.close(fd)
        with gzip.open(tmp, "wb") as f:
            f.write(payload.encode("utf-8"))
        os.rename(tmp, os.path.join(out_root, name))
        # exact: every doc is one action line + one doc line (counting
        # '{"index"' substrings overcounts docs whose first field is
        # literally named "index")
        n_docs = payload.count("\n") // 2
        return pa.table({"file": pa.array([name], type=pa.string()),
                         "docs": pa.array([n_docs], type=pa.int64())})

    return ds.map_batches(write_batch, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# fluentd-forward msgpack sink (wire-format parity)
# ---------------------------------------------------------------------------

def _row_records(batch: pa.Table, drop: tuple[str, ...]) -> list[dict]:
    """JSON/msgpack-safe record dicts: null fields and non-wire columns
    omitted, timestamps ISO-formatted (the senders marshal the message
    map, not the engine's columnar internals)."""
    import datetime

    out = []
    for r in batch.to_pylist():
        rec = {}
        for k, v in r.items():
            if v is None or k in drop:
                continue
            if isinstance(v, datetime.datetime):
                v = v.isoformat()
            rec[k] = v
        out.append(rec)
    return out


def fluentd_forward_payload(batch: pa.Table, tag_col: str = "tag",
                            drop: tuple[str, ...] = ("merged_turns",
                                                     "extra", "bucket"),
                            ) -> bytes:
    """One fluentd-forward Forward frame per distinct tag:
    ``["tag", [[time, record], ...]]`` — the reference's EncodeBatch
    (library/fluentd.go:50-68; senders/fluentd.go:54-209 sends one such
    batch per flush). Event time is the record's @timestamp as epoch
    seconds when present, else 0 (the reference's receivers likewise
    treat frame time as advisory)."""
    try:
        import msgpack
    except ImportError:  # pragma: no cover - baked into this container
        raise NotImplementedError("msgpack is unavailable")
    import datetime as _dt

    by_tag: dict[str, list] = {}
    for rec in _row_records(batch, drop):
        tag = rec.get(tag_col)
        if tag is None:
            continue
        t = 0
        ts = rec.get("@timestamp")
        if isinstance(ts, str):
            try:
                t = int(_dt.datetime.fromisoformat(
                    ts.rstrip("Z")).timestamp())
            except ValueError:
                t = 0
        by_tag.setdefault(tag, []).append([t, rec])
    out = bytearray()
    for tag in sorted(by_tag):
        out += msgpack.packb([tag, by_tag[tag]], default=str)
    return bytes(out)


def write_fluentd_forward(ds, out_root: str, tag_col: str = "tag"):
    """Write the dataset as fluentd-forward msgpack frame files — one
    file per executing batch, atomic rename, written inside the map
    task (nothing funnels through the driver). The output is readable
    by any fluentd forward consumer AND by this repo's own
    sources.fluentd_frames.read_fluentd_frames (round-trip tested).
    Returns the lazy per-file summary dataset; count() it to execute."""
    os.makedirs(out_root, exist_ok=True)

    def write_batch(batch: pa.Table) -> pa.Table:
        import uuid

        payload = fluentd_forward_payload(batch, tag_col)
        name = f"fwd-{uuid.uuid4().hex}.msgpack"
        fd, tmp = tempfile.mkstemp(dir=out_root, suffix=".ftmp")
        os.close(fd)
        with open(tmp, "wb") as f:
            f.write(payload)
        os.rename(tmp, os.path.join(out_root, name))
        return pa.table({"file": pa.array([name], type=pa.string()),
                         "rows": pa.array([batch.num_rows],
                                          type=pa.int64())})

    return ds.map_batches(write_batch, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# HTTP-forward gzip JSON sink (wire-format parity)
# ---------------------------------------------------------------------------

def http_forward_payload(batch: pa.Table,
                         drop: tuple[str, ...] = ("merged_turns", "extra",
                                                  "bucket")) -> bytes:
    """One gzipped JSON ARRAY of message maps — exactly the body the
    reference's HTTPSender POSTs per batch (senders/httpforward.go:
    155-177: JSON.Marshal([]map, Content-encoding: gzip). The reference
    never wires this sender into controllor, but the wire format
    completes §2.6)."""
    import gzip

    return gzip.compress(json.dumps(
        _row_records(batch, drop), separators=(",", ":")).encode("utf-8"))


def write_http_forward(ds, out_root: str):
    """Write the dataset as gzip JSON-array body files (one per
    executing batch = one POST body), atomic rename, inside the map
    task. Returns the lazy per-file summary dataset; count() executes."""
    os.makedirs(out_root, exist_ok=True)

    def write_batch(batch: pa.Table) -> pa.Table:
        import uuid

        payload = http_forward_payload(batch)
        name = f"post-{uuid.uuid4().hex}.json.gz"
        fd, tmp = tempfile.mkstemp(dir=out_root, suffix=".htmp")
        os.close(fd)
        with open(tmp, "wb") as f:
            f.write(payload)
        os.rename(tmp, os.path.join(out_root, name))
        return pa.table({"file": pa.array([name], type=pa.string()),
                         "msgs": pa.array([batch.num_rows],
                                          type=pa.int64())})

    return ds.map_batches(write_batch, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Kafka JSON sink (wire-format parity)
# ---------------------------------------------------------------------------

def kafka_json_payloads(batch: pa.Table, topic_col: str = "sink",
                        drop: tuple[str, ...] = ("merged_turns", "extra",
                                                 "bucket"),
                        ) -> dict[str, str]:
    """Per-topic NDJSON bodies: each routed row JSON-marshalled exactly
    as the reference's KafkaSender produces messages
    (senders/kafka.go:110-150, json.Marshal per msg; the topic is the
    dispatcher's per-tag topic — here the sink column). Rows with no
    topic are skipped (the getMsgStarting error path analogue)."""
    bodies: dict[str, list[str]] = {}
    for rec in _row_records(batch, drop):
        topic = rec.pop(topic_col, None)
        if topic is None:
            continue
        bodies.setdefault(topic, []).append(
            json.dumps(rec, separators=(",", ":"), sort_keys=True))
    return {t: "\n".join(lines) + "\n" for t, lines in bodies.items()}


def write_kafka_json(ds, out_root: str, topic_col: str = "sink"):
    """Write per-topic NDJSON message files (topic=<t>/ directories so
    each topic's consumer reads only its own) — one file per (batch,
    topic), atomic rename, written inside the map task. Returns the
    lazy per-file summary dataset; count() it to execute."""
    os.makedirs(out_root, exist_ok=True)

    def write_batch(batch: pa.Table) -> pa.Table:
        import uuid

        files, topics, counts = [], [], []
        for topic, body in sorted(
                kafka_json_payloads(batch, topic_col).items()):
            d = os.path.join(out_root, f"topic={topic}")
            os.makedirs(d, exist_ok=True)
            name = f"msgs-{uuid.uuid4().hex}.ndjson"
            fd, tmp = tempfile.mkstemp(dir=d, suffix=".ktmp")
            os.close(fd)
            with open(tmp, "w") as f:
                f.write(body)
            os.rename(tmp, os.path.join(d, name))
            files.append(f"topic={topic}/{name}")
            topics.append(topic)
            counts.append(body.count("\n"))
        return pa.table({"file": pa.array(files, type=pa.string()),
                         "topic": pa.array(topics, type=pa.string()),
                         "msgs": pa.array(counts, type=pa.int64())})

    return ds.map_batches(write_batch, batch_format="pyarrow")
