"""Resumable per-partition sink layout — the batch-mode answer to the
reference's WAL/journal + committed-id machinery (journal.go, SURVEY.md
§3.3). Stronger guarantee than the reference's at-least-once: output is
exactly-once-observable.

Layout under ``out_root``:

    bucket=<b>/data.parquet      one file per partition (atomic rename)
    bucket=<b>/_MANIFEST.json    lineage + metrics: row count, per-sink
                                 counts, content md5, input fingerprint
    _METRICS.json                run-level rollup (written by the driver
                                 after all partitions land)

The partition key is the deterministic concat bucket
(hash(conv_id) % B), so a re-run computes exactly the same partition
contents. Resume = skip buckets whose manifest exists; a partition dir
without a manifest (crash mid-write) is recomputed; writes go to a tmp
name then os.rename, so readers never see partial data.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import tempfile

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

MANIFEST = "_MANIFEST.json"
METRICS = "_METRICS.json"


def completed_buckets(out_root: str) -> set[int]:
    done = set()
    if not os.path.isdir(out_root):
        return done
    for name in os.listdir(out_root):
        if name.startswith("bucket=") and os.path.exists(
                os.path.join(out_root, name, MANIFEST)):
            done.add(int(name.split("=", 1)[1]))
    return done


def _write_partition(batch: pa.Table, out_root: str) -> pa.Table:
    """Sink fn for one partition-batch: atomic data + manifest write.
    Emits one summary row per bucket (the lineage/metrics record)."""
    if batch.num_rows == 0:
        return pa.table({"bucket": pa.array([], pa.int32()),
                         "rows": pa.array([], pa.int64()),
                         "md5": pa.array([], pa.string())})
    out_rows = []
    for b in pc.unique(batch["bucket"]).to_pylist():
        part = batch.filter(pc.equal(batch["bucket"], b))
        # deterministic row order inside the partition file
        part = part.take(pc.sort_indices(
            part, sort_keys=[("conv_id", "ascending"),
                             ("turn_idx", "ascending")]))
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
            "inputs_merged": pc.sum(part["n_merged"]).as_py(),
            "per_sink": sink_counts,
            "md5": md5,
        }
        mfd, mtmp = tempfile.mkstemp(dir=d, suffix=".mtmp")
        os.close(mfd)
        with open(mtmp, "w") as f:
            json.dump(manifest, f)
        os.rename(mtmp, os.path.join(d, MANIFEST))
        out_rows.append((int(b), part.num_rows, md5))
    return pa.table({
        "bucket": pa.array([r[0] for r in out_rows], pa.int32()),
        "rows": pa.array([r[1] for r in out_rows], pa.int64()),
        "md5": pa.array([r[2] for r in out_rows], pa.string()),
    })


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
    before any parse/shuffle work."""
    import ray.data  # noqa: F401

    from ..config import DEFAULT_CONFIG
    from ..pipelines import flagship
    from .acceptor import acceptor_transform
    from .concat import add_bucket, concat_bucket

    cfg = cfg or DEFAULT_CONFIG
    B = num_buckets or flagship.default_num_buckets()
    done = completed_buckets(out_root)
    os.makedirs(out_root, exist_ok=True)
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
    ds = ds.groupby("bucket").map_groups(
        lambda df: concat_bucket(df, cfg, keep_bucket=True),
        batch_format="pandas")
    ds = ds.map_batches(flagship.Finisher, fn_constructor_args=(cfg,),
                        batch_format="pyarrow", zero_copy_batch=True,
                        concurrency=max(2, flagship._cluster_cpus() // 2))
    summary = ds.map_batches(lambda t: _write_partition(t, out_root),
                             batch_format="pyarrow").to_pandas()

    # run-level metrics rollup from the per-partition manifests
    manifests = []
    for b in completed_buckets(out_root):
        with open(os.path.join(out_root, f"bucket={b}", MANIFEST)) as f:
            manifests.append(json.load(f))
    per_sink: dict[str, int] = {}
    for m in manifests:
        for s, n in m["per_sink"].items():
            per_sink[s] = per_sink.get(s, 0) + n
    metrics = {
        "partitions": len(manifests),
        "partitions_written_this_run": int(len(summary)),
        "rows": int(sum(m["rows"] for m in manifests)),
        "inputs_merged": int(sum(m["inputs_merged"] for m in manifests)),
        "per_sink": dict(sorted(per_sink.items())),
    }
    with open(os.path.join(out_root, METRICS), "w") as f:
        json.dump(metrics, f, indent=1)
    return metrics
