"""Incremental (continuous-operation) ingest — the batch analogue of
the reference's journal tailing (library/journal, docs/README_cn.md
journal section): a production corpus GROWS (a new parquet file lands
per upstream rotation), and each `run_incremental` invocation
processes ONLY the files no previous run has ingested, appending one
`ingest=NNN/` output batch and updating cumulative per-sink counters.

Exactly-once at FILE granularity:
- `_INGESTED.json` records every ingested file per batch; it is
  written via tmp+rename AFTER the batch's output directory is fully
  materialized (itself a tmp-dir rename, so a partially-written batch
  is never visible under its final name);
- a crash between the output rename and the state write leaves a
  batch directory that no state entry claims — the next run deletes
  it and re-processes those files (at-least-once work, exactly-once
  OBSERVABLE output, the run_resumable convention);
- re-running with no new files is a no-op.

Concat semantics under increments: multi-line joining runs WITHIN an
ingest batch. This mirrors the reference stream exactly — its
concator flushes pending partials on a timeout (concator_f.go), so
fragments of one logical record arriving in different ingest windows
do NOT merge there either. The documented operating assumption is the
same as the reference's: upstream rotation keeps one record's
fragments in one file/window.

Scale design: each increment is ONE flagship pipeline over just the
new files (sized read over that file subset); per-sink counters come
from a skinny re-read of the batch's own output (sink column only) so
no second full pipeline execution happens.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import tempfile

INGESTED = "_INGESTED.json"


def _load_state(out_root: str) -> dict:
    p = os.path.join(out_root, INGESTED)
    if os.path.exists(p):
        with open(p) as f:
            return json.load(f)
    return {"batches": []}


def _save_state(out_root: str, state: dict) -> None:
    fd, tmp = tempfile.mkstemp(dir=out_root, suffix=".stmp")
    os.close(fd)
    with open(tmp, "w") as f:
        json.dump(state, f)
    os.rename(tmp, os.path.join(out_root, INGESTED))


def run_incremental(corpus_path: str, out_root: str, cfg=None,
                    num_buckets: int | None = None) -> dict:
    """Process files of ``corpus_path`` not ingested by any previous
    run into ``out_root``; returns cumulative metrics."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    import ray.data as rd

    from ..config import DEFAULT_CONFIG
    from ..io_util import sized_read_parquet
    from ..pipelines import flagship

    cfg = cfg or DEFAULT_CONFIG
    os.makedirs(out_root, exist_ok=True)
    state = _load_state(out_root)
    claimed = {f for b in state["batches"] for f in b["files"]}
    known_ids = {b["id"] for b in state["batches"]}

    # crash cleanup: batch dirs no state entry claims are invisible
    # work from a died run — delete and let their files re-process
    for d in glob.glob(os.path.join(out_root, "ingest=*")):
        bid = int(os.path.basename(d).split("=", 1)[1])
        if bid not in known_ids:
            shutil.rmtree(d)

    files = sorted(os.path.basename(f) for f in glob.glob(
        os.path.join(corpus_path, "*.parquet")))
    new = [f for f in files if f not in claimed]

    rows_this_run = 0
    if new:
        bid = max(known_ids) + 1 if known_ids else 0
        paths = [os.path.join(corpus_path, f) for f in new]
        total = sum(os.path.getsize(p) for p in paths)
        # sized read over just the new files (the flagship read rule)
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 8)) \
            if ray.is_initialized() else 8
        nblocks = int(max(cpus, total // (32 << 20))) or 1
        ds = rd.read_parquet(paths, override_num_blocks=nblocks)
        pipe = flagship.build_pipeline(ds, cfg,
                                       num_buckets=num_buckets)
        pipe = pipe.drop_columns(["merged_turns", "extra"])
        tmpdir = tempfile.mkdtemp(dir=out_root, prefix=".ingest-tmp-")
        pipe.write_parquet(tmpdir)
        final = os.path.join(out_root, f"ingest={bid}")
        os.rename(tmpdir, final)
        # per-sink counters from a skinny re-read of the batch output
        per_sink: dict[str, int] = {}
        for f in glob.glob(os.path.join(final, "*.parquet")):
            t = pq.read_table(f, columns=["sink"])
            rows_this_run += t.num_rows
            for s in pc.unique(t["sink"]).to_pylist():
                per_sink[s] = per_sink.get(s, 0) + pc.sum(
                    pc.cast(pc.equal(t["sink"], s),
                            "int64")).as_py()
        state["batches"].append({"id": bid, "files": new,
                                 "rows": rows_this_run,
                                 "per_sink": per_sink})
        _save_state(out_root, state)

    totals: dict[str, int] = {}
    for b in state["batches"]:
        for s, n in b["per_sink"].items():
            totals[s] = totals.get(s, 0) + n
    metrics = {
        "batches": len(state["batches"]),
        "files_total": sum(len(b["files"]) for b in state["batches"]),
        "new_files_this_run": len(new),
        "rows_this_run": rows_this_run,
        "rows_total": sum(b["rows"] for b in state["batches"]),
        "per_sink_total": totals,
    }
    with open(os.path.join(out_root, "_METRICS.json"), "w") as f:
        json.dump(metrics, f)
    return metrics
