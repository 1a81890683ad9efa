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


# ------------------------------------------------- incremental rate anomalies

RATE_STATE = "_RATE_STATE.json"


def update_rate_anomalies(out_root: str, batch_id: int,
                          window_sec: int = 60, trail: int = 12,
                          z_thresh: float = 3.0,
                          tag_col: str = "role") -> list[dict]:
    """Streaming-monitoring over increments: fold the (tag, tumbling
    window) counts of ONE ingest batch into persistent state, then
    re-score z against the trailing observed windows — the alerting
    pass a scheduler runs after each run_incremental.

    The heavy work (counting the batch's rows) is incremental and
    skinny (one columnar read of tag+ts per batch file); the state is
    tags × observed-windows small, so scoring is a driver-side numpy
    pass. Because merged state counts equal full-corpus counts, the
    emitted anomalies are IDENTICAL to logops.rate_anomaly over the
    union of all batches (asserted in tests) — incremental operation
    changes when work happens, never the answer.

    Returns the anomaly rows (tag, window_us, n, z) of the full state
    after the fold.
    """
    import math

    import numpy as np
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    win_us = window_sec * 1_000_000
    sp = os.path.join(out_root, RATE_STATE)
    state: dict = {}
    if os.path.exists(sp):
        with open(sp) as f:
            state = json.load(f)

    import pandas as pd

    for f in glob.glob(os.path.join(out_root, f"ingest={batch_id}",
                                    "*.parquet")):
        t = pq.read_table(f, columns=[tag_col, "ts"])
        ts = pc.cast(pc.cast(t["ts"], "timestamp[us]"),
                     "int64").to_numpy(zero_copy_only=False)
        win = (ts // win_us) * win_us
        counts = (pd.DataFrame({"tag": t[tag_col].to_pylist(),
                                "w": win})
                  .groupby(["tag", "w"], sort=False).size())
        # fold distinct (tag, window) pairs only — never per row
        for (tag, w), cnt in counts.items():
            d = state.setdefault(tag, {})
            k = str(int(w))
            d[k] = d.get(k, 0) + int(cnt)

    fd, tmp = tempfile.mkstemp(dir=out_root, suffix=".rtmp")
    os.close(fd)
    with open(tmp, "w") as f:
        json.dump(state, f)
    os.rename(tmp, sp)

    # score: identical integer trailing sums + float op order as
    # logops.rate_anomaly / its SQL twin
    out = []
    for tag, d in state.items():
        wins = np.array(sorted(int(k) for k in d), dtype=np.int64)
        n = np.array([d[str(w)] for w in wins], dtype=np.int64)
        if len(n) <= trail:
            continue
        c = np.concatenate([[0], np.cumsum(n)])
        c2 = np.concatenate([[0], np.cumsum(n * n)])
        for i in range(trail, len(n)):
            s1 = int(c[i] - c[i - trail])
            s2 = int(c2[i] - c2[i - trail])
            if trail * s2 <= s1 * s1:
                continue
            var = (float(s2) - float(s1) * float(s1) / float(trail)) \
                / float(trail - 1)
            # math.sqrt, not **0.5: pow can differ from sqrt by one
            # ULP and break bit-parity with rate_anomaly / the SQL twin
            z = (float(n[i]) - float(s1) / float(trail)) \
                / math.sqrt(var)
            if abs(z) >= z_thresh:
                out.append({"tag": tag, "window_us": int(wins[i]),
                            "n": int(n[i]), "z": z})
    return sorted(out, key=lambda r: (r["tag"], r["window_us"]))
