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

import contextlib
import glob
import json
import os
import shutil
import tempfile
import time
import uuid

INGESTED = "_INGESTED.json"
LEASE = "_LEASE.json"


class LeaseHeldError(TimeoutError):
    """Another live run holds the ingest lease on this out_root."""


@contextlib.contextmanager
def ingest_lease(out_root: str, ttl_sec: float = 900.0,
                 timeout_sec: float | None = 600.0,
                 poll_sec: float = 0.05):
    """Single-writer lease over an out_root — the analogue of the
    reference journal's directory lock (library/journal holds one
    writer per journal dir): two concurrent ``run_incremental``
    invocations on one out_root would otherwise both read the same
    state and both claim the same new files.

    Mechanics (single shared filesystem, the same assumption the state
    file already makes):
    - acquire = ``O_CREAT|O_EXCL`` create of ``_LEASE.json`` holding a
      unique token — atomic on POSIX, exactly one creator wins;
    - a waiter polls; when the lease file's mtime is older than
      ``ttl_sec`` the holder is presumed dead (staleness takeover):
      the waiter unlinks the stale file (ENOENT = another waiter beat
      us, fine) and re-races the O_EXCL create — at most one waiter
      wins the re-create, so takeover is itself race-safe;
    - release unlinks only if the file still holds OUR token, so a
      holder that overran its ttl and was taken over never deletes
      the new holder's lease.

    ttl_sec must exceed the expected ingest wall time; the holder
    refreshes the lease mtime after the heavy pipeline write so a
    long-but-live run is not taken over mid-state-update.

    Yields the lease path (holders may ``os.utime`` it to heartbeat).
    Raises LeaseHeldError if the lease stays held past ``timeout_sec``
    (None = wait forever).
    """
    path = os.path.join(out_root, LEASE)
    token = uuid.uuid4().hex
    deadline = None if timeout_sec is None else \
        time.monotonic() + timeout_sec
    while True:
        try:
            fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            with os.fdopen(fd, "w") as f:
                json.dump({"token": token, "pid": os.getpid(),
                           "acquired_unix": time.time()}, f)
            break
        except FileExistsError:
            try:
                st = os.stat(path)
            except FileNotFoundError:
                continue  # holder just released — re-race the create
            if time.time() - st.st_mtime > ttl_sec:
                with contextlib.suppress(FileNotFoundError):
                    os.unlink(path)  # stale: remove, re-race create
                continue
            if deadline is not None and time.monotonic() > deadline:
                raise LeaseHeldError(
                    f"ingest lease on {out_root} held by a live run "
                    f"(age {time.time() - st.st_mtime:.1f}s < ttl "
                    f"{ttl_sec}s) past timeout {timeout_sec}s")
            time.sleep(poll_sec)
    try:
        yield path
    finally:
        try:
            with open(path) as f:
                if json.load(f).get("token") == token:
                    os.unlink(path)
        except (FileNotFoundError, ValueError):
            pass  # taken over / already gone — nothing of ours to free


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
                    num_buckets: int | None = None,
                    lease_ttl_sec: float = 900.0,
                    lease_timeout_sec: float | None = 600.0) -> dict:
    """Process files of ``corpus_path`` not ingested by any previous
    run into ``out_root``; returns cumulative metrics. The whole run
    executes under the out_root ingest lease, so concurrent
    invocations (e.g. two scheduler ticks overlapping) serialize and
    each file is still ingested exactly once."""
    with ingest_lease(out_root if os.path.isdir(out_root)
                      else _mkroot(out_root),
                      ttl_sec=lease_ttl_sec,
                      timeout_sec=lease_timeout_sec) as lease_path:
        return _run_incremental_locked(corpus_path, out_root, cfg,
                                       num_buckets, lease_path)


def _mkroot(out_root: str) -> str:
    os.makedirs(out_root, exist_ok=True)
    return out_root


def _run_incremental_locked(corpus_path: str, out_root: str, cfg,
                            num_buckets: int | None,
                            lease_path: str) -> dict:
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    import ray.data as rd

    from ..config import DEFAULT_CONFIG
    from ..io_util import sized_read_parquet
    from ..pipelines import flagship

    cfg = cfg or DEFAULT_CONFIG
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
        # heartbeat: the pipeline write is the long pole — refresh the
        # lease so a live-but-slow run is not taken over mid-update
        with contextlib.suppress(FileNotFoundError):
            os.utime(lease_path)
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
