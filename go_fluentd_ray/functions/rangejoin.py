"""Distributed range (interval) join — a non-equi join the Dataset API
has no native operator for (the brief's canonical custom-operator
example alongside the as-of join, joins.py): for every left event,
count right-side events whose timestamp falls within ±window of it.

Algorithm (the classic time-bucketed interval join):
- both sides key by time bucket tb = ts // window;
- the RIGHT side is replicated map-side into buckets tb-1, tb, tb+1
  (every right row lands exactly once in each adjacent bucket, so a
  left row in bucket b sees every right row within ±window exactly
  once — no post-join dedup needed);
- one hash exchange on hash(tb) % B co-locates each bucket's rows;
- inside a bucket the rights are sorted once per tb segment and every
  left's inclusive [ts-W, ts+W] count is two np.searchsorted calls.

Partitioning assumptions (documented per the custom-operator contract):
the per-bucket right side is bounded by 3x the busiest window's rows —
time skew (a hot hour) concentrates work; salt hot tb values with a
secondary hash(right rowid) sub-bucket and merge counts if a single
window outgrows one task. Replication factor is constant (3x of the
skinny (tb, ts) projection, not the full row).

Only skinny projections shuffle: (event_id, tb, ts) for lefts,
(tb, ts) for rights. Output is one row per left event.

SQL twin: a plain `BETWEEN` range join that DuckDB executes with its
IEJoin — identical inclusive bounds at microsecond precision.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

WINDOW_US = 3_600_000_000  # 1 hour in microseconds
LEFT_TYPE = "purchase"
RIGHT_TYPE = "signup"


def range_join_counts(events_ds, window_us: int = WINDOW_US,
                      left_type: str = LEFT_TYPE,
                      right_type: str = RIGHT_TYPE,
                      num_buckets: int | None = None):
    """(event_id, n_nearby) for every `left_type` event: the number of
    `right_type` events (any user) with ts in [ts - W, ts + W]."""
    from .shuffle import default_buckets

    B = num_buckets or default_buckets()
    W = window_us

    def project(batch: pa.Table) -> pa.Table:
        et = batch["event_type"]
        # normalize to microseconds first: a timestamp[ns] input would
        # otherwise cast to nanosecond ints and shrink the window 1000x
        ts = pc.cast(pc.cast(batch["ts"], pa.timestamp("us")),
                     pa.int64()).to_numpy(zero_copy_only=False)
        lm = pc.equal(et, left_type).to_numpy(zero_copy_only=False)
        rm = pc.equal(et, right_type).to_numpy(zero_copy_only=False)
        lts, rts = ts[lm], ts[rm]
        lid = batch["event_id"].to_numpy(zero_copy_only=False)[lm]
        ltb = lts // W
        rtb = rts // W
        # rights replicated into the three adjacent buckets
        tb = np.concatenate([ltb, rtb - 1, rtb, rtb + 1])
        out_ts = np.concatenate([lts, rts, rts, rts])
        eid = np.concatenate([lid, np.full(3 * len(rts), -1,
                                           dtype=np.int64)])
        return pa.table({
            "tb": pa.array(tb, type=pa.int64()),
            "ts": pa.array(out_ts, type=pa.int64()),
            "event_id": pa.array(eid, type=pa.int64()),
            "__bkt": pa.array((tb % B + B) % B, type=pa.int32()),
        })

    def bucket_join(tbl: pa.Table) -> pa.Table:
        tb = tbl["tb"].to_numpy(zero_copy_only=False)
        ts = tbl["ts"].to_numpy(zero_copy_only=False)
        eid = tbl["event_id"].to_numpy(zero_copy_only=False)
        is_l = eid >= 0
        lt_tb, lt_ts, lt_id = tb[is_l], ts[is_l], eid[is_l]
        rt = np.lexsort((ts[~is_l], tb[~is_l]))
        rt_tb, rt_ts = tb[~is_l][rt], ts[~is_l][rt]
        n = np.zeros(len(lt_id), dtype=np.int64)
        # one vectorized pass per distinct tb segment in this bucket
        for b in np.unique(lt_tb):
            lsel = lt_tb == b
            lo, hi = np.searchsorted(rt_tb, [b, b + 1])
            seg = rt_ts[lo:hi]
            t = lt_ts[lsel]
            n[lsel] = (np.searchsorted(seg, t + W, side="right")
                       - np.searchsorted(seg, t - W, side="left"))
        return pa.table({"event_id": pa.array(lt_id, type=pa.int64()),
                         "n_nearby": pa.array(n, type=pa.int64())})

    proj = events_ds.select_columns(
        ["event_id", "ts", "event_type"]).map_batches(
        project, batch_format="pyarrow", zero_copy_batch=True)
    return proj.groupby("__bkt").map_groups(bucket_join,
                                            batch_format="pyarrow")


def range_join_counts_sql(window_us: int = WINDOW_US,
                          left_type: str = LEFT_TYPE,
                          right_type: str = RIGHT_TYPE,
                          table: str = "events") -> str:
    """DuckDB twin: inclusive BETWEEN bounds on integer epoch
    microseconds — identical to the Ray side's int64 arithmetic
    (DuckDB runs this as an IEJoin)."""
    return f"""
SELECT l.event_id, count(r.us)::BIGINT AS n_nearby
FROM (SELECT event_id, epoch_us(ts) AS us FROM {table}
      WHERE event_type = '{left_type}') l
LEFT JOIN (SELECT epoch_us(ts) AS us FROM {table}
           WHERE event_type = '{right_type}') r
  ON r.us BETWEEN l.us - {window_us} AND l.us + {window_us}
GROUP BY l.event_id"""
