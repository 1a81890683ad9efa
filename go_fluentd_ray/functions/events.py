"""Event-stream operators over the events table
(event_id, ts, user_id, event_type, value, props-json).

Stream-shaped semantics in batch form (guide: treat the input as an
ordered, partitioned log): JSON prop extraction, tumbling-window
aggregation with per-batch pre-aggregation (combiner before the
shuffle), and gap-based sessionization via groupby(user).map_groups
over ts-sorted groups.
"""

from __future__ import annotations

import json

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def parse_props_batch(batch: pa.Table) -> pa.Table:
    """Lift props JSON key 'k' to an int column (real json.loads — the
    reference's embedded-JSON semantics, parser_f.go:74-107)."""
    ks = []
    for p in batch["props"].to_pylist():
        try:
            ks.append(int(json.loads(p).get("k")))
        except (ValueError, TypeError):
            ks.append(None)
    return batch.append_column("k", pa.array(ks, type=pa.int64()))


def hourly_partial(batch: pa.Table) -> pa.Table:
    """Combiner: per-batch partial sums per (event_type, hour)."""
    t = batch
    hour = pc.floor_temporal(t["ts"], unit="hour")
    df = pa.table({
        "event_type": t["event_type"], "hour": hour,
        "value": t["value"], "k": t["k"],
    }).to_pandas()
    g = (df.groupby(["event_type", "hour"], sort=False)
         .agg(n=("value", "size"), sum_value=("value", "sum"),
              # min_count=1: an all-null group sums to null (SQL
              # semantics), not 0.0 (review finding)
              sum_k=("k", lambda s: s.sum(min_count=1)))
         .reset_index())
    return pa.Table.from_pandas(g, preserve_index=False)


def events_hourly(ds):
    """Tumbling 1h window counts/sums per event_type (pre-aggregated)."""
    from ray.data.aggregate import Sum

    ds = ds.map_batches(parse_props_batch, batch_format="pyarrow",
                        zero_copy_batch=True)
    ds = ds.map_batches(hourly_partial, batch_format="pyarrow")
    out = ds.groupby(["event_type", "hour"]).aggregate(
        Sum("n", alias_name="n"),
        Sum("sum_value", alias_name="sum_value"),
        Sum("sum_k", alias_name="sum_k"))

    def finish(batch: pa.Table) -> pa.Table:
        return batch.set_column(
            batch.column_names.index("sum_value"), "sum_value",
            pc.round(batch["sum_value"], ndigits=6)).set_column(
            batch.column_names.index("n"), "n",
            pc.cast(batch["n"], pa.int64()))

    return out.map_batches(finish, batch_format="pyarrow")


EVENTS_HOURLY_SQL = """
SELECT event_type, date_trunc('hour', ts) AS hour,
       count(*)::BIGINT AS n,
       round(sum(value), 6) AS sum_value,
       sum(CAST(json_extract(props, '$.k') AS BIGINT))::BIGINT AS sum_k
FROM events GROUP BY 1, 2
"""

def sliding_3h(ds):
    """Sliding-window aggregate: per event_type, for each hour h, the
    event count over [h-2h, h] (3 hourly buckets). Two-stage: the
    tumbling hourly partials (cheap shuffle on (event_type, hour)) then
    a per-type rolling sum over the sorted hour series — the window
    never touches raw rows after the first pre-aggregation."""
    import pandas as pd

    hourly = events_hourly(ds)

    def roll(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("hour")
        idx = pd.DatetimeIndex(g["hour"])
        s = pd.Series(g["n"].to_numpy(), index=idx)
        # count over the 3 bucket-hours ending at each hour
        out = pd.DataFrame({
            "event_type": g["event_type"].iloc[0],
            "hour": idx,
            "n_3h": s.rolling("3h").sum().to_numpy().astype("int64"),
        })
        return out

    return hourly.groupby("event_type").map_groups(roll, batch_format="pandas")


SLIDING_3H_SQL = """
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS hour, count(*)::BIGINT AS n
  FROM events GROUP BY 1, 2
)
SELECT event_type, hour,
       SUM(n) OVER (PARTITION BY event_type ORDER BY hour
                    RANGE BETWEEN INTERVAL 2 HOUR PRECEDING
                          AND CURRENT ROW)::BIGINT AS n_3h
FROM hourly
"""

def running_totals(ds, num_buckets: int | None = None):
    """Per-user running cumulative sum of value, ordered by (ts,
    event_id) — the stream-shaped 'state per key over an ordered log'.

    Scale shape: groupby(hash(user_id) % B) — ONE vectorized pandas
    call per bucket (groupby-cumsum inside), not one Python call per
    user (millions of tiny groups at real user cardinality; the concat
    stage's documented failure mode). The partitioning assumption is
    only that one user's rows co-locate, guaranteed by the hash."""
    from .shuffle import add_bucket_col, default_buckets

    B = num_buckets or default_buckets()

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        v = df["value"]
        u = df["user_id"]
        # SQL running-SUM semantics under NULLs: skip nulls but carry
        # the total forward; all-null prefix -> NULL (not 0)
        cs = v.fillna(0.0).groupby(u, sort=False).cumsum()
        seen_any = v.notna().groupby(u, sort=False).cummax()
        running = np.round(cs.to_numpy(), 6)
        running = np.where(seen_any.to_numpy(), running, np.nan)
        return pd.DataFrame({
            "event_id": df["event_id"].to_numpy(),
            "user_id": u.to_numpy(),
            "running_value": running,
            "running_n": (df.groupby("user_id", sort=False).cumcount()
                          .to_numpy() + 1).astype(np.int64),
        })

    ds = ds.map_batches(lambda t: add_bucket_col(t, ["user_id"], B),
                        batch_format="pyarrow", zero_copy_batch=True)
    return ds.groupby("__bkt").map_groups(per_bucket, batch_format="pandas")


RUNNING_TOTALS_SQL = """
SELECT event_id, user_id,
       round(SUM(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING), 6) AS running_value,
       COUNT(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS UNBOUNDED PRECEDING)::BIGINT AS running_n
FROM events
"""

SESSION_GAP_MIN = 30


def sessionize_bucket(df: pd.DataFrame) -> pd.DataFrame:
    """One hash bucket of users -> sessions split at >30 min gaps.
    Fully vectorized: per-user diffs/cumsums via pandas groupby
    transforms, session bounds via one grouped aggregate."""
    df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
    u = df["user_id"]
    gap = (df.groupby("user_id", sort=False)["ts"].diff()
           > pd.Timedelta(minutes=SESSION_GAP_MIN))
    sid = gap.groupby(u, sort=False).cumsum().astype(np.int64)
    g = df.groupby([u, sid], sort=True)
    agg = g.agg(session_start=("ts", "min"), session_end=("ts", "max"),
                n_events=("ts", "size"))
    agg.index.names = ["user_id", "session_idx"]
    out = agg.reset_index()
    out["n_events"] = out["n_events"].astype(np.int64)
    out["duration_sec"] = (
        (out["session_end"] - out["session_start"]).dt.total_seconds())
    return out


def sessionize(ds, num_buckets: int | None = None):
    """Gap-based sessions per user. Bucketed by hash(user_id) % B with
    one vectorized call per bucket (not one Python call per user);
    the documented partitioning assumption is user co-location."""
    from .shuffle import add_bucket_col, default_buckets

    B = num_buckets or default_buckets()
    ds = ds.map_batches(lambda t: add_bucket_col(t, ["user_id"], B),
                        batch_format="pyarrow", zero_copy_batch=True)
    return ds.groupby("__bkt").map_groups(
        sessionize_bucket, batch_format="pandas")


SESSIONIZE_SQL = """
WITH g AS (
  SELECT user_id, ts, event_id,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id)
                   > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk
  FROM events
), s AS (
  SELECT user_id, ts,
         SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) AS sid
  FROM g
)
SELECT user_id, sid::BIGINT AS session_idx,
       min(ts) AS session_start, max(ts) AS session_end,
       count(*)::BIGINT AS n_events,
       date_part('epoch', max(ts) - min(ts)) AS duration_sec
FROM s GROUP BY user_id, sid
"""
