"""Join operators (SURVEY.md §2.7: the reference only ever does
broadcast-small-side dict lookups; these add the join shapes a
training-data pipeline needs, each with the guide's recommended
partitioning):

- as-of join: backward as-of via hash(user_id) % B buckets, ONE
  vectorized ``pd.merge_asof(by=key)`` per bucket — the documented
  partitioning assumption is that one key's rows co-locate.
- broadcast dimension join: ray.put the small side once, map-side
  hash lookup per batch (no shuffle at all).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def asof_signup_lag(events_ds, num_buckets: int | None = None):
    """For every purchase event: the most recent signup (same user) at
    or before it, and the lag in seconds. NULL lag when no prior
    signup. Backward-inclusive semantics == DuckDB ASOF JOIN.

    Scale shape: rows are pruned to the two relevant event types at the
    map side, hash-bucketed on user_id (co-location assumption), and
    each bucket runs ONE vectorized ``pd.merge_asof(..., by="user_id")``
    — not one Python call per user."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from .shuffle import add_bucket_col, default_buckets

    B = num_buckets or default_buckets()

    def prune(batch: pa.Table) -> pa.Table:
        keep = pc.is_in(batch["event_type"],
                        value_set=pa.array(["purchase", "signup"]))
        return add_bucket_col(
            batch.select(["event_id", "user_id", "event_type", "ts"])
            .filter(keep), ["user_id"], B)

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        p = df[df["event_type"] == "purchase"].sort_values(
            ["ts", "event_id"], kind="mergesort")
        s = df[df["event_type"] == "signup"].sort_values(
            ["ts", "event_id"], kind="mergesort")
        if p.empty:
            return pd.DataFrame({
                "event_id": pd.Series(dtype=np.int64),
                "user_id": pd.Series(dtype=np.int64),
                "ts": pd.Series(dtype="datetime64[us]"),
                "signup_ts": pd.Series(dtype="datetime64[us]"),
                "lag_sec": pd.Series(dtype=np.float64),
            })
        m = pd.merge_asof(
            p[["event_id", "user_id", "ts"]],
            s[["user_id", "ts"]].rename(columns={"ts": "signup_ts"}),
            left_on="ts", right_on="signup_ts", by="user_id",
            direction="backward")
        m["lag_sec"] = (m["ts"] - m["signup_ts"]).dt.total_seconds()
        return m

    ds = events_ds.map_batches(prune, batch_format="pyarrow",
                               zero_copy_batch=True)
    return ds.groupby("__bkt").map_groups(per_bucket, batch_format="pandas")


ASOF_SQL = """
SELECT p.event_id, p.user_id, p.ts, s.ts AS signup_ts,
       date_part('epoch', p.ts - s.ts) AS lag_sec
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'signup') s
  ON p.user_id = s.user_id AND p.ts >= s.ts
"""


def broadcast_dim_join(events_ds, dim_df: pd.DataFrame,
                       key: str = "user_id", dim_key: str = "c_custkey",
                       take: tuple[str, ...] = ("c_name",)):
    """Map-side broadcast join: the dimension table ships once via
    ray.put; every batch does a vectorized pandas merge against it.
    Left-join semantics (missing keys -> null)."""
    import ray

    small = dim_df[[dim_key, *take]].rename(columns={dim_key: key})
    ref = ray.put(small)

    class Join:
        def __init__(self):
            self.dim = ray.get(ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            return batch.merge(self.dim, on=key, how="left")

    return events_ds.map_batches(Join, batch_format="pandas", concurrency=2)


DIM_JOIN_SQL = """
SELECT e.event_id, e.user_id, e.event_type, c.c_name
FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
"""
