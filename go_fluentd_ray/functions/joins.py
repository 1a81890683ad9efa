"""Join operators (SURVEY.md §2.7: the reference only ever does
broadcast-small-side dict lookups; these add the join shapes a
training-data pipeline needs, each with the guide's recommended
partitioning):

- as-of join: backward as-of via hash(user_id) % B buckets, ONE
  vectorized ``pd.merge_asof(by=key)`` per bucket — the documented
  partitioning assumption is that one key's rows co-locate.
- broadcast dimension join: ray.put the small side once, map-side
  hash lookup per batch (no shuffle at all).
- large-large equi-join: Ray's native hash ``Dataset.join``
  (both sides hash-partitioned; neither side is ever broadcast or
  gathered), used by the TPC-H-Q3-shaped ``order_revenue_topn`` and
  the anti-join ``customers_without_orders``. The aggregate-THEN-join
  ordering keeps everything after the first shuffle skinny.
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

    from .similarity import scan_pool

    return events_ds.map_batches(Join, batch_format="pandas",
                                 concurrency=scan_pool())


DIM_JOIN_SQL = """
SELECT e.event_id, e.user_id, e.event_type, c.c_name
FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
"""


def _join_partitions(approx_bytes: int | None = None,
                     per_partition: int = 128 << 20) -> int:
    """Hash-join partition count. Each partition costs a live
    aggregator actor, so small inputs want FEW partitions (measured at
    600k rows: P=8 is 2.1x faster than P=32 — actor spawn dominates);
    large inputs want one per ~128 MB so a partition's build side fits
    a worker heap and spills independently. Without a size hint,
    default to cpus/4 (bounded fixed cost, still parallel)."""
    import ray

    cpus = (int(ray.cluster_resources().get("CPU", 8))
            if ray.is_initialized() else 8)
    if approx_bytes:
        return int(min(max(2, approx_bytes // per_partition), cpus * 4))
    return max(2, cpus // 4)


def order_revenue_topn(lineitem_ds, orders_ds, customer_ds,
                       segment: str = "BUILDING",
                       cutoff: str = "1995-03-15", n: int = 10,
                       num_partitions: int | None = None,
                       approx_bytes: int | None = None):
    """TPC-H-Q3-shaped top-N: the N highest-revenue orders not yet
    shipped by ``cutoff`` for one customer market segment.

    Scale shape (all three inputs may be arbitrarily large — nothing
    is broadcast or gathered):
    1. lineitem is filtered map-side and pre-aggregated to revenue per
       l_orderkey (per-batch combiner, then ONE groupby sum) — the
       join's left side carries two columns per distinct order, never
       raw line items.
    2. orders is filtered map-side, then semi-joined to the segment's
       customers with Ray's native hash join (``left_semi``) — the
       distributed alternative to broadcasting the custkey set, which
       at 100 TB may not fit one worker.
    3. skinny-revenue ⋈ filtered-orders via native hash ``Dataset.join``
       (inner) — both sides hash-partitioned on the order key.
    4. top-N: per-block local top-N partials, then one final top-N over
       ≤ n·blocks rows — no full sort.

    Revenue is rounded to 4 decimals BEFORE ranking so the Ray and
    DuckDB tie-break orders agree (ties then break on l_orderkey)."""
    import pyarrow.compute as pc

    from .shuffle import add_bucket_col, default_buckets

    P = num_partitions or _join_partitions(approx_bytes)
    cut = pa.scalar(cutoff).cast(pa.timestamp("us"))

    def li_partial(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.greater(batch["l_shipdate"], cut))
        rev = pc.multiply(batch["l_extendedprice"],
                          pc.subtract(pa.scalar(1.0), batch["l_discount"]))
        df = (pa.table({"l_orderkey": batch["l_orderkey"], "rev": rev})
              .to_pandas().groupby("l_orderkey", sort=False)["rev"]
              .sum().reset_index())
        return pa.Table.from_pandas(df, preserve_index=False)

    # exact per-order sums via the bucketed map_groups pattern, NOT
    # Dataset.aggregate: the sort-based aggregate over the distinct-
    # order key space measured 15.9 s of this query's 19.8 s wall at
    # sf1 (1.47M keys) — the same high-cardinality hazard bm25/drift/
    # ngrams already route around. An order's partials all land in one
    # hash(l_orderkey) bucket, so the bucket sums are exact.
    B = default_buckets()

    def li_bucket_sum(tbl: pa.Table) -> pa.Table:
        df = tbl.to_pandas()
        g = (df.groupby("l_orderkey", sort=False)["rev"].sum()
             .reset_index())
        return pa.table({
            "l_orderkey": pa.array(g["l_orderkey"].to_numpy(),
                                   type=pa.int64()),
            "revenue": pa.array(g["rev"].to_numpy(),
                                type=pa.float64())})

    li = (lineitem_ds.map_batches(li_partial, batch_format="pyarrow",
                                  zero_copy_batch=True)
          .map_batches(lambda t: add_bucket_col(t, ["l_orderkey"], B),
                       batch_format="pyarrow")
          .groupby("__bkt")
          .map_groups(li_bucket_sum, batch_format="pyarrow"))

    # replace_schema_metadata(None): parquet pandas-metadata dicts make
    # Ray's hash-shuffle schema dedup log warnings on every aggregator
    def o_filter(batch: pa.Table) -> pa.Table:
        return (batch.filter(pc.less(batch["o_orderdate"], cut))
                .replace_schema_metadata(None))

    def c_filter(batch: pa.Table) -> pa.Table:
        return (batch.filter(pc.equal(batch["c_mktsegment"],
                                      pa.scalar(segment)))
                .replace_schema_metadata(None))

    orders_f = orders_ds.map_batches(o_filter, batch_format="pyarrow",
                                     zero_copy_batch=True)
    cust_f = customer_ds.map_batches(c_filter, batch_format="pyarrow",
                                     zero_copy_batch=True)
    orders_seg = orders_f.join(cust_f, join_type="left_semi",
                               num_partitions=P, on=("o_custkey",),
                               right_on=("c_custkey",))
    joined = li.join(orders_seg, join_type="inner", num_partitions=P,
                     on=("l_orderkey",), right_on=("o_orderkey",))

    def local_topn(df: pd.DataFrame) -> pd.DataFrame:
        df = df[["l_orderkey", "revenue", "o_orderdate",
                 "o_orderpriority"]].copy()
        df["revenue"] = df["revenue"].round(4)
        return df.sort_values(["revenue", "l_orderkey"],
                              ascending=[False, True],
                              kind="mergesort").head(n)

    return (joined.map_batches(local_topn, batch_format="pandas")
            .repartition(1)
            .map_batches(local_topn, batch_format="pandas"))


ORDER_REVENUE_TOPN_SQL = """
SELECT l.l_orderkey,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue,
       o.o_orderdate, o.o_orderpriority
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1995-03-15'
  AND l.l_shipdate  > TIMESTAMP '1995-03-15'
GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY revenue DESC, l.l_orderkey
LIMIT 10
"""


def customers_without_orders(customer_ds, orders_ds,
                             since: str = "1998-06-01",
                             num_partitions: int | None = None,
                             approx_bytes: int | None = None):
    """Customers with no order on/after ``since``, counted per market
    segment — the distributed anti-join shape (audits: records with no
    match in a second large table). The date filter keeps the result
    non-degenerate on TPC-H-ish data, where every customer has SOME
    order.

    Scale shape: orders is filtered and pruned to its key column
    map-side, then Ray's native hash ``left_anti`` join (both sides
    hash-partitioned on the key), then a per-batch count partial +
    tiny groupby. The bucketed broadcast alternative for a SMALL right
    key set is ``shuffle.bucketed_anti_join``."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    P = num_partitions or _join_partitions(approx_bytes)
    cut = pa.scalar(since).cast(pa.timestamp("us"))

    def o_recent(batch: pa.Table) -> pa.Table:
        return (batch.filter(pc.greater_equal(batch["o_orderdate"], cut))
                .select(["o_custkey"]).replace_schema_metadata(None))

    recent = orders_ds.map_batches(o_recent, batch_format="pyarrow",
                                   zero_copy_batch=True)
    cust = customer_ds.map_batches(
        lambda b: b.replace_schema_metadata(None),
        batch_format="pyarrow", zero_copy_batch=True)
    anti = cust.join(recent, join_type="left_anti",
                     num_partitions=P, on=("c_custkey",),
                     right_on=("o_custkey",))

    def partial(batch: pa.Table) -> pa.Table:
        df = (batch.select(["c_mktsegment"]).to_pandas()
              .groupby("c_mktsegment", sort=False).size()
              .rename("n_customers").reset_index())
        return pa.Table.from_pandas(df, preserve_index=False)

    def finish(batch: pa.Table) -> pa.Table:
        i = batch.column_names.index("n_customers")
        return batch.set_column(i, "n_customers",
                                batch["n_customers"].cast(pa.int64()))

    return (anti.map_batches(partial, batch_format="pyarrow")
            .groupby("c_mktsegment")
            .aggregate(Sum("n_customers", alias_name="n_customers"))
            .map_batches(finish, batch_format="pyarrow"))


CUSTOMERS_WITHOUT_ORDERS_SQL = """
SELECT c_mktsegment, count(*)::BIGINT AS n_customers
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderdate >= TIMESTAMP '1998-06-01')
GROUP BY c_mktsegment
"""
