"""Analytical aggregates beyond the reference's monitoring counters,
built on the pre-aggregation pattern (combine inside map_batches, then
a small groupby — the shuffle moves partials, not rows)."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def word_topk(ds, k: int = 20, col: str = "text"):
    """Heavy hitters: top-k tokens by total count across all documents.
    Stage 1 tokenizes and counts WITHIN each batch (one row per distinct
    word per batch — the mergeable 'sketch'); stage 2 is a small
    groupby-sum; stage 3 a driver-side sort of the tiny result."""

    def partial(batch: pa.Table) -> pa.Table:
        # \w+ extraction == split on runs of non-word chars (same RE2
        # semantics as the oracle's regexp_extract_all) minus empties
        toks = pc.list_flatten(
            pc.split_pattern_regex(batch[col], pattern=r"[^\w]+"))
        toks = toks.filter(pc.not_equal(toks, ""))
        words = pd.Series(toks.to_pylist(), dtype=object)
        g = words.value_counts()
        return pa.table({"word": pa.array(g.index, type=pa.string()),
                         "n": pa.array(g.to_numpy(), type=pa.int64())})

    from ray.data.aggregate import Sum

    agg = ds.map_batches(partial, batch_format="pyarrow",
                         zero_copy_batch=True)
    out = agg.groupby("word").aggregate(Sum("n", alias_name="n")).to_pandas()
    out = out.sort_values(["n", "word"], ascending=[False, True],
                          kind="mergesort").head(k).reset_index(drop=True)
    return out


WORD_TOPK_SQL = r"""
WITH words AS (
  SELECT unnest(regexp_extract_all(text, '\w+')) AS word FROM documents
)
SELECT word, count(*)::BIGINT AS n
FROM words GROUP BY word
ORDER BY n DESC, word LIMIT 20
"""


def distinct_users(ds):
    """Exact distinct count per group with a combiner: per-batch
    drop_duplicates (the shuffle then moves at most one row per
    (event_type, user) per batch), then a small grouped nunique."""

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.select(["event_type", "user_id"]).to_pandas()
        return pa.Table.from_pandas(
            df.drop_duplicates(["event_type", "user_id"]),
            preserve_index=False)

    ds = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)

    def per_group(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "event_type": [df["event_type"].iloc[0]],
            "n_users": [int(df["user_id"].nunique())],
        })

    return ds.groupby("event_type").map_groups(per_group,
                                               batch_format="pandas")


DISTINCT_USERS_SQL = """
SELECT event_type, count(DISTINCT user_id)::BIGINT AS n_users
FROM events GROUP BY event_type
"""


def pricing_summary(ds, cutoff: str = "1998-09-01"):
    """TPC-H-Q1-shaped pricing summary over lineitem: per-batch partial
    sums (the combiner) then a tiny groupby — the shuffle moves a few
    rows per batch, never line items. Column pruning happens at the
    read (caller passes only the needed columns)."""
    import pyarrow.compute as _pc

    def partial(batch: pa.Table) -> pa.Table:
        batch = batch.filter(_pc.less_equal(
            batch["l_shipdate"], pa.scalar(cutoff).cast(pa.timestamp("us"))))
        if batch.num_rows == 0:
            return pa.table({"l_returnflag": pa.array([], pa.string()),
                             "l_linestatus": pa.array([], pa.string()),
                             "sum_qty": pa.array([], pa.float64()),
                             "sum_base": pa.array([], pa.float64()),
                             "sum_disc": pa.array([], pa.float64()),
                             "n": pa.array([], pa.int64())})
        disc_price = _pc.multiply(batch["l_extendedprice"],
                                  _pc.subtract(pa.scalar(1.0),
                                               batch["l_discount"]))
        df = pa.table({
            "l_returnflag": batch["l_returnflag"],
            "l_linestatus": batch["l_linestatus"],
            "qty": batch["l_quantity"],
            "base": batch["l_extendedprice"],
            "disc": disc_price,
        }).to_pandas()
        g = (df.groupby(["l_returnflag", "l_linestatus"], sort=False)
             .agg(sum_qty=("qty", "sum"), sum_base=("base", "sum"),
                  sum_disc=("disc", "sum"), n=("qty", "size"))
             .reset_index())
        return pa.Table.from_pandas(g, preserve_index=False)

    from ray.data.aggregate import Sum

    out = (ds.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby(["l_returnflag", "l_linestatus"])
           .aggregate(Sum("sum_qty", alias_name="sum_qty"),
                      Sum("sum_base", alias_name="sum_base"),
                      Sum("sum_disc", alias_name="sum_disc"),
                      Sum("n", alias_name="n")))

    def finish(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc2

        for c in ("sum_qty", "sum_base", "sum_disc"):
            batch = batch.set_column(
                batch.column_names.index(c), c,
                _pc2.round(batch[c], ndigits=4))
        return batch.set_column(batch.column_names.index("n"), "n",
                                _pc2.cast(batch["n"], pa.int64()))

    return out.map_batches(finish, batch_format="pyarrow")


PRICING_SUMMARY_SQL = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 4) AS sum_qty,
       round(sum(l_extendedprice), 4) AS sum_base,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc,
       count(*)::BIGINT AS n
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-01'
GROUP BY l_returnflag, l_linestatus
"""
