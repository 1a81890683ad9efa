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
