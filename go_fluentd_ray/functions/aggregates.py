"""Analytical aggregates beyond the reference's monitoring counters,
built on the pre-aggregation pattern (combine inside map_batches, then
a small groupby — the shuffle moves partials, not rows)."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def word_topk(ds, k: int = 20, col: str = "text",
              num_buckets: int | None = None):
    """Heavy hitters: top-k tokens by total count across all documents.
    Stage 1 tokenizes and counts WITHIN each batch (one row per distinct
    word per batch — the mergeable 'sketch'); stage 2 buckets the
    partials by hash(word) % B and takes an EXACT per-bucket sum +
    local top-k (exact because every occurrence of a word lands in one
    bucket); stage 3 merges the B x k survivors on the driver. The
    driver never sees the distinct-word table — at 100 TB that table
    (with noise/typos) is billions of rows, while B x k stays tiny."""
    from .shuffle import add_bucket_col, default_buckets

    B = num_buckets or default_buckets()

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

    def bucket_topk(tbl: pa.Table) -> pa.Table:
        df = tbl.to_pandas()  # (word, n) non-null -> exact conversion
        g = df.groupby("word", sort=False)["n"].sum().reset_index()
        g = g.sort_values(["n", "word"], ascending=[False, True],
                          kind="mergesort").head(k)
        return pa.table({"word": pa.array(g["word"], type=pa.string()),
                         "n": pa.array(g["n"].to_numpy(), type=pa.int64())})

    agg = ds.map_batches(partial, batch_format="pyarrow",
                         zero_copy_batch=True)
    agg = agg.map_batches(lambda t: add_bucket_col(t, ["word"], B),
                          batch_format="pyarrow")
    out = agg.groupby("__bkt").map_groups(
        bucket_topk, batch_format="pyarrow").to_pandas()  # <= B*k rows
    out = out.sort_values(["n", "word"], ascending=[False, True],
                          kind="mergesort").head(k).reset_index(drop=True)
    return out[["word", "n"]]


WORD_TOPK_SQL = r"""
WITH words AS (
  SELECT unnest(regexp_extract_all(text, '\w+')) AS word FROM documents
)
SELECT word, count(*)::BIGINT AS n
FROM words GROUP BY word
ORDER BY n DESC, word LIMIT 20
"""


def distinct_users(ds, num_buckets: int | None = None):
    """Exact distinct count per group, two-level: per-batch
    drop_duplicates combiner, then per-BUCKET (hash(user) % B) distinct
    counts per type, then a per-type Sum of the tiny bucket partials.
    A user lives in exactly one bucket, so the bucket counts are
    disjoint and their sum is the exact distinct count — and no single
    task ever gathers ALL users of one hot event_type (the failure mode
    of groupby(event_type).map_groups at real scale)."""
    from ray.data.aggregate import Sum

    from .shuffle import add_bucket_col, default_buckets

    B = num_buckets or default_buckets()

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.select(["event_type", "user_id"]).to_pandas()
        t = pa.Table.from_pandas(
            df.drop_duplicates(["event_type", "user_id"]),
            preserve_index=False)
        return add_bucket_col(t, ["user_id"], B)

    ds = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)

    def bucket_counts(tbl: pa.Table) -> pa.Table:
        df = tbl.to_pandas().drop_duplicates(["event_type", "user_id"])
        g = (df.groupby("event_type", sort=False).size()
             .rename("n_users").reset_index())
        return pa.table({
            "event_type": pa.array(g["event_type"], type=pa.string()),
            "n_users": pa.array(g["n_users"].to_numpy(), type=pa.int64()),
        })

    part = ds.groupby("__bkt").map_groups(bucket_counts,
                                          batch_format="pyarrow")
    return part.groupby("event_type").aggregate(
        Sum("n_users", alias_name="n_users"))


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


def corpus_stats(ds):
    """Corpus profiling report per (source, lang) — the summary table a
    training-data pipeline publishes after each curation run: document
    count, char/word totals, and mean quality score. Pre-aggregation
    pattern: one vectorized partial per batch (quality via the same
    pyarrow kernel chain the quality operator uses), then a tiny
    groupby over (source, lang) partials — the shuffle moves a few
    rows per batch, never documents. Mean rounds to 6 dp (float sums
    are order-dependent in the last ulp; the contract is 6-dp stable,
    matching the oracle comparison's own rounding)."""
    from ray.data.aggregate import Sum

    from .text import TOKEN_RE, quality_batch

    def partial(batch: pa.Table) -> pa.Table:
        scored = quality_batch(batch)
        df = pa.table({
            "source": batch["source"],
            "lang": batch["lang"],
            "chars": pc.utf8_length(batch["text"]),
            "words": pc.count_substring_regex(batch["text"], TOKEN_RE),
            "q": scored["quality"],
        }).to_pandas()
        g = (df.groupby(["source", "lang"], sort=False)
             .agg(docs=("q", "size"), chars=("chars", "sum"),
                  words=("words", "sum"), sum_q=("q", "sum"))
             .reset_index())
        return pa.Table.from_pandas(g, preserve_index=False)

    out = (ds.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby(["source", "lang"])
           .aggregate(Sum("docs", alias_name="docs"),
                      Sum("chars", alias_name="chars"),
                      Sum("words", alias_name="words"),
                      Sum("sum_q", alias_name="sum_q")))

    def finish(batch: pa.Table) -> pa.Table:
        mean_q = pc.round(pc.divide(batch["sum_q"],
                                    pc.cast(batch["docs"], pa.float64())),
                          ndigits=6)
        out = pa.table({
            "source": batch["source"],
            "lang": batch["lang"],
            "docs": pc.cast(batch["docs"], pa.int64()),
            "chars": pc.cast(batch["chars"], pa.int64()),
            "words": pc.cast(batch["words"], pa.int64()),
            "mean_quality": mean_q,
        })
        return out

    return out.map_batches(finish, batch_format="pyarrow")


CORPUS_STATS_SQL = r"""
SELECT source, lang, count(*)::BIGINT AS docs,
       sum(length(text))::BIGINT AS chars,
       sum(length(regexp_extract_all(text, '\w+')))::BIGINT AS words,
       round(avg((length(regexp_extract_all(text,
                 '\b(the|a|an|and|or|of|to|in|is|it)\b'))::DOUBLE
           / greatest(length(regexp_extract_all(text, '\w+'))::DOUBLE, 1.0))
           * 2.0
         + least(length(regexp_extract_all(text, '\w+'))::DOUBLE / 100.0,
                 1.0)
         - (length(regexp_extract_all(text, '[^\w\s]'))::DOUBLE
            / greatest(length(text)::DOUBLE, 1.0)) * 3.0), 6)
       AS mean_quality
FROM documents GROUP BY source, lang
"""
