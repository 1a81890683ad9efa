"""Corpus drift report: Jensen-Shannon divergence between two corpus
snapshots' word distributions, plus the per-side mass/vocabulary
counters a pipeline dashboard tracks. The monitoring op a growing
training-data pipeline runs between ingest generations ("did the new
crawl shift the distribution?") — pairs with stages/incremental.py's
file-granular ingest the way incremental_dedup does.

The driver-visible query splits one table deterministically by
md5(doc_id) % 100 (sampling.hash_sample's rule) so the DuckDB twin can
reproduce the split; the underlying kernel takes any two-sided word
count layout.

Scale shape (the ngrams.py partials pattern):
- ONE corpus pass emits per-batch (w, side, n) count partials — text
  never crosses the wire — materialized once and consumed twice.
- Side totals are two bytes-per-block sums over the partials.
- The JSD sum decomposes PER WORD, so the hash(w) % B bucketed groupby
  computes exact per-word (ca, cb) and each bucket emits ONE row of
  partial sums (jsd contribution, vocab counters); the driver adds B
  rows. The vocabulary never leaves the cluster.

JSD here is natural-log based (max ln 2), matching the SQL twin
term-for-term; contributions are zero where a side's probability is
zero (lim p->0 of p*ln(p/m) = 0).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .bm25 import _flat_tokens_arrow
from .sampling import _md5_mod100


def corpus_drift(ds, split_pct: int = 50, id_col: str = "doc_id",
                 col: str = "text",
                 num_buckets: int | None = None) -> pd.DataFrame:
    """One row: (n_tokens_a, n_tokens_b, n_vocab_a, n_vocab_b, jsd)
    where side a = md5(id) % 100 < split_pct."""
    from .shuffle import add_bucket_col, default_buckets

    B = num_buckets or default_buckets()

    def partial(batch: pa.Table) -> pa.Table:
        a_mask = _md5_mod100(batch[id_col].to_pylist()) < split_pct
        out_w, out_s, out_n = [], [], []
        for side, m in (("a", a_mask), ("b", ~a_mask)):
            flat, _ = _flat_tokens_arrow(
                batch.filter(pa.array(m))[col])
            if len(flat) == 0:
                continue
            vc = pc.value_counts(flat)
            out_w.append(vc.field("values"))
            out_s.append(np.full(len(vc), side, dtype=object))
            out_n.append(vc.field("counts").to_numpy(
                zero_copy_only=False))
        if not out_w:
            return pa.table({"w": pa.array([], pa.string()),
                             "side": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        return pa.table({
            "w": pa.concat_arrays([x.combine_chunks() if isinstance(
                x, pa.ChunkedArray) else x for x in out_w]),
            "side": pa.array(np.concatenate(out_s), pa.string()),
            "n": pa.array(np.concatenate(out_n).astype(np.int64))})

    parts = ds.select_columns([id_col, col]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True)
    parts = parts.materialize()  # consumed twice: totals + JSD buckets

    # totals: bytes-per-block aggregates over the skinny partials
    def totals_partial(tbl: pa.Table) -> pa.Table:
        am = pc.equal(tbl["side"], "a")
        n = tbl["n"]
        na = pc.sum(pc.if_else(am, n, pa.scalar(0, pa.int64()))).as_py()
        nb = pc.sum(pc.if_else(am, pa.scalar(0, pa.int64()), n)).as_py()
        return pa.table({"na": [int(na or 0)], "nb": [int(nb or 0)]})

    tot = parts.map_batches(totals_partial,
                            batch_format="pyarrow").sum(["na", "nb"])
    n_a = float(tot["sum(na)"] or 0) if tot else 0.0
    n_b = float(tot["sum(nb)"] or 0) if tot else 0.0
    if n_a == 0.0 and n_b == 0.0:  # zero tokens anywhere
        return pd.DataFrame({
            "n_tokens_a": [0], "n_tokens_b": [0],
            "n_vocab_a": [0], "n_vocab_b": [0], "jsd": [0.0]})
    # one empty side: vocab/mass counters stay real, jsd is DEFINED
    # as 0.0 (there is no second distribution to diverge from) — the
    # SQL twin encodes the same contract
    one_sided = n_a == 0.0 or n_b == 0.0
    den_a, den_b = (n_a or 1.0), (n_b or 1.0)

    def bucket_jsd(tbl: pa.Table) -> pa.Table:
        df = tbl.to_pandas()
        g = (df.pivot_table(index="w", columns="side", values="n",
                            aggfunc="sum", fill_value=0)
             .reindex(columns=["a", "b"], fill_value=0))
        ca = g["a"].to_numpy(np.float64)
        cb = g["b"].to_numpy(np.float64)
        p = ca / den_a
        q = cb / den_b
        m = 0.5 * (p + q)
        with np.errstate(divide="ignore", invalid="ignore"):
            term = (0.5 * np.where(p > 0, p * np.log(p / m), 0.0)
                    + 0.5 * np.where(q > 0, q * np.log(q / m), 0.0))
        return pa.table({
            "jsd_part": pa.array([float(term.sum())]),
            "vocab_a": pa.array([int((ca > 0).sum())], pa.int64()),
            "vocab_b": pa.array([int((cb > 0).sum())], pa.int64())})

    agg = (parts.map_batches(
        lambda t: add_bucket_col(t, ["w"], B), batch_format="pyarrow")
        .groupby("__bkt").map_groups(bucket_jsd, batch_format="pyarrow")
        .to_pandas())  # B rows
    return pd.DataFrame({
        "n_tokens_a": [int(n_a)], "n_tokens_b": [int(n_b)],
        "n_vocab_a": [int(agg["vocab_a"].sum())],
        "n_vocab_b": [int(agg["vocab_b"].sum())],
        "jsd": [0.0 if one_sided
                else round(float(agg["jsd_part"].sum()), 6)]})


def corpus_drift_sql(split_pct: int = 50, table: str = "documents") -> str:
    """DuckDB twin: identical split rule, tokenization, JSD terms,
    and rounding."""
    return rf"""
WITH t AS (
  SELECT CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                   ::UBIGINT % 100 < {split_pct}
              THEN 'a' ELSE 'b' END AS side,
         unnest(regexp_extract_all(text, '\S+')) AS w
  FROM {table}
), counts AS (
  SELECT w,
         sum(CASE WHEN side = 'a' THEN 1 ELSE 0 END)::DOUBLE AS ca,
         sum(CASE WHEN side = 'b' THEN 1 ELSE 0 END)::DOUBLE AS cb
  FROM t GROUP BY w
), tot AS (
  SELECT sum(ca) AS na, sum(cb) AS nb FROM counts
), terms AS (
  SELECT c.ca, c.cb,
         c.ca / t.na AS p, c.cb / t.nb AS q,
         0.5 * (c.ca / t.na + c.cb / t.nb) AS m
  FROM counts c CROSS JOIN tot t
)
SELECT coalesce((SELECT na FROM tot), 0)::BIGINT AS n_tokens_a,
       coalesce((SELECT nb FROM tot), 0)::BIGINT AS n_tokens_b,
       coalesce(sum(CASE WHEN ca > 0 THEN 1 ELSE 0 END),
                0)::BIGINT AS n_vocab_a,
       coalesce(sum(CASE WHEN cb > 0 THEN 1 ELSE 0 END),
                0)::BIGINT AS n_vocab_b,
       -- one-sided or empty corpora: jsd is DEFINED as 0.0 (the
       -- kernel's contract); the div-by-zero p/q are NULL and the
       -- CASE never reads them
       CASE WHEN coalesce((SELECT na FROM tot), 0) = 0
              OR coalesce((SELECT nb FROM tot), 0) = 0 THEN 0.0
            ELSE round(
              sum(0.5 * CASE WHEN p > 0 THEN p * ln(p / m) ELSE 0 END
                + 0.5 * CASE WHEN q > 0 THEN q * ln(q / m) ELSE 0 END),
              6) END AS jsd
FROM terms"""


def drift_topk(ds, k: int = 20, split_pct: int = 50,
               id_col: str = "doc_id", col: str = "text",
               num_buckets: int | None = None) -> pd.DataFrame:
    """The actionable half of the drift report: top-k words by
    absolute probability shift |ca/na - cb/nb| (which words drifted),
    with per-side counts. Same partials + bucketed-exact shape as
    corpus_drift; each bucket emits its LOCAL top-k under the global
    (shift DESC, word ASC) total order, the driver merges B*k rows.
    Ranking is by a 6-dp-rounded shift (integer-derived, engine-
    agnostic) so the SQL twin orders identically."""
    from .shuffle import add_bucket_col, default_buckets

    B = num_buckets or default_buckets()

    def partial(batch: pa.Table) -> pa.Table:
        a_mask = _md5_mod100(batch[id_col].to_pylist()) < split_pct
        out_w, out_s, out_n = [], [], []
        for side, m in (("a", a_mask), ("b", ~a_mask)):
            flat, _ = _flat_tokens_arrow(batch.filter(pa.array(m))[col])
            if len(flat) == 0:
                continue
            vc = pc.value_counts(flat)
            out_w.append(vc.field("values"))
            out_s.append(np.full(len(vc), side, dtype=object))
            out_n.append(vc.field("counts").to_numpy(
                zero_copy_only=False))
        if not out_w:
            return pa.table({"w": pa.array([], pa.string()),
                             "side": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        return pa.table({
            "w": pa.concat_arrays([x.combine_chunks() if isinstance(
                x, pa.ChunkedArray) else x for x in out_w]),
            "side": pa.array(np.concatenate(out_s), pa.string()),
            "n": pa.array(np.concatenate(out_n).astype(np.int64))})

    parts = ds.select_columns([id_col, col]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True)
    parts = parts.materialize()

    def totals_partial(tbl: pa.Table) -> pa.Table:
        am = pc.equal(tbl["side"], "a")
        n = tbl["n"]
        na = pc.sum(pc.if_else(am, n, pa.scalar(0, pa.int64()))).as_py()
        nb = pc.sum(pc.if_else(am, pa.scalar(0, pa.int64()), n)).as_py()
        return pa.table({"na": [int(na or 0)], "nb": [int(nb or 0)]})

    tot = parts.map_batches(totals_partial,
                            batch_format="pyarrow").sum(["na", "nb"])
    n_a = float(tot["sum(na)"] or 0) if tot else 0.0
    n_b = float(tot["sum(nb)"] or 0) if tot else 0.0
    empty = pd.DataFrame({"w": pd.Series(dtype=object),
                          "n_a": pd.Series(dtype=np.int64),
                          "n_b": pd.Series(dtype=np.int64),
                          "shift": pd.Series(dtype=np.float64)})
    if n_a == 0.0 or n_b == 0.0:
        return empty

    def bucket_topk(tbl: pa.Table) -> pa.Table:
        df = tbl.to_pandas()
        g = (df.pivot_table(index="w", columns="side", values="n",
                            aggfunc="sum", fill_value=0)
             .reindex(columns=["a", "b"], fill_value=0).reset_index())
        ca = g["a"].to_numpy(np.float64)
        cb = g["b"].to_numpy(np.float64)
        g["shift"] = np.round(np.abs(ca / n_a - cb / n_b), 6)
        g = g.sort_values(["shift", "w"], ascending=[False, True],
                          kind="mergesort").head(k)
        return pa.table({
            "w": pa.array(g["w"], pa.string()),
            "n_a": pa.array(g["a"].to_numpy(np.int64), pa.int64()),
            "n_b": pa.array(g["b"].to_numpy(np.int64), pa.int64()),
            "shift": pa.array(g["shift"].to_numpy(np.float64))})

    out = (parts.map_batches(
        lambda t: add_bucket_col(t, ["w"], B), batch_format="pyarrow")
        .groupby("__bkt").map_groups(bucket_topk,
                                     batch_format="pyarrow")
        .to_pandas())  # <= B*k rows
    out = out.sort_values(["shift", "w"], ascending=[False, True],
                          kind="mergesort").head(k)
    return out.reset_index(drop=True)


def drift_topk_sql(k: int = 20, split_pct: int = 50,
                   table: str = "documents") -> str:
    """DuckDB twin of drift_topk (same split, tokenization, rounded
    shift, total order)."""
    return rf"""
WITH t AS (
  SELECT CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                   ::UBIGINT % 100 < {split_pct}
              THEN 'a' ELSE 'b' END AS side,
         unnest(regexp_extract_all(text, '\S+')) AS w
  FROM {table}
), counts AS (
  SELECT w,
         sum(CASE WHEN side = 'a' THEN 1 ELSE 0 END)::BIGINT AS n_a,
         sum(CASE WHEN side = 'b' THEN 1 ELSE 0 END)::BIGINT AS n_b
  FROM t GROUP BY w
), tot AS (
  SELECT sum(n_a)::DOUBLE AS na, sum(n_b)::DOUBLE AS nb FROM counts
)
SELECT w, n_a, n_b,
       round(abs(n_a / t.na - n_b / t.nb), 6) AS shift
FROM counts c CROSS JOIN tot t
-- one-sided split: shift is undefined, return no rows (the kernel's
-- contract — drift_topk returns an empty frame)
WHERE t.na > 0 AND t.nb > 0
ORDER BY shift DESC, w LIMIT {k}"""
