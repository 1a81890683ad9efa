"""Split-leakage audit: after deterministic train/val/test assignment,
count the distinct word n-grams shared between every pair of splits —
the governance check a pretraining build runs before trusting its
held-out numbers (the flip side of decontam.py's drop pass: this one
MEASURES contamination instead of removing it).

Scale design (100 TB corpus):
- Per batch, the distinct (gram, split) pairs are computed vectorized
  (the spandedup flat-token gram builder over `\\w+` tokens, one
  np.unique per batch) — only this deduplicated skinny side shuffles,
  never the text.
- One bucketed exchange keyed hash(gram) % B; each bucket reduces its
  grams to three per-split presence bits and emits THREE counter rows,
  so the driver gathers 3*B integers total.
- Output is a 3-row table (pair, shared_grams) — constant size at any
  corpus scale.

Tokenization is `\\w+` (the decontam convention) and grams are
space-joined windows, so the DuckDB twin's regexp_extract_all +
array_to_string windows agree exactly.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

LEAK_N = 3
PAIRS = (("train", "val"), ("train", "test"), ("val", "test"))


def _word_grams(text, n: int):
    """(gram strings, parent row index) over `\\w+` tokens — the
    spandedup window builder on a different tokenizer."""
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    split = pc.split_pattern_regex(text, r"[^\w]+")
    flat = pc.list_flatten(split)
    parent = pc.list_parent_indices(split).to_numpy(
        zero_copy_only=False).astype(np.int64)
    keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    words = flat.to_numpy(zero_copy_only=False)[keep]
    parent = parent[keep]
    L = len(words)
    if L < n:
        return np.empty(0, dtype=object), np.empty(0, dtype=np.int64)
    valid = parent[: L - n + 1] == parent[n - 1:]
    g = words[: L - n + 1]
    for k in range(1, n):
        g = g + " "
        g = g + words[k: k + L - n + 1]
    return g[valid], parent[: L - n + 1][valid]


def leakage_audit(docs_ds, n: int = LEAK_N, col: str = "text",
                  num_buckets: int | None = None) -> pa.Table:
    """3-row table: (pair, shared_grams) — distinct word n-grams that
    occur in BOTH splits of each train/val/test pair."""
    import ray

    from .sampling import split_assign
    from .shuffle import add_bucket_col, default_buckets

    B = num_buckets or default_buckets()
    ds = split_assign(docs_ds)

    def partial(batch: pa.Table) -> pa.Table:
        import pandas as pd

        g, parent = _word_grams(batch[col], n)
        if not len(g):
            return pa.table({"g": pa.array([], type=pa.string()),
                             "split": pa.array([], type=pa.string())})
        sp = batch["split"].to_numpy(zero_copy_only=False)[parent]
        df = pd.DataFrame({"g": g, "split": sp}).drop_duplicates()
        return pa.table({"g": pa.array(df["g"], type=pa.string()),
                         "split": pa.array(df["split"], type=pa.string())})

    def bucket_count(tbl: pa.Table) -> pa.Table:
        t = tbl.append_column(
            "is_tr", pc.equal(tbl["split"], "train"))
        t = t.append_column("is_va", pc.equal(tbl["split"], "val"))
        t = t.append_column("is_te", pc.equal(tbl["split"], "test"))
        gb = t.group_by("g").aggregate(
            [("is_tr", "max"), ("is_va", "max"), ("is_te", "max")])
        tr = gb["is_tr_max"].to_numpy(zero_copy_only=False)
        va = gb["is_va_max"].to_numpy(zero_copy_only=False)
        te = gb["is_te_max"].to_numpy(zero_copy_only=False)
        return pa.table({
            "pair": pa.array(["train|val", "train|test", "val|test"]),
            "n": pa.array([int((tr & va).sum()), int((tr & te).sum()),
                           int((va & te).sum())], type=pa.int64()),
        })

    agg = ds.select_columns([col, "split"]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True)
    agg = agg.map_batches(lambda t: add_bucket_col(t, ["g"], B),
                          batch_format="pyarrow")
    res = agg.groupby("__bkt").map_groups(bucket_count,
                                          batch_format="pyarrow")
    tbls = [t for t in ray.get(res.to_arrow_refs()) if t.num_columns]
    out = pa.concat_tables(tbls) if tbls else pa.table(
        {"pair": pa.array([], type=pa.string()),
         "n": pa.array([], type=pa.int64())})
    df = out.to_pandas().groupby("pair", sort=True)["n"].sum().reset_index()
    return pa.table({"pair": pa.array(df["pair"], type=pa.string()),
                     "shared_grams": pa.array(df["n"], type=pa.int64())})


def leakage_audit_sql(n: int = LEAK_N, table: str = "documents") -> str:
    """DuckDB twin: identical split assignment, tokenization, windows,
    and distinct-(gram, split) semantics."""
    from .sampling import split_assign_sql

    return rf"""
WITH s AS ({split_assign_sql(table=table)}),
d AS (SELECT split, regexp_extract_all(text, '\w+') AS ls FROM s),
g AS (
  SELECT DISTINCT split, array_to_string(ls[i:i+{n - 1}], ' ') AS gram
  FROM (SELECT split, ls,
               unnest(generate_series(1, len(ls) - {n} + 1)) AS i
        FROM d WHERE len(ls) >= {n})
),
agg AS (
  SELECT gram,
         max(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS tr,
         max(CASE WHEN split = 'val' THEN 1 ELSE 0 END) AS va,
         max(CASE WHEN split = 'test' THEN 1 ELSE 0 END) AS te
  FROM g GROUP BY gram
)
SELECT 'train|test' AS pair,
       count(*) FILTER (tr = 1 AND te = 1)::BIGINT AS shared_grams
FROM agg
UNION ALL
SELECT 'train|val', count(*) FILTER (tr = 1 AND va = 1)::BIGINT FROM agg
UNION ALL
SELECT 'val|test', count(*) FILTER (va = 1 AND te = 1)::BIGINT FROM agg
ORDER BY pair
"""
