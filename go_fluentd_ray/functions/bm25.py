"""BM25 lexical ranked retrieval — the keyword-search counterpart of
the embedding kNN family (similarity.py): score every document against
a small set of bag-of-words queries with Okapi BM25 (Robertson &
Zaragoza 2009, the Lucene-default formula) and keep the global top-k
per query.

Scale design (100 TB corpus):
- Corpus statistics (N, avg doc length, per-term document frequency)
  come from ONE skinny pre-pass: each batch emits a single partial row
  of counters restricted to the QUERY vocabulary (a handful of terms),
  reduced with Dataset.sum — bytes per batch, never a corpus shuffle.
  This is the classic "broadcast the tiny side" shape: the resulting
  idf table is config-sized and rides in the task closure.
- Scoring is map-side and vectorized: one token flatten per batch, one
  pc.equal + bincount per query term (tf per doc in C), the BM25
  formula as whole-column numpy arithmetic, then a LOCAL top-k per
  query under the same total order (score DESC, doc_id ASC) the final
  reduce uses — only k rows per (query, batch) cross the wire (the
  knn_bruteforce partial pattern, similarity.py:32).
- Only documents matching >= 1 query term are ranked (score > 0), so
  the SQL twin's join-based scoring enumerates exactly the same set.

Tokenization is `\\S+` (spandedup._flat_tokens) so the SQL twin's
regexp_extract_all is exact. The comparison surface is (qid, rank,
doc_id): ranks are determined by full-precision float64 scores on
both sides; docs with identical (tf, dl) score identically in both
engines, and distinct (tf, dl) separate scores by far more than
cross-engine libm ulp differences, so the ordering is stable.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

BM25_K1 = 1.2
BM25_B = 0.75
BM25_QUERIES = (
    "hash join table",
    "scan filter row",
    "window sort merge batch",
    "customer column value",
)


def _flat_tokens_arrow(text: pa.ChunkedArray | pa.Array):
    """(flat tokens as pa.Array, parent row index ndarray), empty
    boundary tokens dropped — `\\S+` parity (spandedup contract)."""
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    split = pc.utf8_split_whitespace(text)
    flat = pc.list_flatten(split)
    parent = pc.list_parent_indices(split).to_numpy(
        zero_copy_only=False).astype(np.int64)
    mask = pc.not_equal(flat, "")
    return flat.filter(mask), parent[mask.to_numpy(zero_copy_only=False)]


def _query_terms(queries) -> tuple[list[str], list[list[int]]]:
    """(distinct term list, per-query term-index lists) in first-seen
    order — the FIXED summation order both the Ray side and the per-row
    float64 arithmetic rely on."""
    terms: list[str] = []
    seen: dict[str, int] = {}
    per_q: list[list[int]] = []
    for q in queries:
        idxs = []
        for t in q.split():
            if t not in seen:
                seen[t] = len(terms)
                terms.append(t)
            idxs.append(seen[t])
        per_q.append(idxs)
    return terms, per_q


def bm25_topk(ds, queries=BM25_QUERIES, k: int = 10, k1: float = BM25_K1,
              b: float = BM25_B, col: str = "text",
              id_col: str = "doc_id") -> pd.DataFrame:
    terms, per_q = _query_terms(queries)

    def stats_partial(batch: pa.Table) -> pa.Table:
        flat, parent = _flat_tokens_arrow(batch[col])
        row: dict = {"n_docs": [len(batch)], "sum_dl": [len(flat)]}
        for i, t in enumerate(terms):
            m = pc.equal(flat, t).to_numpy(zero_copy_only=False)
            row[f"df_{i}"] = [int(np.unique(parent[m]).size)]
        return pa.table(row)

    cols = ["n_docs", "sum_dl"] + [f"df_{i}" for i in range(len(terms))]
    sums = ds.select_columns([col]).map_batches(
        stats_partial, batch_format="pyarrow",
        zero_copy_batch=True).sum(cols)
    n_docs = float(sums["sum(n_docs)"])
    avgdl = float(sums["sum(sum_dl)"]) / n_docs
    # Lucene idf: ln(1 + (N - df + 0.5) / (df + 0.5)); identical
    # expression in the SQL twin
    idf = np.array([np.log(1.0 + (n_docs - sums[f"sum(df_{i})"] + 0.5)
                           / (sums[f"sum(df_{i})"] + 0.5))
                    for i in range(len(terms))])

    def score_partial(batch: pa.Table) -> pa.Table:
        flat, parent = _flat_tokens_arrow(batch[col])
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        n_rows = len(batch)
        dl = np.bincount(parent, minlength=n_rows).astype(np.float64)
        denom_base = k1 * (1.0 - b + b * dl / avgdl)
        tf = np.zeros((len(terms), n_rows))
        for i, t in enumerate(terms):
            m = pc.equal(flat, t).to_numpy(zero_copy_only=False)
            tf[i] = np.bincount(parent[m], minlength=n_rows)
        out_qid, out_id, out_score = [], [], []
        for qi, idxs in enumerate(per_q):
            s = np.zeros(n_rows)
            for i in idxs:  # fixed term order = fixed summation order
                s += idf[i] * (tf[i] * (k1 + 1.0)) / (tf[i] + denom_base)
            m = s > 0.0    # only docs matching >= 1 term rank
            sids, ss = ids[m], s[m]
            kk = min(k, len(sids))
            order = np.lexsort((sids, -ss))[:kk]
            out_qid.append(np.full(kk, qi, dtype=np.int64))
            out_id.append(sids[order])
            out_score.append(ss[order])
        return pa.table({
            "qid": pa.array(np.concatenate(out_qid) if out_qid
                            else np.empty(0, np.int64)),
            "doc_id": pa.array(np.concatenate(out_id) if out_id
                               else np.empty(0, np.int64), type=pa.int64()),
            "score": pa.array(np.concatenate(out_score) if out_score
                              else np.empty(0, np.float64)),
        })

    partials = ds.select_columns([id_col, col]).map_batches(
        score_partial, batch_format="pyarrow", zero_copy_batch=True)
    df = partials.to_pandas()  # k rows per (query, batch): tiny
    df = df.sort_values(["qid", "score", "doc_id"],
                        ascending=[True, False, True], kind="mergesort")
    out = df.groupby("qid", sort=True).head(k).reset_index(drop=True)
    out["rank"] = out.groupby("qid").cumcount().astype(np.int64)
    return out[["qid", "rank", "doc_id"]]


def bm25_topk_sql(queries=BM25_QUERIES, k: int = 10, k1: float = BM25_K1,
                  b: float = BM25_B, table: str = "documents") -> str:
    """DuckDB twin: identical tokenization, idf expression, BM25
    formula, match-only ranking, and (score DESC, doc_id) total order."""
    qrows = ",\n    ".join(
        f"({qi}, '{t}')"
        for qi, q in enumerate(queries) for t in q.split())
    return rf"""
WITH d AS (
  SELECT doc_id, regexp_extract_all(text, '\S+') AS ls FROM {table}
), tok AS (
  SELECT doc_id, unnest(ls) AS tok FROM d
), stats AS (
  SELECT count(*)::DOUBLE AS n_docs, avg(len(ls))::DOUBLE AS avgdl FROM d
), q(qid, term) AS (VALUES
    {qrows}
), terms AS (
  SELECT DISTINCT term FROM q
), df AS (
  SELECT tm.term,
         coalesce(count(DISTINCT t.doc_id), 0)::DOUBLE AS df
  FROM terms tm LEFT JOIN tok t ON t.tok = tm.term
  GROUP BY tm.term
), tf AS (
  SELECT q.qid, q.term, t.doc_id, count(*)::DOUBLE AS tf
  FROM q JOIN tok t ON t.tok = q.term
  GROUP BY q.qid, q.term, t.doc_id
), dl AS (
  SELECT doc_id, len(ls)::DOUBLE AS dl FROM d
), contrib AS (
  SELECT tf.qid, tf.doc_id,
         ln(1.0 + (s.n_docs - df.df + 0.5) / (df.df + 0.5))
         * (tf.tf * ({k1} + 1.0))
         / (tf.tf + {k1} * (1.0 - {b} + {b} * dl.dl / s.avgdl)) AS c
  FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN stats s
), scored AS (
  SELECT qid, doc_id, sum(c) AS score FROM contrib GROUP BY qid, doc_id
), ranked AS (
  SELECT qid, doc_id,
         row_number() OVER (PARTITION BY qid
                            ORDER BY score DESC, doc_id) - 1 AS rank
  FROM scored WHERE score > 0.0
)
SELECT qid::BIGINT AS qid, rank::BIGINT AS rank, doc_id
FROM ranked WHERE rank < {k}"""
