"""DSIR — Data Selection with Importance Resampling (Xie et al. 2023,
"Data Selection for Language Models via Importance Resampling"): score
every raw-corpus document by the log importance weight

    log w(x) = log p_target(x) - log p_raw(x)

under two hashed-n-gram multinomial models — the standard pretraining
data-selection method (select raw web docs that "look like" a small
target corpus). Features are unigrams + bigrams hashed into
``NUM_BUCKETS`` buckets; both models use add-one smoothing.

Scale design (100 TB raw corpus, small target):
- Model fitting never moves the corpus: each batch emits its nonzero
  (bucket, n) count partials (<= 4096 rows per batch), the partials
  take one skinny bucketed shuffle (the word_topk pattern, keyspace
  4096), and the fitted count vector is gathered Arrow-native. Two
  passes (target sample + raw corpus) fit both models.
- Scoring is pure map-side: the 4096-float log-ratio weight vector
  rides in the task closure (32 KB — broadcast-by-closure, shipped
  once per task not per batch); per batch the score is one
  np.bincount(parent, weights=w[bucket_ids]) — no Python loop over
  rows. md5 feature hashing runs once per DISTINCT gram per batch
  (np.unique + searchsorted-style inverse), not once per occurrence.
- Selecting the final top-p% composes with text.quality_prune's exact
  distributed-sort selection (or hash_sample for rate-based holdout);
  this module deliberately emits the scores, not a cut.

The target distribution stand-in is the deterministic md5 hash sample
of the corpus itself (the decontaminate convention), so the SQL twin
can reconstruct it exactly. Tokenization is `\\w+` (one split_pattern
kernel; empties dropped) — identical to regexp_extract_all; buckets
are int(md5(gram)[:8], 16) % NUM_BUCKETS — identical to DuckDB's
('0x' || substr(md5(gram), 1, 8))::UBIGINT % NUM_BUCKETS.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

NUM_BUCKETS = 4096
TARGET_RATE_PCT = 2


def _word_features(text) -> "tuple[np.ndarray, np.ndarray]":
    """(feature bucket ids, parent row index) for all unigram + bigram
    features of a batch's text column. md5 is computed once per
    distinct gram, vectorized back over occurrences via the unique
    inverse."""
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    split = pc.split_pattern_regex(text, r"[^\w]+")
    flat = pc.list_flatten(split)
    parent = pc.list_parent_indices(split).to_numpy(
        zero_copy_only=False).astype(np.int64)
    keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    words = flat.to_numpy(zero_copy_only=False)[keep]
    parent = parent[keep]

    grams = [words]
    parents = [parent]
    if len(words) >= 2:                       # bigrams within one doc
        same = parent[:-1] == parent[1:]
        bi = (words[:-1] + " " + words[1:])[same]
        grams.append(bi)
        parents.append(parent[:-1][same])
    g = np.concatenate(grams) if grams else np.empty(0, dtype=object)
    p = np.concatenate(parents) if parents else np.empty(0, dtype=np.int64)
    if not len(g):
        return np.empty(0, dtype=np.int64), p
    uniq, inv = np.unique(g, return_inverse=True)
    bk = np.fromiter(
        (int(hashlib.md5(s.encode()).hexdigest()[:8], 16) % NUM_BUCKETS
         for s in uniq), dtype=np.int64, count=len(uniq))
    return bk[inv], p


def _bucket_counts(ds, col: str = "text",
                   num_shuffle_buckets: int | None = None) -> np.ndarray:
    """Exact per-bucket feature counts over a Dataset: per-batch
    bincount partials -> one skinny bucketed-sum shuffle -> Arrow
    gather of <= NUM_BUCKETS rows."""
    import ray

    from .shuffle import add_bucket_col, default_buckets

    B = num_shuffle_buckets or default_buckets()

    def partial(batch: pa.Table) -> pa.Table:
        bk, _ = _word_features(batch[col])
        cnt = np.bincount(bk, minlength=NUM_BUCKETS)
        nz = np.nonzero(cnt)[0]
        return pa.table({"b": pa.array(nz, type=pa.int64()),
                         "n": pa.array(cnt[nz], type=pa.int64())})

    def bucket_sum(tbl: pa.Table) -> pa.Table:
        gb = tbl.group_by("b").aggregate([("n", "sum")])
        return pa.table({"b": gb["b"], "n": gb["n_sum"]})

    agg = ds.select_columns([col]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True)
    agg = agg.map_batches(lambda t: add_bucket_col(t, ["b"], B),
                          batch_format="pyarrow")
    res = agg.groupby("__bkt").map_groups(bucket_sum,
                                          batch_format="pyarrow")
    tbls = [t for t in ray.get(res.to_arrow_refs()) if t.num_columns]
    out = np.zeros(NUM_BUCKETS, dtype=np.int64)
    if tbls:
        tbl = pa.concat_tables(tbls)
        out[tbl["b"].to_numpy(zero_copy_only=False)] = \
            tbl["n"].to_numpy(zero_copy_only=False)
    return out


def dsir_scores(docs_ds, col: str = "text",
                target_rate_pct: int = TARGET_RATE_PCT,
                id_key: str = "doc_id"):
    """Append ``dsir_logratio`` (the per-doc log importance weight) to
    every document. Higher = more target-like."""
    from .sampling import hash_sample

    ct_t = _bucket_counts(hash_sample(docs_ds, target_rate_pct,
                                      key=id_key), col=col)
    ct_r = _bucket_counts(docs_ds, col=col)
    w = (np.log((ct_t + 1.0) / (ct_t.sum() + NUM_BUCKETS))
         - np.log((ct_r + 1.0) / (ct_r.sum() + NUM_BUCKETS)))

    def score(batch: pa.Table) -> pa.Table:
        bk, parent = _word_features(batch[col])
        s = np.bincount(parent, weights=w[bk], minlength=len(batch))
        return batch.append_column("dsir_logratio",
                                   pa.array(s, type=pa.float64()))

    return docs_ds.map_batches(score, batch_format="pyarrow",
                               zero_copy_batch=True)


def dsir_scores_sql(table: str = "documents",
                    target_rate_pct: int = TARGET_RATE_PCT,
                    id_key: str = "doc_id") -> str:
    """DuckDB twin: identical tokenization, identical unigram+bigram
    windows, identical md5 bucketing, identical add-one-smoothed
    log-ratio weights. Float sums accumulate in a different order than
    numpy's bincount, but the per-term agreement is ~1e-16 relative, so
    6-dp value comparison holds."""
    B = NUM_BUCKETS
    return rf"""
WITH d AS (
  SELECT {id_key}, regexp_extract_all(text, '\w+') AS ls FROM {table}
),
uni AS (
  SELECT {id_key}, unnest(ls) AS gram FROM d
),
bi AS (
  SELECT {id_key}, array_to_string(ls[i:i+1], ' ') AS gram
  FROM (SELECT {id_key}, ls,
               unnest(generate_series(1, len(ls) - 1)) AS i
        FROM d WHERE len(ls) >= 2)
),
feats AS (
  SELECT {id_key},
         ('0x' || substr(md5(gram), 1, 8))::UBIGINT % {B} AS b
  FROM (SELECT * FROM uni UNION ALL SELECT * FROM bi)
),
tgt AS (
  SELECT f.{id_key}, f.b FROM feats f
  WHERE ('0x' || substr(md5(CAST(f.{id_key} AS VARCHAR)), 1, 8))::UBIGINT
        % 100 < {target_rate_pct}
),
ct_t AS (SELECT b, count(*)::BIGINT AS n FROM tgt GROUP BY b),
ct_r AS (SELECT b, count(*)::BIGINT AS n FROM feats GROUP BY b),
tot AS (
  SELECT (SELECT coalesce(sum(n), 0) FROM ct_t)::DOUBLE AS t_t,
         (SELECT coalesce(sum(n), 0) FROM ct_r)::DOUBLE AS t_r
),
w AS (
  SELECT r.b,
         ln((coalesce(t.n, 0) + 1.0) / (tot.t_t + {B}))
         - ln((r.n + 1.0) / (tot.t_r + {B})) AS wt
  FROM ct_r r LEFT JOIN ct_t t USING (b) CROSS JOIN tot
),
score AS (
  SELECT f.{id_key}, sum(w.wt) AS s
  FROM feats f JOIN w USING (b) GROUP BY f.{id_key}
)
SELECT d.{id_key}, coalesce(sc.s, 0.0) AS dsir_logratio
FROM {table} d LEFT JOIN score sc USING ({id_key})
"""
