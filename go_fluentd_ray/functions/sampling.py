"""Training-data curation operators: deterministic sampling, per-key
quotas, and document chunking — the selection/packing family a
large-scale LLM-data pipeline runs after cleaning/dedup.

All three are map-side or bucketed (no driver materialization):
- hash_sample: Bernoulli sampling keyed on md5(doc_id) — DETERMINISTIC
  (same rows on every run / every cluster size; resumable jobs re-pick
  identical samples), pure map-side filter, SQL-mirrorable exactly.
- quota_per_key: keep the top-N docs per key (e.g. per language) by an
  integer measure — the "cap each source's share" curation step.
  Per-batch combiner (local top-N) then one small keyed stage.
- chunk_documents: split each doc into fixed-width character windows
  with overlap — flat_map-shaped, vectorized as one Arrow slice kernel
  call per window offset (not per row).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _md5_mod100(ids) -> np.ndarray:
    return np.array(
        [int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % 100
         for i in ids], dtype=np.int64)


def hash_sample(ds, rate_pct: int, key: str = "doc_id"):
    """Deterministic ~rate_pct% Bernoulli sample: keep rows where
    int(md5(str(key))[:8], 16) % 100 < rate_pct. Map-side only."""

    def f(batch: pa.Table) -> pa.Table:
        h = _md5_mod100(batch[key].to_pylist())
        return batch.filter(pa.array(h < rate_pct))

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def hash_sample_sql(rate_pct: int, key: str = "doc_id",
                    table: str = "documents") -> str:
    return f"""
SELECT * FROM {table}
WHERE ('0x' || substr(md5(CAST({key} AS VARCHAR)), 1, 8))::UBIGINT % 100
      < {rate_pct}"""


def domain_mix_sample(ds, rates: "dict[str, int]", key: str = "lang",
                      id_key: str = "doc_id", default_pct: int = 10):
    """Per-domain mixing weights: deterministic Bernoulli sample whose
    rate depends on the row's domain (source / language), the standard
    'reweight the corpus mix' curation step (e.g. The Pile / Gopher
    domain weights). Pure map-side filter — the rate table is a tiny
    config dict captured in the task closure (NOT data), the decision
    is md5(id) % 100 < rate[domain], so the pick is resume-stable and
    identical at any cluster size, and a row's fate never depends on
    other rows (no shuffle, no scan order)."""

    def f(batch: pa.Table) -> pa.Table:
        h = _md5_mod100(batch[id_key].to_pylist())
        r = np.array([rates.get(s, default_pct)
                      for s in batch[key].to_pylist()], dtype=np.int64)
        return batch.filter(pa.array(h < r))

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def domain_mix_sample_sql(rates: "dict[str, int]", key: str = "lang",
                          id_key: str = "doc_id", default_pct: int = 10,
                          table: str = "documents") -> str:
    case = " ".join(f"WHEN '{k}' THEN {v}" for k, v in rates.items())
    return f"""
SELECT * FROM {table}
WHERE ('0x' || substr(md5(CAST({id_key} AS VARCHAR)), 1, 8))::UBIGINT % 100
      < (CASE {key} {case} ELSE {default_pct} END)"""


def shuffle_shards(ds, num_shards: int = 16, id_key: str = "doc_id"):
    """Deterministic global training shuffle: shard = md5(id) % S,
    within-shard order = (md5(id), id). This is the exporter layout a
    training run reads — S shard files, each internally hash-shuffled —
    and being keyed on md5(id) it is resume-stable and identical at
    any cluster size (unlike random_shuffle). One shuffle total: the
    shard/key columns are added map-side, then ONE task per shard
    sorts its shard and assigns dense positions — exactly the
    per-output-file sort a real exporter does. At 100 TB pick S so a
    shard is file-sized (thousands of shards), which also bounds the
    per-task sort memory."""

    def assign(batch: pa.Table) -> pa.Table:
        h = np.array(
            [int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16)
             for i in batch[id_key].to_pylist()], dtype=np.int64)
        out = batch.append_column(
            "shuffle_key", pa.array(h, type=pa.int64()))
        return out.append_column(
            "shard", pa.array(h % num_shards, type=pa.int64()))

    def rank(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["shuffle_key", id_key],
                            kind="mergesort").reset_index(drop=True)
        df["pos"] = np.arange(len(df), dtype=np.int64)
        return df

    return ds.map_batches(
        assign, batch_format="pyarrow", zero_copy_batch=True
    ).groupby("shard").map_groups(rank, batch_format="pandas")


def shuffle_shards_sql(num_shards: int = 16, id_key: str = "doc_id",
                       table: str = "documents") -> str:
    return f"""
WITH k AS (
  SELECT {id_key},
         ('0x' || substr(md5(CAST({id_key} AS VARCHAR)), 1, 8))::BIGINT AS h
  FROM {table}
)
SELECT {id_key}, h AS shuffle_key, (h % {num_shards})::BIGINT AS shard,
       (row_number() OVER (PARTITION BY h % {num_shards}
                           ORDER BY h, {id_key}) - 1)::BIGINT AS pos
FROM k"""


def quota_per_key(ds, key: str = "lang", measure: str = "n_chars",
                  n: int = 50, num_buckets: int | None = None):
    """Top-n rows per key by (measure DESC, doc_id ASC) — integer
    measure so the ordering is engine-exact. Per-batch combiner keeps
    each batch's local top-n; the global stage groups by hash(key) % B
    (NOT by the key itself), so an unbounded key domain — source URL,
    site, author — costs one vectorized call per bucket instead of one
    Python call per key, and no single task ever depends on the key
    cardinality. Each key lives wholly in one bucket, so the per-bucket
    grouped head is exact."""
    from .shuffle import add_bucket_col, default_buckets

    B = num_buckets or default_buckets()

    def local_top(df: pd.DataFrame) -> pd.DataFrame:
        return (df.sort_values([key, measure, "doc_id"],
                               ascending=[True, False, True],
                               kind="mergesort")
                .groupby(key, sort=False).head(n))

    ds = ds.map_batches(local_top, batch_format="pandas")
    ds = ds.map_batches(lambda t: add_bucket_col(t, [key], B),
                        batch_format="pyarrow")

    def bucket_top(df: pd.DataFrame) -> pd.DataFrame:
        return local_top(df).drop(columns=["__bkt"])

    return ds.groupby("__bkt").map_groups(bucket_top, batch_format="pandas")


def quota_per_key_sql(key: str = "lang", measure: str = "n_chars",
                      n: int = 50, table: str = "documents") -> str:
    return f"""
SELECT * EXCLUDE (__rn) FROM (
  SELECT *, row_number() OVER (PARTITION BY {key}
                               ORDER BY {measure} DESC, doc_id) AS __rn
  FROM {table}
) WHERE __rn <= {n}"""


CHUNK_WIDTH = 400
CHUNK_STRIDE = 300  # width - stride = 100 chars of overlap


def chunk_documents(ds, width: int = CHUNK_WIDTH,
                    stride: int = CHUNK_STRIDE):
    """Split docs into [i*stride, i*stride+width) character windows
    (final window short). One Arrow utf8_slice call PER OFFSET per
    batch — no per-row Python. Empty docs produce no chunks."""

    def f(batch: pa.Table) -> pa.Table:
        text = batch["text"]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        lens = pc.utf8_length(text).to_numpy(zero_copy_only=False)
        ids = batch["doc_id"].to_numpy()
        max_len = int(lens.max()) if len(lens) else 0
        parts = []
        start = 0
        i = 0
        while start < max_len:
            alive = lens > start
            idx = np.flatnonzero(alive)
            sub = text.take(pa.array(idx))
            chunk = pc.utf8_slice_codeunits(sub, start, start + width)
            parts.append(pa.table({
                "doc_id": pa.array(ids[idx], type=pa.int64()),
                "chunk_idx": pa.array(
                    np.full(len(idx), i, dtype=np.int64)),
                "chunk": chunk,
            }))
            start += stride
            i += 1
        if not parts:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "chunk_idx": pa.array([], pa.int64()),
                             "chunk": pa.array([], pa.string())})
        return pa.concat_tables(parts)

    return ds.select_columns(["doc_id", "text"]).map_batches(
        f, batch_format="pyarrow", zero_copy_batch=True)


def chunk_documents_sql(width: int = CHUNK_WIDTH,
                        stride: int = CHUNK_STRIDE,
                        table: str = "documents") -> str:
    # generate_series is inclusive; last window starts at
    # floor((len-1)/stride)*stride for len > 0. Scalar-list form +
    # unnest (DuckDB's FROM-clause generate_series rejects lateral
    # column args).
    return f"""
WITH s AS (
  SELECT doc_id, text,
         unnest(generate_series(
             0, CAST(floor((length(text) - 1) / {stride}) AS BIGINT))) AS i
  FROM {table} WHERE length(text) > 0
)
SELECT doc_id, i AS chunk_idx,
       substr(text, i * {stride} + 1, {width}) AS chunk
FROM s"""


PACK_BUDGET = 512


def pack_documents(ds, budget: int = PACK_BUDGET,
                   num_buckets: int | None = None):
    """Greedy sequence packing: concatenate docs (in doc_id order) into
    training sequences of at most ``budget`` whitespace tokens; a doc
    larger than the budget gets its own sequence. Returns one row per
    doc: (doc_id, bucket, seq_idx, n_tokens).

    Packing is inherently sequential, so it runs per hash bucket
    (bucket = doc_id % B — modulo, not hash, so the SQL oracle can
    reproduce it exactly) with ONE pass per bucket; the documented
    partitioning assumption is that sequences never span buckets. The
    per-bucket scan is a plain int loop (no per-row pandas), O(n) and
    restart-deterministic."""
    # the bucket count is part of the OUTPUT semantics (it decides
    # which docs can share a sequence), so it is a fixed default — NOT
    # cluster-size-derived — and identical to the SQL oracle's
    B = num_buckets or 32

    def tokens(batch: pa.Table) -> pa.Table:
        # null text counts as 0 tokens (SQL twin coalesces identically)
        n = pc.fill_null(pc.cast(
            pc.count_substring_regex(batch["text"], r"\w+"), pa.int64()), 0)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"doc_id": pa.array(ids),
                         "n_tokens": n,
                         "bucket": pa.array((ids % B).astype(np.int32))})

    def pack_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("doc_id", kind="mergesort")
        toks = df["n_tokens"].to_numpy()
        seq = np.empty(len(toks), dtype=np.int64)
        acc = 0
        s = 0
        for i, t in enumerate(toks):
            t = int(t)
            if acc > 0 and acc + t > budget:
                s += 1
                acc = t
            else:
                acc += t
            seq[i] = s
        return pd.DataFrame({"doc_id": df["doc_id"].to_numpy(),
                             "bucket": df["bucket"].to_numpy(),
                             "seq_idx": seq,
                             "n_tokens": toks})

    ds = ds.select_columns(["doc_id", "text"]).map_batches(
        tokens, batch_format="pyarrow", zero_copy_batch=True)
    return ds.groupby("bucket").map_groups(pack_bucket,
                                           batch_format="pandas")


def pack_documents_sql(budget: int = PACK_BUDGET,
                       num_buckets: int = 32,
                       table: str = "documents") -> str:
    """Exact SQL twin: the greedy scan as a recursive CTE chained on
    per-bucket row_number (one recursion step per doc per bucket)."""
    return rf"""
WITH RECURSIVE d AS (
  SELECT doc_id,
         coalesce(length(regexp_extract_all(text, '\w+')), 0)::BIGINT
             AS n_tokens,
         (doc_id % {num_buckets})::INTEGER AS bucket
  FROM {table}
),
numbered AS (
  SELECT *, row_number() OVER (PARTITION BY bucket ORDER BY doc_id) AS rn
  FROM d
),
pack(bucket, rn, doc_id, n_tokens, seq, acc) AS (
  SELECT bucket, rn, doc_id, n_tokens, 0::BIGINT, n_tokens
  FROM numbered WHERE rn = 1
  UNION ALL
  SELECT n.bucket, n.rn, n.doc_id, n.n_tokens,
         CASE WHEN p.acc > 0 AND p.acc + n.n_tokens > {budget}
              THEN p.seq + 1 ELSE p.seq END,
         CASE WHEN p.acc > 0 AND p.acc + n.n_tokens > {budget}
              THEN n.n_tokens ELSE p.acc + n.n_tokens END
  FROM pack p JOIN numbered n ON n.bucket = p.bucket AND n.rn = p.rn + 1
)
SELECT doc_id, bucket, seq AS seq_idx, n_tokens FROM pack"""


def split_assign(ds, test_pct: int = 10, val_pct: int = 10,
                 key: str = "doc_id"):
    """Deterministic stratified train/val/test assignment: the md5
    bucket of the row key (the hash_sample hash — resume-stable,
    order-free, cluster-size-free) maps to
    test [0, test_pct) -> val [test_pct, test_pct+val_pct) -> train.
    Map-side only, zero shuffles; a row's split never changes when the
    corpus grows, which is the property leakage audits rely on."""

    def f(batch: pa.Table) -> pa.Table:
        h = _md5_mod100(batch[key].to_pylist())
        split = np.where(h < test_pct, "test",
                         np.where(h < test_pct + val_pct, "val", "train"))
        return batch.append_column(
            "split", pa.array(split, type=pa.string()))

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def split_assign_sql(test_pct: int = 10, val_pct: int = 10,
                     key: str = "doc_id",
                     table: str = "documents") -> str:
    h = (f"('0x' || substr(md5(CAST({key} AS VARCHAR)), 1, 8))::UBIGINT"
         f" % 100")
    return f"""
SELECT *, CASE WHEN {h} < {test_pct} THEN 'test'
               WHEN {h} < {test_pct + val_pct} THEN 'val'
               ELSE 'train' END AS split
FROM {table}"""
