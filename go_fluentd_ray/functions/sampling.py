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


def quota_per_key(ds, key: str = "lang", measure: str = "n_chars",
                  n: int = 50):
    """Top-n rows per key by (measure DESC, doc_id ASC) — integer
    measure so the ordering is engine-exact. Per-batch combiner keeps
    each batch's local top-n; the global stage then handles at most
    n x num_batches rows per key (tiny), grouped by the key itself
    (key cardinality here is low — language codes / source names; for
    an unbounded key, bucket by hash(key) % B like functions/shuffle)."""

    def local_top(df: pd.DataFrame) -> pd.DataFrame:
        return (df.sort_values([key, measure, "doc_id"],
                               ascending=[True, False, True],
                               kind="mergesort")
                .groupby(key, sort=False).head(n))

    ds = ds.map_batches(local_top, batch_format="pandas")
    return ds.groupby(key).map_groups(local_top, batch_format="pandas")


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
