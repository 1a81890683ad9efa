"""Corpus-level repeated-line removal — the C4 / CCNet boilerplate
pass: any non-empty line whose TOTAL occurrence count across the whole
corpus reaches ``min_count`` is deleted from every document (cookie
banners, footers, share bars); empty lines are always preserved. The
analogue in the reference is the per-tag filter chain dropping known
noise patterns (internal/tagFilters/*), generalized to a corpus-global
frequency criterion a log engine cannot express but a Ray shuffle can.

Scale design (100 TB corpus):
- Line counting is the word_topk pattern: per-batch value_counts
  combiner (one row per distinct line per batch), bucket the partials
  by hash(line) % B, EXACT per-bucket sum, filter to count >=
  min_count. Only the partials shuffle — never the corpus.
- The surviving duplicated-line set is SMALL by construction (only
  lines repeated >= min_count times survive; web boilerplate is a tiny
  distinct set even when its occurrence count is huge). It is
  collected once, `ray.put` once, and each filter actor resolves the
  ref in __init__ — the decontaminate broadcast pattern. If a corpus
  ever produced a duplicated-line set too large to broadcast, the
  bucketed_anti_join path over exploded (doc_id, line_idx, line) rows
  is the fallback (costs one corpus shuffle + a reassembly groupby).
- The removal pass is map-side only and fully vectorized: one
  split_pattern, one is_in probe against the broadcast set, one
  ListArray rebuild, one binary_join per batch — no per-row Python.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

LINE_MIN_COUNT = 5


def _lines(text: pa.ChunkedArray | pa.Array) -> pa.Array:
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    return pc.split_pattern(text, "\n")


def duplicated_lines(ds, col: str = "text", min_count: int = LINE_MIN_COUNT,
                     num_buckets: int | None = None) -> pa.Array:
    """Distinct non-empty lines with corpus-wide occurrence count >=
    min_count, as a pyarrow string array (the broadcast side)."""
    from .shuffle import add_bucket_col, default_buckets

    B = num_buckets or default_buckets()

    def partial(batch: pa.Table) -> pa.Table:
        flat = pc.list_flatten(_lines(batch[col]))
        flat = flat.filter(pc.not_equal(flat, ""))
        vc = flat.value_counts()
        return pa.table({"ln": vc.field("values"),
                         "n": pc.cast(vc.field("counts"), pa.int64())})

    def bucket_sum(tbl: pa.Table) -> pa.Table:
        g = tbl.group_by("ln").aggregate([("n", "sum")])
        g = g.filter(pc.greater_equal(g["n_sum"], min_count))
        return pa.table({"ln": g["ln"]})

    agg = ds.select_columns([col]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True)
    agg = agg.map_batches(lambda t: add_bucket_col(t, ["ln"], B),
                          batch_format="pyarrow")
    res = agg.groupby("__bkt").map_groups(bucket_sum,
                                          batch_format="pyarrow")
    # small side only: distinct lines repeated >= min_count times (web
    # boilerplate set). Arrow-native gather + C sort (the spandedup
    # pattern) — take_all's per-row dicts are a serial driver cost.
    import ray as _ray

    # empty buckets yield zero-column blocks — drop before concat
    tbls = [t for t in _ray.get(res.to_arrow_refs()) if t.num_columns]
    if not tbls:
        return pa.array([], type=pa.string())
    ln = pa.concat_tables(tbls)["ln"]
    ln = pc.take(ln, pc.sort_indices(ln))
    return (pa.concat_arrays(ln.chunks) if ln.chunks
            else pa.array([], type=pa.string()))


_DUP_CACHE: dict = {}


class LineDedup:
    """Filter stage: resolves the broadcast duplicated-line set once per
    worker (per-ref cache), removes those lines per batch with Arrow
    kernels only. Used in TASK mode via _line_dedup_fn — the set is
    small, so tasks get actor-style one-time setup without actor-pool
    spawn/teardown latency (the _minhash_fn / SemDeDup pattern)."""

    def __init__(self, dup_ref, col: str = "text"):
        import ray

        self.dup = ray.get(dup_ref)
        self.col = col

    def __call__(self, batch: pa.Table) -> pa.Table:
        lines = _lines(batch[self.col])
        flat = pc.list_flatten(lines)  # slice-safe (offsets are not)
        parent = pc.list_parent_indices(lines).to_numpy(
            zero_copy_only=False).astype(np.int64)
        keep = pc.invert(pc.is_in(flat, value_set=self.dup)).to_numpy(
            zero_copy_only=False)  # empty lines never enter dup -> kept
        totals = pc.list_value_length(lines).to_numpy(
            zero_copy_only=False).astype(np.int64)
        kept_counts = (np.bincount(parent[keep], minlength=len(batch))
                       if len(flat) else np.zeros(len(batch), np.int64))
        offsets = np.zeros(len(batch) + 1, dtype=np.int32)
        np.cumsum(kept_counts, out=offsets[1:])
        new_list = pa.ListArray.from_arrays(
            pa.array(offsets, type=pa.int32()), flat.filter(pa.array(keep)))
        clean = pc.binary_join(new_list, "\n")
        out = batch.append_column("clean_text", clean)
        return out.append_column(
            "n_removed", pa.array(totals - kept_counts, type=pa.int64()))


def line_dedup(ds, col: str = "text", min_count: int = LINE_MIN_COUNT,
               num_buckets: int | None = None):
    """Append clean_text (doc minus corpus-repeated lines) + n_removed."""
    import ray

    dup_ref = ray.put(duplicated_lines(ds, col=col, min_count=min_count,
                                       num_buckets=num_buckets))
    key = dup_ref.hex()

    def fn(batch: pa.Table) -> pa.Table:
        stage = _DUP_CACHE.get(key)
        if stage is None:
            if len(_DUP_CACHE) > 8:   # bound worker memory
                _DUP_CACHE.clear()
            stage = _DUP_CACHE[key] = LineDedup(dup_ref, col=col)
        return stage(batch)

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def line_dedup_sql(path: str, min_count: int = LINE_MIN_COUNT) -> str:
    """DuckDB twin over the same parquet directory: identical line
    split, identical count criterion, identical reassembly order."""
    src = f"read_parquet('{path}/*.parquet')"
    return f"""
WITH d AS (
  SELECT doc_id, string_split(text, chr(10)) AS ls FROM {src}
), ex AS (
  SELECT doc_id, unnest(generate_series(1, len(ls))) AS i, ls FROM d
), el AS (
  SELECT doc_id, i, ls[i] AS ln FROM ex
), dup AS (
  SELECT ln FROM el WHERE ln <> '' GROUP BY ln HAVING count(*) >= {min_count}
), kept AS (
  SELECT doc_id, i, ln FROM el WHERE ln NOT IN (SELECT ln FROM dup)
), agg AS (
  SELECT doc_id, string_agg(ln, chr(10) ORDER BY i) AS clean_text,
         count(*)::BIGINT AS n_kept
  FROM kept GROUP BY doc_id
), tot AS (
  SELECT doc_id, count(*)::BIGINT AS n_total FROM el GROUP BY doc_id
)
SELECT t.doc_id, coalesce(a.clean_text, '') AS clean_text,
       (t.n_total - coalesce(a.n_kept, 0))::BIGINT AS n_removed
FROM tot t LEFT JOIN agg a USING (doc_id)"""


def dedup_lines_within_doc(ds, col: str = "text"):
    """INTRA-document exact line dedup (the within-page half of the C4
    line pass; line_dedup above is the cross-corpus half): keep only
    the FIRST occurrence of each exact line inside a document. Pure
    map-side — no shuffle, no broadcast — one pandas drop_duplicates
    over (parent, line) per batch plus the same vectorized ListArray
    rebuild as LineDedup."""
    import pandas as pd

    def f(batch: pa.Table) -> pa.Table:
        lines = _lines(batch[col])
        flat = pc.list_flatten(lines)
        parent = pc.list_parent_indices(lines).to_numpy(
            zero_copy_only=False).astype(np.int64)
        d = pd.DataFrame({"p": parent, "ln": flat.to_pylist()})
        keep = (~d.duplicated(["p", "ln"])).to_numpy()
        totals = pc.list_value_length(lines).to_numpy(
            zero_copy_only=False).astype(np.int64)
        kept_counts = (np.bincount(parent[keep], minlength=len(batch))
                       if len(d) else np.zeros(len(batch), np.int64))
        offsets = np.zeros(len(batch) + 1, dtype=np.int32)
        np.cumsum(kept_counts, out=offsets[1:])
        new_list = pa.ListArray.from_arrays(
            pa.array(offsets, type=pa.int32()), flat.filter(pa.array(keep)))
        clean = pc.binary_join(new_list, "\n")
        out = batch.append_column("dedup_text", clean)
        return out.append_column(
            "n_dup_lines", pa.array(totals - kept_counts, type=pa.int64()))

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def dedup_lines_within_doc_sql(path: str) -> str:
    """DuckDB twin: first occurrence per (doc_id, line), original order
    preserved via min(i)."""
    src = f"read_parquet('{path}/*.parquet')"
    return f"""
WITH d AS (
  SELECT doc_id, string_split(text, chr(10)) AS ls FROM {src}
), ex AS (
  SELECT doc_id, unnest(generate_series(1, len(ls))) AS i, ls FROM d
), el AS (
  SELECT doc_id, i, ls[i] AS ln FROM ex
), firsts AS (
  SELECT doc_id, min(i) AS i, ln FROM el GROUP BY doc_id, ln
), agg AS (
  SELECT doc_id, string_agg(ln, chr(10) ORDER BY i) AS dedup_text,
         count(*)::BIGINT AS n_kept
  FROM firsts GROUP BY doc_id
), tot AS (
  SELECT doc_id, count(*)::BIGINT AS n_total FROM el GROUP BY doc_id
)
SELECT t.doc_id, a.dedup_text,
       (t.n_total - a.n_kept)::BIGINT AS n_dup_lines
FROM tot t JOIN agg a USING (doc_id)"""
