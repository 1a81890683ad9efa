"""Exact duplicated-SPAN removal — the ExactSubstr pass of
"Deduplicating Training Data Makes Language Models Better" (Lee et
al., 2022), at word-token granularity: any word n-gram whose TOTAL
occurrence count across the corpus reaches ``min_count`` marks every
token position it covers (in every occurrence) as duplicated, and all
covered tokens are deleted. This is the third member of the line-pass
family (linededup.py holds the cross-corpus and within-doc LINE
passes); spans catch boilerplate that crosses line boundaries or is
embedded mid-sentence, which line-level passes miss.

Scale design (100 TB corpus):
- Span counting is the word_topk / line_dedup pattern: per-batch
  value_counts combiner over the batch's n-grams (one row per distinct
  gram per batch), bucket the partials by hash(gram) % B, EXACT
  per-bucket sum, filter to count >= min_count. Only the skinny
  partials shuffle — never the corpus.
- The surviving duplicated-span set is broadcast once (`ray.put`) and
  resolved per worker via the task-mode cache (the line_dedup /
  decontaminate pattern). Real web corpora have a small DISTINCT set
  of long duplicated spans even when occurrence counts are huge; for a
  corpus where the set outgrows the broadcast budget, the documented
  fallbacks are (a) store 64-bit rolling hashes of grams instead of
  the strings (8 bytes/entry, collision odds ~ m^2/2^64), or (b) the
  bucketed_anti_join path over exploded (doc_id, position, gram) rows
  — one corpus shuffle + reassembly groupby.
- The removal pass is map-side and vectorized: gram construction is
  n-1 elementwise concatenations over the batch's flat token array
  (not per row), coverage is one scatter-add + cumsum (overlapping
  spans compose correctly), reassembly is the ListArray-rebuild +
  binary_join kernel chain shared with the line passes.

Tokenization is `\\S+` (split on whitespace runs) so the SQL twin's
regexp_extract_all(text, '\\S+') is exactly equal; output text is the
kept tokens joined by single spaces (whitespace-normalizing, like the
reference's TrimSpace-style parse normalization, parser_f.go).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

SPAN_N = 8
SPAN_MIN_COUNT = 2


def _flat_tokens(text: pa.ChunkedArray | pa.Array):
    """(flat tokens as object ndarray, parent row index ndarray) with
    the empty boundary tokens utf8_split_whitespace emits dropped —
    exact `\\S+` extraction parity."""
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    split = pc.utf8_split_whitespace(text)
    flat = pc.list_flatten(split)
    parent = pc.list_parent_indices(split).to_numpy(
        zero_copy_only=False).astype(np.int64)
    mask = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    return flat.to_numpy(zero_copy_only=False)[mask], parent[mask]


def _grams(flat: np.ndarray, parent: np.ndarray, n: int):
    """(gram strings, start positions into ``flat``) for every n-token
    window that stays inside one document. n-1 vectorized elementwise
    concatenations — no per-row Python loop."""
    L = len(flat)
    if L < n:
        return np.empty(0, dtype=object), np.empty(0, dtype=np.int64)
    valid = parent[: L - n + 1] == parent[n - 1:]
    g = flat[: L - n + 1]
    for k in range(1, n):
        g = g + " "
        g = g + flat[k: k + L - n + 1]
    starts = np.nonzero(valid)[0]
    return g[valid], starts


def duplicated_spans(ds, col: str = "text", n: int = SPAN_N,
                     min_count: int = SPAN_MIN_COUNT,
                     num_buckets: int | None = None) -> pa.Array:
    """Distinct word n-grams with corpus-wide occurrence count >=
    min_count, as a sorted pyarrow string array (the broadcast side)."""
    from .shuffle import add_bucket_col, default_buckets

    B = num_buckets or default_buckets()

    def partial(batch: pa.Table) -> pa.Table:
        flat, parent = _flat_tokens(batch[col])
        g, _ = _grams(flat, parent, n)
        if not len(g):
            return pa.table({"g": pa.array([], type=pa.string()),
                             "n": pa.array([], type=pa.int64())})
        vc = pa.array(g, type=pa.string()).value_counts()
        return pa.table({"g": vc.field("values"),
                         "n": pc.cast(vc.field("counts"), pa.int64())})

    def bucket_sum(tbl: pa.Table) -> pa.Table:
        gb = tbl.group_by("g").aggregate([("n", "sum")])
        gb = gb.filter(pc.greater_equal(gb["n_sum"], min_count))
        return pa.table({"g": gb["g"]})

    agg = ds.select_columns([col]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True)
    agg = agg.map_batches(lambda t: add_bucket_col(t, ["g"], B),
                          batch_format="pyarrow")
    res = agg.groupby("__bkt").map_groups(bucket_sum,
                                          batch_format="pyarrow")
    # gather the (small) duplicated-span side Arrow-native: take_all()
    # builds one Python dict per row, which at millions of spans was a
    # measured multi-second serial driver cost; concat+sort stays in C
    import ray as _ray

    # empty buckets yield zero-column blocks — drop before concat
    tbls = [t for t in _ray.get(res.to_arrow_refs()) if t.num_columns]
    if not tbls:
        return pa.array([], type=pa.string())
    g = pa.concat_tables(tbls)["g"]
    g = pc.take(g, pc.sort_indices(g))  # sorted for determinism
    return (pa.concat_arrays(g.chunks) if g.chunks
            else pa.array([], type=pa.string()))


_DUP_CACHE: dict = {}


class SpanDedup:
    """Filter stage: resolves the broadcast duplicated-span set once
    per worker, removes every covered token per batch with one is_in
    probe + scatter-add coverage + ListArray rebuild."""

    def __init__(self, dup_ref, col: str, n: int):
        import ray

        self.dup = ray.get(dup_ref)
        self.col = col
        self.n = n

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = self.n
        flat, parent = _flat_tokens(batch[self.col])
        g, starts = _grams(flat, parent, n)
        cover = np.zeros(len(flat) + n, dtype=np.int64)
        if len(g):
            hit = pc.is_in(pa.array(g, type=pa.string()),
                           value_set=self.dup).to_numpy(
                zero_copy_only=False)
            hs = starts[hit]
            np.add.at(cover, hs, 1)       # overlapping spans compose:
            np.add.at(cover, hs + n, -1)  # covered = prefix-sum > 0
        keep = np.cumsum(cover)[: len(flat)] <= 0
        n_rows = len(batch)
        totals = (np.bincount(parent, minlength=n_rows)
                  if len(flat) else np.zeros(n_rows, np.int64))
        kept_counts = (np.bincount(parent[keep], minlength=n_rows)
                       if len(flat) else np.zeros(n_rows, np.int64))
        offsets = np.zeros(n_rows + 1, dtype=np.int32)
        np.cumsum(kept_counts, out=offsets[1:])
        new_list = pa.ListArray.from_arrays(
            pa.array(offsets, type=pa.int32()),
            pa.array(flat[keep], type=pa.string()))
        clean = pc.binary_join(new_list, " ")
        out = batch.append_column("clean_text", clean)
        return out.append_column(
            "n_removed_tokens",
            pa.array(totals - kept_counts, type=pa.int64()))


def span_dedup(ds, col: str = "text", n: int = SPAN_N,
               min_count: int = SPAN_MIN_COUNT,
               num_buckets: int | None = None):
    """Append clean_text (doc minus corpus-duplicated n-gram spans,
    whitespace-normalized) + n_removed_tokens."""
    import ray

    dup_ref = ray.put(duplicated_spans(ds, col=col, n=n,
                                       min_count=min_count,
                                       num_buckets=num_buckets))
    key = dup_ref.hex()

    def fn(batch: pa.Table) -> pa.Table:
        stage = _DUP_CACHE.get(key)
        if stage is None:
            if len(_DUP_CACHE) > 8:   # bound worker memory
                _DUP_CACHE.clear()
            stage = _DUP_CACHE[key] = SpanDedup(dup_ref, col=col, n=n)
        return stage(batch)

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def span_dedup_sql(n: int = SPAN_N, min_count: int = SPAN_MIN_COUNT,
                   table: str = "documents") -> str:
    """DuckDB twin: identical `\\S+` tokenization, identical window
    grams, identical count criterion, identical coverage semantics
    (a token survives iff NO duplicated gram occurrence covers it),
    identical single-space reassembly order."""
    return rf"""
WITH d AS (
  SELECT doc_id, regexp_extract_all(text, '\S+') AS ls FROM {table}
), gi AS (
  SELECT doc_id, ls, unnest(generate_series(1, len(ls) - {n} + 1)) AS i
  FROM d WHERE len(ls) >= {n}
), g AS (
  SELECT doc_id, i, array_to_string(ls[i:i+{n - 1}], ' ') AS gram FROM gi
), dup AS (
  SELECT gram FROM g GROUP BY gram HAVING count(*) >= {min_count}
), cov AS (
  SELECT doc_id, i FROM g WHERE gram IN (SELECT gram FROM dup)
), tok AS (
  SELECT doc_id, unnest(ls) AS tok, generate_subscripts(ls, 1) AS j FROM d
), tok_kept AS (
  SELECT t.doc_id, t.j, t.tok FROM tok t
  WHERE NOT EXISTS (SELECT 1 FROM cov c WHERE c.doc_id = t.doc_id
                    AND t.j BETWEEN c.i AND c.i + {n - 1})
), agg AS (
  SELECT doc_id, string_agg(tok, ' ' ORDER BY j) AS clean_text,
         count(*)::BIGINT AS n_kept
  FROM tok_kept GROUP BY doc_id
), tot AS (
  SELECT doc_id, len(ls)::BIGINT AS n_total FROM d
)
SELECT t.doc_id, coalesce(a.clean_text, '') AS clean_text,
       (t.n_total - coalesce(a.n_kept, 0))::BIGINT AS n_removed_tokens
FROM tot t LEFT JOIN agg a USING (doc_id)"""
