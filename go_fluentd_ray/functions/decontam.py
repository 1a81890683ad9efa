"""Benchmark decontamination: drop training documents that share any
word n-gram with an evaluation/benchmark set (the GPT-3 / PaLM
"13-gram overlap" procedure, scaled down to the synthetic corpus's
short documents).

Scale design (100 TB corpus, small benchmark side):
- The benchmark side is SMALL by definition (eval suites are 10^3-10^5
  documents). Its distinct n-grams are computed DISTRIBUTED (per-batch
  distinct inside map_batches), and only the already-deduplicated gram
  list is collected and `ray.put` once — the corpus never moves.
- The corpus-side filter is a pure map over batches with an ACTOR POOL
  stage: each actor calls ray.get(gram_ref) once in __init__ and holds
  the frozenset for its lifetime; per-batch work is C-hash membership
  probes per gram. The corpus is read once, filtered map-side — zero
  shuffles.
- For benchmark sets too large to hold as a frozenset per worker, the
  same stage can hold a bitarray Bloom filter instead (build with
  `gram_bloom`); membership probes then cost O(k) numpy ops per batch
  and false positives only ever DROP extra training docs (safe
  direction for decontamination). The exact-set path is the default
  and the one the SQL oracle checks.

Tokenization is `\\w+` (ASCII corpus), identical to the DuckDB twin's
regexp_extract_all, and n-grams are space-joined token windows.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

_TOKEN = re.compile(r"\w+")


def _doc_grams(text: str, n: int) -> "list[str]":
    toks = _TOKEN.findall(text)
    return [" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)]


def bench_gram_set(bench_ds, n: int = 3, col: str = "text"):
    """Distinct n-grams of the benchmark side, deduplicated inside each
    batch before anything is collected. Returns a frozenset."""

    def distinct_grams(batch: pa.Table) -> pa.Table:
        grams = set()
        for t in batch[col].to_pylist():
            grams.update(_doc_grams(t, n))
        return pa.table({"gram": pa.array(sorted(grams), type=pa.string())})

    parts = bench_ds.map_batches(
        distinct_grams, batch_format="pyarrow", zero_copy_batch=True
    ).take_all()  # small side only: distinct grams of the eval set
    out: set = set()
    for row in parts:
        out.add(row["gram"])
    return frozenset(out)


def gram_bloom(grams, n_bits: int = 1 << 22, k: int = 4):
    """Optional Bloom filter over a gram iterable for benchmark sets too
    large to broadcast exactly. False positives only drop extra
    training docs — the safe direction for decontamination."""
    bits = np.zeros(n_bits, dtype=bool)
    for g in grams:
        h = hash(g) & 0xFFFFFFFFFFFFFFFF
        for i in range(k):
            bits[(h >> (i * 13)) % n_bits] = True
    return bits


class Decontaminator:
    """Actor-pool stage: deserializes the broadcast gram set once per
    actor (__init__), probes per batch (__call__)."""

    def __init__(self, gram_ref, n: int = 3, col: str = "text"):
        import ray

        self.grams = ray.get(gram_ref)
        self.n = n
        self.col = col

    def __call__(self, batch: pa.Table) -> pa.Table:
        grams, n = self.grams, self.n
        keep = np.ones(len(batch), dtype=bool)
        for i, t in enumerate(batch[self.col].to_pylist()):
            toks = _TOKEN.findall(t)
            for j in range(len(toks) - n + 1):
                if " ".join(toks[j:j + n]) in grams:
                    keep[i] = False
                    break
        return batch.filter(pa.array(keep))


def decontaminate(docs_ds, bench_ds, n: int = 3, col: str = "text",
                  concurrency=None):
    """Drop every document of docs_ds sharing at least one word n-gram
    with bench_ds. Returns the surviving rows with their full schema."""
    import ray

    from .similarity import scan_pool

    if concurrency is None:
        # the probe stage is the CPU-bound pass; a fixed small pool
        # capped it regardless of cluster size
        concurrency = scan_pool()
    gram_ref = ray.put(bench_gram_set(bench_ds, n=n, col=col))
    return docs_ds.map_batches(
        Decontaminator, fn_constructor_kwargs={
            "gram_ref": gram_ref, "n": n, "col": col},
        batch_format="pyarrow", zero_copy_batch=True,
        concurrency=concurrency)


def decontaminate_sql(n: int = 3, bench_rate_pct: int = 2,
                      table: str = "documents") -> str:
    """DuckDB twin with the benchmark side defined as the deterministic
    hash_sample(bench_rate_pct) of the same table (the query harness
    has no external eval table; the operator itself takes any
    Dataset as the benchmark side)."""
    span = n - 1
    return f"""
WITH bench AS (
  SELECT text FROM {table}
  WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT
        % 100 < {bench_rate_pct}
),
btok AS (SELECT regexp_extract_all(text, '\\w+') AS toks FROM bench),
bgram AS (
  SELECT DISTINCT array_to_string(toks[i:i+{span}], ' ') AS gram
  FROM (SELECT toks,
               unnest(generate_series(1, greatest(length(toks) - {span}, 0)))
               AS i
        FROM btok)
),
dtok AS (SELECT doc_id, regexp_extract_all(text, '\\w+') AS toks
         FROM {table}),
dgram AS (
  SELECT DISTINCT doc_id, array_to_string(toks[i:i+{span}], ' ') AS gram
  FROM (SELECT doc_id, toks,
               unnest(generate_series(1, greatest(length(toks) - {span}, 0)))
               AS i
        FROM dtok)
)
SELECT * FROM {table}
WHERE doc_id NOT IN (SELECT DISTINCT doc_id FROM dgram
                     JOIN bgram USING (gram))"""


# ---------------------------------------------------------------------------
# Embedding-space (semantic) decontamination


def bench_embedding_matrix(bench_ds, col: str = "embedding") -> np.ndarray:
    """Benchmark embeddings as a unit-normalized float64 matrix. The
    benchmark side is SMALL by definition (eval suites are 10^3-10^5
    rows); only the projected embedding column is collected."""
    from .similarity import emb_matrix

    parts = []
    for batch in bench_ds.select_columns([col]).iter_batches(
            batch_size=None, batch_format="pyarrow"):
        if batch.num_rows:
            parts.append(emb_matrix(batch[col]))
    if not parts:
        raise ValueError("benchmark side has no rows")
    B = np.concatenate(parts)
    return B / np.linalg.norm(B, axis=1, keepdims=True)


def semantic_decontaminate(corpus_ds, bench_ds, threshold: float = 0.30,
                           col: str = "embedding", keep_cols=None):
    """Embedding-space decontamination: drop every corpus row whose
    cosine similarity to ANY benchmark embedding >= threshold —
    the paraphrase-level leakage the n-gram rule (decontaminate)
    cannot see (a reworded benchmark question shares no 3-gram but
    sits next to it in embedding space).

    Scale design mirrors decontaminate's small-side broadcast: the
    normalized benchmark matrix is built once and ray.put ONCE; the
    corpus-side filter is one matmul + rowwise max per batch in task
    mode (the broadcast matrix is numpy — zero-copy from local plasma
    per task, no actor pool needed). Zero shuffles; the corpus is read
    once and never moves. For a benchmark too large for one worker's
    matrix, chunk the matmul over benchmark slices (the max over
    slices is associative); the broadcast stays one object either way.

    keep_cols optionally projects the surviving rows (the embedding
    column itself is usually not wanted downstream)."""
    import ray

    from .similarity import emb_matrix

    bref = ray.put(bench_embedding_matrix(bench_ds, col=col))

    def clean(batch: pa.Table) -> pa.Table:
        B = ray.get(bref)                       # zero-copy local plasma
        E = emb_matrix(batch[col])
        En = E / np.linalg.norm(E, axis=1, keepdims=True)
        mx = (En @ B.T).max(axis=1)
        out = batch.filter(pa.array(mx < threshold))
        return out.select(keep_cols) if keep_cols else out

    return corpus_ds.map_batches(clean, batch_format="pyarrow",
                                 zero_copy_batch=True)


def semantic_decontaminate_sql(threshold: float = 0.30,
                               bench_mod: int = 17,
                               table: str = "embeddings") -> str:
    """DuckDB twin with the benchmark side defined as the deterministic
    vec_id % bench_mod == 0 split of the same table (the harness has
    no external eval table; the operator itself takes any Dataset as
    the benchmark side)."""
    return f"""
WITH bench AS (
  SELECT embedding FROM {table} WHERE vec_id % {bench_mod} = 0
)
SELECT c.vec_id, c.label FROM {table} c
WHERE c.vec_id % {bench_mod} <> 0
  AND NOT EXISTS (
    SELECT 1 FROM bench b
    WHERE list_cosine_similarity(c.embedding, b.embedding)
          >= {threshold})"""
