"""Bigram PMI phrase mining: top-k adjacent word pairs by pointwise
mutual information (Church & Hanks 1990) with a min-count support
filter — the collocation pass a tokenizer/vocab pipeline runs before
choosing multi-word units.

Scale design (the word_topk bucketed-exact pattern, aggregates.py:12):
- ONE corpus pass emits per-batch COUNT PARTIALS for unigrams and
  bigrams as skinny (key, kind, n) rows (value_counts inside the
  batch — the mergeable sketch; text never crosses the wire), plus two
  total-mass rows per batch. The partials dataset is materialized once
  and consumed twice (candidate pass + unigram lookup pass) instead of
  re-tokenizing the corpus.
- Candidate pass: hash(key) % B bucketed groupby gives EXACT per-key
  sums (every occurrence of a key lands in one bucket); only bigrams
  with n >= min_count survive, plus the summed total rows — the driver
  sees candidates + 2 rows, never the vocabulary.
- Unigram lookup pass: the candidates' member words (a small set)
  broadcast into an isin filter over the unigram partials, then the
  same tiny bucketed sum. No join, no second corpus pass.
- PMI on the driver over the candidate-sized table:
  ln(c_ab * N_uni^2 / (N_bi * c_a * c_b)), i.e. ln(P(ab)/(P(a)P(b))).

Tokenization is \\S+ (the bm25/spandedup contract) so the SQL twin's
regexp_extract_all is exact; counts are integers, so PMI is a log of
a rational both engines compute identically to well past the rounded
6 dp.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .bm25 import _flat_tokens_arrow

_SEP = "\x1f"          # never appears in \S+ tokens' usual alphabets
_TOTAL_KEY = "\x02"    # sorts into one bucket; kind disambiguates


def bigram_pmi(ds, k: int = 30, min_count: int = 5, col: str = "text",
               num_buckets: int | None = None,
               min_count_ppm: float | None = None) -> pd.DataFrame:
    """(w1, w2, n, pmi) top-k by (pmi DESC, w1 ASC, w2 ASC).

    min_count is an ABSOLUTE support floor; the driver-side candidate
    table holds every bigram above it, so a fixed floor is corpus-
    RELATIVE in cost: at 100 TB pass `min_count_ppm` instead and the
    effective floor becomes max(min_count, ppm-of-total-bigram-mass),
    computed from the totals BEFORE the candidate filter (one extra
    bytes-per-block pass over the already-materialized partials) —
    candidate count then tracks the support ratio, not the corpus
    size. The default (None) keeps the absolute floor, which is what
    the SQL twin expresses."""
    from .shuffle import add_bucket_col, default_buckets

    B = num_buckets or default_buckets()

    def partial(batch: pa.Table) -> pa.Table:
        flat, parent = _flat_tokens_arrow(batch[col])
        n_tok = len(flat)
        if n_tok == 0:
            return pa.table({"key": pa.array([], pa.string()),
                             "kind": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        uni = pc.value_counts(flat)
        keys = [uni.field("values")]
        kinds = [np.full(len(uni), "u", dtype=object)]
        ns = [uni.field("counts").to_numpy(zero_copy_only=False)]
        same = pa.array(parent[1:] == parent[:-1])
        n_big = 0
        if n_tok >= 2 and pc.any(same).as_py():
            w1 = flat.slice(0, n_tok - 1).filter(same)
            w2 = flat.slice(1, n_tok - 1).filter(same)
            n_big = len(w1)
            big = pc.value_counts(
                pc.binary_join_element_wise(w1, w2, _SEP))
            keys.append(big.field("values"))
            kinds.append(np.full(len(big), "b", dtype=object))
            ns.append(big.field("counts").to_numpy(zero_copy_only=False))
        keys.append(pa.array([_TOTAL_KEY, _TOTAL_KEY], pa.string()))
        kinds.append(np.array(["TU", "TB"], dtype=object))
        ns.append(np.array([n_tok, n_big], dtype=np.int64))
        return pa.table({
            "key": pa.concat_arrays([a.combine_chunks() if isinstance(
                a, pa.ChunkedArray) else a for a in keys]),
            "kind": pa.array(np.concatenate(kinds), pa.string()),
            "n": pa.array(np.concatenate(ns).astype(np.int64))})

    parts = ds.select_columns([col]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True)
    # consumed twice (candidates, then unigram lookups) — materialize
    # the SKINNY partials rather than re-tokenizing the corpus
    parts = parts.materialize()

    thr = min_count
    if min_count_ppm is not None:
        # scale the support floor with total bigram mass (one cheap
        # pass over the materialized skinny partials)
        def tb_partial(tbl: pa.Table) -> pa.Table:
            m = pc.equal(tbl["kind"], "TB")
            s = pc.sum(pc.if_else(m, tbl["n"],
                                  pa.scalar(0, pa.int64()))).as_py()
            return pa.table({"tb": [int(s or 0)]})

        tbs = parts.map_batches(tb_partial,
                                batch_format="pyarrow").sum("tb")
        total_bigrams = int(tbs or 0)
        thr = max(min_count,
                  int(np.ceil(min_count_ppm * total_bigrams / 1e6)))

    def bucket_candidates(tbl: pa.Table) -> pa.Table:
        df = tbl.to_pandas()
        g = df.groupby(["key", "kind"], sort=False)["n"].sum()
        g = g.reset_index()
        keep = (g["kind"].isin(["TU", "TB"])
                | ((g["kind"] == "b") & (g["n"] >= thr)))
        g = g[keep]
        return pa.table({"key": pa.array(g["key"], pa.string()),
                         "kind": pa.array(g["kind"], pa.string()),
                         "n": pa.array(g["n"].to_numpy(), pa.int64())})

    bucketed = parts.map_batches(
        lambda t: add_bucket_col(t, ["key"], B), batch_format="pyarrow")
    cand = (bucketed.groupby("__bkt")
            .map_groups(bucket_candidates, batch_format="pyarrow")
            .to_pandas())  # candidates + 2 total rows: small
    if cand.empty or "kind" not in cand.columns:
        # zero tokens in the whole corpus: no totals rows were emitted
        return pd.DataFrame({"w1": pd.Series(dtype=object),
                             "w2": pd.Series(dtype=object),
                             "n": pd.Series(dtype=np.int64),
                             "pmi": pd.Series(dtype=np.float64)})
    n_uni = float(cand.loc[cand["kind"] == "TU", "n"].sum())
    n_big = float(cand.loc[cand["kind"] == "TB", "n"].sum())
    cand = cand[cand["kind"] == "b"]
    if cand.empty or n_big == 0:
        return pd.DataFrame({"w1": pd.Series(dtype=object),
                             "w2": pd.Series(dtype=object),
                             "n": pd.Series(dtype=np.int64),
                             "pmi": pd.Series(dtype=np.float64)})
    split = cand["key"].str.split(_SEP, n=1, expand=True)
    cand = pd.DataFrame({"w1": split[0], "w2": split[1],
                         "n": cand["n"].to_numpy(np.int64)})
    words = sorted(set(cand["w1"]) | set(cand["w2"]))

    def uni_partial(tbl: pa.Table) -> pa.Table:
        m = pc.and_(pc.equal(tbl["kind"], "u"),
                    pc.is_in(tbl["key"], value_set=pa.array(
                        words, pa.string())))
        t = tbl.filter(m)
        return pa.table({"key": t["key"], "n": t["n"]})

    def bucket_sum(tbl: pa.Table) -> pa.Table:
        df = tbl.to_pandas()
        g = df.groupby("key", sort=False)["n"].sum().reset_index()
        return pa.table({"key": pa.array(g["key"], pa.string()),
                         "n": pa.array(g["n"].to_numpy(), pa.int64())})

    uni = (parts.map_batches(uni_partial, batch_format="pyarrow")
           .map_batches(lambda t: add_bucket_col(t, ["key"], B),
                        batch_format="pyarrow")
           .groupby("__bkt").map_groups(bucket_sum,
                                        batch_format="pyarrow")
           .to_pandas().set_index("key")["n"])

    ca = uni.reindex(cand["w1"]).to_numpy(np.float64)
    cb = uni.reindex(cand["w2"]).to_numpy(np.float64)
    cab = cand["n"].to_numpy(np.float64)
    cand["pmi"] = np.round(
        np.log(cab * n_uni * n_uni / (n_big * ca * cb)), 6)
    cand = cand.sort_values(["pmi", "w1", "w2"],
                            ascending=[False, True, True],
                            kind="mergesort").head(k)
    return cand[["w1", "w2", "n", "pmi"]].reset_index(drop=True)


def bigram_pmi_sql(k: int = 30, min_count: int = 5,
                   table: str = "documents") -> str:
    """DuckDB twin: identical tokenization, support filter, PMI
    expression, rounding, and total order."""
    return rf"""
WITH d AS (
  SELECT regexp_extract_all(text, '\S+') AS ls FROM {table}
), uni AS (
  SELECT w, count(*)::DOUBLE AS c
  FROM (SELECT unnest(ls) AS w FROM d) GROUP BY w
), nu AS (
  SELECT sum(c) AS n FROM uni
), big AS (
  -- adjacent pairs: duckdb list slices are INCLUSIVE 1-based, so
  -- ls[:-2] drops the last element and zips with ls[2:] pairwise
  SELECT w1, w2, count(*)::DOUBLE AS c
  FROM (SELECT unnest(ls[:-2]) AS w1, unnest(ls[2:]) AS w2 FROM d)
  GROUP BY w1, w2
), nb AS (
  SELECT sum(c) AS n FROM big
), scored AS (
  SELECT w1, w2, big.c::BIGINT AS n,
         round(ln(big.c * nu.n * nu.n / (nb.n * u1.c * u2.c)), 6) AS pmi
  FROM big, nu, nb, uni u1, uni u2
  WHERE u1.w = big.w1 AND u2.w = big.w2 AND big.c >= {min_count}
)
SELECT w1, w2, n, pmi FROM scored
ORDER BY pmi DESC, w1, w2 LIMIT {k}"""
