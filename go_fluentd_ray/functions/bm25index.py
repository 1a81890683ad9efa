"""Persistent BM25 inverted index: the build/query split that makes
lexical retrieval pay off in a batch engine (the keyword-search
counterpart of annindex.py's IVF-PQ split).

The one-shot `bm25.bm25_topk` re-scans the whole corpus per call,
which is the right shape when the query set is known up front but
wrong for a standing index serving many query batches. Production
lexical search builds the inverted file ONCE and amortizes it
(Lucene/Elasticsearch — the reference's own primary sink target,
senders/elasticsearch.go):

- build: ONE corpus pass tokenizes each batch vectorized (dictionary-
  encode the flat tokens, np.unique over combined (row, code) keys)
  and emits skinny postings (term, doc_id, tf, dl) — the classic
  MapReduce inverted-index shape; a second, bytes-per-batch stats pass
  sums (n_docs, sum_dl). Postings shard by blake2b(term) % N_SHARDS
  into hive dirs, so ALL postings of a term land in ONE shard and df
  is exact within a pruned read; one skinny (shard, term) sort makes
  dirs pure and row-group term stats tight. ~30 B/posting crosses the
  wire, never the text.
- query: read ONLY the shard dirs holding the query terms' hashes
  (dir-level pruning; ray's parquet filter can't prune hive partition
  columns — explicit paths can) under a row-level `term isin` filter,
  then two skinny aggregates over the pruned postings: per-term df
  (fixed-width bincount partials + Dataset.sum) and per-doc tf pivoted
  into fixed query-term-order int64 columns (integer sums commute
  exactly, so groupby order can't perturb floats). Scoring replays
  bm25_topk's fixed-order float64 loop over the aggregated candidates
  — the output is value-identical to the one-shot path and is checked
  against the SAME DuckDB SQL twin (bm25.bm25_topk_sql) by the driver.

Scale shape: build = one corpus pass + one skinny postings shuffle
(both distributed; driver holds only meta); query = pruned skinny
scan + a candidate-sized groupby + a k-rows-per-batch reduce. A
stop-word query term still costs its full posting list — as in any
inverted index — but the list is postings, never documents.

Incremental maintenance (append_bm25_index): new ingest batches fold
in as NEW posting files inside the existing term-shard dirs plus exact
integer (n_docs, sum_dl) meta deltas — the sink-side analogue of the
reference journal's tailing continuous operation (journal.go:495-511):
the index absorbs each batch for one batch-sized pass, and queries over
the appended index equal a full rebuild over the union corpus exactly
(df/tf/avgdl all commute as integer sums). A staleness counter triggers
a full rebuild once appends exceed STALENESS_REBUILD_FRAC of the base.
"""

from __future__ import annotations

import glob
import hashlib
import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa

from .bm25 import (BM25_B, BM25_K1, BM25_QUERIES, _flat_tokens_arrow,
                   _query_terms)

N_SHARDS = 64
# bump when postings/tokenize semantics change: ensure_bm25_index's
# cache key includes it so a persisted /tmp index can never serve
# results from an older layout (v2: meta carries exact sum_dl +
# append counters so incremental appends stay avgdl-exact)
INDEX_VERSION = 2

# incremental staleness: once appended docs exceed this fraction of
# the docs the index was last FULLY built over, the maintainer
# (stages/indexingest.run_index_ingest) pays a full rebuild. For BM25
# appends are EXACT (postings/df/avgdl all sum), so the trigger only
# bounds file-count fragmentation of the shard dirs; for IVF-PQ it
# also bounds frozen-centroid decay (appended rows are encoded against
# the base model, which drifts from the union distribution).
STALENESS_REBUILD_FRAC = 0.5


def _term_shard(terms: "list[str]") -> np.ndarray:
    """Deterministic cross-process shard per term (blake2b, not
    python hash — sketches._hash64's stability contract)."""
    return np.array(
        [int.from_bytes(hashlib.blake2b(t.encode(), digest_size=8)
                        .digest(), "little") % N_SHARDS
         for t in terms], dtype=np.int32)


def _postings_ds(ds, col: str, id_col: str):
    """Skinny postings dataset (term, doc_id, tf, dl, shard) — shared
    by full build and incremental append so both write byte-compatible
    shard files."""

    def postings(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        flat, parent = _flat_tokens_arrow(batch[col])
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        dl = np.bincount(parent, minlength=len(batch)).astype(np.int32)
        if len(flat) == 0:
            return pa.table({
                "term": pa.array([], pa.string()),
                "doc_id": pa.array([], pa.int64()),
                "tf": pa.array([], pa.int32()),
                "dl": pa.array([], pa.int32()),
                "shard": pa.array([], pa.int32())})
        denc = pc.dictionary_encode(flat)
        codes = denc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        vocab = denc.dictionary.to_pylist()
        # distinct (doc row, term code) + counts in one vectorized pass
        key = parent.astype(np.int64) * len(vocab) + codes
        ukey, tf = np.unique(key, return_counts=True)
        urow = ukey // len(vocab)
        ucode = (ukey % len(vocab)).astype(np.int64)
        shard_of = _term_shard(vocab)  # per DISTINCT term, not per token
        return pa.table({
            "term": pa.array(vocab, pa.string()).take(pa.array(ucode)),
            "doc_id": pa.array(ids[urow], type=pa.int64()),
            "tf": pa.array(tf.astype(np.int32)),
            "dl": pa.array(dl[urow]),
            "shard": pa.array(shard_of[ucode])})

    return ds.select_columns([id_col, col]).map_batches(
        postings, batch_format="pyarrow", zero_copy_batch=True)


def _corpus_sums(ds, col: str) -> "tuple[int, int]":
    """Exact (n_docs, sum_dl) integer totals for a corpus slice."""

    def stats_partial(batch: pa.Table) -> pa.Table:
        flat, _ = _flat_tokens_arrow(batch[col])
        return pa.table({"n_docs": [len(batch)], "sum_dl": [len(flat)]})

    sums = ds.select_columns([col]).map_batches(
        stats_partial, batch_format="pyarrow",
        zero_copy_batch=True).sum(["n_docs", "sum_dl"])
    if sums is None:          # empty slice
        return 0, 0
    return int(sums["sum(n_docs)"]), int(sums["sum(sum_dl)"])


def _write_postings(ds, out_dir: str, col: str, id_col: str) -> None:
    # skinny all-to-all: shard-contiguous layout keeps hive dirs pure,
    # term-sorted row groups keep min/max stats tight for the isin scan
    _postings_ds(ds, col, id_col).sort(["shard", "term"]).write_parquet(
        os.path.join(out_dir, "postings"), partition_cols=["shard"])


def _save_meta(out_dir: str, meta: dict) -> None:
    """Atomic meta write: appends update meta in place and a reader
    must never see a torn file."""
    import tempfile

    fd, tmp = tempfile.mkstemp(dir=out_dir, suffix=".mtmp")
    os.close(fd)
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.rename(tmp, os.path.join(out_dir, "meta.json"))


def build_bm25_index(ds, out_dir: str, col: str = "text",
                     id_col: str = "doc_id") -> dict:
    """Tokenize + postings + shard sort + hive write. Returns the
    meta dict (also written to out_dir/meta.json)."""
    n_docs, sum_dl = _corpus_sums(ds, col)
    _write_postings(ds, out_dir, col, id_col)
    meta = {"n_docs": n_docs, "sum_dl": sum_dl,
            "avgdl": float(sum_dl) / max(n_docs, 1),
            "n_shards": N_SHARDS, "version": INDEX_VERSION,
            "base_docs": n_docs, "appended_docs": 0}
    _save_meta(out_dir, meta)
    return meta


def append_bm25_index(index_dir: str, ds, col: str = "text",
                      id_col: str = "doc_id") -> dict:
    """Incremental maintenance: fold a NEW batch of docs into an
    existing index — new posting files land in the existing
    blake2b(term) shard dirs (write_parquet appends; per-write uuid
    filenames can't collide), and meta folds exact integer
    (n_docs, sum_dl) deltas, so avgdl/df/tf all equal a full rebuild
    over the union corpus bit-for-bit (asserted in pytest). The daily-
    ingest user pays one corpus-slice pass per batch instead of the
    full build wall; stages/indexingest.run_index_ingest drives this
    under the ingest lease with the staleness rebuild trigger.

    Precondition: appended batches carry doc_ids DISJOINT from
    everything already indexed — append-only postings would double-
    count a re-ingested doc's df/tf. run_index_ingest's file-claiming
    state guarantees it; direct callers own it."""
    with open(os.path.join(index_dir, "meta.json")) as f:
        meta = json.load(f)
    if "sum_dl" not in meta:
        raise ValueError(
            f"index at {index_dir} predates v2 (no exact sum_dl); "
            "rebuild before appending")
    n_new, dl_new = _corpus_sums(ds, col)
    if n_new == 0:
        return meta
    _write_postings(ds, index_dir, col, id_col)
    meta["n_docs"] += n_new
    meta["sum_dl"] += dl_new
    meta["avgdl"] = float(meta["sum_dl"]) / max(meta["n_docs"], 1)
    meta["appended_docs"] = meta.get("appended_docs", 0) + n_new
    _save_meta(index_dir, meta)
    return meta


def needs_rebuild(index_dir: str,
                  frac: float = STALENESS_REBUILD_FRAC) -> bool:
    """Staleness trigger: appended docs exceed `frac` of the last full
    build's corpus."""
    with open(os.path.join(index_dir, "meta.json")) as f:
        meta = json.load(f)
    return meta.get("appended_docs", 0) > frac * max(
        meta.get("base_docs", meta["n_docs"]), 1)


def _shard_files(index_dir: str, shards) -> "list[str]":
    return [f for s in sorted(set(int(s) for s in shards))
            for f in sorted(glob.glob(os.path.join(
                index_dir, "postings", f"shard={s}", "*.parquet")))]


def _empty_result() -> pd.DataFrame:
    return pd.DataFrame({"qid": np.empty(0, np.int64),
                         "rank": np.empty(0, np.int64),
                         "doc_id": np.empty(0, np.int64)})


def bm25_index_query(index_dir: str, queries=BM25_QUERIES, k: int = 10,
                     k1: float = BM25_K1, b: float = BM25_B) -> pd.DataFrame:
    """Top-k per query over a persisted index: touches ONLY the probed
    posting shards. Output contract = bm25.bm25_topk (qid, rank,
    doc_id) under (score DESC, doc_id ASC)."""
    import pyarrow.compute as pc
    import ray.data as rd

    from .shuffle import add_bucket_col, default_buckets

    with open(os.path.join(index_dir, "meta.json")) as f:
        meta = json.load(f)
    n_docs, avgdl = float(meta["n_docs"]), float(meta["avgdl"])

    terms, per_q = _query_terms(queries)
    T = len(terms)
    files = _shard_files(index_dir, _term_shard(terms))
    if not files:
        return _empty_result()
    flt = pc.field("term").isin(pa.array(terms, pa.string()))
    idx = rd.read_parquet(files, columns=["term", "doc_id", "tf", "dl"],
                          filter=flt)

    def _tidx(batch: pa.Table) -> np.ndarray:
        """Query-term index per posting row, via the (tiny) per-batch
        term dictionary — no per-row python."""
        denc = pc.dictionary_encode(batch["term"].combine_chunks())
        lut = np.array([terms.index(t) for t in
                        denc.dictionary.to_pylist()], dtype=np.int64)
        return lut[denc.indices.to_numpy(zero_copy_only=False)]

    def pivot(batch: pa.Table) -> pa.Table:
        """Per-batch partial: one row per distinct doc, tf scattered
        into fixed query-term-order int64 columns (exact under any
        downstream sum order)."""
        ti = _tidx(batch)
        doc = batch["doc_id"].to_numpy()
        tf = batch["tf"].to_numpy().astype(np.int64)
        dl = batch["dl"].to_numpy().astype(np.int64)
        udoc, first, inv = np.unique(doc, return_index=True,
                                     return_inverse=True)
        mat = np.zeros((len(udoc), T), dtype=np.int64)
        np.add.at(mat, (inv, ti), tf)
        # dl rides per doc (same value on every posting of a doc)
        cols = {"doc_id": pa.array(udoc, type=pa.int64()),
                "dl": pa.array(dl[first])}
        for i in range(T):
            cols[f"tf_{i}"] = pa.array(mat[:, i])
        return pa.table(cols)

    def df_partial(batch: pa.Table) -> pa.Table:
        ti = _tidx(batch)
        cnt = np.bincount(ti, minlength=T)
        return pa.table({f"df_{i}": [int(cnt[i])] for i in range(T)})

    # df: every posting row of a term is one distinct (term, doc) pair
    dfs = idx.map_batches(df_partial, batch_format="pyarrow").sum(
        [f"df_{i}" for i in range(T)])
    if dfs is None:  # pruned read matched zero postings
        return _empty_result()
    idf = np.array([np.log(1.0 + (n_docs - dfs[f"sum(df_{i})"] + 0.5)
                           / (dfs[f"sum(df_{i})"] + 0.5))
                    for i in range(T)])

    # candidates: docs matching >= 1 query term, tf per term exact.
    # Bucketed hash(doc_id) % B map_groups sum, NOT Dataset.aggregate —
    # the stop-word worst case makes the candidate set corpus-sized
    # (measured 14.4 s aggregate vs 1.0 s bucketed at 1M docs where
    # EVERY query term is a stop word), and a doc's postings all land
    # in one bucket so the bucket sums are exact
    B = default_buckets()

    def bucket_sum(tbl: pa.Table) -> pa.Table:
        df = tbl.to_pandas()
        g = df.groupby("doc_id", sort=False).agg(
            {"dl": "max", **{f"tf_{i}": "sum" for i in range(T)}})
        g = g.reset_index()
        return pa.table(
            {"doc_id": pa.array(g["doc_id"].to_numpy(), pa.int64()),
             "dl": pa.array(g["dl"].to_numpy(), pa.int64()),
             **{f"tf_{i}": pa.array(g[f"tf_{i}"].to_numpy(), pa.int64())
                for i in range(T)}})

    cand = (idx.map_batches(pivot, batch_format="pyarrow")
            .map_batches(lambda t: add_bucket_col(t, ["doc_id"], B),
                         batch_format="pyarrow")
            .groupby("__bkt")
            .map_groups(bucket_sum, batch_format="pyarrow"))

    def score_partial(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        dl = batch["dl"].to_numpy().astype(np.float64)
        tf = np.stack([batch[f"tf_{i}"].to_numpy().astype(np.float64)
                       for i in range(T)])
        denom_base = k1 * (1.0 - b + b * dl / avgdl)
        out_qid, out_id, out_score = [], [], []
        for qi, idxs in enumerate(per_q):
            s = np.zeros(len(ids))
            for i in idxs:  # fixed term order = bm25_topk's float path
                s += idf[i] * (tf[i] * (k1 + 1.0)) / (tf[i] + denom_base)
            m = s > 0.0
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
                               else np.empty(0, np.int64),
                               type=pa.int64()),
            "score": pa.array(np.concatenate(out_score) if out_score
                              else np.empty(0, np.float64))})

    parts = cand.map_batches(score_partial, batch_format="pyarrow")
    df = parts.to_pandas()  # k rows per (query, batch): tiny
    if df.empty:
        return _empty_result()
    df = df.sort_values(["qid", "score", "doc_id"],
                        ascending=[True, False, True], kind="mergesort")
    out = df.groupby("qid", sort=True).head(k).reset_index(drop=True)
    out["rank"] = out.groupby("qid").cumcount().astype(np.int64)
    return out[["qid", "rank", "doc_id"]]


def ensure_bm25_index(sf_dir: str, ds,
                      cache_root: str = "/tmp/graft_bm25_index") -> str:
    """Build-once cache keyed (version, sf_dir) — annindex.ensure_index
    contract: tmp build + atomic rename, concurrent losers discard."""
    import shutil
    import tempfile

    out = os.path.join(cache_root,
                       f"v{INDEX_VERSION}-"
                       + os.path.basename(os.path.normpath(sf_dir)))
    if os.path.exists(os.path.join(out, "meta.json")):
        return out
    os.makedirs(cache_root, exist_ok=True)
    tmp = tempfile.mkdtemp(dir=cache_root, prefix=".build-")
    build_bm25_index(ds, tmp)
    try:
        os.rename(tmp, out)
    except OSError:
        if not os.path.exists(os.path.join(out, "meta.json")):
            raise
        shutil.rmtree(tmp, ignore_errors=True)
    return out


def bm25_indexed(sf_dir: str, ds, queries=BM25_QUERIES,
                 k: int = 10) -> pd.DataFrame:
    """Query entry point: build-once (cached) + pruned query."""
    idx = ensure_bm25_index(sf_dir, ds)
    return bm25_index_query(idx, queries=queries, k=k)
