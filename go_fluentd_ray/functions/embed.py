"""Feature-hash text embeddings: deterministic, model-free dense
vectors from raw text (Weinberger et al. 2009 hashing trick, the
HashingVectorizer construction), so the ANN / semantic-similarity
family runs on corpora that ship no embedding column.

Construction: the multiset of char k-shingle rolling hashes (the same
shingle kernel as the minhash family, dedup._shingle_hashes but WITHOUT
the distinct step — repeat shingles add weight, i.e. tf weighting),
each hash scattered to index h % dim with sign ±1 from an avalanche
bit (the signed hashing variant that makes collisions cancel in
expectation), then L2-normalized float32. No model, no fit pass, no
state: every batch embeds independently, so the op is pure map-side
and trivially deterministic across processes.

`text_knn` fuses embed + brute-force cosine scan into ONE corpus pass:
the query matrix (a handful of query strings embedded driver-side)
rides in the task closure, each batch embeds itself, scores, and emits
only a local top-k partial under the global (sim DESC, doc_id ASC)
total order — the knn_bruteforce partial pattern (similarity.py:73)
with the embedding materialization step deleted entirely.

Scale shape: zero shuffles, zero fit passes, k rows per (query, batch)
to the driver reduce. At 100 TB this is a single streaming scan.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

DEFAULT_DIM = 256
SHINGLE_K = 4
_ROLL_P = np.uint64(1000003)          # dedup._shingle_hashes kernel
_MIX = np.uint64(0x9E3779B97F4A7C15)  # splitmix64 avalanche constant

TEXT_KNN_QUERIES = (
    "hash join table scan",
    "window sort merge batch",
    "customer column value query",
)


def _shingle_multiset(text: str, k: int = SHINGLE_K) -> np.ndarray:
    """ALL k-char-shingle rolling hashes (repeats kept — tf weights),
    uint64 wraparound arithmetic."""
    b = np.frombuffer(text.encode("utf-8", "ignore"), dtype=np.uint8)
    if len(b) < k:
        b = np.pad(b, (0, k - len(b)), constant_values=32)
    m = np.lib.stride_tricks.sliding_window_view(b, k).astype(np.uint64)
    powers = _ROLL_P ** np.arange(k, dtype=np.uint64)
    return (m * powers).sum(axis=1, dtype=np.uint64)


def hash_embed(texts, dim: int = DEFAULT_DIM) -> np.ndarray:
    """(len(texts), dim) float32 unit vectors (all-zero rows for
    degenerate inputs stay zero). Vectorized: one concat + one
    weighted bincount per batch."""
    n = len(texts)
    if n == 0:
        return np.zeros((0, dim), dtype=np.float32)
    hs = [_shingle_multiset(t if isinstance(t, str) else str(t))
          for t in texts]
    lens = np.array([len(h) for h in hs], dtype=np.int64)
    flat = np.concatenate(hs) if hs else np.empty(0, np.uint64)
    parent = np.repeat(np.arange(n, dtype=np.int64), lens)
    mixed = flat * _MIX                        # uint64 wrap = avalanche
    idx = (mixed % np.uint64(dim)).astype(np.int64)
    sign = np.where((mixed >> np.uint64(63)) & np.uint64(1), -1.0, 1.0)
    M = np.bincount(parent * dim + idx, weights=sign,
                    minlength=n * dim).reshape(n, dim)
    norms = np.linalg.norm(M, axis=1, keepdims=True)
    norms[norms == 0.0] = 1.0
    return (M / norms).astype(np.float32)


def embed_docs(ds, dim: int = DEFAULT_DIM, col: str = "text",
               id_col: str = "doc_id"):
    """Dataset (id_col, embedding list<float32>) — map-side only."""

    def embatch(batch: pa.Table) -> pa.Table:
        E = hash_embed(batch[col].to_pylist(), dim)
        return pa.table({
            id_col: batch[id_col],
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(E.reshape(-1), pa.float32()), dim)})

    return ds.select_columns([id_col, col]).map_batches(
        embatch, batch_format="pyarrow", zero_copy_batch=True)


def text_knn(ds, query_texts=TEXT_KNN_QUERIES, k: int = 5,
             dim: int = DEFAULT_DIM, col: str = "text",
             id_col: str = "doc_id") -> pd.DataFrame:
    """Top-k most-similar docs per query STRING in one fused corpus
    pass (embed + score + local top-k per batch)."""
    Q = hash_embed(list(query_texts), dim)     # (nq, dim), unit rows

    def score(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        En = hash_embed(batch[col].to_pylist(), dim)
        sims = Q @ En.T                        # nq x batch
        kk = min(k, sims.shape[1])
        order = np.lexsort((np.broadcast_to(ids, sims.shape), -sims),
                           axis=1)[:, :kk]
        qid = np.repeat(np.arange(sims.shape[0]), kk)
        vid = ids[order.reshape(-1)]
        sim = sims[qid, order.reshape(-1)]
        return pa.table({
            "qid": pa.array(qid.astype(np.int64)),
            "doc_id": pa.array(vid, type=pa.int64()),
            "sim": pa.array(sim.astype(np.float64))})

    partials = ds.select_columns([id_col, col]).map_batches(
        score, batch_format="pyarrow", batch_size=None,
        zero_copy_batch=True)
    df = partials.to_pandas()  # k rows per (query, batch): tiny
    df = df.sort_values(["qid", "sim", "doc_id"],
                        ascending=[True, False, True], kind="mergesort")
    out = df.groupby("qid", sort=True).head(k).reset_index(drop=True)
    out["rank"] = out.groupby("qid").cumcount().astype(np.int64)
    out["sim"] = out["sim"].round(4)
    return out[["qid", "rank", "doc_id", "sim"]]


def text_knn_indexed(sf_dir: str, ds, query_texts=TEXT_KNN_QUERIES,
                     k: int = 5, dim: int = DEFAULT_DIM,
                     col: str = "text", id_col: str = "doc_id",
                     **build_kwargs) -> pd.DataFrame:
    """Indexed tier for raw-text corpora: embed_docs ->
    build-once IVF-PQ index (annindex.ensure_index, keyed separately
    from the embeddings-table index) -> pruned ADC query with the
    query STRINGS hash-embedded as the query matrix. Same output
    contract as text_knn (qid, rank, doc_id, sim); at scale the
    per-query-batch cost is the probed code shards + the candidate
    embedding-store shards instead of text_knn's full corpus scan."""
    from .annindex import ensure_index, knn_ivfpq_query

    emb = embed_docs(ds, dim=dim, col=col, id_col=id_col).map_batches(
        lambda t: t.rename_columns(["vec_id", "embedding"]),
        batch_format="pyarrow")
    idx = ensure_index(sf_dir, emb, key_extra=f"textknn-d{dim}",
                       **build_kwargs)
    Q = hash_embed(list(query_texts), dim).astype(np.float64)
    out = knn_ivfpq_query(idx, emb, k=k, Q=Q)
    out = out.rename(columns={"vec_id": id_col})
    out["sim"] = out["sim"].round(4)
    return out


def text_knn_indexed_recall(sf_dir: str, ds,
                            query_texts=TEXT_KNN_QUERIES, k: int = 5,
                            dim: int = DEFAULT_DIM,
                            **build_kwargs) -> pd.DataFrame:
    """recall@k of the indexed text-kNN tier vs the fused brute-force
    scan — the driver-visible quality gate (knn_ivfpq_indexed_recall
    pattern applied to the text composition)."""
    bf = text_knn(ds, query_texts=query_texts, k=k, dim=dim)
    iv = text_knn_indexed(sf_dir, ds, query_texts=query_texts, k=k,
                          dim=dim, **build_kwargs)
    qids = sorted(bf["qid"].unique())
    recalls = []
    for qid in qids:
        truth = set(bf.loc[bf["qid"] == qid, "doc_id"])
        got = set(iv.loc[iv["qid"] == qid, "doc_id"])
        recalls.append(len(truth & got) / max(len(truth), 1))
    return pd.DataFrame({"qid": np.array(qids + [-1], dtype=np.int64),
                         "recall_at_k": np.round(
                             recalls + [float(np.mean(recalls))], 4)})
