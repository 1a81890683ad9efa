"""Similarity search over an embeddings table (vec_id, embedding, label).

- knn_bruteforce: exact top-k cosine per query. The query matrix is
  broadcast once (ray.put) and every batch does one float64 matmul
  against it; each batch emits its local top-k PARTIALS and a final
  tiny reduce keeps the global top-k — so nothing but k rows per batch
  ever crosses the wire (the pre-aggregation pattern).
- knn_ivf: the scale path — k-means-lite coarse centroids (fit on a
  sample), batches route vectors to their nearest centroid bucket,
  queries probe only the closest nprobe buckets, and each batch emits
  only its local top-k per query (same partial pattern as brute force).
  Approximate.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

N_QUERIES = 8


def query_matrix(dim: int, n: int = N_QUERIES, seed: int = 777) -> np.ndarray:
    """Deterministic pseudo-random unit queries (shared with the SQL
    oracle, which receives them as literals)."""
    rng = np.random.default_rng(seed)
    q = rng.standard_normal((n, dim))
    return q / np.linalg.norm(q, axis=1, keepdims=True)


def knn_bruteforce(ds, k: int = 5):
    import ray
    from ray.data.aggregate import AggregateFn  # noqa: F401  (doc pointer)

    dim = len(ds.take(1)[0]["embedding"])
    Q = query_matrix(dim)
    qref = ray.put(Q)

    class Score:
        def __init__(self):
            self.Q = ray.get(qref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch["vec_id"].to_numpy()
            E = np.stack([np.asarray(v, dtype=np.float64)
                          for v in batch["embedding"].to_pylist()])
            En = E / np.linalg.norm(E, axis=1, keepdims=True)
            sims = self.Q @ En.T                      # nq x batch
            kk = min(k, sims.shape[1])
            # deterministic tie-break (sim DESC, vec_id ASC): each
            # batch's local top-k under the same TOTAL order the global
            # reduce uses, so results don't depend on block boundaries
            # (argpartition drops boundary ties arbitrarily)
            order = np.lexsort((np.broadcast_to(ids, sims.shape), -sims),
                               axis=1)[:, :kk]
            qid = np.repeat(np.arange(sims.shape[0]), kk)
            vid = ids[order.reshape(-1)]
            sim = sims[qid, order.reshape(-1)]
            return pa.table({
                "qid": pa.array(qid.astype(np.int64)),
                "vec_id": pa.array(vid, type=pa.int64()),
                "sim": pa.array(sim),
            })

    partials = ds.map_batches(Score, batch_format="pyarrow", concurrency=2)
    df = partials.to_pandas()  # k rows per (query, batch): tiny
    df = df.sort_values(["qid", "sim", "vec_id"],
                        ascending=[True, False, True], kind="mergesort")
    out = df.groupby("qid", sort=True).head(k).reset_index(drop=True)
    out["rank"] = out.groupby("qid").cumcount().astype(np.int64)
    out["sim"] = out["sim"].round(4)
    return out[["qid", "rank", "vec_id", "sim"]]


def knn_bruteforce_sql(dim: int, k: int = 5,
                       table: str = "embeddings") -> str:
    Q = query_matrix(dim)
    rows = ",\n    ".join(
        "({}, [{}]::DOUBLE[])".format(
            i, ", ".join(repr(float(v)) for v in Q[i]))
        for i in range(Q.shape[0]))
    return f"""
WITH q(qid, qv) AS (VALUES
    {rows}
),
scored AS (
  SELECT q.qid, e.vec_id,
         list_cosine_similarity(e.embedding, q.qv) AS sim
  FROM {table} e CROSS JOIN q
),
ranked AS (
  SELECT qid, vec_id, sim,
         row_number() OVER (PARTITION BY qid
                            ORDER BY sim DESC, vec_id) - 1 AS rank
  FROM scored
)
SELECT qid::BIGINT AS qid, rank::BIGINT AS rank, vec_id
FROM ranked WHERE rank < {k}
"""


def deterministic_sample(ds, n: int, id_col: str, cols: "list[str]"):
    """Order-free deterministic sample: the n rows with smallest
    (md5(id), id). take(n) depends on block arrival order (NOT stable
    across executions — a measured pitfall), so this runs a per-batch
    min-n partial, coalesces, reduces once more, and only then takes
    the tiny final candidate set on the driver (<= 8n rows)."""
    import hashlib

    def local_min(batch: pa.Table) -> pa.Table:
        h = np.array(
            [int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16)
             for i in batch[id_col].to_pylist()], dtype=np.int64)
        t = batch.select([id_col] + cols).append_column(
            "__h", pa.array(h, type=pa.int64()))
        idx = np.lexsort((batch[id_col].to_numpy(), h))[:n]
        return t.take(pa.array(idx, type=pa.int64()))

    part = ds.map_batches(local_min, batch_format="pyarrow",
                          zero_copy_batch=True)
    part = part.repartition(8, shuffle=False).map_batches(
        local_min, batch_format="pyarrow")
    df = part.to_pandas()
    df = df.sort_values(["__h", id_col], kind="mergesort").head(n)
    return df.drop(columns="__h").reset_index(drop=True)


def fit_centroids(ds, n_centroids: int, sample_n: int = 2048,
                  iters: int = 5, seed: int = 99) -> np.ndarray:
    """Deterministic k-means-lite on a driver-side sample: unit-norm
    centroids for cosine assignment. The sample is picked by min-md5
    of vec_id (order-free, so centroids — and everything derived from
    them — are IDENTICAL across runs and cluster sizes); it is the
    only data on the driver, and assignment happens map-side against
    the broadcast centroid matrix. Shared by knn_ivf and
    semdedup.semantic_dedup."""
    rows = deterministic_sample(ds, sample_n, "vec_id", ["embedding"])
    S = np.stack([np.asarray(v, dtype=np.float64)
                  for v in rows["embedding"]])
    S = S / np.linalg.norm(S, axis=1, keepdims=True)
    rng = np.random.default_rng(seed)
    C = S[rng.choice(len(S), size=min(n_centroids, len(S)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(S @ C.T, axis=1)
        for c in range(len(C)):
            m = assign == c
            if m.any():
                v = S[m].mean(axis=0)
                C[c] = v / np.linalg.norm(v)
    return C


def knn_ivf(ds, k: int = 5, n_centroids: int = 16, nprobe: int = 14,
            sample_n: int = 2048, iters: int = 5):
    """IVF-style ANN: centroids fit on a driver-side sample (k-means-
    lite, deterministic), vectors bucketed by nearest centroid via
    groupby, queries probe nprobe closest buckets.

    Default nprobe is sized for the RANDOM-uniform testdata embeddings
    — the IVF worst case (no cluster structure, so true neighbors
    scatter across many cells; recall@5 at nprobe=4 is only ~0.6
    there). Real embedding corpora are clustered and reach the same
    >=0.9 recall (gated by knn_ivf_recall) at much smaller nprobe —
    tune nprobe down per corpus, it is the speed/recall dial."""
    import ray

    C = fit_centroids(ds, n_centroids, sample_n=sample_n, iters=iters)
    Q = query_matrix(C.shape[1])
    probes = np.argsort(-(Q @ C.T), axis=1)[:, :nprobe]  # nq x nprobe
    cref = ray.put((C, Q, probes))

    class Bucketize:
        def __init__(self):
            self.C, self.Q, self.probes = ray.get(cref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch["vec_id"].to_numpy()
            E = np.stack([np.asarray(v, dtype=np.float64)
                          for v in batch["embedding"].to_pylist()])
            En = E / np.linalg.norm(E, axis=1, keepdims=True)
            cid = np.argmax(En @ self.C.T, axis=1)
            # per-batch top-k PARTIAL per query (the same pre-aggregation
            # knn_bruteforce's Score does): only k rows per (query,
            # batch) cross the wire, never every scored vector
            parts = {"qid": [], "vec_id": [], "sim": []}
            for qid in range(self.Q.shape[0]):
                m = np.isin(cid, self.probes[qid])
                if not m.any():
                    continue
                sims = self.Q[qid] @ En[m].T
                mids = ids[m]
                kk = min(k, len(sims))
                # same deterministic (sim DESC, vec_id ASC) local top-k
                # as knn_bruteforce's Score — partition-independent
                top = np.lexsort((mids, -sims))[:kk]
                parts["qid"].append(np.full(kk, qid, dtype=np.int64))
                parts["vec_id"].append(mids[top])
                parts["sim"].append(sims[top])
            if not parts["qid"]:
                return pa.table({"qid": pa.array([], pa.int64()),
                                 "vec_id": pa.array([], pa.int64()),
                                 "sim": pa.array([], pa.float64())})
            return pa.table({
                "qid": pa.array(np.concatenate(parts["qid"])),
                "vec_id": pa.array(np.concatenate(parts["vec_id"]),
                                   type=pa.int64()),
                "sim": pa.array(np.concatenate(parts["sim"])),
            })

    scored = ds.map_batches(Bucketize, batch_format="pyarrow", concurrency=2)
    df = scored.to_pandas()  # k rows per (query, batch) partials: tiny
    df = df.sort_values(["qid", "sim", "vec_id"],
                        ascending=[True, False, True], kind="mergesort")
    out = df.groupby("qid", sort=True).head(k).reset_index(drop=True)
    out["rank"] = out.groupby("qid").cumcount().astype(np.int64)
    out["sim"] = out["sim"].round(4)
    return out[["qid", "rank", "vec_id", "sim"]]


def knn_ivf_recall(ds, k: int = 5, **ivf_kwargs) -> pd.DataFrame:
    """recall@k of the IVF approximate path against the exact brute
    force, per query — the quality gate that catches an IVF regression
    (bad centroids, broken probe routing) in the oracle harness, not
    only in pytest. Returns one row per query plus an 'overall' mean
    row (qid = -1)."""
    bf = knn_bruteforce(ds, k)
    ivf = knn_ivf(ds, k, **ivf_kwargs)
    qids = sorted(bf["qid"].unique())
    recalls = []
    for qid in qids:
        truth = set(bf.loc[bf["qid"] == qid, "vec_id"])
        got = set(ivf.loc[ivf["qid"] == qid, "vec_id"])
        recalls.append(len(truth & got) / max(len(truth), 1))
    out = pd.DataFrame({"qid": np.array(qids + [-1], dtype=np.int64),
                        "recall_at_k": np.round(
                            recalls + [float(np.mean(recalls))], 4)})
    return out
