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


def emb_matrix(col, dtype=np.float64) -> np.ndarray:
    """list<float> column -> (rows, dim) matrix WITHOUT the per-row
    Python loop: for fixed-width lists (every embedding column here)
    the underlying values buffer is one contiguous array, so this is a
    single to_numpy + reshape (~100x faster than
    np.stack([...to_pylist()]) at 1M rows — the conversion, not the
    matmul, dominated the ANN scan before). Falls back to the row loop
    for ragged lists."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if isinstance(col, (pa.ListArray, pa.LargeListArray,
                        pa.FixedSizeListArray)):
        if isinstance(col, pa.FixedSizeListArray):
            dim = col.type.list_size
            flat = col.values.to_numpy(zero_copy_only=False)
            return flat.reshape(len(col), dim).astype(dtype, copy=False)
        offs = col.offsets.to_numpy(zero_copy_only=False)
        widths = np.diff(offs)
        if len(widths) and (widths == widths[0]).all() and col.null_count == 0:
            dim = int(widths[0])
            flat = col.values.to_numpy(zero_copy_only=False)
            # offsets may not start at 0 after slicing
            flat = flat[offs[0]:offs[-1]]
            return flat.reshape(len(col), dim).astype(dtype, copy=False)
    return np.stack([np.asarray(v, dtype=dtype) for v in col.to_pylist()])


def scan_pool(frac: int = 2, lo: int = 2) -> "tuple[int, int]":
    """Autoscaling actor-pool bounds for map-side scan stages:
    (2, cpus // frac). A fixed concurrency=2 pool was the measured
    scaling bug at 1M vectors (the scan could never use more than two
    workers — 32-cpu runs were no faster than 8); capping at cpus//2
    keeps the livelock rule (a pool sized to ALL cpus starves the
    upstream read tasks, BASELINE.md)."""
    import ray

    cpus = (int(ray.cluster_resources().get("CPU", 8))
            if ray.is_initialized() else 8)
    return (lo, max(lo, cpus // frac))


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

    def score(batch: pa.Table) -> pa.Table:
            # task mode, not an actor pool: the only state is the
            # broadcast query matrix, and ray.get of a numpy array from
            # LOCAL plasma is zero-copy — per-task fetch costs nothing,
            # while an autoscaling pool's actor ramp-up dominated this
            # scan (measured 4.3 s pool vs 1.8 s tasks at 4M vectors)
            ids = batch["vec_id"].to_numpy()
            E = emb_matrix(batch["embedding"])
            En = E / np.linalg.norm(E, axis=1, keepdims=True)
            sims = ray.get(qref) @ En.T               # nq x batch
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

    # batch_size=None: whole-block batches — the local top-k partial
    # only compresses when the batch is much larger than k (small
    # batches emit nearly every row to the driver reduce)
    partials = ds.map_batches(score, batch_format="pyarrow",
                              batch_size=None)
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
        if batch.schema.metadata:
            # parquet pandas-metadata makes the schema unhashable and
            # defeats Ray's schema dedup in the repartition reduce
            batch = batch.replace_schema_metadata(None)
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


def auto_centroid_count(n_rows: int, target_cell_rows: int = 1024,
                        lo: int = 4, hi: int = 65536) -> int:
    """Scale the coarse-quantizer size with the corpus so a k-means
    cell stays ~target_cell_rows rows (the SemDeDup / IVF
    cell-fits-in-a-worker assumption): at 2k rows -> 4 cells, at 100M
    rows -> ~100k cells. Used when n_centroids is passed as None."""
    return max(lo, min(hi, int(n_rows // max(target_cell_rows, 1)) or lo))


_REFINE_CACHE: dict = {}


def _refine_centroids(ds, C: np.ndarray, refine_iters: int,
                      id_col: str = "vec_id",
                      sample_mod: int | None = None) -> np.ndarray:
    """Distributed Lloyd refinement: per-batch partial (count, sum) per
    centroid computed map-side against the broadcast centroid matrix,
    partials merged per centroid in a groupby (each group sums its
    partials in min-id order), and the driver receives exactly
    n_centroids rows per iteration — it never holds more than the
    centroid matrix itself. sample_mod=m hash-samples ~1/m of rows
    map-side (minibatch k-means over a hash-sampled dataset) so a
    100 TB fit touches a bounded subset without any driver collect.

    Determinism: within a batch rows are summed in vec_id order and
    per-centroid partials are merged in min-vec_id order, so a fixed
    partitioning reproduces bit-identical centroids; across DIFFERENT
    block boundaries float association can differ at ~1e-16, so each
    update is rounded through float32 — downstream recall is gated by
    knn_ivf_recall / semantic_dedup_recall regardless."""
    import hashlib

    import pandas as pd
    import ray

    dim = C.shape[1]
    for _ in range(refine_iters):
        cref = ray.put(np.ascontiguousarray(C, dtype=np.float64))
        key = cref.hex()

        def partials(batch: pa.Table) -> pa.Table:
            C_ = _REFINE_CACHE.get(key)
            if C_ is None:
                if len(_REFINE_CACHE) > 8:
                    _REFINE_CACHE.clear()
                C_ = _REFINE_CACHE[key] = ray.get(cref)
            ids = batch[id_col].to_numpy()
            if sample_mod and sample_mod > 1:
                keep = np.array(
                    [int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16)
                     % sample_mod == 0 for i in ids])
                if not keep.any():
                    return pa.table({
                        "cluster": pa.array([], pa.int64()),
                        "mkey": pa.array([], pa.int64()),
                        "n": pa.array([], pa.int64()),
                        "vec": pa.array([], pa.binary())})
                batch = batch.filter(pa.array(keep))
                ids = ids[keep]
            order = np.argsort(ids, kind="stable")
            ids = ids[order]
            E = emb_matrix(batch["embedding"])[order]
            En = E / np.linalg.norm(E, axis=1, keepdims=True)
            # float32 assign: this host's f64 GEMM is ~24x slower than
            # f32 (measured 1.11 vs 0.046 s at 4096x64x1953); the
            # assignment is argmax-only and recall-gated, sums stay f64
            cid = np.argmax(En.astype(np.float32)
                            @ C_.astype(np.float32).T, axis=1)
            k = C_.shape[0]
            sums = np.zeros((k, dim))
            np.add.at(sums, cid, En)         # accumulates in vec_id order
            counts = np.bincount(cid, minlength=k)
            mkey = np.full(k, np.iinfo(np.int64).max, dtype=np.int64)
            np.minimum.at(mkey, cid, ids)
            nz = np.nonzero(counts)[0]
            return pa.table({
                "cluster": pa.array(nz.astype(np.int64)),
                "mkey": pa.array(mkey[nz]),
                "n": pa.array(counts[nz].astype(np.int64)),
                # binary (not list<double>): fixed-width, hashable
                # schema, zero-copy np.frombuffer on the reduce side
                "vec": pa.array([sums[i].tobytes() for i in nz],
                                type=pa.binary()),
            })

        def combine(df: pd.DataFrame) -> pa.Table:
            df = df.sort_values("mkey", kind="mergesort")
            v = np.stack([np.frombuffer(x, dtype=np.float64)
                          for x in df["vec"]])
            # arrow out: mixed pandas/arrow block kinds defeat Ray's
            # schema-dedup in the following reduce
            return pa.table({
                "cluster": pa.array([int(df["cluster"].iloc[0])],
                                    type=pa.int64()),
                "n": pa.array([int(df["n"].sum())], type=pa.int64()),
                "vec": pa.array([v.sum(axis=0).tobytes()],
                                type=pa.binary()),
            })

        rows = (ds.map_batches(partials, batch_format="pyarrow",
                               zero_copy_batch=True)
                .groupby("cluster").map_groups(combine,
                                               batch_format="pandas")
                .take_all())                   # n_centroids rows: tiny
        for r in rows:
            v = np.frombuffer(r["vec"], dtype=np.float64) / max(r["n"], 1)
            nv = np.linalg.norm(v)
            if nv > 0:
                C[int(r["cluster"])] = v / nv
        C = C.astype(np.float32).astype(np.float64)
        C = C / np.linalg.norm(C, axis=1, keepdims=True)
    return C


def fit_centroids(ds, n_centroids: int | None, sample_n: int = 2048,
                  iters: int = 5, seed: int = 99,
                  refine_iters: int = 2,
                  refine_sample_mod: int | None = None) -> np.ndarray:
    """Unit-norm centroids for cosine assignment, fit in two phases:

    1. INIT — deterministic k-means-lite on a driver-side min-md5
       sample (order-free, identical across runs and cluster sizes);
       the <= sample_n sample is the only row data on the driver.
    2. REFINE — refine_iters rounds of distributed Lloyd over the
       (optionally hash-sampled) FULL dataset: map-side partial sums
       per centroid, merged per centroid in a groupby, driver update
       loop over n_centroids rows. At 100 TB the init sample alone
       cannot represent the space; the refinement sees every row (or
       a 1/refine_sample_mod hash sample) while the driver never
       holds more than the centroid matrix.

    n_centroids=None auto-scales with corpus size via
    auto_centroid_count (SemDeDup-style ~1k-row cells). Shared by
    knn_ivf and semdedup.semantic_dedup."""
    if n_centroids is None:
        n_centroids = auto_centroid_count(ds.count())
    rows = deterministic_sample(ds, sample_n, "vec_id", ["embedding"])
    S = np.stack([np.asarray(v, dtype=np.float64)
                  for v in rows["embedding"]])
    S = S / np.linalg.norm(S, axis=1, keepdims=True)
    rng = np.random.default_rng(seed)
    C = S[rng.choice(len(S), size=min(n_centroids, len(S)), replace=False)]
    for _ in range(iters):
        # f32 assign (argmax-only; see _refine_centroids) — at
        # n_centroids=2048 this loop is 5 driver-serial GEMMs and this
        # host's f64 path is ~24x slower
        assign = np.argmax(S.astype(np.float32)
                           @ C.astype(np.float32).T, axis=1)
        for c in range(len(C)):
            m = assign == c
            if m.any():
                v = S[m].mean(axis=0)
                C[c] = v / np.linalg.norm(v)
    if refine_iters > 0:
        C = _refine_centroids(ds, C, refine_iters,
                              sample_mod=refine_sample_mod)
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

    def bucketize(batch: pa.Table) -> pa.Table:
            # task mode (see knn_bruteforce.score): numpy state is
            # zero-copy from local plasma, so per-task ray.get is free
            # and no actor pool has to ramp
            C, Q, probes = ray.get(cref)
            ids = batch["vec_id"].to_numpy()
            E = emb_matrix(batch["embedding"])
            En = E / np.linalg.norm(E, axis=1, keepdims=True)
            # f32 assign — this host's f64 GEMM is ~24x slower; the
            # probed-cell sims below stay exact f64
            cid = np.argmax(En.astype(np.float32)
                            @ C.astype(np.float32).T, axis=1)
            # per-batch top-k PARTIAL per query (the same pre-aggregation
            # knn_bruteforce's Score does): only k rows per (query,
            # batch) cross the wire, never every scored vector
            parts = {"qid": [], "vec_id": [], "sim": []}
            for qid in range(Q.shape[0]):
                m = np.isin(cid, probes[qid])
                if not m.any():
                    continue
                sims = Q[qid] @ En[m].T
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

    scored = ds.map_batches(bucketize, batch_format="pyarrow",
                            batch_size=None)
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


# ---------------------------------------------------------------------------
# product quantization (PQ) ANN — the compressed-index scale path
# ---------------------------------------------------------------------------

def _refine_pq_codebooks(ds, books: np.ndarray, refine_iters: int,
                         id_col: str = "vec_id",
                         sample_mod: int | None = None,
                         coarse: np.ndarray | None = None) -> np.ndarray:
    """Distributed Lloyd refinement of PQ codebooks — the per-subspace
    analogue of _refine_centroids: each pass encodes every row
    map-side against the broadcast codebooks (one _pq_encode call
    covers ALL m subspaces), accumulates per-cell (count, subvector
    sum) partials, merges them per cell in a groupby, and the driver
    receives at most m*ks rows per iteration (1024 at m=8/ks=128) —
    never more than the codebook matrix itself. sample_mod=p
    hash-samples ~1/p of rows map-side so a 100 TB fit touches a
    bounded subset with zero driver collect.

    Determinism follows _refine_centroids: within a batch subvectors
    sum in vec_id order, per-cell partials merge in min-vec_id order,
    and each update rounds through float32; recall is gated by
    knn_pq_recall regardless. Unlike coarse centroids, PQ codewords
    are plain L2 means — no unit normalization.

    coarse: when set (the IVFPQ residual variant), each row is first
    assigned to its nearest coarse centroid and the codebooks quantize
    the RESIDUAL En - coarse[cell] instead of En itself."""
    import hashlib

    import pandas as pd
    import ray

    m, ks, dsub = books.shape
    coarse_ref = ray.put(coarse) if coarse is not None else None
    for _ in range(refine_iters):
        bref = ray.put(np.ascontiguousarray(books, dtype=np.float64))
        key = bref.hex()

        def partials(batch: pa.Table) -> pa.Table:
            B = _REFINE_CACHE.get(key)
            if B is None:
                if len(_REFINE_CACHE) > 8:
                    _REFINE_CACHE.clear()
                B = _REFINE_CACHE[key] = ray.get(bref)
            ids = batch[id_col].to_numpy()
            if sample_mod and sample_mod > 1:
                keep = np.array(
                    [int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16)
                     % sample_mod == 0 for i in ids])
                if not keep.any():
                    return pa.table({
                        "cell": pa.array([], pa.int64()),
                        "mkey": pa.array([], pa.int64()),
                        "n": pa.array([], pa.int64()),
                        "vec": pa.array([], pa.binary())})
                batch = batch.filter(pa.array(keep))
                ids = ids[keep]
            order = np.argsort(ids, kind="stable")
            ids = ids[order]
            E = emb_matrix(batch["embedding"])[order]
            En = E / np.linalg.norm(E, axis=1, keepdims=True)
            if coarse_ref is not None:
                Cc = ray.get(coarse_ref)
                # f32 assign (see _refine_centroids.partials)
                En = En - Cc[np.argmax(En.astype(np.float32)
                                       @ Cc.astype(np.float32).T, axis=1)]
            codes = _pq_encode(En, B)                  # (rows, m)
            out = {"cell": [], "mkey": [], "n": [], "vec": []}
            for j in range(m):
                cid = codes[:, j]
                sums = np.zeros((ks, dsub))
                # accumulates in vec_id order (ids pre-sorted above)
                np.add.at(sums, cid, En[:, j * dsub:(j + 1) * dsub])
                counts = np.bincount(cid, minlength=ks)
                mkey = np.full(ks, np.iinfo(np.int64).max, dtype=np.int64)
                np.minimum.at(mkey, cid, ids)
                nz = np.nonzero(counts)[0]
                out["cell"].append((j * ks + nz).astype(np.int64))
                out["mkey"].append(mkey[nz])
                out["n"].append(counts[nz].astype(np.int64))
                out["vec"].extend(sums[i].tobytes() for i in nz)
            return pa.table({
                "cell": pa.array(np.concatenate(out["cell"])),
                "mkey": pa.array(np.concatenate(out["mkey"])),
                "n": pa.array(np.concatenate(out["n"])),
                "vec": pa.array(out["vec"], type=pa.binary()),
            })

        def combine(df: pd.DataFrame) -> pa.Table:
            df = df.sort_values("mkey", kind="mergesort")
            v = np.stack([np.frombuffer(x, dtype=np.float64)
                          for x in df["vec"]])
            return pa.table({
                "cell": pa.array([int(df["cell"].iloc[0])],
                                 type=pa.int64()),
                "n": pa.array([int(df["n"].sum())], type=pa.int64()),
                "vec": pa.array([v.sum(axis=0).tobytes()],
                                type=pa.binary()),
            })

        rows = (ds.map_batches(partials, batch_format="pyarrow",
                               zero_copy_batch=True)
                .groupby("cell").map_groups(combine,
                                            batch_format="pandas")
                .take_all())                   # <= m*ks rows: tiny
        for r in rows:
            j, c = divmod(int(r["cell"]), ks)
            books[j, c] = (np.frombuffer(r["vec"], dtype=np.float64)
                           / max(r["n"], 1))
        books = books.astype(np.float32).astype(np.float64)
    return books


def fit_pq_codebooks(ds, m: int = 8, ks: int = 128,
                     sample_n: int = 4096, iters: int = 8,
                     seed: int = 424242, refine_iters: int = 2,
                     refine_sample_mod: int | None = None) -> np.ndarray:
    """Per-subspace PQ codebooks (Jégou et al. 2011), fit in two
    phases like fit_centroids:

    1. INIT — k-means per subspace on a deterministic min-md5 sample
       (order-free, identical across runs and cluster sizes); the
       <= sample_n sample is the only row data on the driver.
    2. REFINE — refine_iters rounds of distributed Lloyd over the
       (optionally hash-sampled) FULL dataset via _refine_pq_codebooks:
       map-side per-cell partial sums, groupby merge, driver update
       over <= m*ks rows. At 100 TB the init sample alone cannot
       represent the space; the refinement sees every row (or a
       1/refine_sample_mod hash sample) while the driver never holds
       more than the codebook matrix.

    Returns codebooks of shape (m, ks, dim/m). The codebooks are TINY
    (m*ks*dsub floats — 16 KB at dim=64/m=8/ks=64); the knn_pq re-rank
    stage bounds recall sensitivity to codebook quality either way
    (gated by knn_pq_recall)."""
    rows = deterministic_sample(ds, sample_n, "vec_id", ["embedding"])
    S = np.stack([np.asarray(v, dtype=np.float64)
                  for v in rows["embedding"]])
    S = S / np.linalg.norm(S, axis=1, keepdims=True)
    dim = S.shape[1]
    if dim % m:
        raise ValueError(f"m={m} must divide dim={dim}")
    dsub = dim // m
    ks = min(ks, len(S))
    rng = np.random.default_rng(seed)
    books = np.empty((m, ks, dsub))
    for j in range(m):
        X = S[:, j * dsub:(j + 1) * dsub]
        C = X[rng.choice(len(X), size=ks, replace=False)]
        for _ in range(iters):
            # argmin |x-c|^2 == argmax x.c - |c|^2/2: one matmul, no
            # (n, ks, dsub) broadcast allocation
            assign = np.argmax(X @ C.T - 0.5 * (C ** 2).sum(axis=1),
                               axis=1)
            for c in range(ks):
                msk = assign == c
                if msk.any():
                    C[c] = X[msk].mean(axis=0)
        books[j] = C
    if refine_iters > 0:
        books = _refine_pq_codebooks(ds, books, refine_iters,
                                     sample_mod=refine_sample_mod)
    return books


def _pq_encode(En: np.ndarray, books: np.ndarray,
               chunk: int = 8192) -> np.ndarray:
    """(rows, dim) normalized vectors -> (rows, m) codes: per subspace,
    the centroid minimizing reconstruction L2 — i.e.
    argmax(x.c - |c|^2/2), one matmul per subspace.

    Row-chunked so the (chunk, ks) score matrix stays cache-resident:
    materializing the full (rows, ks) scores is pure DRAM traffic
    (~ks*4 bytes/row/subspace) and dominated the encode wall —
    measured 3.8 s -> 0.44 s per 181k-row batch single-threaded, and
    far better under 32 concurrent scan tasks sharing one node's
    memory bandwidth (692 -> ~80 cpu-seconds at 8M vectors)."""
    m, ks, dsub = books.shape
    n = En.shape[0]
    codes = np.empty((n, m), dtype=np.int64)
    Bf = books.astype(np.float32)
    half = 0.5 * (Bf ** 2).sum(axis=2)                 # (m, ks)
    BT = np.ascontiguousarray(Bf.transpose(0, 2, 1))   # (m, dsub, ks)
    Ef = En.astype(np.float32, copy=False)
    for lo in range(0, n, chunk):
        # one contiguous row-chunk copy serves all m subspace matmuls
        # (a strided subspace view made the skinny matmul 4.5x slower)
        Xc = np.ascontiguousarray(Ef[lo:lo + chunk])
        for j in range(m):
            # argmin |x-c|^2 == argmax x.c - |c|^2/2 (|x|^2 const/row)
            score = Xc[:, j * dsub:(j + 1) * dsub] @ BT[j] - half[j]
            codes[lo:lo + chunk, j] = np.argmax(score, axis=1)
    return codes


def knn_pq(ds, k: int = 5, m: int = 8, ks: int = 128,
           shortlist: int | None = None, sample_n: int = 4096,
           refine_iters: int = 2,
           refine_sample_mod: int | None = None):
    """PQ ANN with asymmetric distance computation (ADC) + exact
    re-rank — the memory-scale route: each vector is stored as m bytes
    of codes (64x smaller than a float64 dim=64 embedding), the scan is
    one LUT gather-sum per query, and only the per-batch top-`shortlist`
    partial rows ever cross the wire.

    Stages (all map-side; the corpus is never shuffled):
    1. fit codebooks on a deterministic sample (fit_pq_codebooks);
    2. precompute per-query LUTs: LUT[q, j, c] = q_subj . codebook[j, c]
       so approx_sim(q, x) = sum_j LUT[q, j, code_j(x)];
    3. map_batches: normalize, encode, LUT-sum, emit local
       top-shortlist partials per query (the knn_bruteforce partial
       pattern);
    4. global top-shortlist per query (tiny driver reduce), then ONE
       map-side filter pass gathers the true embeddings of the <=
       n_queries*shortlist candidate ids for an exact cosine re-rank.
    Approximate (rows-only); gated by knn_pq_recall.

    ``shortlist`` is the recall/cost dial: it must grow with the corpus
    because ADC quantization noise is constant while the sim gap
    between rank k and rank `shortlist` shrinks with n. Measured on
    RANDOM dim-64 vectors (PQ's worst case, no cluster structure) at
    1M rows: shortlist 2000 -> recall@5 0.775, 4000 -> 0.875,
    8000 -> 0.95, 16000 (1.6% of corpus) -> 1.0. Default: 8*sqrt(n),
    floored at 64 (= 8000 at 1M, recall 0.95 worst-case; real
    clustered corpora reach it far lower); pass an explicit value to
    pin cost. Each scan batch emits n_queries * shortlist partial rows
    into a two-level coalesced reduce; because shortlist grows sqrt(n)
    while batch rows are capped by worker memory, the partial stream is
    O(n) rows worst-case — still a skinny 3-column table, but at
    extreme n pin `shortlist` or route the reduce through a keyed
    shuffle."""
    import ray

    n_rows = ds.count()   # parquet metadata, no scan
    if shortlist is None:
        shortlist = max(64, int(8 * np.sqrt(n_rows)))
    dim = len(ds.take(1)[0]["embedding"])
    books = fit_pq_codebooks(ds, m=m, ks=ks, sample_n=sample_n,
                             refine_iters=refine_iters,
                             refine_sample_mod=refine_sample_mod)
    Q = query_matrix(dim)
    nq, dsub = Q.shape[0], dim // m
    # (m, ks, nq) float32: the scan gathers lut[j][codes[:, j]] —
    # one CONTIGUOUS nq-float row per vector per subspace — instead of
    # nq separate scalar-gather passes (8x better locality, half the
    # bytes; candidate-boundary ties still break on vec_id)
    lut = np.stack([books[j] @ Q[:, j * dsub:(j + 1) * dsub].T
                    for j in range(m)]).astype(np.float32)
    bref = ray.put((books, lut))

    def scan_pq(batch: pa.Table) -> pa.Table:
        # task mode (see knn_bruteforce.score): codebooks + LUT are
        # numpy, zero-copy from local plasma per task
        books_t, lut_t = ray.get(bref)
        ids = batch["vec_id"].to_numpy()
        # float32 end-to-end: the ADC scan is approximate by design
        # (the exact re-rank below is float64) and float64 here doubles
        # the normalize + encode memory traffic
        E = emb_matrix(batch["embedding"], dtype=np.float32)
        En = E / np.linalg.norm(E, axis=1, keepdims=True)
        codes = _pq_encode(En, books_t)              # (rows, m)
        # approx sim per (row, query) = sum over subspaces of the
        # per-query LUT row for that subspace's code
        acc = lut_t[0][codes[:, 0]].copy()           # (rows, nq)
        for j in range(1, codes.shape[1]):
            acc += lut_t[j][codes[:, j]]
        sl = min(shortlist, len(ids))
        parts = {"qid": [], "vec_id": [], "sim": []}
        for qid in range(acc.shape[1]):
            sims = acc[:, qid]
            top = np.lexsort((ids, -sims))[:sl]
            parts["qid"].append(np.full(sl, qid, dtype=np.int64))
            parts["vec_id"].append(ids[top])
            parts["sim"].append(sims[top])
        return pa.table({
            "qid": pa.array(np.concatenate(parts["qid"])),
            "vec_id": pa.array(np.concatenate(parts["vec_id"]),
                               type=pa.int64()),
            "sim": pa.array(np.concatenate(parts["sim"])),
        })

    cpus = int(ray.cluster_resources().get("CPU", 8))
    # The scan batch must DWARF the shortlist or the top-shortlist
    # partial inverts: shortlist grows with sqrt(n) while parquet-read
    # blocks stay fixed, and at 8M vecs the sized read yielded ~23k-row
    # blocks under a 22.6k shortlist — every block emitted every row
    # for every query (64M partial rows, 8x the corpus, reduce-bound at
    # 41 s total). An explicit batch_size makes map_batches COALESCE
    # small blocks into ~8*shortlist-row batches while staying fully
    # streaming (unlike a repartition, which materializes); capped at
    # n/cpus so small corpora still fan out across the cluster.
    scan_rows = max(1024, min(8 * shortlist,
                              -(-n_rows // cpus)))
    partials = ds.map_batches(scan_pq, batch_format="pyarrow",
                              batch_size=scan_rows)
    return _shortlist_rerank(ds, partials, Q, k, shortlist, cpus)


def _reduce_shortlist(partials, shortlist: int, cpus: int):
    """Coalesced top-shortlist reduce of per-batch ADC partials.
    Returns (short_df, cand_ids).

    Two-level coalesced reduce (the deterministic_sample pattern):
    per-block partials are up to shortlist rows per query EACH, and
    block counts are outside this operator's control — at 4M vecs the
    corpus read yielded ~428 blocks and a direct to_pandas pulled
    13.7M partial rows through the driver (~45 s, serial). Two local
    top-shortlist passes over coalesced partitions cap the driver at
    <= 4 * n_queries * shortlist rows at any block count."""

    def local_top(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["qid", "sim", "vec_id"],
                            ascending=[True, False, True],
                            kind="mergesort")
        return df.groupby("qid", sort=False).head(shortlist)

    partials = (partials.repartition(cpus, shuffle=False)
                .map_batches(local_top, batch_format="pandas",
                             batch_size=None)
                .repartition(4, shuffle=False)
                .map_batches(local_top, batch_format="pandas",
                             batch_size=None))
    df = partials.to_pandas()   # <= 4 * nq * shortlist rows
    if df.empty:
        # a fully-empty partial set loses its columns through
        # to_pandas — return the typed empty (qid, vec_id, sim) shape
        df = pd.DataFrame({"qid": np.empty(0, np.int64),
                           "vec_id": np.empty(0, np.int64),
                           "sim": np.empty(0, np.float64)})
    df = df.sort_values(["qid", "sim", "vec_id"],
                        ascending=[True, False, True], kind="mergesort")
    short = df.groupby("qid", sort=True).head(shortlist)
    cand = np.unique(short["vec_id"].to_numpy())
    return short, cand


def _shortlist_rerank(ds, partials, Q: np.ndarray, k: int,
                      shortlist: int, cpus: int) -> pd.DataFrame:
    """Shared tail of the one-shot compressed-scan ANN paths (knn_pq /
    knn_ivfpq): coalesced top-shortlist reduce of the per-batch ADC
    partials, then ONE map-side gather of the candidate embeddings for
    an exact cosine re-rank. The persisted-index path (annindex) skips
    the full-corpus gather entirely: it reads candidates from the
    vec_id-sharded embedding store written at build time and calls
    _exact_rerank directly."""
    import ray

    short, cand = _reduce_shortlist(partials, shortlist, cpus)

    # exact re-rank of the tiny candidate set: one map-side filter pass
    # (no shuffle), <= n_queries*shortlist rows reach the driver
    cref = ray.put(cand)

    def gather(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        want = ray.get(cref)
        keep = pc.is_in(batch["vec_id"],
                        value_set=pa.array(want, type=pa.int64()))
        return batch.select(["vec_id", "embedding"]).filter(keep)

    got = pa.concat_tables(
        ds.map_batches(gather, batch_format="pyarrow",
                       zero_copy_batch=True)
        .iter_batches(batch_size=None, batch_format="pyarrow"))
    return _exact_rerank(got, short, Q, k)


def _exact_rerank(got: pa.Table, short: pd.DataFrame, Q: np.ndarray,
                  k: int) -> pd.DataFrame:
    """Exact cosine top-k over a gathered candidate table
    (vec_id, embedding) — the common tail of both the map-side-gather
    and the sharded-store re-rank paths."""
    nq = Q.shape[0]
    E = emb_matrix(got["embedding"], dtype=np.float64)
    En = E / np.linalg.norm(E, axis=1, keepdims=True)
    ids = got["vec_id"].to_numpy()
    sims = Q @ En.T                                     # nq x cand
    rows = []
    for qid in range(nq):
        allowed = short.loc[short["qid"] == qid, "vec_id"].to_numpy()
        msk = np.isin(ids, allowed)
        kk = min(k, int(msk.sum()))
        mids, msims = ids[msk], sims[qid][msk]
        top = np.lexsort((mids, -msims))[:kk]
        rows.append(pd.DataFrame({
            "qid": np.full(kk, qid, dtype=np.int64),
            "rank": np.arange(kk, dtype=np.int64),
            "vec_id": mids[top].astype(np.int64),
            "sim": np.round(msims[top], 4)}))
    return pd.concat(rows, ignore_index=True)


def knn_pq_recall(ds, k: int = 5, **pq_kwargs) -> pd.DataFrame:
    """recall@k of the PQ+re-rank path vs exact brute force, per query
    plus an overall mean row (qid = -1) — same driver-visible gate
    shape as knn_ivf_recall."""
    bf = knn_bruteforce(ds, k)
    pq_ = knn_pq(ds, k, **pq_kwargs)
    qids = sorted(bf["qid"].unique())
    recalls = []
    for qid in qids:
        truth = set(bf.loc[bf["qid"] == qid, "vec_id"])
        got = set(pq_.loc[pq_["qid"] == qid, "vec_id"])
        recalls.append(len(truth & got) / max(len(truth), 1))
    return pd.DataFrame({"qid": np.array(qids + [-1], dtype=np.int64),
                         "recall_at_k": np.round(
                             recalls + [float(np.mean(recalls))], 4)})


# ---------------------------------------------------------------------------
# IVF-ADC (IVFPQ) — coarse cells + PQ residual codes, the production
# composition (Jégou et al. 2011 §V): scan only the probed cells AND
# scan them compressed.
# ---------------------------------------------------------------------------

def fit_residual_codebooks(ds, coarse: np.ndarray, m: int = 8,
                           ks: int = 128, sample_n: int = 4096,
                           iters: int = 8, seed: int = 515151,
                           refine_iters: int = 2,
                           refine_sample_mod: int | None = None
                           ) -> np.ndarray:
    """PQ codebooks over RESIDUALS r = x_norm - coarse[cell(x)] —
    residual energy is what remains after the coarse quantizer, so
    quantizing it directly is strictly tighter than quantizing x
    (IVFADC vs plain ADC). Same two-phase fit as fit_pq_codebooks:
    deterministic-sample init on the driver, then distributed Lloyd
    refinement over the (optionally hash-sampled) full dataset with
    the residual transform applied map-side."""
    rows = deterministic_sample(ds, sample_n, "vec_id", ["embedding"])
    S = np.stack([np.asarray(v, dtype=np.float64)
                  for v in rows["embedding"]])
    S = S / np.linalg.norm(S, axis=1, keepdims=True)
    # f32 assign (argmax-only, driver-serial at sample_n x cells)
    S = S - coarse[np.argmax(S.astype(np.float32)
                             @ coarse.astype(np.float32).T, axis=1)]
    dim = S.shape[1]
    if dim % m:
        raise ValueError(f"m={m} must divide dim={dim}")
    dsub = dim // m
    ks = min(ks, len(S))
    rng = np.random.default_rng(seed)
    books = np.empty((m, ks, dsub))
    for j in range(m):
        X = S[:, j * dsub:(j + 1) * dsub]
        C = X[rng.choice(len(X), size=ks, replace=False)]
        for _ in range(iters):
            assign = np.argmax(X @ C.T - 0.5 * (C ** 2).sum(axis=1),
                               axis=1)
            for c in range(ks):
                msk = assign == c
                if msk.any():
                    C[c] = X[msk].mean(axis=0)
        books[j] = C
    if refine_iters > 0:
        books = _refine_pq_codebooks(ds, books, refine_iters,
                                     sample_mod=refine_sample_mod,
                                     coarse=coarse)
    return books


def knn_ivfpq(ds, k: int = 5, n_centroids: int = 16, nprobe: int = 14,
              m: int = 8, ks: int = 128, shortlist: int | None = None,
              sample_n: int = 4096, refine_iters: int = 2,
              refine_sample_mod: int | None = None):
    """IVF-ADC: the composition of the two approximate tiers — coarse
    centroids restrict each query's scan to its nprobe nearest cells
    (IVF), and within those cells the scan reads m-byte PQ codes of
    the RESIDUAL instead of the embedding (ADC), followed by the same
    exact re-rank as knn_pq. This is the memory-AND-compute scale
    route: scan cost drops by ~nprobe/n_centroids and the scanned
    bytes by dim*8/m vs brute force, while the residual decomposition
    sim(q, x) ~= q . coarse[cell] + sum_j LUT_cell[q, j, code_j]
    needs one extra scalar per row on top of the plain ADC gather.

    All map-side, corpus never shuffled; the only driver state is the
    centroid matrix + codebooks + the two-level-reduced shortlist.
    Approximate (rows-only); gated by knn_ivfpq_recall. Defaults are
    sized for the random testdata fixture (the worst case for BOTH
    tiers — no cluster structure, where residuals are actually LONGER
    than the vectors: |x - C[cell]|^2 = 2 - 2 cos(x, C) > 1 when few
    centroids serve uniform directions — the exact re-rank absorbs
    the extra quantization noise); real clustered corpora get both
    shorter residuals and far smaller nprobe/shortlist at the same
    recall (see test_residual_codebooks_tighter_than_plain)."""
    import ray

    n_rows = ds.count()
    if shortlist is None:
        shortlist = max(64, int(8 * np.sqrt(n_rows)))
    dim = len(ds.take(1)[0]["embedding"])
    C = fit_centroids(ds, n_centroids, sample_n=min(sample_n, 2048))
    books = fit_residual_codebooks(
        ds, C, m=m, ks=ks, sample_n=sample_n,
        refine_iters=refine_iters, refine_sample_mod=refine_sample_mod)
    Q = query_matrix(dim)
    nq, dsub = Q.shape[0], dim // m
    probes = np.argsort(-(Q @ C.T), axis=1)[:, :nprobe]   # (nq, nprobe)
    qC = (Q @ C.T).astype(np.float32)                     # (nq, cells)
    # residual LUT is cell-independent: LUT[j, c, q] = q_subj . book[j,c]
    lut = np.stack([books[j] @ Q[:, j * dsub:(j + 1) * dsub].T
                    for j in range(m)]).astype(np.float32)
    bref = ray.put((C, books, lut, qC, probes))

    def scan_ivfpq(batch: pa.Table) -> pa.Table:
        C_, books_t, lut_t, qC_t, probes_t = ray.get(bref)
        ids = batch["vec_id"].to_numpy()
        E = emb_matrix(batch["embedding"], dtype=np.float32)
        En = E / np.linalg.norm(E, axis=1, keepdims=True)
        cid = np.argmax(En @ C_.astype(np.float32).T, axis=1)
        codes = _pq_encode(En - C_[cid].astype(np.float32), books_t)
        # ADC over residual codes + the per-row coarse term
        acc = lut_t[0][codes[:, 0]].copy()                # (rows, nq)
        for j in range(1, codes.shape[1]):
            acc += lut_t[j][codes[:, j]]
        acc += qC_t[:, cid].T                             # coarse term
        parts = {"qid": [], "vec_id": [], "sim": []}
        for qid in range(acc.shape[1]):
            mask = np.isin(cid, probes_t[qid])
            if not mask.any():
                continue
            sims = acc[mask, qid]
            mids = ids[mask]
            sl = min(shortlist, len(mids))
            top = np.lexsort((mids, -sims))[:sl]
            parts["qid"].append(np.full(sl, qid, dtype=np.int64))
            parts["vec_id"].append(mids[top])
            parts["sim"].append(sims[top])
        if not parts["qid"]:
            return pa.table({"qid": pa.array([], pa.int64()),
                             "vec_id": pa.array([], pa.int64()),
                             "sim": pa.array([], pa.float32())})
        return pa.table({
            "qid": pa.array(np.concatenate(parts["qid"])),
            "vec_id": pa.array(np.concatenate(parts["vec_id"]),
                               type=pa.int64()),
            "sim": pa.array(np.concatenate(parts["sim"])),
        })

    cpus = int(ray.cluster_resources().get("CPU", 8))
    # same batch-coalescing rule as knn_pq (see there): the scan batch
    # must dwarf the shortlist or the partial inverts
    scan_rows = max(1024, min(8 * shortlist, -(-n_rows // cpus)))
    partials = ds.map_batches(scan_ivfpq, batch_format="pyarrow",
                              batch_size=scan_rows)
    return _shortlist_rerank(ds, partials, Q, k, shortlist, cpus)


def knn_ivfpq_recall(ds, k: int = 5, **kwargs) -> pd.DataFrame:
    """recall@k of IVF-ADC vs exact brute force — the driver-visible
    quality gate, same shape as knn_ivf_recall / knn_pq_recall."""
    bf = knn_bruteforce(ds, k)
    iv = knn_ivfpq(ds, k, **kwargs)
    qids = sorted(bf["qid"].unique())
    recalls = []
    for qid in qids:
        truth = set(bf.loc[bf["qid"] == qid, "vec_id"])
        got = set(iv.loc[iv["qid"] == qid, "vec_id"])
        recalls.append(len(truth & got) / max(len(truth), 1))
    return pd.DataFrame({"qid": np.array(qids + [-1], dtype=np.int64),
                         "recall_at_k": np.round(
                             recalls + [float(np.mean(recalls))], 4)})
