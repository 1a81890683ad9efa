"""SemDeDup-style semantic deduplication (Abbas et al., 2023): k-means
cluster the embedding space, then drop near-duplicate rows WITHIN each
cluster (cosine >= threshold), keeping the min-id representative of
every near-dup group.

Why clustering first: all-pairs cosine over the corpus is O(n^2); the
SemDeDup observation is that semantic duplicates land in the same
k-means cell, so pairwise comparison only ever runs inside a cell.
Cross-cluster duplicate pairs are missed BY DESIGN (the documented
approximation; raise n_centroids or fall back to embedding_dup_lsh
when that matters).

Scale shape (100 TB):
- centroids fit once on a <=sample_n driver sample (similarity.
  fit_centroids), broadcast via ray.put; cluster ASSIGNMENT is pure
  map-side matmul per batch — the corpus is never collected.
- per-cluster pairing is one task per cluster (groupby on the cluster
  id). n_centroids is the memory dial: SemDeDup at web scale uses
  ~10^5 clusters so a cell is ~n/10^5 rows and the per-task O(cell^2)
  sim matrix stays small. The cell-fits-in-a-worker assumption is the
  same one the published method makes.
- pair graph -> components -> row filter reuses the shared
  connected_components + bucketed_anti_join path (one corpus shuffle,
  drop set never on the driver).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


_CENTROID_CACHE: dict = {}


def cluster_pairs(emb_ds, centroids: np.ndarray, threshold: float,
                  id_col: str = "vec_id", probes: int = 3):
    """(a, b) pairs with cosine >= threshold inside each k-means cell.
    Assignment runs in TASK mode with a per-worker centroid cache
    keyed by the broadcast ref (the _minhash_fn pattern): the centroid
    matrix is tiny, so task mode gets actor-style one-time setup
    without paying actor-pool spawn latency.

    probes = MULTI-PROBE assignment: each vector lands in its `probes`
    nearest cells, so a pair split by a cell boundary is still
    compared whenever any probed cell is shared. Measured at sf0.01
    (threshold 0.3, 16 cells): recall vs exact all-pairs is 0.28 at
    probes=1, 0.84 at probes=3, 0.95 at probes=4 — gated by
    semantic_dedup_recall. Cost: cells hold ~probes x their single-
    probe rows, so per-cell O(cell^2) work grows ~probes^2 — at scale
    (cells ~= n/1024) that is still O(n * probes^2 * 1024), nowhere
    near the O(n^2) exact path. A pair sharing several probed cells is
    emitted once per shared cell; duplicate edges are tolerated by
    both connected-components paths (union-find / min-label), so no
    extra distinct shuffle is spent on them."""
    import ray

    cref = ray.put(centroids)
    key = cref.hex()
    p = max(1, min(probes, centroids.shape[0]))

    def assign(batch: pa.Table) -> pa.Table:
        C = _CENTROID_CACHE.get(key)
        if C is None:
            if len(_CENTROID_CACHE) > 8:   # bound worker memory
                _CENTROID_CACHE.clear()
            C = _CENTROID_CACHE[key] = ray.get(cref)
        from .similarity import emb_matrix

        E = emb_matrix(batch["embedding"])
        En = E / np.linalg.norm(E, axis=1, keepdims=True)
        # f32 assign: this host's f64 GEMM is ~24x slower than f32 and
        # the cell choice is recall-gated (semantic_dedup_recall)
        sims = En.astype(np.float32) @ C.astype(np.float32).T
        if p == 1:
            cid = np.argmax(sims, axis=1)[:, None]
        else:
            top = np.argpartition(-sims, p - 1, axis=1)[:, :p]
            cid = top
        n = len(batch)
        idx = np.repeat(np.arange(n, dtype=np.int64), p)
        out = batch.take(pa.array(idx))
        if out.schema.metadata:
            out = out.replace_schema_metadata(None)  # keep schema hashable
        return out.append_column(
            "cluster", pa.array(cid.reshape(-1).astype(np.int64)))

    assigned = emb_ds.map_batches(assign, batch_format="pyarrow",
                                  zero_copy_batch=True)

    def pairs(df: pd.DataFrame) -> pa.Table:
        ids = df[id_col].to_numpy()
        E = np.stack([np.asarray(v, dtype=np.float64)
                      for v in df["embedding"]])

        # exact-dup collapse (the jaccard_join collapse_exact treatment):
        # byte-identical embeddings form a clique at any threshold <= 1,
        # so STAR edges to each group's min-id representative preserve
        # connected components exactly (an identical member reaches any
        # external x iff its rep does — same vector, same cosine) while
        # the O(u^2) scan runs over UNIQUE embeddings only. This is what
        # kills the boilerplate/tiled-corpus hot cell: the sf1 rehearsal
        # fixture (10x exact-tiled sf0.1) previously ran O(cell^2) over
        # 10 identical copies of every vector — 108 s / 13.4 GB vs ~2 s
        # at sf0.1 — and now collapses 10x before pairing.
        star_a = star_b = np.empty(0, dtype=np.int64)
        uniq, inv = np.unique(E, axis=0, return_inverse=True)
        if uniq.shape[0] < len(ids):
            order = np.lexsort((ids, inv))
            gids, ginv = ids[order], inv[order]
            first = np.r_[True, ginv[1:] != ginv[:-1]]
            reps = gids[first]                  # min id per group
            rep_of = np.repeat(reps, np.diff(
                np.r_[np.flatnonzero(first), len(gids)]))
            dup = ~first
            star_a, star_b = rep_of[dup], gids[dup]   # rep < member
            ids_u, E_u = reps, uniq
        else:
            ids_u, E_u = ids, E
        En = E_u / np.linalg.norm(E_u, axis=1, keepdims=True)
        u = En.shape[0]

        # chunked upper-triangle scan: the full u x u f64 sim matrix is
        # the other half of the hot-cell blowup (3.2 GB at u=20k);
        # 2048-row strips bound peak memory at 2048*u*8 bytes while
        # keeping the exact f64 >= threshold test (DuckDB double math)
        CH = 2048
        a_parts, b_parts = [star_a], [star_b]
        col = np.arange(u)
        for i0 in range(0, u, CH):
            strip = En[i0:i0 + CH] @ En.T
            mask = (strip >= threshold) & (
                col[None, :] > (i0 + np.arange(strip.shape[0]))[:, None])
            ii, jj = np.nonzero(mask)
            a, b = ids_u[i0 + ii], ids_u[jj]
            a_parts.append(np.minimum(a, b))
            b_parts.append(np.maximum(a, b))
        lo = np.concatenate(a_parts)
        hi = np.concatenate(b_parts)
        # arrow out (not pandas) keeps every downstream block an
        # ArrowBlock — mixed block kinds defeat Ray's schema dedup
        return pa.table({"a": pa.array(lo, type=pa.int64()),
                         "b": pa.array(hi, type=pa.int64())})

    return assigned.groupby("cluster").map_groups(
        pairs, batch_format="pandas")


def semantic_dedup(emb_ds, threshold: float = 0.95, n_centroids: int = 16,
                   id_col: str = "vec_id", sample_n: int = 2048):
    """Rows of emb_ds surviving SemDeDup (min-id kept per within-cell
    near-dup component)."""
    from .components import dedup_rows_by_components
    from .similarity import fit_centroids

    C = fit_centroids(emb_ds, n_centroids, sample_n=sample_n)
    p = cluster_pairs(emb_ds, C, threshold, id_col=id_col)
    return dedup_rows_by_components(emb_ds, p, id_col)


def semantic_dedup_recall(emb_ds, threshold: float = 0.95,
                          n_centroids: int = 16,
                          sample_n: int = 2048) -> pd.DataFrame:
    """Pair-set recall of the clustered (approximate) dup finder
    against the exact all-pairs path — the quality gate that catches a
    centroid/recall regression in the oracle harness, the same pattern
    as similarity.knn_ivf_recall. On corpora WITH byte-identical
    embeddings the collapse emits star edges instead of every
    member-member pair, so raw pair_recall understates the operational
    quality there — the survivor SET stays exactly equal to the
    uncollapsed path (pytest-proven component equality); the gate runs
    on the dup-free sf0.01 fixture where pair counting is faithful. Both pair sets scale with the number
    of DUPLICATE pairs (not the corpus), so collecting them here is
    bounded by the dup rate; this is a small-scale audit query run at
    sf0.01, not a production stage. Returns one summary row."""
    from .dedup import embedding_dup_exact
    from .similarity import fit_centroids

    exact = {(r["a"], r["b"])
             for r in embedding_dup_exact(emb_ds, threshold)
             .select_columns(["a", "b"]).take_all()}
    C = fit_centroids(emb_ds, n_centroids, sample_n=sample_n)
    sem = {(r["a"], r["b"])
           for r in cluster_pairs(emb_ds, C, threshold).take_all()}
    recall = len(sem & exact) / max(len(exact), 1)
    # clustered pairs are a strict subset of exact pairs (same cosine
    # test, fewer comparisons) -> precision is 1.0 unless broken
    precision = len(sem & exact) / max(len(sem), 1)
    return pd.DataFrame({
        "n_exact_pairs": np.array([len(exact)], dtype=np.int64),
        "n_sem_pairs": np.array([len(sem)], dtype=np.int64),
        "pair_recall": [round(recall, 4)],
        "pair_precision": [round(precision, 4)],
    })
