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
                  id_col: str = "vec_id"):
    """(a, b) pairs with cosine >= threshold inside each k-means cell.
    Assignment runs in TASK mode with a per-worker centroid cache
    keyed by the broadcast ref (the _minhash_fn pattern): the centroid
    matrix is tiny, so task mode gets actor-style one-time setup
    without paying actor-pool spawn latency."""
    import ray

    cref = ray.put(centroids)
    key = cref.hex()

    def assign(batch: pa.Table) -> pa.Table:
        C = _CENTROID_CACHE.get(key)
        if C is None:
            if len(_CENTROID_CACHE) > 8:   # bound worker memory
                _CENTROID_CACHE.clear()
            C = _CENTROID_CACHE[key] = ray.get(cref)
        E = np.stack([np.asarray(v, dtype=np.float64)
                      for v in batch["embedding"].to_pylist()])
        En = E / np.linalg.norm(E, axis=1, keepdims=True)
        cid = np.argmax(En @ C.T, axis=1)
        return batch.append_column(
            "cluster", pa.array(cid.astype(np.int64)))

    assigned = emb_ds.map_batches(assign, batch_format="pyarrow",
                                  zero_copy_batch=True)

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        ids = df[id_col].to_numpy()
        E = np.stack([np.asarray(v, dtype=np.float64)
                      for v in df["embedding"]])
        En = E / np.linalg.norm(E, axis=1, keepdims=True)
        S = En @ En.T
        iu, ju = np.triu_indices(len(ids), k=1)
        hit = S[iu, ju] >= threshold
        a, b = ids[iu[hit]], ids[ju[hit]]
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        return pd.DataFrame({"a": lo.astype(np.int64),
                             "b": hi.astype(np.int64)})

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
