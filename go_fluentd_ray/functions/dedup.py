"""Deduplication operators (exact, MinHash+LSH, SimHash, embedding
cosine) over a documents/embeddings table — the training-data dedup
family the brief requires as first-class components.

Scale design notes (100 TB):
- exact: content hash per row (C md5 per doc — the standard approach),
  within-batch partial aggregation (combiner) BEFORE the global
  groupby, so the shuffle moves one row per distinct hash per batch,
  not one per document.
- minhash-lsh: shingle -> 64 minhashes -> b bands; band rows shuffle by
  (band, band_hash); candidate pairs then verified with true Jaccard.
  The verify join here broadcasts doc_id->text (fine at test scale); at
  100 TB replace with a hash-partitioned join of candidates against the
  corpus on doc_id — the band/bucket stages are unchanged.
- embedding: exact all-pairs path for the oracle (O(n^2) on the small
  side, numpy matmul in float64 to match DuckDB's double math) plus an
  LSH (random-hyperplane) bucketed path as the scale route.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def md5_batch(batch: pa.Table, col: str = "text") -> pa.Table:
    h = [hashlib.md5(t.encode("utf-8")).hexdigest()
         for t in batch[col].to_pylist()]
    return batch.append_column("h", pa.array(h, type=pa.string()))


def exact_dedup_partial(batch: pa.Table) -> pa.Table:
    """Combiner: one row per distinct hash per batch (min id + count)."""
    df = batch.select(["h", "doc_id"]).to_pandas()
    g = df.groupby("h", sort=False)["doc_id"].agg(["min", "count"]).reset_index()
    return pa.table({
        "h": pa.array(g["h"], type=pa.string()),
        "keep_id": pa.array(g["min"], type=pa.int64()),
        "dups": pa.array(g["count"], type=pa.int64()),
    })


def exact_dedup(ds):
    """hash -> per-batch partial -> small global groupby."""
    from ray.data.aggregate import Min, Sum

    ds = ds.map_batches(md5_batch, batch_format="pyarrow", zero_copy_batch=True)
    ds = ds.map_batches(exact_dedup_partial, batch_format="pyarrow")
    out = ds.groupby("h").aggregate(Min("keep_id", alias_name="keep_id"),
                                    Sum("dups", alias_name="dups"))
    return out


def exact_dedup_rows(ds):
    """The deduplicated TABLE (keep the min-doc_id row per content
    hash): compute the keeper set (small — one id per distinct hash),
    broadcast it, and semi-join filter the corpus in one pass. At 100 TB
    the keeper set of a near-dup-free corpus is NOT small — swap the
    broadcast for a hash-partitioned semi join on doc_id; the keeper
    computation is unchanged."""
    import ray

    keep = exact_dedup(ds).select_columns(["keep_id"]).take_all()
    keep_ref = ray.put(pa.array(sorted(r["keep_id"] for r in keep),
                                type=pa.int64()))

    class Filter:
        def __init__(self):
            self.keep = ray.get(keep_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            mask = pc.is_in(batch["doc_id"], value_set=self.keep)
            return batch.filter(pc.fill_null(mask, False))

    return ds.map_batches(Filter, batch_format="pyarrow", concurrency=2,
                          zero_copy_batch=True)


# ---------------------------------------------------------------------------
# minhash + lsh
# ---------------------------------------------------------------------------

NUM_PERM = 64
BANDS = 16
ROWS_PER_BAND = NUM_PERM // BANDS
_MERSENNE = np.uint64((1 << 61) - 1)


def _shingle_hashes(text: str, k: int = 4) -> np.ndarray:
    """Distinct k-char-shingle hashes (vectorized rolling hash)."""
    b = np.frombuffer(text.encode("utf-8", "ignore"), dtype=np.uint8)
    if len(b) < k:
        b = np.pad(b, (0, k - len(b)), constant_values=32)
    m = np.lib.stride_tricks.sliding_window_view(b, k).astype(np.uint64)
    powers = np.uint64(1000003) ** np.arange(k, dtype=np.uint64)
    return np.unique((m * powers).sum(axis=1, dtype=np.uint64))


class MinHasher:
    """Actor-pool stage: permutation parameters generated once per actor
    (fixed seed, so every actor agrees)."""

    def __init__(self, k: int = 4):
        rng = np.random.default_rng(0xC0FFEE)
        self.a = rng.integers(1, _MERSENNE, NUM_PERM, dtype=np.uint64)
        self.b = rng.integers(0, _MERSENNE, NUM_PERM, dtype=np.uint64)
        self.k = k

    def signature(self, text: str) -> np.ndarray:
        sh = _shingle_hashes(text, self.k)
        # (a*x + b) mod p, min over shingles, for all perms at once
        v = (np.outer(sh, self.a) + self.b) % _MERSENNE
        return v.min(axis=0)

    def __call__(self, batch: pa.Table) -> pa.Table:
        """Emit BANDS rows per doc: (doc_id, band, band_hash)."""
        ids = batch["doc_id"].to_numpy()
        texts = batch["text"].to_pylist()
        sigs = np.stack([self.signature(t) for t in texts])  # n x NUM_PERM
        bands = sigs.reshape(len(texts), BANDS, ROWS_PER_BAND)
        bh = (bands * np.uint64(1000003) ** np.arange(
            ROWS_PER_BAND, dtype=np.uint64)).sum(axis=2, dtype=np.uint64)
        n = len(texts)
        return pa.table({
            "doc_id": pa.array(np.repeat(ids, BANDS), type=pa.int64()),
            "band": pa.array(np.tile(np.arange(BANDS), n), type=pa.int32()),
            "band_hash": pa.array(bh.reshape(-1).astype(np.int64)),
        })


MAX_BUCKET = 256  # a band bucket larger than this is a stop-shingle-like
# degenerate collision: emitting its O(n^2) pairs would blow up; truly
# near-dup docs still pair through their other, rarer bands


def candidate_pairs_from_band(df: pd.DataFrame) -> pd.DataFrame:
    """map_groups fn on (band, band_hash): all doc pairs in the bucket."""
    ids = np.sort(df["doc_id"].unique())
    if len(ids) < 2 or len(ids) > MAX_BUCKET:
        return pd.DataFrame({"a": pd.Series(dtype=np.int64),
                             "b": pd.Series(dtype=np.int64)})
    i, j = np.triu_indices(len(ids), k=1)
    return pd.DataFrame({"a": ids[i], "b": ids[j]})


def jaccard(t1: str, t2: str, k: int = 4) -> float:
    s1, s2 = _shingle_hashes(t1, k), _shingle_hashes(t2, k)
    inter = len(np.intersect1d(s1, s2, assume_unique=True))
    return inter / (len(s1) + len(s2) - inter)


def minhash_dedup(ds, threshold: float = 0.7):
    """Full MinHash-LSH near-dup detection. Returns (a, b, jac) pairs
    with verified Jaccard >= threshold, a < b.

    The verify stage broadcasts doc_id->text via ray.put (one object,
    read per actor) — see module docstring for the 100 TB variant."""
    import ray

    # ONE take_all: two separate calls can return rows in different
    # orders (parallel read), and zipping them mis-keys the broadcast
    texts_ref = ray.put({r["doc_id"]: r["text"]
                         for r in ds.select_columns(["doc_id",
                                                     "text"]).take_all()})

    # pool must leave CPUs for upstream read tasks (a full-width pool
    # starves the pipeline — see BASELINE.md tuning notes)
    # TWO actor pools coexist in this pipeline (MinHasher + Verify);
    # each gets a quarter of the cluster so tasks still have room
    cpus = int(ray.cluster_resources().get("CPU", 4))
    pool = max(1, cpus // 4)
    bands = ds.map_batches(MinHasher, batch_format="pyarrow",
                           concurrency=pool, zero_copy_batch=True)
    cands = bands.groupby(["band", "band_hash"]).map_groups(
        candidate_pairs_from_band, batch_format="pandas")
    # NOTE: a pair colliding in k bands appears k times here. Verifying
    # duplicates is cheaper than deduping first: Ray's groupby over the
    # (large) candidate set costs ~100x the cached-jaccard re-checks
    # (measured at sf0.1: 114 s groupby vs seconds of duplicate
    # verifies); the verified set is tiny, so distinct happens after.
    cands = cands.map_batches(
        lambda df: df.drop_duplicates(["a", "b"]),  # within-batch combiner
        batch_format="pandas")

    class Verify:
        def __init__(self):
            self.texts = ray.get(texts_ref)
            self.shingles: dict[int, np.ndarray] = {}  # per-actor cache

        def _sh(self, doc_id: int) -> np.ndarray:
            s = self.shingles.get(doc_id)
            if s is None:
                s = self.shingles[doc_id] = _shingle_hashes(self.texts[doc_id])
            return s

        def __call__(self, batch: pa.Table) -> pa.Table:
            a = batch["a"].to_pylist()
            b = batch["b"].to_pylist()
            jac = np.empty(len(a))
            for i, (x, y) in enumerate(zip(a, b)):
                s1, s2 = self._sh(x), self._sh(y)
                inter = len(np.intersect1d(s1, s2, assume_unique=True))
                jac[i] = inter / (len(s1) + len(s2) - inter)
            keep = jac >= threshold
            return pa.table({
                "a": pa.array(np.asarray(a)[keep], type=pa.int64()),
                "b": pa.array(np.asarray(b)[keep], type=pa.int64()),
                "jac": pa.array(np.round(jac[keep], 4)),
            })

    verified = cands.map_batches(Verify, batch_format="pyarrow",
                                 concurrency=pool)
    # global distinct over the (small) verified set
    return verified.groupby(["a", "b"]).map_groups(
        lambda g: g.head(1), batch_format="pandas")


# ---------------------------------------------------------------------------
# simhash
# ---------------------------------------------------------------------------

def simhash_batch(batch: pa.Table, col: str = "text") -> pa.Table:
    """64-bit SimHash over word features (vectorized per batch)."""
    texts = batch[col].to_pylist()
    out = np.zeros(len(texts), dtype=np.uint64)
    for i, t in enumerate(texts):
        words = t.lower().split()
        if not words:
            continue
        hs = np.array([int.from_bytes(
            hashlib.blake2b(w.encode(), digest_size=8).digest(), "little")
            for w in words], dtype=np.uint64)
        bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)) & 1).sum(axis=0)
        sim = (bits * 2 > len(hs)).astype(np.uint64)
        out[i] = (sim << np.arange(64, dtype=np.uint64)).sum()
    return batch.append_column(
        "simhash", pa.array(out.astype(np.int64), type=pa.int64()))


def simhash_dedup(ds, max_hamming: int = 3):
    """Near-dup pairs by SimHash: bucket by each of 4 16-bit bands (a
    pair within hamming<=3 collides on >=1 band), verify hamming."""
    ds = ds.map_batches(simhash_batch, batch_format="pyarrow",
                        zero_copy_batch=True)
    ds = ds.select_columns(["doc_id", "simhash"])

    def explode(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        sh = batch["simhash"].to_numpy().astype(np.uint64)
        parts = []
        for band in range(4):
            key = ((sh >> np.uint64(band * 16)) & np.uint64(0xFFFF)).astype(np.int64)
            parts.append(pa.table({
                "doc_id": pa.array(ids, type=pa.int64()),
                "simhash": pa.array(sh.astype(np.int64)),
                "band": pa.array(np.full(len(ids), band, dtype=np.int32)),
                "key": pa.array(key),
            }))
        return pa.concat_tables(parts)

    ds = ds.map_batches(explode, batch_format="pyarrow")

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        u = df.drop_duplicates("doc_id").sort_values("doc_id")
        ids = u["doc_id"].to_numpy()
        sh = u["simhash"].to_numpy().astype(np.uint64)
        if len(ids) < 2:
            return pd.DataFrame({"a": pd.Series(dtype=np.int64),
                                 "b": pd.Series(dtype=np.int64),
                                 "hamming": pd.Series(dtype=np.int64)})
        i, j = np.triu_indices(len(ids), k=1)
        x = sh[i] ^ sh[j]
        ham = np.array([bin(v).count("1") for v in x])
        keep = ham <= max_hamming
        return pd.DataFrame({"a": ids[i][keep], "b": ids[j][keep],
                             "hamming": ham[keep].astype(np.int64)})

    out = ds.groupby(["band", "key"]).map_groups(pairs, batch_format="pandas")
    # a pair may collide in several bands -> dedup
    return out.groupby(["a", "b"]).map_groups(
        lambda g: g.head(1), batch_format="pandas")


# ---------------------------------------------------------------------------
# embedding cosine dup
# ---------------------------------------------------------------------------

def embedding_dup_exact(ds, threshold: float = 0.95):
    """All-pairs cosine >= threshold (a < b). Exact: each batch is
    compared against the full broadcast matrix (ray.put once); float64
    math so the DuckDB double oracle agrees."""
    import ray

    rows = ds.select_columns(["vec_id", "embedding"]).take_all()
    ids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
    M = np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in rows])
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    ref = ray.put((ids, Mn))

    class PairFinder:
        def __init__(self):
            self.ids, self.Mn = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            bids = batch["vec_id"].to_numpy()
            E = np.stack([np.asarray(v, dtype=np.float64)
                          for v in batch["embedding"].to_pylist()])
            En = E / np.linalg.norm(E, axis=1, keepdims=True)
            sims = En @ self.Mn.T
            bi, gj = np.nonzero(sims >= threshold)
            a, b = bids[bi], self.ids[gj]
            keep = a < b
            return pa.table({
                "a": pa.array(a[keep], type=pa.int64()),
                "b": pa.array(b[keep], type=pa.int64()),
                "cos": pa.array(np.round(sims[bi, gj][keep], 4)),
            })

    return ds.map_batches(PairFinder, batch_format="pyarrow", concurrency=2)


def embedding_dup_lsh(ds, threshold: float = 0.95, n_planes: int = 12,
                      n_tables: int = 6):
    """Scale path: random-hyperplane LSH buckets, verify within bucket.
    Approximate (may miss pairs LSH never co-buckets); at 100 TB this
    replaces the O(n^2) broadcast with groupby shuffles only."""
    rng = np.random.default_rng(1234)
    dim = len(ds.take(1)[0]["embedding"])
    planes = rng.standard_normal((n_tables, n_planes, dim))
    pows = (1 << np.arange(n_planes)).astype(np.int64)

    def bucketize(batch: pa.Table) -> pa.Table:
        ids = batch["vec_id"].to_numpy()
        E = np.stack([np.asarray(v, dtype=np.float64)
                      for v in batch["embedding"].to_pylist()])
        En = E / np.linalg.norm(E, axis=1, keepdims=True)
        parts = []
        for t in range(n_tables):
            signs = (En @ planes[t].T) > 0
            key = (signs * pows).sum(axis=1)
            parts.append(pa.table({
                "vec_id": pa.array(ids, type=pa.int64()),
                "table": pa.array(np.full(len(ids), t, dtype=np.int32)),
                "key": pa.array(key),
                "embedding": batch["embedding"],
            }))
        return pa.concat_tables(parts)

    ds2 = ds.select_columns(["vec_id", "embedding"]).map_batches(
        bucketize, batch_format="pyarrow")

    def verify(df: pd.DataFrame) -> pd.DataFrame:
        u = df.drop_duplicates("vec_id").sort_values("vec_id")
        if len(u) < 2:
            return pd.DataFrame({"a": pd.Series(dtype=np.int64),
                                 "b": pd.Series(dtype=np.int64),
                                 "cos": pd.Series(dtype=np.float64)})
        ids = u["vec_id"].to_numpy()
        E = np.stack([np.asarray(v, dtype=np.float64) for v in u["embedding"]])
        En = E / np.linalg.norm(E, axis=1, keepdims=True)
        sims = En @ En.T
        i, j = np.triu_indices(len(ids), k=1)
        keep = sims[i, j] >= threshold
        return pd.DataFrame({"a": ids[i][keep], "b": ids[j][keep],
                             "cos": np.round(sims[i, j][keep], 4)})

    out = ds2.groupby(["table", "key"]).map_groups(verify, batch_format="pandas")
    return out.groupby(["a", "b"]).map_groups(
        lambda g: g.head(1), batch_format="pandas")
