"""Persistent IVF-PQ index: the build/query split that makes IVF-ADC
pay off in a batch engine.

The one-shot `similarity.knn_ivfpq` re-fits and re-encodes the corpus
on every call, so its wall is dominated by index-construction passes
(coarse assignment GEMMs + PQ encodes over every row) — measured 335 s
vs plain PQ's 39 s at 8M vectors, because plain PQ pays one encode
pass while IVF-ADC pays ~five. That is not how inverted-file indexes
are used: in production the index is built ONCE and amortized over
every query batch (Jégou et al. 2011 build/search split; FAISS's
add/search). This module persists the compressed index as skinny
parquet and makes the query path touch ONLY it:

- build: fit coarse centroids + residual codebooks (distributed Lloyd
  refinement), then ONE corpus pass assigns + encodes every row to
  (vec_id int64, cell int32, c0..c{m-1} uint8) — 20 bytes/row at m=8
  vs 512 for the raw float64 embedding — sorts by cell (a skinny
  all-to-all; this IS the "inverted file"), and writes hive-partitioned
  parquet sharded by cell range with a numpy sidecar for the model.
- query: compute each query's nprobe cells, read ONLY the shards
  holding probed cells (hive partition pruning — the IO analogue of
  an inverted list seek) under an `isin` row filter, ADC-scan the
  codes, and exact-re-rank the tiny shortlist against the index's own
  vec_id-sharded embedding store (see below) — no full-corpus pass
  anywhere in the query path.

The embedding store is the point-lookup side of the index: at build
time the raw embeddings are written hive-partitioned by
hash(vec_id) % V_SHARDS with each batch pre-sorted by (vshard,
vec_id), so (a) the re-rank reads only the shard DIRS holding
candidate ids (a strict subset whenever the candidate set is small
relative to V_SHARDS), and (b) within a touched shard, per-file
vec_id min/max stats stay tight (input arrives roughly id-ordered),
letting the `isin` filter prune row groups — the parquet approximation
of a point-lookup KV store. The candidate set per query batch is
O(n_queries * shortlist), independent of corpus width, so at 100 TB
the re-rank read is bounded by candidates-touched row groups, not
corpus size.

Scale shape: build = fit passes + one encode pass + one skinny
shuffle, all distributed, driver holds only the model; query =
pruned skinny scan + the two-level shortlist reduce. Both recall-gated
(>= 0.9 pytest + `knn_ivfpq_indexed_recall` driver query).
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa

from .similarity import (_exact_rerank, _pq_encode, _reduce_shortlist,
                         auto_centroid_count, emb_matrix, fit_centroids,
                         fit_residual_codebooks, knn_bruteforce, query_matrix)

N_SHARDS = 64
V_SHARDS = 64          # embedding-store dirs, keyed hash(vec_id)
# bump when build/encode semantics change: the ensure_index cache key
# includes it, so a persisted /tmp index can never serve results from
# an older codec (v2: added the vec_id-sharded embedding store)
INDEX_VERSION = 2

# test hook: the exact file list the last re-rank read (None when the
# legacy full-gather fallback ran)
LAST_RERANK_FILES: "list[str] | None" = None


def _vshard(ids: np.ndarray) -> np.ndarray:
    """Deterministic shard of a vec_id array: Knuth multiplicative
    hash so strided/sequential id layouts still spread uniformly."""
    return ((ids.astype(np.uint64) * np.uint64(2654435761))
            % np.uint64(2 ** 32) % np.uint64(V_SHARDS)).astype(np.int32)


def auto_nprobe(n_centroids: int, frac: float = 0.05,
                lo: int = 8) -> int:
    """Probe a constant FRACTION of cells (min lo): cell counts scale
    with the corpus (auto_centroid_count), so a fixed nprobe silently
    decays coverage — 56 probes were 58% of a 97-cell index but 2.7%
    of a 2048-cell one (measured recall 0.7 at 8M until this rule)."""
    return min(n_centroids, max(lo, int(round(frac * n_centroids))))


def _encode_and_write(ds, out_dir: str, C: np.ndarray, books: np.ndarray,
                      cells_per_shard: int, emb_n_rows: int = 0,
                      dim_bytes: int = 0) -> None:
    """Encode a corpus slice against a FROZEN model and write both
    index sides — codes (cell-sorted hive shards) and the point-lookup
    embedding store. Shared by full build and incremental append, so
    appended files are byte-compatible with built ones (write_parquet
    appends into existing hive dirs; per-write uuid filenames can't
    collide)."""
    import ray

    mref = ray.put((C.astype(np.float32), books))

    def encode(batch: pa.Table) -> pa.Table:
        C32, books_ = ray.get(mref)
        ids = batch["vec_id"].to_numpy()
        E = emb_matrix(batch["embedding"], dtype=np.float32)
        En = E / np.linalg.norm(E, axis=1, keepdims=True)
        cid = np.argmax(En @ C32.T, axis=1).astype(np.int32)
        codes = _pq_encode(En - C32[cid], books_)
        cols = {"vec_id": pa.array(ids, type=pa.int64()),
                "cell": pa.array(cid, type=pa.int32()),
                "shard": pa.array((cid // cells_per_shard).astype(
                    np.int32), type=pa.int32())}
        for j in range(codes.shape[1]):
            cols[f"c{j}"] = pa.array(codes[:, j], type=pa.uint8())
        return pa.table(cols)

    code_ds = ds.map_batches(encode, batch_format="pyarrow",
                             zero_copy_batch=True)
    # skinny all-to-all: cell-contiguous layout IS the inverted file —
    # each written block covers a narrow cell range, so the hive shard
    # dirs stay pure and parquet row-group stats stay tight
    code_ds.sort("cell").write_parquet(os.path.join(out_dir, "codes"),
                                       partition_cols=["shard"])

    # point-lookup embedding store: map-side only (no shuffle) — each
    # block sorts itself by (vshard, vec_id) and hive-writes; dirs stay
    # pure and per-file vec_id stats stay tight for isin pushdown
    def emb_shard(batch: pa.Table) -> pa.Table:
        ids = batch["vec_id"].to_numpy()
        vs = _vshard(ids)
        order = np.lexsort((ids, vs))
        return (batch.select(["vec_id", "embedding"])
                .append_column("vshard", pa.array(vs, type=pa.int32()))
                .take(pa.array(order)))

    # coalesce before the hive write: file count = blocks x V_SHARDS,
    # and the QUERY pays per-file open/stats overhead on every touched
    # shard — at 8M vectors the un-coalesced store was 4096 files and
    # file overhead, not bytes, floored the re-rank read (measured).
    # Size blocks to ~128 MB of store payload so the count stays
    # proportional to data, never to the reader's parallelism.
    n_rows_est = emb_n_rows if emb_n_rows else 0
    store_blocks = max(8, (n_rows_est * (dim_bytes + 12)) // (128 << 20))
    (ds.map_batches(emb_shard, batch_format="pyarrow",
                    zero_copy_batch=True)
       .repartition(int(store_blocks), shuffle=False)
       .write_parquet(os.path.join(out_dir, "emb"),
                      partition_cols=["vshard"]))


def _save_meta(out_dir: str, meta: dict) -> None:
    """Atomic meta write (appends update in place; readers must never
    see a torn file)."""
    import tempfile

    fd, tmp = tempfile.mkstemp(dir=out_dir, suffix=".mtmp")
    os.close(fd)
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.rename(tmp, os.path.join(out_dir, "meta.json"))


def build_ivfpq_index(ds, out_dir: str, n_centroids: int | None = None,
                      m: int = 8, ks: int = 128, sample_n: int = 4096,
                      centroid_refine_iters: int = 1,
                      book_refine_iters: int = 1,
                      refine_sample_mod: int | None = None,
                      model: "tuple[np.ndarray, np.ndarray] | None"
                      = None) -> dict:
    """Fit + encode + sort + write. Returns the meta dict (also written
    to out_dir/meta.json; model matrices to out_dir/model.npz).
    Defaults refine each model ONCE over the full corpus — at build
    time every extra Lloyd pass is a full-corpus GEMM, and recall is
    gated downstream. ``model=(C, books)`` skips the fit and encodes
    against a FROZEN model — the append-equality test hook (a full
    build over a union corpus under the base model must equal the
    incrementally appended index exactly)."""
    n_rows = ds.count()
    if n_centroids is None:
        n_centroids = auto_centroid_count(n_rows)
    dim = len(ds.take(1)[0]["embedding"])
    if model is not None:
        C, books = model
        m = books.shape[0]
        ks = books.shape[1]
    else:
        C = fit_centroids(ds, n_centroids, sample_n=min(sample_n, 2048),
                          refine_iters=centroid_refine_iters,
                          refine_sample_mod=refine_sample_mod)
        books = fit_residual_codebooks(
            ds, C, m=m, ks=ks, sample_n=sample_n,
            refine_iters=book_refine_iters,
            refine_sample_mod=refine_sample_mod)
    n_cells = C.shape[0]
    cells_per_shard = -(-n_cells // N_SHARDS)
    _encode_and_write(ds, out_dir, C, books, cells_per_shard,
                      emb_n_rows=int(n_rows), dim_bytes=4 * dim)
    np.savez(os.path.join(out_dir, "model.npz"), C=C, books=books)
    meta = {"n_rows": int(n_rows), "dim": int(dim), "m": int(m),
            "ks": int(ks), "n_centroids": int(n_cells),
            "cells_per_shard": int(cells_per_shard), "emb_store": True,
            "base_rows": int(n_rows), "appended_rows": 0}
    _save_meta(out_dir, meta)
    return meta


def append_ivfpq_index(index_dir: str, ds) -> dict:
    """Incremental maintenance: encode a NEW batch of vectors against
    the index's FROZEN model (centroids + codebooks from model.npz) and
    append its code/embedding files into the existing cell/vshard
    shard dirs — one batch-sized pass instead of the full build wall
    (65.7 s at 8M vectors, linear in the corpus). N appends produce
    query output identical to one append of the union, and to a full
    build over the union under the same model (asserted in pytest);
    recall decays only as the frozen centroids drift from the union
    distribution, which the needs_rebuild staleness trigger bounds —
    the sink-side analogue of the reference journal's tailing
    continuous operation (journal.go:495-511). Precondition: appended
    batches carry vec_ids disjoint from the indexed corpus
    (run_index_ingest's file-claiming state guarantees it)."""
    with open(os.path.join(index_dir, "meta.json")) as f:
        meta = json.load(f)
    if not meta.get("emb_store"):
        raise ValueError(
            f"index at {index_dir} predates v2 (no embedding store); "
            "rebuild before appending")
    n_new = ds.count()
    if n_new == 0:
        return meta
    model = np.load(os.path.join(index_dir, "model.npz"))
    _encode_and_write(ds, index_dir, model["C"], model["books"],
                      meta["cells_per_shard"], emb_n_rows=int(n_new),
                      dim_bytes=4 * meta["dim"])
    meta["n_rows"] += int(n_new)
    meta["appended_rows"] = meta.get("appended_rows", 0) + int(n_new)
    _save_meta(index_dir, meta)
    return meta


def needs_rebuild(index_dir: str, frac: float = 0.5) -> bool:
    """Staleness trigger: appended rows exceed `frac` of the rows the
    frozen model was last fit over."""
    with open(os.path.join(index_dir, "meta.json")) as f:
        meta = json.load(f)
    return meta.get("appended_rows", 0) > frac * max(
        meta.get("base_rows", meta["n_rows"]), 1)


def probed_shard_files(index_dir: str, shards) -> "list[str]":
    """Parquet files of exactly the probed shard directories — the
    dir-level pruning the query path reads."""
    import glob

    return [f for s in shards for f in sorted(glob.glob(
        os.path.join(index_dir, "codes", f"shard={int(s)}", "*.parquet")))]


def all_shard_files(index_dir: str) -> "list[str]":
    import glob

    return sorted(glob.glob(
        os.path.join(index_dir, "codes", "shard=*", "*.parquet")))


def candidate_emb_files(index_dir: str, cand: np.ndarray) -> "list[str]":
    """Embedding-store files of exactly the shard dirs holding the
    candidate vec_ids — the re-rank's dir-level pruning."""
    import glob

    shards = np.unique(_vshard(np.asarray(cand, dtype=np.int64)))
    return [f for s in shards for f in sorted(glob.glob(
        os.path.join(index_dir, "emb", f"vshard={int(s)}", "*.parquet")))]


def all_emb_files(index_dir: str) -> "list[str]":
    import glob

    return sorted(glob.glob(
        os.path.join(index_dir, "emb", "vshard=*", "*.parquet")))


def knn_ivfpq_query(index_dir: str, emb_ds=None, k: int = 5,
                    nprobe: int | None = None,
                    shortlist: int | None = None,
                    Q: np.ndarray | None = None) -> pd.DataFrame:
    """ADC top-k over a persisted index: reads ONLY the code shards
    containing probed cells, then exact-re-ranks the shortlist from
    the index's own vec_id-sharded embedding store (emb_ds is only
    needed as a fallback for legacy pre-v2 indexes without a store).
    Q overrides the default synthetic query matrix (rows must be
    unit-norm, shape (nq, dim)) — the text-kNN composition passes
    hash-embedded query strings here."""
    import pyarrow.compute as pc
    import ray
    import ray.data as rd

    with open(os.path.join(index_dir, "meta.json")) as f:
        meta = json.load(f)
    model = np.load(os.path.join(index_dir, "model.npz"))
    C, books = model["C"], model["books"]
    m, dim = meta["m"], meta["dim"]
    n_rows, n_cells = meta["n_rows"], meta["n_centroids"]
    if nprobe is None:
        nprobe = auto_nprobe(n_cells)
    if shortlist is None:
        # sqrt growth with an 8192 CAP: the exact re-rank reads
        # O(n_queries * shortlist) rows, so an uncapped sqrt keeps the
        # candidate set corpus-coupled (22.6k/query at 8M -> 181k ids,
        # every store shard touched). Production re-rank shortlists are
        # constants (FAISS refine factors); measured at 8M clustered:
        # recall@5 = 1.0 at 8192 (and still 0.95 at 2048), query wall
        # 10.8 s uncapped -> 6.5 s capped. The recall gates
        # (knn_ivfpq_indexed_recall, pytest >= 0.9) hold the line.
        shortlist = min(max(64, int(8 * np.sqrt(n_rows))), 8192)
    if Q is None:
        Q = query_matrix(dim)
    else:
        Q = np.asarray(Q, dtype=np.float64)
    nq, dsub = Q.shape[0], dim // m
    qC = (Q @ C.T).astype(np.float32)                 # (nq, cells)
    probes = np.argsort(-qC, axis=1)[:, :nprobe]
    probed = np.unique(probes)
    shards = np.unique(probed // meta["cells_per_shard"])
    lut = np.stack([books[j] @ Q[:, j * dsub:(j + 1) * dsub].T
                    for j in range(m)]).astype(np.float32)
    bref = ray.put((lut, qC, probes))
    code_cols = [f"c{j}" for j in range(m)]

    # dir-level pruning: list ONLY the shard directories holding probed
    # cells (ray's parquet filter binds against the file schema, so a
    # hive-partition-column filter can't prune — explicit paths can),
    # then a row-level isin on cell within the touched shards
    shard_files = probed_shard_files(index_dir, shards)
    flt = pc.field("cell").isin(pa.array(probed.astype(np.int32)))
    idx = rd.read_parquet(shard_files,
                          columns=["vec_id", "cell"] + code_cols,
                          filter=flt)

    def scan(batch: pa.Table) -> pa.Table:
        lut_t, qC_t, probes_t = ray.get(bref)
        ids = batch["vec_id"].to_numpy()
        cid = batch["cell"].to_numpy()
        acc = lut_t[0][batch[code_cols[0]].to_numpy()].copy()
        for j in range(1, m):
            acc += lut_t[j][batch[code_cols[j]].to_numpy()]
        acc += qC_t[:, cid].T                         # coarse term
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
            "sim": pa.array(np.concatenate(parts["sim"]))})

    cpus = int(ray.cluster_resources().get("CPU", 8))
    scan_rows = max(1024, min(8 * shortlist, -(-n_rows // cpus)))
    partials = idx.map_batches(scan, batch_format="pyarrow",
                               batch_size=scan_rows)
    short, cand = _reduce_shortlist(partials, shortlist, cpus)
    if cand.size == 0:
        # every probed cell was empty (possible on degenerate tiny
        # indexes) — empty result in the output contract, not a crash
        return pd.DataFrame({
            "qid": np.empty(0, np.int64),
            "rank": np.empty(0, np.int64),
            "vec_id": np.empty(0, np.int64),
            "sim": np.empty(0, np.float64)})

    global LAST_RERANK_FILES
    if meta.get("emb_store"):
        # point-lookup re-rank: read ONLY the emb-store shards holding
        # candidate ids, isin-filtered — no full-corpus pass
        emb_files = candidate_emb_files(index_dir, cand)
        LAST_RERANK_FILES = emb_files
        cflt = pc.field("vec_id").isin(pa.array(cand, type=pa.int64()))
        got = pa.concat_tables(
            rd.read_parquet(emb_files, columns=["vec_id", "embedding"],
                            filter=cflt)
            .iter_batches(batch_size=None, batch_format="pyarrow"))
        return _exact_rerank(got, short, Q, k)

    # legacy (pre-v2) index without an embedding store: map-side
    # filter pass over the caller's embeddings table
    LAST_RERANK_FILES = None
    cref = ray.put(cand)

    def gather(batch: pa.Table) -> pa.Table:
        want = ray.get(cref)
        keep = pc.is_in(batch["vec_id"],
                        value_set=pa.array(want, type=pa.int64()))
        return batch.select(["vec_id", "embedding"]).filter(keep)

    got = pa.concat_tables(
        emb_ds.map_batches(gather, batch_format="pyarrow",
                           zero_copy_batch=True)
        .iter_batches(batch_size=None, batch_format="pyarrow"))
    return _exact_rerank(got, short, Q, k)


def ensure_index(sf_dir: str, emb_ds, cache_root: str = "/tmp/graft_ann_index",
                 key_extra: str = "", **build_kwargs) -> str:
    """Build-once cache for query entry points: one index per
    (sf_dir, params) key. Concurrent schedulers are serialized by the
    same O_EXCL lease the incremental-ingest path uses
    (stages/incremental.py): the loser WAITS instead of paying a
    second full build (65.7 s at 8M vectors), then finds the winner's
    meta.json and returns. The tmp-dir + atomic-rename write is kept
    so a crashed builder never leaves a half-written index visible."""
    import shutil
    import tempfile

    from ..stages.incremental import ingest_lease

    parts = [f"v{INDEX_VERSION}",
             os.path.basename(os.path.normpath(sf_dir))] \
        + ([key_extra] if key_extra else []) + [
        f"{k}={v}" for k, v in sorted(build_kwargs.items())]
    out = os.path.join(cache_root, "-".join(parts).replace("/", "_"))
    if os.path.exists(os.path.join(out, "meta.json")):
        return out
    lock_dir = out + ".lock"
    os.makedirs(lock_dir, exist_ok=True)
    with ingest_lease(lock_dir, ttl_sec=3600.0, timeout_sec=3600.0):
        if os.path.exists(os.path.join(out, "meta.json")):
            return out          # a concurrent builder finished first
        tmp = tempfile.mkdtemp(dir=cache_root, prefix=".build-")
        build_ivfpq_index(emb_ds, tmp, **build_kwargs)
        try:
            os.rename(tmp, out)
        except OSError:
            if not os.path.exists(os.path.join(out, "meta.json")):
                raise
            shutil.rmtree(tmp, ignore_errors=True)
    return out


def knn_ivfpq_indexed(sf_dir: str, emb_ds, k: int = 5,
                      **build_kwargs) -> pd.DataFrame:
    """Query entry point: build-once (cached) + query."""
    idx = ensure_index(sf_dir, emb_ds, **build_kwargs)
    return knn_ivfpq_query(idx, emb_ds, k=k)


def knn_ivfpq_indexed_recall(sf_dir: str, emb_ds, k: int = 5,
                             **build_kwargs) -> pd.DataFrame:
    """recall@k of the persisted-index query path vs exact brute
    force — the driver-visible gate."""
    bf = knn_bruteforce(emb_ds, k)
    iv = knn_ivfpq_indexed(sf_dir, emb_ds, k=k, **build_kwargs)
    qids = sorted(bf["qid"].unique())
    recalls = []
    for qid in qids:
        truth = set(bf.loc[bf["qid"] == qid, "vec_id"])
        got = set(iv.loc[iv["qid"] == qid, "vec_id"])
        recalls.append(len(truth & got) / max(len(truth), 1))
    return pd.DataFrame({"qid": np.array(qids + [-1], dtype=np.int64),
                         "recall_at_k": np.round(
                             recalls + [float(np.mean(recalls))], 4)})
