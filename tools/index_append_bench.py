"""Incremental-index maintenance evidence: wall cost of absorbing one
ingest batch by APPEND vs full REBUILD, for both persisted indexes.

Corpus is split 90/10: build the index over the 90% base, then time
(a) append of the 10% batch into the existing shard dirs vs (b) a
full rebuild over 100%. BM25 appends are exactness-gated in pytest
(scores bit-identical to the rebuild); IVF-PQ appends encode against
the frozen model (recall-gated). This tool supplies the COST side:
the daily-ingest user pays ~batch-sized work per tick, not the
full-corpus build wall.

    python tools/index_append_bench.py          # 32 cpus, one process
    GRAFT_APPEND_DOCS=1000000 GRAFT_APPEND_VECS=2000000 ...
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

N_DOCS = int(os.environ.get("GRAFT_APPEND_DOCS", "1000000"))
N_VECS = int(os.environ.get("GRAFT_APPEND_VECS", "2000000"))


def main() -> None:
    import ray

    ray.init(address="local", num_cpus=32, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import ray.data as rd

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from ann_scaling import ensure_embeddings
    from dedup_scaling import ensure_docs

    from go_fluentd_ray.functions import annindex, bm25index
    from go_fluentd_ray.io_util import sized_read_parquet

    out = {"n_docs": N_DOCS, "n_vecs": N_VECS}

    # ---- BM25: 90% base + 10% batch ---------------------------------
    docs = ensure_docs(N_DOCS)
    import glob

    files = sorted(glob.glob(os.path.join(docs, "*.parquet")))
    cut = max(1, int(len(files) * 0.9))
    base_f, batch_f = files[:cut], files[cut:]
    idx = tempfile.mkdtemp(prefix="bm25ab-")
    try:
        t0 = time.time()
        bm25index.build_bm25_index(rd.read_parquet(base_f), idx)
        out["bm25_base_build_sec"] = round(time.time() - t0, 2)
        t0 = time.time()
        bm25index.append_bm25_index(idx, rd.read_parquet(batch_f))
        out["bm25_append_sec"] = round(time.time() - t0, 2)
    finally:
        shutil.rmtree(idx, ignore_errors=True)
    idx = tempfile.mkdtemp(prefix="bm25full-")
    try:
        t0 = time.time()
        bm25index.build_bm25_index(rd.read_parquet(files), idx)
        out["bm25_full_rebuild_sec"] = round(time.time() - t0, 2)
    finally:
        shutil.rmtree(idx, ignore_errors=True)
    out["bm25_append_vs_rebuild"] = round(
        out["bm25_append_sec"] / out["bm25_full_rebuild_sec"], 3)

    # ---- IVF-PQ: 90% base + 10% batch -------------------------------
    emb = ensure_embeddings(N_VECS, 64, clusters=max(64, N_VECS // 4096))
    files = sorted(glob.glob(os.path.join(emb, "*.parquet")))
    cut = max(1, int(len(files) * 0.9))
    base_f, batch_f = files[:cut], files[cut:]
    idx = tempfile.mkdtemp(prefix="annab-")
    try:
        t0 = time.time()
        annindex.build_ivfpq_index(sized_read_parquet(base_f), idx)
        out["ivfpq_base_build_sec"] = round(time.time() - t0, 2)
        t0 = time.time()
        annindex.append_ivfpq_index(idx, sized_read_parquet(batch_f))
        out["ivfpq_append_sec"] = round(time.time() - t0, 2)
    finally:
        shutil.rmtree(idx, ignore_errors=True)
    idx = tempfile.mkdtemp(prefix="annfull-")
    try:
        t0 = time.time()
        annindex.build_ivfpq_index(sized_read_parquet(files), idx)
        out["ivfpq_full_rebuild_sec"] = round(time.time() - t0, 2)
    finally:
        shutil.rmtree(idx, ignore_errors=True)
    out["ivfpq_append_vs_rebuild"] = round(
        out["ivfpq_append_sec"] / out["ivfpq_full_rebuild_sec"], 3)
    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    main()
