"""Scaling evidence for the lexical-retrieval family: BM25 inverted-
index BUILD (the corpus-pass + skinny postings shuffle) and QUERY (the
dir-pruned pruned-scan path) at two parallelism levels, fresh
processes, over a synthetic documents corpus (dedup_scaling's
generator — transcript text, zipf-ish vocab). Also times the fused
raw-text kNN scan (embed.text_knn), the family's zero-shuffle member.

The scaling signal lives in the build's corpus pass; the query path
over a FIXED query set has a constant-size pruned input, so its wall
is a floor that amortizes (reported, not gated).

    python tools/retrieval_scaling.py          # orchestrates 8 vs 32
    python tools/retrieval_scaling.py --one N  # single timed run
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

N_DOCS = int(os.environ.get("GRAFT_RETR_DOCS", "1000000"))


def one(ncpu: int) -> dict:
    import ray

    ray.init(address="local", num_cpus=ncpu, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import ray.data as rd

    from dedup_scaling import ensure_docs
    from go_fluentd_ray.functions import bm25index, embed

    path = ensure_docs(N_DOCS)
    ds = rd.read_parquet(path, columns=["doc_id", "text"])
    idx = tempfile.mkdtemp(prefix="bm25idx-scale-")
    try:
        t0 = time.time()
        bm25index.build_bm25_index(ds, idx)
        build_sec = time.time() - t0
        t0 = time.time()
        nq = len(bm25index.bm25_index_query(idx))
        query_sec = time.time() - t0
    finally:
        shutil.rmtree(idx, ignore_errors=True)
    t0 = time.time()
    nk = len(embed.text_knn(ds))
    knn_sec = time.time() - t0
    ray.shutdown()
    return {"num_cpus": ncpu, "build_sec": round(build_sec, 2),
            "query_sec": round(query_sec, 2),
            "text_knn_sec": round(knn_sec, 2),
            "query_rows": nq, "knn_rows": nk,
            "build_docs_per_sec": round(N_DOCS / build_sec, 1)}


def main() -> None:
    if "--one" in sys.argv:
        print(json.dumps(one(int(sys.argv[sys.argv.index("--one") + 1]))))
        return
    from dedup_scaling import ensure_docs

    ensure_docs(N_DOCS)  # pre-generate outside the timed runs
    results = {}
    for ncpu in (8, 32):
        best = None
        for _ in range(2):
            out = subprocess.run(
                [sys.executable, __file__, "--one", str(ncpu)],
                capture_output=True, text=True, check=True).stdout
            r = json.loads(out.strip().splitlines()[-1])
            if best is None or r["build_sec"] < best["build_sec"]:
                best = r
        results[ncpu] = best
    beff = (results[8]["build_sec"] / results[32]["build_sec"]) / 4
    keff = (results[8]["text_knn_sec"] / results[32]["text_knn_sec"]) / 4
    print(json.dumps({
        "metric": "bm25-index build + text_knn scaling 8->32 cpus",
        "n_docs": N_DOCS,
        "build_sec_8cpu": results[8]["build_sec"],
        "build_sec_32cpu": results[32]["build_sec"],
        "build_scaling_efficiency": round(beff, 3),
        "query_sec_8cpu": results[8]["query_sec"],
        "query_sec_32cpu": results[32]["query_sec"],
        "text_knn_sec_8cpu": results[8]["text_knn_sec"],
        "text_knn_sec_32cpu": results[32]["text_knn_sec"],
        "text_knn_scaling_efficiency": round(keff, 3),
    }))


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    main()
