"""Scaling evidence for the shuffle-native MinHash-LSH dedup: run the
same job at two parallelism levels (fresh processes) over a synthetic
documents corpus derived deterministically from the transcript
generator, and report throughput at both plus efficiency.

    python tools/dedup_scaling.py            # orchestrates 8 vs 32
    python tools/dedup_scaling.py --one N    # single timed run, N cpus
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

N_DOCS = int(os.environ.get("GRAFT_DEDUP_DOCS", "100000"))


def ensure_docs(n_docs: int) -> str:
    """documents-shaped parquet derived from the transcript corpus's
    text column (deterministic, cached)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from go_fluentd_ray import synth

    out = os.path.join(synth.CACHE_ROOT, f"docs-v1-{n_docs}")
    meta = out + ".meta.json"
    if os.path.exists(meta) and os.path.isdir(out):
        return out
    import glob
    import tempfile

    corpus = synth.ensure_corpus(n_docs)  # 1 turn -> 1 doc
    os.makedirs(synth.CACHE_ROOT, exist_ok=True)
    tmp = tempfile.mkdtemp(dir=synth.CACHE_ROOT,
                           prefix=f".docs-v1-{n_docs}-")
    doc_id = 0
    part = 0
    for f in sorted(glob.glob(os.path.join(corpus, "*.parquet"))):
        t = pq.read_table(f, columns=["text"])
        n = t.num_rows
        ids = pa.array(range(doc_id, doc_id + n), type=pa.int64())
        pq.write_table(pa.table({"doc_id": ids, "text": t["text"]}),
                       os.path.join(tmp, f"part-{part:05d}.parquet"))
        doc_id += n
        part += 1
    try:
        os.rename(tmp, out)
    except OSError:
        if not os.path.isdir(out):
            raise
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)
    if not os.path.exists(meta):
        with open(meta, "w") as f:
            json.dump({"n_docs": doc_id}, f)
    return out


def one(ncpu: int) -> dict:
    import ray

    ray.init(address="local", num_cpus=ncpu, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import ray.data as rd

    from go_fluentd_ray.functions import dedup

    path = ensure_docs(N_DOCS)
    ds = rd.read_parquet(path)
    t0 = time.time()
    pairs = dedup.minhash_dedup(ds, min_bands=2).count()
    wall = time.time() - t0
    ray.shutdown()
    return {"num_cpus": ncpu, "sec": round(wall, 2), "pairs": pairs,
            "docs_per_sec": round(N_DOCS / wall, 1)}


def main() -> None:
    if "--one" in sys.argv:
        print(json.dumps(one(int(sys.argv[sys.argv.index("--one") + 1]))))
        return
    # pre-generate outside the timed runs
    ensure_docs(N_DOCS)
    results = {}
    for ncpu in (8, 32):
        best = None
        for _ in range(2):
            out = subprocess.run(
                [sys.executable, __file__, "--one", str(ncpu)],
                capture_output=True, text=True, check=True).stdout
            r = json.loads(out.strip().splitlines()[-1])
            if best is None or r["sec"] < best["sec"]:
                best = r
        results[ncpu] = best
    eff = (results[8]["sec"] / results[32]["sec"]) / (32 / 8)
    print(json.dumps({
        "metric": "minhash_dedup scaling 8->32 cpus",
        "n_docs": N_DOCS,
        "sec_8cpu": results[8]["sec"], "sec_32cpu": results[32]["sec"],
        "pairs": results[32]["pairs"],
        "scaling_efficiency": round(eff, 3),
    }))


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    main()
