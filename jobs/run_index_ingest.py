"""ray-job entrypoint for incremental INDEX maintenance — keep a
persisted BM25 inverted index or IVF-PQ ANN index in sync with a
growing corpus directory. Invoke on a schedule; each tick claims only
files no previous tick ingested, appends them into the existing shard
dirs, and pays a full rebuild once appends exceed the staleness
fraction (see go_fluentd_ray/stages/indexingest.py):

    ray job submit --working-dir . -- \
        python jobs/run_index_ingest.py --input <growing_docs_dir> \
            --output /data/bm25_root --kind bm25

    ray job submit --working-dir . -- \
        python jobs/run_index_ingest.py --input <growing_emb_dir> \
            --output /data/ann_root --kind ivfpq

Concurrent ticks serialize on the O_EXCL lease; re-running with no new
files is a no-op. Queries read <output>/index (bm25index.
bm25_index_query / annindex.knn_ivfpq_query).
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True,
                    help="growing parquet dir (documents or embeddings)")
    ap.add_argument("--output", default="/tmp/index_out",
                    help="index root; the index lives at <output>/index")
    ap.add_argument("--kind", choices=("bm25", "ivfpq"), default="bm25")
    ap.add_argument("--rebuild-frac", type=float, default=None,
                    help="staleness fraction triggering a full rebuild")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, ".")
    from go_fluentd_ray.stages import indexingest

    t0 = time.time()
    metrics = indexingest.run_index_ingest(
        args.input, args.output, kind=args.kind,
        rebuild_frac=args.rebuild_frac)
    metrics["wall_sec"] = round(time.time() - t0, 2)
    print(json.dumps(metrics))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
