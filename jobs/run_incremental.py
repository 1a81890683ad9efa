"""ray-job entrypoint for incremental (continuous-operation) ingest —
the batch analogue of the reference's journal tailing. Invoke on a
schedule against a GROWING corpus directory; each run processes only
files no previous run ingested and appends one ingest=NNN/ batch:

    ray job submit --working-dir . -- \
        python jobs/run_incremental.py --input <growing_dir> \
            --output /data/ingest_out

Exactly-once at file granularity (see
go_fluentd_ray/stages/incremental.py). Re-running with no new files
is a no-op.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True,
                    help="growing transcripts parquet dir")
    ap.add_argument("--output", default="/tmp/ingest_out")
    ap.add_argument("--buckets", type=int, default=None)
    ap.add_argument("--config", help="YAML pipeline config")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        # address=None respects RAY_ADDRESS (set by `ray job submit`;
        # preset to "local" in this sandbox)
        ray.init(include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, ".")
    from go_fluentd_ray.stages import incremental

    cfg = None
    if args.config:
        from go_fluentd_ray import config_yaml

        cfg = config_yaml.from_yaml(args.config)
    t0 = time.time()
    metrics = incremental.run_incremental(args.input, args.output,
                                          cfg=cfg,
                                          num_buckets=args.buckets)
    metrics["wall_sec"] = round(time.time() - t0, 2)
    print(json.dumps(metrics))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
