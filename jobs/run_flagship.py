"""ray-job entrypoint for the flagship pipeline (north rule: submitted
via `ray job submit` on fixed-size clusters).

    ray job submit --working-dir . -- \
        python jobs/run_flagship.py --input <transcripts_dir> \
            --output /data/out --buckets 512

On the sandbox single node:  python jobs/run_flagship.py --demo
Resumable: re-running with the same --output skips completed
partitions (see go_fluentd_ray/stages/sinks.py).
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", help="transcripts parquet dir")
    ap.add_argument("--output", default="/tmp/flagship_out")
    ap.add_argument("--buckets", type=int, default=None)
    ap.add_argument("--config", help="YAML pipeline config (settings.yml-shaped)")
    ap.add_argument("--demo", action="store_true",
                    help="use the deterministic 600k-turn synthetic corpus")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        # address=None respects RAY_ADDRESS: `ray job submit` sets it
        # to the cluster address; this sandbox presets it to "local".
        # A hard-coded address="local" would silently boot a fresh
        # single-node instance on a real cluster.
        ray.init(include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, ".")
    from go_fluentd_ray.stages import sinks

    cfg = None
    if args.config:
        from go_fluentd_ray import config_yaml

        cfg = config_yaml.from_yaml(args.config)
    inp = args.input
    if args.demo or not inp:
        from go_fluentd_ray import synth

        inp = synth.ensure_corpus(600_000)
    t0 = time.time()
    metrics = sinks.run_resumable(inp, args.output, cfg=cfg,
                                  num_buckets=args.buckets)
    metrics["wall_sec"] = round(time.time() - t0, 2)
    print(json.dumps(metrics))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
