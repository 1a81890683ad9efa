"""Scaling evidence for the connected-components + anti-join dedup-to-
rows path: run minhash pair generation ONCE (untimed), then time
connected_components + bucketed_anti_join over the same corpus at two
parallelism levels (fresh processes), reporting wall, iteration count
and efficiency.

    python tools/components_scaling.py          # orchestrates 8 vs 32
    python tools/components_scaling.py --one N  # single timed run
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

N_DOCS = int(os.environ.get("GRAFT_CC_DOCS", "400000"))


def one(ncpu: int) -> dict:
    import ray

    ray.init(address="local", num_cpus=ncpu, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import ray.data as rd

    from dedup_scaling import ensure_docs
    from go_fluentd_ray.functions import dedup
    from go_fluentd_ray.functions.components import connected_components
    from go_fluentd_ray.functions.shuffle import bucketed_anti_join

    path = ensure_docs(N_DOCS)
    ds = rd.read_parquet(path)
    # pair graph is the INPUT of the measured stage; materialize it
    # untimed so the timing isolates components + anti-join
    pairs = dedup.minhash_dedup(ds, min_bands=2).materialize()

    t0 = time.time()
    stats: dict = {}
    comp = connected_components(pairs, stats=stats)

    import pyarrow.compute as pc

    def non_roots(batch):
        return batch.filter(
            pc.not_equal(batch["n"], batch["root"])).select(["n"])

    drop = comp.map_batches(non_roots, batch_format="pyarrow")
    kept = bucketed_anti_join(ds, "doc_id", drop, "n").count()
    wall = time.time() - t0
    ray.shutdown()
    return {"num_cpus": ncpu, "sec": round(wall, 2), "kept_rows": kept,
            **stats}


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
            if best is None or r["sec"] < best["sec"]:
                best = r
        results[ncpu] = best
    eff = (results[8]["sec"] / results[32]["sec"]) / (32 / 8)
    print(json.dumps({
        "metric": "connected-components + anti-join scaling 8->32 cpus",
        "n_docs": N_DOCS,
        "sec_8cpu": results[8]["sec"], "sec_32cpu": results[32]["sec"],
        "iterations": results[32].get("iterations"),
        "n_edges": results[32].get("n_edges"),
        "n_nodes": results[32].get("n_nodes"),
        "kept_rows": results[32]["kept_rows"],
        "scaling_efficiency": round(eff, 3),
    }))


if __name__ == "__main__":
    here = os.path.dirname(os.path.abspath(__file__))
    sys.path.insert(0, os.path.dirname(here))
    sys.path.insert(0, here)
    main()
