"""Hot-conv_id skew evidence for the concat shuffle (SURVEY §4): run
the flagship pipeline end-to-end on (a) the standard Zipf corpus and
(b) a pathological corpus where ONE conversation holds 20% of all
turns, same size, same cpus, fresh processes. The partitioning
assumption co-locates that conv in one bucket; the claim under test is
that the vectorized in-bucket segmentation absorbs it, so the skewed
wall stays within the imbalance bound (hot bucket ~ hot_frac + 1/B of
rows) rather than stalling on per-row work.

The third kind, ``salted``, runs the SAME skewed corpus through
stages/saltconcat.build_pipeline_salted — the head-boundary salting
escalation — with the two detection passes included in the timed wall
(that is the price a user actually pays). Compare sec_salted against
sec_skewed to read the net effect at a given hot_frac; the salted
path's real justification is the conversation that does NOT fit one
worker at all, which no single-node wall can show.

    python tools/skew_bench.py               # uniform vs skewed vs salted @32
    python tools/skew_bench.py --one {uniform|skewed|salted} NCPU
    GRAFT_SKEW_HOT=0.5 python tools/skew_bench.py   # harsher skew
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

N_TURNS = int(os.environ.get("GRAFT_SKEW_TURNS", "2000000"))
HOT_FRAC = float(os.environ.get("GRAFT_SKEW_HOT", "0.2"))


def corpus(kind: str) -> str:
    from go_fluentd_ray import synth

    if kind in ("skewed", "salted"):
        return synth.ensure_skewed_corpus(N_TURNS, hot_frac=HOT_FRAC)
    return synth.ensure_corpus(N_TURNS)


def one(kind: str, ncpu: int) -> dict:
    import ray

    ray.init(address="local", num_cpus=ncpu, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from go_fluentd_ray.pipelines import flagship

    path = corpus(kind)
    t0 = time.time()
    if kind == "salted":
        from go_fluentd_ray.stages import saltconcat

        rows = saltconcat.build_pipeline_salted(path).count()
    else:
        rows = flagship.build_pipeline(
            flagship.read_transcripts(path)).count()
    wall = time.time() - t0
    ray.shutdown()
    return {"kind": kind, "num_cpus": ncpu, "sec": round(wall, 2),
            "rows": rows, "turns_per_sec": round(N_TURNS / wall)}


def main() -> None:
    if "--one" in sys.argv:
        i = sys.argv.index("--one")
        print(json.dumps(one(sys.argv[i + 1], int(sys.argv[i + 2]))))
        return
    for kind in ("uniform", "skewed"):
        corpus(kind)  # pre-generate outside the timed runs
    results = {}
    for kind in ("uniform", "skewed", "salted"):
        best = None
        for _ in range(2):
            out = subprocess.run(
                [sys.executable, __file__, "--one", kind, "32"],
                capture_output=True, text=True, check=True).stdout
            r = json.loads(out.strip().splitlines()[-1])
            if best is None or r["sec"] < best["sec"]:
                best = r
        results[kind] = best
    print(json.dumps({
        "metric": "flagship wall: uniform vs hot-conv skew vs salted",
        "n_turns": N_TURNS, "hot_frac": HOT_FRAC,
        "sec_uniform": results["uniform"]["sec"],
        "sec_skewed": results["skewed"]["sec"],
        "sec_salted": results["salted"]["sec"],
        "rows_uniform": results["uniform"]["rows"],
        "rows_skewed": results["skewed"]["rows"],
        "rows_salted": results["salted"]["rows"],
        "skew_slowdown": round(results["skewed"]["sec"]
                               / results["uniform"]["sec"], 3),
        "salted_vs_skewed": round(results["salted"]["sec"]
                                  / results["skewed"]["sec"], 3),
    }))


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    main()
