"""sf1 dress rehearsal: run the FULL queries() battery once at sf=1
(6M transcript turns, 50k docs, 20k embeddings, 1M events, 6M
lineitem) in memory-capped fresh processes, recording wall seconds,
result rows, and peak RSS per query. The point is to catch hidden
materialization or super-linear blowup that sf0.1 numbers can't see —
the cheapest single-node stand-in for the 100 TB question.

The sf1 input tables don't ship in /root/testdata, so they are tiled
deterministically 10x from sf0.1 with key offsets (doc_id/vec_id/
event_id/custkey/orderkey shifted per copy; text/values unchanged —
exact replication is realistic for dedup workloads and keeps every
query's semantics well-defined). Transcript/http/rsyslog/kafka/fluentd
corpora scale automatically from the directory NAME (synth.
turns_for_sf_dir parses "sf1" -> 6M turns).

    python tools/sf1_rehearsal.py               # full battery
    python tools/sf1_rehearsal.py --prepare     # build inputs only
    python tools/sf1_rehearsal.py --one QUERY   # single query, timed
    python tools/sf1_rehearsal.py q1 q2 ...     # subset

Output: SF1_REHEARSAL.json at the repo root + a summary table on
stdout. Peak RSS = sum of VmHWM over the driver + every ray process
(raylet/workers) — an over-estimate where plasma shared memory is
mapped by several workers, which is the safe direction for OOM risk.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF1_DIR = os.environ.get("GRAFT_SF1_DIR", "/tmp/graft_sf1_tables/sf1")
TIMEOUT_SEC = int(os.environ.get("GRAFT_SF1_TIMEOUT", "900"))
OBJECT_STORE_GB = float(os.environ.get("GRAFT_SF1_STORE_GB", "16"))
# tiling factor: 10 copies of sf0.1 = sf1. GRAFT_SF_TILE=20 with
# GRAFT_SF1_DIR=.../sf2 + GRAFT_SF1_OUT=SF2_REHEARSAL.json gives the
# sf2 spot rehearsal (one more doubling past sf1 to confirm the
# sub-linearity trend isn't an artifact of a single tiling step)
TILE = int(os.environ.get("GRAFT_SF_TILE", "10"))
OUT_NAME = os.environ.get("GRAFT_SF1_OUT", "SF1_REHEARSAL.json")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_TILE_KEYS = {
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "events": ["event_id"],
    "customer": ["c_custkey"],
    "lineitem": ["l_orderkey"],
    # orders joins both customer and lineitem: its keys must shift by
    # the SAME steps as theirs. The fixture guarantees equal per-column
    # maxima (asserted in prepare()), so per-column max+1 steps agree.
    "orders": ["o_orderkey", "o_custkey"],
}


def prepare() -> str:
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    os.makedirs(SF1_DIR, exist_ok=True)
    # join-key domains must share one tiling step per key family
    _o = pq.read_table("/root/testdata/sf0.1/orders.parquet",
                       columns=["o_orderkey", "o_custkey"])
    _li = pq.read_table("/root/testdata/sf0.1/lineitem.parquet",
                        columns=["l_orderkey"])
    _c = pq.read_table("/root/testdata/sf0.1/customer.parquet",
                       columns=["c_custkey"])
    assert (pc.max(_o["o_orderkey"]).as_py()
            == pc.max(_li["l_orderkey"]).as_py()), "orderkey domains differ"
    assert (pc.max(_o["o_custkey"]).as_py()
            == pc.max(_c["c_custkey"]).as_py()), "custkey domains differ"
    del _o, _li, _c
    for table, keys in _TILE_KEYS.items():
        out = os.path.join(SF1_DIR, f"{table}.parquet")
        if os.path.exists(out):
            continue
        src = pq.read_table(f"/root/testdata/sf0.1/{table}.parquet")
        copies = []
        for k in range(TILE):
            t = src
            for key in keys:
                step = pc.max(src[key]).as_py() + 1
                t = t.set_column(
                    t.column_names.index(key), key,
                    pc.add(t[key], pa.scalar(step * k,
                                             type=t[key].type)))
            copies.append(t)
        tiled = pa.concat_tables(copies)
        tmp = out + ".tmp"
        pq.write_table(tiled, tmp, compression="snappy",
                       row_group_size=65536)
        os.rename(tmp, out)
        print(f"tiled {table}: {src.num_rows} -> {tiled.num_rows}",
              flush=True)
    # pre-generate every synth corpus the battery touches, OUTSIDE the
    # timed runs (these are cached one-time costs, not query work)
    from go_fluentd_ray import synth

    n = synth.turns_for_sf_dir(SF1_DIR)
    aux = max(500, n // 10)
    synth.ensure_corpus(n)
    synth.ensure_skewed_corpus(n, hot_frac=0.2)
    synth.ensure_multiline_docs(synth.docs_for_sf_dir(SF1_DIR))
    synth.ensure_http_corpus(aux)
    synth.ensure_rsyslog_corpus(aux)
    synth.ensure_kafka_corpus(aux)
    synth.ensure_fluentd_corpus(aux)
    return SF1_DIR


def _ray_tree_hwm_mb() -> float:
    """Sum VmHWM (peak RSS) over this process and all ray processes."""
    me = str(os.getpid())
    total_kb = 0
    for pid in os.listdir("/proc"):
        if not pid.isdigit():
            continue
        try:
            with open(f"/proc/{pid}/cmdline", "rb") as f:
                cmd = f.read().decode(errors="replace")
        except OSError:
            continue
        if not (pid == me or "ray::" in cmd or "raylet" in cmd
                or "default_worker.py" in cmd):
            continue
        try:
            with open(f"/proc/{pid}/status") as f:
                for line in f:
                    if line.startswith("VmHWM"):
                        total_kb += int(line.split()[1])
                        break
        except OSError:
            continue
    return round(total_kb / 1024, 1)


def one(query: str) -> dict:
    import ray

    ray.init(address="local",
             num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
             object_store_memory=int(OBJECT_STORE_GB * 2**30),
             include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    sys.path.insert(0, REPO)
    import __ray_entry__ as e

    fn = e.queries()[query]
    t0 = time.time()
    res = fn(SF1_DIR)
    # NB: pandas DataFrames also expose .count() (per-column Series),
    # so test for the Dataset type rather than duck-typing on "count".
    if isinstance(res, ray.data.Dataset):
        rows = res.count()
    elif hasattr(res, "num_rows"):     # pyarrow Table
        rows = res.num_rows
    else:                              # pandas DataFrame
        rows = len(res)
    wall = time.time() - t0
    out = {"query": query, "sec": round(wall, 2), "rows": int(rows),
           "peak_rss_mb": _ray_tree_hwm_mb()}
    ray.shutdown()
    return out


def main() -> None:
    if "--one" in sys.argv:
        print("RESULT " + json.dumps(
            one(sys.argv[sys.argv.index("--one") + 1])))
        return
    prepare()
    if "--prepare" in sys.argv:
        return
    import __ray_entry__ as e

    names = [a for a in sys.argv[1:] if not a.startswith("-")]
    out_path = os.path.join(REPO, OUT_NAME)
    results: dict[str, dict] = {}
    if names and os.path.exists(out_path):
        with open(out_path) as f:    # subset rerun: merge over prior
            results = json.load(f)
    names = names or list(e.queries())
    for q in names:
        t0 = time.time()
        try:
            p = subprocess.run(
                [sys.executable, __file__, "--one", q],
                capture_output=True, text=True, timeout=TIMEOUT_SEC)
            line = next(ln for ln in p.stdout.splitlines()[::-1]
                        if ln.startswith("RESULT "))
            results[q] = json.loads(line[len("RESULT "):])
        except subprocess.TimeoutExpired:
            results[q] = {"query": q, "err": f"timeout>{TIMEOUT_SEC}s"}
        except Exception:
            tail = (p.stderr or "").strip().splitlines()[-3:] \
                if "p" in dir() else []
            results[q] = {"query": q, "err": "failed",
                          "stderr_tail": tail}
        r = results[q]
        print(f"{q:34s} {r.get('sec', '-'):>8} s "
              f"rows={r.get('rows', '-'):>9} "
              f"rss={r.get('peak_rss_mb', '-'):>9} MB "
              f"{r.get('err', '')}", flush=True)
        _ = time.time() - t0
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    bad = [q for q, r in results.items() if "err" in r]
    print(f"\n{len(results) - len(bad)}/{len(results)} ok; "
          f"failures: {bad or 'none'}")


if __name__ == "__main__":
    sys.path.insert(0, REPO)
    main()
