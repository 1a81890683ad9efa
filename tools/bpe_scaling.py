"""Scaling evidence for distributed BPE training: the same job at two
parallelism levels (fresh processes) over a synthetic documents corpus
(the dedup_scaling generator), reporting throughput at both plus
efficiency. The scaling signal lives in the CORPUS pass (the
distinct-word count shuffle); the merge iterations run over the
word-frequency table, whose size is bounded by vocabulary — not corpus
— so their cost is a fixed floor that amortizes as n grows (the same
shape as the ANN fit floor).

    python tools/bpe_scaling.py            # orchestrates 8 vs 32
    python tools/bpe_scaling.py --one N    # single timed run, N cpus
    python tools/bpe_scaling.py --iterdemo # recount vs delta engine
                                           # per-iteration cost curve

GRAFT_BPE_ENGINE=delta switches --one/default runs to the
O(matches)/iteration bpedelta engine.

--iterdemo is the production-vocab evidence: the transcript corpus's
vocabulary is bounded (~18k distinct words at any n_docs), so the
merge-loop cost question only shows up on a corpus whose DISTINCT-WORD
table grows. The demo generates synthetic doc sets whose word tables
grow 4x per step, runs both engines at a fixed merge count, and runs
the delta engine for 2000+ merges at the largest size — recount
per-iteration cost grows with total symbols (it rescans the stream
every merge), delta per-iteration cost tracks only the chosen pair's
match count.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

N_DOCS = int(os.environ.get("GRAFT_BPE_DOCS", "1000000"))
N_MERGES = int(os.environ.get("GRAFT_BPE_MERGES", "120"))
ENGINE = os.environ.get("GRAFT_BPE_ENGINE", "recount")


def ensure_wordtable_docs(n_words: int) -> str:
    """Synthetic docs whose DISTINCT-WORD table has ~n_words rows:
    base-26 words (shared letter structure -> real merge pressure)
    with Zipf-ish counts, written as many parquet parts. Deterministic
    and cached."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from go_fluentd_ray import synth

    out = os.path.join(synth.CACHE_ROOT, f"bpewords-v1-{n_words}")
    meta = out + ".meta.json"
    if os.path.exists(meta) and os.path.isdir(out):
        return out
    import tempfile

    os.makedirs(synth.CACHE_ROOT, exist_ok=True)
    tmp = tempfile.mkdtemp(dir=synth.CACHE_ROOT,
                           prefix=f".bpewords-{n_words}-")
    rng = np.random.default_rng(0xB9E)

    def b26(i: int) -> str:
        s = ""
        i += 26 ** 3            # at least 4 letters
        while i:
            s += chr(ord("a") + i % 26)
            i //= 26
        return s

    doc_id = 0
    part = 0
    per_part = 200_000          # tokens per parquet part
    wid = 0
    while wid < n_words:
        texts, cur = [], []
        tok = 0
        while wid < n_words and tok < per_part:
            c = min(1 + int(rng.zipf(1.6)), 50)   # word count >= 2 for
            cur.extend([b26(wid)] * (c + 1))      # most, so merges last
            tok += c + 1
            wid += 1
            if len(cur) >= 50:
                texts.append(" ".join(cur))
                cur = []
        if cur:
            texts.append(" ".join(cur))
        ids = pa.array(range(doc_id, doc_id + len(texts)),
                       type=pa.int64())
        pq.write_table(pa.table({"doc_id": ids,
                                 "text": pa.array(texts, pa.string())}),
                       os.path.join(tmp, f"part-{part:05d}.parquet"))
        doc_id += len(texts)
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
            json.dump({"n_words": n_words, "n_docs": doc_id}, f)
    return out


def iterdemo() -> None:
    import ray
    import ray.data as rd

    ray.init(address="local", num_cpus=32, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from go_fluentd_ray.functions import bpedelta, bpetrain

    sizes = [int(s) for s in os.environ.get(
        "GRAFT_BPE_ITER_SIZES", "100000,400000,1600000").split(",")]
    k = int(os.environ.get("GRAFT_BPE_ITER_MERGES", "120"))
    rows = []
    for n_words in sizes:
        path = ensure_wordtable_docs(n_words)
        res = {"n_words": n_words}
        for name, fn in (("recount", bpetrain.bpe_train),
                         ("delta", bpedelta.bpe_train_delta)):
            t = {}
            out = fn(rd.read_parquet(path, columns=["text"]),
                     n_merges=k, timings=t)
            res[f"{name}_merges"] = len(out)
            res[f"{name}_iter_ms"] = round(
                1000 * t["merge_loop_sec"] / max(len(out), 1), 2)
            if "state_build_sec" in t:
                res["delta_build_sec"] = t["state_build_sec"]
            res["word_rows"] = t["word_rows"]
        rows.append(res)
        print(json.dumps(res), flush=True)
    # the production-vocab leg: 2000+ merges at the largest table,
    # delta engine only (recount at this depth is the problem case)
    big = int(os.environ.get("GRAFT_BPE_BIG_MERGES", "2000"))
    t = {}
    out = bpedelta.bpe_train_delta(
        rd.read_parquet(ensure_wordtable_docs(sizes[-1]),
                        columns=["text"]), n_merges=big, timings=t)
    print(json.dumps({
        "metric": "bpe delta-engine production-vocab leg",
        "n_words": sizes[-1], "n_merges": len(out),
        "state_build_sec": t.get("state_build_sec"),
        "merge_loop_sec": t["merge_loop_sec"],
        "iter_ms": round(1000 * t["merge_loop_sec"]
                         / max(len(out), 1), 2),
        "sizes": rows}))
    ray.shutdown()


def one(ncpu: int) -> dict:
    import ray

    ray.init(address="local", num_cpus=ncpu, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import ray.data as rd

    from dedup_scaling import ensure_docs
    from go_fluentd_ray.functions import bpedelta, bpetrain

    train = bpedelta.bpe_train_delta if ENGINE == "delta" \
        else bpetrain.bpe_train
    path = ensure_docs(N_DOCS)
    ds = rd.read_parquet(path, columns=["text"])
    t0 = time.time()
    timings: dict = {}
    merges = train(ds, n_merges=N_MERGES, timings=timings)
    wall = time.time() - t0
    ray.shutdown()
    return {"num_cpus": ncpu, "sec": round(wall, 2),
            "n_merges": len(merges), "engine": ENGINE,
            "docs_per_sec": round(N_DOCS / wall, 1), **timings}


def main() -> None:
    if "--iterdemo" in sys.argv:
        iterdemo()
        return
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
    wc_eff = (results[8].get("word_count_sec", 0)
              / max(results[32].get("word_count_sec", 1), 1e-9)) / 4
    print(json.dumps({
        "metric": "bpe_train scaling 8->32 cpus",
        "n_docs": N_DOCS, "n_merges": results[32]["n_merges"],
        "sec_8cpu": results[8]["sec"], "sec_32cpu": results[32]["sec"],
        "scaling_efficiency": round(eff, 3),
        "word_count_sec_8cpu": results[8].get("word_count_sec"),
        "word_count_sec_32cpu": results[32].get("word_count_sec"),
        "word_count_scaling_efficiency": round(wc_eff, 3),
        "merge_loop_sec_32cpu": results[32].get("merge_loop_sec"),
        "word_rows": results[32].get("word_rows"),
    }))


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    main()
