"""Pin golden output hashes for the rows-only queries (the ones with
no DuckDB oracle): regenerate tests/goldens_rows_only.json, or --check
that a fresh run still matches it.

The driver's correctness gate can't see these queries' VALUES (no SQL
twin), so a refactor that silently shifts their output would pass
every gate as long as recall/bounds hold. The golden file is the
regression anchor: md5 of the driver-normalized frame (sorted columns,
sorted rows, floats rounded to 6dp — driver_sim.normalize) at sf0.01.
tests/test_goldens.py asserts equality; regenerate DELIBERATELY with

    python tools/make_goldens.py            # rewrite the golden file
    python tools/make_goldens.py --check    # verify without writing
"""

from __future__ import annotations

import hashlib
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GOLDEN_PATH = os.path.join(REPO, "tests", "goldens_rows_only.json")
SF_DIR = "/root/testdata/sf0.01"


def golden_hash(df) -> str:
    return hashlib.md5(
        df.to_csv(index=False).encode()).hexdigest()


def rows_only_names(entrymod) -> "list[str]":
    return sorted(set(entrymod.queries()) - set(entrymod.oracle_sql()))


def compute(entrymod, names=None) -> dict:
    from driver_sim import normalize, to_pandas

    qs = entrymod.queries()
    out = {}
    for name in names or rows_only_names(entrymod):
        df = normalize(to_pandas(qs[name](SF_DIR)))
        out[name] = {"rows": int(len(df)),
                     "cols": list(df.columns),
                     "md5": golden_hash(df)}
        print(f"{name:28s} rows={len(df):6d} md5={out[name]['md5']}",
              flush=True)
    return out


def main() -> int:
    import ray

    ray.init(address="local", num_cpus=8, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    sys.path.insert(0, REPO)
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __ray_entry__ as entrymod

    got = compute(entrymod)
    ray.shutdown()
    if "--check" in sys.argv:
        with open(GOLDEN_PATH) as f:
            want = json.load(f)
        bad = [n for n in want if want[n] != got.get(n)]
        extra = [n for n in got if n not in want]
        if bad or extra:
            print(f"MISMATCH: {bad} extra={extra}")
            return 1
        print(f"all {len(want)} goldens match")
        return 0
    with open(GOLDEN_PATH, "w") as f:
        json.dump(got, f, indent=1, sort_keys=True)
    print(f"wrote {len(got)} goldens to {GOLDEN_PATH}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
