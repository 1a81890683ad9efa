"""Simulate the driver's correctness gate locally: run every queries()
entry and its oracle_sql() twin at sf0.01, compare row-count, sorted
column names, and order-insensitive value hash. Usage:

    python tools/driver_sim.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

import duckdb
import pandas as pd

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].isna().all():
            # an all-null column's dtype is representation noise
            # (object None vs float NaN) — unify
            df[c] = pd.Series([None] * len(df), dtype=object).astype(str)
        elif df[c].dtype == object or str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith("float"):
            df[c] = df[c].round(6)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def main() -> int:
    import ray

    ray.init(address="local", num_cpus=8, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entrymod

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf_dir}/{t}.parquet')")

    qs, sqls = entrymod.queries(), entrymod.oracle_sql()
    fails = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        got = normalize(to_pandas(fn(sf_dir)))
        if name not in sqls:
            print(f"{name:24s} rows={len(got)} (rows-only, no oracle)")
            continue
        want = normalize(con.sql(sqls[name]).df())
        ok_rows = len(got) == len(want)
        ok_cols = list(got.columns) == list(want.columns)
        ok_vals = False
        if ok_rows and ok_cols:
            ok_vals = got.equals(want)
            if not ok_vals:
                # find first differing cell for diagnosis
                for c in got.columns:
                    neq = got[c].astype(str) != want[c].astype(str)
                    if neq.any():
                        i = neq.idxmax()
                        print(f"  DIFF {name}.{c} row{i}: "
                              f"ray={got[c][i]!r} sql={want[c][i]!r}")
                        break
        status = "OK" if (ok_rows and ok_cols and ok_vals) else "FAIL"
        if status == "FAIL":
            fails += 1
            if not ok_cols:
                print(f"  cols ray={list(got.columns)}")
                print(f"  cols sql={list(want.columns)}")
        print(f"{name:24s} {status} rows ray={len(got)} sql={len(want)}")
    ray.shutdown()
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
