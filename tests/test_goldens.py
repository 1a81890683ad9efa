"""Golden-output anchors for the rows-only queries.

These queries have no DuckDB oracle, so the driver's correctness gate
checks only their row counts; each is quality-gated (recall floors,
sketch bounds, round-trip equalities) but a refactor could still shift
their VALUES silently. The checked-in goldens (tests/
goldens_rows_only.json, written by tools/make_goldens.py at sf0.01)
pin the exact normalized output. A legitimate behavior change must
regenerate them deliberately:

    python tools/make_goldens.py
"""

import json
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF01 = "/root/testdata/sf0.01"

with open(os.path.join(REPO, "tests", "goldens_rows_only.json")) as f:
    GOLDENS = json.load(f)


def _tools():
    sys.path.insert(0, os.path.join(REPO, "tools"))
    sys.path.insert(0, REPO)
    import driver_sim
    import make_goldens
    return driver_sim, make_goldens


def test_golden_file_covers_every_rows_only_query():
    """A NEW rows-only query must get a golden (or an oracle)."""
    _tools()
    import __ray_entry__ as e

    rows_only = set(e.queries()) - set(e.oracle_sql())
    assert rows_only == set(GOLDENS), (
        sorted(rows_only - set(GOLDENS)),
        sorted(set(GOLDENS) - rows_only))


@pytest.mark.parametrize("name", sorted(GOLDENS))
def test_golden(name):
    driver_sim, make_goldens = _tools()
    import __ray_entry__ as e

    df = driver_sim.normalize(driver_sim.to_pandas(
        e.queries()[name](SF01)))
    want = GOLDENS[name]
    assert len(df) == want["rows"], (len(df), want["rows"])
    assert list(df.columns) == want["cols"]
    assert make_goldens.golden_hash(df) == want["md5"], (
        f"{name}: output drifted from the pinned golden - if the "
        "change is intended, regenerate with tools/make_goldens.py")
