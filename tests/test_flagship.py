"""End-to-end parity: Ray Data flagship pipeline vs the pure-Python
oracle on the deterministic synthetic corpus (FIXTURES.md F4 gates:
per-sink counts, per-(tool,role,sink) counts, full per-turn text
equality under stable (conv_id, turn_idx) ordering)."""

import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest
import ray.data as rd

from go_fluentd_ray import oracle, synth
from go_fluentd_ray.pipelines import flagship

N = 20_000


@pytest.fixture(scope="module")
def corpus_path():
    return synth.ensure_corpus(N)


@pytest.fixture(scope="module")
def expected(corpus_path):
    return oracle.run_oracle(pq.read_table(corpus_path))


@pytest.fixture(scope="module")
def ray_result(corpus_path):
    ds = rd.read_parquet(corpus_path)
    pipe = flagship.build_pipeline(ds, num_buckets=16,
                                   finisher_concurrency=2)
    return flagship.result_table_sorted(pipe)


def test_full_table_equality(ray_result, expected):
    exp, _ = expected
    assert ray_result.num_rows == exp.num_rows
    assert ray_result.equals(exp), "pipeline output != oracle output"


def test_row_accounting(ray_result, expected):
    _, disc = expected
    merged = pc.sum(ray_result["n_merged"]).as_py()
    assert merged + sum(disc.values()) == N


def test_sink_counts(ray_result, expected):
    exp, _ = expected
    got = ray_result.to_pandas().groupby("sink").size()
    want = exp.to_pandas().groupby("sink").size()
    assert got.equals(want)
    assert len(got) == 6  # all sinks exercised


def test_tool_role_sink_counts(ray_result, expected):
    exp, _ = expected
    got = ray_result.to_pandas().groupby(["tool", "role", "sink"]).size()
    want = exp.to_pandas().groupby(["tool", "role", "sink"]).size()
    assert got.equals(want)


def test_discard_reasons_all_exercised(expected):
    _, disc = expected
    for reason in ("window", "spark_ignore", "unknown_tag", "regex_nonmatch"):
        assert disc[reason] > 0, f"fixture does not exercise {reason}"


def test_aggregate_via_ray(corpus_path, expected):
    """sink_counts computed distributed (groupby on the Dataset)."""
    exp, _ = expected
    ds = rd.read_parquet(corpus_path)
    pipe = flagship.build_pipeline(ds, num_buckets=16, finisher_concurrency=2)
    got = flagship.sink_counts(pipe).to_pandas()
    want = (exp.to_pandas().groupby("sink").size().rename("n").reset_index())
    assert got.sort_values("sink").reset_index(drop=True).equals(
        want.sort_values("sink").reset_index(drop=True))


def test_task_mode_finisher_matches(corpus_path, expected):
    """finisher_mode='tasks' (per-worker cache) produces identical
    output to the actor-pool mode."""
    exp, _ = expected
    ds = rd.read_parquet(corpus_path)
    pipe = flagship.build_pipeline(ds, num_buckets=16, finisher_mode="tasks")
    out = flagship.result_table_sorted(pipe)
    assert out.equals(exp)


def test_discard_counts_match_oracle():
    """The /monitor-style per-reason discard accounting must agree with
    the row-by-row oracle's counters exactly."""
    import ray.data as rd

    from go_fluentd_ray.config import DEFAULT_CONFIG
    from go_fluentd_ray.oracle import run_oracle
    from go_fluentd_ray.pipelines import monitoring
    from go_fluentd_ray.synth import transcript_table

    t = transcript_table(6000)
    out = monitoring.discard_counts(
        rd.from_arrow(t), DEFAULT_CONFIG).to_pandas()
    want_tbl, disc = run_oracle(t)
    disc["emitted"] = want_tbl.num_rows
    want = {k: int(v) for k, v in disc.items() if v}
    got = dict(zip(out["reason"], out["n"].astype(int)))
    assert got == want


def test_discard_counts_no_sink_reason():
    """A parsed tag absent from sink_map is a dispatcher discard
    (es_sender_dispatcher.go:63-67): the monitoring surface must report
    it as no_sink, in exact agreement with the oracle."""
    import dataclasses

    import ray.data as rd

    from go_fluentd_ray.config import DEFAULT_CONFIG
    from go_fluentd_ray.oracle import run_oracle
    from go_fluentd_ray.pipelines import monitoring
    from go_fluentd_ray.synth import transcript_table

    cfg = dataclasses.replace(
        DEFAULT_CONFIG,
        sink_map={k: v for k, v in DEFAULT_CONFIG.sink_map.items()
                  if k != "ai.sit"})
    t = transcript_table(6000)
    out = monitoring.discard_counts(rd.from_arrow(t), cfg).to_pandas()
    want_tbl, disc = run_oracle(t, cfg)
    disc["emitted"] = want_tbl.num_rows
    want = {k: int(v) for k, v in disc.items() if v}
    got = dict(zip(out["reason"], out["n"].astype(int)))
    assert got == want and want.get("no_sink", 0) > 0
