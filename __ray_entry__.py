"""Driver contract for the graft builder (Ray Data target).

The driver calls ray.init() itself before importing this module: nothing
here (or in go_fluentd_ray) calls ray.init()/ray.shutdown().

Primary input per BASELINE.json input_hint: a transcripts Parquet table
(conv_id, turn_idx, role, text, tool, ts). The testdata dirs don't ship
one, so it is synthesized deterministically (seeded, cached in /tmp —
go_fluentd_ray/synth.py) at a size matching the sf of the given dir;
the oracle SQL reads the same /tmp parquet via read_parquet(path).
Queries over the provided testdata tables (documents/embeddings/events)
use the driver's pre-registered views directly.
"""

from __future__ import annotations

import os
from collections.abc import Callable
from typing import Any

SF001 = "/root/testdata/sf0.01"


def _corpus(sf_dir: str) -> str:
    from go_fluentd_ray import synth

    return synth.ensure_corpus(synth.turns_for_sf_dir(sf_dir))


def entry() -> Any:
    """Flagship pipeline over sf0.001 (smoke check)."""
    import ray.data as rd

    from go_fluentd_ray.pipelines import flagship

    ds = flagship.read_transcripts(_corpus("/root/testdata/sf0.001"))
    pipe = flagship.build_pipeline(ds, num_buckets=16, finisher_concurrency=2)
    return pipe.drop_columns(["merged_turns"])


# ---------------------------------------------------------------------------


def _q_flagship(sf_dir: str):
    import ray.data as rd

    from go_fluentd_ray.pipelines import flagship

    ds = flagship.read_transcripts(_corpus(sf_dir))
    pipe = flagship.build_pipeline(ds)
    return pipe.drop_columns(["merged_turns"])


def _q_acceptor_counts(sf_dir: str):
    import ray.data as rd
    from ray.data.aggregate import Count

    from go_fluentd_ray.config import DEFAULT_CONFIG
    from go_fluentd_ray.stages.acceptor import acceptor_transform

    ds = rd.read_parquet(_corpus(sf_dir))
    ds = ds.map_batches(lambda t: acceptor_transform(t, DEFAULT_CONFIG),
                        batch_format="pyarrow", zero_copy_batch=True)
    return ds.groupby("tag").aggregate(Count(alias_name="n"))


def _q_concat_segments(sf_dir: str):
    import ray.data as rd

    from go_fluentd_ray.config import DEFAULT_CONFIG
    from go_fluentd_ray.pipelines import flagship
    from go_fluentd_ray.stages.acceptor import acceptor_transform
    from go_fluentd_ray.stages.concat import add_bucket, concat_bucket

    cfg = DEFAULT_CONFIG
    ds = rd.read_parquet(_corpus(sf_dir))
    ds = ds.map_batches(lambda t: acceptor_transform(t, cfg),
                        batch_format="pyarrow", zero_copy_batch=True)
    ds = ds.map_batches(lambda t: add_bucket(t, flagship.default_num_buckets()),
                        batch_format="pyarrow", zero_copy_batch=True)
    ds = ds.groupby("bucket").map_groups(
        lambda df: concat_bucket(df, cfg), batch_format="pandas")
    return ds.drop_columns(["merged_turns"]).select_columns(
        ["tag", "conv_id", "turn_idx", "role", "tool", "ts", "text", "n_merged"])


def _q_window_filter(sf_dir: str):
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd

    from go_fluentd_ray.config import DEFAULT_CONFIG as cfg

    lo = pa.scalar(cfg.window_min_ts).cast(pa.timestamp("us"))
    hi = pa.scalar(cfg.window_max_ts).cast(pa.timestamp("us"))
    ds = rd.read_parquet(_corpus(sf_dir), columns=["conv_id", "turn_idx",
                                                   "tool", "ts"])
    return ds.map_batches(
        lambda t: t.filter(pc.and_(pc.greater_equal(t["ts"], lo),
                                   pc.less_equal(t["ts"], hi))),
        batch_format="pyarrow", zero_copy_batch=True)


def queries() -> dict[str, Callable[[str], Any]]:
    # generate the sf0.01 corpus eagerly so oracle_sql() paths always
    # resolve regardless of which side the driver runs first
    _corpus(SF001)
    return {
        "flagship": _q_flagship,
        "acceptor_counts": _q_acceptor_counts,
        "concat_segments": _q_concat_segments,
        "window_filter": _q_window_filter,
    }


def oracle_sql() -> dict[str, str]:
    from go_fluentd_ray.pipelines import sql_oracle

    path = _corpus(SF001) + "/part-*.parquet"
    return {
        "flagship": sql_oracle.flagship_sql(path),
        "acceptor_counts": sql_oracle.acceptor_counts_sql(path),
        "concat_segments": sql_oracle.concat_segments_sql(path),
        "window_filter": sql_oracle.window_filter_sql(path),
    }
