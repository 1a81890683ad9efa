"""Discard accounting — the reference's /monitor counter surface
(monitor/monitor.go:19-42; per-filter msg counters at
acceptorfilters/pipeline.go:110-118, postfilters/pipeline.go:75-82):
for every input row or concat segment, WHY it left the pipeline.

Reasons (same classification the pure-Python oracle tracks):
- input-row level: ``window`` (outside the allowed lateness window),
  ``spark_ignore`` (ignore-regex drop), ``unknown_tag`` (not in the
  accept whitelist);
- segment level (post-concat): ``regex_nonmatch``, ``must_include``,
  ``time_parse``, ``no_sink`` (parsed but tag absent from sink_map —
  the dispatcher discard, es_sender_dispatcher.go:63-67), and
  ``emitted`` (rows that reach the sinks).

Everything is per-batch partial counts (combiner) + one tiny groupby —
the monitoring query costs one counts-only acceptor pass (head-regex
scans skipped) plus one acceptor+concat pass for the segment-level
reasons; no shuffle ever moves row payloads beyond the concat bucket
exchange.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..config import PipelineConfig


def _count_rows(reasons: list[str], counts: list[int]) -> pa.Table:
    keep = [i for i, c in enumerate(counts) if c]
    return pa.table({
        "reason": pa.array([reasons[i] for i in keep], type=pa.string()),
        "n": pa.array([int(counts[i]) for i in keep], type=pa.int64()),
    })


def acceptor_classify_batch(batch: pa.Table, cfg: PipelineConfig) -> pa.Table:
    """Input-row-level discard partials (window / spark_ignore /
    unknown_tag) — delegated to acceptor_transform's own counters so
    the monitoring numbers can never drift from the filter semantics."""
    from ..stages.acceptor import acceptor_transform

    counts: dict[str, int] = {}
    acceptor_transform(batch, cfg, counts=counts, precompute_heads=False)
    items = sorted(counts.items())
    return _count_rows([k for k, _ in items], [v for _, v in items])


def parse_classify_batch(batch: pa.Table, cfg: PipelineConfig) -> pa.Table:
    """Segment-level classification (regex_nonmatch / must_include /
    time_parse / emitted), mirroring parse_batch's discard order."""
    reasons = {"regex_nonmatch": 0, "must_include": 0,
               "time_parse": 0, "no_sink": 0, "emitted": 0}

    def emit(tag: str, n: int) -> None:
        # rows that survive parsing still need a sink mapping — tags
        # absent from sink_map are discarded by the dispatcher
        # (es_sender_dispatcher.go:63-67, route_batch/oracle parity)
        reasons["emitted" if tag in cfg.sink_map else "no_sink"] += int(n)

    tags = batch["tag"]
    for tag, pcfg in cfg.parsers.items():
        sub = batch.filter(pc.equal(tags, tag))
        if sub.num_rows == 0:
            continue
        text = sub["text"]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        ex = pc.extract_regex(text, pcfg.pattern)
        if isinstance(ex, pa.ChunkedArray):
            ex = ex.combine_chunks()
        ok = pc.is_valid(ex)
        reasons["regex_nonmatch"] += sub.num_rows - pc.sum(
            pc.cast(ok, pa.int64())).as_py()
        ex = ex.filter(ok)
        if len(ex) == 0:
            continue
        if pcfg.must_include:
            v = pc.utf8_trim_whitespace(pc.struct_field(ex, pcfg.must_include))
            have = pc.and_(pc.is_valid(v), pc.not_equal(v, ""))
            have = pc.fill_null(have, False)
            reasons["must_include"] += len(ex) - pc.sum(
                pc.cast(have, pa.int64())).as_py()
            ex = ex.filter(have)
            if len(ex) == 0:
                continue
        tv = pc.utf8_trim_whitespace(pc.struct_field(ex, pcfg.time_group))
        tv = pc.if_else(pc.equal(tv, ""), pa.nulls(len(tv), pa.string()), tv)
        fixed = pc.replace_substring(tv, ",", ".")
        parsed = pd.to_datetime(fixed.to_pandas(), format=pcfg.time_format,
                                errors="coerce")
        good = int(parsed.notna().sum())
        reasons["time_parse"] += len(ex) - good
        emit(tag, good)

    # accepted tags with no parser bypass unparsed (pipeline.go:88-91)
    known = set(cfg.parsers)
    for t in pc.unique(tags).to_pylist():
        if t not in known:
            emit(t, pc.sum(pc.cast(pc.equal(tags, t),
                                   pa.int64())).as_py() or 0)
    return _count_rows(list(reasons), list(reasons.values()))


def discard_counts(raw_ds, cfg: PipelineConfig):
    """(reason, n) Dataset over the full corpus: one pass for the
    acceptor-level reasons, one acceptor+concat+classify pass for the
    segment-level reasons, partial counts all the way to a tiny final
    groupby."""
    from ray.data.aggregate import Sum

    from ..pipelines import flagship
    from ..stages.acceptor import acceptor_transform
    from ..stages.concat import add_bucket, concat_bucket

    part1 = raw_ds.map_batches(lambda t: acceptor_classify_batch(t, cfg),
                               batch_format="pyarrow", zero_copy_batch=True)
    B = flagship.default_num_buckets()
    seg = raw_ds.map_batches(lambda t: acceptor_transform(t, cfg),
                             batch_format="pyarrow", zero_copy_batch=True)
    seg = seg.map_batches(lambda t: add_bucket(t, B),
                          batch_format="pyarrow", zero_copy_batch=True)
    seg = seg.groupby("bucket").map_groups(
        lambda df: concat_bucket(df, cfg), batch_format="pandas")
    part2 = seg.map_batches(lambda t: parse_classify_batch(t, cfg),
                            batch_format="pyarrow", zero_copy_batch=True)
    return (part1.union(part2).groupby("reason")
            .aggregate(Sum("n", alias_name="n")).sort("reason"))


def stage_stats(ds) -> list[dict]:
    """Per-operator runtime metrics for an EXECUTED Dataset — the batch
    analogue of the reference's live ``/monitor`` JSON surface
    (monitor/monitor.go:23-42 exposes per-component counters at
    runtime; a batch run exposes the same visibility post-hoc).

    Walks the Dataset's stats summary (and its parent summaries, so
    every upstream stage of a multi-branch plan appears once, in
    execution order) and returns one row per operator:
    ``{"operator", "wall_sec", "cpu_sec", "udf_sec", "rows_out",
    "bytes_out", "tasks"}``. wall_sec is the SUM of per-block wall
    times (total work), not elapsed time — stages overlap under the
    streaming executor.

    Built on Ray's structured ``DatasetStatsSummary`` (the same data
    ``ds.stats()`` formats); if that private layout ever changes, the
    caller still gets the empty list rather than a crash — metrics are
    observability, never a reason to fail a 100 TB run.
    """
    def _sum(d) -> float:
        return float(d.get("sum", 0.0) or 0.0) if isinstance(d, dict) \
            else float(d or 0.0)

    rows: list[dict] = []
    seen: set[int] = set()

    def walk(summary) -> None:
        if id(summary) in seen:
            return
        seen.add(id(summary))
        for parent in getattr(summary, "parents", None) or []:
            walk(parent)
        for op in getattr(summary, "operators_stats", None) or []:
            task_rows = getattr(op, "task_rows", None)
            n_tasks = (task_rows or {}).get("count") \
                if isinstance(task_rows, dict) else None
            rows.append({
                "operator": str(getattr(op, "operator_name", "?")),
                "wall_sec": round(_sum(getattr(op, "wall_time", 0)), 4),
                "cpu_sec": round(_sum(getattr(op, "cpu_time", 0)), 4),
                "udf_sec": round(_sum(getattr(op, "udf_time", 0)), 4),
                "rows_out": int(_sum(getattr(op, "output_num_rows", 0))),
                "bytes_out": int(_sum(getattr(op, "output_size_bytes", 0))),
                "tasks": int(n_tasks) if n_tasks else None,
            })

    try:
        walk(ds._get_stats_summary())
    except Exception:
        return []
    return rows


def discard_counts_sql(path: str, cfg: PipelineConfig) -> str:
    """One classification row per discarded input row / segment, then
    GROUP BY reason — generated from the same config as the Ray side."""
    from .sql_oracle import _sq, acceptor_cte, concat_cte

    accept = ", ".join(f"'{_sq(t)}'" for t in sorted(cfg.accept_tags))
    rules = []
    for r in cfg.retag_rules:
        if r.regex == ".*":
            rules.append(f"ELSE '{_sq(r.new_tag)}'")
            break
        rules.append(f"WHEN regexp_matches(text, '{_sq(r.regex)}') "
                     f"THEN '{_sq(r.new_tag)}'")
    retag = " ".join(rules)

    branches = []
    for t, p in cfg.parsers.items():
        pat = p.pattern
        flags = "s" if pat.startswith("(?s)") else ""
        if flags:
            pat = pat[4:]
        import re as _re

        names = _re.findall(r"\(\?P<(\w+)>", pat)
        name_list = ", ".join(f"'{nm}'" for nm in names)
        pat_sq = _sq(pat)
        ex = (f"regexp_extract(text, '{pat_sq}', [{name_list}], '{flags}')"
              if flags else f"regexp_extract(text, '{pat_sq}', [{name_list}])")
        match = (f"regexp_matches(text, '{pat_sq}', '{flags}')" if flags
                 else f"regexp_matches(text, '{pat_sq}')")
        must = (f"nullif(trim(g.{p.must_include}), '') IS NULL"
                if p.must_include else "FALSE")
        fmt = _sq(p.time_format.replace("%f", "%g"))
        final = "emitted" if t in cfg.sink_map else "no_sink"
        branches.append(f"""
  SELECT CASE
           WHEN NOT {match} THEN 'regex_nonmatch'
           WHEN {must} THEN 'must_include'
           WHEN try_strptime(replace(nullif(trim(g.{p.time_group}), ''), ',', '.'),
                             '{fmt}') IS NULL THEN 'time_parse'
           ELSE '{final}'
         END AS reason
  FROM (SELECT text, {ex} AS g FROM merged WHERE tag = '{_sq(t)}') s""")
    for t in sorted(cfg.accept_tags - set(cfg.parsers)):
        final = "emitted" if t in cfg.sink_map else "no_sink"
        branches.append(
            f"  SELECT '{final}' AS reason FROM merged "
            f"WHERE tag = '{_sq(t)}'")
    seg_cls = "\n  UNION ALL\n".join(branches)

    return f"""
WITH {acceptor_cte(path, cfg)},
{concat_cte(cfg)},
retagged_all AS (
  SELECT * EXCLUDE (tag0),
         CASE WHEN tag0 = '{_sq(cfg.spring_tag)}'
              THEN CASE {retag} END
              ELSE tag0 END AS tag
  FROM nospark
),
cls AS (
  SELECT 'window' AS reason FROM read_parquet('{path}')
  WHERE ts NOT BETWEEN TIMESTAMP '{cfg.window_min_ts.replace("T", " ")}'
                   AND TIMESTAMP '{cfg.window_max_ts.replace("T", " ")}'
  UNION ALL
  SELECT 'spark_ignore' FROM tagged
  WHERE tag0 = '{_sq(cfg.spark_tag)}'
    AND regexp_matches(text, '{_sq(cfg.spark_ignore_regex)}')
  UNION ALL
  SELECT 'unknown_tag' FROM retagged_all
  WHERE coalesce(tag, '') NOT IN ({accept})
  UNION ALL
{seg_cls}
)
SELECT reason, count(*)::BIGINT AS n FROM cls GROUP BY reason
"""
