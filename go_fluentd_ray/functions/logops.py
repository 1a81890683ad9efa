"""Log-analytics operators — the telemetry-native family the reference
pipeline's users run downstream of parse→route (go-fluentd feeds
ElasticSearch exactly for these): template mining, deterministic
throttling, and latency percentiles.

- ``log_templates``: Drain-style log-template mining, the simplest
  exact form — mask every digit run to ``<N>`` and count templates
  corpus-wide, exact top-k. Turns millions of distinct log lines into
  the handful of generating patterns.
- ``throttle_tags``: the reference Pipeline wrapper's throttle
  (SURVEY §2.2; go-fluentd drops messages over a per-second budget)
  re-expressed as a DETERMINISTIC batch operator: per (tag, time
  window) keep the earliest ``max_per_window`` turns under the total
  order (ts, conv_id, turn_idx) — same admission semantics, but
  replayable and independent of arrival order.
- ``tool_latency_pct``: exact p50/p95/p99 call→observation latency
  per tool (the SRE percentile dashboard) — quantile_disc semantics
  (element at ceil(p·n), 1-based), integer microseconds end to end so
  every value is bit-comparable with SQL.

Scale design (10^12-turn corpus): log_templates is the word_topk
pattern — per-batch value_counts partials, hash(template) % B
bucketed exact sum + local top-k, driver merges B×k rows (the
distinct-template table never materializes anywhere). throttle_tags
exchanges a SKINNY (ids, tag, ts) projection keyed hash(tag, window)
— a window is time-bounded so no (tag, window) group can grow without
bound. tool_latency_pct pairs calls inside hash(conv_id) buckets
(text never moves), then re-exchanges only (tool, lat_us) pairs keyed
hash(tool); percentiles need the per-tool latency vector whole, which
is exactly what the reference's ES percentile aggregations hold too.

Reference semantics source: throttle — internal/pipeline's
throttling wrapper (SURVEY §2.2, previously covered only by the
documented backpressure substitution in pipelines/flagship.py:116);
templates/percentiles — the ES-side analytics go-fluentd exists to
feed (docs/README.md pipeline diagram), no Go counterpart file.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

TEMPLATE_TOPK = 30
THROTTLE_MAX_PER_WINDOW = 50
THROTTLE_WINDOW_SEC = 60
LATENCY_PCTS = (50, 95, 99)


# -------------------------------------------------------------- template topk

def log_templates(ds, k: int = TEMPLATE_TOPK, col: str = "text",
                  num_buckets: int | None = None):
    """Exact top-k log templates by count; template = text with every
    digit run masked to <N>. Returns a pandas frame (template, n) —
    B×k partial rows is all the driver ever sees."""
    from .shuffle import add_bucket_col, default_buckets

    B = num_buckets or default_buckets()

    def partial(batch: pa.Table) -> pa.Table:
        tpl = pc.replace_substring_regex(
            pc.fill_null(batch[col], ""), pattern=r"\d+",
            replacement="<N>")
        g = pd.Series(tpl.to_pylist(), dtype=object).value_counts()
        return pa.table({
            "template": pa.array(g.index, type=pa.string()),
            "n": pa.array(g.to_numpy(), type=pa.int64())})

    def bucket_topk(tbl: pa.Table) -> pa.Table:
        df = tbl.to_pandas()
        g = df.groupby("template", sort=False)["n"].sum().reset_index()
        g = g.sort_values(["n", "template"], ascending=[False, True],
                          kind="mergesort").head(k)
        return pa.table({
            "template": pa.array(g["template"], type=pa.string()),
            "n": pa.array(g["n"].to_numpy(), type=pa.int64())})

    agg = ds.map_batches(partial, batch_format="pyarrow",
                         zero_copy_batch=True)
    agg = agg.map_batches(lambda t: add_bucket_col(t, ["template"], B),
                          batch_format="pyarrow")
    out = agg.groupby("__bkt").map_groups(
        bucket_topk, batch_format="pyarrow").to_pandas()  # <= B*k rows
    out = out.sort_values(["n", "template"], ascending=[False, True],
                          kind="mergesort").head(k).reset_index(drop=True)
    return out[["template", "n"]]


def log_templates_sql(path: str, k: int = TEMPLATE_TOPK) -> str:
    """DuckDB twin: RE2 digit-run mask on both sides."""
    return rf"""
WITH t AS (
  SELECT regexp_replace(coalesce(text, ''), '\d+', '<N>', 'g')
         AS template
  FROM read_parquet('{path}/*.parquet')
)
SELECT template, count(*)::BIGINT AS n
FROM t GROUP BY template
ORDER BY n DESC, template LIMIT {k}"""


# ------------------------------------------------------------------- throttle

def throttle_tags(transcripts_ds,
                  max_per_window: int = THROTTLE_MAX_PER_WINDOW,
                  window_sec: int = THROTTLE_WINDOW_SEC,
                  tag_col: str = "role",
                  num_buckets: int | None = None):
    """Deterministic throttle: per (tag, tumbling window) admit the
    earliest ``max_per_window`` turns under the total order
    (ts, conv_id, turn_idx); the rest are the reference's lossy
    overflow, here simply not emitted. Output: (conv_id, turn_idx,
    tag, window_us) for admitted turns."""
    from .shuffle import add_bucket_col, default_buckets

    B = num_buckets or default_buckets()
    win_us = window_sec * 1_000_000

    def project(batch: pa.Table) -> pa.Table:
        ts = pc.cast(pc.cast(batch["ts"], pa.timestamp("us")),
                     pa.int64())
        win = pc.multiply(pc.divide(ts, win_us), win_us)  # floor: ts>=0
        return pa.table({
            "conv_id": batch["conv_id"],
            "turn_idx": pc.cast(batch["turn_idx"], pa.int64()),
            "tag": batch[tag_col],
            "ts_us": ts,
            "window_us": win,
        })

    schema = pa.schema([
        ("conv_id", pa.string()), ("turn_idx", pa.int64()),
        ("tag", pa.string()), ("window_us", pa.int64())])

    def bucket_admit(tbl: pa.Table) -> pa.Table:
        df = (tbl.to_pandas()
              .sort_values(["tag", "window_us", "ts_us", "conv_id",
                            "turn_idx"], kind="mergesort",
                           ignore_index=True))
        if not len(df):
            return schema.empty_table()
        rank = df.groupby(["tag", "window_us"], sort=False).cumcount()
        keep = df[rank.to_numpy() < max_per_window]
        return pa.Table.from_pandas(
            keep[["conv_id", "turn_idx", "tag", "window_us"]],
            schema=schema,
            preserve_index=False).replace_schema_metadata(None)

    proj = transcripts_ds.select_columns(
        ["conv_id", "turn_idx", tag_col, "ts"]
    ).map_batches(project, batch_format="pyarrow", zero_copy_batch=True)
    proj = proj.map_batches(
        lambda t: add_bucket_col(t, ["tag", "window_us"], B),
        batch_format="pyarrow")
    return proj.groupby("__bkt").map_groups(bucket_admit,
                                            batch_format="pyarrow")


def throttle_tags_sql(path: str,
                      max_per_window: int = THROTTLE_MAX_PER_WINDOW,
                      window_sec: int = THROTTLE_WINDOW_SEC,
                      tag_col: str = "role") -> str:
    win_us = window_sec * 1_000_000
    return f"""
WITH t AS (
  SELECT conv_id, turn_idx::BIGINT AS turn_idx, {tag_col} AS tag,
         epoch_us(ts) AS ts_us,
         (epoch_us(ts) // {win_us}) * {win_us} AS window_us
  FROM read_parquet('{path}/*.parquet')
),
r AS (
  SELECT conv_id, turn_idx, tag, window_us,
         row_number() OVER (PARTITION BY tag, window_us
                            ORDER BY ts_us, conv_id, turn_idx) AS rn
  FROM t
)
SELECT conv_id, turn_idx, tag, window_us
FROM r WHERE rn <= {max_per_window}"""


# -------------------------------------------------------- latency percentiles

def tool_latency_pct(transcripts_ds, pcts=LATENCY_PCTS,
                     num_buckets: int | None = None):
    """Exact per-tool latency percentiles (quantile_disc semantics:
    sorted latencies, element at ceil(p·n), 1-based). Two exchanges:
    call→observation pairing inside hash(conv_id) buckets (the shared
    turnflow.call_latencies kernel), then the skinny (tool, lat_us)
    pairs keyed hash(tool) so each tool's latency vector is whole in
    one task. Output: (tool, n_calls, p50_us, p95_us, p99_us) — all
    int64, bit-comparable with SQL."""
    from .shuffle import add_bucket_col, default_buckets
    from .turnflow import _sorted_bucket_df, call_latencies

    B = num_buckets or default_buckets()

    def project(batch: pa.Table) -> pa.Table:
        return pa.table({
            "conv_id": batch["conv_id"],
            "turn_idx": pc.cast(batch["turn_idx"], pa.int64()),
            "role": batch["role"],
            "tool": pc.fill_null(batch["tool"], ""),
            "ts_us": pc.cast(pc.cast(batch["ts"], pa.timestamp("us")),
                             pa.int64()),
        })

    pair_schema = pa.schema([("tool", pa.string()),
                             ("lat_us", pa.int64())])

    def bucket_pairs(tbl: pa.Table) -> pa.Table:
        pairs = call_latencies(_sorted_bucket_df(tbl))
        if not len(pairs):
            return pair_schema.empty_table()
        return pa.Table.from_pandas(
            pairs, schema=pair_schema,
            preserve_index=False).replace_schema_metadata(None)

    out_fields = [("tool", pa.string()), ("n_calls", pa.int64())]
    out_fields += [(f"p{p}_us", pa.int64()) for p in pcts]
    out_schema = pa.schema(out_fields)

    def bucket_pct(tbl: pa.Table) -> pa.Table:
        df = tbl.to_pandas().sort_values(["tool", "lat_us"],
                                         kind="mergesort",
                                         ignore_index=True)
        if not len(df):
            return out_schema.empty_table()
        tools, starts = np.unique(df["tool"].to_numpy(),
                                  return_index=True)
        counts = np.diff(np.append(starts, len(df)))
        lat = df["lat_us"].to_numpy()
        cols = {"tool": tools, "n_calls": counts.astype(np.int64)}
        for p in pcts:
            pos = starts + np.ceil(p / 100.0 * counts).astype(
                np.int64) - 1
            cols[f"p{p}_us"] = lat[pos]
        return pa.Table.from_pandas(
            pd.DataFrame(cols), schema=out_schema,
            preserve_index=False).replace_schema_metadata(None)

    proj = transcripts_ds.select_columns(
        ["conv_id", "turn_idx", "role", "tool", "ts"]
    ).map_batches(project, batch_format="pyarrow", zero_copy_batch=True)
    proj = proj.map_batches(lambda t: add_bucket_col(t, ["conv_id"], B),
                            batch_format="pyarrow")
    pairs = proj.groupby("__bkt").map_groups(bucket_pairs,
                                             batch_format="pyarrow")
    pairs = pairs.map_batches(lambda t: add_bucket_col(t, ["tool"], B),
                              batch_format="pyarrow")
    return pairs.groupby("__bkt").map_groups(bucket_pct,
                                             batch_format="pyarrow")


def tool_latency_pct_sql(path: str, pcts=LATENCY_PCTS) -> str:
    """DuckDB twin: identical pairing window as tool_latency_sql;
    quantile_disc == element at ceil(p·n) (verified)."""
    qcols = ",\n       ".join(
        f"quantile_disc(lat_us, {p / 100.0})::BIGINT AS p{p}_us"
        for p in pcts)
    return f"""
WITH t AS (
  SELECT conv_id, turn_idx, role,
         coalesce(tool, '') AS tool, epoch_us(ts) AS ts_us
  FROM read_parquet('{path}/*.parquet')
),
w AS (
  SELECT conv_id, turn_idx, role, tool, ts_us,
         min(CASE WHEN role = 'tool' THEN ts_us END) OVER (
           PARTITION BY conv_id ORDER BY turn_idx
           ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nxt_us
  FROM t
),
calls AS (
  SELECT tool, nxt_us - ts_us AS lat_us FROM w
  WHERE tool <> '' AND role <> 'tool' AND nxt_us IS NOT NULL
)
SELECT tool, count(*)::BIGINT AS n_calls,
       {qcols}
FROM calls GROUP BY tool"""


# ------------------------------------------------------------- rate anomalies

ANOMALY_TRAIL_WINDOWS = 12
ANOMALY_Z = 3.0
ANOMALY_WINDOW_SEC = 60


def rate_anomaly(transcripts_ds,
                 window_sec: int = ANOMALY_WINDOW_SEC,
                 trail: int = ANOMALY_TRAIL_WINDOWS,
                 z_thresh: float = ANOMALY_Z,
                 tag_col: str = "role",
                 num_buckets: int | None = None):
    """Per-tag event-rate anomaly detection (the alerting pass of a
    log pipeline): for each OBSERVED (tag, tumbling window) count,
    the z-score against the ``trail`` immediately preceding observed
    windows of the same tag. Only windows with a full trail and
    non-zero variance are emitted (the integer guard
    trail*sumsq > sum² decides, so both engines agree exactly).

    Bit-comparability: the trailing sums are INTEGER (sum, sum-of-
    squares over int64 counts), and mean/var/z are derived from them
    with one fixed float64 op order shared with the SQL twin — the
    floats are bit-identical, not approximately equal.

    Scale design: stage 1 moves per-batch (tag, window, n) count
    partials — skinny; stage 2 buckets by hash(tag) so a tag's
    ordered window series is whole in one task (tag cardinality is
    the routing-tag set, small by construction; windows are rolled
    with one cython pandas pass per bucket).
    """
    from .shuffle import add_bucket_col, default_buckets

    B = num_buckets or default_buckets()
    win_us = window_sec * 1_000_000

    def partial(batch: pa.Table) -> pa.Table:
        ts = pc.cast(pc.cast(batch["ts"], pa.timestamp("us")),
                     pa.int64())
        win = pc.multiply(pc.divide(ts, win_us), win_us)
        df = pd.DataFrame({"tag": batch[tag_col].to_pylist(),
                           "window_us": win.to_pylist()})
        g = (df.groupby(["tag", "window_us"], sort=False)
             .size().reset_index(name="n"))
        return pa.table({
            "tag": pa.array(g["tag"], type=pa.string()),
            "window_us": pa.array(g["window_us"].to_numpy(),
                                  type=pa.int64()),
            "n": pa.array(g["n"].to_numpy(), type=pa.int64())})

    schema = pa.schema([
        ("tag", pa.string()), ("window_us", pa.int64()),
        ("n", pa.int64()), ("mean_prev", pa.float64()),
        ("z", pa.float64()), ("is_anomaly", pa.bool_())])

    def bucket_score(tbl: pa.Table) -> pa.Table:
        df = tbl.to_pandas()
        if not len(df):
            return schema.empty_table()
        df = (df.groupby(["tag", "window_us"], sort=False)["n"].sum()
              .reset_index()
              .sort_values(["tag", "window_us"], kind="mergesort",
                           ignore_index=True))
        g = df.groupby("tag", sort=False)["n"]
        s1 = g.transform(
            lambda s: s.rolling(trail).sum().shift(1))
        s2 = g.transform(
            lambda s: (s * s).rolling(trail).sum().shift(1))
        full = s1.notna().to_numpy()
        # integer variance guard: trail*sumsq > sum^2 exactly
        s1i = s1.fillna(0).to_numpy(dtype=np.int64)
        s2i = s2.fillna(0).to_numpy(dtype=np.int64)
        ok = full & (trail * s2i > s1i * s1i)
        d = df[ok]
        s1f = s1i[ok].astype(np.float64)
        s2f = s2i[ok].astype(np.float64)
        nf = d["n"].to_numpy(dtype=np.float64)
        mean = s1f / float(trail)
        var = (s2f - s1f * s1f / float(trail)) / float(trail - 1)
        z = (nf - s1f / float(trail)) / np.sqrt(var)
        out = pd.DataFrame({
            "tag": d["tag"].to_numpy(),
            "window_us": d["window_us"].to_numpy(),
            "n": d["n"].to_numpy(),
            "mean_prev": mean, "z": z,
            "is_anomaly": np.abs(z) >= z_thresh})
        return pa.Table.from_pandas(
            out, schema=schema,
            preserve_index=False).replace_schema_metadata(None)

    proj = transcripts_ds.select_columns(
        [tag_col, "ts"]
    ).map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    proj = proj.map_batches(lambda t: add_bucket_col(t, ["tag"], B),
                            batch_format="pyarrow")
    return proj.groupby("__bkt").map_groups(bucket_score,
                                            batch_format="pyarrow")


def rate_anomaly_sql(path: str,
                     window_sec: int = ANOMALY_WINDOW_SEC,
                     trail: int = ANOMALY_TRAIL_WINDOWS,
                     z_thresh: float = ANOMALY_Z,
                     tag_col: str = "role") -> str:
    """DuckDB twin: identical integer trailing sums and the identical
    float64 op order, so mean/z are bit-identical."""
    win_us = window_sec * 1_000_000
    t = float(trail)
    return f"""
WITH w AS (
  SELECT {tag_col} AS tag,
         (epoch_us(ts) // {win_us}) * {win_us} AS window_us,
         count(*)::BIGINT AS n
  FROM read_parquet('{path}/*.parquet')
  GROUP BY tag, window_us
),
s AS (
  SELECT tag, window_us, n,
         sum(n) OVER tw AS s1, sum(n * n) OVER tw AS s2,
         count(n) OVER tw AS cnt
  FROM w WINDOW tw AS (
    PARTITION BY tag ORDER BY window_us
    ROWS BETWEEN {trail} PRECEDING AND 1 PRECEDING)
)
SELECT tag, window_us, n,
       s1::DOUBLE / {t} AS mean_prev,
       (n::DOUBLE - s1::DOUBLE / {t})
         / sqrt((s2::DOUBLE - s1::DOUBLE * s1::DOUBLE / {t})
                / {t - 1.0}) AS z,
       abs((n::DOUBLE - s1::DOUBLE / {t})
           / sqrt((s2::DOUBLE - s1::DOUBLE * s1::DOUBLE / {t})
                  / {t - 1.0})) >= {z_thresh} AS is_anomaly
FROM s
WHERE cnt = {trail} AND {trail} * s2 > s1 * s1"""


# ------------------------------------------------------------ tool error rates

TOOL_ERROR_RE = r"(?i)\b(error|failed|exception|timeout)\b"


def tool_errors(transcripts_ds, pattern: str = TOOL_ERROR_RE):
    """Per-tool error rate over observation turns (role == 'tool',
    tool != ''): n_obs, n_err (text matches the RE2 error pattern),
    err_rate = n_err::double / n_obs (one division order, shared with
    SQL). Pure map-side count partials + one tiny final groupby —
    nothing but (tool, 2 ints) ever moves."""

    def partial(batch: pa.Table) -> pa.Table:
        obs = batch.filter(
            pc.and_(pc.equal(batch["role"], "tool"),
                    pc.not_equal(pc.fill_null(batch["tool"], ""), "")))
        if not obs.num_rows:
            return pa.schema([("tool", pa.string()),
                              ("n_obs", pa.int64()),
                              ("n_err", pa.int64())]).empty_table()
        err = pc.cast(pc.match_substring_regex(
            pc.fill_null(obs["text"], ""), pattern), pa.int64())
        g = (pd.DataFrame({"tool": obs["tool"].to_pylist(),
                           "err": err.to_pylist()})
             .groupby("tool", sort=False)["err"]
             .agg(n_obs="size", n_err="sum").reset_index())
        return pa.table({
            "tool": pa.array(g["tool"], type=pa.string()),
            "n_obs": pa.array(g["n_obs"].to_numpy(), type=pa.int64()),
            "n_err": pa.array(g["n_err"].to_numpy(), type=pa.int64())})

    out_schema = pa.schema([
        ("tool", pa.string()), ("n_obs", pa.int64()),
        ("n_err", pa.int64()), ("err_rate", pa.float64())])

    def finalize(tbl: pa.Table) -> pa.Table:
        # a corpus with zero observation turns yields empty partials
        # whose block schema may be lost entirely
        if not tbl.num_rows or "tool" not in tbl.column_names:
            return out_schema.empty_table()
        df = (tbl.to_pandas().groupby("tool", sort=False)
              .agg(n_obs=("n_obs", "sum"), n_err=("n_err", "sum"))
              .reset_index())
        rate = (df["n_err"].to_numpy(dtype=np.float64)
                / df["n_obs"].to_numpy(dtype=np.float64))
        return pa.table({
            "tool": pa.array(df["tool"], type=pa.string()),
            "n_obs": pa.array(df["n_obs"].to_numpy(), type=pa.int64()),
            "n_err": pa.array(df["n_err"].to_numpy(), type=pa.int64()),
            "err_rate": pa.array(rate, type=pa.float64())})

    agg = transcripts_ds.select_columns(
        ["role", "tool", "text"]
    ).map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    # |tools| x n_batches partial rows — one tiny final task
    return agg.repartition(1).map_batches(finalize,
                                          batch_format="pyarrow")


def tool_errors_sql(path: str, pattern: str = TOOL_ERROR_RE) -> str:
    return f"""
WITH obs AS (
  SELECT tool,
         CASE WHEN regexp_matches(coalesce(text, ''), '{pattern}')
              THEN 1 ELSE 0 END AS err
  FROM read_parquet('{path}/*.parquet')
  WHERE role = 'tool' AND tool IS NOT NULL AND tool <> ''
)
SELECT tool, count(*)::BIGINT AS n_obs, sum(err)::BIGINT AS n_err,
       sum(err)::DOUBLE / count(*)::DOUBLE AS err_rate
FROM obs GROUP BY tool"""


# ------------------------------------------------------------ repeat collapse

def collapse_repeats(transcripts_ds, num_buckets: int | None = None):
    """rsyslog's "last message repeated N times" as a batch transform
    (the stream-rewrite twin of convmine.loop_detect, which only
    FLAGS): within each conversation, collapse every run of
    consecutive identical (role, text) turns to its FIRST turn plus a
    repeat count. Output: (conv_id, turn_idx, role, text, n_repeats),
    original order preserved, non-repeated turns pass through with
    n_repeats = 1.

    One hash(conv_id) bucketed exchange; text moves because the
    OUTPUT is the collapsed stream. Run detection is the shared
    gaps-and-islands kernel (group-shift break bits + cumsum); the
    per-run first row and size come from one vectorized groupby.
    Null text collapses as '' (SQL coalesces identically).
    """
    from .shuffle import add_bucket_col, default_buckets

    B = num_buckets or default_buckets()

    def project(batch: pa.Table) -> pa.Table:
        return pa.table({
            "conv_id": batch["conv_id"],
            "turn_idx": pc.cast(batch["turn_idx"], pa.int64()),
            "role": batch["role"],
            "text": pc.fill_null(batch["text"], ""),
        })

    schema = pa.schema([
        ("conv_id", pa.string()), ("turn_idx", pa.int64()),
        ("role", pa.string()), ("text", pa.string()),
        ("n_repeats", pa.int64())])

    def bucket_collapse(tbl: pa.Table) -> pa.Table:
        df = (tbl.to_pandas()
              .sort_values(["conv_id", "turn_idx"], kind="mergesort",
                           ignore_index=True))
        if not len(df):
            return schema.empty_table()
        g = df.groupby("conv_id", sort=False)
        same = ((g["role"].shift() == df["role"])
                & (g["text"].shift() == df["text"]))
        df["__run"] = (~same).cumsum()
        out = (df.groupby("__run", sort=False)
               .agg(conv_id=("conv_id", "first"),
                    turn_idx=("turn_idx", "first"),
                    role=("role", "first"), text=("text", "first"),
                    n_repeats=("turn_idx", "size"))
               .reset_index(drop=True))
        out["turn_idx"] = out["turn_idx"].astype("int64")
        out["n_repeats"] = out["n_repeats"].astype("int64")
        return pa.Table.from_pandas(
            out, schema=schema,
            preserve_index=False).replace_schema_metadata(None)

    proj = transcripts_ds.select_columns(
        ["conv_id", "turn_idx", "role", "text"]
    ).map_batches(project, batch_format="pyarrow", zero_copy_batch=True)
    proj = proj.map_batches(lambda t: add_bucket_col(t, ["conv_id"], B),
                            batch_format="pyarrow")
    return proj.groupby("__bkt").map_groups(bucket_collapse,
                                            batch_format="pyarrow")


def collapse_repeats_sql(path: str) -> str:
    """DuckDB twin: identical run ids; the run's first row via
    arg_min(·, turn_idx)."""
    return f"""
WITH t AS (
  SELECT conv_id, turn_idx, role, coalesce(text, '') AS text
  FROM read_parquet('{path}/*.parquet')
),
m AS (
  SELECT conv_id, turn_idx, role, text,
         CASE WHEN lag(role) OVER w = role
               AND lag(text) OVER w = text THEN 0 ELSE 1 END AS brk
  FROM t WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)
),
r AS (
  SELECT conv_id, turn_idx, role, text,
         sum(brk) OVER (PARTITION BY conv_id ORDER BY turn_idx
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND CURRENT ROW) AS run_id
  FROM m
)
SELECT conv_id, min(turn_idx)::BIGINT AS turn_idx,
       arg_min(role, turn_idx) AS role,
       arg_min(text, turn_idx) AS text,
       count(*)::BIGINT AS n_repeats
FROM r GROUP BY conv_id, run_id"""


# ---------------------------------------------------------- daily role stats

def daily_role_stats(transcripts_ds):
    """The Kibana-style time-series rollup downstream of routing: per
    (UTC day, role) — turn count, distinct conversations, total and
    mean text chars (sum::double / n, one division order). Pure
    map-side partials (day × role × bucketed conv-distinct) + one tiny
    final groupby; at 10^12 turns only per-batch partial rows move.

    Distinct conversations per (day, role) ride on a per-batch
    drop_duplicates combiner + exact hash(conv)%B bucketing — the
    distinct_users two-level pattern."""
    from .shuffle import add_bucket_col, default_buckets

    B = default_buckets()

    def partial(batch: pa.Table) -> pa.Table:
        day = pc.cast(pc.floor_temporal(
            pc.cast(batch["ts"], pa.timestamp("us")), unit="day"),
            pa.date32())
        nchars = pc.fill_null(pc.cast(
            pc.utf8_length(batch["text"]), pa.int64()), 0)
        df = pd.DataFrame({"day": day.to_pylist(),
                           "role": batch["role"].to_pylist(),
                           "conv_id": batch["conv_id"].to_pylist(),
                           "n_chars": nchars.to_pylist()})
        g = (df.groupby(["day", "role"], sort=False)
             .agg(n_turns=("n_chars", "size"),
                  sum_chars=("n_chars", "sum")).reset_index())
        # distinct-conv partial: unique (day, role, conv) per batch
        u = df[["day", "role", "conv_id"]].drop_duplicates()
        g["__kind"] = 0
        u = u.assign(n_turns=0, sum_chars=0, __kind=1)
        out = pd.concat([g.assign(conv_id=""), u], ignore_index=True)
        out["n_turns"] = out["n_turns"].astype("int64")
        out["sum_chars"] = out["sum_chars"].astype("int64")
        out["__kind"] = out["__kind"].astype("int8")
        return pa.Table.from_pandas(
            out[["day", "role", "conv_id", "n_turns", "sum_chars",
                 "__kind"]],
            preserve_index=False).replace_schema_metadata(None)

    schema = pa.schema([
        ("day", pa.date32()), ("role", pa.string()),
        ("n_turns", pa.int64()), ("n_convs", pa.int64()),
        ("sum_chars", pa.int64()), ("mean_chars", pa.float64())])

    def bucket_agg(tbl: pa.Table) -> pa.Table:
        df = tbl.to_pandas()
        if not len(df):
            return pa.schema([
                ("day", pa.date32()), ("role", pa.string()),
                ("n_turns", pa.int64()), ("n_convs", pa.int64()),
                ("sum_chars", pa.int64())]).empty_table()
        counts = (df[df["__kind"] == 0]
                  .groupby(["day", "role"], sort=False)
                  .agg(n_turns=("n_turns", "sum"),
                       sum_chars=("sum_chars", "sum")).reset_index())
        convs = (df[df["__kind"] == 1]
                 .drop_duplicates(["day", "role", "conv_id"])
                 .groupby(["day", "role"], sort=False)
                 .size().reset_index(name="n_convs"))
        out = counts.merge(convs, on=["day", "role"], how="outer")
        for c in ("n_turns", "sum_chars", "n_convs"):
            out[c] = out[c].fillna(0).astype("int64")
        return pa.Table.from_pandas(
            out[["day", "role", "n_turns", "n_convs", "sum_chars"]],
            preserve_index=False).replace_schema_metadata(None)

    agg = transcripts_ds.select_columns(
        ["conv_id", "role", "text", "ts"]
    ).map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    # conv-distinct must co-locate per conversation; counts are
    # mergeable anywhere — one exchange keyed hash(conv) serves both
    agg = agg.map_batches(lambda t: add_bucket_col(t, ["conv_id"], B),
                          batch_format="pyarrow")
    partials = agg.groupby("__bkt").map_groups(bucket_agg,
                                               batch_format="pyarrow")

    def finalize(tbl: pa.Table) -> pa.Table:
        df = (tbl.to_pandas().groupby(["day", "role"], sort=False)
              .agg(n_turns=("n_turns", "sum"),
                   n_convs=("n_convs", "sum"),
                   sum_chars=("sum_chars", "sum")).reset_index())
        df["mean_chars"] = (df["sum_chars"].to_numpy(np.float64)
                            / df["n_turns"].to_numpy(np.float64))
        for c in ("n_turns", "n_convs", "sum_chars"):
            df[c] = df[c].astype("int64")
        return pa.Table.from_pandas(
            df, schema=schema,
            preserve_index=False).replace_schema_metadata(None)

    # B x days x roles partial rows — one tiny final task
    return partials.repartition(1).map_batches(finalize,
                                               batch_format="pyarrow")


def daily_role_stats_sql(path: str) -> str:
    return f"""
WITH t AS (
  SELECT CAST(date_trunc('day', ts) AS DATE) AS day, role, conv_id,
         coalesce(length(text), 0)::BIGINT AS n_chars
  FROM read_parquet('{path}/*.parquet')
)
SELECT day, role, count(*)::BIGINT AS n_turns,
       count(DISTINCT conv_id)::BIGINT AS n_convs,
       sum(n_chars)::BIGINT AS sum_chars,
       sum(n_chars)::DOUBLE / count(*)::DOUBLE AS mean_chars
FROM t GROUP BY day, role"""
