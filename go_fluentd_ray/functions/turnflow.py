"""Consecutive-turn (turn-flow) operators over the transcript corpus —
the window-function family the Dataset API lacks, expressed with the
repo's standard bucketed-exchange pattern (hash(conv_id) % B, the
flagship partitioning key reused, ONE vectorized pandas pass per
bucket — never per-key map_groups, never per-row Python).

Three operators, each a real step in an agent-trace curation pipeline:

- ``tool_latency``: per tool, latency from a tool-CALL turn
  (tool != '' and role != 'tool') to the earliest FOLLOWING
  observation turn (role == 'tool') in the same conversation —
  the request→result pairing a trace analyzer runs first.
- ``role_transitions``: corpus-wide counts of consecutive
  (from_role → to_role) turn pairs — the dialogue-structure Markov
  table.
- ``context_truncate``: per conversation keep the maximal SUFFIX of
  turns whose total \\w+ token count fits a context budget — the
  "trim history to the context window" pass of a conversation
  exporter. Keeps the most recent turns, drops the oldest.

Scale design (10^12-turn corpus): every operator moves only a SKINNY
per-turn projection (ids, role/tool enums, int64 ts/token counts —
text NEVER enters the exchange; context_truncate re-emits only kept
(conv_id, turn_idx) keys plus counts). Latency/transition aggregates
emit per-bucket partials in integer microseconds / counts; the final
groupby moves B × |tools| rows. All per-bucket kernels are cython
pandas (groupby shift / bfill-style cummin / cumsum) — zero Python
per row.

Reference semantics source: the reference has no windowed turn
operators (its concatenator, recvs/fluentd.go:399-544, is the only
cross-row state) — these generalize its per-tag counters to ordered
per-conversation analysis, with DuckDB window-function twins.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .text import TOKEN_RE

CONTEXT_BUDGET_TOKENS = 160


def _sorted_bucket_df(tbl: pa.Table) -> pd.DataFrame:
    df = tbl.to_pandas()
    return df.sort_values(["conv_id", "turn_idx"], kind="mergesort",
                          ignore_index=True)


def _from_pandas(df: pd.DataFrame,
                 schema: pa.Schema | None = None) -> pa.Table:
    # explicit schema: an empty bucket's object columns would otherwise
    # infer pa.null() and break the block union
    return pa.Table.from_pandas(
        df, schema=schema,
        preserve_index=False).replace_schema_metadata(None)


# ---------------------------------------------------------------- tool latency

def call_latencies(df: pd.DataFrame) -> pd.DataFrame:
    """Per-call latency pairing shared by tool_latency and
    logops.tool_latency_pct: for each call turn (tool != '' and
    role != 'tool'), the microseconds to the earliest FOLLOWING
    observation turn (role == 'tool') in the same conversation.
    Input: a (conv_id, turn_idx)-sorted bucket frame with columns
    conv_id, role, tool, ts_us. Output: (tool, lat_us)."""
    # non-result rows get +inf so the reversed cummin CARRIES the
    # min across them (pandas cummin leaves NaN at NaN inputs);
    # float64 up front or groupby-cummin warns trying to cast inf
    # back to the int64 input dtype
    res_ts = (df["ts_us"].astype(np.float64)
              .where(df["role"].to_numpy() == "tool", np.inf))
    # min following-result ts: reversed cummin within conversation
    # (cython), then a strict shift(-1) to exclude the row itself
    rev_min = (res_ts.iloc[::-1]
               .groupby(df["conv_id"].iloc[::-1], sort=False)
               .cummin().iloc[::-1]
               .replace(np.inf, np.nan))
    nxt = rev_min.groupby(df["conv_id"], sort=False).shift(-1)
    keep = ((df["tool"].to_numpy() != "")
            & (df["role"].to_numpy() != "tool")
            & nxt.notna().to_numpy())
    lat = (nxt[keep].to_numpy(dtype=np.int64)
           - df["ts_us"][keep].to_numpy(dtype=np.int64))
    return pd.DataFrame({"tool": df["tool"][keep].to_numpy(),
                         "lat_us": lat})


def tool_latency(transcripts_ds, num_buckets: int | None = None):
    """Per tool: n_calls, mean/max seconds from a call turn to the
    earliest following observation turn (role == 'tool', min ts over
    turn_idx > call's) in the same conversation. Calls with no
    following observation are excluded.

    Mean is computed as sum_us::double / n / 1e6 in BOTH engines (one
    integer sum, one division order) so the float is bit-comparable.
    """
    from .shuffle import add_bucket_col, default_buckets

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

    def bucket_partial(tbl: pa.Table) -> pa.Table:
        pairs = call_latencies(_sorted_bucket_df(tbl))
        schema = pa.schema([
            ("tool", pa.string()), ("n_calls", pa.int64()),
            ("sum_us", pa.int64()), ("max_us", pa.int64())])
        if not len(pairs):
            return schema.empty_table()
        out = (pairs
               .groupby("tool", sort=False)["lat_us"]
               .agg(n_calls="size", sum_us="sum", max_us="max")
               .reset_index())
        out["n_calls"] = out["n_calls"].astype("int64")
        return _from_pandas(out, schema)

    proj = transcripts_ds.select_columns(
        ["conv_id", "turn_idx", "role", "tool", "ts"]
    ).map_batches(project, batch_format="pyarrow", zero_copy_batch=True)
    proj = proj.map_batches(lambda t: add_bucket_col(t, ["conv_id"], B),
                            batch_format="pyarrow")
    partials = proj.groupby("__bkt").map_groups(bucket_partial,
                                                batch_format="pyarrow")

    def finalize(tbl: pa.Table) -> pa.Table:
        # B x |tools| rows total — one tiny task
        g = (tbl.to_pandas().groupby("tool", sort=False)
             .agg(n_calls=("n_calls", "sum"), sum_us=("sum_us", "sum"),
                  max_us=("max_us", "max")).reset_index())
        g["mean_latency_sec"] = (g["sum_us"].to_numpy(dtype=np.float64)
                                 / g["n_calls"].to_numpy(dtype=np.float64)
                                 / 1e6)
        g["max_latency_sec"] = g["max_us"].to_numpy(np.float64) / 1e6
        return _from_pandas(
            g[["tool", "n_calls", "mean_latency_sec", "max_latency_sec"]])

    return partials.repartition(1).map_batches(
        finalize, batch_format="pyarrow")


def tool_latency_sql(path: str) -> str:
    """DuckDB twin: identical earliest-following-observation window
    (min over a FOLLOWING frame) and identical division order."""
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
       sum(lat_us)::DOUBLE / count(*)::DOUBLE / 1e6 AS mean_latency_sec,
       max(lat_us)::DOUBLE / 1e6 AS max_latency_sec
FROM calls GROUP BY tool"""


# ------------------------------------------------------------ role transitions

def role_transitions(transcripts_ds, num_buckets: int | None = None):
    """Corpus-wide counts of consecutive (from_role, to_role) turn
    pairs within conversations (ordered by turn_idx)."""
    from .shuffle import add_bucket_col, default_buckets

    B = num_buckets or default_buckets()

    def project(batch: pa.Table) -> pa.Table:
        return pa.table({
            "conv_id": batch["conv_id"],
            "turn_idx": pc.cast(batch["turn_idx"], pa.int64()),
            "role": batch["role"],
        })

    def bucket_partial(tbl: pa.Table) -> pa.Table:
        df = _sorted_bucket_df(tbl)
        prev = df.groupby("conv_id", sort=False)["role"].shift(1)
        pairs = pd.DataFrame({"from_role": prev,
                              "to_role": df["role"]}).dropna()
        out = (pairs.groupby(["from_role", "to_role"], sort=False)
               .size().reset_index(name="n"))
        out["n"] = out["n"].astype("int64")
        return _from_pandas(out, pa.schema([
            ("from_role", pa.string()), ("to_role", pa.string()),
            ("n", pa.int64())]))

    proj = transcripts_ds.select_columns(
        ["conv_id", "turn_idx", "role"]
    ).map_batches(project, batch_format="pyarrow", zero_copy_batch=True)
    proj = proj.map_batches(lambda t: add_bucket_col(t, ["conv_id"], B),
                            batch_format="pyarrow")
    partials = proj.groupby("__bkt").map_groups(bucket_partial,
                                                batch_format="pyarrow")

    def finalize(tbl: pa.Table) -> pa.Table:
        g = (tbl.to_pandas()
             .groupby(["from_role", "to_role"], sort=False)["n"]
             .sum().reset_index())
        g["n"] = g["n"].astype("int64")
        return _from_pandas(g)

    # B x |roles|^2 partial rows — one tiny final task
    return partials.repartition(1).map_batches(
        finalize, batch_format="pyarrow")


def role_transitions_sql(path: str) -> str:
    return f"""
WITH t AS (
  SELECT conv_id, turn_idx, role,
         lag(role) OVER (PARTITION BY conv_id ORDER BY turn_idx)
           AS from_role
  FROM read_parquet('{path}/*.parquet')
)
SELECT from_role, role AS to_role, count(*)::BIGINT AS n
FROM t WHERE from_role IS NOT NULL
GROUP BY from_role, role"""


# ---------------------------------------------------------- context truncation

def context_truncate(transcripts_ds,
                     budget_tokens: int = CONTEXT_BUDGET_TOKENS,
                     num_buckets: int | None = None):
    """Context-window trim: per conversation keep the maximal suffix of
    turns whose total \\w+ token count is <= budget_tokens (most
    recent turns win; a single over-budget final turn yields an empty
    conversation — the exporter's drop case). Output: (conv_id,
    turn_idx, n_tokens) for kept turns.

    Only (conv_id, turn_idx, n_tokens) crosses the exchange; the
    caller re-attaches text by (conv_id, turn_idx) key if needed
    (bucketed_attach pattern) — at 10^12 turns the trim decision must
    never ship text.
    """
    from .shuffle import add_bucket_col, default_buckets

    B = num_buckets or default_buckets()

    def project(batch: pa.Table) -> pa.Table:
        return pa.table({
            "conv_id": batch["conv_id"],
            "turn_idx": pc.cast(batch["turn_idx"], pa.int64()),
            "n_tokens": pc.fill_null(pc.cast(
                pc.count_substring_regex(batch["text"], TOKEN_RE),
                pa.int64()), 0),
        })

    def bucket_keep(tbl: pa.Table) -> pa.Table:
        df = _sorted_bucket_df(tbl)
        # suffix token totals: reversed cumsum within conversation
        rev_cum = (df["n_tokens"].iloc[::-1]
                   .groupby(df["conv_id"].iloc[::-1], sort=False)
                   .cumsum().iloc[::-1])
        keep = df[rev_cum.to_numpy() <= budget_tokens]
        return _from_pandas(
            keep[["conv_id", "turn_idx", "n_tokens"]],
            pa.schema([("conv_id", pa.string()),
                       ("turn_idx", pa.int64()),
                       ("n_tokens", pa.int64())]))

    proj = transcripts_ds.select_columns(
        ["conv_id", "turn_idx", "text"]
    ).map_batches(project, batch_format="pyarrow", zero_copy_batch=True)
    proj = proj.map_batches(lambda t: add_bucket_col(t, ["conv_id"], B),
                            batch_format="pyarrow")
    return proj.groupby("__bkt").map_groups(bucket_keep,
                                            batch_format="pyarrow")


def context_truncate_sql(path: str,
                         budget_tokens: int = CONTEXT_BUDGET_TOKENS) -> str:
    """DuckDB twin: identical \\w+ token count and reverse-cumulative
    window."""
    return rf"""
WITH t AS (
  SELECT conv_id, turn_idx::BIGINT AS turn_idx,
         length(regexp_extract_all(coalesce(text, ''),
                                   '\w+'))::BIGINT AS n_tokens
  FROM read_parquet('{path}/*.parquet')
),
w AS (
  SELECT conv_id, turn_idx, n_tokens,
         sum(n_tokens) OVER (
           PARTITION BY conv_id ORDER BY turn_idx DESC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS suffix_sum
  FROM t
)
SELECT conv_id, turn_idx, n_tokens
FROM w WHERE suffix_sum <= {budget_tokens}"""
