"""Per-conversation statistics and quality gating over the transcript
corpus — the transcript-native analogue of the per-document Gopher
suite: a dialogue/agent-trace curation pass computes these before
admitting a conversation to a training mix.

Per conv_id:
    n_turns, n_roles (distinct), frac_tool_turns (tool != ''),
    mean_turn_chars, dup_turn_frac (1 - distinct turn texts / turns —
    the assistant-loop / repeated-message smell), duration_sec
    (last ts - first ts), and conv_pass (>= 2 turns, >= 2 roles,
    dup_turn_frac <= 0.5).

Scale design (10^12-turn corpus):
- ONE bucketed exchange of a SKINNY per-turn projection: (conv_id,
  role, tool-nonempty bit, n_chars, ts_us, md5_64(text)) — the text
  itself never moves; dup detection rides on the 8-byte text hash.
- Buckets key hash(conv_id) % B so a conversation is whole in one
  task (the concat/flagship partitioning key — the same key reused
  across stages, per the one-partitioning-key rule); inside a bucket
  everything is one vectorized pandas groupby, never per-key
  map_groups.

The SQL twin reads the SAME transcript parquet (the flagship-oracle
convention) and reproduces the md5-based distinct-turn counting
exactly, so dup_turn_frac is value-comparable.

Reference semantics source: the per-tag counters the reference's
monitor surface exposes (internal/monitor.go) generalized to
per-conversation content statistics; no counterpart file exists in
the Go reference.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

CONV_MIN_TURNS = 2
CONV_MIN_ROLES = 2
CONV_MAX_DUP_TURN_FRAC = 0.5


def _md5_64(texts) -> np.ndarray:
    """First 16 md5 hex chars as uint64 — one C call per turn (the
    established md5_batch pattern). None hashes as '' (the SQL twins
    coalesce(text, '') to match)."""
    return np.fromiter(
        (int(hashlib.md5((t or "").encode()).hexdigest()[:16], 16)
         for t in texts), dtype=np.uint64, count=len(texts))


def conversation_stats(transcripts_ds, num_buckets: int | None = None):
    from .shuffle import add_bucket_col, default_buckets

    B = num_buckets or default_buckets()

    def project(batch: pa.Table) -> pa.Table:
        ts = pc.cast(pc.cast(batch["ts"], pa.timestamp("us")),
                     pa.int64())
        tool = batch["tool"]
        tool_bit = pc.cast(
            pc.and_(tool.is_valid() if isinstance(tool, pa.Array)
                    else pc.is_valid(tool),
                    pc.not_equal(pc.fill_null(tool, ""), "")),
            pa.int64())
        return pa.table({
            "conv_id": batch["conv_id"],
            "h": pa.array(_md5_64(batch["text"].to_pylist()),
                          type=pa.uint64()),
            "role": batch["role"],
            "tool_bit": tool_bit,
            "n_chars": pc.fill_null(pc.cast(
                pc.utf8_length(batch["text"]), pa.int64()), 0),
            "ts_us": ts,
        })

    def bucket_stats(tbl: pa.Table) -> pa.Table:
        df = tbl.to_pandas()
        g = df.groupby("conv_id", sort=False)
        out = g.agg(
            n_turns=("h", "size"),
            n_distinct_turns=("h", "nunique"),
            n_roles=("role", "nunique"),
            n_tool=("tool_bit", "sum"),
            sum_chars=("n_chars", "sum"),
            ts_min=("ts_us", "min"),
            ts_max=("ts_us", "max"),
        ).reset_index()
        n = out["n_turns"].to_numpy(dtype=np.float64)
        out["frac_tool_turns"] = out["n_tool"].to_numpy() / n
        out["mean_turn_chars"] = out["sum_chars"].to_numpy() / n
        out["dup_turn_frac"] = 1.0 - out["n_distinct_turns"].to_numpy() / n
        out["duration_sec"] = ((out["ts_max"] - out["ts_min"])
                               .to_numpy() / 1_000_000.0)
        out["conv_pass"] = ((out["n_turns"] >= CONV_MIN_TURNS)
                            & (out["n_roles"] >= CONV_MIN_ROLES)
                            & (out["dup_turn_frac"]
                               <= CONV_MAX_DUP_TURN_FRAC))
        out = out[["conv_id", "n_turns", "n_roles", "frac_tool_turns",
                   "mean_turn_chars", "dup_turn_frac", "duration_sec",
                   "conv_pass"]]
        out["n_turns"] = out["n_turns"].astype("int64")
        out["n_roles"] = out["n_roles"].astype("int64")
        # drop the pandas schema metadata (an unhashable dict that the
        # executor's schema-dedup warns about on every block)
        return pa.Table.from_pandas(
            out, preserve_index=False).replace_schema_metadata(None)

    proj = transcripts_ds.select_columns(
        ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    ).map_batches(project, batch_format="pyarrow", zero_copy_batch=True)
    proj = proj.map_batches(lambda t: add_bucket_col(t, ["conv_id"], B),
                            batch_format="pyarrow")
    return proj.groupby("__bkt").map_groups(bucket_stats,
                                            batch_format="pyarrow")


def conversation_stats_sql(path: str) -> str:
    """DuckDB twin over the same transcript parquet: identical md5_64
    distinct-turn counting, identical int/int divisions."""
    h = "('0x' || substr(md5(coalesce(text, '')), 1, 16))::UBIGINT"
    return rf"""
WITH t AS (
  SELECT conv_id, role, text, tool, epoch_us(ts) AS ts_us, {h} AS h
  FROM read_parquet('{path}/*.parquet')
),
agg AS (
  SELECT conv_id,
         count(*)::BIGINT AS n_turns,
         count(DISTINCT h)::BIGINT AS n_distinct,
         count(DISTINCT role)::BIGINT AS n_roles,
         sum(CASE WHEN tool IS NOT NULL AND tool <> ''
                  THEN 1 ELSE 0 END)::BIGINT AS n_tool,
         sum(length(coalesce(text, '')))::BIGINT AS sum_chars,
         min(ts_us) AS ts_min, max(ts_us) AS ts_max
  FROM t GROUP BY conv_id
)
SELECT conv_id, n_turns, n_roles,
       n_tool::DOUBLE / n_turns AS frac_tool_turns,
       sum_chars::DOUBLE / n_turns AS mean_turn_chars,
       1.0 - n_distinct::DOUBLE / n_turns AS dup_turn_frac,
       (ts_max - ts_min)::DOUBLE / 1000000.0 AS duration_sec,
       (n_turns >= {CONV_MIN_TURNS} AND n_roles >= {CONV_MIN_ROLES}
        AND 1.0 - n_distinct::DOUBLE / n_turns
            <= {CONV_MAX_DUP_TURN_FRAC}) AS conv_pass
FROM agg"""


def conversation_dedup(transcripts_ds, num_buckets: int | None = None):
    """Exact-duplicate CONVERSATION detection (the transcript analogue
    of dedup.exact_dedup_rows): two skinny exchanges, never the text.

    1. bucket by hash(conv_id) so each conversation is whole in one
       task; its signature is md5 over the turn-ordered concatenation
       of per-turn md5(text) hex digests (order-sensitive: the same
       turns in a different order are a different conversation);
    2. bucket the one-row-per-conversation signatures by hash(sig);
       keep the min conv_id per signature with its copy count.

    Output: (conv_id, n_copies) — one row per distinct conversation.
    """
    import hashlib as _hl

    from .shuffle import add_bucket_col, default_buckets

    B = num_buckets or default_buckets()

    def project(batch: pa.Table) -> pa.Table:
        return pa.table({
            "conv_id": batch["conv_id"],
            "turn_idx": pc.cast(batch["turn_idx"], pa.int64()),
            "hhex": pa.array(
                [_hl.md5((t or "").encode()).hexdigest()
                 for t in batch["text"].to_pylist()],
                type=pa.string()),
        })

    def conv_sig(tbl: pa.Table) -> pa.Table:
        df = tbl.to_pandas().sort_values(["conv_id", "turn_idx"],
                                         kind="mergesort")
        sig = (df.groupby("conv_id", sort=False)["hhex"]
               .agg("".join)
               .map(lambda s: _hl.md5(s.encode()).hexdigest())
               .reset_index(name="sig"))
        return pa.Table.from_pandas(
            sig, preserve_index=False).replace_schema_metadata(None)

    def keep_min(tbl: pa.Table) -> pa.Table:
        df = tbl.to_pandas()
        g = (df.sort_values("conv_id", kind="mergesort")
             .groupby("sig", sort=False)
             .agg(conv_id=("conv_id", "first"),
                  n_copies=("conv_id", "size")).reset_index())
        out = g[["conv_id", "n_copies"]].copy()
        out["n_copies"] = out["n_copies"].astype("int64")
        return pa.Table.from_pandas(
            out, preserve_index=False).replace_schema_metadata(None)

    proj = transcripts_ds.select_columns(
        ["conv_id", "turn_idx", "text"]).map_batches(
        project, batch_format="pyarrow", zero_copy_batch=True)
    proj = proj.map_batches(lambda t: add_bucket_col(t, ["conv_id"], B),
                            batch_format="pyarrow")
    sigs = proj.groupby("__bkt").map_groups(conv_sig,
                                            batch_format="pyarrow")
    sigs = sigs.map_batches(lambda t: add_bucket_col(t, ["sig"], B),
                            batch_format="pyarrow")
    return sigs.groupby("__bkt").map_groups(keep_min,
                                            batch_format="pyarrow")


def conversation_dedup_sql(path: str) -> str:
    """DuckDB twin: identical per-turn md5, identical turn-ordered
    concatenation, identical min-conv_id keeper rule."""
    return rf"""
WITH sig AS (
  SELECT conv_id,
         md5(string_agg(md5(coalesce(text, '')), ''
                        ORDER BY turn_idx)) AS sig
  FROM read_parquet('{path}/*.parquet')
  GROUP BY conv_id
)
SELECT min(conv_id) AS conv_id, count(*)::BIGINT AS n_copies
FROM sig GROUP BY sig"""


SESSION_GAP_SEC = 1800


def conversation_sessions(transcripts_ds,
                          gap_sec: int = SESSION_GAP_SEC,
                          num_buckets: int | None = None):
    """Gap-based session segmentation WITHIN conversations (the
    transcript twin of events.sessionize, which keys on user): a new
    session starts at any turn whose gap from the previous turn of the
    same conversation exceeds ``gap_sec``. Output one row per
    (conv_id, session_idx): n_turns, start/end epoch-us, duration_sec.

    One skinny bucketed exchange keyed hash(conv_id) — only (ids,
    ts_us) move, text never does; session ids are a cumsum of gap
    breaks (cython), the per-session aggregate one vectorized groupby.
    """
    from .shuffle import add_bucket_col, default_buckets

    B = num_buckets or default_buckets()
    gap_us = gap_sec * 1_000_000

    def project(batch: pa.Table) -> pa.Table:
        # null-ts turns are excluded on BOTH engines (a NaN gap would
        # otherwise break sessions differently than SQL's NULL CASE)
        batch = batch.filter(pc.is_valid(batch["ts"]))
        return pa.table({
            "conv_id": batch["conv_id"],
            "turn_idx": pc.cast(batch["turn_idx"], pa.int64()),
            "ts_us": pc.cast(pc.cast(batch["ts"], pa.timestamp("us")),
                             pa.int64()),
        })

    schema = pa.schema([
        ("conv_id", pa.string()), ("session_idx", pa.int64()),
        ("n_turns", pa.int64()), ("start_us", pa.int64()),
        ("end_us", pa.int64()), ("duration_sec", pa.float64())])

    def bucket_sessions(tbl: pa.Table) -> pa.Table:
        df = (tbl.to_pandas()
              .sort_values(["conv_id", "turn_idx"], kind="mergesort",
                           ignore_index=True))
        if not len(df):
            return schema.empty_table()
        g = df.groupby("conv_id", sort=False)
        gap = df["ts_us"] - g["ts_us"].shift()
        brk = gap.isna() | (gap > gap_us)
        df["__sess"] = brk.groupby(df["conv_id"], sort=False).cumsum() - 1
        out = (df.groupby(["conv_id", "__sess"], sort=False)
               .agg(n_turns=("ts_us", "size"), start_us=("ts_us", "min"),
                    end_us=("ts_us", "max")).reset_index()
               .rename(columns={"__sess": "session_idx"}))
        out["session_idx"] = out["session_idx"].astype("int64")
        out["n_turns"] = out["n_turns"].astype("int64")
        out["duration_sec"] = ((out["end_us"] - out["start_us"])
                               .to_numpy(dtype=np.float64) / 1e6)
        return pa.Table.from_pandas(
            out, schema=schema,
            preserve_index=False).replace_schema_metadata(None)

    proj = transcripts_ds.select_columns(
        ["conv_id", "turn_idx", "ts"]
    ).map_batches(project, batch_format="pyarrow", zero_copy_batch=True)
    proj = proj.map_batches(lambda t: add_bucket_col(t, ["conv_id"], B),
                            batch_format="pyarrow")
    return proj.groupby("__bkt").map_groups(bucket_sessions,
                                            batch_format="pyarrow")


def conversation_sessions_sql(path: str,
                              gap_sec: int = SESSION_GAP_SEC) -> str:
    """DuckDB twin: identical gap predicate (strict >), turn_idx
    session ordering, and integer-us duration / 1e6 float order.
    NOTE the break is on the gap from the previous TURN (turn_idx
    order), not time order — out-of-order timestamps are part of the
    corpus and both engines honor the same ordering."""
    gap_us = gap_sec * 1_000_000
    return f"""
WITH t AS (
  SELECT conv_id, turn_idx, epoch_us(ts) AS ts_us
  FROM read_parquet('{path}/*.parquet') WHERE ts IS NOT NULL
),
m AS (
  SELECT conv_id, turn_idx, ts_us,
         CASE WHEN ts_us - lag(ts_us) OVER w > {gap_us}
               OR lag(ts_us) OVER w IS NULL THEN 1 ELSE 0 END AS brk
  FROM t WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)
),
r AS (
  SELECT conv_id, ts_us,
         sum(brk) OVER (PARTITION BY conv_id ORDER BY turn_idx
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND CURRENT ROW) - 1 AS session_idx
  FROM m
)
SELECT conv_id, session_idx::BIGINT AS session_idx,
       count(*)::BIGINT AS n_turns,
       min(ts_us) AS start_us, max(ts_us) AS end_us,
       (max(ts_us) - min(ts_us))::DOUBLE / 1e6 AS duration_sec
FROM r GROUP BY conv_id, session_idx"""
