"""Conversation-mining operators over the transcript corpus — the
training-example side of the transcript family (convstats covers the
quality side, turnflow the window side):

- ``sft_examples``: SFT pair extraction — for every assistant turn,
  emit (context = the last K preceding turns rendered ``role: text``
  joined by newlines, response = the turn's text). The standard
  "flatten a multi-turn transcript into supervised examples" pass of
  a chat-model data pipeline.
- ``loop_detect``: agent-loop smell — per conversation, the longest
  run of CONSECUTIVE identical (role, text) turns (gaps-and-islands),
  flagging conversations where an agent got stuck repeating itself.
- ``prefix_forks``: shared-prefix fork mining — groups of
  conversations that share an identical first-K-turn prefix but
  diverge afterwards (distinct full signatures). The candidate
  generator for preference-pair construction: same prompt prefix,
  different continuations.
- ``preference_pairs``: the materialization step downstream of
  prefix_forks — one representative per distinct continuation
  (capped at MAX_REPS_PER_GROUP per group, smallest conv_ids win),
  every rep pair with its first point of divergence and both
  diverging turn texts.

Null text renders/hashes as '' in every operator here; the SQL twins
coalesce(text, '') to match, so a corpus with null rows stays
value-comparable instead of crashing one engine.

Scale design (10^12-turn corpus): every operator keys its ONE
bucketed exchange on hash(conv_id) % B — the flagship partitioning
key reused — so a conversation is whole in one task, and every
per-bucket kernel is one vectorized pandas/numpy pass (cython groupby
shift / cumsum / cumcount), never per-key map_groups, never per-row
Python in the hot path. loop_detect and prefix_forks ship only
md5 digests of text (32-byte lines), never the text; sft_examples is
the one operator whose OUTPUT is text, so text crossing the exchange
is inherent to its semantics — the projection still drops every
other column. prefix_forks' second exchange moves one row per
conversation (three digests), keyed hash(prefix_sig).

Reference semantics source: no counterpart exists in the Go reference
(its only cross-row state is the concatenator,
recvs/fluentd.go:399-544); these extend its per-tag stream semantics
to ordered per-conversation mining with exact DuckDB window/groupby
twins.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

SFT_CONTEXT_TURNS = 8
LOOP_MIN_RUN = 3
FORK_PREFIX_TURNS = 2
MAX_REPS_PER_GROUP = 64


def _sorted_bucket_df(tbl: pa.Table) -> pd.DataFrame:
    df = tbl.to_pandas()
    return df.sort_values(["conv_id", "turn_idx"], kind="mergesort",
                          ignore_index=True)


def _from_pandas(df: pd.DataFrame,
                 schema: pa.Schema | None = None) -> pa.Table:
    return pa.Table.from_pandas(
        df, schema=schema,
        preserve_index=False).replace_schema_metadata(None)


def _md5_hex(texts) -> pa.Array:
    """md5 hexdigest per element — one C call per value (the
    established convstats pattern). None hashes as '' (the SQL twins
    coalesce(text, '') to match)."""
    return pa.array([hashlib.md5((t or "").encode()).hexdigest()
                     for t in texts], type=pa.string())


def _role_text_digest(batch: pa.Table) -> pa.Array:
    """Per-turn role-sensitive digest md5('role:text'), null text as ''
    — the shared projection of prefix_forks and preference_pairs."""
    lines = pc.binary_join_element_wise(
        batch["role"], pc.fill_null(batch["text"], ""), ":")
    return _md5_hex(lines.to_pylist())


def _conv_sig_stage(transcripts_ds, k_prefix: int, B: int):
    """Exchange 1 shared by prefix_forks and preference_pairs: per-turn
    digests keyed hash(conv_id) → one (conv_id, prefix_sig, full_sig)
    row per conversation with >= k_prefix turns. Skinny — text never
    moves."""
    import hashlib as _hl

    from .shuffle import add_bucket_col

    def project(batch: pa.Table) -> pa.Table:
        return pa.table({
            "conv_id": batch["conv_id"],
            "turn_idx": pc.cast(batch["turn_idx"], pa.int64()),
            "hhex": _role_text_digest(batch),
        })

    sig_schema = pa.schema([
        ("conv_id", pa.string()), ("prefix_sig", pa.string()),
        ("full_sig", pa.string())])

    def conv_sigs(tbl: pa.Table) -> pa.Table:
        df = _sorted_bucket_df(tbl)
        if not len(df):
            return sig_schema.empty_table()
        g = df.groupby("conv_id", sort=False)
        rn = g.cumcount()
        n = g["hhex"].transform("size")
        ok = n.to_numpy() >= k_prefix
        df, rn = df[ok], rn[ok]
        full = (df.groupby("conv_id", sort=False)["hhex"].agg("".join)
                .map(lambda s: _hl.md5(s.encode()).hexdigest()))
        pref = (df[rn.to_numpy() < k_prefix]
                .groupby("conv_id", sort=False)["hhex"].agg("".join)
                .map(lambda s: _hl.md5(s.encode()).hexdigest()))
        out = pd.DataFrame({"conv_id": full.index,
                            "prefix_sig": pref.reindex(full.index),
                            "full_sig": full.to_numpy()})
        return _from_pandas(out.reset_index(drop=True), sig_schema)

    proj = transcripts_ds.select_columns(
        ["conv_id", "turn_idx", "role", "text"]
    ).map_batches(project, batch_format="pyarrow", zero_copy_batch=True)
    proj = proj.map_batches(lambda t: add_bucket_col(t, ["conv_id"], B),
                            batch_format="pyarrow")
    return proj.groupby("__bkt").map_groups(conv_sigs,
                                            batch_format="pyarrow")


# ------------------------------------------------------------- SFT extraction

SFT_SCHEMA = pa.schema([
    ("conv_id", pa.string()), ("turn_idx", pa.int64()),
    ("n_context_turns", pa.int64()),
    ("context", pa.string()), ("response", pa.string())])


def sft_kernel(df: pd.DataFrame, k_context: int) -> pd.DataFrame:
    """Per-bucket SFT extraction over a (conv_id, turn_idx)-sorted
    frame with columns conv_id/turn_idx/role/text — shared by
    sft_examples and pipelines.sftbuild.

    The context window is K numpy gathers over the rendered-line
    array (restricted to the kept assistant rows) plus ONE C-level
    '\\n'.join per output row — the earlier K sequential object-string
    folds re-copied every growing context K times (O(K·context bytes)
    per row) and were the extraction's dominant cost at 10M turns."""
    role = df["role"].fillna("")
    text = df["text"].fillna("")  # the documented null-as-'' contract
    line = (role + ": " + text).to_numpy()
    conv = pd.factorize(df["conv_id"])[0]
    keep_idx = np.nonzero(role.to_numpy() == "assistant")[0]
    cols = []
    for k in range(k_context, 0, -1):
        src = keep_idx - k
        ok = src >= 0
        safe = np.where(ok, src, 0)
        ok &= conv[safe] == conv[keep_idx]
        cols.append(np.where(ok, line[safe], None))
    if len(keep_idx) and cols:
        ctx = ["\n".join([c for c in row if c is not None])
               for row in zip(*cols)]
    else:
        ctx = [""] * len(keep_idx)
    n_ctx = (df.groupby("conv_id", sort=False).cumcount()
             .to_numpy()[keep_idx].clip(max=k_context))
    return pd.DataFrame({
        "conv_id": df["conv_id"].to_numpy()[keep_idx],
        "turn_idx": df["turn_idx"].to_numpy()[keep_idx].astype("int64"),
        "n_context_turns": n_ctx.astype("int64"),
        "context": pd.Series(ctx, dtype=object)
        if len(keep_idx) else pd.Series([], dtype=object),
        "response": text.to_numpy()[keep_idx],
    })


def sft_examples(transcripts_ds, k_context: int = SFT_CONTEXT_TURNS,
                 num_buckets: int | None = None):
    """For each assistant turn: (conv_id, turn_idx, n_context_turns,
    context, response) where context is the last ``k_context``
    preceding turns of the SAME conversation rendered ``role: text``
    and joined with '\\n' (oldest first; '' when the assistant turn
    opens the conversation).

    The context window is built with k_context vectorized group-shift
    string concatenations — O(K) columnar passes per bucket, no
    per-row Python.
    """
    from .shuffle import add_bucket_col, default_buckets

    B = num_buckets or default_buckets()
    K = k_context

    def project(batch: pa.Table) -> pa.Table:
        return pa.table({
            "conv_id": batch["conv_id"],
            "turn_idx": pc.cast(batch["turn_idx"], pa.int64()),
            "role": batch["role"],
            "text": pc.fill_null(batch["text"], ""),
        })

    def bucket_examples(tbl: pa.Table) -> pa.Table:
        df = _sorted_bucket_df(tbl)
        if not len(df):
            return SFT_SCHEMA.empty_table()
        return _from_pandas(sft_kernel(df, K), SFT_SCHEMA)

    proj = transcripts_ds.select_columns(
        ["conv_id", "turn_idx", "role", "text"]
    ).map_batches(project, batch_format="pyarrow", zero_copy_batch=True)
    proj = proj.map_batches(lambda t: add_bucket_col(t, ["conv_id"], B),
                            batch_format="pyarrow")
    return proj.groupby("__bkt").map_groups(bucket_examples,
                                            batch_format="pyarrow")


def sft_examples_sql(path: str,
                     k_context: int = SFT_CONTEXT_TURNS) -> str:
    """DuckDB twin: windowed string_agg concatenates in frame order
    (oldest row of the K-PRECEDING frame first — verified), matching
    the shift(K)..shift(1) fold exactly."""
    return f"""
WITH t AS (
  SELECT conv_id, turn_idx::BIGINT AS turn_idx, role,
         coalesce(text, '') AS text,
         role || ': ' || coalesce(text, '') AS line
  FROM read_parquet('{path}/*.parquet')
),
w AS (
  SELECT conv_id, turn_idx, role, text,
         coalesce(string_agg(line, chr(10)) OVER (
           PARTITION BY conv_id ORDER BY turn_idx
           ROWS BETWEEN {k_context} PRECEDING AND 1 PRECEDING),
           '') AS context,
         least(row_number() OVER (
           PARTITION BY conv_id ORDER BY turn_idx) - 1,
           {k_context})::BIGINT AS n_context_turns
  FROM t
)
SELECT conv_id, turn_idx, n_context_turns, context,
       text AS response
FROM w WHERE role = 'assistant'"""


# -------------------------------------------------------------- loop detection

def loop_detect(transcripts_ds, min_run: int = LOOP_MIN_RUN,
                num_buckets: int | None = None):
    """Per conversation: n_turns, max_run (longest run of consecutive
    turns with identical (role, text)), is_looping = max_run >=
    min_run. Only (conv_id, turn_idx, role, md5(text)) crosses the
    exchange — text never moves.

    Gaps-and-islands, fully vectorized: a run break is any row whose
    (role, hash) differs from the previous row of the same
    conversation; cumsum of breaks is the run id; run lengths come
    from one value_counts map.
    """
    from .shuffle import add_bucket_col, default_buckets

    B = num_buckets or default_buckets()

    def project(batch: pa.Table) -> pa.Table:
        return pa.table({
            "conv_id": batch["conv_id"],
            "turn_idx": pc.cast(batch["turn_idx"], pa.int64()),
            "role": batch["role"],
            "hhex": _md5_hex(batch["text"].to_pylist()),
        })

    schema = pa.schema([
        ("conv_id", pa.string()), ("n_turns", pa.int64()),
        ("max_run", pa.int64()), ("is_looping", pa.bool_())])

    def bucket_runs(tbl: pa.Table) -> pa.Table:
        df = _sorted_bucket_df(tbl)
        if not len(df):
            return schema.empty_table()
        g = df.groupby("conv_id", sort=False)
        same = ((g["role"].shift() == df["role"])
                & (g["hhex"].shift() == df["hhex"]))
        run_id = (~same).cumsum()  # NaN-shift rows start a new run
        rl = run_id.map(run_id.value_counts())
        out = (pd.DataFrame({"conv_id": df["conv_id"], "rl": rl})
               .groupby("conv_id", sort=False)["rl"]
               .agg(n_runsum="size", max_run="max").reset_index())
        out = out.rename(columns={"n_runsum": "n_turns"})
        out["n_turns"] = out["n_turns"].astype("int64")
        out["max_run"] = out["max_run"].astype("int64")
        out["is_looping"] = out["max_run"] >= min_run
        return _from_pandas(out, schema)

    proj = transcripts_ds.select_columns(
        ["conv_id", "turn_idx", "role", "text"]
    ).map_batches(project, batch_format="pyarrow", zero_copy_batch=True)
    proj = proj.map_batches(lambda t: add_bucket_col(t, ["conv_id"], B),
                            batch_format="pyarrow")
    return proj.groupby("__bkt").map_groups(bucket_runs,
                                            batch_format="pyarrow")


def loop_detect_sql(path: str, min_run: int = LOOP_MIN_RUN) -> str:
    """DuckDB twin: identical md5 run-break predicate and
    gaps-and-islands run ids."""
    return f"""
WITH t AS (
  SELECT conv_id, turn_idx, role, md5(coalesce(text, '')) AS h
  FROM read_parquet('{path}/*.parquet')
),
m AS (
  SELECT conv_id, turn_idx,
         CASE WHEN lag(role) OVER w = role
               AND lag(h) OVER w = h THEN 0 ELSE 1 END AS brk
  FROM t WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)
),
r AS (
  SELECT conv_id,
         sum(brk) OVER (PARTITION BY conv_id ORDER BY turn_idx
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND CURRENT ROW) AS run_id
  FROM m
),
runs AS (
  SELECT conv_id, run_id, count(*)::BIGINT AS rl
  FROM r GROUP BY conv_id, run_id
)
SELECT conv_id, sum(rl)::BIGINT AS n_turns,
       max(rl)::BIGINT AS max_run,
       max(rl) >= {min_run} AS is_looping
FROM runs GROUP BY conv_id"""


# ---------------------------------------------------------- prefix fork mining

def prefix_forks(transcripts_ds, k_prefix: int = FORK_PREFIX_TURNS,
                 num_buckets: int | None = None):
    """Groups of conversations sharing an identical first-``k_prefix``
    turn prefix (role-sensitive per-turn md5 chain) whose FULL
    conversations differ — the candidate pools for preference-pair
    mining. Conversations with fewer than k_prefix turns are out of
    scope.

    Output per fork group: (prefix_sig, n_convs, n_variants,
    example_conv_id = lexicographic min), n_variants >= 2 only (a
    group of pure exact duplicates is conversation_dedup's business,
    not a fork).

    Two skinny exchanges: per-turn digests keyed hash(conv_id) (the
    shared _conv_sig_stage), then one row per conversation keyed
    hash(prefix_sig). Text never moves.
    """
    from .shuffle import add_bucket_col, default_buckets

    B = num_buckets or default_buckets()

    out_schema = pa.schema([
        ("prefix_sig", pa.string()), ("n_convs", pa.int64()),
        ("n_variants", pa.int64()), ("example_conv_id", pa.string())])

    def fork_groups(tbl: pa.Table) -> pa.Table:
        df = tbl.to_pandas()
        if not len(df):
            return out_schema.empty_table()
        g = (df.sort_values("conv_id", kind="mergesort")
             .groupby("prefix_sig", sort=False)
             .agg(n_convs=("conv_id", "size"),
                  n_variants=("full_sig", "nunique"),
                  example_conv_id=("conv_id", "first")).reset_index())
        g = g[g["n_variants"] >= 2]
        g["n_convs"] = g["n_convs"].astype("int64")
        g["n_variants"] = g["n_variants"].astype("int64")
        return _from_pandas(g.reset_index(drop=True), out_schema)

    sigs = _conv_sig_stage(transcripts_ds, k_prefix, B)
    sigs = sigs.map_batches(
        lambda t: add_bucket_col(t, ["prefix_sig"], B),
        batch_format="pyarrow")
    return sigs.groupby("__bkt").map_groups(fork_groups,
                                            batch_format="pyarrow")


def prefix_forks_sql(path: str,
                     k_prefix: int = FORK_PREFIX_TURNS) -> str:
    """DuckDB twin: identical role:text per-turn digest, identical
    turn-ordered digest chains."""
    return f"""
WITH t AS (
  SELECT conv_id, turn_idx,
         md5(role || ':' || coalesce(text, '')) AS hhex
  FROM read_parquet('{path}/*.parquet')
),
o AS (
  SELECT conv_id, hhex,
         row_number() OVER (PARTITION BY conv_id
                            ORDER BY turn_idx) AS rn,
         count(*) OVER (PARTITION BY conv_id) AS n_turns
  FROM t
),
sigs AS (
  SELECT conv_id,
         md5(string_agg(hhex, '' ORDER BY rn)
             FILTER (WHERE rn <= {k_prefix})) AS prefix_sig,
         md5(string_agg(hhex, '' ORDER BY rn)) AS full_sig
  FROM o WHERE n_turns >= {k_prefix} GROUP BY conv_id
)
SELECT prefix_sig, count(*)::BIGINT AS n_convs,
       count(DISTINCT full_sig)::BIGINT AS n_variants,
       min(conv_id) AS example_conv_id
FROM sigs GROUP BY prefix_sig
HAVING count(DISTINCT full_sig) >= 2"""


# --------------------------------------------------------- preference pairs

def preference_pairs(transcripts_ds, k_prefix: int = FORK_PREFIX_TURNS,
                     num_buckets: int | None = None):
    """Materialize preference-pair CANDIDATES from prefix forks (the
    DPO/RLHF mining step downstream of prefix_forks): for every fork
    group, one representative conversation per distinct continuation
    (min conv_id per (prefix_sig, full_sig)), then all rep pairs
    (conv_a < conv_b) with their first point of divergence:

        (prefix_sig, conv_a, conv_b, div_turn, text_a, text_b)

    div_turn is the 1-based position of the first turn where the
    digest chains differ (or where the shorter conversation ends);
    text_a/text_b are the turns at that position ('' when that side
    already ended — the length-divergence case).

    Scale design: four exchanges, all skinny except the one corpus
    pass — (1) per-turn digests keyed hash(conv_id) → conversation
    signatures; (2) signatures keyed hash(prefix_sig) → variant reps
    and fork groups; (3) corpus ∪ rep keys keyed hash(conv_id) →
    semi-join emits ONLY rep-conversation turns (the fork subset,
    a vanishing fraction of the corpus) tagged with their prefix_sig;
    (4) rep turns keyed hash(prefix_sig) → per-group pair compute.
    A group's rep count is CAPPED at MAX_REPS_PER_GROUP (the
    lexicographically smallest rep conv_ids win, deterministically):
    a viral shared opener could otherwise put 100k+ variants in one
    group and C(n,2) pair work in one task. The SQL twin applies the
    identical cap. The divergence point is found on digest arrays,
    never by re-reading text.
    """
    from .shuffle import add_bucket_col, default_buckets

    B = num_buckets or default_buckets()

    # ---- exchange 1: conversation signatures (shared stage)
    sigs = _conv_sig_stage(transcripts_ds, k_prefix, B)

    # ---- exchange 2: variant reps within fork groups (capped)
    rep_schema = pa.schema([("conv_id", pa.string()),
                            ("prefix_sig", pa.string())])

    def fork_reps(tbl: pa.Table) -> pa.Table:
        df = tbl.to_pandas()
        if not len(df):
            return rep_schema.empty_table()
        reps = (df.sort_values("conv_id", kind="mergesort")
                .groupby(["prefix_sig", "full_sig"], sort=False)
                .agg(conv_id=("conv_id", "first")).reset_index())
        nvar = reps.groupby("prefix_sig", sort=False)[
            "full_sig"].transform("nunique")
        reps = reps[nvar.to_numpy() >= 2]
        # deterministic hot-group cap: smallest rep conv_ids win
        reps = reps.sort_values("conv_id", kind="mergesort")
        rank = reps.groupby("prefix_sig", sort=False).cumcount()
        reps = reps[rank.to_numpy() < MAX_REPS_PER_GROUP]
        return _from_pandas(
            reps[["conv_id", "prefix_sig"]].reset_index(drop=True),
            rep_schema)

    reps = sigs.map_batches(
        lambda t: add_bucket_col(t, ["prefix_sig"], B),
        batch_format="pyarrow")
    reps = reps.groupby("__bkt").map_groups(fork_reps,
                                            batch_format="pyarrow")

    # ---- exchange 3: semi-join corpus to rep conversations
    union_schema = pa.schema([
        ("conv_id", pa.string()), ("turn_idx", pa.int64()),
        ("role", pa.string()), ("text", pa.string()),
        ("prefix_sig", pa.string()), ("__keep", pa.int8())])

    def corpus_rows(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        out = pa.table({
            "conv_id": batch["conv_id"],
            "turn_idx": pc.cast(batch["turn_idx"], pa.int64()),
            "role": batch["role"],
            "text": pc.fill_null(batch["text"], ""),
            "prefix_sig": pa.nulls(n, pa.string()),
            "__keep": pa.array(np.zeros(n, dtype=np.int8)),
        }).cast(union_schema)
        return add_bucket_col(out, ["conv_id"], B)

    def rep_rows(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        out = pa.table({
            "conv_id": batch["conv_id"],
            "turn_idx": pa.nulls(n, pa.int64()),
            "role": pa.nulls(n, pa.string()),
            "text": pa.nulls(n, pa.string()),
            "prefix_sig": batch["prefix_sig"],
            "__keep": pa.array(np.ones(n, dtype=np.int8)),
        }).cast(union_schema)
        return add_bucket_col(out, ["conv_id"], B)

    left = transcripts_ds.select_columns(
        ["conv_id", "turn_idx", "role", "text"]
    ).map_batches(corpus_rows, batch_format="pyarrow",
                  zero_copy_batch=True)
    right = reps.map_batches(rep_rows, batch_format="pyarrow")

    turn_schema = pa.schema([
        ("prefix_sig", pa.string()), ("conv_id", pa.string()),
        ("turn_idx", pa.int64()), ("hhex", pa.string()),
        ("text", pa.string())])

    def rep_turns(tbl: pa.Table) -> pa.Table:
        keys = tbl.filter(pc.equal(tbl["__keep"], 1))
        corpus = tbl.filter(pc.equal(tbl["__keep"], 0))
        corpus = corpus.filter(pc.is_in(
            corpus["conv_id"],
            value_set=keys["conv_id"].combine_chunks()))
        if not corpus.num_rows:
            return turn_schema.empty_table()
        sig_of = dict(zip(keys["conv_id"].to_pylist(),
                          keys["prefix_sig"].to_pylist()))
        lines = pc.binary_join_element_wise(
            corpus["role"], pc.fill_null(corpus["text"], ""), ":")
        cids = corpus["conv_id"].to_pylist()
        return pa.table({
            "prefix_sig": pa.array([sig_of[c] for c in cids],
                                   type=pa.string()),
            "conv_id": corpus["conv_id"],
            "turn_idx": corpus["turn_idx"],
            "hhex": _md5_hex(lines.to_pylist()),
            "text": corpus["text"],
        }).cast(turn_schema)

    turns = left.union(right).groupby("__bkt").map_groups(
        rep_turns, batch_format="pyarrow")

    # ---- exchange 4: per-group pair compute (tiny fork subset)
    out_schema = pa.schema([
        ("prefix_sig", pa.string()), ("conv_a", pa.string()),
        ("conv_b", pa.string()), ("div_turn", pa.int64()),
        ("text_a", pa.string()), ("text_b", pa.string())])

    def pair_groups(tbl: pa.Table) -> pa.Table:
        df = _sorted_bucket_df(
            tbl) if "turn_idx" in tbl.column_names else tbl.to_pandas()
        if not len(df):
            return out_schema.empty_table()
        rows = []
        for sig, grp in df.groupby("prefix_sig", sort=False):
            convs = {c: (sub["hhex"].to_numpy(),
                         sub["text"].to_numpy())
                     for c, sub in grp.groupby("conv_id", sort=False)}
            ids = sorted(convs)
            for i in range(len(ids)):
                for j in range(i + 1, len(ids)):
                    ha, ta = convs[ids[i]]
                    hb, tb = convs[ids[j]]
                    m = min(len(ha), len(hb))
                    neq = np.nonzero(ha[:m] != hb[:m])[0]
                    # first mismatch, else the shorter conv's end
                    lcp = int(neq[0]) if len(neq) else m
                    rows.append((
                        sig, ids[i], ids[j], lcp + 1,
                        ta[lcp] if lcp < len(ta) else "",
                        tb[lcp] if lcp < len(tb) else ""))
        if not rows:
            return out_schema.empty_table()
        out = pd.DataFrame(rows, columns=[
            "prefix_sig", "conv_a", "conv_b", "div_turn",
            "text_a", "text_b"])
        out["div_turn"] = out["div_turn"].astype("int64")
        return _from_pandas(out, out_schema)

    turns = turns.map_batches(
        lambda t: add_bucket_col(t, ["prefix_sig"], B),
        batch_format="pyarrow")
    return turns.groupby("__bkt").map_groups(pair_groups,
                                             batch_format="pyarrow")


def preference_pairs_sql(path: str,
                         k_prefix: int = FORK_PREFIX_TURNS) -> str:
    """DuckDB twin. The divergence point rides on CUMULATIVE digest
    signatures: div_turn = 1 + max rn where both conversations' rn-th
    cumulative chains are equal (an equi-join on (rn, csig) — no
    full-outer per-pair join needed); the shared k-turn prefix
    guarantees the LCP is >= k_prefix, and a pair that diverges only
    by length joins nothing past the shorter end. Applies the same
    MAX_REPS_PER_GROUP hot-group cap as the Ray path."""
    cap = MAX_REPS_PER_GROUP
    return f"""
WITH t AS (
  SELECT conv_id, turn_idx,
         md5(role || ':' || coalesce(text, '')) AS hhex,
         coalesce(text, '') AS text
  FROM read_parquet('{path}/*.parquet')
),
o AS (
  SELECT conv_id, hhex, text,
         row_number() OVER (PARTITION BY conv_id
                            ORDER BY turn_idx) AS rn,
         count(*) OVER (PARTITION BY conv_id) AS n_turns
  FROM t
),
sigs AS (
  SELECT conv_id,
         md5(string_agg(hhex, '' ORDER BY rn)
             FILTER (WHERE rn <= {k_prefix})) AS prefix_sig,
         md5(string_agg(hhex, '' ORDER BY rn)) AS full_sig
  FROM o WHERE n_turns >= {k_prefix} GROUP BY conv_id
),
reps AS (
  SELECT prefix_sig, full_sig, min(conv_id) AS conv_id
  FROM sigs GROUP BY prefix_sig, full_sig
),
forks AS (
  SELECT prefix_sig FROM reps GROUP BY prefix_sig
  HAVING count(*) >= 2
),
capped AS (
  SELECT conv_id, prefix_sig,
         row_number() OVER (PARTITION BY prefix_sig
                            ORDER BY conv_id) AS rk
  FROM reps JOIN forks USING (prefix_sig)
),
pairs AS (
  SELECT a.prefix_sig, a.conv_id AS conv_a, b.conv_id AS conv_b
  FROM capped a
  JOIN capped b ON a.prefix_sig = b.prefix_sig
              AND a.conv_id < b.conv_id
  WHERE a.rk <= {cap} AND b.rk <= {cap}
),
c AS (
  SELECT conv_id, rn, text,
         md5(string_agg(hhex, '') OVER (
           PARTITION BY conv_id ORDER BY rn
           ROWS BETWEEN UNBOUNDED PRECEDING
           AND CURRENT ROW)) AS csig
  FROM o
),
lcp AS (
  SELECT p.prefix_sig, p.conv_a, p.conv_b,
         max(a.rn)::BIGINT + 1 AS div_turn
  FROM pairs p
  JOIN c a ON a.conv_id = p.conv_a
  JOIN c b ON b.conv_id = p.conv_b
          AND b.rn = a.rn AND b.csig = a.csig
  GROUP BY p.prefix_sig, p.conv_a, p.conv_b
)
SELECT l.prefix_sig, l.conv_a, l.conv_b, l.div_turn,
       coalesce(ta.text, '') AS text_a,
       coalesce(tb.text, '') AS text_b
FROM lcp l
LEFT JOIN c ta ON ta.conv_id = l.conv_a AND ta.rn = l.div_turn
LEFT JOIN c tb ON tb.conv_id = l.conv_b AND tb.rn = l.div_turn"""


# -------------------------------------------------------- conversation packing

PACK_CONV_BUDGET = 512
PACK_CONV_BUCKETS = 32


def pack_conversations(transcripts_ds, budget: int = PACK_CONV_BUDGET,
                       num_buckets: int = PACK_CONV_BUCKETS):
    """Greedy packing of WHOLE conversations into training bins of at
    most ``budget`` \\w+ tokens (the conversation-granularity twin of
    sampling.pack_documents — a chat SFT exporter packs transcripts,
    not documents): conversations are packed in conv_id order within
    their md5(conv_id) % B bucket; an over-budget conversation gets
    its own bin. Output: (conv_id, bucket, seq_idx, n_tokens).

    Scale design: stage 1 moves only per-batch (conv_id, token-count)
    partials — ONE skinny exchange keyed md5-mod bucket (modulo so the
    SQL twin reproduces the assignment exactly; the bucket count is
    part of the OUTPUT semantics and therefore fixed, not
    cluster-derived). The per-bucket greedy scan is the same O(n) int
    loop as pack_documents. Text never moves.
    """
    from .text import TOKEN_RE

    B = num_buckets

    def partial(batch: pa.Table) -> pa.Table:
        n = pc.fill_null(pc.cast(
            pc.count_substring_regex(pc.fill_null(batch["text"], ""),
                                     TOKEN_RE), pa.int64()), 0)
        df = pd.DataFrame({"conv_id": batch["conv_id"].to_pylist(),
                           "n": n.to_pylist()})
        g = df.groupby("conv_id", sort=False)["n"].sum().reset_index()
        bkt = np.array(
            [int(hashlib.md5(c.encode()).hexdigest()[:8], 16) % B
             for c in g["conv_id"]], dtype=np.int32)
        return pa.table({
            "conv_id": pa.array(g["conv_id"], type=pa.string()),
            "n_tokens": pa.array(g["n"].to_numpy(), type=pa.int64()),
            "bucket": pa.array(bkt)})

    schema = pa.schema([
        ("conv_id", pa.string()), ("bucket", pa.int32()),
        ("seq_idx", pa.int64()), ("n_tokens", pa.int64())])

    def pack_bucket(tbl: pa.Table) -> pa.Table:
        df = tbl.to_pandas()
        if not len(df):
            return schema.empty_table()
        # merge the per-batch partials, then the sequential scan
        df = (df.groupby(["conv_id", "bucket"], sort=False)["n_tokens"]
              .sum().reset_index()
              .sort_values("conv_id", kind="mergesort",
                           ignore_index=True))
        toks = df["n_tokens"].to_numpy()
        seq = np.empty(len(toks), dtype=np.int64)
        acc = 0
        s = 0
        for i, t in enumerate(toks):
            t = int(t)
            if acc > 0 and acc + t > budget:
                s += 1
                acc = t
            else:
                acc += t
            seq[i] = s
        out = pd.DataFrame({"conv_id": df["conv_id"],
                            "bucket": df["bucket"].astype("int32"),
                            "seq_idx": seq,
                            "n_tokens": toks})
        return _from_pandas(out, schema)

    proj = transcripts_ds.select_columns(
        ["conv_id", "text"]
    ).map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    return proj.groupby("bucket").map_groups(pack_bucket,
                                             batch_format="pyarrow")


def pack_conversations_sql(path: str,
                           budget: int = PACK_CONV_BUDGET,
                           num_buckets: int = PACK_CONV_BUCKETS) -> str:
    """Exact twin: per-conversation \\w+ token totals, md5-mod bucket,
    greedy scan as a recursive CTE chained on per-bucket row_number
    (the pack_documents_sql pattern)."""
    return rf"""
WITH RECURSIVE c AS (
  SELECT conv_id,
         sum(coalesce(length(regexp_extract_all(
             coalesce(text, ''), '\w+')), 0))::BIGINT AS n_tokens,
         (('0x' || substr(md5(conv_id), 1, 8))::UBIGINT
          % {num_buckets})::INT AS bucket
  FROM read_parquet('{path}/*.parquet')
  GROUP BY conv_id
),
d AS (
  SELECT conv_id, n_tokens, bucket,
         row_number() OVER (PARTITION BY bucket
                            ORDER BY conv_id) AS rn
  FROM c
),
packed AS (
  SELECT conv_id, n_tokens, bucket, rn,
         0::BIGINT AS seq_idx, n_tokens AS acc
  FROM d WHERE rn = 1
  UNION ALL
  SELECT d.conv_id, d.n_tokens, d.bucket, d.rn,
         CASE WHEN p.acc > 0 AND p.acc + d.n_tokens > {budget}
              THEN p.seq_idx + 1 ELSE p.seq_idx END,
         CASE WHEN p.acc > 0 AND p.acc + d.n_tokens > {budget}
              THEN d.n_tokens ELSE p.acc + d.n_tokens END
  FROM d JOIN packed p
    ON d.bucket = p.bucket AND d.rn = p.rn + 1
)
SELECT conv_id, bucket, seq_idx, n_tokens FROM packed"""
