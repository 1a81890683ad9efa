"""Composed transcript → SFT-dataset pipeline — the conversation-side
flagship of the curation family (pretrain_pipeline / selection_pipeline
are the document-side counterparts), chaining the transcript gates the
way an SFT dataset build runs them:

    per-conversation quality gate (the conversation_stats conv_pass
    rules: >= 2 turns, >= 2 roles, dup_turn_frac <= 0.5)
      AND loop gate (no run of >= 3 consecutive identical (role, text)
      turns — the loop_detect predicate)
    -> exact conversation dedup among gate SURVIVORS (min-conv_id
       keeper per turn-ordered signature; gating first is part of the
       checked semantics, mirroring pretrain_pipeline's
       filter-before-count ordering)
    -> SFT pair extraction over kept conversations (the sft_examples
       kernel: context = last-K turns rendered 'role: text')
    -> deterministic train/val/test split on md5(conv_id) so a
       conversation's examples never straddle splits.

Scale design (10^12 turns): THREE exchanges total —
1. skinny (conv_id, turn_idx, role, md5(text)) keyed hash(conv_id):
   gates + signature per conversation in one vectorized pass;
2. one row per surviving conversation keyed hash(sig): keeper
   selection;
3. the corpus (conv_id, turn_idx, role, text) UNIONed with the skinny
   keeper keys, keyed hash(conv_id): per-bucket semi-join + the SFT
   context fold. Text crosses the wire exactly once, in the exchange
   whose OUTPUT is text. The split is map-side (md5, zero shuffles).

``run_resumable_sft`` is the checkpointed form: the parquet write is
FUSED into the exchange-3 map_groups call (one task owns one whole
partition — the flagship run_resumable invariant), completed buckets
are filtered out of the exchange-3 inputs BEFORE the text shuffle, and
partition content is deterministic, so resumed files are byte-identical
to an uninterrupted run.

The SQL twin chains the SAME steps as CTEs (stats gate, gaps-and-
islands loop runs, signature dedup, windowed string_agg extraction,
md5-mod split) so the COMPOSITION is value-checked, not just the
pieces.

Reference semantics source: composition only — each stage cites its
own reference lineage (convstats.py, convmine.py, sampling.py);
resumable layout = stages/sinks.py run_resumable conventions.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.convmine import (LOOP_MIN_RUN, SFT_CONTEXT_TURNS,
                                  SFT_SCHEMA, sft_kernel)
from ..functions.convstats import (CONV_MAX_DUP_TURN_FRAC,
                                   CONV_MIN_ROLES, CONV_MIN_TURNS)

SPLIT_TEST_PCT = 10
SPLIT_VAL_PCT = 10


def _build_examples(transcripts_ds, B: int,
                    corpus_filter, finish, finish_schema: pa.Schema):
    """The three pipeline exchanges, with a pluggable per-bucket
    finisher. ``corpus_filter`` (optional, map-side) prunes
    exchange-3 inputs — the gate/dedup exchanges always see the FULL
    corpus because keeper selection is a global min per signature.
    ``finish(sorted_corpus_df, bucket_id) -> pa.Table`` consumes one
    whole kept-conversation partition inside the shuffle task."""
    from ..functions.shuffle import add_bucket_col

    # ---- exchange 1: per-conversation gates + signature (skinny)
    def project_digest(batch: pa.Table) -> pa.Table:
        return pa.table({
            "conv_id": batch["conv_id"],
            "turn_idx": pc.cast(batch["turn_idx"], pa.int64()),
            "role": batch["role"],
            "hhex": pa.array(
                [hashlib.md5((t or "").encode()).hexdigest()
                 for t in batch["text"].to_pylist()],
                type=pa.string()),
        })

    sig_schema = pa.schema([("conv_id", pa.string()),
                            ("sig", pa.string())])

    def conv_gate_sig(tbl: pa.Table) -> pa.Table:
        df = (tbl.to_pandas()
              .sort_values(["conv_id", "turn_idx"], kind="mergesort",
                           ignore_index=True))
        if not len(df):
            return sig_schema.empty_table()
        g = df.groupby("conv_id", sort=False)
        stats = g.agg(n_turns=("hhex", "size"),
                      n_roles=("role", "nunique"),
                      n_distinct=("hhex", "nunique"))
        same = ((g["role"].shift() == df["role"])
                & (g["hhex"].shift() == df["hhex"]))
        run_id = (~same).cumsum()
        rl = run_id.map(run_id.value_counts())
        stats["max_run"] = (
            pd.DataFrame({"conv_id": df["conv_id"], "rl": rl})
            .groupby("conv_id", sort=False)["rl"].max())
        stats["sig"] = (g["hhex"].agg("".join)
                        .map(lambda s: hashlib.md5(
                            s.encode()).hexdigest()))
        n = stats["n_turns"].to_numpy(dtype=np.float64)
        ok = ((stats["n_turns"] >= CONV_MIN_TURNS)
              & (stats["n_roles"] >= CONV_MIN_ROLES)
              & (1.0 - stats["n_distinct"].to_numpy() / n
                 <= CONV_MAX_DUP_TURN_FRAC)
              & (stats["max_run"] < LOOP_MIN_RUN))
        out = (stats[ok.to_numpy()].reset_index()
               [["conv_id", "sig"]])
        return pa.Table.from_pandas(
            out, schema=sig_schema,
            preserve_index=False).replace_schema_metadata(None)

    proj = transcripts_ds.select_columns(
        ["conv_id", "turn_idx", "role", "text"]
    ).map_batches(project_digest, batch_format="pyarrow",
                  zero_copy_batch=True)
    proj = proj.map_batches(lambda t: add_bucket_col(t, ["conv_id"], B),
                            batch_format="pyarrow")
    ok_convs = proj.groupby("__bkt").map_groups(
        conv_gate_sig, batch_format="pyarrow")

    # ---- exchange 2: keeper per signature (one row per conversation)
    keep_schema = pa.schema([("conv_id", pa.string())])

    def keep_min(tbl: pa.Table) -> pa.Table:
        df = tbl.to_pandas()
        if not len(df):
            return keep_schema.empty_table()
        out = (df.sort_values("conv_id", kind="mergesort")
               .groupby("sig", sort=False)
               .agg(conv_id=("conv_id", "first")).reset_index()
               [["conv_id"]])
        return pa.Table.from_pandas(
            out, schema=keep_schema,
            preserve_index=False).replace_schema_metadata(None)

    keepers = ok_convs.map_batches(
        lambda t: add_bucket_col(t, ["sig"], B),
        batch_format="pyarrow")
    keepers = keepers.groupby("__bkt").map_groups(
        keep_min, batch_format="pyarrow")

    # ---- exchange 3: semi-join + per-bucket finish (text moves once)
    union_schema = pa.schema([
        ("conv_id", pa.string()), ("turn_idx", pa.int64()),
        ("role", pa.string()), ("text", pa.string()),
        ("__keep", pa.int8())])

    def corpus_rows(batch: pa.Table) -> pa.Table:
        if corpus_filter is not None:
            batch = corpus_filter(batch)
        out = pa.table({
            "conv_id": batch["conv_id"],
            "turn_idx": pc.cast(batch["turn_idx"], pa.int64()),
            "role": batch["role"],
            "text": pc.fill_null(batch["text"], ""),
            "__keep": pa.array(
                np.zeros(batch.num_rows, dtype=np.int8)),
        }).cast(union_schema)
        return add_bucket_col(out, ["conv_id"], B)

    def keeper_rows(batch: pa.Table) -> pa.Table:
        if corpus_filter is not None:
            batch = corpus_filter(batch)
        n = batch.num_rows
        out = pa.table({
            "conv_id": batch["conv_id"],
            "turn_idx": pa.nulls(n, pa.int64()),
            "role": pa.nulls(n, pa.string()),
            "text": pa.nulls(n, pa.string()),
            "__keep": pa.array(np.ones(n, dtype=np.int8)),
        }).cast(union_schema)
        return add_bucket_col(out, ["conv_id"], B)

    left = transcripts_ds.select_columns(
        ["conv_id", "turn_idx", "role", "text"]
    ).map_batches(corpus_rows, batch_format="pyarrow",
                  zero_copy_batch=True)
    right = keepers.map_batches(keeper_rows, batch_format="pyarrow")

    def extract(tbl: pa.Table) -> pa.Table:
        kept_ids = tbl.filter(
            pc.equal(tbl["__keep"], 1))["conv_id"].combine_chunks()
        corpus = tbl.filter(pc.equal(tbl["__keep"], 0))
        corpus = corpus.filter(
            pc.is_in(corpus["conv_id"], value_set=kept_ids))
        if not corpus.num_rows:
            return finish_schema.empty_table()
        b = int(tbl["__bkt"][0].as_py())
        df = (corpus.select(["conv_id", "turn_idx", "role", "text"])
              .to_pandas()
              .sort_values(["conv_id", "turn_idx"], kind="mergesort",
                           ignore_index=True))
        return finish(df, b)

    return left.union(right).groupby("__bkt").map_groups(
        extract, batch_format="pyarrow")


def sft_pipeline(transcripts_ds,
                 k_context: int = SFT_CONTEXT_TURNS,
                 num_buckets: int | None = None):
    from ..functions.sampling import split_assign
    from ..functions.shuffle import default_buckets

    B = num_buckets or default_buckets()

    def finish(df: pd.DataFrame, _b: int) -> pa.Table:
        return pa.Table.from_pandas(
            sft_kernel(df, k_context), schema=SFT_SCHEMA,
            preserve_index=False).replace_schema_metadata(None)

    examples = _build_examples(transcripts_ds, B,
                               None, finish, SFT_SCHEMA)
    # ---- map-side split on conv_id (a conversation never straddles)
    return split_assign(examples, test_pct=SPLIT_TEST_PCT,
                        val_pct=SPLIT_VAL_PCT, key="conv_id")


def sft_pipeline_sql(path: str,
                     k_context: int = SFT_CONTEXT_TURNS) -> str:
    """CTE chain of the exact same stages — gate semantics, dedup
    keeper, extraction window, and md5-mod split all value-checked as
    one composition."""
    split_h = ("('0x' || substr(md5(CAST(conv_id AS VARCHAR)), 1, 8))"
               "::UBIGINT % 100")
    return rf"""
WITH t AS (
  SELECT conv_id, turn_idx, role, coalesce(text, '') AS text,
         md5(coalesce(text, '')) AS h
  FROM read_parquet('{path}/*.parquet')
),
agg AS (
  SELECT conv_id, count(*)::BIGINT AS n_turns,
         count(DISTINCT role)::BIGINT AS n_roles,
         count(DISTINCT h)::BIGINT AS n_distinct
  FROM t GROUP BY conv_id
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
  SELECT conv_id, max(rl) AS max_run FROM (
    SELECT conv_id, run_id, count(*) AS rl
    FROM r GROUP BY conv_id, run_id
  ) GROUP BY conv_id
),
o AS (
  SELECT conv_id, h,
         row_number() OVER (PARTITION BY conv_id
                            ORDER BY turn_idx) AS rn
  FROM t
),
sigs AS (
  SELECT conv_id, md5(string_agg(h, '' ORDER BY rn)) AS sig
  FROM o GROUP BY conv_id
),
ok AS (
  SELECT a.conv_id, s.sig
  FROM agg a JOIN runs u USING (conv_id) JOIN sigs s USING (conv_id)
  WHERE a.n_turns >= {CONV_MIN_TURNS}
    AND a.n_roles >= {CONV_MIN_ROLES}
    AND 1.0 - a.n_distinct::DOUBLE / a.n_turns
        <= {CONV_MAX_DUP_TURN_FRAC}
    AND u.max_run < {LOOP_MIN_RUN}
),
keep AS (
  SELECT min(conv_id) AS conv_id FROM ok GROUP BY sig
),
corpus AS (
  SELECT t.conv_id, t.turn_idx, t.role, t.text
  FROM t JOIN keep USING (conv_id)
),
w2 AS (
  SELECT conv_id, turn_idx::BIGINT AS turn_idx, role, text,
         coalesce(string_agg(role || ': ' || text, chr(10)) OVER (
           PARTITION BY conv_id ORDER BY turn_idx
           ROWS BETWEEN {k_context} PRECEDING AND 1 PRECEDING),
           '') AS context,
         least(row_number() OVER (
           PARTITION BY conv_id ORDER BY turn_idx) - 1,
           {k_context})::BIGINT AS n_context_turns
  FROM corpus
)
SELECT conv_id, turn_idx, n_context_turns, context,
       text AS response,
       CASE WHEN {split_h} < {SPLIT_TEST_PCT} THEN 'test'
            WHEN {split_h} < {SPLIT_TEST_PCT + SPLIT_VAL_PCT}
              THEN 'val'
            ELSE 'train' END AS split
FROM w2 WHERE role = 'assistant'"""


# ------------------------------------------------------------ resumable build

SFT_MANIFEST = "_SFT_MANIFEST.json"
SFT_PARTITIONING = "_PARTITIONING.json"

SFT_OUT_SCHEMA = pa.schema(list(SFT_SCHEMA)
                           + [pa.field("split", pa.string())])


def _sft_completed(out_root: str) -> set:
    import os

    done = set()
    if not os.path.isdir(out_root):
        return done
    for name in os.listdir(out_root):
        if name.startswith("bucket=") and os.path.exists(
                os.path.join(out_root, name, SFT_MANIFEST)):
            done.add(int(name.split("=", 1)[1]))
    return done


def _sft_pin_partitioning(out_root: str, requested_b: int,
                          requested_k: int) -> tuple:
    """First run records num_buckets AND k_context; later runs ADOPT
    them (a different B re-keys rows; a different k_context would mix
    context widths across resumed partitions) — the sinks.py
    convention extended to every parameter that shapes partition
    content."""
    import json
    import os
    import tempfile

    p = os.path.join(out_root, SFT_PARTITIONING)
    if os.path.exists(p):
        with open(p) as f:
            pin = json.load(f)
        return int(pin["num_buckets"]), int(
            pin.get("k_context", requested_k))
    fd, tmp = tempfile.mkstemp(dir=out_root, suffix=".ptmp")
    os.close(fd)
    with open(tmp, "w") as f:
        json.dump({"num_buckets": requested_b,
                   "k_context": requested_k}, f)
    os.rename(tmp, p)
    return requested_b, requested_k


def run_resumable_sft(corpus_path: str, out_root: str,
                      k_context: int = SFT_CONTEXT_TURNS,
                      num_buckets: int | None = None) -> dict:
    """The SFT build with per-partition checkpointing (the flagship
    run_resumable pattern applied to this pipeline): the parquet write
    is FUSED into the extraction exchange's map_groups call, so a
    partition can never be marked complete while split across tasks;
    data + manifest land via tmp+rename (atomic); manifest-less dirs
    from a crashed run are cleaned before resuming.

    Resume semantics: the gate/dedup exchanges (skinny digests) always
    run — keeper selection is a GLOBAL min per signature and cannot be
    partitioned away — but completed buckets are filtered out of the
    exchange-3 inputs map-side, BEFORE the shuffle, so a finished
    partition's text never crosses the wire again (text dominates the
    wire cost; the digest exchanges are a few percent of corpus bytes).

    Partition content is deterministic (keeper = min conv_id per sig;
    examples sorted by (conv_id, turn_idx); md5-mod split), so a
    resumed run's files are byte-identical to an uninterrupted one.
    """
    import hashlib as _hl
    import json
    import os
    import shutil
    import tempfile

    import pyarrow.parquet as _pq

    from . import flagship

    from ..functions.sampling import _md5_mod100
    from ..functions.shuffle import default_buckets, hash_bucket

    os.makedirs(out_root, exist_ok=True)
    B, k_context = _sft_pin_partitioning(
        out_root, num_buckets or default_buckets(), k_context)
    done = _sft_completed(out_root)
    for name in os.listdir(out_root):
        p = os.path.join(out_root, name)
        if (name.startswith("bucket=") and os.path.isdir(p)
                and not os.path.exists(os.path.join(p, SFT_MANIFEST))):
            shutil.rmtree(p)

    corpus_filter = None
    if done:
        skip = pa.array(sorted(int(b) for b in done), type=pa.int64())

        def corpus_filter(batch: pa.Table) -> pa.Table:
            bkt = hash_bucket(
                np.asarray(batch["conv_id"].to_pylist(), dtype=object),
                num_buckets=B)
            mask = pc.invert(pc.is_in(
                pa.array(bkt, type=pa.int64()), value_set=skip))
            return batch.filter(mask)

    stats_schema = pa.schema([("bucket", pa.int64()),
                              ("rows", pa.int64())])

    def finish(df: pd.DataFrame, b: int) -> pa.Table:
        ex = sft_kernel(df, k_context)
        h = _md5_mod100(ex["conv_id"].tolist())
        ex["split"] = np.where(
            h < SPLIT_TEST_PCT, "test",
            np.where(h < SPLIT_TEST_PCT + SPLIT_VAL_PCT, "val",
                     "train"))
        ex = ex.sort_values(["conv_id", "turn_idx"], kind="mergesort",
                            ignore_index=True)
        part = pa.Table.from_pandas(
            ex, schema=SFT_OUT_SCHEMA,
            preserve_index=False).replace_schema_metadata(None)
        d = os.path.join(out_root, f"bucket={b}")
        os.makedirs(d, exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
        os.close(fd)
        _pq.write_table(part, tmp, compression="snappy")
        with open(tmp, "rb") as f:
            md5 = _hl.md5(f.read()).hexdigest()
        os.rename(tmp, os.path.join(d, "data.parquet"))
        splits = {}
        for s in pc.unique(part["split"]).to_pylist():
            splits[s] = pc.sum(pc.cast(
                pc.equal(part["split"], s), pa.int64())).as_py()
        manifest = {"bucket": b, "rows": part.num_rows,
                    "per_split": splits, "md5": md5}
        mfd, mtmp = tempfile.mkstemp(dir=d, suffix=".mtmp")
        os.close(mfd)
        with open(mtmp, "w") as f:
            json.dump(manifest, f)
        os.rename(mtmp, os.path.join(d, SFT_MANIFEST))
        return pa.table({
            "bucket": pa.array([b], type=pa.int64()),
            "rows": pa.array([part.num_rows], type=pa.int64())})

    dsw = _build_examples(
        flagship.read_transcripts(corpus_path), B,
        corpus_filter, finish, stats_schema)
    written = dsw.to_pandas()
    from .monitoring import stage_stats
    metrics = {
        "num_buckets": B,
        "partitions_completed_prior": len(done),
        "partitions_written_this_run": int(len(written)),
        "rows_written_this_run": int(written["rows"].sum())
        if len(written) else 0,
        # per-operator wall/rows/bytes — the /monitor analogue
        "stages": stage_stats(dsw),
    }
    mp = os.path.join(out_root, "_METRICS.json")
    with open(mp, "w") as f:
        json.dump(metrics, f)
    return metrics
