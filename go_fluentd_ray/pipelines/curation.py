"""Composed training-data curation pipeline — the operators chained the
way a real dataset build runs them:

    clean/redact -> token count (on the cleaned text) -> quality gate
    (min length, PII budget) -> exact dedup to rows (keep min doc_id
    per distinct cleaned text)

Everything stays one lazy Dataset: two map stages, one map-side filter,
and the single hash(h)-bucketed shuffle inside exact_dedup_rows — no
driver materialization anywhere. The SQL twin composes the SAME steps
as CTEs, so the whole composition (not just each operator) is
value-checked by the oracle harness.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

MIN_TOKENS = 15  # drops the short tail (p5 of the testdata corpus ~16 tokens)
# so the gate is genuinely exercised, not a pass-through
MAX_PII = 3


def curation_pipeline(docs_ds, min_tokens: int = MIN_TOKENS,
                      max_pii: int = MAX_PII):
    from ..functions import dedup
    from ..functions import text as T
    from ..functions import textclean

    ds = textclean.clean_redact(docs_ds)

    def count_and_gate(batch: pa.Table) -> pa.Table:
        batch = T.token_count_batch(batch, col="clean_text")
        ok = pc.and_(
            pc.greater_equal(batch["n_tokens"], min_tokens),
            pc.less_equal(pc.add(batch["n_emails"], batch["n_ips"]),
                          max_pii))
        return batch.filter(ok)

    ds = ds.map_batches(count_and_gate, batch_format="pyarrow",
                        zero_copy_batch=True)
    ds = dedup.exact_dedup_rows(ds, col="clean_text")
    return ds.select_columns(["doc_id", "clean_text", "n_tokens"])


PRETRAIN_MIN_TOKENS = 20  # post-span-removal floor; drops a real tail


def pretrain_pipeline(docs_ds, min_tokens: int = PRETRAIN_MIN_TOKENS):
    """Second composed pipeline, chaining the corpus-GLOBAL passes the
    way a pretraining dataset build runs them:

        blocklist filter -> exact duplicated-span removal (counts
        computed on the FILTERED corpus — order matters and is part of
        the checked semantics) -> token-count quality gate on the
        span-cleaned text -> deterministic train/val/test split

    One skinny gram-count shuffle (inside span_dedup) is the only
    exchange; everything else is map-side. The SQL twin chains the
    SAME steps as CTEs so the composition itself is value-checked."""
    import pyarrow.compute as _pc

    from ..functions import sampling, spandedup, textclean
    from ..functions import text as T

    ds = textclean.badwords_filter(docs_ds)
    ds = spandedup.span_dedup(ds)

    def gate(batch: pa.Table) -> pa.Table:
        batch = T.token_count_batch(batch, col="clean_text")
        return batch.filter(
            _pc.greater_equal(batch["n_tokens"], min_tokens))

    ds = ds.map_batches(gate, batch_format="pyarrow", zero_copy_batch=True)
    ds = sampling.split_assign(ds)
    return ds.select_columns(
        ["doc_id", "clean_text", "n_tokens", "split"])


def pretrain_pipeline_sql(table: str = "documents",
                          min_tokens: int = PRETRAIN_MIN_TOKENS) -> str:
    from ..functions.sampling import split_assign_sql
    from ..functions.spandedup import span_dedup_sql
    from ..functions.textclean import badwords_filter_sql

    return rf"""
WITH kept AS ({badwords_filter_sql(table=table)}),
spanned AS ({span_dedup_sql(table="kept")}),
gated AS (
  SELECT * FROM (
    SELECT doc_id, clean_text,
           length(regexp_extract_all(clean_text, '\w+'))::BIGINT
               AS n_tokens
    FROM spanned)
  WHERE n_tokens >= {min_tokens}
)
SELECT doc_id, clean_text, n_tokens, split
FROM ({split_assign_sql(table="gated")})
"""


SELECT_TOP_PCT = 25


def selection_pipeline(docs_ds, top_pct: int = SELECT_TOP_PCT):
    """Third composed pipeline — target-conditioned DATA SELECTION the
    way a DSIR-style pretraining build runs it:

        blocklist filter -> DSIR importance scores (both multinomial
        models fit on the FILTERED corpus — ordering is part of the
        checked semantics) -> keep the exact top p% by
        (dsir_logratio DESC, doc_id) -> train/val/test split

    The score fits move only skinny (bucket, count) partials; the
    selection is Ray's range-partition sort over the skinny
    (doc_id, score) projection + a streaming limit (the quality_prune
    pattern); split assignment is map-side. Selection determinism note:
    Ray and SQL scores agree to ~1e-13, so the p%-boundary doc is
    stable unless two docs' scores collide at that precision."""
    import math

    from ..functions import dsir, sampling, textclean

    ds = textclean.badwords_filter(docs_ds)
    n = ds.count()
    k = max(1, math.ceil(n * top_pct / 100))
    scored = dsir.dsir_scores(ds).select_columns(
        ["doc_id", "dsir_logratio"])
    sel = scored.sort(["dsir_logratio", "doc_id"],
                      descending=[True, False]).limit(k)
    return sampling.split_assign(sel).select_columns(
        ["doc_id", "dsir_logratio", "split"])


def selection_pipeline_sql(table: str = "documents",
                           top_pct: int = SELECT_TOP_PCT) -> str:
    from ..functions.dsir import dsir_scores_sql
    from ..functions.sampling import split_assign_sql
    from ..functions.textclean import badwords_filter_sql

    return rf"""
WITH kept AS ({badwords_filter_sql(table=table)}),
scored AS ({dsir_scores_sql(table="kept")}),
c AS (SELECT count(*) AS n FROM kept),
sel AS (
  SELECT doc_id, dsir_logratio FROM scored, c
  QUALIFY row_number() OVER (ORDER BY dsir_logratio DESC, doc_id)
          <= CAST(ceil(n * {top_pct} / 100.0) AS BIGINT)
)
SELECT doc_id, dsir_logratio, split
FROM ({split_assign_sql(table="sel")})
"""


def curation_pipeline_sql(table: str = "documents",
                          min_tokens: int = MIN_TOKENS,
                          max_pii: int = MAX_PII) -> str:
    from ..functions.textclean import clean_redact_sql

    return rf"""
WITH cleaned AS ({clean_redact_sql(table)}),
counted AS (
  SELECT *, length(regexp_extract_all(clean_text, '\w+'))::BIGINT
      AS n_tokens
  FROM cleaned
),
kept AS (
  SELECT * FROM counted
  WHERE n_tokens >= {min_tokens} AND n_emails + n_ips <= {max_pii}
)
SELECT doc_id, clean_text, n_tokens FROM kept
WHERE doc_id IN (SELECT min(doc_id) FROM kept GROUP BY md5(clean_text))
"""
