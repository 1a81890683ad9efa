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
