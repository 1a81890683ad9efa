"""go_fluentd_ray — a Ray-Data-native log/transcript processing engine.

A from-scratch rewrite of the *capabilities* of Laisky/go-fluentd
(reference at /root/reference, see SURVEY.md) on idiomatic Ray Data:
window filter -> retag/route -> multi-line concat -> grok/regex parse
-> enrich -> post-filter -> per-sink fan-out + aggregates, plus the
training-data operators a 100 TB pipeline needs (dedup, similarity
search, text analysis, multimodal plumbing).

No module in this package calls ray.init()/ray.shutdown(); sessions are
owned by bench.py / tests / the driver.
"""

__version__ = "0.1.0"

import logging as _logging


class _EmptyBundleSchemaFilter(_logging.Filter):
    """Drop ONLY the benign 'RefBundle with a different schema …
    new schema: <empty>' warnings.

    When a map/sort task's output is empty, Ray emits a bundle whose
    schema is empty even though the producing UDF returned a typed
    ``schema.empty_table()`` (ray.data block.py:_is_empty_schema — an
    empty pyarrow schema is treated as no schema). Every partial-
    aggregation stage here (rate_anomaly's bucket_score, leakage's
    distinct_grams, tool_latency_pct, …) legitimately produces empty
    partials on filtered-out buckets, so the warning is pure noise —
    but a GENUINE divergence (two non-empty schemas differing) still
    warns: the filter matches only the empty-new-schema form."""

    def filter(self, record: _logging.LogRecord) -> bool:
        msg = record.getMessage()
        if "RefBundle with a different schema" not in msg:
            return True
        # empty-arrow ("new schema: .") and empty-pandas forms
        return not (
            "new schema: . " in msg
            or "new schema: PandasBlockSchema(names=[], types=[])" in msg)


_logging.getLogger(
    "ray.data._internal.execution.streaming_executor_state"
).addFilter(_EmptyBundleSchemaFilter())


class _SchemaHashFilter(_logging.Filter):
    """Drop Ray's 'Failed to hash the schemas (for deduplication)'
    warning: pandas-origin blocks carry dict-valued schema metadata
    that defeats Ray's schema-dedup OPTIMIZATION (transform_pyarrow.py
    unify_schemas) — the unify itself still succeeds, so the message
    is noise on every map_groups(pandas) sort/reduce."""

    def filter(self, record: _logging.LogRecord) -> bool:
        return ("Failed to hash the schemas (for deduplication)"
                not in record.getMessage())


_logging.getLogger(
    "ray.data._internal.arrow_ops.transform_pyarrow"
).addFilter(_SchemaHashFilter())
