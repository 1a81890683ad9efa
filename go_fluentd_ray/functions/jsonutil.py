"""Nested-JSON flattening — FlattenMap parity (library/utils.go:75-85,
called at parser_f.go:109 and http.go:206): nested keys are joined to
top level with a ``__`` delimiter because downstream stores dislike
nesting (settings.yml:770-772).

With a fixed Arrow schema, arbitrary parsed keys live in ONE
``extra: map<string,string>`` column (SURVEY.md §7.4 "dynamic fields")
instead of exploding the schema; known keys are lifted to real columns
by the parse stage.
"""

from __future__ import annotations

import json

import pyarrow as pa

EXTRA_TYPE = pa.map_(pa.string(), pa.string())


def flatten_obj(obj: dict, joiner: str = "__") -> "dict[str, str | None]":
    """Pure-Python FlattenMap: {'a': {'b': {'c': 1}}, 'd': 2} ->
    {'a__b__c': '1', 'd': '2'}. Value stringification matches DuckDB's
    json_extract_string so the SQL oracle agrees: true/false lowercase,
    JSON null -> null map value (not 'None'), arrays as compact
    non-ASCII-preserving JSON text. Known divergence: integers beyond
    uint64 render inconsistently in DuckDB itself (double text for some
    magnitudes) and are kept exact here."""
    out: dict[str, str | None] = {}

    def scalar(o) -> "str | None":
        if o is None:
            return None
        if isinstance(o, bool):
            return "true" if o else "false"
        if isinstance(o, list):
            return json.dumps(o, separators=(",", ":"), ensure_ascii=False)
        return str(o)

    def walk(prefix: str, o) -> None:
        if isinstance(o, dict):
            for k, v in o.items():
                walk(f"{prefix}{joiner}{k}" if prefix else str(k), v)
        else:
            out[prefix] = scalar(o)

    walk("", obj)
    return out


def flatten_json_batch(batch: pa.Table, col: str,
                       out_col: str = "extra",
                       joiner: str = "__") -> pa.Table:
    """Parse a JSON-string column and emit the flattened key/value pairs
    as a map<string,string> column. Invalid JSON -> null entry (the
    reference keeps the raw field; the raw column is untouched here)."""
    rows = []
    for raw in batch[col].to_pylist():
        if raw is None:
            rows.append(None)
            continue
        try:
            obj = json.loads(raw)
        except ValueError:
            rows.append(None)
            continue
        if not isinstance(obj, dict):
            rows.append(None)
            continue
        rows.append(list(flatten_obj(obj, joiner).items()))
    return batch.append_column(out_col, pa.array(rows, type=EXTRA_TYPE))
