"""Grok-style named-group regex parse stage (the reference's workhorse).

Reference semantics (tagfilters/parser_f.go:17-172 + library/utils.go:60-73):
per-tag named-group regex over the (possibly concatenated) text; values
TrimSpace'd; empty groups omitted (-> null); non-matching rows DISCARDED;
``must_include`` group required else discard; timestamp group parsed
(','->'.' decimal fix, parser_f.go:147) and re-emitted as ``@timestamp``
in the new format (parse failure -> discard); optional embedded-JSON
tail of one group lifted into typed columns (failed JSON parse keeps the
raw field, parser_f.go:96-100).

Vectorization: pc.extract_regex (RE2, zero-copy Arrow) per tag-slice of
each batch; time parse via pandas to_datetime (vectorized C — Arrow's
strptime lacks %f); ISO output via np.datetime_as_string. The only
Python-level loop is json.loads over the minority of rows that actually
carry a JSON tail.
"""

from __future__ import annotations

import json

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..config import PipelineConfig
from ..functions.jsonutil import flatten_obj
from ..oracle import OUTPUT_SCHEMA, PARSE_GROUP_COLS

_ISO_DEFAULT = "%Y-%m-%dT%H:%M:%S.%fZ"
_JSON_TAIL_PAT = r"(?s)(?P<j>\{.*\})\s*$"

# columns filled later by enrich/route stages (null placeholders here)
_LATER_COLS = {"sink", "datasource", "rowkey", "level_lower"}


def _nulls(n: int, typ: pa.DataType) -> pa.Array:
    return pa.nulls(n, type=typ)


def parse_batch(batch: pa.Table, cfg: PipelineConfig) -> pa.Table:
    """pyarrow batch in (concat-stage output) -> OUTPUT_SCHEMA batch out.

    If a ``bucket`` partition column is present (resumable-sink mode) it
    is carried through unchanged."""
    schema = OUTPUT_SCHEMA
    if "bucket" in batch.column_names:
        schema = schema.append(pa.field("bucket", pa.int32()))
    out_parts: list[pa.Table] = []
    tags = batch["tag"]
    for tag, pcfg in cfg.parsers.items():
        sub = batch.filter(pc.equal(tags, tag))
        if sub.num_rows == 0:
            continue
        text = sub["text"].combine_chunks() if isinstance(
            sub["text"], pa.ChunkedArray) else sub["text"]
        ex = pc.extract_regex(text, pcfg.pattern)
        if isinstance(ex, pa.ChunkedArray):
            ex = ex.combine_chunks()
        keep = pc.is_valid(ex)          # non-match -> discard
        sub, ex = sub.filter(keep), ex.filter(keep)
        if sub.num_rows == 0:
            continue

        fields: dict[str, pa.Array] = {}
        for name in [f.name for f in ex.type]:
            v = pc.utf8_trim_whitespace(pc.struct_field(ex, name))
            v = pc.if_else(pc.equal(v, ""), pa.nulls(len(v), pa.string()), v)
            fields[name] = v

        if pcfg.must_include:
            keep = pc.is_valid(fields[pcfg.must_include])
            sub = sub.filter(keep)
            fields = {k: v.filter(keep) for k, v in fields.items()}
            if sub.num_rows == 0:
                continue

        # ---- timestamp normalization ----------------------------------
        tv = fields.get(pcfg.time_group)
        if tv is None:
            continue  # config error: treated as all-discard
        fixed = pc.replace_substring(tv, ",", ".")
        parsed = pd.to_datetime(fixed.to_pandas(), format=pcfg.time_format,
                                errors="coerce")
        keep_np = parsed.notna().to_numpy()
        if not keep_np.all():
            keep = pa.array(keep_np)
            sub = sub.filter(keep)
            fields = {k: v.filter(keep) for k, v in fields.items()}
            parsed = parsed[keep_np]
            if sub.num_rows == 0:
                continue
        vals = parsed.to_numpy().astype("datetime64[us]")
        if pcfg.new_time_format == _ISO_DEFAULT:
            iso = pa.array(np.datetime_as_string(vals, unit="us"),
                           type=pa.string())
            at_ts = pc.binary_join_element_wise(iso, "Z", "")
        else:
            at_ts = pa.Array.from_pandas(
                pd.Series(vals).dt.strftime(pcfg.new_time_format))

        # ---- embedded JSON tail ---------------------------------------
        n = sub.num_rows
        json_user = [None] * n
        json_code = [None] * n
        json_extra = [None] * n
        if pcfg.json_group and pcfg.json_group in fields:
            jm = pc.extract_regex(fields[pcfg.json_group], _JSON_TAIL_PAT)
            jarr = pc.struct_field(jm, "j").to_pylist()
            for i, raw in enumerate(jarr):
                if raw is None:
                    continue
                try:
                    obj = json.loads(raw)
                except ValueError:
                    continue  # failed parse keeps raw field
                if not isinstance(obj, dict):
                    continue
                # ALL keys flattened ("__"-joined) into the extra map
                # (FlattenMap parity: parser_f.go:74-109 +
                # library/utils.go:75-85); user/code lifted as typed
                # columns, guarded like the oracle so untrusted payloads
                # (e.g. {"code": "abc"}) can't kill the Ray task
                json_extra[i] = list(flatten_obj(obj).items())
                try:
                    u, c = obj.get("user"), obj.get("code")
                    if u is not None:
                        json_user[i] = str(u)
                    if c is not None:
                        json_code[i] = int(c)
                except (ValueError, TypeError):
                    pass  # non-castable lift keeps the raw field

        # ---- assemble fixed-schema output -----------------------------
        cols: list[pa.Array] = []
        for f in schema:
            nm = f.name
            if nm == "text" and pcfg.is_remove_orig_log:
                cols.append(_nulls(n, f.type))  # parser_f.go remove-orig-log
            elif nm in ("conv_id", "turn_idx", "role", "tool", "ts", "tag",
                        "text", "n_merged", "bucket"):
                cols.append(sub[nm].combine_chunks().cast(f.type))
            elif nm == "merged_turns":
                cols.append(sub[nm].combine_chunks().cast(f.type))
            elif nm == "@timestamp":
                cols.append(at_ts)
            elif nm == "json_user":
                cols.append(pa.array(json_user, type=pa.string()))
            elif nm == "json_code":
                cols.append(pa.array(json_code, type=pa.int64()))
            elif nm == "extra":
                cols.append(pa.array(json_extra, type=f.type))
            elif nm in PARSE_GROUP_COLS:
                cols.append(fields.get(nm, _nulls(n, f.type)))
            elif nm in _LATER_COLS:
                cols.append(_nulls(n, f.type))
            else:
                cols.append(_nulls(n, f.type))
        out_parts.append(pa.Table.from_arrays(cols, schema=schema))

    # tags with no parser config BYPASS the parse stage unchanged
    # (reference: unsupported tags go straight to the out-chan,
    # tagfilters/pipeline.go:88-91) — parse/enrich columns stay null
    known = pa.array(sorted(cfg.parsers), type=pa.string())
    rest = batch.filter(pc.invert(pc.fill_null(
        pc.is_in(tags, value_set=known), False)))
    if rest.num_rows:
        cols = []
        for f in schema:
            nm = f.name
            if nm in ("conv_id", "turn_idx", "role", "tool", "ts", "tag",
                      "text", "n_merged", "merged_turns", "bucket"):
                cols.append(rest[nm].combine_chunks().cast(f.type))
            else:
                cols.append(_nulls(rest.num_rows, f.type))
        out_parts.append(pa.Table.from_arrays(cols, schema=schema))

    if not out_parts:
        return schema.empty_table()
    return pa.concat_tables(out_parts)
