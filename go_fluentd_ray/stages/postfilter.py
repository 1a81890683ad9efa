"""Post filters: default truncation + sink routing.

Reference semantics: every string field truncated to max_len
(postfilters/default_f.go:72-83); tag -> sink routing via a broadcast
lookup map (postfilters/es_sender_dispatcher.go:51-73 +
senders/elasticsearch.go:111-132); rows whose tag has no sink mapping
are discarded.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..config import PipelineConfig
from .acceptor import _lookup


def truncate_batch(batch: pa.Table, cfg: PipelineConfig) -> pa.Table:
    if batch.num_rows == 0:
        return batch
    for i, f in enumerate(batch.schema):
        if pa.types.is_string(f.type) or pa.types.is_large_string(f.type):
            col = batch[f.name]
            # cheap pre-check: skip the slice kernel if nothing exceeds
            mx = pc.max(pc.fill_null(pc.utf8_length(col), 0)).as_py()
            if mx is not None and mx > cfg.max_field_len:
                batch = batch.set_column(
                    i, f.name, pc.utf8_slice_codeunits(col, 0, cfg.max_field_len))
    return batch


_MUST_INCLUDE_FIELDS = ("tag", "@timestamp", "msgid")  # const.go:8-17 analogue


def fields_filter_batch(batch: pa.Table,
                        include: tuple[str, ...] | None = None,
                        exclude: tuple[str, ...] | None = None,
                        new_fields: dict[str, str] | None = None) -> pa.Table:
    """FieldsFilter (postfilters/fields.go:54-81): compute ``new_fields``
    from ``${var}`` templates (TemplateWithMap, library/utils.go:87-117 —
    tokens whose column is MISSING stay literal, matching the reference),
    then apply include-list (whitelist + must-include fields) or
    exclude-list projection."""
    for name, template in (new_fields or {}).items():
        parts: list = []
        pos = 0
        import re as _re

        for m in _re.finditer(r"\$\{(\w+)\}", template):
            lit = template[pos:m.start()]
            col = m.group(1)
            if col in batch.column_names:
                if lit:
                    parts.append(pa.scalar(lit))
                c = batch[col]
                if not pa.types.is_string(c.type):
                    c = pc.cast(c, pa.string())
                parts.append(pc.fill_null(c, ""))
            else:
                parts.append(pa.scalar(lit + m.group(0)))  # keep literal
            pos = m.end()
        if pos < len(template):
            parts.append(pa.scalar(template[pos:]))
        if all(isinstance(p, pa.Scalar) for p in parts):
            val = pa.array(["".join(p.as_py() for p in parts)] * batch.num_rows)
        elif len(parts) == 1:
            val = parts[0]
        else:
            val = pc.binary_join_element_wise(*parts, "")
        if name in batch.column_names:
            batch = batch.set_column(batch.column_names.index(name), name, val)
        else:
            batch = batch.append_column(name, val)
    if include:
        keep = [c for c in batch.column_names
                if c in include or c in _MUST_INCLUDE_FIELDS]
        return batch.select(keep)
    if exclude:
        return batch.select([c for c in batch.column_names
                             if c not in exclude])
    return batch


def forward_tag_rewrite_batch(batch: pa.Table, base: str = "forward-wechat",
                              tag_key: str = "orig_tag") -> pa.Table:
    """ForwardTagRewriterFilter (forward_tag_rewriter.go:35-44): recover
    the env from the orig-tag's suffix and rewrite tag = base + '.' + env.
    Rows without a parsable suffix are left unchanged."""
    ex = pc.extract_regex(batch[tag_key], r"\.(?P<env>[^.]+)$")
    if isinstance(ex, pa.ChunkedArray):
        ex = ex.combine_chunks()
    env = pc.struct_field(ex, "env")
    new_tag = pc.binary_join_element_wise(base, ".", pc.fill_null(env, ""), "")
    tag = pc.if_else(pc.is_valid(env), new_tag, batch["tag"])
    return batch.set_column(batch.column_names.index("tag"), "tag", tag)


def route_batch(batch: pa.Table, cfg: PipelineConfig) -> pa.Table:
    if batch.num_rows == 0:
        return batch
    sink = _lookup(batch["tag"], cfg.sink_map)
    batch = batch.set_column(batch.column_names.index("sink"), "sink", sink)
    return batch.filter(pc.is_valid(batch["sink"]))
