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


def route_batch(batch: pa.Table, cfg: PipelineConfig) -> pa.Table:
    if batch.num_rows == 0:
        return batch
    sink = _lookup(batch["tag"], cfg.sink_map)
    batch = batch.set_column(batch.column_names.index("sink"), "sink", sink)
    return batch.filter(pc.is_valid(batch["sink"]))
