"""Enrich stage: AddCfg / template substitution as a stateful actor pool.

Reference semantics (library/add.go:60-147, 182-205): per-tag ordered
list of {field: value} ops; ``None`` deletes the field; string values
interpolate ``%{col}``, ``%{@tag}``, ``%{@lower:col}``, ``%{@upper:col}``
(missing/null source -> empty string).

Ray-Data-first: this is the canonical *stateful actor-pool* stage —
``map_batches(Enricher, concurrency=N, batch_format="pyarrow")``. The
config (the broadcast lookup dict of the north star) is parsed ONCE per
actor in ``__init__`` into compiled template plans; ``__call__`` is pure
vectorized pyarrow (binary_join_element_wise over column refs), no
Python-per-row work.
"""

from __future__ import annotations

import re

import pyarrow as pa
import pyarrow.compute as pc

from ..config import PipelineConfig

_TOKEN = re.compile(r"%\{([^}]+)\}")


def compile_template(value: str):
    """Split an AddCfg value into (kind, payload) segments at config time.

    Supported tokens (ReplaceStrByMsg, library/add.go:14-27, 60-147):
    %{col}, %{@tag}, %{@lower:col}, %{@upper:col}, %{@id} (the row's
    stable id = conv_id-turn_idx analogue of producer.go:257's msgid),
    %{@now} / %{@unix} (the pipeline RUN's timestamp — injected once at
    stage construction so output is deterministic within a run),
    %{@unixof:col} (the ROW's timestamp column as epoch seconds — the
    CustomBigDataFilter rowkey semantic, postfilters/custom_bigdata.go:
    60-70: rowkey = vin + "_" + unix(@timestamp); accepts a timestamp
    column or an ISO-string column, unparsable/missing -> ''), and
    %{@str:N} (a RUN-CONSTANT pseudo-random token: eval_template always
    seeds Random(seed=0), so every actor and row gets the same string —
    the reference's random string made fully reproducible).
    """
    plan = []
    pos = 0
    for m in _TOKEN.finditer(value):
        if m.start() > pos:
            plan.append(("lit", value[pos:m.start()]))
        expr = m.group(1)
        if expr == "@tag":
            plan.append(("tag", None))
        elif expr == "@id":
            plan.append(("id", None))
        elif expr in ("@now", "@unix"):
            plan.append(("now", expr))
        elif expr.startswith("@str:"):
            plan.append(("str", int(expr[5:] or 8)))
        elif expr.startswith("@unixof:"):
            plan.append(("unixof", expr[8:]))
        elif expr.startswith("@lower:"):
            plan.append(("lower", expr[7:]))
        elif expr.startswith("@upper:"):
            plan.append(("upper", expr[7:]))
        else:
            plan.append(("col", expr))
        pos = m.end()
    if pos < len(value):
        plan.append(("lit", value[pos:]))
    return plan


def _col_as_str(batch: pa.Table, name: str, n: int) -> pa.Array | pa.Scalar:
    if name not in batch.column_names:
        return pa.scalar("")
    col = batch[name]
    if not pa.types.is_string(col.type):
        col = pc.cast(col, pa.string())
    return pc.fill_null(col, "")


def eval_template(plan, batch: pa.Table, tag: str,
                  now: "object | None" = None, seed: int = 0):
    import datetime

    n = batch.num_rows
    parts = []
    for kind, payload in plan:
        if kind == "lit":
            parts.append(pa.scalar(payload))
        elif kind == "tag":
            parts.append(pa.scalar(tag))
        elif kind == "id":
            if {"conv_id", "turn_idx"} <= set(batch.column_names):
                parts.append(pc.binary_join_element_wise(
                    _col_as_str(batch, "conv_id", n), "-",
                    _col_as_str(batch, "turn_idx", n), ""))
            else:
                parts.append(pa.scalar(""))
        elif kind == "now":
            t = now or datetime.datetime(2024, 1, 1)
            parts.append(pa.scalar(
                str(int(t.timestamp())) if payload == "@unix"
                else t.strftime("%Y-%m-%dT%H:%M:%SZ")))
        elif kind == "str":
            import string as _string

            rng = __import__("random").Random(seed)
            parts.append(pa.scalar("".join(
                rng.choice(_string.ascii_lowercase) for _ in range(payload))))
        elif kind == "unixof":
            if payload not in batch.column_names:
                parts.append(pa.scalar(""))
            else:
                import numpy as np
                import pandas as pd

                col = batch[payload]
                if pa.types.is_timestamp(col.type):
                    arr = col.to_pandas().to_numpy()
                else:
                    dt = pd.to_datetime(col.to_pandas(), utc=True,
                                        errors="coerce")
                    arr = dt.dt.tz_localize(None).to_numpy()
                mask = pd.isna(arr)
                sec = arr.astype("datetime64[s]").astype(np.int64).astype(str)
                parts.append(pa.array(
                    np.where(mask, "", sec), type=pa.string()))
        elif kind == "col":
            parts.append(_col_as_str(batch, payload, n))
        elif kind == "lower":
            parts.append(pc.utf8_lower(_col_as_str(batch, payload, n)))
        elif kind == "upper":
            parts.append(pc.utf8_upper(_col_as_str(batch, payload, n)))
    if all(isinstance(p, pa.Scalar) for p in parts):
        const = "".join(p.as_py() for p in parts)
        return pa.array([const] * n, type=pa.string())
    if len(parts) == 1:
        return parts[0]
    return pc.binary_join_element_wise(*parts, "")


class Enricher:
    """Actor-pool callable for map_batches (setup once per actor)."""

    def __init__(self, cfg: PipelineConfig):
        self.cfg = cfg
        # tag -> list[(key, plan-or-None)]
        self.plans = {
            tag: [(op.key, None if op.value is None else compile_template(op.value))
                  for op in ops]
            for tag, ops in cfg.adds.items()
        }

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        tags = batch["tag"]
        for tag, ops in self.plans.items():
            mask = pc.equal(tags, tag)
            if not pc.any(mask).as_py():
                continue
            for key, plan in ops:
                existing = (batch[key] if key in batch.column_names
                            else pa.nulls(batch.num_rows, pa.string()))
                if plan is None:  # delete op
                    new = pc.if_else(mask, pa.nulls(batch.num_rows,
                                                    existing.type), existing)
                else:
                    val = eval_template(plan, batch, tag)
                    new = pc.if_else(mask, val, pc.cast(existing, pa.string()))
                if key in batch.column_names:
                    batch = batch.set_column(
                        batch.column_names.index(key), key, new)
                else:
                    batch = batch.append_column(key, new)
        return batch
