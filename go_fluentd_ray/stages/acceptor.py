"""Acceptor stage: window filter -> ingress tag -> spark ignore ->
spring first-match retag -> accept whitelist -> concat-head precompute.

Fully vectorized over zero-copy Arrow batches (pyarrow.compute only; no
Python-per-row work). One ``map_batches(fn, batch_format="pyarrow")``
call covers what the reference spreads over recvs + acceptorfilters
(reference: recvs/http.go:133-150 window; acceptorfilters/spark_f.go:44-68;
spring_f.go:79-107 first-match-wins retag — the re-enter loop collapses
to a single pass in batch mode; default_f.go:64-79 whitelist).

The ``is_head`` / ``concat_on`` columns are precomputed here (RE2 via
pc.match_substring_regex) so the shuffle-side concat stage needs no
regex work at all.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..config import PipelineConfig


def _lookup(values: pa.ChunkedArray | pa.Array, mapping: dict[str, str],
            default: str | None = None) -> pa.Array:
    """Vectorized small-dict lookup: index_in + take (broadcast join)."""
    keys = pa.array(list(mapping.keys()), type=pa.string())
    out_vals = list(mapping.values())
    idx = pc.index_in(values, value_set=keys)
    out = pc.take(pa.array(out_vals, type=pa.string()), idx)
    if default is not None:
        out = pc.fill_null(out, default)
    return out


def acceptor_transform(batch: pa.Table, cfg: PipelineConfig,
                       counts: dict | None = None,
                       precompute_heads: bool = True) -> pa.Table:
    """When ``counts`` is given, per-reason discard counters (window /
    spark_ignore / unknown_tag) are accumulated into it — the single
    source of truth the /monitor query (pipelines/monitoring.py) uses,
    so filter semantics can never desynchronize from the counters.
    ``precompute_heads=False`` skips the concat head-regex scans and
    output-column appends for counts-only callers (the scans are the
    expensive part and unused there)."""
    def _note(reason: str, n: int) -> None:
        if counts is not None and n:
            counts[reason] = counts.get(reason, 0) + int(n)

    # ---- allowed-lateness window (inclusive) ------------------------------
    lo = pa.scalar(cfg.window_min_ts).cast(pa.timestamp("us"))
    hi = pa.scalar(cfg.window_max_ts).cast(pa.timestamp("us"))
    keep = pc.and_(pc.greater_equal(batch["ts"], lo), pc.less_equal(batch["ts"], hi))
    n0 = batch.num_rows
    batch = batch.filter(keep)
    _note("window", n0 - batch.num_rows)
    if batch.num_rows == 0:
        return _empty_like(batch)

    text = batch["text"]

    # ---- ingress tag from the tool column (recv tag assignment) -----------
    tag = _lookup(batch["tool"], cfg.ingress_tags)

    # ---- spark ignore filter ----------------------------------------------
    is_spark = pc.equal(tag, cfg.spark_tag)
    drop = pc.and_(is_spark, pc.match_substring_regex(text, cfg.spark_ignore_regex))
    keep = pc.fill_null(pc.invert(drop), True)
    n0 = batch.num_rows
    batch, tag, text = batch.filter(keep), tag.filter(keep), text.filter(keep)
    _note("spark_ignore", n0 - batch.num_rows)

    # ---- spring retag: first matching rule wins ---------------------------
    unassigned = pc.equal(tag, cfg.spring_tag)
    for rule in cfg.retag_rules:
        if rule.regex == ".*":
            m = unassigned  # catch-all, skip the regex scan
        else:
            m = pc.and_(unassigned, pc.match_substring_regex(text, rule.regex))
        tag = pc.if_else(m, rule.new_tag, tag)
        unassigned = pc.and_(unassigned, pc.invert(m))

    # ---- accept whitelist --------------------------------------------------
    keep = pc.is_in(tag, value_set=pa.array(sorted(cfg.accept_tags), type=pa.string()))
    n0 = batch.num_rows
    batch, tag, text = batch.filter(keep), tag.filter(keep), text.filter(keep)
    _note("unknown_tag", n0 - batch.num_rows)

    if not precompute_heads:
        return batch.append_column("tag", tag)

    # ---- precompute concat controls ---------------------------------------
    concat_tags = sorted(cfg.concat)
    concat_on = pc.is_in(tag, value_set=pa.array(concat_tags, type=pa.string()))
    # head regexes per concat tag; tags sharing a pattern share ONE regex
    # pass (the scan over text dominates). Non-concat rows: is_head=True.
    is_head = pa.array([True] * len(batch), type=pa.bool_())
    head_cache: dict[str, object] = {}
    for t in concat_tags:
        m_tag = pc.equal(tag, t)
        pat = cfg.concat[t].head_regex
        if pat not in head_cache:
            head_cache[pat] = pc.match_substring_regex(text, pat)
        is_head = pc.if_else(m_tag, head_cache[pat], is_head)

    batch = batch.append_column("tag", tag)
    batch = batch.append_column("concat_on", concat_on)
    batch = batch.append_column("is_head", is_head)
    return batch


def _empty_like(batch: pa.Table) -> pa.Table:
    t = batch
    for name, typ in (("tag", pa.string()), ("concat_on", pa.bool_()),
                      ("is_head", pa.bool_())):
        t = t.append_column(name, pa.array([], type=typ))
    return t
