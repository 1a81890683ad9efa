"""Multi-line concatenation — the pipeline's one genuine shuffle.

Reference semantics (tagfilters/concator_f.go:151-206): within a
(tag, conv_id) stream ordered by turn_idx, a line matching the tag's
head regex starts a new logical record; non-head lines append to the
pending record (joined by cfg.joiner); once the pending text length
exceeds max_length the record is flushed and subsequent non-head lines
are emitted individually until the next head; lines arriving before any
head pass through individually.

Ray-Data-first design: instead of groupby(conv_id).map_groups (millions
of tiny per-group Python calls at scale), we hash-partition on
``bucket = hash(conv_id) % B`` and run ONE fully vectorized
segmentation per bucket: integer lexsort + numpy cumulative masks for
segment boundaries, then pyarrow ListArray.from_arrays + pc.binary_join
for the string merge (no per-row Python anywhere). The head-regex
evaluation happened upstream in the acceptor stage (RE2, vectorized).

Partitioning assumption (documented per SURVEY.md §4): all rows of one
conv_id must co-locate in one bucket — that is what makes segmentation
exact. B is chosen ~2-4x total cores so each bucket is a healthy block;
a hot conv_id lands in one bucket but the in-bucket work is vectorized,
so skew costs only the join itself.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..config import PipelineConfig

PASSTHROUGH_COLS = ["conv_id", "turn_idx", "role", "tool", "ts", "tag", "text"]
OUT_COLS = PASSTHROUGH_COLS + ["n_merged", "merged_turns"]

OUT_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("tool", pa.string()),
        ("ts", pa.timestamp("us")),
        ("tag", pa.string()),
        ("text", pa.string()),
        ("n_merged", pa.int32()),
        ("merged_turns", pa.list_(pa.int32())),
    ]
)

_NO_CONCAT_MAXLEN = np.int64(1) << 62


def add_bucket(batch: pa.Table, num_buckets: int) -> pa.Table:
    """Deterministic hash partition key on conv_id (siphash via pandas,
    stable across processes — unlike Python's str hash)."""
    conv = batch["conv_id"].to_numpy(zero_copy_only=False)
    h = pd.util.hash_array(conv) % np.uint64(num_buckets)
    return batch.append_column("bucket", pa.array(h.astype(np.int32)))


def concat_bucket(df: pd.DataFrame, cfg: PipelineConfig,
                  keep_bucket: bool = False) -> pa.Table:
    """map_groups fn for one bucket (pandas in, Arrow out, vectorized).

    keep_bucket=True carries the bucket id through as a column — used by
    the resumable sink layout (stages/sinks.py) as the partition key."""
    n = len(df)
    schema = OUT_SCHEMA
    if keep_bucket:
        schema = schema.append(pa.field("bucket", pa.int32()))
    if n == 0:
        return schema.empty_table()

    tag_codes, tag_uniq = pd.factorize(df["tag"])
    conv_codes, conv_uniq = pd.factorize(df["conv_id"])
    turn = df["turn_idx"].to_numpy()
    order = np.lexsort((turn, conv_codes, tag_codes))

    tag_codes = tag_codes[order]
    conv_codes = conv_codes[order]
    turn = turn[order].astype(np.int32)
    is_head = df["is_head"].to_numpy()[order]
    tlen = df["text"].str.len().to_numpy(dtype=np.int64)[order]
    text = pa.array(df["text"].to_numpy()[order], type=pa.string())

    idx = np.arange(n)
    new_group = np.ones(n, dtype=bool)
    new_group[1:] = (tag_codes[1:] != tag_codes[:-1]) | (
        conv_codes[1:] != conv_codes[:-1])

    # rows before the first head of their (tag, conv) group are singletons
    hc = np.cumsum(is_head)
    grp_first = np.maximum.accumulate(np.where(new_group, idx, 0))
    hc_in_grp = hc - (hc[grp_first] - is_head[grp_first])
    prehead = hc_in_grp == 0
    seg_start = new_group | is_head | prehead

    # overflow: the reference checks the pending CONTENT length (no
    # joiner bytes counted) after each append and flushes at >= MaxLen
    # (concator_f.go:196-201; the '\n' append there is commented out,
    # so MaxLen counts message bytes only); later rows are singletons
    maxlen = np.fromiter(
        ((cfg.concat[t].max_length if t in cfg.concat else _NO_CONCAT_MAXLEN)
         for t in tag_uniq), dtype=np.int64, count=len(tag_uniq))[tag_codes]
    c = np.cumsum(tlen)
    seg_first = np.maximum.accumulate(np.where(seg_start, idx, 0))
    pos_ge1 = idx != seg_first
    cum = np.where(pos_ge1, c - c[seg_first] + tlen[seg_first], tlen[seg_first])
    overflowed = (cum >= maxlen) & pos_ge1
    # True iff any STRICTLY EARLIER row in the same segment overflowed
    prev = np.zeros(n, dtype=bool)
    prev[1:] = overflowed[:-1]
    prev[seg_start] = False
    cp = np.cumsum(prev)
    base = cp[seg_first] - prev[seg_first]
    after_overflow = (cp - base) > 0
    seg_start = seg_start | after_overflow

    # ---- build output (one row per segment), all-Arrow ------------------
    offsets = np.flatnonzero(seg_start).astype(np.int32)
    bounds = np.append(offsets, np.int32(n))
    n_merged = np.diff(bounds).astype(np.int32)
    off_arr = pa.array(bounds, type=pa.int32())

    # per-tag joiners (ConcatorFactCfg is per-tag config): the lexsort
    # puts each tag's rows -- and therefore its segments -- in one
    # contiguous run, so join each tag-slice with its own joiner and
    # concatenate the per-tag results in run order
    joiners = np.array(
        [(cfg.concat[t].joiner if t in cfg.concat else "\n")
         for t in tag_uniq], dtype=object)
    seg_tag = tag_codes[offsets]
    uniq_joiners = set(joiners.tolist())
    if len(uniq_joiners) <= 1:
        joined = pc.binary_join(
            pa.ListArray.from_arrays(off_arr, text),
            uniq_joiners.pop() if uniq_joiners else "\n")
    else:
        parts = []
        s = 0
        while s < len(seg_tag):
            e = s
            while e < len(seg_tag) and seg_tag[e] == seg_tag[s]:
                e += 1
            row_lo = int(bounds[s])
            sub_off = pa.array(
                (bounds[s:e + 1] - row_lo).astype(np.int32), type=pa.int32())
            sub_txt = text.slice(row_lo, int(bounds[e]) - row_lo)
            parts.append(pc.binary_join(
                pa.ListArray.from_arrays(sub_off, sub_txt),
                str(joiners[seg_tag[s]])))
            s = e
        joined = pa.concat_arrays(parts)
    merged_turns = pa.ListArray.from_arrays(
        off_arr, pa.array(turn, type=pa.int32()))

    head_orig = order[offsets]  # indices into the original df
    conv_out = pa.array(pd.Series(conv_uniq).to_numpy()[conv_codes[offsets]],
                        type=pa.string())
    tag_out = pa.array(pd.Series(tag_uniq).to_numpy()[tag_codes[offsets]],
                       type=pa.string())
    role = pa.array(df["role"].to_numpy()[head_orig], type=pa.string())
    tool = pa.array(df["tool"].to_numpy()[head_orig], type=pa.string())
    ts = pa.Array.from_pandas(df["ts"].iloc[head_orig]).cast(pa.timestamp("us"))

    cols = [conv_out, pa.array(turn[offsets], type=pa.int32()), role, tool,
            ts, tag_out, joined, pa.array(n_merged, type=pa.int32()),
            merged_turns]
    if keep_bucket:
        b = np.int32(df["bucket"].iloc[0]) if "bucket" in df.columns else -1
        cols.append(pa.array(np.full(len(offsets), b, dtype=np.int32)))
    return pa.Table.from_arrays(cols, schema=schema)
