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
``bucket = hash(conv_id) % B`` and run ONE vectorized numpy/pandas
segmentation per bucket (groupby("bucket").map_groups). The head-regex
evaluation happened upstream in the acceptor stage (RE2, vectorized),
so this stage is pure integer/string-join work. B is chosen ~2-4x the
core count; a hot conv_id lands in one bucket but the work inside a
bucket is vectorized, so skew costs are bounded by the join itself
(documented partitioning assumption: all rows of one conv_id must
co-locate in one bucket — that is what makes segmentation exact).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..config import ConcatCfg, PipelineConfig

PASSTHROUGH_COLS = ["conv_id", "turn_idx", "role", "tool", "ts", "tag", "text"]
OUT_COLS = PASSTHROUGH_COLS + ["n_merged", "merged_turns"]


def add_bucket(batch: pa.Table, num_buckets: int) -> pa.Table:
    """Deterministic hash partition key on conv_id (siphash via pandas,
    stable across processes — unlike Python's str hash)."""
    conv = batch["conv_id"].to_numpy(zero_copy_only=False)
    h = pd.util.hash_array(conv) % np.uint64(num_buckets)
    return batch.append_column("bucket", pa.array(h.astype(np.int32)))


def _segmented_shift_or(seg_start: np.ndarray, flag: np.ndarray) -> np.ndarray:
    """For each row, True iff any earlier row in the SAME segment had
    ``flag`` set (cumulative-or shifted by one, reset at seg_start)."""
    n = len(flag)
    if n == 0:
        return flag
    prev = np.zeros(n, dtype=bool)
    prev[1:] = flag[:-1]
    prev[seg_start] = False
    # count of prev-True up to i, minus the count at the segment start
    c = np.cumsum(prev)
    seg_first_idx = np.maximum.accumulate(np.where(seg_start, np.arange(n), 0))
    base = c[seg_first_idx] - prev[seg_first_idx]
    return (c - base) > 0


def _concat_one_tag(df: pd.DataFrame, ccfg: ConcatCfg) -> pd.DataFrame:
    """Vectorized segmentation of one tag's rows inside one bucket."""
    df = df.sort_values(["conv_id", "turn_idx"], kind="mergesort")
    n = len(df)
    is_head = df["is_head"].to_numpy()
    conv = df["conv_id"].to_numpy()
    new_group = np.ones(n, dtype=bool)
    new_group[1:] = conv[1:] != conv[:-1]

    # rows before the first head of their conv are singletons
    head_cnt = np.cumsum(is_head)
    grp_first = np.maximum.accumulate(np.where(new_group, np.arange(n), 0))
    head_cnt_in_grp = head_cnt - (head_cnt[grp_first] - is_head[grp_first])
    prehead = head_cnt_in_grp == 0

    seg_start = new_group | is_head | prehead

    # overflow: within a head-started segment, once cumulative joined
    # length exceeds max_length (checked after each append), later rows
    # are singletons (concator_f.go:197-202)
    tlen = df["text"].str.len().to_numpy(dtype=np.int64)
    jlen = len(ccfg.joiner)
    add_len = tlen + jlen
    c = np.cumsum(add_len)
    seg_first = np.maximum.accumulate(np.where(seg_start, np.arange(n), 0))
    pos_ge1 = np.arange(n) != seg_first
    cum = np.where(pos_ge1, c - c[seg_first] + tlen[seg_first], tlen[seg_first])
    overflowed = (cum > ccfg.max_length) & pos_ge1
    after_overflow = _segmented_shift_or(seg_start, overflowed)
    seg_start = seg_start | after_overflow

    seg_id = np.cumsum(seg_start)
    heads = df[seg_start].copy()
    sizes = np.bincount(seg_id)[1:]
    if (sizes > 1).any():
        text = df["text"].reset_index(drop=True)
        joined = text.groupby(seg_id).agg(ccfg.joiner.join)
        heads["text"] = joined.to_numpy()
        turns = df["turn_idx"].reset_index(drop=True)
        heads["merged_turns"] = turns.groupby(seg_id).agg(list).to_numpy()
        heads["n_merged"] = sizes.astype(np.int32)
    else:
        heads["merged_turns"] = [[t] for t in heads["turn_idx"]]
        heads["n_merged"] = np.int32(1)
    return heads[OUT_COLS]


def concat_bucket(df: pd.DataFrame, cfg: PipelineConfig) -> pd.DataFrame:
    """map_groups fn for one bucket: pass non-concat tags through,
    segment each concat-enabled tag."""
    parts = []
    passthrough = df[~df["concat_on"]]
    if len(passthrough):
        p = passthrough[PASSTHROUGH_COLS].copy()
        p["n_merged"] = np.int32(1)
        p["merged_turns"] = [[t] for t in p["turn_idx"]]
        parts.append(p)
    for t, ccfg in cfg.concat.items():
        sub = df[df["tag"] == t]
        if len(sub):
            parts.append(_concat_one_tag(sub, ccfg))
    if not parts:
        return pd.DataFrame({c: [] for c in OUT_COLS})
    return pd.concat(parts, ignore_index=True)
