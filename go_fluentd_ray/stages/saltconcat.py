"""Head-boundary salting for pathologically hot conversations.

The concat shuffle (stages/concat.py) co-locates every row of one
conv_id in one bucket — correct and, up to ~20%-of-corpus skew, fast
(the in-bucket kernel is one vectorized lexsort; tools/skew_bench.py
measured 1.32x = the row-imbalance bound). But a conversation so large
that its rows exceed ONE WORKER'S MEMORY breaks that plan: the bucket
block cannot be built at all. This module is the documented escalation
(SURVEY.md §4 "million-turn conversation"; reference analogue: the
concator's per-identifier pending buffer, tagfilters/concator_f.go:151-206,
which caps memory by flushing at MaxLen but still serializes one
identifier on one goroutine).

Why salting at ARBITRARY row boundaries is wrong: segmentation state
(pending record, overflow) crosses rows, so a naive ``salt = turn_idx
// S`` can split a logical record across salt groups and change output.
The exact property we exploit instead: a row whose ``is_head`` is true
ALWAYS starts a new segment (concat.py seg_start |= is_head), and no
segmentation state survives across a head. Therefore any partition of a
(conv_id, tag) stream whose cut points are HEAD rows yields exactly the
same segments as the unsalted stream — including the pre-first-head
singleton rule (salt group 0 keeps the stream prefix) and the MaxLen
overflow rule (overflow state is confined to one segment, and a segment
is never cut).

Cost model (and why this is opt-in, not default): finding head-aligned
cut points requires evaluating the head regex on the hot conversations'
rows BEFORE the main pipeline runs — one extra scan restricted to hot
rows (parquet row-group predicate pushdown on conv_id; corpora written
conv-contiguously, like ours and any log shipper's, prune almost all of
it). Everything exchanged is skinny: per-(conv, tag) count/min/max
partials, then per-candidate min-head-turn partials; the driver holds
only #hot_convs x #tags x k_salts integers.

    detect_hot_convs(path)      one conv_id-column scan, partial counts
    head_boundaries(...)        one hot-row scan -> cut turn_idx arrays
    add_bucket_salted(...)      drop-in replacement for concat.add_bucket
    build_pipeline_salted(...)  flagship pipeline with the salted bucket
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..config import DEFAULT_CONFIG, PipelineConfig

# golden-ratio odd constant (Knuth multiplicative hashing) — mixes the
# salt into the conv hash without correlating adjacent salts to
# adjacent buckets
_SALT_MIX = np.uint64(0x9E3779B97F4A7C15)


# --------------------------------------------------------------------------
# pass 1: hot-key detection (conv_id column only)
# --------------------------------------------------------------------------

def detect_hot_convs(path: str, hot_frac: float = 0.05,
                     batch_frac: float = 0.005) -> dict[str, int]:
    """conv_ids holding >= ``hot_frac`` of all rows, with their counts.

    Per-batch partial counts keep only conv_ids with an in-batch share
    >= ``batch_frac`` — the exchange stays tiny no matter how many
    distinct conversations exist. A conv at >=5% of the corpus cannot
    hide below 0.5% of every batch it touches (rows are written
    conv-contiguously), so the census is exact for actual hot keys;
    a missed borderline key costs only the unsalted (still correct)
    path. Detection is a heuristic; OUTPUT correctness never depends
    on which convs get salted.
    """
    import ray.data as rd

    def partial(batch: pa.Table) -> pa.Table:
        conv = batch["conv_id"].to_numpy(zero_copy_only=False)
        uniq, counts = np.unique(conv, return_counts=True)
        keep = counts >= max(2, int(len(conv) * batch_frac))
        return pa.table({"conv_id": pa.array(uniq[keep], type=pa.string()),
                         "n": pa.array(counts[keep], type=pa.int64())})

    ds = rd.read_parquet(path, columns=["conv_id"])
    total = ds.count()  # metadata-only for parquet
    if not total:
        return {}
    parts = (ds.map_batches(partial, batch_format="pyarrow",
                            zero_copy_batch=True)
             .groupby("conv_id").sum("n"))
    out: dict[str, int] = {}
    thresh = int(total * hot_frac)
    for row in parts.take_all():  # bounded: only batch-dominant convs
        if row["sum(n)"] >= thresh:
            out[row["conv_id"]] = int(row["sum(n)"])
    return out


# --------------------------------------------------------------------------
# pass 2: head-aligned cut points for the hot conversations
# --------------------------------------------------------------------------

def head_boundaries(path: str, hot_convs: dict[str, int],
                    cfg: PipelineConfig = DEFAULT_CONFIG,
                    target_rows_per_salt: int = 250_000,
                    ) -> dict[tuple[str, str], np.ndarray]:
    """Exact head-row cut points per (conv_id, tag) for each hot conv.

    Two skinny aggregates over ONLY the hot conversations' rows (the
    read carries a conv_id predicate for row-group pushdown):

      A. per (conv, tag): row count + turn_idx min/max  ->  k-1 evenly
         spaced candidate positions in turn space, k = ceil(n/target)
      B. per candidate: the first head row AT/AFTER it — a per-batch
         ``min(turn | is_head & turn >= cand)`` partial, min-reduced

    Every returned cut point is the turn_idx of a real head row of that
    (conv, tag) stream, so cutting there provably preserves segments.
    """
    import ray.data as rd

    from ..stages.acceptor import acceptor_transform

    if not hot_convs:
        return {}
    hot = sorted(hot_convs)
    hot_set = pa.array(hot, type=pa.string())
    flt = pc.field("conv_id").isin(hot_set)

    def skinny(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.is_in(batch["conv_id"], value_set=hot_set))
        if batch.num_rows == 0:
            return pa.table({"conv_id": pa.array([], pa.string()),
                             "tag": pa.array([], pa.string()),
                             "turn_idx": pa.array([], pa.int64()),
                             "is_head": pa.array([], pa.bool_())})
        t = acceptor_transform(batch, cfg)
        return pa.table({"conv_id": t["conv_id"],
                         "tag": t["tag"],
                         "turn_idx": pc.cast(t["turn_idx"], pa.int64()),
                         "is_head": t["is_head"]})

    def read_hot():
        return rd.read_parquet(
            path, columns=["conv_id", "turn_idx", "ts", "tool", "text"],
            filter=flt,
        ).map_batches(skinny, batch_format="pyarrow", zero_copy_batch=True)

    # ---- A: per-(conv, tag) extent ---------------------------------------
    def extent_partial(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"conv_id": pd.Series(dtype=object),
                                 "tag": pd.Series(dtype=object),
                                 "n": pd.Series(dtype=np.int64),
                                 "lo": pd.Series(dtype=np.int64),
                                 "hi": pd.Series(dtype=np.int64)})
        g = df.groupby(["conv_id", "tag"], sort=False)["turn_idx"]
        out = g.agg(n="size", lo="min", hi="max").reset_index()
        return out

    ext = (read_hot().map_batches(extent_partial, batch_format="pandas")
           .groupby(["conv_id", "tag"])
           .aggregate(*_sum_min_max()).take_all())

    # ---- candidate positions ---------------------------------------------
    cands: list[tuple[str, str, int, int]] = []  # (conv, tag, j, pos)
    for row in ext:
        n, lo, hi = row["n"], row["lo"], row["hi"]
        k = int(np.ceil(n / target_rows_per_salt))
        if k <= 1:
            continue
        pos = np.linspace(lo, hi, k + 1)[1:-1]  # k-1 interior points
        for j, p in enumerate(np.unique(np.round(pos).astype(np.int64))):
            cands.append((row["conv_id"], row["tag"], j, int(p)))
    if not cands:
        return {}
    # broadcast-sized: #hot x #tags x k entries
    cand_df = pd.DataFrame(cands, columns=["conv_id", "tag", "j", "pos"])

    # ---- B: first head at/after each candidate ----------------------------
    def first_head_partial(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        if not df.empty:
            heads = df[df["is_head"]]
            for (c, t), g in heads.groupby(["conv_id", "tag"], sort=False):
                sub = cand_df[(cand_df["conv_id"] == c)
                              & (cand_df["tag"] == t)]
                if sub.empty:
                    continue
                turns = np.sort(g["turn_idx"].to_numpy())
                idx = np.searchsorted(turns, sub["pos"].to_numpy(), "left")
                ok = idx < len(turns)
                for j, i in zip(sub["j"].to_numpy()[ok], idx[ok]):
                    rows.append((c, t, int(j), int(turns[i])))
        return pd.DataFrame(rows, columns=["conv_id", "tag", "j", "cut"]) \
            if rows else pd.DataFrame({"conv_id": pd.Series(dtype=object),
                                       "tag": pd.Series(dtype=object),
                                       "j": pd.Series(dtype=np.int64),
                                       "cut": pd.Series(dtype=np.int64)})

    mins = (read_hot().map_batches(first_head_partial, batch_format="pandas")
            .groupby(["conv_id", "tag", "j"]).min("cut").take_all())

    out: dict[tuple[str, str], np.ndarray] = {}
    acc: dict[tuple[str, str], set] = {}
    for row in mins:
        acc.setdefault((row["conv_id"], row["tag"]), set()).add(
            int(row["min(cut)"]))
    for key, cuts in acc.items():
        out[key] = np.array(sorted(cuts), dtype=np.int64)
    return out


def _sum_min_max():
    from ray.data.aggregate import Max, Min, Sum

    return (Sum("n", alias_name="n"), Min("lo", alias_name="lo"),
            Max("hi", alias_name="hi"))


# --------------------------------------------------------------------------
# salted bucket assignment (drop-in for concat.add_bucket)
# --------------------------------------------------------------------------

def add_bucket_salted(batch: pa.Table, num_buckets: int,
                      boundaries: dict[tuple[str, str], np.ndarray],
                      ) -> pa.Table:
    """hash(conv_id) mixed with a head-aligned salt, mod num_buckets.

    Non-hot rows (and hot-conv rows of a tag with no cut points) keep
    exactly concat.add_bucket's assignment. Rows covered by a
    boundaries entry get ``salt = #cuts <= turn_idx`` and a mix of
    (salt, tag) into the conv hash — the tag goes in because
    segmentation is per (tag, conv), so separating one conversation's
    tags across buckets is harmless and spreads a multi-tag hot conv
    over salts x tags buckets instead of just salts. Collisions of two
    salt groups into one bucket are harmless either way (each group
    still starts at a head, so the in-bucket lexsort re-segments
    identically).
    """
    conv = batch["conv_id"].to_numpy(zero_copy_only=False)
    h = pd.util.hash_array(conv)
    if boundaries:
        tag = batch["tag"].to_numpy(zero_copy_only=False)
        turn = batch["turn_idx"].to_numpy(zero_copy_only=False).astype(
            np.int64)
        for (c, t), cuts in boundaries.items():
            m = (conv == c) & (tag == t)
            if m.any():
                salt = np.searchsorted(
                    cuts, turn[m], side="right").astype(np.uint64)
                tmix = pd.util.hash_array(np.array([t], dtype=object))[0]
                h[m] = h[m] ^ ((salt + np.uint64(1)) * _SALT_MIX) ^ tmix
    b = h % np.uint64(num_buckets)
    return batch.append_column("bucket", pa.array(b.astype(np.int32)))


# --------------------------------------------------------------------------
# pipeline assembly
# --------------------------------------------------------------------------

def build_pipeline_salted(path: str, cfg: PipelineConfig = DEFAULT_CONFIG,
                          num_buckets: int | None = None,
                          hot_frac: float = 0.05,
                          target_rows_per_salt: int = 250_000,
                          finisher_mode: str = "actors",
                          boundaries: dict | None = None):
    """Flagship pipeline with hot-conversation salting.

    Output is row-identical to flagship.build_pipeline (pytest asserts
    table equality under the canonical sort); the only change is the
    bucket key. ``boundaries`` short-circuits the two detection passes
    when the caller already computed (or cached) them.
    """
    from ..pipelines import flagship
    from ..stages.acceptor import acceptor_transform
    from ..stages.concat import concat_bucket

    if boundaries is None:
        hot = detect_hot_convs(path, hot_frac=hot_frac)
        boundaries = head_boundaries(
            path, hot, cfg, target_rows_per_salt=target_rows_per_salt)
    B = num_buckets or flagship.default_num_buckets()
    # salted groups of one conv spread over min(k, B) buckets; raise B
    # so a heavily split conversation can use the whole cluster
    if boundaries:
        B = max(B, 2 * (1 + max(len(v) for v in boundaries.values())))

    ds = flagship.read_transcripts(path)
    ds = ds.map_batches(lambda t: acceptor_transform(t, cfg),
                        batch_format="pyarrow", zero_copy_batch=True)
    ds = ds.map_batches(
        lambda t: add_bucket_salted(t, B, boundaries),
        batch_format="pyarrow", zero_copy_batch=True)
    ds = ds.groupby("bucket").map_groups(
        lambda df: concat_bucket(df, cfg), batch_format="pandas")
    if finisher_mode == "tasks":
        return ds.map_batches(flagship._cached_finisher_fn(cfg),
                              batch_format="pyarrow", zero_copy_batch=True)
    conc = max(2, flagship._cluster_cpus() // 2)
    return ds.map_batches(flagship.Finisher, fn_constructor_args=(cfg,),
                          batch_format="pyarrow", zero_copy_batch=True,
                          concurrency=conc)
