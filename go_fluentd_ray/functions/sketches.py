"""Mergeable sketches — the guide's 'emit one serialized sketch per
batch and merge them in a second, tiny stage' pattern, for aggregates
whose exact form would shuffle every row at 100 TB.

HyperLogLog (public algorithm: Flajolet et al. 2007, with the standard
small-range linear-counting correction): per-batch partials are one
4096-register uint8 array each; register-wise max is the merge, so the
shuffle moves ~4 KB per batch instead of one row per distinct value.
Typical error ~1.04/sqrt(4096) ≈ 1.6%. The exact companions
(`aggregates.distinct_users`, groupby counts) stay the oracle-checked
truth at test scale; the sketch is the 100 TB route.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

HLL_P = 12                 # 2^12 = 4096 registers
HLL_M = 1 << HLL_P
_ALPHA = 0.7213 / (1 + 1.079 / HLL_M)


def _hash64(values) -> np.ndarray:
    """Deterministic 64-bit hashes of arbitrary values (stringified) —
    stable across processes (blake2b, not python hash)."""
    return np.array(
        [int.from_bytes(hashlib.blake2b(str(v).encode(), digest_size=8)
                        .digest(), "little") for v in values],
        dtype=np.uint64)


def hll_registers(values) -> np.ndarray:
    """One HLL register array from a batch of values (vectorized)."""
    regs = np.zeros(HLL_M, dtype=np.uint8)
    if len(values) == 0:
        return regs
    h = _hash64(values)
    idx = (h >> np.uint64(64 - HLL_P)).astype(np.int64)
    rest = (h << np.uint64(HLL_P)) | np.uint64((1 << HLL_P) - 1)
    # rank = leading zeros of the remaining bits + 1, via bit length
    lz = np.zeros(len(h), dtype=np.uint8)
    v = rest.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        mask = v < (np.uint64(1) << np.uint64(64 - shift))
        lz[mask] += shift
        v[mask] = v[mask] << np.uint64(shift)
    rank = lz + 1
    np.maximum.at(regs, idx, rank)
    return regs


def hll_estimate(regs: np.ndarray) -> float:
    """Standard HLL estimator with the small-range correction."""
    est = _ALPHA * HLL_M * HLL_M / np.sum(np.exp2(-regs.astype(np.float64)))
    zeros = int(np.count_nonzero(regs == 0))
    if est <= 2.5 * HLL_M and zeros:
        est = HLL_M * np.log(HLL_M / zeros)  # linear counting
    return float(est)


def approx_distinct(ds, col: str):
    """Approximate COUNT(DISTINCT col): one sketch per batch, one tiny
    register-wise-max merge. Returns a 1-row Dataset
    (approx_distinct: int64)."""

    def partial(batch: pa.Table) -> pa.Table:
        regs = hll_registers(batch[col].to_pylist())
        return pa.table({"regs": pa.array([regs.tobytes()], pa.binary())})

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        acc = np.zeros(HLL_M, dtype=np.uint8)
        for b in df["regs"]:
            np.maximum(acc, np.frombuffer(b, dtype=np.uint8), out=acc)
        return pd.DataFrame({
            "approx_distinct": [int(round(hll_estimate(acc)))]})

    partials = ds.select_columns([col]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True)
    # all partials fit one reduce task: ~4 KB per input batch
    return partials.repartition(1).map_batches(merge, batch_format="pandas")


def approx_distinct_by_key(ds, key: str, col: str,
                           num_buckets: int | None = None):
    """Approximate per-key COUNT(DISTINCT col): one sketch per
    (batch, key) partial, merged per key. The shuffle moves one 4 KB
    sketch per key per batch — independent of the number of distinct
    values — and the merge groups by hash(key) % B (keys co-locate per
    bucket; one vectorized call per bucket), so an unbounded key domain
    never means one Python call per key."""
    from .shuffle import add_bucket_col, default_buckets

    B = num_buckets or default_buckets()

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        rows = [(k, hll_registers(g[col].tolist()).tobytes())
                for k, g in df.groupby(key, sort=False)]
        return pd.DataFrame(rows, columns=[key, "regs"])

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for k, g in df.groupby(key, sort=False):
            acc = np.zeros(HLL_M, dtype=np.uint8)
            for b in g["regs"]:
                np.maximum(acc, np.frombuffer(b, dtype=np.uint8), out=acc)
            out.append((k, int(round(hll_estimate(acc)))))
        return pd.DataFrame(out, columns=[key, "approx_distinct"])

    partials = ds.select_columns([key, col]).map_batches(
        partial, batch_format="pandas")
    partials = partials.map_batches(
        lambda t: add_bucket_col(t, [key], B), batch_format="pyarrow")

    def bucket_merge(df: pd.DataFrame) -> pd.DataFrame:
        return merge(df.drop(columns=["__bkt"]))

    return partials.groupby("__bkt").map_groups(bucket_merge,
                                                batch_format="pandas")


# ---------------------------------------------------------------------------
# mergeable quantile summary (compressed-histogram merge)
# ---------------------------------------------------------------------------

QUANT_PER_BATCH = 256


def approx_quantiles(ds, col: str, qs: tuple[float, ...] = (0.5, 0.9, 0.99),
                     per_batch: int = QUANT_PER_BATCH):
    """Approximate quantiles with a deterministic rank-error bound:
    each batch compresses its SORTED values to ``per_batch`` equally
    spaced (value, weight) pairs (weight = n_batch / per_batch); the
    tiny union of summaries (B x per_batch rows) merges in one reduce
    task by weighted cumulative rank. Each batch's compression shifts
    any rank by < n_batch / per_batch, so the merged rank error is
    < N / per_batch total (~0.4% of N at the default) — the classic
    mergeable-summary bound, independent of the value distribution.
    Returns a Dataset of (q, value) rows."""

    def partial(batch: pa.Table) -> pa.Table:
        v = np.sort(batch[col].to_numpy(zero_copy_only=False)
                    .astype(np.float64))
        v = v[~np.isnan(v)]
        n = len(v)
        if n == 0:
            return pa.table({"value": pa.array([], pa.float64()),
                             "weight": pa.array([], pa.float64())})
        k = min(per_batch, n)
        idx = np.minimum((np.arange(k) + 0.5) / k * n, n - 1).astype(np.int64)
        return pa.table({"value": pa.array(v[idx]),
                         "weight": pa.array(np.full(k, n / k))})

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        d = df.sort_values("value", kind="mergesort")
        w = d["weight"].to_numpy()
        cum = np.cumsum(w) - w / 2.0
        total = float(w.sum())
        vals = np.interp([q * total for q in qs], cum,
                         d["value"].to_numpy())
        return pd.DataFrame({"q": np.array(qs, dtype=np.float64),
                             "value": vals})

    partials = ds.select_columns([col]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True)
    # all summaries fit one reduce task: per_batch rows per input batch
    return partials.repartition(1).map_batches(merge, batch_format="pandas",
                                               batch_size=None)


# ---------------------------------------------------------------------------
# Misra-Gries / Space-Saving heavy hitters (mergeable, bounded memory)
# ---------------------------------------------------------------------------

MG_CAPACITY = 4096


def mg_compress(words: pd.Series, capacity: int) -> tuple[pd.DataFrame, int]:
    """Misra-Gries compression of an exact count vector to <= capacity
    entries: subtract the (capacity+1)-th largest count from all, keep
    the positive remainder. Each kept count UNDERESTIMATES the true
    count by at most the decrement, and the decrement is <= N/(C+1)
    (Misra & Gries 1982 / Metwally et al. Space-Saving)."""
    g = words.value_counts()
    if len(g) <= capacity:
        return (pd.DataFrame({"word": g.index, "n_low": g.to_numpy()}), 0)
    dec = int(g.iloc[capacity])
    kept = g.iloc[:capacity] - dec
    kept = kept[kept > 0]
    return (pd.DataFrame({"word": kept.index, "n_low": kept.to_numpy()}),
            dec)


def topk_words_sketch(ds, k: int = 20, col: str = "text",
                      capacity: int = MG_CAPACITY,
                      num_buckets: int | None = None) -> pd.DataFrame:
    """Approximate heavy hitters with DETERMINISTIC error bounds: each
    batch emits a <= capacity-entry Misra-Gries summary (lower-bound
    counts) plus its decrement; summaries merge by per-word Sum
    (bucketed, like the exact word_topk), and the summed decrements
    bound the undercount. Returns top-k by lower bound with
    (word, count_min, count_max): count_min <= true <= count_max, where
    count_max - count_min = sum of all batch decrements <= N/(C+1).
    At 100 TB this caps every task's memory at ~capacity rows where the
    exact operator's per-bucket state grows with the vocabulary."""
    import pyarrow.compute as pc

    from .shuffle import add_bucket_col, default_buckets

    B = num_buckets or default_buckets()

    def partial(batch: pa.Table) -> pa.Table:
        toks = pc.list_flatten(
            pc.split_pattern_regex(batch[col], pattern=r"[^\w]+"))
        toks = toks.filter(pc.not_equal(toks, ""))
        df, dec = mg_compress(pd.Series(toks.to_pylist(), dtype=object),
                              capacity)
        # the null-word row carries this batch's decrement
        return pa.table({
            "word": pa.array(list(df["word"]) + [None], type=pa.string()),
            "n_low": pa.array(list(df["n_low"].astype(np.int64)) + [dec],
                              type=pa.int64()),
        })

    def bucket_topk(tbl: pa.Table) -> pa.Table:
        df = tbl.to_pandas()
        dec = int(df.loc[df["word"].isna(), "n_low"].sum())
        g = (df[df["word"].notna()].groupby("word", sort=False)["n_low"]
             .sum().reset_index())
        g = g.sort_values(["n_low", "word"], ascending=[False, True],
                          kind="mergesort").head(k)
        return pa.table({
            "word": pa.array(list(g["word"]) + [None], type=pa.string()),
            "n_low": pa.array(list(g["n_low"].astype(np.int64)) + [dec],
                              type=pa.int64()),
        })

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
    parts = parts.map_batches(
        lambda t: add_bucket_col(t, ["word"], B), batch_format="pyarrow")
    merged = parts.groupby("__bkt").map_groups(
        bucket_topk, batch_format="pyarrow").to_pandas()  # <= B*(k+1) rows
    total_dec = int(merged.loc[merged["word"].isna(), "n_low"].sum())
    top = (merged[merged["word"].notna()]
           .sort_values(["n_low", "word"], ascending=[False, True],
                        kind="mergesort").head(k).reset_index(drop=True))
    return pd.DataFrame({"word": top["word"],
                         "count_min": top["n_low"].astype(np.int64),
                         "count_max": (top["n_low"] + total_dec)
                         .astype(np.int64)})
