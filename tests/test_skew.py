"""Hot-key skew evidence (SURVEY §4): one conversation holding ~20% of
ALL turns must (1) still produce oracle-exact output through the
flagship pipeline, and (2) not blow up the concat stage — the
partitioning assumption puts the whole conv in ONE bucket, and the
claim is that the fully vectorized in-bucket segmentation absorbs it
(per-row cost of the hot bucket stays comparable to uniform buckets,
so skew costs only the imbalance, never a superlinear stall).
tools/skew_bench.py measures the same end-to-end at 2M turns for
BASELINE.md."""

import time

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import ray.data as rd

from go_fluentd_ray import oracle, synth
from go_fluentd_ray.config import DEFAULT_CONFIG
from go_fluentd_ray.pipelines import flagship
from go_fluentd_ray.stages.concat import add_bucket, concat_bucket

N = 60_000
HOT_FRAC = 0.2
B = 16


def test_skewed_corpus_shape():
    p = synth.ensure_skewed_corpus(N, hot_frac=HOT_FRAC)
    t = pq.read_table(p, columns=["conv_id"])
    counts = t["conv_id"].value_counts()
    top = max(c.as_py() for c in counts.field("counts"))
    assert top == int(N * HOT_FRAC)


def test_skewed_flagship_matches_oracle():
    p = synth.ensure_skewed_corpus(N, hot_frac=HOT_FRAC)
    exp, _disc = oracle.run_oracle(pq.read_table(p))
    pipe = flagship.build_pipeline(rd.read_parquet(p), num_buckets=B,
                                   finisher_concurrency=2)
    got = flagship.result_table_sorted(pipe)
    assert got.equals(exp)


def test_hot_bucket_per_row_cost_is_flat():
    """Direct concat-kernel measurement, no Ray variance: per-row wall
    of the bucket holding the hot conv vs the median other bucket. The
    vectorized path should make the hot bucket's per-row cost no worse
    than ~4x the median (in practice it is FASTER — one big lexsort
    amortizes better than many small ones); a per-row-Python regression
    would show up as 100x here."""
    from go_fluentd_ray.stages.acceptor import acceptor_transform

    p = synth.ensure_skewed_corpus(N, hot_frac=HOT_FRAC)
    t = acceptor_transform(pq.read_table(p), DEFAULT_CONFIG)
    t = add_bucket(t, B)
    df = t.to_pandas()

    hot_bucket = int(df.loc[df["conv_id"] == "conv-00000000",
                            "bucket"].iloc[0])
    per_row = {}
    for b, g in df.groupby("bucket"):
        g = g.reset_index(drop=True)
        start = time.perf_counter()
        for _ in range(3):
            out = concat_bucket(g, DEFAULT_CONFIG)
        per_row[int(b)] = (time.perf_counter() - start) / 3 / len(g)
        assert out.num_rows > 0
    others = [v for b, v in per_row.items() if b != hot_bucket]
    med = float(np.median(others))
    assert per_row[hot_bucket] <= 4.0 * med, (
        f"hot bucket per-row {per_row[hot_bucket]:.2e}s vs "
        f"median {med:.2e}s")


def test_hot_bucket_row_share():
    """Documents the imbalance itself: the hot bucket holds ~hot_frac
    of rows plus its 1/B share — that is the cost skew imposes, and the
    number BASELINE.md's skew table is read against."""
    p = synth.ensure_skewed_corpus(N, hot_frac=HOT_FRAC)
    t = add_bucket(pq.read_table(p), B)
    s = pd.Series(t["bucket"].to_numpy(zero_copy_only=False))
    share = s.value_counts(normalize=True).max()
    assert HOT_FRAC * 0.9 < share < HOT_FRAC + 2.0 / B
