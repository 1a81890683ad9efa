"""Head-boundary salting (stages/saltconcat.py) — the escalation for a
conversation too large for one worker's bucket (SURVEY §4).

The contract under test, in order of importance:
  1. EXACTNESS — the salted pipeline's output table is byte-identical
     to the unsalted flagship on the pathological-skew corpus.
  2. The cut points really are head rows of their (conv, tag) stream
     (that alignment is the whole correctness argument).
  3. The hot conversation actually spreads over many buckets (the
     point of the exercise), while non-hot rows keep the exact
     unsalted bucket assignment (no plan change for the 99.9%).
  4. Detection finds the planted hot conv and nothing else; a uniform
     corpus falls through to the unsalted path untouched.
"""

import numpy as np
import pandas as pd
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data as rd

from go_fluentd_ray import oracle, synth
from go_fluentd_ray.config import DEFAULT_CONFIG
from go_fluentd_ray.pipelines import flagship
from go_fluentd_ray.stages import saltconcat
from go_fluentd_ray.stages.acceptor import acceptor_transform
from go_fluentd_ray.stages.concat import add_bucket

N = 60_000
HOT_FRAC = 0.3
HOT_CONV = "conv-00000000"
TARGET = 1_500  # rows per salt group — small so the test exercises many cuts


def _corpus() -> str:
    return synth.ensure_skewed_corpus(N, hot_frac=HOT_FRAC)


def test_detection_finds_only_the_planted_conv():
    hot = saltconcat.detect_hot_convs(_corpus(), hot_frac=0.05)
    assert set(hot) == {HOT_CONV}
    # count is exact for a conv this hot (it dominates whole batches)
    assert hot[HOT_CONV] == int(N * HOT_FRAC)


def test_uniform_corpus_detects_nothing():
    p = synth.ensure_corpus(20_000)
    assert saltconcat.detect_hot_convs(p, hot_frac=0.05) == {}


def test_boundaries_are_head_rows():
    p = _corpus()
    hot = {HOT_CONV: int(N * HOT_FRAC)}
    bnd = saltconcat.head_boundaries(p, hot, target_rows_per_salt=TARGET)
    assert bnd, "expected cut points for the hot conversation"
    t = acceptor_transform(pq.read_table(p), DEFAULT_CONFIG)
    df = t.select(["conv_id", "tag", "turn_idx", "is_head"]).to_pandas()
    df = df[df["conv_id"] == HOT_CONV]
    for (conv, tag), cuts in bnd.items():
        assert conv == HOT_CONV
        g = df[df["tag"] == tag]
        head_turns = set(g.loc[g["is_head"], "turn_idx"].astype(int))
        assert set(cuts.tolist()) <= head_turns, (
            f"cut points for tag {tag} must be head rows")
        # enough cuts to meet the target (within the rounding the
        # candidate grid allows)
        assert len(cuts) >= max(1, len(g) // TARGET - 2)


def test_salted_bucket_spreads_hot_and_preserves_cold():
    p = _corpus()
    bnd = saltconcat.head_boundaries(
        p, {HOT_CONV: int(N * HOT_FRAC)}, target_rows_per_salt=TARGET)
    t = acceptor_transform(pq.read_table(p), DEFAULT_CONFIG)
    B = 32
    plain = add_bucket(t, B).to_pandas()
    salted = saltconcat.add_bucket_salted(t, B, bnd).to_pandas()

    hot_mask = salted["conv_id"] == HOT_CONV
    n_hot_buckets = salted.loc[hot_mask, "bucket"].nunique()
    assert n_hot_buckets >= 8, f"hot conv landed in {n_hot_buckets} buckets"
    # the dominant bucket share drops from ~HOT_FRAC to near-uniform
    share = salted["bucket"].value_counts(normalize=True).max()
    assert share < HOT_FRAC / 2
    # cold rows: identical assignment to the unsalted plan
    cold = ~hot_mask
    assert (plain.loc[cold, "bucket"] == salted.loc[cold, "bucket"]).all()


def test_salted_pipeline_output_is_identical():
    p = _corpus()
    exp, _disc = oracle.run_oracle(pq.read_table(p))

    pipe = saltconcat.build_pipeline_salted(
        p, num_buckets=16, hot_frac=0.05, target_rows_per_salt=TARGET)
    got = flagship.result_table_sorted(pipe)
    assert got.equals(exp)


def test_salted_pipeline_no_hot_is_identical_too():
    """Uniform corpus: detection returns {}, boundaries {}, and the
    salted build must reduce to the plain plan's output."""
    p = synth.ensure_corpus(20_000)
    exp, _disc = oracle.run_oracle(pq.read_table(p))
    pipe = saltconcat.build_pipeline_salted(p, num_buckets=8)
    got = flagship.result_table_sorted(pipe)
    assert got.equals(exp)
