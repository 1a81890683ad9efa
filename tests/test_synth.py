"""Generator invariants: determinism, schema, caching."""

import pyarrow.parquet as pq

from go_fluentd_ray import synth


def test_schema_and_determinism():
    t1 = synth.transcript_table(3000)
    t2 = synth.transcript_table(3000)
    assert t1.schema.equals(synth.SCHEMA)
    assert t1.equals(t2)
    assert t1.num_rows == 3000


def test_cache_roundtrip(tmp_path):
    p = synth.ensure_corpus(3000)
    t = pq.read_table(p)
    assert t.equals(synth.transcript_table(3000))


def test_turns_for_sf_dir():
    assert synth.turns_for_sf_dir("/root/testdata/sf0.01") == 60_000
    assert synth.turns_for_sf_dir("/root/testdata/sf0.001") == 6_000
    assert synth.turns_for_sf_dir("bogus") >= 1000


def test_skew_is_exercised():
    """FIXTURES.md F1: the corpus must contain hot conversations (10-100x
    median turns) so the concat shuffle's skew handling is actually
    tested, not just claimed."""
    import numpy as np

    t = synth.transcript_table(60_000)
    sizes = np.bincount(
        np.unique(t["conv_id"].to_numpy(zero_copy_only=False),
                  return_inverse=True)[1])
    assert sizes.max() >= 20 * np.median(sizes)
    assert sizes.max() >= 1000
