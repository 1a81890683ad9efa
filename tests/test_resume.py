"""Checkpoint/resume correctness (FIXTURES.md F4 gate c): a run
interrupted after a subset of partitions must, on resume, (1) skip
completed partitions untouched, (2) recompute crashed partial ones,
(3) produce byte-identical output to an uninterrupted run."""

import json
import os
import shutil

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from go_fluentd_ray import oracle, synth
from go_fluentd_ray.stages import sinks

N = 10_000
B = 8


@pytest.fixture(scope="module")
def corpus():
    return synth.ensure_corpus(N)


def _read_all(root):
    parts = []
    for name in sorted(os.listdir(root)):
        if name.startswith("bucket="):
            parts.append(pq.read_table(os.path.join(root, name,
                                                    "data.parquet")))
    t = pa.concat_tables(parts)
    return t.take(pc.sort_indices(t, sort_keys=[("conv_id", "ascending"),
                                                ("turn_idx", "ascending")]))


def test_full_run_metrics_and_oracle(corpus, tmp_path):
    root = str(tmp_path / "out")
    metrics = sinks.run_resumable(corpus, root, num_buckets=B)
    assert metrics["partitions"] == B
    exp, disc = oracle.run_oracle(pq.read_table(corpus))
    assert metrics["rows"] == exp.num_rows
    assert metrics["inputs_merged"] + sum(disc.values()) == N
    got = _read_all(root).drop_columns(["bucket"])
    assert got.equals(exp)
    # per-sink metrics equal the oracle's routed-row counts
    want = oracle.oracle_sink_counts(exp)
    assert metrics["per_sink"] == dict(zip(want["sink"], map(int, want["n"])))
    # per-stage observability: one row per executed operator with wall
    # time and row counts (the reference's /monitor JSON analogue), and
    # the artifact on disk carries the same rows
    stages = metrics["stages"]
    assert stages, "stage_stats returned no operators"
    assert any("MapGroups" in s["operator"] or "Map" in s["operator"]
               for s in stages)
    for s in stages:
        assert set(s) == {"operator", "wall_sec", "cpu_sec", "udf_sec",
                          "rows_out", "bytes_out", "tasks"}
        assert s["wall_sec"] >= 0 and s["rows_out"] >= 0
    assert sum(s["wall_sec"] for s in stages) > 0
    with open(os.path.join(root, "_METRICS.json")) as f:
        assert json.load(f)["stages"] == stages


def test_resume_skips_completed_and_matches(corpus, tmp_path):
    root_a = str(tmp_path / "a")      # uninterrupted reference run
    root_b = str(tmp_path / "b")      # interrupted + resumed run
    sinks.run_resumable(corpus, root_a, num_buckets=B)

    sinks.run_resumable(corpus, root_b, num_buckets=B)
    # simulate a crash: 3 partitions lost entirely, one mid-write
    # (data written, manifest missing), rest completed
    for b in (0, 3, 5):
        shutil.rmtree(os.path.join(root_b, f"bucket={b}"))
    os.remove(os.path.join(root_b, "bucket=6", sinks.MANIFEST))
    mtimes = {
        b: os.path.getmtime(os.path.join(root_b, f"bucket={b}",
                                         "data.parquet"))
        for b in (1, 2, 4, 7)
    }

    metrics = sinks.run_resumable(corpus, root_b, num_buckets=B)
    # only the 4 missing/partial partitions were recomputed
    assert metrics["partitions_written_this_run"] == 4
    assert metrics["partitions"] == B
    for b, mt in mtimes.items():
        assert os.path.getmtime(
            os.path.join(root_b, f"bucket={b}", "data.parquet")) == mt, \
            f"completed bucket {b} was rewritten"
    # byte-identical output and manifests vs the uninterrupted run
    assert _read_all(root_b).equals(_read_all(root_a))
    for b in range(B):
        with open(os.path.join(root_a, f"bucket={b}", sinks.MANIFEST)) as f:
            ma = json.load(f)
        with open(os.path.join(root_b, f"bucket={b}", sinks.MANIFEST)) as f:
            mb = json.load(f)
        assert ma == mb, f"manifest mismatch for bucket {b}"


def test_no_data_loss_under_block_splitting(corpus, tmp_path):
    """Regression (review finding): when Ray splits a bucket's rows
    across blocks (tiny target block size), the sink must still write
    every row — the old map_batches sink re-wrote bucket files per
    block and kept only the last fragment."""
    from ray.data import DataContext

    ctx = DataContext.get_current()
    old = ctx.target_max_block_size
    try:
        ctx.target_max_block_size = 256 * 1024  # force aggressive splits
        root = str(tmp_path / "split")
        metrics = sinks.run_resumable(corpus, root, num_buckets=4)
    finally:
        ctx.target_max_block_size = old
    exp, _ = oracle.run_oracle(pq.read_table(corpus))
    assert metrics["rows"] == exp.num_rows
    assert _read_all(root).drop_columns(["bucket"]).equals(exp)


def test_resume_adopts_pinned_num_buckets(corpus, tmp_path):
    """Regression (review finding): resuming with a different
    num_buckets must adopt the pinned partitioning, not re-key rows."""
    root = str(tmp_path / "pin")
    sinks.run_resumable(corpus, root, num_buckets=B)
    import shutil as _sh

    _sh.rmtree(os.path.join(root, "bucket=1"))
    # resume 'on a smaller cluster' (different requested B)
    metrics = sinks.run_resumable(corpus, root, num_buckets=2)
    assert metrics["num_buckets"] == B
    assert metrics["partitions"] == B
    exp, _ = oracle.run_oracle(pq.read_table(corpus))
    assert metrics["rows"] == exp.num_rows


class TestSftResume:
    """run_resumable_sft: per-partition checkpointing of the composed
    SFT build."""

    def test_resume_skips_done_and_is_byte_identical(self, tmp_path):
        import glob
        import hashlib
        import os
        import shutil

        from go_fluentd_ray import synth
        from go_fluentd_ray.pipelines import sftbuild

        p = synth.ensure_corpus(6000)
        out_a = str(tmp_path / "a")
        out_b = str(tmp_path / "b")
        m = sftbuild.run_resumable_sft(p, out_a, num_buckets=8)
        assert m["partitions_written_this_run"] > 0
        assert m["rows_written_this_run"] > 0
        assert m["stages"] and all(s["wall_sec"] >= 0
                                   for s in m["stages"])

        # crash simulation: one partition deleted, one left partial
        parts = sorted(glob.glob(out_a + "/bucket=*"))
        shutil.rmtree(parts[1])
        os.remove(os.path.join(parts[2], sftbuild.SFT_MANIFEST))
        m2 = sftbuild.run_resumable_sft(p, out_a, num_buckets=8)
        assert m2["partitions_written_this_run"] == 2
        assert m2["partitions_completed_prior"] == len(parts) - 2

        # byte-identical vs an uninterrupted run
        sftbuild.run_resumable_sft(p, out_b, num_buckets=8)

        def digests(root):
            return {
                os.path.basename(d): hashlib.md5(
                    open(os.path.join(d, "data.parquet"),
                         "rb").read()).hexdigest()
                for d in sorted(glob.glob(root + "/bucket=*"))}

        assert digests(out_a) == digests(out_b)

    def test_partitioning_is_pinned(self, tmp_path):
        from go_fluentd_ray import synth
        from go_fluentd_ray.pipelines import sftbuild

        p = synth.ensure_corpus(6000)
        out = str(tmp_path / "pin")
        m1 = sftbuild.run_resumable_sft(p, out, num_buckets=8)
        # asking for a different B later must ADOPT the pinned value
        m2 = sftbuild.run_resumable_sft(p, out, num_buckets=32)
        assert m1["num_buckets"] == m2["num_buckets"] == 8
        assert m2["partitions_written_this_run"] == 0

    def test_output_rows_match_query_path(self, tmp_path):
        import glob

        import pyarrow.parquet as pq
        import ray.data as rd

        from go_fluentd_ray import synth
        from go_fluentd_ray.pipelines import sftbuild

        p = synth.ensure_corpus(6000)
        out = str(tmp_path / "q")
        sftbuild.run_resumable_sft(p, out, num_buckets=8)
        files = sorted(glob.glob(out + "/bucket=*/data.parquet"))
        got = (pa.concat_tables([pq.read_table(f) for f in files])
               .to_pandas()
               .sort_values(["conv_id", "turn_idx"])
               .reset_index(drop=True))
        want = (sftbuild.sft_pipeline(rd.read_parquet(p)).to_pandas()
                .sort_values(["conv_id", "turn_idx"])
                .reset_index(drop=True))
        pd.testing.assert_frame_equal(got, want[got.columns.tolist()])
