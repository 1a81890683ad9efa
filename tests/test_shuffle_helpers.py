"""The bucketed-shuffle primitives (functions/shuffle.py) against plain
pandas references on seeded random inputs — these carry the dedup/join
family, so their semantics get their own contract tests."""

import numpy as np
import pandas as pd
import ray.data as rd

from go_fluentd_ray.functions.shuffle import (bucketed_anti_join,
                                              bucketed_attach,
                                              bucketed_distinct)


def _rand_case(seed: int):
    rng = np.random.default_rng(seed)
    n_docs = int(rng.integers(5, 60))
    corpus = pd.DataFrame({
        "doc_id": np.arange(n_docs, dtype=np.int64),
        "text": [f"t{seed}-{i}" for i in range(n_docs)],
    })
    n_pairs = int(rng.integers(1, 80))
    a = rng.integers(0, n_docs, n_pairs).astype(np.int64)
    b = rng.integers(0, n_docs, n_pairs).astype(np.int64)
    keep = a != b
    pairs = pd.DataFrame({"a": np.minimum(a, b)[keep],
                          "b": np.maximum(a, b)[keep]})
    # duplicates on purpose: dedup_sides must make them harmless
    pairs = pd.concat([pairs, pairs.head(3)], ignore_index=True)
    return corpus, pairs


class TestBucketedAttach:
    def test_matches_pandas_reference(self):
        for seed in (1, 7, 42, 99):
            corpus, pairs = _rand_case(seed)
            if pairs.empty:
                continue
            got = bucketed_attach(
                rd.from_pandas(pairs), rd.from_pandas(corpus),
                left_keys=("a", "b"), corpus_key="doc_id",
                value_col="text", out_cols=("ta", "tb"), num_buckets=8,
                dedup_sides=True).to_pandas()
            txt = corpus.set_index("doc_id")["text"]
            want = pairs.drop_duplicates(["a", "b"]).assign(
                ta=lambda d: d["a"].map(txt), tb=lambda d: d["b"].map(txt))
            g = got.sort_values(["a", "b"]).reset_index(drop=True)
            w = want.sort_values(["a", "b"]).reset_index(drop=True)
            assert g[["a", "b", "ta", "tb"]].equals(
                w[["a", "b", "ta", "tb"]]), seed

    def test_finalize_runs_inside_stage(self):
        corpus, pairs = _rand_case(3)

        def fin(df):
            return df[df["a"] % 2 == 0][["a", "b"]]

        got = bucketed_attach(
            rd.from_pandas(pairs), rd.from_pandas(corpus),
            left_keys=("a", "b"), corpus_key="doc_id", value_col="text",
            out_cols=("ta", "tb"), num_buckets=8, dedup_sides=True,
            finalize=fin).to_pandas()
        assert (got["a"] % 2 == 0).all()


class TestBucketedDistinctAnti:
    def test_distinct(self):
        df = pd.DataFrame({"a": [1, 1, 2, 2, 3] * 4,
                           "b": [9, 9, 8, 8, 7] * 4})
        out = bucketed_distinct(rd.from_pandas(df), ["a", "b"],
                                num_buckets=4).to_pandas()
        assert len(out) == 3
        assert set(map(tuple, out[["a", "b"]].to_numpy())) == {
            (1, 9), (2, 8), (3, 7)}

    def test_anti_join_reference(self):
        for seed in (2, 11):
            corpus, _ = _rand_case(seed)
            rng = np.random.default_rng(seed + 1)
            drop = pd.DataFrame({"n": rng.choice(
                corpus["doc_id"], size=len(corpus) // 2,
                replace=False).astype(np.int64)})
            got = bucketed_anti_join(
                rd.from_pandas(corpus), "doc_id",
                rd.from_pandas(drop), "n", num_buckets=8).to_pandas()
            want = corpus[~corpus["doc_id"].isin(set(drop["n"]))]
            assert sorted(got["doc_id"]) == sorted(want["doc_id"]), seed

    def test_int64_beyond_2e53_survive(self):
        """Full-range 64-bit values (content hashes, simhashes) must
        ride the bucketed helpers exactly — a pandas float64 round-trip
        would silently corrupt anything above 2^53."""
        big = np.array([(1 << 62) + 1, (1 << 62) + 3, (1 << 53) + 1,
                        (1 << 63) - 5, 7], dtype=np.int64)
        corpus = pd.DataFrame({"doc_id": big,
                               "payload": big + 1,  # int64 payload column
                               "text": [f"x{i}" for i in range(len(big))]})
        drop = pd.DataFrame({"n": big[:2]})
        got = bucketed_anti_join(rd.from_pandas(corpus), "doc_id",
                                 rd.from_pandas(drop), "n",
                                 num_buckets=4).to_pandas()
        assert sorted(got["doc_id"]) == sorted(big[2:])
        assert sorted(got["payload"]) == sorted(big[2:] + 1)
        pairs = pd.DataFrame({"a": big[[0, 2]], "b": big[[1, 3]]})
        att = bucketed_attach(
            rd.from_pandas(pairs), rd.from_pandas(corpus),
            left_keys=("a", "b"), corpus_key="doc_id", value_col="text",
            out_cols=("ta", "tb"), num_buckets=4).to_pandas()
        assert set(att["a"]) == {big[0], big[2]}
        assert set(att["b"]) == {big[1], big[3]}
        assert set(att["ta"]) == {"x0", "x2"} and set(att["tb"]) == {"x1", "x3"}

    def test_attach_inner_drops_keys_missing_from_corpus(self):
        corpus = pd.DataFrame({"doc_id": np.array([1, 2], dtype=np.int64),
                               "text": ["t1", "t2"]})
        pairs = pd.DataFrame({"a": np.array([1, 1], dtype=np.int64),
                              "b": np.array([2, 99], dtype=np.int64)})
        got = bucketed_attach(
            rd.from_pandas(pairs), rd.from_pandas(corpus),
            left_keys=("a", "b"), corpus_key="doc_id", value_col="text",
            out_cols=("ta", "tb"), num_buckets=4).to_pandas()
        # the (1, 99) pair has no corpus row for 99 -> dropped, not
        # emitted with a null value (which would crash finalize callers)
        assert got[["a", "b"]].to_records(index=False).tolist() == [(1, 2)]

    def test_anti_join_empty_and_full_drop(self):
        corpus, _ = _rand_case(5)
        none = pd.DataFrame({"n": pd.Series(dtype=np.int64)})
        got = bucketed_anti_join(rd.from_pandas(corpus), "doc_id",
                                 rd.from_pandas(none), "n",
                                 num_buckets=8).to_pandas()
        assert len(got) == len(corpus)
        every = pd.DataFrame({"n": corpus["doc_id"]})
        got2 = bucketed_anti_join(rd.from_pandas(corpus), "doc_id",
                                  rd.from_pandas(every), "n",
                                  num_buckets=8).to_pandas()
        assert len(got2) == 0
