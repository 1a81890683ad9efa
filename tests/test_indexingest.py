"""Incremental maintenance of the persisted indexes: appends must
change WHEN work happens, never the answer (the update_rate_anomalies
equality pattern applied to the index sinks)."""

import os
import shutil

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

SF = "/root/testdata/sf0.001"


def _doc_parts(n_parts=3):
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    return [docs.iloc[i::n_parts].reset_index(drop=True)
            for i in range(n_parts)]


class TestBm25Append:
    def test_appends_equal_full_rebuild(self, tmp_path):
        """base + 2 appends must answer queries IDENTICALLY to one
        full build over the union corpus — postings, df, tf and avgdl
        all commute as exact integer sums."""
        from go_fluentd_ray.functions import bm25index

        p1, p2, p3 = _doc_parts()
        inc = str(tmp_path / "inc")
        bm25index.build_bm25_index(rd.from_pandas(p1), inc)
        bm25index.append_bm25_index(inc, rd.from_pandas(p2))
        bm25index.append_bm25_index(inc, rd.from_pandas(p3))
        full = str(tmp_path / "full")
        union = pd.concat([p1, p2, p3], ignore_index=True)
        bm25index.build_bm25_index(rd.from_pandas(union), full)
        got = bm25index.bm25_index_query(inc).reset_index(drop=True)
        want = bm25index.bm25_index_query(full).reset_index(drop=True)
        pd.testing.assert_frame_equal(got, want)
        # meta folded exactly
        import json
        with open(f"{inc}/meta.json") as f:
            mi = json.load(f)
        with open(f"{full}/meta.json") as f:
            mf = json.load(f)
        assert mi["n_docs"] == mf["n_docs"]
        assert mi["sum_dl"] == mf["sum_dl"]
        assert mi["avgdl"] == mf["avgdl"]

    def test_staleness_trigger(self, tmp_path):
        from go_fluentd_ray.functions import bm25index

        p1, p2, p3 = _doc_parts()
        idx = str(tmp_path / "idx")
        bm25index.build_bm25_index(rd.from_pandas(p1), idx)
        assert not bm25index.needs_rebuild(idx)
        bm25index.append_bm25_index(idx, rd.from_pandas(p2))
        # appended ~= base -> over the 0.5 default
        assert bm25index.needs_rebuild(idx)
        assert not bm25index.needs_rebuild(idx, frac=2.0)


class TestIvfpqAppend:
    def _vecs(self, seed, n, dim=16, centers=None):
        rng = np.random.default_rng(seed)
        if centers is None:
            centers = rng.normal(size=(8, dim))
            centers /= np.linalg.norm(centers, axis=1, keepdims=True)
        V = centers[rng.integers(0, len(centers), n)] \
            + 0.05 * rng.normal(size=(n, dim))
        V /= np.linalg.norm(V, axis=1, keepdims=True)
        return centers, V

    def test_appends_equal_frozen_model_full_build(self, tmp_path):
        """N appends == 1 append of the union == full build over the
        union under the SAME frozen model; and recall vs brute force
        over the union stays gated."""
        from go_fluentd_ray.functions import annindex
        from go_fluentd_ray.functions.similarity import knn_bruteforce

        centers, V1 = self._vecs(5, 6000)
        _, V2 = self._vecs(6, 2000, centers=centers)
        _, V3 = self._vecs(7, 2000, centers=centers)

        def mk(V, off):
            ids = np.arange(off, off + len(V), dtype=np.int64)
            return pd.DataFrame({"vec_id": ids,
                                 "embedding": [v.tolist() for v in V]})

        d1, d2, d3 = mk(V1, 0), mk(V2, 6000), mk(V3, 8000)
        base = str(tmp_path / "base")
        annindex.build_ivfpq_index(rd.from_pandas(d1), base,
                                   n_centroids=16, m=4, ks=64,
                                   sample_n=512)
        # A: two appends; B: one union append (both from the base copy)
        A, B = str(tmp_path / "A"), str(tmp_path / "B")
        shutil.copytree(base, A)
        shutil.copytree(base, B)
        annindex.append_ivfpq_index(A, rd.from_pandas(d2))
        annindex.append_ivfpq_index(A, rd.from_pandas(d3))
        annindex.append_ivfpq_index(
            B, rd.from_pandas(pd.concat([d2, d3], ignore_index=True)))
        # D: full build over the union under the FROZEN base model
        model = np.load(f"{base}/model.npz")
        union = pd.concat([d1, d2, d3], ignore_index=True)
        D = str(tmp_path / "D")
        annindex.build_ivfpq_index(rd.from_pandas(union), D,
                                   model=(model["C"], model["books"]))
        qa = annindex.knn_ivfpq_query(A, k=5, nprobe=4, shortlist=64)
        qb = annindex.knn_ivfpq_query(B, k=5, nprobe=4, shortlist=64)
        qd = annindex.knn_ivfpq_query(D, k=5, nprobe=4, shortlist=64)
        pd.testing.assert_frame_equal(qa.reset_index(drop=True),
                                      qb.reset_index(drop=True))
        pd.testing.assert_frame_equal(qa.reset_index(drop=True),
                                      qd.reset_index(drop=True))
        # meta counters folded
        import json
        with open(f"{A}/meta.json") as f:
            ma = json.load(f)
        assert ma["n_rows"] == len(union)
        assert ma["appended_rows"] == 4000 and ma["base_rows"] == 6000
        # quality of the appended index on the union corpus
        bf = knn_bruteforce(rd.from_pandas(union), 5)
        iv = annindex.knn_ivfpq_query(A, k=5)
        recalls = []
        for qid in sorted(bf["qid"].unique()):
            truth = set(bf.loc[bf["qid"] == qid, "vec_id"])
            got = set(iv.loc[iv["qid"] == qid, "vec_id"])
            recalls.append(len(truth & got) / max(len(truth), 1))
        assert float(np.mean(recalls)) >= 0.9, recalls


class TestRunIndexIngest:
    def _write_parts(self, corpus, parts, names=None):
        os.makedirs(corpus, exist_ok=True)
        for i, p in enumerate(parts):
            nm = names[i] if names else f"part-{i:03d}.parquet"
            pq.write_table(pa.Table.from_pandas(p, preserve_index=False),
                           os.path.join(corpus, nm))

    def test_ticks_build_append_and_match_full(self, tmp_path):
        """Tick 1 builds, tick 2 appends only the new file, a no-new
        tick is a noop — and the maintained index answers queries
        exactly like a one-shot full build."""
        from go_fluentd_ray.functions import bm25index
        from go_fluentd_ray.stages import indexingest

        p1, p2, p3 = _doc_parts()
        corpus = str(tmp_path / "corpus")
        root = str(tmp_path / "root")
        self._write_parts(corpus, [p1, p2])
        m1 = indexingest.run_index_ingest(corpus, root, kind="bm25",
                                          rebuild_frac=10.0)
        assert m1["action"] == "build" and m1["new_files"] == 2
        self._write_parts(corpus, [p3],
                          names=["part-002.parquet"])
        m2 = indexingest.run_index_ingest(corpus, root, kind="bm25",
                                          rebuild_frac=10.0)
        assert m2["action"] == "append" and m2["new_files"] == 1
        m3 = indexingest.run_index_ingest(corpus, root, kind="bm25",
                                          rebuild_frac=10.0)
        assert m3["action"] == "noop" and m3["new_files"] == 0
        full = str(tmp_path / "full")
        union = pd.concat([p1, p2, p3], ignore_index=True)
        bm25index.build_bm25_index(rd.from_pandas(union), full)
        got = bm25index.bm25_index_query(
            m2["index_dir"]).reset_index(drop=True)
        want = bm25index.bm25_index_query(full).reset_index(drop=True)
        pd.testing.assert_frame_equal(got, want)

    def test_staleness_rebuild_tick(self, tmp_path):
        """With a tiny rebuild fraction, the second tick pays a full
        rebuild (append counter resets) and still answers exactly."""
        from go_fluentd_ray.functions import bm25index
        from go_fluentd_ray.stages import indexingest

        p1, p2, p3 = _doc_parts()
        corpus = str(tmp_path / "corpus")
        root = str(tmp_path / "root")
        self._write_parts(corpus, [p1])
        indexingest.run_index_ingest(corpus, root, kind="bm25")
        self._write_parts(corpus, [p2, p3],
                          names=["part-001.parquet", "part-002.parquet"])
        m = indexingest.run_index_ingest(corpus, root, kind="bm25",
                                         rebuild_frac=0.01)
        assert m["action"] == "rebuild"
        import json
        with open(os.path.join(m["index_dir"], "meta.json")) as f:
            meta = json.load(f)
        assert meta["appended_docs"] == 0
        assert meta["base_docs"] == meta["n_docs"] == 500
        full = str(tmp_path / "full")
        union = pd.concat([p1, p2, p3], ignore_index=True)
        bm25index.build_bm25_index(rd.from_pandas(union), full)
        got = bm25index.bm25_index_query(
            m["index_dir"]).reset_index(drop=True)
        want = bm25index.bm25_index_query(full).reset_index(drop=True)
        pd.testing.assert_frame_equal(got, want)

    def test_ivfpq_kind(self, tmp_path):
        """The ivfpq kind wires the same claim/append/rebuild loop to
        the vector index."""
        from go_fluentd_ray.functions import annindex
        from go_fluentd_ray.stages import indexingest

        rng = np.random.default_rng(9)
        V = rng.normal(size=(3000, 16))
        V /= np.linalg.norm(V, axis=1, keepdims=True)
        df = pd.DataFrame({"vec_id": np.arange(3000, dtype=np.int64),
                           "embedding": [v.tolist() for v in V]})
        corpus = str(tmp_path / "corpus")
        root = str(tmp_path / "root")
        self._write_parts(corpus, [df.iloc[:2000]])
        m1 = indexingest.run_index_ingest(
            corpus, root, kind="ivfpq", n_centroids=8, m=4, ks=32,
            sample_n=256)
        assert m1["action"] == "build"
        self._write_parts(corpus, [df.iloc[2000:].reset_index(drop=True)],
                          names=["part-001.parquet"])
        m2 = indexingest.run_index_ingest(
            corpus, root, kind="ivfpq", rebuild_frac=10.0,
            n_centroids=8, m=4, ks=32, sample_n=256)
        assert m2["action"] == "append"
        import json
        with open(os.path.join(m2["index_dir"], "meta.json")) as f:
            meta = json.load(f)
        assert meta["n_rows"] == 3000
        out = annindex.knn_ivfpq_query(m2["index_dir"], k=5)
        assert set(out.columns) == {"qid", "rank", "vec_id", "sim"}
        assert len(out) > 0
        # staleness tick for the vector kind: the pre-append decision
        # must read the ivfpq meta keys (base_rows/appended_rows) and
        # refit over the union
        self._write_parts(corpus,
                          [df.iloc[:500].assign(
                              vec_id=np.arange(3000, 3500,
                                               dtype=np.int64))],
                          names=["part-002.parquet"])
        m3 = indexingest.run_index_ingest(
            corpus, root, kind="ivfpq", rebuild_frac=0.01,
            n_centroids=8, m=4, ks=32, sample_n=256)
        assert m3["action"] == "rebuild"
        import json as _json
        with open(os.path.join(m3["index_dir"], "meta.json")) as f:
            meta = _json.load(f)
        assert meta["n_rows"] == meta["base_rows"] == 3500
        assert meta["appended_rows"] == 0
