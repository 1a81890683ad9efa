"""Tests for the training-data operator family: dedup (exact, minhash,
simhash, embedding), similarity search, text analysis, events, and
multimodal plumbing. Approximate operators are tested against planted
duplicates and exact brute-force oracles."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from go_fluentd_ray.functions import dedup, events, multimodal, similarity
from go_fluentd_ray.functions import text as T

SF = "/root/testdata/sf0.001"


def _docs_with_planted_dups():
    import pyarrow.parquet as pq

    base = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    a = base.iloc[0]["text"]
    b = base.iloc[1]["text"]
    extra = pd.DataFrame({
        "doc_id": [9001, 9002, 9003],
        "text": [a,                       # exact dup of doc 0
                 b + " tail",             # near dup of doc 1
                 "zzz completely unrelated qqq xyzzy"],
        "lang": ["en"] * 3, "source": ["t"] * 3,
        "n_chars": [len(a), len(b) + 5, 34],
    })
    return pd.concat([base, extra], ignore_index=True)


class TestDedup:
    def test_exact(self):
        df = _docs_with_planted_dups()
        out = dedup.exact_dedup(rd.from_pandas(df)).to_pandas()
        dups = out[out["dups"] > 1]
        assert len(dups) == 1
        assert dups.iloc[0]["keep_id"] == 0 and dups.iloc[0]["dups"] == 2

    def test_minhash_finds_planted(self):
        df = _docs_with_planted_dups()
        pairs = dedup.minhash_dedup(rd.from_pandas(df), threshold=0.6).to_pandas()
        found = set(map(tuple, pairs[["a", "b"]].to_numpy()))
        assert (0, 9001) in found       # exact dup (jaccard 1.0)
        assert (1, 9002) in found       # near dup
        exact = pairs[(pairs.a == 0) & (pairs.b == 9001)]
        assert exact.iloc[0]["jac"] == 1.0

    def test_simhash_finds_planted(self):
        df = _docs_with_planted_dups()
        pairs = dedup.simhash_dedup(rd.from_pandas(df), max_hamming=4).to_pandas()
        found = set(map(tuple, pairs[["a", "b"]].to_numpy()))
        assert (0, 9001) in found
        ex = pairs[(pairs.a == 0) & (pairs.b == 9001)]
        assert ex.iloc[0]["hamming"] == 0

    def test_degenerate_identical_corpus_no_blowup(self):
        # 10k identical short docs: every LSH band bucket collides into
        # one degenerate group. The MAX_BUCKET cap suppresses the
        # O(n^2) pair explosion (~50M pairs); over-cap buckets emit
        # ANCHOR pairs within identical-signature subgroups instead, so
        # the cluster stays connected with exactly n-1 edges to the min
        # doc — near-dedup now handles identical corpora correctly AND
        # in O(n).
        n = 10_000
        df = pd.DataFrame({
            "doc_id": np.arange(n, dtype=np.int64),
            "text": ["error: connection refused"] * n,
        })
        mh = dedup.minhash_dedup(rd.from_pandas(df), threshold=0.6).to_pandas()
        assert len(mh) == n - 1
        assert (mh["a"] == 0).all() and (mh["jac"] == 1.0).all()
        sh = dedup.simhash_dedup(rd.from_pandas(df)).to_pandas()
        assert len(sh) == n - 1
        assert (sh["a"] == 0).all() and (sh["hamming"] == 0).all()
        ex = dedup.exact_dedup(rd.from_pandas(df)).to_pandas()
        assert len(ex) == 1 and ex.iloc[0]["dups"] == n

    def test_exact_dedup_rows_keeps_min_id(self):
        df = _docs_with_planted_dups()
        out = dedup.exact_dedup_rows(rd.from_pandas(df)).to_pandas()
        assert 9001 not in set(out["doc_id"])   # dup of doc 0 dropped
        assert 0 in set(out["doc_id"])          # min-id keeper kept
        assert len(out) == len(df) - 1
        assert sorted(out.columns) == sorted(df.columns)

    def test_embedding_exact_vs_numpy(self):
        ds = rd.read_parquet(f"{SF}/embeddings.parquet")
        out = dedup.embedding_dup_exact(ds, threshold=0.30).to_pandas()
        rows = ds.take_all()
        ids = np.array([r["vec_id"] for r in rows])
        E = np.stack([np.asarray(r["embedding"], dtype=np.float64)
                      for r in rows])
        En = E / np.linalg.norm(E, axis=1, keepdims=True)
        S = En @ En.T
        i, j = np.triu_indices(len(ids), k=1)
        want = {(int(ids[i][m]), int(ids[j][m]))
                for m in np.flatnonzero(S[i, j] >= 0.30)}
        got = set(map(tuple, out[["a", "b"]].to_numpy()))
        assert got == want and len(want) > 0

    def test_embedding_lsh_subset_of_exact(self):
        ds = rd.read_parquet(f"{SF}/embeddings.parquet")
        exact = dedup.embedding_dup_exact(ds, threshold=0.30).to_pandas()
        approx = dedup.embedding_dup_lsh(ds, threshold=0.30).to_pandas()
        ex = set(map(tuple, exact[["a", "b"]].to_numpy()))
        ap = set(map(tuple, approx[["a", "b"]].to_numpy()))
        assert ap and ap <= ex  # no false positives (verified in-bucket)


class TestSimilarity:
    def test_bruteforce_matches_numpy(self):
        ds = rd.read_parquet(f"{SF}/embeddings.parquet")
        out = similarity.knn_bruteforce(ds, k=5)
        rows = ds.take_all()
        ids = np.array([r["vec_id"] for r in rows])
        E = np.stack([np.asarray(r["embedding"], dtype=np.float64)
                      for r in rows])
        En = E / np.linalg.norm(E, axis=1, keepdims=True)
        Q = similarity.query_matrix(E.shape[1])
        sims = Q @ En.T
        for qid in range(Q.shape[0]):
            order = np.lexsort((ids, -sims[qid]))[:5]
            want = list(ids[order])
            got = list(out[out.qid == qid].sort_values("rank")["vec_id"])
            assert got == want

    def test_ivf_recall(self):
        ds = rd.read_parquet(f"{SF}/embeddings.parquet")
        out = similarity.knn_ivf_recall(ds, k=5)
        overall = float(out.loc[out.qid == -1, "recall_at_k"].iloc[0])
        # deterministic seeds; random embeddings are the IVF worst case
        # and the default nprobe is sized to clear 0.9 even there
        assert overall >= 0.9, overall
        assert set(out.columns) == {"qid", "recall_at_k"}
        assert len(out) == similarity.N_QUERIES + 1

    def test_pq_recall(self):
        """PQ(ADC)+re-rank vs brute force on the random fixture
        embeddings (the hardest PQ case: no cluster structure). The
        re-rank shortlist bounds sensitivity to codebook quality."""
        ds = rd.read_parquet(f"{SF}/embeddings.parquet")
        out = similarity.knn_pq_recall(ds, k=5)
        overall = float(out.loc[out.qid == -1, "recall_at_k"].iloc[0])
        assert overall >= 0.9, overall
        assert set(out.columns) == {"qid", "recall_at_k"}
        assert len(out) == similarity.N_QUERIES + 1

    def test_ivfpq_recall(self):
        """IVF-ADC (coarse cells + PQ residual codes + exact re-rank)
        vs brute force on the random fixture — the worst case for both
        tiers (no cluster structure)."""
        ds = rd.read_parquet(f"{SF}/embeddings.parquet")
        out = similarity.knn_ivfpq_recall(ds, k=5)
        overall = float(out.loc[out.qid == -1, "recall_at_k"].iloc[0])
        assert overall >= 0.9, overall
        assert len(out) == similarity.N_QUERIES + 1

    def test_residual_codebooks_tighter_than_plain(self):
        """On CLUSTERED data (IVFPQ's use case) residual quantization
        reconstructs tighter than plain PQ at the same (m, ks): the
        coarse quantizer absorbs the cluster-center energy, leaving
        short residuals. (On uniform-random vectors the opposite holds
        — |x - C[cell]|^2 = 2 - 2 cos(x, C) > 1 when the nearest of
        few centroids is nearly orthogonal — which is why knn_ivfpq's
        recall gate runs on the random fixture but THIS property needs
        cluster structure.)"""
        rng = np.random.default_rng(23)
        n, dim, m, ks = 20_000, 16, 4, 32
        centers = rng.normal(size=(8, dim))
        centers /= np.linalg.norm(centers, axis=1, keepdims=True)
        V = centers[rng.integers(0, 8, n)] + 0.15 * rng.normal(
            size=(n, dim))
        V = V / np.linalg.norm(V, axis=1, keepdims=True)
        df = pd.DataFrame({
            "vec_id": np.arange(n, dtype=np.int64),
            "embedding": [v.tolist() for v in V],
        })
        ds = rd.from_pandas(df).repartition(8)
        C = similarity.fit_centroids(ds, 8, sample_n=512, refine_iters=1)
        plain = similarity.fit_pq_codebooks(ds, m=m, ks=ks, sample_n=512,
                                            refine_iters=1)
        resid = similarity.fit_residual_codebooks(ds, C, m=m, ks=ks,
                                                  sample_n=512,
                                                  refine_iters=1)
        S = V[:4096]
        dsub = dim // m

        def qerr(X, B):
            codes = similarity._pq_encode(X, B)
            return sum(((X[:, j * dsub:(j + 1) * dsub]
                         - B[j][codes[:, j]]) ** 2).sum()
                       for j in range(m))

        e_plain = qerr(S, plain)
        R = S - C[np.argmax(S @ C.T, axis=1)]
        e_resid = qerr(R, resid)
        assert e_resid <= e_plain * 1.05, (e_plain, e_resid)

    def test_pq_codes_reconstruct(self):
        """Encoding picks the L2-nearest centroid per subspace: the
        quantization error must be strictly smaller than against a
        random other centroid choice, and codes are within [0, ks)."""
        ds = rd.read_parquet(f"{SF}/embeddings.parquet")
        books = similarity.fit_pq_codebooks(ds, m=8, ks=32, sample_n=256)
        import pyarrow.parquet as pq

        t = pq.read_table(f"{SF}/embeddings.parquet")
        E = np.stack([np.asarray(v, dtype=np.float64)
                      for v in t["embedding"].to_pylist()])
        En = E / np.linalg.norm(E, axis=1, keepdims=True)
        codes = similarity._pq_encode(En, books)
        assert codes.min() >= 0 and codes.max() < 32
        m, ks, dsub = books.shape
        err = 0.0
        err_alt = 0.0
        rng = np.random.default_rng(7)
        for j in range(m):
            X = En[:, j * dsub:(j + 1) * dsub]
            err += ((X - books[j][codes[:, j]]) ** 2).sum()
            alt = (codes[:, j] + rng.integers(1, ks, len(X))) % ks
            err_alt += ((X - books[j][alt]) ** 2).sum()
        assert err < err_alt

    def test_fit_pq_distributed_100k(self):
        """The distributed PQ-codebook refinement on a corpus far
        larger than the driver init sample: 100k vectors, one refine
        pass (plus a hash-sampled pass), driver holding only the
        (m, ks, dsub) matrix. Refinement must not worsen — and on an
        under-sampled init should improve — the corpus quantization
        error measured on a holdout slice."""
        rng = np.random.default_rng(11)
        n, dim, m, ks = 100_000, 16, 4, 32
        V = rng.normal(size=(n, dim))
        V = V / np.linalg.norm(V, axis=1, keepdims=True)
        df = pd.DataFrame({
            "vec_id": np.arange(n, dtype=np.int64),
            "embedding": [v.tolist() for v in V],
        })
        ds = rd.from_pandas(df).repartition(16)
        # deliberately tiny init sample so refinement has room to help
        B0 = similarity.fit_pq_codebooks(ds, m=m, ks=ks, sample_n=128,
                                         refine_iters=0)
        B1 = similarity.fit_pq_codebooks(ds, m=m, ks=ks, sample_n=128,
                                         refine_iters=1)
        Bs = similarity.fit_pq_codebooks(ds, m=m, ks=ks, sample_n=128,
                                         refine_iters=1,
                                         refine_sample_mod=4)
        assert B0.shape == B1.shape == Bs.shape == (m, ks, dim // m)

        def qerr(B):
            S = V[:4096]
            codes = similarity._pq_encode(S, B)
            dsub = dim // m
            return sum(((S[:, j * dsub:(j + 1) * dsub]
                         - B[j][codes[:, j]]) ** 2).sum()
                       for j in range(m))

        e0, e1, es = qerr(B0), qerr(B1), qerr(Bs)
        assert e1 <= e0 + 1e-6, (e0, e1)
        assert es <= e0 + 1e-6, (e0, es)

    def test_fit_centroids_distributed_100k(self):
        """The distributed Lloyd refinement path on a corpus far larger
        than the driver init sample: 100k vectors, auto-scaled
        n_centroids, one refine pass. The driver only ever holds the
        init sample and the centroid matrix; this asserts the result
        shape/norms and that refinement does not worsen the sample
        quantization error."""
        rng = np.random.default_rng(7)
        n, dim = 100_000, 16
        V = rng.normal(size=(n, dim))
        V = V / np.linalg.norm(V, axis=1, keepdims=True)
        df = pd.DataFrame({
            "vec_id": np.arange(n, dtype=np.int64),
            "embedding": [v.tolist() for v in V],
        })
        ds = rd.from_pandas(df).repartition(16)
        k = similarity.auto_centroid_count(n)
        assert k == n // 1024
        C0 = similarity.fit_centroids(ds, None, sample_n=512,
                                      refine_iters=0)
        C1 = similarity.fit_centroids(ds, None, sample_n=512,
                                      refine_iters=1)
        assert C1.shape == (k, dim) == C0.shape
        assert np.allclose(np.linalg.norm(C1, axis=1), 1.0)
        S = V[:4096]
        err0 = 1.0 - np.max(S @ C0.T, axis=1).mean()
        err1 = 1.0 - np.max(S @ C1.T, axis=1).mean()
        assert err1 <= err0 + 1e-6, (err0, err1)

    def test_semantic_dedup_recall_gate(self):
        """Multi-probe cluster_pairs must recover >= 0.8 of the exact
        cosine pair set (and never invent a pair) — the regression
        gate for centroid/probe changes. Measured 0.84 at probes=3 on
        this corpus; probes=1 sits at 0.28, so the gate genuinely
        discriminates."""
        from go_fluentd_ray.functions import semdedup

        ds = rd.read_parquet(f"{SF}/embeddings.parquet")
        out = semdedup.semantic_dedup_recall(ds, threshold=0.30)
        assert float(out["pair_recall"].iloc[0]) >= 0.8, out
        assert float(out["pair_precision"].iloc[0]) == 1.0, out
        assert int(out["n_exact_pairs"].iloc[0]) > 0


class TestText:
    def _one(self, fn, text):
        t = pa.table({"doc_id": [1], "text": [text]})
        return fn(t).to_pylist()[0]

    def test_token_count(self):
        assert self._one(T.token_count_batch, "a bb  ccc!")["n_tokens"] == 3

    def test_quality_monotonic(self):
        good = self._one(T.quality_batch,
                         "the quick fox and a dog run to the barn in a line")
        bad = self._one(T.quality_batch, "@@!! ## $$ %%")
        assert good["quality"] > bad["quality"]

    def test_langid(self):
        t = pa.table({"doc_id": [1, 2, 3],
                      "text": ["the cat and the dog is here",
                               "el perro de la casa que una",
                               "@@@@"]})
        out = T.LangId()(t).to_pylist()
        assert out[0]["lang_pred"] == "en"
        assert out[1]["lang_pred"] == "es"
        assert out[2]["lang_pred"] == "unknown"

    def test_fingerprint_deterministic_and_shift_invariant(self):
        t = pa.table({"doc_id": [1, 2],
                      "text": ["abcdefghij klmnop qrstuv",
                               "abcdefghij klmnop qrstuv"]})
        out = T.fingerprint_batch(t).to_pylist()
        assert out[0]["fp_xor"] == out[1]["fp_xor"]
        assert out[0]["n_fp"] > 0


class TestEvents:
    def test_sessionize_hand_case(self):
        df = pd.DataFrame({
            "event_id": range(5),
            "user_id": [1] * 5,
            "ts": pd.to_datetime(["2024-01-01 00:00", "2024-01-01 00:10",
                                  "2024-01-01 01:00", "2024-01-01 01:20",
                                  "2024-01-01 03:00"]),
            "event_type": ["a"] * 5, "value": [1.0] * 5,
            "props": ['{"k": 1}'] * 5,
        })
        out = events.sessionize(rd.from_pandas(df)).to_pandas()
        out = out.sort_values("session_idx")
        assert list(out["n_events"]) == [2, 2, 1]
        assert out.iloc[0]["duration_sec"] == 600.0

    def test_hourly_parse(self):
        ds = rd.read_parquet(f"{SF}/events.parquet")
        out = events.events_hourly(ds).to_pandas()
        assert out["n"].sum() == 1000
        assert (out["sum_k"] >= 0).all()


class TestMultimodal:
    def test_meta_and_features(self):
        t = pa.table({"doc_id": [1], "text": ["hello"]})
        with_payload = multimodal.attach_payload_batch(t)
        out = multimodal.MultimodalExtract()(with_payload)
        r = out.to_pylist()[0]
        assert r["format"] == "img0" and r["payload_len"] == 9
        assert len(r["features"]) == 8
        # deterministic
        out2 = multimodal.MultimodalExtract()(with_payload)
        assert out.equals(out2)

    def test_strict_raises_on_unknown_format(self):
        t = pa.table({"doc_id": [1], "payload": [b"BAD!data"]})
        with pytest.raises(NotImplementedError):
            multimodal.MultimodalExtract(strict=True)(t)

    @staticmethod
    def _png(rows, color_type=0):
        """Minimal PNG encoder for tests: 8-bit non-interlaced,
        pre-filtered scanlines (each row = (filter_type, samples))."""
        import struct
        import zlib as _z

        def chunk(tag, data):
            return (struct.pack(">I", len(data)) + tag + data
                    + struct.pack(">I", _z.crc32(tag + data)))

        ch = {0: 1, 2: 3, 6: 4}[color_type]
        h, w = len(rows), len(rows[0][1]) // ch
        ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
        raw = b"".join(bytes([f]) + bytes(r) for f, r in rows)
        return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
                + chunk(b"IDAT", _z.compress(raw)) + chunk(b"IEND", b""))

    def test_real_png_decode(self):
        """A real 2x4 grayscale PNG decodes to real pixel features in
        EVERY container: PIL when present, the pure zlib+struct tier
        otherwise (multimodal.png_to_gray). No skips."""
        png = self._png([(0, [0, 85, 170, 255]),
                         (0, [0, 85, 170, 255])])
        t = pa.table({"doc_id": [1], "payload": [png]})
        out = multimodal.MultimodalExtract(feature_dim=4)(t).to_pylist()[0]
        assert out["format"] == "png"
        assert len(out["features"]) == 4
        assert any(f > 0 for f in out["features"])  # real pixels, not zeros
        # pure tier gives exact column means regardless of PIL presence
        gray = multimodal.png_to_gray(png)
        assert gray.shape == (2, 4)
        assert np.allclose(gray[0] * 255.0, [0, 85, 170, 255])

    def test_png_filter_reconstruction_all_types(self):
        """Each PNG filter type (Sub/Up/Average/Paeth) reconstructs to
        the same pixels as the unfiltered encoding of the same image."""
        import random

        rng = random.Random(7)
        pix = [[rng.randrange(256) for _ in range(6)] for _ in range(4)]

        def fwd(ftype, row, prev):
            out = []
            for i, x in enumerate(row):
                a = row[i - 1] if i else 0
                b = prev[i]
                c = prev[i - 1] if i else 0
                if ftype == 1:
                    pred = a
                elif ftype == 2:
                    pred = b
                elif ftype == 3:
                    pred = (a + b) >> 1
                else:  # Paeth
                    p = a + b - c
                    pa_, pb, pc_ = abs(p - a), abs(p - b), abs(p - c)
                    pred = (a if pa_ <= pb and pa_ <= pc_
                            else b if pb <= pc_ else c)
                out.append((x - pred) & 0xFF)
            return out

        want = multimodal.png_to_gray(
            self._png([(0, r) for r in pix]))
        for ftype in (1, 2, 3, 4):
            rows, prev = [], [0] * 6
            for r in pix:
                rows.append((ftype, fwd(ftype, r, prev)))
                prev = r
            got = multimodal.png_to_gray(self._png(rows))
            assert np.allclose(got, want), f"filter {ftype} mismatch"

    def test_rgb_png_luma(self):
        """Color-type-2 PNG: pure tier converts via ITU-R 601-2 luma."""
        png = self._png([(0, [255, 0, 0, 0, 255, 0, 0, 0, 255])],
                        color_type=2)
        gray = multimodal.png_to_gray(png)
        assert np.allclose(gray[0] * 255.0,
                           [255 * .299, 255 * .587, 255 * .114])

    def test_real_wav_decode(self):
        """A real 16-bit PCM WAV decodes through soundfile when present
        or the stdlib ``wave`` tier otherwise. No skips."""
        import io as _io
        import wave as _wave

        buf = _io.BytesIO()
        with _wave.open(buf, "wb") as wf:
            wf.setnchannels(1)
            wf.setsampwidth(2)
            wf.setframerate(8000)
            wf.writeframes(np.array([0, 16384, -16384, 32767],
                                    dtype="<i2").tobytes())
        payload = buf.getvalue()
        assert payload[:4] == b"RIFF"
        t = pa.table({"doc_id": [1], "payload": [payload]})
        out = multimodal.MultimodalExtract(feature_dim=2)(t).to_pylist()[0]
        assert out["format"] == "wav"
        # mean |amplitude| over 2 slices: (0 + .5)/2 and (.5 + ~1)/2
        assert abs(out["features"][0] - 0.25) < 1e-3
        assert abs(out["features"][1] - 0.75) < 1e-3

    def test_corrupt_payload_degrades_to_unknown_zeros(self):
        """Corrupt magic-bearing payloads must not kill a run: decode
        failure degrades to 'unknown' + zero features in every tier
        (and raises only in strict mode)."""
        t = pa.table({"doc_id": [1, 2],
                      "payload": [b"\x89PNG fake image bytes",
                                  b"RIFF not really a wav"]})
        out = multimodal.MultimodalExtract(feature_dim=4)(t).to_pylist()
        for r in out:
            assert r["format"] == "unknown"
            assert r["features"] == [0.0, 0.0, 0.0, 0.0]
        with pytest.raises(Exception):
            multimodal.MultimodalExtract(feature_dim=4, strict=True)(t)


class TestFlatten:
    """Mirrors reference TestFlattenMap (library/utils_test.go:11-54)."""

    def test_flatten_obj(self):
        from go_fluentd_ray.functions.jsonutil import flatten_obj
        assert flatten_obj({"a": {"b": {"c": 1}}, "d": 2}) == {
            "a__b__c": "1", "d": "2"}
        assert flatten_obj({"a": {"b": 1, "c": "x"}}, joiner=".") == {
            "a.b": "1", "a.c": "x"}
        assert flatten_obj({}) == {}

    def test_flatten_batch(self):
        from go_fluentd_ray.functions.jsonutil import flatten_json_batch
        t = pa.table({"j": ['{"a": {"b": 2}, "k": "v"}', "not json",
                            None, "[1,2]"]})
        out = flatten_json_batch(t, "j")
        vals = out["extra"].to_pylist()
        assert dict(vals[0]) == {"a__b": "2", "k": "v"}
        assert vals[1] is None and vals[2] is None and vals[3] is None


class TestJoins:
    def test_asof_hand_case(self):
        from go_fluentd_ray.functions import joins
        df = pd.DataFrame({
            "event_id": [1, 2, 3, 4],
            "user_id": [1, 1, 1, 2],
            "event_type": ["signup", "purchase", "purchase", "purchase"],
            "ts": pd.to_datetime(["2024-01-01 00:00", "2024-01-01 01:00",
                                  "2024-01-01 02:00", "2024-01-01 03:00"]),
            "value": [0.0] * 4, "props": ["{}"] * 4,
        })
        out = joins.asof_signup_lag(rd.from_pandas(df)).to_pandas()
        out = out.sort_values("event_id")
        assert list(out["event_id"]) == [2, 3, 4]
        assert out.iloc[0]["lag_sec"] == 3600.0
        assert out.iloc[1]["lag_sec"] == 7200.0
        assert pd.isna(out.iloc[2]["lag_sec"])  # user 2 never signed up

    def test_broadcast_dim_join(self):
        from go_fluentd_ray.functions import joins
        ev = pd.DataFrame({"event_id": [1, 2], "user_id": [5, 999]})
        dim = pd.DataFrame({"c_custkey": [5], "c_name": ["five"]})
        out = joins.broadcast_dim_join(rd.from_pandas(ev), dim).to_pandas()
        out = out.sort_values("event_id")
        assert out.iloc[0]["c_name"] == "five"
        assert pd.isna(out.iloc[1]["c_name"])  # left join null

    def test_order_revenue_topn_vs_pandas(self):
        """Q3-shaped large-large hash join against a pure-pandas
        reference on the sf0.001 tables."""
        from go_fluentd_ray.functions import joins
        li = pd.read_parquet(f"{SF}/lineitem.parquet",
                             columns=["l_orderkey", "l_extendedprice",
                                      "l_discount", "l_shipdate"])
        od = pd.read_parquet(f"{SF}/orders.parquet",
                             columns=["o_orderkey", "o_custkey",
                                      "o_orderdate", "o_orderpriority"])
        cu = pd.read_parquet(f"{SF}/customer.parquet",
                             columns=["c_custkey", "c_mktsegment"])
        cut = pd.Timestamp("1995-03-15")
        keys = set(cu.loc[cu["c_mktsegment"] == "BUILDING", "c_custkey"])
        odf = od[(od["o_orderdate"] < cut) & od["o_custkey"].isin(keys)]
        lif = li[li["l_shipdate"] > cut].copy()
        lif["rev"] = lif["l_extendedprice"] * (1 - lif["l_discount"])
        exp = (lif.groupby("l_orderkey")["rev"].sum().reset_index()
               .merge(odf, left_on="l_orderkey", right_on="o_orderkey"))
        exp["revenue"] = exp["rev"].round(4)
        exp = (exp.sort_values(["revenue", "l_orderkey"],
                               ascending=[False, True]).head(10)
               [["l_orderkey", "revenue", "o_orderdate",
                 "o_orderpriority"]].reset_index(drop=True))
        out = joins.order_revenue_topn(
            rd.from_pandas(li), rd.from_pandas(od),
            rd.from_pandas(cu)).to_pandas().reset_index(drop=True)
        pd.testing.assert_frame_equal(out, exp, check_dtype=False)

    def test_customers_without_orders_vs_pandas(self):
        from go_fluentd_ray.functions import joins
        od = pd.read_parquet(f"{SF}/orders.parquet",
                             columns=["o_custkey", "o_orderdate"])
        cu = pd.read_parquet(f"{SF}/customer.parquet",
                             columns=["c_custkey", "c_mktsegment"])
        since = pd.Timestamp("1998-06-01")
        recent = set(od.loc[od["o_orderdate"] >= since, "o_custkey"])
        exp = (cu[~cu["c_custkey"].isin(recent)]
               .groupby("c_mktsegment").size().rename("n_customers")
               .reset_index().sort_values("c_mktsegment")
               .reset_index(drop=True))
        assert len(exp) > 0  # non-degenerate on this corpus
        out = (joins.customers_without_orders(
            rd.from_pandas(cu), rd.from_pandas(od)).to_pandas()
            .sort_values("c_mktsegment").reset_index(drop=True))
        pd.testing.assert_frame_equal(out, exp, check_dtype=False)


class TestMultimodalStages:
    def test_resize_stub(self):
        t = pa.table({"doc_id": [1],
                      "payload": [multimodal.MAGIC + b"x" * 200]})
        out = multimodal.ResizeStub(max_bytes=10)(t)
        p = out["payload"][0].as_py()
        assert p[:4] == multimodal.MAGIC and len(p) == 14

    def test_frame_sampling_fanout(self):
        t = pa.table({"doc_id": [7],
                      "payload": [multimodal.MAGIC + bytes(range(128))]})
        out = multimodal.frame_sample_batch(t, frame_bytes=16, every=4)
        assert out["frame_idx"].to_pylist() == [0, 4]  # 8 frames, every 4th
        assert len(out["frame"][0].as_py()) == 16
        assert out["doc_id"].to_pylist() == [7, 7]


def test_bpe_token_count():
    t = pa.table({"doc_id": [1], "text": ["it's all good, isn't it?"]})
    out = T.bpe_token_count_batch(t).to_pylist()[0]
    assert out["n_bpe_tokens"] > 5


class TestGrok:
    def test_compiles_to_named_groups(self):
        from go_fluentd_ray.functions.grok import compile_grok
        pat = compile_grok(r"%{TIMESTAMP_ISO8601:time} \| %{PIPE_FIELD:app}"
                           r" \| %{LOGLEVEL:level}")
        import re
        m = re.search(pat, "2024-01-01 10:00:00.123 | paysvc | INFO")
        assert m and m.group("app") == "paysvc" and m.group("level") == "INFO"

    def test_grok_equivalent_to_spring_parser(self):
        """The flagship spring pattern expressed in grok parses the same
        line to the same groups — and runs through pc.extract_regex."""
        import pyarrow.compute as pc
        from go_fluentd_ray.functions.grok import compile_grok
        pat = compile_grok(
            r"^%{TIMESTAMP_ISO8601:time} \| %{PIPE_FIELD:app} \| "
            r"%{PIPE_FIELD:level} \| %{PIPE_FIELD:thread} \| "
            r"%{PIPE_FIELD:class_name} \| %{INT:line}: %{GREEDYDATA:message}$")
        line = ("2024-01-01 00:00:01.300 | paysvc | INFO | th-1 | "
                "com.x.Y | 147: hello\nworld")
        ex = pc.extract_regex(pa.array([line]), pat)
        r = ex.to_pylist()[0]
        assert r["app"] == "paysvc" and r["message"] == "hello\nworld"

    def test_unknown_pattern_raises(self):
        from go_fluentd_ray.functions.grok import compile_grok
        with pytest.raises(KeyError):
            compile_grok("%{NOPE:x}")

    def test_unnamed_noncapturing(self):
        from go_fluentd_ray.functions.grok import compile_grok
        import re
        pat = compile_grok("%{INT} %{WORD:w}")
        m = re.search(pat, "42 abc")
        assert m.groupdict() == {"w": "abc"}


class TestIdCounter:
    """Raw-actor shared counter (WAL id analogue, acceptor.go:74-95)."""

    def test_unique_dense_ids(self):
        from go_fluentd_ray.state.id_counter import assign_ids
        ds = rd.range(5000).map_batches(
            lambda d: {"x": d["id"]}, batch_format="numpy")
        out = assign_ids(ds).to_pandas()
        ids = sorted(out["msg_id"])
        assert ids == list(range(5000))  # unique AND dense

    def test_rotation_ids_stay_below_cap(self):
        import ray as _ray
        from go_fluentd_ray.state.id_counter import IdCounter
        c = IdCounter.remote(start=0, max_rotate=100)
        assert _ray.get(c.alloc.remote(60)) == 0
        # 60+60 > 100 -> wrap BEFORE allocating: every id stays < 100
        # (rotation reuses ids, like the reference's max_rotate_id;
        # dedup of rotated ids is downstream's responsibility)
        assert _ray.get(c.alloc.remote(60)) == 0
        assert _ray.get(c.current.remote()) == 60

    def test_reconsumption_stable(self):
        """assign_ids materializes: consuming the result twice must not
        re-allocate ranges (review finding)."""
        from go_fluentd_ray.state.id_counter import assign_ids
        ds = rd.range(1000).map_batches(
            lambda d: {"x": d["id"]}, batch_format="numpy")
        out = assign_ids(ds)
        out.count()  # first consumption
        ids = sorted(out.to_pandas()["msg_id"])  # second consumption
        assert ids == list(range(1000))


def test_running_totals_null_semantics():
    """SQL running-SUM semantics: nulls skipped, total carried forward,
    all-null prefix stays NULL (review finding)."""
    df = pd.DataFrame({
        "event_id": [1, 2, 3, 4],
        "user_id": [1] * 4,
        "ts": pd.to_datetime(["2024-01-01 00:00", "2024-01-01 00:01",
                              "2024-01-01 00:02", "2024-01-01 00:03"]),
        "event_type": ["a"] * 4,
        "value": [None, 2.0, None, 3.0],
        "props": ["{}"] * 4,
    })
    out = events.running_totals(rd.from_pandas(df)).to_pandas()
    out = out.sort_values("event_id")
    vals = out["running_value"].tolist()
    assert pd.isna(vals[0])          # all-null prefix -> NULL
    assert vals[1] == 2.0
    assert vals[2] == 2.0            # null skipped, total carried
    assert vals[3] == 5.0


def test_grok_data_not_dotall_when_greedydata_present():
    """Review finding: GREEDYDATA's DOTALL must be scoped to itself."""
    import re
    from go_fluentd_ray.functions.grok import compile_grok
    pat = compile_grok("%{DATA:a}X %{GREEDYDATA:rest}")
    m = re.search(pat, "line1\nline2X restof")
    assert m and m.group("a") == "line2"


class TestSampling:
    """Deterministic sampling / quota / chunking operators."""

    def test_hash_sample_deterministic_and_rate(self):
        from go_fluentd_ray.functions import sampling

        df = pd.DataFrame({"doc_id": np.arange(2000, dtype=np.int64),
                           "text": ["x"] * 2000})
        a = sampling.hash_sample(rd.from_pandas(df), 20).to_pandas()
        b = sampling.hash_sample(rd.from_pandas(df), 20).to_pandas()
        assert set(a["doc_id"]) == set(b["doc_id"])  # run-to-run stable
        assert 0.15 < len(a) / 2000 < 0.25
        # monotone: a higher rate strictly contains a lower rate
        c = sampling.hash_sample(rd.from_pandas(df), 50).to_pandas()
        assert set(a["doc_id"]) <= set(c["doc_id"])

    def test_quota_per_key(self):
        from go_fluentd_ray.functions import sampling

        df = pd.DataFrame({
            "doc_id": np.arange(100, dtype=np.int64),
            "lang": ["en"] * 60 + ["de"] * 40,
            "n_chars": np.concatenate([np.arange(60), np.arange(40)]),
        })
        out = sampling.quota_per_key(rd.from_pandas(df), n=5).to_pandas()
        assert len(out) == 10
        en = out[out["lang"] == "en"]["n_chars"]
        assert sorted(en) == [55, 56, 57, 58, 59]  # top-5 longest per key

    def test_quota_per_key_high_cardinality(self):
        """The bucketed global stage must stay exact when the key
        domain is unbounded (one key per few rows — the 'cap each
        source URL' shape): compare against a pandas reference."""
        from go_fluentd_ray.functions import sampling

        rng = np.random.default_rng(7)
        n = 3000
        df = pd.DataFrame({
            "doc_id": np.arange(n, dtype=np.int64),
            "lang": [f"site-{i}" for i in rng.integers(0, 1000, n)],
            "n_chars": rng.integers(0, 10_000, n),
        })
        out = sampling.quota_per_key(rd.from_pandas(df), n=2,
                                     num_buckets=16).to_pandas()
        want = (df.sort_values(["lang", "n_chars", "doc_id"],
                               ascending=[True, False, True],
                               kind="mergesort")
                .groupby("lang", sort=False).head(2))
        assert sorted(out["doc_id"]) == sorted(want["doc_id"])

    def test_split_assign_deterministic_partition(self):
        from go_fluentd_ray.functions import sampling

        df = pd.DataFrame({"doc_id": np.arange(3000, dtype=np.int64)})
        a = sampling.split_assign(rd.from_pandas(df)).to_pandas()
        b = sampling.split_assign(rd.from_pandas(df)).to_pandas()
        a = a.sort_values("doc_id").reset_index(drop=True)
        b = b.sort_values("doc_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b)      # run-to-run stable
        assert len(a) == 3000                    # a partition, not a sample
        frac = a["split"].value_counts(normalize=True)
        assert 0.06 < frac["test"] < 0.14
        assert 0.06 < frac["val"] < 0.14
        assert frac["train"] > 0.72
        # growing the corpus never reassigns an existing row's split
        big = pd.DataFrame({"doc_id": np.arange(6000, dtype=np.int64)})
        c = (sampling.split_assign(rd.from_pandas(big)).to_pandas()
             .sort_values("doc_id").reset_index(drop=True))
        pd.testing.assert_frame_equal(c.iloc[:3000].reset_index(drop=True), a)

    def test_split_assign_matches_sql_twin(self):
        import duckdb

        from go_fluentd_ray.functions import sampling

        df = pd.DataFrame({"doc_id": np.arange(500, dtype=np.int64)})
        got = (sampling.split_assign(rd.from_pandas(df)).to_pandas()
               .sort_values("doc_id").reset_index(drop=True))
        con = duckdb.connect()
        con.register("documents", df)
        want = (con.execute(sampling.split_assign_sql()).df()
                .sort_values("doc_id").reset_index(drop=True))
        pd.testing.assert_frame_equal(got, want)

    def test_chunk_documents_windows(self):
        from go_fluentd_ray.functions import sampling

        text = "abcdefghij" * 100  # 1000 chars
        df = pd.DataFrame({"doc_id": [7, 8],
                           "text": [text, "short"]})
        out = (sampling.chunk_documents(rd.from_pandas(df),
                                        width=400, stride=300)
               .to_pandas().sort_values(["doc_id", "chunk_idx"]))
        d7 = out[out["doc_id"] == 7]
        # starts 0, 300, 600, 900 -> 4 chunks; overlap of 100 chars
        assert list(d7["chunk_idx"]) == [0, 1, 2, 3]
        assert d7.iloc[0]["chunk"] == text[0:400]
        assert d7.iloc[1]["chunk"][:100] == text[300:400]
        assert d7.iloc[3]["chunk"] == text[900:1000]  # short tail
        d8 = out[out["doc_id"] == 8]
        assert list(d8["chunk"]) == ["short"]


class TestComponents:
    """Connected components by iterative bucketed min-label propagation
    with pointer doubling (functions/components.py)."""

    def test_hand_graph(self):
        from go_fluentd_ray.functions.components import connected_components

        pairs = pd.DataFrame({"a": [1, 2, 3, 5], "b": [2, 3, 9, 6]})
        comp = (connected_components(rd.from_pandas(pairs))
                .to_pandas().set_index("n")["root"].to_dict())
        assert comp == {1: 1, 2: 1, 3: 1, 9: 1, 5: 5, 6: 5}

    def test_chain_converges_log_rounds(self):
        from go_fluentd_ray.functions.components import connected_components

        n = 30  # worst-case diameter for plain propagation
        pairs = pd.DataFrame({"a": np.arange(n - 1, dtype=np.int64),
                              "b": np.arange(1, n, dtype=np.int64)})
        comp = connected_components(rd.from_pandas(pairs)).to_pandas()
        assert (comp["root"] == 0).all() and len(comp) == n

    def test_both_paths_agree(self):
        """The single-task union-find fast path and the iterative
        bucketed path must produce identical (n, root) labelings on a
        random multi-component graph (forced via small_graph_edges)."""
        from go_fluentd_ray.functions.components import connected_components

        rng = np.random.default_rng(5)
        a = rng.integers(0, 400, 600).astype(np.int64)
        b = rng.integers(0, 400, 600).astype(np.int64)
        keep = a != b
        pairs = pd.DataFrame({"a": a[keep], "b": b[keep]})
        s_uf, s_it = {}, {}
        uf = (connected_components(rd.from_pandas(pairs), stats=s_uf)
              .to_pandas().sort_values("n").reset_index(drop=True))
        it = (connected_components(rd.from_pandas(pairs), stats=s_it,
                                   small_graph_edges=0)
              .to_pandas().sort_values("n").reset_index(drop=True))
        assert s_uf["path"] == "unionfind" and s_it["path"] == "iterative"
        assert uf.equals(it)
        # min-id invariant: every root is the min node of its component
        g = uf.groupby("root")["n"].min()
        assert (g.index == g.to_numpy()).all()

    def test_dedup_rows_by_components(self):
        from go_fluentd_ray.functions.components import (
            dedup_rows_by_components)

        pairs = pd.DataFrame({"a": [1, 2, 5], "b": [2, 3, 6]})
        corpus = pd.DataFrame({
            "doc_id": np.arange(10, dtype=np.int64),
            "text": [f"d{i}" for i in range(10)],
            "n": np.arange(10, dtype=np.int32),  # int col survives
        })
        out = dedup_rows_by_components(
            rd.from_pandas(corpus), rd.from_pandas(pairs),
            "doc_id").to_pandas()
        assert sorted(out["doc_id"]) == [0, 1, 4, 5, 7, 8, 9]
        assert str(out["n"].dtype) == "int32"  # schema restored


def test_flatten_matches_duckdb_json_extract_string():
    """flatten_obj's value stringification must agree with DuckDB's
    json_extract_string (booleans lowercase, null -> null value,
    arrays as compact JSON) or the flagship_json_extra oracle breaks
    the moment the corpus carries such values."""
    import json as _json

    import duckdb

    from go_fluentd_ray.functions.jsonutil import flatten_obj

    obj = {"b": True, "no": False, "n": None, "f": 1.5, "i": 7,
           "arr": [1, 2, "a"], "x": "s", "nest": {"y": True}}
    flat = flatten_obj(obj)
    con = duckdb.connect()
    j = _json.dumps(obj)
    for key, val in flat.items():
        path = "$." + key.replace("__", ".")
        sql_val = con.sql(
            "SELECT json_extract_string(?::JSON, ?)", params=[j, path]
        ).fetchone()[0]
        assert sql_val == val, (key, sql_val, val)


def test_embedding_lsh_degenerate_identical_cluster():
    """>MAX_BUCKET identical vectors: every LSH bucket is over-cap; the
    vsig anchor fallback must still connect the cluster (n-1 pairs to
    the min vec_id) instead of silently dropping it."""
    from go_fluentd_ray.functions import dedup

    n = 400  # > MAX_BUCKET (256)
    v = np.full(8, 0.5)
    df = pd.DataFrame({
        "vec_id": np.arange(n, dtype=np.int64),
        "embedding": [v.copy() for _ in range(n)],
    })
    out = dedup.embedding_dup_lsh(rd.from_pandas(df),
                                  threshold=0.95).to_pandas()
    assert len(out) == n - 1
    assert (out["a"] == 0).all() and (out["cos"] == 1.0).all()


def test_pack_documents_greedy_semantics():
    """Greedy packing: sequences fill to the budget; an oversize doc
    gets its own sequence; accumulation resets after a close."""
    from go_fluentd_ray.functions import sampling

    texts = ["w " * 300,   # 300 tokens
             "w " * 300,   # 300 -> 600 > 512: closes seq0, starts seq1
             "w " * 600,   # oversize: closes seq1, alone in seq2
             "w " * 100,   # seq3 (previous was oversize, acc=600)
             "w " * 100]   # still seq3 (200 <= 512)
    df = pd.DataFrame({"doc_id": np.arange(5, dtype=np.int64) * 32,
                       "text": [t.strip() for t in texts]})
    # doc_ids multiples of 32 -> all in bucket 0, packed in order
    out = (sampling.pack_documents(rd.from_pandas(df))
           .to_pandas().sort_values("doc_id"))
    assert list(out["seq_idx"]) == [0, 1, 2, 3, 3]
    assert (out["bucket"] == 0).all()
    assert list(out["n_tokens"]) == [300, 300, 600, 100, 100]


def test_lm_score_separates_fluent_from_noise():
    """Char-trigram LM bits-per-char: reference-like text must score
    lower (more probable) than character noise; deterministic across
    runs."""
    from go_fluentd_ray.functions import text as T

    base = pd.DataFrame({
        "doc_id": np.arange(40, dtype=np.int64),
        "text": ["the quick brown fox jumps over the lazy dog again"] * 38
        + ["zq xv jj qq kk pp zz xx vv ww yy qq zz xv jq",
           "@@@@ #### $$$$ %%%% ^^^^ &&&& **** (((( ))))"],
    })
    out = T.lm_score(rd.from_pandas(base)).to_pandas().set_index("doc_id")
    fluent = out.loc[0, "lm_bits_per_char"]
    noise1 = out.loc[38, "lm_bits_per_char"]
    noise2 = out.loc[39, "lm_bits_per_char"]
    assert fluent < noise1 and fluent < noise2
    out2 = T.lm_score(rd.from_pandas(base)).to_pandas().set_index("doc_id")
    assert (out["lm_bits_per_char"] == out2["lm_bits_per_char"]).all()


def test_pack_zero_token_doc_sql_parity():
    """Review regression: a zero-token doc (acc stays 0) followed by an
    oversize doc must pack identically in Ray and the recursive-CTE
    oracle (the SQL needs the same acc > 0 guard as the Python scan)."""
    import duckdb

    from go_fluentd_ray.functions import sampling

    df = pd.DataFrame({
        "doc_id": np.array([0, 32, 64], dtype=np.int64),  # one bucket
        "text": ["!!! ### $$$",          # 0 tokens
                 "w " * 600,             # oversize (600 > 512)
                 "w " * 100],
    })
    out = (sampling.pack_documents(rd.from_pandas(df))
           .to_pandas().sort_values("doc_id"))
    assert list(out["seq_idx"]) == [0, 0, 1]
    con = duckdb.connect()
    con.register("documents", df)
    sql = (con.sql(sampling.pack_documents_sql())
           .df().sort_values("doc_id"))
    assert list(sql["seq_idx"]) == [0, 0, 1]


class TestSketches:
    def test_hll_accuracy_and_merge(self):
        import numpy as _np

        from go_fluentd_ray.functions.sketches import (hll_estimate,
                                                       hll_registers)

        whole = hll_registers(list(range(100_000)))
        a = hll_registers(list(range(0, 60_000)))
        b = hll_registers(list(range(40_000, 100_000)))
        merged = _np.maximum(a, b)
        # mergeability: max-merge of overlapping halves == whole sketch
        assert (merged == whole).all()
        est = hll_estimate(whole)
        assert abs(est - 100_000) / 100_000 < 0.05

    def test_approx_distinct_dataset(self):
        from go_fluentd_ray.functions import sketches

        n = 20_000
        df = pd.DataFrame({"user_id": np.arange(n, dtype=np.int64)})
        # several blocks -> several per-batch sketches get merged
        out = sketches.approx_distinct(
            rd.from_pandas(df).repartition(8), "user_id").to_pandas()
        est = int(out["approx_distinct"].iloc[0])
        assert abs(est - n) / n < 0.05

    def test_approx_distinct_by_key_vs_exact(self):
        from go_fluentd_ray.functions import sketches

        ds = rd.read_parquet(f"{SF}/events.parquet")
        got = (sketches.approx_distinct_by_key(ds, "event_type", "user_id")
               .to_pandas().set_index("event_type")["approx_distinct"])
        exact = (ds.to_pandas().groupby("event_type")["user_id"].nunique())
        for k, e in exact.items():
            assert abs(got[k] - e) / max(e, 1) < 0.06, (k, got[k], e)


class TestTopkSketch:
    """Misra-Gries heavy hitters: bounds must CONTAIN the exact counts
    and the true heavy hitters must surface."""

    def _corpus(self, n=400):
        rng = np.random.default_rng(11)
        # skewed vocabulary: 'alpha' dominates, then 'beta', then noise
        words = (["alpha"] * 5 + ["beta"] * 3 + ["gamma"] * 2
                 + [f"w{i}" for i in range(50)])
        texts = [" ".join(rng.choice(words, size=30)) for _ in range(n)]
        return pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64),
                             "text": texts})

    def _exact(self, df):
        from collections import Counter
        import re

        c = Counter()
        for t in df["text"]:
            c.update(re.findall(r"\w+", t))
        return c

    def test_bounds_contain_truth(self):
        from go_fluentd_ray.functions import sketches

        df = self._corpus()
        exact = self._exact(df)
        out = sketches.topk_words_sketch(
            rd.from_pandas(df), k=5, capacity=16, num_buckets=8)
        assert len(out) == 5
        for _, r in out.iterrows():
            true = exact[r["word"]]
            assert r["count_min"] <= true <= r["count_max"], r["word"]
        # the dominant words must surface despite the tiny capacity
        assert {"alpha", "beta"} <= set(out["word"])
        assert out.iloc[0]["word"] == "alpha"

    def test_exact_when_capacity_suffices(self):
        from go_fluentd_ray.functions import aggregates, sketches

        df = self._corpus(100)
        out = sketches.topk_words_sketch(
            rd.from_pandas(df), k=10, capacity=4096, num_buckets=8)
        # capacity >= vocabulary -> zero decrement -> exact counts
        assert (out["count_min"] == out["count_max"]).all()
        exact = aggregates.word_topk(rd.from_pandas(df), k=10)
        assert list(out["word"]) == list(exact["word"])
        assert list(out["count_min"]) == list(exact["n"])


class TestTextClean:
    def test_redaction_and_normalize(self):
        from go_fluentd_ray.functions import textclean

        t = pa.table({"doc_id": [1, 2, 3], "text": [
            "contact bob.smith+x@example.co.uk or 10.0.0.7 now",
            "tab\there\x00ctl  and   runs ",
            "two mails a@b.io c@d.org, ip 192.168.1.1 and 8.8.8.8",
        ]})
        out = textclean.clean_redact_batch(t).to_pylist()
        assert out[0]["clean_text"] == "contact <EMAIL> or <IP> now"
        assert out[0]["n_emails"] == 1 and out[0]["n_ips"] == 1
        assert out[1]["clean_text"] == "tab here ctl and runs"
        assert out[1]["n_emails"] == 0 and out[1]["n_ips"] == 0
        assert out[2]["clean_text"] == \
            "two mails <EMAIL> <EMAIL>, ip <IP> and <IP>"
        assert out[2]["n_emails"] == 2 and out[2]["n_ips"] == 2

    def test_redaction_order_contract(self):
        from go_fluentd_ray.functions import textclean

        # emails redact FIRST (a real-TLD address never re-counts as an
        # IP); an @ with a bare-IP domain is NOT an email (TLD must be
        # alphabetic) so its IP still redacts — both deliberate
        t = pa.table({"doc_id": [1, 2],
                      "text": ["x@mail.example.com plus 5.6.7.8",
                               "x@1.2.3.44 plus 5.6.7.8"]})
        out = textclean.clean_redact_batch(t).to_pylist()
        assert out[0]["n_emails"] == 1 and out[0]["n_ips"] == 1
        assert out[0]["clean_text"] == "<EMAIL> plus <IP>"
        assert out[1]["n_emails"] == 0 and out[1]["n_ips"] == 2
        assert out[1]["clean_text"] == "x@<IP> plus <IP>"


class TestQuantileSketch:
    def test_rank_error_bound_on_skewed_data(self):
        from go_fluentd_ray.functions import sketches

        rng = np.random.default_rng(3)
        vals = np.concatenate([rng.lognormal(3, 2, 20_000),
                               rng.integers(0, 5, 5_000).astype(float)])
        df = pd.DataFrame({"x": vals})
        out = sketches.approx_quantiles(
            rd.from_pandas(df), "x", qs=(0.1, 0.5, 0.9, 0.99),
            per_batch=256).to_pandas()
        assert list(out["q"]) == [0.1, 0.5, 0.9, 0.99]
        srt = np.sort(vals)
        n = len(srt)
        for _, r in out.iterrows():
            # the approx quantile's TRUE rank must be within ~1% of n
            # of the requested rank (bound is N/per_batch per level)
            rank = np.searchsorted(srt, r["value"])
            assert abs(rank - r["q"] * n) < 0.02 * n, (r["q"], rank)

    def test_exact_on_tiny_input(self):
        from go_fluentd_ray.functions import sketches

        df = pd.DataFrame({"x": np.arange(100, dtype=float)})
        out = sketches.approx_quantiles(
            rd.from_pandas(df), "x", qs=(0.5,)).to_pandas()
        assert abs(out.iloc[0]["value"] - 49.5) <= 1.0


class TestRepetition:
    def test_fractions_hand_case(self):
        t = pa.table({"doc_id": [1, 2, 3], "text": [
            "aa bb\naa bb\ncc",          # 3 lines, 1 dup; words aa bb aa bb cc
            "x y z",                     # no repetition
            "",                          # empty: both fracs 0
        ]})
        out = T.repetition_batch(t).to_pylist()
        assert abs(out[0]["dup_line_frac"] - (1 - 2 / 3)) < 1e-12
        assert abs(out[0]["dup_word_frac"] - (1 - 3 / 5)) < 1e-12
        assert out[1]["dup_line_frac"] == 0.0
        assert out[1]["dup_word_frac"] == 0.0
        assert out[2]["dup_word_frac"] == 0.0

    def test_boilerplate_scores_higher(self):
        t = pa.table({"doc_id": [1, 2], "text": [
            "menu item\n" * 40 + "one real sentence here",
            "a genuinely varied sentence with all different words",
        ]})
        out = T.repetition_batch(t).to_pylist()
        assert out[0]["dup_line_frac"] > 0.9 > out[1]["dup_line_frac"]


def test_minhash_vectorized_signatures_match_per_doc():
    """The chunked reduceat batch path must be byte-identical to the
    per-doc signature() — every minhash output depends on it."""
    h = dedup.MinHasher()
    texts = (["hello world this is doc %d " % i * (i % 5 + 1)
              for i in range(40)] + ["ab", "", "x" * 3])
    sigs = h.signatures(texts)
    for i, t in enumerate(texts):
        assert np.array_equal(sigs[i], h.signature(t)), i


class TestCurationPipeline:
    def test_planted_pii_and_dups(self):
        from go_fluentd_ray.pipelines import curation

        long = ("the quick brown fox jumps over the lazy dog again and "
                "again without ever stopping for breath at all")
        df = pd.DataFrame({
            "doc_id": np.arange(6, dtype=np.int64),
            "text": [
                long,                          # kept
                long + "   ",                  # dup after clean -> dropped
                "too short",                   # fails min_tokens
                long + " mail me at a@b.io or c@d.io or e@f.io or g@h.io",
                                               # 4 PII hits > budget
                long + " contact x@y.zz once", # 1 redaction, kept
                long + " unique tail words",   # kept
            ],
        })
        out = curation.curation_pipeline(
            rd.from_pandas(df)).to_pandas()
        assert sorted(out["doc_id"]) == [0, 4, 5]
        r4 = out[out.doc_id == 4].iloc[0]
        assert "<EMAIL>" in r4["clean_text"] and "x@y.zz" not in r4["clean_text"]


class TestPretrainPipeline:
    """Composed blocklist -> span dedup -> token gate -> split pipeline."""

    def test_semantics(self):
        from go_fluentd_ray.pipelines import curation

        span = ("common boilerplate sentence repeated verbatim across "
                "many many documents")
        filler_a = ("alpha bravo charlie delta echo foxtrot golf hotel "
                    "india juliett kilo lima mike november oscar papa")
        filler_b = ("quebec romeo sierra tango uniform victor whiskey "
                    "xray yankee zulu apple banana cherry date elder fig")
        df = pd.DataFrame({
            "doc_id": np.arange(4, dtype=np.int64),
            "text": [
                f"{span} {filler_a} first",
                f"{span} {filler_b} second",   # span removed in both
                "has spark so it is dropped before span counting "
                + filler_a.replace("alpha", "omega"),
                "short tail doc",              # fails token gate
            ],
        })
        out = (curation.pretrain_pipeline(rd.from_pandas(df), min_tokens=10)
               .to_pandas().sort_values("doc_id"))
        assert list(out["doc_id"]) == [0, 1]
        # the blocked doc never contributed to span counts, and the
        # shared span was removed from the survivors
        assert all(span not in t for t in out["clean_text"])
        assert set(out["split"]) <= {"train", "val", "test"}

    def test_matches_sql_twin(self):
        import duckdb

        from go_fluentd_ray.pipelines import curation

        docs = pd.read_parquet("/root/testdata/sf0.001/documents.parquet")
        got = (curation.pretrain_pipeline(rd.from_pandas(docs))
               .to_pandas().sort_values("doc_id").reset_index(drop=True))
        con = duckdb.connect()
        con.register("documents", docs)
        want = (con.execute(curation.pretrain_pipeline_sql()).df()
                .sort_values("doc_id").reset_index(drop=True))
        want["n_tokens"] = want["n_tokens"].astype("int64")
        pd.testing.assert_frame_equal(got, want)
        assert 0 < len(got) < len(docs)  # every stage actually fired


class TestConversationStats:
    """Per-conversation transcript stats + quality gate."""

    def test_hand_case(self):
        from go_fluentd_ray.functions import convstats

        df = pd.DataFrame({
            "conv_id": ["a", "a", "a", "b", "c", "c"],
            "turn_idx": np.array([0, 1, 2, 0, 0, 1], dtype=np.int32),
            "role": ["user", "assistant", "assistant", "user",
                     "user", "user"],
            "text": ["hi", "hello", "hello", "solo", "loop", "loop"],
            "tool": ["", "search", "", "", None, ""],
            "ts": pd.to_datetime([0, 5_000_000, 10_000_000, 0, 0, 0],
                                 unit="us"),
        })
        out = (convstats.conversation_stats(rd.from_pandas(df))
               .to_pandas().set_index("conv_id"))
        a = out.loc["a"]
        assert a["n_turns"] == 3 and a["n_roles"] == 2
        assert a["dup_turn_frac"] == pytest.approx(1 / 3)
        assert a["frac_tool_turns"] == pytest.approx(1 / 3)
        assert a["duration_sec"] == pytest.approx(10.0)
        assert bool(a["conv_pass"])
        assert not bool(out.loc["b", "conv_pass"])   # 1 turn, 1 role
        c = out.loc["c"]                             # all-dup, one role
        assert c["dup_turn_frac"] == pytest.approx(0.5)
        assert not bool(c["conv_pass"])

    def test_matches_sql_twin(self):
        import duckdb

        from go_fluentd_ray import synth
        from go_fluentd_ray.functions import convstats

        path = synth.ensure_corpus(60000)
        got = (convstats.conversation_stats(rd.read_parquet(path))
               .to_pandas().sort_values("conv_id")
               .reset_index(drop=True))
        con = duckdb.connect()
        want = (con.execute(convstats.conversation_stats_sql(path)).df()
                .sort_values("conv_id").reset_index(drop=True))
        for c in ("n_turns", "n_roles"):
            want[c] = want[c].astype("int64")
        pd.testing.assert_frame_equal(got.round(6),
                                      want[got.columns.tolist()].round(6))
        assert 0 < got["conv_pass"].mean() < 1


class TestConversationDedup:
    """Exact-dup conversation detection by turn-ordered signature."""

    def test_planted_dup_and_order_sensitivity(self):
        from go_fluentd_ray.functions import convstats

        rows = []
        for cid, texts in [("a", ["hi", "there"]),
                           ("b", ["hi", "there"]),    # dup of a
                           ("c", ["there", "hi"]),    # reversed != dup
                           ("d", ["solo"])]:
            for i, t in enumerate(texts):
                rows.append(dict(conv_id=cid,
                                 turn_idx=np.int32(i), text=t))
        df = pd.DataFrame(rows)
        out = (convstats.conversation_dedup(rd.from_pandas(df))
               .to_pandas().sort_values("conv_id")
               .reset_index(drop=True))
        assert list(out["conv_id"]) == ["a", "c", "d"]
        assert out.set_index("conv_id")["n_copies"].to_dict() == \
            {"a": 2, "c": 1, "d": 1}

    def test_matches_sql_twin(self):
        import duckdb

        from go_fluentd_ray import synth
        from go_fluentd_ray.functions import convstats

        path = synth.ensure_corpus(60000)
        got = (convstats.conversation_dedup(rd.read_parquet(path))
               .to_pandas().sort_values("conv_id")
               .reset_index(drop=True))
        con = duckdb.connect()
        want = (con.execute(convstats.conversation_dedup_sql(path)).df()
                .sort_values("conv_id").reset_index(drop=True))
        want["n_copies"] = want["n_copies"].astype("int64")
        pd.testing.assert_frame_equal(got, want)
        assert (got["n_copies"] > 1).any()  # the corpus has real dups


class TestRangeJoin:
    """Time-bucketed interval join (count rights within ±window)."""

    def test_hand_case_incl_bucket_boundaries(self):
        from go_fluentd_ray.functions import rangejoin

        W = rangejoin.WINDOW_US
        base = 10 * W  # a bucket boundary
        rows = []
        # left purchase exactly at a boundary; rights straddle it
        rows.append(dict(event_id=1, ts=base, event_type="purchase"))
        for i, off in enumerate([-W, -W - 1, -1, 0, W, W + 1]):
            rows.append(dict(event_id=100 + i, ts=base + off,
                             event_type="signup"))
        df = pd.DataFrame(rows)
        df["ts"] = pd.to_datetime(df["ts"], unit="us")
        out = (rangejoin.range_join_counts(rd.from_pandas(df))
               .to_pandas().set_index("event_id"))
        # inclusive [ts-W, ts+W]: offsets -W, -1, 0, W count; ±(W+1) don't
        assert out.loc[1, "n_nearby"] == 4

    def test_matches_sql_twin(self):
        import duckdb

        from go_fluentd_ray.functions import rangejoin

        ev = pd.read_parquet("/root/testdata/sf0.001/events.parquet")
        got = (rangejoin.range_join_counts(rd.from_pandas(ev))
               .to_pandas().sort_values("event_id")
               .reset_index(drop=True))
        con = duckdb.connect()
        con.register("events", ev)
        want = (con.execute(rangejoin.range_join_counts_sql()).df()
                .sort_values("event_id").reset_index(drop=True))
        want["n_nearby"] = want["n_nearby"].astype("int64")
        pd.testing.assert_frame_equal(got, want)
        assert (got["n_nearby"] > 0).any()


class TestLeakageAudit:
    """Shared distinct n-grams across train/val/test splits."""

    def test_planted_leak(self):
        import hashlib

        from go_fluentd_ray.functions import leakage

        # find one id per split under the md5 % 100 assignment
        by_split = {}
        for i in range(500):
            h = int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % 100
            s = "test" if h < 10 else ("val" if h < 20 else "train")
            by_split.setdefault(s, i)
            if len(by_split) == 3:
                break
        leak = "alpha beta gamma"                 # one shared 3-gram
        df = pd.DataFrame({
            "doc_id": np.array([by_split["train"], by_split["val"],
                                by_split["test"]], dtype=np.int64),
            "text": [f"{leak} trainwords here", f"{leak} valwords here",
                     "totally different test words"],
        })
        out = (leakage.leakage_audit(rd.from_pandas(df)).to_pandas()
               .set_index("pair")["shared_grams"])
        assert out["train|val"] >= 1          # the planted gram
        assert out["train|test"] == 0
        # "words here" suffix shares no 3-gram ("trainwords here" ends)

    def test_matches_sql_twin(self):
        import duckdb

        from go_fluentd_ray.functions import leakage

        docs = pd.read_parquet("/root/testdata/sf0.001/documents.parquet")
        got = leakage.leakage_audit(rd.from_pandas(docs)).to_pandas()
        con = duckdb.connect()
        con.register("documents", docs)
        want = con.execute(leakage.leakage_audit_sql()).df()
        want["shared_grams"] = want["shared_grams"].astype("int64")
        pd.testing.assert_frame_equal(
            got.sort_values("pair").reset_index(drop=True),
            want.sort_values("pair").reset_index(drop=True))
        assert (got["shared_grams"] > 0).any()  # real overlap measured


class TestSelectionPipeline:
    """Composed blocklist -> DSIR score -> top-p% -> split pipeline."""

    def test_matches_sql_twin(self):
        import duckdb

        from go_fluentd_ray.pipelines import curation

        docs = pd.read_parquet("/root/testdata/sf0.001/documents.parquet")
        got = (curation.selection_pipeline(rd.from_pandas(docs))
               .to_pandas().sort_values("doc_id").reset_index(drop=True))
        con = duckdb.connect()
        con.register("documents", docs)
        want = (con.execute(curation.selection_pipeline_sql()).df()
                .sort_values("doc_id").reset_index(drop=True))
        pd.testing.assert_frame_equal(got.round(6), want.round(6))
        # exactly ceil(25%) of the blocklist survivors selected
        import math

        n_kept = con.execute(
            "SELECT count(*) FROM (" +
            __import__("go_fluentd_ray.functions.textclean",
                       fromlist=["textclean"]).badwords_filter_sql() + ")"
        ).fetchone()[0]
        assert len(got) == max(1, math.ceil(n_kept * 25 / 100))
        assert set(got["split"]) <= {"train", "val", "test"}


class TestDecontaminate:
    """n-gram benchmark decontamination (GPT-3-style overlap filter)."""

    def test_planted_overlap_dropped(self):
        from go_fluentd_ray.functions import decontam

        docs = pd.DataFrame({
            "doc_id": np.arange(5, dtype=np.int64),
            "text": [
                "alpha beta gamma delta",       # shares 'alpha beta gamma'
                "zeta eta theta iota",          # clean
                "one two alpha beta gamma",     # overlap mid-doc
                "alpha beta kappa gamma",       # only 2-gram overlap -> kept
                "short one",                    # < n tokens -> kept
            ],
        })
        bench = pd.DataFrame({"doc_id": [100],
                              "text": ["alpha beta gamma zzz"]})
        out = decontam.decontaminate(
            rd.from_pandas(docs), rd.from_pandas(bench), n=3).to_pandas()
        assert sorted(out["doc_id"]) == [1, 3, 4]

    def test_bloom_direction_safe(self):
        """Bloom probing may only ever drop MORE docs, never fewer."""
        from go_fluentd_ray.functions import decontam

        grams = [f"g{i} h{i} k{i}" for i in range(1000)]
        bits = decontam.gram_bloom(grams, n_bits=1 << 16)

        def bloom_hit(g):
            h = hash(g) & 0xFFFFFFFFFFFFFFFF
            return all(bits[(h >> (i * 13)) % (1 << 16)] for i in range(4))

        assert all(bloom_hit(g) for g in grams)  # zero false negatives

    def test_semantic_planted_contamination(self):
        """Embedding-space decontamination: an exact copy (cos=1) and a
        scaled paraphrase stand-in (cos=1 after normalization) of a
        benchmark vector are dropped; orthogonal and sub-threshold
        rows survive. n-gram decontamination would see nothing here."""
        from go_fluentd_ray.functions import decontam

        e1 = np.array([1.0, 0.0, 0.0, 0.0])
        e2 = np.array([0.0, 1.0, 0.0, 0.0])
        near = 0.5 * e1 + 0.02 * e2            # cos(e1) ~ 0.9992
        faint = 0.2 * e1 + 1.0 * e2            # cos(e1) ~ 0.196 < 0.3
        corpus = pd.DataFrame({
            "vec_id": np.arange(4, dtype=np.int64),
            "embedding": [e1.tolist(), e2.tolist(),
                          near.tolist(), faint.tolist()],
            "label": np.array([7, 8, 9, 10], dtype=np.int32),
        })
        bench = pd.DataFrame({
            "vec_id": np.array([100], dtype=np.int64),
            "embedding": [e1.tolist()],
            "label": np.array([0], dtype=np.int32),
        })
        out = decontam.semantic_decontaminate(
            rd.from_pandas(corpus), rd.from_pandas(bench),
            threshold=0.30, keep_cols=["vec_id", "label"]).to_pandas()
        assert sorted(out["vec_id"]) == [1, 3]
        assert list(out.columns) == ["vec_id", "label"]


class TestDomainMixAndShards:
    def test_domain_mix_rates(self):
        from go_fluentd_ray.functions import sampling

        df = pd.DataFrame({
            "doc_id": np.arange(600, dtype=np.int64),
            "lang": ["en"] * 200 + ["de"] * 200 + ["xx"] * 200,
        })
        out = sampling.domain_mix_sample(
            rd.from_pandas(df), {"en": 100, "de": 0},
            default_pct=50).to_pandas()
        by = out.groupby("lang").size()
        assert by.get("en", 0) == 200          # rate 100 keeps all
        assert by.get("de", 0) == 0            # rate 0 keeps none
        assert 60 < by.get("xx", 0) < 140      # default ~50%

    def test_shuffle_shards_layout(self):
        import hashlib

        from go_fluentd_ray.functions import sampling

        df = pd.DataFrame({"doc_id": np.arange(500, dtype=np.int64),
                           "text": ["t"] * 500})
        out = sampling.shuffle_shards(
            rd.from_pandas(df), num_shards=8).to_pandas()
        assert len(out) == 500
        # shard is md5(id) % 8; pos dense 0..n-1 within each shard,
        # ordered by (shuffle_key, doc_id)
        for did, sk, sh in zip(out.doc_id, out.shuffle_key, out.shard):
            h = int(hashlib.md5(str(did).encode()).hexdigest()[:8], 16)
            assert sk == h and sh == h % 8
        for _, g in out.groupby("shard"):
            g = g.sort_values(["shuffle_key", "doc_id"])
            assert list(g["pos"]) == list(range(len(g)))
        # deterministic across runs
        again = sampling.shuffle_shards(
            rd.from_pandas(df), num_shards=8).to_pandas()
        a = out.sort_values("doc_id").reset_index(drop=True)
        b = again.sort_values("doc_id").reset_index(drop=True)
        assert a[["shard", "pos"]].equals(b[["shard", "pos"]])


class TestSemanticDedup:
    """SemDeDup: k-means cells + within-cell cosine dedup."""

    def _corpus(self):
        rng = np.random.default_rng(7)
        # 6 well-separated anchor directions, 4 near-copies each, plus
        # 20 scattered singletons
        dim = 16
        anchors = rng.normal(size=(6, dim))
        rows = []
        vid = 0
        for a in anchors:
            for _ in range(4):
                v = a + rng.normal(scale=1e-3, size=dim)
                rows.append((vid, v / np.linalg.norm(v)))
                vid += 1
        for _ in range(20):
            v = rng.normal(size=dim)
            rows.append((vid, v / np.linalg.norm(v)))
            vid += 1
        return pd.DataFrame({
            "vec_id": np.array([r[0] for r in rows], dtype=np.int64),
            "embedding": [r[1].tolist() for r in rows],
            "label": ["x"] * len(rows),
        })

    def test_planted_clusters_keep_min(self):
        from go_fluentd_ray.functions import semdedup

        df = self._corpus()
        out = semdedup.semantic_dedup(
            rd.from_pandas(df), threshold=0.99, n_centroids=8,
            sample_n=64).to_pandas()
        kept = set(out["vec_id"])
        # each 4-copy group collapses to its min id (0, 4, 8, ...)
        for g in range(6):
            grp = set(range(4 * g, 4 * g + 4))
            assert grp & kept == {4 * g}
        # scattered singletons survive (random 16-dim pairs don't hit
        # cosine 0.99)
        assert set(range(24, 44)) <= kept

    def test_exact_dup_collapse_preserves_components(self):
        """The hot-cell fix (collapse byte-identical embeddings to star
        edges + chunked strips) must leave survivor sets EXACTLY equal
        to the naive all-pairs components on a tiled corpus — the shape
        of the sf1 rehearsal fixture that previously ran O(cell^2) over
        every exact copy."""
        from go_fluentd_ray.functions import semdedup

        rng = np.random.default_rng(23)
        base = rng.normal(size=(80, 16))
        base /= np.linalg.norm(base, axis=1, keepdims=True)
        V = np.tile(base, (5, 1))               # 5 exact copies of each
        ids = np.arange(400, dtype=np.int64)
        df = pd.DataFrame({"vec_id": ids,
                           "embedding": [v.tolist() for v in V]})
        thr = 0.30
        # naive truth: all-pairs cosine >= thr, union-find, min-id kept
        S = V @ V.T
        parent = list(range(400))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        iu, ju = np.triu_indices(400, k=1)
        for a, b in zip(iu[S[iu, ju] >= thr], ju[S[iu, ju] >= thr]):
            ra, rb = find(int(a)), find(int(b))
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        comp_min: dict = {}
        for i in range(400):
            r = find(i)
            comp_min[r] = min(comp_min.get(r, i), i)
        want = sorted(comp_min[find(i)] for i in set(find(i)
                                                     for i in range(400)))
        # n_centroids=1 -> within-cell == all-pairs, so equality is exact
        out = semdedup.semantic_dedup(
            rd.from_pandas(df).repartition(7), threshold=thr,
            n_centroids=1, sample_n=400).to_pandas()
        assert sorted(out["vec_id"]) == want

    def test_no_dups_is_identity(self):
        from go_fluentd_ray.functions import semdedup

        rng = np.random.default_rng(11)
        df = pd.DataFrame({
            "vec_id": np.arange(30, dtype=np.int64),
            "embedding": [
                (v / np.linalg.norm(v)).tolist()
                for v in rng.normal(size=(30, 16))],
            "label": ["x"] * 30,
        })
        out = semdedup.semantic_dedup(
            rd.from_pandas(df), threshold=0.999, n_centroids=4,
            sample_n=30).to_pandas()
        assert sorted(out["vec_id"]) == list(range(30))


def test_deterministic_sample_order_free():
    """deterministic_sample must not depend on block arrival order."""
    from go_fluentd_ray.functions import similarity

    rng = np.random.default_rng(3)
    df = pd.DataFrame({
        "vec_id": np.arange(5000, dtype=np.int64),
        "embedding": [v.tolist() for v in rng.normal(size=(5000, 4))],
    })
    a = similarity.deterministic_sample(
        rd.from_pandas(df).repartition(13), 64, "vec_id", ["embedding"])
    b = similarity.deterministic_sample(
        rd.from_pandas(df).repartition(3), 64, "vec_id", ["embedding"])
    assert list(a["vec_id"]) == list(b["vec_id"])
    # matches the driver-side reference computation exactly
    import hashlib
    ref = sorted(
        range(5000),
        key=lambda i: (int(hashlib.md5(str(i).encode()).hexdigest()[:8],
                           16), i))[:64]
    assert list(a["vec_id"]) == ref


class TestDsir:
    """DSIR importance-resampling scores (hashed n-gram log-ratio)."""

    def test_target_like_docs_score_higher(self):
        from go_fluentd_ray.functions import dsir

        # doc_ids where md5 % 100 < 2 form the target sample; give those
        # docs a distinct vocabulary and check lookalikes outrank others
        import hashlib

        ids = np.arange(400, dtype=np.int64)
        in_tgt = np.array([
            int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % 100 < 2
            for i in ids])
        assert in_tgt.sum() >= 2  # the sample exists at this size
        tgt_text = "quantum flux capacitor resonance harmonics stabilizer"
        raw_text = "mundane ordinary boring plain generic common filler"
        texts = np.where(in_tgt, tgt_text, raw_text).astype(object)
        # two held-out probes, one per vocabulary, NOT in the target
        probe_ids = ids[~in_tgt][:2]
        texts[probe_ids[0]] = tgt_text      # target-like probe
        texts[probe_ids[1]] = raw_text      # raw-like probe
        df = pd.DataFrame({"doc_id": ids, "text": texts})
        out = (dsir.dsir_scores(rd.from_pandas(df)).to_pandas()
               .set_index("doc_id")["dsir_logratio"])
        assert out[probe_ids[0]] > out[probe_ids[1]]

    def test_matches_sql_twin(self):
        import duckdb

        from go_fluentd_ray.functions import dsir

        docs = pd.read_parquet("/root/testdata/sf0.001/documents.parquet")
        got = (dsir.dsir_scores(rd.from_pandas(docs)).to_pandas()
               [["doc_id", "dsir_logratio"]]
               .sort_values("doc_id").reset_index(drop=True))
        con = duckdb.connect()
        con.register("documents", docs)
        want = (con.execute(dsir.dsir_scores_sql()).df()
                .sort_values("doc_id").reset_index(drop=True))
        pd.testing.assert_frame_equal(got.round(6), want.round(6))
        assert got["dsir_logratio"].std() > 0  # real signal spread


class TestGopherQuality:
    """Gopher §A1.1 per-doc quality signals (word/line/gram repetition)."""

    def _run(self, texts):
        from go_fluentd_ray.functions import gopherquality as G

        df = pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64),
                           "text": texts})
        return (G.gopher_signals(rd.from_pandas(df)).to_pandas()
                .sort_values("doc_id").reset_index(drop=True))

    def test_word_and_line_signals(self):
        out = self._run([
            "one two three four five",               # clean, short
            "dup line\ndup line\nunique line",       # 1 of 3 lines dup
            "- b1\n- b2\nplain",                     # 2/3 bullet lines
            "",                                      # empty doc
        ])
        r0, r1, r2, r3 = (out.iloc[i] for i in range(4))
        assert r0["n_words"] == 5 and r0["frac_dup_lines"] == 0.0
        assert r1["frac_dup_lines"] == pytest.approx(1 / 3)
        # dup line chars: one extra "dup line" (8 chars) of 8+8+11 total
        assert r1["frac_dup_line_chars"] == pytest.approx(8 / 27)
        assert r2["frac_bullet_lines"] == pytest.approx(2 / 3)
        assert r3["n_words"] == 0 and not r3["gopher_pass"]

    def test_gram_signals(self):
        # "a b" occurs 3x in 6 words => top-2gram chars = 3*3 of 11 chars
        out = self._run(["a b a b a b",
                         # 5-gram "v w x y z" repeated: all 10 tokens covered
                         "v w x y z v w x y z",
                         "all distinct words here now ok"])
        assert out.iloc[0]["top_2gram_char_frac"] == pytest.approx(9 / 11)
        assert out.iloc[1]["dup_5gram_char_frac"] == 1.0
        assert out.iloc[2]["top_2gram_char_frac"] < 0.5
        assert out.iloc[2]["dup_5gram_char_frac"] == 0.0

    def test_stopwords_and_symbols(self):
        out = self._run(["the cat sat with that dog and others",
                         "# # # lots of hash tags here ...",
                         "The THE the to TO"])  # case-insensitive, distinct
        assert out.iloc[0]["n_stop_hits"] == 4   # the, with, that, and
        # 4 symbol hits (3 '#' + 1 '...') over 9 \S+ tokens
        assert out.iloc[1]["symbol_word_ratio"] == pytest.approx(4 / 9)
        assert out.iloc[2]["n_stop_hits"] == 2   # {the, to}

    def test_matches_sql_twin(self):
        import duckdb

        from go_fluentd_ray import synth
        from go_fluentd_ray.functions import gopherquality as G

        path = synth.ensure_multiline_docs(300)
        got = (G.gopher_signals(rd.read_parquet(path)).to_pandas()
               .sort_values("doc_id").reset_index(drop=True))
        con = duckdb.connect()
        want = (con.execute(G.gopher_signals_sql(
            table=f"read_parquet('{path}/*.parquet')")).df()
            .sort_values("doc_id").reset_index(drop=True))
        for c in ("n_words", "n_stop_hits"):
            want[c] = want[c].astype("int64")
        pd.testing.assert_frame_equal(got[sorted(got.columns)],
                                      want[sorted(want.columns)])
        # signals have real spread and the gate fires both ways
        assert 0 < got["gopher_pass"].mean() < 1


class TestLineDedup:
    """Corpus-level repeated-line removal (C4/CCNet boilerplate pass)."""

    def _docs(self):
        return pd.DataFrame({
            "doc_id": np.arange(6, dtype=np.int64),
            "text": [
                "unique alpha\nSHARED FOOTER\nunique beta",
                "SHARED FOOTER\nunique gamma",
                "unique delta\n\nSHARED FOOTER",   # empty line preserved
                "unique epsilon only",
                "SHARED FOOTER",                    # doc fully removed
                "unique zeta\nSHARED FOOTER\nSHARED FOOTER",
            ],
        })

    def test_repeated_lines_removed_empties_kept(self):
        from go_fluentd_ray.functions import linededup

        out = linededup.line_dedup(
            rd.from_pandas(self._docs()), min_count=3,
            num_buckets=4).to_pandas().sort_values("doc_id")
        assert list(out["clean_text"]) == [
            "unique alpha\nunique beta",
            "unique gamma",
            "unique delta\n",       # the empty line survives
            "unique epsilon only",
            "",                     # all lines removed -> empty doc
            "unique zeta",
        ]
        assert list(out["n_removed"]) == [1, 1, 1, 0, 1, 2]

    def test_below_threshold_untouched(self):
        from go_fluentd_ray.functions import linededup

        out = linededup.line_dedup(
            rd.from_pandas(self._docs()), min_count=7,
            num_buckets=4).to_pandas().sort_values("doc_id")
        assert list(out["clean_text"]) == list(self._docs()["text"])
        assert out["n_removed"].sum() == 0

    def test_matches_sql_twin_on_synth_corpus(self, tmp_path):
        import duckdb

        from go_fluentd_ray import synth
        from go_fluentd_ray.functions import linededup

        path = synth.ensure_multiline_docs(300)
        got = linededup.line_dedup(
            rd.read_parquet(path), num_buckets=8).select_columns(
            ["doc_id", "clean_text", "n_removed"]).to_pandas()
        want = duckdb.connect().execute(
            linededup.line_dedup_sql(path)).df()
        got = got.sort_values("doc_id").reset_index(drop=True)
        want = want.sort_values("doc_id").reset_index(drop=True)
        want["n_removed"] = want["n_removed"].astype("int64")
        pd.testing.assert_frame_equal(got, want)
        assert got["n_removed"].sum() > 0  # the pass actually fired


class TestWithinDocLineDedup:
    """Intra-document exact line dedup (first occurrence kept)."""

    def test_first_occurrence_kept_order_preserved(self):
        from go_fluentd_ray.functions import linededup

        df = pd.DataFrame({
            "doc_id": np.arange(3, dtype=np.int64),
            "text": [
                "a\nb\na\nc\nb\na",      # dups of a and b removed
                "only one line",
                "x\nx\nx",               # collapses to one line
            ],
        })
        out = (linededup.dedup_lines_within_doc(rd.from_pandas(df))
               .to_pandas().sort_values("doc_id"))
        assert list(out["dedup_text"]) == ["a\nb\nc", "only one line", "x"]
        assert list(out["n_dup_lines"]) == [3, 0, 2]

    def test_cross_doc_lines_untouched(self):
        """Unlike the corpus pass, a line shared ACROSS documents but
        unique within each survives everywhere."""
        from go_fluentd_ray.functions import linededup

        df = pd.DataFrame({
            "doc_id": np.arange(4, dtype=np.int64),
            "text": ["SHARED\nu1", "SHARED\nu2", "SHARED\nu3", "SHARED"],
        })
        out = (linededup.dedup_lines_within_doc(rd.from_pandas(df))
               .to_pandas().sort_values("doc_id"))
        assert list(out["dedup_text"]) == list(df["text"])
        assert out["n_dup_lines"].sum() == 0

    def test_matches_sql_twin_on_synth_corpus(self):
        import duckdb

        from go_fluentd_ray import synth
        from go_fluentd_ray.functions import linededup

        path = synth.ensure_multiline_docs(300)
        got = (linededup.dedup_lines_within_doc(rd.read_parquet(path))
               .select_columns(["doc_id", "dedup_text", "n_dup_lines"])
               .to_pandas())
        want = duckdb.connect().execute(
            linededup.dedup_lines_within_doc_sql(path)).df()
        got = got.sort_values("doc_id").reset_index(drop=True)
        want = want.sort_values("doc_id").reset_index(drop=True)
        want["n_dup_lines"] = want["n_dup_lines"].astype("int64")
        pd.testing.assert_frame_equal(got, want)
        assert got["n_dup_lines"].sum() > 0  # corpus has intra-doc dups


class TestSpanDedup:
    """Exact duplicated n-gram span removal (ExactSubstr pass)."""

    def test_planted_span_removed_everywhere(self):
        from go_fluentd_ray.functions import spandedup

        span = "the exact same eight token boilerplate span here"  # 8 toks
        df = pd.DataFrame({
            "doc_id": np.arange(3, dtype=np.int64),
            "text": [
                f"alpha beta {span} gamma delta",
                f"{span} epsilon zeta eta theta",
                "iota kappa lambda mu nu xi omicron pi rho",  # untouched
            ],
        })
        out = (spandedup.span_dedup(rd.from_pandas(df), n=8, min_count=2,
                                    num_buckets=4)
               .to_pandas().sort_values("doc_id"))
        assert list(out["clean_text"]) == [
            "alpha beta gamma delta",
            "epsilon zeta eta theta",
            "iota kappa lambda mu nu xi omicron pi rho",
        ]
        assert list(out["n_removed_tokens"]) == [8, 8, 0]

    def test_overlapping_spans_compose(self):
        """Two duplicated 3-gram occurrences overlapping by one token
        must remove the union of their coverage, not double-count."""
        from go_fluentd_ray.functions import spandedup

        df = pd.DataFrame({
            "doc_id": np.arange(3, dtype=np.int64),
            "text": [
                "a b c d e tail1 x1 y1",   # 'a b c' and 'c d e' both dup
                "a b c one1 two1 three1",
                "c d e four1 five1 six1",
            ],
        })
        out = (spandedup.span_dedup(rd.from_pandas(df), n=3, min_count=2,
                                    num_buckets=4)
               .to_pandas().sort_values("doc_id"))
        assert out.iloc[0]["clean_text"] == "tail1 x1 y1"
        assert out.iloc[0]["n_removed_tokens"] == 5  # union a..e

    def test_matches_sql_twin(self):
        import duckdb

        from go_fluentd_ray.functions import spandedup

        docs = pd.read_parquet("/root/testdata/sf0.001/documents.parquet")
        got = (spandedup.span_dedup(rd.from_pandas(docs), num_buckets=8)
               .select_columns(["doc_id", "clean_text", "n_removed_tokens"])
               .to_pandas().sort_values("doc_id").reset_index(drop=True))
        con = duckdb.connect()
        con.register("documents", docs)
        want = (con.execute(spandedup.span_dedup_sql()).df()
                .sort_values("doc_id").reset_index(drop=True))
        want["n_removed_tokens"] = want["n_removed_tokens"].astype("int64")
        pd.testing.assert_frame_equal(got, want)


class TestBm25:
    """BM25 lexical top-k retrieval."""

    def test_ranking_prefers_term_density(self):
        from go_fluentd_ray.functions import bm25

        df = pd.DataFrame({
            "doc_id": np.arange(4, dtype=np.int64),
            "text": [
                "needle needle needle pad pad",   # highest tf
                "needle pad pad pad pad",
                "pad pad pad pad pad",            # no match -> unranked
                "needle needle pad pad pad",
            ],
        })
        out = bm25.bm25_topk(rd.from_pandas(df), queries=("needle",), k=4)
        assert list(out["doc_id"]) == [0, 3, 1]   # density order, no doc 2
        assert list(out["rank"]) == [0, 1, 2]

    def test_matches_sql_twin(self):
        import duckdb

        from go_fluentd_ray.functions import bm25

        docs = pd.read_parquet("/root/testdata/sf0.001/documents.parquet")
        got = bm25.bm25_topk(rd.from_pandas(docs)).reset_index(drop=True)
        con = duckdb.connect()
        con.register("documents", docs)
        want = (con.execute(bm25.bm25_topk_sql()).df()
                .sort_values(["qid", "rank"]).reset_index(drop=True))
        for c in ("qid", "rank", "doc_id"):
            want[c] = want[c].astype("int64")
        pd.testing.assert_frame_equal(got, want)


class TestBm25Index:
    """Persisted inverted index: build/query split parity with the
    one-shot scorer, shard pruning, and missing-term handling."""

    def _build(self, docs, tmp_path):
        from go_fluentd_ray.functions import bm25index

        idx = str(tmp_path / "idx")
        bm25index.build_bm25_index(rd.from_pandas(docs), idx)
        return idx

    def test_matches_one_shot_exactly(self, tmp_path):
        from go_fluentd_ray.functions import bm25, bm25index

        docs = pd.read_parquet("/root/testdata/sf0.001/documents.parquet")
        idx = self._build(docs, tmp_path)
        got = bm25index.bm25_index_query(idx).reset_index(drop=True)
        want = bm25.bm25_topk(rd.from_pandas(docs)).reset_index(drop=True)
        pd.testing.assert_frame_equal(got, want)

    def test_query_reads_only_probed_shards(self, tmp_path):
        from go_fluentd_ray.functions import bm25index

        docs = pd.read_parquet("/root/testdata/sf0.001/documents.parquet")
        idx = self._build(docs, tmp_path)
        total = len(bm25index._shard_files(
            idx, range(bm25index.N_SHARDS)))
        probed = len(bm25index._shard_files(
            idx, bm25index._term_shard(["scan", "filter"])))
        assert 0 < probed < total  # dir-level pruning is real

    def test_missing_and_partial_terms(self, tmp_path):
        from go_fluentd_ray.functions import bm25index

        docs = pd.DataFrame({
            "doc_id": np.arange(3, dtype=np.int64),
            "text": ["needle pad", "pad pad", "needle needle"]})
        idx = self._build(docs, tmp_path)
        # absent term alone -> empty; absent term mixed in -> ignored
        assert bm25index.bm25_index_query(
            idx, queries=("zzz_absent",)).empty
        out = bm25index.bm25_index_query(
            idx, queries=("needle zzz_absent",), k=3)
        assert list(out["doc_id"]) == [2, 0]


class TestCorpusDrift:
    """JSD drift report between md5-split corpus halves."""

    def _sides(self, n=40):
        from go_fluentd_ray.functions.sampling import _md5_mod100

        ids = np.arange(n, dtype=np.int64)
        return ids, _md5_mod100(ids) < 50

    def test_identical_distributions_near_zero(self):
        from go_fluentd_ray.functions import drift

        ids, _ = self._sides()
        df = pd.DataFrame({"doc_id": ids,
                           "text": ["same words here"] * len(ids)})
        out = drift.corpus_drift(rd.from_pandas(df))
        assert out.iloc[0]["jsd"] == 0.0
        assert out.iloc[0]["n_vocab_a"] == out.iloc[0]["n_vocab_b"] == 3

    def test_disjoint_vocab_maxes_out(self):
        import math

        from go_fluentd_ray.functions import drift

        ids, a = self._sides()
        df = pd.DataFrame({"doc_id": ids,
                           "text": np.where(a, "alpha beta",
                                            "gamma delta")})
        out = drift.corpus_drift(rd.from_pandas(df))
        assert abs(out.iloc[0]["jsd"] - math.log(2)) < 1e-6
        assert out.iloc[0]["n_vocab_a"] == 2

    def test_matches_sql_twin(self):
        import duckdb

        from go_fluentd_ray.functions import drift

        docs = pd.read_parquet("/root/testdata/sf0.001/documents.parquet")
        got = drift.corpus_drift(rd.from_pandas(docs))
        con = duckdb.connect()
        con.register("documents", docs)
        want = con.execute(drift.corpus_drift_sql()).df()
        for c in got.columns:
            assert got.iloc[0][c] == want.iloc[0][c], c

    def test_topk_planted_shift_and_twin(self):
        import duckdb

        from go_fluentd_ray.functions import drift

        ids, a = self._sides(60)
        # one word exclusive to side a, shared filler on both
        df = pd.DataFrame({"doc_id": ids,
                           "text": np.where(a, "drifted filler filler",
                                            "filler filler filler")})
        out = drift.drift_topk(rd.from_pandas(df), k=3)
        assert out.iloc[0]["w"] == "drifted"
        assert out.iloc[0]["n_b"] == 0
        con = duckdb.connect()
        con.register("documents", df)
        want = con.execute(drift.drift_topk_sql(k=3)).df()
        want["n_a"] = want["n_a"].astype("int64")
        want["n_b"] = want["n_b"].astype("int64")
        pd.testing.assert_frame_equal(out, want)


class TestBigramPmi:
    """Collocation mining: PMI math, support filter, SQL twin."""

    def test_planted_collocation_wins(self):
        from go_fluentd_ray.functions import ngrams

        # "new york" always adjacent; "the the" frequent but both
        # words ubiquitous -> low PMI
        rows = ["new york " + "the a " * 5] * 6
        df = pd.DataFrame({"doc_id": np.arange(6, dtype=np.int64),
                           "text": rows})
        out = ngrams.bigram_pmi(rd.from_pandas(df), k=5, min_count=3)
        assert (out.iloc[0]["w1"], out.iloc[0]["w2"]) == ("new", "york")
        assert out.iloc[0]["n"] == 6

    def test_min_count_filters(self):
        from go_fluentd_ray.functions import ngrams

        df = pd.DataFrame({"doc_id": np.arange(2, dtype=np.int64),
                           "text": ["rare pair", "x y x y x y"]})
        out = ngrams.bigram_pmi(rd.from_pandas(df), k=10, min_count=2)
        pairs = set(zip(out["w1"], out["w2"]))
        assert ("rare", "pair") not in pairs  # count 1 < 2
        assert ("x", "y") in pairs

    def test_matches_sql_twin(self):
        import duckdb

        from go_fluentd_ray.functions import ngrams

        docs = pd.read_parquet("/root/testdata/sf0.001/documents.parquet")
        got = (ngrams.bigram_pmi(rd.from_pandas(docs))
               .reset_index(drop=True))
        con = duckdb.connect()
        con.register("documents", docs)
        want = con.execute(ngrams.bigram_pmi_sql()).df()
        want["n"] = want["n"].astype("int64")
        pd.testing.assert_frame_equal(got, want)


class TestHashEmbed:
    """Feature-hash text embeddings + fused text kNN."""

    def test_deterministic_unit_norm(self):
        from go_fluentd_ray.functions import embed

        texts = ["the quick brown fox", "jumps over", ""]
        a = embed.hash_embed(texts)
        b = embed.hash_embed(texts)
        np.testing.assert_array_equal(a, b)
        norms = np.linalg.norm(a, axis=1)
        np.testing.assert_allclose(norms[:2], 1.0, rtol=1e-5)
        # degenerate short input still embeds (padded shingle)
        assert norms[2] >= 0.0

    def test_near_dup_ranks_above_random(self):
        from go_fluentd_ray.functions import embed

        base = ("hash join table scan filter row window sort merge "
                "batch customer column value query group order")
        near = base.replace("filter", "filter extra")
        rand = ("completely unrelated words zebra quantum mahogany "
                "tundra oscillate vermilion cascade")
        E = embed.hash_embed([base, near, rand])
        assert E[0] @ E[1] > 0.9
        assert E[0] @ E[1] > E[0] @ E[2] + 0.3

    def test_embed_docs_matches_direct(self):
        from go_fluentd_ray.functions import embed

        df = pd.DataFrame({"doc_id": np.arange(5, dtype=np.int64),
                           "text": [f"doc number {i} words" for i
                                    in range(5)]})
        out = (embed.embed_docs(rd.from_pandas(df)).to_pandas()
               .sort_values("doc_id").reset_index(drop=True))
        want = embed.hash_embed(list(df["text"]))
        got = np.stack(out["embedding"].to_numpy())
        np.testing.assert_allclose(got, want, rtol=1e-6)

    def test_text_knn_finds_planted_doc(self):
        from go_fluentd_ray.functions import embed

        q = "hash join table scan"
        docs = pd.DataFrame({
            "doc_id": np.arange(20, dtype=np.int64),
            "text": [q if i == 7 else
                     f"noise filler text row {i} batch value column"
                     for i in range(20)]})
        out = embed.text_knn(rd.from_pandas(docs), query_texts=(q,), k=3)
        assert out.iloc[0]["doc_id"] == 7
        assert out.iloc[0]["sim"] > 0.99

    def test_text_knn_indexed_recall_gate(self, tmp_path):
        """The composed embed -> IVF-PQ-index -> query tier must
        recover >= 0.9 of the brute-force text_knn answer set at
        sf0.01 (the driver-visible text_knn_indexed_recall gate)."""
        from go_fluentd_ray.functions import embed

        ds = rd.read_parquet("/root/testdata/sf0.01/documents.parquet",
                             columns=["doc_id", "text"])
        out = embed.text_knn_indexed_recall(
            "/root/testdata/sf0.01", ds,
            cache_root=str(tmp_path))
        mean = float(out.loc[out["qid"] == -1, "recall_at_k"].iloc[0])
        assert mean >= 0.9, out


class TestBadwordsFilter:
    def test_token_not_substring(self):
        from go_fluentd_ray.functions import textclean

        df = pd.DataFrame({
            "doc_id": np.arange(3, dtype=np.int64),
            "text": ["clean text here", "has SPARK inside",
                     "sparkly is not spark-the-token but sparkly"],
        })
        out = (textclean.badwords_filter(rd.from_pandas(df))
               .to_pandas().sort_values("doc_id"))
        # doc 1 dropped (case-insensitive token hit); doc 2 kept
        # ("sparkly"/"spark-the-token" are different tokens)
        assert list(out["doc_id"]) == [0, 2]


class TestQualityPrune:
    """Percentile quality pruning (top-p% by score, exact)."""

    def test_top_pct_selected(self):
        from go_fluentd_ray.functions import text as T

        df = pd.DataFrame({
            "doc_id": np.arange(10, dtype=np.int64),
            # quality rises with stopword share and word count
            "text": ["the " * (i + 1) + "zz!" * (10 - i) for i in range(10)],
        })
        out = T.quality_prune(rd.from_pandas(df), pct=30).to_pandas()
        assert len(out) == 3
        # verify against the driver-side reference computation
        import pyarrow as pa

        scored = T.quality_batch(pa.Table.from_pandas(df)).to_pandas()
        ref = scored.sort_values(["quality", "doc_id"],
                                 ascending=[False, True]).head(3)
        assert list(out["doc_id"]) == list(ref["doc_id"])

    def test_matches_sql_twin(self):
        import duckdb

        from go_fluentd_ray.functions import text as T

        path = "/root/testdata/sf0.001/documents.parquet"
        out = T.quality_prune(rd.read_parquet(path), pct=20).to_pandas()
        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                    f"read_parquet('{path}')")
        want = con.execute(T.quality_prune_sql(20)).df()
        assert list(out["doc_id"]) == list(want["doc_id"])
        assert np.array_equal(out["quality"].to_numpy(),
                              want["quality"].to_numpy())


class TestJaccardJoin:
    """Exact n-gram Jaccard self-join with prefix filtering."""

    def test_matches_bruteforce(self):
        import itertools

        from go_fluentd_ray.functions import dedup

        rng = np.random.default_rng(11)
        base = ("the quick brown fox jumps over the lazy dog and then "
                "runs far away into the deep dark forest tonight")
        texts = []
        for i in range(40):
            words = base.split()
            for _ in range(rng.integers(0, 4)):  # light mutations
                words[rng.integers(0, len(words))] = f"w{rng.integers(0, 9)}"
            texts.append(" ".join(words))
        texts += [f"completely unrelated document number {i} with its own "
                  f"content payload {i * 7}" for i in range(20)]
        df = pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64),
                           "text": texts})
        got = dedup.jaccard_join(rd.from_pandas(df), threshold=0.8,
                                 num_buckets=8).to_pandas()
        got_pairs = set(map(tuple, got[["a", "b"]].to_numpy()))
        bf = set()
        shs = {i: dedup._shingle_hashes(t) for i, t in enumerate(texts)}
        for a, b in itertools.combinations(range(len(texts)), 2):
            s1, s2 = shs[a], shs[b]
            inter = len(np.intersect1d(s1, s2, assume_unique=True))
            if inter / (len(s1) + len(s2) - inter) >= 0.8:
                bf.add((a, b))
        assert got_pairs == bf  # prefix filter loses NOTHING
        assert len(bf) > 10    # the corpus actually contains near-dups

    def test_identical_docs_pair(self):
        from go_fluentd_ray.functions import dedup

        df = pd.DataFrame({
            "doc_id": np.array([1, 2, 3], dtype=np.int64),
            "text": ["same text here entirely"] * 2 + ["other content"],
        })
        got = dedup.jaccard_join(rd.from_pandas(df), threshold=0.8,
                                 num_buckets=4).to_pandas()
        assert set(map(tuple, got[["a", "b"]].to_numpy())) == {(1, 2)}
        assert float(got["jac"].iloc[0]) == 1.0

    def test_verify_paths_agree(self):
        """The cost-based verify choice must be output-invisible: the
        broadcast path (pairs >> docs) and the attach path (unbounded
        corpus) produce identical (a, b, jac) sets."""
        from go_fluentd_ray.functions import dedup

        texts = [f"shared near duplicate content block variant {i % 3} "
                 "padding words common to all docs here" for i in range(30)]
        df = pd.DataFrame({"doc_id": np.arange(30, dtype=np.int64),
                           "text": texts})
        outs = {}
        for mode in ("attach", "broadcast"):
            got = dedup.jaccard_join(rd.from_pandas(df), threshold=0.7,
                                     num_buckets=4,
                                     verify_mode=mode).to_pandas()
            outs[mode] = set(map(tuple, got[["a", "b", "jac"]].to_numpy()))
        assert outs["attach"] == outs["broadcast"]
        assert len(outs["attach"]) >= 3 * (10 * 9) // 2  # dups found

    def test_collapse_exact_equivalence_on_tiled_corpus(self):
        """collapse_exact (the copy-canonicalization fast path) must be
        output-invisible: on a corpus where every doc has exact copies
        (the sf1-rehearsal shape that blew the uncollapsed join up
        quadratically), the (a, b, jac) set equals the uncollapsed
        join's — including short (len < 4) texts, which the padding in
        _shingle_hashes gives one shingle, so their exact copies pair
        at J = 1 in BOTH paths (the len>=4 exclusion is the SQL twin's
        documented caveat, not the Python contract)."""
        from go_fluentd_ray.functions import dedup

        rng = np.random.default_rng(23)
        base = ("some shared content words that make near duplicates "
                "when lightly mutated in a couple of places only")
        texts = []
        for i in range(12):
            words = base.split()
            for _ in range(rng.integers(0, 3)):
                words[rng.integers(0, len(words))] = f"m{rng.integers(0, 5)}"
            texts.append(" ".join(words))
        texts += [f"standalone document {i} nothing alike {i * 13}"
                  for i in range(6)]
        tiled = texts * 3 + ["abc", "abc", "abc"]  # exact copies + short
        df = pd.DataFrame({
            "doc_id": np.arange(len(tiled), dtype=np.int64),
            "text": tiled})
        outs = {}
        for flag in (True, False):
            got = dedup.jaccard_join(rd.from_pandas(df), threshold=0.8,
                                     num_buckets=4,
                                     collapse_exact=flag).to_pandas()
            outs[flag] = set(map(tuple,
                                 got[["a", "b", "jac"]].to_numpy()))
        assert outs[True] == outs[False]
        n_docs = len(texts)
        s0 = len(tiled) - 3                      # first "abc" copy
        assert {(s0, s0 + 1, 1.0), (s0, s0 + 2, 1.0),
                (s0 + 1, s0 + 2, 1.0)} <= outs[True]
        # every doc's two exact copies pair at jac == 1.0
        for i in range(n_docs):
            assert (i, i + n_docs, 1.0) in outs[True]
            assert (i, i + 2 * n_docs, 1.0) in outs[True]


def test_corpus_stats_reference():
    """corpus_stats equals a driver-side pandas reference on small data."""
    from go_fluentd_ray.functions import aggregates as A
    from go_fluentd_ray.functions import text as T
    import pyarrow as pa

    df = pd.DataFrame({
        "doc_id": np.arange(8, dtype=np.int64),
        "text": [f"the quick doc {i} with words!" * (i + 1) for i in range(8)],
        "lang": ["en", "en", "de", "de", "en", "fr", "fr", "fr"],
        "source": ["s1", "s2", "s1", "s1", "s1", "s2", "s2", "s1"],
    })
    out = A.corpus_stats(rd.from_pandas(df)).to_pandas()
    out = out.sort_values(["source", "lang"]).reset_index(drop=True)
    scored = T.quality_batch(pa.Table.from_pandas(df)).to_pandas()
    scored["chars"] = scored["text"].str.len()
    scored["words"] = scored["text"].str.count(r"\w+")
    ref = (scored.groupby(["source", "lang"])
           .agg(docs=("doc_id", "size"), chars=("chars", "sum"),
                words=("words", "sum"), mean_quality=("quality", "mean"))
           .reset_index().sort_values(["source", "lang"])
           .reset_index(drop=True))
    assert list(out["docs"]) == list(ref["docs"])
    assert list(out["chars"]) == list(ref["chars"])
    assert list(out["words"]) == list(ref["words"])
    assert np.allclose(out["mean_quality"], ref["mean_quality"], atol=1e-6)


def test_tfidf_keywords_reference():
    """tfidf_keywords equals a driver-side reference (incl. df=1 words
    absent from the broadcast vocabulary)."""
    import math

    from go_fluentd_ray.functions import text as T

    df = pd.DataFrame({
        "doc_id": np.arange(4, dtype=np.int64),
        "text": [
            "apple banana apple cherry",
            "apple banana durian",
            "unique singleton words only",
            "banana banana banana apple",
        ],
    })
    out = T.tfidf_keywords(rd.from_pandas(df), k=2).to_pandas()
    out = out.sort_values(["doc_id", "word"]).reset_index(drop=True)
    # reference
    import collections
    docs = [t.split() for t in df["text"]]
    N = len(docs)
    dfreq = collections.Counter()
    for d in docs:
        dfreq.update(set(d))
    rows = []
    for i, d in enumerate(docs):
        tf = collections.Counter(d)
        scored = sorted(
            ((round(c * math.log(N / dfreq[w]), 6), w, c)
             for w, c in tf.items()),
            key=lambda x: (-x[0], x[1]))[:2]
        for s, w, c in scored:
            rows.append((i, w, c, s))
    ref = pd.DataFrame(rows, columns=["doc_id", "word", "tf", "tfidf"])
    ref = ref.sort_values(["doc_id", "word"]).reset_index(drop=True)
    assert list(out["word"]) == list(ref["word"])
    assert list(out["tf"]) == list(ref["tf"])
    assert np.allclose(out["tfidf"], ref["tfidf"])


class TestTurnFlow:
    """Consecutive-turn operators (tool latency / role transitions /
    context truncation) over the transcript corpus."""

    @staticmethod
    def _hand_corpus() -> pd.DataFrame:
        # conv a: call at t=0 (bash), noise, result at t=3s; second
        #         call (search) at t=4s with NO following result.
        # conv b: result turn BEFORE the call — must not pair backwards.
        rows = [
            ("a", 0, "assistant", "bash",   0),
            ("a", 1, "user",      "",       1_000_000),
            ("a", 2, "tool",      "bash",   3_000_000),
            ("a", 3, "assistant", "search", 4_000_000),
            ("b", 0, "tool",      "python", 0),
            ("b", 1, "assistant", "python", 5_000_000),
        ]
        df = pd.DataFrame(rows, columns=["conv_id", "turn_idx",
                                         "role", "tool", "ts"])
        df["turn_idx"] = df["turn_idx"].astype(np.int32)
        df["ts"] = pd.to_datetime(df["ts"], unit="us")
        df["text"] = "x y z"
        return df

    def test_tool_latency_hand_case(self):
        from go_fluentd_ray.functions import turnflow

        out = (turnflow.tool_latency(rd.from_pandas(self._hand_corpus()))
               .to_pandas().set_index("tool"))
        # only conv a's bash call pairs (3 s); a's search call has no
        # following result; b's python call precedes its result turn
        assert list(out.index) == ["bash"]
        assert out.loc["bash", "n_calls"] == 1
        assert out.loc["bash", "mean_latency_sec"] == pytest.approx(3.0)
        assert out.loc["bash", "max_latency_sec"] == pytest.approx(3.0)

    def test_role_transitions_hand_case(self):
        from go_fluentd_ray.functions import turnflow

        out = (turnflow.role_transitions(
            rd.from_pandas(self._hand_corpus()))
               .to_pandas().set_index(["from_role", "to_role"])["n"])
        assert out.to_dict() == {
            ("assistant", "user"): 1, ("user", "tool"): 1,
            ("tool", "assistant"): 2}

    def test_context_truncate_hand_case(self):
        from go_fluentd_ray.functions import turnflow

        df = pd.DataFrame({
            "conv_id": ["a"] * 3 + ["b"],
            "turn_idx": np.array([0, 1, 2, 0], dtype=np.int32),
            "text": ["one two three", "four five", "six",
                     "way over budget " * 10],
        })
        out = (turnflow.context_truncate(rd.from_pandas(df),
                                         budget_tokens=3)
               .to_pandas().sort_values(["conv_id", "turn_idx"])
               .reset_index(drop=True))
        # a: suffix sums are 6/3/1 -> keep turns 1,2 is over (3+1=4>3)?
        # tokens: t0=3, t1=2, t2=1; suffixes: 6, 3, 1 -> keep t1,t2.
        # b single over-budget turn -> dropped entirely.
        assert [tuple(r) for r in
                out[["conv_id", "turn_idx"]].itertuples(index=False)] \
            == [("a", 1), ("a", 2)]
        assert list(out["n_tokens"]) == [2, 1]

    def test_all_match_sql_twins(self):
        import duckdb

        from go_fluentd_ray import synth
        from go_fluentd_ray.functions import turnflow

        path = synth.ensure_corpus(60000)
        con = duckdb.connect()
        for fn, sql, keys in [
                (turnflow.tool_latency,
                 turnflow.tool_latency_sql(path), ["tool"]),
                (turnflow.role_transitions,
                 turnflow.role_transitions_sql(path),
                 ["from_role", "to_role"]),
                (turnflow.context_truncate,
                 turnflow.context_truncate_sql(path),
                 ["conv_id", "turn_idx"])]:
            got = (fn(rd.read_parquet(path)).to_pandas()
                   .sort_values(keys).reset_index(drop=True))
            want = (con.execute(sql).df()
                    .sort_values(keys).reset_index(drop=True))
            for c in want.columns:
                if want[c].dtype != got[c].dtype \
                        and got[c].dtype == "int64":
                    want[c] = want[c].astype("int64")
            pd.testing.assert_frame_equal(
                got, want[got.columns.tolist()])
            assert len(got) > 0
        # the corpus's planted out-of-order timestamps must be visible
        lat = (turnflow.tool_latency(rd.read_parquet(path))
               .to_pandas())
        assert (lat["n_calls"] > 50).all()


class TestConvMine:
    """Conversation-mining operators: SFT pair extraction, agent-loop
    detection, shared-prefix fork mining."""

    def test_sft_examples_hand_case(self):
        from go_fluentd_ray.functions import convmine

        df = pd.DataFrame({
            "conv_id": ["a"] * 4 + ["b"],
            "turn_idx": np.array([0, 1, 2, 3, 0], dtype=np.int32),
            "role": ["system", "user", "assistant", "assistant",
                     "assistant"],
            "text": ["be good", "hi", "hello", "still here", "opener"],
        })
        out = (convmine.sft_examples(rd.from_pandas(df), k_context=2)
               .to_pandas().sort_values(["conv_id", "turn_idx"])
               .reset_index(drop=True))
        # a@2: full 2-turn window; a@3: window slides (system drops);
        # b@0: assistant opens the conversation -> empty context.
        assert list(out["response"]) == ["hello", "still here",
                                         "opener"]
        assert list(out["context"]) == [
            "system: be good\nuser: hi",
            "user: hi\nassistant: hello",
            "",
        ]
        assert list(out["n_context_turns"]) == [2, 2, 0]

    def test_loop_detect_hand_case(self):
        from go_fluentd_ray.functions import convmine

        df = pd.DataFrame({
            "conv_id": ["a"] * 5 + ["b"] * 3,
            "turn_idx": np.array([0, 1, 2, 3, 4, 0, 1, 2],
                                 dtype=np.int32),
            "role": ["user", "assistant", "assistant", "assistant",
                     "user", "user", "assistant", "user"],
            # a: 3 consecutive identical assistant turns = a loop;
            # b: same text twice but NON-consecutive -> no run.
            "text": ["q", "same", "same", "same", "q",
                     "x", "y", "x"],
        })
        out = (convmine.loop_detect(rd.from_pandas(df), min_run=3)
               .to_pandas().set_index("conv_id"))
        assert out.loc["a", "max_run"] == 3
        assert bool(out.loc["a", "is_looping"])
        assert out.loc["b", "max_run"] == 1
        assert not bool(out.loc["b", "is_looping"])
        assert out.loc["a", "n_turns"] == 5

    def test_loop_detect_role_sensitive(self):
        from go_fluentd_ray.functions import convmine

        # identical text but alternating roles must NOT count as a run
        df = pd.DataFrame({
            "conv_id": ["c"] * 4,
            "turn_idx": np.array([0, 1, 2, 3], dtype=np.int32),
            "role": ["user", "assistant", "user", "assistant"],
            "text": ["same"] * 4,
        })
        out = (convmine.loop_detect(rd.from_pandas(df))
               .to_pandas().set_index("conv_id"))
        assert out.loc["c", "max_run"] == 1

    def test_prefix_forks_hand_case(self):
        from go_fluentd_ray.functions import convmine

        def conv(cid, texts):
            return pd.DataFrame({
                "conv_id": [cid] * len(texts),
                "turn_idx": np.arange(len(texts), dtype=np.int32),
                "role": ["user", "assistant", "assistant",
                         "assistant"][:len(texts)],
                "text": texts,
            })

        df = pd.concat([
            conv("f1", ["hi", "a", "left"]),     # fork group: same
            conv("f2", ["hi", "a", "right"]),    # 2-turn prefix,
            conv("d1", ["dup", "x", "tail"]),    # exact duplicates:
            conv("d2", ["dup", "x", "tail"]),    # NOT a fork
            conv("s1", ["short"]),               # < k_prefix: out
        ], ignore_index=True)
        out = (convmine.prefix_forks(rd.from_pandas(df), k_prefix=2)
               .to_pandas())
        assert len(out) == 1
        row = out.iloc[0]
        assert row["n_convs"] == 2
        assert row["n_variants"] == 2
        assert row["example_conv_id"] == "f1"

    def test_all_match_sql_twins(self):
        import duckdb

        from go_fluentd_ray import synth
        from go_fluentd_ray.functions import convmine

        path = synth.ensure_corpus(60000)
        con = duckdb.connect()
        for fn, sql, keys in [
                (convmine.sft_examples,
                 convmine.sft_examples_sql(path),
                 ["conv_id", "turn_idx"]),
                (convmine.loop_detect,
                 convmine.loop_detect_sql(path), ["conv_id"]),
                (convmine.prefix_forks,
                 convmine.prefix_forks_sql(path), ["prefix_sig"])]:
            got = (fn(rd.read_parquet(path)).to_pandas()
                   .sort_values(keys).reset_index(drop=True))
            want = (con.execute(sql).df()
                    .sort_values(keys).reset_index(drop=True))
            for c in want.columns:
                if want[c].dtype != got[c].dtype \
                        and got[c].dtype == "int64":
                    want[c] = want[c].astype("int64")
            pd.testing.assert_frame_equal(
                got, want[got.columns.tolist()])
            assert len(got) > 0


class TestLogOps:
    """Log-analytics operators: template mining, deterministic
    throttle, latency percentiles."""

    def test_log_templates_hand_case(self):
        from go_fluentd_ray.functions import logops

        df = pd.DataFrame({"text": [
            "conn from 10.0.0.1 port 443",
            "conn from 10.0.0.99 port 8080",
            "conn from 192.168.1.5 port 22",
            "disk full on /dev/sda1",
        ]})
        out = logops.log_templates(rd.from_pandas(df), k=5)
        assert list(out["template"]) == [
            "conn from <N>.<N>.<N>.<N> port <N>",
            "disk full on /dev/sda<N>",
        ]
        assert list(out["n"]) == [3, 1]

    def test_throttle_hand_case(self):
        from go_fluentd_ray.functions import logops

        # 4 user turns in one minute window, budget 2 -> earliest two
        # by ts win; the assistant tag has its own budget.
        df = pd.DataFrame({
            "conv_id": ["a", "b", "c", "d", "e"],
            "turn_idx": np.zeros(5, dtype=np.int32),
            "role": ["user", "user", "user", "user", "assistant"],
            "ts": pd.to_datetime(
                [30_000_000, 10_000_000, 20_000_000, 40_000_000,
                 50_000_000], unit="us"),
        })
        out = (logops.throttle_tags(rd.from_pandas(df),
                                    max_per_window=2, window_sec=60)
               .to_pandas().sort_values("conv_id"))
        assert list(out["conv_id"]) == ["b", "c", "e"]

    def test_throttle_tie_break_is_total_order(self):
        from go_fluentd_ray.functions import logops

        # identical ts: admission must follow (conv_id, turn_idx)
        df = pd.DataFrame({
            "conv_id": ["z", "a", "m"],
            "turn_idx": np.zeros(3, dtype=np.int32),
            "role": ["user"] * 3,
            "ts": pd.to_datetime([7, 7, 7], unit="s"),
        })
        out = (logops.throttle_tags(rd.from_pandas(df),
                                    max_per_window=2, window_sec=60)
               .to_pandas())
        assert sorted(out["conv_id"]) == ["a", "m"]

    def test_tool_latency_pct_hand_case(self):
        from go_fluentd_ray.functions import logops

        # one conversation, three bash calls with latencies 1s, 2s, 4s
        rows, t = [], 0
        for lat in (1, 2, 4):
            rows.append(("c", len(rows) * 2, "assistant", "bash", t))
            rows.append(("c", len(rows) * 2 + 1, "tool", "bash",
                         t + lat * 1_000_000))
            t += 10_000_000
        df = pd.DataFrame(rows, columns=["conv_id", "turn_idx",
                                         "role", "tool", "ts"])
        df["turn_idx"] = df["turn_idx"].astype(np.int32)
        df["ts"] = pd.to_datetime(df["ts"], unit="us")
        df["text"] = "x"
        out = (logops.tool_latency_pct(rd.from_pandas(df))
               .to_pandas().set_index("tool"))
        # quantile_disc over [1s, 2s, 4s]: ceil(.5*3)=2 -> 2s;
        # ceil(.95*3)=ceil(2.85)=3 -> 4s; ceil(.99*3)=3 -> 4s
        assert out.loc["bash", "n_calls"] == 3
        assert out.loc["bash", "p50_us"] == 2_000_000
        assert out.loc["bash", "p95_us"] == 4_000_000
        assert out.loc["bash", "p99_us"] == 4_000_000

    def test_all_match_sql_twins(self):
        import duckdb

        from go_fluentd_ray import synth
        from go_fluentd_ray.functions import logops

        path = synth.ensure_corpus(60000)
        con = duckdb.connect()
        got = logops.log_templates(rd.read_parquet(path))
        want = con.execute(logops.log_templates_sql(path)).df()
        pd.testing.assert_frame_equal(got, want)
        assert len(got) == 30

        for fn, sql, keys in [
                (logops.throttle_tags,
                 logops.throttle_tags_sql(path),
                 ["tag", "window_us", "conv_id", "turn_idx"]),
                (logops.tool_latency_pct,
                 logops.tool_latency_pct_sql(path), ["tool"])]:
            got = (fn(rd.read_parquet(path)).to_pandas()
                   .sort_values(keys).reset_index(drop=True))
            want = (con.execute(sql).df()
                    .sort_values(keys).reset_index(drop=True))
            for c in want.columns:
                if want[c].dtype != got[c].dtype \
                        and got[c].dtype == "int64":
                    want[c] = want[c].astype("int64")
            pd.testing.assert_frame_equal(
                got, want[got.columns.tolist()])
            assert len(got) > 0


class TestSftPipeline:
    """Composed transcript -> SFT-dataset pipeline: every gate must
    independently shape the output."""

    @staticmethod
    def _conv(cid, roles, texts, t0=0):
        return pd.DataFrame({
            "conv_id": [cid] * len(texts),
            "turn_idx": np.arange(len(texts), dtype=np.int32),
            "role": roles,
            "text": texts,
            "tool": [""] * len(texts),
            "ts": pd.to_datetime(
                np.arange(len(texts)) * 1_000_000 + t0, unit="us"),
        })

    def test_gates_and_dedup_shape_output(self):
        from go_fluentd_ray.pipelines import sftbuild

        good = ["hi", "hello", "more", "sure"]
        df = pd.concat([
            # A: passes every gate -> its assistant turns are emitted
            self._conv("a", ["user", "assistant", "user", "assistant"],
                       good),
            # B: loop of 3 identical assistant turns -> excluded
            self._conv("b", ["user", "assistant", "assistant",
                             "assistant"],
                       ["q", "same", "same", "same"]),
            # C: exact duplicate of A, higher conv_id -> dedup drops it
            self._conv("c", ["user", "assistant", "user", "assistant"],
                       good),
            # D: single role -> stats gate drops it
            self._conv("d", ["user", "user"], ["x", "y"]),
        ], ignore_index=True)
        out = (sftbuild.sft_pipeline(rd.from_pandas(df), k_context=2)
               .to_pandas().sort_values(["conv_id", "turn_idx"])
               .reset_index(drop=True))
        assert set(out["conv_id"]) == {"a"}
        assert list(out["response"]) == ["hello", "sure"]
        assert list(out["context"]) == [
            "user: hi", "assistant: hello\nuser: more"]
        assert set(out["split"]) <= {"train", "val", "test"}

    def test_matches_sql_twin(self):
        import duckdb

        from go_fluentd_ray import synth
        from go_fluentd_ray.pipelines import sftbuild

        path = synth.ensure_corpus(60000)
        keys = ["conv_id", "turn_idx"]
        got = (sftbuild.sft_pipeline(rd.read_parquet(path)).to_pandas()
               .sort_values(keys).reset_index(drop=True))
        want = (duckdb.connect().execute(sftbuild.sft_pipeline_sql(path))
                .df().sort_values(keys).reset_index(drop=True))
        for c in want.columns:
            if want[c].dtype != got[c].dtype and got[c].dtype == "int64":
                want[c] = want[c].astype("int64")
        pd.testing.assert_frame_equal(got, want[got.columns.tolist()])
        # the gates must really bite vs ungated extraction
        from go_fluentd_ray.functions import convmine
        ungated = convmine.sft_examples(rd.read_parquet(path)).count()
        assert 0 < len(got) < ungated


class TestRateAnomaly:
    def test_planted_burst(self):
        from go_fluentd_ray.functions import logops

        # 13 quiet minutes with varied counts (non-zero variance),
        # then a burst minute: the burst must flag, the quiet must not
        rows = []
        counts = [3, 4, 3, 5, 4, 3, 4, 5, 3, 4, 3, 4, 4, 60]
        for m, c in enumerate(counts):
            for i in range(c):
                rows.append((f"c{m}-{i}", 0, "user",
                             m * 60_000_000 + i * 1000))
        df = pd.DataFrame(rows, columns=["conv_id", "turn_idx",
                                         "role", "ts"])
        df["turn_idx"] = df["turn_idx"].astype(np.int32)
        df["ts"] = pd.to_datetime(df["ts"], unit="us")
        out = (logops.rate_anomaly(rd.from_pandas(df))
               .to_pandas().sort_values("window_us")
               .reset_index(drop=True))
        # only windows 12 and 13 have a full 12-window trail
        assert len(out) == 2
        assert not bool(out.iloc[0]["is_anomaly"])   # count 4, quiet
        assert bool(out.iloc[1]["is_anomaly"])       # count 60, burst
        assert out.iloc[1]["z"] > 10

    def test_matches_sql_twin_bit_exact(self):
        import duckdb

        from go_fluentd_ray import synth
        from go_fluentd_ray.functions import logops

        path = synth.ensure_corpus(60000)
        keys = ["tag", "window_us"]
        got = (logops.rate_anomaly(rd.read_parquet(path)).to_pandas()
               .sort_values(keys).reset_index(drop=True))
        want = (duckdb.connect().execute(logops.rate_anomaly_sql(path))
                .df().sort_values(keys).reset_index(drop=True))
        for c in want.columns:
            if want[c].dtype != got[c].dtype and got[c].dtype == "int64":
                want[c] = want[c].astype("int64")
        pd.testing.assert_frame_equal(got, want[got.columns.tolist()])
        assert len(got) > 0
        # float z must be BIT-identical (same integer sums, same op
        # order), not merely approximately equal
        assert np.array_equal(got["z"].to_numpy().view(np.int64),
                              want["z"].to_numpy().view(np.int64))


class TestToolErrors:
    def test_hand_case_and_word_boundary(self):
        from go_fluentd_ray.functions import logops

        df = pd.DataFrame({
            "conv_id": ["a"] * 5,
            "turn_idx": np.arange(5, dtype=np.int32),
            "role": ["tool", "tool", "tool", "assistant", "tool"],
            "tool": ["bash", "bash", "py", "py", ""],
            "text": ["Error: exit 1",            # counts (bash)
                     "ok",                       # clean (bash)
                     "request TIMEOUT reached",  # counts (py), any case
                     "error",     # role != tool -> not an observation
                     "failed"],   # tool == '' -> not an observation
        })
        out = (logops.tool_errors(rd.from_pandas(df))
               .to_pandas().set_index("tool"))
        assert out.loc["bash", "n_obs"] == 2
        assert out.loc["bash", "n_err"] == 1
        assert out.loc["bash", "err_rate"] == 0.5
        assert out.loc["py", "n_obs"] == 1
        assert out.loc["py", "n_err"] == 1
        # substrings must NOT match: \b word boundaries
        df2 = df.assign(text=["terror", "unfailedness", "x", "y", "z"])
        out2 = (logops.tool_errors(rd.from_pandas(df2))
                .to_pandas().set_index("tool"))
        assert out2.loc["bash", "n_err"] == 0

    def test_matches_sql_twin(self):
        import duckdb

        from go_fluentd_ray import synth
        from go_fluentd_ray.functions import logops

        path = synth.ensure_corpus(60000)
        got = (logops.tool_errors(rd.read_parquet(path)).to_pandas()
               .sort_values("tool").reset_index(drop=True))
        want = (duckdb.connect().execute(logops.tool_errors_sql(path))
                .df().sort_values("tool").reset_index(drop=True))
        pd.testing.assert_frame_equal(got, want[got.columns.tolist()])
        # the synth corpus plants real tool errors
        assert got["n_err"].sum() > 0


class TestPreferencePairs:
    def test_hand_case_divergence_and_length(self):
        from go_fluentd_ray.functions import convmine

        def conv(cid, texts):
            return pd.DataFrame({
                "conv_id": [cid] * len(texts),
                "turn_idx": np.arange(len(texts), dtype=np.int32),
                "role": (["user", "assistant"] * len(texts))[:len(texts)],
                "text": texts,
            })

        df = pd.concat([
            # group 1: f1/f2 share 3 turns, diverge at turn 4
            conv("f1", ["hi", "a", "mid", "left"]),
            conv("f2", ["hi", "a", "mid", "right"]),
            # f3: same 2-turn prefix, diverges immediately at turn 3
            conv("f3", ["hi", "a", "other", "tail"]),
            # f4: PURE length divergence vs f1's prefix: f4 is a strict
            # prefix of f1 (first 3 turns) -> div at turn 4, text_b ''
            conv("f4", ["hi", "a", "mid"]),
            # exact dup of f1 -> same full_sig, NOT a separate variant
            conv("f9", ["hi", "a", "mid", "left"]),
        ], ignore_index=True)
        out = (convmine.preference_pairs(rd.from_pandas(df),
                                         k_prefix=2)
               .to_pandas().sort_values(["conv_a", "conv_b"])
               .reset_index(drop=True))
        # reps: f1 (f9 folded in), f2, f3, f4 -> C(4,2) = 6 pairs
        assert len(out) == 6
        r = out.set_index(["conv_a", "conv_b"])
        assert r.loc[("f1", "f2"), "div_turn"] == 4
        assert r.loc[("f1", "f2"), "text_a"] == "left"
        assert r.loc[("f1", "f2"), "text_b"] == "right"
        assert r.loc[("f1", "f3"), "div_turn"] == 3
        assert r.loc[("f1", "f4"), "div_turn"] == 4
        assert r.loc[("f1", "f4"), "text_a"] == "left"
        assert r.loc[("f1", "f4"), "text_b"] == ""  # f4 ended
        assert "f9" not in set(out["conv_a"]) | set(out["conv_b"])

    def test_matches_sql_twin(self):
        import duckdb

        from go_fluentd_ray import synth
        from go_fluentd_ray.functions import convmine

        path = synth.ensure_corpus(60000)
        keys = ["prefix_sig", "conv_a", "conv_b"]
        got = (convmine.preference_pairs(rd.read_parquet(path))
               .to_pandas().sort_values(keys).reset_index(drop=True))
        want = (duckdb.connect()
                .execute(convmine.preference_pairs_sql(path)).df()
                .sort_values(keys).reset_index(drop=True))
        for c in want.columns:
            if want[c].dtype != got[c].dtype and got[c].dtype == "int64":
                want[c] = want[c].astype("int64")
        pd.testing.assert_frame_equal(got, want[got.columns.tolist()])
        assert len(got) > 0


class TestNullTextRobustness:
    """A corpus with NULL text rows must not crash any transcript
    operator; nulls are treated as '' on BOTH engines (documented)."""

    def test_null_text_runs_and_matches_sql(self, tmp_path):
        import duckdb
        import pyarrow.parquet as pq

        from go_fluentd_ray.functions import convmine, logops
        from go_fluentd_ray.pipelines import sftbuild

        df = pd.DataFrame({
            "conv_id": ["a"] * 3 + ["b"] * 3,
            "turn_idx": np.array([0, 1, 2, 0, 1, 2], dtype=np.int32),
            "role": ["user", "assistant", "user",
                     "user", "assistant", "user"],
            "text": ["hi", None, "bye", "hi 42", "ok", None],
            "tool": ["", "bash", "", "", "", ""],
            "ts": pd.to_datetime(np.arange(6) * 1_000_000, unit="us"),
        })
        path = str(tmp_path / "nulls")
        import os

        os.makedirs(path)
        pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                       path + "/part.parquet")
        con = duckdb.connect()
        for fn, sql, keys in [
                (convmine.sft_examples,
                 convmine.sft_examples_sql(path),
                 ["conv_id", "turn_idx"]),
                (convmine.loop_detect,
                 convmine.loop_detect_sql(path), ["conv_id"]),
                (sftbuild.sft_pipeline,
                 sftbuild.sft_pipeline_sql(path),
                 ["conv_id", "turn_idx"]),
                (logops.log_templates,
                 logops.log_templates_sql(path), None),
                (logops.tool_errors,
                 logops.tool_errors_sql(path), ["tool"])]:
            res = fn(rd.read_parquet(path))
            got = res if isinstance(res, pd.DataFrame) else res.to_pandas()
            want = con.execute(sql).df()
            if len(got) == 0 and len(want) == 0:
                # Ray drops the schema of an all-empty dataset
                # (to_pandas yields zero columns) — emptiness parity
                # is the checkable contract here
                continue
            if keys:
                got = got.sort_values(keys).reset_index(drop=True)
                want = want.sort_values(keys).reset_index(drop=True)
            for c in want.columns:
                if want[c].dtype != got[c].dtype \
                        and got[c].dtype == "int64":
                    want[c] = want[c].astype("int64")
            pd.testing.assert_frame_equal(got, want[got.columns.tolist()])
        # the older transcript operators honor the same contract
        from go_fluentd_ray.functions import convstats, turnflow

        for fn, sql, keys in [
                (convstats.conversation_stats,
                 convstats.conversation_stats_sql(path), ["conv_id"]),
                (convstats.conversation_dedup,
                 convstats.conversation_dedup_sql(path), ["conv_id"]),
                (turnflow.context_truncate,
                 turnflow.context_truncate_sql(path),
                 ["conv_id", "turn_idx"])]:
            got = (fn(rd.read_parquet(path)).to_pandas()
                   .sort_values(keys).reset_index(drop=True))
            want = (con.execute(sql).df()
                    .sort_values(keys).reset_index(drop=True))
            for c in want.columns:
                if want[c].dtype != got[c].dtype \
                        and got[c].dtype == "int64":
                    want[c] = want[c].astype("int64")
            pd.testing.assert_frame_equal(got, want[got.columns.tolist()])
        # preference_pairs / prefix_forks: null-text convs don't crash
        out = convmine.prefix_forks(rd.read_parquet(path)).to_pandas()
        assert len(out) == 0  # two distinct convs, no shared prefix

    def test_rep_cap_bounds_hot_groups(self):
        from go_fluentd_ray.functions import convmine

        # 100 convs share a 2-turn prefix, each with a distinct 3rd
        # turn -> 100 variants; cap must keep C(64,2) pairs, smallest
        # conv_ids first, matching the SQL twin exactly
        rows = []
        for c in range(100):
            for i, t in enumerate(["hi", "a", f"v{c:03d}"]):
                rows.append((f"c{c:03d}", i,
                             ["user", "assistant", "assistant"][i], t))
        df = pd.DataFrame(rows, columns=["conv_id", "turn_idx",
                                         "role", "text"])
        df["turn_idx"] = df["turn_idx"].astype(np.int32)
        out = (convmine.preference_pairs(rd.from_pandas(df),
                                         k_prefix=2).to_pandas())
        m = convmine.MAX_REPS_PER_GROUP
        assert len(out) == m * (m - 1) // 2
        reps = set(out["conv_a"]) | set(out["conv_b"])
        assert reps == {f"c{c:03d}" for c in range(m)}


class TestPackAndCollapse:
    def test_pack_conversations_semantics(self):
        from go_fluentd_ray.functions import convmine

        # one bucket (B=1): conv token totals 3/2/4 with budget 5 ->
        # bins [c0,c1][c2]; over-budget conv gets its own bin
        df = pd.DataFrame({
            "conv_id": ["c0"] * 3 + ["c1"] * 2 + ["c2"] * 4 + ["c3"],
            "turn_idx": np.array([0, 1, 2, 0, 1, 0, 1, 2, 3, 0],
                                 dtype=np.int32),
            "text": ["w"] * 9 + ["a b c d e f g h"],  # c3: 8 tokens
        })
        out = (convmine.pack_conversations(rd.from_pandas(df),
                                           budget=5, num_buckets=1)
               .to_pandas().set_index("conv_id"))
        assert out.loc["c0", "seq_idx"] == 0
        assert out.loc["c1", "seq_idx"] == 0  # 3 + 2 fits
        assert out.loc["c2", "seq_idx"] == 1  # 5 + 4 spills
        assert out.loc["c3", "seq_idx"] == 2  # 8 > 5, own bin
        assert out.loc["c3", "n_tokens"] == 8

    def test_collapse_repeats_hand_case(self):
        from go_fluentd_ray.functions import logops

        df = pd.DataFrame({
            "conv_id": ["a"] * 5,
            "turn_idx": np.arange(5, dtype=np.int32),
            "role": ["user", "assistant", "assistant", "assistant",
                     "user"],
            "text": ["q", "same", "same", "same", "q"],
        })
        out = (logops.collapse_repeats(rd.from_pandas(df))
               .to_pandas().sort_values("turn_idx")
               .reset_index(drop=True))
        # run of 3 collapses to its first turn with n_repeats=3; the
        # two user turns are separate runs (non-consecutive)
        assert list(out["turn_idx"]) == [0, 1, 4]
        assert list(out["n_repeats"]) == [1, 3, 1]
        assert out.iloc[1]["text"] == "same"

    def test_both_match_sql_twins(self):
        import duckdb

        from go_fluentd_ray import synth
        from go_fluentd_ray.functions import convmine, logops

        path = synth.ensure_corpus(60000)
        con = duckdb.connect()
        for fn, sql, keys in [
                (convmine.pack_conversations,
                 convmine.pack_conversations_sql(path), ["conv_id"]),
                (logops.collapse_repeats,
                 logops.collapse_repeats_sql(path),
                 ["conv_id", "turn_idx"])]:
            got = (fn(rd.read_parquet(path)).to_pandas()
                   .sort_values(keys).reset_index(drop=True))
            want = (con.execute(sql).df()
                    .sort_values(keys).reset_index(drop=True))
            for c in want.columns:
                if want[c].dtype != got[c].dtype \
                        and str(got[c].dtype).startswith("int"):
                    want[c] = want[c].astype(got[c].dtype)
            pd.testing.assert_frame_equal(
                got, want[got.columns.tolist()])
            assert len(got) > 0
        # the corpus's planted repeats must actually collapse rows
        n_in = rd.read_parquet(path).count()
        n_out = logops.collapse_repeats(rd.read_parquet(path)).count()
        assert n_out < n_in


class TestConversationSessions:
    def test_hand_case_gap_splits(self):
        from go_fluentd_ray.functions import convstats

        # turns at 0s, 10s, 1h, 1h+5s -> two sessions (2 turns each);
        # single-turn conv -> one zero-duration session
        df = pd.DataFrame({
            "conv_id": ["a"] * 4 + ["b"],
            "turn_idx": np.array([0, 1, 2, 3, 0], dtype=np.int32),
            "ts": pd.to_datetime(
                [0, 10_000_000, 3_600_000_000, 3_605_000_000, 7],
                unit="us"),
        })
        out = (convstats.conversation_sessions(rd.from_pandas(df),
                                               gap_sec=1800)
               .to_pandas().sort_values(["conv_id", "session_idx"])
               .reset_index(drop=True))
        assert list(out["conv_id"]) == ["a", "a", "b"]
        assert list(out["session_idx"]) == [0, 1, 0]
        assert list(out["n_turns"]) == [2, 2, 1]
        assert out.iloc[0]["duration_sec"] == 10.0
        assert out.iloc[2]["duration_sec"] == 0.0

    def test_matches_sql_twin(self):
        import duckdb

        from go_fluentd_ray import synth
        from go_fluentd_ray.functions import convstats

        path = synth.ensure_corpus(60000)
        keys = ["conv_id", "session_idx"]
        got = (convstats.conversation_sessions(rd.read_parquet(path))
               .to_pandas().sort_values(keys).reset_index(drop=True))
        want = (duckdb.connect()
                .execute(convstats.conversation_sessions_sql(path))
                .df().sort_values(keys).reset_index(drop=True))
        for c in want.columns:
            if want[c].dtype != got[c].dtype and got[c].dtype == "int64":
                want[c] = want[c].astype("int64")
        pd.testing.assert_frame_equal(got, want[got.columns.tolist()])
        # the corpus must contain real multi-session conversations
        assert (got.groupby("conv_id").size() > 1).any()


class TestDailyRoleStats:
    def test_hand_case(self):
        from go_fluentd_ray.functions import logops

        df = pd.DataFrame({
            "conv_id": ["a", "a", "b", "b"],
            "turn_idx": np.arange(4, dtype=np.int32),
            "role": ["user", "user", "user", "assistant"],
            "text": ["ab", "cdef", "gh", "ij"],
            "ts": pd.to_datetime(["2024-01-01 10:00", "2024-01-02 10:00",
                                  "2024-01-01 23:59", "2024-01-01 09:00"]),
        })
        out = (logops.daily_role_stats(rd.from_pandas(df))
               .to_pandas().sort_values(["day", "role"])
               .reset_index(drop=True))
        out["day"] = out["day"].astype(str)
        # 2024-01-01/user: turns from convs a and b -> 2 turns, 2 convs
        r = out.set_index(["day", "role"])
        assert r.loc[("2024-01-01", "user"), "n_turns"] == 2
        assert r.loc[("2024-01-01", "user"), "n_convs"] == 2
        assert r.loc[("2024-01-01", "user"), "mean_chars"] == 2.0
        assert r.loc[("2024-01-02", "user"), "n_turns"] == 1
        assert r.loc[("2024-01-01", "assistant"), "n_convs"] == 1

    def test_matches_sql_twin(self):
        import duckdb

        from go_fluentd_ray import synth
        from go_fluentd_ray.functions import logops

        path = synth.ensure_corpus(60000)
        keys = ["day", "role"]
        got = (logops.daily_role_stats(rd.read_parquet(path))
               .to_pandas().sort_values(keys).reset_index(drop=True))
        want = (duckdb.connect()
                .execute(logops.daily_role_stats_sql(path)).df()
                .sort_values(keys).reset_index(drop=True))
        got["day"] = got["day"].astype(str)
        want["day"] = want["day"].astype(str)
        for c in want.columns:
            if want[c].dtype != got[c].dtype and got[c].dtype == "int64":
                want[c] = want[c].astype("int64")
        pd.testing.assert_frame_equal(got, want[got.columns.tolist()])
        assert len(got) > 0


class TestKeepBestAndIncremental:
    """dedup.minhash_dedup_keep_best (argmax-quality per near-dup
    cluster) and dedup.incremental_dedup (new shard vs seen corpus),
    each against planted cases AND its own DuckDB twin."""

    def _cluster_df(self):
        base = ("the cat and the dog went to the market in town and "
                "bought the apples before noon ") * 3
        texts = [base + "first tail words",
                 base + "second tail words",
                 # extra stopwords: highest quality member is NOT min id
                 base + "the of to in is it and or an a the of to in is"]
        singles = ["alpha bravo charlie delta echo foxtrot unique doc",
                   "golf hotel india juliet kilo lima unique words here"]
        return pd.DataFrame({"doc_id": [0, 1, 2, 10, 11],
                             "text": texts + singles})

    def test_keep_best_keeps_argmax_quality(self):
        df = self._cluster_df()
        qt = T.quality_batch(
            pa.Table.from_pandas(df[df.doc_id <= 2], preserve_index=False))
        q = dict(zip(qt["doc_id"].to_pylist(), qt["quality"].to_pylist()))
        keeper = max(q, key=lambda k: (q[k], -k))
        assert keeper != 0  # the interesting case: argmax is not min id

        pairs = dedup.minhash_dedup(rd.from_pandas(df), threshold=0.6,
                                    min_bands=1).to_pandas()
        nodes = set(pairs.a) | set(pairs.b)
        assert nodes == {0, 1, 2}  # one cluster, singletons untouched

        out = dedup.minhash_dedup_keep_best(
            rd.from_pandas(df), threshold=0.6, min_bands=1).to_pandas()
        assert set(out.doc_id) == {keeper, 10, 11}

        import duckdb

        con = duckdb.connect()
        con.register("documents", df)
        want = con.sql(dedup.minhash_dedup_keep_best_sql(
            threshold=0.6, min_bands=1)).df()
        assert sorted(want.doc_id) == sorted(out.doc_id)

    def test_incremental_dedup_planted(self):
        from go_fluentd_ray.functions.sampling import _md5_mod100

        ids = list(range(200))
        pct = _md5_mod100(ids)
        seen_ids = [i for i in ids if pct[i] < 80]
        new_ids = [i for i in ids if pct[i] >= 80]
        s0, s1 = seen_ids[0], seen_ids[1]
        n0, n1, n2, n3 = new_ids[:4]
        base = ("the quick brown fox jumps over the lazy dog near "
                "the river bank every single morning ") * 3
        anchor = ("seen standalone anchor text alpha beta gamma delta "
                  "epsilon zeta eta theta")
        survivor = ("brand new content nobody has ever ingested before "
                    "xylophone quasar nebula")
        df = pd.DataFrame({
            "doc_id": [s0, s1, n0, n1, n2, n3],
            "text": [anchor,                 # seen
                     base,                   # seen near-dup anchor
                     anchor,                 # new, exact dup of seen -> drop
                     base + " extra tail",   # new, near dup of seen -> drop
                     survivor,               # new, unique -> keep
                     survivor],              # new, exact dup of ANOTHER NEW
                                             # doc -> keep (cross-corpus only)
            "lang": ["en"] * 6, "source": ["t"] * 6,
        })
        out = dedup.incremental_dedup(rd.from_pandas(df), seen_pct=80,
                                      threshold=0.6,
                                      min_bands=1).to_pandas()
        assert set(out.doc_id) == {n2, n3}
        assert set(out.columns) == {"doc_id", "text", "lang", "source"}

        import duckdb

        con = duckdb.connect()
        con.register("documents", df)
        want = con.sql(dedup.incremental_dedup_sql(
            seen_pct=80, threshold=0.6, min_bands=1)).df()
        assert sorted(want.doc_id) == sorted(out.doc_id)


class TestBpeTrain:
    """Distributed BPE trainer vs the published naive algorithm."""

    @staticmethod
    def _corpus_df():
        # the classic Sennrich fig.1 word frequencies, expressed as
        # documents so the corpus word-count pass is exercised too
        words = (["low"] * 5 + ["lower"] * 2 + ["newest"] * 6
                 + ["widest"] * 3)
        rng = np.random.default_rng(7)
        rng.shuffle(words)
        docs = [" ".join(words[i::4]) for i in range(4)]
        return pd.DataFrame({"doc_id": np.arange(4, dtype=np.int64),
                             "text": docs})

    def test_matches_naive_sennrich(self):
        from go_fluentd_ray.functions import bpetrain

        df = self._corpus_df()
        out = bpetrain.bpe_train(rd.from_pandas(df).repartition(3),
                                 n_merges=10)
        want = bpetrain.naive_bpe(
            {"low": 5, "lower": 2, "newest": 6, "widest": 3}, 10)
        got = list(zip(out["left"], out["right"], out["n"]))
        assert got == want, (got, want)
        # the textbook first merges: ('e','s') then ('es','t') ...
        assert got[0][0] == "e" and got[0][1] == "s" and got[0][2] == 9
        assert (out["merged"] == out["left"] + out["right"]).all()

    def test_distributed_chunked_path_identical(self):
        """Force the multi-chunk ray-task path (local_max_rows=0) and a
        different partitioning — the merge table must be identical:
        pair counts are additive across chunks."""
        from go_fluentd_ray.functions import bpetrain

        df = self._corpus_df()
        a = bpetrain.bpe_train(rd.from_pandas(df).repartition(2),
                               n_merges=8)
        b = bpetrain.bpe_train(rd.from_pandas(df).repartition(7),
                               n_merges=8, local_max_rows=0,
                               num_buckets=5)
        pd.testing.assert_frame_equal(a, b)

    def test_matches_naive_real_corpus(self):
        """Real sf0.001 documents (both paths) vs naive on the same
        word counts."""
        import re

        from go_fluentd_ray.functions import bpetrain

        docs = pd.read_parquet(f"{SF}/documents.parquet",
                               columns=["text"])
        wc: dict[str, int] = {}
        for t in docs["text"]:
            for w in re.findall(r"\w+", t):
                wc[w] = wc.get(w, 0) + 1
        want = bpetrain.naive_bpe(wc, 25)
        ds = rd.read_parquet(f"{SF}/documents.parquet",
                             columns=["text"])
        out = bpetrain.bpe_train(ds, n_merges=25)
        got = list(zip(out["left"], out["right"], out["n"]))
        assert got == want
        out2 = bpetrain.bpe_train(ds, n_merges=25, local_max_rows=0)
        assert list(zip(out2["left"], out2["right"], out2["n"])) == want

    def test_overlap_greedy_leftmost(self):
        """Runs of an identical pair merge leftmost-greedy: 'aaaa'
        -> two 'aa' symbols, 'aaa' -> 'aa' + 'a'."""
        from go_fluentd_ray.functions import bpetrain

        df = pd.DataFrame({"doc_id": [0], "text": ["aaaa aaaa aaa"]})
        out = bpetrain.bpe_train(rd.from_pandas(df), n_merges=2)
        want = bpetrain.naive_bpe({"aaaa": 2, "aaa": 1}, 2)
        assert list(zip(out["left"], out["right"], out["n"])) == want

    def test_delta_engine_matches_naive_and_recount(self):
        """The O(matches)/iteration delta engine (bpedelta) must
        reproduce bpe_train and naive_bpe exactly on the textbook
        corpus, on both its local and chunked (actor) paths."""
        from go_fluentd_ray.functions import bpedelta, bpetrain

        df = self._corpus_df()
        want = bpetrain.bpe_train(rd.from_pandas(df).repartition(3),
                                  n_merges=10)
        got = bpedelta.bpe_train_delta(
            rd.from_pandas(df).repartition(3), n_merges=10)
        pd.testing.assert_frame_equal(got, want)
        got2 = bpedelta.bpe_train_delta(
            rd.from_pandas(df).repartition(5), n_merges=10,
            local_max_rows=0, num_buckets=3)
        pd.testing.assert_frame_equal(got2, want)

    def test_delta_engine_overlap_runs(self):
        """Greedy-leftmost parity in link space: self-pair runs
        ('aaaa', 'aaaaa') keep even ordinals exactly like the
        recount path."""
        from go_fluentd_ray.functions import bpedelta, bpetrain

        df = pd.DataFrame({"doc_id": [0, 1],
                           "text": ["aaaa aaaa aaa", "aaaaa baab"]})
        want = bpetrain.naive_bpe({"aaaa": 2, "aaa": 1, "aaaaa": 1,
                                   "baab": 1}, 6, min_count=1)
        out = bpedelta.bpe_train_delta(rd.from_pandas(df), n_merges=6,
                                       min_count=1)
        assert list(zip(out["left"], out["right"], out["n"])) == want

    def test_delta_engine_randomized_long(self):
        """80 merges over a randomized 3000-word Zipf-ish table with
        repeated-char runs and shared affixes — the fused-loop
        hardening corpus — must equal naive exactly on BOTH delta
        paths (the long horizon catches any count-drift a windowed
        delta bug would accumulate)."""
        from go_fluentd_ray.functions import bpedelta, bpetrain

        rng = np.random.default_rng(13)
        frags = ["ab", "ba", "aa", "bb", "ca", "ac", "abc", "cab"]
        words = {}
        for _ in range(3000):
            w = "".join(rng.choice(frags)
                        for _ in range(rng.integers(1, 6)))
            if rng.random() < 0.2:
                w += "a" * int(rng.integers(2, 6))
            words[w] = words.get(w, 0) + int(rng.zipf(1.7))
        want = bpetrain.naive_bpe(words, 80)
        docs, cur = [], []
        for w, c in words.items():
            cur.extend([w] * c)
            if len(cur) >= 50:
                docs.append(" ".join(cur))
                cur = []
        if cur:
            docs.append(" ".join(cur))
        df = pd.DataFrame({"doc_id": np.arange(len(docs),
                                               dtype=np.int64),
                           "text": docs})
        out = bpedelta.bpe_train_delta(rd.from_pandas(df), n_merges=80)
        assert list(zip(out["left"], out["right"], out["n"])) == want
        out2 = bpedelta.bpe_train_delta(
            rd.from_pandas(df).repartition(9), n_merges=80,
            local_max_rows=0)
        assert list(zip(out2["left"], out2["right"], out2["n"])) == want

    def test_token_lens(self):
        from go_fluentd_ray.functions import bpetrain

        df = self._corpus_df()
        merges = bpetrain.bpe_train(rd.from_pandas(df), n_merges=10)
        test = pd.DataFrame({
            "doc_id": np.array([0, 1, 2], dtype=np.int64),
            "text": ["low lowest", "newest", "zzz unseen-chars"]})
        out = bpetrain.bpe_token_lens(
            rd.from_pandas(test), merges).to_pandas().sort_values(
            "doc_id").reset_index(drop=True)

        # reference: naive encode with the same merges
        def enc(word):
            syms = list(word) + ["</w>"]
            for ls, rs, _ in zip(merges["left"], merges["right"],
                                 merges["n"]):
                i, out_s = 0, []
                while i < len(syms):
                    if (i + 1 < len(syms) and syms[i] == ls
                            and syms[i + 1] == rs):
                        out_s.append(ls + rs)
                        i += 2
                    else:
                        out_s.append(syms[i])
                        i += 1
                syms = out_s
            return len(syms)

        import re
        want = [sum(enc(w) for w in re.findall(r"\w+", t))
                for t in test["text"]]
        assert out["n_bpe"].tolist() == want


class TestAnnIndex:
    """Persistent IVF-PQ index: build/query split, shard pruning."""

    def test_indexed_recall(self, tmp_path):
        from go_fluentd_ray.functions import annindex

        ds = rd.read_parquet(f"{SF}/embeddings.parquet")
        # build into a throwaway dir so code changes never hit a
        # stale /tmp index
        idx = str(tmp_path / "idx")
        annindex.build_ivfpq_index(ds, idx)
        from go_fluentd_ray.functions.similarity import knn_bruteforce
        bf = knn_bruteforce(ds, 5)
        iv = annindex.knn_ivfpq_query(idx, ds, k=5)
        recalls = []
        for qid in sorted(bf["qid"].unique()):
            truth = set(bf.loc[bf["qid"] == qid, "vec_id"])
            got = set(iv.loc[iv["qid"] == qid, "vec_id"])
            recalls.append(len(truth & got) / max(len(truth), 1))
        assert float(np.mean(recalls)) >= 0.9, recalls

    def test_shard_pruning_clustered(self, tmp_path):
        """On clustered data a small nprobe reads a strict subset of
        the shard files AND still recovers the true neighbors (they
        live in the probed cells)."""
        from go_fluentd_ray.functions import annindex
        from go_fluentd_ray.functions.similarity import knn_bruteforce

        rng = np.random.default_rng(41)
        n, dim = 30_000, 16
        centers = rng.normal(size=(16, dim))
        centers /= np.linalg.norm(centers, axis=1, keepdims=True)
        V = centers[rng.integers(0, 16, n)] + 0.05 * rng.normal(
            size=(n, dim))
        V /= np.linalg.norm(V, axis=1, keepdims=True)
        df = pd.DataFrame({"vec_id": np.arange(n, dtype=np.int64),
                           "embedding": [v.tolist() for v in V]})
        ds = rd.from_pandas(df).repartition(8)
        idx = str(tmp_path / "idx")
        meta = annindex.build_ivfpq_index(ds, idx, n_centroids=16,
                                          m=4, ks=64)
        assert meta["n_centroids"] == 16
        # probes for nprobe=3: strictly fewer shard files than total
        from go_fluentd_ray.functions.similarity import query_matrix
        model = np.load(f"{idx}/model.npz")
        Q = query_matrix(dim)
        probes = np.argsort(-(Q @ model["C"].T), axis=1)[:, :3]
        shards = np.unique(np.unique(probes) // meta["cells_per_shard"])
        pruned = annindex.probed_shard_files(idx, shards)
        everything = annindex.all_shard_files(idx)
        assert len(pruned) < len(everything), (len(pruned),
                                               len(everything))
        # and the pruned query still finds the true neighbors
        bf = knn_bruteforce(ds, 5)
        iv = annindex.knn_ivfpq_query(idx, ds, k=5, nprobe=3)
        recalls = []
        for qid in sorted(bf["qid"].unique()):
            truth = set(bf.loc[bf["qid"] == qid, "vec_id"])
            got = set(iv.loc[iv["qid"] == qid, "vec_id"])
            recalls.append(len(truth & got) / max(len(truth), 1))
        assert float(np.mean(recalls)) >= 0.9, recalls

    def test_rerank_reads_candidate_shards_only(self, tmp_path):
        """The exact re-rank must read a STRICT subset of the
        embedding-store files (dir pruning by hash(vec_id)) and return
        byte-identical output to the legacy full-corpus-gather path."""
        import json as _json
        import shutil

        from go_fluentd_ray.functions import annindex

        ds = rd.read_parquet(f"{SF}/embeddings.parquet")
        idx = str(tmp_path / "idx")
        annindex.build_ivfpq_index(ds, idx)
        # small shortlist -> few candidates -> some vshard dirs untouched
        iv = annindex.knn_ivfpq_query(idx, k=5, shortlist=8)
        read_files = annindex.LAST_RERANK_FILES
        assert read_files is not None
        everything = annindex.all_emb_files(idx)
        assert set(read_files) < set(everything), (
            len(read_files), len(everything))
        # legacy path (index without a store) must agree exactly
        legacy = str(tmp_path / "legacy")
        shutil.copytree(idx, legacy)
        with open(f"{legacy}/meta.json") as f:
            meta = _json.load(f)
        meta.pop("emb_store")
        with open(f"{legacy}/meta.json", "w") as f:
            _json.dump(meta, f)
        iv2 = annindex.knn_ivfpq_query(legacy, ds, k=5, shortlist=8)
        assert annindex.LAST_RERANK_FILES is None
        pd.testing.assert_frame_equal(iv.reset_index(drop=True),
                                      iv2.reset_index(drop=True))

    def test_ensure_index_concurrent_single_build(self, tmp_path,
                                                  monkeypatch):
        """Two concurrent ensure_index calls on the same key must pay
        ONE build: the loser blocks on the O_EXCL lease, then returns
        the winner's index."""
        import threading

        from go_fluentd_ray.functions import annindex

        ds = rd.read_parquet(f"{SF}/embeddings.parquet")
        builds = []
        real = annindex.build_ivfpq_index

        def counting(*a, **kw):
            builds.append(1)
            return real(*a, **kw)

        monkeypatch.setattr(annindex, "build_ivfpq_index", counting)
        results = []
        threads = [threading.Thread(target=lambda: results.append(
            annindex.ensure_index(SF, ds, cache_root=str(tmp_path))))
            for _ in range(2)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert len(builds) == 1, builds
        assert len(set(results)) == 1 and os.path.exists(
            os.path.join(results[0], "meta.json"))

    def test_empty_partials_degrade_gracefully(self):
        """A fully-empty ADC partial set (every probed cell empty —
        possible on degenerate tiny indexes) must reduce to an empty
        typed shortlist, not crash on the column-less to_pandas
        frame."""
        from go_fluentd_ray.functions.similarity import _reduce_shortlist

        empty = rd.from_arrow(pa.table({
            "qid": pa.array([], pa.int64()),
            "vec_id": pa.array([], pa.int64()),
            "sim": pa.array([], pa.float32())}))
        short, cand = _reduce_shortlist(empty, 8, 4)
        assert cand.size == 0 and len(short) == 0
        assert list(short.columns) == ["qid", "vec_id", "sim"]

    def test_auto_nprobe_fraction(self):
        from go_fluentd_ray.functions.annindex import auto_nprobe

        assert auto_nprobe(2048) == 102      # 5% of cells
        assert auto_nprobe(16) == 8          # floor
        assert auto_nprobe(4) == 4           # capped at n_centroids

    def test_fused_local_loop_matches_naive_randomized(self):
        """Harden the fused fast path: a 3000-word randomized table
        with repeated-char runs ('aaaa'), shared prefixes/suffixes and
        Zipf-ish counts must reproduce the naive algorithm exactly
        over 80 merges."""
        import random

        from go_fluentd_ray.functions import bpetrain

        rnd = random.Random(99)
        alpha = "abcdefgh"
        wc = {}
        for _ in range(3000):
            n = rnd.randint(1, 10)
            w = "".join(rnd.choice(alpha) for _ in range(n))
            if rnd.random() < 0.2:
                w += rnd.choice(alpha) * rnd.randint(2, 5)  # runs
            wc[w] = wc.get(w, 0) + rnd.randint(1, 50)
        want = bpetrain.naive_bpe(wc, 80)
        # one doc per word repeated count times is too big; feed the
        # words table directly through the fused loop
        words = np.asarray(sorted(wc), dtype=object)
        counts = np.array([wc[w] for w in sorted(wc)], dtype=np.int64)
        chars = sorted(set("".join(sorted(wc))))
        vocab = chars + [bpetrain.EOW]
        syms, wid = bpetrain._explode(
            words, {c: i for i, c in enumerate(chars)}, len(vocab) - 1)
        got = bpetrain._local_merge_loop(syms, wid, counts, vocab,
                                         80, 2)
        assert [(m[1], m[2], m[4]) for m in got] == want


class TestBigramPmiPpm:
    """Relative (ppm) support floor for corpus-proportional candidate
    cost at scale."""

    def test_ppm_floor_scales_with_mass(self):
        from go_fluentd_ray.functions import ngrams

        # 10 docs x 11 tokens = 100 bigrams; 'new york' appears 10x
        # (100k ppm), 'rare pair' once (10k ppm)
        rows = ["new york " + "a b c d e f g h i" for _ in range(9)]
        rows.append("new york rare pair a b c d e f g")
        df = pd.DataFrame({"doc_id": np.arange(10, dtype=np.int64),
                           "text": rows})
        lo = ngrams.bigram_pmi(rd.from_pandas(df), k=50, min_count=1,
                               min_count_ppm=5_000)
        hi = ngrams.bigram_pmi(rd.from_pandas(df), k=50, min_count=1,
                               min_count_ppm=50_000)
        lo_pairs = set(zip(lo["w1"], lo["w2"]))
        hi_pairs = set(zip(hi["w1"], hi["w2"]))
        assert ("rare", "pair") in lo_pairs      # above 5k ppm
        assert ("rare", "pair") not in hi_pairs  # below 50k ppm
        assert ("new", "york") in hi_pairs       # 100k ppm survives
        assert hi_pairs < lo_pairs               # floor only tightens
