"""Representative extra-operator benchmarks over the testdata tables,
run by bench.py after the flagship headline. Each entry materializes
its (small) result so the timing covers the full pipeline."""

from __future__ import annotations



# sized read of a corpus dir (the flagship read rule — raw read_parquet
# yields one tiny block per file; measured 16x on bucket exchanges)
from ..pipelines.flagship import read_transcripts as _sized  # noqa: E402


def _docs(sf_dir: str, cols=("doc_id", "text")):
    """Column-pruned at the read (Ray does not push a later Project
    into ReadParquet): the default (doc_id, text) projection is what
    nearly every text operator consumes; callers needing more pass
    cols explicitly, full-schema callers pass cols=None."""
    from ..io_util import sized_read_parquet

    return sized_read_parquet(f"{sf_dir}/documents.parquet",
                              columns=list(cols) if cols else None)


def _emb(sf_dir: str, cols=None):
    from ..io_util import sized_read_parquet

    return sized_read_parquet(f"{sf_dir}/embeddings.parquet",
                              columns=list(cols) if cols else None)


def bench_dedup_exact(sf_dir: str):
    from .dedup import exact_dedup

    return exact_dedup(_docs(sf_dir)).count()


def bench_dedup_minhash(sf_dir: str):
    from .dedup import minhash_dedup

    return minhash_dedup(_docs(sf_dir), min_bands=2).count()


def bench_quality(sf_dir: str):
    from .text import quality_batch

    return _docs(sf_dir).map_batches(
        quality_batch, batch_format="pyarrow", zero_copy_batch=True).count()


def bench_knn(sf_dir: str):
    from .similarity import knn_bruteforce

    return len(knn_bruteforce(_emb(sf_dir, ("vec_id", "embedding"))))


def bench_events_hourly(sf_dir: str):
    import ray.data as rd

    from .events import events_hourly

    from ..io_util import sized_read_parquet

    return events_hourly(sized_read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["ts", "event_type", "value", "props"])).count()


BENCHES = {
    "dedup_exact": bench_dedup_exact,
    "dedup_minhash_lsh": bench_dedup_minhash,
    "quality_score": bench_quality,
    "knn_bruteforce": bench_knn,
    "events_hourly": bench_events_hourly,
}


def bench_sessionize(sf_dir: str):
    import ray.data as rd

    from .events import sessionize

    from ..io_util import sized_read_parquet

    return sessionize(sized_read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id"])).count()


def bench_asof(sf_dir: str):
    import ray.data as rd

    from .joins import asof_signup_lag

    from ..io_util import sized_read_parquet

    return asof_signup_lag(sized_read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type"])).count()


def bench_doc_chunks(sf_dir: str):
    from .sampling import chunk_documents

    return chunk_documents(_docs(sf_dir)).count()


BENCHES.update({
    "sessionize": bench_sessionize,
    "asof_signup_lag": bench_asof,
    "doc_chunks": bench_doc_chunks,
})


def bench_pack(sf_dir: str):
    from .sampling import pack_documents

    return pack_documents(_docs(sf_dir)).count()


def bench_lm_score(sf_dir: str):
    from .text import lm_score

    return lm_score(_docs(sf_dir)).count()


BENCHES.update({
    "pack_sequences": bench_pack,
    "lm_score": bench_lm_score,
})


def bench_decontaminate(sf_dir: str):
    from .decontam import decontaminate
    from .sampling import hash_sample

    return decontaminate(_docs(sf_dir), hash_sample(_docs(sf_dir), 2),
                         n=3).count()


def bench_semantic_decontaminate(sf_dir: str):
    import numpy as np
    import pyarrow as pa

    from .decontam import semantic_decontaminate

    def split(is_bench: bool):
        def fn(b):
            m = b["vec_id"].to_numpy() % 17 == 0
            return b.filter(pa.array(m if is_bench else ~m))
        return fn

    emb = _emb(sf_dir, cols=["vec_id", "embedding", "label"])
    bench = emb.map_batches(split(True), batch_format="pyarrow",
                            zero_copy_batch=True)
    corpus = emb.map_batches(split(False), batch_format="pyarrow",
                             zero_copy_batch=True)
    return semantic_decontaminate(corpus, bench, threshold=0.30,
                                  keep_cols=["vec_id", "label"]).count()


def bench_shuffle_shards(sf_dir: str):
    from .sampling import shuffle_shards

    return shuffle_shards(_docs(sf_dir, ("doc_id",)), num_shards=16).count()


def bench_semantic_dedup(sf_dir: str):
    from .semdedup import semantic_dedup

    return semantic_dedup(_emb(sf_dir), threshold=0.95).count()


BENCHES.update({
    "decontaminate": bench_decontaminate,
    "semantic_decontaminate": bench_semantic_decontaminate,
    "shuffle_shards": bench_shuffle_shards,
    "semantic_dedup": bench_semantic_dedup,
})


def bench_line_dedup(sf_dir: str):
    from go_fluentd_ray import synth

    from .linededup import line_dedup
    from ..io_util import sized_read_parquet

    path = synth.ensure_multiline_docs(synth.docs_for_sf_dir(sf_dir))
    return line_dedup(sized_read_parquet(path)).count()


def bench_quality_prune(sf_dir: str):
    from .text import quality_prune

    return quality_prune(_docs(sf_dir), pct=20).count()


def bench_jaccard_join(sf_dir: str):
    from .dedup import jaccard_join

    return jaccard_join(_docs(sf_dir), threshold=0.8).count()


BENCHES.update({
    "line_dedup": bench_line_dedup,
    "quality_prune": bench_quality_prune,
    "dedup_jaccard": bench_jaccard_join,
})


def bench_corpus_stats(sf_dir: str):
    from .aggregates import corpus_stats

    return corpus_stats(_docs(sf_dir, ("text", "source", "lang"))).count()


BENCHES.update({"corpus_stats": bench_corpus_stats})


def bench_tfidf(sf_dir: str):
    from .text import tfidf_keywords

    return tfidf_keywords(_docs(sf_dir), k=5).count()


BENCHES.update({"tfidf_keywords": bench_tfidf})


def bench_span_dedup(sf_dir: str):
    from .spandedup import span_dedup

    return span_dedup(_docs(sf_dir)).count()


def bench_bm25(sf_dir: str):
    from .bm25 import bm25_topk

    return len(bm25_topk(_docs(sf_dir)))


BENCHES.update({"dedup_spans": bench_span_dedup, "bm25_topk": bench_bm25})


def bench_gopher_quality(sf_dir: str):
    import ray.data as rd

    from .. import synth
    from .gopherquality import gopher_signals

    path = synth.ensure_multiline_docs(synth.docs_for_sf_dir(sf_dir))
    return gopher_signals(_sized(path)).count()


def bench_pretrain_pipeline(sf_dir: str):
    from ..pipelines.curation import pretrain_pipeline

    return pretrain_pipeline(_docs(sf_dir)).count()


BENCHES.update({"gopher_quality": bench_gopher_quality,
                "pretrain_pipeline": bench_pretrain_pipeline})


def bench_dsir(sf_dir: str):
    from .dsir import dsir_scores

    return dsir_scores(_docs(sf_dir)).count()


BENCHES.update({"dsir_scores": bench_dsir})


def bench_selection_pipeline(sf_dir: str):
    from ..pipelines.curation import selection_pipeline

    return selection_pipeline(_docs(sf_dir)).count()


BENCHES.update({"selection_pipeline": bench_selection_pipeline})


def bench_range_join(sf_dir: str):
    import ray.data as rd

    from .rangejoin import range_join_counts

    from ..io_util import sized_read_parquet

    return range_join_counts(sized_read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "event_type"])).count()


BENCHES.update({"range_join_signups": bench_range_join})


def bench_conversation_stats(sf_dir: str):
    import ray.data as rd

    from .. import synth
    from .convstats import conversation_stats

    path = synth.ensure_corpus(synth.turns_for_sf_dir(sf_dir))
    return conversation_stats(_sized(path)).count()


BENCHES.update({"conversation_stats": bench_conversation_stats})


def bench_turnflow(sf_dir: str):
    """Times the whole turn-flow window family over one corpus read
    each — all three share the one hash(conv_id) bucketed exchange."""
    import ray.data as rd

    from .. import synth
    from .turnflow import context_truncate, role_transitions, tool_latency

    path = synth.ensure_corpus(synth.turns_for_sf_dir(sf_dir))
    n = tool_latency(_sized(path)).count()
    n += role_transitions(_sized(path)).count()
    n += context_truncate(_sized(path)).count()
    return n


BENCHES.update({"turnflow": bench_turnflow})


def bench_sft_pipeline(sf_dir: str):
    """The composed transcript -> SFT-dataset build (gates -> dedup ->
    extraction -> split): three bucketed exchanges, text moves once."""
    import ray.data as rd

    from .. import synth
    from ..pipelines.sftbuild import sft_pipeline

    path = synth.ensure_corpus(synth.turns_for_sf_dir(sf_dir))
    return sft_pipeline(_sized(path)).count()


def bench_log_analytics(sf_dir: str):
    """Template mining + rate anomaly over one corpus read each —
    both are skinny-partial patterns (counts move, text doesn't)."""
    import ray.data as rd

    from .. import synth
    from .logops import log_templates, rate_anomaly

    path = synth.ensure_corpus(synth.turns_for_sf_dir(sf_dir))
    n = len(log_templates(_sized(path)))
    n += rate_anomaly(_sized(path)).count()
    return n


BENCHES.update({"sft_pipeline": bench_sft_pipeline,
                "log_analytics": bench_log_analytics})


def bench_hash_join(sf_dir: str):
    """Native hash-join shapes (Q3-style semi+inner and left_anti) over
    the TPC-H-ish tables — both sides hash-partitioned, nothing
    broadcast."""
    from ..io_util import _path_bytes, sized_read_parquet
    from .joins import customers_without_orders, order_revenue_topn

    li = sized_read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount",
                 "l_shipdate"])
    orders = sized_read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate",
                 "o_orderpriority"])
    cust = sized_read_parquet(f"{sf_dir}/customer.parquet",
                              columns=["c_custkey", "c_mktsegment"])
    n = order_revenue_topn(
        li, orders, cust,
        approx_bytes=_path_bytes(f"{sf_dir}/lineitem.parquet")).count()
    n += customers_without_orders(
        sized_read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_mktsegment"]),
        sized_read_parquet(f"{sf_dir}/orders.parquet",
                           columns=["o_custkey", "o_orderdate"]),
        approx_bytes=_path_bytes(f"{sf_dir}/orders.parquet")).count()
    return n


BENCHES.update({"hash_join": bench_hash_join})


def bench_dedup_keep_best(sf_dir: str):
    """Argmax-quality-per-cluster dedup (minhash pairs + CC + two
    pair-graph score shuffles + one corpus anti-join)."""
    from .dedup import minhash_dedup_keep_best

    return minhash_dedup_keep_best(_docs(sf_dir), threshold=0.7,
                                   min_bands=2).count()


def bench_dedup_incremental(sf_dir: str):
    """Cross-corpus incremental dedup (new shard vs seen corpus,
    exact-hash + minhash tiers)."""
    from .dedup import incremental_dedup

    return incremental_dedup(_docs(sf_dir, cols=None),
                             seen_pct=80, threshold=0.7,
                             min_bands=2).count()


BENCHES.update({"dedup_keep_best": bench_dedup_keep_best,
                "dedup_incremental": bench_dedup_incremental})


def bench_knn_pq(sf_dir: str):
    """PQ(ADC)+re-rank ANN over the embeddings table."""
    from .similarity import knn_pq

    return len(knn_pq(_emb(sf_dir, cols=["vec_id", "embedding"])))


def bench_knn_ivfpq(sf_dir: str):
    from .similarity import knn_ivfpq

    return len(knn_ivfpq(_emb(sf_dir, cols=["vec_id", "embedding"])))


BENCHES.update({"knn_pq": bench_knn_pq, "knn_ivfpq": bench_knn_ivfpq})


def bench_bpe_train(sf_dir: str):
    """BPE tokenizer training: one skinny distinct-word shuffle + 120
    vectorized merge iterations over the word-frequency table."""
    from .bpetrain import bpe_train

    return len(bpe_train(_docs(sf_dir, cols=("text",)), n_merges=120))


BENCHES.update({"bpe_train": bench_bpe_train})


def bench_ivfpq_index(sf_dir: str):
    """Build the persistent IVF-PQ index fresh + one query batch —
    the production build/query split (build amortizes in real use)."""
    import shutil
    import tempfile

    from .annindex import build_ivfpq_index, knn_ivfpq_query

    idx = tempfile.mkdtemp(prefix="annidx-bench-")
    try:
        ds = _emb(sf_dir, cols=["vec_id", "embedding"])
        build_ivfpq_index(ds, idx)
        return len(knn_ivfpq_query(idx, ds))
    finally:
        shutil.rmtree(idx, ignore_errors=True)


BENCHES.update({"ivfpq_index": bench_ivfpq_index})


def bench_bm25_index(sf_dir: str):
    """Build the persistent BM25 inverted index fresh + one query
    batch — lexical build/query split (build amortizes in real use)."""
    import shutil
    import tempfile

    from .bm25index import bm25_index_query, build_bm25_index

    idx = tempfile.mkdtemp(prefix="bm25idx-bench-")
    try:
        build_bm25_index(_docs(sf_dir, cols=("doc_id", "text")), idx)
        return len(bm25_index_query(idx))
    finally:
        shutil.rmtree(idx, ignore_errors=True)


BENCHES.update({"bm25_index": bench_bm25_index})


def bench_text_knn(sf_dir: str):
    """Fused embed + brute-force cosine top-k over raw text: one
    streaming corpus pass, zero shuffles, zero fit passes."""
    from .embed import text_knn

    return len(text_knn(_docs(sf_dir, cols=("doc_id", "text"))))


BENCHES.update({"text_knn": bench_text_knn})


def bench_text_knn_indexed(sf_dir: str):
    """The indexed text tier built FRESH (embed -> IVF-PQ build ->
    pruned query) — the amortizable cost; per-batch query cost after
    the build is the ivfpq_index story."""
    import shutil
    import tempfile

    from .annindex import build_ivfpq_index, knn_ivfpq_query
    from .embed import embed_docs, hash_embed

    ds = _docs(sf_dir, cols=("doc_id", "text"))
    emb = embed_docs(ds).map_batches(
        lambda t: t.rename_columns(["vec_id", "embedding"]),
        batch_format="pyarrow")
    idx = tempfile.mkdtemp(prefix="tknnidx-")
    try:
        build_ivfpq_index(emb, idx)
        from .embed import TEXT_KNN_QUERIES
        Q = hash_embed(list(TEXT_KNN_QUERIES)).astype("float64")
        return len(knn_ivfpq_query(idx, k=5, Q=Q))
    finally:
        shutil.rmtree(idx, ignore_errors=True)


BENCHES.update({"text_knn_indexed": bench_text_knn_indexed})


def bench_bigram_pmi(sf_dir: str):
    """Collocation mining: bucketed-exact bigram/unigram counts, PMI
    on the candidate-sized driver table."""
    from .ngrams import bigram_pmi

    return len(bigram_pmi(_docs(sf_dir, cols=("doc_id", "text"))))


BENCHES.update({"bigram_pmi": bench_bigram_pmi})


def bench_corpus_drift(sf_dir: str):
    """Word-distribution JSD between md5-split corpus halves: one
    count-partial pass + bucketed per-word reduce to B partial rows."""
    from .drift import corpus_drift

    return len(corpus_drift(_docs(sf_dir, cols=("doc_id", "text"))))


BENCHES.update({"corpus_drift": bench_corpus_drift})
