"""Driver contract for the graft builder (Ray Data target).

The driver calls ray.init() itself before importing this module: nothing
here (or in go_fluentd_ray) calls ray.init()/ray.shutdown().

Primary input per BASELINE.json input_hint: a transcripts Parquet table
(conv_id, turn_idx, role, text, tool, ts). The testdata dirs don't ship
one, so it is synthesized deterministically (seeded, cached in /tmp —
go_fluentd_ray/synth.py) at a size matching the sf of the given dir;
the oracle SQL reads the same /tmp parquet via read_parquet(path).
Queries over the provided testdata tables (documents/embeddings/events)
use the driver's pre-registered views directly.
"""

from __future__ import annotations

import os
from collections.abc import Callable
from typing import Any

SF001 = "/root/testdata/sf0.01"


def _read_corpus(sf_dir: str):
    """Sized read of the transcript corpus (the flagship read rule:
    ~32 MB blocks; Ray's default split yields one tiny block per file
    and the per-block overhead then dominates every downstream
    exchange — measured 16x on the conv-bucket shuffle at 10M turns)."""
    from go_fluentd_ray.pipelines import flagship

    return flagship.read_transcripts(_corpus(sf_dir))


def _corpus(sf_dir: str) -> str:
    from go_fluentd_ray import synth

    return synth.ensure_corpus(synth.turns_for_sf_dir(sf_dir))


def entry() -> Any:
    """Flagship pipeline over sf0.001 (smoke check)."""
    from go_fluentd_ray.pipelines import flagship

    ds = flagship.read_transcripts(_corpus("/root/testdata/sf0.001"))
    pipe = flagship.build_pipeline(ds, num_buckets=16, finisher_concurrency=2)
    return pipe.drop_columns(["merged_turns", "extra"])


# ---------------------------------------------------------------------------


def _q_flagship(sf_dir: str):
    from go_fluentd_ray.pipelines import flagship

    ds = flagship.read_transcripts(_corpus(sf_dir))
    pipe = flagship.build_pipeline(ds)
    return pipe.drop_columns(["merged_turns", "extra"])


def _skewed_corpus(sf_dir: str) -> str:
    from go_fluentd_ray import synth

    return synth.ensure_skewed_corpus(synth.turns_for_sf_dir(sf_dir),
                                      hot_frac=0.2)


def _q_flagship_skewed(sf_dir: str):
    """Flagship over the pathological-skew corpus (ONE conv_id holds
    20% of all turns, co-located in one concat bucket) — driver-visible
    evidence that the hot-key path stays oracle-exact, not just fast
    (tools/skew_bench.py measures the cost side)."""
    from go_fluentd_ray.pipelines import flagship

    ds = flagship.read_transcripts(_skewed_corpus(sf_dir))
    pipe = flagship.build_pipeline(ds)
    return pipe.drop_columns(["merged_turns", "extra"])


def _q_flagship_salted(sf_dir: str):
    """Same pathological-skew corpus through the head-boundary-salted
    pipeline (stages/saltconcat.py): the hot conversation is split at
    head rows across many buckets — the escalation for a conversation
    exceeding one worker's memory — and the output must stay EXACTLY
    the unsalted oracle's (same SQL twin as flagship_skewed). A small
    target_rows_per_salt forces real splitting at sf0.01 scale."""
    from go_fluentd_ray.stages import saltconcat

    pipe = saltconcat.build_pipeline_salted(
        _skewed_corpus(sf_dir), hot_frac=0.05, target_rows_per_salt=1500)
    return pipe.drop_columns(["merged_turns", "extra"])


def _q_flagship_json_extra(sf_dir: str):
    """The parse stage's arbitrary-key embedded-JSON flatten (extra
    map column), exploded to one row per flattened key/value."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from go_fluentd_ray.pipelines import flagship

    ds = flagship.read_transcripts(_corpus(sf_dir))
    pipe = flagship.build_pipeline(ds)

    def explode(batch: pa.Table) -> pa.Table:
        m = batch["extra"].combine_chunks()
        # list_value_length lacks a map kernel -> lengths from offsets
        # (null rows advance 0, so they repeat 0 times); .keys/.items
        # ignore slicing, so slice them to the offset window explicitly
        off = m.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        lens = np.diff(off)
        lo, hi = int(off[0]), int(off[-1])
        conv = batch["conv_id"].to_numpy(zero_copy_only=False)
        turn = batch["turn_idx"].to_numpy(zero_copy_only=False)
        return pa.table({
            "conv_id": pa.array(np.repeat(conv, lens), type=pa.string()),
            "turn_idx": pa.array(np.repeat(turn, lens), type=pa.int32()),
            "k": m.keys.slice(lo, hi - lo),
            "v": m.items.slice(lo, hi - lo),
        })

    return pipe.select_columns(["conv_id", "turn_idx", "extra"]).map_batches(
        explode, batch_format="pyarrow", zero_copy_batch=True)


def _bigdata_cfg():
    """Config variant with the CustomBigDataFilter rowkey semantic
    (postfilters/custom_bigdata.go:60-70): rowkey = <field> + '_' +
    unix(row's @timestamp) via the %{@unixof:col} enrich token."""
    import dataclasses

    from go_fluentd_ray.config import DEFAULT_CONFIG, AddOp

    adds = dict(DEFAULT_CONFIG.adds)
    adds["app.spring.sit"] = (
        AddOp("datasource", "spring"),
        AddOp("rowkey", "%{app}_%{@unixof:@timestamp}"),
        AddOp("level_lower", "%{@lower:level}"),
    )
    return dataclasses.replace(DEFAULT_CONFIG, adds=adds)


def _q_flagship_bigdata_rowkey(sf_dir: str):
    from go_fluentd_ray.pipelines import flagship

    ds = flagship.read_transcripts(_corpus(sf_dir))
    pipe = flagship.build_pipeline(ds, _bigdata_cfg())
    return pipe.select_columns(["conv_id", "turn_idx", "tag", "rowkey"])


def _q_acceptor_counts(sf_dir: str):
    from ray.data.aggregate import Count

    from go_fluentd_ray.config import DEFAULT_CONFIG
    from go_fluentd_ray.stages.acceptor import acceptor_transform

    ds = _read_corpus(sf_dir)
    ds = ds.map_batches(lambda t: acceptor_transform(t, DEFAULT_CONFIG),
                        batch_format="pyarrow", zero_copy_batch=True)
    return ds.groupby("tag").aggregate(Count(alias_name="n"))


def _q_concat_segments(sf_dir: str):
    from go_fluentd_ray.config import DEFAULT_CONFIG
    from go_fluentd_ray.pipelines import flagship
    from go_fluentd_ray.stages.acceptor import acceptor_transform
    from go_fluentd_ray.stages.concat import add_bucket, concat_bucket

    cfg = DEFAULT_CONFIG
    ds = _read_corpus(sf_dir)
    ds = ds.map_batches(lambda t: acceptor_transform(t, cfg),
                        batch_format="pyarrow", zero_copy_batch=True)
    ds = ds.map_batches(lambda t: add_bucket(t, flagship.default_num_buckets()),
                        batch_format="pyarrow", zero_copy_batch=True)
    ds = ds.groupby("bucket").map_groups(
        lambda df: concat_bucket(df, cfg), batch_format="pandas")
    return ds.drop_columns(["merged_turns"]).select_columns(
        ["tag", "conv_id", "turn_idx", "role", "tool", "ts", "text", "n_merged"])


def _q_discard_counts(sf_dir: str):
    """Per-reason discard accounting — the reference's /monitor counter
    surface (window / spark_ignore / unknown_tag / regex_nonmatch /
    must_include / time_parse / emitted)."""
    from go_fluentd_ray.config import DEFAULT_CONFIG
    from go_fluentd_ray.pipelines import monitoring

    return monitoring.discard_counts(_read_corpus(sf_dir),
                                     DEFAULT_CONFIG)


def _q_window_filter(sf_dir: str):
    import pyarrow as pa
    import pyarrow.compute as pc
    from go_fluentd_ray.config import DEFAULT_CONFIG as cfg

    lo = pa.scalar(cfg.window_min_ts).cast(pa.timestamp("us"))
    hi = pa.scalar(cfg.window_max_ts).cast(pa.timestamp("us"))
    from go_fluentd_ray.io_util import sized_read_parquet

    ds = sized_read_parquet(_corpus(sf_dir),
                            columns=["conv_id", "turn_idx", "tool", "ts"])
    return ds.map_batches(
        lambda t: t.filter(pc.and_(pc.greater_equal(t["ts"], lo),
                                   pc.less_equal(t["ts"], hi))),
        batch_format="pyarrow", zero_copy_batch=True)


def _q_flagship_sink_counts(sf_dir: str):
    from go_fluentd_ray.pipelines import flagship

    ds = flagship.read_transcripts(_corpus(sf_dir))
    return flagship.sink_counts(flagship.build_pipeline(ds))


def _q_tool_role_sink_counts(sf_dir: str):
    from go_fluentd_ray.pipelines import flagship

    ds = flagship.read_transcripts(_corpus(sf_dir))
    return flagship.tool_role_sink_counts(flagship.build_pipeline(ds))


def _docs(sf_dir: str, cols: list[str] | None = None):
    """documents table read, column-pruned at the READ (Ray does not
    push a later Project into ReadParquet — visible in the execution
    plans — so every query passes exactly the columns it consumes;
    full-schema callers (`SELECT *` twins) pass cols=None)."""
    from go_fluentd_ray.io_util import sized_read_parquet

    return sized_read_parquet(f"{sf_dir}/documents.parquet", columns=cols)


def _docs_text(sf_dir: str):
    """The dominant projection: (doc_id, text) — what the dedup /
    quality / tokenize families consume. The fixture table also
    carries lang/source/n_chars; at 100 TB that is IO paid for
    nothing on every read."""
    return _docs(sf_dir, ["doc_id", "text"])


def _q_bpe_token_count(sf_dir: str):
    from go_fluentd_ray.functions import text as T

    return _docs_text(sf_dir).map_batches(
        T.bpe_token_count_batch, batch_format="pyarrow",
        zero_copy_batch=True).select_columns(["doc_id", "n_bpe_tokens"])


def _q_bpe_merges(sf_dir: str):
    """Distributed BPE tokenizer TRAINING (Sennrich 2016): the merge
    table learned over the documents corpus — one skinny distinct-word
    shuffle, then vectorized merge iterations over the word-frequency
    table only. Rows-only (iterative argmax is not SQL-expressible);
    pinned to the published naive algorithm by pytest equality on both
    the local and the chunked-distributed path."""
    from go_fluentd_ray.functions import bpetrain

    return bpetrain.bpe_train(_docs(sf_dir, ["text"]), n_merges=120)


def _q_bpe_token_lens(sf_dir: str):
    """Per-document token count under a corpus-trained BPE vocabulary
    (the sizing pass an SFT/pretrain exporter runs before packing).
    Train once (60 merges), then a zero-shuffle map-side encode of
    distinct words per batch. Rows-only; hand-case + naive-equality
    pytests gate the kernel."""
    from go_fluentd_ray.functions import bpetrain

    merges = bpetrain.bpe_train(_docs(sf_dir, ["text"]), n_merges=60)
    return bpetrain.bpe_token_lens(_docs_text(sf_dir), merges)


def _q_token_count(sf_dir: str):
    from go_fluentd_ray.functions import text as T

    return _docs_text(sf_dir).map_batches(
        T.token_count_batch, batch_format="pyarrow",
        zero_copy_batch=True).select_columns(["doc_id", "n_tokens"])


def _q_quality(sf_dir: str):
    from go_fluentd_ray.functions import text as T

    return _docs_text(sf_dir).map_batches(
        T.quality_batch, batch_format="pyarrow", zero_copy_batch=True
    ).select_columns(["doc_id", "n_chars_f", "n_words", "punct_ratio",
                      "stop_ratio", "mean_word_len", "quality"])


def _q_tfidf_keywords(sf_dir: str):
    """Top-5 tf-idf keywords per doc: skinny df shuffle + df>=2 vocab
    broadcast + map-side scoring (the jaccard_join df pattern)."""
    from go_fluentd_ray.functions import text as T

    return T.tfidf_keywords(_docs_text(sf_dir), k=5)


def _q_quality_prune(sf_dir: str):
    """Percentile quality pruning: keep the top 20% of docs by the
    deterministic quality score — skinny-projection global sort +
    streaming limit (DCLM/FineWeb-style corpus pruning)."""
    from go_fluentd_ray.functions import text as T

    return T.quality_prune(_docs_text(sf_dir), pct=20)


def _q_lang_id(sf_dir: str):
    from go_fluentd_ray.functions import text as T

    return _docs_text(sf_dir).map_batches(
        T.LangId, batch_format="pyarrow", concurrency=2,
        zero_copy_batch=True).select_columns(["doc_id", "lang_pred"])


def _q_repetition(sf_dir: str):
    """Gopher-style duplicate-line / duplicate-word fractions."""
    from go_fluentd_ray.functions import text as T

    return _docs_text(sf_dir).map_batches(
        T.repetition_batch, batch_format="pyarrow",
        zero_copy_batch=True).select_columns(
        ["doc_id", "dup_line_frac", "dup_word_frac"])


def _q_lm_score(sf_dir: str):
    """Char-trigram LM quality scoring (perplexity-style filter).
    SQL twin rebuilds the same min-md5 reference sample and smoothed
    trigram model in CTEs (text.lm_score_sql)."""
    from go_fluentd_ray.functions import text as T

    return T.lm_score(_docs_text(sf_dir))


def _q_fingerprint(sf_dir: str):
    from go_fluentd_ray.functions import text as T

    return _docs_text(sf_dir).map_batches(
        T.fingerprint_batch, batch_format="pyarrow",
        zero_copy_batch=True).select_columns(
        ["doc_id", "n_fp", "fp_min", "fp_xor"])


def _q_dedup_exact(sf_dir: str):
    from go_fluentd_ray.functions import dedup

    return dedup.exact_dedup(_docs_text(sf_dir))


def _q_dedup_exact_rows(sf_dir: str):
    from go_fluentd_ray.functions import dedup

    return dedup.exact_dedup_rows(_docs(sf_dir))


def _q_dedup_minhash(sf_dir: str):
    from go_fluentd_ray.functions import dedup

    # min_bands=2 is the scale route (collision pre-filter; the default
    # is the exhaustive min_bands=1 — see minhash_dedup's docstring for
    # the measured ~1-2% pair-recall tradeoff this opts into)
    return dedup.minhash_dedup(_docs_text(sf_dir), min_bands=2)


def _q_dedup_jaccard(sf_dir: str):
    """EXACT n-gram Jaccard pairs via PPJoin-style prefix filtering —
    the deterministic twin of dedup_minhash_lsh (no banding
    randomness, no recall loss), same one-corpus-shuffle verify."""
    from go_fluentd_ray.functions import dedup

    return dedup.jaccard_join(_docs_text(sf_dir), threshold=0.8)


def _q_dedup_simhash(sf_dir: str):
    from go_fluentd_ray.functions import dedup

    return dedup.simhash_dedup(_docs_text(sf_dir))


def _events(sf_dir: str, cols: list[str] | None = None):
    from go_fluentd_ray.io_util import sized_read_parquet

    return sized_read_parquet(f"{sf_dir}/events.parquet", columns=cols)


def _emb(sf_dir: str):
    from go_fluentd_ray.io_util import sized_read_parquet

    return sized_read_parquet(f"{sf_dir}/embeddings.parquet")


_EMB_DUP_THR = 0.30  # testdata embeddings are random (max pairwise
# cos ~0.51); 0.30 yields a non-trivial pair set to verify against


def _q_embedding_dup(sf_dir: str):
    from go_fluentd_ray.functions import dedup

    # cos dropped from the compared output: numpy vs duckdb double
    # summation order differs by ~1 ulp, which can flip round(,4)
    return dedup.embedding_dup_exact(
        _emb(sf_dir), threshold=_EMB_DUP_THR).drop_columns(["cos"])


def _q_embedding_dup_lsh(sf_dir: str):
    from go_fluentd_ray.functions import dedup

    return dedup.embedding_dup_lsh(_emb(sf_dir), threshold=_EMB_DUP_THR)


def _q_embedding_dedup_rows(sf_dir: str):
    """Near-dup dedup to ROWS over the embedding-cosine pair graph:
    connected components (iterative bucketed min-label propagation),
    keep the min vec_id per component, bucketed anti-join filter."""
    from go_fluentd_ray.functions import dedup
    from go_fluentd_ray.functions.components import dedup_rows_by_components

    emb = _emb(sf_dir)
    pairs = dedup.embedding_dup_exact(emb, threshold=_EMB_DUP_THR)
    out = dedup_rows_by_components(emb, pairs, "vec_id")
    return out.select_columns(["vec_id", "label"])


def _q_semantic_dedup(sf_dir: str):
    """SemDeDup: k-means cells + within-cell cosine dedup. Rows-only
    (k-means assignment is not SQL-expressible); the exact-oracle twin
    of the same keep-min-per-component semantics is
    embedding_dedup_rows."""
    from go_fluentd_ray.functions import semdedup

    return semdedup.semantic_dedup(
        _emb(sf_dir), threshold=_EMB_DUP_THR).select_columns(
        ["vec_id", "label"])


def _q_near_dedup_rows(sf_dir: str):
    """Same component machinery over the MinHash-LSH verified pair
    graph on documents; SQL twin = the exact minhash pair CTE +
    recursive-CTE component closure."""
    from go_fluentd_ray.functions import dedup
    from go_fluentd_ray.functions.components import dedup_rows_by_components

    docs = _docs_text(sf_dir)
    pairs = dedup.minhash_dedup(docs, threshold=0.7, min_bands=2)
    out = dedup_rows_by_components(docs, pairs, "doc_id")
    return out.select_columns(["doc_id"])


def _q_dedup_keep_best(sf_dir: str):
    """Near-dup dedup keeping the HIGHEST-QUALITY doc per cluster
    (the RefinedWeb/FineWeb curation rule) instead of the min id:
    minhash pairs -> components -> argmax quality per component ->
    anti-join. SQL twin = exact minhash CTE + recursive closure +
    QUALIFY argmax."""
    from go_fluentd_ray.functions import dedup

    return dedup.minhash_dedup_keep_best(
        _docs_text(sf_dir), threshold=0.7,
        min_bands=2).select_columns(["doc_id"])


def _q_dedup_incremental(sf_dir: str):
    """Cross-corpus incremental dedup: the new shard (md5(doc_id)%100
    >= 80) minus exact-hash and verified-minhash matches against the
    already-ingested 80%. Full-schema output (SELECT * twin)."""
    from go_fluentd_ray.functions import dedup

    return dedup.incremental_dedup(_docs(sf_dir), seen_pct=80,
                                   threshold=0.7, min_bands=2)


def _q_knn(sf_dir: str):
    from go_fluentd_ray.functions import similarity

    # sim values dropped from the compared output (duckdb computes
    # list_cosine_similarity in float32; round(,4) can flip) — the
    # ranking itself is stable because sim gaps >> float error
    return similarity.knn_bruteforce(_emb(sf_dir))[["qid", "rank", "vec_id"]]


def _q_knn_ivf(sf_dir: str):
    from go_fluentd_ray.functions import similarity

    return similarity.knn_ivf(_emb(sf_dir))


def _q_knn_ivf_recall(sf_dir: str):
    """recall@k of IVF vs brute force per query (+ overall mean row,
    qid=-1). Rows-only: the approximate path's quality gate, made
    driver-visible so IVF regressions surface in the oracle harness."""
    from go_fluentd_ray.functions import similarity

    return similarity.knn_ivf_recall(_emb(sf_dir))


def _q_knn_pq(sf_dir: str):
    """Product-quantization ANN (ADC scan over m-byte codes + exact
    re-rank of a tiny shortlist) — the compressed-index scale path.
    Rows-only (codebook k-means not SQL); gated by knn_pq_recall."""
    from go_fluentd_ray.functions import similarity

    return similarity.knn_pq(_emb(sf_dir))


def _q_knn_pq_recall(sf_dir: str):
    """recall@k of PQ+re-rank vs exact brute force per query (+ overall
    mean row, qid=-1) — the knn_ivf_recall pattern."""
    from go_fluentd_ray.functions import similarity

    return similarity.knn_pq_recall(_emb(sf_dir))


def _q_knn_ivfpq(sf_dir: str):
    """IVF-ADC (Jégou et al. 2011 §V): coarse cells restrict each
    query's scan to nprobe cells AND the scanned rows are m-byte PQ
    residual codes — the memory-and-compute composition of knn_ivf and
    knn_pq, with the same exact re-rank. Rows-only (k-means not SQL);
    gated by knn_ivfpq_recall."""
    from go_fluentd_ray.functions import similarity

    return similarity.knn_ivfpq(_emb(sf_dir))


def _q_knn_ivfpq_recall(sf_dir: str):
    """recall@k of IVF-ADC vs exact brute force per query (+ overall
    mean row, qid=-1) — the knn_ivf_recall pattern."""
    from go_fluentd_ray.functions import similarity

    return similarity.knn_ivfpq_recall(_emb(sf_dir))


def _q_knn_ivfpq_indexed(sf_dir: str):
    """The build/query split of IVF-ADC: the compressed index
    (vec_id, cell, PQ residual codes — 20 bytes/row) persists as
    cell-sorted hive-sharded parquet and queries read ONLY the probed
    shards (build-once cached under /tmp). This is the production
    shape: build amortizes over every query batch. Rows-only; gated by
    knn_ivfpq_indexed_recall."""
    from go_fluentd_ray.functions import annindex

    return annindex.knn_ivfpq_indexed(sf_dir, _emb(sf_dir))


def _q_knn_ivfpq_indexed_recall(sf_dir: str):
    """recall@k of the persisted-index query path vs exact brute
    force per query (+ overall mean row, qid=-1)."""
    from go_fluentd_ray.functions import annindex

    return annindex.knn_ivfpq_indexed_recall(sf_dir, _emb(sf_dir))


def _q_semantic_dedup_recall(sf_dir: str):
    """Pair-set recall of SemDeDup's clustered dup finder vs the exact
    all-pairs path (one summary row). Rows-only: the gate that makes a
    centroid/recall regression driver-visible (the knn_ivf_recall
    pattern applied to semantic_dedup)."""
    from go_fluentd_ray.functions import semdedup

    return semdedup.semantic_dedup_recall(_emb(sf_dir),
                                          threshold=_EMB_DUP_THR)


def _q_events_hourly(sf_dir: str):
    from go_fluentd_ray.functions import events

    return events.events_hourly(_events(sf_dir, ["ts", "event_type", "value", "props"]))


def _q_events_sliding(sf_dir: str):
    from go_fluentd_ray.functions import events

    # sliding_3h builds on events_hourly, which also sums value/props
    return events.sliding_3h(
        _events(sf_dir, ["ts", "event_type", "value", "props"]))


def _q_running_totals(sf_dir: str):
    from go_fluentd_ray.functions import events

    return events.running_totals(_events(sf_dir, ["event_id", "ts", "user_id", "value"]))


def _q_sessionize(sf_dir: str):
    from go_fluentd_ray.functions import events

    return events.sessionize(_events(sf_dir, ["event_id", "ts", "user_id"]))


def _q_multimodal_meta(sf_dir: str):
    from go_fluentd_ray.functions import multimodal

    return multimodal.multimodal_meta(_docs_text(sf_dir))


def _http_n(sf_dir: str) -> int:
    from go_fluentd_ray import synth

    return max(500, synth.turns_for_sf_dir(sf_dir) // 10)


def _q_conversation_stats(sf_dir: str):
    """Per-conversation stats + quality gate over the transcript
    corpus (the transcript-native Gopher analogue): one skinny
    bucketed exchange keyed hash(conv_id) — text never moves, dup
    detection rides an 8-byte text hash."""
    from go_fluentd_ray.functions import convstats

    return convstats.conversation_stats(_read_corpus(sf_dir))


def _q_conversation_dedup(sf_dir: str):
    """Exact-duplicate CONVERSATION detection: signature = md5 over the
    turn-ordered per-turn md5 digests; keep min conv_id per signature
    with its copy count. Two skinny exchanges, text never moves."""
    from go_fluentd_ray.functions import convstats

    return convstats.conversation_dedup(_read_corpus(sf_dir))


def _q_tool_latency(sf_dir: str):
    """Per-tool call→observation latency over the transcript corpus:
    earliest following role='tool' turn per call turn, one skinny
    bucketed exchange keyed hash(conv_id) — text never moves; integer
    microsecond sums keep the mean bit-comparable with SQL."""
    from go_fluentd_ray.functions import turnflow

    return turnflow.tool_latency(_read_corpus(sf_dir))


def _q_role_transitions(sf_dir: str):
    """Corpus-wide consecutive (from_role → to_role) turn-pair counts —
    the dialogue-structure Markov table. Per-bucket cython shift +
    count partials, final groupby moves B × |roles|² rows."""
    from go_fluentd_ray.functions import turnflow

    return turnflow.role_transitions(_read_corpus(sf_dir))


def _q_context_truncate(sf_dir: str):
    """Context-window trim: per conversation the maximal turn SUFFIX
    whose \\w+ token total fits the budget (most recent turns win).
    Only (conv_id, turn_idx, n_tokens) crosses the exchange."""
    from go_fluentd_ray.functions import turnflow

    return turnflow.context_truncate(_read_corpus(sf_dir))


def _q_sft_examples(sf_dir: str):
    """SFT pair extraction: for every assistant turn, context = the
    last 8 preceding turns rendered 'role: text' joined by newlines,
    response = the turn text. One hash(conv_id) bucketed exchange;
    the context fold is 8 vectorized group-shift concats per bucket."""
    from go_fluentd_ray.functions import convmine

    return convmine.sft_examples(_read_corpus(sf_dir))


def _q_loop_detect(sf_dir: str):
    """Agent-loop smell per conversation: longest run of consecutive
    identical (role, text) turns via vectorized gaps-and-islands.
    Only md5 digests cross the exchange — text never moves."""
    from go_fluentd_ray.functions import convmine

    return convmine.loop_detect(_read_corpus(sf_dir))


def _q_prefix_forks(sf_dir: str):
    """Shared-prefix fork mining: conversations with an identical
    first-2-turn digest prefix but divergent full signatures — the
    preference-pair candidate generator. Two skinny digest exchanges."""
    from go_fluentd_ray.functions import convmine

    return convmine.prefix_forks(_read_corpus(sf_dir))


def _q_preference_pairs(sf_dir: str):
    """DPO/RLHF candidate pairs from prefix forks: one representative
    per distinct continuation, all rep pairs with their first point
    of divergence and both diverging turn texts. Four exchanges — all
    skinny except the single corpus pass; the pair compute touches
    only the fork subset."""
    from go_fluentd_ray.functions import convmine

    return convmine.preference_pairs(_read_corpus(sf_dir))


def _q_daily_role_stats(sf_dir: str):
    """Per (UTC day, role) time-series rollup: turn count, distinct
    conversations, total/mean chars. Map-side partials; the
    conv-distinct rides the hash(conv_id) exchange (distinct_users
    two-level pattern)."""
    from go_fluentd_ray.functions import logops

    return logops.daily_role_stats(_read_corpus(sf_dir))


def _q_conversation_sessions(sf_dir: str):
    """Gap-based session segmentation WITHIN conversations (the
    transcript twin of the events sessionizer): one skinny bucketed
    exchange keyed hash(conv_id); text never moves."""
    from go_fluentd_ray.functions import convstats

    return convstats.conversation_sessions(_read_corpus(sf_dir))


def _q_pack_conversations(sf_dir: str):
    """Greedy packing of WHOLE conversations into token-budget
    training bins (the conversation-granularity twin of
    pack_sequences): one skinny per-conversation token-count exchange
    keyed md5(conv_id) % B; text never moves."""
    from go_fluentd_ray.functions import convmine

    return convmine.pack_conversations(_read_corpus(sf_dir))


def _q_collapse_repeats(sf_dir: str):
    """rsyslog's 'last message repeated N times' as a batch transform:
    collapse each run of consecutive identical (role, text) turns to
    its first turn + count. One hash(conv_id) exchange."""
    from go_fluentd_ray.functions import logops

    return logops.collapse_repeats(_read_corpus(sf_dir))


def _q_tool_errors(sf_dir: str):
    """Per-tool error rate over observation turns (RE2 error-pattern
    match): pure map-side count partials, one tiny final groupby —
    only (tool, 2 ints) ever moves."""
    from go_fluentd_ray.functions import logops

    return logops.tool_errors(_read_corpus(sf_dir))


def _q_rate_anomaly(sf_dir: str):
    """Per-tag event-rate anomaly detection: z-score of each observed
    (tag, minute-window) count vs the 12 preceding observed windows.
    Integer trailing sums + one fixed float64 op order — the z values
    are bit-identical with SQL, not approximately equal."""
    from go_fluentd_ray.functions import logops

    return logops.rate_anomaly(_read_corpus(sf_dir))


def _q_sft_pipeline(sf_dir: str):
    """COMPOSED transcript → SFT-dataset pipeline: conversation
    quality gate ∧ loop gate → exact conversation dedup among
    survivors → SFT pair extraction → md5(conv_id) split. Three
    exchanges total; text crosses the wire exactly once."""
    from go_fluentd_ray.pipelines import sftbuild

    return sftbuild.sft_pipeline(_read_corpus(sf_dir))


def _q_log_templates(sf_dir: str):
    """Drain-style log-template mining: mask digit runs to <N>, exact
    corpus-wide top-k (the word_topk bucketed pattern — the driver
    only ever sees B×k partial rows, never the distinct-template
    table)."""
    from go_fluentd_ray.functions import logops

    return logops.log_templates(_read_corpus(sf_dir))


def _q_throttle_tags(sf_dir: str):
    """The reference Pipeline throttle (SURVEY §2.2) as a
    DETERMINISTIC operator: per (tag, tumbling window) admit the
    earliest N turns under the (ts, conv_id, turn_idx) total order.
    Skinny projection keyed hash(tag, window)."""
    from go_fluentd_ray.functions import logops

    return logops.throttle_tags(_read_corpus(sf_dir))


def _q_tool_latency_pct(sf_dir: str):
    """Exact per-tool p50/p95/p99 call→observation latency
    (quantile_disc semantics, integer microseconds end to end). Two
    skinny exchanges: pairing in hash(conv_id) buckets, percentiles
    in hash(tool) buckets."""
    from go_fluentd_ray.functions import logops

    return logops.tool_latency_pct(_read_corpus(sf_dir))


def _q_range_join(sf_dir: str):
    """Distributed range (interval) join — the non-equi join the
    Dataset API lacks natively: per purchase event, the count of
    signup events within ±1 h, via time-bucket co-partitioning with
    ±1-bucket replication of the skinny right side."""
    from go_fluentd_ray.functions import rangejoin

    return rangejoin.range_join_counts(
        _events(sf_dir, ["event_id", "ts", "event_type"]))


def _q_asof(sf_dir: str):
    from go_fluentd_ray.functions import joins

    return joins.asof_signup_lag(_events(sf_dir, ["event_id", "ts", "user_id", "event_type"]))


def _q_dim_join(sf_dir: str):
    import pyarrow.parquet as pq
    from go_fluentd_ray.functions import joins

    dim = pq.read_table(f"{sf_dir}/customer.parquet",
                        columns=["c_custkey", "c_name"]).to_pandas()
    out = joins.broadcast_dim_join(
        _events(sf_dir, ["event_id", "user_id", "event_type"]), dim)
    return out.select_columns(["event_id", "user_id", "event_type", "c_name"])


def _q_order_revenue_topn(sf_dir: str):
    """TPC-H-Q3-shaped top-10 revenue orders: the large-large equi-join
    shape — native hash Dataset.join (left_semi for the customer
    segment filter, inner for lineitem⋈orders), lineitem pre-aggregated
    to per-order revenue BEFORE the join, local+final top-N instead of
    a full sort."""
    from go_fluentd_ray.functions import joins
    from go_fluentd_ray.io_util import sized_read_parquet

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
    from go_fluentd_ray.io_util import _path_bytes

    return joins.order_revenue_topn(
        li, orders, cust,
        approx_bytes=_path_bytes(f"{sf_dir}/lineitem.parquet"))


def _q_customers_without_orders(sf_dir: str):
    """Distributed anti-join (native hash left_anti): customers with no
    orders, counted per market segment. The orders side is pruned to
    its key column at the read."""
    from go_fluentd_ray.functions import joins
    from go_fluentd_ray.io_util import sized_read_parquet

    cust = sized_read_parquet(f"{sf_dir}/customer.parquet",
                              columns=["c_custkey", "c_mktsegment"])
    orders = sized_read_parquet(f"{sf_dir}/orders.parquet",
                                columns=["o_custkey", "o_orderdate"])
    from go_fluentd_ray.io_util import _path_bytes

    return joins.customers_without_orders(
        cust, orders,
        approx_bytes=_path_bytes(f"{sf_dir}/orders.parquet"))


def _q_corpus_stats(sf_dir: str):
    """Corpus profiling report per (source, lang): docs, char/word
    totals, mean quality — partial-aggregate combiner + tiny groupby."""
    from go_fluentd_ray.functions import aggregates

    return aggregates.corpus_stats(_docs(sf_dir, ["text", "source", "lang"]))


def _q_pricing_summary(sf_dir: str):
    import ray.data as rd

    from go_fluentd_ray.functions import aggregates

    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity",
                 "l_extendedprice", "l_discount", "l_shipdate"])
    return aggregates.pricing_summary(ds)


def _q_http_pipeline(sf_dir: str):
    import ray.data as rd

    from go_fluentd_ray import synth
    from go_fluentd_ray.pipelines import http_pipeline

    path = synth.ensure_http_corpus(_http_n(sf_dir))
    return http_pipeline.build(rd.read_json(path))


def _q_clean_redact(sf_dir: str):
    """Text cleaning / PII redaction (control-char strip, email/IPv4
    redaction, whitespace collapse) — pure RE2 kernel chain, exactly
    mirrored in SQL."""
    from go_fluentd_ray.functions import textclean

    return textclean.clean_redact(_docs_text(sf_dir)).select_columns(
        ["doc_id", "clean_text", "n_emails", "n_ips"])


def _q_line_dedup(sf_dir: str):
    """Corpus-level repeated-line removal (C4/CCNet boilerplate pass):
    bucketed exact line counts -> one small broadcast -> vectorized
    map-side line filter + reassembly. Runs over the deterministic
    multiline synthetic corpus (the testdata documents are single-line);
    the SQL twin reads the same parquet."""
    from go_fluentd_ray import synth
    from go_fluentd_ray.functions import linededup
    from go_fluentd_ray.io_util import sized_read_parquet

    path = synth.ensure_multiline_docs(synth.docs_for_sf_dir(sf_dir))
    return linededup.line_dedup(sized_read_parquet(path)).select_columns(
        ["doc_id", "clean_text", "n_removed"])


def _q_dedup_lines_within(sf_dir: str):
    """INTRA-document exact line dedup (the within-page half of the C4
    line pass; `line_dedup` is the cross-corpus half): keep only the
    first occurrence of each line inside a document. Pure map-side —
    zero shuffles. Runs over the deterministic multiline corpus."""
    from go_fluentd_ray import synth
    from go_fluentd_ray.functions import linededup
    from go_fluentd_ray.io_util import sized_read_parquet

    path = synth.ensure_multiline_docs(synth.docs_for_sf_dir(sf_dir))
    return linededup.dedup_lines_within_doc(
        sized_read_parquet(path)).select_columns(
        ["doc_id", "dedup_text", "n_dup_lines"])


def _q_dsir_scores(sf_dir: str):
    """DSIR importance-resampling scores (Xie et al. 2023): per-doc
    log p_target/p_raw under hashed unigram+bigram multinomials. The
    target stand-in is the deterministic 2% hash sample; model fits
    move only skinny (bucket, count) partials, scoring is map-side."""
    from go_fluentd_ray.functions import dsir

    return dsir.dsir_scores(_docs_text(sf_dir)).select_columns(
        ["doc_id", "dsir_logratio"])


def _q_gopher_quality(sf_dir: str):
    """Full Gopher §A1.1 per-document quality-signal suite (word stats,
    line repetition, top/duplicated n-gram character fractions with
    coverage semantics, and the combined pass flag) — pure map-side,
    zero shuffles. Runs over the deterministic multiline corpus so the
    line signals are exercised; the SQL twin reads the same parquet."""
    from go_fluentd_ray import synth
    from go_fluentd_ray.functions import gopherquality
    from go_fluentd_ray.io_util import sized_read_parquet

    path = synth.ensure_multiline_docs(synth.docs_for_sf_dir(sf_dir))
    return gopherquality.gopher_signals(sized_read_parquet(path))


def _q_split_assign(sf_dir: str):
    """Deterministic train/val/test split assignment keyed on
    md5(doc_id) — resume-stable, order-free, cluster-size-free."""
    from go_fluentd_ray.functions import sampling

    return sampling.split_assign(_docs(sf_dir, ["doc_id"])).select_columns(
        ["doc_id", "split"])


def _q_dedup_spans(sf_dir: str):
    """Exact duplicated n-gram SPAN removal (ExactSubstr, Lee et al.
    2022): corpus-global span counts via the skinny bucketed-partials
    shuffle, one broadcast, vectorized map-side coverage removal."""
    from go_fluentd_ray.functions import spandedup

    return spandedup.span_dedup(_docs_text(sf_dir)).select_columns(
        ["doc_id", "clean_text", "n_removed_tokens"])


def _q_bm25_topk(sf_dir: str):
    """BM25 lexical top-k retrieval (the keyword twin of knn_*): one
    skinny stats pre-pass restricted to the query vocabulary, then
    map-side scoring with per-batch top-k partials."""
    from go_fluentd_ray.functions import bm25

    return bm25.bm25_topk(_docs_text(sf_dir))


def _q_corpus_drift(sf_dir: str):
    """Drift report between two corpus halves (md5 split): word-level
    Jensen-Shannon divergence + per-side mass/vocab counters; the
    vocabulary never leaves the cluster (per-bucket JSD partials)."""
    from go_fluentd_ray.functions import drift

    return drift.corpus_drift(_docs(sf_dir, cols=["doc_id", "text"]))


def _q_drift_topk(sf_dir: str):
    """Which words drifted: top-k by absolute probability shift
    between the two md5-split halves; per-bucket local top-k under
    the global order, driver merges B*k rows."""
    from go_fluentd_ray.functions import drift

    return drift.drift_topk(_docs(sf_dir, cols=["doc_id", "text"]))


def _q_bigram_pmi(sf_dir: str):
    """Collocation mining: top-k adjacent word pairs by PMI with
    min-count support — the word_topk bucketed-exact pattern over
    (key, kind, n) count partials; the driver sees candidates + two
    total rows, never the vocabulary."""
    from go_fluentd_ray.functions import ngrams

    return ngrams.bigram_pmi(_docs_text(sf_dir))


def _q_bm25_indexed(sf_dir: str):
    """BM25 over a PERSISTED inverted index (build-once hive-sharded
    postings, dir-pruned query reads) — value-identical to bm25_topk
    and checked against the same SQL twin."""
    from go_fluentd_ray.functions import bm25index

    return bm25index.bm25_indexed(sf_dir, _docs_text(sf_dir))


def _q_embed_docs(sf_dir: str):
    """Feature-hash text embeddings (signed hashing trick): model-free
    unit vectors from raw text, pure map-side. Rows-only (the vector
    construction is not SQL-expressible); pytest gates determinism,
    unit norm, and near-dup-ranks-first."""
    from go_fluentd_ray.functions import embed

    return embed.embed_docs(_docs_text(sf_dir))


def _q_text_knn(sf_dir: str):
    """Similarity search over RAW TEXT without an embedding column:
    embed + brute-force cosine + local top-k fused into one corpus
    pass (zero shuffles, zero fit passes)."""
    from go_fluentd_ray.functions import embed

    return embed.text_knn(_docs_text(sf_dir))


def _q_text_knn_indexed(sf_dir: str):
    """Indexed tier of text_knn: embed_docs -> persisted IVF-PQ index
    (build-once cache) -> pruned ADC query with hash-embedded query
    strings. Rows-only; gated by text_knn_indexed_recall and the
    golden anchor."""
    from go_fluentd_ray.functions import embed

    return embed.text_knn_indexed(sf_dir, _docs_text(sf_dir))


def _q_text_knn_indexed_recall(sf_dir: str):
    """recall@k of the indexed text-kNN tier vs the fused brute-force
    scan (>= 0.9 pytest gate)."""
    from go_fluentd_ray.functions import embed

    return embed.text_knn_indexed_recall(sf_dir, _docs_text(sf_dir))


def _q_badwords_filter(sf_dir: str):
    """C4-style blocklist document filter: token-level case-insensitive
    membership, pure map-side."""
    from go_fluentd_ray.functions import textclean

    return textclean.badwords_filter(_docs(sf_dir))


def _q_curation_pipeline(sf_dir: str):
    """COMPOSED curation: clean/redact -> token count -> quality gate
    -> exact dedup rows, value-checked end to end by a CTE-chained SQL
    twin (the composition itself is the thing under test)."""
    from go_fluentd_ray.pipelines import curation

    return curation.curation_pipeline(_docs_text(sf_dir))


def _q_pretrain_pipeline(sf_dir: str):
    """SECOND composed curation pipeline over the corpus-global passes:
    blocklist filter -> exact span dedup (counts on the filtered
    corpus) -> token-count gate -> deterministic split assignment,
    value-checked end to end by a CTE-chained SQL twin."""
    from go_fluentd_ray.pipelines import curation

    return curation.pretrain_pipeline(_docs_text(sf_dir))


def _q_leakage_audit(sf_dir: str):
    """Split-leakage audit: distinct word 3-grams shared between every
    pair of train/val/test splits. Only deduplicated (gram, split)
    partials shuffle; output is 3 rows at any corpus scale."""
    from go_fluentd_ray.functions import leakage

    return leakage.leakage_audit(_docs_text(sf_dir))


def _q_selection_pipeline(sf_dir: str):
    """THIRD composed pipeline — target-conditioned data selection:
    blocklist filter -> DSIR scores (models fit on the FILTERED
    corpus) -> exact top-p% by score -> split assignment."""
    from go_fluentd_ray.pipelines import curation

    return curation.selection_pipeline(_docs_text(sf_dir))


def _q_decontaminate(sf_dir: str):
    """Drop training docs sharing any word 3-gram with the benchmark
    side (here: the deterministic 2% hash sample standing in for an
    eval suite; the operator takes any Dataset as the benchmark)."""
    from go_fluentd_ray.functions import decontam, sampling

    docs = _docs(sf_dir)  # full schema: surviving rows keep SELECT *
    bench = sampling.hash_sample(_docs_text(sf_dir), 2)
    return decontam.decontaminate(docs, bench, n=3)


def _q_semantic_decontaminate(sf_dir: str):
    """Embedding-space decontamination: drop corpus vectors whose
    cosine to ANY benchmark vector >= threshold — the paraphrase-level
    leakage n-gram decontamination misses. Benchmark side here: the
    deterministic vec_id % 17 == 0 split (standing in for an eval
    suite; the operator takes any Dataset as the benchmark)."""
    from go_fluentd_ray.functions import decontam

    emb = _emb(sf_dir)

    def split(is_bench: bool):
        def fn(b):
            import numpy as np
            import pyarrow as pa
            m = b["vec_id"].to_numpy() % 17 == 0
            return b.filter(pa.array(m if is_bench else ~m))
        return fn

    bench = emb.map_batches(split(True), batch_format="pyarrow",
                            zero_copy_batch=True)
    corpus = emb.map_batches(split(False), batch_format="pyarrow",
                             zero_copy_batch=True)
    return decontam.semantic_decontaminate(
        corpus, bench, threshold=_EMB_DUP_THR,
        keep_cols=["vec_id", "label"])


_MIX_RATES = {"en": 100, "de": 60, "fr": 40, "es": 30, "zh": 20}


def _q_domain_mix_sample(sf_dir: str):
    """Per-language mixing weights (Pile/Gopher-style corpus reweight),
    deterministic md5 Bernoulli per row."""
    from go_fluentd_ray.functions import sampling

    return sampling.domain_mix_sample(_docs(sf_dir), _MIX_RATES)


def _q_shuffle_shards(sf_dir: str):
    """Deterministic global training shuffle -> (shard, pos) layout."""
    from go_fluentd_ray.functions import sampling

    return sampling.shuffle_shards(_docs(sf_dir, ["doc_id"]), num_shards=16) \
        .select_columns(["doc_id", "shuffle_key", "shard", "pos"])


def _q_hash_sample(sf_dir: str):
    from go_fluentd_ray.functions import sampling

    return sampling.hash_sample(_docs(sf_dir), rate_pct=20)


def _q_quota_per_key(sf_dir: str):
    from go_fluentd_ray.functions import sampling

    return sampling.quota_per_key(_docs(sf_dir), key="lang",
                                  measure="n_chars", n=25)


def _q_doc_chunks(sf_dir: str):
    from go_fluentd_ray.functions import sampling

    return sampling.chunk_documents(_docs_text(sf_dir))


def _q_pack_sequences(sf_dir: str):
    from go_fluentd_ray.functions import sampling

    return sampling.pack_documents(_docs_text(sf_dir))


def _q_approx_distinct_users(sf_dir: str):
    """HyperLogLog distinct-user estimate (mergeable per-batch
    sketches). Rows-only: approximate by design; the exact companion
    is the oracle-checked distinct_users."""
    from go_fluentd_ray.functions import sketches

    return sketches.approx_distinct(
        _events(sf_dir, ["user_id"]), "user_id")


def _q_word_topk(sf_dir: str):
    from go_fluentd_ray.functions import aggregates

    return aggregates.word_topk(_docs(sf_dir, ["text"]))


def _q_approx_quantiles(sf_dir: str):
    """Mergeable quantile summary over documents.n_chars (rows-only:
    approximate by design, rank error < N/256)."""
    from go_fluentd_ray.functions import sketches

    return sketches.approx_quantiles(_docs(sf_dir, ["n_chars"]), "n_chars",
                                     qs=(0.5, 0.9, 0.99))


def _q_word_topk_sketch(sf_dir: str):
    """Misra-Gries heavy hitters with deterministic error bounds — the
    bounded-memory 100 TB route; rows-only (approximate by design, the
    exact companion word_topk is the SQL-checked truth)."""
    from go_fluentd_ray.functions import sketches

    return sketches.topk_words_sketch(_docs(sf_dir, ["text"]))


def _q_distinct_users(sf_dir: str):
    from go_fluentd_ray.functions import aggregates

    return aggregates.distinct_users(
        _events(sf_dir, ["user_id", "event_type"]))


def _q_http_ingest(sf_dir: str):
    import ray.data as rd

    from go_fluentd_ray import synth
    from go_fluentd_ray.sources.receivers import http_validate_batch

    path = synth.ensure_http_corpus(_http_n(sf_dir))
    return rd.read_json(path).map_batches(
        http_validate_batch, batch_format="pyarrow", zero_copy_batch=True)


_RSYSLOG_SHIFT = 3600


def _q_rsyslog_transform(sf_dir: str):
    import pyarrow as pa
    import pyarrow.json as pajson
    import ray.data as rd

    from go_fluentd_ray import synth
    from go_fluentd_ray.sources.receivers import rsyslog_transform_batch

    path = synth.ensure_rsyslog_corpus(_http_n(sf_dir))
    schema = pa.schema([("rec_id", pa.int64()), ("host", pa.string()),
                        ("timestamp", pa.string()), ("lvl", pa.string()),
                        ("msg", pa.string())])
    ds = rd.read_json(path,
                      parse_options=pajson.ParseOptions(explicit_schema=schema))
    return ds.map_batches(
        lambda t: rsyslog_transform_batch(
            t, time_shift_sec=_RSYSLOG_SHIFT, rewrite={"lvl": "level"}),
        batch_format="pyarrow", zero_copy_batch=True)


def _q_kafka_parse(sf_dir: str):
    import pyarrow as pa
    import pyarrow.json as pajson
    import ray.data as rd

    from go_fluentd_ray import synth
    from go_fluentd_ray.sources.receivers import kafka_parse_batch

    path = synth.ensure_kafka_corpus(_http_n(sf_dir))
    schema = pa.schema([("rec_id", pa.int64()), ("value", pa.string())])
    ds = rd.read_json(path,
                      parse_options=pajson.ParseOptions(explicit_schema=schema))
    return ds.map_batches(kafka_parse_batch, batch_format="pyarrow",
                          zero_copy_batch=True)


def _q_fluentd_frames(sf_dir: str):
    """fluentd-forward msgpack frame decode (3 frame shapes). Rows-only:
    DuckDB cannot read msgpack, so parity is covered by pytest
    (TestFluentdFrames) instead of a SQL oracle."""
    from go_fluentd_ray import synth
    from go_fluentd_ray.sources.fluentd_frames import read_fluentd_frames

    path = synth.ensure_fluentd_corpus(_http_n(sf_dir))
    return read_fluentd_frames(path)


def _q_fluentd_pipeline(sf_dir: str):
    """COMPOSED end-to-end: fluentd-forward msgpack frames (3 shapes)
    -> transcript rows -> acceptor -> head-regex concat -> parse ->
    enrich -> route — the reference's recv feeding its in-connection
    concatenator and tag pipeline (recvs/fluentd.go:399-544). The SQL
    twin runs the flagship oracle over the frames DECODED to parquet,
    so every post-decode stage is oracle-checked; the msgpack decode
    itself is pytest-checked (DuckDB cannot read msgpack)."""
    from go_fluentd_ray import synth
    from go_fluentd_ray.pipelines import flagship
    from go_fluentd_ray.sources.fluentd_frames import read_fluentd_transcripts

    path = synth.ensure_fluentd_transcript_corpus(
        synth.turns_for_sf_dir(sf_dir))
    ds = read_fluentd_transcripts(path)
    pipe = flagship.build_pipeline(ds)
    return pipe.drop_columns(["merged_turns", "extra"])


def _q_http_fields_route(sf_dir: str):
    """Composed post pipeline: http validate -> FieldsFilter
    (TemplateWithMap new_fields + include projection) ->
    ForwardTagRewriterFilter (env recovered from orig_tag suffix)."""
    import ray.data as rd

    from go_fluentd_ray import synth
    from go_fluentd_ray.sources.receivers import http_validate_batch
    from go_fluentd_ray.stages.postfilter import (fields_filter_batch,
                                                  forward_tag_rewrite_batch)

    path = synth.ensure_http_corpus(_http_n(sf_dir))
    ds = rd.read_json(path).map_batches(
        http_validate_batch, batch_format="pyarrow", zero_copy_batch=True)
    ds = ds.map_batches(
        lambda t: fields_filter_batch(
            t, include=("rec_id", "summary", "region", "orig_tag"),
            new_fields={"summary": "${msg} @${timestamp}",
                        "region": "${missing_col}"}),
        batch_format="pyarrow", zero_copy_batch=True)
    return ds.map_batches(
        lambda t: forward_tag_rewrite_batch(t, base="forward-wechat"),
        batch_format="pyarrow", zero_copy_batch=True)


def queries() -> dict[str, Callable[[str], Any]]:
    # generate the sf0.01 corpus eagerly so oracle_sql() paths always
    # resolve regardless of which side the driver runs first
    _corpus(SF001)
    return {
        # flagship log-pipeline family (SURVEY.md §2)
        "flagship": _q_flagship,
        "flagship_skewed": _q_flagship_skewed,
        "flagship_salted": _q_flagship_salted,
        "flagship_sink_counts": _q_flagship_sink_counts,
        "flagship_tool_role_sink_counts": _q_tool_role_sink_counts,
        "flagship_json_extra": _q_flagship_json_extra,
        "flagship_bigdata_rowkey": _q_flagship_bigdata_rowkey,
        "acceptor_counts": _q_acceptor_counts,
        "concat_segments": _q_concat_segments,
        "window_filter": _q_window_filter,
        "discard_counts": _q_discard_counts,
        # training-data operators
        "token_count": _q_token_count,
        "bpe_token_count": _q_bpe_token_count,
        "bpe_merges": _q_bpe_merges,
        "bpe_token_lens": _q_bpe_token_lens,
        "quality_score": _q_quality,
        "quality_prune": _q_quality_prune,
        "tfidf_keywords": _q_tfidf_keywords,
        "lang_id": _q_lang_id,
        "lm_score": _q_lm_score,
        "repetition_score": _q_repetition,
        "doc_fingerprint": _q_fingerprint,
        "dedup_exact": _q_dedup_exact,
        "dedup_exact_rows": _q_dedup_exact_rows,
        "dedup_minhash_lsh": _q_dedup_minhash,
        "dedup_jaccard": _q_dedup_jaccard,
        "dedup_simhash": _q_dedup_simhash,
        "embedding_dup": _q_embedding_dup,
        "embedding_dup_lsh": _q_embedding_dup_lsh,
        "embedding_dedup_rows": _q_embedding_dedup_rows,
        "near_dedup_rows": _q_near_dedup_rows,
        "dedup_keep_best": _q_dedup_keep_best,
        "dedup_incremental": _q_dedup_incremental,
        "semantic_dedup": _q_semantic_dedup,
        "knn_bruteforce": _q_knn,
        "knn_ivf": _q_knn_ivf,
        "knn_ivf_recall": _q_knn_ivf_recall,
        "knn_pq": _q_knn_pq,
        "knn_pq_recall": _q_knn_pq_recall,
        "knn_ivfpq": _q_knn_ivfpq,
        "knn_ivfpq_recall": _q_knn_ivfpq_recall,
        "knn_ivfpq_indexed": _q_knn_ivfpq_indexed,
        "knn_ivfpq_indexed_recall": _q_knn_ivfpq_indexed_recall,
        "semantic_dedup_recall": _q_semantic_dedup_recall,
        "events_hourly": _q_events_hourly,
        "events_sliding_3h": _q_events_sliding,
        "sessionize": _q_sessionize,
        "running_totals": _q_running_totals,
        "multimodal_meta": _q_multimodal_meta,
        "http_ingest": _q_http_ingest,
        "http_pipeline": _q_http_pipeline,
        "rsyslog_transform": _q_rsyslog_transform,
        "kafka_parse": _q_kafka_parse,
        "http_fields_route": _q_http_fields_route,
        "fluentd_frames": _q_fluentd_frames,
        "fluentd_pipeline": _q_fluentd_pipeline,
        "clean_redact": _q_clean_redact,
        "line_dedup": _q_line_dedup,
        "dedup_lines_within": _q_dedup_lines_within,
        "dedup_spans": _q_dedup_spans,
        "bm25_topk": _q_bm25_topk,
        "bm25_indexed": _q_bm25_indexed,
        "embed_docs": _q_embed_docs,
        "text_knn": _q_text_knn,
        "text_knn_indexed": _q_text_knn_indexed,
        "text_knn_indexed_recall": _q_text_knn_indexed_recall,
        "bigram_pmi": _q_bigram_pmi,
        "corpus_drift": _q_corpus_drift,
        "drift_topk": _q_drift_topk,
        "badwords_filter": _q_badwords_filter,
        "gopher_quality": _q_gopher_quality,
        "dsir_scores": _q_dsir_scores,
        "split_assign": _q_split_assign,
        "curation_pipeline": _q_curation_pipeline,
        "pretrain_pipeline": _q_pretrain_pipeline,
        "selection_pipeline": _q_selection_pipeline,
        "leakage_audit": _q_leakage_audit,
        "decontaminate": _q_decontaminate,
        "semantic_decontaminate": _q_semantic_decontaminate,
        "domain_mix_sample": _q_domain_mix_sample,
        "shuffle_shards": _q_shuffle_shards,
        "hash_sample": _q_hash_sample,
        "quota_per_key": _q_quota_per_key,
        "doc_chunks": _q_doc_chunks,
        "pack_sequences": _q_pack_sequences,
        "word_topk": _q_word_topk,
        "word_topk_sketch": _q_word_topk_sketch,
        "approx_quantiles": _q_approx_quantiles,
        "distinct_users": _q_distinct_users,
        "corpus_stats": _q_corpus_stats,
        "approx_distinct_users": _q_approx_distinct_users,
        "asof_signup_lag": _q_asof,
        "range_join_signups": _q_range_join,
        "conversation_stats": _q_conversation_stats,
        "conversation_dedup": _q_conversation_dedup,
        "tool_latency": _q_tool_latency,
        "role_transitions": _q_role_transitions,
        "context_truncate": _q_context_truncate,
        "sft_examples": _q_sft_examples,
        "loop_detect": _q_loop_detect,
        "prefix_forks": _q_prefix_forks,
        "log_templates": _q_log_templates,
        "throttle_tags": _q_throttle_tags,
        "tool_latency_pct": _q_tool_latency_pct,
        "sft_pipeline": _q_sft_pipeline,
        "rate_anomaly": _q_rate_anomaly,
        "tool_errors": _q_tool_errors,
        "preference_pairs": _q_preference_pairs,
        "pack_conversations": _q_pack_conversations,
        "collapse_repeats": _q_collapse_repeats,
        "conversation_sessions": _q_conversation_sessions,
        "daily_role_stats": _q_daily_role_stats,
        "broadcast_dim_join": _q_dim_join,
        "pricing_summary": _q_pricing_summary,
        "order_revenue_topn": _q_order_revenue_topn,
        "customers_without_orders": _q_customers_without_orders,
    }


def _fluentd_decoded_path() -> str:
    from go_fluentd_ray import synth

    return synth.ensure_fluentd_decoded(synth.turns_for_sf_dir(SF001))


def _gopher_quality_oracle() -> str:
    from go_fluentd_ray import synth
    from go_fluentd_ray.functions import gopherquality

    path = synth.ensure_multiline_docs(synth.docs_for_sf_dir(SF001))
    return gopherquality.gopher_signals_sql(
        table=f"read_parquet('{path}/*.parquet')")


def _line_dedup_oracle() -> str:
    from go_fluentd_ray import synth
    from go_fluentd_ray.functions import linededup

    return linededup.line_dedup_sql(
        synth.ensure_multiline_docs(synth.docs_for_sf_dir(SF001)))


def _dedup_lines_within_oracle() -> str:
    from go_fluentd_ray import synth
    from go_fluentd_ray.functions import linededup

    return linededup.dedup_lines_within_doc_sql(
        synth.ensure_multiline_docs(synth.docs_for_sf_dir(SF001)))


def _http_ingest_sql() -> str:
    from go_fluentd_ray import synth
    from go_fluentd_ray.sources.receivers import DEFAULT_WINDOW as _W

    path = synth.ensure_http_corpus(_http_n(SF001))
    return rf"""
SELECT rec_id, msg, lat, lon, timestamp, sig,
       tag AS orig_tag, 'http.sit' AS tag
FROM read_json_auto('{path}/part-*.json')
WHERE regexp_matches(timestamp, '^\d{{4}}-\d{{2}}-\d{{2}}T\d{{2}}:\d{{2}}:\d{{2}}$')
  AND sig = md5(timestamp || '{synth.HTTP_SALT}')
  AND try_strptime(timestamp, '%Y-%m-%dT%H:%M:%S')
      BETWEEN TIMESTAMP '{_W[0].replace("T", " ")}'
          AND TIMESTAMP '{_W[1].replace("T", " ")}'
"""


def _http_pipeline_sql() -> str:
    from go_fluentd_ray import synth
    from go_fluentd_ray.pipelines import http_pipeline

    path = synth.ensure_http_corpus(_http_n(SF001))
    return http_pipeline.sql(path + "/part-*.json", synth.HTTP_SALT)


def _rsyslog_sql() -> str:
    from go_fluentd_ray import synth

    path = synth.ensure_rsyslog_corpus(_http_n(SF001))
    return f"""
SELECT rec_id, host, lvl AS level, msg AS message,
       strftime(strptime(timestamp, '%Y-%m-%dT%H:%M:%S.%f')
                + INTERVAL {_RSYSLOG_SHIFT} SECOND,
                '%Y-%m-%dT%H:%M:%S.%fZ') AS "@timestamp",
       'emqtt.sit' AS tag
FROM read_json_auto('{path}/part-*.json',
     columns={{'rec_id': 'BIGINT', 'host': 'VARCHAR',
               'timestamp': 'VARCHAR', 'lvl': 'VARCHAR', 'msg': 'VARCHAR'}})
"""


def _kafka_sql() -> str:
    from go_fluentd_ray import synth

    path = synth.ensure_kafka_corpus(_http_n(SF001))
    return f"""
WITH k AS (
  SELECT rec_id, value, try_cast(value AS JSON) AS j
  FROM read_json_auto('{path}/part-*.json',
       columns={{'rec_id': 'BIGINT', 'value': 'VARCHAR'}})
),
k2 AS (
  SELECT rec_id, value,
         CASE WHEN json_type(j) = 'OBJECT' THEN j END AS jo
  FROM k
)
SELECT rec_id,
  CASE WHEN jo IS NOT NULL THEN json_extract_string(jo, '$.log')
       ELSE value END AS log,
  CASE WHEN jo IS NOT NULL AND json_type(jo, '$.tag') = 'VARCHAR'
       THEN json_extract_string(jo, '$.tag') ELSE 'kafka.sit' END AS tag,
  CASE WHEN jo IS NOT NULL THEN json_extract_string(jo, '$.app') END AS app,
  CASE WHEN jo IS NOT NULL THEN json_extract_string(jo, '$.level') END AS level
FROM k2
"""


def _http_fields_route_sql() -> str:
    return rf"""
WITH v AS ({_http_ingest_sql()})
SELECT rec_id, orig_tag,
       CASE WHEN regexp_matches(orig_tag, '\.[^.]+$')
            THEN 'forward-wechat.' || regexp_extract(orig_tag,
                                                     '\.([^.]+)$', 1)
            ELSE tag END AS tag,
       coalesce(msg, '') || ' @' || coalesce(timestamp, '') AS summary,
       '${{missing_col}}' AS region
FROM v
"""


def oracle_sql() -> dict[str, str]:
    import pyarrow.parquet as pq

    from go_fluentd_ray.functions import aggregates as _agg
    from go_fluentd_ray.functions import joins as _joins
    from go_fluentd_ray.functions import events, multimodal, similarity
    from go_fluentd_ray.functions import decontam as _decontam
    from go_fluentd_ray.functions import dedup as _dedup
    from go_fluentd_ray.functions import sampling as _sampling
    from go_fluentd_ray.functions import bm25 as _bm25
    from go_fluentd_ray.functions import drift as _drift
    from go_fluentd_ray.functions import ngrams as _ngrams
    from go_fluentd_ray.functions import dsir as _dsir
    from go_fluentd_ray.functions import convstats as _convstats
    from go_fluentd_ray.functions import turnflow as _turnflow
    from go_fluentd_ray.functions import convmine as _convmine
    from go_fluentd_ray.functions import logops as _logops
    from go_fluentd_ray.pipelines import sftbuild as _sftbuild
    from go_fluentd_ray.functions import leakage as _leakage
    from go_fluentd_ray.functions import rangejoin as _rangejoin
    from go_fluentd_ray.functions import spandedup as _spandedup
    from go_fluentd_ray.functions import textclean as _textclean
    from go_fluentd_ray.pipelines import curation as _curation
    from go_fluentd_ray.config import DEFAULT_CONFIG as _dcfg
    from go_fluentd_ray.pipelines import monitoring as _monitoring
    from go_fluentd_ray.functions import text as T
    from go_fluentd_ray.pipelines import sql_oracle

    path = _corpus(SF001) + "/part-*.parquet"
    pf = pq.ParquetFile(f"{SF001}/embeddings.parquet")
    emb_dim = len(next(pf.iter_batches(batch_size=1, columns=["embedding"]))
                  ["embedding"][0])
    fsql = sql_oracle.flagship_sql(path)
    skew_path = _skewed_corpus(SF001) + "/part-*.parquet"
    return {
        "flagship": fsql,
        "flagship_skewed": sql_oracle.flagship_sql(skew_path),
        "flagship_salted": sql_oracle.flagship_sql(skew_path),
        "flagship_sink_counts": (
            f"SELECT sink, count(*)::BIGINT AS n FROM ({fsql}) GROUP BY sink"),
        "flagship_tool_role_sink_counts": (
            f"SELECT tool, role, sink, count(*)::BIGINT AS n FROM ({fsql}) "
            "GROUP BY tool, role, sink"),
        "flagship_json_extra": sql_oracle.json_extra_sql(path),
        "flagship_bigdata_rowkey": (
            "SELECT conv_id, turn_idx, tag, rowkey FROM ("
            + sql_oracle.flagship_sql(path, _bigdata_cfg()) + ")"),
        "acceptor_counts": sql_oracle.acceptor_counts_sql(path),
        "concat_segments": sql_oracle.concat_segments_sql(path),
        "window_filter": sql_oracle.window_filter_sql(path),
        "discard_counts": _monitoring.discard_counts_sql(
            path, _dcfg),
        "token_count": (
            r"SELECT doc_id, length(regexp_extract_all(text, '\w+'))::BIGINT "
            "AS n_tokens FROM documents"),
        "bpe_token_count": (
            "SELECT doc_id, length(regexp_extract_all(text, "
            f"'{T.BPE_RE.replace(chr(39), chr(39) * 2)}'))::BIGINT "
            "AS n_bpe_tokens FROM documents"),
        "quality_score": (
            f"SELECT doc_id, {T.QUALITY_SQL_EXPRS} FROM documents"),
        "quality_prune": T.quality_prune_sql(pct=20),
        "tfidf_keywords": T.tfidf_keywords_sql(k=5),
        "repetition_score": T.REPETITION_SQL,
        "dedup_exact": (
            "SELECT md5(text) AS h, min(doc_id) AS keep_id, "
            "count(*)::BIGINT AS dups FROM documents GROUP BY 1"),
        "dedup_exact_rows": (
            "SELECT * FROM documents WHERE doc_id IN "
            "(SELECT min(doc_id) FROM documents GROUP BY md5(text))"),
        "embedding_dup": f"""
            SELECT a.vec_id AS a, b.vec_id AS b
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
            WHERE list_cosine_similarity(a.embedding, b.embedding)
                  >= {_EMB_DUP_THR}""",
        "embedding_dedup_rows": f"""
            WITH RECURSIVE e AS (
              SELECT a.vec_id AS u, b.vec_id AS v
              FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
              WHERE list_cosine_similarity(a.embedding, b.embedding)
                    >= {_EMB_DUP_THR}
            ),
            reach(u, v) AS (
              SELECT u, v FROM e
              UNION
              SELECT r.u, e.v FROM reach r JOIN e ON r.v = e.u
            ),
            comp AS (
              SELECT u, least(u, min(v)) AS root FROM reach GROUP BY u
            )
            SELECT vec_id, label FROM embeddings
            WHERE vec_id NOT IN (SELECT u FROM comp WHERE u <> root)""",
        "knn_bruteforce": similarity.knn_bruteforce_sql(emb_dim),
        "events_hourly": events.EVENTS_HOURLY_SQL,
        "events_sliding_3h": events.SLIDING_3H_SQL,
        "sessionize": events.SESSIONIZE_SQL,
        "running_totals": events.RUNNING_TOTALS_SQL,
        "multimodal_meta": multimodal.MULTIMODAL_META_SQL,
        "http_ingest": _http_ingest_sql(),
        "http_pipeline": _http_pipeline_sql(),
        "rsyslog_transform": _rsyslog_sql(),
        "kafka_parse": _kafka_sql(),
        "http_fields_route": _http_fields_route_sql(),
        "fluentd_pipeline": sql_oracle.flagship_sql(
            _fluentd_decoded_path() + "/part-*.parquet"),
        "clean_redact": _textclean.clean_redact_sql(),
        "line_dedup": _line_dedup_oracle(),
        "gopher_quality": _gopher_quality_oracle(),
        "dsir_scores": _dsir.dsir_scores_sql(),
        "dedup_lines_within": _dedup_lines_within_oracle(),
        "dedup_spans": _spandedup.span_dedup_sql(),
        "bm25_topk": _bm25.bm25_topk_sql(),
        # the indexed path must reproduce the one-shot ranking exactly
        "bm25_indexed": _bm25.bm25_topk_sql(),
        "bigram_pmi": _ngrams.bigram_pmi_sql(),
        "corpus_drift": _drift.corpus_drift_sql(),
        "drift_topk": _drift.drift_topk_sql(),
        "badwords_filter": _textclean.badwords_filter_sql(),
        "split_assign": ("SELECT doc_id, split FROM ("
                         + _sampling.split_assign_sql() + ")"),
        "curation_pipeline": _curation.curation_pipeline_sql(),
        "pretrain_pipeline": _curation.pretrain_pipeline_sql(),
        "selection_pipeline": _curation.selection_pipeline_sql(),
        "leakage_audit": _leakage.leakage_audit_sql(),
        "decontaminate": _decontam.decontaminate_sql(n=3, bench_rate_pct=2),
        "semantic_decontaminate": _decontam.semantic_decontaminate_sql(
            threshold=_EMB_DUP_THR, bench_mod=17),
        "domain_mix_sample": _sampling.domain_mix_sample_sql(_MIX_RATES),
        "shuffle_shards": _sampling.shuffle_shards_sql(num_shards=16),
        "hash_sample": _sampling.hash_sample_sql(20),
        "quota_per_key": _sampling.quota_per_key_sql(n=25),
        "doc_chunks": _sampling.chunk_documents_sql(),
        "pack_sequences": _sampling.pack_documents_sql(),
        "word_topk": _agg.WORD_TOPK_SQL,
        "distinct_users": _agg.DISTINCT_USERS_SQL,
        "corpus_stats": _agg.CORPUS_STATS_SQL,
        "asof_signup_lag": _joins.ASOF_SQL,
        "range_join_signups": _rangejoin.range_join_counts_sql(),
        "conversation_stats": _convstats.conversation_stats_sql(
            _corpus(SF001)),
        "conversation_dedup": _convstats.conversation_dedup_sql(
            _corpus(SF001)),
        "tool_latency": _turnflow.tool_latency_sql(_corpus(SF001)),
        "role_transitions": _turnflow.role_transitions_sql(
            _corpus(SF001)),
        "context_truncate": _turnflow.context_truncate_sql(
            _corpus(SF001)),
        "sft_examples": _convmine.sft_examples_sql(_corpus(SF001)),
        "loop_detect": _convmine.loop_detect_sql(_corpus(SF001)),
        "prefix_forks": _convmine.prefix_forks_sql(_corpus(SF001)),
        "log_templates": _logops.log_templates_sql(_corpus(SF001)),
        "throttle_tags": _logops.throttle_tags_sql(_corpus(SF001)),
        "tool_latency_pct": _logops.tool_latency_pct_sql(
            _corpus(SF001)),
        "sft_pipeline": _sftbuild.sft_pipeline_sql(_corpus(SF001)),
        "rate_anomaly": _logops.rate_anomaly_sql(_corpus(SF001)),
        "tool_errors": _logops.tool_errors_sql(_corpus(SF001)),
        "preference_pairs": _convmine.preference_pairs_sql(
            _corpus(SF001)),
        "pack_conversations": _convmine.pack_conversations_sql(
            _corpus(SF001)),
        "collapse_repeats": _logops.collapse_repeats_sql(
            _corpus(SF001)),
        "conversation_sessions": _convstats.conversation_sessions_sql(
            _corpus(SF001)),
        "daily_role_stats": _logops.daily_role_stats_sql(
            _corpus(SF001)),
        "broadcast_dim_join": _joins.DIM_JOIN_SQL,
        "pricing_summary": _agg.PRICING_SUMMARY_SQL,
        "order_revenue_topn": _joins.ORDER_REVENUE_TOPN_SQL,
        "customers_without_orders": _joins.CUSTOMERS_WITHOUT_ORDERS_SQL,
        "doc_fingerprint": T.fingerprint_sql(),
        "lang_id": T.lang_id_sql(),
        "dedup_minhash_lsh": _dedup.minhash_dedup_sql(
            threshold=0.7, min_bands=2),
        "dedup_keep_best": _dedup.minhash_dedup_keep_best_sql(
            threshold=0.7, min_bands=2),
        "dedup_incremental": _dedup.incremental_dedup_sql(
            seen_pct=80, threshold=0.7, min_bands=2),
        "dedup_jaccard": _dedup.jaccard_join_sql(threshold=0.8),
        "dedup_simhash": _dedup.simhash_dedup_sql(),
        "lm_score": T.lm_score_sql(),
        "near_dedup_rows": f"""
            WITH RECURSIVE mh AS ({_dedup.minhash_dedup_sql(
                threshold=0.7, min_bands=2)}),
            e AS (
              SELECT a AS u, b AS v FROM mh
              UNION ALL SELECT b, a FROM mh
            ),
            reach(u, v) AS (
              SELECT u, v FROM e
              UNION
              SELECT r.u, e.v FROM reach r JOIN e ON r.v = e.u
            ),
            comp AS (
              SELECT u, least(u, min(v)) AS root FROM reach GROUP BY u
            )
            SELECT doc_id FROM documents
            WHERE doc_id NOT IN (SELECT u FROM comp WHERE u <> root)""",
        # rows-only (approximate / non-SQL-expressible):
        # embedding_dup_lsh (float32 list kernels + unspecified SQL sum
        # order make hyperplane sign bits unreliable), knn_ivf /
        # knn_ivf_recall / semantic_dedup (k-means), fluentd_frames
        # (msgpack), and the sketch family (approximate by design)
    }
