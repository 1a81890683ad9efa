"""Text-analysis operators over a documents table (doc_id, text, ...).

The large-scale training-data operators the reference never needed but
a 100 TB pipeline does (brief: language-ID, quality scoring, token
counting, document fingerprinting). All stateless operators are
pyarrow-vectorized map_batches; language-ID is an actor-pool stage
(profiles built once per actor).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

TOKEN_RE = r"\w+"
PUNCT_RE = r"[^\w\s]"
STOP_RE = r"\b(the|a|an|and|or|of|to|in|is|it)\b"


def token_count_batch(batch: pa.Table, col: str = "text") -> pa.Table:
    """n_tokens = count of \\w+ matches (RE2 — identical semantics to the
    DuckDB oracle's regexp_extract_all length)."""
    n = pc.count_substring_regex(batch[col], TOKEN_RE)
    return batch.append_column("n_tokens", pc.cast(n, pa.int64()))


# BPE-ish pre-tokenizer (GPT-2 style, simplified to RE2-safe syntax —
# no lookahead): contraction pieces, space-prefixed words, punctuation
# runs, whitespace runs
BPE_RE = r"'(?:[sdmt]|ll|ve|re)| ?\w+| ?[^\s\w']+|\s+"


def bpe_token_count_batch(batch: pa.Table, col: str = "text") -> pa.Table:
    n = pc.count_substring_regex(batch[col], BPE_RE)
    return batch.append_column("n_bpe_tokens", pc.cast(n, pa.int64()))


def quality_batch(batch: pa.Table, col: str = "text") -> pa.Table:
    """Quality-scoring features: char/word counts, punctuation density,
    stopword ratio, mean word length. Pure pyarrow kernels; the score
    formula is a deterministic double expression replicated in SQL."""
    text = batch[col]
    n_chars = pc.cast(pc.utf8_length(text), pa.float64())
    n_words = pc.cast(pc.count_substring_regex(text, TOKEN_RE), pa.float64())
    n_punct = pc.cast(pc.count_substring_regex(text, PUNCT_RE), pa.float64())
    n_stop = pc.cast(pc.count_substring_regex(text, STOP_RE), pa.float64())
    safe_words = pc.max_element_wise(n_words, 1.0)
    punct_ratio = pc.divide(n_punct, pc.max_element_wise(n_chars, 1.0))
    stop_ratio = pc.divide(n_stop, safe_words)
    # mean word length = total token chars / tokens; token chars =
    # chars - whitespace - punct
    n_space = pc.cast(pc.count_substring_regex(text, r"\s"), pa.float64())
    mean_word_len = pc.divide(
        pc.subtract(pc.subtract(n_chars, n_space), n_punct), safe_words)
    score = pc.subtract(
        pc.add(pc.multiply(stop_ratio, 2.0),
               pc.min_element_wise(pc.divide(n_words, 100.0), 1.0)),
        pc.multiply(punct_ratio, 3.0))
    out = batch
    for name, arr in [("n_chars_f", n_chars), ("n_words", n_words),
                      ("punct_ratio", punct_ratio), ("stop_ratio", stop_ratio),
                      ("mean_word_len", mean_word_len), ("quality", score)]:
        out = out.append_column(name, arr)
    return out


QUALITY_SQL_EXPRS = """
  length(text)::DOUBLE AS n_chars_f,
  length(regexp_extract_all(text, '\\w+'))::DOUBLE AS n_words,
  length(regexp_extract_all(text, '[^\\w\\s]'))::DOUBLE
    / greatest(length(text)::DOUBLE, 1.0) AS punct_ratio,
  length(regexp_extract_all(text, '\\b(the|a|an|and|or|of|to|in|is|it)\\b'))::DOUBLE
    / greatest(length(regexp_extract_all(text, '\\w+'))::DOUBLE, 1.0) AS stop_ratio,
  (length(text)::DOUBLE - length(regexp_extract_all(text, '\\s'))::DOUBLE
     - length(regexp_extract_all(text, '[^\\w\\s]'))::DOUBLE)
    / greatest(length(regexp_extract_all(text, '\\w+'))::DOUBLE, 1.0) AS mean_word_len,
  (length(regexp_extract_all(text, '\\b(the|a|an|and|or|of|to|in|is|it)\\b'))::DOUBLE
    / greatest(length(regexp_extract_all(text, '\\w+'))::DOUBLE, 1.0)) * 2.0
  + least(length(regexp_extract_all(text, '\\w+'))::DOUBLE / 100.0, 1.0)
  - (length(regexp_extract_all(text, '[^\\w\\s]'))::DOUBLE
     / greatest(length(text)::DOUBLE, 1.0)) * 3.0 AS quality
"""


def quality_prune(ds, pct: int = 20):
    """Percentile quality pruning (the DCLM / FineWeb 'keep the top p%
    by classifier score' pass), EXACT: score every doc with the
    deterministic quality formula, then global sort by
    (quality DESC, doc_id ASC) + streaming limit K = ceil(n * p / 100).

    Scale notes: the sort is Ray's range-partition shuffle over a
    SKINNY (doc_id, quality) projection — the text never enters the
    exchange — and `limit` streams only the leading blocks to the
    consumer. n comes from parquet metadata (no data pass). For a
    zero-shuffle approximate route at extreme scale, take the threshold
    from sketches.approx_quantiles and filter map-side; this exact path
    is the oracle-checked contract."""
    import math

    n = ds.count()
    k = max(1, math.ceil(n * pct / 100))
    scored = ds.map_batches(quality_batch, batch_format="pyarrow",
                            zero_copy_batch=True)
    return (scored.select_columns(["doc_id", "quality"])
            .sort(["quality", "doc_id"], descending=[True, False])
            .limit(k))


def quality_prune_sql(pct: int = 20, table: str = "documents") -> str:
    """DuckDB twin: identical score expression (QUALITY_SQL_EXPRS ==
    the pyarrow kernel chain op-for-op, so float64 results are
    bit-comparable), identical (quality DESC, doc_id) selection."""
    return f"""
WITH q AS (
  SELECT doc_id, {QUALITY_SQL_EXPRS} FROM {table}
), c AS (
  SELECT count(*) AS n FROM {table}
)
SELECT doc_id, quality FROM q, c
QUALIFY row_number() OVER (ORDER BY quality DESC, doc_id)
        <= CAST(ceil(n * {pct} / 100.0) AS BIGINT)"""


class LangId:
    """Actor-pool heuristic language ID: per-language stopword/char-gram
    profiles compiled once per actor (__init__), vectorized scoring per
    batch. Deterministic; accuracy is heuristic-grade by design."""

    PROFILES = {
        "en": ["the", "and", "of", "to", "is", "in"],
        "es": ["el", "la", "de", "que", "los", "una"],
        "de": ["der", "die", "und", "das", "ist", "nicht"],
        "fr": ["le", "la", "les", "des", "est", "une"],
        "zh": ["de", "shi", "le", "bu", "wo", "zai"],
    }

    def __init__(self):
        self.pats = {
            lang: r"\b(" + "|".join(words) + r")\b"
            for lang, words in self.PROFILES.items()
        }

    def __call__(self, batch: pa.Table) -> pa.Table:
        text = batch["text"]
        scores = np.zeros((len(self.pats), batch.num_rows), dtype=np.int64)
        langs = list(self.pats)
        for i, lang in enumerate(langs):
            scores[i] = pc.count_substring_regex(
                text, self.pats[lang]).to_numpy()
        best = np.argmax(scores, axis=0)
        none = scores.sum(axis=0) == 0
        pred = np.array(langs, dtype=object)[best]
        pred[none] = "unknown"
        return batch.append_column("lang_pred", pa.array(pred, type=pa.string()))


def lang_id_sql(table: str = "documents") -> str:
    """Exact DuckDB twin of LangId, generated from the same PROFILES
    dict so they cannot drift: per-language non-overlapping RE2 match
    counts, argmax with first-in-profile-order tie-break (np.argmax
    semantics), 'unknown' when every score is zero."""
    langs = list(LangId.PROFILES)
    scores = ", ".join(
        f"length(regexp_extract_all(text, "
        f"'\\b({'|'.join(words)})\\b')) AS s_{lang}"
        for lang, words in LangId.PROFILES.items())
    g = "greatest(" + ", ".join(f"s_{lang}" for lang in langs) + ")"
    case = " ".join(f"WHEN s_{lang} = {g} THEN '{lang}'" for lang in langs)
    total = " + ".join(f"s_{lang}" for lang in langs)
    return f"""
WITH s AS (SELECT doc_id, {scores} FROM {table})
SELECT doc_id,
       CASE WHEN {total} = 0 THEN 'unknown' {case} END AS lang_pred
FROM s"""


def fingerprint_batch(batch: pa.Table, col: str = "text",
                      k: int = 5, window: int = 4) -> pa.Table:
    """Winnowing document fingerprint (Schleimer et al., SIGMOD'03):
    k-gram rolling hashes, min per sliding window, distinct mins kept.
    Emits summary columns (n_fp, fp_min, fp_xor) so the result stays
    scalar/hashable. Vectorized per document with numpy."""
    texts = batch[col].to_pylist()
    n_fp = np.zeros(len(texts), dtype=np.int64)
    fp_min = np.zeros(len(texts), dtype=np.int64)
    fp_xor = np.zeros(len(texts), dtype=np.int64)
    B = np.int64(1000003)
    for i, t in enumerate(texts):
        b = np.frombuffer(t.encode("utf-8", "ignore"), dtype=np.uint8)
        if len(b) < k:
            continue
        m = np.lib.stride_tricks.sliding_window_view(b, k).astype(np.int64)
        powers = B ** np.arange(k - 1, -1, -1, dtype=np.int64)
        h = (m * powers).sum(axis=1) & np.int64(0x7FFFFFFFFFFF)
        if len(h) >= window:
            w = np.lib.stride_tricks.sliding_window_view(h, window)
            mins = np.unique(w.min(axis=1))
        else:
            mins = np.unique(h.min(keepdims=True))
        n_fp[i] = len(mins)
        fp_min[i] = mins.min()
        fp_xor[i] = np.bitwise_xor.reduce(mins)
    out = batch
    for name, arr in [("n_fp", n_fp), ("fp_min", fp_min), ("fp_xor", fp_xor)]:
        out = out.append_column(name, pa.array(arr, type=pa.int64()))
    return out


def fingerprint_sql(k: int = 5, window: int = 4,
                    table: str = "documents") -> str:
    """Exact DuckDB twin of fingerprint_batch. The kernel masks every
    rolling hash to its low 47 bits, and 2^47 divides 2^64, so the
    int64-wraparound polynomial hash equals
    (sum byte_j * (B^(k-1-j) mod 2^47)) mod 2^47 — every term fits in
    BIGINT (255 * 2^47 * k < 2^63), no HUGEINT needed. The winnowing
    fingerprint SET is the distinct window-mins, which is tie-break
    independent. Assumes ASCII text (ascii() == utf-8 byte), true of
    the synthetic corpus the oracle runs on."""
    mod = 1 << 47
    pw = [pow(1000003, k - 1 - j, mod) for j in range(k)]
    hexpr = "(" + " + ".join(
        f"ascii(substr(text, i+{j}, 1)) * {pw[j]}" for j in range(k)
    ) + f") % {mod}"
    return f"""
WITH pos AS (
  SELECT doc_id, unnest(generate_series(1, length(text) - {k - 1})) AS i,
         text
  FROM {table} WHERE length(text) >= {k}
),
h AS (
  SELECT doc_id, i, {hexpr} AS h,
         count(*) OVER (PARTITION BY doc_id) AS npos
  FROM pos
),
wm AS (
  SELECT doc_id,
         CASE WHEN npos >= {window}
              THEN min(h) OVER (PARTITION BY doc_id ORDER BY i
                   ROWS BETWEEN CURRENT ROW AND {window - 1} FOLLOWING)
              END AS wmin,
         i, npos,
         min(h) OVER (PARTITION BY doc_id) AS hmin
  FROM h
),
sel AS (
  SELECT doc_id, wmin FROM wm
  WHERE npos >= {window} AND i <= npos - {window - 1}
  UNION ALL
  SELECT DISTINCT doc_id, hmin FROM wm WHERE npos < {window}
),
agg AS (
  SELECT doc_id, count(DISTINCT wmin)::BIGINT AS n_fp,
         min(wmin)::BIGINT AS fp_min,
         bit_xor(DISTINCT wmin)::BIGINT AS fp_xor
  FROM sel GROUP BY doc_id
)
SELECT d.doc_id, coalesce(a.n_fp, 0) AS n_fp,
       coalesce(a.fp_min, 0) AS fp_min, coalesce(a.fp_xor, 0) AS fp_xor
FROM {table} d LEFT JOIN agg a USING (doc_id)"""


def repetition_batch(batch: pa.Table, col: str = "text") -> pa.Table:
    """Gopher-style repetition signals: fraction of duplicate lines and
    duplicate words per document (1 - distinct/total; 0 when empty).
    Boilerplate / template spam scores high and gets filtered before
    training. Tokenization is RE2 (Arrow kernels) so the DuckDB twin's
    regexp_extract_all/string_split agree exactly; the grouped
    distinct-counting is one vectorized pandas pass per batch."""
    import pandas as pd

    text = batch[col]
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    n = len(text)

    def frac(list_arr, drop_empty: bool) -> np.ndarray:
        lens = pc.list_value_length(list_arr).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(list_arr)
        idx = np.repeat(np.arange(n), lens)
        df = pd.DataFrame({"i": idx, "v": flat.to_pandas()})
        if drop_empty:
            df = df[df["v"] != ""]
        g = df.groupby("i")["v"].agg(["count", "nunique"])
        out = np.zeros(n)
        out[g.index.to_numpy()] = 1.0 - g["nunique"].to_numpy() / \
            g["count"].to_numpy()
        return out

    dup_line = frac(pc.split_pattern(text, "\n"), drop_empty=False)
    dup_word = frac(pc.split_pattern_regex(text, r"[^\w]+"),
                    drop_empty=True)
    out = batch.append_column("dup_line_frac", pa.array(dup_line))
    return out.append_column("dup_word_frac", pa.array(dup_word))


REPETITION_SQL = r"""
WITH l AS (
  SELECT doc_id,
         count(*) AS n, count(DISTINCT line) AS d
  FROM (SELECT doc_id, unnest(string_split(text, chr(10))) AS line
        FROM documents) GROUP BY doc_id
),
w AS (
  SELECT doc_id,
         count(*) AS n, count(DISTINCT word) AS d
  FROM (SELECT doc_id, unnest(regexp_extract_all(text, '\w+')) AS word
        FROM documents) GROUP BY doc_id
)
SELECT doc.doc_id,
       coalesce(1.0 - l.d::DOUBLE / l.n, 0.0) AS dup_line_frac,
       coalesce(1.0 - w.d::DOUBLE / w.n, 0.0) AS dup_word_frac
FROM documents doc
LEFT JOIN l ON l.doc_id = doc.doc_id
LEFT JOIN w ON w.doc_id = doc.doc_id
"""


# ---------------------------------------------------------------------------
# char-ngram LM scoring (perplexity-style quality filter, CCNet-shaped)
# ---------------------------------------------------------------------------

class NgramLmScorer:
    """Actor-pool stage: score each doc by its per-character bits under
    a char-trigram model fit on a reference sample (low = fluent /
    reference-like, high = noise) — the classic LM-perplexity quality
    filter for training-data curation.

    The (small) reference model ships ONCE: the counts are built in
    ``__init__`` from a broadcast list of reference texts (ray.put by
    the caller; at real scale a fitted model object). Scoring is
    vectorized per doc with numpy over code-point trigrams; add-one
    smoothing over the observed vocabulary keeps unseen trigrams finite
    and deterministic."""

    def __init__(self, ref_ref=None, ref_texts: "list[str] | None" = None):
        import ray

        texts = ray.get(ref_ref) if ref_ref is not None else (ref_texts or [])
        grams = [self._grams(t.lower()) for t in texts] or [
            np.zeros(0, dtype=np.uint64)]
        allg = np.concatenate(grams)
        keys, counts = np.unique(allg, return_counts=True)
        total = int(counts.sum())
        self.vocab = max(len(keys), 1)
        # sorted key array + aligned log2 probs: scoring is a single
        # searchsorted per doc, no python-per-trigram work
        self.keys = keys
        self.logp = np.log2((counts + 1) / (total + self.vocab))
        self.unseen = float(np.log2(1.0 / (total + self.vocab)))

    @staticmethod
    def _grams(t: str) -> np.ndarray:
        b = np.frombuffer(t.encode("utf-8", "ignore"), dtype=np.uint8)
        if len(b) < 3:
            return np.zeros(0, dtype=np.uint64)
        w = np.lib.stride_tricks.sliding_window_view(b, 3).astype(np.uint64)
        return (w[:, 0] << np.uint64(16)) | (w[:, 1] << np.uint64(8)) | w[:, 2]

    def __call__(self, batch: pa.Table, col: str = "text") -> pa.Table:
        bits = np.empty(batch.num_rows)
        for i, t in enumerate(batch[col].to_pylist()):
            g = self._grams((t or "").lower())
            if len(g) == 0:
                bits[i] = -self.unseen
                continue
            idx = np.searchsorted(self.keys, g)
            idx[idx >= len(self.keys)] = 0
            hit = self.keys[idx] == g if len(self.keys) else \
                np.zeros(len(g), dtype=bool)
            s = self.logp[idx[hit]].sum() + self.unseen * (~hit).sum()
            bits[i] = -s / len(g)
        return batch.append_column(
            "lm_bits_per_char", pa.array(np.round(bits, 4)))


def lm_score_sql(ref_sample_n: int = 256, table: str = "documents") -> str:
    """Exact DuckDB twin of lm_score: the reference sample is the
    ref_sample_n docs with smallest md5(doc_id) (full-hexdigest string
    order — identical to the Ray side's tree-reduced pick), the model
    is add-one-smoothed char-trigram counts over that sample, and each
    doc scores mean -log2 P(trigram). Float sums differ from numpy's
    pairwise summation only in final ULPs, absorbed by the round(…, 4)
    both sides apply (verified exact at oracle scale). ASCII corpus
    (byte trigrams == char trigrams)."""
    return f"""
WITH ref AS (
  SELECT lower(text) AS t FROM {table}
  ORDER BY md5(CAST(doc_id AS VARCHAR)) LIMIT {ref_sample_n}
),
rg AS (
  SELECT substr(t, i, 3) AS g
  FROM (SELECT t, unnest(generate_series(1, length(t) - 2)) AS i
        FROM ref WHERE length(t) >= 3)
),
model AS (SELECT g, count(*) AS c FROM rg GROUP BY g),
tot AS (SELECT sum(c) AS total, count(*) AS vocab FROM model),
dg AS (
  SELECT doc_id, substr(lower(text), i, 3) AS g
  FROM (SELECT doc_id, text,
               unnest(generate_series(1, length(text) - 2)) AS i
        FROM {table} WHERE length(text) >= 3)
),
sc AS (
  SELECT doc_id,
         -sum(CASE WHEN m.c IS NULL THEN log2(1.0 / (total + vocab))
                   ELSE log2((m.c + 1.0) / (total + vocab)) END)
          / count(*) AS bits
  FROM dg LEFT JOIN model m USING (g) CROSS JOIN tot
  GROUP BY doc_id
)
SELECT d.doc_id,
       round(coalesce(sc.bits, -log2(1.0 / (total + vocab))), 4)
       AS lm_bits_per_char
FROM {table} d LEFT JOIN sc USING (doc_id) CROSS JOIN tot"""


def lm_score(docs_ds, ref_sample_n: int = 256):
    """Fit the reference trigram model on a deterministic sample of the
    corpus itself (the ref_sample_n docs with smallest md5(doc_id) —
    stable across runs, partitionings and cluster sizes), broadcast it
    once, and score every doc. The sample selection is a per-batch
    top-K partial, then a TREE-REDUCE round (coalesce to <= 8 blocks,
    top-K within each) before the driver's final pick — so the driver
    holds at most 8*K candidate rows, never K x n_batches (at 100 TB
    that would be tens of GB of text for hundreds of thousands of
    blocks)."""
    import hashlib as _h

    import ray

    K = ref_sample_n

    def local_min(batch: pa.Table) -> pa.Table:
        import pandas as pd

        df = pd.DataFrame({
            "h": [_h.md5(str(i).encode()).hexdigest()
                  for i in batch["doc_id"].to_pylist()],
            "text": batch["text"].to_pylist(),
        })
        df = df.sort_values("h", kind="mergesort").head(K)
        return pa.Table.from_pandas(df, preserve_index=False)

    def combine_min(batch: pa.Table) -> pa.Table:
        import pandas as pd

        df = batch.to_pandas().sort_values("h", kind="mergesort").head(K)
        return pa.Table.from_pandas(df, preserve_index=False)

    partials = (docs_ds.select_columns(["doc_id", "text"])
                .map_batches(local_min, batch_format="pyarrow")
                .repartition(8, shuffle=False)
                .map_batches(combine_min, batch_format="pyarrow",
                             batch_size=None)  # whole block -> <= K rows out
                .take_all())  # <= 8 * K rows on the driver
    partials.sort(key=lambda r: r["h"])
    ref_texts = [r["text"] for r in partials[:K]]
    ref = ray.put(ref_texts)
    cpus = int(ray.cluster_resources().get("CPU", 4))
    return docs_ds.map_batches(
        NgramLmScorer, fn_constructor_kwargs={"ref_ref": ref},
        batch_format="pyarrow", concurrency=max(2, cpus // 4),
        zero_copy_batch=True).select_columns(["doc_id",
                                              "lm_bits_per_char"])


# ---------------------------------------------------------------------------
# tf-idf keyword extraction
# ---------------------------------------------------------------------------

_TFIDF_DF_CACHE: dict = {}


def tfidf_keywords(ds, k: int = 5, table_count: int | None = None):
    """Top-k keywords per document by tf-idf — the classic corpus-level
    text-analysis pass (idf = ln(N / df), ranked by rounded tfidf DESC
    then word ASC; ties and the 6-dp rounding are part of the contract
    so the SQL twin agrees exactly).

    Distributed shape (the jaccard_join df pattern): document
    frequencies come from one SKINNY shuffle of per-batch
    distinct-docs-per-word partials; only the df>=2 vocabulary
    broadcasts (a word absent from it has df=1 by definition), so the
    corpus text never moves and scoring is map-side only. Per-batch
    work is one flatten + one vectorized pandas groupby — no per-row
    Python."""
    import ray

    from .shuffle import add_bucket_col, default_buckets

    B = default_buckets()
    N = table_count if table_count is not None else ds.count()

    def df_partial(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(batch["text"], pattern=r"[^\w]+")
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks)
        d = pd.DataFrame({"doc": parent.to_numpy(zero_copy_only=False),
                          "word": flat.to_pylist()})
        d = d[d["word"] != ""].drop_duplicates()
        g = d.groupby("word", sort=False).size().rename("df").reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    def df_reduce(tbl: pa.Table) -> pa.Table:
        g = tbl.group_by("word").aggregate([("df", "sum")])
        g = g.filter(pc.greater_equal(g["df_sum"], 2))
        return pa.table({"word": g["word"],
                         "df": pc.cast(g["df_sum"], pa.int64())})

    dfp = ds.select_columns(["text"]).map_batches(
        df_partial, batch_format="pyarrow", zero_copy_batch=True)
    dfp = dfp.map_batches(lambda t: add_bucket_col(t, ["word"], B),
                          batch_format="pyarrow")
    dfres = dfp.groupby("__bkt").map_groups(df_reduce,
                                            batch_format="pyarrow")
    # df>=2 vocabulary only — the broadcast side (df=1 words need no
    # entry). Gathered Arrow-native: take_all + a Python dict loop is a
    # serial driver cost linear in the vocabulary; concat+argsort stay
    # in C. Empty buckets yield zero-column blocks — drop before concat.
    vtbls = [t for t in ray.get(dfres.to_arrow_refs()) if t.num_columns]
    if vtbls:
        vt = pa.concat_tables(vtbls)
        vocab = vt["word"].to_numpy(zero_copy_only=False)
        vdf = vt["df"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(vocab, kind="stable")
        vocab, vdf = vocab[order], vdf[order]
    else:
        vocab = np.empty(0, dtype=object)
        vdf = np.empty(0, dtype=np.int64)
    ref = ray.put((vocab, vdf))
    key = ref.hex()

    def score(batch: pa.Table) -> pa.Table:
        vv = _TFIDF_DF_CACHE.get(key)
        if vv is None:
            if len(_TFIDF_DF_CACHE) > 4:
                _TFIDF_DF_CACHE.clear()
            vv = _TFIDF_DF_CACHE[key] = ray.get(ref)
        voc, voc_df = vv
        ids = batch["doc_id"].to_numpy()
        toks = pc.split_pattern_regex(batch["text"], pattern=r"[^\w]+")
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks)
        d = pd.DataFrame({"doc": parent.to_numpy(zero_copy_only=False),
                          "word": flat.to_pylist()})
        d = d[d["word"] != ""]
        tf = (d.groupby(["doc", "word"], sort=False).size()
              .rename("tf").reset_index())
        words = tf["word"].to_numpy()
        dfv = np.ones(len(tf), dtype=np.int64)
        if len(voc):
            pos = np.searchsorted(voc, words)
            pos[pos >= len(voc)] = len(voc) - 1
            hit = voc[pos] == words
            dfv[hit] = voc_df[pos[hit]]
        tfidf = np.round(tf["tf"].to_numpy() * np.log(N / dfv), 6)
        tf["tfidf"] = tfidf
        tf = tf.sort_values(["doc", "tfidf", "word"],
                            ascending=[True, False, True], kind="mergesort")
        top = tf.groupby("doc", sort=False).head(k)
        return pa.table({
            "doc_id": pa.array(ids[top["doc"].to_numpy()], pa.int64()),
            "word": pa.array(top["word"], pa.string()),
            "tf": pa.array(top["tf"].to_numpy(), pa.int64()),
            "tfidf": pa.array(top["tfidf"].to_numpy(), pa.float64()),
        })

    return ds.select_columns(["doc_id", "text"]).map_batches(
        score, batch_format="pyarrow", zero_copy_batch=True)


def tfidf_keywords_sql(k: int = 5, table: str = "documents") -> str:
    """DuckDB twin: identical tokenization, identical idf = ln(N/df),
    identical 6-dp rounding BEFORE the (tfidf DESC, word ASC) rank."""
    return rf"""
WITH words AS (
  SELECT doc_id, unnest(regexp_extract_all(text, '\w+')) AS word
  FROM {table}
),
tf AS (SELECT doc_id, word, count(*) AS tf FROM words GROUP BY 1, 2),
wdf AS (SELECT word, count(DISTINCT doc_id) AS df FROM words GROUP BY 1),
n AS (SELECT count(*) AS n FROM {table}),
scored AS (
  SELECT t.doc_id, t.word, t.tf,
         round(t.tf * ln(n.n::DOUBLE / d.df), 6) AS tfidf
  FROM tf t JOIN wdf d USING (word), n
)
SELECT doc_id, word, tf::BIGINT AS tf, tfidf FROM (
  SELECT *, row_number() OVER (PARTITION BY doc_id
                               ORDER BY tfidf DESC, word) AS rk
  FROM scored)
WHERE rk <= {k}"""
