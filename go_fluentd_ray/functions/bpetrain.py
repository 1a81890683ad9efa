"""Distributed BPE tokenizer training (Sennrich et al. 2016) — the
vocabulary-learning pass of an LLM data pipeline, built the way
production trainers (HF tokenizers, SentencePiece in BPE mode) do it:
the CORPUS is touched exactly once, by a skinny word-count shuffle
(per-batch Arrow value_counts partials -> hash(word) % B exact sums —
the word_topk pattern), and every merge iteration runs over the
DISTINCT-WORD frequency table, which is orders of magnitude smaller
than the corpus (a 100 TB web corpus has billions of documents but a
bounded distinct-word set).

The merge loop itself is fully vectorized: each word is a run of int32
symbol ids (chars + an end-of-word marker) in one flat array per
chunk; pair counting is one masked shift-compare + bincount, and the
greedy leftmost merge-apply resolves overlapping matches ("aaaa" with
pair (a,a)) with a run-parity trick instead of a scan. Chunks live in
the object store; each iteration ships only a (pair-code, count)
partial per chunk to the driver, which holds nothing but the growing
symbol table. When the word table is small (<= local_max_rows) the
same kernel runs as a single local loop — one chunk, zero task
overhead — mirroring the jaccard broadcast gate.

Per-iteration cost is a full recount O(total symbols) per chunk; the
documented upgrade path for production vocab sizes (30k+ merges) is
delta pair counting off the match positions + a linked-list symbol
store, which drops iterations to O(matches). At the n_merges this
engine's queries use, recount is both simpler and fast.

No counterpart in the reference (go-fluentd has no tokenizer); the
semantics follow the published algorithm (Sennrich 2016 fig. 1) with
deterministic tie-breaks: best pair = max count, then lexicographic
(left, right) ascending.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

EOW = "</w>"
# single-chunk threshold, MEASURED crossover on this host: at 168k
# words (1.7M symbols) the fused local loop runs ~4 s for 120 merges
# while the chunked path pays ~60 ms of task-barrier per merge; at
# 668k words (6.9M symbols) the local loop's ~10 full-stream
# allocations per iteration cost 33 s while the chunked loop
# parallelizes the same work in ~8 s. Memory is NOT the binding
# constraint — per-iteration allocation traffic is.
LOCAL_MAX_ROWS = 300_000


# ---------------------------------------------------------------------------
# corpus pass: distinct-word frequency table (ONE skinny shuffle)
# ---------------------------------------------------------------------------

def word_count_table(ds, col: str = "text",
                     num_buckets: int | None = None):
    """Dataset[(word, n)] with each distinct word exactly once —
    per-batch Arrow value_counts combiner, then an exact per-bucket sum
    keyed hash(word) % B. Text leaves the corpus only as distinct-word
    partial rows."""
    from .shuffle import add_bucket_col, default_buckets

    B = num_buckets or default_buckets()

    def partial(batch: pa.Table) -> pa.Table:
        toks = pc.list_flatten(
            pc.split_pattern_regex(batch[col], pattern=r"[^\w]+"))
        toks = toks.filter(pc.not_equal(toks, ""))
        vc = pc.value_counts(toks)
        return pa.table({"word": vc.field("values"),
                         "n": pc.cast(vc.field("counts"), pa.int64())})

    def bucket_sum(tbl: pa.Table) -> pa.Table:
        df = tbl.to_pandas()
        g = df.groupby("word", sort=False)["n"].sum().reset_index()
        return pa.table({"word": pa.array(g["word"], type=pa.string()),
                         "n": pa.array(g["n"].to_numpy(), type=pa.int64())})

    agg = ds.map_batches(partial, batch_format="pyarrow",
                         zero_copy_batch=True)
    agg = agg.map_batches(lambda t: add_bucket_col(t, ["word"], B),
                          batch_format="pyarrow")
    return agg.groupby("__bkt").map_groups(bucket_sum,
                                           batch_format="pyarrow")


# ---------------------------------------------------------------------------
# vectorized symbol kernel (shared by train chunks and the encoder)
# ---------------------------------------------------------------------------

def _explode(words: np.ndarray, char_ids: dict[str, int], eow_id: int):
    """words (object array of str) -> (syms int32, word_ids int32):
    each word becomes its chars + EOW. Codepoint extraction is one
    utf-32 reinterpret of the joined string; char -> id is a
    searchsorted over the sorted codepoint alphabet."""
    n = len(words)
    if n == 0:
        return (np.empty(0, np.int32), np.empty(0, np.int32))
    lens = np.fromiter((len(w) for w in words), dtype=np.int64, count=n)
    cps = np.frombuffer("".join(words).encode("utf-32-le"),
                        dtype=np.uint32)
    alpha = np.array(sorted(ord(c) for c in char_ids), dtype=np.uint32)
    ids = np.array([char_ids[chr(c)] for c in alpha], dtype=np.int32)
    char_syms = ids[np.searchsorted(alpha, cps)]
    tot = int(lens.sum()) + n
    syms = np.empty(tot, dtype=np.int32)
    word_ids = np.repeat(np.arange(n, dtype=np.int32), lens + 1)
    ends = np.cumsum(lens + 1) - 1
    mask = np.ones(tot, dtype=bool)
    mask[ends] = False
    syms[mask] = char_syms
    syms[ends] = eow_id
    return syms, word_ids


def _pair_counts(syms: np.ndarray, word_ids: np.ndarray,
                 counts: np.ndarray, n_vocab: int = 0):
    """(codes int64, n int64): weighted adjacent-pair counts; the pair
    (a, b) is coded a << 32 | b. Weight = the word's corpus count.

    When the live vocabulary is small (the common case: alphabet +
    merges-so-far), counting is one np.bincount over compact
    left*V+right keys — this loop runs every merge iteration, and the
    np.unique fallback re-SORTS the full symbol stream each time
    (measured: the sort made a 120-merge train driver-bound at 21 s
    over a 1.5M-symbol word table; bincount cuts the iteration to
    milliseconds). Falls back to unique when V^2 would not fit a
    cache-friendly count array."""
    if len(syms) < 2:
        return (np.empty(0, np.int64), np.empty(0, np.int64))
    valid = word_ids[:-1] == word_ids[1:]
    left = syms[:-1][valid].astype(np.int64)
    right = syms[1:][valid].astype(np.int64)
    w = counts[word_ids[:-1][valid]]
    if 0 < n_vocab <= 4096:
        sums_all = np.bincount(left * n_vocab + right, weights=w,
                               minlength=n_vocab * n_vocab)
        nz = np.flatnonzero(sums_all)
        return (((nz // n_vocab) << 32) | (nz % n_vocab),
                sums_all[nz].astype(np.int64))
    code = (left << 32) | right
    uniq, inv = np.unique(code, return_inverse=True)
    sums = np.zeros(len(uniq), dtype=np.int64)
    np.add.at(sums, inv, w)
    return uniq, sums


def _apply_merge(syms: np.ndarray, word_ids: np.ndarray,
                 left: int, right: int, new_id: int):
    """Greedy leftmost replacement of every (left, right) adjacency by
    new_id. Overlap resolution: in a run of CONSECUTIVE match
    positions (only possible when matches chain through a shared
    middle symbol, e.g. (a,a) on 'aaaa'), greedy-leftmost keeps
    exactly the even offsets within the run."""
    if len(syms) < 2:
        return syms, word_ids
    match = ((syms[:-1] == left) & (syms[1:] == right)
             & (word_ids[:-1] == word_ids[1:]))
    pos = np.flatnonzero(match)
    if len(pos) == 0:
        return syms, word_ids
    if len(pos) > 1:
        brk = np.flatnonzero(np.diff(pos) != 1) + 1
        starts = np.concatenate(([0], brk))
        run_len = np.diff(np.concatenate((starts, [len(pos)])))
        run_start_pos = np.repeat(pos[starts], run_len)
        pos = pos[(pos - run_start_pos) % 2 == 0]
    out = syms.copy()
    out[pos] = new_id
    drop = np.zeros(len(syms), dtype=bool)
    drop[pos + 1] = True
    return out[~drop], word_ids[~drop]


# ---------------------------------------------------------------------------
# training
# ---------------------------------------------------------------------------

def _local_merge_loop(syms: np.ndarray, word_ids: np.ndarray,
                      counts: np.ndarray, vocab: list[str],
                      n_merges: int, min_count: int) -> list[tuple]:
    """Fused single-chunk merge loop: ONE compact pair key per
    iteration serves both the bincount AND the match positions (the
    generic _pair_counts/_apply_merge pair recomputes the shifted
    compares twice — measured 2x slower at a 1.7M-symbol word table).
    Semantics identical to the generic path (same tie-breaks, same
    run-parity greedy-leftmost); caller gates on
    len(vocab) + n_merges <= 4096 so V^2 count arrays stay
    cache-friendly. Returns [(rank, left, right, merged, n)]."""
    out = []
    v_final = len(vocab) + n_merges        # stable key base
    for rank in range(n_merges):
        if len(syms) < 2:
            break
        valid = word_ids[:-1] == word_ids[1:]
        key = syms[:-1] * np.int32(v_final) + syms[1:]
        key = np.where(valid, key, np.int32(v_final * v_final))
        sums = np.bincount(key, weights=counts[word_ids[:-1]],
                           minlength=v_final * v_final + 1)[:-1]
        top = sums.max() if len(sums) else 0
        if top < min_count:
            break
        cand = np.flatnonzero(sums == top)
        ls, rs, code = sorted((vocab[c // v_final], vocab[c % v_final],
                               int(c)) for c in cand)[0]
        new_id = len(vocab)
        vocab.append(ls + rs)
        out.append((rank, ls, rs, ls + rs, int(top)))
        pos = np.flatnonzero(key == code)
        if len(pos) > 1:
            brk = np.flatnonzero(np.diff(pos) != 1) + 1
            starts = np.concatenate(([0], brk))
            run_len = np.diff(np.concatenate((starts, [len(pos)])))
            run_start_pos = np.repeat(pos[starts], run_len)
            pos = pos[(pos - run_start_pos) % 2 == 0]
        syms = syms.copy()
        syms[pos] = new_id
        drop = np.zeros(len(syms), dtype=bool)
        drop[pos + 1] = True
        syms = syms[~drop]
        word_ids = word_ids[~drop]
    return out


def _merge_codes(parts) -> tuple[np.ndarray, np.ndarray]:
    """Sum (codes, counts) partials from every chunk."""
    codes = np.concatenate([p[0] for p in parts])
    cnts = np.concatenate([p[1] for p in parts])
    if len(codes) == 0:
        return codes, cnts
    uniq, inv = np.unique(codes, return_inverse=True)
    sums = np.zeros(len(uniq), dtype=np.int64)
    np.add.at(sums, inv, cnts)
    return uniq, sums


def _best_pair(codes: np.ndarray, sums: np.ndarray,
               vocab: list[str], min_count: int):
    """argmax count, ties broken lexicographic (left, right) ascending
    over the symbol STRINGS — the published deterministic order."""
    if len(codes) == 0:
        return None
    top = sums.max()
    if top < min_count:
        return None
    cand = codes[sums == top]
    pairs = sorted((vocab[int(c >> 32)], vocab[int(c & 0xFFFFFFFF)], c)
                   for c in cand)
    left_s, right_s, code = pairs[0]
    return int(code >> 32), int(code & 0xFFFFFFFF), left_s, right_s, int(top)


def bpe_train(ds, n_merges: int = 200, col: str = "text",
              min_count: int = 2, num_buckets: int | None = None,
              local_max_rows: int = LOCAL_MAX_ROWS,
              timings: dict | None = None) -> pd.DataFrame:
    """Learn n_merges BPE merges over the corpus; returns one row per
    merge: (rank, left, right, merged, n) under the deterministic
    (count desc, left asc, right asc) selection order. Stops early
    when the best pair's count falls below min_count.

    Scale shape: corpus -> ONE skinny distinct-word shuffle; the word
    table is chunked into the object store and each iteration moves
    only per-chunk (pair, count) partials; the driver holds the symbol
    table and the merged pair-count vector (bounded by the live pair
    diversity, ~O(alphabet^2 + n_merges)), never words or text."""
    import time as _time

    import ray

    t0 = _time.time()
    # materialize: the distinct-word table is the SMALL side (bounded
    # by vocabulary, not corpus) and is consumed twice (count + chunk
    # gather) — without this the corpus word-count pass runs twice
    words_ds = word_count_table(ds, col=col,
                                num_buckets=num_buckets).materialize()
    n_rows = words_ds.count()
    if timings is not None:
        timings["word_count_sec"] = round(_time.time() - t0, 2)
        timings["word_rows"] = int(n_rows)
        t0 = _time.time()

    # ---- gather chunks ------------------------------------------------
    if n_rows <= local_max_rows:
        tbl = pa.concat_tables(
            [b for b in words_ds.iter_batches(batch_size=None,
                                              batch_format="pyarrow")]
            or [pa.table({"word": pa.array([], pa.string()),
                          "n": pa.array([], pa.int64())})])
        chunk_tables = [tbl.select(["word", "n"])]
        local = True
    else:
        # one chunk per cpu: per-merge wall = barrier latency + the
        # slowest chunk's recount; more chunks than cpus only adds
        # submission overhead to every one of the n_merges barriers
        cpus = int(ray.cluster_resources().get("CPU", 8))
        chunk_rows = max(4096, -(-n_rows // cpus))
        chunk_tables = None
        local = False

    # ---- alphabet (distinct chars) ------------------------------------
    def chunk_alphabet(t: pa.Table) -> set[str]:
        w = t["word"]
        joined = "".join(w.to_pylist())
        return set(joined)

    if local:
        alphabet = chunk_alphabet(chunk_tables[0])
        states = None
        chunk_refs = None
    else:
        chunk_refs = [ray.put(b) for b in words_ds.iter_batches(
            batch_size=chunk_rows, batch_format="pyarrow")]

        @ray.remote
        def alpha_of(t):
            return chunk_alphabet(t)

        alphabet = set().union(*ray.get(
            [alpha_of.remote(r) for r in chunk_refs])) if chunk_refs \
            else set()

    vocab = sorted(alphabet) + [EOW]
    char_ids = {c: i for i, c in enumerate(sorted(alphabet))}
    eow_id = len(vocab) - 1

    # ---- encode chunks to flat symbol arrays --------------------------
    def encode_chunk(t: pa.Table):
        words = np.asarray(t["word"].to_pylist(), dtype=object)
        counts = t["n"].to_numpy().astype(np.int64)
        syms, word_ids = _explode(words, char_ids, eow_id)
        return syms, word_ids, counts

    if local:
        state = encode_chunk(chunk_tables[0])
        if len(vocab) + n_merges <= 2048:
            # fused fast loop (the common case: bounded alphabet)
            mlist = _local_merge_loop(state[0], state[1], state[2],
                                      vocab, n_merges, min_count)
            if timings is not None:
                timings["merge_loop_sec"] = round(_time.time() - t0, 2)
            return pd.DataFrame({
                "rank": np.array([m[0] for m in mlist], dtype=np.int64),
                "left": [m[1] for m in mlist],
                "right": [m[2] for m in mlist],
                "merged": [m[3] for m in mlist],
                "n": np.array([m[4] for m in mlist], dtype=np.int64)})
        parts = [_pair_counts(*state, len(vocab))]
    else:
        @ray.remote(num_returns=2)
        def enc(t, nv):
            st = encode_chunk(t)
            return st, _pair_counts(*st, nv)

        outs = [enc.remote(r, len(vocab)) for r in chunk_refs]
        states = [o[0] for o in outs]
        parts = ray.get([o[1] for o in outs])

    if not local:
        @ray.remote(num_returns=2)
        def step(st, left, right, new_id):
            syms, word_ids, counts = st
            syms, word_ids = _apply_merge(syms, word_ids, left, right,
                                          new_id)
            st2 = (syms, word_ids, counts)
            return st2, _pair_counts(*st2, new_id + 1)

    merges = {"rank": [], "left": [], "right": [], "merged": [], "n": []}
    for rank in range(n_merges):
        codes, sums = _merge_codes(parts)
        best = _best_pair(codes, sums, vocab, min_count)
        if best is None:
            break
        li, ri, ls, rs, cnt = best
        new_id = len(vocab)
        vocab.append(ls + rs)
        merges["rank"].append(rank)
        merges["left"].append(ls)
        merges["right"].append(rs)
        merges["merged"].append(ls + rs)
        merges["n"].append(cnt)
        if local:
            syms, word_ids = _apply_merge(state[0], state[1], li, ri,
                                          new_id)
            state = (syms, word_ids, state[2])
            parts = [_pair_counts(*state, len(vocab))]
        else:
            outs = [step.remote(st, li, ri, new_id) for st in states]
            states = [o[0] for o in outs]
            parts = ray.get([o[1] for o in outs])

    if timings is not None:
        timings["merge_loop_sec"] = round(_time.time() - t0, 2)
    return pd.DataFrame({
        "rank": np.array(merges["rank"], dtype=np.int64),
        "left": merges["left"], "right": merges["right"],
        "merged": merges["merged"],
        "n": np.array(merges["n"], dtype=np.int64)})


# ---------------------------------------------------------------------------
# encoding with a learned merge table (map-side, zero shuffles)
# ---------------------------------------------------------------------------

def bpe_token_lens(ds, merges: pd.DataFrame, col: str = "text",
                   id_col: str = "doc_id"):
    """Dataset[(id_col, n_bpe)]: per-document token count under the
    learned merges. Per batch: distinct words encode ONCE through the
    same vectorized kernel (all merges replayed in rank order), then
    occurrence counts gather back per document — the standard
    unique-then-broadcast encode."""
    mlist = list(zip(merges["left"], merges["right"], merges["merged"]))

    def enc_batch(batch: pa.Table) -> pa.Table:
        tok_lists = pc.split_pattern_regex(batch[col], pattern=r"[^\w]+")
        flat = pc.list_flatten(tok_lists)
        parents = pc.list_parent_indices(tok_lists).to_numpy()
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        words = np.asarray(flat.to_pylist(), dtype=object)[keep]
        parents = parents[keep]
        uw, inv = np.unique(words, return_index=False,
                            return_inverse=True)
        # local vocab: batch chars + EOW + every merge participant
        chars = set("".join(uw.tolist()))
        vocab_syms = sorted(chars) + [EOW]
        sym_id = {s: i for i, s in enumerate(vocab_syms)}
        char_ids = {c: sym_id[c] for c in chars}
        syms, word_ids = _explode(uw, char_ids, sym_id[EOW])
        for ls, rs, ms in mlist:
            li = sym_id.get(ls)
            ri = sym_id.get(rs)
            ni = sym_id.setdefault(ms, len(sym_id))
            if li is None or ri is None:
                continue
            syms, word_ids = _apply_merge(syms, word_ids, li, ri, ni)
        per_word = np.bincount(word_ids, minlength=len(uw)).astype(
            np.int64)
        n_docs = len(batch)
        doc_tok = np.zeros(n_docs, dtype=np.int64)
        np.add.at(doc_tok, parents, per_word[inv])
        return pa.table({id_col: batch[id_col],
                         "n_bpe": pa.array(doc_tok, type=pa.int64())})

    return ds.map_batches(enc_batch, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# reference implementation (tests only): Sennrich 2016 fig. 1, naive
# ---------------------------------------------------------------------------

def naive_bpe(word_counts: dict[str, int], n_merges: int,
              min_count: int = 2) -> list[tuple[str, str, int]]:
    """O(n_merges * corpus) dict-of-tuples BPE — the published
    pseudocode with the same deterministic tie-break, used by tests to
    pin the distributed trainer's output."""
    words = {tuple(w) + (EOW,): c for w, c in word_counts.items()}
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for syms, c in words.items():
            for i in range(len(syms) - 1):
                pairs[syms[i], syms[i + 1]] = pairs.get(
                    (syms[i], syms[i + 1]), 0) + c
        if not pairs:
            break
        (ls, rs), cnt = min(pairs.items(),
                            key=lambda kv: (-kv[1], kv[0]))
        if cnt < min_count:
            break
        merges.append((ls, rs, cnt))
        nxt = {}
        for syms, c in words.items():
            out = []
            i = 0
            while i < len(syms):
                if (i + 1 < len(syms) and syms[i] == ls
                        and syms[i + 1] == rs):
                    out.append(ls + rs)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            nxt[tuple(out)] = c
        words = nxt
    return merges
