"""Property-based parity: random transcript tables through the pure
in-memory pipeline chain must equal the row-by-row oracle, for ANY
input — not just the seeded corpus. Runs without Ray (the same stage
functions the distributed pipeline uses)."""

import pandas as pd
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from go_fluentd_ray import oracle
from go_fluentd_ray.pipelines import flagship
from go_fluentd_ray.synth import SCHEMA

HEAD_TIMES = ["2024-01-01 10:00:00.123", "2023-06-30 23:59:59.999"]

TEXTS = st.one_of(
    st.sampled_from([
        "2024-01-01 10:00:00.123 | app | INFO | th | com.x.Y | 7: hello",
        "2024-01-01 10:00:00.123 | ms_audit | WARN | th | com.b.W | 9: w",
        "2024-01-01 10:00:00.123 - ms:cp|type:platform|uuid:1|msg:x",
        "2024/01/01 10:00:00.123 spark line",
        "2024-01-01 10:00:00,123 [stage 1] heartbeat",
        "2024-01-01 10:00:00.123 | geely:nlcc | INFO | t | com.a.H:5 - m",
        "[2024-01-01 10:00:00,123] INFO base.app: msg",
        "\tat com.example.Foo.bar(Foo.java:1)",
        "Caused by: java.lang.RuntimeException",
        'x {"user": "u1", "code": 7}',
        "",
        "   ",
    ]),
    st.text(max_size=40),
)

ROW = st.fixed_dictionaries({
    "conv": st.integers(0, 3),
    "turn": st.integers(0, 30),
    "role": st.sampled_from(["user", "assistant", "system", "tool"]),
    "text": TEXTS,
    "tool": st.sampled_from(["", "bash", "search", "editor", "python"]),
    "ts": st.sampled_from(["2024-01-05 00:00:00", "1990-01-01 00:00:00",
                           "2029-12-31 00:00:00", "2031-06-01 00:00:00"]),
})


def _to_table(rows) -> pa.Table:
    # unique (conv, turn): ordering within a conv must be well-defined
    seen = set()
    uniq = []
    for r in rows:
        key = (r["conv"], r["turn"])
        if key not in seen:
            seen.add(key)
            uniq.append(r)
    return pa.table({
        "conv_id": pa.array([f"conv-{r['conv']:04d}" for r in uniq]),
        "turn_idx": pa.array([r["turn"] for r in uniq], pa.int32()),
        "role": pa.array([r["role"] for r in uniq]),
        "text": pa.array([r["text"] for r in uniq]),
        "tool": pa.array([r["tool"] for r in uniq]),
        "ts": pa.array([pd.Timestamp(r["ts"]) for r in uniq],
                       pa.timestamp("us")),
    }, schema=SCHEMA)


@settings(max_examples=60, deadline=None)
@given(st.lists(ROW, min_size=0, max_size=60))
def test_pipeline_equals_oracle(rows):
    table = _to_table(rows)
    got = flagship.run_local(table)
    want, _ = oracle.run_oracle(table)
    assert got.num_rows == want.num_rows
    if got.num_rows:
        assert got.equals(want), (
            got.to_pandas().compare(want.to_pandas())
            if got.num_rows == want.num_rows else "row mismatch")


def _parity(cfg, n=4000):
    from go_fluentd_ray.synth import transcript_table

    t = transcript_table(n)
    got = flagship.run_local(t, cfg)
    want, _ = oracle.run_oracle(t, cfg)
    assert got.num_rows == want.num_rows
    assert got.equals(want)
    return got


def test_parity_no_concat_config():
    from go_fluentd_ray.config import PipelineConfig

    out = _parity(PipelineConfig(concat={}))
    assert (out["n_merged"].to_pandas() == 1).all()


def test_parity_multichar_joiner_with_overflow():
    """jlen=2 joiner + tiny max_length exercises the vectorized overflow
    arithmetic against the oracle's append-then-check loop."""
    from go_fluentd_ray.config import ConcatCfg, PipelineConfig

    base = oracle.DEFAULT_CONFIG.concat["app.spring.sit"]
    cfg = PipelineConfig(concat={
        "app.spring.sit": ConcatCfg(head_regex=base.head_regex,
                                    max_length=150, joiner="~~"),
        "bot.sit": ConcatCfg(head_regex=base.head_regex,
                             max_length=150, joiner="~~"),
    })
    out = _parity(cfg)
    joined = out.to_pandas()["text"].str.contains("~~", regex=False)
    assert joined.any()  # the joiner actually fired


def test_parity_per_tag_joiners():
    """Two concat tags with DIFFERENT joiners (ConcatorFactCfg is
    per-tag config): the vectorized per-tag-slice join must equal the
    oracle's per-tag loop."""
    from go_fluentd_ray.config import ConcatCfg, PipelineConfig

    base = oracle.DEFAULT_CONFIG.concat["app.spring.sit"]
    cfg = PipelineConfig(concat={
        "app.spring.sit": ConcatCfg(head_regex=base.head_regex,
                                    max_length=8192, joiner=" || "),
        "bot.sit": ConcatCfg(head_regex=base.head_regex,
                             max_length=8192, joiner="\t"),
    })
    out = _parity(cfg)
    df = out.to_pandas()
    spring = df[df["tag"] == "app.spring.sit"]
    assert spring["text"].str.contains(" || ", regex=False).any()

    # hand case where BOTH tags genuinely merge (the synth corpus's
    # per-line retag means bot.sit never receives continuation lines)
    from go_fluentd_ray.stages.concat import concat_bucket

    head = "2024-01-01 00:00:00.123 | h"
    hand = pd.DataFrame({
        "conv_id": ["c"] * 4,
        "turn_idx": [0, 1, 2, 3],
        "role": ["user"] * 4, "tool": [""] * 4,
        "ts": [pd.Timestamp("2024-06-01")] * 4,
        "tag": ["app.spring.sit", "app.spring.sit", "bot.sit", "bot.sit"],
        "text": [head, "contA", head, "contB"],
        "is_head": [True, False, True, False],
    })
    got = concat_bucket(hand, cfg)
    texts = sorted(got["text"].to_pylist())
    assert texts == sorted([head + " || contA", head + "\tcontB"])


# --------------------------------------------------- convmine kernel property

_CONV = st.sampled_from(["a", "b", "c"])
_ROLE = st.sampled_from(["user", "assistant", "tool"])
_TEXT = st.text(alphabet="xyz \n", min_size=0, max_size=6)
_TURN = st.tuples(_CONV, _ROLE, _TEXT)


def _frame(rows):
    import numpy as np
    import pandas as pd

    df = pd.DataFrame(rows, columns=["conv_id", "role", "text"])
    df["turn_idx"] = df.groupby("conv_id").cumcount().astype(np.int64)
    return (df.sort_values(["conv_id", "turn_idx"], kind="mergesort",
                           ignore_index=True)
            [["conv_id", "turn_idx", "role", "text"]])


@settings(max_examples=60, deadline=None)
@given(st.lists(_TURN, min_size=0, max_size=40), st.integers(1, 5))
def test_sft_kernel_matches_naive_reference(rows, k):
    """The gather+join kernel must equal the obvious per-row loop."""
    from go_fluentd_ray.functions.convmine import sft_kernel

    df = _frame(rows)
    got = sft_kernel(df.copy(), k).reset_index(drop=True)

    expected = []
    for conv, grp in df.groupby("conv_id", sort=False):
        lines = [f"{r}: {t}" for r, t in zip(grp["role"], grp["text"])]
        for i, (_, row) in enumerate(grp.iterrows()):
            if row["role"] != "assistant":
                continue
            ctx = "\n".join(lines[max(0, i - k):i])
            expected.append((conv, row["turn_idx"], min(i, k), ctx,
                             row["text"]))
    assert len(got) == len(expected)
    for j, (conv, ti, nctx, ctx, resp) in enumerate(expected):
        r = got.iloc[j]
        assert (r["conv_id"], r["turn_idx"],
                r["n_context_turns"]) == (conv, ti, nctx)
        assert r["context"] == ctx
        assert r["response"] == resp


@settings(max_examples=60, deadline=None)
@given(st.lists(_TURN, min_size=1, max_size=40))
def test_collapse_and_loop_match_naive_runs(rows):
    """Gaps-and-islands run detection (collapse_repeats / loop_detect)
    must equal itertools.groupby over (role, text) per conversation."""
    import itertools

    import ray.data as rd

    from go_fluentd_ray.functions.convmine import loop_detect
    from go_fluentd_ray.functions.logops import collapse_repeats

    df = _frame(rows)
    collapsed = (collapse_repeats(rd.from_pandas(df))
                 .to_pandas()
                 .sort_values(["conv_id", "turn_idx"],
                              ignore_index=True))
    loops = loop_detect(rd.from_pandas(df)).to_pandas().set_index(
        "conv_id")

    exp_rows = []
    exp_max = {}
    for conv, grp in df.groupby("conv_id", sort=False):
        runs = [(key, len(list(g))) for key, g in itertools.groupby(
            zip(grp["role"], grp["text"]))]
        exp_max[conv] = max(n for _, n in runs)
        i = 0
        turn_idx = grp["turn_idx"].tolist()
        for (role, text), n in runs:
            exp_rows.append((conv, turn_idx[i], role, text, n))
            i += n
    assert len(collapsed) == len(exp_rows)
    for j, (conv, ti, role, text, n) in enumerate(exp_rows):
        r = collapsed.iloc[j]
        assert (r["conv_id"], r["turn_idx"], r["role"],
                r["text"], r["n_repeats"]) == (conv, ti, role, text, n)
    for conv, mx in exp_max.items():
        assert loops.loc[conv, "max_run"] == mx


@settings(max_examples=80, deadline=None)
@given(st.lists(st.text(max_size=60), min_size=0, max_size=20),
       st.sampled_from([16, 64, 256]))
def test_hash_embed_properties(texts, dim):
    """Feature-hash embedder invariants on ARBITRARY text: shape,
    determinism, unit (or exactly-zero) norm, and batch-composition
    independence (a row's vector can't depend on its batch-mates)."""
    import numpy as np

    from go_fluentd_ray.functions.embed import hash_embed

    E = hash_embed(texts, dim)
    assert E.shape == (len(texts), dim) and E.dtype == np.float32
    np.testing.assert_array_equal(E, hash_embed(texts, dim))
    norms = np.linalg.norm(E, axis=1)
    for n in norms:
        assert abs(n - 1.0) < 1e-4 or n == 0.0
    for i, t in enumerate(texts):  # row-independence
        np.testing.assert_array_equal(E[i], hash_embed([t], dim)[0])


@settings(max_examples=12, deadline=None)
@given(st.lists(st.lists(st.sampled_from(["aa", "bb", "cc", "dd"]),
                         min_size=0, max_size=8),
                min_size=1, max_size=25))
def test_bigram_pmi_and_drift_match_sql_on_random_corpora(docs):
    """Random small corpora through bigram_pmi, corpus_drift and
    drift_topk must equal their DuckDB twins — tokenize/count/round
    parity beyond the seeded fixture."""
    import duckdb
    import numpy as np
    import ray.data as rd

    from go_fluentd_ray.functions import drift, ngrams

    df = pd.DataFrame({
        "doc_id": np.arange(len(docs), dtype=np.int64),
        "text": [" ".join(words) for words in docs]})
    con = duckdb.connect()
    con.register("documents", df)
    ds = rd.from_pandas(df)

    got = ngrams.bigram_pmi(ds, k=10, min_count=2).reset_index(drop=True)
    want = con.execute(ngrams.bigram_pmi_sql(k=10, min_count=2)).df()
    want["n"] = want["n"].astype("int64")
    pd.testing.assert_frame_equal(got, want)

    gd = drift.corpus_drift(ds)
    wd = con.execute(drift.corpus_drift_sql()).df()
    for c in gd.columns:
        assert gd.iloc[0][c] == wd.iloc[0][c], c

    gt = drift.drift_topk(ds, k=5).reset_index(drop=True)
    wt = con.execute(drift.drift_topk_sql(k=5)).df()
    for c in ("n_a", "n_b"):
        wt[c] = wt[c].astype("int64")
    pd.testing.assert_frame_equal(gt, wt)


BPE_WORD = st.text(alphabet="abc", min_size=1, max_size=10)
BPE_WORDS = st.dictionaries(BPE_WORD, st.integers(1, 9),
                            min_size=1, max_size=30)


@settings(max_examples=80, deadline=None)
@given(BPE_WORDS, st.integers(1, 30))
def test_bpedelta_kernel_matches_naive(word_counts, n_merges):
    """The delta-counting BPE kernel (linked-list arena + windowed
    deltas + lazy pair index) must reproduce the published naive
    algorithm for ANY word table — the 3-letter alphabet forces heavy
    pair overlap, self-pair runs ('aaa…'), shared affixes and chained
    merges, exactly the cases where windowed delta accounting can go
    wrong. Pure kernel, no Ray."""
    import numpy as np

    from go_fluentd_ray.functions import bpedelta, bpetrain

    want = bpetrain.naive_bpe(word_counts, n_merges, min_count=1)

    words = np.asarray(sorted(word_counts), dtype=object)
    counts = np.array([word_counts[w] for w in words], dtype=np.int64)
    alphabet = sorted(set("".join(words)))
    vocab = alphabet + [bpetrain.EOW]
    char_ids = {c: i for i, c in enumerate(alphabet)}
    syms, wid = bpetrain._explode(words, char_ids, len(vocab) - 1)
    state = bpedelta.ChunkState(syms, wid, counts)
    gc = bpedelta.GlobalPairCounts()
    gc.fold(*state.initial_counts())
    got = []
    for _ in range(n_merges):
        best = gc.best(vocab, 1)
        if best is None:
            break
        li, ri, ls, rs, cnt = best
        new_id = len(vocab)
        vocab.append(ls + rs)
        got.append((ls, rs, cnt))
        gc.fold(*state.apply(li, ri, new_id))
    assert got == want, (got, want)
