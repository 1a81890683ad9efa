"""Deterministic synthetic transcript corpus (FIXTURES.md F1/F2).

Generates the primary input table required by the north rule:

    (conv_id: string, turn_idx: int32, role: string,
     text: string, tool: string, ts: timestamp[us])

The ``text`` payload families mirror what the reference parses
(reference README.md:49-56, docs/settings/settings.yml head regexes,
docs/example/app/app.py formatted-vs-bare 50/50 mix): spring/bot pipe
format, cp dash format, spark slash-time format, geely colon-class
format, java-stacktrace continuation lines, decimal-comma base format,
and unparseable junk. Everything is seeded and vectorized (numpy +
pandas string ops); rows are globally shuffled so stable
(conv_id, turn_idx) ordering must be re-imposed downstream.

Corpora are cached under /tmp (never under /root/testdata) with a
metadata sidecar keyed by (generator version, n_turns, seed) and
written atomically (tmp dir + rename) so concurrent callers are safe.
"""

from __future__ import annotations

import io
import json
import os
import tempfile

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

GENERATOR_VERSION = 5  # v5: spring JSON tails gained a nested "ctx"
# object so the parser's arbitrary-key FlattenMap path (extra column)
# is exercised by real corpus data
# fixed text-generation chunk: file layout and RNG are decoupled from it,
# so corpus content depends only on (version, n_turns, seed)
GEN_CHUNK = 50_000
DEFAULT_SEED = 42
CACHE_ROOT = "/tmp/graft_transcripts"

SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("text", pa.string()),
        ("tool", pa.string()),
        ("ts", pa.timestamp("us")),
    ]
)

# row kinds (values stored in an int8 array)
K_SPRING = 0
K_SPRING_JSON = 1
K_CP = 2
K_BOT = 3
K_CONT = 4
K_JUNK = 5
K_SPARK = 6
K_SPARK_IGNORE = 7
K_AI = 8
K_BASE = 9
K_EDITOR = 10

_TOOLS = np.array(["", "bash", "search", "editor", "python"])
_TOOL_W = np.array([0.55, 0.15, 0.10, 0.05, 0.15])
_ROLES = np.array(["user", "assistant", "system", "tool"])

# per-tool kind distributions
_KINDS_BY_TOOL = {
    0: (np.array([K_SPRING, K_SPRING_JSON, K_CP, K_BOT, K_CONT, K_JUNK]),
        np.array([0.28, 0.08, 0.10, 0.09, 0.40, 0.05])),
    1: (np.array([K_SPARK, K_SPARK_IGNORE, K_JUNK]), np.array([0.75, 0.15, 0.10])),
    2: (np.array([K_AI, K_JUNK]), np.array([0.90, 0.10])),
    3: (np.array([K_EDITOR]), np.array([1.0])),
    4: (np.array([K_BASE, K_JUNK]), np.array([0.90, 0.10])),
}

_APPS = np.array(["websvc", "ordersvc", "paysvc", "cartsvc"])
_BOT_APPS = np.array(["ms_audit", "ms_notify", "ms_billing"])
_LEVELS = np.array(["INFO", "WARN", "ERROR", "DEBUG"])
_WORDS = np.array(
    "request done queued retry flushed opened closed commit rollback scan "
    "merge upload fetch decode encode route batch stream spill press".split()
)
_CONT_LINES = np.array(
    [
        "\tat com.example.myproject.Author.getBookIds(Author.java:38)",
        "\tat com.example.myproject.Bookstore.getInfo(Bookstore.java:16)",
        "Caused by: java.lang.NullPointerException",
        "    ... 12 more",
        "\tat com.example.web.Controller.handle(Controller.java:103)",
    ]
)

_BASE_TS_US = np.int64(pd.Timestamp("2024-01-01").value // 1000)
_TEN_YEARS_US = np.int64(315_576_000_000_000)  # ~10y in microseconds


def _conv_structure(n_turns: int, rng: np.random.Generator,
                    hot_frac: float = 0.0):
    """Zipf-skewed conversation sizes; returns (conv_idx, turn_idx) arrays.

    A few hot conversations get 100x the median turns (FIXTURES.md F1) to
    exercise skew handling in the concat shuffle. With ``hot_frac`` > 0,
    conversation 0 instead holds that fraction of ALL turns — the
    pathological one-conv-dominates corpus (SURVEY §4's million-turn
    conversation) used by the skew tests and tools/skew_bench.py.
    """
    sizes = []
    total = 0
    if hot_frac > 0:
        h = min(int(n_turns * hot_frac), n_turns - 1)
        sizes.append(h)
        total += h
    else:
        # a couple of deterministic hot convs first
        hot = max(200, n_turns // 50)
        for h in (hot, hot // 2):
            if total + h < n_turns:
                sizes.append(h)
                total += h
    while total < n_turns:
        s = int(1 + min(rng.pareto(1.3) * 4, 400))
        s = min(s, n_turns - total)
        sizes.append(s)
        total += s
    sizes = np.array(sizes, dtype=np.int64)
    conv_idx = np.repeat(np.arange(len(sizes)), sizes)
    turn_idx = np.concatenate([np.arange(s) for s in sizes]).astype(np.int32)
    return conv_idx, turn_idx


def _fmt_times(ts_us: np.ndarray) -> dict[str, np.ndarray]:
    """Millisecond-precision time strings in each family's format.

    np.datetime_as_string is ~30x faster than pandas strftime; the
    fixed-width ISO form is then rewritten with np.char.replace
    (':' never collides with date separators, '.' appears once).
    """
    iso = np.datetime_as_string(ts_us.astype("datetime64[us]").astype(
        "datetime64[ms]"))                      # YYYY-MM-DDTHH:MM:SS.mmm
    dash = np.char.replace(iso, "T", " ")
    return {
        "dash": dash.astype(object),
        "comma": np.char.replace(dash, ".", ",").astype(object),
        "slash": np.char.replace(dash, "-", "/").astype(object),
    }


def _build_text(kind, ts_us, rng: np.random.Generator) -> np.ndarray:
    n = len(kind)
    times = _fmt_times(ts_us)

    def pick(arr, size_hi=None, lo=None, hi=None):
        if arr is None:
            return pd.Series(rng.integers(lo, hi, n).astype(str), dtype=object)
        return pd.Series(arr[rng.integers(0, len(arr), n)], dtype=object)

    app = pick(_APPS)
    bot_app = pick(_BOT_APPS)
    level = pick(_LEVELS)
    thread = "http-nio-8080-exec-" + pick(None, lo=1, hi=32)
    lineno = pick(None, lo=1, hi=500)
    w1, w2, w3 = pick(_WORDS), pick(_WORDS), pick(_WORDS)
    msg = w1 + " " + w2 + " " + w3
    uuid = pick(None, lo=10**8, hi=10**9)
    code = pick(None, lo=200, hi=600)
    cont = pick(_CONT_LINES)

    s = pd.Series([""] * n, dtype=object)
    dash = pd.Series(times["dash"], dtype=object)
    comma = pd.Series(times["comma"], dtype=object)
    slash = pd.Series(times["slash"], dtype=object)

    def put(mask, value):
        if mask.any():
            s[mask] = value[mask] if hasattr(value, "__getitem__") else value

    cls = "com.example." + app + ".Service.handle"
    spring = (
        dash + " | " + app + " | " + level + " | " + thread + " | "
        + cls + " | " + lineno + ": " + msg
    )
    put(kind == K_SPRING, spring)
    # one nesting level in the tail exercises FlattenMap's "__" joining
    # (library/utils.go:75-85) through parse -> extra map column
    spring_json = (
        dash + " | " + app + " | " + level + " | " + thread + " | " + cls
        + " | " + lineno + ': ' + msg + ' {"user": "u' + uuid + '", "code": '
        + code + ', "ctx": {"ip": "10.0.0.' + lineno + '", "zone": "z'
        + code + '"}}'
    )
    put(kind == K_SPRING_JSON, spring_json)
    cp = (
        dash + " - ms:cp|type:platform|uuid:" + uuid + "|customerSid:" + code
        + "|msg:" + msg
    )
    put(kind == K_CP, cp)
    bot = (
        dash + " | " + bot_app + " | " + level + " | " + thread + " | "
        + "com.bot.Worker.run | " + lineno + ": " + msg
    )
    put(kind == K_BOT, bot)
    put(kind == K_CONT, cont)
    junk = w1 + w2 + " $$ " + uuid + " " + w3
    put(kind == K_JUNK, junk)
    put(kind == K_SPARK, slash + " " + msg + " executor=" + code)
    put(kind == K_SPARK_IGNORE, comma + " [stage " + code + "] heartbeat")
    ai = (
        dash + " | geely:nlcc | " + level + " | http-bio-8081-exec-3 | "
        + "com.ai.Handler.handleMessage:57 - Outbound Message: " + msg
    )
    put(kind == K_AI, ai)
    put(kind == K_BASE, "[" + comma + "] " + level + " base." + app + ": " + msg)
    put(kind == K_EDITOR, "edit op " + msg)
    return s.to_numpy(dtype=object)


def transcript_batches(n_turns: int, seed: int = DEFAULT_SEED,
                       chunk: int = GEN_CHUNK, hot_frac: float = 0.0):
    """Yield the corpus as pyarrow RecordBatches (deterministic for a seed)."""
    rng = np.random.default_rng(seed)
    conv_idx, turn_idx = _conv_structure(n_turns, rng, hot_frac)
    n = len(conv_idx)
    tool_i = rng.choice(len(_TOOLS), size=n, p=_TOOL_W)
    kind = np.empty(n, dtype=np.int8)
    for ti, (kinds, w) in _KINDS_BY_TOOL.items():
        m = tool_i == ti
        kind[m] = rng.choice(kinds, size=int(m.sum()), p=w)
    role = _ROLES[rng.integers(0, len(_ROLES), n)]
    ts_us = _BASE_TS_US + conv_idx * 67_000_000 + turn_idx.astype(np.int64) * 1_300_000
    late = rng.random(n) < 0.01  # outside the allowed window -> dropped
    ts_us = np.where(late, ts_us - _TEN_YEARS_US, ts_us)

    perm = rng.permutation(n)  # global shuffle: ordering must be re-imposed
    conv_idx, turn_idx, tool_i, kind, role, ts_us = (
        conv_idx[perm], turn_idx[perm], tool_i[perm], kind[perm], role[perm], ts_us[perm]
    )

    for lo in range(0, n, chunk):
        hi = min(lo + chunk, n)
        crng = np.random.default_rng((seed, 7919, lo))
        text = _build_text(kind[lo:hi], ts_us[lo:hi], crng)
        conv = np.char.add("conv-", np.char.zfill(conv_idx[lo:hi].astype(str), 8))
        yield pa.record_batch(
            [
                pa.array(conv, type=pa.string()),
                pa.array(turn_idx[lo:hi], type=pa.int32()),
                pa.array(role[lo:hi], type=pa.string()),
                pa.array(text, type=pa.string()),
                pa.array(_TOOLS[tool_i[lo:hi]], type=pa.string()),
                pa.array(ts_us[lo:hi], type=pa.timestamp("us")),
            ],
            schema=SCHEMA,
        )


def transcript_table(n_turns: int, seed: int = DEFAULT_SEED) -> pa.Table:
    return pa.Table.from_batches(transcript_batches(n_turns, seed), schema=SCHEMA)


def turns_for_sf_dir(sf_dir: str) -> int:
    """6M turns at sf=1, matching the testdata lineitem scaling."""
    name = os.path.basename(os.path.normpath(sf_dir))
    try:
        sf = float(name.replace("sf", ""))
    except ValueError:
        sf = 0.001
    return max(1000, int(6_000_000 * sf))


def ensure_corpus(n_turns: int, seed: int = DEFAULT_SEED) -> str:
    """Generate (once) and return the DIRECTORY of the cached corpus.

    Layout: {CACHE_ROOT}/v{V}-t{n}-s{seed}/part-{i:05d}.parquet — one
    file per GEN_CHUNK rows so reads parallelize (a single giant file
    reads serially; the real 100 TB corpus is likewise many shards).
    Written atomically via tmpdir+rename so parallel callers and killed
    runs never observe a partial corpus.
    """
    key = f"v{GENERATOR_VERSION}-t{n_turns}-s{seed}"
    return _write_transcript_corpus(key, n_turns, seed)


def ensure_skewed_corpus(n_turns: int, hot_frac: float = 0.2,
                         seed: int = DEFAULT_SEED) -> str:
    """Pathological-skew corpus: conv-00000000 holds ``hot_frac`` of
    ALL turns (SURVEY §4's million-turn conversation). Cached under its
    own key; same schema/generator as ensure_corpus otherwise."""
    key = (f"v{GENERATOR_VERSION}-skew{int(hot_frac * 100)}"
           f"-t{n_turns}-s{seed}")
    return _write_transcript_corpus(key, n_turns, seed, hot_frac)


def _write_transcript_corpus(key: str, n_turns: int, seed: int,
                             hot_frac: float = 0.0) -> str:
    d = os.path.join(CACHE_ROOT, key)
    meta = os.path.join(CACHE_ROOT, key + ".meta.json")  # sidecar: the dir
    # must contain ONLY parquet so directory reads work
    if os.path.exists(meta) and os.path.isdir(d):
        return d
    os.makedirs(CACHE_ROOT, exist_ok=True)
    tmp = tempfile.mkdtemp(dir=CACHE_ROOT, prefix=f".{key}-")
    for i, rb in enumerate(transcript_batches(n_turns, seed,
                                              hot_frac=hot_frac)):
        pq.write_table(pa.Table.from_batches([rb], schema=SCHEMA),
                       os.path.join(tmp, f"part-{i:05d}.parquet"),
                       compression="snappy")
    try:
        os.rename(tmp, d)
    except OSError:
        # another process won the race; use theirs
        if not os.path.isdir(d):
            raise
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)
    if not os.path.exists(meta):
        with open(meta, "w") as f:
            json.dump({"version": GENERATOR_VERSION, "n_turns": n_turns,
                       "seed": seed, "hot_frac": hot_frac}, f)
    return d


def corpus_for_sf_dir(sf_dir: str, seed: int = DEFAULT_SEED) -> str:
    return ensure_corpus(turns_for_sf_dir(sf_dir), seed)


# ---------------------------------------------------------------------------
# HTTP-ingest JSONL corpus (recvs/http.go semantics fixture)
# ---------------------------------------------------------------------------

from .sources.receivers import DEFAULT_SALT as HTTP_SALT  # noqa: E402
HTTP_CORPUS_VERSION = 1


def http_records(n: int, seed: int = DEFAULT_SEED) -> pd.DataFrame:
    """Deterministic signed-JSON ingest records: ~5% bad signature,
    ~3% malformed timestamp, ~4% outside the allowed window."""
    import hashlib

    rng = np.random.default_rng((seed, 424242))
    base = pd.Timestamp("2024-01-05")
    ts = base + pd.to_timedelta(rng.integers(0, 20 * 86400, n), unit="s")
    tstr = ts.strftime("%Y-%m-%dT%H:%M:%S").to_numpy(dtype=object)
    kind = rng.random(n)
    # malformed ts: append millis (fails the strict format regex)
    bad_fmt = kind < 0.03
    tstr[bad_fmt] = tstr[bad_fmt] + ".123"
    # out-of-window: push past window_max
    far = (kind >= 0.03) & (kind < 0.07)
    far_ts = (base + pd.Timedelta(days=400)
              + pd.to_timedelta(rng.integers(0, 86400, n), unit="s"))
    tstr[far] = far_ts.strftime("%Y-%m-%dT%H:%M:%S").to_numpy(dtype=object)[far]
    sig = np.array([hashlib.md5((t + HTTP_SALT).encode()).hexdigest()
                    for t in tstr], dtype=object)
    bad_sig = (kind >= 0.07) & (kind < 0.12)
    sig[bad_sig] = "deadbeef" + sig[bad_sig].astype(str).astype(object)
    w = _WORDS[rng.integers(0, len(_WORDS), n)]
    return pd.DataFrame({
        "rec_id": np.arange(n, dtype=np.int64),
        "tag": np.where(rng.random(n) < 0.5, "wechat.sit", "wechat.uat"),
        "timestamp": tstr,
        "sig": sig,
        "msg": pd.Series(w, dtype=object) + " payload",
        "lat": np.round(rng.uniform(-90, 90, n), 5),
        "lon": np.round(rng.uniform(-180, 180, n), 5),
    })


def _ensure_jsonl(key: str, version: int, n: int, seed: int, df_fn) -> str:
    """Atomically materialize a deterministic JSONL corpus under
    CACHE_ROOT/key (rename-into-place, meta sidecar marks completion)."""
    d = os.path.join(CACHE_ROOT, key)
    meta = os.path.join(CACHE_ROOT, key + ".meta.json")
    if os.path.exists(meta) and os.path.isdir(d):
        return d
    os.makedirs(CACHE_ROOT, exist_ok=True)
    tmp = tempfile.mkdtemp(dir=CACHE_ROOT, prefix=f".{key}-")
    df = df_fn(n, seed)
    chunk = 20_000
    for i in range(0, len(df), chunk):
        df.iloc[i:i + chunk].to_json(
            os.path.join(tmp, f"part-{i // chunk:05d}.json"),
            orient="records", lines=True)
    try:
        os.rename(tmp, d)
    except OSError:
        if not os.path.isdir(d):
            raise
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)
    if not os.path.exists(meta):
        with open(meta, "w") as f:
            json.dump({"version": version, "n": n, "seed": seed}, f)
    return d


def ensure_http_corpus(n: int, seed: int = DEFAULT_SEED) -> str:
    return _ensure_jsonl(f"http-v{HTTP_CORPUS_VERSION}-t{n}-s{seed}",
                         HTTP_CORPUS_VERSION, n, seed, http_records)


# ---------------------------------------------------------------------------
# rsyslog JSONL corpus (recvs/rsyslog.go semantics fixture)
# ---------------------------------------------------------------------------

RSYSLOG_CORPUS_VERSION = 1


def rsyslog_records(n: int, seed: int = DEFAULT_SEED) -> pd.DataFrame:
    """Deterministic syslog-shaped records: ISO timestamp string (with
    microseconds), msg under ``msg``, a ``lvl`` key to exercise
    rewrite_tags renames."""
    rng = np.random.default_rng((seed, 515151))
    base = pd.Timestamp("2024-01-05")
    ts = base + pd.to_timedelta(rng.integers(0, 10 * 86400 * 10**6, n),
                                unit="us")
    w = _WORDS[rng.integers(0, len(_WORDS), n)]
    levels = np.array(["info", "warn", "error", "debug"])
    return pd.DataFrame({
        "rec_id": np.arange(n, dtype=np.int64),
        "host": "emq-" + pd.Series(rng.integers(1, 9, n)).astype(str),
        "timestamp": ts.strftime("%Y-%m-%dT%H:%M:%S.%f").to_numpy(
            dtype=object),
        "lvl": levels[rng.integers(0, 4, n)],
        "msg": pd.Series(w, dtype=object) + " connected",
    })


def ensure_rsyslog_corpus(n: int, seed: int = DEFAULT_SEED) -> str:
    return _ensure_jsonl(f"rsyslog-v{RSYSLOG_CORPUS_VERSION}-t{n}-s{seed}",
                         RSYSLOG_CORPUS_VERSION, n, seed, rsyslog_records)


# ---------------------------------------------------------------------------
# kafka JSONL corpus (recvs/kafka.go dual-path fixture)
# ---------------------------------------------------------------------------

KAFKA_CORPUS_VERSION = 1


def kafka_records(n: int, seed: int = DEFAULT_SEED) -> pd.DataFrame:
    """Deterministic kafka record values: ~70% JSON objects (some with
    tag-from-key, some with missing fields), ~15% raw text, ~10%
    valid-but-non-object JSON, ~5% broken JSON — the dual parse paths of
    kafka.go:209-252."""
    rng = np.random.default_rng((seed, 616161))
    w = _WORDS[rng.integers(0, len(_WORDS), n)]
    kind = rng.random(n)
    vals = np.empty(n, dtype=object)
    apps = np.array(["paysvc", "ordersvc", "authsvc"])
    tags = np.array(["app.kafka.sit", "cp.kafka.sit"])
    for i in range(n):
        if kind[i] < 0.40:       # full object with tag key
            vals[i] = json.dumps({
                "log": f"{w[i]} handled", "tag": str(tags[i % 2]),
                "app": str(apps[i % 3]), "level": "INFO"})
        elif kind[i] < 0.55:     # object, no tag -> default tag
            vals[i] = json.dumps({"log": f"{w[i]} fallback",
                                  "app": str(apps[i % 3])})
        elif kind[i] < 0.62:     # object with non-string tag -> default
            vals[i] = json.dumps({"log": f"{w[i]} numtag", "tag": 7,
                                  "level": "WARN"})
        elif kind[i] < 0.70:     # object missing log -> null message
            vals[i] = json.dumps({"tag": str(tags[i % 2]), "level": "ERROR"})
        elif kind[i] < 0.85:     # raw text path
            vals[i] = f"raw {w[i]} line"
        elif kind[i] < 0.95:     # valid JSON, not an object -> raw path
            vals[i] = json.dumps([1, 2, int(kind[i] * 100)])
        else:                    # broken JSON -> raw path
            vals[i] = '{"log": "broken'
    return pd.DataFrame({
        "rec_id": np.arange(n, dtype=np.int64),
        "value": vals,
    })


def ensure_kafka_corpus(n: int, seed: int = DEFAULT_SEED) -> str:
    return _ensure_jsonl(f"kafka-v{KAFKA_CORPUS_VERSION}-t{n}-s{seed}",
                         KAFKA_CORPUS_VERSION, n, seed, kafka_records)


# ---------------------------------------------------------------------------
# fluentd-forward msgpack frame corpus (recvs/fluentd.go:209-342 fixture)
# ---------------------------------------------------------------------------

FLUENTD_CORPUS_VERSION = 1


def fluentd_frame_bytes(n: int, seed: int = DEFAULT_SEED) -> bytes:
    """One connection-stream's bytes: a deterministic mix of the three
    frame shapes (Forward / PackedForward / Message) totalling n
    records, plus a couple of malformed frames that must be discarded."""
    import msgpack

    rng = np.random.default_rng((seed, 717171))
    out = io.BytesIO()
    t0 = 1704412800  # 2024-01-05
    i = 0
    while i < n:
        shape = int(rng.integers(0, 3))
        tag = ["spring.sit", "spark.sit", "ai.sit"][int(rng.integers(0, 3))]
        k = min(int(rng.integers(1, 6)), n - i)
        recs = [{"log": f"line-{i + j} {int(rng.integers(0, 999))}",
                 "host": f"node-{int(rng.integers(1, 5))}",
                 "meta": {"dc": "dc1"}} for j in range(k)]
        if shape == 0:      # Forward
            out.write(msgpack.packb(
                [tag, [[t0 + i + j, recs[j]] for j in range(k)]]))
        elif shape == 1:    # PackedForward
            inner = b"".join(msgpack.packb([t0 + i + j, recs[j]])
                             for j in range(k))
            out.write(msgpack.packb([tag, inner]))
        else:               # Message (one record per frame)
            k = 1
            out.write(msgpack.packb([tag, t0 + i, recs[0]]))
        i += k
    # malformed frames: wrong arity / non-map record -> discarded
    out.write(msgpack.packb(["only-tag"]))
    out.write(msgpack.packb([42, 1, {"log": "bad tag"}]))
    out.write(msgpack.packb(["t", 1, "not-a-map"]))
    return out.getvalue()


def ensure_fluentd_corpus(n: int, seed: int = DEFAULT_SEED,
                          n_files: int = 4) -> str:
    key = f"fluentd-v{FLUENTD_CORPUS_VERSION}-t{n}-s{seed}"
    d = os.path.join(CACHE_ROOT, key)
    meta = os.path.join(CACHE_ROOT, key + ".meta.json")
    if os.path.exists(meta) and os.path.isdir(d):
        return d
    os.makedirs(CACHE_ROOT, exist_ok=True)
    tmp = tempfile.mkdtemp(dir=CACHE_ROOT, prefix=f".{key}-")
    per = max(1, n // n_files)
    for f_i in range(n_files):
        cnt = per if f_i < n_files - 1 else n - per * (n_files - 1)
        with open(os.path.join(tmp, f"conn-{f_i:03d}.msgpack"), "wb") as f:
            f.write(fluentd_frame_bytes(cnt, seed + f_i))
    try:
        os.rename(tmp, d)
    except OSError:
        if not os.path.isdir(d):
            raise
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)
    if not os.path.exists(meta):
        with open(meta, "w") as f:
            json.dump({"version": FLUENTD_CORPUS_VERSION, "n": n,
                       "seed": seed}, f)
    return d


# ---------------------------------------------------------------------------
# fluentd-forward frames CARRYING TRANSCRIPT ROWS (the composed
# frames -> concat -> parse pipeline fixture, recvs/fluentd.go:399-544:
# the reference's in-connection concatenator feeding the tag pipeline)
# ---------------------------------------------------------------------------

FLUENTD_TRANSCRIPT_VERSION = 1


def _transcript_frames_for_part(tbl: pa.Table, seed: int) -> bytes:
    """Pack one transcript parquet part into a deterministic mix of the
    three fluentd-forward frame shapes; each record carries the turn's
    columns (text under the msg_key 'log', ts as epoch micros so the
    round-trip is exact)."""
    import msgpack

    rng = np.random.default_rng((seed, 31337))
    conv = tbl["conv_id"].to_pylist()
    turn = tbl["turn_idx"].to_pylist()
    role = tbl["role"].to_pylist()
    text = tbl["text"].to_pylist()
    tool = tbl["tool"].to_pylist()
    ts_us = tbl["ts"].cast(pa.int64()).to_pylist()
    out = io.BytesIO()
    n = tbl.num_rows
    i = 0
    while i < n:
        shape = int(rng.integers(0, 3))
        k = min(int(rng.integers(1, 6)), n - i)
        recs = [{"log": text[i + j], "conv_id": conv[i + j],
                 "turn_idx": turn[i + j], "role": role[i + j],
                 "tool": tool[i + j], "ts_us": ts_us[i + j]}
                for j in range(k)]
        times = [ts_us[i + j] // 1_000_000 for j in range(k)]
        tag = "transcripts.sit"
        if shape == 0:      # Forward
            out.write(msgpack.packb(
                [tag, [[times[j], recs[j]] for j in range(k)]]))
        elif shape == 1:    # PackedForward
            inner = b"".join(msgpack.packb([times[j], recs[j]])
                             for j in range(k))
            out.write(msgpack.packb([tag, inner]))
        else:               # Message (one record per frame)
            k = 1
            out.write(msgpack.packb([tag, times[0], recs[0]]))
        i += k
    return out.getvalue()


def ensure_fluentd_transcript_corpus(n_turns: int,
                                     seed: int = DEFAULT_SEED) -> str:
    """msgpack frame files (one per transcript corpus part) whose
    records are the transcript rows — the input of the composed
    fluentd_pipeline query."""
    key = (f"fluentd-tr-v{FLUENTD_TRANSCRIPT_VERSION}"
           f"-g{GENERATOR_VERSION}-t{n_turns}-s{seed}")
    d = os.path.join(CACHE_ROOT, key)
    meta = os.path.join(CACHE_ROOT, key + ".meta.json")
    if os.path.exists(meta) and os.path.isdir(d):
        return d
    corpus = ensure_corpus(n_turns, seed)
    os.makedirs(CACHE_ROOT, exist_ok=True)
    tmp = tempfile.mkdtemp(dir=CACHE_ROOT, prefix=f".{key}-")
    parts = sorted(f for f in os.listdir(corpus) if f.endswith(".parquet"))
    for i, name in enumerate(parts):
        tbl = pq.read_table(os.path.join(corpus, name))
        with open(os.path.join(tmp, f"conn-{i:05d}.msgpack"), "wb") as f:
            f.write(_transcript_frames_for_part(tbl, seed + i))
    try:
        os.rename(tmp, d)
    except OSError:
        if not os.path.isdir(d):
            raise
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)
    if not os.path.exists(meta):
        with open(meta, "w") as f:
            json.dump({"version": FLUENTD_TRANSCRIPT_VERSION,
                       "n_turns": n_turns, "seed": seed}, f)
    return d


def ensure_fluentd_decoded(n_turns: int, seed: int = DEFAULT_SEED) -> str:
    """The frame corpus decoded back to transcript-schema parquet (pure
    local decode, no Ray) — the table the SQL oracle reads, so the
    post-decode stages (acceptor/concat/parse/enrich/route) are
    oracle-checked end to end; the msgpack decode itself is covered by
    pytest round-trips (DuckDB cannot read msgpack)."""
    from .sources.fluentd_frames import transcripts_from_stream

    key = (f"fluentd-dec-v{FLUENTD_TRANSCRIPT_VERSION}"
           f"-g{GENERATOR_VERSION}-t{n_turns}-s{seed}")
    d = os.path.join(CACHE_ROOT, key)
    meta = os.path.join(CACHE_ROOT, key + ".meta.json")
    if os.path.exists(meta) and os.path.isdir(d):
        return d
    frames = ensure_fluentd_transcript_corpus(n_turns, seed)
    os.makedirs(CACHE_ROOT, exist_ok=True)
    tmp = tempfile.mkdtemp(dir=CACHE_ROOT, prefix=f".{key}-")
    parts = sorted(f for f in os.listdir(frames) if f.endswith(".msgpack"))
    for i, name in enumerate(parts):
        with open(os.path.join(frames, name), "rb") as f:
            tbl = transcripts_from_stream(f.read())
        pq.write_table(tbl, os.path.join(tmp, f"part-{i:05d}.parquet"),
                       compression="snappy")
    try:
        os.rename(tmp, d)
    except OSError:
        if not os.path.isdir(d):
            raise
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)
    if not os.path.exists(meta):
        with open(meta, "w") as f:
            json.dump({"version": FLUENTD_TRANSCRIPT_VERSION,
                       "n_turns": n_turns, "seed": seed}, f)
    return d


MULTILINE_DOCS_VERSION = 1

# Boilerplate pool: lines a crawled-web corpus repeats across pages
# (cookie banners, footers, share bars) — the target of the C4/CCNet
# repeated-line removal pass. All synthetic.
_BOILERPLATE_LINES = [
    "subscribe to our newsletter for weekly updates",
    "all rights reserved copyright notice",
    "click here to read the full article",
    "share this page on social media",
    "accept cookies to continue browsing",
    "sign in to leave a comment",
    "related articles you may have missed",
    "back to top of page",
]

_LINE_VOCAB = [
    "key", "agg", "row", "scan", "slow", "fast", "table", "value", "part",
    "hash", "merge", "batch", "spark", "line", "sort", "window", "stream",
    "query", "data", "column", "join", "small", "big", "filter", "group",
    "order", "vector", "customer", "the", "a",
]


def docs_for_sf_dir(sf_dir: str) -> int:
    """50k multiline docs at sf=1 (matches the documents-table scaling:
    500 docs at sf0.01)."""
    name = os.path.basename(os.path.normpath(sf_dir))
    try:
        sf = float(name.replace("sf", ""))
    except ValueError:
        sf = 0.001
    return max(50, int(50_000 * sf))


def multiline_doc_table(n_docs: int, seed: int = DEFAULT_SEED) -> pa.Table:
    """Deterministic multi-line documents: 4-9 unique-ish content lines
    (random vocab words) interleaved with 0-3 boilerplate lines drawn
    from the shared pool (so boilerplate crosses the min_count bar while
    content lines stay below it), plus occasional empty lines (which the
    dedup contract always preserves)."""
    rng = np.random.default_rng(seed + 7_001)
    vocab = np.array(_LINE_VOCAB)
    bp = _BOILERPLATE_LINES
    texts = []
    for i in range(n_docs):
        n_content = int(rng.integers(4, 10))
        lines = [" ".join(vocab[rng.integers(0, len(vocab), size=rng.integers(4, 9))])
                 for _ in range(n_content)]
        for _ in range(int(rng.integers(0, 4))):
            pos = int(rng.integers(0, len(lines) + 1))
            lines.insert(pos, bp[int(rng.integers(0, len(bp)))])
        if rng.random() < 0.15:  # occasional blank separator line
            lines.insert(int(rng.integers(0, len(lines) + 1)), "")
        texts.append("\n".join(lines))
    return pa.table({
        "doc_id": pa.array(np.arange(n_docs, dtype=np.int64)),
        "text": pa.array(texts, type=pa.string()),
    })


def ensure_multiline_docs(n_docs: int, seed: int = DEFAULT_SEED) -> str:
    """Cached parquet DIRECTORY of the multiline doc corpus (several
    parts so reads parallelize), written atomically like ensure_corpus.
    The line_dedup SQL twin reads the same path."""
    key = f"mldocs-v{MULTILINE_DOCS_VERSION}-d{n_docs}-s{seed}"
    d = os.path.join(CACHE_ROOT, key)
    meta = os.path.join(CACHE_ROOT, key + ".meta.json")
    if os.path.exists(meta) and os.path.isdir(d):
        return d
    os.makedirs(CACHE_ROOT, exist_ok=True)
    tmp = tempfile.mkdtemp(dir=CACHE_ROOT, prefix=f".{key}-")
    tbl = multiline_doc_table(n_docs, seed)
    n_parts = min(8, max(1, n_docs // 500))
    step = -(-n_docs // n_parts)
    for i in range(n_parts):
        pq.write_table(tbl.slice(i * step, step),
                       os.path.join(tmp, f"part-{i:05d}.parquet"),
                       compression="snappy")
    try:
        os.rename(tmp, d)
    except OSError:
        if not os.path.isdir(d):
            raise
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)
    if not os.path.exists(meta):
        with open(meta, "w") as f:
            json.dump({"version": MULTILINE_DOCS_VERSION, "n_docs": n_docs,
                       "seed": seed}, f)
    return d
