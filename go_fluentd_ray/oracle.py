"""Pure-Python row-by-row oracle for the flagship transcript pipeline.

This module is the *semantic contract*: a direct, unoptimized
reimplementation of the reference's per-message behavior
(window filter -> ingress tag -> spark ignore -> spring retag ->
accept filter -> per-tag multi-line concat -> named-group regex parse
(+ embedded JSON + timestamp normalization) -> enrich -> truncate ->
sink routing). The Ray Data pipeline in pipelines/flagship.py must
produce byte-identical output (sorted by conv_id, turn_idx).

Reference semantics mirrored (file:line into /root/reference):
  - window check:        recvs/http.go:133-150
  - spark ignore:        acceptorfilters/spark_f.go:44-68
  - spring retag:        acceptorfilters/spring_f.go:79-107 (first match wins)
  - accept whitelist:    acceptorfilters/default_f.go:64-79
  - concat:              tagfilters/concator_f.go:151-206 (head starts new
                         record; non-head appends; flush when max_length
                         exceeded; order = turn_idx within (tag, conv_id))
  - parse:               tagfilters/parser_f.go:56-172 (+ RegexNamedSubMatch
                         library/utils.go:60-73: TrimSpace, empty group omitted,
                         non-match row discarded)
  - embedded JSON:       parser_f.go:74-107 (failed parse keeps raw)
  - time normalize:      parser_f.go:121-168 (','->'.' fix at :147)
  - enrich (AddCfg):     library/add.go:60-147, 182-205
  - truncation:          postfilters/default_f.go:72-83
  - sink routing:        postfilters/es_sender_dispatcher.go:51-73 +
                         senders/elasticsearch.go:111-132
"""

from __future__ import annotations

import json
import re
from datetime import datetime

import pandas as pd
import pyarrow as pa

from .config import DEFAULT_CONFIG, PipelineConfig
from .functions.jsonutil import flatten_obj

# fixed output column order (the Ray pipeline emits the same)
OUTPUT_COLUMNS = [
    "conv_id", "turn_idx", "role", "tool", "ts", "tag", "sink",
    "n_merged", "merged_turns", "text", "time", "@timestamp",
    "app", "level", "thread", "class_name", "line", "message", "project",
    "json_user", "json_code", "extra", "datasource", "rowkey", "level_lower",
]

OUTPUT_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("tool", pa.string()),
        ("ts", pa.timestamp("us")),
        ("tag", pa.string()),
        ("sink", pa.string()),
        ("n_merged", pa.int32()),
        ("merged_turns", pa.list_(pa.int32())),
        ("text", pa.string()),
        ("time", pa.string()),
        ("@timestamp", pa.string()),
        ("app", pa.string()),
        ("level", pa.string()),
        ("thread", pa.string()),
        ("class_name", pa.string()),
        ("line", pa.string()),
        ("message", pa.string()),
        ("project", pa.string()),
        ("json_user", pa.string()),
        ("json_code", pa.int64()),
        # ALL flattened embedded-JSON keys ("__"-joined nesting,
        # FlattenMap library/utils.go:75-85 via parser_f.go:74-109);
        # json_user/json_code above are typed lifts of two of them
        ("extra", pa.map_(pa.string(), pa.string())),
        ("datasource", pa.string()),
        ("rowkey", pa.string()),
        ("level_lower", pa.string()),
    ]
)

PARSE_GROUP_COLS = ["time", "app", "level", "thread", "class_name", "line",
                    "message", "project"]

_JSON_TAIL = re.compile(r"\{.*\}\s*$", re.S)


def _interp(value: str, row: dict, tag: str) -> str:
    """AddCfg value interpolation (library/add.go:60-147, simplified to the
    forms the config uses: %{key}, %{@tag}, %{@lower:key}, %{@upper:key})."""
    def sub(m: re.Match) -> str:
        expr = m.group(1)
        if expr == "@tag":
            return tag
        if expr.startswith("@lower:"):
            v = row.get(expr[7:])
            return str(v).lower() if v is not None else ""
        if expr.startswith("@upper:"):
            v = row.get(expr[7:])
            return str(v).upper() if v is not None else ""
        if expr.startswith("@unixof:"):
            # row's timestamp column as epoch seconds
            # (custom_bigdata.go:60-70); unparsable/missing -> ''
            v = row.get(expr[8:])
            if v is None:
                return ""
            t = pd.to_datetime(v, utc=True, errors="coerce")
            if pd.isna(t):
                return ""
            t = t.tz_localize(None)
            return str(int((t - pd.Timestamp("1970-01-01")).total_seconds()))
        v = row.get(expr)
        return str(v) if v is not None else ""

    return re.sub(r"%\{([^}]+)\}", sub, value)


def run_oracle(table: pa.Table, cfg: PipelineConfig = DEFAULT_CONFIG):
    """Run the full pipeline row-by-row.

    Returns (output: pa.Table sorted by (conv_id, turn_idx),
             discards: dict[reason, count]).
    """
    df = table.to_pandas()
    discards = {
        "window": 0, "spark_ignore": 0, "unknown_tag": 0,
        "regex_nonmatch": 0, "must_include": 0, "time_parse": 0,
    }

    win_lo = pd.Timestamp(cfg.window_min_ts)
    win_hi = pd.Timestamp(cfg.window_max_ts)
    spark_ignore = re.compile(cfg.spark_ignore_regex)
    retag_rules = [(re.compile(r.regex), r.new_tag) for r in cfg.retag_rules]
    heads = {t: re.compile(c.head_regex) for t, c in cfg.concat.items()}
    parsers = {t: (re.compile(p.pattern), p) for t, p in cfg.parsers.items()}

    rows = []
    for r in df.itertuples(index=False):
        ts = r.ts
        if not (win_lo <= ts <= win_hi):
            discards["window"] += 1
            continue
        tag = cfg.ingress_tags.get(r.tool)
        if tag == cfg.spark_tag and spark_ignore.search(r.text):
            discards["spark_ignore"] += 1
            continue
        if tag == cfg.spring_tag:
            for pat, new_tag in retag_rules:
                if pat.search(r.text):
                    tag = new_tag
                    break
        if tag not in cfg.accept_tags:
            discards["unknown_tag"] += 1
            continue
        rows.append({
            "conv_id": r.conv_id, "turn_idx": int(r.turn_idx), "role": r.role,
            "tool": r.tool, "ts": ts, "tag": tag, "text": r.text,
            "merged_turns": [int(r.turn_idx)],
        })

    # ---- concat: per (tag, conv_id), ordered by turn_idx -------------------
    rows.sort(key=lambda x: (x["tag"], x["conv_id"], x["turn_idx"]))
    out_rows = []
    i = 0
    while i < len(rows):
        j = i
        tag, conv = rows[i]["tag"], rows[i]["conv_id"]
        while j < len(rows) and rows[j]["tag"] == tag and rows[j]["conv_id"] == conv:
            j += 1
        group = rows[i:j]
        i = j
        head = heads.get(tag)
        if head is None:
            out_rows.extend(group)
            continue
        ccfg = cfg.concat[tag]
        pending = None
        for row in group:
            if head.search(row["text"]):
                if pending is not None:
                    out_rows.append(pending)
                pending = row
                pending["_clen"] = len(row["text"])
            elif pending is None:
                out_rows.append(row)
            else:
                pending["text"] = pending["text"] + ccfg.joiner + row["text"]
                pending["_clen"] += len(row["text"])
                pending["merged_turns"] = pending["merged_turns"] + [row["turn_idx"]]
                # flush at CONTENT length >= max_length — no joiner
                # bytes counted (concator_f.go:196-201; its '\n' append
                # is commented out)
                if pending["_clen"] >= ccfg.max_length:
                    out_rows.append(pending)
                    pending = None
        if pending is not None:
            out_rows.append(pending)

    # ---- parse + time normalize + embedded JSON ----------------------------
    parsed = []
    for row in out_rows:
        if row["tag"] not in parsers:
            # no parser for this tag -> bypass unparsed
            # (tagfilters/pipeline.go:88-91)
            for col in PARSE_GROUP_COLS:
                row[col] = None
            row["@timestamp"] = None
            row["json_user"] = None
            row["json_code"] = None
            row["extra"] = None
            parsed.append(row)
            continue
        pat, pcfg = parsers[row["tag"]]
        m = pat.search(row["text"])
        if m is None:
            discards["regex_nonmatch"] += 1
            continue
        for col in PARSE_GROUP_COLS:
            row[col] = None
        for k, v in m.groupdict().items():
            v = v.strip() if v is not None else None
            row[k] = v if v else None  # empty after trim -> omitted
        if pcfg.must_include and row.get(pcfg.must_include) is None:
            discards["must_include"] += 1
            continue
        tval = row.get(pcfg.time_group)
        if tval is None:
            discards["time_parse"] += 1
            continue
        try:
            dt = datetime.strptime(tval.replace(",", "."), pcfg.time_format)
        except ValueError:
            discards["time_parse"] += 1
            continue
        row["@timestamp"] = dt.strftime(pcfg.new_time_format)
        row["json_user"] = None
        row["json_code"] = None
        row["extra"] = None
        if pcfg.json_group and row.get(pcfg.json_group):
            jm = _JSON_TAIL.search(row[pcfg.json_group])
            if jm:
                try:
                    obj = json.loads(jm.group(0))
                except ValueError:
                    obj = None  # failed parse keeps raw (parser_f.go:96-100)
                if isinstance(obj, dict):
                    # every key flattened into the extra map
                    # (FlattenMap, utils.go:75-85); user/code lifted as
                    # typed columns after
                    row["extra"] = list(flatten_obj(obj).items())
                    try:
                        u, c = obj.get("user"), obj.get("code")
                        if u is not None:
                            row["json_user"] = str(u)
                        if c is not None:
                            row["json_code"] = int(c)
                    except (ValueError, TypeError):
                        pass  # non-castable lift keeps the raw field
        parsed.append(row)

    # ---- enrich (AddCfg) ---------------------------------------------------
    for row in parsed:
        for col in ("datasource", "rowkey", "level_lower"):
            row.setdefault(col, None)
        for op in cfg.adds.get(row["tag"], ()):
            if op.value is None:
                row[op.key] = None
            else:
                row[op.key] = _interp(op.value, row, row["tag"])

    # ---- post default filter: truncate string fields -----------------------
    for row in parsed:
        for k, v in row.items():
            if isinstance(v, str) and len(v) > cfg.max_field_len:
                row[k] = v[: cfg.max_field_len]

    # ---- route -------------------------------------------------------------
    # tags absent from sink_map are DISCARDED, matching route_batch's
    # documented dispatcher semantics (es_sender_dispatcher.go:63-67)
    routed = []
    for row in parsed:
        sink = cfg.sink_map.get(row["tag"])
        if sink is None:
            discards["no_sink"] = discards.get("no_sink", 0) + 1
            continue
        row["sink"] = sink
        row["n_merged"] = len(row["merged_turns"])
        routed.append(row)
    parsed = routed

    parsed.sort(key=lambda x: (x["conv_id"], x["turn_idx"]))
    arrays = []
    for f in OUTPUT_SCHEMA:
        arrays.append(pa.array([row.get(f.name) for row in parsed], type=f.type))
    out = pa.Table.from_arrays(arrays, schema=OUTPUT_SCHEMA)
    return out, discards


def oracle_sink_counts(out: pa.Table) -> pd.DataFrame:
    df = out.to_pandas()
    return (df.groupby("sink").size().rename("n").reset_index()
            .sort_values("sink").reset_index(drop=True))


def oracle_tool_role_sink_counts(out: pa.Table) -> pd.DataFrame:
    df = out.to_pandas()
    return (df.groupby(["tool", "role", "sink"]).size().rename("n").reset_index()
            .sort_values(["tool", "role", "sink"]).reset_index(drop=True))
