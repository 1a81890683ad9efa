"""DuckDB SQL equivalents of the flagship pipeline, generated from the
same PipelineConfig the Ray stages use (no drift by construction).

The transcripts corpus is not one of the driver's pre-registered views,
so these SQL strings read the deterministic /tmp corpus parquet directly
via read_parquet(path). The corpus is generated eagerly by
__ray_entry__.queries()/oracle_sql() before either side runs.

Note: max_length concat overflow is intentionally NOT modeled in SQL —
at test scales no segment approaches max_length=8192 (longest
continuation runs are ~20 lines x ~100 chars, content-length counted);
the overflow semantics are covered by unit tests + the pure-Python
oracle instead.
"""

from __future__ import annotations

from ..config import DEFAULT_CONFIG, PipelineConfig


def _sq(s: str) -> str:
    return s.replace("'", "''")


def acceptor_cte(path: str, cfg: PipelineConfig = DEFAULT_CONFIG) -> str:
    ingress = " ".join(
        f"WHEN '{_sq(k)}' THEN '{_sq(v)}'" for k, v in cfg.ingress_tags.items()
    )
    rules = []
    for r in cfg.retag_rules:
        if r.regex == ".*":
            rules.append(f"ELSE '{_sq(r.new_tag)}'")
            break
        rules.append(
            f"WHEN regexp_matches(text, '{_sq(r.regex)}') THEN '{_sq(r.new_tag)}'")
    retag = " ".join(rules)
    accept = ", ".join(f"'{_sq(t)}'" for t in sorted(cfg.accept_tags))
    concat_tags = ", ".join(f"'{_sq(t)}'" for t in sorted(cfg.concat))
    head_cases = " ".join(
        f"WHEN tag = '{_sq(t)}' THEN regexp_matches(text, '{_sq(c.head_regex)}')"
        for t, c in cfg.concat.items())
    return f"""
w AS (
  SELECT * FROM read_parquet('{path}')
  WHERE ts BETWEEN TIMESTAMP '{cfg.window_min_ts.replace("T", " ")}'
              AND TIMESTAMP '{cfg.window_max_ts.replace("T", " ")}'
),
tagged AS (
  SELECT *, CASE tool {ingress} END AS tag0 FROM w
),
nospark AS (
  SELECT * FROM tagged
  WHERE NOT (tag0 = '{_sq(cfg.spark_tag)}'
             AND regexp_matches(text, '{_sq(cfg.spark_ignore_regex)}'))
),
accepted AS (
  SELECT * FROM (
    SELECT * EXCLUDE (tag0),
           CASE WHEN tag0 = '{_sq(cfg.spring_tag)}'
                THEN CASE {retag} END
                ELSE tag0 END AS tag
    FROM nospark
  ) WHERE tag IN ({accept})
),
flagged AS (
  SELECT *, tag IN ({concat_tags}) AS concat_on,
         CASE {head_cases} ELSE TRUE END AS is_head
  FROM accepted
)"""


def _estr(s: str) -> str:
    """A DuckDB E'...' string literal for an arbitrary joiner."""
    esc = (s.replace("\\", "\\\\").replace("'", "\\'")
           .replace("\n", "\\n").replace("\t", "\\t").replace("\r", "\\r"))
    return f"e'{esc}'"


def concat_cte(cfg: PipelineConfig = DEFAULT_CONFIG) -> str:
    """Segment + merge. The joiner comes from the config, PER TAG
    (string_agg's separator must be constant, so each non-first row is
    prefixed with its tag's joiner and the aggregate uses '')."""
    jo_cases = " ".join(
        f"WHEN '{_sq(t)}' THEN {_estr(c.joiner)}"
        for t, c in cfg.concat.items())
    jo = f"CASE tag {jo_cases} ELSE chr(10) END" if jo_cases else "chr(10)"
    return f"""
segmented AS (
  SELECT *, SUM(CASE WHEN is_head THEN 1 ELSE 0 END)
              OVER (PARTITION BY tag, conv_id ORDER BY turn_idx
                    ROWS UNBOUNDED PRECEDING) AS headcnt
  FROM flagged
),
segkey AS (
  SELECT *, CASE WHEN NOT concat_on THEN 'x' || turn_idx
                 WHEN headcnt = 0   THEN 'p' || turn_idx
                 ELSE 's' || headcnt END AS seg,
         {jo} AS jo
  FROM segmented
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY tag, conv_id, seg
                               ORDER BY turn_idx) AS rn
  FROM segkey
),
merged AS (
  SELECT tag, conv_id,
         min(turn_idx)::INTEGER                        AS turn_idx,
         arg_min(role, turn_idx)                       AS role,
         arg_min(tool, turn_idx)                       AS tool,
         arg_min(ts, turn_idx)                         AS ts,
         string_agg(CASE WHEN rn = 1 THEN text ELSE jo || text END,
                    '' ORDER BY turn_idx)              AS text,
         count(*)::INTEGER                             AS n_merged
  FROM ranked
  GROUP BY tag, conv_id, seg
)"""


def _parse_branch(tag: str, cfg: PipelineConfig) -> str:
    p = cfg.parsers[tag]
    pat = p.pattern
    flags = "s" if pat.startswith("(?s)") else ""
    if flags:
        pat = pat[4:]
    # group names in pattern order
    import re as _re

    names = _re.findall(r"\(\?P<(\w+)>", pat)
    pat_sq = _sq(pat)
    name_list = ", ".join(f"'{n}'" for n in names)
    ex = (f"regexp_extract(text, '{pat_sq}', [{name_list}], '{flags}')"
          if flags else f"regexp_extract(text, '{pat_sq}', [{name_list}])")
    fields = {n: f"nullif(trim(g.{n}), '')" for n in names}
    all_groups = ["time", "app", "level", "thread", "class_name", "line",
                  "message", "project"]
    sel_groups = ",\n         ".join(
        f"{fields.get(n, 'NULL')} AS {n}" for n in all_groups)
    # duckdb strptime: %g = milliseconds; our configs use %f (python) for
    # 3-digit ms strings -> translate
    fmt = p.time_format.replace("%f", "%g")
    match_re = f"regexp_matches(text, '{pat_sq}', '{flags}')" if flags else \
        f"regexp_matches(text, '{pat_sq}')"
    must = (f"AND nullif(trim(g.{p.must_include}), '') IS NOT NULL"
            if p.must_include else "")
    return f"""
  SELECT tag, conv_id, turn_idx, role, tool, ts, n_merged, text,
         {sel_groups},
         strftime(strptime(replace(nullif(trim(g.{p.time_group}), ''), ',', '.'),
                  '{_sq(fmt)}'), '%Y-%m-%dT%H:%M:%S.%fZ') AS "@timestamp",
         {_json_exprs(tag, cfg)}
  FROM (SELECT *, {ex} AS g FROM merged
        WHERE tag = '{_sq(tag)}' AND {match_re}) sub
  WHERE TRUE {must}"""


def _json_exprs(tag: str, cfg: PipelineConfig) -> str:
    p = cfg.parsers[tag]
    if not p.json_group:
        return "NULL AS json_user, NULL::BIGINT AS json_code"
    src = f"nullif(trim(g.{p.json_group}), '')"
    j = f"regexp_extract({src}, '(\\{{.*\\}})\\s*$', 1, 's')"
    return (
        f"CASE WHEN json_valid({j}) THEN json_extract_string({j}, '$.user') END AS json_user, "
        f"CASE WHEN json_valid({j}) THEN CAST(json_extract({j}, '$.code') AS BIGINT) END AS json_code"
    )


def _tpl_sql(value: str, tag: str, cfg: PipelineConfig) -> str:
    """Compile ONE AddOp template into a SQL expression using the SAME
    compile_template the Ray enrich stage uses (no semantic drift by
    construction). Run-dependent tokens (@now/@unix/@str) are not
    SQL-expressible and raise."""
    from ..stages.enrich import compile_template

    parts: list[str] = []
    for kind, payload in compile_template(value):
        if kind == "lit":
            parts.append(f"'{_sq(payload)}'")
        elif kind == "tag":
            parts.append(f"'{_sq(tag)}'")
        elif kind == "id":
            parts.append("coalesce(CAST(conv_id AS VARCHAR), '') || '-' || "
                         "coalesce(CAST(turn_idx AS VARCHAR), '')")
        elif kind == "col":
            parts.append(f"coalesce(CAST(\"{payload}\" AS VARCHAR), '')")
        elif kind == "lower":
            parts.append(f"lower(coalesce(CAST(\"{payload}\" AS VARCHAR), ''))")
        elif kind == "upper":
            parts.append(f"upper(coalesce(CAST(\"{payload}\" AS VARCHAR), ''))")
        elif kind == "unixof":
            # epoch seconds of the row's timestamp column
            # (custom_bigdata.go:60-70); string columns are parsed with
            # the tag's new_time_format, timestamp columns used directly
            p = cfg.parsers.get(tag)
            if payload == "@timestamp" and p is not None:
                fmt = _sq(p.new_time_format)
                parts.append(
                    f"coalesce(CAST(CAST(floor(epoch(try_strptime("
                    f"\"@timestamp\", '{fmt}'))) AS BIGINT) AS VARCHAR), '')")
            else:
                parts.append(
                    f"coalesce(CAST(CAST(floor(epoch(\"{payload}\")) "
                    f"AS BIGINT) AS VARCHAR), '')")
        else:
            raise ValueError(f"token kind {kind!r} is not SQL-expressible")
    return " || ".join(parts) if parts else "''"


def _last_ops(cfg: PipelineConfig) -> dict[str, dict[str, "str | None"]]:
    """key -> {tag: final value} (later ops override earlier per tag)."""
    out: dict[str, dict[str, "str | None"]] = {}
    for tag, ops in cfg.adds.items():
        for op in ops:
            out.setdefault(op.key, {})[tag] = op.value
    return out


_PARSE_OUT_COLS = ["app", "level", "thread", "class_name", "line",
                   "message", "project"]
_ENRICH_KEYS = ["datasource", "rowkey", "level_lower"]


def enrich_route_select(cfg: PipelineConfig = DEFAULT_CONFIG) -> str:
    """Enrich + route, generated from cfg.adds by compiling each AddOp
    template (delete ops -> NULL for that tag; set ops -> compiled
    expression; untouched tags keep the parse column / get NULL for
    enrich-only keys)."""
    ops = _last_ops(cfg)

    def col_expr(c: str) -> str:
        e = f'"{c}"'
        per_tag = ops.get(c, {})
        del_tags = [t for t, v in per_tag.items() if v is None]
        if del_tags:
            tl = ", ".join(f"'{_sq(t)}'" for t in del_tags)
            e = f"CASE WHEN tag IN ({tl}) THEN NULL ELSE {e} END"
        set_whens = " ".join(
            f"WHEN '{_sq(t)}' THEN {_tpl_sql(v, t, cfg)}"
            for t, v in per_tag.items() if v is not None)
        if set_whens:
            e = f"CASE tag {set_whens} ELSE {e} END"
        return f"{e} AS {c}"

    def enrich_expr(key: str) -> str:
        whens = " ".join(
            f"WHEN '{_sq(t)}' THEN {_tpl_sql(v, t, cfg)}"
            for t, v in ops.get(key, {}).items() if v is not None)
        if not whens:
            return f"NULL AS {key}"
        return f"CASE tag {whens} END AS {key}"

    sink_case = " ".join(
        f"WHEN '{_sq(t)}' THEN '{_sq(s)}'" for t, s in cfg.sink_map.items())
    parse_sel = ",\n       ".join(col_expr(c) for c in _PARSE_OUT_COLS)
    enrich_sel = ",\n       ".join(enrich_expr(k) for k in _ENRICH_KEYS)
    return f"""
SELECT conv_id, turn_idx, role, tool, ts, tag,
       CASE tag {sink_case} END AS sink,
       n_merged, text, time, "@timestamp",
       {parse_sel},
       json_user, json_code,
       {enrich_sel}
FROM parsed"""


def _bypass_branch(tags: list[str]) -> str:
    """Accepted tags without a parser bypass unparsed
    (tagfilters/pipeline.go:88-91): parse/time/json columns null."""
    in_list = ", ".join(f"'{_sq(t)}'" for t in tags)
    return f"""
  SELECT tag, conv_id, turn_idx, role, tool, ts, n_merged, text,
         NULL AS time, NULL AS app, NULL AS level, NULL AS thread,
         NULL AS class_name, NULL AS line, NULL AS message,
         NULL AS project, NULL AS "@timestamp",
         NULL AS json_user, NULL::BIGINT AS json_code
  FROM merged WHERE tag IN ({in_list})"""


def flagship_sql(path: str, cfg: PipelineConfig = DEFAULT_CONFIG) -> str:
    branches = [_parse_branch(t, cfg) for t in cfg.parsers]
    unparsed = sorted(cfg.accept_tags - set(cfg.parsers))
    if unparsed:
        branches.append(_bypass_branch(unparsed))
    joined = "\n  UNION ALL\n".join(branches)
    return (f"WITH {acceptor_cte(path, cfg)},\n{concat_cte(cfg)},\n"
            f"parsed AS (\n{joined}\n)\n{enrich_route_select(cfg)}")


def json_extra_sql(path: str, cfg: PipelineConfig = DEFAULT_CONFIG) -> str:
    """The parse stage's flattened embedded-JSON map (``extra``),
    exploded to (conv_id, turn_idx, k, v) rows. SQL flattening covers
    one nesting level via json_keys + unnest (the synth corpus nests one
    level); the Python flatten_obj handles arbitrary depth and is
    pytest-covered beyond that."""
    json_tags = ", ".join(f"'{_sq(t)}'" for t, p in cfg.parsers.items()
                          if p.json_group)
    fsql = flagship_sql(path, cfg)
    return f"""
WITH f AS ({fsql}),
j AS (
  SELECT conv_id, turn_idx,
         regexp_extract(message, '(\\{{.*\\}})\\s*$', 1, 's') AS js
  FROM f WHERE tag IN ({json_tags}) AND message IS NOT NULL
),
jv AS (SELECT * FROM j WHERE js <> '' AND json_valid(js)),
k1 AS (SELECT conv_id, turn_idx, js, unnest(json_keys(js)) AS k FROM jv)
SELECT conv_id, turn_idx, k, json_extract_string(js, '$.' || k) AS v
FROM k1 WHERE json_type(json_extract(js, '$.' || k)) <> 'OBJECT'
UNION ALL
SELECT conv_id, turn_idx, k || '__' || k2 AS k,
       json_extract_string(js, '$.' || k || '.' || k2) AS v
FROM (SELECT conv_id, turn_idx, js, k,
             unnest(json_keys(json_extract(js, '$.' || k))) AS k2
      FROM k1 WHERE json_type(json_extract(js, '$.' || k)) = 'OBJECT') q
"""


def acceptor_counts_sql(path: str, cfg: PipelineConfig = DEFAULT_CONFIG) -> str:
    return (f"WITH {acceptor_cte(path, cfg)}\n"
            "SELECT tag, count(*)::BIGINT AS n FROM flagged GROUP BY tag")


def concat_segments_sql(path: str, cfg: PipelineConfig = DEFAULT_CONFIG) -> str:
    return (f"WITH {acceptor_cte(path, cfg)},\n{concat_cte(cfg)}\n"
            "SELECT tag, conv_id, turn_idx, role, tool, ts, text, n_merged FROM merged")


def window_filter_sql(path: str, cfg: PipelineConfig = DEFAULT_CONFIG) -> str:
    return (
        f"SELECT conv_id, turn_idx, tool, ts FROM read_parquet('{path}') "
        f"WHERE ts BETWEEN TIMESTAMP '{cfg.window_min_ts.replace('T', ' ')}' "
        f"AND TIMESTAMP '{cfg.window_max_ts.replace('T', ' ')}'")
