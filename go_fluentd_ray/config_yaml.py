"""YAML pipeline config loader — the user-extension surface (SURVEY.md
§2.8). Mirrors the STRUCTURE of the reference's settings.yml (env
interpolation in tags, per-tag filter configs, sink maps) so a
reference user can express their pipeline declaratively; every section
maps 1:1 onto a PipelineConfig field.

Example (see tests/test_config_yaml.py):

    env: sit
    ingress_tags: {"": "spring.{env}", bash: "spark.{env}"}
    window: {min: "2015-01-01T00:00:00", max: "2030-01-01T00:00:00"}
    spark: {tag: "spark.{env}", ignore_regex: "^..."}
    spring:
      tag: "spring.{env}"
      rules:
        - {regex: "- ms:cp", new_tag: "cp.{env}"}
        - {regex: ".*", new_tag: "app.spring.{env}"}
    accept_tags: ["app.spring.{env}", "cp.{env}"]
    concat:
      "app.spring.{env}": {head_regex: "^...", max_length: 8192}
    parsers:
      "app.spring.{env}":
        pattern: "(?s)^(?P<time>...)..."
        must_include: app
        time_format: "%Y-%m-%d %H:%M:%S.%f"
    adds:
      "app.spring.{env}":
        datasource: spring
        rowkey: "%{conv_id}_%{@tag}"
        thread: null            # delete op
    sink_map: {"app.spring.{env}": "{env}-spring-logs"}
    max_field_len: 307200
"""

from __future__ import annotations

from .config import AddOp, ConcatCfg, ParserCfg, PipelineConfig, RetagRule


def _env(s: str, env: str) -> str:
    """{env} interpolation (LoadTags*ReplaceEnv, library/utils.go:19-58)."""
    return s.replace("{env}", env) if isinstance(s, str) else s


def from_yaml(path_or_text: str) -> PipelineConfig:
    import os

    import yaml

    if os.path.exists(path_or_text):
        with open(path_or_text) as f:
            doc = yaml.safe_load(f)
    else:
        doc = yaml.safe_load(path_or_text)
    return from_settings(doc)


def _deep_set(doc: dict, dotted: str, value) -> None:
    """Set a dotted-path key into a nested dict (viper-style). Path
    segments never contain dots here — per-tag sections (whose keys DO
    contain dots) are passed as whole nested dicts instead."""
    parts = dotted.split(".")
    cur = doc
    for p in parts[:-1]:
        nxt = cur.get(p)
        if not isinstance(nxt, dict):
            nxt = {}
            cur[p] = nxt
        cur = nxt
    cur[parts[-1]] = value


def overlay_config_server(doc: dict, payload: dict) -> dict:
    """Merge a Spring-Cloud-Config-style response into a settings doc.

    The reference can pull settings from a config server after the
    file load, server values overriding the file (cmd/root.go:108-141
    via gutils Settings.LoadFromConfigServer). The server response
    shape is the public Spring document:

        {"name": ..., "profiles": [...], "label": ...,
         "propertySources": [{"name": ..., "source": {k: v, ...}}, ...]}

    where propertySources are listed highest-priority FIRST — so they
    are applied in reverse, letting the first one win. Keys may be
    dotted paths into the nested doc or whole nested dicts.
    """
    out = dict(doc)
    for ps in reversed(payload.get("propertySources", [])):
        for k, v in (ps.get("source") or {}).items():
            _deep_set(out, k, v)
    return out


def default_fetcher(url: str) -> dict:
    """GET a config-server URL and parse JSON (stdlib urllib; separated
    so air-gapped runs and tests can inject their own fetcher)."""
    import json
    import urllib.request

    with urllib.request.urlopen(url, timeout=10) as r:  # noqa: S310
        return json.loads(r.read().decode("utf-8"))


def load_settings(file_path: str | None = None, *,
                  server: str | None = None, appname: str | None = None,
                  profile: str | None = None, label: str | None = None,
                  fetcher=None) -> dict:
    """The reference's two-source settings load (cmd/root.go:108-141):
    try the file; if ALL config-server coordinates are present, fetch
    ``{server}/{appname}/{profile}/{label}`` and overlay (server wins);
    raise if neither source loaded — 'can not load any configuration'.
    Returns the merged settings dict for from_settings()."""
    import os

    import yaml

    doc: dict | None = None
    if file_path and os.path.exists(file_path):
        with open(file_path) as f:
            doc = yaml.safe_load(f) or {}
    if server and appname and profile and label:
        url = "/".join([server.rstrip("/"), appname, profile, label])
        payload = (fetcher or default_fetcher)(url)
        doc = overlay_config_server(doc or {}, payload)
    if doc is None:
        raise ValueError("can not load any configuration "
                         "(no file, no config server)")
    return doc


def from_settings(doc: dict) -> PipelineConfig:
    env = str(doc.get("env", "sit"))
    kw = {}
    if "ingress_tags" in doc:
        kw["ingress_tags"] = {k: _env(v, env)
                              for k, v in doc["ingress_tags"].items()}
    if "window" in doc:
        kw["window_min_ts"] = doc["window"]["min"]
        kw["window_max_ts"] = doc["window"]["max"]
    if "spark" in doc:
        kw["spark_tag"] = _env(doc["spark"]["tag"], env)
        kw["spark_ignore_regex"] = doc["spark"]["ignore_regex"]
    if "spring" in doc:
        kw["spring_tag"] = _env(doc["spring"]["tag"], env)
        kw["retag_rules"] = tuple(
            RetagRule(regex=r["regex"], new_tag=_env(r["new_tag"], env))
            for r in doc["spring"]["rules"])
    if "accept_tags" in doc:
        kw["accept_tags"] = frozenset(_env(t, env) for t in doc["accept_tags"])
    if "concat" in doc:
        kw["concat"] = {
            _env(tag, env): ConcatCfg(
                head_regex=c["head_regex"],
                max_length=int(c.get("max_length", 100_000)),
                joiner=c.get("joiner", "\n"))
            for tag, c in doc["concat"].items()}
    if "parsers" in doc:
        kw["parsers"] = {
            _env(tag, env): ParserCfg(
                pattern=p["pattern"],
                must_include=p.get("must_include"),
                is_remove_orig_log=bool(p.get("is_remove_orig_log", False)),
                time_group=p.get("time_group", "time"),
                time_format=p.get("time_format", "%Y-%m-%d %H:%M:%S.%f"),
                new_time_format=p.get("new_time_format",
                                      "%Y-%m-%dT%H:%M:%S.%fZ"),
                json_group=p.get("json_group"))
            for tag, p in doc["parsers"].items()}
    if "adds" in doc:
        kw["adds"] = {
            _env(tag, env): tuple(AddOp(k, v) for k, v in ops.items())
            for tag, ops in doc["adds"].items()}
    if "sink_map" in doc:
        kw["sink_map"] = {_env(t, env): _env(s, env)
                          for t, s in doc["sink_map"].items()}
    if "max_field_len" in doc:
        kw["max_field_len"] = int(doc["max_field_len"])
    return PipelineConfig(**kw)
