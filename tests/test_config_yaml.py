"""YAML config surface (§2.8): declarative pipeline config with {env}
interpolation drives the same stages; a YAML equivalent of the default
config produces identical pipeline output."""

import pyarrow as pa
import pytest

from go_fluentd_ray import config_yaml
from go_fluentd_ray.config import DEFAULT_CONFIG

YAML_DOC = """
env: uat
ingress_tags: {"": "spring.{env}", bash: "spark.{env}"}
window: {min: "2015-01-01T00:00:00", max: "2030-01-01T00:00:00"}
spark: {tag: "spark.{env}", ignore_regex: "^ignore"}
spring:
  tag: "spring.{env}"
  rules:
    - {regex: "- ms:cp", new_tag: "cp.{env}"}
    - {regex: ".*", new_tag: "app.spring.{env}"}
accept_tags: ["app.spring.{env}", "cp.{env}", "spark.{env}"]
concat:
  "app.spring.{env}": {head_regex: "^HEAD", max_length: 64}
parsers:
  "app.spring.{env}":
    pattern: "(?s)^HEAD (?P<message>.*)$"
    must_include: message
    time_group: null
adds:
  "app.spring.{env}":
    datasource: spring
    thread: null
sink_map: {"app.spring.{env}": "{env}-spring-logs"}
max_field_len: 1024
"""


def test_env_interpolation_and_fields():
    cfg = config_yaml.from_yaml(YAML_DOC)
    assert cfg.ingress_tags[""] == "spring.uat"
    assert cfg.retag_rules[0].new_tag == "cp.uat"
    assert "app.spring.uat" in cfg.accept_tags
    assert cfg.concat["app.spring.uat"].max_length == 64
    assert cfg.parsers["app.spring.uat"].must_include == "message"
    ops = {op.key: op.value for op in cfg.adds["app.spring.uat"]}
    assert ops["thread"] is None  # delete op via yaml null
    assert cfg.sink_map["app.spring.uat"] == "uat-spring-logs"
    assert cfg.max_field_len == 1024


def test_yaml_equivalent_of_default_config_runs_identically():
    """Rebuild DEFAULT_CONFIG through YAML and check acceptor parity."""
    import yaml as _yaml

    from go_fluentd_ray.stages.acceptor import acceptor_transform
    from go_fluentd_ray.synth import transcript_table

    d = DEFAULT_CONFIG
    doc = {
        "env": "sit",
        "ingress_tags": dict(d.ingress_tags),
        "window": {"min": d.window_min_ts, "max": d.window_max_ts},
        "spark": {"tag": d.spark_tag, "ignore_regex": d.spark_ignore_regex},
        "spring": {"tag": d.spring_tag,
                   "rules": [{"regex": r.regex, "new_tag": r.new_tag}
                             for r in d.retag_rules]},
        "accept_tags": sorted(d.accept_tags),
        "concat": {t: {"head_regex": c.head_regex, "max_length": c.max_length}
                   for t, c in d.concat.items()},
    }
    cfg2 = config_yaml.from_yaml(_yaml.safe_dump(doc))
    t = transcript_table(2000)
    a = acceptor_transform(t, d)
    b = acceptor_transform(t, cfg2)
    assert a.equals(b)


def test_custom_yaml_pipeline_matches_oracle():
    """A DIFFERENT config (custom window + retag rules) through the
    pure pipeline chain must still equal the oracle under that config."""
    from go_fluentd_ray import oracle
    from go_fluentd_ray.pipelines import flagship
    from go_fluentd_ray.synth import transcript_table

    cfg = config_yaml.from_yaml("""
env: sit
ingress_tags: {"": "spring.{env}", bash: "spark.{env}", search: "ai.{env}",
               editor: "edit.{env}", python: "base.{env}"}
window: {min: "2023-06-01T00:00:00", max: "2026-01-01T00:00:00"}
spark: {tag: "spark.{env}", ignore_regex: 'executor=\\d+' }
spring:
  tag: "spring.{env}"
  rules:
    - {regex: 'ms_\\w+', new_tag: "bot.{env}"}
    - {regex: ".*", new_tag: "app.spring.{env}"}
accept_tags: ["app.spring.{env}", "bot.{env}", "spark.{env}"]
concat:
  "bot.{env}": {head_regex: '^\\d{4}-\\d{2}-\\d{2} \\d{2}:\\d{2}:\\d{2}\\.\\d{3} \\|',
                max_length: 200}
parsers:
  "app.spring.{env}":
    pattern: "(?s)^(?P<time>\\\\d{4}-\\\\d{2}-\\\\d{2} \\\\d{2}:\\\\d{2}:\\\\d{2}\\\\.\\\\d{3}) \\\\| (?P<app>[^ |]+) \\\\| (?P<level>[^ |]+) \\\\| (?P<thread>[^ |]+) \\\\| (?P<class_name>[^ |]+) \\\\| (?P<line>\\\\d+): (?P<message>.*)$"
    must_include: app
  "bot.{env}":
    pattern: "(?s)^(?P<time>\\\\d{4}-\\\\d{2}-\\\\d{2} \\\\d{2}:\\\\d{2}:\\\\d{2}\\\\.\\\\d{3}) \\\\| (?P<app>[^ |]+) \\\\| (?P<level>[^ |]+) \\\\| (?P<thread>[^ |]+) \\\\| (?P<class_name>[^ |]+) \\\\| (?P<line>\\\\d+): (?P<message>.*)$"
    must_include: level
  "spark.{env}":
    pattern: "(?s)^(?P<time>\\\\d{4}/\\\\d{2}/\\\\d{2} \\\\d{2}:\\\\d{2}:\\\\d{2}\\\\.\\\\d{3}) (?P<message>.*)$"
    must_include: message
    time_format: "%Y/%m/%d %H:%M:%S.%f"
adds:
  "app.spring.{env}":
    datasource: spring2
    rowkey: "%{conv_id}_%{@tag}"
sink_map: {"app.spring.{env}": "s1", "bot.{env}": "s2", "spark.{env}": "s3"}
max_field_len: 150
""")
    t = transcript_table(8000)
    got = flagship.run_local(t, cfg)
    want, disc = oracle.run_oracle(t, cfg)
    assert got.num_rows == want.num_rows and got.num_rows > 0
    assert got.equals(want)
    assert disc["window"] > 0 and disc["spark_ignore"] > 0


def test_yaml_per_tag_joiner_and_unixof_rowkey():
    """Round-2 extension surface through YAML: per-tag joiners and the
    %{@unixof:col} CustomBigDataFilter rowkey token, verified against
    the oracle end-to-end."""
    from go_fluentd_ray import oracle
    from go_fluentd_ray.pipelines import flagship
    from go_fluentd_ray.synth import transcript_table

    head = '^\\d{4}-\\d{2}-\\d{2} \\d{2}:\\d{2}:\\d{2}\\.\\d{3} \\|'
    cfg = config_yaml.from_yaml(f"""
env: sit
ingress_tags: {{"": "spring.{{env}}", bash: "spark.{{env}}"}}
window: {{min: "2015-01-01T00:00:00", max: "2030-01-01T00:00:00"}}
spark: {{tag: "spark.{{env}}", ignore_regex: 'executor=\\\\d+'}}
spring:
  tag: "spring.{{env}}"
  rules:
    - {{regex: 'ms_\\\\w+', new_tag: "bot.{{env}}"}}
    - {{regex: ".*", new_tag: "app.spring.{{env}}"}}
accept_tags: ["app.spring.{{env}}", "bot.{{env}}"]
concat:
  "app.spring.{{env}}": {{head_regex: '{head}', max_length: 8192,
                          joiner: " || "}}
  "bot.{{env}}": {{head_regex: '{head}', max_length: 8192,
                   joiner: "\\t"}}
parsers:
  "app.spring.{{env}}":
    pattern: "(?s)^(?P<time>\\\\d{{4}}-\\\\d{{2}}-\\\\d{{2}} \\\\d{{2}}:\\\\d{{2}}:\\\\d{{2}}\\\\.\\\\d{{3}}) \\\\| (?P<app>[^ |]+) \\\\| (?P<level>[^ |]+) \\\\| (?P<thread>[^ |]+) \\\\| (?P<class_name>[^ |]+) \\\\| (?P<line>\\\\d+): (?P<message>.*)$"
    must_include: app
adds:
  "app.spring.{{env}}":
    datasource: bigdata
    rowkey: "%{{app}}_%{{@unixof:@timestamp}}"
sink_map: {{"app.spring.{{env}}": "s1", "bot.{{env}}": "s2"}}
""")
    assert cfg.concat["app.spring.sit"].joiner == " || "
    assert cfg.concat["bot.sit"].joiner == "\t"
    t = transcript_table(6000)
    got = flagship.run_local(t, cfg)
    want, _ = oracle.run_oracle(t, cfg)
    assert got.num_rows == want.num_rows and got.num_rows > 0
    assert got.equals(want)
    df = got.to_pandas()
    rk = df[df["tag"] == "app.spring.sit"]["rowkey"].dropna()
    assert rk.str.match(r".+_\d{9,}$").all()  # app + epoch seconds


class TestConfigServer:
    """Two-source settings load (cmd/root.go:108-141): file then
    config-server overlay, server wins, propertySources[0] highest."""

    PAYLOAD = {
        "name": "go-fluentd", "profiles": ["sit"], "label": "main",
        "propertySources": [
            {"name": "winner", "source": {"max_field_len": 1234,
                                          "env": "uat"}},
            {"name": "loser", "source": {
                "max_field_len": 9,
                "sink_map": {"app.spring.{env}": "srv-logs"}}},
        ],
    }

    def test_overlay_precedence_and_deep_set(self):
        doc = config_yaml.overlay_config_server(
            {"env": "sit", "accept_tags": ["app.spring.{env}"]},
            self.PAYLOAD)
        assert doc["max_field_len"] == 1234      # first source wins
        assert doc["env"] == "uat"               # server beats file
        assert doc["sink_map"] == {"app.spring.{env}": "srv-logs"}
        assert doc["accept_tags"] == ["app.spring.{env}"]  # file kept
        nested = config_yaml.overlay_config_server(
            {}, {"propertySources": [
                {"source": {"window.min": "2015-01-01T00:00:00"}}]})
        assert nested["window"]["min"] == "2015-01-01T00:00:00"

    def test_load_settings_fetches_expected_url(self, tmp_path):
        seen = []

        def fake_fetch(url):
            seen.append(url)
            return self.PAYLOAD

        f = tmp_path / "settings.yml"
        f.write_text("env: sit\nmax_field_len: 7\n")
        doc = config_yaml.load_settings(
            str(f), server="http://cfg:8080/", appname="go-fluentd",
            profile="sit", label="main", fetcher=fake_fetch)
        assert seen == ["http://cfg:8080/go-fluentd/sit/main"]
        assert doc["max_field_len"] == 1234
        cfg = config_yaml.from_settings(doc)
        assert cfg.max_field_len == 1234

    def test_neither_source_raises(self):
        import pytest as _pytest

        with _pytest.raises(ValueError, match="can not load any"):
            config_yaml.load_settings("/nonexistent/settings.yml")

    def test_file_only_and_server_only(self, tmp_path):
        f = tmp_path / "s.yml"
        f.write_text("max_field_len: 7\n")
        assert config_yaml.load_settings(str(f))["max_field_len"] == 7
        doc = config_yaml.load_settings(
            None, server="http://c", appname="a", profile="p",
            label="l", fetcher=lambda u: self.PAYLOAD)
        assert doc["max_field_len"] == 1234
