"""Pipeline configuration for the Ray-Data-native log/transcript pipeline.

Mirrors the *structure* of go-fluentd's settings.yml (reference:
docs/settings/settings.yml) without copying it: ingress tag mapping
(recvs), retag rules (acceptorfilters/spring_f.go:79-107), ignore regex
(acceptorfilters/spark_f.go:44-68), accept-tags whitelist
(acceptorfilters/default_f.go:64-79), per-tag concat config
(tagfilters/concator_f.go:24-36), per-tag parser config
(tagfilters/parser_f.go:17-56), per-tag add/enrich config
(library/add.go:182-205), sink routing map
(postfilters/es_sender_dispatcher.go:27-34 + senders/elasticsearch.go:111-132).

Everything is a plain-Python dataclass so the whole config is cheaply
picklable and broadcast into Ray tasks/actors once (ray.put on the
driver; captured by closure for map_batches stages).
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class RetagRule:
    """First-match-wins regex retag (spring_f.go:79-107).

    ``regex`` is searched (not anchored) against the raw text; the first
    matching rule assigns ``new_tag``.
    """

    regex: str
    new_tag: str


@dataclass(frozen=True)
class ConcatCfg:
    """Multi-line concatenation config for one tag (concator_f.go:24-36).

    ``head_regex``: a line matching this starts a new logical record;
    non-matching lines are appended to the pending record (joined with
    ``joiner``) within the same (tag, conv_id), ordered by turn_idx.
    ``max_length``: checked after each append — once the pending
    record's CONTENT length (sum of line lengths, no joiner bytes: the
    reference appends raw bytes, concator_f.go:186-201) reaches
    ``>= max_length``, the record is flushed and subsequent lines start
    fresh. ``joiner`` is per-tag, like the rest of this config.
    """

    head_regex: str
    max_length: int = 100_000
    joiner: str = "\n"


@dataclass(frozen=True)
class ParserCfg:
    """Named-group regex parse config for one tag (tagfilters/parser_f.go).

    - ``pattern``: RE2-compatible named-group regex applied to the full
      (possibly concatenated) text. Non-matching rows are DISCARDED
      (parser_f.go:56-64).
    - ``must_include``: required named group; rows where it is null/empty
      after extraction are discarded (parser_f.go:111-117).
    - ``time_group`` + ``time_format``: strptime source for the
      normalized ``@timestamp`` (parser_f.go:121-168). A ``,`` decimal
      comma in the time string is rewritten to ``.`` first
      (parser_f.go:147). Parse failure discards the row.
    - ``json_group``: if set, a trailing ``{...}`` JSON object embedded in
      that group is parsed and known keys are lifted to columns
      (parser_f.go:74-107; flattened with ``__`` like FlattenMap).
    """

    pattern: str
    must_include: str | None = None
    is_remove_orig_log: bool = False  # parser_f.go: drop raw log after parse
    time_group: str = "time"
    time_format: str = "%Y-%m-%d %H:%M:%S.%f"
    new_time_format: str = "%Y-%m-%dT%H:%M:%S.%fZ"
    json_group: str | None = None


@dataclass(frozen=True)
class AddOp:
    """One enrich op (library/add.go:182-205).

    value semantics (ReplaceStrByMsg, add.go:60-147):
      - ``None``          -> delete the field (set null)
      - ``"%{key}"``      -> substitute another column's value ('' if null)
      - ``"%{@tag}"``     -> the row's tag
      - ``"%{@lower:k}"`` / ``"%{@upper:k}"`` -> case-mapped column value
      - anything else     -> literal
    """

    key: str
    value: str | None


@dataclass(frozen=True)
class PipelineConfig:
    # recvs: tool -> ingress tag (the fluentd tag a message arrives with)
    ingress_tags: dict[str, str] = field(
        default_factory=lambda: {
            "": "spring.sit",
            "bash": "spark.sit",
            "search": "ai.sit",
            "editor": "edit.sit",  # NOT in accept_tags -> dropped
            "python": "base.sit",
        }
    )

    # HTTPRecv-style allowed time window (recvs/http.go:133-150),
    # inclusive ISO bounds applied to the ``ts`` column.
    window_min_ts: str = "2015-01-01T00:00:00"
    window_max_ts: str = "2030-01-01T00:00:00"

    # SparkFilter ignore regex (spark_f.go:59; settings example family)
    spark_tag: str = "spark.sit"
    spark_ignore_regex: str = r"^\d{4}-\d{2}-\d{2} +\d{2}:\d{2}:\d{2},\d{3} +\["

    # SpringFilter first-match-wins retag rules (spring_f.go:79-107)
    spring_tag: str = "spring.sit"
    retag_rules: tuple[RetagRule, ...] = (
        RetagRule(regex=r"- ms:cp", new_tag="cp.sit"),
        RetagRule(regex=r"ms_\w+", new_tag="bot.sit"),
        RetagRule(regex=r".*", new_tag="app.spring.sit"),
    )

    # DefaultFilter accept-tags whitelist (default_f.go:64-79)
    accept_tags: frozenset[str] = frozenset(
        {"app.spring.sit", "cp.sit", "bot.sit", "spark.sit", "ai.sit", "base.sit"}
    )

    # per-tag concat (dispatcher routes by tag; concator runs first in the
    # tag chain — tagfilters/pipeline.go:68-94)
    concat: dict[str, ConcatCfg] = field(
        default_factory=lambda: {
            "app.spring.sit": ConcatCfg(
                head_regex=r"^\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}\.\d{3} \|",
                max_length=8_192,
            ),
            "bot.sit": ConcatCfg(
                head_regex=r"^\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}\.\d{3} \|",
                max_length=8_192,
            ),
        }
    )

    # per-tag parser configs. Named groups become output columns; the
    # (?s) flag lets ``message`` span concatenated lines.
    parsers: dict[str, ParserCfg] = field(
        default_factory=lambda: {
            "app.spring.sit": ParserCfg(
                pattern=(
                    r"(?s)^(?P<time>\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}\.\d{3}) \| "
                    r"(?P<app>[^ |]+) \| (?P<level>[^ |]+) \| (?P<thread>[^ |]+) \| "
                    r"(?P<class_name>[^ |]+) \| (?P<line>\d+): (?P<message>.*)$"
                ),
                must_include="app",
                json_group="message",
            ),
            "bot.sit": ParserCfg(
                pattern=(
                    r"(?s)^(?P<time>\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}\.\d{3}) \| "
                    r"(?P<app>[^ |]+) \| (?P<level>[^ |]+) \| (?P<thread>[^ |]+) \| "
                    r"(?P<class_name>[^ |]+) \| (?P<line>\d+): (?P<message>.*)$"
                ),
                must_include="app",
            ),
            "cp.sit": ParserCfg(
                pattern=(
                    r"(?s)^(?P<time>\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}\.\d{3}) - "
                    r"(?P<message>ms:cp\|.*)$"
                ),
                must_include="message",
            ),
            "spark.sit": ParserCfg(
                pattern=(
                    r"(?s)^(?P<time>\d{4}/\d{2}/\d{2} \d{2}:\d{2}:\d{2}\.\d{3}) "
                    r"(?P<message>.*)$"
                ),
                must_include="message",
                time_format="%Y/%m/%d %H:%M:%S.%f",
            ),
            "ai.sit": ParserCfg(
                pattern=(
                    r"(?s)^(?P<time>\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}\.\d{3}) \| "
                    r"(?P<project>[^ |]+) \| (?P<level>[^ |]+) \| (?P<thread>[^ |]+) \| "
                    r"(?P<class_name>\S+):(?P<line>\d+) - (?P<message>.*)$"
                ),
                must_include="project",
            ),
            "base.sit": ParserCfg(
                # decimal-comma time -> exercises the ','->'.' fix
                pattern=(
                    r"(?s)^\[(?P<time>\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2},\d{3})\] "
                    r"(?P<level>[A-Z]+) (?P<app>[\w.]+): (?P<message>.*)$"
                ),
                must_include="level",
            ),
        }
    )

    # per-tag enrich ops (library/add.go; settings.yml datasource family)
    adds: dict[str, tuple[AddOp, ...]] = field(
        default_factory=lambda: {
            "app.spring.sit": (
                AddOp("datasource", "spring"),
                AddOp("rowkey", "%{conv_id}_%{@tag}"),
                AddOp("level_lower", "%{@lower:level}"),
            ),
            "bot.sit": (
                AddOp("datasource", "bot"),
                AddOp("rowkey", "%{conv_id}_%{@tag}"),
                AddOp("level_lower", "%{@lower:level}"),
            ),
            "cp.sit": (
                AddOp("datasource", "cp"),
                AddOp("rowkey", "%{conv_id}_%{@tag}"),
            ),
            "spark.sit": (
                AddOp("datasource", "spark"),
                AddOp("rowkey", "%{conv_id}_%{@tag}"),
            ),
            "ai.sit": (
                AddOp("datasource", "ai"),
                AddOp("rowkey", "%{conv_id}_%{@tag}"),
                AddOp("thread", None),  # delete-field op
                AddOp("level_lower", "%{@lower:level}"),
            ),
            "base.sit": (
                AddOp("datasource", "base"),
                AddOp("rowkey", "%{conv_id}_%{@tag}"),
                AddOp("level_lower", "%{@lower:level}"),
            ),
        }
    )

    # post default filter: truncate every string field (default_f.go:72-83)
    max_field_len: int = 307_200

    # tag -> sink (ES TagIndexMap analogue, elasticsearch.go:111-132).
    # Tags absent from this map are discarded by the dispatcher filter
    # (es_sender_dispatcher.go:63-67) — by construction none are here.
    sink_map: dict[str, str] = field(
        default_factory=lambda: {
            "app.spring.sit": "sit-spring-logs",
            "bot.sit": "sit-bot-logs",
            "cp.sit": "sit-cp-logs",
            "spark.sit": "sit-spark-logs",
            "ai.sit": "sit-ai-logs",
            "base.sit": "sit-base-logs",
        }
    )


DEFAULT_CONFIG = PipelineConfig()
