"""Grok-style pattern helper: translate ``%{PATTERN:field}`` templates
into the named-group RE2 regexes the parse stage consumes, so users can
write parser configs the way fluentd/logstash users do instead of raw
regex (the reference's settings.yml patterns are raw named-group
regexes; grok is the ergonomic layer on top).

Only RE2-safe constructs (no lookarounds/backrefs), so the compiled
pattern runs through pc.extract_regex and DuckDB alike.
"""

from __future__ import annotations

import re

GROK_PATTERNS: dict[str, str] = {
    "WORD": r"\w+",
    "NOTSPACE": r"\S+",
    "DATA": r".*?",
    # DOTALL scoped to THIS token only ((?s:...) groups are supported by
    # RE2 and Python re alike) — a global (?s) would silently change
    # every other dot-based pattern in the template
    "GREEDYDATA": r"(?s:.*)",
    "INT": r"[+-]?\d+",
    "NUMBER": r"[+-]?\d+(?:\.\d+)?",
    "IP": r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}",
    "TIMESTAMP_ISO8601":
        r"\d{4}-\d{2}-\d{2}[T ]\d{2}:\d{2}:\d{2}(?:[.,]\d+)?",
    "LOGLEVEL": r"(?:TRACE|DEBUG|INFO|NOTICE|WARN(?:ING)?|ERROR|"
                r"CRIT(?:ICAL)?|FATAL|SEVERE)",
    "PIPE_FIELD": r"[^ |]+",
    "JAVACLASS": r"(?:[\w$]+\.)+[\w$]+",
    "QS": r'"[^"]*"',
}

_TOKEN = re.compile(r"%\{(\w+)(?::(\w+))?\}")


def compile_grok(template: str,
                 extra_patterns: dict[str, str] | None = None) -> str:
    """'%{TIMESTAMP_ISO8601:time} \\| %{WORD:app}' ->
    '(?P<time>...) \\| (?P<app>\\w+)'. Unnamed tokens become
    non-capturing; unknown pattern names raise."""
    pats = {**GROK_PATTERNS, **(extra_patterns or {})}
    out = []
    pos = 0
    for m in _TOKEN.finditer(template):
        out.append(template[pos:m.start()])
        name, field = m.group(1), m.group(2)
        if name not in pats:
            raise KeyError(f"unknown grok pattern %{{{name}}}")
        body = pats[name]
        if field:
            out.append(f"(?P<{field}>{body})")
        else:
            out.append(f"(?:{body})")
        pos = m.end()
    out.append(template[pos:])
    return "".join(out)
