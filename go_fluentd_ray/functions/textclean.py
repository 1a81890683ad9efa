"""Text cleaning / redaction — the normalize-and-scrub pass a
training-data pipeline runs before tokenization: strip control
characters, redact emails and IPv4 addresses (the PII classes that are
regex-recognizable), collapse whitespace runs, trim. Everything is one
chain of RE2 kernels (`pc.replace_substring_regex`) over zero-copy
Arrow batches — no per-row Python — and every step is mirrored exactly
by DuckDB `regexp_replace(..., 'g')` (both engines are RE2-family), so
the operator is fully value-checked by the SQL oracle.

Redaction counts are emitted per row (n_emails, n_ips) so downstream
quality filters can threshold on PII density without re-scanning.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# RE2-safe (no lookbehind): control chars minus \t \n \r
CONTROL_RE = r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]"
EMAIL_RE = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
WS_RE = r"\s+"

EMAIL_TOKEN = "<EMAIL>"
IP_TOKEN = "<IP>"


def clean_redact_batch(batch: pa.Table, col: str = "text") -> pa.Table:
    """(doc_id, text, ...) -> + clean_text, n_emails, n_ips.

    Order matters and is part of the contract (mirrored in SQL):
    emails redact BEFORE IPs (an address inside an email's domain is
    already gone), control chars become spaces, whitespace collapses
    last so every substitution joins cleanly."""
    text = batch[col]
    n_emails = pc.cast(pc.count_substring_regex(text, EMAIL_RE), pa.int64())
    clean = pc.replace_substring_regex(text, EMAIL_RE, EMAIL_TOKEN)
    n_ips = pc.cast(pc.count_substring_regex(clean, IPV4_RE), pa.int64())
    clean = pc.replace_substring_regex(clean, IPV4_RE, IP_TOKEN)
    clean = pc.replace_substring_regex(clean, CONTROL_RE, " ")
    clean = pc.replace_substring_regex(clean, WS_RE, " ")
    clean = pc.utf8_trim_whitespace(clean)
    out = batch
    for name, arr in (("clean_text", clean), ("n_emails", n_emails),
                      ("n_ips", n_ips)):
        out = out.append_column(name, arr)
    return out


def clean_redact(ds, col: str = "text"):
    """Map-side only — no shuffle, scales linearly with the corpus."""
    return ds.map_batches(clean_redact_batch, batch_format="pyarrow",
                          zero_copy_batch=True)


def _sq(s: str) -> str:
    return s.replace("'", "''")


def clean_redact_sql(table: str = "documents", col: str = "text") -> str:
    """Exact DuckDB twin (RE2 regexp_replace with the 'g' flag), same
    substitution order."""
    email, ip, ctrl, ws = (_sq(EMAIL_RE), _sq(IPV4_RE), _sq(CONTROL_RE),
                           _sq(WS_RE))
    return f"""
SELECT doc_id,
  trim(regexp_replace(
    regexp_replace(
      regexp_replace(
        regexp_replace({col}, '{email}', '{EMAIL_TOKEN}', 'g'),
        '{ip}', '{IP_TOKEN}', 'g'),
      '{ctrl}', ' ', 'g'),
    '{ws}', ' ', 'g')) AS clean_text,
  length(regexp_extract_all({col}, '{email}'))::BIGINT AS n_emails,
  length(regexp_extract_all(
    regexp_replace({col}, '{email}', '{EMAIL_TOKEN}', 'g'),
    '{ip}'))::BIGINT AS n_ips
FROM {table}
"""


# C4-style blocklist document filter (Raffel et al. 2020 §2.2: drop
# any page containing a word from a blocklist). The list here is a
# stand-in config constant over the synthetic vocabulary; a real
# deployment passes its own. Token-level, case-insensitive — NOT a
# substring match, so "scanner" never trips a "scan" entry.
BLOCKLIST = ("spark", "tungsten", "unsafe")


def badwords_filter(ds, blocklist=BLOCKLIST, col: str = "text"):
    """Keep only documents containing NO blocklisted token. Pure
    map-side filter (the blocklist is config, not data): one token
    flatten + lower + is_in probe + per-doc any() per batch, zero
    shuffles — identical cost shape to hash_sample."""
    bl = pa.array(sorted({w.lower() for w in blocklist}), type=pa.string())

    def f(batch: pa.Table) -> pa.Table:
        from .bm25 import _flat_tokens_arrow

        flat, parent = _flat_tokens_arrow(batch[col])
        bad = pc.is_in(pc.utf8_lower(flat), value_set=bl).to_numpy(
            zero_copy_only=False)
        hits = (np.bincount(parent[bad], minlength=len(batch))
                if len(parent) else np.zeros(len(batch), np.int64))
        return batch.filter(pa.array(hits == 0))

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def badwords_filter_sql(blocklist=BLOCKLIST, table: str = "documents",
                        col: str = "text") -> str:
    """DuckDB twin: identical \\S+ tokenization + lowercase token
    membership test."""
    lst = ", ".join(f"'{w.lower()}'" for w in sorted(set(blocklist)))
    return rf"""
SELECT * FROM {table}
WHERE NOT list_has_any(
  list_transform(regexp_extract_all({col}, '\S+'), t -> lower(t)),
  [{lst}])"""
