"""go_fluentd_ray — a Ray-Data-native log/transcript processing engine.

A from-scratch rewrite of the *capabilities* of Laisky/go-fluentd
(reference at /root/reference, see SURVEY.md) on idiomatic Ray Data:
window filter -> retag/route -> multi-line concat -> grok/regex parse
-> enrich -> post-filter -> per-sink fan-out + aggregates, plus the
training-data operators a 100 TB pipeline needs (dedup, similarity
search, text analysis, multimodal plumbing).

No module in this package calls ray.init()/ray.shutdown(); sessions are
owned by bench.py / tests / the driver.
"""

__version__ = "0.1.0"
