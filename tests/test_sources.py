"""Receiver-stage semantics (SURVEY.md §2.1): HTTP signed-JSON ingest,
rsyslog normalization, kafka dual-path parse."""

import hashlib

import pandas as pd
import pyarrow as pa

from go_fluentd_ray.sources.receivers import (
    http_validate_batch,
    kafka_parse_batch,
    rsyslog_transform_batch,
)

SALT = "spark-graft-salt"


def _sig(ts):
    return hashlib.md5((ts + SALT).encode()).hexdigest()


class TestHttp:
    def _batch(self, rows):
        return pa.table({
            "tag": pa.array([r.get("tag", "t") for r in rows]),
            "timestamp": pa.array([r["timestamp"] for r in rows]),
            "sig": pa.array([r.get("sig", _sig(r["timestamp"])) for r in rows]),
            "msg": pa.array([r.get("msg", "m") for r in rows]),
        })

    def test_valid_passes_and_is_retagged(self):
        out = http_validate_batch(self._batch(
            [{"timestamp": "2024-01-10T10:00:00", "tag": "orig"}]))
        r = out.to_pylist()[0]
        assert r["tag"] == "http.sit" and r["orig_tag"] == "orig"

    def test_bad_signature_dropped(self):
        out = http_validate_batch(self._batch(
            [{"timestamp": "2024-01-10T10:00:00", "sig": "nope"}]))
        assert out.num_rows == 0

    def test_bad_format_dropped(self):
        out = http_validate_batch(self._batch(
            [{"timestamp": "2024-01-10T10:00:00.123"}]))
        assert out.num_rows == 0

    def test_out_of_window_dropped(self):
        out = http_validate_batch(self._batch(
            [{"timestamp": "2025-06-10T10:00:00"}]))
        assert out.num_rows == 0


class TestRsyslog:
    def test_transform(self):
        t = pa.table({
            "timestamp": pa.array([pd.Timestamp("2024-01-01 00:00:00")],
                                  type=pa.timestamp("us")),
            "msg": pa.array(["hello"]),
            "lvl": pa.array(["6"]),
        })
        out = rsyslog_transform_batch(t, time_shift_sec=3600,
                                      rewrite={"lvl": "severity"})
        r = out.to_pylist()[0]
        assert r["@timestamp"] == "2024-01-01T01:00:00.000000Z"  # +1h shift
        assert r["message"] == "hello"       # msg_key rename
        assert r["severity"] == "6"          # rewrite_tags rename
        assert r["tag"] == "emqtt.sit"
        assert "timestamp" not in out.column_names


class TestKafka:
    def test_json_path_with_tag_key(self):
        t = pa.table({"value": pa.array(
            ['{"log": "x", "tag": "app.sit", "app": "svc", "level": "INFO"}'])})
        r = kafka_parse_batch(t).to_pylist()[0]
        assert r["log"] == "x" and r["tag"] == "app.sit"
        assert r["app"] == "svc" and r["level"] == "INFO"

    def test_raw_path_on_invalid_json(self):
        t = pa.table({"value": pa.array(["not json at all"])})
        r = kafka_parse_batch(t).to_pylist()[0]
        assert r["log"] == "not json at all" and r["tag"] == "kafka.sit"

    def test_raw_mode(self):
        t = pa.table({"value": pa.array(['{"log": "x"}'])})
        r = kafka_parse_batch(t, is_json_format=False).to_pylist()[0]
        assert r["log"] == '{"log": "x"}'  # kept raw when not json format
