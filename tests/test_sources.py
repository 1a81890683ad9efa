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


class TestFluentdFrames:
    """fluentd-forward msgpack frame decode (recvs/fluentd.go:209-342):
    three frame shapes, malformed discards."""

    def _roundtrip(self, frames_bytes):
        from go_fluentd_ray.sources.fluentd_frames import frames_to_table

        return frames_to_table(frames_bytes)

    def test_three_shapes(self):
        import msgpack

        buf = b"".join([
            # Forward
            msgpack.packb(["t1", [[100, {"log": "a", "k": 1}],
                                  [101, {"log": "b"}]]]),
            # PackedForward
            msgpack.packb(["t2", msgpack.packb([102, {"log": "c"}])
                           + msgpack.packb([103, {"log": "d"}])]),
            # Message
            msgpack.packb(["t3", 104, {"log": "e", "meta": {"dc": "x"}}]),
        ])
        out = self._roundtrip(buf).to_pylist()
        assert [(r["tag"], r["time"], r["message"]) for r in out] == [
            ("t1", 100, "a"), ("t1", 101, "b"),
            ("t2", 102, "c"), ("t2", 103, "d"), ("t3", 104, "e")]
        # nested record keys flatten with __ (FlattenMap parity)
        assert dict(out[4]["extra"]) == {"log": "e", "meta__dc": "x"}

    def test_malformed_discarded(self):
        import msgpack

        from go_fluentd_ray.sources.fluentd_frames import decode_stream

        buf = b"".join([
            msgpack.packb(["only-tag"]),            # arity < 2
            msgpack.packb([42, 1, {"log": "x"}]),   # non-str tag
            msgpack.packb(["t", 1, "not-a-map"]),   # record not a map
            msgpack.packb(["t", [[1, "not-a-map"]]]),
            msgpack.packb(["ok", 5, {"log": "kept"}]),
        ])
        rows, discarded = decode_stream(buf)
        assert len(rows) == 1 and rows[0][0] == "ok"
        assert discarded == 4

    def test_ray_source_end_to_end(self):
        from go_fluentd_ray import synth
        from go_fluentd_ray.sources.fluentd_frames import read_fluentd_frames

        path = synth.ensure_fluentd_corpus(400)
        ds = read_fluentd_frames(path)
        df = ds.to_pandas()
        assert len(df) == 400
        assert set(df["tag"]) <= {"spring.sit", "spark.sit", "ai.sit"}
        assert df["message"].str.startswith("line-").all()


class TestEsBulkSink:
    def test_bulk_format_and_roundtrip(self, tmp_path):
        import gzip
        import json as _json

        import pyarrow as pa
        import ray.data as rd

        from go_fluentd_ray.oracle import OUTPUT_SCHEMA
        from go_fluentd_ray.pipelines.flagship import run_local
        from go_fluentd_ray.stages.sinks import write_es_bulk
        from go_fluentd_ray.synth import transcript_table

        out = run_local(transcript_table(2000))
        ds = rd.from_arrow(out)
        summary = write_es_bulk(ds, str(tmp_path)).to_pandas()
        assert summary["docs"].sum() == out.num_rows
        docs = 0
        indexes = set()
        for f in tmp_path.glob("bulk-*.ndjson.gz"):
            lines = gzip.open(f, "rt").read().splitlines()
            assert len(lines) % 2 == 0
            for i in range(0, len(lines), 2):
                action = _json.loads(lines[i])
                doc = _json.loads(lines[i + 1])
                assert action["index"]["_type"] == "logs"
                indexes.add(action["index"]["_index"])
                assert "conv_id" in doc and "merged_turns" not in doc
                docs += 1
        assert docs == out.num_rows
        assert indexes == set(pa.compute.unique(out["sink"]).to_pylist())


class TestFluentdForwardSink:
    def test_encode_decode_roundtrip(self, tmp_path):
        import ray.data as rd

        from go_fluentd_ray.pipelines.flagship import run_local
        from go_fluentd_ray.sources.fluentd_frames import decode_stream
        from go_fluentd_ray.stages.sinks import write_fluentd_forward
        from go_fluentd_ray.synth import transcript_table

        out = run_local(transcript_table(2000))
        ds = rd.from_arrow(out)
        summary = write_fluentd_forward(ds, str(tmp_path)).to_pandas()
        assert summary["rows"].sum() == out.num_rows
        # decode every frame file with this repo's own forward decoder
        rows = []
        for f in tmp_path.glob("fwd-*.msgpack"):
            decoded, discarded = decode_stream(f.read_bytes())
            assert discarded == 0
            rows.extend(decoded)
        assert len(rows) == out.num_rows
        # record payloads match the routed rows exactly (tag from the
        # frame == record's tag column; null fields omitted)
        want = {}
        for r in out.to_pylist():
            key = (r["conv_id"], r["turn_idx"])
            want[key] = {k: v for k, v in r.items()
                         if v is not None and k not in
                         ("merged_turns", "extra", "bucket", "ts",
                          "@timestamp")}
        for tag, _t, rec in rows:
            assert rec["tag"] == tag
            key = (rec["conv_id"], rec["turn_idx"])
            got = {k: v for k, v in rec.items()
                   if k not in ("ts", "@timestamp")}
            assert got == want[key], key

    def test_event_time_from_timestamp(self):
        import datetime

        import pyarrow as pa

        from go_fluentd_ray.sources.fluentd_frames import decode_stream
        from go_fluentd_ray.stages.sinks import fluentd_forward_payload

        batch = pa.table({
            "tag": ["a.sit", "a.sit", "b.sit"],
            "@timestamp": ["2024-01-05T06:07:08.000Z", None,
                           "2024-01-05T00:00:00.000Z"],
            "msg": ["x", "y", "z"],
        })
        rows, disc = decode_stream(fluentd_forward_payload(batch))
        assert disc == 0
        by_msg = {rec["msg"]: (tag, t) for tag, t, rec in rows}
        epoch = int(datetime.datetime.fromisoformat(
            "2024-01-05T06:07:08").timestamp())
        assert by_msg["x"] == ("a.sit", epoch)
        assert by_msg["y"][1] == 0          # no timestamp -> advisory 0
        assert by_msg["z"][0] == "b.sit"


class TestKafkaJsonSink:
    def test_per_topic_roundtrip(self, tmp_path):
        import json as _json

        import pyarrow as pa
        import ray.data as rd

        from go_fluentd_ray.pipelines.flagship import run_local
        from go_fluentd_ray.stages.sinks import write_kafka_json
        from go_fluentd_ray.synth import transcript_table

        out = run_local(transcript_table(2000))
        ds = rd.from_arrow(out)
        summary = write_kafka_json(ds, str(tmp_path)).to_pandas()
        assert summary["msgs"].sum() == out.num_rows
        topics = set()
        msgs = 0
        for d in tmp_path.glob("topic=*"):
            topic = d.name.split("=", 1)[1]
            topics.add(topic)
            for f in d.glob("msgs-*.ndjson"):
                for line in f.read_text().splitlines():
                    rec = _json.loads(line)
                    assert "sink" not in rec  # topic carried by the dir
                    assert "conv_id" in rec and "merged_turns" not in rec
                    msgs += 1
        assert msgs == out.num_rows
        assert topics == set(pa.compute.unique(out["sink"]).to_pylist())


class TestFluentdTranscriptFrames:
    def test_decoded_parquet_equals_ray_decode(self, tmp_path):
        """The SQL oracle's decoded-parquet twin and the Ray reader
        must see the SAME table (that equality is what lets the
        composed fluentd_pipeline be oracle-checked past the decode)."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from go_fluentd_ray import synth
        from go_fluentd_ray.sources.fluentd_frames import (
            read_fluentd_transcripts, transcripts_from_stream)

        frames = synth.ensure_fluentd_transcript_corpus(3000)
        decoded = synth.ensure_fluentd_decoded(3000)
        want = pq.read_table(decoded)
        got = pa.concat_tables([
            transcripts_from_stream(
                open(f"{frames}/{n}", "rb").read())
            for n in sorted(__import__("os").listdir(frames))
            if n.endswith(".msgpack")])
        assert got.equals(want)
        # and the Ray reader round-trips to the same multiset of rows
        ray_rows = read_fluentd_transcripts(frames).to_pandas()
        assert len(ray_rows) == want.num_rows
        key = ["conv_id", "turn_idx"]
        a = ray_rows.sort_values(key).reset_index(drop=True)
        b = want.to_pandas().sort_values(key).reset_index(drop=True)
        assert a[sorted(a.columns)].equals(b[sorted(b.columns)])

    def test_source_rows_match_transcripts(self):
        """Frames carry the transcript corpus losslessly (ts round-trips
        as epoch micros, no string formatting)."""
        import pyarrow.parquet as pq

        from go_fluentd_ray import synth

        n = 3000
        src = pq.read_table(synth.ensure_corpus(n))
        dec = pq.read_table(synth.ensure_fluentd_decoded(n))
        assert dec.num_rows == src.num_rows
        a = src.to_pandas().sort_values(["conv_id", "turn_idx"]).reset_index(
            drop=True)
        b = dec.to_pandas().sort_values(["conv_id", "turn_idx"]).reset_index(
            drop=True)
        assert a.equals(b[a.columns.tolist()])


class TestHttpForwardSink:
    def test_gzip_json_array_roundtrip(self, tmp_path):
        import gzip
        import json as _json

        import ray.data as rd

        from go_fluentd_ray.pipelines.flagship import run_local
        from go_fluentd_ray.stages.sinks import write_http_forward
        from go_fluentd_ray.synth import transcript_table

        out = run_local(transcript_table(2000))
        ds = rd.from_arrow(out)
        summary = write_http_forward(ds, str(tmp_path)).to_pandas()
        assert summary["msgs"].sum() == out.num_rows
        msgs = []
        for f in tmp_path.glob("post-*.json.gz"):
            body = _json.loads(gzip.decompress(f.read_bytes()))
            assert isinstance(body, list)  # JSON array per POST body
            msgs.extend(body)
        assert len(msgs) == out.num_rows
        want = {(r["conv_id"], r["turn_idx"]): r for r in out.to_pylist()}
        for m in msgs:
            w = want[(m["conv_id"], m["turn_idx"])]
            assert m["tag"] == w["tag"] and m["sink"] == w["sink"]
            assert "merged_turns" not in m
