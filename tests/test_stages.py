"""Unit tests of individual stages against hand-written expectations,
modeled on the reference's own unit tests (SURVEY.md §5:
TestRegexNamedSubMatch, Test_replaceByKey, concat semantics)."""

import pandas as pd
import pyarrow as pa
import pytest

from go_fluentd_ray.config import DEFAULT_CONFIG, AddOp, ConcatCfg
from go_fluentd_ray.stages.acceptor import acceptor_transform
from go_fluentd_ray.stages.concat import concat_bucket
from go_fluentd_ray.stages.enrich import Enricher, compile_template, eval_template
from go_fluentd_ray.stages.parse import parse_batch
from go_fluentd_ray.synth import SCHEMA


def _mk_input(rows):
    cols = {k: [r.get(k) for r in rows] for k in
            ("conv_id", "turn_idx", "role", "text", "tool", "ts")}
    cols["ts"] = [pd.Timestamp(t or "2024-06-01") for t in cols["ts"]]
    cols["turn_idx"] = [int(i or 0) for i in cols["turn_idx"]]
    return pa.table(
        {
            "conv_id": pa.array(cols["conv_id"], pa.string()),
            "turn_idx": pa.array(cols["turn_idx"], pa.int32()),
            "role": pa.array([r or "user" for r in cols["role"]], pa.string()),
            "text": pa.array(cols["text"], pa.string()),
            "tool": pa.array([t or "" for t in cols["tool"]], pa.string()),
            "ts": pa.array(cols["ts"], pa.timestamp("us")),
        }, schema=SCHEMA)


class TestAcceptor:
    def test_window_drop(self):
        t = _mk_input([
            {"conv_id": "c", "text": "x", "ts": "1990-01-01"},
            {"conv_id": "c", "turn_idx": 1, "text": "x", "ts": "2024-06-01"},
        ])
        out = acceptor_transform(t, DEFAULT_CONFIG)
        assert out.num_rows == 1 and out["turn_idx"][0].as_py() == 1

    def test_retag_first_match_wins(self):
        t = _mk_input([
            {"conv_id": "c", "text": "2024 - ms:cp|x ms_foo"},     # rule 1 before rule 2
            {"conv_id": "c", "turn_idx": 1, "text": "x ms_foo y"},  # rule 2
            {"conv_id": "c", "turn_idx": 2, "text": "plain"},       # catch-all
        ])
        out = acceptor_transform(t, DEFAULT_CONFIG)
        assert out["tag"].to_pylist() == ["cp.sit", "bot.sit", "app.spring.sit"]

    def test_unknown_tag_dropped(self):
        t = _mk_input([{"conv_id": "c", "text": "x", "tool": "editor"}])
        assert acceptor_transform(t, DEFAULT_CONFIG).num_rows == 0

    def test_spark_ignore(self):
        t = _mk_input([
            {"conv_id": "c", "text": "2024-01-01 10:00:00,123 [stage 1] hb",
             "tool": "bash"},
            {"conv_id": "c", "turn_idx": 1,
             "text": "2024/01/01 10:00:00.123 ok", "tool": "bash"},
        ])
        out = acceptor_transform(t, DEFAULT_CONFIG)
        assert out.num_rows == 1 and out["tag"][0].as_py() == "spark.sit"


HEAD = "2024-01-01 00:00:00.000 | app | INFO | t | c | 1: "


def _concat_df(texts, heads, conv="c", tag="app.spring.sit"):
    return pd.DataFrame({
        "conv_id": [conv] * len(texts),
        "turn_idx": range(len(texts)),
        "role": ["user"] * len(texts),
        "tool": [""] * len(texts),
        "ts": [pd.Timestamp("2024-06-01")] * len(texts),
        "tag": [tag] * len(texts),
        "text": texts,
        "is_head": heads,
        "concat_on": [True] * len(texts),
    })


def _cfg_maxlen(max_length):
    from go_fluentd_ray.config import PipelineConfig
    base = DEFAULT_CONFIG.concat["app.spring.sit"]
    return PipelineConfig(concat={
        "app.spring.sit": ConcatCfg(head_regex=base.head_regex,
                                    max_length=max_length)})


class TestConcat:
    def test_basic_merge(self):
        df = _concat_df([HEAD + "a", "cont1", "cont2", HEAD + "b"],
                        [True, False, False, True])
        out = concat_bucket(df, DEFAULT_CONFIG)
        assert out["text"].to_pylist() == [HEAD + "a\ncont1\ncont2", HEAD + "b"]
        assert out["merged_turns"].to_pylist() == [[0, 1, 2], [3]]

    def test_prehead_rows_pass_alone(self):
        df = _concat_df(["pre1", "pre2", HEAD + "a", "cont"],
                        [False, False, True, False])
        out = concat_bucket(df, DEFAULT_CONFIG)
        assert out["text"].to_pylist() == ["pre1", "pre2", HEAD + "a\ncont"]

    def test_max_length_flush(self):
        # content head(5)+cont(5) = 10 >= 10 -> flush after first append
        # (no joiner bytes counted, flush at >=, concator_f.go:196-201);
        # subsequent continuation lines emitted alone
        df = _concat_df(["headx", "aaaaa", "bbbbb", "ccccc"],
                        [True, False, False, False])
        out = concat_bucket(df, _cfg_maxlen(10))
        assert out["text"].to_pylist() == ["headx\naaaaa", "bbbbb", "ccccc"]

    def test_max_length_boundary_content_only(self):
        # maxlen=11: content 10 < 11 after first append (joiner byte NOT
        # counted) -> keep appending; 15 >= 11 at the second -> flush
        df = _concat_df(["headx", "aaaaa", "bbbbb", "ccccc"],
                        [True, False, False, False])
        out = concat_bucket(df, _cfg_maxlen(11))
        assert out["text"].to_pylist() == ["headx\naaaaa\nbbbbb", "ccccc"]

    def test_two_convs_no_bleed(self):
        a = _concat_df([HEAD + "a", "cont"], [True, False], conv="a")
        b = _concat_df(["contb", HEAD + "b"], [False, True], conv="b")
        df = pd.concat([a, b], ignore_index=True)
        out = concat_bucket(df, DEFAULT_CONFIG)
        texts = sorted(out["text"].to_pylist())
        assert texts == sorted([HEAD + "a\ncont", "contb", HEAD + "b"])

    def test_bucket_passthrough(self):
        df = _concat_df(["x", "y"], [True, True], tag="spark.sit")
        df["concat_on"] = False
        out = concat_bucket(df, DEFAULT_CONFIG)
        assert sorted(out["text"].to_pylist()) == ["x", "y"]
        assert out["n_merged"].to_pylist() == [1, 1]


def _parsed(texts, tag="app.spring.sit", cfg=DEFAULT_CONFIG):
    df = pd.DataFrame({
        "conv_id": ["c"] * len(texts), "turn_idx": range(len(texts)),
        "role": ["user"] * len(texts), "tool": [""] * len(texts),
        "ts": [pd.Timestamp("2024-06-01")] * len(texts),
        "tag": [tag] * len(texts), "text": texts,
        "n_merged": [1] * len(texts),
        "merged_turns": [[i] for i in range(len(texts))],
    })
    return parse_batch(pa.Table.from_pandas(df), cfg)


class TestParse:
    def test_groups_extracted_and_trimmed(self):
        out = _parsed(["2024-01-01 00:00:01.300 | paysvc | INFO | th-1 | "
                       "com.x.Y | 147:  hello  "])
        assert out.num_rows == 1
        r = out.to_pylist()[0]
        assert r["app"] == "paysvc" and r["level"] == "INFO"
        assert r["message"] == "hello"  # TrimSpace (utils.go:69)
        assert r["@timestamp"] == "2024-01-01T00:00:01.300000Z"

    def test_nonmatch_discarded(self):
        assert _parsed(["garbage"]).num_rows == 0

    def test_comma_decimal_fix(self):
        out = _parsed(["[2024-01-01 00:00:01,300] INFO base.app: m"],
                      tag="base.sit")
        assert out.to_pylist()[0]["@timestamp"] == "2024-01-01T00:00:01.300000Z"

    def test_json_tail(self):
        out = _parsed(['2024-01-01 00:00:01.300 | a | INFO | t | c | 1: '
                       'done {"user": "u7", "code": 201}'])
        r = out.to_pylist()[0]
        assert r["json_user"] == "u7" and r["json_code"] == 201

    def test_flatten_map_through_parse(self):
        # mirrors the reference TestFlattenMap (utils_test.go:11-54)
        # shape through the full parse stage: nested keys join with
        # "__" into the extra map; user/code absent -> typed lifts null
        out = _parsed(['2024-01-01 00:00:01.300 | a | INFO | t | c | 1: '
                       'done {"a": "1", "b": {"c": 2, "d": {"e": 3}}, "f": 4}'])
        r = out.to_pylist()[0]
        assert dict(r["extra"]) == {"a": "1", "b__c": "2",
                                    "b__d__e": "3", "f": "4"}
        assert r["json_user"] is None and r["json_code"] is None

    def test_json_noncastable_code_no_crash(self):
        # ADVICE regression: {"code": "abc"} must not raise ValueError
        # inside the Ray task; json_user keeps its value, code stays null
        out = _parsed(['2024-01-01 00:00:01.300 | a | INFO | t | c | 1: '
                       'done {"user": "u9", "code": "abc"}'])
        r = out.to_pylist()[0]
        assert r["json_user"] == "u9" and r["json_code"] is None
        assert dict(r["extra"]) == {"user": "u9", "code": "abc"}

    def test_json_invalid_kept_raw(self):
        out = _parsed(['2024-01-01 00:00:01.300 | a | INFO | t | c | 1: '
                       'done {not json}'])
        r = out.to_pylist()[0]
        assert r["json_user"] is None and "not json" in r["message"]

    def test_spark_time_format(self):
        out = _parsed(["2024/01/02 03:04:05.006 something"], tag="spark.sit")
        assert out.to_pylist()[0]["@timestamp"] == "2024-01-02T03:04:05.006000Z"


class TestEnrich:
    """Mirrors reference Test_replaceByKey cases (library/add_test.go:8-88)."""

    def _eval(self, template, batch_cols, tag="t"):
        batch = pa.table(batch_cols)
        return eval_template(compile_template(template), batch, tag).to_pylist()

    def test_literal(self):
        assert self._eval("lit", {"x": ["a"]}) == ["lit"]

    def test_col_sub(self):
        assert self._eval("%{x}!", {"x": ["a", None]}) == ["a!", "!"]

    def test_tag_sub(self):
        assert self._eval("t=%{@tag}", {"x": ["a"]}, tag="tg") == ["t=tg"]

    def test_lower_upper(self):
        assert self._eval("%{@lower:x}", {"x": ["AbC"]}) == ["abc"]
        assert self._eval("%{@upper:x}", {"x": ["AbC"]}) == ["ABC"]

    def test_missing_col_empty(self):
        assert self._eval("a%{nope}b", {"x": ["1"]}) == ["ab"]

    def test_delete_op(self):
        from go_fluentd_ray.config import PipelineConfig
        cfg = PipelineConfig(adds={"t1": (AddOp("level", None),)})
        batch = pa.table({"tag": ["t1", "t2"], "level": ["A", "B"]})
        out = Enricher(cfg)(batch)
        assert out["level"].to_pylist() == [None, "B"]


class TestPostfilters:
    def test_fields_filter_new_fields_and_include(self):
        from go_fluentd_ray.stages.postfilter import fields_filter_batch
        t = pa.table({"tag": ["t"], "@timestamp": ["x"], "lat": ["1.5"],
                      "lon": ["2.5"], "junk": ["drop me"]})
        out = fields_filter_batch(
            t, include=("location",),
            new_fields={"location": "${lat},${lon}"})
        assert out.column_names == ["tag", "@timestamp", "location"]
        assert out["location"].to_pylist() == ["1.5,2.5"]

    def test_fields_filter_missing_token_stays_literal(self):
        from go_fluentd_ray.stages.postfilter import fields_filter_batch
        t = pa.table({"tag": ["t"], "a": ["v"]})
        out = fields_filter_batch(t, new_fields={"x": "${a}-${nope}"})
        assert out["x"].to_pylist() == ["v-${nope}"]

    def test_fields_filter_exclude(self):
        from go_fluentd_ray.stages.postfilter import fields_filter_batch
        t = pa.table({"tag": ["t"], "a": ["1"], "b": ["2"]})
        out = fields_filter_batch(t, exclude=("b",))
        assert out.column_names == ["tag", "a"]

    def test_forward_tag_rewrite(self):
        from go_fluentd_ray.stages.postfilter import forward_tag_rewrite_batch
        t = pa.table({"tag": ["forward-wechat.{env}", "keepme"],
                      "orig_tag": ["wechat.sit", "nodot"]})
        out = forward_tag_rewrite_batch(t)
        assert out["tag"].to_pylist() == ["forward-wechat.sit", "keepme"]

    def test_truncate(self):
        from go_fluentd_ray.config import PipelineConfig
        from go_fluentd_ray.stages.postfilter import truncate_batch
        cfg = PipelineConfig(max_field_len=4)
        t = pa.table({"a": ["abcdefgh", None, "xy"], "n": [1, 2, 3]})
        out = truncate_batch(t, cfg)
        assert out["a"].to_pylist() == ["abcd", None, "xy"]
        assert out["n"].to_pylist() == [1, 2, 3]


class TestEnrichExtraTokens:
    """%{@id}, %{@now}/%{@unix}, %{@str:N} (library/add.go:14-27)."""

    def test_unixof_iso_string_col(self):
        # custom_bigdata.go:60-70: rowkey = field + '_' + unix(@timestamp)
        batch = pa.table({"app": ["vin1", "vin2", "vin3"],
                          "@timestamp": ["2024-01-01T00:00:01.300000Z",
                                         "not-a-time", None]})
        out = eval_template(
            compile_template("%{app}_%{@unixof:@timestamp}"), batch, "t"
        ).to_pylist()
        assert out == ["vin1_1704067201", "vin2_", "vin3_"]

    def test_unixof_timestamp_col(self):
        batch = pa.table({"ts": pa.array(
            [pd.Timestamp("2024-01-01 00:00:01.9")], pa.timestamp("us"))})
        out = eval_template(
            compile_template("%{@unixof:ts}"), batch, "t").to_pylist()
        assert out == ["1704067201"]  # floor, not round

    def _ev(self, template, cols, **kw):
        from go_fluentd_ray.stages.enrich import compile_template, eval_template
        return eval_template(compile_template(template), pa.table(cols),
                             "tg", **kw).to_pylist()

    def test_id(self):
        out = self._ev("%{@id}", {"conv_id": ["c1"],
                                  "turn_idx": pa.array([7], pa.int32())})
        assert out == ["c1-7"]

    def test_now_unix(self):
        import datetime
        now = datetime.datetime(2024, 3, 1, 12, 0, 0)
        assert self._ev("%{@now}", {"x": ["a"]}, now=now) == ["2024-03-01T12:00:00Z"]
        unix = self._ev("%{@unix}", {"x": ["a"]}, now=now)[0]
        assert unix == str(int(now.timestamp()))

    def test_str_deterministic(self):
        a = self._ev("%{@str:6}", {"x": ["a"]}, seed=5)
        b = self._ev("%{@str:6}", {"x": ["a"]}, seed=5)
        assert a == b and len(a[0]) == 6


class TestRemoveOrigLog:
    def test_text_dropped(self):
        from go_fluentd_ray.config import ParserCfg, PipelineConfig
        cfg = PipelineConfig(parsers={
            "app.spring.sit": ParserCfg(
                pattern=DEFAULT_CONFIG.parsers["app.spring.sit"].pattern,
                must_include="app", is_remove_orig_log=True)})
        out = _parsed(["2024-01-01 00:00:01.300 | a | INFO | t | c | 1: m"],
                      cfg=cfg)
        r = out.to_pylist()[0]
        assert r["text"] is None and r["message"] == "m"


class TestParserBypass:
    """Tags without a parser config bypass the parse stage unchanged
    (tagfilters/pipeline.go:88-91) — review finding regression."""

    def test_unparsed_tag_passes_through(self):
        from go_fluentd_ray.config import ParserCfg, PipelineConfig
        cfg = PipelineConfig(parsers={
            "app.spring.sit": DEFAULT_CONFIG.parsers["app.spring.sit"]})
        out = _parsed(["raw line no parser"], tag="spark.sit", cfg=cfg)
        assert out.num_rows == 1
        r = out.to_pylist()[0]
        assert r["text"] == "raw line no parser"
        assert r["@timestamp"] is None and r["message"] is None

    def test_oracle_agrees(self):
        import pyarrow as _pa
        from go_fluentd_ray import oracle as _o
        from go_fluentd_ray.config import PipelineConfig
        from go_fluentd_ray.pipelines import flagship
        from go_fluentd_ray.synth import transcript_table
        cfg = PipelineConfig(parsers={
            "app.spring.sit": DEFAULT_CONFIG.parsers["app.spring.sit"]})
        t = transcript_table(3000)
        got = flagship.run_local(t, cfg)
        want, _ = _o.run_oracle(t, cfg)
        assert got.equals(want) and got.num_rows > 0
