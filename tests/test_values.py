"""Unit tests for datavalue parsing, canonicalization and hashing (M1-M4)."""
import json

from wikidata_edit_history_ray.core.values import (
    classify_user,
    get_time_feature,
    homogenize_snak,
    id_to_int,
    parse_datavalue_json,
    parse_revision_text,
    parse_statement_datavalue,
    safe_get_nested,
    snak_value_hash,
    split_change_type,
)


def snak(value, type_):
    return {"snaktype": "value", "property": "P1", "hash": "wd1",
            "datavalue": {"value": value, "type": type_}}


class TestParseRevisionText:
    def test_plain_json(self):
        assert parse_revision_text('{"a": 1}') == {"a": 1}

    def test_html_escaped(self):
        assert parse_revision_text("{&quot;a&quot;: 1}") == {"a": 1}

    def test_smart_quotes(self):
        assert parse_revision_text('{“a”: 1}') == {"a": 1}

    def test_control_chars_stripped(self):
        assert parse_revision_text('{"a": "x\x01y"}') == {"a": "xy"}

    def test_unrecoverable_returns_none(self):
        assert parse_revision_text('{"a": truncated') is None

    def test_second_stage_fallback(self):
        # html.unescape can corrupt text containing entity-like sequences;
        # the second stage parses the raw original
        raw = '{"a": "x&l\x00t;y"}'
        assert parse_revision_text(raw) is not None


class TestDatavalueParsing:
    def test_entity_with_id(self):
        v, dt, md = parse_datavalue_json(
            {"entity-type": "item", "numeric-id": 5, "id": "Q5"}, "wikibase-entityid")
        assert v == "Q5" and dt == "wikibase-entityid" and md == {}

    def test_entity_numeric_only(self):
        v, _, _ = parse_datavalue_json({"entity-type": "item", "numeric-id": 7},
                                       "wikibase-entityid")
        assert v == "Q7"

    def test_time_value_and_metadata_split(self):
        v, dt, md = parse_datavalue_json(
            {"time": "+2013-10-28T00:00:00Z", "timezone": 0, "before": 0,
             "after": 0, "precision": 11, "calendarmodel": "http://cal/Q1985727"},
            "time")
        assert v == "+2013-10-28T00:00:00Z"
        assert md == {"precision": 11, "calendarmodel": "http://cal/Q1985727"}

    def test_globecoordinate_pair(self):
        v, _, md = parse_datavalue_json(
            {"latitude": 52.5, "longitude": 13.4, "precision": 0.001,
             "globe": "http://g/Q2", "altitude": None}, "globecoordinate")
        assert v == {"longitude": 13.4, "latitude": 52.5}
        assert md == {"precision": 0.001, "globe": "http://g/Q2"}

    def test_monolingualtext(self):
        v, _, md = parse_datavalue_json({"text": "hi", "language": "en"},
                                        "monolingualtext")
        assert v == "hi" and md == {"language": "en"}

    def test_plain_string(self):
        v, dt, md = parse_datavalue_json("hello", "string")
        assert v == "hello" and md == {}

    def test_novalue_somevalue(self):
        assert parse_statement_datavalue(
            {"mainsnak": {"snaktype": "novalue"}}) == ("novalue", "unknown-values", None)
        assert parse_statement_datavalue(
            {"mainsnak": {"snaktype": "somevalue"}}) == ("somevalue", "unknown-values", None)


class TestHomogenizeAndHash:
    def test_zero_padded_time_hash_equal(self):
        a = snak({"time": "+00000002013-10-28T00:00:00Z", "timezone": 0,
                  "before": 0, "after": 0, "precision": 11,
                  "calendarmodel": "http://cal/Q1985727"}, "time")
        b = snak({"time": "+2013-10-28T00:00:00Z", "timezone": 0, "before": 0,
                  "after": 0, "precision": 11,
                  "calendarmodel": "http://cal/Q1985727"}, "time")
        assert snak_value_hash(homogenize_snak(a)) == snak_value_hash(homogenize_snak(b))

    def test_numeric_id_only_entity_hash_equal(self):
        a = snak({"entity-type": "item", "numeric-id": 15241312}, "wikibase-entityid")
        b = snak({"entity-type": "item", "numeric-id": 15241312, "id": "Q15241312"},
                 "wikibase-entityid")
        assert snak_value_hash(homogenize_snak(a)) == snak_value_hash(homogenize_snak(b))

    def test_altitude_dropped(self):
        a = snak({"latitude": 1.0, "longitude": 2.0, "altitude": None,
                  "precision": 0.1}, "globecoordinate")
        b = snak({"latitude": 1.0, "longitude": 2.0, "precision": 0.1},
                 "globecoordinate")
        assert snak_value_hash(homogenize_snak(a)) == snak_value_hash(homogenize_snak(b))

    def test_novalue_keeps_upstream_hash(self):
        s = {"snaktype": "novalue", "property": "P1", "hash": "orig"}
        assert snak_value_hash(homogenize_snak(s)) == "orig"

    def test_hash_is_sha1_of_compact_json(self):
        import hashlib

        s = homogenize_snak(snak("x", "string"))
        expected = hashlib.sha1(
            json.dumps(s["datavalue"], separators=(",", ":")).encode()).hexdigest()
        assert snak_value_hash(s) == expected

    def test_homogenize_idempotent(self):
        s = snak({"time": "+0002013-01-01T00:00:00Z", "before": 0, "after": 1,
                  "precision": 9}, "time")
        once = json.dumps(homogenize_snak(s))
        twice = json.dumps(homogenize_snak(json.loads(once)))
        assert once == twice


class TestScalars:
    def test_split_change_type(self):
        assert split_change_type("CREATE_PROPERTY_VALUE") == ("CREATE", "PROPERTY_VALUE")
        assert split_change_type("UPDATE_RANK") == ("UPDATE", "RANK")
        assert split_change_type(None) == (None, None)

    def test_id_to_int(self):
        assert id_to_int("Q42") == 42
        assert id_to_int("P31") == 31

    def test_classify_user(self):
        assert classify_user("FixBot") == "bot"
        assert classify_user("roBOTic") == "bot"  # substring heuristic, by design
        assert classify_user("") == "anonymous"
        assert classify_user("Alice") == "human"

    def test_safe_get_nested_schema_drift(self):
        assert safe_get_nested({"labels": []}, "labels", "en", "value") == {}
        assert safe_get_nested({"labels": {"en": {"value": "x"}}},
                               "labels", "en", "value") == "x"

    def test_time_buckets(self):
        ts = "2017-09-14T10:00:00Z"
        assert get_time_feature(ts, "year") == "2017"
        assert get_time_feature(ts, "year_month") == "2017-09"
        assert get_time_feature(ts, "week") == "2017-W37"
