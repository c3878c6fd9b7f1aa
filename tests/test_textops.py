"""Oracle tests for the reference-semantics ports (utils.py quirks included)."""

from __future__ import annotations

from ai_service_ocr_grading_handler_spark.core import textops as T


def test_find_data_in_string_ocr_variants():
    # utils.py:168-182 semantics — NOTE the reference quirk: wrapping-quote
    # strip runs FIRST (utils.py:169), so an input that *ends* with `"` loses
    # the closing quote of its ocr:"..." payload and falls back to the
    # cleaned string. Preserved exactly.
    assert T.find_data_in_string('ocr: "hello world" said it') == "hello world"
    assert T.find_data_in_string("OCR: 'case insensitive' x") == "case insensitive"
    assert T.find_data_in_string('{"ocr": "json form"}') == "json form"
    assert T.find_data_in_string('ocr: "hello world"') == 'ocr: "hello world'
    assert T.find_data_in_string('"""wrapped quotes"""') == "wrapped quotes"
    assert T.find_data_in_string("no pattern here") == "no pattern here"
    # first match wins; ocr: pattern matches take priority over {json} matches
    assert T.find_data_in_string('ocr: "first" ocr: "second" end') == "first"


def test_find_data_in_string_claude_json():
    # utils.py:183-189: first minimal {...} block, DOTALL
    s = 'text before {"ocr": "v",\n "x": 1} trailing {"other": 2}'
    assert T.find_data_in_string(s, "claude-json") == '{"ocr": "v",\n "x": 1}'
    assert T.find_data_in_string("no braces", "claude-json") == "no braces"


def test_find_data_in_string_essay():
    # utils.py:190-203 -> (formatted feedback, level score)
    s = (
        '{"FeedbackPointName": "A", "levelName": "Effective", "improvement": "x"}'
        ' junk {"FeedbackPointName": "B", "levelName": "Fair", "improvement": "y"}'
        ' {"FeedbackPointName": "C", "levelName": "Poor", "improvement": "z"}'
    )
    feedback, score = T.find_data_in_string(s, "argumentative-essay-ocr")
    assert score == 1.5  # 1 + 0.5 + 0
    assert feedback == "A - x\n\nB - y\n\nC - z"


def test_convert_feedback_format_levels():
    import json

    fb = json.dumps(
        [
            {"FeedbackPointName": "P", "levelName": lv, "improvement": "i"}
            for lv in ["Effective", "Good", "Satisfactory", "Normal", "Fair", "Poor", None]
        ]
    )
    _, score = T.convert_feedback_format(fb)
    assert score == 4.0  # 1+1+1+0.5+0.5+0+0(None skipped)


def test_convert_rubric_to_string():
    rub = [
        {"rubricId": "r1", "score": 2.0, "criteria": "clarity"},
        {"rubricId": "r2", "score": 1.5, "criteria": "grammar"},
    ]
    assert (
        T.convert_rubric_to_string(rub)
        == "Rubrics: 2.0 Points: clarity, 1.5 Points: grammar, "
    )
    assert T.convert_rubric_to_string("passthrough") == "passthrough"


def test_assign_rubric_id_to_response_positional():
    # utils.py:205-221 — POSITIONAL zip, not keyed
    rubrics = [
        {"rubricId": "rA", "score": 2.0, "criteria": "c1"},
        {"rubricId": "rB", "score": 3.0, "criteria": "c2"},
    ]
    resp = [
        {"rubricText": "t1", "rubricIndex": 1, "rubricWiseScore": 1.5},
        {"rubricText": "t2", "rubricIndex": 2, "rubricWiseScore": 3.0},
    ]
    out, score, max_score = T.assign_rubric_id_to_response(rubrics, resp)
    assert score == 4.5 and max_score == 5.0
    assert out[0] == {"rubricId": "rA", "rubricWiseMaxScore": 2.0, "criteria": "c1", "rubricWiseScore": 1.5}
    assert out[1]["rubricId"] == "rB"
    # non-list rubric -> zeros
    assert T.assign_rubric_id_to_response("x", resp)[1:] == (0, 0)


def test_flags_reference_quirks():
    # isCorrect: utils.py:95-100
    assert T.correctness_flag(5.0, 5.0) is True
    assert T.correctness_flag(2.5, 5.0) is False
    assert T.correctness_flag(0, 5.0) is False
    # isBlank: utils.py:102-111 — dead 'Empty Response' lowercase branch:
    # 'Empty Response'.lower() != 'Empty Response', so NOT blank (bug preserved)
    assert T.blankness_flag("") is True
    assert T.blankness_flag("Empty Response") is False
    assert T.blankness_flag("empty response") is False
    assert T.blankness_flag("real answer") is False
    assert T.blankness_flag(0) is False  # int branch: 0=='' is False


def test_route_model_chain():
    # gen_ai_calling.py:140-159
    assert T.route_model("expository-essay-ocr", None) == "claude-vision-ocr"
    assert T.route_model("ocr", None) == "gpt-ocr-vision"
    assert T.route_model("OCR", None) == "gpt-ocr-vision"
    assert T.route_model("gpt-ocr", None) == "gpt-ocr-vision"
    assert T.route_model("gpt-grading-only", None) == "gpt-4-latest"
    assert T.route_model("claude-ocr", None) == "claude-vision-ocr"
    assert T.route_model("argumentative-essay-ocr", None) == "shozemi-gpt-latest"
    assert T.route_model("gemini-number", None) == "gemini-vision-number"
    assert T.route_model("whole-page-ocr", None) == "whole-page-ocr"
    assert T.route_model("default", "claude-latest") == "claude-latest"
    assert T.route_model("default", "") == "gpt-4-latest"


def test_mapping_model_with_name():
    # utils.py:141-145 + gen_ai_calling.py:13-31
    assert T.mapping_model_with_name("gpt-4-latest") == {
        "modelName": "gpt-4o",
        "modelClass": "gptText",
    }
    assert T.mapping_model_with_name("nope") == "model does not found"
    assert len(T.LLM_NAME_MAPPING) == 16


def test_find_data_in_string_is_total():
    """Totality (deliberate divergence from the crashing reference): None
    input yields the empty result; prose braces that are not JSON are
    skipped, not fatal (review findings)."""
    from ai_service_ocr_grading_handler_spark.core.textops import find_data_in_string

    assert find_data_in_string(None, "ocr") == ""
    assert find_data_in_string(None, "claude-json") == ""
    assert find_data_in_string(None, "argumentative-essay-ocr") == ("", 0.0)
    fb, sc = find_data_in_string(
        'the set {a, b} is fine {"FeedbackPointName": "Clarity",'
        ' "improvement": "tighten", "levelName": "Good"} done',
        "argumentative-essay-ocr",
    )
    assert fb == "Clarity - tighten" and sc == 1.0


def test_route_model_null_modelname_yields_sentinel():
    """gen_ai_calling.py:159 falls back ONLY on the empty string: a JSON
    null modelName is returned as-is and the alias mapping then yields the
    'model does not found' sentinel (review finding)."""
    from ai_service_ocr_grading_handler_spark.core.textops import (
        mapping_model_with_name,
        route_model,
    )

    assert route_model("some-other-prompt", None) is None
    assert mapping_model_with_name(None) == "model does not found"
    assert route_model("some-other-prompt", "") == "gpt-4-latest"


def test_find_data_in_string_total_fuzz():
    """Totality fuzz: arbitrary unicode text (braces, quotes, newlines,
    control chars included) must never raise in any extraction mode."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from ai_service_ocr_grading_handler_spark.core.textops import find_data_in_string

    @settings(max_examples=300, deadline=None)
    @given(st.text(max_size=300))
    def run(s):
        find_data_in_string(s, "ocr")
        find_data_in_string(s, "claude-json")
        fb, sc = find_data_in_string(s, "argumentative-essay-ocr")
        # score is int 0 when nothing matches (reference-faithful); the
        # Spark UDF float()-wraps it
        assert isinstance(fb, str) and isinstance(sc, (int, float))

    run()
