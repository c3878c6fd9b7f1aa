"""Spark scoring columns vs the pure-Python reference ports (textops)."""

from __future__ import annotations

import pyspark.sql.functions as F

from ai_service_ocr_grading_handler_spark.core import textops as T
from ai_service_ocr_grading_handler_spark.operators import scoring

RUBRIC_SCHEMA = "array<struct<rubricId:string,score:double,criteria:string>>"
RESP_SCHEMA = "array<struct<rubricText:string,rubricIndex:int,rubricWiseScore:double>>"


def _grade_case(spark, rubrics, responses, text="ans"):
    df = spark.createDataFrame(
        [(text, rubrics, responses)],
        f"text string, rubrics {RUBRIC_SCHEMA}, responses {RESP_SCHEMA}",
    )
    return scoring.grade(df).collect()[0]


def test_grade_matches_reference_oracle(spark):
    rubrics = [
        {"rubricId": "rA", "score": 2.0, "criteria": "c1"},
        {"rubricId": "rB", "score": 3.0, "criteria": "c2"},
        {"rubricId": "rC", "score": 0.5, "criteria": "c3"},
    ]
    responses = [
        {"rubricText": "t1", "rubricIndex": 1, "rubricWiseScore": 1.5},
        {"rubricText": "t2", "rubricIndex": 2, "rubricWiseScore": 3.0},
        {"rubricText": "t3", "rubricIndex": 3, "rubricWiseScore": 0.0},
    ]
    row = _grade_case(spark, rubrics, responses)
    oracle_resp, oscore, omax = T.assign_rubric_id_to_response(
        [dict(r) for r in rubrics],
        [dict(r) for r in responses],
    )
    assert row["score"] == oscore == 4.5
    assert row["max_score"] == omax == 5.5
    assert row["is_correct"] == T.correctness_flag(oscore, omax) is False
    got = [r.asDict() for r in row["rubric_wise_response"]]
    assert len(got) == len(oracle_resp)  # zip must not truncate (review)
    for g, o in zip(got, oracle_resp):
        assert g["rubricId"] == o["rubricId"]
        assert g["rubricWiseScore"] == o["rubricWiseScore"]
        assert g["rubricWiseMaxScore"] == o["rubricWiseMaxScore"]
        assert g["criteria"] == o["criteria"]
        assert "rubricIndex" not in g and "rubricText" not in g


def test_full_marks_is_correct(spark):
    rubrics = [{"rubricId": "r", "score": 1.0, "criteria": "c"}]
    responses = [{"rubricText": "t", "rubricIndex": 1, "rubricWiseScore": 1.0}]
    assert _grade_case(spark, rubrics, responses)["is_correct"] is True


def test_is_blank_matches_reference(spark):
    cases = ["", "Empty Response", "empty response", "EMPTY RESPONSE", "real"]
    df = spark.createDataFrame([(c,) for c in cases], "text string")
    got = {
        r["text"]: r["b"]
        for r in df.select("text", scoring.is_blank(F.col("text")).alias("b")).collect()
    }
    for c in cases:
        assert got[c] == T.blankness_flag(c), c


def test_level_score_matches_reference(spark):
    import json

    levels = ["Effective", "Good", "Satisfactory", "Normal", "Fair", "Poor", "Whatever"]
    df = spark.createDataFrame([(levels,)], "levels array<string>")
    got = df.select(scoring.level_score(F.col("levels")).alias("s")).collect()[0]["s"]
    fb = json.dumps(
        [{"FeedbackPointName": "P", "levelName": lv, "improvement": "i"} for lv in levels]
    )
    _, want = T.convert_feedback_format(fb)
    assert got == want == 4.0


def test_rubric_to_string_matches_reference(spark):
    rubrics = [
        {"rubricId": "r1", "score": 2.0, "criteria": "clarity"},
        {"rubricId": "r2", "score": 1.5, "criteria": "grammar"},
    ]
    df = spark.createDataFrame([(rubrics,)], f"rubrics {RUBRIC_SCHEMA}")
    got = df.select(scoring.rubric_to_string(F.col("rubrics")).alias("s")).collect()[0]["s"]
    assert got == T.convert_rubric_to_string(rubrics)


def test_route_alias_matches_reference(spark):
    prompts = [
        "default", "ocr", "OCR", "gpt-ocr", "claude-ocr", "expository-essay-ocr",
        "argumentative-essay-ocr", "gemini-number", "whole-page-ocr",
        "gpt-grading-only", "unknown-prompt",
    ]
    models = ["claude-latest", "", None]
    rows = [(p, m) for p in prompts for m in models]
    df = spark.createDataFrame(rows, "gp string, mn string")
    got = df.select(
        "gp", "mn", scoring.route_alias(F.col("gp"), F.col("mn")).alias("alias")
    ).collect()
    for r in got:
        assert r["alias"] == T.route_model(r["gp"], r["mn"]), (r["gp"], r["mn"])


def test_model_mapping_sentinel(spark):
    df = spark.createDataFrame(
        [("gpt-4-latest",), ("bogus-alias",)], "model_alias string"
    )
    got = {
        r["model_alias"]: (r["model_name"], r["model_class"])
        for r in scoring.with_model_mapping(df, spark).collect()
    }
    assert got["gpt-4-latest"] == ("gpt-4o", "gptText")
    assert got["bogus-alias"] == ("model does not found", "model does not found")


def test_empty_short_circuit(spark):
    df = spark.createDataFrame(
        [("given image is empty", 3.0), ("Given Image Is Empty", 3.0), ("ans", 3.0)],
        "ocr string, raw double",
    )
    score, fb = scoring.empty_short_circuit(F.col("ocr"), F.col("raw"), F.lit("graded"))
    rows = df.select("ocr", score.alias("s"), fb.alias("f")).collect()
    by = {r["ocr"]: (r["s"], r["f"]) for r in rows}
    assert by["given image is empty"] == (0.0, "No answer provided")
    assert by["Given Image Is Empty"] == (0.0, "No answer provided")  # lower() both
    assert by["ans"] == (3.0, "graded")


def test_surplus_responses_do_not_score(spark):
    """utils.py:205-221 loops over RUBRIC indices: extra model responses
    beyond the rubric count must not inflate score/flip is_correct, and a
    short response list sums what exists instead of crashing (review
    finding)."""
    df = spark.createDataFrame(
        [
            # 2 rubrics, 4 responses: only the first 2 scores count
            (
                1,
                [{"rubricId": "r1", "score": 2.0, "criteria": "a"},
                 {"rubricId": "r2", "score": 3.0, "criteria": "b"}],
                [{"rubricWiseScore": 2.0}, {"rubricWiseScore": 3.0},
                 {"rubricWiseScore": 9.0}, {"rubricWiseScore": 9.0}],
                "some answer",
            ),
            # 2 rubrics, 1 response: partial sum, no crash
            (
                2,
                [{"rubricId": "r1", "score": 2.0, "criteria": "a"},
                 {"rubricId": "r2", "score": 3.0, "criteria": "b"}],
                [{"rubricWiseScore": 2.0}],
                "some answer",
            ),
        ],
        "doc_id bigint,"
        " rubrics array<struct<rubricId:string,score:double,criteria:string>>,"
        " responses array<struct<rubricWiseScore:double>>, text string",
    )
    out = {r.doc_id: r for r in scoring.grade(df).collect()}
    assert out[1].score == 5.0 and out[1].max_score == 5.0
    assert bool(out[1].is_correct)
    assert out[2].score == 2.0 and out[2].max_score == 5.0
    assert not bool(out[2].is_correct)


def test_null_rubric_scores_zero_and_correct(spark):
    """The reference's non-list rubric path (assign_rubric_id_to_response)
    returns score=0, max_score=0 -> correctness_flag True; NULL arrays must
    not null-propagate into NULL flags (review finding)."""
    df = spark.createDataFrame(
        [(1, None, None, "anything")],
        "doc_id bigint,"
        " rubrics array<struct<rubricId:string,score:double,criteria:string>>,"
        " responses array<struct<rubricWiseScore:double>>, text string",
    )
    row = scoring.grade(df).collect()[0]
    assert row.score == 0.0 and row.max_score == 0.0
    assert bool(row.is_correct) is True


def test_null_modelname_routes_to_sentinel(spark):
    """Null modelName passes route_alias through (only '' falls back,
    gen_ai_calling.py:159) and the dim join yields the reference's
    'model does not found' sentinel (review finding)."""
    df = spark.createDataFrame(
        [(1, "unrouted-prompt", None), (2, "unrouted-prompt", "")],
        "doc_id bigint, grading_prompt string, model_name_in string",
    )
    routed = df.select(
        "doc_id",
        scoring.route_alias(
            F.col("grading_prompt"), F.col("model_name_in")
        ).alias("model_alias"),
    )
    out = {
        r.doc_id: (r.model_alias, r.model_name)
        for r in scoring.with_model_mapping(routed, spark).collect()
    }
    assert out[1] == (None, "model does not found")
    assert out[2] == ("gpt-4-latest", "gpt-4o")
