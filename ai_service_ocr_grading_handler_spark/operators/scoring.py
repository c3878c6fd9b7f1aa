"""Grading/scoring operators as NATIVE Spark columns (zero Python in the plan).

Reimplements the reference's deterministic scoring aggregation —
positional rubric zip + sums (utils.py:205-221), level scoring
(utils.py:146-162), correctness/blankness flags (utils.py:95-111), model
routing (gen_ai_calling.py:140-159) and the model dimension lookup
(utils.py:141-145 over gen_ai_calling.py:13-31) — entirely with
``when/otherwise``, ``arrays_zip``/``transform``/``aggregate`` and a
broadcast-joined 16-row dimension table. Everything stays inside
whole-stage codegen; the per-row array folds shuffle nothing.

Reference quirks preserved (SURVEY.md §7 'what's hard' (b)):
- the blankness comparison ``lower(text) == 'Empty Response'`` is dead code
  in the reference (lowercased lhs vs mixed-case literal) — we emit the same
  always-false predicate so flag semantics are bit-equal;
- rubric-response alignment is positional (arrays_zip), never keyed;
- partial credit is NOT "correct" (score must equal max_score exactly).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession

from ai_service_ocr_grading_handler_spark.core.textops import LLM_NAME_MAPPING

# ---------------------------------------------------------------------------
# P6: gradingPrompt -> model alias (gen_ai_calling.py:140-159)
# ---------------------------------------------------------------------------


def route_alias(grading_prompt: Column, model_name: Column) -> Column:
    gp = grading_prompt
    return (
        F.when(gp == "expository-essay-ocr", F.lit("claude-vision-ocr"))
        .when(gp.isin("ocr", "OCR", "gpt-ocr"), F.lit("gpt-ocr-vision"))
        .when(gp == "gpt-grading-only", F.lit("gpt-4-latest"))
        .when(gp == "claude-ocr", F.lit("claude-vision-ocr"))
        .when(gp == "argumentative-essay-ocr", F.lit("shozemi-gpt-latest"))
        .when(gp == "gemini-number", F.lit("gemini-vision-number"))
        .when(gp == "whole-page-ocr", F.lit("whole-page-ocr"))
        .otherwise(
            # only the EMPTY STRING falls back (reference semantics, see
            # textops.route_model): a NULL modelName passes through and the
            # alias dim join then yields the 'model does not found' sentinel
            F.when(
                model_name.isNull() | (model_name != ""), model_name
            ).otherwise(F.lit("gpt-4-latest"))
        )
    )


# ---------------------------------------------------------------------------
# J2: alias -> (modelName, modelClass) via broadcast dim join
# ---------------------------------------------------------------------------


def model_dim_df(spark: SparkSession) -> DataFrame:
    rows = [
        (alias, v["modelName"], v["modelClass"]) for alias, v in LLM_NAME_MAPPING.items()
    ]
    return spark.createDataFrame(rows, "model_alias string, model_name string, model_class string")


def with_model_mapping(df: DataFrame, spark: SparkSession, alias_col: str = "model_alias") -> DataFrame:
    """Broadcast left join + the reference's sentinel on miss
    ('model does not found', utils.py:145)."""
    dim = model_dim_df(spark)
    joined = df.join(F.broadcast(dim), on=alias_col, how="left")
    return joined.withColumn(
        "model_name", F.coalesce("model_name", F.lit("model does not found"))
    ).withColumn("model_class", F.coalesce("model_class", F.lit("model does not found")))


# ---------------------------------------------------------------------------
# J3 + A1: positional rubric zip, score/max_score sums (utils.py:205-221)
# ---------------------------------------------------------------------------


def rubric_zip(rubrics: Column, responses: Column) -> Column:
    """arrays_zip(rubrics, responses) -> rubricWiseResponse structs: graft
    rubricId/rubricWiseMaxScore/criteria from the i-th rubric onto the i-th
    response (positional, like the reference's index loop)."""
    return F.transform(
        F.arrays_zip(rubrics.alias("r"), responses.alias("s")),
        lambda z: F.struct(
            z["r"]["rubricId"].alias("rubricId"),
            z["s"]["rubricWiseScore"].alias("rubricWiseScore"),
            z["r"]["score"].alias("rubricWiseMaxScore"),
            z["r"]["criteria"].alias("criteria"),
        ),
    )


def rubric_score_sum(responses: Column, rubrics: Column) -> Column:
    """A1: score = Σ rubricWiseScore over the FIRST len(rubrics) responses —
    the reference's loop runs over rubric indices (utils.py:205-221), so
    surplus model responses beyond the rubric count do NOT score (they
    used to be summed here, silently inflating score and flipping
    is_correct; found by review). Responses shorter than the rubric sum
    what exists — the reference raises IndexError there, and a poisoned
    row must not kill the task. Per-row array fold, no shuffle."""
    return F.aggregate(
        F.slice(responses, 1, F.size(rubrics)),
        F.lit(0.0),
        lambda acc, x: acc + x["rubricWiseScore"],
    )


def rubric_max_sum(rubrics: Column) -> Column:
    """A1: max_score = Σ rubric.score."""
    return F.aggregate(rubrics, F.lit(0.0), lambda acc, x: acc + x["score"])


def rubric_to_string(rubrics: Column) -> Column:
    """T6 (utils.py:132-140): 'Rubrics: ' + Σ '{score} Points: {criteria}, '
    — trailing ', ' preserved."""
    return F.concat(
        F.lit("Rubrics: "),
        F.aggregate(
            rubrics,
            F.lit(""),
            lambda acc, r: F.concat(
                acc,
                r["score"].cast("string"),
                F.lit(" Points: "),
                r["criteria"],
                F.lit(", "),
            ),
        ),
    )


# ---------------------------------------------------------------------------
# A2: level -> score aggregation (utils.py:146-162)
# ---------------------------------------------------------------------------


def level_score(levels: Column) -> Column:
    """Effective/Good/Satisfactory -> 1.0; Normal/Fair -> 0.5; else 0."""
    return F.aggregate(
        levels,
        F.lit(0.0),
        lambda acc, lv: acc
        + F.when(lv.isin("Effective", "Good", "Satisfactory"), F.lit(1.0))
        .when(lv.isin("Normal", "Fair"), F.lit(0.5))
        .otherwise(F.lit(0.0)),
    )


# ---------------------------------------------------------------------------
# P8/P9: flags (utils.py:95-111)
# ---------------------------------------------------------------------------


def is_correct(score: Column, max_score: Column) -> Column:
    return score == max_score


def is_blank(text: Column) -> Column:
    # (text=='') | (lower(text)=='Empty Response'): second disjunct is the
    # reference's dead branch (always false) — replicated verbatim.
    return (text == "") | (F.lower(text) == F.lit("Empty Response"))


# ---------------------------------------------------------------------------
# P7: empty-document short-circuit (gen_ai_calling.py:298-299,319-320)
# ---------------------------------------------------------------------------

EMPTY_DOC_SENTINEL = "given image is empty"
EMPTY_DOC_FEEDBACK = "No answer provided"


def empty_short_circuit(text: Column, score: Column, feedback: Column) -> tuple[Column, Column]:
    """When the extraction kernel signals an empty document, emit
    {score: 0, aiFeedback: 'No answer provided'} without running grading —
    a predicate-gated column pair, no branch in the physical plan."""
    empty = F.lower(text) == F.lit(EMPTY_DOC_SENTINEL)
    return (
        F.when(empty, F.lit(0.0)).otherwise(score),
        F.when(empty, F.lit(EMPTY_DOC_FEEDBACK)).otherwise(feedback),
    )


# ---------------------------------------------------------------------------
# K10 fuse: full grading stage over (text, rubrics, responses)
# ---------------------------------------------------------------------------


def grade(df: DataFrame, rubrics_col: str = "rubrics", responses_col: str = "responses", text_col: str = "text") -> DataFrame:
    """Two-stage extract->grade fuse (gen_ai_calling.py:306-326) — here the
    grading stage: expects extraction output plus rubric/response arrays,
    emits score/max_score/flags/rubricWiseResponse. Pipelined narrow ops,
    fused into one codegen stage."""
    rubrics, responses, text = F.col(rubrics_col), F.col(responses_col), F.col(text_col)
    # NULL arrays (the reference's non-list rubric path,
    # assign_rubric_id_to_response) score 0/0 -> is_correct True — the
    # folds alone would null-propagate and emit NULL flags that silently
    # misroute downstream filters (found by review)
    score = F.coalesce(rubric_score_sum(responses, rubrics), F.lit(0.0))
    max_score = F.coalesce(rubric_max_sum(rubrics), F.lit(0.0))
    return (
        df.withColumn("rubric_wise_response", rubric_zip(rubrics, responses))
        .withColumn("score", score)
        .withColumn("max_score", max_score)
        .withColumn("is_correct", is_correct(F.col("score"), F.col("max_score")))
        .withColumn("is_blank", is_blank(text))
    )
