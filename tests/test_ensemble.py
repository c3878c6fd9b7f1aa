"""Group-batch ensemble/number kernel (SURVEY.md §2.8 K12/K13, §2.3 J4,
§2.4 A3/A5) — semantics + distribution invariance."""

from __future__ import annotations

import pyspark.sql.functions as F

from ai_service_ocr_grading_handler_spark.operators import ensemble

SF = "/root/testdata/sf0.001"


def _results(spark, df=None):
    req = df if df is not None else ensemble.number_requests(spark, SF)
    return ensemble.predict_numbers(req).orderBy("doc_id").toPandas()


def test_exact_match_scores_full_marks(spark):
    out = _results(spark)
    matched = out[out.predicted == out.correct_answer]
    assert (matched.score == matched.max_score).all()


def test_stale_score_quirk(spark):
    """A mismatching row inherits the most recent matching row's max_score
    within its batch (llm_number_prediction.py:185-205 stale variable)."""
    out = _results(spark)
    for _, grp in out.groupby("batch_id"):
        grp = grp.sort_values("pos").reset_index(drop=True)
        last = None
        for _, r in grp.iterrows():
            if r.predicted == r.correct_answer:
                last = r.max_score
            assert r.score == last
    # the corpus must actually exercise the quirk
    mismatches = out[out.predicted != out.correct_answer]
    assert len(mismatches) > 0
    assert (mismatches.score != mismatches.max_score).any()


def test_count_validation_and_stack_fold(spark):
    """A3: every batch valid; A5: stacked dims are the canvas fold over the
    batch's crops."""
    out = _results(spark)
    assert out.batch_valid.all()
    for _, grp in out.groupby("batch_id"):
        width = max(len(f"PNGFAKE|{p}") for p in grp.predicted)
        height = sum(20 + p % 5 for p in grp.predicted) + 10 * (len(grp) - 1)
        assert (grp.stacked_width == width).all()
        assert (grp.stacked_height == height).all()


def test_partitioning_invariance(spark):
    """Same results no matter how the input is partitioned before the
    group shuffle (batch integrity comes from groupBy, not layout)."""
    req = ensemble.number_requests(spark, SF)
    base = _results(spark, req)
    scrambled = _results(spark, req.repartition(13, F.col("doc_id")))
    assert base.equals(scrambled)


def test_a3_count_check_rejects_newline_crop(spark):
    """The reference's A3 check (#numbers != #boxes after the stacked
    artifact's newline split, llm_number_prediction.py:125-126) must be
    falsifiable: a crop whose decoded text embeds a newline produces an
    extra line and invalidates its batch; clean batches stay valid.
    (Review finding: the old check compared a group size to itself.)"""
    rows = [
        # batch 0: clean
        (0, 0, 0, 7, 1.0, 20, b"PNGFAKE|7"),
        (1, 0, 1, 9, 1.0, 20, b"PNGFAKE|9"),
        # batch 1: one crop smuggles a newline -> 3 lines vs 2 boxes
        (2, 1, 0, 4, 1.0, 20, b"PNGFAKE|4\nPNGFAKE|5"),
        (3, 1, 1, 6, 1.0, 20, b"PNGFAKE|6"),
    ]
    req = spark.createDataFrame(
        rows,
        "doc_id bigint, batch_id bigint, pos int, correct_answer int,"
        " max_score double, crop_height int, crop binary",
    )
    out = ensemble.predict_numbers(req).orderBy("doc_id").toPandas()
    by_doc = out.set_index("doc_id")
    assert bool(by_doc.loc[0, "batch_valid"]) and bool(by_doc.loc[1, "batch_valid"])
    assert not bool(by_doc.loc[2, "batch_valid"])
    assert not bool(by_doc.loc[3, "batch_valid"])
    # the poisoned crop parses to the total-function sentinel, not a crash
    assert int(by_doc.loc[2, "predicted"]) == -1


def test_invalid_utf8_crop_degrades_not_crashes(spark):
    """Non-UTF-8 crop bytes must decode with replacement and fail the parse
    (-1, batch invalid), never raise UnicodeDecodeError in the kernel
    (review finding)."""
    req = spark.createDataFrame(
        [
            (0, 0, 0, 7, 1.0, 20, b"PNGFAKE|7"),
            (1, 0, 1, 9, 1.0, 20, b"\x80\xff\xfe"),
        ],
        "doc_id bigint, batch_id bigint, pos int, correct_answer int,"
        " max_score double, crop_height int, crop binary",
    )
    out = {r.doc_id: r for r in ensemble.predict_numbers(req).collect()}
    assert out[1].predicted == -1
