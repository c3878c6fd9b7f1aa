"""Spark-side extraction: byte-identity vs oracle + batch-boundary invariance."""

from __future__ import annotations

import pyspark.sql.functions as F

from ai_service_ocr_grading_handler_spark.corpus import fixture_pages_df, pages_df_from_documents
from ai_service_ocr_grading_handler_spark.operators.extract import extract_blocks, extract_pages


def _mismatches(pages_df):
    gold = pages_df.select("url", F.col("text").alias("gold"))
    ext = extract_pages(pages_df)
    j = ext.join(gold, "url")
    # NULL-safe: a regression to NULL extracted text must COUNT as a
    # mismatch, not vanish through three-valued logic (review finding)
    return j.filter(~F.col("text").eqNullSafe(F.col("gold"))).count(), j.count()


def test_spark_byte_identity_documents(spark, sf_smoke):
    bad, n = _mismatches(pages_df_from_documents(spark, sf_smoke))
    assert n == 500 and bad == 0


def test_spark_byte_identity_fixtures(spark):
    bad, n = _mismatches(fixture_pages_df(spark))
    assert n == 9 and bad == 0


def test_arrow_batch_boundary_invariance(spark, sf_smoke):
    """Kernel output must be identical at Arrow batch sizes 1-ish, 7, 2048
    and under different partitioning (byte-identity across batch boundaries —
    SURVEY.md §7 'what's hard' (a))."""
    results = []
    for batch_size, parts in ((7, 1), (2048, 13)):
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", str(batch_size))
        try:
            pages = pages_df_from_documents(spark, sf_smoke).repartition(parts)
            rows = (
                extract_pages(pages)
                .select("url", "text", "content_chars")
                .sort("url")
                .collect()
            )
            results.append([(r.url, r.text, r.content_chars) for r in rows])
        finally:
            spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
    assert results[0] == results[1]


def test_extract_blocks_detail(spark):
    fx = fixture_pages_df(spark)
    blocks = extract_blocks(fx)
    pdf = blocks.toPandas()
    assert (pdf["link_density"] <= 1.0).all() and (pdf["link_density"] >= 0.0).all()
    # every fixture page has at least one boilerplate block
    per_url = pdf.groupby("url")["is_content"].agg(["sum", "count"])
    assert (per_url["count"] > per_url["sum"]).all()
    # content blocks of the digit-box page are the digits
    digits = pdf[(pdf["url"].str.endswith("/digit-box")) & pdf["is_content"]]
    assert list(digits.sort_values("block_id")["text"]) == ["7", "42", "3", "19", "88"]


def test_html_column_pruned_from_kernel_output(spark, sf_smoke):
    ext = extract_pages(pages_df_from_documents(spark, sf_smoke))
    assert "html" not in ext.columns
