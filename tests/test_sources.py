"""Pages source/sink: schema enforcement, partition pruning, scan pushdown."""

from __future__ import annotations

import pyspark.sql.functions as F

from ai_service_ocr_grading_handler_spark.corpus import pages_df_from_documents
from ai_service_ocr_grading_handler_spark.sources import pages as src

SF = "/root/testdata/sf0.001"


def test_roundtrip_and_schema(spark, tmp_path):
    p = str(tmp_path / "pages")
    df = pages_df_from_documents(spark, SF)
    src.write_pages_partitioned(df, p)
    back = src.read_pages(spark, p)
    assert back.columns == src.PAGES_COLUMNS
    assert back.count() == df.count()
    # content identical (partitioning is derived, not destructive)
    a = {r.url: (r.text, r.lang) for r in df.collect()}
    b = {r.url: (r.text, r.lang) for r in back.collect()}
    assert a == b


def test_time_bounds_prune_partitions(spark, tmp_path):
    p = str(tmp_path / "pages")
    # sf0.001 timestamps all land on 2024-01-01 (37s stride); spread them
    # over 5 deterministic days so pruning has partitions to skip
    df = pages_df_from_documents(spark, SF).withColumn(
        "warc_ts",
        F.expr(
            "warc_ts + make_interval(0, 0, 0,"
            " cast(pmod(xxhash64(url), 5) as int), 0, 0, 0)"
        ),
    )
    src.write_pages_partitioned(df, p)

    bounded = src.read_pages(spark, p, since="2024-01-02", until="2024-01-04")
    plan = bounded._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "warc_day" in plan

    want = df.filter(
        (F.to_date("warc_ts") >= F.lit("2024-01-02"))
        & (F.to_date("warc_ts") < F.lit("2024-01-04"))
    ).count()
    assert bounded.count() == want
    assert 0 < bounded.count() < df.count()


def test_lang_filter_is_pushed_to_scan(spark, tmp_path):
    p = str(tmp_path / "pages")
    src.write_pages_partitioned(pages_df_from_documents(spark, SF), p)
    df = src.read_pages(spark, p, langs=["en"])
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "lang" in plan
    assert df.count() > 0
    assert df.filter(F.col("lang") != "en").count() == 0
