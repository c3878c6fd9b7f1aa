"""Bucketed-table co-located join: bucketBy on the join key lets repeated
joins skip their shuffles entirely — the batch analog of Iceberg
bucket(N, key) partitioning for the 100 TB url-keyed tables."""

from __future__ import annotations

import pyspark.sql.functions as F


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        spark.sql(f"CREATE DATABASE IF NOT EXISTS bucketdb LOCATION '{tmp_path}/wh'")
        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        left = docs.select("doc_id", "text")
        right = docs.select("doc_id", "lang", "n_chars")
        for name, df in (("b_left", left), ("b_right", right)):
            (
                df.write.mode("overwrite")
                .bucketBy(8, "doc_id")
                .sortBy("doc_id")
                .saveAsTable(f"bucketdb.{name}")
            )
        a = spark.table("bucketdb.b_left")
        b = spark.table("bucketdb.b_right")
        joined = a.join(b, "doc_id")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan  # co-located: zero shuffles
        assert joined.count() == docs.count()

        # same join on plain parquet DOES shuffle — the baseline
        p1, p2 = str(tmp_path / "p1"), str(tmp_path / "p2")
        left.write.parquet(p1)
        right.write.parquet(p2)
        plain = spark.read.parquet(p1).join(spark.read.parquet(p2), "doc_id")
        plain_plan = plain._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in plain_plan
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS bucketdb.b_left")
        spark.sql("DROP TABLE IF EXISTS bucketdb.b_right")
        spark.sql("DROP DATABASE IF EXISTS bucketdb")
