"""Mergeable HLL corpus synopses: the register-identity property (union
of slice sketches == sketch of the union, EXACT estimate equality), the
incremental-run shape, accuracy within the configured error bound, and
partitioning independence."""

import pyspark.sql.functions as F

from ai_service_ocr_grading_handler_spark.operators import synopses


def _pages(spark, n=4000, sources=4):
    return spark.range(n).select(
        F.concat(F.lit("src"), (F.col("id") % sources).cast("string")).alias("source"),
        # ~25% duplicate urls to make distinct != count
        F.concat(F.lit("https://h/"), (F.col("id") % (3 * n // 4)).cast("string")).alias("url"),
        F.concat(F.lit("host"), (F.col("id") % 97).cast("string")).alias("host"),
    )


def test_union_of_slices_equals_sketch_of_union(spark):
    df = _pages(spark)
    sk = synopses.sketch_slices(df, cols=("url", "host"))
    merged = {
        r.col: r.distinct_estimate for r in synopses.merge_estimates(sk).collect()
    }
    whole = synopses.sketch_slices(df.withColumn("source", F.lit("all")), cols=("url", "host"))
    direct = {
        r.col: r.distinct_estimate for r in synopses.merge_estimates(whole).collect()
    }
    assert merged == direct  # register identity: EXACT equality


def test_incremental_run_shape_and_accuracy(spark):
    df = _pages(spark)
    committed = df.where(F.col("source") != "src3")
    new = df.where(F.col("source") == "src3")
    stored = synopses.sketch_slices(committed, cols=("url",))
    fresh = synopses.sketch_slices(new, cols=("url",))
    merged = {
        r.col: r.distinct_estimate
        for r in synopses.merge_estimates(stored.unionByName(fresh)).collect()
    }
    exact = df.select("url").distinct().count()
    assert abs(merged["url"] - exact) / exact < 0.05  # lg_k=12 -> ~1.6% RSE
    # incremental == full-run estimates, exactly
    full = {
        r.col: r.distinct_estimate
        for r in synopses.merge_estimates(
            synopses.sketch_slices(df, cols=("url",))
        ).collect()
    }
    assert merged == full


def test_partitioning_and_order_independence(spark):
    df = _pages(spark, n=1500)
    a = {
        (r.slice, r.col): r.distinct_estimate
        for r in synopses.slice_estimates(
            synopses.sketch_slices(df.repartition(13), cols=("url",))
        ).collect()
    }
    b = {
        (r.slice, r.col): r.distinct_estimate
        for r in synopses.slice_estimates(
            synopses.sketch_slices(df.orderBy(F.desc("url")).coalesce(1), cols=("url",))
        ).collect()
    }
    assert a == b
