"""Structured Streaming semantics: exactly-once file drain, watermark
rollups matching the batch query, watermark dedup, streaming extraction
byte-identity with the batch kernel."""

from __future__ import annotations

import pyspark.sql.functions as F

from ai_service_ocr_grading_handler_spark.corpus import pages_df_from_documents
from ai_service_ocr_grading_handler_spark.streaming import jobs

SF = "/root/testdata/sf0.001"


def test_hourly_rollup_stream_matches_batch(spark, tmp_path):
    src = str(tmp_path / "events_in")
    ev = spark.read.parquet(f"{SF}/events.parquet")
    ev.repartition(6).write.mode("overwrite").parquet(src)

    stream = jobs.hourly_rollup_stream(
        jobs.read_event_stream(spark, src), watermark="0 seconds"
    )
    jobs.run_available_now(
        stream, str(tmp_path / "ckpt"), str(tmp_path / "out")
    )
    got = (
        spark.read.parquet(str(tmp_path / "out"))
        .orderBy("hour_ts", "event_type")
        .collect()
    )
    # append mode only emits FINALIZED windows: window.end <= final watermark
    # (= max event time with a 0s delay), so the last open hour is held back
    max_ts = ev.agg(F.max("ts")).collect()[0][0]
    want = (
        ev.groupBy(F.date_trunc("hour", "ts").alias("hour_ts"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .filter(F.col("hour_ts") + F.expr("INTERVAL 1 HOUR") <= F.lit(max_ts))
        .orderBy("hour_ts", "event_type")
        .collect()
    )
    assert len(got) > 0
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_available_now_is_exactly_once_across_restarts(spark, tmp_path):
    src = tmp_path / "pages_in"
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    pages = pages_df_from_documents(spark, SF)
    first = pages.filter(F.pmod(F.xxhash64("url"), F.lit(2)) == 0)
    second = pages.filter(F.pmod(F.xxhash64("url"), F.lit(2)) == 1)

    first.coalesce(2).write.mode("append").parquet(str(src))
    jobs.extract_pages_stream(spark, str(src), ckpt, out)
    n1 = spark.read.parquet(out).count()
    assert n1 == first.count()

    # new files arrive; restart with the SAME checkpoint -> only new files
    second.coalesce(2).write.mode("append").parquet(str(src))
    jobs.extract_pages_stream(spark, str(src), ckpt, out)
    result = spark.read.parquet(out)
    assert result.count() == pages.count()
    assert result.select("url").distinct().count() == pages.count()

    # streaming output is byte-identical to the batch kernel's
    from ai_service_ocr_grading_handler_spark.operators.extract import extract_pages

    batch = {r.url: r.text for r in extract_pages(pages).collect()}
    stream = {r.url: r.text for r in result.collect()}
    assert stream == batch


def test_dedup_stream_drops_redeliveries(spark, tmp_path):
    src = str(tmp_path / "events_dup")
    # DETERMINISTIC subset (review finding: an unordered limit() is
    # re-evaluated per consumer — the two unionAll branches could pick
    # DIFFERENT 500-row subsets, silently weakening the redelivery
    # premise); filter by key instead of limit
    ev = spark.read.parquet(f"{SF}/events.parquet").filter("event_id % 2 = 0")
    n = ev.count()
    assert n > 0
    dup = ev.unionAll(ev)  # every event redelivered once
    dup.repartition(4).write.mode("overwrite").parquet(src)

    deduped = jobs.dedup_stream(jobs.read_event_stream(spark, src))
    jobs.run_available_now(
        deduped, str(tmp_path / "ckpt"), str(tmp_path / "out")
    )
    out = spark.read.parquet(str(tmp_path / "out"))
    assert out.count() == n
    assert out.select("event_id").distinct().count() == n


def test_stateful_running_totals_survive_restart(spark, tmp_path):
    """applyInPandasWithState: per-user totals accumulate across
    micro-batches and across a checkpointed availableNow restart."""
    import pyspark.sql.functions as F2

    src = str(tmp_path / "events_in")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    ev = spark.read.parquet(f"{SF}/events.parquet")
    first = ev.filter(F2.pmod(F2.xxhash64("event_id"), F2.lit(2)) == 0)
    second = ev.filter(F2.pmod(F2.xxhash64("event_id"), F2.lit(2)) == 1)

    first.coalesce(2).write.mode("append").parquet(src)
    stream = jobs.running_user_totals(jobs.read_event_stream(spark, src))
    jobs.run_foreach_batch(stream, ckpt, out)

    second.coalesce(2).write.mode("append").parquet(src)
    stream = jobs.running_user_totals(jobs.read_event_stream(spark, src))
    jobs.run_foreach_batch(stream, ckpt, out)

    # last emitted row per user == full batch aggregate over ALL events
    res = spark.read.parquet(out)
    w_last = res.groupBy("user_id").agg(
        F2.max_by("total_value", "epoch").alias("total_value"),
        F2.max_by("n_events", "epoch").alias("n_events"),
    )
    got = {r.user_id: (r.total_value, r.n_events) for r in w_last.collect()}
    want = {
        r.user_id: (round(r.tv, 2), r.n)
        for r in ev.groupBy("user_id")
        .agg(F2.sum("value").alias("tv"), F2.count(F2.lit(1)).alias("n"))
        .collect()
    }
    assert got == want


def test_curate_stream_gates_scrubs_and_dedups(spark, tmp_path):
    """Ingest-time curation: short docs gated, PII scrubbed, repeated lines
    collapsed, and a redelivered document (same content, later timestamp
    within the watermark) emitted exactly once."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        (1, t0, "mail a@b.io now please\nmail a@b.io now please\nsecond line"),
        (2, t0 + dt.timedelta(minutes=1), "tiny"),
        (3, t0 + dt.timedelta(minutes=2), "a perfectly unique document with words"),
        # redelivery of doc 1's content (post-scrub identical), new id+ts
        (4, t0 + dt.timedelta(minutes=3), "mail z@y.org now please\nmail z@y.org now please\nsecond line"),
    ]
    src = str(tmp_path / "docs_in")
    spark.createDataFrame(rows, jobs.DOCS_DDL).coalesce(1).write.mode(
        "overwrite"
    ).parquet(src)

    stream = spark.readStream.schema(jobs.DOCS_DDL).parquet(src)
    jobs.run_available_now(
        jobs.curate_stream(stream), str(tmp_path / "ckpt"), str(tmp_path / "out")
    )
    out = {r.doc_id: r.text for r in spark.read.parquet(str(tmp_path / "out")).collect()}
    assert 2 not in out  # length gate
    assert set(out) == {1, 3}  # doc 4 deduped against doc 1's scrubbed content
    assert out[1] == "mail <EMAIL> now please\nsecond line"
    assert out[3] == "a perfectly unique document with words"
