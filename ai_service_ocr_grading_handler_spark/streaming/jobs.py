"""Structured Streaming surface (SURVEY.md §2.9).

The reference's streaming semantics are SQS micro-batches: FIFO groups,
content-based dedup (`MessageDeduplicationId`,
/root/reference/engine/gen_utils_files/testCase.txt:355-357), at-least-once
redelivery, and a downstream update queue (engine/core/utils.py:72,128).
The Spark-native mapping:

- micro-batch source  -> file-based `readStream` + `Trigger.AvailableNow`
  (process everything present, then stop — the batch-resume analog of an
  SQS drain; checkpointed, so re-runs consume only NEW files);
- content dedup       -> `dropDuplicatesWithinWatermark` on the key;
- windowed rollups    -> event-time `window()` aggregation with a watermark
  bounding state (late rows beyond the watermark are dropped);
- extraction on a stream -> the SAME `extract_pages` kernel: `mapInArrow`
  is streaming-compatible, so batch and streaming share one code path.

At scale: state size is bounded by (watermark horizon x key cardinality);
`spark.sql.shuffle.partitions` sizes the state store; AvailableNow gives
exactly-once file-source semantics via the checkpoint's source log.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from ai_service_ocr_grading_handler_spark.operators.extract import extract_pages

EVENTS_DDL = (
    "event_id bigint, ts timestamp, user_id bigint, event_type string, "
    "value double, props string"
)


def read_event_stream(spark: SparkSession, input_dir: str) -> DataFrame:
    return (
        spark.readStream.schema(EVENTS_DDL)
        .option("maxFilesPerTrigger", 4)
        .parquet(input_dir)
    )


def hourly_rollup_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Tumbling 1-hour event-time aggregation with bounded state:
    the streaming twin of the batch `events_hourly_rollup` query."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("hour_ts"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def dedup_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """At-least-once -> effectively-once: drop redelivered event_ids within
    the watermark horizon (the SQS MessageDeduplicationId analog; state is
    GC'd past the watermark, so it's bounded at 100 TB/day rates)."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def run_available_now(
    stream_df: DataFrame, checkpoint_dir: str, out_dir: str, mode: str = "append"
) -> None:
    """Drain everything currently available into parquet, exactly once per
    input file (source progress lives in the checkpoint), then stop."""
    q = (
        stream_df.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


# the pages input shape has ONE definition (corpus.PAGES_SCHEMA_DDL):
# a drifted copy here would make the file-stream reader silently emit
# NULLs for mismatched columns instead of erroring (review finding)
from ai_service_ocr_grading_handler_spark.corpus import PAGES_SCHEMA_DDL as PAGES_DDL


def extract_pages_stream(
    spark: SparkSession, input_dir: str, checkpoint_dir: str, out_dir: str
) -> None:
    """Streaming extraction: the batch kernel applied to a file stream —
    new page files appearing in `input_dir` are extracted exactly once."""
    pages = (
        spark.readStream.schema(PAGES_DDL)
        .option("maxFilesPerTrigger", 8)
        .parquet(input_dir)
    )
    run_available_now(extract_pages(pages), checkpoint_dir, out_dir)


def running_user_totals(events: DataFrame) -> DataFrame:
    """Custom stateful operator (applyInPandasWithState): per-user running
    (total_value, n_events) maintained in the state store across
    micro-batches AND across availableNow restarts (state lives in the
    checkpoint). This is the §2.10 'custom stateful streaming operator'
    slot — the reference's per-student running credit/score accumulation
    generalized to streams. State is one tiny tuple per key, so state-store
    size is O(users), not O(events)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update_totals(key, pdfs, state: GroupState):
        total, n = state.get if state.exists else (0.0, 0)
        for pdf in pdfs:
            total += float(pdf["value"].sum())
            n += int(len(pdf))
        state.update((total, n))
        yield pd.DataFrame(
            {"user_id": [key[0]], "total_value": [round(total, 2)], "n_events": [n]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update_totals,
        outputStructType="user_id bigint, total_value double, n_events bigint",
        stateStructType="total_value double, n_events bigint",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_foreach_batch(stream_df: DataFrame, checkpoint_dir: str, out_dir: str) -> None:
    """AvailableNow drain through foreachBatch: epoch-stamped parquet
    appends (the exactly-once sink escape hatch for update-mode output)."""
    import pyspark.sql.functions as SF

    def sink(batch_df, epoch_id: int) -> None:
        batch_df.withColumn("epoch", SF.lit(epoch_id)).write.mode("append").parquet(
            out_dir
        )

    q = (
        stream_df.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


DOCS_DDL = "doc_id bigint, ts timestamp, text string"


def curate_stream(
    docs: DataFrame,
    min_words: int = 5,
    max_words: int = 10000,
    watermark: str = "2 hours",
) -> DataFrame:
    """Ingest-time curation on a document stream: the STATELESS curation
    stages (length gate, PII scrub, within-doc line dedup — all pure
    per-row expressions, streaming-safe by construction) plus streaming
    exact dedup via `dropDuplicatesWithinWatermark` on the content hash,
    so a redelivered/recrawled page is emitted once per watermark horizon.

    State is one (hash, ts) entry per unique document inside the horizon —
    bounded, like the rollup jobs. The CORPUS-WIDE passes (paragraph-level
    dedup, MinHash near-dedup, decontamination) are deliberately NOT here:
    they need corpus-global grouping and belong in the batch compaction
    pass (`operators.curation.curate_corpus`) over the accumulated output —
    the standard stream-ingest + batch-compact split.
    """
    from ai_service_ocr_grading_handler_spark.operators.curation import stateless_curate

    # the SAME stateless stages as the batch pass (shared helper — batch
    # and stream must not drift on gate/scrub semantics)
    scrubbed = stateless_curate(
        docs, min_words=min_words, max_words=max_words, keep_cols=("ts",)
    )
    return (
        scrubbed.withWatermark("ts", watermark)
        .withColumn("content_md5", F.md5("text"))
        .dropDuplicatesWithinWatermark(["content_md5"])
        .drop("content_md5")
    )
