"""Query registry: every implemented operator as (spark_fn, oracle_sql) pairs.

The driver contract (/root/repo/__spark_entry__.py) exposes `queries()` and
`oracle_sql()` from this registry. Each Spark callable takes
``(spark, sf_dir)`` and returns a DataFrame whose column NAMES match the
oracle SQL exactly (the driver sorts columns by name before value-hashing).

Conventions:
- aggregates of doubles are rounded identically on both sides (Spark sum
  order != DuckDB sum order; rounding absorbs the float noise).
- oracle SQL runs on DuckDB with views: region nation customer supplier part
  orders lineitem events documents embeddings.
"""

from __future__ import annotations

from collections.abc import Callable

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ai_service_ocr_grading_handler_spark.corpus import (
    DUCKDB_GOLDEN_TEXT_EXPR,
    DUCKDB_URL_EXPR,
    pages_df_from_documents,
)
from ai_service_ocr_grading_handler_spark.operators.extract import extract_pages

SparkQuery = Callable[[SparkSession, str], DataFrame]

_REGISTRY: dict[str, tuple[SparkQuery, str | None]] = {}


def register(name: str, sql: str | None):
    def deco(fn: SparkQuery) -> SparkQuery:
        _REGISTRY[name] = (fn, sql)
        return fn

    return deco


def queries() -> dict[str, SparkQuery]:
    return {k: v[0] for k, v in _REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {k: v[1] for k, v in _REGISTRY.items() if v[1] is not None}


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------------------
# Flagship: main-content extraction (north rule)
# ---------------------------------------------------------------------------

_EXTRACT_ORACLE = f"""
SELECT {DUCKDB_URL_EXPR.format(id='doc_id', src='source')} AS url,
       {DUCKDB_GOLDEN_TEXT_EXPR.format(col='text')} AS text,
       length({DUCKDB_GOLDEN_TEXT_EXPR.format(col='text')}) AS content_chars,
       lang
FROM documents
"""


@register("extract_pages", _EXTRACT_ORACLE)
def q_extract_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """North-rule pipeline: synthesize CC-style pages from `documents`, strip
    boilerplate with the Arrow-batched kernel, return per-url extracted text.
    The oracle reconstructs the ground truth directly from `documents.text`,
    so a value-hash match proves byte-identical extraction per url."""
    pages = pages_df_from_documents(spark, sf_dir)
    return extract_pages(pages).select(
        "url", "text", F.col("content_chars").cast("long").alias("content_chars"), "lang"
    )


# ---------------------------------------------------------------------------
# Relational core parity (Spark built-ins vs DuckDB) — SURVEY.md §2.3-§2.6
# ---------------------------------------------------------------------------


@register(
    "q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           round(sum(l_extendedprice), 2) AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           round(avg(l_quantity), 4) AS avg_qty,
           round(avg(l_extendedprice), 4) AS avg_price,
           round(avg(l_discount), 4) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2002-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: partial+final hash aggregation, one shuffle on the
    2-column group key; predicate pushed to the parquet scan."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2002-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
            F.round(
                F.sum(
                    F.col("l_extendedprice")
                    * (1 - F.col("l_discount"))
                    * (1 + F.col("l_tax"))
                ),
                2,
            ).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "q3_shipping_priority",
    """
    SELECT l_orderkey,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           o_orderdate
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '2001-03-15'
      AND l_shipdate > TIMESTAMP '2001-03-15'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape. `customer` is tiny relative to lineitem -> broadcast
    both dimension joins so only the final group-by shuffles."""
    cutoff = F.lit("2001-03-15").cast("timestamp")
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    return (
        li.join(F.broadcast(orders), li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@register(
    "join_semi_anti",
    """
    SELECT
      (SELECT count(*) FROM part p WHERE EXISTS
         (SELECT 1 FROM lineitem l WHERE l.l_partkey = p.p_partkey)) AS n_parts_used,
      (SELECT count(*) FROM part p WHERE NOT EXISTS
         (SELECT 1 FROM lineitem l WHERE l.l_partkey = p.p_partkey)) AS n_parts_unused
    """,
)
def q_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """left_semi / left_anti built-ins (SURVEY.md §2.3 'absent in reference')."""
    part = _t(spark, sf_dir, "part")
    li = _t(spark, sf_dir, "lineitem").select("l_partkey")
    used = part.join(li, part.p_partkey == li.l_partkey, "left_semi").count()
    unused = part.join(li, part.p_partkey == li.l_partkey, "left_anti").count()
    return spark.createDataFrame(
        [(used, unused)], "n_parts_used bigint, n_parts_unused bigint"
    )


@register(
    "events_hourly_rollup",
    """
    SELECT date_trunc('hour', ts) AS hour_ts, event_type,
           count(*) AS n_events,
           round(sum(value), 2) AS sum_value,
           count(DISTINCT user_id) AS n_users
    FROM events
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def q_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling time-bucket aggregation (batch analog of the streaming
    windowed agg in §2.9)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.date_trunc("hour", "ts").alias("hour_ts"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy("hour_ts", "event_type")
    )


@register(
    "events_latest_per_user",
    """
    SELECT user_id, event_id AS last_event_id, event_type AS last_event_type
    FROM (
      SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    )
    WHERE rn = 1
    ORDER BY user_id
    """,
)
def q_events_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-snapshot dedup via window row_number (§2.5) — the Common-Crawl
    'latest capture per url' pattern (and the SQS FIFO dedup analog)."""
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_id").alias("last_event_id"),
            F.col("event_type").alias("last_event_type"),
        )
        .orderBy("user_id")
    )


@register(
    "doc_token_stats",
    """
    SELECT doc_id,
           len(string_split(trim(text), ' ')) AS n_tokens,
           length(text) AS n_chars_computed,
           round(len(string_split(trim(text), ' ')) / (length(text) / 100.0), 4)
             AS tokens_per_100_chars
    FROM documents
    WHERE length(text) > 0
    ORDER BY doc_id
    """,
)
def q_doc_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace token counting over `documents` (§'text analysis'),
    all JVM-side — no Python in the plan."""
    docs = _t(spark, sf_dir, "documents").filter(F.length("text") > 0)
    n_tokens = F.size(F.split(F.trim(F.col("text")), " "))
    return docs.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        F.length("text").alias("n_chars_computed"),
        F.round(n_tokens / (F.length("text") / F.lit(100.0)), 4).alias(
            "tokens_per_100_chars"
        ),
    ).orderBy("doc_id")
