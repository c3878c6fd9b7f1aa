"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` runs the flagship north-rule pipeline (CC-style pages ->
Arrow-batched boilerplate-strip kernel -> per-url extracted text) on
sf0.001. `queries()`/`oracle_sql()` expose every implemented operator from
SURVEY.md §2 via the package registry; see
ai_service_ocr_grading_handler_spark/plans/registry.py.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ai_service_ocr_grading_handler_spark.plans import registry as _registry
from ai_service_ocr_grading_handler_spark.session import tune_session

SF_SMOKE = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    tune_session(spark)
    return _registry.queries()["extract_pages"](spark, SF_SMOKE)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # wrap every query so the session is tuned (UTC timezone, Arrow, AQE)
    # even when the driver never calls entry() first — timestamp-valued
    # oracles depend on the UTC session timezone
    def _tuned(fn: Callable[[SparkSession, str], DataFrame]):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            tune_session(spark)
            return fn(spark, sf_dir)

        run.__name__ = getattr(fn, "__name__", "query")
        run.__doc__ = fn.__doc__
        return run

    return {k: _tuned(v) for k, v in _registry.queries().items()}


def oracle_sql() -> dict[str, str]:
    return _registry.oracle_sql()
