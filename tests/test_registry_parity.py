"""Mirror of the driver's correctness gate: every registry query at sf0.01
vs its DuckDB oracle — row count, schema (column names), and values
(column-name-sorted, row-sorted, exact after the query's own rounding)."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest

from ai_service_ocr_grading_handler_spark.plans import registry

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _duck(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _canon(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        if pdf[c].dtype == object:
            pdf[c] = pdf[c].astype(str)
        elif np.issubdtype(pdf[c].dtype, np.floating):
            pdf[c] = pdf[c].round(6)
        elif np.issubdtype(pdf[c].dtype, np.datetime64):
            pdf[c] = pdf[c].astype("datetime64[us]").astype(str)
    return pdf.sort_values(list(pdf.columns)).reset_index(drop=True)


# Driver-window queries AND library-tier queries (fully oracled but outside
# the external driver's 50-slot window) get the identical parity gate here.
_ORACLES = {**registry.oracle_sql(), **registry.library_oracle_sql()}
_QUERIES = {**registry.queries(), **registry.library_queries()}


@pytest.mark.parametrize("name", sorted(_ORACLES))
def test_query_matches_oracle(spark, sf_correct, name):
    q = _QUERIES[name]
    got = _canon(q(spark, sf_correct).toPandas())
    con = _duck(sf_correct)
    want = _canon(con.execute(_ORACLES[name]).df())
    con.close()
    assert list(got.columns) == list(want.columns), (
        f"{name}: column mismatch {list(got.columns)} vs {list(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: row count {len(got)} vs {len(want)}"
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=False, rtol=1e-6, atol=1e-9)


def test_every_query_has_sql_or_documented_exemption():
    missing = (set(registry.queries()) | set(registry.library_queries())) - set(
        _ORACLES
    )
    # non-SQL-expressible ops must be listed here with a reason; currently
    # every registered query has a full DuckDB value oracle.
    allowed_rows_only: set[str] = set()
    assert missing <= allowed_rows_only, f"queries without oracle SQL: {missing}"


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(["url", "text"]).issubset(set(df.columns))
