"""Span extractors T1-T3 as Arrow-batched pandas UDFs (SURVEY.md §2.7).

Each UDF applies the pure-Python core (`core.textops.find_data_in_string`,
byte-exact port of /root/reference/engine/core/utils.py:167-203) over a
pandas Series — one Arrow batch per invocation, never per-row Python in the
plan. The plain functions in `core.textops` are the pytest oracle; the
registry queries prove the same semantics against DuckDB SQL where the
expected output is reconstructible without regex (a stronger check than
re-running the same regex on both sides).

Scale notes: these are narrow per-row transforms — no shuffle, no state.
At 100 TB the only cost is the Arrow channel; pandas `.str`/`re` work is
C-backed per batch. Inputs are pruned to the single string column consumed.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType, StringType, StructField, StructType

from ai_service_ocr_grading_handler_spark.core.textops import find_data_in_string

__all__ = [
    "extract_ocr_span",
    "extract_claude_json",
    "parse_essay_feedback",
]


@pandas_udf(StringType())
def extract_ocr_span(raw: pd.Series) -> pd.Series:
    """T1 — utils.py:168-182: strip wrapping quotes, first `ocr:"..."` or
    `{"ocr": "..."}` match, else the cleaned string."""
    return raw.map(lambda s: find_data_in_string(s, "ocr"))


@pandas_udf(StringType())
def extract_claude_json(raw: pd.Series) -> pd.Series:
    """T2 — utils.py:183-189: first minimal `{...}` block (DOTALL) else the
    whole input."""
    return raw.map(lambda s: find_data_in_string(s, "claude-json"))


_FEEDBACK_TYPE = StructType(
    [
        StructField("feedback", StringType()),
        StructField("confidence", DoubleType()),
    ]
)


@pandas_udf(_FEEDBACK_TYPE)
def parse_essay_feedback(raw: pd.Series) -> pd.DataFrame:
    """T3 + A2 — utils.py:190-203 + utils.py:146-162: parse every `{...}`
    JSON block out of raw model text, format `FeedbackPointName - improvement`
    paragraphs, and aggregate level names to a confidence score
    (Effective/Good/Satisfactory -> 1.0, Normal/Fair -> 0.5, else 0)."""
    out_fb: list[str] = []
    out_sc: list[float] = []
    for s in raw:
        fb, sc = find_data_in_string(s, "argumentative-essay-ocr")
        out_fb.append(fb)
        out_sc.append(float(sc))
    return pd.DataFrame({"feedback": out_fb, "confidence": out_sc})
