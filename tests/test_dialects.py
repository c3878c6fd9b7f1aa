"""Provider-dialect conversion: the native Column transforms must equal the
byte-exact plain-Python ports of llm_format_convertion.py on every row."""

from __future__ import annotations

import pyspark.sql.functions as F

from ai_service_ocr_grading_handler_spark.core import textops
from ai_service_ocr_grading_handler_spark.functions import dialects

SF = "/root/testdata/sf0.001"


def _row_to_dict(v):
    if hasattr(v, "asDict"):
        return {k: _row_to_dict(x) for k, x in v.asDict().items()}
    if isinstance(v, list):
        return [_row_to_dict(x) for x in v]
    return v


def test_native_dialects_equal_python_ports(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(60)
    d = F.col("doc_id")
    sp = F.lit("You are a strict grader.")
    rubric = F.concat(F.lit("Rubrics: "), (d % 5).cast("string"), F.lit(" Points: x, "))
    q = F.array_join(F.slice(F.split("text", " "), 1, 6), " ")
    a = F.when(d % 4 == 1, F.lit("")).otherwise(
        F.array_join(F.slice(F.split("text", " "), 1, 8), " ")
    )
    gpt = dialects.gpt_messages(sp, rubric, q, a)
    rows = docs.select(
        "doc_id",
        "text",
        (d % 5).cast("string").alias("rn"),
        gpt.alias("gpt"),
        dialects.to_claude(gpt).alias("claude"),
        dialects.to_gemini(gpt).alias("gemini"),
        dialects.to_llama(gpt).alias("llama"),
    ).collect()
    assert rows
    for r in rows:
        words = r.text.split(" ")
        message = {
            "systemPrompt": "You are a strict grader.",
            "rubric": f"Rubrics: {r.rn} Points: x, ",
            "question": " ".join(words[:6]),
            "answer": "" if r.doc_id % 4 == 1 else " ".join(words[:8]),
        }
        want_gpt = textops.convert_normal_to_gpt(message)
        assert _row_to_dict(r.gpt) == want_gpt
        assert _row_to_dict(r.claude) == textops.convert_gpt_to_claude(want_gpt)
        assert _row_to_dict(r.gemini) == textops.convert_gpt_to_gemini(want_gpt)
        assert _row_to_dict(r.llama) == textops.convert_gpt_to_llamma(want_gpt)


def test_empty_answer_quirk():
    msg = {"systemPrompt": "s", "rubric": "r", "question": "q", "answer": ""}
    gpt = textops.convert_normal_to_gpt(msg)
    assert gpt[-1] == {"role": "user", "content": "No Answer"}
    claude = textops.convert_gpt_to_claude(gpt)
    assert claude["messages"][0]["content"][0]["text"] == "No Answer,"  # trailing comma
    assert claude["system"] == "s\n\nr\n\nquestion: q"
