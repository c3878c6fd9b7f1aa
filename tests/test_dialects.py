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


def test_pystrip_matches_python_strip_on_unicode_whitespace(spark):
    """Scraped HTML carries non-ASCII whitespace (\xa0 after entity
    unescape,  /　 in CJK pages); Python's .strip() — the
    reference semantics in convert_gpt_to_claude's system fold — strips
    them all, so the Column _pystrip must too (it once covered only the
    ASCII set and diverged)."""
    payloads = [
        "\xa0 nbsp-padded rubric \xa0",
        " line-sep ",
        "　ideographic space　",
        "\t mixed \xa0   end \x85",
        "no padding at all",
        "\x1c\x1d\x1e\x1f field separators \x1c",
    ]
    df = spark.createDataFrame([(p,) for p in payloads], "s string")
    got = [r.out for r in df.select(dialects._pystrip(F.col("s")).alias("out")).collect()]
    assert got == [p.strip() for p in payloads]


def test_vision_dialects_shapes(spark):
    """Vision request JSON must reproduce the reference's exact shapes
    (llm_format_convertion.py:108-193): data-url gpt block, raw-answerUrl
    gpt block, claude base64 source block, gemini number payload."""
    import base64
    import json

    df = spark.createDataFrame([(b"\x89PNG fake bytes",)], "img binary")
    b64 = dialects.b64_canonical(F.col("img"))
    row = df.select(
        F.to_json(dialects.gpt_vision_messages(F.lit("SP"), b64)).alias("g"),
        F.to_json(
            dialects.gpt_vision_url_messages(
                F.lit("SP"), F.lit("Q"), F.lit("R, "), F.lit("https://a/1.webp")
            )
        ).alias("gu"),
        F.to_json(dialects.claude_vision_messages(F.lit("SP"), b64)).alias("c"),
        F.to_json(
            dialects.gemini_number_payload(b64, F.lit(3).cast("int"))
        ).alias("n"),
    ).collect()[0]
    enc = base64.b64encode(b"\x89PNG fake bytes").decode()
    assert json.loads(row.g) == [
        {"role": "user", "content": [
            {"type": "text", "text": "SP"},
            {"type": "image_url",
             "image_url": {"url": f"data:image/webp;base64,{enc}"}},
        ]}
    ]
    assert json.loads(row.gu) == [
        {"role": "user", "content": [
            {"type": "text", "text": "SP, Question: Q ,R, "},
            {"type": "image_url", "image_url": {"url": "https://a/1.webp"}},
        ]}
    ]
    assert json.loads(row.c) == [
        {"role": "user", "content": [
            {"type": "text", "text": "SP"},
            {"type": "image", "source": {
                "type": "base64", "media_type": "image/webp", "data": enc}},
        ]}
    ]
    assert json.loads(row.n) == {"base64_image": enc, "batch_size": 3}


def test_null_answer_and_null_system_fields(spark):
    """NULL answer renders the reference's str(None) literally
    ('studentAnswer: None', llm_format_convertion.py:31); NULL system-side
    content is skipped like the reference's absent key — neither may
    null-propagate into a NULL message or a NULL folded string (review
    finding)."""
    df = spark.createDataFrame(
        [(1, "sys", None, "q text", None), (2, "sys", "Rubrics: x", "q", "")],
        "doc_id bigint, sp string, rubric string, question string, answer string",
    )
    gpt = dialects.gpt_messages(
        F.col("sp"), F.col("rubric"), F.col("question"), F.col("answer")
    )
    out = {
        r.doc_id: r
        for r in df.select(
            "doc_id",
            F.to_json(gpt).alias("gpt_json"),
            F.to_json(dialects.to_claude(gpt)).alias("claude_json"),
        ).collect()
    }
    assert '"content":"studentAnswer: None"' in out[1].gpt_json
    # null rubric: folded system keeps sys + question, no null-propagation
    assert '"system":"sys\\n\\nquestion: q text"' in out[1].claude_json
    assert '"content":"No Answer"' in out[2].gpt_json
