"""Provider message-dialect conversion as NATIVE struct/array transforms.

The reference converts a normalized message object into per-provider
request dialects (gpt -> claude/gemini/llama) with per-request Python
loops (/root/reference/engine/core/llm_format_convertion.py). Here each
conversion is a pure Column expression over an array<struct<role,content>>
— whole-stage codegen, zero Python — and `core.textops` holds the
byte-exact plain-Python ports used as the pytest oracle.

Quirks preserved: system contents are strip()ed and joined with blank
lines then strip()ed again; user contents concatenate with a TRAILING
comma; an empty answer becomes the bare string "No Answer"; gemini uses
the reference's second (live) definition of convert_gpt_to_gemini.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column


def gpt_messages(
    system_prompt: Column, rubric: Column, question: Column, answer: Column
) -> Column:
    """convert_normal_to_gpt: ordered 4-message array."""
    mk = lambda role, content: F.struct(
        F.lit(role).alias("role"), content.alias("content")
    )
    user = F.when(
        answer.cast("string") == "", F.lit("No Answer")
    ).otherwise(F.concat(F.lit("studentAnswer: "), answer.cast("string")))
    return F.array(
        mk("system", system_prompt),
        mk("system", rubric),
        mk("system", F.concat(F.lit("question: "), question)),
        mk("user", user),
    )


_WS = " \t\n\r\x0b\f"  # Python str.strip()'s whitespace set


def _pystrip(c: Column) -> Column:
    # Spark's trim() strips ONLY spaces; Python's .strip() (the reference
    # semantics) also strips newlines/tabs — btrim with an explicit set
    return F.btrim(c, F.lit(_WS))


def _system_fold(gpt: Column) -> Column:
    folded = F.aggregate(
        F.filter(gpt, lambda m: m["role"] == "system"),
        F.lit(""),
        lambda acc, m: F.concat(acc, _pystrip(m["content"]), F.lit("\n\n")),
    )
    return _pystrip(folded)


def _user_fold(gpt: Column) -> Column:
    return F.aggregate(
        F.filter(gpt, lambda m: m["role"] == "user"),
        F.lit(""),
        lambda acc, m: F.concat(acc, m["content"], F.lit(",")),
    )


def to_claude(gpt: Column) -> Column:
    return F.struct(
        _system_fold(gpt).alias("system"),
        F.array(
            F.struct(
                F.lit("user").alias("role"),
                F.array(
                    F.struct(
                        _user_fold(gpt).alias("text"), F.lit("text").alias("type")
                    )
                ).alias("content"),
            )
        ).alias("messages"),
    )


def to_gemini(gpt: Column) -> Column:
    return F.struct(
        _system_fold(gpt).alias("system"),
        F.array(
            F.struct(
                F.lit("user").alias("role"),
                F.array(_user_fold(gpt)).alias("parts"),
            )
        ).alias("messages"),
    )


def to_llama(gpt: Column) -> Column:
    return F.struct(
        _system_fold(gpt).alias("system"), _user_fold(gpt).alias("prompt")
    )
