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
    # NULL answer follows the reference literally: str(None) = 'None' != ''
    # -> "studentAnswer: None" (llm_format_convertion.py:31) — without the
    # coalesce, concat null-propagates and the whole user message (then the
    # folded claude/gemini/llama user text) silently becomes NULL
    ans = answer.cast("string")
    user = F.when(ans == "", F.lit("No Answer")).otherwise(
        F.concat(F.lit("studentAnswer: "), F.coalesce(ans, F.lit("None")))
    )
    return F.array(
        mk("system", system_prompt),
        mk("system", rubric),
        mk("system", F.concat(F.lit("question: "), question)),
        mk("user", user),
    )


# Python str.strip()'s FULL whitespace set (every codepoint where
# str.isspace() is true — enumerated from CPython, not just ASCII): scraped
# HTML routinely carries \xa0 (nbsp after entity unescape) and \u2028, and
# Python strips those too, so the Column implementation must match or it
# diverges from the byte-exact core.textops oracle on real corpora.
_WS = '\t\n\x0b\x0c\r\x1c\x1d\x1e\x1f \x85\xa0\u1680\u2000\u2001\u2002\u2003\u2004\u2005\u2006\u2007\u2008\u2009\u200a\u2028\u2029\u202f\u205f\u3000'  # every str.isspace() codepoint


def _pystrip(c: Column) -> Column:
    # Spark's trim() strips ONLY spaces; Python's .strip() (the reference
    # semantics) strips all Unicode whitespace — btrim with the explicit set
    return F.btrim(c, F.lit(_WS))


def _system_fold(gpt: Column) -> Column:
    # NULL-content messages are skipped, modeling the reference's
    # absent-key path (__contains__ guards each append,
    # llm_format_convertion.py:9-27) — folding them would null-propagate
    # through concat and silently discard the ENTIRE folded system string
    folded = F.aggregate(
        F.filter(
            gpt, lambda m: (m["role"] == "system") & m["content"].isNotNull()
        ),
        F.lit(""),
        lambda acc, m: F.concat(acc, _pystrip(m["content"]), F.lit("\n\n")),
    )
    return _pystrip(folded)


def _user_fold(gpt: Column) -> Column:
    return F.aggregate(
        F.filter(
            gpt, lambda m: (m["role"] == "user") & m["content"].isNotNull()
        ),
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


# --- vision dialects ---------------------------------------------------------
# The reference's vision converters (llm_format_convertion.py:108-155
# convert_normal_to_gpt_vision, :158-186 convert_normal_to_claude_vision,
# :188-193 convert_normal_to_gemini_number) build image-content message
# shapes. Here the image is an opaque binary column; its base64 transport
# encoding (T15) happens JVM-side. Heterogeneous content arrays (a text item
# next to an image item) are one struct type with per-shape null fields —
# to_json's default ignoreNullFields drops the unused ones, reproducing the
# reference's exact JSON shapes.


def b64_canonical(binary: Column) -> Column:
    """RFC 4648 base64 of a binary column (Spark's base64 is MIME-wrapped
    at 76 chars; strip the line breaks — the reference uses
    base64.b64encode, which never wraps)."""
    return F.regexp_replace(F.base64(binary), "[\\r\\n]", "")


def _gpt_text_item(text: Column) -> Column:
    return F.struct(
        F.lit("text").alias("type"),
        text.alias("text"),
        F.lit(None).cast("struct<url:string>").alias("image_url"),
    )


def _gpt_image_item(url: Column) -> Column:
    return F.struct(
        F.lit("image_url").alias("type"),
        F.lit(None).cast("string").alias("text"),
        F.struct(url.alias("url")).alias("image_url"),
    )


_CLAUDE_SRC_T = "struct<type:string,media_type:string,data:string>"


def _claude_text_item(text: Column) -> Column:
    return F.struct(
        F.lit("text").alias("type"),
        text.alias("text"),
        F.lit(None).cast(_CLAUDE_SRC_T).alias("source"),
    )


def _claude_image_item(b64_image: Column) -> Column:
    return F.struct(
        F.lit("image").alias("type"),
        F.lit(None).cast("string").alias("text"),
        F.struct(
            F.lit("base64").alias("type"),
            F.lit("image/webp").alias("media_type"),
            b64_image.alias("data"),
        ).alias("source"),
    )


def gpt_vision_messages(system_prompt: Column, b64_image: Column) -> Column:
    """convert_normal_to_gpt_vision, openai-ocr/gpt-ocr branch
    (llm_format_convertion.py:121-138): one user message with a text block
    and a data-url webp image block."""
    url = F.concat(F.lit("data:image/webp;base64,"), b64_image)
    return F.array(
        F.struct(
            F.lit("user").alias("role"),
            F.array(_gpt_text_item(system_prompt), _gpt_image_item(url)).alias(
                "content"
            ),
        )
    )


def gpt_vision_url_messages(
    system_prompt: Column, question: Column, rubric: Column, answer_url: Column
) -> Column:
    """convert_normal_to_gpt_vision, non-ocr branch
    (llm_format_convertion.py:139-155): text block folds
    systemPrompt + ", Question: " + question + " ," + rubric (quirky commas
    preserved); the image block carries the RAW answerUrl."""
    text = F.concat(
        system_prompt, F.lit(", Question: "), question, F.lit(" ,"), rubric
    )
    return F.array(
        F.struct(
            F.lit("user").alias("role"),
            F.array(_gpt_text_item(text), _gpt_image_item(answer_url)).alias(
                "content"
            ),
        )
    )


def claude_vision_messages(system_prompt: Column, b64_image: Column) -> Column:
    """convert_normal_to_claude_vision (llm_format_convertion.py:158-186):
    one user message with a text block and a base64-source image block
    ({type, media_type, data})."""
    return F.array(
        F.struct(
            F.lit("user").alias("role"),
            F.array(
                _claude_text_item(system_prompt), _claude_image_item(b64_image)
            ).alias("content"),
        )
    )


def gemini_number_payload(b64_image: Column, batch_size: Column) -> Column:
    """convert_normal_to_gemini_number (llm_format_convertion.py:188-193):
    {base64_image, batch_size} pass-through payload."""
    return F.struct(
        b64_image.alias("base64_image"), batch_size.alias("batch_size")
    )
