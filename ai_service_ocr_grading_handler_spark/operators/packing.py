"""Sequence packing: assign documents to fixed-token-budget training
sequences (the GPT-style pretraining data-prep step after curation).

Packing is inherently sequential-greedy, so it is the sanctioned
`applyInPandas` case: token counts are computed NATIVELY first
(`textquality.bpe_token_count`, scan-speed), then documents are
hash-assigned to independent packing groups and each group is packed by
one Arrow-batched Python pass. No global state: at 100 TB every group
packs in parallel, and the small per-group tail waste (< one pack) is the
standard trade — global optimal packing is bin-packing (NP-hard) and
buys ~nothing at realistic pack sizes.

Determinism: group = pmod(xxhash64(id), n_groups), in-group order = id
ascending — independent of the input partitioning (tested), so a resumed
run packs identically.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ai_service_ocr_grading_handler_spark.core.partitioning import widen_if_narrow
from ai_service_ocr_grading_handler_spark.operators.textquality import bpe_token_count


def _pack_schema(id_col: str, id_type: str) -> str:
    """Output schema derived from the caller's id column name AND type —
    a hardcoded 'doc_id bigint' would rename (or fail Arrow conversion
    for) any non-default id."""
    return (
        f"group_id int, pack_id bigint, {id_col} {id_type},"
        " n_tokens int, oversize boolean"
    )


def md5_group_id(id_col: str, n_groups: int) -> "F.Column":
    """md5-derived group assignment — same distribution quality as the
    default xxhash64 but reproducible in DuckDB, so oracle-checked callers
    (the registry) can cross-engine-verify the full pack assignment."""
    return F.expr(
        f"cast(pmod(cast(conv(substring(md5(cast({id_col} as string)), 1, 15),"
        f" 16, 10) as bigint), {n_groups}) as int)"
    )


def md5_group_id_duck(id_col: str, n_groups: int) -> str:
    """DuckDB twin of md5_group_id."""
    return (
        f"(('0x' || substr(md5({id_col}::varchar), 1, 15))::bigint"
        f" % {n_groups})::int"
    )


def pack_sequences(
    df: DataFrame,
    max_tokens: int = 2048,
    n_groups: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
    group_col: "F.Column | None" = None,
) -> DataFrame:
    """(group_id, pack_id, <id_col>, n_tokens, oversize): greedy first-fit in
    id order within each hash group; a document alone exceeding the budget
    gets its own pack with oversize=true (callers split or drop those —
    this operator never silently truncates text).

    Plan: native token counting -> ONE shuffle on the group key ->
    per-group Arrow-batched greedy pass. Output carries ids + counts only;
    text never crosses the shuffle (join it back by id afterwards if the
    packed text is needed — at scale that join is id-bucketed).

    `group_col` overrides the xxhash64 group assignment (e.g.
    `md5_group_id` for cross-engine oracle checks); it must be
    deterministic in `id_col` or packing loses resume-determinism."""
    import pandas as pd

    # the BPE-ish token-count regex is the expensive per-row step: widen
    # off a single-split scan first (no-op on wide inputs; packing is
    # deterministic in ids — groups hash ids, packs sort by id)
    df = widen_if_narrow(df, by=F.col(id_col))
    counted = df.select(
        F.col(id_col),
        bpe_token_count(text_col).alias("n_tokens"),
        (
            group_col
            if group_col is not None
            else F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_groups)).cast("int")
        ).alias("group_id"),
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col).reset_index(drop=True)
        pack_ids, oversize = [], []
        cur_pack, cur_tokens = 0, 0
        for n in pdf["n_tokens"]:
            n = int(n)
            if cur_tokens > 0 and cur_tokens + n > max_tokens:
                cur_pack += 1
                cur_tokens = 0
            pack_ids.append(cur_pack)
            oversize.append(n > max_tokens)
            cur_tokens += n
            if cur_tokens >= max_tokens:
                cur_pack += 1
                cur_tokens = 0
        return pd.DataFrame(
            {
                "group_id": pdf["group_id"],
                "pack_id": pack_ids,
                id_col: pdf[id_col],
                "n_tokens": pdf["n_tokens"],
                "oversize": oversize,
            }
        )

    id_type = dict(
        (f.name, f.dataType.simpleString()) for f in df.schema.fields
    )[id_col]
    return counted.groupBy("group_id").applyInPandas(
        pack, schema=_pack_schema(id_col, id_type)
    )


def packing_stats(packed: DataFrame, max_tokens: int = 2048) -> DataFrame:
    """One row: pack count, mean fill ratio, and oversize-doc count — the
    number a data engineer watches (fill ~0.9+ means the pack budget and
    doc-length distribution are compatible)."""
    per_pack = packed.groupBy("group_id", "pack_id").agg(
        F.sum("n_tokens").alias("pack_tokens"),
        F.max(F.col("oversize").cast("int")).alias("has_oversize"),
    )
    return per_pack.agg(
        F.count(F.lit(1)).alias("n_packs"),
        F.round(
            F.avg(F.least(F.col("pack_tokens"), F.lit(max_tokens)) / max_tokens), 4
        ).alias("mean_fill"),
        F.sum("has_oversize").alias("n_oversize_packs"),
    )


def chunk_documents(
    df: DataFrame,
    window: int = 1000,
    stride: int = 800,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Long-document word-window chunking with overlap (window - stride
    words shared between consecutive chunks) — how oversize documents from
    `pack_sequences` become trainable pieces without silent truncation.

    (id, chunk_idx, chunk_text, n_words) rows; a document shorter than
    `window` yields exactly itself as chunk 0. Pure per-row expressions +
    one posexplode: zero shuffle, zero Python — the corpus streams
    through. The split is lambda-bound so it tokenizes once per row (see
    dedup._SHINGLES_SPARK); chunk count = ceil(max(n - window + stride,
    0) / stride) + 1 matches the DuckDB twin exactly (tested)."""
    if not 0 < stride <= window:
        raise ValueError(f"need 0 < stride <= window, got {stride}/{window}")
    # widen off a single-split scan before the per-row chunking expression
    df = widen_if_narrow(df, by=F.col(id_col))
    chunks = (
        "flatten(transform(array(split({t}, ' ')), ws ->"
        " transform(sequence(0, cast(ceil(greatest(size(ws) - {w} + {s}, 0) / {s})"
        " as int)),"
        " i -> struct(i AS chunk_idx,"
        " array_join(slice(ws, i * {s} + 1, {w}), ' ') AS chunk_text,"
        " size(slice(ws, i * {s} + 1, {w})) AS n_words))))"
    ).format(t=text_col, w=window, s=stride)
    return (
        df.select(F.col(id_col), F.explode(F.expr(chunks)).alias("c"))
        .select(id_col, "c.chunk_idx", "c.chunk_text", "c.n_words")
        # the ceil() bound over-counts by one exactly when stride divides
        # (n - window) evenly AND n > window; that trailing empty slice is
        # dropped here rather than special-cased in the bound
        .filter(F.col("n_words") > 0)
    )


def chunk_documents_duck(
    window: int = 1000,
    stride: int = 800,
    text_col: str = "text",
    id_col: str = "doc_id",
    table: str = "documents",
) -> str:
    """DuckDB twin of chunk_documents."""
    return f"""
    SELECT {id_col}, c.i AS chunk_idx,
           array_to_string(list_slice(string_split({text_col}, ' '),
                           c.i * {stride} + 1, c.i * {stride} + {window}), ' ')
             AS chunk_text
    FROM {table},
      LATERAL (SELECT unnest(range(0,
        ceil(greatest(len(string_split({text_col}, ' ')) - {window} + {stride}, 0)
             / {stride})::bigint + 1)) AS i) c
    WHERE len(list_slice(string_split({text_col}, ' '),
              c.i * {stride} + 1, c.i * {stride} + {window})) > 0
    """
