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

from ai_service_ocr_grading_handler_spark.operators.textquality import bpe_token_count

PACK_SCHEMA = (
    "group_id int, pack_id bigint, doc_id bigint, n_tokens int, oversize boolean"
)


def pack_sequences(
    df: DataFrame,
    max_tokens: int = 2048,
    n_groups: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(group_id, pack_id, doc_id, n_tokens, oversize): greedy first-fit in
    id order within each hash group; a document alone exceeding the budget
    gets its own pack with oversize=true (callers split or drop those —
    this operator never silently truncates text).

    Plan: native token counting -> ONE shuffle on the group key ->
    per-group Arrow-batched greedy pass. Output carries ids + counts only;
    text never crosses the shuffle (join it back by id afterwards if the
    packed text is needed — at scale that join is id-bucketed)."""
    import pandas as pd

    counted = df.select(
        F.col(id_col),
        bpe_token_count(text_col).alias("n_tokens"),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_groups))
        .cast("int")
        .alias("group_id"),
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
                "doc_id": pdf[id_col],
                "n_tokens": pdf["n_tokens"],
                "oversize": oversize,
            }
        )

    return counted.groupBy("group_id").applyInPandas(pack, schema=PACK_SCHEMA)


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
