"""Group-batch extraction kernel: the ensemble/number path (SURVEY.md §2.8).

Reimplements the reference's NumberOCR batch pipeline
(/root/reference/engine/core/llm_number_prediction.py:24-223) Spark-first:

- K12 ensemble accumulate (service_handler.py:60-62,74-78): rows sharing a
  `batch_id` are gathered into one group — here `groupBy(batch_id)`.
- A5 stacked-image fold (llm_number_prediction.py:83-99): max(width),
  sum(height) + 10px spacing over the group's crops, folded into one
  artifact before a single kernel call.
- K7/K13 single batched model call (llm_number_prediction.py:101-128):
  replaced by a deterministic parse of the stacked artifact.
- T9 newline split (llm_number_prediction.py:124) + A3 count validation
  (llm_number_prediction.py:125-126).
- J4 positional answer<->prediction zip with exact-match scoring
  (`assign_number_to_list`, llm_number_prediction.py:185-205). The reference
  has a stale-variable quirk there: `score` is ONLY assigned when the
  prediction matches, so a mismatching row inherits the score of the most
  recent matching row in the same batch. Preserved verbatim (the synthetic
  corpus guarantees position 0 of every batch matches, like production
  traffic kept the reference from hitting the unbound-variable case).

Scale notes: one shuffle on `batch_id` (the group key). Groups are TINY
(<= BATCH_SIZE crops of one answer sheet), which makes
`groupBy().applyInPandas` an anti-pattern: it pays one Arrow slice + one
Python call + one pandas-DataFrame construction PER GROUP (measured ~5 s
for 6k groups at sf0.1). Instead the batches are co-located with
repartition(batch_id) + sortWithinPartitions(batch_id, pos) and processed
by a chunk-stitched ``mapInPandas``: each Arrow chunk handles THOUSANDS of
batches vectorized, and a batch that straddles a chunk boundary is carried
into the next chunk (chunks of one partition arrive in order). Group skew
is bounded by sheet size, not data size. Output drops the crop bytes; only
scalars leave the kernel.
"""

from __future__ import annotations

import re
from typing import Iterator

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

BATCH_SIZE = 8
SPACING_PX = 10  # llm_number_prediction.py:91 vertical spacing analog

# fake "crop" payload: deterministic stand-in for the PNG bytes the reference
# downloads per box (llm_number_prediction.py:39-55); parse is exact.
_CROP_FMT = "PNGFAKE|%d"
_CROP_RE = re.compile(r"^PNGFAKE\|(\d+)$")

NUMBER_RESULT_DDL = (
    "doc_id bigint, batch_id bigint, pos int, predicted int, correct_answer int, "
    "score double, max_score double, batch_valid boolean, "
    "stacked_width int, stacked_height int"
)


def number_requests(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents -> digit-box request rows (the reqobj analog of
    testCase.txt:436 gemini-number payloads), all native columns.

    written digit == correct answer except when doc_id%5==1 (and never at
    batch position 0, so the reference's stale-score path stays defined).
    """
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    d = F.col("doc_id")
    correct = (d * 7) % 100
    written = F.when((d % BATCH_SIZE == 0) | (d % 5 != 1), correct).otherwise(
        (d * 7 + 3) % 100
    )
    return docs.select(
        d.alias("doc_id"),
        F.floor(d / BATCH_SIZE).alias("batch_id"),
        (d % BATCH_SIZE).cast("int").alias("pos"),
        correct.cast("int").alias("correct_answer"),
        (F.lit(1.0) + (d % 3)).alias("max_score"),
        (F.lit(20) + (written % 5)).cast("int").alias("crop_height"),
        F.encode(F.format_string(_CROP_FMT, written.cast("int")), "utf-8").alias(
            "crop"
        ),
    )


def predict_numbers(requests: DataFrame) -> DataFrame:
    """Batched number prediction: stack -> one parse per batch -> unzip.

    Semantics are the reference's batch lifecycle — stacking fold A5,
    batched kernel K7/K13, newline split T9, count check A3, positional
    scoring zip J4 with the stale-score quirk — executed as a
    chunk-stitched ``mapInPandas`` (see module docstring): batches are
    co-located and ordered by (batch_id, pos), each Arrow chunk processes
    all its complete batches vectorized, and the trailing
    possibly-incomplete batch is carried into the next chunk. The
    stale-score quirk (`score` only reassigned on a match, so mismatching
    rows inherit the last matching row's score) is exactly a per-batch
    forward-fill of matched max_scores.
    """
    import numpy as np
    import pandas as pd

    def process(pdf: pd.DataFrame) -> pd.DataFrame:
        # pdf holds whole batches, sorted by (batch_id, pos)
        # errors="replace": invalid UTF-8 in a crop must degrade to a
        # failed parse (-1 + batch_valid False below), never a
        # UnicodeDecodeError that kills the task (found by review)
        crops = [bytes(c).decode("utf-8", errors="replace") for c in pdf["crop"]]
        bid = pdf["batch_id"]
        g = pdf.groupby(bid, sort=False)
        # K7/K13 + T9: the stacked artifact's newline split returns the
        # crops in order, so the per-line kernel parse is per-crop. The
        # parse is TOTAL: a crop whose text doesn't match yields -1 (the
        # batch_valid flag below is what rejects it) — a poisoned crop
        # must never kill the task.
        matches = [_CROP_RE.match(c) for c in crops]
        predicted = pd.Series(
            [int(m.group(1)) if m else -1 for m in matches], index=pdf.index
        )
        # A5: canvas fold — max width, sum height + spacing between crops
        clen = pd.Series([len(c) for c in crops], index=pdf.index)
        n = g["doc_id"].transform("size")
        width = clen.groupby(bid, sort=False).transform("max")
        height = g["crop_height"].transform("sum") + SPACING_PX * (n - 1)
        # A3: reject when #numbers != #boxes (llm_number_prediction.py:
        # 125-126). The count compared against the box count is the LINE
        # count of the stacked artifact's newline split (T9) — a crop
        # whose decoded text embeds a newline yields extra lines and fails
        # the check, exactly the reference's failure mode. (The earlier
        # form compared the group size to itself — always True — making
        # the reference quirk unfalsifiable; found by review, pinned by
        # test.)
        n_lines = pd.Series(
            [c.count("\n") + 1 for c in crops], index=pdf.index
        ).groupby(bid, sort=False).transform("sum")
        valid = n_lines == n
        # J4 + stale-score quirk (llm_number_prediction.py:185-205):
        # forward-fill the last matching max_score within the batch
        match = predicted.values == pdf["correct_answer"].values
        s = pd.Series(
            np.where(match, pdf["max_score"].values, np.nan), index=pdf.index
        )
        scores = s.groupby(bid, sort=False).ffill()
        return pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "batch_id": pdf["batch_id"],
                "pos": pdf["pos"],
                "predicted": predicted,
                "correct_answer": pdf["correct_answer"],
                "score": scores,
                "max_score": pdf["max_score"],
                "batch_valid": valid,
                "stacked_width": width,
                "stacked_height": height,
            }
        )

    def run_chunks(chunks: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        carry: pd.DataFrame | None = None
        for pdf in chunks:
            if carry is not None and len(carry):
                pdf = pd.concat([carry, pdf], ignore_index=True)
            # the chunk's last batch may continue in the next chunk: hold it
            last = pdf["batch_id"].iloc[-1]
            tail = pdf["batch_id"] == last
            carry = pdf[tail]
            done = pdf[~tail]
            if len(done):
                yield process(done)
        if carry is not None and len(carry):
            yield process(carry)

    ordered = requests.repartition("batch_id").sortWithinPartitions(
        "batch_id", "pos"
    )
    return ordered.mapInPandas(run_chunks, schema=NUMBER_RESULT_DDL)
