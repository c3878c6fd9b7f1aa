"""Totality sweep: EVERY per-document operator applied to one adversarial
frame (empty text, whitespace-only, single char, one giant word, newline
storms, unicode whitespace, CJK, punctuation-only, NULL) must complete —
no expression may throw under ANSI mode for a poisoned row. This is the
systematic form of the one-off regressions that caught the shingle
sequence crash, the punct_ratio divide-by-zero and the short-embedding
element_at crash."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from ai_service_ocr_grading_handler_spark.operators import (
    curation,
    dedup,
    packing,
    sampling,
    textquality,
)

ADVERSARIAL = [
    (1, ""),
    (2, " "),
    (3, "\n\n\n"),
    (4, "x"),
    (5, "w" * 5000),
    (6, "a\nb\nc\n" * 50),
    (7, "  　"),
    (8, "こんにちは世界"),
    (9, ".,;:!?.,;:!?"),
    (10, None),
    (11, "normal words in a short document here"),
]


@pytest.fixture(scope="module")
def adv(spark):
    return spark.createDataFrame(ADVERSARIAL, "doc_id bigint, text string")


def test_quality_and_fingerprint_columns_total(spark, adv):
    # collect(), NEVER count(): Catalyst prunes unreferenced projection
    # columns under count(), so the tested expressions would not execute
    # at all and the sweep would be vacuous (review finding — verified:
    # count() succeeded over an expression that provably throws)
    cols = [
        F.inline(F.array(textquality.quality_row("text"))),
    ]
    assert len(adv.select("doc_id", *cols).collect()) == len(ADVERSARIAL)
    more = adv.select(
        "doc_id",
        textquality.bpe_token_count("text").alias("bpe"),
        textquality.rolling_fingerprint("text").alias("kr"),
        dedup.shingles_col().alias("sh"),
        dedup.word_hashes_col("text").alias("wh"),
        curation.line_dedup("text").alias("ld"),
        dedup.pii_redact("text").alias("pii"),
    )
    assert len(more.collect()) == len(ADVERSARIAL)


def test_dedup_tiers_total(spark, adv):
    # collect(), not count(): count() lets Catalyst prune non-key
    # aggregate/projection expressions (review finding)
    nn = adv.filter(F.col("text").isNotNull())
    assert len(dedup.exact_dedup(nn).collect()) > 0
    dedup.jaccard_pairs(nn).collect()
    dedup.minhash_lsh_neardups(nn).collect()
    dedup.simhash_neardup_pairs(nn).collect()
    dedup.paragraph_dedup(nn).collect()


def test_curation_packing_total(spark, adv):
    nn = adv.filter(F.col("text").isNotNull())
    curation.curate_corpus(nn).collect()
    packing.pack_sequences(nn, max_tokens=64).collect()
    packing.chunk_documents(nn, window=10, stride=5).collect()
    df = nn.withColumn("source", F.lit("src1"))
    sampling.mix_sources(
        sampling.deterministic_split(df, {"train": 0.9, "val": 0.1}),
        {"src1": 1.5},
    ).collect()


def test_decontaminate_total(spark, adv):
    nn = adv.filter(F.col("text").isNotNull())
    bench = spark.createDataFrame(
        [(100, ""), (101, None), (102, "one two three")], "doc_id bigint, text string"
    ).filter(F.col("text").isNotNull())
    assert len(dedup.decontaminate(nn, bench).collect()) == nn.count()  # no 13-gram overlaps


def test_semantic_dedup_total_over_poisoned_embeddings(spark):
    """Zero vectors (NULL cosine), short arrays, empty arrays and
    duplicates must flow through without killing a task."""
    from ai_service_ocr_grading_handler_spark.operators import similarity as sim

    rows = [
        (1, [0.0] * 64),            # zero vector -> NULL cosine
        (2, [1.0] * 64),
        (3, [1.0] * 64),            # exact dup of 2 -> dropped
        (4, [0.5] * 8),             # short embedding -> NULL dots tail
        (5, []),                    # empty embedding
        (6, [float(i) for i in range(64)]),
    ]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    out = {r.vec_id for r in sim.semantic_dedup(df.select(
        "vec_id", F.col("embedding").cast("array<float>").alias("embedding")
    )).collect()}
    assert 2 in out and 3 not in out  # dup pruned deterministically
    assert 1 in out and 6 in out      # zero vector never pollutes others
