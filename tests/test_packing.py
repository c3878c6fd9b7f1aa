"""Sequence packing: budget respected, every doc packed exactly once,
oversize isolation, and partitioning-independence (determinism)."""

from __future__ import annotations

import pyspark.sql.functions as F

from ai_service_ocr_grading_handler_spark.operators import packing

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")


def test_packs_respect_budget_and_cover_every_doc(spark):
    docs = _docs(spark)
    packed = packing.pack_sequences(docs, max_tokens=512, n_groups=8).cache()
    try:
        # every doc exactly once
        assert packed.count() == docs.count()
        assert packed.select("doc_id").distinct().count() == docs.count()
        # no multi-doc pack exceeds the budget; only oversize singletons may
        per_pack = packed.groupBy("group_id", "pack_id").agg(
            F.sum("n_tokens").alias("tot"),
            F.count(F.lit(1)).alias("n_docs"),
            F.max(F.col("oversize").cast("int")).alias("over"),
        )
        bad = per_pack.filter((F.col("tot") > 512) & (F.col("over") == 0)).count()
        assert bad == 0
        # an oversize doc is always alone in its pack
        assert per_pack.filter((F.col("over") == 1) & (F.col("n_docs") > 1)).count() == 0
        stats = packing.packing_stats(packed, max_tokens=512).collect()[0]
        assert stats.n_packs == per_pack.count()
        assert 0 < stats.mean_fill <= 1.0
    finally:
        packed.unpersist()  # session-scoped spark: do not leak cache (review)


def test_packing_is_partitioning_independent(spark):
    docs = _docs(spark)
    a = set(
        map(
            tuple,
            packing.pack_sequences(docs.repartition(1), max_tokens=512).collect(),
        )
    )
    b = set(
        map(
            tuple,
            packing.pack_sequences(
                docs.repartition(16, "doc_id"), max_tokens=512
            ).collect(),
        )
    )
    assert a == b


def test_oversize_doc_flagged_not_truncated(spark):
    df = spark.createDataFrame(
        [(1, "word " * 5000), (2, "short doc here"), (3, "another short one")],
        "doc_id bigint, text string",
    )
    packed = packing.pack_sequences(df, max_tokens=100, n_groups=1).collect()
    rows = {r.doc_id: r for r in packed}
    assert rows[1].oversize and rows[1].n_tokens > 100
    assert not rows[2].oversize and not rows[3].oversize
    # the oversize doc sits alone in its pack
    assert (
        len([r for r in packed if (r.group_id, r.pack_id) == (rows[1].group_id, rows[1].pack_id)])
        == 1
    )


def test_chunking_matches_duckdb_and_overlaps(spark):
    import duckdb

    docs = _docs(spark)
    got = {
        (r.doc_id, r.chunk_idx): r.chunk_text
        for r in packing.chunk_documents(docs, window=40, stride=30).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"create view documents as select * from read_parquet('{SF}/documents.parquet')"
    )
    want = {
        (d, i): t
        for d, i, t in con.execute(
            packing.chunk_documents_duck(window=40, stride=30)
        ).fetchall()
    }
    assert got == want
    # at least one long doc chunked, and consecutive chunks overlap by
    # window - stride = 10 words
    multi = [k for k in got if k[1] == 1]
    assert multi
    did = multi[0][0]
    w0, w1 = got[(did, 0)].split(" "), got[(did, 1)].split(" ")
    assert w0[30:] == w1[: len(w0) - 30]
    # short docs come back whole as chunk 0
    short = spark.createDataFrame(
        [(1, "just a few words"), (2, "")], "doc_id bigint, text string"
    )
    rows = packing.chunk_documents(short, window=40, stride=30).collect()
    assert {(r.doc_id, r.chunk_idx, r.chunk_text) for r in rows} == {
        (1, 0, "just a few words"),
        (2, 0, ""),
    }


def test_pack_sequences_respects_custom_id_col(spark):
    """The output id column keeps the caller's name and type (review
    finding: a hardcoded 'doc_id bigint' schema renamed or broke
    non-default ids)."""
    df = spark.createDataFrame(
        [("a", "five words of text here"), ("b", "and some more words too")],
        "vec_id string, text string",
    )
    packed = packing.pack_sequences(df, max_tokens=50, id_col="vec_id")
    assert "vec_id" in packed.columns and "doc_id" not in packed.columns
    got = {r.vec_id for r in packed.collect()}
    assert got == {"a", "b"}
