"""Text normalization tier: mojibake repair (native expressions) and NFC
(Arrow kernel). The registry row `normalize_text` value-checks the happy
path cross-engine; these pin the edge semantics. All non-ASCII fixture
characters are written as escapes so the intent survives any editor."""

import pyspark.sql.functions as F

from ai_service_ocr_grading_handler_spark.operators import normalize


def _fix_all(spark, texts):
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    return [
        r.out
        for r in df.select(normalize.fix_mojibake("text").alias("out")).collect()
    ]


def test_fix_mojibake_repairs_both_misread_flavors(spark):
    # U+2019 apostrophe is E2 80 99 in UTF-8. A cp1252 misread renders the
    # printable forms (a-circumflex, euro, trademark); a Latin-1 misread
    # leaves raw C1 controls. Both must repair to the same string.
    cp1252 = "it\u00e2\u20ac\u2122s"
    latin1 = "it\u00e2\u0080\u0099s"
    two_byte = "caf\u00c3\u00a9"  # e-acute misread as A-tilde + copyright
    got = _fix_all(spark, [cp1252, latin1, two_byte])
    assert got == ["it\u2019s", "it\u2019s", "caf\u00e9"]


def test_fix_mojibake_no_false_positives(spark):
    clean = [
        # real accents: no lead-byte + continuation-byte adjacency
        "caf\u00e9 d\u00e9j\u00e0 vu \u2014 na\u00efve r\u00e9sum\u00e9",
        "plain ascii text",
        "\u65e5\u672c\u8a9e\u306e\u30c6\u30ad\u30b9\u30c8",  # non-Latin
        # signature present but mixed with non-Latin: latin1_only refuses
        "mixed \u65e5\u672c\u8a9e with \u00c3\u00a9 signature",
        "",
    ]
    assert _fix_all(spark, clean) == clean


def test_fix_mojibake_idempotent_and_flagged(spark):
    texts = ["caf\u00c3\u00a9 bar", "clean row", "it\u00e2\u20ac\u2122s"]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    once = df.select(normalize.fix_mojibake("text").alias("text"))
    twice = once.select(normalize.fix_mojibake("text").alias("text"))
    assert [r.text for r in once.collect()] == [r.text for r in twice.collect()]
    flags = [
        r.f
        for r in df.select(normalize.is_mojibake("text").alias("f")).collect()
    ]
    assert flags == [True, False, True]


def test_fix_mojibake_invalid_utf8_bytes_left_alone(spark):
    # signature present (C3 A9 pair) and all-Latin-1, but the byte stream
    # contains 0xFF which no UTF-8 text allows — the is_valid_utf8 gate
    # must refuse rather than throw (Spark 4's decode raises
    # MALFORMED_CHARACTER_CODING on such input)
    broken = "x\u00c3\u00a9\u00ffy\u00c3z"
    assert _fix_all(spark, [broken]) == [broken]


def test_nfc_normalize_kernel(spark):
    rows = [
        (1, "cafe\u0301", "A\u030a"),  # decomposed e+acute, A+ring
        (2, "already caf\u00e9", "ok"),
        (3, None, "x"),
    ]
    df = spark.createDataFrame(rows, "id bigint, a string, b string").repartition(3)
    out = {
        r.id: (r.a, r.b)
        for r in normalize.nfc_normalize(df, cols=("a", "b")).collect()
    }
    assert out[1] == ("caf\u00e9", "\u00c5")
    assert out[2] == ("already caf\u00e9", "ok")
    assert out[3] == (None, "x")
    # idempotent and partitioning-invariant
    again = {
        r.id: (r.a, r.b)
        for r in normalize.nfc_normalize(
            normalize.nfc_normalize(df.coalesce(1), cols=("a", "b")),
            cols=("a", "b"),
        ).collect()
    }
    assert again == out
