"""Pages source/sink: schema enforcement, partition pruning, scan pushdown."""

from __future__ import annotations

import pyspark.sql.functions as F

from ai_service_ocr_grading_handler_spark.corpus import pages_df_from_documents
from ai_service_ocr_grading_handler_spark.sources import pages as src

SF = "/root/testdata/sf0.001"


def test_roundtrip_and_schema(spark, tmp_path):
    p = str(tmp_path / "pages")
    df = pages_df_from_documents(spark, SF)
    src.write_pages_partitioned(df, p)
    back = src.read_pages(spark, p)
    assert back.columns == src.PAGES_COLUMNS
    assert back.count() == df.count()
    # content identical (partitioning is derived, not destructive)
    a = {r.url: (r.text, r.lang) for r in df.collect()}
    b = {r.url: (r.text, r.lang) for r in back.collect()}
    assert a == b


def test_time_bounds_prune_partitions(spark, tmp_path):
    p = str(tmp_path / "pages")
    # sf0.001 timestamps all land on 2024-01-01 (37s stride); spread them
    # over 5 deterministic days so pruning has partitions to skip
    df = pages_df_from_documents(spark, SF).withColumn(
        "warc_ts",
        F.expr(
            "warc_ts + make_interval(0, 0, 0,"
            " cast(pmod(xxhash64(url), 5) as int), 0, 0, 0)"
        ),
    )
    src.write_pages_partitioned(df, p)

    bounded = src.read_pages(spark, p, since="2024-01-02", until="2024-01-04")
    plan = bounded._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "warc_day" in plan

    want = df.filter(
        (F.to_date("warc_ts") >= F.lit("2024-01-02"))
        & (F.to_date("warc_ts") < F.lit("2024-01-04"))
    ).count()
    assert bounded.count() == want
    assert 0 < bounded.count() < df.count()


def test_lang_filter_is_pushed_to_scan(spark, tmp_path):
    p = str(tmp_path / "pages")
    src.write_pages_partitioned(pages_df_from_documents(spark, SF), p)
    df = src.read_pages(spark, p, langs=["en"])
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "lang" in plan
    assert df.count() > 0
    assert df.filter(F.col("lang") != "en").count() == 0


# --- WARC ingestion (round 4) --------------------------------------------------


def _warc_record(wtype: str, uri: str | None, date: str, payload: bytes) -> bytes:
    head = [f"WARC/1.0", f"WARC-Type: {wtype}", f"WARC-Date: {date}"]
    if uri:
        head.append(f"WARC-Target-URI: {uri}")
    head.append(f"Content-Length: {len(payload)}")
    return ("\r\n".join(head) + "\r\n\r\n").encode() + payload + b"\r\n\r\n"


def _http(status: int, ctype: str, body: bytes, chunked: bool = False) -> bytes:
    if chunked:
        body = (
            f"{len(body):x}".encode() + b"\r\n" + body + b"\r\n0\r\n\r\n"
        )
        te = "Transfer-Encoding: chunked\r\n"
    else:
        te = ""
    return (
        f"HTTP/1.1 {status} X\r\nContent-Type: {ctype}\r\n{te}"
        f"Content-Length: {len(body)}\r\n\r\n"
    ).encode() + body


def _fixture_warc() -> tuple[bytes, list[tuple[str, bytes]]]:
    """(raw warc bytes, [(expected_url, expected_html)]) — record mix:
    html 200 (kept), chunked html 200 (kept, de-chunked), request
    (dropped), 404 (dropped), non-html 200 (dropped), revisit (dropped)."""
    html1 = b"<html><body><p>" + b"alpha words " * 20 + b"</p></body></html>"
    html2 = b"<html><body><p>" + b"beta words " * 25 + b"</p></body></html>"
    recs = [
        _warc_record(
            "response", "https://a.example/1", "2024-05-06T07:08:09Z",
            _http(200, "text/html; charset=utf-8", html1),
        ),
        _warc_record(
            "request", "https://a.example/1", "2024-05-06T07:08:09Z",
            b"GET /1 HTTP/1.1\r\nHost: a.example\r\n\r\n",
        ),
        _warc_record(
            "response", "https://a.example/404", "2024-05-06T07:08:10Z",
            _http(404, "text/html", b"<html>gone</html>"),
        ),
        _warc_record(
            "response", "https://a.example/img", "2024-05-06T07:08:11Z",
            _http(200, "image/png", b"\x89PNGnotreally"),
        ),
        _warc_record(
            "response", "https://b.example/2", "2024-05-06T08:00:00Z",
            _http(200, "text/html", html2, chunked=True),
        ),
        _warc_record("revisit", "https://a.example/1", "2024-05-06T09:00:00Z", b""),
    ]
    expected = [("https://a.example/1", html1), ("https://b.example/2", html2)]
    return b"".join(recs), expected


def test_warc_record_iteration_raw_and_gzip():
    import gzip
    import zlib

    from ai_service_ocr_grading_handler_spark.sources import warc

    raw, expected = _fixture_warc()
    # per-record gzip members, Common-Crawl style
    gz = b"".join(
        gzip.compress(raw[i:j])
        for i, j in _record_bounds(raw)
    )
    for blob in (raw, gz):
        kept = [
            (uri, body)
            for wtype, uri, date, status, ctype, body in warc.iter_warc_records(blob)
            if wtype == "response" and status == 200 and ctype and "html" in ctype
        ]
        assert kept == expected
    # dates parse to naive UTC
    recs = list(warc.iter_warc_records(raw))
    assert warc._parse_warc_date(
        "2024-05-06T07:08:09Z"
    ).isoformat() == "2024-05-06T07:08:09"
    # corrupt gzip member raises typed
    import pytest as _pt

    with _pt.raises(ValueError):
        list(warc.iter_warc_records(b"\x1f\x8bgarbage"))


def _record_bounds(raw: bytes) -> list[tuple[int, int]]:
    """Byte ranges of each record in the concatenated fixture."""
    bounds = []
    start = 0
    while start < len(raw):
        nxt = raw.find(b"WARC/1.0", start + 1)
        end = nxt if nxt > 0 else len(raw)
        bounds.append((start, end))
        start = end
    return bounds


def test_warc_to_pages_to_extraction(spark, tmp_path):
    """The full ingestion edge: .warc.gz files -> pages rows -> the
    extraction kernel, end to end in Spark."""
    import gzip

    from ai_service_ocr_grading_handler_spark.operators.extract import extract_pages
    from ai_service_ocr_grading_handler_spark.sources import warc

    raw, expected = _fixture_warc()
    gz = b"".join(gzip.compress(raw[i:j]) for i, j in _record_bounds(raw))
    d = tmp_path / "warc"
    d.mkdir()
    (d / "seg-00001.warc.gz").write_bytes(gz)
    (d / "seg-00002.warc").write_bytes(raw)

    pages = warc.read_warc_pages(spark, str(d))
    rows = {
        (r.url, bytes(r.html), str(r.warc_ts)) for r in pages.collect()
    }
    assert rows == {
        (u, h, "2024-05-06 07:08:09" if "a.example" in u else "2024-05-06 08:00:00")
        for u, h in expected
    } | {
        (u, h, "2024-05-06 07:08:09" if "a.example" in u else "2024-05-06 08:00:00")
        for u, h in expected
    }
    assert pages.count() == 4  # 2 kept records x 2 files

    ext = extract_pages(pages).select("url", "text").collect()
    by_url = {}
    for r in ext:
        by_url.setdefault(r.url, set()).add(r.text)
    assert set(by_url) == {"https://a.example/1", "https://b.example/2"}
    assert by_url["https://a.example/1"] == {("alpha words " * 20).strip()}
    assert by_url["https://b.example/2"] == {("beta words " * 25).strip()}
