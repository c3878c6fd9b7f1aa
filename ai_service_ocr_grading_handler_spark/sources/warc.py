"""WARC source: Common-Crawl-style archive files -> the pages table.

The north rule's input is an Iceberg table of Common-Crawl-style pages
(url, warc_ts, html, ...). Upstream of that table sits the crawl archive
itself: WARC/1.0 files (ISO 28500), usually one gzip member PER RECORD
concatenated into a `.warc.gz`. This module is the ingestion edge that
turns those bytes into `PAGES_SCHEMA` rows — the step a real 100 TB
pipeline runs before anything in this repo's extraction tier.

Pure stdlib parsing (zlib for the gzip members), Arrow-batched on the
Spark side:

- `iter_warc_records(blob)` — records from raw or multi-member-gzip WARC
  bytes: (warc_type, target_uri, warc_date, http_status, content_type,
  body). HTTP response payloads are split at the header/body boundary and
  the status + Content-Type lifted out; chunked transfer encoding is
  de-chunked (Common Crawl stores it verbatim).
- `warc_pages(files_df)` — mapInArrow kernel over `binaryFile` rows
  (path, content) -> pages rows (url, warc_ts, html, lang=NULL,
  text=NULL) for every 200-status HTML response record. One narrow pass,
  zero shuffle; at 100 TB each ~1 GB .warc.gz is one task and the kernel
  streams gzip members without materializing the decompressed archive.
- `read_warc_pages(spark, glob)` — binaryFile scan + kernel, the
  composition a job submits.

Scale notes: `binaryFile` ships whole files to tasks — exactly how WARC
is meant to be split (per-file parallelism; Common Crawl segments are
~1 GB for this reason). Records decompress one member at a time with a
bounded inflater (`_MAX_MEMBER_BYTES`), so a single huge/craftred record
fails typed instead of OOMing the executor. The kernel keeps only HTML
response records; revisit/request/metadata records are dropped at parse
time, before anything crosses Arrow.

Reference analog: this occupies the fetch edge of the reference's
pipeline (S5 image fetch, /root/reference/engine/core/
ocr_llm_calling_modules.py:20-38 requests.get) — re-expressed as bulk
archive ingestion per the north rule instead of per-row network calls.
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession

# bound on ONE decompressed record/member — a crawl record is capped far
# below this in practice (CC truncates at 1 MiB); same bomb policy as the
# codec modules
_MAX_MEMBER_BYTES = 1 << 26

_GZIP_MAGIC = b"\x1f\x8b"


def _gzip_members(blob: bytes) -> Iterator[bytes]:
    """Decompress a concatenation of gzip members one at a time."""
    pos = 0
    n = len(blob)
    while pos < n:
        d = zlib.decompressobj(wbits=31)
        try:
            out = d.decompress(blob[pos:], _MAX_MEMBER_BYTES + 1)
        except zlib.error as e:
            raise ValueError(f"corrupt gzip member at byte {pos}: {e}") from e
        if len(out) > _MAX_MEMBER_BYTES:
            raise ValueError(
                f"gzip member exceeds the {_MAX_MEMBER_BYTES}-byte bound"
            )
        if not d.eof:
            raise ValueError(f"truncated gzip member at byte {pos}")
        yield out
        consumed = len(blob) - pos - len(d.unused_data)
        if consumed <= 0:  # defensive: avoid an infinite loop on weirdness
            raise ValueError("gzip member consumed zero bytes")
        pos += consumed


def _dechunk(body: bytes) -> bytes:
    """Reverse HTTP/1.1 chunked transfer encoding (Common Crawl stores
    the wire bytes verbatim). Tolerant: a malformed chunk header returns
    the remaining bytes as-is rather than dropping the document."""
    out = bytearray()
    pos = 0
    n = len(body)
    while pos < n:
        nl = body.find(b"\r\n", pos)
        if nl < 0:
            out += body[pos:]
            break
        size_tok = body[pos:nl].split(b";")[0].strip()
        try:
            size = int(size_tok, 16)
        except ValueError:
            out += body[pos:]
            break
        if size == 0:
            break
        out += body[nl + 2 : nl + 2 + size]
        pos = nl + 2 + size + 2  # skip chunk + trailing CRLF
    return bytes(out)


def _parse_record(raw: bytes) -> tuple[dict[str, str], bytes] | None:
    """One WARC record's bytes -> (warc headers, payload) or None."""
    if not raw.startswith(b"WARC/"):
        return None
    head_end = raw.find(b"\r\n\r\n")
    if head_end < 0:
        return None
    headers: dict[str, str] = {}
    for line in raw[:head_end].split(b"\r\n")[1:]:
        k, _, v = line.partition(b":")
        if _:
            headers[k.strip().decode("latin-1").lower()] = (
                v.strip().decode("latin-1")
            )
    try:
        length = int(headers.get("content-length", ""))
    except ValueError:
        return None
    payload = raw[head_end + 4 : head_end + 4 + length]
    if len(payload) < length:
        return None  # truncated record
    return headers, payload


def iter_warc_records(blob: bytes):
    """WARC bytes (raw or multi-member gzip) -> (warc_type, target_uri,
    warc_date, http_status, content_type, body) tuples.

    For `response` records the payload's HTTP envelope is parsed: status
    lifted from the status line, Content-Type from the headers, chunked
    bodies de-chunked. Non-HTTP payloads pass through with status/ctype
    None."""
    blob = bytes(blob)
    if blob[:2] == _GZIP_MAGIC:
        members: Iterator[bytes] = _gzip_members(blob)
    else:
        # raw WARC: records separated by \r\n\r\n after each payload;
        # split on the record marker (payload bytes can contain it only
        # if a record lies about Content-Length, which _parse_record
        # rejects via the length check)
        members = iter(
            b"WARC/" + part
            for part in blob.split(b"\r\n\r\nWARC/")
            for part in [part.removeprefix(b"WARC/")]
        )
    for member in members:
        # NOTE: no rstrip — trailing CRLFs may be payload bytes counted by
        # Content-Length (e.g. a chunked body's terminating 0\r\n\r\n);
        # the record terminator is ignored by the length slice anyway
        parsed = _parse_record(member)
        if parsed is None:
            continue
        headers, payload = parsed
        wtype = headers.get("warc-type", "")
        uri = headers.get("warc-target-uri")
        date = headers.get("warc-date")
        status = None
        ctype = None
        body = payload
        if payload[:5] in (b"HTTP/",) and b"\r\n" in payload:
            he = payload.find(b"\r\n\r\n")
            if he >= 0:
                head = payload[:he].split(b"\r\n")
                parts = head[0].split()
                if len(parts) >= 2 and parts[1].isdigit():
                    status = int(parts[1])
                chunked = False
                for line in head[1:]:
                    k, _, v = line.partition(b":")
                    lk = k.strip().lower()
                    if lk == b"content-type":
                        ctype = v.strip().decode("latin-1")
                    elif lk == b"transfer-encoding" and b"chunked" in v.lower():
                        chunked = True
                body = payload[he + 4 :]
                if chunked:
                    body = _dechunk(body)
        yield (wtype, uri, date, status, ctype, body)


def _parse_warc_date(s: str | None):
    """WARC-Date (ISO 8601 Zulu) -> naive UTC datetime, or None."""
    if not s:
        return None
    try:
        return (
            datetime.fromisoformat(s.replace("Z", "+00:00"))
            .astimezone(timezone.utc)
            .replace(tzinfo=None)
        )
    except ValueError:
        return None


def warc_pages(files_df: DataFrame) -> DataFrame:
    """(path, content) binaryFile rows -> PAGES_SCHEMA rows for every
    200-status HTML `response` record. Arrow-batched; one narrow pass."""
    import pyarrow as pa

    def kernel(batches: "Iterator[pa.RecordBatch]") -> "Iterator[pa.RecordBatch]":
        for batch in batches:
            urls: list[str] = []
            ts: list = []
            htmls: list[bytes] = []
            for blob in batch.column(0).to_pylist():
                if blob is None:
                    continue
                for wtype, uri, date, status, ctype, body in iter_warc_records(
                    blob
                ):
                    if wtype != "response" or not uri or status != 200:
                        continue
                    if ctype is not None and "html" not in ctype.lower():
                        continue
                    urls.append(uri)
                    ts.append(_parse_warc_date(date))
                    htmls.append(body)
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(urls, pa.string()),
                    pa.array(ts, pa.timestamp("us")),
                    pa.array(htmls, pa.binary()),
                    pa.array([None] * len(urls), pa.string()),
                    pa.array([None] * len(urls), pa.string()),
                ],
                names=["url", "warc_ts", "html", "text", "lang"],
            )

    return files_df.select("content").mapInArrow(
        kernel,
        schema="url string, warc_ts timestamp, html binary, text string, lang string",
    )


def read_warc_pages(spark: SparkSession, path_glob: str) -> DataFrame:
    """binaryFile scan over .warc/.warc.gz files -> pages rows."""
    files = spark.read.format("binaryFile").load(path_glob)
    return warc_pages(files)
