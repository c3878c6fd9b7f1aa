"""The extraction operator: Arrow-batched main-content extraction.

This occupies the operator position of the reference's OCR kernel family
(K1/K2 `claude_vision_calling`/`openai_ocr`,
/root/reference/engine/core/ocr_llm_calling_modules.py:20-79) and the
two-stage extract->grade chain (K10, gen_ai_calling.py:292-326) — but as a
deterministic, local, vectorized kernel per the north rule: html bytes in,
(text, spans, block stats) out, via ``mapInArrow`` so the only JVM<->Python
boundary is one Arrow channel.

Scale notes:
- The kernel is a narrow transformation — no shuffle. Input split sizing is
  controlled by ``spark.sql.files.maxPartitionBytes``; Arrow batch width by
  ``spark.sql.execution.arrow.maxRecordsPerBatch``.
- Only the columns actually consumed are selected before the kernel, so
  parquet column pruning keeps `html` out of downstream stages (it is by far
  the widest column at 100 TB).
- Output is a pure function of `html` per row: batch-boundary invariance is
  property-tested (tests/test_extract_spark.py).
- The Python kernel node (MapInArrow/MapInPandas) is a PUSHDOWN BARRIER:
  predicates written after the kernel
  run after it (verified with .explain — the filter lands above
  MapInPandas). Apply row filters (lang, warc_ts range, host) to `pages`
  BEFORE calling extract_pages so they reach the parquet scan as
  PushedFilters / partition pruning.
"""

from __future__ import annotations

from collections.abc import Iterator
from time import perf_counter

from pyspark.sql import DataFrame

from ai_service_ocr_grading_handler_spark.core.htmlx import extract_doc

EXTRACTED_SCHEMA_DDL = (
    "url string, warc_ts timestamp, lang string, text string, "
    "spans array<struct<start:bigint,end:bigint,block_id:int>>, "
    "n_blocks int, n_content_blocks int, content_chars bigint, extract_us bigint"
)

BLOCKS_SCHEMA_DDL = (
    "url string, block_id int, kind string, text string, n_words int, "
    "text_density double, link_density double, is_content boolean, "
    "confidence double, src_start bigint, src_end bigint"
)


def extract_pages(pages: DataFrame) -> DataFrame:
    """pages(url, warc_ts, html, lang, ...) -> extracted rows.

    Drops `html` on output (never carry 100 TB of raw bytes past the kernel).

    Arrow-native kernel (``mapInArrow``): the pass-through columns
    (url/warc_ts/lang) never round-trip through pandas at all, and the
    spans column is assembled as flat child arrays + offsets — measured
    ~25% faster end-to-end than the mapInPandas form, whose per-row
    span-dict lists dominated the non-kernel time."""
    import pyarrow as pa

    cols = ["url", "warc_ts", "lang", "html"]
    i64, i32 = pa.int64(), pa.int32()

    def kernel(batches: "Iterator[pa.RecordBatch]") -> "Iterator[pa.RecordBatch]":
        for batch in batches:
            htmls = batch.column(3).to_pylist()
            texts: list[str] = []
            starts: list[int] = []
            ends: list[int] = []
            bids: list[int] = []
            offsets: list[int] = [0]
            n_blocks: list[int] = []
            n_content: list[int] = []
            n_chars: list[int] = []
            us: list[int] = []
            for html in htmls:
                s0 = perf_counter()
                r = extract_doc(html)
                texts.append(r.text)
                for a, b, g in r.spans:
                    starts.append(a)
                    ends.append(b)
                    bids.append(g)
                offsets.append(len(starts))
                n_blocks.append(len(r.blocks))
                n_content.append(len(r.spans))
                n_chars.append(len(r.text))
                us.append(int((perf_counter() - s0) * 1e6))
            spans_arr = pa.ListArray.from_arrays(
                pa.array(offsets, i32),
                pa.StructArray.from_arrays(
                    [pa.array(starts, i64), pa.array(ends, i64), pa.array(bids, i32)],
                    ["start", "end", "block_id"],
                ),
            )
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column(0),  # url
                    batch.column(1),  # warc_ts
                    batch.column(2),  # lang
                    pa.array(texts, pa.string()),
                    spans_arr,
                    pa.array(n_blocks, i32),
                    pa.array(n_content, i32),
                    pa.array(n_chars, i64),
                    pa.array(us, i64),
                ],
                names=[
                    "url",
                    "warc_ts",
                    "lang",
                    "text",
                    "spans",
                    "n_blocks",
                    "n_content_blocks",
                    "content_chars",
                    "extract_us",
                ],
            )

    return pages.select(*cols).mapInArrow(kernel, schema=EXTRACTED_SCHEMA_DDL)


def extract_blocks(pages: DataFrame) -> DataFrame:
    """Exploded per-block classification detail (FIXTURES.md §4 `blocks`).

    Arrow-native like extract_pages: per-block fields accumulate as flat
    column lists (one pa.array each), never per-row dicts."""
    import pyarrow as pa

    names = [
        "url", "block_id", "kind", "text", "n_words", "text_density",
        "link_density", "is_content", "confidence", "src_start", "src_end",
    ]
    i64, i32, f64 = pa.int64(), pa.int32(), pa.float64()
    types = [
        pa.string(), i32, pa.string(), pa.string(), i32, f64,
        f64, pa.bool_(), f64, i64, i64,
    ]

    def kernel(batches: "Iterator[pa.RecordBatch]") -> "Iterator[pa.RecordBatch]":
        for batch in batches:
            urls = batch.column(0).to_pylist()
            htmls = batch.column(1).to_pylist()
            cols: list[list] = [[] for _ in names]
            for url, html in zip(urls, htmls):
                for b in extract_doc(html).blocks:
                    cols[0].append(url)
                    cols[1].append(b.block_id)
                    cols[2].append(b.kind)
                    cols[3].append(b.text)
                    cols[4].append(b.n_words)
                    cols[5].append(b.text_density)
                    cols[6].append(b.link_density)
                    cols[7].append(b.is_content)
                    cols[8].append(b.confidence)
                    cols[9].append(b.src_start)
                    cols[10].append(b.src_end)
            yield pa.RecordBatch.from_arrays(
                [pa.array(c, t) for c, t in zip(cols, types)], names=names
            )

    return pages.select("url", "html").mapInArrow(kernel, schema=BLOCKS_SCHEMA_DDL)
