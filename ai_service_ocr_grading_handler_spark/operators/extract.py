"""The extraction operator: Arrow-batched main-content extraction.

This occupies the operator position of the reference's OCR kernel family
(K1/K2 `claude_vision_calling`/`openai_ocr`,
/root/reference/engine/core/ocr_llm_calling_modules.py:20-79) and the
two-stage extract->grade chain (K10, gen_ai_calling.py:292-326) — but as a
deterministic, local, vectorized kernel per the north rule: html bytes in,
(text, spans, block stats) out, via ``mapInPandas`` so the only JVM<->Python
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
- MapInPandas is a PUSHDOWN BARRIER: predicates written after the kernel
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
    """
    import pandas as pd

    cols = ["url", "warc_ts", "lang", "html"]

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            texts: list[str] = []
            spans: list[list[dict]] = []
            n_blocks: list[int] = []
            n_content: list[int] = []
            n_chars: list[int] = []
            us: list[int] = []
            for html in pdf["html"]:
                s0 = perf_counter()
                r = extract_doc(html)
                texts.append(r.text)
                spans.append(
                    [
                        {"start": a, "end": b, "block_id": g}
                        for (a, b, g) in r.spans
                    ]
                )
                n_blocks.append(len(r.blocks))
                n_content.append(len(r.spans))
                n_chars.append(len(r.text))
                us.append(int((perf_counter() - s0) * 1e6))
            yield pd.DataFrame(
                {
                    "url": pdf["url"],
                    "warc_ts": pdf["warc_ts"],
                    "lang": pdf["lang"],
                    "text": texts,
                    "spans": spans,
                    "n_blocks": n_blocks,
                    "n_content_blocks": n_content,
                    "content_chars": n_chars,
                    "extract_us": us,
                }
            )

    return pages.select(*cols).mapInPandas(kernel, schema=EXTRACTED_SCHEMA_DDL)


def extract_blocks(pages: DataFrame) -> DataFrame:
    """Exploded per-block classification detail (FIXTURES.md §4 `blocks`)."""
    import pandas as pd

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: list[dict] = []
            for url, html in zip(pdf["url"], pdf["html"]):
                r = extract_doc(html)
                for b in r.blocks:
                    out.append(
                        {
                            "url": url,
                            "block_id": b.block_id,
                            "kind": b.kind,
                            "text": b.text,
                            "n_words": b.n_words,
                            "text_density": b.text_density,
                            "link_density": b.link_density,
                            "is_content": b.is_content,
                            "confidence": b.confidence,
                            "src_start": b.src_start,
                            "src_end": b.src_end,
                        }
                    )
            yield pd.DataFrame(
                out,
                columns=[
                    "url",
                    "block_id",
                    "kind",
                    "text",
                    "n_words",
                    "text_density",
                    "link_density",
                    "is_content",
                    "confidence",
                    "src_start",
                    "src_end",
                ],
            )

    return pages.select("url", "html").mapInPandas(kernel, schema=BLOCKS_SCHEMA_DDL)
