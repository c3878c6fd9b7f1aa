"""Distributed BPE tokenizer training + encoding — the tokenizer leg of a
training-data pipeline (Sennrich et al. arXiv:1508.07909, the GPT-2/LLaMA
vocabulary recipe), built the way it actually scales:

- **One corpus pass, total.** `word_freq` reduces the corpus to a
  (word, freq) table — a map-side-combined groupBy. At 100 TB this is the
  ONLY stage that touches the text; its output cardinality is the corpus
  VOCABULARY (millions of rows, not trillions), which is what every real
  BPE trainer (subword-nmt, HF tokenizers) iterates over.
- **The merge loop never rescans the corpus.** Each round counts adjacent
  symbol pairs over the word table (freq-weighted), picks the global
  argmax with a deterministic (count desc, pair asc) tie-break, and
  rewrites the segmentation with a native fold — a handful of tiny
  shuffles per round over the bounded vocab frame. The per-round
  `limit(1).collect()` is the control-plane decision of an iterative
  algorithm (same exemption as connected_components' fixpoint probe).
- **Plans stay bounded** with the connected_components checkpoint
  discipline: durable `checkpoint()` when a checkpoint dir is configured,
  `localCheckpoint()` otherwise, every few rounds.

Training is deterministic (ties broken lexicographically), so a re-run or
a differently-partitioned run learns the identical merge sequence —
pinned in tests against an independent pure-Python Sennrich trainer.

Encoding (`bpe_encode`) applies the learned merges per word in rank
order, leftmost-first — which provably reproduces the training
segmentation on training words (the standard greedy-rank property;
property-tested). It is an Arrow-batched kernel with a per-batch word
cache: web text repeats words heavily, so the amortized cost is one
encode per DISTINCT word per batch.
"""

from __future__ import annotations

from collections.abc import Iterator

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

END = "</w>"  # Sennrich end-of-word marker (separate final symbol)


def word_freq(
    docs: DataFrame, text_col: str = "text", min_freq: int = 1
) -> DataFrame:
    """(word, freq) over whitespace-tokenized text — the single corpus
    pass. `min_freq` drops the long hapax tail (subword-nmt's
    --min-frequency), bounding the vocab frame the merge loop iterates."""
    ws = F.filter(F.split(F.col(text_col), "\\s+"), lambda x: x != "")
    out = (
        docs.select(F.explode(ws).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    if min_freq > 1:
        out = out.where(F.col("freq") >= min_freq)
    return out


def _initial_segmentation(wordfreq: DataFrame) -> DataFrame:
    """(word, freq, symbols): characters plus the END marker."""
    chars = F.expr("transform(sequence(1, length(word)), i -> substring(word, i, 1))")
    return wordfreq.select(
        "word", "freq", F.concat(chars, F.array(F.lit(END))).alias("symbols")
    )


def _merge_expr(a: str, b: str) -> str:
    """SQL fold rewriting one adjacent (a, b) -> a||b pass over `symbols`,
    leftmost-first and non-overlapping: the accumulator's LAST element is
    only merge-eligible if it was not itself just produced by this pass —
    which the fold guarantees, because a produced element equals a||b and
    a||b != a whenever b is non-empty."""

    def lit(s: str) -> str:
        # Spark's SQL parser treats backslash as an escape inside string
        # literals (unlike standard SQL), so it must be doubled BEFORE
        # quote-doubling — web text words genuinely contain backslashes
        return "'" + s.replace("\\", "\\\\").replace("'", "''") + "'"

    return (
        "aggregate(symbols, cast(array() as array<string>), (acc, x) ->"
        f" CASE WHEN size(acc) > 0 AND element_at(acc, -1) = {lit(a)}"
        f" AND x = {lit(b)}"
        f" THEN concat(slice(acc, 1, size(acc) - 1), array({lit(a + b)}))"
        " ELSE concat(acc, array(x)) END)"
    )


def train_bpe(
    wordfreq: DataFrame,
    n_merges: int,
    checkpoint_every: int = 8,
) -> list[tuple[str, str]]:
    """Learn up to `n_merges` BPE merges from a (word, freq) table.
    Returns the ordered merge list; stops early when no pair occurs
    twice (merging a count-1 pair is never useful)."""
    from ai_service_ocr_grading_handler_spark.operators.dedup import (
        _bounded_checkpoint,
    )

    seg = _bounded_checkpoint(_initial_segmentation(wordfreq))
    merges: list[tuple[str, str]] = []
    pair = F.expr(
        "zip_with(slice(symbols, 1, size(symbols) - 1),"
        " slice(symbols, 2, size(symbols) - 1),"
        " (a, b) -> struct(a AS a, b AS b))"
    )
    for r in range(n_merges):
        top = (
            seg.where(F.size("symbols") >= 2)
            .select("freq", F.explode(pair).alias("p"))
            .groupBy("p")
            .agg(F.sum("freq").alias("cnt"))
            .orderBy(F.desc("cnt"), F.col("p.a"), F.col("p.b"))
            .limit(1)
            .collect()  # control-plane argmax of the iterative loop
        )
        if not top or top[0]["cnt"] < 2:
            break
        a, b = top[0]["p"]["a"], top[0]["p"]["b"]
        merges.append((a, b))
        seg = seg.select("word", "freq", F.expr(_merge_expr(a, b)).alias("symbols"))
        if (r + 1) % checkpoint_every == 0:
            seg = _bounded_checkpoint(seg)
    return merges


def segment_words(wordfreq: DataFrame, merges: list[tuple[str, str]]) -> DataFrame:
    """(word, freq, symbols) after applying `merges` in rank order — the
    trained segmentation, used by tests to pin encode == train."""
    seg = _initial_segmentation(wordfreq)
    for a, b in merges:
        seg = seg.select("word", "freq", F.expr(_merge_expr(a, b)).alias("symbols"))
    return seg


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Greedy rank-order BPE encode of one word (chars + END), merging the
    lowest-rank adjacent pair leftmost-first until none applies — the
    GPT-2 encoder loop."""
    syms = list(word) + [END]
    while len(syms) >= 2:
        best = None
        a = b = None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best is None or r < best):
                best, a, b = r, syms[i], syms[i + 1]
        if best is None:
            break
        out: list[str] = []
        i = 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "n_bpe_tokens",
) -> DataFrame:
    """Append the true BPE token count under the learned `merges` (the
    exact budget number `textquality.bpe_token_count` approximates with
    its regex heuristic). Arrow-batched kernel; per-batch cache keyed by
    distinct word, so repeated web vocabulary encodes once per batch."""
    import re

    from pyspark.sql.types import LongType, StructField, StructType

    ranks = {p: i for i, p in enumerate(merges)}
    # Same word boundaries as word_freq's Java-regex split("\\s+"): Java \s
    # is ASCII-only ([ \t\n\x0B\f\r]) by default, and Python re.ASCII \s is
    # the identical set. Plain str.split() would ALSO break on Unicode
    # whitespace (NBSP, U+3000, ...) and diverge from the trained vocabulary.
    ws_re = re.compile(r"\s+", re.ASCII)
    names = df.schema.names
    # a COPY: StructType.add mutates in place, and df.schema hands back the
    # DataFrame's own cached object — mutating it corrupts df.columns
    schema = StructType(list(df.schema.fields) + [StructField(out_col, LongType())])

    def kernel(batches: Iterator) -> Iterator:
        cache: dict[str, int] = {}

        def count(text: str | None) -> int:
            if not text:
                return 0
            n = 0
            for w in ws_re.split(text):
                if not w:
                    continue
                hit = cache.get(w)
                if hit is None:
                    hit = len(_encode_word(w, ranks))
                    cache[w] = hit
                n += hit
            return n

        for pdf in batches:
            pdf[out_col] = [count(t) for t in pdf[text_col]]
            yield pdf[names + [out_col]]

    return df.mapInPandas(kernel, schema)
