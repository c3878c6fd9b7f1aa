"""Text-analysis operators for training-data curation: language ID, quality
scoring, tokenizer-style token counting, and content fingerprinting.

All four are pure per-row column expressions (whole-stage codegen, zero
Python, zero shuffle) — at 100 TB these run at scan speed and their cost is
the parquet read. Every operator has an exact DuckDB oracle.

The word-count/char-count heritage in the reference is the essay rubric
"Word Count 100+/120+" scored from extracted text
(/root/reference/engine/core/gen_ai_calling.py:189,
engine/gen_utils_files/testCase.txt:299); the rest generalizes it to the
standard web-corpus quality gates (Gopher/C4-style length, punctuation and
stopword heuristics).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

# --- stopword dimension (tiny, fixed; closure-captured, no join needed) -------

STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it", "that", "for"],
    "es": ["el", "la", "de", "y", "que", "en", "un", "una", "es", "por"],
    "de": ["der", "die", "das", "und", "zu", "den", "von", "ist", "mit", "ein"],
    "fr": ["le", "la", "de", "et", "les", "des", "un", "une", "est", "que"],
}
LANG_PREFERENCE = ["en", "es", "de", "fr"]  # deterministic tie-break order

# BPE-ish pre-tokenizer: letter runs | single digits | single punctuation.
# RE2-safe (no lookarounds) so Spark (Java regex) and DuckDB (RE2) agree.
BPE_TOKEN_RE = "[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]"

_CJK_SPARK = "[\\u3040-\\u30ff\\u4e00-\\u9fff\\uac00-\\ud7af]"
_CJK_DUCK = "[\\x{3040}-\\x{30ff}\\x{4e00}-\\x{9fff}\\x{ac00}-\\x{d7af}]"


def words(text_col: str = "text") -> Column:
    return F.split(F.col(text_col), " ")


def stopword_hits(lang: str, text_col: str = "text") -> Column:
    """# distinct stopwords of `lang` present (array_intersect, per-row)."""
    stops = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.array_intersect(F.array_distinct(words(text_col)), stops))


def duck_stopword_hits(lang: str, col: str = "text") -> str:
    lst = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
    return (
        f"len(list_intersect(list_distinct(string_split({col}, ' ')), [{lst}]))"
    )


def lang_id(text_col: str = "text") -> Column:
    """Heuristic language ID: CJK script detection first, then stopword-hit
    argmax across the dimension lists, 'und' when nothing hits."""
    hits = {lg: stopword_hits(lg, text_col) for lg in LANG_PREFERENCE}
    best = F.greatest(*hits.values())
    expr = F.lit("und")
    for lg in reversed(LANG_PREFERENCE):
        expr = F.when((hits[lg] == best) & (best > 0), F.lit(lg)).otherwise(expr)
    return F.when(
        F.col(text_col).rlike(_CJK_SPARK), F.lit("cjk")
    ).otherwise(expr)


def duck_lang_id(col: str = "text") -> str:
    hits = {lg: duck_stopword_hits(lg, col) for lg in LANG_PREFERENCE}
    best = "greatest(" + ", ".join(hits.values()) + ")"
    expr = "'und'"
    for lg in reversed(LANG_PREFERENCE):
        expr = (
            f"CASE WHEN {hits[lg]} = {best} AND {best} > 0 THEN '{lg}' ELSE {expr} END"
        )
    return (
        f"CASE WHEN regexp_matches({col}, '{_CJK_DUCK}') THEN 'cjk' ELSE {expr} END"
    )


def quality_score(text_col: str = "text") -> dict[str, Column]:
    """Gopher/C4-style quality features + a composite score, all native.

    - n_words, mean_word_len
    - punct_ratio: punctuation chars / chars
    - stopword_ratio: english stopword hits / distinct words
    - quality: 1.0 gated down by degenerate length / punct spam / no stopwords
    """
    t = F.col(text_col)
    n_chars = F.length(t)
    ws = words(text_col)
    n_words = F.size(ws)
    mean_wl = (n_chars - (n_words - 1)) / n_words  # chars net of separators
    n_punct = F.length(F.regexp_replace(t, "[^.,;:!?]", ""))
    # try_divide: an EMPTY document has n_chars = 0 and a plain `/` throws
    # DIVIDE_BY_ZERO under ANSI, killing the whole query for one empty row
    # (found by the struct-vs-columns consistency test); NULL punct_ratio
    # flows through quality's CASE (the n_words < 5 gate fires first)
    punct_ratio = F.try_divide(n_punct, n_chars)
    sw_ratio = stopword_hits("en", text_col) / F.size(F.array_distinct(ws))
    quality = (
        F.when((n_words < 5) | (n_words > 10000), F.lit(0.0))
        .when(mean_wl < 2, F.lit(0.1))
        .when(punct_ratio > 0.2, F.lit(0.2))
        .otherwise(
            F.least(F.lit(1.0), F.lit(0.5) + sw_ratio + F.lit(0.25) * (punct_ratio > 0).cast("double"))
        )
    )
    return {
        "n_words": n_words,
        "mean_word_len": F.round(mean_wl, 4),
        "punct_ratio": F.round(punct_ratio, 4),
        "stopword_ratio": F.round(sw_ratio, 4),
        "quality": F.round(quality, 4),
    }


def duck_quality_exprs(col: str = "text") -> dict[str, str]:
    n_chars = f"length({col})"
    n_words = f"len(string_split({col}, ' '))"
    mean_wl = f"(({n_chars} - ({n_words} - 1)) / {n_words})"
    n_punct = f"length(regexp_replace({col}, '[^.,;:!?]', '', 'g'))"
    punct_ratio = f"({n_punct} / {n_chars})"
    sw = duck_stopword_hits("en", col)
    sw_ratio = f"({sw} / len(list_distinct(string_split({col}, ' '))))"
    quality = (
        f"CASE WHEN {n_words} < 5 OR {n_words} > 10000 THEN 0.0"
        f" WHEN {mean_wl} < 2 THEN 0.1"
        f" WHEN {punct_ratio} > 0.2 THEN 0.2"
        f" ELSE least(1.0, 0.5 + {sw_ratio} + 0.25 * (CASE WHEN {punct_ratio} > 0 THEN 1 ELSE 0 END)) END"
    )
    return {
        "n_words": n_words,
        "mean_word_len": f"round({mean_wl}, 4)",
        "punct_ratio": f"round({punct_ratio}, 4)",
        "stopword_ratio": f"round({sw_ratio}, 4)",
        "quality": f"round({quality}, 4)",
    }


# --- repetition filters (Gopher) ------------------------------------------------
# "fraction of text in the most common n-gram" gates: a spammy page repeats
# one word/phrase. Computed as the LONGEST EQUAL RUN of the sorted n-gram
# array over its length — a single per-row fold (grouping equal values is
# all the sort must do, so Spark/DuckDB collation differences can't matter).

_BIGRAMS_DUCK = (
    "list_transform(range(0, len(string_split({t}, ' ')) - 1),"
    " i -> array_to_string(list_slice(string_split({t}, ' '), i + 1, i + 2), ' '))"
)


# n-gram HASH arrays (not strings): runs are counted over sorted xxhash64
# longs — long sort + long compare beats string construction + string sort
# ~4x at identical values (a collision within one document's ~1e3 n-grams
# has odds ~1e-13, would only nudge a quality FILTER ratio, and the DuckDB
# oracle counts exact strings so the driver value-check would catch it).
# Bigrams hash the word-hash PAIR directly — no bigram string is ever built.
# Both use the array(...)/lambda-variable hoist so split/hash run once per
# row (see dedup._SHINGLES_SPARK).
_WORD_HASHES = "transform(split({t}, ' '), w -> xxhash64(w))"
# single template over an arbitrary word-hash-array expression — used with
# _WORD_HASHES here and a rebound `ws` inside quality_row, so the bigram
# formula can never drift between the two forms
_PAIR_HASHES_TMPL = (
    "flatten(transform(array({wh}), wh ->"
    " CASE WHEN size(wh) < 2 THEN cast(array() as array<bigint>)"
    " ELSE transform(sequence(1, size(wh) - 1),"
    " i -> xxhash64(element_at(wh, i), element_at(wh, i + 1))) END))"
)
_PAIR_HASHES = _PAIR_HASHES_TMPL.format(wh=_WORD_HASHES)


def _top_run_ratio_spark(harr: str) -> str:
    """max equal-run length of sorted hash array `harr` / its size, 0.0 when
    empty; `harr` is bound to a lambda variable so it is computed ONCE (it
    is referenced three times below)."""
    fold = (
        "aggregate(transform(array_sort(hs),"
        " h -> struct(h AS prev, 1L AS run, 1L AS best)),"
        " struct(0L AS prev, 0L AS run, 0L AS best),"
        " (acc, x) -> struct(x.prev AS prev,"
        " IF(x.prev = acc.prev AND acc.run > 0, acc.run + 1, 1L) AS run,"
        " greatest(acc.best,"
        " IF(x.prev = acc.prev AND acc.run > 0, acc.run + 1, 1L)) AS best))"
    )
    return (
        f"element_at(transform(array({harr}), hs ->"
        f" CASE WHEN size(hs) = 0 THEN 0.0D"
        f" ELSE ({fold}).best / size(hs) END), 1)"
    )


def _top_run_ratio_duck(arr: str) -> str:
    # an INDEPENDENT derivation (correlated unnest -> GROUP BY -> max count)
    # rather than a port of the Spark fold: a DuckDB struct-literal lambda
    # resolves `acc.run` inside the 'best' field to the just-computed 'run'
    # field (name shadowing), so the fold form silently overcounts there
    return (
        f"CASE WHEN len({arr}) = 0 THEN 0.0"
        f" ELSE (SELECT max(c) FROM (SELECT count(*) AS c"
        f" FROM unnest({arr}) AS u(g) GROUP BY g)) / len({arr}) END"
    )


def top_word_ratio(text_col: str = "text") -> Column:
    """Gopher repetition gate input: most-common word count / word count."""
    return F.round(
        F.expr(_top_run_ratio_spark(_WORD_HASHES.format(t=text_col))), 4
    )


def top_bigram_ratio(text_col: str = "text") -> Column:
    """Gopher repetition gate input: most-common 2-gram count / 2-gram count."""
    return F.round(
        F.expr(_top_run_ratio_spark(_PAIR_HASHES.format(t=text_col))), 4
    )


def duck_top_word_ratio(col: str = "text") -> str:
    return f"round({_top_run_ratio_duck(f'string_split({col}, chr(32))')}, 4)"


def duck_top_bigram_ratio(col: str = "text") -> str:
    return f"round({_top_run_ratio_duck(_BIGRAMS_DUCK.format(t=col))}, 4)"


# --- duplicate-segment fractions (the rest of the Gopher A1.1 gate set) ------
# "fraction of lines/paragraphs that are duplicates" and the char-weighted
# variants: a scraped page repeats nav/footer lines and boilerplate
# paragraphs. All four are single-row native expressions (zero shuffle,
# scan speed); segments are trimmed and blank-filtered first (blank lines
# are STRUCTURE, not content — same rule as curation.line_dedup_on). The
# O(segments²) array_position probe is bounded by document size, the same
# accepted cost shape as line_dedup_on.

_NONBLANK_LINES = "filter(transform(split({t}, '\\n'), x -> trim(x)), x -> x != '')"
# '\n{2,}': a literal newline atom with a regex quantifier — blank-line
# separated paragraph blocks, the Dolma/Gopher convention
_PARAGRAPH_BLOCKS = (
    "filter(transform(split({t}, '\\n{{2,}}'), x -> trim(x)), x -> x != '')"
)
_LINES_DUCK = (
    "list_filter(list_transform(string_split({t}, chr(10)), x -> trim(x)),"
    " x -> x != '')"
)
_PARAS_DUCK = (
    "list_filter(list_transform(string_split_regex({t}, '\\n{{2,}}'),"
    " x -> trim(x)), x -> x != '')"
)


def _dup_frac_spark(segs: str) -> str:
    """Fraction of segments that repeat an earlier one: a segment is a
    duplicate iff its 1-based first occurrence (array_position) is not its
    own index. `segs` is bound to a lambda variable so the split/trim/
    filter chain runs once per row."""
    flags = "transform(ss, (x, i) -> IF(array_position(ss, x) <> i + 1, 1L, 0L))"
    return (
        f"element_at(transform(array({segs}), ss ->"
        f" CASE WHEN size(ss) = 0 THEN 0.0D"
        f" ELSE aggregate({flags}, 0L, (a, b) -> a + b) / size(ss) END), 1)"
    )


def _dup_char_frac_spark(segs: str) -> str:
    """Characters inside duplicate segments / characters in all segments."""
    dup = (
        "aggregate(transform(ss, (x, i) ->"
        " IF(array_position(ss, x) <> i + 1, length(x), 0)), 0, (a, b) -> a + b)"
    )
    tot = "aggregate(transform(ss, x -> length(x)), 0, (a, b) -> a + b)"
    return (
        f"element_at(transform(array({segs}), ss ->"
        f" CASE WHEN size(ss) = 0 THEN 0.0D"
        f" ELSE {dup} / {tot} END), 1)"
    )


def _dup_frac_duck(segs: str) -> str:
    # independent derivation: duplicates = n - count(DISTINCT) — equal to
    # the Spark first-occurrence-flag sum by definition
    return (
        f"CASE WHEN len({segs}) = 0 THEN 0.0"
        f" ELSE (len({segs}) - (SELECT count(DISTINCT g)"
        f" FROM unnest({segs}) AS u(g)))::double / len({segs}) END"
    )


def _dup_char_frac_duck(segs: str) -> str:
    # duplicate char mass = total chars - chars of one instance per value
    tot = f"(SELECT sum(length(g)) FROM unnest({segs}) AS u(g))"
    firsts = (
        f"(SELECT sum(length(g)) FROM"
        f" (SELECT DISTINCT g FROM unnest({segs}) AS u(g)) AS t)"
    )
    return (
        f"CASE WHEN len({segs}) = 0 THEN 0.0"
        f" ELSE ({tot} - {firsts})::double / {tot} END"
    )


def dup_line_fraction(text_col: str = "text") -> Column:
    """Gopher gate: fraction of non-blank lines repeating an earlier line."""
    return F.round(F.expr(_dup_frac_spark(_NONBLANK_LINES.format(t=text_col))), 4)


def dup_line_char_fraction(text_col: str = "text") -> Column:
    """Gopher gate: characters in repeated lines / characters in all lines."""
    return F.round(
        F.expr(_dup_char_frac_spark(_NONBLANK_LINES.format(t=text_col))), 4
    )


def dup_paragraph_fraction(text_col: str = "text") -> Column:
    """Gopher gate: fraction of blank-line-separated paragraph blocks
    repeating an earlier block."""
    return F.round(
        F.expr(_dup_frac_spark(_PARAGRAPH_BLOCKS.format(t=text_col))), 4
    )


def dup_paragraph_char_fraction(text_col: str = "text") -> Column:
    """Gopher gate: characters in repeated paragraph blocks / characters in
    all blocks."""
    return F.round(
        F.expr(_dup_char_frac_spark(_PARAGRAPH_BLOCKS.format(t=text_col))), 4
    )


def duck_dup_line_fraction(col: str = "text") -> str:
    return f"round({_dup_frac_duck(_LINES_DUCK.format(t=col))}, 4)"


def duck_dup_line_char_fraction(col: str = "text") -> str:
    return f"round({_dup_char_frac_duck(_LINES_DUCK.format(t=col))}, 4)"


def duck_dup_paragraph_fraction(col: str = "text") -> str:
    return f"round({_dup_frac_duck(_PARAS_DUCK.format(t=col))}, 4)"


def duck_dup_paragraph_char_fraction(col: str = "text") -> str:
    return f"round({_dup_char_frac_duck(_PARAS_DUCK.format(t=col))}, 4)"


def quality_row(text_col: str = "text") -> Column:
    """ALL doc-quality outputs (lang_pred, n_words, mean_word_len,
    punct_ratio, stopword_ratio, top_word_ratio, top_bigram_ratio, quality)
    as ONE struct column, for use under a single ``F.inline(F.array(...))``
    generator.

    Why not the column-per-feature form (`lang_id` + `quality_score`, kept
    for composability/tests): inside one Project, every stopword-hit and the
    greatest() argmax chain re-derive split()/array_distinct() — the naive
    doc_quality plan evaluated split() 49x PER ROW (measured). Here the word
    array, distinct-word array, per-language hits, punct ratio and argmax
    are each bound once via the array()/lambda hoist, and inline() emits the
    struct fields as columns through a Generate node, which CollapseProject
    cannot merge into (a plain struct-unpack Project would re-inline the
    whole expression once per field). Values are identical to the
    column-per-feature form — same DuckDB oracle."""
    t = text_col
    hits_fields = ", ".join(
        f"'{lg}', size(array_intersect(dw, array({', '.join(repr(w) for w in STOPWORDS[lg])})))"
        for lg in LANG_PREFERENCE
    )
    chain = "'und'"
    for lg in reversed(LANG_PREFERENCE):
        chain = f"CASE WHEN h.{lg} = best AND best > 0 THEN '{lg}' ELSE {chain} END"
    cjk_sql = _CJK_SPARK.replace("\\", "\\\\")
    best = "greatest(" + ", ".join(f"h.{lg}" for lg in LANG_PREFERENCE) + ")"
    mean_wl = f"(length({t}) - (size(ws) - 1)) / size(ws)"
    # word/bigram hash arrays rebound to the already-split `ws` (shared
    # template — the bigram formula cannot drift from _PAIR_HASHES)
    wh_ws = "transform(ws, w -> xxhash64(w))"
    pair_ws = _PAIR_HASHES_TMPL.format(wh=wh_ws)
    quality = (
        f"CASE WHEN size(ws) < 5 OR size(ws) > 10000 THEN 0.0D"
        f" WHEN {mean_wl} < 2 THEN 0.1D"
        f" WHEN h.pr > 0.2D THEN 0.2D"
        f" ELSE least(1.0D, 0.5D + h.en / size(dw)"
        f" + 0.25D * cast(h.pr > 0 as double)) END"
    )
    return F.expr(
        f"element_at(transform(array(split({t}, ' ')), ws ->"
        f" element_at(transform(array(array_distinct(ws)), dw ->"
        f" element_at(transform(array(named_struct({hits_fields},"
        f" 'pr', try_divide(length(regexp_replace({t}, '[^.,;:!?]', '')),"
        f" length({t})))), h ->"
        f" element_at(transform(array({best}), best ->"
        f" named_struct("
        f" 'lang_pred', CASE WHEN {t} rlike '{cjk_sql}' THEN 'cjk' ELSE {chain} END,"
        f" 'n_words', size(ws),"
        f" 'mean_word_len', round({mean_wl}, 4),"
        f" 'punct_ratio', round(h.pr, 4),"
        f" 'stopword_ratio', round(h.en / size(dw), 4),"
        f" 'top_word_ratio', round({_top_run_ratio_spark(wh_ws)}, 4),"
        f" 'top_bigram_ratio', round({_top_run_ratio_spark(pair_ws)}, 4),"
        f" 'quality', round({quality}, 4))), 1)), 1)), 1)), 1)"
    )


def bpe_token_count(text_col: str = "text") -> Column:
    """Tokenizer-style token count: length of the BPE-ish pre-token split."""
    return F.size(F.regexp_extract_all(F.col(text_col), F.lit(BPE_TOKEN_RE), 0))


def duck_bpe_token_count(col: str = "text") -> str:
    return f"len(regexp_extract_all({col}, '{BPE_TOKEN_RE}'))"


# --- fingerprinting -------------------------------------------------------------

_KR_BASE = 1000003
_KR_MOD = (1 << 31) - 1
# word -> 60-bit md5 int (same formula as dedup.simhash): reduced mod 2^31-1
_WORD_H_SPARK = "pmod(cast(conv(substring(md5(w), 1, 15), 16, 10) as bigint), 2147483647)"
_WORD_H_DUCK = "((('0x' || substr(md5(w), 1, 15))::bigint) % 2147483647)"


def rolling_fingerprint(text_col: str = "text") -> Column:
    """Karp-Rabin rolling hash over the word sequence (order-sensitive, unlike
    the shingle-min fingerprint): fold acc = (acc*B + h(w)) mod 2^31-1."""
    return F.expr(
        f"aggregate(split({text_col}, ' '), 0L,"
        f" (acc, w) -> pmod(acc * {_KR_BASE} + {_WORD_H_SPARK}, {_KR_MOD}))"
    )


def duck_rolling_fingerprint(col: str = "text") -> str:
    # list_reduce seeds with the first element; Spark's 0-init fold yields
    # (0*B + h0) % M = h0 for the first word, so the two folds agree.
    return (
        f"list_reduce(list_transform(string_split({col}, ' '), w -> {_WORD_H_DUCK}),"
        f" (acc, h) -> (acc * {_KR_BASE} + h) % {_KR_MOD})"
    )


# --- CCNet-style LM scoring + perplexity buckets ---------------------------------
# CCNet (Wenzek et al., arXiv:1911.00359) ranks web documents by the
# perplexity of a language model trained on a trusted reference corpus and
# splits the CDF into head/middle/tail thirds — the selection signal most
# public pretraining recipes (CCNet, LLaMA, RedPajama) apply after dedup.
# The reference uses a KenLM 5-gram model; the engine-native re-expression
# here is an add-alpha-smoothed word BIGRAM model, trained and applied
# entirely with DataFrame ops so both training and scoring stay JVM-side:
#
#   logP(w2|w1) = ln( (c(w1,w2) + a) / (c(w1) + a*V) )
#   doc score   = mean bigram logprob   (monotone inverse of perplexity)
#
# 100 TB shape: training is two map-side-combined groupBys over the
# REFERENCE slice (small by construction — CCNet trains on Wikipedia, not
# the crawl); scoring joins each doc bigram to the count tables — broadcast
# joins when the pruned LM fits (prune to top-K bigrams and rely on the
# smoothing floor for the tail, as KenLM pruning does), shuffle hash joins
# otherwise; the per-doc reduce is one map-side-combinable avg. Bucket
# cutoffs are ONE 2-value aggregate broadcast back — never a global sort
# (an ntile window over the corpus would single-partition it).
#
# Scores are rounded to 6dp BEFORE the cutoff percentile so the
# head/middle/tail assignment compares identically-rounded doubles in both
# engines (raw fp sums differ in the last ulp across engines; rounding
# first makes every downstream comparison engine-stable).

_BIGRAMS_EXPR = (
    "transform(slice(w, 2, size(w)-1), (x, i) -> struct(w[i] AS w1, x AS w2))"
)


def bigram_lm_score(
    df: DataFrame,
    ref_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 1.0,
    top_k_bigrams: int | None = None,
) -> DataFrame:
    """(id, n_bigrams, lm_logprob): mean add-alpha bigram logprob of every
    doc in `df` (with >= 2 words) under the model counted from `ref_df`.

    `top_k_bigrams` is the KenLM-style pruning knob for 100 TB runs: keep
    only the K highest-count bigrams (ties broken deterministically by
    (count desc, w1, w2) — a TakeOrdered, no global sort) and let every
    pruned bigram fall to the smoothing floor alpha/(c1 + alpha*V), i.e.
    it scores exactly like an unseen bigram. The pruned table is then
    small by construction, so its join gets an explicit broadcast hint —
    the corpus-side bigram stream never shuffles for it. Unigrams are NOT
    pruned (KenLM keeps order-1 complete too: pruning w1 would change the
    denominator for every bigram sharing it); the unigram table is
    reference-vocab-sized and Catalyst/AQE broadcasts it whenever it
    fits."""
    w = words(text_col)
    refw = ref_df.select(w.alias("w"))
    uni = (
        refw.select(F.explode("w").alias("w1"))
        .groupBy("w1")
        .agg(F.count(F.lit(1)).alias("c1"))
    )
    bi = (
        refw.select(F.explode(F.expr(_BIGRAMS_EXPR)).alias("b"))
        .select("b.w1", "b.w2")
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c2"))
    )
    if top_k_bigrams is not None:
        bi = F.broadcast(
            bi.orderBy(F.desc("c2"), "w1", "w2").limit(top_k_bigrams)
        )
    vocab = uni.agg(F.count(F.lit(1)).cast("double").alias("v"))
    docb = (
        df.select(F.col(id_col), w.alias("w"))
        .filter(F.size("w") >= 2)
        .select(id_col, F.explode(F.expr(_BIGRAMS_EXPR)).alias("b"))
        .select(id_col, "b.w1", "b.w2")
    )
    lp = F.log(
        (F.coalesce(F.col("c2"), F.lit(0)) + F.lit(alpha))
        / (F.coalesce(F.col("c1"), F.lit(0)) + F.lit(alpha) * F.col("v"))
    )
    return (
        docb.join(bi, ["w1", "w2"], "left")
        .join(uni, ["w1"], "left")
        .crossJoin(F.broadcast(vocab))
        .withColumn("lp", lp)
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(F.avg("lp"), 6).alias("lm_logprob"),
        )
    )


def perplexity_buckets(
    df: DataFrame,
    ref_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 1.0,
    top_k_bigrams: int | None = None,
) -> DataFrame:
    """CCNet head/middle/tail: tertile cutoffs of the (rounded) score
    distribution, attached via a 1-row broadcast crossJoin (never a
    global-sort window; allow-listed in the plan lint as a bounded
    broadcast side). head = highest mean logprob = lowest perplexity,
    exactly CCNet's orientation.

    Measured (round 4, sf0.1, local[32], min-of-3): 0.84 s to train the
    reference-slice LM AND score+bucket all 5k documents — train and
    apply are one lazy plan, amortized in a single pass."""
    scored = bigram_lm_score(df, ref_df, id_col, text_col, alpha, top_k_bigrams)
    cuts = scored.agg(
        F.round(
            F.expr("percentile(lm_logprob, cast(1 as double)/3)"), 6
        ).alias("c_lo"),
        F.round(
            F.expr("percentile(lm_logprob, cast(2 as double)/3)"), 6
        ).alias("c_hi"),
    )
    return (
        scored.crossJoin(F.broadcast(cuts))
        .select(
            id_col,
            "n_bigrams",
            "lm_logprob",
            F.when(F.col("lm_logprob") >= F.col("c_hi"), F.lit("head"))
            .when(F.col("lm_logprob") >= F.col("c_lo"), F.lit("middle"))
            .otherwise(F.lit("tail"))
            .alias("ppl_bucket"),
        )
    )


def perplexity_buckets_duck(
    corpus_sql: str, ref_sql: str, alpha: float = 1.0,
    top_k_bigrams: int | None = None,
) -> str:
    """DuckDB twin of perplexity_buckets: same counts, same smoothing
    formula, same round-before-percentile discipline (quantile_cont's
    linear interpolation at p*(n-1) matches Spark's `percentile`).
    `top_k_bigrams` mirrors the Spark-side KenLM-style pruning: identical
    deterministic selection (count desc, w1, w2), identical smoothing
    floor for pruned mass."""
    prune = (
        f" ORDER BY c2 DESC, w1, w2 LIMIT {top_k_bigrams}"
        if top_k_bigrams is not None
        else ""
    )
    return f"""
    WITH corpus AS ({corpus_sql}),
    refd AS ({ref_sql}),
    refw AS (SELECT string_split(text, ' ') AS w FROM refd),
    uni AS (SELECT w1, count(*) AS c1
            FROM (SELECT unnest(w) AS w1 FROM refw) GROUP BY 1),
    bi AS (SELECT w[i] AS w1, w[i + 1] AS w2, count(*) AS c2
           FROM refw, unnest(generate_series(1, len(w) - 1)) AS t(i)
           GROUP BY 1, 2{prune}),
    v AS (SELECT count(*)::double AS v FROM uni),
    docw AS (SELECT doc_id, string_split(text, ' ') AS w FROM corpus),
    docb AS (SELECT doc_id, w[i] AS w1, w[i + 1] AS w2
             FROM docw, unnest(generate_series(1, len(w) - 1)) AS t(i)
             WHERE len(w) >= 2),
    scored AS (
      SELECT doc_id, count(*) AS n_bigrams,
             round(avg(ln((coalesce(c2, 0) + {alpha})
                          / (coalesce(c1, 0) + {alpha} * v.v))), 6) AS lm_logprob
      FROM docb LEFT JOIN bi USING (w1, w2) LEFT JOIN uni USING (w1)
      CROSS JOIN v
      GROUP BY doc_id),
    cuts AS (SELECT round(quantile_cont(lm_logprob, 1.0/3), 6) AS c_lo,
                    round(quantile_cont(lm_logprob, 2.0/3), 6) AS c_hi
             FROM scored)
    SELECT doc_id, n_bigrams, lm_logprob,
           CASE WHEN lm_logprob >= c_hi THEN 'head'
                WHEN lm_logprob >= c_lo THEN 'middle'
                ELSE 'tail' END AS ppl_bucket
    FROM scored CROSS JOIN cuts
    """
