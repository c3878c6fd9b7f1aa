"""End-to-end corpus curation: the composition layer over the tier
operators (quality gates, PII scrub, intra-doc line dedup, exact +
paragraph dedup, benchmark decontamination) plus the URL-level operators
the pages corpus needs (canonicalization, URL dedup).

This is the module a pipeline author actually calls: each stage is an
individually-oracled operator elsewhere (see COVERAGE.md tier table); here
they are chained in the order the public curation recipes (C4, Gopher,
CCNet, Dolma, RefinedWeb) apply them, with the plan shape annotated per
stage. Everything is deterministic, so a resumed run curates identically.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

from ai_service_ocr_grading_handler_spark.core.partitioning import widen_if_narrow
from ai_service_ocr_grading_handler_spark.operators import dedup as _dd

# --- URL canonicalization + dedup (RefinedWeb-style) ---------------------------
#
# Aggressive canonical form: lowercase scheme+host, strip fragment AND query,
# strip a trailing slash. This is the dedup key form (RefinedWeb dedupes by
# normalized URL before content dedup) — NOT a safe rewrite for fetching,
# since dropping the query can merge distinct resources; that is the point
# for dedup and documented here so nobody fetches with it.


def canonical_url(url_col: str = "url") -> Column:
    """Canonical URL dedup key — pure RE2-safe regexp chain, scan-speed."""
    u = F.col(url_col)
    u = F.regexp_replace(u, "[#?].*$", "")  # fragment + query
    u = F.regexp_replace(u, "/$", "")  # trailing slash
    # lowercase ONLY the scheme://host prefix; paths stay case-sensitive
    prefix = F.lower(F.regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.-]*://[^/]*", 0))
    rest = F.regexp_replace(u, "^[A-Za-z][A-Za-z0-9+.-]*://[^/]*", "")
    return F.when(prefix == "", u).otherwise(F.concat(prefix, rest))


def canonical_url_duck(col: str = "url") -> str:
    """DuckDB twin of canonical_url (same RE2 patterns)."""
    u = f"regexp_replace(regexp_replace({col}, '[#?].*$', ''), '/$', '')"
    prefix = f"lower(regexp_extract({u}, '^[A-Za-z][A-Za-z0-9+.-]*://[^/]*', 0))"
    rest = f"regexp_replace({u}, '^[A-Za-z][A-Za-z0-9+.-]*://[^/]*', '')"
    return f"CASE WHEN {prefix} = '' THEN {u} ELSE {prefix} || {rest} END"


def url_dedup(df: DataFrame, url_col: str = "url") -> DataFrame:
    """One row per canonical URL: min original URL is the deterministic
    canonical row (one shuffle on the canonical key — the same shape as
    exact_dedup, run FIRST in a crawl pipeline because it is the cheapest
    key: no text ever crosses the shuffle)."""
    return (
        df.groupBy(canonical_url(url_col).alias("canonical_url"))
        .agg(
            F.min(url_col).alias("keeper_url"),
            F.count(F.lit(1)).alias("n_variants"),
        )
    )


# --- SURT keys + CDX index (the web-archive URL index form) --------------------
#
# SURT = Sort-friendly URI Reordering Transform, the key form of the
# CDX(J) URL indexes that ship with every Common Crawl release
# (pywb / webarchive-commons convention): lowercase, scheme + userinfo
# dropped, the scheme's OWN default port stripped (http:80 / https:443 —
# cross-scheme pairs like http://host:443 keep the port and stay
# distinct), leading `www[0-9]*.` stripped, host
# labels REVERSED and comma-joined, `)` before the path, query params
# sorted so param order never splits a URL's captures. Documented subset:
# no percent-encoding normalization and no session-id param stripping
# (both are site-policy tables in pywb, not part of the stable core).
# Everything is an RE2-safe native expression chain — scan-speed, zero
# shuffle, and expressible identically in DuckDB for the value oracle.


def _url_parts(u: Column) -> tuple[Column, Column, Column, Column]:
    """(scheme, rest, port, host) of a lowercased/trimmed URL — the host
    canonicalization core SHARED by surt_key_on and host_of, so the SURT
    dedup keys and the domain_cap / url-filter hosts can never diverge
    (scheme strip, userinfo strip, port strip, leading www[0-9]*. drop)."""
    u = F.lower(F.trim(u))
    scheme = F.regexp_extract(u, "^([a-z][a-z0-9+.-]*)://", 1)
    u = F.regexp_replace(u, "^[a-z][a-z0-9+.-]*://", "")  # scheme
    u = F.regexp_replace(u, "^[^/?#]*@", "")  # userinfo
    netloc = F.regexp_extract(u, "^[^/?#]*", 0)
    rest = F.regexp_replace(u, "^[^/?#]*", "")
    port = F.regexp_extract(netloc, ":([0-9]+)$", 1)
    host = F.regexp_replace(netloc, ":[0-9]+$", "")
    host = F.regexp_replace(host, "^www[0-9]*\\.", "")
    return scheme, rest, port, host


def surt_key_on(u: Column) -> Column:
    """SURT key for one URL column (see module comment for the subset)."""
    scheme, rest, port, host = _url_parts(u)
    # non-default ports survive AFTER the reversed labels (pywb form
    # `com,host:8080)`); only the OWN scheme's default is dropped
    # (:443 for https, :80 otherwise — http://host:443 stays distinct)
    default_port = F.when(scheme == "https", F.lit("443")).otherwise(F.lit("80"))
    hostkey = F.concat(
        F.array_join(F.reverse(F.split(host, "\\.")), ","),
        F.when((port == "") | (port == default_port), F.lit("")).otherwise(
            F.concat(F.lit(":"), port)
        ),
    )
    path = F.regexp_extract(rest, "^[^?#]*", 0)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.regexp_extract(rest, "\\?([^#]*)", 1)
    sorted_q = F.array_join(F.array_sort(F.split(query, "&")), "&")
    return F.concat(
        hostkey,
        F.lit(")"),
        path,
        F.when(query == "", F.lit("")).otherwise(F.concat(F.lit("?"), sorted_q)),
    )


def surt_key(url_col: str = "url") -> Column:
    """surt_key_on over a named column."""
    return surt_key_on(F.col(url_col))


def _url_parts_duck(col: str) -> tuple[str, str, str, str]:
    """DuckDB twin of _url_parts: (scheme, rest, port, host) SQL strings
    (same RE2 patterns) — shared by surt_key_duck and host_of_duck."""
    scheme = f"regexp_extract(lower(trim({col})), '^([a-z][a-z0-9+.-]*)://', 1)"
    u = f"regexp_replace(regexp_replace(lower(trim({col})), '^[a-z][a-z0-9+.-]*://', ''), '^[^/?#]*@', '')"
    netloc = f"regexp_extract({u}, '^[^/?#]*')"
    rest = f"regexp_replace({u}, '^[^/?#]*', '')"
    port = f"regexp_extract({netloc}, ':([0-9]+)$', 1)"
    host = f"regexp_replace(regexp_replace({netloc}, ':[0-9]+$', ''), '^www[0-9]*\\.', '')"
    return scheme, rest, port, host


def surt_key_duck(col: str = "url") -> str:
    """DuckDB twin of surt_key (same RE2 patterns, list_reverse/list_sort)."""
    scheme, rest, port, host = _url_parts_duck(col)
    default_port = f"(CASE WHEN {scheme} = 'https' THEN '443' ELSE '80' END)"
    hostkey = (
        f"(array_to_string(list_reverse(string_split({host}, '.')), ',')"
        f" || CASE WHEN {port} = '' OR {port} = {default_port} THEN '' ELSE ':' || {port} END)"
    )
    path = f"(CASE WHEN regexp_extract({rest}, '^[^?#]*') = '' THEN '/' ELSE regexp_extract({rest}, '^[^?#]*') END)"
    query = f"regexp_extract({rest}, '\\?([^#]*)', 1)"
    sorted_q = f"array_to_string(list_sort(string_split({query}, '&')), '&')"
    return (
        f"({hostkey} || ')' || {path} || "
        f"CASE WHEN {query} = '' THEN '' ELSE '?' || {sorted_q} END)"
    )


def cdx_index(
    df: DataFrame,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    content_col: str = "html",
) -> DataFrame:
    """CDX(J)-style capture index over a pages frame: one row per capture
    with (surt, warc_ts, url, digest, length), TOTALLY ORDERED by
    (surt, warc_ts) — the ordering that makes prefix range scans ("all
    captures of this host/path") a contiguous read, which is the entire
    point of the CDX format. In Spark the global order is a sample-based
    RangePartitioning exchange (one shuffle of the INDEX rows only — the
    page bodies are reduced to an md5 digest + length before the sort, so
    only ~100 B/row crosses the wire at any corpus size); writers then
    emit per-partition sorted runs whose ranges abut, exactly how the
    cluster.idx sharded CDX layout is produced."""
    return (
        df.select(
            surt_key(url_col).alias("surt"),
            F.col(ts_col),
            F.col(url_col).alias("url"),
            F.md5(F.col(content_col)).alias("digest"),
            F.length(F.col(content_col)).alias("length"),
        )
        .orderBy("surt", ts_col)
    )


def url_capture_dedup(
    df: DataFrame,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    content_col: str = "text",
) -> DataFrame:
    """URL-level capture dedup: ONE row per canonical URL — the LATEST
    capture per SURT key — the pass every Common-Crawl-derived corpus
    runs before content dedup (a crawl re-fetches the same page across
    segments and months; WET/CDX releases are keyed exactly this way).

    Output: (surt, warc_ts, url, text) of the surviving capture.

    Scale shape: ONE hash shuffle on the surt key, and the winner is
    selected with max(struct(ts, url, digest, text)) — an aggregate, not
    a window, so it map-side COMBINES: each input partition forwards one
    candidate row per surt it holds, never every capture of a hot URL.
    (A row_number window over surt would shuffle every capture of the
    hottest page into one partition — the skew shape the round-4 verdict
    flagged in exact_substr; aggregates don't have it.) Ties on the
    timestamp break deterministically by (url, digest, text) binary
    order, identical in Spark and DuckDB."""
    winner = F.max(
        F.struct(
            F.col(ts_col).alias("ts"),
            F.col(url_col).alias("url"),
            F.md5(F.col(content_col)).alias("digest"),
            F.col(content_col).alias("text"),
        )
    ).alias("w")
    return (
        df.select(
            surt_key(url_col).alias("surt"),
            F.col(ts_col),
            F.col(url_col),
            F.col(content_col),
        )
        .groupBy("surt")
        .agg(winner)
        .select(
            "surt",
            F.col("w.ts").alias("warc_ts"),
            F.col("w.url").alias("url"),
            F.col("w.text").alias("text"),
        )
    )


def url_capture_dedup_duck(pages_sql: str) -> str:
    """DuckDB twin of url_capture_dedup over a (url, warc_ts, text)
    subquery: same surt canonicalization, same (ts, url, digest, text)
    descending tie-break, expressed as arg-max via row_number (DuckDB has
    no struct-max with this field order)."""
    return f"""
    WITH pages AS ({pages_sql}),
    keyed AS (
      SELECT {surt_key_duck('url')} AS surt, warc_ts, url, text,
             md5(text) AS digest
      FROM pages
    ),
    ranked AS (
      SELECT surt, warc_ts, url, text,
             row_number() OVER (
               PARTITION BY surt
               ORDER BY warc_ts DESC, url DESC, digest DESC, text DESC
             ) AS rn
      FROM keyed
    )
    SELECT surt, warc_ts, url, text FROM ranked WHERE rn = 1
    """


# --- per-domain document cap (RefinedWeb/C4-style host balancing) --------------
#
# A handful of viral hosts can contribute millions of pages each; capping
# documents-per-domain is the standard host-balancing pass (C4 and
# RefinedWeb both bound per-source contribution). The cap must be EXACT
# and deterministic — "keep the k docs per host that sort first by
# (md5(url), url)" — so a resumed or re-sharded run keeps the identical
# set, independent of crawl order and partitioning.


def host_of(url_col: str = "url") -> Column:
    """Registrable host of a URL: lowercase, scheme/userinfo/port
    stripped, leading `www[0-9]*.` dropped — the SAME `_url_parts` core
    as `surt_key_on`, without label reversal."""
    return _url_parts(F.col(url_col))[3]


def host_of_duck(col: str = "url") -> str:
    """DuckDB twin of host_of (same `_url_parts_duck` core)."""
    return _url_parts_duck(col)[3]


def domain_cap(
    df: DataFrame,
    k: int,
    url_col: str = "url",
    salt_buckets: int = 16,
) -> DataFrame:
    """Keep at most `k` documents per host — the k that sort FIRST by
    (md5(url), url), a deterministic pseudo-random order — and drop the
    rest. URLs are assumed unique per row (run `url_capture_dedup`
    first); the selection is then independent of row order, partitioning,
    and cluster size.

    Scale shape (the reason this is not one `row_number` window): ranking
    every page of a viral host in ONE window partition is the exact skew
    the round-4 verdict flagged in exact_substr. Instead:

      1. KEY-ONLY projection — only (host, md5, url) rows (~100 B) ever
         shuffle for ranking; text/html bytes stay put until the final
         semi-join (the `cdx_index` argument).
      2. SALTED local top-k: rank within (host, salt) where salt is a
         `salt_buckets`-way hash of the url — the hottest host's sort
         partitions shrink by /salt_buckets (tunable), and Spark's window
         sort spills, so this bounds TIME skew, not just memory.
      3. EXACT global top-k over the survivors: every global top-k row is
         also top-k within its salt bucket, so phase 2 ranks at most
         `salt_buckets * k` rows per host and the result is exactly the
         unsalted answer — the salt never leaks into the output (which is
         why a Spark-only hash is fine for it).

    Returns the input rows that survive the cap (all original columns).
    """
    h = F.md5(F.col(url_col))
    keys = df.select(
        host_of(url_col).alias("__host"),
        h.alias("__h"),
        F.col(url_col).alias("__url"),
        F.pmod(F.xxhash64(F.col(url_col), F.lit("domain_cap")), F.lit(salt_buckets)).alias(
            "__salt"
        ),
    )
    local = Window.partitionBy("__host", "__salt").orderBy("__h", "__url")
    survivors = (
        keys.withColumn("__rn", F.row_number().over(local))
        .where(F.col("__rn") <= k)
        .drop("__rn", "__salt")
    )
    final = Window.partitionBy("__host").orderBy("__h", "__url")
    kept = (
        survivors.withColumn("__rn", F.row_number().over(final))
        .where(F.col("__rn") <= k)
        .select("__url")
    )
    return df.join(kept, F.col(url_col) == F.col("__url"), "left_semi")


def domain_cap_duck(pages_sql: str, k: int, url_col: str = "url") -> str:
    """DuckDB twin of domain_cap over any subquery with a `{url_col}`
    column: one unsalted row_number per host (the semantics; the Spark
    side's salting is an execution detail that provably cancels out)."""
    return f"""
    WITH pages AS ({pages_sql}),
    ranked AS (
      SELECT *, row_number() OVER (
        PARTITION BY {host_of_duck(url_col)}
        ORDER BY md5({url_col}), {url_col}
      ) AS __rn
      FROM pages
    )
    SELECT * EXCLUDE (__rn) FROM ranked WHERE __rn <= {k}
    """


# --- URL filtering (RefinedWeb-style pre-extraction gate) ----------------------
#
# The cheapest filter in the whole pipeline runs BEFORE any byte of html
# is parsed: block hosts on a curated domain blocklist (RefinedWeb uses
# the UT1 list, ~4.6M domains) and score URLs for spam vocabulary. At
# 100 TB this gate prunes whole documents at the parquet scan's
# projection width (url only), so it pays for itself immediately.


def host_suffixes(host: Column) -> Column:
    """All dot-suffixes of a host (`a.b.example.net` -> [a.b.example.net,
    b.example.net, example.net, net]) — blocklists name REGISTRABLE
    domains, so a match on any suffix blocks the host. Bounded by label
    count (browsers cap ~127), never a cross join."""
    labels = F.split(host, "\\.")
    return F.transform(
        F.sequence(F.lit(1), F.size(labels)),
        lambda i: F.array_join(F.slice(labels, i, F.size(labels)), "."),
    )


def url_quality_filter(
    df: DataFrame,
    blocked_domains: list[str],
    penalty_words: list[str],
    url_col: str = "url",
) -> DataFrame:
    """Annotate each row with the URL-level gate columns (RefinedWeb
    §URL-filtering, documented subset):

      host          — registrable host (see host_of)
      blocked_host  — host or ANY dot-suffix is on the domain blocklist
      penalty_hits  — number of spam-vocabulary words appearing in the
                      lowercased URL (strict substring, the UT1 soft rule)
      url_keep      — NOT blocked AND penalty_hits < 2

    Everything is a native expression over the url column alone — the
    gate runs at scan speed with the html column pruned away. The
    blocklists here are literal arrays (they broadcast inside the plan);
    for a UT1-sized list (~4.6M rows) explode `host_suffixes` and
    LEFT SEMI join a blocklist table instead — same semantics, one
    broadcast join, still no shuffle of the pages side."""
    host = host_of(url_col)
    blocked = (
        F.arrays_overlap(
            host_suffixes(host),
            F.array(*[F.lit(d) for d in blocked_domains]),
        )
        if blocked_domains
        else F.lit(False)  # F.array() is array<void>; fold like the oracle
    )
    low = F.lower(F.col(url_col))
    hits = sum(
        (F.when(low.contains(w), 1).otherwise(0) for w in penalty_words),
        F.lit(0),
    )
    return df.select(
        "*",
        host.alias("host"),
        blocked.alias("blocked_host"),
        hits.cast("int").alias("penalty_hits"),
        (~blocked & (hits < 2)).alias("url_keep"),
    )


def url_quality_filter_duck(
    pages_sql: str,
    blocked_domains: list[str],
    penalty_words: list[str],
    url_col: str = "url",
    select_prefix: str = "*",
) -> str:
    """DuckDB twin of url_quality_filter (same suffix semantics via a
    list comprehension, same strict-substring penalty rule).
    `select_prefix` replaces the leading `*` of the SELECT list — e.g.
    `* EXCLUDE (html), <expr> AS noindex` — so callers never have to
    string-patch the generated SQL."""
    host = host_of_duck(url_col)
    bl = ", ".join("'" + d.replace("'", "''") + "'" for d in blocked_domains)
    suffixes = (
        f"list_transform(generate_series(1, len(string_split({host}, '.'))),"
        f" i -> array_to_string(string_split({host}, '.')[i:], '.'))"
    )
    blocked = f"len(list_intersect({suffixes}, [{bl}])) > 0" if bl else "FALSE"
    # words are quote-escaped into SQL literals (same hazard class as
    # tokenize._merge_expr); an empty word list folds to the 0 the Spark
    # twin's F.lit(0) seed produces
    hits = " + ".join(
        "(CASE WHEN contains(lower({c}), '{w}') THEN 1 ELSE 0 END)".format(
            c=url_col, w=w.replace("'", "''")
        )
        for w in penalty_words
    ) or "0"
    return f"""
    WITH pages AS ({pages_sql})
    SELECT {select_prefix},
           {host} AS host,
           {blocked} AS blocked_host,
           ({hits})::int AS penalty_hits,
           (NOT ({blocked}) AND ({hits}) < 2) AS url_keep
    FROM pages
    """


def meta_robots_noindex(html_col: str = "html") -> Column:
    """True iff the page opts out of indexing via
    `<meta name="robots" ... content="...noindex...">` (either attribute
    order) — corpora that honor robots conventions drop these rows.
    Case-insensitive RE2-safe regexp over the raw html string, scan
    speed; identical pattern runs in DuckDB for the oracle."""
    s = F.col(html_col)
    return s.rlike(_NOINDEX_RE_1) | s.rlike(_NOINDEX_RE_2)


_NOINDEX_RE_1 = (
    "(?i)<meta[^>]*name\\s*=\\s*[\"']?robots[^>]*"
    "content\\s*=\\s*[\"']?[^\"'>]*noindex"
)
_NOINDEX_RE_2 = (
    "(?i)<meta[^>]*content\\s*=\\s*[\"']?[^\"'>]*noindex[^>]*"
    "name\\s*=\\s*[\"']?robots"
)


def meta_robots_noindex_duck(col: str = "html") -> str:
    r1 = _NOINDEX_RE_1.replace("'", "''")
    r2 = _NOINDEX_RE_2.replace("'", "''")
    return f"(regexp_matches({col}, '{r1}') OR regexp_matches({col}, '{r2}'))"


# --- intra-document line dedup (Dolma's within-doc pass) -----------------------


def line_dedup_on(col: Column) -> Column:
    """Drop repeated NON-BLANK lines WITHIN a document, keeping first
    occurrences in order — a pure per-row expression (zero shuffle): a
    line survives iff it is blank (whitespace-only) or its 1-based first
    occurrence (array_position) is its own position. Blank lines are
    exempt because they are STRUCTURE, not content: deduping them would
    delete every paragraph separator after the first, corrupting
    multi-paragraph documents and silently disabling the downstream
    paragraph-level dedup (found by review; pinned by test).
    O(lines²) per row worst-case, bounded by document size. The input
    column and its split are each bound once (array()/lambda hoist, see
    _SHINGLES_SPARK) so an expensive upstream rewrite — e.g. the PII
    scrub — evaluates once, not once per line."""
    return F.element_at(
        F.transform(
            F.array(F.split(col, "\n")),
            lambda ls: F.array_join(
                F.transform(
                    F.filter(
                        F.sequence(F.lit(1), F.size(ls)),
                        lambda i: (F.trim(F.element_at(ls, i)) == "")
                        | (F.array_position(ls, F.element_at(ls, i)) == i),
                    ),
                    lambda i: F.element_at(ls, i),
                ),
                "\n",
            ),
        ),
        1,
    )


def line_dedup(text_col: str = "text") -> Column:
    """line_dedup_on over a named column."""
    return line_dedup_on(F.col(text_col))


def line_dedup_duck(col: str = "text") -> str:
    """DuckDB twin of line_dedup (list_position = first occurrence; blank
    lines exempt, matching the Spark side)."""
    return (
        "array_to_string(list_transform(list_filter("
        f" range(1, len(string_split({col}, chr(10))) + 1),"
        f" i -> trim(string_split({col}, chr(10))[i]) = ''"
        f" OR list_position(string_split({col}, chr(10)),"
        f" string_split({col}, chr(10))[i]) = i),"
        f" i -> string_split({col}, chr(10))[i]), chr(10))"
    )


# --- C4 line + page cleaning (Raffel et al. 2020 §2.2) -------------------------
#
# The C4 cleaning pass every T5-descended corpus starts from: keep only
# lines that read like prose (terminal punctuation, a minimum word count,
# no 'javascript' boilerplate), then gate whole pages (code pages via '{',
# placeholder pages via 'lorem ipsum', a word blocklist, and a minimum
# sentence count over what survived). All native expressions per row —
# scan speed, zero shuffle at any corpus size.


def c4_line_clean(
    df: DataFrame,
    text_col: str = "text",
    bad_words: list[str] | tuple[str, ...] = (),
    min_words_per_line: int = 3,
    min_sentences: int = 5,
) -> DataFrame:
    """Annotate each row with the C4 §2.2 cleaning columns:

      text_clean      — surviving lines (trimmed), newline-joined. A line
                        survives iff its trim ends in terminal punctuation
                        ([.!?"]), has >= min_words_per_line whitespace
                        words, and does not contain 'javascript'.
      n_lines_kept / n_lines_dropped
      n_sentences     — terminal-punctuation marks in text_clean
      page_keep       — n_sentences >= min_sentences AND the RAW page has
                        no '{', no 'lorem ipsum', and no blocklist word
                        (word-boundary via alnum tokenization; each
                        blocklist entry is normalized through the SAME
                        tokenization, so hyphenated/punctuated entries
                        match their tokenized page form). The containment
                        gates read the raw page (C4 removed code/
                        placeholder PAGES outright); the sentence minimum
                        reads the cleaned text.

    Lines split on \\r\\n | \\r | \\n in BOTH engines — Java's `$`
    matches before a final line terminator while RE2's does not, so a
    CR left inside a line would silently diverge the twins (and pollute
    text_clean).

    Documented subset: C4's three-sentence-span dedup is the separate
    `exact_substr_dedup` / `paragraph_dedup` tiers. The blocklist here
    is a literal expression chain (one page scan per entry) — right for
    the handful-of-words case; for the full ~400-entry C4 list, explode
    the page's token array and LEFT SEMI join a blocklist table instead
    (the `url_quality_filter` scaling note), same semantics."""
    # per-row regex-heavy projection: widen off a single-split scan first
    df = widen_if_narrow(df)
    raw = F.col(text_col)
    lines = F.split(raw, "\\r\\n|\\r|\\n")

    def _line_ok(line: Column) -> Column:
        t = F.trim(line)
        words = F.size(F.filter(F.split(t, "\\s+"), lambda x: x != ""))
        return (
            t.rlike('[.!?"]$')
            & (words >= min_words_per_line)
            & ~F.lower(t).contains("javascript")
        )

    kept = F.filter(lines, _line_ok)
    # NOT transform(kept, F.trim): transform passes (element, index) to a
    # two-arg callable, and F.trim(col, trimStr) would trim by INDEX chars
    cleaned = F.array_join(F.transform(kept, lambda l: F.trim(l)), "\n")
    low_raw = F.lower(raw)
    toks = F.concat(
        F.lit(" "), F.regexp_replace(low_raw, "[^a-z0-9]+", " "), F.lit(" ")
    )
    bad = F.lit(False)
    for w in _normalized_bad_words(bad_words):
        bad = bad | toks.contains(f" {w} ")
    n_sent = F.size(F.regexp_extract_all(cleaned, F.lit("[.!?]"), 0))
    page_keep = (
        (n_sent >= min_sentences)
        & ~raw.contains("{")
        & ~low_raw.contains("lorem ipsum")
        & ~bad
    )
    return df.select(
        "*",
        cleaned.alias("text_clean"),
        F.size(kept).cast("int").alias("n_lines_kept"),
        (F.size(lines) - F.size(kept)).cast("int").alias("n_lines_dropped"),
        n_sent.cast("int").alias("n_sentences"),
        page_keep.alias("page_keep"),
    )


def _normalized_bad_words(bad_words) -> list[str]:
    """Blocklist entries pushed through the SAME [^a-z0-9]+ -> space
    tokenization as the page text, so 'bad-word' matches its tokenized
    page form 'bad word' (a raw hyphenated pattern could NEVER occur in
    the tokenized page and would silently disable that entry). Entries
    that normalize to nothing are dropped — a bare ' ' pattern would
    match every page."""
    import re

    out = []
    for w in bad_words:
        n = re.sub(r"[^a-z0-9]+", " ", w.lower()).strip()
        if n:
            out.append(n)
    return out


def c4_line_clean_duck(
    pages_sql: str,
    bad_words: list[str] | tuple[str, ...] = (),
    min_words_per_line: int = 3,
    min_sentences: int = 5,
    text_col: str = "text",
) -> str:
    """DuckDB twin of c4_line_clean (same line rule, same raw-page gates;
    note DuckDB regexp_replace needs the 'g' flag to match Spark's
    replace-all)."""
    lines = f"string_split_regex({text_col}, '\\r\\n|\\r|\\n')"
    ok = (
        "l -> regexp_matches(trim(l), '[.!?\"]$')"
        " AND len(list_filter(string_split_regex(trim(l), '\\s+'),"
        f" x -> x != '')) >= {min_words_per_line}"
        " AND NOT contains(lower(trim(l)), 'javascript')"
    )
    kept = f"list_filter({lines}, {ok})"
    cleaned = f"array_to_string(list_transform({kept}, l -> trim(l)), chr(10))"
    toks = (
        f"(' ' || regexp_replace(lower({text_col}), '[^a-z0-9]+', ' ', 'g') || ' ')"
    )
    bad = " OR ".join(
        "contains({t}, ' {w} ')".format(t=toks, w=w.replace("'", "''"))
        for w in _normalized_bad_words(bad_words)
    ) or "FALSE"
    n_sent = f"len(regexp_extract_all({cleaned}, '[.!?]'))"
    keep = (
        f"(({n_sent}) >= {min_sentences}"
        f" AND NOT contains({text_col}, chr(123))"
        f" AND NOT contains(lower({text_col}), 'lorem ipsum')"
        f" AND NOT ({bad}))"
    )
    return f"""
    WITH pages AS ({pages_sql})
    SELECT *,
           {cleaned} AS text_clean,
           len({kept})::int AS n_lines_kept,
           (len({lines}) - len({kept}))::int AS n_lines_dropped,
           ({n_sent})::int AS n_sentences,
           {keep} AS page_keep
    FROM pages
    """


# --- the composite pipeline ----------------------------------------------------


def stateless_curate(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 5,
    max_words: int = 10000,
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """The streaming-safe curation stages, shared by curate_corpus and
    streaming.jobs.curate_stream so batch and stream can never drift:
    length gate -> PII scrub -> within-doc line dedup. The gate counts
    words across ANY whitespace (newlines included) — a destructive filter
    must not undercount one-word-per-line documents (lists, poetry, code),
    unlike the advisory quality_score whose single-space convention it
    otherwise mirrors."""
    # strip ALL leading/trailing whitespace first (regexp, not F.trim —
    # trim strips only ASCII spaces, so a leading tab/newline would still
    # mint a phantom empty split token and inflate the count by one past a
    # destructive gate; review finding). The all-whitespace/empty doc
    # counts as 0 words.
    stripped = F.regexp_replace(F.col(text_col), "^\\s+|\\s+$", "")
    n_words = F.when(stripped == "", F.lit(0)).otherwise(
        F.size(F.split(stripped, "\\s+"))
    )
    gated = df.filter((n_words >= min_words) & (n_words <= max_words))
    return gated.select(
        F.col(id_col),
        *[F.col(c) for c in keep_cols],
        line_dedup_on(_dd.pii_redact(text_col)).alias(text_col),
    )


def curate_corpus(
    df: DataFrame,
    benchmark: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 5,
    max_words: int = 10000,
) -> DataFrame:
    """Full curation pass in the order the public recipes compose:

    1. length gate (Gopher)            — scan-speed filter, pushes to scan
    2. PII scrub (C4/Dolma)            — regexp chain, scan-speed
    3. intra-doc line dedup (Dolma)    — per-row expression, zero shuffle
    4. exact dedup (everyone)          — one shuffle on md5(text); only the
       deterministic canonical row (min id per hash) survives
    5. paragraph-level dedup (Dolma)   — one shuffle on paragraph hash +
       one reassembly groupBy
    6. benchmark decontamination       — broadcast anti-join, zero corpus
       (GPT-3/C4; optional)              shuffle

    Returns (id, text) with text rewritten by stages 2/3/5. Deterministic
    end-to-end: re-running on the same input yields byte-identical output
    (tested), which is what makes a resumed curation run safe.

    Order rationale: text-rewriting stages run BEFORE the content hashes
    so duplicates of the same page differing only in PII/noise dedup
    together; URL dedup (url_dedup) belongs even earlier, in the crawl
    layer, where a text column does not exist yet. The benchmark side is
    scrubbed with the SAME stateless rewrites before n-gram hashing —
    decontaminating rewritten training text against raw benchmark text
    would let any benchmark passage containing an email/phone/IP-shaped
    run slip through (found by review; pinned by test).

    Stage 4 elects the canonical row with a row_number window over the
    content hash, not exact_dedup + semi-join: the join form evaluates the
    expensive scrub projection once PER JOIN SIDE (the same
    no-ReusedExchange disease simhash_neardup_pairs documents), while the
    window is one pass and one shuffle.
    """
    from pyspark.sql import Window

    # widen off a single-split scan before the scrub/dedup chain (no-op on
    # wide inputs; every stage below is deterministic in ids, so the
    # output is partitioning-independent — see core.partitioning)
    df = widen_if_narrow(df, by=F.col(id_col))
    scrubbed = stateless_curate(df, text_col, id_col, min_words, max_words)
    w = Window.partitionBy(F.md5(F.col(text_col))).orderBy(id_col)
    unique = (
        scrubbed.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    para = _dd.paragraph_dedup(unique, text_col, id_col).select(
        F.col(id_col), F.col("dedup_text").alias(text_col)
    )
    out = para.filter(F.col(text_col) != "")
    if benchmark is not None:
        clean_bench = stateless_curate(
            benchmark, text_col, id_col, min_words=1, max_words=1 << 31
        )
        out = _dd.decontaminate(out, clean_bench, text_col, id_col)
    return out
