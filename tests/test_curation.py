"""Curation layer: URL canonicalization/dedup parity, intra-doc line dedup
parity, and the end-to-end curate_corpus composite (stage semantics +
determinism/idempotency)."""

from __future__ import annotations

import duckdb

from ai_service_ocr_grading_handler_spark.operators import curation


def test_canonical_url_matches_duckdb(spark):
    rows = [
        (1, "HTTPS://Example.COM/Path/Page?utm=x#frag"),
        (2, "https://example.com/Path/Page"),
        (3, "http://example.com/"),
        (4, "http://example.com"),
        (5, "ftp://Mixed.Case.Host/KeepCase/"),
        (6, "no-scheme/just/a/path?q=1"),
        (7, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, url string")
    got = {
        r.doc_id: r.c
        for r in df.select(
            "doc_id", curation.canonical_url("url").alias("c")
        ).collect()
    }
    # fragment+query dropped, host lowercased, path case kept, trailing / gone
    assert got[1] == "https://example.com/Path/Page" == got[2]
    assert got[3] == "http://example.com" == got[4]
    assert got[5] == "ftp://mixed.case.host/KeepCase"
    assert got[6] == "no-scheme/just/a/path"
    con = duckdb.connect()
    con.execute("create table u (doc_id bigint, url varchar)")
    con.executemany("insert into u values (?, ?)", rows)
    want = dict(
        con.execute(
            f"SELECT doc_id, {curation.canonical_url_duck('url')} FROM u"
        ).fetchall()
    )
    assert got == want


def test_url_dedup_groups_variants(spark):
    df = spark.createDataFrame(
        [
            (1, "https://A.com/x?q=1"),
            (2, "https://a.com/x#top"),
            (3, "https://a.com/x/"),
            (4, "https://a.com/y"),
        ],
        "doc_id bigint, url string",
    )
    got = {
        r.canonical_url: (r.keeper_url, r.n_variants)
        for r in curation.url_dedup(df).collect()
    }
    assert got["https://a.com/x"] == ("https://A.com/x?q=1", 3)
    assert got["https://a.com/y"] == ("https://a.com/y", 1)


def test_line_dedup_matches_duckdb(spark):
    rows = [
        (1, "keep\ndup\ndup\nother\nkeep"),
        (2, "single"),
        (3, ""),
        (4, "a\na\na\na"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {
        r.doc_id: r.t
        for r in df.select(
            "doc_id", curation.line_dedup("text").alias("t")
        ).collect()
    }
    assert got[1] == "keep\ndup\nother"
    assert got[2] == "single"
    assert got[3] == ""
    assert got[4] == "a"
    con = duckdb.connect()
    con.execute("create table d (doc_id bigint, text varchar)")
    con.executemany("insert into d values (?, ?)", rows)
    want = dict(
        con.execute(
            f"SELECT doc_id, {curation.line_dedup_duck('text')} FROM d"
        ).fetchall()
    )
    assert got == want


def _toy_corpus(spark):
    return spark.createDataFrame(
        [
            # survives every stage, pii rewritten, repeated line collapsed
            (1, "mail me at a@b.io for details\nmail me at a@b.io for details\nsecond paragraph stays intact here"),
            # exact duplicate of doc 1 AFTER the pii scrub + line dedup -> deduped away
            (2, "mail me at z@q.org for details\nmail me at z@q.org for details\nsecond paragraph stays intact here"),
            # too short -> length gate
            (3, "tiny doc"),
            # unique paragraph + a paragraph already owned by doc 1 (post-rewrite)
            (4, "a genuinely new paragraph of words\n\nmail me at <EMAIL> for details\nsecond paragraph stays intact here"),
            # contaminated with the benchmark 13-gram
            (5, "x " * 2 + "one two three four five six seven eight nine ten eleven twelve thirteen"),
        ],
        "doc_id bigint, text string",
    )


def test_curate_corpus_stage_semantics(spark):
    bench = spark.createDataFrame(
        [(100, "one two three four five six seven eight nine ten eleven twelve thirteen")],
        "doc_id bigint, text string",
    )
    out = {
        r.doc_id: r.text
        for r in curation.curate_corpus(_toy_corpus(spark), benchmark=bench).collect()
    }
    # doc 3: length-gated; doc 2: exact dup of doc 1 post-rewrite; doc 5: decontaminated
    assert set(out) == {1, 4}
    assert out[1] == "mail me at <EMAIL> for details\nsecond paragraph stays intact here"
    # doc 4 keeps only its novel paragraph (the other belongs to doc 1)
    assert out[4] == "a genuinely new paragraph of words"


def test_curate_corpus_is_deterministic_and_idempotent(spark):
    df = _toy_corpus(spark)
    once = sorted(curation.curate_corpus(df).collect())
    again = sorted(curation.curate_corpus(df).collect())
    assert once == again
    # curating an already-curated corpus changes nothing
    curated = curation.curate_corpus(df).cache()
    try:
        twice = sorted(
            (r.doc_id, r.text) for r in curation.curate_corpus(curated).collect()
        )
        assert twice == sorted((r.doc_id, r.text) for r in curated.collect())
    finally:
        curated.unpersist()  # session-scoped spark: do not leak cache


def test_curate_corpus_plan_shape(spark):
    """The composite stays join-sane: no cartesian/nested-loop joins, and
    the only joins are the semi (exact-dedup survivors), the paragraph
    keeper equi-join, the reassembly left join, and (with a benchmark) the
    broadcast anti — never an all-pairs product."""
    bench = spark.createDataFrame(
        [(100, "one two three four five six seven")], "doc_id bigint, text string"
    )
    plan = (
        curation.curate_corpus(_toy_corpus(spark), benchmark=bench)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_line_dedup_preserves_blank_separators(spark):
    """Blank lines are structure, not content: deduping them would delete
    every paragraph separator after the first (review finding)."""
    df = spark.createDataFrame(
        [(1, "p1 line\n\np2 line\n\np3 line"), (2, "a\n\n\n\nb")],
        "doc_id bigint, text string",
    )
    got = {
        r.doc_id: r.t
        for r in df.select("doc_id", curation.line_dedup("text").alias("t")).collect()
    }
    assert got[1] == "p1 line\n\np2 line\n\np3 line"
    assert got[2] == "a\n\n\n\nb"
    # DuckDB twin agrees on the exemption
    con = duckdb.connect()
    con.execute("create table d (doc_id bigint, text varchar)")
    con.executemany(
        "insert into d values (?, ?)",
        [(1, "p1 line\n\np2 line\n\np3 line"), (2, "a\n\n\n\nb")],
    )
    want = dict(
        con.execute(
            f"SELECT doc_id, {curation.line_dedup_duck('text')} FROM d"
        ).fetchall()
    )
    assert got == want


def test_curate_corpus_dedups_shared_paragraph_in_multi_paragraph_docs(spark):
    """The review's repro: a shared paragraph inside >=3-paragraph documents
    must still dedup cross-doc (the old line_dedup ate the separators and
    silently disabled this)."""
    df = spark.createDataFrame(
        [
            (1, "first unique paragraph words here\n\nsecond unique paragraph words here\n\nthird paragraph words here okay"),
            (2, "different lead paragraph entirely here\n\nthird paragraph words here okay"),
        ],
        "doc_id bigint, text string",
    )
    out = {r.doc_id: r.text for r in curation.curate_corpus(df).collect()}
    assert out[1] == (
        "first unique paragraph words here\n\nsecond unique paragraph words here"
        "\n\nthird paragraph words here okay"
    )
    assert out[2] == "different lead paragraph entirely here"


def test_gate_counts_words_across_newlines(spark):
    """A one-word-per-line document (list, poetry, code) must not be
    destroyed by the length gate (review finding)."""
    df = spark.createDataFrame(
        [(1, "\n".join(f"w{i}" for i in range(30))), (2, "too small")],
        "doc_id bigint, text string",
    )
    out = {r.doc_id for r in curation.stateless_curate(df).collect()}
    assert out == {1}


def test_decontaminate_matches_across_paragraph_boundary(spark):
    """A contaminated passage that crosses a line or paragraph boundary in
    the training doc must still match the benchmark's space-separated
    n-grams — tokenization normalizes ANY whitespace run (advisor
    finding: upstream stages rejoin text with \\n / \\n\\n)."""
    bench_words = "one two three four five six seven eight nine ten eleven twelve thirteen"
    train = spark.createDataFrame(
        [
            # same 13 words, but split across a paragraph boundary
            (1, "padding words " + bench_words.replace("six seven", "six\n\nseven") + " more padding"),
            # and across single newlines (line-dedup rejoin shape)
            (2, "padding words " + bench_words.replace(" ", "\n") + " tail"),
            (3, "a completely clean document with plenty of words in it"),
        ],
        "doc_id bigint, text string",
    )
    bench = spark.createDataFrame([(100, bench_words)], "doc_id bigint, text string")
    from ai_service_ocr_grading_handler_spark.operators import dedup as _dd

    out = {r.doc_id for r in _dd.decontaminate(train, bench).collect()}
    assert out == {3}


def test_gate_ignores_leading_whitespace(spark):
    """Java split keeps a leading empty token for text starting with
    whitespace; the gate must count real words only (advisor finding: a
    4-word doc with a leading space must not pass min_words=5). The strip
    covers ALL whitespace, not just spaces — F.trim removes only ASCII
    spaces, so tab/newline edges were a second copy of the same bug
    (review finding)."""
    df = spark.createDataFrame(
        [
            (1, " four words only here"),
            (2, "five real words right here"),
            (3, "   \n  "),
            (4, "\nfour words only here"),       # leading newline
            (5, "four words only here\t"),       # trailing tab
            (6, "\t five good words right here \n"),  # mixed edges, 5 words
        ],
        "doc_id bigint, text string",
    )
    out = {r.doc_id for r in curation.stateless_curate(df, min_words=5).collect()}
    assert out == {2, 6}
    # and a max_words gate must not destroy a doc for a trailing newline
    big = "w " * 9999 + "w\n"  # exactly 10000 words + trailing newline
    df2 = spark.createDataFrame([(1, big)], "doc_id bigint, text string")
    assert curation.stateless_curate(df2, max_words=10000).count() == 1


def test_curate_decontaminates_against_scrubbed_benchmark(spark):
    """Benchmark text containing PII-shaped runs must still catch the
    contaminated (scrubbed) training doc (review finding)."""
    passage = "write to help@evalsuite.org with the answer to question nine about the treaty of westphalia signed"
    train = spark.createDataFrame(
        [(1, passage + "\n\nsome extra training words beyond the passage"),
         (2, "a completely clean document with plenty of words in it")],
        "doc_id bigint, text string",
    )
    bench = spark.createDataFrame([(100, passage)], "doc_id bigint, text string")
    out = {r.doc_id for r in curation.curate_corpus(train, benchmark=bench).collect()}
    assert out == {2}


def test_surt_key_matches_duckdb_and_pywb_form(spark):
    """SURT keys: scheme/userinfo/default-port/www stripped, host labels
    reversed, query params sorted, non-default port kept after the
    labels — pinned expected strings AND Spark==DuckDB parity."""
    rows = [
        (1, "https://user:pw@WWW.Example.COM:443/Path/Page?z=1&a=2#frag"),
        (2, "http://example.com"),
        (3, "https://www2.sub.host.org/x"),
        (4, "host.com:8080/a"),
        (5, "example.com/a?b"),
        (6, "http://example.com:80/?b=2&a=1"),
        # cross-scheme: only the OWN scheme's default port is stripped,
        # so http://host:443 and https://host:80 stay distinct resources
        (7, "http://example.com:443/x"),
        (8, "https://example.com:80/x"),
        (9, "https://example.com:443/x"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, url string")
    got = {
        r.doc_id: r.s
        for r in df.select("doc_id", curation.surt_key("url").alias("s")).collect()
    }
    assert got[1] == "com,example)/path/page?a=2&z=1"
    assert got[2] == "com,example)/"
    assert got[3] == "org,host,sub)/x"
    assert got[4] == "com,host:8080)/a"
    assert got[5] == "com,example)/a?b"
    assert got[6] == "com,example)/?a=1&b=2"
    assert got[7] == "com,example:443)/x"
    assert got[8] == "com,example:80)/x"
    assert got[9] == "com,example)/x"
    con = duckdb.connect()
    con.execute("create table u (doc_id bigint, url varchar)")
    con.executemany("insert into u values (?, ?)", rows)
    want = dict(
        con.execute(
            f"SELECT doc_id, {curation.surt_key_duck('url')} FROM u"
        ).fetchall()
    )
    assert got == want


def test_cdx_index_total_order_and_digests(spark):
    """cdx_index: rows arrive globally ordered by (surt, warc_ts) so all
    captures of one URL are adjacent; digests distinguish content
    versions across recrawls of the same URL."""
    rows = [
        (1, "https://b.com/x", "20240102000000", "v2"),
        (2, "https://a.com/x", "20240101000000", "v1"),
        (3, "https://b.com/x", "20240101000000", "v1"),
        (4, "https://WWW.A.com/x?b=1&a=1", "20240103000000", "v1"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, url string, warc_ts string, html string")
    out = curation.cdx_index(df).collect()
    assert [r.surt for r in out] == [
        "com,a)/x",
        "com,a)/x?a=1&b=1",
        "com,b)/x",
        "com,b)/x",
    ]
    # the two b.com/x captures are adjacent and time-ordered
    assert (out[2].warc_ts, out[3].warc_ts) == ("20240101000000", "20240102000000")
    assert out[2].digest != out[3].digest  # recrawl changed content
    assert out[2].digest == out[0].digest  # same bytes -> same digest
    assert all(r.length == 2 for r in out)


def test_url_capture_dedup_latest_and_tiebreak(spark):
    """url_capture_dedup keeps exactly one capture per SURT key: the max
    (warc_ts, url, digest, text) struct — latest capture wins; exact
    timestamp ties break deterministically by binary url order. Variants
    that only SURT unifies (scheme, www, default port, query order,
    case) must collapse to one row."""
    from ai_service_ocr_grading_handler_spark.operators import curation

    rows = [
        # one page, four captures under SURT-equivalent URLs
        ("https://example.com/a?x=1&y=2", "20240101000000", "v1"),
        ("http://EXAMPLE.com:80/a?y=2&x=1", "20240103000000", "v3"),
        ("https://www.example.com/a?x=1&y=2", "20240102000000", "v2"),
        # exact-ts tie on another page: greater url string must win
        ("https://other.org/p", "20240105000000", "tie-a"),
        ("https://other.org/p?", "20240105000000", "tie-b"),
        # singleton
        ("https://solo.net/q", "20240101010101", "only"),
    ]
    df = spark.createDataFrame(rows, "url string, warc_ts string, text string")
    out = {
        r.surt: (r.warc_ts, r.text)
        for r in curation.url_capture_dedup(df).collect()
    }
    assert len(out) == 3
    assert out["com,example)/a?x=1&y=2"] == ("20240103000000", "v3")
    # '?' (0x3f) sorts above end-of-string: the '?'-suffixed url wins
    assert out["org,other)/p"] == ("20240105000000", "tie-b")
    assert out["net,solo)/q"] == ("20240101010101", "only")
    # the winner selection is an AGGREGATE (map-side combinable), not a
    # per-capture window — hot-URL skew safety is a plan property
    plan = (
        curation.url_capture_dedup(df)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Window" not in plan
    assert "partial_max" in plan or "HashAggregate" in plan


def test_domain_cap_exact_and_salt_invariant(spark):
    """domain_cap keeps exactly the k docs per host that sort first by
    (md5(url), url) — the unsalted semantics — for EVERY salt_buckets
    value (the salted two-phase top-k must provably cancel the salt).
    Hosts at or under the cap pass through untouched; the viral host is
    cut to exactly k."""
    from ai_service_ocr_grading_handler_spark.operators import curation

    rows = (
        # viral host: 40 pages
        [(f"https://viral.example.com/p/{i}", i) for i in range(40)]
        # exactly-at-cap host: 5 pages
        + [(f"https://atcap.org/x{i}", 100 + i) for i in range(5)]
        # tiny host (under cap), with port/www/case canonicalization
        + [("https://WWW.Tiny.net:443/only", 200)]
    )
    df = spark.createDataFrame(rows, "url string, doc_id bigint")
    import hashlib

    def md5(u):
        return hashlib.md5(u.encode()).hexdigest()

    viral = sorted((md5(u), u) for u, _ in rows[:40])
    want_viral = {u for _, u in viral[:5]}

    baseline = None
    for s in (1, 3, 16):
        kept = {
            r.url for r in curation.domain_cap(df, k=5, salt_buckets=s).collect()
        }
        assert kept & {u for u, _ in rows[:40]} == want_viral
        assert {u for u, _ in rows[40:]} <= kept  # at/under-cap untouched
        assert len(kept) == 5 + 5 + 1
        baseline = baseline or kept
        assert kept == baseline  # salt never leaks into the result

    # host extraction: www/port/userinfo stripped, case folded
    hosts = {
        r.h
        for r in df.select(curation.host_of("url").alias("h")).collect()
    }
    assert "tiny.net" in hosts and "viral.example.com" in hosts


def test_url_filter_suffix_match_and_noindex_edges(spark):
    """Blocklist matching is dot-SUFFIX, never substring; penalty words
    count strict substrings with keep at <2; noindex matches both
    attribute orders case-insensitively but never across tag boundaries
    or for other meta names."""
    from ai_service_ocr_grading_handler_spark.operators import curation

    urls = [
        "https://bad-ads.example.net/x",          # exact block
        "https://sub.bad-ads.example.net/x",      # suffix block
        "https://notbad-ads.example.net.evil.com/x",  # substring ONLY: keep
        "https://clean.org/casino/bonus-xxx",     # 3 penalty hits: drop
        "https://clean.org/one-casino",           # 1 hit: keep
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    out = curation.url_quality_filter(
        df, ["bad-ads.example.net"], ["casino", "xxx", "bonus"]
    )
    rows = {r.url: (r.blocked_host, r.penalty_hits, r.url_keep) for r in out.collect()}
    assert rows[urls[0]] == (True, 0, False)
    assert rows[urls[1]] == (True, 0, False)
    assert rows[urls[2]] == (False, 0, True)
    assert rows[urls[3]] == (False, 3, False)
    assert rows[urls[4]] == (False, 1, True)

    htmls = [
        '<meta name="robots" content="noindex">',
        "<META CONTENT='a,NOINDEX' NAME=ROBOTS>",
        '<meta name="googlebot" content="noindex">',  # other agent: no
        # noindex in a DIFFERENT tag than the robots meta: no cross-tag match
        '<meta name="robots" content="all"><meta name="x" content="noindex">',
        '<meta name="robots" content="nofollow">',
    ]
    hdf = spark.createDataFrame([(h,) for h in htmls], "html string")
    flags = [
        r.f
        for r in hdf.select(
            curation.meta_robots_noindex("html").alias("f")
        ).collect()
    ]
    assert flags == [True, True, False, False, False]


def test_url_filter_duck_parity_quote_words_and_empty_lists(spark):
    """The DuckDB twin quote-escapes penalty words and folds empty
    word/domain lists to constants; Spark and DuckDB must agree on a word
    containing a single quote and on both-empty gate lists."""
    from ai_service_ocr_grading_handler_spark.operators import curation

    urls = [
        "https://clean.org/don't-miss",   # quoted word hits
        "https://bad.example.com/x",
        "https://clean.org/plain",
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    con = duckdb.connect()
    vals = ", ".join("('" + u.replace("'", "''") + "')" for u in urls)
    pages_sql = f"SELECT * FROM (VALUES {vals}) AS t(url)"

    for domains, words in (
        (["bad.example.com"], ["don't", "casino"]),
        ([], []),
    ):
        got = {
            r.url: (r.host, r.blocked_host, r.penalty_hits, r.url_keep)
            for r in curation.url_quality_filter(df, domains, words).collect()
        }
        want = {
            r[0]: (r[1], r[2], r[3], r[4])
            for r in con.execute(
                curation.url_quality_filter_duck(pages_sql, domains, words)
            ).fetchall()
        }
        assert got == want
    assert got["https://clean.org/don't-miss"][2] == 0  # empty words: 0 hits


def test_c4_line_clean_rules(spark):
    """C4 line rule edges: terminal punctuation required (incl. closing
    quote), 3-word minimum, javascript drop is case-insensitive; page
    gates read the RAW page ('{' in a line-dropped code line still drops
    the page) and the bad-word gate is word-boundary, never substring."""
    from ai_service_ocr_grading_handler_spark.operators import curation

    docs = [
        # 5 prose sentences, all kept: page survives
        (1, "One two three four.\nFive six seven eight!\nNine ten eleven?\n"
            'She said "stop here."\nLast full line here.'),
        # line hazards: nav (no punct), 2-word, javascript (mixed case) —
        # only the prose line survives; page dies on the sentence minimum
        (2, "Header Menu\nToo short.\nEnable JavaScript to continue please.\n"
            "Only one survivor line here."),
        # '{' lives in a line the line-filter DROPS — page must still die
        (3, "A. B? C! D. E.\nfunction() { return 1 }"),
        # 'lorem ipsum' page gate
        (4, "A one two. B three four. C five six. D seven eight. E nine ten.\n"
            "lorem ipsum dolor sit amet."),
        # bad word as SUBSTRING only (badwordish): page survives
        (5, "A one two. B three four. C five six. D seven eight. "
            "E nine badwordish ten."),
        # bad word with word boundary: page dies
        (6, "A one two. B three four. C five six. D seven eight. "
            "E nine badword, ten."),
        (7, ""),  # empty page
    ]
    df = spark.createDataFrame(docs, "doc_id int, text string")
    rows = {
        r.doc_id: r
        for r in curation.c4_line_clean(df, bad_words=["badword"]).collect()
    }
    assert rows[1].page_keep and rows[1].n_lines_kept == 5
    assert rows[2].n_lines_kept == 1 and not rows[2].page_keep
    assert rows[3].n_sentences == 5 and not rows[3].page_keep  # raw '{'
    assert not rows[4].page_keep
    assert rows[5].page_keep  # substring only: no word-boundary hit
    assert not rows[6].page_keep  # ', ' tokenizes away: boundary hit
    assert rows[7].text_clean == "" and rows[7].n_sentences == 0
    assert not rows[7].page_keep


def test_c4_line_clean_crlf_and_hyphenated_blocklist(spark):
    """CRLF pages: lines split on \\r\\n|\\r|\\n in BOTH engines (Java $
    matches before a final line terminator, RE2's does not — a CR left
    inside a line diverges the twins and pollutes text_clean); blocklist
    entries are tokenized like the page, so 'bad-word' matches."""
    from ai_service_ocr_grading_handler_spark.operators import curation

    docs = [
        (1, "Good line one here.\r\nGood line two here.\rThird line also"
            " fine.\nNo terminal punct line"),
        (2, "They wrote bad-word in running text. One two three four."
            " Five six seven eight. Nine ten eleven twelve."
            " Last sentence here now."),
    ]
    df = spark.createDataFrame(docs, "doc_id int, text string")
    got = curation.c4_line_clean(df, bad_words=["bad-word"]).orderBy("doc_id")
    rows = {r.doc_id: r for r in got.collect()}
    assert rows[1].n_lines_kept == 3 and "\r" not in rows[1].text_clean
    assert not rows[2].page_keep  # tokenized 'bad word' matches

    import duckdb
    con = duckdb.connect()
    vals = ", ".join(
        "({i}, '{t}')".format(i=i, t=t.replace("'", "''")) for i, t in docs
    )
    sql = curation.c4_line_clean_duck(
        f"SELECT * FROM (VALUES {vals}) AS t(doc_id, text)",
        bad_words=["bad-word"],
    )
    want = {r[0]: r for r in con.execute(sql + " ORDER BY doc_id").fetchall()}
    for i, r in rows.items():
        assert (r.text_clean, r.n_lines_kept, r.n_lines_dropped,
                r.n_sentences, r.page_keep) == tuple(want[i][2:]), i
