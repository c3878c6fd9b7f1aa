"""Property tests for the round-5 operators: each example batches many
generated inputs into ONE Spark job (a per-example job at
hypothesis-default example counts would take minutes)."""

from hypothesis import given, settings
from hypothesis import strategies as st

from ai_service_ocr_grading_handler_spark.operators import (
    curation,
    normalize,
    tokenize,
)

# no surrogates (unencodable), no NUL (parquet/Arrow string hygiene)
_TEXT = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",), blacklist_characters="\x00"),
    max_size=40,
)


@settings(max_examples=5, deadline=None)
@given(st.lists(_TEXT, min_size=1, max_size=40))
def test_fix_mojibake_inverts_one_misread_for_any_text(spark, texts):
    """fix(misread(t)) == t for ARBITRARY unicode t: non-ASCII text
    always triggers the gate (its misread form carries the signature, is
    all-Latin-1 and re-encodes to valid UTF-8 by construction) and the
    repair is the exact inverse; ASCII text misreads to itself and must
    pass through untouched."""
    corrupted = [t.encode("utf-8").decode("latin-1") for t in texts]
    df = spark.createDataFrame(
        [(i, c) for i, c in enumerate(corrupted)], "i bigint, text string"
    )
    got = {
        r.i: r.out
        for r in df.select("i", normalize.fix_mojibake("text").alias("out")).collect()
    }
    assert got == dict(enumerate(texts))


_HOSTS = [f"h{i}.example.com" for i in range(4)]


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 10_000)),
        min_size=1,
        max_size=60,
        unique=True,
    ),
    st.integers(1, 5),
    st.integers(1, 4),
)
def test_domain_cap_matches_bruteforce(spark, pairs, k, salt_buckets):
    """domain_cap == the unsalted per-host top-k by (md5(url), url),
    brute-forced in Python, for random host skews and every small
    salt_buckets value."""
    import hashlib

    urls = [f"https://{_HOSTS[h]}/p/{p}" for h, p in pairs]
    urls = sorted(set(urls))
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    kept = {r.url for r in curation.domain_cap(df, k=k, salt_buckets=salt_buckets).collect()}
    want = set()
    by_host: dict[str, list] = {}
    for u in urls:
        host = u.split("//")[1].split("/")[0]
        by_host.setdefault(host, []).append(u)
    for us in by_host.values():
        ranked = sorted(us, key=lambda u: (hashlib.md5(u.encode()).hexdigest(), u))
        want |= set(ranked[:k])
    assert kept == want


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.text(alphabet="ab\\'", min_size=1, max_size=6),
        min_size=3,
        max_size=60,
    )
)
def test_train_bpe_matches_reference_on_random_corpora(spark, words):
    """Merge-sequence identity vs the independent reference trainer on
    random small-alphabet corpora — the alphabet includes backslash and
    quote, the SQL-literal hazard characters (forced collisions stress
    the deterministic tie-break and the fold's leftmost-first
    semantics)."""
    from tests.test_tokenize import _ref_train

    docs = spark.createDataFrame([(" ".join(words),)], "text string")
    wf = tokenize.word_freq(docs)
    got = tokenize.train_bpe(wf, n_merges=8)
    want, _ = _ref_train({r.word: r.freq for r in wf.collect()}, 8)
    assert got == want
