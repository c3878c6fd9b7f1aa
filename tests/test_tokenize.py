"""Distributed BPE training/encoding vs an INDEPENDENT reference trainer
(the published Sennrich algorithm implemented here with dict/Counter and
regex — structurally nothing like the Spark fold), plus the encode==train
segmentation property and determinism under repartitioning."""

import re
from collections import Counter

import pyspark.sql.functions as F

from ai_service_ocr_grading_handler_spark.operators import tokenize

END = tokenize.END


# --- reference implementation (Sennrich et al. 2015, learn_bpe) --------------


def _ref_get_stats(vocab):
    pairs = Counter()
    for syms, freq in vocab:
        for i in range(len(syms) - 1):
            pairs[(syms[i], syms[i + 1])] += freq
    return pairs


def _ref_merge(vocab, pair):
    a, b = pair
    pat = re.compile(
        r"(?<!\S)" + re.escape(a) + r" " + re.escape(b) + r"(?!\S)"
    )
    out = []
    for syms, freq in vocab:
        joined = " ".join(syms)
        # lambda replacement: re.sub processes backslash escapes in a
        # string replacement, which corrupts merged symbols containing
        # backslashes (found by the hypothesis property run)
        out.append((pat.sub(lambda _: a + b, joined).split(" "), freq))
    return out


def _ref_train(word_freqs, n_merges):
    vocab = [(list(w) + [END], f) for w, f in word_freqs.items()]
    merges = []
    for _ in range(n_merges):
        stats = _ref_get_stats(vocab)
        if not stats:
            break
        # deterministic argmax: count desc, pair lexicographic asc
        best = min(stats.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < 2:
            break
        merges.append(best[0])
        vocab = _ref_merge(vocab, best[0])
    return merges, {tuple(k): v for k, v in ((tuple(s), f) for s, f in vocab)}


_CORPUS = [
    "low low low low low",
    "lower lower newest newest newest",
    "newest newest newest widest widest",
    "aaa aaa banana banana banana bandana",
    "it's low-er, really low!",
]


def _docs(spark, texts=_CORPUS):
    return spark.createDataFrame([(t,) for t in texts], "text string")


def test_train_bpe_matches_reference_merge_sequence(spark):
    docs = _docs(spark)
    wf = tokenize.word_freq(docs)
    got = tokenize.train_bpe(wf, n_merges=20)
    wfreqs = {r.word: r.freq for r in wf.collect()}
    want, _ = _ref_train(wfreqs, 20)
    assert got == want
    assert len(got) >= 10  # the fixture genuinely trains double-digit merges
    # partitioning invariance: identical merge sequence from a resharded table
    again = tokenize.train_bpe(wf.repartition(7), n_merges=20)
    assert again == got


def test_trained_segmentation_matches_reference_and_encode(spark):
    docs = _docs(spark)
    wf = tokenize.word_freq(docs)
    merges = tokenize.train_bpe(wf, n_merges=15)
    seg = {
        r.word: tuple(r.symbols)
        for r in tokenize.segment_words(wf, merges).collect()
    }
    wfreqs = {r.word: r.freq for r in wf.collect()}
    ref_merges, _ = _ref_train(wfreqs, 15)
    ref_vocab = [(list(w) + [END], f) for w, f in wfreqs.items()]
    for p in ref_merges:
        ref_vocab = _ref_merge(ref_vocab, p)
    ref_seg = {
        w: tuple(s) for (s, _), w in zip(ref_vocab, wfreqs)
    }
    assert seg == ref_seg
    # encode == train: greedy rank-order encoding reproduces the trained
    # segmentation on every training word (the GPT-2 encoder property)
    ranks = {p: i for i, p in enumerate(merges)}
    for w, s in seg.items():
        assert tuple(tokenize._encode_word(w, ranks)) == s, w


def test_bpe_encode_counts(spark):
    docs = _docs(spark)
    merges = tokenize.train_bpe(tokenize.word_freq(docs), n_merges=15)
    out = tokenize.bpe_encode(docs, merges).collect()
    ranks = {p: i for i, p in enumerate(merges)}
    for r in out:
        want = sum(len(tokenize._encode_word(w, ranks)) for w in r.text.split())
        assert r.n_bpe_tokens == want
    # schema preserved + appended; empty text counts zero
    empty = tokenize.bpe_encode(_docs(spark, [""]), merges).collect()
    assert empty[0].n_bpe_tokens == 0


def test_train_bpe_stops_when_no_pair_repeats(spark):
    docs = _docs(spark, ["q w e r t y"])  # all single chars, all freq 1
    merges = tokenize.train_bpe(tokenize.word_freq(docs), n_merges=10)
    assert merges == []


def test_bpe_encode_word_boundaries_match_training_split(spark):
    # word_freq splits on Java \s+ (ASCII-only), so a word containing
    # NBSP (U+00A0) trains as ONE word and its merges can span the NBSP;
    # bpe_encode must use the identical boundaries (re.ASCII \s+), not
    # str.split()'s Unicode whitespace, or trained merges never apply.
    text = "a\u00a0b a\u00a0b a\u00a0b"
    docs = _docs(spark, [text])
    wf = {r.word: r.freq for r in tokenize.word_freq(docs).collect()}
    assert wf == {"a\u00a0b": 3}  # trains as one word
    merges = tokenize.train_bpe(tokenize.word_freq(docs), n_merges=3)
    assert ("a", "\u00a0") in merges or ("\u00a0", "b") in merges
    out = tokenize.bpe_encode(docs, merges).collect()
    ranks = {p: i for i, p in enumerate(merges)}
    want = 3 * len(tokenize._encode_word("a\u00a0b", ranks))
    assert out[0].n_bpe_tokens == want
    # a Unicode-whitespace split would see words 'a' and 'b', where no
    # merge applies: 3 * 4 tokens instead
    assert want < 12
