"""BPE tokenizer training/encoding (r10): deterministic merge order,
greedy-merge semantics, and the lossless encode round-trip."""

import pytest
from pyspark.sql import Row, functions as F

from olap_storage_engine_spark.operators import text as tx


@pytest.fixture(scope="module")
def tiny_docs(spark):
    # word counts: "low" x5, "lower" x2, "newest" x6, "widest" x3
    # (the classic Sennrich example corpus)
    rows = [
        Row(doc_id=1, text="low low low low low"),
        Row(doc_id=2, text="lower lower"),
        Row(doc_id=3, text="newest newest newest newest newest newest"),
        Row(doc_id=4, text="widest widest widest"),
    ]
    return spark.createDataFrame(rows)


def _py_bpe(texts, k):
    """Pure-python reference: greedy BPE with (count DESC, pair ASC)
    tie-break, no early stop."""
    from collections import Counter

    wc = Counter(w for t in texts for w in t.split(" ") if w)
    words = {w: list(w) for w in wc}
    merges = []
    for rank in range(1, k + 1):
        pc = Counter()
        for w, syms in words.items():
            for x, y in zip(syms, syms[1:]):
                pc[(x, y)] += wc[w]
        if not pc:
            break
        (a, b), c = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rank, a, b, a + b, c))
        for w, syms in words.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[w] = out
    return merges


def test_bpe_train_matches_python_reference(spark, tiny_docs):
    texts = [r["text"] for r in tiny_docs.collect()]
    want = _py_bpe(texts, 6)
    got = [
        (r["rank"], r["lhs"], r["rhs"], r["merged"], r["pair_cnt"])
        for r in tx.bpe_train(tiny_docs, k=6).orderBy("rank").collect()
    ]
    assert got == want


@pytest.mark.parametrize("seed", [3, 41])
def test_bpe_train_matches_reference_random_corpus(spark, seed):
    import random

    rng = random.Random(seed)
    vocab = ["ab", "abc", "aab", "bba", "cab", "ba", "a", "abab"]
    texts = [
        " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 9)))
        for _ in range(30)
    ]
    docs = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    )
    want = _py_bpe(texts, 5)
    got = [
        (r["rank"], r["lhs"], r["rhs"], r["merged"], r["pair_cnt"])
        for r in tx.bpe_train(docs, k=5).orderBy("rank").collect()
    ]
    assert got == want


def test_bpe_greedy_overlap_rule(spark):
    # merge (a,a) applied to "aaa" must yield ["aa","a"], so the pair
    # count for iteration 2's (aa,a) is well-defined greedy semantics
    docs = spark.createDataFrame([Row(doc_id=1, text="aaa aaa")])
    out = tx.bpe_train(docs, k=2).orderBy("rank").collect()
    assert (out[0]["lhs"], out[0]["rhs"], out[0]["pair_cnt"]) == ("a", "a", 4)
    assert (out[1]["lhs"], out[1]["rhs"]) == ("aa", "a")


def test_bpe_encode_roundtrip_and_merge_application(spark, tiny_docs):
    trained = tx.bpe_train(tiny_docs, k=6).orderBy("rank").collect()
    merges = [(r["lhs"], r["rhs"]) for r in trained]
    enc = tx.bpe_encode(tiny_docs, merges)
    rows = {r["doc_id"]: r["tokens"] for r in enc.collect()}
    orig = {r["doc_id"]: r["text"] for r in tiny_docs.collect()}
    for did, toks in rows.items():
        # lossless: concatenated tokens == the text minus spaces
        assert "".join(toks) == orig[did].replace(" ", "")
        # compression: at least one multi-char token was applied
        assert any(len(t) > 1 for t in toks)


def test_bpe_encode_empty_merges_is_char_split(spark):
    docs = spark.createDataFrame([Row(doc_id=1, text="ab c")])
    toks = tx.bpe_encode(docs, []).collect()[0]["tokens"]
    assert toks == ["a", "b", "c"]


def test_bpe_encode_corpus_matches_wordwise_encode(spark, tiny_docs):
    """Doc-level framing (the oracle-friendly replace chain over the
    whole text, spaces as framed symbols) must produce exactly the
    word-wise bpe_encode tokens: merges never contain a space, so a
    framed space breaks any cross-word match by construction."""
    trained = tx.bpe_train(tiny_docs, k=6).orderBy("rank").collect()
    merges = [(r["lhs"], r["rhs"]) for r in trained]
    word = {
        r["doc_id"]: r["tokens"]
        for r in tx.bpe_encode(tiny_docs, merges).collect()
    }
    doc = {
        r["doc_id"]: (r["n_tokens"], r["token_str"])
        for r in tx.bpe_encode_corpus(tiny_docs, merges).collect()
    }
    for did, toks in word.items():
        assert doc[did] == (len(toks), "\x1f".join(toks))


def test_bpe_exhausted_corpus_stops_early(spark):
    # one single-char word: no pairs exist; train returns 0 merges
    docs = spark.createDataFrame([Row(doc_id=1, text="a a a")])
    assert tx.bpe_train(docs, k=3).count() == 0


def test_bpe_compression_stats_ties_to_encoder(spark, tiny_docs):
    """The compression audit's per-group totals must equal the
    encoder's own per-doc sums (same replace chain, counts-only
    projection) and byte/char ratios must be the exact integer
    ratios."""
    docs = tiny_docs.withColumn(
        "source", (F.col("doc_id") % 2).cast("string")
    )
    trained = tx.bpe_train(docs, k=6).orderBy("rank").collect()
    merges = [(r["lhs"], r["rhs"]) for r in trained]
    enc = {
        r["doc_id"]: r["n_tokens"]
        for r in tx.bpe_encode_corpus(docs, merges).collect()
    }
    texts = {
        r["doc_id"]: (r["text"], r["source"]) for r in docs.collect()
    }
    want = {}
    for did, (text, src) in texts.items():
        b, c, t = (
            len(text.encode()),
            len(text),
            enc[did],
        )
        agg = want.setdefault(src, [0, 0, 0, 0])
        agg[0] += 1
        agg[1] += b
        agg[2] += c
        agg[3] += t
    got = tx.bpe_compression_stats(docs, merges).collect()
    assert len(got) == len(want)
    for r in got:
        n, b, c, t = want[r["source"]]
        assert (r["n_docs"], r["total_bytes"], r["total_chars"],
                r["total_tokens"]) == (n, b, c, t)
        assert r["bytes_per_token"] == round(b / t, 6)
        assert r["chars_per_token"] == round(c / t, 6)


def test_bpe_train_driver_path_equals_distributed(spark):
    """r14 optimization: the size-gated driver-side merge loop must be
    bit-identical to the distributed argmax path — same framed-replace
    semantics, same (count DESC, utf-8 bytes ASC) tie-break — on a
    corpus with ties, repeats ('aaa' overlapping pairs) and multi-merge
    chains."""
    from olap_storage_engine_spark.operators.text import bpe_train

    rows = [
        (1, "aaa aaa bb ab abab"),
        (2, "the the the quick brown fox aaa"),
        (3, "zz zz zz yy yy xyzzy"),
        (4, "ab ba ab ba abba"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    drv = [tuple(r) for r in bpe_train(docs, k=6).collect()]
    dist = [
        tuple(r)
        for r in bpe_train(docs, k=6, driver_vocab_threshold=0).collect()
    ]
    assert drv == dist and len(drv) == 6
