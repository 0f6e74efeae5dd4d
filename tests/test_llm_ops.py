"""Golden tests for the LLM-pipeline operators: dedup, similarity,
text analysis, multimodal plumbing."""

import math

import numpy as np
import pytest
from pyspark.sql import Row, functions as F

from olap_storage_engine_spark.operators import dedup as dd
from olap_storage_engine_spark.operators import multimodal as mm
from olap_storage_engine_spark.operators import similarity as sim
from olap_storage_engine_spark.operators import text as tx


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        Row(doc_id=1, text="the quick brown fox jumps over the lazy dog", lang="en", source="s", n_chars=43),
        Row(doc_id=2, text="the quick brown fox jumps over the lazy dog", lang="en", source="s", n_chars=43),  # exact dup of 1
        Row(doc_id=3, text="the quick brown fox jumps over the lazy cat", lang="en", source="s", n_chars=43),  # near dup
        Row(doc_id=4, text="der hund ist ein guter hund und das ist gut", lang="de", source="s", n_chars=43),
        Row(doc_id=5, text="completely different words entirely here now yes", lang="en", source="s", n_chars=49),
    ]
    return spark.createDataFrame(rows)


def test_exact_dedup(spark, docs):
    kept = dd.exact_dedup(docs)
    ids = {r["doc_id"] for r in kept.collect()}
    assert ids == {1, 3, 4, 5}  # doc 2 collapsed into 1 (min id wins)
    shas = dd.sha_dedup(docs).collect()
    assert sum(r["dup_cnt"] for r in shas) == 5
    assert {r["keep_id"] for r in shas} == {1, 3, 4, 5}


def test_shingles(spark, docs):
    sh = dd.shingles(docs.filter("doc_id = 1"), n=3).collect()
    shingle_set = {r["shingle"] for r in sh}
    assert "the quick brown" in shingle_set
    assert len(shingle_set) == 7  # 9 tokens -> 7 trigrams, all distinct


def test_shingles_short_doc_empty(spark):
    one = spark.createDataFrame([Row(doc_id=1, text="hi there")])
    assert dd.shingles(one, n=3).count() == 0


def test_minhash_finds_near_dups(spark, docs):
    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in dd.minhash_candidates(docs, num_hashes=8, band_rows=2).collect()
    }
    assert (1, 2) in pairs  # identical docs always collide
    assert (1, 5) not in pairs and (2, 5) not in pairs  # unrelated


def test_minhash_signature_deterministic(spark, docs):
    a = dd.minhash_signatures(docs, num_hashes=4).collect()
    b = dd.minhash_signatures(docs, num_hashes=4).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_simhash_identical_and_near(spark, docs):
    fp = {r["doc_id"]: r["simhash"] for r in dd.simhash(docs, bits=32).collect()}
    assert fp[1] == fp[2]  # identical text -> identical fingerprint
    ham_13 = bin(fp[1] ^ fp[3]).count("1")
    ham_15 = bin(fp[1] ^ fp[5]).count("1")
    assert ham_13 < ham_15  # near-dup closer than unrelated
    assert all(0 <= v < 2 ** 32 for v in fp.values())


def test_simhash_candidates(spark, docs):
    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in dd.simhash_candidates(docs, bits=32, band_bits=8).collect()
    }
    assert (1, 2) in pairs


def test_ngram_jaccard(spark, docs):
    out = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dd.ngram_jaccard_pairs(
            docs, n=3, threshold=0.2, max_doc_freq=50
        ).collect()
    }
    assert out[(1, 2)] == 1.0  # identical docs
    assert 0.2 <= out[(1, 3)] < 1.0  # near dup: shares most trigrams
    assert (1, 5) not in out


@pytest.fixture(scope="module")
def embeddings(spark):
    rng = np.random.RandomState(7)
    vecs = rng.randn(20, 64).astype("float32")
    vecs[1] = vecs[0] + 0.01 * rng.randn(64)  # near-dup of 0
    rows = [
        Row(vec_id=i, embedding=[float(x) for x in vecs[i]], label=i % 3)
        for i in range(20)
    ]
    return spark.createDataFrame(rows), vecs


def test_brute_topk_matches_numpy(spark, embeddings):
    df, vecs = embeddings
    probes = df.filter("vec_id < 2")
    out = sim.brute_topk(df, probes, k=3).collect()
    by_probe = {}
    for r in out:
        by_probe.setdefault(r["probe_id"], []).append(r)
    M = vecs.astype(np.float64)
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    S = Mn @ Mn.T
    for pid in (0, 1):
        got = [r["vec_id"] for r in sorted(by_probe[pid], key=lambda r: r["rank"])]
        expect = [
            int(i) for i in np.argsort(-S[pid]) if i != pid
        ][:3]
        assert got == expect
        # cosine values match numpy to rounding
        for r in by_probe[pid]:
            assert math.isclose(
                r["cosine"], round(S[pid][r["vec_id"]], 6), abs_tol=1e-6
            )


def test_embedding_neardup_finds_planted_pair(spark, embeddings):
    df, _ = embeddings
    pairs = {
        (r["vec_a"], r["vec_b"])
        for r in dd.embedding_neardup_pairs(df, threshold=0.9).collect()
    }
    assert (0, 1) in pairs


def test_lsh_topk_subset_of_brute(spark, embeddings):
    """ANN results are a subset of the exact candidate space and ranks
    are consistent (approximate: may miss, must not invent)."""
    df, vecs = embeddings
    probes = df.filter("vec_id < 2")
    ann = sim.lsh_topk(df, probes, k=5, num_planes=4, num_tables=4)
    for r in ann.collect():
        assert r["vec_id"] != r["probe_id"]
        assert -1.0 <= r["cosine"] <= 1.0


def test_pandas_topk_matches_brute(spark, embeddings):
    df, _ = embeddings
    probes = df.filter("vec_id < 2")
    brute = {
        (r["probe_id"], r["rank"]): r["vec_id"]
        for r in sim.brute_topk(df, probes, k=3).collect()
    }
    fast = {
        (r["probe_id"], r["rank"]): r["vec_id"]
        for r in sim.pandas_topk(df, probes, k=3).collect()
    }
    assert brute == fast


def test_text_stats(spark, docs):
    out = {r["lang"]: r for r in tx.text_stats(docs).collect()}
    assert out["en"]["n_docs"] == 4
    assert out["de"]["n_docs"] == 1
    assert out["en"]["total_tokens"] == 9 + 9 + 9 + 7


def test_language_id(spark, docs):
    out = {r["doc_id"]: r["pred_lang"] for r in tx.language_id(docs).collect()}
    assert out[1] == "en"  # 'the' x2, 'over' no, 'a' no -> en wins
    assert out[4] == "de"  # der/ist/ein/und/das
    assert out[5] == "und"  # no stopwords at all


def test_quality_score(spark, docs):
    out = {r["doc_id"]: r for r in tx.quality_score(docs).collect()}
    assert out[1]["n_tokens"] == 9
    assert out[1]["n_stopwords"] >= 2
    assert 0.0 <= out[1]["quality"] <= 1.0


def test_token_counts(spark, docs):
    out = {r["doc_id"]: r for r in tx.token_counts(docs).collect()}
    assert out[1]["ws_tokens"] == 9
    assert out[1]["bpe_tokens"] == 9  # pure lowercase words


def test_bpe_tokens_punct(spark):
    df = spark.createDataFrame([Row(doc_id=1, text="hello, world! x2")])
    out = tx.token_counts(df).collect()[0]
    # [hello][,][world][!][x][2]
    assert out["bpe_tokens"] == 6
    assert out["ws_tokens"] == 3


def test_fingerprint_order_sensitive(spark):
    df = spark.createDataFrame(
        [Row(doc_id=1, text="a b c"), Row(doc_id=2, text="c b a"),
         Row(doc_id=3, text="a b c")]
    )
    out = {r["doc_id"]: r["fingerprint"] for r in tx.fingerprints(df).collect()}
    assert out[1] == out[3]
    assert out[1] != out[2]


def test_multimodal_payload_and_features(spark, docs):
    payload = mm.attach_binary_payload(docs)
    row = payload.filter("doc_id = 1").collect()[0]
    assert bytes(row["payload"]) == row["text"].encode()
    assert row["meta"]["n_bytes"] == len(row["text"])
    feats = {r["doc_id"]: r for r in mm.decode_features(payload).collect()}
    assert feats[1]["n_bytes"] == 43
    assert feats[1]["first_byte"] == ord("t")
    assert feats[1]["last_byte"] == ord("g")
    expected_mean = sum("the quick brown fox jumps over the lazy dog".encode()) / 43
    assert math.isclose(feats[1]["byte_mean"], expected_mean, rel_tol=1e-9)


def test_multimodal_video_container_decodes_for_real(spark, docs):
    """The last modality gap closed (r9): AVI/MJPEG payloads attach
    and decode end-to-end, and the values match the exact-regime
    closed form (flat YCbCr frame f of doc i -> clamped integer RGB)."""
    feats = {
        r["doc_id"]: r
        for r in mm.decode_video_features(
            mm.attach_avi_payload(docs)
        ).collect()
    }

    def rgb(i, f):
        y, cb, cr = (i * 5 + f * 29) % 256, i * 11 % 256, i * 17 % 256
        clamp = lambda v: min(255, max(0, math.floor(v + 0.5)))
        return (
            clamp(y + 1.402 * (cr - 128)),
            clamp(y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128)),
            clamp(y + 1.772 * (cb - 128)),
        )

    for i, r in feats.items():
        n = 2 + i % 4
        assert r["n_frames"] == n and r["n_sampled"] == n
        assert (r["width"], r["height"]) == (8 * (1 + i % 4), 8 * (1 + i % 3))
        exp = [rgb(i, f) for f in range(n)]
        for ci, col in enumerate(["mean_r", "mean_g", "mean_b"]):
            assert math.isclose(
                r[col], sum(e[ci] for e in exp) / n, abs_tol=1e-9
            ), (i, col)


# ---------------------------------------------------------------- clusters


# thr=big -> driver union-find fast path; thr=0 -> distributed
# label-propagation path.  Both must produce identical components.
import pytest as _pytest

_CC_PATHS = _pytest.mark.parametrize("thr", [200_000, 0], ids=["driver", "dist"])


@_CC_PATHS
def test_connected_components_chain(spark, thr):
    # a 6-vertex path: worst case for plain propagation, exercises the
    # pointer-jumping shortcut (converges in O(log n) rounds)
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 6)], "doc_a long, doc_b long"
    )
    cc = {
        r["id"]: r["component"]
        for r in dd.connected_components(
            pairs, driver_edge_threshold=thr
        ).collect()
    }
    assert cc == {i: 1 for i in range(1, 7)}


@_CC_PATHS
def test_connected_components_long_path(spark, thr):
    # 40-vertex path: diameter >> max_iter, so plain min-propagation
    # would silently mislabel — pointer jumping must close it in
    # O(log diameter) rounds within the default iteration budget
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 40)], "doc_a long, doc_b long"
    )
    cc = {
        r["id"]: r["component"]
        for r in dd.connected_components(
            pairs, driver_edge_threshold=thr
        ).collect()
    }
    assert cc == {i: 1 for i in range(1, 41)}


@_CC_PATHS
def test_connected_components_disjoint_cliques(spark, thr):
    edges = [(1, 2), (2, 3), (1, 3), (10, 11), (11, 12), (20, 21)]
    pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
    cc = {
        r["id"]: r["component"]
        for r in dd.connected_components(
            pairs, driver_edge_threshold=thr
        ).collect()
    }
    assert cc == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_connected_components_paths_agree_random(spark):
    """Randomized cross-check: the driver union-find and the
    distributed label-propagation paths label identically."""
    import random

    rng = random.Random(7)
    edges = [
        (rng.randrange(0, 60), rng.randrange(0, 60)) for _ in range(120)
    ]
    edges = [(min(a, b), max(a, b)) for a, b in edges if a != b]
    pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
    fast = {
        (r["id"], r["component"])
        for r in dd.connected_components(
            pairs, driver_edge_threshold=10**6
        ).collect()
    }
    dist = {
        (r["id"], r["component"])
        for r in dd.connected_components(
            pairs, driver_edge_threshold=0
        ).collect()
    }
    assert fast == dist


def test_cluster_delta_refresh_random_splits_equal_rebuild(spark):
    """Randomized refresh ≡ rebuild: random graphs over a small id
    space (dense enough to force merges constantly), split at random
    publish points — every (base, delta) split of an append-ordered
    edge stream must refresh to exactly the full rebuild.  Ids above
    the split are 'new docs', so delta = edges touching any new id
    (what a signature-index delta refresh emits for an append-only
    corpus) plus nothing else; base = the old-old edges."""
    import random

    rng = random.Random(11)
    for case in range(6):
        n_ids = rng.randrange(8, 40)
        edges = list(
            {
                (min(a, b), max(a, b))
                for a, b in (
                    (rng.randrange(n_ids), rng.randrange(n_ids))
                    for _ in range(rng.randrange(5, 60))
                )
                if a != b
            }
        )
        if not edges:
            continue
        split = rng.randrange(n_ids)  # ids >= split are new this publish
        base_e = [(a, b) for a, b in edges if a < split and b < split]
        delta_e = [(a, b) for a, b in edges if a >= split or b >= split]
        full = spark.createDataFrame(edges, "doc_a long, doc_b long")
        want = {
            (r["id"], r["component"])
            for r in dd.connected_components(full).collect()
        }
        base = (
            spark.createDataFrame(base_e, "doc_a long, doc_b long")
            if base_e
            else spark.createDataFrame([], "doc_a long, doc_b long")
        )
        assign = dd.connected_components(base).select(
            F.col("id").alias("doc_id"),
            F.col("component").alias("cluster_id"),
        )
        delta = (
            spark.createDataFrame(delta_e, "doc_a long, doc_b long")
            if delta_e
            else spark.createDataFrame([], "doc_a long, doc_b long")
        )
        got = _assign_set(dd.cluster_delta_refresh(assign, delta))
        assert got == {(i, c) for i, c in want}, (
            f"case {case}: split={split} edges={sorted(edges)}"
        )


def test_neardup_filter_keeps_canonicals(spark, docs):
    pairs = spark.createDataFrame([(1, 2), (2, 3)], "doc_a long, doc_b long")
    kept = dd.neardup_filter(docs, pairs)
    assert {r["doc_id"] for r in kept.collect()} == {1, 4, 5}
    clusters = {
        (r["doc_id"], r["cluster_id"])
        for r in dd.neardup_clusters(docs, pairs).collect()
    }
    assert clusters == {(1, 1), (2, 1), (3, 1)}


def test_connected_components_empty(spark):
    pairs = spark.createDataFrame([], "doc_a long, doc_b long")
    assert dd.connected_components(pairs).count() == 0


def _assign_set(df):
    return {(r["doc_id"], r["cluster_id"]) for r in df.collect()}


def test_lm_score_from_index_equals_inline(spark, docs):
    """r14 (VERDICT r13 task 4): the bigram LM scored from the shingle
    index's tf-carrying width-1/2 rows must be ROW-IDENTICAL to the
    inline tokenize-and-score path — same counts (tf in the index ≡
    the inline per-(doc,bigram) combine), same fixed-point tail."""
    from olap_storage_engine_spark.operators.indexes import (
        shingle_rows_from,
    )

    idx = shingle_rows_from(docs, widths=(1, 2))
    got = {
        tuple(r)
        for r in tx.bigram_lm_scores_from_index(idx).collect()
    }
    want = {tuple(r) for r in tx.bigram_lm_scores(docs).collect()}
    assert got == want and len(got) > 0


def test_lm_score_twins_agree_on_messy_whitespace(spark):
    """r14 review: the inline path previously split on a raw single
    space while the index tokenizes trim+\\s+, so the twins agreed
    only on perfectly single-spaced corpora.  Both now share the
    tokens() definition — pin the equality on double-spaced,
    leading/trailing-whitespace text."""
    from olap_storage_engine_spark.operators.indexes import (
        shingle_rows_from,
    )

    rows = [
        Row(doc_id=1, text="  the quick  brown fox  "),
        Row(doc_id=2, text="the quick brown fox"),
        Row(doc_id=3, text="one"),  # no bigram -> drops out
    ]
    docs = spark.createDataFrame(rows)
    idx = shingle_rows_from(docs, widths=(1, 2))
    got = {tuple(r) for r in tx.bigram_lm_scores_from_index(idx).collect()}
    want = {tuple(r) for r in tx.bigram_lm_scores(docs).collect()}
    assert got == want
    # docs 1 and 2 tokenize identically -> identical scores
    by_id = {t[0]: t[1:] for t in want}
    assert by_id[1] == by_id[2]
    assert 3 not in by_id


def test_standard_probe_rows_match_dataframe_definition(spark):
    """The pyarrow-read probe artifact and the DataFrame definition
    (similarity.standard_probes) cannot share code — this pin IS the
    shared definition: same ids, same vectors, same order."""
    from olap_storage_engine_spark.fixtures import standard_probe_rows
    from olap_storage_engine_spark.sources.testdata import load_table

    sf_dir = "/root/testdata/sf0.001"
    got = standard_probe_rows(spark, sf_dir)
    want = sorted(
        (r["vec_id"], list(r["embedding"]))
        for r in sim.standard_probes(
            load_table(spark, sf_dir, "embeddings")
        ).collect()
    )
    assert [(v, list(e)) for v, e in got] == want
    assert len(got) == 5


def test_bm25_from_index_equals_inline(spark, docs):
    """r14: BM25 served from the tf-carrying width-1 index rows must
    rank identically to the inline tokenize path — same tf/dl/df/
    stats, same Lucene idf, same 4dp rounding."""
    from olap_storage_engine_spark.operators.indexes import (
        shingle_rows_from,
    )

    idx = shingle_rows_from(docs, widths=(1,))
    terms = ["the", "hund", "fox"]
    got = [
        tuple(r)
        for r in tx.bm25_rank_from_index(idx, terms).collect()
    ]
    want = [tuple(r) for r in tx.bm25_rank(docs, terms).collect()]
    assert got == want and len(got) > 0


def test_shingle_tf_counts_occurrences(spark):
    """tf rows keep the distinct-gram grain but carry real occurrence
    counts; sz stays the distinct count."""
    rows = [Row(doc_id=1, text="a b a b a")]
    out = {
        r["shingle"]: (r["m"], r["sz"])
        for r in dd.shingle_tf(spark.createDataFrame(rows), n=1).collect()
    }
    assert out == {"a": (3, 2), "b": (2, 2)}
    out2 = {
        r["shingle"]: r["m"]
        for r in dd.shingle_tf(spark.createDataFrame(rows), n=2).collect()
    }
    assert out2 == {"a b": (2), "b a": (2)}


def test_cluster_delta_refresh_merges_clusters(spark):
    """The interesting refresh case (r14): a NEW doc bridging two
    existing clusters must union them, transitively, and the merged
    cluster_id must stay the global minimum member id."""
    # existing table: cluster {1,2} and cluster {5,6}, singleton-free
    assign = spark.createDataFrame(
        [(1, 1), (2, 1), (5, 5), (6, 5)], "doc_id long, cluster_id long"
    )
    # new doc 9 pairs with a member of EACH cluster -> one cluster
    delta = spark.createDataFrame(
        [(2, 9), (9, 6)], "doc_a long, doc_b long"
    )
    got = _assign_set(dd.cluster_delta_refresh(assign, delta))
    assert got == {(1, 1), (2, 1), (5, 1), (6, 1), (9, 1)}


def test_cluster_delta_refresh_new_and_untouched(spark):
    """New-doc-only pairs append; untouched clusters pass through
    byte-identical; an old doc first clustered by this delta joins
    with the right canonical."""
    assign = spark.createDataFrame(
        [(1, 1), (2, 1)], "doc_id long, cluster_id long"
    )
    # 10-11 is a brand-new cluster; 7 is an OLD doc never clustered
    # before (absent from assign) now pairing with new doc 12
    delta = spark.createDataFrame(
        [(10, 11), (7, 12)], "doc_a long, doc_b long"
    )
    got = _assign_set(dd.cluster_delta_refresh(assign, delta))
    assert got == {(1, 1), (2, 1), (10, 10), (11, 10), (7, 7), (12, 7)}


def test_cluster_delta_refresh_equals_rebuild(spark, docs):
    """The standing index invariant applied to the cluster table:
    publish the corpus in two batches, refresh for the second batch's
    delta pairs, and the result must equal a from-scratch rebuild
    over the full corpus (same invariant indexes.py pins for
    postings/cells/signatures)."""
    full_pairs = dd.minhash_candidates(docs)
    old_docs = docs.filter(F.col("doc_id") <= 2)
    old_pairs = dd.minhash_candidates(old_docs)
    # an append-only publish introduces exactly the pairs with >= 1
    # new side: banding is per-doc, so old-old pairs are unchanged
    delta_pairs = full_pairs.exceptAll(old_pairs)
    base = dd.connected_components(old_pairs).select(
        F.col("id").alias("doc_id"), F.col("component").alias("cluster_id")
    )
    refreshed = dd.cluster_delta_refresh(base, delta_pairs)
    rebuilt = dd.connected_components(full_pairs).select(
        F.col("id").alias("doc_id"), F.col("component").alias("cluster_id")
    )
    assert _assign_set(refreshed) == _assign_set(rebuilt)
    assert refreshed.count() > 0  # the fixture has near-dups


def test_train_ivf_centroids_deterministic(spark, embeddings):
    df, _ = embeddings
    c1 = sim.train_ivf_centroids(df, n_centroids=4, sample_mod=2).collect()
    c2 = sim.train_ivf_centroids(df, n_centroids=4, sample_mod=2).collect()
    assert sorted((r["cent_id"], tuple(r["cent_vec"])) for r in c1) == sorted(
        (r["cent_id"], tuple(r["cent_vec"])) for r in c2
    )
    assert 0 < len(c1) <= 4
    assert all(len(r["cent_vec"]) == 64 for r in c1)


def test_ivf_trained_recall_vs_brute(spark, embeddings):
    df, _ = embeddings
    probes = df.filter("vec_id < 2")
    brute = {
        (r["probe_id"], r["vec_id"])
        for r in sim.brute_topk(df, probes, k=3).collect()
    }
    ivf = {
        (r["probe_id"], r["vec_id"])
        for r in sim.ivf_topk(
            df, probes, k=3, n_centroids=4, n_probe=4, sample_mod=2
        ).collect()
    }
    # n_probe == n_centroids scores every cell -> exact results
    assert ivf == brute


def test_chunk_documents_overlap_and_tail(spark):
    from olap_storage_engine_spark.operators.text import chunk_documents

    docs = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(10))), (2, "one two")],
        "doc_id long, text string",
    )
    ch = {
        (r["doc_id"], r["chunk_id"]): (r["chunk_text"], r["n_tokens"])
        for r in chunk_documents(docs, chunk_tokens=4, stride=3).collect()
    }
    # doc 1: starts 1,4,7,10 -> chunks of 4,4,4,1 tokens w/ 1-token overlap
    assert ch[(1, 0)] == ("t0 t1 t2 t3", 4)
    assert ch[(1, 1)] == ("t3 t4 t5 t6", 4)
    assert ch[(1, 3)] == ("t9", 1)
    # short doc: one partial chunk
    assert ch[(2, 0)] == ("one two", 2)
    assert len(ch) == 5


def test_pack_token_bins_budget(spark):
    from olap_storage_engine_spark.operators.text import pack_token_bins

    rows = [(i, "en", 1000) for i in range(1, 7)]  # 6 docs x 1000 tokens
    df = spark.createDataFrame(rows, "doc_id long, lang string, ws_tokens int")
    out = {r["doc_id"]: r["bin"] for r in pack_token_bins(df, 2048).collect()}
    # cumulative-before: 0,1000,2000,3000,4000,5000 -> bins 0,0,0,1,1,2
    assert out == {1: 0, 2: 0, 3: 0, 4: 1, 5: 1, 6: 2}


def test_hash_split_deterministic_and_complete(spark):
    from olap_storage_engine_spark.operators.text import hash_split

    docs = spark.createDataFrame(
        [(i, "x") for i in range(200)], "doc_id long, text string"
    )
    a = {r["doc_id"]: r["split"] for r in hash_split(docs).collect()}
    b = {r["doc_id"]: r["split"] for r in hash_split(docs).collect()}
    assert a == b and set(a.values()) == {"train", "val"}
    assert 150 < sum(v == "train" for v in a.values()) < 200


def test_enrich_matches_composed_operators(spark, docs):
    from olap_storage_engine_spark.operators.text import (
        enrich,
        language_id,
        quality_score,
    )

    fused = enrich(docs)
    composed = language_id(quality_score(docs))
    cols = ["doc_id", "n_tokens", "n_punct", "n_stopwords",
            "mean_token_len", "quality", "pred_lang"]
    assert sorted(map(tuple, fused.select(cols).collect())) == sorted(
        map(tuple, composed.select(cols).collect())
    )


def test_bm25_matches_oracle_and_ranks_sanely(spark):
    import __spark_entry__ as e
    from tools.compare import compare_query

    r = compare_query(
        spark, "text_bm25", "/root/testdata/sf0.001",
        e.queries(), e.oracle_sql(),
    )
    assert r["status"] == "OK", r
    from olap_storage_engine_spark.operators.text import bm25_rank
    from olap_storage_engine_spark.sources.testdata import load_table
    from pyspark.sql import functions as F

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    top = bm25_rank(docs, ["vector"], top_k=5).collect()
    assert len(top) > 0 and all(t["score"] > 0 for t in top)
    # every retrieved doc must actually contain the query term
    ids = [t["doc_id"] for t in top]
    hits = (
        docs.filter(F.col("doc_id").isin(ids))
        .filter(F.col("text").contains("vector"))
        .count()
    )
    assert hits == len(ids)
    # multiset query: a repeated term contributes once PER OCCURRENCE
    # (textbook/Lucene summation), so doubling a single-term query
    # exactly doubles every score
    single = {r["doc_id"]: r["score"] for r in top}
    doubled = {
        r["doc_id"]: r["score"]
        for r in bm25_rank(docs, ["vector", "vector"], top_k=5).collect()
    }
    assert set(doubled) == set(single)
    for d, s in single.items():
        assert abs(doubled[d] - 2 * s) < 2e-4, (d, s, doubled[d])


def test_pq_codes_shape_and_determinism(spark):
    from olap_storage_engine_spark.operators.similarity import (
        pq_encode,
        train_pq_codebooks,
    )
    from olap_storage_engine_spark.sources.testdata import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    cb = train_pq_codebooks(emb)
    assert cb.count() == 4 * 16  # m subspaces x n_codes
    codes = pq_encode(emb, cb)
    rows = codes.limit(5).collect()
    assert all(len(r["codes"]) == 4 for r in rows)
    # deterministic: re-encoding yields identical codes
    again = {r["vec_id"]: r["codes"] for r in pq_encode(emb, cb).collect()}
    first = {r["vec_id"]: r["codes"] for r in codes.collect()}
    assert first == again


def test_pq_recall_vs_exact_topk(spark):
    """ADC + exact rescore recall on the fixture corpus.  The fixture
    embeddings are RANDOM (no cluster structure — the hardest case
    for PQ), so the bound asserts the mechanism, not production
    recall: well above the 0.25 a random 50-of-200 candidate set
    would give, and monotone in the candidate budget."""
    from pyspark.sql import functions as F

    from olap_storage_engine_spark.fixtures import pq_index_paths
    from olap_storage_engine_spark.operators.similarity import (
        brute_topk,
        pq_topk,
    )
    from olap_storage_engine_spark.sources.testdata import load_table

    sf = "/root/testdata/sf0.001"
    emb = load_table(spark, sf, "embeddings")
    probes = (
        emb.orderBy("vec_id")
        .limit(5)
        .select(
            F.col("vec_id").alias("probe_id"),
            F.col("embedding").alias("probe_vec"),
        )
    )
    cb_path, codes_path = pq_index_paths(spark, sf)
    approx = pq_topk(
        probes,
        spark.read.parquet(codes_path),
        spark.read.parquet(cb_path),
        emb,
        k=10,
        n_candidates=50,
    )
    exact = brute_topk(emb, emb.orderBy("vec_id").limit(5), k=10)
    a = {(r["probe_id"], r["vec_id"]) for r in approx.collect()}
    e = {(r["probe_id"], r["vec_id"]) for r in exact.collect()}
    recall = len(a & e) / len(e)
    assert recall >= 0.4, recall
    wider = pq_topk(
        probes,
        spark.read.parquet(codes_path),
        spark.read.parquet(cb_path),
        emb,
        k=10,
        n_candidates=150,
    )
    aw = {(r["probe_id"], r["vec_id"]) for r in wider.collect()}
    recall_wide = len(aw & e) / len(e)
    assert recall_wide >= recall, (recall, recall_wide)
    assert recall_wide >= 0.7, recall_wide


def test_ngram_indexed_equals_inline(spark):
    """The persisted-shingle-index serving path returns exactly the
    inline path's pairs."""
    from olap_storage_engine_spark.fixtures import shingle_index_path
    from olap_storage_engine_spark.operators.dedup import (
        ngram_jaccard_pairs,
        ngram_pairs_from_index,
    )
    from olap_storage_engine_spark.sources.testdata import load_table

    sf = "/root/testdata/sf0.001"
    inline = ngram_jaccard_pairs(
        load_table(spark, sf, "documents"), n=5, threshold=0.5, max_doc_freq=50
    )
    indexed = ngram_pairs_from_index(
        spark.read.parquet(shingle_index_path(spark, sf))
        .filter(F.col("n") == 5)
        .select("doc_id", "sz", "sh"),
        threshold=0.5,
        max_doc_freq=50,
    )
    a = sorted((r["doc_a"], r["doc_b"], round(r["jaccard"], 9)) for r in inline.collect())
    b = sorted((r["doc_a"], r["doc_b"], round(r["jaccard"], 9)) for r in indexed.collect())
    assert a == b and len(a) > 0


def test_minhash_indexed_equals_inline(spark):
    """MinHash banded LSH served from the persisted shingle index
    returns exactly the inline path's candidate pairs (same n=3
    shingles, same md5-based affine family)."""
    from olap_storage_engine_spark.fixtures import shingle_index_path
    from olap_storage_engine_spark.operators.dedup import (
        minhash_candidates,
        minhash_candidates_from_index,
    )
    from olap_storage_engine_spark.sources.testdata import load_table

    sf = "/root/testdata/sf0.001"
    inline = minhash_candidates(
        load_table(spark, sf, "documents"), num_hashes=8, band_rows=2, n=3
    )
    indexed = minhash_candidates_from_index(
        spark.read.parquet(shingle_index_path(spark, sf))
        .filter(F.col("n") == 3)
        .select("doc_id", "mh"),
        num_hashes=8,
        band_rows=2,
    )
    a = sorted((r["doc_a"], r["doc_b"]) for r in inline.collect())
    b = sorted((r["doc_a"], r["doc_b"]) for r in indexed.collect())
    assert a == b and len(a) > 0
    # the persisted SIGNATURE table (second index layer) agrees too
    from olap_storage_engine_spark.fixtures import minhash_sigs_path
    from olap_storage_engine_spark.operators.dedup import (
        minhash_candidates_from_sigs,
    )

    sigs = spark.read.parquet(minhash_sigs_path(spark, sf))
    c = sorted(
        (r["doc_a"], r["doc_b"])
        for r in minhash_candidates_from_sigs(sigs, 8, 2).collect()
    )
    assert a == c


def test_minhash_verified_drops_false_positives(spark):
    """Verification semantics: every verified pair is an LSH candidate
    with true Jaccard >= threshold; no candidate below threshold
    survives."""
    from olap_storage_engine_spark.fixtures import (
        minhash_sigs_path,
        shingle_index_path,
    )
    from olap_storage_engine_spark.operators.dedup import (
        minhash_candidates_from_sigs,
        minhash_verified_pairs,
    )

    sf = "/root/testdata/sf0.001"
    sigs = spark.read.parquet(minhash_sigs_path(spark, sf))
    idx3 = (
        spark.read.parquet(shingle_index_path(spark, sf))
        .filter(F.col("n") == 3)
        .select("doc_id", "sz", "sh")
    )
    cand = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_candidates_from_sigs(sigs, 8, 2).collect()
    }
    verified = minhash_verified_pairs(sigs, idx3, threshold=0.4).collect()
    assert verified, "expected some verified pairs in the fixture"
    for r in verified:
        assert (r["doc_a"], r["doc_b"]) in cand
        assert r["jaccard"] >= 0.4
    # the threshold actually bites: verifying at 0 keeps MORE pairs
    # than verifying at 0.4 (i.e. some candidates are false positives
    # at 0.4)
    all_scored = minhash_verified_pairs(sigs, idx3, threshold=0.0).count()
    assert all_scored >= len(verified)


def test_repetition_stats_golden(spark):
    rows = [
        Row(doc_id=1, text="a a a a"),          # one token repeated 4x
        Row(doc_id=2, text="a b c d"),          # all distinct
        Row(doc_id=3, text="a b a b a"),        # alternating
        Row(doc_id=4, text="solo"),             # single token, no 2-grams
    ]
    out = {
        r["doc_id"]: r
        for r in tx.repetition_stats(spark.createDataFrame(rows)).collect()
    }
    r1 = out[1]
    assert r1["n_tokens"] == 4
    assert r1["distinct_ratio"] == 0.25
    assert r1["top_token_frac"] == 1.0
    # 3 bigrams, all "a a" -> 2 of 3 are duplicates
    assert r1["dup_2gram_frac"] == round(1 - 1 / 3, 4)
    r2 = out[2]
    assert r2["distinct_ratio"] == 1.0
    assert r2["top_token_frac"] == 0.25
    assert r2["dup_2gram_frac"] == 0.0
    r3 = out[3]
    assert r3["n_tokens"] == 5
    assert r3["top_token_frac"] == 0.6  # 'a' appears 3/5
    # bigrams: ab ba ab ba -> 2 distinct of 4
    assert r3["dup_2gram_frac"] == 0.5
    r4 = out[4]
    assert r4["n_tokens"] == 1
    assert r4["dup_2gram_frac"] == 0.0


def test_repetition_stats_zero_exchanges(spark, docs):
    plan = tx.repetition_stats(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # fully row-local map pass


def test_duplicated_span_stats_golden(spark):
    from olap_storage_engine_spark.operators.indexes import shingle_rows_from

    rows = [
        # docs 1 and 2 share the 5-gram "b c d e f"; doc 3 is disjoint
        Row(doc_id=1, text="a b c d e f"),
        Row(doc_id=2, text="b c d e f g"),
        Row(doc_id=3, text="q r s t u v"),
    ]
    idx = shingle_rows_from(
        spark.createDataFrame(rows), widths=(5,)
    ).select("doc_id", "sz", "sh")
    out = {
        r["doc_id"]: r for r in dd.duplicated_span_stats(idx).collect()
    }
    assert out[1]["n_spans"] == 2 and out[1]["dup_spans"] == 1
    assert out[1]["dup_frac"] == 0.5
    assert out[2]["n_spans"] == 2 and out[2]["dup_spans"] == 1
    assert out[3]["n_spans"] == 2 and out[3]["dup_spans"] == 0
    assert out[3]["dup_frac"] == 0.0


def test_semantic_dedup_within_cell_only(spark):
    # two tight clusters along different axes; near-dup pairs exist
    # only within a cluster
    def vec(axis, eps, dim=8):
        v = [0.0] * dim
        v[axis] = 1.0
        v[(axis + 1) % dim] = eps
        return v

    emb = spark.createDataFrame(
        [
            Row(vec_id=0, embedding=vec(0, 0.0)),
            Row(vec_id=1, embedding=vec(0, 0.1)),
            Row(vec_id=2, embedding=vec(3, 0.0)),
            Row(vec_id=3, embedding=vec(3, 0.1)),
        ]
    )
    cents = spark.createDataFrame(
        [
            Row(cent_id=0, cent_vec=vec(0, 0.05)),
            Row(cent_id=1, cent_vec=vec(3, 0.05)),
        ]
    )
    pairs = dd.semantic_dedup_pairs(emb, cents, threshold=0.9).collect()
    got = {(r["vec_a"], r["vec_b"]) for r in pairs}
    assert got == {(0, 1), (2, 3)}  # never cross-cluster
    for r in pairs:
        assert r["cosine"] > 0.99


def test_semantic_dedup_broadcasts_centroids(spark):
    emb = spark.createDataFrame(
        [Row(vec_id=i, embedding=[float(i), 1.0]) for i in range(10)]
    )
    cents = spark.createDataFrame(
        [Row(cent_id=0, cent_vec=[1.0, 0.0]), Row(cent_id=1, cent_vec=[0.0, 1.0])]
    )
    plan = (
        dd.semantic_dedup_pairs(emb, cents, threshold=0.0)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # assignment is a broadcast argmax -- the corpus never shuffles
    # for cell assignment (the only exchange keys the in-cell join)
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_simhash_candidates_from_fps_hamming(spark, docs):
    fps = dd.simhash(docs, bits=32)
    pairs = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in dd.simhash_candidates_from_fps(
            fps, bits=32, band_bits=8
        ).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] == 0  # exact dups collide
    fp = {r["doc_id"]: r["simhash"] for r in fps.collect()}
    for (a, b), h in pairs.items():
        assert h == bin(fp[a] ^ fp[b]).count("1")  # exact distance


def test_quality_filter_priority_order(spark):
    rows = [
        # short AND repetitive -> too_short wins (priority)
        Row(doc_id=1, text="a a a", lang="en"),
        # long enough, repetitive
        Row(doc_id=2, text=" ".join(["the"] * 25), lang="en"),
        # clean english doc labeled 'de' -> lang_mismatch
        Row(doc_id=3, text=" ".join(f"w{i} the and of to a in is it x{i}" for i in range(3)), lang="de"),
        # clean english doc labeled 'en' -> kept
        Row(doc_id=4, text=" ".join(f"w{i} the and of to a in is it x{i}" for i in range(3)), lang="en"),
    ]
    out = {
        r["doc_id"]: r
        for r in tx.quality_filter(spark.createDataFrame(rows)).collect()
    }
    assert out[1]["reason"] == "too_short" and not out[1]["keep"]
    assert out[2]["reason"] == "repetitive"
    assert out[3]["reason"] == "lang_mismatch"
    assert out[4]["reason"] == "kept" and out[4]["keep"]


def test_token_budget_select_matches_global_window(spark):
    from pyspark.sql import Window

    docs = spark.createDataFrame(
        [
            Row(
                doc_id=i,
                text=" ".join(f"tok{j}" for j in range(5 + (i * 7) % 40)),
                lang="en",
            )
            for i in range(40)
        ]
    )
    for budget in (0, 1, 100, 350, 10**6):
        got = {
            r["doc_id"]
            for r in tx.token_budget_select(docs, budget).collect()
        }
        scored = tx.quality_score(docs).select("doc_id", "n_tokens", "quality")
        w = Window.orderBy(F.col("quality").desc(), F.col("doc_id")).rowsBetween(
            Window.unboundedPreceding, -1
        )
        want = {
            r["doc_id"]
            for r in scored.withColumn(
                "b", F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
            )
            .filter(F.col("b") < budget)
            .collect()
        }
        assert got == want, budget


def test_repetition_stats_property_vs_counter(spark):
    """The sorted-array run-length fold must equal a plain Counter on
    arbitrary token multisets (seeded random corpus over a colliding
    vocab — 'a b'+'a' vs 'a'+'b a' style gram boundaries included)."""
    import collections
    import random

    rng = random.Random(7)
    vocab = ["a", "b", "ab", "ba", "x"]
    docs = []
    for i in range(60):
        k = rng.randint(1, 30)
        docs.append(
            Row(doc_id=i, text=" ".join(rng.choice(vocab) for _ in range(k)))
        )
    out = {
        r["doc_id"]: r
        for r in tx.repetition_stats(spark.createDataFrame(docs)).collect()
    }
    for d in docs:
        toks = d.text.split()
        c = collections.Counter(toks)
        grams = [
            " ".join(toks[i : i + 2]) for i in range(len(toks) - 1)
        ]
        r = out[d.doc_id]
        assert r["n_tokens"] == len(toks)
        assert r["distinct_ratio"] == round(len(c) / len(toks), 4)
        assert r["top_token_frac"] == round(max(c.values()) / len(toks), 4)
        want_dup = (
            round(1 - len(set(grams)) / len(grams), 4) if grams else 0.0
        )
        assert r["dup_2gram_frac"] == want_dup


def test_string_similarity_join_golden(spark):
    rows = [
        Row(pid=1, name="red widget"),
        Row(pid=2, name="red widgets"),   # dist 1
        Row(pid=3, name="blue widget"),   # dist 2-3 from 1 depending
        Row(pid=4, name="zzz qqq xxx"),   # far from everything
    ]
    df = spark.createDataFrame(rows)
    out = {
        (r["id_a"], r["id_b"]): r["dist"]
        for r in tx.string_similarity_join(
            df, "name", "pid", max_dist=2
        ).collect()
    }
    assert out[(1, 2)] == 1
    assert (1, 4) not in out and (2, 4) not in out
    # every emitted pair respects the bound and real distances
    import difflib

    def lev(a, b):
        # simple DP check
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(
                    dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb)
                )
        return dp[len(b)]

    names = {r.pid: r.name for r in rows}
    for (ia, ib), d in out.items():
        assert d == lev(names[ia], names[ib]) and d <= 2


def test_simhash_null_text_propagates_null(spark):
    """NULL-text docs must keep a NULL fingerprint (ADVICE r6): the
    Arrow vote kernel mapped a NULL token-hash array to fingerprint 0,
    silently landing null docs in the simhash=0 collision group —
    the pure-codegen fold it replaced propagated NULL."""
    rows = [
        Row(doc_id=1, text="the quick brown fox"),
        Row(doc_id=2, text=None),
        Row(doc_id=3, text="the quick brown fox"),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string"
    )
    fp = {r["doc_id"]: r["simhash"] for r in dd.simhash(df, bits=32).collect()}
    assert fp[2] is None
    assert fp[1] is not None and fp[1] == fp[3]


def test_semantic_dedup_cell_cap_subbuckets_skewed_cell(spark):
    """Skew backstop (VERDICT r6 #5): a cell over max_cell_size is
    sub-bucketed by the deterministic sign-LSH key, so the in-cell
    pair count is bounded by the sub-bucket sizes, never the full
    O(cell^2); cells under the cap keep the exact search."""
    import random

    rng = random.Random(7)
    dim = 8
    # one pathological cell: 40 spread-out vectors that all argmax to
    # the single centroid; plus a small well-behaved second cell
    rows = [
        Row(
            vec_id=i,
            embedding=[1.0] + [rng.uniform(-1.0, 1.0) for _ in range(dim - 1)],
        )
        for i in range(40)
    ]
    rows += [
        Row(vec_id=100 + i, embedding=[-1.0] + [0.1 * i] * (dim - 1))
        for i in range(3)
    ]
    emb = spark.createDataFrame(rows)
    cents = spark.createDataFrame(
        [
            Row(cent_id=0, cent_vec=[1.0] + [0.0] * (dim - 1)),
            Row(cent_id=1, cent_vec=[-1.0] + [0.0] * (dim - 1)),
        ]
    )
    # threshold=-1 accepts every scored pair, so the output IS the
    # candidate set — exactly what the cap must bound
    exact = dd.semantic_dedup_pairs(
        emb, cents, threshold=-1.0, max_cell_size=None, dim=dim
    )
    capped = dd.semantic_dedup_pairs(
        emb, cents, threshold=-1.0, max_cell_size=10, dim=dim
    )
    n_exact = exact.count()
    assert n_exact == 40 * 39 // 2 + 3  # full quadratic + small cell
    from pyspark.sql import functions as F

    n_capped = capped.count()
    # bounded: the hot cell's pairs come from sign-LSH sub-buckets,
    # strictly fewer than the quadratic count; the small cell (under
    # the cap) keeps its exact 3 pairs
    hot = capped.filter(F.col("cent_id") == 0).count()
    small = capped.filter(F.col("cent_id") == 1).count()
    assert small == 3
    assert 0 < hot < 40 * 39 // 2
    assert n_capped == hot + small
    # determinism: same inputs, same candidate set
    assert n_capped == dd.semantic_dedup_pairs(
        emb, cents, threshold=-1.0, max_cell_size=10, dim=dim
    ).count()


def test_train_ivf_centroids_derives_k_from_corpus(spark):
    """n_centroids=None derives max(16, isqrt(N)) at train time."""
    from olap_storage_engine_spark.operators.similarity import (
        derived_n_centroids,
        train_ivf_centroids,
    )

    assert derived_n_centroids(500) == 22
    assert derived_n_centroids(2000) == 44
    assert derived_n_centroids(10) == 16  # floor
    emb = spark.createDataFrame(
        [
            Row(vec_id=i, embedding=[float((i * 7 + j) % 5) for j in range(4)])
            for i in range(400)
        ]
    )
    cents = train_ivf_centroids(emb, vec_col="embedding")
    # isqrt(400)=20 init centroids; losers may drop out (inner-join
    # semantics) but the trained set can never exceed the derived k
    n = cents.count()
    assert 1 <= n <= 20


def test_decontaminate_drops_overlapping_docs(spark):
    """Any doc sharing a single word n-gram with the benchmark set is
    dropped; docs with no overlap (or too short for an n-gram)
    survive."""
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="alpha beta gamma delta epsilon zeta"),
            Row(doc_id=2, text="one two three four five six seven"),
            # shares 'three four five six seven' tail with doc 2 but
            # doc 2 is not benchmark — both survive unless bench hits
            Row(doc_id=3, text="zero two three four five six seven"),
            Row(doc_id=4, text="alpha beta gamma delta epsilon other"),
            Row(doc_id=5, text="short text"),  # < n tokens: survives
        ]
    )
    bench = docs.filter(F.col("doc_id") == 1)
    kept = {r["doc_id"] for r in dd.decontaminate(docs, bench, n=5).collect()}
    # doc 1 = bench itself (drops); doc 4 shares 'alpha beta gamma
    # delta epsilon' (drops); 2, 3, 5 survive
    assert kept == {2, 3, 5}
    # index-served path produces the identical keep-set
    from olap_storage_engine_spark.operators.indexes import (
        shingle_rows_from,
    )

    idx = shingle_rows_from(docs, widths=(3, 5))
    kept2 = {
        r["doc_id"]
        for r in dd.decontaminate_from_index(docs, idx, bench, n=5).collect()
    }
    assert kept2 == kept


def test_pii_scrub_patterns_and_order(spark):
    from olap_storage_engine_spark.operators import text as tx

    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="mail bob99@site.org and 10.0.0.1 ok"),
            Row(doc_id=2, text="card 4000123412341234 twice 9876543210"),
            Row(doc_id=3, text="nothing to redact here"),
            # email local part is digit-heavy: must scrub as ONE email,
            # not leave a <NUM> fragment
            Row(doc_id=4, text="x 123456789012@mail.com y"),
        ]
    )
    out = {r["doc_id"]: r for r in tx.pii_scrub(docs).collect()}
    assert out[1]["text"] == "mail <EMAIL> and <IP> ok"
    assert (out[1]["n_email"], out[1]["n_ipv4"], out[1]["n_longnum"]) == (1, 1, 0)
    assert out[2]["text"] == "card <NUM> twice <NUM>"
    assert out[2]["n_redactions"] == 2
    assert out[3]["text"] == "nothing to redact here"
    assert out[3]["n_redactions"] == 0
    assert out[4]["text"] == "x <EMAIL> y"
    assert (out[4]["n_email"], out[4]["n_longnum"]) == (1, 0)


def test_mixture_sample_balances_and_is_deterministic(spark):
    from olap_storage_engine_spark.operators import text as tx

    rows = [
        Row(doc_id=i, source="big" if i < 800 else "small")
        for i in range(1000)
    ]
    docs = spark.createDataFrame(rows)
    summ = {
        r["source"]: r
        for r in tx.mixture_summary(docs, source_col="source").collect()
    }
    # small source (200 docs < uniform 500): keep everything
    assert summ["small"]["n_kept"] == summ["small"]["n_docs"] == 200
    # big source: rate = 1000/(2*800) = 0.625 — kept close to 500
    big = summ["big"]
    assert big["n_docs"] == 800
    assert 400 < big["n_kept"] < 600
    # deterministic: identical result on re-run
    again = {
        r["source"]: r["n_kept"]
        for r in tx.mixture_summary(docs, source_col="source").collect()
    }
    assert again == {s: r["n_kept"] for s, r in summ.items()}


def test_mixture_sample_null_group_excluded(spark):
    """NULL-group docs are excluded from the counts, the thresholds,
    and the output — matching SQL count(DISTINCT)/equi-join semantics
    so the oracle can't diverge (r7 review finding); and the threshold
    frame keeps the group column's type (here: int, not the old
    hardcoded string)."""
    from olap_storage_engine_spark.operators import text as tx

    rows = [Row(doc_id=i, grp=(i % 2) if i < 40 else None) for i in range(50)]
    docs = spark.createDataFrame(rows, "doc_id long, grp int")
    kept = tx.mixture_sample(docs, source_col="grp")
    got = kept.select("grp").distinct().collect()
    assert None not in {r["grp"] for r in got}
    summ = {r["grp"]: r for r in tx.mixture_summary(docs, source_col="grp").collect()}
    # 2 non-null groups of 20 each, total 40 -> uniform: keep all
    assert set(summ) == {0, 1}
    assert all(r["n_docs"] == 20 and r["n_kept"] == 20 for r in summ.values())


def test_decontaminate_invariants(spark):
    """Structural invariants: the keep-set is a subset of the corpus;
    any benchmark doc with at least one n-gram drops itself; docs too
    short for an n-gram always survive; an empty benchmark set keeps
    everything."""
    rows = [
        Row(doc_id=i, text=" ".join(f"w{i}x{j}" for j in range(8)))
        for i in range(20)
    ] + [Row(doc_id=100, text="tiny")]
    docs = spark.createDataFrame(rows)
    bench = docs.filter(F.col("doc_id") % 7 == 0)
    kept = dd.decontaminate(docs, bench, n=5)
    kept_ids = {r["doc_id"] for r in kept.collect()}
    all_ids = {r["doc_id"] for r in docs.collect()}
    assert kept_ids <= all_ids
    # every long-enough bench doc is self-contaminated
    bench_long = {r["doc_id"] for r in bench.collect() if len(r["text"].split()) >= 5}
    assert kept_ids.isdisjoint(bench_long)
    # the too-short doc survives regardless
    assert 100 in kept_ids
    empty_bench = docs.filter(F.lit(False))
    assert dd.decontaminate(docs, empty_bench, n=5).count() == docs.count()


def test_pii_scrub_idempotent(spark):
    """Scrubbing already-scrubbed text is a no-op: the placeholders
    contain nothing the patterns match, so pii_scrub(pii_scrub(x))
    changes neither the text nor the counts-of-zero."""
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="a bob@x.org b 10.1.2.3 c 123456789012"),
            Row(doc_id=2, text="plain text"),
        ]
    )
    once = tx.pii_scrub(docs).select("doc_id", "text")
    twice = tx.pii_scrub(once)
    for r in twice.collect():
        assert r["n_redactions"] == 0
    assert sorted(map(tuple, once.collect())) == sorted(
        map(tuple, twice.select("doc_id", "text").collect())
    )


def test_decontamination_report_counts(spark):
    """The audit report counts exactly the corpus docs / distinct grams
    sharing an n-gram with each bench doc."""
    mk = lambda i, words: Row(doc_id=i, text=" ".join(words))
    common = [f"c{j}" for j in range(5)]  # one shared 5-gram
    rows = [
        mk(0, common + ["b0"]),            # bench doc (2 grams: c0..c4, c1..b0)
        mk(1, common + ["x1"]),            # leaks gram c0..c4
        mk(2, common + ["x2"]),            # leaks gram c0..c4
        mk(3, [f"u3{j}" for j in range(6)]),  # clean
    ]
    docs = spark.createDataFrame(rows)
    grams = dd.shingles(docs.filter(F.col("doc_id") > 0), n=5).select(
        "doc_id", F.xxhash64("shingle").alias("sh")
    )
    rep = dd.decontamination_report(
        grams, docs.filter(F.col("doc_id") == 0), n=5
    ).collect()
    assert len(rep) == 1
    r = rep[0]
    assert r["bench_id"] == 0
    assert r["n_contaminated_docs"] == 2
    assert r["n_shared_grams"] == 1


def test_gram_novelty_properties(spark):
    """First occurrence owns the gram: the lowest-id doc of a clone
    pair has novelty 1.0, the clone 0.0; unique docs are fully novel;
    totals: sum(n_novel) == number of distinct grams in the corpus."""
    words = [f"w{j}" for j in range(10)]
    rows = [
        Row(doc_id=1, text=" ".join(words)),
        Row(doc_id=2, text=" ".join(words)),  # exact clone of 1
        Row(doc_id=3, text=" ".join(f"z{j}" for j in range(10))),
    ]
    docs = spark.createDataFrame(rows)
    grams = dd.shingles(docs, n=5).select(
        "doc_id", F.xxhash64("shingle").alias("sh")
    )
    nov = {r["doc_id"]: r for r in dd.gram_novelty(grams).collect()}
    assert nov[1]["novelty"] == 1.0 and nov[2]["novelty"] == 0.0
    assert nov[3]["novelty"] == 1.0
    n_distinct = grams.select("sh").distinct().count()
    assert sum(r["n_novel"] for r in nov.values()) == n_distinct


def test_embedding_diversity_matches_bruteforce(spark):
    """The ||sum u||^2 identity equals the literal mean over all
    pairwise cosines (computed brute-force in numpy)."""
    import itertools

    import numpy as np

    rng = np.random.RandomState(7)
    rows, expect = [], {}
    for label, n in [(0, 5), (1, 3)]:
        vecs = rng.randn(n, 8).astype("float32")
        for i, v in enumerate(vecs):
            rows.append(
                Row(vec_id=label * 100 + i, label=label,
                    embedding=[float(x) for x in v])
            )
        u = vecs.astype("float64")
        u = u / np.linalg.norm(u, axis=1, keepdims=True)
        cos = [
            float(u[i] @ u[j])
            for i, j in itertools.combinations(range(n), 2)
        ]
        expect[label] = round(sum(cos) * 2 / (n * (n - 1)), 4)
    emb = spark.createDataFrame(rows)
    got = {
        r["label"]: (r["n"], round(r["mean_pair_cos"], 4))
        for r in sim.embedding_diversity(emb).collect()
    }
    assert got == {0: (5, expect[0]), 1: (3, expect[1])}


def test_embedding_diversity_excludes_singletons(spark):
    emb = spark.createDataFrame(
        [Row(vec_id=1, label=9, embedding=[1.0, 0.0])]
    )
    assert sim.embedding_diversity(emb).count() == 0


def test_dsir_select_prefers_target_like_docs(spark):
    """DSIR sanity: documents sharing the target's vocabulary must
    outrank documents that don't; determinism: two runs identical."""
    rows = [
        Row(
            doc_id=i,
            text=" ".join(
                (["spark", "sql"] if i % 3 == 0 else ["rust", "engine"])
                * 4
                + [f"u{i}"]
            ),
        )
        for i in range(30)
    ]
    docs = spark.createDataFrame(rows)
    target = docs.filter(F.col("doc_id") % 3 == 0)
    out = tx.dsir_select(docs, target, k=12)
    got = sorted(
        (r["rank"], r["doc_id"]) for r in out.collect()
    )
    # the ten target-like docs fill the top ten ranks
    assert all(d % 3 == 0 for _, d in got[:10])
    assert got == sorted((r["rank"], r["doc_id"]) for r in out.collect())


def test_dsir_scores_are_likelihood_ratios(spark):
    """Hand-checkable two-doc corpus: the doc containing the target's
    gram scores strictly higher, and the score matches the closed-form
    add-1 smoothed log ratio."""
    import math

    docs = spark.createDataFrame(
        [Row(doc_id=1, text="aa bb"), Row(doc_id=2, text="cc dd")]
    )
    target = spark.createDataFrame([Row(doc_id=9, text="aa bb")])
    out = {r["doc_id"]: r for r in tx.dsir_select(docs, target, k=2).collect()}
    # vocab: grams of docs∪target = {aa, bb, aa bb, cc, dd, cc dd}? raw
    # vocabulary is built from raw∪target gram sets
    # raw counts: aa:1 bb:1 'aa bb':1 cc:1 dd:1 'cc dd':1  (R=6)
    # tgt counts: aa:1 bb:1 'aa bb':1                      (T=3)
    # V = 6
    lam_hit = math.log(2 / (3 + 6)) - math.log(2 / (6 + 6))
    lam_miss = math.log(1 / (3 + 6)) - math.log(2 / (6 + 6))
    assert abs(out[1]["score"] - round(3 * lam_hit, 6)) < 2e-6
    assert abs(out[2]["score"] - round(3 * lam_miss, 6)) < 2e-6
    assert out[1]["rank"] == 1 and out[2]["rank"] == 2


def test_weighted_sample_deterministic_and_weight_sensitive(spark):
    """A-RES sampling: same input -> identical membership every run
    (no RNG state), and across many disjoint id blocks the heavy rows
    win far more often than light ones (weight sensitivity)."""
    from pyspark.sql import functions as F

    # 40 blocks of 10 rows: in each block one heavy row (w=1000) and
    # nine light rows (w=10). Sample 1 per block by running the global
    # sampler per block via the priority ordering.
    rows = [
        (b * 10 + i, 1000 if i == 0 else 10)
        for b in range(40)
        for i in range(10)
    ]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    got1 = {r["doc_id"] for r in tx.weighted_sample(df, "w", n=60).collect()}
    got2 = {r["doc_id"] for r in tx.weighted_sample(df, "w", n=60).collect()}
    assert got1 == got2  # deterministic
    heavy = {b * 10 for b in range(40)}
    # 40 heavy rows carry 1000/1090 of each block's mass; in a top-60
    # over 400 rows nearly all heavies should appear
    assert len(got1 & heavy) >= 30, len(got1 & heavy)


def test_weighted_sample_plan_is_take_ordered(spark):
    """The sampler must compile to TakeOrderedAndProject — a global
    Sort+Limit would shuffle the corpus at 100 TB."""
    from pyspark.sql import functions as F

    df = spark.range(1000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 7 + 1).alias("w")
    )
    plan = tx.weighted_sample(df, "w", n=5)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan[:500]


def test_int8_quantize_roundtrip_error_bounded(spark):
    """Symmetric int8 quantization: codes bounded, dequantization
    error <= s_d/254 per element (half a quantization step), and the
    integer-stat projection agrees with a numpy reference."""
    import numpy as np

    from olap_storage_engine_spark.operators.similarity import (
        int8_quantize,
        int8_quantize_stats,
    )

    rng = np.random.RandomState(7)
    vecs = rng.randn(50, 16).astype(np.float32)
    vecs[:, 3] = 0.0  # an all-zero dimension must quantize to 0, not NaN
    emb = spark.createDataFrame(
        [(int(i), [float(x) for x in row]) for i, row in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    out = int8_quantize(emb, "embedding").collect()
    scales = np.array(out[0]["scales"])
    # reference in float64: the operator floors at a DOUBLE 1e-30
    ref_scales = np.maximum(
        np.abs(vecs).max(axis=0).astype(np.float64), 1e-30
    )
    assert np.allclose(scales, ref_scales, rtol=0, atol=0)

    by_id = {r["vec_id"]: np.array(r["codes"]) for r in out}
    for i, row in enumerate(vecs):
        codes = by_id[i]
        ref = np.floor(row.astype(np.float64) / ref_scales * 127.0 + 0.5)
        assert (codes == ref.astype(np.int64)).all()
        assert np.abs(codes).max() <= 127
        dequant = codes * ref_scales / 127.0
        assert (np.abs(dequant - row) <= ref_scales / 254.0 + 1e-12).all()
        assert codes[3] == 0

    stats = {
        r["vec_id"]: (r["sum_code"], r["sum_abs_code"], r["max_abs_code"])
        for r in int8_quantize_stats(
            int8_quantize(emb, "embedding")
        ).collect()
    }
    for i in range(50):
        c = by_id[i]
        assert stats[i] == (int(c.sum()), int(np.abs(c).sum()), int(np.abs(c).max()))


def test_int8_topk_matches_integer_reference(spark):
    """int8_topk's ranking equals a numpy integer-dot reference —
    quantized serving is exactly reproducible, not approximately."""
    import numpy as np

    from olap_storage_engine_spark.operators.similarity import (
        int8_quantize,
        int8_topk,
    )

    rng = np.random.RandomState(11)
    vecs = rng.randn(40, 8).astype(np.float32)
    emb = spark.createDataFrame(
        [(int(i), [float(x) for x in row]) for i, row in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    codes = {
        r["vec_id"]: np.array(r["codes"], dtype=np.int64)
        for r in int8_quantize(emb, "embedding").collect()
    }
    got = {}
    for r in int8_topk(emb, [0, 1], k=5).collect():
        got.setdefault(r["probe_id"], []).append(
            (r["rank"], r["vec_id"], r["score"])
        )
    for pid in (0, 1):
        scores = sorted(
            (
                (-int(codes[pid] @ codes[v]), v)
                for v in codes
                if v != pid
            ),
        )[:5]
        want = [
            (rank + 1, v, -neg) for rank, (neg, v) in enumerate(scores)
        ]
        assert sorted(got[pid]) == want


def test_dsir_index_served_equals_inline(spark):
    """DSIR selection served from the shingle index (widths 1/2,
    gram identity (n, sh)) returns exactly the inline tokenize path's
    top-k — counts in hashed-gram space equal counts in string-gram
    space, so scores and ranks agree row for row."""
    from olap_storage_engine_spark.fixtures import shingle_index_path
    from olap_storage_engine_spark.operators.text import (
        dsir_select,
        dsir_select_from_grams,
    )
    from olap_storage_engine_spark.sources.testdata import load_table

    sf = "/root/testdata/sf0.001"
    docs = load_table(spark, sf, "documents")
    tgt = docs.filter(F.col("doc_id") % 97 == 0)
    inline = dsir_select(docs, tgt, k=50)
    idx = spark.read.parquet(shingle_index_path(spark, sf))
    raw_g = idx.filter(F.col("n") <= 2).select("doc_id", "n", "sh")
    served = dsir_select_from_grams(
        raw_g,
        raw_g.filter(F.col("doc_id") % 97 == 0),
        k=50,
        gram_cols=("n", "sh"),
    )
    a = sorted(
        (r["doc_id"], r["n_grams"], r["score"], r["rank"])
        for r in inline.collect()
    )
    b = sorted(
        (r["doc_id"], r["n_grams"], r["score"], r["rank"])
        for r in served.collect()
    )
    assert a == b and len(a) == 50


def test_semantic_decontaminate_argmax_and_threshold(spark):
    """Survivors-only gemm kernel semantics: flagged rows carry the
    argmax eval (smallest id on rounded-cosine ties), sub-threshold
    rows never appear, and the threshold cut happens on the ROUNDED
    cosine."""
    from olap_storage_engine_spark.operators.dedup import (
        semantic_decontaminate,
    )

    def row(i, label, vec):
        return (i, vec, label)

    # eval 100 and 200 are the SAME direction -> cosine ties at 1.0;
    # corpus 1 aligns with them, corpus 2 is orthogonal (cos 0),
    # corpus 3 sits at cos ~0.6 of eval 300's direction
    corpus = spark.createDataFrame(
        [
            row(1, "a", [1.0, 0.0, 0.0, 0.0]),
            row(2, "a", [0.0, 0.0, 1.0, 0.0]),
            row(3, "b", [0.6, 0.0, 0.0, 0.8]),
        ],
        "vec_id long, embedding array<double>, label string",
    )
    evalset = spark.createDataFrame(
        [
            row(200, "e", [2.0, 0.0, 0.0, 0.0]),
            row(100, "e", [1.0, 0.0, 0.0, 0.0]),
            row(300, "e", [0.0, 0.0, 0.0, 1.0]),
        ],
        "vec_id long, embedding array<double>, label string",
    )
    got = {
        r["vec_id"]: (r["eval_id"], r["cosine"])
        for r in semantic_decontaminate(
            corpus, evalset, threshold=0.5
        ).collect()
    }
    assert set(got) == {1, 3}  # corpus 2 (cos 0) never appears
    assert got[1] == (100, 1.0)  # tie at 1.0 -> smallest eval id
    assert got[3] == (300, 0.8)


def test_corpus_prep_served_equals_inline(spark):
    """r14 optimization: corpus_prep served from the publish-time
    doc_stats + minhash_sigs artifacts must be ROW-IDENTICAL to the
    cold-corpus inline pipeline (corpus_prep_inline) — same quality
    scores, same exact-dedup keep set, same banded pairs, same
    roll-up.  Also pins the provenance query against an inline
    reconstruction of its original single-plan body."""
    import __spark_entry__ as entrymod

    sf = "/root/testdata/sf0.001"
    qs = entrymod.queries()
    served = {tuple(r) for r in qs["corpus_prep"](spark, sf).collect()}
    inline = {tuple(r) for r in qs["corpus_prep_inline"](spark, sf).collect()}
    assert served == inline and len(served) > 0

    from olap_storage_engine_spark.sources.testdata import load_table

    docs = load_table(spark, sf, "documents")
    enriched = tx.enrich(docs)
    lowq = enriched.filter(F.col("quality") < 0.95).select(
        "doc_id", F.lit("quality_filter").alias("stage")
    )
    corpus = enriched.filter(F.col("quality") >= 0.95)
    keep = dd.sha_dedup(corpus).select(F.col("keep_id").alias("doc_id"))
    ex_victims = corpus.join(keep, "doc_id", "anti").select(
        "doc_id", F.lit("exact_dup").alias("stage")
    )
    ex = corpus.join(keep, "doc_id", "semi")
    pairs = dd.minhash_candidates(ex, num_hashes=8, band_rows=2, n=3)
    cc = dd.connected_components(pairs)
    near = cc.filter(F.col("id") != F.col("component")).select(
        F.col("id").alias("doc_id"), F.lit("near_dup").alias("stage")
    )
    kept = ex.join(near.select("doc_id"), "doc_id", "anti").select(
        "doc_id", F.lit("kept").alias("stage")
    )
    want = {
        tuple(r)
        for r in lowq.unionByName(ex_victims)
        .unionByName(near)
        .unionByName(kept)
        .collect()
    }
    got = {
        tuple(r) for r in qs["corpus_prep_provenance"](spark, sf).collect()
    }
    assert got == want and len(got) > 0
