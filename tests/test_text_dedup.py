"""Text analysis + dedup + similarity operator tests on the documents /
embeddings testdata tables."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from check_datapackage_spark.operators import dedup, similarity, text
from tests.conftest import load


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load(spark, sf_dir, "documents").cache()


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load(spark, sf_dir, "embeddings").cache()


# --- text ------------------------------------------------------------------


def test_ws_token_count_basics(spark):
    df = spark.createDataFrame(
        [("a b  c",), ("",), ("   ",), ("one",), ("x\ty\nz w",)], ["t"]
    )
    got = [r[0] for r in df.select(text.ws_token_count(F.col("t"))).collect()]
    assert got == [3, 0, 0, 1, 4]


def test_regex_token_count(spark):
    df = spark.createDataFrame([("Hello, world! 123",)], ["t"])
    # tokens: Hello , world ! 123 → 5
    assert df.select(text.regex_token_count(F.col("t"))).collect()[0][0] == 5


def test_detect_lang_markers(spark):
    df = spark.createDataFrame(
        [
            ("the cat and the dog is in the house",),
            ("der Hund und die Katze ist nicht da",),
            ("le chat et les chiens dans la maison",),
            ("xyzzy plugh qwert",),
        ],
        ["t"],
    )
    got = [r[0] for r in df.select(text.detect_lang(F.col("t"))).collect()]
    assert got == ["en", "de", "fr", "und"]


def test_quality_score_range(spark, docs):
    rows = docs.limit(200).select(
        text.quality_score(F.col("text")).alias("q")
    ).collect()
    assert all(0.0 <= r["q"] <= 1.0 for r in rows)


def test_n_chars_invariant_against_duckdb(spark, docs, sf_dir):
    """documents.n_chars == length(text) — the per-row invariant analog."""
    con = duckdb.connect()
    exp = con.sql(
        f"SELECT count(*) FROM '{sf_dir}/documents.parquet' WHERE length(text) <> n_chars"
    ).fetchone()[0]
    got = docs.where(F.length("text") != F.col("n_chars")).count()
    assert got == exp


def test_text_profile_runs(spark, docs):
    rows = text.text_profile(docs, by="lang").collect()
    assert len(rows) >= 1
    assert all(r["n_docs"] > 0 for r in rows)


def test_fingerprint_md5_matches_duckdb(spark, docs, sf_dir):
    got = {
        r["doc_id"]: r["fp"]
        for r in docs.limit(50)
        .select("doc_id", text.fingerprint_md5(F.col("text")).alias("fp"))
        .collect()
    }
    con = duckdb.connect()
    exp = dict(
        con.sql(
            f"""SELECT doc_id, md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))
                FROM '{sf_dir}/documents.parquet' LIMIT 50"""
        ).fetchall()
    )
    for k, v in got.items():
        assert exp[k] == v


# --- dedup -----------------------------------------------------------------


@pytest.fixture(scope="module")
def docs_with_dups(spark, docs):
    """Inject exact + near duplicates deterministically."""
    base = docs.limit(200)
    exact = base.limit(5).withColumn("doc_id", F.col("doc_id") + 1000000)
    near = (
        base.limit(5)
        .withColumn("doc_id", F.col("doc_id") + 2000000)
        .withColumn("text", F.concat(F.col("text"), F.lit(" extra tail words here")))
    )
    return base.unionByName(exact).unionByName(near).cache()


def test_exact_dup_groups(spark, docs_with_dups):
    groups = dedup.exact_dup_groups(docs_with_dups).collect()
    dup_ids = {i for g in groups for i in g["doc_ids"]}
    assert sum(g["n_dups"] for g in groups) >= 10
    assert any(i >= 1000000 for i in dup_ids)


def test_exact_dedup_keeps_one_per_group(spark, docs_with_dups):
    before = docs_with_dups.count()
    after = dedup.exact_dedup(docs_with_dups).count()
    groups = dedup.exact_dup_groups(docs_with_dups).collect()
    removed = sum(g["n_dups"] - 1 for g in groups)
    assert after == before - removed


def test_minhash_finds_near_dups(spark, docs_with_dups):
    pairs = dedup.minhash_near_dups(
        docs_with_dups, threshold=0.5, n_hashes=32, bands=16
    ).collect()
    found = {(p["id_a"], p["id_b"]) for p in pairs}
    # each near-dup (orig_id + 2000000) should pair with its original
    near_pairs = {
        (a, b)
        for (a, b) in found
        if b - a == 2000000 or b - a == 1000000
    }
    assert len(near_pairs) >= 8, found
    # jaccard sanity
    assert all(0.0 <= p["jaccard"] <= 1.0 for p in pairs)


def test_simhash_near_dups(spark, docs_with_dups):
    pairs = dedup.simhash_near_dups(docs_with_dups, max_hamming=6).collect()
    found = {(p["id_a"], p["id_b"]) for p in pairs}
    # the 5 planted exact dups must appear (hamming 0)
    base_ids = [r["doc_id"] for r in docs_with_dups.orderBy("doc_id").limit(5).collect()]
    planted = {(a, a + 1000000) for a in base_ids}
    assert planted <= found, (planted, found)
    zero = {(p["id_a"], p["id_b"]) for p in pairs if p["hamming"] == 0}
    assert planted <= zero
    assert all(p["hamming"] <= 6 for p in pairs)


# --- similarity ------------------------------------------------------------


def test_brute_force_topk_self_similarity(spark, emb):
    corpus = emb.limit(500)
    queries = corpus.limit(3)
    res = similarity.brute_force_topk(corpus, queries, k=5).collect()
    by_q = {}
    for r in res:
        by_q.setdefault(r["query_id"], []).append(r)
    assert len(by_q) == 3
    for q, rows in by_q.items():
        assert len(rows) == 5
        assert all(-1.0001 <= r["score"] <= 1.0001 for r in rows)
        ranks = sorted(r["rank"] for r in rows)
        assert ranks == [1, 2, 3, 4, 5]


def test_quantized_topk_deterministic(spark, emb):
    corpus = emb.limit(300)
    queries = corpus.limit(2)
    a = similarity.quantized_topk(corpus, queries, k=3).collect()
    b = similarity.quantized_topk(corpus, queries, k=3).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_lsh_topk_finds_planted_neighbors(spark, emb):
    """LSH's contract: HIGH-similarity pairs collide with near-certainty.
    Queries are tiny perturbations of corpus vectors (cos ≈ 0.9999) —
    every query's true nearest neighbor must be in the LSH top-k."""
    dim = len(emb.select("embedding").first()[0])
    corpus = emb.limit(400).cache()
    queries = corpus.limit(3).select(
        (F.col("vec_id") + 5000).alias("vec_id"),
        F.transform(
            "embedding", lambda x: x + F.lit(0.001)
        ).alias("embedding"),
        "label",
    )
    approx = similarity.lsh_topk(
        corpus, queries, dim=dim, k=5, n_planes=8, n_tables=8
    ).collect()
    got = {(r["query_id"], r["vec_id"]) for r in approx}
    planted = {(q + 5000, q) for q in [0, 1, 2]}
    assert planted <= got, (planted, got)
    # planted neighbor should rank first among candidates
    top1 = {(r["query_id"], r["vec_id"]) for r in approx if r["rank"] == 1}
    assert planted == top1


def test_cosine_near_dups_finds_planted(spark, emb):
    base = emb.limit(200)
    dup = base.limit(4).withColumn("vec_id", F.col("vec_id") + 900000)
    dim = len(emb.select("embedding").first()[0])
    res = similarity.cosine_near_dups(
        base.unionByName(dup), dim=dim, threshold=0.999
    ).collect()
    found = {(r["id_a"], r["id_b"]) for r in res}
    planted = {(a, a + 900000) for a in [r["vec_id"] for r in base.limit(4).collect()]}
    assert planted <= found, (planted, found)


def test_exact_cosine_pairs_ground_truth(spark, emb):
    """exact_cosine_pairs finds planted near-identical pairs and its
    integer membership test matches the float cosine."""
    base = emb.limit(100)
    dup = base.limit(4).withColumn("vec_id", F.col("vec_id") + 900000)
    res = similarity.exact_cosine_pairs(
        base.unionByName(dup), threshold_num=2, threshold_den=5
    ).collect()
    found = {(r["id_a"], r["id_b"]) for r in res}
    planted = {
        (a, a + 900000) for a in [r["vec_id"] for r in base.limit(4).collect()]
    }
    assert planted <= found
    # planted exact copies score 1.0
    scores = {(r["id_a"], r["id_b"]): r["score"] for r in res}
    assert all(scores[p] == 1.0 for p in planted)


def test_ivf_trained_centroids_beat_random_recall(spark, emb):
    """Sampled-k-means centroids must not lose recall vs the random
    fallback at equal n_probe (the reason train_ivf_centroids exists)."""
    corpus = emb.limit(400).cache()
    queries = corpus.limit(5)
    exact = {
        (r["query_id"], r["vec_id"])
        for r in similarity.brute_force_topk(corpus, queries, k=5).collect()
    }

    def recall(train):
        got = {
            (r["query_id"], r["vec_id"])
            for r in similarity.ivf_topk(
                corpus, queries, dim=64, k=5, n_cells=16, n_probe=4,
                train=train,
            ).collect()
        }
        return len(got & exact) / len(exact)

    r_rand, r_trained = recall(False), recall(True)
    assert r_trained >= r_rand - 0.05, (r_rand, r_trained)
    assert r_trained >= 0.5, r_trained


def test_train_ivf_centroids_shape_and_determinism(spark, emb):
    c1 = similarity.train_ivf_centroids(emb.limit(200), dim=64, n_cells=8)
    c2 = similarity.train_ivf_centroids(emb.limit(200), dim=64, n_cells=8)
    assert c1.shape == (64, 8)
    import numpy as np

    assert np.array_equal(c1, c2)
    assert np.allclose(np.linalg.norm(c1, axis=0), 1.0)


# --- cross-doc shingle dup / vocab stats / hashed quality (round 4) --------


def test_cross_doc_shingle_dup_planted(spark):
    df = spark.createDataFrame(
        [
            # docs 1 and 2 share the verbatim run "a b c d e f"
            (1, "a b c d e f unique one tail words here now"),
            (2, "prefix bit a b c d e f other suffix words"),
            (3, "completely different text with no shared runs at all ok"),
        ],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: r
        for r in dedup.cross_doc_shingle_dup(df, k=5).collect()
    }
    # "a b c d e" and "b c d e f" are the shared 5-shingles
    assert out[1]["n_shared"] == 2 and out[2]["n_shared"] == 2
    assert out[3]["n_shared"] == 0
    for r in out.values():
        assert 0.0 <= r["shared_frac"] <= 1.0
        assert r["n_shingles"] >= r["n_shared"]


def test_cross_doc_shingle_dup_self_dup_not_counted(spark):
    # repeats WITHIN one doc must not count as cross-doc sharing
    df = spark.createDataFrame(
        [(1, "x y z w v x y z w v x y z w v"), (2, "totally other words here five")],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in dedup.cross_doc_shingle_dup(df, k=5).collect()}
    assert out[1]["n_shared"] == 0


def test_vocab_stats_exact(spark):
    df = spark.createDataFrame(
        [("s1", "a a b"), ("s1", "b c"), ("s2", "z z z")],
        ["source", "text"],
    )
    out = {r["source"]: r for r in text.vocab_stats(df).collect()}
    assert out["s1"]["n_words"] == 5
    assert out["s1"]["n_distinct"] == 3
    assert out["s1"]["n_hapax"] == 1  # only "c"; a=2, b=2
    assert out["s2"]["n_distinct"] == 1 and out["s2"]["n_hapax"] == 0
    assert abs(out["s1"]["ttr"] - 0.6) < 1e-9


def test_hashed_linear_scores_deterministic_and_integer(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "alpha beta gamma"), (3, "delta")],
        ["doc_id", "text"],
    )
    a = {r["doc_id"]: r for r in text.hashed_linear_scores(df).collect()}
    b = {r["doc_id"]: r for r in text.hashed_linear_scores(df).collect()}
    assert a == b  # deterministic
    assert a[1]["score_sum"] == a[2]["score_sum"]  # content-only
    for r in a.values():
        assert isinstance(r["score_sum"], int)
        assert -1000 * r["n_words"] <= r["score_sum"] <= 1000 * r["n_words"]
        assert r["keep"] == (r["score_sum"] > 0)


def test_hashed_weight_matches_duckdb(spark):
    words = ["alpha", "beta", "gamma", "", "Zebra", "123"]
    df = spark.createDataFrame([(w,) for w in words], ["w"])
    got = {
        r["w"]: r["wt"]
        for r in df.select(
            "w", text.hashed_word_weight(F.col("w")).alias("wt")
        ).collect()
    }
    want = {
        w: duckdb.execute(
            "SELECT CAST(CAST('0x' || substr(md5(?), 1, 8) AS UBIGINT) AS BIGINT)"
            " % 2001 - 1000",
            [w],
        ).fetchone()[0]
        for w in words
    }
    assert got == want


def test_quality_filter_rates_shape(spark, docs):
    out = text.quality_filter_rates(docs).collect()
    assert len(out) > 0
    for r in out:
        assert r["n_keep"] <= r["n_docs"]
        assert 0.0 <= r["keep_rate"] <= 1.0


def test_bigram_stats_hand(spark):
    """bigram_stats: hand-computed pair counts + deterministic
    tie-break (cnt DESC, pair DESC)."""
    from check_datapackage_spark.operators.text import bigram_stats

    rows = [
        ("A", "a b a b a"),   # pairs: a b, b a, a b, b a
        ("A", "x"),           # single word → no pairs
        ("B", "q q  q"),      # normalize squashes: q q, q q
        ("B", ""),            # empty → no pairs
    ]
    df = spark.createDataFrame(rows, "source string, text string")
    out = {r["source"]: r for r in bigram_stats(df, "text", "source").collect()}
    # A: 'a b' x2, 'b a' x2 → tie broken by pair DESC → 'b a'
    assert out["A"]["top_bigram"] == "b a" and out["A"]["top_cnt"] == 2
    assert out["A"]["n_bigrams"] == 4 and out["A"]["n_distinct_bigrams"] == 2
    assert out["B"]["top_bigram"] == "q q" and out["B"]["top_cnt"] == 2
    assert out["B"]["n_bigrams"] == 2 and out["B"]["n_distinct_bigrams"] == 1


def test_bpe_train_merge_sequence(spark):
    from check_datapackage_spark.operators.bpe import bpe_train

    df = spark.createDataFrame(
        [("a b a b c",), ("a b c",)], "text string"
    )
    merges, toks = bpe_train(df, "text", n_merges=5)
    assert merges == [("a", "b", 3), ("a b", "c", 2)]
    out = sorted(tuple(r["toks"]) for r in toks.collect())
    assert out == [("a b", "a b c"), ("a b c",)]


def test_bpe_train_deterministic_and_early_stop(spark):
    from check_datapackage_spark.operators.bpe import bpe_train

    df = spark.createDataFrame(
        [("x y z",), ("p q r",)], "text string"
    )
    # every adjacent pair occurs once < min_count=2 -> no merges
    merges, _ = bpe_train(df, "text", n_merges=3)
    assert merges == []
    df2 = spark.createDataFrame(
        [(f"t{i % 4} t{(i + 1) % 4} mid t{i % 3}",) for i in range(40)],
        "text string",
    )
    m1, _ = bpe_train(df2, "text", n_merges=4)
    m2, _ = bpe_train(df2, "text", n_merges=4)
    assert m1 == m2 and len(m1) == 4


def test_bpe_apply_matches_training_tokenization(spark):
    from check_datapackage_spark.operators.bpe import bpe_apply, bpe_train

    df = spark.createDataFrame(
        [("a b a b c",), ("a b c",), ("c a b",)], "text string"
    )
    merges, trained = bpe_train(df, "text", n_merges=5)
    applied = bpe_apply(df, merges, "text")
    got = sorted(tuple(r["toks"]) for r in applied.collect())
    want = sorted(tuple(r["toks"]) for r in trained.collect())
    assert got == want
    # unseen text uses learned merges where they occur
    new = spark.createDataFrame([("z a b z",)], "text string")
    (row,) = bpe_apply(new, merges, "text").collect()
    assert row["toks"] == ["z", "a b", "z"]


def test_bpe_sample_trained_matches_full_trained(spark):
    """The scale path: sample_n >= corpus reproduces the exact
    distributed merge table bit-for-bit (identical counting and
    tie-break); a PROPER sample still learns the dominant merges."""
    from check_datapackage_spark.operators.bpe import bpe_train

    rows = [(f"a b mid a b t{i % 5} t{(i + 1) % 5}",) for i in range(60)]
    df = spark.createDataFrame(rows, "text string")
    full, _ = bpe_train(df, "text", n_merges=4, sample_n=None)
    sampled, toks = bpe_train(df, "text", n_merges=4, sample_n=10_000)
    assert sampled == full
    # tokenized output is the full corpus, not the sample
    assert toks.count() == 60
    # a real subsample: counts differ but the dominant merge survives
    sub, _ = bpe_train(df, "text", n_merges=1, sample_n=20)
    assert sub and (sub[0][0], sub[0][1]) == (full[0][0], full[0][1])
    # repartition-proof sample order
    sub2, _ = bpe_train(df.repartition(7), "text", n_merges=1, sample_n=20)
    assert sub == sub2


def test_ivf2_recall_at_equal_probe_cost(spark, emb):
    """Two-level IVF must hold recall vs single-level at the SAME
    total cell count and probe budget (r4 verdict #5 done-criterion)."""
    corpus = emb.limit(400).cache()
    queries = corpus.limit(5)
    exact = {
        (r["query_id"], r["vec_id"])
        for r in similarity.brute_force_topk(corpus, queries, k=5).collect()
    }
    one = {
        (r["query_id"], r["vec_id"])
        for r in similarity.ivf_topk(
            corpus, queries, dim=64, k=5, n_cells=16, n_probe=4, train=True
        ).collect()
    }
    two = {
        (r["query_id"], r["vec_id"])
        for r in similarity.ivf2_topk(
            corpus, queries, dim=64, k=5, n_cells1=4, n_cells2=4, n_probe=4
        ).collect()
    }
    r_one = len(one & exact) / len(exact)
    r_two = len(two & exact) / len(exact)
    assert r_two >= r_one - 0.05, (r_one, r_two)
    assert r_two >= 0.5, r_two


def test_ivf2_cells_bounded_by_construction(spark, emb):
    """The composite population must actually SPLIT cells: more
    occupied cells and a smaller max cell than level 1 alone at the
    same level-1 codebook size."""
    corpus = emb.limit(400)
    cents1, cents2 = similarity.train_residual_quantizer(
        corpus, dim=64, n_cells1=4, n_cells2=8
    )
    assert cents1.shape == (64, 4) and cents2.shape == (64, 8)
    one_assign = similarity._ivf_assign_udf(64, 4, 1, centroids=cents1)
    two_assign = similarity._ivf2_corpus_assign_udf(cents1, cents2)
    sizes1 = (
        corpus.select(F.element_at(one_assign(F.col("embedding")), 1).alias("c"))
        .groupBy("c").count().collect()
    )
    sizes2 = (
        corpus.select(two_assign(F.col("embedding")).alias("c"))
        .groupBy("c").count().collect()
    )
    max1 = max(r["count"] for r in sizes1)
    max2 = max(r["count"] for r in sizes2)
    assert len(sizes2) > len(sizes1)
    # a shared residual codebook can leave a tight level-1 cell whole
    # (all its residuals in one residual cell) — never GROW one
    assert max2 <= max1
    # the mean cell shrinks with the occupied-cell count
    assert 400 / len(sizes2) < 400 / len(sizes1)
    # composite ids live in [0, n1*n2)
    assert all(0 <= r["c"] < 32 for r in sizes2)


def test_semantic_dedup_two_level_planted_pair(spark, emb):
    """Planted exact copy must share a composite cell and score 1.0;
    every pair is within-cell; deterministic across runs."""
    base = emb.limit(200)
    dup = base.limit(3).withColumn("vec_id", F.col("vec_id") + 900000)
    df = base.unionByName(dup)
    out = similarity.semantic_dedup_two_level(
        df, dim=64, n_cells1=4, n_cells2=4, threshold=0.99
    )
    rows = out.collect()
    found = {(r["id_a"], r["id_b"]): r["score"] for r in rows}
    planted = {
        (a, a + 900000) for a in [r["vec_id"] for r in base.limit(3).collect()]
    }
    assert planted <= set(found)
    assert all(found[p] == 1.0 for p in planted)
    assert all(r["id_a"] < r["id_b"] for r in rows)
    rows2 = out.collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, rows2))


def test_md5_head8_int64_matches_hashlib():
    """The vectorized single-block MD5 behind minhash signatures must be
    bit-identical to hashlib on every length, including the 55/56-byte
    single-vs-multi-block boundary and empty input."""
    import hashlib

    import numpy as np

    rng = np.random.default_rng(11)
    msgs = [
        bytes(rng.integers(0, 256, int(n), dtype=np.uint8))
        for n in rng.integers(0, 120, 2000)
    ]
    msgs += [b"", b"a" * 54, b"a" * 55, b"a" * 56, b"a" * 64, b"a" * 119]
    want = [
        int.from_bytes(hashlib.md5(m).digest()[:8], "little", signed=True)
        for m in msgs
    ]
    got = text.md5_head8_int64(msgs)
    assert list(got) == want
