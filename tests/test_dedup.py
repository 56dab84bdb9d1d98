"""Semantic checks on dedup operators beyond oracle parity: LSH candidate
recall vs exact Jaccard, and dedup corpus shape."""

from __future__ import annotations

from incremental_data_pipeline_spark.operators import dedup
from incremental_data_pipeline_spark.sources.readers import load_table
from tests.conftest import SF_DIR, assert_query_matches_oracle


def test_lsh_recall_of_high_jaccard_pairs(spark):
    """Every true near-dup (J >= 0.9) must be an LSH candidate: with 4 bands
    of 3 rows, P(candidate | J=0.9) = 1-(1-0.9^3)^4 ≈ 0.97, and the planted
    fixture dups are near-identical, so recall should be total here."""
    docs = load_table(spark, SF_DIR, "documents")
    true_pairs = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.ngram_jaccard_pairs(docs, "doc_id", "text", 3, 0.9).collect()
    }
    cands = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.lsh_candidate_pairs(docs, "doc_id", "text", 12, 3, 3).collect()
    }
    assert true_pairs, "fixture should contain planted near-dups"
    missed = true_pairs - cands
    assert not missed, f"LSH missed true near-dups: {missed}"


def test_exact_dedup_keeps_one_row_per_content(spark):
    docs = load_table(spark, SF_DIR, "documents")
    deduped = dedup.exact_dedup(docs, "text", "doc_id")
    n_distinct = docs.select("text").distinct().count()
    assert deduped.count() == n_distinct
    assert deduped.select("text").distinct().count() == n_distinct


def test_simhash_near_dups_have_close_hashes(spark):
    """Near-identical docs should agree on most SimHash bits (Hamming < 8
    of 32); this is the property the fingerprint exists for."""
    from pyspark.sql import functions as F

    docs = load_table(spark, SF_DIR, "documents")
    pairs = dedup.ngram_jaccard_pairs(docs, "doc_id", "text", 3, 0.9)
    sh = dedup.simhash(docs, "doc_id", "text")
    a = sh.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("simhash", "sh_a")
    b = sh.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("simhash", "sh_b")
    joined = pairs.join(a, "doc_a").join(b, "doc_b")
    ham = joined.select(F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))).alias("d"))
    assert ham.count() > 0
    assert ham.agg(F.max("d")).first()[0] < 8


def test_dedup_simhash_hamming_oracle(spark, duck):
    from tests.conftest import assert_query_matches_oracle

    assert_query_matches_oracle(spark, duck, "dedup_simhash_hamming")


def test_simhash_pigeonhole_catches_all_close_pairs(spark):
    """Block-pigeonhole candidates are EXHAUSTIVE for hamming <= 3: compare
    against the brute-force all-pairs filter on a sample."""
    from pyspark.sql import functions as F

    from incremental_data_pipeline_spark.operators.dedup import (
        simhash,
        simhash_near_dup_pairs,
    )
    from incremental_data_pipeline_spark.sources.readers import load_table
    from tests.conftest import SF_DIR

    docs = load_table(spark, SF_DIR, "documents").limit(120)
    got = {
        (r["doc_a"], r["doc_b"])
        for r in simhash_near_dup_pairs(docs, "doc_id", "text", 3).collect()
    }
    sh = simhash(docs, "doc_id", "text")
    a, b = sh.alias("a"), sh.alias("b")
    brute = {
        (r["doc_a"], r["doc_b"])
        for r in a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))).alias("h"),
        )
        .filter(F.col("h") <= 3)
        .collect()
    }
    assert got == brute


def test_ngram_jaccard_df_cap_bounds_hot_shingles(spark):
    """A stopword shingle shared by every document is dropped by the
    document-frequency cap: pairs related ONLY through the hot shingle
    vanish, pairs sharing rare shingles keep their (capped-set) Jaccard,
    and the candidate join's per-shingle fan-out is bounded by max_df."""
    hot = "of the and"  # one 3-gram present in every doc
    docs = [
        (1, f"{hot} alpha beta gamma delta"),
        (2, f"{hot} alpha beta gamma delta"),   # near-dup of 1 via rare grams
        (3, f"{hot} zeta eta theta iota"),      # only the hot gram in common
        (4, f"{hot} kappa lam mu nu"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])

    capped = dedup.ngram_jaccard_pairs(df, "doc_id", "text", 3, 0.5, max_df=2)
    pairs = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in capped.collect()}
    assert set(pairs) == {(1, 2)}  # 3,4 relate only via the hot shingle
    assert pairs[(1, 2)] == 1.0  # identical rare-shingle sets

    # Uncapped: the hot shingle creates candidate pairs between ALL docs.
    uncapped = dedup.ngram_jaccard_pairs(df, "doc_id", "text", 3, 0.0, max_df=None)
    assert uncapped.count() == 6  # all C(4,2) pairs become candidates

    # The capped shingle relation itself is bounded: every surviving
    # shingle appears in <= max_df docs, so no posting list can explode.
    s = dedup.doc_shingles(df, "doc_id", "text", 3)
    from pyspark.sql import functions as F
    dfreq = s.groupBy("shingle").count()
    assert dfreq.filter(F.col("count") > 2).count() > 0  # hot shingle exists


def test_connected_components_chain_and_clusters(spark):
    """Worst-case chain graph (defeats plain propagation in < n rounds —
    pointer jumping must kick in), plus a triangle and an isolated pair."""
    edges = [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6), (6, 7),  # chain 1-7
             (10, 11), (11, 12), (10, 12),                    # triangle
             (20, 21)]                                        # pair
    e = spark.createDataFrame(edges, ["doc_a", "doc_b"])
    got = {r["node"]: r["cluster_id"] for r in dedup.connected_components(e).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 6: 1, 7: 1,
                   10: 10, 11: 10, 12: 10, 20: 20, 21: 20}

    corpus = spark.createDataFrame([(i,) for i in [1, 2, 3, 4, 5, 6, 7, 10, 11, 12, 20, 21, 99]], ["doc_id"])
    labeled = {r["doc_id"]: r["cluster_id"]
               for r in dedup.duplicate_clusters(corpus, e).collect()}
    assert labeled[99] == 99  # isolated doc labels itself
    assert labeled[7] == 1 and labeled[12] == 10


def test_dedup_clusters_oracle(spark, duck):
    assert_query_matches_oracle(spark, duck, "dedup_clusters")


def test_dedup_incremental_batch_oracle(spark, duck):
    assert_query_matches_oracle(spark, duck, "dedup_incremental_batch")


def test_incremental_pairs_subset_of_full(spark):
    """Incremental pairs == full LSH pairs restricted to >= 1 new side."""
    docs = load_table(spark, SF_DIR, "documents")
    full = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.lsh_candidate_pairs(docs, "doc_id", "text").collect()
    }
    corpus = docs.filter("doc_id < 400")
    batch = docs.filter("doc_id >= 400")
    inc = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.incremental_lsh_pairs(corpus, batch, "doc_id", "text").collect()
    }
    assert inc == {p for p in full if p[0] >= 400 or p[1] >= 400}


def test_minhash_signature_matches_python_reference(spark):
    """The affine-family MinHash signature must equal a direct Python
    computation over the distinct shingle set — pins the md5 staging, the
    (a,b) constants, and the modulus all at once."""
    import hashlib

    docs = load_table(spark, SF_DIR, "documents").limit(30)
    rows = {r["doc_id"]: r["text"] for r in docs.collect()}
    coeffs = dedup.minhash_coeffs(12)

    def py_sig(text):
        toks = text.split(" ")
        if len(toks) >= 3:
            sh = {" ".join(toks[i:i + 3]) for i in range(len(toks) - 2)}
        else:
            sh = {" ".join(toks)}
        xs = [int(hashlib.md5(s.encode()).hexdigest()[:8], 16) for s in sh]
        return [min((a * x + b) % dedup.MINHASH_P for x in xs) for a, b in coeffs]

    got = {
        r["doc_id"]: [r[f"mh{i}"] for i in range(12)]
        for r in dedup.minhash_signatures(docs, "doc_id", "text", 12, 3).collect()
    }
    assert set(got) == set(rows)
    for doc_id, text in rows.items():
        assert got[doc_id] == py_sig(text), f"doc {doc_id}"


def test_prefix_filter_is_lossless(spark):
    """Prefix filtering must find EXACTLY the pairs that uncapped all-pairs
    Jaccard finds — the pigeonhole guarantee, checked on the fixture corpus
    plus a handcrafted near-dup pair whose shared shingles are the CORPUS'S
    MOST FREQUENT (the case a max_df cap or a too-short prefix would lose)."""
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    # Two synthetic docs built from each other: Jaccard well above 0.6.
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    near = base + " lambda"
    extra = spark.createDataFrame(
        [(900001, base), (900002, near)], ["doc_id", "text"]
    )
    corpus = docs.unionByName(extra)
    got = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.prefix_filter_jaccard_pairs(
            corpus, "doc_id", "text", 3, 0.6
        ).collect()
    }
    want = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.ngram_jaccard_pairs(
            corpus, "doc_id", "text", 3, 0.6, max_df=None
        ).collect()
    }
    assert (900001, 900002) in want  # the construction actually qualifies
    assert got == want


def test_repeated_span_removal_semantics(spark):
    """Hand-built corpus: a 10-token passage shared by two docs must be cut
    from BOTH (cross-doc repeat), a within-doc repeated window must be cut
    (self-repeat counts toward min_count), unique text survives verbatim,
    a fully-duplicated doc rebuilds to '', and short/untouched docs pass
    through unchanged."""
    shared = "a b c d e f g h i j"          # exactly one 10-token window
    docs = spark.createDataFrame(
        [
            (1, f"{shared} unique tail one"),
            (2, f"other head {shared}"),
            (3, shared),                      # fully duplicated
            (4, "completely unrelated text"),  # short, untouched
            (5, "x y z w v u t s r q " * 2),  # within-doc repeat (trailing space -> 21 tokens)
        ],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: r
        for r in dedup.repeated_span_removal(docs, "doc_id", "text").collect()
    }
    assert out[1]["clean_text"] == "unique tail one"
    assert out[1]["n_removed"] == 10
    assert out[2]["clean_text"] == "other head"
    assert out[3]["clean_text"] == "" and out[3]["n_removed"] == 10
    assert out[4]["clean_text"] == "completely unrelated text"
    assert out[4]["n_removed"] == 0
    # doc 5: "x y z ... q " * 2 = 21 tokens (trailing '' token); windows at
    # starts 1 and 11 are identical -> all 20 real tokens + the empty tail
    # token are covered except... start 11 covers 11..20, start 1 covers
    # 1..10; token 21 ('') is NOT covered by a duplicate window pair unless
    # some other window repeats; just assert the self-repeat was detected.
    assert out[5]["n_removed"] >= 20


def test_incremental_components_merges_and_relabels(spark):
    """A delta edge that BRIDGES two stored components must relabel both
    to the joint minimum; a new node attaching to a component takes its
    label; an isolated new node labels itself; untouched components keep
    their stored label — and a new node with a SMALLER id than the
    stored minimum must become the new component id."""
    from incremental_data_pipeline_spark.operators import dedup as dd

    stored = spark.createDataFrame(
        # components {10, 11} (min 10), {20, 21} (min 20), {30} untouched
        [(10, 10), (11, 10), (20, 20), (21, 20), (30, 30)],
        "doc_id long, cluster_id long",
    )
    delta = spark.createDataFrame(
        # bridge the two components via non-min members, attach new node
        # 40 to the merged component, and new node 5 (below every stored
        # id) to component 30
        [(11, 21), (21, 40), (5, 30)],
        "doc_a long, doc_b long",
    )
    new_nodes = spark.createDataFrame([(40,), (5,), (99,)], "doc_id long")
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in dd.incremental_components(stored, delta, new_nodes).collect()
    }
    assert got == {
        10: 10, 11: 10, 20: 10, 21: 10, 40: 10,  # merged, min 10
        30: 5, 5: 5,                              # new smaller id wins
        99: 99,                                   # isolated new doc
    }


def test_incremental_components_undeclared_edge_endpoint_survives(spark):
    """A delta-edge endpoint that is neither in old_labels nor declared
    in new_nodes must still appear in the output with its component's
    label (it participated in the quotient fixpoint; dropping it would
    silently lose a document)."""
    from incremental_data_pipeline_spark.operators import dedup as dd

    stored = spark.createDataFrame([(10, 10), (11, 10)], "doc_id long, cluster_id long")
    # endpoint 50 attaches to the stored component but was never declared
    # as a new node; endpoints 60-61 form a brand-new component entirely
    # outside old_labels ∪ new_nodes
    delta = spark.createDataFrame([(11, 50), (60, 61)], "doc_a long, doc_b long")
    new_nodes = spark.createDataFrame([], "doc_id long")
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in dd.incremental_components(stored, delta, new_nodes).collect()
    }
    assert got == {10: 10, 11: 10, 50: 10, 60: 60, 61: 60}


def test_incremental_components_empty_delta_is_identity(spark):
    from incremental_data_pipeline_spark.operators import dedup as dd

    stored = spark.createDataFrame(
        [(1, 1), (2, 1), (7, 7)], "doc_id long, cluster_id long"
    )
    delta = spark.createDataFrame([], "doc_a long, doc_b long")
    new_nodes = spark.createDataFrame([], "doc_id long")
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in dd.incremental_components(stored, delta, new_nodes).collect()
    }
    assert got == {1: 1, 2: 1, 7: 7}


def test_qgram_edit_pairs_null_text_never_pairs(spark):
    """NULL text matches the reference definition (levenshtein on NULL
    is NULL, i.e. no pair): NULL-valued rows must not clique together as
    distance-0 duplicates."""
    from incremental_data_pipeline_spark.operators import dedup as dd

    df = spark.createDataFrame(
        [(1, None), (2, None), (3, "abc"), (4, "abd")],
        "pid long, name string",
    )
    got = {
        (r["id_a"], r["id_b"]): r["edit_dist"]
        for r in dd.qgram_edit_pairs(df, "pid", "name", max_dist=2).collect()
    }
    assert got == {(3, 4): 1}


def test_qgram_edit_pairs_null_group_never_pairs(spark):
    """NULL group values match the reference definition (the quadratic
    block is a group equi-join; NULL = NULL is never true in SQL): rows
    whose group key is NULL pair with nothing — neither as distance-0
    cliques nor through the prefix join."""
    from incremental_data_pipeline_spark.operators import dedup as dd

    df = spark.createDataFrame(
        [
            (1, None, "same text"),
            (2, None, "same text"),   # NULL-group clique: must NOT pair
            (3, None, "same texx"),   # NULL-group near-dup: must NOT pair
            (4, "g", "same text"),
            (5, "g", "same text"),    # real group: distance-0 pair
        ],
        "pid long, grp string, name string",
    )
    got = {
        (r["id_a"], r["id_b"]): r["edit_dist"]
        for r in dd.qgram_edit_pairs(
            df, "pid", "name", max_dist=2, group_cols=("grp",)
        ).collect()
    }
    assert got == {(4, 5): 0}


def test_qgram_edit_pairs_matches_quadratic_reference(spark):
    """Lossless vs the brute-force definition, including the prefix
    theorem's blind spot: strings with <= k*q grams (short names) only
    meet through the sentinel bucket."""
    import itertools

    from incremental_data_pipeline_spark.operators import dedup as dd

    rows = [
        (1, "g", "ab"),            # short-short pair, disjoint grams
        (2, "g", "xy"),            # lev(ab, xy) = 2 <= 3
        (3, "g", "powder almond metallic steel"),
        (4, "g", "powder almond metalic steel"),   # lev 1
        (5, "g", "saddle orange chocolate mint"),  # far from all
        (6, "g", "abc"),           # short, near 1 and 2
        (7, "h", "powder almond metallic steel"),  # other group: no pair
    ]
    df = spark.createDataFrame(rows, "pid long, grp string, name string")
    got = {
        (r["id_a"], r["id_b"]): r["edit_dist"]
        for r in dd.qgram_edit_pairs(
            df, "pid", "name", max_dist=3, q=3, group_cols=("grp",)
        ).collect()
    }
    # brute-force reference within groups
    def lev(a, b):
        import numpy as np
        m = np.arange(len(b) + 1)
        for i, ca in enumerate(a, 1):
            prev, m[0] = m[0], i
            for j, cb in enumerate(b, 1):
                prev, m[j] = m[j], min(m[j] + 1, m[j - 1] + 1,
                                       prev + (ca != cb))
        return int(m[len(b)])

    want = {}
    for (i1, g1, n1), (i2, g2, n2) in itertools.combinations(rows, 2):
        if g1 == g2 and lev(n1, n2) <= 3:
            want[(min(i1, i2), max(i1, i2))] = lev(n1, n2)
    assert got == want
    assert (1, 2) in got  # the sentinel-only pair
