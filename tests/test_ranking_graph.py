"""Unit tests for operators/ranking (TF-IDF, BM25) and
graph.triangle_counts — hand-computed micro-fixtures, plus determinism
across repartitionings (the properties the oracle can't isolate)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from biosd_feature_annotator_spark.operators.graph import triangle_counts
from biosd_feature_annotator_spark.operators.ranking import bm25_scores, tfidf_top_terms


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_tfidf_prefers_rare_terms(spark):
    d = _docs(spark, [
        "apple apple banana common common",
        "banana cherry common common",
        "common common common date",
    ])
    top = tfidf_top_terms(d, k=1).collect()
    best = {r.doc_id: r.term for r in top}
    # 'common' appears in every doc (df=3, idf=ln(4/4)+1=1); the rare
    # doubled/unique terms out-score it
    assert best[0] == "apple"
    assert best[2] == "common" or best[2] == "date"
    # doc 2: common tf=3 score 3.0 vs date tf=1 score 1*(ln(4/2)+1)≈1.69
    assert best[2] == "common"


def test_tfidf_hand_value(spark):
    d = _docs(spark, ["apple apple banana", "banana cherry", "cherry date"])
    rows = {(r.doc_id, r.term): r for r in tfidf_top_terms(d, k=3).collect()}
    r = rows[(0, "apple")]
    want = 2 * (math.log((3 + 1) / (1 + 1)) + 1)
    assert r.tf == 2 and r.df == 1
    assert abs(r.score - round(want, 4)) < 1e-9


def test_bm25_hand_value(spark):
    d = _docs(spark, ["apple banana banana", "apple apple", "cherry date"])
    got = {r.doc_id: r.bm25 for r in bm25_scores(d, ["banana"], min_term_len=2).collect()}
    assert set(got) == {0}  # only doc 0 contains 'banana'
    n_docs, df, tf, dl, avgdl = 3, 1, 2, 3, (3 + 2 + 2) / 3
    k1, b = 1.2, 0.75
    idf = math.log(1 + (n_docs - df + 0.5) / (df + 0.5))
    want = idf * (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * dl / avgdl))
    assert abs(got[0] - round(want, 4)) < 1e-9


def test_bm25_more_hits_scores_higher(spark):
    d = _docs(spark, [
        "model data training",
        "model model data data",
        "unrelated words only",
    ])
    got = {r.doc_id: r.bm25 for r in bm25_scores(d, ["model", "data"]).collect()}
    assert 2 not in got
    assert got[1] > got[0] > 0


def test_triangle_counts_hand_graph(spark):
    # K4 on {1,2,3,4} (4 triangles, each node in 3) plus a pendant 4-5
    edges = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)] + [(4, 5)]
    e = spark.createDataFrame(edges, "a long, b long")
    got = {r.node: r.n_triangles for r in triangle_counts(e).collect()}
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}


def test_triangle_counts_canonicalizes_and_dedups(spark):
    # same triangle given with mixed orientation + duplicates + self-loop
    e = spark.createDataFrame(
        [(2, 1), (1, 2), (2, 3), (1, 3), (3, 3)], "a long, b long"
    )
    got = {r.node: r.n_triangles for r in triangle_counts(e).collect()}
    assert got == {1: 1, 2: 1, 3: 1}


def test_ranking_deterministic_across_partitionings(spark):
    texts = [f"term{i % 7} term{i % 3} filler words here" for i in range(40)]
    d = _docs(spark, texts)
    a = sorted(map(tuple, tfidf_top_terms(d).collect()))
    b = sorted(map(tuple, tfidf_top_terms(d.repartition(13)).collect()))
    assert a == b
    x = sorted(map(tuple, bm25_scores(d, ["term1", "filler"]).collect()))
    y = sorted(map(tuple, bm25_scores(d.repartition(17), ["term1", "filler"]).collect()))
    assert x == y


def test_shared_ngram_spans_detects_copied_text(spark):
    from biosd_feature_annotator_spark.operators.dedup import shared_ngram_spans

    copied = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    d = _docs(spark, [
        f"intro words {copied} outro",
        f"different lead {copied} and tail",
        "nothing in common with the others at all here now ok",
        "short",
    ])
    got = {(r.a, r.b): r.shared_spans for r in
           shared_ngram_spans(d, "doc_id", "text", n=8).collect()}
    assert set(got) == {(0, 1)}
    # 10 copied tokens -> three shared 8-gram windows
    assert got[(0, 1)] == 3


def test_shared_ngram_spans_df_cap_drops_boilerplate(spark):
    from biosd_feature_annotator_spark.operators.dedup import shared_ngram_spans

    boiler = "one two three four five six seven eight"
    d = _docs(spark, [f"{boiler} doc{i}" for i in range(6)])
    got = shared_ngram_spans(d, "doc_id", "text", n=8, max_df=3).collect()
    assert got == []  # span df=6 > cap: the quadratic join is guarded


def test_sample_stratified_deterministic_and_scoped(spark):
    from biosd_feature_annotator_spark.operators.training import sample_stratified

    rows = [(i, ["x", "y", "z"][i % 3]) for i in range(600)]
    df = spark.createDataFrame(rows, "id long, grp string")
    fracs = {"x": 0.5, "y": 0.1}
    a = sorted(r.id for r in sample_stratified(df, "id", "grp", fracs).collect())
    b = sorted(
        r.id for r in sample_stratified(df.repartition(7), "id", "grp", fracs).collect()
    )
    assert a == b  # identical sample across partitionings
    got = sample_stratified(df, "id", "grp", fracs)
    by = {r.grp: r.n for r in got.groupBy("grp").agg(F.count("*").alias("n")).collect()}
    assert "z" not in by  # unlisted stratum dropped
    assert 60 <= by["x"] <= 140  # ~100 of 200 at frac 0.5
    assert 5 <= by["y"] <= 45    # ~20 of 200 at frac 0.1


def test_sample_independent_of_train_split(spark):
    """The sampler's hash digits are disjoint from split_bucket's — a 50%
    sample must not preferentially hit one train/valid/test split."""
    from biosd_feature_annotator_spark.operators.training import (
        hash_split,
        sample_stratified,
    )

    df = spark.createDataFrame([(i, "g") for i in range(2000)], "id long, grp string")
    sampled = sample_stratified(df, "id", "grp", {"g": 0.5})
    split = hash_split(sampled, "id")
    by = {r.split: r.n for r in split.groupBy("split").agg(F.count("*").alias("n")).collect()}
    total = sum(by.values())
    assert 0.70 <= by["train"] / total <= 0.90  # stays ~80%, not skewed


def test_bloom_prune_equals_plain_semi_join(spark):
    from biosd_feature_annotator_spark.operators.filters import bloom_prune_semi_join

    big = spark.range(0, 5000).select((F.col("id") % 700).alias("k"), "id")
    small = spark.createDataFrame([(3,), (77,), (699,), (1000,)], "k long")
    got = sorted(r.id for r in bloom_prune_semi_join(big, small, "k", m_bits=1 << 12).collect())
    want = sorted(r.id for r in big.join(small, "k", "left_semi").collect())
    assert got == want  # no false negatives, false positives removed


def test_bloom_probe_filters_before_any_exchange(spark):
    """The whole point of the runtime filter: the probe must evaluate in
    the SCAN stage, before the join's shuffle. The pruned frame alone
    must plan as scan → filter with no Exchange."""
    import contextlib
    import io

    from biosd_feature_annotator_spark.operators.filters import (
        bloom_bitset_literal,
        bloom_probe,
    )

    big = spark.range(0, 1000).select(F.col("id").alias("k"))
    small = spark.range(0, 10).select(F.col("id").alias("k"))
    m = 1 << 12
    pruned = big.where(bloom_probe(bloom_bitset_literal(small, "k", m), "k", m))
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        pruned.explain("formatted")
    plan = buf.getvalue()
    assert "shiftright" in plan  # the codegen probe is present
    assert "Exchange" not in plan  # and it runs pre-shuffle


def test_group_centroids_long_hand_values(spark):
    from biosd_feature_annotator_spark.operators.similarity import (
        group_centroids_long,
    )

    rows = [(1, [1.0, 2.0], "a"), (2, [3.0, 4.0], "a"), (3, [10.0, 0.0], "b")]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label string")
    got = {(r.label, r.dim): r.centroid
           for r in group_centroids_long(df, "label").collect()}
    assert got[("a", 0)] == 2.0 and got[("a", 1)] == 3.0
    assert got[("b", 0)] == 10.0 and got[("b", 1)] == 0.0


def test_group_centroids_partition_independent(spark):
    from biosd_feature_annotator_spark.operators.similarity import (
        group_centroids_long,
    )

    df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    a = sorted(map(tuple, group_centroids_long(df, "label").collect()))
    b = sorted(map(tuple, group_centroids_long(df.repartition(17), "label").collect()))
    assert a == b  # exact long sums: no float-order dependence


def test_label_propagation_finds_cliques(spark):
    from biosd_feature_annotator_spark.operators.graph import label_propagation

    # two 4-cliques bridged by a single edge: LPA must give each clique
    # one label and keep the two labels distinct
    c1 = [(i, j) for i in range(4) for j in range(i + 1, 4)]
    c2 = [(i, j) for i in range(10, 14) for j in range(i + 1, 14)]
    edges = spark.createDataFrame(c1 + c2 + [(3, 10)], "src long, dst long")
    out = {r.node: r.label for r in label_propagation(edges, iters=4).collect()}
    assert len({out[i] for i in range(4)}) == 1
    assert len({out[i] for i in range(10, 14)}) == 1
    assert out[0] != out[10]


def test_label_propagation_deterministic_across_partitionings(spark):
    from biosd_feature_annotator_spark.operators.graph import label_propagation

    edges = spark.createDataFrame(
        [(i, (i * 7 + 3) % 40) for i in range(40)] + [(i, i + 1) for i in range(39)],
        "src long, dst long",
    )
    a = sorted(map(tuple, label_propagation(edges, iters=3).collect()))
    b = sorted(map(tuple,
                   label_propagation(edges.repartition(17), iters=3).collect()))
    assert a == b


def test_label_propagation_tie_breaks_to_smallest_label(spark):
    from biosd_feature_annotator_spark.operators.graph import label_propagation

    # node 1 has exactly two neighbors with distinct labels (0 and 2):
    # after one iteration it must adopt the SMALLER label
    edges = spark.createDataFrame([(0, 1), (1, 2)], "src long, dst long")
    out = {r.node: r.label for r in label_propagation(edges, iters=1).collect()}
    assert out[1] == 0


def test_pmi_hand_values(spark):
    from biosd_feature_annotator_spark.operators.ranking import cooccurrence_pmi

    # 4 docs; "aa" and "bb" always together (2 docs), "cc" alone in two
    docs = spark.createDataFrame(
        [(1, "aa bb"), (2, "aa bb"), (3, "cc dd"), (4, "cc")],
        "doc_id long, text string")
    out = {(r.term_a, r.term_b): r
           for r in cooccurrence_pmi(docs).collect()}
    r = out[("aa", "bb")]
    # co=2, df_a=df_b=2, N=4 -> PMI = ln(2*4/(2*2)) = ln 2
    assert (r.co, r.df_a, r.df_b) == (2, 2, 2)
    assert r.pmi_micro == round(math.log(2.0) * 1_000_000)
    r2 = out[("cc", "dd")]
    # co=1, df_cc=2, df_dd=1 -> ln(1*4/(2*1)) = ln 2
    assert r2.pmi_micro == round(math.log(2.0) * 1_000_000)
    # never-co-occurring pairs are absent, not -inf rows
    assert ("aa", "cc") not in out


def test_pmi_max_df_drops_stopwords_before_pairing(spark):
    from biosd_feature_annotator_spark.operators.ranking import cooccurrence_pmi

    # the [^a-z]+ tokenizer strips digits, so suffix with letters
    docs = spark.createDataFrame(
        [(i, f"the tok{'a' if i % 2 else 'b'} pair{'a' if i % 2 else 'b'}")
         for i in range(6)],
        "doc_id long, text string")
    out = cooccurrence_pmi(docs, max_df=4).collect()
    terms = {t for r in out for t in (r.term_a, r.term_b)}
    assert "the" not in terms  # df=6 > 4: dropped BEFORE pairing
    assert {"toka", "paira", "tokb", "pairb"} == terms  # df=3 each
    # toka/tokb never share a doc -> no edge between them
    assert not any({r.term_a, r.term_b} == {"toka", "tokb"} for r in out)
    # surviving co-occurring pair keeps its exact PMI: ln(3*6/(3*3))
    r = {(x.term_a, x.term_b): x for x in out}[("paira", "toka")]
    assert r.pmi_micro == round(math.log(2.0) * 1_000_000)


def test_pmi_deterministic_across_partitionings(spark):
    from biosd_feature_annotator_spark.operators.ranking import cooccurrence_pmi

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet") \
        .where("doc_id < 120")
    one = {tuple(r) for r in cooccurrence_pmi(d).collect()}
    two = {tuple(r) for r in cooccurrence_pmi(d.repartition(13)).collect()}
    assert one == two and len(one) > 0


def test_tfidf_cosine_identical_docs_score_one(spark):
    from biosd_feature_annotator_spark.operators.ranking import tfidf_cosine_pairs

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "alpha beta gamma"),
         (3, "delta epsilon zeta")],
        "doc_id long, text string")
    out = {(r.a, r.b): r for r in
           tfidf_cosine_pairs(docs, threshold=0.9).collect()}
    assert set(out) == {(1, 2)}
    r = out[(1, 2)]
    # identical vectors: cosine == 1 up to the quantized-unit grid
    assert abs(r.dot_q - 1_000_000_000_000) <= 3 * 1_000_000
    assert r.n_shared == 3


def test_tfidf_cosine_matches_numpy_bruteforce(spark):
    import numpy as np

    from biosd_feature_annotator_spark.operators.ranking import tfidf_cosine_pairs

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet") \
        .where("doc_id < 100")
    tau = 0.3
    got = {(r.a, r.b) for r in
           tfidf_cosine_pairs(d, threshold=tau).collect()}
    # brute force in numpy with the same smoothed idf
    rows = [(r.doc_id, r.text) for r in d.collect()]
    import collections
    import math as m
    import re
    toks = {i: [t for t in re.split(r"[^a-z]+", s.lower()) if len(t) >= 2]
            for i, s in rows}
    tf = {i: collections.Counter(ts) for i, ts in toks.items()}
    dfc = collections.Counter(t for c in tf.values() for t in c)
    N = len(rows)
    vocab = sorted(dfc)
    vecs = {}
    for i, c in tf.items():
        v = np.array([c.get(t, 0) * (m.log((N + 1) / (dfc[t] + 1)) + 1)
                      for t in vocab])
        nrm = np.linalg.norm(v)
        if nrm > 0:
            vecs[i] = v / nrm
    want = set()
    ids = sorted(vecs)
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            if float(vecs[ids[x]] @ vecs[ids[y]]) >= tau + 1e-4:
                want.add((ids[x], ids[y]))
            elif float(vecs[ids[x]] @ vecs[ids[y]]) >= tau - 1e-4:
                got.discard((ids[x], ids[y]))  # grid-boundary: don't judge
    assert got == want and len(want) > 0


def test_tfidf_cosine_deterministic_and_max_df_underestimates(spark):
    from biosd_feature_annotator_spark.operators.ranking import tfidf_cosine_pairs

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet") \
        .where("doc_id < 80")
    one = {tuple(r) for r in tfidf_cosine_pairs(d, threshold=0.4).collect()}
    two = {tuple(r)
           for r in tfidf_cosine_pairs(d.repartition(11), threshold=0.4).collect()}
    assert one == two and len(one) > 0
    # dropping index terms can only REMOVE pairs / lower dots
    capped = {(r.a, r.b): r.dot_q
              for r in tfidf_cosine_pairs(d, threshold=0.4, max_df=40).collect()}
    full = {(r.a, r.b): r.dot_q for r in
            tfidf_cosine_pairs(d, threshold=0.4).collect()}
    assert set(capped) <= set(full)
    assert all(capped[k] <= full[k] for k in capped)


def test_ppr_hand_values_integer_mass(spark):
    from biosd_feature_annotator_spark.operators.graph import personalized_pagerank

    edges = spark.createDataFrame([("a", "b"), ("a", "c")],
                                  "src string, dst string")
    seeds = spark.createDataFrame([("a",)], "node string")
    got1 = {r.node: r.ppr_q
            for r in personalized_pagerank(edges, seeds, iters=1).collect()}
    # share=1e9; base(a)=(3*1e9) div 20; each child gets (17*(1e9 div 2)) div 20
    assert got1 == {"a": 150_000_000, "b": 425_000_000, "c": 425_000_000}
    got2 = {r.node: r.ppr_q
            for r in personalized_pagerank(edges, seeds, iters=2).collect()}
    # b,c are dangling: their round-1 mass decays; a re-feeds them from base
    assert got2 == {"a": 150_000_000,
                    "b": 63_750_000, "c": 63_750_000}


def test_ppr_locality_beyond_iters_is_zero(spark):
    from biosd_feature_annotator_spark.operators.graph import personalized_pagerank

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d")], "src string, dst string")
    seeds = spark.createDataFrame([("a",)], "node string")
    got = {r.node: r.ppr_q
           for r in personalized_pagerank(edges, seeds, iters=2).collect()}
    assert got["d"] == 0       # 3 hops away, 2 iterations: untouched
    assert got["c"] > 0        # exactly 2 hops: reached
    # total mass never exceeds the initial quant (floors only leak)
    assert sum(got.values()) <= 10 ** 9


def test_ppr_deterministic_across_partitionings(spark):
    from biosd_feature_annotator_spark.operators.graph import personalized_pagerank

    edges = spark.createDataFrame(
        [(f"n{i}", f"n{(i * 7 + 3) % 40}") for i in range(120)],
        "src string, dst string")
    seeds = spark.createDataFrame([("n1",), ("n2",), ("n3",)], "node string")
    one = {tuple(r) for r in personalized_pagerank(edges, seeds).collect()}
    two = {tuple(r) for r in personalized_pagerank(
        edges.repartition(13), seeds, ).collect()}
    assert one == two and len(one) > 0


def test_ppr_frontier_only_equals_nonzero_support(spark):
    from biosd_feature_annotator_spark.operators.graph import personalized_pagerank

    edges = spark.createDataFrame(
        [(f"n{i}", f"n{(i * 7 + 3) % 60}") for i in range(150)]
        + [("n1", "island")],
        "src string, dst string")
    seeds = spark.createDataFrame([("n1",), ("n5",)], "node string")
    full = {r.node: r.ppr_q
            for r in personalized_pagerank(edges, seeds, iters=3).collect()}
    frontier = {r.node: r.ppr_q
                for r in personalized_pagerank(
                    edges, seeds, iters=3, frontier_only=True).collect()}
    # identical on the nonzero support; frontier never reports unreached
    assert {k: v for k, v in full.items() if v > 0} \
        == {k: v for k, v in frontier.items() if v > 0}
    assert set(frontier) <= set(full)
    # the frontier relation is strictly smaller than the node relation
    # (unreached nodes exist in this graph)
    assert len(frontier) < len(full)


# ---------------------------------------------------------- r5: new graph ops


def _ud_edges(spark, pairs):
    return spark.createDataFrame(list(pairs), "src string, dst string")


def test_neighbor_sim_hand_values(spark):
    from biosd_feature_annotator_spark.operators.graph import neighborhood_similarity

    # N(1)={2,3} N(2)={1,3,4} N(3)={1,2,4} N(4)={2,3}
    e = _ud_edges(spark, [("1", "2"), ("1", "3"), ("2", "3"),
                          ("2", "4"), ("3", "4")])
    got = {(r.node_a, r.node_b): r
           for r in neighborhood_similarity(e).collect()}
    # quant/ln(3) = 910239 (rounded), quant/ln(2) = 1442695
    r14 = got[("1", "4")]
    assert (r14.cn, r14.deg_a, r14.deg_b) == (2, 2, 2)
    assert r14.aa_micro == 2 * 910239          # via z=2 and z=3, both deg 3
    r23 = got[("2", "3")]
    assert (r23.cn, r23.deg_a, r23.deg_b) == (2, 3, 3)
    assert r23.aa_micro == 2 * 1442695         # via z=1 and z=4, both deg 2
    assert got[("1", "2")].cn == 1 and got[("1", "2")].aa_micro == 910239
    assert len(got) == 6
    # Jaccard as integer rational: (1,4) is 2/(2+2-2) = 1.0 — structural twins
    assert r14.cn * 1 >= 1 * (r14.deg_a + r14.deg_b - r14.cn)


def test_neighbor_sim_min_common_and_hub_cap(spark):
    from biosd_feature_annotator_spark.operators.graph import neighborhood_similarity

    e = _ud_edges(spark, [("1", "2"), ("1", "3"), ("2", "3"),
                          ("2", "4"), ("3", "4")])
    strict = {(r.node_a, r.node_b)
              for r in neighborhood_similarity(e, min_common=2).collect()}
    assert strict == {("1", "4"), ("2", "3")}
    # max_deg=2 drops the deg-3 wedge centers (2 and 3): only pair (2,3)
    # survives, its aa from the two deg-2 centers, deg columns UNCAPPED
    capped = {(r.node_a, r.node_b): r
              for r in neighborhood_similarity(e, max_deg=2).collect()}
    assert set(capped) == {("2", "3")}
    r = capped[("2", "3")]
    assert r.cn == 2 and r.aa_micro == 2 * 1442695
    assert (r.deg_a, r.deg_b) == (3, 3)


def test_neighbor_sim_deterministic_across_partitionings(spark):
    from biosd_feature_annotator_spark.operators.graph import neighborhood_similarity

    e = spark.createDataFrame(
        [(f"n{i}", f"n{(i * 5 + 2) % 30}") for i in range(90)],
        "src string, dst string")
    one = {tuple(r) for r in neighborhood_similarity(e).collect()}
    two = {tuple(r) for r in neighborhood_similarity(e.repartition(17)).collect()}
    assert one == two and len(one) > 0


def test_k_core_peels_chain_keeps_triangle(spark):
    from biosd_feature_annotator_spark.operators.graph import k_core

    # triangle 1-2-3 plus tendril 3-4-5: a plain deg>=2 filter keeps 4
    # (deg 2: neighbors 3 and 5); peeling removes 5 then 4
    e = _ud_edges(spark, [("1", "2"), ("2", "3"), ("1", "3"),
                          ("3", "4"), ("4", "5")])
    got = {r.node: r.deg for r in k_core(e, k=2, iters=3).collect()}
    assert got == {"1": 2, "2": 2, "3": 2}
    # converged ⇒ idempotent under more rounds
    more = {r.node: r.deg for r in k_core(e, k=2, iters=8).collect()}
    assert more == got


def test_k_core_deterministic_across_partitionings(spark):
    from biosd_feature_annotator_spark.operators.graph import k_core

    e = spark.createDataFrame(
        [(f"n{i}", f"n{(i * 7 + 1) % 25}") for i in range(80)],
        "src string, dst string")
    one = {tuple(r) for r in k_core(e, k=2, iters=6).collect()}
    two = {tuple(r) for r in k_core(e.repartition(11), k=2, iters=6).collect()}
    assert one == two and len(one) == 24  # hand-simulated 2-core size


def test_hits_hand_values_one_iteration(spark):
    from biosd_feature_annotator_spark.operators.graph import hits

    e = spark.createDataFrame(
        [("1", "3"), ("2", "3"), ("2", "4"), ("3", "4")],
        "src string, dst string")
    got = {r.node: (r.hub_q, r.auth_q) for r in hits(e, iters=1).collect()}
    # h0 = 1e9 each. auth_raw: 3←{1,2}=2e9, 4←{2,3}=2e9; Σ=4e9, n_q=4
    # → auth: 3=5e8, 4=5e8, others 0.
    # hub_raw: 1→auth(3)=5e8, 2→auth(3)+auth(4)=1e9, 3→auth(4)=5e8;
    # Σ=2e9, n_q=2 → hub: 1=25e7, 2=5e8, 3=25e7, 4=0.
    assert got["3"] == (250_000_000, 500_000_000)
    assert got["4"] == (0, 500_000_000)
    assert got["2"] == (500_000_000, 0)
    assert got["1"] == (250_000_000, 0)


def test_hits_deterministic_across_partitionings(spark):
    from biosd_feature_annotator_spark.operators.graph import hits

    e = spark.createDataFrame(
        [(f"n{i}", f"n{(i * 11 + 5) % 35}") for i in range(100)],
        "src string, dst string")
    one = {tuple(r) for r in hits(e, iters=2).collect()}
    two = {tuple(r) for r in hits(e.repartition(9), iters=2).collect()}
    assert one == two and len(one) > 0


def test_degree_profile_star_is_perfectly_disassortative(spark):
    from biosd_feature_annotator_spark.operators.graph import degree_profile

    e = _ud_edges(spark, [("1", "2"), ("1", "3"), ("1", "4")])
    r = degree_profile(e).collect()[0]
    assert (r.n_nodes, r.n_edges, r.deg_min, r.deg_max) == (4, 3, 1, 3)
    assert (r.m2, r.sum_deg, r.sum_xy, r.sum_x2) == (6, 12, 18, 30)
    assert r.assortativity_micro == -1_000_000   # star: r = −1 exactly


def test_degree_profile_regular_graph_variance_zero(spark):
    from biosd_feature_annotator_spark.operators.graph import degree_profile

    e = _ud_edges(spark, [("1", "2"), ("2", "3"), ("1", "3")])  # triangle
    r = degree_profile(e).collect()[0]
    assert r.deg_min == r.deg_max == 2
    assert r.assortativity_micro is None   # zero variance: undefined


def test_degree_profile_deterministic_across_partitionings(spark):
    from biosd_feature_annotator_spark.operators.graph import degree_profile

    e = spark.createDataFrame(
        [(f"n{i}", f"n{(i * 7 + 3) % 40}") for i in range(150)],
        "src string, dst string")
    one = degree_profile(e).collect()[0]
    two = degree_profile(e.repartition(13)).collect()[0]
    assert tuple(one) == tuple(two) and one.m2 > 0


def _walks_reference(edges, walk_len, walks_per_node, directed=False, salt="walk"):
    import hashlib
    from collections import defaultdict

    sym = set()
    for s, d in edges:
        if s != d:
            sym.add((s, d))
            if not directed:
                sym.add((d, s))
    adj = defaultdict(list)
    for s, d in sym:
        adj[s].append(d)
    for s in adj:
        adj[s].sort()
    nodes = {s for s, _ in sym} | {d for _, d in sym}
    out = set()
    for s in nodes:
        for w in range(1, walks_per_node + 1):
            path, cur = [s], s
            for t in range(1, walk_len + 1):
                nbrs = adj.get(cur)
                if not nbrs:
                    break
                h = int(hashlib.md5(
                    f"{s}#{w}#{t}#{salt}".encode()).hexdigest()[:15], 16)
                cur = nbrs[h % len(nbrs)]
                path.append(cur)
            out.update((s, w, i, n) for i, n in enumerate(path))
    return out


def test_random_walks_match_python_replica(spark):
    from biosd_feature_annotator_spark.operators.graph import random_walks

    edges = [(i % 7, 10 + (i * 3) % 5) for i in range(20)]
    df = spark.createDataFrame(sorted(set(edges)), "src long, dst long")
    got = {(r.start, r.w, r.step, r.node)
           for r in random_walks(df, walk_len=3, walks_per_node=2).collect()}
    assert got == _walks_reference(edges, 3, 2)
    # every walk takes real edges: consecutive steps are neighbors
    sym = {(s, d) for s, d in set(edges)} | {(d, s) for s, d in set(edges)}
    byw = {}
    for s, w, t, n in got:
        byw.setdefault((s, w), {})[t] = n
    for path in byw.values():
        for t in range(1, max(path) + 1):
            assert (path[t - 1], path[t]) in sym


def test_random_walks_directed_dangling_stops_early(spark):
    from biosd_feature_annotator_spark.operators.graph import random_walks

    # 1 → 2 → 3, 3 dangling: the walk from 1 is exactly [1, 2, 3]
    df = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    got = {(r.start, r.step): r.node for r in random_walks(
        df, walk_len=5, walks_per_node=1, directed=True).collect()}
    assert {(s, t): n for (s, t), n in got.items() if s == 1} \
        == {(1, 0): 1, (1, 1): 2, (1, 2): 3}
    assert got[(3, 0)] == 3 and (3, 1) not in got   # dangling start: len 1


def test_random_walks_deterministic_across_partitionings(spark):
    from biosd_feature_annotator_spark.operators.graph import random_walks

    e = spark.createDataFrame(
        [(f"n{i}", f"n{(i * 7 + 3) % 30}") for i in range(90)],
        "src string, dst string")
    one = sorted(tuple(r) for r in random_walks(e, walk_len=4).collect())
    two = sorted(tuple(r) for r in random_walks(
        e.repartition(13), walk_len=4).collect())
    assert one == two and len(one) > 0


def test_clustering_coefficients_hand_graph(spark):
    from biosd_feature_annotator_spark.operators.graph import (
        clustering_coefficients,
    )

    # triangle a-b-c plus pendant d hanging off c
    e = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4)], "a long, b long"
    )
    got = {r.node: r for r in clustering_coefficients(e).collect()}
    assert got[1].degree == 2 and got[1].cc_micro == 1_000_000
    assert got[2].degree == 2 and got[2].cc_micro == 1_000_000
    # c: 1 triangle over C(3,2)=3 possible -> floor(2e6/6)
    assert got[3].degree == 3 and got[3].n_triangles == 1
    assert got[3].cc_micro == 333_333
    # pendant: degree 1 -> defined as 0, present in the output
    assert got[4].degree == 1 and got[4].cc_micro == 0
    assert len(got) == 4


def test_skipgram_pairs_hand_walk(spark):
    from biosd_feature_annotator_spark.operators.graph import skipgram_pairs

    corpus = spark.createDataFrame(
        [(1, 1, s, n) for s, n in enumerate([10, 11, 12, 13])],
        "start long, w long, step long, node long",
    )
    got = {(r.center, r.context): r.cnt
           for r in skipgram_pairs(corpus, window=2).collect()}
    # 5 unordered within-2 pairs, each mirrored
    assert len(got) == 10
    assert got[(10, 11)] == 1 and got[(11, 10)] == 1
    assert got[(10, 12)] == 1 and got[(12, 10)] == 1
    assert (10, 13) not in got  # distance 3 > window
    assert got[(11, 13)] == 1 and got[(12, 13)] == 1


def test_skipgram_pairs_counts_accumulate_and_respect_walk_ids(spark):
    from biosd_feature_annotator_spark.operators.graph import skipgram_pairs

    # two walks: the (5,6) adjacency appears in both -> cnt 2; walk
    # boundaries must not leak (6 end of walk 1, 5 start of walk 2)
    rows = [(1, 1, 0, 5), (1, 1, 1, 6),
            (2, 1, 0, 6), (2, 1, 1, 5), (2, 1, 2, 7)]
    corpus = spark.createDataFrame(
        rows, "start long, w long, step long, node long")
    got = {(r.center, r.context): r.cnt
           for r in skipgram_pairs(corpus, window=2).collect()}
    assert got[(5, 6)] == 2 and got[(6, 5)] == 2
    assert got[(6, 7)] == 1  # within walk 2 at distance 2
    assert (7, 6) in got and got[(7, 6)] == 1


def test_modularity_two_triangles_and_negative_floor(spark):
    from biosd_feature_annotator_spark.operators.graph import modularity

    # two triangles joined by one bridge: m = 7
    e = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6), (3, 4)],
        "a long, b long",
    )
    # natural split: each triangle one community
    asg = spark.createDataFrame(
        [(n, 1 if n <= 3 else 2) for n in range(1, 7)],
        "node long, community long",
    )
    got = {r.community: r for r in modularity(e, asg).collect()}
    # e_c=3, d_c=7 each: (4*7*3 - 49)/(4*49) = 35/196 -> 178571 micro
    for c in (1, 2):
        assert got[c].n_nodes == 3 and got[c].e_intra == 3
        assert got[c].d_total == 7 and got[c].m == 7
        assert got[c].contrib_micro == 178_571

    # adversarial split across the triangles: negative contribution,
    # floor (not truncation): (0-25)*1e6/196 = -127551.02 -> -127552
    bad = spark.createDataFrame(
        [(1, 10), (4, 10), (2, 20), (3, 20), (5, 20), (6, 20)],
        "node long, community long",
    )
    got2 = {r.community: r for r in modularity(e, bad).collect()}
    assert got2[10].e_intra == 0 and got2[10].d_total == 5
    assert got2[10].contrib_micro == -127_552


def test_modularity_excludes_unassigned_includes_isolated(spark):
    from biosd_feature_annotator_spark.operators.graph import modularity

    e = spark.createDataFrame([(1, 2), (2, 3)], "a long, b long")
    # node 3 unassigned; node 9 assigned but has no edges
    asg = spark.createDataFrame(
        [(1, 1), (2, 1), (9, 2)], "node long, community long"
    )
    got = {r.community: r for r in modularity(e, asg).collect()}
    assert got[1].e_intra == 1 and got[1].d_total == 3  # deg(1)+deg(2)
    assert got[2].n_nodes == 1 and got[2].e_intra == 0
    assert got[2].d_total == 0 and got[2].contrib_micro == 0


def test_association_rules_hand_case(spark):
    from biosd_feature_annotator_spark.operators.ranking import (
        association_rules,
    )

    # b1{x,y} (x listed twice -> presence dedups), b2{x,y}, b3{z,w}
    df = spark.createDataFrame(
        [("b1", "x"), ("b1", "x"), ("b1", "y"), ("b2", "x"),
         ("b2", "y"), ("b3", "z"), ("b3", "w")],
        "basket string, item string",
    )
    rules = {
        (r.antecedent, r.consequent): r
        for r in association_rules(df, "basket", "item").collect()
    }
    assert set(rules) == {("x", "y"), ("y", "x"), ("w", "z"), ("z", "w")}
    xy = rules[("x", "y")]
    assert (xy.supp_pair, xy.supp_ant, xy.supp_con) == (2, 2, 2)
    assert xy.conf_micro == 1_000_000
    assert xy.lift_micro == 1_500_000     # 2·3 / (2·2)
    wz = rules[("w", "z")]
    assert wz.conf_micro == 1_000_000
    assert wz.lift_micro == 3_000_000     # 1·3 / (1·1)

    # min_item_support prunes items BEFORE pairing (Apriori property)
    pruned = association_rules(
        df, "basket", "item", min_item_support=2
    ).collect()
    assert {(r.antecedent, r.consequent) for r in pruned} == {
        ("x", "y"), ("y", "x")
    }


def test_transitive_closure_hand_case(spark):
    from biosd_feature_annotator_spark.operators.graph import (
        transitive_closure,
    )

    # chain 1->2->3->4 plus shortcut 1->3 (min-depth wins) and a
    # 2-cycle 5<->6 (must terminate, self-pairs at depth 2)
    e = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (1, 3), (5, 6), (6, 5)],
        "src long, dst long",
    )
    got = {
        (r.src, r.dst): r.depth
        for r in transitive_closure(e, max_depth=3).collect()
    }
    assert got[(1, 2)] == 1 and got[(1, 3)] == 1   # shortcut beats 2-hop
    assert got[(1, 4)] == 2                        # via the shortcut
    assert got[(2, 4)] == 2
    assert got[(5, 5)] == 2 and got[(6, 6)] == 2   # cycle closes
    assert (5, 6) in got and got[(5, 6)] == 1
    # bounded: nothing deeper than max_depth
    assert max(got.values()) <= 3
    # depth-2 run finds strictly fewer pairs
    d2 = transitive_closure(e, max_depth=2).count()
    assert d2 == len(got)  # chain saturates at depth 2 here
    d1 = transitive_closure(e, max_depth=1).count()
    assert d1 == 6


def test_rule_confidence_hand_case(spark):
    from biosd_feature_annotator_spark.operators.graph import (
        rule_confidence,
    )

    # in_nation(c, n) ∧ in_region(n, r) ⇒ cust_region(c, r) holds for
    # 2 of 3 body pairs (c3's cust_region edge is missing)
    t = spark.createDataFrame(
        [
            ("c1", "in_nation", "n1"), ("c2", "in_nation", "n1"),
            ("c3", "in_nation", "n2"),
            ("n1", "in_region", "r1"), ("n2", "in_region", "r1"),
            ("c1", "cust_region", "r1"), ("c2", "cust_region", "r1"),
        ],
        "subj string, pred string, obj string",
    )
    rows = {
        (r.body_p, r.body_q, r.head_r): r
        for r in rule_confidence(t).collect()
    }
    rule = rows[("in_nation", "in_region", "cust_region")]
    assert rule.n_body == 3 and rule.n_matched == 2
    assert rule.conf_micro == 666_666   # floor(2e6 / 3)
    # no head predicate ever matches an unconnected body -> absent
    assert ("in_region", "in_nation", "cust_region") not in rows


def test_phrase_search_hand_case(spark):
    from biosd_feature_annotator_spark.operators.ranking import (
        phrase_search,
    )

    d = spark.createDataFrame(
        [
            (1, "the Big  order SCAN runs big order scan twice"),
            (2, "big scan order shuffled words"),
            (3, "big order but no third token"),
        ],
        "doc_id long, text string",
    )
    got = sorted(
        (r.doc_id, r.start_pos)
        for r in phrase_search(d, "big order scan").collect()
    )
    # doc 1: case/whitespace-normalized match at 1 and again at 5
    assert got == [(1, 1), (1, 5)]
    # repeated-token phrase aligns positionally
    rep = spark.createDataFrame(
        [(9, "go go go stop")], "doc_id long, text string"
    )
    got2 = sorted(
        (r.doc_id, r.start_pos)
        for r in phrase_search(rep, "go go").collect()
    )
    assert got2 == [(9, 0), (9, 1)]


def test_landmark_distances_hand_case(spark):
    from biosd_feature_annotator_spark.operators.graph import (
        landmark_distances,
    )

    # path 1-2-3-4-5, undirected; landmarks 1 and 4
    e = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5)], "src long, dst long"
    )
    lm = spark.createDataFrame([(1,), (4,)], "node long")
    got = {
        (r.node, r.landmark): r.dist
        for r in landmark_distances(e, lm, max_dist=2).collect()
    }
    assert got[(1, 1)] == 0 and got[(4, 4)] == 0
    assert got[(3, 1)] == 2 and got[(2, 4)] == 2 and got[(5, 4)] == 1
    # bounded: node 4 is 3 hops from landmark 1 -> absent at max_dist=2
    assert (4, 1) not in got
    # directed variant only walks src->dst
    d = {
        (r.node, r.landmark): r.dist
        for r in landmark_distances(e, lm, 2, directed=True).collect()
    }
    assert (3, 4) not in d and d[(5, 4)] == 1


def test_rrf_fuse_hand_case(spark):
    from biosd_feature_annotator_spark.operators.ranking import rrf_fuse

    runs = spark.createDataFrame(
        [
            ("q", "a", 1), ("q", "b", 2),   # run 1
            ("q", "b", 1), ("q", "c", 2),   # run 2
        ],
        "query string, doc string, rank long",
    )
    got = {r.doc: r for r in rrf_fuse(runs, k=60).collect()}
    # b: 1e6//61 + 1e6//62 beats a: 1e6//61
    assert got["b"].rrf_micro == 16393 + 16129
    assert got["b"].n_runs == 2 and got["b"].fused_rank == 1
    assert got["a"].rrf_micro == 16393 and got["a"].fused_rank == 2
    assert got["c"].fused_rank == 3


def test_weighted_sssp_hand_case(spark):
    from biosd_feature_annotator_spark.operators.graph import weighted_sssp

    # 1 -2-> 2 -2-> 3, plus a heavy direct 1 -9-> 3 (relaxed later)
    e = spark.createDataFrame(
        [(1, 2, 2), (2, 3, 2), (1, 3, 9), (3, 4, 1)],
        "src long, dst long, w long",
    )
    seeds = spark.createDataFrame([(1,)], "node long")
    got = {
        r.node: r.dist for r in weighted_sssp(e, seeds, rounds=3).collect()
    }
    assert got == {1: 0, 2: 2, 3: 4, 4: 5}
    # at rounds=1 only direct edges are relaxed
    g1 = {r.node: r.dist for r in weighted_sssp(e, seeds, rounds=1).collect()}
    assert g1 == {1: 0, 2: 2, 3: 9}


def test_dag_layers_hand_case(spark):
    from biosd_feature_annotator_spark.operators.graph import dag_layers

    # diamond with a long arm: layer = LONGEST path from a source
    #   1 -> 2 -> 4 -> 5 ; 1 -> 4 ; 6 isolated source -> 7
    e = spark.createDataFrame(
        [(1, 2), (2, 4), (1, 4), (4, 5), (6, 7)],
        "src long, dst long",
    )
    got = {r.node: r.layer for r in dag_layers(e, rounds=4).collect()}
    assert got == {1: 0, 2: 1, 4: 2, 5: 3, 6: 0, 7: 1}


def test_kg_integrity_hand_case(spark):
    from biosd_feature_annotator_spark.operators.graph import kg_integrity

    t = spark.createDataFrame(
        [
            ("a", "p", "b"), ("a", "p", "b"),    # duplicate
            ("b", "q", "c"), ("a", "q", "d"),
        ],
        "subj string, pred string, obj string",
    )
    r = kg_integrity(t).collect()[0]
    assert (r.n_triples, r.n_dup_triples) == (4, 1)
    assert (r.n_subjects, r.n_objects, r.n_entities) == (2, 3, 4)
    # c and d never appear as subjects
    assert r.n_dangling_objs == 2 and r.n_preds == 2
    assert r.dangling_micro == 666_666


def test_label_spreading_hand_case(spark):
    from biosd_feature_annotator_spark.operators.graph import label_spreading

    # chain A-1-2-B : seeds A='x', B='y'; node 1 sees x (round1) then
    # keeps x (clamped seeds never flip); node 2 ties x/y -> smallest
    e = spark.createDataFrame(
        [("A", "1"), ("1", "2"), ("2", "B")], "src string, dst string"
    )
    seeds = spark.createDataFrame(
        [("A", "x"), ("B", "y")], "node string, label string"
    )
    got = {
        r.node: (r.label, r.is_seed)
        for r in label_spreading(e, seeds, iters=2).collect()
    }
    assert got["A"] == ("x", True) and got["B"] == ("y", True)
    assert got["1"][0] == "x"
    assert got["2"][0] == "x"      # tie between x and y -> label asc
    assert got["1"][1] is False


def test_quotient_graph_hand_case(spark):
    from biosd_feature_annotator_spark.operators.graph import quotient_graph

    e = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (9, 1)],
        "src long, dst long",
    )
    # communities: {1,2,3}=A, {4,5}=B; node 9 unlabeled -> edge dropped
    lab = spark.createDataFrame(
        [(1, "A"), (2, "A"), (3, "A"), (4, "B"), (5, "B")],
        "node long, label string",
    )
    got = {
        (r.comm_a, r.comm_b): r.n_edges
        for r in quotient_graph(e, lab).collect()
    }
    assert got == {("A", "A"): 2, ("A", "B"): 1, ("B", "B"): 1}
    noloop = {
        (r.comm_a, r.comm_b): r.n_edges
        for r in quotient_graph(e, lab, keep_self_loops=False).collect()
    }
    assert noloop == {("A", "B"): 1}
