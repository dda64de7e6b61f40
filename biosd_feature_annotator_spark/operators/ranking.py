"""Corpus-statistics term ranking: TF-IDF keyword extraction and BM25
relevance scoring over a document table — the lexical half of a
training-data pipeline's retrieval/quality stack (the embedding half is
operators/similarity).

Scale shape (100 TB): tokenize → explode → two map-side-combinable
aggregations ((doc, term) tf and term df) → one shuffle join on `term`
(the vocabulary — broadcast only when small; left as a shuffle join so
skewed head terms spread across partitions) → per-doc window or grouped
sum. No Python anywhere; every expression is whole-stage codegen.

Determinism: every floating-point score is produced by a FIXED
expression shape — one multiply for TF-IDF, and per-query-term
conditional sums added in query-term order for BM25 (each conditional
sum folds exactly one row per (doc, term), so no accumulation-order
dependence) — making results bit-reproducible across partitionings and
exactly replicable by the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _terms(docs: DataFrame, id_col: str, text_col: str, min_term_len: int) -> DataFrame:
    return (
        docs.select(
            F.col(id_col).alias("doc"),
            F.explode(F.split(F.lower(F.col(text_col)), "[^a-z]+")).alias("term"),
        )
        .where(F.length("term") >= min_term_len)
    )


def tfidf_top_terms(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    min_term_len: int = 2,
) -> DataFrame:
    """Top-k characteristic terms per document by smoothed TF-IDF:
    score = tf * (ln((N + 1) / (df + 1)) + 1), ranked per doc by
    (score desc, term asc). Returns (id_col, term, tf, df, score) with
    score rounded to 4 decimals for engine-portable comparison."""
    toks = _terms(docs, id_col, text_col, min_term_len)
    # NOT persisted (r6, measured 0.84 s -> 0.72 s at sf0.1): the score
    # join and the df aggregate share the (doc, term) aggregation's
    # exchange via ReuseExchange, and the persist hid size stats from
    # the join planner besides paying cache materialization.
    tf = toks.groupBy("doc", "term").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    n = docs.agg(F.count_distinct(F.col(id_col)).alias("n_docs"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n))
        .withColumn(
            "score",
            F.col("tf")
            * (F.log((F.col("n_docs") + F.lit(1.0)) / (F.col("df") + F.lit(1.0)))
               + F.lit(1.0)),
        )
    )
    w = Window.partitionBy("doc").orderBy(F.col("score").desc(), F.col("term").asc())
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select(
            F.col("doc").alias(id_col),
            "term",
            "tf",
            "df",
            F.round("score", 4).alias("score"),
        )
    )


def bm25_scores(
    docs: DataFrame,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    min_term_len: int = 2,
) -> DataFrame:
    """Okapi BM25 score of every document against a fixed bag of query
    terms: sum over terms of
    ln(1 + (N - df + 0.5) / (df + 0.5)) * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl)).
    Only docs matching ≥1 query term are returned (the inverted-index
    access path: the tf frame is pre-filtered to the query's terms, so
    the join touches a tiny fraction of the corpus). Per-term
    contributions are summed in query_terms order via conditional
    aggregates — each folds exactly one row, so the double addition
    order is fixed and engine-portable."""
    if not query_terms:
        # zero aggregate expressions would make groupBy().agg() raise an
        # AnalysisException; an empty query scores nothing by definition
        return docs.select(
            F.col(id_col), F.lit(0.0).alias("bm25")
        ).where(F.lit(False))

    # NOT persisted (r6, measured 1.07 s -> 0.89 s at sf0.1): the
    # query-term filter pushes below the aggregate on the tf branch, so
    # at worst the corpus is tokenized twice (one full pass for
    # dl/stats, one term-filtered pass for tf/df) — cheaper than a
    # corpus-sized cache write + four cache reads, and the planner
    # keeps real size stats for the joins.
    tf_all = (
        _terms(docs, id_col, text_col, min_term_len)
        .groupBy("doc", "term")
        .agg(F.count("*").alias("tf"))
    )
    dl = tf_all.groupBy("doc").agg(F.sum("tf").alias("dl"))
    stats = dl.agg(F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl"))
    tf = tf_all.where(F.col("term").isin(list(query_terms)))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    j = (
        tf.join(F.broadcast(dfreq), "term")
        .join(dl, "doc")
        .crossJoin(F.broadcast(stats))
    )
    contrib: Column = (
        F.log(
            F.lit(1.0)
            + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
        )
        * (F.col("tf") * F.lit(k1 + 1.0))
        / (
            F.col("tf")
            + F.lit(k1)
            * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
        )
    )
    parts = [
        F.sum(F.when(F.col("term") == t, contrib)).alias(f"c{i}")
        for i, t in enumerate(query_terms)
    ]
    agg = j.groupBy("doc").agg(*parts)
    total: Column = F.lit(0.0)
    for i in range(len(query_terms)):
        total = total + F.coalesce(F.col(f"c{i}"), F.lit(0.0))
    return agg.select(
        F.col("doc").alias(id_col), F.round(total, 4).alias("bm25")
    )


def cooccurrence_pmi(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_term_len: int = 2,
    max_df: int | None = None,
    min_pair_count: int = 1,
    quant: int = 1_000_000,
) -> DataFrame:
    """Document-level term co-occurrence graph with PMI edge weights —
    the edge-INDUCTION primitive of KG construction from text: two terms
    that appear in the same documents far more often than their
    document frequencies predict get a high-PMI edge, and the resulting
    (term_a, term_b, pmi) relation is exactly what the graph family
    (connected_components / label_propagation / pagerank / triangles)
    consumes.

    PMI = ln(p(a,b) / (p(a)·p(b))) over document-level PRESENCE
    (distinct (doc, term), not term frequency), i.e.
    ln((co · N) / (df_a · df_b)) with N = docs with ≥1 token. The value
    is micro-quantized (round(·)·quant as long — the fluency/FS-weights
    kernel) with a FIXED expression shape, so the DuckDB oracle
    reproduces every edge weight.

    Scale shape: one distinct shuffle for the presence relation
    (persisted — it feeds the df aggregate, the N aggregate and both
    self-join sides), then a self-join on `doc` — per-doc cost is
    quadratic in the doc's DISTINCT term count, the inherent cost of
    pairwise co-occurrence, bounded in practice by `max_df` (drops
    stopword-like terms BEFORE pairing, the same hot-key discipline as
    MinHash's max_bucket) and by document length; the pair count and df
    aggregates are map-side combinable, and the final df lookups join a
    vocabulary-sized relation. `doc` is the join key, so term skew
    cannot concentrate a partition."""
    # NOT persisted (r6, measured): every consumer hangs off one action
    # and shares the identical distinct exchange via ReuseExchange; the
    # explicit persist paid cache materialization for work Catalyst
    # already dedups (same lesson as association_rules).
    toks_all = _terms(docs, id_col, text_col, min_term_len).distinct()
    n = toks_all.agg(F.count_distinct("doc").alias("n_docs"))
    dfreq = toks_all.groupBy("term").agg(F.count("*").alias("df"))
    if max_df is not None:
        dfreq = dfreq.where(F.col("df") <= max_df)
        kept = toks_all.join(dfreq.select("term"), "term", "left_semi")
    else:
        kept = toks_all
    a = kept.select("doc", F.col("term").alias("term_a"))
    b = kept.select("doc", F.col("term").alias("term_b"))
    # shuffled-hash for the doc-keyed pair self-join — same argument and
    # measurement as association_rules above (guide §3.1)
    co = (
        a.join(b.hint("shuffle_hash"), "doc")
        .where(F.col("term_a") < F.col("term_b"))
        .groupBy("term_a", "term_b")
        .agg(F.count(F.lit(1)).alias("co"))
        .where(F.col("co") >= min_pair_count)
    )
    da = dfreq.select(F.col("term").alias("term_a"), F.col("df").alias("df_a"))
    db = dfreq.select(F.col("term").alias("term_b"), F.col("df").alias("df_b"))
    ratio = (F.col("co").cast("double") * F.col("n_docs")) / (
        F.col("df_a").cast("double") * F.col("df_b")
    )
    return (
        co.join(da, "term_a")
        .join(db, "term_b")
        .crossJoin(F.broadcast(n))
        .select(
            "term_a", "term_b", "co", "df_a", "df_b",
            F.round(F.log(ratio) * quant).cast("long").alias("pmi_micro"),
        )
    )


def tfidf_cosine_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
    min_term_len: int = 2,
    max_df: int | None = None,
    quant: int = 1_000_000,
) -> DataFrame:
    """All-pairs document cosine similarity over TF-IDF term vectors —
    the SPARSE-vector complement of the embedding ops in
    operators/similarity: (a, b, n_shared, dot_q) for every pair with
    cosine ≥ τ, via the term-at-a-time inverted-index discipline
    (Elsayed et al.'s pairwise-similarity MapReduce pattern, public):
    partial products are generated per shared term by an equi-join on
    the term, never all-pairs.

    Bit-reproducible float discipline (the fluency/centroids kernel,
    staged): (1) raw weight w = tf·(ln((N+1)/(df+1))+1) micro-quantized
    at quant/100 → long wq0, so (2) the per-doc squared norm is an
    EXACT LONG SUM (no float accumulation order), (3) the unit weight
    is round(wq0/√sumsq · quant) → long (√ of an exact integer is
    correctly rounded, division and round are single deterministic
    ops), and (4) the dot product is again an exact long sum of
    per-term products. The quantized unit vector deviates from true
    unit norm by ≤ ~1/quant per component — the DEFINED semantics,
    identical on every engine and partitioning. Threshold as exact
    rational: dot_q·den ≥ num·quant².

    Scale shape: tokenize once (persisted — feeds tf, df, norms and
    both index sides), map-side-combinable aggregates, one term-keyed
    equi-join whose bucket sizes are term document frequencies.
    `max_df` (optional) drops stopword-like terms from the INDEX —
    with it the op trades exactness for join safety exactly like
    ngram_jaccard_pairs' cap (dropped terms carry the smallest IDF
    weights, so the cosine underestimate is the smallest available);
    without it the result is exact under the quantized semantics.
    `quant` bounds: unit components ≤ quant ⇒ per-term products
    ≤ quant², and ~1e3 shared terms stay well inside int64."""
    from fractions import Fraction
    frac = Fraction(threshold).limit_denominator(10_000)
    num, den = frac.numerator, frac.denominator
    q0 = quant // 100  # raw-weight grid: keeps wq0^2 sums inside int64

    # NOT persisted (r6, measured 1.72 s -> 1.47 s with both this and
    # the w persist removed): the branches share the aggregation
    # exchanges via ReuseExchange.
    tf = (
        _terms(docs, id_col, text_col, min_term_len)
        .groupBy("doc", "term")
        .agg(F.count("*").alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    n = docs.agg(F.count_distinct(F.col(id_col)).alias("n_docs"))
    w = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc", "term", "df",
            F.round(
                F.col("tf")
                * (F.log((F.col("n_docs") + F.lit(1.0))
                         / (F.col("df") + F.lit(1.0))) + F.lit(1.0))
                * F.lit(float(q0))
            ).cast("long").alias("wq0"),
        )
    )
    norms = w.groupBy("doc").agg(F.sum(F.col("wq0") * F.col("wq0")).alias("ss"))
    unit = (
        w.join(norms, "doc")
        .where(F.col("ss") > 0)
        .select(
            "doc", "term", "df",
            F.round(F.col("wq0") / F.sqrt(F.col("ss")) * F.lit(float(quant)))
            .cast("long").alias("uq"),
        )
    )
    if max_df is not None:
        unit = unit.where(F.col("df") <= max_df)
    ua = unit.select(F.col("doc").alias("a"), "term", F.col("uq").alias("ua"))
    ub = unit.select(F.col("doc").alias("b"), "term", F.col("uq").alias("ub"))
    return (
        ua.join(ub, "term")
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(
            F.count("*").cast("long").alias("n_shared"),
            F.sum(F.col("ua") * F.col("ub")).alias("dot_q"),
        )
        # rhs computed driver-side as a Python int: num·quant² exceeds
        # int32, and an int32·int32 column product would overflow
        .where(F.col("dot_q") * F.lit(den) >= F.lit(num * quant * quant))
    )


def association_rules(
    baskets: DataFrame,
    basket_col: str,
    item_col: str,
    min_item_support: int = 1,
    min_pair_support: int = 1,
) -> DataFrame:
    """Directed pairwise association rules (the Apriori/market-basket
    primitive) over a (basket, item) relation → one row per rule
    A→B with support(A,B) ≥ min_pair_support:
    (antecedent, consequent, supp_pair, supp_ant, supp_con,
    conf_micro, lift_micro). In the KG pipeline this is the
    co-mention rule miner — "turns that mention entity A also mention
    entity B with confidence c" — the directed, thresholded
    complement of [cooccurrence_pmi]'s symmetric log-ratio edges.

        confidence(A→B) = supp(A,B) / supp(A)
        lift(A→B)       = supp(A,B)·N / (supp(A)·supp(B))

    Both are emitted as exact true-floored millionths via the
    DECIMAL(38,0) pmod recipe — counts in, integers out, no float, so
    the DuckDB oracle reproduces every rule bit-for-bit. lift > 1e6
    means positively associated; lift is symmetric, confidence is the
    directional part.

    Scale shape: one distinct shuffle for presence (NOT persisted — it
    feeds the N aggregate, the item-support aggregate, and both
    self-join sides, but all consumers hang off one action and share
    the identical distinct exchange via ReuseExchange; both an explicit
    persist and a collect_set/local-pair-expansion rewrite measured
    slower at r6), then the same basket-keyed pair self-join as
    cooccurrence_pmi — quadratic per basket in DISTINCT items, the
    inherent pairwise cost, with min_item_support pruning items BEFORE
    pairing (the Apriori antimonotonicity: a pair can never out-support
    its rarer item) — skipped outright when min_item_support <= 1,
    where the prune is provably a no-op (every present item has
    supp >= 1). Supports are vocabulary-sized and broadcast to the pair
    relation; basket is the join key, so item skew cannot concentrate a
    partition."""
    presence = baskets.select(
        F.col(basket_col).alias("basket"),
        F.col(item_col).alias("item"),
    ).distinct()
    n = presence.agg(F.count_distinct("basket").alias("n_baskets"))
    support = (
        presence.groupBy("item")
        .agg(F.count(F.lit(1)).alias("supp"))
        .where(F.col("supp") >= min_item_support)
    )
    if min_item_support > 1:
        kept = presence.join(support.select("item"), "item", "left_semi")
    else:
        kept = presence
    a = kept.select("basket", F.col("item").alias("item_a"))
    b = kept.select("basket", F.col("item").alias("item_b"))
    # deliberate join strategy (guide §3.1, r6): the pair self-join
    # needs no sort order (the pair aggregation is hash-based), so
    # sort-merge pays two full sorts for nothing; a shuffled-hash join
    # builds one hash table per partition of the distinct presence
    # relation — partition-sized by the shuffle parallelism, the
    # cluster-side lever — and measured 2× faster (4.8-5.1 s -> 2.5-2.8
    # s for the sf1.0 pair stage). AQE skew-join still splits oversized
    # partitions under SHJ.
    pairs = (
        a.join(b.hint("shuffle_hash"), "basket")
        .where(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("supp_pair"))
        .where(F.col("supp_pair") >= min_pair_support)
    )
    sa = support.select(
        F.col("item").alias("item_a"), F.col("supp").alias("supp_a")
    )
    sb = support.select(
        F.col("item").alias("item_b"), F.col("supp").alias("supp_b")
    )
    j = (
        pairs.join(F.broadcast(sa), "item_a")
        .join(F.broadcast(sb), "item_b")
        .crossJoin(F.broadcast(n))
    )
    dec = "decimal(38,0)"
    mil = F.lit(1_000_000).cast(dec)

    def _floor_ratio(numer, denom):
        nn = numer * mil
        return ((nn - F.pmod(nn, denom)) / denom).cast("long")

    def _direction(ant, con, s_ant, s_con):
        conf = _floor_ratio(F.col("supp_pair").cast(dec), F.col(s_ant).cast(dec))
        lift = _floor_ratio(
            F.col("supp_pair").cast(dec) * F.col("n_baskets").cast(dec),
            F.col(s_ant).cast(dec) * F.col(s_con).cast(dec),
        )
        return j.select(
            F.col(ant).alias("antecedent"),
            F.col(con).alias("consequent"),
            "supp_pair",
            F.col(s_ant).alias("supp_ant"),
            F.col(s_con).alias("supp_con"),
            conf.alias("conf_micro"),
            lift.alias("lift_micro"),
        )

    return _direction("item_a", "item_b", "supp_a", "supp_b").unionByName(
        _direction("item_b", "item_a", "supp_b", "supp_a")
    )


def phrase_search(
    docs: DataFrame,
    phrase: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact multi-token phrase search via a positional inverted index:
    (id, start_pos) for every occurrence of `phrase` as consecutive
    whitespace-normalized lowercase tokens — the retrieval-serving
    primitive BM25 can't provide (bag-of-words scoring has no
    adjacency) and substring LIKE gets wrong (matches across token
    boundaries).

    The classic positional-postings intersection, as joins: build the
    (id, pos, token) relation ONLY for the phrase's k distinct tokens
    — the isin filter evaluates immediately above the posexplode
    (pre-shuffle, scan-adjacent; it canNOT push through the explode to
    the parquet reader, so the text column is read once — honest
    limit of expression-derived predicates), and the relation is
    PERSISTED because it feeds one join side per token: without the
    persist Catalyst re-scans the corpus once per phrase token (plans
    are trees — measured three FileScans for a 3-token phrase). Then
    k-1 equi-joins on (id, pos - i = start) align token i to offset i
    from a candidate start; every side is pre-filtered to one token's
    postings, so the chain is selective-first. Output is
    occurrences-sized.

    A phrase with repeated tokens works unchanged: posexplode emits
    each position once, so the (id, start)-keyed joins stay 1:1."""
    toks = phrase.split()
    if not toks:
        raise ValueError("phrase must contain at least one token")
    norm = F.split(
        F.trim(F.lower(F.regexp_replace(F.col(text_col), r"\s+", " "))),
        " ",
    )
    # NOT persisted (r6, measured 0.38 s -> 0.23 s at sf0.1): the
    # per-token join sides are filtered slices of one posting relation;
    # Catalyst pushes each token's filter into its own scan branch and
    # the scans stay column-pruned, which measured cheaper than a cache
    # round-trip (the r2 three-FileScan reading predates the isin
    # pre-filter above).
    post = docs.select(
        F.col(id_col).alias("id"),
        F.posexplode(norm).alias("pos", "token"),
    ).where(F.col("token").isin(list(set(toks))))
    out = (
        post.where(F.col("token") == toks[0])
        .select("id", F.col("pos").cast("long").alias("start_pos"))
    )
    for i, tk in enumerate(toks[1:], start=1):
        nxt = post.where(F.col("token") == tk).select(
            "id", (F.col("pos").cast("long") - F.lit(i)).alias("start_pos")
        )
        out = out.join(nxt, ["id", "start_pos"])
    return out.withColumnRenamed("id", id_col)


def rrf_fuse(
    runs: DataFrame,
    query_col: str = "query",
    doc_col: str = "doc",
    rank_col: str = "rank",
    k: int = 60,
) -> DataFrame:
    """Reciprocal-rank fusion of ranked lists from heterogeneous
    retrievers (the hybrid-search combiner: BM25 run + ANN run → one
    list). Input is one row per (query, doc, rank) per run; output one
    row per (query, doc):

        rrf_micro  = Σ_runs 1e6 // (k + rank)      (exact, floored
                     per term — no float reciprocal, so the oracle
                     reproduces every fused score bit-for-bit)
        n_runs     = how many runs retrieved the doc
        fused_rank = row_number by (rrf_micro desc, doc asc)

    k=60 is the published default; larger k flattens the rank
    discount. Per-term flooring (rather than flooring the float sum)
    is the deliberate exactness choice and changes scores by < 1e-6
    per run relative to the textbook formula.

    Scale shape: one map-side-combinable (query, doc) aggregation —
    the fusion itself never joins runs against each other — plus one
    per-query window on the fused (query, doc) relation, which is
    retrieved-docs-sized. Query count parallelizes the window;
    a single hot query is bounded by its candidate-set size."""
    term = F.expr(
        f"cast(1000000 div ({k} + cast({rank_col} as bigint)) as long)"
    )
    fused = (
        runs.select(
            F.col(query_col).alias("query"),
            F.col(doc_col).alias("doc"),
            term.alias("_t"),
        )
        .groupBy("query", "doc")
        .agg(
            F.count(F.lit(1)).alias("n_runs"),
            F.sum("_t").alias("rrf_micro"),
        )
    )
    w = Window.partitionBy("query").orderBy(
        F.desc("rrf_micro"), F.asc("doc")
    )
    return fused.withColumn(
        "fused_rank", F.row_number().over(w).cast("long")
    )
