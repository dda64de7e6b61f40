"""Similarity search over embedding columns (array<float>).

Two paths, same contract (query_id, neighbor_id, cos):

- ``cosine_topk`` — brute force. The dot product is pure Catalyst
  (zip_with + aggregate, whole-stage codegen'd); top-k is a per-query
  window. Cost Q×N — correct baseline, and the right choice whenever one
  side broadcasts.
- ``lsh_cosine_topk`` — the scale path: random-hyperplane signatures
  (sign-bit LSH). Planes are deterministic literals (seeded), the
  signature is again pure Catalyst, candidates come from an equi-join on
  (band, band_bits) — at 10^9 vectors this is shuffle-partitionable by
  bucket instead of an N×Q product. Re-rank candidates with exact cosine.
  Recall is tunable via n_planes/bands (more bands → more candidates).

- ``ivf_cosine_topk`` — the IVF shape: coarse assignment of every vector
  to its nearest centroid (cells), queries probe the ``n_probe`` nearest
  cells, exact re-rank inside the probed cells. Centroids here are
  deterministic md5-derived unit-free points (no training pass — the
  point is the partitioning shape: candidate generation is an equi-join
  on cell id, shuffle-partitionable by cell at 10^9 vectors; swap in
  k-means centroids for recall tuning and nothing else changes).
"""

from __future__ import annotations

import hashlib
import struct

import pandas as pd  # module-level: pandas_udf type hints resolve in globals

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _vecd(col) -> F.Column:
    return F.transform(col, lambda x: x.cast("double"))


def _dot(a, b) -> F.Column:
    """Dot product — the identical zip_with + left-fold ``cosine`` uses."""
    return F.aggregate(
        F.zip_with(_vecd(a), _vecd(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(col) -> F.Column:
    """L2 norm — sqrt of the identical x*x left-fold ``cosine`` computes
    inline. Hoisted per VECTOR by the pairwise operators below (r6): the
    norm is a function of one vector, so folding it per candidate PAIR
    (as an inline ``cosine`` does) repeats the same interpreted
    higher-order-function work once per pair instead of once per row.
    Same expression tree on the same values ⟹ bit-identical doubles, and
    dot/(na*nb) is evaluated in the same order as before — the hoisted
    form is IEEE-equal to the inline form (pinned by test)."""
    return F.sqrt(F.aggregate(_vecd(col), F.lit(0.0), lambda acc, x: acc + x * x))


def _cos_pre(qv, cv, qn, cn) -> F.Column:
    """Cosine from precomputed norms: same dot fold, same na*nb product
    order as ``cosine`` — bit-identical, one fold per pair instead of
    three."""
    return _dot(qv, cv) / (F.col(qn) * F.col(cn))


def _lit_darray(values) -> F.Column:
    """A double-array literal shipped as ONE CSV string and expanded by
    Catalyst's ConstantFolding at optimization time. F.array(*64 F.lit)
    costs ~0.5 ms of py4j per element at plan build AND leaves a 64-node
    CreateArray in the tree; this is one py4j call and one Literal after
    folding. repr() round-trips doubles exactly and Spark's string→double
    cast is correctly rounded, so the folded values are bit-identical to
    the direct literals (the SQL oracles embed the same repr values)."""
    return F.split(F.lit(",".join(repr(float(x)) for x in values)), ",").cast(
        "array<double>"
    )


# --------------------------------------------------------------- kernels
#
# Every centroid-literal computation below has TWO kernels with
# bit-identical output (parity-gated by tests/test_similarity_kernels.py):
#
# - "catalyst": centroids folded into higher-order-function expressions
#   (aggregate/zip_with). Fully JVM-side and the form the DuckDB oracles
#   replay — but Spark plans/codegens a tree of ~10^3 nodes per centroid
#   table, which costs a fixed ~3-8 s of DRIVER time per query (measured:
#   pq_encode wall is flat 3.5 s from 500 to 8,000 rows — all plan build,
#   no per-row term visible at test scale). Fine at 100 TB (one plan,
#   amortized), wasteful for interactive/bench use.
# - "arrow" (default): the same math as a vectorized numpy kernel inside
#   a pandas UDF. Summation is the IDENTICAL left-to-right fold over
#   vector positions (numpy elementwise += in an explicit t-loop, no
#   BLAS/pairwise reordering, no FMA), casts are the same float32→double
#   widenings, and ties break by the same rule — so doubles and code
#   assignments are bit-equal to the catalyst kernel and the SQL oracles
#   stay hash-exact. Plan cost: one PythonUDF node.


def _np_rows(series):
    import numpy as np

    return np.stack([np.asarray(v, dtype=np.float64) for v in series])


def _arrow_pq_codes(codebooks):
    """pandas_udf: embedding → m nearest-centroid codes (PQ encode)."""
    import numpy as np

    sub = len(codebooks[0][0])
    cbs = [np.array([[float(x) for x in c] for c in cb]) for cb in codebooks]
    # centroid self-norms accumulated in PYTHON sum order — the same
    # scalar the catalyst kernel folds in as F.lit(sum(x*x for x in c))
    nrm = [np.array([sum(x * x for x in c) for c in cb]) for cb in codebooks]

    @F.pandas_udf("array<int>")
    def codes(s: pd.Series) -> pd.Series:
        if len(s) == 0:
            return pd.Series([], dtype=object)
        x = _np_rows(s)
        out = np.empty((x.shape[0], len(cbs)), dtype=np.int32)
        for j, (cb, cn) in enumerate(zip(cbs, nrm)):
            acc = np.zeros((x.shape[0], cb.shape[0]))
            off = j * sub
            for t in range(sub):  # explicit left fold — order is the contract
                acc += x[:, off + t, None] * cb[None, :, t]
            d = cn[None, :] - 2.0 * acc
            out[:, j] = np.argmin(d, axis=1)  # first min == lowest code
        return pd.Series(list(out))

    return codes


def _arrow_pq_dtab(codebooks):
    """pandas_udf: embedding → flattened m×k_cents ADC distance table
    (true |q_j − c|² per subspace centroid, same (x−c)² left fold as the
    catalyst form)."""
    import numpy as np

    sub = len(codebooks[0][0])
    cbs = [np.array([[float(x) for x in c] for c in cb]) for cb in codebooks]

    @F.pandas_udf("array<double>")
    def dtab(s: pd.Series) -> pd.Series:
        if len(s) == 0:
            return pd.Series([], dtype=object)
        x = _np_rows(s)
        parts = []
        for j, cb in enumerate(cbs):
            acc = np.zeros((x.shape[0], cb.shape[0]))
            off = j * sub
            for t in range(sub):
                diff = x[:, off + t, None] - cb[None, :, t]
                acc += diff * diff
            parts.append(acc)
        return pd.Series(list(np.concatenate(parts, axis=1)))

    return dtab


def _arrow_ivf_cells(centroids, n_probe: int):
    """pandas_udf: embedding → ids of the n_probe nearest cells, ordered
    by descending cosine-proxy sim with the catalyst kernel's exact
    tie-break (reverse(array_sort) on (sim, cell) structs ⇒ ties take
    the HIGHER cell first)."""
    import math

    import numpy as np

    cmat = np.array([[float(x) for x in c] for c in centroids])
    cn = np.array([math.sqrt(sum(x * x for x in c)) for c in centroids])
    k = cmat.shape[0]
    neg_ids = -np.arange(k)

    @F.pandas_udf("array<int>")
    def cells(s: pd.Series) -> pd.Series:
        if len(s) == 0:
            return pd.Series([], dtype=object)
        x = _np_rows(s)
        acc = np.zeros((x.shape[0], k))
        for t in range(cmat.shape[1]):
            acc += x[:, t, None] * cmat[None, :, t]
        sim = acc / cn[None, :]
        out = []
        for row in sim:
            order = np.lexsort((neg_ids, -row))  # sim desc, cell desc on ties
            out.append(order[:n_probe].astype(np.int32))
        return pd.Series(out)

    return cells


def _cells_col(vec_col, cents, n_probe: int, kernel: str) -> F.Column:
    if kernel == "catalyst":
        return ivf_assign(vec_col, cents, n_probe)
    return _arrow_ivf_cells(cents, n_probe)(vec_col)


def _arrow_cosine():
    """pandas_udf twin of the catalyst cosine: the dot and both norm
    accumulations are the IDENTICAL left-to-right fold over vector
    positions (explicit t-loop, elementwise numpy += — no BLAS/pairwise
    reordering, no FMA), the casts are the same float32→double
    widenings, and the final dot/(sqrt(na)·sqrt(nb)) applies the same
    three rounded ops — bit-equal to the HOF form, so round(cos, 3)
    oracles stay hash-exact (parity-gated in
    tests/test_similarity_kernels.py)."""
    import numpy as np

    @F.pandas_udf("double")
    def cos(sa: pd.Series, sb: pd.Series) -> pd.Series:
        if len(sa) == 0:
            return pd.Series([], dtype="float64")
        xa, xb = _np_rows(sa), _np_rows(sb)
        n = xa.shape[0]
        dot = np.zeros(n)
        na = np.zeros(n)
        nb = np.zeros(n)
        for t in range(xa.shape[1]):  # explicit left fold — order is the contract
            dot += xa[:, t] * xb[:, t]
            na += xa[:, t] * xa[:, t]
            nb += xb[:, t] * xb[:, t]
        return pd.Series(dot / (np.sqrt(na) * np.sqrt(nb)))

    return cos


def cosine(a, b, kernel: str = "catalyst") -> F.Column:
    """Cosine similarity of two array columns. Dual kernel like the
    PQ/IVF math (see the kernels note): catalyst is the
    oracle-replayable HOF form and the DEFAULT — measured r6: on the
    candidate-scoring paths (two data-dependent vector columns per row,
    unlike the literal-folded PQ/IVF kernels) the Arrow round trip of
    both embeddings costs more than the HOF fold saves (7-13 s vs
    2.5-2.8 s for emb_ann_topk at sf1.0), so the arrow twin stays an
    available, parity-gated alternative for CPU-bound clusters rather
    than the default."""
    if kernel != "catalyst":
        return _arrow_cosine()(a, b)
    dot = F.aggregate(
        F.zip_with(_vecd(a), _vecd(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    na = F.sqrt(F.aggregate(_vecd(a), F.lit(0.0), lambda acc, x: acc + x * x))
    nb = F.sqrt(F.aggregate(_vecd(b), F.lit(0.0), lambda acc, x: acc + x * x))
    return dot / (na * nb)


def cosine_topk(
    queries: DataFrame, corpus: DataFrame, k: int = 5,
    id_q: str = "vec_id", id_c: str = "vec_id", vec: str = "embedding",
    broadcast_corpus: bool = False,
) -> DataFrame:
    """Brute-force top-k. Broadcast the smaller side: with
    broadcast_corpus the join is a broadcast nested loop (no shuffle of
    queries); otherwise queries broadcast."""
    q = queries.select(
        F.col(id_q).alias("query_id"), F.col(vec).alias("qv"),
        _norm(F.col(vec)).alias("qn"),
    )
    c = corpus.select(
        F.col(id_c).alias("neighbor_id"), F.col(vec).alias("cv"),
        _norm(F.col(vec)).alias("cn"),
    )
    joined = q.join(F.broadcast(c), how="cross") if broadcast_corpus else F.broadcast(q).crossJoin(c)
    scored = joined.where(F.col("query_id") != F.col("neighbor_id")).select(
        "query_id", "neighbor_id", _cos_pre("qv", "cv", "qn", "cn").alias("cos")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


def l2_topk(
    queries: DataFrame, corpus: DataFrame, k: int = 5,
    id_q: str = "vec_id", id_c: str = "vec_id", vec: str = "embedding",
) -> DataFrame:
    """Brute-force squared-L2 top-k (ascending distance) — the exact
    baseline PQ-ADC recall is measured against (ADC approximates L2, not
    cosine). Same broadcast-query shape as cosine_topk."""
    q = queries.select(F.col(id_q).alias("query_id"), F.col(vec).alias("qv"))
    c = corpus.select(F.col(id_c).alias("neighbor_id"), F.col(vec).alias("cv"))
    d2 = F.aggregate(
        F.zip_with(_vecd(F.col("qv")), _vecd(F.col("cv")),
                   lambda x, y: (x - y) * (x - y)),
        F.lit(0.0), lambda acc, v: acc + v,
    )
    scored = (
        F.broadcast(q).crossJoin(c)
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", d2.alias("d2"))
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("d2"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "d2", "rank")
    )


def _planes(n_planes: int, dim: int, seed: int = 7) -> list[list[float]]:
    """Deterministic pseudo-random unit-free hyperplanes from md5 —
    reproducible across sessions/parallelism (no RNG state)."""
    planes = []
    for p in range(n_planes):
        row = []
        for i in range(dim):
            h = hashlib.md5(f"{seed}:{p}:{i}".encode()).digest()[:8]
            v = struct.unpack("<q", h)[0] / float(2**63)  # [-1, 1)
            row.append(v)
        planes.append(row)
    return planes


def _arrow_lsh_sig(planes):
    """pandas_udf: embedding → packed sign-bit signature. Same
    left-fold dots and >= 0 threshold as the catalyst kernel — the
    packed long is integer-exact, so parity is bit-for-bit."""
    import numpy as np

    pmat = np.array([[float(x) for x in p] for p in planes])

    @F.pandas_udf("long")
    def sig(s: pd.Series) -> pd.Series:
        if len(s) == 0:
            return pd.Series([], dtype="int64")
        x = _np_rows(s)
        acc = np.zeros((x.shape[0], pmat.shape[0]))
        for t in range(pmat.shape[1]):
            acc += x[:, t, None] * pmat[None, :, t]
        bits = (acc >= 0).astype(np.int64)
        weights = (1 << np.arange(pmat.shape[0], dtype=np.int64))
        return pd.Series(bits @ weights)

    return sig


def lsh_signature(vec_col, planes: list[list[float]], kernel: str = "arrow") -> F.Column:
    """Sign-bit signature as a long (n_planes ≤ 63 bits). Dual kernel
    like the PQ/IVF math (see the kernels note): catalyst is the
    oracle-replayable HOF form, arrow the plan-cheap numpy twin."""
    if kernel != "catalyst":
        return _arrow_lsh_sig(planes)(vec_col)
    sig = F.lit(0).cast("long")
    v = _vecd(vec_col)
    for b, plane in enumerate(planes):
        lits = _lit_darray(plane)
        dot = F.aggregate(
            F.zip_with(v, lits, lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x
        )
        bit = F.when(dot >= 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        sig = sig.bitwiseXOR(F.shiftleft(bit, b))
    return sig


def lsh_cosine_topk(
    queries: DataFrame, corpus: DataFrame, k: int = 5,
    id_q: str = "vec_id", id_c: str = "vec_id", vec: str = "embedding",
    n_planes: int = 16, bands: int = 4, dim: int | None = None, seed: int = 7,
    kernel: str = "arrow",
) -> DataFrame:
    """ANN top-k: candidates share ≥1 LSH band, re-ranked by exact cosine.

    dim (the embedding width) must be supplied by the caller — probing it
    with corpus.first() would be a driver-side action at plan-build time
    (an extra job per call, and a TypeError on an empty corpus)."""
    if dim is None:
        raise ValueError(
            "lsh_cosine_topk requires dim= (embedding width); it is not "
            "probed from the data to keep plan construction action-free"
        )
    planes = _planes(n_planes, dim, seed)
    per_band = n_planes // bands
    mask = (1 << per_band) - 1

    def banded(df, idc, alias_id, keep_vec):
        # NOTE (r6, measured): an ids-only banding with the vectors
        # re-attached to the deduped pair list by id measured SLOWER
        # here (6.5-8.4 s vs 2.5-2.8 s at sf1.0) — the query side
        # broadcasts, so the corpus vectors cross only one dropDuplicates
        # exchange either way and the attach joins were pure overhead.
        # ALSO rejected on measurement (r6, second pass): (a) hoisting
        # the two norm folds out of the inline cosine (per vector instead
        # of per pair — the rewrite KEPT for ivf/brute/semantic scoring)
        # measured neutral on the bench embeddings (0.832 vs 0.838 s
        # min-of-5, sf0.1) and 35% SLOWER on a clustered 20k corpus;
        # (b) scoring before the pair dedup (to shuffle (id,id,cos)
        # instead of vector payloads) lost 2.2x on the same clustered
        # corpus — near vectors collide in most of their bands, so the
        # pre-dedup fold count multiplies by the collision factor.
        sig = lsh_signature(F.col(vec), planes, kernel=kernel)
        base = df.select(
            F.col(idc).alias(alias_id), F.col(vec).alias(keep_vec), sig.alias("sig")
        )
        return base.select(
            alias_id, keep_vec,
            F.explode(F.array(*[
                F.struct(
                    F.lit(b).alias("band"),
                    F.shiftright("sig", b * per_band).bitwiseAND(F.lit(mask)).alias("bits"),
                )
                for b in range(bands)
            ])).alias("bb"),
        ).select(alias_id, keep_vec, "bb.band", "bb.bits")

    qb = banded(queries, id_q, "query_id", "qv")
    cb = banded(corpus, id_c, "neighbor_id", "cv")
    cand = (
        qb.join(cb, ["band", "bits"])
        .where(F.col("query_id") != F.col("neighbor_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = cand.select("query_id", "neighbor_id", cosine("qv", "cv").alias("cos"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


def _dot_lit(vec_col, point: list[float]) -> F.Column:
    return F.aggregate(
        F.zip_with(_vecd(vec_col), _lit_darray(point), lambda x, y: x * y),
        F.lit(0.0), lambda a, x: a + x,
    )


def ivf_assign(vec_col, centroids: list[list[float]], n_probe: int = 1) -> F.Column:
    """Cell ids of the n_probe nearest centroids (by cosine against the
    shared-norm-free dot product — centroids are compared to the SAME
    vector, so the vector's own norm cancels; centroid norms are folded in
    as literals). Pure Catalyst, deterministic."""
    import math

    scored = F.array(*[
        F.struct(
            (_dot_lit(vec_col, c) / math.sqrt(sum(x * x for x in c))).alias("sim"),
            F.lit(i).alias("cell"),
        )
        for i, c in enumerate(centroids)
    ])
    best = F.slice(F.reverse(F.array_sort(scored)), 1, n_probe)
    return F.transform(best, lambda s: s["cell"])


def ivf_cosine_topk(
    queries: DataFrame, corpus: DataFrame, k: int = 5,
    id_q: str = "vec_id", id_c: str = "vec_id", vec: str = "embedding",
    n_cells: int = 8, n_probe: int = 2, dim: int = 64, seed: int = 11,
    centroids: list[list[float]] | None = None, kernel: str = "arrow",
) -> DataFrame:
    """IVF ANN: corpus vectors live in their single nearest cell, queries
    probe their n_probe nearest cells, exact cosine re-rank inside the
    probed cells. Candidate generation is an equi-join on cell id —
    shuffle-partitionable (or broadcast for small query sets), never an
    N×Q product.

    centroids: optional trained centroid table (train_ivf_centroids);
    defaults to the deterministic seed points (the oracle-checkable form)."""
    cents = centroids if centroids is not None else _planes(n_cells, dim, seed)
    c = corpus.select(
        F.col(id_c).alias("neighbor_id"), F.col(vec).alias("cv"),
        _norm(F.col(vec)).alias("cn"),
        F.element_at(_cells_col(F.col(vec), cents, 1, kernel), 1).alias("cell"),
    )
    q = queries.select(
        F.col(id_q).alias("query_id"), F.col(vec).alias("qv"),
        _norm(F.col(vec)).alias("qn"),
        F.explode(_cells_col(F.col(vec), cents, n_probe, kernel)).alias("cell"),
    )
    cand = q.join(c, "cell").where(F.col("query_id") != F.col("neighbor_id"))
    scored = cand.select(
        "query_id", "neighbor_id", _cos_pre("qv", "cv", "qn", "cn").alias("cos")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


def cosine_pairs_above(
    df: DataFrame, threshold: float, id_col: str = "vec_id", vec: str = "embedding",
    limit_ids: int | None = None,
) -> DataFrame:
    """Embedding near-duplicate detection: all pairs (a < b) with cosine ≥
    threshold. Brute-force form for oracle checking; the LSH banding above
    is the scale path."""
    base = df.select(F.col(id_col).alias("id"), F.col(vec).alias("v"))
    if limit_ids is not None:
        base = base.where(F.col("id") < limit_ids)
    a = base.select(F.col("id").alias("a"), F.col("v").alias("va"),
                    _norm(F.col("v")).alias("na"))
    b = base.select(F.col("id").alias("b"), F.col("v").alias("vb"),
                    _norm(F.col("v")).alias("nb"))
    return (
        a.join(b, F.col("a") < F.col("b"))
        .select("a", "b", _cos_pre("va", "vb", "na", "nb").alias("cos"))
        .where(F.col("cos") >= threshold)
    )


def semantic_dedup(
    df: DataFrame, threshold: float, id_col: str = "vec_id",
    vec: str = "embedding", n_cells: int = 8, dim: int = 64, seed: int = 11,
    centroids: list[list[float]] | None = None, kernel: str = "arrow",
) -> DataFrame:
    """SemDeDup-style semantic deduplication: every vector is assigned to
    its nearest coarse cell (ivf_assign — pure Catalyst, centroids folded
    as literals), and a row is dropped iff a LOWER-id row in the SAME
    cell has cosine ≥ threshold with it (keep-lowest-id representative,
    the same canonical-survivor rule the exact/MinHash dedups use).

    Returns (id, cell, kept) for EVERY input row — a flagged frame, so
    the caller chooses `where(kept)` for the survivors or inspects the
    drops; deterministic row count for oracle checking.

    Scale shape: candidate generation is a self-equi-join on cell id —
    never an all-pairs product. Within-cell work is quadratic in CELL
    size only; at 10^9 vectors you raise n_cells so cells stay ~10^3-10^4
    (SemDeDup's published configuration is exactly this: k-means cells of
    a few thousand, pairwise cosine inside each). The trained-centroid
    path (train_ivf_centroids) balances cell populations and slots in
    without changing the plan; the seed-centroid default is the
    oracle-checkable form."""
    cents = centroids if centroids is not None else _planes(n_cells, dim, seed)
    base = df.select(
        F.col(id_col).alias("id"),
        F.col(vec).alias("v"),
        _norm(F.col(vec)).alias("n"),
        F.element_at(_cells_col(F.col(vec), cents, 1, kernel), 1).alias("cell"),
    )
    a = base.select("cell", F.col("id").alias("a"), F.col("v").alias("va"),
                    F.col("n").alias("na"))
    b = base.select("cell", F.col("id").alias("b"), F.col("v").alias("vb"),
                    F.col("n").alias("nb"))
    dups = (
        a.join(b, "cell")
        .where(F.col("a") < F.col("b"))
        .where(_cos_pre("va", "vb", "na", "nb") >= threshold)
        .select(F.col("b").alias("dup_id"))
        .distinct()
    )
    return (
        base.join(dups, base["id"] == dups["dup_id"], "left")
        .select("id", "cell", F.col("dup_id").isNull().alias("kept"))
    )


def train_ivf_centroids(
    df: DataFrame, n_cells: int = 8, dim: int = 64, rounds: int = 3,
    vec: str = "embedding", seed: int = 11, kernel: str = "arrow",
) -> list[list[float]]:
    """Spherical k-means for IVF centroids, expressed as DataFrame algebra
    (Lloyd rounds): assign every vector to its nearest centroid
    (ivf_assign — pure Catalyst), then recompute each centroid as the
    per-dimension mean via posexplode → groupBy(cell, pos) → avg. Each
    round is one aggregation job; the only driver-side transfer is the
    n_cells×dim centroid table itself (metadata-sized, like the manifest
    collects). Empty cells keep their previous centroid. Seeded from the
    same deterministic md5 points the untrained path uses, so
    rounds=0 ≡ the untrained centroids and the swap is drop-in."""
    cents = _planes(n_cells, dim, seed)
    for _ in range(rounds):
        # two selects: mixing the generator (posexplode) with the
        # struct-array cell expression in ONE projection trips an analyzer
        # quirk that drops the struct field names (FIELD_NOT_FOUND)
        cells = df.select(
            F.element_at(_cells_col(F.col(vec), cents, 1, kernel), 1).alias("cell"),
            _vecd(F.col(vec)).alias("_v"),
        )
        assigned = cells.select("cell", F.posexplode("_v").alias("pos", "x"))
        rows = (
            assigned.groupBy("cell", "pos").agg(F.avg("x").alias("m"))
            .collect()
        )
        new = [list(c) for c in cents]
        for r in rows:
            new[r["cell"]][r["pos"]] = r["m"]
        cents = new
    return cents


def synth_clustered_embeddings(
    spark, n: int, dim: int = 64, k_centers: int = 8,
    spread: float = 1.0, sigma: float = 0.5, seed: int = 23,
) -> DataFrame:
    """Deterministic mixture-of-Gaussians embedding fixture: k_centers
    well-separated centers (the md5-derived points, scaled by ``spread``),
    isotropic noise with per-coordinate std ``sigma``. Pure Catalyst and
    RNG-state-free — noise is an Irwin-Hall(3) sum of xxhash64-derived
    uniforms on [-1,1), so every (id, dim) coordinate is reproducible
    across sessions and parallelism levels.

    Purpose (r4 VERDICT ask #2): the driver's embeddings.parquet is
    near-uniform, where IVF recall can only track the probed cell
    fraction; real corpora are CLUSTERED, where a trained centroid table
    captures whole neighborhoods per cell. This fixture makes that
    demonstrable. The default spread/sigma is tuned so exact top-k is
    same-cluster (measured 1.00 at n=2000, dim=64, k=8) yet the
    within-cluster cone is wide enough that ARBITRARY centroids split
    clusters across cells (untrained recall@3 ≈ 0.60 at probe 2/8)
    while trained cluster-mean centroids hold them together
    (recall@3 = 1.00 at probe 1) — see tools/ann_recall_report.py.

    Returns (vec_id long, cluster int, embedding array<float>)."""
    centers = _planes(k_centers, dim, seed)
    cent_lit = F.array(*[_lit_darray(c) for c in centers])
    cluster = F.pmod(F.col("id"), F.lit(k_centers)).cast("int")

    def _u(d: F.Column, salt: int) -> F.Column:
        # xxhash64 → uniform on [-1, 1); three salts summed → ~N(0,1)
        return F.xxhash64(
            F.concat_ws(
                ":",
                F.col("id").cast("string"),
                d.cast("string"),
                F.lit(f"s{salt}"),
            )
        ) / F.lit(float(2**63))

    noise = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda d: _u(d, 1) + _u(d, 2) + _u(d, 3),
    )
    emb = F.zip_with(
        F.element_at(cent_lit, cluster + 1),
        noise,
        lambda c, nz: (c * F.lit(spread) + nz * F.lit(sigma)).cast("float"),
    )
    return spark.range(n).select(
        F.col("id").cast("long").alias("vec_id"),
        cluster.alias("cluster"),
        emb.alias("embedding"),
    )


def ann_recall(ann: DataFrame, exact: DataFrame) -> float:
    """recall@k of an ANN result against the brute-force top-k on the same
    queries: |ANN ∩ exact| / |exact| over (query_id, neighbor_id) pairs.
    One small aggregate — report-time metric, not a hot-path operator."""
    hit = ann.select("query_id", "neighbor_id").intersect(
        exact.select("query_id", "neighbor_id")
    )
    n_exact = exact.count()
    return (hit.count() / n_exact) if n_exact else 1.0


def eval_topk(
    pred: DataFrame,
    truth: DataFrame,
    k: int = 5,
    query_col: str = "query_id",
    item_col: str = "neighbor_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Distributed top-k retrieval evaluation → one row per truth query:
    (query, n_hit, n_truth, recall_micro, mrr_micro). The per-query,
    cluster-scale upgrade of ann_recall's two driver-side counts: when
    the eval set is millions of queries (scoring an ANN index build, or
    comparing two rankers), the metrics themselves must be a DataFrame,
    not a float — so they can be sliced, joined to query metadata, and
    regression-diffed between runs.

    Exact integer arithmetic end to end (the repo's micro-quantization
    discipline): recall@k = (n_hit·1e6) div n_truth, MRR = 1e6 div
    (best predicted rank among hits), 0 when nothing hit — bit-stable
    at any parallelism, no float division anywhere. Both inputs are
    truncated to rank ≤ k first, so an over-fetched candidate list
    can't inflate recall. Queries present only in pred are ignored
    (evaluation is defined over the truth set); truth queries with no
    predictions still get a row (n_hit = 0) via the left join.

    Shape: one (query, item) equi-join + two query-keyed aggregations
    — every shuffle is on the query key, nothing is collected, and the
    hit join's width is bounded by k per query, so skew cannot exceed
    k rows per key by construction."""
    p = pred.where(F.col(rank_col) <= k).select(
        F.col(query_col).alias("query"),
        F.col(item_col).alias("item"),
        F.col(rank_col).cast("long").alias("_pr"),
    )
    t = truth.where(F.col(rank_col) <= k).select(
        F.col(query_col).alias("query"),
        F.col(item_col).alias("item"),
    )
    per_truth = t.groupBy("query").agg(F.count(F.lit(1)).alias("n_truth"))
    hits = (
        t.join(p, ["query", "item"])
        .groupBy("query")
        .agg(
            F.count(F.lit(1)).alias("_n_hit"),
            F.min("_pr").alias("_best"),
        )
    )
    return (
        per_truth.join(hits, "query", "left")
        .select(
            "query",
            F.coalesce(F.col("_n_hit"), F.lit(0)).alias("n_hit"),
            "n_truth",
            "_best",
        )
        .select(
            "query",
            "n_hit",
            "n_truth",
            F.expr("(n_hit * 1000000) div n_truth").alias("recall_micro"),
            F.when(F.col("_best").isNotNull(), F.expr("1000000 div _best"))
            .otherwise(F.lit(0))
            .cast("long")
            .alias("mrr_micro"),
        )
    )


# ------------------------------------------------------------------
# Product quantization (PQ): the memory-scale ANN technique — vectors
# compressed to m small codes (one per subspace), queries scored against
# codes via an asymmetric distance table (ADC), no full vectors touched
# at search time. At 100 TB the win is the storage/shuffle footprint:
# a 64-dim float vector (256 B) becomes m=4 bytes of codes.
# ------------------------------------------------------------------


def pq_seed_codebooks(
    m: int = 4, k: int = 16, dim: int = 64, seed: int = 31
) -> list[list[list[float]]]:
    """Deterministic md5-derived codebooks (k centroids per subspace of
    dim/m dims) — the oracle-checkable configuration, same philosophy as
    the IVF seed centroids; train_pq_codebooks is the drop-in quality
    swap (rounds=0 reproduces these exactly)."""
    sub = dim // m
    return [_planes(k, sub, seed + j) for j in range(m)]


def _pq_assign(subvec, cents: list[list[float]]) -> F.Column:
    """argmin_c |x − c|² over centroid literals, computed as
    |c|² − 2·x·c (the |x|² term is constant per row and cancels from the
    argmin). Deterministic tie-break: lowest code wins (array_sort on
    (d, code) structs)."""
    scored = F.array(*[
        F.struct(
            (
                F.lit(sum(x * x for x in c)) - 2.0 * _dot_lit(subvec, c)
            ).alias("d"),
            F.lit(i).alias("code"),
        )
        for i, c in enumerate(cents)
    ])
    return F.element_at(F.array_sort(scored), 1)["code"]


def _pq_codes_col(vec_col, codebooks, kernel: str) -> F.Column:
    if kernel == "catalyst":
        sub = len(codebooks[0][0])
        return F.array(*[
            _pq_assign(
                F.slice(_vecd(vec_col), j * sub + 1, sub), cb
            ).cast("int")
            for j, cb in enumerate(codebooks)
        ])
    return _arrow_pq_codes(codebooks)(vec_col)


def pq_encode(
    df: DataFrame, codebooks: list[list[list[float]]],
    id_col: str = "vec_id", vec: str = "embedding", kernel: str = "arrow",
) -> DataFrame:
    """(id, codes array<int>) — m nearest-centroid codes per vector,
    zero shuffle: encoding composes into the corpus scan as a
    projection. kernel="arrow" (default, vectorized numpy) and
    kernel="catalyst" (centroid literals in HOF expressions, the
    oracle-replayable reference) are bit-identical — see the kernels
    note at the top of this module."""
    return df.select(
        F.col(id_col).alias("id"),
        _pq_codes_col(F.col(vec), codebooks, kernel).alias("codes"),
    )


def _pq_dtab_col(vec_col, codebooks, kernel: str) -> F.Column:
    m, sub = len(codebooks), len(codebooks[0][0])
    if kernel == "catalyst":
        return F.array(*[
            F.aggregate(
                F.zip_with(
                    F.slice(_vecd(vec_col), j * sub + 1, sub),
                    _lit_darray(c),
                    lambda x, y: (x - y) * (x - y),
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
            for j in range(m)
            for c in codebooks[j]
        ])
    return _arrow_pq_dtab(codebooks)(vec_col)


def pq_adc_topk(
    queries: DataFrame, corpus: DataFrame, codebooks: list[list[list[float]]],
    k: int = 3, id_q: str = "vec_id", id_c: str = "vec_id",
    vec: str = "embedding", kernel: str = "arrow",
) -> DataFrame:
    """ADC top-k: each query precomputes its m×k_cents distance table
    (true |q_j − c|² per subspace centroid — one row-local array), the
    corpus contributes ONLY codes, and a candidate's approximate distance
    is a fixed-order m-term table lookup sum — so the join moves 4-byte
    code arrays, never 256-byte vectors. The fold order (j = 0..m−1,
    left to right) is part of the contract: the DuckDB twin adds the same
    four doubles in the same order, making even the unrounded ranking
    comparable. kernel= selects the encode/dtab implementation
    (bit-identical pair — see the kernels note)."""
    m = len(codebooks)
    kc = len(codebooks[0])
    codes = pq_encode(corpus, codebooks, id_col=id_c, vec=vec,
                      kernel=kernel).select(
        F.col("id").alias("neighbor_id"), "codes"
    )
    q = queries.select(
        F.col(id_q).alias("query_id"),
        _pq_dtab_col(F.col(vec), codebooks, kernel).alias("dtab"),
    )
    adc = F.aggregate(
        F.sequence(F.lit(0), F.lit(m - 1)),
        F.lit(0.0),
        lambda acc, j: acc
        + F.element_at(
            F.col("dtab"), (j * kc + F.element_at(F.col("codes"), j + 1) + 1).cast("int")
        ),
    )
    scored = (
        F.broadcast(q)
        .crossJoin(codes)
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", adc.alias("adc"))
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("adc"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "adc", "rank")
    )


def ivfpq_adc_topk(
    queries: DataFrame, corpus: DataFrame,
    codebooks: list[list[list[float]]],
    k: int = 3, n_cells: int = 8, n_probe: int = 2, dim: int = 64,
    seed: int = 11, centroids: list[list[float]] | None = None,
    id_q: str = "vec_id", id_c: str = "vec_id", vec: str = "embedding",
    kernel: str = "arrow",
) -> DataFrame:
    """IVF-PQ: the two memory-scale pieces composed the FAISS way —
    coarse cells bound WHICH candidates are scored (equi-join on cell,
    never a cross join), PQ codes bound WHAT the join moves (m bytes per
    candidate, never the vector). Corpus side is one projection (cell +
    codes); query side explodes its n_probe cells and carries its ADC
    distance table; the probe is an equi-join on cell followed by the
    same fixed-order m-term table-lookup sum as pq_adc_topk.

    This variant encodes the RAW vector (IVF-Flat-PQ) rather than the
    residual, so the codebooks are shared across cells and the whole
    operator stays oracle-expressible; residual encoding is a drop-in
    refinement (subtract the cell centroid literal before pq_encode) that
    changes only the encode/table expressions, not the join shape."""
    m = len(codebooks)
    kc = len(codebooks[0])
    cents = centroids if centroids is not None else _planes(n_cells, dim, seed)
    c = corpus.select(
        F.col(id_c).alias("neighbor_id"),
        F.element_at(_cells_col(F.col(vec), cents, 1, kernel), 1).alias("cell"),
        _pq_codes_col(F.col(vec), codebooks, kernel).alias("codes"),
    )
    q = queries.select(
        F.col(id_q).alias("query_id"),
        _pq_dtab_col(F.col(vec), codebooks, kernel).alias("dtab"),
        F.explode(_cells_col(F.col(vec), cents, n_probe, kernel)).alias("cell"),
    )
    adc = F.aggregate(
        F.sequence(F.lit(0), F.lit(m - 1)),
        F.lit(0.0),
        lambda acc, j: acc
        + F.element_at(
            F.col("dtab"), (j * kc + F.element_at(F.col("codes"), j + 1) + 1).cast("int")
        ),
    )
    cand = (
        F.broadcast(q).join(c, "cell")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", adc.alias("adc"))
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("adc"), F.asc("neighbor_id"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "adc", "rank")
    )


def train_pq_codebooks(
    df: DataFrame, m: int = 4, k: int = 16, dim: int = 64, rounds: int = 3,
    vec: str = "embedding", seed: int = 31,
) -> list[list[list[float]]]:
    """Per-subspace Lloyd k-means in DataFrame algebra (same loop
    discipline as train_ivf_centroids: each round one aggregation job,
    the only driver transfer is the k×sub centroid table). rounds=0 ≡
    pq_seed_codebooks — the swap is drop-in and changes only literals."""
    sub = dim // m
    out = []
    for j in range(m):
        cents = _planes(k, sub, seed + j)
        sv = df.select(
            F.slice(_vecd(F.col(vec)), j * sub + 1, sub).alias("_v")
        )
        for _ in range(rounds):
            assigned = sv.select(
                _pq_assign(F.col("_v"), cents).alias("cell"), "_v"
            )
            rows = (
                assigned.select("cell", F.posexplode("_v").alias("pos", "x"))
                .groupBy("cell", "pos")
                .agg(F.avg("x").alias("mu"))
                .collect()
            )
            new = [list(c) for c in cents]
            for r in rows:
                new[r["cell"]][r["pos"]] = r["mu"]
            cents = new
        out.append(cents)
    return out


def pq_reconstruction_mse(
    df: DataFrame, codebooks: list[list[list[float]]], vec: str = "embedding"
) -> float:
    """Mean squared reconstruction error of the PQ code (per-subspace
    nearest centroid substituted for the true subvector) — the quality
    metric a codebook training pass must reduce. Report-time metric."""
    m, sub = len(codebooks), len(codebooks[0][0])
    err = None
    for j, cb in enumerate(codebooks):
        subv = F.slice(_vecd(F.col(vec)), j * sub + 1, sub)
        code = _pq_assign(subv, cb)
        cent_lit = F.array(*[_lit_darray(c) for c in cb])
        e = F.aggregate(
            F.zip_with(
                subv, F.element_at(cent_lit, code + 1),
                lambda x, y: (x - y) * (x - y),
            ),
            F.lit(0.0), lambda a, v: a + v,
        )
        err = e if err is None else err + e
    row = df.agg(F.avg(err).alias("mse")).collect()[0]
    return float(row["mse"])


def group_centroids_long(
    df: DataFrame, group_col: str, vec_col: str = "embedding",
    quant: int = 1_000_000,
) -> DataFrame:
    """Element-wise per-group centroids in LONG form: (group, dim,
    centroid) — the building block of k-means maintenance, per-source
    embedding drift monitoring, and IVF cell refresh.

    Scale + determinism shape: posexplode the vector (one generator, no
    UDF) → each component is quantized to integer micro-units BEFORE the
    sum, so the per-(group, dim) aggregate is an EXACT long sum — the
    float-addition-order dependence of sum(double) across partitions
    (which no engine pair, or even two runs of one engine, reproduces
    bit-for-bit) is gone by construction. centroid = sum_micro /
    (n * quant), one deterministic double division at the end — emitted
    at FULL precision: the division of exact operands is correctly
    rounded and therefore bit-identical on any IEEE-754 engine, whereas
    a display round(…, 6) re-introduces a tie hazard (s/n can land
    exactly on a half-micro boundary, where Spark's BigDecimal HALF_UP
    and another engine's float-multiply rounding may diverge; the
    rounding audit measured margin exactly 0 here). The shuffle carries
    (group, dim) pairs — map-side combinable, never a whole vector
    row."""
    exploded = df.select(
        F.col(group_col).alias("grp"),
        F.posexplode(_vecd(F.col(vec_col))).alias("dim", "v"),
    )
    q = exploded.withColumn(
        "v_micro", F.round(F.col("v") * F.lit(float(quant))).cast("long")
    )
    return (
        q.groupBy("grp", "dim")
        .agg(F.sum("v_micro").alias("s"), F.count("*").alias("n"))
        .select(
            F.col("grp").alias(group_col),
            F.col("dim").cast("long").alias("dim"),
            (
                F.col("s").cast("double") / (F.col("n") * F.lit(float(quant)))
            ).alias("centroid"),
        )
    )


def mutual_best_match(
    pairs: DataFrame,
    left_col: str = "query_id",
    right_col: str = "neighbor_id",
    score_col: str = "score",
) -> DataFrame:
    """Reciprocal best match over a scored pair table → (left, right,
    score) rows where each side is the other's argmax — the
    high-precision seed-pair extractor for entity alignment: when two
    KG builds (or an embedding space and a lexicon) must be linked,
    mutual-top-1 pairs are the near-certain anchors that bootstrap
    everything else, while one-directional best matches are polluted by
    hubs that are everyone's favorite without reciprocating.

    Deterministic argmax: highest score, ties broken by the SMALLEST
    partner id (row_number, the repo's pinned-tie discipline) — use an
    exact score (integer cents, micro-quantized cosine) for bit-stable
    results. Shape: two window passes over the same pair table (one
    shuffle per side's key) and one (left, right) equi-join of two
    argmax-thinned frames — each at most one row per key, so the join
    cannot fan out; no all-pairs stage. The oracle twin derives each
    argmax differently (max-score agg, then min-partner among the
    maxima) to keep the verification independent."""
    bl = (
        pairs.withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy(left_col).orderBy(
                    F.desc(score_col), F.asc(right_col)
                )
            ),
        )
        .where(F.col("_rn") == 1)
        .select(
            F.col(left_col).alias("left"),
            F.col(right_col).alias("right"),
            F.col(score_col).alias("score"),
        )
    )
    br = (
        pairs.withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy(right_col).orderBy(
                    F.desc(score_col), F.asc(left_col)
                )
            ),
        )
        .where(F.col("_rn") == 1)
        .select(
            F.col(left_col).alias("left"),
            F.col(right_col).alias("right"),
        )
    )
    return bl.join(br, ["left", "right"])


def gram_matrix(
    df: DataFrame, vec_col: str = "embedding", quant: int = 1000
) -> DataFrame:
    """Exact d×d Gram matrix of an embedding column → upper-triangle
    rows (i, j, g) with i ≤ j and g = Σ_rows v̂ᵢ·v̂ⱼ over milli-quantized
    components v̂ = round(v·quant): the distributed building block for
    PCA / whitening / covariance over 10^12 vectors — the data-sized
    pass reduces everything to a d(d+1)/2-cell matrix (metadata-sized,
    d=64 → 2080 longs), and the eigendecomposition that follows is a
    driver-side numpy call on that tiny result, never a Spark job.

    Exactness: quantize FIRST, multiply integers, sum in DECIMAL(38,0)
    — float dot products are order-dependent and would hash-differ
    across parallelism levels; integer products commute. With |v|≲1
    and quant=1000 each term is ≤ ~10^6, so even 10^12 rows stay
    within the decimal accumulator and the emitted long.

    Shape: per row one posexplode to (i, v̂ᵢ) then one posexplode of
    the TAIL SLICE from i (upper triangle only — half the generated
    rows; the matrix is symmetric), then a groupBy on (i, j): partial
    aggregation combines map-side, so the shuffle carries at most
    d(d+1)/2 rows per task regardless of data size. No join, no
    window, no Python."""
    q = F.transform(
        F.col(vec_col),
        lambda x: F.round(x.cast("double") * F.lit(float(quant)))
        .cast("long"),
    )
    step1 = df.select(q.alias("_q")).select(
        F.posexplode("_q").alias("i", "_vi"), F.col("_q")
    )
    step2 = step1.select(
        "i",
        "_vi",
        F.posexplode(
            F.slice("_q", F.col("i") + 1, F.size("_q") - F.col("i"))
        ).alias("_p", "_vj"),
    )
    return (
        step2.select(
            F.col("i").cast("long").alias("i"),
            (F.col("i") + F.col("_p")).cast("long").alias("j"),
            (F.col("_vi") * F.col("_vj")).cast("decimal(38,0)")
            .alias("_prod"),
        )
        .groupBy("i", "j")
        .agg(F.sum("_prod").alias("_g"))
        .select("i", "j", F.col("_g").cast("long").alias("g"))
    )


def int8_quantize(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Symmetric per-vector int8 quantization — the production storage
    staple for embedding tables (4× smaller than float32 before PQ's
    lossier 32×; the usual first rung of the compression ladder this
    module's PQ/IVF-PQ sit above). Per vector: scale = max |v_i|,
    codes_i = round(v_i·127 / scale) ∈ [−127, 127], plus the exact
    reconstruction diagnostics a rollout gate needs:

        mse_micro = round(mean((v_i − codes_i·scale/127)²) · 1e6)
        max_err_micro = round(max |v_i − codes_i·scale/127| · 1e6)

    All array algebra (transform / aggregate), zero UDFs; codes are
    integers so downstream dot products can run in exact integer
    arithmetic per vector pair (the gram_matrix/centroid discipline).
    Zero vectors (scale = 0) emit all-zero codes and zero error. The
    rounding shapes are single fixed double expressions, so the SQL
    oracle replays every code and both diagnostics."""
    v = F.col(vec_col)
    scale = F.array_max(F.transform(v, lambda x: F.abs(x)))
    codes = F.when(F.col("_scale") > 0, F.transform(
        v, lambda x: F.round(x * F.lit(127.0) / F.col("_scale"))
        .cast("int"),
    )).otherwise(F.transform(v, lambda x: F.lit(0)))
    base = emb.select(
        F.col(id_col), v.alias(vec_col), scale.alias("_scale")
    ).withColumn("codes", codes)
    err = F.zip_with(
        F.col(vec_col), F.col("codes"),
        lambda x, c: x - c * F.col("_scale") / F.lit(127.0),
    )
    sq = F.aggregate(
        F.col("_err"), F.lit(0.0), lambda a, e: a + e * e
    )
    mx = F.aggregate(
        F.col("_err"), F.lit(0.0),
        lambda a, e: F.greatest(a, F.abs(e)),
    )
    n = F.size(F.col(vec_col))
    return (
        base.withColumn("_err", err)
        .select(
            id_col, "codes",
            F.col("_scale").alias("scale"),
            F.round(sq / n * F.lit(1_000_000.0)).cast("long")
            .alias("mse_micro"),
            F.round(mx * F.lit(1_000_000.0)).cast("long")
            .alias("max_err_micro"),
        )
    )
