"""A2/J3: connected components + salted aggregation."""

from __future__ import annotations

from pyspark.sql import functions as F

from biosd_feature_annotator_spark.operators.canonicalize import (
    connected_components,
    salted_min,
)


def comps(spark, edges):
    df = spark.createDataFrame(edges, "src string, dst string")
    rows = connected_components(df, max_iter=10).collect()
    out = {}
    for r in rows:
        out.setdefault(r.comp, set()).add(r.node)
    return sorted(out.values(), key=sorted)


def test_cc_two_components(spark):
    got = comps(spark, [("a", "b"), ("b", "c"), ("x", "y")])
    assert got == [{"a", "b", "c"}, {"x", "y"}]


def test_cc_chain_needs_iterations(spark):
    # a long path graph exercises multi-round convergence (diameter > 2)
    n = 12
    edges = [(f"n{i:02d}", f"n{i+1:02d}") for i in range(n)]
    got = comps(spark, edges)
    assert len(got) == 1 and len(got[0]) == n + 1


def test_cc_star_skew(spark):
    # hot hub: 200 spokes — the skew case salting is for
    edges = [("hub", f"s{i:03d}") for i in range(200)]
    got = comps(spark, edges)
    assert len(got) == 1 and len(got[0]) == 201


def test_salted_min_equals_plain_min(spark):
    df = spark.range(0, 10_000).select(
        (F.col("id") % 7).cast("string").alias("k"),
        F.concat(F.lit("v"), F.lpad((F.pmod(F.xxhash64("id"), F.lit(1000))).cast("string"), 4, "0")).alias("v"),
    )
    plain = {r.k: r.v for r in df.groupBy("k").agg(F.min("v").alias("v")).collect()}
    salted = {r.k: r.v for r in salted_min(df, "k", "v", n_salt=16).collect()}
    assert plain == salted
