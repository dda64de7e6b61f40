"""Mergeable grid-quantile sketch (operators/sketches.py): merge
exactness (the materialized-view property) and the one-bucket-width
error bound vs the discrete order statistic."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from biosd_feature_annotator_spark.operators import sketches as S

LO, HI, NB = 0.0, 1_000_000.0, 10_000
WIDTH = (HI - LO) / NB  # 100.0 in value units


def _orders(spark):
    return spark.read.parquet("/root/testdata/sf0.001/orders.parquet")


def test_merge_of_parts_equals_state_of_whole(spark):
    o = _orders(spark)
    whole = S.grid_quantile_state(o, ["o_orderstatus"], "o_totalprice", LO, HI, NB)
    parts = [
        S.grid_quantile_state(
            o.where(f"o_orderkey % 3 = {i}"),
            ["o_orderstatus"], "o_totalprice", LO, HI, NB)
        for i in range(3)
    ]
    merged = S.merge_quantile_states(*parts)
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, whole.collect()))


def test_quantile_within_one_bucket_of_order_statistic(spark):
    """The sketch's guarantee is vs the DISCRETE quantile (the
    ⌈q·n⌉-th smallest value, which provably falls in the selected
    bucket): 0 ≤ estimate − order_stat ≤ width. Interpolating
    percentile() can sit further away on sparse data; that gap is the
    interpolation's, not the sketch's."""
    o = _orders(spark)
    st = S.grid_quantile_state(o, ["o_orderstatus"], "o_totalprice", LO, HI, NB)
    got = {r.o_orderstatus: (r.p50, r.p95) for r in S.state_quantiles(
        st, ["o_orderstatus"], {"p50": (1, 2), "p95": (19, 20)},
        LO, HI, NB).collect()}
    rows = o.select("o_orderstatus", "o_totalprice").collect()
    by_key: dict[str, list[float]] = {}
    for r in rows:
        by_key.setdefault(r.o_orderstatus, []).append(r.o_totalprice)
    for k, vals in by_key.items():
        vals.sort()
        for (num, den), est in zip([(1, 2), (19, 20)], got[k]):
            order_stat = vals[math.ceil(num / den * len(vals)) - 1]
            assert 0.0 <= est - order_stat <= WIDTH, (k, num, den, est, order_stat)


def test_state_is_small_and_clamps_outliers(spark):
    o = _orders(spark)
    st = S.grid_quantile_state(o, ["o_orderstatus"], "o_totalprice", LO, HI, NB)
    n_keys = o.select("o_orderstatus").distinct().count()
    assert st.count() <= n_keys * NB
    # out-of-range values land in the end buckets, never outside the grid
    wild = o.withColumn(
        "o_totalprice",
        F.when(F.col("o_orderkey") % 100 == 0, F.lit(-5.0e7))
        .when(F.col("o_orderkey") % 100 == 1, F.lit(5.0e7))
        .otherwise(F.col("o_totalprice")),
    )
    stw = S.grid_quantile_state(wild, ["o_orderstatus"], "o_totalprice", LO, HI, NB)
    mn, mx = stw.agg(F.min("bucket"), F.max("bucket")).first()
    assert mn == 0 and mx == NB - 1
    assert stw.agg(F.sum("cnt")).first()[0] == o.count()
