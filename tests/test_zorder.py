"""Z-order layout tests: correctness of the Morton key and the actual
pruning property — per-file bounding boxes must shrink vs the naive
layout, since that is the entire point of the clustering."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from biosd_feature_annotator_spark.plans.zorder import zorder_layout, zvalue

SF = "/root/testdata/sf0.001"


def _interleave_ref(x: int, y: int, bits: int = 16) -> int:
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def test_zvalue_matches_reference_bit_interleave(spark):
    df = spark.createDataFrame(
        [(x, y) for x in (0, 1, 5, 255, 65535) for y in (0, 2, 7, 1024, 65535)],
        "x long, y long",
    )
    rows = df.select("x", "y", zvalue(F.col("x"), F.col("y")).alias("z")).collect()
    for r in rows:
        assert r.z == _interleave_ref(r.x, r.y), (r.x, r.y)


def test_zvalue_preserves_locality_order(spark):
    # Morton keys of a 2x2 quad must sort before any key of the next
    # quad level — the property range partitioning relies on
    assert _interleave_ref(1, 1) < _interleave_ref(0, 2)
    assert _interleave_ref(3, 3) < _interleave_ref(4, 0)


def test_zorder_layout_shrinks_per_file_bounding_boxes(spark, tmp_path):
    e = spark.read.parquet(f"{SF}/events.parquet").select(
        "event_id",
        F.pmod(F.col("user_id"), F.lit(65536)).cast("long").alias("xk"),
        F.pmod(
            F.floor(F.coalesce(F.col("value"), F.lit(0.0))).cast("long"),
            F.lit(65536),
        ).alias("yk"),
    )
    n_files = 8
    naive_dir = str(tmp_path / "naive")
    z_dir = str(tmp_path / "zorder")
    # naive: whatever partitioning the scan produced, coalesced to n files
    e.repartition(n_files).write.mode("overwrite").parquet(naive_dir)
    zorder_layout(e, "xk", "yk", n_files).write.mode("overwrite").parquet(z_dir)

    def mean_box_area(d):
        areas = []
        for f in glob.glob(os.path.join(d, "*.parquet")):
            stats = (
                spark.read.parquet(f)
                .agg(
                    F.min("xk"), F.max("xk"), F.min("yk"), F.max("yk"),
                    F.count("*"),
                )
                .collect()[0]
            )
            if stats[4] == 0:
                continue
            areas.append((stats[1] - stats[0] + 1) * (stats[3] - stats[2] + 1))
        return sum(areas) / len(areas)

    naive_area, z_area = mean_box_area(naive_dir), mean_box_area(z_dir)
    # hash-partitioned files each span ~the whole (x, y) domain; z-ordered
    # files cover compact rectangles. Require a decisive (not marginal) win
    # so the assertion can't pass on noise.
    assert z_area < naive_area * 0.5, (naive_area, z_area)

    # row preservation: layout must be a pure reshuffle
    a = spark.read.parquet(naive_dir).count()
    b = spark.read.parquet(z_dir).count()
    assert a == b == e.count()
