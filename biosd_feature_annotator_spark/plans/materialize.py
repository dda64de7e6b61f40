"""Graph materialization, lineage manifests, resume, purge
(SURVEY.md §2.1 S4/S6/S7, §2.4 J4).

The reference bulk-flushed annotations through Hibernate inside a DB
transaction (persistence/AnnotatorPersister — reconstructed); its resume
unit was the transaction. The engine's unit is the *partition*:

- triples land partitioned by (run_id, part_id) where
  part_id = pmod(xxhash64(conv_id), n_parts) — every conversation maps to
  exactly one part, so a part is a self-contained, idempotently
  re-writable unit (dynamic partition overwrite).
- after the write, one manifest row per part records lineage + metrics:
  input rows, emitted triples, an order-insensitive content fingerprint
  (bit_xor of row hashes), wall time. This is the parquet-backend stand-in
  for an Iceberg snapshot (SURVEY.md §7.3(1)); on a cluster the same code
  targets `df.writeTo(table).overwritePartitions()`.
- resume: parts present in the manifest with status=done are anti-joined
  out of the input (J4) — a crashed run re-processes only missing parts,
  and re-writing a part is idempotent.
- purge (S7): drop one run's partition directories (Iceberg:
  DELETE WHERE run_id = ...).

Write amplification note for 100 TB: partitionBy(run_id, part_id) with
part_id pre-shuffled means each task writes exactly one partition dir —
no small-file explosion. n_parts should be ~#executor-cores × small
constant locally, thousands on a cluster.
"""

from __future__ import annotations

import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.lexicon import Lexicon
from .pipeline import annotate

MANIFEST_SCHEMA = (
    "run_id string, part_id int, status string, n_rows long, n_triples long, "
    "input_fingerprint long, triple_fingerprint long, wall_ms long, ts timestamp"
)


def with_part_id(df: DataFrame, n_parts: int, key: str = "conv_id") -> DataFrame:
    return df.withColumn(
        "part_id", F.pmod(F.xxhash64(key), F.lit(n_parts)).cast("int")
    )


def fingerprint(df: DataFrame, cols: list[str], by: str = "part_id") -> DataFrame:
    """Order-insensitive per-part content hash: bit_xor of per-row xxhash64.
    bit_xor never overflows (sum would, under ANSI mode) and is
    commutative — identical at any parallelism."""
    row_h = F.xxhash64(*[F.coalesce(F.col(c).cast("string"), F.lit("\0")) for c in cols])
    return (
        df.withColumn("_h", row_h)
        .groupBy(by)
        .agg(F.count("*").alias("n"), F.expr("bit_xor(_h)").alias("fp"))
    )


def manifest_path(out_dir: str) -> str:
    return os.path.join(out_dir, "manifests")


def read_manifests(spark: SparkSession, out_dir: str) -> DataFrame | None:
    p = manifest_path(out_dir)
    if not os.path.exists(p):
        return None
    return spark.read.parquet(p)


def materialize_graph(
    tables: dict[str, DataFrame], out_dir: str, run_id: str
) -> None:
    """S4: write nodes/edges (triples go through run_annotate's
    partitioned path)."""
    for name in ("nodes", "edges"):
        if name in tables:
            tables[name].write.mode("overwrite").parquet(
                os.path.join(out_dir, name, f"run_id={run_id}")
            )


def run_annotate(
    spark: SparkSession,
    transcripts: DataFrame,
    lex: Lexicon,
    out_dir: str,
    run_id: str,
    n_parts: int = 32,
    only_parts: list[int] | None = None,
    resume: bool = False,
    build_graph: bool = True,
    extraction: str = "python",
) -> DataFrame:
    """Annotate → partitioned triple sink + manifests. Returns the manifest
    rows written by THIS invocation.

    only_parts simulates a partial/crashed run in tests; resume=True skips
    parts already marked done in the manifest (anti-join J4).
    extraction: forwarded to plans.pipeline.annotate ("python" | "jvm").
    """
    t0 = time.time()
    src = with_part_id(transcripts, n_parts)

    if resume:
        done = read_manifests(spark, out_dir)
        if done is not None:
            done_parts = done.where(
                (F.col("run_id") == run_id) & (F.col("status") == "done")
            ).select("part_id").dropDuplicates()
            src = src.join(done_parts, "part_id", "left_anti")
    if only_parts is not None:
        src = src.where(F.col("part_id").isin(only_parts))

    plan = annotate(spark, src, lex, build_graph=build_graph, extraction=extraction)
    # part_id is a pure function of conv_id — recompute on the output
    # rather than joining it back through the pipeline
    triples = with_part_id(plan["triples"], n_parts)

    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    (
        triples.repartition("part_id")
        .write.partitionBy("part_id")
        .mode("overwrite")
        .parquet(os.path.join(out_dir, "triples", f"run_id={run_id}"))
    )

    # manifest: metrics from what was actually written (read-back = the
    # strongest lineage evidence) joined to input counts
    written = spark.read.parquet(os.path.join(out_dir, "triples", f"run_id={run_id}"))
    if only_parts is not None or resume:
        processed = src.select("part_id").dropDuplicates()
        written = written.join(processed, "part_id", "left_semi")
    t_fp = fingerprint(written, ["subj", "pred", "obj", "confidence"])
    i_fp = fingerprint(src, ["conv_id", "turn_idx", "text"])
    wall_ms = int((time.time() - t0) * 1000)
    manifest = (
        i_fp.withColumnRenamed("n", "n_rows").withColumnRenamed("fp", "input_fingerprint")
        .join(
            t_fp.withColumnRenamed("n", "n_triples").withColumnRenamed("fp", "triple_fingerprint"),
            "part_id",
            "left",
        )
        .select(
            F.lit(run_id).alias("run_id"),
            "part_id",
            F.lit("done").alias("status"),
            "n_rows",
            F.coalesce("n_triples", F.lit(0)).alias("n_triples"),
            "input_fingerprint",
            "triple_fingerprint",
            F.lit(wall_ms).alias("wall_ms"),
            F.current_timestamp().alias("ts"),
        )
    )
    manifest.write.mode("append").parquet(manifest_path(out_dir))

    if build_graph:
        materialize_graph(plan, out_dir, run_id)
    return spark.read.parquet(manifest_path(out_dir)).where(F.col("run_id") == run_id)


def read_triples(spark: SparkSession, out_dir: str, run_id: str | None = None) -> DataFrame:
    p = os.path.join(out_dir, "triples")
    if run_id is not None:
        return spark.read.parquet(os.path.join(p, f"run_id={run_id}"))
    return spark.read.option("basePath", p).parquet(p)


def diff_runs(
    spark: SparkSession, out_dir: str, run_a: str, run_b: str
) -> DataFrame:
    """Triple-level diff of two materialized runs: (change, subj, pred,
    obj) where change ∈ {added, removed} — added = in B not A, removed =
    in A not B. The KG-maintenance primitive: after re-annotating with a
    new dictionary or grammar, the diff IS the review set, and shipping
    `added` as inserts + `removed` as deletes turns a full re-run into an
    incremental update of a downstream store.

    Two left-anti joins on the (subj, pred, obj) identity — each shuffles
    only its probe side and nothing wider than the key columns; no full
    outer join materializing the union of both runs."""
    key = ["subj", "pred", "obj"]
    a = read_triples(spark, out_dir, run_a).select(*key).dropDuplicates(key)
    b = read_triples(spark, out_dir, run_b).select(*key).dropDuplicates(key)
    added = b.join(a, key, "left_anti").select(F.lit("added").alias("change"), *key)
    removed = a.join(b, key, "left_anti").select(
        F.lit("removed").alias("change"), *key
    )
    return added.unionByName(removed)


def apply_diff(base: DataFrame, diff: DataFrame) -> DataFrame:
    """Apply a diff_runs result to a base triple set: (base ∖ removed) ∪
    added — the CONSUMER half of the diff contract, turning a shipped
    delta back into the target state. Round-trip law (tested):
    apply_diff(A, diff_runs(A, B)) is set-identical to B, so a
    downstream store that replays deltas never drifts from a full
    re-materialization — the same recompute-equivalence discipline as
    incremental_components, here for the triple store itself.

    Shape: one left-anti join (keyed on the triple identity, probe side
    = base) + one union — removed/added are delta-sized, so at 100 TB
    this is a delta job, never a rescan of history. Duplicate-free on
    the identity by construction (base is de-duplicated on the key, and
    `added` is by definition absent from it)."""
    key = ["subj", "pred", "obj"]
    b = base.select(*key).dropDuplicates(key)
    removed = diff.where(F.col("change") == "removed").select(*key)
    added = diff.where(F.col("change") == "added").select(*key)
    return b.join(removed, key, "left_anti").unionByName(added)


def _rewrite_manifests(spark: SparkSession, out_dir: str, keep) -> None:
    """Rewrite the manifest store keeping only rows matching `keep` —
    write-to-temp + atomic directory swap, never overwrite-in-place while
    reading (manifests are metadata-sized; on Iceberg this is a metadata
    DELETE)."""
    p = manifest_path(out_dir)
    if not os.path.exists(p):
        return
    tmp = p + ".rewrite"
    spark.read.parquet(p).where(keep).write.mode("overwrite").parquet(tmp)
    shutil.rmtree(p)
    os.rename(tmp, p)


def purge_run(out_dir: str, run_id: str, spark: SparkSession | None = None) -> None:
    """S7: drop one run's data (local parquet backend: remove partition
    dirs; Iceberg backend: DELETE FROM ... WHERE run_id=...).

    With a SparkSession the run's manifest rows are dropped too —
    otherwise a later resume=True of the same run_id would anti-join every
    part out against the stale status='done' rows and silently produce no
    output while reporting success."""
    for name in ("triples", "nodes", "edges"):
        p = os.path.join(out_dir, name, f"run_id={run_id}")
        if os.path.exists(p):
            shutil.rmtree(p)
    if spark is not None:
        _rewrite_manifests(spark, out_dir, F.col("run_id") != run_id)


def purge_older_than(spark: SparkSession, out_dir: str, cutoff) -> list[str]:
    """Retention purge (the reference's age-based annotation cleanup,
    SURVEY.md §3.3): drop every run whose NEWEST manifest row is older
    than `cutoff` (a timestamp or ISO string), data + manifests. Returns
    the purged run_ids."""
    m = read_manifests(spark, out_dir)
    if m is None:
        return []
    old = (
        m.groupBy("run_id")
        .agg(F.max("ts").alias("newest"))
        .where(F.col("newest") < F.lit(cutoff).cast("timestamp"))
        .select("run_id")
        .collect()
    )
    run_ids = sorted(r.run_id for r in old)
    for rid in run_ids:
        purge_run(out_dir, rid, spark=spark)
    return run_ids


def partial_agg_state(df: DataFrame, keys: list[str], value_col: str) -> DataFrame:
    """Mergeable per-key aggregate state: (keys..., cnt, total, vmin,
    vmax). The incremental-maintenance half of a materialized aggregate:
    each run materializes its OWN partial state, and merge_agg_states
    combines any number of them without touching raw rows — count/sum/
    min/max are the classic commutative-monoid aggregates, so merging
    partials is exact (the same algebra Spark's partial aggregation uses
    inside a single shuffle, lifted to cross-RUN granularity). At 100 TB
    this is how run-level stats stay O(distinct keys) instead of
    re-scanning every run's raw triples."""
    return df.groupBy(*keys).agg(
        F.count(value_col).alias("cnt"),
        F.sum(value_col).alias("total"),
        F.min(value_col).alias("vmin"),
        F.max(value_col).alias("vmax"),
    )


def merge_agg_states(states: list[DataFrame], keys: list[str]) -> DataFrame:
    """Merge partial states from several runs into one exact aggregate —
    a union + one map-side-combinable re-aggregate (never a join chain):
    counts/sums add, min/max fold."""
    u = states[0]
    for s in states[1:]:
        u = u.unionByName(s)
    return u.groupBy(*keys).agg(
        F.sum("cnt").alias("cnt"),
        F.sum("total").alias("total"),
        F.min("vmin").alias("vmin"),
        F.max("vmax").alias("vmax"),
    )
