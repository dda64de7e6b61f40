"""S4/S6/S7/J4: partitioned sink, manifests, resume, purge
(SURVEY.md §5.2(6): kill after partition k, rerun, assert no dup triples
and identical final hash)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from biosd_feature_annotator_spark.plans.materialize import (
    purge_run,
    read_manifests,
    read_triples,
    run_annotate,
)
from biosd_feature_annotator_spark.synth import synth_transcripts

N_PARTS = 8


@pytest.fixture(scope="module")
def transcripts(spark):
    df = synth_transcripts(spark, 800).persist()
    df.count()
    return df


def table_fp(df):
    return (
        df.select(
            F.xxhash64(
                *[F.coalesce(F.col(c).cast("string"), F.lit("\0"))
                  for c in ("subj", "pred", "obj", "confidence")]
            ).alias("h")
        )
        .agg(F.expr("bit_xor(h)"), F.count("*"))
        .collect()[0]
    )


def test_resume_after_partial_run(spark, lexicon, transcripts, tmp_path):
    out_full = str(tmp_path / "full")
    out_part = str(tmp_path / "partial")

    # reference: single-shot full run
    run_annotate(spark, transcripts, lexicon, out_full, "r", N_PARTS, build_graph=False)
    full_fp = table_fp(read_triples(spark, out_full, "r"))

    # crashed run: only parts 0-3 complete, then resume finishes the rest
    run_annotate(
        spark, transcripts, lexicon, out_part, "r", N_PARTS,
        only_parts=[0, 1, 2, 3], build_graph=False,
    )
    m1 = read_manifests(spark, out_part)
    assert m1.where("status = 'done'").count() == 4

    run_annotate(
        spark, transcripts, lexicon, out_part, "r", N_PARTS,
        resume=True, build_graph=False,
    )
    m2 = read_manifests(spark, out_part)
    # every part done exactly once — no duplicate manifests, no dup triples
    assert m2.groupBy("part_id").count().where("count > 1").count() == 0
    assert m2.count() == N_PARTS
    assert table_fp(read_triples(spark, out_part, "r")) == full_fp


def test_resume_is_idempotent_noop(spark, lexicon, transcripts, tmp_path):
    out = str(tmp_path / "noop")
    run_annotate(spark, transcripts, lexicon, out, "r", N_PARTS, build_graph=False)
    fp1 = table_fp(read_triples(spark, out, "r"))
    run_annotate(spark, transcripts, lexicon, out, "r", N_PARTS, resume=True, build_graph=False)
    assert read_manifests(spark, out).count() == N_PARTS
    assert table_fp(read_triples(spark, out, "r")) == fp1


def test_purge(spark, lexicon, transcripts, tmp_path):
    out = str(tmp_path / "purge")
    run_annotate(spark, transcripts, lexicon, out, "a", 4, build_graph=False)
    run_annotate(spark, transcripts, lexicon, out, "b", 4, build_graph=False)
    purge_run(out, "a")
    assert not os.path.exists(os.path.join(out, "triples", "run_id=a"))
    assert read_triples(spark, out, "b").count() > 0


def test_manifest_fingerprints_match_content(spark, lexicon, transcripts, tmp_path):
    """The manifest's per-part triple fingerprint must equal a recomputed
    fingerprint of the stored triples — lineage is verifiable, not advisory."""
    out = str(tmp_path / "fp")
    run_annotate(spark, transcripts, lexicon, out, "r", 4, build_graph=False)
    from biosd_feature_annotator_spark.plans.materialize import fingerprint

    recomputed = fingerprint(
        read_triples(spark, out, "r"), ["subj", "pred", "obj", "confidence"]
    )
    stored = read_manifests(spark, out).select(
        "part_id", F.col("n_triples").alias("n"), F.col("triple_fingerprint").alias("fp")
    )
    diff = recomputed.join(stored, "part_id").where(
        (recomputed.n != stored.n) | (recomputed.fp != stored.fp)
    )
    assert diff.count() == 0


def test_purge_with_spark_rewrites_manifests_and_resume_reprocesses(
    spark, lexicon, transcripts, tmp_path
):
    """ADVICE r1: purge must not leave status='done' manifest rows behind —
    a resumed re-run of a purged run_id would otherwise anti-join every
    part out and silently 'succeed' with no output."""
    out = str(tmp_path / "purge_m")
    run_annotate(spark, transcripts, lexicon, out, "a", 4, build_graph=False)
    run_annotate(spark, transcripts, lexicon, out, "b", 4, build_graph=False)
    fp_a = table_fp(read_triples(spark, out, "a"))

    purge_run(out, "a", spark=spark)
    m = read_manifests(spark, out)
    assert m.where("run_id = 'a'").count() == 0       # rows gone
    assert m.where("run_id = 'b'").count() == 4       # other run intact

    # resume of the purged run re-processes everything and restores data
    run_annotate(spark, transcripts, lexicon, out, "a", 4, resume=True, build_graph=False)
    assert table_fp(read_triples(spark, out, "a")) == fp_a
    assert read_manifests(spark, out).where("run_id = 'a'").count() == 4


def test_purge_older_than_retention(spark, lexicon, transcripts, tmp_path):
    from biosd_feature_annotator_spark.plans.materialize import purge_older_than

    out = str(tmp_path / "retention")
    run_annotate(spark, transcripts, lexicon, out, "old", 4, build_graph=False)
    run_annotate(spark, transcripts, lexicon, out, "new", 4, build_graph=False)
    # cutoff between the two runs' manifest timestamps: nothing is older
    # than epoch; everything is older than year 3000
    assert purge_older_than(spark, out, "1990-01-01 00:00:00") == []
    assert read_triples(spark, out, "old").count() > 0
    purged = purge_older_than(spark, out, "3000-01-01 00:00:00")
    assert purged == ["new", "old"]
    assert not os.path.exists(os.path.join(out, "triples", "run_id=old"))
    assert read_manifests(spark, out).count() == 0


def test_max_text_len_guard(spark, tmp_path):
    """P3: over-long turns are filtered JVM-side (visible as a Filter in
    the plan) while NULL-text turns survive (they still carry structure)."""
    import contextlib
    import io

    from biosd_feature_annotator_spark.sources.transcripts import (
        read_transcripts,
        write_transcripts,
    )

    rows = [
        ("c0", 0, "user", "short turn", None),
        ("c0", 1, "assistant", "x" * 5000, None),
        ("c1", 0, "user", None, None),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string"
    ).withColumn("ts", F.timestamp_seconds(F.lit(1704067200)))
    p = str(tmp_path / "len_guard")
    write_transcripts(df, p, n_buckets=2)

    got = read_transcripts(spark, p, max_text_len=1000)
    kept = {(r.conv_id, r.turn_idx) for r in got.collect()}
    assert kept == {("c0", 0), ("c1", 0)}  # long turn dropped, NULL kept

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        got.explain("formatted")
    plan = buf.getvalue()
    assert "length(text" in plan and "Filter" in plan


def test_diff_runs_added_and_removed(spark, lexicon, transcripts, tmp_path):
    """KG maintenance: the triple diff of two runs over different input
    subsets reports exactly the triples unique to each side."""
    from biosd_feature_annotator_spark.plans.materialize import diff_runs

    out = str(tmp_path / "diffout")
    convs = [r[0] for r in transcripts.select("conv_id").distinct().collect()]
    half = sorted(convs)[: len(convs) // 2]
    run_annotate(spark, transcripts.where(F.col("conv_id").isin(half)),
                 lexicon, out, "rA", n_parts=N_PARTS, build_graph=False)
    run_annotate(spark, transcripts, lexicon, out, "rB",
                 n_parts=N_PARTS, build_graph=False)

    d = diff_runs(spark, out, "rA", "rB")
    by = {r["change"]: r["n"]
          for r in d.groupBy("change").agg(F.count("*").alias("n")).collect()}
    # B ⊇ A: everything in the diff is 'added', nothing 'removed'
    assert by.get("removed", 0) == 0 and by["added"] > 0
    a = read_triples(spark, out, "rA").select("subj", "pred", "obj").dropDuplicates()
    b = read_triples(spark, out, "rB").select("subj", "pred", "obj").dropDuplicates()
    assert by["added"] == b.count() - a.count()
    # and the reverse direction flags them as removed
    rev = diff_runs(spark, out, "rB", "rA")
    assert rev.where("change = 'removed'").count() == by["added"]
    assert rev.where("change = 'added'").count() == 0


def test_run_annotate_jvm_backend_parity(spark, lexicon, transcripts, tmp_path):
    """The campaign sink produces the identical triple multiset with
    either extraction backend (the CLI's --extraction switch)."""
    out = str(tmp_path / "beout")
    run_annotate(spark, transcripts, lexicon, out, "rpy",
                 n_parts=N_PARTS, build_graph=False)
    run_annotate(spark, transcripts, lexicon, out, "rjvm",
                 n_parts=N_PARTS, build_graph=False, extraction="jvm")
    key = ["subj", "pred", "obj", "confidence"]
    a = read_triples(spark, out, "rpy").select(*key)
    b = read_triples(spark, out, "rjvm").select(*key)
    assert a.count() == b.count()
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_apply_diff_round_trips_to_target(spark, lexicon, transcripts, tmp_path):
    """The diff consumer contract: apply_diff(A, diff_runs(A, B)) must be
    set-identical to B — replaying deltas never drifts from a full
    re-materialization. Driven in BOTH directions (B ⊃ A exercises pure
    adds; A ⊂ B pure removes) plus a synthetic mixed diff."""
    from biosd_feature_annotator_spark.plans.materialize import (
        apply_diff,
        diff_runs,
    )

    out = str(tmp_path / "applyout")
    convs = [r[0] for r in transcripts.select("conv_id").distinct().collect()]
    half = sorted(convs)[: len(convs) // 2]
    run_annotate(spark, transcripts.where(F.col("conv_id").isin(half)),
                 lexicon, out, "rA", n_parts=N_PARTS, build_graph=False)
    run_annotate(spark, transcripts, lexicon, out, "rB",
                 n_parts=N_PARTS, build_graph=False)
    key = ["subj", "pred", "obj"]
    a = read_triples(spark, out, "rA").select(*key).dropDuplicates(key)
    b = read_triples(spark, out, "rB").select(*key).dropDuplicates(key)

    fwd = apply_diff(a, diff_runs(spark, out, "rA", "rB"))
    assert sorted(map(tuple, fwd.collect())) == sorted(map(tuple, b.collect()))
    rev = apply_diff(b, diff_runs(spark, out, "rB", "rA"))
    assert sorted(map(tuple, rev.collect())) == sorted(map(tuple, a.collect()))

    # mixed diff: hand-built add+remove in one delta
    base = spark.createDataFrame(
        [("s1", "p", "o1"), ("s2", "p", "o2")], "subj string, pred string, obj string")
    diff = spark.createDataFrame(
        [("removed", "s2", "p", "o2"), ("added", "s3", "p", "o3")],
        "change string, subj string, pred string, obj string")
    got = sorted(map(tuple, apply_diff(base, diff).collect()))
    assert got == [("s1", "p", "o1"), ("s3", "p", "o3")]
