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
