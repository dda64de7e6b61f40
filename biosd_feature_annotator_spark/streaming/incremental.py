"""Structured-Streaming hooks (SURVEY.md §2.10 T1-T5, axis B).

The reference re-scanned its whole DB per campaign; the engine annotates
*new* transcript partitions as they land. Same extraction/link operators —
they're stateless per turn, so the batch plan lifts to a stream untouched.
``trigger(availableNow=True)`` gives catch-up batch semantics with
streaming checkpoints: the cluster cron-runs the job and it processes
exactly the unseen files, then exits — the streaming analogue of the
manifest/anti-join resume in plans/materialize.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.extract import extract_mentions
from ..operators.link import best_link, link_entities, term_triples_from_linked, value_triples
from ..sources.lexicon import Lexicon, lexicon_df
from ..sources.transcripts import TRANSCRIPT_SCHEMA


def read_transcript_stream(spark: SparkSession, path: str) -> DataFrame:
    """T1: file-source stream over a transcript parquet directory (on a
    cluster: readStream.table on the Iceberg table)."""
    return (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(path)
    )


def annotate_stream(
    spark: SparkSession,
    stream: DataFrame,
    lex: Lexicon,
    out_path: str,
    checkpoint: str,
    available_now: bool = True,
):
    """T1+T5: the full batch pipeline per micro-batch via foreachBatch —
    the standard way to lift plans containing ranking windows (best_link's
    row_number is not streamable) onto a stream. Progress tracking is the
    streaming checkpoint (file-source offsets), so each file is processed
    exactly once across restarts; the parquet append itself is
    at-least-once on crash mid-batch — on a cluster the sink would be an
    Iceberg transactional append. Returns the StreamingQuery."""
    lex_df = lexicon_df(spark, lex)

    def process_batch(batch_df, batch_id: int) -> None:
        mentions = extract_mentions(batch_df, lex)
        # per-turn dedup in the extractor + functional dictionary → no
        # ranking window / dedup shuffle needed (see plans/pipeline.py)
        linked = link_entities(mentions, lex_df)
        triples = term_triples_from_linked(linked).unionByName(value_triples(mentions))
        triples.write.mode("append").parquet(out_path)

    writer = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def windowed_mention_rates(stream: DataFrame, window: str = "10 minutes") -> DataFrame:
    """T2+T3: tumbling-window turn/mention rates with 1h-late tolerance."""
    return (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", window).alias("w"), F.col("role"))
        .agg(
            F.count("*").alias("n_turns"),
            F.sum(F.length("text")).alias("n_chars"),
        )
        .select(F.col("w.start").alias("w_start"), F.col("w.end").alias("w_end"),
                "role", "n_turns", "n_chars")
    )


def session_windows(stream: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """T3 session variant: conversation activity sessions keyed by conv_id."""
    return (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.session_window("ts", gap).alias("w"), F.col("conv_id"))
        .agg(F.count("*").alias("n_turns"))
        .select(F.col("w.start").alias("s_start"), F.col("w.end").alias("s_end"),
                "conv_id", "n_turns")
    )


def dedup_stream(stream: DataFrame) -> DataFrame:
    """T4: exactly-once triple keys within the watermark horizon."""
    return stream.withWatermark("ts", "1 hour").dropDuplicatesWithinWatermark(
        ["conv_id", "turn_idx"]
    )
