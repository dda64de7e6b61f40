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

from pyspark.sql import DataFrame, SparkSession, Window
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


EVENT_STREAM_SCHEMA = (
    "event_id long, ts timestamp_ntz, user_id long, event_type string, "
    "value double, props string"
)


def _stage_single_file(
    events_path: str, checkpoint: str, n_files: int = 1
) -> str:
    """The file-stream source wants a DIRECTORY of arriving files; the
    testdata layout is a single parquet file, so stage it into one (the
    realistic shape anyway — new files landing in a drop directory).

    n_files > 1 splits the input into that many row-range parquet files —
    combined with maxFilesPerTrigger=1 this forces a REAL multi-batch
    availableNow run (one micro-batch per file), the shape the
    multi-batch state-correctness tests drive."""
    import os
    import shutil

    if not os.path.isfile(events_path):
        return events_path
    in_dir = os.path.join(os.path.dirname(checkpoint.rstrip("/")), "in")
    shutil.rmtree(in_dir, ignore_errors=True)
    os.makedirs(in_dir)
    if n_files <= 1:
        shutil.copy(events_path, os.path.join(in_dir, "part-0.parquet"))
    else:
        import time

        import pyarrow.parquet as pq

        t = pq.read_table(events_path)
        step = max(1, -(-t.num_rows // n_files))
        base = time.time() - n_files - 1
        for i in range(0, n_files):
            chunk = t.slice(i * step, step)
            if chunk.num_rows:
                p = os.path.join(in_dir, f"part-{i}.parquet")
                pq.write_table(chunk, p)
                # Spark's FileStreamSource orders arriving files by
                # MODIFICATION TIME, and ties (all chunks written within
                # one ms on a fast disk) break arbitrarily — which
                # scrambles micro-batch order. Order-free states (CMS,
                # HLL, KMV, CC) don't care, but the funnel state machine
                # and any time-ordered contract do: stamp strictly
                # increasing mtimes so batch order always equals the
                # row-range (= time) order.
                os.utime(p, (base + i, base + i))
    return in_dir


def stream_event_window_counts(
    spark: SparkSession, events_path: str, out_path: str, checkpoint: str
) -> DataFrame:
    """Driver-verifiable end-to-end streaming run (T1+T2+T3+T5): a REAL
    readStream → watermark → tumbling-window aggregate → foreachBatch
    parquet sink, executed with availableNow (catch-up batch semantics),
    then the materialized output read back as a batch DataFrame. The
    result is deterministic — epoch-aligned hourly windows over a static
    input — so a plain batch SQL twin (time_bucket in DuckDB) verifies
    what the stream actually wrote.

    complete output mode keeps every window in state (correct here: the
    check wants the full history; an unbounded production stream would
    use update/append + watermark eviction)."""
    import shutil

    for p in (out_path, checkpoint):
        shutil.rmtree(p, ignore_errors=True)

    # watermarks require TIMESTAMP (not NTZ); pin UTC so the NTZ↔LTZ casts
    # are wall-clock-preserving and the emitted window starts are the same
    # naive datetimes a SQL engine computes with time_bucket
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    events_path = _stage_single_file(events_path, checkpoint)

    stream = (
        spark.readStream.schema(EVENT_STREAM_SCHEMA)
        .parquet(events_path)
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"), F.col("event_type"))
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
    )

    def write_batch(batch_df, _batch_id: int) -> None:
        batch_df.select(
            F.col("w.start").cast("timestamp_ntz").alias("win_start"),
            "event_type", "n", "sum_value",
        ).write.mode("overwrite").parquet(out_path)

    q = (
        agg.writeStream.outputMode("complete")
        .foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(out_path)


def stream_user_running_stats(
    spark: SparkSession, events_path: str, out_path: str, checkpoint: str,
    n_input_files: int = 1, max_files_per_trigger: int | None = None,
) -> DataFrame:
    """CUSTOM STATEFUL streaming operator (SURVEY §2.11): per-user running
    totals maintained as explicit group state via applyInPandasWithState —
    the shape a 100 TB incremental pipeline uses for anything Spark's
    built-in stateful ops can't express (running counters, per-entity
    accumulators, custom eviction). State is (n_events, sum_value) per
    user; each micro-batch folds its rows in and emits the UPDATED rows.

    MULTI-BATCH CORRECT (r3 VERDICT ask #8): the sink APPENDS each
    micro-batch's update rows stamped with their batch id, and the
    read-back takes the LAST emitted row per user — an upsert view, so
    users updated only in early batches survive later batches (a plain
    overwrite sink would drop them). State holds the UNROUNDED total;
    round(…, 2) is display-only on emit, so the surviving final row per
    user carries round(final_total) — batch-count-independent up to float
    addition order. n_input_files / max_files_per_trigger force a real
    multi-batch availableNow run (tested with ≥3 micro-batches in
    tests/test_streaming.py)."""
    import shutil

    import pandas as pd

    for p in (out_path, checkpoint):
        shutil.rmtree(p, ignore_errors=True)
    events_path = _stage_single_file(events_path, checkpoint, n_files=n_input_files)

    reader = spark.readStream.schema(EVENT_STREAM_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(events_path)

    def update(key, pdfs, state):
        # SQL NULL-sum semantics (ADVICE r2): only non-null values fold
        # into the total, and a user with NO non-null values reports NULL
        # (state total stays None), exactly like sum(value) in SQL.
        (user_id,) = key
        n, total = state.get if state.exists else (0, None)
        for pdf in pdfs:
            n += len(pdf)
            vals = pdf["value"].dropna()
            if len(vals):
                total = (total or 0.0) + float(vals.sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [user_id], "n_events": [n],
             "sum_value": [None if total is None else round(total, 2)]}
        )

    from pyspark.sql.streaming.state import GroupStateTimeout

    updated = stream.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id long, n_events long, sum_value double",
        stateStructType="n long, total double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

    def write_batch(batch_df, batch_id: int) -> None:
        batch_df.withColumn("batch_id", F.lit(int(batch_id))).write.mode(
            "append"
        ).parquet(out_path)

    q = (
        updated.writeStream.outputMode("update")
        .foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.read.parquet(out_path)
    w = Window.partitionBy("user_id").orderBy(F.col("batch_id").desc())
    return (
        out.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select("user_id", "n_events", "sum_value")
    )


def stream_sessionize_users(
    spark: SparkSession, events_path: str, out_path: str, checkpoint: str,
    gap: str = "30 minutes",
) -> DataFrame:
    """Driver-verifiable T3 SESSION windows: a real readStream →
    watermark → session_window(ts, gap) aggregation keyed by user_id,
    materialized via checkpointed foreachBatch and read back as a batch
    frame. Session-window aggregation streams in complete (or append)
    mode only; complete + a foreachBatch overwrite emits the final merged
    session set (append would hold back sessions newer than the final
    watermark).

    Session semantics (what the SQL twin must replicate): consecutive
    events of a user merge while ts_next − ts_prev < gap (strict); the
    emitted window is [min(ts), max(ts) + gap). All comparisons are raw
    microsecond timestamp arithmetic — no epoch flooring — so the oracle
    compares timestamps exactly. UTC is pinned (job-level conf, as in
    stream_event_window_counts) so the NTZ→LTZ→NTZ round-trip the
    streaming engine needs is wall-clock-preserving."""
    import shutil

    for p in (out_path, checkpoint):
        shutil.rmtree(p, ignore_errors=True)
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    events_path = _stage_single_file(events_path, checkpoint)

    stream = (
        spark.readStream.schema(EVENT_STREAM_SCHEMA)
        .parquet(events_path)
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.session_window("ts", gap).alias("w"), F.col("user_id"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("session_value"),
        )
    )

    def write_batch(batch_df, _batch_id: int) -> None:
        batch_df.select(
            "user_id",
            F.col("w.start").cast("timestamp_ntz").alias("s_start"),
            F.col("w.end").cast("timestamp_ntz").alias("s_end"),
            "n_events", "session_value",
        ).write.mode("overwrite").parquet(out_path)

    q = (
        agg.writeStream.outputMode("complete")
        .foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(out_path)


def stream_dedup_keys(
    spark: SparkSession, events_path: str, out_path: str, checkpoint: str
) -> DataFrame:
    """Driver-verifiable T4: dropDuplicatesWithinWatermark keyed on
    (user_id, event_type), materialized and read back. WHICH physical row
    survives per key depends on partition arrival order, so the query
    projects the KEY COLUMNS ONLY — that multiset is deterministic and
    equals DISTINCT over the same horizon (single availableNow batch ⇒
    the horizon is the whole input), which is exactly what the SQL twin
    checks."""
    import shutil

    for p in (out_path, checkpoint):
        shutil.rmtree(p, ignore_errors=True)
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    events_path = _stage_single_file(events_path, checkpoint)

    stream = (
        spark.readStream.schema(EVENT_STREAM_SCHEMA)
        .parquet(events_path)
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    deduped = (
        stream.withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["user_id", "event_type"])
        .select("user_id", "event_type")
    )

    def write_batch(batch_df, _batch_id: int) -> None:
        batch_df.write.mode("append").parquet(out_path)

    q = (
        deduped.writeStream.outputMode("append")
        .foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(out_path)


def stream_annotate_corpus(
    spark: SparkSession, corpus_path: str, lex: Lexicon,
    out_path: str, checkpoint: str,
) -> DataFrame:
    """The transcript-KG STREAM driver-verified end-to-end: the committed
    corpus lands in a drop directory, annotate_stream (the production
    foreachBatch pipeline: extraction → broadcast link join → triple
    union) processes it with availableNow + checkpoint, and the
    materialized triples are read back — lining up column-for-column with
    the batch flagship so the SAME _transcripts_kg_sql oracle re-derives
    every triple."""
    import shutil

    for p in (out_path, checkpoint):
        shutil.rmtree(p, ignore_errors=True)
    staged = _stage_single_file(corpus_path, checkpoint)

    stream = (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .parquet(staged)
    )
    q = annotate_stream(spark, stream, lex, out_path, checkpoint)
    q.awaitTermination()
    # structural triples are part of the flagship contract but not of the
    # per-batch extraction stream; assemble them batch-side from the same
    # corpus (they are stateless projections) to match the flagship shape
    from ..operators.link import structural_triples, TRIPLE_COLS

    extracted = spark.read.parquet(out_path)
    corpus = spark.read.schema(TRANSCRIPT_SCHEMA).parquet(staged)
    return extracted.unionByName(structural_triples(corpus)).select(*TRIPLE_COLS)


def stream_join_signup_purchase(
    spark: SparkSession, events_path: str, out_path: str, checkpoint: str,
    horizon: str = "7 days",
    n_input_files: int = 1, max_files_per_trigger: int | None = None,
) -> DataFrame:
    """STREAM-STREAM inner join with an event-time range constraint (the
    remaining Structured Streaming join family): purchases join signups
    of the same user within [signup_ts, signup_ts + horizon]. Both sides
    carry watermarks — on a live stream that bounds the join state Spark
    must buffer (signups older than horizon + watermark are evicted);
    the time-range predicate is what makes unbounded stream-stream inner
    join feasible at all.

    Inner-join matches are emitted in the micro-batch that finds them
    (watermarks only gate STATE EVICTION and outer-side NULL emission),
    so an availableNow catch-up run emits exactly the batch-join result
    — which is what the SQL twin verifies. Timestamps are compared at
    raw microsecond precision (same precedent as the sessionize
    oracle)."""
    import shutil

    for p in (out_path, checkpoint):
        shutil.rmtree(p, ignore_errors=True)
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    events_path = _stage_single_file(
        events_path, checkpoint, n_files=n_input_files
    )

    reader = spark.readStream.schema(EVENT_STREAM_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    base = reader.parquet(events_path).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    signups = (
        base.where("event_type = 'signup'")
        .select("user_id", F.col("ts").alias("signup_ts"))
        .withWatermark("signup_ts", "1 hour")
    )
    purchases = (
        base.where("event_type = 'purchase'")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", "1 hour")
    )
    joined = purchases.join(
        signups,
        (purchases.p_user == signups.user_id)
        & (purchases.purchase_ts >= signups.signup_ts)
        & (purchases.purchase_ts <= signups.signup_ts + F.expr(f"INTERVAL {horizon}")),
        "inner",
    )

    def write_batch(batch_df, _batch_id: int) -> None:
        batch_df.write.mode("append").parquet(out_path)

    q = (
        joined.writeStream.outputMode("append")
        .foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(out_path).select(
        "purchase_id",
        "user_id",
        F.col("signup_ts").cast("timestamp_ntz").alias("signup_ts"),
        F.col("purchase_ts").cast("timestamp_ntz").alias("purchase_ts"),
    )


def stream_funnel_depths(
    spark: SparkSession, events_path: str, out_path: str, checkpoint: str,
    steps: list[str] | None = None,
    n_input_files: int = 1, max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming funnel: the batch funnel_depths state machine
    (operators/funnel.py) maintained incrementally per user via
    applyInPandasWithState — depth so far, the last matched step's
    timestamp, and the matched timestamps, carried ACROSS micro-batches.

    Equality contract: identical to the batch fold when the source is
    time-ordered across arriving files (each batch's rows are folded in
    (ts, event_id) order; the driver events table is ts-sorted and the
    row-range staging preserves that — asserted against the batch
    operator in tests/test_streaming.py). A source that delivers an
    EARLIER event in a LATER file violates any unbuffered streaming
    funnel's assumptions — handle that upstream with a watermark +
    delay, not here.

    State is (depth, last_us, hits_csv): epoch-microsecond longs, so the
    cross-batch state is exact (no float time). Emits the user's current
    row per batch; the sink is the same append + last-batch-wins upsert
    view as stream_user_running_stats."""
    import shutil

    import pandas as pd

    steps = steps or ["signup", "view", "purchase"]
    k = len(steps)
    for p in (out_path, checkpoint):
        shutil.rmtree(p, ignore_errors=True)
    events_path = _stage_single_file(events_path, checkpoint, n_files=n_input_files)

    reader = spark.readStream.schema(EVENT_STREAM_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(events_path)

    def update(key, pdfs, state):
        (user_id,) = key
        depth, last_us, hits_csv = (
            state.get if state.exists else (0, -1, "")
        )
        hits = [int(h) for h in hits_csv.split(",") if h]
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows[rows["event_type"].isin(steps)]
        if len(rows):
            rows = rows.sort_values(["ts", "event_id"])
            for ts, et in zip(rows["ts"], rows["event_type"]):
                us = int(pd.Timestamp(ts).value // 1000)
                if depth < k and et == steps[depth] and (depth == 0 or us > last_us):
                    depth += 1
                    last_us = us
                    hits.append(us)
        state.update((depth, last_us, ",".join(str(h) for h in hits)))
        out = {"user_id": [user_id], "depth": [depth]}
        for i in range(k):
            out[f"ts_{i + 1}"] = [
                pd.Timestamp(hits[i] * 1000) if i < len(hits) else pd.NaT
            ]
        yield pd.DataFrame(out)

    from pyspark.sql.streaming.state import GroupStateTimeout

    ts_cols = ", ".join(f"ts_{i + 1} timestamp" for i in range(k))
    updated = stream.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=f"user_id long, depth long, {ts_cols}",
        stateStructType="depth int, last_us long, hits_csv string",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

    def write_batch(batch_df, batch_id: int) -> None:
        batch_df.withColumn("batch_id", F.lit(int(batch_id))).write.mode(
            "append"
        ).parquet(out_path)

    q = (
        updated.writeStream.outputMode("update")
        .foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.read.parquet(out_path)
    w = Window.partitionBy("user_id").orderBy(F.col("batch_id").desc())
    return (
        out.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select("user_id", "depth", *[f"ts_{i + 1}" for i in range(k)])
    )


def stream_quantile_sketch(
    spark: SparkSession, events_path: str, out_path: str, checkpoint: str,
    lo: float = 0.0, hi: float = 1000.0, n_buckets: int = 1000,
    n_files: int = 3, fresh: bool = True,
) -> DataFrame:
    """Incrementally maintained quantile sketch over a stream — the
    composition the mergeable state (operators/sketches.py) exists for:
    each micro-batch computes its own grid state and MERGES it into the
    materialized running state (union + sum), so percentile dashboards
    never rescan history. The state stays keys×buckets-sized no matter
    how long the stream runs.

    Exactly-once under foreachBatch replay: the merged state and an
    `_applied` batch-id marker are written to a scratch dir, then
    committed by the rename-to-.bak swap (the verify-then-swap
    discipline of plans/compact.py) — there is NO window where the
    state exists nowhere: out → out.bak, tmp → out, delete .bak, with
    a recovery step at the head of every batch that rolls a stranded
    .bak forward (crash between the two renames) or deletes a stale
    one (crash before its cleanup). A replayed batch sees batch_id ≤
    marker and skips. Spark's parquet reader ignores underscore-
    prefixed files, so the marker travels inside the state directory
    itself — state and marker cannot diverge.

    NULL values are dropped before bucketing (a NULL would otherwise
    produce a NULL bucket row); the batch-equivalence test applies the
    same filter to its reference."""
    import json
    import os
    import shutil

    from ..operators.sketches import grid_quantile_state, merge_quantile_states

    bak = out_path.rstrip("/") + ".bak"
    tmp = out_path.rstrip("/") + ".tmp"
    if fresh:
        for p in (out_path, checkpoint, bak, tmp):
            shutil.rmtree(p, ignore_errors=True)
        events_path = _stage_single_file(events_path, checkpoint, n_files=n_files)
    elif os.path.isfile(events_path):
        # restart on a single-file input: reuse the dir the fresh run
        # staged it into (same convention as _stage_single_file)
        events_path = os.path.join(os.path.dirname(checkpoint.rstrip("/")), "in")
    # restart on a directory input: stream from it as-is — new files
    # keep folding in, already-committed ones are tracked by the source

    stream = (
        spark.readStream.schema(EVENT_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(events_path)
    )
    marker = os.path.join(out_path, "_applied")

    def recover() -> None:
        """Roll forward/back an interrupted swap so out_path is whole."""
        if os.path.isdir(bak):
            if os.path.isdir(out_path):
                shutil.rmtree(bak)  # crash after commit, before cleanup
            else:
                os.rename(bak, out_path)  # crash mid-swap: restore
        shutil.rmtree(tmp, ignore_errors=True)

    # up front as well as per-batch: a restart whose source has no new
    # files runs ZERO batches, and the final read still needs a whole
    # state if the previous run died mid-swap
    recover()

    def write_batch(batch_df, batch_id: int) -> None:
        recover()
        if os.path.isfile(marker):
            with open(marker) as fh:
                if batch_id <= json.load(fh)["batch_id"]:
                    return  # replayed batch: already folded in
        delta = grid_quantile_state(
            batch_df.where(F.col("value").isNotNull()),
            ["event_type"], "value", lo, hi, n_buckets,
        )
        if os.path.isdir(out_path):
            prev = batch_df.sparkSession.read.parquet(out_path)
            merged = merge_quantile_states(prev, delta)
        else:
            merged = delta
        merged.write.mode("overwrite").parquet(tmp)
        with open(os.path.join(tmp, "_applied"), "w") as fh:
            json.dump({"batch_id": batch_id}, fh)
        if os.path.isdir(out_path):
            os.rename(out_path, bak)
        os.rename(tmp, out_path)
        shutil.rmtree(bak, ignore_errors=True)

    q = (
        stream.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(out_path)


EDGE_STREAM_SCHEMA = "src long, dst long"


def stream_component_assign(
    spark: SparkSession, edges_path: str, out_path: str, checkpoint: str,
    n_files: int = 3, fresh: bool = True,
) -> DataFrame:
    """Incrementally maintained connected components over a stream of
    edge DELTAS — streaming entity-merge maintenance for the KG: each
    micro-batch folds its edges into the materialized (node, comp)
    state with canonicalize.incremental_components, whose contraction
    argument guarantees every committed state is row-identical to a
    full CC recompute over all edges seen so far (asserted end-to-end
    by the batch-equivalence test, including merges ACROSS batches).
    Per-batch cost scales with the delta and the touched components,
    never with the edge history — the property that turns continuous
    KG entity resolution into a stream of delta jobs.

    Exactly-once under foreachBatch replay: the same verify-then-swap
    state discipline as stream_quantile_sketch — merged state plus an
    `_applied` batch-id marker land in a scratch dir, committed by the
    rename-to-.bak swap with up-front recovery of either crash window;
    a replayed batch sees batch_id ≤ marker and skips."""
    import json
    import os
    import shutil

    from ..operators.canonicalize import (
        connected_components,
        incremental_components,
    )

    bak = out_path.rstrip("/") + ".bak"
    tmp = out_path.rstrip("/") + ".tmp"
    if fresh:
        for p in (out_path, checkpoint, bak, tmp):
            shutil.rmtree(p, ignore_errors=True)
        edges_path = _stage_single_file(edges_path, checkpoint, n_files=n_files)
    elif os.path.isfile(edges_path):
        edges_path = os.path.join(os.path.dirname(checkpoint.rstrip("/")), "in")

    stream = (
        spark.readStream.schema(EDGE_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(edges_path)
    )
    marker = os.path.join(out_path, "_applied")

    def recover() -> None:
        if os.path.isdir(bak):
            if os.path.isdir(out_path):
                shutil.rmtree(bak)
            else:
                os.rename(bak, out_path)
        shutil.rmtree(tmp, ignore_errors=True)

    recover()

    def write_batch(batch_df, batch_id: int) -> None:
        recover()
        if os.path.isfile(marker):
            with open(marker) as fh:
                if batch_id <= json.load(fh)["batch_id"]:
                    return
        delta = batch_df.select("src", "dst").where(
            F.col("src").isNotNull() & F.col("dst").isNotNull()
        )
        if os.path.isdir(out_path):
            prev = batch_df.sparkSession.read.parquet(out_path)
            merged = incremental_components(prev, delta)
        else:
            merged = connected_components(delta)
        merged.write.mode("overwrite").parquet(tmp)
        with open(os.path.join(tmp, "_applied"), "w") as fh:
            json.dump({"batch_id": batch_id}, fh)
        if os.path.isdir(out_path):
            os.rename(out_path, bak)
        os.rename(tmp, out_path)
        shutil.rmtree(bak, ignore_errors=True)

    q = (
        stream.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(out_path)


def stream_cms_counts(
    spark: SparkSession, events_path: str, out_path: str, checkpoint: str,
    depth: int = 4, width: int = 64,
    n_files: int = 3, fresh: bool = True,
) -> DataFrame:
    """Incrementally maintained CountMin frequency grid over a stream —
    the heavy-hitter complement of stream_quantile_sketch in the
    incremental-state family (quantiles, connected components, and now
    point frequencies): each micro-batch sketches its own rows
    (operators/sketches.cms_state over event_type values) and MERGES
    cell-wise into the materialized grid, so "how often has X occurred
    since the stream began" never rescans history and the state stays
    depth×width-sized forever.

    CMS is the right sketch to maintain this way because the grid is a
    pure function of the value MULTISET (grid(A∪B) = grid(A)+grid(B)
    cell-for-cell, no partition- or order-dependence — unlike
    SpaceSaving's summary), so the committed state after any batch
    split is row-identical to the direct sketch over all events so far,
    and a SQL oracle can replay it from the raw history.

    Exactly-once under foreachBatch replay: the verify-then-swap state
    discipline shared by the family — merged grid plus `_applied`
    batch-id marker in a scratch dir, committed by the rename-to-.bak
    swap, with up-front recovery of both crash windows; replayed
    batches see batch_id ≤ marker and skip."""
    import json
    import os
    import shutil

    from ..operators.sketches import cms_state, merge_cms_states

    bak = out_path.rstrip("/") + ".bak"
    tmp = out_path.rstrip("/") + ".tmp"
    if fresh:
        for p in (out_path, checkpoint, bak, tmp):
            shutil.rmtree(p, ignore_errors=True)
        events_path = _stage_single_file(events_path, checkpoint, n_files=n_files)
    elif os.path.isfile(events_path):
        events_path = os.path.join(os.path.dirname(checkpoint.rstrip("/")), "in")

    stream = (
        spark.readStream.schema(EVENT_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(events_path)
    )
    marker = os.path.join(out_path, "_applied")

    def recover() -> None:
        if os.path.isdir(bak):
            if os.path.isdir(out_path):
                shutil.rmtree(bak)
            else:
                os.rename(bak, out_path)
        shutil.rmtree(tmp, ignore_errors=True)

    recover()

    def write_batch(batch_df, batch_id: int) -> None:
        recover()
        if os.path.isfile(marker):
            with open(marker) as fh:
                if batch_id <= json.load(fh)["batch_id"]:
                    return
        delta = cms_state(batch_df, "event_type", depth=depth, width=width)
        if os.path.isdir(out_path):
            prev = batch_df.sparkSession.read.parquet(out_path)
            merged = merge_cms_states(prev, delta)
        else:
            merged = delta
        merged.write.mode("overwrite").parquet(tmp)
        with open(os.path.join(tmp, "_applied"), "w") as fh:
            json.dump({"batch_id": batch_id}, fh)
        if os.path.isdir(out_path):
            os.rename(out_path, bak)
        os.rename(tmp, out_path)
        shutil.rmtree(bak, ignore_errors=True)

    q = (
        stream.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(out_path)


def stream_hll_registers(
    spark: SparkSession, events_path: str, out_path: str, checkpoint: str,
    key_col: str = "event_type", value_col: str = "user_id", p: int = 10,
    n_files: int = 3, fresh: bool = True,
) -> DataFrame:
    """Incrementally maintained ENGINE-PORTABLE HLL registers over a
    stream — the distinct-count member of the incremental-state family
    (quantiles: stream_quantile_sketch, frequencies: stream_cms_counts,
    components: stream_component_assign): each micro-batch sketches its
    own rows (operators/sketches.portable_hll_state) and merges into
    the materialized register table by per-register MAX, so "how many
    distinct values since the stream began" never rescans history and
    the state stays ≤ keys×2^p rows forever.

    The portable sketch is the right one to maintain this way for the
    same reason CMS was: registers are a pure function of the value
    SET (max is associative, order- and partition-free), so the
    committed state after any batch split is row-identical to the
    direct sketch over all events so far — and because every register
    is md5-derived integer arithmetic, a SQL oracle can replay the
    maintained state AND the estimate bit-for-bit from raw history
    (the DataSketches binary in hll_state can't be checked this way).

    Exactly-once under foreachBatch replay: the family's shared
    verify-then-swap discipline — merged state plus `_applied`
    batch-id marker, rename-to-.bak commit, up-front recovery of both
    crash windows; replayed batches skip on batch_id ≤ marker."""
    import json
    import os
    import shutil

    from ..operators.sketches import (
        merge_portable_hll_states,
        portable_hll_state,
    )

    bak = out_path.rstrip("/") + ".bak"
    tmp = out_path.rstrip("/") + ".tmp"
    if fresh:
        for pth in (out_path, checkpoint, bak, tmp):
            shutil.rmtree(pth, ignore_errors=True)
        events_path = _stage_single_file(events_path, checkpoint, n_files=n_files)
    elif os.path.isfile(events_path):
        events_path = os.path.join(os.path.dirname(checkpoint.rstrip("/")), "in")

    stream = (
        spark.readStream.schema(EVENT_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(events_path)
    )
    marker = os.path.join(out_path, "_applied")

    def recover() -> None:
        if os.path.isdir(bak):
            if os.path.isdir(out_path):
                shutil.rmtree(bak)
            else:
                os.rename(bak, out_path)
        shutil.rmtree(tmp, ignore_errors=True)

    recover()

    def write_batch(batch_df, batch_id: int) -> None:
        recover()
        if os.path.isfile(marker):
            with open(marker) as fh:
                if batch_id <= json.load(fh)["batch_id"]:
                    return
        delta = portable_hll_state(batch_df, [key_col], value_col, p=p)
        if os.path.isdir(out_path):
            prev = batch_df.sparkSession.read.parquet(out_path)
            merged = merge_portable_hll_states(prev, delta)
        else:
            merged = delta
        merged.write.mode("overwrite").parquet(tmp)
        with open(os.path.join(tmp, "_applied"), "w") as fh:
            json.dump({"batch_id": batch_id}, fh)
        if os.path.isdir(out_path):
            os.rename(out_path, bak)
        os.rename(tmp, out_path)
        shutil.rmtree(bak, ignore_errors=True)

    q = (
        stream.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(out_path)


def stream_kmv_state(
    spark: SparkSession, events_path: str, out_path: str, checkpoint: str,
    key_col: str = "event_type", value_col: str = "user_id", k: int = 64,
    n_files: int = 3, fresh: bool = True,
) -> DataFrame:
    """Incrementally maintained KMV bottom-k sketch over a stream — the
    final member of the incremental-state family (quantiles, CC,
    CountMin, portable-HLL registers, now bottom-k): each micro-batch
    sketches its own rows (operators/sketches.kmv_state) and merges by
    union → distinct → re-rank ≤ k, which is EXACT (bottom-k of a
    union is the bottom-k of the unioned bottom-k's), so the
    maintained state is row-identical to the direct sketch over all
    history — and, being md5 ranks, fully SQL-oracle-able. Keeping KMV
    maintained (not just HLL) is what preserves streaming
    set-INTERSECTION capability: kmv_jaccard over two maintained
    states answers "overlap between today's and last month's users"
    without rescanning either period.

    Exactly-once via the family's shared verify-then-swap discipline
    (marker + rename commit, crash-window recovery, batch-id skip)."""
    import json
    import os
    import shutil

    from ..operators.sketches import kmv_state, merge_kmv_states

    bak = out_path.rstrip("/") + ".bak"
    tmp = out_path.rstrip("/") + ".tmp"
    if fresh:
        for pth in (out_path, checkpoint, bak, tmp):
            shutil.rmtree(pth, ignore_errors=True)
        events_path = _stage_single_file(events_path, checkpoint, n_files=n_files)
    elif os.path.isfile(events_path):
        events_path = os.path.join(os.path.dirname(checkpoint.rstrip("/")), "in")

    stream = (
        spark.readStream.schema(EVENT_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(events_path)
    )
    marker = os.path.join(out_path, "_applied")

    def recover() -> None:
        if os.path.isdir(bak):
            if os.path.isdir(out_path):
                shutil.rmtree(bak)
            else:
                os.rename(bak, out_path)
        shutil.rmtree(tmp, ignore_errors=True)

    recover()

    def write_batch(batch_df, batch_id: int) -> None:
        recover()
        if os.path.isfile(marker):
            with open(marker) as fh:
                if batch_id <= json.load(fh)["batch_id"]:
                    return
        delta = kmv_state(batch_df, [key_col], value_col, k=k)
        if os.path.isdir(out_path):
            prev = batch_df.sparkSession.read.parquet(out_path)
            merged = merge_kmv_states(k, prev, delta)
        else:
            merged = delta
        merged.write.mode("overwrite").parquet(tmp)
        with open(os.path.join(tmp, "_applied"), "w") as fh:
            json.dump({"batch_id": batch_id}, fh)
        if os.path.isdir(out_path):
            os.rename(out_path, bak)
        os.rename(tmp, out_path)
        shutil.rmtree(bak, ignore_errors=True)

    q = (
        stream.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(out_path)
