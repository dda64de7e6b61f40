"""Ordered-funnel analysis over an event stream.

The classic product-analytics primitive (ClickHouse ``windowFunnel``,
Snowplow funnels): given an ordered list of step event-types, compute
per user the deepest step reached where step *i+1* must occur strictly
after the matched step *i* (greedy earliest-match semantics — step 1
matches the user's earliest step-1 event, step 2 the earliest step-2
event after that, and so on; this greedy chain is exactly the
``min(ts) > previous`` fixpoint, which is what the DuckDB oracle
re-derives with one chained CTE per step).

Scale shape (100 TB): ONE shuffle, keyed by user. The per-user state
the aggregate carries is only the *step-typed* events (non-step events
are dropped inside ``collect_list`` before they ever reach the reducer
— the ``when(...isin(steps))`` evaluates map-side), so a hot user costs
O(step events), not O(all events). The fold over the sorted event list
is a Catalyst higher-order ``aggregate`` — whole-stage codegen, zero
Python. For a pathological user whose step-event count alone is
unbounded, cap with an upstream ``filter`` on a time window — the
operator composes with any predicate because it is a plain groupBy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def funnel_depths(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    order_col: str = "event_id",
) -> DataFrame:
    """Per-user funnel depth and per-step match timestamps.

    Returns one row per distinct user in ``events`` (users with no step
    events report depth 0) with columns: ``user_col``, ``depth``
    (BIGINT, 0..len(steps)) and ``ts_1..ts_K`` (the matched event's
    timestamp for each completed step, NULL beyond ``depth``).

    Ties are deterministic: events are folded in ``(ts, order_col)``
    order and a step only advances on ``ts`` strictly greater than the
    previous matched step's ``ts`` — so two candidate events at the
    same timestamp can never both advance the chain, and the fold's
    result is independent of their relative order.
    """
    if not steps:
        raise ValueError("steps must be a non-empty ordered list of event types")
    k = len(steps)
    steps_arr = F.array(*[F.lit(s) for s in steps])

    # Map-side: keep only step-typed events; collect_list drops the NULLs
    # the when() leaves for everything else, so the shuffled state per
    # user is bounded by the user's step-event count.
    ev = F.when(
        F.col(type_col).isin(list(steps)),
        F.struct(
            # NTZ-normalized so the fold state's empty-array literal type
            # matches regardless of the source column's tz flavor (the
            # driver parquet is NTZ already — this cast is a no-op there)
            F.col(ts_col).cast("timestamp_ntz").alias("ts"),
            F.col(order_col).alias("oid"),
            F.col(type_col).alias("et"),
        ),
    )
    per_user = events.groupBy(F.col(user_col)).agg(
        F.sort_array(F.collect_list(ev)).alias("evs")
    )

    # Greedy earliest-match fold: state = (depth so far, ts of the last
    # matched step, matched ts's). Pure Catalyst; the strict
    # ts > last_ts comparison IS the min-chaining semantics the oracle
    # replays step by step. Conjunction operands are not short-circuited
    # under ANSI mode, so array access uses try_element_at (NULL out of
    # bounds → condition NULL → otherwise branch) and the previous-step
    # timestamp rides in the state instead of being indexed out of hits
    # (ts > NULL is NULL, absorbed by the depth == 0 disjunct).
    state = F.struct(
        F.lit(0).alias("depth"),
        F.lit(None).cast("timestamp_ntz").alias("last_ts"),
        F.expr("cast(array() as array<timestamp_ntz>)").alias("hits"),
    )
    fold = F.aggregate(
        F.col("evs"),
        state,
        lambda s, x: F.when(
            (s.depth < F.lit(k))
            & (x.et == F.try_element_at(steps_arr, s.depth + F.lit(1)))
            & ((s.depth == F.lit(0)) | (x.ts > s.last_ts)),
            F.struct(
                (s.depth + F.lit(1)).alias("depth"),
                x.ts.alias("last_ts"),
                F.array_append(s.hits, x.ts).alias("hits"),
            ),
        ).otherwise(s),
    )
    out = per_user.select(F.col(user_col), fold.alias("f"))
    return out.select(
        user_col,
        F.col("f.depth").cast("long").alias("depth"),
        *[
            F.try_element_at(F.col("f.hits"), F.lit(i + 1)).alias(f"ts_{i + 1}")
            for i in range(k)
        ],
    )


def funnel_conversion(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    order_col: str = "event_id",
) -> DataFrame:
    """Funnel summary: users reaching each depth and conversion vs the
    previous step. One extra tiny aggregation over funnel_depths —
    the grouped frame is at most len(steps)+1 rows."""
    d = funnel_depths(events, steps, user_col, ts_col, type_col, order_col)
    k = len(steps)
    counts = d.groupBy("depth").agg(F.count("*").alias("n_at_depth"))
    # users reaching depth >= i, for i = 1..K (depth table is tiny: K+1
    # rows — the range join below is a broadcast over a literal frame)
    levels = d.sparkSession.range(1, k + 1).withColumnRenamed("id", "step")
    reached = (
        levels.join(counts, counts.depth >= levels.step)
        .groupBy("step")
        .agg(F.sum("n_at_depth").cast("long").alias("users_reached"))
    )
    w_prev = F.lag("users_reached").over(Window.orderBy("step"))
    return reached.select(
        "step",
        "users_reached",
        F.round(
            F.col("users_reached") / F.coalesce(w_prev, F.col("users_reached")), 4
        ).alias("conversion_from_prev"),
    )


def retention_cohorts(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    grain: str = "month",
) -> DataFrame:
    """Classic retention-cohort matrix: users are assigned to the cohort
    of their FIRST activity period, and each (cohort, period) cell
    counts how many of that cohort were active in that period — the
    standard growth-analytics rollup (every product analytics stack
    ships it; none of the engine's other operators express it:
    funnel is ordered-step, sessionize is gap-based).

    Scale shape: ONE shuffle on user_id computes both the cohort
    (min over the user's periods) and the user's distinct active
    periods — groupBy(user) with min + collect_set(period), then
    explode; the (cohort, period) count that follows is map-side
    combinable. No join back to the event stream (the naive
    min-ts-join-events form shuffles the full event table twice and
    counts DISTINCT users per cell — strictly worse). Periods are
    date_trunc'd DATEs: integer-exact, no float anywhere."""
    per_user = (
        events
        .select(
            F.col(user_col).alias("u"),
            F.date_trunc(grain, F.col(ts_col)).cast("date").alias("period"),
        )
        .groupBy("u")
        .agg(
            F.min("period").alias("cohort"),
            F.collect_set("period").alias("periods"),
        )
    )
    return (
        per_user
        .select("cohort", F.explode("periods").alias("period"))
        .groupBy("cohort", "period")
        .agg(F.count("*").alias("n_users"))
    )


def event_transitions(
    events: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    order_col: str | None = "event_id",
) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences → (from_type, to_type, n, p_micro): how often each event
    type is immediately followed by each other type, with the row-
    normalized transition probability in exact millionths. The
    behavioral complement of funnel_depths: a funnel checks ONE
    hypothesized path, the transition matrix surfaces the paths users
    actually take (and between KG-extraction runs, a shifted transition
    row is the same drift alarm degree_profile raises for graph
    structure).

    Shape: one user-keyed window (lead over (ts, order_col) — the
    stable total order the funnel family already pins; ties without an
    order column would make `next` ambiguous) producing (type,
    next_type) pairs, then one map-side-combinable count shuffle keyed
    by the pair — nothing data-squared, no driver actions. Terminal
    events per user (lead = NULL) are dropped: rows condition on "a
    next event exists", so each from-row sums to ~1e6 (up to floor
    residue). p_micro = (n · 1e6) div row_total — INTEGER division of
    exact longs, deterministic at any parallelism and replayed
    verbatim by the SQL oracle; the exact n survives alongside so any
    other normalization can be re-derived."""
    from pyspark.sql import Window

    order = [F.col(ts_col)] + ([F.col(order_col)] if order_col else [])
    w = Window.partitionBy(user_col).orderBy(*order)
    pairs = (
        events.select(
            F.col(user_col), F.col(type_col).alias("from_type"),
            *([F.col(ts_col)] + ([F.col(order_col)] if order_col else [])),
        )
        .withColumn("to_type", F.lead("from_type").over(w))
        .where(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count("*").alias("n"))
    )
    wr = Window.partitionBy("from_type")
    return (
        pairs.withColumn("row_total", F.sum("n").over(wr))
        .select(
            "from_type", "to_type", "n",
            F.expr("CAST((n * 1000000) div row_total AS BIGINT)")
            .alias("p_micro"),
        )
    )
