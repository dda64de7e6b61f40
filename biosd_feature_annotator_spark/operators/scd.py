"""Slowly-changing-dimension (type 2) operators.

Two halves of the warehouse primitive:

- ``scd2_history``: collapse an append-only change stream (one row per
  observation) into versioned dimension rows — consecutive duplicates
  merge, each surviving row carries ``effective_from`` /
  ``effective_to`` / ``is_current``. Pure window algebra: one shuffle
  keyed by the dimension key; the two window passes (change detection,
  then interval close-out) share the same partitioning+ordering so
  Spark plans a single sort.

- ``scd2_apply``: MERGE-INTO emulation — apply a batch of updates to an
  existing type-2 dimension: close out current rows whose tracked
  attributes changed, insert new versions, leave everything else
  untouched. One equi-join on the key (broadcast when the update batch
  is small — the common case: daily updates vs a huge dimension) plus a
  union; no full rewrite of history partitions is required when the
  sink partitions by ``is_current``.

At 100 TB the dimension key is the shuffle key in both; skew only
matters if one key has millions of *versions*, which violates the SCD2
model itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def scd2_history(
    observations: DataFrame,
    key_cols: list[str],
    attr_col: str,
    ts_col: str = "ts",
    order_col: str | None = None,
) -> DataFrame:
    """Versioned rows from a change stream.

    Keeps the first observation per key and every observation whose
    ``attr_col`` differs (NULL-safely) from the previous one in
    ``(ts_col, order_col)`` order; ``effective_to`` is the next change's
    timestamp, NULL (and ``is_current`` true) for the latest version.
    """
    order = [F.col(ts_col)] + ([F.col(order_col)] if order_col else [])
    w = Window.partitionBy(*key_cols).orderBy(*order)
    changed = (
        observations.select(*key_cols, attr_col, ts_col, *(
            [order_col] if order_col else []))
        .withColumn("_rn", F.row_number().over(w))
        .withColumn("_prev", F.lag(attr_col).over(w))
        # NULL-safe change test: eqNullSafe, NOT <>, so a NULL→value or
        # value→NULL transition is a real new version
        .where((F.col("_rn") == 1) | ~F.col(attr_col).eqNullSafe(F.col("_prev")))
    )
    # same partition+order spec ⇒ the second window reuses the sort
    w2 = Window.partitionBy(*key_cols).orderBy(*order)
    return changed.select(
        *key_cols,
        F.col(attr_col),
        F.col(ts_col).alias("effective_from"),
        F.lead(ts_col).over(w2).alias("effective_to"),
        F.lead(ts_col).over(w2).isNull().alias("is_current"),
    )


def scd2_apply(
    dim: DataFrame,
    updates: DataFrame,
    key_cols: list[str],
    tracked_cols: list[str],
    ts_col: str = "ts",
) -> DataFrame:
    """Apply one update batch to a type-2 dimension.

    ``dim`` must carry ``tracked_cols`` plus ``effective_from``,
    ``effective_to``, ``is_current``; ``updates`` carries ``key_cols``,
    ``tracked_cols`` and ``ts_col`` (one row per key — dedupe upstream
    if a batch can contain several). Returns the new dimension:

    - historical (non-current) rows pass through untouched;
    - current rows with a changed update are closed out
      (``effective_to`` = update ts, ``is_current`` = false);
    - changed and brand-new keys gain an open version.
    """
    upd = updates.select(
        *[F.col(c).alias(f"_u_{c}") for c in key_cols + tracked_cols],
        F.col(ts_col).alias("_u_ts"),
    )
    cond = [F.col(k) == F.col(f"_u_{k}") for k in key_cols]
    cur = dim.where("is_current")
    joined = cur.join(upd, cond, "full_outer")

    diff = F.lit(False)
    for c in tracked_cols:
        diff = diff | ~F.col(c).eqNullSafe(F.col(f"_u_{c}"))
    matched = F.col(key_cols[0]).isNotNull() & F.col(f"_u_{key_cols[0]}").isNotNull()

    dim_cols = [c for c in dim.columns]
    # current rows: unchanged pass through; changed are closed out
    kept_open = joined.where(matched & ~diff).select(*dim_cols)
    closed = joined.where(matched & diff).select(
        *[F.col(c) for c in dim_cols if c not in ("effective_to", "is_current")],
        F.col("_u_ts").alias("effective_to"),
        F.lit(False).alias("is_current"),
    ).select(*dim_cols)
    unmatched_current = joined.where(
        F.col(f"_u_{key_cols[0]}").isNull()
    ).select(*dim_cols)

    # new open versions: changed keys + brand-new keys
    inserts = joined.where(
        (matched & diff) | F.col(key_cols[0]).isNull()
    ).select(
        *[F.col(f"_u_{k}").alias(k) for k in key_cols],
        *[F.col(f"_u_{c}").alias(c) for c in tracked_cols],
        F.col("_u_ts").alias("effective_from"),
        F.lit(None).cast(dim.schema["effective_to"].dataType).alias("effective_to"),
        F.lit(True).alias("is_current"),
    ).select(*dim_cols)

    history = dim.where(~F.col("is_current"))
    return (
        history.unionByName(unmatched_current)
        .unionByName(kept_open)
        .unionByName(closed)
        .unionByName(inserts)
    )


def scd2_point_in_time(
    facts: DataFrame,
    dim: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    how: str = "left",
) -> DataFrame:
    """Point-in-time (as-of) lookup: join each fact row to the dimension
    version that was effective AT the fact's timestamp — the
    feature-store primitive that makes type-2 history usable without
    leakage (a fact must never see a version that started after it).

    Semantics: version matches iff ``effective_from <= ts`` and
    (``effective_to`` is NULL or ``ts < effective_to``). Because
    scd2_history's intervals tile and never overlap, at most ONE version
    matches per fact — the join cannot fan out.

    Scale shape: an equi-join on the dimension key with the interval
    bounds as residual join predicates — Spark plans a hash/sort-merge
    join partitioned by key (the range conditions filter within each
    key group, they don't force a cartesian or a broadcast-nested-loop).
    Facts that predate the first version (or miss the key) keep NULL
    attributes under how="left".
    """
    d = dim.select(
        *[F.col(k).alias(f"_d_{k}") for k in key_cols],
        *[F.col(c) for c in dim.columns if c not in key_cols],
    )
    cond = [F.col(k) == F.col(f"_d_{k}") for k in key_cols]
    cond.append(F.col("effective_from") <= F.col(ts_col))
    cond.append(
        F.col("effective_to").isNull() | (F.col(ts_col) < F.col("effective_to"))
    )
    joined = facts.join(d, cond, how)
    return joined.select(
        *facts.columns,
        *[c for c in dim.columns if c not in key_cols + [ts_col]],
    )
