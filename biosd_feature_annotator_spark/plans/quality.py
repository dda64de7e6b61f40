"""Declarative data-quality constraints (Deequ / dbt-tests shape).

A curation pipeline that feeds a trainer needs machine-checkable gates:
"this column is never NULL", "this key is unique", "every foreign key
resolves". This module evaluates a rule list into ONE small report
frame (rule, violations, total, passed) so a campaign can assert
`report.where(~passed).count() == 0` before materializing.

Scale shape: all ROW-LEVEL rules (not_null / accepted_values / range /
matches) fold into a SINGLE aggregation pass — one job, one global agg
of conditional sums, no shuffle of data rows. uniqueness adds one
map-side-combinable count shuffle per rule; referential integrity one
left-anti join per rule (broadcast when the dimension is small). The
report itself is rules-sized, never data-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def not_null(col: str) -> dict:
    return {"kind": "not_null", "col": col, "name": f"not_null({col})"}


def accepted_values(col: str, values: list) -> dict:
    return {"kind": "accepted_values", "col": col, "values": list(values),
            "name": f"accepted_values({col})"}


def in_range(col: str, lo, hi) -> dict:
    return {"kind": "range", "col": col, "lo": lo, "hi": hi,
            "name": f"range({col},{lo},{hi})"}


def matches(col: str, pattern: str) -> dict:
    return {"kind": "matches", "col": col, "pattern": pattern,
            "name": f"matches({col})"}


def unique(cols: list[str]) -> dict:
    return {"kind": "unique", "cols": list(cols),
            "name": f"unique({','.join(cols)})"}


def referential(col: str, dim: DataFrame, dim_col: str, dim_name: str = "dim") -> dict:
    return {"kind": "referential", "col": col, "dim": dim, "dim_col": dim_col,
            "name": f"referential({col}->{dim_name}.{dim_col})"}


def _row_violation(rule: dict) -> F.Column:
    c = F.col(rule["col"])
    if rule["kind"] == "not_null":
        return c.isNull()
    if rule["kind"] == "accepted_values":
        return c.isNull() | ~c.isin(rule["values"])
    if rule["kind"] == "range":
        return c.isNull() | (c < F.lit(rule["lo"])) | (c > F.lit(rule["hi"]))
    if rule["kind"] == "matches":
        return c.isNull() | ~c.rlike(rule["pattern"])
    raise ValueError(rule["kind"])


def check_constraints(df: DataFrame, rules: list[dict]) -> DataFrame:
    """Evaluate rules over df → (rule, violations, total, passed),
    one row per rule, in deterministic rule order."""
    row_rules = [r for r in rules if r["kind"] in
                 ("not_null", "accepted_values", "range", "matches")]
    reports = []

    if row_rules:
        aggs = [F.count(F.lit(1)).alias("_total")] + [
            F.sum(F.when(_row_violation(r), 1).otherwise(0))
            .cast("long").alias(f"_v{i}")
            for i, r in enumerate(row_rules)
        ]
        row = df.agg(*aggs)
        for i, r in enumerate(row_rules):
            reports.append(row.select(
                F.lit(r["name"]).alias("rule"),
                F.col(f"_v{i}").alias("violations"),
                F.col("_total").alias("total"),
            ))

    for r in rules:
        if r["kind"] == "unique":
            dup = (
                df.groupBy(*r["cols"]).agg(F.count(F.lit(1)).alias("_n"))
                .where(F.col("_n") > 1)
                .agg(F.coalesce(F.sum("_n"), F.lit(0)).cast("long").alias("v"))
            )
            total = df.agg(F.count(F.lit(1)).alias("t"))
            reports.append(dup.crossJoin(total).select(
                F.lit(r["name"]).alias("rule"),
                F.col("v").alias("violations"),
                F.col("t").alias("total"),
            ))
        elif r["kind"] == "referential":
            dangling = (
                df.where(F.col(r["col"]).isNotNull())
                .join(
                    r["dim"].select(F.col(r["dim_col"]).alias(r["col"])).distinct(),
                    r["col"], "left_anti",
                )
                .agg(F.count(F.lit(1)).cast("long").alias("v"))
            )
            total = df.agg(F.count(F.lit(1)).alias("t"))
            reports.append(dangling.crossJoin(total).select(
                F.lit(r["name"]).alias("rule"),
                F.col("v").alias("violations"),
                F.col("t").alias("total"),
            ))

    out = reports[0]
    for rep in reports[1:]:
        out = out.unionByName(rep)
    return out.select(
        "rule", "violations", "total",
        (F.col("violations") == 0).alias("passed"),
    )


def chi2_association(df: DataFrame, col_a: str, col_b: str) -> DataFrame:
    """Pearson χ² test of association between two categorical columns,
    plus Cramér's V — the PROFILING complement of the constraint gates
    above: a curation pipeline uses it to detect unexpected coupling
    (e.g. language × source skew that a stratified sampler must respect,
    or a leaking join key). Returns ONE row: (n, r_levels, c_levels,
    dof, chi2_micro, cramers_v_micro).

    Shape: one (a, b) contingency count (map-side combinable, the only
    data-sized shuffle), marginals re-aggregated FROM the cell counts
    (cells are levels², never data-sized), expected counts joined back
    cell-wise. The χ² statistic is a sum of per-cell doubles, so the
    established order-free kernel applies: each cell's contribution
    (o − rc/n)²/(rc/n) is micro-quantized to a LONG and the statistic
    is an exact integer sum — bit-identical on any partitioning and
    replayable by the SQL oracle (each per-cell double is one fixed
    expression shape; only the quantized longs are ever summed).

    NULL categories count as their own level (groupBy semantics kept
    deliberately; filter upstream if NULL should be excluded)."""
    cells = df.groupBy(
        F.col(col_a).alias("a"), F.col(col_b).alias("b")
    ).agg(F.count("*").alias("o"))
    ra = cells.groupBy("a").agg(F.sum("o").alias("ra"))
    cb = cells.groupBy("b").agg(F.sum("o").alias("cb"))
    tot = cells.agg(
        F.sum("o").alias("n"),
        F.count_distinct("a").alias("r_levels"),
        F.count_distinct("b").alias("c_levels"),
    )
    contrib = (
        cells.join(ra, "a").join(cb, "b").crossJoin(F.broadcast(tot))
        .select(
            "n", "r_levels", "c_levels",
            F.round(
                (
                    (F.col("o") - F.col("ra") * F.col("cb") / F.col("n"))
                    * (F.col("o") - F.col("ra") * F.col("cb") / F.col("n"))
                    / (F.col("ra") * F.col("cb") / F.col("n"))
                ) * F.lit(1_000_000.0)
            ).cast("long").alias("cell_micro"),
        )
    )
    out = contrib.groupBy("n", "r_levels", "c_levels").agg(
        F.sum("cell_micro").alias("chi2_micro")
    )
    # Cramér's V = sqrt((chi2/n) / min(r-1, c-1)); computed from the
    # exact integer chi2_micro, so the double is one deterministic shape
    v = F.sqrt(
        (F.col("chi2_micro") / F.lit(1_000_000.0))
        / (F.col("n") * F.least(F.col("r_levels") - 1, F.col("c_levels") - 1))
    )
    return out.select(
        "n", "r_levels", "c_levels",
        ((F.col("r_levels") - 1) * (F.col("c_levels") - 1)).alias("dof"),
        "chi2_micro",
        F.when(
            F.least(F.col("r_levels") - 1, F.col("c_levels") - 1) > 0,
            F.round(v * F.lit(1_000_000.0)).cast("long"),
        ).alias("cramers_v_micro"),  # NULL when a column has one level
    )
