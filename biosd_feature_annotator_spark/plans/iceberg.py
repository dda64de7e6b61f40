"""Iceberg backend (cluster-only — SURVEY.md §7.3(1)).

The Iceberg runtime jar is unobtainable in this offline sandbox, so these
paths cannot be exercised here; they are the one-config-away cluster
equivalents of the parquet layout used by plans/materialize.py (identical
partition spec), kept in a separate module so the local engine never
imports a missing catalog.

Cluster session config (spark-submit):
    --packages org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:<ver>
    --conf spark.sql.catalog.kg=org.apache.iceberg.spark.SparkCatalog
    --conf spark.sql.catalog.kg.type=hive   # or rest/glue/hadoop

DDL (once):
    CREATE TABLE kg.db.transcripts (conv_id string, turn_idx int, role
      string, text string, tool string, ts timestamp)
      USING iceberg PARTITIONED BY (bucket(4096, conv_id));
    CREATE TABLE kg.db.triples (... TRIPLE_COLS ..., part_id int,
      run_id string) USING iceberg PARTITIONED BY (run_id, part_id);
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_triples_iceberg(triples: DataFrame, table: str) -> None:
    """Idempotent per-partition overwrite — the transactional equivalent
    of the local dynamic-partition parquet overwrite. Re-running a part
    after a crash replaces exactly that part's files in one snapshot."""
    triples.writeTo(table).overwritePartitions()


def purge_run_iceberg(spark: SparkSession, table: str, run_id: str) -> None:
    """S7 purge as a metadata-only Iceberg DELETE (partition-level drop,
    no rewrite)."""
    spark.sql(f"DELETE FROM {table} WHERE run_id = '{run_id}'")


def expire_snapshots(spark: SparkSession, table: str, older_than: str) -> None:
    """Retention maintenance — keeps the manifest/metadata tree bounded on
    a long-running campaign table. older_than: 'yyyy-MM-dd HH:mm:ss'."""
    spark.sql(
        f"CALL kg.system.expire_snapshots(table => '{table}', "
        f"older_than => TIMESTAMP '{older_than}')"
    )
