"""Custom Python DataSource (Spark 4 ``pyspark.sql.datasource`` API):
JSONL transcript exchange format.

Transcripts commonly arrive as JSON-Lines dumps (one turn per line) before
they are compacted into parquet/Iceberg. This connector makes that format a
first-class, PARTITIONED Spark source/sink:

    spark.dataSource.register(JsonlTranscriptDataSource)
    df = spark.read.format("jsonl_transcripts").load("/drops/day=2024-01-01")
    df.write.format("jsonl_transcripts").mode("overwrite").save("/export")

- one input partition per file → a directory of N files scans with N-way
  parallelism, no driver-side reading;
- the reader emits the engine's canonical transcript schema (BASELINE
  input_hint) with ISO-8601 ``ts`` parsing;
- the writer emits one part file per task (suffixed with the partition id),
  so concurrent tasks never collide and a re-run with overwrite is
  idempotent.

A Python DataSource runs Python per partition — the right trade for an
I/O-bound INTERCHANGE format (the hot analytical path stays on
parquet/Iceberg; ingest once, compact, then scan columnar).
"""

from __future__ import annotations

import glob
import json
import os
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)

TRANSCRIPT_DDL = (
    "conv_id string, turn_idx int, role string, text string, tool string, "
    "ts timestamp"
)

_FIELDS = ("conv_id", "turn_idx", "role", "text", "tool", "ts")


def _expand(path: str) -> list[str]:
    if os.path.isdir(path):
        return sorted(glob.glob(os.path.join(path, "*.jsonl")))
    return sorted(glob.glob(path)) or [path]


class JsonlTranscriptReader(DataSourceReader):
    """mode option (mirrors Spark's own JSON reader):
    - FAILFAST (default): a malformed line raises and fails the task —
      corruption should stop an ingest, not silently shrink it;
    - PERMISSIVE: malformed lines are skipped (real drop directories
      contain truncated tails from crashed producers); the skip is bounded
      per file (>10% bad lines still fails — a file that is mostly garbage
      is the wrong format, not a few torn writes)."""

    def __init__(self, options: dict) -> None:
        self.path = options.get("path")
        self.permissive = str(options.get("mode", "FAILFAST")).upper() == "PERMISSIVE"
        if not self.path:
            raise ValueError("jsonl_transcripts requires a path (…load(path))")

    def partitions(self):  # one partition per file → file-level parallelism
        return [InputPartition(f) for f in _expand(self.path)]

    def read(self, partition):
        from datetime import datetime

        n_ok = n_bad = 0
        with open(partition.value, encoding="utf-8") as fh:
            for line in fh:
                line = line.strip()
                if not line:
                    continue
                try:
                    o = json.loads(line)
                    ts = o.get("ts")
                    row = (
                        o.get("conv_id"),
                        int(o["turn_idx"]) if o.get("turn_idx") is not None else None,
                        o.get("role"),
                        o.get("text"),
                        o.get("tool"),
                        datetime.fromisoformat(ts) if ts else None,
                    )
                except (ValueError, TypeError, KeyError):
                    if not self.permissive:
                        raise
                    n_bad += 1
                    continue
                n_ok += 1
                yield row
        if self.permissive and n_bad > max(1, (n_ok + n_bad) // 10):
            raise ValueError(
                f"{partition.value}: {n_bad}/{n_ok + n_bad} malformed lines "
                "— exceeds the 10% permissive-skip bound (wrong format?)"
            )


@dataclass
class JsonlCommitMessage(WriterCommitMessage):
    staged: str = ""
    final: str = ""
    n_rows: int = 0


class JsonlTranscriptWriter(DataSourceWriter):
    """Failure-safe two-phase writer (standard FileOutputCommitter shape):

    - write() streams each task's rows into a task-attempt-unique STAGED
      file (`.part-<pid>-<job>-<attempt>.jsonl.tmp` — hidden from the
      reader's `*.jsonl` glob), so a crashed/killed task, or two
      speculative attempts of the same partition, can never collide on or
      corrupt a final part file;
    - commit() runs on the driver only after every task succeeded: it
      performs the destructive overwrite cleanup (deferred from plan
      time), renames each winning attempt's staged file to its final
      `part-<pid>-<job>.jsonl` name, and sweeps losing attempts'
      leftovers. The job token in both names keeps CONCURRENT jobs
      writing the same directory disjoint end-to-end: commit/abort sweep
      only this job's staging files, and in append mode two jobs (or a
      job appending over an earlier run) can never clobber each other's
      final part files because every final name embeds its job token.
    - abort() deletes this job's staged files, leaving pre-existing data
      (and any concurrent job's staging) intact — a failed overwrite job
      is a no-op on the destination.
    """

    def __init__(self, options: dict, overwrite: bool) -> None:
        import uuid

        self.path = options.get("path")
        self.overwrite = overwrite
        # minted once on the driver at plan time, serialized to every task
        self.job_token = uuid.uuid4().hex[:12]
        if not self.path:
            raise ValueError("jsonl_transcripts requires a path (…save(path))")

    def write(self, iterator):
        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid, attempt = ctx.partitionId(), ctx.taskAttemptId()
        os.makedirs(self.path, exist_ok=True)
        staged = os.path.join(
            self.path, f".part-{pid:05d}-{self.job_token}-{attempt}.jsonl.tmp"
        )
        final = os.path.join(self.path, f"part-{pid:05d}-{self.job_token}.jsonl")
        n = 0
        try:
            with open(staged, "w", encoding="utf-8") as fh:
                for row in iterator:
                    o = {k: getattr(row, k) for k in _FIELDS}
                    if o["ts"] is not None:
                        o["ts"] = o["ts"].isoformat()
                    fh.write(json.dumps(o) + "\n")
                    n += 1
        except BaseException:
            # the task owns its staging on ITS failure path: the driver's
            # abort() sweep runs once, and a task that raises AFTER that
            # sweep (first-failure kills the job while siblings are still
            # opening/writing) would otherwise strand a fresh .tmp nobody
            # ever reclaims — the race a full-suite run hits ~50% of the
            # time. Self-cleanup makes every failure path owned regardless
            # of abort timing; hard kills are covered by commit()'s TTL
            # backstop.
            try:
                os.remove(staged)
            except OSError:
                pass
            raise
        return JsonlCommitMessage(staged=staged, final=final, n_rows=n)

    def _staged_glob(self) -> str:
        # scoped to THIS job's token: a concurrent job's in-flight staging
        # in the same directory must never be swept by our commit/abort
        return os.path.join(self.path, f".part-*-{self.job_token}-*.jsonl.tmp")

    def commit(self, messages):
        import time

        if self.overwrite:
            for old in glob.glob(os.path.join(self.path, "*.jsonl")):
                os.remove(old)
        for m in messages:
            if m is not None and os.path.exists(m.staged):
                os.replace(m.staged, m.final)
        for leftover in glob.glob(self._staged_glob()):
            os.remove(leftover)
        # TTL backstop for staging a hard-killed FOREIGN job could not
        # clean itself (tasks self-clean on soft failure, abort() sweeps
        # this job's token): any .tmp untouched for an hour belongs to no
        # live job — same aging rule as the stream scratch sweep.
        now = time.time()
        for stale in glob.glob(
            os.path.join(self.path, ".part-*.jsonl.tmp")
        ):
            try:
                if now - os.stat(stale).st_mtime > 3600:
                    os.remove(stale)
            except OSError:
                pass

    def abort(self, messages):
        for leftover in glob.glob(self._staged_glob()):
            try:
                os.remove(leftover)
            except OSError:
                pass


class JsonlTranscriptDataSource(DataSource):
    """register with spark.dataSource.register(JsonlTranscriptDataSource)."""

    @classmethod
    def name(cls) -> str:
        return "jsonl_transcripts"

    def schema(self) -> str:
        return TRANSCRIPT_DDL

    def reader(self, schema):
        return JsonlTranscriptReader(self.options)

    def writer(self, schema, overwrite: bool):
        return JsonlTranscriptWriter(self.options, overwrite)
