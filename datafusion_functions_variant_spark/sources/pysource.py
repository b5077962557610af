"""Custom Python DataSource (Spark 4 ``pyspark.sql.datasource`` API) —
the extensible-connector surface of the engine.

``SyntheticEventsDataSource`` generates a deterministic event table
from (n_rows, n_partitions) options: every value is a pure function of
the row id (md5-derived), so an oracle can reproduce the exact rows.
Partition planning splits the id range evenly — each Spark task
generates its slice independently (embarrassingly parallel, no driver
bottleneck, scales to any row count).
"""

from __future__ import annotations

import hashlib

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("bucket", LongType()),
        StructField("score", DoubleType()),
        StructField("tag", StringType()),
    ]
)

_TAGS = ["alpha", "beta", "gamma", "delta"]


def row_for(i: int):
    """Deterministic row from id — mirrored by the SQL oracle."""
    h = hashlib.md5(f"row:{i}".encode()).hexdigest()
    bucket = int(h[:2], 16) % 8
    score = int(h[2:10], 16) / 16**8  # [0, 1) from 32 hash bits
    tag = _TAGS[int(h[10], 16) % 4]
    return (i, bucket, score, tag)


class _Range(InputPartition):
    def __init__(self, start: int, end: int):
        self.start, self.end = start, end


class _Reader(DataSourceReader):
    def __init__(self, options):
        self.n_rows = int(options.get("n_rows", 1000))
        self.n_parts = int(options.get("n_partitions", 8))

    def partitions(self):
        step = max(1, (self.n_rows + self.n_parts - 1) // self.n_parts)
        return [
            _Range(s, min(s + step, self.n_rows))
            for s in range(0, self.n_rows, step)
        ]

    def read(self, partition: _Range):
        for i in range(partition.start, partition.end):
            yield row_for(i)


class _StreamReader(SimpleDataSourceStreamReader):
    """Micro-batch reader over the same deterministic generator: each
    batch advances the id offset by ``batch_rows`` until ``n_rows`` is
    reached, after which batches are empty. Offsets are plain dicts, so
    checkpoint/restart replays exactly (readBetweenOffsets regenerates
    any committed range — the generator IS the write-ahead log)."""

    def __init__(self, options):
        self.n_rows = int(options.get("n_rows", 1000))
        self.batch_rows = int(options.get("batch_rows", 250))

    def initialOffset(self):
        return {"i": 0}

    def read(self, start):
        s = int(start["i"])
        e = min(s + self.batch_rows, self.n_rows)
        return iter([row_for(i) for i in range(s, e)]), {"i": e}

    def readBetweenOffsets(self, start, end):
        return iter([row_for(i) for i in range(int(start["i"]), int(end["i"]))])


class SyntheticEventsDataSource(DataSource):
    @classmethod
    def name(cls):
        return "synthetic_events"

    def schema(self):
        return SCHEMA

    def reader(self, schema):
        return _Reader(self.options)

    def simpleStreamReader(self, schema):
        return _StreamReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(SyntheticEventsDataSource)


class _JsonlCommit(WriterCommitMessage):
    def __init__(self, staged: str):
        self.staged = staged


class _JsonlWriter(DataSourceWriter):
    """Per-task JSONL writer with staged-commit (write-rename)
    semantics: each task writes to ``_staging/<uuid>.jsonl``; only the
    driver-side commit renames the staged files into the target
    directory, so a failed/retried task leaves no partial output
    visible. Scope: the guarantee holds on a local or shared
    filesystem (tasks and the committing driver must see the same
    ``path``); on object stores you'd stage in the task and commit via
    the store's multipart/rename primitive instead. Commit moves the
    staged files in BEFORE deleting old files in overwrite mode, so a
    crash mid-commit can leave a mixed directory but never an empty
    one — still not atomic (that would need a directory swap), and
    documented as such."""

    def __init__(self, options, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("jsonl_sink requires option 'path'")
        self.overwrite = overwrite

    def write(self, iterator):
        import json as _json
        import os
        import uuid

        staging = os.path.join(self.path, "_staging")
        os.makedirs(staging, exist_ok=True)
        staged = os.path.join(staging, f"{uuid.uuid4().hex}.jsonl")
        with open(staged, "w") as f:
            for row in iterator:
                f.write(_json.dumps(row.asDict()) + "\n")
        return _JsonlCommit(staged)

    def commit(self, messages):
        import os
        import shutil

        staged_names = set()
        for m in messages:
            name = os.path.basename(m.staged)
            staged_names.add(name)
            shutil.move(m.staged, os.path.join(self.path, name))
        # overwrite: delete old files AFTER the new ones are in place —
        # a crash mid-commit leaves a mixed directory, never an empty
        # or partial-only one (uuid names can't collide with old files)
        if self.overwrite:
            for entry in os.listdir(self.path):
                if entry.endswith(".jsonl") and entry not in staged_names:
                    os.remove(os.path.join(self.path, entry))
        shutil.rmtree(os.path.join(self.path, "_staging"), ignore_errors=True)

    def abort(self, messages):
        import shutil

        shutil.rmtree(os.path.join(self.path, "_staging"), ignore_errors=True)


class JsonlSinkDataSource(DataSource):
    """Custom Python DataSource WRITER (Spark 4 connector API) — the
    write-side counterpart of SyntheticEventsDataSource's reader."""

    @classmethod
    def name(cls):
        return "jsonl_sink"

    def writer(self, schema, overwrite: bool):
        return _JsonlWriter(self.options, overwrite)


def register_sink(spark) -> None:
    spark.dataSource.register(JsonlSinkDataSource)
