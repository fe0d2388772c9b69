"""Custom Python Data Source (Spark 4 ``pyspark.sql.datasource``) —
a deterministic synthetic-documents generator exposed as a real
``spark.read.format(...)`` source (SURVEY.md §2.1 extension: the
engine can host NEW source formats in pure Python, partitioned for
parallelism, without touching the JVM).

Shape: ``spark.read.format("imr_synth").option("n_rows", N)
.option("n_parts", P).schema(...).load()`` yields N rows split across
P input partitions; every value is a pure function of the row id (md5
text, id % lang buckets), so any engine can reproduce the table —
which is exactly what the DuckDB oracle does (queries/lake_ops.py
``python_datasource_scan``).

At scale: partitions() returns P independent splits, each read() runs
in its own task — the same parallel-scan contract as a file source;
a real connector would put its split metadata (file ranges, shard
ids) in the InputPartition.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)
from pyspark.sql import types as T

_LANGS = ("en", "fr", "de", "es", "ja")


def synth_row(i: int) -> tuple[int, str, str]:
    """Deterministic row i — shared by the reader AND the tests, and
    restated in SQL by the oracle."""
    return i, hashlib.md5(str(i).encode()).hexdigest(), _LANGS[i % len(_LANGS)]


class _SynthPartition(InputPartition):
    def __init__(self, start: int, end: int) -> None:
        self.start = start
        self.end = end


class _SynthReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.n_rows = int(options.get("n_rows", 100))
        self.n_parts = max(1, int(options.get("n_parts", 4)))

    def partitions(self) -> Sequence[InputPartition]:
        step = -(-self.n_rows // self.n_parts)  # ceil division
        return [
            _SynthPartition(lo, min(lo + step, self.n_rows))
            for lo in range(0, self.n_rows, step)
        ]

    def read(self, partition: _SynthPartition) -> Iterator[tuple]:
        for i in range(partition.start, partition.end):
            yield synth_row(i)


class SynthDocsDataSource(DataSource):
    """``format("imr_synth")``: id, md5 text digest, cycled lang."""

    @classmethod
    def name(cls) -> str:
        return "imr_synth"

    def schema(self) -> T.StructType:
        return T.StructType(
            [
                T.StructField("id", T.LongType()),
                T.StructField("digest", T.StringType()),
                T.StructField("lang", T.StringType()),
            ]
        )

    def reader(self, schema: T.StructType) -> DataSourceReader:
        return _SynthReader(self.options)


class _SynthStreamReader:
    """Micro-batch stream over the same synthetic rows: each batch
    advances the offset by ``batch_rows`` ids until ``n_rows`` —
    a SimpleDataSourceStreamReader (offset = dict, exactly-once by
    offset-range replay)."""

    def __init__(self, options: dict) -> None:
        self.n_rows = int(options.get("n_rows", 100))
        self.batch_rows = int(options.get("batch_rows", 25))

    def initialOffset(self) -> dict:
        return {"pos": 0}

    def read(self, start: dict):
        lo = start["pos"]
        hi = min(lo + self.batch_rows, self.n_rows)
        # a picklable ITERATOR is required: generators can't pickle,
        # bare lists fail next(); iter(list) satisfies both
        return iter([synth_row(i) for i in range(lo, hi)]), {"pos": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter([synth_row(i) for i in range(start["pos"], end["pos"])])

    def commit(self, end: dict) -> None:
        pass


class SynthDocsStreamDataSource(DataSource):
    """``format("imr_synth_stream")``: the streaming twin — same rows
    delivered as micro-batches with replayable offset ranges."""

    @classmethod
    def name(cls) -> str:
        return "imr_synth_stream"

    def schema(self) -> T.StructType:
        return SynthDocsDataSource.schema(self)

    def simpleStreamReader(self, schema: T.StructType) -> "_SynthStreamReader":
        return _SynthStreamReader(self.options)


class _ShardMsg(WriterCommitMessage):
    """Task commit message: shard path + row count (module-level so
    it pickles back to the driver)."""

    def __init__(self, shard: str, n: int) -> None:
        self.shard = shard
        self.n = n


class _JsonlShardWriter(DataSourceWriter):
    """DataSourceWriter: each task writes its partition to a private
    shard file, commit() publishes a manifest of the task-reported
    shards — the two-phase (write-then-commit) contract that makes a
    distributed sink atomic-ish: uncommitted shards are invisible
    because readers go through the manifest."""

    def __init__(self, options: dict, overwrite: bool) -> None:
        self.path = options["path"]

    def write(self, iterator):
        import json
        import os
        import uuid

        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        os.makedirs(self.path, exist_ok=True)
        shard = os.path.join(self.path, f"shard-{pid}-{uuid.uuid4().hex[:8]}.jsonl")
        n = 0
        with open(shard, "w", encoding="utf-8") as fh:
            for row in iterator:
                fh.write(json.dumps(row.asDict(), ensure_ascii=False) + "\n")
                n += 1
        return _ShardMsg(shard, n)

    def commit(self, messages):
        import json
        import os

        manifest = {
            "shards": [m.shard for m in messages],
            "rows": sum(m.n for m in messages),
        }
        with open(os.path.join(self.path, "_MANIFEST.json"), "w") as fh:
            json.dump(manifest, fh)

    def abort(self, messages):
        import os

        for m in messages:
            if m is not None and os.path.exists(m.shard):
                os.remove(m.shard)


class JsonlShardSink(DataSource):
    """``format("imr_jsonl_sink")``: manifest-committed JSONL shards."""

    @classmethod
    def name(cls) -> str:
        return "imr_jsonl_sink"

    def writer(self, schema: T.StructType, overwrite: bool) -> _JsonlShardWriter:
        return _JsonlShardWriter(self.options, overwrite)


def register(spark) -> None:
    """Idempotent registration; call before format("imr_synth")."""
    from instructions_mr_spark.shipping import ensure_shipped

    ensure_shipped(spark)
    spark.dataSource.register(SynthDocsDataSource)
    spark.dataSource.register(SynthDocsStreamDataSource)
    spark.dataSource.register(JsonlShardSink)
