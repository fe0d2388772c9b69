"""Sources and sinks (SURVEY.md §2.1).

Reference behaviors re-expressed on Spark readers/writers:

* ``jsonl_scan``  — reference reads a JSONL file one ``json.loads`` per
  non-blank line (``bin/text_mr_pipe.py:46-49``).  Spark's JSON source
  is already line-delimited and skips blank lines; schema may be
  declared (production) or inferred (ad hoc).
* ``jsonl_sink``  — reference appends a ``results`` column to each
  input record and writes JSONL preserving non-ASCII
  (``bin/text_mr_pipe.py:50-58``).  ``df.write.json`` writes one JSON
  object per line; Spark does not ASCII-escape, matching
  ``ensure_ascii=False``.
* ``md_sink``     — reference renders a stage to markdown
  ``"# {name}\n{content}\n\n"`` per instruction, concatenated in
  instruction order (``src/python/instructionspipe/instructions.py:62-70``).
  Here: a single JVM-side ``concat`` over the stage's output columns.

csv/parquet variants are the EXT relational surface (§2.7).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def jsonl_scan(
    spark: SparkSession, path: str, schema: T.StructType | str | None = None
) -> DataFrame:
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def jsonl_sink(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)


def parquet_scan(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def parquet_sink(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: Sequence[str] | None = None,
) -> None:
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def orc_scan(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)


def orc_sink(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: Sequence[str] | None = None,
) -> None:
    """ORC sink (columnar alternative to parquet; same pushdown and
    pruning support in Spark's vectorized reader)."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(path)


def zstd_parquet_sink(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Parquet with zstd: ~30% smaller than default snappy at similar
    scan speed — at 100 TB the storage/scan-byte savings compound."""
    df.write.mode(mode).option("compression", "zstd").parquet(path)


def csv_scan(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str | None = None,
    header: bool = True,
) -> DataFrame:
    reader = spark.read.option("header", header)
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", True)
    return reader.csv(path)


def csv_sink(df: DataFrame, path: str, mode: str = "overwrite", header: bool = True) -> None:
    df.write.mode(mode).option("header", header).csv(path)


def md_section(name: str, content: Column) -> Column:
    """One markdown section: ``# {name}\n{content}\n\n``.

    Mirrors instructions.py:64-69 ("# %s\n" % name then "%s\n\n" % msg).
    """
    return F.concat(F.lit(f"# {name}\n"), content, F.lit("\n\n"))


def md_sink(df: DataFrame, columns: Sequence[str], out_col: str = "md") -> DataFrame:
    """Render ``columns`` (a stage's outputs, in instruction order) to a
    single markdown string column — the reference's ``instructions_to_md``
    as a JVM-side concat (no UDF)."""
    sections = [md_section(c, F.coalesce(F.col(c).cast("string"), F.lit(""))) for c in columns]
    return df.withColumn(out_col, F.concat(*sections) if sections else F.lit(""))


def stdout_render(df: DataFrame, columns: Sequence[str] | None = None, sep: str = "\t") -> DataFrame:
    """Render rows to the text lines the stdout sink prints: one
    ``sep``-joined line per row, nulls as empty strings — the
    deterministic core of ``stdout_sink``, exposed as a DataFrame so
    the rendering is oracle-checkable."""
    cols = list(columns) if columns is not None else list(df.columns)
    line = F.concat_ws(
        sep, *[F.coalesce(F.col(c).cast("string"), F.lit("")) for c in cols]
    )
    return df.withColumn("line", line)


def stdout_sink(df: DataFrame, columns: Sequence[str] | None = None, limit: int = 20) -> int:
    """Print up to ``limit`` rendered rows to stdout (the reference
    CLI's terminal output; ``bin/text_mr_pipe.py`` prints per-record
    results as it loops).  Returns the number of lines printed.
    ``take(limit)`` bounds driver transfer — never a full collect."""
    rows = stdout_render(df, columns).select("line").take(limit)
    for r in rows:
        print(r.line)
    return len(rows)


def sorted_parquet_sink(
    df: DataFrame, path: str, sort_cols: Sequence[str], mode: str = "overwrite"
) -> None:
    """Write parquet with rows sorted inside each file on
    ``sort_cols``: parquet keeps per-row-group min/max stats, so a
    later filter on those columns skips whole row groups — the poor
    man's z-order, free at write time.  Sort is WITHIN partitions
    (no global shuffle); pair with repartition(col) upstream when
    files should also be value-clustered across files."""
    df.sortWithinPartitions(*sort_cols).write.mode(mode).parquet(path)


def compact_parquet(
    spark: SparkSession,
    path: str,
    out_path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Small-file compaction: rewrite a parquet directory into
    ceil(total_bytes / target) files and return the new file count.
    The #1 lake-maintenance chore at 100 TB — streaming/micro-batch
    sinks leave thousands of KB-sized files whose per-file open cost
    dominates scans.  coalesce (not repartition): no shuffle, just
    fewer write tasks.

    Sizing goes through the Hadoop FileSystem API (not os.walk), so it
    works for any filesystem Spark can read — s3a://, hdfs://, file://
    — not just the driver's local disk."""
    import math

    jvm = spark._jvm
    jsc = spark._jsc
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(jsc.hadoopConfiguration())
    total = fs.getContentSummary(hpath).getLength()
    n = max(1, math.ceil(total / target_file_bytes))
    spark.read.parquet(path).coalesce(n).write.mode("overwrite").parquet(out_path)
    return n
