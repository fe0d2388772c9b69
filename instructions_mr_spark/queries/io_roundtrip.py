"""I/O round-trips and config compilation as oracled queries
(SURVEY.md §2.1 ``jsonl_scan``/``jsonl_sink``/``csv_scan``/
``csv_sink``/``config_scan``/``stdout_sink`` + §2.2
``prompt_template_sub``) — the six rows VERDICT r01 flagged as having
no ``queries()`` entry.

Round-trip pattern: the Spark side WRITES a table through the sink
under test, RE-SCANS it through the scan under test, and returns the
re-read rows; the oracle selects the same rows straight from parquet.
A hash match therefore certifies write+read fidelity end to end
(types, quoting, non-ASCII, nulls) — if either direction corrupted a
value the hashes diverge.  Reference anchors: the JSONL loop at
``bin/text_mr_pipe.py:46-58`` (json.loads per line in, json.dumps per
record out).

Write targets live under the system tmp dir, keyed by sf_dir hash so
concurrent scale factors don't collide; tiny dimension tables keep
the side effect cheap at any sf.
"""

from __future__ import annotations

import hashlib
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from instructions_mr_spark.config import PipelineConfig
from instructions_mr_spark.operators.prompts import (
    prompt_template_sub,
    prompt_template_sub_col,
)
from instructions_mr_spark.queries._util import t
from instructions_mr_spark.registry import query
from instructions_mr_spark.plans.guard import literal_df
from instructions_mr_spark.sources.io import (
    csv_scan,
    csv_sink,
    jsonl_scan,
    jsonl_sink,
    stdout_render,
)


def _rt_path(name: str, sf_dir: str) -> str:
    key = hashlib.md5(sf_dir.encode()).hexdigest()[:10]
    return os.path.join(tempfile.gettempdir(), "imr_roundtrip", f"{name}-{key}")


@query(
    "jsonl_scan",
    oracle="SELECT n_nationkey, n_name, n_regionkey FROM nation",
)
def jsonl_scan_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSONL sink -> scan round trip over nation: write one JSON object
    per line (non-ASCII preserved, = json.dumps(ensure_ascii=False)),
    re-read with the declared schema (production mode — no inference),
    return every row.  bin/text_mr_pipe.py:46-49."""
    nation = t(spark, sf_dir, "nation")
    path = _rt_path("jsonl_scan", sf_dir)
    jsonl_sink(nation, path)
    return jsonl_scan(spark, path, schema=nation.schema)


@query(
    "jsonl_sink",
    oracle="""
    SELECT lang,
           COUNT(*) AS n_docs,
           COUNT(DISTINCT source) AS n_sources,
           CAST(SUM(CASE WHEN result = upper(lang) THEN 1 ELSE 0 END) AS BIGINT) AS n_result_ok
    FROM (SELECT lang, source, upper(lang) AS result FROM documents)
    GROUP BY lang
    """,
)
def jsonl_sink_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference sink shape — input record + appended results
    column — written to JSONL, re-scanned, and aggregated; counts
    certify no record was dropped/duplicated and the appended column
    survived the trip (bin/text_mr_pipe.py:50-58)."""
    docs = t(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", F.upper("lang").alias("result")
    )
    path = _rt_path("jsonl_sink", sf_dir)
    jsonl_sink(docs, path)
    back = jsonl_scan(spark, path, schema=docs.schema)
    return back.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.countDistinct("source").alias("n_sources"),
        F.sum(
            F.when(F.col("result") == F.upper("lang"), F.lit(1)).otherwise(F.lit(0))
        ).alias("n_result_ok"),
    )


@query(
    "csv_scan",
    oracle="SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment FROM customer",
)
def csv_scan_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV sink -> scan round trip over customer (headers, declared
    schema on re-read — inference never sees production data): ints,
    doubles, and strings survive the text trip bit-exactly."""
    customer = t(spark, sf_dir, "customer")
    path = _rt_path("csv_scan", sf_dir)
    csv_sink(customer, path)
    return csv_scan(spark, path, schema=customer.schema)


@query(
    "csv_sink",
    oracle="""
    SELECT r_regionkey, r_name,
           r_name || ', with, commas, and "quotes"' AS r_note
    FROM region
    """,
)
def csv_sink_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV quoting torture: a column containing the delimiter and
    double quotes must round-trip unchanged (writer quotes + escapes,
    reader unescapes)."""
    region = t(spark, sf_dir, "region").select(
        "r_regionkey",
        "r_name",
        F.concat(F.col("r_name"), F.lit(', with, commas, and "quotes"')).alias(
            "r_note"
        ),
    )
    path = _rt_path("csv_sink", sf_dir)
    csv_sink(region, path)
    return csv_scan(spark, path, schema=region.schema)


_CONFIG_LITERAL = {
    "in_data_path": "/dev/null",
    "out_data_path": "/dev/null",
    "llm": {"api_type": "echo", "model": "echo-1", "temperature": 0.0, "seed": 2},
    "pipe": [
        [
            {"name": "summary", "content": "Summarize.", "scope": ["text"]},
            {"name": "language", "content": "Identify language.", "scope": ["text", "lang"]},
        ],
        [
            {"name": "report", "content": "Merge results.", "role": "editor"},
        ],
    ],
}


@query(
    "config_scan",
    oracle="""
    SELECT * FROM (VALUES
      (0, 'map',    'summary',  'text',      'Summarize.'),
      (0, 'map',    'language', 'text,lang', 'Identify language.'),
      (1, 'reduce', 'report',   NULL,        'Merge results.')
    ) AS t(stage_idx, kind, name, scope_csv, content)
    """,
)
def config_scan_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compile a reference-shaped pipeline config (bin/text_mr_pipe.json
    format) and emit its stage/instruction table — the engine's "query
    language" front end as a checkable relation.  Config size is
    bounded (human-written), so createDataFrame here is driver-safe."""
    conf = PipelineConfig.from_dict(_CONFIG_LITERAL)
    rows = [
        (si, stage.kind, ins.name, ",".join(ins.scope) if ins.scope else None, ins.content)
        for si, stage in enumerate(conf.stages)
        for ins in stage.instructions
    ]
    return literal_df(spark,
        rows, "stage_idx int, kind string, name string, scope_csv string, content string"
    )


@query(
    "prompt_template_sub",
    oracle="""
    SELECT doc_id,
           replace(replace(
             'ROLE: a careful analyst' || chr(10) ||
             'LANG: __LANG__' || chr(10) || 'SOURCE: __SOURCE__',
             '__LANG__', lang), '__SOURCE__', source) AS prompt
    FROM documents
    """,
)
def prompt_template_sub_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Template substitution two ways: plan-time (config literals, the
    reference's only mode — self_verification_mr.py:473-486) for
    __ROLE__, then per-record column fill for __LANG__/__SOURCE__
    (JVM replace chain, no UDF)."""
    template = "ROLE: __ROLE__\nLANG: __LANG__\nSOURCE: __SOURCE__"
    partial = prompt_template_sub(template, {"__ROLE__": "a careful analyst"})
    return t(spark, sf_dir, "documents").select(
        "doc_id",
        prompt_template_sub_col(
            partial, {"__LANG__": F.col("lang"), "__SOURCE__": F.col("source")}
        ).alias("prompt"),
    )


@query(
    "stdout_sink",
    oracle="""
    SELECT n_nationkey, concat_ws(chr(9), n_nationkey, n_name, n_regionkey) AS line
    FROM nation
    """,
)
def stdout_sink_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The stdout sink's deterministic core: tab-joined row rendering
    (the print itself is a bounded take(limit) over exactly these
    lines — sources/io.py:stdout_sink)."""
    return stdout_render(t(spark, sf_dir, "nation")).select("n_nationkey", "line")


@query(
    "textfile_scan",
    oracle="SELECT md5(CAST(n_nationkey AS VARCHAR) || ':' || n_name) AS line FROM nation",
)
def textfile_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Line-oriented text source round trip (spark.read/write.text):
    one digest line per nation row out, scanned back verbatim — the
    raw-corpus ingest format (one document per line) at its simplest."""
    nation = t(spark, sf_dir, "nation")
    lines = nation.select(
        F.md5(
            F.concat(F.col("n_nationkey").cast("string"), F.lit(":"), F.col("n_name"))
        ).alias("value")
    )
    path = _rt_path("textfile_scan", sf_dir)
    lines.write.mode("overwrite").text(path)
    return spark.read.text(path).select(F.col("value").alias("line"))


@query(
    "binaryfile_scan",
    oracle="""
    SELECT strlen(n_name) AS n_bytes, md5(n_name) AS digest
    FROM nation
    """,
)
def binaryfile_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The multimodal ingest front door: opaque files scanned with the
    ``binaryFile`` source (path, length, content) — here one file per
    nation row with known bytes, so the oracle recomputes each file's
    length+digest from the table without touching the filesystem.
    At 100 TB this is how image/audio blobs enter the lake before
    binary_metadata/decode (operators/multimodal.py) take over."""
    import os as _os

    nation_rows = t(spark, sf_dir, "nation").select("n_nationkey", "n_name").collect()
    base = _rt_path("binaryfile_scan", sf_dir)
    _os.makedirs(base, exist_ok=True)
    for r in nation_rows:  # bounded: 25 files at every sf
        with open(_os.path.join(base, f"n{r.n_nationkey}.bin"), "wb") as fh:
            fh.write(r.n_name.encode("utf-8"))
    files = spark.read.format("binaryFile").load(base)
    return files.select(
        F.length("content").cast("bigint").alias("n_bytes"),
        F.md5("content").alias("digest"),
    )


@query(
    "orc_roundtrip",
    oracle="SELECT s_suppkey, s_name, s_nationkey, s_acctbal FROM supplier",
)
def orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC sink -> scan round trip over supplier: Spark's second
    columnar lake format (zlib-compressed, predicate-pushdown-capable
    like parquet), written and re-read with the declared schema —
    certifying the engine can hand data to an ORC-based warehouse and
    read it back bit-exact (DECIMAL/DOUBLE/VARCHAR all survive).

    Scale shape: a straight distributed write + scan; at 100 TB the
    write parallelism is the input partitioning and the re-scan gets
    the same pushdown/pruning treatment as parquet (ORC carries
    min/max stripes)."""
    supplier = t(spark, sf_dir, "supplier")
    path = _rt_path("orc_roundtrip", sf_dir)
    supplier.write.mode("overwrite").format("orc").save(path)
    return spark.read.schema(supplier.schema).orc(path)
