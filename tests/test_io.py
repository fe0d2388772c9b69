"""Round-trip tests for sources/sinks (SURVEY.md §2.1) and the CLI."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from instructions_mr_spark.sources.io import (
    csv_scan,
    csv_sink,
    jsonl_scan,
    jsonl_sink,
    parquet_scan,
    parquet_sink,
)


def test_jsonl_roundtrip_preserves_unicode(spark, tmp_path):
    df = spark.createDataFrame([(1, "héllo wörld", [1, 2])], "id long, s string, a array<int>")
    out = str(tmp_path / "j")
    jsonl_sink(df, out)
    # non-ASCII must be written raw (reference ensure_ascii=False,
    # text_mr_pipe.py:55-58)
    raw = "".join(
        open(os.path.join(out, f), encoding="utf-8").read()
        for f in os.listdir(out)
        if f.endswith(".json")
    )
    assert "héllo wörld" in raw
    back = jsonl_scan(spark, out)
    assert back.count() == 1
    assert back.collect()[0].s == "héllo wörld"


def test_jsonl_scan_skips_blank_lines(spark, tmp_path):
    p = tmp_path / "in.jsonl"
    p.write_text('{"a": 1}\n\n{"a": 2}\n\n', encoding="utf-8")
    df = jsonl_scan(spark, str(p))
    assert sorted(r.a for r in df.collect()) == [1, 2]


def test_csv_roundtrip(spark, tmp_path):
    df = spark.createDataFrame([(1, "x"), (2, "y")], "id long, s string")
    out = str(tmp_path / "c")
    csv_sink(df, out)
    back = csv_scan(spark, out, schema="id long, s string")
    assert sorted((r.id, r.s) for r in back.collect()) == [(1, "x"), (2, "y")]


def test_parquet_roundtrip_partitioned(spark, tmp_path):
    df = spark.createDataFrame([(1, "a"), (2, "b"), (3, "a")], "id long, part string")
    out = str(tmp_path / "p")
    parquet_sink(df, out, partition_by=["part"])
    assert os.path.isdir(os.path.join(out, "part=a"))  # partition pruning layout
    back = parquet_scan(spark, out)
    assert back.filter(F.col("part") == "a").count() == 2


def test_cli_end_to_end(spark, tmp_path):
    """The reference user's workflow: their config shape, JSONL in,
    JSONL out, echo LLM."""
    from instructions_mr_spark.cli import main

    in_path = tmp_path / "in.jsonl"
    in_path.write_text(
        '{"text": "alpha", "tag": "t1"}\n{"text": "beta", "tag": "t2"}\n',
        encoding="utf-8",
    )
    out_path = str(tmp_path / "out")
    conf = {
        "in_data_path": str(in_path),
        "out_data_path": out_path,
        "llm": {"api_type": "echo", "model": "echo", "temperature": 0.0},
        "pipe": [
            [
                {"name": "summary", "content": "Summarize.", "scope": ["text"]},
                {"name": "label", "content": "Label.", "scope": ["tag"]},
            ],
            [
                {
                    "name": "final",
                    "content": "Merge.",
                    "scope": ["summary", "label"],
                }
            ],
        ],
    }
    conf_path = tmp_path / "conf.json"
    conf_path.write_text(json.dumps(conf), encoding="utf-8")

    assert main([str(conf_path)]) == 0

    rows = []
    for f in os.listdir(out_path):
        if f.endswith(".json"):
            for line in open(os.path.join(out_path, f), encoding="utf-8"):
                if line.strip():
                    rows.append(json.loads(line))
    assert len(rows) == 2
    by_final = sorted(rows, key=lambda r: r["final"])
    assert set(rows[0]) == {"final", "result_md"}
    assert json.loads(by_final[0]["final"]).keys() == {"summary", "label"}
    assert rows[0]["result_md"].startswith("# final\n")


def test_cli_bad_config_paths(tmp_path, capsys):
    from instructions_mr_spark.cli import main

    assert main([str(tmp_path / "missing.json")]) == 2
    bad = tmp_path / "bad.json"
    bad.write_text("{not json", encoding="utf-8")
    assert main([str(bad)]) == 2
    err = capsys.readouterr().err
    assert "not found" in err and "not valid JSON" in err


def test_cli_explain_prints_plan(spark, tmp_path, capsys):
    """--explain prints the compiled physical plan and writes nothing."""
    import json as _json

    from instructions_mr_spark.cli import main

    in_path = tmp_path / "in.jsonl"
    in_path.write_text('{"text": "alpha"}\n', encoding="utf-8")
    out_path = str(tmp_path / "out_explain")
    conf = {
        "in_data_path": str(in_path),
        "out_data_path": out_path,
        "llm": {"api_type": "echo", "model": "echo"},
        "pipe": [[{"name": "summary", "content": "Summarize.", "scope": ["text"]}]],
    }
    conf_path = tmp_path / "conf.json"
    conf_path.write_text(_json.dumps(conf), encoding="utf-8")

    assert main([str(conf_path), "--explain"]) == 0
    plan = capsys.readouterr().out
    assert "Physical Plan" in plan
    assert not os.path.exists(out_path)  # nothing written


def test_orc_and_zstd_roundtrip(spark, tmp_path):
    from instructions_mr_spark.sources.io import (
        orc_scan,
        orc_sink,
        zstd_parquet_sink,
    )

    df = spark.range(100).withColumn("s", F.concat(F.lit("v"), F.col("id")))
    orc_path = str(tmp_path / "o.orc")
    orc_sink(df, orc_path)
    assert sorted(r.id for r in orc_scan(spark, orc_path).collect()) == list(range(100))

    zp = str(tmp_path / "z.parquet")
    zstd_parquet_sink(df, zp)
    import glob as _glob

    files = _glob.glob(os.path.join(zp, "*.zstd.parquet"))
    assert files  # codec actually applied (suffix carries the codec)
    assert spark.read.parquet(zp).count() == 100


def test_sorted_sink_rowgroup_stats(spark, tmp_path):
    """Sorted files carry tight min/max stats; a selective filter on
    the sort column must prune row groups (verified via the pushdown
    filter reaching the scan and correct results)."""
    from instructions_mr_spark.sources.io import sorted_parquet_sink

    df = spark.range(0, 10000).withColumn("k", (F.col("id") * 7919) % 10000)
    out = str(tmp_path / "sorted")
    sorted_parquet_sink(df, out, ["k"])
    back = spark.read.parquet(out).filter(F.col("k") < 5)
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "LessThan(k,5)" in plan  # pushed to the parquet reader
    assert sorted(r.k for r in back.collect()) == [0, 1, 2, 3, 4]


def test_compact_parquet_merges_small_files(spark, tmp_path):
    from instructions_mr_spark.sources.io import compact_parquet

    src = str(tmp_path / "fragmented")
    # 64 tiny files
    spark.range(0, 6400).repartition(64).write.parquet(src)
    n_before = len([f for f in os.listdir(src) if f.endswith(".parquet")])
    assert n_before == 64
    out = str(tmp_path / "compacted")
    n = compact_parquet(spark, src, out, target_file_bytes=10**9)
    n_after = len([f for f in os.listdir(out) if f.endswith(".parquet")])
    assert n == 1 and n_after == 1
    assert spark.read.parquet(out).count() == 6400


def test_stdout_sink_prints_rendered_lines(spark, capsys):
    from instructions_mr_spark.sources.io import stdout_sink

    df = spark.createDataFrame([(1, "a", None), (2, "b", "x")], "id int, s string, n string")
    n = stdout_sink(df, limit=10)
    out = capsys.readouterr().out
    assert n == 2
    assert "1\ta\t" in out and "2\tb\tx" in out  # nulls render empty


def test_prompt_template_sub_col_fills_per_record(spark):
    from instructions_mr_spark.operators.prompts import prompt_template_sub_col

    df = spark.createDataFrame([("en", "web")], "lang string, src string")
    got = df.select(
        prompt_template_sub_col(
            "L=__L__ S=__S__", {"__L__": F.col("lang"), "__S__": F.col("src")}
        ).alias("p")
    ).collect()[0].p
    assert got == "L=en S=web"


def test_observed_metrics_ride_the_job(spark):
    """observe() counters must report row count and per-column null
    counts from the SAME pass as the action — no second scan."""
    from instructions_mr_spark.sources.tables import observed_with

    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, None), (4, "d")], "id int, s string"
    )
    watched, obs = observed_with(df, null_check_cols=["s"])
    assert watched.filter(F.col("id") > 0).count() == 4
    got = obs.get
    assert got["n_rows"] == 4 and got["nulls_s"] == 2


def test_python_datasource_partitions_exact(spark):
    """Custom Python Data Source: N rows across P partitions, no
    dupes, no gaps, values matching the shared synth_row function."""
    from instructions_mr_spark.sources.pysource import register, synth_row

    register(spark)
    df = (
        spark.read.format("imr_synth")
        .option("n_rows", 103)  # deliberately not divisible by parts
        .option("n_parts", 4)
        .load()
    )
    assert df.rdd.getNumPartitions() == 4
    rows = {r.id: (r.digest, r.lang) for r in df.collect()}
    assert sorted(rows) == list(range(103))
    for i in (0, 7, 102):
        _, digest, lang = synth_row(i)
        assert rows[i] == (digest, lang)


def test_python_datasource_writer_manifest(spark, tmp_path):
    """Custom Python sink: per-task shard files + a commit-published
    manifest; manifest row count and shard contents must match the
    written DataFrame exactly."""
    import json
    import os

    from instructions_mr_spark.sources.pysource import register

    register(spark)
    out = str(tmp_path / "sinkout")
    df = spark.range(57).selectExpr("id", "md5(CAST(id AS STRING)) AS digest").repartition(3)
    df.write.format("imr_jsonl_sink").option("path", out).mode("append").save()

    manifest = json.load(open(os.path.join(out, "_MANIFEST.json")))
    assert manifest["rows"] == 57
    assert len(manifest["shards"]) == 3
    rows = {}
    for shard in manifest["shards"]:
        for line in open(shard, encoding="utf-8"):
            r = json.loads(line)
            rows[r["id"]] = r["digest"]
    import hashlib

    assert sorted(rows) == list(range(57))
    assert rows[7] == hashlib.md5(b"7").hexdigest()


def test_load_table_schema_catalog(spark, sf_dir):
    """Round 13: load_table resolves schemas from a session-level
    catalog (one inference per (app, sf_dir, table)) instead of
    re-running footer inference per call (~98 ms each, any table
    size).  The catalog must (a) hand out the exact inferred schema,
    (b) be hit on repeat calls, and (c) keep the events nanos->micros
    conversion intact."""
    import os

    from instructions_mr_spark.sources import tables

    tables._SCHEMA_CATALOG.clear()
    df = tables.load_table(spark, sf_dir, "nation")
    key = (spark.sparkContext.applicationId, sf_dir, "nation")
    assert key in tables._SCHEMA_CATALOG
    # identical schema to a bare inference read (no drift)
    bare = spark.read.parquet(os.path.join(sf_dir, "nation.parquet"))
    assert df.schema == bare.schema
    # identical rows too
    assert sorted(map(tuple, df.collect())) == sorted(map(tuple, bare.collect()))
    # repeat calls reuse the SAME schema object (no re-inference)
    path = os.path.join(sf_dir, "nation.parquet")
    s1 = tables._table_schema(spark, path, sf_dir, "nation")
    s2 = tables._table_schema(spark, path, sf_dir, "nation")
    assert s1 is s2
    # the events special case still lands a microsecond timestamp
    # (plain or NTZ depending on the fixture's parquet flavor — the
    # raw-nanos bigint must never leak through)
    ev = tables.load_table(spark, sf_dir, "events")
    assert dict(ev.dtypes)["ts"] in ("timestamp", "timestamp_ntz")
