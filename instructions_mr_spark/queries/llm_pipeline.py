"""LLM-pipeline operators (SURVEY.md §2.3-2.4 scaffolding + §2.7
dedup/sim_search mandate).

The LLM-bound operators run here in deterministic echo mode (the
client returns the user message — llm/client.py), so the *scaffolding*
(scope, prompt assembly, fan-out, regroup, assembly) is DuckDB-oracle
checkable end-to-end; the remote-LLM path reuses the identical plan
with a different client factory.

Dedup + similarity search use a cross-engine-portable hash:
``int(md5(x || seed)[:8], 16)`` — identical in Spark
(conv(substring(md5(..),1,8),16,10)) and DuckDB
(('0x' || substr(md5(..),1,8))::BIGINT), so even MinHash/LSH is
hash-checkable, not just rows-only.

Scale notes: exact dedup is one hash-aggregate; MinHash-LSH is
signature (narrow projection) -> band explode -> equi-join on band
key -> verify, the standard shuffle-bounded near-dup plan for ~100 TB
corpora (candidate pairs only, never all pairs).  Brute-force cosine
broadcasts the query vector; the IVF variant prunes by sign-bucket.
"""

from __future__ import annotations
from instructions_mr_spark.plans.guard import literal_df

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from instructions_mr_spark.config import Instruction, LlmConfig, Stage
from instructions_mr_spark.operators.llm_map import group_concat_reduce, instr_fanout_map
from instructions_mr_spark.queries._util import supersede_checkpoint, t
from instructions_mr_spark.registry import query

# ---------------------------------------------------------------- echo MR


_MAP_STAGE = Stage(
    [
        Instruction(
            name="summary",
            content="Summarize the document.",
            role="Analyst.",
            scope=["text"],
        ),
        Instruction(
            name="keywords",
            content="List keywords.",
            scope=["lang", "source"],
        ),
    ]
)

_REDUCE_STAGE = Stage(
    [
        Instruction(
            name="report",
            content="Merge the analyses.",
            input_desc="Summary and keywords.",
            output_desc="A merged report.",
            scope=["summary", "keywords"],
        )
    ],
    kind="reduce",
)


@query(
    "llm_echo_map",
    oracle="""
    SELECT doc_id,
           to_json(struct_pack(text := text))::VARCHAR AS summary,
           to_json(struct_pack(lang := lang, source := source))::VARCHAR AS keywords
    FROM documents
    """,
)
def llm_echo_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """instr_fanout_map (instructions_runners.py:107-130) in echo mode:
    each instruction's output = its assembled user message."""
    d = t(spark, sf_dir, "documents")
    return instr_fanout_map(d, _MAP_STAGE, LlmConfig(), keep_cols=["doc_id"])


@query(
    "llm_echo_map_arrow",
    oracle="""
    SELECT doc_id,
           to_json(struct_pack(text := text))::VARCHAR AS summary,
           to_json(struct_pack(lang := lang, source := source))::VARCHAR AS keywords
    FROM documents
    """,
)
def llm_echo_map_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """instr_fanout_map on the mapInArrow fast path (no pandas
    materialization in the worker) — identical output to llm_echo_map,
    same oracle."""
    from instructions_mr_spark.operators.llm_map import instr_fanout_map_arrow

    d = t(spark, sf_dir, "documents")
    return instr_fanout_map_arrow(d, _MAP_STAGE, LlmConfig(), keep_cols=["doc_id"])


@query(
    "llm_echo_mapreduce",
    oracle="""
    SELECT doc_id,
           '<summary>' || chr(10) || to_json(struct_pack(text := text))::VARCHAR
             || chr(10) || '</summary>' || chr(10) || chr(10) ||
           '<keywords>' || chr(10)
             || to_json(struct_pack(lang := lang, source := source))::VARCHAR
             || chr(10) || '</keywords>' || chr(10) || chr(10) AS report
    FROM documents
    """,
)
def llm_echo_mapreduce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full mr_chain (v0.py:26-56): map fan-out, then the reduce
    regroup: scope-select map outputs, tag-wrap, concat (the rewrite
    call echoes the wrapped prompt)."""
    d = t(spark, sf_dir, "documents")
    mapped = instr_fanout_map(d, _MAP_STAGE, LlmConfig(), keep_cols=["doc_id"])
    return group_concat_reduce(mapped, _REDUCE_STAGE, LlmConfig(), keep_cols=["doc_id"])


@query(
    "llm_echo_mapreduce_fused",
    oracle="""
    SELECT doc_id,
           '<summary>' || chr(10) || to_json(struct_pack(text := text))::VARCHAR
             || chr(10) || '</summary>' || chr(10) || chr(10) ||
           '<keywords>' || chr(10)
             || to_json(struct_pack(lang := lang, source := source))::VARCHAR
             || chr(10) || '</keywords>' || chr(10) || chr(10) AS report
    FROM documents
    """,
)
def llm_echo_mapreduce_fused(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stage-fused twin of llm_echo_mapreduce: one Arrow round trip
    instead of two, same oracle (operators/llm_map.py
    instr_fanout_mapreduce_fused)."""
    from instructions_mr_spark.operators.llm_map import instr_fanout_mapreduce_fused

    d = t(spark, sf_dir, "documents")
    return instr_fanout_mapreduce_fused(
        d, _MAP_STAGE, _REDUCE_STAGE, LlmConfig(), keep_cols=["doc_id"]
    )


# ---------------------------------------------------------------- dedup

# Portable 32-bit hash fragments (see module docstring).
def _spark_h32(expr: str, seed: int) -> str:
    return f"CAST(CONV(SUBSTRING(MD5(CAST({expr} || '#{seed}' AS BINARY)), 1, 8), 16, 10) AS BIGINT)"


def _duck_h32(expr: str, seed: int) -> str:
    return f"('0x' || substr(md5({expr} || '#{seed}'), 1, 8))::BIGINT"


@query(
    "dedup_exact",
    oracle="""
    SELECT md5(text) AS text_md5, MIN(doc_id) AS kept_doc_id, COUNT(*) AS n_copies
    FROM documents GROUP BY md5(text)
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-groupBy on content digest, keep the smallest
    id as representative.  One shuffle of (digest, id) pairs — never
    the document bodies."""
    return (
        t(spark, sf_dir, "documents")
        .select(F.expr("MD5(CAST(text AS BINARY))").alias("text_md5"), "doc_id")
        .groupBy("text_md5")
        .agg(F.min("doc_id").alias("kept_doc_id"), F.count("*").alias("n_copies"))
    )


_MINHASH_K = 12  # 2 bands × 6 rows: band collision prob = jaccard^6
_LSH_THRESHOLD = 0.5  # emit only verified near-dups


# DuckDB word-3-gram shingle set (docs with >= 3 words)
_DUCK_SHINGLES = (
    "list_distinct(list_transform(range(1, len(words) - 1), "
    "i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2]))"
)


# Universal-hash permutations over ONE base hash per shingle:
# mh_s = min over shingles of (A[s]*h32(w) + B[s]) mod P.  A[s]*h fits
# in int64 (A < 2^20, h < 2^32).  Same arithmetic on both engines.
_MH_P = 2147483647  # 2^31 - 1
_MH_A = [131, 137, 139, 149, 151, 157, 163, 167, 173, 179, 181, 191]
_MH_B = [s * 1299709 + 31 for s in range(_MINHASH_K)]


def _minhash_cols_duck() -> str:
    base = f"list_transform(shingles, w -> {_duck_h32('w', 0)})"
    return (
        f"{base} AS hs, "
        + ", ".join(
            f"list_min(list_transform(hs, h -> ({_MH_A[s]} * h + {_MH_B[s]}) % {_MH_P})) AS mh{s}"
            for s in range(_MINHASH_K)
        )
    )


_DUCK_SHINGLE_DOCS = f"""
      SELECT doc_id, {_DUCK_SHINGLES} AS shingles
      FROM (SELECT doc_id, string_split(text, ' ') AS words FROM documents)
      WHERE len(words) >= 3
"""


def _shingle_docs(docs: DataFrame) -> DataFrame:
    """Distinct word 3-gram shingles per doc (docs with >= 3 words).
    Shingles, not unigrams: the minhash/jaccard signal must be
    sequence-sensitive — on a small-vocabulary corpus every document
    shares most of its word SET with every other (this corpus has 31
    distinct words; unigram-set similarity marked 2.5M of 12.5M pairs
    as near-dups), while shingle sets only collide for genuinely
    repeated passages."""
    from instructions_mr_spark.functions import word_shingles

    return (
        docs.filter(F.size(F.split("text", " ")) >= 3)
        .select("doc_id", word_shingles(F.col("text"), 3).alias("shingles"))
    )


def _minhash_signatures(docs: DataFrame) -> DataFrame:
    """Single-pass signatures: ONE md5-derived base hash per shingle,
    then k universal-hash permutations (a*h+b mod p) — integer ops
    only, so digest cost is k-independent.  No shuffle: the whole
    signature is a projection (scan -> shingles -> hashes -> k mins),
    which is what survives a 100x scale-up.  (A dictionary-join
    variant de-duplicating shingle digests across docs was 1.5x
    SLOWER here: two extra shuffles outweigh 27x fewer md5s.)"""
    sh = _shingle_docs(docs)
    base = f"TRANSFORM(shingles, w -> {_spark_h32('w', 0)})"
    return sh.selectExpr(
        "doc_id",
        f"{base} AS hs",
    ).selectExpr(
        "doc_id",
        *[
            f"ARRAY_MIN(TRANSFORM(hs, h -> ({_MH_A[s]} * h + {_MH_B[s]}) % {_MH_P})) AS mh{s}"
            for s in range(_MINHASH_K)
        ],
    )


@query(
    "dedup_minhash_signature",
    oracle=f"""
    SELECT doc_id, {', '.join(f'mh{i}' for i in range(_MINHASH_K))}
    FROM (SELECT doc_id, {_minhash_cols_duck()} FROM ({_DUCK_SHINGLE_DOCS}))
    """,
)
def dedup_minhash_signature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash signatures (k={_MINHASH_K}) over words — the narrow
    projection that feeds LSH banding; hash-identical across engines
    via the portable md5-derived hash (dictionary-hashed Spark-side,
    naive per-occurrence on the oracle — same min)."""
    return _minhash_signatures(t(spark, sf_dir, "documents"))


# Shared by dedup_minhash_lsh and dedup_minhash_lsh_salted: salting is
# a pure execution-strategy change, so both must match the SAME oracle.
_LSH_ORACLE_SQL = f"""
    WITH sigs AS (
      SELECT doc_id, {_minhash_cols_duck()} FROM ({_DUCK_SHINGLE_DOCS})
    ),
    bands AS (
      SELECT doc_id, 0 AS band,
             mh0 || '_' || mh1 || '_' || mh2 || '_' || mh3 || '_' || mh4 || '_' || mh5 AS key
      FROM sigs
      UNION ALL
      SELECT doc_id, 1 AS band,
             mh6 || '_' || mh7 || '_' || mh8 || '_' || mh9 || '_' || mh10 || '_' || mh11 AS key
      FROM sigs
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b ON a.band = b.band AND a.key = b.key
      WHERE a.doc_id < b.doc_id
    )
    SELECT doc_a, doc_b, jaccard FROM (
      SELECT doc_a, doc_b,
             ROUND(CAST(len(list_intersect(wa.ws, wb.ws)) AS DOUBLE)
                   / len(list_distinct(wa.ws || wb.ws)), 6) AS jaccard
      FROM cand
      JOIN (SELECT doc_id, shingles AS ws FROM ({_DUCK_SHINGLE_DOCS})) wa
        ON cand.doc_a = wa.doc_id
      JOIN (SELECT doc_id, shingles AS ws FROM ({_DUCK_SHINGLE_DOCS})) wb
        ON cand.doc_b = wb.doc_id
    ) WHERE jaccard >= 0.5
    """


@query("dedup_minhash_lsh", oracle=_LSH_ORACLE_SQL)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash + LSH near-dup pairs (2 bands x 6 rows: band collision
    prob = jaccard^6): dictionary-hashed signatures -> band explode ->
    equi-join on band key -> verify with exact word-set Jaccard ->
    keep pairs >= 0.5.  Shingle-based (see _shingle_docs) so the
    signal is sequence-sensitive.

    This is the scale path: candidate generation is an equi-join on
    band keys (shuffle bounded by collisions), and only candidates
    pay the verify cost."""
    # The signature projection (md5 per shingle + k permutations) is
    # the dominant cost, and a self-join makes Catalyst DUPLICATE the
    # subplan per side (x2 bands x2 sides = 4 computes — measured).
    # So: parallelize the compute across cores (the testdata's single
    # row group otherwise pins it to ONE task) and materialize it ONCE
    # with localCheckpoint; the self-join then reads the materialized
    # rows.  At 100 TB this is "stage the signature table" (persist or
    # an intermediate table) — k ints + shingles per doc, tiny next to
    # the corpus — instead of recomputing the digest pass 4x.
    # Candidate generation is NARROW ((doc_id, band, key) rows only;
    # shingles join back by doc id in the verify) — the r6 SemDeDup
    # 4.2x lesson applied to the LSH family itself (r6 verdict's one
    # residual on this plan).
    sigs = _lsh_sigs(spark, sf_dir)
    return _verify_lsh_pairs(
        _lsh_candidate_pairs(_band_rows(sigs, with_shingles=False)), sigs
    )


def _lsh_sigs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Staged signature table: (doc_id, shingles, mh0..mh{k-1}),
    materialized ONCE (localCheckpoint) so self-joins don't duplicate
    the digest pass — at 100 TB this is "persist the signature
    table"."""
    docs = (
        t(spark, sf_dir, "documents")
        .repartition(spark.sparkContext.defaultParallelism)
    )
    sh = _shingle_docs(docs)
    base = f"TRANSFORM(shingles, w -> {_spark_h32('w', 0)})"
    sigs = sh.selectExpr("doc_id", "shingles", f"{base} AS hs").selectExpr(
        "doc_id",
        "shingles",
        *[
            f"ARRAY_MIN(TRANSFORM(hs, h -> ({_MH_A[s]} * h + {_MH_B[s]}) % {_MH_P})) AS mh{s}"
            for s in range(_MINHASH_K)
        ],
    )
    return supersede_checkpoint("lsh_sigs", sigs)


def _band_rows(sigs: DataFrame, with_shingles: bool) -> DataFrame:
    """Band explode over a staged signature table.  ``with_shingles``
    lets the verify stage skip a join back; pass False whenever the
    band rows feed a pair-generating join (never ship arrays through
    a candidate exchange — the SemDeDup 4.2× lesson)."""
    extra = ["shingles"] if with_shingles else []
    r = _MINHASH_K // 2
    bands = None
    for band in range(2):
        cols = [f"mh{r * band + j}" for j in range(r)]
        b = sigs.select(
            "doc_id",
            *extra,
            F.lit(band).alias("band"),
            F.concat_ws("_", *cols).alias("key"),
        )
        bands = b if bands is None else bands.unionByName(b)
    return bands


def _lsh_candidate_pairs(bands: DataFrame) -> DataFrame:
    """Plain band-key self-join over NARROW (doc_id, band, key) rows:
    one band-key exchange (reused for both sides) — the m² work of a
    bucket lands in ONE task, and the exchange carries no arrays."""
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(b, (F.col("a.band") == F.col("b.band")) & (F.col("a.key") == F.col("b.key")))
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
    )


@query(
    "split_leakage_audit",
    oracle=f"""
    WITH sigs AS (
      SELECT doc_id, {_minhash_cols_duck()} FROM ({_DUCK_SHINGLE_DOCS})
    ),
    bands AS (
      SELECT doc_id, 0 AS band,
             mh0 || '_' || mh1 || '_' || mh2 || '_' || mh3 || '_' || mh4 || '_' || mh5 AS key
      FROM sigs
      UNION ALL
      SELECT doc_id, 1 AS band,
             mh6 || '_' || mh7 || '_' || mh8 || '_' || mh9 || '_' || mh10 || '_' || mh11 AS key
      FROM sigs
    ),
    sides AS (
      SELECT doc_id, {_duck_h32('doc_id', 13)} % 100 AS b FROM documents
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS test_doc, t.doc_id AS train_doc
      FROM bands a
      JOIN sides sa ON a.doc_id = sa.doc_id AND sa.b >= 90
      JOIN bands t ON a.band = t.band AND a.key = t.key
      JOIN sides st ON t.doc_id = st.doc_id AND st.b < 80
    ),
    leaked AS (
      SELECT DISTINCT cand.test_doc
      FROM cand
      JOIN ({_DUCK_SHINGLE_DOCS}) wa ON cand.test_doc = wa.doc_id
      JOIN ({_DUCK_SHINGLE_DOCS}) wb ON cand.train_doc = wb.doc_id
      WHERE 2 * len(list_intersect(wa.shingles, wb.shingles))
            >= len(list_distinct(wa.shingles || wb.shingles))
    ),
    test_docs AS (
      SELECT d.doc_id, d.source FROM documents d
      JOIN sides s ON d.doc_id = s.doc_id WHERE s.b >= 90
    )
    SELECT t.source,
           CAST(COUNT(*) AS BIGINT) AS n_test,
           CAST(COUNT(l.test_doc) AS BIGINT) AS n_leaked,
           CAST(COUNT(l.test_doc) AS DOUBLE) / COUNT(*) AS leak_rate
    FROM test_docs t LEFT JOIN leaked l ON t.doc_id = l.test_doc
    GROUP BY t.source
    """,
)
def split_leakage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/test split LEAKAGE audit — the eval-integrity check every
    training pipeline needs and external-benchmark decontamination
    (contamination_check/_minhash) doesn't cover: a near-duplicate of
    a TEST document sitting in the TRAIN split silently inflates eval
    scores.  Splits are the same deterministic hash rule as
    split_train_test (h32(doc_id) % 100: train < 80, test >= 90);
    near-dup detection is the same MinHash band machinery as
    dedup_minhash_lsh (band equi-join between the test and train
    sides only, exact shingle-Jaccard verify at the same threshold —
    compared integer-exactly as 2·|∩| >= |∪|, no float round).
    Output: per-source test-doc count, leaked count, leak rate
    (emitted UNROUNDED — one IEEE division of two exact BIGINTs is
    bit-identical cross-engine; ROUND(double) ties are not).

    Scale shape: one staged signature pass (shared with the LSH
    entries via the lsh_sigs checkpoint); the cross-split candidate
    join is band-keyed and NARROW — (doc_id, band, key) rows only,
    never shingle arrays (the SemDeDup 4.2× lesson: a
    boilerplate-heavy bucket fans every pair out per matching band,
    so arrays on that exchange multiply) — then (test_doc, train_doc)
    pairs are deduped and shingles join back BY DOC ID (one array per
    doc on a doc_id exchange, not per candidate pair).  Only
    candidates pay the verify.  At 100 TB this runs as a nightly gate
    before an eval freeze."""
    sigs = _lsh_sigs(spark, sf_dir)
    cand = _split_leakage_candidates(sigs)
    sh = sigs.select("doc_id", "shingles")
    leaked = (
        cand.join(
            sh.select(
                F.col("doc_id").alias("test_doc"), F.col("shingles").alias("ws_a")
            ),
            "test_doc",
        )
        .join(
            sh.select(
                F.col("doc_id").alias("train_doc"), F.col("shingles").alias("ws_b")
            ),
            "train_doc",
        )
        .filter(
            2 * F.size(F.array_intersect("ws_a", "ws_b"))
            >= F.size(F.array_union("ws_a", "ws_b"))
        )
        .select("test_doc")
        .distinct()
        .withColumn("leaked", F.lit(True))
    )
    docs = t(spark, sf_dir, "documents").selectExpr(
        "doc_id", "source", f"{_spark_h32('doc_id', 13)} % 100 AS b"
    )
    test_docs = docs.filter(F.col("b") >= 90)
    return (
        test_docs.join(
            leaked, test_docs.doc_id == leaked.test_doc, "left"
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_test"),
            F.count("leaked").alias("n_leaked"),
            (F.count("leaked").cast("double") / F.count(F.lit(1))).alias(
                "leak_rate"
            ),
        )
    )


def _split_leakage_candidates(sigs: DataFrame) -> DataFrame:
    """Narrow candidate generation for split_leakage_audit: distinct
    (test_doc, train_doc) pairs from a band equi-join over
    (doc_id, band, key) rows — NO array columns anywhere in this
    subtree (tests/test_plans.py asserts the band exchange carries
    none)."""
    bands = _band_rows(sigs, with_shingles=False)
    b_expr = F.expr(f"{_spark_h32('doc_id', 13)} % 100")
    test_b = bands.withColumn("b", b_expr).filter(F.col("b") >= 90).alias("a")
    train_b = bands.withColumn("b", b_expr).filter(F.col("b") < 80).alias("t")
    return (
        test_b.join(
            train_b,
            (F.col("a.band") == F.col("t.band"))
            & (F.col("a.key") == F.col("t.key")),
        )
        .select(
            F.col("a.doc_id").alias("test_doc"),
            F.col("t.doc_id").alias("train_doc"),
        )
        .distinct()
    )


def _verify_lsh_pairs(pairs: DataFrame, sigs: DataFrame) -> DataFrame:
    """Pair dedup (a pair can collide in both bands) as NARROW id
    pairs, then shingles join back BY DOC ID (one array per doc on a
    doc_id exchange, never per candidate×band) for the exact word-set
    Jaccard verify + threshold filter — only candidates pay this."""
    sh = sigs.select("doc_id", "shingles")
    return (
        pairs.distinct()
        .join(
            sh.select(F.col("doc_id").alias("doc_a"), F.col("shingles").alias("ws_a")),
            "doc_a",
        )
        .join(
            sh.select(F.col("doc_id").alias("doc_b"), F.col("shingles").alias("ws_b")),
            "doc_b",
        )
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.size(F.array_intersect("ws_a", "ws_b")).cast("double")
                / F.size(F.array_union("ws_a", "ws_b")),
                6,
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= _LSH_THRESHOLD)
    )


_LSH_HOT_MIN = 32  # bucket size above which the salted path kicks in
_LSH_SALT = 4  # sub-buckets per hot bucket
# Hard cap on how many hot (band, key) buckets get the salted
# treatment: the hot-key list is BROADCAST, and without a cap its
# cardinality is corpus-dependent (one row per over-threshold bucket —
# a boilerplate-heavy crawl could produce millions; r9 verdict item
# #2).  Capping at the top-N largest buckets bounds the broadcast by
# construction (GlobalLimit — guard-certifiable) and keeps the salting
# where it matters: the WORST buckets.  Buckets beyond the cap simply
# stay on the cold (unsalted) path — output pairs are identical either
# way; residual skew past 4096 hot buckets is AQE skew-join territory.
_LSH_HOT_CAP = 4096


def _lsh_candidate_pairs_salted(
    bands: DataFrame, hot_min: int = _LSH_HOT_MIN, n_salt: int = _LSH_SALT
) -> DataFrame:
    """Skew-aware candidate generation: identical OUTPUT to
    :func:`_lsh_candidate_pairs`, but a bucket larger than ``hot_min``
    is split into ``n_salt`` salted sub-buckets and self-joined with
    the triangle replication scheme, so its m² pair work spreads over
    n_salt*(n_salt+1)/2 tasks instead of one.

    Triangle scheme: each hot-bucket doc gets salt r = h32(doc_id) %
    n_salt and is replicated to every reducer (band, key, u, v) with
    u = min(r, p), v = max(r, p) for p in 0..n_salt-1 — exactly the
    reducers whose salt pair includes r.  Reducer (u, v) then forms
    only pairs whose two salts are {u, v}, so every cross-salt pair
    materializes exactly once and no pair is lost — the correctness
    argument the oracle (identical to the unsalted one) checks."""
    # Hot-key detection on the (band, key) projection, then a broadcast
    # join back: hot keys are by definition few, so the flag costs no
    # wide shuffle.  (A window count over (band, key) would add a second
    # full exchange — measured 2x the whole query when rows still
    # carried shingles.)
    hot_keys = (
        bands.select("band", "key")
        .groupBy("band", "key")
        .agg(F.count(F.lit(1)).alias("bucket_n"))
        .filter(F.col("bucket_n") > hot_min)
        .orderBy(F.col("bucket_n").desc(), "band", "key")
        .limit(_LSH_HOT_CAP)
        .select("band", "key", F.lit(True).alias("is_hot"))
    )
    # Materialized once: the flagged table feeds five subplans (cold
    # self-join x2 sides, hot replicate x2 sides, pair union) — staged
    # like the signature table in _lsh_sigs (measured: 1.69s vs
    # 1.99s without at sf0.1).  The residual ~0.75s over the unsalted
    # path is the hot-key aggregation pass — the guard's price; run
    # this variant when lsh_bucket_stats reports hot buckets.
    flagged = supersede_checkpoint(
        "lsh_salted_flagged",
        bands.join(F.broadcast(hot_keys), ["band", "key"], "left"),
    )
    cold = flagged.filter(F.col("is_hot").isNull()).drop("is_hot", "bucket_n")
    cold_pairs = _lsh_candidate_pairs(cold)

    hot = (
        flagged.filter(F.col("is_hot"))
        .drop("is_hot", "bucket_n")
        .withColumn("salt", F.expr(_spark_h32("CAST(doc_id AS STRING)", 7)) % n_salt)
    )
    repl = hot.select(
        "doc_id",
        "band",
        "key",
        "salt",
        F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1))).alias("p"),
    ).select(
        "doc_id",
        "band",
        "key",
        "salt",
        F.least("salt", "p").alias("u"),
        F.greatest("salt", "p").alias("v"),
    ).distinct()  # p == salt duplicates the (r, r) reducer row
    a = repl.alias("a")
    b = repl.alias("b")
    hot_pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.u") == F.col("b.u"))
            & (F.col("a.v") == F.col("b.v")),
        )
        # form a pair only in the one reducer matching its salt pair
        .filter(
            (F.col("a.doc_id") < F.col("b.doc_id"))
            & (
                (F.col("a.salt") == F.col("a.u")) & (F.col("b.salt") == F.col("a.v"))
                | (F.col("a.salt") == F.col("a.v")) & (F.col("b.salt") == F.col("a.u"))
            )
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
    )
    return cold_pairs.unionByName(hot_pairs)


@query("dedup_minhash_lsh_salted", oracle=_LSH_ORACLE_SQL)
def dedup_minhash_lsh_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-bucket-salted LSH near-dup pairs: same result contract as
    dedup_minhash_lsh (the oracle is byte-identical), but buckets
    bigger than _LSH_HOT_MIN fan their pair work out across
    _LSH_SALT*(_LSH_SALT+1)/2 tasks — the 100 TB guard against a
    boilerplate-heavy corpus where one band key collects millions of
    near-identical docs (the skew lsh_bucket_stats exists to
    detect).  Candidate generation is narrow ((doc_id, band, key) +
    salt columns only; shingles join back by doc id in the verify)."""
    sigs = _lsh_sigs(spark, sf_dir)
    return _verify_lsh_pairs(
        _lsh_candidate_pairs_salted(_band_rows(sigs, with_shingles=False)), sigs
    )


@query(
    "dedup_ngram_jaccard",
    oracle="""
    WITH sh AS (
      SELECT doc_id,
             list_distinct(list_transform(range(1, len(words) - 1),
               i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2])) AS shingles
      FROM (SELECT doc_id, string_split(text, ' ') AS words FROM documents)
      WHERE len(words) >= 3
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           ROUND(CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
                 / len(list_distinct(a.shingles || b.shingles)), 6) AS jaccard
    FROM sh a JOIN sh b ON b.doc_id = a.doc_id + 1
    """,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word 3-gram shingle Jaccard between adjacent doc ids — the
    verify kernel of near-dup detection, isolated and oracle-checked.
    (Adjacent-pair blocking keeps the check linear; production
    candidate generation is the LSH query above.)"""
    words = (
        t(spark, sf_dir, "documents")
        .select("doc_id", F.split("text", " ").alias("words"))
        .filter(F.size("words") >= 3)
    )
    sh = words.select(
        "doc_id",
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.size("words") - 2),
                lambda i: F.concat_ws(
                    " ",
                    F.element_at("words", i),
                    F.element_at("words", i + 1),
                    F.element_at("words", i + 2),
                ),
            )
        ).alias("shingles"),
    )
    a = sh.alias("a")
    b = sh.alias("b")
    return a.join(b, F.col("b.doc_id") == F.col("a.doc_id") + 1).select(
        F.col("a.doc_id").alias("doc_a"),
        F.col("b.doc_id").alias("doc_b"),
        F.round(
            F.size(F.array_intersect("a.shingles", "b.shingles")).cast("double")
            / F.size(F.array_union("a.shingles", "b.shingles")),
            6,
        ).alias("jaccard"),
    )


@query(
    "dedup_containment",
    oracle="""
    WITH sh AS (
      SELECT doc_id,
             list_distinct(list_transform(range(1, len(words) - 1),
               i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2])) AS shingles
      FROM (SELECT doc_id, string_split(text, ' ') AS words FROM documents)
      WHERE len(words) >= 3
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           ROUND(CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
                 / len(a.shingles), 6) AS containment_a_in_b
    FROM sh a JOIN sh b ON b.doc_id = a.doc_id + 1
    """,
)
def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shingle CONTAINMENT C(A,B) = |A n B| / |A| between adjacent doc
    ids — the asymmetric twin of Jaccard that catches sub-document
    duplication (a short doc wholly embedded in a long one scores ~1.0
    here but low Jaccard, the case a dedup pass must not miss).  Same
    blocking and in-row shingle algebra as dedup_ngram_jaccard."""
    words = (
        t(spark, sf_dir, "documents")
        .select("doc_id", F.split("text", " ").alias("words"))
        .filter(F.size("words") >= 3)
    )
    sh = words.select(
        "doc_id",
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.size("words") - 2),
                lambda i: F.concat_ws(
                    " ",
                    F.element_at("words", i),
                    F.element_at("words", i + 1),
                    F.element_at("words", i + 2),
                ),
            )
        ).alias("shingles"),
    )
    a = sh.alias("a")
    b = sh.alias("b")
    return a.join(b, F.col("b.doc_id") == F.col("a.doc_id") + 1).select(
        F.col("a.doc_id").alias("doc_a"),
        F.col("b.doc_id").alias("doc_b"),
        F.round(
            F.size(F.array_intersect("a.shingles", "b.shingles")).cast("double")
            / F.size("a.shingles"),
            6,
        ).alias("containment_a_in_b"),
    )


_SIMHASH_BITS = 16


@query(
    "dedup_simhash",
    oracle=f"""
    SELECT doc_id,
           {' + '.join(f"(CASE WHEN (list_sum(list_transform(words, w -> CASE WHEN (({_duck_h32('w', 99)} >> {b}) & 1) = 1 THEN 1 ELSE -1 END))) > 0 THEN {1 << b} ELSE 0 END)" for b in range(_SIMHASH_BITS))}
             AS simhash
    FROM (SELECT doc_id, string_split(text, ' ') AS words FROM documents)
    """,
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """{_SIMHASH_BITS}-bit SimHash over word hashes: bit b of the
    fingerprint is the sign of sum over words of ±1 by word-hash bit b.
    Near-dups differ in few bits (hamming distance)."""
    words = t(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("words")
    )
    bit_terms = " + ".join(
        f"(CASE WHEN AGGREGATE(words, 0, (acc, w) -> acc + "
        f"CASE WHEN (SHIFTRIGHT({_spark_h32('w', 99)}, {b}) & 1) = 1 THEN 1 ELSE -1 END) > 0 "
        f"THEN {1 << b} ELSE 0 END)"
        for b in range(_SIMHASH_BITS)
    )
    return words.selectExpr("doc_id", f"{bit_terms} AS simhash")


# ---------------------------------------------------------------- sim search

_DOT = """
    ROUND(
      list_reduce(list_transform(range(1, len(q.embedding) + 1),
                  i -> CAST(q.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)),
                  (a, b) -> a + b)
      / (sqrt(list_reduce(list_transform(q.embedding, x -> CAST(x AS DOUBLE) * x), (a,b) -> a+b))
         * sqrt(list_reduce(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * x), (a,b) -> a+b))),
    6)
"""


def _cosine_col(a, b):
    dot = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    s = F.aggregate(dot, F.lit(0.0), lambda acc, x: acc + x)
    return F.round(s / (_norm_col(a) * _norm_col(b)), 6)


def _norm_col(a):
    """L2 norm of an embedding array — the exact subexpression
    _cosine_col uses, exposed so pair joins can hoist it to the
    per-VECTOR projection (round 12): higher-order functions are
    CodegenFallback (interpreted per element), so recomputing two
    64-element norms per candidate PAIR cost ~2.6 s of the SemDeDup
    join-back at sf0.1 (178k pairs) where the same norms are one HOF
    pass over 2k vectors.  Hoisting is bit-identical: the aggregate
    runs over the same array in the same order, so the double (and
    the final round(dot/(na*nb), 6)) is unchanged."""
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )


def _cosine_prenorm(ea, eb, na, nb):
    """Pair cosine with per-vector norms hoisted (see _norm_col):
    identical arithmetic to _cosine_col, ~3x less interpreted HOF
    work per pair."""
    dot = F.zip_with(ea, eb, lambda x, y: x.cast("double") * y.cast("double"))
    s = F.aggregate(dot, F.lit(0.0), lambda acc, x: acc + x)
    return F.round(s / (na * nb), 6)


def _pair_cosine_joinback(id_pairs, e, cos_name: str = "cos",
                          threshold: float | None = None):
    """(vec_a, vec_b) id-pairs + the embeddings table -> scored pairs
    (vec_a, vec_b, <cos_name>): join the vectors back by id (narrow
    candidate ids dedupe BEFORE the arrays attach — guide §2.3) and
    pay one hoisted-norm interpreted dot per pair (_cosine_prenorm —
    bit-identical e6 cosine, see _norm_col).

    Round-13 negatives, measured and recorded so they are not
    retried (this helper deduplicates the r12 shape shared by the
    SemDeDup kernel and the LSH verify — the shape itself is the
    optimum found):

    * Arrow kernel (mapInPandas AND flat-buffer mapInArrow, the
      winnowing recipe): NO better than the interpreted JVM fold —
      13.2-15.3 s vs 12.4-14.3 s on a 2M-pair synthetic — because
      shipping two 256-byte float arrays per pair through the
      row->Arrow boundary costs as much as the fold it replaces
      (winnowing won because one cheap text row crosses per
      O(cap*w) kernel call; here the per-row compute is 64
      multiply-adds).  In the bench queries the Python path read
      WORSE outright (semdedup_cells 3.8 -> 8.0 s min-of-3).
    * Pair-fold parallelism floor (repartition(cores, vec_a, vec_b)
      of the id-pairs before the join-back): a no-op by
      construction — the candidate dedup already hash-partitions on
      exactly these keys, so the optimizer removes the redundant
      repartition, and AQE's parallelismFirst coalescing keeps the
      post-shuffle stage at defaultParallelism anyway (interleaved
      A/B at sf0.1: 3.682 vs 3.702 s cells, 1.967 vs 1.927 s LSH —
      wash).  The 2M-pair synthetic that motivated it had NO
      upstream exchange (a bare cross join), a shape no registered
      query has."""
    ea = e.select(
        F.col("vec_id").alias("vec_a"),
        F.col("embedding").alias("ea"),
        _norm_col(F.col("embedding")).alias("na"),
    )
    eb = e.select(
        F.col("vec_id").alias("vec_b"),
        F.col("embedding").alias("eb"),
        _norm_col(F.col("embedding")).alias("nb"),
    )
    scored = (
        id_pairs.join(ea, "vec_a")
        .join(eb, "vec_b")
        .select(
            "vec_a",
            "vec_b",
            _cosine_prenorm(
                F.col("ea"), F.col("eb"), F.col("na"), F.col("nb")
            ).alias(cos_name),
        )
    )
    if threshold is not None:
        scored = scored.filter(F.col(cos_name) >= threshold)
    return scored


@query(
    "sim_search_topk",
    oracle=f"""
    SELECT e.vec_id, {_DOT} AS cosine
    FROM embeddings e, (SELECT embedding FROM embeddings WHERE vec_id = 0) q
    WHERE e.vec_id <> 0
    ORDER BY cosine DESC, e.vec_id LIMIT 10
    """,
)
def sim_search_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k against the vec_id=0 query vector: the
    query vector broadcasts (1-row crossJoin), the dot product runs
    JVM-side via zip_with/aggregate, and top-k is TakeOrderedAndProject
    — no full sort, no Python.  This is the exact baseline an ANN
    variant must match on recall."""
    e = t(spark, sf_dir, "embeddings")
    qv = e.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("q"))
    return (
        e.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(qv))
        .select("vec_id", _cosine_col(F.col("q"), F.col("embedding")).alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col("vec_id"))
        .limit(10)
    )


@query(
    "sim_search_ivf",
    oracle=f"""
    WITH b AS (
      SELECT vec_id, embedding,
             list_aggregate(list_transform(range(1, 5),
               i -> CASE WHEN embedding[i] > 0 THEN (1 << (i-1)) ELSE 0 END), 'sum') AS bucket
      FROM embeddings
    ),
    qb AS (SELECT embedding, bucket FROM b WHERE vec_id = 0)
    SELECT e.vec_id, {_DOT} AS cosine
    FROM b e, qb q
    WHERE e.bucket = q.bucket AND e.vec_id <> 0
    ORDER BY cosine DESC, e.vec_id LIMIT 5
    """,
)
def sim_search_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-bucket (LSH-style) pruned search: 4 sign bits of the first
    dims partition vectors into 16 buckets; only the query's bucket is
    scanned.  The scale path — candidate set shrinks ~16× per probe;
    partition the lake by bucket to turn this into partition pruning."""
    e = t(spark, sf_dir, "embeddings")
    bucket = F.aggregate(
        F.zip_with(
            F.slice("embedding", 1, 4),
            F.array([F.lit(1), F.lit(2), F.lit(4), F.lit(8)]),
            lambda x, p: F.when(x > 0, p).otherwise(F.lit(0)),
        ),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    b = e.withColumn("bucket", bucket)
    qv = b.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("q"), F.col("bucket").alias("qbucket")
    )
    return (
        b.filter(F.col("vec_id") != 0)
        .join(F.broadcast(qv), F.col("bucket") == F.col("qbucket"))
        .select("vec_id", _cosine_col(F.col("q"), F.col("embedding")).alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col("vec_id"))
        .limit(5)
    )


# ANN evaluation dials: 16 fixed probe queries (constant regardless of
# corpus size -> the eval stays LINEAR in n), recall measured at k=10
# against the exact scan, candidates from the sign-bucket IVF above.
_ANN_EVAL_Q = 16
_ANN_EVAL_K = 10

# Cosine between q.qemb and e.embedding (the _DOT fragment generalized
# to the eval CTE's aliases).
_EVAL_DOT = """
    ROUND(
      list_reduce(list_transform(range(1, len(q.qemb) + 1),
                  i -> CAST(q.qemb[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)),
                  (a, b) -> a + b)
      / (sqrt(list_reduce(list_transform(q.qemb, x -> CAST(x AS DOUBLE) * x), (a,b) -> a+b))
         * sqrt(list_reduce(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * x), (a,b) -> a+b))),
    6)
"""


def _ann_recall_oracle(cand_cond: str) -> str:
    """Oracle template for the ANN recall evals: ``cand_cond`` is the
    SQL predicate (over e.bucket / q.qbucket) defining the index's
    candidate set."""
    return f"""
    WITH b AS (
      SELECT vec_id, embedding,
             list_aggregate(list_transform(range(1, 5),
               i -> CASE WHEN embedding[i] > 0 THEN (1 << (i-1)) ELSE 0 END), 'sum') AS bucket
      FROM embeddings
    ),
    q AS (
      SELECT vec_id AS qid, embedding AS qemb, bucket AS qbucket
      FROM b WHERE vec_id < {_ANN_EVAL_Q}
    ),
    scored AS (
      SELECT q.qid, e.vec_id, {cand_cond} AS is_cand,
             {_EVAL_DOT} AS cosine
      FROM b e, q
      WHERE e.vec_id <> q.qid
    ),
    exact AS (
      SELECT qid, vec_id,
             ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cosine DESC, vec_id) AS r
      FROM scored
    ),
    ivf AS (
      SELECT qid, vec_id,
             ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cosine DESC, vec_id) AS r
      FROM scored WHERE is_cand
    ),
    cands AS (
      SELECT qid, COUNT(*) AS n_candidates FROM scored WHERE is_cand GROUP BY qid
    ),
    hits AS (
      SELECT x.qid, COUNT(*) AS n_hits
      FROM (SELECT qid, vec_id FROM exact WHERE r <= {_ANN_EVAL_K}) x
      JOIN (SELECT qid, vec_id FROM ivf WHERE r <= {_ANN_EVAL_K}) y
        ON x.qid = y.qid AND x.vec_id = y.vec_id
      GROUP BY x.qid
    )
    SELECT q.qid,
           CAST(COALESCE(c.n_candidates, 0) AS BIGINT) AS n_candidates,
           CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,
           CAST({_ANN_EVAL_K} AS BIGINT) AS k
    FROM q
    LEFT JOIN cands c ON c.qid = q.qid
    LEFT JOIN hits h ON h.qid = q.qid
    ORDER BY q.qid
    """


def _ann_recall_eval(spark: SparkSession, sf_dir: str, cand_expr: str, key: str) -> DataFrame:
    """Shared ANN recall harness: score the fixed probe set against
    the corpus once, rank exact and index-candidate top-k, count
    overlaps.  ``cand_expr`` is the Spark SQL predicate (over bucket /
    qbucket) defining the index's candidate set; ``key`` labels the
    staged scored table."""
    from pyspark.sql import Window

    e = t(spark, sf_dir, "embeddings")
    bucket = F.aggregate(
        F.zip_with(
            F.slice("embedding", 1, 4),
            F.array([F.lit(1), F.lit(2), F.lit(4), F.lit(8)]),
            lambda x, p: F.when(x > 0, p).otherwise(F.lit(0)),
        ),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    b = e.withColumn("bucket", bucket)
    qs = b.filter(F.col("vec_id") < _ANN_EVAL_Q).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("qemb"),
        F.col("bucket").alias("qbucket"),
    )
    scored = supersede_checkpoint(
        key,
        b.crossJoin(F.broadcast(qs))
        .filter(F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            "vec_id",
            F.expr(cand_expr).alias("is_cand"),
            _cosine_col(F.col("qemb"), F.col("embedding")).alias("cosine"),
        )
        ,
    )
    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    exact10 = (
        scored.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= _ANN_EVAL_K)
        .select("qid", "vec_id")
    )
    ivf10 = (
        scored.filter("is_cand")
        .withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= _ANN_EVAL_K)
        .select("qid", "vec_id")
    )
    cands = (
        scored.filter("is_cand")
        .groupBy("qid")
        .agg(F.count(F.lit(1)).alias("n_candidates"))
    )
    hits = (
        exact10.join(ivf10, ["qid", "vec_id"])
        .groupBy("qid")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    return (
        qs.select("qid")
        .join(cands, "qid", "left")
        .join(hits, "qid", "left")
        .select(
            "qid",
            F.coalesce("n_candidates", F.lit(0)).cast("long").alias("n_candidates"),
            F.coalesce("n_hits", F.lit(0)).cast("long").alias("n_hits"),
            F.lit(_ANN_EVAL_K).cast("long").alias("k"),
        )
        .orderBy("qid")
    )


@query(
    "ann_recall_at_k",
    oracle=_ann_recall_oracle("e.bucket = q.qbucket"),
)
def ann_recall_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN quality gate: recall@10 of the sign-bucket IVF
    (sim_search_ivf's geometry) against the exact cosine scan, per
    probe query — the evaluation harness every production ANN deploy
    runs before trusting the index.  Emits all-integer rows
    (qid, n_candidates, n_hits, k) so recall = n_hits/k is computed by
    the reader, never a ROUND(double) final (cross-engine tie-safety
    convention).

    Scale shape: the probe set is FIXED (16 queries) so the scored
    table is 16n narrow rows — (qid, vec_id, bool, double), embeddings
    projected away before any exchange; probes broadcast.  Scored is
    staged once (three consumers: exact ranking, IVF ranking,
    candidate counts).  Per-query top-k is a window over 16 qid
    partitions — at a 10k-probe eval, swap to per-probe
    TakeOrderedAndProject or a bounded top-k aggregate; the candidate
    side prunes ~16x exactly as sim_search_ivf documents."""
    return _ann_recall_eval(spark, sf_dir, "bucket = qbucket", "ann_eval_scored")


@query(
    "ann_recall_multiprobe",
    oracle=_ann_recall_oracle(
        "bit_count(xor(e.bucket, q.qbucket)) <= 1"
    ),
)
def ann_recall_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiprobe twin of ann_recall_at_k (Lv et al. 2007): candidates
    come from the query's sign-bucket PLUS every bucket at hamming
    distance 1 (each of the 4 sign bits flipped) — the standard
    recall/cost dial for LSH indexes: ~5x the probes of the
    single-bucket scan, recovering neighbors that fall just across a
    hyperplane.  Rows are directly comparable to ann_recall_at_k's
    (same probes, same k), so the two queries together ARE the
    recall-uplift report.

    Scale shape: identical to ann_recall_at_k (the candidate
    predicate is one popcount on the packed bucket ints); in a
    partitioned-by-bucket lake layout multiprobe reads 5 partitions
    instead of 1 — still pruning 11 of 16."""
    return _ann_recall_eval(
        spark, sf_dir, "bit_count(bucket ^ qbucket) <= 1", "ann_eval_scored_mp"
    )


@query(
    "embedding_pair_cosine",
    oracle=f"""
    SELECT e.vec_id AS vec_a, q.vec_id AS vec_b, {_DOT} AS cosine
    FROM embeddings e JOIN embeddings q ON q.vec_id = e.vec_id + 1
    """,
)
def embedding_pair_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup verify kernel on adjacent-id pairs
    (blocking keeps it linear; LSH/IVF generates candidates at scale)."""
    e = t(spark, sf_dir, "embeddings")
    a = e.alias("a")
    b = e.alias("b")
    return a.join(b, F.col("b.vec_id") == F.col("a.vec_id") + 1).select(
        F.col("a.vec_id").alias("vec_a"),
        F.col("b.vec_id").alias("vec_b"),
        _cosine_col(F.col("a.embedding"), F.col("b.embedding")).alias("cosine"),
    )


_PAIR_DOT = """
    ROUND(
      list_reduce(list_transform(range(1, len(ea.embedding) + 1),
                  i -> CAST(ea.embedding[i] AS DOUBLE) * CAST(eb.embedding[i] AS DOUBLE)),
                  (a, b) -> a + b)
      / (sqrt(list_reduce(list_transform(ea.embedding, x -> CAST(x AS DOUBLE) * x), (a,b) -> a+b))
         * sqrt(list_reduce(list_transform(eb.embedding, x -> CAST(x AS DOUBLE) * x), (a,b) -> a+b))),
    6)
"""


# Sign-LSH blocking geometry: _EMB_BANDS bands of bits(n) sign bits
# each.  The BASE 8 bits of band b read the disjoint dim slice
# [b*8, (b+1)*8) (all 64 dims covered, 256 buckets/band: expected
# candidate volume sum(m^2) ~ n^2/256 per band — vs n^2/16 for the
# old 4x4, measured 5x faster at sf0.1 — while high-cosine recall
# stays put: P[band match] = p^bits with p = 1 - angle/pi; cosine
# 0.9 -> ~93% over 8 bands at 8 bits).
#
# WIDTH SCALES WITH THE CORPUS (r8 verdict item #3): with the bucket
# count fixed, occupancy grows with n and candidates grow ~n^2/2^bits
# (measured 3.6x per 2x data at sf1->sf2 under fixed 8x8).  bits(n) =
# 8 + max(0, floor(log2(n / _EMB_N0))), capped at 16, holds per-bucket
# occupancy ~constant, so candidate volume grows ~LINEARLY in n.  Bits
# beyond the 8-dim slice read hashed extra dims (b*8 + j*17) mod 64 —
# 17 is invertible mod 64, so a band's dims are always distinct, and
# the offsets never collide with its base slice.  Both engines derive
# n from the same COUNT of the embeddings table (the Spark side's one
# plan-time action — a table-statistics lookup, exactly what a cost-
# based planner does), so Spark and the DuckDB oracle always pick the
# same width.  At every test SF (n <= 20k binds only above _EMB_N0*2)
# the adaptive arm keeps bits(500)=bits(2000)=8, i.e. the historical
# 8x8 contract is unchanged where driver rows already exist.
_EMB_BANDS = 8
_EMB_BITS = 8  # base width (bits at n <= _EMB_N0)
_EMB_BITS_MAX = 16
_EMB_N0 = 2000  # occupancy anchor: ~n/2^bits held near _EMB_N0/256


def _emb_bits_for(n: int) -> int:
    import math

    if n <= _EMB_N0:
        return _EMB_BITS
    return min(
        _EMB_BITS_MAX, _EMB_BITS + int(math.floor(math.log2(n / _EMB_N0)))
    )


def _emb_dim0(band: int, j: int) -> int:
    """0-based embedding dim read by bit j of band (see module note)."""
    if j < _EMB_BITS:
        return band * _EMB_BITS + j
    return (band * _EMB_BITS + (j * 17) % 64) % 64


@query(
    "dedup_embedding_cosine",
    oracle=f"""
    WITH nb AS (
      SELECT LEAST({_EMB_BITS_MAX}, {_EMB_BITS} + GREATEST(0,
               CAST(FLOOR(LOG2(COUNT(*) / {_EMB_N0}.0)) AS INT))) AS bits
      FROM embeddings
    ),
    bucketed AS (
      SELECT vec_id, band,
             CAST(list_sum(list_transform(range(0, bits),
                  j -> CASE WHEN embedding[
                         (CASE WHEN j < {_EMB_BITS}
                               THEN band * {_EMB_BITS} + j
                               ELSE (band * {_EMB_BITS} + (j * 17) % 64) % 64
                          END) + 1] > 0
                            THEN (1 << j) ELSE 0 END)) AS INT) AS bucket
      FROM embeddings, generate_series(0, {_EMB_BANDS - 1}) AS bands(band), nb
    ),
    cand AS (
      SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
      FROM bucketed a
      JOIN bucketed b ON a.band = b.band AND a.bucket = b.bucket
                     AND a.vec_id < b.vec_id
    )
    SELECT * FROM (
      SELECT c.vec_a, c.vec_b, {_PAIR_DOT} AS cosine
      FROM cand c
      JOIN embeddings ea ON ea.vec_id = c.vec_a
      JOIN embeddings eb ON eb.vec_id = c.vec_b
    ) WHERE cosine >= 0.4
    ORDER BY vec_a, vec_b
    """,
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate detection at scale: random-
    hyperplane-style sign LSH (_EMB_BANDS bands x bits(n) sign bits)
    blocks the O(n^2) pair space into per-(band,bucket) groups; exact
    cosine verifies candidates.  The self-join shuffles on
    (band, bucket) — candidate volume is sum of bucket^2, not n^2.
    Pairs are deduped across bands before the exact-cosine verify so
    each pair pays the O(d) dot product once.

    Scale dial (r8 verdict item #3, now IMPLEMENTED as the default):
    the band width grows with the corpus — bits(n) = 8 +
    floor(log2(n / 2000)), capped at 16 (see the _EMB_BANDS
    geometry note) — holding per-bucket occupancy ~constant, so
    candidate volume grows ~linearly in n instead of the measured
    3.6x per 2x data under the old fixed 8x8: re-curved at r9,
    candidates sf1 777k -> sf2 1.557M (2.00x per 2x), wall time
    8.36s -> 3.28s at sf1 and 29.86s -> 4.72s at sf2
    (BENCH_sf1.json round9_adaptive_lsh_width).  Both engines derive
    bits from the same table COUNT; the Spark count() here is the one
    plan-time action (a table-stats lookup).  At every historical
    test SF n <= 2000 keeps bits = 8, so existing driver-green rows
    are byte-identical.

    Operating regime (measured, r9): on 200 planted noise-twin
    near-dups at sf1 — the high-cosine regime sign-LSH is built for —
    blocking recall is 1.0 at BOTH 8 and 11 bits, i.e. the width
    growth is free where this operator operates.  At the weak 0.4
    threshold the recall tradeoff is real (0.174 -> 0.039 at sf1);
    that regime's tool is the SemDeDup cell blocking
    (semdedup_cells, top-5 multi-assignment + 256-bit prescreen,
    measured recall 0.947 at sf1), not hyperplane LSH."""
    e = t(spark, sf_dir, "embeddings")
    bits = _emb_bits_for(e.count())
    bands = F.array(
        *[
            sum(
                (
                    F.when(
                        F.element_at("embedding", _emb_dim0(b, j) + 1) > 0,
                        F.lit(1 << j),
                    ).otherwise(F.lit(0))
                    for j in range(bits)
                ),
                start=F.lit(0),
            )
            for b in range(_EMB_BANDS)
        ]
    )
    bucketed = e.select("vec_id", F.posexplode(bands).alias("band", "bucket"))
    a = bucketed.alias("a")
    b = bucketed.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(F.col("a.vec_id").alias("vec_a"), F.col("b.vec_id").alias("vec_b"))
        .distinct()
    )
    # exact verification via the shared join-back (round 13
    # refactor-only: see _pair_cosine_joinback, incl. the measured
    # negatives; values bit-identical)
    return _pair_cosine_joinback(cand, e, "cosine", 0.4).orderBy(
        "vec_a", "vec_b"
    )


@query(
    "lsh_bucket_stats",
    oracle=f"""
    WITH sigs AS (
      SELECT doc_id, {_minhash_cols_duck()} FROM ({_DUCK_SHINGLE_DOCS})
    ),
    bands AS (
      SELECT doc_id, 0 AS band,
             mh0 || '_' || mh1 || '_' || mh2 || '_' || mh3 || '_' || mh4 || '_' || mh5 AS key
      FROM sigs
      UNION ALL
      SELECT doc_id, 1 AS band,
             mh6 || '_' || mh7 || '_' || mh8 || '_' || mh9 || '_' || mh10 || '_' || mh11 AS key
      FROM sigs
    ),
    buckets AS (
      SELECT band, key, COUNT(*) AS bucket_size
      FROM bands GROUP BY band, key
    )
    SELECT band, bucket_size,
           COUNT(*) AS n_buckets,
           CAST(SUM(bucket_size * (bucket_size - 1) / 2) AS BIGINT) AS pair_cost
    FROM buckets GROUP BY band, bucket_size
    """,
)
def lsh_bucket_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The LSH skew diagnostic: band-bucket size distribution plus the
    candidate-pair cost each size class contributes (sum of s*(s-1)/2).
    At 100 TB this is what you run BEFORE the dedup pass — a single
    hot bucket (boilerplate-heavy shards, empty documents) turns the
    candidate join quadratic, and the fix (more rows per band, salting
    the hot key, or pre-filtering degenerate docs) is chosen from this
    histogram.  Cost: signatures + two keyed aggregates — no pair
    materialization."""
    sigs = _minhash_signatures(t(spark, sf_dir, "documents"))
    b0 = sigs.select(
        "doc_id",
        F.lit(0).alias("band"),
        F.concat_ws("_", *[F.col(f"mh{i}") for i in range(6)]).alias("key"),
    )
    b1 = sigs.select(
        "doc_id",
        F.lit(1).alias("band"),
        F.concat_ws("_", *[F.col(f"mh{i}") for i in range(6, 12)]).alias("key"),
    )
    buckets = (
        b0.unionByName(b1)
        .groupBy("band", "key")
        .agg(F.count("*").alias("bucket_size"))
    )
    return buckets.groupBy("band", "bucket_size").agg(
        F.count("*").alias("n_buckets"),
        F.sum(
            (F.col("bucket_size") * (F.col("bucket_size") - 1) / 2).cast("long")
        ).alias("pair_cost"),
    )


# ------------------------------------------------- paragraph-level dedup

_PARA_W = 10  # words per "paragraph" (testdata text has no newlines)


@query(
    "dedup_paragraph",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ), paras AS (
      SELECT doc_id, i AS para_idx,
             array_to_string(w[(i-1)*{_PARA_W}+1 : i*{_PARA_W}], ' ') AS para
      FROM toks,
           LATERAL (SELECT unnest(generate_series(
             1, CAST(ceil(len(w) / {_PARA_W}.0) AS BIGINT))) AS i) s
    ), keep AS (
      SELECT para, MIN(doc_id * 1024 + para_idx) AS keeper
      FROM paras GROUP BY para
    )
    SELECT p.doc_id,
           COUNT(*) AS n_paras,
           CAST(SUM(CASE WHEN p.doc_id * 1024 + p.para_idx = k.keeper
                         THEN 0 ELSE 1 END) AS BIGINT) AS n_dropped,
           md5(COALESCE(string_agg(
             CASE WHEN p.doc_id * 1024 + p.para_idx = k.keeper THEN p.para END,
             ' ' ORDER BY p.para_idx), '')) AS cleaned_md5
    FROM paras p JOIN keep k USING (para)
    GROUP BY p.doc_id
    """,
)
def dedup_paragraph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paragraph-level exact dedup with document reconstruction — the
    MassiveText/Gopher curation step the whole-doc hash can't do:
    a paragraph repeated across documents (boilerplate, headers,
    licenses) is kept only at its globally first occurrence
    (min (doc_id, para_idx)) and REMOVED from every later document,
    which is then reassembled from its surviving paragraphs in order.
    Paragraph := non-overlapping 10-word window (the synthetic corpus
    has no newline structure; on real data the split is '\\n\\n').

    Scale shape: explode to (doc_id, para_idx, para) once; the
    keeper election groups by the paragraph (at 100 TB: its digest,
    same argmin) — the shuffle carries digest + two ints, never the
    document; reconstruction is one groupBy(doc_id) whose rows were
    already co-keyed by the explode.  No self-join, no window over
    the full corpus.  Reference has no dedup at all (SURVEY §2.6)."""
    d = t(spark, sf_dir, "documents")
    toked = d.select("doc_id", F.split("text", " ").alias("w"))
    n_paras = F.ceil(F.size("w") / F.lit(float(_PARA_W)))
    para_arr = F.transform(
        F.sequence(F.lit(1), n_paras),
        lambda i: F.struct(
            i.alias("para_idx"),
            F.array_join(F.slice("w", (i - 1) * _PARA_W + 1, _PARA_W), " ").alias(
                "para"
            ),
        ),
    )
    paras = toked.select(
        "doc_id", F.explode(para_arr).alias("p")
    ).select("doc_id", F.col("p.para_idx").alias("para_idx"), F.col("p.para").alias("para"))
    # Keeper election: argmin encoded as doc_id*1024+para_idx (para_idx
    # <= ~60 << 1024) so Spark and DuckDB run the same integer argmin.
    keep = paras.groupBy("para").agg(
        F.min(F.col("doc_id") * 1024 + F.col("para_idx")).alias("keeper")
    )
    joined = paras.join(keep, "para").withColumn(
        "kept", F.col("doc_id") * 1024 + F.col("para_idx") == F.col("keeper")
    )
    return joined.groupBy("doc_id").agg(
        F.count("*").alias("n_paras"),
        F.sum(F.when(F.col("kept"), 0).otherwise(1)).alias("n_dropped"),
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(F.col("kept"), F.struct("para_idx", "para"))
                        )
                    ),
                    lambda s: s.para,
                ),
                " ",
            )
        ).alias("cleaned_md5"),
    )


# ------------------------------------------- fuzzy decontamination (LSH)

_DUCK_SHINGLE_BENCH = _DUCK_SHINGLE_DOCS.replace(
    "FROM documents)",
    "FROM documents WHERE doc_id % 11 = 0 AND doc_id < 11264)"
)
_DUCK_SHINGLE_CORPUS = _DUCK_SHINGLE_DOCS.replace(
    "FROM documents)", "FROM documents WHERE doc_id % 11 <> 0)"
)


def _duck_bands(shingle_cte: str) -> str:
    return f"""
      SELECT doc_id, 0 AS band,
             mh0 || '_' || mh1 || '_' || mh2 || '_' || mh3 || '_' || mh4 || '_' || mh5 AS key
      FROM (SELECT doc_id, {_minhash_cols_duck()} FROM ({shingle_cte}))
      UNION ALL
      SELECT doc_id, 1 AS band,
             mh6 || '_' || mh7 || '_' || mh8 || '_' || mh9 || '_' || mh10 || '_' || mh11 AS key
      FROM (SELECT doc_id, {_minhash_cols_duck()} FROM ({shingle_cte}))
    """


_CONTAM_THRESHOLD = 0.5


@query(
    "contamination_minhash",
    oracle=f"""
    WITH cand AS (
      SELECT DISTINCT c.doc_id, b.doc_id AS bench_id
      FROM ({_duck_bands(_DUCK_SHINGLE_CORPUS)}) c
      JOIN ({_duck_bands(_DUCK_SHINGLE_BENCH)}) b
        ON c.band = b.band AND c.key = b.key
    )
    SELECT doc_id, bench_id, jaccard FROM (
      SELECT cand.doc_id, cand.bench_id,
             ROUND(CAST(len(list_intersect(wc.ws, wb.ws)) AS DOUBLE)
                   / len(list_distinct(wc.ws || wb.ws)), 6) AS jaccard
      FROM cand
      JOIN (SELECT doc_id, shingles AS ws FROM ({_DUCK_SHINGLE_CORPUS})) wc
        ON cand.doc_id = wc.doc_id
      JOIN (SELECT doc_id, shingles AS ws FROM ({_DUCK_SHINGLE_BENCH})) wb
        ON cand.bench_id = wb.doc_id
    ) WHERE jaccard >= {_CONTAM_THRESHOLD}
    """,
)
def contamination_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy decontamination — the near-dup twin of the exact-n-gram
    contamination_check: corpus documents whose shingle-set Jaccard
    with any held-out benchmark document (every 11th doc) clears 0.5,
    found via the SAME MinHash banding as dedup_minhash_lsh but as a
    corpus x bench join instead of a self-join.

    Scale shape: the benchmark side is tiny (eval sets are MBs, the
    corpus is TBs), so its band table is BROADCAST — candidate
    generation costs one map-side hash probe per corpus band row,
    zero shuffle of the corpus; only candidates pay the exact-Jaccard
    verify.  This is how you sweep 100 TB against every eval suite."""
    docs = t(spark, sf_dir, "documents")
    corpus_bands = _band_rows_of(
        docs.filter(F.col("doc_id") % 11 != 0)
    )
    bench_bands = _band_rows_of(
        docs.filter((F.col("doc_id") % 11 == 0) & (F.col("doc_id") < 11264))
    ).select(
        F.col("doc_id").alias("bench_id"),
        F.col("shingles").alias("ws_b"),
        "band",
        "key",
    )
    cand = (
        corpus_bands.join(F.broadcast(bench_bands), ["band", "key"])
        .groupBy("doc_id", "bench_id")
        .agg(F.first("shingles").alias("ws_c"), F.first("ws_b").alias("ws_b"))
    )
    return cand.select(
        "doc_id",
        "bench_id",
        F.round(
            F.size(F.array_intersect("ws_c", "ws_b")).cast("double")
            / F.size(F.array_union("ws_c", "ws_b")),
            6,
        ).alias("jaccard"),
    ).filter(F.col("jaccard") >= _CONTAM_THRESHOLD)


def _band_rows_of(docs: DataFrame) -> DataFrame:
    """(doc_id, shingles, band, key) band rows for an arbitrary doc
    subset — the generalized front half of _lsh_sigs + _band_rows."""
    sh = _shingle_docs(docs)
    base = f"TRANSFORM(shingles, w -> {_spark_h32('w', 0)})"
    sigs = sh.selectExpr("doc_id", "shingles", f"{base} AS hs").selectExpr(
        "doc_id",
        "shingles",
        *[
            f"ARRAY_MIN(TRANSFORM(hs, h -> ({_MH_A[s]} * h + {_MH_B[s]}) % {_MH_P})) AS mh{s}"
            for s in range(_MINHASH_K)
        ],
    )
    r = _MINHASH_K // 2
    out = None
    for band in range(2):
        cols = [f"mh{r * band + j}" for j in range(r)]
        b = sigs.select(
            "doc_id",
            "shingles",
            F.lit(band).alias("band"),
            F.concat_ws("_", *cols).alias("key"),
        )
        out = b if out is None else out.unionByName(b)
    return out


# ------------------------------------------------ product-quantized ANN


_PQ_EXACT_L2 = """
    list_reduce(list_transform(range(1, len(e.embedding) + 1),
      i -> (CAST(e.embedding[i] AS DOUBLE) - CAST(q.embedding[i] AS DOUBLE))
         * (CAST(e.embedding[i] AS DOUBLE) - CAST(q.embedding[i] AS DOUBLE))),
      (a, b) -> a + b)
"""


@query(
    "sim_search_pq",
    oracle=f"""
    WITH exact AS (
      SELECT e.vec_id, {_PQ_EXACT_L2} AS l2
      FROM embeddings e, (SELECT embedding FROM embeddings WHERE vec_id = 0) q
      WHERE e.vec_id <> 0
      ORDER BY l2 ASC, e.vec_id LIMIT 10
    )
    SELECT 10 AS n_results,
           CAST(SUM(vec_id) AS BIGINT) AS exact_topk_id_sum,
           TRUE AS recall_ok
    FROM exact
    """,
)
def sim_search_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN (operators/simsearch.py): 64-dim float
    vectors compressed to ONE packed int64 (8 subspaces x 16 codewords
    = 4 bits each), searched by asymmetric distance — per-row cost is
    8 lookup-table reads instead of a 64-dim dot product, and the
    store shrinks 32x (256 B -> 8 B/vector), which is what lets a
    100 TB embedding corpus live in memory.  Codebooks train on a
    deterministic hash-selected sample, driver-side numpy (bounded);
    encode + search are pure Column algebra.  Like the k-means IVF
    entry, codebooks aren't SQL-expressible, so the driver-checked
    contract is the ANN guarantee: result count == top_k and
    recall@10 vs the exact scan >= 0.5 (actual value asserted in
    tests/test_simsearch.py) — plus a VALUE-BEARING column: the exact
    L2 scan's top-10 id sum, recomputed by DuckDB with the identical
    left-fold, certifying the reference side of the recall bound."""
    from instructions_mr_spark.operators.simsearch import (
        pq_adc_search,
        train_pq_codebooks,
    )

    e = t(spark, sf_dir, "embeddings")
    books = train_pq_codebooks(e, m=8, k=16)
    qv = [float(x) for x in e.filter(F.col("vec_id") == 0).first().embedding]
    corpus = e.filter(F.col("vec_id") != 0)
    approx = pq_adc_search(corpus, books, qv, top_k=10)
    qlit = F.array(*[F.lit(float(x)) for x in qv])
    exact = (
        corpus.select(
            "vec_id",
            F.aggregate(
                F.zip_with(
                    "embedding",
                    qlit,
                    lambda x, y: (x.cast("double") - y) * (x.cast("double") - y),
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("l2"),
        )
        .orderBy(F.col("l2").asc(), F.col("vec_id"))
        .limit(10)
    )
    hits = approx.join(exact.select("vec_id"), "vec_id", "left_semi")
    exact_stats = exact.agg(
        F.sum("vec_id").cast("bigint").alias("exact_topk_id_sum")
    )
    return (
        approx.agg(F.count("*").alias("n_results"))
        .crossJoin(F.broadcast(exact_stats))
        .crossJoin(hits.agg((F.count("*") >= 5).alias("recall_ok")))
        .select("n_results", "exact_topk_id_sum", "recall_ok")
    )


# ----------------------------------------------------- semantic dedup


_SEM_COS_T = 0.4  # pair threshold (matches dedup_embedding_cosine)

# Audit sample dial: the in-query brute-force recall audit self-joins a
# deterministic id slice.  A FIXED 10%% slice is quadratic in n (the
# sf2 scale step measured the audit overtaking the linear dedup path),
# so the modulus grows with the corpus to hold the audited sample near
# _SEM_AUDIT_TARGET vectors — constant audit cost at any scale, and
# byte-identical behavior at every historical test SF (m = 10 for all
# n <= 20k).  Both engines derive m from the same table COUNT.
_SEM_AUDIT_TARGET = 2000


def _audit_mod(n: int) -> int:
    return max(10, n // _SEM_AUDIT_TARGET)

# SemDeDup cell dial: k_eff = max(_SEMDEDUP_K, n // _SEMDEDUP_CELL_TARGET)
# holds the EXPECTED CELL SIZE constant (~_SEMDEDUP_CELL_TARGET vectors,
# m x that after top-m multi-assignment), which makes the cell-blocked
# candidate count LINEAR in n — the production SemDeDup scaling (k ~
# n/10k at 0.95+ thresholds; the demo target is smaller so the tiny
# driver corpus still exercises multi-cell blocking).  r10 frontier at
# sf1 (20k vectors, 0.4-threshold audit — the worst case for cell
# blocking; 13 points over (cell_target, m, screen_min), recorded in
# BENCH_sf1.json round10_semdedup_frontier): the prescreen reshaped
# the whole frontier, and the adopted (target 700, top-5, screen 146)
# point measures recall 0.947 @ 54s — vs r9's (500, top-4, no screen)
# 0.818 @ 148s.  Nearby: (500,5,146) 0.911 @ 53s, (500,6,150) 0.923 @
# 51s, (500,5,150) 0.884 @ 42s, (500,4,146) 0.829 @ 36s — the wall
# dial is screen_min, the recall dial is m and cell_target.  The
# recall_ok bound (>= 0.5) holds with ~1.9x headroom and candidates
# stay linear in n at every point.  The high-threshold/k=32 regime
# has its own oracled entry below (semdedup_planted_k32) plus the
# planted-duplicate recall test in tests/test_simsearch.py.
#
# Threshold-regime scale note (r11 sf4 octave, BENCH_sf1.json
# round11_sf4_heavies): at this 0.4 demo threshold ~3.5e-4 of
# ARBITRARY pairs pass (measured), so the true pair set — and hence
# the output and wall of ANY exact-within-blocks dedup — grows
# ~quadratically in n regardless of blocking; the engine cost stays
# linear in candidates+output (constant ~475k pairs/s).  At 100 TB
# run the production 0.95 regime (0 arbitrary passes measured —
# output linear, duplicates only) or cap per-vector neighbors; the
# 0.4 setting exists to stress the blocking on tiny corpora.
_SEMDEDUP_K = 8
_SEMDEDUP_CELL_TARGET = 700
_SEMDEDUP_TOPM = 5


# Within-cell prescreen (r9 verdict item #4): a 256-bit sign signature
# per vector — bit k is the sign of a DIFFERENCE PLANE, embedding[p_k]
# > embedding[q_k], a deterministic discrete hyperplane family that is
# scale-invariant (same-vector coordinate difference) and needs no
# stored projection matrix.  Candidate id-pairs first join back only
# this 32-byte signature (not the 256-byte float array), and pairs
# with fewer than _SEM_SCREEN_MIN matching bits are discarded before
# the exact cosine.  Measured on the sf0.1 fixture (3k vectors, all
# pairs, 300k-sample background): keep rate 0.189 (5.3x fewer exact
# cosines) at screen recall 0.9989 over true cos>=0.4 pairs —
# composed with the adopted (700, top-5, screen 146) operating point
# this measures 0.947 audit recall at sf1 (>= the 0.8 bar; the >= 0.5
# contract by 1.9x).  Gaussian planes measured no better (0.188 keep
# at equal recall); difference planes keep both engines
# literal-expressible.  sf1 end-to-end (20k vectors): exact-cosine
# pairs cut ~4-5x, semdedup_cells frontier wall 148s -> 54s at BETTER
# recall (0.818 -> 0.947); see round10_semdedup_frontier.
_SEM_SCREEN_BITS = 256
_SEM_SCREEN_MIN = 146  # matching bits required to reach exact cosine


def _screen_dims(k: int) -> tuple[int, int]:
    """Deterministic (p, q) dim pair read by screen bit k; q - p is
    always in [1, 63] mod 64, so p != q for every bit."""
    p = (k * 7) % 64
    q = ((k * 7) + 1 + (k * 11) % 63) % 64
    return p, q


def _prescreen_sigs(e):
    """(vec_id, s0..s3): the 256 difference-plane sign bits packed
    into 4 BIGINT words (distinct powers OR'd — no arithmetic
    overflow path)."""
    words = []
    for w in range(4):
        bits = []
        for j in range(64):
            p, q = _screen_dims(w * 64 + j)
            bits.append(
                f"IF(embedding[{p}] > embedding[{q}],"
                f" shiftleft(CAST(1 AS BIGINT), {j}), CAST(0 AS BIGINT))"
            )
        words.append(F.expr(" | ".join(bits)).alias(f"s{w}"))
    return e.select("vec_id", *words)


def _cell_blocked_pairs(e, k: int, threshold: float,
                        m: int = _SEMDEDUP_TOPM,
                        screen_min: int = _SEM_SCREEN_MIN):
    """Shared SemDeDup kernel: k-means cell blocking -> 256-bit
    sign-signature prescreen -> exact-cosine pairs above
    ``threshold``.  Returns (pairs_df, n_centroids).

    Plan shape (the part that holds at 100 TB): the cell self-join
    carries NARROW (cell, vec_id) rows — candidate id-pairs dedupe
    across the top-m multi-assignment as 16-byte rows, and the
    embeddings join BACK by id so each surviving pair pays the O(d)
    cosine exactly once and no array ever rides the candidate
    shuffle.  (The r6 rewrite: deduping via groupBy(first(embedding))
    shuffled two 64-float arrays per candidate — ~30x the shuffle
    bytes; measured 391s -> 16s at sf1, same output.)  The join-back
    uses a broadcast hint because the vector table is tiny next to
    the candidate set; at billion-vector scale drop the hint for an
    id-keyed shuffle join — the plan is otherwise identical."""
    from instructions_mr_spark.operators.simsearch import (
        assign_topm_cells,
        train_ivf_centroids,
    )

    cents = train_ivf_centroids(e, k=k, seed=42)
    # top-m multi-assignment (r8 item #4 took top-2 -> top-4; the r10
    # prescreen made top-5 affordable): sf1 audit recall 0.44 (top-2)
    # / 0.63 (top-3) / 0.84 (top-4) / 0.95 (top-5, adopted) — a dedup
    # gate at 0.63 silently ships 37% of true near-dups.  Candidate
    # volume stays linear in n (cell size constant via the adaptive
    # k); the prescreen absorbs the extra within-cell pairs
    # prescreen INSIDE the self-join (r10 follow-up): the 4 signature
    # words ride the narrow cells rows (32 extra bytes x m rows per
    # vector), the hamming test evaluates as a RESIDUAL condition of
    # the cell equi-join, and the pair-dedup DISTINCT therefore
    # exchanges only the ~1-in-5 SURVIVORS — at sf1 that is a 22M-row
    # distinct instead of a 94M-row one (pre-screen-then-distinct was
    # the first cut; moving the screen into the join measured the
    # remaining win).  Only surviving deduped pairs pay the 256-byte
    # array join-back and the O(d) cosine.
    sigs = supersede_checkpoint("semdedup_screen_sigs", _prescreen_sigs(e))
    cells = (
        assign_topm_cells(e, cents, m=m)
        .select("cell", "vec_id")
        .join(sigs, "vec_id")
    )
    a, b = cells.alias("a"), cells.alias("b")
    hamming_ok = F.expr(
        f"{_SEM_SCREEN_BITS} - "
        + " - ".join(f"bit_count(a.s{w} ^ b.s{w})" for w in range(4))
        + f" >= {screen_min}"
    )
    screened = (
        a.join(
            b,
            (F.col("a.cell") == F.col("b.cell"))
            & (F.col("a.vec_id") < F.col("b.vec_id"))
            & hamming_ok,
        )
        .select(
            F.col("a.vec_id").alias("vec_a"), F.col("b.vec_id").alias("vec_b")
        )
        .distinct()
    )
    # exact scoring via the shared join-back (round 13
    # refactor-only: see _pair_cosine_joinback, incl. the measured
    # negatives; values bit-identical)
    pairs = _pair_cosine_joinback(screened, e, "cos", threshold)
    return pairs, len(cents)


@query(
    "semdedup_cells",
    oracle=f"""
    WITH m AS (
      SELECT GREATEST(10, COUNT(*) // {_SEM_AUDIT_TARGET}) AS md
      FROM embeddings
    ),
    s AS (
      SELECT vec_id, embedding FROM embeddings, m WHERE vec_id % md = 0
    ),
    audit AS (
      SELECT ea.vec_id AS vec_a, eb.vec_id AS vec_b
      FROM s ea JOIN s eb ON ea.vec_id < eb.vec_id
      WHERE {_PAIR_DOT} >= {_SEM_COS_T}
    )
    SELECT CAST(GREATEST({_SEMDEDUP_K},
             (SELECT COUNT(*) FROM embeddings) // {_SEMDEDUP_CELL_TARGET})
             AS BIGINT) AS n_cells,
           CAST(COUNT(*) AS BIGINT) AS n_audit_pairs,
           CAST(COALESCE(SUM(vec_a * 1000003 + vec_b), 0) AS BIGINT)
             AS audit_checksum,
           TRUE AS pairs_nonzero,
           TRUE AS recall_ok
    FROM audit
    """,
)
def semdedup_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic dedup (Abbas et al. 2023): block the
    O(n^2) pair space with k-means cells (k adaptive — constant cell
    size, see _SEMDEDUP_CELL_TARGET — so candidates scale LINEARLY in
    n), top-5 multi-assignment so boundary-straddling pairs still
    share a block, a 256-bit sign-signature prescreen (see
    _SEM_SCREEN_MIN), exact cosine within blocks (measured audit
    recall 0.947 at sf1 — see _cell_blocked_pairs),
    drop any vector with a
    lower-id neighbor above the threshold.  Centroids aren't
    SQL-expressible, so the driver-checked contract has two parts:
    VALUE-BEARING — the sampled brute-force audit (all pairs among a
    capped deterministic id slice, ~_SEM_AUDIT_TARGET vectors at any
    corpus size — constant audit cost at 100 TB) is recomputed
    exactly by DuckDB: pair count plus an
    order-independent pair checksum; BOOLEAN — cells == k, at least
    one cell-blocked pair found, and the blocked pass recovers >= 0.5
    of the audit pairs.  Exact counts are also asserted in
    tests/test_simsearch.py.

    Scale shape: assignment is a projection; the pair join shuffles on
    the cell carrying NARROW rows only — (cell, vec_id), never the
    embedding arrays (r6 fix: the old plan deduped pairs via a
    groupBy that shuffled two 64-float arrays per candidate, ~30x
    the bytes; sf1 measured 391s -> this shape is the same join-back
    pattern dedup_embedding_cosine uses).  Candidates dedupe as bare
    id-pairs, embeddings join back by id for the one exact cosine per
    pair (broadcast here — vector table is node-count-sized; at
    100 TB swap the hint for an id-keyed shuffle join, same plan
    otherwise).  The audit is a 1%-sampled self-join.  See
    _SEMDEDUP_K for the production k guidance."""
    e = t(spark, sf_dir, "embeddings")
    n = e.count()  # bounded scalar agg (the k dial needs corpus size)
    k_eff = max(_SEMDEDUP_K, n // _SEMDEDUP_CELL_TARGET)
    pairs, _ = _cell_blocked_pairs(e, k=k_eff, threshold=_SEM_COS_T)
    pairs = supersede_checkpoint("semdedup_pairs", pairs)
    # Sampled-recall audit: brute-force pairs among a capped
    # deterministic id slice (see _SEM_AUDIT_TARGET).
    s = e.filter(F.col("vec_id") % _audit_mod(n) == 0)
    s = s.withColumn("nrm", _norm_col(F.col("embedding")))
    sa, sb = s.alias("sa"), s.alias("sb")
    audit = (
        sa.join(sb, F.col("sa.vec_id") < F.col("sb.vec_id"))
        .select(
            F.col("sa.vec_id").alias("vec_a"),
            F.col("sb.vec_id").alias("vec_b"),
            _cosine_prenorm(
                F.col("sa.embedding"), F.col("sb.embedding"),
                F.col("sa.nrm"), F.col("sb.nrm"),
            ).alias("cos"),
        )
        .filter(F.col("cos") >= _SEM_COS_T)
    )
    # ONE evaluation of the audit self-join (round 12, optimization
    # session 5): the old shape aggregated `audit` once for
    # (n_audit, checksum) and AGAIN under a left-semi join for
    # n_found — two full evaluations of the sampled brute-force
    # cosine self-join (~0.5 s at sf0.1).  `pairs` is unique on
    # (vec_a, vec_b) by construction (the blocking DISTINCT precedes
    # the join-back), so a left join preserves audit cardinality
    # exactly and COUNT(_hit) == the old semi-join count — all three
    # aggregates now ride one pass over one audit evaluation.
    marked = audit.join(
        pairs.select("vec_a", "vec_b", F.lit(1).alias("_hit")),
        ["vec_a", "vec_b"],
        "left",
    )
    # Report the dial that was CONTRACTED (k_eff), not len(centroids):
    # Spark ML KMeans can return fewer centers on degenerate corpora,
    # which would red-row the driver hash while the dedup itself is
    # still fine (r6 advice).
    n_cells = F.lit(k_eff).cast("bigint")
    return (
        pairs.agg((F.count("*") > 0).alias("pairs_nonzero"))
        .crossJoin(
            marked.agg(
                F.count("*").alias("n_audit"),
                F.coalesce(
                    F.sum(F.col("vec_a") * 1000003 + F.col("vec_b")), F.lit(0)
                )
                .cast("bigint")
                .alias("audit_checksum"),
                F.count("_hit").alias("n_found"),
            )
        )
        .select(
            n_cells.alias("n_cells"),
            F.col("n_audit").alias("n_audit_pairs"),
            "audit_checksum",
            "pairs_nonzero",
            (
                (F.col("n_audit") == 0)
                | (F.col("n_found") >= F.col("n_audit") * 0.5)
            ).alias("recall_ok"),
        )
    )


# High-threshold SemDeDup regime: production runs k ~ n/10k cells with
# a 0.95+ cosine threshold, where duplicates are (near-)identical
# vectors that land in the same cell at ANY k.  The planted-duplicate
# construction makes that regime value-checkable: a deterministic
# corpus sample unioned with exact copies (shifted ids) must yield
# EXACTLY the brute-force pair set — DuckDB recomputes it in full.
_SEMDEDUP_K32 = 32
_SEMDEDUP_HI_T = 0.95
_PLANT_SHIFT = 10_000_000


@query(
    "semdedup_planted_k32",
    oracle=f"""
    WITH s AS (
      SELECT vec_id, embedding FROM embeddings WHERE vec_id % 17 = 0
    ),
    corpus AS (
      SELECT vec_id, embedding FROM s
      UNION ALL
      SELECT vec_id + {_PLANT_SHIFT} AS vec_id, embedding FROM s
    )
    SELECT * FROM (
      SELECT ea.vec_id AS vec_a, eb.vec_id AS vec_b, {_PAIR_DOT} AS cosine
      FROM corpus ea JOIN corpus eb ON ea.vec_id < eb.vec_id
    ) WHERE cosine >= {_SEMDEDUP_HI_T}
    ORDER BY vec_a, vec_b
    """,
)
def semdedup_planted_k32(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup at the production operating point (high threshold,
    many cells): a deterministic 1/17 corpus sample is unioned with an
    exact copy of itself (ids shifted by _PLANT_SHIFT), cell-blocked
    at k=_SEMDEDUP_K32 with top-2 assignment, and pairs above cosine
    _SEMDEDUP_HI_T are returned.  Identical vectors get identical
    cell assignments at any k, so the blocked pass is guaranteed to
    recover every planted pair — which lets the oracle be the EXACT
    brute-force pair set over the same (bounded) corpus, not a
    recall bound: a value-level driver check of the scale regime the
    k=_SEMDEDUP_K demo entry can't certify.

    Scale shape matches semdedup_cells (shared _cell_blocked_pairs
    kernel: narrow cell join, id-pair dedupe, embeddings join back).
    k adapts to the sample so the tiny sf0.001 corpus still trains
    (k_eff <= n/2, >= 2).

    Acknowledged data-dependence (r6 advice, kept by design): the
    oracle is the exact brute-force pair set, so a NON-planted
    cross-cell pair reaching the 0.95 cosine threshold would make the
    blocked side miss a pair the oracle contains.  On the fixed
    testdata (uniform embeddings) no such pair exists at any checked
    SF — the r6 sf0.01/sf1 sweeps verified blocked == brute force
    exactly — and structurally the probability is ~d^(-1/2)-tailed;
    the exactness of the check on planted pairs is worth that known
    residual.  (r8, closing the r7 advice explicitly: the documented
    data-dependence is the DECISION — restricting the oracle to the
    planted set would stop certifying that blocking finds nothing
    spurious, which is half the contract's value; re-verified green
    on the r8 decorrelated sf1 fixture.)"""
    e = t(spark, sf_dir, "embeddings")
    s = e.filter(F.col("vec_id") % 17 == 0).select("vec_id", "embedding")
    corpus = s.unionByName(
        s.select((F.col("vec_id") + _PLANT_SHIFT).alias("vec_id"), "embedding")
    )
    n = corpus.count()  # bounded: 2/17ths of the embeddings table
    k_eff = max(2, min(_SEMDEDUP_K32, n // 2))
    pairs, _ = _cell_blocked_pairs(corpus, k=k_eff, threshold=_SEMDEDUP_HI_T)
    return pairs.select(
        "vec_a", "vec_b", F.col("cos").alias("cosine")
    ).orderBy("vec_a", "vec_b")


@query(
    "dedup_incremental",
    oracle="""
    WITH fp AS (
      SELECT doc_id, source,
             md5(array_to_string(string_split(text, ' ')[1:10], ' ')) AS h
      FROM documents
    ), existing AS (
      SELECT DISTINCT h FROM fp WHERE doc_id % 5 <> 0
    ), incoming AS (
      SELECT doc_id, h, source FROM fp WHERE doc_id % 5 = 0
    )
    SELECT i.source,
           COUNT(*) AS n_incoming,
           COUNT(*) FILTER (WHERE e.h IS NULL) AS n_new,
           CAST(SUM(CASE WHEN e.h IS NULL THEN 0 ELSE 1 END) AS BIGINT)
             AS n_already_seen
    FROM incoming i LEFT JOIN existing e ON i.h = e.h
    GROUP BY i.source ORDER BY i.source
    """,
)
def dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-ingestion dedup — the daily-batch shape: an incoming
    slice (every 5th doc plays the new crawl) is admitted only where
    its content fingerprint (digest of the first 10 words — the
    prefix fingerprint crawl dedup uses so near-identical re-crawls
    still collide) is absent from the existing corpus' fingerprint set.
    The join carries DIGESTS only, never bodies; at 100 TB the
    existing-digest table is the persisted artifact of past ingests
    (append-only), the join keys both sides on the digest, and a
    bloom_filter_agg prefilter (see runtime_bloom_join for the
    mechanics) screens the 99% of misses before the exact anti join.
    Reported per-source so the admission rate is monitorable."""
    d = t(spark, sf_dir, "documents")
    fp = d.select(
        "doc_id",
        "source",
        F.md5(
            F.array_join(F.slice(F.split("text", " "), 1, 10), " ").cast("binary")
        ).alias("h"),
    )
    existing = (
        fp.filter(F.col("doc_id") % 5 != 0)
        .select("h")
        .distinct()
        .withColumn("seen", F.lit(1))
    )
    incoming = fp.filter(F.col("doc_id") % 5 == 0).select("doc_id", "h", "source")
    j = incoming.join(existing, "h", "left")
    return (
        j.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_incoming"),
            F.count(F.when(F.col("seen").isNull(), 1)).alias("n_new"),
            F.sum(F.when(F.col("seen").isNull(), 0).otherwise(1)).alias(
                "n_already_seen"
            ),
        )
        .orderBy("source")
    )


_KNN_PROBES = 8
_KNN_K = 5
_KNN_PAIR_DOT = """
    ROUND(
      list_reduce(list_transform(range(1, len(p.embedding) + 1),
                  i -> CAST(p.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)),
                  (a, b) -> a + b)
      / (sqrt(list_reduce(list_transform(p.embedding, x -> CAST(x AS DOUBLE) * x), (a,b) -> a+b))
         * sqrt(list_reduce(list_transform(c.embedding, x -> CAST(x AS DOUBLE) * x), (a,b) -> a+b))),
    6)
"""


@query(
    "knn_join_batch",
    oracle=f"""
    SELECT probe_id, vec_id, cosine, rnk FROM (
      SELECT p.vec_id AS probe_id, c.vec_id AS vec_id,
             {_KNN_PAIR_DOT} AS cosine,
             ROW_NUMBER() OVER (PARTITION BY p.vec_id
                                ORDER BY {_KNN_PAIR_DOT} DESC, c.vec_id) AS rnk
      FROM embeddings p JOIN embeddings c
        ON p.vec_id < {_KNN_PROBES} AND c.vec_id >= {_KNN_PROBES}
    ) WHERE rnk <= {_KNN_K}
    """,
)
def knn_join_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch k-NN JOIN: top-{_KNN_K} corpus neighbors for EVERY probe
    vector at once (retrieval / hard-negative-mining shape), vs
    sim_search_topk's single query vector.

    Scale shape: the probe set is the small side — it BROADCASTS onto
    the corpus scan (BroadcastNestedLoopJoin), cosine runs JVM-side via
    zip_with/aggregate inside the join projection, and per-probe top-k
    is one window over rows already partitioned by probe_id.  The
    corpus never shuffles for the join itself; the only exchange keys
    on probe_id for the rank — |probes| * |corpus| candidate rows never
    materialize beyond the pipelined join output.  At 100 TB with a big
    probe set, swap the nested-loop for the IVF cell join
    (sim_search_ivf_kmeans) — same downstream window."""
    e = t(spark, sf_dir, "embeddings")
    probes = e.filter(F.col("vec_id") < _KNN_PROBES).select(
        F.col("vec_id").alias("probe_id"), F.col("embedding").alias("q")
    )
    corpus = e.filter(F.col("vec_id") >= _KNN_PROBES)
    from pyspark.sql import Window

    w = Window.partitionBy("probe_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id")
    )
    return (
        corpus.crossJoin(F.broadcast(probes))
        .select(
            "probe_id",
            "vec_id",
            _cosine_col(F.col("q"), F.col("embedding")).alias("cosine"),
        )
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= _KNN_K)
    )


@query(
    "dedup_exact_normalized",
    oracle="""
    SELECT md5(norm) AS norm_md5, MIN(doc_id) AS kept_doc_id,
           COUNT(*) AS n_copies
    FROM (
      SELECT doc_id,
             lower(trim(regexp_replace(text, '[ ]+', ' ', 'g'))) AS norm
      FROM documents
    ) GROUP BY md5(norm)
    """,
)
def dedup_exact_normalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalization-then-exact dedup (the C4-style "fuzzy exact"
    pass): lowercase, trim, collapse space runs, THEN digest — catches
    re-serialized copies that raw-byte dedup misses while staying one
    digest shuffle.  Same scale shape as dedup_exact: only
    (digest, id) pairs move, never bodies; the normalization is in-row
    string algebra on the scan."""
    return (
        t(spark, sf_dir, "documents")
        .select(
            F.expr(
                "MD5(CAST(lower(trim(regexp_replace(text, ' +', ' '))) AS BINARY))"
            ).alias("norm_md5"),
            "doc_id",
        )
        .groupBy("norm_md5")
        .agg(F.min("doc_id").alias("kept_doc_id"), F.count("*").alias("n_copies"))
    )


_BLOCKLIST = [
    "casino", "lottery", "viagra", "jackpot", "betting",
    "clickbait", "unsubscribe",
]


@query(
    "quality_blocklist_hits",
    oracle=f"""
    SELECT doc_id,
           {' + '.join(f"len(list_filter(words, w -> lower(w) = '{t}'))" for t in _BLOCKLIST)}
             AS n_hits,
           ({' + '.join(f"len(list_filter(words, w -> lower(w) = '{t}'))" for t in _BLOCKLIST)}) > 0
             AS flagged
    FROM (SELECT doc_id, string_split(text, ' ') AS words FROM documents)
    """,
)
def quality_blocklist_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wordlist-based content gate (the NSFW/spam-blocklist filter
    every public curation recipe runs): per-doc count of exact
    blocklist-term matches + a boolean flag.  Word-exact matching (not
    substring) avoids the classic Scunthorpe false positive.

    Scale shape: the list is a compile-time literal folded into an
    in-row filter+size expression — pure scan projection, zero
    exchanges, zero joins; a 10k-term production list becomes a
    broadcast map lookup with the identical plan shape."""
    d = t(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("words")
    )
    hits = None
    for term in _BLOCKLIST:
        c = F.size(F.filter("words", lambda w: F.lower(w) == term))
        hits = c if hits is None else hits + c
    return d.select(
        "doc_id",
        hits.cast("bigint").alias("n_hits"),
        (hits > 0).alias("flagged"),
    )


@query(
    "neardup_threshold_curve",
    oracle=f"""
    WITH pairs AS (
      SELECT {_PAIR_DOT.replace('ea.', 'a.').replace('eb.', 'b.')} AS cosine
      FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1
    ), th(thr) AS (VALUES (0.5), (0.7), (0.8), (0.9))
    SELECT th.thr,
           CAST(COUNT(CASE WHEN p.cosine >= th.thr THEN 1 END) AS BIGINT)
             AS n_pairs
    FROM th CROSS JOIN pairs p
    GROUP BY th.thr
    """,
)
def neardup_threshold_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-threshold selection curve: how many candidate pairs
    survive at cosine thresholds 0.5/0.7/0.8/0.9 — the diagnostic a
    curation run consults before committing to a near-dup cutoff (too
    low deletes real data, too high keeps dups).  Pairs here are the
    adjacent-id verify kernel; swap in the LSH candidate table for the
    production curve, same downstream shape.

    Scale shape: cosines computed once (JVM-side), then a 4-row
    threshold table cross-joins as a broadcast — one pass over the
    pair table produces the whole curve; comparisons are on the
    ROUND(,6) value both engines share."""
    e = t(spark, sf_dir, "embeddings")
    a = e.alias("a")
    b = e.alias("b")
    pairs = a.join(b, F.col("b.vec_id") == F.col("a.vec_id") + 1).select(
        _cosine_col(F.col("a.embedding"), F.col("b.embedding")).alias("cosine")
    )
    th = literal_df(e.sparkSession,
        [(0.5,), (0.7,), (0.8,), (0.9,)], "thr double"
    )
    return (
        pairs.crossJoin(F.broadcast(th))
        .groupBy("thr")
        .agg(
            F.count(F.when(F.col("cosine") >= F.col("thr"), 1))
            .cast("bigint")
            .alias("n_pairs")
        )
    )


@query(
    "source_contamination_matrix",
    oracle="""
    WITH fp AS (
      SELECT md5(substring(lower(trim(text)), 1, 64)) AS dg, source, doc_id
      FROM documents
    )
    SELECT a.source AS source_a, b.source AS source_b,
           COUNT(*) AS n_dup_pairs,
           CAST(COUNT(DISTINCT a.dg) AS BIGINT) AS n_shared_texts
    FROM fp a JOIN fp b
      ON b.dg = a.dg AND (a.source < b.source
                          OR (a.source = b.source AND a.doc_id < b.doc_id))
    GROUP BY a.source, b.source
    """,
)
def source_contamination_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source duplication forensics: for every source pair, how
    many document pairs share a normalized 64-char prefix fingerprint
    (doc_fingerprint's md5_prefix64 — the shared-boilerplate/header
    signal) and how many distinct fingerprints are involved — the
    "which scrape re-crawled which" matrix that decides source-level
    dedup ordering and provenance priority at ingestion time.  Swap
    the fingerprint for the full digest for strict exact-dup pairs.

    Scale shape: the self-join keys on the content digest — only
    (digest, source, id) triples shuffle, never bodies, and the join
    volume is sum over dup groups of m², bounded by the duplicate rate
    (the all-pairs-of-everything shape never appears).  The ordered
    source/id predicate keeps every unordered pair exactly once."""
    fp = t(spark, sf_dir, "documents").select(
        F.expr(
            "MD5(CAST(SUBSTRING(LOWER(TRIM(text)), 1, 64) AS BINARY))"
        ).alias("dg"),
        "source",
        "doc_id",
    )
    a = fp.alias("a")
    b = fp.alias("b")
    return (
        a.join(
            b,
            (F.col("b.dg") == F.col("a.dg"))
            & (
                (F.col("a.source") < F.col("b.source"))
                | (
                    (F.col("a.source") == F.col("b.source"))
                    & (F.col("a.doc_id") < F.col("b.doc_id"))
                )
            ),
        )
        .groupBy(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_dup_pairs"),
            F.countDistinct("a.dg").cast("bigint").alias("n_shared_texts"),
        )
    )


@query(
    "minhash_estimate_calibration",
    oracle=f"""
    WITH sh AS ({_DUCK_SHINGLE_DOCS}
    ), sig AS (
      SELECT doc_id,
             {', '.join(f"list_min(list_transform(list_transform(shingles, w -> {_duck_h32('w', 0)}), h -> ({_MH_A[s]} * h + {_MH_B[s]}) % {_MH_P})) AS mh{s}" for s in range(_MINHASH_K))}
      FROM sh
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           ROUND(CAST(len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE)
                 / len(list_distinct(sa.shingles || sb.shingles)), 6) AS true_jaccard,
           ROUND(({' + '.join(f"CASE WHEN a.mh{s} = b.mh{s} THEN 1 ELSE 0 END" for s in range(_MINHASH_K))})
                 / {float(_MINHASH_K)}, 6) AS est_jaccard
    FROM sig a JOIN sig b ON b.doc_id = a.doc_id + 1
    JOIN sh sa ON sa.doc_id = a.doc_id
    JOIN sh sb ON sb.doc_id = b.doc_id
    """,
)
def minhash_estimate_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signature calibration report: for adjacent-id doc pairs, the
    TRUE shingle Jaccard next to the MinHash-estimated one (matching
    signature components / k) — the diagnostic that justifies the
    k={_MINHASH_K} signature size before trusting LSH candidate
    generation on a new corpus (estimator std is sqrt(j(1-j)/k)).

    Scale shape: signatures and shingles are both scan projections;
    the adjacent-id blocking keeps the comparison linear, exactly as
    dedup_ngram_jaccard's verify kernel."""
    docs = t(spark, sf_dir, "documents")
    sh = _shingle_docs(docs)
    sig = _minhash_signatures(docs)
    a = sig.alias("a")
    b = sig.alias("b")
    sa = sh.alias("sa")
    sb = sh.alias("sb")
    est = sum(
        F.when(F.col(f"a.mh{s}") == F.col(f"b.mh{s}"), 1).otherwise(0)
        for s in range(_MINHASH_K)
    ) / float(_MINHASH_K)
    return (
        a.join(b, F.col("b.doc_id") == F.col("a.doc_id") + 1)
        .join(sa, F.col("sa.doc_id") == F.col("a.doc_id"))
        .join(sb, F.col("sb.doc_id") == F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.round(
                F.size(F.array_intersect("sa.shingles", "sb.shingles")).cast("double")
                / F.size(F.array_union("sa.shingles", "sb.shingles")),
                6,
            ).alias("true_jaccard"),
            F.round(est, 6).alias("est_jaccard"),
        )
    )

dedup_minhash_signature.__doc__ = (dedup_minhash_signature.__doc__ or '').replace('{_MINHASH_K}', str(_MINHASH_K))  # fill plan-constant into help()

dedup_simhash.__doc__ = (dedup_simhash.__doc__ or '').replace('{_SIMHASH_BITS}', str(_SIMHASH_BITS))  # fill plan-constant into help()

knn_join_batch.__doc__ = (knn_join_batch.__doc__ or '').replace('{_KNN_K}', str(_KNN_K))  # fill plan-constant into help()

minhash_estimate_calibration.__doc__ = (minhash_estimate_calibration.__doc__ or '').replace('{_MINHASH_K}', str(_MINHASH_K))  # fill plan-constant into help()


# ------------------------------------------ simhash hamming-radius join

_SH64_BITS = 60  # one h60 digest per word supplies all 60 sign bits
_SH64_BANDS = 4  # 15-bit pigeonhole blocks: hamming<=3 => >=1 equal block
_SH64_RADIUS = 3


def _simhash60_fp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Staged 60-bit SimHash fingerprints (doc_id, fp): one h60 digest
    per word (computed ONCE, then 60 bit-tests of the same value — not
    60 digest passes), sign-summed per bit.  localCheckpoint'd because
    the hamming join reads it on both sides (the LSH staging
    precedent: never let a self-join duplicate the digest pass)."""
    from instructions_mr_spark.queries._util import spark_h60

    words = (
        t(spark, sf_dir, "documents")
        .repartition(spark.sparkContext.defaultParallelism)
        .selectExpr("doc_id", "split(text, ' ') AS words")
        .filter(F.size("words") >= 1)
        .selectExpr("doc_id", f"TRANSFORM(words, w -> {spark_h60('w', 7)}) AS hs")
    )
    bit_terms = " + ".join(
        f"(CASE WHEN AGGREGATE(hs, 0, (acc, h) -> acc + "
        f"CASE WHEN (SHIFTRIGHT(h, {b}) & 1) = 1 THEN 1 ELSE -1 END) > 0 "
        f"THEN CAST({1 << b} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
        for b in range(_SH64_BITS)
    )
    fp = words.selectExpr("doc_id", f"{bit_terms} AS fp")
    return supersede_checkpoint("simhash60_fp", fp)


def _duck_simhash60() -> str:
    from instructions_mr_spark.queries._util import duck_h60

    bit_terms = " + ".join(
        f"(CASE WHEN list_sum(list_transform(hs, h -> "
        f"CASE WHEN ((h >> {b}) & 1) = 1 THEN 1 ELSE -1 END)) > 0 "
        f"THEN CAST({1 << b} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
        for b in range(_SH64_BITS)
    )
    return f"""
    toks AS (
      SELECT doc_id, string_split(text, ' ') AS words FROM documents
      WHERE len(string_split(text, ' ')) >= 1
    ),
    hashed AS (
      SELECT doc_id, list_transform(words, w -> {duck_h60('w', 7)}) AS hs
      FROM toks
    ),
    fp AS (SELECT doc_id, {bit_terms} AS fp FROM hashed)
    """


@query(
    "dedup_simhash_hamming",
    oracle=f"""
    WITH {_duck_simhash60()},
    bands AS (
      SELECT doc_id, fp, b AS band, (fp >> (b * 15)) & 32767 AS key
      FROM fp, LATERAL (SELECT unnest([0, 1, 2, 3]) AS b) s
    )
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(bit_count(xor(a.fp, b.fp)) AS BIGINT) AS hamming
    FROM bands a JOIN bands b
      ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
    WHERE bit_count(xor(a.fp, b.fp)) <= {_SH64_RADIUS}
    """,
)
def dedup_simhash_hamming(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup PAIRS via pigeonhole-blocked hamming join —
    the step dedup_simhash (fingerprints only) stops short of.  A
    {_SH64_BITS}-bit fingerprint (sign-sum of one 60-bit word digest
    per bit) splits into {_SH64_BANDS} 15-bit blocks; any pair within
    hamming radius {_SH64_RADIUS} must agree on >=1 whole block
    (pigeonhole), so candidate generation is an EQUI-join on
    (block_idx, block_value) — never an all-pairs scan — and only
    candidates pay the bit_count verify.  This is the Google
    near-duplicate-detection blocking scheme (Manku et al., WWW'07)
    re-expressed as a DataFrame equi-join.

    Scale shape: fingerprints are staged once (localCheckpoint — the
    self-join would otherwise recompute the digest pass per side);
    band rows are (int64 doc_id, int band, int64 key, int64 fp) — no
    strings, no arrays on the exchange; 15-bit blocks keep bucket
    sizes ~n/32768 per band so the join fan-out stays near-linear.
    At 100 TB: widen to 64-bit fingerprints + 16-bit blocks and
    pre-partition the staged table by block value.  Pairs at radius 0
    are exact-text or permutation dups; radius 1-3 are edit-level
    near-dups.  Reference has no dedup at all (SURVEY §2.6)."""
    fp = _simhash60_fp(spark, sf_dir)
    bands = fp.select(
        "doc_id",
        "fp",
        F.explode(F.expr("sequence(0, 3)")).alias("band"),
    ).withColumn("key", F.expr("SHIFTRIGHT(fp, band * 15) & 32767"))
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.expr("CAST(bit_count(a.fp ^ b.fp) AS BIGINT)").alias("hamming"),
        )
        .filter(F.col("hamming") <= _SH64_RADIUS)
        .distinct()
    )


# ------------------------------------- CCNet-style line-frequency dedup

_LINE_DF_MIN_DROP = 2  # drop a paragraph EVERYWHERE once it appears in >= 2 docs


@query(
    "dedup_line_frequency",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ), paras AS (
      SELECT doc_id, i AS para_idx,
             array_to_string(w[(i-1)*{_PARA_W}+1 : i*{_PARA_W}], ' ') AS para
      FROM toks,
           LATERAL (SELECT unnest(generate_series(
             1, CAST(ceil(len(w) / {_PARA_W}.0) AS BIGINT))) AS i) s
    ), keyed AS (
      SELECT doc_id, para_idx, para,
             ('0x' || substr(md5(para || '#31'), 1, 15))::BIGINT AS para_h
      FROM paras
    ), freq AS (
      SELECT para_h, COUNT(DISTINCT doc_id) AS df
      FROM keyed GROUP BY para_h
    )
    SELECT k.doc_id,
           COUNT(*) AS n_paras,
           CAST(SUM(CASE WHEN f.df >= {_LINE_DF_MIN_DROP} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_dropped,
           md5(COALESCE(string_agg(
             CASE WHEN f.df < {_LINE_DF_MIN_DROP} THEN k.para END,
             ' ' ORDER BY k.para_idx), '')) AS cleaned_md5
    FROM keyed k JOIN freq f USING (para_h)
    GROUP BY k.doc_id
    """,
)
def dedup_line_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style line-frequency dedup: a paragraph that appears in
    >= {_LINE_DF_MIN_DROP} distinct documents is boilerplate and is
    removed from EVERY document (headers, licenses, nav bars) — the
    drop-everywhere policy, vs dedup_paragraph's keep-first-occurrence
    (both exist in production pipelines; CCNet/RefinedWeb use this
    one for line-level cleanup because keeping one copy of a nav bar
    is still noise).  Paragraph := non-overlapping {_PARA_W}-word
    window (testdata has no newlines; real data splits on '\\n').

    Scale shape: explode once; the document-frequency count groups by
    the paragraph's portable 60-bit DIGEST (int64 on the exchange,
    never paragraph text — the r7 span/url digest convention applied
    from day one); the verdict join back is digest-keyed; doc
    reassembly is one groupBy(doc_id) with an order-by-index
    string_agg.  No self-join, no window over the corpus.  A
    same-paragraph repeat WITHIN one doc has df=1 and is kept —
    in-doc repetition is quality_repetition's job, not dedup's."""
    from instructions_mr_spark.queries._util import spark_h60

    d = t(spark, sf_dir, "documents")
    toked = d.select("doc_id", F.split("text", " ").alias("w"))
    n_paras = F.ceil(F.size("w") / F.lit(float(_PARA_W)))
    para_arr = F.transform(
        F.sequence(F.lit(1), n_paras),
        lambda i: F.struct(
            i.alias("para_idx"),
            F.array_join(F.slice("w", (i - 1) * _PARA_W + 1, _PARA_W), " ").alias(
                "para"
            ),
        ),
    )
    keyed = (
        toked.select("doc_id", F.explode(para_arr).alias("p"))
        .select(
            "doc_id",
            F.col("p.para_idx").alias("para_idx"),
            F.col("p.para").alias("para"),
        )
        .withColumn("para_h", F.expr(spark_h60("para", 31)))
    )
    freq = keyed.groupBy("para_h").agg(F.countDistinct("doc_id").alias("df"))
    joined = keyed.join(freq, "para_h").withColumn(
        "dropped", F.col("df") >= _LINE_DF_MIN_DROP
    )
    return joined.groupBy("doc_id").agg(
        F.count("*").alias("n_paras"),
        F.sum(F.when(F.col("dropped"), 1).otherwise(0)).alias("n_dropped"),
        F.md5(
            F.coalesce(
                F.array_join(
                    F.transform(
                        F.array_sort(
                            F.collect_list(
                                F.when(
                                    ~F.col("dropped"),
                                    F.struct("para_idx", "para"),
                                )
                            )
                        ),
                        lambda s: s.para,
                    ),
                    " ",
                ),
                F.lit(""),
            )
        ).alias("cleaned_md5"),
    )


dedup_simhash_hamming.__doc__ = (
    (dedup_simhash_hamming.__doc__ or "")
    .replace("{_SH64_BITS}", str(_SH64_BITS))
    .replace("{_SH64_BANDS}", str(_SH64_BANDS))
    .replace("{_SH64_RADIUS}", str(_SH64_RADIUS))
)
dedup_line_frequency.__doc__ = (
    (dedup_line_frequency.__doc__ or "")
    .replace("{_LINE_DF_MIN_DROP}", str(_LINE_DF_MIN_DROP))
    .replace("{_PARA_W}", str(_PARA_W))
)


# ----------------------------------- simhash hamming calibration


@query(
    "simhash_hamming_calibration",
    oracle=f"""
    WITH {_duck_simhash60()},
    wsets AS (
      SELECT doc_id, list_distinct(string_split(text, ' ')) AS ws FROM documents
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(bit_count(xor(a.fp, b.fp)) AS BIGINT) AS hamming,
           CAST((len(list_intersect(wa.ws, wb.ws)) * 1000000)
                // len(list_distinct(wa.ws || wb.ws)) AS BIGINT)
             AS true_jaccard_e6
    FROM fp a JOIN fp b ON b.doc_id = a.doc_id + 1
    JOIN wsets wa ON wa.doc_id = a.doc_id
    JOIN wsets wb ON wb.doc_id = b.doc_id
    """,
)
def simhash_hamming_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash calibration report — the diagnostic that picks
    dedup_simhash_hamming's radius before trusting it on a new
    corpus: for adjacent-id doc pairs, the fingerprint hamming
    distance next to the TRUE word-set Jaccard (simhash is a
    bag-of-words signature, so word-set similarity is its ground
    truth, emitted as true_jaccard_e6 integer units — tie-safety
    convention).  Plotting hamming vs jaccard shows which radius
    captures which similarity band — the twin of
    minhash_estimate_calibration for the hamming family.

    Scale shape: fingerprints come from the SAME staged table the
    hamming join uses (one digest pass); adjacent-id blocking keeps
    the comparison linear; word sets are scan projections joined back
    by doc id."""
    fp = _simhash60_fp(spark, sf_dir)
    wsets = t(spark, sf_dir, "documents").select(
        "doc_id", F.array_distinct(F.split("text", " ")).alias("ws")
    )
    a, b = fp.alias("a"), fp.alias("b")
    wa, wb = wsets.alias("wa"), wsets.alias("wb")
    return (
        a.join(b, F.col("b.doc_id") == F.col("a.doc_id") + 1)
        .join(wa, F.col("wa.doc_id") == F.col("a.doc_id"))
        .join(wb, F.col("wb.doc_id") == F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.expr("CAST(bit_count(a.fp ^ b.fp) AS BIGINT)").alias("hamming"),
            F.expr(
                "CAST((CAST(size(array_intersect(wa.ws, wb.ws)) AS BIGINT)"
                " * 1000000) div size(array_union(wa.ws, wb.ws)) AS BIGINT)"
            ).alias("true_jaccard_e6"),
        )
    )


_TRUNC_DIMS = 16  # matryoshka prefix length under evaluation

_EVAL_DOT_TRUNC = f"""
    ROUND(
      list_reduce(list_transform(range(1, {_TRUNC_DIMS} + 1),
                  i -> CAST(q.qemb[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)),
                  (a, b) -> a + b)
      / (sqrt(list_reduce(list_transform(q.qemb[1:{_TRUNC_DIMS}], x -> CAST(x AS DOUBLE) * x), (a,b) -> a+b))
         * sqrt(list_reduce(list_transform(e.embedding[1:{_TRUNC_DIMS}], x -> CAST(x AS DOUBLE) * x), (a,b) -> a+b))),
    6)
"""


@query(
    "ann_recall_truncated_dims",
    oracle=f"""
    WITH q AS (
      SELECT vec_id AS qid, embedding AS qemb
      FROM embeddings WHERE vec_id < {_ANN_EVAL_Q}
    ),
    scored AS (
      SELECT q.qid, e.vec_id,
             {_EVAL_DOT} AS cos_full,
             {_EVAL_DOT_TRUNC} AS cos_trunc
      FROM embeddings e, q
      WHERE e.vec_id <> q.qid
    ),
    ftop AS (
      SELECT qid, vec_id,
             ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos_full DESC, vec_id) AS r
      FROM scored
    ),
    ttop AS (
      SELECT qid, vec_id,
             ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos_trunc DESC, vec_id) AS r
      FROM scored
    ),
    hits AS (
      SELECT f.qid, COUNT(*) AS n_hits
      FROM (SELECT qid, vec_id FROM ftop WHERE r <= {_ANN_EVAL_K}) f
      JOIN (SELECT qid, vec_id FROM ttop WHERE r <= {_ANN_EVAL_K}) x
        ON x.qid = f.qid AND x.vec_id = f.vec_id
      GROUP BY f.qid
    )
    SELECT q.qid, CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,
           CAST({_ANN_EVAL_K} AS BIGINT) AS k
    FROM q LEFT JOIN hits h ON h.qid = q.qid
    ORDER BY q.qid
    """,
)
def ann_recall_truncated_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka truncation eval: how much top-10 recall survives
    ranking by only the FIRST 16 of 64 embedding dims — the
    measurement behind MRL-style 'store a prefix, rerank with the
    full vector' deployments (4x memory/bandwidth cut if recall
    holds).  Same fixed 16-probe, all-integer (qid, n_hits, k)
    contract as the other ANN recall evals, so the three queries
    together are the index-design report.

    Scale shape: one 16n narrow scored pass computing both cosines
    (the truncated dot is a slice of the same zip_with); two
    WindowGroupLimit rankings; embeddings never ride an exchange."""
    from pyspark.sql import Window

    e = t(spark, sf_dir, "embeddings")
    qs = e.filter(F.col("vec_id") < _ANN_EVAL_Q).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qemb")
    )
    scored = supersede_checkpoint(
        "ann_eval_scored_trunc",
        e.crossJoin(F.broadcast(qs))
        .filter(F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            "vec_id",
            _cosine_col(F.col("qemb"), F.col("embedding")).alias("cos_full"),
            _cosine_col(
                F.slice(F.col("qemb"), 1, _TRUNC_DIMS),
                F.slice(F.col("embedding"), 1, _TRUNC_DIMS),
            ).alias("cos_trunc"),
        )
        ,
    )
    wf = Window.partitionBy("qid").orderBy(F.col("cos_full").desc(), F.col("vec_id"))
    wt = Window.partitionBy("qid").orderBy(F.col("cos_trunc").desc(), F.col("vec_id"))
    ftop = (
        scored.withColumn("r", F.row_number().over(wf))
        .filter(F.col("r") <= _ANN_EVAL_K)
        .select("qid", "vec_id")
    )
    ttop = (
        scored.withColumn("r", F.row_number().over(wt))
        .filter(F.col("r") <= _ANN_EVAL_K)
        .select("qid", "vec_id")
    )
    hits = ftop.join(ttop, ["qid", "vec_id"]).groupBy("qid").agg(
        F.count(F.lit(1)).alias("n_hits")
    )
    return (
        qs.select("qid")
        .join(hits, "qid", "left")
        .select(
            "qid",
            F.coalesce("n_hits", F.lit(0)).cast("long").alias("n_hits"),
            F.lit(_ANN_EVAL_K).cast("long").alias("k"),
        )
        .orderBy("qid")
    )


_SSJ_T_E6 = 600000  # Jaccard threshold 0.6 in e6 integer units


@query(
    "set_sim_join_prefix",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, list_distinct(string_split(text, ' ')) AS ws
      FROM documents WHERE doc_id % 10 = 0
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST((len(list_intersect(a.ws, b.ws)) * 1000000)
                // len(list_distinct(a.ws || b.ws)) AS BIGINT) AS jaccard_e6
    FROM d a JOIN d b ON a.doc_id < b.doc_id
    WHERE (len(list_intersect(a.ws, b.ws)) * 1000000)
          // len(list_distinct(a.ws || b.ws)) >= {_SSJ_T_E6}
    """,
)
def set_sim_join_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT set-similarity join by PREFIX FILTERING (Chaudhuri et
    al.'s SSJoin / Bayardo's All-Pairs / PPJoin family) — the
    deterministic sibling of MinHash-LSH: order every document's
    tokens by ascending global frequency (rarest first); two sets
    with Jaccard >= t MUST share a token among each one's first
    n - ceil(t*n) + 1 tokens, so the candidate join keys on PREFIX
    tokens only and provably misses nothing (LSH trades exactly this
    guarantee for constant signature size).  Candidates verify with
    the exact intersection; output is jaccard_e6 integer units.  Runs
    on the doc_id % 10 slice so the brute-force oracle stays
    tractable at sweep scale.

    Scale shape: token frequencies are one aggregate broadcast back;
    the prefix table carries (token, doc_id) pairs whose volume the
    rarest-first ordering SKEWS AWAY from hot tokens (the whole
    point: stopwords never land in a short prefix); candidate pairs
    dedupe as bare id pairs; word sets join back by id for the one
    verify — the narrow-exchange convention end to end."""
    from pyspark.sql import Window

    docs = t(spark, sf_dir, "documents").filter(F.col("doc_id") % 10 == 0)
    d = docs.select(
        "doc_id", F.array_distinct(F.split("text", " ")).alias("ws")
    )
    d = supersede_checkpoint("ssj_wordsets", d)
    tok = d.select("doc_id", F.explode("ws").alias("w"), F.size("ws").alias("n"))
    freq = tok.groupBy("w").agg(F.count(F.lit(1)).alias("f"))
    ranked = (
        tok.join(freq, "w")
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("doc_id").orderBy("f", "w")
            ),
        )
        # prefix length n - floor(0.6n) + 1: one token LONGER than the
        # tight n - ceil(0.6n) + 1 bound whenever 3n/5 isn't integral
        # — conservative (extra candidates, zero missed pairs), and
        # floor(3n/5) is one truncating div on both engines
        .filter(F.col("rn") <= F.col("n") - F.expr("(3 * n) div 5") + 1)
        .select("w", "doc_id")
    )
    a, b = ranked.alias("a"), ranked.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.w") == F.col("b.w"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
    wa = d.select(F.col("doc_id").alias("doc_a"), F.col("ws").alias("ws_a"))
    wb = d.select(F.col("doc_id").alias("doc_b"), F.col("ws").alias("ws_b"))
    return (
        cand.join(wa, "doc_a")
        .join(wb, "doc_b")
        .selectExpr(
            "doc_a",
            "doc_b",
            "CAST((CAST(size(array_intersect(ws_a, ws_b)) AS BIGINT) * 1000000)"
            " div size(array_union(ws_a, ws_b)) AS BIGINT) AS jaccard_e6",
        )
        .filter(F.col("jaccard_e6") >= _SSJ_T_E6)
    )


@query(
    "dedup_prefix_suffix_block",
    oracle="""
    WITH d AS (
      SELECT doc_id,
             ('0x' || substr(md5(left(text, 32) || '#21'), 1, 15))::BIGINT
               AS pre_d,
             ('0x' || substr(md5(right(text, 32) || '#22'), 1, 15))::BIGINT
               AS suf_d
      FROM documents
    ),
    pre AS (SELECT pre_d, MIN(doc_id) AS pre_grp FROM d GROUP BY 1),
    suf AS (SELECT suf_d, MIN(doc_id) AS suf_grp FROM d GROUP BY 1)
    SELECT d.doc_id, pre.pre_grp, suf.suf_grp,
           CAST(pre.pre_grp < d.doc_id AS BOOLEAN) AS pre_dup,
           CAST(suf.suf_grp < d.doc_id AS BOOLEAN) AS suf_dup
    FROM d JOIN pre USING (pre_d) JOIN suf USING (suf_d)
    """,
)
def dedup_prefix_suffix_block(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix/suffix blocking for near-duplicate candidate generation:
    every document keyed by the 60-bit digest of its first and last
    32 characters, with each block electing its minimum doc_id as
    representative — two boilerplate-heavy documents that share an
    opening banner or a closing footer land in the same block even
    when their middles differ, which is the cheap O(n) screen run
    BEFORE MinHash when a corpus is known to be template-polluted.
    Emits both group representatives and the 'I am not my block's
    first occurrence' flags per document.

    Scale shape: two digest-keyed aggregates and two joins back, all
    keyed on 60-bit integers — document bodies never shuffle (the
    house digest-only convention); block election is the same keyed
    argmin as dedup_exact."""
    from instructions_mr_spark.queries._util import spark_h60

    d = t(spark, sf_dir, "documents").select(
        "doc_id",
        F.expr(spark_h60("left(text, 32)", 21)).alias("pre_d"),
        F.expr(spark_h60("right(text, 32)", 22)).alias("suf_d"),
    )
    pre = d.groupBy("pre_d").agg(F.min("doc_id").alias("pre_grp"))
    suf = d.groupBy("suf_d").agg(F.min("doc_id").alias("suf_grp"))
    return (
        d.join(pre, "pre_d")
        .join(suf, "suf_d")
        .select(
            "doc_id",
            "pre_grp",
            "suf_grp",
            (F.col("pre_grp") < F.col("doc_id")).alias("pre_dup"),
            (F.col("suf_grp") < F.col("doc_id")).alias("suf_dup"),
        )
    )


@query(
    "knn_label_vote_accuracy",
    oracle="""
    WITH q AS (
      SELECT vec_id, label,
             list_transform(embedding,
               x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000 + 0.5) AS BIGINT))
               AS qe
      FROM embeddings
    ),
    probes AS (SELECT * FROM q WHERE vec_id % 50 = 0 AND vec_id < 3200),
    scored AS (
      SELECT p.vec_id AS probe_id, p.label AS probe_label,
             c.vec_id AS cand_id, c.label AS cand_label,
             list_sum(list_transform(generate_series(1, len(p.qe)),
               i -> p.qe[i] * c.qe[i])) AS dot
      FROM probes p JOIN q c ON c.vec_id <> p.vec_id
    ),
    top5 AS (
      SELECT probe_id, probe_label, cand_label
      FROM (
        SELECT probe_id, probe_label, cand_label,
               ROW_NUMBER() OVER (PARTITION BY probe_id
                                  ORDER BY dot DESC, cand_id) AS rn
        FROM scored
      ) WHERE rn <= 5
    ),
    votes AS (
      SELECT probe_id, probe_label, cand_label, COUNT(*) AS c
      FROM top5 GROUP BY 1, 2, 3
    ),
    pred AS (
      SELECT probe_id, probe_label,
             arg_max(cand_label, c * 1000 - cand_label) AS pred_label
      FROM votes GROUP BY 1, 2
    )
    SELECT probe_label,
           CAST(COUNT(*) AS BIGINT) AS n_probes,
           CAST(SUM(CASE WHEN pred_label = probe_label THEN 1 ELSE 0 END)
                AS BIGINT) AS n_correct,
           CAST(SUM(CASE WHEN pred_label = probe_label THEN 1 ELSE 0 END)
                * 1000000 // COUNT(*) AS BIGINT) AS acc_e6
    FROM pred GROUP BY probe_label
    """,
)
def knn_label_vote_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out kNN classification accuracy over the embedding
    space: every 50th vector becomes a probe, its 5 nearest neighbors
    (exact 1e3-quantized integer dot products, self excluded, ties by
    candidate id) vote on its label (majority, ties to the smallest
    label via the packed c*1000 - label argmax), and per-class
    accuracy is the readout — the standard 'are these embeddings even
    separable' sanity check run before training anything on them.

    Packed-key envelope (the agg_argminmax convention): the argmax
    key c*1000 - label is a total order ONLY while labels are
    non-negative and < 1000 — the vote count c <= 5 and the testdata
    label domain is [0, 10), so the envelope holds with 2 orders of
    magnitude headroom; a label domain reaching 1000 (or negative)
    must widen the multiplier on BOTH engines (the DuckDB oracle
    shares the same packing, so a silent overflow would corrupt both
    sides identically — this docstring is the guard).

    Scale shape: probes broadcast against the corpus scan (the
    knn_join_batch pattern — the corpus never shuffles); the top-5
    window partitions by probe id.  Brute force IS the contract here
    (it is the ground truth the ann_recall_* harnesses compare
    against); the production path at 100 TB is sim_search_ivf."""
    from pyspark.sql import Window

    from instructions_mr_spark.queries._util import t as _t

    q = _t(spark, sf_dir, "embeddings").select(
        "vec_id",
        "label",
        F.expr(
            "transform(embedding,"
            " x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000 + 0.5) AS BIGINT))"
        ).alias("qe"),
    )
    probes = q.filter(
        (F.col("vec_id") % 50 == 0) & (F.col("vec_id") < 3200)
    ).select(
        F.col("vec_id").alias("probe_id"),
        F.col("label").alias("probe_label"),
        F.col("qe").alias("pe"),
    )
    scored = (
        q.crossJoin(F.broadcast(probes))
        .filter(F.col("vec_id") != F.col("probe_id"))
        .select(
            "probe_id",
            "probe_label",
            F.col("vec_id").alias("cand_id"),
            F.col("label").alias("cand_label"),
            F.expr(
                "aggregate(zip_with(pe, qe, (a, b) -> a * b),"
                " CAST(0 AS BIGINT), (acc, x) -> acc + x)"
            ).alias("dot"),
        )
    )
    w = Window.partitionBy("probe_id").orderBy(
        F.col("dot").desc(), F.col("cand_id").asc()
    )
    top5 = scored.select(
        "probe_id",
        "probe_label",
        "cand_label",
        F.row_number().over(w).alias("rn"),
    ).filter(F.col("rn") <= 5)
    votes = top5.groupBy("probe_id", "probe_label", "cand_label").agg(
        F.count(F.lit(1)).alias("c")
    )
    pred = votes.groupBy("probe_id", "probe_label").agg(
        F.expr("max_by(cand_label, c * 1000 - cand_label)").alias(
            "pred_label"
        )
    )
    return pred.groupBy("probe_label").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_probes"),
        F.sum(
            F.when(F.col("pred_label") == F.col("probe_label"), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("n_correct"),
        F.expr(
            "CAST(SUM(CASE WHEN pred_label = probe_label THEN 1 ELSE 0 END)"
            " * 1000000 DIV COUNT(1) AS BIGINT)"
        ).alias("acc_e6"),
    )


@query(
    "triplet_margin_stats",
    oracle="""
    WITH q AS (
      SELECT vec_id, label,
             list_transform(embedding,
               x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000 + 0.5) AS BIGINT))
               AS qe
      FROM embeddings
    ),
    probes AS (SELECT * FROM q WHERE vec_id % 50 = 0 AND vec_id < 3200),
    scored AS (
      SELECT p.vec_id AS probe_id, p.label AS probe_label,
             c.label AS cand_label,
             list_sum(list_transform(generate_series(1, len(p.qe)),
               i -> p.qe[i] * c.qe[i])) AS dot
      FROM probes p JOIN q c ON c.vec_id <> p.vec_id
    ),
    margins AS (
      SELECT probe_id, probe_label,
             MAX(CASE WHEN cand_label = probe_label THEN dot END)
               - MAX(CASE WHEN cand_label <> probe_label THEN dot END)
               AS margin
      FROM scored GROUP BY 1, 2
    )
    SELECT probe_label,
           CAST(COUNT(*) AS BIGINT) AS n_probes,
           CAST(SUM(margin) AS BIGINT) AS s_margin,
           CAST(SUM(CASE WHEN margin <= 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_violations
    FROM margins GROUP BY probe_label
    """,
)
def triplet_margin_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triplet-margin health of the embedding space: for every probe
    (each 50th vector), the hardest-positive similarity (best
    same-label dot) minus the hardest-negative similarity (best
    other-label dot), in exact 1e3-quantized integer units — a
    non-positive margin means the probe's nearest other-class point
    beats its own class, the exact failure a triplet/contrastive loss
    trains away, so per-class violation counts are the 'is this space
    metrically usable' readout (complementing knn_label_vote_accuracy,
    which only sees the top-5 consensus).

    Scale shape: probes broadcast against the corpus scan; the
    hardest-positive/negative reduce is ONE conditional MAX per probe
    — no window, no top-k sort."""
    from instructions_mr_spark.queries._util import t as _t

    q = _t(spark, sf_dir, "embeddings").select(
        "vec_id",
        "label",
        F.expr(
            "transform(embedding,"
            " x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000 + 0.5) AS BIGINT))"
        ).alias("qe"),
    )
    probes = q.filter(
        (F.col("vec_id") % 50 == 0) & (F.col("vec_id") < 3200)
    ).select(
        F.col("vec_id").alias("probe_id"),
        F.col("label").alias("probe_label"),
        F.col("qe").alias("pe"),
    )
    scored = (
        q.crossJoin(F.broadcast(probes))
        .filter(F.col("vec_id") != F.col("probe_id"))
        .select(
            "probe_id",
            "probe_label",
            F.col("label").alias("cand_label"),
            F.expr(
                "aggregate(zip_with(pe, qe, (a, b) -> a * b),"
                " CAST(0 AS BIGINT), (acc, x) -> acc + x)"
            ).alias("dot"),
        )
    )
    margins = scored.groupBy("probe_id", "probe_label").agg(
        (
            F.max(
                F.when(F.col("cand_label") == F.col("probe_label"), F.col("dot"))
            )
            - F.max(
                F.when(F.col("cand_label") != F.col("probe_label"), F.col("dot"))
            )
        ).alias("margin")
    )
    return margins.groupBy("probe_label").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_probes"),
        F.sum("margin").cast("bigint").alias("s_margin"),
        F.sum(F.when(F.col("margin") <= 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_violations"),
    )


# ================================================================ round 9
# MMR diversified retrieval + exact-duplicate vector audit.

_MMR_POOL = 20
_MMR_K = 5

# e6-integer cosine fragments (FLOOR(x*1e6 + 0.5) of the 6-dp-rounded
# double — identical rounding on both engines, negative-safe).
_CQ_E6_DUCK = f"CAST(FLOOR(({_DOT}) * 1000000 + 0.5) AS BIGINT)"


def _mmr_oracle() -> str:
    """Unrolled {K}-step MMR selection (the greedy_set_cover_sources
    oracle pattern): each step scores the remaining pool by
    rel - max-sim-to-picked (lambda = 1/2) and picks the argmax
    (ties to the smallest vec_id via ORDER BY ... LIMIT 1)."""
    pair_dot_e6 = """
    CAST(FLOOR(ROUND(
      list_reduce(list_transform(range(1, len(ea.embedding) + 1),
                  i -> CAST(ea.embedding[i] AS DOUBLE) * CAST(eb.embedding[i] AS DOUBLE)),
                  (a, b) -> a + b)
      / (sqrt(list_reduce(list_transform(ea.embedding, x -> CAST(x AS DOUBLE) * x), (a,b) -> a+b))
         * sqrt(list_reduce(list_transform(eb.embedding, x -> CAST(x AS DOUBLE) * x), (a,b) -> a+b))),
    6) * 1000000 + 0.5) AS BIGINT)
    """
    steps = []
    prev = "p1"
    for k in range(2, _MMR_K + 1):
        steps.append(f"""
    s{k} AS (
      SELECT c.vec_id, c.cq_e6,
             c.cq_e6 - MAX(s.s_e6) AS score
      FROM cand c JOIN sim s ON s.va = c.vec_id
      WHERE s.vb IN (SELECT vec_id FROM {prev})
        AND c.vec_id NOT IN (SELECT vec_id FROM {prev})
      GROUP BY c.vec_id, c.cq_e6
      ORDER BY score DESC, c.vec_id LIMIT 1
    ),
    p{k} AS (
      SELECT * FROM {prev}
      UNION ALL SELECT CAST({k} AS BIGINT), vec_id, cq_e6 FROM s{k}
    )""")
        prev = f"p{k}"
    return f"""
    WITH cand AS (
      SELECT e.vec_id, {_CQ_E6_DUCK} AS cq_e6
      FROM embeddings e, (SELECT embedding FROM embeddings WHERE vec_id = 0) q
      WHERE e.vec_id <> 0
      ORDER BY cq_e6 DESC, e.vec_id LIMIT {_MMR_POOL}
    ),
    sim AS (
      SELECT ea.vec_id AS va, eb.vec_id AS vb, {pair_dot_e6} AS s_e6
      FROM embeddings ea JOIN embeddings eb ON ea.vec_id <> eb.vec_id
      WHERE ea.vec_id IN (SELECT vec_id FROM cand)
        AND eb.vec_id IN (SELECT vec_id FROM cand)
    ),
    p1 AS (
      SELECT CAST(1 AS BIGINT) AS pick_rank, vec_id, cq_e6
      FROM cand ORDER BY cq_e6 DESC, vec_id LIMIT 1
    ),{','.join(steps)}
    SELECT pick_rank, vec_id, cq_e6 FROM {prev} ORDER BY pick_rank
    """


@query("mmr_diverse_topk", oracle=_mmr_oracle())
def mmr_diverse_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal-marginal-relevance diversified top-k: from the exact
    top-{pool} cosine candidates for the vec_id=0 query, greedily pick
    {k} results maximizing relevance - max-similarity-to-already-
    picked (the classic lambda = 1/2 MMR — equal weights, so an exact
    duplicate of a picked result always scores below ANY candidate
    whose distance to the picked set exceeds its relevance deficit;
    e6-quantized cosines keep both engines selecting identically;
    ties to the smallest id).  The
    retrieval-diversification step between ANN search and a RAG
    context window — near-duplicate hits waste context slots, MMR
    spends them on coverage.

    Scale shape: the candidate pool is a TakeOrdered top-{pool} off
    the brute-force scan (sim_search_topk's plan); everything after —
    the pool self-similarity matrix and {k} unrolled greedy steps —
    runs on a {pool}-row broadcast-sized table, so selection cost is
    independent of corpus size."""
    e = t(spark, sf_dir, "embeddings")
    qv = e.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("q"))
    cq_e6 = F.expr("CAST(FLOOR(cos6 * 1000000 + 0.5) AS BIGINT)")
    cand = supersede_checkpoint(
        "mmr_cand",
        (
            e.filter(F.col("vec_id") != 0)
            .crossJoin(F.broadcast(qv))
            .select(
                "vec_id",
                "embedding",
                _cosine_col(F.col("q"), F.col("embedding")).alias("cos6"),
            )
            .select("vec_id", "embedding", cq_e6.alias("cq_e6"))
            .orderBy(F.col("cq_e6").desc(), F.col("vec_id"))
            .limit(_MMR_POOL)
        ),
    )
    # norms hoisted per pool vector (see _norm_col): bit-identical s6,
    # the pool self-join pays one interpreted dot per pair, not three
    ca = cand.select(
        F.col("vec_id").alias("va"), F.col("embedding").alias("ea"),
        _norm_col(F.col("embedding")).alias("na"),
    )
    cb = cand.select(
        F.col("vec_id").alias("vb"), F.col("embedding").alias("eb"),
        _norm_col(F.col("embedding")).alias("nb"),
    )
    sim = (
        ca.join(cb, F.col("va") != F.col("vb"))
        .select(
            "va",
            "vb",
            _cosine_prenorm(
                F.col("ea"), F.col("eb"), F.col("na"), F.col("nb")
            ).alias("s6"),
        )
        .selectExpr("va", "vb", "CAST(FLOOR(s6 * 1000000 + 0.5) AS BIGINT) AS s_e6")
    )
    # Greedy selection as ONE higher-order fold over one collected row
    # (round 12; previously {_MMR_K}-1 chained anti-join + semi-join +
    # agg stage groups over a <= {_MMR_POOL}-row pool — all fixed
    # scheduling, ~3.3 s warm at sf0.1 for ~40k interpreted ops of
    # actual selection work).  Selection semantics are unchanged and
    # integer-exact: pick 1 maximizes (cq_e6, then smallest id) — the
    # struct sort on (-cq_e6, id) — and each later step maximizes
    # score = cq_e6 - max(s_e6 to picked) with the same smallest-id
    # tie, exactly the old MAX(struct(score, -vec_id, ...)).  The
    # collect_list order is irrelevant (filter/exists/greatest/sort
    # are order-independent), and every candidate has a sim row to
    # every picked vector (the pool self-join is complete), so the
    # running max starts from a sentinel below any e6 cosine.
    sims_1 = sim.agg(F.collect_list(F.struct("va", "vb", "s_e6")).alias("sims"))
    pool_1 = cand.select("vec_id", "cq_e6").agg(
        F.collect_list(F.struct("vec_id", "cq_e6")).alias("pool")
    )
    neg = "CAST(-4611686018427387904 AS BIGINT)"
    picked_arr = pool_1.crossJoin(sims_1).select(
        F.expr(
            f"""aggregate(
      sequence(2, {_MMR_K}),
      array(element_at(array_sort(transform(pool,
          c -> struct(-c.cq_e6 AS ns, c.vec_id AS v, c.cq_e6 AS c6))), 1)),
      (acc, step) -> CASE WHEN size(filter(pool,
              c -> NOT exists(acc, p -> p.v = c.vec_id))) = 0 THEN acc
        ELSE concat(acc, array(element_at(array_sort(transform(
          filter(pool, c -> NOT exists(acc, p -> p.v = c.vec_id)),
          c -> struct(
            -(c.cq_e6 - aggregate(
                filter(sims, s -> s.va = c.vec_id
                              AND exists(acc, p -> p.v = s.vb)),
                {neg},
                (m, s) -> greatest(m, s.s_e6))) AS ns,
            c.vec_id AS v, c.cq_e6 AS c6))), 1))) END
    ) AS picked"""
        )
    )
    return (
        picked_arr.select(F.posexplode("picked").alias("pos", "p"))
        .select(
            (F.col("pos") + 1).cast("bigint").alias("pick_rank"),
            F.col("p.v").alias("vec_id"),
            F.col("p.c6").alias("cq_e6"),
        )
        .orderBy("pick_rank")
    )


@query(
    "embedding_exact_dup",
    oracle="""
    WITH keyed AS (
      SELECT vec_id,
             md5(list_aggregate(list_transform(embedding,
                   x -> CAST(CAST(FLOOR(CAST(x AS DOUBLE) * 1000000 + 0.5) AS BIGINT)
                             AS VARCHAR)), 'string_agg', ',')) AS sig
      FROM embeddings
    ),
    grp AS (
      SELECT sig, COUNT(*) AS sz, MIN(vec_id) AS keeper
      FROM keyed GROUP BY sig
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_signatures,
           CAST(SUM(CASE WHEN sz > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dup_groups,
           CAST(SUM(CASE WHEN sz > 1 THEN sz - 1 ELSE 0 END) AS BIGINT)
             AS n_redundant,
           CAST(MAX(sz) AS BIGINT) AS max_group,
           CAST(COALESCE(SUM(CASE WHEN sz > 1 THEN keeper ELSE 0 END), 0)
               AS BIGINT) AS keeper_checksum
    FROM grp
    """,
)
def embedding_exact_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-exact duplicate VECTOR audit — dedup_exact's twin for the
    embedding table: vectors keyed by the md5 of their e6-quantized
    coordinate string (quantization makes the key identical across
    engines and float widths), grouped, and summarized as dup-group /
    redundant-row counts with a keeper-id checksum.  Run before any
    ANN build: exact-duplicate vectors waste index space and skew
    IVF cells.

    Scale shape: in-row signature (one md5 per vector, no shuffle of
    the float arrays — only the 32-char digest exchanges), one
    digest-keyed aggregate, a 1-row readout."""
    e = t(spark, sf_dir, "embeddings")
    sig = F.md5(
        F.expr(
            "array_join(transform(embedding,"
            " x -> CAST(CAST(FLOOR(CAST(x AS DOUBLE) * 1000000 + 0.5) AS BIGINT)"
            " AS STRING)), ',')"
        )
    )
    grp = (
        e.select("vec_id", sig.alias("sig"))
        .groupBy("sig")
        .agg(F.count(F.lit(1)).alias("sz"), F.min("vec_id").alias("keeper"))
    )
    return grp.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_signatures"),
        F.sum(F.when(F.col("sz") > 1, 1).otherwise(0)).cast("bigint").alias("n_dup_groups"),
        F.sum(F.when(F.col("sz") > 1, F.col("sz") - 1).otherwise(0)).cast("bigint").alias("n_redundant"),
        F.max("sz").cast("bigint").alias("max_group"),
        F.coalesce(
            F.sum(F.when(F.col("sz") > 1, F.col("keeper")).otherwise(0)), F.lit(0)
        ).cast("bigint").alias("keeper_checksum"),
    )


@query(
    "simhash_bit_bias_by_source",
    oracle=f"""
    WITH fp AS (
      SELECT source,
           {' + '.join(f"(CASE WHEN (list_sum(list_transform(words, w -> CASE WHEN (({_duck_h32('w', 99)} >> {b}) & 1) = 1 THEN 1 ELSE -1 END))) > 0 THEN {1 << b} ELSE 0 END)" for b in range(_SIMHASH_BITS))}
             AS simhash
      FROM (SELECT source, string_split(text, ' ') AS words FROM documents)
    ),
    bits AS (
      SELECT source, b.bit, (simhash >> b.bit) & 1 AS v
      FROM fp, (SELECT UNNEST(range(0, {_SIMHASH_BITS})) AS bit) b
    )
    SELECT source, CAST(bit AS BIGINT) AS bit,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(v) AS BIGINT) AS n_set,
           CAST(ABS(2 * SUM(v) - COUNT(*)) * 1000000 // COUNT(*) AS BIGINT)
             AS bias_e6
    FROM bits GROUP BY source, bit
    ORDER BY source, bit
    """,
)
def simhash_bit_bias_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash bit-bias profile per source: for each of the {B}
    fingerprint bits, how far the set-bit share deviates from the
    1/2 a diverse corpus produces (bias_e6 = |2*n_set - n| * 1e6 DIV
    n).  Independent random documents give near-zero bias on every
    bit; a source whose docs share template vocabulary drags many
    bits toward 0 or 1 — so a high-bias source is EXACTLY the one
    whose SimHash buckets will run hot in dedup_simhash_hamming (the
    skew this profile predicts before the join pays for it; the
    MinHash twin is lsh_bucket_stats).

    Scale shape: the per-doc fingerprint is in-row word-hash algebra
    on the scan; bits explode 16x; ONE (source, bit) aggregate —
    map-side combinable, bounded |sources| x 16 output."""
    words = t(spark, sf_dir, "documents").select(
        "source", F.split("text", " ").alias("words")
    )
    bit_terms = " + ".join(
        f"(CASE WHEN AGGREGATE(words, 0, (acc, w) -> acc + "
        f"CASE WHEN (SHIFTRIGHT({_spark_h32('w', 99)}, {b}) & 1) = 1 THEN 1 ELSE -1 END) > 0 "
        f"THEN {1 << b} ELSE 0 END)"
        for b in range(_SIMHASH_BITS)
    )
    fp = words.selectExpr("source", f"{bit_terms} AS simhash")
    bits = fp.select(
        "source",
        F.explode(F.sequence(F.lit(0), F.lit(_SIMHASH_BITS - 1))).alias("bit"),
        "simhash",
    ).selectExpr("source", "bit", "(SHIFTRIGHT(simhash, bit) & 1) AS v")
    return (
        bits.groupBy("source", "bit")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("v").cast("bigint").alias("n_set"),
            F.expr(
                "CAST(ABS(2 * SUM(v) - COUNT(*)) * 1000000 DIV COUNT(*)"
                " AS BIGINT)"
            ).alias("bias_e6"),
        )
        .selectExpr(
            "source", "CAST(bit AS BIGINT) AS bit", "n_docs", "n_set", "bias_e6"
        )
        .orderBy("source", "bit")
    )


_HN_PROBES = 16
_HN_K = 3


@query(
    "hard_negative_topk",
    oracle=f"""
    SELECT probe_id, probe_label, cand_id, cand_label, cosine, rnk FROM (
      SELECT p.vec_id AS probe_id, p.label AS probe_label,
             c.vec_id AS cand_id, c.label AS cand_label,
             {_KNN_PAIR_DOT} AS cosine,
             ROW_NUMBER() OVER (PARTITION BY p.vec_id
                                ORDER BY {_KNN_PAIR_DOT} DESC, c.vec_id) AS rnk
      FROM embeddings p JOIN embeddings c
        ON p.vec_id < {_HN_PROBES} AND c.label <> p.label
    ) WHERE rnk <= {_HN_K}
    ORDER BY probe_id, rnk
    """,
)
def hard_negative_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive training: for each probe
    vector (the per-batch anchor set, bounded at {_HN_PROBES}), the
    top-{_HN_K} most-similar vectors with a DIFFERENT label — the
    negatives that actually move an embedding model, vs the
    uninformative random negatives of negative_sampling_pairs.  Exact
    brute-force cosine (both engines fold the dot product
    left-to-right over the same element order, so the ROUND(...,6)
    values are identical; ranks tie-break on candidate id).

    Scale shape: the bounded probe batch broadcasts onto the corpus
    scan (the label-exclusion rides the join condition — nothing
    shuffles for it); per-probe top-k is one window already
    partitioned by probe.  For corpus-scale anchor sets swap the
    nested loop for the IVF cell join (sim_search_ivf_kmeans), same
    downstream window.

    Reference parity: no counterpart (the reference has no vector
    surface, SURVEY.md §2.6) — EXT training-data mandate."""
    from pyspark.sql import Window

    e = t(spark, sf_dir, "embeddings")
    probes = e.filter(F.col("vec_id") < _HN_PROBES).select(
        F.col("vec_id").alias("probe_id"),
        F.col("label").alias("probe_label"),
        F.col("embedding").alias("q"),
    )
    w = Window.partitionBy("probe_id").orderBy(F.col("cosine").desc(), F.col("cand_id"))
    return (
        e.crossJoin(F.broadcast(probes))
        .filter(F.col("label") != F.col("probe_label"))
        .select(
            "probe_id",
            "probe_label",
            F.col("vec_id").alias("cand_id"),
            F.col("label").alias("cand_label"),
            _cosine_col(F.col("q"), F.col("embedding")).alias("cosine"),
        )
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= _HN_K)
        .orderBy("probe_id", "rnk")
    )


# (bands, rows) configurations that tile the same 12 minhashes
_TUNE_CFGS = [(2, 6), (3, 4), (4, 3), (6, 2)]


def _tune_band_rows_duck() -> str:
    parts = []
    for b, r in _TUNE_CFGS:
        for band in range(b):
            key = " || '_' || ".join(f"mh{band * r + j}" for j in range(r))
            parts.append(
                f"SELECT doc_id, '{b}x{r}' AS cfg, {band} AS band,"
                f" {key} AS key FROM sigs"
            )
    return "\n      UNION ALL\n      ".join(parts)


@query(
    "lsh_band_tuning_curve",
    oracle=f"""
    WITH sigs AS (
      SELECT doc_id, {_minhash_cols_duck()} FROM ({_DUCK_SHINGLE_DOCS})
    ),
    bands AS (
      {_tune_band_rows_duck()}
    ),
    cand AS (
      SELECT DISTINCT a.cfg AS cfg, a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.cfg = b.cfg AND a.band = b.band AND a.key = b.key
      WHERE a.doc_id < b.doc_id
    ),
    pairs AS (SELECT DISTINCT doc_a, doc_b FROM cand),
    jac AS (
      SELECT doc_a, doc_b,
             ROUND(CAST(len(list_intersect(wa.ws, wb.ws)) AS DOUBLE)
                   / len(list_distinct(wa.ws || wb.ws)), 6) AS jaccard
      FROM pairs
      JOIN (SELECT doc_id, shingles AS ws FROM ({_DUCK_SHINGLE_DOCS})) wa
        ON pairs.doc_a = wa.doc_id
      JOIN (SELECT doc_id, shingles AS ws FROM ({_DUCK_SHINGLE_DOCS})) wb
        ON pairs.doc_b = wb.doc_id
    ),
    scored AS (
      SELECT cand.cfg, jac.jaccard >= {_LSH_THRESHOLD} AS hit
      FROM cand JOIN jac USING (doc_a, doc_b)
    ),
    per_cfg AS (
      SELECT cfg, CAST(COUNT(*) AS BIGINT) AS n_cand,
             CAST(SUM(CASE WHEN hit THEN 1 ELSE 0 END) AS BIGINT) AS n_true
      FROM scored GROUP BY cfg
    ),
    ref AS (SELECT n_true AS ref_true FROM per_cfg WHERE cfg = '6x2')
    SELECT cfg, n_cand, n_true,
           ROUND(CAST(n_true AS DOUBLE) / NULLIF(n_cand, 0), 6) AS precision_,
           ROUND(CAST(n_true AS DOUBLE) / NULLIF(ref.ref_true, 0), 6)
             AS recall_vs_most_sensitive
    FROM per_cfg, ref
    ORDER BY cfg
    """,
)
def lsh_band_tuning_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH band-tuning table: the SAME 12 minhashes tiled as 2x6,
    3x4, 4x3 and 6x2 (bands x rows), each scored for candidate
    volume, verified near-dups (Jaccard >= {_LSH_THRESHOLD}),
    precision, and recall relative to the most sensitive tiling (6x2
    — more bands with shorter keys fire on weaker similarity).  The
    s-curve trade made empirical on YOUR corpus: pick the config
    where recall is acceptable and candidate volume (the shuffle the
    verify stage pays) is lowest — the number-one knob a minhash
    dedup at 100 TB gets tuned by.

    Recall here is RELATIVE (vs 6x2's verified pairs), not absolute:
    the absolute denominator needs the all-pairs exact join this
    operator exists to avoid; relative recall ranks configs
    identically (documented envelope).

    Scale shape: signatures are in-row projections; each config's
    candidates come from bucketed band-key equi-joins (never
    all-pairs); the Jaccard verify joins shingle payloads back to the
    DISTINCT pair union across configs (each pair verified once);
    roll-up is 4 rows."""
    docs = t(spark, sf_dir, "documents")
    sigs = _minhash_signatures(docs)
    sigs = supersede_checkpoint("tune_sigs", sigs)
    band_frames = []
    for b, r in _TUNE_CFGS:
        for band in range(b):
            key = F.concat_ws(
                "_", *[F.col(f"mh{band * r + j}") for j in range(r)]
            )
            band_frames.append(
                sigs.select(
                    "doc_id",
                    F.lit(f"{b}x{r}").alias("cfg"),
                    F.lit(band).alias("band"),
                    key.alias("key"),
                )
            )
    bands = band_frames[0]
    for bf in band_frames[1:]:
        bands = bands.unionAll(bf)
    a = bands.select(
        "cfg", "band", "key", F.col("doc_id").alias("doc_a")
    )
    bb = bands.select(
        "cfg", "band", "key", F.col("doc_id").alias("doc_b")
    )
    cand = (
        a.join(bb, ["cfg", "band", "key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("cfg", "doc_a", "doc_b")
        .distinct()
    )
    cand = supersede_checkpoint("tune_cand", cand)
    pairs = cand.select("doc_a", "doc_b").distinct()
    sh = _shingle_docs(docs)
    wa = sh.select(F.col("doc_id").alias("doc_a"), F.col("shingles").alias("ws_a"))
    wb = sh.select(F.col("doc_id").alias("doc_b"), F.col("shingles").alias("ws_b"))
    jac = (
        pairs.join(wa, "doc_a")
        .join(wb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.size(F.array_intersect("ws_a", "ws_b")).cast("double")
                / F.size(F.array_distinct(F.concat("ws_a", "ws_b"))),
                6,
            ).alias("jaccard"),
        )
    )
    scored = cand.join(jac, ["doc_a", "doc_b"]).select(
        "cfg", (F.col("jaccard") >= _LSH_THRESHOLD).alias("hit")
    )
    per_cfg = scored.groupBy("cfg").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_cand"),
        F.sum(F.when(F.col("hit"), 1).otherwise(0)).cast("bigint").alias("n_true"),
    )
    ref = per_cfg.filter("cfg = '6x2'").select(
        F.col("n_true").alias("ref_true")
    )
    return (
        per_cfg.crossJoin(F.broadcast(ref))
        .selectExpr(
            "cfg",
            "n_cand",
            "n_true",
            "ROUND(CAST(n_true AS DOUBLE) / NULLIF(n_cand, 0), 6) AS precision_",
            "ROUND(CAST(n_true AS DOUBLE) / NULLIF(ref_true, 0), 6)"
            " AS recall_vs_most_sensitive",
        )
        .orderBy("cfg")
    )


_EPS_LEVELS = [5, 10, 20, 50]  # eps * 100: cos >= 0.95, 0.90, 0.80, 0.50


@query(
    "semdedup_eps_sweep",
    oracle=f"""
    WITH m AS (
      SELECT GREATEST(10, COUNT(*) // {_SEM_AUDIT_TARGET}) AS md
      FROM embeddings
    ),
    s AS (
      SELECT vec_id, embedding FROM embeddings, m WHERE vec_id % md = 0
    ),
    n AS (SELECT COUNT(*) AS ns FROM s),
    pr AS (
      SELECT ea.vec_id AS vec_a, eb.vec_id AS vec_b, {_PAIR_DOT} AS cos
      FROM s ea JOIN s eb ON ea.vec_id < eb.vec_id
    ),
    eps AS (SELECT UNNEST([{', '.join(str(x) for x in _EPS_LEVELS)}]) AS eps_e2)
    SELECT eps.eps_e2,
           CAST(SUM(CASE WHEN pr.cos >= 1 - eps.eps_e2 / 100.0
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_pairs,
           CAST(COUNT(DISTINCT CASE WHEN pr.cos >= 1 - eps.eps_e2 / 100.0
                    THEN pr.vec_b END) AS BIGINT) AS n_dropped,
           ROUND(1 - CAST(COUNT(DISTINCT CASE WHEN
                    pr.cos >= 1 - eps.eps_e2 / 100.0 THEN pr.vec_b END)
                    AS DOUBLE) / MAX(n.ns), 6) AS keep_rate
    FROM eps CROSS JOIN pr CROSS JOIN n
    GROUP BY eps.eps_e2
    ORDER BY eps.eps_e2
    """,
)
def semdedup_eps_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup epsilon dial, measured: on the exact capped audit
    sample (the same deterministic id slice semdedup_cells audits
    with — see _SEM_AUDIT_TARGET), the near-dup pair count, the documents the
    keep-lowest-id rule would drop, and the corpus keep-rate at
    eps in {{0.05, 0.10, 0.20, 0.50}} (cos >= 1 - eps) — the table a
    data-curation owner reads to pick epsilon BEFORE running the
    blocked kernel over the full corpus (SemDeDup's own paper tunes
    exactly this dial; keep-rate falls off a cliff past the corpus's
    natural similarity mode).  Dropping is per-pair higher-id
    (greedy lowest-id keeper), the same deterministic rule the
    production kernel applies per cluster.

    Scale shape: the sweep is exact all-pairs ON THE SAMPLE ONLY
    (capped near _SEM_AUDIT_TARGET vectors at any corpus size — the
    full corpus never self-joins); the 4-level eps table broadcast-crosses the
    scored pairs into one conditional roll-up."""
    e = t(spark, sf_dir, "embeddings")
    s = e.filter(
        F.col("vec_id") % _audit_mod(e.count()) == 0
    ).select("vec_id", "embedding")
    s = supersede_checkpoint("eps_sweep_sample", s)
    n = s.agg(F.count(F.lit(1)).alias("ns"))
    # norms hoisted per sample vector (see _norm_col): bit-identical
    # cos, the all-pairs sweep pays one interpreted dot per pair
    ea = s.select(
        F.col("vec_id").alias("vec_a"), F.col("embedding").alias("ea"),
        _norm_col(F.col("embedding")).alias("na"),
    )
    eb = s.select(
        F.col("vec_id").alias("vec_b"), F.col("embedding").alias("eb"),
        _norm_col(F.col("embedding")).alias("nb"),
    )
    pr = (
        ea.crossJoin(eb)
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select(
            "vec_a",
            "vec_b",
            _cosine_prenorm(
                F.col("ea"), F.col("eb"), F.col("na"), F.col("nb")
            ).alias("cos"),
        )
    )
    eps = literal_df(spark, [(x,) for x in _EPS_LEVELS], "eps_e2 int")
    return (
        pr.crossJoin(F.broadcast(eps))
        .crossJoin(F.broadcast(n))
        .groupBy("eps_e2")
        .agg(
            F.sum(
                F.when(F.col("cos") >= 1 - F.col("eps_e2") / 100.0, 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_pairs"),
            F.countDistinct(
                F.when(F.col("cos") >= 1 - F.col("eps_e2") / 100.0, F.col("vec_b"))
            )
            .cast("bigint")
            .alias("n_dropped"),
            F.round(
                1
                - F.countDistinct(
                    F.when(
                        F.col("cos") >= 1 - F.col("eps_e2") / 100.0, F.col("vec_b")
                    )
                ).cast("double")
                / F.max("ns"),
                6,
            ).alias("keep_rate"),
        )
        .orderBy("eps_e2")
    )


# ------------------------------ dedup method agreement matrix

# Sample dial for the method-agreement audit: modulus grows with the
# corpus so the all-pairs comparison stays ~bounded (see the semdedup
# _SEM_AUDIT_TARGET precedent).
_AGREE_TARGET = 200
_AGREE_J_T = "0.5"   # word-set jaccard gate (the LSH verify threshold)
_AGREE_H_T = 8       # simhash60 hamming radius
_AGREE_C_T = "0.8"   # word-trigram containment gate


_AGREE_DUCK_BITS = " + ".join(
    f"(CASE WHEN list_sum(list_transform(hs, h -> "
    f"CASE WHEN ((h >> {b}) & 1) = 1 THEN 1 ELSE -1 END)) > 0 "
    f"THEN CAST({1 << b} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
    for b in range(_SH64_BITS)
)


def _agree_oracle() -> str:
    from instructions_mr_spark.queries._util import duck_h60

    return f"""
    WITH mm AS (
      SELECT GREATEST(10, COUNT(*) // {_AGREE_TARGET}) AS md FROM documents
    ),
    s AS (
      SELECT doc_id, string_split(text, ' ') AS words
      FROM documents, mm
      WHERE doc_id % md = 0 AND len(string_split(text, ' ')) >= 3
    ),
    feat0 AS (
      SELECT doc_id,
             list_distinct(words) AS ws,
             list_distinct(list_transform(range(1, len(words) - 1),
               i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2]))
               AS tris,
             list_transform(words, w -> {duck_h60("w", 7)}) AS hs
      FROM s
    ),
    feat AS (
      SELECT doc_id, ws, tris, {_AGREE_DUCK_BITS} AS fp FROM feat0
    ),
    pairs AS (
      SELECT len(list_filter(a.ws, x -> list_contains(b.ws, x)))
               * 1.0 / len(list_distinct(list_concat(a.ws, b.ws))) AS jac,
             bit_count(xor(a.fp, b.fp)) AS ham,
             len(list_filter(a.tris, x -> list_contains(b.tris, x)))
               * 1.0 / LEAST(len(a.tris), len(b.tris)) AS cont
      FROM feat a JOIN feat b ON a.doc_id < b.doc_id
    )
    SELECT CAST(jac >= {_AGREE_J_T} AS BOOLEAN) AS jaccard_dup,
           CAST(ham <= {_AGREE_H_T} AS BOOLEAN) AS simhash_dup,
           CAST(cont >= {_AGREE_C_T} AS BOOLEAN) AS containment_dup,
           CAST(COUNT(*) AS BIGINT) AS n_pairs
    FROM pairs
    GROUP BY 1, 2, 3
    ORDER BY 1, 2, 3
    """


@query("dedup_method_agreement", oracle=_agree_oracle())
def dedup_method_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-detector AGREEMENT matrix — the forensics a curation
    owner reads before picking a cascade: on a capped deterministic
    doc sample, every pair is scored by all three detector families
    at their production gates (exact word-set jaccard >= 0.5 — the
    LSH verify; 60-bit SimHash hamming <= 8; word-trigram containment
    >= 0.8 — the substring family's gate) and pairs are counted per
    agreement cell.  Off-diagonal cells are the documents one family
    would delete and another would keep — the disagreement budget a
    cascade must adjudicate (dedup_cascade_attribution shows who wins
    today; THIS table shows how much is at stake).

    Scale shape: the sample modulus grows with the corpus (~200 docs
    at any scale), so the all-pairs comparison is bounded by
    construction; fingerprints reuse the staged one-digest-per-word
    SimHash pass; output is <= 8 rows."""
    from instructions_mr_spark.queries._util import spark_h60

    d = t(spark, sf_dir, "documents")
    n = d.count()
    mod = max(10, n // _AGREE_TARGET)
    s = (
        d.filter((F.col("doc_id") % mod == 0))
        .selectExpr("doc_id", "split(text, ' ') AS words")
        .filter(F.size("words") >= 3)
    )
    bit_terms = " + ".join(
        f"(CASE WHEN AGGREGATE(hs, 0, (acc, h) -> acc + "
        f"CASE WHEN (SHIFTRIGHT(h, {b}) & 1) = 1 THEN 1 ELSE -1 END) > 0 "
        f"THEN CAST({1 << b} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
        for b in range(_SH64_BITS)
    )
    feat = supersede_checkpoint(
        "agree_feat",
        s.selectExpr(
            "doc_id",
            "array_distinct(words) AS ws",
            "array_distinct(transform(sequence(1, size(words) - 2),"
            " i -> concat(element_at(words, i), ' ',"
            " element_at(words, i + 1), ' ', element_at(words, i + 2))))"
            " AS tris",
            f"TRANSFORM(words, w -> {spark_h60('w', 7)}) AS hs",
        ).selectExpr("doc_id", "ws", "tris", f"{bit_terms} AS fp"),
    )
    a, b = feat.alias("a"), feat.alias("b")
    pairs = a.join(b, F.col("a.doc_id") < F.col("b.doc_id")).select(
        (
            F.expr("size(array_intersect(a.ws, b.ws))")
            / F.expr("size(array_union(a.ws, b.ws))")
        ).alias("jac"),
        F.expr("bit_count(a.fp ^ b.fp)").alias("ham"),
        (
            F.expr("size(array_intersect(a.tris, b.tris))")
            / F.expr("LEAST(size(a.tris), size(b.tris))")
        ).alias("cont"),
    )
    return (
        pairs.groupBy(
            (F.col("jac") >= float(_AGREE_J_T)).alias("jaccard_dup"),
            (F.col("ham") <= _AGREE_H_T).alias("simhash_dup"),
            (F.col("cont") >= float(_AGREE_C_T)).alias("containment_dup"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_pairs"))
        .orderBy("jaccard_dup", "simhash_dup", "containment_dup")
    )
