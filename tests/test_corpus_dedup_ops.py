"""Semantic pins for the round-7b corpus-dedup additions on
handcrafted inputs: simhash hamming-blocked pairs and CCNet-style
drop-everywhere line-frequency dedup."""

from __future__ import annotations

import hashlib

from instructions_mr_spark import registry

registry.load_all()


def _write_docs(spark, tmp_path, rows):
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))


def test_simhash_hamming_pairs_identical_and_permuted(spark, tmp_path):
    """Identical texts pair at hamming 0; a word PERMUTATION also pairs
    at hamming 0 (simhash is bag-of-words); disjoint-vocabulary docs
    must not pair within radius 3."""
    base = " ".join(f"w{i}" for i in range(40))
    perm = " ".join(f"w{i}" for i in reversed(range(40)))
    other = " ".join(f"z{i}" for i in range(40))
    _write_docs(
        spark,
        tmp_path,
        [
            (0, base, "en", "s", 1),
            (1, base, "en", "s", 1),
            (2, perm, "en", "s", 1),
            (3, other, "en", "s", 1),
        ],
    )
    got = {
        (r.doc_a, r.doc_b): r.hamming
        for r in registry.QUERIES["dedup_simhash_hamming"](
            spark, str(tmp_path)
        ).collect()
    }
    assert got[(0, 1)] == 0
    assert got[(0, 2)] == 0 and got[(1, 2)] == 0
    assert all(3 not in pair for pair in got)


def test_line_frequency_drops_everywhere(spark, tmp_path):
    """A paragraph shared by two docs is dropped from BOTH (unlike
    dedup_paragraph's keep-first); unshared paragraphs survive and the
    cleaned digest matches the surviving text."""
    p1 = " ".join(["shared"] * 10)
    p2 = " ".join(f"a{i}" for i in range(10))
    p3 = " ".join(f"b{i}" for i in range(10))
    p4 = " ".join(f"c{i}" for i in range(10))
    _write_docs(
        spark,
        tmp_path,
        [
            (0, p1 + " " + p2, "en", "s", 1),
            (1, p1 + " " + p3, "en", "s", 1),
            (2, p4, "en", "s", 1),
        ],
    )
    got = {
        r.doc_id: r
        for r in registry.QUERIES["dedup_line_frequency"](
            spark, str(tmp_path)
        ).collect()
    }
    assert got[0].n_dropped == 1 and got[1].n_dropped == 1
    assert got[2].n_dropped == 0
    assert got[0].cleaned_md5 == hashlib.md5(p2.encode()).hexdigest()
    assert got[1].cleaned_md5 == hashlib.md5(p3.encode()).hexdigest()
    assert got[2].cleaned_md5 == hashlib.md5(p4.encode()).hexdigest()
