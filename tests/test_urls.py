"""URL normalization parity (operators/urls.py vs the DuckDB twin in
queries/web.py) on adversarial handcrafted URLs, plus policy pins."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from instructions_mr_spark.operators.urls import (
    normalize_url,
    registrable_domain,
    url_host,
)

CASES = [
    # (raw, expected_norm, expected_host, expected_domain)
    ("HTTPS://WWW.Example.COM/A/B?utm_source=x&id=3#frag",
     "example.com/a/b?id=3", "example.com", "example.com"),
    ("http://example.com/path/", "example.com/path", "example.com", "example.com"),
    ("https://m.sub.Example.com/x?b=2&a=1",
     "m.sub.example.com/x?a=1&b=2", "m.sub.example.com", "example.com"),
    ("example.com/no-scheme?ref=tw", "example.com/no-scheme",
     "example.com", "example.com"),
    ("https://example.com/?utm_campaign=1&utm_medium=2",
     "example.com", "example.com", "example.com"),
    ("https://example.com", "example.com", "example.com", "example.com"),
    ("ftp://files.example.org/pub//data/?fbclid=abc&v=7",
     "files.example.org/pub//data?v=7", "files.example.org", "example.org"),
    ("https://WWW.example.com///", "example.com", "example.com", "example.com"),
    ("https://example.com/p?gclid=9", "example.com/p", "example.com",
     "example.com"),
    ("https://example.com/p?id=1&id=1", "example.com/p?id=1&id=1",
     "example.com", "example.com"),
    # single-label host: domain falls back to the host (no phantom '')
    ("http://localhost:8080/health", "localhost/health",
     "localhost", "localhost"),
    # IPv4 host: port stripped, last-two-label heuristic yields the
    # trailing octet pair (documented approximation, not '')
    ("http://10.0.0.1:9200/_cat", "10.0.0.1/_cat", "10.0.0.1", "0.1"),
    # userinfo stripped; path '@' untouched
    ("https://user:pw@Example.com:443/a?id=2", "example.com/a?id=2",
     "example.com", "example.com"),
    ("https://example.com/docs/@v2/page", "example.com/docs/@v2/page",
     "example.com", "example.com"),
    # malformed port (r7 advice): ':80ab' is not a valid port, so it
    # is kept VERBATIM — the digit run must not merge residue into
    # the host ('hostab/x' was the old failure shape)
    ("http://host:80ab/x", "host:80ab/x", "host:80ab", "host:80ab"),
    # port at end-of-string still strips (the $2 alternative)
    ("http://example.com:8080", "example.com", "example.com", "example.com"),
]

# Must stay byte-identical to queries/web.py:_DUCK_NORM_CTES (minus
# the synthesis CTE) — parity of the twin itself is what's under test.
_DUCK_NORM = """
    WITH stripped AS (
      SELECT raw,
             regexp_replace(regexp_replace(regexp_replace(regexp_replace(
               lower(regexp_replace(raw, '#.*$', '')),
               '^[a-z][a-z0-9+.-]*://', ''),
               '^[^/?#]*@', ''),
               '^([^/:?#]*):[0-9]+([/?#]|$)', '\\1\\2'), '^www\\.', '') AS u
      FROM urls
    ),
    parts AS (
      SELECT raw, u,
             regexp_replace(split_part(u, '?', 1), '/+$', '') AS path,
             split_part(u, '?', 2) AS qs
      FROM stripped
    )
    SELECT raw,
           path || CASE WHEN qn != '' THEN '?' || qn ELSE '' END AS norm_url,
           split_part(split_part(u, '/', 1), '?', 1) AS host,
           COALESCE(NULLIF(regexp_extract(
               split_part(split_part(u, '/', 1), '?', 1),
               '[^.]+\\.[^.]+$'), ''),
             split_part(split_part(u, '/', 1), '?', 1)) AS domain
    FROM (
      SELECT *,
             array_to_string(list_sort(list_filter(string_split(qs, '&'),
               p -> p != '' AND NOT regexp_matches(p,
                 '^(utm_[a-z0-9_]+|ref|fbclid|gclid)='))), '&') AS qn
      FROM parts)
"""


def test_normalize_url_pins(spark):
    df = spark.createDataFrame([(c[0],) for c in CASES], "raw string").select(
        "raw",
        normalize_url("raw").alias("norm"),
        url_host("raw").alias("host"),
        registrable_domain("raw").alias("domain"),
    )
    got = {r.raw: (r.norm, r.host, r.domain) for r in df.collect()}
    for raw, norm, host, domain in CASES:
        assert got[raw] == (norm, host, domain), raw


def test_normalize_url_duckdb_twin_parity(spark):
    con = duckdb.connect()
    con.execute("CREATE TABLE urls(raw VARCHAR)")
    con.executemany("INSERT INTO urls VALUES (?)", [(c[0],) for c in CASES])
    duck = {
        r[0]: (r[1], r[2], r[3]) for r in con.sql(_DUCK_NORM).fetchall()
    }
    df = spark.createDataFrame([(c[0],) for c in CASES], "raw string").select(
        "raw",
        normalize_url("raw").alias("norm"),
        url_host("raw").alias("host"),
        registrable_domain("raw").alias("domain"),
    )
    for r in df.collect():
        assert duck[r.raw] == (r.norm, r.host, r.domain), r.raw


def test_url_dedup_groups(spark):
    """Same page under different cosmetic URLs collapses to one group."""
    variants = [
        (1, "HTTPS://WWW.Example.com/docs?utm_source=a"),
        (2, "http://example.com/docs/"),
        (3, "https://example.com/docs#top"),
        (4, "https://example.com/other"),
    ]
    df = spark.createDataFrame(variants, "doc_id long, url string")
    groups = (
        df.select("doc_id", normalize_url("url").alias("n"))
        .groupBy("n")
        .agg(F.count("*").alias("c"), F.min("doc_id").alias("keep"))
        .collect()
    )
    by_url = {r.n: (r.c, r.keep) for r in groups}
    assert by_url["example.com/docs"] == (3, 1)
    assert by_url["example.com/other"] == (1, 4)


def test_registrable_domain_psl(spark):
    """PSL longest-match beats the two-label heuristic on listed
    multi-label suffixes; unlisted suffixes fall back to the default
    single-label rule; a host that IS a suffix falls back to itself."""
    from instructions_mr_spark.operators.urls import registrable_domain_psl

    rows = [
        (1, "docs.blog.co.uk"),      # listed 2-label suffix -> 3 labels
        (2, "example.com"),          # default rule
        (3, "a.b.example.com"),      # default rule, deep host
        (4, "user.github.io"),       # listed 2-label suffix
        (5, "shop.co.zz"),           # UNlisted 2-label -> default rule
        (6, "localhost"),            # single label -> itself
        (7, "co.uk"),                # host IS a suffix -> itself
    ]
    hosts = spark.createDataFrame(rows, "doc_id long, host string")
    got = {
        r.doc_id: r.domain
        for r in registrable_domain_psl(hosts, spark).collect()
    }
    assert got == {
        1: "blog.co.uk",
        2: "example.com",
        3: "example.com",
        4: "user.github.io",
        5: "co.zz",
        6: "localhost",
        7: "co.uk",
    }
