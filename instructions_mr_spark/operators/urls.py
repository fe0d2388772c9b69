"""URL normalization for web-corpus dedup (EXT mandate: URL/domain-
level dedup is the one curation signal a crawled 100 TB corpus keys on
before any content pass — exact-duplicate fetches of the same page
under cosmetically different URLs).

The reference has no web/URL handling (its I/O is JSONL records —
bin/text_mr_pipe.py:46-58); this is an EXT-mandate operator like
dedup/ANN.  Everything is a pure Column expression (regexp + string +
higher-order array built-ins, full WholeStageCodegen): at 100 TB this
is a scan projection, and the dedup that follows shuffles only
(normalized-url digest, doc_id) pairs.

Normalization policy (the CCNet/RefinedWeb-style canonical form):

* drop the fragment (``#...``)
* lowercase (scheme and host are case-insensitive; paths are folded
  too — the aggressive form web-dedup pipelines use, since crawlers
  rarely emit case-variant paths for distinct content)
* drop the scheme (``http://`` == ``https://`` for identity purposes)
* drop a leading ``www.``
* drop tracking query parameters (``utm_*``, ``ref``, ``fbclid``,
  ``gclid``) but KEEP meaningful ones, sorted canonically
* drop empty queries and trailing slashes

Every step has an exact DuckDB twin (queries/web.py) so the operator
is oracle-checkable end to end.
"""

from __future__ import annotations
from instructions_mr_spark.plans.guard import literal_df

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tracking parameters stripped during normalization (param names only;
# anchored at the key= prefix).
TRACKING_PARAM_RE = "^(utm_[a-z0-9_]+|ref|fbclid|gclid)="


def _stripped(url: Column | str) -> Column:
    """fragment dropped, lowercased, scheme / userinfo / port / www.
    removed.

    Userinfo is everything up to an ``@`` inside the authority (the
    char class cannot cross ``/``/``?``/``#``, so a path ``@`` is
    untouched); the port is a ``:digits`` run on the first segment
    that ends AT a delimiter or end-of-string (captured group ``$2``
    re-appends the delimiter — no lookahead, so the RE2-based DuckDB
    twin matches byte-for-byte).  A malformed port like ``host:80ab/x``
    therefore keeps its ``:80ab`` verbatim (it is not a valid port, so
    nothing is stripped) instead of merging residue into the host.
    Bracketed IPv6 authorities (``[::1]:8080``) are out of scope: the
    host char class excludes nothing bracket-specific, so their port
    survives — documented limitation, same on both engines.
    """
    u = F.col(url) if isinstance(url, str) else url
    u = F.regexp_replace(u, "#.*$", "")
    u = F.lower(u)
    u = F.regexp_replace(u, "^[a-z][a-z0-9+.-]*://", "")
    u = F.regexp_replace(u, "^[^/?#]*@", "")
    u = F.regexp_replace(u, "^([^/:?#]*):[0-9]+([/?#]|$)", "$1$2")
    return F.regexp_replace(u, r"^www\.", "")


def normalize_url(url: Column | str) -> Column:
    """Canonical URL string (see module docstring for the policy).

    Shape: pure per-row expression — regexp chain + one split/filter/
    sort/join over the query params (bounded, in-row).  No UDF.
    """
    u = _stripped(url)
    path = F.regexp_replace(F.split_part(u, F.lit("?"), F.lit(1)), "/+$", "")
    qs = F.split_part(u, F.lit("?"), F.lit(2))
    params = F.array_sort(
        F.filter(
            F.split(qs, "&"),
            lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
        )
    )
    qnorm = F.array_join(params, "&")
    return F.concat(
        path, F.when(qnorm != "", F.concat(F.lit("?"), qnorm)).otherwise(F.lit(""))
    )


def url_host(url: Column | str) -> Column:
    """Lowercased host (www.-stripped), e.g. ``sub.example.com``."""
    u = _stripped(url)
    return F.split_part(F.split_part(u, F.lit("/"), F.lit(1)), F.lit("?"), F.lit(1))


def url_path(url: Column | str) -> Column:
    """Path component of the stripped URL ('/'-rooted, query dropped,
    trailing slashes KEPT — robots.txt prefix rules are sensitive to
    them); a URL with no path yields '/'."""
    u = _stripped(url)
    p = F.regexp_replace(F.split_part(u, F.lit("?"), F.lit(1)), "^[^/]*", "")
    return F.when(p == "", "/").otherwise(p)


# Demo slice of the public-suffix list (publicsuffix.org is the
# public source; a production table swaps the full ~9k-rule list in —
# same broadcast-join plan).  Single-label entries are the implicit
# default rule; multi-label entries are where the PSL beats the
# two-label heuristic (``a.co.uk`` -> ``a.co.uk``, not ``co.uk``).
PUBLIC_SUFFIXES_DEMO: list[str] = [
    "com", "org", "net", "io", "dev", "uk", "au", "jp",
    "co.uk", "org.uk", "ac.uk", "gov.uk",
    "com.au", "net.au", "org.au",
    "co.jp", "or.jp", "ne.jp",
    "github.io", "blogspot.com",
]


def public_suffix_table(spark) -> "DataFrame":  # noqa: F821
    """The PSL as a (suffix, slen) DataFrame — tiny, always broadcast.
    ``slen`` is the suffix's label count (match length for the
    longest-match election)."""
    rows = [(s, s.count(".") + 1) for s in PUBLIC_SUFFIXES_DEMO]
    return literal_df(spark, rows, "suffix string, slen int")


def registrable_domain_psl(hosts, spark):
    """Public-suffix-list registrable domain: per host, the LONGEST
    listed suffix wins and the registrable domain is that suffix plus
    one preceding label; unlisted suffixes fall back to the default
    single-label rule (= the two-label heuristic), and a host that IS
    a suffix (or single-label) falls back to itself.

    ``hosts`` must carry (doc_id, host).  Returns (doc_id, host,
    domain).

    Shape: candidate suffixes (the host's last 1..3 labels) explode
    in-row — bounded fan-out of 3 — then a BROADCAST join against the
    suffix table and a (doc_id, host)-keyed max.  At 100 TB the PSL
    is ~9k rows: permanently broadcast-able, so the scan never
    shuffles to resolve domains."""
    from pyspark.sql import functions as F  # local: keep module header lean

    labels = F.split("host", r"\.")
    cands = hosts.select(
        "doc_id",
        "host",
        F.explode(
            F.filter(
                F.array(
                    *[
                        F.when(
                            F.size(labels) >= L,
                            F.array_join(F.slice(labels, -L, L), "."),
                        )
                        for L in (1, 2, 3)
                    ]
                ),
                lambda c: c.isNotNull(),
            )
        ).alias("cand"),
    )
    suf = public_suffix_table(spark)
    matched = (
        cands.join(F.broadcast(suf), cands.cand == suf.suffix)
        .groupBy("doc_id", "host")
        .agg(F.max("slen").alias("sl"))
    )
    out = hosts.join(matched, ["doc_id", "host"], "left")
    sl = F.coalesce(F.col("sl"), F.lit(1))
    domain = F.when(
        F.size(labels) >= sl + 1,
        F.array_join(F.slice(labels, -(sl + 1), sl + 1), "."),
    ).otherwise(F.col("host"))
    return out.select("doc_id", "host", domain.alias("domain"))


def registrable_domain(url: Column | str) -> Column:
    """Last-two-label domain heuristic (``example.com`` from
    ``a.b.example.com``).  A production pipeline swaps in the public-
    suffix list (a broadcast lookup table — same plan shape); the
    two-label form is the standard demo approximation.

    Single-label hosts (``localhost``, bare IPv4 is still dotted so it
    matches) fall back to the host itself instead of collapsing into
    one empty-string phantom domain."""
    host = url_host(url)
    dom = F.regexp_extract(host, r"[^.]+\.[^.]+$", 0)
    return F.when(dom == "", host).otherwise(dom)
