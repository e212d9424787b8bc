"""URL curation operator (operators/urltools.py): canonicalization
expected values + DuckDB parity from the same pattern strings, dedup /
blocklist semantics, and plan-shape pins (canonicalize is map-only,
dedup is ONE keyed exchange, blocklist is a broadcast anti-join)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from beats_spark.operators.urltools import (
    canonical_url_sql_ctes,
    canonical_url_sql_expr,
    domain_blocklist_filter,
    registrable_domain,
    registrable_domain_sql_expr,
    url_dedup,
    with_canonical_url,
)


CASES = [
    # (raw url, expected canon, expected registrable domain)
    (
        "HTTP://u:pw@WWW.Example.COM:80/Path/A?utm_source=x&b=2&a=1#frag",
        "http://www.example.com/Path/A?a=1&b=2",
        "example.com",
    ),
    # same canonical target spelled clean
    (
        "http://www.example.com/Path/A?a=1&b=2",
        "http://www.example.com/Path/A?a=1&b=2",
        "example.com",
    ),
    # https default port dropped; non-default kept
    ("https://Ex.org:443/x", "https://ex.org/x", "ex.org"),
    ("https://ex.org:8443/x", "https://ex.org:8443/x", "ex.org"),
    # query emptied by tracking removal drops its '?'
    ("https://a.b.co.uk/p?fbclid=zz", "https://a.b.co.uk/p", "b.co.uk"),
    # two-label public suffix → three labels; bare suffix-like host
    ("http://news.bbc.co.uk/", "http://news.bbc.co.uk/", "bbc.co.uk"),
    ("http://co.uk/", "http://co.uk/", "co.uk"),
    # empty path → '/'; param order canonical; '=' kept inside values
    ("http://t.com?b=2&a=1&c=x=y", "http://t.com/?a=1&b=2&c=x=y", "t.com"),
    # IPv4 host is its own domain; trailing host dot stripped
    ("http://10.1.2.3:8080?z=9", "http://10.1.2.3:8080/?z=9", "10.1.2.3"),
    ("http://example.com./x", "http://example.com/x", "example.com"),
    # utm family is case-insensitive; _ga and ref are tracking
    ("http://t.com/p?UTM_Medium=a&q=1", "http://t.com/p?q=1", "t.com"),
    ("http://t.com/p?_ga=1&ref=spam&q=1", "http://t.com/p?q=1", "t.com"),
    # single-label host
    ("http://localhost:9200/_cat", "http://localhost:9200/_cat", "localhost"),
    # non-absolute / garbage → NULL canon, NULL domain
    ("/relative/path?a=1", None, None),
    ("not a url at all", None, None),
]


@pytest.fixture(scope="module")
def canon_rows(spark):
    df = spark.createDataFrame(
        [(i, u) for i, (u, _, _) in enumerate(CASES)],
        "doc_id long, url string",
    )
    out = with_canonical_url(df)
    return {r["doc_id"]: (r["canon_url"], r["domain"]) for r in out.collect()}


class TestCanonicalize:
    def test_expected_values(self, canon_rows):
        for i, (raw, want_canon, want_dom) in enumerate(CASES):
            canon, dom = canon_rows[i]
            assert canon == want_canon, (raw, canon)
            assert dom == want_dom, (raw, dom)

    def test_duckdb_parity(self, canon_rows):
        con = duckdb.connect()
        con.execute(
            "CREATE TABLE raw AS SELECT * FROM (VALUES "
            + ", ".join(f"({i}, ?)" for i in range(len(CASES)))
            + ") t(doc_id, url)",
            [u for u, _, _ in CASES],
        )
        sql = f"""
WITH {canonical_url_sql_ctes("raw").lstrip()}
SELECT doc_id, {canonical_url_sql_expr()} AS canon_url,
       {registrable_domain_sql_expr()} AS domain
FROM _u3
"""
        for doc_id, canon, dom in con.execute(sql).fetchall():
            assert canon_rows[doc_id] == (canon, dom), (
                doc_id, CASES[doc_id][0], canon_rows[doc_id], (canon, dom),
            )

    def test_map_only_plan(self, spark):
        df = spark.createDataFrame([(1, "http://a.com/")], "doc_id long, url string")
        plan = (
            with_canonical_url(df)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" not in plan
        assert "Python" not in plan


class TestDedupBlocklist:
    def test_url_dedup_keeps_first_and_unparseable(self, spark):
        df = spark.createDataFrame(
            [
                (1, "HTTP://A.com:80/x?utm_source=s"),
                (2, "http://a.com/x"),
                (3, "http://a.com/y"),
                (4, "garbage"),
                (5, "also garbage"),
            ],
            "doc_id long, url string",
        )
        kept = sorted(r["doc_id"] for r in url_dedup(df).collect())
        # 1+2 same canon → keep 1; 3 unique; 4,5 unparseable → kept
        assert kept == [1, 3, 4, 5]

    def test_dedup_single_exchange(self, spark):
        df = spark.createDataFrame(
            [(1, "http://a.com/")], "doc_id long, url string"
        )
        plan = url_dedup(df)._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange") == 1

    def test_blocklist_broadcast_anti(self, spark):
        docs = spark.createDataFrame(
            [(1, "spam.co.uk"), (2, "fine.org")], "doc_id long, domain string"
        )
        blk = spark.createDataFrame([("spam.co.uk",)], "domain string")
        out = domain_blocklist_filter(docs, blk)
        assert [r["doc_id"] for r in out.collect()] == [2]
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan and "LeftAnti" in plan

    def test_registrable_domain_null_host(self, spark):
        # guard lives inside the expression: empty host never reaches
        # slice() with an invalid range
        df = spark.createDataFrame([("",), ("a",)], "h string")
        rows = df.select(registrable_domain(F.col("h")).alias("d")).collect()
        assert [r["d"] for r in rows] == ["", "a"]
