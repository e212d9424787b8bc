"""URL curation — canonicalize / registrable-domain / URL-dedup /
domain blocklist.

Every public raw-crawl curation pipeline runs a URL stage before any
text stage: C4 and RefinedWeb deduplicate documents BY URL before
content dedup, and filter against domain blocklists; CCNet keys its
shard layout on the source URL. The reference pipeline has the same
*shape* in its processor chain (normalize → enrich → route on a
derived key); this module is that stage for crawl corpora.

All pure Column work — one codegen stage for canonicalization (no
shuffle, no Python), one keyed exchange for dedup (the same shuffle
exact dedup pays), a broadcast anti-join for the blocklist. The
DuckDB oracle twins are built from the SAME pattern strings so both
engines transform identically (repo convention, see clean.py).

Canonicalization rules (documented scope — absolute http/https URLs):

1. trim, drop the fragment (``#...``)
2. scheme and host lowercase; userinfo (``user:pw@``) stripped;
   trailing host dot stripped
3. default ports dropped (``http:80``, ``https:443``); other ports kept
4. empty path → ``/`` (path case is PRESERVED — paths are
   case-sensitive, only scheme/host fold)
5. query params: tracking params removed (``utm_*``, ``fbclid``,
   ``gclid``, ``dclid``, ``msclkid``, ``mc_eid``, ``igshid``,
   ``ref``/``ref_src``, ``_ga``), the rest SORTED and rejoined —
   param order never splits a dup group; an emptied query drops its
   ``?``
6. non-absolute / non-matching input → NULL canon (callers route or
   drop; never a silent passthrough)

Percent-decoding is deliberately NOT applied: both RE2 and Java would
agree, but %-decoding can produce new separators (``%2F``) and makes
the transform non-idempotent — the standard conservative choice.

No lookaheads / backreferences anywhere: DuckDB's RE2 has neither.

Registrable domain is a heuristic eTLD+1: a small embedded set of
two-label public suffixes (``co.uk`` …) picks 3 labels, everything
else 2; IPv4 hosts are their own domain. At production scale the
suffix set swaps for the full public-suffix list as a broadcast dim —
the column logic is unchanged.

Reference shape parity: the normalize→key→route chain mirrors
libbeat's processor pipeline (``/root/reference/libbeat/processors/
actions/*.go`` field rewrites feeding the output selector,
``/root/reference/libbeat/outputs/output_reg.go``); URL semantics
follow the public C4 §2.1 / RefinedWeb §3.1 descriptions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# -- shared pattern strings (Spark Java regex == DuckDB RE2) ----------------

#: strip fragment (applied after trim, before any extraction)
FRAG_RE = "#.*$"
#: capture the scheme of an absolute URL
SCHEME_RE = "^([A-Za-z][A-Za-z0-9+.-]*)://"
#: capture the authority (userinfo@host:port)
AUTH_RE = "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
#: capture the path (may be empty)
PATH_RE = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)"
#: capture the query (applied to the de-fragmented string)
QUERY_RE = "[?](.*)$"
#: strip userinfo from the authority
USERINFO_RE = "^[^@]*@"
#: trailing :port on the authority
PORT_RE = ":([0-9]+)$"
PORT_STRIP_RE = ":[0-9]+$"
#: trailing dot on a host ("example.com." == "example.com")
TRAILDOT_RE = "[.]$"
#: one query param that is pure tracking noise
TRACK_RE = (
    "(?i)^(utm_[a-z0-9_]+|fbclid|gclid|dclid|msclkid|mc_eid|igshid"
    "|ref|ref_src|_ga)(=.*)?$"
)
#: IPv4 literal host
IPV4_RE = "^[0-9]+([.][0-9]+){3}$"

#: two-label public suffixes → registrable domain takes THREE labels
SUFFIX2 = (
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "net.uk",
    "co.jp", "ne.jp", "or.jp", "ac.jp",
    "com.au", "net.au", "org.au", "edu.au",
    "co.nz", "org.nz", "net.nz",
    "co.in", "net.in", "org.in",
    "co.za", "org.za",
    "com.br", "net.br", "org.br",
    "com.mx", "com.ar", "com.tr", "com.cn", "com.sg", "com.hk",
    "co.kr", "or.kr",
)


def _url_stage1(url: Column) -> dict[str, Column]:
    """trim + defragment, then raw component extraction. Returns
    columns meant for ONE select (each reads only the input column —
    no shared derived subexpression to re-materialize)."""
    defrag = F.regexp_replace(F.trim(url), FRAG_RE, "")
    return {"_defrag": defrag}


def _url_stage2(defrag: Column) -> dict[str, Column]:
    """component extraction from the materialized defragmented URL."""
    return {
        "_scheme": F.lower(F.regexp_extract(defrag, SCHEME_RE, 1)),
        "_auth": F.regexp_replace(
            F.regexp_extract(defrag, AUTH_RE, 1), USERINFO_RE, ""
        ),
        "_path": F.regexp_extract(defrag, PATH_RE, 1),
        "_query": F.regexp_extract(defrag, QUERY_RE, 1),
    }


def _url_stage3(auth, query) -> dict[str, Column]:
    """host/port split + query-param canonicalization, from
    materialized components."""
    host = F.regexp_replace(
        F.lower(F.regexp_replace(auth, PORT_STRIP_RE, "")),
        TRAILDOT_RE,
        "",
    )
    port = F.regexp_extract(auth, PORT_RE, 1)
    kept = F.filter(
        F.split(query, "&"),
        lambda t: (t != F.lit("")) & ~t.rlike(TRACK_RE),
    )
    qcanon = F.array_join(F.array_sort(kept), "&")
    return {"_host": host, "_port": port, "_qcanon": qcanon}


def _url_assemble(scheme, host, port, path, qcanon) -> Column:
    default_port = (
        (port == F.lit(""))
        | ((scheme == F.lit("http")) & (port == F.lit("80")))
        | ((scheme == F.lit("https")) & (port == F.lit("443")))
    )
    canon = F.concat(
        scheme,
        F.lit("://"),
        host,
        F.when(default_port, F.lit("")).otherwise(F.concat(F.lit(":"), port)),
        F.when(path == F.lit(""), F.lit("/")).otherwise(path),
        F.when(qcanon == F.lit(""), F.lit("")).otherwise(
            F.concat(F.lit("?"), qcanon)
        ),
    )
    # non-absolute input → NULL (scheme or host missing)
    return F.when((scheme != F.lit("")) & (host != F.lit("")), canon)


def registrable_domain(host: Column) -> Column:
    """Heuristic eTLD+1 from a lowercased host (see module doc).
    Guards live INSIDE the expression (CLAUDE.md: a row filter
    guarding validity is not safe under projection collapse)."""
    labels = F.split(host, "[.]")
    n = F.size(labels)
    last2 = F.array_join(F.slice(labels, -2, 2), ".")
    last3 = F.array_join(F.slice(labels, -3, 3), ".")
    return (
        F.when(host.rlike(IPV4_RE), host)
        .when(n <= 2, host)
        .when(F.lower(last2).isin(*SUFFIX2) & (n >= 3), F.lower(last3))
        .otherwise(F.lower(last2))
    )


def with_canonical_url(
    df: DataFrame, url_col: str = "url", keep: list[str] | None = None
) -> DataFrame:
    """Add ``canon_url`` + ``domain``. Map-side only — staged selects
    (each regex input materialized once per the expression-reuse
    gotcha), no shuffle, no Python."""
    keep = list(keep if keep is not None else df.columns)
    s1 = df.select(*keep, *[c.alias(k) for k, c in
                            _url_stage1(F.col(url_col)).items()])
    s2 = s1.select(*keep, *[c.alias(k) for k, c in
                            _url_stage2(F.col("_defrag")).items()])
    s3cols = _url_stage3(F.col("_auth"), F.col("_query"))
    s3 = s2.select(
        *keep, "_scheme", "_path",
        *[c.alias(k) for k, c in s3cols.items()],
    )
    canon = _url_assemble(
        F.col("_scheme"), F.col("_host"), F.col("_port"),
        F.col("_path"), F.col("_qcanon"),
    )
    return s3.select(
        *keep,
        canon.alias("canon_url"),
        F.when(
            F.col("_host") != F.lit(""), registrable_domain(F.col("_host"))
        ).alias("domain"),
    )


def url_dedup(
    df: DataFrame, url_col: str = "url", id_col: str = "doc_id"
) -> DataFrame:
    """URL-keyed keep-first dedup: rank within each canonical URL by
    id (deterministic across engines and repartitioning) and keep
    rank 1. ONE keyed exchange on canon_url — the same shuffle the
    exact-dedup stage pays; at 100 TB the canon key is a short string
    and AQE handles hot URLs (a single URL shared by millions of rows
    is itself a signal the blocklist stage wants).

    Rows whose URL fails to canonicalize (NULL canon) are KEPT —
    dedup never silently drops unparseable rows; route them with the
    blocklist/filter stages instead."""
    d = with_canonical_url(df, url_col)
    w = Window.partitionBy("canon_url").orderBy(F.asc(id_col))
    return (
        d.withColumn("dup_rank", F.row_number().over(w))
        .where(F.col("canon_url").isNull() | (F.col("dup_rank") == 1))
        .drop("dup_rank")
    )


def domain_blocklist_filter(
    df: DataFrame, blocklist: DataFrame, domain_col: str = "domain"
) -> DataFrame:
    """Drop rows whose registrable domain is in the blocklist dim
    (one column ``domain``). Broadcast LEFT ANTI — the blocklist is
    MBs against a TB corpus, the corpus never shuffles."""
    return df.join(
        F.broadcast(blocklist.select(F.col("domain").alias("_blk"))),
        F.col(domain_col) == F.col("_blk"),
        "left_anti",
    )


# -- DuckDB twins ------------------------------------------------------------


def _q(pat: str) -> str:
    return "'" + pat.replace("'", "''") + "'"


def canonical_url_sql_ctes(src: str, url_expr: str = "url") -> str:
    """WITH-fragment (caller embeds) producing ``_u3``: every column
    of ``src`` plus _scheme/_host/_port/_path/_qcanon. MATERIALIZED
    CTEs per the DuckDB expression-reuse gotcha."""
    return f"""
_u1 AS MATERIALIZED (
  SELECT *, regexp_replace(trim({url_expr}), {_q(FRAG_RE)}, '', 'g') AS _defrag
  FROM {src}
),
_u2 AS MATERIALIZED (
  SELECT *,
    lower(coalesce(regexp_extract(_defrag, {_q(SCHEME_RE)}, 1), '')) AS _scheme,
    regexp_replace(coalesce(regexp_extract(_defrag, {_q(AUTH_RE)}, 1), ''),
                   {_q(USERINFO_RE)}, '', 'g') AS _auth,
    coalesce(regexp_extract(_defrag, {_q(PATH_RE)}, 1), '') AS _path,
    coalesce(regexp_extract(_defrag, {_q(QUERY_RE)}, 1), '') AS _query
  FROM _u1
),
_u3 AS MATERIALIZED (
  SELECT *,
    regexp_replace(lower(regexp_replace(_auth, {_q(PORT_STRIP_RE)}, '', 'g')),
                   {_q(TRAILDOT_RE)}, '', 'g') AS _host,
    coalesce(regexp_extract(_auth, {_q(PORT_RE)}, 1), '') AS _port,
    coalesce(array_to_string(
      list_sort(list_filter(string_split(_query, '&'),
                            t -> t <> '' AND NOT regexp_matches(t, {_q(TRACK_RE)}))),
      '&'), '') AS _qcanon  -- DuckDB: array_to_string([]) is NULL, Spark's array_join is ''
  FROM _u2
)"""


def canonical_url_sql_expr() -> str:
    """Scalar canon expression over _u3's columns."""
    return """
CASE WHEN _scheme <> '' AND _host <> '' THEN
  _scheme || '://' || _host
  || CASE WHEN _port = ''
            OR (_scheme = 'http' AND _port = '80')
            OR (_scheme = 'https' AND _port = '443')
          THEN '' ELSE ':' || _port END
  || CASE WHEN _path = '' THEN '/' ELSE _path END
  || CASE WHEN _qcanon = '' THEN '' ELSE '?' || _qcanon END
END"""


def registrable_domain_sql_expr() -> str:
    """Scalar domain expression over _u3._host (NULL when no host)."""
    sfx = ", ".join(f"'{s}'" for s in SUFFIX2)
    return f"""
CASE WHEN _host = '' THEN NULL
     WHEN regexp_matches(_host, {_q(IPV4_RE)}) THEN _host
     WHEN len(string_split(_host, '.')) <= 2 THEN _host
     WHEN lower(array_to_string(list_slice(string_split(_host, '.'),
              len(string_split(_host, '.')) - 1,
              len(string_split(_host, '.'))), '.')) IN ({sfx})
          AND len(string_split(_host, '.')) >= 3
     THEN lower(array_to_string(list_slice(string_split(_host, '.'),
              len(string_split(_host, '.')) - 2,
              len(string_split(_host, '.'))), '.'))
     ELSE lower(array_to_string(list_slice(string_split(_host, '.'),
              len(string_split(_host, '.')) - 1,
              len(string_split(_host, '.'))), '.'))
END"""
