"""URL canonicalization — crawl-pipeline primitive (dedup by URL, host
keys for partitioning/skew, join keys across crawls).

Pure Column expressions (JVM codegen, no UDF): each rule is a regexp/case
transform whose SQL mirror is generated from the same pattern constants, so
the DuckDB oracle matches byte-for-byte.

Rules (subset of RFC 3986 §6 normalization, the ones crawl dedup needs):
  * scheme and host lowercased
  * default ports stripped (:80 http, :443 https)
  * fragment dropped
  * empty path → '/'
  * trailing '?' (empty query) dropped
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# one source of truth for both engines
_P_SCHEME = r"^([A-Za-z][A-Za-z0-9+.-]*):"
_P_HOST = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
_P_REST = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^#]*)"


def url_host(url: Column) -> Column:
    """Lowercased authority (host[:port]) of an absolute URL."""
    return F.lower(F.regexp_extract(url, _P_HOST, 1))


def normalize_url(url: Column) -> Column:
    scheme = F.lower(F.regexp_extract(url, _P_SCHEME, 1))
    host = F.lower(F.regexp_extract(url, _P_HOST, 1))
    host = F.when((scheme == F.lit("http")) & host.endswith(":80"),
                  host.substr(F.lit(1), F.length(host) - 3)) \
        .when((scheme == F.lit("https")) & host.endswith(":443"),
              host.substr(F.lit(1), F.length(host) - 4)) \
        .otherwise(host)
    rest = F.regexp_extract(url, _P_REST, 1)
    rest = F.when(rest == "", F.lit("/")) \
        .otherwise(F.regexp_replace(rest, r"\?$", ""))
    return F.concat(scheme, F.lit("://"), host, rest)


def url_normalize_sql(expr: str) -> str:
    """DuckDB mirror generated from the same pattern constants."""
    scheme = f"lower(regexp_extract({expr}, '{_P_SCHEME}', 1))"
    host0 = f"lower(regexp_extract({expr}, '{_P_HOST}', 1))"
    host = (f"case when {scheme} = 'http' and {host0} like '%:80' "
            f"then substring({host0}, 1, length({host0})-3) "
            f"when {scheme} = 'https' and {host0} like '%:443' "
            f"then substring({host0}, 1, length({host0})-4) "
            f"else {host0} end")
    rest0 = f"regexp_extract({expr}, '{_P_REST}', 1)"
    rest = (f"case when {rest0} = '' then '/' "
            f"else regexp_replace({rest0}, '\\?$', '') end")
    return f"{scheme} || '://' || {host} || {rest}"


# tracking parameters every crawl-dedup pipeline strips: two URLs that
# differ only in these are the same resource (one pattern, both engines)
_P_TRACK = r"(utm_[A-Za-z0-9_]*|gclid|fbclid|msclkid|mc_eid)=[^&]*"


def strip_tracking_params(url: Column) -> Column:
    """Remove ad/analytics tracking query parameters (utm_*, gclid,
    fbclid, msclkid, mc_eid) — apply AFTER :func:`normalize_url` (the
    passes assume no fragment). Three global regexp passes: non-first
    params, a first param followed by survivors, a lone leading param."""
    u = F.regexp_replace(url, "&" + _P_TRACK, "")
    u = F.regexp_replace(u, r"\?" + _P_TRACK + "&", "?")
    return F.regexp_replace(u, r"\?" + _P_TRACK + "$", "")


def strip_tracking_sql(expr: str) -> str:
    """DuckDB mirror generated from the same pattern constant."""
    u = f"regexp_replace({expr}, '&{_P_TRACK}', '', 'g')"
    u = f"regexp_replace({u}, '\\?{_P_TRACK}&', '?', 'g')"
    return f"regexp_replace({u}, '\\?{_P_TRACK}$', '', 'g')"


def domain_suffixes(host: Column) -> Column:
    """All dot-suffixes of a host, most-specific first:
    ``a.b.co.uk → [a.b.co.uk, b.co.uk, co.uk, uk]`` — the key expansion
    for domain-blocklist matching (an entry blocks itself and every
    subdomain). Bounded by label count (≤ ~10), pure array exprs."""
    labels = F.split(host, r"\.")
    n = F.size(labels)
    return F.transform(F.sequence(F.lit(1), n),
                       lambda i: F.array_join(F.slice(labels, i, n), "."))


def filter_blocked_domains(df, blocklist, key: str,
                           url_col: str = "url"):
    """Drop rows whose URL host is on — or is a subdomain of — a blocklist
    domain (the UT1-blocklist stage every public web pipeline runs,
    RefinedWeb §3.1 / CCNet; their lists are ~4M domains).

    Shape: explode each host's suffix chain (≤ label-count rows, narrow),
    equi-join against the blocklist (broadcast when it fits — UT1-sized
    lists do; beyond that the equi-join shuffles vocabulary-sized keys,
    never pages), then one LEFT ANTI join back on ``key``. No LIKE-join,
    no cartesian: suffix expansion turns the subdomain containment test
    into exact equality, which is what makes it joinable at 10^12 rows.

    ``blocklist`` is a DataFrame with a ``domain`` column; matching is on
    exact suffix labels (``evil.com`` blocks ``a.evil.com`` but not
    ``notevil.com``).
    """
    host = url_host(F.col(url_col))
    sfx = df.select(F.col(key),
                    F.explode(domain_suffixes(host)).alias("domain"))
    blocked = sfx.join(F.broadcast(blocklist.select("domain")), "domain")
    return df.join(blocked.select(key), key, "left_anti")


def url_templates(urls: DataFrame, url_col: str = "url",
                  min_urls: int = 2) -> DataFrame:
    """URL path-template mining → ``(host, template, n_urls)``: path
    segments that are purely numeric (or hex ids ≥ 8 chars) generalize to
    ``{id}``, so ``/product/483`` and ``/product/91`` collapse to
    ``/product/{id}`` — the crawl-planning statistic that sizes a site
    (how many page TYPES, not pages) and spots infinite URL spaces
    (calendars, session ids) before the frontier drowns in them.

    Pure regexp projection + one vocabulary-keyed count; ``min_urls``
    drops singleton templates (they are just URLs).
    """
    host = F.regexp_extract(F.col(url_col), r"^[a-z]+://([^/]+)", 1)
    path = F.regexp_extract(F.col(url_col), r"^[a-z]+://[^/]+(/[^?#]*)?", 1)
    # boundary-keeping replace applied twice per pattern (RE2 — the
    # oracle's engine — has no lookahead; using the identical chain on
    # both sides keeps semantics engine-equal on ANY input, at the cost
    # of 3+ ADJACENT generalizable segments not fully collapsing)
    tmpl = path
    for rx in (r"/\d+(/|$)", r"/\d+(/|$)",
               r"/[0-9a-f]{8,}(/|$)", r"/[0-9a-f]{8,}(/|$)"):
        tmpl = F.regexp_replace(tmpl, rx, "/{id}$1")
    return (urls.select(host.alias("host"), tmpl.alias("template"))
            .where(F.col("host") != "")
            .groupBy("host", "template")
            .agg(F.count("*").cast("long").alias("n_urls"))
            .where(F.col("n_urls") >= min_urls))


def url_templates_sql(urls_sql: str, url_expr: str = "url",
                      min_urls: int = 2) -> str:
    """DuckDB oracle for :func:`url_templates` (same RE2-safe patterns —
    lookahead IS supported by RE2's PCRE-subset? No: RE2 lacks lookahead,
    so the oracle spells the segment boundary with a capture-free
    alternation replace applied twice to cover adjacent segments)."""
    # NB: Spark uses (?=/|$) lookahead; RE2 cannot. The oracle instead
    # replaces '/digits(/|end)' keeping the boundary, applied twice so
    # '/1/2' (adjacent generalizable segments) converges identically.
    num = r"/\d+(/|$)"
    hexs = r"/[0-9a-f]{8,}(/|$)"
    path = f"regexp_extract({url_expr}, '^[a-z]+://[^/]+(/[^?#]*)?', 1)"
    t = path
    for rx in (num, num, hexs, hexs):
        t = f"regexp_replace({t}, '{rx}', '/{{id}}\\1', 'g')"
    return f"""
select regexp_extract({url_expr}, '^[a-z]+://([^/]+)', 1) as host,
       {t} as template, count(*)::bigint as n_urls
from ({urls_sql})
where regexp_extract({url_expr}, '^[a-z]+://([^/]+)', 1) <> ''
group by 1, 2 having count(*) >= {min_urls}
"""
