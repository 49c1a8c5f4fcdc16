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
