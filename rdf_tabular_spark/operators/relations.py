"""Lexico-syntactic relation extraction over web text — Hearst patterns
(Hearst, COLING 1992): surface patterns like "X such as A, B and C" that
signal hyponymy, the standard bootstrap for taxonomy induction from a raw
crawl (cf. WebIsA / Seitner et al. 2016, which ran exactly this over
Common Crawl).

This is the stage-2 sibling of mention detection (``web.entity_mentions``):
where entity linking grounds spans against a known dictionary, Hearst
extraction proposes NEW ``rdfs:subClassOf``-shaped edges with no dictionary
at all — the open-world half of KG construction the reference (a
closed-schema CSVW mapper, ``lib/rdf/tabular/reader.rb``) never needs.

Scale shape: pure per-row regexp work (JVM codegen, zero Python) and one
explode bounded by matches-per-document; the only shuffle is the optional
pair-count aggregation, keyed on the (tiny) extracted-pair vocabulary.
Patterns use no backreferences so Java regex (Spark) and RE2 (DuckDB)
agree match-for-match — the property the oracle check rides on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# A list item: one \w+ word. A list: items joined by ", " with an optional
# Oxford-comma-tolerant "and|or" tail. No backreferences → RE2-safe.
_LIST = r"\w+(?:, \w+)*(?:,? (?:and|or) \w+)?"

# pattern name -> (regex, hypernym group, hyponym-list group)
HEARST_PATTERNS: dict[str, tuple[str, int, int]] = {
    "such_as": (rf"(\w+) such as ({_LIST})", 1, 2),
    "including": (rf"(\w+), including ({_LIST})", 1, 2),
    "especially": (rf"(\w+), especially ({_LIST})", 1, 2),
    "and_other": (rf"(\w+(?:, \w+)*),? (?:and|or) other (\w+)", 2, 1),
}

# ", " / ", and " / " and " / " or " all normalize to the plain separator
_LIST_SEP_RE = r",? (?:and|or) "


def hearst_matches(docs: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """Extract hyponym/hypernym pairs → ``(id, hyponym, hypernym, pattern)``.

    Per pattern: ``regexp_extract_all`` pulls whole matches, an explode
    splits them out, group extraction on the (short) match string recovers
    the hypernym and the raw list, and a second explode unrolls the list —
    every step a narrow projection.  Terms are lowercased (pattern words
    are case-anchored by the regex itself).
    """
    parts = []
    for name, (rx, hyper_g, list_g) in HEARST_PATTERNS.items():
        m = (docs.select(F.col(id_col).alias("id"),
                         F.explode(F.regexp_extract_all(
                             F.col(text_col), F.lit(rx), F.lit(0)))
                         .alias("m"))
             .select("id",
                     F.lower(F.regexp_extract("m", rx, hyper_g))
                     .alias("hypernym"),
                     F.regexp_replace(
                         F.lower(F.regexp_extract("m", rx, list_g)),
                         _LIST_SEP_RE, ", ").alias("items"))
             .select("id",
                     F.explode(F.split("items", ", ")).alias("hyponym"),
                     "hypernym", F.lit(name).alias("pattern")))
        parts.append(m)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.select(F.col("id").alias(id_col), "hyponym", "hypernym",
                      "pattern")


def hearst_pair_counts(docs: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """Corpus-level taxonomy edges: ``(hyponym, hypernym, n_mentions,
    n_docs)`` — the support statistics a taxonomy-induction pass filters
    on (WebIsA keeps pairs above a mention threshold).  One aggregation
    keyed on the extracted-pair vocabulary."""
    m = hearst_matches(docs, text_col=text_col, id_col=id_col)
    return (m.groupBy("hyponym", "hypernym")
            .agg(F.count("*").cast("long").alias("n_mentions"),
                 F.countDistinct(id_col).cast("long").alias("n_docs")))


def _hearst_matches_sql_one(docs_sql: str, name: str, text_expr: str,
                            id_expr: str) -> str:
    rx, hyper_g, list_g = HEARST_PATTERNS[name]
    rx_lit = rx  # no backreferences, no quotes → safe as a DuckDB literal
    return f"""
select {id_expr} as doc_id,
       unnest(string_split(regexp_replace(lower(regexp_extract(m, '{rx_lit}',
              {list_g})), '{_LIST_SEP_RE}', ', ', 'g'), ', ')) as hyponym,
       lower(regexp_extract(m, '{rx_lit}', {hyper_g})) as hypernym,
       '{name}' as pattern
from (select {id_expr}, unnest(regexp_extract_all({text_expr}, '{rx_lit}'))
        as m from ({docs_sql}))
"""


def hearst_matches_sql(docs_sql: str, text_expr: str = "text",
                       id_expr: str = "doc_id") -> str:
    """DuckDB oracle for :func:`hearst_matches` (same patterns, RE2)."""
    return " union all ".join(
        _hearst_matches_sql_one(docs_sql, name, text_expr, id_expr)
        for name in HEARST_PATTERNS)


def hearst_pair_counts_sql(docs_sql: str, text_expr: str = "text",
                           id_expr: str = "doc_id") -> str:
    """DuckDB oracle for :func:`hearst_pair_counts`."""
    return f"""
select hyponym, hypernym, count(*)::bigint as n_mentions,
       count(distinct doc_id)::bigint as n_docs
from ({hearst_matches_sql(docs_sql, text_expr, id_expr)})
group by hyponym, hypernym
"""
