"""N-Triples sink: triples DataFrame → serialized lines, Spark-native.

The serialization is pure Column expressions (whole-stage codegen — no Python
on the data path). Reference counterpart: reader.rb:468-473 add_statement +
the writer chosen by script/parse:16-25.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_XSD_STRING = "http://www.w3.org/2001/XMLSchema#string"


def _escape(c: Column) -> Column:
    # N-Triples string escaping: \ " \n \r \t
    c = F.regexp_replace(c, r"\\", r"\\\\")
    c = F.regexp_replace(c, '"', r'\\"')
    c = F.regexp_replace(c, "\n", r"\\n")
    c = F.regexp_replace(c, "\r", r"\\r")
    c = F.regexp_replace(c, "\t", r"\\t")
    return c


def _term(value: Column, is_iri: Column | None = None,
          datatype: Column | None = None, lang: Column | None = None) -> Column:
    iri_form = F.when(value.startswith("_:"), value).otherwise(F.concat(F.lit("<"), value, F.lit(">")))
    if is_iri is None:
        return iri_form
    quoted = F.concat(F.lit('"'), _escape(value), F.lit('"'))
    literal_form = (
        F.when(lang.isNotNull(), F.concat(quoted, F.lit("@"), lang))
        .when(datatype.isNotNull() & (datatype != _XSD_STRING),
              F.concat(quoted, F.lit("^^<"), datatype, F.lit(">")))
        .otherwise(quoted)
    )
    return F.when(is_iri, iri_form).otherwise(literal_form)


def to_ntriples_lines(triples: DataFrame) -> DataFrame:
    """→ single-column DataFrame ``line`` of N-Triples statements."""
    return triples.select(
        F.concat_ws(" ",
                    _term(F.col("subj")),
                    _term(F.col("pred")),
                    _term(F.col("obj"), F.col("obj_is_iri"),
                          F.col("obj_datatype"), F.col("obj_lang")),
                    F.lit(".")).alias("line")
    )


def write_ntriples(triples: DataFrame, path: str, mode: str = "overwrite") -> None:
    to_ntriples_lines(triples).write.mode(mode).text(path)


def to_nquads_lines(triples: DataFrame,
                    graph_col: str = "table_url") -> DataFrame:
    """→ single-column ``line`` of N-Quads statements: the graph label
    (``graph_col``, the store's per-statement provenance) becomes the 4th
    term; NULL graphs serialize as default-graph (3-term) statements.
    Round-trips with sources.ntriples_source.read_nquads."""
    graph_term = F.when(F.col(graph_col).isNotNull(),
                        _term(F.col(graph_col)))
    return triples.select(
        F.concat_ws(" ",
                    _term(F.col("subj")),
                    _term(F.col("pred")),
                    _term(F.col("obj"), F.col("obj_is_iri"),
                          F.col("obj_datatype"), F.col("obj_lang")),
                    graph_term,
                    F.lit(".")).alias("line")
    )


def write_nquads(triples: DataFrame, path: str, mode: str = "overwrite",
                 graph_col: str = "table_url") -> None:
    to_nquads_lines(triples, graph_col).write.mode(mode).text(path)
