"""Turtle sink: triples DataFrame → subject-grouped .ttl part files.

The reference serializes through RDF.rb writers with Turtle as the
human-facing default (rdf-tabular script/parse:16-25 picks the writer by
extension; spec goldens are .ttl). N-Triples stays the bulk-interchange
sink (sinks/ntriples.py, one line per statement); this sink produces the
compact subject-grouped form — ``subj pred1 obj1 ; pred2 obj2 .`` — for
exports meant to be read.

Spark shape: term rendering is pure Column expressions (whole-stage
codegen); the subject grouping is ONE groupBy(subj) with
``sort_array(collect_list(...))`` per group — deterministic output
independent of partitioning. Each part file is a complete, valid Turtle
document: @prefix headers are NOT emitted (all IRIs are written absolute),
so files can be concatenated or read individually. Group sizes are
per-subject (CSVW mappings emit a handful of triples per subject), so the
collect_list never materializes more than one subject's triples.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .ntriples import _term


def to_turtle_lines(triples: DataFrame) -> DataFrame:
    """→ single-column DataFrame ``line``: one subject-grouped Turtle
    statement block per row (predicates ';'-separated, sorted for
    determinism)."""
    po = F.concat_ws(" ",
                     _term(F.col("pred")),
                     _term(F.col("obj"), F.col("obj_is_iri"),
                           F.col("obj_datatype"), F.col("obj_lang")))
    return (triples
            .select(F.col("subj"), po.alias("po"))
            .groupBy("subj")
            .agg(F.sort_array(F.collect_list("po")).alias("pos"))
            .select(F.concat(
                _term(F.col("subj")), F.lit(" "),
                F.array_join(F.col("pos"), " ;\n    "),
                F.lit(" .")).alias("line")))


def write_turtle(triples: DataFrame, path: str, mode: str = "overwrite") -> None:
    to_turtle_lines(triples).write.mode(mode).text(path)
