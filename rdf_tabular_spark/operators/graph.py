"""Graph-side query operators over materialized (subj, pred, obj) triples:
summary statistics and the property-table pivot.

These are the read-path counterparts of sinks/graph_store.py — once stage 4
has materialized triples, downstream consumers want (a) a per-predicate
profile of the graph (cardinality planning, vocabulary drift detection
between crawl batches) and (b) star-query acceleration by pivoting an
entity's triples back into one wide row (the classic property-table layout
RDF stores use for subject-centric access, cf. Wilkinson 2006 "Jena
property table implementation"; the reference's ATD/JSON sinks
(rdf-tabular reader.rb:271-325) are the same row-wise view built at emit
time — this operator reconstructs it FROM the graph, relationally).

Scale notes (10^12 triples):
- ``predicate_stats`` is one groupBy on the predicate local name with
  partial (map-side) aggregation; the distinct counts use Spark's Expand
  strategy (one pass, 3× intermediate rows) — bounded by the number of
  predicates in the output, which is vocabulary-sized, not corpus-sized.
- ``property_table`` pivots with an EXPLICIT property list so Catalyst
  skips the extra distinct-values job, and aggregates with max (exact for
  the single-valued predicates CSVW mappings emit; deterministic, unlike
  first). One shuffle on subj — the same key the graph store buckets by,
  so on bucketed reads the exchange collapses.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def pred_local_name(pred: Column) -> Column:
    """Fragment (text after the last '#') — the CSVW-mapped property name
    (propertyUrl defaults to ``{table-url}#{column-name}``,
    rdf-tabular metadata.rb:1285-1289)."""
    return F.substring_index(pred, "#", -1)


def predicate_stats(triples: DataFrame) -> DataFrame:
    """Per-predicate graph profile: triple count, distinct subjects,
    distinct objects — keyed by the predicate's local name so per-document
    propertyUrl expansions aggregate into one vocabulary row."""
    return (triples
            .select(pred_local_name(F.col("pred")).alias("prop"),
                    "subj", "obj")
            .groupBy("prop")
            .agg(F.count("*").alias("n_triples"),
                 F.countDistinct("subj").alias("n_subjects"),
                 F.countDistinct("obj").alias("n_objects")))


def property_table(triples: DataFrame, props: Sequence[str]) -> DataFrame:
    """Pivot triples into one wide row per subject with a column per
    property local name (star-query / entity-export layout). ``props``
    must be the explicit property list — passing it avoids the extra
    distinct-scan pivot job and fixes the output schema for writers."""
    return (triples
            .withColumn("prop", pred_local_name(F.col("pred")))
            .groupBy("subj")
            .pivot("prop", list(props))
            .agg(F.max("obj")))
