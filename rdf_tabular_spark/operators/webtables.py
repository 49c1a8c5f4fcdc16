"""Distributed datatype intuition over extracted web tables.

The reference intuits metadata CLASSES from JSON keys (metadata.rb:198-254)
but never sniffs cell datatypes — CSVW columns default to string unless the
metadata declares a type. At web scale most HTML tables carry NO CSVW
metadata, so a useful KG extractor must infer per-column types from the data
itself (the WebTables approach: vote per cell, aggregate per column, pick the
most specific type that covers every non-blank cell).

Pipeline shape (all JVM-side, zero Python UDFs):

1. ``explode_cells``: virtual rows (url, table_index, values:array<string>)
   → one row per cell via ``posexplode`` — narrow, no shuffle.
2. ``intuit_column_types``: one groupBy on the (tiny-cardinality) column key
   with map-side partial aggregation — boolean vote columns sum cheaply, and
   the output is one row per distinct table column, always driver-small.
3. ``apply_column_types``: broadcast the inferred profile back onto the cell
   stream and emit typed triples (obj_datatype = the XSD IRI) — broadcast
   hash join, no shuffle of the cell payload.

At 100 TB the only shuffle is step 2's partial-agg exchange over
(group key, col_idx) — a few thousand rows after map-side combine.

Vote patterns are anchored character-class regexes that behave identically
under Java regex (Spark ``rlike``) and RE2 (DuckDB ``regexp_matches``), so
every step is oracle-checkable by the driver's DuckDB cross-check.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

XSD = "http://www.w3.org/2001/XMLSchema#"

# Anchored, engine-portable lexical patterns (Java regex == RE2 here).
INT_RE = r"^[+-]?[0-9]+$"
DEC_RE = r"^[+-]?([0-9]+\.[0-9]*|\.[0-9]+)$"          # has a decimal point
SCI_RE = r"^[+-]?([0-9]+(\.[0-9]*)?|\.[0-9]+)[eE][+-]?[0-9]+$"
DATE_RE = r"^[0-9]{4}-[0-9]{2}-[0-9]{2}$"             # ISO 8601 date
DATETIME_RE = (r"^[0-9]{4}-[0-9]{2}-[0-9]{2}[T ]"
               r"[0-9]{2}:[0-9]{2}:[0-9]{2}(\.[0-9]+)?$")

#: intuited name → (XSD IRI, Spark cast type) — precedence order is the dict
#: order: most specific first, ``string`` is the fallback.
TYPE_LATTICE: dict[str, str] = {
    "boolean": XSD + "boolean",
    "integer": XSD + "integer",
    "decimal": XSD + "decimal",
    "double": XSD + "double",
    "date": XSD + "date",
    "dateTime": XSD + "dateTime",
    "string": XSD + "string",
}


def _is_blank(cell: Column) -> Column:
    return cell.isNull() | (F.trim(cell) == F.lit(""))


def cell_votes(cell: Column) -> dict[str, Column]:
    """Per-cell type-compatibility votes (1/0 longs so sums combine
    map-side). ``int`` counts toward decimal and double; ``decimal`` counts
    toward double — compatibility, not exact-match, so the lattice pick is a
    simple equality against the non-blank count."""
    t = F.trim(cell)
    is_int = t.rlike(INT_RE)
    is_dec = t.rlike(DEC_RE)
    is_sci = t.rlike(SCI_RE)
    one = lambda c: F.when(c, F.lit(1)).otherwise(F.lit(0)).cast("long")
    return {
        "n_bool": one(F.lower(t).isin("true", "false")),
        "n_int": one(is_int),
        "n_dec": one(is_int | is_dec),
        "n_dbl": one(is_int | is_dec | is_sci),
        "n_date": one(t.rlike(DATE_RE)),
        "n_datetime": one(t.rlike(DATETIME_RE)),
    }


def explode_cells(vrows: DataFrame) -> DataFrame:
    """Virtual rows → one row per cell: (url, table_index, row_num,
    source_num, col_idx, cell). ``posexplode`` is a narrow generator — no
    shuffle, no Python."""
    pos = F.posexplode("values").alias("col_idx", "cell")
    return vrows.select("url", "table_index", "row_num", "source_num", pos)


def intuit_column_types(cells: DataFrame,
                        group_cols: tuple[str, ...] = ("col_idx",),
                        min_frac: float = 1.0) -> DataFrame:
    """Aggregate cell votes per column key and pick the most specific type
    covering ≥ ``min_frac`` of the non-blank cells (default: ALL of them —
    one stray word demotes the column to string, the conservative choice for
    triple emission).

    Output: group_cols + (n_cells, n_blank, datatype, datatype_iri), one row
    per distinct column key — always tiny, safe to broadcast back.
    """
    votes = cell_votes(F.col("cell"))
    aggs = [F.count(F.lit(1)).alias("n_cells"),
            F.sum(F.when(_is_blank(F.col("cell")), 1).otherwise(0))
             .cast("long").alias("n_blank")]
    proj = cells
    for name, col in votes.items():
        # blanks vote for nothing: they are typeless, not counter-evidence
        proj = proj.withColumn(name, F.when(_is_blank(F.col("cell")),
                                            F.lit(0)).otherwise(col))
        aggs.append(F.sum(name).cast("long").alias(name))
    agg = proj.groupBy(*group_cols).agg(*aggs)

    nb = (F.col("n_cells") - F.col("n_blank")).cast("double")
    need = nb * F.lit(min_frac)
    covers = lambda n: (nb > 0) & (F.col(n).cast("double") >= need)
    datatype = (F.when(covers("n_bool"), "boolean")
                 .when(covers("n_int"), "integer")
                 .when(covers("n_dec"), "decimal")
                 .when(covers("n_dbl"), "double")
                 .when(covers("n_date"), "date")
                 .when(covers("n_datetime"), "dateTime")
                 .otherwise("string"))
    iri = F.concat(F.lit(XSD), F.col("datatype"))
    return (agg.withColumn("datatype", datatype)
               .withColumn("datatype_iri", iri)
               .select(*group_cols, "n_cells", "n_blank", "datatype",
                       "datatype_iri"))


def apply_column_types(cells: DataFrame, profile: DataFrame,
                       group_cols: tuple[str, ...] = ("col_idx",)) -> DataFrame:
    """Stamp each cell with its column's intuited datatype IRI: broadcast
    hash join of the (tiny) profile onto the cell stream — the payload never
    shuffles. Blank cells get a NULL datatype (they emit no triple)."""
    prof = F.broadcast(profile.select(*group_cols, "datatype", "datatype_iri"))
    joined = cells.join(prof, on=list(group_cols), how="left")
    blank = _is_blank(F.col("cell"))
    return (joined.withColumn("datatype",
                              F.when(blank, F.lit(None)).otherwise(F.col("datatype")))
                  .withColumn("datatype_iri",
                              F.when(blank, F.lit(None)).otherwise(F.col("datatype_iri"))))


def typed_cell_triples(cells_typed: DataFrame, headers: DataFrame | None = None,
                       base_sep: str = "#col-") -> DataFrame:
    """Typed triple emission from type-stamped cells: subject = url#row-N,
    predicate = url#col-I (or a header-derived name when ``headers`` maps
    (table_index, col_idx) → name), object = trimmed lexical value with the
    intuited XSD datatype. Blank cells are suppressed (CSVW null semantics).
    Pure projection — whole-stage codegen, no shuffle."""
    df = cells_typed.filter(F.col("datatype_iri").isNotNull())
    if headers is not None:
        hdr = F.broadcast(headers.select("table_index", "col_idx",
                                         F.col("name").alias("_hdr")))
        df = df.join(hdr, on=["table_index", "col_idx"], how="left")
        pred = F.concat(F.col("url"), F.lit(base_sep),
                        F.coalesce(F.col("_hdr"), F.col("col_idx").cast("string")))
    else:
        pred = F.concat(F.col("url"), F.lit(base_sep),
                        F.col("col_idx").cast("string"))
    return df.select(
        F.concat(F.col("url"), F.lit("#row-"),
                 F.col("row_num").cast("string")).alias("subj"),
        pred.alias("pred"),
        F.trim(F.col("cell")).alias("obj"),
        F.lit(False).alias("obj_is_iri"),
        F.col("datatype_iri").alias("obj_datatype"),
        F.lit(None).cast("string").alias("obj_lang"),
    )


def column_stats(cells: DataFrame,
                 group_cols: tuple[str, ...] = ("col_idx",)) -> DataFrame:
    """Type profile + uniqueness per column key: adds ``n_distinct`` (exact
    distinct non-blank values — Spark's two-phase distinct-agg rewrite keeps
    the partial aggregation map-side) and ``uniqueness`` = n_distinct /
    non-blank.  Output is one row per distinct column key — driver-small."""
    blank = _is_blank(F.col("cell"))
    dist = (cells.groupBy(*group_cols)
            .agg(F.countDistinct(F.when(~blank, F.trim("cell")))
                 .cast("long").alias("n_distinct")))
    prof = intuit_column_types(cells, group_cols=group_cols)
    nb = (F.col("n_cells") - F.col("n_blank")).cast("double")
    uniq = F.when(nb > 0, F.col("n_distinct").cast("double") / nb) \
            .otherwise(F.lit(0.0))
    return (prof.join(dist, on=list(group_cols), how="left")
                .withColumn("n_distinct",
                            F.coalesce("n_distinct", F.lit(0).cast("long")))
                .withColumn("uniqueness", uniq))


def pick_subject_column(stats: DataFrame,
                        group_cols: tuple[str, ...] = ()) -> DataFrame:
    """WebTables subject-column detection (Cafarella et al.; Venetis et al.):
    among the STRING-typed columns of each table schema, the subject column
    is the one with the highest value uniqueness (an entity key names mostly
    distinct entities), ties broken leftmost.  ``group_cols`` identifies the
    table schema ('' = one corpus-wide template, ("url","table_index") = per
    table).  Input is :func:`column_stats` output — already tiny — so the
    row_number window is over a driver-small frame."""
    from pyspark.sql import Window
    strings = stats.filter(F.col("datatype") == "string")
    if group_cols:
        w = Window.partitionBy(*group_cols)
    else:
        w = Window.partitionBy(F.lit(1))
    w = w.orderBy(F.col("uniqueness").desc(), F.col("col_idx").asc())
    return (strings.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select(*group_cols,
                    F.col("col_idx").alias("subject_col_idx"),
                    "n_distinct", "uniqueness"))


def entity_triples(vrows: DataFrame, pick: DataFrame,
                   group_cols: tuple[str, ...] = (),
                   entity_prefix: str = "#e-") -> DataFrame:
    """Entity-centric triple emission: every row's subject IRI is derived
    from its subject-column VALUE (url + '#e-' + md5(value)) instead of the
    row ordinal, so re-crawls of the same entity land on the same node.
    The subject value is read with ``element_at`` BEFORE the cells explode
    — the pick joins broadcast (per-schema, tiny) and everything else is a
    narrow generator stage; the payload never shuffles.

    Rows whose subject cell is blank are dropped (no entity to attach to);
    the subject column itself is not re-emitted as a property."""
    if group_cols:
        joined = vrows.join(F.broadcast(pick.select(*group_cols,
                                                    "subject_col_idx")),
                            on=list(group_cols), how="inner")
    else:
        joined = vrows.crossJoin(
            F.broadcast(pick.select("subject_col_idx").limit(1)))
    # F.get (0-based) not element_at: ANSI mode (Spark 4 default) makes
    # element_at THROW on out-of-bounds — a ragged scraped row must yield
    # a NULL subject (dropped below), not kill the job
    sval = F.trim(F.get("values", F.col("subject_col_idx")))
    joined = (joined.withColumn("_sval", sval)
              .filter(~(F.col("_sval").isNull() | (F.col("_sval") == "")))
              .withColumn("_subj", F.concat(F.col("url"),
                                            F.lit(entity_prefix),
                                            F.md5(F.col("_sval")))))
    pos = F.posexplode("values").alias("col_idx", "cell")
    cells = joined.select("url", "table_index", "_subj", "_sval",
                          "subject_col_idx", pos)
    blank = _is_blank(F.col("cell"))
    return (cells.filter((F.col("col_idx") != F.col("subject_col_idx"))
                         & ~blank)
            .select(F.col("_subj").alias("subj"),
                    F.concat(F.col("url"), F.lit("#col-"),
                             F.col("col_idx").cast("string")).alias("pred"),
                    F.trim(F.col("cell")).alias("obj"),
                    F.col("_sval").alias("subject_value")))


def table_schema_fingerprints(vrows_all: DataFrame) -> DataFrame:
    """Schema fingerprint per extracted table: md5 over the unit-separated
    header row (WebTables 'schema frequency' — stitching candidates are
    tables sharing a fingerprint).  Input is ``pages_to_virtual_rows(...,
    header_rows=0)`` output; the header is the source_num=1 row.  Pure
    projection — no shuffle."""
    hdr = vrows_all.filter(F.col("source_num") == 1)
    sig = F.md5(F.concat_ws("\x1f", F.transform("values",
                                                lambda v: F.trim(v))))
    return hdr.select("url", "table_index",
                      sig.alias("schema_sig"),
                      F.concat_ws(",", F.transform("values",
                                                   lambda v: F.trim(v)))
                       .alias("header_names"),
                      F.size("values").alias("n_cols"))


def schema_frequency(fps: DataFrame) -> DataFrame:
    """Stitchable-corpus profile: tables per schema fingerprint — ONE
    map-side-combined groupBy on the (low-cardinality) fingerprint."""
    return (fps.groupBy("schema_sig", "header_names", "n_cols")
            .agg(F.count(F.lit(1)).cast("long").alias("n_tables"),
                 F.countDistinct("url").cast("long").alias("n_pages")))


def predicate_range_profile(triples: DataFrame,
                            pred_key: Column | None = None) -> DataFrame:
    """KG schema induction: per predicate (class), the dominant object
    datatype and its share — the range induction step that turns emitted
    instance triples back into a vocabulary.  Two keyed aggregations over
    (pred_key, datatype) — both map-side-combined — then a row_number over
    the per-predicate frame (rows = distinct datatypes per predicate,
    driver-small).  ``pred_key`` defaults to the raw ``pred`` column; pass
    e.g. the URI fragment to profile across pages."""
    from pyspark.sql import Window
    key = (pred_key if pred_key is not None else F.col("pred")) \
        .alias("pred_class")
    counts = (triples.select(key, F.col("obj_datatype").alias("datatype"))
              .groupBy("pred_class", "datatype")
              .agg(F.count(F.lit(1)).cast("long").alias("n")))
    totals = (counts.groupBy("pred_class")
              .agg(F.sum("n").cast("long").alias("n_triples")))
    w = Window.partitionBy("pred_class").orderBy(F.col("n").desc(),
                                                 F.col("datatype").asc())
    dom = (counts.withColumn("_rn", F.row_number().over(w))
           .filter(F.col("_rn") == 1)
           .select("pred_class", F.col("datatype").alias("dominant_datatype"),
                   F.col("n").alias("dominant_n")))
    return (totals.join(dom, on="pred_class")
            .withColumn("dominant_frac",
                        F.col("dominant_n").cast("double")
                        / F.col("n_triples").cast("double")))
