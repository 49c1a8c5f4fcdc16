"""Query registry for the driver contract (``__spark_entry__.py``).

Each entry couples a Spark DataFrame program with an ANSI-SQL oracle that
DuckDB runs over the same parquet tables; the driver hash-compares values, so
every computed column is built from operations whose results are
**bit-identical** across both engines (md5, IEEE double arithmetic folded in
the same order, decimal-exact aggregation). Where an expression family is
delicate (language-ID CASE, SimHash bit terms, MinHash permutations, cosine
sums), the SQL is *generated from the same Python loops* that build the
Column expressions — one source of truth, two engines.

Coverage map (SURVEY.md §2):
  csvw_*   — the reference's operator families re-expressed relationally:
             U1-U5 triple melt, C3-C6 coercion, C1 list split, C5 boolean,
             P5/P9/P10 trim/null/default, S7 JSON rows, U2 templates.
  agg_/join_/window_/fk_ — relational substrate (Catalyst-native; scan
             pushdown, broadcast joins, partial aggregation).
  text_/dedup_/ann_/multimodal_ — training-data extensions (§2.9).
  kg_*     — the web pipeline end-to-end (HTML → virtual rows → CSVW kernel
             → triples → entity links → canonicalization).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .operators import curate as curate_ops
from .operators.void import void_sql as _void_sql
from .operators import dedup as D
from .operators import similarity as S
from .operators import text as T

EMB_DIM = 64
MENTIONS_PRED = "https://kg.example.org/ontology#mentions"
SOURCE_ENT_PREFIX = "https://kg.example.org/entity/source/"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------------------
# shared SQL fragments (one source of truth with the Column builders)
# ---------------------------------------------------------------------------

TOKS_SQL = r"string_split_regex(trim(text), '\s+')"


def _grams_sql(t: str, n: int = 3) -> str:
    cat = " || ' ' || ".join(f"{t}[i+{j}]" if j else f"{t}[i]" for j in range(n))
    return (f"case when len({t}) >= {n} then "
            f"list_distinct(list_transform(range(1, len({t}) - {n - 2}), i -> {cat})) "
            f"else [] end")


def _minhash_sig_sql(g: str, num_perm: int = 8) -> str:
    return (f"list_transform(range(0, {num_perm}), "
            f"i -> list_min(list_transform({g}, x -> md5(i || ':' || x))))")


def _minhash_scale_sig_sql(sh: str, num_perm: int = 16, seed: int = 1) -> str:
    """SQL mirror of operators/minhash.minhash_signatures: per permutation i,
    min over token hashes x of ((a_i*x + b_i) mod 2^64) mod (2^61-1) — the
    numpy kernel's uint64 wraparound made explicit with hugeint arithmetic.
    Generated from the SAME _perm_params constants as the Arrow kernel."""
    from .operators.minhash import _MERSENNE, _perm_params
    a_p, b_p = _perm_params(num_perm, seed)
    mins = ", ".join(
        f"list_min(list_transform({sh}, x -> "
        f"((({int(a)}::hugeint * x::hugeint + {int(b)}) % {1 << 64}) "
        f"% {_MERSENNE})::bigint))"
        for a, b in zip(a_p, b_p))
    return f"[{mins}]"


# token hashing of the scale tier: first 8 bytes of md5, big-endian
_TOKHASH_SQL = "('0x' || substring(md5(t), 1, 16))::ubigint"


def _langid_case_sql(toks: str) -> str:
    score = {lang: f"len(list_filter({toks}, x -> x in "
                   f"({', '.join(repr(m) for m in markers)})))"
             for lang, markers in T.LANG_MARKERS.items()}
    whens = []
    for idx, lang in enumerate(T.LANG_ORDER):
        s = score[lang]
        conds = [f"{s} > 0"]
        conds += [f"{s} > {score[o]}" for o in T.LANG_ORDER[:idx]]
        conds += [f"{s} >= {score[o]}" for o in T.LANG_ORDER[idx + 1:]]
        whens.append(f"when {' and '.join(conds)} then '{lang}'")
    return "case " + " ".join(whens) + " else 'und' end"


def _simhash_sql(toks: str) -> str:
    tv = (f"list_transform({toks}, x -> "
          f"('0x' || substring(md5(x), 1, 4))::bigint)")
    terms = []
    for b in range(D.SIMHASH_BITS):
        ones = f"len(list_filter({tv}, v -> (v & {1 << b}) <> 0))"
        terms.append(f"(case when {ones} * 2 > len({tv}) then 1 else 0 end) "
                     f"* {1 << b}")
    return " + ".join(terms)


def _simhash48_sql(toks: str) -> str:
    """48-bit SimHash mirror (production width, sign-safe in bigint)."""
    tv = (f"list_transform({toks}, x -> "
          f"('0x' || substring(md5(x), 1, 12))::bigint)")
    terms = []
    for b in range(D.SIMHASH48_BITS):
        ones = f"len(list_filter({tv}, v -> (v & {1 << b}) <> 0))"
        terms.append(f"(case when {ones} * 2 > len({tv}) then 1 else 0 end) "
                     f"* {1 << b}")
    return " + ".join(terms)


def _dot_sql(a: str, b: str, dim: int = EMB_DIM) -> str:
    return " + ".join(f"{a}[{i}]::double * {b}[{i}]::double"
                      for i in range(1, dim + 1))


def _cos_sql(a: str, b: str, dim: int = EMB_DIM) -> str:
    return (f"({_dot_sql(a, b, dim)}) / "
            f"(sqrt({_dot_sql(a, a, dim)}) * sqrt({_dot_sql(b, b, dim)}))")


def _hyperplane_sig_sql(vec: str, dim: int = EMB_DIM, n_planes: int = 8) -> str:
    plane_terms = []
    for p in range(n_planes):
        terms = []
        for i in range(dim):
            w = float(((p * dim + i) * 2654435761) % (1 << 32)) / float(1 << 31) - 1.0
            terms.append(f"{vec}[{i + 1}]::double * {w!r}")
        plane_terms.append(f"(case when ({' + '.join(terms)}) >= 0 "
                           f"then 1 else 0 end) * {1 << p}")
    return " + ".join(plane_terms)


STOPS_SQL = ", ".join(repr(s) for s in T.ENGLISH_STOPWORDS)
PUNCT_CLASS = "[^.,;:!?''\"()\\[\\]-]"  # SQL-quoted form of text.punct class
BPE_SQL = r"'[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'"
DOC_URL_SQL = "'http://pages.example.org/doc/' || doc_id"


# ---------------------------------------------------------------------------
# Spark query programs
# ---------------------------------------------------------------------------

def _csvw_triples_nation(spark, sf_dir):
    """U1-U5: URI-template expansion + cell-triple melt over a relational
    table (reference: reader.rb:154-183 re-expressed as explode of structs)."""
    nation = _t(spark, sf_dir, "nation")
    subj = F.concat(F.lit("http://example.org/nation/"),
                    F.col("n_nationkey").cast("string"))
    triples = F.array(
        F.struct(F.lit("http://example.org/def#name").alias("pred"),
                 F.col("n_name").alias("obj"), F.lit(False).alias("obj_is_iri")),
        F.struct(F.lit("http://example.org/def#region").alias("pred"),
                 F.concat(F.lit("http://example.org/region/"),
                          F.col("n_regionkey").cast("string")).alias("obj"),
                 F.lit(True).alias("obj_is_iri")),
        F.struct(F.lit("http://www.w3.org/1999/02/22-rdf-syntax-ns#type").alias("pred"),
                 F.lit("http://example.org/def#Nation").alias("obj"),
                 F.lit(True).alias("obj_is_iri")),
    )
    return (nation.select(subj.alias("subj"), F.explode(triples).alias("t"))
            .select("subj", F.col("t.pred").alias("pred"),
                    F.col("t.obj").alias("obj"),
                    F.col("t.obj_is_iri").alias("obj_is_iri")))


_CSVW_TRIPLES_NATION_SQL = """
select 'http://example.org/nation/' || n_nationkey as subj,
       'http://example.org/def#name' as pred, n_name as obj, false as obj_is_iri
from nation
union all
select 'http://example.org/nation/' || n_nationkey,
       'http://example.org/def#region',
       'http://example.org/region/' || n_regionkey, true
from nation
union all
select 'http://example.org/nation/' || n_nationkey,
       'http://www.w3.org/1999/02/22-rdf-syntax-ns#type',
       'http://example.org/def#Nation', true
from nation
"""


def _csvw_coerce_numeric(spark, sf_dir):
    """C3/C4: groupChar-formatted lexical built by exact integer surgery, then
    normalized (strip ',') and cast — byte-identical with the oracle
    (reference: metadata.rb:1766-1801)."""
    li = _t(spark, sf_dir, "lineitem")
    cents = F.round(F.col("l_extendedprice") * 100, 0).cast("long")
    dollars = F.floor(cents / 100).cast("long")
    frac = (cents % 100).cast("long")
    thousands = F.floor(dollars / 1000).cast("long")
    rem = (dollars % 1000).cast("long")
    grouped = F.when(dollars >= 1000,
                     F.concat(thousands.cast("string"), F.lit(","),
                              F.lpad(rem.cast("string"), 3, "0"))) \
        .otherwise(dollars.cast("string"))
    lexical = F.concat(grouped, F.lit("."), F.lpad(frac.cast("string"), 2, "0"))
    parsed = F.regexp_replace(lexical, ",", "").cast("double")
    return li.select("l_orderkey", "l_linenumber", lexical.alias("lexical"),
                     parsed.alias("parsed"))


_CSVW_COERCE_NUMERIC_SQL = """
with c as (
  select l_orderkey, l_linenumber,
         cast(round(l_extendedprice * 100) as bigint) as cents
  from lineitem),
p as (
  select l_orderkey, l_linenumber, cents // 100 as dollars, cents % 100 as frac
  from c),
l as (
  select l_orderkey, l_linenumber,
         (case when dollars >= 1000
               then (dollars // 1000)::varchar || ',' ||
                    lpad((dollars % 1000)::varchar, 3, '0')
               else dollars::varchar end)
         || '.' || lpad(frac::varchar, 2, '0') as lexical
  from p)
select l_orderkey, l_linenumber, lexical,
       cast(replace(lexical, ',', '') as double) as parsed
from l
"""


def _csvw_date_format(spark, sf_dir):
    """C6: picture-string date round-trip (reference: metadata.rb:1822-1893,
    'd/M/yyyy' from the supported pattern set)."""
    li = _t(spark, sf_dir, "lineitem")
    lex = F.date_format("l_shipdate", "d/M/yyyy")
    iso = F.to_date(lex, "d/M/yyyy").cast("string")
    return li.select("l_orderkey", "l_linenumber", lex.alias("lex"),
                     iso.alias("iso"))


_CSVW_DATE_FORMAT_SQL = """
select l_orderkey, l_linenumber,
       strftime(l_shipdate, '%-d/%-m/%Y') as lex,
       strptime(strftime(l_shipdate, '%-d/%-m/%Y'), '%-d/%-m/%Y')::date::varchar as iso
from lineitem
"""


def _csvw_null_default_trim(spark, sf_dir):
    """P5/P9/P10: null-list match → NULL, empty→default, trim
    (reference: metadata.rb:1672-1695)."""
    docs = _t(spark, sf_dir, "documents")
    src_null = F.when(F.col("source") == "src0", F.lit(None)).otherwise(F.col("source"))
    return docs.select(
        "doc_id", src_null.alias("src_null"),
        F.coalesce(src_null, F.lit("unknown")).alias("src_default"),
        F.substring(F.trim(F.col("text")), 1, 20).alias("t20"))


_CSVW_NULL_DEFAULT_TRIM_SQL = """
select doc_id, nullif(source, 'src0') as src_null,
       coalesce(nullif(source, 'src0'), 'unknown') as src_default,
       substring(trim(text), 1, 20) as t20
from documents
"""


def _csvw_json_rows(spark, sf_dir):
    """S7: JSON row serialization (reference: reader.rb:276-382) via
    to_json(struct(...)) — pure codegen, no Python."""
    nation = _t(spark, sf_dir, "nation")
    return nation.select(
        "n_nationkey",
        F.to_json(F.struct("n_nationkey", "n_name")).alias("json"))


_CSVW_JSON_ROWS_SQL = """
select n_nationkey,
       to_json(struct_pack(n_nationkey := n_nationkey, n_name := n_name)) as json
from nation
"""


def _csvw_list_split(spark, sf_dir):
    """C1: separator split → one row per element (reference:
    metadata.rb:1674,1711; rdf:List linearization is the ordered variant)."""
    part = _t(spark, sf_dir, "part")
    return part.select("p_partkey",
                       F.explode(F.split("p_name", " ")).alias("word"))


_CSVW_LIST_SPLIT_SQL = """
select p_partkey, unnest(string_split(p_name, ' ')) as word from part
"""


def _csvw_boolean_format(spark, sf_dir):
    """C5: custom boolean format 'Y|N' parse (reference: metadata.rb:1802-1821)."""
    ev = _t(spark, sf_dir, "events")
    lex = F.when(F.col("event_id") % 2 == 0, F.lit("Y")).otherwise(F.lit("N"))
    return ev.select("event_id", lex.alias("lex"),
                     (lex == "Y").alias("parsed"))


_CSVW_BOOLEAN_FORMAT_SQL = """
select event_id, case when event_id % 2 = 0 then 'Y' else 'N' end as lex,
       case when event_id % 2 = 0 then 'Y' else 'N' end = 'Y' as parsed
from events
"""


def _csvw_uri_template(spark, sf_dir):
    """U2: template expansion with percent-encoding of the bound value
    (simple-expansion subset; full RFC 6570 lives in csvw/uri_template.py)."""
    part = _t(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.concat(F.lit("http://example.org/part/"),
                 F.regexp_replace("p_name", " ", "%20")).alias("iri"))


_CSVW_URI_TEMPLATE_SQL = """
select p_partkey,
       'http://example.org/part/' || replace(p_name, ' ', '%20') as iri
from part
"""


# --- relational substrate ---------------------------------------------------

def _agg_pricing_summary(spark, sf_dir):
    """TPC-H Q1 shape: scan → partial agg → final agg. Decimal-exact sums so
    the result is order-independent (double sums are not associative)."""
    li = _t(spark, sf_dir, "lineitem")
    dec = lambda c: F.col(c).cast("decimal(38,4)")
    return (li.groupBy("l_returnflag", "l_linestatus")
            .agg(F.sum(dec("l_quantity")).cast("double").alias("sum_qty"),
                 F.sum(dec("l_extendedprice")).cast("double").alias("sum_base_price"),
                 F.count("*").alias("count_order")))


_AGG_PRICING_SUMMARY_SQL = """
select l_returnflag, l_linestatus,
       cast(sum(cast(l_quantity as decimal(38,4))) as double) as sum_qty,
       cast(sum(cast(l_extendedprice as decimal(38,4))) as double) as sum_base_price,
       count(*) as count_order
from lineitem
group by l_returnflag, l_linestatus
"""


def _join_order_revenue(spark, sf_dir):
    """TPC-H Q3 shape: selective dim filter broadcast through a fact join;
    revenue summed decimal-exact; top-10 via TakeOrdered."""
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    rev = (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))) \
        .cast("decimal(38,4)")
    return (li.join(orders, li.l_orderkey == orders.o_orderkey)
            .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
            .groupBy("o_orderkey", "o_orderdate")
            .agg(F.sum(rev).cast("double").alias("revenue"))
            .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
            .limit(10))


def _join_supplier_profit(spark, sf_dir):
    """TPC-H Q9 shape: fact scan with TWO broadcast dim joins (supplier →
    nation chain + filtered part), profit summed decimal-exact per
    (nation, brand). The p_type filter pushes to the part scan; both dim
    sides broadcast — the only shuffle is the final low-cardinality
    groupBy."""
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    part = _t(spark, sf_dir, "part").filter(
        F.col("p_type").startswith("SMALL"))
    profit = (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
              - F.col("l_quantity") * F.col("p_retailprice")) \
        .cast("decimal(38,4)")
    return (li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
            .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
            .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
            .groupBy("n_name", "p_brand")
            .agg(F.count("*").cast("long").alias("n_items"),
                 F.sum(profit).cast("double").alias("profit")))


_JOIN_SUPPLIER_PROFIT_SQL = """
select n_name, p_brand, cast(count(*) as bigint) as n_items,
       cast(sum(cast(l_extendedprice * (1.0 - l_discount)
                     - l_quantity * p_retailprice as decimal(38,4)))
            as double) as profit
from lineitem
join part on l_partkey = p_partkey
join supplier on l_suppkey = s_suppkey
join nation on s_nationkey = n_nationkey
where p_type like 'SMALL%'
group by n_name, p_brand
"""


_JOIN_ORDER_REVENUE_SQL = """
select o_orderkey, o_orderdate,
       cast(sum(cast(l_extendedprice * (1.0 - l_discount) as decimal(38,4)))
            as double) as revenue
from lineitem
join orders on l_orderkey = o_orderkey
join customer on o_custkey = c_custkey
where c_mktsegment = 'BUILDING'
group by o_orderkey, o_orderdate
order by revenue desc, o_orderkey
limit 10
"""


def _window_top_events(spark, sf_dir):
    """Window top-k per key (row numbering, SURVEY §2.7)."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").desc(),
                                              F.col("event_id"))
    return (ev.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= 2)
            .select("user_id", "event_id", "rnk"))


_WINDOW_TOP_EVENTS_SQL = """
select user_id, event_id, rnk from (
  select user_id, event_id,
         row_number() over (partition by user_id order by ts desc, event_id) as rnk
  from events) where rnk <= 2
"""


def _events_sessionize(spark, sf_dir):
    """Gap-based sessionization (30-min inactivity closes a session) — the
    clickstream primitive behind engagement/funnel tables. One per-user
    window (lag + running sum of session breaks), then a (user, session)
    groupBy that reuses the same hash partitioning. Microsecond epoch
    arithmetic (unix_micros / epoch_us) keeps the gap comparison and the
    start/end columns integer-exact across engines; the value sum goes
    through decimal(38,4) like agg_events_daily."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # events.ts is TIMESTAMP_NTZ; the cast interprets it in the session tz
    # (UTC here), matching DuckDB's epoch_us over the naive value — the
    # same convention dedup_url_latest's epoch column relies on
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    gap = us - F.lag(us).over(w)
    brk = F.when(gap.isNull() | (gap > 1800 * 1_000_000), 1).otherwise(0)
    run = (Window.partitionBy("user_id").orderBy("ts", "event_id")
           .rowsBetween(Window.unboundedPreceding, 0))
    sess = ev.withColumn("session_seq",
                         F.sum(brk).over(run).cast("long"))
    return (sess.groupBy("user_id", "session_seq")
            .agg(F.count("*").alias("n_events"),
                 F.min(us).alias("start_us"),
                 F.max(us).alias("end_us"),
                 F.sum(F.col("value").cast("decimal(38,4)"))
                 .cast("double").alias("sum_value")))


_EVENTS_SESSIONIZE_SQL = """
with g as (
  select user_id, event_id, value, epoch_us(ts) as us,
         case when epoch_us(ts) - lag(epoch_us(ts))
                over (partition by user_id order by ts, event_id)
              > 1800 * 1000000 then 1
              when lag(epoch_us(ts))
                over (partition by user_id order by ts, event_id) is null
              then 1 else 0 end as brk
  from events),
s as (
  select user_id, value, us,
         sum(brk) over (partition by user_id order by us, event_id
                        rows between unbounded preceding and current row)
           ::bigint as session_seq
  from g)
select user_id, session_seq, count(*) as n_events,
       min(us) as start_us, max(us) as end_us,
       cast(sum(cast(value as decimal(38,4))) as double) as sum_value
from s group by user_id, session_seq
"""


def _agg_events_daily(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return (ev.groupBy(F.to_date("ts").alias("day"), "event_type")
            .agg(F.count("*").alias("n"),
                 F.sum(F.col("value").cast("decimal(38,4)"))
                 .cast("double").alias("sum_value")))


_AGG_EVENTS_DAILY_SQL = """
select ts::date as day, event_type, count(*) as n,
       cast(sum(cast(value as decimal(38,4))) as double) as sum_value
from events
group by ts::date, event_type
"""


def _agg_salted_count(spark, sf_dir):
    """Skew-proof two-stage count (operators/skew.py) vs the plain groupBy
    oracle — proves the salted partial/final split changes the plan, not
    the answer (north_rule: explicit skew handling)."""
    from .operators import skew as SK
    ev = _t(spark, sf_dir, "events")
    return SK.two_stage_count(ev, "event_type")


_AGG_SALTED_COUNT_SQL = """
select event_type, count(*) as n from events group by event_type
"""


def _fk_orders_customer(spark, sf_dir):
    """M6/§2.6: data-level FK integrity check the reference only declares
    (metadata.rb:517-541 FIXME) — left-anti join, broadcast parent."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    orphans = orders.join(F.broadcast(cust),
                          orders.o_custkey == cust.c_custkey, "left_anti")
    return orphans.agg(F.count("*").alias("n_orphans"))


_FK_ORDERS_CUSTOMER_SQL = """
select count(*) as n_orphans from orders o
where not exists (select 1 from customer c where c.c_custkey = o.o_custkey)
"""


def _fk_group_integrity(spark, sf_dir):
    """M6 data tier wired through DECLARED ``schema.foreignKeys``: build a
    CSVW TableGroup (nation as child, region truncated to r_regionkey < 3
    as parent) and run ``pipeline.validate_foreign_keys`` — violations are
    exactly the nations referencing the dropped regions. Exercises the
    whole declared-FK path (metadata parse → key-tuple extraction →
    distinct parent anti-join), the check the reference FIXMEs
    (metadata.rb:536-540). Fixture CSVs are derived from the sf tables
    (driver-side collect of 30 dimension rows — setup, not the data path)."""
    import json as _json
    import os
    from .csvw.model import load_metadata
    from .pipeline import validate_foreign_keys
    root = f"/tmp/spark_graft_fkgroup_{os.path.basename(sf_dir.rstrip('/'))}"
    os.makedirs(root, exist_ok=True)
    nation = sorted((r["n_nationkey"], r["n_name"], r["n_regionkey"])
                    for r in _t(spark, sf_dir, "nation").collect())
    region = sorted((r["r_regionkey"], r["r_name"])
                    for r in _t(spark, sf_dir, "region").collect()
                    if r["r_regionkey"] < 3)
    with open(os.path.join(root, "nation.csv"), "w") as f:
        f.write("n_nationkey,n_name,n_regionkey\n")
        f.writelines(f"{k},{n},{rk}\n" for k, n, rk in nation)
    with open(os.path.join(root, "region.csv"), "w") as f:
        f.write("r_regionkey,r_name\n")
        f.writelines(f"{k},{n}\n" for k, n in region)
    gpath = os.path.join(root, "group.json")
    with open(gpath, "w") as f:
        _json.dump({
            "@context": "http://www.w3.org/ns/csvw",
            "tables": [
                {"url": "region.csv", "tableSchema": {
                    "columns": [{"name": "r_regionkey"}, {"name": "r_name"}],
                    "primaryKey": "r_regionkey"}},
                {"url": "nation.csv", "tableSchema": {
                    "columns": [{"name": "n_nationkey"}, {"name": "n_name"},
                                {"name": "n_regionkey"}],
                    "foreignKeys": [{
                        "columns": "n_regionkey",
                        "reference": {"resource": "region.csv",
                                      "columns": "r_regionkey"}}]}},
            ]}, f)
    group = load_metadata(gpath, base=gpath, resolver=lambda u: u)
    viol = validate_foreign_keys(spark, group, resolver=lambda u: u)
    # Scalar output columns only: the driver canonicalizes via pandas
    # sort_values, which cannot hash raw array cells — flatten the key
    # tuple and the (sorted) source-row list to comma-joined strings.
    return viol.select(
        F.element_at(F.split("child_url", "/"), -1).alias("child_url"),
        "fk_index",
        F.concat_ws(",", "key").alias("key"),
        "n_rows",
        F.concat_ws(",", F.transform(F.sort_array("source_nums"),
                                     lambda x: x.cast("string")))
         .alias("source_nums")).orderBy("key")


# nation.csv is written sorted by n_nationkey with one header line, so a
# row's physical line = its n_nationkey rank + 1 (header) + 1 (1-based)
_FK_GROUP_INTEGRITY_SQL = """
with child as (
  select n_regionkey,
         row_number() over (order by n_nationkey) + 1 as source_num
  from nation
)
select 'nation.csv' as child_url, cast(0 as int) as fk_index,
       cast(n_regionkey as varchar) as key,
       count(*) as n_rows,
       string_agg(cast(source_num as varchar), ',' order by source_num)
         as source_nums
from child
where n_regionkey not in
      (select r_regionkey from region where r_regionkey < 3)
group by n_regionkey
order by key
"""


# --- text analysis ----------------------------------------------------------

def _text_quality(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    text = F.col("text")
    return docs.select(
        "doc_id",
        T.token_count(text).cast("long").alias("n_tokens"),
        T.bpe_token_count(text).cast("long").alias("n_bpe"),
        F.round(T.stopword_ratio(text), 4).alias("stop_ratio"),
        T.quality_score(text).alias("quality"))


_TEXT_QUALITY_SQL = f"""
select doc_id,
       len({TOKS_SQL}) as n_tokens,
       len(regexp_extract_all(text, {BPE_SQL})) as n_bpe,
       round(len(list_filter({TOKS_SQL}, x -> x in ({STOPS_SQL})))
             / len({TOKS_SQL}), 4) as stop_ratio,
       round((least(len({TOKS_SQL})::double / 20.0, 1.0)
              + least(len(list_filter({TOKS_SQL}, x -> x in ({STOPS_SQL})))
                      / len({TOKS_SQL}) * 4, 1.0)
              + greatest(1.0 - (case when length(text) = 0 then 0.0
                  else length(regexp_replace(text, '{PUNCT_CLASS}', '', 'g'))
                       / length(text) end) * 5, 0.0)) / 3, 4) as quality
from documents
"""


def _text_c4_lines(spark, sf_dir):
    """C4 line-level cleaning: the fixture corpus is single-line without
    terminal punctuation, so deterministic extra lines are appended first —
    one keepable sentence per doc, one javascript line, one too-short line,
    one brace line — and the check proves exactly the sentence survives."""
    from .operators.curate import c4_clean_lines
    docs = _t(spark, sf_dir, "documents")
    aug = docs.withColumn(
        "text",
        F.concat(F.col("text"),
                 F.lit("\nA kept sentence about document "),
                 F.col("doc_id").cast("string"), F.lit("."),
                 F.lit("\nthis javascript line is dropped."),
                 F.lit("\nShort one."),
                 F.lit("\nvar x = {a: 1}.")))
    return c4_clean_lines(aug, min_words=3)


_TEXT_C4_LINES_SQL = """
with d as (
  select doc_id,
         string_split(text || chr(10) || 'A kept sentence about document '
                      || doc_id || '.'
                      || chr(10) || 'this javascript line is dropped.'
                      || chr(10) || 'Short one.'
                      || chr(10) || 'var x = {a: 1}.', chr(10)) as ls
  from documents),
k as (
  select doc_id,
         list_filter(ls, l ->
           regexp_matches(l, '[.!?"]$')
           and len(string_split_regex(trim(l), '\\s+')) >= 3
           and not contains(lower(l), 'javascript')
           and not contains(lower(l), 'lorem ipsum')
           and not contains(l, '{')) as kept,
         len(ls) as n_lines
  from d)
select doc_id, array_to_string(kept, chr(10)) as clean_text,
       len(kept)::bigint as n_kept,
       (n_lines - len(kept))::bigint as n_removed
from k
"""


_BOILER = "COOKIE BANNER: accept all cookies\nfooter: terms of service apply"


def _dedup_corpus_lines(spark, sf_dir):
    """C4-style cross-corpus boilerplate-line removal: every line occurring
    in ≥3 distinct documents is dropped and documents are reassembled
    (operators/dedup.remove_repeated_lines — md5-keyed line frequency, one
    groupBy + anti-join, per-doc array reassembly). The fixture corpus has
    no naturally repeated lines, so a deterministic two-line banner is
    appended to even doc_ids first; the check then proves exactly those
    lines are stripped and original content survives byte-identically."""
    docs = _t(spark, sf_dir, "documents")
    aug = docs.withColumn(
        "text",
        F.when(F.col("doc_id") % 2 == 0,
               F.concat(F.col("text"), F.lit("\n" + _BOILER)))
         .otherwise(F.col("text")))
    return D.remove_repeated_lines(aug, min_docs=3)


_DEDUP_CORPUS_LINES_SQL = f"""
with d as (
  select doc_id as id,
         string_split(case when doc_id % 2 = 0
                      then text || chr(10) || '{_BOILER.replace(chr(10), "' || chr(10) || '")}'
                      else text end, chr(10)) as ls
  from documents),
l as (
  select id, unnest(list_transform(range(1, len(ls) + 1),
             i -> {{'pos': i - 1, 'line': ls[i]}}), recursive := true)
  from d),
k as (select id, pos, line, substring(md5(line), 1, 16) as k from l),
b as (select k from k group by k having count(distinct id) >= 3),
kept as (select * from k where k not in (select k from b)),
rem as (select id, count(*) as n_removed from k
        where k in (select k from b) group by id)
select kept.id as doc_id,
       string_agg(kept.line, chr(10) order by kept.pos) as clean_text,
       count(*)::bigint as n_kept,
       coalesce(max(rem.n_removed), 0)::bigint as n_removed
from kept left join rem on kept.id = rem.id
group by kept.id
"""


def _corpus_stats(spark, sf_dir):
    """Per-language corpus telemetry (the dashboard numbers every ingestion
    run reports): doc counts, char/token totals, size extremes. Integer
    aggregates only — exact in both engines; one map-side-combined groupBy
    on a low-cardinality key."""
    docs = _t(spark, sf_dir, "documents")
    # Deterministic row order + explicit int64 on every aggregate in BOTH
    # engines (DuckDB sum(bigint) widens to HUGEINT otherwise) so the
    # driver's value hash can never flake on groupBy output ordering or
    # integer width.
    return (docs.groupBy("lang")
            .agg(F.count("*").cast("long").alias("n_docs"),
                 F.sum(F.col("n_chars").cast("long")).cast("long")
                  .alias("total_chars"),
                 F.sum(T.token_count(F.col("text")).cast("long"))
                  .cast("long").alias("total_tokens"),
                 F.min(F.col("n_chars").cast("long")).cast("long")
                  .alias("min_chars"),
                 F.max(F.col("n_chars").cast("long")).cast("long")
                  .alias("max_chars"))
            .orderBy("lang"))


_CORPUS_STATS_SQL = f"""
select lang, cast(count(*) as bigint) as n_docs,
       cast(sum(n_chars::bigint) as bigint) as total_chars,
       cast(sum(len({TOKS_SQL})::bigint) as bigint) as total_tokens,
       cast(min(n_chars::bigint) as bigint) as min_chars,
       cast(max(n_chars::bigint) as bigint) as max_chars
from documents group by lang
order by lang
"""


def _text_gopher_quality(spark, sf_dir):
    """Gopher-rule quality metrics (Rae et al. 2021 §A1.1 heuristics:
    word-count band, mean word length, symbol/bullet/ellipsis ratios,
    alphabetic-word ratio, stop-word presence) + the composite pass flag —
    all Column exprs in one codegen stage (operators/text.gopher_metrics)."""
    docs = _t(spark, sf_dir, "documents")
    m = T.gopher_metrics(F.col("text"))
    return docs.select(
        "doc_id",
        *[m[k].alias(k) for k in
          ("n_words", "mean_word_len", "symbol_ratio", "bullet_line_ratio",
           "ellipsis_line_ratio", "alpha_word_ratio", "stop_hits",
           "dup_line_ratio", "top_bigram_ratio")],
        T.gopher_pass(F.col("text")).alias("passes"))


_TEXT_GOPHER_QUALITY_SQL = f"""
with g as (
  select doc_id,
         {TOKS_SQL} as toks,
         string_split(text, chr(10)) as lines
  from documents),
g2 as (
  select *,
         case when len(toks) >= 2 then
           list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1])
         else [] end as bg
  from g),
m as (
  select doc_id,
         len(toks)::bigint as n_words,
         round(list_sum(list_transform(toks, x -> length(x)))::double
               / nullif(len(toks), 0), 4) as mean_word_len,
         round(len(list_filter(toks,
                   x -> regexp_matches(x, '#|\\.\\.\\.|…')))::double
               / nullif(len(toks), 0), 4) as symbol_ratio,
         round(len(list_filter(lines,
                   l -> regexp_matches(l, '^\\s*[-*•]')))::double
               / len(lines), 4) as bullet_line_ratio,
         round(len(list_filter(lines,
                   l -> regexp_matches(l, '(\\.\\.\\.|…)\\s*$')))::double
               / len(lines), 4) as ellipsis_line_ratio,
         round(len(list_filter(toks,
                   x -> regexp_matches(x, '[A-Za-z]')))::double
               / nullif(len(toks), 0), 4) as alpha_word_ratio,
         len(list_filter(toks, x -> x in ({STOPS_SQL})))::bigint as stop_hits,
         round((len(lines) - len(list_distinct(lines)))::double
               / len(lines), 4) as dup_line_ratio
  from g2),
tb as (
  select doc_id, max(c) as top from (
    select doc_id, b, count(*) as c
    from (select doc_id, unnest(bg) as b from g2)
    group by doc_id, b)
  group by doc_id),
m2 as (
  select m.*,
         round(coalesce(tb.top, 0)::double
               / greatest((select len(bg) from g2 where g2.doc_id = m.doc_id),
                          1), 4) as top_bigram_ratio
  from m left join tb on m.doc_id = tb.doc_id)
select doc_id, n_words, mean_word_len, symbol_ratio, bullet_line_ratio,
       ellipsis_line_ratio, alpha_word_ratio, stop_hits,
       dup_line_ratio, top_bigram_ratio,
       (n_words >= 5 and n_words <= 100000
        and mean_word_len >= 2.0 and mean_word_len <= 12.0
        and symbol_ratio <= 0.1 and bullet_line_ratio <= 0.9
        and ellipsis_line_ratio <= 0.3 and alpha_word_ratio >= 0.8
        and stop_hits >= 1 and dup_line_ratio <= 0.3
        and top_bigram_ratio <= 0.18) as passes
from m2
"""


def _text_langid(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return docs.select("doc_id", T.lang_id(F.col("text")).alias("pred_lang"))


_TEXT_LANGID_SQL = f"""
select doc_id, {_langid_case_sql(TOKS_SQL)} as pred_lang from documents
"""


def _text_fingerprint(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return docs.select("doc_id", T.fingerprint(F.col("text")).alias("fp"))


_TEXT_FINGERPRINT_SQL = f"""
select doc_id,
       md5(array_to_string(list_sort(list_distinct({TOKS_SQL})), ' ')) as fp
from documents
"""


def _text_url_normalize(spark, sf_dir):
    """Crawl primitive: RFC 3986-subset URL canonicalization as pure Column
    exprs (operators/urls.py) — messy variants synthesized deterministically
    from doc_id so both engines normalize the same inputs."""
    from .operators.urls import normalize_url, url_host
    docs = _t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    messy = F.concat(
        F.when(did % 2 == 0, F.lit("HTTP://")).otherwise(F.lit("https://")),
        F.lit("Pages.Example.ORG"),
        F.when(did % 2 == 0, F.lit(":80")).otherwise(F.lit(":443")),
        F.when(did % 3 == 0, F.lit(""))
        .otherwise(F.concat(F.lit("/doc/"), did.cast("string"))),
        F.when(did % 5 == 0, F.lit("#frag")).otherwise(F.lit("")))
    return docs.select("doc_id", messy.alias("raw"),
                       normalize_url(messy).alias("norm"),
                       url_host(messy).alias("host"))


def _url_normalize_sql() -> str:
    from .operators.urls import url_normalize_sql
    messy = ("(case when doc_id % 2 = 0 then 'HTTP://' else 'https://' end)"
             " || 'Pages.Example.ORG'"
             " || (case when doc_id % 2 = 0 then ':80' else ':443' end)"
             " || (case when doc_id % 3 = 0 then '' else '/doc/' || doc_id end)"
             " || (case when doc_id % 5 = 0 then '#frag' else '' end)")
    return f"""
with m as (select doc_id, {messy} as raw from documents)
select doc_id, raw, {url_normalize_sql('raw')} as norm,
       lower(regexp_extract(raw, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1))
       as host
from m
"""


_TEXT_URL_NORMALIZE_SQL = _url_normalize_sql()


# --- dedup ------------------------------------------------------------------

def _dedup_exact(spark, sf_dir):
    return D.exact_dedup_groups(_t(spark, sf_dir, "documents"))


_DEDUP_EXACT_SQL = """
select md5(text) as dup_key, min(doc_id) as keep_id, count(*) as n_docs
from documents group by md5(text)
"""


def _dedup_ngram_jaccard(spark, sf_dir):
    return D.ngram_jaccard_pairs(_t(spark, sf_dir, "documents"), threshold=0.2)


_DEDUP_NGRAM_JACCARD_SQL = f"""
with sh as (select doc_id as id, {_grams_sql(TOKS_SQL)} as s from documents)
select a.id as a, b.id as b,
       round(len(list_intersect(a.s, b.s))::double /
             len(list_distinct(list_concat(a.s, b.s))), 4) as jac
from sh a join sh b on a.id < b.id
where round(len(list_intersect(a.s, b.s))::double /
            len(list_distinct(list_concat(a.s, b.s))), 4) >= 0.2
"""


def _dedup_minhash_sig(spark, sf_dir):
    return D.minhash_md5_signatures(_t(spark, sf_dir, "documents"))


_DEDUP_MINHASH_SIG_SQL = f"""
with g as (select doc_id as id, {_grams_sql(TOKS_SQL)} as g from documents)
select id, array_to_string({_minhash_sig_sql('g')}, '|') as sig from g
"""


def _dedup_minhash_pairs(spark, sf_dir):
    return D.minhash_md5_pairs(_t(spark, sf_dir, "documents"))


_DEDUP_MINHASH_PAIRS_SQL = f"""
with g as (select doc_id as id, {_grams_sql(TOKS_SQL)} as g from documents),
sigs as (select id, {_minhash_sig_sql('g')} as sig from g where len(g) > 0),
bands as (
  select id, b.b as band,
         md5(sig[2 * b.b + 1] || ',' || sig[2 * b.b + 2]) as band_key
  from sigs cross join (values (0), (1), (2), (3)) as b(b))
select distinct l.id as a, r.id as b
from bands l join bands r
  on l.band = r.band and l.band_key = r.band_key and l.id < r.id
"""


def _dedup_simhash(spark, sf_dir):
    return D.simhash_fingerprints(_t(spark, sf_dir, "documents"))


_DEDUP_SIMHASH_SQL = f"""
select doc_id as id, {_simhash_sql(TOKS_SQL)} as simhash from documents
"""


def _dedup_simhash48(spark, sf_dir):
    """48-bit fingerprints (the width that still discriminates at 10^12
    docs — 16-bit saturates at 65k distinct values)."""
    return D.simhash48_fingerprints(_t(spark, sf_dir, "documents"))


_DEDUP_SIMHASH48_SQL = f"""
select doc_id as id, {_simhash48_sql(TOKS_SQL)} as simhash from documents
"""


def _dedup_simhash48_pairs(spark, sf_dir):
    """48-bit banded near-pairs (6 bands x 8 bits, Hamming <= 5) vs the
    all-pairs Hamming oracle — pigeonhole-complete banding loses nothing."""
    return D.simhash48_near_pairs(_t(spark, sf_dir, "documents"),
                                  max_hamming=5)


_DEDUP_SIMHASH48_PAIRS_SQL = f"""
with f as (select doc_id as id, {_simhash48_sql(TOKS_SQL)} as simhash
           from documents)
select a.id as a, b.id as b, bit_count(xor(a.simhash, b.simhash)) as dist
from f a join f b on a.id < b.id
where bit_count(xor(a.simhash, b.simhash)) <= 5
"""


def _dedup_simhash_pairs(spark, sf_dir):
    """SimHash near-dup pairs (Hamming ≤ 3) via banded pigeonhole buckets.
    The oracle is the all-pairs Hamming filter — semantically identical
    because 16 bits / 4 bands guarantees any pair within radius 3 shares at
    least one exact band (so banding loses nothing)."""
    return D.simhash_near_pairs(_t(spark, sf_dir, "documents"), max_hamming=3)


_DEDUP_SIMHASH_PAIRS_SQL = f"""
with f as (select doc_id as id, {_simhash_sql(TOKS_SQL)} as simhash from documents)
select a.id as a, b.id as b, bit_count(xor(a.simhash, b.simhash)) as dist
from f a join f b on a.id < b.id
where bit_count(xor(a.simhash, b.simhash)) <= 3
"""


def _scale_sigs(spark, sf_dir, num_perm: int = 16):
    from .operators import minhash as MH
    from .session import ensure_package_on_executors
    ensure_package_on_executors(spark)
    return MH.minhash_signatures(_t(spark, sf_dir, "documents"), "doc_id",
                                 "text", num_perm=num_perm, token_sep=" ")


# CTE prefix shared by the scale-tier sig/pairs oracles: whitespace tokens →
# md5-u64 token hashes (empty → [0] sentinel, as in the kernel) → signature
_SCALE_SIG_CTE = f"""
with tk as (select doc_id::varchar as id,
            list_filter(string_split(text, ' '), t -> t <> '') as tk
            from documents),
sh as (select id, case when len(tk) = 0 then [0::ubigint]
       else list_distinct(list_transform(tk, t -> {_TOKHASH_SQL})) end as sh
       from tk),
sig as (select id, {_minhash_scale_sig_sql('sh')} as sig from sh)
"""


def _dedup_minhash_scale_sig(spark, sf_dir):
    """Scale-tier MinHash signatures (operators/minhash.py numpy kernel) —
    flattened to one comma-joined string for the hash compare."""
    sigs = _scale_sigs(spark, sf_dir)
    return sigs.select(
        "id", F.concat_ws(",", F.transform("sig", lambda x: x.cast("string")))
        .alias("sig"))


_DEDUP_MINHASH_SCALE_SIG_SQL = _SCALE_SIG_CTE + """
select id, array_to_string(list_transform(sig, x -> x::varchar), ',') as sig
from sig
"""


def _dedup_minhash_scale_pairs(spark, sf_dir):
    """Scale-tier LSH candidate pairs (xxhash64 band join). The oracle
    compares band *slices* directly — band equality in the engine is
    xxhash64(slice-string) equality, identical up to a 2^-64 hash collision,
    so the pair sets agree."""
    from .operators import minhash as MH
    return MH.lsh_candidate_pairs(_scale_sigs(spark, sf_dir), num_bands=4)


_DEDUP_MINHASH_SCALE_PAIRS_SQL = _SCALE_SIG_CTE + """,
bands as (
  select id, b.b as band,
         array_to_string(list_transform(list_slice(sig, 4*b.b + 1, 4*b.b + 4),
                                        x -> x::varchar), ',') as bk
  from sig cross join (values (0), (1), (2), (3)) as b(b))
select distinct l.id as a, r.id as b
from bands l join bands r on l.band = r.band and l.bk = r.bk and l.id < r.id
"""


def _dedup_minhash_verified_pairs(spark, sf_dir):
    """The complete dedup cascade as one operator: scale-tier LSH candidate
    pairs (bucketed band join) verified by EXACT word-3-gram Jaccard ≥ 0.2 —
    the quadratic verifier runs only on the candidate set, never the corpus
    (the composition SURVEY §2.9 prescribes)."""
    from .operators import minhash as MH
    from .operators.text import word_ngrams
    docs = _t(spark, sf_dir, "documents")
    pairs = MH.lsh_candidate_pairs(_scale_sigs(spark, sf_dir), num_bands=4)
    grams = docs.select(F.col("doc_id").cast("string").alias("id"),
                        word_ngrams(F.col("text"), 3).alias("g"))
    jac = (F.size(F.array_intersect(F.col("ga"), F.col("gb"))).cast("double")
           / F.size(F.array_union(F.col("ga"), F.col("gb"))))
    return (pairs
            .join(grams.withColumnsRenamed({"id": "a", "g": "ga"}), on="a")
            .join(grams.withColumnsRenamed({"id": "b", "g": "gb"}), on="b")
            .select("a", "b", F.round(jac, 4).alias("jac"))
            .filter(F.col("jac") >= 0.2))


_VERIFIED_PAIRS_CTES = _SCALE_SIG_CTE + f""",
bands as (
  select id, b.b as band,
         array_to_string(list_transform(list_slice(sig, 4*b.b + 1, 4*b.b + 4),
                                        x -> x::varchar), ',') as bk
  from sig cross join (values (0), (1), (2), (3)) as b(b)),
cand as (
  select distinct l.id as a, r.id as b
  from bands l join bands r on l.band = r.band and l.bk = r.bk and l.id < r.id),
grams as (select doc_id::varchar as id, {_grams_sql(TOKS_SQL)} as g from documents),
vpairs as (
  select a, b,
         round(len(list_intersect(ga.g, gb.g))::double /
               len(list_distinct(list_concat(ga.g, gb.g))), 4) as jac
  from cand join grams ga on cand.a = ga.id join grams gb on cand.b = gb.id
  where round(len(list_intersect(ga.g, gb.g))::double /
              len(list_distinct(list_concat(ga.g, gb.g))), 4) >= 0.2)
"""

_DEDUP_MINHASH_VERIFIED_PAIRS_SQL = _VERIFIED_PAIRS_CTES + """
select a, b, jac from vpairs
"""


def _dedup_corpus_near(spark, sf_dir):
    """The deliverable of a training-data dedup pipeline: the corpus ITSELF
    with verified near-dup clusters collapsed — verified pairs (the full
    cascade above) → connected components → keep each cluster's min-doc_id
    representative, drop the rest. At 100 TB the drop set is a sliver of
    the corpus (only clustered non-representatives), so it broadcasts into
    one anti-join against the full stream — the row payload never
    shuffles. Oracle: the same pair CTEs + a recursive min-label closure."""
    from .operators.components import canonical_mapping
    docs = _t(spark, sf_dir, "documents")
    pairs = _dedup_minhash_verified_pairs(spark, sf_dir).select("a", "b")
    mapping = canonical_mapping(pairs)
    drop = (mapping.filter(F.col("id") != F.col("canonical_id"))
            .select(F.col("id").cast("long").alias("doc_id")))
    return (docs.join(F.broadcast(drop), "doc_id", "left_anti")
            .select("doc_id", "lang", "n_chars"))


_DEDUP_CORPUS_NEAR_SQL = _VERIFIED_PAIRS_CTES.replace(
    "with tk as", "with recursive tk as") + """,
und as (select a as x, b as y from vpairs union select b, a from vpairs),
reach(x, r) as (
  select x, x from (select distinct x from und) n
  union
  select u.x, reach.r from und u join reach on u.y = reach.x),
drop_ids as (select x from reach group by x having min(r) <> x)
select d.doc_id as doc_id, d.lang as lang, d.n_chars as n_chars
from documents d
where d.doc_id::varchar not in (select x from drop_ids)
"""


def _dedup_embedding_cosine(spark, sf_dir):
    return D.embedding_cosine_pairs(_t(spark, sf_dir, "embeddings"),
                                    threshold=0.4)


_DEDUP_EMBEDDING_COSINE_SQL = f"""
select a.vec_id as a, b.vec_id as b,
       round({_cos_sql('a.embedding', 'b.embedding')}, 4) as sim
from embeddings a join embeddings b on a.vec_id < b.vec_id
where round({_cos_sql('a.embedding', 'b.embedding')}, 4) >= 0.4
"""

_SEMDEDUP_K, _SEMDEDUP_T = 8, 0.4


def _dedup_semantic_pairs(spark, sf_dir):
    """SemDeDup (Abbas et al. 2023): deterministic-IVF clustering, then
    pairwise cosine ONLY within a cluster — Σ O(|cluster|²) instead of
    O(n²). The oracle replays the identical fit (shared _ivf_fit_ctes
    chain) and the identical within-cell join."""
    return D.semantic_dedup_pairs(_t(spark, sf_dir, "embeddings"),
                                  k=_SEMDEDUP_K, threshold=_SEMDEDUP_T,
                                  dim=EMB_DIM)


def _dedup_semantic_keep(spark, sf_dir):
    """The kept corpus under SemDeDup (earliest-id-wins within each
    near-dup relation) — scalar columns only for the driver canonicalizer."""
    kept = D.semantic_dedup_keep(_t(spark, sf_dir, "embeddings"),
                                 k=_SEMDEDUP_K, threshold=_SEMDEDUP_T,
                                 dim=EMB_DIM)
    return kept.select(F.col("vec_id").cast("long").alias("vec_id"),
                       F.col("label").cast("int").alias("label"))


def _semantic_pairs_sql(k: int = _SEMDEDUP_K, threshold: float = _SEMDEDUP_T,
                        dim: int = EMB_DIM) -> str:
    ctes, prev = _ivf_fit_ctes(k=k, dim=dim)
    cos = _cos_sql("x.embedding", "y.embedding", dim)
    body = ",\n".join(ctes)
    return (f"with {body}\n"
            f"select x.cell as cell, x.vec_id as a, y.vec_id as b,\n"
            f"       round({cos}, 4) as sim\n"
            f"from {prev} x join {prev} y\n"
            f"  on x.cell = y.cell and x.vec_id < y.vec_id\n"
            f"where round({cos}, 4) >= {threshold}")


def _semantic_keep_sql(k: int = _SEMDEDUP_K, threshold: float = _SEMDEDUP_T,
                       dim: int = EMB_DIM) -> str:
    return (f"with pairs as ({_semantic_pairs_sql(k, threshold, dim)})\n"
            f"select cast(vec_id as bigint) as vec_id, "
            f"cast(label as int) as label from embeddings\n"
            f"where vec_id not in (select b from pairs)")


# --- similarity search ------------------------------------------------------

def _ann_cosine_topk(spark, sf_dir):
    return S.cosine_topk(_t(spark, sf_dir, "embeddings"), query_id=0, k=10)


_ANN_COSINE_TOPK_SQL = f"""
with q as (select embedding as qv from embeddings where vec_id = 0)
select vec_id, label,
       round({_cos_sql('embedding', 'qv')}, 4) as sim
from embeddings, q where vec_id <> 0
order by sim desc, vec_id limit 10
"""


def _ann_ivf_topk(spark, sf_dir):
    return S.ivf_topk_per_cell(_t(spark, sf_dir, "embeddings"), query_id=0, k=3)


_ANN_IVF_TOPK_SQL = f"""
with q as (select embedding as qv from embeddings where vec_id = 0),
scored as (
  select vec_id, label, round({_cos_sql('embedding', 'qv')}, 4) as sim
  from embeddings, q where vec_id <> 0)
select vec_id, label, sim, rank from (
  select vec_id, label, sim,
         row_number() over (partition by label order by sim desc, vec_id) as rank
  from scored) where rank <= 3
"""


def _ann_lsh_signatures(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    v = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    return v.select("vec_id",
                    S.hyperplane_signs(F.col("v"), EMB_DIM, 8).alias("sig"))


_ANN_LSH_SIGNATURES_SQL = f"""
select vec_id, {_hyperplane_sig_sql('embedding')} as sig from embeddings
"""


def _ann_ivf_trained_topk(spark, sf_dir):
    """Trained-IVF probe search, oracle-checked end to end: the
    deterministic fit (md5-bucket init + 2 Lloyd refinements,
    ``S.ivf_fit_deterministic``) is replayed step-for-step by the generated
    CTE chain in ``_ivf_trained_sql`` — init bucket, per-dim centroid
    means, argmin re-assignment, centroid-ranked probe, pruned cosine
    top-k. The MLlib KMeans tier (``S.ivf_index``) stays the production
    path (recall pytest-asserted in test_similarity); this closes the
    round-2 ``no_oracle`` gap."""
    emb = _t(spark, sf_dir, "embeddings")
    assigned, centroids = S.ivf_fit_deterministic(emb, k=8, n_iter=2,
                                                  dim=EMB_DIM)
    q = emb.filter(F.col("vec_id") == 0).select("embedding").first()["embedding"]
    return S.ivf_search(assigned.filter(F.col("vec_id") != 0), centroids,
                        [float(x) for x in q], k=10, n_probe=3)


def _ivf_fit_ctes(k: int = 8, n_iter: int = 2,
                  dim: int = EMB_DIM) -> tuple[list[str], str]:
    """Shared DuckDB replay of ``S.ivf_fit_deterministic`` (init bucket →
    [per-dim means → argmin re-assign]×n_iter) — returns (cte_list,
    final_assigned_cte_name). One source of truth for the trained-IVF and
    semantic-dedup oracles."""
    ctes = [f"a0 as (select vec_id, embedding, "
            f"('0x' || substring(md5(cast(vec_id as varchar)), 16, 1))::int "
            f"% {k} as cell from embeddings)"]
    prev = "a0"
    for t in range(1, n_iter + 1):
        ctes.append(
            f"c{t} as (select cell, list(m order by d) as cent from ("
            f"select cell, d, avg(embedding[d]::double) as m "
            f"from {prev}, range(1, {dim + 1}) t(d) "
            f"group by cell, d) group by cell)")
        dist = (f"list_sum(list_transform(range(1, {dim + 1}), d -> "
                f"(x.embedding[d]::double - c.cent[d]) * "
                f"(x.embedding[d]::double - c.cent[d])))")
        ctes.append(
            f"a{t} as (select vec_id, embedding, cell from ("
            f"select x.vec_id, x.embedding, c.cell, "
            f"row_number() over (partition by x.vec_id "
            f"order by {dist}, c.cell) as rn "
            f"from a0 x cross join c{t} c) where rn = 1)")
        prev = f"a{t}"
    return ctes, prev


def _ivf_trained_sql(k: int = 8, n_iter: int = 2, n_probe: int = 3,
                     topk: int = 10, dim: int = EMB_DIM) -> str:
    """DuckDB mirror of ``S.ivf_fit_deterministic`` + ``S.ivf_search`` —
    generated by the same loop structure (init → [means → argmin]×n_iter →
    probe → pruned top-k), one source of truth for the constants."""
    ctes, prev = _ivf_fit_ctes(k=k, n_iter=n_iter, dim=dim)
    qdist = (f"list_sum(list_transform(range(1, {dim + 1}), d -> "
             f"(q.qv[d]::double - c.cent[d]) * (q.qv[d]::double - c.cent[d])))")
    body = ",\n".join(ctes)
    return f"""
with {body},
q as (select embedding as qv from embeddings where vec_id = 0),
probe as (select c.cell from c{n_iter} c, q order by {qdist}, c.cell
          limit {n_probe})
select s.vec_id as vec_id, s.cell as cell,
       round({_cos_sql('s.embedding', 'qv')}, 4) as sim
from {prev} s, q
where s.vec_id <> 0 and s.cell in (select cell from probe)
order by sim desc, vec_id limit {topk}
"""


def _ann_pq_topk(spark, sf_dir):
    """Product-quantization ANN (operators/quantize.py): deterministic
    per-subspace k-means (md5 init + Lloyd, same contract as the trained
    IVF), one-byte codes per subspace, asymmetric-distance top-k over the
    CODES table only — the memory-bound scale path (the 10^12-vector
    corpus holds m bytes/vector, not dim floats). The oracle REPLAYS the
    fit + encode + ADC relationally (_pq_topk_sql)."""
    from .operators.quantize import pq_fit_deterministic, pq_search
    emb = _t(spark, sf_dir, "embeddings")
    codes, books = pq_fit_deterministic(emb, m=_PQ_M, k=_PQ_K,
                                        n_iter=_PQ_ITER, dim=EMB_DIM)
    qv = [float(x) for x in
          emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    return pq_search(codes, books, qv, topk=10, exclude_id=0)


_PQ_M, _PQ_K, _PQ_ITER = 4, 16, 2


def _pq_topk_sql(m: int = None, k: int = None, n_iter: int = None,
                 topk: int = 10, dim: int = EMB_DIM, qid: int = 0) -> str:
    """DuckDB mirror of pq_fit_deterministic + pq_search, generated by the
    same loop structure per subspace (init → [means → argmin]×n_iter),
    then codes joined with per-subspace query-distance tables and summed
    left-assoc in subspace order — the exact ADC fold pq_search executes.
    Mean drift between engines' avg() is absorbed by argmin stability and
    round(·, 4), the contract proven by the trained-IVF oracle."""
    m, k, n_iter = m or _PQ_M, k or _PQ_K, n_iter or _PQ_ITER
    sub = dim // m
    ctes = []
    for s in range(m):
        svec = (f"list_transform(range(1, {sub + 1}), d -> "
                f"embedding[{s * sub} + d]::double)")
        ctes.append(
            f"s{s}a0 as (select vec_id, {svec} as v, "
            f"('0x' || substring(md5(cast(vec_id as varchar)), 16, 1))::int "
            f"% {k} as cell from embeddings)")
        for t in range(1, n_iter + 1):
            means = (f"select cell, list(mu order by d) as cent "
                     f"from (select cell, d, avg(v[d]) as mu "
                     f"from s{s}a{t - 1}, range(1, {sub + 1}) t(d) "
                     f"group by cell, d) group by cell")
            if t == 1:
                ctes.append(f"s{s}c1 as ({means})")
            else:
                # carry forward centroids of cells that emptied during
                # Lloyd — mirrors pq_fit_deterministic exactly (no-op
                # when every cell stays populated)
                ctes.append(
                    f"s{s}c{t} as (select * from ({means}) "
                    f"union all select cell, cent from s{s}c{t - 1} "
                    f"where cell not in (select cell from ({means})))")
            dist = (f"list_sum(list_transform(range(1, {sub + 1}), d -> "
                    f"(x.v[d] - c.cent[d]) * (x.v[d] - c.cent[d])))")
            ctes.append(
                f"s{s}a{t} as (select vec_id, v, cell from ("
                f"select x.vec_id, x.v, c.cell, "
                f"row_number() over (partition by x.vec_id "
                f"order by {dist}, c.cell) as rn "
                f"from s{s}a0 x cross join s{s}c{t} c) where rn = 1)")
        qsvec = (f"list_transform(range(1, {sub + 1}), d -> "
                 f"embedding[{s * sub} + d]::double)")
        ctes.append(f"q{s} as (select {qsvec} as qv from embeddings "
                    f"where vec_id = {qid})")
        qdist = (f"list_sum(list_transform(range(1, {sub + 1}), d -> "
                 f"(q.qv[d] - c.cent[d]) * (q.qv[d] - c.cent[d])))")
        ctes.append(f"qd{s} as (select c.cell as code, {qdist} as dq "
                    f"from s{s}c{n_iter} c, q{s} q)")
    joins = f"s0a{n_iter} x0"
    for s in range(1, m):
        joins += f" join s{s}a{n_iter} x{s} using (vec_id)"
    for s in range(m):
        joins += f" join qd{s} d{s} on d{s}.code = x{s}.cell"
    total = "0.0"
    for s in range(m):
        total = f"({total} + d{s}.dq)"
    return (f"with {', '.join(ctes)}\n"
            f"select vec_id, round({total}, 4) as approx_dist\n"
            f"from {joins} where vec_id <> {qid}\n"
            f"order by approx_dist, vec_id limit {topk}")


def _ann_pq_rerank_topk(spark, sf_dir):
    """The production ANN cascade: PQ/ADC generates a cheap candidate set
    (top-50 through the codes — no raw vectors), then ONLY those 50 rows
    re-rank by exact cosine. At 10^12 vectors this is the architecture:
    approximate recall from bytes, exact precision on a constant-size
    remainder. Oracle nests _pq_topk_sql as the candidate CTE."""
    from .operators.quantize import pq_fit_deterministic, pq_search
    emb = _t(spark, sf_dir, "embeddings").persist()
    codes, books = pq_fit_deterministic(emb, m=_PQ_M, k=_PQ_K,
                                        n_iter=_PQ_ITER, dim=EMB_DIM)
    qv = [float(x) for x in
          emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    cands = pq_search(codes, books, qv, topk=50, exclude_id=0) \
        .select("vec_id")
    qlit = F.array(*[F.lit(x) for x in qv])
    from .operators.similarity import _as_double, cosine_sim
    exact = (emb.join(F.broadcast(cands), "vec_id")
             .select("vec_id",
                     F.round(cosine_sim(_as_double(F.col("embedding")),
                                        qlit), 4).alias("sim")))
    return exact.orderBy(F.col("sim").desc(), F.col("vec_id")).limit(10)


def _pq_rerank_sql(topk: int = 10, n_cands: int = 50, qid: int = 0,
                   m: int = None, k: int = None) -> str:
    # the candidate CTE nests its own WITH (DuckDB allows a full statement
    # inside a derived table), so per-qid branches compose cleanly
    inner = _pq_topk_sql(m=m, k=k, topk=n_cands, qid=qid)
    return (f"with cands as (select * from ({inner})),\n"
            f"q as (select embedding as qv from embeddings "
            f"where vec_id = {qid})\n"
            f"select e.vec_id as vec_id, "
            f"round({_cos_sql('e.embedding', 'qv')}, 4) as sim\n"
            f"from embeddings e join cands using (vec_id), q\n"
            f"order by sim desc, vec_id limit {topk}")


def _ann_ivfpq_topk(spark, sf_dir):
    """IVF+PQ (operators/quantize.ivfpq_fit/search — the FAISS IVFPQ
    shape): coarse cells prune the scan, PQ codes over RESIDUALS score
    candidates without touching raw vectors. The oracle replays coarse
    fit → residuals → PQ fit → per-cell ADC relationally."""
    from .operators.quantize import ivfpq_fit, ivfpq_search
    emb = _t(spark, sf_dir, "embeddings")
    encoded, coarse, books = ivfpq_fit(
        emb, coarse_k=_PQ_COARSE_K, coarse_iter=_PQ_ITER,
        m=_PQ_M, k=_PQ_K, pq_iter=_PQ_ITER, dim=EMB_DIM)
    qv = [float(x) for x in
          emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    return ivfpq_search(encoded, coarse, books, qv, topk=10,
                        n_probe=_PQ_NPROBE, exclude_id=0)


_PQ_COARSE_K, _PQ_NPROBE = 8, 3


def _ivfpq_topk_sql(coarse_k: int = None, m: int = None, k: int = None,
                    n_iter: int = None, n_probe: int = None,
                    topk: int = 10, dim: int = EMB_DIM) -> str:
    """DuckDB mirror of ivfpq_fit + ivfpq_search: the coarse CTE chain is
    _ivf_trained_sql's (same loop), then residuals, the PQ replay of
    _pq_topk_sql over them, cell probing, and PER-CELL query-residual
    distance tables joined on (cell, code) — summed left-assoc in
    subspace order exactly like the zip_with/aggregate fold."""
    coarse_k = coarse_k or _PQ_COARSE_K
    m, k = m or _PQ_M, k or _PQ_K
    n_iter, n_probe = n_iter or _PQ_ITER, n_probe or _PQ_NPROBE
    sub = dim // m
    ctes = [f"a0 as (select vec_id, embedding, "
            f"('0x' || substring(md5(cast(vec_id as varchar)), 16, 1))::int "
            f"% {coarse_k} as cell from embeddings)"]
    prev = "a0"
    for t in range(1, n_iter + 1):
        ctes.append(
            f"c{t} as (select cell, list(mu order by d) as cent from ("
            f"select cell, d, avg(embedding[d]::double) as mu "
            f"from {prev}, range(1, {dim + 1}) t(d) "
            f"group by cell, d) group by cell)")
        dist = (f"list_sum(list_transform(range(1, {dim + 1}), d -> "
                f"(x.embedding[d]::double - c.cent[d]) * "
                f"(x.embedding[d]::double - c.cent[d])))")
        ctes.append(
            f"a{t} as (select vec_id, embedding, cell from ("
            f"select x.vec_id, x.embedding, c.cell, "
            f"row_number() over (partition by x.vec_id "
            f"order by {dist}, c.cell) as rn "
            f"from a0 x cross join c{t} c) where rn = 1)")
        prev = f"a{t}"
    ctes.append(
        f"r as (select x.vec_id, x.cell, "
        f"list_transform(range(1, {dim + 1}), d -> "
        f"x.embedding[d]::double - c.cent[d]) as rv "
        f"from {prev} x join c{n_iter} c using (cell))")
    # PQ replay over residuals (same loop as _pq_topk_sql, source = r)
    for s in range(m):
        svec = (f"list_transform(range(1, {sub + 1}), d -> "
                f"rv[{s * sub} + d])")
        ctes.append(
            f"s{s}a0 as (select vec_id, {svec} as v, "
            f"('0x' || substring(md5(cast(vec_id as varchar)), 16, 1))::int "
            f"% {k} as cell from r)")
        for t in range(1, n_iter + 1):
            means = (f"select cell, list(mu order by d) as cent "
                     f"from (select cell, d, avg(v[d]) as mu "
                     f"from s{s}a{t - 1}, range(1, {sub + 1}) t(d) "
                     f"group by cell, d) group by cell")
            if t == 1:
                ctes.append(f"s{s}c1 as ({means})")
            else:
                ctes.append(
                    f"s{s}c{t} as (select * from ({means}) "
                    f"union all select cell, cent from s{s}c{t - 1} "
                    f"where cell not in (select cell from ({means})))")
            dist = (f"list_sum(list_transform(range(1, {sub + 1}), d -> "
                    f"(x.v[d] - c.cent[d]) * (x.v[d] - c.cent[d])))")
            ctes.append(
                f"s{s}a{t} as (select vec_id, v, cell from ("
                f"select x.vec_id, x.v, c.cell, "
                f"row_number() over (partition by x.vec_id "
                f"order by {dist}, c.cell) as rn "
                f"from s{s}a0 x cross join s{s}c{t} c) where rn = 1)")
    ctes.append("q as (select embedding as qv from embeddings "
                "where vec_id = 0)")
    qdist = (f"list_sum(list_transform(range(1, {dim + 1}), d -> "
             f"(q.qv[d]::double - c.cent[d]) * "
             f"(q.qv[d]::double - c.cent[d])))")
    ctes.append(f"probe as (select c.cell from c{n_iter} c, q "
                f"order by {qdist}, c.cell limit {n_probe})")
    ctes.append(
        f"qr as (select c.cell, list_transform(range(1, {dim + 1}), d -> "
        f"q.qv[d]::double - c.cent[d]) as qrv from c{n_iter} c, q "
        f"where c.cell in (select cell from probe))")
    for s in range(m):
        qd = (f"list_sum(list_transform(range(1, {sub + 1}), d -> "
              f"(qr.qrv[{s * sub} + d] - pc.cent[d]) * "
              f"(qr.qrv[{s * sub} + d] - pc.cent[d])))")
        ctes.append(f"qd{s} as (select qr.cell, pc.cell as code, {qd} as dq "
                    f"from qr cross join s{s}c{n_iter} pc)")
    joins = f"r r2"
    for s in range(m):
        joins += f" join s{s}a{n_iter} x{s} using (vec_id)"
    for s in range(m):
        joins += (f" join qd{s} d{s} on d{s}.cell = r2.cell "
                  f"and d{s}.code = x{s}.cell")
    total = "0.0"
    for s in range(m):
        total = f"({total} + d{s}.dq)"
    return (f"with {', '.join(ctes)}\n"
            f"select r2.vec_id as vec_id, r2.cell as cell, "
            f"round({total}, 4) as approx_dist\n"
            f"from {joins}\n"
            f"where r2.vec_id <> 0 "
            f"and r2.cell in (select cell from probe)\n"
            f"order by approx_dist, vec_id limit {topk}")


def _ann_lsh_bucket_topk(spark, sf_dir):
    """LSH-bucketed ANN: cosine top-k restricted to the query's hyperplane
    bucket (the same deterministic planes the oracle recomputes)."""
    return S.lsh_bucket_topk(_t(spark, sf_dir, "embeddings"), query_id=0,
                             dim=EMB_DIM, k=10, n_planes=8)


_ANN_LSH_BUCKET_TOPK_SQL = f"""
with s as (select vec_id, embedding,
           {_hyperplane_sig_sql('embedding')} as sig from embeddings),
q as (select embedding as qv, sig as qsig from s where vec_id = 0)
select s.vec_id as vec_id, round({_cos_sql('s.embedding', 'qv')}, 4) as sim
from s, q where s.vec_id <> 0 and s.sig = q.qsig
order by sim desc, vec_id limit 10
"""


def _ann_lsh_multiprobe_topk(spark, sf_dir):
    """Multi-probe tier: the query bucket plus its one-bit Hamming
    neighbors (max_flip=1) — (n_planes+1)x scan, much higher recall."""
    return S.lsh_bucket_topk(_t(spark, sf_dir, "embeddings"), query_id=0,
                             dim=EMB_DIM, k=10, n_planes=8, max_flip=1)


_ANN_LSH_MULTIPROBE_TOPK_SQL = f"""
with s as (select vec_id, embedding,
           {_hyperplane_sig_sql('embedding')} as sig from embeddings),
q as (select embedding as qv, sig as qsig from s where vec_id = 0)
select s.vec_id as vec_id, round({_cos_sql('s.embedding', 'qv')}, 4) as sim
from s, q where s.vec_id <> 0 and bit_count(xor(s.sig, q.qsig)) <= 1
order by sim desc, vec_id limit 10
"""


def _dedup_embedding_lsh_pairs(spark, sf_dir):
    """Scale tier for embedding near-dup: same-hyperplane-bucket candidates
    + exact cosine verify (quarantines the all-pairs tier)."""
    return S.embedding_lsh_pairs(_t(spark, sf_dir, "embeddings"),
                                 dim=EMB_DIM, threshold=0.4, n_planes=8)


_DEDUP_EMBEDDING_LSH_PAIRS_SQL = f"""
with s as (select vec_id, embedding,
           {_hyperplane_sig_sql('embedding')} as sig from embeddings)
select a.vec_id as a, b.vec_id as b,
       round({_cos_sql('a.embedding', 'b.embedding')}, 4) as sim
from s a join s b on a.sig = b.sig and a.vec_id < b.vec_id
where round({_cos_sql('a.embedding', 'b.embedding')}, 4) >= 0.4
"""


# --- multimodal -------------------------------------------------------------

def _multimodal_features(spark, sf_dir):
    from .operators.multimodal import extract_features, media_from_documents
    from .session import ensure_package_on_executors
    ensure_package_on_executors(spark)
    media = media_from_documents(_t(spark, sf_dir, "documents"))
    return extract_features(media).select("media_id", "n_bytes", "digest",
                                          "feat16")


_MULTIMODAL_FEATURES_SQL = """
select doc_id as media_id, octet_length(encode(text)) as n_bytes,
       md5(text) as digest,
       ('0x' || substring(md5(text), 1, 4))::bigint as feat16
from documents
"""


def _multimodal_resize(spark, sf_dir):
    """Resize plumbing (stubbed decode): deterministic digest-seeded output
    so the whole batch shape is oracle-checkable (content surfaced as hex)."""
    from .operators.multimodal import media_from_documents, resize_images
    from .session import ensure_package_on_executors
    ensure_package_on_executors(spark)
    media = media_from_documents(_t(spark, sf_dir, "documents"))
    return resize_images(media, 64, 64).select(
        "media_id", "width", "height",
        F.lower(F.hex("content")).alias("content_hex"))


_MULTIMODAL_RESIZE_SQL = """
select doc_id as media_id, 64 as width, 64 as height,
       md5(text || ':64x64') as content_hex
from documents
"""


def _multimodal_frames(spark, sf_dir):
    """Frame sampling — the 1-blob → N-frame UDTF shape, emitted by one
    Arrow kernel (never a per-row Python generator)."""
    from .operators.multimodal import media_from_documents, sample_frames
    from .session import ensure_package_on_executors
    ensure_package_on_executors(spark)
    media = media_from_documents(_t(spark, sf_dir, "documents"))
    return sample_frames(media, n_frames=4).select(
        "media_id", "frame_idx", "ts_ms",
        F.lower(F.hex("content")).alias("content_hex"))


_MULTIMODAL_FRAMES_SQL = """
select doc_id as media_id, f.i as frame_idx, f.i * 1000 as ts_ms,
       md5(text || ':frame' || f.i) as content_hex
from documents cross join (values (0), (1), (2), (3)) as f(i)
"""


def _multimodal_decode(spark, sf_dir):
    """REAL image decode→feature path (round 5 — the stub is gone):
    deterministic 8×8 BMPs are synthesized per document (pixel formula in
    operators/multimodal.synth_bmp_media), decoded by the stdlib 24-bit
    BMP decoder inside the Arrow kernel, and reduced to channel means +
    max luminance. The oracle aggregates the same pixel formula
    relationally — exact doubles (integer sums / power-of-two counts)."""
    from .operators.multimodal import image_stats, synth_bmp_media
    from .session import ensure_package_on_executors
    ensure_package_on_executors(spark)
    media = synth_bmp_media(_t(spark, sf_dir, "documents"), 8, 8)
    return image_stats(media)


_MULTIMODAL_DECODE_SQL = """
select d.doc_id as media_id, 8 as width, 8 as height,
       avg((7*d.doc_id + 13*g.i) % 256) as mean_r,
       avg((11*d.doc_id + 17*g.i) % 256) as mean_g,
       avg((13*d.doc_id + 19*g.i) % 256) as mean_b,
       max((7*d.doc_id + 13*g.i) % 256 + (11*d.doc_id + 17*g.i) % 256
           + (13*d.doc_id + 19*g.i) % 256) as max_lum
from documents d cross join generate_series(0, 63) g(i)
group by d.doc_id
"""


def _multimodal_decode_audio(spark, sf_dir):
    """REAL audio decode path: deterministic 16-bit PCM WAV per document
    (sample formula in operators/multimodal.synth_wav_media), decoded by
    the stdlib ``wave`` fallback, reduced to sample stats; oracle mirrors
    the formula."""
    from .operators.multimodal import audio_stats, synth_wav_media
    from .session import ensure_package_on_executors
    ensure_package_on_executors(spark)
    media = synth_wav_media(_t(spark, sf_dir, "documents"), 64, 8000)
    return audio_stats(media)


_MULTIMODAL_DECODE_AUDIO_SQL = """
select d.doc_id as media_id, 8000 as sample_rate, 64 as n_samples,
       avg((31*d.doc_id + 97*g.i) % 4001 - 2000) as mean_sample,
       max(abs((31*d.doc_id + 97*g.i) % 4001 - 2000)) as max_abs
from documents d cross join generate_series(0, 63) g(i)
group by d.doc_id
"""


# --- KG pipeline (web path) -------------------------------------------------

def _kg_pages(spark, sf_dir):
    from .sources.pages import pages_from_documents
    return pages_from_documents(_t(spark, sf_dir, "documents"))


def _kg_pages_triples(spark, sf_dir):
    """Flagship: HTML build → stage-1 extraction → stage-2 CSVW triple kernel,
    all inside Arrow batches; the oracle recomputes the expected triples
    relationally from the documents table."""
    from .sources.pages import DOC_PAGE_META
    from .web import pages_to_triples
    triples = pages_to_triples(_kg_pages(spark, sf_dir), minimal=True,
                               default_meta=DOC_PAGE_META)
    return triples.select("subj", "pred", "obj")


_KG_PAGES_TRIPLES_SQL = " union all ".join(
    f"select {DOC_URL_SQL} || '#doc-' || doc_id as subj, "
    f"{DOC_URL_SQL} || '#{col}' as pred, "
    f"cast({col} as varchar) as obj from documents"
    for col in ("doc_id", "lang", "source", "n_chars"))


def _kg_entity_mentions(spark, sf_dir):
    """Stage 2b: broadcast-dictionary mention detection (exact tier; the
    fuzzy Jaccard tier is gated off by min_score > 1 so the oracle is exact)."""
    from .sources.pages import DOC_PAGE_META
    from .web import link_entities, pages_to_triples
    docs = _t(spark, sf_dir, "documents")
    sources = [r["source"] for r in docs.select("source").distinct().collect()]
    ents = {s: SOURCE_ENT_PREFIX + s for s in sources}
    triples = pages_to_triples(_kg_pages(spark, sf_dir), minimal=True,
                               default_meta=DOC_PAGE_META)
    mentions = link_entities(triples, ents, min_score=1.1)
    return mentions.select("subj", "pred", "obj")


_KG_ENTITY_MENTIONS_SQL = f"""
select {DOC_URL_SQL} || '#doc-' || doc_id as subj,
       '{MENTIONS_PRED}' as pred,
       '{SOURCE_ENT_PREFIX}' || source as obj
from documents
"""


def _kg_entity_mentions_join(spark, sf_dir):
    """Stage 2b scale tier: dictionary as a DataFrame join (no driver
    broadcast dict) — same oracle as the broadcast tier."""
    from .sources.pages import DOC_PAGE_META
    from .web import link_entities_distributed, pages_to_triples
    docs = _t(spark, sf_dir, "documents")
    entities = (docs.select("source").distinct()
                .select(F.col("source").alias("surface"),
                        F.concat(F.lit(SOURCE_ENT_PREFIX), "source").alias("iri")))
    triples = pages_to_triples(_kg_pages(spark, sf_dir), minimal=True,
                               default_meta=DOC_PAGE_META)
    return link_entities_distributed(triples, entities) \
        .select("subj", "pred", "obj")


COMENTION_ENTS = ["spark", "customer", "vector", "stream"]


def _kg_comention_pmi(spark, sf_dir):
    """Stage 2c: co-mention relation mining — PMI over entity pairs
    co-occurring in one document (doc-keyed self-join, broadcast marginals)."""
    from .web import comention_pmi
    return comention_pmi(_t(spark, sf_dir, "documents"), COMENTION_ENTS,
                         min_pairs=2)


_ENTS_SQL = ", ".join(f"'{e}'" for e in COMENTION_ENTS)
_KG_COMENTION_PMI_SQL = f"""
with m as (
  select distinct doc_id as doc, t.tok as ent
  from documents, unnest({TOKS_SQL}) as t(tok)
  where t.tok in ({_ENTS_SQL})),
marg as (select ent, count(*) as n from m group by ent),
p as (
  select a.ent as ent_a, b.ent as ent_b, count(*) as n_ab
  from m a join m b on a.doc = b.doc and a.ent < b.ent
  group by 1, 2 having count(*) >= 2)
select ent_a, ent_b, n_ab,
       round(ln(cast(n_ab as double)
                * (select count(*) from documents)
                / (cast(ma.n as double) * cast(mb.n as double))), 4) as pmi
from p join marg ma on p.ent_a = ma.ent
       join marg mb on p.ent_b = mb.ent
"""


def _dedup_edit_verified_pairs(spark, sf_dir):
    """Levenshtein verification of banded SimHash candidates (the
    generate-cheap / verify-only-candidates cascade; lev is the one edit
    metric both engines spell identically)."""
    return D.edit_verified_pairs(_t(spark, sf_dir, "documents"),
                                 max_hamming=5, min_sim=0.5)


_DEDUP_EDIT_VERIFIED_SQL = f"""
with f as (select doc_id as id, text, {_simhash48_sql(TOKS_SQL)} as simhash
           from documents),
c as (
  select a.id as a, b.id as b, a.text as ta, b.text as tb
  from f a join f b on a.id < b.id
  where bit_count(xor(a.simhash, b.simhash)) <= 5)
select a, b,
       round(1 - cast(levenshtein(ta, tb) as double)
             / cast(greatest(length(ta), length(tb)) as double), 4) as edit_sim
from c
where round(1 - cast(levenshtein(ta, tb) as double)
            / cast(greatest(length(ta), length(tb)) as double), 4) >= 0.5
"""


def _kg_microdata_triples(spark, sf_dir):
    """Stage 1b: schema.org microdata items (explicit itemid → deterministic
    subjects) → rdf:type + property triples; the oracle predicts all three
    triples per document relationally."""
    from .web import microdata_to_triples
    return microdata_to_triples(_kg_pages(spark, sf_dir)) \
        .select("subj", "pred", "obj")


_KG_MICRODATA_TRIPLES_SQL = f"""
select {DOC_URL_SQL} || '#item' as subj,
       'http://www.w3.org/1999/02/22-rdf-syntax-ns#type' as pred,
       'http://schema.org/CreativeWork' as obj from documents
union all
select {DOC_URL_SQL} || '#item', 'http://schema.org/name',
       'doc ' || doc_id from documents
union all
select {DOC_URL_SQL} || '#item', 'http://schema.org/inLanguage',
       lang from documents
"""


def _kg_jsonld_triples(spark, sf_dir):
    """Stage 1d: embedded schema.org JSON-LD blocks → triples
    (web.pages_to_jsonld_triples). The fixture block per document carries
    an @id'd Article node with a typed integer (wordCount), a
    language-tagged @value (inLanguage), and a nested @id'd author node —
    so the oracle pins @context vocab expansion, @id resolution, xsd
    typing, @language handling, and nested-node edges, all relationally."""
    from .web import pages_to_jsonld_triples
    t = pages_to_jsonld_triples(_kg_pages(spark, sf_dir))
    return t.select(
        "subj", "pred", "obj",
        F.coalesce("obj_datatype", F.lit("")).alias("dt"),
        F.coalesce("obj_lang", F.lit("")).alias("olang"))


_KG_JSONLD_TRIPLES_SQL = f"""
with d as (select {DOC_URL_SQL} as u, doc_id, lang, source, n_chars
           from documents)
select u || '#jld' as subj,
       'http://www.w3.org/1999/02/22-rdf-syntax-ns#type' as pred,
       'http://schema.org/Article' as obj, '' as dt, '' as olang from d
union all
select u || '#jld', 'http://schema.org/headline', 'doc ' || doc_id, '', ''
from d
union all
select u || '#jld', 'http://schema.org/wordCount',
       cast(n_chars as varchar),
       'http://www.w3.org/2001/XMLSchema#integer', '' from d
union all
select u || '#jld', 'http://schema.org/inLanguage', lang, '', lang from d
union all
select u || '#jld', 'http://schema.org/author', u || '#author', '', '' from d
union all
select u || '#author', 'http://schema.org/name', source, '', '' from d
"""


def _kg_page_meta(spark, sf_dir):
    """Stage 1e: head metadata — title, resolved canonical link, robots
    directives (web.pages_to_head_meta). The fixture declares canonical
    groups of 5 and noindex on every doc_id % 7 == 3 page, all
    SQL-predictable."""
    from .web import pages_to_head_meta
    return pages_to_head_meta(_kg_pages(spark, sf_dir))


_KG_PAGE_META_SQL = f"""
select {DOC_URL_SQL} as url,
       'Doc ' || doc_id as title,
       'http://pages.example.org/doc/' || (doc_id - doc_id % 5) as canonical,
       doc_id % 7 = 3 as noindex,
       doc_id % 7 = 3 as nofollow
from documents
"""


def _kg_og_triples(spark, sf_dir):
    """Stage 1f: OpenGraph (RDFa-lite ``<meta property="og:*">``) →
    page-subject triples. Fixture: og:title + og:locale per page."""
    from .web import pages_to_og_triples
    return pages_to_og_triples(_kg_pages(spark, sf_dir)) \
        .select("subj", "pred", "obj")


_KG_OG_TRIPLES_SQL = f"""
select {DOC_URL_SQL} as subj, 'https://ogp.me/ns#title' as pred,
       'Doc ' || doc_id as obj from documents
union all
select {DOC_URL_SQL}, 'https://ogp.me/ns#locale', lang from documents
"""


def _kg_page_links_nofollow(spark, sf_dir):
    """Crawl-compliance link graph: edges from robots-nofollow source
    pages dropped in-kernel (web.pages_to_links respect_nofollow).
    Fixture: every doc_id % 7 == 3 page is nofollow, so exactly its
    outgoing parent-link disappears."""
    from .web import pages_to_links
    return pages_to_links(_kg_pages(spark, sf_dir),
                          respect_nofollow=True).distinct()


_KG_PAGE_LINKS_NOFOLLOW_SQL = f"""
select {DOC_URL_SQL} as src,
       'http://pages.example.org/doc/' || (doc_id // 2) as dst
from documents
where doc_id > 0 and doc_id % 7 <> 3
"""


def _text_url_strip_tracking(spark, sf_dir):
    """Tracking-param stripping (operators/urls.strip_tracking_params):
    utm_*/gclid/fbclid query params synthesized deterministically around a
    real param — the canonical same-resource dedup rule of crawl
    pipelines."""
    from .operators.urls import strip_tracking_params
    docs = _t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    messy = F.concat(
        F.lit("https://pages.example.org/doc/"), did.cast("string"),
        F.when(did % 4 == 0, F.lit("?utm_source=feed&id=")) \
         .when(did % 4 == 1, F.lit("?id=")) \
         .when(did % 4 == 2, F.lit("?gclid=abc123&utm_medium=x&id=")) \
         .otherwise(F.lit("?utm_campaign=")),
        did.cast("string"),
        F.when(did % 4 == 2, F.lit("&fbclid=z")).otherwise(F.lit("")))
    return docs.select("doc_id", messy.alias("raw"),
                       strip_tracking_params(messy).alias("clean"))


def _url_strip_tracking_sql() -> str:
    from .operators.urls import strip_tracking_sql
    messy = ("'https://pages.example.org/doc/' || doc_id"
             " || (case when doc_id % 4 = 0 then '?utm_source=feed&id='"
             " when doc_id % 4 = 1 then '?id='"
             " when doc_id % 4 = 2 then '?gclid=abc123&utm_medium=x&id='"
             " else '?utm_campaign=' end)"
             " || doc_id"
             " || (case when doc_id % 4 = 2 then '&fbclid=z' else '' end)")
    return f"""
with m as (select doc_id, {messy} as raw from documents)
select doc_id, raw, {strip_tracking_sql('raw')} as clean from m
"""


def _crawl_frontier(spark, sf_dir):
    """Crawl-frontier discovery (operators/crawl.frontier_urls): crawled
    set = pages with doc_id >= 10; their parent links point at doc_ids
    did // 2, so the frontier is exactly the uncrawled parents 5..9."""
    from .operators.crawl import frontier_urls
    from .sources.pages import pages_from_documents
    from .web import pages_to_links
    docs = _t(spark, sf_dir, "documents")
    pages = pages_from_documents(docs.where("doc_id >= 10"))
    return frontier_urls(pages_to_links(pages), pages.select("url"))


_CRAWL_FRONTIER_SQL = """
select distinct 'http://pages.example.org/doc/' || (doc_id // 2) as url
from documents
where doc_id >= 10 and doc_id // 2 < 10
"""


ROBOTS_FIXTURE = """# synthetic robots for the docs host
User-agent: other-bot
Disallow: /private

User-agent: *
Disallow: /doc/1
Disallow:   # empty = allow all, ignored
"""


def _curate_robots_filter(spark, sf_dir):
    """robots.txt compliance gate (operators/crawl): parse the fixture
    robots body through the Arrow kernel, then host-keyed prefix filter —
    every /doc/1* page (doc 1, 10-19, 100-199, ...) is dropped."""
    from .operators.crawl import filter_disallowed, robots_rules
    docs = _t(spark, sf_dir, "documents")
    urls = docs.select(
        F.concat(F.lit("http://pages.example.org/doc/"),
                 F.col("doc_id").cast("string")).alias("url"))
    robots = spark.createDataFrame(
        [("pages.example.org", ROBOTS_FIXTURE)],
        "host string, robots_txt string")
    return filter_disallowed(urls, robots_rules(robots))


_CURATE_ROBOTS_FILTER_SQL = """
select 'http://pages.example.org/doc/' || doc_id as url
from documents
where cast(doc_id as varchar) not like '1%'
"""


def _dedup_url_canonical(spark, sf_dir):
    """First-tier crawl dedup as a COMPOSITION: normalize_url ∘
    strip_tracking_params collapses scheme/host case, default ports and
    utm params, then latest_snapshot keeps one row per canonical URL —
    two snapshots per doc (a messy old capture and a clean one-day-later
    recrawl) collapse to the recrawl. Pure Column exprs + ONE keyed
    shuffle."""
    from .operators.dedup import latest_snapshot
    from .operators.urls import normalize_url, strip_tracking_params
    docs = _t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    base_ts = F.to_timestamp(F.lit("2024-01-01"))
    messy = docs.select(
        F.concat(F.lit("HTTP://Pages.Example.ORG:80/doc/"),
                 did.cast("string"),
                 F.lit("?utm_source=feed")).alias("url"),
        base_ts.alias("warc_ts"), did.alias("k"))
    clean = docs.select(
        F.concat(F.lit("http://pages.example.org/doc/"),
                 did.cast("string")).alias("url"),
        (base_ts + F.expr("INTERVAL 1 DAY")).alias("warc_ts"),
        did.alias("k"))
    snaps = messy.unionByName(clean).withColumn(
        "url", strip_tracking_params(normalize_url(F.col("url"))))
    kept = latest_snapshot(snaps, tiebreak_col=None)  # no html column here
    return kept.select("url", F.unix_timestamp("warc_ts").alias("ts_epoch"),
                       "k")


_DEDUP_URL_CANONICAL_SQL = """
select 'http://pages.example.org/doc/' || doc_id as url,
       epoch(timestamp '2024-01-02')::bigint as ts_epoch,
       doc_id as k
from documents
"""


def _crawl_recrawl_schedule(spark, sf_dir):
    """Change-rate re-crawl tiers (operators/crawl.recrawl_schedule) over 4
    simulated snapshots per URL: every-6th doc changes at every re-crawl
    (rate 1.0 → fast), every-3rd-not-6th changes once (rate 1/3 → slow),
    the rest never change (static). Content is md5-digested map-side —
    the text column never shuffles."""
    from .operators.crawl import recrawl_schedule
    docs = _t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    url = F.concat(F.lit("http://pages.example.org/doc/"),
                   did.cast("string"))
    snaps = []
    for k in range(4):
        text_k = (F.when(did % 6 == 0,
                         F.concat(F.col("text"), F.lit(f":v{k}")))
                  .when((did % 3 == 0) & F.lit(k >= 1),
                        F.concat(F.col("text"), F.lit(":v1")))
                  .otherwise(F.col("text")))
        snaps.append(docs.select(
            url.alias("url"),
            (F.to_timestamp(F.lit("2024-01-01"))
             + F.expr(f"INTERVAL {k} DAY")).alias("warc_ts"),
            text_k.alias("text")))
    all_snaps = snaps[0]
    for s in snaps[1:]:
        all_snaps = all_snaps.unionByName(s)
    out = recrawl_schedule(all_snaps)
    return out.select("url", "n_snapshots", "n_versions", "change_rate",
                      "tier", F.unix_timestamp("last_ts").alias("last_ts_epoch"))


_CRAWL_RECRAWL_SCHEDULE_SQL = """
select 'http://pages.example.org/doc/' || doc_id as url,
       cast(4 as bigint) as n_snapshots,
       cast(case when doc_id % 6 = 0 then 4
                 when doc_id % 3 = 0 then 2 else 1 end as bigint)
         as n_versions,
       case when doc_id % 6 = 0 then 1.0
            when doc_id % 3 = 0 then round(1.0 / 3, 4)
            else 0.0 end as change_rate,
       case when doc_id % 6 = 0 then 'fast'
            when doc_id % 3 = 0 then 'slow' else 'static' end as tier,
       epoch(timestamp '2024-01-04')::bigint as last_ts_epoch
from documents
"""


def _crawl_sitemap_frontier(spark, sf_dir):
    """Sitemap-driven frontier: sitemap XML files are ASSEMBLED
    distributed (one <urlset> per 100-doc group, built with pure Column
    exprs), parsed back through the Arrow kernel
    (operators/crawl.sitemap_urls — the round trip pins the parser), and
    anti-joined against the crawled set (every doc_id % 10 != 7) — the
    output is exactly the %10==7 URLs with their declared lastmod."""
    from .operators.crawl import sitemap_urls
    docs = _t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    url = F.concat(F.lit("http://pages.example.org/doc/"),
                   did.cast("string"))
    lastmod = F.date_add(F.lit("2024-01-01").cast("date"),
                         (did % 5).cast("int")).cast("string")
    frag = F.concat(F.lit("<url><loc>"), url, F.lit("</loc><lastmod>"),
                    lastmod, F.lit("</lastmod></url>"))
    sitemaps = (docs.groupBy((did / 100).cast("long").alias("g"))
                .agg(F.concat(
                    F.lit('<urlset xmlns="http://www.sitemaps.org/'
                          'schemas/sitemap/0.9">'),
                    F.concat_ws("", F.sort_array(F.collect_list(frag))),
                    F.lit("</urlset>")).alias("sitemap_xml"))
                .select(F.lit("pages.example.org").alias("host"),
                        "sitemap_xml"))
    declared = sitemap_urls(sitemaps)
    crawled = docs.where(did % 10 != 7).select(url.alias("loc"))
    return (declared.join(crawled, "loc", "left_anti")
            .select("loc", "lastmod"))


_CRAWL_SITEMAP_FRONTIER_SQL = """
select 'http://pages.example.org/doc/' || doc_id as loc,
       cast(date '2024-01-01'
            + (doc_id % 5)::int * interval 1 day as date)::varchar as lastmod
from documents
where doc_id % 10 = 7
"""


def _text_script_profile(spark, sf_dir):
    """Unicode-script profiling (operators/text.script_counts /
    dominant_script): deterministic cyrillic/CJK padding appended per
    doc_id so every branch of the dominant-script CASE is exercised —
    counts are integer-exact across engines."""
    did = F.col("doc_id")
    docs = _t(spark, sf_dir, "documents")
    mixed = F.concat(
        # doc_id % 5 == 0: drop the latin text entirely so cyrillic wins
        F.when(did % 5 == 0, F.lit("")).otherwise(F.col("text")),
        F.expr("repeat('ж', cast(doc_id % 7 as int) * 3)"),
        F.expr("repeat('中', cast(doc_id % 3 as int))"))
    counts = T.script_counts(mixed)
    return docs.select(
        "doc_id",
        *[c.alias(f"n_{name}") for name, c in counts.items()],
        T.dominant_script(mixed).alias("script"))


def _text_script_profile_sql() -> str:
    from .operators.text import dominant_script_sql, script_counts_sql
    mixed = ("(case when doc_id % 5 = 0 then '' else text end)"
             " || repeat('ж', (doc_id % 7)::int * 3)"
             " || repeat('中', (doc_id % 3)::int)")
    counts = script_counts_sql(mixed)
    cols = ", ".join(f"{c} as n_{name}" for name, c in counts.items())
    return (f"select doc_id, {cols}, {dominant_script_sql(mixed)} as script "
            f"from documents")


def _emb_int8_quantize(spark, sf_dir):
    """Per-vector absmax int8 quantization (operators/quantize.
    scalar_quantize_int8) — scale + code stats as scalars (the codes
    array itself stays out of the driver canonicalizer)."""
    from .operators.quantize import scalar_quantize_int8
    emb = _t(spark, sf_dir, "embeddings")
    scale, codes = scalar_quantize_int8(F.col("embedding"))
    q = emb.select("vec_id", scale, codes)
    return q.select(
        "vec_id", F.round("scale", 6).alias("scale_r"),
        F.aggregate("codes", F.lit(0).cast("long"),
                    lambda a, x: a + x.cast("long")).alias("q_sum"),
        F.array_min("codes").cast("long").alias("q_min"),
        F.array_max("codes").cast("long").alias("q_max"))


_EMB_INT8_QUANTIZE_SQL = """
with s as (
  select vec_id, embedding,
         greatest(list_max(list_transform(embedding,
                                          x -> abs(x::double))) / 127.0,
                  1e-30) as scale
  from embeddings),
q as (select vec_id, scale,
             list_transform(embedding, x -> floor(x::double / scale)) as c
      from s)
select vec_id, round(scale, 6) as scale_r,
       cast(list_sum(c) as bigint) as q_sum,
       cast(list_min(c) as bigint) as q_min,
       cast(list_max(c) as bigint) as q_max
from q
"""


def _emb_matryoshka(spark, sf_dir):
    """Matryoshka truncation to 8 dims + renormalization
    (operators/quantize.matryoshka_truncate): the renormalized head has
    unit norm and its coordinate sum equals sum(head)/norm(head) — both
    scalars, SQL-predictable."""
    from .operators.quantize import matryoshka_truncate
    emb = _t(spark, sf_dir, "embeddings")
    head = matryoshka_truncate(F.col("embedding"), 8, renormalize=True)
    norm = F.sqrt(F.aggregate(head, F.lit(0.0), lambda a, x: a + x * x))
    # coord_sum as sum-then-divide on the RAW slice (bit-identical to the
    # SQL spelling; summing the renormalized coords one by one differs at
    # ulp level and can flip a round-boundary)
    raw = F.transform(F.slice("embedding", 1, 8),
                      lambda x: x.cast("double"))
    hn = F.sqrt(F.aggregate(raw, F.lit(0.0), lambda a, x: a + x * x))
    total = F.aggregate(raw, F.lit(0.0), lambda a, x: a + x) / hn
    return emb.select("vec_id",
                      F.round(norm, 4).alias("unit_norm"),
                      F.round(total, 4).alias("coord_sum"))


_EMB_MATRYOSHKA_SQL = """
with h as (
  select vec_id, list_transform(embedding[1:8], x -> x::double) as head
  from embeddings),
n as (select vec_id, head,
             sqrt(list_sum(list_transform(head, x -> x * x))) as hn
      from h)
select vec_id, round(1.0, 4) as unit_norm,
       round(list_sum(head) / hn, 4) as coord_sum
from n
"""


def _kg_void_description(spark, sf_dir):
    """VoID dataset self-description (operators/void.void_description,
    exact mode) over the microdata triple set — summary counts + one
    propertyPartition node per predicate; the oracle is the generic SQL
    mirror (operators/void.void_sql) over the same triples CTE."""
    from .operators.void import void_description
    from .web import microdata_to_triples
    triples = microdata_to_triples(_kg_pages(spark, sf_dir))
    return void_description(triples, "https://kg.example.org/dataset/docs") \
        .select("subj", "pred", "obj")


def _dedup_canonical_groups(spark, sf_dir):
    """Publisher-declared dedup: group pages by effective canonical URL
    (web.canonical_groups) — the zero-compute first dedup tier of a real
    crawl. One keyed shuffle, map-side partial aggs."""
    from .web import canonical_groups, pages_to_head_meta
    return canonical_groups(pages_to_head_meta(_kg_pages(spark, sf_dir)))


_DEDUP_CANONICAL_GROUPS_SQL = """
select 'http://pages.example.org/doc/' || (doc_id - doc_id % 5) as canonical,
       cast(count(*) as bigint) as n_pages,
       'http://pages.example.org/doc/' || (doc_id - doc_id % 5)
         as representative
from documents
group by doc_id - doc_id % 5
"""


_LOCAL_NAME_SQL = "regexp_extract({c}, '([^#/]*)$', 1)"


def _canonicalized_oracle_sql(triples_sql: str) -> str:
    """Relational mirror of stage 3's exact tier: subjects with identical
    literal profiles (sorted localname(pred)=obj tokens) collapse to the
    lexical-min subject. The LSH near-dup tier adds nothing on the synthetic
    corpus (every profile carries a unique doc_id token, so estimated
    Jaccard between distinct profiles stays far below the 0.9 threshold)."""
    ln = _LOCAL_NAME_SQL.format(c="pred")
    return f"""
with t as ({triples_sql}),
prof as (
  select subj, string_agg({ln} || '=' || obj, '|' order by {ln} || '=' || obj)
         as profile
  from t group by subj),
canon as (select subj, min(subj) over (partition by profile) as csubj
          from prof)
select c.csubj as subj, t.pred, t.obj
from t join canon c on t.subj = c.subj
"""


def _kg_canonicalized_triples(spark, sf_dir):
    """Stage 3 end-to-end over the single-host corpus (profiles are all
    distinct → canonicalization is the identity; the oracle proves it by
    running the exact-tier semantics relationally)."""
    from .sources.pages import DOC_PAGE_META
    from .web import canonicalize_subjects, pages_to_triples
    triples = pages_to_triples(_kg_pages(spark, sf_dir), minimal=True,
                               default_meta=DOC_PAGE_META)
    rewritten, _mapping = canonicalize_subjects(triples)
    return rewritten.select("subj", "pred", "obj")


_KG_CANONICALIZED_TRIPLES_SQL = _canonicalized_oracle_sql(_KG_PAGES_TRIPLES_SQL)


def _kg_canonical_dupes(spark, sf_dir):
    """Stage 3 with real merging: every document appears on TWO hosts
    (pages.example.org + a mirrored url), so each subject pair has an
    identical profile and the exact-first cascade must collapse it to the
    lexical-min (mirror) subject while predicates keep their host."""
    from .sources.pages import DOC_PAGE_META
    from .web import canonicalize_subjects, pages_to_triples
    pages = _kg_pages(spark, sf_dir)
    mirror = pages.withColumn(
        "url", F.regexp_replace("url", "^http://pages\\.", "http://mirror."))
    triples = pages_to_triples(pages.unionByName(mirror), minimal=True,
                               default_meta=DOC_PAGE_META)
    rewritten, _mapping = canonicalize_subjects(triples)
    return rewritten.select("subj", "pred", "obj")


_KG_CANONICAL_DUPES_SQL = " union all ".join(
    f"select 'http://mirror.example.org/doc/' || doc_id || '#doc-' || doc_id"
    f" as subj, '{h}' || doc_id || '#{col}' as pred,"
    f" cast({col} as varchar) as obj from documents"
    for h in ("http://mirror.example.org/doc/", "http://pages.example.org/doc/")
    for col in ("doc_id", "lang", "source", "n_chars"))


# ---------------------------------------------------------------------------
# training-data curation tier (operators/curate.py)
# ---------------------------------------------------------------------------

_PII_INJECT_SQL = ("text || chr(10) || 'Contact u' || doc_id"
                   " || '@mail.example.org or call +1 555-01' || doc_id"
                   " || '0 node 10.0.' || (doc_id % 256) || '.7'")


def _hash_u32_sql(expr: str) -> str:
    """DuckDB mirror of operators/curate.hash_u32 (md5 32-bit prefix)."""
    return f"('0x' || substr(md5({expr}), 1, 8))::bigint"


def _text_pii_scrub(spark, sf_dir):
    """PII redaction (operators/curate.scrub_pii): email/IPv4/phone masking
    with per-pass match counts, chained regexp_replace in one codegen
    stage. The fixture corpus contains no PII, so a deterministic contact
    line (email + phone + IP derived from doc_id) is appended first; the
    oracle replays the same three passes with RE2."""
    from .operators import curate as C
    docs = _t(spark, sf_dir, "documents")
    did = F.col("doc_id").cast("string")
    aug = docs.withColumn(
        "text", F.concat(F.col("text"), F.lit("\nContact u"), did,
                         F.lit("@mail.example.org or call +1 555-01"), did,
                         F.lit("0 node 10.0."),
                         (F.col("doc_id") % 256).cast("string"), F.lit(".7")))
    counts = C.pii_counts(F.col("text"))
    return aug.select(
        "doc_id", *[v.alias(k) for k, v in counts.items()],
        C.scrub_pii(F.col("text")).alias("clean"))


_TEXT_PII_SCRUB_SQL = rf"""
with aug as (select doc_id, {_PII_INJECT_SQL} as text from documents),
p1 as (select doc_id,
        len(regexp_extract_all(text, '{curate_ops.PII_EMAIL_RE}'))::bigint as n_emails,
        regexp_replace(text, '{curate_ops.PII_EMAIL_RE}', '[EMAIL]', 'g') as t
       from aug),
p2 as (select doc_id, n_emails,
        len(regexp_extract_all(t, '{curate_ops.PII_IPV4_RE}'))::bigint as n_ips,
        regexp_replace(t, '{curate_ops.PII_IPV4_RE}', '[IP]', 'g') as t
       from p1)
select doc_id, n_emails, n_ips,
       len(regexp_extract_all(t, '{curate_ops.PII_PHONE_RE}'))::bigint as n_phones,
       regexp_replace(t, '{curate_ops.PII_PHONE_RE}', '[PHONE]', 'g') as clean
from p2
"""

_SAMPLE_RATES = {"en": 0.5, "de": 0.25, "zh": 1.0}
_SAMPLE_DEFAULT = 0.1


def _sample_stratified(spark, sf_dir):
    """Deterministic per-stratum downsampling to a target language mixture
    (operators/curate.stratified_sample): keep iff md5-u32(doc_id) <
    rate[lang]·2³² — a pure filter, reproducible under retries and
    repartitioning, unlike df.sample."""
    from .operators import curate as C
    docs = _t(spark, sf_dir, "documents")
    return C.stratified_sample(docs, "doc_id", "lang", _SAMPLE_RATES,
                               _SAMPLE_DEFAULT).select("doc_id", "lang")


_SAMPLE_STRATIFIED_SQL = f"""
select doc_id, lang from documents
where {_hash_u32_sql('doc_id::varchar')} <
  case lang {' '.join(f"when '{s}' then {int(r * (1 << 32))}"
                      for s, r in sorted(_SAMPLE_RATES.items()))}
       else {int(_SAMPLE_DEFAULT * (1 << 32))} end
"""


# target mixture under a total character budget; 'es' carries no weight and
# is dropped entirely — the over-represented-domain case.
_MIX_WEIGHTS = {"de": 0.2, "en": 0.5, "fr": 0.2, "zh": 0.1}
_MIX_BUDGET = 30000


def _sample_mixture(spark, sf_dir):
    """Token-budget mixture sampling (operators/curate.mixture_sample):
    per-language keep rates COMPUTED as min(1, w·B / volume) from one
    aggregation pass, then the same deterministic md5-threshold filter as
    sample_stratified — expected kept volume per language = w·B. Both
    engines evaluate the identical IEEE double expression, so the floor'd
    thresholds match exactly."""
    from .operators import curate as C
    docs = _t(spark, sf_dir, "documents")
    return (C.mixture_sample(docs, "doc_id", "lang", _MIX_WEIGHTS,
                             _MIX_BUDGET)
            .select("doc_id", "lang", "n_chars"))


_SAMPLE_MIXTURE_SQL = f"""
with tot as (
  select lang, cast(sum(n_chars) as double) as vol
  from documents group by lang),
thr as (
  select lang,
         cast(floor(least(1.0,
           case lang {' '.join(f"when '{s}' then {float(w)!r}"
                               for s, w in sorted(_MIX_WEIGHTS.items()))}
           end * cast({_MIX_BUDGET} as double) / vol) * 4294967296.0)
           as bigint) as t
  from tot
  where lang in ({', '.join(repr(s) for s in sorted(_MIX_WEIGHTS))}))
select d.doc_id, d.lang, d.n_chars
from documents d join thr on d.lang = thr.lang
where {_hash_u32_sql('d.doc_id::varchar')} < thr.t
"""


_CAP_PER_SOURCE = 40


def _corpus_cap_per_source(spark, sf_dir):
    """Domain-frequency capping (operators/curate.cap_per_source): ≤N docs
    per source by deterministic md5 rank — one shuffle on the source key.
    The oracle replays the identical row_number window in DuckDB."""
    from .operators import curate as C
    docs = _t(spark, sf_dir, "documents")
    return (C.cap_per_source(docs, max_docs=_CAP_PER_SOURCE)
            .select("doc_id", "source"))


_CORPUS_CAP_PER_SOURCE_SQL = f"""
select doc_id, source from (
  select doc_id, source,
         row_number() over (partition by source
                            order by md5(doc_id::varchar), doc_id) as r
  from documents)
where r <= {_CAP_PER_SOURCE}
"""


def _pack_sequences(spark, sf_dir):
    """Token-budget sequence packing (operators/curate.pack_sequences):
    hash-grouped greedy prefix-sum packing — one shuffle on the group key,
    one window per group, parallelism = n_groups. The oracle replays the
    window sum in DuckDB."""
    from .operators import curate as C
    docs = _t(spark, sf_dir, "documents")
    return C.pack_sequences(docs, budget=512, n_groups=16)


_PACK_SEQUENCES_SQL = rf"""
with s as (
  select doc_id,
         ({_hash_u32_sql('doc_id::varchar')} % 16)::int as grp,
         len({TOKS_SQL})::bigint as n_tok
  from documents)
select doc_id, grp,
       (coalesce(sum(n_tok) over (partition by grp order by doc_id
          rows between unbounded preceding and 1 preceding), 0) // 512)::bigint
         as seq_no,
       n_tok
from s
"""


def _text_decontaminate(spark, sf_dir):
    """Benchmark decontamination (operators/curate.flag_contamination):
    word-5-gram overlap against a broadcast benchmark shingle set (docs
    with doc_id % 97 == 0 stand in for the eval suite). Map-side
    broadcast probe + one doc-key aggregation."""
    from .operators import curate as C
    docs = _t(spark, sf_dir, "documents")
    bench = docs.where(F.col("doc_id") % 97 == 0).select("text")
    return C.flag_contamination(docs, bench, n=5)


_G5 = _grams_sql(TOKS_SQL, 5)

_TEXT_DECONTAMINATE_SQL = f"""
with g as (select doc_id, {_G5} as grams from documents),
bench as (select distinct unnest(grams) as gram from g where doc_id % 97 = 0),
hits as (select doc_id, count(*) as n_overlap
         from (select doc_id, unnest(grams) as gram from g) dg
         join bench using (gram) group by doc_id)
select g.doc_id, coalesce(hits.n_overlap, 0) as n_overlap,
       coalesce(hits.n_overlap, 0) > 0 as contaminated
from g left join hits on g.doc_id = hits.doc_id
"""


def _corpus_curated(spark, sf_dir):
    """The fused curation decision (operators/curate.curation_report):
    Gopher rules → language-ID agreement → exact-duplicate removal, first
    failing rule wins. The deliverable of the curation tier — which
    documents enter the training corpus and why."""
    from .operators import curate as C
    return C.curation_report(_t(spark, sf_dir, "documents"))


_CORPUS_CURATED_SQL = f"""
with gq as ({_TEXT_GOPHER_QUALITY_SQL}),
d as (select doc_id, lang,
             {_langid_case_sql(TOKS_SQL)} as pred_lang,
             doc_id <> min(doc_id) over (partition by md5(text)) as is_dup
      from documents)
select d.doc_id,
       case when not gq.passes then 'gopher'
            when d.lang in ({', '.join(f"'{lg}'" for lg in T.LANG_ORDER)})
                 and d.pred_lang <> d.lang then 'lang_mismatch'
            when d.is_dup then 'duplicate'
            else 'keep' end as reason,
       case when not gq.passes then false
            when d.lang in ({', '.join(f"'{lg}'" for lg in T.LANG_ORDER)})
                 and d.pred_lang <> d.lang then false
            when d.is_dup then false
            else true end as keep
from d join gq on d.doc_id = gq.doc_id
"""


_SPAN_BOILER = ("this shared boilerplate paragraph appears across many "
                "documents verbatim today")


def _grams_all_sql(t: str, n: int) -> str:
    """Non-distinct window list (every occurrence, document order) —
    mirror of operators/text.word_ngrams_all."""
    cat = " || ' ' || ".join(f"{t}[i+{j}]" if j else f"{t}[i]"
                             for j in range(n))
    return (f"case when len({t}) >= {n} then "
            f"list_transform(range(1, len({t}) - {n - 2}), i -> {cat}) "
            f"else [] end")


def _dedup_span_stats(spark, sf_dir):
    """Exact duplicated-span statistics (operators/dedup.
    duplicated_span_stats — the shuffle-friendly fixed-k approximation of
    Lee et al. 2021 EXACTSUBSTR): fraction of each document's 8-token
    windows whose exact text occurs in ≥ 2 documents. The fixture corpus
    has no natural cross-document spans, so a shared paragraph is appended
    to every 7th document first; the stats then show exactly those docs
    with dup_ratio > 0."""
    docs = _t(spark, sf_dir, "documents")
    aug = docs.withColumn(
        "text",
        F.when(F.col("doc_id") % 7 == 0,
               F.concat(F.col("text"), F.lit("\n" + _SPAN_BOILER)))
         .otherwise(F.col("text")))
    return D.duplicated_span_stats(aug, k=8)


_DEDUP_SPAN_STATS_SQL = f"""
with aug as (
  select doc_id,
         case when doc_id % 7 = 0 then text || chr(10) || '{_SPAN_BOILER}'
              else text end as text
  from documents),
h as (select doc_id, md5(unnest({_grams_all_sql(TOKS_SQL, 8)})) as h
      from aug),
cross_h as (select h from h group by h having count(distinct doc_id) >= 2),
agg as (select doc_id, count(*) as n_spans,
               sum(case when h in (select h from cross_h)
                   then 1 else 0 end)::bigint as n_dup_spans
        from h group by doc_id)
select d.doc_id,
       coalesce(agg.n_spans, 0) as n_spans,
       coalesce(agg.n_dup_spans, 0) as n_dup_spans,
       round(case when coalesce(agg.n_spans, 0) > 0
                  then agg.n_dup_spans / agg.n_spans
                  else 0.0 end, 4) as dup_ratio
from documents d left join agg on d.doc_id = agg.doc_id
"""


def _corpus_vocabulary(spark, sf_dir):
    """Corpus vocabulary profile — the canonical map-reduce (explode →
    partial-agg word count) plus document frequency, top-100 by count with
    a deterministic token tie-break. df_ratio stays a plain rounded
    division (no log) so both engines produce the identical double."""
    docs = _t(spark, sf_dir, "documents")
    n_docs = docs.count()
    return (docs.select("doc_id", F.explode(T.tokens(F.col("text")))
                        .alias("token"))
            .groupBy("token")
            .agg(F.count("*").alias("n_occ"),
                 F.countDistinct("doc_id").alias("n_docs"))
            .withColumn("df_ratio",
                        F.round(F.col("n_docs") / F.lit(n_docs), 4))
            .orderBy(F.desc("n_occ"), "token")
            .limit(100))


_CORPUS_VOCABULARY_SQL = f"""
with t as (select doc_id, unnest({TOKS_SQL}) as token from documents)
select token, count(*) as n_occ, count(distinct doc_id) as n_docs,
       round(count(distinct doc_id) /
             (select count(*) from documents), 4) as df_ratio
from t group by token
order by n_occ desc, token limit 100
"""


def _text_tfidf_terms(spark, sf_dir):
    """Top-3 TF-IDF terms per document (operators/text.tfidf_top_terms) —
    ratio idf (N/df, no log) keeps every double bit-identical across
    engines; ranking ties break on term ascending."""
    docs = _t(spark, sf_dir, "documents")
    return T.tfidf_top_terms(docs, k=3)


_TEXT_TFIDF_TERMS_SQL = f"""
with toks as (select doc_id, unnest({TOKS_SQL}) as term from documents),
tf as (select doc_id, term, count(*) as tf from toks group by doc_id, term),
dfreq as (select term, count(*) as df from tf group by term),
scored as (
  select tf.doc_id, tf.term,
         round(tf.tf * (select count(*)::double from documents) / dfreq.df,
               4) as score
  from tf join dfreq using (term))
select doc_id, term, rank, score from (
  select doc_id, term, score,
         row_number() over (partition by doc_id
                            order by score desc, term) as rank
  from scored) where rank <= 3
"""


def _corpus_length_quantiles(spark, sf_dir):
    """Per-language document-length quantiles (exact continuous
    interpolation — Spark `percentile`, not approx_percentile, mirrors
    DuckDB quantile_cont bit-for-bit). Ingestion telemetry for mixture
    monitoring; at corpus scale swap in approx_percentile and drop the
    oracle row, the aggregation shape is identical."""
    docs = _t(spark, sf_dir, "documents")
    pcts = [0.5, 0.9, 0.99]
    return (docs.groupBy("lang")
            .agg(*[F.round(F.expr(f"percentile(n_chars, {p})"), 4)
                   .alias(f"p{int(p * 100)}") for p in pcts]))


_CORPUS_LENGTH_QUANTILES_SQL = """
select lang,
       round(quantile_cont(n_chars, 0.5), 4) as p50,
       round(quantile_cont(n_chars, 0.9), 4) as p90,
       round(quantile_cont(n_chars, 0.99), 4) as p99
from documents group by lang
"""


_DOC_PROPS = ("doc_id", "lang", "source", "n_chars")


def _kg_pred_stats(spark, sf_dir):
    """Graph read-path: per-predicate profile (triple count, distinct
    subjects/objects) over the stage-1/2 triples, keyed by the property
    local name (operators/graph.predicate_stats). One groupBy with
    map-side partial aggregation; output is vocabulary-sized."""
    from .operators import graph as G
    return G.predicate_stats(_kg_pages_triples(spark, sf_dir))


_KG_PRED_STATS_SQL = f"""
with t as ({_KG_PAGES_TRIPLES_SQL})
select split_part(pred, '#', 2) as prop,
       count(*) as n_triples,
       count(distinct subj) as n_subjects,
       count(distinct obj) as n_objects
from t group by 1
"""


def _kg_property_table(spark, sf_dir):
    """Graph read-path: pivot each subject's triples into one wide row
    (property-table layout, operators/graph.property_table) — the
    relational reconstruction of the reference's row-wise ATD/JSON view
    (reader.rb:271-325) from the materialized graph."""
    from .operators import graph as G
    return G.property_table(_kg_pages_triples(spark, sf_dir), _DOC_PROPS)


_KG_PROPERTY_TABLE_SQL = f"""
with t as ({_KG_PAGES_TRIPLES_SQL})
select subj,
       {', '.join(f"max(case when split_part(pred, '#', 2) = '{p}'"
                  f" then obj end) as {p}" for p in _DOC_PROPS)}
from t group by subj
"""


def _kg_characteristic_sets(spark, sf_dir):
    """Graph summarization: characteristic sets (Neumann & Moerkotte) —
    one row per distinct per-subject predicate SET with its subject count
    (operators/graph.characteristic_sets). The statistic a SPARQL
    cardinality estimator and a physical-design advisor both start from;
    vocabulary-sized output from two narrow keyed shuffles."""
    from .operators import graph as G
    return G.characteristic_sets(_kg_pages_triples(spark, sf_dir))


def _kg_pred_cooccurrence(spark, sf_dir):
    """Schema induction: unordered property-pair co-occurrence counts over
    subjects (operators/graph.pred_cooccurrence) — the pairwise marginal
    of the characteristic sets, computed on the distinct (subj, prop)
    projection so the pair expansion is bounded by the per-subject
    property vocabulary."""
    from .operators import graph as G
    return G.pred_cooccurrence(_kg_pages_triples(spark, sf_dir))


def _summary_er_sql() -> dict[str, str]:
    from .operators.dedup import blocked_er_name_pairs_sql
    from .operators.graph import (characteristic_sets_sql,
                                  pred_cooccurrence_sql, skipgram_sql)
    return {
        "kg_characteristic_sets":
            characteristic_sets_sql(_KG_PAGES_TRIPLES_SQL),
        "kg_pred_cooccurrence":
            pred_cooccurrence_sql(_KG_PAGES_TRIPLES_SQL),
        "er_blocked_part_names":
            blocked_er_name_pairs_sql("part", "p_brand", "p_name",
                                      max_dist=3),
        "graph_skipgram_pairs":
            skipgram_sql(_GRAPH_RANDOM_WALKS_SQL, window=2),
    }


def _er_blocked_part_names(spark, sf_dir):
    """Blocked entity resolution over an attribute table: brand-blocked
    Levenshtein candidate pairs on distinct part names
    (operators/dedup.blocked_er_name_pairs) — quadratic verification runs
    on the per-block NAME vocabulary, never on entity rows; n_pairs
    carries the row-level pair cardinality without materializing it."""
    from .operators.dedup import blocked_er_name_pairs
    return blocked_er_name_pairs(_t(spark, sf_dir, "part"),
                                 "p_brand", "p_name", max_dist=3)


# ---------------------------------------------------------------------------
# graph query tier: SPARQL-style BGP matching + link analysis + inference
# (operators/bgp.py, operators/graph.py) — the consumption side of the KG.
# ---------------------------------------------------------------------------

_RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
_LABEL_PRED = "http://schema.org/name"

_BGP_STAR_PATTERNS = [
    ("?item", _RDF_TYPE, "http://schema.org/CreativeWork"),
    ("?item", _LABEL_PRED, "?name"),
    ("?item", "http://schema.org/inLanguage", "?lang"),
]


def _kg_bgp_star(spark, sf_dir):
    """SPARQL star BGP (type + two property patterns sharing ?item) over
    the microdata graph, compiled to self-joins (operators/bgp.bgp_match).
    The oracle SQL is emitted from the SAME join plan (bgp_sql) — one
    source of truth, two engines."""
    from .operators.bgp import bgp_match
    return bgp_match(_kg_microdata_triples(spark, sf_dir).persist(),
                     _BGP_STAR_PATTERNS)


_BGP_PATH_PATTERNS = [
    ("?doc", MENTIONS_PRED, "?ent"),
    ("?ent", _LABEL_PRED, "?name"),
]


def _kg_bgp_path(spark, sf_dir):
    """2-hop path BGP: ?doc –mentions→ ?ent –name→ ?name over the mention
    graph unioned with entity-label triples; the label pattern binds a
    vocabulary-sized set so it carries a broadcast hint."""
    from .operators.bgp import bgp_match
    from .sources.pages import DOC_PAGE_META
    from .web import link_entities_distributed, pages_to_triples
    docs = _t(spark, sf_dir, "documents")
    entities = (docs.select("source").distinct()
                .select(F.col("source").alias("surface"),
                        F.concat(F.lit(SOURCE_ENT_PREFIX),
                                 "source").alias("iri")))
    triples = pages_to_triples(_kg_pages(spark, sf_dir), minimal=True,
                               default_meta=DOC_PAGE_META)
    mentions = link_entities_distributed(triples, entities) \
        .select("subj", "pred", "obj")
    labels = entities.select(F.col("iri").alias("subj"),
                             F.lit(_LABEL_PRED).alias("pred"),
                             F.col("surface").alias("obj"))
    return bgp_match(mentions.unionByName(labels), _BGP_PATH_PATTERNS,
                     broadcast_patterns=[1])


_KG_BGP_PATH_GRAPH_SQL = f"""
{_KG_ENTITY_MENTIONS_SQL}
union all
select distinct '{SOURCE_ENT_PREFIX}' || source as subj,
       '{_LABEL_PRED}' as pred, source as obj
from documents
"""

# doc hierarchy for the iterative algorithms: child → parent binary tree
# derived from doc ids (in-degree ≤ 2, out-degree 1 — the shape that keeps
# every PageRank float sum a single IEEE op, see operators/graph.pagerank).
_TREE_EDGES_SQL = (
    f"select {DOC_URL_SQL} as src, "
    "'http://pages.example.org/doc/' || (doc_id // 2) as dst "
    "from documents where doc_id > 0")


def _doc_tree_edges(spark, sf_dir):
    prefix = "http://pages.example.org/doc/"
    return (_t(spark, sf_dir, "documents")
            .filter(F.col("doc_id") > 0)
            .select(F.concat(F.lit(prefix), F.col("doc_id")).alias("src"),
                    F.concat(F.lit(prefix),
                             F.expr("doc_id div 2")).alias("dst")))


def _graph_pagerank(spark, sf_dir):
    """Fixed-iteration PageRank (3 iters, d=0.85) over the doc hierarchy;
    oracle = the same recurrence unrolled as SQL CTEs with repr-exact
    float literals (operators/graph.pagerank_sql)."""
    from .operators.graph import pagerank
    return pagerank(_doc_tree_edges(spark, sf_dir), n_iter=3, damping=0.85)


def _graph_closure_ancestors(spark, sf_dir):
    """Transitive closure (all ancestor pairs) via semi-naive iteration;
    oracle = recursive CTE (operators/graph.closure_sql) — the rdfs
    subClassOf/subPropertyOf closure primitive. The doc tree is
    depth-dominated, so the BENCH headline runs the path-doubling tier
    (graph_closure_doubling, 2.3× faster at sf0.1 — log2(depth) rounds
    vs depth-many delta rounds, each paying a fixed checkpoint cost);
    this semi-naive entry stays registered as the breadth-dominated
    tier where closure×closure intermediates blow up."""
    from .operators.graph import transitive_closure
    return transitive_closure(_doc_tree_edges(spark, sf_dir))


def _graph_hits(spark, sf_dir):
    """Fixed-iteration HITS hubs/authorities over the doc tree
    (operators/graph.hits) — unnormalized integer power iterations, so the
    oracle (the same recurrence unrolled as bigint SQL CTEs) is exact
    regardless of either engine's aggregation order."""
    from .operators.graph import hits
    return hits(_doc_tree_edges(spark, sf_dir), n_iter=2)


def _graph_random_walks(spark, sf_dir):
    """DeepWalk corpus over the doc tree (operators/graph.random_walks):
    2 walks × 4 steps per node, deterministic md5 edge picks; on the
    out-degree-≤1 tree every walk is the ancestor chain, so the oracle is
    a plain recursive CTE."""
    from .operators.graph import random_walks
    return random_walks(_doc_tree_edges(spark, sf_dir), length=4,
                        walks_per_node=2)


_GRAPH_RANDOM_WALKS_SQL = f"""
with recursive e as ({_TREE_EDGES_SQL}),
-- NB: inside WITH RECURSIVE DuckDB mis-evaluates a bare `union` in a
-- non-recursive CTE (no dedup across branches); distinct-over-union-all
-- is the portable spelling
nodes as (select distinct node from
          (select src as node from e union all select dst from e)),
w(start, walk, step, node) as (
  select node, v.i, 0::bigint, node
  from nodes cross join (values (0::bigint), (1::bigint)) as v(i)
  union all
  select w.start, w.walk, w.step + 1, e.dst
  from w join e on e.src = w.node where w.step < 4)
select start, walk, step, node from w
"""


def _graph_skipgram_pairs(spark, sf_dir):
    """Embedding-training data prep: skip-gram (center, context) pair
    counts from the DeepWalk corpus (operators/graph.skipgram_pairs) —
    one (start, walk)-keyed self-join bounded to 2·window pairs per row,
    then a vocabulary-pair groupBy."""
    from .operators.graph import random_walks, skipgram_pairs
    walks = random_walks(_doc_tree_edges(spark, sf_dir), length=4,
                         walks_per_node=2)
    return skipgram_pairs(walks, window=2)


def _graph_bfs_depths(spark, sf_dir):
    """BFS hop-distances from the root over the REVERSED doc tree (parent →
    child) — every document's depth; frontier iteration, one keyed join per
    round (operators/graph.bfs_distances)."""
    from .operators.graph import bfs_distances
    edges = _doc_tree_edges(spark, sf_dir).select(
        F.col("dst").alias("src"), F.col("src").alias("dst"))
    root = spark.createDataFrame(
        [("http://pages.example.org/doc/0",)], "node string")
    return bfs_distances(edges, root)


_GRAPH_BFS_DEPTHS_SQL = f"""
with recursive e as (
  select dst as src, src as dst from ({_TREE_EDGES_SQL})),
r(node, d) as (
  select 'http://pages.example.org/doc/0', 0
  union
  select e.dst, r.d + 1 from r join e on e.src = r.node where r.d < 64)
select node, min(d)::bigint as dist from r group by node
"""


def _kg_page_links(spark, sf_dir):
    """Stage 1c: hyperlink graph extraction — each doc page carries one
    relative parent link, so the extracted+resolved edge set must equal the
    doc tree the oracle predicts (web.pages_to_links, urljoin resolution)."""
    from .web import pages_to_links
    return pages_to_links(_kg_pages(spark, sf_dir)).distinct()


def _kg_anchor_texts(spark, sf_dir):
    """Stage 1c + naming signal: anchor-text aggregation per link target —
    how OTHER pages refer to an entity (web.pages_to_anchors). Each doc
    page's parent link carries the parent's name as anchor text, so the
    expected (dst, anchor, n_refs) set is the doc tree's child counts,
    SQL-computable from the documents table."""
    from .web import pages_to_anchors
    return (pages_to_anchors(_kg_pages(spark, sf_dir))
            .groupBy("dst", "anchor")
            .agg(F.count("*").cast("long").alias("n_refs")))


_KG_ANCHOR_TEXTS_SQL = """
select 'http://pages.example.org/doc/' || (doc_id // 2) as dst,
       'doc ' || (doc_id // 2) as anchor,
       count(*)::bigint as n_refs
from documents where doc_id > 0
group by 1, 2
"""


def _kg_anchor_labels(spark, sf_dir):
    """Stage 2d: majority anchor text per target promoted to rdfs:label
    triples (web.anchor_labels) — every parent doc gets labeled by how its
    children link to it; oracle = the distinct parent set in SQL."""
    from .web import anchor_labels, pages_to_anchors
    return anchor_labels(pages_to_anchors(_kg_pages(spark, sf_dir)))


_KG_ANCHOR_LABELS_SQL = """
select distinct 'http://pages.example.org/doc/' || (doc_id // 2) as subj,
       'http://www.w3.org/2000/01/rdf-schema#label' as pred,
       'doc ' || (doc_id // 2) as obj
from documents where doc_id > 0
"""


def _dedup_url_latest(spark, sf_dir):
    """Recrawl dedup: the pages table unioned with a simulated one-day-later
    re-crawl of every third page collapses to one row per url — the LATEST
    capture wins (operators/dedup.latest_snapshot, groupBy + max_by, one
    keyed shuffle with map-side combine). Oracle: the expected winning
    timestamp is computable per doc_id in plain SQL."""
    from .operators.dedup import latest_snapshot
    pages = _kg_pages(spark, sf_dir)
    did = F.regexp_extract("url", r"doc/(\d+)$", 1).cast("long")
    recrawl = (pages.where(did % 3 == 0)
               .withColumn("warc_ts",
                           F.col("warc_ts") + F.expr("INTERVAL 1 DAY")))
    kept = latest_snapshot(pages.unionByName(recrawl))
    return kept.select("url", F.unix_timestamp("warc_ts").alias("ts_epoch"),
                       "lang")


_DEDUP_URL_LATEST_SQL = f"""
select {DOC_URL_SQL} as url,
       epoch(timestamp '2024-01-01' + to_seconds(doc_id % 86400)
             + case when doc_id % 3 = 0 then interval 1 day
                    else interval 0 day end)::bigint as ts_epoch,
       lang
from documents
"""


def _kg_negative_samples(spark, sf_dir):
    """TransE-style negative sampling over the microdata graph: 2
    deterministic corrupted tails per triple from an md5-sampled broadcast
    entity pool (operators/graph.negative_samples)."""
    from .operators.graph import negative_samples
    return negative_samples(_kg_microdata_triples(spark, sf_dir), k=2)


_KG_NEGATIVE_SAMPLES_SQL = f"""
with t as ({{graph}}),
p as (select distinct subj from t),
pool as (
  select row_number() over (order by md5(subj), subj) - 1 as neg_idx_key,
         subj as neg_obj
  from p qualify row_number() over (order by md5(subj), subj) <= 100000),
n as (select count(*) as n from pool),
cand as (
  select t.subj, t.pred, t.obj, i.i as neg_idx,
         ('0x' || substring(md5(t.subj || '|' || t.pred || '|' || t.obj
                                || '|' || i.i), 1, 8))::bigint
         % (select n from n) as neg_idx_key
  from t cross join (values (0), (1)) as i(i))
select c.subj, c.pred, pool.neg_obj, c.neg_idx
from cand c join pool using (neg_idx_key)
where pool.neg_obj <> c.obj
"""


def _kg_degree_histogram(spark, sf_dir):
    """Out-degree distribution over the sparse microdata graph (items carry
    3 or 4 triples depending on the wordCount threshold) — graph-shape
    telemetry (operators/graph.degree_histogram)."""
    from .operators.graph import degree_histogram
    return degree_histogram(_kg_sparse_graph(spark, sf_dir))


_KG_DEGREE_HISTOGRAM_SQL = """
with t as ({sparse}),
deg as (select subj, count(*) as degree from t group by subj)
select degree, count(*)::bigint as n_subjects from deg group by degree
"""


# SPARQL algebra extensions over the microdata graph + a deliberately
# sparse wordCount predicate (only docs with n_chars > threshold carry it)
# so OPTIONAL produces real unbound (NULL) rows, not a disguised inner join.
_WORDCOUNT_PRED = "http://schema.org/wordCount"
_WC_THRESHOLD = 300

_KG_SPARSE_GRAPH_SQL = f"""
{_KG_MICRODATA_TRIPLES_SQL}
union all
select {DOC_URL_SQL} || '#item', '{_WORDCOUNT_PRED}',
       cast(n_chars as varchar) from documents where n_chars > {_WC_THRESHOLD}
"""

_BGP_OPTIONAL_REQUIRED = [
    ("?item", _RDF_TYPE, "http://schema.org/CreativeWork"),
    ("?item", _LABEL_PRED, "?name"),
]
_BGP_OPTIONAL_GROUPS = [[("?item", _WORDCOUNT_PRED, "?wc")]]

# FILTER strings are the shared source of truth: the identical expression
# executes in Spark (F.expr) and DuckDB (outer WHERE).
_BGP_FILTER_EXPRS = ["lang = 'en'", "length(name) > 5"]
_BGP_FILTER_PATTERNS = _BGP_STAR_PATTERNS

_BGP_UNION_BRANCHES = [
    [("?item", _LABEL_PRED, "?v")],
    [("?item", "http://schema.org/inLanguage", "?v"),
     ("?item", _WORDCOUNT_PRED, "?wc")],
]


def _kg_sparse_graph(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    wc = docs.filter(F.col("n_chars") > _WC_THRESHOLD).select(
        F.concat(F.lit("http://pages.example.org/doc/"), F.col("doc_id"),
                 F.lit("#item")).alias("subj"),
        F.lit(_WORDCOUNT_PRED).alias("pred"),
        F.col("n_chars").cast("string").alias("obj"))
    # persist: every BGP pattern leg scans this relation — without it each
    # leg re-runs the Arrow extraction kernel (materialized stores don't
    # have this problem; unmaterialized extraction DAGs do)
    return _kg_microdata_triples(spark, sf_dir).unionByName(wc).persist()


def _kg_bgp_optional(spark, sf_dir):
    """SPARQL OPTIONAL: type+name star with an OPTIONAL wordCount — docs at
    or below the length threshold have no wordCount triple, so the left
    join emits real NULL bindings (operators/bgp.bgp_match optionals=)."""
    from .operators.bgp import bgp_match
    return bgp_match(_kg_sparse_graph(spark, sf_dir),
                     _BGP_OPTIONAL_REQUIRED,
                     optionals=_BGP_OPTIONAL_GROUPS)


def _kg_bgp_filter(spark, sf_dir):
    """SPARQL FILTER: the star BGP constrained by expression strings that
    BOTH engines execute verbatim ('lang = en', length(name) > 5) — the
    filter lands post-join but Catalyst pushes it into the pattern scans
    (audited in test_plans)."""
    from .operators.bgp import bgp_match
    return bgp_match(_kg_microdata_triples(spark, sf_dir).persist(),
                     _BGP_FILTER_PATTERNS, filters=_BGP_FILTER_EXPRS)


def _kg_bgp_minus(spark, sf_dir):
    """SPARQL MINUS (negation-as-anti-join): CreativeWorks WITHOUT a
    wordCount triple — the complement of the OPTIONAL query's bound rows
    (operators/bgp.bgp_match minus=)."""
    from .operators.bgp import bgp_match
    return bgp_match(_kg_sparse_graph(spark, sf_dir),
                     _BGP_OPTIONAL_REQUIRED,
                     minus=_BGP_OPTIONAL_GROUPS)


def _kg_bgp_union(spark, sf_dir):
    """SPARQL UNION: name-or-(language+wordCount) branches with different
    variable sets — branch-missing vars NULL-pad (SPARQL unbound), bag
    semantics (operators/bgp.bgp_union_match)."""
    from .operators.bgp import bgp_union_match
    return bgp_union_match(_kg_sparse_graph(spark, sf_dir),
                           _BGP_UNION_BRANCHES)


# DESCRIBE (CBD): two-level blank-node stats graph — doc → _:stats →
# _:detail — so the bounded description genuinely iterates (depth 2),
# exactly the shape CSVW row/list bnodes produce.
_DESCRIBE_GRAPH_SQL = f"""
select {DOC_URL_SQL} as subj, 'http://example.org/voc#hasStats' as pred,
       '_:s' || doc_id as obj from documents
union all
select '_:s' || doc_id, 'http://example.org/voc#nChars',
       cast(n_chars as varchar) from documents
union all
select '_:s' || doc_id, 'http://example.org/voc#detail',
       '_:t' || doc_id from documents
union all
select '_:t' || doc_id, 'http://example.org/voc#source',
       source from documents
"""
_DESCRIBE_SEEDS_SQL = (f"select {DOC_URL_SQL} as node from documents "
                       "where lang = 'en'")


def _kg_describe_docs(spark, sf_dir):
    """SPARQL DESCRIBE as Concise Bounded Description
    (operators/graph.describe): English docs' triples plus their
    transitive blank-node subtrees (2 bnode hops); oracle = recursive
    bnode-reachability CTE + semijoin."""
    from .operators.graph import describe
    docs = _t(spark, sf_dir, "documents")
    url = F.concat(F.lit("http://pages.example.org/doc/"), F.col("doc_id"))
    V = "http://example.org/voc#"
    triples = (
        docs.select(url.alias("subj"), F.lit(V + "hasStats").alias("pred"),
                    F.concat(F.lit("_:s"), F.col("doc_id")).alias("obj"))
        .unionByName(docs.select(
            F.concat(F.lit("_:s"), F.col("doc_id")).alias("subj"),
            F.lit(V + "nChars").alias("pred"),
            F.col("n_chars").cast("string").alias("obj")))
        .unionByName(docs.select(
            F.concat(F.lit("_:s"), F.col("doc_id")).alias("subj"),
            F.lit(V + "detail").alias("pred"),
            F.concat(F.lit("_:t"), F.col("doc_id")).alias("obj")))
        .unionByName(docs.select(
            F.concat(F.lit("_:t"), F.col("doc_id")).alias("subj"),
            F.lit(V + "source").alias("pred"),
            F.col("source").alias("obj")))).persist()
    seeds = docs.filter(F.col("lang") == "en").select(url.alias("node"))
    return describe(triples, seeds)


# CONSTRUCT: re-map the microdata vocabulary to a target ontology — each
# WHERE binding instantiates the template; the OPTIONAL wordCount leg means
# short docs drop the ex:length pattern (SPARQL §16.2 unbound-drop).
_CONSTRUCT_TEMPLATE = [
    ("?item", "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
     "http://example.org/voc#Document"),
    ("?item", "http://example.org/voc#label", "?name"),
    ("?item", "http://example.org/voc#length", "?wc"),
]


def _kg_bgp_agg(spark, sf_dir):
    """SPARQL SELECT + GROUP BY over BGP bindings (aggregation pushes into
    the binding relation — map-side partial counts, vocabulary-sized
    output): docs per language with the lexical-min name."""
    from .operators.bgp import bgp_match
    b = bgp_match(_kg_microdata_triples(spark, sf_dir).persist(),
                  _BGP_STAR_PATTERNS)
    return b.groupBy("lang").agg(F.count("*").alias("n_docs"),
                                 F.min("name").alias("first_name"))


def _kg_construct_derived(spark, sf_dir):
    """SPARQL CONSTRUCT (operators/bgp.construct): vocabulary re-mapping
    rule over the sparse graph; unbound OPTIONAL vars drop their template
    pattern, output is a deduplicated triple set."""
    from .operators.bgp import construct
    return construct(_kg_sparse_graph(spark, sf_dir),
                     _BGP_OPTIONAL_REQUIRED,
                     _CONSTRUCT_TEMPLATE,
                     optionals=_BGP_OPTIONAL_GROUPS)


# property-path showcase: sibling-or-self (down one, up one) OR any
# ancestor — exercises sequence, inverse, alternation, and closure in a
# single expression compiled once for both engines.
_PATH_EXPR = "parent/^parent | parent+"
_TREE_TRIPLES_SQL = (f"select src as subj, 'parent' as pred, dst as obj "
                     f"from ({_TREE_EDGES_SQL})")


def _graph_closure_doubling(spark, sf_dir):
    """Deep-graph closure scale tier: path doubling (2^k path lengths per
    round, log2(depth) rounds — operators/graph.transitive_closure_doubling)
    over the same doc hierarchy; same oracle as the semi-naive tier."""
    from .operators.graph import transitive_closure_doubling
    return transitive_closure_doubling(_doc_tree_edges(spark, sf_dir))


def _graph_path_expr(spark, sf_dir):
    """SPARQL 1.1 property path over the doc hierarchy
    (operators/paths.path_match): '{path}' — the same parsed AST emits the
    DuckDB oracle SQL (paths.path_sql), recursive CTE for the closure
    leg.""".format(path=_PATH_EXPR)
    from .operators.paths import path_match
    edges = _doc_tree_edges(spark, sf_dir)
    triples = edges.select(F.col("src").alias("subj"),
                           F.lit("parent").alias("pred"),
                           F.col("dst").alias("obj"))
    return path_match(triples, _PATH_EXPR)


# path-in-BGP: tree 'parent' triples + per-doc language triples on the
# same subjects, so a path predicate and a plain pattern share variables.
_TREE_LANG_GRAPH_SQL = f"""
{_TREE_TRIPLES_SQL}
union all
select {DOC_URL_SQL} as subj, 'hasLang' as pred, lang as obj from documents
"""


def _tree_lang_graph(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    prefix = "http://pages.example.org/doc/"
    edges = _doc_tree_edges(spark, sf_dir)
    tree = edges.select(F.col("src").alias("subj"),
                        F.lit("parent").alias("pred"),
                        F.col("dst").alias("obj"))
    langs = docs.select(
        F.concat(F.lit(prefix), F.col("doc_id")).alias("subj"),
        F.lit("hasLang").alias("pred"), F.col("lang").alias("obj"))
    return tree.unionByName(langs).persist()


def _path_bgp_patterns():
    from .operators.paths import parse_path
    return [("?d", parse_path("parent+"), "?anc"),
            ("?anc", "hasLang", "?l")]


def _kg_bgp_path_expr(spark, sf_dir):
    """Property path INSIDE a BGP (SPARQL path-in-predicate-position):
    ancestors via 'parent+' joined with each ancestor's language — the
    path AST is the pattern term, so IRIs containing '/' are never
    misparsed (operators/bgp._is_path)."""
    from .operators.bgp import bgp_match
    return bgp_match(_tree_lang_graph(spark, sf_dir), _path_bgp_patterns())


# SPARQL SELECT aggregation with HAVING (operators/bgp.bgp_agg): group
# the star BGP's bindings by language, aggregate, and post-filter on the
# aggregate aliases — the group_by/aggs/having specs are the shared
# source of truth for both engines.
_BGP_AGG_GROUP = ["lang"]
_BGP_AGG_AGGS = [("n_docs", "count(*)"),
                 ("max_name_len", "max(length(name))")]
_BGP_AGG_HAVING = ["n_docs >= 80"]


def _kg_bgp_having(spark, sf_dir):
    """GROUP BY + HAVING over BGP bindings: one map-side-combined shuffle
    on the group keys; HAVING sees aggregate aliases (post-aggregation
    filter, SPARQL semantics)."""
    from .operators.bgp import bgp_agg
    return bgp_agg(_kg_microdata_triples(spark, sf_dir).persist(),
                   _BGP_STAR_PATTERNS, _BGP_AGG_GROUP, _BGP_AGG_AGGS,
                   having=_BGP_AGG_HAVING)


# SPARQL GROUP_CONCAT / COUNT(DISTINCT) / SAMPLE: the aggregate forms
# beyond plain count/sum — GROUP_CONCAT is the one whose SQL spelling
# diverges per engine (bgp._norm_aggs pins order by sorting in both);
# SAMPLE is min() (deterministic choice where SPARQL allows any element).
_BGP_GC_AGGS = [("n_names", "count(distinct name)"),
                ("sample_name", "min(name)"),
                ("names_cat", "group_concat", "name", ";")]


def _kg_bgp_group_concat(spark, sf_dir):
    """GROUP_CONCAT + COUNT(DISTINCT) + SAMPLE per language over the
    microdata BGP (operators/bgp.bgp_agg structured aggregates)."""
    from .operators.bgp import bgp_agg
    return bgp_agg(_kg_microdata_triples(spark, sf_dir).persist(),
                   _BGP_STAR_PATTERNS, _BGP_AGG_GROUP, _BGP_GC_AGGS)


# SPARQL 1.1 §12 subquery: per-group statistics decorating row-level
# bindings — every doc joined to its language's doc count.
_BGP_SUB_PATTERNS = [("?d", "http://schema.org/inLanguage", "?lang")]
_BGP_SUB_AGGS = [("n_docs", "count(*)")]


def _kg_bgp_subselect(spark, sf_dir):
    """Subquery (operators/bgp.bgp_subselect): inner SELECT aggregates
    docs per language; its one-row-per-group result broadcast-joins the
    outer star bindings on ?lang."""
    from .operators.bgp import bgp_subselect
    return bgp_subselect(_kg_microdata_triples(spark, sf_dir).persist(),
                         _BGP_STAR_PATTERNS, _BGP_SUB_PATTERNS,
                         _BGP_AGG_GROUP, _BGP_SUB_AGGS)


# SPARQL text front-end (rdf_tabular_spark/sparql.py): the SAME query
# string parses once and compiles to both engines — the oracle checks the
# full text→algebra→plan chain, not a hand-built mirror.
_SPARQL_SELECT_QUERY = """
PREFIX schema: <http://schema.org/>
SELECT ?item ?name ?lang WHERE {
  ?item a schema:CreativeWork ; schema:name ?name .
  OPTIONAL { ?item schema:inLanguage ?lang }
  FILTER(STRLEN(?name) > 5)
}
"""

_SPARQL_AGG_QUERY = """
PREFIX schema: <http://schema.org/>
SELECT ?lang (COUNT(*) AS ?n_docs)
       (GROUP_CONCAT(?name; SEPARATOR=";") AS ?names)
WHERE { ?item schema:inLanguage ?lang ; schema:name ?name }
GROUP BY ?lang
HAVING(?n_docs >= 2)
"""


_SPARQL_FUNCS_QUERY = """
PREFIX schema: <http://schema.org/>
SELECT ?item ?tail ?digest ?nlen ?numname ?isiri ?namelike WHERE {
  ?item schema:name ?name ; schema:inLanguage ?lang .
  BIND(STRAFTER(?name, "doc ") AS ?tail)
  BIND(MD5(?lang) AS ?digest)
  BIND(STRLEN(?name) AS ?nlen)
  BIND(ISNUMERIC(?tail) AS ?numname)
  BIND(ISIRI(?item) AS ?isiri)
  BIND(REGEX(?name, "^DOC [0-9]+", "i") AS ?namelike)
  FILTER(CONTAINS(?name, "doc") && !ISBLANK(?item) && ISLITERAL(?name)
         && REGEX(?lang, "^[a-z]{2}"))
}
"""


def _kg_sparql_funcs(spark, sf_dir):
    """r4 SPARQL builtins through the text front-end: STRAFTER/MD5/STRLEN/
    ISNUMERIC/ISIRI in BIND projections plus CONTAINS/ISBLANK/ISLITERAL in
    a FILTER — every function compiles to the one shared Spark∩DuckDB SQL
    string, so the oracle is the same query through the SQL compiler."""
    from .sparql import query_df
    return query_df(_kg_microdata_triples(spark, sf_dir).persist(),
                    _SPARQL_FUNCS_QUERY)


def _kg_sparql_select(spark, sf_dir):
    """SPARQL string → bgp_match via the text front-end (prefixes, 'a',
    ';' blocks, OPTIONAL, FILTER with STRLEN translation)."""
    from .sparql import query_df
    return query_df(_kg_microdata_triples(spark, sf_dir).persist(),
                    _SPARQL_SELECT_QUERY)


def _kg_sparql_agg(spark, sf_dir):
    """SPARQL aggregate string → bgp_agg via the text front-end
    (GROUP_CONCAT with separator, COUNT(*), HAVING over aliases)."""
    from .sparql import query_df
    return query_df(_kg_microdata_triples(spark, sf_dir).persist(),
                    _SPARQL_AGG_QUERY)


# ---- rendered-term graph tier (rdfio/terms.py): the documents table as
# a graph whose objects keep full RDF term identity — name literals are
# language-tagged with the document's language, wordCount is
# xsd:integer-typed, rdf:type points at an IRI. This is the tier that
# unlocks LANG/DATATYPE/LANGMATCHES/STRLANG/STRDT/exact-sameTerm (the
# reference keeps RDF::Literal language/datatype end-to-end,
# reader.rb to_rdf; the lexical 3-col graph cannot answer these).

_XSD_INT = "http://www.w3.org/2001/XMLSchema#integer"

# term-column relation (TRIPLE_SCHEMA shape) — the oracle builds the
# identical relation in SQL and both sides render through the ONE
# RENDER_OBJ_SQL projection (rdfio/terms.py, single source of truth)
_KG_TERM_COLS_SQL = f"""
select {DOC_URL_SQL} || '#item' as subj,
       '{_LABEL_PRED}' as pred, 'doc ' || doc_id as obj,
       false as obj_is_iri, cast(null as varchar) as obj_datatype,
       lang as obj_lang from documents
union all
select {DOC_URL_SQL} || '#item', '{_WORDCOUNT_PRED}',
       cast(n_chars as varchar), false, '{_XSD_INT}',
       cast(null as varchar) from documents
union all
select {DOC_URL_SQL} || '#item',
       'http://www.w3.org/1999/02/22-rdf-syntax-ns#type',
       'http://schema.org/CreativeWork', true, cast(null as varchar),
       cast(null as varchar) from documents
"""


def _kg_term_graph(spark, sf_dir):
    from .rdfio.terms import render_object_terms
    docs = _t(spark, sf_dir, "documents")
    subj = F.concat(F.lit("http://pages.example.org/doc/"),
                    F.col("doc_id"), F.lit("#item")).alias("subj")
    null_s = F.lit(None).cast("string")
    name = docs.select(
        subj, F.lit(_LABEL_PRED).alias("pred"),
        F.concat(F.lit("doc "), F.col("doc_id")).alias("obj"),
        F.lit(False).alias("obj_is_iri"),
        null_s.alias("obj_datatype"), F.col("lang").alias("obj_lang"))
    wc = docs.select(
        subj, F.lit(_WORDCOUNT_PRED).alias("pred"),
        F.col("n_chars").cast("string").alias("obj"),
        F.lit(False).alias("obj_is_iri"),
        F.lit(_XSD_INT).alias("obj_datatype"), null_s.alias("obj_lang"))
    typ = docs.select(
        subj, F.lit(_RDF_TYPE).alias("pred"),
        F.lit("http://schema.org/CreativeWork").alias("obj"),
        F.lit(True).alias("obj_is_iri"),
        null_s.alias("obj_datatype"), null_s.alias("obj_lang"))
    return render_object_terms(
        name.unionByName(wc).unionByName(typ)).persist()


_SPARQL_TERM_LANG_QUERY = """
SELECT ?item (STR(?n) AS ?name) (LANG(?n) AS ?lg)
WHERE { ?item <http://schema.org/name> ?n .
        FILTER LANGMATCHES(LANG(?n), "en") }
"""

_SPARQL_TERM_DT_QUERY = """
SELECT ?item (DATATYPE(?v) AS ?dt) (STR(?v) AS ?lex)
WHERE { ?item <http://schema.org/wordCount> ?v . FILTER ISNUMERIC(?v) }
"""

# STRDT(STR(?v), xsd:integer) rebuilds the typed term; sameTerm keeps
# exactly the objects that already WERE xsd:integer literals — the
# name/type triples drop even when their lexical forms collide
_SPARQL_TERM_SAMETERM_QUERY = """
SELECT ?item ?v
WHERE { ?item ?p ?v . FILTER sameTerm(?v,
        STRDT(STR(?v), <http://www.w3.org/2001/XMLSchema#integer>)) }
"""


def _parse_term(q):
    from .sparql import parse_sparql
    return parse_sparql(q, term_graph=True)


def _term_triples_sql() -> str:
    from .rdfio.terms import render_object_terms_sql
    return render_object_terms_sql(_KG_TERM_COLS_SQL)


def _kg_term_lang(spark, sf_dir):
    """SPARQL LANG/LANGMATCHES/STR over a rendered-term graph — exact
    language-tag introspection the lexical 3-col graph cannot express
    (sparql.parse_sparql term_graph=True, rdfio/terms.py)."""
    from .sparql import query_df
    return query_df(_kg_term_graph(spark, sf_dir),
                    _parse_term(_SPARQL_TERM_LANG_QUERY))


def _kg_term_datatype(spark, sf_dir):
    """SPARQL DATATYPE/ISNUMERIC/STR over typed literals."""
    from .sparql import query_df
    return query_df(_kg_term_graph(spark, sf_dir),
                    _parse_term(_SPARQL_TERM_DT_QUERY))


def _kg_term_sameterm(spark, sf_dir):
    """SPARQL exact sameTerm + STRDT term construction."""
    from .sparql import query_df
    return query_df(_kg_term_graph(spark, sf_dir),
                    _parse_term(_SPARQL_TERM_SAMETERM_QUERY))


# SPARQL GRAPH (quads): 4-term patterns over (graph, subj, pred, obj),
# graph = the source document (table_url — per-triple provenance the
# kernel already carries). Both patterns share ?g AND ?item, so the join
# requires the type and name to come from the SAME document.
_BGP_GRAPH_PATTERNS = [
    ("?g", "?item", _RDF_TYPE, "http://schema.org/CreativeWork"),
    ("?g", "?item", _LABEL_PRED, "?name"),
]

_KG_MICRODATA_QUADS_SQL = f"""
select {DOC_URL_SQL} as graph, {DOC_URL_SQL} || '#item' as subj,
       'http://www.w3.org/1999/02/22-rdf-syntax-ns#type' as pred,
       'http://schema.org/CreativeWork' as obj from documents
union all
select {DOC_URL_SQL}, {DOC_URL_SQL} || '#item', 'http://schema.org/name',
       'doc ' || doc_id from documents
union all
select {DOC_URL_SQL}, {DOC_URL_SQL} || '#item',
       'http://schema.org/inLanguage', lang from documents
"""


def _kg_bgp_graph(spark, sf_dir):
    """SPARQL GRAPH: quad patterns (operators/bgp 4-term support) over
    microdata quads whose graph is the extracting page — binds ?g and
    joins within-document."""
    from .operators.bgp import bgp_match
    from .web import microdata_to_triples
    quads = (microdata_to_triples(_kg_pages(spark, sf_dir))
             .select(F.col("table_url").alias("graph"),
                     "subj", "pred", "obj").persist())
    return bgp_match(quads, _BGP_GRAPH_PATTERNS)


# SPARQL VALUES / BIND / EXISTS over the same graphs. The inline table,
# bind expressions, and filter strings are the shared source of truth —
# bgp_match consumes them as DataFrame ops, bgp_sql renders the identical
# strings for DuckDB.
_BGP_VALUES = (["lang", "lang_label"],
               [("en", "English"), ("fr", "French")])
_BGP_BINDS = [("name_len", "length(name)"),
              ("name_band",
               "case when name_len > 12 then 'long' else 'short' end")]
_BGP_BIND_FILTERS = ["name_len > 3"]


def _kg_bgp_values(spark, sf_dir):
    """SPARQL VALUES (operators/bgp.bgp_match values=): the star BGP
    joined with a broadcast inline table that both restricts ?lang to two
    languages and extends each row with a display label."""
    from .operators.bgp import bgp_match
    return bgp_match(_kg_microdata_triples(spark, sf_dir).persist(),
                     _BGP_STAR_PATTERNS, values=_BGP_VALUES)


def _kg_bgp_bind(spark, sf_dir):
    """SPARQL BIND (operators/bgp.bgp_match binds=): two computed
    variables — the second referencing the first, the FILTER referencing
    both engines' identical expression strings."""
    from .operators.bgp import bgp_match
    return bgp_match(_kg_microdata_triples(spark, sf_dir).persist(),
                     _BGP_STAR_PATTERNS, binds=_BGP_BINDS,
                     filters=_BGP_BIND_FILTERS)


def _kg_bgp_exists(spark, sf_dir):
    """SPARQL FILTER EXISTS (operators/bgp.bgp_match exists=): items
    that DO carry the sparse wordCount predicate — one LeftSemi join,
    the dual of kg_bgp_minus over the identical groups."""
    from .operators.bgp import bgp_match
    return bgp_match(_kg_sparse_graph(spark, sf_dir),
                     _BGP_OPTIONAL_REQUIRED,
                     exists=_BGP_OPTIONAL_GROUPS)


# RDFS inference (operators/inference.py): the microdata graph plus a
# small CSVW-ish vocabulary — name is a subproperty of rdfs:label,
# CreativeWork a subclass of Thing, inLanguage domain'd — and the ρdf
# rules materialize the entailed triples. The schema triples are the
# shared source of truth (one python list renders both engines' input).
_RDFS_SCHEMA_TRIPLES = [
    ("http://schema.org/name", "http://www.w3.org/2000/01/rdf-schema#subPropertyOf",
     "http://www.w3.org/2000/01/rdf-schema#label"),
    ("http://schema.org/CreativeWork", "http://www.w3.org/2000/01/rdf-schema#subClassOf",
     "http://schema.org/Thing"),
    ("http://schema.org/Thing", "http://www.w3.org/2000/01/rdf-schema#subClassOf",
     "http://www.w3.org/2000/01/rdf-schema#Resource"),
    ("http://schema.org/inLanguage", "http://www.w3.org/2000/01/rdf-schema#domain",
     "http://schema.org/CreativeWork"),
    ("http://schema.org/inLanguage", "http://www.w3.org/2000/01/rdf-schema#range",
     "http://schema.org/Language"),
]

_RDFS_GRAPH_SQL = (
    _KG_MICRODATA_TRIPLES_SQL
    + " union all select * from (values "
    + ", ".join("('%s', '%s', '%s')" % t for t in _RDFS_SCHEMA_TRIPLES)
    + ") rdfs_schema(subj, pred, obj)")


def _kg_rdfs_derived(spark, sf_dir):
    """RDFS ρdf materialization (operators/inference.rdfs_materialize):
    schema collected driver-side (vocabulary-sized), instance entailment
    as broadcast joins only — derived triples, deduplicated, minus the
    asserted input. Oracle: inference.rdfs_sql recursive CTEs."""
    from .operators.inference import rdfs_materialize
    schema_df = spark.createDataFrame(
        _RDFS_SCHEMA_TRIPLES, ["subj", "pred", "obj"])
    g = (_kg_microdata_triples(spark, sf_dir).select("subj", "pred", "obj")
         .unionByName(schema_df).persist())
    return rdfs_materialize(g)


# zero-or-more / zero-or-one showcases (SPARQL 1.1 ZeroOrMorePath /
# ZeroOrOnePath): 'parent*/hasLang' = the language of self-OR-any-ancestor
# (the zero-length leg pairs every graph term with itself, so docs with no
# parent still reach their own hasLang edge); 'parent?/hasLang' = self or
# one hop up only.
_PATH_STAR_EXPR = "parent*/hasLang"
_PATH_OPT_EXPR = "parent?/hasLang"


def _graph_path_star(spark, sf_dir):
    """Zero-or-more property path (operators/paths Star): identity over
    all graph terms ∪ 'parent+' closure, then one hop over hasLang —
    same AST emits the recursive-CTE DuckDB oracle."""
    from .operators.paths import path_match
    return path_match(_tree_lang_graph(spark, sf_dir), _PATH_STAR_EXPR)


def _graph_path_opt(spark, sf_dir):
    """Zero-or-one property path (operators/paths Opt): duplicate-free
    identity ∪ single 'parent' hop, then hasLang."""
    from .operators.paths import path_match
    return path_match(_tree_lang_graph(spark, sf_dir), _PATH_OPT_EXPR)


# owl:sameAs tier (operators/owl.py): every document item gets a
# stable-ID alias, and every third doc an additional mirror alias — the
# chains a–b and b–c assert no a–c edge, so canonicalization exercises
# transitivity through the connected-components mapping (never a
# materialized quadratic closure). Canon = lexical min of the class
# ('http://id…' < 'http://m…' < 'http://pages…').
_OWL_ITEM_IRI_SQL = DOC_URL_SQL + " || '#item'"
_OWL_ID_IRI_SQL = "'http://id.example.org/doc/' || doc_id"
_OWL_MIRROR_IRI_SQL = "'http://m.example.org/doc/' || doc_id"
_OWL_SAMEAS_GRAPH_SQL = f"""
{_KG_MICRODATA_TRIPLES_SQL}
union all
select {_OWL_ITEM_IRI_SQL} as subj,
       'http://www.w3.org/2002/07/owl#sameAs' as pred,
       {_OWL_ID_IRI_SQL} as obj from documents
union all
select {_OWL_ID_IRI_SQL} as subj,
       'http://www.w3.org/2002/07/owl#sameAs' as pred,
       {_OWL_MIRROR_IRI_SQL} as obj from documents where doc_id % 3 = 0
"""


def _owl_sameas_graph(spark, sf_dir):
    from .operators.owl import OWL_SAMEAS
    docs = _t(spark, sf_dir, "documents")
    prefix = "http://pages.example.org/doc/"
    item = F.concat(F.lit(prefix), F.col("doc_id"), F.lit("#item"))
    idi = F.concat(F.lit("http://id.example.org/doc/"), F.col("doc_id"))
    mir = F.concat(F.lit("http://m.example.org/doc/"), F.col("doc_id"))
    links1 = docs.select(item.alias("subj"),
                         F.lit(OWL_SAMEAS).alias("pred"), idi.alias("obj"))
    links2 = (docs.filter(F.col("doc_id") % 3 == 0)
              .select(idi.alias("subj"), F.lit(OWL_SAMEAS).alias("pred"),
                      mir.alias("obj")))
    return (_kg_microdata_triples(spark, sf_dir)
            .unionByName(links1).unionByName(links2).persist())


def _kg_sameas_mapping(spark, sf_dir):
    """owl:sameAs equivalence classes as a (term, canon) mapping —
    connected components over the symmetric edge set (operators/owl
    .sameas_mapping), the WebPIE canonical-representative design; oracle
    = recursive-CTE reachability + min(reachable)."""
    from .operators.owl import sameas_mapping
    return sameas_mapping(_owl_sameas_graph(spark, sf_dir))


def _kg_sameas_canonical(spark, sf_dir):
    """Graph canonicalized under owl:sameAs: subj/obj rewritten to class
    representatives via two broadcast joins, sameAs statements absorbed,
    duplicates collapsed (operators/owl.sameas_rewrite)."""
    from .operators.owl import sameas_rewrite
    return sameas_rewrite(_owl_sameas_graph(spark, sf_dir))


# pD* property-rule tier: the doc hierarchy plus a small property schema —
# 'parent' is transitive with inverse 'child', odd docs assert a one-way
# 'related' edge whose SymmetricProperty declaration derives the reverse.
_OWL_RULES_SCHEMA_TRIPLES = [
    ("parent", "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
     "http://www.w3.org/2002/07/owl#TransitiveProperty"),
    ("parent", "http://www.w3.org/2002/07/owl#inverseOf", "child"),
    ("related", "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
     "http://www.w3.org/2002/07/owl#SymmetricProperty"),
]

_OWL_RULES_GRAPH_SQL = (
    _TREE_TRIPLES_SQL
    + f" union all select {DOC_URL_SQL} as subj, 'related' as pred, "
    "'http://pages.example.org/doc/' || (doc_id - 1) as obj "
    "from documents where doc_id % 2 = 1"
    + " union all select * from (values "
    + ", ".join("('%s', '%s', '%s')" % t for t in _OWL_RULES_SCHEMA_TRIPLES)
    + ") owl_schema(subj, pred, obj)")


def _owl_rules_graph(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    prefix = "http://pages.example.org/doc/"
    edges = _doc_tree_edges(spark, sf_dir)
    tree = edges.select(F.col("src").alias("subj"),
                        F.lit("parent").alias("pred"),
                        F.col("dst").alias("obj"))
    related = (docs.filter(F.col("doc_id") % 2 == 1)
               .select(F.concat(F.lit(prefix), F.col("doc_id")).alias("subj"),
                       F.lit("related").alias("pred"),
                       F.concat(F.lit(prefix),
                                F.col("doc_id") - 1).alias("obj")))
    schema_df = spark.createDataFrame(_OWL_RULES_SCHEMA_TRIPLES,
                                      ["subj", "pred", "obj"])
    return tree.unionByName(related).unionByName(schema_df).persist()


def _kg_owl_derived(spark, sf_dir):
    """pD* one-pass property rules (operators/owl.owl_horst_materialize):
    inverseOf and SymmetricProperty as broadcast joins, TransitiveProperty
    as a per-predicate semi-naive closure — derived triples minus the
    asserted input; oracle = owl.owl_horst_sql (recursive CTE keyed by
    predicate over the same rule-extended edge set)."""
    from .operators.owl import owl_horst_materialize
    return owl_horst_materialize(_owl_rules_graph(spark, sf_dir))


def _graph_sql():
    from .operators.bgp import (bgp_agg_sql, bgp_sql, bgp_subselect_sql,
                                bgp_union_sql, construct_sql)
    from .operators.graph import (closure_sql, describe_sql, hits_sql,
                                  pagerank_sql)
    from .operators.inference import rdfs_sql
    from .operators.owl import (owl_horst_sql, sameas_mapping_sql,
                                sameas_rewrite_sql)
    from .operators.paths import path_sql
    from .sparql import query_sql as sparql_query_sql
    return {
        "kg_sameas_mapping": sameas_mapping_sql(_OWL_SAMEAS_GRAPH_SQL),
        "kg_sameas_canonical": sameas_rewrite_sql(_OWL_SAMEAS_GRAPH_SQL),
        "kg_owl_derived": owl_horst_sql(_OWL_RULES_GRAPH_SQL),
        "kg_bgp_group_concat": bgp_agg_sql(_KG_MICRODATA_TRIPLES_SQL,
                                           _BGP_STAR_PATTERNS,
                                           _BGP_AGG_GROUP, _BGP_GC_AGGS),
        "kg_bgp_subselect": bgp_subselect_sql(_KG_MICRODATA_TRIPLES_SQL,
                                              _BGP_STAR_PATTERNS,
                                              _BGP_SUB_PATTERNS,
                                              _BGP_AGG_GROUP,
                                              _BGP_SUB_AGGS),
        "kg_sparql_select": sparql_query_sql(_KG_MICRODATA_TRIPLES_SQL,
                                             _SPARQL_SELECT_QUERY),
        "kg_sparql_funcs": sparql_query_sql(_KG_MICRODATA_TRIPLES_SQL,
                                            _SPARQL_FUNCS_QUERY),
        "kg_sparql_agg": sparql_query_sql(_KG_MICRODATA_TRIPLES_SQL,
                                          _SPARQL_AGG_QUERY),
        "kg_term_lang": sparql_query_sql(
            _term_triples_sql(), _parse_term(_SPARQL_TERM_LANG_QUERY)),
        "kg_term_datatype": sparql_query_sql(
            _term_triples_sql(), _parse_term(_SPARQL_TERM_DT_QUERY)),
        "kg_term_sameterm": sparql_query_sql(
            _term_triples_sql(), _parse_term(_SPARQL_TERM_SAMETERM_QUERY)),
        "kg_bgp_star": bgp_sql(_KG_MICRODATA_TRIPLES_SQL,
                               _BGP_STAR_PATTERNS),
        "kg_bgp_path": bgp_sql(_KG_BGP_PATH_GRAPH_SQL, _BGP_PATH_PATTERNS),
        "kg_bgp_optional": bgp_sql(_KG_SPARSE_GRAPH_SQL,
                                   _BGP_OPTIONAL_REQUIRED,
                                   optionals=_BGP_OPTIONAL_GROUPS),
        "kg_bgp_filter": bgp_sql(_KG_MICRODATA_TRIPLES_SQL,
                                 _BGP_FILTER_PATTERNS,
                                 filters=_BGP_FILTER_EXPRS),
        "kg_bgp_union": bgp_union_sql(_KG_SPARSE_GRAPH_SQL,
                                      _BGP_UNION_BRANCHES),
        "kg_bgp_minus": bgp_sql(_KG_SPARSE_GRAPH_SQL,
                                _BGP_OPTIONAL_REQUIRED,
                                minus=_BGP_OPTIONAL_GROUPS),
        "kg_bgp_graph": bgp_sql(_KG_MICRODATA_QUADS_SQL,
                                _BGP_GRAPH_PATTERNS),
        "kg_bgp_having": bgp_agg_sql(_KG_MICRODATA_TRIPLES_SQL,
                                     _BGP_STAR_PATTERNS, _BGP_AGG_GROUP,
                                     _BGP_AGG_AGGS,
                                     having=_BGP_AGG_HAVING),
        "kg_bgp_values": bgp_sql(_KG_MICRODATA_TRIPLES_SQL,
                                 _BGP_STAR_PATTERNS, values=_BGP_VALUES),
        "kg_bgp_bind": bgp_sql(_KG_MICRODATA_TRIPLES_SQL,
                               _BGP_STAR_PATTERNS, binds=_BGP_BINDS,
                               filters=_BGP_BIND_FILTERS),
        "kg_bgp_exists": bgp_sql(_KG_SPARSE_GRAPH_SQL,
                                 _BGP_OPTIONAL_REQUIRED,
                                 exists=_BGP_OPTIONAL_GROUPS),
        "graph_pagerank": pagerank_sql(_TREE_EDGES_SQL, n_iter=3,
                                       damping=0.85),
        "graph_hits": hits_sql(_TREE_EDGES_SQL, n_iter=2),
        "graph_closure_ancestors": closure_sql(_TREE_EDGES_SQL),
        "graph_closure_doubling": closure_sql(_TREE_EDGES_SQL),
        "kg_bgp_path_expr": bgp_sql(_TREE_LANG_GRAPH_SQL,
                                    _path_bgp_patterns()),
        "graph_path_expr": path_sql(_TREE_TRIPLES_SQL, _PATH_EXPR),
        "graph_path_star": path_sql(_TREE_LANG_GRAPH_SQL, _PATH_STAR_EXPR),
        "graph_path_opt": path_sql(_TREE_LANG_GRAPH_SQL, _PATH_OPT_EXPR),
        "kg_construct_derived": construct_sql(
            _KG_SPARSE_GRAPH_SQL, _BGP_OPTIONAL_REQUIRED,
            _CONSTRUCT_TEMPLATE, optionals=_BGP_OPTIONAL_GROUPS),
        "kg_rdfs_derived": rdfs_sql(_RDFS_GRAPH_SQL),
        "kg_describe_docs": describe_sql(_DESCRIBE_GRAPH_SQL,
                                         _DESCRIBE_SEEDS_SQL),
        "kg_bgp_agg": (
            "select lang, count(*) as n_docs, min(name) as first_name "
            f"from ({bgp_sql(_KG_MICRODATA_TRIPLES_SQL, _BGP_STAR_PATTERNS)})"
            " group by lang"),
    }


# --- LM perplexity scoring / DSIR importance weights / Bloom decontam ------

_LM_MAX_UNI = 2000
_LM_MAX_BIG = 8000


def _text_perplexity(spark, sf_dir):
    """CCNet-style perplexity scoring (operators/lm, Wenzek et al. 2020):
    fit a Laplace-smoothed word-bigram LM on the English slice (capped
    deterministic top-K count tables so the model always broadcasts),
    then score every document's mean bigram NLL. Per-gram log-probs are
    quantized to integer micro-nats BEFORE summation, so scores are
    exact integers — reproducible across partition orders and engines."""
    from .operators import lm as L
    docs = _t(spark, sf_dir, "documents")
    ref = docs.where(F.col("lang") == "en")
    uni, big = L.fit_bigram_lm(ref, max_unigrams=_LM_MAX_UNI,
                               max_bigrams=_LM_MAX_BIG)
    # collect the capped unigram table ONCE (<= top-K rows by construction)
    # and rebuild it as a local relation: vocab_size and the broadcast side
    # both come from the same single fit job instead of re-running the
    # reference-corpus tokenize/aggregate for count() and again for score
    uni_rows = uni.collect()
    uni = spark.createDataFrame(uni_rows, uni.schema)
    return L.lm_score(docs, uni, big, len(uni_rows))


def _grams_all2_sql(t: str) -> str:
    return _grams_all_sql(t, 2)


_TEXT_PERPLEXITY_SQL = rf"""
with ref as (select text from documents where lang = 'en'),
uni0 as (select w, count(*)::bigint as c1
         from (select unnest({TOKS_SQL}) as w from ref) group by w),
uni as (select w, c1 from (
          select w, c1, row_number() over (order by c1 desc, w) as rk
          from uni0) where rk <= {_LM_MAX_UNI}),
vv as (select count(*)::bigint as v from uni),
big0 as (select g, count(*)::bigint as c12
         from (select unnest({_grams_all2_sql(TOKS_SQL)}) as g from ref)
         group by g),
big as (select g, c12 from (
          select g, c12, row_number() over (order by c12 desc, g) as rk
          from big0) where rk <= {_LM_MAX_BIG}),
dg as (select doc_id, unnest({_grams_all2_sql(TOKS_SQL)}) as g
       from documents),
scored as (select doc_id,
    -(round(ln(((coalesce(c12, 0) + 1)::double)
               / ((coalesce(c1, 0) + (select v from vv))::double))
            * 1000000, 0)::bigint) as nll
  from dg
  left join big using (g)
  left join uni on split_part(dg.g, ' ', 1) = uni.w)
select doc_id, count(*)::bigint as n_bigrams, sum(nll)::bigint as nll_micro,
       (sum(nll) // count(*))::bigint as avg_nll_micro
from scored group by doc_id
"""


_DSIR_BUCKETS = 1024
_DSIR_N = 120


def _sample_importance(spark, sf_dir):
    """DSIR importance resampling (operators/lm, Xie et al. 2023): hashed
    unigram feature distributions for the English target slice vs the
    whole corpus (Laplace-smoothed over a fixed bucket count), per-doc
    log importance weight in exact micro-nats, top-N selection via
    orderBy().limit() (TakeOrderedAndProject — never a full sort)."""
    from .operators import lm as L
    docs = _t(spark, sf_dir, "documents")
    target = docs.where(F.col("lang") == "en")
    td = L.fit_feature_dist(target, _DSIR_BUCKETS)
    rd = L.fit_feature_dist(docs, _DSIR_BUCKETS)
    # collect each distribution ONCE (<= n_buckets rows) — the totals and
    # the broadcast sides share one fit job per distribution instead of
    # re-tokenizing the corpus for the sum() and again for the weights
    td_rows, rd_rows = td.collect(), rd.collect()
    tt = sum(r["c"] for r in td_rows)  # model constants (driver)
    rt = sum(r["c"] for r in rd_rows)
    td = spark.createDataFrame(td_rows, td.schema)
    rd = spark.createDataFrame(rd_rows, rd.schema)
    return L.importance_sample(docs, td, rd, tt, rt, _DSIR_N,
                               _DSIR_BUCKETS)


_DSIR_BUCKET_SQL = f"({_hash_u32_sql('w')} % {_DSIR_BUCKETS})"

_SAMPLE_IMPORTANCE_SQL = rf"""
with tok as (select doc_id, lang, unnest({TOKS_SQL}) as w from documents),
b as (select doc_id, lang, {_DSIR_BUCKET_SQL} as bucket from tok),
tgt as (select bucket, count(*)::bigint as ct from b where lang = 'en'
        group by bucket),
raw as (select bucket, count(*)::bigint as cr from b group by bucket),
tt as (select count(*)::bigint as t from b where lang = 'en'),
rt as (select count(*)::bigint as t from b),
scored as (select doc_id,
    round((ln(((coalesce(ct, 0) + 1)::double)
              / (((select t from tt) + {_DSIR_BUCKETS})::double))
         - ln(((coalesce(cr, 0) + 1)::double)
              / (((select t from rt) + {_DSIR_BUCKETS})::double)))
          * 1000000, 0)::bigint as lw
  from b left join tgt using (bucket) left join raw using (bucket)),
agg as (select doc_id, count(*)::bigint as n_toks,
               sum(lw)::bigint as logw_micro
        from scored group by doc_id)
select doc_id, n_toks, logw_micro from agg
order by logw_micro desc, doc_id limit {_DSIR_N}
"""


_BLOOM_M = 1 << 20


def _text_decontaminate_bloom(spark, sf_dir):
    """Bloom-filter decontamination (operators/curate
    .flag_contamination_bloom): the memory-bounded variant — the filter
    is the SET-BIT POSITIONS of k=2 salted md5 hashes mod m over the
    benchmark shingles (broadcast bounded by filter geometry, never data
    size); a doc shingle hits iff all k positions are set. Zero false
    negatives; deterministic, so the oracle replays the filter exactly."""
    from .operators import curate as C
    docs = _t(spark, sf_dir, "documents")
    bench = docs.where(F.col("doc_id") % 97 == 0).select("text")
    return C.flag_contamination_bloom(docs, bench, n=3, m=_BLOOM_M, k=2)


def _bloom_h_sql(salt: int) -> str:
    return f"({_hash_u32_sql(repr(str(salt) + '#') + ' || gram')} % {_BLOOM_M})"


_G3 = _grams_sql(TOKS_SQL, 3)

_TEXT_DECONTAMINATE_BLOOM_SQL = f"""
with g as (select doc_id, {_G3} as grams from documents),
bench as (select distinct unnest(grams) as gram from g
          where doc_id % 97 = 0),
bits0 as (select distinct {_bloom_h_sql(0)} as h from bench),
bits1 as (select distinct {_bloom_h_sql(1)} as h from bench),
dg as (select doc_id, unnest(grams) as gram from g),
hits as (select doc_id, count(*)::bigint as n_overlap from dg
         where {_bloom_h_sql(0)} in (select h from bits0)
           and {_bloom_h_sql(1)} in (select h from bits1)
         group by doc_id),
all_docs as (select doc_id from g)
select all_docs.doc_id, coalesce(hits.n_overlap, 0)::bigint as n_overlap,
       coalesce(hits.n_overlap, 0) > 0 as contaminated
from all_docs left join hits using (doc_id)
"""


# --- webgraph analytics: triangles + co-citation similarity -----------------

# parent ∪ grandparent edges: every depth-≥2 doc closes a triangle with its
# parent and grandparent, and sibling/cousin pairs share 2/1 out-neighbors —
# a deterministic fixture graph with real triangle and Jaccard structure
_TWO_LEVEL_EDGES_SQL = (
    f"select {DOC_URL_SQL} as src, "
    "'http://pages.example.org/doc/' || (doc_id // 2) as dst "
    "from documents where doc_id > 0 "
    "union all "
    f"select {DOC_URL_SQL} as src, "
    "'http://pages.example.org/doc/' || (doc_id // 4) as dst "
    "from documents where doc_id > 0")


def _doc_two_level_edges(spark, sf_dir):
    prefix = "http://pages.example.org/doc/"
    d = (_t(spark, sf_dir, "documents")
         .filter(F.col("doc_id") > 0)
         .select(F.concat(F.lit(prefix), F.col("doc_id")).alias("src"),
                 F.concat(F.lit(prefix),
                          F.expr("doc_id div 2")).alias("p"),
                 F.concat(F.lit(prefix),
                          F.expr("doc_id div 4")).alias("g")))
    return (d.select("src", F.col("p").alias("dst"))
            .unionByName(d.select("src", F.col("g").alias("dst"))))


def _graph_triangles(spark, sf_dir):
    """Per-node triangle counts over the two-level doc graph
    (operators/graph.triangle_counts) — degree-oriented wedge join, the
    O(sqrt(m))-fan-out formulation that survives power-law web graphs;
    oracle = orientation-free lexicographic x<y<z enumeration (identical
    per-triangle membership)."""
    from .operators.graph import triangle_counts
    return triangle_counts(_doc_two_level_edges(spark, sf_dir))


def _graph_kcore(spark, sf_dir):
    """3-round 3-core peel over the two-level doc graph
    (operators/graph.kcore_peel) — web-graph core extraction; oracle =
    the same peel unrolled as degree/keep/filter CTE triples
    (graph.kcore_sql, one loop generates both)."""
    from .operators.graph import kcore_peel
    return kcore_peel(_doc_two_level_edges(spark, sf_dir), k=3, n_rounds=3)


def _kg_related_pages(spark, sf_dir):
    """Co-citation related-page pairs: out-neighborhood Jaccard over the
    two-level doc graph (operators/graph.neighbor_jaccard) — candidates
    from a shared-target self-join (never all-pairs), integer-division
    Jaccard so both engines agree bit-exactly."""
    from .operators.graph import neighbor_jaccard
    return neighbor_jaccard(_doc_two_level_edges(spark, sf_dir))


# --- CCNet perplexity bucketing + linear quality classifier -----------------

def _corpus_ppl_buckets(spark, sf_dir):
    """CCNet head/middle/tail tiers (operators/lm.ppl_buckets): per-language
    NTILE(3) over the exact integer LM scores from text_perplexity, doc_id
    tie-break — the corpus-routing decision CCNet feeds its kept/dropped
    split from."""
    from .operators import lm as L
    scored = _text_perplexity(spark, sf_dir)
    docs = _t(spark, sf_dir, "documents")
    return L.ppl_buckets(scored, docs)


_CORPUS_PPL_BUCKETS_SQL = f"""
with scored as (select * from ({_TEXT_PERPLEXITY_SQL})),
j as (
  select s.doc_id, d.lang, s.avg_nll_micro,
         ntile(3) over (partition by d.lang
                        order by s.avg_nll_micro, s.doc_id) as tile
  from scored s join documents d using (doc_id))
select doc_id, lang, avg_nll_micro,
       case when tile = 3 then 'tail'
            when tile = 2 then 'middle'
            else 'head' end as bucket
from j
"""


def _text_quality_classifier(spark, sf_dir):
    """fastText/CCNet-style model-based quality gate
    (operators/text.classifier_margin): linear margin over exact ratio
    features with fixed public weights, keep ⇔ margin > 0. The margin is
    deliberately linear (not sigmoid) so the score is a fixed left-to-right
    chain of IEEE ops both engines evaluate bit-identically."""
    docs = _t(spark, sf_dir, "documents")
    return (docs.select("doc_id",
                        T.classifier_margin(F.col("text")).alias("margin"))
            .withColumn("keep", F.col("margin") > 0))


def _graph_communities(spark, sf_dir):
    """Deterministic synchronous label-propagation communities over the
    two-level doc graph (operators/graph.label_propagation) — min-label
    tie-break makes the fixed 2-iteration result exactly replayable as
    unrolled SQL CTEs."""
    from .operators.graph import label_propagation
    return label_propagation(_doc_two_level_edges(spark, sf_dir))


def _webgraph_sql() -> dict[str, str]:
    from .operators.graph import (kcore_sql, label_propagation_sql,
                                  neighbor_jaccard_sql, triangles_sql)
    return {
        "graph_triangles": triangles_sql(_TWO_LEVEL_EDGES_SQL),
        "kg_related_pages": neighbor_jaccard_sql(_TWO_LEVEL_EDGES_SQL),
        "graph_communities": label_propagation_sql(_TWO_LEVEL_EDGES_SQL),
        "graph_kcore": kcore_sql(_TWO_LEVEL_EDGES_SQL, k=3, n_rounds=3),
    }


_TEXT_QUALITY_CLASSIFIER_SQL = f"""
with m as (
  select doc_id,
         round(-1.25
               + (len(list_filter({TOKS_SQL}, x -> x in ({STOPS_SQL})))
                  / len({TOKS_SQL})) * 2.0
               + least(len({TOKS_SQL}) / 50.0, 1.0) * 1.5
               + (case when length(text) = 0 then 0.0
                  else length(regexp_replace(text, '{PUNCT_CLASS}', '', 'g'))
                       / length(text) end) * -3.0
               + least(list_sum(list_transform({TOKS_SQL},
                                               t -> length(t)))
                       / len({TOKS_SQL}) / 8.0, 1.0) * 0.5,
               6) as margin
  from documents)
select doc_id, margin, margin > 0 as keep from m
"""


# --- domain-blocklist curation stage -----------------------------------------

_BLOCKED_DOMAINS = ("src1.example.org", "src3.example.org", "src7.example.org")


def _curate_blocklist(spark, sf_dir):
    """UT1-style domain-blocklist filtering (operators/urls
    .filter_blocked_domains): docs get deterministic pseudo-hosts (every
    third doc a www. subdomain, so the suffix-chain expansion is really
    exercised), three sources are blocked, kept rows pass through. The
    suffix explode + broadcast equi-join + anti-join shape is the one that
    scales — subdomain containment as exact equality, never a LIKE join."""
    from .operators.urls import filter_blocked_domains
    docs = _t(spark, sf_dir, "documents")
    pages = docs.select(
        "doc_id", "source",
        F.concat(F.lit("http://"),
                 F.when(F.col("doc_id") % 3 == 0, F.lit("www."))
                 .otherwise(F.lit("")),
                 F.col("source"), F.lit(".example.org/doc/"),
                 F.col("doc_id")).alias("url"))
    blocklist = spark.createDataFrame([(d,) for d in _BLOCKED_DOMAINS],
                                      "domain string")
    return filter_blocked_domains(pages, blocklist, key="doc_id")


_CURATE_BLOCKLIST_SQL = f"""
with pages as (
  select doc_id, source,
         'http://' || (case when doc_id % 3 = 0 then 'www.' else '' end)
         || source || '.example.org/doc/' || doc_id as url,
         (case when doc_id % 3 = 0 then 'www.' else '' end)
         || source || '.example.org' as host
  from documents),
b as (select unnest({list(_BLOCKED_DOMAINS)!r}) as domain)
select doc_id, source, url from pages p
where not exists (
  select 1 from b
  where p.host = b.domain or p.host like '%.' || b.domain)
"""


def _webtables_type_profile(spark, sf_dir):
    """WebTables-style distributed datatype intuition over extracted HTML
    table columns (operators/webtables): every cell votes for the lexical
    types it satisfies, one map-side-combined groupBy aggregates the votes
    per column, and the most specific type covering ALL non-blank cells
    wins.  Generalizes the reference's metadata.rb type intuition (which
    only classifies metadata JSON keys) to data-driven column typing —
    the fixture's 4 columns profile as integer/string/string/integer.
    The oracle recomputes the votes relationally with the same anchored
    regexes (Java regex == RE2 on these patterns)."""
    from .operators.webtables import explode_cells, intuit_column_types
    from .sources.html_extract import pages_to_virtual_rows
    cells = explode_cells(pages_to_virtual_rows(_kg_pages(spark, sf_dir)))
    return (intuit_column_types(cells)
            .withColumn("col_idx", F.col("col_idx").cast("int"))
            .orderBy("col_idx"))


# the same vote → lattice pick, relationally: one cell row per
# (document, column), votes as filtered counts, most-specific covering
# type by CASE precedence.  Blank cells are typeless (vote for nothing).
_WEBTABLES_CELLS_SQL = f"""
cells as (
  select {DOC_URL_SQL} as url, cast(0 as integer) as col_idx,
         cast(doc_id as varchar) as cell from documents
  union all
  select {DOC_URL_SQL}, cast(1 as integer), lang from documents
  union all
  select {DOC_URL_SQL}, cast(2 as integer), source from documents
  union all
  select {DOC_URL_SQL}, cast(3 as integer),
         cast(n_chars as varchar) from documents
),
votes as (
  select col_idx,
         cast(count(*) as bigint) as n_cells,
         cast(sum(case when cell is null or trim(cell) = ''
                       then 1 else 0 end) as bigint) as n_blank,
         cast(sum(case when lower(trim(cell)) in ('true', 'false')
                       then 1 else 0 end) as bigint) as n_bool,
         cast(sum(case when regexp_matches(trim(cell), '^[+-]?[0-9]+$')
                       then 1 else 0 end) as bigint) as n_int,
         cast(sum(case when regexp_matches(trim(cell),
                           '^[+-]?[0-9]+$')
                         or regexp_matches(trim(cell),
                           '^[+-]?([0-9]+\\.[0-9]*|\\.[0-9]+)$')
                       then 1 else 0 end) as bigint) as n_dec,
         cast(sum(case when regexp_matches(trim(cell), '^[+-]?[0-9]+$')
                         or regexp_matches(trim(cell),
                           '^[+-]?([0-9]+\\.[0-9]*|\\.[0-9]+)$')
                         or regexp_matches(trim(cell),
                           '^[+-]?([0-9]+(\\.[0-9]*)?|\\.[0-9]+)[eE][+-]?[0-9]+$')
                       then 1 else 0 end) as bigint) as n_dbl,
         cast(sum(case when regexp_matches(trim(cell),
                           '^[0-9]{{4}}-[0-9]{{2}}-[0-9]{{2}}$')
                       then 1 else 0 end) as bigint) as n_date,
         cast(sum(case when regexp_matches(trim(cell),
                           '^[0-9]{{4}}-[0-9]{{2}}-[0-9]{{2}}[T ][0-9]{{2}}:[0-9]{{2}}:[0-9]{{2}}(\\.[0-9]+)?$')
                       then 1 else 0 end) as bigint) as n_datetime
  from cells
  group by col_idx
),
profile as (
  select col_idx, n_cells, n_blank,
         case when n_cells - n_blank > 0 and n_bool >= n_cells - n_blank
                then 'boolean'
              when n_cells - n_blank > 0 and n_int >= n_cells - n_blank
                then 'integer'
              when n_cells - n_blank > 0 and n_dec >= n_cells - n_blank
                then 'decimal'
              when n_cells - n_blank > 0 and n_dbl >= n_cells - n_blank
                then 'double'
              when n_cells - n_blank > 0 and n_date >= n_cells - n_blank
                then 'date'
              when n_cells - n_blank > 0 and n_datetime >= n_cells - n_blank
                then 'dateTime'
              else 'string' end as datatype
  from votes
)"""

_WEBTABLES_TYPE_PROFILE_SQL = f"""
with {_WEBTABLES_CELLS_SQL}
select col_idx, n_cells, n_blank, datatype,
       'http://www.w3.org/2001/XMLSchema#' || datatype as datatype_iri
from profile
"""


def _webtables_typed_triples(spark, sf_dir):
    """End-to-end typed triple emission from untyped web tables: intuit the
    per-column profile (tiny), broadcast it back onto the cell stream, and
    emit (url#row-N, url#col-I, value, xsd-type) triples — the payload never
    shuffles; the only exchange is the profile aggregation.  This is the
    no-metadata fallback of the CSVW kernel (reference always has metadata;
    the open web mostly doesn't)."""
    from .operators.webtables import (apply_column_types, explode_cells,
                                      intuit_column_types, typed_cell_triples)
    from .sources.html_extract import pages_to_virtual_rows
    cells = explode_cells(
        pages_to_virtual_rows(_kg_pages(spark, sf_dir))).persist()
    profile = intuit_column_types(cells)
    typed = apply_column_types(cells, profile)
    return (typed_cell_triples(typed)
            .select("subj", "pred", "obj",
                    F.col("obj_datatype").alias("dt")))


_WEBTABLES_TYPED_TRIPLES_SQL = f"""
with {_WEBTABLES_CELLS_SQL}
select url || '#row-1' as subj,
       url || '#col-' || col_idx as pred,
       trim(cell) as obj,
       'http://www.w3.org/2001/XMLSchema#' || p.datatype as dt
from cells c join profile p using (col_idx)
where not (c.cell is null or trim(c.cell) = '')
"""


def _webtables_header_triples(spark, sf_dir):
    """Same pipeline with header-derived predicates: ONE extraction pass
    (header_rows=0), the header row (source_num=1) becomes the
    (table_index, col_idx) → name map, data rows join it broadcast — so
    predicates are url#col-doc_id / #col-lang / ... instead of ordinals."""
    from .operators.webtables import (apply_column_types, explode_cells,
                                      intuit_column_types, typed_cell_triples)
    from .sources.html_extract import pages_to_virtual_rows
    all_rows = pages_to_virtual_rows(_kg_pages(spark, sf_dir), header_rows=0)
    all_cells = explode_cells(all_rows).persist()
    headers = (all_cells.filter(F.col("source_num") == 1)
               .select("table_index", "col_idx",
                       F.trim("cell").alias("name")).distinct())
    data = (all_cells.filter(F.col("source_num") > 1)
            .withColumn("row_num", F.col("source_num") - 1))
    profile = intuit_column_types(data)
    typed = apply_column_types(data, profile)
    return (typed_cell_triples(typed, headers=headers)
            .select("subj", "pred", "obj",
                    F.col("obj_datatype").alias("dt")))


def _webtables_subject_column(spark, sf_dir):
    """WebTables subject-column detection (Cafarella et al.): among the
    string-typed columns, the entity key is the one with the highest value
    uniqueness, ties leftmost — the fixture's source column (20 distinct)
    beats lang (5 distinct).  Both the type profile and the distinct counts
    aggregate map-side; the pick is a row_number over a driver-small frame.
    The oracle re-derives the whole pick relationally."""
    from .operators.webtables import (column_stats, explode_cells,
                                      pick_subject_column)
    from .sources.html_extract import pages_to_virtual_rows
    cells = explode_cells(pages_to_virtual_rows(_kg_pages(spark, sf_dir)))
    return (pick_subject_column(column_stats(cells))
            .withColumn("subject_col_idx",
                        F.col("subject_col_idx").cast("int")))


_WEBTABLES_STATS_SQL = f"""
{_WEBTABLES_CELLS_SQL},
dist as (
  select col_idx, cast(count(distinct trim(cell)) as bigint) as n_distinct
  from cells
  where not (cell is null or trim(cell) = '')
  group by col_idx
),
stats as (
  select p.col_idx, p.datatype, d.n_distinct,
         case when p.n_cells - p.n_blank > 0
              then cast(d.n_distinct as double)
                   / cast(p.n_cells - p.n_blank as double)
              else 0.0 end as uniqueness
  from profile p join dist d using (col_idx)
),
pick as (
  select col_idx, n_distinct, uniqueness from stats
  where datatype = 'string'
  order by uniqueness desc, col_idx asc
  limit 1
)"""

_WEBTABLES_SUBJECT_COLUMN_SQL = f"""
with {_WEBTABLES_STATS_SQL}
select col_idx as subject_col_idx, n_distinct, uniqueness from pick
"""


def _webtables_entity_triples(spark, sf_dir):
    """Entity-centric triple emission: the subject-column VALUE keys the
    subject IRI (url#e-md5(value)) so re-crawls of the same entity converge
    on one node.  The pick broadcasts onto the UNEXPLODED virtual rows and
    the subject value is read with element_at before the cell explode —
    narrow generator stage, payload never shuffles."""
    from .operators.webtables import (column_stats, entity_triples,
                                      explode_cells, pick_subject_column)
    from .sources.html_extract import pages_to_virtual_rows
    vrows = pages_to_virtual_rows(_kg_pages(spark, sf_dir)).persist()
    pick = pick_subject_column(column_stats(explode_cells(vrows)))
    return entity_triples(vrows, pick) \
        .select("subj", "pred", "obj", "subject_value")


_WEBTABLES_ENTITY_TRIPLES_SQL = f"""
with {_WEBTABLES_STATS_SQL},
sv as (
  select url, trim(cell) as subject_value
  from cells join pick using (col_idx)
  where not (cell is null or trim(cell) = '')
)
select sv.url || '#e-' || md5(sv.subject_value) as subj,
       sv.url || '#col-' || c.col_idx as pred,
       trim(c.cell) as obj,
       sv.subject_value
from cells c
join sv on c.url = sv.url
join pick p on c.col_idx <> p.col_idx
where not (c.cell is null or trim(c.cell) = '')
"""


_WEBTABLES_HEADER_TRIPLES_SQL = f"""
with {_WEBTABLES_CELLS_SQL},
hdr as (
  select cast(0 as integer) as col_idx, 'doc_id' as name
  union all select 1, 'lang'
  union all select 2, 'source'
  union all select 3, 'n_chars'
)
select url || '#row-1' as subj,
       url || '#col-' || h.name as pred,
       trim(cell) as obj,
       'http://www.w3.org/2001/XMLSchema#' || p.datatype as dt
from cells c join profile p using (col_idx) join hdr h using (col_idx)
where not (c.cell is null or trim(c.cell) = '')
"""


def _webtables_schema_freq(spark, sf_dir):
    """WebTables schema frequency: fingerprint each extracted table's header
    row (md5 over unit-separated names) and count stitchable tables per
    fingerprint — ONE map-side-combined groupBy on a low-cardinality key.
    The fixture's pages share one template, so the corpus collapses to a
    single (fingerprint, n_docs) row the oracle predicts exactly."""
    from .operators.webtables import schema_frequency, table_schema_fingerprints
    from .sources.html_extract import pages_to_virtual_rows
    fps = table_schema_fingerprints(
        pages_to_virtual_rows(_kg_pages(spark, sf_dir), header_rows=0))
    return schema_frequency(fps)


_WEBTABLES_SCHEMA_FREQ_SQL = """
select md5('doc_id' || chr(31) || 'lang' || chr(31) || 'source'
           || chr(31) || 'n_chars') as schema_sig,
       'doc_id,lang,source,n_chars' as header_names,
       4 as n_cols,
       cast(count(*) as bigint) as n_tables,
       cast(count(distinct doc_id) as bigint) as n_pages
from documents
"""


def _webtables_pred_induction(spark, sf_dir):
    """KG schema induction over the header-named typed triples: per
    predicate FRAGMENT (col-doc_id / col-lang / ...) across all pages, the
    dominant object datatype and its share — the step that turns emitted
    instance triples back into a vocabulary.  Keyed on the fragment so the
    profile is corpus-wide (4 rows), not per-page."""
    from .operators.webtables import predicate_range_profile
    triples = _webtables_header_triples(spark, sf_dir) \
        .withColumnRenamed("dt", "obj_datatype")
    frag = F.substring_index(F.col("pred"), "#", -1)
    return predicate_range_profile(triples, pred_key=frag)


_WEBTABLES_PRED_INDUCTION_SQL = f"""
with {_WEBTABLES_CELLS_SQL},
hdr as (
  select cast(0 as integer) as col_idx, 'doc_id' as name
  union all select 1, 'lang'
  union all select 2, 'source'
  union all select 3, 'n_chars'
),
typed as (
  select 'col-' || h.name as pred_class,
         'http://www.w3.org/2001/XMLSchema#' || p.datatype as datatype
  from cells c join profile p using (col_idx) join hdr h using (col_idx)
  where not (c.cell is null or trim(c.cell) = '')
),
counts as (
  select pred_class, datatype, cast(count(*) as bigint) as n
  from typed group by pred_class, datatype
),
ranked as (
  select pred_class, datatype, n,
         row_number() over (partition by pred_class
                            order by n desc, datatype asc) as rn,
         cast(sum(n) over (partition by pred_class) as bigint) as n_triples
  from counts
)
select pred_class, n_triples, datatype as dominant_datatype,
       n as dominant_n,
       cast(n as double) / cast(n_triples as double) as dominant_frac
from ranked where rn = 1
"""


def _shacl_shapes():
    from .operators.shacl import NodeShape, PropertyShape
    return [NodeShape(
        shape_id="https://kg.example.org/shapes/CreativeWorkShape",
        target_class="http://schema.org/CreativeWork",
        properties=(
            # every work needs exactly one conforming name — the fixture
            # conforms, so this contributes no rows (negative evidence)
            PropertyShape(path="http://schema.org/name",
                          min_count=1, max_count=1,
                          pattern=r"^doc [0-9]+$"),
            # closed language list — docs in de/zh/es violate
            PropertyShape(path="http://schema.org/inLanguage",
                          in_values=("en", "fr")),
            # headline is absent from the microdata → one minCount
            # violation per focus node
            PropertyShape(path="http://schema.org/headline", min_count=1),
        ))]


def _kg_shacl_report(spark, sf_dir):
    """SHACL-lite validation report over the microdata graph
    (operators/shacl.validate_shapes): per-violation rows for a shapes
    graph exercising cardinality (a missing-path minCount fires per focus),
    closed value lists (langs outside en/fr), and a conforming
    pattern+cardinality property that must contribute NOTHING.  Each
    property shape touches one pred-filtered slice (pushdown-prunable) and
    aggregates on the focus key."""
    from .operators.shacl import validate_shapes
    triples = _kg_microdata_triples(spark, sf_dir).persist()
    return validate_shapes(triples, _shacl_shapes())


_SHACL_SHAPE_ID = "https://kg.example.org/shapes/CreativeWorkShape"

_KG_SHACL_REPORT_SQL = f"""
select {DOC_URL_SQL} || '#item' as focus,
       '{_SHACL_SHAPE_ID}' as shape_id,
       'http://schema.org/inLanguage' as path,
       'in' as constraint,
       lang as actual,
       'en,fr' as expected
from documents where lang not in ('en', 'fr')
union all
select {DOC_URL_SQL} || '#item', '{_SHACL_SHAPE_ID}',
       'http://schema.org/headline', 'minCount', '0', '1'
from documents
"""


def _kg_shacl_summary(spark, sf_dir):
    """Conformance dashboard: violations per (shape, path, constraint) —
    one more map-side groupBy over the report."""
    from .operators.shacl import conformance_summary
    return conformance_summary(_kg_shacl_report(spark, sf_dir))


_KG_SHACL_SUMMARY_SQL = f"""
with r as ({_KG_SHACL_REPORT_SQL})
select shape_id, path, "constraint",
       cast(count(*) as bigint) as n_violations,
       cast(count(distinct focus) as bigint) as n_focus
from r group by shape_id, path, "constraint"
"""


# ---------------------------------------------------------------------------
# incremental (cross-snapshot) near-dedup tier — continuous-ingestion path
# ---------------------------------------------------------------------------

# documents with doc_id % 4 == 0 stand in for the accumulated corpus
# snapshot (normally represented by its STORED band table, see
# operators/dedup.write_band_store); the rest are today's arriving batch.
_INCR_BANDS_CTE = f"""
with g as (select doc_id as id, {_grams_sql(TOKS_SQL)} as g from documents),
sigs as (select id, {_minhash_sig_sql('g')} as sig from g where len(g) > 0),
bands as (
  select id, b.b as band,
         md5(sig[2 * b.b + 1] || ',' || sig[2 * b.b + 2]) as band_key
  from sigs cross join (values (0), (1), (2), (3)) as b(b))
"""


def _dedup_incremental_pairs(spark, sf_dir):
    """Incremental near-dedup candidates: the arriving batch's MinHash bands
    equi-joined against the stored corpus band table — old x old never
    forms, so each batch costs O(batch + touched buckets), never O(corpus)
    (operators/dedup.incremental_md5_pairs)."""
    docs = _t(spark, sf_dir, "documents")
    old_bands = D.minhash_md5_bands(docs.filter("doc_id % 4 = 0"))
    return D.incremental_md5_pairs(docs.filter("doc_id % 4 <> 0"), old_bands)


_DEDUP_INCREMENTAL_PAIRS_SQL = _INCR_BANDS_CTE + """
select distinct n.id as new_id, o.id as old_id
from bands n join bands o on n.band = o.band and n.band_key = o.band_key
where n.id % 4 <> 0 and o.id % 4 = 0
"""


def _dedup_incremental_keep(spark, sf_dir):
    """Incremental near-dedup survivors: new-batch docs with no banded
    collision against the stored corpus and not shadowed by a smaller-id
    candidate inside the batch (operators/dedup.incremental_keep) — two
    thin id anti-joins; the document payload never shuffles."""
    docs = _t(spark, sf_dir, "documents")
    old_bands = D.minhash_md5_bands(docs.filter("doc_id % 4 = 0"))
    return (D.incremental_keep(docs.filter("doc_id % 4 <> 0"), old_bands)
            .select("doc_id", "source", "n_chars"))


_DEDUP_INCREMENTAL_KEEP_SQL = _INCR_BANDS_CTE + """,
hit_old as (
  select distinct n.id from bands n
  join bands o on n.band = o.band and n.band_key = o.band_key
  where n.id % 4 <> 0 and o.id % 4 = 0),
shadowed as (
  select distinct l.id from bands l
  join bands r on l.band = r.band and l.band_key = r.band_key
  where l.id % 4 <> 0 and r.id % 4 <> 0 and l.id > r.id)
select doc_id, source, n_chars from documents
where doc_id % 4 <> 0
  and doc_id not in (select id from hit_old)
  and doc_id not in (select id from shadowed)
"""


# ---------------------------------------------------------------------------
# ANN self-evaluation: recall@k of the LSH multiprobe tier vs brute force
# ---------------------------------------------------------------------------

_RECALL_QUERY_IDS = (0, 1, 2, 3)


def _ann_recall_lsh(spark, sf_dir):
    """Index quality gate (operators/similarity.recall_at_k): per-query
    recall@10 of the hyperplane-LSH multiprobe search against brute-force
    cosine ground truth, over a fixed eval query set. The approximate and
    exact tiers are the SAME constructions the single-query ann_lsh_* /
    ann_cosine_topk rows check; this row checks the metric that justifies
    the approximate tier at all. On the synthetic embeddings the measured
    recall is LOW (~0.1-0.2) and that is the honest answer: i.i.d. random
    vectors are hyperplane-LSH's worst case (no cluster structure, all
    cosines near 0, neighbors split across buckets) — exactly the
    situation this gate exists to catch before a 10^12-vector rollout
    (mitigations: more probes/max_flip, fewer planes, or the IVF tier)."""
    from functools import reduce
    emb = _t(spark, sf_dir, "embeddings")
    approx, exact = [], []
    for qid in _RECALL_QUERY_IDS:
        approx.append(
            S.lsh_bucket_topk(emb, qid, EMB_DIM, k=10, n_planes=8,
                              max_flip=1)
            .select(F.lit(qid).cast("long").alias("query_id"), "vec_id"))
        exact.append(
            S.cosine_topk(emb, qid, k=10, extra_cols=())
            .select(F.lit(qid).cast("long").alias("query_id"), "vec_id"))
    return S.recall_at_k(reduce(lambda x, y: x.unionByName(y), approx),
                         reduce(lambda x, y: x.unionByName(y), exact))


def _recall_side_sql(qid: int, probe: bool) -> str:
    cond = (f"bit_count(xor(s.sig, q.qsig)) <= 1" if probe
            else "s.vec_id <> -1")  # exact side scans everything
    return (f"select {qid} as query_id, vec_id from ("
            f"select s.vec_id, round({_cos_sql('s.embedding', 'qv')}, 4) "
            f"as sim from s, (select embedding as qv, sig as qsig from s "
            f"where vec_id = {qid}) q "
            f"where s.vec_id <> {qid} and {cond} "
            f"order by sim desc, vec_id limit 10)")


_ANN_RECALL_LSH_SQL = f"""
with s as (select vec_id, embedding,
           {_hyperplane_sig_sql('embedding')} as sig from embeddings),
approx as ({' union all '.join(_recall_side_sql(q, True)
                               for q in _RECALL_QUERY_IDS)}),
exact as ({' union all '.join(_recall_side_sql(q, False)
                              for q in _RECALL_QUERY_IDS)}),
tot as (select query_id, count(*) as n_exact from exact group by query_id),
hits as (
  select a.query_id, count(*) as n_hits
  from approx a join exact e
    on a.query_id = e.query_id and a.vec_id = e.vec_id
  group by a.query_id)
select t.query_id,
       cast(coalesce(h.n_hits, 0) as bigint) as n_hits,
       cast(t.n_exact as bigint) as n_exact,
       round(cast(coalesce(h.n_hits, 0) as double)
             / cast(t.n_exact as double), 4) as recall
from tot t left join hits h on t.query_id = h.query_id
"""


def _recall_tail_sql(with_ctes: list[str], approx_branches: list[str],
                     exact_branches: list[str]) -> str:
    """Shared recall@k aggregation tail over per-qid approx/exact top-k
    branches — one source of truth for the three ann_recall_* oracles."""
    body = (",\n".join(with_ctes) + ",\n") if with_ctes else ""
    return f"""
with {body}
approx as ({' union all '.join(approx_branches)}),
exact as ({' union all '.join(exact_branches)}),
tot as (select query_id, count(*) as n_exact from exact group by query_id),
hits as (
  select a.query_id, count(*) as n_hits
  from approx a join exact e
    on a.query_id = e.query_id and a.vec_id = e.vec_id
  group by a.query_id)
select t.query_id,
       cast(coalesce(h.n_hits, 0) as bigint) as n_hits,
       cast(t.n_exact as bigint) as n_exact,
       round(cast(coalesce(h.n_hits, 0) as double)
             / cast(t.n_exact as double), 4) as recall
from tot t left join hits h on t.query_id = h.query_id
"""


def _exact_recall_branch_sql(qid: int, topk: int = 10) -> str:
    """Brute-force cosine top-k branch for the recall oracles."""
    return (f"select {qid} as query_id, vec_id from ("
            f"select e.vec_id, round({_cos_sql('e.embedding', 'qv')}, 4) "
            f"as sim from embeddings e, (select embedding as qv from "
            f"embeddings where vec_id = {qid}) q "
            f"where e.vec_id <> {qid} "
            f"order by sim desc, vec_id limit {topk})")


_RECALL_IVF_NPROBE = 6


def _ann_recall_ivf(spark, sf_dir):
    """recall@10 of the trained-IVF probe tier (same fit as
    ann_ivf_trained_topk) against brute-force cosine, over the fixed eval
    set. Probe width is the QUALIFIED configuration: on these i.i.d.
    synthetic vectors (hyperplane-LSH's and IVF's worst case — no cluster
    structure) the measured sweep is n_probe 3→~0.60, 5→~0.80, 6→~0.95
    recall, so the tier registers at n_probe=6 of 8 cells and pytest
    gates mean recall ≥ 0.8 (test_similarity). On clustered production
    data the same gate justifies a much smaller probe fraction — run it
    per index build, that is what it is for."""
    from functools import reduce
    emb = _t(spark, sf_dir, "embeddings")
    assigned, centroids = S.ivf_fit_deterministic(emb, k=8, n_iter=2,
                                                  dim=EMB_DIM)
    assigned = assigned.persist()
    qvecs = {r["vec_id"]: [float(x) for x in r["embedding"]]
             for r in emb.filter(
                 F.col("vec_id").isin(list(_RECALL_QUERY_IDS))).collect()}
    approx, exact = [], []
    for qid in _RECALL_QUERY_IDS:
        approx.append(
            S.ivf_search(assigned.filter(F.col("vec_id") != qid), centroids,
                         qvecs[qid], k=10, n_probe=_RECALL_IVF_NPROBE)
            .select(F.lit(qid).cast("long").alias("query_id"), "vec_id"))
        exact.append(
            S.cosine_topk(emb, qid, k=10, extra_cols=())
            .select(F.lit(qid).cast("long").alias("query_id"), "vec_id"))
    return S.recall_at_k(reduce(lambda x, y: x.unionByName(y), approx),
                         reduce(lambda x, y: x.unionByName(y), exact))


def _ivf_recall_sql(qids=_RECALL_QUERY_IDS, k: int = 8, n_iter: int = 2,
                    n_probe: int = _RECALL_IVF_NPROBE, topk: int = 10,
                    dim: int = EMB_DIM) -> str:
    """DuckDB mirror of _ann_recall_ivf: ONE shared fit-CTE replay
    (_ivf_fit_ctes), per-qid probe + pruned top-k branches, recall tail."""
    ctes, prev = _ivf_fit_ctes(k=k, n_iter=n_iter, dim=dim)
    qdist = (f"list_sum(list_transform(range(1, {dim + 1}), d -> "
             f"(q.qv[d]::double - c.cent[d]) * "
             f"(q.qv[d]::double - c.cent[d])))")
    approx_b, exact_b = [], []
    for qid in qids:
        ctes.append(f"q{qid} as (select embedding as qv from embeddings "
                    f"where vec_id = {qid})")
        ctes.append(f"p{qid} as (select c.cell from c{n_iter} c, q{qid} q "
                    f"order by {qdist}, c.cell limit {n_probe})")
        approx_b.append(
            f"select {qid} as query_id, vec_id from ("
            f"select s.vec_id, round({_cos_sql('s.embedding', 'qv')}, 4) "
            f"as sim from {prev} s, q{qid} q where s.vec_id <> {qid} "
            f"and s.cell in (select cell from p{qid}) "
            f"order by sim desc, vec_id limit {topk})")
        exact_b.append(_exact_recall_branch_sql(qid, topk))
    return _recall_tail_sql(ctes, approx_b, exact_b)


_RECALL_PQ_M, _RECALL_PQ_CANDS = 16, 100


def _ann_recall_pq(spark, sf_dir):
    """recall@10 of the PQ→exact-rerank cascade (ann_pq_rerank_topk's
    construction) against brute-force cosine over the fixed eval set,
    pytest-gated ≥ 0.8. The code budget matters and the gate measured it:
    the demo tier's m=4×16-centroid books recall only ~0.33 with 50
    candidates on these i.i.d. unit vectors, while the QUALIFIED
    configuration registered here — m=16 subspaces (4 dims each, 16
    bytes/vector) with 100 rerank candidates — measures ~0.97. The rerank
    cascade at an adequately-sized code budget is the RECOMMENDED
    approximate default; see operators/similarity.py's module docstring
    for tier selection."""
    from functools import reduce

    from .operators.quantize import pq_fit_deterministic, pq_search
    from .operators.similarity import _as_double, cosine_sim
    emb = _t(spark, sf_dir, "embeddings").persist()
    codes, books = pq_fit_deterministic(emb, m=_RECALL_PQ_M, k=_PQ_K,
                                        n_iter=_PQ_ITER, dim=EMB_DIM)
    codes = codes.persist()
    qvecs = {r["vec_id"]: [float(x) for x in r["embedding"]]
             for r in emb.filter(
                 F.col("vec_id").isin(list(_RECALL_QUERY_IDS))).collect()}
    approx, exact = [], []
    for qid in _RECALL_QUERY_IDS:
        qv = qvecs[qid]
        cands = pq_search(codes, books, qv, topk=_RECALL_PQ_CANDS,
                          exclude_id=qid).select("vec_id")
        qlit = F.array(*[F.lit(x) for x in qv])
        rer = (emb.join(F.broadcast(cands), "vec_id")
               .select("vec_id",
                       F.round(cosine_sim(_as_double(F.col("embedding")),
                                          qlit), 4).alias("sim"))
               .orderBy(F.col("sim").desc(), F.col("vec_id")).limit(10))
        approx.append(rer.select(F.lit(qid).cast("long").alias("query_id"),
                                 "vec_id"))
        exact.append(
            S.cosine_topk(emb, qid, k=10, extra_cols=())
            .select(F.lit(qid).cast("long").alias("query_id"), "vec_id"))
    return S.recall_at_k(reduce(lambda x, y: x.unionByName(y), approx),
                         reduce(lambda x, y: x.unionByName(y), exact))


def _pq_recall_sql(qids=_RECALL_QUERY_IDS, topk: int = 10,
                   n_cands: int = _RECALL_PQ_CANDS,
                   m: int = _RECALL_PQ_M) -> str:
    """DuckDB mirror of _ann_recall_pq: each approx branch nests the full
    per-qid PQ-rerank statement (_pq_rerank_sql) as a derived table."""
    approx_b = [
        f"select {qid} as query_id, vec_id from ("
        f"{_pq_rerank_sql(topk=topk, n_cands=n_cands, qid=qid, m=m)})"
        for qid in qids]
    exact_b = [_exact_recall_branch_sql(qid, topk) for qid in qids]
    return _recall_tail_sql([], approx_b, exact_b)


_ANN_RECALL_IVF_SQL = _ivf_recall_sql()
_ANN_RECALL_PQ_SQL = _pq_recall_sql()


def _dedup_embedding_incremental(spark, sf_dir):
    """Incremental embedding near-dup: new batch (vec_id % 4 <> 0) against
    the stored signature table of the accumulated corpus (vec_id % 4 = 0)
    — the vector-space mirror of dedup_incremental_pairs
    (operators/similarity.incremental_embedding_pairs)."""
    emb = _t(spark, sf_dir, "embeddings")
    store = S.embedding_sig_store(emb.filter("vec_id % 4 = 0"), dim=EMB_DIM)
    return S.incremental_embedding_pairs(emb.filter("vec_id % 4 <> 0"),
                                         store, dim=EMB_DIM, threshold=0.3)


_DEDUP_EMBEDDING_INCREMENTAL_SQL = f"""
with s as (select vec_id, embedding,
           {_hyperplane_sig_sql('embedding')} as sig from embeddings)
select n.vec_id as new_id, o.vec_id as old_id,
       round({_cos_sql('n.embedding', 'o.embedding')}, 4) as sim
from s n join s o on n.sig = o.sig
where n.vec_id % 4 <> 0 and o.vec_id % 4 = 0
  and round({_cos_sql('n.embedding', 'o.embedding')}, 4) >= 0.3
"""


def _ann_ivf_batch_topk(spark, sf_dir):
    """Batch trained-IVF probe search
    (operators/similarity.ivf_search_batch): the whole eval query set
    probes its n_probe nearest cells in ONE pruned corpus pass — broadcast
    (query, cell, vector) probe table, per-query window top-k. Oracle
    replays fit + per-query probe + pruned scoring relationally."""
    emb = _t(spark, sf_dir, "embeddings")
    assigned, centroids = S.ivf_fit_deterministic(emb, k=8, n_iter=2,
                                                  dim=EMB_DIM)
    queries = emb.filter(F.col("vec_id").isin(*_RECALL_QUERY_IDS))
    return S.ivf_search_batch(assigned, centroids, queries, k=10, n_probe=3)


def _ivf_batch_sql(k: int = 8, n_iter: int = 2, n_probe: int = 3,
                   topk: int = 10, dim: int = EMB_DIM) -> str:
    """Multi-query generalization of _ivf_trained_sql — same fit CTEs, a
    per-query probe ranking, pruned scoring joined through the probe set."""
    ctes, prev = _ivf_fit_ctes(k=k, n_iter=n_iter, dim=dim)
    qdist = (f"list_sum(list_transform(range(1, {dim + 1}), d -> "
             f"(q.qv[d]::double - c.cent[d]) * "
             f"(q.qv[d]::double - c.cent[d])))")
    body = ",\n".join(ctes)
    ids = ", ".join(map(str, _RECALL_QUERY_IDS))
    return f"""
with {body},
q as (select vec_id as query_id, embedding as qv from embeddings
      where vec_id in ({ids})),
probe as (
  select query_id, cell from (
    select q.query_id, c.cell,
           row_number() over (partition by q.query_id
                              order by {qdist}, c.cell) as rn
    from c{n_iter} c cross join q) where rn <= {n_probe})
select query_id, vec_id, cell, sim, rank from (
  select q.query_id, s.vec_id, s.cell,
         round({_cos_sql('s.embedding', 'q.qv')}, 4) as sim,
         row_number() over (partition by q.query_id
                            order by round({_cos_sql('s.embedding', 'q.qv')},
                                           4) desc, s.vec_id) as rank
  from {prev} s
  join probe p on s.cell = p.cell
  join q on q.query_id = p.query_id
  where s.vec_id <> q.query_id) where rank <= {topk}
"""


def _ann_cosine_batch_topk(spark, sf_dir):
    """Batch ANN (operators/similarity.cosine_topk_batch): top-10 for the
    whole eval query set in ONE corpus scan — broadcast query frame, one
    row_number shuffle keyed on query_id. The single-query ann_cosine_topk
    row checks the TakeOrdered plan; this row checks the batch shape that
    replaces |Q| jobs with one."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id").isin(*_RECALL_QUERY_IDS))
    return S.cosine_topk_batch(emb, queries, k=10)


_ANN_COSINE_BATCH_TOPK_SQL = f"""
with q as (select vec_id as query_id, embedding as qv from embeddings
           where vec_id in ({', '.join(map(str, _RECALL_QUERY_IDS))})),
scored as (
  select q.query_id, e.vec_id,
         round({_cos_sql('e.embedding', 'q.qv')}, 4) as sim
  from embeddings e cross join q where e.vec_id <> q.query_id)
select query_id, vec_id, sim, rank from (
  select query_id, vec_id, sim,
         row_number() over (partition by query_id
                            order by sim desc, vec_id) as rank
  from scored) where rank <= 10
"""


# ---------------------------------------------------------------------------
# fusion / relation-extraction / graph-structure / tokenizer-stats tier
# (round 4 cont.: operators/fusion.py, operators/relations.py, graph.py,
# text.py additions)
# ---------------------------------------------------------------------------

# Three extraction sources assert each document's language; sources 2 and 3
# inject deterministic disagreement (doc_id%7 → a '-alt' variant, doc_id%4 →
# uppercase), so the fixture exercises clean majorities, 2-1 conflicts, and
# the 1-1-1 tie broken by lexical-min (doc_id%28).
_FUSE_PRED = "http://pages.example.org/doc/lang"

_KG_FUSED_TRIPLES_SQL = f"""
with a as (
  select {DOC_URL_SQL} as subj, '{_FUSE_PRED}' as pred, lang as obj
  from documents
  union all
  select {DOC_URL_SQL}, '{_FUSE_PRED}',
         case when doc_id % 7 = 0 then lang || '-alt' else lang end
  from documents
  union all
  select {DOC_URL_SQL}, '{_FUSE_PRED}',
         case when doc_id % 4 = 0 then upper(lang) else lang end
  from documents)
select * from a
"""


def _fusion_assertions(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    subj = F.concat(F.lit("http://pages.example.org/doc/"), F.col("doc_id"))
    pred = F.lit(_FUSE_PRED)
    a1 = d.select(subj.alias("subj"), pred.alias("pred"),
                  F.col("lang").alias("obj"))
    a2 = d.select(subj.alias("subj"), pred.alias("pred"),
                  F.when(F.col("doc_id") % 7 == 0,
                         F.concat(F.col("lang"), F.lit("-alt")))
                  .otherwise(F.col("lang")).alias("obj"))
    a3 = d.select(subj.alias("subj"), pred.alias("pred"),
                  F.when(F.col("doc_id") % 4 == 0, F.upper("lang"))
                  .otherwise(F.col("lang")).alias("obj"))
    return a1.unionByName(a2).unionByName(a3)


def _kg_fused_triples(spark, sf_dir):
    """Truth-discovery fusion (operators/fusion.fuse_majority): majority
    vote per (subj, pred) over three deterministic conflicting extraction
    sources, lexical-min tie-break — the post-canonicalization stage that
    picks the value the graph publishes (Dong et al. VLDB'09).  Two keyed
    payload-free shuffles; conflict cardinality bounds the window fan-in."""
    from .operators.fusion import fuse_majority
    return fuse_majority(_fusion_assertions(spark, sf_dir))


def _kg_reified_triples(spark, sf_dir):
    """RDF reification of the stage-2 statement set
    (operators/fusion.reify_statements): content-addressed ``urn:stmt:``
    anchors + the 4 reification triples each, so provenance annotations
    (source url, confidence, crawl ts) attach as ordinary triples.  One
    distinct exchange, then a narrow 4× inline explode."""
    from .operators.fusion import reify_statements
    return reify_statements(_kg_pages_triples(spark, sf_dir))


# Deterministic Hearst corpus: each document contributes one synthetic
# sentence block built from its own leading tokens (both engines assemble
# the identical string), so the extractor sees real list syntax — comma
# lists, and/or tails, "and other", "including" — with corpus-scale word
# repetition.
def _hearst_text_sql() -> str:
    w = [f"coalesce({TOKS_SQL}[{i + 1}], 'data')" for i in range(5)]
    return (f"'Engines such as ' || {w[0]} || ', ' || {w[1]} || ' and ' || "
            f"{w[2]} || ' scale. ' || {w[3]} || ' and other operators help. '"
            f" || 'pipelines, including ' || {w[4]} || ', run'")


_KG_HEARST_DOCS_SQL = (f"select doc_id, {_hearst_text_sql()} as text "
                       "from documents")


def _hearst_docs(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    w = [F.coalesce(F.get(toks, i), F.lit("data")) for i in range(5)]
    text = F.concat(
        F.lit("Engines such as "), w[0], F.lit(", "), w[1], F.lit(" and "),
        w[2], F.lit(" scale. "), w[3], F.lit(" and other operators help. "),
        F.lit("pipelines, including "), w[4], F.lit(", run"))
    return d.select("doc_id", text.alias("text"))


def _kg_hearst_pairs(spark, sf_dir):
    """Open-world relation extraction (operators/relations.hearst_pair_
    counts): Hearst-pattern hyponym/hypernym pairs with mention/document
    support over a deterministic per-doc sentence corpus — the
    taxonomy-induction bootstrap (Hearst '92, WebIsA over Common Crawl).
    Pure JVM regexp per row; the only shuffle keys on the extracted-pair
    vocabulary."""
    from .operators.relations import hearst_pair_counts
    return hearst_pair_counts(_hearst_docs(spark, sf_dir))


def _graph_clustering_coeff(spark, sf_dir):
    """Local clustering coefficient over the two-level doc graph
    (operators/graph.clustering_coeff) — template-farm/link-ring detection:
    exact-integer triangle and degree counts, one rounded division per
    node."""
    from .operators.graph import clustering_coeff
    return clustering_coeff(_doc_two_level_edges(spark, sf_dir))


def _graph_assortativity(spark, sf_dir):
    """Degree assortativity (Newman 2002) of the two-level doc graph
    (operators/graph.degree_assortativity): integer sum-form Pearson over
    symmetrized endpoint degrees — one map-side-combined aggregate to a
    single row."""
    from .operators.graph import degree_assortativity
    return degree_assortativity(_doc_two_level_edges(spark, sf_dir))


def _text_bpe_pairs(spark, sf_dir):
    """First-round BPE merge statistics (operators/text.bpe_pair_counts):
    corpus-weighted adjacent character-pair counts with the ``_``
    end-of-word marker, computed on the word VOCABULARY (vocab-not-rows
    discipline) — the argmax row is the tokenizer's first merge."""
    from .operators.text import bpe_pair_counts
    return bpe_pair_counts(_t(spark, sf_dir, "documents"))


def _text_readability(spark, sf_dir):
    """Flesch reading-ease per document (operators/text.readability_*):
    exact integer word/sentence/syllable counts + one rounded formula,
    all regexp_count codegen — another column for the fused curation
    decision.  Sentence breaks come from a deterministic ' the ' → '. '
    rewrite so the fixture actually has sentences."""
    from .operators.text import (flesch_reading_ease_milli,
                                 readability_metrics)
    d = _t(spark, sf_dir, "documents")
    body = F.regexp_replace(F.col("text"), " the ", ". ")
    m = readability_metrics(body)
    return d.select(
        "doc_id", m["n_words"].cast("long").alias("n_words"),
        m["n_sentences"].cast("long").alias("n_sentences"),
        m["n_syllables"].cast("long").alias("n_syllables"),
        flesch_reading_ease_milli(body).alias("flesch_milli"))


_TEXT_READABILITY_BODY = "regexp_replace(text, ' the ', '. ', 'g')"


def _text_readability_sql() -> str:
    from .operators.text import readability_sql
    m = readability_sql(_TEXT_READABILITY_BODY)
    return f"""
select doc_id, {m['n_words']}::bigint as n_words,
       {m['n_sentences']}::bigint as n_sentences,
       {m['n_syllables']}::bigint as n_syllables,
       {m['flesch_milli']} as flesch_milli
from documents
"""


def _fusion_relations_sql() -> dict[str, str]:
    from .operators.fusion import fuse_majority_sql, reify_statements_sql
    from .operators.graph import (clustering_coeff_sql,
                                  degree_assortativity_sql)
    from .operators.relations import hearst_pair_counts_sql
    from .operators.text import bpe_pair_counts_sql
    return {
        "kg_fused_triples": fuse_majority_sql(_KG_FUSED_TRIPLES_SQL),
        "kg_reified_triples": reify_statements_sql(_KG_PAGES_TRIPLES_SQL),
        "kg_hearst_pairs": hearst_pair_counts_sql(_KG_HEARST_DOCS_SQL),
        "graph_clustering_coeff": clustering_coeff_sql(_TWO_LEVEL_EDGES_SQL),
        "graph_assortativity":
            degree_assortativity_sql(_TWO_LEVEL_EDGES_SQL),
        "text_bpe_pairs":
            bpe_pair_counts_sql("select text from documents"),
        "text_readability": _text_readability_sql(),
    }


# --- GNN feature prep + reciprocity (graph.py round-4 cont.) ----------------

def _graph_neighbor_sample(spark, sf_dir):
    """GraphSAGE fan-out (operators/graph.neighbor_sample): deterministic
    hash-ranked top-k neighbors per node — reproducible across retries and
    engines where rand() is not; one keyed window shuffle."""
    from .operators.graph import neighbor_sample
    return neighbor_sample(_doc_two_level_edges(spark, sf_dir), k=1,
                           salt="epoch0")


def _doc_feature_nodes_sql() -> str:
    return (f"select {DOC_URL_SQL} as node, n_chars as f from documents")


def _graph_sage_features(spark, sf_dir):
    """Two-layer mean neighborhood aggregation
    (operators/graph.neighbor_mean_agg) over the doc graph with n_chars as
    the node feature — the message-passing feature prep a GraphSAGE
    training job consumes; two edge-keyed shuffles per layer.  The
    operator's masked-aggregation nulls (frontier nodes with no sampled
    neighbors) are coalesced to a -1.0 sentinel here — scalar sortable
    output is the registry's harness contract."""
    from .operators.graph import neighbor_mean_agg
    d = _t(spark, sf_dir, "documents")
    feats = d.select(
        F.concat(F.lit("http://pages.example.org/doc/"),
                 F.col("doc_id")).alias("node"),
        F.col("n_chars").alias("f"))
    out = neighbor_mean_agg(_doc_two_level_edges(spark, sf_dir), feats)
    return out.select("node", "f",
                      F.coalesce("h1", F.lit(-1.0)).alias("h1"),
                      F.coalesce("h2", F.lit(-1.0)).alias("h2"))


_RECIP_EDGES_SQL = (f"{_TWO_LEVEL_EDGES_SQL} union all "
                    f"select 'http://pages.example.org/doc/' || (doc_id // 2)"
                    f" as src, {DOC_URL_SQL} as dst from documents"
                    " where doc_id > 0 and doc_id % 3 = 0")


def _graph_reciprocity(spark, sf_dir):
    """Directed reciprocity (operators/graph.reciprocity) over the doc
    graph with every third parent edge reversed — the mutual-link spam
    fingerprint; one reversed-key semi-join to a single row."""
    from .operators.graph import reciprocity
    base = _doc_two_level_edges(spark, sf_dir)
    prefix = "http://pages.example.org/doc/"
    rev = (_t(spark, sf_dir, "documents")
           .filter((F.col("doc_id") > 0) & (F.col("doc_id") % 3 == 0))
           .select(F.concat(F.lit(prefix), F.expr("doc_id div 2"))
                   .alias("src"),
                   F.concat(F.lit(prefix), F.col("doc_id")).alias("dst")))
    return reciprocity(base.unionByName(rev))


def _gnn_sql() -> dict[str, str]:
    from .operators.graph import (neighbor_mean_agg_sql, neighbor_sample_sql,
                                  reciprocity_sql)
    return {
        "graph_neighbor_sample":
            neighbor_sample_sql(_TWO_LEVEL_EDGES_SQL, k=1, salt="epoch0"),
        "graph_sage_features":
            f"select node, f, coalesce(h1, -1.0) as h1,"
            f" coalesce(h2, -1.0) as h2 from ("
            f"{neighbor_mean_agg_sql(_TWO_LEVEL_EDGES_SQL, _doc_feature_nodes_sql())})",
        "graph_reciprocity": reciprocity_sql(_RECIP_EDGES_SQL),
    }


# --- edge split / boilerplate / keyphrases (round-4 cont.) ------------------

def _graph_edge_split(spark, sf_dir):
    """Link-prediction 80/10/10 split (operators/graph.edge_split):
    retry-stable md5-bucket assignment — a pure per-row projection where
    randomSplit would redraw per recomputation; pairs with the TransE
    negative-sampling op for KG-embedding eval prep."""
    from .operators.graph import edge_split
    return edge_split(_doc_two_level_edges(spark, sf_dir))


# Host-boilerplate fixture: a shared per-source header/footer wrapped
# around each doc's body — both engines assemble the identical string;
# `source` stands in for the page host.
_BOILER_DOCS_SQL = """
select doc_id, source as host,
       'Copyright ' || source || chr(10) || text || chr(10) ||
       'All rights reserved ' || source as text
from documents
"""


def _boiler_docs(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id", F.col("source").alias("host"),
        F.concat(F.lit("Copyright "), F.col("source"), F.lit("\n"),
                 F.col("text"), F.lit("\n"),
                 F.lit("All rights reserved "), F.col("source"))
        .alias("text"))


def _text_host_boilerplate(spark, sf_dir):
    """Host-scoped boilerplate detection
    (operators/text.host_boilerplate_lines): lines repeating across ≥50%
    of a host's pages — the template-removal complement of C4's global
    repeated-line rule; counts key on the per-host line vocabulary, page
    totals broadcast back."""
    from .operators.text import host_boilerplate_lines
    return host_boilerplate_lines(_boiler_docs(spark, sf_dir))


def _text_keyphrases(spark, sf_dir):
    """RAKE-style keyphrase candidates (operators/text.keyphrases):
    stopword/punctuation-delimited word runs scored freq·n_words (Rose et
    al. 2010, corpus-level simplification) — one narrow split+explode and
    one phrase-vocabulary aggregation."""
    from .operators.text import keyphrases
    return keyphrases(_t(spark, sf_dir, "documents"), min_freq=5)


def _split_boiler_sql() -> dict[str, str]:
    from .operators.graph import edge_split_sql
    from .operators.text import host_boilerplate_lines_sql, keyphrases_sql
    return {
        "graph_edge_split": edge_split_sql(_TWO_LEVEL_EDGES_SQL),
        "text_host_boilerplate":
            host_boilerplate_lines_sql(_BOILER_DOCS_SQL),
        "text_keyphrases":
            keyphrases_sql("select text from documents", min_freq=5),
    }


# --- RDFa-lite facet (round-4 cont.) ----------------------------------------

def _kg_rdfa_triples(spark, sf_dir):
    """Stage 1e: RDFa-lite scopes → triples (web.rdfa_to_triples over the
    sources/html_extract parser's vocab/prefix expansion) — the fourth
    structured-data facet after tables, microdata, and JSON-LD.  The
    fixture page per document exercises vocab term expansion (name,
    inLanguage, wordCount), a declared CURIE prefix (ex:rank), fragment
    subject resolution (#art-N against the url), text-content vs
    content/href-attribute values, and IRI-vs-literal object detection;
    the oracle predicts all five triples relationally."""
    from .web import rdfa_to_triples
    d = _t(spark, sf_dir, "documents")
    html = F.concat(
        F.lit('<html><body><div vocab="http://schema.org/" '
              'prefix="ex: http://ex.org/ns#" typeof="Article" '
              'resource="#art-'), F.col("doc_id"),
        F.lit('"><span property="name">Doc '), F.col("doc_id"),
        F.lit('</span><link property="inLanguage" '
              'href="http://lang.example.org/'), F.col("lang"),
        F.lit('"><meta property="wordCount" content="'), F.col("n_chars"),
        F.lit('"><b property="ex:rank" content="'), F.col("doc_id") % 5,
        F.lit('"></b></div></body></html>'))
    pages = d.select(
        F.concat(F.lit("http://pages.example.org/doc/"),
                 F.col("doc_id")).alias("url"),
        html.alias("html"))
    return rdfa_to_triples(pages).select("subj", "pred", "obj", "obj_is_iri")


_KG_RDFA_TRIPLES_SQL = f"""
with s as (select {DOC_URL_SQL} || '#art-' || doc_id as subj, * from documents)
select subj, 'http://www.w3.org/1999/02/22-rdf-syntax-ns#type' as pred,
       'http://schema.org/Article' as obj, true as obj_is_iri from s
union all
select subj, 'http://schema.org/name', 'Doc ' || doc_id, false from s
union all
select subj, 'http://schema.org/inLanguage',
       'http://lang.example.org/' || lang, true from s
union all
select subj, 'http://schema.org/wordCount', n_chars::varchar, false from s
union all
select subj, 'http://ex.org/ns#rank', (doc_id % 5)::varchar, false from s
"""


# --- entity disambiguation (round-4 cont.) ----------------------------------

# Ambiguous surface → candidate entities with context bags; contexts are
# drawn from the corpus vocabulary so documents genuinely separate the
# senses. Both engines construct the identical table.
_DISAMB_CANDIDATES = [
    ("spark", "https://kg.example.org/entity/tool/spark-engine",
     "batch stream window executor"),
    ("spark", "https://kg.example.org/entity/fire/spark-ember",
     "flame ember ash heat"),
    ("merge", "https://kg.example.org/entity/op/merge-join",
     "join sort hash table"),
    ("merge", "https://kg.example.org/entity/vcs/merge-commit",
     "branch commit repo diff"),
]

_DISAMB_CANDIDATES_SQL = "select * from (values " + ", ".join(
    f"('{s}', '{e}', '{c}')" for s, e, c in _DISAMB_CANDIDATES
) + ") t(surface, entity, context)"


def _kg_entity_disambiguation(spark, sf_dir):
    """Stage 2c: context-scored entity disambiguation
    (web.disambiguate_mentions): ambiguous surfaces resolve to the
    candidate whose context bag best overlaps the document (wikify-style),
    lexical-min entity tie-break — broadcast candidate join, one
    array_intersect projection, one (doc, surface)-keyed window."""
    from .web import disambiguate_mentions
    cands = spark.createDataFrame(
        _DISAMB_CANDIDATES, "surface string, entity string, context string")
    return disambiguate_mentions(_t(spark, sf_dir, "documents"), cands)


def _kg_entity_disambiguation_sql() -> str:
    from .web import disambiguate_sql
    return disambiguate_sql("select doc_id, text from documents",
                            _DISAMB_CANDIDATES_SQL)


# --- corpus drift + sampled centrality (round-4 cont.) ----------------------

def _corpus_source_divergence(spark, sf_dir):
    """Per-source corpus drift (operators/text.source_divergence):
    total-variation distance between each source's word distribution and
    the corpus — in exact scaled integers (log divergences are
    summation-order-dependent and can never hash-match; TV can).
    Vocabulary-keyed shuffles only."""
    from .operators.text import source_divergence
    return source_divergence(_t(spark, sf_dir, "documents"))


_HARMONIC_SEEDS_SQL = ("select 'http://pages.example.org/doc/' || doc_id"
                       " as node from documents where doc_id % 97 = 0")


def _graph_harmonic_sampled(spark, sf_dir):
    """Sampled harmonic centrality (operators/graph.
    harmonic_centrality_sampled) over the two-level doc graph from the
    deterministic 1-in-97 seed sample: Σ L/d in exact integers (L =
    lcm(1..4)) so the per-node sum is engine-stable where floating Σ 1/d
    is not; all K seeds share one frontier iteration."""
    from .operators.graph import harmonic_centrality_sampled
    seeds = (_t(spark, sf_dir, "documents")
             .filter(F.col("doc_id") % 97 == 0)
             .select(F.concat(F.lit("http://pages.example.org/doc/"),
                              F.col("doc_id")).alias("node")))
    return harmonic_centrality_sampled(
        _doc_two_level_edges(spark, sf_dir), seeds, max_hops=4)


def _drift_centrality_sql() -> dict[str, str]:
    from .operators.graph import harmonic_sql, predicate_cardinality_sql
    from .operators.text import source_divergence_sql
    return {
        "corpus_source_divergence":
            source_divergence_sql("select source, text from documents"),
        "graph_harmonic_sampled":
            harmonic_sql(_TWO_LEVEL_EDGES_SQL, _HARMONIC_SEEDS_SQL,
                         max_hops=4),
        "kg_pred_cardinality":
            predicate_cardinality_sql(_KG_PAGES_TRIPLES_SQL),
    }


def _kg_pred_cardinality(spark, sf_dir):
    """Schema mining (operators/graph.predicate_cardinality): per-predicate
    functional / inverse-functional profile with an exact-integer threshold
    test — doc-graph predicates are all functional, and only the unique-
    valued ones (doc_id) come out inverse-functional, so the fixture
    discriminates both flags."""
    from .operators.graph import predicate_cardinality
    return predicate_cardinality(_kg_pages_triples(spark, sf_dir))


_BM25_TERMS = ("join", "merge", "sort")


def _text_bm25(spark, sf_dir):
    """Okapi BM25 relevance against a fixed query-term set
    (operators/text.bm25_scores) — the topic-relevance filter for
    targeted corpus builds.  One stats aggregation, broadcast crossJoin,
    narrow fixed-order scoring expression; the per-doc total never goes
    through a shuffle-ordered sum, so the doubles are engine-stable."""
    from .operators.text import bm25_scores
    return bm25_scores(_t(spark, sf_dir, "documents"), _BM25_TERMS)


def _text_bm25_sql() -> str:
    from .operators.text import bm25_sql
    return bm25_sql("select doc_id, text from documents", _BM25_TERMS)


def _graph_component_sizes(spark, sf_dir):
    """Component-size histogram over a many-component star fixture
    (decade stars: doc → its decade root): stage 3's distributed
    connected components (operators/components.connected_components)
    must recover exactly the decade partition, so the histogram has a
    direct closed-form relational oracle — a structural check on CC
    itself, complementing the canonicalization profile mirrors."""
    from .operators.components import connected_components
    prefix = "http://pages.example.org/doc/"
    edges = (_t(spark, sf_dir, "documents")
             .filter(F.col("doc_id") % 10 != 0)
             .select(F.concat(F.lit(prefix), F.col("doc_id")).alias("a"),
                     F.concat(F.lit(prefix),
                              F.expr("doc_id - doc_id % 10")).alias("b")))
    cc = connected_components(edges)
    sizes = cc.groupBy("component").agg(F.count("*").alias("sz"))
    return (sizes.groupBy("sz")
            .agg(F.count("*").cast("long").alias("n_components"))
            .select(F.col("sz").cast("long").alias("component_size"),
                    "n_components"))


# decade d holds docs [10d, 10d+9] ∩ corpus → the component is the whole
# decade; decades with a lone root have no edges and no CC row
_GRAPH_COMPONENT_SIZES_SQL = """
with dec as (select doc_id // 10 as d, count(*) as sz
             from documents group by doc_id // 10
             having count(*) >= 2)
select sz::bigint as component_size, count(*)::bigint as n_components
from dec group by sz
"""


def _text_chunks(spark, sf_dir):
    """RAG-prep sliding-window chunking (operators/text.chunk_documents):
    64-token windows, 16-token overlap — one sequence + slice + explode,
    narrow and shuffle-free; the oracle mirrors the start sequence and
    the clamped slice semantics."""
    from .operators.text import chunk_documents
    return chunk_documents(_t(spark, sf_dir, "documents"),
                           size=64, overlap=16)


def _text_chunks_sql() -> str:
    from .operators.text import chunk_documents_sql
    return chunk_documents_sql("select doc_id, text from documents",
                               size=64, overlap=16)


def _dedup_winnow_fps(spark, sf_dir):
    """Winnowing fingerprints (operators/dedup.winnow_fingerprints — the
    MOSS/SIGMOD'03 algorithm): window-min k-gram hashes with the
    shared-run guarantee MinHash lacks — the candidate generator for
    partial-overlap and quotation detection; narrow array pipeline, one
    distinct shuffle on the fingerprint table."""
    from .operators.dedup import winnow_fingerprints
    return winnow_fingerprints(_t(spark, sf_dir, "documents"))


def _dedup_winnow_sql() -> str:
    from .operators.dedup import winnow_fingerprints_sql
    return winnow_fingerprints_sql("select doc_id, text from documents")


def _dedup_winnow_pairs(spark, sf_dir):
    """Winnow overlap pairs (operators/dedup.winnow_overlap_pairs):
    fingerprint equi-join with a stop-fingerprint cap and a min-shared
    prune — the quotation/partial-duplicate candidate tier; never
    all-pairs."""
    from .operators.dedup import winnow_overlap_pairs
    return winnow_overlap_pairs(_t(spark, sf_dir, "documents"),
                                min_shared=2)


def _dedup_winnow_pairs_sql() -> str:
    from .operators.dedup import winnow_overlap_pairs_sql
    return winnow_overlap_pairs_sql("select doc_id, text from documents",
                                    min_shared=2)


_SUBSTR_K, _SUBSTR_MIN_DOCS = 8, 2


def _dedup_substring_spans(spark, sf_dir):
    """Exact repeated-substring detection (Lee et al. 2022's dedup target,
    operators/dedup.repeated_substring_spans): maximal per-document token
    spans covered by any 8-token shingle occurring in >= 2 documents —
    shingle explode (JVM transform/slice), ONE count-distinct hash
    aggregation (never a doc-list), semi-join back, and a per-document
    running-max island merge. The oracle runs the identical relational
    plan (same window SQL) over the same md5 shingle hashes."""
    from .operators.dedup import repeated_substring_spans
    return repeated_substring_spans(_t(spark, sf_dir, "documents"),
                                    k=_SUBSTR_K, min_docs=_SUBSTR_MIN_DOCS)


def _substr_spans_sql(k: int = _SUBSTR_K,
                      min_docs: int = _SUBSTR_MIN_DOCS) -> str:
    return f"""
with toks as (select doc_id, string_split_regex(text, '\\s+') as t
              from documents),
sh as (select doc_id, r.i as pos,
              md5(array_to_string(list_slice(t, r.i, r.i + {k - 1}), ' '))
                as h
       from toks, lateral (select unnest(range(1, len(t) - {k} + 2)) as i) r
       where len(t) >= {k}),
rep as (select h from sh group by h
        having count(distinct doc_id) >= {min_docs}),
hits as (select doc_id, pos as s, pos + {k - 1} as e from sh
         join rep using (h)),
marked as (select doc_id, s, e,
           max(e) over (partition by doc_id order by s, e
                        rows between unbounded preceding and 1 preceding)
             as prev_max
           from hits),
islands as (select doc_id, s, e,
            sum(case when prev_max is null or s > prev_max
                     then 1 else 0 end)
              over (partition by doc_id order by s, e
                    rows between unbounded preceding and current row)
              as island
            from marked)
select doc_id, cast(min(s) as bigint) as span_start,
       cast(max(e) as bigint) as span_end
from islands group by doc_id, island
"""


def _dedup_substring_scrub(spark, sf_dir):
    """Scrub tier of the exact substring dedup: rebuild each document
    without its repeated spans (operators/dedup.scrub_repeated_substrings)
    — one range-filtered equi-join on the doc id + one ordered
    re-assembly; untouched documents pass through with n_removed = 0."""
    from .operators.dedup import scrub_repeated_substrings
    return scrub_repeated_substrings(_t(spark, sf_dir, "documents"),
                                     k=_SUBSTR_K,
                                     min_docs=_SUBSTR_MIN_DOCS)


def _substr_scrub_sql(k: int = _SUBSTR_K,
                      min_docs: int = _SUBSTR_MIN_DOCS) -> str:
    return f"""
with spans as ({_substr_spans_sql(k, min_docs)}),
toks as (select doc_id, string_split_regex(text, '\\s+') as t
         from documents),
pos_tok as (select doc_id, r.i as pos, t[r.i] as tok
            from toks, lateral (select unnest(range(1, len(t) + 1)) as i) r),
kept as (select p.doc_id, p.pos, p.tok from pos_tok p
         where not exists (select 1 from spans s
                           where s.doc_id = p.doc_id
                             and p.pos between s.span_start
                                           and s.span_end)),
reb as (select doc_id, string_agg(tok, ' ' order by pos) as clean_text,
               count(*) as n_kept
        from kept group by doc_id)
select d.doc_id, coalesce(r.clean_text, '') as clean_text,
       cast(len(string_split_regex(d.text, '\\s+'))
            - coalesce(r.n_kept, 0) as bigint) as n_removed
from documents d left join reb r using (doc_id)
"""


def _multimodal_ann_topk(spark, sf_dir):
    """Multimodal → ANN bridge: binary blobs → deterministic pseudo-
    embeddings (operators/multimodal.pseudo_embeddings — real Arrow
    batch shape, md5 standing in for the model) → brute cosine top-k
    against media 0 (operators/similarity.cosine_topk, fused fold +
    TakeOrderedAndProject).  The full media-retrieval path, end-to-end
    oracle-checked because every stage is content-addressed."""
    from .operators.multimodal import media_from_documents, pseudo_embeddings
    from .operators.similarity import cosine_topk
    media = media_from_documents(_t(spark, sf_dir, "documents"))
    embs = pseudo_embeddings(media, dim=8)
    return cosine_topk(embs, query_id=0, k=10, id_col="media_id",
                       vec_col="embedding", extra_cols=())


def _multimodal_ann_sql() -> str:
    e = ("[(('0x' || substr(md5(text), 2 * i + 1, 2))::bigint / 255.0)"
         " for i in generate_series(0, 7)]")
    cos = _cos_sql("e.embedding", "q.embedding", dim=8)
    return f"""
with emb as (select doc_id as media_id, {e} as embedding from documents),
q as (select embedding from emb where media_id = 0),
scored as (
  select e.media_id, round({cos}, 4) as sim
  from emb e cross join q where e.media_id <> 0)
select media_id, sim from scored order by sim desc, media_id limit 10
"""


def _ann_int8_topk(spark, sf_dir):
    """Int8 MIPS scan tier (operators/quantize.int8_topk): exact integer
    dot over absmax codes + asymmetric rescale — 4x-compressed scan
    between brute-force and PQ, bit-exact across engines by
    construction (integer dot, fixed rescale chain)."""
    from .operators.quantize import int8_topk
    return int8_topk(_t(spark, sf_dir, "embeddings"), query_id=7, k=10)


def _ann_int8_sql() -> str:
    from .operators.quantize import int8_topk_sql
    return int8_topk_sql(query_id=7, k=10, dim=EMB_DIM)


def _kg_triples_half_sql(parity: int) -> str:
    return (f"select * from ({_KG_PAGES_TRIPLES_SQL}) "
            f"where (subj like '%#doc-%') and "
            f"(cast(split_part(subj, '#doc-', 2) as bigint) % 2 = {parity})")


def _kg_schema_drift(spark, sf_dir):
    """Schema drift between two deterministic snapshot halves of the
    pages corpus, with the odd half's doc_id predicate DROPPED — the
    extractor-regression shape the detector exists for
    (operators/graph.schema_drift): the full characteristic set loses
    population, a new smaller set appears."""
    from .operators.graph import schema_drift
    t = _kg_pages_triples(spark, sf_dir).withColumn(
        "_id", F.split(F.col("subj"), "#doc-").getItem(1).cast("long"))
    a = t.where(F.col("_id") % 2 == 0).drop("_id")
    b = (t.where(F.col("_id") % 2 == 1)
         .where(~F.col("pred").endswith("#doc_id")).drop("_id"))
    return schema_drift(a, b)


def _kg_schema_drift_sql() -> str:
    from .operators.graph import schema_drift_sql
    b = (f"select * from ({_kg_triples_half_sql(1)}) "
         "where pred not like '%#doc_id'")
    return schema_drift_sql(_kg_triples_half_sql(0), b)


def _kg_pred_profiles(spark, sf_dir):
    """Per-predicate value profiling (operators/graph.pred_value_profiles):
    numeric fraction + length stats per property — mapping-quality
    review material; one map-side-combined vocabulary-keyed agg."""
    from .operators.graph import pred_value_profiles
    return pred_value_profiles(_kg_pages_triples(spark, sf_dir))


def _corpus_lang_confusion(spark, sf_dir):
    """Language-ID confusion matrix: the documents table's declared lang
    column vs the marker-word identifier (operators/text.lang_id) →
    (lang, lang_id, n_docs) — the diagnostic that says where the cheap
    identifier disagrees with ground truth before anyone trusts it as a
    router.  One small keyed agg over a narrow projection."""
    from .operators.text import lang_id
    d = _t(spark, sf_dir, "documents")
    return (d.select(F.col("lang"), lang_id(F.col("text")).alias("lang_id"))
            .groupBy("lang", "lang_id")
            .agg(F.count("*").cast("long").alias("n_docs")))


def _corpus_lang_confusion_sql() -> str:
    lid = _langid_case_sql(TOKS_SQL)
    return f"""
select lang, {lid} as lang_id, count(*)::bigint as n_docs
from documents group by lang, {lid}
"""


def _kg_star_estimate(spark, sf_dir):
    """Characteristic sets USED as a planner statistic
    (operators/graph.star_cardinality_estimate): estimate the subject
    count of a {lang, n_chars} star from the vocabulary-sized summary
    and verify it equals the exact semi-join count — the ICDE'11
    cardinality-estimation loop closed."""
    from .operators.graph import star_cardinality_estimate
    return star_cardinality_estimate(_kg_pages_triples(spark, sf_dir),
                                     ("lang", "n_chars"))


_CRAWL_URLS_SQL = """
select 'http://' || source || '.example.org/doc/' || doc_id as url
from documents
union all
select 'http://' || source || '.example.org/lang/' || lang from documents
"""


def _crawl_url_templates(spark, sf_dir):
    """URL path-template mining (operators/urls.url_templates): numeric/
    hex id segments generalize to {id}, so a host's page TYPES surface
    from its page URLs — crawl-budget planning + infinite-space
    detection; one vocabulary-keyed count."""
    from .operators.urls import url_templates
    d = _t(spark, sf_dir, "documents")
    u = d.select(F.concat(F.lit("http://"), F.col("source"),
                          F.lit(".example.org/doc/"),
                          F.col("doc_id")).alias("url"))         .unionByName(d.select(
            F.concat(F.lit("http://"), F.col("source"),
                     F.lit(".example.org/lang/"),
                     F.col("lang")).alias("url")))
    return url_templates(u)


def _profiling_sql() -> dict[str, str]:
    from .operators.graph import (pred_value_profiles_sql,
                                  star_cardinality_estimate_sql)
    return {
        "kg_schema_drift": _kg_schema_drift_sql(),
        "kg_pred_profiles": pred_value_profiles_sql(_KG_PAGES_TRIPLES_SQL),
        "corpus_lang_confusion": _corpus_lang_confusion_sql(),
        "kg_star_estimate":
            star_cardinality_estimate_sql(_KG_PAGES_TRIPLES_SQL,
                                          ("lang", "n_chars")),
        "crawl_url_templates": _url_templates_oracle(),
    }


def _url_templates_oracle() -> str:
    from .operators.urls import url_templates_sql
    return url_templates_sql(_CRAWL_URLS_SQL)


# ---------------------------------------------------------------------------

# ORDERING CONTRACT: the correctness driver sweeps exactly the FIRST 50
# entries of this dict (registry order).  Rounds 1-3 established three
# rounds of green history for the csvw/dedup/ann/multimodal tiers, so
# those rotate to the back; the SPARQL/BGP/path/OWL/RDFS/graph and
# curation tiers (added round 3, never driver-swept) plus the rows fixed
# or touched this round sit inside the 50-entry window.  The window
# composition is PINNED (tests/test_queries_oracle.test_driver_sweep_
# window_pinned): new queries are appended at the END — outside the
# window — and covered by the pytest oracle mirror until a future round
# rotates them in.
_REGISTRY: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    # SPARQL / BGP tier (round 3, first driver sweep this round)
    "kg_bgp_star": _kg_bgp_star,
    "kg_bgp_path": _kg_bgp_path,
    "kg_bgp_optional": _kg_bgp_optional,
    "kg_bgp_filter": _kg_bgp_filter,
    "kg_bgp_union": _kg_bgp_union,
    "kg_bgp_minus": _kg_bgp_minus,
    "kg_bgp_graph": _kg_bgp_graph,
    "kg_bgp_having": _kg_bgp_having,
    "kg_bgp_values": _kg_bgp_values,
    "kg_bgp_bind": _kg_bgp_bind,
    "kg_bgp_exists": _kg_bgp_exists,
    "kg_bgp_agg": _kg_bgp_agg,
    "kg_bgp_group_concat": _kg_bgp_group_concat,
    "kg_bgp_subselect": _kg_bgp_subselect,
    "kg_sparql_select": _kg_sparql_select,
    "kg_sparql_agg": _kg_sparql_agg,
    "kg_sparql_funcs": _kg_sparql_funcs,
    "kg_describe_docs": _kg_describe_docs,
    # rendered-term tier (round 4): LANG/DATATYPE/STRDT/sameTerm over
    # the term-rendered documents graph
    "kg_term_lang": _kg_term_lang,
    "kg_term_datatype": _kg_term_datatype,
    "kg_term_sameterm": _kg_term_sameterm,
    # property paths / iterative graph tier (round 3, first sweep)
    "graph_path_expr": _graph_path_expr,
    "graph_path_star": _graph_path_star,
    "graph_path_opt": _graph_path_opt,
    "graph_closure_doubling": _graph_closure_doubling,
    "graph_closure_ancestors": _graph_closure_ancestors,
    "graph_pagerank": _graph_pagerank,
    "kg_bgp_path_expr": _kg_bgp_path_expr,
    # inference tier (round 3, first sweep)
    "kg_construct_derived": _kg_construct_derived,
    "kg_rdfs_derived": _kg_rdfs_derived,
    "kg_owl_derived": _kg_owl_derived,
    "kg_sameas_mapping": _kg_sameas_mapping,
    "kg_sameas_canonical": _kg_sameas_canonical,
    # KG construction extras (round 3, first sweep)
    "kg_entity_mentions_join": _kg_entity_mentions_join,
    "kg_microdata_triples": _kg_microdata_triples,
    "kg_canonicalized_triples": _kg_canonicalized_triples,
    "kg_canonical_dupes": _kg_canonical_dupes,
    "kg_pred_stats": _kg_pred_stats,
    "kg_property_table": _kg_property_table,
    # curation tier (round 3, first sweep)
    "text_pii_scrub": _text_pii_scrub,
    "sample_stratified": _sample_stratified,
    "pack_sequences": _pack_sequences,
    "text_decontaminate": _text_decontaminate,
    "corpus_curated": _corpus_curated,
    "dedup_span_stats": _dedup_span_stats,
    "corpus_vocabulary": _corpus_vocabulary,
    "corpus_length_quantiles": _corpus_length_quantiles,
    # rows red or touched in round 3/4 — keep under the hard signal
    "fk_group_integrity": _fk_group_integrity,
    "corpus_stats": _corpus_stats,
    "ann_cosine_topk": _ann_cosine_topk,
    # --- driver window ends here (first 50 entries above) ---
    # long-green history (driver green r1-r3, rotated out)
    "text_quality": _text_quality,
    "text_langid": _text_langid,
    "kg_pages_triples": _kg_pages_triples,
    # LM-scoring / DSIR / Bloom tier (round-4 cont. 5; pytest-mirror
    # oracle coverage — rotate into the window once it reopens)
    "text_perplexity": _text_perplexity,
    "sample_importance": _sample_importance,
    "text_decontaminate_bloom": _text_decontaminate_bloom,
    "csvw_triples_nation": _csvw_triples_nation,
    "csvw_coerce_numeric": _csvw_coerce_numeric,
    "csvw_date_format": _csvw_date_format,
    "csvw_null_default_trim": _csvw_null_default_trim,
    "csvw_json_rows": _csvw_json_rows,
    "csvw_list_split": _csvw_list_split,
    "csvw_boolean_format": _csvw_boolean_format,
    "csvw_uri_template": _csvw_uri_template,
    "agg_pricing_summary": _agg_pricing_summary,
    "join_order_revenue": _join_order_revenue,
    "window_top_events": _window_top_events,
    "agg_events_daily": _agg_events_daily,
    "agg_salted_count": _agg_salted_count,
    "fk_orders_customer": _fk_orders_customer,
    "text_gopher_quality": _text_gopher_quality,
    "text_fingerprint": _text_fingerprint,
    "text_url_normalize": _text_url_normalize,
    "dedup_exact": _dedup_exact,
    "dedup_ngram_jaccard": _dedup_ngram_jaccard,
    "dedup_minhash_sig": _dedup_minhash_sig,
    "dedup_minhash_pairs": _dedup_minhash_pairs,
    "dedup_simhash": _dedup_simhash,
    "dedup_simhash_pairs": _dedup_simhash_pairs,
    "dedup_simhash48": _dedup_simhash48,
    "dedup_simhash48_pairs": _dedup_simhash48_pairs,
    "dedup_minhash_scale_sig": _dedup_minhash_scale_sig,
    "dedup_minhash_scale_pairs": _dedup_minhash_scale_pairs,
    "dedup_minhash_verified_pairs": _dedup_minhash_verified_pairs,
    "dedup_corpus_near": _dedup_corpus_near,
    "dedup_corpus_lines": _dedup_corpus_lines,
    "dedup_embedding_cosine": _dedup_embedding_cosine,
    "dedup_semantic_pairs": _dedup_semantic_pairs,
    "dedup_semantic_keep": _dedup_semantic_keep,
    "corpus_cap_per_source": _corpus_cap_per_source,
    "ann_ivf_topk": _ann_ivf_topk,
    "ann_lsh_signatures": _ann_lsh_signatures,
    "ann_lsh_bucket_topk": _ann_lsh_bucket_topk,
    "ann_lsh_multiprobe_topk": _ann_lsh_multiprobe_topk,
    "dedup_embedding_lsh_pairs": _dedup_embedding_lsh_pairs,
    "ann_ivf_trained_topk": _ann_ivf_trained_topk,
    "ann_pq_topk": _ann_pq_topk,
    "ann_ivfpq_topk": _ann_ivfpq_topk,
    "ann_pq_rerank_topk": _ann_pq_rerank_topk,
    "multimodal_features": _multimodal_features,
    "multimodal_resize": _multimodal_resize,
    "multimodal_frames": _multimodal_frames,
    "multimodal_decode": _multimodal_decode,
    "multimodal_decode_audio": _multimodal_decode_audio,
    "kg_entity_mentions": _kg_entity_mentions,
    "kg_comention_pmi": _kg_comention_pmi,
    "dedup_edit_verified_pairs": _dedup_edit_verified_pairs,
    "text_c4_lines": _text_c4_lines,
    "graph_bfs_depths": _graph_bfs_depths,
    "kg_degree_histogram": _kg_degree_histogram,
    "kg_negative_samples": _kg_negative_samples,
    "kg_page_links": _kg_page_links,
    "kg_anchor_texts": _kg_anchor_texts,
    "dedup_url_latest": _dedup_url_latest,
    "text_tfidf_terms": _text_tfidf_terms,
    "graph_hits": _graph_hits,
    "kg_anchor_labels": _kg_anchor_labels,
    "graph_random_walks": _graph_random_walks,
    "events_sessionize": _events_sessionize,
    "graph_triangles": _graph_triangles,
    "kg_related_pages": _kg_related_pages,
    "corpus_ppl_buckets": _corpus_ppl_buckets,
    "text_quality_classifier": _text_quality_classifier,
    "curate_blocklist": _curate_blocklist,
    "graph_communities": _graph_communities,
    "kg_jsonld_triples": _kg_jsonld_triples,
    "kg_page_meta": _kg_page_meta,
    "dedup_canonical_groups": _dedup_canonical_groups,
    "kg_og_triples": _kg_og_triples,
    "kg_page_links_nofollow": _kg_page_links_nofollow,
    "kg_void_description": _kg_void_description,
    "crawl_frontier": _crawl_frontier,
    "curate_robots_filter": _curate_robots_filter,
    "text_url_strip_tracking": _text_url_strip_tracking,
    "crawl_recrawl_schedule": _crawl_recrawl_schedule,
    "crawl_sitemap_frontier": _crawl_sitemap_frontier,
    "join_supplier_profit": _join_supplier_profit,
    "emb_int8_quantize": _emb_int8_quantize,
    "emb_matryoshka": _emb_matryoshka,
    "text_script_profile": _text_script_profile,
    "dedup_url_canonical": _dedup_url_canonical,
    # WebTables distributed type intuition (round-4 cont.; pytest-mirror
    # oracle coverage — rotate into the window once it reopens)
    "webtables_type_profile": _webtables_type_profile,
    "webtables_typed_triples": _webtables_typed_triples,
    "webtables_header_triples": _webtables_header_triples,
    "webtables_subject_column": _webtables_subject_column,
    "webtables_entity_triples": _webtables_entity_triples,
    "webtables_schema_freq": _webtables_schema_freq,
    "webtables_pred_induction": _webtables_pred_induction,
    # SHACL-lite shape validation (round-4 cont. 12)
    "kg_shacl_report": _kg_shacl_report,
    "kg_shacl_summary": _kg_shacl_summary,
    # incremental cross-snapshot near-dedup (round-4 cont. 13)
    "dedup_incremental_pairs": _dedup_incremental_pairs,
    "dedup_incremental_keep": _dedup_incremental_keep,
    "sample_mixture": _sample_mixture,
    "ann_recall_lsh": _ann_recall_lsh,
    "ann_recall_ivf": _ann_recall_ivf,
    "ann_recall_pq": _ann_recall_pq,
    "ann_cosine_batch_topk": _ann_cosine_batch_topk,
    "ann_ivf_batch_topk": _ann_ivf_batch_topk,
    "dedup_embedding_incremental": _dedup_embedding_incremental,
    "graph_kcore": _graph_kcore,
    # round-4 cont. 14: graph summarization + blocked ER + skip-gram prep
    "kg_fused_triples": _kg_fused_triples,
    "kg_reified_triples": _kg_reified_triples,
    "kg_hearst_pairs": _kg_hearst_pairs,
    "graph_clustering_coeff": _graph_clustering_coeff,
    "graph_assortativity": _graph_assortativity,
    "text_bpe_pairs": _text_bpe_pairs,
    "text_readability": _text_readability,
    "graph_neighbor_sample": _graph_neighbor_sample,
    "graph_sage_features": _graph_sage_features,
    "graph_reciprocity": _graph_reciprocity,
    "graph_edge_split": _graph_edge_split,
    "text_host_boilerplate": _text_host_boilerplate,
    "text_keyphrases": _text_keyphrases,
    "kg_rdfa_triples": _kg_rdfa_triples,
    "kg_entity_disambiguation": _kg_entity_disambiguation,
    "corpus_source_divergence": _corpus_source_divergence,
    "graph_harmonic_sampled": _graph_harmonic_sampled,
    "kg_pred_cardinality": _kg_pred_cardinality,
    "text_bm25": _text_bm25,
    "graph_component_sizes": _graph_component_sizes,
    "text_chunks": _text_chunks,
    "dedup_winnow_fps": _dedup_winnow_fps,
    "dedup_winnow_pairs": _dedup_winnow_pairs,
    "dedup_substring_spans": _dedup_substring_spans,
    "dedup_substring_scrub": _dedup_substring_scrub,
    "multimodal_ann_topk": _multimodal_ann_topk,
    "ann_int8_topk": _ann_int8_topk,
    "kg_schema_drift": _kg_schema_drift,
    "kg_pred_profiles": _kg_pred_profiles,
    "corpus_lang_confusion": _corpus_lang_confusion,
    "kg_star_estimate": _kg_star_estimate,
    "crawl_url_templates": _crawl_url_templates,
    "kg_characteristic_sets": _kg_characteristic_sets,
    "kg_pred_cooccurrence": _kg_pred_cooccurrence,
    "er_blocked_part_names": _er_blocked_part_names,
    "graph_skipgram_pairs": _graph_skipgram_pairs,
}

# --- driver sweep window (ROTATION POLICY, round 5) -------------------------
# The driver's hard correctness signal covers exactly the FIRST 50 entries
# of _QUERIES. Policy (r4 verdict, made mechanism): each round this list is
# re-composed as ~10 long-green sentinels + the newest / never-driver-swept
# tiers, so every tier earns a green CORRECTNESS row within a round of
# landing. Rotating = editing THIS list only; the registry dict order is
# irrelevant. tests/test_queries_oracle.py pins the composition.
_DRIVER_WINDOW: list[str] = [
    # sentinels — long-green across rounds 1-4, one per major tier
    "csvw_triples_nation", "kg_pages_triples", "dedup_exact",
    "agg_pricing_summary", "fk_orders_customer", "kg_microdata_triples",
    "ann_cosine_topk",
    # round-5 additions — never swept, newest first
    "multimodal_decode", "multimodal_decode_audio",
    "ann_recall_ivf", "ann_recall_pq",
    # round-4 tiers that never had a driver row (r4 verdict task 1 list)
    "webtables_type_profile", "webtables_typed_triples",
    "webtables_header_triples", "webtables_subject_column",
    "webtables_entity_triples", "webtables_schema_freq",
    "webtables_pred_induction",
    "kg_shacl_report", "kg_shacl_summary",
    "dedup_incremental_pairs", "dedup_incremental_keep",
    "dedup_winnow_fps", "dedup_winnow_pairs",
    "dedup_semantic_pairs", "dedup_semantic_keep",
    "kg_fused_triples", "kg_reified_triples", "kg_hearst_pairs",
    "kg_rdfa_triples",
    "graph_communities", "graph_kcore", "graph_hits", "graph_bfs_depths",
    "graph_sage_features",
    "crawl_frontier", "crawl_recrawl_schedule", "crawl_sitemap_frontier",
    "text_bm25", "text_c4_lines", "text_tfidf_terms", "text_readability",
    "ann_int8_topk", "ann_pq_rerank_topk", "ann_recall_lsh",
    "ann_cosine_batch_topk",
    "events_sessionize", "sample_mixture", "er_blocked_part_names",
    "kg_void_description",
]

assert len(_DRIVER_WINDOW) == 50, len(_DRIVER_WINDOW)
assert len(set(_DRIVER_WINDOW)) == 50

_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    **{name: _REGISTRY[name] for name in _DRIVER_WINDOW},
    **{k: v for k, v in _REGISTRY.items() if k not in set(_DRIVER_WINDOW)},
}

_ORACLES: dict[str, str] = {
    "csvw_triples_nation": _CSVW_TRIPLES_NATION_SQL,
    "csvw_coerce_numeric": _CSVW_COERCE_NUMERIC_SQL,
    "csvw_date_format": _CSVW_DATE_FORMAT_SQL,
    "csvw_null_default_trim": _CSVW_NULL_DEFAULT_TRIM_SQL,
    "csvw_json_rows": _CSVW_JSON_ROWS_SQL,
    "csvw_list_split": _CSVW_LIST_SPLIT_SQL,
    "csvw_boolean_format": _CSVW_BOOLEAN_FORMAT_SQL,
    "csvw_uri_template": _CSVW_URI_TEMPLATE_SQL,
    "agg_pricing_summary": _AGG_PRICING_SUMMARY_SQL,
    "join_order_revenue": _JOIN_ORDER_REVENUE_SQL,
    "window_top_events": _WINDOW_TOP_EVENTS_SQL,
    "agg_events_daily": _AGG_EVENTS_DAILY_SQL,
    "agg_salted_count": _AGG_SALTED_COUNT_SQL,
    "fk_orders_customer": _FK_ORDERS_CUSTOMER_SQL,
    "fk_group_integrity": _FK_GROUP_INTEGRITY_SQL,
    "text_quality": _TEXT_QUALITY_SQL,
    "text_gopher_quality": _TEXT_GOPHER_QUALITY_SQL,
    "corpus_stats": _CORPUS_STATS_SQL,
    "text_langid": _TEXT_LANGID_SQL,
    "text_fingerprint": _TEXT_FINGERPRINT_SQL,
    "text_url_normalize": _TEXT_URL_NORMALIZE_SQL,
    "dedup_exact": _DEDUP_EXACT_SQL,
    "dedup_ngram_jaccard": _DEDUP_NGRAM_JACCARD_SQL,
    "dedup_minhash_sig": _DEDUP_MINHASH_SIG_SQL,
    "dedup_minhash_pairs": _DEDUP_MINHASH_PAIRS_SQL,
    "dedup_simhash": _DEDUP_SIMHASH_SQL,
    "dedup_simhash_pairs": _DEDUP_SIMHASH_PAIRS_SQL,
    "dedup_simhash48": _DEDUP_SIMHASH48_SQL,
    "dedup_simhash48_pairs": _DEDUP_SIMHASH48_PAIRS_SQL,
    "dedup_minhash_scale_sig": _DEDUP_MINHASH_SCALE_SIG_SQL,
    "dedup_minhash_scale_pairs": _DEDUP_MINHASH_SCALE_PAIRS_SQL,
    "dedup_minhash_verified_pairs": _DEDUP_MINHASH_VERIFIED_PAIRS_SQL,
    "dedup_corpus_near": _DEDUP_CORPUS_NEAR_SQL,
    "dedup_corpus_lines": _DEDUP_CORPUS_LINES_SQL,
    "dedup_embedding_cosine": _DEDUP_EMBEDDING_COSINE_SQL,
    "dedup_semantic_pairs": _semantic_pairs_sql(),
    "dedup_semantic_keep": _semantic_keep_sql(),
    "corpus_cap_per_source": _CORPUS_CAP_PER_SOURCE_SQL,
    "ann_cosine_topk": _ANN_COSINE_TOPK_SQL,
    "ann_ivf_topk": _ANN_IVF_TOPK_SQL,
    "ann_lsh_signatures": _ANN_LSH_SIGNATURES_SQL,
    "ann_lsh_bucket_topk": _ANN_LSH_BUCKET_TOPK_SQL,
    "ann_lsh_multiprobe_topk": _ANN_LSH_MULTIPROBE_TOPK_SQL,
    "dedup_embedding_lsh_pairs": _DEDUP_EMBEDDING_LSH_PAIRS_SQL,
    "multimodal_features": _MULTIMODAL_FEATURES_SQL,
    "multimodal_resize": _MULTIMODAL_RESIZE_SQL,
    "multimodal_frames": _MULTIMODAL_FRAMES_SQL,
    "multimodal_decode": _MULTIMODAL_DECODE_SQL,
    "multimodal_decode_audio": _MULTIMODAL_DECODE_AUDIO_SQL,
    "kg_pages_triples": _KG_PAGES_TRIPLES_SQL,
    "kg_entity_mentions": _KG_ENTITY_MENTIONS_SQL,
    "kg_entity_mentions_join": _KG_ENTITY_MENTIONS_SQL,
    "kg_microdata_triples": _KG_MICRODATA_TRIPLES_SQL,
    "kg_jsonld_triples": _KG_JSONLD_TRIPLES_SQL,
    "kg_page_meta": _KG_PAGE_META_SQL,
    "dedup_canonical_groups": _DEDUP_CANONICAL_GROUPS_SQL,
    "kg_og_triples": _KG_OG_TRIPLES_SQL,
    "kg_page_links_nofollow": _KG_PAGE_LINKS_NOFOLLOW_SQL,
    "kg_void_description": _void_sql(_KG_MICRODATA_TRIPLES_SQL,
                                     "https://kg.example.org/dataset/docs"),
    "crawl_frontier": _CRAWL_FRONTIER_SQL,
    "curate_robots_filter": _CURATE_ROBOTS_FILTER_SQL,
    "text_url_strip_tracking": _url_strip_tracking_sql(),
    "crawl_recrawl_schedule": _CRAWL_RECRAWL_SCHEDULE_SQL,
    "crawl_sitemap_frontier": _CRAWL_SITEMAP_FRONTIER_SQL,
    "join_supplier_profit": _JOIN_SUPPLIER_PROFIT_SQL,
    "emb_int8_quantize": _EMB_INT8_QUANTIZE_SQL,
    "emb_matryoshka": _EMB_MATRYOSHKA_SQL,
    "text_script_profile": _text_script_profile_sql(),
    "dedup_url_canonical": _DEDUP_URL_CANONICAL_SQL,
    "kg_canonicalized_triples": _KG_CANONICALIZED_TRIPLES_SQL,
    "kg_canonical_dupes": _KG_CANONICAL_DUPES_SQL,
    "ann_ivf_trained_topk": _ivf_trained_sql(),
    "ann_pq_topk": _pq_topk_sql(),
    "ann_ivfpq_topk": _ivfpq_topk_sql(),
    "ann_pq_rerank_topk": _pq_rerank_sql(),
    "text_pii_scrub": _TEXT_PII_SCRUB_SQL,
    "sample_stratified": _SAMPLE_STRATIFIED_SQL,
    "pack_sequences": _PACK_SEQUENCES_SQL,
    "text_decontaminate": _TEXT_DECONTAMINATE_SQL,
    "kg_pred_stats": _KG_PRED_STATS_SQL,
    "kg_property_table": _KG_PROPERTY_TABLE_SQL,
    "corpus_curated": _CORPUS_CURATED_SQL,
    "dedup_span_stats": _DEDUP_SPAN_STATS_SQL,
    "corpus_vocabulary": _CORPUS_VOCABULARY_SQL,
    "corpus_length_quantiles": _CORPUS_LENGTH_QUANTILES_SQL,
    "text_perplexity": _TEXT_PERPLEXITY_SQL,
    "sample_importance": _SAMPLE_IMPORTANCE_SQL,
    "text_decontaminate_bloom": _TEXT_DECONTAMINATE_BLOOM_SQL,
    "kg_comention_pmi": _KG_COMENTION_PMI_SQL,
    "dedup_edit_verified_pairs": _DEDUP_EDIT_VERIFIED_SQL,
    "text_c4_lines": _TEXT_C4_LINES_SQL,
    "graph_bfs_depths": _GRAPH_BFS_DEPTHS_SQL,
    "kg_degree_histogram":
        _KG_DEGREE_HISTOGRAM_SQL.format(sparse=_KG_SPARSE_GRAPH_SQL),
    "kg_negative_samples":
        _KG_NEGATIVE_SAMPLES_SQL.format(graph=_KG_MICRODATA_TRIPLES_SQL),
    "kg_page_links": _TREE_EDGES_SQL,
    "kg_anchor_texts": _KG_ANCHOR_TEXTS_SQL,
    "dedup_url_latest": _DEDUP_URL_LATEST_SQL,
    "text_tfidf_terms": _TEXT_TFIDF_TERMS_SQL,
    "kg_anchor_labels": _KG_ANCHOR_LABELS_SQL,
    "graph_random_walks": _GRAPH_RANDOM_WALKS_SQL,
    "events_sessionize": _EVENTS_SESSIONIZE_SQL,
    "corpus_ppl_buckets": _CORPUS_PPL_BUCKETS_SQL,
    "text_quality_classifier": _TEXT_QUALITY_CLASSIFIER_SQL,
    "curate_blocklist": _CURATE_BLOCKLIST_SQL,
    "webtables_type_profile": _WEBTABLES_TYPE_PROFILE_SQL,
    "webtables_typed_triples": _WEBTABLES_TYPED_TRIPLES_SQL,
    "webtables_header_triples": _WEBTABLES_HEADER_TRIPLES_SQL,
    "webtables_subject_column": _WEBTABLES_SUBJECT_COLUMN_SQL,
    "webtables_entity_triples": _WEBTABLES_ENTITY_TRIPLES_SQL,
    "webtables_schema_freq": _WEBTABLES_SCHEMA_FREQ_SQL,
    "webtables_pred_induction": _WEBTABLES_PRED_INDUCTION_SQL,
    "kg_shacl_report": _KG_SHACL_REPORT_SQL,
    "kg_shacl_summary": _KG_SHACL_SUMMARY_SQL,
    "dedup_incremental_pairs": _DEDUP_INCREMENTAL_PAIRS_SQL,
    "dedup_incremental_keep": _DEDUP_INCREMENTAL_KEEP_SQL,
    "sample_mixture": _SAMPLE_MIXTURE_SQL,
    "ann_recall_lsh": _ANN_RECALL_LSH_SQL,
    "ann_recall_ivf": _ANN_RECALL_IVF_SQL,
    "ann_recall_pq": _ANN_RECALL_PQ_SQL,
    "ann_cosine_batch_topk": _ANN_COSINE_BATCH_TOPK_SQL,
    "ann_ivf_batch_topk": _ivf_batch_sql(),
    "dedup_embedding_incremental": _DEDUP_EMBEDDING_INCREMENTAL_SQL,
    **_graph_sql(),
    **_webgraph_sql(),
    **_summary_er_sql(),
    **_fusion_relations_sql(),
    **_gnn_sql(),
    **_split_boiler_sql(),
    "kg_rdfa_triples": _KG_RDFA_TRIPLES_SQL,
    "kg_entity_disambiguation": _kg_entity_disambiguation_sql(),
    **_drift_centrality_sql(),
    "text_bm25": _text_bm25_sql(),
    "graph_component_sizes": _GRAPH_COMPONENT_SIZES_SQL,
    "text_chunks": _text_chunks_sql(),
    "dedup_winnow_fps": _dedup_winnow_sql(),
    "dedup_winnow_pairs": _dedup_winnow_pairs_sql(),
    "dedup_substring_spans": _substr_spans_sql(),
    "dedup_substring_scrub": _substr_scrub_sql(),
    "multimodal_ann_topk": _multimodal_ann_sql(),
    "ann_int8_topk": _ann_int8_sql(),
    **_profiling_sql(),
}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(_ORACLES)
