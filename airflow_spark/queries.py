"""Declared relational query registry (SURVEY.md §2.12 — the t2 contract).

Each query is implemented with the **DataFrame API** (declarative →
Catalyst picks the physical plan: broadcast vs sort-merge joins, partial
aggregation, TakeOrderedAndProject for top-k, subquery-free scalar
lookups via broadcast 1-row joins) and paired with a single ANSI-SQL
oracle text that DuckDB runs over the same parquet tables.

Correctness conventions (verified row-for-row vs DuckDB over sf0.01):
- total ORDER BY on unique/non-null keys for every LIMIT query,
- doubles rounded to 2 decimals before hashing (FP agg order),
- timestamps second-truncated or cast to DATE,
- explicit NULLS LAST on nullable sort keys (Spark default ASC =
  NULLS FIRST; DuckDB = NULLS LAST),
- every computed column aliased identically in DataFrame and SQL.

Operator coverage is noted per query against the SURVEY.md §2 inventory
(P=projection/filter, J=join, A=aggregation, W=window, T=top-k,
F=scalar function, S=scan).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .catalog import load_tables

QueryFn = Callable[[SparkSession, str], DataFrame]

# ---------------------------------------------------------------------------
# Q01-Q30 DataFrame builders
# ---------------------------------------------------------------------------


def q01(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S-scan + P1 projection + T3 limit. Column pruning reaches the scan."""
    t = load_tables(spark, sf_dir)
    return (
        t.lineitem.select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
        .orderBy("l_orderkey", "l_linenumber")
        .limit(100)
    )


def q02(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3/P4 conjunctive filter + IN + LIKE (predicates push to parquet)."""
    t = load_tables(spark, sf_dir)
    return (
        t.orders.where(
            F.col("o_orderstatus").isin("F", "O")
            & (F.col("o_totalprice") > 1000.0)
            & F.col("o_orderpriority").like("1%")
        )
        .select("o_orderkey", "o_orderstatus", "o_orderpriority")
        .orderBy("o_orderkey")
        .limit(100)
    )


def q03(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6 null/presence validation as a violation count (expectation core)."""
    t = load_tables(spark, sf_dir)
    return (
        t.events.where(F.col("value").isNull() | F.col("props").isNull())
        .agg(F.count(F.lit(1)).alias("n_bad"))
    )


def q04(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 equi inner join; nation is tiny → Catalyst auto-broadcasts."""
    t = load_tables(spark, sf_dir)
    return (
        t.customer.join(t.nation, t.customer.c_nationkey == t.nation.n_nationkey)
        .select("c_custkey", "n_name")
        .orderBy("c_custkey")
        .limit(100)
    )


def q05(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-way broadcast join + grouped agg + rounding (A-family)."""
    t = load_tables(spark, sf_dir)
    return (
        t.customer.join(
            F.broadcast(t.nation), t.customer.c_nationkey == t.nation.n_nationkey
        )
        .join(F.broadcast(t.region), t.nation.n_regionkey == t.region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.sum("c_acctbal"), 2).alias("bal"),
        )
        .orderBy("r_name", "n_name")
    )


def q06(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join + F14 coalesce default."""
    t = load_tables(spark, sf_dir)
    return (
        t.orders.join(t.customer, t.orders.o_custkey == t.customer.c_custkey, "left")
        .select(
            "o_orderkey", F.coalesce("c_name", F.lit("UNKNOWN")).alias("cname")
        )
        .orderBy("o_orderkey")
        .limit(100)
    )


def q07(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5 existence semantics → left-semi join (no row duplication)."""
    t = load_tables(spark, sf_dir)
    return (
        t.customer.join(
            t.orders, t.customer.c_custkey == t.orders.o_custkey, "left_semi"
        )
        .select("c_custkey")
        .orderBy("c_custkey")
        .limit(100)
    )


def q08(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5 absence semantics → left-anti join against a filtered build side."""
    t = load_tables(spark, sf_dir)
    urgent = t.orders.where(F.col("o_orderpriority") == "1-URGENT")
    return (
        t.customer.join(
            urgent, t.customer.c_custkey == urgent.o_custkey, "left_anti"
        )
        .select("c_custkey")
        .orderBy("c_custkey")
        .limit(100)
    )


def q09(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A grouped agg, TPC-H Q1 style: partial→final HashAggregate."""
    t = load_tables(spark, sf_dir)
    return (
        t.lineitem.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.avg("l_extendedprice"), 2).alias("avg_price"),
            F.max("l_shipdate").cast("date").alias("last_ship"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 freshness: per-key max(ts) vs a global cutoff (DNS_Requests
    analog, dags/DNS_Requests.py:129-136). The scalar subquery becomes a
    broadcast 1-row cross join — no driver round-trip, no full-shuffle."""
    t = load_tables(spark, sf_dir)
    cutoff = t.events.agg(
        (F.max("ts") - F.expr("INTERVAL 1 HOUR")).alias("cutoff_ts")
    )
    return (
        t.events.groupBy("user_id")
        .agg(F.max("ts").alias("max_ts"))
        .join(F.broadcast(cutoff))
        .where(F.col("max_ts") < F.col("cutoff_ts"))
        .select(
            "user_id", F.date_trunc("second", "max_ts").alias("last_seen")
        )
        .orderBy("user_id")
    )


def q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P9 threshold violations (Speedtest analog, dags/Speedtest.py:91-96)."""
    t = load_tables(spark, sf_dir)
    return (
        t.events.where((F.col("event_type") == "error") & (F.col("value") < 10.0))
        .select("event_id", "user_id", F.round("value", 2).alias("v"))
        .orderBy("event_id")
    )


def q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1 last-event-per-key ranking (querylog limit=1 analog)."""
    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        t.events.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", "event_id")
        .orderBy("user_id")
    )


def q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2 lag analytic — inter-event deltas per key."""
    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        t.events.select(
            "user_id",
            "event_id",
            F.round(F.col("value") - F.lag("value").over(w), 2).alias("delta"),
        )
        .orderBy("user_id", "event_id")
        .limit(200)
    )


def q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3 tumbling hourly buckets (batch form of window(ts, '1 hour'))."""
    t = load_tables(spark, sf_dir)
    return (
        t.events.groupBy(
            F.date_trunc("hour", "ts").alias("h"), F.col("event_type")
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("h", "event_type")
    )


def q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T3 top-k → TakeOrderedAndProject (no global sort materialized)."""
    t = load_tables(spark, sf_dir)
    return (
        t.orders.select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
    )


def q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set op UNION (distinct) — Cloudflare_Apps ip-merge analog."""
    t = load_tables(spark, sf_dir)
    return (
        t.customer.select(F.col("c_nationkey").alias("k"))
        .union(t.supplier.select(F.col("s_nationkey").alias("k")))
        .distinct()
        .orderBy("k")
    )


def q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set op INTERSECT."""
    t = load_tables(spark, sf_dir)
    return (
        t.customer.select(F.col("c_nationkey").alias("k"))
        .intersect(t.supplier.select(F.col("s_nationkey").alias("k")))
        .orderBy("k")
    )


def q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set op EXCEPT (distinct) — F-custkeys minus P-custkeys."""
    t = load_tables(spark, sf_dir)
    f_keys = t.orders.where(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("k")
    )
    p_keys = t.orders.where(F.col("o_orderstatus") == "P").select(
        F.col("o_custkey").alias("k")
    )
    return f_keys.subtract(p_keys).orderBy("k").limit(100)


def q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2/F3/F4 string functions + case-insensitive match."""
    t = load_tables(spark, sf_dir)
    return (
        t.part.where(F.lower(F.col("p_name")).like("%a%"))
        .select(
            "p_partkey",
            F.upper(F.substring("p_name", 1, 5)).alias("head"),
            F.length("p_name").alias("n_len"),
            F.concat(F.col("p_brand"), F.lit(":"), F.col("p_type")).alias("tag"),
        )
        .orderBy("p_partkey")
        .limit(100)
    )


def _event_category():
    return (
        F.when(F.col("event_type").isin("click", "view"), "engagement")
        .when(F.col("event_type") == "purchase", "revenue")
        .when(F.col("event_type") == "signup", "growth")
        .otherwise("ops")
    )


def q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P12 CASE conditional mapping (Cloudflare_Apps match/case analog,
    dags/Cloudflare_Apps.py:79-90)."""
    t = load_tables(spark, sf_dir)
    return (
        t.events.groupBy(_event_category().alias("category"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("category")
    )


def q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F8 tolerant cast (Speedtest float() try/except analog)."""
    t = load_tables(spark, sf_dir)
    return (
        t.events.where(F.col("event_type").try_cast("double").isNull())
        .agg(F.count(F.lit(1)).alias("n_noncastable"))
    )


def q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P8/K4 retention cutoff (Airflow_Cleanup analog) — scalar cutoff as
    a broadcast 1-row join."""
    t = load_tables(spark, sf_dir)
    cutoff = t.events.agg(
        (F.max("ts") - F.expr("INTERVAL 7 DAY")).alias("cutoff_ts")
    )
    return (
        t.events.join(F.broadcast(cutoff))
        .where(F.col("ts") < F.col("cutoff_ts"))
        .select("event_id")
        .orderBy("event_id")
        .limit(100)
    )


def q23(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 ratio aggregate (disk-usage percentage analog)."""
    t = load_tables(spark, sf_dir)
    return t.orders.agg(
        F.round(
            100.0
            * F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0))
            / F.count(F.lit(1)),
            2,
        ).alias("pct_f")
    )


def q24(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count distinct (exact)."""
    t = load_tables(spark, sf_dir)
    return t.orders.agg(F.countDistinct("o_custkey").alias("n_cust"))


def q25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping sets; NULLS LAST pinned (Spark/DuckDB divergence)."""
    t = load_tables(spark, sf_dir)
    return (
        t.nation.join(
            F.broadcast(t.region), t.nation.n_regionkey == t.region.r_regionkey
        )
        .rollup("r_name", "n_name")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(
            F.col("r_name").asc_nulls_last(), F.col("n_name").asc_nulls_last()
        )
    )


def q26(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LLM op: key-based exact dedup on documents (12-char text prefix).
    Group-min keeps one representative per duplicate group — the scalable
    dedup shape (map-side partial agg, shuffle only the 12-char key)."""
    t = load_tables(spark, sf_dir)
    return (
        t.documents.groupBy(F.substring("text", 1, 12).alias("pfx"))
        .agg(
            F.min("doc_id").alias("keep_id"), F.count(F.lit(1)).alias("n_copies")
        )
        .where(F.col("n_copies") > 1)
        .select("keep_id", "n_copies")
        .orderBy("keep_id")
    )


def q27(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LLM op: text stats per language (corpus profiling). The mean is
    attested as the exact integer pair (sum_chars, docs) — avg =
    sum/docs is derivable, but hashing the rounded quotient put a
    value exactly on a %.2f rounding tie (tie_audit class fix)."""
    t = load_tables(spark, sf_dir)
    return (
        t.documents.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("docs"),
            F.sum("n_chars").alias("sum_chars"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
        )
        .orderBy("lang")
    )


def q28(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F15 date-part aggregation (monthly revenue buckets)."""
    t = load_tables(spark, sf_dir)
    return (
        t.orders.groupBy(
            F.year("o_orderdate").cast("long").alias("y"),
            F.month("o_orderdate").cast("long").alias("m"),
        )
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
        .orderBy("y", "m")
    )


def q29(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 two-step lookup join (get_dns_zone_id analog,
    plugins/cloudflare/cloudflare_api.py:11-30): scalar lookups become
    broadcast 1-row joins, not driver collects."""
    t = load_tables(spark, sf_dir)
    min_region = t.region.agg(F.min("r_name").alias("r_name"))
    region_key = t.region.join(F.broadcast(min_region), "r_name").select(
        "r_regionkey"
    )
    return (
        t.nation.join(
            F.broadcast(region_key),
            t.nation.n_regionkey == region_key.r_regionkey,
            "left_semi",
        )
        .select("n_nationkey", "n_name")
        .orderBy("n_nationkey")
    )


def q30(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3/P9 per-key threshold verdict (Speedtest per-device analog)."""
    t = load_tables(spark, sf_dir)
    return (
        t.events.groupBy("user_id")
        .agg(
            F.when(F.min("value") >= 5.0, "ok").otherwise("below").alias("verdict")
        )
        .orderBy("user_id")
    )


def q31(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 analog: 6-way join (lineitem⋈orders⋈customer⋈supplier⋈
    nation⋈region) with the local-supplier predicate
    (c_nationkey = s_nationkey), one-year date window, revenue per
    nation. The join-order/AQE stress query: two fact tables, four
    broadcastable dims."""
    t = load_tables(spark, sf_dir)
    first_region = t.region.agg(F.min("r_name").alias("r_name"))
    return (
        t.customer.join(t.orders, t.customer.c_custkey == t.orders.o_custkey)
        .join(t.lineitem, t.orders.o_orderkey == t.lineitem.l_orderkey)
        .join(
            t.supplier,
            (t.lineitem.l_suppkey == t.supplier.s_suppkey)
            & (t.customer.c_nationkey == t.supplier.s_nationkey),
        )
        .join(F.broadcast(t.nation), t.customer.c_nationkey == t.nation.n_nationkey)
        .join(F.broadcast(t.region), t.nation.n_regionkey == t.region.r_regionkey)
        .join(F.broadcast(first_region), "r_name", "left_semi")
        .where(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), "n_name")
    )


def q32(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 analog: shipping-priority top-10 — segment-filtered
    customers, open orders before a cutoff, late-shipped lineitems,
    revenue per order, top-10."""
    t = load_tables(spark, sf_dir)
    return (
        t.customer.where(F.col("c_mktsegment") == "BUILDING")
        .join(t.orders, t.customer.c_custkey == t.orders.o_custkey)
        .join(t.lineitem, t.orders.o_orderkey == t.lineitem.l_orderkey)
        .where(
            (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_shipdate") > F.lit("1997-06-01").cast("timestamp"))
        )
        .groupBy("l_orderkey", F.col("o_orderdate").cast("date").alias("odate"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select("l_orderkey", "revenue", "odate")
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


def q33(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 analog (volume shipping): revenue flowing between the
    nation pair (NATION_0, NATION_1) in either direction, by supplier
    nation × customer nation × ship year. Two fact joins + two aliased
    broadcast nation dims — the classic self-joined-dimension shape."""
    t = load_tables(spark, sf_dir)
    n1 = t.nation.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = t.nation.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    return (
        t.supplier.join(
            t.lineitem, t.supplier.s_suppkey == t.lineitem.l_suppkey
        )
        .join(t.orders, t.lineitem.l_orderkey == t.orders.o_orderkey)
        .join(t.customer, t.orders.o_custkey == t.customer.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .where(
            (
                (F.col("supp_nation") == "NATION_0")
                & (F.col("cust_nation") == "NATION_1")
            )
            | (
                (F.col("supp_nation") == "NATION_1")
                & (F.col("cust_nation") == "NATION_0")
            )
        )
        .where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


def q34(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 analog (returned items): revenue lost to returns
    (l_returnflag = 'R') per customer over one quarter of orders,
    top-20 — fact⋈fact⋈dim with a broadcast nation lookup and
    TakeOrdered top-k."""
    t = load_tables(spark, sf_dir)
    return (
        t.customer.join(t.orders, t.customer.c_custkey == t.orders.o_custkey)
        .join(t.lineitem, t.orders.o_orderkey == t.lineitem.l_orderkey)
        .join(
            F.broadcast(t.nation),
            t.customer.c_nationkey == t.nation.n_nationkey,
        )
        .where(
            (F.col("o_orderdate") >= F.lit("1996-10-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_returnflag") == "R")
        )
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


def q35(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 analog (supplier-part relationship count): distinct
    suppliers per (brand, type) over the lineitem fact, excluding one
    brand and the promo type — grouped exact count(DISTINCT) with a
    broadcast part dim."""
    t = load_tables(spark, sf_dir)
    return (
        t.lineitem.join(
            F.broadcast(t.part), t.lineitem.l_partkey == t.part.p_partkey
        )
        .where((F.col("p_brand") != "Brand#1") & (F.col("p_type") != "PROMO"))
        .groupBy("p_brand", "p_type")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type")
    )


def q36(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 analog (large-volume orders): orders whose total
    quantity exceeds 300, joined back to their customer — the
    aggregate-then-rejoin (HAVING over a fact, fact⋈fact⋈dim) shape.
    Quantities are whole numbers stored as doubles, so the sum is
    order-independent and exact."""
    t = load_tables(spark, sf_dir)
    big = (
        t.lineitem.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .where(F.col("total_qty") > 300)
    )
    return (
        big.join(t.orders, big.l_orderkey == t.orders.o_orderkey)
        .join(t.customer, t.orders.o_custkey == t.customer.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("odate"),
            "o_totalprice",
            "total_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(100)
    )


def q37(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 analog (shipping-mode priority split): lines shipped
    more than 60 days after their order date, split per l_linestatus
    into high- vs low-priority order counts — the fact⋈fact join with
    CASE-conditional aggregation (one pass, map-side partial agg)."""
    t = load_tables(spark, sf_dir)
    high = F.col("o_orderpriority").startswith("1-") | F.col(
        "o_orderpriority"
    ).startswith("2-")
    return (
        t.lineitem.join(t.orders, t.lineitem.l_orderkey == t.orders.o_orderkey)
        .where(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


def q38(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 analog (promo revenue share): percentage of one
    quarter's lineitem revenue from PROMO-type parts — broadcast dim
    join feeding a conditional-ratio scalar aggregate."""
    t = load_tables(spark, sf_dir)
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        t.lineitem.join(
            F.broadcast(t.part), t.lineitem.l_partkey == t.part.p_partkey
        )
        .where(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
        )
        .agg(
            F.round(
                F.lit(100.0)
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
                / F.sum(rev),
                4,
            ).alias("promo_pct")
        )
    )


def q39(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 analog (disjunctive predicate join): revenue from
    three OR-of-AND brand/size/quantity bands — the predicate shape
    that exercises OR pushdown through a join without falling back to
    a cartesian plan."""
    t = load_tables(spark, sf_dir)
    q = F.col("l_quantity")
    band1 = (
        (F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15)
        & q.between(1, 20)
    )
    band2 = (
        (F.col("p_brand") == "Brand#2") & F.col("p_size").between(10, 30)
        & q.between(10, 30)
    )
    band3 = (
        (F.col("p_brand") == "Brand#3") & F.col("p_size").between(20, 50)
        & q.between(20, 40)
    )
    return (
        t.lineitem.join(
            F.broadcast(t.part), t.lineitem.l_partkey == t.part.p_partkey
        )
        .where(band1 | band2 | band3)
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


def q40(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 analog (global sales opportunity): customers with
    above-average positive balances and no orders, grouped by a
    derived country code — scalar subquery + anti join + grouped agg."""
    t = load_tables(spark, sf_dir)
    pos_avg = t.customer.where(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("__avg_bal")
    )
    return (
        t.customer.join(F.broadcast(pos_avg))
        .where(F.col("c_acctbal") > F.col("__avg_bal"))
        .join(
            t.orders,
            t.customer.c_custkey == t.orders.o_custkey,
            "left_anti",
        )
        .groupBy((F.col("c_nationkey") % 5).cast("long").alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )


def q41(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 analog (small-quantity revenue): lineitems under half
    their part's average quantity, total extended price / 7 — the
    aggregate-then-rejoin correlated shape on the JOIN KEY (complement
    of op_above_own_avg's window decorrelation)."""
    t = load_tables(spark, sf_dir)
    part_avg = t.lineitem.groupBy("l_partkey").agg(
        F.avg("l_quantity").alias("__avg_qty")
    )
    return (
        t.lineitem.join(
            part_avg.withColumnRenamed("l_partkey", "__pk"),
            F.col("l_partkey") == F.col("__pk"),
        )
        .where(F.col("l_quantity") < 0.5 * F.col("__avg_qty"))
        .agg(
            F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly")
        )
    )


def q42(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 analog (national market share): NATION_0 suppliers'
    share of revenue sold into region MIN(r_name)'s customer market,
    per order year — two fact joins, two aliased nation dims, a
    conditional-ratio aggregate over a broadcast-pruned market."""
    t = load_tables(spark, sf_dir)
    first_region = t.region.agg(F.min("r_name").alias("r_name"))
    cust_nation = (
        t.nation.join(
            F.broadcast(t.region), t.nation.n_regionkey == t.region.r_regionkey
        )
        .join(F.broadcast(first_region), "r_name", "left_semi")
        .select(F.col("n_nationkey").alias("c_nk"))
    )
    supp_nation = t.nation.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        t.lineitem.join(t.orders, t.lineitem.l_orderkey == t.orders.o_orderkey)
        .join(t.customer, t.orders.o_custkey == t.customer.c_custkey)
        .join(F.broadcast(cust_nation), t.customer.c_nationkey == F.col("c_nk"))
        .join(t.supplier, t.lineitem.l_suppkey == t.supplier.s_suppkey)
        .join(F.broadcast(supp_nation), F.col("s_nationkey") == F.col("s_nk"))
        .where(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(
                    F.when(F.col("supp_nation") == "NATION_0", rev).otherwise(0.0)
                )
                / F.sum(rev),
                6,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


def q43(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 analog (top supplier view): per-supplier revenue over
    one quarter; return the supplier(s) equal to the maximum — the
    aggregate-view + scalar-max-subquery shape."""
    t = load_tables(spark, sf_dir)
    rev = (
        t.lineitem.where(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("total_revenue")
        )
    )
    mx = rev.agg(F.max("total_revenue").alias("__mx"))
    return (
        rev.join(F.broadcast(mx))
        .where(F.col("total_revenue") == F.col("__mx"))
        .join(t.supplier, rev.l_suppkey == t.supplier.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


def q44(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 analog (suppliers who kept orders waiting): on
    multi-supplier orders where EXACTLY ONE supplier shipped late
    (> 60 days after the order date), charge that supplier; top-20 by
    count. The multi-EXISTS shape folded into one grouped pass over
    the order's lineitems — no correlated subqueries, no re-scans."""
    t = load_tables(spark, sf_dir)
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY")
    # two stacked groupBys instead of two COUNT(DISTINCT) aggregates:
    # multiple distinct aggs expand the input (one replica per agg)
    # before the shuffle — the (order, supplier) pre-aggregation gets
    # the same answer with ONE pass and no Expand, ~2x faster here
    # ONE exchange feeds both stacked groupBys: hash-partitioning on
    # l_orderkey satisfies the (l_orderkey, l_suppkey) clustering of
    # the first aggregate AND the l_orderkey clustering of the second,
    # so neither inserts its own shuffle (guide-§2.4 exchange sharing;
    # plan: 3 Exchanges -> 2)
    per_supp = (
        t.lineitem.join(t.orders, t.lineitem.l_orderkey == t.orders.o_orderkey)
        .repartition("l_orderkey")
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max(late.cast("int")).alias("__late"))
    )
    per_order = (
        per_supp.groupBy("l_orderkey")
        .agg(
            F.count(F.lit(1)).alias("n_supp"),
            F.sum("__late").alias("n_late_supp"),
            F.min(
                F.when(F.col("__late") == 1, F.col("l_suppkey"))
            ).alias("late_supp"),
        )
        .where((F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1))
    )
    return (
        per_order.groupBy("late_supp")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .join(
            t.supplier, per_order.late_supp == t.supplier.s_suppkey
        )
        .select("s_name", "numwait")
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )


def q45(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 analog (excess PROMO suppliers): suppliers whose
    total shipped quantity of PROMO-type parts in 1997 exceeded 100 —
    the agg-filtered semi-join chain (part dim → lineitem agg →
    supplier semi join)."""
    t = load_tables(spark, sf_dir)
    promo_parts = t.part.where(F.col("p_type") == "PROMO").select("p_partkey")
    heavy = (
        t.lineitem.join(
            F.broadcast(promo_parts),
            t.lineitem.l_partkey == F.col("p_partkey"),
            "left_semi",
        )
        .where(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .where(F.col("qty") > 100)
        .select("l_suppkey")
    )
    return (
        t.supplier.join(
            heavy, t.supplier.s_suppkey == heavy.l_suppkey, "left_semi"
        )
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


def q46(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 analog (min-cost supplier): the testdata has no
    partsupp table, so the supply cost is DERIVED — min observed unit
    price per (part, supplier) from lineitem — and the classic
    correlated min-subquery is decorrelated into a per-part window
    rank (rn=1 by cost, tie → smallest supplier). Region-restricted
    supplier side via two broadcast dim hops."""
    t = load_tables(spark, sf_dir)
    eu_supp = (
        t.supplier.join(
            F.broadcast(t.nation),
            t.supplier.s_nationkey == t.nation.n_nationkey,
        )
        .join(
            F.broadcast(t.region.where(F.col("r_name") == "EUROPE")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("s_suppkey", "s_name")
    )
    small_parts = t.part.where(F.col("p_size") < 10).select(
        "p_partkey", "p_name"
    )
    cost = (
        t.lineitem.join(
            F.broadcast(small_parts),
            t.lineitem.l_partkey == F.col("p_partkey"),
        )
        .join(eu_supp, t.lineitem.l_suppkey == F.col("s_suppkey"))
        .groupBy("p_partkey", "p_name", "s_suppkey", "s_name")
        .agg(
            F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias(
                "unit_cost"
            )
        )
    )
    w = Window.partitionBy("p_partkey").orderBy(
        F.col("unit_cost").asc(), F.col("s_suppkey").asc()
    )
    return (
        cost.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "p_partkey",
            "p_name",
            "s_suppkey",
            "s_name",
            # tie-safe attestation: unit_cost is ONE correctly-rounded
            # IEEE division (bit-identical cross-engine), so exact
            # power-of-two fixed point has no rounding-tie surface —
            # round(x, 2) landed values exactly on a %.2f tie
            F.floor(F.col("unit_cost") * F.lit(float(2**20))).alias(
                "unit_cost_fp"
            ),
        )
        .orderBy("p_partkey")
        .limit(100)
    )


def q47(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 analog (product-line profit by nation and year):
    name-LIKE part filter → lineitem ⋈ orders ⋈ supplier ⋈ nation,
    profit = Σ price·(1−discount) grouped by (nation, order year).
    Dims broadcast; the only big⋈big join is lineitem⋈orders on the
    shuffle key both sides already aggregate on."""
    t = load_tables(spark, sf_dir)
    widget_parts = t.part.where(F.col("p_name").contains("widget")).select(
        "p_partkey"
    )
    return (
        t.lineitem.join(
            F.broadcast(widget_parts),
            t.lineitem.l_partkey == F.col("p_partkey"),
            "left_semi",
        )
        .join(t.orders, t.lineitem.l_orderkey == t.orders.o_orderkey)
        .join(
            F.broadcast(t.supplier),
            t.lineitem.l_suppkey == t.supplier.s_suppkey,
        )
        .join(
            F.broadcast(t.nation),
            t.supplier.s_nationkey == t.nation.n_nationkey,
        )
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(
            # profit in exact 1e-4 units via pure integer arithmetic:
            # price and discount are 2-decimal data, so round(x·100)
            # recovers their exact cents (the product is within ulps
            # of an integer — never at a .5 tie), and the BIGINT sum
            # of cents_p·(100−cents_d) is EXACT at any scale — no FP
            # accumulation for a rounding boundary to flake on, unlike
            # round(sum, 2), which landed sums exactly on a %.2f tie
            F.sum(
                F.round(F.col("l_extendedprice") * 100, 0).cast("long")
                * (
                    F.lit(100)
                    - F.round(F.col("l_discount") * 100, 0).cast("long")
                )
            ).alias("profit_dm")
        )
        .orderBy("nation", F.col("o_year").desc())
    )


def q48(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 analog (important stock): per-part lineitem value vs
    a GLOBAL total threshold — the scalar subquery becomes a broadcast
    1-row cross join, so the big side is scanned once per aggregate,
    never collected."""
    t = load_tables(spark, sf_dir)
    per_part = t.lineitem.groupBy("l_partkey").agg(
        F.sum("l_extendedprice").alias("value")
    )
    total = per_part.agg(
        F.sum("value").alias("grand_total")
    )  # 1 row -> broadcast
    return (
        per_part.join(F.broadcast(total))
        .where(F.col("value") > F.col("grand_total") * 0.001)
        .select("l_partkey", F.round("value", 2).alias("value"))
        .orderBy(F.col("value").desc(), F.col("l_partkey"))
        .limit(100)
    )


def q49(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 analog (customer order-count distribution): LEFT
    join so zero-order customers keep count 0 (count of a null-keyed
    column, not count(*)), then the distribution of counts — two
    stacked aggregations, no windows."""
    t = load_tables(spark, sf_dir)
    per_cust = (
        t.customer.join(
            t.orders,
            t.customer.c_custkey == t.orders.o_custkey,
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


def q50(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 analog (order-priority checking): orders placed in 1997
    with at least one LATE lineitem (shipped > 30 days after the order
    date), counted per priority — the grouped-EXISTS shape as one semi
    join on the orderkey both sides already hash on."""
    t = load_tables(spark, sf_dir)
    orders_97 = t.orders.where(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    late = orders_97.join(
        t.lineitem,
        (t.lineitem.l_orderkey == orders_97.o_orderkey)
        & (
            t.lineitem.l_shipdate
            > orders_97.o_orderdate + F.expr("INTERVAL 30 DAYS")
        ),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


def q51(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 analog (forecast revenue change): one tight scan —
    every predicate reaches the parquet reader as a pushed filter, the
    aggregate is a single map-side-combined sum, no joins, no shuffle
    beyond the 1-row final combine."""
    t = load_tables(spark, sf_dir)
    return t.lineitem.where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.02)
        & (F.col("l_discount") <= 0.06)
        & (F.col("l_quantity") < 25)
    ).agg(
        F.round(
            F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2
        ).alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


# ---------------------------------------------------------------------------
# Oracle SQL (single text valid in Spark SQL AND DuckDB; SURVEY.md §2.12)
# ---------------------------------------------------------------------------

ORACLE_SQL: dict[str, str] = {
    "q01": """
SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
FROM lineitem ORDER BY l_orderkey, l_linenumber LIMIT 100
""",
    "q02": """
SELECT o_orderkey, o_orderstatus, o_orderpriority
FROM orders
WHERE o_orderstatus IN ('F','O') AND o_totalprice > 1000.0
  AND o_orderpriority LIKE '1%'
ORDER BY o_orderkey LIMIT 100
""",
    "q03": """
SELECT count(*) AS n_bad FROM events WHERE value IS NULL OR props IS NULL
""",
    "q04": """
SELECT c.c_custkey, n.n_name
FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
ORDER BY c.c_custkey LIMIT 100
""",
    "q05": """
SELECT r.r_name, n.n_name, count(*) AS cnt, round(sum(c.c_acctbal), 2) AS bal
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name, n.n_name
ORDER BY r.r_name, n.n_name
""",
    "q06": """
SELECT o.o_orderkey, coalesce(c.c_name, 'UNKNOWN') AS cname
FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
ORDER BY o.o_orderkey LIMIT 100
""",
    "q07": """
SELECT c_custkey FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
ORDER BY c_custkey LIMIT 100
""",
    "q08": """
SELECT c_custkey FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT')
ORDER BY c_custkey LIMIT 100
""",
    "q09": """
SELECT l_returnflag, l_linestatus, count(*) AS cnt,
       round(sum(l_quantity), 2) AS sum_qty,
       round(avg(l_extendedprice), 2) AS avg_price,
       cast(max(l_shipdate) AS DATE) AS last_ship
FROM lineitem
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
""",
    "q10": """
SELECT user_id, date_trunc('second', max(ts)) AS last_seen
FROM events
GROUP BY user_id
HAVING max(ts) < (SELECT max(ts) - INTERVAL 1 HOUR FROM events)
ORDER BY user_id
""",
    "q11": """
SELECT event_id, user_id, round(value, 2) AS v
FROM events
WHERE event_type = 'error' AND value < 10.0
ORDER BY event_id
""",
    "q12": """
SELECT user_id, event_id
FROM (SELECT user_id, event_id,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events) t
WHERE rn = 1
ORDER BY user_id
""",
    "q13": """
SELECT user_id, event_id,
       round(value - lag(value) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id), 2) AS delta
FROM events
ORDER BY user_id, event_id LIMIT 200
""",
    "q14": """
SELECT date_trunc('hour', ts) AS h, event_type, count(*) AS cnt
FROM events
GROUP BY date_trunc('hour', ts), event_type
ORDER BY h, event_type
""",
    "q15": """
SELECT o_orderkey, o_totalprice
FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
""",
    "q16": """
SELECT c_nationkey AS k FROM customer
UNION SELECT s_nationkey FROM supplier ORDER BY k
""",
    "q17": """
SELECT c_nationkey AS k FROM customer
INTERSECT SELECT s_nationkey FROM supplier ORDER BY k
""",
    "q18": """
SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'F'
EXCEPT SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
ORDER BY k LIMIT 100
""",
    "q19": """
SELECT p_partkey, upper(substr(p_name, 1, 5)) AS head,
       length(p_name) AS n_len, p_brand || ':' || p_type AS tag
FROM part
WHERE lower(p_name) LIKE '%a%'
ORDER BY p_partkey LIMIT 100
""",
    "q20": """
SELECT CASE event_type WHEN 'click' THEN 'engagement'
                       WHEN 'view' THEN 'engagement'
                       WHEN 'purchase' THEN 'revenue'
                       WHEN 'signup' THEN 'growth'
                       ELSE 'ops' END AS category,
       count(*) AS cnt
FROM events
GROUP BY CASE event_type WHEN 'click' THEN 'engagement'
                         WHEN 'view' THEN 'engagement'
                         WHEN 'purchase' THEN 'revenue'
                         WHEN 'signup' THEN 'growth'
                         ELSE 'ops' END
ORDER BY category
""",
    "q21": """
SELECT count(*) AS n_noncastable
FROM events WHERE try_cast(event_type AS DOUBLE) IS NULL
""",
    "q22": """
SELECT event_id FROM events
WHERE ts < (SELECT max(ts) - INTERVAL 7 DAY FROM events)
ORDER BY event_id LIMIT 100
""",
    "q23": """
SELECT round(100.0 * sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
             / count(*), 2) AS pct_f
FROM orders
""",
    "q24": """
SELECT count(DISTINCT o_custkey) AS n_cust FROM orders
""",
    "q25": """
SELECT r_name, n_name, count(*) AS cnt
FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY ROLLUP(r_name, n_name)
ORDER BY r_name NULLS LAST, n_name NULLS LAST
""",
    "q26": """
SELECT min(doc_id) AS keep_id, count(*) AS n_copies
FROM documents GROUP BY substr(text, 1, 12) HAVING count(*) > 1
ORDER BY keep_id
""",
    "q27": """
SELECT lang, count(*) AS docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars,
       min(n_chars) AS min_chars, max(n_chars) AS max_chars
FROM documents GROUP BY lang ORDER BY lang
""",
    "q28": """
SELECT extract(year FROM o_orderdate) AS y,
       extract(month FROM o_orderdate) AS m,
       count(*) AS cnt, round(sum(o_totalprice), 2) AS total
FROM orders
GROUP BY extract(year FROM o_orderdate), extract(month FROM o_orderdate)
ORDER BY y, m
""",
    "q29": """
SELECT n_nationkey, n_name FROM nation
WHERE n_regionkey = (SELECT r_regionkey FROM region
                     WHERE r_name = (SELECT min(r_name) FROM region))
ORDER BY n_nationkey
""",
    "q30": """
SELECT user_id,
       CASE WHEN min(value) >= 5.0 THEN 'ok' ELSE 'below' END AS verdict
FROM events GROUP BY user_id ORDER BY user_id
""",
    "q31": """
SELECT n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = (SELECT min(r_name) FROM region)
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n_name
ORDER BY revenue DESC, n_name
""",
    "q32": """
SELECT l_orderkey,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       CAST(o_orderdate AS DATE) AS odate
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01'
  AND l_shipdate > TIMESTAMP '1997-06-01'
GROUP BY l_orderkey, CAST(o_orderdate AS DATE)
ORDER BY revenue DESC, l_orderkey LIMIT 10
""",
    "q33": """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       year(l_shipdate) AS l_year,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM supplier
JOIN lineitem ON s_suppkey = l_suppkey
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE ((n1.n_name = 'NATION_0' AND n2.n_name = 'NATION_1')
    OR (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_0'))
  AND l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY n1.n_name, n2.n_name, year(l_shipdate)
ORDER BY supp_nation, cust_nation, l_year
""",
    "q34": """
SELECT c_custkey, c_name, c_acctbal, n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
JOIN nation ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1996-10-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey LIMIT 20
""",
    "q35": """
SELECT p_brand, p_type,
       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
GROUP BY p_brand, p_type
ORDER BY supplier_cnt DESC, p_brand, p_type
""",
    "q36": """
SELECT c_name, c_custkey, o_orderkey,
       CAST(o_orderdate AS DATE) AS odate, o_totalprice, total_qty
FROM (SELECT l_orderkey, sum(l_quantity) AS total_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING sum(l_quantity) > 300) big
JOIN orders ON big.l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY o_totalprice DESC, o_orderkey LIMIT 100
""",
    "q37": """
SELECT l_linestatus,
       CAST(sum(CASE WHEN o_orderpriority LIKE '1-%'
                       OR o_orderpriority LIKE '2-%' THEN 1 ELSE 0 END)
            AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority LIKE '1-%'
                       OR o_orderpriority LIKE '2-%' THEN 0 ELSE 1 END)
            AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
GROUP BY l_linestatus
ORDER BY l_linestatus
""",
    "q38": """
SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO'
                              THEN l_extendedprice * (1 - l_discount)
                              ELSE 0.0 END)
             / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate < TIMESTAMP '1997-04-01'
""",
    "q39": """
SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 1 AND 20)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
       AND l_quantity BETWEEN 10 AND 30)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50
       AND l_quantity BETWEEN 20 AND 40)
""",
    "q40": """
SELECT CAST(c_nationkey % 5 AS BIGINT) AS cntrycode,
       CAST(count(*) AS BIGINT) AS numcust,
       round(sum(c_acctbal), 2) AS totacctbal
FROM customer
WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0.0)
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY c_nationkey % 5
ORDER BY cntrycode
""",
    "q41": """
SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
FROM lineitem
JOIN (SELECT l_partkey AS pk, avg(l_quantity) AS avg_qty
      FROM lineitem GROUP BY l_partkey) pa
  ON l_partkey = pa.pk
WHERE l_quantity < 0.5 * avg_qty
""",
    "q42": """
SELECT year(o_orderdate) AS o_year,
       round(sum(CASE WHEN sn.n_name = 'NATION_0'
                      THEN l_extendedprice * (1 - l_discount)
                      ELSE 0.0 END)
             / sum(l_extendedprice * (1 - l_discount)), 6) AS mkt_share
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
JOIN region ON cn.n_regionkey = r_regionkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
WHERE r_name = (SELECT min(r_name) FROM region)
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY year(o_orderdate)
ORDER BY o_year
""",
    "q43": """
WITH rev AS (SELECT l_suppkey,
                    round(sum(l_extendedprice * (1 - l_discount)), 2)
                      AS total_revenue
             FROM lineitem
             WHERE l_shipdate >= TIMESTAMP '1997-01-01'
               AND l_shipdate < TIMESTAMP '1997-04-01'
             GROUP BY l_suppkey)
SELECT s_suppkey, s_name, total_revenue
FROM rev JOIN supplier ON l_suppkey = s_suppkey
WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
ORDER BY s_suppkey
""",
    "q44": """
WITH po AS (
  SELECT l_orderkey,
         count(DISTINCT l_suppkey) AS n_supp,
         count(DISTINCT CASE WHEN l_shipdate > o_orderdate
                                  + INTERVAL 60 DAY
                             THEN l_suppkey END) AS n_late_supp,
         min(CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
                  THEN l_suppkey END) AS late_supp
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  GROUP BY l_orderkey)
SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
FROM po JOIN supplier ON late_supp = s_suppkey
WHERE n_supp >= 2 AND n_late_supp = 1
GROUP BY s_name
ORDER BY numwait DESC, s_name LIMIT 20
""",
    "q45": """
SELECT s_suppkey, s_name
FROM supplier
WHERE s_suppkey IN (
  SELECT l_suppkey FROM lineitem
  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_type = 'PROMO')
    AND l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate < TIMESTAMP '1998-01-01'
  GROUP BY l_suppkey
  HAVING sum(l_quantity) > 100)
ORDER BY s_suppkey
""",
    "q46": """
WITH eu AS (
  SELECT s_suppkey, s_name
  FROM supplier s
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  WHERE r.r_name = 'EUROPE'),
cost AS (
  SELECT p.p_partkey, p.p_name, eu.s_suppkey, eu.s_name,
         min(l.l_extendedprice / l.l_quantity) AS unit_cost
  FROM lineitem l
  JOIN part p ON l.l_partkey = p.p_partkey AND p.p_size < 10
  JOIN eu ON l.l_suppkey = eu.s_suppkey
  GROUP BY p.p_partkey, p.p_name, eu.s_suppkey, eu.s_name),
r AS (
  SELECT p_partkey, p_name, s_suppkey, s_name, unit_cost,
         row_number() OVER (PARTITION BY p_partkey
                            ORDER BY unit_cost ASC, s_suppkey ASC) AS rn
  FROM cost)
SELECT p_partkey, p_name, s_suppkey, s_name,
       CAST(floor(unit_cost * 1048576.0) AS BIGINT) AS unit_cost_fp
FROM r WHERE rn = 1 ORDER BY p_partkey LIMIT 100
""",
    "q47": """
SELECT n.n_name AS nation,
       CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
       CAST(sum(CAST(round(l.l_extendedprice * 100, 0) AS BIGINT)
                * (100 - CAST(round(l.l_discount * 100, 0) AS BIGINT)))
            AS BIGINT) AS profit_dm
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
WHERE l.l_partkey IN
  (SELECT p_partkey FROM part WHERE p_name LIKE '%widget%')
GROUP BY nation, o_year
ORDER BY nation, o_year DESC
""",
    "q48": """
WITH pp AS (SELECT l_partkey, sum(l_extendedprice) AS value
            FROM lineitem GROUP BY l_partkey)
SELECT l_partkey, round(value, 2) AS value
FROM pp
WHERE value > (SELECT sum(value) FROM pp) * 0.001
ORDER BY round(value, 2) DESC, l_partkey LIMIT 100
""",
    "q49": """
WITH pc AS (
  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
  FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
  GROUP BY c.c_custkey)
SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
FROM pc GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
""",
    "q50": """
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
  AND o.o_orderdate < TIMESTAMP '1998-01-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY)
GROUP BY o_orderpriority ORDER BY o_orderpriority
""",
    "q51": """
SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
       CAST(count(*) AS BIGINT) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
  AND l_discount >= 0.02 AND l_discount <= 0.06
  AND l_quantity < 25
""",
}

RELATIONAL_QUERIES: dict[str, QueryFn] = {
    "q01": q01, "q02": q02, "q03": q03, "q04": q04, "q05": q05,
    "q06": q06, "q07": q07, "q08": q08, "q09": q09, "q10": q10,
    "q11": q11, "q12": q12, "q13": q13, "q14": q14, "q15": q15,
    "q16": q16, "q17": q17, "q18": q18, "q19": q19, "q20": q20,
    "q21": q21, "q22": q22, "q23": q23, "q24": q24, "q25": q25,
    "q26": q26, "q27": q27, "q28": q28, "q29": q29, "q30": q30,
    "q31": q31, "q32": q32, "q33": q33, "q34": q34, "q35": q35,
    "q36": q36, "q37": q37, "q38": q38, "q39": q39, "q40": q40,
    "q41": q41, "q42": q42, "q43": q43, "q44": q44, "q45": q45,
    "q46": q46, "q47": q47, "q48": q48, "q49": q49, "q50": q50,
    "q51": q51,
}
