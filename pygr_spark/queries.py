"""Query catalog — the driver-facing surface.

Each entry is a pair: a Spark implementation (DataFrame-first, using
the pygr_spark operators) and an ANSI-SQL oracle string DuckDB runs on
the same parquet tables. The driver hash-compares them at sf0.01
(BASELINE.md §6.2), so both sides follow strict determinism rules:

  - monetary/metric aggregates are computed in integer cents
    (``round(x*100) -> bigint``) so sums are order-independent and
    exactly equal across engines;
  - every aggregate/computed column is aliased identically;
  - every numeric output is explicitly cast (DuckDB ``sum(bigint)``
    is HUGEINT, Spark's is long — always ``CAST(... AS BIGINT)``);
  - float outputs are derived from exact integers (ratios of ints) or
    rounded to a fixed scale on both sides;
  - no LIMIT without a total deterministic ORDER (top-k uses
    row_number with an id tiebreak).
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pygr_spark.operators.groupmerge import gap_merge
from pygr_spark.operators.overlap import overlap_join
from pygr_spark.operators.sweep import coverage_segments


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def read_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet carries TIMESTAMP(NANOS), which Spark's parquet
    reader rejects; read ns-as-long (runtime conf, safe to set in the
    driver's session too) and expose ``ts_sec`` (bigint, truncated) +
    ``ts_ts`` (timestamp at µs precision) alongside the raw ``ts`` ns.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ev = _t(spark, sf_dir, "events")
    return ev.withColumn(
        "ts_sec", F.expr("CAST(ts DIV 1000000000 AS BIGINT)")
    ).withColumn("ts_ts", F.timestamp_micros(F.expr("ts DIV 1000")))


def cents(col: F.Column) -> F.Column:
    """Exact integer cents for a money-valued double."""
    return F.round(col * 100, 0).cast("long")


# ---------------------------------------------------------------------------
# relational surface (TPC-H-ish; SURVEY.md §7.1 step 6)
# ---------------------------------------------------------------------------


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan-filter-agg with map-side partial agg."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("date"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(cents(F.col("l_quantity"))).cast("long").alias("sum_qty_c"),
            F.sum(cents(F.col("l_extendedprice"))).cast("long").alias("sum_base_c"),
            F.sum(
                cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            )
            .cast("long")
            .alias("sum_disc_c"),
            F.sum(
                cents(
                    F.col("l_extendedprice")
                    * (1 - F.col("l_discount"))
                    * (1 + F.col("l_tax"))
                )
            )
            .cast("long")
            .alias("sum_charge_c"),
            F.count(F.lit(1)).cast("long").alias("count_order"),
        )
    )


Q1_SQL = """
SELECT l_returnflag, l_linestatus,
  CAST(SUM(CAST(round(l_quantity*100) AS BIGINT)) AS BIGINT) AS sum_qty_c,
  CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS sum_base_c,
  CAST(SUM(CAST(round(l_extendedprice*(1-l_discount)*100) AS BIGINT)) AS BIGINT) AS sum_disc_c,
  CAST(SUM(CAST(round(l_extendedprice*(1-l_discount)*(1+l_tax)*100) AS BIGINT)) AS BIGINT) AS sum_charge_c,
  CAST(COUNT(*) AS BIGINT) AS count_order
FROM lineitem
WHERE CAST(l_shipdate AS DATE) <= DATE '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


def q5_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 5-way join; dims broadcast, fact tables SMJ."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .filter(cust.c_nationkey == supp.s_nationkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.sum(cents(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
            .cast("long")
            .alias("revenue_c"),
            F.count(F.lit(1)).cast("long").alias("n_items"),
        )
    )


Q5_SQL = """
SELECT n_name,
  CAST(SUM(CAST(round(l_extendedprice*(1-l_discount)*100) AS BIGINT)) AS BIGINT) AS revenue_c,
  CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON c_nationkey = n_nationkey
GROUP BY n_name
"""


def q_top_orders_per_cust(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group (O5/§2.5): row_number with deterministic tiebreak."""
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        orders.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 3)
        .select(
            "o_custkey",
            "o_orderkey",
            "rn",
            cents(F.col("o_totalprice")).alias("price_c"),
        )
    )


Q_TOPK_SQL = """
SELECT o_custkey, o_orderkey, CAST(rn AS BIGINT) AS rn, price_c FROM (
  SELECT o_custkey, o_orderkey,
    row_number() OVER (PARTITION BY o_custkey
                       ORDER BY o_totalprice DESC, o_orderkey) AS rn,
    CAST(round(o_totalprice*100) AS BIGINT) AS price_c
  FROM orders
) WHERE rn <= 3
"""


def q_market_share_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouping sets / cube (§2.4 'Spark provides natively')."""
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum(cents(F.col("o_totalprice"))).cast("long").alias("total_c"),
        )
        .select(
            F.coalesce(F.col("o_orderstatus"), F.lit("ALL")).alias("status"),
            F.coalesce(F.col("o_orderpriority"), F.lit("ALL")).alias("priority"),
            "n_orders",
            "total_c",
        )
    )


Q_CUBE_SQL = """
SELECT COALESCE(o_orderstatus, 'ALL') AS status,
       COALESCE(o_orderpriority, 'ALL') AS priority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS total_c
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


# ---------------------------------------------------------------------------
# pygr-capability layer exercised on driver tables
# ---------------------------------------------------------------------------

EPOCH = "1992-01-01"


def _order_ivals(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    start = F.datediff(F.col("o_orderdate").cast("date"), F.lit(EPOCH).cast("date"))
    return orders.select(
        (F.col("o_orderkey") % 97).cast("long").alias("id"),
        F.col("o_orderkey").alias("o_orderkey"),
        start.cast("long").alias("start"),
        (start + 1 + F.col("o_orderkey") % 13).cast("long").alias("stop"),
    )


def _lineitem_ivals(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    start = F.datediff(F.col("l_shipdate").cast("date"), F.lit(EPOCH).cast("date"))
    return li.select(
        (F.col("l_orderkey") % 97).cast("long").alias("id"),
        F.col("l_orderkey").alias("l_orderkey"),
        F.col("l_linenumber").cast("long").alias("l_linenumber"),
        start.cast("long").alias("start"),
        (start + 1 + F.col("l_partkey") % 7).cast("long").alias("stop"),
    )


_ORDER_IVALS_SQL = f"""
  SELECT CAST(o_orderkey % 97 AS BIGINT) AS id, o_orderkey,
         CAST(date_diff('day', DATE '{EPOCH}', CAST(o_orderdate AS DATE)) AS BIGINT) AS start,
         CAST(date_diff('day', DATE '{EPOCH}', CAST(o_orderdate AS DATE)) + 1 + o_orderkey % 13 AS BIGINT) AS stop
  FROM orders
"""

_LINEITEM_IVALS_SQL = f"""
  SELECT CAST(l_orderkey % 97 AS BIGINT) AS id, l_orderkey,
         CAST(l_linenumber AS BIGINT) AS l_linenumber,
         CAST(date_diff('day', DATE '{EPOCH}', CAST(l_shipdate AS DATE)) AS BIGINT) AS start,
         CAST(date_diff('day', DATE '{EPOCH}', CAST(l_shipdate AS DATE)) + 1 + l_partkey % 7 AS BIGINT) AS stop
  FROM lineitem
"""


def q_overlap_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1: interval overlap join (binned strategy — the scale path)."""
    left = _order_ivals(spark, sf_dir)
    right = _lineitem_ivals(spark, sf_dir)
    out = overlap_join(left, right, strategy="binned", bin_width=32)
    return out.select(
        F.col("id"),
        "o_orderkey",
        F.col("start").alias("o_start"),
        F.col("stop").alias("o_stop"),
        "l_orderkey",
        "l_linenumber",
        F.col("start_r").alias("l_start"),
        F.col("stop_r").alias("l_stop"),
    )


Q_OVERLAP_SQL = f"""
SELECT o.id, o.o_orderkey, o.start AS o_start, o.stop AS o_stop,
       l.l_orderkey, l.l_linenumber, l.start AS l_start, l.stop AS l_stop
FROM ({_ORDER_IVALS_SQL}) o
JOIN ({_LINEITEM_IVALS_SQL}) l
  ON o.id = l.id AND o.start < l.stop AND l.start < o.stop
"""


def q_sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 gap-merge in the time domain = sessionization (SURVEY §2.9)."""
    ev = read_events(spark, sf_dir)
    ivals = ev.select(
        F.col("user_id").alias("id"),
        F.col("ts_sec").alias("start"),
        (F.col("ts_sec") + 1).alias("stop"),
    )
    out = gap_merge(ivals, ["id"], maxgap=1800)
    return out.select(
        F.col("id").alias("user_id"),
        F.col("start").alias("session_start"),
        F.col("stop").alias("session_stop"),
        F.col("n_merged").cast("long").alias("n_events"),
    )


Q_SESSION_SQL = """
WITH e AS (
  SELECT user_id, CAST(epoch_ns(ts) // 1000000000 AS BIGINT) AS s FROM events
), flagged AS (
  SELECT user_id, s,
    CASE WHEN s - (MAX(s) OVER (PARTITION BY user_id ORDER BY s
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) + 1) > 1800
           OR (MAX(s) OVER (PARTITION BY user_id ORDER BY s
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)) IS NULL
         THEN 1 ELSE 0 END AS flag
  FROM e
), grp AS (
  SELECT user_id, s,
    SUM(flag) OVER (PARTITION BY user_id ORDER BY s
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS g
  FROM flagged
)
SELECT user_id, CAST(MIN(s) AS BIGINT) AS session_start,
       CAST(MAX(s) + 1 AS BIGINT) AS session_stop,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM grp GROUP BY user_id, g
"""


def q_coverage_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6 sweep: per-id segment coverage counts over derived intervals."""
    seg = coverage_segments(_order_ivals(spark, sf_dir), ["id"])
    return seg.select(
        "id",
        F.col("seg_start"),
        F.col("seg_stop"),
        F.col("coverage").cast("long").alias("coverage"),
    )


Q_COVERAGE_SQL = f"""
WITH iv AS ({_ORDER_IVALS_SQL}),
ev AS (
  SELECT id, start AS pos, 1 AS delta FROM iv
  UNION ALL
  SELECT id, stop AS pos, -1 AS delta FROM iv
), net AS (
  SELECT id, pos, SUM(delta) AS delta FROM ev GROUP BY id, pos
), seg AS (
  SELECT id, pos AS seg_start,
    LEAD(pos) OVER (PARTITION BY id ORDER BY pos) AS seg_stop,
    SUM(delta) OVER (PARTITION BY id ORDER BY pos
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS coverage
  FROM net
)
SELECT id, seg_start, seg_stop, CAST(coverage AS BIGINT) AS coverage
FROM seg WHERE seg_stop IS NOT NULL AND seg_stop > seg_start
"""


# ---------------------------------------------------------------------------
# LLM-pipeline operators (north star)
# ---------------------------------------------------------------------------


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: canonical doc per identical text (hash-groupBy)."""
    docs = _t(spark, sf_dir, "documents")
    return docs.groupBy("text").agg(
        F.min("doc_id").cast("long").alias("doc_id"),
        F.count(F.lit(1)).cast("long").alias("n_copies"),
    ).select("doc_id", "n_copies")


Q_DEDUP_SQL = """
SELECT CAST(MIN(doc_id) AS BIGINT) AS doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_copies
FROM documents GROUP BY text
"""


def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text quality stats: token/char counts per doc (north-star text analysis)."""
    docs = _t(spark, sf_dir, "documents").filter(F.length(F.trim("text")) > 0)
    toks = F.split(F.trim(F.col("text")), r"\s+")
    return docs.select(
        "doc_id",
        F.length("text").cast("long").alias("len_chars"),
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct_tokens"),
        (F.length("text") - F.length(F.regexp_replace("text", r"[.,!?;:]", "")))
        .cast("long")
        .alias("n_punct"),
    )


Q_TEXT_STATS_SQL = r"""
SELECT doc_id,
  CAST(length(text) AS BIGINT) AS len_chars,
  CAST(array_length(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tokens,
  CAST(array_length(list_distinct(regexp_split_to_array(trim(text), '\s+'))) AS BIGINT) AS n_distinct_tokens,
  CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS BIGINT) AS n_punct
FROM documents WHERE length(trim(text)) > 0
"""


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "q1_pricing_summary": q1_pricing_summary,
    "q5_revenue_by_nation": q5_revenue_by_nation,
    "top_orders_per_cust": q_top_orders_per_cust,
    "market_share_cube": q_market_share_cube,
    "overlap_join": q_overlap_join,
    "sessionize_events": q_sessionize_events,
    "coverage_segments": q_coverage_segments,
    "dedup_exact": q_dedup_exact,
    "text_stats": q_text_stats,
}

ORACLES: dict[str, str] = {
    "q1_pricing_summary": Q1_SQL,
    "q5_revenue_by_nation": Q5_SQL,
    "top_orders_per_cust": Q_TOPK_SQL,
    "market_share_cube": Q_CUBE_SQL,
    "overlap_join": Q_OVERLAP_SQL,
    "sessionize_events": Q_SESSION_SQL,
    "coverage_segments": Q_COVERAGE_SQL,
    "dedup_exact": Q_DEDUP_SQL,
    "text_stats": Q_TEXT_STATS_SQL,
}
