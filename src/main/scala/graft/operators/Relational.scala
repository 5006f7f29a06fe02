package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

/** Relational operator surface: scans+pushdown, joins (inner/outer/semi/
  * anti/broadcast/multi-way), aggregations (grouped, rollup, cube, grouping
  * sets, distinct), window functions (rank, running, lag/lead), sorts,
  * top-k, and set operations.
  *
  * The reference (govau/cga-logs-to-kinesis) implements none of these —
  * see SURVEY.md §2.5: capability parity is delivered by Spark built-ins,
  * declared here as an enumerable catalog the driver verifies against
  * DuckDB.
  *
  * Scale notes (100 TB): every query below is a declarative plan — Catalyst
  * pushes filters/projections into the parquet scan, chooses
  * broadcast-hash vs sort-merge joins by size, and AQE re-plans skew at
  * runtime. Dimension tables (region/nation/part/supplier) are explicitly
  * broadcast where the fact side dominates; fact-fact joins shuffle on the
  * join key only after pushdown has reduced the scan.
  */
object Relational {
  import Exact._

  def defs: Seq[QueryDef] = Seq(q01, q02, q03, q04, q05, q06, q07, q08, q09,
    q10, q11, q12, q13, q14, q15, q16, q17)

  /** TPC-H Q1-style pricing summary: grouped aggregation with partial
    * (map-side) aggregation — the canonical scan→partial-agg→shuffle→final
    * shape. At 100 TB the shuffle carries only |groups|×|partitions| rows.
    */
  val q01: QueryDef = QueryDef.checked(
    "q01_pricing_summary",
    """SELECT l_returnflag, l_linestatus,
      | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base,
      | CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
      | CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
      | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
      | COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-12-01 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") <= lit("1998-12-01 00:00:00").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum2(col("l_quantity")).as("sum_qty"),
        sum2(col("l_extendedprice")).as("sum_base"),
        sum4(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
        sum6(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax"))).as("sum_charge"),
        (sum2(col("l_quantity")) / count(lit(1))).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** TPC-H Q6-style: selective filter fully pushed to the parquet scan
    * (check `PushedFilters` in explain) + single global aggregate.
    */
  val q02: QueryDef = QueryDef.checked(
    "q02_filter_revenue",
    s"""SELECT ${sql4("l_extendedprice * l_discount")} AS revenue, COUNT(*) AS n
       |FROM lineitem
       |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
       |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
       |  AND l_discount BETWEEN 0.03 AND 0.07 AND l_quantity < 25.0""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1996-01-01 00:00:00").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01 00:00:00").cast("timestamp") &&
        col("l_discount").between(0.03, 0.07) && col("l_quantity") < 25.0)
      .agg(sum4(col("l_extendedprice") * col("l_discount")).as("revenue"),
        count(lit(1)).as("n"))
  }

  /** TPC-H Q3-style: fact-fact-dim 3-way join + grouped agg + top-10.
    * customer is small relative to the facts → broadcast; orders⋈lineitem
    * shuffles on the order key. Top-k after agg is a TakeOrdered physical
    * op (no full sort at scale).
    */
  val q03: QueryDef = QueryDef.checked(
    "q03_shipping_priority",
    s"""SELECT o_orderkey, CAST(o_orderdate AS DATE) AS order_date,
       | ${sql4("l_extendedprice * (1.0 - l_discount)")} AS revenue
       |FROM customer JOIN orders ON c_custkey = o_custkey
       | JOIN lineitem ON l_orderkey = o_orderkey
       |WHERE c_mktsegment = 'BUILDING'
       |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
       |  AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
       |GROUP BY o_orderkey, CAST(o_orderdate AS DATE)
       |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin) { (s, d) =>
    val cust = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
    val ord = Tables.orders(s, d)
      .filter(col("o_orderdate") < lit("1998-01-01 00:00:00").cast("timestamp"))
    val li = Tables.lineitem(s, d)
      .filter(col("l_shipdate") > lit("1998-01-01 00:00:00").cast("timestamp"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy(col("o_orderkey"), col("o_orderdate").cast("date").as("order_date"))
      .agg(sum4(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderkey"))
      .limit(10)
  }

  /** Left-semi join (EXISTS): orders having at least one returned line.
    * Semi join keeps the build side to keys only — at scale this is a
    * shuffled semi with map-side dedup of the right side.
    */
  val q04: QueryDef = QueryDef.checked(
    "q04_semi_join",
    """SELECT o_orderpriority, COUNT(*) AS n
      |FROM orders o
      |WHERE EXISTS (SELECT 1 FROM lineitem l
      |              WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) { (s, d) =>
    Tables.orders(s, d)
      .join(Tables.lineitem(s, d).filter(col("l_returnflag") === "R"),
        col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
      .orderBy(col("o_orderpriority"))
  }

  /** Left-anti join (NOT EXISTS): customers that never placed an urgent
    * order (the plain no-orders variant is empty in this data — every
    * customer has orders — so the predicate keeps the check non-vacuous).
    */
  val q05: QueryDef = QueryDef.checked(
    "q05_anti_join",
    """SELECT c_mktsegment, COUNT(*) AS n_no_orders
      |FROM customer c
      |WHERE NOT EXISTS (SELECT 1 FROM orders o
      |                  WHERE o.o_custkey = c.c_custkey
      |                    AND o.o_orderpriority = '1-URGENT')
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin) { (s, d) =>
    Tables.customer(s, d)
      .join(Tables.orders(s, d).filter(col("o_orderpriority") === "1-URGENT"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n_no_orders"))
      .orderBy(col("c_mktsegment"))
  }

  /** Left-outer join preserving customers with zero orders. */
  val q06: QueryDef = QueryDef.checked(
    "q06_outer_join",
    """SELECT c_custkey, COUNT(o_orderkey) AS n_orders,
      | CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 0) AS DOUBLE) AS total_spent
      |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin) { (s, d) =>
    Tables.customer(s, d)
      .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("n_orders"),
        coalesce(sum(dec2(col("o_totalprice"))), lit(0).cast(DecimalType(18, 2)))
          .cast("double").as("total_spent"))
      .orderBy(col("c_custkey"))
  }

  /** Explicit broadcast join: fact lineitem ⋈ dim part. At 100 TB part
    * stays broadcast-able (dims grow slowly); no shuffle of the fact side.
    */
  val q07: QueryDef = QueryDef.checked(
    "q07_broadcast_join",
    s"""SELECT p_brand, ${sql2("l_quantity")} AS sum_qty, COUNT(*) AS n
       |FROM lineitem JOIN part ON l_partkey = p_partkey
       |GROUP BY p_brand ORDER BY p_brand""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .join(broadcast(Tables.part(s, d)), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(sum2(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))
      .orderBy(col("p_brand"))
  }

  /** TPC-H Q5-style 6-way join: region⋈nation⋈customer⋈orders⋈lineitem⋈
    * supplier with the local-supplier condition. Dims broadcast, facts
    * shuffle once on the order key.
    */
  val q08: QueryDef = QueryDef.checked(
    "q08_local_supplier_revenue",
    s"""SELECT r_name, n_name,
       | ${sql4("l_extendedprice * (1.0 - l_discount)")} AS revenue
       |FROM region JOIN nation ON n_regionkey = r_regionkey
       | JOIN customer ON c_nationkey = n_nationkey
       | JOIN orders ON o_custkey = c_custkey
       | JOIN lineitem ON l_orderkey = o_orderkey
       | JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
       |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin) { (s, d) =>
    val joined = Tables.lineitem(s, d)
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.supplier(s, d)),
        col("l_suppkey") === col("s_suppkey") && col("s_nationkey") === col("c_nationkey"))
      .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
    joined.groupBy(col("r_name"), col("n_name"))
      .agg(sum4(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
      .orderBy(col("r_name"), col("n_name"))
  }

  /** Window rank: top-3 orders per customer by price (row_number ≤ k =
    * the scalable per-group top-k; no global sort).
    */
  val q09: QueryDef = QueryDef.checked(
    "q09_window_topk_per_group",
    """SELECT o_custkey, o_orderkey, rnk FROM (
      |  SELECT o_custkey, o_orderkey,
      |    row_number() OVER (PARTITION BY o_custkey
      |                       ORDER BY o_totalprice DESC, o_orderkey) AS rnk
      |  FROM orders) t
      |WHERE rnk <= 3 ORDER BY o_custkey, rnk""".stripMargin) { (s, d) =>
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"), row_number().over(w).as("rnk"))
      .filter(col("rnk") <= 3)
      .orderBy(col("o_custkey"), col("rnk"))
  }

  /** Running (cumulative) window aggregate per supplier over ship order. */
  val q10: QueryDef = QueryDef.checked(
    "q10_window_running_sum",
    """SELECT l_suppkey, l_orderkey, l_linenumber,
      | CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) OVER (
      |   PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber
      |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_qty
      |FROM lineitem WHERE l_suppkey < 5
      |ORDER BY l_suppkey, l_orderkey, l_linenumber""".stripMargin) { (s, d) =>
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.lineitem(s, d).filter(col("l_suppkey") < 5)
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        sum(dec2(col("l_quantity"))).over(w).cast("double").as("running_qty"))
      .orderBy(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"))
  }

  /** lag/lead over an event stream keyed by user (sessionized deltas). */
  val q11: QueryDef = QueryDef.checked(
    "q11_window_lag_lead",
    """SELECT user_id, event_id,
      |  value - lag(value) OVER w AS delta_value,
      |  lead(event_type) OVER w AS next_type
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |ORDER BY user_id, event_id""".stripMargin) { (s, d) =>
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(s, d)
      .select(col("user_id"), col("event_id"),
        (col("value") - lag(col("value"), 1).over(w)).as("delta_value"),
        lead(col("event_type"), 1).over(w).as("next_type"))
      .orderBy(col("user_id"), col("event_id"))
  }

  /** ROLLUP hierarchy totals (segment → nation → grand total). */
  val q12: QueryDef = QueryDef.checked(
    "q12_rollup",
    """SELECT c_mktsegment, c_nationkey, COUNT(*) AS n,
      | CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
      |FROM customer GROUP BY ROLLUP(c_mktsegment, c_nationkey)
      |ORDER BY c_mktsegment NULLS FIRST, c_nationkey NULLS FIRST""".stripMargin) { (s, d) =>
    Tables.customer(s, d)
      .rollup(col("c_mktsegment"), col("c_nationkey"))
      .agg(count(lit(1)).as("n"), sum2(col("c_acctbal")).as("sum_bal"))
      .orderBy(col("c_mktsegment").asc_nulls_first, col("c_nationkey").asc_nulls_first)
  }

  /** CUBE over two order dimensions. */
  val q13: QueryDef = QueryDef.checked(
    "q13_cube",
    """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
      | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
      |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin) { (s, d) =>
    Tables.orders(s, d)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), sum2(col("o_totalprice")).as("sum_price"))
      .orderBy(col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)
  }

  /** GROUPING SETS (SQL-only surface, exercised through spark.sql). */
  val q14: QueryDef = QueryDef.checked(
    "q14_grouping_sets",
    """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
      |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin) { (s, d) =>
    Tables.orders(s, d).createOrReplaceTempView("orders")
    s.sql(
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin)
  }

  /** Exact distinct aggregation across tables (COUNT(DISTINCT) expands to
    * a two-phase aggregate in Catalyst; the cross join of two scalar aggs
    * is a 1×1 broadcast nested loop — trivial at any scale).
    */
  val q15: QueryDef = QueryDef.checked(
    "q15_distinct",
    """SELECT (SELECT COUNT(*) FROM (SELECT DISTINCT c_nationkey, c_mktsegment FROM customer) t) AS n_pairs,
      | COUNT(DISTINCT o_custkey) AS n_cust, COUNT(*) AS n_orders
      |FROM orders""".stripMargin) { (s, d) =>
    val pairs = Tables.customer(s, d)
      .select(col("c_nationkey"), col("c_mktsegment")).distinct()
      .agg(count(lit(1)).as("n_pairs"))
    val ords = Tables.orders(s, d)
      .agg(countDistinct(col("o_custkey")).as("n_cust"), count(lit(1)).as("n_orders"))
    pairs.crossJoin(ords)
  }

  /** Set operations: EXCEPT / INTERSECT / UNION (distinct semantics) over
    * two derived key sets.
    */
  val q16: QueryDef = QueryDef.checked(
    "q16_set_ops",
    """WITH big AS (SELECT o_custkey AS k FROM orders
      |             GROUP BY o_custkey HAVING SUM(CAST(o_totalprice AS DECIMAL(18,2))) > 500000),
      |     bld AS (SELECT c_custkey AS k FROM customer WHERE c_mktsegment = 'BUILDING')
      |SELECT 'except' AS op, COUNT(*) AS n FROM (SELECT k FROM big EXCEPT SELECT k FROM bld) t
      |UNION ALL
      |SELECT 'intersect' AS op, COUNT(*) AS n FROM (SELECT k FROM big INTERSECT SELECT k FROM bld) t
      |UNION ALL
      |SELECT 'union' AS op, COUNT(*) AS n FROM (SELECT k FROM big UNION SELECT k FROM bld) t
      |ORDER BY op""".stripMargin) { (s, d) =>
    import s.implicits._
    val big = Tables.orders(s, d).groupBy(col("o_custkey"))
      .agg(sum(dec2(col("o_totalprice"))).as("tot"))
      .filter(col("tot") > 500000).select(col("o_custkey").as("k"))
    val bld = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey").as("k"))
    val ex = big.except(bld).agg(count(lit(1)).as("n")).withColumn("op", lit("except"))
    val in = big.intersect(bld).agg(count(lit(1)).as("n")).withColumn("op", lit("intersect"))
    val un = big.union(bld).distinct().agg(count(lit(1)).as("n")).withColumn("op", lit("union"))
    ex.unionByName(in).unionByName(un).select($"op", $"n").orderBy($"op")
  }

  /** Global top-k: ORDER BY + LIMIT → TakeOrderedAndProject (heap per
    * partition + driver merge of k rows — no full sort, scale-safe).
    */
  val q17: QueryDef = QueryDef.checked(
    "q17_global_topk",
    """SELECT o_orderkey, o_custkey, o_totalprice
      |FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""".stripMargin) { (s, d) =>
    Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(20)
  }
}
