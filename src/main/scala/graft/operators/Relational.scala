package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.QueryDef
import graft.sources.Tables

/** Relational / analytic query suite — the generic engine surface a
  * MapReduce user (reference: /root/reference/src/KMeans.java's job
  * pipeline) gets when moving to Spark SQL.
  *
  * Scale posture: dimension tables (region/nation/supplier/customer)
  * are broadcast into fact joins; fact aggregations rely on
  * partial (map-side) aggregation; every scan is parquet with
  * pushed filters + pruned columns. Doubles are rounded identically
  * in the Spark plan and the DuckDB oracle so hash comparison is
  * immune to FP summation-order noise.
  */
object Relational {

  private def r2(c: Column): Column = round(c, 2)

  /** TPC-H Q1 (pricing summary): filter → groupBy → 8 aggregates.
    * Partial aggregation makes this a single shuffle of ~|groups|.
    */
  val q1Pricing: QueryDef = QueryDef.sql(
    "q1_pricing",
    """SELECT l_returnflag, l_linestatus,
      |  round(sum(l_quantity), 2) AS sum_qty,
      |  round(sum(l_extendedprice), 2) AS sum_base_price,
      |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
      |  round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
      |  round(avg(l_quantity), 3) AS avg_qty,
      |  round(avg(l_extendedprice), 3) AS avg_price,
      |  round(avg(l_discount), 5) AS avg_disc,
      |  count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        r2(sum(col("l_quantity"))).as("sum_qty"),
        r2(sum(col("l_extendedprice"))).as("sum_base_price"),
        r2(sum(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("sum_disc_price"),
        r2(sum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax")))).as("sum_charge"),
        round(avg(col("l_quantity")), 3).as("avg_qty"),
        round(avg(col("l_extendedprice")), 3).as("avg_price"),
        round(avg(col("l_discount")), 5).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** TPC-H Q3 shape: 3-way join + agg + top-10. customer is
    * broadcast (dimension at any SF ratio); orders⋈lineitem
    * shuffles on the order key.
    */
  val q3Revenue: QueryDef = QueryDef.sql(
    "q3_revenue",
    """SELECT o_orderkey,
      |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
      |  o_orderdate
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '1998-01-01'
      |GROUP BY o_orderkey, o_orderdate
      |ORDER BY revenue DESC, o_orderkey
      |LIMIT 10""".stripMargin) { (s, d) =>
    val cust = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
    val ord = Tables.orders(s, d).filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
    val li = Tables.lineitem(s, d)
    li.join(broadcast(cust.join(ord, col("c_custkey") === col("o_custkey"))
        .select("o_orderkey", "o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderkey"), col("o_orderdate"))
      .agg(r2(sum(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("revenue"))
      .select(col("o_orderkey"), col("revenue"), col("o_orderdate"))
      .orderBy(col("revenue").desc, col("o_orderkey"))
      .limit(10)
  }

  /** TPC-H Q5 shape: 6-way join through the region→nation star.
    * All dimensions broadcast; lineitem is the only big side.
    */
  val q5Region: QueryDef = QueryDef.sql(
    "q5_region",
    """SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
      |FROM region
      |JOIN nation ON n_regionkey = r_regionkey
      |JOIN customer ON c_nationkey = n_nationkey
      |JOIN orders ON o_custkey = c_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
      |WHERE r_name = 'ASIA'
      |GROUP BY n_name
      |ORDER BY revenue DESC, n_name""".stripMargin) { (s, d) =>
    val dims = Tables.region(s, d).filter(col("r_name") === "ASIA")
      .join(Tables.nation(s, d), col("n_regionkey") === col("r_regionkey"))
      .join(Tables.customer(s, d), col("c_nationkey") === col("n_nationkey"))
      .join(Tables.orders(s, d), col("o_custkey") === col("c_custkey"))
      .select("o_orderkey", "n_name", "c_nationkey")
    Tables.lineitem(s, d)
      .join(broadcast(Tables.supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
      .join(dims, col("l_orderkey") === col("o_orderkey") &&
        col("s_nationkey") === col("c_nationkey"))
      .groupBy(col("n_name"))
      .agg(r2(sum(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  /** Global top-k with deterministic tie-break: Spark plans this as
    * TakeOrderedAndProject (per-partition top-k, no full sort).
    */
  val qTopK: QueryDef = QueryDef.sql(
    "q_topk",
    """SELECT o_orderkey, o_totalprice
      |FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey
      |LIMIT 15""".stripMargin) { (s, d) =>
    Tables.orders(s, d)
      .select("o_orderkey", "o_totalprice")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(15)
  }

  /** Latest order per customer via row_number window. */
  val qWindowRank: QueryDef = QueryDef.sql(
    "q_window_rank",
    """SELECT o_custkey, o_orderkey, o_totalprice FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    row_number() OVER (PARTITION BY o_custkey
      |                       ORDER BY o_orderdate DESC, o_orderkey) AS rn
      |  FROM orders) t
      |WHERE rn = 1
      |ORDER BY o_custkey""".stripMargin) { (s, d) =>
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").desc, col("o_orderkey"))
    Tables.orders(s, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("o_custkey", "o_orderkey", "o_totalprice")
      .orderBy(col("o_custkey"))
  }

  /** Running cumulative sum over a unique total order per supplier.
    * Prefix-ordered FP addition is deterministic on both engines.
    */
  val qRunningSum: QueryDef = QueryDef.sql(
    "q_running_sum",
    """SELECT l_suppkey, l_orderkey, l_linenumber,
      |  round(sum(l_quantity) OVER (
      |    PARTITION BY l_suppkey
      |    ORDER BY l_shipdate, l_orderkey, l_linenumber
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_qty
      |FROM lineitem
      |WHERE l_suppkey <= 5
      |ORDER BY l_suppkey, l_orderkey, l_linenumber""".stripMargin) { (s, d) =>
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.lineitem(s, d)
      .filter(col("l_suppkey") <= 5)
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        r2(sum(col("l_quantity")).over(w)).as("running_qty"))
      .orderBy(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"))
  }

  /** Multi-column distinct aggregation. */
  val qDistinct: QueryDef = QueryDef.sql(
    "q_distinct",
    """SELECT count(DISTINCT l_partkey) AS n_parts,
      |  count(DISTINCT l_suppkey) AS n_supps,
      |  count(DISTINCT l_orderkey) AS n_orders
      |FROM lineitem""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d).agg(
      countDistinct(col("l_partkey")).as("n_parts"),
      countDistinct(col("l_suppkey")).as("n_supps"),
      countDistinct(col("l_orderkey")).as("n_orders"))
  }

  /** ROLLUP grouping sets (subtotals + grand total). */
  val qRollup: QueryDef = QueryDef.sql(
    "q_rollup",
    """SELECT coalesce(l_returnflag, 'ALL') AS rf,
      |  coalesce(l_linestatus, 'ALL') AS ls,
      |  round(sum(l_quantity), 2) AS sum_qty,
      |  count(*) AS n
      |FROM lineitem
      |GROUP BY ROLLUP(l_returnflag, l_linestatus)
      |ORDER BY rf, ls""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(r2(sum(col("l_quantity"))).as("sum_qty"), count(lit(1)).as("n"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
        coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
        col("sum_qty"), col("n"))
      .orderBy(col("rf"), col("ls"))
  }

  /** Left-semi join (EXISTS): customers having at least one open order. */
  val qSemiJoin: QueryDef = QueryDef.sql(
    "q_semi_join",
    """SELECT c_custkey, c_name FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders
      |              WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
      |ORDER BY c_custkey""".stripMargin) { (s, d) =>
    Tables.customer(s, d)
      .join(Tables.orders(s, d).filter(col("o_orderstatus") === "O"),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .select("c_custkey", "c_name")
      .orderBy(col("c_custkey"))
  }

  /** Left-anti join (NOT EXISTS): customers with no order since 2000. */
  val qAntiJoin: QueryDef = QueryDef.sql(
    "q_anti_join",
    """SELECT c_custkey, c_name FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
      |                  AND o_orderdate >= TIMESTAMP '2000-01-01')
      |ORDER BY c_custkey""".stripMargin) { (s, d) =>
    Tables.customer(s, d)
      .join(Tables.orders(s, d)
          .filter(col("o_orderdate") >= lit("2000-01-01").cast("timestamp")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")
      .orderBy(col("c_custkey"))
  }

  /** UNION ALL across heterogeneous sources. */
  val qUnion: QueryDef = QueryDef.sql(
    "q_union",
    """SELECT n_nationkey AS key, n_name AS name, 'nation' AS src FROM nation
      |UNION ALL
      |SELECT r_regionkey AS key, r_name AS name, 'region' AS src FROM region
      |ORDER BY src, key""".stripMargin) { (s, d) =>
    Tables.nation(s, d)
      .select(col("n_nationkey").cast("int").as("key"), col("n_name").as("name"),
        lit("nation").as("src"))
      .unionByName(Tables.region(s, d)
        .select(col("r_regionkey").cast("int").as("key"), col("r_name").as("name"),
          lit("region").as("src")))
      .orderBy(col("src"), col("key"))
  }

  /** Post-aggregation filter (HAVING) on a rounded measure so the
    * predicate is FP-stable across engines.
    */
  val qHaving: QueryDef = QueryDef.sql(
    "q_having",
    """SELECT l_partkey, round(sum(l_quantity), 2) AS total_qty
      |FROM lineitem
      |GROUP BY l_partkey
      |HAVING round(sum(l_quantity), 2) > 400
      |ORDER BY l_partkey""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .groupBy(col("l_partkey"))
      .agg(r2(sum(col("l_quantity"))).as("total_qty"))
      .filter(col("total_qty") > 400)
      .orderBy(col("l_partkey"))
  }

  /** Conditional (pivot-style) aggregation. */
  val qCaseAgg: QueryDef = QueryDef.sql(
    "q_case_agg",
    """SELECT l_returnflag,
      |  round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity ELSE 0 END), 2) AS qty_f,
      |  round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity ELSE 0 END), 2) AS qty_o,
      |  count(CASE WHEN l_discount > 0.05 THEN 1 END) AS n_discounted
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        r2(sum(when(col("l_linestatus") === "F", col("l_quantity")).otherwise(0))).as("qty_f"),
        r2(sum(when(col("l_linestatus") === "O", col("l_quantity")).otherwise(0))).as("qty_o"),
        count(when(col("l_discount") > 0.05, 1)).as("n_discounted"))
      .orderBy(col("l_returnflag"))
  }

  /** JSON field extraction from the events.props payload column. */
  val qJsonExtract: QueryDef = QueryDef.sql(
    "q_json_extract",
    """SELECT event_type,
      |  CAST(sum(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS sum_k,
      |  count(*) AS n
      |FROM events
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin) { (s, d) =>
    Tables.events(s, d)
      .groupBy(col("event_type"))
      .agg(
        sum(get_json_object(col("props"), "$.k").cast("long")).as("sum_k"),
        count(lit(1)).as("n"))
      .orderBy(col("event_type"))
  }

  val all: Seq[QueryDef] = Seq(
    q1Pricing, q3Revenue, q5Region, qTopK, qWindowRank, qRunningSum,
    qDistinct, qRollup, qSemiJoin, qAntiJoin, qUnion, qHaving,
    qCaseAgg, qJsonExtract)
}
