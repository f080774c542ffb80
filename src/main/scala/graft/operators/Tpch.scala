package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.QueryDef
import graft.sources.Tables

/** The remainder of the TPC-H-expressible analytic suite over the
  * available columns (no partsupp table; no commit/receipt dates —
  * late shipment is re-expressed as l_shipdate lag vs o_orderdate).
  * Together with Relational's Q1/Q3/Q5 shapes this completes the
  * classic decision-support surface: semi/anti correlated EXISTS
  * (Q4, Q21, Q22), scan-only range aggregation (Q6), cross-nation
  * volume stars (Q7, Q8), group-then-enrich top-N (Q10, Q18),
  * conditional CASE aggregation (Q12, Q14), outer-join histograms
  * (Q13), view + scalar-max (Q15), correlated scalar averages (Q17),
  * and disjunctive multi-table predicates (Q19).
  *
  * Scale posture mirrors Relational.scala: the only corpus-sized
  * shuffle in each plan is the orders⋈lineitem (or groupBy-key)
  * exchange; genuinely small relations (nation/region, per-supplier
  * or per-order aggregates, qualifying-key sets) are broadcast;
  * aggregation happens BEFORE enrichment joins wherever the group
  * key allows, so dimension joins see |groups| rows, not |corpus|.
  */
object Tpch {

  private def r2(c: Column): Column = round(c, 2)
  private def ts(s: String): Column = lit(s).cast("timestamp")

  /** Q6: pure scan aggregation under conjunctive range predicates —
    * every filter reaches the parquet reader (PushedFilters), no
    * join, no shuffle beyond the single-row final agg.
    */
  val q6Forecast: QueryDef = QueryDef.sql(
    "q6_forecast",
    """SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
      |  AND l_discount BETWEEN 0.02 AND 0.06 AND l_quantity < 24""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= ts("1996-01-01") && col("l_shipdate") < ts("1997-01-01") &&
        col("l_discount").between(0.02, 0.06) && col("l_quantity") < 24)
      .agg(r2(sum(col("l_extendedprice") * col("l_discount"))).as("revenue"))
  }

  /** Q4: orders with at least one late line (shipped > 90 days after
    * order date — the available-column spelling of commit<receipt).
    * The correlated EXISTS is one left-semi shuffle on the order key;
    * the date filter on orders is pushed to its scan.
    */
  val q4Priority: QueryDef = QueryDef.sql(
    "q4_priority",
    """SELECT o_orderpriority, count(*) AS order_count
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
      |  AND EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey
      |                AND l_shipdate > o_orderdate + INTERVAL 90 DAY)
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) { (s, d) =>
    val ord = Tables.orders(s, d)
      .filter(col("o_orderdate") >= ts("1996-01-01") && col("o_orderdate") < ts("1997-01-01"))
    val li = Tables.lineitem(s, d).select("l_orderkey", "l_shipdate")
    ord.join(li,
        col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS"),
        "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy(col("o_orderpriority"))
  }

  /** Q7: bilateral trade volume between two REGIONS by year (widened
    * from the classic nation pair so every SF populates both
    * directions). supplier+nation and customer+nation sides are
    * broadcast dimension stars; orders⋈lineitem is the one shuffle.
    */
  val q7Volume: QueryDef = QueryDef.sql(
    "q7_volume",
    """WITH v AS (
      |  SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
      |         year(l_shipdate) AS l_year,
      |         l_extendedprice * (1 - l_discount) AS volume
      |  FROM lineitem
      |  JOIN orders   ON l_orderkey = o_orderkey
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation ns ON s_nationkey = ns.n_nationkey
      |  JOIN nation nc ON c_nationkey = nc.n_nationkey
      |  WHERE ((ns.n_regionkey = 0 AND nc.n_regionkey = 1)
      |      OR (ns.n_regionkey = 1 AND nc.n_regionkey = 0))
      |    AND l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31')
      |SELECT supp_nation, cust_nation, l_year, round(sum(volume), 2) AS revenue
      |FROM v GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin) { (s, d) =>
    val nat = Tables.nation(s, d)
    val supp = Tables.supplier(s, d)
      .join(nat.select(col("n_nationkey"), col("n_name").as("supp_nation"),
        col("n_regionkey").as("supp_region")), col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey", "supp_nation", "supp_region")
    val cust = Tables.customer(s, d)
      .join(nat.select(col("n_nationkey").as("cn_key"), col("n_name").as("cust_nation"),
        col("n_regionkey").as("cust_region")), col("c_nationkey") === col("cn_key"))
      .select("c_custkey", "cust_nation", "cust_region")
    Tables.lineitem(s, d)
      .filter(col("l_shipdate").between(ts("1996-01-01"), ts("1997-12-31")))
      .join(Tables.orders(s, d).select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .filter((col("supp_region") === 0 && col("cust_region") === 1) ||
        (col("supp_region") === 1 && col("cust_region") === 0))
      .groupBy(col("supp_nation"), col("cust_nation"), year(col("l_shipdate")).as("l_year"))
      .agg(r2(sum(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("revenue"))
      .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
  }

  /** Q8: market share of region-0 suppliers among PROMO parts sold to
    * AMERICA customers, by order year. Seven-table star; every
    * dimension broadcasts, lineitem⋈orders is the one shuffle, and
    * the share is a conditional-over-total CASE aggregation.
    */
  val q8Mktshare: QueryDef = QueryDef.sql(
    "q8_mktshare",
    """WITH v AS (
      |  SELECT year(o_orderdate) AS o_year,
      |         l_extendedprice * (1 - l_discount) AS volume,
      |         ns.n_regionkey AS supp_region
      |  FROM lineitem
      |  JOIN orders   ON l_orderkey = o_orderkey
      |  JOIN part     ON l_partkey = p_partkey
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation nc ON c_nationkey = nc.n_nationkey
      |  JOIN region   ON nc.n_regionkey = r_regionkey
      |  JOIN nation ns ON s_nationkey = ns.n_nationkey
      |  WHERE r_name = 'AMERICA' AND p_type = 'PROMO'
      |    AND o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31')
      |SELECT o_year,
      |       round(sum(CASE WHEN supp_region = 0 THEN volume ELSE 0 END)
      |             / sum(volume), 6) AS mkt_share
      |FROM v GROUP BY o_year ORDER BY o_year""".stripMargin) { (s, d) =>
    val nat = Tables.nation(s, d)
    val amNation = nat
      .join(Tables.region(s, d).filter(col("r_name") === "AMERICA"),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey").as("am_nationkey"))
    val cust = Tables.customer(s, d)
      .join(broadcast(amNation), col("c_nationkey") === col("am_nationkey"))
      .select("c_custkey")
    val supp = Tables.supplier(s, d)
      .join(nat.select(col("n_nationkey").as("sn_key"), col("n_regionkey").as("supp_region")),
        col("s_nationkey") === col("sn_key"))
      .select("s_suppkey", "supp_region")
    val promo = Tables.part(s, d).filter(col("p_type") === "PROMO").select("p_partkey")
    val vol = col("l_extendedprice") * (lit(1) - col("l_discount"))
    Tables.lineitem(s, d)
      .join(Tables.orders(s, d)
          .filter(col("o_orderdate").between(ts("1996-01-01"), ts("1997-12-31")))
          .select("o_orderkey", "o_custkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(promo), col("l_partkey") === col("p_partkey"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy(year(col("o_orderdate")).as("o_year"))
      .agg(round(sum(when(col("supp_region") === 0, vol).otherwise(lit(0))) / sum(vol), 6)
        .as("mkt_share"))
      .orderBy(col("o_year"))
  }

  /** Q10: top returned-revenue customers in a quarter. Aggregation
    * runs FIRST (orders⋈lineitem shuffle → per-custkey revenue,
    * |active customers| rows), and only then joins the customer and
    * nation dimensions — enrichment never sees corpus-sized input.
    */
  val q10Returns: QueryDef = QueryDef.sql(
    "q10_returns",
    """SELECT c_custkey, c_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
      |       n_name
      |FROM customer
      |JOIN orders   ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |JOIN nation   ON c_nationkey = n_nationkey
      |WHERE o_orderdate >= TIMESTAMP '1996-07-01' AND o_orderdate < TIMESTAMP '1996-10-01'
      |  AND l_returnflag = 'R'
      |GROUP BY c_custkey, c_name, n_name
      |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin) { (s, d) =>
    val rev = Tables.lineitem(s, d).filter(col("l_returnflag") === "R")
      .join(Tables.orders(s, d)
          .filter(col("o_orderdate") >= ts("1996-07-01") && col("o_orderdate") < ts("1996-10-01"))
          .select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey"))
      .agg(r2(sum(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("revenue"))
    rev
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("c_name"), col("revenue"), col("n_name"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  /** Q12: shipping-lag buckets × priority class — conditional CASE
    * aggregation after the one orders⋈lineitem shuffle.
    */
  val q12Shiplag: QueryDef = QueryDef.sql(
    "q12_shiplag",
    """SELECT CASE WHEN datediff('day', o_orderdate, l_shipdate) < 30 THEN 'fast'
      |            WHEN datediff('day', o_orderdate, l_shipdate) < 90 THEN 'normal'
      |            ELSE 'slow' END AS lag_bucket,
      |       count(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 END) AS high_line_count,
      |       count(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 END) AS low_line_count
      |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
    val lag = datediff(col("l_shipdate"), col("o_orderdate"))
    val hi = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= ts("1996-01-01") && col("l_shipdate") < ts("1997-01-01"))
      .select("l_orderkey", "l_shipdate")
      .join(Tables.orders(s, d).select("o_orderkey", "o_orderdate", "o_orderpriority"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(when(lag < 30, "fast").when(lag < 90, "normal").otherwise("slow").as("lag_bucket"))
      .agg(sum(when(hi, 1).otherwise(0)).as("high_line_count"),
        sum(when(!hi, 1).otherwise(0)).as("low_line_count"))
      .orderBy(col("lag_bucket"))
  }

  /** Q13: customer order-count distribution — LEFT OUTER join with
    * an ON-clause filter (customers with zero qualifying orders must
    * survive with count 0), then a two-level aggregation whose second
    * level is histogram-sized.
    */
  val q13Custdist: QueryDef = QueryDef.sql(
    "q13_custdist",
    """WITH c_orders AS (
      |  SELECT c_custkey, count(o_orderkey) AS c_count
      |  FROM customer LEFT OUTER JOIN orders
      |    ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
      |  GROUP BY c_custkey)
      |SELECT c_count, count(*) AS custdist
      |FROM c_orders GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin) { (s, d) =>
    Tables.customer(s, d).select("c_custkey")
      .join(Tables.orders(s, d).select("o_custkey", "o_orderkey", "o_orderpriority"),
        col("c_custkey") === col("o_custkey") && col("o_orderpriority") =!= "5-LOW",
        "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  /** Q14: promo revenue share for one ship month — the part join is
    * column-pruned to (p_partkey, p_type); the month filter prunes
    * the lineitem scan before the join.
    */
  val q14Promo: QueryDef = QueryDef.sql(
    "q14_promo",
    """SELECT round(100.00 * sum(CASE WHEN p_type = 'PROMO'
      |                               THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
      |             / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_revenue
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE l_shipdate >= TIMESTAMP '1996-03-01' AND l_shipdate < TIMESTAMP '1996-04-01'""".stripMargin) { (s, d) =>
    val vol = col("l_extendedprice") * (lit(1) - col("l_discount"))
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= ts("1996-03-01") && col("l_shipdate") < ts("1996-04-01"))
      .join(Tables.part(s, d).select("p_partkey", "p_type"),
        col("l_partkey") === col("p_partkey"))
      .agg(round(lit(100.0) * sum(when(col("p_type") === "PROMO", vol).otherwise(lit(0))) /
        sum(vol), 4).as("promo_revenue"))
  }

  /** Q15: top supplier by quarterly revenue — the revenue "view" is a
    * per-suppkey aggregate (|suppliers| rows), its max is a window
    * over that tiny relation (never a second corpus pass), and the
    * supplier enrichment joins the filtered winners only.
    */
  val q15Topsupp: QueryDef = QueryDef.sql(
    "q15_topsupp",
    """WITH revenue AS (
      |  SELECT l_suppkey AS supplier_no,
      |         round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
      |  GROUP BY l_suppkey)
      |SELECT s_suppkey, s_name, total_revenue
      |FROM supplier JOIN revenue ON s_suppkey = supplier_no
      |WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
      |ORDER BY s_suppkey""".stripMargin) { (s, d) =>
    val revenue = Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= ts("1996-01-01") && col("l_shipdate") < ts("1996-04-01"))
      .groupBy(col("l_suppkey").as("supplier_no"))
      .agg(r2(sum(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("total_revenue"))
    val top = revenue
      .withColumn("max_rev", max(col("total_revenue")).over(Window.partitionBy()))
      .filter(col("total_revenue") === col("max_rev"))
    Tables.supplier(s, d)
      .join(broadcast(top), col("s_suppkey") === col("supplier_no"))
      .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
      .orderBy(col("s_suppkey"))
  }

  /** Q17: revenue from small-quantity lines of one brand, where
    * "small" is half that part's average quantity. The correlated
    * scalar average becomes a per-part aggregate over the
    * brand-restricted lineitem subset (broadcast back — O(|brand
    * parts|)), so the corpus is scanned once, not per part.
    */
  val q17Smallqty: QueryDef = QueryDef.sql(
    "q17_smallqty",
    """SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
      |FROM lineitem JOIN part ON p_partkey = l_partkey
      |WHERE p_brand = 'Brand#5'
      |  AND l_quantity < (SELECT 0.5 * avg(l_quantity) FROM lineitem
      |                    WHERE l_partkey = p_partkey)""".stripMargin) { (s, d) =>
    val brandParts = Tables.part(s, d).filter(col("p_brand") === "Brand#5").select("p_partkey")
    val li = Tables.lineitem(s, d).select("l_partkey", "l_quantity", "l_extendedprice")
      .join(broadcast(brandParts), col("l_partkey") === col("p_partkey"))
    val avgQty = li.groupBy(col("l_partkey").as("ap_key"))
      .agg((lit(0.5) * avg(col("l_quantity"))).as("half_avg"))
    li.join(broadcast(avgQty), col("l_partkey") === col("ap_key"))
      .filter(col("l_quantity") < col("half_avg"))
      .agg(round(sum(col("l_extendedprice")) / 7.0, 2).as("avg_yearly"))
  }

  /** Q18: large-volume orders — the HAVING aggregate produces the
    * qualifying key set (tiny by the threshold's nature), which
    * joins orders directly and carries its own total_qty, avoiding
    * the classic re-join + re-group of lineitem.
    */
  val q18Bigorders: QueryDef = QueryDef.sql(
    "q18_bigorders",
    """WITH qty AS (
      |  SELECT l_orderkey, sum(l_quantity) AS total_qty
      |  FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 150)
      |SELECT c_custkey, o_orderkey, o_orderdate, o_totalprice, total_qty
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN qty ON o_orderkey = l_orderkey
      |ORDER BY o_totalprice DESC, o_orderdate, o_orderkey LIMIT 20""".stripMargin) { (s, d) =>
    val qty = Tables.lineitem(s, d)
      .groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity")).as("total_qty"))
      .filter(col("total_qty") > 150)
    Tables.orders(s, d)
      .join(broadcast(qty), col("o_orderkey") === col("l_orderkey"))
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("o_orderkey"), col("o_orderdate"),
        col("o_totalprice"), col("total_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderdate"), col("o_orderkey"))
      .limit(20)
  }

  /** Q19: disjunctive multi-table predicate (OR of brand × size ×
    * quantity conjunctions). The per-table conjunctive hulls
    * (brand IN …, size ≤ 35, quantity in [1,30]) are stated
    * explicitly so they push into BOTH scans; the exact OR decides
    * after the join — same rows, pruned IO.
    */
  val q19Disjunctive: QueryDef = QueryDef.sql(
    "q19_disjunctive",
    """SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
      |FROM lineitem JOIN part ON p_partkey = l_partkey
      |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
      |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
      |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)""".stripMargin) { (s, d) =>
    val part = Tables.part(s, d)
      .filter(col("p_brand").isin("Brand#1", "Brand#2", "Brand#3") && col("p_size").between(1, 35))
      .select("p_partkey", "p_brand", "p_size")
    val li = Tables.lineitem(s, d)
      .filter(col("l_quantity").between(1, 30))
      .select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
    val pred =
      (col("p_brand") === "Brand#1" && col("p_size").between(1, 15) && col("l_quantity").between(1, 11)) ||
        (col("p_brand") === "Brand#2" && col("p_size").between(1, 25) && col("l_quantity").between(10, 20)) ||
        (col("p_brand") === "Brand#3" && col("p_size").between(1, 35) && col("l_quantity").between(20, 30))
    li.join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .filter(pred)
      .agg(r2(sum(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("revenue"))
  }

  /** Q21: suppliers who were the SOLE late shipper on a multi-supplier
    * finished order. The classic triple self-join (l1 + EXISTS l2 +
    * NOT EXISTS l3) collapses into ONE orderkey shuffle: two
    * collect_set windows over the order partition (suppliers on the
    * order / late suppliers on the order — both bounded by suppliers
    * per order, never corpus-sized) decide both correlated
    * conditions per row.
    */
  val q21Waiting: QueryDef = QueryDef.sql(
    "q21_waiting",
    """SELECT s_name, count(*) AS numwait
      |FROM supplier
      |JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
      |JOIN orders ON o_orderkey = l1.l_orderkey
      |WHERE o_orderstatus = 'F'
      |  AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
      |  AND EXISTS (SELECT 1 FROM lineitem l2
      |              WHERE l2.l_orderkey = l1.l_orderkey
      |                AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
      |                  WHERE l3.l_orderkey = l1.l_orderkey
      |                    AND l3.l_suppkey <> l1.l_suppkey
      |                    AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
      |GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 20""".stripMargin) { (s, d) =>
    val joined = Tables.lineitem(s, d).select("l_orderkey", "l_suppkey", "l_shipdate")
      .join(Tables.orders(s, d).filter(col("o_orderstatus") === "F")
          .select("o_orderkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .withColumn("is_late",
        col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
    val w = Window.partitionBy(col("l_orderkey"))
    val flagged = joined
      .withColumn("supps", collect_set(col("l_suppkey")).over(w))
      .withColumn("late_supps",
        collect_set(when(col("is_late"), col("l_suppkey"))).over(w))
    flagged
      .filter(col("is_late") && size(col("supps")) > 1 && size(col("late_supps")) === 1)
      .join(broadcast(Tables.supplier(s, d).select("s_suppkey", "s_name")),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_name"))
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(20)
  }

  /** Q22: well-funded customers gone inactive (no orders since 2000 —
    * the available-column spelling of the no-orders anti-join). The
    * threshold is a single-row broadcast; the active-key set is a
    * distinct aggregate feeding a left-anti join.
    */
  val q22Inactive: QueryDef = QueryDef.sql(
    "q22_inactive",
    """WITH active AS (SELECT DISTINCT o_custkey FROM orders
      |                WHERE o_orderdate >= TIMESTAMP '2000-01-01'),
      |     avg_bal AS (SELECT avg(c_acctbal) AS a FROM customer WHERE c_acctbal > 0)
      |SELECT c_nationkey, count(*) AS numcust, round(sum(c_acctbal), 2) AS totacctbal
      |FROM customer
      |WHERE c_acctbal > (SELECT a FROM avg_bal)
      |  AND NOT EXISTS (SELECT 1 FROM active WHERE o_custkey = c_custkey)
      |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin) { (s, d) =>
    val cust = Tables.customer(s, d)
    val avgBal = cust.filter(col("c_acctbal") > 0)
      .agg(avg(col("c_acctbal")).as("a"))
    val active = Tables.orders(s, d)
      .filter(col("o_orderdate") >= ts("2000-01-01"))
      .select(col("o_custkey")).distinct()
    cust
      .join(broadcast(avgBal))
      .filter(col("c_acctbal") > col("a"))
      .join(active, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("numcust"), r2(sum(col("c_acctbal"))).as("totacctbal"))
      .orderBy(col("c_nationkey"))
  }

  val all: Seq[QueryDef] = Seq(
    q4Priority, q6Forecast, q7Volume, q8Mktshare, q10Returns, q12Shiplag,
    q13Custdist, q14Promo, q15Topsupp, q17Smallqty, q18Bigorders,
    q19Disjunctive, q21Waiting, q22Inactive)
}
