package graft.operators

import org.apache.spark.sql.functions._
import graft.QueryDef
import graft.sources.Tables

/** Table profiling — the ANALYZE-shape statistics a cost-based
  * planner (or a data-quality gate) collects per column: row count,
  * non-null count, exact NDV, min/max/mean. One corpus scan total:
  * all measures run in a single aggregate (Catalyst plans the three
  * exact count-distincts as one Expand ×3 pass — the standard
  * multi-distinct plan; the sketch alternative for 100 TB is
  * q_approx_distinct's HLL, which collapses the expand).
  */
object Profile {

  private case class ColSpec(name: String)

  private val cols = Seq("l_quantity", "l_extendedprice", "l_discount")

  val profileStats: QueryDef = QueryDef.sql(
    "profile_stats",
    cols.map { c =>
      s"""SELECT '$c' AS col_name, count(*) AS n_rows, count($c) AS n_nonnull,
         |  count(DISTINCT $c) AS ndv, round(min($c), 6) AS min_v,
         |  round(max($c), 6) AS max_v, round(avg($c), 6) AS avg_v
         |FROM lineitem""".stripMargin
    }.mkString("", "\nUNION ALL\n", "\nORDER BY col_name")) { (s, d) =>
    val li = Tables.lineitem(s, d)
    val aggs = count(lit(1)).as("n_rows") +: cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"${c}_nonnull"),
        countDistinct(col(c)).as(s"${c}_ndv"),
        round(min(col(c)), 6).as(s"${c}_min"),
        round(max(col(c)), 6).as(s"${c}_max"),
        round(avg(col(c)), 6).as(s"${c}_avg"))
    }
    val stackArgs = cols.map { c =>
      s"'$c', n_rows, ${c}_nonnull, ${c}_ndv, ${c}_min, ${c}_max, ${c}_avg"
    }.mkString(", ")
    li.agg(aggs.head, aggs.tail: _*)
      .selectExpr(s"stack(${cols.size}, $stackArgs) AS " +
        "(col_name, n_rows, n_nonnull, ndv, min_v, max_v, avg_v)")
      .orderBy(col("col_name"))
  }

  val all: Seq[QueryDef] = Seq(profileStats)
}
