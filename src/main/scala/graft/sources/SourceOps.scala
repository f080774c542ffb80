package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.QueryDef

/** Source/sink coverage: every format leaves the engine through a
  * distributed write and comes back through a distributed read, then
  * is checked against the DuckDB oracle reading the original parquet.
  * Exercises the reference's text IO (PointsText) plus the CSV/JSON/
  * partitioned-parquet surface a Spark user expects.
  *
  * Scale posture: all writes are executor-parallel (no driver
  * collect); the partitioned-parquet query proves partition pruning
  * (the filter never scans the other partitions' files).
  */
object SourceOps {

  // per-process staging root: two concurrent JVMs (a test run and a
  // bench run) must not overwrite each other's roundtrip files
  private lazy val stagingRoot: java.nio.file.Path = {
    val p = java.nio.file.Files.createTempDirectory("graft_io")
    p.toFile.deleteOnExit()
    p
  }

  private def tmpDir(name: String): String =
    stagingRoot.resolve(name).toString

  /** Text sink + source roundtrip of the reference's "x,y" format;
    * sums survive the Double.toString round-trip exactly (rounding
    * only absorbs summation-order noise).
    */
  val srcTextPoints: QueryDef = QueryDef.sql(
    "src_text_points",
    """SELECT count(*) AS n,
      |  round(sum(l_quantity), 2) AS sum_x,
      |  round(sum(l_extendedprice), 2) AS sum_y
      |FROM lineitem""".stripMargin) { (s, d) =>
    val path = tmpDir("points_text")
    val pts = Tables.lineitem(s, d)
      .select(col("l_quantity").as("x"), col("l_extendedprice").as("y"))
    PointsText.writePoints(pts, path)
    PointsText.read(s, path)
      .agg(count(lit(1)).as("n"),
        round(sum(col("x")), 2).as("sum_x"),
        round(sum(col("y")), 2).as("sum_y"))
  }

  /** CSV sink + source roundtrip (header, explicit read schema). */
  val srcCsvRoundtrip: QueryDef = QueryDef.sql(
    "src_csv_roundtrip",
    """SELECT n_nationkey, n_name, n_regionkey FROM nation
      |ORDER BY n_nationkey""".stripMargin) { (s, d) =>
    val path = tmpDir("nation_csv")
    Tables.nation(s, d).select("n_nationkey", "n_name", "n_regionkey")
      .write.mode("overwrite").option("header", "true").csv(path)
    s.read
      .schema(StructType(Seq(
        StructField("n_nationkey", LongType),
        StructField("n_name", StringType),
        StructField("n_regionkey", LongType))))
      .option("header", "true").csv(path)
      .orderBy(col("n_nationkey"))
  }

  /** JSON-lines sink + source roundtrip. */
  val srcJsonRoundtrip: QueryDef = QueryDef.sql(
    "src_json_roundtrip",
    """SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey""") { (s, d) =>
    val path = tmpDir("region_json")
    Tables.region(s, d).select("r_regionkey", "r_name")
      .write.mode("overwrite").json(path)
    s.read
      .schema(StructType(Seq(
        StructField("r_regionkey", LongType),
        StructField("r_name", StringType))))
      .json(path)
      .orderBy(col("r_regionkey"))
  }

  /** Hive-style partitioned parquet sink, then a partition-pruned
    * read: the o_orderstatus predicate is resolved against directory
    * names — files of other partitions are never opened (explain
    * shows the pruned `PartitionFilters`, no row-level filter).
    */
  val srcPartitionedScan: QueryDef = QueryDef.sql(
    "src_partitioned_scan",
    """SELECT o_orderpriority, count(*) AS n,
      |  round(sum(o_totalprice), 2) AS total
      |FROM orders WHERE o_orderstatus = 'F'
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) { (s, d) =>
    val path = tmpDir("orders_by_status")
    Tables.orders(s, d)
      .select("o_orderkey", "o_orderpriority", "o_totalprice", "o_orderstatus")
      .write.mode("overwrite").partitionBy("o_orderstatus").parquet(path)
    s.read.parquet(path)
      .filter(col("o_orderstatus") === "F")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("total"))
      .orderBy(col("o_orderpriority"))
  }

  /** ORC sink + source roundtrip (the columnar alternative when the
    * lakehouse standardizes on ORC): predicate pushdown and column
    * pruning work the same as parquet.
    */
  val srcOrcRoundtrip: QueryDef = QueryDef.sql(
    "src_orc_roundtrip",
    """SELECT s_suppkey, s_name, s_nationkey FROM supplier
      |WHERE s_suppkey < 100 ORDER BY s_suppkey""".stripMargin) { (s, d) =>
    val path = tmpDir("supplier_orc")
    Tables.supplier(s, d).select("s_suppkey", "s_name", "s_nationkey")
      .write.mode("overwrite").orc(path)
    s.read.orc(path)
      .filter(col("s_suppkey") < 100)
      .orderBy(col("s_suppkey"))
  }

  val all: Seq[QueryDef] = Seq(
    srcTextPoints, srcCsvRoundtrip, srcJsonRoundtrip, srcPartitionedScan,
    srcOrcRoundtrip)
}
