package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.KMeans
import graft.sources.Tables

/** One-off breakdown of kmeans_minibatch's cost (r7 verdict item 3):
  * init scan vs md5 mask build vs the 20-iteration loop.
  */
object KmProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()

    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[km:$tag] ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    for (rep <- 1 to 2) {
      println(s"--- rep $rep ---")
      val allPts = KMeans.points(Tables.lineitem(spark, sfDir))
      val init = t("init")(KMeans.initCentroids(allPts))
      val pts = allPts.select("x", "y").persist()
      t("pts-cache")(pts.count())
      // time the NEW mask build (four 60-bit conv halves + bit ops)
      val xi = round(col("x") * 100).cast("long")
      val yi = round(col("y") * 100).cast("long")
      def h(m: Int) = md5(concat_ws(",", xi, yi, lit(m)))
      val halves = pts.select(col("x"), col("y"),
        conv(substring(h(0), 1, 15), 16, 10).cast("long").as("h0"),
        conv(substring(h(0), 16, 15), 16, 10).cast("long").as("h1"),
        conv(substring(h(1), 1, 15), 16, 10).cast("long").as("h2"),
        conv(substring(h(1), 16, 15), 16, 10).cast("long").as("h3"))
      val mask = (0 until 20).map { i =>
        val half = col(s"h${2 * (i / 10) + (i % 10) / 5}")
        val sh = 48 - 12 * ((i % 10) % 5)
        when(pmod(shiftright(half, sh).bitwiseAND(lit(4095L)), lit(5)) === 0,
          lit(1L << i)).otherwise(lit(0L))
      }.reduce(_ + _)
      val hashed = halves.select(col("x"), col("y"), mask.as("bmask")).persist()
      t("mask-new")(hashed.count())
      // and the md5 alone (2 per row, no conv)
      val justMd5 = pts.select(length(h(0)) + length(h(1)))
      t("md5-only")(justMd5.agg(sum(justMd5.columns.head)).collect())
      t("loop")(KMeans.minibatchLloyd(pts, init))
      pts.unpersist(true); hashed.unpersist(true)
      org.apache.spark.sql.graft.SessionHygiene.deepClear(spark)
      System.gc()
    }
    spark.stop()
  }
}
