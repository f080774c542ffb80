package graft.tools

import org.apache.spark.sql.SparkSession
import java.lang.management.ManagementFactory
import scala.jdk.CollectionConverters._

/** Diagnostic harness for the streaming-join in-suite inflation
  * (r7 verdict item 1): times stream_join before and after a heavy
  * batch workload in the SAME session, with deep clearing between,
  * and prints JVM aging metrics (GC, metaspace, classes) at each
  * step. If "after" stays slow with a clean store, the cost is JVM/
  * session aging (codegen class pressure, status-store growth), not
  * leaked blocks.
  */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()

    def jvmStats(tag: String): Unit = {
      val gcs = ManagementFactory.getGarbageCollectorMXBeans.asScala
      val gcCount = gcs.map(_.getCollectionCount).sum
      val gcMs = gcs.map(_.getCollectionTime).sum
      val cl = ManagementFactory.getClassLoadingMXBean
      val meta = ManagementFactory.getMemoryPoolMXBeans.asScala
        .find(_.getName.contains("Metaspace")).map(_.getUsage.getUsed / 1e6).getOrElse(-1.0)
      val heap = ManagementFactory.getMemoryMXBean.getHeapMemoryUsage.getUsed / 1e6
      println(f"[probe:$tag] gcCount=$gcCount gcMs=$gcMs classes=${cl.getLoadedClassCount} metaMB=$meta%.0f heapMB=$heap%.0f threads=${Thread.activeCount()}")
    }

    def run(name: String): Double = {
      val fn = SparkEntryRef.queries(name)
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => println(s"[probe] $name FAILED: $e") }
      val s = (System.nanoTime() - t0) / 1e9
      org.apache.spark.sql.graft.SessionHygiene.deepClear(spark)
      s
    }

    def trio(tag: String): Unit = {
      for (n <- Seq("stream_join", "stream_join_full", "stream_join_outer")) {
        val ts = (1 to 3).map(_ => run(n))
        println(f"[probe:$tag] $n = ${ts.map(t => f"$t%.2f").mkString(",")}")
      }
      jvmStats(tag)
    }

    jvmStats("start")
    trio("fresh")
    val heavy = Seq("kmeans_minibatch", "kmeans_mllib", "mining_als",
      "profile_lof", "cluster_dbscan", "graph_anf", "kmeans_elbow", "graph_hits")
    for (n <- heavy) { val t = run(n); println(f"[probe:batch] $n = $t%.2f") }
    jvmStats("post-batch")
    trio("aged")
    System.gc(); Thread.sleep(500); System.gc()
    trio("aged-gc")
    spark.stop()
  }

  /** Indirection so this file compiles standalone in tools/ builds. */
  object SparkEntryRef {
    def queries: Map[String, (SparkSession, String) => org.apache.spark.sql.DataFrame] =
      graft.SparkEntry.queries
  }
}
