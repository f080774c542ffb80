package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Variant timer for the tiny-graph iterative entries (r10):
  * graph_hits / graph_pagerank spend seconds on a 25-node graph —
  * per-iteration overhead, not data. Hypotheses measured here:
  * checkpointed state scans have UNKNOWN size so every per-iteration
  * join plans sort-merge first (AQE converts at runtime, one re-plan
  * per stage); the 1-row normalization totals ride in as separate
  * broadcast-subquery stages.
  *
  * MEASURED VERDICT (sf0.1, local[32], 3 reps): the current operator
  * shape (V0) is at its floor — V2 (broadcast hints everywhere) ties
  * it (4.7-5.7 s vs 5.0-5.5 s), and V1 (hints + NO intermediate
  * checkpoints) explodes to ~50 s because without lineage cuts each
  * iteration's broadcast subqueries re-execute all prior iterations'
  * subtrees (exponential re-execution; exchange reuse does not apply
  * across the per-iteration broadcast builds). The every-2-rounds
  * rolling checkpoint is load-bearing; leave the operator alone.
  */
object HitsProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[hits] $tag: ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    val HitsIters = 4
    for (rep <- 1 to 3) {
      println(s"=== rep $rep ===")
      val e = graft.operators.Graph.nationEdges(spark, sfDir).localCheckpoint(eager = true)
      val nodes = e.select(col("src").as("node"))
        .union(e.select(col("dst").as("node"))).distinct()
        .localCheckpoint(eager = true)

      // V0: current operator shape
      t("V0 full") {
        var hub = nodes.withColumn("h", lit(1.0))
        var auth: DataFrame = null
        var lastHub: DataFrame = null
        var lastAuth: DataFrame = null
        for (i <- 1 to HitsIters) {
          val araw = nodes.join(
              e.join(hub.select(col("node").as("hn"), col("h")), col("src") === col("hn"))
                .groupBy(col("dst").as("an")).agg(sum(col("h")).as("raw")),
              col("node") === col("an"), "left_outer")
            .select(col("node"), coalesce(col("raw"), lit(0.0)).as("raw"))
          val atot = araw.agg(sum(col("raw")).as("t"))
          auth = araw.crossJoin(broadcast(atot))
            .select(col("node"), (col("raw") / col("t")).as("a"))
          val hraw = nodes.join(
              e.join(auth.select(col("node").as("an2"), col("a")), col("dst") === col("an2"))
                .groupBy(col("src").as("hn2")).agg(sum(col("a")).as("raw")),
              col("node") === col("hn2"), "left_outer")
            .select(col("node"), coalesce(col("raw"), lit(0.0)).as("raw"))
          val htot = hraw.agg(sum(col("raw")).as("t"))
          hub = hraw.crossJoin(broadcast(htot))
            .select(col("node"), (col("raw") / col("t")).as("h"))
          if (i % 2 == 0 || i == HitsIters) {
            val h2 = hub.localCheckpoint(eager = true)
            val a2 = auth.localCheckpoint(eager = true)
            graft.Ckpt.free(lastHub); graft.Ckpt.free(lastAuth)
            hub = h2; auth = a2; lastHub = h2; lastAuth = a2
          }
        }
        hub.join(auth.select(col("node").as("anode"), col("a")),
            col("node") === col("anode"))
          .select(col("node"), round(col("h"), 8).as("hub"),
            round(col("a"), 8).as("auth"))
          .orderBy(col("node"))
          .write.format("noop").mode("overwrite").save()
        graft.Ckpt.free(lastHub); graft.Ckpt.free(lastAuth)
      }

      // V1: broadcast hints on every small join side + no intermediate
      // checkpoints (4 iterations, single final materialization)
      t("V1 full") {
        var hub = nodes.withColumn("h", lit(1.0))
        var auth: DataFrame = null
        for (i <- 1 to HitsIters) {
          val araw = nodes.join(
              broadcast(e.join(broadcast(hub.select(col("node").as("hn"), col("h"))), col("src") === col("hn"))
                .groupBy(col("dst").as("an")).agg(sum(col("h")).as("raw"))),
              col("node") === col("an"), "left_outer")
            .select(col("node"), coalesce(col("raw"), lit(0.0)).as("raw"))
          val atot = araw.agg(sum(col("raw")).as("t"))
          auth = araw.crossJoin(broadcast(atot))
            .select(col("node"), (col("raw") / col("t")).as("a"))
          val hraw = nodes.join(
              broadcast(e.join(broadcast(auth.select(col("node").as("an2"), col("a"))), col("dst") === col("an2"))
                .groupBy(col("src").as("hn2")).agg(sum(col("a")).as("raw"))),
              col("node") === col("hn2"), "left_outer")
            .select(col("node"), coalesce(col("raw"), lit(0.0)).as("raw"))
          val htot = hraw.agg(sum(col("raw")).as("t"))
          hub = hraw.crossJoin(broadcast(htot))
            .select(col("node"), (col("raw") / col("t")).as("h"))
        }
        hub.join(broadcast(auth.select(col("node").as("anode"), col("a"))),
            col("node") === col("anode"))
          .select(col("node"), round(col("h"), 8).as("hub"),
            round(col("a"), 8).as("auth"))
          .orderBy(col("node"))
          .write.format("noop").mode("overwrite").save()
      }

      // V2: V1 but keep the every-2-rounds rolling checkpoint
      t("V2 full") {
        var hub = nodes.withColumn("h", lit(1.0))
        var auth: DataFrame = null
        var lastHub: DataFrame = null
        var lastAuth: DataFrame = null
        for (i <- 1 to HitsIters) {
          val araw = nodes.join(
              broadcast(e.join(broadcast(hub.select(col("node").as("hn"), col("h"))), col("src") === col("hn"))
                .groupBy(col("dst").as("an")).agg(sum(col("h")).as("raw"))),
              col("node") === col("an"), "left_outer")
            .select(col("node"), coalesce(col("raw"), lit(0.0)).as("raw"))
          val atot = araw.agg(sum(col("raw")).as("t"))
          auth = araw.crossJoin(broadcast(atot))
            .select(col("node"), (col("raw") / col("t")).as("a"))
          val hraw = nodes.join(
              broadcast(e.join(broadcast(auth.select(col("node").as("an2"), col("a"))), col("dst") === col("an2"))
                .groupBy(col("src").as("hn2")).agg(sum(col("a")).as("raw"))),
              col("node") === col("hn2"), "left_outer")
            .select(col("node"), coalesce(col("raw"), lit(0.0)).as("raw"))
          val htot = hraw.agg(sum(col("raw")).as("t"))
          hub = hraw.crossJoin(broadcast(htot))
            .select(col("node"), (col("raw") / col("t")).as("h"))
          if (i % 2 == 0 || i == HitsIters) {
            val h2 = hub.localCheckpoint(eager = true)
            val a2 = auth.localCheckpoint(eager = true)
            graft.Ckpt.free(lastHub); graft.Ckpt.free(lastAuth)
            hub = h2; auth = a2; lastHub = h2; lastAuth = a2
          }
        }
        hub.join(auth.select(col("node").as("anode"), col("a")),
            col("node") === col("anode"))
          .select(col("node"), round(col("h"), 8).as("hub"),
            round(col("a"), 8).as("auth"))
          .orderBy(col("node"))
          .write.format("noop").mode("overwrite").save()
        graft.Ckpt.free(lastHub); graft.Ckpt.free(lastAuth)
      }
      graft.Ckpt.free(e); graft.Ckpt.free(nodes)
    }
    spark.stop()
  }
}
