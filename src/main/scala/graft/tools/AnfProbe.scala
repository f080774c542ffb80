package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase timer for graph_anf's round structure (r10): init vs
  * per-round join+agg+checkpoint vs per-round N(h) readout, old
  * (scan-ordered edge cache) vs current (v-repartitioned cache +
  * size-adaptive broadcast state), repeated so first-run codegen/JIT
  * cost separates from steady state.
  *
  * Findings this probe produced (kept so they aren't re-learned):
  * - count() as the timed action is a trap — Catalyst prunes the 33
  *   bit_or columns and the probe measures nothing (guide §1.4).
  * - The zero-exchange shape (self-loop edges + alias-preserved
  *   partitioning + broadcast state) fuses probe + both agg phases
  *   into one whole-stage method the JIT refuses: ~1.9 s/round
  *   interpreted vs ~0.7 s for the split shape. union(state) is
  *   load-bearing for codegen splitting.
  * - A bare repartition(col) is AQE-coalesced to ONE partition at
  *   this size, serializing the rounds; pin the partition count.
  */
object AnfProbe {
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
      println(f"[anf] $tag: ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    import spark.implicits._
    val AnfK = 32
    val mcols = (0 until AnfK).map(j => s"m$j")
    def geoBit(j: Int) = {
      val h = conv(substring(md5(concat_ws(",", col("node"), lit(j))), 1, 13),
        16, 10).cast("long")
      call_function("shiftleft", lit(1L), bit_count(h.bitwiseXOR(h - 1)) - 1)
    }
    val lowestZero = mcols.map { m =>
      bit_count(col(m).bitwiseXOR(col(m) + 1)) - 1
    }.reduce(_ + _).cast("double") / AnfK
    def nh(st: org.apache.spark.sql.DataFrame): Double =
      st.select(sum(round(pow(lit(2.0), lowestZero) / lit(0.77351)
          * lit(1000000.0), 0).cast("long")).as("n"))
        .as[Long].collect()(0) / 1e6
    def agg(in: org.apache.spark.sql.DataFrame) = in
      .groupBy(col("node"))
      .agg(bit_or(col(mcols.head)).as(mcols.head),
        mcols.tail.map(m => bit_or(col(m)).as(m)): _*)

    for (rep <- 1 to 3) {
      println(s"=== rep $rep ===")
      val e = graft.operators.Graph.tradeEdges(spark, sfDir)
      val und = e.select((col("src") * 2).as("u"), (col("dst") * 2 + 1).as("v"))
      val dir = und.union(und.select(col("v").as("u"), col("u").as("v")))

      for ((tag, edges) <- Seq(
          ("old(scan-ordered)", dir.persist()),
          ("new(v-clustered)", dir
            .repartition(spark.sparkContext.defaultParallelism, col("v"))
            .persist()))) {
        t(s"$tag edges materialize")(edges.count())
        var state = edges.select(col("u").as("node")).distinct()
          .select(col("node") +: (0 until AnfK).map(j => geoBit(j).as(s"m$j")): _*)
          .localCheckpoint(eager = true)
        val nNodes = state.count()
        def bc(st: org.apache.spark.sql.DataFrame) =
          if (tag.startsWith("new") && nNodes <= 500000L) broadcast(st) else st
        t(s"$tag nh(0)")(nh(state))
        var prev: org.apache.spark.sql.DataFrame = null
        for (h <- 1 to 3) {
          val msgs = edges.join(bc(state), col("u") === col("node"))
            .select(col("v").as("node") +: mcols.map(col): _*)
          state = t(s"$tag round $h") {
            graft.Ckpt.roll(agg(msgs.union(state)), prev)
          }
          prev = state
          t(s"$tag round $h nh")(nh(state))
        }
        graft.Ckpt.free(state)
        edges.unpersist(true)
      }
    }
    spark.stop()
  }
}
