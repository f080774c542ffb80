package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Kmv
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.SketchFunctions
import graft.operators.Profile
import graft.sources.Tables

class SketchKmvSpec extends AnyFunSuite {
  import TestSpark._

  private val K = 1024

  private def sketchOf(df: org.apache.spark.sql.DataFrame, c: String): Array[Long] =
    df.agg(SketchFunctions.kmv(col(c), K).as("sk"))
      .collect()(0).getSeq[Long](0).toArray

  test("kmv is exact below k distinct values") {
    val df = spark.range(500).toDF("id")
    val sk = sketchOf(df, "id")
    assert(sk.length == 500)
    assert(Kmv.estimateDistinct(sk, K) == 500.0)
  }

  test("kmv distinct estimate is within 5 standard errors at 200k") {
    val df = spark.range(200000).toDF("id")
    val est = Kmv.estimateDistinct(sketchOf(df, "id"), K)
    val stderr = 200000.0 / math.sqrt(K - 2)
    assert(math.abs(est - 200000.0) < 5 * stderr, s"est $est")
  }

  test("kmv intersection estimate recovers a planted overlap") {
    val a = sketchOf(spark.range(0, 150000).toDF("id"), "id")
    val b = sketchOf(spark.range(100000, 250000).toDF("id"), "id")
    val common = Kmv.estimateIntersection(a, b, K)
    // theta-sketch intersection stderr is larger than the union's:
    // allow 15% on a 50k true intersection
    assert(math.abs(common - 50000.0) < 0.15 * 50000.0, s"common $common")
    val ja = 50000.0 / 250000.0
    val ea = Kmv.estimateDistinct(a, K)
    val eb = Kmv.estimateDistinct(b, K)
    val ej = common / (ea + eb - common)
    assert(math.abs(ej - ja) < 0.15 * ja, s"jaccard $ej vs $ja")
  }

  test("kmv sketch is invariant to partitioning (mergeable partials)") {
    val base = spark.range(50000).toDF("id")
    val s3 = sketchOf(base.repartition(3), "id")
    val s17 = sketchOf(base.repartition(17), "id")
    assert(s3.sameElements(s17))
    assert(s3.length == K)
    assert(s3.sameElements(s3.sorted))
  }

  test("sketch_kmv_daily: stored-table rollup is BIT-IDENTICAL to one-shot") {
    val rolled = Profile.kmvSketchTable(spark, sf)
      .groupBy(col("event_type"))
      .agg(SketchFunctions.kmvMerge(col("sk"), K).as("sk"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1).toArray).toMap
    val oneShot = Tables.events(spark, sf)
      .groupBy(col("event_type"))
      .agg(SketchFunctions.kmv(col("user_id"), K).as("sk"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1).toArray).toMap
    assert(rolled.keySet == oneShot.keySet)
    rolled.foreach { case (t, sk) =>
      assert(sk.sameElements(oneShot(t)), s"type $t sketch differs")
    }
    // the query runs and estimates match the merged sketches
    val rows = Profile.sketchKmvDaily.fn(spark, sf).collect()
    assert(rows.length == rolled.size)
    rows.foreach { r =>
      val est = Kmv.estimateDistinct(rolled(r.getString(0)), K)
      assert(r.getLong(3) == math.round(est))
    }
  }

  test("sketch_kmv_overlap: all type pairs, estimates near exact") {
    val rows = Profile.sketchKmvOverlap.fn(spark, sf).collect()
    val types = Tables.events(spark, sf).select("event_type").distinct().count()
    assert(rows.length == types * (types - 1) / 2)
    // exact overlap for one pair, recomputed directly
    val r = rows.head
    val (ta, tb) = (r.getString(0), r.getString(1))
    val ua = Tables.events(spark, sf).filter(col("event_type") === ta)
      .select("user_id").distinct().collect().map(_.getLong(0)).toSet
    val ub = Tables.events(spark, sf).filter(col("event_type") === tb)
      .select("user_id").distinct().collect().map(_.getLong(0)).toSet
    val exact = (ua & ub).size.toDouble
    val est = r.getLong(4).toDouble
    // sf0.001 user sets are small; sketches may be in the exact regime
    assert(math.abs(est - exact) <= math.max(0.15 * exact, 1.0),
      s"pair ($ta,$tb): est $est exact $exact")
    rows.foreach { row =>
      val j = row.getDouble(5)
      assert(j >= 0.0 && j <= 1.0)
    }
  }
}
