package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Linkage, RelationalMore}
import graft.sources.Tables

class MiningSpec extends AnyFunSuite {
  import TestSpark._

  test("mining_fpgrowth equals exhaustive subset enumeration") {
    val baskets = Tables.lineitem(spark, sf)
      .groupBy(col("l_orderkey"))
      .agg(collect_set(col("l_partkey")).as("items"))
      .collect()
      .map(_.getSeq[Long](1).sorted.distinct.toVector)
    // brute force: every non-empty subset of every basket, count >= 3
    val counts = scala.collection.mutable.Map[Vector[Long], Long]()
    baskets.foreach { b =>
      (1 to b.size).foreach { k =>
        b.combinations(k).foreach { c =>
          counts(c) = counts.getOrElse(c, 0L) + 1
        }
      }
    }
    val want = counts.toSeq.filter(_._2 >= 3)
      .map { case (items, n) => (items.mkString(","), items.size, n) }
      .sortBy { case (is, k, n) => (-n, k, is) }
      .take(500)
    val got = Linkage.miningFpgrowth.fn(spark, sf).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSeq
    assert(got.nonEmpty)
    assert(got == want,
      s"missing=${(want.toSet -- got.toSet).take(3)} extra=${(got.toSet -- want.toSet).take(3)}")
  }

  test("mining_als ranks bought items above unbought and emits 5 recs/user") {
    val recs = Linkage.miningAls.fn(spark, sf).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getDouble(3)))
    val ratings = Linkage.alsRatings(spark, sf).collect()
      .map(r => (r.getInt(0), r.getInt(1))).toSet
    val users = ratings.map(_._1)
    assert(recs.groupBy(_._1).forall(_._2.length == 5))
    assert(recs.map(_._1).toSet == users)
    // scores non-increasing with rank per user
    recs.groupBy(_._1).values.foreach { rs =>
      val byRank = rs.sortBy(_._2).map(_._4)
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b })
    }
    // fit property: bought (user,item) pairs outscore unbought ones
    val model = Linkage.alsModel(spark, sf)
    import spark.implicits._
    val items = ratings.map(_._2).toSeq.sorted
    val negatives = users.toSeq.sorted.flatMap { u =>
      items.filter(i => !ratings((u, i))).take(20).map(u -> _)
    }
    def meanScore(pairs: Seq[(Int, Int)]): Double = {
      val scored = model.transform(pairs.toDF("user", "item")).collect()
        .map(_.getFloat(2).toDouble)
      scored.sum / scored.length
    }
    val posMean = meanScore(ratings.toSeq.take(2000))
    val negMean = meanScore(negatives.take(2000))
    assert(posMean > negMean + 0.1, s"pos $posMean vs neg $negMean")
  }

  test("q_weighted_sample picks k smallest priorities, weight-biased") {
    val all = Tables.orders(spark, sf).select(
        col("o_orderkey"), col("o_totalprice"),
        (((col("o_orderkey") * lit(2654435761L)) % lit(1000000007L))
          / lit(1000000007.0) / col("o_totalprice")).as("p"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    val want = all.sortBy(t => (t._3, t._1)).take(100).map(_._1).toSet
    val got = RelationalMore.qWeightedSample.fn(spark, sf).collect()
      .map(_.getLong(0)).toSet
    assert(got == want)
    // weight bias: the sampled mean weight should exceed the population's
    val popMean = all.map(_._2).sum / all.length
    val sampleMean = all.filter(t => got(t._1)).map(_._2).sum / got.size
    assert(sampleMean > popMean, s"sample $sampleMean vs pop $popMean")
  }
}
