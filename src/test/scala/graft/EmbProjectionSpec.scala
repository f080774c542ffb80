package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Embeddings, Similarity}

class EmbProjectionSpec extends AnyFunSuite {
  import TestSpark._

  test("emb_random_projection preserves distances in expectation (JL)") {
    val orig = Similarity.vectors(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val proj = Embeddings.embRandomProjection.fn(spark, sf).collect()
      .map { r =>
        r.getLong(0) -> (0 until Embeddings.RpDim).map(i => r.getDouble(i + 1)).toArray
      }.toMap
    assert(proj.size == orig.size)
    def dist(a: Array[Double], b: Array[Double]): Double =
      math.sqrt(a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum)
    // deterministic pair sample: consecutive ids
    val ids = orig.keys.toSeq.sorted
    val pairs = ids.sliding(2).take(100).map { case Seq(a, b) => (a, b) }.toSeq
    val ratios = pairs.map { case (a, b) =>
      val d0 = dist(orig(a), orig(b))
      val d1 = dist(proj(a), proj(b))
      d1 / d0
    }
    val mean = ratios.sum / ratios.size
    // sign-JL ratio has per-pair sd ~ sqrt(1/(2k)) ≈ 0.18; the mean of
    // 100 pairs must sit tight around 1
    assert(math.abs(mean - 1.0) < 0.1, s"mean ratio $mean")
    assert(ratios.forall(r => r > 0.3 && r < 1.9),
      s"extreme distortion: ${ratios.filterNot(r => r > 0.3 && r < 1.9).take(3)}")
  }
}
