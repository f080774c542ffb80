package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Graph

class GraphSsspSpec extends AnyFunSuite {
  import TestSpark._

  test("graph_sssp equals driver-side Bellman-Ford with the same hop bound") {
    val edges = Graph.weightedNationEdges(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), 1000000000.0 / r.getDouble(2)))
    val adj = (edges ++ edges.map(e => (e._2, e._1, e._3)))
      .groupBy(_._1).map { case (k, v) => k -> v.map(t => (t._2, t._3)) }
    var dist = Map(0L -> 0.0)
    (1 to 6).foreach { _ =>
      val relaxed = dist.toSeq.flatMap { case (u, du) =>
        adj.getOrElse(u, Array.empty[(Long, Double)]).map { case (v, w) => v -> (du + w) }
      }
      dist = (dist.toSeq ++ relaxed).groupBy(_._1)
        .map { case (k, vs) => k -> vs.map(_._2).min }
    }
    val got = Graph.graphSssp.fn(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got.keySet == dist.keySet)
    got.foreach { case (n, dd) =>
      assert(math.abs(dd - dist(n)) < 1e-5, s"node $n: $dd vs ${dist(n)}")
    }
    assert(got(0L) == 0.0)
    // triangle inequality spot check: every edge relaxed
    edges.foreach { case (a, b, w) =>
      for (da <- got.get(a); db <- got.get(b)) {
        assert(db <= da + w + 1e-6, s"unrelaxed edge ($a,$b)")
        assert(da <= db + w + 1e-6, s"unrelaxed edge ($b,$a)")
      }
    }
  }
}
