package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Graph

class GraphMstSpec extends AnyFunSuite {
  import TestSpark._

  private def kruskal(edges: Seq[(Long, Long, Double)]): Set[(Long, Long, Double)] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
      r
    }
    val out = scala.collection.mutable.Set[(Long, Long, Double)]()
    edges.sortBy(e => (e._3, e._1, e._2)).foreach { case (a, b, w) =>
      parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { parent(rb) = ra; out += ((a, b, w)) }
    }
    out.toSet
  }

  test("graph_mst equals Kruskal under the same total edge order") {
    val edges = Graph.weightedNationEdges(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(edges.nonEmpty)
    val got = Graph.graphMst.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val want = kruskal(edges)
    assert(got == want,
      s"missing=${(want -- got).take(3)} extra=${(got -- want).take(3)}")
    // spanning forest size: vertices - components
    val vs = edges.flatMap(e => Seq(e._1, e._2)).distinct
    assert(got.size == vs.size - (vs.size - want.size))
    // total weight agreement (redundant with set equality, but the
    // quantity a user actually reads)
    assert(math.abs(got.toSeq.map(_._3).sum - want.toSeq.map(_._3).sum) < 1e-6)
  }

  test("graph_mst output is acyclic and connects what the graph connects") {
    val mst = Graph.graphMst.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    // acyclic: |E| < |V| within the MST
    val vs = mst.flatMap(e => Seq(e._1, e._2)).distinct
    assert(mst.size < vs.size || mst.isEmpty)
  }
}
