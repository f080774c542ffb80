package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.KMeans
import graft.sources.{PointsText, Tables}

class PointsTextSpec extends AnyFunSuite {
  import TestSpark._

  private def freshDir(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory(name)
    d.toFile.deleteOnExit()
    s"$d/$name"
  }

  test("points text roundtrip is exact") {
    val path = freshDir("pts_roundtrip")
    val pts = KMeans.points(Tables.lineitem(spark, sf)).select("x", "y")
    PointsText.writePoints(pts, path)
    val back = PointsText.read(spark, path)
    assert(back.count() == pts.count())
    val a = pts.agg(sum("x"), sum("y")).collect()(0)
    val b = back.agg(sum("x"), sum("y")).collect()(0)
    // Double.toString/parse is lossless; only summation order differs.
    assert(math.abs(a.getDouble(0) - b.getDouble(0)) < 1e-6)
    assert(math.abs(a.getDouble(1) - b.getDouble(1)) < 1e-6)
  }

  test("sampleCentroids picks k distinct existing points, reproducibly") {
    val path = freshDir("pts_sample")
    PointsText.writePoints(
      KMeans.points(Tables.lineitem(spark, sf)).select("x", "y"), path)
    val c1 = PointsText.sampleCentroids(spark, path, 5, Some(42L))
    val c2 = PointsText.sampleCentroids(spark, path, 5, Some(42L))
    assert(c1.length == 5)
    assert(c1.toSeq == c2.toSeq)
    assert(c1.distinct.length == 5)
    val all = PointsText.read(spark, path).collect()
      .map(r => (r.getDouble(0), r.getDouble(1))).toSet
    c1.foreach(c => assert(all.contains(c)))
  }

  test("centroid write/read roundtrip in the reference output format") {
    val path = freshDir("centroids_out")
    val cs = Array((1.5, -2.25), (3.125, 4.0), (0.0, 7.75))
    PointsText.writeCentroids(spark, cs, path)
    assert(PointsText.readCentroids(spark, path).toSeq == cs.toSeq)
  }

  test("KMeansApp runs the reference CLI flow end-to-end") {
    val in = freshDir("app_in")
    val out = freshDir("app_out")
    val pts = KMeans.points(Tables.lineitem(spark, sf)).select("x", "y")
    PointsText.writePoints(pts, in)
    val (centroids, iters, _) =
      KMeansApp.run(spark, k = 4, in, out, seed = Some(7L))
    assert(centroids.length == 4)
    assert(iters >= 1 && iters <= 20)
    // the written centroid file reads back exactly
    val back = PointsText.readCentroids(spark, out)
    assert(back.toSeq == centroids.toSeq)
  }

  test("text pipeline lloyd matches parquet pipeline lloyd") {
    val path = freshDir("pts_lloyd")
    val pq = KMeans.points(Tables.lineitem(spark, sf))
    PointsText.writePoints(pq.select("x", "y"), path)
    val init = KMeans.initCentroids(pq)
    val fromText = PointsText.read(spark, path).persist()
    try {
      val (c1, i1, conv1) = KMeans.lloyd(fromText, init)
      val (c2, i2, conv2) = KMeans.lloyd(pq, init)
      assert(i1 == i2 && conv1 == conv2)
      c1.zip(c2).foreach { case ((x1, y1), (x2, y2)) =>
        assert(math.abs(x1 - x2) < 1e-9 && math.abs(y1 - y2) < 1e-9)
      }
    } finally fromText.unpersist(false)
  }
}
