package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-file point IO — the reference engine's native format.
  *
  * Input: one point per line, `"x,y"` (whitespace around either
  * coordinate tolerated) — /root/reference/src/MapReduceKMean/
  * PointsMapper.java:61-63 splits on ',' and Double.parses both
  * halves.
  *
  * Output: one centroid per line, `"<cid>\t<x>, <y>"` — the
  * reducer's (Text key, "x, y" value) TextOutputFormat shape,
  * /root/reference/src/MapReduceKMean/PointsReducer.java:32-33.
  */
object PointsText {

  /** Read a text file of "x,y" lines as (x: double, y: double). */
  def read(s: SparkSession, path: String): DataFrame =
    s.read.text(path)
      .select(split(col("value"), ",").as("p"))
      .select(
        element_at(col("p"), 1).cast("double").as("x"),
        element_at(col("p"), 2).cast("double").as("y"))

  /** Write (x, y) rows as "x,y" text lines. */
  def writePoints(df: DataFrame, path: String): Unit =
    df.select(concat_ws(",", col("x"), col("y")).as("value"))
      .write.mode("overwrite").text(path)

  /** Write centroids in the reference's reducer output shape. */
  def writeCentroids(s: SparkSession, centroids: Array[(Double, Double)],
      path: String): Unit = {
    import s.implicits._
    centroids.zipWithIndex
      .map { case ((x, y), i) => s"$i\t$x, $y" }.toSeq.toDF("value")
      .coalesce(1).write.mode("overwrite").text(path)
  }

  /** Read centroids previously written by [[writeCentroids]] (also
    * parses the reference's own job output — KMeans.java:134-141
    * normalizes ',' to whitespace and splits).
    */
  def readCentroids(s: SparkSession, path: String): Array[(Double, Double)] =
    s.read.text(path).collect()
      .map(_.getString(0).replace(",", " ").trim.split("\\s+"))
      .filter(_.length >= 3)
      .map(a => (a(0).toInt, (a(1).toDouble, a(2).toDouble)))
      .sortBy(_._1).map(_._2)

  /** Pick k distinct random line positions and return those lines as
    * initial centroids — the reference's init
    * (KMeans.java:52-100: draw k distinct indices in [0, lineCount),
    * sort them, take the matching lines in file order). A seed makes
    * it reproducible; the reference's unseeded behavior is seed-less.
    *
    * Line numbering over a distributed text read uses zipWithIndex —
    * one extra count job over partition sizes, never a global sort.
    */
  def sampleCentroids(s: SparkSession, path: String, k: Int,
      seed: Option[Long] = None): Array[(Double, Double)] = {
    val lines = s.read.text(path)
    val n = lines.count()
    require(n >= k, s"need at least $k points, found $n")
    val rnd = seed.fold(new scala.util.Random())(new scala.util.Random(_))
    val picked = scala.collection.mutable.LinkedHashSet.empty[Long]
    while (picked.size < k) picked += rnd.nextLong(n)
    val wanted = picked.toSet
    lines.rdd.zipWithIndex()
      .filter { case (_, i) => wanted.contains(i) }
      .map { case (r, i) =>
        val p = r.getString(0).split(",")
        (i, (p(0).trim.toDouble, p(1).trim.toDouble))
      }
      .collect().sortBy(_._1).map(_._2)
  }
}
