package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.VectorFunctions
import graft.operators.Similarity

class VectorExprSpec extends AnyFunSuite {
  import TestSpark._

  test("native dot equals higher-order-function dot on real embeddings") {
    val e = Similarity.vectors(spark, sf).limit(50)
    val both = e.select(
      VectorFunctions.dot_product(col("v"), col("v")).as("native"),
      Similarity.dotHof(col("v"), col("v")).as("hof")).collect()
    both.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
  }

  test("sql registration: graft_dot and graft_cosine") {
    VectorFunctions.registerSql(spark)
    val r = spark.sql(
      "SELECT graft_dot(array(1D,2D), array(3D,4D)) AS d, " +
        "graft_cosine(array(1D,0D), array(1D,0D)) AS c").collect()(0)
    assert(r.getDouble(0) == 11.0)
    assert(math.abs(r.getDouble(1) - 1.0) < 1e-12)
  }

  test("native dot is codegen'd (no higher-order lambda in plan)") {
    val e = Similarity.vectors(spark, sf)
    val plan = e.select(VectorFunctions.dot_product(col("v"), col("v")))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("zip_with"))
    assert(!plan.contains("aggregate("))
  }

  test("null and length-mismatch behavior") {
    val rows = spark.sql(
      "SELECT graft_dot(NULL, array(1D)) AS a, graft_dot(array(1D,2D), array(3D)) AS b")
      .collect()(0)
    assert(rows.isNullAt(0))
    assert(rows.getDouble(1) == 3.0)
  }
}
