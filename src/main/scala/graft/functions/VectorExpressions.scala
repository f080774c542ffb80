package graft.functions

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Divide, Expression, ExpressionInfo, Multiply, Sqrt}
import org.apache.spark.sql.graft.{ColumnBridge, DotProduct}

/** Column-API and SQL-registration surface for graft's native
  * vector functions (expression implementation:
  * org.apache.spark.sql.graft.DotProduct).
  */
object VectorFunctions {

  /** Single source for the expression trees — both registration
    * paths (temp function and session extension) build from these.
    */
  private[functions] val dotBuilder: Seq[Expression] => Expression =
    exprs => DotProduct(exprs(0), exprs(1))

  private[functions] val cosineBuilder: Seq[Expression] => Expression =
    exprs =>
      Divide(
        DotProduct(exprs(0), exprs(1)),
        Multiply(
          Sqrt(DotProduct(exprs(0), exprs(0))),
          Sqrt(DotProduct(exprs(1), exprs(1)))))

  def dot_product(a: Column, b: Column): Column =
    ColumnBridge.column(
      dotBuilder(Seq(ColumnBridge.expression(a), ColumnBridge.expression(b))))

  def cosine_similarity(a: Column, b: Column): Column =
    ColumnBridge.column(
      cosineBuilder(Seq(ColumnBridge.expression(a), ColumnBridge.expression(b))))

  /** Register `graft_dot` / `graft_cosine` for SQL use in an
    * existing session.
    */
  def registerSql(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dot", dotBuilder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_cosine", cosineBuilder, "built-in")
  }
}

/** Session-extension entry point: lets any Spark app pick up graft's
  * native functions via
  * `--conf spark.sql.extensions=graft.functions.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      VectorFunctions.dotBuilder))
    e.injectFunction((
      FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_cosine"),
      VectorFunctions.cosineBuilder))
    e.injectFunction((
      FunctionIdentifier("graft_minhash"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.graft.MinHashAgg].getName, "graft_minhash"),
      SketchFunctions.minhashBuilder))
    e.injectFunction((
      FunctionIdentifier("graft_normalize"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.graft.UnicodeNormalize].getName,
        "graft_normalize"),
      TextFunctions.normalizeBuilder))
  }
}
