package graft.functions

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graft.{ColumnBridge, DotProduct}

/** Column-API and SQL-registration surface for graft's native
  * vector functions (expression implementation:
  * org.apache.spark.sql.graft.DotProduct).
  */
object VectorFunctions {

  def dot_product(a: Column, b: Column): Column =
    ColumnBridge.column(
      DotProduct(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def cosine_similarity(a: Column, b: Column): Column = {
    import org.apache.spark.sql.functions.sqrt
    dot_product(a, b) / (sqrt(dot_product(a, a)) * sqrt(dot_product(b, b)))
  }

  /** Register `graft_dot` / `graft_cosine` for SQL use in an
    * existing session.
    */
  def registerSql(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dot", exprs => DotProduct(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_cosine",
      exprs => {
        import org.apache.spark.sql.catalyst.expressions.{Divide, Multiply, Sqrt}
        Divide(
          DotProduct(exprs(0), exprs(1)),
          Multiply(
            Sqrt(DotProduct(exprs(0), exprs(0))),
            Sqrt(DotProduct(exprs(1), exprs(1)))))
      },
      "built-in")
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
      (exprs: Seq[Expression]) => DotProduct(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_cosine"),
      (exprs: Seq[Expression]) => {
        import org.apache.spark.sql.catalyst.expressions.{Divide, Multiply, Sqrt}
        Divide(
          DotProduct(exprs(0), exprs(1)),
          Multiply(
            Sqrt(DotProduct(exprs(0), exprs(0))),
            Sqrt(DotProduct(exprs(1), exprs(1)))))
      }))
  }
}
