package graft.functions

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Divide, Expression, ExpressionInfo, Multiply, Sqrt}
import org.apache.spark.sql.graft.{ColumnBridge, DotProduct, HilbertIndex, PqEncode, VecDivide, VecSubtract}

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

  private[functions] val vecDivBuilder: Seq[Expression] => Expression =
    exprs => VecDivide(exprs(0), exprs(1))

  private[functions] val vecSubBuilder: Seq[Expression] => Expression =
    exprs => VecSubtract(exprs(0), exprs(1))

  def dot_product(a: Column, b: Column): Column =
    ColumnBridge.column(
      dotBuilder(Seq(ColumnBridge.expression(a), ColumnBridge.expression(b))))

  def cosine_similarity(a: Column, b: Column): Column =
    ColumnBridge.column(
      cosineBuilder(Seq(ColumnBridge.expression(a), ColumnBridge.expression(b))))

  /** Elementwise array<double> / double, codegen'd (bit-identical to
    * transform(v, x -> x / s) but WholeStageCodegen-hostable).
    */
  def vec_div(v: Column, s: Column): Column =
    ColumnBridge.column(
      VecDivide(ColumnBridge.expression(v), ColumnBridge.expression(s)))

  /** Elementwise array<double> − array<double>, codegen'd. */
  def vec_sub(a: Column, b: Column): Column =
    ColumnBridge.column(
      VecSubtract(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** 16-bit 2-D Hilbert curve index, codegen'd as one flat loop (see
    * org.apache.spark.sql.graft.HilbertIndex — composing the
    * per-level rotations from Column arithmetic doubles the
    * expression tree per level).
    */
  def hilbert_index(x: Column, y: Column, bits: Int = 16): Column =
    ColumnBridge.column(
      HilbertIndex(ColumnBridge.expression(x), ColumnBridge.expression(y), bits))

  /** All M PQ codeword ids for a vector column in one codegen'd
    * expression (see org.apache.spark.sql.graft.PqEncode).
    */
  def pq_encode(u: Column, codebooks: Array[Array[Array[Double]]]): Column =
    ColumnBridge.column(
      PqEncode(ColumnBridge.expression(u),
        codebooks.toIndexedSeq.map(_.toIndexedSeq.map(_.toIndexedSeq))))

  /** Register `graft_dot` / `graft_cosine` for SQL use in an
    * existing session.
    */
  def registerSql(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dot", dotBuilder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_cosine", cosineBuilder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_vec_div", vecDivBuilder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_vec_sub", vecSubBuilder, "built-in")
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
    e.injectFunction((
      FunctionIdentifier("graft_vec_div"),
      new ExpressionInfo(classOf[VecDivide].getName, "graft_vec_div"),
      VectorFunctions.vecDivBuilder))
    e.injectFunction((
      FunctionIdentifier("graft_vec_sub"),
      new ExpressionInfo(classOf[VecSubtract].getName, "graft_vec_sub"),
      VectorFunctions.vecSubBuilder))
    e.injectFunction((
      FunctionIdentifier("graft_gramian"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.graft.GramianAgg].getName, "graft_gramian"),
      SketchFunctions.gramianBuilder))
    // graft_pq_encode is Column-API only: its codebooks parameter is
    // a fitted model object, not a SQL-expressible literal.
    // Whole-operator extension: sort-free per-key top-k (the
    // TopKOps.topKPerKey entry also self-registers per session for
    // sessions built without this extension class).
    e.injectPlannerStrategy(_ => org.apache.spark.sql.graft.TopKPerKeyStrategy)
    // conf-gated (graft.topk.rewrite) window-rank → TopKPerKey rewrite
    e.injectOptimizerRule(_ => org.apache.spark.sql.graft.InferTopKFromWindow)
  }
}
