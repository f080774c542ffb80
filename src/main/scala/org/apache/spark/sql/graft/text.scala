package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.types.{AbstractDataType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd Unicode normalization (NFC/NFD/NFKC/NFKD) over a string
  * column — java.text.Normalizer behind a native expression, so
  * normalization-insensitive dedup keys stay inside whole-stage
  * codegen (no UDF). DuckDB's nfc_normalize provides the NFC oracle.
  */
case class UnicodeNormalize(child: Expression, form: String)
    extends UnaryExpression with ExpectsInputTypes {

  require(Set("NFC", "NFD", "NFKC", "NFKD").contains(form),
    s"unknown normalization form: $form")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_normalize"

  @transient private lazy val f = java.text.Normalizer.Form.valueOf(form)

  override def nullSafeEval(s: Any): Any =
    UTF8String.fromString(java.text.Normalizer.normalize(
      s.asInstanceOf[UTF8String].toString, f))

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |  java.text.Normalizer.normalize($c.toString(),
         |    java.text.Normalizer.Form.$form));""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Lower-cased character bigrams of a string as array<string> — one
  * tight per-ROW loop. The composed formulation (split + filter +
  * transform higher-order functions) pays an INTERPRETED lambda call
  * per character (ArrayTransform/ArrayFilter are CodegenFallback);
  * this expression pays one eval per document. Powers text_lm_score.
  */
case class CharBigrams(child: Expression)
    extends UnaryExpression with ExpectsInputTypes
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_char_bigrams"

  override def nullSafeEval(s: Any): Any = {
    val str = s.asInstanceOf[UTF8String].toString
      .toLowerCase(java.util.Locale.ROOT)
    val n = str.length - 1
    val out = new Array[AnyRef](math.max(n, 0))
    var i = 0
    while (i < n) { out(i) = UTF8String.fromString(str.substring(i, i + 2)); i += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** BPE token count under a trained merges table: pre-tokenize with
  * `pattern`, greedily merge each piece by rank, count surviving
  * tokens. The ranks map rides the expression (task closure — the
  * broadcast-merges shape of production token accounting).
  * CodegenFallback: the merge loop is data-dependent iteration, not
  * an expression tree — still executor-local, zero shuffle.
  */
case class BpeTokenCount(child: Expression, pattern: String,
    ranks: Map[(String, String), Int])
    extends UnaryExpression with ExpectsInputTypes
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_bpe_count"

  @transient private lazy val re = java.util.regex.Pattern.compile(pattern)

  override def nullSafeEval(s: Any): Any = {
    val m = re.matcher(s.asInstanceOf[UTF8String].toString)
    var n = 0L
    while (m.find()) n += graft.functions.Bpe.encodePieceCount(m.group(), ranks)
    n
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Sliding word n-grams of a token array as array<string> (each
  * element the space-joined n-token window starting at that
  * position; empty when the document has fewer than n tokens) — one
  * tight per-ROW loop over the already-split tokens. The composed
  * formulation (`transform(sequence(...), i -> array_join(slice(...)))`)
  * pays an interpreted lambda dispatch plus an O(n) slice copy PER
  * POSITION (ArrayTransform is CodegenFallback); this expression
  * pays one eval per document and reuses a single StringBuilder.
  * Powers dedup_substring's span fingerprinting.
  */
case class WordGrams(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(org.apache.spark.sql.types.ArrayType(StringType))
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_word_grams"

  override def nullSafeEval(v: Any): Any = {
    val ws = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val total = ws.numElements()
    val count = math.max(total - n + 1, 0)
    val out = new Array[AnyRef](count)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < count) {
      sb.setLength(0)
      var k = 0
      while (k < n) {
        if (k > 0) sb.append(' ')
        sb.append(ws.getUTF8String(i + k).toString)
        k += 1
      }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
