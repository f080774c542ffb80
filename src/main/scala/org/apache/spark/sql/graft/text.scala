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

/** Sliding character n-grams of a string as array<string> — the
  * n-gram generalization of CharBigrams, with SQL `substring`
  * CODEPOINT semantics (not UTF-16 chars) so it is value-identical
  * to the composed `transform(sequence(1, length(s) - n + 1),
  * i -> substr(s, i, n))` spelling it replaces: that HOF pays an
  * interpreted lambda dispatch plus an O(len) UTF8String codepoint
  * walk PER POSITION (ArrayTransform is CodegenFallback and
  * substringSQL re-scans from the head each call); this expression
  * walks the byte array once, recording codepoint byte offsets, and
  * slices each n-gram directly. Empty array when the string has
  * fewer than n codepoints (= the guarded/DuckDB semantics). Powers
  * mining_naive_bayes' trigram features and text_winnow's k-grams.
  */
case class CharNgrams(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  require(n >= 1, "char n-grams need n >= 1")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_char_ngrams"

  override def nullSafeEval(s: Any): Any = {
    val u = s.asInstanceOf[UTF8String]
    val bytes = u.getBytes
    val len = bytes.length
    // byte offset of each codepoint start (+ terminal offset)
    val offs = new Array[Int](u.numChars() + 1)
    var i = 0
    var c = 0
    while (i < len) {
      offs(c) = i
      i += UTF8String.numBytesForFirstByte(bytes(i))
      c += 1
    }
    offs(c) = len
    val count = math.max(c - n + 1, 0)
    val out = new Array[AnyRef](count)
    var j = 0
    while (j < count) {
      out(j) = UTF8String.fromBytes(bytes, offs(j), offs(j + n) - offs(j))
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
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
/** Sliding word n-gram XXH64 hashes of a token array as array<long>,
  * value-identical to `transform(sequence(0, size(toks) - n),
  * i -> xxhash64(toks[i], …, toks[i+n-1]))` on inputs with ≥ n
  * tokens (empty array below n, the guarded/DuckDB semantics): each
  * window folds the n tokens through the exact multi-argument
  * xxhash64 seed chain (seed 42, then hash-as-seed per argument) the
  * builtin uses — same bytes, same order, same constants — but in
  * one per-row loop instead of an interpreted lambda per position.
  * Powers the hashed-shingle relation behind the MinHash/LSH dedup
  * family.
  */
case class WordGramXxhash(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  require(n >= 1, "word-gram hashes need n >= 1")

  override def inputTypes: Seq[AbstractDataType] =
    Seq(org.apache.spark.sql.types.ArrayType(StringType))
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_word_gram_xxhash"

  override def nullSafeEval(v: Any): Any = {
    val ws = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val total = ws.numElements()
    val count = math.max(total - n + 1, 0)
    val out = new Array[Long](count)
    var i = 0
    while (i < count) {
      var h = 42L // XxHash64's default seed
      var k = 0
      while (k < n) {
        h = org.apache.spark.sql.catalyst.expressions.XxHash64Function
          .hash(ws.getUTF8String(i + k), StringType, h)
        k += 1
      }
      out(i) = h
      i += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

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
