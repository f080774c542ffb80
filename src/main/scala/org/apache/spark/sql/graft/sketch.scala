package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, XXH64}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, LongType}

/** Native mergeable MinHash signature aggregate: one pass over the
  * hashed-shingle column produces the full `numPerms`-permutation
  * signature as a single array<long> state.
  *
  * Engine rationale: the composed formulation is `numPerms` separate
  * `min(xxhash64(sh, j))` aggregate columns — 64 aggregate buffers
  * and 2×64 hash evaluations per row (each xxhash64 re-hashes the
  * shingle before folding in the seed). This aggregate keeps ONE
  * buffer and hashes the shingle once per row, then derives each
  * permutation with a single hashInt fold — bit-identical to the
  * composed form (same left-to-right XXH64 seed chaining as Spark's
  * xxhash64 with a trailing int literal), which the parity test pins.
  *
  * Partial aggregation works the usual way: per-partition buffers
  * merge by element-wise min, so the shuffle carries one signature
  * per (partition, doc) — the same map-side-combine shape as min().
  */
case class MinHashAgg(
    child: Expression,
    numPerms: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with ExpectsInputTypes
  with UnaryLike[Expression] {

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_minhash"

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(numPerms)(Long.MaxValue)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      // xxhash64(sh, j) == hashInt(j, hashLong(sh, 42)): hash the
      // shingle once, fold each permutation index into it
      val base = XXH64.hashLong(v.asInstanceOf[Long], 42L)
      var j = 0
      while (j < numPerms) {
        val h = XXH64.hashInt(j, base)
        if (h < buffer(j)) buffer(j) = h
        j += 1
      }
    }
    buffer
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var j = 0
    while (j < numPerms) { if (b2(j) < b1(j)) b1(j) = b2(j); j += 1 }
    b1
  }

  override def eval(buffer: Array[Long]): Any =
    if (buffer.length > 0 && buffer(0) == Long.MaxValue && buffer.forall(_ == Long.MaxValue)) null
    else new GenericArrayData(buffer.clone())

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * numPerms)
    buffer.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(numPerms)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MinHashAgg =
    copy(child = newChild)
}

/** Native mergeable second-moment aggregate over array<double>
  * vectors: ONE pass produces [n, Σv (d values), upper-triangle of
  * Σ v·vᵀ (d(d+1)/2 values)] as a single array<double> state — the
  * sufficient statistics for a covariance/PCA fit.
  *
  * Engine rationale: covariance at 100 TB must be a single
  * map-side-combining aggregation — never a second pass, never a
  * centering shuffle (C = Σvvᵀ/n − μμᵀ recovers the centered matrix
  * from uncentered sums). The composed alternative is d + d(d+1)/2
  * separate sum() columns (2,144 aggregate expressions at d=64 —
  * a plan-size/codegen blowup); this keeps ONE buffer and a tight
  * primitive loop per row. The shuffle carries one O(d²) buffer per
  * partition, the driver sees one O(d²) result: both independent of
  * row count.
  */
case class GramianAgg(
    child: Expression,
    d: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Double]]
  with ExpectsInputTypes
  with UnaryLike[Expression] {

  private val triLen = d * (d + 1) / 2
  private val bufLen = 1 + d + triLen

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_gramian"

  override def createAggregationBuffer(): Array[Double] =
    new Array[Double](bufLen)

  override def update(buffer: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v != null) {
      val a = v.asInstanceOf[ArrayData]
      if (a.numElements() == d) {
        buffer(0) += 1.0
        var i = 0
        var t = 1 + d
        while (i < d) {
          val xi = a.getDouble(i)
          buffer(1 + i) += xi
          var j = i
          while (j < d) { buffer(t) += xi * a.getDouble(j); t += 1; j += 1 }
          i += 1
        }
      }
    }
    buffer
  }

  override def merge(b1: Array[Double], b2: Array[Double]): Array[Double] = {
    var i = 0
    while (i < bufLen) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buffer: Array[Double]): Any =
    if (buffer(0) == 0.0) null else new GenericArrayData(buffer.clone())

  override def serialize(buffer: Array[Double]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * bufLen)
    buffer.foreach(bb.putDouble)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(bufLen)(bb.getDouble())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): GramianAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GramianAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): GramianAgg =
    copy(child = newChild)
}

/** Native mergeable SimHash aggregate: folds a doc's token hashes
  * into the packed 64-bit Charikar signature in ONE pass — buffer is
  * the 64 bit-balance counters (+1 when the token hash has bit j set,
  * −1 otherwise), eval packs bit j iff its balance is positive.
  *
  * Engine rationale: the composed formulation is 64 separate
  * conditional-sum aggregate columns followed by a 64-way
  * bitwise-OR reduce — a plan whose generated code is enormous
  * (seconds of janino compilation per run, measured 5-20 s on the
  * 300-doc bounded query, vs ~1 s with this aggregate) and whose
  * shuffle carries 64 long buffers per (partition, doc). This keeps
  * ONE 64-int buffer, merges by element-wise add (map-side combine),
  * and is bit-identical to the composed form (same +1/−1 balance,
  * same >0 packing rule — parity test-pinned).
  */
case class SimHashAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Int]]
  with ExpectsInputTypes
  with UnaryLike[Expression] {

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_simhash"

  override def createAggregationBuffer(): Array[Int] = new Array[Int](65)

  override def update(buffer: Array[Int], input: InternalRow): Array[Int] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var j = 0
      while (j < 64) {
        if (((h >>> j) & 1L) == 1L) buffer(j) += 1 else buffer(j) -= 1
        j += 1
      }
      buffer(64) += 1 // row count: distinguishes empty from balanced
    }
    buffer
  }

  override def merge(b1: Array[Int], b2: Array[Int]): Array[Int] = {
    var j = 0
    while (j < 65) { b1(j) += b2(j); j += 1 }
    b1
  }

  override def eval(buffer: Array[Int]): Any =
    if (buffer(64) == 0) null
    else {
      var sig = 0L
      var j = 0
      while (j < 64) { if (buffer(j) > 0) sig |= (1L << j); j += 1 }
      sig
    }

  override def serialize(buffer: Array[Int]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 * 65)
    buffer.foreach(bb.putInt)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Int] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(65)(bb.getInt())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SimHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SimHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): SimHashAgg =
    copy(child = newChild)
}

/** Native mergeable KMV (k-minimum-values / bottom-k theta) sketch
  * aggregate: keeps the k smallest DISTINCT xxhash64 values of the
  * input as a single sorted array<long> state. One sketch supports
  * distinct-count estimation ((k−1)/θ, Bar-Yossef et al. 2002), and
  * — unlike HLL — two sketches support SET-OPERATION estimates
  * (intersection / Jaccard, the theta-sketch property, Dasgupta et
  * al.): bottom-k values are a uniform coordinated sample of the
  * hashed key space, so |A∩B below min(θa,θb)| / min(θa,θb)
  * estimates the intersection cardinality. That is what powers
  * audience-overlap queries at 100 TB where exact
  * count(DISTINCT a∩b) would shuffle the full key set.
  *
  * Partial aggregation: per-partition sketches merge by sorted-union
  * truncation, so the shuffle carries one O(k) buffer per partition
  * — the same map-side-combine shape as min().
  */
case class KmvAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
  with ExpectsInputTypes
  with UnaryLike[Expression] {

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_kmv"

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  override def update(
      buffer: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = XXH64.hashLong(v.asInstanceOf[Long], 42L)
      if (buffer.size < k) buffer.add(h)
      else if (h < buffer.last()) { buffer.add(h); if (buffer.size > k) buffer.pollLast() }
    }
    buffer
  }

  override def merge(
      b1: java.util.TreeSet[java.lang.Long],
      b2: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = b2.iterator()
    while (it.hasNext) {
      val h = it.next()
      if (b1.size < k) b1.add(h)
      else if (h < b1.last()) { b1.add(h); if (b1.size > k) b1.pollLast() }
    }
    b1
  }

  override def eval(buffer: java.util.TreeSet[java.lang.Long]): Any = {
    val out = new Array[Long](buffer.size)
    val it = buffer.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buffer: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * buffer.size)
    val it = buffer.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val s = new java.util.TreeSet[java.lang.Long]()
    while (bb.hasRemaining) s.add(bb.getLong())
    s
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvAgg =
    copy(child = newChild)
}

/** Second-level KMV merge: re-aggregates STORED sketch arrays (the
  * output of KmvAgg persisted at ingest) into one sketch — bottom-k
  * union-truncation is associative AND idempotent on distinct hash
  * values, so any rollup of the stored per-partition sketches is
  * bit-identical to a one-shot sketch of the raw corpus (pinned in
  * ScalaTest). This is what makes a KMV table a storage contract:
  * the fact table is never rescanned at query time.
  */
case class KmvMergeAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
  with ExpectsInputTypes
  with UnaryLike[Expression] {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_kmv_merge"

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def add(buffer: java.util.TreeSet[java.lang.Long], h: Long): Unit = {
    if (buffer.size < k) buffer.add(h)
    else if (h < buffer.last()) { buffer.add(h); if (buffer.size > k) buffer.pollLast() }
  }

  override def update(
      buffer: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      var i = 0
      while (i < arr.numElements()) { add(buffer, arr.getLong(i)); i += 1 }
    }
    buffer
  }

  override def merge(
      b1: java.util.TreeSet[java.lang.Long],
      b2: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = b2.iterator()
    while (it.hasNext) add(b1, it.next())
    b1
  }

  override def eval(buffer: java.util.TreeSet[java.lang.Long]): Any = {
    val out = new Array[Long](buffer.size)
    val it = buffer.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buffer: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * buffer.size)
    val it = buffer.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val s = new java.util.TreeSet[java.lang.Long]()
    while (bb.hasRemaining) s.add(bb.getLong())
    s
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvMergeAgg =
    copy(child = newChild)
}

/** Driver-side estimators over evaluated KMV sketches (each an O(k)
  * sorted array — never corpus-sized).
  */
object Kmv {
  /** Normalized position of a hash in [0, 1). */
  private def u(h: Long): Double =
    (h.toDouble - Long.MinValue.toDouble) / math.pow(2.0, 64)

  /** θ — the sketch's sampling threshold: the (k+1)-exclusive bound
    * actually used is the k-th smallest value's position when the
    * sketch is full, 1.0 when it saw fewer than k distinct values.
    */
  def theta(sketch: Array[Long], k: Int): Double =
    if (sketch.length < k) 1.0 else u(sketch.last)

  /** Distinct-count estimate: exact below k, else (k−1)/θ. */
  def estimateDistinct(sketch: Array[Long], k: Int): Double =
    if (sketch.length < k) sketch.length.toDouble
    else (k - 1).toDouble / u(sketch.last)

  /** Intersection estimate of two sketches built with the same k and
    * hash: count common values below θ = min(θa, θb), scale by 1/θ.
    */
  def estimateIntersection(a: Array[Long], b: Array[Long], k: Int): Double = {
    val th = math.min(theta(a, k), theta(b, k))
    val bs = b.toSet
    val common = a.count(h => u(h) < th && bs.contains(h))
    common / th
  }
}
