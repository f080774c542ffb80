package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.CheckpointBridge
import org.scalatest.funsuite.AnyFunSuite

/** Pins the rolling-checkpoint contract: roll() materializes the new
  * generation, FREES the replaced one's blocks (the leak class that
  * inflated late-suite queries 9-12x in r6), and the rolled frame
  * stays fully usable afterwards.
  *
  * Assertions are on the SPECIFIC RDD ids each roll creates/frees —
  * never on a global persistent-RDD count: the shared session's
  * ContextCleaner asynchronously reaps prior suites' dead RDDs, so
  * an absolute count can drop mid-test through no fault of roll()
  * (the r7 flake).
  */
class CkptSpec extends AnyFunSuite {
  import TestSpark._

  private def heldIds: Set[Int] =
    spark.sparkContext.getPersistentRDDs.keySet.toSet

  private def ckptId(df: DataFrame): Int = {
    val ids = CheckpointBridge.rddIds(df)
    assert(ids.size == 1, s"expected one checkpoint RDD, got $ids")
    ids.head
  }

  test("roll frees the replaced generation and keeps the new one usable") {
    var state = spark.range(1000).toDF("id")
      .localCheckpoint(eager = true)
    var lastId = ckptId(state)
    assert(heldIds.contains(lastId), "first checkpoint holds blocks")
    var last = state
    // three rolled generations: each roll holds the new id, frees the old
    for (i <- 1 to 3) {
      state = Ckpt.roll(state.withColumn("id", col("id") + 1), last)
      val newId = ckptId(state)
      val held = heldIds
      assert(held.contains(newId), s"generation $i not held after roll")
      assert(!held.contains(lastId),
        s"generation ${i - 1} (rdd $lastId) leaked after roll $i")
      last = state
      lastId = newId
    }
    // the surviving generation is correct and usable
    assert(state.agg(sum(col("id"))).head.getLong(0)
      == (3L until 1003L).sum)
    Ckpt.free(state)
    assert(!heldIds.contains(lastId), "final free releases the store")
  }

  test("free is a no-op on plain (non-checkpointed) frames and null") {
    Ckpt.free(spark.range(10).toDF("id")) // plain plan: nothing to free
    val rolled = Ckpt.roll(spark.range(10).toDF("id"), null)
    val id = ckptId(rolled)
    assert(heldIds.contains(id)) // no throw is the contract
    Ckpt.free(rolled)
    assert(!heldIds.contains(id))
  }
}
