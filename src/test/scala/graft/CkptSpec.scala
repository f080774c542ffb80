package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the rolling-checkpoint contract: roll() materializes the new
  * generation, FREES the replaced one's blocks (the leak class that
  * inflated late-suite queries 9-12x in r6), and the rolled frame
  * stays fully usable afterwards.
  */
class CkptSpec extends AnyFunSuite {
  import TestSpark._

  private def persistentRddCount: Int =
    spark.sparkContext.getPersistentRDDs.size

  test("roll frees the replaced generation and keeps the new one usable") {
    val base = persistentRddCount
    var state = spark.range(1000).toDF("id")
      .localCheckpoint(eager = true)
    assert(persistentRddCount == base + 1, "first checkpoint holds blocks")
    var last = state
    // three rolled generations: the store must stay at +1, not grow
    for (i <- 1 to 3) {
      state = Ckpt.roll(state.withColumn("id", col("id") + 1), last)
      last = state
      assert(persistentRddCount == base + 1,
        s"generation $i leaked: ${persistentRddCount - base} held")
    }
    // the surviving generation is correct and usable
    assert(state.agg(sum(col("id"))).head.getLong(0)
      == (3L until 1003L).sum)
    Ckpt.free(state)
    assert(persistentRddCount == base, "final free releases the store")
  }

  test("free is a no-op on plain (non-checkpointed) frames and null") {
    val base = persistentRddCount
    Ckpt.free(spark.range(10).toDF("id")) // plain plan: nothing to free
    Ckpt.roll(spark.range(10).toDF("id"), null).localCheckpoint(eager = true)
    assert(persistentRddCount >= base) // no throw is the contract
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
  }
}
