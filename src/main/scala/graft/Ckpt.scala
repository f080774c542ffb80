package graft

import org.apache.spark.sql.{DataFrame, Dataset}

/** Rolling localCheckpoint for iterative loops.
  *
  * `state = state.localCheckpoint(eager = true)` inside a loop cuts
  * lineage but LEAKS the previous generation's blocks: a checkpointed
  * RDD's storage is only released when the driver GCs the RDD object,
  * so a suite of iterative operators fills the executor store with
  * dead generations and every later query pays eviction churn
  * (observed 9-12x in-suite inflation vs isolated runs). `roll`
  * checkpoints the new state eagerly FIRST — so nothing ever depends
  * on freed blocks — then releases the generation it replaces.
  *
  * Contract: `prev` must be the previous ROLLED/CHECKPOINTED state
  * (or null on the first roll) and must not be used after the call;
  * its lineage is truncated, so the data is unrecoverable by design.
  * Passing a non-checkpointed Dataset is a safe no-op on the free
  * side.
  */
object Ckpt {
  def roll(next: DataFrame, prev: Dataset[_]): DataFrame = {
    val out = next.localCheckpoint(eager = true)
    if (prev != null) free(prev)
    out
  }

  /** Release the block-manager blocks behind a localCheckpointed
    * Dataset (no-op for plain plans). The Dataset must not be used
    * afterwards.
    */
  def free(df: Dataset[_]): Unit =
    org.apache.spark.sql.graft.CheckpointBridge.free(df)
}
