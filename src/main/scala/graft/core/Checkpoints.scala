package graft.core

import org.apache.spark.sql.DataFrame

/** Block hygiene for `localCheckpoint`ed frames. A local checkpoint's
  * storage blocks belong to the checkpointed RDD, not the cache manager,
  * so `Dataset.unpersist` cannot release them — iterative operators that
  * checkpoint per round would otherwise leak one generation of blocks per
  * iteration for the session's lifetime (measured at the 100x scale
  * stress: enough resident storage to deny later aggregations execution
  * memory).
  */
object Checkpoints {

  /** Release the storage blocks behind a `localCheckpoint`ed frame that
    * will never be read again. The RDD handle is pulled out of the
    * LogicalRDD leaf. Safe ONLY for frames with no future consumers — a
    * local checkpoint's blocks are the sole copy of its data (lineage is
    * truncated by design). A frame that is not a checkpoint (no LogicalRDD
    * leaf) is left untouched.
    */
  def free(df: DataFrame): Unit =
    df.queryExecution.analyzed.collect {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
    }.foreach(_.unpersist(false))
}
