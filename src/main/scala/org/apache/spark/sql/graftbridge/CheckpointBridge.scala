package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Release the storage behind a `localCheckpoint()`ed DataFrame.
  *
  * `Dataset.unpersist()` only routes to the CacheManager
  * (`uncacheQuery`), and a local checkpoint is RDD-level persistence,
  * not a CacheManager entry — so on Spark 4 the checkpoint blocks
  * survive `unpersist()` and wait for RDD garbage collection. A long
  * JVM that checkpoints per operation (index builds, chunked serving)
  * accumulates block-manager storage it believes it released.
  *
  * The checkpointed Dataset's logical plan is a `LogicalRDD` wrapping
  * the persisted internal-row RDD; unpersisting THAT rdd is the real
  * release. `LogicalRDD` is private[sql], hence this bridge.
  */
object CheckpointBridge {
  /** Unpersist the RDD behind a checkpointed frame (no-op when the
    * frame is not a plain checkpoint). `blocking = false`: removal is
    * async, like Spark's own ContextCleaner.
    */
  def release(df: DataFrame): Unit = df.queryExecution.analyzed match {
    case lr: LogicalRDD => lr.rdd.unpersist(blocking = false): Unit
    case _ => ()
  }
}
