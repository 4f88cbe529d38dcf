package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.LogicalRDD

/** Micro-batch utilities shared by the streaming-ingest operators.
  */
private[graft] object BatchFrames {

  /** One table property by exact key, via SHOW TBLPROPERTIES (works on
    * any catalog the table resolves through). Shared by the ingest
    * guards (CorpusStats epoch, NearDupIngest high-water mark).
    */
  def tableProp(spark: SparkSession, table: String,
                key: String): Option[String] =
    spark.sql(s"SHOW TBLPROPERTIES $table").collect()
      .collectFirst { case r if r.getString(0) == key => r.getString(1) }

  /** Free the executor blocks behind an EAGER `localCheckpoint(true)`
    * frame once its batch is done. `Dataset.unpersist()` can't do this
    * — it talks to the CacheManager, while a local checkpoint persists
    * at the RDD level (a [[LogicalRDD]] over the truncated-lineage
    * RDD) — so without this the blocks of every batch linger until
    * ContextCleaner GC, accumulating across a long-running stream.
    * After the drop the frame is DEAD (local checkpoints are not
    * recomputable); only call between batches.
    */
  def dropLocalCheckpoint(df: DataFrame): Unit =
    if (df != null) df.queryExecution.analyzed match {
      case lr: LogicalRDD => lr.rdd.unpersist(blocking = false)
      case _ => ()
    }
}
