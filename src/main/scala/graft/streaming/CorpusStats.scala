package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Exactly-once streaming corpus accounting: maintain per-key counters
  * (documents, characters) over a graft-orc crawl stream, with each
  * micro-batch MERGEd into a stats catalog table under a BATCH-ID
  * GUARD.
  *
  * Counters are not idempotent the way keep-min is — re-adding a
  * replayed batch double-counts — so exactly-once needs the
  * transactional-sink pattern: every row of the stats table remembers
  * the last batch id that touched it, the batch pre-aggregates to one
  * row per key, and the MERGE only accumulates when `b.batch_id >
  * t.batch_id`. Structured Streaming replays a failed batch UNDER THE
  * SAME ID (the foreachBatch contract), so the replay's MERGE is a
  * guarded no-op; the MERGE itself commits atomically through the
  * manifest, so a crash between the MERGE and the checkpoint write is
  * exactly the replayed case. The guard's contract is the CHECKPOINT'S
  * id sequence: a re-run with a FRESH checkpoint restarts ids at 0 and
  * is NOT guarded in general (a multi-batch replay can pair a higher
  * fresh id with a lower stored one) — rebuilding from scratch means
  * truncating the stats table first, same as any streaming aggregation
  * whose checkpoint is discarded.
  *
  * 100 TB shape: per-batch work is one map-side-combined aggregation of
  * the batch to a key-cardinality frame (languages, domains — dim-sized)
  * plus a MERGE against a dim-sized stats table: both bounded by the
  * batch and the key space, never by corpus history.
  */
object CorpusStats {

  /** Run one maintenance pass: stream every unconsumed crawl commit,
    * accumulating per-`keyCol` doc/char counts into `statsTable`
    * (schema: `(key STRING, docs BIGINT, chars BIGINT, batch_id
    * BIGINT)`), then stop. Re-invoking with the same `checkpoint`
    * resumes past consumed commits.
    */
  def maintain(spark: SparkSession, crawlDir: String, statsTable: String,
               checkpoint: String, keyCol: String = "lang",
               charsCol: Column = length(col("text"))): Unit = {
    val crawl = spark.readStream.format("graft-orc")
      .option("graft.snapshot_offsets", "true")
      .load(crawlDir)
    val q = crawl.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        mergeBatch(batch, statsTable, keyCol, charsCol, batchId)
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    q.exception.foreach(throw _)
  }

  /** One micro-batch: pre-aggregate to one row per key, MERGE under the
    * batch-id guard. Exposed for the replay-semantics specs.
    */
  def mergeBatch(batch: DataFrame, statsTable: String, keyCol: String,
                 charsCol: Column, batchId: Long): Unit = {
    if (batch.isEmpty) return
    val s = batch.sparkSession
    val agg = batch
      .select(coalesce(col(keyCol).cast("string"), lit("<null>"))
        .as("key"), coalesce(charsCol.cast("long"), lit(0L)).as("chars"))
      .groupBy(col("key"))
      .agg(count(lit(1)).as("docs"), sum(col("chars")).as("chars"))
      .withColumn("batch_id", lit(batchId))
    val view = "graft_corpus_stats_" + java.util.UUID.randomUUID()
      .toString.replace("-", "").take(12)
    agg.createOrReplaceTempView(view)
    try s.sql(
      s"""MERGE INTO $statsTable t USING $view b ON t.key = b.key
         |WHEN MATCHED AND b.batch_id > t.batch_id THEN UPDATE SET
         |  t.docs = t.docs + b.docs, t.chars = t.chars + b.chars,
         |  t.batch_id = b.batch_id
         |WHEN NOT MATCHED THEN
         |  INSERT (key, docs, chars, batch_id)
         |  VALUES (b.key, b.docs, b.chars, b.batch_id)
         |""".stripMargin)
    finally s.catalog.dropTempView(view)
  }
}
