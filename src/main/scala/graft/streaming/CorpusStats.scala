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
  * fresh id with a lower stored one) — so the checkpoint's identity is
  * ENFORCED, not documented: [[maintain]] stamps an epoch (a UUID
  * sentinel stored in the checkpoint dir, so it lives and dies with the
  * checkpoint) into the stats table's properties on first accumulation
  * and REFUSES a mismatched epoch loudly unless the stats table is
  * empty — rebuilding from scratch means truncating the stats table
  * first, same as any streaming aggregation whose checkpoint is
  * discarded, and forgetting to does not silently double-count.
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
               charsCol: Column = length(col("text")),
               maxFilesPerTrigger: Option[Int] = None): Unit = {
    guardEpoch(spark, statsTable, checkpointEpoch(spark, checkpoint))
    val reader = spark.readStream.format("graft-orc")
      .option("graft.snapshot_offsets", "true")
    maxFilesPerTrigger.foreach(n =>
      reader.option("maxFilesPerTrigger", n.toString))
    val crawl = reader.load(crawlDir)
    val q = crawl.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        mergeBatch(batch, statsTable, keyCol, charsCol, batchId)
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    q.exception.foreach(throw _)
  }

  private[graft] val EpochProp = "graft.stream.epoch"

  /** The checkpoint's identity: a UUID sentinel file INSIDE the
    * checkpoint dir, created on first use — it lives and dies with the
    * checkpoint, so a deleted-and-recreated checkpoint (whose batch ids
    * restart at 0) presents a fresh epoch. Best-effort atomic create;
    * a concurrent creator's value wins by re-read.
    */
  private[graft] def checkpointEpoch(spark: SparkSession,
                                     checkpoint: String): String = {
    val p = new org.apache.hadoop.fs.Path(checkpoint, "graft-epoch")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def read(): Option[String] =
      try {
        val in = fs.open(p)
        try {
          val br = new java.io.BufferedReader(
            new java.io.InputStreamReader(in, "UTF-8"))
          Option(br.readLine()).map(_.trim).filter(_.nonEmpty)
        } finally in.close()
      } catch { case _: java.io.IOException => None }
    read().getOrElse {
      fs.mkdirs(p.getParent)
      val epoch = java.util.UUID.randomUUID().toString
      try {
        val out = fs.create(p, false)
        out.write(epoch.getBytes("UTF-8")); out.close()
        epoch
      } catch { case _: java.io.IOException =>
        read().getOrElse(throw new IllegalStateException(
          s"graft corpus-stats: cannot establish an epoch sentinel at $p"))
      }
    }
  }

  /** Refuse accumulation from a checkpoint other than the one whose id
    * sequence the stats table was built under — a fresh checkpoint
    * restarts batch ids at 0 and would silently double-count. An EMPTY
    * stats table (fresh, or truncated for a rebuild) adopts the new
    * epoch; a non-empty one fails loudly.
    */
  private[graft] def guardEpoch(spark: SparkSession, statsTable: String,
                                epoch: String): Unit = {
    val stored = BatchFrames.tableProp(spark, statsTable, EpochProp)
    stored match {
      case Some(e) if e == epoch => ()
      case other =>
        if (other.isDefined && !spark.table(statsTable).isEmpty)
          throw new IllegalStateException(
            s"graft corpus-stats: $statsTable was accumulated under " +
              s"checkpoint epoch ${other.get}, but this run's checkpoint " +
              s"presents epoch $epoch (a fresh checkpoint restarts batch " +
              "ids at 0, and its batches would double-count against the " +
              "stored counters). TRUNCATE the stats table to rebuild " +
              "from scratch, or resume with the original checkpoint.")
        spark.sql(s"ALTER TABLE $statsTable SET TBLPROPERTIES(" +
          s"'$EpochProp'='$epoch')")
    }
  }

  /** One micro-batch: pre-aggregate to one row per key, MERGE under the
    * batch-id guard. Exposed for the replay-semantics specs.
    */
  def mergeBatch(batch: DataFrame, statsTable: String, keyCol: String,
                 charsCol: Column, batchId: Long): Unit = {
    // no up-front batch.isEmpty: that was a FULL extra job over the
    // batch's files on every (overwhelmingly non-empty) batch; the
    // aggregation below subsumes the scan and emptiness is decided from
    // its materialized checkpoint instead
    val s = batch.sparkSession
    val agg = batch
      .select(coalesce(col(keyCol).cast("string"), lit("<null>"))
        .as("key"), coalesce(charsCol.cast("long"), lit(0L)).as("chars"))
      .groupBy(col("key"))
      .agg(count(lit(1)).as("docs"), sum(col("chars")).as("chars"))
      .withColumn("batch_id", lit(batchId))
      // eager checkpoint: the MERGE may evaluate its source more than
      // once — without it each pass re-scans the whole batch; with it
      // the source is the materialized dim-sized frame
      .localCheckpoint(true)
    // empty batch (or all rows aggregated away): nothing to merge — the
    // probe reads the checkpointed blocks, not the batch's files
    if (agg.isEmpty) { BatchFrames.dropLocalCheckpoint(agg); return }
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
    finally {
      s.catalog.dropTempView(view)
      BatchFrames.dropLocalCheckpoint(agg)
    }
  }
}
