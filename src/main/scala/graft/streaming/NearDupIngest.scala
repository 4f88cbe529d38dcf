package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming NEAR-duplicate ingestion: tail a graft-orc crawl table and
  * maintain a near-dup-free CLEAN catalog table plus the SIGNATURE
  * table that makes each batch's decisions corpus-aware — the minhash
  * companion to [[IngestDedup]]'s exact-fingerprint stream, and the
  * streaming form of `dd_minhash_lsh`'s batch dedup.
  *
  * Semantics: FIRST-WINS banding dedup. A document is DROPPED iff it
  * shares at least one LSH band key with ANY earlier-delivered document
  * — kept or dropped (a dropped near-dup's keys still poison its own
  * later near-dups, so chains collapse to the first survivor). "Earlier"
  * is `doc_id` order: the crawl contract is ascending-id delivery
  * (crawlers assign monotone ids), which makes the final clean table a
  * pure function of the delivered SET — reproducible by the DuckDB
  * oracle as "keep every doc with no smaller-id band collider"
  * (`rl_stream_neardup_ingest`), and exactly-once-equivalent under
  * replay: decisions compare STRICTLY-smaller ids, so a replayed
  * batch's own keys (already MERGEd into the signature table by the
  * failed attempt) can never drop the docs that wrote them, and both
  * MERGEs are insert-only keyed no-ops on re-delivery.
  *
  * Banding-only precision note: candidates are NOT re-verified by
  * exact Jaccard (that would require shipping token sets into the
  * signature table); with the (8 bands x 4 rows) md5 banding this is
  * the recall-leaning dedup large crawl pipelines run when a false
  * drop is cheaper than a kept near-dup. The `bandKeys` hook swaps in
  * any banding (the native minhash kernel for engine-internal speed, a
  * stricter banding for precision).
  *
  * 100 TB shape: per-batch work is batch-bounded — band keys are
  * 8-byte md5Key60 values, 8 per doc; the history side of the
  * candidate join is the signature table RESTRICTED to the batch's
  * key-bucket set (`kb = pmod(hash(key), n)` identity-partition column;
  * the static `kb IN (...)` filter is an ordinary pushed predicate, so
  * the scan prunes to the batch's buckets — same receipt family as the
  * streamingest ScaleStress mode), and both MERGEs carry the same
  * static bucket predicate in their ON clause (MoR MERGEs get no
  * runtime group filtering — GraftOrcMergePruneSpec). Driver collects
  * are bounded by the bucket count, never by data. Signature history
  * grows with the corpus; fp-sorted compaction keeps per-bucket file
  * counts flat exactly as the streamingest receipt shows.
  */
object NearDupIngest {

  /** Key-bucket column over `key`. */
  def keyBucket(n: Int) = pmod(hash(col("key")), lit(n)).cast("int")

  /** Doc-bucket column over `doc_id`. */
  def docBucket(n: Int) = pmod(hash(col("doc_id")), lit(n)).cast("int")

  /** Run one ingestion pass: stream every unconsumed crawl commit, then
    * stop. Crawl schema: `doc_id` BIGINT, `text` STRING, payload
    * columns. Required table schemas (both MoR-recommended):
    *  - `cleanTable(doc_id BIGINT, <payload...>, db INT)`
    *    PARTITIONED BY (db)
    *  - `sigTable(band INT, key BIGINT, doc_id BIGINT, kb INT)`
    *    PARTITIONED BY (kb)
    *
    * @param bandKeys banding function: docs `(doc_id, text)` to
    *   `(doc_id, band, key)` rows; defaults to the oracle-reproducible
    *   md5 minhash banding shared with `dd_minhash_lsh_det`.
    */
  def ingest(spark: SparkSession, crawlDir: String, cleanTable: String,
             sigTable: String, checkpoint: String, buckets: Int = 16,
             bandKeys: DataFrame => DataFrame =
               graft.operators.Dedup.detBandKeys,
             maxFilesPerTrigger: Option[Int] = None): Unit = {
    val reader = spark.readStream.format("graft-orc")
      .option("graft.snapshot_offsets", "true")
    maxFilesPerTrigger.foreach(n =>
      reader.option("maxFilesPerTrigger", n.toString))
    val crawl = reader.load(crawlDir)
    val payloadCols = crawl.columns.filterNot(c =>
      c.equalsIgnoreCase("doc_id") || c.equalsIgnoreCase("text")).toSeq
    val q = crawl.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        mergeBatch(batch, cleanTable, sigTable, payloadCols, buckets,
          bandKeys)
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    q.exception.foreach(throw _)
  }

  /** One micro-batch: band, decide (drop iff a strictly-smaller-id
    * collider exists in history or in this batch), MERGE survivors into
    * the clean table and ALL the batch's band keys into the signature
    * table. Both MERGEs are insert-only and keyed, hence replay no-ops.
    * Exposed for the decision-semantics specs (injectable banding).
    */
  def mergeBatch(batch: DataFrame, cleanTable: String, sigTable: String,
                 payloadCols: Seq[String], buckets: Int,
                 bandKeys: DataFrame => DataFrame): Unit = {
    if (batch.isEmpty) return
    val s = batch.sparkSession
    // crawl may re-deliver a doc_id inside one batch (at-least-once
    // upstream); collapse to one deterministic row per id
    val docs = batch
      .select(col("doc_id") +: col("text") +: payloadCols.map(col): _*)
      .filter(col("doc_id").isNotNull)
      .groupBy(col("doc_id"))
      .agg(min(struct(col("text") +: payloadCols.map(col): _*)).as("w"))
      .select(col("doc_id") +: col("w.text") +: payloadCols.map(c =>
        col(s"w.$c")): _*)
    val keys = bandKeys(docs.select(col("doc_id"), col("text")))
      .withColumn("kb", keyBucket(buckets))
    // pin: the bucket-set collect, the history join and the sig MERGE
    // must all see the same rows
    keys.persist()
    try {
      val kbs = keys.select(col("kb")).distinct()
        .collect().map(_.getInt(0)).sorted // bounded by `buckets`
      if (kbs.isEmpty) return
      // history colliders: signature table pruned to the batch's
      // buckets (static pushed predicate); strictly-smaller id makes
      // replayed own-keys harmless and ascending delivery decisive
      val hist = s.table(sigTable)
        .where(col("kb").isin(kbs.map(Integer.valueOf): _*))
        .select(col("band"), col("key"), col("doc_id").as("e_id"))
      val histColl = keys.join(hist, Seq("band", "key"))
        .where(col("e_id") < col("doc_id"))
        .select(col("doc_id"))
      val earlier = keys
        .select(col("band"), col("key"), col("doc_id").as("e_id"))
      val batchColl = keys.join(earlier, Seq("band", "key"))
        .where(col("e_id") < col("doc_id"))
        .select(col("doc_id"))
      val dropped = histColl.union(batchColl).distinct()
      val kept = docs.join(dropped, Seq("doc_id"), "left_anti")
        .withColumn("db", docBucket(buckets))
      kept.persist()
      try {
        val dbs = kept.select(col("db")).distinct()
          .collect().map(_.getInt(0)).sorted
        if (dbs.nonEmpty) {
          val view = tempView(s, kept)
          val insCols = ("doc_id" +: payloadCols) :+ "db"
          try s.sql(
            s"""MERGE INTO $cleanTable t USING $view b
               |ON t.doc_id = b.doc_id AND t.db IN (${dbs.mkString(", ")})
               |WHEN NOT MATCHED THEN
               |  INSERT (${insCols.mkString(", ")})
               |  VALUES (${insCols.map("b." + _).mkString(", ")})
               |""".stripMargin)
          finally s.catalog.dropTempView(view)
        }
        val kview = tempView(s, keys)
        try s.sql(
          s"""MERGE INTO $sigTable t USING $kview b
             |ON t.band = b.band AND t.key = b.key
             |  AND t.doc_id = b.doc_id AND t.kb IN (${kbs.mkString(", ")})
             |WHEN NOT MATCHED THEN
             |  INSERT (band, key, doc_id, kb)
             |  VALUES (b.band, b.key, b.doc_id, b.kb)
             |""".stripMargin)
        finally s.catalog.dropTempView(kview)
      } finally kept.unpersist()
    } finally keys.unpersist()
  }

  private def tempView(s: SparkSession, df: DataFrame): String = {
    val v = "graft_neardup_" + java.util.UUID.randomUUID()
      .toString.replace("-", "").take(12)
    df.createOrReplaceTempView(v)
    v
  }
}
