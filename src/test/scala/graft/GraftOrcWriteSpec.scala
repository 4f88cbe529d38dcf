package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** DSv2 write path of the graft-orc connector: batch append/overwrite and
  * the streaming sink, round-tripped through the connector's own read path.
  */
class GraftOrcWriteSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshDir(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  /** Published .orc files anywhere under the table (waves publish into
    * `w-<commitId>/` subdirectories; staging subtrees excluded).
    */
  private def publishedOrcFiles(dir: String): Seq[java.io.File] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isFile) Seq(f).filter(_.getName.endsWith(".orc"))
      else if (f.getName.startsWith("_")) Nil
      else Option(f.listFiles()).toSeq.flatten.flatMap(walk)
    walk(new java.io.File(dir))
  }

  private def nation = Tables.nation(spark, TestSpark.sf0001)

  test("batch write to an empty dir round-trips through the connector") {
    val dir = freshDir("graft-orc-w1")
    nation.write.format("graft-orc").mode("append").save(dir)
    val back = spark.read.format("graft-orc").load(dir)
    assert(back.schema.fieldNames.toSeq === nation.schema.fieldNames.toSeq)
    assert(back.orderBy($"n_nationkey").collect().toSeq ===
      nation.orderBy($"n_nationkey").collect().toSeq)
    // staging dir is cleaned up on commit
    assert(TestSpark.stagingClean(dir))
  }

  test("batch append accumulates; overwrite truncates") {
    val dir = freshDir("graft-orc-w2")
    val n = nation.count()
    nation.write.format("graft-orc").mode("append").save(dir)
    nation.write.format("graft-orc").mode("append").save(dir)
    assert(spark.read.format("graft-orc").load(dir).count() === 2 * n)
    nation.write.format("graft-orc").mode("overwrite").save(dir)
    assert(spark.read.format("graft-orc").load(dir).count() === n)
  }

  test("write honors the compression option") {
    val dir = freshDir("graft-orc-w3")
    nation.write.format("graft-orc").option("compression", "zstd")
      .mode("append").save(dir)
    val files = publishedOrcFiles(dir)
    assert(files.nonEmpty && files.forall(_.getName.contains("zstd")))
    assert(spark.read.format("graft-orc").load(dir).count() === nation.count())
  }

  test("empty partitions publish no files") {
    val dir = freshDir("graft-orc-w4")
    // 4-partition df with all rows in few partitions after a filter
    nation.repartition(4).filter($"n_nationkey" < 0)
      .write.format("graft-orc").mode("append").save(dir)
    assert(publishedOrcFiles(dir).isEmpty)
  }

  test("partitionBy writes a hive layout the connector reads back with pruning") {
    val dir = freshDir("graft-orc-w6")
    val li = Tables.lineitem(spark, TestSpark.sf0001)
    li.write.format("graft-orc").partitionBy("l_returnflag")
      .mode("append").save(dir)
    // k=v directories on disk; partition column NOT in the data files
    val flagDirs = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("l_returnflag=")).map(_.getName).sorted
    assert(flagDirs.length === 3, flagDirs.mkString(","))
    val back = spark.read.format("graft-orc").load(dir)
    assert(back.count() === li.count())
    assert(back.columns.sorted === li.columns.sorted)
    // per-flag counts survive the round trip
    val want = li.groupBy($"l_returnflag").count()
      .as[(String, Long)].collect().toMap
    val got = back.groupBy($"l_returnflag").count()
      .as[(String, Long)].collect().toMap
    assert(got === want)
    // and a partition filter prunes to one directory's files
    assert(back.filter($"l_returnflag" === "R").count() === want("R"))
  }

  test("partitioned overwrite replaces k=v directories") {
    val dir = freshDir("graft-orc-w7")
    val li = Tables.lineitem(spark, TestSpark.sf0001)
    li.write.format("graft-orc").partitionBy("l_returnflag")
      .mode("append").save(dir)
    li.filter($"l_returnflag" === "R")
      .write.format("graft-orc").partitionBy("l_returnflag")
      .mode("overwrite").save(dir)
    val back = spark.read.format("graft-orc").load(dir)
    assert(back.count() === li.filter($"l_returnflag" === "R").count())
    val dirs = new java.io.File(dir).listFiles()
      .filter(_.getName.contains("=")).map(_.getName)
    assert(dirs.toSeq === Seq("l_returnflag=R"))
  }

  test("partition values escape path separators and round-trip") {
    val dir = freshDir("graft-orc-w8")
    val df = Seq((1L, "a/b"), (2L, "c=d"), (3L, null), (4L, "plain"))
      .toDF("id", "k")
    df.write.format("graft-orc").partitionBy("k").mode("append").save(dir)
    val back = spark.read.format("graft-orc").load(dir)
    assert(back.select($"id", $"k").as[(Long, String)].collect().toSet ===
      Set((1L, "a/b"), (2L, "c=d"), (3L, null), (4L, "plain")))
  }

  test("an aborted task writer deletes its staged file") {
    import org.apache.spark.sql.connector.write.LogicalWriteInfo
    val dir = freshDir("graft-orc-w5")
    // drive the task-side writer protocol directly: open, write, abort
    val info = new LogicalWriteInfo {
      override def queryId(): String = "t"
      override def schema() = nation.schema
      override def options() =
        new org.apache.spark.sql.util.CaseInsensitiveStringMap(
          java.util.Map.of("path", dir))
    }
    val write = new graft.sources.v2.GraftOrcWriteBuilder(Seq(dir), info)
      .build()
    val factory = write.toBatch.createBatchWriterFactory(null)
    val writer = factory.createWriter(0, 0L)
    val row = org.apache.spark.sql.catalyst.InternalRow(
      0, org.apache.spark.unsafe.types.UTF8String.fromString("x"), 0)
    writer.write(row)
    // staged files live under _staging/<writeId>/ — scan recursively
    def stagedFiles(): Seq[java.io.File] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isFile) Seq(f)
        else Option(f.listFiles()).toSeq.flatten.flatMap(walk)
      walk(new java.io.File(dir, "_staging"))
    }
    assert(stagedFiles().nonEmpty,
      "expected a staged file while the task is open")
    writer.abort()
    assert(stagedFiles().isEmpty, "abort must delete the staged file")
    // nothing was published
    val published = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".orc"))
    assert(published.isEmpty)
  }

  test("append with a mismatched schema is rejected; overwrite is not") {
    val dir = freshDir("graft-orc-w9")
    nation.write.format("graft-orc").mode("append").save(dir)
    // dropped column
    val e1 = intercept[Exception] {
      nation.drop("n_name").write.format("graft-orc")
        .mode("append").save(dir)
    }
    assert(e1.getMessage.contains("missing columns"), e1.getMessage)
    // changed column type
    val e2 = intercept[Exception] {
      nation.withColumn("n_nationkey", $"n_nationkey".cast("string"))
        .write.format("graft-orc").mode("append").save(dir)
    }
    assert(e2.getMessage.contains("has type"), e2.getMessage)
    // changed partition layout
    val e3 = intercept[Exception] {
      nation.write.format("graft-orc").partitionBy("n_regionkey")
        .mode("append").save(dir)
    }
    assert(e3.getMessage.contains("partition"), e3.getMessage)
    // table is unpoisoned: reads still work, matching append still works
    assert(spark.read.format("graft-orc").load(dir).count() === nation.count())
    nation.write.format("graft-orc").mode("append").save(dir)
    // overwrite may change the schema freely
    nation.drop("n_name").write.format("graft-orc")
      .mode("overwrite").save(dir)
    val back = spark.read.format("graft-orc").load(dir)
    assert(back.columns.toSet === nation.drop("n_name").columns.toSet)
  }

  test("timestamp partition values round-trip value-faithfully") {
    val dir = freshDir("graft-orc-w10")
    val df = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-08-11 19:33:20")),
      (2L, java.sql.Timestamp.valueOf("2024-08-11 19:33:20.123456")),
      (3L, null.asInstanceOf[java.sql.Timestamp]))
      .toDF("id", "ts")
    df.write.format("graft-orc").partitionBy("ts").mode("append").save(dir)
    // inferred read: value-faithful TEXT, string type — the same contract
    // as Spark's built-in file sources (raw micros would come back as a
    // bigint like 1723400000000000, changing both type and value)
    val inferred = spark.read.format("graft-orc").load(dir)
    assert(inferred.schema("ts").dataType ===
      org.apache.spark.sql.types.StringType)
    assert(inferred.select($"id", $"ts").as[(Long, String)].collect().toSet
      === Set((1L, "2024-08-11 19:33:20"),
              (2L, "2024-08-11 19:33:20.123456"),
              (3L, null)))
    // user-supplied schema: full timestamp fidelity, and pruning works
    val typed = spark.read.format("graft-orc").schema(df.schema).load(dir)
    assert(typed.as[(Long, java.sql.Timestamp)].collect().toSet ===
      df.as[(Long, java.sql.Timestamp)].collect().toSet)
    assert(typed.filter(
      $"ts" === java.sql.Timestamp.valueOf("2024-08-11 19:33:20")).count() === 1)
  }

  test("unsupported partition column types are rejected at plan time") {
    val dir = freshDir("graft-orc-w11")
    val e = intercept[Exception] {
      Seq((1L, 1.5d)).toDF("id", "score").write.format("graft-orc")
        .partitionBy("score").mode("append").save(dir)
    }
    assert(e.getMessage.contains("unsupported partition column type"),
      e.getMessage)
  }

  test("streaming sink rejects Complete output mode up front") {
    val src = freshDir("graft-orc-complete-src")
    val out = freshDir("graft-orc-complete-out")
    val ckpt = freshDir("graft-orc-complete-ckpt")
    nation.limit(5).write.mode("overwrite").parquet(src)
    val q = spark.readStream.schema(nation.schema).parquet(src)
      .groupBy($"n_regionkey").count()
      .writeStream.format("graft-orc")
      .option("checkpointLocation", ckpt)
      .outputMode("complete")
      .start(out)
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q.processAllAvailable()
    }
    q.stop()
    assert(e.getCause.getMessage.contains("Append/Update"),
      e.getCause.getMessage)
  }

  test("one write's commit leaves a concurrent write's staging untouched") {
    import org.apache.spark.sql.connector.write.LogicalWriteInfo
    val dir = freshDir("graft-orc-w12")
    def info = new LogicalWriteInfo {
      override def queryId(): String = "t"
      override def schema() = nation.schema
      override def options() =
        new org.apache.spark.sql.util.CaseInsensitiveStringMap(
          java.util.Map.of("path", dir))
    }
    val row = org.apache.spark.sql.catalyst.InternalRow(
      0, org.apache.spark.unsafe.types.UTF8String.fromString("x"), 0)
    // writer A stages a file and stays open
    val writeA = new graft.sources.v2.GraftOrcWriteBuilder(Seq(dir), info)
      .build()
    val wA = writeA.toBatch.createBatchWriterFactory(null).createWriter(0, 0L)
    wA.write(row)
    // writer B stages, commits and publishes while A is still staging
    val writeB = new graft.sources.v2.GraftOrcWriteBuilder(Seq(dir), info)
      .build()
    val batchB = writeB.toBatch
    val wB = batchB.createBatchWriterFactory(null).createWriter(0, 1L)
    wB.write(row)
    batchB.commit(Array(wB.commit()))
    // B's file is published; A's staged file survived B's cleanup
    assert(publishedOrcFiles(dir).size === 1)
    val mA = wA.commit()
    writeA.toBatch.commit(Array(mA))
    assert(publishedOrcFiles(dir).size === 2)
    assert(TestSpark.stagingClean(dir))
  }

  test("an orphaned attempt's staged file never rides a wave rename") {
    import org.apache.spark.sql.connector.write.LogicalWriteInfo
    val dir = freshDir("graft-orc-w14")
    val info = new LogicalWriteInfo {
      override def queryId(): String = "t"
      override def schema() = nation.schema
      override def options() =
        new org.apache.spark.sql.util.CaseInsensitiveStringMap(
          java.util.Map.of("path", dir))
    }
    val write = new graft.sources.v2.GraftOrcWriteBuilder(Seq(dir), info)
      .build()
    val batch = write.toBatch
    val w = batch.createBatchWriterFactory(null).createWriter(0, 0L)
    w.write(org.apache.spark.sql.catalyst.InternalRow(
      0, org.apache.spark.unsafe.types.UTF8String.fromString("x"), 0))
    // simulate a task attempt that died without abort: an extra staged
    // file in the same write's staging subtree, absent from the messages
    val sub = new java.io.File(dir, "_staging").listFiles().head
    val orphan = new java.io.File(sub, "part-0-0-deadattempt.snappy.orc")
    java.nio.file.Files.write(orphan.toPath, Array[Byte](1, 2, 3))
    batch.commit(Array(w.commit()))
    val published = publishedOrcFiles(dir)
    assert(published.size === 1, published.map(_.getName))
    assert(!published.head.getName.contains("deadattempt"))
    assert(TestSpark.stagingClean(dir))
  }

  test("published files carry strictly increasing mtimes") {
    val dir = freshDir("graft-orc-w13")
    nation.repartition(4).write.format("graft-orc").mode("append").save(dir)
    val times = publishedOrcFiles(dir).map(_.lastModified())
    assert(times.size === 4)
    assert(times.distinct.size === 4,
      s"expected distinct publish stamps, got $times")
  }

  test("watermarked streaming aggregation lands finalized windows in ORC") {
    // end-to-end streaming ETL: file stream -> event-time windowed count
    // (append mode emits a window only once its watermark passes) ->
    // graft-orc sink -> connector read-back
    val src = freshDir("graft-orc-agg-src")
    val out = freshDir("graft-orc-agg-out")
    val ckpt = freshDir("graft-orc-agg-ckpt")
    val events = Tables.events(spark, TestSpark.sf0001)
      .select($"event_id", $"ts", $"event_type")
    events.write.mode("overwrite").parquet(src)

    val stream = spark.readStream.schema(
        org.apache.spark.sql.types.StructType(events.schema.fields))
      .parquet(src)
      .withWatermark("ts", "1 hour")
      .groupBy(window($"ts", "1 hour"), $"event_type")
      .agg(count(lit(1)).as("n"))
      .select($"window.start".as("win_start"), $"event_type", $"n")
    val q = stream.writeStream.format("graft-orc")
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .start(out)
    try {
      q.processAllAvailable()
      // append a far-future event: its arrival advances the watermark past
      // every fixture window, so all previously-open windows finalize
      Seq((99999999L, java.sql.Timestamp.valueOf("2030-01-01 00:00:00"),
        "click"))
        .toDF("event_id", "ts", "event_type")
        .write.mode("append").parquet(src)
      q.processAllAvailable()
      q.processAllAvailable() // one more batch: emit newly-closed windows
    } finally q.stop()

    val sunk = spark.read.format("graft-orc").load(out)
    val batch = events
      .groupBy(window($"ts", "1 hour"), $"event_type")
      .agg(count(lit(1)).as("n"))
      .select($"window.start".as("win_start"), $"event_type", $"n")
    // every fixture window finalized and landed exactly once
    assert(sunk.count() === batch.count())
    assert(sunk.as[(java.sql.Timestamp, String, Long)].collect().toSet ===
      batch.as[(java.sql.Timestamp, String, Long)].collect().toSet)
  }

  test("streaming sink appends each epoch exactly once") {
    val src = freshDir("graft-orc-stream-src")
    val out = freshDir("graft-orc-stream-out")
    val ckpt = freshDir("graft-orc-stream-ckpt")
    // two epochs: one file visible at stream start, one added mid-stream
    nation.limit(10).write.mode("overwrite").parquet(src)

    val stream = spark.readStream.schema(nation.schema).parquet(src)
      .withColumn("n_name", upper($"n_name"))
    val q = stream.writeStream.format("graft-orc")
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .start(out)
    try {
      q.processAllAvailable()
      val afterEpoch1 = spark.read.format("graft-orc").load(out).count()
      assert(afterEpoch1 === 10)
      nation.filter($"n_nationkey" >= 10).limit(5)
        .write.mode("append").parquet(src)
      q.processAllAvailable()
      val back = spark.read.format("graft-orc").load(out)
      assert(back.count() === 15)
      // the transform ran through the sink, and values survive the ORC hop
      assert(back.select($"n_name").as[String].collect()
        .forall(s => s == s.toUpperCase))
    } finally q.stop()
    assert(TestSpark.stagingClean(out))
  }

  test("~1k files across ~50 partitions publish as bounded-parallel waves") {
    // Scale receipt for the wave protocol: 20 tasks x 50 partition values
    // = 1000 staged files, but the driver-side publish is 50 directory
    // renames (one per k=v suffix), never 1000 per-file RPCs. On a local
    // FS this commits in seconds; the same commit on an S3A-style store
    // pays a server-side COPY per file inside each "rename" — the caveat
    // documented in GraftOrcWrite's protocol Scaladoc next to the
    // partial-COMMIT note.
    val dir = freshDir("graft-orc-scale")
    // range-partition on the unique id: every ~200-id contiguous slice
    // covers all 50 id%50 values, so each of the 20 tasks stages ~50 files
    val df = spark.range(4000)
      .select(($"id" % 50).cast("int").as("pk"), $"id".as("v"))
      .repartitionByRange(20, $"v")
    val t0 = System.nanoTime()
    df.write.format("graft-orc").partitionBy("pk").mode("append").save(dir)
    val sec = (System.nanoTime() - t0) / 1e9
    val published = publishedOrcFiles(dir)
    assert(published.size >= 900 && published.size <= 1000,
      s"expected ~20 tasks x 50 partitions staged files, got ${published.size}")
    assert(new java.io.File(dir).listFiles().count(f =>
      f.isDirectory && f.getName.startsWith("pk=")) === 50)
    assert(TestSpark.stagingClean(dir),
      "commit must leave zero staging residue")
    // generous local-FS bound — catches an O(files)-serial-RPC regression
    // (1000 sequential renames + stamps would blow far past this)
    assert(sec < 60.0, s"1k-file partitioned commit took $sec s")
    // read-back proves the hive layout stayed consistent at this width
    val back = spark.read.format("graft-orc").load(dir)
    assert(back.count() === 4000)
    assert(back.filter($"pk" === 7).count() === 80)
  }

  test("truncate commit sweeps staging subtrees orphaned by dead drivers") {
    val dir = freshDir("graft-orc-gc")
    nation.write.format("graft-orc").mode("append").save(dir)
    // simulate a driver that died mid-write: a staged subtree nobody will
    // ever commit or abort, older than the GC threshold
    val orphan = new java.io.File(dir, "_staging/dead-driver-write-id")
    assert(orphan.mkdirs())
    val staged = new java.io.File(orphan, "part-0-0-x.snappy.orc")
    java.nio.file.Files.write(staged.toPath, Array[Byte](1, 2, 3))
    // age the WHOLE subtree: the sweep judges orphan-ness from the newest
    // entry anywhere under the writeId dir (a live writer streams fresh
    // files into old directories)
    val old = System.currentTimeMillis() -
      graft.sources.v2.GraftOrcWrite.OrphanStagingMaxAgeMs - 60000
    orphan.setLastModified(old)
    staged.setLastModified(old)
    // a LIVE long-running writer: old directory mtime but a freshly
    // staged file — must never be swept
    val live = new java.io.File(dir, "_staging/live-writer-id")
    assert(live.mkdirs())
    java.nio.file.Files.write(
      new java.io.File(live, "part-0-1-y.snappy.orc").toPath,
      Array[Byte](4, 5, 6))
    live.setLastModified(old)
    // an append must NOT touch either (could be a live concurrent writer)
    nation.write.format("graft-orc").mode("append").save(dir)
    assert(orphan.exists(), "append swept a staging subtree it doesn't own")
    // ...a truncate commit sweeps the stale one but keeps the live one
    nation.write.format("graft-orc").mode("overwrite").save(dir)
    assert(!orphan.exists(), "overwrite commit must GC stale orphans")
    assert(live.exists(),
      "a subtree with fresh staged files is a live writer, not an orphan")
    assert(spark.read.format("graft-orc").load(dir).count() === nation.count())
  }

  test("first publish seeds the stamp counter above existing table mtimes") {
    // cross-JVM watermark monotonicity: a fresh driver's counter starts at
    // 0, so without seeding its first commit could stamp files at or below
    // a streaming reader's already-consumed (mtime, path) watermark. A
    // fresh TABLE path stands in for a fresh JVM here (seeding is
    // memoized per table): plant a published file with a FUTURE mtime,
    // then commit — new stamps must land strictly above it.
    val src = freshDir("graft-orc-seed-src")
    nation.write.format("graft-orc").mode("append").save(src)
    val dir = freshDir("graft-orc-seed")
    val planted = new java.io.File(dir, "w-planted")
    assert(planted.mkdirs())
    val donor = publishedOrcFiles(src).head
    val copy = new java.io.File(planted, donor.getName)
    java.nio.file.Files.copy(donor.toPath, copy.toPath)
    val future = System.currentTimeMillis() + 30000
    assert(copy.setLastModified(future))
    nation.write.format("graft-orc").mode("append").save(dir)
    val fresh = publishedOrcFiles(dir).filterNot(_.getName == donor.getName)
    assert(fresh.nonEmpty)
    assert(fresh.map(_.lastModified()).min > future,
      "new publish stamps must exceed the max mtime already in the table")
  }
}
