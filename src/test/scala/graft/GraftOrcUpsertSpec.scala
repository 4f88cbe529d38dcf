package graft

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.v2.{GraftOrcChangelog, GraftOrcEqDelete, GraftOrcManifest, GraftOrcMor}

/** Equality deletes + blind upsert ([[GraftOrcEqDelete]]): the CDC-apply
  * path that NEVER reads the target. Contracts under test: newest-wins
  * per key with the batch's own rows surviving their own delete (the
  * stamp-order applicability rule), zero pre-existing files touched by
  * an upsert commit, stacking upserts, forced key-column reads when the
  * query does not project the keys, null keys never deleting, purge
  * materializing the deletes and restoring exact statistics, the
  * streaming sink's `graft.upsert_keys` mode, and changelog
  * reconstruction of an upsert as delete+insert images.
  */
class GraftOrcUpsertSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def conf = spark.sparkContext.hadoopConfiguration
  private def freshDir(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def fs(dir: String) =
    new Path(dir).getFileSystem(conf)

  private def snap(dir: String) =
    GraftOrcManifest.readSnapshot(fs(dir), new Path(dir)).get

  private def baseTable(): String = {
    val dir = freshDir("graft-upsert")
    (1 to 8).map(i => (i, s"v$i")).toDF("k", "v").coalesce(2)
      .write.format("graft-orc").option("graft.manifest", "true")
      .option("graft.manifest.retain", "5").mode("overwrite").save(dir)
    dir
  }

  private def readKV(dir: String): Seq[(Int, String)] =
    spark.read.format("graft-orc").load(dir)
      .as[(Int, String)].collect().sorted.toSeq

  test("blind upsert: newest wins per key, new keys append, the upsert " +
    "touches ZERO pre-existing data files, and old snapshots still read " +
    "the pre-upsert state") {
    val dir = baseTable()
    val before = snap(dir).entries.map(_.path).toSet
    GraftOrcEqDelete.upsert(spark, dir,
      Seq((2, "v2b"), (5, "v5b"), (99, "new")).toDF("k", "v"), Seq("k"))
    assert(readKV(dir) == Seq(1 -> "v1", 2 -> "v2b", 3 -> "v3",
      4 -> "v4", 5 -> "v5b", 6 -> "v6", 7 -> "v7", 8 -> "v8",
      99 -> "new"))
    val after = snap(dir)
    // every pre-existing file kept its identity; one e- sidecar committed
    assert(before.subsetOf(after.entries.map(_.path).toSet))
    assert(after.deletes.size == 1 &&
      GraftOrcEqDelete.isEqualitySidecar(after.deletes.head.path))
    assert(after.op.contains("upsert"))
    // time travel: the pre-upsert snapshot is untouched
    val old = spark.read.format("graft-orc")
      .option("graft.snapshot_id", "1").load(dir)
      .as[(Int, String)].collect().sorted.toSeq
    assert(old == (1 to 8).map(i => (i, s"v$i")))
  }

  test("upserts stack (later beats earlier beats base); a query that " +
    "does not project the key still resolves (forced key read); null " +
    "keys append without deleting") {
    val dir = baseTable()
    GraftOrcEqDelete.upsert(spark, dir,
      Seq((3, "first")).toDF("k", "v"), Seq("k"))
    GraftOrcEqDelete.upsert(spark, dir,
      Seq((3, "second"), (4, "fourth")).toDF("k", "v"), Seq("k"))
    assert(readKV(dir).toMap == Map(1 -> "v1", 2 -> "v2", 3 -> "second",
      4 -> "fourth", 5 -> "v5", 6 -> "v6", 7 -> "v7", 8 -> "v8"))
    // project ONLY v: the reader force-reads k to apply the deletes
    val vs = spark.read.format("graft-orc").load(dir)
      .select("v").as[String].collect().sorted.toSeq
    assert(vs == Seq("fourth", "second", "v1", "v2", "v5", "v6", "v7",
      "v8"))
    // a null-keyed upsert row appends and deletes nothing
    GraftOrcEqDelete.upsert(spark, dir,
      Seq((Option.empty[Int], "nullkey")).toDF("k", "v"), Seq("k"))
    val withNull = spark.read.format("graft-orc").load(dir)
      .select("v").as[String].collect().sorted.toSeq
    assert(withNull.contains("nullkey") && withNull.size == 9)
  }

  test("purge materializes equality deletes: sidecars retire, results " +
    "identical, plan-time row counts exact again") {
    val dir = baseTable()
    GraftOrcEqDelete.upsert(spark, dir,
      Seq((1, "one"), (42, "forty-two")).toDF("k", "v"), Seq("k"))
    val expected = readKV(dir)
    // degraded while live: the scan must not report an exact row count
    val preStats = spark.read.format("graft-orc").load(dir)
      .queryExecution.optimizedPlan.stats
    assert(preStats.rowCount.isEmpty,
      s"row count must degrade under live eq sidecars: $preStats")
    assert(GraftOrcMor.purge(spark, dir) > 0)
    assert(snap(dir).deletes.isEmpty)
    assert(readKV(dir) == expected)
    val postStats = spark.read.format("graft-orc").load(dir)
      .queryExecution.optimizedPlan.stats
    assert(postStats.rowCount.isDefined,
      "purge must restore exact plan-time row counts")
  }

  test("streaming sink graft.upsert_keys: each epoch commits data plus " +
    "its key sidecar — per-key newest wins across epochs, exactly-once " +
    "across restart") {
    val dir = freshDir("graft-upsert-stream")
    val ckpt = freshDir("graft-upsert-ckpt")
    // establish the target with a schema
    Seq((1, "base1"), (2, "base2")).toDF("k", "v").coalesce(1)
      .write.format("graft-orc").option("graft.manifest", "true")
      .mode("overwrite").save(dir)
    implicit val sqlCtx = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Int, String)]
    val q = mem.toDF().toDF("k", "v").writeStream
      .format("graft-orc")
      .option("checkpointLocation", ckpt)
      .option("graft.upsert_keys", "k")
      .outputMode("append")
      .start(dir)
    try {
      mem.addData((2, "epoch1"), (3, "epoch1"))
      q.processAllAvailable()
      mem.addData((3, "epoch2"))
      q.processAllAvailable()
    } finally q.stop()
    assert(readKV(dir).toMap == Map(1 -> "base1", 2 -> "epoch1",
      3 -> "epoch2"))
    // two upsert epochs -> two equality sidecars until a purge
    assert(snap(dir).deletes.count(e =>
      GraftOrcEqDelete.isEqualitySidecar(e.path)) == 2)
  }

  test("changelog reconstructs an upsert as delete images of the prior " +
    "key rows plus insert images of the new rows") {
    val dir = baseTable()                                     // seq 1
    GraftOrcEqDelete.upsert(spark, dir,
      Seq((2, "v2b"), (99, "new")).toDF("k", "v"), Seq("k")) // seq 2
    val chg = GraftOrcChangelog.between(spark, dir, 1L)
      .select($"k", $"v", $"_change_type")
      .as[(Int, String, String)].collect().sorted.toSeq
    assert(chg == Seq((2, "v2", "delete"), (2, "v2b", "insert"),
      (99, "new", "insert")))
    // and across a second upsert of the SAME key, each step attributes
    // its own delete/insert pair
    GraftOrcEqDelete.upsert(spark, dir,
      Seq((2, "v2c")).toDF("k", "v"), Seq("k"))              // seq 3
    val chg2 = GraftOrcChangelog.between(spark, dir, 2L)
      .select($"k", $"v", $"_change_type")
      .as[(Int, String, String)].collect().sorted.toSeq
    assert(chg2 == Seq((2, "v2b", "delete"), (2, "v2c", "insert")))
  }

  test("non-additive DDL is refused while equality sidecars are live; " +
    "purge clears the restriction and ADD COLUMN is always allowed") {
    val dir = baseTable()
    GraftOrcEqDelete.upsert(spark, dir,
      Seq((1, "one")).toDF("k", "v"), Seq("k"))
    val hconf = conf
    // additive: fine
    graft.sources.v2.GraftOrcSchema.alter(hconf, dir)(
      graft.sources.v2.GraftOrcSchema.addColumn(_, "extra",
        org.apache.spark.sql.types.StringType))
    // rename under live eq sidecars: refused with the purge hint
    val err = intercept[IllegalArgumentException] {
      graft.sources.v2.GraftOrcSchema.alter(hconf, dir)(
        graft.sources.v2.GraftOrcSchema.renameColumn(_, "k", "key"))
    }
    assert(err.getMessage.contains("purge"))
    GraftOrcMor.purge(spark, dir)
    graft.sources.v2.GraftOrcSchema.alter(hconf, dir)(
      graft.sources.v2.GraftOrcSchema.renameColumn(_, "k", "key"))
    assert(spark.read.format("graft-orc").load(dir)
      .select("key", "v").as[(Int, String)].collect().sorted.toSeq
      .take(2) == Seq(1 -> "one", 2 -> "v2"))
  }

  test("partitioned upsert: rows land in their hive directories, old " +
    "key versions across partitions read as deleted, pruning intact; " +
    "the BATCH writer option commits the same shape") {
    val dir = freshDir("graft-upsert-part")
    Seq((1, "a", 10), (2, "b", 10), (3, "c", 20)).toDF("k", "v", "p")
      .coalesce(1).write.format("graft-orc")
      .option("graft.manifest", "true")
      .partitionBy("p").mode("overwrite").save(dir)
    // API upsert with the partition column in the batch — key 2 moves
    // content within p=10, key 9 lands in new partition p=30
    GraftOrcEqDelete.upsert(spark, dir,
      Seq((2, "b2", 10), (9, "nine", 30)).toDF("k", "v", "p"), Seq("k"))
    val rows = spark.read.format("graft-orc").load(dir)
      .select("k", "v", "p").as[(Int, String, Int)].collect().sorted.toSeq
    assert(rows == Seq((1, "a", 10), (2, "b2", 10), (3, "c", 20),
      (9, "nine", 30)))
    val fsys = fs(dir)
    assert(fsys.exists(new Path(s"$dir/p=30")))
    // partition pruning still engages under the row-wise delete wrapper
    assert(spark.read.format("graft-orc").load(dir)
      .filter($"p" === 20).select("k").as[Int].collect().toSeq == Seq(3))
    // the batch WRITER option is the same machinery: an append with
    // graft.upsert_keys commits data + key sidecar in one snapshot
    Seq((3, "c2", 20)).toDF("k", "v", "p").coalesce(1)
      .write.format("graft-orc").option("graft.upsert_keys", "k")
      .partitionBy("p").mode("append").save(dir)
    val after = spark.read.format("graft-orc").load(dir)
      .select("k", "v").as[(Int, String)].collect().sorted.toSeq
    assert(after == Seq(1 -> "a", 2 -> "b2", 3 -> "c2", 9 -> "nine"))
    assert(snap(dir).op.contains("upsert"))
  }

  test("a partition column is rejected as an equality key — it is " +
    "absent from the data files the sidecar is matched against, so " +
    "accepting it would poison every later read") {
    val dir = freshDir("graft-upsert-partkey")
    Seq((1, "a", 10)).toDF("k", "v", "p").coalesce(1)
      .write.format("graft-orc").option("graft.manifest", "true")
      .partitionBy("p").mode("overwrite").save(dir)
    val err = intercept[IllegalArgumentException] {
      GraftOrcEqDelete.upsert(spark, dir,
        Seq((2, "b", 10)).toDF("k", "v", "p"), Seq("p"))
    }
    assert(err.getMessage.contains("partition column"))
    // nothing committed: the table reads exactly as before
    assert(spark.read.format("graft-orc").load(dir).count() == 1)
    assert(snap(dir).deletes.isEmpty)
  }

  test("a wide partitioned upsert batch is ONE hash-distributed Spark " +
    "write job (plus the key-sidecar write) — not one job per touched " +
    "partition") {
    val dir = freshDir("graft-upsert-widejob")
    (1 to 12).map(i => (i, s"v$i", i % 6)).toDF("k", "v", "p")
      .repartition(2).write.format("graft-orc")
      .option("graft.manifest", "true").partitionBy("p")
      .mode("overwrite").save(dir)
    val jobs = new java.util.concurrent.atomic.AtomicInteger()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      GraftOrcEqDelete.upsert(spark, dir,
        (1 to 12).map(i => (i, s"n$i", i % 6)).toDF("k", "v", "p"),
        Seq("k"))
      org.apache.spark.GraftSparkBridge
        .waitUntilListenerBusEmpty(spark.sparkContext)
    } finally spark.sparkContext.removeSparkListener(listener)
    // 6 touched partitions, CONSTANT job count (sidecar write + ONE
    // partitioned data write, each with AQE shuffle-materialization
    // jobs) — the old loop ran one data job PER partition plus a
    // distinct scan, i.e. >= 7 here and 500+ on a wide CDC batch
    assert(jobs.get() <= 5, s"upsert ran ${jobs.get()} jobs")
    // correctness of the single-job layout: every key took its new
    // value in its hive partition, pruning intact
    val rows = spark.read.format("graft-orc").load(dir)
      .select("k", "v", "p").as[(Int, String, Int)].collect().sorted.toSeq
    assert(rows == (1 to 12).map(i => (i, s"n$i", i % 6)).sorted)
    assert(spark.read.format("graft-orc").load(dir)
      .filter($"p" === 3).select("k").as[Int].collect().sorted.toSeq ==
      Seq(3, 9))
  }

  test("equality-delete read budget: sidecars holding more key tuples " +
    "than graft.eq_delete_budget_rows fail the scan with the typed " +
    "purge-required error (not an OOM); the graftEqDeleteKeys metric " +
    "reports set sizes; purge clears the restriction") {
    val dir = baseTable()
    GraftOrcEqDelete.upsert(spark, dir,
      Seq((1, "x"), (2, "y"), (3, "z")).toDF("k", "v"), Seq("k"))
    // 3 tuples against a budget of 2: typed failure naming the remedy
    val err = intercept[Exception] {
      spark.read.format("graft-orc")
        .option("graft.eq_delete_budget_rows", "2").load(dir).count()
    }
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    assert(chain(err).exists(
      _.isInstanceOf[GraftOrcEqDelete.EqDeleteBudgetExceeded]),
      chain(err).map(_.getClass.getName))
    assert(chain(err).exists(t =>
      Option(t.getMessage).exists(_.contains("purge"))))
    // a malformed budget value is a typed option error
    assertThrows[IllegalArgumentException] {
      spark.read.format("graft-orc")
        .option("graft.eq_delete_budget_rows", "lots").load(dir).count()
    }
    // within budget: the scan works and the metric reports the per-task
    // key-set size (each task loads the whole set)
    val df = spark.read.format("graft-orc").load(dir)
    df.collect()
    val leaf = df.queryExecution.executedPlan.collectLeaves().head
    val keys = leaf.metrics.find(_._1 == "graftEqDeleteKeys").map(_._2.value)
    assert(keys.exists(_ >= 3L), s"graftEqDeleteKeys: $keys")
    // purge retires the sidecars; even a budget of 0 reads fine
    GraftOrcMor.purge(spark, dir)
    assert(spark.read.format("graft-orc")
      .option("graft.eq_delete_budget_rows", "0").load(dir)
      .count() == 8)
  }

  test("purge prunes by sidecar key range: only files whose stat range " +
    "intersects the upserted keys are rewritten — the rest keep their " +
    "identity (purge cost ∝ files the CDC batch touched, not the table)") {
    val dir = freshDir("graft-upsert-prune")
    // three files with DISJOINT key ranges
    Seq.tabulate(3) { f =>
      (1 to 50).map(i => (f * 1000 + i, s"f$f-$i")).toDF("k", "v")
        .coalesce(1).write.format("graft-orc")
        .option("graft.manifest", "true").mode("append").save(dir)
    }
    GraftOrcEqDelete.upsert(spark, dir,
      Seq((1025, "hit")).toDF("k", "v"), Seq("k"))
    val before = snap(dir).entries.map(_.path).toSet
    // read-path twin of the same prune: only the ONE affected file's
    // task loads the key set (graftEqDeleteKeys sums per task — 3
    // unpruned files would report 3+)
    val probe = spark.read.format("graft-orc").load(dir)
    probe.collect()
    val loaded = probe.queryExecution.executedPlan.collectLeaves().head
      .metrics.find(_._1 == "graftEqDeleteKeys").map(_._2.value)
    assert(loaded.contains(1L),
      s"only the affected file's task should load keys: $loaded")
    // only the f=1 file (keys 1001..1050) can hold key 1025; the
    // upsert's own data file is NEWER than the sidecar
    assert(GraftOrcMor.purge(spark, dir) == 1)
    val after = snap(dir)
    assert(after.deletes.isEmpty)
    val kept = before.intersect(after.entries.map(_.path).toSet)
    assert(kept.size == before.size - 1,
      s"exactly one file rewritten: kept ${kept.size} of ${before.size}")
    // content: the upserted value won, everything else intact
    val rows = spark.read.format("graft-orc").load(dir)
      .as[(Int, String)].collect().toMap
    assert(rows(1025) == "hit" && rows(25) == "f0-25" &&
      rows(2025) == "f2-25" && rows.size == 150)
  }

  test("typed errors: unsupported key types and non-manifest targets") {
    val dir = freshDir("graft-upsert-err")
    Seq((1, 1.5)).toDF("k", "f").coalesce(1)
      .write.format("graft-orc").option("graft.manifest", "true")
      .mode("overwrite").save(dir)
    assertThrows[IllegalArgumentException] {
      GraftOrcEqDelete.upsert(spark, dir,
        Seq((1, 2.5)).toDF("k", "f"), Seq("f")) // double key
    }
    val plain = freshDir("graft-upsert-plain")
    Seq((1, "x")).toDF("k", "v").write.format("graft-orc")
      .mode("overwrite").save(plain)
    assertThrows[IllegalArgumentException] {
      GraftOrcEqDelete.upsert(spark, plain,
        Seq((1, "y")).toDF("k", "v"), Seq("k"))
    }
  }

  test("upsert into a TIMESTAMP-partitioned table under a non-UTC " +
    "session lands rows in the SAME UTC directories the writer " +
    "produces — no partition split, values round-trip exactly") {
    val tzKey = "spark.sql.session.timeZone"
    val saved = spark.conf.get(tzKey)
    val dir = freshDir("graft-upsert-tz")
    try {
      // Spark's own partitionBy formats timestamp dirs in the SESSION
      // zone; graft writes/parses them as UTC. A -8h zone shifts
      // "2020-06-01 04:00:00" into "2020-05-31 ..." — a split
      // partition and a wrong re-materialized ts unless the upsert
      // staging derives graft's own UTC strings.
      spark.conf.set(tzKey, "America/Los_Angeles")
      val mkTs = (s: String) =>
        java.sql.Timestamp.from(java.time.Instant.parse(s))
      Seq((1, "a", mkTs("2020-06-01T04:00:00Z")),
          (2, "b", mkTs("2020-06-01T04:00:00Z")),
          (3, "c", mkTs("2020-06-02T23:30:00.250Z")))
        .toDF("k", "v", "ts").coalesce(1)
        .write.format("graft-orc").option("graft.manifest", "true")
        .partitionBy("ts").mode("overwrite").save(dir)
      val fsys = fs(dir)
      def tsDirs() = fsys.listStatus(new Path(dir)).toSeq
        .filter(st => st.isDirectory && st.getPath.getName.startsWith("ts="))
        .map(st => st.getPath.getName).sorted
      val before = tsDirs()
      assert(before.size == 2, before)
      // upsert touches one existing partition + creates one new
      GraftOrcEqDelete.upsert(spark, dir,
        Seq((2, "b2", mkTs("2020-06-01T04:00:00Z")),
            (9, "new", mkTs("2020-07-04T12:00:00Z")))
          .toDF("k", "v", "ts"), Seq("k"))
      val after = tsDirs()
      assert(after.size == 3,
        s"existing UTC partition must be REUSED, not split: $after")
      assert(before.forall(after.contains), s"$before vs $after")
      // values re-materialize from the path as the writer's exact UTC
      // strings regardless of the session zone (this path-written table
      // has no persisted meta, so the partition column reads back as the
      // raw directory value — pre-fix, key 2 split into a
      // "2020-05-31 21:00:00" local-zone dir and key 9 read 7h early)
      val got = spark.read.format("graft-orc").load(dir)
        .select($"k", $"v", $"ts".cast("string"))
        .as[(Int, String, String)].collect().sorted.toSeq
      assert(got == Seq(
        (1, "a", "2020-06-01 04:00:00"),
        (2, "b2", "2020-06-01 04:00:00"),
        (3, "c", "2020-06-02 23:30:00.250000"),
        (9, "new", "2020-07-04 12:00:00")), got)
    } finally {
      spark.conf.set(tzKey, saved)
    }
  }
}
