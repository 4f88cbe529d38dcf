package graft

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.v2.{GraftOrcCompact, GraftOrcManifest}

/** Time travel, incremental reads, retention, and vacuum over the
  * manifest log — the invariant under test: a RETAINED snapshot is always
  * readable, byte-for-byte, no matter what truncates or compactions came
  * after it; files die only at snapshot expiry (or vacuum, for garbage no
  * snapshot ever referenced).
  */
class GraftOrcTimeTravelSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshDir(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def nation = Tables.nation(spark, TestSpark.sf0001)

  private def fs(dir: String) = new Path(dir)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def history(dir: String): Seq[GraftOrcManifest.SnapshotRef] =
    GraftOrcManifest.listSnapshots(fs(dir), new Path(dir)).get

  private def keysAt(dir: String, opts: (String, String)*): Seq[Int] = {
    val r = spark.read.format("graft-orc")
    opts.foreach { case (k, v) => r.option(k, v) }
    r.load(dir).select($"n_nationkey").as[Int].collect().sorted.toSeq
  }

  /** Three commits: keys 0..4 (overwrite), 5..11 (append), 12..24
    * (append). Returns the directory.
    */
  private def threeCommits(): String = {
    val dir = freshDir("graft-timetravel")
    def slice(lo: Int, hi: Int) =
      nation.filter($"n_nationkey" >= lo && $"n_nationkey" < hi).coalesce(1)
    slice(0, 5).write.format("graft-orc").option("graft.manifest", "true")
      .mode("overwrite").save(dir)                       // snap 1
    slice(5, 12).write.format("graft-orc").mode("append").save(dir) // snap 2
    slice(12, 25).write.format("graft-orc").mode("append").save(dir) // snap 3
    dir
  }

  test("graft.on_rewrite governs the batch incremental read at a " +
    "copy-on-write snapshot: replay re-emits survivors, fail stops, " +
    "skip drops the rewrite's files") {
    val dir = freshDir("graft-timetravel-onrw")
    nation.filter($"n_nationkey" < 10).coalesce(1)
      .write.format("graft-orc").option("graft.manifest", "true")
      .mode("overwrite").save(dir)                              // snap 1
    // snap 2: CoW DELETE rewrites the single file (key 3 removed)
    spark.sql(s"CREATE TABLE g_ttonrw USING `graft-orc` LOCATION '$dir'")
    try spark.sql("DELETE FROM g_ttonrw WHERE n_nationkey = 3")
    finally spark.sql("DROP TABLE IF EXISTS g_ttonrw")
    // snap 3: pure append
    nation.filter($"n_nationkey" >= 10 && $"n_nationkey" < 15).coalesce(1)
      .write.format("graft-orc").mode("append").save(dir)
    // default (replay): endpoint diff — the rewrite's survivors reappear
    assert(keysAt(dir, "graft.start_snapshot_id" -> "1") ===
      ((0 until 10).filterNot(_ == 3) ++ (10 until 15)))
    // skip: only the append flows
    assert(keysAt(dir, "graft.start_snapshot_id" -> "1",
      "graft.on_rewrite" -> "skip") === (10 until 15))
    // fail: typed error naming the snapshot and the option
    val e = intercept[Exception] {
      keysAt(dir, "graft.start_snapshot_id" -> "1",
        "graft.on_rewrite" -> "fail")
    }
    assert(e.getMessage.contains("graft.on_rewrite") &&
      e.getMessage.contains("append-only"), e.getMessage)
    // an invalid policy value is refused up front
    val e2 = intercept[Exception] {
      keysAt(dir, "graft.start_snapshot_id" -> "1",
        "graft.on_rewrite" -> "bogus")
    }
    assert(e2.getMessage.contains("graft.on_rewrite"), e2.getMessage)
    // full reads ignore the policy (it scopes to incremental diffs)
    assert(keysAt(dir, "graft.on_rewrite" -> "fail") ===
      ((0 until 10).filterNot(_ == 3) ++ (10 until 15)))
  }

  test("graft.snapshot_id reads a retained snapshot; default reads the " +
    "newest") {
    val dir = threeCommits()
    assert(history(dir).map(_.seq) === Seq(1L, 2L, 3L))
    assert(keysAt(dir) === (0 until 25))
    assert(keysAt(dir, "graft.snapshot_id" -> "1") === (0 until 5))
    assert(keysAt(dir, "graft.snapshot_id" -> "2") === (0 until 12))
    assert(keysAt(dir, "graft.snapshot_id" -> "3") === (0 until 25))
  }

  test("graft.as_of_timestamp picks the newest snapshot at or before the " +
    "instant, in any accepted form") {
    val dir = threeCommits()
    val h = history(dir)
    // exactly at snap 2's commit instant -> snap 2; far future -> newest
    assert(keysAt(dir,
      "graft.as_of_timestamp" -> h(1).commitMs.toString) === (0 until 12))
    assert(keysAt(dir,
      "graft.as_of_timestamp" -> (h(2).commitMs + 100000).toString) ===
      (0 until 25))
    // ISO-8601 instant form
    val iso = java.time.Instant.ofEpochMilli(h(1).commitMs).toString
    assert(keysAt(dir, "graft.as_of_timestamp" -> iso) === (0 until 12))
    // before the first retained snapshot: typed error naming the range
    val e = intercept[Exception] {
      keysAt(dir, "graft.as_of_timestamp" -> (h.head.commitMs - 1).toString)
    }
    assert(e.getMessage.contains("no snapshot"), e.getMessage)
  }

  test("graft.start_snapshot_id scans only files appended after the " +
    "start snapshot, composing with the end selector") {
    val dir = threeCommits()
    assert(keysAt(dir, "graft.start_snapshot_id" -> "1") === (5 until 25))
    // start + end: exactly the second commit's rows
    assert(keysAt(dir, "graft.start_snapshot_id" -> "1",
      "graft.snapshot_id" -> "2") === (5 until 12))
    // 0 = before the first snapshot: everything is new
    assert(keysAt(dir, "graft.start_snapshot_id" -> "0") === (0 until 25))
    // start == end: nothing appended
    assert(spark.read.format("graft-orc")
      .option("graft.start_snapshot_id", "3").load(dir).count() === 0L)
  }

  test("a retained pre-compaction snapshot stays readable after the " +
    "compaction rewrote its files") {
    val dir = freshDir("graft-timetravel-compact")
    def slice(lo: Int, hi: Int) =
      nation.filter($"n_nationkey" >= lo && $"n_nationkey" < hi)
    slice(0, 10).repartition(4).write.format("graft-orc")
      .option("graft.manifest", "true").mode("overwrite").save(dir) // snap 1
    slice(10, 25).repartition(4).write.format("graft-orc")
      .mode("append").save(dir)                                     // snap 2
    val stats = GraftOrcCompact.compact(spark, dir)                 // snap 3
    assert(stats.bins > 0, "fixture must actually compact")
    assert(keysAt(dir) === (0 until 25))
    // the pre-compaction snapshots still read their ORIGINAL files
    assert(keysAt(dir, "graft.snapshot_id" -> "1") === (0 until 10))
    assert(keysAt(dir, "graft.snapshot_id" -> "2") === (0 until 25))
    // incremental across a compaction: rewritten files reappear as their
    // merged outputs — a consumer sees rows again (documented; consumers
    // wanting append-only feeds should read between pre-compaction
    // snapshots or dedup downstream)
    assert(keysAt(dir, "graft.start_snapshot_id" -> "2").nonEmpty)

    // ...until expiry: two more commits push snaps 1-2 out of the
    // default retention, the compacted INPUT files die with them, and a
    // time travel to the pre-compaction state now fails with the typed
    // not-retained error — while the current table stays complete
    nation.filter($"n_nationkey" === 0).coalesce(1).write
      .format("graft-orc").mode("append").save(dir)               // snap 4
    nation.filter($"n_nationkey" === 1).coalesce(1).write
      .format("graft-orc").mode("append").save(dir)               // snap 5
    assert(history(dir).map(_.seq) === Seq(3L, 4L, 5L))
    val e = intercept[Exception] { keysAt(dir, "graft.snapshot_id" -> "2") }
    assert(e.getMessage.contains("not retained") &&
      e.getMessage.contains("graft.manifest.retain"), e.getMessage)
    assert(keysAt(dir) === Seq(0, 0, 1) ++ (1 until 25),
      "the live table must be untouched by pre-compaction expiry")
  }

  test("expired snapshots are gone and unreadable; raising " +
    "graft.manifest.retain keeps deeper history") {
    val dir = freshDir("graft-timetravel-expiry")
    def one(i: Int) = nation.filter($"n_nationkey" === i).coalesce(1)
    (0 until 5).foreach { i =>
      one(i).write.format("graft-orc").option("graft.manifest", "true")
        .mode("append").save(dir)
    }
    // default retention 3: snaps 1-2 expired
    assert(history(dir).map(_.seq) === Seq(3L, 4L, 5L))
    val e = intercept[Exception] { keysAt(dir, "graft.snapshot_id" -> "1") }
    assert(e.getMessage.contains("not retained") &&
      e.getMessage.contains("graft.manifest.retain"), e.getMessage)

    val deep = freshDir("graft-timetravel-deep")
    (0 until 5).foreach { i =>
      one(i).write.format("graft-orc").option("graft.manifest", "true")
        .option("graft.manifest.retain", "5").mode("append").save(deep)
    }
    assert(history(deep).map(_.seq) === Seq(1L, 2L, 3L, 4L, 5L))
    assert(keysAt(deep, "graft.snapshot_id" -> "1") === Seq(0))
  }

  test("time-travel options reject non-manifest tables and conflicting " +
    "selectors with typed errors") {
    val plain = freshDir("graft-timetravel-plain")
    nation.write.format("graft-orc").mode("overwrite").save(plain)
    val e1 = intercept[Exception] { keysAt(plain, "graft.snapshot_id" -> "1") }
    assert(e1.getMessage.contains("manifest"), e1.getMessage)

    val dir = threeCommits()
    val e2 = intercept[Exception] {
      keysAt(dir, "graft.snapshot_id" -> "1",
        "graft.as_of_timestamp" -> "123")
    }
    assert(e2.getMessage.contains("mutually exclusive"), e2.getMessage)
    val e3 = intercept[Exception] { keysAt(dir, "graft.snapshot_id" -> "99") }
    assert(e3.getMessage.contains("not retained"), e3.getMessage)
    val e4 = intercept[Exception] {
      keysAt(dir, "graft.start_snapshot_id" -> "3",
        "graft.snapshot_id" -> "2")
    }
    assert(e4.getMessage.contains("newer than"), e4.getMessage)
  }

  test("vacuum sweeps files no retained snapshot references, never live " +
    "ones") {
    val dir = threeCommits()
    // smuggle BFS-visible garbage in (a crashed commit's renamed wave)
    def anyOrc(f: java.io.File): Option[java.io.File] =
      if (f.isFile) Some(f).filter(_.getName.endsWith(".orc"))
      else if (f.getName.startsWith("_")) None
      else Option(f.listFiles()).toSeq.flatten.flatMap(anyOrc).headOption
    val live = anyOrc(new java.io.File(dir)).get
    val stray = new java.io.File(dir, "w-crashed/leftover.orc")
    stray.getParentFile.mkdirs()
    java.nio.file.Files.copy(live.toPath, stray.toPath)
    assert(keysAt(dir) === (0 until 25), "garbage must be invisible anyway")

    val conf = spark.sparkContext.hadoopConfiguration
    assert(GraftOrcManifest.vacuum(conf, dir) === 1)
    assert(!stray.exists(), "garbage must be deleted")
    assert(!stray.getParentFile.exists(), "emptied wave dir must be pruned")
    assert(GraftOrcManifest.vacuum(conf, dir) === 0, "vacuum is idempotent")
    assert(keysAt(dir) === (0 until 25))
    assert(keysAt(dir, "graft.snapshot_id" -> "1") === (0 until 5),
      "vacuum must never touch retained-snapshot files")

    val plain = freshDir("graft-timetravel-vacuum-plain")
    nation.write.format("graft-orc").mode("overwrite").save(plain)
    val e = intercept[IllegalArgumentException] {
      GraftOrcManifest.vacuum(conf, plain)
    }
    assert(e.getMessage.contains("manifest"), e.getMessage)
  }
}
