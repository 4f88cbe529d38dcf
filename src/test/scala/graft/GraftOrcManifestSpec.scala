package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.v2.{GraftOrcCompact, GraftOrcEqDelete, GraftOrcManifest, GraftOrcMor}

/** Manifest-commit mode: one atomic snapshot file defines the table
  * (the metadata-log upgrade for object stores — no partial-COMMIT
  * window, no compaction duplicate window, no rename-is-a-copy
  * exposure). Opt-in per write; sticky per table once established.
  */
class GraftOrcManifestSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshDir(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def nation = Tables.nation(spark, TestSpark.sf0001)

  private def snapshots(dir: String): Seq[String] = {
    val d = new java.io.File(dir, "_graft_manifest")
    Option(d.listFiles()).toSeq.flatten.map(_.getName)
      .filter(n => n.startsWith("snap-") && n.endsWith(".json")).sorted
  }

  private def orcFilesOnDisk(dir: String): Seq[java.io.File] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isFile) Seq(f).filter(_.getName.endsWith(".orc"))
      else if (f.getName.startsWith("_")) Nil
      else Option(f.listFiles()).toSeq.flatten.flatMap(walk)
    walk(new java.io.File(dir))
  }

  test("manifest write commits one snapshot; the manifest IS the listing") {
    val dir = freshDir("graft-manifest-1")
    nation.write.format("graft-orc").option("graft.manifest", "true")
      .mode("append").save(dir)
    assert(snapshots(dir).size === 1, "one snapshot per commit")

    val back = spark.read.format("graft-orc").load(dir)
    assert(back.orderBy($"n_nationkey").collect().toSeq ===
      nation.orderBy($"n_nationkey").collect().toSeq)

    // a stray file smuggled into the directory is NOT part of the table:
    // manifest readers never BFS, so crash leftovers/partial commits are
    // invisible by construction
    val real = orcFilesOnDisk(dir).head
    val stray = new java.io.File(dir, "stray-file.orc")
    java.nio.file.Files.copy(real.toPath, stray.toPath)
    assert(spark.read.format("graft-orc").load(dir).count() === nation.count(),
      "unmanifested files must stay invisible")
  }

  test("manifest is sticky: an optionless append still updates it") {
    val dir = freshDir("graft-manifest-2")
    val n = nation.count()
    nation.write.format("graft-orc").option("graft.manifest", "true")
      .mode("append").save(dir)
    // no option here — but the table has a manifest, so the commit must
    // land in it or manifest readers would silently lose these rows
    nation.write.format("graft-orc").mode("append").save(dir)
    assert(spark.read.format("graft-orc").load(dir).count() === 2 * n)
    assert(snapshots(dir).size === 2)
    // snapshot seq grows; the newest defines the table
    assert(snapshots(dir).last > snapshots(dir).head)
  }

  test("manifest overwrite unreferences old files; the bytes expire with " +
    "the snapshots that still read them") {
    val dir = freshDir("graft-manifest-3")
    val n = nation.count()
    nation.write.format("graft-orc").option("graft.manifest", "true")
      .mode("append").save(dir)                                   // snap 1
    nation.write.format("graft-orc").mode("append").save(dir)     // snap 2
    assert(spark.read.format("graft-orc").load(dir).count() === 2 * n)
    nation.limit(5).coalesce(1).write.format("graft-orc")
      .mode("overwrite").save(dir)                                // snap 3
    assert(spark.read.format("graft-orc").load(dir).count() === 5)
    // truncate victims stay on disk: snapshots 1-2 are retained and still
    // reference them (a retained snapshot is always readable — the time-
    // travel invariant), even though the newest snapshot no longer does
    assert(orcFilesOnDisk(dir).size > 1,
      "retained-snapshot files must survive the truncate")
    // two more commits expire snapshots 1-2; their files die with them
    nation.limit(5).coalesce(1).write.format("graft-orc")
      .mode("append").save(dir)                                   // snap 4
    nation.limit(5).coalesce(1).write.format("graft-orc")
      .mode("append").save(dir)                                   // snap 5
    assert(orcFilesOnDisk(dir).size === 3,
      s"expiry must delete pre-truncate files, saw ${orcFilesOnDisk(dir)}")
    assert(spark.read.format("graft-orc").load(dir).count() === 15)
  }

  test("append with the option bootstraps existing directory tables") {
    val dir = freshDir("graft-manifest-4")
    val n = nation.count()
    // plain directory-table write first (no manifest)
    nation.write.format("graft-orc").mode("append").save(dir)
    assert(snapshots(dir).isEmpty)
    // establishing append: the first snapshot must carry the old files
    nation.write.format("graft-orc").option("graft.manifest", "true")
      .mode("append").save(dir)
    assert(snapshots(dir).size === 1)
    assert(spark.read.format("graft-orc").load(dir).count() === 2 * n)
  }

  test("partitioned manifest table keeps hive pruning and partition " +
    "columns") {
    val dir = freshDir("graft-manifest-5")
    nation.write.format("graft-orc").option("graft.manifest", "true")
      .partitionBy("n_regionkey").mode("append").save(dir)
    val back = spark.read.format("graft-orc").load(dir)
    assert(back.schema.fieldNames.contains("n_regionkey"))
    val one = back.filter($"n_regionkey" === 2)
    assert(one.count() === nation.filter($"n_regionkey" === 2).count())
    // partition pruning: only the k=v files of the selected region scanned
    val scans = one.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }
    assert(scans.head.inputRDD.getNumPartitions <
      back.queryExecution.executedPlan.collect {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
      }.head.inputRDD.getNumPartitions)
  }

  test("snapshot history is pruned to the retention bound") {
    val dir = freshDir("graft-manifest-6")
    (1 to 5).foreach { _ =>
      nation.limit(3).write.format("graft-orc")
        .option("graft.manifest", "true").mode("append").save(dir)
    }
    assert(snapshots(dir).size === GraftOrcManifest.RetainSnapshots)
    assert(spark.read.format("graft-orc").load(dir).count() === 15,
      "pruning history must not lose the newest state")
  }

  test("compaction on a manifest table swaps atomically: no duplicate " +
    "window, inputs retained until expiry, then swept with wave dirs") {
    val dir = freshDir("graft-manifest-compact")
    (1 to 3).foreach { _ =>
      nation.repartition(4).write.format("graft-orc")
        .option("graft.manifest", "true")
        .partitionBy("n_regionkey").mode("append").save(dir)
    }
    val before = orcFilesOnDisk(dir)
    assert(before.size > 10, s"fixture not fragmented: ${before.size}")
    val newestBefore = snapshots(dir).last

    val stats = GraftOrcCompact.compact(spark, dir)
    assert(stats.bins > 0)
    // ONE new snapshot: the whole compaction commits atomically
    assert(snapshots(dir).size <= GraftOrcManifest.RetainSnapshots)
    assert(snapshots(dir).last > newestBefore,
      "compaction must commit a newer snapshot")

    // lossless, and the LIVE file set shrank; the input bytes stay on
    // disk while pre-compaction snapshots retain them (time travel)
    val back = spark.read.format("graft-orc").load(dir)
    assert(back.count() === nation.count() * 3)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def manifested: Set[String] = GraftOrcManifest.readSnapshot(fs,
      new org.apache.hadoop.fs.Path(dir)).get.entries.map(e =>
      new org.apache.hadoop.fs.Path(e.path).toUri.getPath).toSet
    assert(manifested.size === stats.bins +
      (before.size - stats.filesCompacted))
    assert(manifested.subsetOf(orcFilesOnDisk(dir).map(_.getAbsolutePath).toSet))

    // partition identity survived the swap
    assert(back.groupBy($"n_regionkey").count()
      .as[(Int, Long)].collect().sorted.toSeq ===
      nation.groupBy($"n_regionkey").count()
        .as[(Int, Long)].collect().sorted.toSeq
        .map { case (k, c) => (k, c * 3) })

    // three more commits expire every pre-compaction snapshot; the
    // compacted inputs die with them and the manifest matches the disk
    // exactly again — the table is self-cleaning, no vacuum needed
    (1 to GraftOrcManifest.RetainSnapshots).foreach { _ =>
      nation.limit(2).coalesce(1).write.format("graft-orc")
        .partitionBy("n_regionkey").mode("append").save(dir)
    }
    val onDisk = orcFilesOnDisk(dir).map(_.getAbsolutePath).toSet
    assert(manifested === onDisk,
      s"expired inputs must be deleted; extra: ${onDisk -- manifested}")
  }

  test("a commit that loses a same-seq race throws instead of silently " +
    "vanishing; the winner sweeps the loser's snapshot file") {
    val dir = freshDir("graft-manifest-race")
    nation.write.format("graft-orc").option("graft.manifest", "true")
      .mode("append").save(dir)
    val table = new org.apache.hadoop.fs.Path(dir)
    val fs = table.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val cur = GraftOrcManifest.readSnapshot(fs, table).get

    // ---- loser path: a rival already published seq 2 with a
    // lexicographically-max name (the tiebreak readers resolve toward),
    // so OUR seq-2 publish must detect the race and fail LOUDLY — the
    // alternative is this commit's rows silently missing from the table
    val mdir = new java.io.File(dir, "_graft_manifest")
    val winnerName = f"snap-${2L}%020d-ffffffff-ffff-ffff-ffff-ffffffffffff.json"
    val curSnapFile = mdir.listFiles().filter(_.getName.startsWith("snap-")).head
    java.nio.file.Files.copy(curSnapFile.toPath,
      new java.io.File(mdir, winnerName).toPath)
    val ex = intercept[java.util.ConcurrentModificationException] {
      GraftOrcManifest.writeSnapshot(fs, table, 2L, cur.entries)
    }
    assert(ex.getMessage.contains("race"))
    assert(snapshots(dir).count(_.startsWith(f"snap-${2L}%020d")) === 1,
      "the loser must withdraw its own snapshot file")

    // ---- winner path: a stale DUPLICATE of an already-won seq with a
    // lexicographically-MIN name (a crashed loser's leftover, next to
    // the real seq-2 winner) must neither fail the next commit nor
    // consume a retention slot — expiry treats it as plain garbage
    val loserName = f"snap-${2L}%020d-00000000-0000-0000-0000-000000000000.json"
    java.nio.file.Files.copy(curSnapFile.toPath,
      new java.io.File(mdir, loserName).toPath)
    GraftOrcManifest.writeSnapshot(fs, table, 3L, cur.entries)
    assert(snapshots(dir).count(_.startsWith(f"snap-${2L}%020d")) === 1,
      "expiry must sweep the duplicate-seq loser file")
    assert(!snapshots(dir).contains(loserName))
    assert(spark.read.format("graft-orc").load(dir).count() === nation.count())
  }

  test("a committer targeting a seq that committed AND already EXPIRED " +
    "still loses loudly (monotonic occupancy): retention deleting old " +
    "snapshot files must not let a stale-based commit publish below " +
    "the live head and report success no reader ever sees") {
    val dir = freshDir("graft-manifest-buried")
    nation.limit(5).write.format("graft-orc")
      .option("graft.manifest", "true").mode("append").save(dir) // seq 1
    val table = new org.apache.hadoop.fs.Path(dir)
    val fs = table.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val cur = GraftOrcManifest.readSnapshot(fs, table).get
    // advance the head to seq 8 at retain=2: seqs 1..6's snapshot FILES
    // are expired and deleted — exactly the state a committer that
    // staged against seq 3 and then queued behind the commit lock
    // would find (its target seq 4 vacant again)
    (2L to 8L).foreach(s =>
      GraftOrcManifest.writeSnapshot(fs, table, s, cur.entries,
        retain = 2))
    assert(!snapshots(dir).exists(_.startsWith(f"snap-${4L}%020d")),
      "setup: seq 4's snapshot file must be expired away")
    val ex = intercept[java.util.ConcurrentModificationException] {
      GraftOrcManifest.writeSnapshot(fs, table, 4L, cur.entries,
        retain = 2)
    }
    assert(ex.getMessage.contains("live head 8"), ex.getMessage)
    assert(!snapshots(dir).exists(_.startsWith(f"snap-${4L}%020d")),
      "the refused commit must not leave a buried snapshot file")
    assert(GraftOrcManifest.readSnapshot(fs, table).get.seq === 8L)
  }

  test("an append that loses a commit race retries on top of the winner " +
    "(optimistic concurrency), not fails") {
    val dir = freshDir("graft-manifest-retry")
    nation.filter(org.apache.spark.sql.functions.col("n_nationkey") < 10)
      .write.format("graft-orc").option("graft.manifest", "true")
      .mode("append").save(dir)                                   // snap 1
    // plant a rival seq-2 winner: simulates a concurrent commit that
    // republished snap 1's state under the lexicographic-max name, so
    // the NEXT writer's seq-2 attempt loses its race
    val mdir = new java.io.File(dir, "_graft_manifest")
    val winnerName =
      f"snap-${2L}%020d-ffffffff-ffff-ffff-ffff-ffffffffffff.json"
    val curSnapFile = mdir.listFiles()
      .filter(_.getName.startsWith("snap-")).head
    java.nio.file.Files.copy(curSnapFile.toPath,
      new java.io.File(mdir, winnerName).toPath)
    // the writer loses seq 2 and must retry at seq 3 on top of the
    // "winner" — no exception, no lost rows
    nation.filter(org.apache.spark.sql.functions.col("n_nationkey") >= 10)
      .write.format("graft-orc").mode("append").save(dir)
    val table = new org.apache.hadoop.fs.Path(dir)
    val fs = table.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(GraftOrcManifest.readSnapshot(fs, table).get.seq === 3L)
    assert(spark.read.format("graft-orc").load(dir).count() === nation.count(),
      "the retried append must union the winner's state with its own rows")
  }

  test("a committer of an occupied seq fails BEFORE publishing a rival " +
    "file (pre-rename occupancy check)") {
    val dir = freshDir("graft-manifest-precheck")
    nation.write.format("graft-orc").option("graft.manifest", "true")
      .mode("append").save(dir)                                   // snap 1
    val table = new org.apache.hadoop.fs.Path(dir)
    val fs = table.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val cur = GraftOrcManifest.readSnapshot(fs, table).get
    // seq 1 is already committed: a second committer must fail before
    // its rename — were it to publish a lexicographically larger seq-1
    // file, it would retroactively STEAL the seq from the writer whose
    // own post-rename verify already passed (silent row loss)
    val ex = intercept[java.util.ConcurrentModificationException] {
      GraftOrcManifest.writeSnapshot(fs, table, 1L, cur.entries)
    }
    assert(ex.getMessage.contains("race"))
    assert(snapshots(dir).count(_.startsWith(f"snap-${1L}%020d")) === 1,
      "the refused committer must not have published any seq-1 file")
  }

  test("a compaction that loses its commit race to an append retries on " +
    "top of the winner while its inputs stay live") {
    val dir = freshDir("graft-manifest-compact-race")
    // fragmented manifest table: several single-row commits -> many files
    (0 until 4).foreach { i =>
      nation.filter(org.apache.spark.sql.functions.col("n_nationkey") === i)
        .coalesce(1).write.format("graft-orc")
        .option("graft.manifest", "true").mode("append").save(dir)
    }
    val table = new org.apache.hadoop.fs.Path(dir)
    val fs = table.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val cur = GraftOrcManifest.readSnapshot(fs, table).get
    // plant a rival winner for the seq the compactor will target,
    // simulating an append that commits between the compactor's read and
    // its snapshot publish; the planted state re-asserts cur's entries,
    // so every compaction input is still live in the "winner"
    val mdir = new java.io.File(dir, "_graft_manifest")
    val winnerName =
      f"snap-${cur.seq + 1}%020d-ffffffff-ffff-ffff-ffff-ffffffffffff.json"
    val curSnapFile = mdir.listFiles().filter(_.getName.startsWith("snap-"))
      .sortBy(_.getName).last
    java.nio.file.Files.copy(curSnapFile.toPath,
      new java.io.File(mdir, winnerName).toPath)
    val stats = GraftOrcCompact.compact(spark, dir)
    assert(stats.bins > 0, "fixture must actually compact")
    assert(GraftOrcManifest.readSnapshot(fs, table).get.seq === cur.seq + 2,
      "the compaction must land at the seq after the race winner")
    val got = spark.read.format("graft-orc").load(dir)
    assert(got.count() === 4)
    assert(got.select(org.apache.spark.sql.functions.col("n_nationkey"))
      .distinct().count() === 4, "no duplicate rows after the retried swap")
  }

  test("graft.manifest.retain persists in the snapshot header: optionless " +
    "appends and compaction inherit it instead of resetting to the default") {
    val dir = freshDir("graft-manifest-retain")
    nation.limit(3).write.format("graft-orc")
      .option("graft.manifest", "true")
      .option("graft.manifest.retain", "5").mode("append").save(dir)
    // six optionless commits: retention must stay 5 (not the default 3)
    (1 to 6).foreach { _ =>
      nation.limit(3).repartition(2).write.format("graft-orc")
        .mode("append").save(dir)
    }
    assert(snapshots(dir).size === 5,
      s"persisted retain=5 must govern optionless commits: ${snapshots(dir)}")
    // compaction commits through commitSwap — it must inherit retain=5
    // too, NOT expire snapshots 4..5 (and the time travel they carry)
    val stats = GraftOrcCompact.compact(spark, dir)
    assert(stats.bins > 0)
    assert(snapshots(dir).size === 5,
      s"compact must honor the persisted retain: ${snapshots(dir)}")
    // an explicit option RE-sets the policy
    nation.limit(3).write.format("graft-orc")
      .option("graft.manifest.retain", "2").mode("append").save(dir)
    assert(snapshots(dir).size === 2,
      s"explicit retain=2 must take over: ${snapshots(dir)}")
  }

  test("commitSwap sequence-validates rewrite commits (expectDeletes): " +
    "a delete sidecar landing after the rewrite was planned fails the " +
    "commit — committing anyway would resurrect the deleted rows in " +
    "the fresh-stamped rewrite outputs; purge re-plans and succeeds") {
    val dir = freshDir("graft-manifest-expdel")
    (1 to 4).map(i => (i, s"v$i")).toDF("k", "v").coalesce(1)
      .write.format("graft-orc").option("graft.manifest", "true")
      .mode("overwrite").save(dir)
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val qt = fs.makeQualified(new org.apache.hadoop.fs.Path(dir))
    // the rewrite's planned state: no sidecars
    val planned = GraftOrcManifest.readSnapshot(fs, qt).get
    assert(planned.deletes.isEmpty)
    // ...then a concurrent blind upsert commits an equality sidecar
    GraftOrcEqDelete.upsert(spark, dir,
      Seq((2, "v2b")).toDF("k", "v"), Seq("k"))
    val err = intercept[java.util.ConcurrentModificationException] {
      GraftOrcManifest.commitSwap(fs, qt, remove = Set.empty, add = Nil,
        op = "purge",
        expectDeletes = Some(planned.deletes.map(_.path).toSet))
    }
    assert(err.getMessage.contains("delete sidecars changed"))
    // a purge planned against CURRENT state applies the sidecar and
    // retires it; the upserted value survives
    assert(GraftOrcMor.purge(spark, dir) > 0)
    val after = GraftOrcManifest.readSnapshot(fs, qt).get
    assert(after.deletes.isEmpty)
    assert(spark.read.format("graft-orc").load(dir)
      .as[(Int, String)].collect().sorted.toSeq ==
      Seq(1 -> "v1", 2 -> "v2b", 3 -> "v3", 4 -> "v4"))
  }

  test("streaming sink epochs commit through the manifest") {
    val dir = freshDir("graft-manifest-stream")
    val src = freshDir("graft-manifest-stream-src")
    val ckpt = freshDir("graft-manifest-stream-ckpt")
    nation.limit(10).write.mode("overwrite").parquet(src)
    val q = spark.readStream.schema(nation.schema).parquet(src)
      .writeStream.format("graft-orc").option("graft.manifest", "true")
      .option("checkpointLocation", ckpt).start(dir)
    try q.processAllAvailable() finally q.stop()
    assert(snapshots(dir).nonEmpty)
    assert(spark.read.format("graft-orc").load(dir).count() === 10)
  }
}
