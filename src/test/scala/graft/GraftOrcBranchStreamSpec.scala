package graft

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.sources.v2.{GraftOrcChangelog, GraftOrcManifest}

/** Branch-scoped streaming reads and changelog feeds: `readStream` with
  * `graft.branch` tails the BRANCH lineage (the WAP audit loop wants to
  * follow the staged branch the same way batch reads already can), and
  * `GraftOrcChangelog.feed(..., branch = ...)` polls branch commits.
  * Main commits after the fork never enter a branch feed, and branch
  * commits never enter a main feed.
  */
class GraftOrcBranchStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fsOf(dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  test("readStream with graft.branch tails the branch lineage; " +
    "post-fork main appends stay out; main streams exclude branch files") {
    val dir = Files.createTempDirectory("graft-branch-stream").toString
    spark.range(10).select($"id", lit("base").as("tag"))
      .repartition(2).write.format("graft-orc")
      .option("graft.manifest", "true").mode("append").save(dir)
    GraftOrcManifest.createBranch(fsOf(dir), new Path(dir), "ingest")

    val bq = spark.readStream.format("graft-orc")
      .option("graft.branch", "ingest")
      .option("graft.snapshot_offsets", "true").load(dir)
      .writeStream.format("memory").queryName("branch_in")
      .outputMode("append").start()
    val mq = spark.readStream.format("graft-orc")
      .option("graft.snapshot_offsets", "true").load(dir)
      .writeStream.format("memory").queryName("main_in")
      .outputMode("append").start()
    try {
      bq.processAllAvailable()
      mq.processAllAvailable()
      // both start from the shared fork state
      assert(spark.table("branch_in").count() === 10)
      assert(spark.table("main_in").count() === 10)
      // stage a wave on the branch, append a wave to main
      spark.range(100, 105).select($"id", lit("staged").as("tag"))
        .write.format("graft-orc").option("graft.branch", "ingest")
        .mode("append").save(dir)
      spark.range(200, 202).select($"id", lit("main2").as("tag"))
        .write.format("graft-orc").mode("append").save(dir)
      bq.processAllAvailable()
      mq.processAllAvailable()
      val branchIds = spark.table("branch_in")
        .select($"id").as[Long].collect().sorted.toSeq
      val mainIds = spark.table("main_in")
        .select($"id").as[Long].collect().sorted.toSeq
      assert(branchIds === ((0L until 10L) ++ (100L until 105L)),
        s"branch stream must carry fork + branch waves only: $branchIds")
      assert(mainIds === ((0L until 10L) ++ (200L until 202L)),
        s"main stream must carry fork + main waves only: $mainIds")
    } finally { bq.stop(); mq.stop() }
  }

  test("mtime-offset branch stream (no snapshot offsets) resolves the " +
    "branch head listing per trigger") {
    val dir = Files.createTempDirectory("graft-branch-stream2").toString
    spark.range(5).select($"id").repartition(1)
      .write.format("graft-orc")
      .option("graft.manifest", "true").mode("append").save(dir)
    GraftOrcManifest.createBranch(fsOf(dir), new Path(dir), "b")
    spark.range(50, 53).select($"id")
      .write.format("graft-orc").option("graft.branch", "b")
      .mode("append").save(dir)
    // main moves on too — must stay invisible to the branch stream
    spark.range(90, 99).select($"id")
      .write.format("graft-orc").mode("append").save(dir)
    val q = spark.readStream.format("graft-orc")
      .option("graft.branch", "b").load(dir)
      .writeStream.format("memory").queryName("branch_mtime")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("branch_mtime")
        .select($"id").as[Long].collect().sorted.toSeq ===
        ((0L until 5L) ++ (50L until 53L)))
    } finally q.stop()
  }

  test("graft.stream.start_snapshot_id seeds a fresh snapshot-offset " +
    "stream past already-processed history; refused without " +
    "snapshot offsets") {
    val dir = Files.createTempDirectory("graft-stream-seed").toString
    spark.range(10).select($"id").repartition(1)
      .write.format("graft-orc")
      .option("graft.manifest", "true").mode("append").save(dir)   // seq 1
    spark.range(100, 105).select($"id")
      .write.format("graft-orc").mode("append").save(dir)          // seq 2
    spark.range(200, 203).select($"id")
      .write.format("graft-orc").mode("append").save(dir)          // seq 3
    val q = spark.readStream.format("graft-orc")
      .option("graft.snapshot_offsets", "true")
      .option("graft.stream.start_snapshot_id", "2").load(dir)
      .writeStream.format("memory").queryName("seeded_in")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("seeded_in")
        .select($"id").as[Long].collect().sorted.toSeq ===
        (200L until 203L), "only commits AFTER the seed may enter")
    } finally q.stop()
    val e = intercept[Exception] {
      spark.readStream.format("graft-orc")
        .option("graft.stream.start_snapshot_id", "2").load(dir)
        .writeStream.format("memory").queryName("seeded_bad")
        .outputMode("append").start()
        .processAllAvailable()
    }
    assert(e.getMessage != null)
  }

  test("changelog feed with branch polls branch commits; checkpoint " +
    "arithmetic holds across polls") {
    val dir = Files.createTempDirectory("graft-branch-feed").toString
    spark.range(20).select($"id", ($"id" % 5).cast("double").as("bal"))
      .repartition(2).write.format("graft-orc")
      .option("graft.manifest", "true").mode("append").save(dir)
    val fs = fsOf(dir)
    val forkSeq = GraftOrcManifest.readSnapshot(fs, new Path(dir)).get.seq
    GraftOrcManifest.createBranch(fs, new Path(dir), "stage")
    val ckpt = Files.createTempDirectory("graft-branch-feed-ck")
      .toString + "/seq"
    // nothing new on the branch yet
    assert(GraftOrcChangelog.feed(spark, dir, ckpt,
      initialSeq = forkSeq, branch = Some("stage")).isEmpty)
    // two branch appends, polled as two feeds
    spark.range(100, 103).select($"id", lit(1.0).as("bal"))
      .write.format("graft-orc").option("graft.branch", "stage")
      .mode("append").save(dir)
    val f1 = GraftOrcChangelog.feed(spark, dir, ckpt,
      initialSeq = forkSeq, branch = Some("stage")).get
    assert(f1.df.select($"id").as[Long].collect().sorted.toSeq ===
      (100L until 103L))
    f1.commit()
    // a main append between polls must NOT leak into the branch feed
    spark.range(900, 905).select($"id", lit(9.0).as("bal"))
      .write.format("graft-orc").mode("append").save(dir)
    spark.range(200, 202).select($"id", lit(2.0).as("bal"))
      .write.format("graft-orc").option("graft.branch", "stage")
      .mode("append").save(dir)
    val f2 = GraftOrcChangelog.feed(spark, dir, ckpt,
      branch = Some("stage")).get
    assert(f2.df.select($"id").as[Long].collect().sorted.toSeq ===
      (200L until 202L))
    f2.commit()
    assert(GraftOrcChangelog.feed(spark, dir, ckpt,
      branch = Some("stage")).isEmpty)
  }
}
