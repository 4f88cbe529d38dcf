package graft

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.v2.{GraftOrcManifest, GraftOrcMetadata, GraftOrcSchema}

/** Metadata tables (`t.snapshots` / `t.files` / `t.partitions`) and the
  * rollback maintenance commit. The invariants: metadata queries are
  * answered from manifest state alone (content matches what the log
  * says, partition row counts come from stat sidecars — zero data-file
  * reads), and rollback restores an old snapshot's content AND schema
  * as a new atomic commit without rewriting history.
  */
class GraftOrcMetadataSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def conf = spark.sparkContext.hadoopConfiguration
  private def freshDir(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private lazy val wh: String = {
    val dir = freshDir("graft-meta-wh")
    spark.conf.set("spark.sql.catalog.gmeta",
      "graft.sources.v2.GraftOrcCatalog")
    spark.conf.set("spark.sql.catalog.gmeta.warehouse", dir)
    dir
  }

  test("snapshots/files/partitions answer from the manifest: ops, file " +
    "accounting, sidecar row counts — via catalog SQL and the path API") {
    wh
    spark.sql("CREATE TABLE gmeta.mt (v INT, p INT) PARTITIONED BY (p)")
    spark.sql("INSERT INTO gmeta.mt SELECT /*+ REPARTITION(1) */ * " +
      "FROM VALUES (1, 10), (2, 10), (3, 20)")
    spark.sql("INSERT INTO gmeta.mt VALUES (4, 20)")
    val snaps = spark.sql(
      "SELECT seq, op, data_files FROM gmeta.mt.snapshots ORDER BY seq")
      .as[(Long, String, Int)].collect().toSeq
    assert(snaps.map(_._2) == Seq("create", "append", "append"))
    assert(snaps.map(_._1) == Seq(1L, 2L, 3L))
    assert(snaps.last._3 == 3) // two files for p=10/p=20 + one for p=20
    val files = spark.sql(
      "SELECT file, partition, row_count FROM gmeta.mt.files")
      .as[(String, String, Option[Long])].collect().toSeq
    assert(files.size == 3 && files.forall(_._3.isDefined))
    assert(files.count(_._2 == "p=10") == 1 &&
      files.count(_._2 == "p=20") == 2)
    val parts = spark.sql(
      "SELECT p, file_count, row_count FROM gmeta.mt.partitions " +
        "ORDER BY p").as[(String, Long, Long)].collect().toSeq
    assert(parts == Seq(("10", 1L, 2L), ("20", 2L, 2L)))
    // path API returns the same partitions rollup
    val dir = s"$wh/mt"
    val api = GraftOrcMetadata.partitions(spark, dir)
      .select($"p", $"file_count", $"row_count")
      .as[(String, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(api == parts)
  }

  test("rollback restores an old snapshot's content and schema as a NEW " +
    "commit; rolled-past snapshots stay readable until expiry") {
    val dir = freshDir("graft-rollback")
    Seq((1, 10), (2, 20)).toDF("a", "b").coalesce(1)
      .write.format("graft-orc").option("graft.manifest", "true")
      .option("graft.manifest.retain", "10").mode("overwrite").save(dir) // 1
    Seq((3, 30)).toDF("a", "b").coalesce(1)
      .write.format("graft-orc").mode("append").save(dir)                // 2
    GraftOrcSchema.alter(conf, dir)(
      GraftOrcSchema.renameColumn(_, "b", "m"))                          // 3
    Seq((4, 40)).toDF("a", "m").coalesce(1)
      .write.format("graft-orc").mode("append").save(dir)                // 4
    GraftOrcManifest.rollback(conf, dir, 2L)                             // 5
    val df = spark.read.format("graft-orc").load(dir)
    // content AND schema are back to snapshot 2 (pre-rename, pre-append)
    assert(df.schema.fieldNames.toSeq == Seq("a", "b"))
    assert(df.select("a").as[Int].collect().sorted.toSeq == Seq(1, 2, 3))
    // history was not rewritten: seq 4 still reads its own state
    val s4 = spark.read.format("graft-orc")
      .option("graft.snapshot_id", "4").load(dir)
    assert(s4.schema.fieldNames.toSeq == Seq("a", "m"))
    assert(s4.select("a").as[Int].collect().sorted.toSeq ==
      Seq(1, 2, 3, 4))
    // the rollback is an ordinary commit in the log
    val fs = new Path(dir).getFileSystem(conf)
    val last = GraftOrcManifest.readSnapshot(fs, new Path(dir)).get
    assert(last.seq == 5L && last.op.contains("rollback"))
    // a non-retained target raises the typed time-travel error
    assertThrows[IllegalArgumentException] {
      GraftOrcManifest.rollback(conf, dir, 99L)
    }
  }

  test("tags pin a snapshot past retention expiry; VERSION AS OF " +
    "resolves tag names through the catalog; dropping the tag frees it") {
    wh
    spark.sql("CREATE TABLE gmeta.tg (x INT)")
    spark.sql("INSERT INTO gmeta.tg VALUES (1)")       // seq 2
    val dir = s"$wh/tg"
    val fsys = new Path(dir).getFileSystem(conf)
    GraftOrcManifest.createTag(fsys, new Path(dir), "train-v1", 2L)
    // default retain=3: four more commits push seq 2 well past expiry
    (2 to 5).foreach(i => spark.sql(s"INSERT INTO gmeta.tg VALUES ($i)"))
    val retainedSeqs = GraftOrcManifest.listSnapshots(
      fsys, new Path(dir)).get.map(_.seq)
    assert(retainedSeqs.contains(2L),
      s"tagged snapshot expired: $retainedSeqs")
    // path read via the tag AND catalog VERSION AS OF '<tag>'
    assert(spark.read.format("graft-orc").option("graft.tag", "train-v1")
      .load(dir).as[Int].collect().toSeq == Seq(1))
    assert(spark.sql("SELECT x FROM gmeta.tg VERSION AS OF 'train-v1'")
      .as[Int].collect().toSeq == Seq(1))
    assert(GraftOrcManifest.listTags(fsys, new Path(dir)) ==
      Seq(("train-v1", 2L)))
    // the `tags` metadata table surfaces the same refs through SQL, and
    // `history` aliases `snapshots`
    assert(spark.sql("SELECT tag, seq FROM gmeta.tg.tags")
      .as[(String, Long)].collect().toSeq == Seq(("train-v1", 2L)))
    assert(spark.sql("SELECT count(*) FROM gmeta.tg.history").head.getLong(0) ==
      spark.sql("SELECT count(*) FROM gmeta.tg.snapshots").head.getLong(0))
    // duplicate tag name and dangling-seq tags raise typed errors
    assertThrows[IllegalArgumentException] {
      GraftOrcManifest.createTag(fsys, new Path(dir), "train-v1", 3L)
    }
    assertThrows[IllegalArgumentException] {
      GraftOrcManifest.createTag(fsys, new Path(dir), "nope", 99L)
    }
    // drop the tag: the next commit expires seq 2 and its files die
    assert(GraftOrcManifest.dropTag(fsys, new Path(dir), "train-v1"))
    spark.sql("INSERT INTO gmeta.tg VALUES (6)")
    val after = GraftOrcManifest.listSnapshots(fsys, new Path(dir)).get
      .map(_.seq)
    assert(!after.contains(2L), s"untagged snapshot still retained: $after")
    assertThrows[Exception] {
      spark.read.format("graft-orc").option("graft.tag", "train-v1")
        .load(dir).collect()
    }
  }

  test("refs metadata table lists main + every branch (with fork base) " +
    "+ every tag in one frame") {
    wh
    spark.sql("CREATE TABLE gmeta.rf (x INT)")
    spark.sql("INSERT INTO gmeta.rf VALUES (1)")           // seq 2
    val dir = s"$wh/rf"
    val fsys = new Path(dir).getFileSystem(conf)
    GraftOrcManifest.createTag(fsys, new Path(dir), "pin", 2L)
    GraftOrcManifest.createBranch(fsys, new Path(dir), "stage")
    spark.sql("INSERT INTO gmeta.rf.branch_stage VALUES (2)") // branch 3
    spark.sql("INSERT INTO gmeta.rf VALUES (3)")              // main 3
    val got = spark.sql(
      "SELECT name, kind, seq, base_seq FROM gmeta.rf.refs " +
        "ORDER BY kind, name")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toSeq
    assert(got === Seq(
      ("main", "branch", 3L, -1L),
      ("stage", "branch", 3L, 2L),
      ("pin", "tag", 2L, -1L)), got.toString)
  }

  test("metadata tables reject unknown kinds and non-manifest parents") {
    wh
    assertThrows[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT * FROM gmeta.mt.nosuchkind").collect()
    }
    assertThrows[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT * FROM gmeta.no_table.snapshots").collect()
    }
  }
}
