package graft

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.v2.{GraftOrcManifest, GraftOrcMor}

/** Maintenance stored procedures ([[graft.sources.v2.GraftOrcProcedures]]
  * via `ProcedureCatalog`): `CALL gproc.system.<proc>(...)` drives the
  * housekeeping machinery from pure SQL and returns a one-row receipt.
  * Each case asserts BOTH the receipt and the on-disk/table effect, and
  * that query results are invariant under maintenance (the whole point
  * of housekeeping ops).
  */
class GraftOrcProcedureSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val wh: String = {
    val dir = Files.createTempDirectory("graft-proc-wh").toString
    spark.conf.set("spark.sql.catalog.gproc",
      "graft.sources.v2.GraftOrcCatalog")
    spark.conf.set("spark.sql.catalog.gproc.warehouse", dir)
    dir
  }

  private def sql(s: String) = spark.sql(s)

  private def fs = new Path(wh).getFileSystem(
    spark.sparkContext.hadoopConfiguration)

  private def dataFiles(table: String): Seq[String] =
    sql(s"SELECT file FROM gproc.$table.files").as[String].collect().toSeq

  test("compact: named + default args, one-row receipt, file count " +
    "drops, results invariant") {
    wh
    sql("CREATE TABLE gproc.c1 (a INT, b STRING)")
    (1 to 4).foreach(i =>
      sql(s"INSERT INTO gproc.c1 VALUES ($i, 'x$i'), (${i + 10}, 'y')"))
    assert(dataFiles("c1").size >= 4)
    val before = sql("SELECT a, b FROM gproc.c1 ORDER BY a").collect().toSeq
    val r = sql("CALL gproc.system.compact(table => 'c1')")
    assert(r.columns.toSeq ==
      Seq("files_compacted", "files_written", "bins", "bytes_compacted"))
    val row = r.collect().head
    assert(row.getInt(0) >= 4 && row.getInt(1) >= 1)
    assert(dataFiles("c1").size < 4)
    assert(sql("SELECT a, b FROM gproc.c1 ORDER BY a").collect().toSeq
      == before)
  }

  test("purge_deletes: retires MoR sidecars, rewrites only affected " +
    "files, results invariant") {
    wh
    sql("CREATE TABLE gproc.m1 (a INT, b STRING) " +
      "TBLPROPERTIES('graft.delete_mode'='mor')")
    sql("INSERT INTO gproc.m1 SELECT id, concat('v', id) " +
      "FROM range(0, 100)")
    sql("INSERT INTO gproc.m1 SELECT id, concat('w', id) " +
      "FROM range(100, 200)")
    sql("DELETE FROM gproc.m1 WHERE a % 10 = 3")
    def liveSidecars: Int = GraftOrcManifest.readSnapshot(fs,
      fs.makeQualified(new Path(s"$wh/m1"))).get.deletes.size
    assert(liveSidecars > 0,
      "DELETE in mor mode should have produced sidecars")
    val before = sql("SELECT a, b FROM gproc.m1 ORDER BY a").collect().toSeq
    assert(before.size == 180)
    val purged = sql("CALL gproc.system.purge_deletes('m1')")
      .as[Int].collect().head
    assert(purged > 0, "purge should rewrite the sidecar-affected files")
    // retired from the CURRENT snapshot; physical sidecar files linger
    // until retention/vacuum (older snapshots still reference them)
    assert(liveSidecars == 0)
    assert(sql("SELECT a, b FROM gproc.m1 ORDER BY a").collect().toSeq
      == before)
  }

  test("vacuum: deletes a planted orphan, keeps live files, results " +
    "invariant") {
    wh
    sql("CREATE TABLE gproc.v1 (a INT)")
    sql("INSERT INTO gproc.v1 VALUES (1), (2), (3)")
    // plant an orphan: a visible .orc no snapshot references (the
    // leftover of a crashed commit)
    val src = GraftOrcManifest.readSnapshot(fs,
        fs.makeQualified(new Path(s"$wh/v1"))).get.entries
      .map(e => new Path(e.path)).head
    val orphan = new Path(src.getParent, "part-orphan-deadbeef.orc")
    org.apache.hadoop.fs.FileUtil.copy(fs, src, fs, orphan, false,
      spark.sparkContext.hadoopConfiguration)
    val before = sql("SELECT a FROM gproc.v1 ORDER BY a").collect().toSeq
    val removed = sql("CALL gproc.system.vacuum('v1')")
      .as[Int].collect().head
    assert(removed == 1, s"expected exactly the planted orphan, got " +
      s"$removed")
    assert(!fs.exists(orphan))
    assert(sql("SELECT a FROM gproc.v1 ORDER BY a").collect().toSeq
      == before)
  }

  test("vacuum(older_than) spares young orphans (another driver's " +
    "in-flight staged files); ref reads via t.branch_<n> / t.tag_<n> " +
    "identifiers") {
    wh
    sql("CREATE TABLE gproc.v2 (a INT)")
    sql("INSERT INTO gproc.v2 VALUES (1), (2)")
    val src = GraftOrcManifest.readSnapshot(fs,
        fs.makeQualified(new Path(s"$wh/v2"))).get.entries
      .map(e => new Path(e.path)).head
    val orphan = new Path(src.getParent, "part-orphan-young.orc")
    org.apache.hadoop.fs.FileUtil.copy(fs, src, fs, orphan, false,
      spark.sparkContext.hadoopConfiguration)
    // a cutoff in the past: the fresh orphan is younger, must survive
    assert(sql("CALL gproc.system.vacuum('v2', " +
      "older_than => TIMESTAMP '2000-01-01 00:00:00')")
      .as[Int].collect().head == 0)
    assert(fs.exists(orphan))
    assert(sql("CALL gproc.system.vacuum('v2')").as[Int]
      .collect().head == 1)
    // identifier ref reads: tag + branch suffixes resolve the parent
    sql("CALL gproc.system.create_tag('v2', 'pin')").collect()
    sql("CALL gproc.system.create_branch('v2', 'wip')").collect()
    sql("INSERT INTO gproc.v2 VALUES (3)")
    assert(sql("SELECT count(*) FROM gproc.v2.tag_pin").as[Long]
      .collect().head == 2)
    assert(sql("SELECT count(*) FROM gproc.v2.branch_wip").as[Long]
      .collect().head == 2)
    assert(sql("SELECT count(*) FROM gproc.v2").as[Long]
      .collect().head == 3)
    // INSERT INTO the branch identifier lands on the branch
    sql("INSERT INTO gproc.v2.branch_wip VALUES (99)")
    assert(sql("SELECT count(*) FROM gproc.v2.branch_wip").as[Long]
      .collect().head == 3)
    assert(sql("SELECT count(*) FROM gproc.v2").as[Long]
      .collect().head == 3, "branch insert invisible to main")
    // DML on a branch handle scans the branch AND commits to the branch
    // lineage (round 13): the staged delete is invisible to main
    sql("DELETE FROM gproc.v2.branch_wip WHERE a = 99")
    assert(sql("SELECT count(*) FROM gproc.v2.branch_wip").as[Long]
      .collect().head == 2, "branch DELETE must mutate the branch")
    assert(sql("SELECT count(*) FROM gproc.v2").as[Long]
      .collect().head == 3, "branch DELETE must be invisible to main")
  }

  test("expire_snapshots: persists the retention depth, trims history, " +
    "typed error on version beyond it") {
    wh
    sql("CREATE TABLE gproc.e1 (a INT)")
    (1 to 6).foreach(i => sql(s"INSERT INTO gproc.e1 VALUES ($i)"))
    // default retention already bounds history; deepen it first
    val r = sql("CALL gproc.system.expire_snapshots('e1', retain => 2)")
      .as[(Int, Int, Long)].collect().head
    assert(r._2 == 2, s"remaining should be the new depth: $r")
    val seqs = sql("SELECT seq FROM gproc.e1.snapshots")
      .as[Long].collect().toSeq.sorted
    assert(seqs.size == 2, s"retain=2 should leave 2 snapshots: $seqs")
    val gone = seqs.min - 1
    val e = intercept[Exception](
      sql(s"SELECT * FROM gproc.e1 VERSION AS OF $gone").collect())
    assert(e.getMessage.contains("retain") ||
      e.getMessage.contains("snapshot"), e.getMessage)
    // the persisted policy governs later commits too
    sql("INSERT INTO gproc.e1 VALUES (7)")
    assert(sql("SELECT seq FROM gproc.e1.snapshots").count() == 2)
  }

  test("expire_snapshots(older_than): time-based sweep keeps the " +
    "newest + tagged snapshots, no policy commit") {
    wh
    sql("CREATE TABLE gproc.e2 (a INT)")
    (1 to 4).foreach(i => sql(s"INSERT INTO gproc.e2 VALUES ($i)"))
    // pin an old snapshot by tag; everything else before 'now' sweeps
    sql("CALL gproc.system.create_tag('e2', 'keepme', version => 3)")
      .collect()
    val headBefore = sql("SELECT max(seq) FROM gproc.e2.snapshots")
      .as[Long].collect().head
    val (expired, remaining, cur) = sql(
      "CALL gproc.system.expire_snapshots('e2', " +
        "older_than => TIMESTAMP '2100-01-01 00:00:00')")
      .as[(Int, Int, Long)].collect().head
    assert(cur == headBefore, "time sweep writes NO new commit")
    assert(remaining == 2, s"newest + tagged survive: $remaining")
    assert(expired >= 1)
    val seqs = sql("SELECT seq FROM gproc.e2.snapshots")
      .as[Long].collect().toSet
    assert(seqs == Set(3L, headBefore), seqs.toString)
    // the tagged snapshot still reads (seq 3 = CREATE + two inserts)
    assert(sql("SELECT count(*) FROM gproc.e2 VERSION AS OF 'keepme'")
      .as[Long].collect().head == 2)
  }

  test("rollback: restores a prior snapshot as a new commit; receipt " +
    "carries both versions") {
    wh
    sql("CREATE TABLE gproc.r1 (a INT)")
    sql("INSERT INTO gproc.r1 VALUES (1), (2)")
    val target = sql("SELECT max(seq) FROM gproc.r1.snapshots")
      .as[Long].collect().head
    sql("INSERT INTO gproc.r1 VALUES (3)")
    val (prev, cur) = sql(
      s"CALL gproc.system.rollback('r1', version => $target)")
      .as[(Long, Long)].collect().head
    assert(cur == prev + 1, "rollback commits a NEW snapshot")
    assert(sql("SELECT a FROM gproc.r1 ORDER BY a").as[Int]
      .collect().toSeq == Seq(1, 2))
  }

  test("create_tag pins a snapshot through aggressive expiry; " +
    "VERSION AS OF tag reads it; drop_tag releases it") {
    wh
    sql("CREATE TABLE gproc.t1 (a INT)")
    sql("INSERT INTO gproc.t1 VALUES (1)")
    val (tag, seq) = sql("CALL gproc.system.create_tag('t1', 'train-v1')")
      .as[(String, Long)].collect().head
    assert(tag == "train-v1" && seq >= 1)
    (2 to 6).foreach(i => sql(s"INSERT INTO gproc.t1 VALUES ($i)"))
    sql("CALL gproc.system.expire_snapshots('t1', retain => 1)")
    // the pinned snapshot survives expiry and reads byte-identically
    assert(sql("SELECT a FROM gproc.t1 VERSION AS OF 'train-v1'")
      .as[Int].collect().toSeq == Seq(1))
    assert(sql("CALL gproc.system.drop_tag('t1', 'train-v1')")
      .as[Boolean].collect().head)
    assert(!sql("CALL gproc.system.drop_tag('t1', 'train-v1')")
      .as[Boolean].collect().head, "second drop: existed=false")
  }

  test("path-table argument: procedures run against a raw directory " +
    "with no catalog entry") {
    wh
    val dir = Files.createTempDirectory("graft-proc-path").toString
    spark.range(0, 50).selectExpr("id AS a")
      .repartition(3).write.format("graft-orc")
      .option("graft.manifest", "true").mode("append").save(dir)
    val r = sql(s"CALL gproc.system.compact(table => '$dir')")
      .collect().head
    assert(r.getInt(0) == 3, s"3 files should compact: $r")
    assert(spark.read.format("graft-orc").load(dir).count() == 50)
    assert(sql(s"CALL gproc.system.vacuum('$dir')").as[Int]
      .collect().head == 0)
  }

  test("unknown procedure and missing table both fail with typed " +
    "errors; SHOW PROCEDURES lists the surface") {
    wh
    val e1 = intercept[Exception](
      sql("CALL gproc.system.frobnicate('t')").collect())
    // Spark wraps loadProcedure failures in FAILED_TO_LOAD_ROUTINE; the
    // catalog's available-procedures message rides the cause chain
    val chain = Iterator.iterate(e1: Throwable)(_.getCause)
      .takeWhile(_ != null).map(_.getMessage).mkString(" | ")
    assert(chain.contains("FAILED_TO_LOAD_ROUTINE") &&
      chain.contains("available"), chain)
    val e2 = intercept[Exception](
      sql("CALL gproc.system.vacuum('nope.missing')").collect())
    assert(e2.getMessage.toLowerCase.contains("table"), e2.getMessage)
    val listed = sql("SHOW PROCEDURES IN gproc.system")
      .collect().map(_.mkString(",")).mkString("\n")
    assert(listed.contains("compact") && listed.contains("vacuum") &&
      listed.contains("expire_snapshots"), listed)
  }
}
