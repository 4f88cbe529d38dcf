package graft

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.v2.{GraftOrcManifest, GraftOrcMetadata}

/** Branch lineages + write-audit-publish
  * ([[graft.sources.v2.GraftOrcManifest]] branches): a branch is a
  * parallel snapshot chain over the table's shared file pool —
  * `graft.branch` writes land invisibly to main readers, any query
  * audits the branch, `fastForward` publishes atomically. The spec pins
  * the isolation, the publish, the divergence check, and the part that
  * actually bites at scale: branch files must survive main-side
  * housekeeping (truncate, retention expiry, vacuum) and vice versa.
  */
class GraftOrcBranchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def conf = spark.sparkContext.hadoopConfiguration
  private def fsOf(dir: String) = new Path(dir).getFileSystem(conf)

  private def freshTable(rows: Int = 10): String = {
    val dir = Files.createTempDirectory("graft-branch").toString
    spark.range(0, rows).selectExpr("id AS a", "concat('m', id) AS b")
      .repartition(2).write.format("graft-orc")
      .option("graft.manifest", "true").mode("append").save(dir)
    dir
  }

  private def readMain(dir: String) =
    spark.read.format("graft-orc").load(dir)
  private def readBranch(dir: String, b: String) =
    spark.read.format("graft-orc").option("graft.branch", b).load(dir)

  test("branch writes are invisible to main; branch reads see fork " +
    "state + branch commits; branches metadata table tracks base/head") {
    val dir = freshTable()
    val fs = fsOf(dir)
    val fork = GraftOrcManifest.createBranch(fs, new Path(dir), "audit")
    assert(fork == 1L)
    spark.range(100, 105).selectExpr("id AS a", "concat('s', id) AS b")
      .write.format("graft-orc").option("graft.branch", "audit")
      .mode("append").save(dir)
    assert(readMain(dir).count() == 10, "main must not see branch rows")
    assert(readBranch(dir, "audit").count() == 15)
    assert(readBranch(dir, "audit").filter($"a" >= 100).count() == 5)
    val meta = GraftOrcMetadata.branches(spark, dir)
      .as[(String, Long, Long)].collect().toSeq
    assert(meta == Seq(("audit", 1L, 2L)), meta.toString)
  }

  test("fastForward publishes the branch head as ONE main commit and " +
    "drops the branch; snapshots read as op=publish") {
    val dir = freshTable()
    val fs = fsOf(dir)
    GraftOrcManifest.createBranch(fs, new Path(dir), "stage")
    spark.range(100, 103).selectExpr("id AS a", "concat('s', id) AS b")
      .write.format("graft-orc").option("graft.branch", "stage")
      .mode("append").save(dir)
    val (base, pub) = GraftOrcManifest.fastForward(conf, dir, "stage")
    assert((base, pub) == (1L, 2L))
    assert(readMain(dir).count() == 13)
    assert(!GraftOrcManifest.branchExists(fs, new Path(dir), "stage"))
    val op = GraftOrcMetadata.snapshots(spark, dir)
      .orderBy($"seq".desc).select("op").as[String].collect().head
    assert(op == "publish")
  }

  test("fastForward on a diverged main fails typed; the branch " +
    "survives for re-fork") {
    val dir = freshTable()
    val fs = fsOf(dir)
    GraftOrcManifest.createBranch(fs, new Path(dir), "slow")
    // main advances past the fork point
    spark.range(200, 202).selectExpr("id AS a", "concat('x', id) AS b")
      .write.format("graft-orc").mode("append").save(dir)
    val e = intercept[java.util.ConcurrentModificationException](
      GraftOrcManifest.fastForward(conf, dir, "slow"))
    assert(e.getMessage.contains("fork point"), e.getMessage)
    assert(GraftOrcManifest.branchExists(fs, new Path(dir), "slow"))
  }

  test("cherryPick publishes a diverged branch's net additions onto " +
    "the moved main, keeping main's concurrent mutations — even after " +
    "branch churn expired the fork snapshot") {
    val dir = freshTable()
    val fs = fsOf(dir)
    GraftOrcManifest.createBranch(fs, new Path(dir), "ing")
    // branch churn with retain=1: the fork SNAPSHOT expires from the
    // branch dir; the base.json fork witness must still drive the diff
    (0 until 4).foreach { i =>
      spark.range(100 + i * 10, 105 + i * 10)
        .selectExpr("id AS a", "concat('s', id) AS b").repartition(1)
        .write.format("graft-orc").option("graft.branch", "ing")
        .option("graft.manifest.retain", "1").mode("append").save(dir)
    }
    // main diverges meanwhile: an append AND a DELETE
    spark.range(200, 203).selectExpr("id AS a", "concat('x', id) AS b")
      .write.format("graft-orc").mode("append").save(dir)
    val t = "g_cherry_" + java.util.UUID.randomUUID().toString
      .replace("-", "").take(8)
    spark.sql(s"CREATE TABLE $t USING `graft-orc` LOCATION '$dir'")
    try spark.sql(s"DELETE FROM $t WHERE a < 3")
    finally spark.sql(s"DROP TABLE IF EXISTS $t")
    val (pub, added) = GraftOrcManifest.cherryPick(conf, dir, "ing")
    assert(added == 4, s"one net-new file per branch commit: $added")
    val rows = readMain(dir).select($"a").as[Long].collect().toSet
    assert(rows == ((3L until 10L) ++ (200L until 203L) ++
      (0 until 4).flatMap(i => (100L + i * 10) until (105L + i * 10)))
      .toSet, s"main keeps its delete+append AND gains the staged rows")
    assert(!GraftOrcManifest.branchExists(fs, new Path(dir), "ing"))
    assert(pub >= 4)
  }

  test("forked files survive main truncate + aggressive expiry + " +
    "vacuum; dropping the branch makes them vacuumable") {
    val dir = freshTable()
    val fs = fsOf(dir)
    GraftOrcManifest.createBranch(fs, new Path(dir), "pin")
    // overwrite main with retain=1, then more appends: every snapshot
    // referencing the forked files expires from MAIN
    spark.range(300, 302).selectExpr("id AS a", "concat('t', id) AS b")
      .write.format("graft-orc").option("graft.manifest.retain", "1")
      .mode("overwrite").save(dir)
    spark.range(302, 304).selectExpr("id AS a", "concat('t', id) AS b")
      .write.format("graft-orc").mode("append").save(dir)
    assert(GraftOrcManifest.vacuum(conf, dir) == 0,
      "vacuum must treat branch-referenced files as live")
    // the branch still reads its fork state byte-for-byte
    assert(readBranch(dir, "pin").filter($"a" < 100).count() == 10)
    assert(readMain(dir).count() == 4)
    // release the branch: its files are now garbage, vacuum reclaims
    assert(GraftOrcManifest.dropBranch(fs, new Path(dir), "pin"))
    assert(GraftOrcManifest.vacuum(conf, dir) >= 1)
    assert(readMain(dir).count() == 4)
  }

  test("branch expiry is scoped to the branch and never touches files " +
    "shared with main") {
    val dir = freshTable()
    val fs = fsOf(dir)
    GraftOrcManifest.createBranch(fs, new Path(dir), "churn")
    // many branch appends with retain=1: branch history expires as it
    // goes; the forked (shared) files must survive every expiry
    (0 until 4).foreach { i =>
      spark.range(400 + i, 401 + i).selectExpr(
        "id AS a", "concat('c', id) AS b")
        .write.format("graft-orc").option("graft.branch", "churn")
        .option("graft.manifest.retain", "1").mode("append").save(dir)
    }
    assert(readMain(dir).count() == 10, "main intact under branch churn")
    assert(readBranch(dir, "churn").count() == 14)
  }

  test("branch writes reject overwrite, upsert keys, and unknown " +
    "branches; time-travel options are mutually exclusive with branch") {
    val dir = freshTable()
    val fs = fsOf(dir)
    GraftOrcManifest.createBranch(fs, new Path(dir), "b1")
    val df = spark.range(0, 1).selectExpr("id AS a", "'z' AS b")
    val e1 = intercept[Exception](df.write.format("graft-orc")
      .option("graft.branch", "b1").mode("overwrite").save(dir))
    assert(e1.getMessage.contains("append-only"), e1.getMessage)
    val e2 = intercept[Exception](df.write.format("graft-orc")
      .option("graft.branch", "b1").option("graft.upsert_keys", "a")
      .mode("append").save(dir))
    assert(e2.getMessage.contains("mutually exclusive"), e2.getMessage)
    val e3 = intercept[Exception](df.write.format("graft-orc")
      .option("graft.branch", "nope").mode("append").save(dir))
    assert(e3.getMessage.contains("no branch"), e3.getMessage)
    val e4 = intercept[Exception](spark.read.format("graft-orc")
      .option("graft.branch", "b1").option("graft.snapshot_id", "1")
      .load(dir).count())
    assert(e4.getMessage.contains("mutually exclusive"), e4.getMessage)
    val e5 = intercept[Exception](spark.read.format("graft-orc")
      .option("graft.branch", "ghost").load(dir).count())
    assert(e5.getMessage.contains("does not exist"), e5.getMessage)
  }

  test("cherryPick re-stamps published files above main's equality " +
    "sidecars: a main upsert racing the staged batch must not silently " +
    "delete the published rows") {
    val dir = freshTable()
    val fs = fsOf(dir)
    GraftOrcManifest.createBranch(fs, new Path(dir), "eq")
    // branch stages key 7777 (stamped now)...
    Seq((7777L, "staged")).toDF("a", "b").coalesce(1)
      .write.format("graft-orc").option("graft.branch", "eq")
      .mode("append").save(dir)
    // ...then MAIN blind-upserts the same key: its equality sidecar is
    // stamped ABOVE the staged file
    graft.sources.v2.GraftOrcEqDelete.upsert(spark, dir,
      Seq((7777L, "ups")).toDF("a", "b"), Seq("a"))
    GraftOrcManifest.cherryPick(conf, dir, "eq")
    // publish-time ordering (the Iceberg cherry-pick sequence-number
    // contract): the published file is the NEWER commit, so the older
    // sidecar does not apply to it — both rows live, nothing silently
    // vanishes
    val vs = readMain(dir).filter($"a" === 7777L)
      .select($"b").as[String].collect().toSet
    assert(vs == Set("staged", "ups"), vs.toString)
  }

  test("a STREAMING sink targets a branch: epochs land invisibly to " +
    "main until fastForward publishes the audited stream output") {
    val dir = freshTable()
    val fs = fsOf(dir)
    GraftOrcManifest.createBranch(fs, new Path(dir), "live")
    val src = Files.createTempDirectory("graft-branch-ssrc").toString
    val ckpt = Files.createTempDirectory("graft-branch-sckpt").toString
    spark.range(1000, 1005).selectExpr("id AS a", "concat('e', id) AS b")
      .write.mode("overwrite").parquet(src)
    val stream = spark.readStream.schema(
        spark.read.parquet(src).schema).parquet(src)
    val q = stream.writeStream.format("graft-orc")
      .option("checkpointLocation", ckpt)
      .option("graft.branch", "live")
      .outputMode("append").start(dir)
    try {
      q.processAllAvailable()
      // second epoch mid-stream
      spark.range(1005, 1010).selectExpr(
        "id AS a", "concat('e', id) AS b")
        .write.mode("append").parquet(src)
      q.processAllAvailable()
    } finally q.stop()
    assert(readMain(dir).count() == 10,
      "main must not see streamed epochs before publish")
    assert(readBranch(dir, "live").filter($"a" >= 1000).count() == 10)
    GraftOrcManifest.fastForward(conf, dir, "live")
    assert(readMain(dir).count() == 20)
  }

  test("the WAP loop through SQL procedures: create_branch -> staged " +
    "append -> audit -> fast_forward; receipts carried") {
    val wh = Files.createTempDirectory("graft-branch-wh").toString
    spark.conf.set("spark.sql.catalog.gbr",
      "graft.sources.v2.GraftOrcCatalog")
    spark.conf.set("spark.sql.catalog.gbr.warehouse", wh)
    spark.sql("CREATE TABLE gbr.w (a BIGINT, b STRING)")
    spark.sql("INSERT INTO gbr.w SELECT id, concat('m', id) " +
      "FROM range(0, 20)")
    val (b, fork) = spark.sql(
      "CALL gbr.system.create_branch('w', branch => 'ingest')")
      .as[(String, Long)].collect().head
    assert(b == "ingest" && fork == 2L)
    spark.range(100, 110).selectExpr("id AS a", "concat('s', id) AS b")
      .write.format("graft-orc").option("graft.branch", "ingest")
      .mode("append").save(s"$wh/w")
    // audit: quality gate on the branch before anything goes live —
    // through the path option AND through catalog VERSION AS OF
    val staged = readBranch(s"$wh/w", "ingest").filter($"a" >= 100)
    assert(staged.count() == 10)
    assert(spark.sql(
      "SELECT count(*) FROM gbr.w VERSION AS OF 'ingest'").as[Long]
      .collect().head == 30, "VERSION AS OF <branch> reads the head")
    assert(spark.sql("SELECT count(*) FROM gbr.w").as[Long]
      .collect().head == 20, "nothing live before publish")
    val (base, pub) = spark.sql(
      "CALL gbr.system.fast_forward('w', 'ingest')")
      .as[(Long, Long)].collect().head
    assert(pub == base + 1)
    assert(spark.sql("SELECT count(*) FROM gbr.w").as[Long]
      .collect().head == 30)
    // an audit that FAILS instead: drop_branch discards the staging
    spark.sql("CALL gbr.system.create_branch('w', 'bad')").collect()
    spark.range(900, 905).selectExpr("id AS a", "concat('bad', id) AS b")
      .write.format("graft-orc").option("graft.branch", "bad")
      .mode("append").save(s"$wh/w")
    assert(spark.sql("CALL gbr.system.drop_branch('w', 'bad')")
      .as[Boolean].collect().head)
    assert(spark.sql("SELECT count(*) FROM gbr.w").as[Long]
      .collect().head == 30, "dropped staging never published")
  }

  test("per-branch retention: a branch pinned at retain=8 keeps its " +
    "own history depth while main churns at retain=2; the procedure " +
    "accepts the knob; an unpinned branch inherits as before") {
    val dir = freshTable()
    val fs = fsOf(dir)
    val pth = new Path(dir)
    // pin main to an aggressive retain=2 via an explicit commit option
    spark.range(100, 101).selectExpr("id AS a", "'m' AS b")
      .write.format("graft-orc").option("graft.manifest.retain", "2")
      .mode("append").save(dir)
    GraftOrcManifest.createBranch(fs, pth, "slow", retain = Some(8))
    assert(GraftOrcManifest.branchRetain(fs, pth, "slow").contains(8))
    GraftOrcManifest.createBranch(fs, pth, "fast")
    assert(GraftOrcManifest.branchRetain(fs, pth, "fast").isEmpty)
    (0 until 9).foreach { i =>
      spark.range(1000L + i, 1001L + i).selectExpr("id AS a", "'s' AS b")
        .write.format("graft-orc").option("graft.branch", "slow")
        .mode("append").save(dir)
      spark.range(2000L + i, 2001L + i).selectExpr("id AS a", "'f' AS b")
        .write.format("graft-orc").option("graft.branch", "fast")
        .mode("append").save(dir)
      // main churn at retain=2 racing both branch lineages
      spark.range(3000L + i, 3001L + i).selectExpr("id AS a", "'x' AS b")
        .write.format("graft-orc").mode("append").save(dir)
    }
    def snapCount(sub: String): Int =
      fs.listStatus(new Path(dir, sub)).count(st =>
        st.isFile && st.getPath.getName.startsWith("snap-"))
    assert(snapCount("_graft_manifest") == 2,
      "main must hold exactly its retain=2 history")
    assert(snapCount("_graft_manifest/branches/slow") == 8,
      "the pinned branch must hold ITS retain=8 history")
    assert(snapCount("_graft_manifest/branches/fast") == 2,
      "the unpinned branch inherits the header policy (2)")
    // both branch heads still read their full state (files shared with
    // expired main snapshots survive via cross-lineage protection)
    assert(readBranch(dir, "slow").count() == 10 + 1 + 9)
    assert(readBranch(dir, "fast").count() == 10 + 1 + 9)
    // the SQL procedure takes the knob too
    val wh = Files.createTempDirectory("graft-br-ret-wh").toString
    spark.conf.set("spark.sql.catalog.gbret",
      "graft.sources.v2.GraftOrcCatalog")
    spark.conf.set("spark.sql.catalog.gbret.warehouse", wh)
    spark.sql("CREATE TABLE gbret.t (a INT)")
    spark.sql("INSERT INTO gbret.t VALUES (1)")
    spark.sql(
      "CALL gbret.system.create_branch('t', 'audit', retain => 5)")
      .collect()
    assert(GraftOrcManifest.branchRetain(fsOf(wh),
      new Path(s"$wh/t"), "audit").contains(5))
  }

  test("branch max-age: expire_snapshots(older_than, branch) sweeps " +
    "ONE branch's lineage — newest survives, main and sibling branches " +
    "untouched, shared files protected") {
    val dir = freshTable()
    val fs = fsOf(dir)
    val pth = new Path(dir)
    GraftOrcManifest.createBranch(fs, pth, "old", retain = Some(10))
    GraftOrcManifest.createBranch(fs, pth, "sib", retain = Some(10))
    (0 until 4).foreach { i =>
      spark.range(5000L + i, 5001L + i).selectExpr("id AS a", "'o' AS b")
        .write.format("graft-orc").option("graft.branch", "old")
        .mode("append").save(dir)
      spark.range(6000L + i, 6001L + i).selectExpr("id AS a", "'s' AS b")
        .write.format("graft-orc").option("graft.branch", "sib")
        .mode("append").save(dir)
    }
    def snaps(branch: Option[String]) =
      GraftOrcManifest.listSnapshots(fs, pth, branch).get.size
    val (mainBefore, sibBefore) = (snaps(None), snaps(Some("sib")))
    assert(snaps(Some("old")) == 5) // fork + 4 appends (retain 10)
    // future cutoff sweeps all but the newest of the 'old' branch only
    val n = GraftOrcManifest.expireOlderThan(fs, pth,
      System.currentTimeMillis() + 3600 * 1000L, Some("old"))
    assert(n == 4, s"expired $n")
    assert(snaps(Some("old")) == 1)
    assert(snaps(None) == mainBefore && snaps(Some("sib")) == sibBefore,
      "other lineages must be untouched")
    // the branch head still reads everything (fork files shared with
    // main survive through cross-lineage protection)
    assert(readBranch(dir, "old").count() == 10 + 4)
    assert(readMain(dir).count() == 10)
    // SQL surface: the procedure routes the branch arg; count-based
    // form with branch is refused with the pointer to create_branch
    val wh = Files.createTempDirectory("graft-brage-wh").toString
    spark.conf.set("spark.sql.catalog.gbage",
      "graft.sources.v2.GraftOrcCatalog")
    spark.conf.set("spark.sql.catalog.gbage.warehouse", wh)
    spark.sql("CREATE TABLE gbage.t (a INT)")
    spark.sql("INSERT INTO gbage.t VALUES (1)")
    spark.sql("CALL gbage.system.create_branch('t', 'b')").collect()
    spark.sql("INSERT INTO gbage.t.branch_b VALUES (2)")
    val r = spark.sql("CALL gbage.system.expire_snapshots('t', " +
      "older_than => TIMESTAMP '2999-01-01 00:00:00', branch => 'b')")
      .collect()(0)
    assert(r.getInt(0) == 1 && r.getInt(1) == 1, r.toString)
    val e = intercept[Exception](spark.sql(
      "CALL gbage.system.expire_snapshots('t', retain => 2, " +
        "branch => 'b')").collect())
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    assert(chain(e).exists(x => Option(x.getMessage)
      .exists(_.contains("older_than"))), chain(e).map(_.getMessage))
  }

  // ---- branch DML (round 13): DELETE/UPDATE/MERGE stage on the branch

  test("branch DML: DELETE, UPDATE and MERGE against t.branch_<n> " +
    "commit to the BRANCH lineage; main is untouched until " +
    "fast_forward publishes the gated state") {
    val wh = Files.createTempDirectory("graft-branchdml-wh").toString
    spark.conf.set("spark.sql.catalog.gbd",
      "graft.sources.v2.GraftOrcCatalog")
    spark.conf.set("spark.sql.catalog.gbd.warehouse", wh)
    spark.sql("CREATE TABLE gbd.t (k BIGINT, v STRING)")
    spark.sql("INSERT INTO gbd.t SELECT id, concat('m', id) " +
      "FROM range(0, 10)")
    spark.sql("CALL gbd.system.create_branch('t', 'stage')").collect()
    def mainRows() = spark.sql("SELECT k, v FROM gbd.t ORDER BY k")
      .as[(Long, String)].collect().toSeq
    def branchRows() = spark.sql(
      "SELECT k, v FROM gbd.t.branch_stage ORDER BY k")
      .as[(Long, String)].collect().toSeq
    val orig = mainRows()
    // translatable predicate -> SupportsDelete CoW path, on the branch
    spark.sql("DELETE FROM gbd.t.branch_stage WHERE k < 2")
    // untranslatable predicate -> row-level group rewrite, on the branch
    spark.sql("DELETE FROM gbd.t.branch_stage WHERE k % 2 = 0")
    assert(branchRows().map(_._1) == Seq(3L, 5L, 7L, 9L))
    assert(mainRows() == orig, "branch DELETE leaked to main")
    spark.sql("UPDATE gbd.t.branch_stage SET v = 'audited' WHERE k = 3")
    assert(branchRows().head == (3L, "audited"))
    assert(mainRows() == orig, "branch UPDATE leaked to main")
    spark.sql("CREATE TABLE gbd.src (k BIGINT, v STRING)")
    spark.sql("INSERT INTO gbd.src VALUES (5, 'merged'), (100, 'fresh')")
    spark.sql("""MERGE INTO gbd.t.branch_stage t USING gbd.src s
        ON t.k = s.k
        WHEN MATCHED THEN UPDATE SET v = s.v
        WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)""")
    val gated = Seq((3L, "audited"), (5L, "merged"), (7L, "m7"),
      (9L, "m9"), (100L, "fresh"))
    assert(branchRows() == gated)
    assert(mainRows() == orig, "branch MERGE leaked to main")
    spark.sql("CALL gbd.system.fast_forward('t', 'stage')").collect()
    assert(mainRows() == gated, "publish must make main = gated state")
  }

  test("branch MoR DML: position sidecars land on the branch lineage " +
    "only; cherry_pick refuses a DML branch (typed, names " +
    "fast_forward); fast_forward publishes sidecars and purge " +
    "materializes them") {
    val wh = Files.createTempDirectory("graft-branchmor-wh").toString
    spark.conf.set("spark.sql.catalog.gbm",
      "graft.sources.v2.GraftOrcCatalog")
    spark.conf.set("spark.sql.catalog.gbm.warehouse", wh)
    spark.sql("CREATE TABLE gbm.t (k BIGINT, v STRING) " +
      "TBLPROPERTIES('graft.delete_mode'='mor')")
    spark.sql("INSERT INTO gbm.t SELECT /*+ REPARTITION(2) */ id, " +
      "concat('m', id) FROM range(0, 10)")
    spark.sql("CALL gbm.system.create_branch('t', 'stage')").collect()
    spark.sql("DELETE FROM gbm.t.branch_stage WHERE k < 3")
    val fs = fsOf(wh)
    val tp = new Path(s"$wh/t")
    val bSnap = GraftOrcManifest.readSnapshot(fs, tp, Some("stage")).get
    val mSnap = GraftOrcManifest.readSnapshot(fs, tp).get
    assert(bSnap.deletes.nonEmpty,
      "branch MoR delete must commit sidecars to the branch")
    assert(mSnap.deletes.isEmpty,
      "main must not reference the branch's staged sidecars")
    assert(spark.sql("SELECT count(*) FROM gbm.t.branch_stage")
      .as[Long].collect().head == 7)
    assert(spark.sql("SELECT count(*) FROM gbm.t").as[Long]
      .collect().head == 10)
    // a DML branch cannot cherry-pick (net-additions math would lose
    // the staged positions) — typed error naming the fast_forward path
    val e = intercept[Exception](spark.sql(
      "CALL gbm.system.cherry_pick('t', 'stage')").collect())
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    assert(chain(e).exists(x => Option(x.getMessage)
      .exists(_.contains("fast_forward"))), chain(e).map(_.getMessage))
    spark.sql("CALL gbm.system.fast_forward('t', 'stage')").collect()
    assert(spark.sql("SELECT count(*) FROM gbm.t").as[Long]
      .collect().head == 7)
    assert(GraftOrcManifest.readSnapshot(fs, tp).get.deletes.nonEmpty)
    // purge materializes the published positions
    assert(graft.sources.v2.GraftOrcMor.purge(spark, s"$wh/t") > 0)
    assert(spark.sql("SELECT k FROM gbm.t ORDER BY k").as[Long]
      .collect().toSeq == (3L to 9L))
  }

  test("a pure-append branch forked from a main WITH MoR sidecars " +
    "cherry-picks even after main consolidates them away — inherited " +
    "sidecars are not branch DML (the concurrency-stress interleave: " +
    "wap racing consolidate)") {
    val wh = Files.createTempDirectory("graft-branchinh-wh").toString
    spark.conf.set("spark.sql.catalog.gbi",
      "graft.sources.v2.GraftOrcCatalog")
    spark.conf.set("spark.sql.catalog.gbi.warehouse", wh)
    spark.sql("CREATE TABLE gbi.t (k BIGINT, v STRING) " +
      "TBLPROPERTIES('graft.delete_mode'='mor')")
    spark.sql("INSERT INTO gbi.t SELECT /*+ REPARTITION(2) */ id, " +
      "concat('m', id) FROM range(0, 10)")
    // two MAIN MoR deletes -> two position sidecars on main
    spark.sql("DELETE FROM gbi.t WHERE k = 0")
    spark.sql("DELETE FROM gbi.t WHERE k = 1")
    val fs = fsOf(wh)
    val tp = new Path(s"$wh/t")
    val forkDeletes = GraftOrcManifest.readSnapshot(fs, tp).get.deletes
    assert(forkDeletes.size == 2, "setup: expected two main sidecars")
    // fork, then append-only staging on the branch
    spark.sql("CALL gbi.system.create_branch('t', 'wap')").collect()
    spark.sql("INSERT INTO gbi.t.branch_wap SELECT id, concat('w', id) " +
      "FROM range(100, 105)")
    // main moves on: consolidation replaces both sidecars with one new
    // dv file (the branch still references the old two), plus a
    // diverging append so the pick really is onto moved state
    assert(graft.sources.v2.GraftOrcMor.consolidate(spark, s"$wh/t")._1 > 0)
    spark.sql("INSERT INTO gbi.t VALUES (200, 'late')")
    val mainDel = GraftOrcManifest.readSnapshot(fs, tp).get.deletes
      .map(_.path).toSet
    assert(forkDeletes.forall(d => !mainDel.contains(d.path)),
      "setup: consolidation must have replaced the fork-era sidecars")
    // the pick must succeed: the branch ADDED no sidecars
    val (_, added) = GraftOrcManifest.cherryPick(conf, s"$wh/t", "wap")
    assert(added >= 1, s"expected the staged files to publish, got $added")
    assert(spark.sql("SELECT count(*) FROM gbi.t").as[Long]
      .collect().head == 8 + 5 + 1) // 10-2 deleted, +5 staged, +1 late
    assert(spark.sql("SELECT v FROM gbi.t WHERE k = 102").as[String]
      .collect().toSeq == Seq("w102"))
  }

  test("old-format fork witness (no dv marker): cherry_pick falls back " +
    "to the conservative current-main comparison and refuses when main " +
    "no longer references the inherited sidecars") {
    val wh = Files.createTempDirectory("graft-branchold-wh").toString
    spark.conf.set("spark.sql.catalog.gbo",
      "graft.sources.v2.GraftOrcCatalog")
    spark.conf.set("spark.sql.catalog.gbo.warehouse", wh)
    spark.sql("CREATE TABLE gbo.t (k BIGINT, v STRING) " +
      "TBLPROPERTIES('graft.delete_mode'='mor')")
    spark.sql("INSERT INTO gbo.t SELECT /*+ REPARTITION(2) */ id, " +
      "concat('m', id) FROM range(0, 10)")
    spark.sql("DELETE FROM gbo.t WHERE k = 0")
    spark.sql("DELETE FROM gbo.t WHERE k = 1")
    spark.sql("CALL gbo.system.create_branch('t', 'wap')").collect()
    spark.sql("INSERT INTO gbo.t.branch_wap SELECT id, concat('w', id) " +
      "FROM range(100, 105)")
    // rewrite the witness into the PRE-MARKER format: strip the dv
    // marker and the "d" lines (what a branch forked by an older build
    // left on disk)
    val fs = fsOf(wh)
    val witness = new Path(s"$wh/t/_graft_manifest/branches/wap/base.json")
    val in = fs.open(witness)
    val lines = try scala.io.Source.fromInputStream(in, "UTF-8")
      .getLines().toList finally in.close()
    val out = fs.create(witness, true)
    try {
      val w = new java.io.BufferedWriter(
        new java.io.OutputStreamWriter(out, "UTF-8"))
      lines.foreach { l =>
        if (!l.startsWith("{\"d\":")) {
          w.write(l.replace(",\"dv\":1", "")); w.newLine()
        }
      }
      w.flush()
    } finally out.close()
    assert(graft.sources.v2.GraftOrcMor.consolidate(spark, s"$wh/t")._1 > 0)
    spark.sql("INSERT INTO gbo.t VALUES (200, 'late')")
    val e = intercept[Exception](
      GraftOrcManifest.cherryPick(conf, s"$wh/t", "wap"))
    assert(Option(e.getMessage).exists(_.contains("fast_forward")),
      e.getMessage)
  }

  test("a CoW-DML branch also refuses cherry_pick (rewrites would " +
    "duplicate surviving rows of rewritten fork files)") {
    val wh = Files.createTempDirectory("graft-branchcp-wh").toString
    spark.conf.set("spark.sql.catalog.gbc",
      "graft.sources.v2.GraftOrcCatalog")
    spark.conf.set("spark.sql.catalog.gbc.warehouse", wh)
    spark.sql("CREATE TABLE gbc.t (k BIGINT, v STRING)")
    spark.sql("INSERT INTO gbc.t SELECT id, concat('m', id) " +
      "FROM range(0, 10)")
    spark.sql("CALL gbc.system.create_branch('t', 'stage')").collect()
    spark.sql("DELETE FROM gbc.t.branch_stage WHERE k < 5")
    // diverge main so fast_forward is off the table, then try the pick
    spark.sql("INSERT INTO gbc.t VALUES (200, 'late')")
    val e = intercept[Exception](spark.sql(
      "CALL gbc.system.cherry_pick('t', 'stage')").collect())
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    assert(chain(e).exists(x => Option(x.getMessage)
      .exists(m => m.contains("fast_forward") && m.contains("DML"))),
      chain(e).map(_.getMessage))
    // nothing was published or mutated by the refusal
    assert(spark.sql("SELECT count(*) FROM gbc.t").as[Long]
      .collect().head == 11)
  }
}
