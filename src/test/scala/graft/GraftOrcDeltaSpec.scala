package graft

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.v2.{GraftOrcManifest, GraftOrcMor}

/** Delta-based (merge-on-read) UPDATE / MERGE / DELETE-fallback via
  * SupportsDelta: the operation's plan reads only the changed rows and
  * commits position-delete sidecars plus (for updates/inserts) new data
  * files in one snapshot — no pre-existing data file is rewritten, and
  * the final state is identical to the copy-on-write plan's.
  */
class GraftOrcDeltaSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fsOf(dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def snapshot(dir: String): GraftOrcManifest.Snapshot =
    GraftOrcManifest.readSnapshot(fsOf(dir), new Path(dir)).get

  /** NULL-bearing seed so three-valued predicate semantics are real. */
  private def seeded: DataFrame =
    spark.range(300).select($"id",
      when($"id" % 7 === 0, lit(null).cast("double"))
        .otherwise(($"id" % 100).cast("double")).as("bal"),
      concat(lit("s"), ($"id" % 3).cast("string")).as("seg"))

  private def freshTable(tag: String, props: String): (String, String) = {
    val dir = Files.createTempDirectory(s"graft-delta-$tag").toString
    seeded.repartition(4).write.format("graft-orc")
      .option("graft.manifest", "true").mode("append").save(dir)
    val name = s"g_delta_$tag"
    spark.sql(s"DROP TABLE IF EXISTS $name")
    spark.sql(s"CREATE TABLE $name USING `graft-orc` LOCATION '$dir' " +
      s"TBLPROPERTIES($props)")
    (dir, name)
  }

  private def content(dir: String): Set[(Long, Option[Double], String)] =
    spark.read.format("graft-orc").load(dir)
      .select($"id", $"bal", $"seg").collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getDouble(1)),
        r.getString(2))).toSet

  test("MoR UPDATE rewrites no data file: sidecars + insert files only, " +
    "final state identical to the CoW UPDATE") {
    val (dirM, tM) = freshTable("upd", "'graft.update_mode'='mor'")
    val (dirC, tC) = freshTable("updcow", "'graft.update_mode'='cow'")
    try {
      val beforeFiles = snapshot(dirM).entries.map(_.path).toSet
      val cmd = "SET bal = bal + 1000 WHERE bal >= 90"
      spark.sql(s"UPDATE $tM $cmd")
      spark.sql(s"UPDATE $tC $cmd")
      val after = snapshot(dirM)
      assert(beforeFiles.subsetOf(after.entries.map(_.path).toSet),
        "delta UPDATE must keep every pre-existing data file")
      assert(after.deletes.nonEmpty, "position sidecars must be committed")
      assert(after.entries.map(_.path).toSet.diff(beforeFiles).nonEmpty,
        "updated rows must land in new data files")
      assert(content(dirM) === content(dirC),
        "MoR and CoW UPDATE must agree on the final table state")
      // NULL bal is not >= 90: every id%7 row is untouched
      assert(spark.read.format("graft-orc").load(dirM)
        .filter($"bal".isNull).count() ===
        seeded.filter($"bal".isNull).count())
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $tM")
      spark.sql(s"DROP TABLE IF EXISTS $tC")
    }
  }

  test("MoR MERGE (update + delete + insert actions) matches the CoW " +
    "MERGE; only sidecars and new files appear") {
    val (dirM, tM) = freshTable("mrg", "'graft.merge_mode'='mor'")
    val (dirC, tC) = freshTable("mrgcow", "'graft.merge_mode'='cow'")
    // source: every 5th key updates, every 50th deletes, keys beyond the
    // table insert
    spark.range(0, 400, 5).select($"id",
        lit(7.5).as("bal"), lit("mrg").as("seg"))
      .createOrReplaceTempView("delta_mrg_src")
    val merge = (t: String) => spark.sql(
      s"""MERGE INTO $t t USING delta_mrg_src s ON t.id = s.id
         |WHEN MATCHED AND t.id % 50 = 0 THEN DELETE
         |WHEN MATCHED THEN UPDATE SET bal = s.bal, seg = s.seg
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    try {
      val beforeFiles = snapshot(dirM).entries.map(_.path).toSet
      merge(tM); merge(tC)
      val after = snapshot(dirM)
      assert(beforeFiles.subsetOf(after.entries.map(_.path).toSet),
        "delta MERGE must keep every pre-existing data file")
      assert(after.deletes.nonEmpty)
      assert(content(dirM) === content(dirC),
        "MoR and CoW MERGE must agree on the final table state")
      // spot-check all three actions
      val m = spark.read.format("graft-orc").load(dirM)
      assert(m.filter($"id" === 50).count() === 0L, "matched-delete")
      assert(m.filter($"id" === 5 && $"seg" === "mrg").count() === 1L)
      assert(m.filter($"id" === 305).count() === 1L, "not-matched insert")
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $tM")
      spark.sql(s"DROP TABLE IF EXISTS $tC")
      spark.catalog.dropTempView("delta_mrg_src")
    }
  }

  test("a second MoR UPDATE stacks on the first; purge retires all " +
    "sidecars and preserves the state") {
    val (dir, t) = freshTable("stack", "'graft.update_mode'='mor'")
    try {
      spark.sql(s"UPDATE $t SET bal = 1.0 WHERE bal < 10")
      spark.sql(s"UPDATE $t SET bal = 2.0 WHERE bal = 1.0")
      val want = content(dir)
      assert(!want.exists(_._2.contains(1.0)),
        "second update must see (and update) the first update's rows")
      assert(snapshot(dir).deletes.size >= 2)
      GraftOrcMor.purge(spark, dir)
      assert(snapshot(dir).deletes.isEmpty, "purge retires every sidecar")
      assert(content(dir) === want, "purge must not change the state")
    } finally spark.sql(s"DROP TABLE IF EXISTS $t")
  }

  test("DELETE with an untranslatable predicate on a MoR table goes " +
    "through the delta plan: no rewrite, NULL keeps the row") {
    val (dir, t) = freshTable("del", "'graft.delete_mode'='mor'")
    try {
      val beforeFiles = snapshot(dir).entries.map(_.path).toSet
      // length() is not Filter-translatable -> canDeleteWhere refuses ->
      // row-level delta plan (delete-only: no insert files at all)
      spark.sql(s"DELETE FROM $t WHERE length(seg) + bal < 12")
      val after = snapshot(dir)
      assert(after.entries.map(_.path).toSet === beforeFiles,
        "delete-only delta must add no data file and drop none")
      assert(after.deletes.nonEmpty)
      val got = content(dir)
      val kept = seeded.collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getDouble(1)),
        r.getString(2)))
        .filterNot { case (_, b, s) => b.exists(s.length + _ < 12) }.toSet
      assert(got === kept, "predicate TRUE deletes; NULL keeps the row")
    } finally spark.sql(s"DROP TABLE IF EXISTS $t")
  }

  test("MoR UPDATE on a declared-partitioned table moves rows across " +
    "partitions (delete old position + insert under the new directory)") {
    val dir = Files.createTempDirectory("graft-delta-part").toString
    spark.sql(
      s"""CREATE TABLE g_delta_part (id BIGINT, bal DOUBLE, seg STRING)
         |USING `graft-orc` PARTITIONED BY (seg)
         |LOCATION '$dir'
         |TBLPROPERTIES('graft.update_mode'='mor')""".stripMargin)
    try {
      seeded.select("id", "bal", "seg")
        .write.format("graft-orc").option("graft.manifest", "true")
        .mode("append").insertInto("g_delta_part")
      val beforeFiles = snapshot(dir).entries.map(_.path).toSet
      val moved = spark.sql(
        "SELECT count(*) FROM g_delta_part WHERE seg = 's2'")
        .collect().head.getLong(0)
      spark.sql("UPDATE g_delta_part SET seg = 's9' WHERE seg = 's2'")
      assert(beforeFiles.subsetOf(snapshot(dir).entries.map(_.path).toSet))
      assert(spark.sql(
        "SELECT count(*) FROM g_delta_part WHERE seg = 's2'")
        .collect().head.getLong(0) === 0L)
      assert(spark.sql(
        "SELECT count(*) FROM g_delta_part WHERE seg = 's9'")
        .collect().head.getLong(0) === moved)
      // the inserted copies physically live under the new hive directory
      assert(snapshot(dir).entries.exists(_.path.contains("seg=s9")),
        "moved rows must land under seg=s9/")
    } finally spark.sql("DROP TABLE IF EXISTS g_delta_part")
  }

  test("session-conf default engages MoR without table properties") {
    val dir = Files.createTempDirectory("graft-delta-conf").toString
    seeded.repartition(4).write.format("graft-orc")
      .option("graft.manifest", "true").mode("append").save(dir)
    spark.sql("DROP TABLE IF EXISTS g_delta_conf")
    spark.sql(s"CREATE TABLE g_delta_conf USING `graft-orc` LOCATION '$dir'")
    spark.conf.set("spark.graft.update_mode", "mor")
    try {
      val beforeFiles = snapshot(dir).entries.map(_.path).toSet
      spark.sql("UPDATE g_delta_conf SET bal = 0.0 WHERE bal > 95")
      assert(beforeFiles.subsetOf(snapshot(dir).entries.map(_.path).toSet))
      assert(snapshot(dir).deletes.nonEmpty)
    } finally {
      spark.conf.unset("spark.graft.update_mode")
      spark.sql("DROP TABLE IF EXISTS g_delta_conf")
    }
  }
}
