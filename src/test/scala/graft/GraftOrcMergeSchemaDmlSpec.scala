package graft

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.v2.GraftOrcManifest

/** `MERGE INTO ... WITH SCHEMA EVOLUTION` — write-path schema evolution
  * on the ROW-LEVEL paths (Spark 4's surface: the table reports
  * `AUTOMATIC_SCHEMA_EVOLUTION`, the analyzer routes the source's new
  * columns through `GraftOrcCatalog.alterTable` as ADD COLUMN changes —
  * ONE metadata commit — and the rewrite then runs under the evolved
  * schema). The CDC twin of the append-path `graft.merge_schema`: a
  * crawler adds a field and the MERGE upserting its batch evolves the
  * table instead of erroring — old rows null-fill via field-ID
  * resolution, no data is rewritten for the evolution itself.
  *
  * Covered: copy-on-write MERGE (group rewrite) and merge-on-read MERGE
  * (SupportsDelta position deltas), and the no-clause posture (extra
  * source columns are DROPPED by star expansion, the table does not
  * evolve — Spark's own semantics).
  */
class GraftOrcMergeSchemaDmlSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val wh: String = {
    val dir = Files.createTempDirectory("graft-msd-wh").toString
    spark.conf.set("spark.sql.catalog.gmsd",
      "graft.sources.v2.GraftOrcCatalog")
    spark.conf.set("spark.sql.catalog.gmsd.warehouse", dir)
    dir
  }

  private def snapshot(dir: String): GraftOrcManifest.Snapshot = {
    val fs = new Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    GraftOrcManifest.readSnapshot(fs, new Path(dir)).get
  }

  private def freshTable(tag: String, props: String = ""): (String, String) = {
    wh
    val t = s"gmsd.msd_$tag"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"CREATE TABLE $t (id BIGINT, bal DOUBLE)" +
      (if (props.nonEmpty) s" TBLPROPERTIES($props)" else ""))
    spark.sql(s"INSERT INTO $t SELECT /*+ REPARTITION(4) */ id, " +
      "CAST(id % 100 AS DOUBLE) FROM range(200)")
    (s"$wh/msd_$tag", t)
  }

  /** The MERGE source carries a NEW column `src`. */
  private def mergeWith(t: String, evolution: Boolean): Unit = {
    val ev = if (evolution) "WITH SCHEMA EVOLUTION " else ""
    spark.sql(
      s"""MERGE $ev INTO $t t
         |USING (SELECT id * 2 AS id, CAST(id AS DOUBLE) AS bal,
         |         'cdc' AS src
         |       FROM range(150)) s
         |ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
  }

  private def expected: Set[(Long, Double, Option[String])] = {
    val merged = (0 until 150).map(i =>
      (i.toLong * 2, i.toDouble, Some("cdc")))
    val mergedIds = merged.map(_._1).toSet
    val kept = (0 until 200).filterNot(i => mergedIds(i.toLong))
      .map(i => (i.toLong, (i % 100).toDouble, None))
    (merged ++ kept).toSet
  }

  private def content(t: String): Set[(Long, Double, Option[String])] =
    spark.sql(s"SELECT id, bal, src FROM $t").collect()
      .map(r => (r.getLong(0), r.getDouble(1),
        if (r.isNullAt(2)) None else Some(r.getString(2)))).toSet

  test("CoW MERGE WITH SCHEMA EVOLUTION adds the source's new column " +
    "as ONE metadata commit; old rows null-fill") {
    val (dir, t) = freshTable("cow")
    try {
      mergeWith(t, evolution = true)
      assert(content(t) === expected)
      val meta = snapshot(dir).meta
      assert(meta.exists(_.schema.fieldNames.contains("src")),
        s"table meta must carry the evolved column, got $meta")
    } finally spark.sql(s"DROP TABLE IF EXISTS $t")
  }

  test("MoR (delta) MERGE WITH SCHEMA EVOLUTION: same result, " +
    "pre-existing files untouched, evolution committed as metadata") {
    val (dir, t) = freshTable("mor", "'graft.merge_mode'='mor'")
    try {
      val beforeFiles = snapshot(dir).entries.map(_.path).toSet
      mergeWith(t, evolution = true)
      val after = snapshot(dir)
      assert(beforeFiles.subsetOf(after.entries.map(_.path).toSet),
        "delta MERGE must keep every pre-existing data file")
      assert(after.deletes.nonEmpty, "position sidecars must be committed")
      assert(after.meta.exists(_.schema.fieldNames.contains("src")),
        s"table meta must carry the evolved column, got ${after.meta}")
      assert(content(t) === expected)
    } finally spark.sql(s"DROP TABLE IF EXISTS $t")
  }

  test("MERGE WITH SCHEMA EVOLUTION widens int -> bigint when the " +
    "source carries the wider type") {
    wh
    val t = "gmsd.msd_widen"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"CREATE TABLE $t (id BIGINT, score INT)")
    spark.sql(s"INSERT INTO $t SELECT id, CAST(id % 100 AS INT) " +
      "FROM range(50)")
    try {
      spark.sql(
        s"""MERGE WITH SCHEMA EVOLUTION INTO $t t
           |USING (SELECT id, CAST(id + 3000000000 AS BIGINT) AS score
           |       FROM range(40, 60)) s
           |ON t.id = s.id
           |WHEN MATCHED THEN UPDATE SET *
           |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
      val sc = spark.table(t).schema("score").dataType
      assert(sc === org.apache.spark.sql.types.LongType,
        s"score must widen to bigint, got $sc")
      assert(spark.sql(s"SELECT sum(score) FROM $t WHERE id >= 40")
        .collect()(0).getLong(0) ===
        (40L until 60L).map(_ + 3000000000L).sum)
    } finally spark.sql(s"DROP TABLE IF EXISTS $t")
  }

  test("MERGE without the evolution clause drops the extra source " +
    "column and the table does not evolve") {
    val (dir, t) = freshTable("noclause")
    try {
      mergeWith(t, evolution = false)
      assert(!snapshot(dir).meta.exists(
        _.schema.fieldNames.contains("src")),
        "a plain MERGE must not evolve the table")
      assert(!spark.table(t).schema.fieldNames.contains("src"))
      // the merge itself still applied (src silently dropped — Spark's
      // star-expansion semantics without the clause)
      assert(spark.sql(s"SELECT count(*) FROM $t WHERE id = 298")
        .collect()(0).getLong(0) === 1L)
    } finally spark.sql(s"DROP TABLE IF EXISTS $t")
  }
}
