package graft

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.v2.{GraftOrcManifest, GraftOrcMor, GraftOrcSchema}

/** Column DEFAULT values (Iceberg-v3 initial defaults / Spark's
  * default-column framework): `ADD COLUMN ... DEFAULT <lit>` is one
  * metadata commit where
  *  - files written BEFORE the add read the default (the EXISTS
  *    default, frozen at add time — served by the scan's
  *    constant-vector machinery, zero data rewritten), and
  *  - INSERTs that omit the column get the CURRENT default (filled by
  *    Spark's analyzer; the catalog advertises
  *    SUPPORT_COLUMN_DEFAULT_VALUE).
  * `ALTER COLUMN ... SET DEFAULT` changes only the CURRENT default;
  * rows already on disk keep reading the initial one.
  */
class GraftOrcDefaultValueSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val wh: String = {
    val dir = Files.createTempDirectory("graft-dflt-wh").toString
    spark.conf.set("spark.sql.catalog.gdflt",
      "graft.sources.v2.GraftOrcCatalog")
    spark.conf.set("spark.sql.catalog.gdflt.warehouse", dir)
    dir
  }

  test("ADD COLUMN DEFAULT: pre-add files read the default, not NULL; " +
    "INSERTs omitting the column get it too") {
    wh
    val t = "gdflt.d1"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"CREATE TABLE $t (id BIGINT, bal DOUBLE)")
    spark.sql(s"INSERT INTO $t SELECT id, CAST(id AS DOUBLE) " +
      "FROM range(10)")
    try {
      spark.sql(s"ALTER TABLE $t ADD COLUMN src STRING DEFAULT 'legacy'")
      // old rows: the initial default, served with no rewrite
      assert(spark.sql(s"SELECT count(*) FROM $t WHERE src = 'legacy'")
        .collect()(0).getLong(0) === 10L)
      // an INSERT naming only (id, bal) fills the CURRENT default
      spark.sql(s"INSERT INTO $t (id, bal) VALUES (100, 1.0)")
      assert(spark.sql(s"SELECT src FROM $t WHERE id = 100")
        .collect()(0).getString(0) === "legacy")
      // an INSERT carrying the column wins over the default
      spark.sql(s"INSERT INTO $t VALUES (101, 2.0, 'crawl2')")
      assert(spark.sql(s"SELECT src FROM $t WHERE id = 101")
        .collect()(0).getString(0) === "crawl2")
      // filters against the defaulted value work on old files (residual
      // evaluation over the constant vector)
      assert(spark.sql(
        s"SELECT count(*) FROM $t WHERE src = 'legacy' AND id < 10")
        .collect()(0).getLong(0) === 10L)
    } finally spark.sql(s"DROP TABLE IF EXISTS $t")
  }

  test("numeric default casts to the column type; projecting ONLY the " +
    "defaulted column from old files still yields one row per row") {
    wh
    val t = "gdflt.d2"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"CREATE TABLE $t (id BIGINT)")
    spark.sql(s"INSERT INTO $t SELECT id FROM range(7)")
    try {
      spark.sql(s"ALTER TABLE $t ADD COLUMN score BIGINT DEFAULT 5")
      val got = spark.sql(s"SELECT score FROM $t").collect()
        .map(_.getLong(0)).toSeq
      assert(got === Seq.fill(7)(5L))
      assert(spark.sql(s"SELECT sum(score) FROM $t")
        .collect()(0).getLong(0) === 35L)
    } finally spark.sql(s"DROP TABLE IF EXISTS $t")
  }

  test("SET DEFAULT changes only the CURRENT default; pre-add rows " +
    "keep the initial one; purge MATERIALIZES the initial default") {
    wh
    val t = "gdflt.d3"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"CREATE TABLE $t (id BIGINT) " +
      "TBLPROPERTIES('graft.delete_mode'='mor')")
    spark.sql(s"INSERT INTO $t SELECT id FROM range(10)")
    try {
      spark.sql(s"ALTER TABLE $t ADD COLUMN tag STRING DEFAULT 'v1'")
      spark.sql(s"ALTER TABLE $t ALTER COLUMN tag SET DEFAULT 'v2'")
      spark.sql(s"INSERT INTO $t (id) VALUES (50)")
      // new row: v2 (current); old rows: v1 (initial, frozen)
      assert(spark.sql(s"SELECT tag FROM $t WHERE id = 50")
        .collect()(0).getString(0) === "v2")
      assert(spark.sql(s"SELECT count(*) FROM $t WHERE tag = 'v1'")
        .collect()(0).getLong(0) === 10L)
      // a MoR delete + purge rewrites the old files: the materialized
      // rows must carry the same 'v1' the scan served
      spark.sql(s"DELETE FROM $t WHERE id = 3")
      val dir = s"$wh/d3"
      GraftOrcMor.purge(spark, dir)
      assert(spark.sql(s"SELECT count(*) FROM $t WHERE tag = 'v1'")
        .collect()(0).getLong(0) === 9L)
      // and the rewritten files physically CARRY the column now: the
      // entries' schemaV postdates the add
      val fs = new Path(dir).getFileSystem(
        spark.sparkContext.hadoopConfiguration)
      val snap = GraftOrcManifest.readSnapshot(fs, new Path(dir)).get
      assert(snap.deletes.isEmpty)
    } finally spark.sql(s"DROP TABLE IF EXISTS $t")
  }

  test("path-API addColumn(default) serves old files the default; " +
    "non-constant defaults refuse at DDL time") {
    val dir = Files.createTempDirectory("graft-dflt-path").toString
    spark.range(5).select($"id").repartition(1)
      .write.format("graft-orc")
      .option("graft.manifest", "true").mode("append").save(dir)
    val conf = spark.sparkContext.hadoopConfiguration
    GraftOrcSchema.alter(conf, dir)(
      GraftOrcSchema.addColumn(_, "gen", org.apache.spark.sql.types
        .LongType, default = Some("42")))
    val got = spark.read.format("graft-orc").load(dir)
      .select($"gen").collect().map(_.getLong(0)).toSeq
    assert(got === Seq.fill(5)(42L))
    val e = intercept[IllegalArgumentException] {
      GraftOrcSchema.alter(conf, dir)(
        GraftOrcSchema.addColumn(_, "bad", org.apache.spark.sql.types
          .LongType, default = Some("id + 1")))
    }
    assert(e.getMessage.contains("constant"))
  }

  test("defaults compose with evolution: a RENAMED defaulted column " +
    "keeps serving its initial default to pre-add files; time travel " +
    "to a pre-add snapshot never shows the column") {
    wh
    val t = "gdflt.d5"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"CREATE TABLE $t (id BIGINT)")
    spark.sql(s"INSERT INTO $t SELECT id FROM range(4)")    // seq 2
    try {
      spark.sql(s"ALTER TABLE $t ADD COLUMN tag STRING DEFAULT 'x1'")
      spark.sql(s"ALTER TABLE $t RENAME COLUMN tag TO label")
      assert(spark.sql(s"SELECT count(*) FROM $t WHERE label = 'x1'")
        .collect()(0).getLong(0) === 4L)
      // time travel to the pre-add snapshot reads ITS schema — no column
      val dir = s"$wh/d5"
      val pre = spark.read.format("graft-orc")
        .option("graft.snapshot_id", "2").load(dir)
      assert(!pre.schema.fieldNames.exists(n =>
        n.equalsIgnoreCase("label") || n.equalsIgnoreCase("tag")))
    } finally spark.sql(s"DROP TABLE IF EXISTS $t")
  }

  test("a defaulted column participates in MoR equality semantics and " +
    "aggregate pushdown stays refused on files that predate it") {
    wh
    val t = "gdflt.d6"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"CREATE TABLE $t (id BIGINT)")
    spark.sql(s"INSERT INTO $t SELECT id FROM range(6)")
    try {
      spark.sql(s"ALTER TABLE $t ADD COLUMN n BIGINT DEFAULT 7")
      // a MIN/MAX over the defaulted column must come from a REAL read
      // (stats of pre-add files know nothing of the default) — value
      // correctness is the contract
      val r = spark.sql(s"SELECT min(n), max(n), sum(n) FROM $t")
        .collect()(0)
      assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((7L, 7L, 42L)))
      // DELETE keyed on the defaulted value hits pre-add rows
      spark.sql(s"DELETE FROM $t WHERE n = 7 AND id < 2")
      assert(spark.sql(s"SELECT count(*) FROM $t").collect()(0)
        .getLong(0) === 4L)
    } finally spark.sql(s"DROP TABLE IF EXISTS $t")
  }

  test("CREATE TABLE with a column DEFAULT: INSERTs omitting it fill " +
    "the default from day one") {
    wh
    val t = "gdflt.d4"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"CREATE TABLE $t (id BIGINT, lang STRING DEFAULT 'en')")
    try {
      spark.sql(s"INSERT INTO $t (id) VALUES (1), (2)")
      spark.sql(s"INSERT INTO $t VALUES (3, 'de')")
      assert(spark.sql(s"SELECT count(*) FROM $t WHERE lang = 'en'")
        .collect()(0).getLong(0) === 2L)
      assert(spark.sql(s"SELECT lang FROM $t WHERE id = 3")
        .collect()(0).getString(0) === "de")
    } finally spark.sql(s"DROP TABLE IF EXISTS $t")
  }
}
