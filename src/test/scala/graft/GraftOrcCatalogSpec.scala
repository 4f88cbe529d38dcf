package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** Pure-SQL surface of the connector: CREATE TABLE ... USING graft-orc
  * LOCATION, then SELECT / INSERT INTO / INSERT OVERWRITE through the
  * session catalog (the table's stored location feeds both the scan and
  * the write builder).
  */
class GraftOrcCatalogSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("CREATE TABLE USING graft-orc: SELECT, INSERT INTO, INSERT OVERWRITE") {
    val dir = Files.createTempDirectory("graft-orc-catalog").toString
    val nation = Tables.nation(spark, TestSpark.sf0001)
    graft.sources.OrcTables.write(nation, dir)
    val n = nation.count()
    spark.sql(s"CREATE TABLE g_cat_nation USING `graft-orc` LOCATION '$dir'")
    try {
      assert(spark.sql("SELECT count(*) FROM g_cat_nation")
        .collect().head.getLong(0) === n)
      // predicate through the catalog path still prunes/pushes
      assert(spark.sql(
        "SELECT n_name FROM g_cat_nation WHERE n_nationkey = 0")
        .collect().map(_.getString(0)).toSeq.nonEmpty)
      spark.sql(
        "INSERT INTO g_cat_nation SELECT * FROM g_cat_nation WHERE n_nationkey < 3")
      assert(spark.sql("SELECT count(*) FROM g_cat_nation")
        .collect().head.getLong(0) === n + 3)
      spark.sql(
        "INSERT OVERWRITE TABLE g_cat_nation SELECT * FROM g_cat_nation WHERE n_nationkey >= 20")
      // 25 nations with key >= 20: 5 original + 0 of the 3 dup keys (0,1,2)
      assert(spark.sql("SELECT count(*) FROM g_cat_nation")
        .collect().head.getLong(0) === 5)
    } finally spark.sql("DROP TABLE IF EXISTS g_cat_nation")
  }

  test("DELETE FROM with a partition predicate is one atomic metadata " +
    "commit on a manifest table; the pre-delete snapshot stays readable") {
    import graft.sources.v2.GraftOrcManifest
    val dir = Files.createTempDirectory("graft-orc-delete").toString
    val nation = Tables.nation(spark, TestSpark.sf0001)
    nation.write.format("graft-orc").option("graft.manifest", "true")
      .partitionBy("n_regionkey").mode("append").save(dir)        // snap 1
    val n = nation.count()
    val inR0 = nation.filter("n_regionkey = 0").count()
    spark.sql(s"CREATE TABLE g_del_nation USING `graft-orc` LOCATION '$dir'")
    try {
      spark.sql("DELETE FROM g_del_nation WHERE n_regionkey = 0")
      assert(spark.sql("SELECT count(*) FROM g_del_nation")
        .collect().head.getLong(0) === n - inR0)
      // one snapshot commit, no data file read or rewritten
      val table = new org.apache.hadoop.fs.Path(dir)
      val fs = table.getFileSystem(spark.sparkContext.hadoopConfiguration)
      assert(GraftOrcManifest.readSnapshot(fs, table).get.seq === 2L)
      // the pre-delete snapshot stays time-travelable until expiry
      assert(spark.read.format("graft-orc")
        .option("graft.snapshot_id", "1").load(dir).count() === n)
      // a NON-partition predicate pays copy-on-write on exactly the
      // touched files: untouched partitions keep their file identity
      val before = GraftOrcManifest.readSnapshot(fs, table).get.entries
        .map(e => e.path -> e.mtime).toMap
      spark.sql("DELETE FROM g_del_nation WHERE n_name = 'NATION_1'")
      assert(spark.sql("SELECT count(*) FROM g_del_nation")
        .collect().head.getLong(0) === n - inR0 - 1)
      assert(spark.sql(
        "SELECT count(*) FROM g_del_nation WHERE n_name = 'NATION_1'")
        .collect().head.getLong(0) === 0L)
      val after = GraftOrcManifest.readSnapshot(fs, table).get.entries
        .map(e => e.path -> e.mtime).toMap
      // NATION_1 lives in region 1: every file of the other regions must
      // be byte-identical (same path, same mtime — never rewritten)
      val untouched = before.keys.filterNot(_.contains("n_regionkey=1"))
      assert(untouched.nonEmpty)
      untouched.foreach { p =>
        assert(after.get(p) === before.get(p),
          s"file outside the touched partition was rewritten: $p")
      }
      assert(after.keys.exists(p => p.contains("n_regionkey=1") &&
        p.contains("w-del-")), "region 1 must hold a rewrite wave")
      // deleting everything left: TRUNCATE-equivalent via predicate
      spark.sql("DELETE FROM g_del_nation WHERE n_regionkey >= 0")
      assert(spark.sql("SELECT count(*) FROM g_del_nation")
        .collect().head.getLong(0) === 0L)
    } finally spark.sql("DROP TABLE IF EXISTS g_del_nation")
  }

  test("copy-on-write DELETE: NULL predicate rows survive, results match " +
    "the logical minus") {
    val dir = Files.createTempDirectory("graft-orc-delete-cow").toString
    val spark2 = spark
    import spark2.implicits._
    // unpartitioned manifest table with a nullable column in play
    val src = Seq((1L, "a", java.lang.Double.valueOf(1.0)),
      (2L, "b", null.asInstanceOf[java.lang.Double]),
      (3L, "c", java.lang.Double.valueOf(3.0)),
      (4L, "d", java.lang.Double.valueOf(4.0)))
      .toDF("id", "s", "v")
    src.coalesce(1).write.format("graft-orc")
      .option("graft.manifest", "true").mode("append").save(dir)
    spark.sql(s"CREATE TABLE g_del_cow USING `graft-orc` LOCATION '$dir'")
    try {
      // DELETE WHERE v > 2: NULL v is not TRUE, so row 2 must SURVIVE
      spark.sql("DELETE FROM g_del_cow WHERE v > 2")
      val got = spark.sql("SELECT id FROM g_del_cow ORDER BY id")
        .collect().map(_.getLong(0)).toSeq
      assert(got === Seq(1L, 2L),
        "NULL-predicate rows must survive a DELETE (SQL semantics)")
    } finally spark.sql("DROP TABLE IF EXISTS g_del_cow")
  }

  test("metadata full-drop DELETE with a negated predicate keeps NULL " +
    "rows (r10 ADVICE: tri-state NOT must not promote to all-match)") {
    val dir = Files.createTempDirectory("graft-orc-delete-notnull").toString
    val spark2 = spark
    import spark2.implicits._
    // ONE file whose stat range {1.0} excludes the literal 5 AND which
    // holds a NULL: c <> 5 is provably-false under two-valued stats, so
    // a naive NOT promotes "no row matches c=5" to "every row matches
    // c<>5" and full-drops the file — deleting the NULL row, which SQL
    // KEEPS (NULL <> 5 is NULL, not TRUE). The fixed evaluator must
    // classify the file as a partial and copy-on-write it instead.
    Seq((1L, java.lang.Double.valueOf(1.0)),
      (2L, null.asInstanceOf[java.lang.Double]))
      .toDF("id", "v").coalesce(1).write.format("graft-orc")
      .option("graft.manifest", "true").mode("append").save(dir)
    spark.sql(s"CREATE TABLE g_del_not USING `graft-orc` LOCATION '$dir'")
    try {
      spark.sql("DELETE FROM g_del_not WHERE v <> 5")
      val got = spark.sql("SELECT id FROM g_del_not ORDER BY id")
        .collect().map(_.getLong(0)).toSeq
      assert(got === Seq(2L),
        "row with NULL v must survive DELETE WHERE v <> 5")
      // and the dual still full-drops as pure metadata when every row
      // provably matches: same shape, null-free file
      val dir2 = Files.createTempDirectory("graft-orc-delete-not2").toString
      Seq((1L, 1.0), (2L, 2.0)).toDF("id", "v").coalesce(1)
        .write.format("graft-orc")
        .option("graft.manifest", "true").mode("append").save(dir2)
      spark.sql(s"CREATE TABLE g_del_not2 USING `graft-orc` LOCATION '$dir2'")
      try {
        spark.sql("DELETE FROM g_del_not2 WHERE v <> 5")
        assert(spark.sql("SELECT count(*) FROM g_del_not2")
          .collect().head.getLong(0) === 0L)
      } finally spark.sql("DROP TABLE IF EXISTS g_del_not2")
    } finally spark.sql("DROP TABLE IF EXISTS g_del_not")
  }

  test("canDeleteWhere on a multi-path relation refuses (row-level " +
    "fallback) instead of aborting the optimizer") {
    import org.apache.spark.sql.sources.{EqualTo, Filter}
    val t = new graft.sources.v2.GraftOrcTable(
      new org.apache.spark.sql.types.StructType()
        .add("id", org.apache.spark.sql.types.LongType),
      Map("path" -> "/tmp/a", "location" -> "/tmp/b"))
    assert(!t.canDeleteWhere(Array[Filter](EqualTo("id", 1L))))
  }

  test("DELETE FROM a directory (non-manifest) table is refused with a " +
    "typed error") {
    val dir = Files.createTempDirectory("graft-orc-delete-dir").toString
    Tables.nation(spark, TestSpark.sf0001)
      .write.format("graft-orc").partitionBy("n_regionkey")
      .mode("append").save(dir)
    spark.sql(s"CREATE TABLE g_del_plain USING `graft-orc` LOCATION '$dir'")
    try {
      val e = intercept[Throwable] {
        spark.sql("DELETE FROM g_del_plain WHERE n_regionkey = 0")
      }
      assert(Option(e.getMessage).exists(m =>
        m.toLowerCase.contains("delete")), s"got: $e")
      assert(spark.sql("SELECT count(*) FROM g_del_plain").collect()
        .head.getLong(0) === Tables.nation(spark, TestSpark.sf0001).count())
    } finally spark.sql("DROP TABLE IF EXISTS g_del_plain")
  }
}
