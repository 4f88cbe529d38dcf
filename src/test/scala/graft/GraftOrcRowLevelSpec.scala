package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.v2.GraftOrcManifest

/** Group-based (copy-on-write) UPDATE and MERGE INTO on manifest tables:
  * Spark's row-level rewrite reads the affected rows through the
  * operation's scan and the commit swaps exactly the scanned files for
  * the rewrite's output in one atomic snapshot.
  */
class GraftOrcRowLevelSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def manifestSeq(dir: String): Long = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    GraftOrcManifest.readSnapshot(fs, p).get.seq
  }

  test("UPDATE rewrites matching rows; results and counts are exact") {
    val dir = Files.createTempDirectory("graft-rlo-update").toString
    val nation = Tables.nation(spark, TestSpark.sf0001)
    nation.write.format("graft-orc").option("graft.manifest", "true")
      .mode("append").save(dir)                                   // snap 1
    val n = nation.count()
    spark.sql(s"CREATE TABLE g_rlo_nation USING `graft-orc` LOCATION '$dir'")
    try {
      spark.sql(
        "UPDATE g_rlo_nation SET n_name = 'UPDATED' WHERE n_regionkey = 2")
      val updated = spark.sql(
        "SELECT count(*) FROM g_rlo_nation WHERE n_name = 'UPDATED'")
        .collect().head.getLong(0)
      assert(updated ===
        nation.filter("n_regionkey = 2").count(), "exactly region 2 updated")
      assert(spark.sql("SELECT count(*) FROM g_rlo_nation")
        .collect().head.getLong(0) === n, "UPDATE must not change row count")
      assert(spark.sql(
        "SELECT count(*) FROM g_rlo_nation WHERE n_regionkey <> 2 AND " +
          "n_name = 'UPDATED'").collect().head.getLong(0) === 0L)
      // one atomic snapshot commit; the pre-update state stays readable
      assert(manifestSeq(dir) === 2L)
      assert(spark.read.format("graft-orc")
        .option("graft.snapshot_id", "1").load(dir)
        .filter("n_name = 'UPDATED'").count() === 0L)
    } finally spark.sql("DROP TABLE IF EXISTS g_rlo_nation")
  }

  test("UPDATE on a declared-partitioned table preserves the hive layout " +
    "and can move rows across partitions") {
    val dir = Files.createTempDirectory("graft-rlo-part").toString
    val nation = Tables.nation(spark, TestSpark.sf0001)
    spark.sql(
      s"""CREATE TABLE g_rlo_part (n_nationkey BIGINT, n_name STRING,
         |  n_regionkey BIGINT)
         |USING `graft-orc` PARTITIONED BY (n_regionkey)
         |LOCATION '$dir'""".stripMargin)
    try {
      nation.select("n_nationkey", "n_name", "n_regionkey")
        .write.format("graft-orc").option("graft.manifest", "true")
        .mode("append").insertInto("g_rlo_part")
      val n = nation.count()
      // move every region-4 row into region 9 (a partition that did not
      // exist): the rewrite must re-split by partition value
      spark.sql("UPDATE g_rlo_part SET n_regionkey = 9 WHERE n_regionkey = 4")
      assert(spark.sql("SELECT count(*) FROM g_rlo_part")
        .collect().head.getLong(0) === n)
      assert(spark.sql(
        "SELECT count(*) FROM g_rlo_part WHERE n_regionkey = 4")
        .collect().head.getLong(0) === 0L)
      assert(spark.sql(
        "SELECT count(*) FROM g_rlo_part WHERE n_regionkey = 9")
        .collect().head.getLong(0) ===
        nation.filter("n_regionkey = 4").count())
      // the moved rows physically live under the new hive directory
      val p = new org.apache.hadoop.fs.Path(dir)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val snap = GraftOrcManifest.readSnapshot(fs, p).get
      assert(snap.entries.exists(_.path.contains("n_regionkey=9")),
        snap.entries.map(_.path).mkString("\n"))
    } finally spark.sql("DROP TABLE IF EXISTS g_rlo_part")
  }

  test("MERGE INTO: matched rows update, unmatched rows insert, one " +
    "atomic commit") {
    val dir = Files.createTempDirectory("graft-rlo-merge").toString
    val spark2 = spark
    import spark2.implicits._
    Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("id", "s", "v")
      .coalesce(1).write.format("graft-orc")
      .option("graft.manifest", "true").mode("append").save(dir)  // snap 1
    spark.sql(s"CREATE TABLE g_rlo_merge USING `graft-orc` LOCATION '$dir'")
    try {
      Seq((2L, "B", 200.0), (4L, "d", 40.0)).toDF("id", "s", "v")
        .createOrReplaceTempView("g_rlo_source")
      spark.sql(
        """MERGE INTO g_rlo_merge t USING g_rlo_source s ON t.id = s.id
          |WHEN MATCHED THEN UPDATE SET t.s = s.s, t.v = s.v
          |WHEN NOT MATCHED THEN INSERT (id, s, v) VALUES (s.id, s.s, s.v)
          |""".stripMargin)
      val got = spark.sql("SELECT id, s, v FROM g_rlo_merge ORDER BY id")
        .as[(Long, String, Double)].collect().toSeq
      assert(got === Seq((1L, "a", 10.0), (2L, "B", 200.0),
        (3L, "c", 30.0), (4L, "d", 40.0)))
      // the whole merge is ONE snapshot commit
      assert(manifestSeq(dir) === 2L)
    } finally {
      spark.sql("DROP TABLE IF EXISTS g_rlo_merge")
      spark.catalog.dropTempView("g_rlo_source")
    }
  }

  test("UPDATE of one row in a multi-row-group file preserves every " +
    "other row (no SARG skipping inside a rewritten group)") {
    // the reader must NOT apply the pushed condition inside a surviving
    // file: a SARG-skipped row group's rows would silently vanish from
    // the rewrite. 30k sorted rows => 3 ORC row groups with disjoint id
    // stats; the condition matches exactly one row in one row group.
    val dir = Files.createTempDirectory("graft-rlo-stripes").toString
    val spark2 = spark
    import spark2.implicits._
    spark.range(30000).toDF("id")
      .withColumn("v", org.apache.spark.sql.functions.col("id") * 2)
      .coalesce(1).sortWithinPartitions("id")
      .write.format("graft-orc")
      .option("graft.manifest", "true").mode("append").save(dir)
    spark.sql(s"CREATE TABLE g_rlo_rg USING `graft-orc` LOCATION '$dir'")
    try {
      spark.sql("UPDATE g_rlo_rg SET v = -1 WHERE id = 25000")
      assert(spark.sql("SELECT count(*) FROM g_rlo_rg")
        .collect().head.getLong(0) === 30000L,
        "rows from non-matching row groups must survive the rewrite")
      assert(spark.sql("SELECT v FROM g_rlo_rg WHERE id = 25000")
        .collect().head.getLong(0) === -1L)
      assert(spark.sql(
        "SELECT count(*) FROM g_rlo_rg WHERE v = 2 * id OR id = 25000")
        .collect().head.getLong(0) === 30000L,
        "every untouched row keeps its value")
    } finally spark.sql("DROP TABLE IF EXISTS g_rlo_rg")
  }

  test("UPDATE with a range predicate keeps sidecar-pruned files' " +
    "identity (group granularity)") {
    val dir = Files.createTempDirectory("graft-rlo-prune").toString
    val spark2 = spark
    import spark2.implicits._
    // 4 files with disjoint id ranges + sidecars
    spark.range(4000).toDF("id")
      .withColumn("v", org.apache.spark.sql.functions.col("id"))
      .repartitionByRange(4, org.apache.spark.sql.functions.col("id"))
      .sortWithinPartitions("id")
      .write.format("graft-orc")
      .option("graft.manifest", "true").mode("append").save(dir)
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val before = GraftOrcManifest.readSnapshot(fs, p).get.entries
      .map(e => e.path -> e.mtime).toMap
    assert(before.size === 4)
    spark.sql(s"CREATE TABLE g_rlo_prune USING `graft-orc` LOCATION '$dir'")
    try {
      spark.sql("UPDATE g_rlo_prune SET v = -1 WHERE id < 100")
      val after = GraftOrcManifest.readSnapshot(fs, p).get.entries
        .map(e => e.path -> e.mtime).toMap
      // only the one file whose sidecar range covers id<100 was replaced
      val untouched = before.keys.filter(after.contains)
      assert(untouched.size === 3,
        s"expected 3 untouched files, got ${untouched.size}: $after")
      untouched.foreach(k => assert(after(k) === before(k)))
      assert(spark.sql("SELECT count(*) FROM g_rlo_prune WHERE v = -1")
        .collect().head.getLong(0) === 100L)
      assert(spark.sql("SELECT count(*) FROM g_rlo_prune")
        .collect().head.getLong(0) === 4000L)
    } finally spark.sql("DROP TABLE IF EXISTS g_rlo_prune")
  }

  test("UPDATE on a hive-DISCOVERED (undeclared) partitioned manifest " +
    "table is refused loudly, not silently broken") {
    val dir = Files.createTempDirectory("graft-rlo-disc").toString
    Tables.nation(spark, TestSpark.sf0001)
      .write.format("graft-orc").option("graft.manifest", "true")
      .partitionBy("n_regionkey").mode("append").save(dir)
    spark.sql(s"CREATE TABLE g_rlo_disc USING `graft-orc` LOCATION '$dir'")
    try {
      val e = intercept[Throwable] {
        spark.sql("UPDATE g_rlo_disc SET n_name = 'X' WHERE n_nationkey = 1")
      }
      def chain(t: Throwable): Seq[Throwable] =
        t +: Option(t.getCause).toSeq.flatMap(chain)
      assert(chain(e).exists(c => Option(c.getMessage)
        .exists(_.contains("PARTITIONED BY"))), s"got: $e")
    } finally spark.sql("DROP TABLE IF EXISTS g_rlo_disc")
  }
}
