package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** Enforced CHECK constraints (Spark 4's SUPPORT_TABLE_CONSTRAINT):
  * `ALTER TABLE ... ADD CONSTRAINT ck CHECK (...)` persists the
  * predicate as table state after VALIDATING existing rows; from then
  * on Spark's write analysis rejects any INSERT/UPDATE/MERGE row that
  * violates it — the data-quality gate lives in the table, not in each
  * pipeline job.
  */
class GraftOrcConstraintSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private lazy val wh: String = {
    val dir = Files.createTempDirectory("graft-ck-wh").toString
    spark.conf.set("spark.sql.catalog.gck",
      "graft.sources.v2.GraftOrcCatalog")
    spark.conf.set("spark.sql.catalog.gck.warehouse", dir)
    dir
  }

  test("ADD CONSTRAINT validates existing rows, then gates every later " +
    "INSERT; DROP CONSTRAINT lifts the gate") {
    wh
    val t = "gck.c1"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"CREATE TABLE $t (id BIGINT, bal DOUBLE)")
    spark.sql(s"INSERT INTO $t VALUES (1, 10.0), (2, 0.5)")
    try {
      spark.sql(s"ALTER TABLE $t ADD CONSTRAINT pos CHECK (bal >= 0)")
      // clean insert passes
      spark.sql(s"INSERT INTO $t VALUES (3, 1.0)")
      // violating insert fails the STATEMENT (no partial write)
      val e = intercept[Exception] {
        spark.sql(s"INSERT INTO $t VALUES (4, -1.0)")
      }
      assert(e.getMessage != null)
      assert(spark.sql(s"SELECT count(*) FROM $t")
        .collect()(0).getLong(0) === 3L)
      // DESCRIBE-style visibility: the table reports its constraint
      spark.sql(s"DROP TABLE IF EXISTS gck_probe")
      spark.sql(s"ALTER TABLE $t DROP CONSTRAINT pos")
      spark.sql(s"INSERT INTO $t VALUES (4, -1.0)")
      assert(spark.sql(s"SELECT count(*) FROM $t")
        .collect()(0).getLong(0) === 4L)
    } finally spark.sql(s"DROP TABLE IF EXISTS $t")
  }

  test("ADD CONSTRAINT refuses when existing data violates it, with a " +
    "witness; NULL predicate results count as violations") {
    wh
    val t = "gck.c2"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"CREATE TABLE $t (id BIGINT, bal DOUBLE)")
    spark.sql(s"INSERT INTO $t VALUES (1, 10.0), (2, -3.0)")
    try {
      val e = intercept[Exception] {
        spark.sql(s"ALTER TABLE $t ADD CONSTRAINT pos CHECK (bal >= 0)")
      }
      assert(e.getMessage.contains("NEW_CHECK_CONSTRAINT_VIOLATION") ||
        e.getMessage.contains("violated"), e.getMessage)
      // the refused add left no constraint behind
      spark.sql(s"INSERT INTO $t VALUES (3, -1.0)")
      assert(spark.sql(s"SELECT count(*) FROM $t")
        .collect()(0).getLong(0) === 3L)
    } finally spark.sql(s"DROP TABLE IF EXISTS $t")
  }

  test("constraints gate UPDATE and MERGE too") {
    wh
    val t = "gck.c3"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"CREATE TABLE $t (id BIGINT, bal DOUBLE)")
    spark.sql(s"INSERT INTO $t VALUES (1, 10.0), (2, 5.0)")
    try {
      spark.sql(s"ALTER TABLE $t ADD CONSTRAINT pos CHECK (bal >= 0)")
      intercept[Exception] {
        spark.sql(s"UPDATE $t SET bal = -1 WHERE id = 1")
      }
      intercept[Exception] {
        spark.sql(
          s"""MERGE INTO $t t USING (SELECT 2 AS id, -9.0 AS bal) s
             |ON t.id = s.id
             |WHEN MATCHED THEN UPDATE SET *""".stripMargin)
      }
      // state unchanged after both refusals
      assert(spark.sql(s"SELECT sum(bal) FROM $t")
        .collect()(0).getDouble(0) === 15.0)
      // a VALID update still passes
      spark.sql(s"UPDATE $t SET bal = 20.0 WHERE id = 1")
      assert(spark.sql(s"SELECT sum(bal) FROM $t")
        .collect()(0).getDouble(0) === 25.0)
    } finally spark.sql(s"DROP TABLE IF EXISTS $t")
  }

  test("constraints gate BRANCH writes too (the WAP stage cannot " +
    "smuggle junk past the table's own contract)") {
    wh
    val t = "gck.c5"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"CREATE TABLE $t (id BIGINT, bal DOUBLE)")
    spark.sql(s"INSERT INTO $t VALUES (1, 10.0)")
    try {
      spark.sql(s"ALTER TABLE $t ADD CONSTRAINT pos CHECK (bal >= 0)")
      graft.sources.v2.GraftOrcManifest.createBranch(
        new org.apache.hadoop.fs.Path(s"$wh/c5").getFileSystem(
          spark.sparkContext.hadoopConfiguration),
        new org.apache.hadoop.fs.Path(s"$wh/c5"), "stage")
      intercept[Exception] {
        spark.sql(s"INSERT INTO $t.branch_stage VALUES (2, -5.0)")
      }
      spark.sql(s"INSERT INTO $t.branch_stage VALUES (3, 5.0)")
      assert(spark.sql(s"SELECT count(*) FROM $t.branch_stage")
        .collect()(0).getLong(0) === 2L)
    } finally spark.sql(s"DROP TABLE IF EXISTS $t")
  }

  test("CREATE-time CHECK constraint is persisted and enforced (the " +
    "TableInfo createTable overload must not drop it)") {
    wh
    val t = "gck.c6"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"CREATE TABLE $t (id BIGINT, qty INT, " +
      "CONSTRAINT ck_qty CHECK (qty > 0))")
    try {
      // the junk batch is refused by the create-time gate...
      intercept[Exception] {
        spark.sql(s"INSERT INTO $t VALUES (1, -4)")
      }
      // ...the clean batch lands
      spark.sql(s"INSERT INTO $t VALUES (2, 4)")
      assert(spark.sql(s"SELECT count(*) FROM $t")
        .collect()(0).getLong(0) === 1L)
      // persisted as the same prop the ALTER path writes -> visible on
      // a fresh load and droppable by name
      val props = spark.sql(s"SHOW TBLPROPERTIES $t").collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
      assert(props.get("graft.constraint.ck_qty").contains("qty > 0"),
        props.toString)
      spark.sql(s"ALTER TABLE $t DROP CONSTRAINT ck_qty")
      spark.sql(s"INSERT INTO $t VALUES (3, -1)")
      assert(spark.sql(s"SELECT count(*) FROM $t")
        .collect()(0).getLong(0) === 2L)
    } finally spark.sql(s"DROP TABLE IF EXISTS $t")
  }

  test("REPLACE TABLE with a CHECK constraint carries it through the " +
    "staged path; the replaced table's old constraint does not survive") {
    wh
    val t = "gck.c7"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"CREATE TABLE $t (id BIGINT, qty INT, " +
      "CONSTRAINT ck_old CHECK (qty < 100))")
    spark.sql(s"INSERT INTO $t VALUES (1, 5)")
    try {
      spark.sql(s"REPLACE TABLE $t (id BIGINT, qty INT, " +
        "CONSTRAINT ck_new CHECK (qty > 0))")
      val props = spark.sql(s"SHOW TBLPROPERTIES $t").collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
      assert(props.get("graft.constraint.ck_new").contains("qty > 0"),
        props.toString)
      assert(!props.contains("graft.constraint.ck_old"), props.toString)
      intercept[Exception] { spark.sql(s"INSERT INTO $t VALUES (2, -1)") }
      spark.sql(s"INSERT INTO $t VALUES (3, 500)") // old gate is gone
      assert(spark.sql(s"SELECT count(*) FROM $t")
        .collect()(0).getLong(0) === 1L)
    } finally spark.sql(s"DROP TABLE IF EXISTS $t")
  }

  test("hand-setting a graft.constraint.* property is refused (it " +
    "would skip existing-row validation)") {
    wh
    val t = "gck.c4"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"CREATE TABLE $t (id BIGINT)")
    try {
      val e = intercept[Exception] {
        spark.sql(s"ALTER TABLE $t SET TBLPROPERTIES(" +
          "'graft.constraint.sneaky'='id > 0')")
      }
      assert(e.getMessage.contains("constraint state"), e.getMessage)
    } finally spark.sql(s"DROP TABLE IF EXISTS $t")
  }
}
