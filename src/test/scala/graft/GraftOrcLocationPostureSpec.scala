package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.AnalysisException

/** Spec-pins the CHECK-constraint / column-DEFAULT posture on
  * SESSION-CATALOG `LOCATION` tables (`CREATE TABLE ... USING graft-orc
  * LOCATION ...`). Both surfaces are catalog-routed features
  * (GraftOrcCatalog advertises the capabilities and persists the state
  * in the manifest); on a session-catalog table the DDL routes to the
  * metastore and TBLPROPERTIES travel as table OPTIONS. The posture to
  * pin (so no user gets SILENCE):
  *  - ALTER ... ADD CONSTRAINT          -> LOUD Spark refusal
  *    (V2SessionCatalog has no constraint support: TABLE_OPERATION)
  *  - ALTER ... ADD COLUMN ... DEFAULT  -> LOUD Spark refusal
  *    (graft-orc is not in spark.sql.defaultColumn.allowedProviders's
  *    v1-session allow-list: DEFAULT_UNSUPPORTED)
  *  - CREATE-time CONSTRAINT ... CHECK  -> LOUD Spark refusal (same
  *    TABLE_OPERATION check fires before the table is created)
  *  - CREATE-time column DEFAULT        -> WORKS: Spark stores the
  *    CURRENT default in the metastore schema and fills omitted
  *    INSERTs itself; the column exists in every data file from day
  *    one, so the manifest's EXISTS-default machinery is never needed
  *  - hand-set graft.constraint.* via SET TBLPROPERTIES -> ENFORCED on
  *    every later write (the props-as-options route reaches
  *    GraftOrcTable.constraints()); unlike the catalog's ADD
  *    CONSTRAINT there is NO existing-row validation scan — on the
  *    path surface the props are raw table state, and validating
  *    already-written rows is the operator's responsibility (the same
  *    trust level as any direct metadata edit). The catalog refuses
  *    hand-set exactly because it CAN offer the validated path.
  */
class GraftOrcLocationPostureSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def tmpDir(): String =
    Files.createTempDirectory("graft-loc-posture").toString

  test("ALTER TABLE ADD CONSTRAINT on a session-catalog LOCATION table " +
    "is refused loudly (never silently dropped)") {
    val t = "loc_ck_alter"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"CREATE TABLE $t (id BIGINT, qty INT) USING `graft-orc` " +
      s"LOCATION '${tmpDir()}/t'")
    try {
      spark.sql(s"INSERT INTO $t VALUES (1, 5)")
      val e = intercept[AnalysisException] {
        spark.sql(s"ALTER TABLE $t ADD CONSTRAINT ck CHECK (qty > 0)")
      }
      assert(e.getMessage.contains("does not support table constraint"),
        e.getMessage)
      // and nothing was half-registered: violating inserts still land
      spark.sql(s"INSERT INTO $t VALUES (2, -1)")
      assert(spark.table(t).count() === 2L)
    } finally spark.sql(s"DROP TABLE IF EXISTS $t")
  }

  test("ALTER TABLE ADD COLUMN ... DEFAULT on a session-catalog " +
    "LOCATION table is refused loudly") {
    val t = "loc_dflt_alter"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"CREATE TABLE $t (id BIGINT) USING `graft-orc` " +
      s"LOCATION '${tmpDir()}/t'")
    try {
      spark.sql(s"INSERT INTO $t VALUES (1)")
      val e = intercept[AnalysisException] {
        spark.sql(s"ALTER TABLE $t ADD COLUMN flag STRING DEFAULT 'x'")
      }
      assert(e.getMessage.contains("DEFAULT values are not supported") ||
        e.getMessage.contains("DEFAULT_UNSUPPORTED"), e.getMessage)
    } finally spark.sql(s"DROP TABLE IF EXISTS $t")
  }

  test("CREATE-time CHECK constraint on a session-catalog LOCATION " +
    "table is refused loudly") {
    val t = "loc_ck_create"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    val e = intercept[AnalysisException] {
      spark.sql(s"CREATE TABLE $t (id BIGINT, qty INT, " +
        s"CONSTRAINT ck CHECK (qty > 0)) USING `graft-orc` " +
        s"LOCATION '${tmpDir()}/t'")
    }
    assert(e.getMessage.contains("does not support table constraint"),
      e.getMessage)
  }

  test("CREATE-time column DEFAULT on a session-catalog LOCATION table " +
    "WORKS: omitted inserts fill, explicit values win") {
    val t = "loc_dflt_create"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"CREATE TABLE $t (id BIGINT, qty INT DEFAULT 3) " +
      s"USING `graft-orc` LOCATION '${tmpDir()}/t'")
    try {
      spark.sql(s"INSERT INTO $t (id) VALUES (1)")
      spark.sql(s"INSERT INTO $t VALUES (2, 7)")
      val rows = spark.table(t).orderBy("id").collect()
        .map(r => (r.getLong(0), r.getInt(1))).toSeq
      assert(rows === Seq(1L -> 3, 2L -> 7))
    } finally spark.sql(s"DROP TABLE IF EXISTS $t")
  }

  test("hand-set graft.constraint.* TBLPROPERTIES on a LOCATION table " +
    "ARE enforced on later writes (no retro-validation of existing rows)") {
    val t = "loc_ck_props"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"CREATE TABLE $t (id BIGINT, qty INT) USING `graft-orc` " +
      s"LOCATION '${tmpDir()}/t'")
    try {
      // an already-bad row predates the property: it is NOT retro-scanned
      spark.sql(s"INSERT INTO $t VALUES (1, -99)")
      spark.sql(s"ALTER TABLE $t SET TBLPROPERTIES(" +
        "'graft.constraint.ck'='qty > 0')")
      // ...but every write AFTER the property lands is gated
      val e = intercept[Exception] {
        spark.sql(s"INSERT INTO $t VALUES (2, -1)")
      }
      assert(e.getMessage.contains("CHECK_CONSTRAINT_VIOLATION") ||
        e.getMessage.contains("violated"), e.getMessage)
      spark.sql(s"INSERT INTO $t VALUES (3, 5)")
      val rows = spark.table(t).orderBy("id").collect()
        .map(_.getLong(0)).toSeq
      assert(rows === Seq(1L, 3L))
    } finally spark.sql(s"DROP TABLE IF EXISTS $t")
  }
}
