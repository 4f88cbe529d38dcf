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
}
