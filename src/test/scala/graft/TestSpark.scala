package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all suites. */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      // storage-partitioned joins: co-partitioned graft-orc tables join
      // with zero shuffle (GraftOrcScan reports KeyGroupedPartitioning)
      .config("spark.sql.sources.v2.bucketing.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  val sf0001 = "/root/testdata/sf0.001"

  def resource(name: String): String =
    getClass.getClassLoader.getResource(name).getPath

  /** Commit/abort must leave zero staged FILES. The empty `_staging`
    * root itself may remain: deleting it when it looks empty races a
    * concurrent writer's staged-dir mkdirs (see GraftOrcWrite
    * .dropStaging), so the writer keeps it deliberately.
    */
  def stagingClean(dir: String): Boolean = {
    def hasFiles(f: java.io.File): Boolean = Option(f.listFiles())
      .exists(_.exists(c => c.isFile || hasFiles(c)))
    val root = new java.io.File(dir, "_staging")
    !root.exists() || !hasFiles(root)
  }
}
