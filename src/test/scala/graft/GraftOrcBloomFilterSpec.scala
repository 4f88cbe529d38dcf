package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** ORC bloom filters through the graft writer: `orc.bloom.filter.columns`
  * (any `orc.*` option reaches the ORC writer conf — and, round 18, any
  * `orc.*` TBLPROPERTIES rides into catalog writes as a default). The
  * payoff is SARG row-group skipping on columns whose VALUES are spread
  * across the file: a point lookup on a randomly-ordered key column
  * finds every row group's [min,max] spanning the whole domain — stats
  * alone skip nothing — while a bloom filter proves most groups cannot
  * contain the key, so only the matching groups decode.
  */
class GraftOrcBloomFilterSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // 200k rows, one file, default 10k row-index stride = 20 row groups;
  // k is a permutation of 0..n-1 (48271 coprime to 200000), so every
  // group's k range spans ~the whole domain
  private val n = 200000L
  private def payload = spark.range(n)
    .select(((col("id") * 48271L) % n).as("k"), col("id").as("v"))

  /** Rows the scan DECODED (post-SARG row-group skipping), via the
    * BatchScan node's numOutputRows after execution.
    */
  private def decodedRows(df: org.apache.spark.sql.DataFrame): Long = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    df.collect()
    def findScan(p: SparkPlan): Option[BatchScanExec] = p match {
      case b: BatchScanExec => Some(b)
      case a: AdaptiveSparkPlanExec => findScan(a.executedPlan)
      case q: QueryStageExec => findScan(q.plan)
      case other => other.children.iterator.flatMap(findScan).nextOption()
    }
    findScan(df.queryExecution.executedPlan).get
      .metrics("numOutputRows").value
  }

  test("orc.bloom.filter.columns write option: a point lookup on a " +
    "randomly-ordered key decodes only the matching row groups; " +
    "without the bloom every group decodes") {
    val plain = Files.createTempDirectory("graft-bloom-plain").toString
    payload.coalesce(1).write.format("graft-orc")
      .mode("overwrite").save(plain)
    val bloomed = Files.createTempDirectory("graft-bloom-on").toString
    payload.coalesce(1).write.format("graft-orc")
      .option("orc.bloom.filter.columns", "k")
      .mode("overwrite").save(bloomed)
    def lookup(dir: String) = spark.read.format("graft-orc").load(dir)
      .filter(col("k") === 123456L)
    // same answer either way
    assert(lookup(plain).as[(Long, Long)].collect().toSeq ===
      lookup(bloomed).as[(Long, Long)].collect().toSeq)
    val plainRows = decodedRows(lookup(plain))
    val bloomRows = decodedRows(lookup(bloomed))
    // stats alone can't skip (every group spans the domain): all 20
    // groups decode; the bloom proves absence for ~19 of them
    assert(plainRows >= n / 2,
      s"expected the statless lookup to decode most groups, got $plainRows")
    assert(bloomRows <= 2L * 10000L,
      s"expected the bloom to skip to <=2 row groups, got $bloomRows")
  }

  test("orc.* TBLPROPERTIES are writer defaults for catalog tables: " +
    "INSERT and the MoR delta MERGE both produce bloom-bearing files") {
    val wh = Files.createTempDirectory("graft-bloom-wh").toString
    val cat = "gblm" + java.util.UUID.randomUUID().toString
      .replace("-", "").take(6)
    spark.conf.set(s"spark.sql.catalog.$cat",
      "graft.sources.v2.GraftOrcCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.default")
    val t = s"$cat.default.t"
    spark.sql(s"CREATE TABLE $t (k BIGINT, v BIGINT) " +
      "TBLPROPERTIES('graft.merge_mode'='mor', " +
      "'orc.bloom.filter.columns'='k')")
    payload.coalesce(1).createOrReplaceTempView("bloom_src")
    spark.sql(s"INSERT INTO $t SELECT * FROM bloom_src")
    def lookup(kv: Long) = spark.table(t).filter(col("k") === kv)
    assert(lookup(123456L).count() === 1L)
    val insertRows = decodedRows(lookup(123456L))
    assert(insertRows <= 2L * 10000L,
      s"INSERT under orc.* TBLPROPERTIES wrote no blooms: $insertRows")
    // true delta MERGE (matched UPDATE forces the MoR position-delta
    // path): its insert files carry the bloom too. The updated rows all
    // live in ONE fresh file; looking one of them up decodes at most
    // that file's groups plus the matching original group.
    spark.range(500).select((col("id") + n).as("k"), col("id").as("v"))
      .unionByName(spark.range(100).select(
        ((col("id") * 48271L) % n).as("k"), lit(-1L).as("v")))
      .coalesce(1).createOrReplaceTempView("bloom_delta")
    spark.sql(s"MERGE INTO $t t USING bloom_delta b ON t.k = b.k " +
      "WHEN MATCHED THEN UPDATE SET v = b.v " +
      "WHEN NOT MATCHED THEN INSERT (k, v) VALUES (b.k, b.v)")
    assert(lookup(n + 250L).count() === 1L)
    val deltaRows = decodedRows(lookup(n + 250L))
    assert(deltaRows <= 2L * 10000L + 600L,
      s"delta MERGE under orc.* TBLPROPERTIES wrote no blooms: $deltaRows")
    spark.sql(s"DROP TABLE $t")
  }
}
