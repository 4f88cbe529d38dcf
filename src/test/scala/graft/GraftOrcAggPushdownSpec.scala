package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Footer-statistics aggregate pushdown: filterless global MIN/MAX/COUNT
  * answered from ORC footers (GraftOrcAggScan), verified against the same
  * aggregates computed the slow way.
  */
class GraftOrcAggPushdownSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft-agg-orc").toString
    // two files so the final merge over per-file partials is exercised
    graft.sources.OrcTables.write(
      Tables.lineitem(spark, TestSpark.sf0001).repartition(2), d)
    d
  }

  private def pushed(dir: String) = spark.read.format("graft-orc")
    .option("orc.aggregate_pushdown", "true").load(dir)

  // string match: AQE wraps the subtree in a leaf AdaptiveSparkPlanExec,
  // which defeats a pattern-match collect but not toString
  private def aggScans(q: DataFrame): Int =
    "GraftOrcAggScan".r
      .findAllIn(q.queryExecution.executedPlan.toString).size

  test("count(*) is answered from footers and matches the full scan") {
    val q = pushed(dir).agg(count(lit(1)).as("n"))
    assert(aggScans(q) === 1, q.queryExecution.executedPlan.toString)
    assert(q.as[Long].collect().head ===
      spark.read.format("graft-orc").load(dir).count())
  }

  test("footer-agg partitions chunk by count at high file counts; " +
    "result stays exact") {
    val d = Files.createTempDirectory("graft-agg-chunk").toString
    (0 until 40).foreach { i =>
      spark.range(i * 5, (i + 1) * 5).select($"id")
        .coalesce(1).write.format("graft-orc").mode("append").save(d)
    }
    val q = pushed(d).agg(count(lit(1)).as("n"), max($"id").as("m"))
    assert(aggScans(q) === 1, q.queryExecution.executedPlan.toString)
    val row = q.collect().head
    assert(row.getLong(0) === 200L && row.getLong(1) === 199L)
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def scans(pl: SparkPlan): Seq[BatchScanExec] = pl match {
      case b: BatchScanExec => Seq(b)
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case s: QueryStageExec => scans(s.plan)
      case other => other.children.flatMap(scans)
    }
    val parts = scans(q.queryExecution.executedPlan)
      .head.inputRDD.getNumPartitions
    assert(parts < 40 && parts > 1,
      s"40 footer-agg files should chunk into (1, 40) tasks, got $parts")
  }

  test("min/max on integral columns match the full scan") {
    val q = pushed(dir).agg(
      min($"l_orderkey").as("a"), max($"l_orderkey").as("b"),
      min($"l_linenumber").as("e"), max($"l_linenumber").as("f"),
      count($"l_tax").as("g"))
    assert(aggScans(q) === 1, q.queryExecution.executedPlan.toString)
    val slow = spark.read.format("graft-orc").load(dir).agg(
      min($"l_orderkey"), max($"l_orderkey"),
      min($"l_linenumber"), max($"l_linenumber"),
      count($"l_tax"))
    assert(q.collect().head === slow.collect().head)
  }

  test("string and date MIN/MAX are refused (shared-util parity)") {
    // AggregatePushDownUtils limits min/max to numeric footer stats
    // (string stats truncate; ORC date stats are not mapped) — the graft
    // connector inherits the gate, matching the built-in source exactly
    assert(aggScans(pushed(dir).agg(min($"l_returnflag").as("m"))) === 0)
    assert(aggScans(pushed(dir).agg(min($"l_shipdate").as("m"))) === 0)
  }

  test("float/double MIN/MAX is refused (NaN-unsafe footer stats)") {
    val q = pushed(dir).agg(min($"l_extendedprice").as("m"))
    assert(aggScans(q) === 0)
    // still correct through the normal scan
    assert(q.collect().head.getDouble(0) ===
      Tables.lineitem(spark, TestSpark.sf0001)
        .agg(min($"l_extendedprice")).collect().head.getDouble(0))
  }

  test("a filter keeps the aggregate off the footer path") {
    val q = pushed(dir).filter($"l_quantity" > 10).agg(count(lit(1)).as("n"))
    assert(aggScans(q) === 0)
  }

  test("grouped aggregates on DATA columns are refused") {
    // l_returnflag is a data column here (unpartitioned table): grouped
    // footer stats don't exist, the full scan must run
    val q = pushed(dir).groupBy($"l_returnflag").agg(count(lit(1)).as("n"))
    assert(aggScans(q) === 0)
  }

  test("GROUP BY partition columns answers from metadata — footers on a " +
    "directory table, sidecars at ZERO footer opens on a manifest table") {
    import graft.sources.v2.GraftOrcDataSource
    val li = Tables.lineitem(spark, TestSpark.sf0001)
    val slow = li.groupBy($"l_returnflag")
      .agg(count(lit(1)).as("n"), min($"l_orderkey").as("mn"),
        max($"l_linenumber").as("mx"))
      .orderBy($"l_returnflag").collect()

    // directory table: one partial row per (file, its partition value)
    val pdir = Files.createTempDirectory("graft-agg-part").toString
    li.write.format("graft-orc").partitionBy("l_returnflag")
      .mode("append").save(pdir)
    val q = pushed(pdir).groupBy($"l_returnflag")
      .agg(count(lit(1)).as("n"), min($"l_orderkey").as("mn"),
        max($"l_linenumber").as("mx"))
      .orderBy($"l_returnflag")
    assert(aggScans(q) === 1, q.queryExecution.executedPlan.toString)
    assert(q.collect().map(_.toSeq).toSeq === slow.map(_.toSeq).toSeq)

    // manifest table: the same grouped aggregate with zero footer opens
    val mdir = Files.createTempDirectory("graft-agg-part-mani").toString
    li.write.format("graft-orc").partitionBy("l_returnflag")
      .option("graft.manifest", "true").mode("append").save(mdir)
    GraftOrcDataSource.planFooterReads.clear()
    GraftOrcDataSource.recordPlanFooterReads = true
    try {
      val qm = pushed(mdir).groupBy($"l_returnflag")
        .agg(count(lit(1)).as("n"), min($"l_orderkey").as("mn"),
          max($"l_linenumber").as("mx"))
        .orderBy($"l_returnflag")
      assert(aggScans(qm) === 1, qm.queryExecution.executedPlan.toString)
      assert(qm.collect().map(_.toSeq).toSeq === slow.map(_.toSeq).toSeq)
      import scala.jdk.CollectionConverters._
      val opened = GraftOrcDataSource.planFooterReads.asScala
        .filter(_.contains(mdir))
      assert(opened.isEmpty,
        s"grouped sidecar pushdown opened footers: $opened")
    } finally {
      GraftOrcDataSource.recordPlanFooterReads = false
      GraftOrcDataSource.planFooterReads.clear()
    }
  }

  test("property: pushed and unpushed results agree for every eligible column") {
    // equivalence sweep across the whole schema: COUNT(c) for all columns,
    // MIN/MAX for the integral ones — footer stats must agree with the
    // scan on every one (nullability, type mapping, multi-file merge)
    val full = spark.read.format("graft-orc").load(dir)
    val integral = full.schema.fields.filter(f =>
      f.dataType == org.apache.spark.sql.types.LongType ||
        f.dataType == org.apache.spark.sql.types.IntegerType)
    for (f <- full.schema.fields) {
      val fast = pushed(dir).agg(count(col(f.name)).as("v"))
      assert(aggScans(fast) === 1, s"count(${f.name}) not pushed")
      assert(fast.collect().head ===
        full.agg(count(col(f.name))).collect().head, s"count(${f.name})")
    }
    val minMax: Seq[org.apache.spark.sql.Column => org.apache.spark.sql.Column] =
      Seq(min(_), max(_))
    for (f <- integral; fn <- minMax) {
      val fast = pushed(dir).agg(fn(col(f.name)).as("v"))
      assert(aggScans(fast) === 1, s"min/max(${f.name}) not pushed")
      assert(fast.collect().head ===
        full.agg(fn(col(f.name))).collect().head, s"min/max(${f.name})")
    }
  }

  test("pushdown is off by default, matching the built-in source gate") {
    val q = spark.read.format("graft-orc").load(dir).agg(count(lit(1)).as("n"))
    assert(aggScans(q) === 0)
  }

  test("manifest tables answer pushed aggregates from stat sidecars with " +
    "ZERO footer opens, byte-identical to the footer kernel") {
    import graft.sources.v2.GraftOrcDataSource
    val mdir = Files.createTempDirectory("graft-agg-manifest").toString
    // same rows as `dir`, but committed through the manifest writer so
    // every entry carries its footer-stat sidecar
    spark.read.format("graft-orc").load(dir)
      .write.format("graft-orc").option("graft.manifest", "true")
      .mode("overwrite").save(mdir)

    val full = spark.read.format("graft-orc").load(dir)
    val integral = full.schema.fields.filter(f =>
      f.dataType == org.apache.spark.sql.types.LongType ||
        f.dataType == org.apache.spark.sql.types.IntegerType)
    GraftOrcDataSource.planFooterReads.clear()
    GraftOrcDataSource.recordPlanFooterReads = true
    try {
      // the full eligible surface: count(*), count(c) for every column,
      // min/max for the integral ones — sidecar answers must equal the
      // directory table's footer-kernel answers exactly
      val star = pushed(mdir).agg(count(lit(1)).as("n"))
      assert(aggScans(star) === 1)
      assert(star.collect().head === pushed(dir).agg(count(lit(1)).as("n"))
        .collect().head)
      for (f <- full.schema.fields) {
        val fast = pushed(mdir).agg(count(col(f.name)).as("v"))
        assert(aggScans(fast) === 1, s"count(${f.name}) not pushed")
        assert(fast.collect().head ===
          pushed(dir).agg(count(col(f.name)).as("v")).collect().head,
          s"count(${f.name}) sidecar != footer")
      }
      val minMax: Seq[org.apache.spark.sql.Column => org.apache.spark.sql.Column] =
        Seq(min(_), max(_))
      for (f <- integral; fn <- minMax) {
        val fast = pushed(mdir).agg(fn(col(f.name)).as("v"))
        assert(aggScans(fast) === 1, s"min/max(${f.name}) not pushed")
        assert(fast.collect().head ===
          pushed(dir).agg(fn(col(f.name)).as("v")).collect().head,
          s"min/max(${f.name}) sidecar != footer")
      }
      import scala.jdk.CollectionConverters._
      val opened = GraftOrcDataSource.planFooterReads.asScala
        .filter(_.contains(mdir))
      assert(opened.isEmpty,
        s"manifest agg pushdown opened footers: $opened")
    } finally {
      GraftOrcDataSource.recordPlanFooterReads = false
      GraftOrcDataSource.planFooterReads.clear()
    }
  }
}
