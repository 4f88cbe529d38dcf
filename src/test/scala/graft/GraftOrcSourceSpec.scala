package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.sources.OrcData

/** The graft-orc DSv2 connector must agree with Spark's built-in ORC source
  * on every query shape and honor the reference's pushdown contracts.
  */
class GraftOrcSourceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  lazy val orcPath = OrcData.orcPath(spark, TestSpark.sf0001, "lineitem")
  def v2 = spark.read.format("graft-orc").load(orcPath)
  def builtin = spark.read.orc(orcPath)

  test("full scan equals built-in ORC source") {
    assert(v2.count() === builtin.count())
    val a = v2.orderBy($"l_orderkey", $"l_linenumber").collect()
    val b = builtin.orderBy($"l_orderkey", $"l_linenumber").collect()
    assert(a === b)
  }

  test("projection is pruned to the requested columns (A6)") {
    val q = v2.select($"l_orderkey", $"l_quantity")
    val scan = q.queryExecution.executedPlan.collectLeaves().head.toString
    assert(q.columns.toSeq === Seq("l_orderkey", "l_quantity"))
    assert(q.agg(sum($"l_quantity")).as[Double].collect().head ===
      builtin.agg(sum($"l_quantity")).as[Double].collect().head)
  }

  test("filters push (A8) but remain residual (A9) and results match") {
    val q = v2.filter($"l_returnflag" === "R" && $"l_quantity" > 25)
    val plan = q.queryExecution.executedPlan.toString
    // residual Filter must sit above the scan (inexact contract)
    assert(plan.contains("Filter"), plan.take(800))
    assert(q.count() ===
      builtin.filter($"l_returnflag" === "R" && $"l_quantity" > 25).count())
  }

  test("limit truncates exactly (A7)") {
    assert(v2.limit(17).count() === 17)
    assert(v2.select($"l_orderkey").limit(1).count() === 1)
  }

  test("alltypes fixture reads identically through graft-orc (atomic types)") {
    val p = TestSpark.resource("alltypes.snappy.orc")
    val a = spark.read.format("graft-orc").load(p)
      .orderBy($"int32".asc_nulls_first).collect()
    val b = spark.read.orc(p).orderBy($"int32".asc_nulls_first).collect()
    assert(a === b)
    assert(a.length === 11)
  }

  test("scan reports custom metrics and exact statistics (A3, A12)") {
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    val q = v2.select($"l_orderkey")
    q.collect()
    val scans = q.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b }
    assert(scans.nonEmpty)
    val names = scans.head.scan.supportedCustomMetrics().map(_.name()).toSet
    assert(names === Set("graftBytesScanned", "graftRowsDecoded",
      "graftBatchesProduced", "graftFilesRead"))
    val stats = scans.head.scan
      .asInstanceOf[org.apache.spark.sql.connector.read.SupportsReportStatistics]
      .estimateStatistics()
    assert(stats.numRows().getAsLong === builtin.count())
  }

  test("multi-path load unions files across paths (JSON 'paths' array)") {
    val p2 = java.nio.file.Files.createTempDirectory("graft-mp").toString
    spark.read.orc(orcPath).limit(100).write.mode("overwrite").orc(p2)
    val merged = spark.read.format("graft-orc").load(orcPath, p2)
    assert(merged.count() === builtin.count() + 100)
  }

  test("nested types (map/list) read identically through graft-orc") {
    val p = TestSpark.resource("map_list.snappy.orc")
    val a = spark.read.format("graft-orc").load(p).collect()
    val b = spark.read.orc(p).collect()
    assert(a === b)
    assert(a.head.getAs[Map[String, String]]("m") ===
      Map("zero" -> "0", "one" -> "1"))
  }

  test("stripe-aligned splits: a multi-stripe file fans out to multiple partitions") {
    val hc = spark.sparkContext.hadoopConfiguration
    val dir = java.nio.file.Files.createTempDirectory("graft-stripes").toString
    val old = hc.get("orc.stripe.size")
    try {
      hc.set("orc.stripe.size", "65536") // force many small stripes
      Tables.lineitem(spark, TestSpark.sf0001).coalesce(1)
        .write.mode("overwrite").orc(dir)
    } finally {
      if (old == null) hc.unset("orc.stripe.size") else hc.set("orc.stripe.size", old)
    }
    val v2small = spark.read.format("graft-orc")
      .option("graft.split_size", "65536").load(dir)
    val nParts = v2small.rdd.getNumPartitions
    assert(nParts > 1, s"expected multiple stripe splits, got $nParts")
    // results across splits must equal the built-in source
    val a = v2small.orderBy($"l_orderkey", $"l_linenumber").collect()
    val b = spark.read.orc(dir).orderBy($"l_orderkey", $"l_linenumber").collect()
    assert(a === b)
  }

  test("pushdown off via option still returns correct results") {
    val q = spark.read.format("graft-orc")
      .option("orc.pushdown_predicate", "false").load(orcPath)
      .filter($"l_quantity" > 40)
    assert(q.count() === builtin.filter($"l_quantity" > 40).count())
  }
}
