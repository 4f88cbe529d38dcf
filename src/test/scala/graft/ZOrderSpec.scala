package graft

import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ZOrder

/** Z-order layout: Morton z-values interleave correctly, and a z-ordered
  * ORC table prunes stripes on EVERY interleaved column where a
  * single-column sort prunes on one.
  */
class ZOrderSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("zvalue interleaves bits (Morton order on a 4x4 grid)") {
    val df = Seq((0L, 0L), (3L, 0L), (0L, 3L), (3L, 3L), (1L, 2L))
      .toDF("x", "y")
    val z = df.select(ZOrder.zvalue(Seq(col("x"), col("y")),
      Seq(0.0, 0.0), Seq(3.0, 3.0), bits = 2).as("z"))
      .as[Long].collect().toSeq
    // x occupies even bit positions, y odd: z(x,y) = interleave(x, y)
    // x=3 (11) -> bits 0,2 = 5; y=3 -> bits 1,3 = 10; (1,2) -> 1 + 8 = 9
    assert(z === Seq(0L, 5L, 10L, 15L, 9L))
  }

  test("null and constant columns degrade safely") {
    val df = Seq((Some(1L), 7L), (None, 7L)).toDF("x", "c")
    val z = df.select(ZOrder.zvalue(Seq(col("x"), col("c")),
      Seq(0.0, 7.0), Seq(1.0, 7.0), bits = 2).as("z"))
      .as[Long].collect().toSeq
    assert(z.size === 2)
    assert(z(1) === 0L, "null ranks first")
  }

  test("empty or all-null input degrades to a no-op layout, not an NPE") {
    val empty = spark.range(0).select(col("id").as("x"), col("id").as("y"))
    assert(ZOrder.zorderBy(empty, Seq("x", "y"), 2).count() === 0)
    val allNull = Seq((None: Option[Long], 1L), (None, 2L)).toDF("x", "y")
    assert(ZOrder.zorderBy(allNull, Seq("x", "y"), 2).count() === 2)
  }

  test("z-ordered layout prunes stripes on BOTH interleaved columns") {
    val hc = spark.sparkContext.hadoopConfiguration
    val old = hc.get("orc.stripe.size")
    val zDir = java.nio.file.Files.createTempDirectory("graft-zorder").toString
    val sDir = java.nio.file.Files.createTempDirectory("graft-sorted").toString
    val li = Tables.lineitem(spark, TestSpark.sf0001)
    try {
      hc.set("orc.stripe.size", "65536") // many small stripes
      ZOrder.zorderBy(li, Seq("l_orderkey", "l_partkey"), partitions = 1)
        .coalesce(1).write.mode("overwrite").orc(zDir)
      li.coalesce(1).sortWithinPartitions($"l_orderkey")
        .write.mode("overwrite").orc(sDir)
    } finally {
      if (old == null) hc.unset("orc.stripe.size") else hc.set("orc.stripe.size", old)
    }

    def prunedStripes(dir: String, filter: org.apache.spark.sql.Column): (Long, Long) = {
      val q = spark.read.format("graft-orc").load(dir).filter(filter)
      q.collect()
      val scan = q.queryExecution.executedPlan.collect {
        case b: BatchScanExec => b }.head
      def m(n: String): Long =
        scan.metrics.collectFirst { case (k, mm) if k == n => mm.value }.get
      (m("graftStripesPruned"), m("graftStripesMatched"))
    }

    // both z-columns prune on the z layout
    val (zOrderPruned, _) = prunedStripes(zDir, $"l_orderkey" < 50)
    val (zPartPruned, _) = prunedStripes(zDir, $"l_partkey" < 20)
    assert(zOrderPruned > 0, "z layout must prune on l_orderkey")
    assert(zPartPruned > 0, "z layout must prune on l_partkey")

    // the single-column sort prunes on its sort key but NOT on the other
    val (sOrderPruned, _) = prunedStripes(sDir, $"l_orderkey" < 50)
    val (sPartPruned, sPartMatched) = prunedStripes(sDir, $"l_partkey" < 20)
    assert(sOrderPruned > 0)
    assert(zPartPruned > sPartPruned,
      s"z layout should beat single-sort on the second column: " +
        s"z=$zPartPruned vs sorted=$sPartPruned (matched=$sPartMatched)")

    // layout never changes results
    assert(spark.read.orc(zDir).filter($"l_partkey" < 20).count() ===
      li.filter($"l_partkey" < 20).count())
    assert(spark.read.orc(zDir).count() === li.count())
  }
}
