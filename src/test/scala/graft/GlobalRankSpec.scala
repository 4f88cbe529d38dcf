package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.GlobalRank

/** Exact distributed NTILE (GlobalRank.ntile): same buckets as the
  * single-partition window ntile on a total order, for every remainder
  * class and the fewer-rows-than-buckets edge — with NO
  * single-partition exchange in the plan.
  */
class GlobalRankSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def windowTwin(df: org.apache.spark.sql.DataFrame, n: Int) =
    df.withColumn("expected",
      ntile(n).over(Window.orderBy(col("v"), col("id"))))

  test("parity with the window ntile across bucket counts, remainders, " +
    "duplicates and the fewer-rows-than-buckets edge") {
    // duplicate v values force the total order to carry the tiebreak;
    // windowBelowRows = 0 forces the DISTRIBUTED path (the code under
    // test) on these deliberately small frames
    val base = spark.range(1000)
      .select(col("id"), (col("id") * 2654435761L % 97L).as("v"))
    for (n <- Seq(1, 3, 4, 7, 13)) {
      val got = GlobalRank.ntile(base, n, Seq(col("v"), col("id")), "b",
          windowBelowRows = 0L)
        .select(col("id"), col("b"))
      val want = windowTwin(base, n).select(col("id"), col("expected"))
      val diff = got.join(want, "id")
        .filter(col("b") =!= col("expected")).count()
      assert(diff === 0L, s"n=$n: $diff rows bucketed differently")
    }
    // fewer rows than buckets: each row its own bucket, in order
    val tiny = spark.range(3).select(col("id"), col("id").as("v"))
    val got = GlobalRank.ntile(tiny, 10, Seq(col("v"), col("id")), "b",
        windowBelowRows = 0L)
      .orderBy(col("v")).select(col("b")).as[Int].collect().toSeq
    assert(got === Seq(1, 2, 3))
    // empty frame: no rows, no failure (takes the gated window path)
    assert(GlobalRank.ntile(tiny.filter(lit(false)), 4,
      Seq(col("v")), "b").count() === 0L)
  }

  test("size gate: a dimension-sized frame takes the plain window path " +
    "(no offsets machinery), a large frame the distributed path") {
    val small = spark.range(500)
      .select(col("id"), (col("id") * 48271L % 101L).as("v"))
    val gated = GlobalRank.ntile(small, 4, Seq(col("v"), col("id")), "b")
    gated.collect()
    val gatedPlan = gated.queryExecution.executedPlan.toString
    // the gate picked the window operator — and parity still holds
    assert(gatedPlan.contains("Window"), gatedPlan.take(2000))
    assert(!gatedPlan.contains("__grk_pid"), gatedPlan.take(2000))
    val diff = gated.select(col("id"), col("b"))
      .join(windowTwin(small, 4).select(col("id"), col("expected")), "id")
      .filter(col("b") =!= col("expected")).count()
    assert(diff === 0L)
    // just over the default threshold: distributed path, no Window node
    val big = spark.range(GlobalRank.DefaultWindowBelowRows + 1)
      .select(col("id"), col("id").as("v"))
    val dist = GlobalRank.ntile(big, 4, Seq(col("v"), col("id")), "b")
    dist.collect()
    assert(!dist.queryExecution.executedPlan.toString.contains("Window"))
  }

  test("checkpoint lifetimes: each path leaves exactly ONE persistent " +
    "block set alive — the small path returns the pinned input itself, " +
    "the distributed path drops it once `ranged` truncates lineage") {
    val created = scala.collection.mutable.Set[Int]()
    def addedBy(body: => Unit): Int = {
      val before = spark.sparkContext.getPersistentRDDs.keySet
      body
      val added = spark.sparkContext.getPersistentRDDs.keySet -- before
      created ++= added
      added.size
    }
    // small path: the pinned input IS the returned frame's backing
    val small = spark.range(100).select(col("id"), col("id").as("v"))
    val nSmall = addedBy {
      GlobalRank.ntile(small, 4, Seq(col("v"), col("id")), "b").count()
    }
    assert(nSmall === 1,
      s"small path should keep only the pinned input, got $nSmall")
    // distributed path: pinned is dropped, ranged survives
    val big = spark.range(GlobalRank.DefaultWindowBelowRows + 1)
      .select(col("id"), col("id").as("v"))
    val nBig = addedBy {
      GlobalRank.ntile(big, 4, Seq(col("v"), col("id")), "b").count()
    }
    assert(nBig === 1,
      s"distributed path should keep only the ranged checkpoint, got $nBig")
    // release only what THIS test created — the session is shared, and
    // another suite's localCheckpoint-backed frame would be unrecoverable
    spark.sparkContext.getPersistentRDDs
      .filter { case (id, _) => created(id) }
      .values.foreach(_.unpersist(false))
  }

  test("the plan has NO single-partition exchange (the scale property " +
    "the operator exists for)") {
    val rows = GlobalRank.DefaultWindowBelowRows * 2 // above the gate
    val base = spark.range(rows)
      .select(col("id"), (col("id") * 48271L % rows).as("v"))
    val out = GlobalRank.ntile(base, 4, Seq(col("v"), col("id")), "b")
      .groupBy(col("b")).agg(count(lit(1)).as("c"))
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange SinglePartition"),
      s"single-partition exchange found:\n${plan.take(2000)}")
    // and the window twin DOES have one — the contrast is the point
    val twin = windowTwin(base, 4).groupBy(col("expected"))
      .agg(count(lit(1)).as("c"))
    twin.collect()
    assert(twin.queryExecution.executedPlan.toString
      .contains("Exchange SinglePartition"))
    // exact quartile sizes on the big frame
    val q = rows / 4
    val sizes = out.orderBy(col("b")).as[(Int, Long)].collect().toSeq
    assert(sizes === Seq((1, q), (2, q), (3, q), (4, q)), s"got $sizes")
  }
}
