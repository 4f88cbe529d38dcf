package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Property tests generalizing the reference's pushdown-equivalence test
  * (basic_reading.rs:557-596): for GENERATED predicates and projections
  * (scalacheck generators, fixed seeds for reproducibility),
  *  - pushdown-on == pushdown-off,
  *  - graft-orc == built-in ORC,
  *  - projection permutation only permutes columns, never changes rows.
  */
class PropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private lazy val orcPath =
    graft.sources.OrcData.orcPath(spark, TestSpark.sf0001, "orders")

  // random predicate over orders columns
  private val genPredicate: Gen[Column] = {
    val priceCmp = for {
      v <- Gen.choose(1000.0, 500000.0)
      op <- Gen.oneOf(Seq[(Column, Double) => Column](
        (c, x) => c > x, (c, x) => c >= x, (c, x) => c < x,
        (c, x) => c <= x, (c, x) => c === x, (c, x) => c =!= x))
    } yield op(col("o_totalprice"), v)
    val statusEq = Gen.oneOf("O", "F", "P").map(s => col("o_orderstatus") === s)
    val prioEq = Gen.oneOf("1-URGENT", "3-MEDIUM", "5-LOW")
      .map(p => col("o_orderpriority") === p)
    val keyCmp = Gen.choose(1L, 15000L).map(k => col("o_orderkey") <= k)
    val leaf = Gen.oneOf(priceCmp, statusEq, prioEq, keyCmp)
    for {
      a <- leaf; b <- leaf
      comb <- Gen.oneOf(Seq[(Column, Column) => Column](
        _ && _, _ || _, (x, _) => !x))
    } yield comb(a, b)
  }

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (1 to n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  private def rows(df: DataFrame): Seq[String] =
    df.orderBy(col("o_orderkey")).collect().map(_.toString).toSeq

  test("property: filter results invariant to ORC predicate pushdown setting") {
    samples(genPredicate, 12).foreach { pred =>
      val onRows = rows(spark.read.orc(orcPath).filter(pred))
      spark.conf.set("spark.sql.orc.filterPushdown", "false")
      val offRows = try rows(spark.read.orc(orcPath).filter(pred))
        finally spark.conf.set("spark.sql.orc.filterPushdown", "true")
      assert(onRows === offRows, s"pushdown divergence for $pred")
    }
  }

  test("property: graft-orc scan == built-in ORC scan under random predicates") {
    samples(genPredicate, 12).foreach { pred =>
      val v2 = rows(spark.read.format("graft-orc").load(orcPath).filter(pred))
      val bi = rows(spark.read.orc(orcPath).filter(pred))
      assert(v2 === bi, s"graft-orc divergence for $pred")
    }
  }

  test("property: hash-keyed pipeline ops are invariant to partitioning") {
    // pp_train_test_split / pp_stratified_sample / pp_sequence_pack claim
    // reproducibility across runs, machines, and REPARTITIONS (no rand(),
    // no partition-local state). A partition-count change must not move a
    // single row — this is what makes the sample/split/packing citable in
    // a data card.
    val saved = spark.conf.get("spark.sql.shuffle.partitions")
    def run(name: String): Seq[String] = {
      val df = SparkEntry.queries(name)(spark, TestSpark.sf0001)
      df.collect().map(_.toString).toSeq.sorted
    }
    try {
      Seq("pp_train_test_split", "pp_stratified_sample",
        "pp_sequence_pack").foreach { name =>
        spark.conf.set("spark.sql.shuffle.partitions", "2")
        val a = run(name)
        spark.conf.set("spark.sql.shuffle.partitions", "13")
        val b = run(name)
        assert(a.nonEmpty && a === b, s"$name moved rows under repartitioning")
      }
    } finally spark.conf.set("spark.sql.shuffle.partitions", saved)
  }

  test("property: projection permutation permutes columns, not rows") {
    val others = Seq("o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderpriority")
    samples(Gen.someOf(others), 10).foreach { subset =>
      val perm = "o_orderkey" +: scala.util.Random.shuffle(subset.toSeq)
      val sorted = perm.sorted
      val a = spark.read.orc(orcPath).select(perm.map(col): _*)
        .select(sorted.map(col): _*) // re-align
      val b = spark.read.orc(orcPath).select(sorted.map(col): _*)
      assert(rows(a) === rows(b), s"projection divergence for $perm")
    }
  }
}
