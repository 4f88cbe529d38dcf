package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Port of the reference's predicate-pushdown suite
  * (tests/predicate_pushdown.rs:72-520): each filter shape runs over the
  * alltypes fixture THROUGH the graft-orc connector and must agree with
  * the built-in ORC source row-for-row (the strongest available oracle),
  * plus pinned counts where the reference pins row contents.
  */
class OrcPredicateParitySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val path = TestSpark.resource("alltypes.snappy.orc")
  private def v2 = spark.read.format("graft-orc").load(path)
  private def builtin = spark.read.orc(path)

  private def agree(name: String, pred: Column): Unit = {
    val a = v2.filter(pred).orderBy($"int8".asc_nulls_first).collect()
    val b = builtin.filter(pred).orderBy($"int8".asc_nulls_first).collect()
    assert(a === b, s"$name diverged from built-in source")
  }

  test("equality (predicate_pushdown.rs:72)") {
    agree("int8 = 50", $"int8" === 50)
    assert(v2.filter($"int8" === 50).count() === 1)
  }

  test("greater-than (:103)") {
    agree("int8 > 51", $"int8" > 51)
    assert(v2.filter($"int8" > 51).count() === 3)
  }

  test("less-than (:138)") {
    agree("int8 < 0", $"int8" < 0)
    assert(v2.filter($"int8" < 0).count() === 2) // -1 and -128
  }

  test("compound AND (:172)") {
    agree("int8 >= 50 AND int8 <= 52", $"int8" >= 50 && $"int8" <= 52)
    assert(v2.filter($"int8" >= 50 && $"int8" <= 52).count() === 3)
  }

  test("OR predicate (:211)") {
    agree("int8 = 0 OR int8 = 127", $"int8" === 0 || $"int8" === 127)
    assert(v2.filter($"int8" === 0 || $"int8" === 127).count() === 2)
  }

  test("IS NULL (:245)") {
    agree("int8 IS NULL", $"int8".isNull)
    assert(v2.filter($"int8".isNull).count() === 2) // leading+trailing rows
  }

  test("IS NOT NULL (:277)") {
    agree("int8 IS NOT NULL", $"int8".isNotNull)
    assert(v2.filter($"int8".isNotNull).count() === 9)
  }

  test("string equality (:315)") {
    agree("utf8 = 'encode'", $"utf8" === "encode")
    assert(v2.filter($"utf8" === "encode").select($"int8")
      .as[Byte].collect().toSeq === Seq(127.toByte))
  }

  test("boolean filter (:346)") {
    agree("boolean = false", $"boolean" === false)
    assert(v2.filter($"boolean" === false).count() === 3)
  }

  test("float comparison (:381)") {
    agree("float32 > 0", $"float32" > 0f)
    agree("float64 <= 0", $"float64" <= 0.0)
  }

  test("not-equal (:416)") {
    agree("int8 <> 50", $"int8" =!= 50)
    // <> never matches NULL rows in either engine
    assert(v2.filter($"int8" =!= 50).count() === 8)
  }

  test("filter with projection (:447)") {
    val a = v2.filter($"int8" > 0).select($"utf8", $"int32")
      .orderBy($"int32").collect()
    val b = builtin.filter($"int8" > 0).select($"utf8", $"int32")
      .orderBy($"int32").collect()
    assert(a === b)
  }

  test("filter with limit (:485)") {
    // limit row-count contract (content of a limited scan is order-free)
    assert(v2.filter($"int8" >= 0).limit(3).count() === 3)
    assert(v2.filter($"int8" === 50).limit(5).count() === 1)
  }

  test("IN list compiles to a SearchArgument and agrees with built-in") {
    // IN is the one SARG shape the ported reference suite does not
    // exercise; Spark's Filter.In converts to SearchArgument.in, so it
    // must prune and filter identically to the built-in source
    agree("int8 IN (50, 51, 127)", $"int8".isin(50, 51, 127))
    agree("utf8 IN (...)", $"utf8".isin("bright blue sky", "nonexistent"))
    agree("NOT IN with nulls", !$"int8".isin(50, 51))
  }

  test("BETWEEN agrees with built-in (range SARG)") {
    agree("int8 BETWEEN 40 AND 60", $"int8".between(40, 60))
  }
}
