package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.OrcTables

/** Parity against the reference's checked-in ORC fixtures (both written by
  * Apache Spark, so results must match byte-for-byte).
  *
  * Mirrors /root/reference tests: schema inference exact-match
  * (tests/basic_reading.rs:188-241), row contents (259-275), predicate
  * results (tests/predicate_pushdown.rs:102-134), NULL counting (656-675),
  * and the pushdown-on == pushdown-off invariant (basic_reading.rs:557-596).
  */
class OrcFixtureParitySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  lazy val alltypes = OrcTables.read(spark, TestSpark.resource("alltypes.snappy.orc"))
  lazy val mapList = OrcTables.read(spark, TestSpark.resource("map_list.snappy.orc"))

  test("alltypes schema inferred exactly (names, order, types, nullability)") {
    val expected = StructType(Seq(
      StructField("boolean", BooleanType),
      StructField("int8", ByteType),
      StructField("int16", ShortType),
      StructField("int32", IntegerType),
      StructField("int64", LongType),
      StructField("float32", FloatType),
      StructField("float64", DoubleType),
      StructField("decimal", DecimalType(15, 5)),
      StructField("binary", BinaryType),
      StructField("utf8", StringType),
      StructField("date32", DateType)))
    assert(alltypes.schema === expected)
  }

  test("alltypes full scan: 11 rows with reference row design") {
    assert(alltypes.count() === 11)
    // rows 1 and 11 all-NULL
    assert(alltypes.filter($"int8".isNull && $"utf8".isNull && $"boolean".isNull)
      .count() === 2)
    // null/boolean counts from tests/basic_reading.rs
    assert(alltypes.filter($"boolean" === false).count() === 3)
    assert(alltypes.filter($"boolean" === true).count() === 6)
  }

  test("predicate int8 > 51 with projection and sort (predicate_pushdown.rs:102-134)") {
    val got = alltypes.filter($"int8" > 51)
      .select($"int8", $"utf8")
      .orderBy($"int8")
      .as[(Byte, String)].collect().toSeq
    assert(got === Seq((52.toByte, "鈴原希実"), (53.toByte, "🤔"),
      (127.toByte, "encode")))
  }

  test("extreme values round-trip (basic_reading.rs:678-741)") {
    val maxRow = alltypes.filter($"int8" === 127).collect().head
    assert(maxRow.getAs[Short]("int16") === Short.MaxValue)
    assert(maxRow.getAs[Int]("int32") === Int.MaxValue)
    assert(maxRow.getAs[Long]("int64") === Long.MaxValue)
    assert(maxRow.getAs[Float]("float32").isPosInfinity)
    assert(maxRow.getAs[java.math.BigDecimal]("decimal").toPlainString
      === "123456789.12345")
    assert(maxRow.getAs[java.sql.Date]("date32").toString === "9999-12-31")
    val minRow = alltypes.filter($"int8" === -128).collect().head
    assert(minRow.getAs[Float]("float32").isNegInfinity)
    // pre-Gregorian date (proleptic calendar handling)
    assert(minRow.getAs[java.sql.Date]("date32").toString === "1582-10-15")
  }

  test("zero/epoch row (basic_reading.rs row 2)") {
    val r = alltypes.filter($"int8" === 0).collect().head
    assert(r.getAs[java.sql.Date]("date32").toString === "1970-01-01")
    assert(r.getAs[Double]("float64") === 0.0)
  }

  test("unicode strings incl. CJK and emoji (basic_reading.rs:773-794)") {
    val utf8s = alltypes.filter($"utf8".isNotNull).select($"utf8")
      .as[String].collect().toSet
    assert(Set("大熊和奏", "斉藤朱夏", "鈴原希実", "🤔", "encode", "decode")
      .subsetOf(utf8s))
  }

  test("map_list schema and contents (basic_reading.rs:230-241, 388-411)") {
    assert(mapList.schema.fieldNames.toSeq === Seq("id", "m", "l", "s"))
    assert(mapList.schema("m").dataType ===
      MapType(StringType, StringType, valueContainsNull = true))
    assert(mapList.schema("l").dataType ===
      ArrayType(StringType, containsNull = true))
    val r = mapList.collect().head
    assert(r.getAs[Long]("id") === 1L)
    assert(r.getAs[Map[String, String]]("m") === Map("zero" -> "0", "one" -> "1"))
    assert(r.getAs[Seq[String]]("l") === Seq("test", "blaze"))
    assert(r.getAs[String]("s") === "blaze")
  }

  test("pushdown-on results == pushdown-off results (basic_reading.rs:557-596)") {
    def run(push: Boolean) = {
      val df = OrcTables.read(spark, TestSpark.resource("alltypes.snappy.orc"),
        Map("orc.pushdown_predicate" -> push.toString))
      df.filter($"int32" >= 0 && $"boolean" === true)
        .select($"int8", $"int32", $"utf8")
        .orderBy($"int32")
        .collect().toSeq
    }
    assert(run(push = true) === run(push = false))
  }

  // ------------------------------------------------------ projection sweep
  // The reference's projection-permutation contract (basic_reading.rs:
  // 280-385, 800-886): subsets, reorderings, single column, all columns
  // explicitly, projection+sort+limit — each against pinned row contents.

  test("projection subset keeps file order (basic_reading.rs:312-345)") {
    val got = alltypes.select($"boolean", $"int8", $"int16")
      .collect().map(r => (Option(r.get(0)), Option(r.get(1)), Option(r.get(2))))
    assert(got.length === 11)
    assert(got(0) === (None, None, None)) // leading all-NULL row
    assert(got(1) === (Some(true), Some(0.toByte), Some(0.toShort)))
    assert(got(4) === (Some(true), Some(127.toByte), Some(Short.MaxValue)))
    assert(got(5) === (Some(true), Some(-128.toByte), Some(Short.MinValue)))
    assert(got(10) === (None, None, None)) // trailing all-NULL row
  }

  test("projection reordered vs schema order (basic_reading.rs:349-385)") {
    val got = alltypes.select($"int16", $"boolean")
      .collect().map(r => (Option(r.get(0)), Option(r.get(1))))
    assert(got(2) === (Some(1.toShort), Some(false)))
    assert(got(3) === (Some((-1).toShort), Some(false)))
  }

  test("projection reverse order with predicate (basic_reading.rs:858-886)") {
    val got = alltypes.select($"date32", $"utf8", $"int8", $"boolean")
      .filter($"int8" === 1)
      .as[(java.sql.Date, String, Byte, Boolean)].collect().toSeq
    assert(got === Seq((java.sql.Date.valueOf("1970-01-02"), "a",
      1.toByte, false)))
  }

  test("projection single column with predicate (basic_reading.rs:800-830)") {
    val got = alltypes.select($"boolean").filter($"boolean" === false)
    assert(got.count() === 3)
    assert(got.columns.toSeq === Seq("boolean"))
  }

  test("projection all columns explicit with predicate (basic_reading.rs:833-856)") {
    val all = Seq("boolean", "int8", "int16", "int32", "int64", "float32",
      "float64", "decimal", "binary", "utf8", "date32")
    val got = alltypes.select(all.map(col): _*).filter($"int8" === 0)
    assert(got.count() === 1)
    assert(got.columns.toSeq === all)
  }

  test("projection + sort + limit (basic_reading.rs:280-310)") {
    // NULLS FIRST ascending over int8, first 3 rows: two all-NULL rows
    // then the -128 row ('decode', 1582-10-15)
    val got = alltypes.select($"int8", $"utf8", $"date32")
      .orderBy($"int8".asc_nulls_first).limit(3)
      .collect().map(r => (Option(r.get(0)), Option(r.get(1)),
        Option(r.get(2)).map(_.toString)))
    assert(got(0)._1 === None && got(1)._1 === None)
    assert(got(2) === (Some(-128.toByte), Some("decode"), Some("1582-10-15")))
  }

  test("batch_size=2 end-to-end: tiny batches, same results (basic_reading.rs:529-556)") {
    val df = OrcTables.read(spark, TestSpark.resource("alltypes.snappy.orc"),
      Map("orc.batch_size" -> "2"))
    val got = df.select($"int8").filter($"int8" === 50)
      .as[Byte].collect().toSeq
    assert(got === Seq(50.toByte))
    // and the full scan row count is unaffected by the batch boundary
    assert(df.count() === 11)
  }

  test("per-file statistics: exact rows and positive bytes (basic_reading.rs:612-650)") {
    val stats = graft.sources.OrcStatistics.tableStats(spark,
      TestSpark.resource("alltypes.snappy.orc"))
    assert(stats.numRows === 11)
    assert(stats.totalBytes > 0)
    assert(stats.numFiles === 1)
  }

  test("non-ORC path yields empty-ish handling, not wrong data (basic_reading.rs:493-522)") {
    // a directory with no .orc files: Spark errors on schema inference —
    // the graceful-empty contract only applies to extension-filtered
    // listings, which `register` implements by filtering *.orc
    val tmp = java.nio.file.Files.createTempDirectory("graft-noorc")
    java.nio.file.Files.writeString(tmp.resolve("readme.txt"), "not orc")
    val names = OrcTables.register(spark, tmp.toString)
    assert(names.isEmpty)
  }
}
