package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.SkewJoin
import graft.sources.{Converters, OrcTables}

class UtilitiesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("asOfJoin: latest-at-or-before semantics, ties match, no-match yields nulls") {
    import graft.operators.Joins
    val left = Seq((1L, 100L, "p1"), (1L, 50L, "p2"), (2L, 10L, "p3"))
      .toDF("k", "lt", "l_name")
    val right = Seq((1L, 40L, "c_40"), (1L, 100L, "c_100"), (1L, 120L, "c_120"),
      (3L, 5L, "c_other"))
      .toDF("k", "rt", "r_name")
    val got = Joins.asOfJoin(left, right, "k", "lt", "rt")
      .orderBy($"l_name")
      .select($"l_name", $"r_name").as[(String, String)].collect().toSeq
    assert(got === Seq(
      ("p1", "c_100"), // tie at equal ts matches (>=), later c_120 excluded
      ("p2", "c_40"),  // latest at-or-before 50
      ("p3", null)))   // key 2 has no rights -> null
  }

  test("salted join is row-identical to plain inner join") {
    val li = Tables.lineitem(spark, TestSpark.sf0001)
      .select($"l_orderkey", $"l_quantity")
    val orders = Tables.orders(spark, TestSpark.sf0001)
      .select($"o_orderkey".as("l_orderkey"), $"o_totalprice")
    val plain = li.join(orders, Seq("l_orderkey"), "inner")
      .groupBy($"l_orderkey").agg(count(lit(1)).as("n"),
        sum($"l_quantity".cast("decimal(18,2)")).cast("double").as("q"))
      .orderBy($"l_orderkey").collect().toSeq
    val salted = SkewJoin.saltedInnerJoin(li, orders, "l_orderkey", salt = 7)
      .groupBy($"l_orderkey").agg(count(lit(1)).as("n"),
        sum($"l_quantity".cast("decimal(18,2)")).cast("double").as("q"))
      .orderBy($"l_orderkey").collect().toSeq
    assert(salted === plain)
  }

  test("AQE splits a skewed join partition at runtime (skew=true in the final plan)") {
    // the automatic complement to SkewJoin.saltedInnerJoin: one hot key
    // dominating the shuffle must be split by OptimizeSkewedJoin. The
    // thresholds are lowered so the optimization fires at test scale —
    // on a real cluster the 256MB defaults play the same role.
    val confs = Seq(
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // force a shuffle join
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      // 50k rows on ONE key vs 64 spread keys => one partition dwarfs the rest
      val left = spark.range(50000).select(lit(1L).as("k"), $"id".as("v"))
        .union(spark.range(64).select(($"id" + 2).as("k"), $"id".as("v")))
      val right = spark.range(66).select($"id".as("k"), $"id".as("w"))
      val joined = left.join(right, "k")
      // collect() (not count()) so THIS QueryExecution runs and its final
      // adaptive plan is inspectable
      assert(joined.collect().length === 50000 + 64)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"), plan.take(1500))
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("GraftExtensions: functions callable from SQL, builder injection works") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT graft_rolling_hash('abc') AS h, graft_cjk_count('大熊 and cat') AS c")
      .collect().head
    assert(r.getLong(1) === 2L)
    val rep = spark.sql(
      "SELECT graft_repetition_stats('a a b') AS st").collect().head
    assert(rep.getSeq[Long](0) === Seq(3L, 2L, 1L, 1L))
    val buckets = spark.sql(
      "SELECT graft_hyperplane_buckets(array(CAST(1.0 AS FLOAT))) AS b")
      .collect().head
    assert(buckets.getSeq[Long](0).length === 8)
    // builder-level injection path constructs without error
    val ext = new GraftExtensions
    assert(GraftExtensions.functions.size === 8)
    assert(ext != null)
  }

  test("csvToOrc round-trips a delimited file with inferred schema") {
    val dir = java.nio.file.Files.createTempDirectory("graft-csv")
    java.nio.file.Files.writeString(dir.resolve("data.dat"),
      "1|alpha|10.5\n2|beta|20.25\n3|gamma|30.0\n")
    val out = dir.resolve("orc").toString
    Converters.csvToOrc(spark, dir.resolve("data.dat").toString, out)
    val back = OrcTables.read(spark, out)
    assert(back.count() === 3)
    assert(back.schema.fields.length === 3)
    val r = back.orderBy("_c0").collect()
    assert(r(0).getInt(0) === 1)
    assert(r(1).getString(1) === "beta")
    assert(r(2).getDouble(2) === 30.0)
  }

  test("parquetToOrc equals source") {
    val dir = java.nio.file.Files.createTempDirectory("graft-p2o").toString
    Converters.parquetToOrc(spark,
      s"${TestSpark.sf0001}/region.parquet", dir)
    val back = OrcTables.read(spark, dir).orderBy("r_regionkey").collect().toSeq
    val src = spark.read.parquet(s"${TestSpark.sf0001}/region.parquet")
      .orderBy("r_regionkey").collect().toSeq
    assert(back === src)
  }

  test("timestamp partition values parse in UTC regardless of JVM zone") {
    // the writer formats partition path values in UTC and the reader's
    // internal cast uses UTC; the external (pruning-side) parse must agree
    // on a non-UTC JVM or stats pruning drops the wrong files
    import org.apache.spark.sql.types.TimestampType
    import graft.sources.v2.GraftOrcDataSource
    val tz = java.util.TimeZone.getDefault
    try {
      java.util.TimeZone.setDefault(
        java.util.TimeZone.getTimeZone("America/New_York"))
      val v = GraftOrcDataSource
        .externalPartitionValue("2024-03-01 12:34:56", TimestampType)
        .asInstanceOf[java.sql.Timestamp]
      assert(v.toInstant === java.time.Instant.parse("2024-03-01T12:34:56Z"))
      val frac = GraftOrcDataSource
        .externalPartitionValue("2024-03-01 12:34:56.123456", TimestampType)
        .asInstanceOf[java.sql.Timestamp]
      assert(frac.toInstant ===
        java.time.Instant.parse("2024-03-01T12:34:56.123456Z"))
    } finally java.util.TimeZone.setDefault(tz)
  }
}
