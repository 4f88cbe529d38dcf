package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.streaming.EventStream

/** Structured Streaming over events: the streaming windowed aggregation must
  * agree with the equivalent batch computation once all data is processed.
  */
class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("streaming hourly counts == batch hourly counts") {
    // the nanos flag must stay scoped to the stream's cloned session —
    // constructing a stream may not change the caller session's conf
    // (Tables.events legitimately sets it on the shared session elsewhere,
    // so assert no CHANGE rather than absence)
    val flagBefore =
      spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong")
    val stream = EventStream.hourlyCounts(spark, TestSpark.sf0001)
    assert(spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong")
      === flagBefore,
      "EventStream leaked nanosAsLong into the caller session")
    assert(stream.sparkSession ne spark)
    val q = stream
      .writeStream.outputMode("complete")
      .format("memory").queryName("st_hourly")
      .start()
    try q.processAllAvailable() finally q.stop()

    // memory-sink views register in the stream's (cloned) session
    val streamed = stream.sparkSession.table("st_hourly")
      .select(date_format($"window.start", "yyyy-MM-dd HH").as("hour_key"),
        $"event_type", $"n")
      .orderBy($"hour_key", $"event_type")
      .as[(String, String, Long)].collect().toSeq

    val batch = Tables.events(spark, TestSpark.sf0001)
      .groupBy(date_format(date_trunc("hour", $"ts"), "yyyy-MM-dd HH")
          .as("hour_key"), $"event_type")
      .agg(count(lit(1)).as("n"))
      .orderBy($"hour_key", $"event_type")
      .as[(String, String, Long)].collect().toSeq

    assert(streamed === batch)
  }

  test("mapGroupsWithState running totals cover every event exactly once") {
    val stream = EventStream.statefulUserTotals(spark, TestSpark.sf0001)
    val q = stream
      .writeStream.outputMode("update")
      .format("memory").queryName("st_stateful")
      .start()
    try q.processAllAvailable() finally q.stop()
    val out = stream.sparkSession.table("st_stateful")
    val batch = Tables.events(spark, TestSpark.sf0001)
    assert(out.agg(sum($"n_events")).as[Long].collect().head === batch.count())
    assert(out.count() ===
      batch.select($"user_id").distinct().count())
  }

  test("streaming dedup drops nothing on unique ids and covers every event") {
    val stream = EventStream.dedupedStream(spark, TestSpark.sf0001)
    val q = stream
      .writeStream.outputMode("append")
      .format("memory").queryName("st_dedup")
      .start()
    try q.processAllAvailable() finally q.stop()
    val out = stream.sparkSession.table("st_dedup")
    val batch = Tables.events(spark, TestSpark.sf0001)
    // event_ids are unique in the testdata: streaming dedup must be lossless
    assert(out.count() === batch.count())
    assert(out.select($"event_id").distinct().count() === batch.count())
  }

  test("stream-stream interval join == batch interval join") {
    val stream = EventStream.clickErrorJoin(spark, TestSpark.sf0001)
    val q = stream
      .writeStream.outputMode("append")
      .format("memory").queryName("st_join")
      .start()
    try q.processAllAvailable() finally q.stop()
    val streamed = stream.sparkSession.table("st_join")
      .select($"e_id", $"c_id").as[(Long, Long)].collect().toSet

    val e = Tables.events(spark, TestSpark.sf0001)
    val clicks = e.filter($"event_type" === "click")
      .select($"event_id".as("c_id"), $"user_id".as("c_user"),
        unix_micros($"ts".cast("timestamp")).as("c_us"))
    val errors = e.filter($"event_type" === "error")
      .select($"event_id".as("e_id"), $"user_id".as("e_user"),
        unix_micros($"ts".cast("timestamp")).as("e_us"))
    val batch = errors.join(clicks,
        $"e_user" === $"c_user" && $"e_us" >= $"c_us" &&
          $"e_us" <= $"c_us" + 3600000000L)
      .select($"e_id", $"c_id").as[(Long, Long)].collect().toSet

    assert(batch.nonEmpty, "fixture produced no click-error pairs")
    assert(streamed === batch)
  }

  test("stream-stream LEFT OUTER join: unmatched errors emit NULL once " +
    "the watermark passes") {
    // stream dir the test controls: the fixture events plus (later) a
    // far-future sentinel wave that advances the watermark so held
    // outer-candidate state flushes
    val dir = java.nio.file.Files.createTempDirectory("st-leftjoin").toString
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"${TestSpark.sf0001}/events.parquet"),
      java.nio.file.Paths.get(s"$dir/events.parquet"))

    val stream = EventStream.clickErrorLeftJoin(spark, dir)
    val q = stream.writeStream.outputMode("append")
      .format("memory").queryName("st_leftjoin").start()
    try {
      q.processAllAvailable()
      // push the watermark ~8h past every fixture event: one future click
      // for a user id that matches nothing. Waves must carry the SAME
      // on-disk ts type as the fixture file (the stream's explicit schema
      // was probed from it): raw long nanos for the TIMESTAMP(NANOS)
      // testdata generation, TIMESTAMP_NTZ for the micros one.
      val session = stream.sparkSession
      val fixture = session.read
        .option("pathGlobFilter", "events.parquet").parquet(dir)
      val tsIsLong =
        fixture.schema("ts").dataType == org.apache.spark.sql.types.LongType
      val maxUs =
        (if (tsIsLong) fixture.select(expr("max(ts) DIV 1000"))
         else fixture.select(max(unix_micros($"ts".cast("timestamp")))))
        .head().getLong(0)
      import session.implicits._
      // one sentinel per SIDE: the global watermark is the MIN across
      // both watermark operators, and each side's operator only sees rows
      // passing its event-type filter. The sentinel error itself stays
      // held in state (the watermark never passes it), so it cannot leak
      // into the output.
      // the source lists only the top level of `dir`: land each wave as a
      // single FILE there (write to a temp dir, move the part file in)
      // wave rows carry ts in MICROS; landWave re-types to the fixture's
      // on-disk generation
      def landWave(rows: Seq[(Long, Long, Long, String, Double, String)],
                   name: String): Unit = {
        val tmp = java.nio.file.Files.createTempDirectory("st-wave").toString
        val df = rows
          .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        (if (tsIsLong) df.withColumn("ts", $"ts" * 1000L)
         else df.withColumn("ts",
           timestamp_micros($"ts").cast("timestamp_ntz")))
          .coalesce(1).write.mode("overwrite").parquet(tmp)
        val part = new java.io.File(tmp).listFiles()
          .find(_.getName.endsWith(".parquet")).get
        java.nio.file.Files.move(part.toPath,
          java.nio.file.Paths.get(s"$dir/$name.parquet"))
      }
      val far = maxUs + 10L * 3600 * 1000000L
      landWave(Seq((-1L, far, -1L, "click", 0.0, "{}"),
        (-2L, far, -2L, "error", 0.0, "{}")), "late1")
      q.processAllAvailable()
      // a watermark computed from a batch applies to the NEXT batch; land
      // one more tiny wave so eviction runs under the sentinel watermark
      landWave(Seq((-3L, far + 3600L * 1000000L, -3L, "click", 0.0, "{}")),
        "late2")
      q.processAllAvailable()
    } finally q.stop()

    val streamed = stream.sparkSession.table("st_leftjoin")
      .select($"e_id", $"c_id").as[(Long, Option[Long])].collect().toSet

    val e = Tables.events(spark, TestSpark.sf0001)
    val clicks = e.filter($"event_type" === "click")
      .select($"event_id".as("c_id"), $"user_id".as("c_user"),
        unix_micros($"ts".cast("timestamp")).as("c_us"))
    val errors = e.filter($"event_type" === "error")
      .select($"event_id".as("e_id"), $"user_id".as("e_user"),
        unix_micros($"ts".cast("timestamp")).as("e_us"))
    val batch = errors.join(clicks,
        $"e_user" === $"c_user" && $"e_us" >= $"c_us" &&
          $"e_us" <= $"c_us" + 3600000000L, "left_outer")
      .select($"e_id", $"c_id").as[(Long, Option[Long])].collect().toSet

    val streamedNulls = streamed.count(_._2.isEmpty)
    assert(streamedNulls > 0, "fixture needs unmatched errors")
    assert(streamed === batch,
      s"left-outer stream join diverged: ${streamed.size} streamed " +
        s"($streamedNulls nulls) vs ${batch.size} batch rows")
  }

  test("session windows produce per-user sessions") {
    val stream = EventStream.sessionCounts(spark, TestSpark.sf0001)
    val q = stream
      .writeStream.outputMode("complete")
      .format("memory").queryName("st_sessions")
      .start()
    try q.processAllAvailable() finally q.stop()
    val out = stream.sparkSession.table("st_sessions")
    assert(out.count() > 0)
    // session totals must cover every event exactly once
    val total = out.agg(sum($"n_events")).as[Long].collect().head
    assert(total === Tables.events(spark, TestSpark.sf0001).count())
  }
}
