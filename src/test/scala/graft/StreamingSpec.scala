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
