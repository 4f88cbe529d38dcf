package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
import org.apache.spark.sql.types._

/** Raw events row (ts normalized to epoch micros). */
case class RawEvent(event_id: Long, ts: Long, user_id: Long,
                    event_type: String, value: Double, props: String)

/** Custom state carried across micro-batches per user. */
case class UserRunning(nEvents: Long, sumValue: Double)

/** Structured Streaming over the `events` table.
  *
  * The reference has no streaming surface (SURVEY.md §2, "streams" there are
  * async I/O batch iterators), but once the batch source works Spark gives
  * event-time streaming nearly free — this module is that "nearly free"
  * made concrete: a file-source stream with watermarked event-time windows,
  * used by tests/demos via the memory sink.
  */
object EventStream {

  /** Raw schema of events.parquet given the on-disk `ts` type (the
    * file-source stream needs an explicit schema, and driver testdata
    * generations have shipped `ts` as TIMESTAMP(NANOS) — read as raw long
    * nanos — and as TIMESTAMP(MICROS) — read as TIMESTAMP_NTZ).
    */
  def rawSchema(tsType: org.apache.spark.sql.types.DataType): StructType =
    StructType(Seq(
      StructField("event_id", LongType),
      StructField("ts", tsType),
      StructField("user_id", LongType),
      StructField("event_type", StringType),
      StructField("value", DoubleType),
      StructField("props", StringType)))

  /** Session clone with the parquet nanos-as-long flag set. The flag is
    * consulted at every micro-batch's planning, not at stream construction,
    * so it must outlive this call — but setting it on the caller's session
    * would leak into every subsequent parquet read there. `newSession()`
    * shares the SparkContext and cache but has isolated runtime conf,
    * giving the flag exactly stream-lifetime scope. The returned stream
    * (and its memory-sink views) binds to this clone — resolve sink tables
    * via `df.sparkSession`.
    */
  private def nanosSession(spark: SparkSession): SparkSession = {
    val s = spark.newSession()
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    s
  }

  /** Streaming read of the events files under `dir` matching `glob`, with
    * `ts` normalized to a session-zone TIMESTAMP at microsecond precision
    * whatever the on-disk generation. The actual `ts` type is probed ONCE
    * from the files (one driver-side footer read) because the explicit
    * stream schema must match the files exactly.
    */
  private def rawEvents(session: SparkSession, dir: String,
                        glob: String): DataFrame = {
    val tsType = session.read.option("pathGlobFilter", glob).parquet(dir)
      .schema("ts").dataType
    val stream = session.readStream
      .schema(rawSchema(tsType))
      .option("pathGlobFilter", glob)
      .parquet(dir)
    tsType match {
      case LongType => // TIMESTAMP(NANOS) as raw nanos
        stream.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case TimestampType => stream
      case _ => stream.withColumn("ts", col("ts").cast(TimestampType))
    }
  }

  /** Streaming hourly counts per event type with a 2-hour watermark.
    * `dir` is a testdata sf directory; only events.parquet is picked up.
    */
  def hourlyCounts(spark: SparkSession, dir: String): DataFrame = {
    rawEvents(nanosSession(spark), dir, "events.parquet")
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
  }

  /** Arbitrary stateful processing: per-user running totals via
    * `mapGroupsWithState` — the custom-state API for logic windows can't
    * express. State is a typed case class persisted by the state store
    * across micro-batches; output mode must be Update.
    */
  def statefulUserTotals(spark: SparkSession, dir: String): DataFrame = {
    val session = nanosSession(spark)
    import session.implicits._
    val events = rawEvents(session, dir, "events.parquet")
      .withColumn("ts", unix_micros(col("ts")))
      .as[RawEvent]
    events.groupByKey(_.user_id)
      .mapGroupsWithState[UserRunning, (Long, Long, Double)](
        GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[RawEvent], state: GroupState[UserRunning]) =>
          val prev = state.getOption.getOrElse(UserRunning(0L, 0.0))
          var n = prev.nEvents
          var sum = prev.sumValue
          it.foreach { e => n += 1; sum += e.value }
          state.update(UserRunning(n, sum))
          (uid, n, sum)
      }
      .toDF("user_id", "n_events", "sum_value")
  }

  /** Streaming ingest dedup — the training-pipeline shape: drop exact
    * duplicate records as they arrive, with state bounded by the event-time
    * watermark (`dropDuplicatesWithinWatermark`: a duplicate arriving
    * within the watermark delay of its first copy is dropped; state for
    * older keys is evicted, so the state store never grows unboundedly —
    * the property that matters on an infinite stream).
    */
  def dedupedStream(spark: SparkSession, dir: String): DataFrame = {
    rawEvents(nanosSession(spark), dir, "events.parquet")
      .withWatermark("ts", "2 hours")
      .dropDuplicatesWithinWatermark("event_id")
  }

  /** Sessionized running aggregate per user via flatMapGroupsWithState-free
    * windowing: 30-minute session windows (built-in session_window).
    */
  def sessionCounts(spark: SparkSession, dir: String): DataFrame = {
    rawEvents(nanosSession(spark), dir, "events.parquet")
      .withWatermark("ts", "2 hours")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
  }

  /** Stream-stream interval join: each error event joined to the same
    * user's clicks from the preceding hour. Both sides are watermarked and
    * the join condition bounds event time in BOTH directions, so the state
    * store holds only one watermark-window of each side (the condition
    * Structured Streaming needs to ever evict stream-stream join state —
    * an unbounded-time join would grow state forever).
    */
  def clickErrorJoin(spark: SparkSession, dir: String): DataFrame = {
    val session = nanosSession(spark)
    def side(tpe: String, idAs: String, userAs: String, tsAs: String) =
      rawEvents(session, dir, "events.parquet")
        .filter(col("event_type") === tpe)
        .select(col("event_id").as(idAs), col("user_id").as(userAs),
          col("ts").as(tsAs))
        .withWatermark(tsAs, "2 hours")
    val clicks = side("click", "c_id", "c_user", "c_ts")
    val errors = side("error", "e_id", "e_user", "e_ts")
    errors.join(clicks,
      col("e_user") === col("c_user") &&
        col("e_ts") >= col("c_ts") &&
        col("e_ts") <= col("c_ts") + expr("INTERVAL 1 HOUR"))
      .select(col("e_id"), col("c_id"), col("e_user").as("user_id"),
        col("c_ts"), col("e_ts"))
  }

  /** Stream-stream LEFT OUTER interval join: every error emits exactly
    * once — matched errors with their click, unmatched errors with a NULL
    * click once the watermark passes their join window (the outer row
    * cannot emit earlier: a matching click might still arrive). Same
    * two-sided time bounds as [[clickErrorJoin]], so the state store
    * evicts both match state and outer-candidate state as the watermark
    * advances — the contract that keeps a left-outer stream join's state
    * bounded forever. Reads every `*.parquet` under `dir` so tests can
    * land late waves that advance the watermark.
    */
  def clickErrorLeftJoin(spark: SparkSession, dir: String): DataFrame = {
    val session = nanosSession(spark)
    def side(tpe: String, idAs: String, userAs: String, tsAs: String) =
      rawEvents(session, dir, "*.parquet")
        .filter(col("event_type") === tpe)
        .select(col("event_id").as(idAs), col("user_id").as(userAs),
          col("ts").as(tsAs))
        .withWatermark(tsAs, "2 hours")
    val clicks = side("click", "c_id", "c_user", "c_ts")
    val errors = side("error", "e_id", "e_user", "e_ts")
    errors.join(clicks,
      col("e_user") === col("c_user") &&
        col("e_ts") >= col("c_ts") &&
        col("e_ts") <= col("c_ts") + expr("INTERVAL 1 HOUR"),
      "left_outer")
      .select(col("e_id"), col("c_id"), col("e_user").as("user_id"),
        col("e_ts"))
  }
}
