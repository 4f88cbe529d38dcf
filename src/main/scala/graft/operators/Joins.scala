package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Join-shape helpers shared by the dedup/similarity operators. */
object Joins {

  /** Distributed AS-OF join: for every left row, attach the latest right
    * row with `right[rightTime] <= left[leftTime]` on the same key (LEFT
    * semantics — unmatched left rows keep null right columns).
    *
    * Shape: union both sides, one shuffle+sort on (key, time), and a
    * running `last(right, ignoreNulls)` window — rights sort before lefts
    * at equal timestamps so ties match. NO join explosion and no range
    * cross-product: cost is a single sort of |L|+|R| per key, the as-of
    * shape that survives 100 TB (a naive `l JOIN r ON key AND rt <= lt`
    * + max-aggregate explodes quadratically on hot keys).
    *
    * Non-key column names must be disjoint between the two sides. Ties
    * within the right side at the same (key, time) should be pre-deduped
    * by the caller if a deterministic representative matters.
    */
  def asOfJoin(left: DataFrame, right: DataFrame, key: String,
               leftTime: String, rightTime: String): DataFrame = {
    val lCols = left.columns.map(col).toSeq
    val rPayload = right.columns.filter(_ != key).map(col).toSeq
    val lType = left.select(struct(lCols: _*)).schema.head.dataType
    val rType = right.select(struct(rPayload: _*)).schema.head.dataType
    val lu = left.select(col(key).as("__k"),
      col(leftTime).cast("long").as("__t"), lit(1).as("__side"),
      struct(lCols: _*).as("__l"), lit(null).cast(rType).as("__r"))
    val ru = right.select(col(key).as("__k"),
      col(rightTime).cast("long").as("__t"), lit(0).as("__side"),
      lit(null).cast(lType).as("__l"), struct(rPayload: _*).as("__r"))
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lu.unionByName(ru)
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(col("__l.*") +: right.columns.filter(_ != key)
        .map(c => col(s"__m.$c").as(c)).toSeq: _*)
  }

  /** Size-gated broadcast: hint only while the lookup side fits the
    * session broadcast threshold (per its optimized-plan statistics);
    * larger tables fall back to a plain equi-join — never an OOM'd
    * broadcast at scale.
    */
  def sizeGatedBroadcast(df: DataFrame): DataFrame = {
    // Mirrors Spark's ConfigHelpers.byteFromString: "-1" (the standard
    // broadcast-disable value) must mean "never broadcast", not crash —
    // JavaUtils.byteStringAsBytes rejects a leading '-'.
    val raw = df.sparkSession.conf
      .get("spark.sql.autoBroadcastJoinThreshold", "10MB").trim
    val threshold =
      try {
        if (raw.startsWith("-"))
          -org.apache.spark.network.util.JavaUtils.byteStringAsBytes(raw.substring(1))
        else org.apache.spark.network.util.JavaUtils.byteStringAsBytes(raw)
      } catch {
        case e: NumberFormatException =>
          // fail safe (no broadcast) but never silently: a typo'd
          // threshold ("10MBB") would otherwise just degrade join perf
          org.slf4j.LoggerFactory.getLogger(getClass).warn(
            s"sizeGatedBroadcast: unparseable " +
              s"spark.sql.autoBroadcastJoinThreshold '$raw' " +
              s"(${e.getMessage}); treating as -1 (broadcast disabled)")
          -1L
      }
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    if (threshold > 0 && bytes <= threshold) broadcast(df) else df
  }
}
