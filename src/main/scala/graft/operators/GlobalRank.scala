package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact GLOBAL ranking without a single-partition window.
  *
  * `ntile(4) OVER (ORDER BY ...)` plans a one-partition sort of every
  * row — fine while the input is a dimension-sized aggregate (the q74
  * posture), a driver-shaped bottleneck the moment the ranked frame
  * grows fact-like. This operator computes the SAME result with three
  * scalable pieces:
  *
  *  1. `repartitionByRange` + `sortWithinPartitions` on the order
  *     columns — a parallel total sort (the Spark-native TeraSort
  *     shape);
  *  2. one driver-bounded collect of PER-PARTITION (count, min id)
  *     pairs — P rows, never data;
  *  3. a broadcast join of per-partition rank OFFSETS back onto the
  *     sorted rows: global rank = offset + local index, all narrow.
  *
  * The sorted frame is pinned with an eager `localCheckpoint`: the
  * range partitioner samples its boundaries, so the offsets collect
  * and the ranked output MUST see one materialized partitioning, not
  * two independent executions of the same lineage.
  *
  * Bucket assignment follows SQL NTILE exactly: with N rows and n
  * buckets, the first N mod n buckets carry N/n + 1 rows. Ties across
  * the order columns get arbitrary distinct ranks (row_number
  * semantics) — pass a TOTAL order for cross-engine determinism.
  *
  * Lifetime: the checkpoint's executor blocks live until the returned
  * frame is garbage-collected (ContextCleaner); they register as
  * persistent RDDs, so a loop that cannot wait for GC can sweep them
  * via `sparkContext.getPersistentRDDs` (the bench does exactly that
  * after its timing loop).
  */
object GlobalRank {

  /** Append an exact global NTILE bucket column. `order` should be a
    * total order (append a key column to break ties deterministically).
    * The returned frame is backed by an eager local checkpoint of the
    * range-sorted input; rank/bucket derivation on top is narrow.
    */
  def ntile(df: DataFrame, n: Int, order: Seq[Column],
            out: String = "ntile"): DataFrame = {
    require(n > 0, s"ntile bucket count must be positive, got $n")
    val s = df.sparkSession
    val parts = math.max(1, s.sparkContext.defaultParallelism)
    val ranged = df.repartitionByRange(parts, order: _*)
      .sortWithinPartitions(order: _*)
      .withColumn("__grk_pid", spark_partition_id())
      .withColumn("__grk_mid", monotonically_increasing_id())
      .localCheckpoint(true)
    // P (partition count) rows to the driver — counts and the partition-
    // local id base (min of the monotonic id, so no bit-layout
    // assumption about monotonically_increasing_id's encoding)
    val stats = ranged.groupBy(col("__grk_pid"))
      .agg(count(lit(1)).as("c"), min(col("__grk_mid")).as("m"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    val total = stats.map(_._2).sum
    val offsets = stats.map(_._2).scanLeft(0L)(_ + _).init
    val offRows = stats.zip(offsets).map { case ((pid, _, m), off) =>
      (pid, m, off)
    }
    import s.implicits._
    val offDf = offRows.toSeq.toDF("__grk_pid", "__grk_base", "__grk_off")
    // global 1-based rank in `order`: partition offset + local index
    val rank = col("__grk_off") +
      (col("__grk_mid") - col("__grk_base")) + lit(1L)
    // SQL NTILE: q = N/n rows per bucket, the first r = N%n buckets
    // carry one extra; q == 0 (fewer rows than buckets) degenerates to
    // bucket = rank, which the same formula yields through the cut
    val q = total / n
    val r = total % n
    val cut = (q + 1L) * r
    val bucket =
      if (q == 0L) rank
      else when(rank <= cut, (rank - 1L) / (q + 1L) + 1L)
        .otherwise(lit(r) + (rank - cut - 1L) / q + 1L)
    ranged.join(broadcast(offDf), Seq("__grk_pid"))
      .withColumn(out, bucket.cast("int"))
      .drop("__grk_pid", "__grk_mid", "__grk_base", "__grk_off")
  }
}
