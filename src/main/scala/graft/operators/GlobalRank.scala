package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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
  * SIZE GATE: the offsets machinery costs a constant ~1 s of extra jobs
  * (eager checkpoint, stats collect, broadcast) — pure overhead on a
  * dimension-sized frame, where one single-partition sort is the
  * cheapest exact plan there is. The gate is a LIMIT-bounded probe:
  * `df.limit(threshold + 1).localCheckpoint(true)` materializes at
  * most threshold+1 rows whatever the frame's true size. If the count
  * comes back at or below the threshold the probe IS the whole frame
  * and the window ntile runs straight over its checkpointed blocks —
  * the dimension case pays ONE execution plus a tiny bounded cache,
  * nothing else. Above the threshold the probe blocks are dropped and
  * the distributed path pins the full input and range-sorts it; that
  * fact case pays the probe as one extra (limit-bounded) pass — a
  * caller that KNOWS the frame is fact-sized passes
  * `windowBelowRows = 0` to skip it.
  *
  * Bucket assignment follows SQL NTILE exactly on both paths: with N
  * rows and n buckets, the first N mod n buckets carry N/n + 1 rows.
  * Ties across the order columns get arbitrary distinct ranks
  * (row_number semantics) — pass a TOTAL order for cross-engine
  * determinism.
  *
  * Lifetime: the checkpoints' executor blocks live until the returned
  * frame is garbage-collected (ContextCleaner); they register as
  * persistent RDDs, so a loop that cannot wait for GC can sweep them
  * via `sparkContext.getPersistentRDDs` (the bench does exactly that
  * after its timing loop).
  */
object GlobalRank {

  /** Frames at or below this row count take the plain window path —
    * 64k narrow rows sort in one task in milliseconds, far below the
    * distributed path's fixed job overhead.
    */
  val DefaultWindowBelowRows: Long = 1L << 16

  /** Append an exact global NTILE bucket column. `order` should be a
    * total order (append a key column to break ties deterministically).
    * The returned frame is backed by an eager local checkpoint of the
    * input; rank/bucket derivation on top is narrow (distributed path)
    * or a single small-frame window (gated path).
    */
  def ntile(df: DataFrame, n: Int, order: Seq[Column],
            out: String = "ntile",
            windowBelowRows: Long = DefaultWindowBelowRows): DataFrame = {
    require(n > 0, s"ntile bucket count must be positive, got $n")
    require(windowBelowRows < Int.MaxValue,
      s"windowBelowRows must fit an Int limit, got $windowBelowRows")
    val s = df.sparkSession
    if (windowBelowRows > 0) {
      // bounded probe: materialize AT MOST threshold+1 rows (LocalLimit
      // caps every partition before anything moves). If the frame is
      // small the probe IS the whole frame — the window runs straight
      // over its checkpointed blocks, so the gate costs ONE execution
      // and a <= threshold-row cache, never a second pass.
      val probe = df.limit(windowBelowRows.toInt + 1).localCheckpoint(true)
      if (probe.count() <= windowBelowRows)
        return probe.withColumn(out,
          org.apache.spark.sql.functions.ntile(n)
            .over(Window.orderBy(order: _*)))
      // fact-sized: the probe's bounded blocks are dead weight — drop
      // them (at the RDD layer: Dataset.unpersist does not reach a
      // localCheckpoint) and take the distributed path over the lineage
      graft.streaming.BatchFrames.dropLocalCheckpoint(probe)
    }

    // Pin the input ONCE: the range sampler, the shuffle and the stats
    // job all read the same materialized blocks instead of re-running
    // the (often aggregate) input lineage per consumer.
    val pinned = df.localCheckpoint(true)
    val parts = math.max(1, s.sparkContext.defaultParallelism)
    val ranged = pinned.repartitionByRange(parts, order: _*)
      .sortWithinPartitions(order: _*)
      .withColumn("__grk_pid", spark_partition_id())
      .withColumn("__grk_mid", monotonically_increasing_id())
      .localCheckpoint(true)
    // ranged's checkpoint truncates lineage, so pinned's full unsorted
    // copy is dead weight from here on — drop it rather than holding
    // TWO fact-sized copies in executor storage until GC
    graft.streaming.BatchFrames.dropLocalCheckpoint(pinned)
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
