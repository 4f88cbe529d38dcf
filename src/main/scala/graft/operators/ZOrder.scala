package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout — multi-column locality for
  * min/max stripe pruning. A table sorted by one column prunes scans on
  * THAT column only; interleaving the bits of several columns' positions
  * gives every interleaved column partially-disjoint per-stripe ranges,
  * so selective filters on ANY of them skip stripes (the same layout
  * trick Delta's OPTIMIZE ZORDER and ClickHouse's mortonEncode use; works
  * with the connector's A3/A12 stripe-statistics pruning as-is).
  *
  * At 100 TB this is a LAYOUT decision, not a query operator: run it at
  * write/compaction time. The z-value is a pure codegen'd expression
  * (shift/and/or chain — no UDF), the range partitioning is one shuffle,
  * and the only driver-side data is one (min, max) pair per column.
  */
object ZOrder {

  /** Bit-interleaved z-value of `cols`, each min/max normalized into
    * `bits`-bit rank space. Nulls map to rank 0 (sort first). Linear
    * normalization assumes roughly uniform value spread — heavy skew
    * wastes rank space but never affects correctness (pruning just
    * degrades toward the unsorted baseline).
    */
  def zvalue(cols: Seq[Column], mins: Seq[Double], maxs: Seq[Double],
             bits: Int = 16): Column = {
    val n = cols.size
    require(n >= 1, "zvalue needs at least one column")
    require(n * bits <= 62, s"n*bits = ${n * bits} exceeds a long's range")
    val top = (1L << bits) - 1
    val normalized = cols.zipWithIndex.map { case (c, i) =>
      val lo = mins(i)
      val hi = maxs(i)
      val scale = if (hi > lo) top.toDouble / (hi - lo) else 0.0
      coalesce(
        least(lit(top), greatest(lit(0L),
          ((c.cast("double") - lit(lo)) * lit(scale)).cast("long"))),
        lit(0L))
    }
    (for {
      b <- 0 until bits
      (v, i) <- normalized.zipWithIndex
    } yield shiftleft(shiftright(v, b).bitwiseAND(lit(1L)), b * n + i))
      .reduce(_.bitwiseOR(_))
  }

  /** Re-lay `df` along the z-curve of `zCols`: one tiny agg pass for the
    * per-column (min, max), one range shuffle on the z-value, an
    * intra-partition sort — then write the result with any sink and every
    * stripe/row-group carries tight min/max on ALL of `zCols`.
    */
  def zorderBy(df: DataFrame, zCols: Seq[String], partitions: Int,
               bits: Int = 16): DataFrame = {
    val aggs = zCols.flatMap(c =>
      Seq(min(col(c)).cast("double"), max(col(c)).cast("double")))
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    // empty frame or an entirely-null / non-castable column: there is no
    // range to interleave — return the input unchanged (a no-op layout)
    // rather than NPE-ing on the null aggregate
    if ((0 until 2 * zCols.size).exists(row.isNullAt)) return df
    val mins = zCols.indices.map(i => row.getDouble(2 * i))
    val maxs = zCols.indices.map(i => row.getDouble(2 * i + 1))
    val zcol = "__graft_zval"
    df.withColumn(zcol, zvalue(zCols.map(col), mins, maxs, bits))
      .repartitionByRange(partitions, col(zcol))
      .sortWithinPartitions(zcol)
      .drop(zcol)
  }
}
