package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Fourth wave of ported TPC-DS query *shapes* (q89-q93), closing the
  * family gaps the round-6 audit listed against the reference's q1-99
  * harness (`/root/reference/src/bin/tpcds_bench.rs:68-96`):
  * multi-channel UNION report over a shared CTE (TPC-DS q71/q76 triples),
  * the full 8-way count-bucket cross-join report (q88), three-way
  * INTERSECT set logic (q38), mutual-exclusion EXCEPT chain (q87 full
  * form), and a per-group quantile threshold (q6 family, quantile
  * variant).
  *
  * Oracle-parity conventions follow [[TpcdsShapes]] / [[QueryDef]]:
  * DECIMAL accumulation surfaced as DOUBLE via round-then-cast, BIGINT
  * counts, total ORDER BY. The q93 median is computed over INTEGER order
  * counts, so the interpolated 0.5-quantile is always x.0 or x.5 —
  * exactly representable, engine-deterministic (a quantile of a DOUBLE
  * measure would hit cross-engine interpolation rounding).
  */
object TpcdsShapes3 {
  import TpcdsShapes.{revDec, oRev, decToDouble}

  val defs: Seq[QueryDef] = Seq(

    // ---------------------------------------------------------------- q89
    // TPC-DS q71/q76 shape: three-channel UNION ALL report over ONE shared
    // fact CTE. The literal SQL tags three disjoint priority bands as
    // channels and re-aggregates their union (the oracle keeps that text);
    // the engine-smart form is a single fact pass — the channel tag is a
    // CASE over the same disjoint, exhaustive bands, so groupBy(channel)
    // over one scan is provably equal to the UNION of the three filtered
    // branches. At 100 TB: 1 fact scan + 1 shuffle vs the naive 3 scans.
    QueryDef("q89_channel_union_report",
      (s, d) => {
        val channel = when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"),
          "express")
          .when(col("o_orderpriority") === "3-MEDIUM", "standard")
          .otherwise("economy")
        Tables.lineitem(s, d)
          .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
          .groupBy(channel.as("channel"),
            year(col("l_shipdate")).cast("long").as("yr"))
          .agg(count(lit(1)).as("n_lines"),
            decToDouble(sum(revDec), "rev"))
          .orderBy(col("channel"), col("yr"))
      },
      Some(s"""WITH base AS (
              |  SELECT o_orderpriority AS pri, year(l_shipdate) AS yr,
              |    $oRev AS amt
              |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
              |SELECT channel, yr, count(*) AS n_lines,
              |  CAST(round(sum(amt), 2) AS DOUBLE) AS rev
              |FROM (
              |  SELECT 'express' AS channel, yr, amt FROM base
              |  WHERE pri IN ('1-URGENT', '2-HIGH')
              |  UNION ALL
              |  SELECT 'standard' AS channel, yr, amt FROM base
              |  WHERE pri = '3-MEDIUM'
              |  UNION ALL
              |  SELECT 'economy' AS channel, yr, amt FROM base
              |  WHERE pri IN ('4-NOT SPECIFIED', '5-LOW')
              |) u
              |GROUP BY channel, yr ORDER BY channel, yr""".stripMargin)),

    // ---------------------------------------------------------------- q90
    // TPC-DS q88 full form: the 8-way count-bucket report — eight
    // time-of-day counts presented as one row. The literal SQL cross-joins
    // eight single-row scalar subqueries (the oracle keeps that text —
    // eight fact scans); the engine-smart form is ONE events scan of eight
    // conditional counts, provably equal because each bucket count is
    // independent of the others. 1 scan vs 8 at 100 TB.
    QueryDef("q90_hour_bucket_report",
      (s, d) => {
        val buckets = (0 until 8).map(b =>
          count(when(col("h").between(b * 3, b * 3 + 2), 1))
            .as(s"h${b + 1}_n"))
        Tables.events(s, d).select(hour(col("ts")).as("h"))
          .agg(buckets.head, buckets.tail: _*)
      },
      Some {
        val subs = (0 until 8).map(b =>
          s"""  (SELECT count(*) AS n FROM events
             |   WHERE hour(ts) BETWEEN ${b * 3} AND ${b * 3 + 2}) h${b + 1}"""
            .stripMargin)
        val cols = (1 to 8).map(i => s"  h$i.n AS h${i}_n").mkString(",\n")
        s"SELECT\n$cols\nFROM\n" + subs.mkString(",\n")
      }),

    // ---------------------------------------------------------------- q91
    // TPC-DS q38 full form: three-way INTERSECT — customers present in ALL
    // three DISTINCT priority populations. The literal SQL chains two
    // INTERSECTs of SELECT DISTINCT sets (the oracle keeps that text —
    // three scans + two intersect shuffles); the engine-smart form is one
    // orders scan with three per-customer max-flags and a global
    // conditional count: membership in each set is a flag, INTERSECT is
    // flag conjunction. ONE shuffle on o_custkey at any scale.
    QueryDef("q91_triple_intersect",
      (s, d) => {
        Tables.orders(s, d)
          .filter(col("o_orderpriority").isin("1-URGENT", "3-MEDIUM", "5-LOW"))
          .groupBy(col("o_custkey"))
          .agg(
            max(when(col("o_orderpriority") === "1-URGENT", 1).otherwise(0))
              .as("u"),
            max(when(col("o_orderpriority") === "3-MEDIUM", 1).otherwise(0))
              .as("m"),
            max(when(col("o_orderpriority") === "5-LOW", 1).otherwise(0))
              .as("l"))
          .agg(count(when(col("u") === 1 && col("m") === 1 && col("l") === 1,
            1)).as("n_all_three"))
      },
      Some("""SELECT count(*) AS n_all_three FROM (
             |  SELECT DISTINCT o_custkey FROM orders
             |  WHERE o_orderpriority = '1-URGENT'
             |  INTERSECT
             |  SELECT DISTINCT o_custkey FROM orders
             |  WHERE o_orderpriority = '3-MEDIUM'
             |  INTERSECT
             |  SELECT DISTINCT o_custkey FROM orders
             |  WHERE o_orderpriority = '5-LOW'
             |) t""".stripMargin)),

    // ---------------------------------------------------------------- q92
    // TPC-DS q87 full form: mutual-exclusion EXCEPT chain — urgent-order
    // customers who never returned a line AND never placed a low-priority
    // order. The oracle keeps the literal A EXCEPT B EXCEPT C text; the
    // engine-smart form computes the priority memberships as max-flags in
    // the SAME orders pass (A and C share a scan) and removes the returner
    // set with one broadcast-able LEFT ANTI join against the DISTINCT
    // returned custkeys. Set subtraction never multiplies rows, so the
    // anti join is safe at any scale.
    QueryDef("q92_except_chain",
      (s, d) => {
        val returners = Tables.lineitem(s, d)
          .filter(col("l_returnflag") === "R")
          .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
          .select(col("o_custkey").as("r_custkey")).distinct()
        Tables.orders(s, d)
          .groupBy(col("o_custkey"))
          .agg(
            max(when(col("o_orderpriority") === "1-URGENT", 1).otherwise(0))
              .as("u"),
            max(when(col("o_orderpriority") === "5-LOW", 1).otherwise(0))
              .as("l"))
          .filter(col("u") === 1 && col("l") === 0)
          .join(returners, col("o_custkey") === col("r_custkey"), "left_anti")
          .agg(count(lit(1)).as("n_exclusive"))
      },
      Some("""SELECT count(*) AS n_exclusive FROM (
             |  SELECT DISTINCT o_custkey FROM orders
             |  WHERE o_orderpriority = '1-URGENT'
             |  EXCEPT
             |  SELECT DISTINCT o_custkey
             |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |  WHERE l_returnflag = 'R'
             |  EXCEPT
             |  SELECT DISTINCT o_custkey FROM orders
             |  WHERE o_orderpriority = '5-LOW'
             |) t""".stripMargin)),

    // ---------------------------------------------------------------- q93
    // TPC-DS q6 family, quantile variant: customers whose order count
    // exceeds their NATION's median order count, reported per nation. The
    // oracle computes the median with percentile_cont over the per-customer
    // counts; the engine-smart form never sorts raw counts per group —
    // it builds the (nation, n_orders) HISTOGRAM (tiny: nations x distinct
    // counts) and reads the interpolated median off the cumulative
    // histogram: rank r1=(N+1) div 2 and r2=N div 2 + 1 bracket the
    // 0.5-quantile, median=(v@r1+v@r2)/2. Exact percentile over a
    // billion-row group would buffer-sort the group; the histogram path is
    // one extra tiny aggregation and holds at any group size.
    QueryDef("q93_above_median_customers",
      (s, d) => {
        val oc = Tables.orders(s, d).groupBy(col("o_custkey"))
          .agg(count(lit(1)).as("n_orders"))
          .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
          .select(col("o_custkey"), col("c_nationkey"), col("n_orders"))
        val hist = oc.groupBy(col("c_nationkey"), col("n_orders"))
          .agg(count(lit(1)).as("cnt"))
        val wCum = Window.partitionBy(col("c_nationkey")).orderBy(col("n_orders"))
        val wAll = Window.partitionBy(col("c_nationkey"))
        val med = hist
          .withColumn("cum", sum(col("cnt")).over(wCum))
          .withColumn("total", sum(col("cnt")).over(wAll))
          .groupBy(col("c_nationkey"))
          .agg(
            // Column./ is DOUBLE division — cast back to long for the
            // integer ranks (floor is right: operands are positive)
            min(when(col("cum") >= ((col("total") + 1) / 2).cast("long"),
              col("n_orders"))).as("v1"),
            min(when(col("cum") >= (col("total") / 2).cast("long") + 1,
              col("n_orders"))).as("v2"))
          .select(col("c_nationkey"),
            ((col("v1") + col("v2")) / lit(2.0)).as("med"))
        oc.join(broadcast(med), Seq("c_nationkey"))
          .filter(col("n_orders") > col("med"))
          .join(broadcast(Tables.nation(s, d)),
            col("c_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name"))
          .agg(count(lit(1)).as("n_above"))
          .orderBy(col("n_name"))
      },
      Some("""WITH oc AS (
             |  SELECT o_custkey, c_nationkey, count(*) AS n_orders
             |  FROM orders JOIN customer ON o_custkey = c_custkey
             |  GROUP BY 1, 2),
             |med AS (
             |  SELECT c_nationkey,
             |    percentile_cont(0.5) WITHIN GROUP (ORDER BY n_orders) AS med
             |  FROM oc GROUP BY 1)
             |SELECT n_name, count(*) AS n_above
             |FROM oc JOIN med USING (c_nationkey)
             |  JOIN nation ON c_nationkey = n_nationkey
             |WHERE n_orders > med
             |GROUP BY n_name ORDER BY n_name""".stripMargin))
  )
}
