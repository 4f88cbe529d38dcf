package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

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
        // explicit when-arms (no otherwise): a NULL or out-of-domain
        // priority maps to a NULL channel and is filtered, exactly like
        // the oracle's UNION branches dropping rows outside their
        // IN-lists — parity no longer depends on the domain staying
        // exactly these five values
        val channel = when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"),
          "express")
          .when(col("o_orderpriority") === "3-MEDIUM", "standard")
          .when(col("o_orderpriority").isin("4-NOT SPECIFIED", "5-LOW"),
            "economy")
        Tables.lineitem(s, d)
          .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
          .filter(channel.isNotNull)
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
             |GROUP BY n_name ORDER BY n_name""".stripMargin)),

    // ---------------------------------------------------------------- q94
    // TPC-H q7 shape: bidirectional trade volume between two nations —
    // supplier nation on one side, customer nation on the other, keeping
    // the (A,B) and (B,A) pairs via a disjunctive pair predicate. The
    // nation filter lands on the DIMENSIONS before broadcast (2-row dims),
    // so the fact never carries non-participating nations through the
    // join; the disjunction runs on broadcast-joined columns, not as a
    // join condition (which would force a nested-loop).
    QueryDef("q94_nation_trade",
      (s, d) => {
        val pair = Seq("NATION_1", "NATION_2")
        val suppN = Tables.supplier(s, d)
          .join(broadcast(Tables.nation(s, d)
            .filter(col("n_name").isin(pair: _*))),
            col("s_nationkey") === col("n_nationkey"))
          .select(col("s_suppkey"), col("n_name").as("supp_nation"))
        val custN = Tables.customer(s, d)
          .join(broadcast(Tables.nation(s, d)
            .filter(col("n_name").isin(pair: _*))),
            col("c_nationkey") === col("n_nationkey"))
          .select(col("c_custkey"), col("n_name").as("cust_nation"))
        Tables.lineitem(s, d)
          .join(broadcast(suppN), col("l_suppkey") === col("s_suppkey"))
          .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(custN), col("o_custkey") === col("c_custkey"))
          .filter(col("supp_nation") =!= col("cust_nation"))
          .groupBy(col("supp_nation"), col("cust_nation"),
            year(col("l_shipdate")).cast("long").as("yr"))
          .agg(count(lit(1)).as("n_lines"), decToDouble(sum(revDec), "volume"))
          .orderBy(col("supp_nation"), col("cust_nation"), col("yr"))
      },
      Some(s"""SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
              |  year(l_shipdate) AS yr, count(*) AS n_lines,
              |  CAST(round(sum($oRev), 2) AS DOUBLE) AS volume
              |FROM lineitem
              |  JOIN supplier ON l_suppkey = s_suppkey
              |  JOIN nation sn ON s_nationkey = sn.n_nationkey
              |  JOIN orders ON l_orderkey = o_orderkey
              |  JOIN customer ON o_custkey = c_custkey
              |  JOIN nation cn ON c_nationkey = cn.n_nationkey
              |WHERE ((sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
              |    OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1'))
              |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin)),

    // ---------------------------------------------------------------- q95
    // TPC-DS q31 shape: share-of-total growth — per-REGION revenue share
    // compared across two consecutive years, keeping regions whose share
    // GREW. Exercises the 2-hop broadcast dimension chain (customer ->
    // nation -> region) and a share comparison computed join-free on the
    // tiny (region, year) aggregate: the per-year total is a window sum,
    // and the share-growth predicate is cross-multiplied
    // (rev2*tot1 > rev1*tot2) so no engine ever divides.
    QueryDef("q95_region_share_growth",
      (s, d) => {
        val geo = Tables.customer(s, d)
          .join(broadcast(Tables.nation(s, d)),
            col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(Tables.region(s, d)),
            col("n_regionkey") === col("r_regionkey"))
          .select(col("c_custkey"), col("r_name"))
        // geo carries customer — dimension-sized here but NOT broadcastable
        // at 100 TB; the join shuffles on custkey (AQE may still broadcast
        // small instances at runtime)
        val ry = Tables.lineitem(s, d)
          .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
          .join(geo, col("o_custkey") === col("c_custkey"))
          .groupBy(col("r_name"), year(col("l_shipdate")).cast("long").as("yr"))
          .agg(sum(revDec).as("r"))
        val w = Window.partitionBy(col("yr"))
        val cur = ry
          .withColumn("rev", round(col("r"), 2).cast("double"))
          .withColumn("tot", round(sum(col("r")).over(w), 2).cast("double"))
          .select(col("r_name"), col("yr"), col("rev"), col("tot"))
        val prev = cur.select(col("r_name").as("p_name"),
          (col("yr") + 1).as("p_yr"), col("rev").as("prev_rev"),
          col("tot").as("prev_tot"))
        cur.join(prev,
            col("r_name") === col("p_name") && col("yr") === col("p_yr"))
          .filter(col("rev") * col("prev_tot") >
            col("prev_rev") * col("tot"))
          .select(col("r_name"), col("yr"), col("rev"), col("prev_rev"))
          .orderBy(col("r_name"), col("yr"))
      },
      Some(s"""WITH ry AS (
              |  SELECT r_name, year(l_shipdate) AS yr, sum($oRev) AS r
              |  FROM lineitem
              |    JOIN orders ON l_orderkey = o_orderkey
              |    JOIN customer ON o_custkey = c_custkey
              |    JOIN nation ON c_nationkey = n_nationkey
              |    JOIN region ON n_regionkey = r_regionkey
              |  GROUP BY 1, 2),
              |cur AS (
              |  SELECT r_name, yr,
              |    CAST(round(r, 2) AS DOUBLE) AS rev,
              |    CAST(round(sum(r) OVER (PARTITION BY yr), 2) AS DOUBLE)
              |      AS tot
              |  FROM ry)
              |SELECT a.r_name, a.yr, a.rev, b.rev AS prev_rev
              |FROM cur a JOIN cur b
              |  ON a.r_name = b.r_name AND a.yr = b.yr + 1
              |WHERE a.rev * b.tot > b.rev * a.tot
              |ORDER BY a.r_name, a.yr""".stripMargin)),

    // ---------------------------------------------------------------- q96
    // Time-RANGE sliding window (TPC-DS q47 family, range variant): each
    // user's peak trailing-3-day event count. The rolling sum runs as a
    // RANGE BETWEEN frame over the PRE-AGGREGATED (user, day) frame —
    // events-per-user-day rows, not raw events — so the window state is
    // bounded by active days, never a raw-event self-join. count(*) is
    // cast to BIGINT inside the rolling sum on the oracle side (DuckDB
    // sums integers into HUGEINT).
    QueryDef("q96_rolling_3day_peak",
      (s, d) => {
        val byDay = Tables.events(s, d)
          .groupBy(col("user_id"),
            datediff(to_date(col("ts")), lit("1970-01-01")).cast("long")
              .as("epoch_day"))
          .agg(count(lit(1)).as("cnt"))
        val w = Window.partitionBy(col("user_id")).orderBy(col("epoch_day"))
          .rangeBetween(-2, 0)
        byDay.withColumn("rolling3", sum(col("cnt")).over(w))
          .groupBy(col("user_id"))
          .agg(max(col("rolling3")).as("peak_3day"))
          .orderBy(col("user_id"))
      },
      Some("""WITH by_day AS (
             |  SELECT user_id,
             |    datediff('day', DATE '1970-01-01', CAST(ts AS DATE))
             |      AS epoch_day,
             |    count(*) AS cnt
             |  FROM events GROUP BY 1, 2)
             |SELECT user_id, CAST(max(rolling3) AS BIGINT) AS peak_3day
             |FROM (
             |  SELECT user_id, CAST(sum(cnt) OVER (
             |      PARTITION BY user_id ORDER BY epoch_day
             |      RANGE BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT)
             |    AS rolling3
             |  FROM by_day) t
             |GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // ---------------------------------------------------------------- q97
    // TPC-DS q51 shape: two per-(brand, month) revenue series (urgent-
    // vs low-priority channels) FULL OUTER joined, cumulative sums run
    // AFTER the join over the unified month axis, keeping months where
    // the urgent cume leads. Everything past the fact aggregation — the
    // join, both windows, the filter — runs on the (brand, month) frame,
    // whose size is brands x months regardless of fact volume. Cumulative
    // sums accumulate in DECIMAL (exact, order-independent); only the
    // surfaced/compared values round to double.
    QueryDef("q97_cumulative_channel_lead",
      (s, d) => {
        def series(prio: String, revName: String) =
          Tables.lineitem(s, d)
            .join(Tables.orders(s, d).filter(col("o_orderpriority") === prio),
              col("l_orderkey") === col("o_orderkey"))
            .join(broadcast(Tables.part(s, d)),
              col("l_partkey") === col("p_partkey"))
            .groupBy(col("p_brand").as(s"${revName}_brand"),
              year(col("l_shipdate")).cast("long").as(s"${revName}_yr"),
              month(col("l_shipdate")).cast("long").as(s"${revName}_mo"))
            .agg(sum(revDec).as(revName))
        val u = series("1-URGENT", "u_rev")
        val l = series("5-LOW", "l_rev")
        val joined = u.join(l,
          col("u_rev_brand") === col("l_rev_brand") &&
            col("u_rev_yr") === col("l_rev_yr") &&
            col("u_rev_mo") === col("l_rev_mo"), "full_outer")
          .select(
            coalesce(col("u_rev_brand"), col("l_rev_brand")).as("brand"),
            coalesce(col("u_rev_yr"), col("l_rev_yr")).as("yr"),
            coalesce(col("u_rev_mo"), col("l_rev_mo")).as("mo"),
            coalesce(col("u_rev"), lit(0).cast(DecimalType30_8)).as("u_rev"),
            coalesce(col("l_rev"), lit(0).cast(DecimalType30_8)).as("l_rev"))
        val w = Window.partitionBy(col("brand"))
          .orderBy(col("yr"), col("mo"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        joined
          .withColumn("cum_u", round(sum(col("u_rev")).over(w), 2)
            .cast("double"))
          .withColumn("cum_l", round(sum(col("l_rev")).over(w), 2)
            .cast("double"))
          .filter(col("cum_u") > col("cum_l"))
          .groupBy(col("brand"))
          .agg(count(lit(1)).as("n_leading_months"),
            max(col("cum_u") - col("cum_l")).as("max_lead"))
          .orderBy(col("brand"))
      },
      Some(s"""WITH u AS (
              |  SELECT p_brand AS brand, year(l_shipdate) AS yr,
              |    month(l_shipdate) AS mo, sum($oRev) AS u_rev
              |  FROM lineitem
              |    JOIN orders ON l_orderkey = o_orderkey
              |    JOIN part ON l_partkey = p_partkey
              |  WHERE o_orderpriority = '1-URGENT'
              |  GROUP BY 1, 2, 3),
              |l AS (
              |  SELECT p_brand AS brand, year(l_shipdate) AS yr,
              |    month(l_shipdate) AS mo, sum($oRev) AS l_rev
              |  FROM lineitem
              |    JOIN orders ON l_orderkey = o_orderkey
              |    JOIN part ON l_partkey = p_partkey
              |  WHERE o_orderpriority = '5-LOW'
              |  GROUP BY 1, 2, 3),
              |joined AS (
              |  SELECT coalesce(u.brand, l.brand) AS brand,
              |    coalesce(u.yr, l.yr) AS yr, coalesce(u.mo, l.mo) AS mo,
              |    coalesce(u.u_rev, CAST(0 AS DECIMAL(30,8))) AS u_rev,
              |    coalesce(l.l_rev, CAST(0 AS DECIMAL(30,8))) AS l_rev
              |  FROM u FULL OUTER JOIN l
              |    ON u.brand = l.brand AND u.yr = l.yr AND u.mo = l.mo),
              |cum AS (
              |  SELECT brand, yr, mo,
              |    CAST(round(sum(u_rev) OVER (PARTITION BY brand
              |      ORDER BY yr, mo ROWS BETWEEN UNBOUNDED PRECEDING AND
              |      CURRENT ROW), 2) AS DOUBLE) AS cum_u,
              |    CAST(round(sum(l_rev) OVER (PARTITION BY brand
              |      ORDER BY yr, mo ROWS BETWEEN UNBOUNDED PRECEDING AND
              |      CURRENT ROW), 2) AS DOUBLE) AS cum_l
              |  FROM joined)
              |SELECT brand, count(*) AS n_leading_months,
              |  max(cum_u - cum_l) AS max_lead
              |FROM cum WHERE cum_u > cum_l
              |GROUP BY brand ORDER BY brand""".stripMargin)),

    // ---------------------------------------------------------------- q98
    // TPC-H q11 shape: group total vs a FRACTION of the global total —
    // nations whose supplier-side revenue exceeds 4% of worldwide
    // revenue. The oracle keeps the literal scalar subquery (a second
    // fact scan); the engine-smart form computes the global total as an
    // empty-partition window over the 25-row nation aggregate — zero
    // extra fact passes, and the window's "all rows in one partition"
    // cost is bounded by nation count forever. Both engines compare the
    // same rounded doubles times the same 0.04 literal.
    QueryDef("q98_nation_revenue_share",
      (s, d) => {
        val byNation = Tables.lineitem(s, d)
          .join(broadcast(Tables.supplier(s, d)),
            col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(Tables.nation(s, d)),
            col("s_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name"))
          .agg(sum(revDec).as("r"))
        val wAll = Window.partitionBy()
        byNation
          .withColumn("rev", round(col("r"), 2).cast("double"))
          .withColumn("global_rev",
            round(sum(col("r")).over(wAll), 2).cast("double"))
          .filter(col("rev") > lit(0.04) * col("global_rev"))
          .select(col("n_name"), col("rev"), col("global_rev"))
          .orderBy(col("n_name"))
      },
      Some(s"""WITH bn AS (
              |  SELECT n_name, sum($oRev) AS r
              |  FROM lineitem
              |    JOIN supplier ON l_suppkey = s_suppkey
              |    JOIN nation ON s_nationkey = n_nationkey
              |  GROUP BY 1),
              |tot AS (SELECT sum(r) AS g FROM bn)
              |SELECT n_name, CAST(round(r, 2) AS DOUBLE) AS rev,
              |  CAST(round(g, 2) AS DOUBLE) AS global_rev
              |FROM bn, tot
              |WHERE CAST(round(r, 2) AS DOUBLE)
              |  > 0.04 * CAST(round(g, 2) AS DOUBLE)
              |ORDER BY n_name""".stripMargin)),

    // ---------------------------------------------------------------- q99
    // TPC-DS q39 shape: coefficient-of-variation threshold + consecutive-
    // period self-join — suppliers whose monthly demand is erratic
    // (stdev/mean > 0.5763, splitting the fixture's 0.40-0.84 cv range
    // near its median) in TWO consecutive months. The statistical
    // aggregate uses exact DECIMAL power sums (n, Σq, Σq²) like q13 —
    // engine-native stddev would diverge on accumulation order — and the
    // cv > t predicate is cross-multiplied on the identical rounded
    // doubles: n·(n·s2 − s1²) > t²·(n−1)·s1² (both sides nonnegative
    // since n·s2 ≥ s1² by Cauchy-Schwarz). The month-pair self-join runs
    // on the pre-aggregated (supplier, month) frame.
    QueryDef("q99_volatile_supplier_pairs",
      (s, d) => {
        val qDec = col("l_quantity").cast(DecimalType(28, 6))
        val m = Tables.lineitem(s, d)
          .groupBy(col("l_suppkey"), month(col("l_shipdate")).cast("long").as("mo"))
          .agg(count(lit(1)).cast("double").as("n"),
            round(sum(qDec), 2).cast("double").as("s1"),
            round(sum((col("l_quantity") * col("l_quantity"))
              .cast(DecimalType(28, 6))), 2).cast("double").as("s2"))
        val hc = m.filter(col("n") > 1 &&
          col("n") * (col("n") * col("s2") - col("s1") * col("s1")) >
            lit(0.3321) * (col("n") - 1) * col("s1") * col("s1"))
          .select(col("l_suppkey"), col("mo"), col("n").cast("long").as("n"))
        val nxt = hc.select(col("l_suppkey").as("p_supp"),
          (col("mo") - 1).as("p_mo"), col("n").as("next_n"))
        hc.join(nxt,
            col("l_suppkey") === col("p_supp") && col("mo") === col("p_mo"))
          .select(col("l_suppkey"), col("mo"), col("n"), col("next_n"))
          .orderBy(col("l_suppkey"), col("mo"))
      },
      Some("""WITH m AS (
             |  SELECT l_suppkey, month(l_shipdate) AS mo,
             |    CAST(count(*) AS DOUBLE) AS n,
             |    CAST(round(sum(CAST(l_quantity AS DECIMAL(28,6))), 2)
             |      AS DOUBLE) AS s1,
             |    CAST(round(sum(CAST(l_quantity*l_quantity
             |      AS DECIMAL(28,6))), 2) AS DOUBLE) AS s2
             |  FROM lineitem GROUP BY 1, 2),
             |hc AS (
             |  SELECT l_suppkey, mo, CAST(n AS BIGINT) AS n FROM m
             |  WHERE n > 1 AND n*(n*s2 - s1*s1) > 0.3321*(n-1)*s1*s1)
             |SELECT a.l_suppkey, a.mo, a.n, b.n AS next_n
             |FROM hc a JOIN hc b
             |  ON a.l_suppkey = b.l_suppkey AND a.mo = b.mo - 1
             |ORDER BY a.l_suppkey, a.mo""".stripMargin))
  )

  private val DecimalType30_8 =
    org.apache.spark.sql.types.DecimalType(30, 8)
}
