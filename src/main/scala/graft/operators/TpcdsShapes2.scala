package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** Second wave of ported TPC-DS query *shapes* (q76-q85), widening family
  * coverage of the reference's q1-99 harness
  * (`/root/reference/src/bin/tpcds_bench.rs:68-96`) beyond TpcdsShapes
  * (q45-q74). Families added here: returns-above-group-average with a
  * reused aggregate CTE (TPC-DS q1), several band aggregates off ONE fact
  * scan (q9/q28), fact-to-fact sold-then-returned chain (q25/q29),
  * order-size band histogram (q34/q73), month-over-month self-join on a
  * pre-aggregated series (q2/q59), channel-overlap distinct-customer
  * counts (q97), wide monthly conditional-agg pivot (q66), year-over-year
  * decline detection (q75), time-of-day ratio (q90), and
  * revenue-band customer histogram (q54).
  *
  * Oracle-parity conventions follow [[TpcdsShapes]] / [[QueryDef]]:
  * DECIMAL accumulation surfaced as DOUBLE via round-then-cast, BIGINT
  * counts (count(CASE ...) rather than sum(CASE ...) — DuckDB sums
  * integers into HUGEINT, which lands as float64 in the comparator),
  * ratios computed on identical already-rounded doubles on both sides,
  * total ORDER BY.
  */
object TpcdsShapes2 {
  import TpcdsShapes.{revDec, oRev, decToDouble}

  val defs: Seq[QueryDef] = Seq(

    // ---------------------------------------------------------------- q76
    // TPC-DS q1 shape: per-customer return revenue, kept when above 1.2x
    // the customer's NATION average. The per-nation average is a re-agg of
    // the per-customer aggregate (never a second fact scan), and joins
    // back broadcast (nation-count rows). At 100 TB: one shuffle on
    // c_custkey for the CTE; the threshold compare happens on the
    // already-aggregated frame. Both sides compare identical
    // rounded-decimal-to-double values, so the predicate is
    // engine-deterministic even at ties.
    QueryDef("q76_returns_above_avg",
      (s, d) => {
        val ctr = Tables.lineitem(s, d).filter(col("l_returnflag") === "R")
          .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(Tables.customer(s, d)),
            col("o_custkey") === col("c_custkey"))
          .groupBy(col("c_custkey"), col("c_nationkey"))
          .agg(sum(revDec).as("ret"))
        val na = ctr.groupBy(col("c_nationkey"))
          .agg(sum(col("ret")).as("s"), count(lit(1)).as("n"))
        ctr.join(broadcast(na), Seq("c_nationkey"))
          .filter(round(col("ret"), 2).cast("double") * col("n")
            > lit(1.2) * round(col("s"), 2).cast("double"))
          .select(col("c_custkey"), decToDouble(col("ret"), "ret_rev"))
          .orderBy(col("c_custkey"))
      },
      Some(s"""WITH ctr AS (
              |  SELECT c_custkey, c_nationkey, sum($oRev) AS ret
              |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
              |    JOIN customer ON o_custkey = c_custkey
              |  WHERE l_returnflag = 'R'
              |  GROUP BY 1, 2),
              |na AS (SELECT c_nationkey, sum(ret) AS s, count(*) AS n
              |       FROM ctr GROUP BY 1)
              |SELECT c_custkey, CAST(round(ret, 2) AS DOUBLE) AS ret_rev
              |FROM ctr JOIN na USING (c_nationkey)
              |WHERE CAST(round(ret, 2) AS DOUBLE) * n
              |  > 1.2 * CAST(round(s, 2) AS DOUBLE)
              |ORDER BY c_custkey""".stripMargin)),

    // ---------------------------------------------------------------- q77
    // TPC-DS q9/q28 shape: five quantity-band (count, revenue) pairs. The
    // literal SQL is five scalar subqueries — five fact scans (the oracle
    // keeps that text); the engine-smart form fuses them into ONE scan of
    // conditional aggregates (the sets partition on disjoint bands, so
    // the results are provably equal). At 100 TB that is 1 scan vs 5.
    QueryDef("q77_band_aggregates",
      (s, d) => {
        val priceDec = col("l_extendedprice").cast(DecimalType(18, 2))
        val bands = Seq((1, 10), (11, 20), (21, 30), (31, 40), (41, 50))
        val aggs = bands.zipWithIndex.flatMap { case ((lo, hi), i) =>
          val in = col("l_quantity").between(lo, hi)
          Seq(count(when(in, 1)).as(s"b${i + 1}_n"),
            decToDouble(sum(when(in, priceDec)), s"b${i + 1}_rev"))
        }
        Tables.lineitem(s, d).agg(aggs.head, aggs.tail: _*)
      },
      Some {
        val parts = Seq((1, 10), (11, 20), (21, 30), (31, 40), (41, 50))
          .zipWithIndex.map { case ((lo, hi), i) =>
            s"""  (SELECT count(*) FROM lineitem
               |   WHERE l_quantity BETWEEN $lo AND $hi) AS b${i + 1}_n,
               |  (SELECT CAST(round(sum(CAST(l_extendedprice
               |     AS DECIMAL(18,2))), 2) AS DOUBLE) FROM lineitem
               |   WHERE l_quantity BETWEEN $lo AND $hi) AS b${i + 1}_rev"""
              .stripMargin
          }
        "SELECT\n" + parts.mkString(",\n")
      }),

    // ---------------------------------------------------------------- q78
    // TPC-DS q25/q29 shape: fact-to-fact chain — a sold line (flag N)
    // matched to a returned line (flag R) of the SAME (order, part),
    // restricted to finalized orders, rolled up by brand. Both fact
    // instances shuffle on the same (l_orderkey, l_partkey) key, so the
    // self-join co-partitions; orders joins on the l_orderkey prefix and
    // part broadcasts.
    QueryDef("q78_sold_then_returned",
      (s, d) => {
        val li = Tables.lineitem(s, d)
        val qtyDec = (c: String) => col(c).cast(DecimalType(18, 2))
        val sales = li.filter(col("l_returnflag") === "N")
          .select(col("l_orderkey"), col("l_partkey"),
            col("l_quantity").as("s_qty"))
        val rets = li.filter(col("l_returnflag") === "R")
          .select(col("l_orderkey").as("r_orderkey"),
            col("l_partkey").as("r_partkey"),
            col("l_quantity").as("r_qty"))
        sales
          .join(rets, col("l_orderkey") === col("r_orderkey") &&
            col("l_partkey") === col("r_partkey"))
          .join(Tables.orders(s, d).filter(col("o_orderstatus") === "F"),
            col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(Tables.part(s, d)),
            col("l_partkey") === col("p_partkey"))
          .groupBy(col("p_brand"))
          .agg(count(lit(1)).as("n_pairs"),
            decToDouble(sum(qtyDec("s_qty")), "sold_qty"),
            decToDouble(sum(qtyDec("r_qty")), "returned_qty"))
          .orderBy(col("p_brand"))
      },
      Some("""SELECT p_brand, count(*) AS n_pairs,
             |  CAST(round(sum(CAST(s.l_quantity AS DECIMAL(18,2))), 2)
             |    AS DOUBLE) AS sold_qty,
             |  CAST(round(sum(CAST(r.l_quantity AS DECIMAL(18,2))), 2)
             |    AS DOUBLE) AS returned_qty
             |FROM lineitem s
             |JOIN lineitem r ON s.l_orderkey = r.l_orderkey
             |  AND s.l_partkey = r.l_partkey AND r.l_returnflag = 'R'
             |JOIN orders ON s.l_orderkey = o_orderkey
             |  AND o_orderstatus = 'F'
             |JOIN part ON s.l_partkey = p_partkey
             |WHERE s.l_returnflag = 'N'
             |GROUP BY p_brand ORDER BY p_brand""".stripMargin)),

    // ---------------------------------------------------------------- q79
    // TPC-DS q34/q73 shape: orders with 4-6 line items (a HAVING band on
    // a per-order count), joined back to the customer dimension and
    // histogrammed by segment. The band filter runs on the aggregated
    // per-order frame — orders-sized, not lineitem-sized — before any
    // dimension join.
    QueryDef("q79_order_size_bands",
      (s, d) => {
        val oc = Tables.lineitem(s, d).groupBy(col("l_orderkey"))
          .agg(count(lit(1)).as("n_items"))
          .filter(col("n_items").between(4, 6))
        oc.join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(Tables.customer(s, d)),
            col("o_custkey") === col("c_custkey"))
          .groupBy(col("c_mktsegment"), col("n_items"))
          .agg(count(lit(1)).as("n_orders"))
          .orderBy(col("c_mktsegment"), col("n_items"))
      },
      Some("""WITH oc AS (
             |  SELECT l_orderkey, count(*) AS n_items
             |  FROM lineitem GROUP BY 1)
             |SELECT c_mktsegment, n_items, count(*) AS n_orders
             |FROM oc JOIN orders ON l_orderkey = o_orderkey
             |  JOIN customer ON o_custkey = c_custkey
             |WHERE n_items BETWEEN 4 AND 6
             |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // ---------------------------------------------------------------- q80
    // TPC-DS q2/q59 shape: month-over-month comparison — revenue per
    // (year, month) self-joined against (year-1, month). The self-join
    // runs on the PRE-AGGREGATED series (months x years rows), so its
    // cost is independent of fact size; the ratio divides the same
    // rounded doubles on both engines.
    QueryDef("q80_month_over_month",
      (s, d) => {
        val rev = Tables.lineitem(s, d)
          .groupBy(year(col("l_shipdate")).cast("long").as("yr"),
            month(col("l_shipdate")).cast("long").as("mo"))
          .agg(sum(revDec).as("r"))
        val prev = rev.select((col("yr") + 1).as("p_yr"),
          col("mo").as("p_mo"), col("r").as("p_r"))
        rev.join(prev, col("yr") === col("p_yr") && col("mo") === col("p_mo"))
          .select(col("yr"), col("mo"),
            decToDouble(col("r"), "rev"),
            decToDouble(col("p_r"), "prev_rev"))
          .withColumn("ratio", col("rev") / col("prev_rev"))
          .orderBy(col("yr"), col("mo"))
      },
      Some(s"""WITH rev AS (
              |  SELECT year(l_shipdate) AS yr, month(l_shipdate) AS mo,
              |    sum($oRev) AS r
              |  FROM lineitem GROUP BY 1, 2)
              |SELECT a.yr, a.mo,
              |  CAST(round(a.r, 2) AS DOUBLE) AS rev,
              |  CAST(round(b.r, 2) AS DOUBLE) AS prev_rev,
              |  CAST(round(a.r, 2) AS DOUBLE) / CAST(round(b.r, 2) AS DOUBLE)
              |    AS ratio
              |FROM rev a JOIN rev b ON a.yr = b.yr + 1 AND a.mo = b.mo
              |ORDER BY a.yr, a.mo""".stripMargin)),

    // ---------------------------------------------------------------- q81
    // TPC-DS q97 shape: overlap of the URGENT-ordering and LOW-ordering
    // customer populations. The literal SQL FULL OUTER JOINs two DISTINCT
    // sets (the oracle keeps that text); the engine-smart form computes
    // both memberships in ONE orders scan — per-customer max-flags — so
    // there is no join at all, just a groupBy(custkey) and a global
    // conditional count. count(CASE), not sum(CASE): DuckDB sums
    // integers into HUGEINT.
    QueryDef("q81_channel_overlap",
      (s, d) => {
        Tables.orders(s, d)
          .filter(col("o_orderpriority").isin("1-URGENT", "5-LOW"))
          .groupBy(col("o_custkey"))
          .agg(
            max(when(col("o_orderpriority") === "1-URGENT", 1).otherwise(0))
              .as("u"),
            max(when(col("o_orderpriority") === "5-LOW", 1).otherwise(0))
              .as("l"))
          .agg(
            count(when(col("u") === 1 && col("l") === 1, 1)).as("n_both"),
            count(when(col("u") === 1 && col("l") === 0, 1))
              .as("n_urgent_only"),
            count(when(col("u") === 0 && col("l") === 1, 1))
              .as("n_low_only"))
      },
      Some("""WITH u AS (SELECT DISTINCT o_custkey AS k FROM orders
             |           WHERE o_orderpriority = '1-URGENT'),
             |     l AS (SELECT DISTINCT o_custkey AS k FROM orders
             |           WHERE o_orderpriority = '5-LOW')
             |SELECT
             |  count(CASE WHEN u.k IS NOT NULL AND l.k IS NOT NULL
             |    THEN 1 END) AS n_both,
             |  count(CASE WHEN u.k IS NOT NULL AND l.k IS NULL
             |    THEN 1 END) AS n_urgent_only,
             |  count(CASE WHEN u.k IS NULL AND l.k IS NOT NULL
             |    THEN 1 END) AS n_low_only
             |FROM u FULL OUTER JOIN l ON u.k = l.k""".stripMargin)),

    // ---------------------------------------------------------------- q82
    // TPC-DS q66 shape: wide monthly pivot — one row per supplier nation,
    // 12 monthly revenue columns. The fact pass aggregates ONE decimal sum
    // per (nation, month) — a single narrow buffer per group instead of 12
    // wide conditional DECIMAL(38,8) buffers per row — and the 12-way
    // conditional pivot then runs over the ~300-row aggregated frame
    // (nations x months), where its cost is irrelevant. Same single fact
    // shuffle, same 25 output rows; measured 7x cheaper cold than the
    // 12-wide-conditional-agg-over-the-fact form. Months with no sales
    // stay NULL on both engines (sum over an empty set).
    QueryDef("q82_monthly_nation_pivot",
      (s, d) => {
        val byMo = Tables.lineitem(s, d)
          .join(broadcast(Tables.supplier(s, d)),
            col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(Tables.nation(s, d)),
            col("s_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name"), month(col("l_shipdate")).as("mo"))
          .agg(sum(revDec).as("amt"))
        val monthCols = (1 to 12).map(m =>
          decToDouble(sum(when(col("mo") === m, col("amt"))), f"m$m%02d"))
        byMo.groupBy(col("n_name"))
          .agg(monthCols.head, monthCols.tail: _*)
          .orderBy(col("n_name"))
      },
      Some {
        val cols = (1 to 12).map(m =>
          s"""  CAST(round(sum(CASE WHEN month(l_shipdate) = $m
             |    THEN $oRev END), 2) AS DOUBLE) AS m${"%02d".format(m)}"""
            .stripMargin).mkString(",\n")
        s"""SELECT n_name,
           |$cols
           |FROM lineitem
           |  JOIN supplier ON l_suppkey = s_suppkey
           |  JOIN nation ON s_nationkey = n_nationkey
           |GROUP BY n_name ORDER BY n_name""".stripMargin
      }),

    // ---------------------------------------------------------------- q83
    // TPC-DS q75 shape: year-over-year decline report — per-brand yearly
    // (count, revenue) self-joined to the prior year, keeping brands
    // whose revenue DROPPED. Self-join on the aggregated (brand, year)
    // frame; the drop amount subtracts identical rounded doubles.
    QueryDef("q83_yoy_brand_decline",
      (s, d) => {
        val byYr = Tables.lineitem(s, d)
          .join(broadcast(Tables.part(s, d)),
            col("l_partkey") === col("p_partkey"))
          .groupBy(col("p_brand"),
            year(col("l_shipdate")).cast("long").as("yr"))
          .agg(count(lit(1)).as("n"), sum(revDec).as("rev"))
        val prev = byYr.select(col("p_brand").as("pb"),
          (col("yr") + 1).as("p_yr"), col("n").as("prev_n"),
          col("rev").as("prev_rev"))
        byYr.join(prev,
            col("p_brand") === col("pb") && col("yr") === col("p_yr"))
          .filter(round(col("rev"), 2).cast("double")
            < round(col("prev_rev"), 2).cast("double"))
          .select(col("p_brand"), col("yr"), col("n"), col("prev_n"),
            decToDouble(col("rev"), "rev"),
            decToDouble(col("prev_rev"), "prev_rev"))
          .withColumn("rev_drop", col("prev_rev") - col("rev"))
          .orderBy(col("p_brand"), col("yr"))
      },
      Some(s"""WITH byyr AS (
              |  SELECT p_brand, year(l_shipdate) AS yr, count(*) AS n,
              |    sum($oRev) AS rev
              |  FROM lineitem JOIN part ON l_partkey = p_partkey
              |  GROUP BY 1, 2)
              |SELECT a.p_brand, a.yr, a.n, b.n AS prev_n,
              |  CAST(round(a.rev, 2) AS DOUBLE) AS rev,
              |  CAST(round(b.rev, 2) AS DOUBLE) AS prev_rev,
              |  CAST(round(b.rev, 2) AS DOUBLE)
              |    - CAST(round(a.rev, 2) AS DOUBLE) AS rev_drop
              |FROM byyr a JOIN byyr b
              |  ON a.p_brand = b.p_brand AND a.yr = b.yr + 1
              |WHERE CAST(round(a.rev, 2) AS DOUBLE)
              |  < CAST(round(b.rev, 2) AS DOUBLE)
              |ORDER BY a.p_brand, a.yr""".stripMargin)),

    // ---------------------------------------------------------------- q84
    // TPC-DS q90 shape: time-of-day activity ratio — morning vs evening
    // event counts per type from one scan of conditional counts; the
    // ratio guards a zero denominator with NULL on both engines.
    QueryDef("q84_ampm_ratio",
      (s, d) => {
        Tables.events(s, d)
          .select(col("event_type"), hour(col("ts")).as("h"))
          .groupBy(col("event_type"))
          .agg(count(when(col("h").between(6, 11), 1)).as("n_am"),
            count(when(col("h").between(18, 23), 1)).as("n_pm"))
          .withColumn("am_pm_ratio",
            when(col("n_pm") =!= 0,
              col("n_am").cast("double") / col("n_pm").cast("double")))
          .orderBy(col("event_type"))
      },
      Some("""SELECT event_type,
             |  count(CASE WHEN hour(ts) BETWEEN 6 AND 11 THEN 1 END) AS n_am,
             |  count(CASE WHEN hour(ts) BETWEEN 18 AND 23 THEN 1 END) AS n_pm,
             |  CASE WHEN count(CASE WHEN hour(ts) BETWEEN 18 AND 23
             |      THEN 1 END) <> 0
             |    THEN CAST(count(CASE WHEN hour(ts) BETWEEN 6 AND 11
             |        THEN 1 END) AS DOUBLE)
             |      / CAST(count(CASE WHEN hour(ts) BETWEEN 18 AND 23
             |        THEN 1 END) AS DOUBLE)
             |  END AS am_pm_ratio
             |FROM events GROUP BY event_type
             |ORDER BY event_type""".stripMargin)),

    // ---------------------------------------------------------------- q85
    // TPC-DS q54 shape: customer revenue-band histogram — an aggregate of
    // an aggregate. Per-customer revenue (fact shuffle on custkey) is
    // bucketed into fixed-width bands and counted; the band floor()
    // divides the same rounded double on both engines.
    QueryDef("q85_revenue_band_histogram",
      (s, d) => {
        Tables.lineitem(s, d)
          .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("o_custkey"))
          .agg(sum(revDec).as("rev"))
          .select(floor(round(col("rev"), 2).cast("double") / lit(50000.0))
            .as("band"))
          .groupBy(col("band"))
          .agg(count(lit(1)).as("n_customers"))
          .orderBy(col("band"))
      },
      Some(s"""WITH pc AS (
              |  SELECT o_custkey, sum($oRev) AS rev
              |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
              |  GROUP BY 1)
              |SELECT CAST(floor(CAST(round(rev, 2) AS DOUBLE) / 50000.0)
              |    AS BIGINT) AS band,
              |  count(*) AS n_customers
              |FROM pc GROUP BY 1 ORDER BY 1""".stripMargin)),

    // ---------------------------------------------------------------- q86
    // TPC-DS q47/q57 shape: windowed deviation-from-year-average with
    // lag/lead context — monthly brand revenue, kept when it deviates
    // >10% from that brand-year's average, reported with its neighbor
    // months. Both windows run over the PRE-AGGREGATED (brand, yr, mo)
    // frame. The deviation predicate is cross-multiplied
    // (|rev*cnt - yr_sum| > 0.1*yr_sum) so no engine ever divides: every
    // operand is the same rounded-decimal double on both sides.
    QueryDef("q86_window_lag_deviation",
      (s, d) => {
        val m = Tables.lineitem(s, d)
          .join(broadcast(Tables.part(s, d)),
            col("l_partkey") === col("p_partkey"))
          .groupBy(col("p_brand"),
            year(col("l_shipdate")).cast("long").as("yr"),
            month(col("l_shipdate")).cast("long").as("mo"))
          .agg(sum(revDec).as("r"))
        val wYr = Window.partitionBy(col("p_brand"), col("yr"))
        val wSeq = Window.partitionBy(col("p_brand"))
          .orderBy(col("yr"), col("mo"))
        val revD = round(col("r"), 2).cast("double")
        m.withColumn("rev", revD)
          .withColumn("yr_sum_d",
            round(sum(col("r")).over(wYr), 2).cast("double"))
          .withColumn("yr_cnt", count(lit(1)).over(wYr))
          .withColumn("prev_rev", lag(revD, 1).over(wSeq))
          .withColumn("next_rev", lead(revD, 1).over(wSeq))
          .filter(abs(col("rev") * col("yr_cnt") - col("yr_sum_d"))
            > lit(0.1) * col("yr_sum_d"))
          .select(col("p_brand"), col("yr"), col("mo"), col("rev"),
            col("prev_rev"), col("next_rev"))
          .orderBy(col("p_brand"), col("yr"), col("mo"))
      },
      Some(s"""WITH m AS (
              |  SELECT p_brand, year(l_shipdate) AS yr,
              |    month(l_shipdate) AS mo, sum($oRev) AS r
              |  FROM lineitem JOIN part ON l_partkey = p_partkey
              |  GROUP BY 1, 2, 3),
              |w AS (
              |  SELECT p_brand, yr, mo,
              |    CAST(round(r, 2) AS DOUBLE) AS rev,
              |    CAST(round(sum(r) OVER (PARTITION BY p_brand, yr), 2)
              |      AS DOUBLE) AS yr_sum_d,
              |    count(*) OVER (PARTITION BY p_brand, yr) AS yr_cnt,
              |    lag(CAST(round(r, 2) AS DOUBLE), 1)
              |      OVER (PARTITION BY p_brand ORDER BY yr, mo) AS prev_rev,
              |    lead(CAST(round(r, 2) AS DOUBLE), 1)
              |      OVER (PARTITION BY p_brand ORDER BY yr, mo) AS next_rev
              |  FROM m)
              |SELECT p_brand, yr, mo, rev, prev_rev, next_rev
              |FROM w
              |WHERE abs(rev * yr_cnt - yr_sum_d) > 0.1 * yr_sum_d
              |ORDER BY p_brand, yr, mo""".stripMargin)),

    // ---------------------------------------------------------------- q87
    // TPC-DS q78 shape: sold-without-return share per part type — sales
    // lines LEFT joined to the DISTINCT returned (order, part) keys, the
    // null-extended rows being the unreturned sales, both totals from one
    // conditional-agg pass. The distinct collapses the return side BEFORE
    // the join (no row multiplication); both fact sides shuffle on the
    // same (orderkey, partkey) key.
    QueryDef("q87_unreturned_share",
      (s, d) => {
        val li = Tables.lineitem(s, d)
        val rets = li.filter(col("l_returnflag") === "R")
          .select(col("l_orderkey").as("r_ok"), col("l_partkey").as("r_pk"))
          .distinct()
        li.filter(col("l_returnflag") === "N")
          .join(rets, col("l_orderkey") === col("r_ok") &&
            col("l_partkey") === col("r_pk"), "left")
          .join(broadcast(Tables.part(s, d)),
            col("l_partkey") === col("p_partkey"))
          .groupBy(col("p_type"))
          .agg(decToDouble(sum(revDec), "total_rev"),
            decToDouble(sum(when(col("r_ok").isNull, revDec)
              .otherwise(lit(0).cast(DecimalType(30, 8)))), "unret_rev"))
          .withColumn("unret_share", col("unret_rev") / col("total_rev"))
          .orderBy(col("p_type"))
      },
      Some(s"""SELECT p_type,
              |  CAST(round(sum($oRev), 2) AS DOUBLE) AS total_rev,
              |  CAST(round(sum(CASE WHEN r.r_ok IS NULL THEN $oRev
              |    ELSE CAST(0 AS DECIMAL(30,8)) END), 2) AS DOUBLE)
              |    AS unret_rev,
              |  CAST(round(sum(CASE WHEN r.r_ok IS NULL THEN $oRev
              |    ELSE CAST(0 AS DECIMAL(30,8)) END), 2) AS DOUBLE)
              |    / CAST(round(sum($oRev), 2) AS DOUBLE) AS unret_share
              |FROM lineitem s
              |LEFT JOIN (SELECT DISTINCT l_orderkey AS r_ok,
              |    l_partkey AS r_pk
              |  FROM lineitem WHERE l_returnflag = 'R') r
              |  ON s.l_orderkey = r.r_ok AND s.l_partkey = r.r_pk
              |JOIN part ON s.l_partkey = p_partkey
              |WHERE s.l_returnflag = 'N'
              |GROUP BY p_type ORDER BY p_type""".stripMargin)),

    // ---------------------------------------------------------------- q88
    // TPC-DS q64 shape: multi-round fact chain — (customer, part) pairs
    // bought in consecutive years. The literal SQL self-joins the (cust,
    // part, year) aggregate with its year-shifted twin (the oracle keeps
    // that text; two fact passes — Spark's exchange reuse does not unify
    // the twins because the shifted side canonicalizes differently). The
    // engine-smart form is a lag() window over the aggregate partitioned
    // by (cust, part): the immediately preceding year IS the yr-1 match
    // of the unique-keyed self-join, so the results are provably equal —
    // ONE fact shuffle plus a window over the aggregated frame.
    QueryDef("q88_repeat_buyers",
      (s, d) => {
        val cp = Tables.lineitem(s, d)
          .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("o_custkey"), col("l_partkey"),
            year(col("o_orderdate")).cast("long").as("yr"))
          .agg(sum(revDec).as("rev"))
        val w = Window.partitionBy(col("o_custkey"), col("l_partkey"))
          .orderBy(col("yr"))
        cp.withColumn("prev_rev", lag(col("rev"), 1).over(w))
          .withColumn("prev_yr", lag(col("yr"), 1).over(w))
          .filter(col("yr") === col("prev_yr") + 1)
          .groupBy(col("yr"))
          .agg(count(lit(1)).as("n_repeat_pairs"),
            decToDouble(sum(col("rev")), "repeat_rev"),
            decToDouble(sum(col("prev_rev")), "prior_rev"))
          .orderBy(col("yr"))
      },
      Some(s"""WITH cp AS (
              |  SELECT o_custkey, l_partkey, year(o_orderdate) AS yr,
              |    sum($oRev) AS rev
              |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
              |  GROUP BY 1, 2, 3)
              |SELECT a.yr, count(*) AS n_repeat_pairs,
              |  CAST(round(sum(a.rev), 2) AS DOUBLE) AS repeat_rev,
              |  CAST(round(sum(b.rev), 2) AS DOUBLE) AS prior_rev
              |FROM cp a JOIN cp b
              |  ON a.o_custkey = b.o_custkey AND a.l_partkey = b.l_partkey
              |  AND a.yr = b.yr + 1
              |GROUP BY a.yr ORDER BY a.yr""".stripMargin))
  )
}
