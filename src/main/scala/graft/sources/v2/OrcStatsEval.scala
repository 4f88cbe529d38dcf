package graft.sources.v2

import org.apache.orc.{BooleanColumnStatistics, ColumnStatistics,
  DateColumnStatistics, DecimalColumnStatistics, DoubleColumnStatistics,
  IntegerColumnStatistics, StringColumnStatistics, TimestampColumnStatistics}
import org.apache.spark.sql.sources._

/** Conservative tri-state evaluation of data-source [[Filter]]s against
  * value ranges — the connector's analogue of the reference's stripe
  * statistics pruning (`stripes_pruned_statistics`, metrics.rs:85-92) and
  * per-file partition pruning (source.rs:171).
  *
  * `eval` returns:
  *  - `Some(false)` — provably NO row in the range matches (prune);
  *  - `Some(true)`  — provably EVERY row matches;
  *  - `None`        — unknown (keep).
  *
  * A hive-partition value is the degenerate range min==max, which makes the
  * same evaluator exact for partition pruning.
  */
object OrcStatsEval {

  /** Value range of one column over some row set. `min`/`max` are
    * normalized values (see [[norm]]); None when no non-null values exist
    * or the type is untracked.
    */
  case class StatRange(min: Option[Any], max: Option[Any],
                       hasNull: Boolean, hasValues: Boolean)

  /** Exact single-value range for a partition column value. */
  def valueRange(v: Any): StatRange =
    if (v == null) StatRange(None, None, hasNull = true, hasValues = false)
    else StatRange(Some(norm(v)), Some(norm(v)), hasNull = false, hasValues = true)

  /** Normalize values so heterogeneous numerics compare: every number →
    * BigDecimal, dates → epoch days (Long-tagged), timestamps → micros.
    */
  def norm(v: Any): Any = v match {
    case n: Byte => BigDecimal(n.toInt)
    case n: Short => BigDecimal(n.toInt)
    case n: Int => BigDecimal(n)
    case n: Long => BigDecimal(n)
    // NaN/±Infinity have no BigDecimal form; return them raw so cmp()
    // yields None and evaluation stays unknown (keep, never crash) —
    // Spark writes such values into double-typed hive partition dirs.
    case n: Float => if (java.lang.Float.isFinite(n)) BigDecimal.decimal(n) else n
    case n: Double => if (java.lang.Double.isFinite(n)) BigDecimal(n) else n
    case n: java.math.BigDecimal => BigDecimal(n)
    case n: BigDecimal => n
    case d: java.sql.Date => EpochDays(d.toLocalDate.toEpochDay)
    case d: java.time.LocalDate => EpochDays(d.toEpochDay)
    case t: java.sql.Timestamp => EpochMicros(t.getTime * 1000L + (t.getNanos / 1000) % 1000)
    case t: java.time.Instant =>
      EpochMicros(t.getEpochSecond * 1000000L + t.getNano / 1000)
    case other => other
  }

  case class EpochDays(days: Long)
  case class EpochMicros(us: Long)

  /** Total-order comparison of two normalized values; None if incomparable
    * (type mismatch → evaluation stays unknown, never wrong).
    */
  def cmp(a: Any, b: Any): Option[Int] = (a, b) match {
    case (x: BigDecimal, y: BigDecimal) => Some(x.compare(y))
    case (x: String, y: String) => Some(x.compareTo(y))
    case (x: Boolean, y: Boolean) => Some(java.lang.Boolean.compare(x, y))
    case (EpochDays(x), EpochDays(y)) => Some(java.lang.Long.compare(x, y))
    case (EpochMicros(x), EpochMicros(y)) => Some(java.lang.Long.compare(x, y))
    case _ => None
  }

  /** Tri-state filter evaluation over a per-column range lookup. */
  def eval(filter: Filter, stats: String => Option[StatRange]): Option[Boolean] = {
    def rng(c: String): Option[StatRange] = stats(c)

    filter match {
      case EqualTo(c, v) =>
        rng(c).flatMap { r =>
          if (!r.hasValues) Some(false)
          else {
            val nv = norm(v)
            (r.min.flatMap(cmp(nv, _)), r.max.flatMap(cmp(nv, _))) match {
              case (Some(cMin), Some(cMax)) =>
                if (cMin < 0 || cMax > 0) Some(false) // v outside [min,max]
                else if (cMin == 0 && cMax == 0 && !r.hasNull) Some(true)
                else None
              case _ => None
            }
          }
        }
      case EqualNullSafe(c, v) =>
        if (v == null) eval(IsNull(c), stats)
        else eval(EqualTo(c, v), stats)
      case GreaterThan(c, v) =>
        boundOp(c, v, stats, _ > 0)
      case GreaterThanOrEqual(c, v) =>
        boundOp(c, v, stats, _ >= 0)
      case LessThan(c, v) =>
        boundOp(c, v, stats, _ < 0)
      case LessThanOrEqual(c, v) =>
        boundOp(c, v, stats, _ <= 0)
      case In(c, vs) =>
        val parts = vs.toSeq.map(v => eval(EqualTo(c, v), stats))
        if (parts.forall(_.contains(false))) Some(false)
        else if (parts.exists(_.contains(true))) Some(true)
        else None
      case IsNull(c) =>
        rng(c).flatMap { r =>
          if (!r.hasNull) Some(false)
          else if (!r.hasValues) Some(true)
          else None
        }
      case IsNotNull(c) =>
        rng(c).flatMap { r =>
          if (!r.hasValues) Some(false)
          else if (!r.hasNull) Some(true)
          else None
        }
      case StringStartsWith(c, p) =>
        rng(c).flatMap { r =>
          if (!r.hasValues) Some(false)
          else (r.min, r.max) match {
            case (Some(mn: String), Some(mx: String)) =>
              val mnP = mn.substring(0, math.min(mn.length, p.length))
              val mxP = mx.substring(0, math.min(mx.length, p.length))
              if (mxP < p || mnP > p) Some(false)
              else if (mnP == p && mxP == p && mn.length >= p.length &&
                !r.hasNull) Some(true)
              else None
            case _ => None
          }
        }
      case And(l, rr) =>
        (eval(l, stats), eval(rr, stats)) match {
          case (Some(false), _) | (_, Some(false)) => Some(false)
          case (Some(true), Some(true)) => Some(true)
          case _ => None
        }
      case Or(l, rr) =>
        (eval(l, stats), eval(rr, stats)) match {
          case (Some(true), _) | (_, Some(true)) => Some(true)
          case (Some(false), Some(false)) => Some(false)
          case _ => None
        }
      case Not(inner) => eval(inner, stats).map(!_)
      case _ => None
    }
  }

  // comparison filters: `matches` maps cmp(rangeBound, v)'s sign to whether
  // that bound satisfies the op; monotonic ops need only the two bounds
  private def boundOp(c: String, v: Any, stats: String => Option[StatRange],
                      matches: Int => Boolean): Option[Boolean] =
    stats(c).flatMap { r =>
      if (!r.hasValues) return Some(false) // all null: comparisons never match
      val nv = norm(v)
      (r.min.flatMap(cmp(_, nv)), r.max.flatMap(cmp(_, nv))) match {
        case (Some(cMin), Some(cMax)) =>
          val loMatch = matches(cMin)
          val hiMatch = matches(cMax)
          if (!loMatch && !hiMatch) Some(false) // whole range on wrong side
          else if (loMatch && hiMatch && !r.hasNull) Some(true)
          else None
        case _ => None
      }
    }

  /** `true` when the filter might match some row in the range set. */
  def mayMatch(filter: Filter, stats: String => Option[StatRange]): Boolean =
    !eval(filter, stats).contains(false)

  /** Extract a [[StatRange]] from an ORC [[ColumnStatistics]]; None for
    * untracked/nested types (evaluation then stays unknown).
    */
  def fromOrcStats(cs: ColumnStatistics): Option[StatRange] = {
    val hasValues = cs.getNumberOfValues > 0
    def r(mn: Any, mx: Any): Option[StatRange] = Some(StatRange(
      Option(mn).filter(_ => hasValues).map(norm),
      Option(mx).filter(_ => hasValues).map(norm),
      cs.hasNull, hasValues))
    cs match {
      case s: IntegerColumnStatistics => r(s.getMinimum, s.getMaximum)
      case s: DoubleColumnStatistics => r(s.getMinimum, s.getMaximum)
      case s: StringColumnStatistics => r(s.getMinimum, s.getMaximum)
      case s: DecimalColumnStatistics =>
        r(Option(s.getMinimum).map(_.bigDecimalValue).orNull,
          Option(s.getMaximum).map(_.bigDecimalValue).orNull)
      case s: DateColumnStatistics =>
        Some(StatRange(
          Option(s.getMinimumDayOfEpoch).filter(_ => hasValues).map(EpochDays(_)),
          Option(s.getMaximumDayOfEpoch).filter(_ => hasValues).map(EpochDays(_)),
          cs.hasNull, hasValues))
      case s: TimestampColumnStatistics => r(s.getMinimum, s.getMaximum)
      case s: BooleanColumnStatistics =>
        Some(StatRange(
          if (hasValues) Some(s.getFalseCount == 0) else None,
          if (hasValues) Some(s.getTrueCount > 0) else None,
          cs.hasNull, hasValues))
      case _ => None
    }
  }
}
