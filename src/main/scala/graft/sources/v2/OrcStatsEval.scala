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
    // TIMESTAMP_NTZ filter literals: wall-clock-as-if-UTC micros, the
    // same internal convention Spark uses for the column values
    case t: java.time.LocalDateTime =>
      EpochMicros(t.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L +
        t.getNano / 1000)
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
      case Not(inner) =>
        eval(inner, stats) match {
          // every row satisfies inner ⇒ no row satisfies NOT(inner)
          case Some(true) => Some(false)
          // "no row matches inner" inverts to "every row matches
          // NOT(inner)" only under two-valued logic: a NULL input makes
          // inner evaluate to NULL, and NOT(NULL) is NULL — the row does
          // NOT match. Promote only when every referenced column is
          // provably null-free; otherwise stay unknown (mayMatch-based
          // pruning is unaffected — it only consumes Some(false) above).
          case Some(false) if inner.references.forall(c =>
            stats(c).exists(r => !r.hasNull)) => Some(true)
          case _ => None
        }
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

  // ---- manifest stat sidecars ----------------------------------------
  // A compact serialization of one file's footer statistics, captured at
  // WRITE time (the writer just produced the footer; reading it back is a
  // local-disk hit) and carried in the manifest entry line — so CBO
  // column stats / exact row counts on a 100k-file manifest table cost
  // ZERO footer round-trips at plan time. Format: 0x1e-separated
  // records of '|'-separated k=v fields; names and values are
  // base64(UTF-8)-armored, so no character of a column name or a string
  // min/max can ever break the framing. First record carries the row
  // count; one record per top-level column follows.
  //   r=<rows>
  //   c=<b64 name>|v=<nValues>|h=<0/1>|k=<d|s|b|e|u|x>[|a=<b64 min>][|z=<b64 max>]
  // Kinds: d decimal/numeric, s string, b boolean, e epoch-days,
  // u epoch-micros, x untracked (nested/binary — range unknown).

  private val B64 = java.util.Base64.getEncoder
  private val B64d = java.util.Base64.getDecoder
  private def b64(s: String): String =
    B64.encodeToString(s.getBytes("UTF-8"))
  private def unb64(s: String): String = new String(B64d.decode(s), "UTF-8")

  private def kindAndText(v: Any): Option[(String, String)] = v match {
    case n: BigDecimal => Some("d" -> n.bigDecimal.toString)
    case s: String => Some("s" -> s)
    case b: Boolean => Some("b" -> (if (b) "t" else "f"))
    case EpochDays(d) => Some("e" -> d.toString)
    case EpochMicros(us) => Some("u" -> us.toString)
    case _ => None
  }

  private def valueOf(kind: String, text: String): Any = kind match {
    case "d" => BigDecimal(new java.math.BigDecimal(text))
    case "s" => text
    case "b" => text == "t"
    case "e" => EpochDays(text.toLong)
    case "u" => EpochMicros(text.toLong)
  }

  /** Serialize the footer statistics of an open ORC reader (rows + every
    * top-level column) into a sidecar string; None when the file's root
    * is not a struct (nothing usable to carry).
    */
  def sidecarOf(r: org.apache.orc.Reader): Option[String] = {
    import scala.jdk.CollectionConverters._
    val root = r.getSchema
    if (root.getCategory !=
      org.apache.orc.TypeDescription.Category.STRUCT) return None
    val rows = r.getNumberOfRows
    val names = root.getFieldNames.asScala
    val kids = root.getChildren.asScala
    val stats = r.getStatistics
    val sb = new StringBuilder(s"r=$rows")
    names.zip(kids).foreach { case (name, kid) =>
      val cs = stats(kid.getId)
      sb.append('\u001e').append("c=").append(b64(name))
        .append("|v=").append(cs.getNumberOfValues)
      fromOrcStats(cs) match {
        case None => sb.append("|h=1|k=x")
        case Some(rg) =>
          sb.append("|h=").append(if (rg.hasNull) "1" else "0").append("|k=")
          val tagged = for {
            mn <- rg.min; mx <- rg.max
            (kMin, aTxt) <- kindAndText(mn)
            (kMax, zTxt) <- kindAndText(mx) if kMin == kMax
          } yield (kMin, aTxt, zTxt)
          tagged match {
            case Some((k, a, z)) =>
              sb.append(k).append("|a=").append(b64(a))
                .append("|z=").append(b64(z))
            case None =>
              // no range to carry: either genuinely no values, or a
              // value kind the codec does not tag. Distinguish — an
              // empty range with hasValues=false is EXACT (all-null
              // column), untracked is unknown.
              sb.append(if (rg.hasValues) "x" else "n")
          }
      }
    }
    Some(sb.toString)
  }

  /** Decode a sidecar: (rows, per-column (range, nValues) by lowercased
    * name). None when the string does not parse (treat as no sidecar —
    * the scan falls back to a real footer read, never fails).
    */
  def decodeSidecar(s: String):
      Option[(Long, Map[String, (Option[StatRange], Long)])] =
    try {
      val recs = s.split('\u001e')
      require(recs.nonEmpty && recs(0).startsWith("r="))
      val rows = recs(0).substring(2).toLong
      val cols = recs.iterator.drop(1).map { rec =>
        val kv = rec.split('|').iterator
          .map { f => val i = f.indexOf('='); f.substring(0, i) -> f.substring(i + 1) }
          .toMap
        val name = unb64(kv("c")).toLowerCase
        val nValues = kv("v").toLong
        val range: Option[StatRange] = kv("k") match {
          case "x" => None
          case "n" => Some(StatRange(None, None,
            hasNull = kv("h") == "1", hasValues = nValues > 0))
          case k => Some(StatRange(
            kv.get("a").map(a => valueOf(k, unb64(a))),
            kv.get("z").map(z => valueOf(k, unb64(z))),
            hasNull = kv("h") == "1", hasValues = nValues > 0))
        }
        name -> (range, nValues)
      }.toMap
      Some((rows, cols))
    } catch { case scala.util.control.NonFatal(_) => None }
}
