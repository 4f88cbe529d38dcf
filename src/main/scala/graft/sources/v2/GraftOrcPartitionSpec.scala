package graft.sources.v2

import org.apache.spark.sql.catalyst.CatalystTypeConverters
import org.apache.spark.sql.catalyst.expressions.Murmur3HashFunction
import org.apache.spark.sql.connector.expressions.{Expressions, Transform}
import org.apache.spark.sql.sources.{And => FAnd, EqualNullSafe, EqualTo, Filter, In, IsNotNull, IsNull, Not => FNot, Or => FOr}
import org.apache.spark.sql.types._

/** One field of a table's partition spec: a SOURCE column plus a
  * transform. `transform` is one of `identity`, `day`, `month`, `year`,
  * `hour`, `bucket`, `trunc`; `param` is the bucket count / truncate
  * width (0 otherwise).
  *
  * Identity fields behave exactly like the connector's classic hive
  * partitioning: the source column moves into the path and out of the
  * data files. Transform fields are HIDDEN partitioning (the Iceberg
  * model; reference tables are directory-partitioned only —
  * /root/reference/src/opener.rs:59 materializes raw `k=v` fields): the
  * path carries a DERIVED directory (`ts_day=2020-01-15`,
  * `id_bucket=3`, `name_trunc=abc`) while the source column stays in
  * the data files — so queries filter on the SOURCE column and the
  * scan prunes whole partition directories without the user ever
  * naming, or even knowing about, the layout. At 100 TB this is the
  * difference between "every analyst must remember to add
  * `AND dt = date(ts)`" and pruning that cannot be forgotten.
  */
case class PartField(source: String, transform: String, param: Int = 0) {
  def isIdentity: Boolean = transform == "identity"

  /** The `k` of the hive `k=v` path segment. */
  def dirName: String =
    if (isIdentity) source else s"${source}_$transform"

  /** Comma-free persisted form (rides [[GraftOrcManifest.TableMeta]]'s
    * comma-joined `parts` field): bare name = identity (backward
    * compatible with every pre-spec manifest), `src:day`,
    * `src:bucket:16`, `src:trunc:4`.
    */
  def canonical: String = transform match {
    case "identity" => source
    case "bucket" | "trunc" => s"$source:$transform:$param"
    case t => s"$source:$t"
  }

  /** Human/SQL form (error messages, DESCRIBE). */
  def describe: String = transform match {
    case "identity" => source
    case "bucket" => s"bucket($param, $source)"
    case "trunc" => s"truncate($param, $source)"
    case "day" => s"days($source)"
    case "month" => s"months($source)"
    case "year" => s"years($source)"
    case "hour" => s"hours($source)"
  }
}

object GraftOrcPartitionSpec {

  /** Murmur3 seed — Spark's own `hash()` default, so
    * `graft_bucket`-style external recomputation stays possible.
    */
  val Seed = 42L

  private val TimeTransforms = Set("day", "month", "year", "hour")
  private val AllTransforms = TimeTransforms ++ Set("bucket", "trunc")

  // ---- parsing --------------------------------------------------------

  /** Parse persisted canonical forms (manifest `parts`). Bare names are
    * identity — every pre-spec manifest parses unchanged.
    */
  def parseCanonical(parts: Seq[String]): Seq[PartField] = parts.map { p =>
    p.split(':') match {
      case Array(src) => PartField(src, "identity")
      case Array(src, t) if TimeTransforms(t) => PartField(src, t)
      case Array(src, t, n) if t == "bucket" || t == "trunc" =>
        PartField(src, t, n.toInt)
      case _ => throw new IllegalArgumentException(
        s"graft-orc: unparseable partition spec entry '$p'")
    }
  }

  /** Parse the user-facing `graft.partition_spec` option:
    * `"days(ts), bucket(16, id), truncate(4, name), category"`.
    * Accepted transform names mirror Spark SQL's PARTITIONED BY
    * vocabulary (`years/months/days/hours`, singular also accepted,
    * `date` = days, `bucket(n, col)`, `truncate(w, col)` /
    * `trunc(w, col)`); a bare column name is identity.
    */
  def parseOption(s: String): Seq[PartField] = {
    // split on top-level commas only (bucket(16, id) has an inner one)
    val items = collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var depth = 0
    s.foreach {
      case '(' => depth += 1; cur += '('
      case ')' => depth -= 1; cur += ')'
      case ',' if depth == 0 => items += cur.result(); cur.clear()
      case c => cur += c
    }
    items += cur.result()
    require(depth == 0,
      s"graft-orc: unbalanced parentheses in partition spec '$s'")
    val Call = """(\w+)\s*\(\s*([^()]*)\s*\)""".r
    items.map(_.trim).filter(_.nonEmpty).map {
      case Call(fn, args) =>
        val as = args.split(',').map(_.trim).filter(_.nonEmpty).toSeq
        fn.toLowerCase(java.util.Locale.ROOT) match {
          case "year" | "years" => one(fn, as, PartField(_, "year"))
          case "month" | "months" => one(fn, as, PartField(_, "month"))
          case "day" | "days" | "date" => one(fn, as, PartField(_, "day"))
          case "hour" | "hours" => one(fn, as, PartField(_, "hour"))
          case "bucket" => two(fn, as, (n, c) => PartField(c, "bucket", n))
          case "truncate" | "trunc" =>
            two(fn, as, (w, c) => PartField(c, "trunc", w))
          case other => throw new IllegalArgumentException(
            s"graft-orc: unknown partition transform '$other' — " +
              "supported: years, months, days, hours, bucket(n, col), " +
              "truncate(w, col), or a bare column name (identity)")
        }
      case bare =>
        require(bare.matches("""[\w.]+"""),
          s"graft-orc: unparseable partition spec entry '$bare'")
        PartField(bare, "identity")
    }.toSeq
  }

  private def one(fn: String, as: Seq[String],
                  mk: String => PartField): PartField = {
    require(as.length == 1,
      s"graft-orc: $fn(...) takes exactly one column, got ${as.length}")
    mk(as.head)
  }

  private def two(fn: String, as: Seq[String],
                  mk: (Int, String) => PartField): PartField = {
    require(as.length == 2,
      s"graft-orc: $fn(...) takes (n, column), got ${as.length} args")
    // accept both (n, col) and (col, n) — Iceberg SQL uses the former,
    // some engines the latter; the int operand is unambiguous
    val (numS, colS) =
      if (as.head.matches("""\d+""")) (as.head, as(1)) else (as(1), as.head)
    require(numS.matches("""\d+"""),
      s"graft-orc: $fn(...) needs an integer operand in (${as.mkString(", ")})")
    val n = numS.toInt
    require(n > 0, s"graft-orc: $fn(...) operand must be positive, got $n")
    mk(n, colS)
  }

  def hasTransforms(parts: Seq[String]): Boolean =
    parts.exists(_.contains(":"))

  /** Source column of every field (DDL guards: renaming/dropping a
    * transform's source breaks the layout just like an identity one's).
    */
  def sources(parts: Seq[String]): Seq[String] =
    parseCanonical(parts).map(_.source)

  // ---- DSv2 Transform bridge ------------------------------------------

  def toTransform(f: PartField): Transform = f.transform match {
    case "identity" => Expressions.identity(f.source)
    case "year" => Expressions.years(f.source)
    case "month" => Expressions.months(f.source)
    case "day" => Expressions.days(f.source)
    case "hour" => Expressions.hours(f.source)
    case "bucket" => Expressions.bucket(f.param, f.source)
    case "trunc" => Expressions.apply("truncate",
      Expressions.literal(f.param), Expressions.column(f.source))
  }

  /** Map a Spark `Transform` (CREATE TABLE ... PARTITIONED BY) to a
    * spec field. `truncate` arrives as a generic apply-transform in
    * either operand order.
    */
  def fromTransform(t: Transform): PartField = {
    def ref: String = {
      val rs = t.references()
      require(rs.length == 1 && rs(0).fieldNames().length == 1,
        s"graft-orc: partition transform ${t.describe()} must reference " +
          "exactly one top-level column")
      rs(0).fieldNames()(0)
    }
    t.name match {
      case "identity" => PartField(ref, "identity")
      case "years" => PartField(ref, "year")
      case "months" => PartField(ref, "month")
      case "days" => PartField(ref, "day")
      case "hours" => PartField(ref, "hour")
      case "bucket" =>
        val n = t.arguments().collectFirst {
          case l: org.apache.spark.sql.connector.expressions.Literal[_]
              if l.value().isInstanceOf[Number] =>
            l.value().asInstanceOf[Number].intValue()
        }.getOrElse(throw new IllegalArgumentException(
          s"graft-orc: bucket transform needs an int literal: ${t.describe()}"))
        PartField(ref, "bucket", n)
      case "truncate" =>
        val w = t.arguments().collectFirst {
          case l: org.apache.spark.sql.connector.expressions.Literal[_]
              if l.value().isInstanceOf[Number] =>
            l.value().asInstanceOf[Number].intValue()
        }.getOrElse(throw new IllegalArgumentException(
          s"graft-orc: truncate transform needs an int literal: ${t.describe()}"))
        PartField(ref, "trunc", w)
      case other => throw new IllegalArgumentException(
        s"graft-orc: unsupported partition transform ${t.describe()} — " +
          "supported: identity, years, months, days, hours, " +
          "bucket(n, col), truncate(w, col)")
    }
  }

  // ---- validation -----------------------------------------------------

  /** Type rules per transform (on top of the identity rules in
    * [[GraftOrcWrite.supportedPartitionType]]).
    */
  def validate(schema: StructType, spec: Seq[PartField]): Unit = {
    val dup = spec.groupBy(_.dirName.toLowerCase).collect {
      case (_, fs) if fs.length > 1 => fs.head.dirName }
    require(dup.isEmpty,
      s"graft-orc: duplicate partition field(s): ${dup.mkString(", ")}")
    spec.foreach { f =>
      val field = schema.fields.find(_.name.equalsIgnoreCase(f.source))
        .getOrElse(throw new IllegalArgumentException(
          s"graft-orc: partition column ${f.source} not in " +
            schema.simpleString))
      require(schema.fields.forall(sf =>
        f.isIdentity || !sf.name.equalsIgnoreCase(f.dirName)),
        s"graft-orc: partition directory name ${f.dirName} collides " +
          "with a table column — rename one of them")
      val dt = field.dataType
      if (f.isIdentity)
        // identical message to the classic path — this is that check
        require(GraftOrcWrite.supportedPartitionType(dt),
          s"graft-orc: unsupported partition column type " +
            s"${dt.catalogString} for ${f.source} — supported: string, " +
            "byte/short/int/long, date, timestamp")
      else {
        val ok = f.transform match {
          case "day" | "month" | "year" =>
            dt == TimestampType || dt == DateType ||
              dt == TimestampNTZType
          case "hour" => dt == TimestampType || dt == TimestampNTZType
          case "bucket" => GraftOrcWrite.supportedPartitionType(dt) ||
            dt == TimestampNTZType
          case "trunc" => dt == StringType || dt == IntegerType ||
            dt == LongType || dt == ShortType || dt == ByteType
          case _ => false
        }
        require(ok, s"graft-orc: partition transform ${f.describe} does " +
          s"not support column type ${dt.catalogString}")
      }
    }
  }

  // ---- write-side evaluation ------------------------------------------

  private def utcDate(value: Any, dt: DataType): java.time.LocalDate =
    dt match {
      case DateType =>
        java.time.LocalDate.ofEpochDay(value.asInstanceOf[Int].toLong)
      // NTZ micros are wall-clock-as-if-UTC: identical arithmetic
      case TimestampType | TimestampNTZType =>
        val micros = value.asInstanceOf[Long]
        java.time.LocalDateTime.ofEpochSecond(
          Math.floorDiv(micros, 1000000L),
          (Math.floorMod(micros, 1000000L) * 1000L).toInt,
          java.time.ZoneOffset.UTC).toLocalDate
      case other => throw new IllegalStateException(
        s"graft-orc: time partition transform on ${other.catalogString}")
    }

  def bucketOf(value: Any, dt: DataType, n: Int): Int =
    Math.floorMod(Murmur3HashFunction.hash(value, dt, Seed).toInt, n)

  /** Hive path value (pre-escape) for one NON-NULL internal value
    * (UTF8String / Int days / Long micros — what `InternalRow.get`
    * yields); callers map null to the hive default-partition marker.
    * Time values format in UTC, matching the identity timestamp path.
    */
  def dirValue(f: PartField, value: Any, dt: DataType): String =
    f.transform match {
      case "day" => utcDate(value, dt).toString
      case "month" =>
        val d = utcDate(value, dt); f"${d.getYear}%04d-${d.getMonthValue}%02d"
      case "year" => f"${utcDate(value, dt).getYear}%04d"
      case "hour" =>
        val micros = value.asInstanceOf[Long]
        val ldt = java.time.LocalDateTime.ofEpochSecond(
          Math.floorDiv(micros, 1000000L), 0, java.time.ZoneOffset.UTC)
        f"${ldt.getYear}%04d-${ldt.getMonthValue}%02d-${
          ldt.getDayOfMonth}%02d-${ldt.getHour}%02d"
      case "bucket" => bucketOf(value, dt, f.param).toString
      case "trunc" => dt match {
        case StringType =>
          val s = value.toString // UTF8String
          if (s.length <= f.param) s else s.substring(0, f.param)
        case _ =>
          val i = value match {
            case b: Byte => b.toLong
            case s: Short => s.toLong
            case n: Int => n.toLong
            case l: Long => l
          }
          (i - Math.floorMod(i, f.param.toLong)).toString
      }
      case other => throw new IllegalStateException(
        s"graft-orc: dirValue on transform $other")
    }

  // ---- partition-spec evolution ---------------------------------------
  // The CURRENT spec lives in TableMeta.parts; when it changes
  // (set_partition_spec — a metadata-only commit, Iceberg's partition
  // evolution), the outgoing spec is appended to a history prop and the
  // new spec's activation schema-version recorded. A data file's
  // effective spec is resolved from the schemaV it was written under,
  // so old files keep pruning by THEIR directories while new files use
  // the new layout — no rewrite, ever. Reserved props (filtered from
  // user TBLPROPERTIES surfaces like any graft.* key):
  //   graft.parts.since    — schemaV at which TableMeta.parts activated
  //   graft.parts.history  — `<activationV>=<spec ,-joined>` joined by `;`
  //                          (spec canonical forms are , and ; free)

  val SinceProp = "graft.parts.since"
  val HistoryProp = "graft.parts.history"

  def decodeHistory(props: Map[String, String]): Seq[(Long, Seq[String])] =
    props.get(HistoryProp).map(_.split(';').toSeq.filter(_.nonEmpty).map {
      seg =>
        val i = seg.indexOf('=')
        (seg.substring(0, i).toLong,
          seg.substring(i + 1).split(',').toSeq.filter(_.nonEmpty))
    }.sortBy(_._1)).getOrElse(Nil)

  def encodeHistory(h: Seq[(Long, Seq[String])]): String =
    h.sortBy(_._1).map { case (v, s) => s"$v=${s.mkString(",")}" }
      .mkString(";")

  /** Has the spec ever changed? (Gates SPJ transform keys: mixed-spec
    * files cannot share one key layout.)
    */
  def specEvolved(meta: GraftOrcManifest.TableMeta): Boolean =
    meta.props.contains(SinceProp)

  /** The spec in force for a file written under schema version `v`. */
  def specForVersion(meta: GraftOrcManifest.TableMeta,
                     v: Long): Seq[String] =
    meta.props.get(SinceProp).map(_.toLong) match {
      case Some(since) if v < since =>
        decodeHistory(meta.props).filter(_._1 <= v).lastOption
          .map(_._2).getOrElse(meta.parts)
      case _ => meta.parts
    }

  /** Every spec that ever applied (current first) — for filter
    * collection and metadata-table directory unions.
    */
  def allSpecs(meta: GraftOrcManifest.TableMeta): Seq[Seq[String]] =
    meta.parts +: decodeHistory(meta.props).map(_._2).reverse

  // ---- storage-partitioned-join keys ----------------------------------

  /** Catalyst type of one transform field's PARTITION KEY — must agree
    * with the `resultType` of the matching [[GraftOrcFunctions]]
    * transform function (days → DATE, bucket/months/years/hours → INT,
    * truncate → the source type), or SPJ key grouping and the resolved
    * transform expression would disagree.
    */
  def keyType(f: PartField, srcType: DataType): DataType = f.transform match {
    case "identity" | "trunc" => srcType
    case "day" => DateType
    case _ => IntegerType
  }

  /** Decode one transform DIRECTORY value to its partition-key internal
    * value — the inverse of [[dirValue]] into the [[keyType]] domain.
    * Must match the transform function's `produceResult` on any row of
    * that directory.
    */
  def keyValue(f: PartField, raw: String, srcType: DataType): Any = {
    if (raw == null) return null
    f.transform match {
      case "bucket" => raw.toInt
      case "day" => java.time.LocalDate.parse(raw).toEpochDay.toInt
      case "month" =>
        val ym = java.time.YearMonth.parse(raw)
        (ym.getYear - 1970) * 12 + ym.getMonthValue - 1
      case "year" => raw.toInt - 1970
      case "hour" =>
        val p = raw.split('-')
        (java.time.LocalDateTime.of(p(0).toInt, p(1).toInt, p(2).toInt,
          p(3).toInt, 0).toEpochSecond(java.time.ZoneOffset.UTC) / 3600L)
          .toInt
      case "trunc" => srcType match {
        case StringType =>
          org.apache.spark.unsafe.types.UTF8String.fromString(raw)
        case LongType => raw.toLong
        // box at the declared keyType width — TruncateFunction
        // produceResult boxes the same way, and SPJ key grouping
        // compares the boxed values
        case ShortType => raw.toShort
        case ByteType => raw.toByte
        case _ => raw.toInt
      }
      case "identity" =>
        GraftOrcDataSource.internalPartitionValue(raw, srcType)
    }
  }

  // ---- read-side pruning ----------------------------------------------

  /** The SOURCE-column value range one transform directory guarantees:
    * `ts_day=2020-01-15` means every row's ts is inside that UTC day.
    * Feeding these ranges to [[OrcStatsEval.mayMatch]] makes the
    * existing tri-state evaluator do hidden-partition file pruning for
    * every range/equality/IN/null/NOT shape it already understands.
    * None for bucket (no order correspondence — see [[bucketEval]]).
    */
  def sourceRange(f: PartField, raw: String,
                  dt: DataType): Option[OrcStatsEval.StatRange] = {
    import OrcStatsEval.{EpochDays, EpochMicros, StatRange}
    if (raw == null)
      return Some(StatRange(None, None, hasNull = true, hasValues = false))
    def dayRange(first: java.time.LocalDate, lastExclusive: java.time.LocalDate)
        : StatRange = dt match {
      case DateType => StatRange(
        Some(EpochDays(first.toEpochDay)),
        Some(EpochDays(lastExclusive.toEpochDay - 1)),
        hasNull = false, hasValues = true)
      case _ => StatRange(
        Some(EpochMicros(first.toEpochDay * 86400L * 1000000L)),
        Some(EpochMicros(lastExclusive.toEpochDay * 86400L * 1000000L - 1L)),
        hasNull = false, hasValues = true)
    }
    try f.transform match {
      case "day" =>
        val d = java.time.LocalDate.parse(raw)
        Some(dayRange(d, d.plusDays(1)))
      case "month" =>
        val ym = java.time.YearMonth.parse(raw)
        Some(dayRange(ym.atDay(1), ym.plusMonths(1).atDay(1)))
      case "year" =>
        val y = raw.toInt
        Some(dayRange(java.time.LocalDate.of(y, 1, 1),
          java.time.LocalDate.of(y + 1, 1, 1)))
      case "hour" =>
        val p = raw.split('-')
        val start = java.time.LocalDateTime.of(
          p(0).toInt, p(1).toInt, p(2).toInt, p(3).toInt, 0)
        val s = start.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L
        Some(StatRange(Some(EpochMicros(s)),
          Some(EpochMicros(s + 3600L * 1000000L - 1L)),
          hasNull = false, hasValues = true))
      case "trunc" => dt match {
        case StringType =>
          // strings with this truncation live in [raw, succ(raw)] where
          // succ bumps the last char (inclusive upper bound slightly
          // over-covers — pruning must only ever over-keep)
          val max = stringSucc(raw)
          Some(StatRange(Some(raw), max,
            hasNull = false, hasValues = true))
        case _ =>
          val lo = BigDecimal(raw.toLong)
          Some(StatRange(Some(lo), Some(lo + BigDecimal(f.param - 1)),
            hasNull = false, hasValues = true))
      }
      case _ => None
    } catch {
      // an unparseable directory value (hand-renamed dir): no range —
      // the file is conservatively kept
      case scala.util.control.NonFatal(_) => None
    }
  }

  /** Smallest string > every string starting with `s`: bump the last
    * non-U+FFFF char, dropping any U+FFFF tail; None when `s` is all
    * U+FFFF (no finite upper bound).
    */
  private def stringSucc(s: String): Option[String] = {
    var i = s.length - 1
    while (i >= 0 && s.charAt(i) == '\uffff') i -= 1
    if (i < 0) None
    else Some(s.substring(0, i) + (s.charAt(i) + 1).toChar)
  }

  /** Tri-state evaluation of one pushed filter against a file's BUCKET
    * directories. `dirs` maps a lowercase source-column name to
    * (bucket count, source type, directory value — None = the hive
    * null partition). Mirrors [[OrcStatsEval.eval]]'s three-valued
    * contract: Some(false) = no row of the file can match (prune),
    * Some(true) = every row matches, None = unknown (keep).
    */
  def bucketEval(filter: Filter,
                 dirs: String => Option[(Int, DataType, Option[Int])])
      : Option[Boolean] = {
    def conv(dt: DataType, v: Any): Option[Any] =
      if (v == null) None
      else scala.util.Try(
        CatalystTypeConverters.createToCatalystConverter(dt)(v)).toOption
    filter match {
      case EqualTo(c, v) => dirs(c).flatMap { case (n, dt, dir) =>
        dir match {
          case None => Some(false) // null dir holds only null sources
          case Some(b) => conv(dt, v).map(iv => bucketOf(iv, dt, n) == b)
              .flatMap(eq => if (eq) None else Some(false))
        }
      }
      case EqualNullSafe(c, v) =>
        if (v == null) bucketEval(IsNull(c), dirs)
        else bucketEval(EqualTo(c, v), dirs)
      case In(c, vs) =>
        val parts = vs.toSeq.map(v => bucketEval(EqualTo(c, v), dirs))
        if (parts.nonEmpty && parts.forall(_.contains(false))) Some(false)
        else None
      case IsNull(c) => dirs(c).map(d => d._3.isEmpty)
      case IsNotNull(c) => dirs(c).map(d => d._3.nonEmpty)
      case FAnd(l, r) =>
        (bucketEval(l, dirs), bucketEval(r, dirs)) match {
          case (Some(false), _) | (_, Some(false)) => Some(false)
          case (Some(true), Some(true)) => Some(true)
          case _ => None
        }
      case FOr(l, r) =>
        (bucketEval(l, dirs), bucketEval(r, dirs)) match {
          case (Some(true), _) | (_, Some(true)) => Some(true)
          case (Some(false), Some(false)) => Some(false)
          case _ => None
        }
      case FNot(inner) => bucketEval(inner, dirs) match {
        case Some(true) => Some(false)
        // NOT promotion is safe here only over null-free inputs: a
        // non-null bucket dir is null-free by construction, so promote
        // when every referenced column is a bucket field with a
        // non-null directory (same tri-state care as OrcStatsEval)
        case Some(false) if inner.references.forall(c =>
          dirs(c).exists(_._3.nonEmpty)) => Some(true)
        case _ => None
      }
      case _ => None
    }
  }

  /** Hidden-partition file pruning: drop every file whose transform
    * directories prove no row can satisfy the pushed data filters. The
    * filters stay residual in the scan (directories only BOUND the
    * source values), so this can only skip I/O, never change results.
    * `typeOf` resolves a source column's type from the table schema.
    */
  def hiddenPrune(entries: Seq[OrcFileEntry], filters: Seq[Filter],
                  spec: Seq[PartField], typeOf: String => Option[DataType])
      : Seq[OrcFileEntry] = {
    val hidden = spec.filterNot(_.isIdentity)
    if (hidden.isEmpty || filters.isEmpty) return entries
    val (bucketFields, rangeFields) = hidden.partition(_.transform == "bucket")
    entries.filter { e =>
      def rawDir(f: PartField): Option[String] =
        e.partitionValues.collectFirst {
          case (k, v) if k.equalsIgnoreCase(f.dirName) => v
        }
      // range transforms: intersect when several fields bound one source
      // (e.g. days(ts) + hours(ts))
      val ranges: String => Option[OrcStatsEval.StatRange] = name => {
        val rs = rangeFields.filter(_.source.equalsIgnoreCase(name))
          .flatMap(f => typeOf(f.source).flatMap(dt =>
            rawDir(f).flatMap(r => sourceRange(f, r, dt))))
        rs.reduceOption { (a, b) =>
          def tighter(x: Option[Any], y: Option[Any], wantMax: Boolean) =
            (x, y) match {
              case (Some(xv), Some(yv)) => OrcStatsEval.cmp(xv, yv) match {
                case Some(c) => if ((c > 0) == wantMax) Some(yv) else Some(xv)
                case None => x
              }
              case _ => x.orElse(y)
            }
          OrcStatsEval.StatRange(
            tighter(a.min, b.min, wantMax = false),
            tighter(a.max, b.max, wantMax = true),
            a.hasNull && b.hasNull, a.hasValues && b.hasValues)
        }
      }
      val bucketDirs: String => Option[(Int, DataType, Option[Int])] =
        name => bucketFields.find(_.source.equalsIgnoreCase(name))
          .flatMap(f => typeOf(f.source).flatMap { dt =>
            // ABSENT directory (a file written before this field joined
            // the spec — spec evolution) is unknown, NOT the null
            // partition: yield no lookup so the file is kept. Same for an
            // UNPARSEABLE directory value (hand-renamed/corrupt layout):
            // None in bucketEval's contract means "the null partition",
            // which would PROVE equality filters false and prune live
            // rows — an undecodable dir must stay unknown/kept, exactly
            // like sourceRange's NonFatal fallback on the range path
            rawDir(f).flatMap { raw =>
              if (raw == null) Some((f.param, dt, None))
              else scala.util.Try(raw.toInt).toOption
                .map(b => (f.param, dt, Some(b)))
            }
          })
      filters.forall(f => OrcStatsEval.mayMatch(f, ranges)) &&
        filters.forall(f => !bucketEval(f, bucketDirs).contains(false))
    }
  }
}
