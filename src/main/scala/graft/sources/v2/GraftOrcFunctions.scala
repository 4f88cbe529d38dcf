package graft.sources.v2

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types._

/** The catalog-function surface (DSv2 `FunctionCatalog`): the library's
  * native kernels exposed to PURE SQL users as
  * `SELECT <catalog>.<ns>.graft_cosine(a, b)` — no Scala imports, no
  * UDF registration, resolvable by any SQL client that can reach the
  * catalog. The DataFrame API should keep using
  * [[graft.functions.NativeExpressions]] directly (whole-stage codegen);
  * these bound forms evaluate via `produceResult` (interpreted row
  * call), which is the DSv2 contract for catalog functions — correct
  * everywhere, fastest where codegen already covers it.
  *
  * Reference-adjacent: the reference registers nothing like this (its
  * SQL surface is DataFusion's built-ins only); Iceberg's
  * `system.bucket`/`truncate` functions are the public shape being
  * followed.
  */
object GraftOrcFunctions {

  private def floatArr = ArrayType(FloatType)

  private abstract class Simple(name: String, args: Array[DataType],
                                result: DataType, doc: String)
      extends UnboundFunction {
    self =>
    override def name(): String = name
    override def description(): String = doc
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.fields.length == args.length,
        s"$name expects ${args.length} arguments, got " +
          inputType.fields.length)
      inputType.fields.map(_.dataType).zip(args).zipWithIndex.foreach {
        case ((got, want), i) =>
          require(DataType.equalsStructurally(got, want,
              ignoreNullability = true),
            s"$name argument ${i + 1} must be ${want.catalogString}, " +
              s"got ${got.catalogString}")
      }
      new ScalarFunction[Any] {
        override def name(): String = self.name()
        override def inputTypes(): Array[DataType] = args
        override def resultType(): DataType = result
        override def canonicalName(): String = s"graft.${self.name()}"
        override def produceResult(input: InternalRow): Any =
          self.eval(input)
      }
    }
    def eval(input: InternalRow): Any
  }

  private def cosine(x: ArrayData, y: ArrayData): Double = {
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
    while (i < n) {
      val xi = x.getFloat(i).toDouble
      val yi = y.getFloat(i).toDouble
      dot += xi * yi; nx += xi * xi; ny += yi * yi; i += 1
    }
    dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  private def dot(x: ArrayData, y: ArrayData): Double = {
    val n = math.min(x.numElements(), y.numElements())
    var d = 0.0; var i = 0
    while (i < n) {
      d += x.getFloat(i).toDouble * y.getFloat(i).toDouble; i += 1
    }
    d
  }

  /** name (lowercase) -> function; the catalog resolves by name in any
    * of its namespaces.
    */
  val All: Map[String, UnboundFunction] = Seq[UnboundFunction](
    new Simple("graft_cosine", Array(floatArr, floatArr), DoubleType,
      "cosine similarity of two float vectors") {
      override def eval(r: InternalRow): Any =
        if (r.isNullAt(0) || r.isNullAt(1)) null
        else cosine(r.getArray(0), r.getArray(1))
    },
    new Simple("graft_dot", Array(floatArr, floatArr), DoubleType,
      "dot product of two float vectors") {
      override def eval(r: InternalRow): Any =
        if (r.isNullAt(0) || r.isNullAt(1)) null
        else dot(r.getArray(0), r.getArray(1))
    },
    new Simple("graft_simhash64", Array(StringType), LongType,
      "64-bit SimHash fingerprint of the whitespace token multiset") {
      override def eval(r: InternalRow): Any =
        if (r.isNullAt(0)) null
        else graft.functions.TextHashImpl.simhash64(r.getUTF8String(0))
    },
    BucketFunction, TruncateFunction,
    new TimeTransformFunction("days"), new TimeTransformFunction("months"),
    new TimeTransformFunction("years"), new TimeTransformFunction("hours")
  ).map(f => f.name() -> f).toMap

  // ---- partition-transform functions (Iceberg system-function shape) --
  // V2ExpressionUtils resolves `bucket`/`days`/... with an EMPTY
  // namespace against the table's FunctionCatalog when a scan reports
  // KeyGroupedPartitioning over transform expressions — this is the hook
  // that lets storage-partitioned joins engage on transform-partitioned
  // tables (and, with v2 bucketing shuffle, lets Spark shuffle a
  // non-aligned side INTO this partitioning via produceResult). Each
  // produceResult matches the WRITE-side directory derivation
  // ([[GraftOrcPartitionSpec]]) exactly — key equality and directory
  // membership must never disagree.

  private object BucketFunction extends UnboundFunction {
    override def name(): String = "bucket"
    override def description(): String =
      "bucket(n, col): pmod(murmur3(col), n) — the graft-orc partition " +
        "transform"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.fields.length == 2,
        s"bucket expects (n, col), got ${inputType.fields.length} args")
      require(inputType.fields(0).dataType == IntegerType,
        "bucket count must be INT")
      val vType = inputType.fields(1).dataType
      require(GraftOrcWrite.supportedPartitionType(vType),
        s"bucket does not support ${vType.catalogString}")
      new ScalarFunction[Integer] {
        override def name(): String = "bucket"
        override def inputTypes(): Array[DataType] =
          Array(IntegerType, vType)
        override def resultType(): DataType = IntegerType
        // the type rides the canonical name: an int-keyed and a
        // long-keyed side hash differently and must NOT co-partition
        override def canonicalName(): String =
          s"graft.bucket(${vType.catalogString})"
        override def produceResult(r: InternalRow): Integer =
          if (r.isNullAt(1)) null
          else Integer.valueOf(GraftOrcPartitionSpec.bucketOf(
            r.get(1, vType), vType, r.getInt(0)))
      }
    }
  }

  private object TruncateFunction extends UnboundFunction {
    override def name(): String = "truncate"
    override def description(): String =
      "truncate(w, col): width-w prefix (strings) / floor-to-w " +
        "multiple (ints) — the graft-orc partition transform"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.fields.length == 2,
        s"truncate expects (w, col), got ${inputType.fields.length} args")
      require(inputType.fields(0).dataType == IntegerType,
        "truncate width must be INT")
      val vType = inputType.fields(1).dataType
      require(vType == StringType || vType == IntegerType ||
        vType == LongType || vType == ShortType || vType == ByteType,
        s"truncate does not support ${vType.catalogString}")
      new ScalarFunction[Any] {
        override def name(): String = "truncate"
        override def inputTypes(): Array[DataType] =
          Array(IntegerType, vType)
        override def resultType(): DataType = vType
        override def canonicalName(): String =
          s"graft.truncate(${vType.catalogString})"
        override def produceResult(r: InternalRow): Any =
          if (r.isNullAt(1)) null
          else {
            val w = r.getInt(0)
            vType match {
              case StringType =>
                val s = r.getUTF8String(1).toString
                org.apache.spark.unsafe.types.UTF8String.fromString(
                  if (s.length <= w) s else s.substring(0, w))
              case LongType =>
                val i = r.getLong(1); i - Math.floorMod(i, w.toLong)
              // narrow types read AND box at their declared width —
              // resultType is vType, and SPJ key grouping compares these
              // against GraftOrcPartitionSpec.keyValue's boxed values
              // (a boxed Integer never equals a boxed Short)
              case ShortType =>
                val i = r.getShort(1)
                (i - Math.floorMod(i.toInt, w)).toShort
              case ByteType =>
                val i = r.getByte(1)
                (i - Math.floorMod(i.toInt, w)).toByte
              case _ =>
                val i = r.getInt(1); i - Math.floorMod(i, w)
            }
          }
      }
    }
  }

  /** `days`/`months`/`years`/`hours` over TIMESTAMP (micros, UTC) or
    * DATE (not hours): epoch-relative ints — days as DATE (epoch days),
    * months as months-since-1970-01, years as years-since-1970, hours
    * as hours-since-epoch. Matches
    * [[GraftOrcPartitionSpec.keyValue]]'s directory decoding.
    */
  private class TimeTransformFunction(fname: String) extends UnboundFunction {
    override def name(): String = fname
    override def description(): String =
      s"$fname(col): the graft-orc time partition transform"
    override def bind(inputType: StructType): BoundFunction = {
      require(inputType.fields.length == 1,
        s"$fname expects one column, got ${inputType.fields.length} args")
      val vType = inputType.fields(0).dataType
      require(vType == TimestampType || vType == TimestampNTZType ||
        (vType == DateType && fname != "hours"),
        s"$fname does not support ${vType.catalogString}")
      new ScalarFunction[Integer] {
        override def name(): String = fname
        override def inputTypes(): Array[DataType] = Array(vType)
        override def resultType(): DataType =
          if (fname == "days") DateType else IntegerType
        override def canonicalName(): String = s"graft.$fname"
        override def produceResult(r: InternalRow): Integer = {
          if (r.isNullAt(0)) return null
          val epochDay: Long = vType match {
            case DateType => r.getInt(0).toLong
            case _ => Math.floorDiv(r.getLong(0), 86400000000L)
          }
          fname match {
            case "days" => Integer.valueOf(epochDay.toInt)
            case "hours" => Integer.valueOf(
              Math.floorDiv(r.getLong(0), 3600000000L).toInt)
            case "months" =>
              val d = java.time.LocalDate.ofEpochDay(epochDay)
              Integer.valueOf((d.getYear - 1970) * 12 + d.getMonthValue - 1)
            case "years" => Integer.valueOf(
              java.time.LocalDate.ofEpochDay(epochDay).getYear - 1970)
          }
        }
      }
    }
  }
}
