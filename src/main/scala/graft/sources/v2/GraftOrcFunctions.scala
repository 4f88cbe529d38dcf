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
    }
  ).map(f => f.name() -> f).toMap
}
