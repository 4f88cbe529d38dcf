package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions with whole-stage codegen for the hot paths
  * the built-in higher-order functions execute interpreted:
  *
  *  - `CosineSimilarity` / `DotProduct` over `array<float>` embeddings:
  *    the HOF formulation (zip_with + aggregate) allocates an intermediate
  *    array per row and evaluates lambdas interpreted; these compile to a
  *    tight primitive loop (~10-50x on the 125k-pair near-dup join).
  *  - `RollingHash`: 64-bit polynomial rolling hash over UTF-8 bytes —
  *    the document-fingerprint primitive.
  *
  * Math note: accumulation order and width (double, sequential) are kept
  * IDENTICAL to the HOF versions in [[VectorFunctions]], so swapping
  * implementations cannot change any oracle-checked result.
  */
object NativeExpressions {

  case class CosineSimilarity(left: Expression, right: Expression)
      extends BinaryExpression with ExpectsInputTypes {
    override def inputTypes =
      Seq(ArrayType(FloatType), ArrayType(FloatType))
    override def dataType: DataType = DoubleType
    override def prettyName: String = "graft_cosine"

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = math.min(x.numElements(), y.numElements())
      var dot = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
      while (i < n) {
        val xi = x.getFloat(i).toDouble
        val yi = y.getFloat(i).toDouble
        dot += xi * yi; nx += xi * xi; ny += yi * yi; i += 1
      }
      dot / (math.sqrt(nx) * math.sqrt(ny))
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val n = ctx.freshName("n"); val i = ctx.freshName("i")
        val dot = ctx.freshName("dot"); val nx = ctx.freshName("nx")
        val ny = ctx.freshName("ny")
        val xi = ctx.freshName("xi"); val yi = ctx.freshName("yi")
        s"""
           |int $n = Math.min($a.numElements(), $b.numElements());
           |double $dot = 0.0, $nx = 0.0, $ny = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  double $xi = (double) $a.getFloat($i);
           |  double $yi = (double) $b.getFloat($i);
           |  $dot += $xi * $yi; $nx += $xi * $xi; $ny += $yi * $yi;
           |}
           |${ev.value} = $dot / (Math.sqrt($nx) * Math.sqrt($ny));
           |""".stripMargin
      })

    override protected def withNewChildrenInternal(
        l: Expression, r: Expression): Expression = copy(left = l, right = r)
  }

  case class DotProduct(left: Expression, right: Expression)
      extends BinaryExpression with ExpectsInputTypes {
    override def inputTypes =
      Seq(ArrayType(FloatType), ArrayType(FloatType))
    override def dataType: DataType = DoubleType
    override def prettyName: String = "graft_dot"

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = math.min(x.numElements(), y.numElements())
      var dot = 0.0; var i = 0
      while (i < n) { dot += x.getFloat(i).toDouble * y.getFloat(i).toDouble; i += 1 }
      dot
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val n = ctx.freshName("n"); val i = ctx.freshName("i")
        val dot = ctx.freshName("dot")
        s"""
           |int $n = Math.min($a.numElements(), $b.numElements());
           |double $dot = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  $dot += (double) $a.getFloat($i) * (double) $b.getFloat($i);
           |}
           |${ev.value} = $dot;
           |""".stripMargin
      })

    override protected def withNewChildrenInternal(
        l: Expression, r: Expression): Expression = copy(left = l, right = r)
  }

  /** 64-bit polynomial rolling hash over the UTF-8 bytes of a string:
    * h = h * 1099511628211 + byte (FNV-prime multiplier, seed 14695981039346656037).
    */
  case class RollingHash(child: Expression)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes = Seq(StringType)
    override def dataType: DataType = LongType
    override def prettyName: String = "graft_rolling_hash"

    override def nullSafeEval(v: Any): Any = {
      val bytes = v.asInstanceOf[UTF8String].getBytes
      var h = -3750763034362895579L // FNV-1a 64 offset basis
      var i = 0
      while (i < bytes.length) {
        h = (h ^ (bytes(i) & 0xffL)) * 1099511628211L
        i += 1
      }
      h
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, v => {
        val bytes = ctx.freshName("bytes"); val i = ctx.freshName("i")
        val h = ctx.freshName("h")
        s"""
           |byte[] $bytes = $v.getBytes();
           |long $h = -3750763034362895579L;
           |for (int $i = 0; $i < $bytes.length; $i++) {
           |  $h = ($h ^ ($bytes[$i] & 0xffL)) * 1099511628211L;
           |}
           |${ev.value} = $h;
           |""".stripMargin
      })

    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  /** 64-bit SimHash (see [[TextHashImpl.simhash64]]) — native replacement
    * for the HOF vote pipeline, hash-identical results.
    */
  case class SimHash64(child: Expression)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes = Seq(StringType)
    override def dataType: DataType = LongType
    override def prettyName: String = "graft_simhash64"

    override def nullSafeEval(v: Any): Any =
      TextHashImpl.simhash64(v.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        v => s"graft.functions.TextHashImpl.simhash64($v)")

    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  /** MinHash signature (see [[TextHashImpl.minhash]]) as array<long>. */
  case class MinHashSignature(child: Expression, numPerms: Int, k: Int)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes = Seq(StringType)
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "graft_minhash"

    override def nullSafeEval(v: Any): Any =
      new org.apache.spark.sql.catalyst.util.GenericArrayData(
        TextHashImpl.minhash(v.asInstanceOf[UTF8String], numPerms, k))

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, v =>
        s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
          s"graft.functions.TextHashImpl.minhash($v, $numPerms, $k))")

    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  // ---- Column-level API -------------------------------------------------

  def cosine(a: Column, b: Column): Column =
    GraftBridge.column(CosineSimilarity(
      GraftBridge.expression(a), GraftBridge.expression(b)))

  def dot(a: Column, b: Column): Column =
    GraftBridge.column(DotProduct(
      GraftBridge.expression(a), GraftBridge.expression(b)))

  def rollingHash(c: Column): Column =
    GraftBridge.column(RollingHash(GraftBridge.expression(c)))

  def simhash64(c: Column): Column =
    GraftBridge.column(SimHash64(GraftBridge.expression(c)))

  def minhashSig(c: Column, numPerms: Int = 32, k: Int = 3): Column =
    GraftBridge.column(MinHashSignature(GraftBridge.expression(c), numPerms, k))
}
