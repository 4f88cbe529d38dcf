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

  /** Unicode NFC normalization (java.text.Normalizer) — the ingest
    * normalization step every multilingual corpus needs before hashing
    * or dedup (the SAME logical text arrives as composed é or as
    * e+COMBINING ACUTE depending on the crawler, and fingerprints
    * diverge unless canonicalized). Codegen'd like the other text
    * kernels; NFC is defined by the Unicode standard, so DuckDB's
    * nfc_normalize produces byte-identical output (verified in the
    * ta_normalize oracle). Fast path: Normalizer.isNormalized is a
    * cheap scan that skips the allocation for already-NFC (all-ASCII)
    * strings — the overwhelmingly common case.
    */
  case class NfcNormalize(child: Expression)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes = Seq(StringType)
    override def dataType: DataType = StringType
    override def prettyName: String = "graft_nfc"

    override def nullSafeEval(v: Any): Any = {
      val s = v.asInstanceOf[UTF8String].toString
      if (java.text.Normalizer.isNormalized(s,
          java.text.Normalizer.Form.NFC)) v
      else UTF8String.fromString(java.text.Normalizer.normalize(s,
        java.text.Normalizer.Form.NFC))
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, v => {
        val str = ctx.freshName("str")
        s"""
           |String $str = $v.toString();
           |if (java.text.Normalizer.isNormalized($str,
           |    java.text.Normalizer.Form.NFC)) {
           |  ${ev.value} = $v;
           |} else {
           |  ${ev.value} = UTF8String.fromString(
           |    java.text.Normalizer.normalize($str,
           |      java.text.Normalizer.Form.NFC));
           |}
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

  /** Deterministic md5-permuted minhash band keys (see
    * [[TextHashImpl.detMinhashBands]]) as array<long> of length `bands`
    * — the dd_minhash_lsh_det / rl_stream_neardup_ingest banding as one
    * native pass (the Column-tree form pays 32 boxed HOF md5 lambdas
    * per shingle; value parity pinned in NativeExpressionsSpec).
    */
  case class DetMinhashBands(child: Expression, numPerms: Int, bands: Int,
                             k: Int)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes = Seq(StringType)
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "graft_det_minhash_bands"

    override def nullSafeEval(v: Any): Any =
      new org.apache.spark.sql.catalyst.util.GenericArrayData(
        TextHashImpl.detMinhashBands(v.asInstanceOf[UTF8String],
          numPerms, bands, k))

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, v =>
        s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
          s"graft.functions.TextHashImpl.detMinhashBands($v, $numPerms, " +
          s"$bands, $k))")

    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  /** Repetition statistics (see [[TextHashImpl.repetitionStats]]) as
    * array<long> [nTokens, distinctTokens, nShingles, distinctShingles] —
    * native replacement for the interpreted HOF set algebra
    * (size/array_distinct over materialized token and shingle arrays),
    * which dominated ta_repetition at 3.1 s warm on sf0.1.
    */
  case class RepetitionStats(child: Expression, k: Int)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes = Seq(StringType)
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "graft_repetition_stats"

    override def nullSafeEval(v: Any): Any =
      new org.apache.spark.sql.catalyst.util.GenericArrayData(
        TextHashImpl.repetitionStats(v.asInstanceOf[UTF8String], k))

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, v =>
        s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
          s"graft.functions.TextHashImpl.repetitionStats($v, $k))")

    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  /** All multi-table hyperplane-LSH bucket ids in ONE pass over the
    * vector: returns array<long> of length `tables` where element t is the
    * bit-packed sign bucket of planes [t*planesPerTable,
    * (t+1)*planesPerTable). Bit-identical to the per-plane Column-tree
    * form in [[VectorFunctions.hyperplaneBucket]] (same splitmix64-style
    * plane components, same double accumulation), but ~40x faster: the
    * tree form pays tables*planes codegen'd dot-product calls per row
    * (each re-reading the array), this pays one tight loop over a
    * precomputed plane matrix. Parity is pinned in NativeExpressionsSpec.
    */
  case class HyperplaneBuckets(child: Expression, tables: Int,
                               planesPerTable: Int, dims: Int)
      extends UnaryExpression with ExpectsInputTypes
      with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
    // plane components are seeded with a fixed stride of 64 (p*64 + j) to
    // stay byte-identical to hyperplaneBucket's pinned parity; dims > 64
    // would alias plane p's high dims into plane p+1's low dims — exactly
    // the correlated-planes bucket collapse the seeding exists to avoid
    require(dims <= 64,
      s"HyperplaneBuckets supports at most 64 dims (seed stride), got $dims")

    override def inputTypes = Seq(ArrayType(FloatType))
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "graft_hyperplane_buckets"

    // flat [plane][dim] matrix; plane p of table t is global plane
    // t*planesPerTable + p — identical numbering to hyperplaneBucket's
    // planeOffset = t*planesPerTable convention
    @transient private lazy val planeMatrix: Array[Double] = {
      val nPlanes = tables * planesPerTable
      val m = new Array[Double](nPlanes * dims)
      var p = 0
      while (p < nPlanes) {
        var j = 0
        while (j < dims) {
          // comp(): splitmix64-style finalizer over (plane, dim) — must
          // stay byte-identical to VectorFunctions.hyperplaneBucket
          var z = (p.toLong * 64 + j) + 0x9e3779b97f4a7c15L
          z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e9b5L
          z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
          z = z ^ (z >>> 31)
          // the Column form materializes components as FLOAT literals;
          // match that rounding exactly
          m(p * dims + j) = (z.toDouble / 9.223372036854776e18).toFloat.toDouble
          j += 1
        }
        p += 1
      }
      m
    }

    override def nullSafeEval(v: Any): Any = {
      val vec = v.asInstanceOf[ArrayData]
      val n = math.min(vec.numElements(), dims)
      val x = new Array[Double](n)
      var i = 0
      while (i < n) { x(i) = vec.getFloat(i).toDouble; i += 1 }
      val out = new Array[Long](tables)
      var t = 0
      while (t < tables) {
        var bucket = 0L
        var p = 0
        while (p < planesPerTable) {
          val base = (t * planesPerTable + p) * dims
          var proj = 0.0
          var j = 0
          while (j < n) { proj += x(j) * planeMatrix(base + j); j += 1 }
          if (proj >= 0) bucket |= (1L << p)
          p += 1
        }
        out(t) = bucket
        t += 1
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
    }

    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  /** Integer quantization of the first `n` embedding components:
    * `floor(vec[i] * scale)` as array<long> — native replacement for the
    * HOF form `transform(slice(embedding, 1, n), x ->
    * CAST(floor(CAST(x AS DOUBLE) * scale) AS BIGINT))`. The HOF is
    * CodegenFallback (boxed per-element lambda through
    * NamedLambdaVariable) and, as the one non-native kernel left in the
    * det-ANN queries, the standing suspect for their recurring
    * driver-bench anomalies — this compiles to a tight primitive loop.
    * Arithmetic identical (widen float to double, multiply, Math.floor,
    * narrow to long), pinned in NativeExpressionsSpec.
    */
  case class QuantizePrefix(child: Expression, n: Int, scale: Double)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes = Seq(ArrayType(FloatType))
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "graft_quantize_prefix"

    override def nullSafeEval(v: Any): Any = {
      val vec = v.asInstanceOf[ArrayData]
      val m = math.min(vec.numElements(), n)
      val out = new Array[Long](m)
      var i = 0
      while (i < m) {
        out(i) = math.floor(vec.getFloat(i).toDouble * scale).toLong
        i += 1
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, v => {
        val m = ctx.freshName("m"); val i = ctx.freshName("i")
        val out = ctx.freshName("out")
        s"""
           |int $m = Math.min($v.numElements(), $n);
           |long[] $out = new long[$m];
           |for (int $i = 0; $i < $m; $i++) {
           |  $out[$i] = (long) Math.floor(((double) $v.getFloat($i)) * $scale);
           |}
           |${ev.value} =
           |  new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
           |""".stripMargin
      })

    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  /** BIGINT dot product of two long arrays — the hot verify kernel of
    * the deterministic similarity twins (quantized-prefix scoring). The
    * HOF form `aggregate(zip_with(a, b, ...))` is CodegenFallback with
    * per-element boxing through NamedLambdaVariable, and a filter
    * predicate referencing it gets INLINED (duplicated) into the join
    * condition — this native loop is codegen'd, and arithmetic-identical
    * (sequential long multiply-add), so swapping it in cannot change any
    * oracle-checked result.
    */
  case class IntegerDot(left: Expression, right: Expression)
      extends BinaryExpression with ExpectsInputTypes {
    override def inputTypes =
      Seq(ArrayType(LongType), ArrayType(LongType))
    override def dataType: DataType = LongType
    override def prettyName: String = "graft_int_dot"

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = math.min(x.numElements(), y.numElements())
      var dot = 0L; var i = 0
      while (i < n) { dot += x.getLong(i) * y.getLong(i); i += 1 }
      dot
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val n = ctx.freshName("n"); val i = ctx.freshName("i")
        val dot = ctx.freshName("dot")
        s"""
           |int $n = Math.min($a.numElements(), $b.numElements());
           |long $dot = 0L;
           |for (int $i = 0; $i < $n; $i++) {
           |  $dot += $a.getLong($i) * $b.getLong($i);
           |}
           |${ev.value} = $dot;
           |""".stripMargin
      })

    override protected def withNewChildrenInternal(
        l: Expression, r: Expression): Expression = copy(left = l, right = r)
  }

  /** The md5-deterministic LSH banding ([[graft.operators]] DetLsh) as
    * ONE codegen'd kernel over the quantized 8-prefix: all `tables`
    * buckets from a compiled-constant plane matrix. The per-column
    * unrolled form emits tables*planes*dims literal nodes whose
    * generated megamethod Janino recompiles per invocation (fresh expr
    * ids defeat the source-keyed codegen cache: measured 12 s/run at
    * 24x6), and the HOF array form pays boxed lambda evaluation per
    * component. Arithmetic identical to both: sequential long
    * multiply-add per plane, sign threshold, bit p set on >= 0.
    */
  case class DetLshBuckets(child: Expression, tables: Int, planes: Int,
                           comps: Seq[Long])
      extends UnaryExpression with ExpectsInputTypes {
    private val dims = comps.size / (tables * planes)
    require(comps.size == tables * planes * dims,
      s"plane matrix size ${comps.size} != $tables*$planes*$dims")

    override def inputTypes = Seq(ArrayType(LongType))
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "graft_det_lsh_buckets"

    @transient private lazy val matrix: Array[Long] = comps.toArray

    override def nullSafeEval(v: Any): Any = {
      val qv = v.asInstanceOf[ArrayData]
      val n = math.min(qv.numElements(), dims)
      val x = new Array[Long](dims)
      var i = 0
      while (i < n) { x(i) = qv.getLong(i); i += 1 }
      val out = new Array[Long](tables)
      var t = 0
      while (t < tables) {
        var bucket = 0L
        var p = 0
        while (p < planes) {
          val base = (t * planes + p) * dims
          var proj = 0L
          var j = 0
          while (j < dims) { proj += matrix(base + j) * x(j); j += 1 }
          if (proj >= 0) bucket |= (1L << p)
          p += 1
        }
        out(t) = bucket
        t += 1
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      // plane matrix as ONE compiled static constant, not literal nodes
      val m = ctx.addReferenceObj("detLshMatrix", matrix, "long[]")
      nullSafeCodeGen(ctx, ev, v => {
        val x = ctx.freshName("x"); val out = ctx.freshName("out")
        val t = ctx.freshName("t"); val p = ctx.freshName("p")
        val j = ctx.freshName("j"); val proj = ctx.freshName("proj")
        val bucket = ctx.freshName("bucket"); val n = ctx.freshName("n")
        val base = ctx.freshName("base")
        s"""
           |int $n = Math.min($v.numElements(), $dims);
           |long[] $x = new long[$dims];
           |for (int $j = 0; $j < $n; $j++) { $x[$j] = $v.getLong($j); }
           |long[] $out = new long[$tables];
           |for (int $t = 0; $t < $tables; $t++) {
           |  long $bucket = 0L;
           |  for (int $p = 0; $p < $planes; $p++) {
           |    long $proj = 0L;
           |    int $base = ($t * $planes + $p) * $dims;
           |    for (int $j = 0; $j < $dims; $j++) {
           |      $proj += $m[$base + $j] * $x[$j];
           |    }
           |    if ($proj >= 0) $bucket |= (1L << $p);
           |  }
           |  $out[$t] = $bucket;
           |}
           |${ev.value} =
           |  new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
           |""".stripMargin
      })
    }

    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  /** Counts, per profile, how many whitespace-separated tokens belong to
    * that profile's keyword set — a single tokenization pass replacing one
    * regex scan per profile. Equivalent to counting `\b(w1|w2|...)\b`
    * matches when the text's token boundaries are spaces (true for all
    * whitespace-tokenized corpora; punctuation-adjacent matches would need
    * the regex form).
    */
  case class TokenSetCounts(child: Expression, profiles: Seq[Seq[String]])
      extends UnaryExpression with ExpectsInputTypes
      with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
    override def inputTypes = Seq(StringType)
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "graft_token_set_counts"

    @transient private lazy val sets: Array[java.util.HashSet[UTF8String]] =
      profiles.map { p =>
        val s = new java.util.HashSet[UTF8String]()
        p.foreach(w => s.add(UTF8String.fromString(w)))
        s
      }.toArray

    override def nullSafeEval(v: Any): Any = {
      val s = v.asInstanceOf[UTF8String]
      val bytes = s.getBytes
      val counts = new Array[Long](sets.length)
      var start = 0
      var i = 0
      val n = bytes.length
      while (i <= n) {
        if (i == n || bytes(i) == ' ') {
          if (i > start) {
            val tok = UTF8String.fromBytes(bytes, start, i - start)
            var p = 0
            while (p < sets.length) {
              if (sets(p).contains(tok)) counts(p) += 1
              p += 1
            }
          }
          start = i + 1
        }
        i += 1
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(counts)
    }

    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  /** Count of characters in the CJK Unified Ideographs block
    * (U+4E00..U+9FFF) — byte-level scan for the 3-byte UTF-8 range
    * E4B880..E9BFBF, equivalent to counting regex `[一-鿿]` matches.
    */
  case class CjkCharCount(child: Expression)
      extends UnaryExpression with ExpectsInputTypes
      with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
    override def inputTypes = Seq(StringType)
    override def dataType: DataType = LongType
    override def prettyName: String = "graft_cjk_count"

    override def nullSafeEval(v: Any): Any = {
      val bytes = v.asInstanceOf[UTF8String].getBytes
      var n = 0L
      var i = 0
      while (i + 2 < bytes.length + 1 && i < bytes.length) {
        val b0 = bytes(i) & 0xff
        if (b0 >= 0xe4 && b0 <= 0xe9 && i + 2 < bytes.length) {
          val cp = ((b0 & 0x0f) << 12) |
            ((bytes(i + 1) & 0x3f) << 6) | (bytes(i + 2) & 0x3f)
          if (cp >= 0x4e00 && cp <= 0x9fff) n += 1
          i += 3
        } else if (b0 < 0x80) i += 1
        else if (b0 < 0xe0) i += 2
        else if (b0 < 0xf0) i += 3
        else i += 4
      }
      n
    }

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

  def nfcNormalize(c: Column): Column =
    GraftBridge.column(NfcNormalize(GraftBridge.expression(c)))

  def minhashSig(c: Column, numPerms: Int = 32, k: Int = 3): Column =
    GraftBridge.column(MinHashSignature(GraftBridge.expression(c), numPerms, k))

  def detMinhashBands(c: Column, numPerms: Int = 32, bands: Int = 8,
                      k: Int = 3): Column =
    GraftBridge.column(DetMinhashBands(GraftBridge.expression(c),
      numPerms, bands, k))

  def repetitionStats(c: Column, k: Int = 3): Column =
    GraftBridge.column(RepetitionStats(GraftBridge.expression(c), k))

  def hyperplaneBuckets(vec: Column, tables: Int, planesPerTable: Int,
                        dims: Int): Column =
    GraftBridge.column(HyperplaneBuckets(
      GraftBridge.expression(vec), tables, planesPerTable, dims))

  def tokenSetCounts(c: Column, profiles: Seq[Seq[String]]): Column =
    GraftBridge.column(TokenSetCounts(GraftBridge.expression(c), profiles))

  def cjkCharCount(c: Column): Column =
    GraftBridge.column(CjkCharCount(GraftBridge.expression(c)))

  def quantizePrefix(vec: Column, n: Int, scale: Double = 1000.0): Column =
    GraftBridge.column(QuantizePrefix(GraftBridge.expression(vec), n, scale))

  def intDot(a: Column, b: Column): Column =
    GraftBridge.column(IntegerDot(
      GraftBridge.expression(a), GraftBridge.expression(b)))

  def detLshBuckets(qv8: Column, tables: Int, planes: Int,
                    comps: Seq[Long]): Column =
    GraftBridge.column(DetLshBuckets(
      GraftBridge.expression(qv8), tables, planes, comps))
}
