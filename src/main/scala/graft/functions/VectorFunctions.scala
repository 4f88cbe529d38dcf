package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `ArrayType(FloatType)` embedding columns, built from
  * codegen'd higher-order functions (`zip_with`/`aggregate`/`transform`) —
  * no UDFs, so the expressions stay inside whole-stage codegen.
  *
  * All math is done in DOUBLE (arrays are cast once) with sequential
  * accumulation — deterministic for a given element order.
  */
object VectorFunctions {

  private def asD(a: Column): Column = a.cast("array<double>")

  /** HOF (interpreted) forms — kept as the reference implementation the
    * native expressions are tested against; math is identical.
    */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(asD(a), asD(b), (x, y) => x * y), lit(0.0), _ + _)

  def norm2(a: Column): Column =
    aggregate(transform(asD(a), x => x * x), lit(0.0), _ + _)

  def norm(a: Column): Column = sqrt(norm2(a))

  def cosineHof(a: Column, b: Column): Column =
    dotHof(a, b) / (norm(a) * norm(b))

  /** Hot-path forms: native codegen'd Catalyst expressions. */
  def cosine(a: Column, b: Column): Column = NativeExpressions.cosine(a, b)
  def dot(a: Column, b: Column): Column = NativeExpressions.dot(a, b)

  def l2Distance(a: Column, b: Column): Column =
    sqrt(aggregate(zip_with(asD(a), asD(b), (x, y) => (x - y) * (x - y)),
      lit(0.0), _ + _))

  /** Sign-bit key for random-hyperplane LSH: `planes` pseudo-random
    * hyperplanes are derived deterministically from (plane, dim) via a
    * hash-free integer mix so both driver runs and tests agree. Returns a
    * bit-packed LONG bucket id.
    *
    * Scale path: computing the key is a narrow map; the subsequent
    * bucket-join replaces the O(n^2) cross join with a shuffle on the key.
    */
  def hyperplaneBucket(vec: Column, planes: Int, dims: Int,
                       planeOffset: Int = 0): Column = {
    // comp()'s seed stride is fixed at 64 (parity-pinned with the native
    // HyperplaneBuckets form); dims > 64 would alias adjacent planes'
    // components and collapse the bucket space
    require(dims <= 64,
      s"hyperplaneBucket supports at most 64 dims (seed stride), got $dims")
    // Deterministic pseudo-random component for plane p, dim j in [-1, 1).
    // splitmix64-style finalizer: a linear mix here (tried first) produced
    // LINEARLY CORRELATED planes whose sign-bits collapsed the bucket
    // space — 797M candidate pairs at 20k vectors; a full-avalanche mix
    // restores iid-ish components and near-uniform buckets.
    def comp(p: Int, j: Int): Double = {
      var z = (p.toLong * 64 + j) + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e9b5L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z = z ^ (z >>> 31)
      z.toDouble / 9.223372036854776e18
    }
    val bits = (0 until planes).map { p =>
      val plane = Array.tabulate(dims)(j => comp(planeOffset + p, j).toFloat)
      val proj = NativeExpressions.dot(vec, typedlit(plane))
      when(proj >= 0, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

  /** All `tables` bucket ids at once as array<long> — the hot-path native
    * form of [[hyperplaneBucket]] (bit-identical; one pass over the vector
    * against a precomputed plane matrix instead of tables*planes separate
    * dot-product expressions). Explode it to get (table, bucket) rows.
    */
  def hyperplaneBuckets(vec: Column, tables: Int, planesPerTable: Int,
                        dims: Int): Column =
    NativeExpressions.hyperplaneBuckets(vec, tables, planesPerTable, dims)
}
