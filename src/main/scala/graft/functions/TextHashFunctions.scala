package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text hashing / sketching primitives for deduplication: word shingles,
  * MinHash signatures, banded-LSH keys, and 64-bit SimHash — all built from
  * codegen'd built-ins (xxhash64, higher-order array functions), no UDFs.
  *
  * These are the library API used by the `dd_*` operators; each piece is
  * unit-tested independently of the query harness.
  */
object TextHashFunctions {

  /** Space-separated word tokens. */
  def words(c: Column): Column = split(c, " ")

  /** k-word shingles; texts shorter than k tokens fall back to the whole
    * text as a single shingle.
    */
  def shingles(c: Column, k: Int = 3): Column = {
    val t = words(c)
    when(size(t) >= k,
      transform(sequence(lit(0), size(t) - k),
        i => concat_ws(" ", slice(t, i + 1, lit(k)))))
      .otherwise(array(concat_ws(" ", t)))
  }

  /** MinHash signatures: (idCol, sig array[numPerms]) per input row.
    * Native single-pass expression — a narrow map over the docs, no
    * explode/shuffle at all (the 100 TB shape: signature build costs one
    * scan; only the band join shuffles).
    */
  def minhashSignatures(df: DataFrame, idCol: String, textCol: String,
                        numPerms: Int = 32): DataFrame =
    df.select(col(idCol),
      NativeExpressions.minhashSig(col(textCol), numPerms, k = 3).as("sig"))

  /** HOF/explode formulation kept as the parity reference for tests:
    * permutations as xxhash64(perm, shingle), two partial-aggregated
    * groupBys. Hash-identical to the native form.
    */
  def minhashSignaturesHof(df: DataFrame, idCol: String, textCol: String,
                           numPerms: Int = 32): DataFrame = {
    val sh = df
      .select(col(idCol), explode(shingles(col(textCol))).as("shingle"))
      .distinct()
      .select(col(idCol),
        posexplode(transform(sequence(lit(0), lit(numPerms - 1)),
          p => xxhash64(p, col("shingle")))).as(Seq("perm", "h")))
    sh.groupBy(col(idCol), col("perm")).agg(min(col("h")).as("mh"))
      .groupBy(col(idCol))
      .agg(transform(array_sort(collect_list(struct(col("perm"), col("mh")))),
        s => s.getField("mh")).as("sig"))
  }

  /** Explode a signature into (band, key) LSH rows; equal keys in a band
    * mark candidate pairs. bands * rowsPerBand must equal the signature
    * length. The key is an 8-byte xxhash64 of the band's signature slice,
    * not the concatenated string: equal slices always collide (recall is
    * exact), a 2^-64 hash collision only adds a candidate that exact
    * verification discards, and the band-join shuffle carries 8 bytes per
    * key instead of a ~rowsPerBand*20-char string.
    */
  def lshBands(sigs: DataFrame, idCol: String, bands: Int,
               rowsPerBand: Int): DataFrame =
    sigs.select(col(idCol),
      posexplode(array((0 until bands).map { b =>
        xxhash64((0 until rowsPerBand).map { r =>
          element_at(col("sig"), b * rowsPerBand + r + 1)
        }: _*)
      }: _*)).as(Seq("band", "key")))

  /** 60-bit content key both engines compute identically: the first 15 hex
    * digits of md5, parsed as an integer (DuckDB:
    * `CAST('0x' || substr(md5(x), 1, 15) AS BIGINT)`). Used where a hashed
    * join key must stay reproducible by the DuckDB oracle; engine-internal
    * paths use the faster xxhash64 instead.
    */
  def md5Key60(c: Column): Column =
    conv(substring(md5(c.cast("binary")), 1, 15), 16, 10).cast("long")

  /** The DuckDB SQL text computing exactly [[md5Key60]]. */
  def md5Key60Sql(expr: String): String =
    s"CAST('0x' || substr(md5($expr), 1, 15) AS BIGINT)"

  /** 64-bit SimHash of the word multiset: per-token hash bits vote +1/-1,
    * the sign of each bit-sum forms the fingerprint. Native single-pass
    * expression.
    */
  def simhash64(textCol: Column): Column =
    NativeExpressions.simhash64(textCol)

  /** HOF formulation kept as the parity reference for tests (bit positions
    * unrolled Scala-side — Catalyst shifts need literal amounts).
    */
  def simhash64Hof(textCol: Column): Column = {
    val bitsum = aggregate(
      words(textCol),
      array_repeat(lit(0L), 64),
      (acc, t) => zip_with(acc,
        array((0 until 64).map { i =>
          when(shiftright(xxhash64(t), i).bitwiseAND(1) === 1, 1L)
            .otherwise(-1L)
        }: _*),
        (x, y) => x + y))
    packBits(bitsum)
  }

  /** Pack a 64-long bit-sum array into a LONG (bit i set iff sum > 0). */
  private def packBits(bitsum: Column): Column = {
    // bind the array once through a named lambda variable to avoid
    // duplicating the (large) bitsum expression 64 times
    aggregate(array(bitsum), lit(0L), (acc, bs) =>
      (0 until 64).map { i =>
        when(element_at(bs, i + 1) > 0, lit(1L << i)).otherwise(lit(0L))
      }.reduce((a, b) => a.bitwiseOR(b)).bitwiseOR(acc))
  }

  /** Split a 64-bit fingerprint into `chunks` equal bit slices for
    * pigeonhole blocking (pairs within Hamming distance d share at least
    * one identical chunk when d < chunks).
    */
  def hammingChunks(fp: Column, chunks: Int = 4): Column = {
    val width = 64 / chunks
    val mask = (1L << width) - 1
    array((0 until chunks).map { c =>
      shiftright(fp, c * width).bitwiseAND(mask)
    }: _*)
  }
}
