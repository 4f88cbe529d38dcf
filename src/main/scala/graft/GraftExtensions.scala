package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.NativeExpressions._

/** Session extensions registering the graft native expressions as SQL
  * functions, so the whole library surface is reachable from pure SQL:
  *
  * {{{
  * SparkSession.builder().withExtensions(new GraftExtensions)...
  * spark.sql("SELECT graft_cosine(a.embedding, b.embedding) FROM ...")
  * }}}
  *
  * `GraftExtensions.register(spark)` does the same on an existing session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach { case (name, info, builder) =>
      e.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftExtensions {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft.functions.NativeExpressions", null, name, usage, "")

  val functions: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("graft_cosine",
      info("graft_cosine", "graft_cosine(a, b) - cosine similarity of two float arrays"),
      (es: Seq[Expression]) => CosineSimilarity(es(0), es(1))),
    ("graft_dot",
      info("graft_dot", "graft_dot(a, b) - dot product of two float arrays"),
      (es: Seq[Expression]) => DotProduct(es(0), es(1))),
    ("graft_rolling_hash",
      info("graft_rolling_hash", "graft_rolling_hash(s) - 64-bit FNV-1a rolling hash"),
      (es: Seq[Expression]) => RollingHash(es(0))),
    ("graft_simhash64",
      info("graft_simhash64", "graft_simhash64(s) - 64-bit SimHash of the word multiset"),
      (es: Seq[Expression]) => SimHash64(es(0))),
    ("graft_minhash",
      info("graft_minhash", "graft_minhash(s) - 32-perm MinHash signature over 3-word shingles"),
      (es: Seq[Expression]) => MinHashSignature(es(0), 32, 3)),
    ("graft_cjk_count",
      info("graft_cjk_count", "graft_cjk_count(s) - count of CJK ideographs"),
      (es: Seq[Expression]) => CjkCharCount(es(0))),
    ("graft_repetition_stats",
      info("graft_repetition_stats", "graft_repetition_stats(s) - " +
        "[nTokens, distinctTokens, n3grams, distinct3grams] in one pass"),
      (es: Seq[Expression]) => RepetitionStats(es(0), 3)),
    ("graft_hyperplane_buckets",
      info("graft_hyperplane_buckets", "graft_hyperplane_buckets(vec) - " +
        "8-table x 6-bit sign-LSH bucket ids for a float array"),
      (es: Seq[Expression]) => HyperplaneBuckets(es(0), 8, 6, 64)))

  /** Register on an already-built session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    functions.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "scala_udf")
    }
}
