package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.functions.TextHashFunctions

/** The native single-pass SimHash/MinHash expressions must be
  * hash-identical to the HOF/explode reference formulations on real data
  * (both reduce to the same xxhash64 calls over the same token/shingle
  * byte ranges).
  */
class TextHashParitySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  lazy val docs = Tables.documents(spark, TestSpark.sf0001)

  test("native simhash64 == HOF simhash64 on all sf0.001 documents") {
    val diff = docs.select(
        TextHashFunctions.simhash64($"text").as("native"),
        TextHashFunctions.simhash64Hof($"text").as("hof"))
      .filter($"native" =!= $"hof").count()
    assert(diff === 0L)
  }

  test("native minhash signatures == HOF signatures on all sf0.001 documents") {
    val nat = TextHashFunctions.minhashSignatures(docs, "doc_id", "text")
      .as[(Long, Seq[Long])].collect().toMap
    val hof = TextHashFunctions.minhashSignaturesHof(docs, "doc_id", "text")
      .as[(Long, Seq[Long])].collect().toMap
    assert(nat.keySet === hof.keySet)
    val bad = nat.keys.filter(k => nat(k) != hof(k))
    assert(bad.isEmpty, s"signature mismatch for docs: ${bad.take(5)}")
  }

  test("edge cases: empty string, single word, consecutive/trailing spaces") {
    val edge = Seq((1L, ""), (2L, "word"), (3L, "a  b"), (4L, "a b "),
      (5L, " a"), (6L, "one two three four"))
      .toDF("doc_id", "text")
    val diff = edge.select(
        TextHashFunctions.simhash64($"text").as("n"),
        TextHashFunctions.simhash64Hof($"text").as("h"))
      .filter($"n" =!= $"h").count()
    assert(diff === 0L)
    val nat = TextHashFunctions.minhashSignatures(edge, "doc_id", "text")
      .as[(Long, Seq[Long])].collect().toMap
    val hof = TextHashFunctions.minhashSignaturesHof(edge, "doc_id", "text")
      .as[(Long, Seq[Long])].collect().toMap
    nat.keys.foreach(k => assert(nat(k) === hof(k), s"doc $k"))
  }
}
