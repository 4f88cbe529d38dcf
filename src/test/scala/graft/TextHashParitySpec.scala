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

  test("bigram skew gate: a flat corpus plans the plain count join, an " +
    "allhot corpus engages the hot/cold split — results identical") {
    import graft.operators.TextAnalysis
    val d0 = docs.select($"doc_id", $"text")
    // flat: this corpus's heaviest bigram key holds ~0.2% of occ rows,
    // far under the 1/(2*partitions) gate — the split's TakeOrdered
    // barrier + anti-join + union must NOT appear in the plan
    val flatPlan = TextAnalysis.bigramLm(d0)
      .queryExecution.executedPlan.toString
    assert(!flatPlan.contains("Union"),
      s"flat corpus must take the plain join:\n$flatPlan")
    // allhot: one bigram on EVERY doc. Whether that key is a problem
    // depends on the fair per-reducer share, i.e. the partition count —
    // the test suite runs tiny (4 partitions, fair share ~7k rows, a
    // 500-row key is genuinely fine and the gate correctly stays off),
    // so model the scale shape by raising the partition count the gate
    // prices against; the split (its union of broadcast-hot and
    // shuffled-cold branches) must then engage.
    val allhot = d0.withColumn("text",
      concat_ws(" ", $"text", lit("zzhot zzkey")))
    val saved = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "200")
      val hotPlan = TextAnalysis.bigramLm(allhot)
        .queryExecution.executedPlan.toString
      assert(hotPlan.contains("Union"),
        s"allhot corpus must engage the hot/cold split:\n$hotPlan")
      // the gate is a plan choice, never a result choice: the split and
      // plain branches fold the same LONG sums
      val viaSplit = TextAnalysis.bigramLm(allhot).collect()
      val flatRows = TextAnalysis.bigramLm(d0).collect()
      assert(viaSplit.length === flatRows.length)
      // perplexity's gate mirrors bigramLm's — its vocabulary derivation
      // always contains ONE union (distinct u ∪ distinct w), so the
      // split shows as a SECOND one
      def unions(df: org.apache.spark.sql.DataFrame): Int =
        "Union".r.findAllIn(df.queryExecution.executedPlan.toString).size
      assert(unions(TextAnalysis.perplexity(allhot)) >= 2)
      spark.conf.set("spark.sql.shuffle.partitions", saved)
      assert(unions(TextAnalysis.perplexity(d0)) === 1,
        "flat corpus must take the plain perplexity score join")
    } finally spark.conf.set("spark.sql.shuffle.partitions", saved)
  }

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

  test("ta_perplexity matches a JVM-reference bigram-LM computation") {
    val docs = Seq((0L, "a b a b"), (1L, "a b c"), (2L, "c c c c"))
      .toDF("doc_id", "text")
    val k = 0.5
    val got = graft.operators.TextAnalysis.perplexity(docs, k)
      .as[(Long, Long, Double)].collect()
      .map { case (id, n, p) => id -> (n, p) }.toMap

    // reference: plain-Scala add-k bigram LM over the same corpus (token
    // HASHING in the operator only relabels distinct tokens, so counts
    // are identical)
    val corpus = Seq(0L -> "a b a b", 1L -> "a b c", 2L -> "c c c c")
    val biPerDoc = corpus.map { case (id, t) =>
      val w = t.split(" ")
      id -> w.sliding(2).map(p => (p(0), p(1))).toSeq
    }
    val cb = biPerDoc.flatMap(_._2).groupBy(identity).view.mapValues(_.size)
    val cu = cb.toSeq.groupBy(_._1._1).view.mapValues(_.map(_._2).sum)
    val vocab = corpus.flatMap(_._2.split(" ")).distinct.size
    biPerDoc.foreach { case (id, bgs) =>
      val nll = -bgs.map { bg =>
        math.log((cb(bg) + k) / (cu(bg._1) + k * vocab))
      }.sum / bgs.size
      val expected = math.exp(nll)
      val (n, p) = got(id)
      assert(n === bgs.size)
      assert(math.abs(p - expected) < 1e-9,
        s"doc $id: got $p, reference $expected")
    }
    // the repetitive doc is the most predictable, the diverse one least
    assert(got(2L)._2 < got(0L)._2 && got(0L)._2 < got(1L)._2)

    // fixture sanity: every score finite and > 1 at sf0.001
    val fixture = graft.operators.TextAnalysis
      .perplexity(Tables.documents(spark, TestSpark.sf0001))
      .as[(Long, Long, Double)].collect()
    assert(fixture.nonEmpty)
    assert(fixture.forall { case (_, n, p) =>
      n > 0 && p > 1.0 && !p.isNaN && !p.isInfinite })
  }

  test("repeated bigramLm/perplexity runs do not leak cached model RDDs " +
    "(r10 ADVICE: each run unpersists its predecessor's model frame)") {
    import graft.operators.TextAnalysis
    val d0 = docs.select($"doc_id", $"text")
    def cachedCount = spark.sparkContext.getPersistentRDDs.size
    TextAnalysis.bigramLm(d0).collect()
    TextAnalysis.perplexity(d0).collect()
    val afterOne = cachedCount
    (1 to 3).foreach { _ =>
      TextAnalysis.bigramLm(d0).collect()
      TextAnalysis.perplexity(d0).collect()
    }
    assert(cachedCount <= afterOne,
      s"cached RDDs grew from $afterOne to $cachedCount across reruns")
  }
}
