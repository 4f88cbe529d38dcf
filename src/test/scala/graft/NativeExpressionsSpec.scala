package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.functions.{NativeExpressions, VectorFunctions}

/** The native codegen expressions must be value-identical to the HOF
  * reference implementations (same accumulation order/width), and the
  * rolling hash must match a JVM-side re-computation.
  */
class NativeExpressionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("native cosine == HOF cosine on real embeddings (bit-exact)") {
    val e = Tables.embeddings(spark, TestSpark.sf0001).limit(200)
    val a = e.select($"vec_id".as("a_id"), $"embedding".as("a_v"))
    val b = e.select($"vec_id".as("b_id"), $"embedding".as("b_v"))
    val pairs = a.crossJoin(b).filter($"a_id" < $"b_id")
    val diff = pairs.select(
        VectorFunctions.cosine($"a_v", $"b_v").as("native"),
        VectorFunctions.cosineHof($"a_v", $"b_v").as("hof"))
      .filter($"native" =!= $"hof")
      .count()
    assert(diff === 0L)
  }

  test("native dot == HOF dot (bit-exact)") {
    val e = Tables.embeddings(spark, TestSpark.sf0001).limit(50)
    val a = e.select($"vec_id".as("a_id"), $"embedding".as("a_v"))
    val b = e.select($"vec_id".as("b_id"), $"embedding".as("b_v"))
    val diff = a.crossJoin(b)
      .select(NativeExpressions.dot($"a_v", $"b_v").as("native"),
        VectorFunctions.dotHof($"a_v", $"b_v").as("hof"))
      .filter($"native" =!= $"hof").count()
    assert(diff === 0L)
  }

  test("native hyperplaneBuckets == per-table Column-tree buckets (bit-exact)") {
    val tables = 8; val planes = 6
    val e = Tables.embeddings(spark, TestSpark.sf0001).limit(300)
    val diff = e.select(
        VectorFunctions.hyperplaneBuckets($"embedding", tables, planes, 64)
          .as("native"),
        array((0 until tables).map { t =>
          VectorFunctions.hyperplaneBucket($"embedding", planes, 64,
            planeOffset = t * planes)
        }: _*).as("tree"))
      .filter($"native" =!= $"tree")
      .count()
    assert(diff === 0L)
  }

  test("native quantizePrefix == HOF transform(slice(...)) quantization " +
    "(bit-exact, both prefix lengths), and is null-safe") {
    val e = Tables.embeddings(spark, TestSpark.sf0001)
    def hof(n: Int) = expr(s"transform(slice(embedding, 1, $n), x -> " +
      "CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT))")
    Seq(8, 16).foreach { n =>
      val diff = e.select(
          NativeExpressions.quantizePrefix($"embedding", n).as("native"),
          hof(n).as("hofq"))
        .filter($"native" =!= $"hofq").count()
      assert(diff === 0L, s"prefix $n diverged from the HOF form")
    }
    val withNull = Seq(Some(Array(0.5f, -1.25f)), None).toDF("embedding")
      .select(NativeExpressions.quantizePrefix($"embedding", 16).as("qv"))
      .collect()
    assert(withNull(0).getSeq[Long](0) === Seq(500L, -1250L))
    assert(withNull(1).isNullAt(0))
  }

  test("native detMinhashBands == the Column-tree det banding " +
    "(bit-exact over real documents + edge strings)") {
    import graft.operators.Dedup
    val docs = Tables.documents(spark, TestSpark.sf0001)
      .select($"doc_id", $"text")
    val edge = Seq((100001L, ""), (100002L, "a"), (100003L, "a b"),
      (100004L, "a  b   c d"), (100005L, "a b c"), (100006L, " lead"),
      (100007L, "trail "), (100008L, "大熊 和奏 🤔 ok"))
      .toDF("doc_id", "text")
    val all = docs.unionByName(edge)
    val native = Dedup.detBandKeys(all)
    val hof = Dedup.detBandKeysHof(all)
    assert(native.exceptAll(hof).isEmpty && hof.exceptAll(native).isEmpty,
      "native banding diverged from the Column-tree form")
    // null text: the doc contributes no band keys on either path
    val withNull = Seq((1L, Some("x y z")), (2L, None))
      .toDF("doc_id", "text")
    assert(Dedup.detBandKeys(withNull).filter($"doc_id" === 2L).isEmpty)
  }

  test("rolling hash matches JVM reference and is null-safe") {
    def ref(s: String): Long = {
      var h = -3750763034362895579L
      for (b <- s.getBytes("UTF-8")) h = (h ^ (b & 0xffL)) * 1099511628211L
      h
    }
    val rows = Seq("hello world", "", "大熊和奏 🤔", "a").toDF("text")
      .select($"text", NativeExpressions.rollingHash($"text").as("h"))
      .as[(String, Long)].collect()
    rows.foreach { case (s, h) => assert(h === ref(s), s"for '$s'") }

    val withNull = Seq(Some("x"), None).toDF("text")
      .select(NativeExpressions.rollingHash($"text").as("h"))
      .collect()
    assert(withNull(1).isNullAt(0))
  }

  test("token-set counts == regex word-boundary counts on space-tokenized text") {
    val profiles = Seq(Seq("the", "a", "and"), Seq("el", "la"))
    val regexes = profiles.map(ws => "\\b(" + ws.mkString("|") + ")\\b")
    val docs = Tables.documents(spark, TestSpark.sf0001)
    val diff = docs.select(
        NativeExpressions.tokenSetCounts($"text", profiles).as("ts"),
        array(regexes.map(re =>
          size(regexp_extract_all($"text", lit(re), lit(0))).cast("long")): _*)
          .as("re"))
      .filter($"ts" =!= $"re").count()
    assert(diff === 0L)
  }

  test("CJK char count == regex range count") {
    val rows = Seq("no cjk here", "大熊和奏 and 斉藤朱夏", "", "鈴原希実🤔")
      .toDF("text")
      .select(NativeExpressions.cjkCharCount($"text").as("n"),
        size(regexp_extract_all($"text", lit("[一-鿿]"), lit(0))).cast("long")
          .as("re"))
      .as[(Long, Long)].collect()
    rows.foreach { case (n, re) => assert(n === re) }
  }

  test("native repetitionStats == HOF set algebra on all sf0.001 documents") {
    import graft.functions.TextHashFunctions.{shingles, words}
    val docs = Tables.documents(spark, TestSpark.sf0001)
    val t = words($"text"); val sh = shingles($"text")
    val hof = docs.select($"doc_id",
      size(t).cast("long").as("a"),
      size(array_distinct(t)).cast("long").as("b"),
      size(sh).cast("long").as("c"),
      size(array_distinct(sh)).cast("long").as("d"))
      .orderBy($"doc_id").collect().toSeq
    val nat = docs.select($"doc_id",
        NativeExpressions.repetitionStats($"text", 3).as("st"))
      .select($"doc_id", element_at($"st", 1).as("a"),
        element_at($"st", 2).as("b"), element_at($"st", 3).as("c"),
        element_at($"st", 4).as("d"))
      .orderBy($"doc_id").collect().toSeq
    assert(nat === hof)
    // edge cases: empty text, all-same tokens, short doc (< k tokens)
    val edge = Seq((1L, ""), (2L, "a a a a a"), (3L, "x y"))
      .toDF("doc_id", "text")
    val e = edge.select(NativeExpressions.repetitionStats($"text", 3))
      .as[Seq[Long]].collect().toSeq
    assert(e(0) === Seq(1L, 1L, 1L, 1L)) // one empty token, one shingle
    assert(e(1) === Seq(5L, 1L, 3L, 1L)) // all dup tokens + dup shingles
    assert(e(2) === Seq(2L, 2L, 1L, 1L)) // < k tokens => whole-text shingle
  }

  test("nfcNormalize: composed == normalize(decomposed), identity on " +
    "ASCII (fast path), null-safe, java.text.Normalizer parity") {
    import graft.functions.NativeExpressions.nfcNormalize
    val rows = Seq(
      "cafe\u0301",            // decomposed -> composes
      "caf\u00e9",             // already NFC -> identity
      "plain ascii text",      // fast path
      "A\u030a ring",          // A + combining ring -> \u00c5
      "")
    val df = spark.createDataFrame(
      rows.map(Tuple1.apply) :+ Tuple1(null.asInstanceOf[String]))
      .toDF("s")
    val got = df.select(nfcNormalize(col("s"))).collect()
      .map(r => if (r.isNullAt(0)) null else r.getString(0))
    val want = rows.map(x =>
      java.text.Normalizer.normalize(x, java.text.Normalizer.Form.NFC)
    ) :+ null
    assert(got.toSeq === want)
    // the composed result really is the single codepoint
    assert(got(0) === "caf\u00e9" && got(0).length === 4)
    assert(got(3).startsWith("\u00c5"))
  }

  test("native intDot == HOF aggregate(zip_with) fold (bit-exact), " +
    "null-safe") {
    import graft.functions.NativeExpressions.intDot
    val e = Tables.embeddings(spark, TestSpark.sf0001)
      .select($"vec_id", org.apache.spark.sql.functions.expr(
        "transform(slice(embedding, 1, 16), x -> " +
          "CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT))").as("qv"))
    val both = e.select(
      intDot($"qv", $"qv").as("native"),
      org.apache.spark.sql.functions.expr(
        "aggregate(zip_with(qv, qv, (x, y) -> x * y), 0L, " +
          "(acc, v) -> acc + v)").as("hof"))
      .collect()
    assert(both.nonEmpty)
    both.foreach(r => assert(r.getLong(0) === r.getLong(1)))
    val n = Seq((Seq(1L, 2L), null.asInstanceOf[Seq[Long]]))
      .toDF("a", "b").select(intDot($"a", $"b")).collect()
    assert(n(0).isNullAt(0))
  }

  test("native detLshBuckets == unrolled bucketColsN column trees " +
    "(bit-exact) on real embeddings") {
    val e = Tables.embeddings(spark, TestSpark.sf0001)
    val qv8 = org.apache.spark.sql.functions.expr(
      "transform(slice(embedding, 1, 8), x -> " +
        "CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT))")
    // the (24, 6) radius banding: kernel vs the literal-unrolled form
    val flat = for {
      t <- 0 until 24; p <- 0 until 6; j <- 1 to 8
    } yield graft.operators.DetLsh.comp(t, p, j)
    val native = graft.functions.NativeExpressions
      .detLshBuckets(qv8, 24, 6, flat)
    val unrolled = org.apache.spark.sql.functions.array(
      graft.operators.DetLsh.bucketColsN(
        graft.operators.DetLsh.quantized($"embedding"), 24, 6): _*)
    val rows = e.select(native.as("a"), unrolled.as("b")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getSeq[Long](0) === r.getSeq[Long](1))
    }
  }

  test("expressions survive whole-stage codegen (no fallback) in a real plan") {
    val e = Tables.embeddings(spark, TestSpark.sf0001)
    val q = e.select($"vec_id", VectorFunctions.cosine($"embedding", $"embedding").as("c"))
      .filter($"c" > 0.99)
    // all vectors have cosine(v,v)=1
    assert(q.count() === e.count())
    // "*(n)" prefixes mark operators inside a WholeStageCodegen stage
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project") && plan.contains("*(1) Filter"),
      plan.take(500))
  }
}
