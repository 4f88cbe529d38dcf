package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.functions.{TextHashFunctions, VectorFunctions}
import graft.operators.Dedup

/** Algebraic properties of the dedup/similarity primitives. */
class DedupSimilaritySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("identical texts collide on every MinHash band and hash to SimHash distance 0") {
    val docs = Seq((1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "completely different words entirely here now")).toDF("doc_id", "text")
    val sigs = TextHashFunctions.minhashSignatures(docs, "doc_id", "text")
    val cands = Dedup.lshCandidates(sigs)
      .as[(Long, Long)].collect().toSet
    assert(cands.contains((1L, 2L)))
    assert(!cands.contains((1L, 3L)))

    val sim = docs.select($"doc_id",
      TextHashFunctions.simhash64($"text").as("sh"))
      .as[(Long, Long)].collect().toMap
    assert(sim(1L) === sim(2L))
    assert(java.lang.Long.bitCount(sim(1L) ^ sim(3L)) > 0)
  }

  test("near-identical texts (1 word changed) stay within small SimHash distance") {
    val docs = Seq(
      (1L, "spark query engine scales to very large clusters with columnar scans"),
      (2L, "spark query engine scales to very large clusters with columnar reads"))
      .toDF("doc_id", "text")
    val sim = docs.select($"doc_id",
      TextHashFunctions.simhash64($"text").as("sh"))
      .as[(Long, Long)].collect().toMap
    assert(java.lang.Long.bitCount(sim(1L) ^ sim(2L)) <= 16)
  }

  test("minhash LSH candidates form a superset of high-Jaccard pairs (sf0.001)") {
    val docs = Tables.documents(spark, TestSpark.sf0001)
    val sigs = TextHashFunctions.minhashSignatures(docs, "doc_id", "text")
    val cands = Dedup.lshCandidates(sigs).as[(Long, Long)].collect().toSet
    // exact high-jaccard pairs over the SAME feature space minhash uses
    // (3-word shingle sets, not word sets)
    val shingleSets = docs.select($"doc_id",
      array_distinct(TextHashFunctions.shingles($"text")).as("tokset"))
    val exact = Dedup.withJaccard(
        shingleSets.select($"doc_id".as("a_id")).crossJoin(
          shingleSets.select($"doc_id".as("b_id")))
          .filter($"a_id" < $"b_id"),
        shingleSets)
      .filter($"jac" >= 0.9)
      .select($"a_id", $"b_id").as[(Long, Long)].collect().toSet
    // every >=0.9-shingle-jaccard pair must be recalled by 16x2 LSH
    // (P[miss] = (1-s^2)^16 < 1e-12 at s=0.9)
    assert(exact.subsetOf(cands),
      s"missed: ${exact.diff(cands).take(5)}")
  }

  test("embedding LSH near-dups are a subset of the exact pairs with nonzero recall") {
    val e = Tables.embeddings(spark, TestSpark.sf0001)
    val lsh = Dedup.embedLshNearDups(e, 0.45).as[(Long, Long)].collect().toSet
    val a = e.select($"vec_id".as("a_id"), $"embedding".as("a_v"))
    val b = e.select($"vec_id".as("b_id"), $"embedding".as("b_v"))
    val exact = a.crossJoin(b).filter($"a_id" < $"b_id")
      .filter(graft.functions.VectorFunctions.cosine($"a_v", $"b_v") >= 0.45)
      .select($"a_id", $"b_id").as[(Long, Long)].collect().toSet
    assert(lsh.subsetOf(exact), s"false positives: ${lsh.diff(exact).take(5)}")
    if (exact.nonEmpty) assert(lsh.nonEmpty, "zero recall at threshold 0.45")
  }

  test("cosine identities: self=1, orthogonal=0, scale-invariant") {
    val df = Seq(
      (Array(1f, 0f, 2f), Array(1f, 0f, 2f)),
      (Array(1f, 0f, 0f), Array(0f, 1f, 0f)),
      (Array(1f, 2f, 3f), Array(2f, 4f, 6f)))
      .toDF("a", "b")
      .select(VectorFunctions.cosine($"a", $"b").as("c"))
      .as[Double].collect()
    assert(math.abs(df(0) - 1.0) < 1e-12)
    assert(math.abs(df(1)) < 1e-12)
    assert(math.abs(df(2) - 1.0) < 1e-12)
  }

  test("hyperplane buckets: identical vectors share buckets; bucket count bounded") {
    val e = Tables.embeddings(spark, TestSpark.sf0001)
      .withColumn("bucket",
        VectorFunctions.hyperplaneBucket($"embedding", 8, 64))
    val n = e.select($"bucket").distinct().count()
    assert(n > 1 && n <= 256)
  }

  test("ANN recall: LSH top-k recalls >=45% of brute-force top-k") {
    val brute = SparkEntry.queries("ss_topk_bruteforce")(spark, TestSpark.sf0001)
      .select($"q_id", $"n_id").as[(Long, Long)].collect().toSet
    val ann = SparkEntry.queries("ss_ann_lsh")(spark, TestSpark.sf0001)
      .select($"q_id", $"n_id").as[(Long, Long)].collect().toSet
    assert(brute.nonEmpty)
    // single-probe 8-plane LSH: each true neighbor at angle θ shares the
    // query's bucket with probability (1-θ/π)^8; the near-neighbors that
    // dominate top-k sit well under the ~60° of random 64-dim pairs, so a
    // non-degenerate bucketing clears this floor (planes and data are both
    // deterministic — measured 0.525 on this dataset, identical across
    // runs); a regression like the correlated-planes bug collapses recall
    // toward 1/256 and fails here
    val recall = ann.intersect(brute).size.toDouble / brute.size
    info(f"LSH ANN recall: $recall%.3f")
    assert(recall >= 0.45, s"LSH ANN recall $recall < 0.45")
  }

  test("ANN recall: IVF adaptive probe + boundary assignment recalls >=80%, " +
    "index growth stays under 1.5x") {
    val brute = SparkEntry.queries("ss_topk_bruteforce")(spark, TestSpark.sf0001)
      .select($"q_id", $"n_id").as[(Long, Long)].collect().toSet
    val ivf = SparkEntry.queries("ss_ann_ivf")(spark, TestSpark.sf0001)
      .select($"q_id", $"n_id").as[(Long, Long)].collect().toSet
    assert(brute.nonEmpty)
    // fixed probe-3 measured 0.55 on this fixture; the adaptive probe
    // (scan cells within 1.8x the best cell's angular distance, max 6)
    // measured 0.725 — the residual misses were ASSIGNMENT-side: true
    // neighbors indexed just across a cell boundary the probe never
    // crossed. Boundary vectors now index in their second cell too.
    // Deterministic: centroids fit from a keyed sample, data fixed.
    val recall = ivf.intersect(brute).size.toDouble / brute.size
    info(f"IVF ANN recall: $recall%.3f")
    assert(recall >= 0.8, s"IVF ANN recall $recall < 0.8")
    // the recall is bought with boundary duplication only: the index
    // frame must stay well under 2 entries per vector
    val nVectors = Tables.embeddings(spark, TestSpark.sf0001).count()
    val indexRows = graft.operators.Similarity
      .ivfAssigned(spark, TestSpark.sf0001).count()
    info(f"IVF index growth: ${indexRows.toDouble / nVectors}%.3f x")
    assert(indexRows < 1.5 * nVectors,
      s"IVF index grew to $indexRows rows for $nVectors vectors (>=1.5x)")
  }

  test("range search: LSH prefilter recalls >=85% of the integer-radius " +
    "brute result, never false-positives, and prunes the cross") {
    import graft.operators.Similarity
    val sf = TestSpark.sf0001
    val brute = Similarity.rangeBruteInt(spark, sf)
      .as[(Long, Long)].collect().toSet
    assert(brute.nonEmpty)
    val lsh = SparkEntry.queries("ss_range_search_lsh_det")(spark, sf)
      .select($"q_id", $"n_id").as[(Long, Long)].collect().toSet
    // exact verify => no false positives: every reported neighbor IS
    // inside the radius (the LSH path can only miss, never invent)
    assert(lsh.subsetOf(brute), s"false positives: ${lsh.diff(brute).take(5)}")
    // recall floor: measured 0.930 (sf0.001) / 0.957 (sf0.01) / 0.956
    // (sf0.1) for the 24x6 banding — deterministic planes + data, so the
    // number is exact per fixture; 0.85 leaves room for fixture regen
    val recall = lsh.size.toDouble / brute.size
    info(f"range-search LSH recall: $recall%.3f")
    assert(recall >= 0.85, s"range-search LSH recall $recall < 0.85")
    // the structural point vs ss_range_search's bounded cross: the
    // prefilter's candidate set must be well under the q x n cross size
    // (measured 0.41x; the dial is RangePlanes)
    val nCand = Similarity.rangeLshCandidates(spark, sf).count()
    val cross = Tables.embeddings(spark, sf).count() *
      Similarity.RangeQueries
    info(f"range-search candidates: $nCand of $cross cross pairs " +
      f"(${nCand.toDouble / cross}%.3f x)")
    assert(nCand < 0.6 * cross,
      s"LSH prefilter candidates $nCand not < 0.6x of cross $cross")
  }

  test("k-means fit: centroids are finite, distinct-ish, and cells are populated") {
    val e = Tables.embeddings(spark, TestSpark.sf0001)
    val cents = graft.operators.Similarity.fitCentroids(e)
    assert(cents.size === 16)
    assert(cents.forall(_._2.forall(f => !f.isNaN && !f.isInfinite)))
    // fitted centroids must not all collapse to one point
    val distinct = cents.map(_._2.toSeq).distinct.size
    assert(distinct > 8, s"centroid collapse: only $distinct distinct")
  }

  test("connected components: chains merge, islands stay, empty edges = singletons") {
    import org.apache.spark.sql.functions.col
    val nodes = (1L to 7L).toDF("doc_id")
    // chain 1-2-3 (transitive merge), pair 5-6, islands 4 and 7
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("a_id", "b_id")
    val got = Dedup.connectedComponents(nodes, pairs)
      .orderBy(col("doc_id")).as[(Long, Long)].collect().toSeq
    assert(got === Seq(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L,
      5L -> 5L, 6L -> 5L, 7L -> 7L))
    val none = Dedup.connectedComponents(nodes,
      Seq.empty[(Long, Long)].toDF("a_id", "b_id"))
      .orderBy(col("doc_id")).as[(Long, Long)].collect().toSeq
    assert(none === (1L to 7L).map(i => i -> i))
  }

  test("SemDeDup: drops partition correctly and catch every same-cluster exact pair") {
    // 2x expansion plants a perturbed near-identical twin per vector —
    // guaranteed near-dups; at cosine ~0.99 a twin lands in its
    // original's cluster, exercising the within-cluster drop path
    val e = Dedup.expandVectors(
      Tables.embeddings(spark, TestSpark.sf0001), 2).localCheckpoint(true)
    val thr = 0.9
    val assigned = Dedup.semDedupAssign(e).cache()
    val dropped = Dedup.semDedupDropped(assigned, thr)
      .as[Long].collect().toSet
    val total = e.count()

    // the summary partitions the corpus: sum of cluster sizes = corpus,
    // drops never exceed their cluster
    val summary = Dedup.semDedupSummary(e, thr)
      .as[(Int, Long, Long)].collect().toSeq
    assert(summary.map(_._2).sum === total)
    assert(summary.forall { case (_, n, d) => d <= n })
    assert(summary.map(_._3).sum === dropped.size)

    // semantics: every exact near-dup pair (cosine >= thr) whose two ends
    // landed in the SAME cluster must drop its higher id — within-cluster
    // recall is 1.0 by construction, the method's defining property
    val byCluster = assigned.select($"vec_id", $"c_id")
      .as[(Long, Int)].collect().toMap
    val exactPairs = {
      val a = e.select($"vec_id".as("a_id"), $"embedding".as("a_v"))
      val b = e.select($"vec_id".as("b_id"), $"embedding".as("b_v"))
      a.crossJoin(b).filter($"a_id" < $"b_id")
        .filter(graft.functions.VectorFunctions
          .cosine($"a_v", $"b_v") >= thr)
        .select($"a_id", $"b_id").as[(Long, Long)].collect().toSeq
    }
    val sameCluster = exactPairs.filter { case (a, b) =>
      byCluster(a) == byCluster(b) }
    assert(sameCluster.nonEmpty, "fixture needs same-cluster near-dups")
    sameCluster.foreach { case (_, b) =>
      assert(dropped.contains(b), s"same-cluster near-dup $b not dropped")
    }
    // and precision: a dropped id always has a lower-id near-dup SOMEWHERE
    val dupIds = exactPairs.map(_._2).toSet
    assert(dropped.subsetOf(dupIds),
      "a dropped id must be the higher end of some exact near-dup pair")
    assigned.unpersist()
  }

  test("WITH RECURSIVE reachability via spark.sql == pointer-jumping " +
    "connectedComponents") {
    // the dd_clusters oracle's recursive min-label fixpoint, executed by
    // SPARK's own recursive CTE support (4.x) over the same chain graph
    // the unit test uses — the literal-SQL twin of the O(log d)
    // pointer-jumping implementation
    val nodes = spark.range(40).select($"id".as("doc_id"))
    val pairs = spark.range(39).filter($"id" % 8 =!= 7)
      .select($"id".as("a_id"), ($"id" + 1).as("b_id"))
    val cc = Dedup.connectedComponents(nodes, pairs)
      .as[(Long, Long)].collect().toSet
    nodes.createOrReplaceTempView("cc_nodes")
    pairs.createOrReplaceTempView("cc_pairs")
    // Spark's recursion supports UNION ALL only (UNION would be the
    // fixpoint form DuckDB runs); an explicit depth bound >= the graph
    // diameter keeps the walk enumeration finite and the min-label
    // result identical
    val viaSql = spark.sql(
      """WITH RECURSIVE reach(doc_id, label, depth) AS (
        |  SELECT doc_id, doc_id AS label, 0 AS depth FROM cc_nodes
        |  UNION ALL
        |  SELECT e.a, r.label, r.depth + 1 FROM reach r
        |  JOIN (SELECT a_id AS a, b_id AS b FROM cc_pairs
        |        UNION ALL
        |        SELECT b_id AS a, a_id AS b FROM cc_pairs) e
        |    ON e.b = r.doc_id
        |  WHERE r.depth < 8
        |)
        |SELECT doc_id, min(label) AS cluster_id
        |FROM reach GROUP BY doc_id""".stripMargin)
      .as[(Long, Long)].collect().toSet
    assert(viaSql === cc)
  }

  test("embedLshNearDups falls back to a non-broadcast join when the table exceeds the threshold") {
    val e = Tables.embeddings(spark, TestSpark.sf0001)
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1KB")
      val df = Dedup.embedLshNearDups(e, 0.45)
      // same rows either path
      val gated = df.as[(Long, Long)].collect().toSet
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64MB")
      val bcast = Dedup.embedLshNearDups(e, 0.45).as[(Long, Long)].collect().toSet
      assert(gated === bcast)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }
}
