package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** `orc.*` writer-option pass-through, exercised by the one that matters
  * at scale: `orc.bloom.filter.columns`. The fixture is adversarial to
  * min/max pruning — ids SHUFFLED across the file, so every row group's
  * range covers the whole domain and range statistics can prune nothing
  * — and the receipt is the decoded-row metric: a point lookup on the
  * bloom-filtered table decodes ~one row group, the same lookup on the
  * plain table decodes the entire file. At 100 TB this is the
  * difference between "find document X" touching kilobytes vs scanning
  * every matching-range row group.
  */
class GraftOrcBloomSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import org.apache.spark.sql.functions._

  private val N = 100000L

  private def shuffled =
    spark.range(N).select(col("id"),
      (col("id") * 2).as("v"))
      .orderBy(xxhash64(col("id"))) // deterministic shuffle
      .coalesce(1)

  private def write(dir: String, bloom: Boolean): Unit = {
    val w = shuffled.write.format("graft-orc")
    (if (bloom)
      w.option("orc.bloom.filter.columns", "id")
        .option("orc.bloom.filter.fpp", "0.01")
    else w).mode("overwrite").save(dir)
  }

  private def rowsDecodedFor(dir: String, key: Long): (Seq[Long], Long) = {
    val df = spark.read.format("graft-orc").load(dir)
      .filter(col("id") === key).select("v")
    val out = df.collect().map(_.getLong(0)).toSeq
    val leaf = df.queryExecution.executedPlan.collectLeaves().head
    (out, leaf.metrics.find(_._1 == "graftRowsDecoded")
      .map(_._2.value).getOrElse(-1L))
  }

  test("bloom filters skip row groups min/max cannot: point lookup " +
    "decodes a fraction of the file, same results") {
    val plain = Files.createTempDirectory("graft-bloom-off").toString
    val bloomed = Files.createTempDirectory("graft-bloom-on").toString
    write(plain, bloom = false)
    write(bloomed, bloom = true)
    val key = 54321L
    val (r1, decodedPlain) = rowsDecodedFor(plain, key)
    val (r2, decodedBloom) = rowsDecodedFor(bloomed, key)
    assert(r1 == Seq(key * 2) && r2 == Seq(key * 2))
    // shuffled ids: every row group's [min,max] spans the domain, so the
    // plain table decodes everything...
    assert(decodedPlain == N,
      s"expected full decode without blooms, got $decodedPlain")
    // ...while the bloom consult keeps only the group(s) that can hold
    // the key (default stride 10k => ~1-2 groups; generous bound)
    assert(decodedBloom <= N / 3,
      s"bloom filter skipped nothing: decoded $decodedBloom of $N")
  }

  test("blooms survive stripe-copy compaction (byte-copied with their " +
    "stripes) on a manifest table") {
    val dir = Files.createTempDirectory("graft-bloom-compact").toString
    // two small files -> one merged output
    spark.range(0, N / 2).select(col("id"), (col("id") * 2).as("v"))
      .orderBy(xxhash64(col("id"))).coalesce(1)
      .write.format("graft-orc").option("graft.manifest", "true")
      .option("orc.bloom.filter.columns", "id")
      .mode("overwrite").save(dir)
    spark.range(N / 2, N).select(col("id"), (col("id") * 2).as("v"))
      .orderBy(xxhash64(col("id"))).coalesce(1)
      .write.format("graft-orc")
      .option("orc.bloom.filter.columns", "id")
      .mode("append").save(dir)
    val stats = graft.sources.v2.GraftOrcCompact.compact(spark, dir,
      smallFileBytes = 32L << 20)
    assert(stats.filesCompacted == 2)
    val (out, decoded) = rowsDecodedFor(dir, 777L)
    assert(out == Seq(1554L))
    assert(decoded <= N / 3,
      s"blooms lost in compaction: decoded $decoded of $N")
  }
}
