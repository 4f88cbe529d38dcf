package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Metadata columns `_file` / `_pos` (SupportsMetadataColumns): the
  * lineage/debugging handles of an Iceberg-style table — which file feeds
  * a row, and at which ordinal — synthesized by the reader at zero
  * storage cost.
  */
class GraftOrcMetaColsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft-metacols").toString
    Tables.nation(spark, TestSpark.sf0001).repartition(3)
      .write.format("graft-orc").mode("append").save(d)
    d
  }

  test("_file groups rows by their source file; SELECT * does not " +
    "include metadata columns") {
    val t = spark.read.format("graft-orc").load(dir)
    assert(!t.columns.contains("_file") && !t.columns.contains("_pos"))
    val byFile = t.select($"_file").groupBy($"_file")
      .agg(count(lit(1)).as("n")).collect()
    assert(byFile.length === 3, byFile.mkString(","))
    assert(byFile.map(_.getLong(1)).sum ===
      Tables.nation(spark, TestSpark.sf0001).count())
    byFile.foreach(r => assert(r.getString(0).contains(dir)))
  }

  test("_pos is the row ordinal within its file, stable under filters " +
    "(SARG disabled for the read, residual filter keeps results exact)") {
    val t = spark.read.format("graft-orc").load(dir)
    // full read: positions within each file are exactly 0..n-1
    val full = t.select($"_file", $"_pos", $"n_nationkey").collect()
    val byFile = full.groupBy(_.getString(0))
    byFile.foreach { case (_, rows) =>
      assert(rows.map(_.getLong(1)).sorted.toSeq ===
        (0L until rows.length).toSeq)
    }
    // a filtered read returns the SAME (file, pos) for surviving rows
    val filtered = t.filter($"n_nationkey" > 10)
      .select($"_file", $"_pos", $"n_nationkey").collect()
    val key = full.map(r => (r.getString(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(filtered.nonEmpty)
    filtered.foreach { r =>
      assert(key((r.getString(0), r.getLong(1))) === r.getInt(2),
        s"filtered row moved: $r")
    }
  }

  test("_pos is file-absolute across stripe splits") {
    // one multi-stripe file, read with a tiny split size so several
    // splits cover it: positions must still be the file ordinals
    val d = Files.createTempDirectory("graft-metacols-split").toString
    val n = 30000
    // random-ish payload defeats compression; the stripe row cap (an
    // orc.* key read from the hadoop conf by the writer) forces several
    // stripes so the splitter can cut the file
    val hc = spark.sparkContext.hadoopConfiguration
    val prev = Option(hc.get("orc.stripe.row.count"))
    hc.set("orc.stripe.row.count", "5000")
    try {
      spark.range(n.toLong).select($"id".as("v"),
          md5(concat_ws(":", $"id", lit("pad"))).as("pad"))
        .coalesce(1).sortWithinPartitions($"v")
        .write.format("graft-orc").mode("append").save(d)
    } finally {
      prev match { case Some(v) => hc.set("orc.stripe.row.count", v)
                   case None => hc.unset("orc.stripe.row.count") }
    }
    val t = spark.read.format("graft-orc")
      .option("graft.split_size", "65536").load(d)
    val rows = t.select($"_pos", $"v").collect()
    assert(rows.length === n)
    // the writer produced one sorted file: ordinal == value
    rows.foreach(r => assert(r.getLong(0) === r.getLong(1),
      s"pos ${r.getLong(0)} != v ${r.getLong(1)}"))
    // and the read really was split (several input partitions)
    assert(t.rdd.getNumPartitions > 1)
  }

  test("a real data column named _file shadows the metadata column") {
    val d = Files.createTempDirectory("graft-metacols-shadow").toString
    Seq((1L, "real")).toDF("id", "_file")
      .write.format("graft-orc").mode("append").save(d)
    val got = spark.read.format("graft-orc").load(d)
      .select($"_file").as[String].collect()
    assert(got.toSeq === Seq("real"))
  }

  test("per-file sampling: the classic _pos use (first rows of every file)") {
    val t = spark.read.format("graft-orc").load(dir)
    val heads = t.filter($"_pos" < 2).groupBy($"_file")
      .agg(count(lit(1)).as("n")).collect()
    assert(heads.length === 3)
    heads.foreach(r => assert(r.getLong(1) === 2))
  }
}
