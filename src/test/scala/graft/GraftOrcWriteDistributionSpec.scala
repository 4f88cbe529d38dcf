package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

/** Writer-requested distribution and ordering
  * (RequiresDistributionAndOrdering): `graft.distribution_mode=hash`
  * clusters rows by the partition columns before the write — a
  * partitioned INSERT from T tasks writes one file per partition instead
  * of up to T x P small files; `graft.write_sort` requests a within-task
  * sort so written stripes carry tight min/max ranges for pruning.
  */
class GraftOrcWriteDistributionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def filesPerPartition(dir: String): Map[String, Int] = {
    val root = new java.io.File(dir)
    root.listFiles().filter(f => f.isDirectory && f.getName.contains("="))
      .map { d =>
        def orcs(f: java.io.File): Int =
          if (f.isFile) (if (f.getName.endsWith(".orc")) 1 else 0)
          else if (f.getName.startsWith("_")) 0
          else f.listFiles().map(orcs).sum
        d.getName -> orcs(d)
      }.toMap
  }

  private def src = spark.range(3000)
    .select(($"id" % 3).cast("string").as("p"), $"id".as(("v")))
    .repartition(8) // every task holds rows of every partition value

  test("hash distribution writes exactly one file per partition; " +
    "default mode writes one per (task, partition)") {
    val plain = Files.createTempDirectory("graft-dist-none").toString
    src.write.format("graft-orc").partitionBy("p")
      .mode("append").save(plain)
    val plainCounts = filesPerPartition(plain)
    assert(plainCounts.size === 3)
    assert(plainCounts.values.forall(_ > 1),
      s"unclustered write should produce one file per (task, partition): " +
        s"$plainCounts")

    val hashed = Files.createTempDirectory("graft-dist-hash").toString
    src.write.format("graft-orc").partitionBy("p")
      .option("graft.distribution_mode", "hash")
      .mode("append").save(hashed)
    val hashedCounts = filesPerPartition(hashed)
    assert(hashedCounts.size === 3)
    assert(hashedCounts.values.forall(_ === 1),
      s"hash-clustered write must produce ONE file per partition: " +
        s"$hashedCounts")
    // content identical either way
    val a = spark.read.format("graft-orc").load(plain)
      .select($"v").as[Long].collect().sorted
    val b = spark.read.format("graft-orc").load(hashed)
      .select($"v").as[Long].collect().sorted
    assert(a.toSeq === b.toSeq)
  }

  test("graft.write_sort lays rows out sorted within every written file") {
    val dir = Files.createTempDirectory("graft-dist-sort").toString
    spark.range(10000).select(($"id" * 2654435761L % 9973).as("k"),
        $"id".as("v"))
      .repartition(4)
      .write.format("graft-orc").option("graft.write_sort", "k")
      .mode("append").save(dir)
    val byFile = spark.read.format("graft-orc").load(dir)
      .select($"_file", $"_pos", $"k").collect()
      .groupBy(_.getString(0))
    assert(byFile.size > 1)
    byFile.foreach { case (_, rows) =>
      val ks = rows.sortBy(_.getLong(1)).map(_.getLong(2))
      assert(ks.sameElements(ks.sorted),
        "rows must be sorted by k within each written file")
    }
  }

  test("open-writer cap: unsorted high-cardinality writes evict and " +
    "reopen instead of holding one writer per directory; exact results") {
    val dir = Files.createTempDirectory("graft-dist-cap").toString
    // one task, rows cycling through 5 partition values: a cap of 2
    // evicts on nearly every partition switch — correctness must not
    // depend on how many times a directory's writer was reopened
    spark.range(500)
      .select(($"id" % 5).cast("string").as("p"), $"id".as("v"))
      .coalesce(1)
      .write.format("graft-orc").partitionBy("p")
      .option("graft.manifest", "true")
      .option("graft.max_open_writers", "2")
      .mode("append").save(dir)
    val files = filesPerPartition(dir)
    assert(files.keySet.size == 5)
    assert(files.values.exists(_ > 1),
      s"interleaved input over a cap of 2 must produce reopened files: $files")
    val got = spark.read.format("graft-orc").load(dir)
    assert(got.count() == 500)
    assert(got.agg(sum($"v")).as[Long].head == (0L until 500).sum)
    // every row exactly once, partition values intact
    assert(got.filter($"p" === "3").select(sum($"v")).as[Long].head ==
      (0L until 500).filter(_ % 5 == 3).sum)
    // same write under the default cap: no eviction, one file per dir
    val dir2 = Files.createTempDirectory("graft-dist-cap-def").toString
    spark.range(500)
      .select(($"id" % 5).cast("string").as("p"), $"id".as("v"))
      .coalesce(1)
      .write.format("graft-orc").partitionBy("p")
      .mode("append").save(dir2)
    assert(filesPerPartition(dir2).values.forall(_ == 1))
    val bad = intercept[IllegalArgumentException] {
      spark.range(5).select(($"id" % 2).cast("string").as("p"),
          $"id".as("v"))
        .write.format("graft-orc").partitionBy("p")
        .option("graft.max_open_writers", "zero")
        .mode("append")
        .save(Files.createTempDirectory("graft-dist-cap-err").toString)
    }
    assert(bad.getMessage.contains("graft.max_open_writers"))
  }

  test("transform-partitioned writes auto-sort by source columns: one " +
    "file per directory even under a tiny writer cap (no reopens)") {
    val dir = Files.createTempDirectory("graft-dist-autosort").toString
    // 60 days x bucket(2) = 120 directories, input deliberately
    // shuffled, cap of 3: without the automatic within-task sort this
    // would reopen directories constantly; with it, day runs emit
    // contiguously and evictions only close finished runs
    spark.range(3000)
      .select(expr("timestamp_micros(1577836800000000 + " +
        "((id * 2654435761) % 60) * 86400000000)").as("ts"),
        ($"id" % 97).as("uid"), $"id".as("v"))
      .coalesce(1)
      .write.format("graft-orc")
      .option("graft.manifest", "true")
      .option("graft.max_open_writers", "3")
      .option("graft.partition_spec", "days(ts), bucket(2, uid)")
      .mode("append").save(dir)
    val perDir = filesPerPartition(dir)
    assert(perDir.keySet.size == 60, s"60 day dirs, got ${perDir.keySet.size}")
    assert(perDir.values.forall(_ <= 2),
      s"one file per (day, bucket) directory — reopens happened: " +
        perDir.filter(_._2 > 2))
    val got = spark.read.format("graft-orc").load(dir)
    assert(got.count() == 3000)
    assert(got.agg(sum($"v")).as[Long].head == (0L until 3000).sum)
  }

  test("hash distribution composes with write_sort and a partitioned " +
    "manifest table; typed errors on bad options") {
    val dir = Files.createTempDirectory("graft-dist-both").toString
    src.write.format("graft-orc").partitionBy("p")
      .option("graft.manifest", "true")
      .option("graft.distribution_mode", "hash")
      .option("graft.write_sort", "v")
      .mode("append").save(dir)
    assert(filesPerPartition(dir).values.forall(_ === 1))
    val got = spark.read.format("graft-orc").load(dir)
    assert(got.count() === 3000)
    // sorted within the (single) file of each partition
    got.select($"p", $"_pos", $"v").collect()
      .groupBy(_.getAs[Any](0).toString)
      .foreach { case (_, rows) =>
        val vs = rows.sortBy(_.getLong(1)).map(_.getLong(2))
        assert(vs.sameElements(vs.sorted))
      }
    val e1 = intercept[IllegalArgumentException] {
      spark.range(5).toDF("v").write.format("graft-orc")
        .option("graft.distribution_mode", "hash")
        .mode("append")
        .save(Files.createTempDirectory("graft-dist-err").toString)
    }
    assert(e1.getMessage.contains("requires a partitioned table"))
    val e2 = intercept[IllegalArgumentException] {
      src.write.format("graft-orc").partitionBy("p")
        .option("graft.distribution_mode", "range")
        .mode("append")
        .save(Files.createTempDirectory("graft-dist-err2").toString)
    }
    assert(e2.getMessage.contains("none or hash"))
  }

  test("graft.distribution_mode as TBLPROPERTIES is a table DEFAULT: " +
    "catalog INSERTs and both MERGE write paths (append-rewritten " +
    "insert-only + true MoR delta) write ~one file per partition") {
    val wh = Files.createTempDirectory("graft-dist-wh").toString
    val cat = "gdist" + java.util.UUID.randomUUID().toString
      .replace("-", "").take(6)
    spark.conf.set(s"spark.sql.catalog.$cat",
      "graft.sources.v2.GraftOrcCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.default")
    val t = s"$cat.default.t"
    spark.sql(s"CREATE TABLE $t (k BIGINT, v STRING, p INT) " +
      "PARTITIONED BY (p) TBLPROPERTIES('graft.merge_mode'='mor', " +
      "'graft.distribution_mode'='hash')")
    def files(): Long =
      spark.sql(s"SELECT count(*) FROM $t.files").head().getLong(0)
    // catalog INSERT: the prop rides into the write options
    spark.range(400)
      .selectExpr("id AS k", "concat('x', id) AS v",
        "CAST(id % 4 AS INT) AS p")
      .repartition(8).createOrReplaceTempView("dist_src1")
    spark.sql(s"INSERT INTO $t SELECT * FROM dist_src1")
    val f1 = files()
    assert(f1 === 4L, s"clustered INSERT should write 4 files, got $f1")
    // insert-only MERGE (Spark rewrites it to an anti-join append)
    spark.range(400, 800)
      .selectExpr("id AS k", "concat('y', id) AS v",
        "CAST(id % 4 AS INT) AS p")
      .repartition(8).createOrReplaceTempView("dist_src2")
    spark.sql(s"MERGE INTO $t t USING dist_src2 b ON t.k = b.k " +
      "WHEN NOT MATCHED THEN INSERT (k, v, p) VALUES (b.k, b.v, b.p)")
    val f2 = files()
    assert(f2 - f1 === 4L,
      s"clustered insert-only MERGE should add 4 files, got ${f2 - f1}")
    // true delta MERGE (matched UPDATE forces the MoR position-delta
    // write): its INSERT rows cluster the same way
    spark.range(600, 1000)
      .selectExpr("id AS k", "concat('z', id) AS v",
        "CAST(id % 4 AS INT) AS p")
      .repartition(8).createOrReplaceTempView("dist_src3")
    spark.sql(s"MERGE INTO $t t USING dist_src3 b ON t.k = b.k " +
      "WHEN MATCHED THEN UPDATE SET v = b.v " +
      "WHEN NOT MATCHED THEN INSERT (k, v, p) VALUES (b.k, b.v, b.p)")
    val f3 = files()
    assert(f3 - f2 === 4L,
      s"clustered delta MERGE should add 4 data files, got ${f3 - f2}")
    assert(spark.table(t).count() === 1000L)
    spark.sql(s"DROP TABLE $t")
  }

  test("graft.write_sort on a MoR table sorts the DELTA write's insert " +
    "files too: every file a delta MERGE writes is internally ordered " +
    "on the sort column") {
    val wh = Files.createTempDirectory("graft-dist-ws-wh").toString
    val cat = "gdws" + java.util.UUID.randomUUID().toString
      .replace("-", "").take(6)
    spark.conf.set(s"spark.sql.catalog.$cat",
      "graft.sources.v2.GraftOrcCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.default")
    val t = s"$cat.default.t"
    spark.sql(s"CREATE TABLE $t (k BIGINT, v STRING, p INT) " +
      "PARTITIONED BY (p) TBLPROPERTIES('graft.merge_mode'='mor', " +
      "'graft.distribution_mode'='hash', 'graft.write_sort'='k')")
    spark.range(200)
      .selectExpr("id AS k", "concat('x', id) AS v",
        "CAST(id % 4 AS INT) AS p")
      .createOrReplaceTempView("ws_seed")
    spark.sql(s"INSERT INTO $t SELECT * FROM ws_seed")
    // shuffled source so unsorted input is guaranteed; the MATCHED
    // UPDATE forces the true MoR delta write path
    spark.range(100, 300)
      .selectExpr("id AS k", "concat('y', id) AS v",
        "CAST(id % 4 AS INT) AS p")
      .orderBy(expr("hash(id)")).repartition(8)
      .createOrReplaceTempView("ws_src")
    spark.sql(s"MERGE INTO $t t USING ws_src b ON t.k = b.k " +
      "WHEN MATCHED THEN UPDATE SET v = b.v " +
      "WHEN NOT MATCHED THEN INSERT (k, v, p) VALUES (b.k, b.v, b.p)")
    assert(spark.table(t).count() === 300L)
    // every physical file is internally sorted on k
    val rows = spark.read.format("graft-orc")
      .load(s"$wh/default/t")
      .select($"_file", $"_pos", $"k")
      .as[(String, Long, Long)].collect()
    rows.groupBy(_._1).foreach { case (f, rs) =>
      val ks = rs.sortBy(_._2).map(_._3)
      assert(ks.sameElements(ks.sorted),
        s"file $f not sorted on k: ${ks.take(10).mkString(",")}")
    }
    spark.sql(s"DROP TABLE $t")
  }
}
