package graft

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.v2.{GraftOrcManifest, GraftOrcPartitionSpec, PartField}

/** Hidden partitioning ([[graft.sources.v2.GraftOrcPartitionSpec]], the
  * Iceberg transform model): `days(ts)` / `bucket(n, id)` /
  * `truncate(w, s)` derive the directory layout while the SOURCE column
  * stays in the data files — queries filter on the source and the scan
  * prunes directories the user never named. The spec pins the layout,
  * the round trip, the pruning (exact file counts, not just "fewer"),
  * the null/boundary edges, spec inheritance and its typed errors, and
  * DML on a transform-partitioned catalog table.
  */
class GraftOrcHiddenPartitionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def conf = spark.sparkContext.hadoopConfiguration
  private def fsOf(dir: String) = new Path(dir).getFileSystem(conf)

  /** 3 UTC days x 4 rows of (ts, id, name, v), ids 0..11, one null-ts +
    * one null-id row appended.
    */
  private def sample = {
    val base = spark.range(0, 12).selectExpr(
      "timestamp_micros(cast(1577836800000000 + (id div 4) * 86400000000 " +
        "+ (id % 4) * 3600000000 as long)) AS ts", // 2020-01-01 + ...
      "id",
      "concat('name', lpad(cast(id as string), 2, '0')) AS name",
      "cast(id * 10 as double) AS v")
    base.unionByName(spark.sql(
      "SELECT cast(null as timestamp) AS ts, cast(99 as bigint) AS id, " +
        "'nullts' AS name, cast(990.0 as double) AS v " +
        "UNION ALL SELECT timestamp'2020-01-02 03:00:00', " +
        "cast(null as bigint), 'nullid', 991.0"))
  }

  private def write(dir: String, spec: String,
                    df: org.apache.spark.sql.DataFrame = sample): Unit =
    df.coalesce(1).write.format("graft-orc")
      .option("graft.manifest", "true")
      .option("graft.partition_spec", spec)
      .mode("append").save(dir)

  private def leafDirs(dir: String): Seq[String] = {
    val fs = fsOf(dir)
    def walk(p: Path): Seq[String] = fs.listStatus(p).toSeq.flatMap { st =>
      if (st.isDirectory && st.getPath.getName.contains("="))
        walk(st.getPath) :+ st.getPath.getName
      else Nil
    }
    walk(new Path(dir)).sorted
  }

  private def planned(dir: String,
                      filters: org.apache.spark.sql.sources.Filter*): Int = {
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.util.CaseInsensitiveStringMap
    import graft.sources.v2.{GraftOrcScan, GraftOrcScanBuilder}
    val opts = new CaseInsensitiveStringMap(Map("path" -> dir,
      "graft.pack_small_files" -> "false").asJava)
    val schema = new graft.sources.v2.GraftOrcDataSource().inferSchema(opts)
    val b = new GraftOrcScanBuilder(schema, opts)
    b.pushFilters(filters.toArray)
    b.build().asInstanceOf[GraftOrcScan].planInputPartitions().length
  }

  test("days(ts): directory layout, hidden column, exact round trip") {
    val dir = Files.createTempDirectory("graft-hp-days").toString
    write(dir, "days(ts)")
    val dirs = leafDirs(dir)
    assert(dirs == Seq("ts_day=2020-01-01", "ts_day=2020-01-02",
      "ts_day=2020-01-03", "ts_day=__HIVE_DEFAULT_PARTITION__"),
      dirs.toString)
    val back = spark.read.format("graft-orc").load(dir)
    // the transform directory is NOT a table column; the source is
    assert(back.columns.toSeq == Seq("ts", "id", "name", "v"))
    val a = back.orderBy("name").collect().map(_.toSeq).toSeq
    val b = sample.orderBy("name").collect().map(_.toSeq).toSeq
    assert(a == b)
  }

  test("days(ts): source-column filters prune exact directory counts " +
    "and return exact results") {
    val dir = Files.createTempDirectory("graft-hp-prune").toString
    write(dir, "days(ts)")
    import org.apache.spark.sql.sources._
    val full = planned(dir)
    assert(full == 4, s"one file per day + null dir, got $full")
    // equality inside a day -> that day only
    assert(planned(dir, EqualTo("ts",
      java.time.Instant.parse("2020-01-02T01:00:00Z"))) == 1)
    // range spanning the boundary micro-exactly: [d2 00:00, d3 00:00]
    // touches both days
    assert(planned(dir,
      GreaterThanOrEqual("ts", java.time.Instant.parse("2020-01-02T00:00:00Z")),
      LessThanOrEqual("ts", java.time.Instant.parse("2020-01-03T00:00:00Z"))) == 2)
    // strict < day start excludes that day
    assert(planned(dir,
      GreaterThanOrEqual("ts", java.time.Instant.parse("2020-01-02T00:00:00Z")),
      LessThan("ts", java.time.Instant.parse("2020-01-03T00:00:00Z"))) == 1)
    // nulls route: IsNull -> only the null dir; IsNotNull drops it
    assert(planned(dir, IsNull("ts")) == 1)
    assert(planned(dir, IsNotNull("ts")) == 3)
    // results stay exact (filters are residual; pruning only skips I/O)
    val back = spark.read.format("graft-orc").load(dir)
    assert(back.filter($"ts" >= "2020-01-02" && $"ts" < "2020-01-03")
      .count() == sample.filter($"ts" >= "2020-01-02" && $"ts" < "2020-01-03")
      .count())
    assert(back.filter($"ts".isNull).select("name").as[String]
      .collect().toSeq == Seq("nullts"))
  }

  test("bucket(4, id): equality and IN prune to their buckets; ranges " +
    "keep everything; bucket matches Spark's murmur3 hash") {
    val dir = Files.createTempDirectory("graft-hp-bucket").toString
    write(dir, "bucket(4, id)")
    val dirs = leafDirs(dir)
    assert(dirs.forall(d => d.startsWith("id_bucket=")), dirs.toString)
    // the writer's bucket = pmod(hash(id), 4) with Spark's own hash()
    val expectBuckets = sample.filter($"id".isNotNull)
      .select(pmod(hash($"id"), lit(4))).distinct()
      .as[Int].collect().toSet
    assert(dirs.filterNot(_.contains("__HIVE")).map(
      _.stripPrefix("id_bucket=").toInt).toSet == expectBuckets)
    import org.apache.spark.sql.sources._
    val full = planned(dir)
    assert(planned(dir, EqualTo("id", 5L)) == 1)
    val twoBuckets = Seq(5L, 7L).map(i =>
      GraftOrcPartitionSpec.bucketOf(i,
        org.apache.spark.sql.types.LongType, 4)).distinct.size
    assert(planned(dir, In("id", Array[Any](5L, 7L))) == twoBuckets)
    // no order correspondence: a range must not prune via the BUCKET
    // (the all-null file still drops through its stat sidecar — that is
    // the sidecar layer, not the bucket layer)
    assert(planned(dir, GreaterThan("id", -1L)) == full - 1)
    assert(planned(dir, IsNull("id")) == 1)
    // correctness through the engine
    val back = spark.read.format("graft-orc").load(dir)
    assert(back.filter($"id" === 5).select("name").as[String]
      .collect().toSeq == Seq("name05"))
    assert(back.filter($"id".isNull).select("name").as[String]
      .collect().toSeq == Seq("nullid"))
  }

  test("truncate(4, name): prefix directories; equality and prefix " +
    "LIKE prune") {
    val dir = Files.createTempDirectory("graft-hp-trunc").toString
    write(dir, "truncate(4, name)")
    val dirs = leafDirs(dir)
    assert(dirs.contains("name_trunc=name") && dirs.contains(
      "name_trunc=null"), dirs.toString) // nullts/nullid -> "null"
    import org.apache.spark.sql.sources._
    val full = planned(dir)
    assert(full == 2)
    assert(planned(dir, EqualTo("name", "name05")) == 1)
    assert(planned(dir, StringStartsWith("name", "null")) == 1)
    val back = spark.read.format("graft-orc").load(dir)
    assert(back.filter($"name" === "name05").count() == 1)
  }

  test("mixed spec: identity strips its column from files, transforms " +
    "keep theirs; months/years/hours layouts") {
    val dir = Files.createTempDirectory("graft-hp-mixed").toString
    val df = sample.filter($"ts".isNotNull && $"id".isNotNull)
      .withColumn("cat", expr("if(id < 6, 'a', 'b')"))
    df.coalesce(1).write.format("graft-orc")
      .option("graft.manifest", "true")
      .option("graft.partition_spec", "cat, hours(ts)")
      .mode("append").save(dir)
    val dirs = leafDirs(dir)
    assert(dirs.exists(_.startsWith("cat=")) &&
      dirs.exists(_.startsWith("ts_hour=2020-01-01-00")), dirs.toString)
    val back = spark.read.format("graft-orc").load(dir)
    assert(back.columns.sorted.toSeq == df.columns.sorted.toSeq)
    assert(back.orderBy("name").collect().map(_.toSeq).toSeq ==
      df.orderBy("name").collect().map(_.toSeq).toSeq)
    // a raw file must carry ts (hidden source) but NOT cat (identity)
    val fs = fsOf(dir)
    val aFile = fs.listFiles(new Path(dir), true)
    var orc: Option[Path] = None
    while (aFile.hasNext && orc.isEmpty) {
      val f = aFile.next().getPath
      if (f.getName.endsWith(".orc") && !f.toString.contains("_graft"))
        orc = Some(f)
    }
    val raw = spark.read.orc(orc.get.toString)
    assert(raw.columns.contains("ts") && !raw.columns.contains("cat"))

    // months / years variants
    val dirM = Files.createTempDirectory("graft-hp-month").toString
    write(dirM, "months(ts)")
    assert(leafDirs(dirM).contains("ts_month=2020-01"))
    val dirY = Files.createTempDirectory("graft-hp-year").toString
    write(dirY, "years(ts)")
    assert(leafDirs(dirY).contains("ts_year=2020"))
  }

  test("optionless append INHERITS the persisted spec; a conflicting " +
    "spec and layout-breaking DDL are refused") {
    val dir = Files.createTempDirectory("graft-hp-inherit").toString
    write(dir, "days(ts)")
    // no option, no partitionBy: lands in the same layout
    sample.coalesce(1).write.format("graft-orc").mode("append").save(dir)
    assert(spark.read.format("graft-orc").load(dir).count() ==
      sample.count() * 2)
    assert(leafDirs(dir).count(_.startsWith("ts_day=2020-01-01")) == 1)
    val e = intercept[IllegalArgumentException] {
      write(dir, "days(ts), bucket(4, id)")
    }
    // the persisted spec is the contract on spec tables (since spec
    // evolution, physical dir keys can legitimately span generations)
    assert(e.getMessage.contains("does not match the table's persisted " +
      "spec"), e.getMessage)
    // bucket-count drift on the same directory key is caught by the
    // persisted-spec check
    val dir2 = Files.createTempDirectory("graft-hp-drift").toString
    write(dir2, "bucket(4, id)")
    val e2 = intercept[IllegalArgumentException] { write(dir2, "bucket(8, id)") }
    assert(e2.getMessage.contains("persisted spec"), e2.getMessage)
    // the transform SOURCE is layout-load-bearing: renaming it is refused
    val fs = fsOf(dir)
    val meta = GraftOrcManifest.readSnapshot(fs, new Path(dir))
      .get.meta.get
    val e3 = intercept[IllegalArgumentException] {
      graft.sources.v2.GraftOrcSchema.renameColumn(meta, "ts", "ts2")
    }
    assert(e3.getMessage.contains("cannot rename partition column"),
      e3.getMessage)
  }

  test("typed errors: no manifest, hash distribution, blind upsert, " +
    "bad types, unknown transform") {
    val dir = Files.createTempDirectory("graft-hp-err").toString
    val noManifest = intercept[IllegalArgumentException] {
      sample.write.format("graft-orc")
        .option("graft.partition_spec", "days(ts)").mode("append").save(dir)
    }
    assert(noManifest.getMessage.contains("requires a manifest table"),
      noManifest.getMessage)
    val hashMode = intercept[IllegalArgumentException] {
      sample.write.format("graft-orc")
        .option("graft.manifest", "true")
        .option("graft.partition_spec", "days(ts)")
        .option("graft.distribution_mode", "hash")
        .mode("append").save(dir)
    }
    assert(hashMode.getMessage.contains("not supported yet"),
      hashMode.getMessage)
    val badType = intercept[IllegalArgumentException] {
      sample.write.format("graft-orc")
        .option("graft.manifest", "true")
        .option("graft.partition_spec", "hours(name)")
        .mode("append").save(dir)
    }
    assert(badType.getMessage.contains("does not support column type"),
      badType.getMessage)
    val unknown = intercept[IllegalArgumentException] {
      sample.write.format("graft-orc")
        .option("graft.manifest", "true")
        .option("graft.partition_spec", "zorder(ts)")
        .mode("append").save(dir)
    }
    assert(unknown.getMessage.contains("unknown partition transform"),
      unknown.getMessage)
    // blind upsert over an NTZ time transform stays refused (no
    // zone-free Column route to NTZ micros; the writer path has one)
    val dirB = Files.createTempDirectory("graft-hp-upsntz").toString
    sample.withColumn("ts", $"ts".cast("timestamp_ntz"))
      .write.format("graft-orc").option("graft.manifest", "true")
      .option("graft.partition_spec", "days(ts)").mode("append")
      .save(dirB)
    val ups = intercept[IllegalArgumentException] {
      graft.sources.v2.GraftOrcEqDelete.upsert(spark, dirB,
        sample.withColumn("ts", $"ts".cast("timestamp_ntz")).limit(2),
        Seq("id"))
    }
    assert(ups.getMessage.contains("MERGE INTO"), ups.getMessage)
  }

  test("blind upsert into a transform-partitioned table (round 13): " +
    "staged rows land in writer-identical days()/bucket() directories, " +
    "old key versions read as deleted, transform pruning stays exact") {
    val dir = Files.createTempDirectory("graft-hp-ups").toString
    val base = sample.filter($"ts".isNotNull && $"id".isNotNull)
    base.repartition(2).write.format("graft-orc")
      .option("graft.manifest", "true")
      .option("graft.partition_spec", "days(ts), bucket(4, id)")
      .mode("append").save(dir)
    def leaf(d: String): Set[String] = {
      val out = collection.mutable.Set.empty[String]
      def walk(f: java.io.File, rel: List[String]): Unit =
        if (f.isDirectory && !f.getName.startsWith("_") &&
            !f.getName.startsWith(".")) {
          val nrel = if (f.getName.contains("=")) rel :+ f.getName else rel
          if (f.getName.contains("=")) out += f.getName
          f.listFiles().foreach(walk(_, nrel))
        }
      walk(new java.io.File(d), Nil)
      out.toSet
    }
    val writerDirs = leaf(dir)
    // the upsert batch: one key moves content (id=3, same ts -> same
    // dirs), one new key lands in a fresh day
    val batch = base.filter($"id" === 3)
      .select($"ts", $"id", lit("updated").as("name"), lit(-1.0).as("v"))
      .unionByName(spark.sql(
        "SELECT timestamp'2021-06-01 12:00:00' AS ts, " +
          "CAST(77 AS BIGINT) AS id, 'new' AS name, 7.0 AS v"))
    graft.sources.v2.GraftOrcEqDelete.upsert(spark, dir, batch, Seq("id"))
    // the updated key's staged file reuses the EXACT writer directories
    val upsDirs = leaf(dir)
    assert(writerDirs.subsetOf(upsDirs), "writer dirs must be reused")
    val fresh = upsDirs -- writerDirs
    assert(fresh.exists(_.startsWith("ts_day=2021-06-01")) &&
      fresh.forall(d => d.startsWith("ts_day=2021-06-01") ||
        d.startsWith("id_bucket=")), fresh.toString)
    val back = spark.read.format("graft-orc").load(dir)
    assert(back.count() == 13) // 12 originals (id=3 replaced) + id=77
    assert(back.filter($"id" === 3).select("name", "v")
      .as[(String, Double)].collect().toSeq == Seq(("updated", -1.0)))
    assert(back.filter($"id" === 77).select("name").as[String]
      .collect().toSeq == Seq("new"))
    // transform pruning still engages on the mixed table: a day filter
    // must not read the other days' files (plan-level via count of
    // planned partitions through the scan builder)
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.util.CaseInsensitiveStringMap
    import org.apache.spark.sql.sources.EqualTo
    import graft.sources.v2.{GraftOrcScan, GraftOrcScanBuilder}
    val opts = new CaseInsensitiveStringMap(Map("path" -> dir,
      "graft.pack_small_files" -> "false").asJava)
    val schema = new graft.sources.v2.GraftOrcDataSource()
      .inferSchema(opts)
    val b = new GraftOrcScanBuilder(schema, opts)
    b.pushFilters(Array[org.apache.spark.sql.sources.Filter](
      EqualTo("id", 77L)))
    val kept = b.build().asInstanceOf[GraftOrcScan]
      .planInputPartitions().length
    val full = {
      val b2 = new GraftOrcScanBuilder(schema, opts)
      b2.build().asInstanceOf[GraftOrcScan].planInputPartitions().length
    }
    assert(kept < full, s"bucket pruning inactive: $kept of $full")
    // purge materializes the equality delete over the transform layout
    assert(graft.sources.v2.GraftOrcMor.purge(spark, dir) > 0)
    assert(spark.read.format("graft-orc").load(dir).count() == 13)
  }

  test("catalog: CREATE TABLE PARTITIONED BY (days(ts), bucket(4, id)) " +
    "+ INSERT + DELETE + UPDATE keep the hidden layout and exact state") {
    val wh = Files.createTempDirectory("graft-hp-cat").toString
    spark.conf.set("spark.sql.catalog.hpcat",
      "graft.sources.v2.GraftOrcCatalog")
    spark.conf.set("spark.sql.catalog.hpcat.warehouse", wh)
    spark.sql("CREATE TABLE hpcat.ev (ts TIMESTAMP, id BIGINT, " +
      "name STRING, v DOUBLE) PARTITIONED BY (days(ts), bucket(4, id))")
    sample.filter($"ts".isNotNull && $"id".isNotNull)
      .createOrReplaceTempView("hp_src")
    spark.sql("INSERT INTO hpcat.ev SELECT * FROM hp_src")
    val dirs = leafDirs(s"$wh/ev")
    assert(dirs.exists(_.startsWith("ts_day=")) &&
      dirs.exists(_.startsWith("id_bucket=")), dirs.toString)
    assert(spark.sql("SELECT * FROM hpcat.ev").count() == 12)
    // DESCRIBE surfaces the REAL transforms
    val descr = spark.sql("DESCRIBE TABLE hpcat.ev").collect()
      .map(_.toSeq.mkString(" ")).mkString("\n")
    assert(descr.contains("days(ts)") && descr.contains("bucket(4, id)"),
      descr)
    spark.sql("DELETE FROM hpcat.ev WHERE id = 5")
    assert(spark.sql("SELECT count(*) FROM hpcat.ev").as[Long].head == 11)
    spark.sql("UPDATE hpcat.ev SET v = v + 1000 WHERE id = 6")
    assert(spark.sql("SELECT v FROM hpcat.ev WHERE id = 6")
      .as[Double].head == 1060.0)
    // rewritten files stayed inside transform dirs (no bare files at
    // the root, layout intact)
    val after = leafDirs(s"$wh/ev")
    assert(after.forall(d => d.startsWith("ts_day=") ||
      d.startsWith("id_bucket=")), after.toString)
    // pruning still exact post-DML through SQL (filter on the source)
    assert(spark.sql("SELECT name FROM hpcat.ev WHERE id = 6")
      .as[String].collect().toSeq == Seq("name06"))
    spark.sql("DROP TABLE hpcat.ev")
  }

  test("spec parsing round-trips and rejects junk") {
    val spec = GraftOrcPartitionSpec.parseOption(
      "days(ts), bucket(16, id), truncate(4, name), cat")
    assert(spec == Seq(PartField("ts", "day"),
      PartField("id", "bucket", 16), PartField("name", "trunc", 4),
      PartField("cat", "identity")))
    assert(GraftOrcPartitionSpec.parseCanonical(spec.map(_.canonical))
      == spec)
    // operand order tolerance
    assert(GraftOrcPartitionSpec.parseOption("bucket(id, 16)") ==
      Seq(PartField("id", "bucket", 16)))
    intercept[IllegalArgumentException] {
      GraftOrcPartitionSpec.parseOption("bucket(id)") }
    intercept[IllegalArgumentException] {
      GraftOrcPartitionSpec.parseOption("days(a, b)") }
  }

  test("an UNPARSEABLE bucket directory value is unknown, not the null " +
    "partition: the file is kept for equality filters; a true null " +
    "dir still prunes") {
    import org.apache.spark.sql.sources.EqualTo
    import org.apache.spark.sql.types.LongType
    import graft.sources.v2.OrcFileEntry
    val spec = Seq(PartField("id", "bucket", 4))
    val typeOf = (n: String) =>
      if (n.equalsIgnoreCase("id")) Some(LongType: org.apache.spark.sql
        .types.DataType) else None
    def entry(dirVal: String) = OrcFileEntry("/t/id_bucket=x/f.orc", 1L,
      Map("id_bucket" -> dirVal))
    // hand-renamed/corrupt directory: pruning must NOT prove it empty
    // (None in bucketEval's contract means "the null partition", which
    // holds no id=7 — mapping a parse failure there vanishes live rows)
    assert(GraftOrcPartitionSpec.hiddenPrune(Seq(entry("garbage")),
      Seq(EqualTo("id", 7L)), spec, typeOf).nonEmpty,
      "corrupt bucket dir must be kept, not proven null")
    // the genuine null partition still prunes for an equality
    assert(GraftOrcPartitionSpec.hiddenPrune(Seq(entry(null)),
      Seq(EqualTo("id", 7L)), spec, typeOf).isEmpty,
      "null-partition dir holds only nulls; id=7 prunes it")
    // and a matching numeric dir is kept
    val b7 = GraftOrcPartitionSpec.bucketOf(7L, LongType, 4).toString
    assert(GraftOrcPartitionSpec.hiddenPrune(Seq(entry(b7)),
      Seq(EqualTo("id", 7L)), spec, typeOf).nonEmpty)
  }

  test("truncate over SMALLINT/TINYINT sources boxes keys at the " +
    "declared width on both the directory-decode and the function " +
    "side — SPJ key grouping compares these boxed values") {
    import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
    import org.apache.spark.sql.connector.catalog.functions.ScalarFunction
    import org.apache.spark.sql.types._
    import graft.sources.v2.GraftOrcFunctions
    for ((dt, mk, want) <- Seq[(DataType, Any, Any)](
      (ShortType, 9.toShort, 8.toShort),
      (ByteType, 9.toByte, 8.toByte),
      (IntegerType, 9, 8))) {
      val kv = GraftOrcPartitionSpec.keyValue(
        PartField("id", "trunc", 4), "8", dt)
      assert(kv == GraftOrcPartitionSpec.keyValue(
        PartField("id", "trunc", 4), "8", dt))
      val bound = GraftOrcFunctions.All("truncate")
        .bind(StructType(Seq(StructField("w", IntegerType),
          StructField("col", dt)))).asInstanceOf[ScalarFunction[Any]]
      val got = bound.produceResult(
        new GenericInternalRow(Array[Any](4, mk)))
      assert(got == want, s"$dt: got $got (${got.getClass}) want $want")
      // the decoded directory key and the function result must be EQUAL
      // as boxed values (a boxed Integer never equals a boxed Short)
      assert(kv == got,
        s"$dt: keyValue $kv (${kv.getClass}) != produceResult " +
          s"$got (${got.getClass})")
    }
  }
}
