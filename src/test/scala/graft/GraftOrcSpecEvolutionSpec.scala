package graft

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.v2.{GraftOrcManifest, GraftOrcPartitionSpec, GraftOrcSchema}

/** Partition-spec EVOLUTION ([[GraftOrcSchema.setPartitionSpec]],
  * Iceberg's partition evolution): the spec changes as ONE metadata
  * commit, existing files keep pruning by the layout they were written
  * with, new writes use the new one — no rewrite at any table size.
  * The spec pins per-file spec resolution, the absent-directory
  * conservatism (a file predating a field must never be pruned by it),
  * the identity-invariance guard, the SQL procedure, and the SPJ
  * fallback on mixed-spec tables.
  */
class GraftOrcSpecEvolutionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def conf = spark.sparkContext.hadoopConfiguration
  private def fsOf(dir: String) = new Path(dir).getFileSystem(conf)

  private def rows(lo: Int, hi: Int) = spark.range(lo, hi).selectExpr(
    "id",
    "timestamp_micros(cast(1577836800000000 + (id % 3) * 86400000000 " +
      "as long)) AS ts",
    "cast(id * 2 as double) AS v")

  private def planned(dir: String,
                      filters: org.apache.spark.sql.sources.Filter*): Int = {
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.util.CaseInsensitiveStringMap
    import graft.sources.v2.{GraftOrcScan, GraftOrcScanBuilder}
    // this helper counts planned partitions as a FILE-PRUNING proxy —
    // small-file packing would fold surviving files into shared tasks
    // and break the equivalence, so it is switched off here
    val opts = new CaseInsensitiveStringMap(Map("path" -> dir,
      "graft.pack_small_files" -> "false").asJava)
    val schema = new graft.sources.v2.GraftOrcDataSource().inferSchema(opts)
    val b = new GraftOrcScanBuilder(schema, opts)
    b.pushFilters(filters.toArray)
    b.build().asInstanceOf[GraftOrcScan].planInputPartitions().length
  }

  test("bucket(4) -> bucket(8): old files prune by the OLD buckets, " +
    "new files by the new; mixed reads exact; new appends lay out 8") {
    val dir = Files.createTempDirectory("graft-pe-bucket").toString
    rows(0, 100).coalesce(1).write.format("graft-orc")
      .option("graft.manifest", "true")
      .option("graft.partition_spec", "bucket(4, id)")
      .mode("append").save(dir)
    val before = GraftOrcManifest.readSnapshot(fsOf(dir), new Path(dir))
      .get.entries.size
    val meta = GraftOrcSchema.setPartitionSpec(conf, dir, "bucket(8, id)")
    assert(meta.parts == Seq("id:bucket:8"))
    assert(GraftOrcPartitionSpec.specEvolved(meta))
    // optionless append inherits the NEW spec and writes 8-bucket dirs
    rows(100, 200).coalesce(1).write.format("graft-orc")
      .mode("append").save(dir)
    val snap = GraftOrcManifest.readSnapshot(fsOf(dir), new Path(dir)).get
    // 4 old bucket(4) files at the pre-evolution version, 8 new
    // bucket(8) files stamped with the evolved schemaV (entry order is
    // path-sorted, not append-ordered)
    assert(snap.entries.count(_.schemaV == meta.schemaV) == 8 &&
      snap.entries.count(_.schemaV < meta.schemaV) == before,
      snap.entries.map(_.schemaV).toString)
    import org.apache.spark.sql.sources._
    // equality on the key prunes EACH generation under ITS OWN bucket
    // count: id=7 keeps 1 of the 4 old bucket(4) files (the 3 siblings
    // drop by BUCKET — their id stats all cover 7), id=150 keeps 1 of
    // the 8 new bucket(8) files; the cross-generation file drops via
    // its stat sidecar (disjoint id ranges)
    val full = planned(dir)
    assert(full == 12, s"4 old + 8 new bucket dirs, got $full")
    assert(planned(dir, EqualTo("id", 7L)) == 1)
    assert(planned(dir, EqualTo("id", 150L)) == 1)
    // results exact across generations
    val back = spark.read.format("graft-orc").load(dir)
    assert(back.count() == 200)
    assert(back.filter($"id" === 7L).select("v").as[Double]
      .collect().toSeq == Seq(14.0))
    assert(back.filter($"id" === 150L).select("v").as[Double]
      .collect().toSeq == Seq(300.0))
    // an append still declaring the OLD spec is refused with the
    // persisted-spec error
    val e = intercept[IllegalArgumentException] {
      rows(200, 210).write.format("graft-orc")
        .option("graft.partition_spec", "bucket(4, id)")
        .mode("append").save(dir)
    }
    assert(e.getMessage.contains("persisted spec"), e.getMessage)
  }

  test("adding days(ts): files predating the field are NEVER pruned by " +
    "it; new files prune; partitions metadata unions the dir keys") {
    val dir = Files.createTempDirectory("graft-pe-add").toString
    rows(0, 60).coalesce(1).write.format("graft-orc")
      .option("graft.manifest", "true")
      .option("graft.partition_spec", "bucket(4, id)")
      .mode("append").save(dir)
    val oldPlanned = planned(dir)
    GraftOrcSchema.setPartitionSpec(conf, dir, "bucket(4, id), days(ts)")
    rows(60, 120).coalesce(1).write.format("graft-orc")
      .mode("append").save(dir)
    import org.apache.spark.sql.sources._
    // a day filter: ALL old files stay (no ts_day dir -> unknown),
    // new files prune to the one matching day dir set
    val full = planned(dir)
    val day = planned(dir,
      GreaterThanOrEqual("ts", java.time.Instant.parse("2020-01-02T00:00:00Z")),
      LessThan("ts", java.time.Instant.parse("2020-01-03T00:00:00Z")))
    val newFull = full - oldPlanned
    assert(day < full && day >= oldPlanned,
      s"old=$oldPlanned newFull=$newFull day=$day full=$full")
    // exact: ids 0..119 with id % 3 == 1 all have ts on 2020-01-02
    val back = spark.read.format("graft-orc").load(dir)
      .filter($"ts" >= "2020-01-02" && $"ts" < "2020-01-03")
    assert(back.count() == 40)
    // partitions metadata surfaces the UNION of dir keys
    val parts = graft.sources.v2.GraftOrcMetadata
      .partitions(spark, dir).columns.toSeq
    assert(parts.contains("id_bucket") && parts.contains("ts_day"), parts)
  }

  test("identity fields cannot evolve; a no-op spec is refused; the " +
    "CALL procedure commits and reports") {
    val wh = Files.createTempDirectory("graft-pe-wh").toString
    spark.conf.set("spark.sql.catalog.pecat",
      "graft.sources.v2.GraftOrcCatalog")
    spark.conf.set("spark.sql.catalog.pecat.warehouse", wh)
    spark.sql("CREATE TABLE pecat.t (id BIGINT, ts TIMESTAMP, cat STRING)" +
      " PARTITIONED BY (cat, bucket(4, id))")
    spark.sql("INSERT INTO pecat.t SELECT id, timestamp'2020-01-01', " +
      "'a' FROM range(20)")
    val rec = spark.sql(
      "CALL pecat.system.set_partition_spec('t', 'cat, bucket(16, id)')")
      .collect()
    assert(rec.length == 1 &&
      rec(0).getString(0) == "cat, bucket(16, id)", rec.mkString)
    // DESCRIBE reflects the evolved spec
    val descr = spark.sql("DESCRIBE TABLE pecat.t").collect()
      .map(_.toSeq.mkString(" ")).mkString("\n")
    assert(descr.contains("bucket(16, id)"), descr)
    // identity membership is frozen
    val e = intercept[Exception] {
      spark.sql("CALL pecat.system.set_partition_spec('t', " +
        "'bucket(16, id)')").collect()
    }
    assert(e.getMessage.contains("IDENTITY"), e.getMessage)
    val e2 = intercept[Exception] {
      spark.sql("CALL pecat.system.set_partition_spec('t', " +
        "'cat, bucket(16, id)')").collect()
    }
    assert(e2.getMessage.contains("already"), e2.getMessage)
    // the evolution bookkeeping props are engine state, not user knobs —
    // a hand-set value would silently re-spec history for on-disk files
    val e3 = intercept[Exception] {
      spark.sql("ALTER TABLE pecat.t SET TBLPROPERTIES(" +
        "'graft.parts.history'='junk')")
    }
    assert(e3.getMessage.contains("reserved"), e3.getMessage)
    val e4 = intercept[Exception] {
      spark.sql("ALTER TABLE pecat.t UNSET TBLPROPERTIES(" +
        "'graft.parts.since')")
    }
    assert(e4.getMessage.contains("reserved"), e4.getMessage)
    // an ordinary graft.* knob still sets fine (documented surface)
    spark.sql("ALTER TABLE pecat.t SET TBLPROPERTIES('graft.key'='id')")
    spark.sql("DROP TABLE pecat.t")
  }

  test("time travel across an evolution reads the old snapshot pruned " +
    "under the OLD spec") {
    val dir = Files.createTempDirectory("graft-pe-tt").toString
    rows(0, 40).coalesce(1).write.format("graft-orc")
      .option("graft.manifest", "true")
      .option("graft.partition_spec", "bucket(4, id)")
      .mode("append").save(dir)
    GraftOrcSchema.setPartitionSpec(conf, dir, "bucket(8, id)")
    rows(40, 80).coalesce(1).write.format("graft-orc")
      .mode("append").save(dir)
    // the addressed snapshot predates the evolution: its state (40
    // rows) and its pruning both resolve under the bucket(4) layout
    val at1 = spark.read.format("graft-orc")
      .option("graft.snapshot_id", "1").load(dir)
    assert(at1.count() == 40)
    assert(at1.filter($"id" === 7L).select("v").as[Double]
      .collect().toSeq == Seq(14.0))
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.util.CaseInsensitiveStringMap
    import org.apache.spark.sql.sources._
    import graft.sources.v2.{GraftOrcScan, GraftOrcScanBuilder}
    val opts = new CaseInsensitiveStringMap(Map("path" -> dir,
      "graft.snapshot_id" -> "1",
      "graft.pack_small_files" -> "false").asJava)
    val schema = new graft.sources.v2.GraftOrcDataSource().inferSchema(opts)
    val b = new GraftOrcScanBuilder(schema, opts)
    b.pushFilters(Array[Filter](EqualTo("id", 7L)))
    val planned1 = b.build().asInstanceOf[GraftOrcScan]
      .planInputPartitions().length
    assert(planned1 == 1,
      s"id=7 at snapshot 1 must keep exactly 1 of the 4 bucket(4) " +
        s"files, got $planned1")
  }

  test("SPJ transform keys drop on a mixed-spec table (identity keys " +
    "and correctness keep working); compaction upgrades nothing") {
    val dir = Files.createTempDirectory("graft-pe-spj").toString
    rows(0, 50).coalesce(1).write.format("graft-orc")
      .option("graft.manifest", "true")
      .option("graft.partition_spec", "bucket(4, id)")
      .mode("append").save(dir)
    GraftOrcSchema.setPartitionSpec(conf, dir, "bucket(8, id)")
    rows(50, 100).coalesce(1).write.format("graft-orc")
      .mode("append").save(dir)
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.util.CaseInsensitiveStringMap
    import graft.sources.v2.{GraftOrcScan, GraftOrcScanBuilder}
    val opts = new CaseInsensitiveStringMap(Map("path" -> dir,
      "graft.preserve_partitioning" -> "true").asJava)
    val schema = new graft.sources.v2.GraftOrcDataSource().inferSchema(opts)
    val b = new GraftOrcScanBuilder(schema, opts)
    val scan = b.build().asInstanceOf[GraftOrcScan]
    assert(scan.outputPartitioning().isInstanceOf[
      org.apache.spark.sql.connector.read.partitioning.UnknownPartitioning],
      "mixed-spec files cannot report transform partition keys")
    assert(spark.read.format("graft-orc").load(dir).count() == 100)
  }

  // A rewrite (MoR purge / CoW DELETE) preserves its input group's
  // DIRECTORY layout while its content may upgrade to the current
  // schema — after spec evolution those two facts no longer share one
  // schemaV (a bucket(8)-laid file published at schemaV 0 would resolve
  // the bucket(4) spec and bucketEval would prove id=… false for every
  // dir >= 4, silently vanishing rows). Rewritten entries therefore
  // carry the group's frozen layout as OrcFileEntry.specV, and pruning
  // resolves specs from layoutV. These two tests pin the end-to-end
  // behavior the bug would break: exact point lookups on rewritten
  // files of BOTH generations, with pruning still active.

  private def probeExact(dir: String, ids: Seq[Long],
                         deleted: Long => Boolean): Unit = {
    val back = spark.read.format("graft-orc").load(dir)
    ids.foreach { id =>
      val got = back.filter($"id" === id).select("v").as[Double]
        .collect().toSeq
      val want = if (deleted(id)) Seq.empty[Double] else Seq(id * 2.0)
      assert(got == want, s"id=$id: got $got want $want " +
        "(a vanished row means the rewrite's layout version mispruned)")
    }
  }

  test("MoR purge after bucket(4)->bucket(8): rewrites keep their " +
    "frozen layout version (specV) and no row vanishes under pruning") {
    val dir = Files.createTempDirectory("graft-pe-purge").toString
    rows(0, 100).coalesce(1).write.format("graft-orc")
      .option("graft.manifest", "true")
      .option("graft.partition_spec", "bucket(4, id)")
      .mode("append").save(dir)
    val meta = GraftOrcSchema.setPartitionSpec(conf, dir, "bucket(8, id)")
    rows(100, 200).coalesce(1).write.format("graft-orc")
      .mode("append").save(dir)
    val t = "g_pe_purge"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"CREATE TABLE $t USING `graft-orc` LOCATION '$dir' " +
      "TBLPROPERTIES('graft.delete_mode'='mor')")
    try {
      // partial deletes in BOTH generations -> purge rewrites files of
      // both layouts into their original directories
      spark.sql(
        s"DELETE FROM $t WHERE id < 10 OR (id >= 100 AND id < 110)")
      assert(graft.sources.v2.GraftOrcMor.purge(spark, dir) > 0)
      val snap = GraftOrcManifest.readSnapshot(fsOf(dir), new Path(dir)).get
      val rewritten = snap.entries.filter(_.path.contains("w-purge"))
      assert(rewritten.nonEmpty)
      // no column evolution -> content version stays 0, but every
      // rewrite on this spec-evolved table must pin its layout
      assert(rewritten.forall(e => e.schemaV == 0L && e.specV >= 0L),
        rewritten.map(e => (e.schemaV, e.specV)).toString)
      // both frozen layouts present: pre-evolution files below the
      // evolved version, post-evolution files at it
      val lay = rewritten.map(_.layoutV).toSet
      assert(lay.exists(_ < meta.schemaV) && lay.contains(meta.schemaV),
        s"layout versions $lay vs evolved ${meta.schemaV}")
      def deleted(id: Long) = id < 10 || (id >= 100 && id < 110)
      probeExact(dir, Seq(13L, 42L, 77L, 88L, 97L, 111L, 133L, 150L,
        166L, 199L, 5L, 105L), deleted)
      assert(spark.read.format("graft-orc").load(dir).count() == 180)
      // pruning still ACTIVE (the fix must not degrade to keep-all):
      // an equality keeps at most one file per generation's live dirs
      import org.apache.spark.sql.sources.EqualTo
      val kept = planned(dir, EqualTo("id", 150L))
      assert(kept <= 2, s"id=150 must prune to <=2 files, got $kept")
    } finally spark.sql(s"DROP TABLE IF EXISTS $t")
  }

  test("CoW DELETE after bucket(4)->bucket(8): group rewrites pin " +
    "their layout version; point lookups stay exact") {
    val dir = Files.createTempDirectory("graft-pe-cow").toString
    rows(0, 100).coalesce(1).write.format("graft-orc")
      .option("graft.manifest", "true")
      .option("graft.partition_spec", "bucket(4, id)")
      .mode("append").save(dir)
    val meta = GraftOrcSchema.setPartitionSpec(conf, dir, "bucket(8, id)")
    rows(100, 200).coalesce(1).write.format("graft-orc")
      .mode("append").save(dir)
    val t = "g_pe_cow"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"CREATE TABLE $t USING `graft-orc` LOCATION '$dir'")
    try {
      spark.sql(
        s"DELETE FROM $t WHERE id < 10 OR (id >= 100 AND id < 110)")
      val snap = GraftOrcManifest.readSnapshot(fsOf(dir), new Path(dir)).get
      val rewritten = snap.entries.filter(_.path.contains("w-del"))
      assert(rewritten.nonEmpty)
      assert(rewritten.forall(e => e.schemaV == 0L && e.specV >= 0L),
        rewritten.map(e => (e.schemaV, e.specV)).toString)
      val lay = rewritten.map(_.layoutV).toSet
      assert(lay.exists(_ < meta.schemaV) && lay.contains(meta.schemaV),
        s"layout versions $lay vs evolved ${meta.schemaV}")
      def deleted(id: Long) = id < 10 || (id >= 100 && id < 110)
      probeExact(dir, Seq(13L, 42L, 77L, 88L, 97L, 111L, 133L, 150L,
        166L, 199L, 5L, 105L), deleted)
      assert(spark.read.format("graft-orc").load(dir).count() == 180)
    } finally spark.sql(s"DROP TABLE IF EXISTS $t")
  }
}
