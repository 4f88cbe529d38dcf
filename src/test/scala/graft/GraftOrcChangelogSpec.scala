package graft

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.v2.{GraftOrcChangelog, GraftOrcCompact, GraftOrcManifest, GraftOrcMor}

/** CDC changelog reads: row-level insert/delete changes between manifest
  * snapshots, reconstructed structurally — appends emit inserts, new
  * position sidecars emit deletes, file swaps emit the multiset
  * net-diff (so compaction and purge are change-neutral), and the
  * committer's op hint skips neutral pairs without reading them.
  */
class GraftOrcChangelogSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def seqOf(dir: String): Long = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    GraftOrcManifest.readSnapshot(fs, p).get.seq
  }

  private def seeded: DataFrame =
    spark.range(200).select($"id",
      when($"id" % 7 === 0, lit(null).cast("double"))
        .otherwise(($"id" % 100).cast("double")).as("bal"))

  private def fresh(tag: String, props: String = ""): (String, String) = {
    val dir = Files.createTempDirectory(s"graft-cdc-$tag").toString
    seeded.repartition(4).write.format("graft-orc")
      .option("graft.manifest", "true")
      .option("graft.manifest.retain", "10").mode("append").save(dir)
    val name = s"g_cdc_$tag"
    spark.sql(s"DROP TABLE IF EXISTS $name")
    spark.sql(s"CREATE TABLE $name USING `graft-orc` LOCATION '$dir'" +
      (if (props.isEmpty) "" else s" TBLPROPERTIES($props)"))
    (dir, name)
  }

  private def changes(dir: String, from: Long,
                      to: Option[Long] = None): DataFrame =
    GraftOrcChangelog.between(spark, dir, from, to)

  test("appends emit exactly the added rows as inserts") {
    val (dir, t) = fresh("append")
    try {
      val base = seqOf(dir)
      spark.range(1000, 1020).select($"id", lit(1.0).as("bal"))
        .write.format("graft-orc").mode("append").save(dir)
      val c = changes(dir, base)
      assert(c.filter($"_change_type" =!= "insert").count() === 0L)
      assert(c.select($"id").as[Long].collect().sorted.toSeq ===
        (1000L until 1020L))
      assert(c.select($"_change_seq").distinct().as[Long].collect()
        .toSeq === Seq(base + 1))
    } finally spark.sql(s"DROP TABLE IF EXISTS $t")
  }

  test("a MoR delete emits exactly the deleted row images as deletes") {
    val (dir, t) = fresh("mordel", "'graft.delete_mode'='mor'")
    try {
      val base = seqOf(dir)
      spark.sql(s"DELETE FROM $t WHERE bal < 30")
      val c = changes(dir, base)
      assert(c.filter($"_change_type" =!= "delete").count() === 0L)
      val want = seeded.filter($"bal" < 30).select($"id").as[Long]
        .collect().sorted.toSeq
      assert(c.select($"id").as[Long].collect().sorted.toSeq === want)
      // NULL bal rows survive the delete and must not appear
      assert(c.filter($"bal".isNull).count() === 0L)
    } finally spark.sql(s"DROP TABLE IF EXISTS $t")
  }

  test("a CoW UPDATE emits its net delete+insert pairs — copied-through " +
    "rows cancel in the multiset diff") {
    val (dir, t) = fresh("cowupd")
    try {
      val base = seqOf(dir)
      spark.sql(s"UPDATE $t SET bal = bal + 1000 WHERE bal >= 95")
      val c = changes(dir, base)
      val n = seeded.filter($"bal" >= 95).count()
      assert(c.filter($"_change_type" === "delete").count() === n)
      assert(c.filter($"_change_type" === "insert").count() === n)
      // old images carry the pre-update value, new images the post-update
      assert(c.filter($"_change_type" === "delete" && $"bal" >= 1000)
        .count() === 0L)
      assert(c.filter($"_change_type" === "insert" && $"bal" < 1000)
        .count() === 0L)
    } finally spark.sql(s"DROP TABLE IF EXISTS $t")
  }

  test("compaction and purge are change-neutral (op hint skips the " +
    "pair); the delete that preceded the purge still reads correctly") {
    val (dir, t) = fresh("neutral", "'graft.delete_mode'='mor'")
    try {
      val base = seqOf(dir)
      spark.sql(s"DELETE FROM $t WHERE bal < 10")
      val afterDelete = seqOf(dir)
      GraftOrcMor.purge(spark, dir)                 // op=purge snapshot
      GraftOrcCompact.compact(spark, dir)           // op=compact (if any)
      val tail = changes(dir, afterDelete)
      assert(tail.count() === 0L,
        "purge/compact rewrites must produce no logical changes")
      // and the full range still reports exactly the MoR delete
      val all = changes(dir, base)
      assert(all.filter($"_change_type" === "insert").count() === 0L)
      assert(all.select($"id").as[Long].collect().sorted.toSeq ===
        seeded.filter($"bal" < 10).select($"id").as[Long]
          .collect().sorted.toSeq)
    } finally spark.sql(s"DROP TABLE IF EXISTS $t")
  }

  test("delta MERGE changes emit deletes of old images and inserts of " +
    "new ones in one snapshot") {
    val (dir, t) = fresh("delta", "'graft.merge_mode'='mor'")
    spark.range(0, 300, 10).select($"id", lit(5.0).as("bal"))
      .createOrReplaceTempView("cdc_mrg_src")
    try {
      val base = seqOf(dir)
      spark.sql(
        s"""MERGE INTO $t t USING cdc_mrg_src s ON t.id = s.id
           |WHEN MATCHED THEN UPDATE SET bal = s.bal
           |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
      val c = changes(dir, base)
      val matched = seeded.filter($"id" % 10 === 0).count()
      assert(c.filter($"_change_type" === "delete").count() === matched)
      // inserts: updated images (matched) + brand-new keys (200..290)
      assert(c.filter($"_change_type" === "insert").count() ===
        matched + 10)
      assert(c.filter($"_change_type" === "insert" && $"id" === 290L)
        .count() === 1L)
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      spark.catalog.dropTempView("cdc_mrg_src")
    }
  }

  test("betweenPaired relabels one-delete+one-insert keys as " +
    "update_preimage/update_postimage; ambiguous keys, null keys, and " +
    "pure churn keep the raw vocabulary") {
    val (dir, t) = fresh("pairs")
    try {
      val base = seqOf(dir)
      // one snapshot: an UPDATE via upsert (delete+insert per key) ...
      graft.sources.v2.GraftOrcEqDelete.upsert(spark, dir,
        Seq((3L, 333.0), (10L, 1000.0)).toDF("id", "bal"), Seq("id"))
      // ... and one pure append snapshot
      spark.range(5000, 5003).select($"id", lit(1.0).as("bal"))
        .write.format("graft-orc").mode("append").save(dir)
      val c = GraftOrcChangelog.betweenPaired(spark, dir, base,
        keys = Seq("id"))
      val byType = c.groupBy($"_change_type").count()
        .as[(String, Long)].collect().toMap
      assert(byType.get("update_preimage").contains(2L), byType)
      assert(byType.get("update_postimage").contains(2L), byType)
      assert(byType.get("insert").contains(3L), byType)
      assert(!byType.contains("delete"), byType)
      val pre = c.filter($"_change_type" === "update_preimage")
        .select($"id", $"bal").as[(Long, Double)].collect().sorted.toSeq
      assert(pre == Seq(3L -> 3.0, 10L -> 10.0))
      val post = c.filter($"_change_type" === "update_postimage")
        .select($"id", $"bal").as[(Long, Double)].collect().sorted.toSeq
      assert(post == Seq(3L -> 333.0, 10L -> 1000.0))
    } finally spark.sql(s"DROP TABLE IF EXISTS $t")
  }

  test("betweenPaired resolves keys from the persisted graft.key table " +
    "property, leaves a pure-churn delete unpaired, and errors without " +
    "any key") {
    // a catalog-created table persists TBLPROPERTIES into the manifest
    val wh = Files.createTempDirectory("graft-cdc-keywh").toString
    spark.conf.set("spark.sql.catalog.gcdck",
      "graft.sources.v2.GraftOrcCatalog")
    spark.conf.set("spark.sql.catalog.gcdck.warehouse", wh)
    spark.sql("CREATE TABLE gcdck.kt (id BIGINT, bal DOUBLE) " +
      "TBLPROPERTIES('graft.key'='id','graft.delete_mode'='mor')")
    spark.sql("INSERT INTO gcdck.kt VALUES (1, 1.0), (2, 2.0), (3, 3.0)")
    val dir = s"$wh/kt"
    val base = seqOf(dir)
    graft.sources.v2.GraftOrcEqDelete.upsert(spark, dir,
      Seq((2L, 22.0)).toDF("id", "bal"), Seq("id"))   // update pair
    spark.sql("DELETE FROM gcdck.kt WHERE id = 3")     // pure delete
    val c = GraftOrcChangelog.betweenPaired(spark, dir, base)
    val rows = c.select($"id", $"bal", $"_change_type")
      .as[(Long, Double, String)].collect().sorted.toSeq
    assert(rows == Seq((2L, 2.0, "update_preimage"),
      (2L, 22.0, "update_postimage"), (3L, 3.0, "delete")), rows)
    // an upsert with NO explicit keys resolves the same persisted
    // graft.key property
    graft.sources.v2.GraftOrcEqDelete.upsert(spark, dir,
      Seq((1L, 111.0)).toDF("id", "bal"))
    assert(spark.read.format("graft-orc").load(dir)
      .filter($"id" === 1L).select($"bal").as[Double]
      .collect().toSeq == Seq(111.0))
    // no keys anywhere: typed error
    val (dir2, t2) = fresh("nokey")
    try {
      val err = intercept[IllegalArgumentException] {
        GraftOrcChangelog.betweenPaired(spark, dir2, 0L)
      }
      assert(err.getMessage.contains("graft.key"))
    } finally spark.sql(s"DROP TABLE IF EXISTS $t2")
  }

  test("checkpointed change feed: each delivery covers exactly the new " +
    "snapshots, commit() advances, a crash before commit redelivers " +
    "(at-least-once), and an empty poll returns None") {
    val (dir, t) = fresh("feed")
    try {
      val ckpt = Files.createTempDirectory("graft-feed-ckpt")
        .toString + "/seq"
      // first poll covers everything since table creation
      val f1 = GraftOrcChangelog.feed(spark, dir, ckpt).get
      assert(f1.fromSeq == 0L && f1.toSeq == seqOf(dir))
      assert(f1.df.count() == 200)
      // UNCOMMITTED: the same range redelivers
      val f1b = GraftOrcChangelog.feed(spark, dir, ckpt).get
      assert(f1b.fromSeq == 0L && f1b.toSeq == f1.toSeq)
      f1b.commit()
      // nothing new -> None
      assert(GraftOrcChangelog.feed(spark, dir, ckpt).isEmpty)
      // two more commits -> one delivery covering both, update-paired
      graft.sources.v2.GraftOrcEqDelete.upsert(spark, dir,
        Seq((8L, 888.0)).toDF("id", "bal"), Seq("id"))
      spark.range(9000, 9002).select($"id", lit(1.0).as("bal"))
        .write.format("graft-orc").mode("append").save(dir)
      val f2 = GraftOrcChangelog.feed(spark, dir, ckpt,
        pairKeys = Seq("id")).get
      assert(f2.fromSeq == f1.toSeq && f2.toSeq == seqOf(dir))
      val rows = f2.df.select($"id", $"bal", $"_change_type")
        .as[(Long, Double, String)].collect().sorted.toSeq
      assert(rows == Seq((8L, 8.0, "update_preimage"),
        (8L, 888.0, "update_postimage"), (9000L, 1.0, "insert"),
        (9001L, 1.0, "insert")), rows)
      f2.commit()
      assert(GraftOrcChangelog.feed(spark, dir, ckpt).isEmpty)
    } finally spark.sql(s"DROP TABLE IF EXISTS $t")
  }

  test("an expired range raises the typed time-travel error") {
    val dir = Files.createTempDirectory("graft-cdc-expired").toString
    // retain=2: after three commits, snapshot 1 is gone
    seeded.write.format("graft-orc").option("graft.manifest", "true")
      .option("graft.manifest.retain", "2").mode("append").save(dir)
    seeded.limit(5).write.format("graft-orc").mode("append").save(dir)
    seeded.limit(5).write.format("graft-orc").mode("append").save(dir)
    val e = intercept[IllegalArgumentException] {
      changes(dir, 1L).count()
    }
    assert(e.getMessage.contains("retained") ||
      e.getMessage.contains("expired"), e.getMessage)
  }
}
