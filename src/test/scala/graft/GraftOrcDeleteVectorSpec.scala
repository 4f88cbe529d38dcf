package graft

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.v2.{GraftOrcDeleteVector, GraftOrcManifest, GraftOrcMor}
import graft.sources.v2.GraftOrcDeleteVector.PositionBitmap

/** Deletion-vector sidecars ([[GraftOrcDeleteVector]] — the Iceberg-v3
  * bitmap direction for merge-on-read position deletes). Pins the
  * container math (sparse array <-> dense bitmap switch at 4096, exact
  * round trips at both shapes), the file format (header index walk,
  * seek-to-one-file decode), and the end-to-end table behavior: the
  * default MoR DELETE now emits `dv-*.bin`, reads/changelog/purge are
  * bit-identical to the row-ORC encoding, both encodings mix freely on
  * one table, and the ORC fallback stays selectable.
  */
class GraftOrcDeleteVectorSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def conf = spark.sparkContext.hadoopConfiguration
  private def fsOf(dir: String) = new Path(dir).getFileSystem(conf)

  test("PositionBitmap: sparse and dense containers round-trip exactly; " +
    "the 4096-entry densify point is seamless; contains/cardinality/" +
    "sorted iteration agree") {
    val b = new PositionBitmap
    // sparse chunk (a few scattered ordinals), a chunk crossing the
    // densify threshold, and a far chunk exercising the high-bits key
    val sparse = Seq(0L, 1L, 7L, 65535L)
    val dense = (100000L until 100000L + 5000L by 1L)
    val far = Seq(1L << 33, (1L << 33) + 9)
    val all = (sparse ++ dense ++ far).distinct.sorted
    // insert unsorted + duplicated: order must not matter
    scala.util.Random.shuffle(all ++ all.take(50)).foreach(b.add)
    assert(b.cardinality == all.size)
    assert(b.toSortedArray.toSeq == all)
    all.foreach(p => assert(b.contains(p), s"missing $p"))
    Seq(2L, 99999L, 100000L + 5001L, (1L << 33) + 1).foreach(p =>
      assert(!b.contains(p), s"phantom $p"))
  }

  test("sidecar file: header walk lists files without decoding " +
    "payloads; bitmapFor seeks to one file; allPairs decodes all") {
    val dir = Files.createTempDirectory("graft-dv").toString
    val dest = new Path(dir, "dv-test.bin")
    val a = PositionBitmap.of(Seq(1L, 5L, 9L))
    val bb = PositionBitmap.of(0L until 6000L) // dense
    GraftOrcDeleteVector.write(fsOf(dir), dest,
      Iterator("p=1/a.orc" -> a, "p=2/b.orc" -> bb))
    assert(GraftOrcDeleteVector.files(conf, dest.toString) ==
      Seq("p=1/a.orc", "p=2/b.orc"))
    val got = GraftOrcDeleteVector.bitmapFor(conf, dest.toString,
      "p=2/b.orc").get
    assert(got.cardinality == 6000 && got.contains(5999L) &&
      !got.contains(6000L))
    assert(GraftOrcDeleteVector.bitmapFor(conf, dest.toString,
      "nope.orc").isEmpty)
    val pairs = GraftOrcDeleteVector.allPairs(conf, dest.toString).toSeq
    assert(pairs.size == 6003)
    assert(pairs.take(3) == Seq("p=1/a.orc" -> 1L, "p=1/a.orc" -> 5L,
      "p=1/a.orc" -> 9L))
    // a non-dv file is refused loudly
    val junk = new Path(dir, "dv-junk.bin")
    val out = fsOf(dir).create(junk, true)
    out.write("not a sidecar".getBytes("UTF-8")); out.close()
    assertThrows[java.io.IOException] {
      GraftOrcDeleteVector.files(conf, junk.toString)
    }
  }

  private def seeded(n: Int) = spark.range(n)
    .selectExpr("id AS k", "cast(id % 97 as double) AS v")

  private def morTable(tag: String, fmt: String): (String, String) = {
    val dir = Files.createTempDirectory(s"graft-dvt-$tag").toString
    seeded(2000).repartition(4).write.format("graft-orc")
      .option("graft.manifest", "true").mode("append").save(dir)
    val t = s"g_dv_$tag"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"CREATE TABLE $t USING `graft-orc` LOCATION '$dir' " +
      "TBLPROPERTIES('graft.delete_mode'='mor', " +
      s"'graft.delete_sidecar_format'='$fmt')")
    (dir, t)
  }

  test("MoR DELETE emits dv-*.bin by default; results, point lookups, " +
    "purge and a second stacked delete are bit-identical to the ORC " +
    "encoding; the orc fallback still writes d-*.orc") {
    val (bdir, bt) = morTable("bitmap", "bitmap")
    val (odir, ot) = morTable("orc", "orc")
    // translatable predicates -> the SupportsDelete MoR path (an
    // untranslatable one routes through the DELTA writer, which keeps
    // the ORC sidecar encoding by design — covered by the mixing test)
    def run(t: String): Unit = {
      spark.sql(s"DELETE FROM $t WHERE k >= 300 AND k < 900")
      spark.sql(s"DELETE FROM $t WHERE k >= 1500")
    }
    run(bt); run(ot)
    val bSnap = GraftOrcManifest.readSnapshot(fsOf(bdir), new Path(bdir)).get
    val oSnap = GraftOrcManifest.readSnapshot(fsOf(odir), new Path(odir)).get
    assert(bSnap.deletes.nonEmpty && bSnap.deletes.forall(e =>
      GraftOrcDeleteVector.isBitmapSidecar(e.path)),
      bSnap.deletes.map(_.path).toString)
    assert(oSnap.deletes.nonEmpty && oSnap.deletes.forall(e =>
      e.path.endsWith(".orc")))
    // the deletion vectors are the smaller encoding even at this size
    assert(bSnap.deletes.map(_.length).sum <
      oSnap.deletes.map(_.length).sum,
      s"dv ${bSnap.deletes.map(_.length).sum} vs " +
        s"orc ${oSnap.deletes.map(_.length).sum}")
    def state(dir: String) = spark.read.format("graft-orc").load(dir)
      .as[(Long, Double)].collect().sorted.toSeq
    val want = (0L until 2000L)
      .filterNot(k => (k >= 300 && k < 900) || k >= 1500)
      .map(k => (k, (k % 97).toDouble))
    assert(state(bdir) == want)
    assert(state(odir) == want)
    // point lookup through the row-wise delete wrapper
    assert(spark.sql(s"SELECT v FROM $bt WHERE k = 4")
      .as[Double].collect().toSeq == Seq(4.0))
    assert(spark.sql(s"SELECT v FROM $bt WHERE k = 4000")
      .as[Double].collect().isEmpty)
    // purge materializes identically over both encodings
    assert(GraftOrcMor.purge(spark, bdir) > 0)
    assert(GraftOrcMor.purge(spark, odir) > 0)
    assert(state(bdir) == want && state(odir) == want)
    assert(GraftOrcManifest.readSnapshot(fsOf(bdir), new Path(bdir))
      .get.deletes.isEmpty)
    spark.sql(s"DROP TABLE IF EXISTS $bt")
    spark.sql(s"DROP TABLE IF EXISTS $ot")
  }

  test("the DELTA path (MoR UPDATE/MERGE and untranslatable DELETEs) " +
    "also writes deletion vectors by default; orc stays selectable; " +
    "results exact either way") {
    def mkTable(tag: String, fmt: String): (String, String) = {
      val dir = Files.createTempDirectory(s"graft-dvd-$tag").toString
      seeded(1000).repartition(2).write.format("graft-orc")
        .option("graft.manifest", "true").mode("append").save(dir)
      val t = s"g_dvd_$tag"
      spark.sql(s"DROP TABLE IF EXISTS $t")
      spark.sql(s"CREATE TABLE $t USING `graft-orc` LOCATION '$dir' " +
        "TBLPROPERTIES('graft.delete_mode'='mor', " +
        "'graft.update_mode'='mor', 'graft.merge_mode'='mor', " +
        s"'graft.delete_sidecar_format'='$fmt')")
      (dir, t)
    }
    for ((fmt, wantBin) <- Seq(("bitmap", true), ("orc", false))) {
      val (dir, t) = mkTable(fmt, fmt)
      // untranslatable predicate -> the DELTA delete path
      spark.sql(s"DELETE FROM $t WHERE k % 7 = 3")
      // MoR UPDATE: position delta + insert in one commit
      spark.sql(s"UPDATE $t SET v = -1.0 WHERE k % 11 = 5")
      val snap = GraftOrcManifest.readSnapshot(fsOf(dir), new Path(dir)).get
      assert(snap.deletes.nonEmpty)
      assert(snap.deletes.forall(e =>
        GraftOrcDeleteVector.isBitmapSidecar(e.path) == wantBin),
        s"$fmt: ${snap.deletes.map(_.path)}")
      val got = spark.sql(s"SELECT k, v FROM $t ORDER BY k")
        .as[(Long, Double)].collect().toSeq
      val want = (0L until 1000L).filterNot(_ % 7 == 3)
        .map(k => (k, if (k % 11 == 5) -1.0 else (k % 97).toDouble))
      assert(got == want, s"$fmt delta state diverged")
      // purge materializes over the delta-written encoding too
      assert(GraftOrcMor.purge(spark, dir) > 0)
      assert(spark.sql(s"SELECT count(*) FROM $t").as[Long]
        .collect().head == want.size)
      spark.sql(s"DROP TABLE IF EXISTS $t")
    }
  }

  test("the `deletes` metadata table sizes the MoR debt: kind, bytes, " +
    "cardinality and referenced files per sidecar, across all three " +
    "encodings") {
    val dir = Files.createTempDirectory("graft-dv-meta").toString
    seeded(600).repartition(2).write.format("graft-orc")
      .option("graft.manifest", "true").mode("append").save(dir)
    val t = "g_dv_meta"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"CREATE TABLE $t USING `graft-orc` LOCATION '$dir' " +
      "TBLPROPERTIES('graft.delete_mode'='mor', " +
      "'graft.delete_sidecar_format'='orc')")
    spark.sql(s"DELETE FROM $t WHERE k < 50")              // position orc
    spark.sql(s"ALTER TABLE $t SET " +
      "TBLPROPERTIES('graft.delete_sidecar_format'='bitmap')")
    spark.sql(s"DELETE FROM $t WHERE k >= 550")            // dv
    graft.sources.v2.GraftOrcEqDelete.upsert(spark, dir,  // equality
      Seq((100L, 0.0)).toDF("k", "v"), Seq("k"))
    val meta = graft.sources.v2.GraftOrcMetadata.deletes(spark, dir)
      .collect().map(r => (r.getString(1),
        Option(r.get(4)).map(_.asInstanceOf[Long]),
        Option(r.get(5)).map(_.asInstanceOf[Long])))
    assert(meta.map(_._1).toSet ==
      Set("position", "deletion_vector", "equality"), meta.toSeq)
    val dv = meta.filter(_._1 == "deletion_vector")
    assert(dv.map(_._2.get).sum == 50, s"dv cardinality: ${dv.toSeq}")
    assert(dv.forall(_._3.exists(_ >= 1)))
    val posCard = meta.filter(_._1 == "position").map(_._2.get).sum
    assert(posCard == 50, s"position cardinality $posCard")
    assert(meta.filter(_._1 == "equality").forall(_._2.contains(1L)))
    // the catalog identifier form resolves too
    val wh = Files.createTempDirectory("graft-dvmeta-wh").toString
    spark.conf.set("spark.sql.catalog.gdvm",
      "graft.sources.v2.GraftOrcCatalog")
    spark.conf.set("spark.sql.catalog.gdvm.warehouse", wh)
    spark.sql("CREATE TABLE gdvm.t (k BIGINT, v DOUBLE) " +
      "TBLPROPERTIES('graft.delete_mode'='mor')")
    // ONE multi-row file, so the delete classifies partial (a
    // single-row file would full-drop as pure metadata — no sidecar)
    spark.sql("INSERT INTO gdvm.t SELECT id, CAST(id AS DOUBLE) " +
      "FROM range(0, 10, 1, 1)")
    spark.sql("DELETE FROM gdvm.t WHERE k = 2")
    val rows = spark.sql(
      "SELECT kind, cardinality FROM gdvm.t.deletes").collect()
    assert(rows.length == 1 && rows(0).getString(0) == "deletion_vector"
      && rows(0).getLong(1) == 1L, rows.toSeq)
    spark.sql(s"DROP TABLE IF EXISTS $t")
  }

  test("both encodings MIX on one table: an orc-era sidecar and a dv " +
    "sidecar apply together; changelog reconstructs deletes from the " +
    "dv encoding") {
    val dir = Files.createTempDirectory("graft-dv-mix").toString
    seeded(1000).repartition(2).write.format("graft-orc")
      .option("graft.manifest", "true")
      .option("graft.manifest.retain", "6").mode("append").save(dir)
    val t = "g_dv_mix"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    spark.sql(s"CREATE TABLE $t USING `graft-orc` LOCATION '$dir' " +
      "TBLPROPERTIES('graft.delete_mode'='mor', " +
      "'graft.delete_sidecar_format'='orc')")
    spark.sql(s"DELETE FROM $t WHERE k < 100")          // orc sidecar
    spark.sql(s"ALTER TABLE $t SET " +
      "TBLPROPERTIES('graft.delete_sidecar_format'='bitmap')")
    spark.sql(s"DELETE FROM $t WHERE k >= 900")         // dv sidecar
    val snap = GraftOrcManifest.readSnapshot(fsOf(dir), new Path(dir)).get
    val kinds = snap.deletes.map(e =>
      GraftOrcDeleteVector.isBitmapSidecar(e.path)).toSet
    assert(kinds == Set(true, false), snap.deletes.map(_.path).toString)
    assert(spark.read.format("graft-orc").load(dir)
      .as[(Long, Double)].collect().map(_._1).sorted.toSeq ==
      (100L until 900L))
    // changelog: the dv-encoded delete reconstructs as delete images
    val ch = graft.sources.v2.GraftOrcChangelog
      .between(spark, dir, startSnapshotId = 2, endSnapshotId = Some(3))
    val dels = ch.filter($"_change_type" === "delete")
      .select($"k").as[Long].collect().sorted.toSeq
    assert(dels == (900L until 1000L))
    spark.sql(s"DROP TABLE IF EXISTS $t")
  }
}
