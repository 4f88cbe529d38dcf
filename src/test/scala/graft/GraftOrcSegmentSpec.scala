package graft

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.v2.{GraftOrcManifest, OrcFileEntry}

/** Segmented manifests (round 15): above SegInlineMax entries a
  * snapshot stores its listing in write-once SEGMENT files it
  * references by name, so an append commit serializes only its adds
  * plus the ref lines — O(adds + segments), not O(table files). This
  * spec drives the protocol edges directly against the manifest API:
  * carry-by-identity, materialize-on-touch, segment expiry with the
  * last referencing snapshot, time travel across segmented history,
  * rollback carry, and vacuum's orphan-segment sweep.
  */
class GraftOrcSegmentSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def fsFor(dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def mk(n: Int, qt: Path, tag: String = "w"): Seq[OrcFileEntry] =
    (0 until n).map { i =>
      OrcFileEntry(s"$qt/$tag-${i / 512}/part-$i.snappy.orc",
        1000L + i, Map.empty, 1786692091502L + i,
        Some(s"r=${i + 1}"), 1L)
    }

  private def segFiles(fs: org.apache.hadoop.fs.FileSystem,
                       qt: Path): Seq[String] =
    fs.listStatus(new Path(qt, "_graft_manifest"))
      .map(_.getPath.getName).filter(_.startsWith("seg-")).toSeq.sorted

  test("append commits carry untouched segments by reference and " +
    "round-trip the exact entry set") {
    val dir = Files.createTempDirectory("graft-seg-carry").toString
    val fs = fsFor(dir)
    val qt = fs.makeQualified(new Path(dir))
    val base = mk(3000, qt)
    GraftOrcManifest.writeSnapshot(fs, qt, 1L, base, retain = 10)
    val s1 = GraftOrcManifest.readSnapshot(fs, qt).get
    assert(s1.segs.nonEmpty, "3000 entries must segment")
    assert(s1.entries.toSet === base.toSet)
    val segsBefore = segFiles(fs, qt)
    // append 10 entries the commitSwap way
    GraftOrcManifest.commitSwap(fs, qt, remove = Set.empty,
      add = mk(10, qt, "x"), retain = Some(10), op = "append")
    val s2 = GraftOrcManifest.readSnapshot(fs, qt).get
    assert(s2.entries.size === 3010)
    assert(s2.entries.toSet === (base ++ mk(10, qt, "x")).toSet)
    // the base segments were CARRIED: same files still referenced, no
    // re-serialization of the 3000 (only possibly a new residual seg)
    val carriedNames = s2.segs.map(_.path.getName).toSet
    assert(segsBefore.toSet.subsetOf(carriedNames ++ segFiles(fs, qt)),
      s"base segments vanished: before=$segsBefore after=${segFiles(fs, qt)}")
    assert(s1.segs.map(_.path.getName).toSet.subsetOf(carriedNames),
      "append must carry the predecessor's untouched segments")
  }

  test("a commit that removes one segmented entry materializes that " +
    "segment (carry is by full identity), content stays exact") {
    val dir = Files.createTempDirectory("graft-seg-touch").toString
    val fs = fsFor(dir)
    val qt = fs.makeQualified(new Path(dir))
    val base = mk(2000, qt)
    GraftOrcManifest.writeSnapshot(fs, qt, 1L, base, retain = 10)
    val s1 = GraftOrcManifest.readSnapshot(fs, qt).get
    val victim = s1.entries.head
    GraftOrcManifest.commitSwap(fs, qt, remove = Set(victim.path),
      add = Nil, retain = Some(10), op = "delete")
    val s2 = GraftOrcManifest.readSnapshot(fs, qt).get
    assert(s2.entries.size === 1999)
    assert(!s2.entries.exists(_.path == victim.path))
    // the touched segment is no longer referenced by the NEW snapshot
    val touched = s1.segs.find(_.entries.exists(_.path == victim.path)).get
    assert(!s2.segs.exists(_.path.getName == touched.path.getName),
      "a touched segment must not be carried")
    // but it still EXISTS while snapshot 1 (which references it) is
    // retained — time travel to seq 1 reads the full original state
    val t1 = GraftOrcManifest.resolveSnapshot(fs, qt,
      GraftOrcManifest.Selector.ById(1L))
    assert(t1.entries.toSet === base.toSet)
  }

  test("segments die with the last snapshot referencing them (expiry " +
    "GC), and retained history stays readable throughout") {
    val dir = Files.createTempDirectory("graft-seg-expire").toString
    val fs = fsFor(dir)
    val qt = fs.makeQualified(new Path(dir))
    GraftOrcManifest.writeSnapshot(fs, qt, 1L, mk(1500, qt), retain = 2)
    val gen1Segs = segFiles(fs, qt)
    assert(gen1Segs.nonEmpty)
    // replace everything: gen-1 segments referenced only by seq 1
    GraftOrcManifest.commitSwap(fs, qt, remove = Set.empty,
      add = mk(1500, qt, "g2"), truncate = true, retain = Some(2),
      op = "truncate")
    assert(gen1Segs.forall(segFiles(fs, qt).contains),
      "gen-1 segments must survive while seq 1 is retained")
    // two more commits expire seq 1 (retain=2) -> its segments go
    GraftOrcManifest.commitSwap(fs, qt, remove = Set.empty,
      add = mk(1, qt, "g3"), retain = Some(2), op = "append")
    GraftOrcManifest.commitSwap(fs, qt, remove = Set.empty,
      add = mk(1, qt, "g4"), retain = Some(2), op = "append")
    val left = segFiles(fs, qt)
    assert(gen1Segs.forall(n => !left.contains(n)),
      s"expired gen-1 segments linger: $left")
    // current state is intact
    val cur = GraftOrcManifest.readSnapshot(fs, qt).get
    assert(cur.entries.size === 1502)
  }

  test("rollback carries the target snapshot's segments; vacuum sweeps " +
    "orphaned segments but never referenced ones") {
    val dir = Files.createTempDirectory("graft-seg-vacrb").toString
    val fs = fsFor(dir)
    val qt = fs.makeQualified(new Path(dir))
    val base = mk(1500, qt)
    GraftOrcManifest.writeSnapshot(fs, qt, 1L, base, retain = 10)
    GraftOrcManifest.commitSwap(fs, qt, remove = Set.empty,
      add = mk(5, qt, "x"), retain = Some(10), op = "append")
    GraftOrcManifest.rollback(
      spark.sparkContext.hadoopConfiguration, qt.toString, 1L)
    val rb = GraftOrcManifest.readSnapshot(fs, qt).get
    assert(rb.entries.toSet === base.toSet)
    assert(rb.segs.nonEmpty, "rollback must carry the target's segments")
    // plant an orphan segment (crashed commit shape: written, never
    // referenced) -> vacuum reclaims it, referenced ones survive
    val orphan = new Path(new Path(qt, "_graft_manifest"),
      "seg-00000000-dead-beef-0000-000000000000.json")
    val out = fs.create(orphan, true); out.write('\n'); out.close()
    val referenced = segFiles(fs, qt).filterNot(_.contains("dead-beef"))
    // vacuum would also sweep the synthetic data paths (they don't
    // exist on disk, so the BFS sees nothing) — only the segment sweep
    // acts here
    GraftOrcManifest.vacuum(
      spark.sparkContext.hadoopConfiguration, qt.toString)
    val after = segFiles(fs, qt)
    assert(!after.exists(_.contains("dead-beef")), "orphan must be swept")
    assert(referenced.forall(after.contains),
      "referenced segments must survive vacuum")
    assert(GraftOrcManifest.readSnapshot(fs, qt).get.entries.toSet ===
      base.toSet)
  }

  test("the REAL writer path carries segments: a DSv2 append on a " +
    "1200-file table re-serializes only its adds") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-seg-writer").toString
    val fs = fsFor(dir)
    val qt = fs.makeQualified(new Path(dir))
    // 1200 single-row files: over the SegInlineMax threshold
    spark.range(0, 1200, 1, 1200).select($"id")
      .write.format("graft-orc").option("graft.manifest", "true")
      .mode("append").save(dir)
    val s1 = GraftOrcManifest.readSnapshot(fs, qt).get
    assert(s1.entries.size === 1200)
    assert(s1.segs.nonEmpty, "1200 entries must segment")
    val before = s1.segs.map(_.path.getName).toSet
    spark.range(5000, 5004, 1, 4).select($"id")
      .write.format("graft-orc").mode("append").save(dir)
    val s2 = GraftOrcManifest.readSnapshot(fs, qt).get
    assert(s2.entries.size === 1204)
    assert(before.subsetOf(s2.segs.map(_.path.getName).toSet),
      "the writer's append must carry the prior segments by reference")
    // the appended snapshot file itself is small: refs + 4 inline lines,
    // not 1204 serialized entries
    val snapBytes = fs.listStatus(new Path(qt, "_graft_manifest"))
      .filter(_.getPath.getName.startsWith("snap-"))
      .map(st => st.getPath.getName -> st.getLen).toMap
    val newest = snapBytes.keys.toSeq.sorted.last
    assert(snapBytes(newest) < 4096,
      s"append snapshot file is ${snapBytes(newest)} B — not O(adds)")
    // read-back exactness over the segmented manifest
    val got = spark.read.format("graft-orc").load(dir)
      .agg(org.apache.spark.sql.functions.sum($"id")).collect()(0).getLong(0)
    assert(got === (0L until 1200L).sum + (5000L to 5003L).sum)
  }

  test("t.manifests metadata table reports the segment layout (segments " +
    "+ inline rows; accounts for every entry)") {
    import spark.implicits._
    val wh = Files.createTempDirectory("graft-seg-meta-wh").toString
    spark.conf.set("spark.sql.catalog.gseg",
      "graft.sources.v2.GraftOrcCatalog")
    spark.conf.set("spark.sql.catalog.gseg.warehouse", wh)
    spark.sql("CREATE TABLE gseg.mt (id BIGINT)")
    try {
      // explicit 1200 input partitions (an AQE-coalescible REPARTITION
      // hint shrank to ~700 files, under the segmentation threshold)
      spark.range(0, 1200, 1, 1200).select($"id")
        .writeTo("gseg.mt").append()
      val rows = spark.sql("SELECT file, entries, bytes " +
        "FROM gseg.mt.manifests").collect()
      val segRows = rows.filter(!_.getString(0).startsWith("<inline>"))
      assert(segRows.nonEmpty, rows.mkString("; "))
      assert(segRows.forall(r => r.getString(0).startsWith("seg-") &&
        r.getLong(1) > 0 && r.getLong(2) > 0))
      // accounting: segment entries + inline entries == table files
      val total = rows.map(_.getLong(1)).sum
      assert(total === 1200L, s"manifests accounts $total of 1200")
      // a small table reports one <inline> row and no segments
      spark.sql("CREATE TABLE gseg.small (id BIGINT)")
      spark.sql("INSERT INTO gseg.small VALUES (1)")
      val small = spark.sql("SELECT file, entries FROM gseg.small.manifests")
        .collect()
      assert(small.length === 1 && small(0).getString(0) === "<inline>" &&
        small(0).getLong(1) === 1L)
    } finally {
      spark.sql("DROP TABLE IF EXISTS gseg.mt")
      spark.sql("DROP TABLE IF EXISTS gseg.small")
    }
  }

  test("many small appends roll the inline residual into a segment at " +
    "the threshold; a segment-count blowup re-segments fresh") {
    val dir = Files.createTempDirectory("graft-seg-roll").toString
    val fs = fsFor(dir)
    val qt = fs.makeQualified(new Path(dir))
    GraftOrcManifest.writeSnapshot(fs, qt, 1L, mk(1200, qt), retain = 3)
    // 6 appends of 100: residual crosses 512 twice -> extra segments,
    // entry set stays exact throughout
    (0 until 6).foreach { i =>
      GraftOrcManifest.commitSwap(fs, qt, remove = Set.empty,
        add = mk(100, qt, s"a$i"), retain = Some(3), op = "append")
    }
    val s = GraftOrcManifest.readSnapshot(fs, qt).get
    assert(s.entries.size === 1800)
    assert(s.entries.map(_.path).distinct.size === 1800)
    assert(s.segs.size >= 2 && s.segs.size < 64,
      s"unexpected segment count ${s.segs.size}")
  }

  // ---- round-16 hardening: the GC live-side read-failure posture ------

  test("gcSegments aborts when a KEPT snapshot's ref scan fails — a " +
    "dead ref shared with an unreadable live file must NOT be swept") {
    val dir = Files.createTempDirectory("graft-seg-gc-abort").toString
    val fs = fsFor(dir)
    val d = fs.makeQualified(new Path(dir))
    fs.mkdirs(d)
    val segName = "seg-test-live.json"
    fs.create(new Path(d, segName), true).close()
    // kept file is MISSING (stands in for an object-store read failure
    // on a retained snapshot): the old Nil-on-error posture would treat
    // its segments as unreferenced and delete them — data loss on a
    // retained snapshot. The strict posture aborts the sweep.
    GraftOrcManifest.gcSegments(fs, d, deadRefs = Seq(segName),
      keptFiles = Seq(new Path(d, "snap-missing.json")))
    assert(fs.exists(new Path(d, segName)),
      "segment swept despite an unreadable kept snapshot")
    // with every kept file readable (none), the same dead ref IS swept
    GraftOrcManifest.gcSegments(fs, d, deadRefs = Seq(segName),
      keptFiles = Nil)
    assert(!fs.exists(new Path(d, segName)))
  }

  test("vacuum fails loudly — deleting nothing — when a live snapshot " +
    "is unreadable, instead of treating its segments/files as orphans") {
    val dir = Files.createTempDirectory("graft-seg-vac-abort").toString
    val fs = fsFor(dir)
    val qt = fs.makeQualified(new Path(dir))
    GraftOrcManifest.writeSnapshot(fs, qt, 1L, mk(1200, qt), retain = 3)
    val md = new Path(qt, "_graft_manifest")
    val segs = segFiles(fs, qt)
    assert(segs.nonEmpty)
    // corrupt the lineage: a snapshot-named DIRECTORY makes fs.open fail
    // on a file vacuum must treat as live. The live set is then
    // incomplete, so the only safe outcome is a loud failure BEFORE any
    // delete (an error-as-empty posture would sweep everything the
    // unreadable snapshot references).
    fs.mkdirs(new Path(md, "snap-99999999999999999999-bogus.json"))
    val conf = spark.sparkContext.hadoopConfiguration
    intercept[java.io.IOException] {
      GraftOrcManifest.vacuum(conf, dir)
    }
    assert(segFiles(fs, qt) === segs,
      "vacuum swept segments of a lineage with an unreadable snapshot")
  }

  test("segment cache is bounded by total cached ENTRIES, keeping the " +
    "just-inserted segment") {
    val qt = new Path("file:/graft-seg-cache-test")
    val big = mk(8192, qt)
    val (n0, e0) = GraftOrcManifest.segCacheStats
    assert(e0 <= 64 * 1024)
    val keys = (0 until 12).map(i => s"file:/graft-seg-cache-test/k$i")
    keys.foreach(k => GraftOrcManifest.segCachePut(k, big))
    val (n1, e1) = GraftOrcManifest.segCacheStats
    // 12 x 8192 = 98k entries offered; the bound holds and the count
    // tracks the survivors exactly
    assert(e1 <= 64 * 1024, s"cache holds $e1 entries")
    assert(n1 >= 1)
    // dropping the survivors returns their entries to the pool
    keys.foreach(GraftOrcManifest.segCacheDrop)
    val (_, e2) = GraftOrcManifest.segCacheStats
    assert(e2 <= e0, s"entry accounting drifted: $e0 -> $e2")
  }

  test("a truncated segment file fails the snapshot read descriptively " +
    "(recorded entry count vs parsed)") {
    val dir = Files.createTempDirectory("graft-seg-trunc").toString
    val fs = fsFor(dir)
    val qt = fs.makeQualified(new Path(dir))
    GraftOrcManifest.writeSnapshot(fs, qt, 1L, mk(1200, qt), retain = 3)
    val md = new Path(qt, "_graft_manifest")
    val seg = new Path(md, segFiles(fs, qt).head)
    // truncate: keep only the first half of the segment's lines
    val lines = scala.io.Source.fromInputStream(fs.open(seg)).getLines()
      .toSeq
    val out = fs.create(seg, true)
    out.write(lines.take(lines.size / 2).mkString("", "\n", "\n")
      .getBytes("UTF-8"))
    out.close()
    // segments are write-once, so the cache never revalidates — evict
    // to model the fresh driver that meets the damaged file
    GraftOrcManifest.segCacheDrop(seg.toString)
    val ex = intercept[IllegalArgumentException] {
      GraftOrcManifest.readSnapshot(fs, qt).get.entries
    }
    assert(ex.getMessage.contains("truncated or corrupt"), ex.getMessage)
  }

  test("parseEntryLine fails descriptively on truncated/corrupt lines") {
    val bad = Seq(
      """{"p":"part-1.orc""",          // unterminated quoted value
      """{"p":"part-1.orc\""",         // escape at end of line
      """{"p"""                        // key with no value
    )
    bad.foreach { l =>
      val ex = intercept[IllegalArgumentException] {
        GraftOrcManifest.parseEntryLine(l)
      }
      assert(ex.getMessage.contains("malformed entry line"), l)
    }
    // the good path still parses
    val e = GraftOrcManifest.parseEntryLine(
      """{"p":"a bA.orc","l":10,"t":5,"v":2}""")
    assert(e.path === "a bA.orc" && e.len === 10L && e.v === 2L)
  }
}
