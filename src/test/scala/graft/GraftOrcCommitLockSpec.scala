package graft

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.v2.{GraftOrcManifest, OrcFileEntry}

/** Opt-in cross-driver commit lock (`-Dgraft.commit.lock=file`): the
  * occupancy-check -> rename window of writeSnapshot serializes across
  * DRIVERS via an atomic create-no-overwrite of `commit.lock` in the
  * lineage dir. Covered: lock lifecycle (acquired + released around a
  * normal commit), loud timeout against a held lock, stale-lock
  * takeover after a crashed holder, and that the default (no property)
  * path never touches a lock file.
  */
class GraftOrcCommitLockSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def fsFor(dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def mk(n: Int, qt: Path): Seq[OrcFileEntry] =
    (0 until n).map(i => OrcFileEntry(s"$qt/part-$i.snappy.orc",
      1000L + i, Map.empty, 1786692091502L + i))

  private def withProps(props: (String, String)*)(body: => Unit): Unit = {
    val saved = props.map { case (k, _) => k -> Option(System.getProperty(k)) }
    props.foreach { case (k, v) => System.setProperty(k, v) }
    try body finally saved.foreach {
      case (k, Some(v)) => System.setProperty(k, v)
      case (k, None) => System.clearProperty(k)
    }
  }

  test("with the lock enabled a commit acquires and releases it; " +
    "without the property no lock file is ever created") {
    val dir = Files.createTempDirectory("graft-lock-basic").toString
    val fs = fsFor(dir)
    val qt = fs.makeQualified(new Path(dir))
    val lock = new Path(qt,
      "_graft_manifest/" + GraftOrcManifest.CommitLockName)
    GraftOrcManifest.writeSnapshot(fs, qt, 1L, mk(3, qt))
    assert(!fs.exists(lock), "default path created a lock file")
    withProps("graft.commit.lock" -> "file") {
      GraftOrcManifest.writeSnapshot(fs, qt, 2L, mk(5, qt))
    }
    assert(!fs.exists(lock), "lock not released after commit")
    assert(GraftOrcManifest.readSnapshot(fs, qt).get.entries.size === 5)
  }

  test("a lock held by another driver blocks the commit; the timeout " +
    "is loud and names the lock") {
    val dir = Files.createTempDirectory("graft-lock-held").toString
    val fs = fsFor(dir)
    val qt = fs.makeQualified(new Path(dir))
    GraftOrcManifest.writeSnapshot(fs, qt, 1L, mk(3, qt))
    val md = new Path(qt, "_graft_manifest")
    val lock = new Path(md, GraftOrcManifest.CommitLockName)
    val out = fs.create(lock, false)
    out.write("rival-driver".getBytes("UTF-8")); out.close()
    withProps("graft.commit.lock" -> "file",
      "graft.commit.lock.timeout_ms" -> "400") {
      val ex = intercept[java.util.ConcurrentModificationException] {
        GraftOrcManifest.writeSnapshot(fs, qt, 2L, mk(5, qt))
      }
      assert(ex.getMessage.contains(GraftOrcManifest.CommitLockName),
        ex.getMessage)
      // the rival releases: the retried commit goes through and cleans up
      fs.delete(lock, false)
      GraftOrcManifest.writeSnapshot(fs, qt, 2L, mk(5, qt))
    }
    assert(!fs.exists(lock))
    assert(GraftOrcManifest.readSnapshot(fs, qt).get.seq === 2L)
  }

  test("a STALE lock (crashed holder) is taken over instead of wedging " +
    "every committer forever") {
    val dir = Files.createTempDirectory("graft-lock-stale").toString
    val fs = fsFor(dir)
    val qt = fs.makeQualified(new Path(dir))
    GraftOrcManifest.writeSnapshot(fs, qt, 1L, mk(3, qt))
    val lock = new Path(qt,
      "_graft_manifest/" + GraftOrcManifest.CommitLockName)
    val out = fs.create(lock, false)
    out.write("crashed-driver".getBytes("UTF-8")); out.close()
    fs.setTimes(lock, System.currentTimeMillis() - 120000L, -1)
    withProps("graft.commit.lock" -> "file") {
      GraftOrcManifest.writeSnapshot(fs, qt, 2L, mk(5, qt))
    }
    assert(!fs.exists(lock))
    assert(GraftOrcManifest.readSnapshot(fs, qt).get.seq === 2L)
  }
}
