package graft.sources.v2

import java.util.UUID

import org.apache.hadoop.fs.{FileSystem, Path}

/** Opt-in manifest commit for graft-orc tables — the metadata-log upgrade
  * the writer and compactor docs point at for object stores (the
  * Iceberg/Delta-lite pattern, reduced to its core: ONE atomic file
  * defines the table).
  *
  * Layout: `<table>/_graft_manifest/snap-<seq20>-<uuid>.json`, where each
  * snapshot is the COMPLETE file listing (JSON-lines of table-relative
  * path, length, publish mtime). A commit stages data exactly as before,
  * then writes the next snapshot to a dot-temp name and renames it into
  * place — one atomic metadata operation, after which (and only after
  * which) readers observe the new files. The `_`-prefix keeps the whole
  * directory invisible to BFS listings.
  *
  * What this buys over pure directory tables:
  *  - **No partial-COMMIT window**: a crash between two wave renames
  *    leaves staged-but-unmanifested files that readers never see (the
  *    directory protocol exposes whichever waves landed).
  *  - **No rename-is-a-copy exposure**: on S3A-style stores the wave
  *    rename is a copy loop; manifest readers only flip to the new state
  *    at the single snapshot rename (a one-file PUT).
  *  - **No compaction duplicate window**: the compactor publishes merged
  *    outputs, commits one snapshot that swaps inputs for outputs, THEN
  *    deletes inputs — at no instant does a manifest reader see a row
  *    twice. A crash mid-sequence leaves invisible garbage (vacuumable),
  *    never duplicates.
  *
  * Mode activation: a write with `.option("graft.manifest", "true")`
  * establishes the manifest (bootstrapping existing files via one BFS
  * listing); once `_graft_manifest/` exists, EVERY later commit —
  * writer, streaming epoch, compactor, whatever its options — updates it,
  * because a manifest reader would otherwise silently lose the new files.
  *
  * Scale shape: each snapshot is O(live files) lines of ~100 bytes —
  * fine through the ~100k-file range a compacted table stays in; the
  * compactor is what keeps that bound (a delta log would amortize writes
  * further but needs log replay + checkpointing; out of scope, like
  * Iceberg's manifest-reuse tree). Snapshot history is pruned to the
  * newest [[RetainSnapshots]]. Concurrent commits to ONE table remain
  * single-driver scope, as everywhere in this connector: two drivers
  * racing the same seq would both publish and the lexicographic-max
  * snapshot wins (the loser's files become vacuumable garbage, not
  * corruption).
  */
object GraftOrcManifest {
  private[v2] val Dir = "_graft_manifest"
  private val SnapPrefix = "snap-"
  private[graft] val RetainSnapshots = 3

  case class Snapshot(seq: Long, entries: Seq[OrcFileEntry])

  private def manifestDir(table: Path) = new Path(table, Dir)

  /** Build the reader-facing entry for one manifest line: absolute path
    * under `table`, hive partition values re-parsed from the relative
    * path's `k=v` segments (same rules as the BFS listing — `ListMap`
    * keeps path order, the hive null marker maps to null).
    */
  private[v2] def entryOf(table: Path, rel: String, length: Long,
                          mtime: Long): OrcFileEntry = {
    val segs = rel.split('/')
    var parts = scala.collection.immutable.ListMap.empty[String, String]
    segs.dropRight(1).foreach { s =>
      GraftOrcFileIndex.parsePartitionSegment(s)
        .foreach { case (k, v) => parts = parts + (k -> v) }
    }
    OrcFileEntry(new Path(table, rel).toString, length, parts, mtime)
  }

  /** Table-relative path of `abs` under `table`, or an error: manifest
    * entries must live inside the table directory.
    */
  private[v2] def relativize(table: Path, abs: String): String = {
    val prefix = table.toString.stripSuffix("/") + "/"
    require(abs.startsWith(prefix),
      s"graft-orc manifest: $abs is outside the table $table")
    abs.substring(prefix.length)
  }

  def exists(fs: FileSystem, table: Path): Boolean =
    try fs.getFileStatus(manifestDir(table)).isDirectory
    catch { case _: java.io.FileNotFoundException => false }

  /** Newest snapshot of `table`, or None when the table has no manifest.
    * A manifest directory that exists but holds no snapshot yet (a crash
    * between mkdirs and the first snapshot rename) reads as seq 0 with no
    * files — the manifest IS the table once established.
    */
  def readSnapshot(fs: FileSystem, table: Path): Option[Snapshot] = {
    // qualified root so entry paths match BFS listings (file: scheme etc.)
    val qt = fs.makeQualified(table)
    val dir = manifestDir(qt)
    val snaps =
      try fs.listStatus(dir).filter(st => st.isFile &&
        st.getPath.getName.startsWith(SnapPrefix) &&
        st.getPath.getName.endsWith(".json"))
      catch { case _: java.io.FileNotFoundException => return None }
    if (snaps.isEmpty) return Some(Snapshot(0L, Nil))
    // snap-%020d-<uuid>.json: lexicographic max = numeric max seq, with a
    // deterministic uuid tiebreak should two writers ever race one seq
    val newest = snaps.maxBy(_.getPath.getName).getPath
    val name = newest.getName
    val seq = name.substring(SnapPrefix.length, SnapPrefix.length + 20).toLong
    val in = fs.open(newest)
    val lines =
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
      finally in.close()
    val entries = lines.filter(_.nonEmpty).map { line =>
      val rel = jsonString(line, "p")
      val len = jsonLong(line, "l")
      val mt = jsonLong(line, "t")
      entryOf(qt, rel, len, mt)
    }
    Some(Snapshot(seq, entries))
  }

  /** Write snapshot `seq` listing exactly `entries` (absolute paths under
    * `table`), atomically: dot-temp file, then one rename. Prunes history
    * beyond [[RetainSnapshots]] best-effort afterwards.
    */
  def writeSnapshot(fs: FileSystem, table: Path, seq: Long,
                    entries: Seq[OrcFileEntry]): Unit = {
    val qt = fs.makeQualified(table)
    val dir = manifestDir(qt)
    fs.mkdirs(dir)
    val tmp = new Path(dir, s".tmp-${UUID.randomUUID()}")
    val out = fs.create(tmp, true)
    try {
      val w = new java.io.BufferedWriter(
        new java.io.OutputStreamWriter(out, "UTF-8"))
      entries.sortBy(_.path).foreach { e =>
        val rel = relativize(qt, e.path)
        w.write(s"""{"p":${jsonQuote(rel)},"l":${e.length},"t":${e.mtime}}""")
        w.newLine()
      }
      w.flush()
      w.close()
    } catch { case t: Throwable =>
      try { out.close(); fs.delete(tmp, false) } catch { case _: Throwable => }
      throw t
    }
    val dest = new Path(dir, f"$SnapPrefix$seq%020d-${UUID.randomUUID()}.json")
    if (!fs.rename(tmp, dest)) {
      fs.delete(tmp, false)
      throw new java.io.IOException(
        s"graft-orc manifest: failed to publish snapshot $dest")
    }
    // prune old snapshots; never fail the commit over housekeeping
    try {
      val all = fs.listStatus(dir).map(_.getPath)
        .filter(p => p.getName.startsWith(SnapPrefix) &&
          p.getName.endsWith(".json")).sortBy(_.getName)
      all.dropRight(RetainSnapshots).foreach(p => fs.delete(p, false))
    } catch { case _: java.io.IOException => }
  }

  /** Swap `remove` (absolute paths) for `add` on top of the current
    * snapshot and commit the result as the next snapshot. The one
    * metadata primitive both the writer and the compactor need.
    */
  def commitSwap(fs: FileSystem, table: Path, remove: Set[String],
                 add: Seq[OrcFileEntry], truncate: Boolean = false): Unit = {
    val cur = readSnapshot(fs, table).getOrElse(Snapshot(0L, Nil))
    val base = if (truncate) Nil else cur.entries.filterNot(e => remove(e.path))
    val addPaths = add.map(_.path).toSet
    writeSnapshot(fs, table, cur.seq + 1,
      base.filterNot(e => addPaths(e.path)) ++ add)
  }

  /** Delete files the new snapshot no longer references (truncate
    * victims, compacted inputs), then best-effort prune their now-empty
    * parent directories up to — never including — the table root. Always
    * runs AFTER the snapshot rename, so a crash mid-delete leaves
    * invisible garbage, never a snapshot pointing at missing files.
    */
  def deleteUnreferenced(fs: FileSystem, table: Path,
                         victims: Seq[OrcFileEntry]): Unit = {
    if (victims.isEmpty) return
    GraftOrcFileIndex.parallelMap(victims, 32) { e =>
      try fs.delete(new Path(e.path), false)
      catch { case _: java.io.IOException => false }
    }
    val tableStr = fs.makeQualified(table).toString
    var parents = victims.map(e => new Path(e.path).getParent).distinct
    while (parents.nonEmpty) {
      parents = parents.flatMap { p =>
        if (p == null || p.toString == tableStr) None
        else {
          val pruned =
            try fs.listStatus(p).isEmpty && fs.delete(p, false)
            catch { case _: java.io.IOException => false }
          if (pruned) Some(p.getParent) else None
        }
      }.distinct
    }
  }

  // ---- minimal JSON helpers (fixed flat schema; no library available) ----

  private def jsonQuote(s: String): String = {
    val sb = new StringBuilder("\"")
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.append('"').toString
  }

  private def jsonString(line: String, key: String): String = {
    val tag = "\"" + key + "\":\""
    val i = line.indexOf(tag)
    require(i >= 0, s"graft-orc manifest: no $key in $line")
    val sb = new StringBuilder
    var j = i + tag.length
    while (j < line.length && line.charAt(j) != '"') {
      val c = line.charAt(j)
      if (c == '\\' && j + 1 < line.length) {
        line.charAt(j + 1) match {
          case 'u' =>
            sb.append(Integer.parseInt(line.substring(j + 2, j + 6), 16).toChar)
            j += 6
          case esc => sb.append(esc); j += 2
        }
      } else { sb.append(c); j += 1 }
    }
    sb.toString
  }

  private def jsonLong(line: String, key: String): Long = {
    val tag = "\"" + key + "\":"
    val i = line.indexOf(tag)
    require(i >= 0, s"graft-orc manifest: no $key in $line")
    var j = i + tag.length
    val sb = new StringBuilder
    while (j < line.length && (line.charAt(j).isDigit || line.charAt(j) == '-')) {
      sb.append(line.charAt(j)); j += 1
    }
    sb.toString.toLong
  }
}
