package graft.sources.v2

import java.util.UUID

import org.apache.hadoop.fs.{FileSystem, Path}

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources._

/** Copy-on-write row-level DELETE for manifest tables — the piece that
  * completes `DELETE FROM` beyond partition predicates (the Iceberg CoW
  * shape). Only files whose sidecar ranges say the predicate MAY match
  * are touched: wholly-matching files drop as pure metadata, wholly
  * non-matching files keep their identity (no rewrite, no re-upload),
  * and just the partial files are read, rewritten without the matching
  * rows, and swapped in with ONE atomic snapshot commit. A crash
  * anywhere leaves unmanifested garbage for vacuum, never a half-deleted
  * table; the pre-delete snapshot stays time-travelable until expiry.
  */
private[v2] object GraftOrcDelete {

  /** Data-source [[Filter]] -> [[Column]], for re-evaluating the pushed
    * DELETE predicate row-wise during the rewrite. None when any piece
    * has no exact Column form — `canDeleteWhere` then refuses, so Spark
    * reports the unsupported predicate instead of a wrong delete.
    */
  def toColumn(f: Filter): Option[Column] = f match {
    case EqualTo(a, v) => Some(col(a) === lit(v))
    case EqualNullSafe(a, v) => Some(col(a) <=> lit(v))
    case GreaterThan(a, v) => Some(col(a) > lit(v))
    case GreaterThanOrEqual(a, v) => Some(col(a) >= lit(v))
    case LessThan(a, v) => Some(col(a) < lit(v))
    case LessThanOrEqual(a, v) => Some(col(a) <= lit(v))
    case In(a, vs) => Some(col(a).isInCollection(vs.toSeq))
    case IsNull(a) => Some(col(a).isNull)
    case IsNotNull(a) => Some(col(a).isNotNull)
    case StringStartsWith(a, v) => Some(col(a).startsWith(v))
    case StringEndsWith(a, v) => Some(col(a).endsWith(v))
    case StringContains(a, v) => Some(col(a).contains(v))
    case And(l, r) => for (a <- toColumn(l); b <- toColumn(r)) yield a && b
    case Or(l, r) => for (a <- toColumn(l); b <- toColumn(r)) yield a || b
    case Not(c) => toColumn(c).map(!_)
    case AlwaysTrue() => Some(lit(true))
    case AlwaysFalse() => Some(lit(false))
    case _ => None
  }

  /** Rewrite `partials` (files where the predicate may match SOME rows)
    * without the rows matching `pred`, publish the rewrites as a new
    * wave, and return their manifest entries. DELETE semantics: a row is
    * deleted when the predicate is TRUE; NULL keeps the row. `schema` is
    * the table schema — partition columns (absent from the bare data
    * files) bind as per-group literals so mixed predicates resolve.
    * `liveDeletes` are the table's merge-on-read position sidecars
    * ([[GraftOrcMor]]): their rows are subtracted BEFORE the predicate
    * runs, so a copy-on-write rewrite of a file with live sidecars never
    * resurrects previously-deleted rows.
    */
  def rewriteWithout(spark: SparkSession, fs: FileSystem, table: Path,
                     partials: Seq[OrcFileEntry], pred: Column,
                     schema: org.apache.spark.sql.types.StructType,
                     liveDeletes: Seq[OrcFileEntry] = Nil,
                     curV: Long = 0L,
                     specEvolved: Boolean = false)
      : Seq[OrcFileEntry] = {
    if (partials.isEmpty) return Nil
    // partition values are constant per file; rewrite per partition
    // group so the surviving rows keep their hive placement. Files of
    // different SCHEMA VERSIONS (GraftOrcSchema) group separately —
    // their physical schemas may disagree — and each group projects to
    // the current schema, so a rewrite upgrades its files. On a table
    // whose PARTITION SPEC evolved, files additionally group by their
    // layout version — identical directory strings can mean different
    // specs (id_bucket=3 under bucket(4) vs bucket(8)) — and each
    // group's output records that frozen layout as its specV, so
    // transform pruning keeps resolving the directories the rewrite
    // preserved (content upgrades; layout does not).
    val evolved = GraftOrcSchema.hasEvolution(schema)
    val byParts = partials.groupBy(e =>
      (e.partitionValues, if (evolved) e.schemaV else 0L,
        if (specEvolved) e.layoutV else -1L)).toSeq
    GraftOrcWrite.bumpPublishStamp(partials.map(_.mtime).max)
    byParts.flatMap { case ((parts, fileV, layV), files) =>
      val loaded = spark.read.format("graft-orc").load(files.map(_.path): _*)
      // subtract MoR positions FIRST (metadata columns resolve only on
      // the raw relation), then project to the current schema
      val raw0 = GraftOrcMor.minusDeleted(spark, loaded, table,
        liveDeletes, fileMtimes = files)
      val raw =
        if (!evolved) raw0
        else GraftOrcSchema.projectToCurrent(raw0,
          schema.fields.toSeq.filterNot(f =>
            parts.keys.exists(_.equalsIgnoreCase(f.name))), fileV)
      // bind this group's partition values as typed literal columns (the
      // same string->type cast the reader's constant partition vectors
      // use), filter, then drop them again — the rewrite stores only
      // data columns, placement stays in the path
      val bound = parts.foldLeft(raw) { case (df, (k, v)) =>
        val dt = schema.fields.collectFirst {
          case f if f.name.equalsIgnoreCase(k) => f.dataType
        }.getOrElse(org.apache.spark.sql.types.StringType)
        df.withColumn(k, lit(v).cast(dt))
      }
      val keep = bound.filter(!coalesce(pred, lit(false)))
        .drop(parts.keys.toSeq: _*)
      publishGroupRewrite(spark, fs, table, parts, keep, "del",
        schemaV = if (evolved) curV else 0L, specV = layV)
    }
  }

  /** Stage `keep` (data columns only — placement stays in the path),
    * then stamp + rename each produced file into a fresh wave directory
    * under the group's partition path, capturing footer-stat sidecars
    * while the footers are hot. Shared by the CoW DELETE rewrite and the
    * MoR delete purge ([[GraftOrcMor.purge]]).
    */
  private[v2] def publishGroupRewrite(spark: SparkSession, fs: FileSystem,
                                      table: Path,
                                      parts: Map[String, String],
                                      keep: org.apache.spark.sql.DataFrame,
                                      tag: String,
                                      schemaV: Long = 0L,
                                      specV: Long = -1L): Seq[OrcFileEntry] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val staging = new Path(table,
      s"${GraftOrcWrite.StagingDir}/$tag-${UUID.randomUUID()}")
    graft.sources.OrcTables.write(keep, staging.toString)
    val waveRel = (parts.map { case (k, v) =>
      GraftOrcWrite.escapePathName(k) + "=" +
        (if (v == null) GraftOrcFileIndex.HiveDefaultPartition
         else GraftOrcWrite.escapePathName(v))
    }.toSeq :+ s"w-$tag-${UUID.randomUUID()}").mkString("/")
    val waveDir = new Path(table, waveRel)
    fs.mkdirs(waveDir)
    val staged = fs.listStatus(staging)
      .filter(st => st.isFile && st.getPath.getName.endsWith(".orc"))
      .sortBy(_.getPath.getName)
    val entries = staged.toSeq.map { st =>
      val stamp = GraftOrcWrite.nextPublishStamp()
      fs.setTimes(st.getPath, stamp, -1)
      val sidecar =
        try {
          val r = org.apache.orc.OrcFile.createReader(st.getPath,
            org.apache.orc.OrcFile.readerOptions(conf))
          try OrcStatsEval.sidecarOf(r) finally r.close()
        } catch { case scala.util.control.NonFatal(_) => None }
      val dest = new Path(waveDir, st.getPath.getName)
      if (!fs.rename(st.getPath, dest))
        throw new java.io.IOException(
          s"graft-orc delete: failed to publish rewrite ${st.getPath}")
      OrcFileEntry(fs.makeQualified(dest).toString, st.getLen, parts,
        stamp, sidecar, schemaV = schemaV, specV = specV)
    }
    fs.delete(staging, true)
    entries
  }
}
