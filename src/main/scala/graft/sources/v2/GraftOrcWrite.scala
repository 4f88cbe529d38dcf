package graft.sources.v2

import java.util.UUID

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.hadoop.mapreduce.{TaskAttemptID, TaskID, TaskType}
import org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.execution.datasources.{OutputWriter, OutputWriterFactory}
import org.apache.spark.sql.execution.datasources.orc.GraftOrcShims
import org.apache.spark.sql.types.StructType
import org.apache.spark.util.SerializableConfiguration

/** DSv2 write path for the graft-orc table — batch (`df.write
  * .format("graft-orc")`) and streaming (`df.writeStream
  * .format("graft-orc")`), extending A14 (the writer the reference stubs,
  * src/file_format.rs:268-274 returns not_impl) to the connector itself.
  *
  * Protocol: every task writes ONE ORC file under `<table>/_staging/` with
  * a globally unique name; the driver's commit renames staged files into
  * the table directory and drops the staging dir. Renames are per-file
  * atomic on HDFS-like stores, so readers never observe a partial FILE; a
  * crash between renames can expose a partial COMMIT — the same
  * no-transaction-log tradeoff as the reference's directory tables, where
  * the listing defines the table. Task retries are safe: an aborted or
  * orphaned attempt's staged file is never renamed in, and unique names
  * mean a retry never collides with the original.
  *
  * Streaming uses the identical machinery per epoch; Spark's checkpoint
  * tracking makes committed epochs never re-execute, so appends are
  * effectively exactly-once under normal recovery (a crash BETWEEN the
  * sink commit and the checkpoint write replays one epoch — at-least-once,
  * like any file sink without a metadata log).
  *
  * Row encoding delegates to Spark's `OrcOutputWriter` through the same
  * `private[sql]` seam as the read side (GraftOrcShims.orcWriteSupport) —
  * the point of the rebuild is the connector protocol, not a slower
  * re-implementation of the ORC serializer.
  */
class GraftOrcWriteBuilder(paths: Seq[String], info: LogicalWriteInfo,
                           partitionCols: Seq[String] = Nil)
    extends WriteBuilder with SupportsTruncate {
  private var truncateOnCommit = false
  override def truncate(): WriteBuilder = { truncateOnCommit = true; this }

  override def build(): Write = {
    require(paths.size == 1,
      s"graft-orc: write requires exactly one path, got ${paths.size}")
    new GraftOrcWrite(paths.head, info.schema(),
      info.options().asCaseSensitiveMap().asScala.toMap, truncateOnCommit,
      partitionCols)
  }
}

class GraftOrcWrite(path: String, schema: StructType,
                    options: Map[String, String], truncate: Boolean,
                    partitionCols: Seq[String] = Nil)
    extends Write {

  // hive layout: partition columns live in the PATH, not in the data
  // files (the reader re-materializes them from k=v segments) — the file
  // schema is the query schema minus partition columns, and each
  // partition column carries (index in the incoming row, type) for the
  // task-side splitter
  private val partSet = partitionCols.map(_.toLowerCase).toSet
  private val fileSchema = StructType(
    schema.fields.filterNot(f => partSet(f.name.toLowerCase)))
  private val partSpecs: Array[GraftPartCol] = partitionCols.map { c =>
    val i = schema.fields.indexWhere(_.name.equalsIgnoreCase(c))
    require(i >= 0, s"graft-orc: partition column $c not in ${schema.simpleString}")
    GraftPartCol(schema.fields(i).name, i, schema.fields(i).dataType)
  }.toArray
  private val fileFieldIdx: Array[Int] = schema.fields.zipWithIndex
    .filterNot { case (f, _) => partSet(f.name.toLowerCase) }.map(_._2)

  /** Shared factory construction: prepareWrite mutates a fresh job conf
    * (compression codec, output schema string) which must travel to the
    * executors alongside the factory.
    */
  private def taskFactory(): GraftOrcWriterFactory = {
    val spark = SparkSession.active
    // honor the writer option the batch helper exposes; default matches
    // the reference fixtures (alltypes.snappy.orc)
    val writeOptions = Map(
      "compression" -> options.getOrElse("compression", "snappy"))
    val (owf, conf) = GraftOrcShims.orcWriteSupport(spark, writeOptions, fileSchema)
    GraftOrcWriterFactory(path, fileSchema, owf,
      new SerializableConfiguration(conf), partSpecs, fileFieldIdx)
  }

  override def toBatch: BatchWrite = new BatchWrite {
    override def createBatchWriterFactory(i: PhysicalWriteInfo): DataWriterFactory =
      taskFactory()
    override def commit(messages: Array[WriterCommitMessage]): Unit =
      GraftOrcWrite.publish(path, messages, truncate)

    override def abort(messages: Array[WriterCommitMessage]): Unit =
      GraftOrcWrite.discard(path, messages)
  }

  override def toStreaming: StreamingWrite = new StreamingWrite {
    override def createStreamingWriterFactory(
        i: PhysicalWriteInfo): StreamingDataWriterFactory = taskFactory()
    // epochs append; truncate (Complete output mode) would need per-epoch
    // overwrite semantics this sink does not promise
    override def commit(epochId: Long,
                        messages: Array[WriterCommitMessage]): Unit =
      GraftOrcWrite.publish(path, messages, truncateExisting = false)
    override def abort(epochId: Long,
                       messages: Array[WriterCommitMessage]): Unit =
      GraftOrcWrite.discard(path, messages)
  }
}

object GraftOrcWrite {
  private[v2] val StagingDir = "_staging"

  /** Hive-style path escaping for partition values — the inverse of
    * [[GraftOrcFileIndex.unescapePathName]] (%XX for separators, glob
    * metacharacters and control chars).
    */
  private[v2] def escapePathName(s: String): String = {
    val special = "\"#%'*/:=?\\{[]^"
    val sb = new StringBuilder
    s.foreach { c =>
      if (c < ' ' || c == '\u007F' || special.indexOf(c) >= 0)
        sb.append('%').append(f"${c.toInt}%02X")
      else sb.append(c)
    }
    sb.toString
  }

  /** Driver-side commit: move every staged file into the table directory
    * (keeping any k=v subpath it was staged under), truncating the
    * previous contents first when overwriting. Truncation removes
    * top-level data files AND k=v partition directories — a full static
    * overwrite — but leaves other subdirectories (checkpoints, metadata a
    * user placed next to the data) alone.
    */
  private def publish(table: String, messages: Array[WriterCommitMessage],
                      truncateExisting: Boolean): Unit = {
    val dir = new Path(table)
    val conf = SparkSession.active.sparkContext.hadoopConfiguration
    val fs = dir.getFileSystem(conf)
    fs.mkdirs(dir)
    if (truncateExisting) {
      fs.listStatus(dir).filter { st =>
        (st.isFile && st.getPath.getName.endsWith(".orc")) ||
          (st.isDirectory && st.getPath.getName.contains("="))
      }.foreach(st => fs.delete(st.getPath, st.isDirectory))
    }
    val stagingMarker = "/" + StagingDir + "/"
    messages.foreach {
      case GraftOrcCommitMessage(staged) =>
        staged.foreach { s =>
          val src = new Path(s)
          val rel = s.substring(s.indexOf(stagingMarker) + stagingMarker.length)
          val dest = new Path(dir, rel)
          fs.mkdirs(dest.getParent)
          if (!fs.rename(src, dest))
            throw new java.io.IOException(
              s"graft-orc: commit failed to publish $src into $dest")
        }
      case other =>
        throw new IllegalStateException(s"graft-orc: foreign message $other")
    }
    fs.delete(new Path(dir, StagingDir), true)
  }

  private def discard(table: String,
                      messages: Array[WriterCommitMessage]): Unit = {
    val dir = new Path(table)
    val fs = dir.getFileSystem(
      SparkSession.active.sparkContext.hadoopConfiguration)
    // staged files of THIS attempt only; other writers' staging (a
    // concurrent epoch) stays untouched
    messages.collect { case GraftOrcCommitMessage(staged) => staged }
      .flatten.foreach(s => fs.delete(new Path(s), false))
  }
}

/** One staged file per non-empty task (empty tasks stage nothing). */
case class GraftOrcCommitMessage(staged: Seq[String])
    extends WriterCommitMessage

/** One partition column of the incoming rows: name, ordinal, type. */
case class GraftPartCol(name: String, index: Int,
                        dataType: org.apache.spark.sql.types.DataType)

/** Serializable per-task writer factory for both batch and streaming.
  * `schema` is the FILE schema (partition columns excluded);
  * `fileFieldIdx` maps file fields to ordinals in the incoming row.
  */
case class GraftOrcWriterFactory(table: String, schema: StructType,
                                 owf: OutputWriterFactory,
                                 conf: SerializableConfiguration,
                                 partSpecs: Array[GraftPartCol] = Array.empty,
                                 fileFieldIdx: Array[Int] = Array.empty)
    extends DataWriterFactory with StreamingDataWriterFactory {

  override def createWriter(partitionId: Int,
                            taskId: Long): DataWriter[InternalRow] =
    new GraftOrcDataWriter(this, partitionId, taskId, epochId = 0L)

  override def createWriter(partitionId: Int, taskId: Long,
                            epochId: Long): DataWriter[InternalRow] =
    new GraftOrcDataWriter(this, partitionId, taskId, epochId)
}

class GraftOrcDataWriter(f: GraftOrcWriterFactory, partitionId: Int,
                         taskId: Long, epochId: Long)
    extends DataWriter[InternalRow] {

  private val context = new TaskAttemptContextImpl(f.conf.value,
    new TaskAttemptID(new TaskID(
      new org.apache.hadoop.mapreduce.JobID("graft-orc", epochId.toInt),
      TaskType.MAP, partitionId), (taskId % Int.MaxValue).toInt))

  // one open writer per partition-directory suffix ("" when unpartitioned);
  // lazily opened on the first row so empty partitions publish no file
  private val writers =
    collection.mutable.LinkedHashMap.empty[String, (OutputWriter, Path)]

  private def writerFor(suffix: String): OutputWriter =
    writers.getOrElseUpdate(suffix, {
      val name = s"part-$epochId-$partitionId-${UUID.randomUUID()}" +
        f.owf.getFileExtension(context)
      val base = new Path(f.table, GraftOrcWrite.StagingDir)
      val stagedDir = if (suffix.isEmpty) base else new Path(base, suffix)
      val staged = new Path(stagedDir, name)
      val fs = staged.getFileSystem(f.conf.value)
      fs.mkdirs(staged.getParent)
      (f.owf.newInstance(staged.toString, f.schema, context), staged)
    })._1

  /** Hive path value for one partition column (reader parity:
    * GraftOrcFileIndex unescapes and maps the null marker back).
    */
  private def pathValue(row: InternalRow, c: GraftPartCol): String = {
    import org.apache.spark.sql.types._
    if (row.isNullAt(c.index)) return GraftOrcFileIndex.HiveDefaultPartition
    val raw = c.dataType match {
      case DateType =>
        java.time.LocalDate.ofEpochDay(row.getInt(c.index).toLong).toString
      case StringType => row.getUTF8String(c.index).toString
      case dt => row.get(c.index, dt).toString
    }
    GraftOrcWrite.escapePathName(raw)
  }

  override def write(record: InternalRow): Unit = {
    if (f.partSpecs.isEmpty) writerFor("").write(record)
    else {
      val suffix = f.partSpecs
        .map(c => c.name + "=" + pathValue(record, c)).mkString("/")
      // project partition columns OUT of the written row (they live in
      // the path; the reader re-materializes them)
      val vals = new Array[Any](f.fileFieldIdx.length)
      var i = 0
      while (i < vals.length) {
        vals(i) = record.get(f.fileFieldIdx(i), f.schema.fields(i).dataType)
        i += 1
      }
      writerFor(suffix).write(
        new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(vals))
    }
  }

  override def commit(): WriterCommitMessage = {
    writers.values.foreach(_._1.close())
    val staged = writers.values.map(_._2.toString).toSeq
    writers.clear()
    GraftOrcCommitMessage(staged)
  }

  override def abort(): Unit = {
    writers.values.foreach { case (w, staged) =>
      try w.close() catch { case _: Throwable => }
      staged.getFileSystem(f.conf.value).delete(staged, false)
    }
    writers.clear()
  }

  override def close(): Unit = {
    writers.values.foreach(_._1.close())
    // keep staged paths: close() after commit() sees an empty map; close()
    // without commit is followed by abort(), which deletes them
  }
}
