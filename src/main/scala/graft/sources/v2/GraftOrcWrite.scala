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
class GraftOrcWriteBuilder(paths: Seq[String], info: LogicalWriteInfo)
    extends WriteBuilder with SupportsTruncate {
  private var truncateOnCommit = false
  override def truncate(): WriteBuilder = { truncateOnCommit = true; this }

  override def build(): Write = {
    require(paths.size == 1,
      s"graft-orc: write requires exactly one path, got ${paths.size}")
    new GraftOrcWrite(paths.head, info.schema(),
      info.options().asCaseSensitiveMap().asScala.toMap, truncateOnCommit)
  }
}

class GraftOrcWrite(path: String, schema: StructType,
                    options: Map[String, String], truncate: Boolean)
    extends Write {

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
    val (owf, conf) = GraftOrcShims.orcWriteSupport(spark, writeOptions, schema)
    GraftOrcWriterFactory(path, schema, owf,
      new SerializableConfiguration(conf))
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

  /** Driver-side commit: move every staged file into the table directory,
    * truncating the previous contents first when overwriting. Only data
    * files (`*.orc`) are truncated — checkpoint/metadata subdirectories a
    * user may have placed next to the data survive an overwrite.
    */
  private def publish(table: String, messages: Array[WriterCommitMessage],
                      truncateExisting: Boolean): Unit = {
    val dir = new Path(table)
    val conf = SparkSession.active.sparkContext.hadoopConfiguration
    val fs = dir.getFileSystem(conf)
    fs.mkdirs(dir)
    if (truncateExisting) {
      fs.listStatus(dir).filter { st =>
        st.isFile && st.getPath.getName.endsWith(".orc")
      }.foreach(st => fs.delete(st.getPath, false))
    }
    messages.foreach {
      case GraftOrcCommitMessage(staged) =>
        staged.foreach { s =>
          val src = new Path(s)
          if (!fs.rename(src, new Path(dir, src.getName)))
            throw new java.io.IOException(
              s"graft-orc: commit failed to publish $src into $dir")
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

/** Serializable per-task writer factory for both batch and streaming. */
case class GraftOrcWriterFactory(table: String, schema: StructType,
                                 owf: OutputWriterFactory,
                                 conf: SerializableConfiguration)
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

  private var writer: OutputWriter = _
  private var stagedPath: Path = _

  // lazily opened on the first row so empty partitions publish no file
  private def ensureOpen(): Unit = if (writer == null) {
    val name = s"part-$epochId-$partitionId-${UUID.randomUUID()}" +
      f.owf.getFileExtension(context)
    stagedPath = new Path(new Path(f.table, GraftOrcWrite.StagingDir), name)
    val fs = stagedPath.getFileSystem(f.conf.value)
    fs.mkdirs(stagedPath.getParent)
    writer = f.owf.newInstance(stagedPath.toString, f.schema, context)
  }

  override def write(record: InternalRow): Unit = {
    ensureOpen()
    writer.write(record)
  }

  override def commit(): WriterCommitMessage =
    if (writer == null) GraftOrcCommitMessage(Nil)
    else {
      writer.close()
      writer = null
      GraftOrcCommitMessage(Seq(stagedPath.toString))
    }

  override def abort(): Unit = {
    if (writer != null) { writer.close(); writer = null }
    if (stagedPath != null)
      stagedPath.getFileSystem(f.conf.value).delete(stagedPath, false)
  }

  override def close(): Unit =
    if (writer != null) { writer.close(); writer = null }
}
